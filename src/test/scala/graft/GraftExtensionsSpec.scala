package graft

/** The extensions must make the native expressions SQL-addressable —
  * tested via runtime registration on the shared session (the
  * `.withExtensions` path shares the same builder list, asserted
  * directly against a fresh SparkSessionExtensions instance).
  */
class GraftExtensionsSpec extends SparkSpecBase {

  test("runtime-registered functions callable from SQL") {
    GraftExtensions.register(spark)
    val rows = spark.sql(
      """SELECT
        |  simhash64('the quick brown fox') AS sh,
        |  minhash_signature('a b c d e', 2, 4) AS mh,
        |  decimal_scaled_dot(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                     array(CAST(2.0 AS FLOAT), CAST(0.5 AS FLOAT))) AS dot
        |""".stripMargin).collect()(0)
    assert(rows.getLong(0) != 0L)
    assert(rows.getSeq[Long](1).length == 4)
    assert(rows.getDouble(2) == 4.0) // 1.5*2.0 + 2.0*0.5
  }

  test("SQL simhash64 equals the Column-API result") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val df = Seq("spark native expression").toDF("t")
    df.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql("SELECT simhash64(t) FROM ext_docs").collect()(0).getLong(0)
    val viaCol = df.select(graft.functions.simhash64Native($"t")).collect()(0).getLong(0)
    assert(viaSql == viaCol)
  }

  test("the session-build extensions class injects the same function set") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions()(ext) // must not throw; builder list is shared
    assert(GraftExtensions.all.map(_._1.funcName).sorted ==
      Seq("decimal_scaled_dot", "minhash_signature", "simhash64"))
  }
}
