package graft.engine

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** End-to-end pipeline parity: extract→transform→load over temp dirs,
  * CSV \N round-trip, conflict-ignoring idempotent re-run.
  */
class PipelineSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-pipe").toString

  test("run: three stages, per-stage counts, idempotent re-run loads 0 new rows") {
    val root = tmp()
    val src = Seq(
      ("a", "2024-01-01 10:00:00", "12.5"),
      ("b", "not-a-date", "oops"),
      ("c", "2024-02-03 00:00:00", "7.25")
    ).toDF("id", "d", "m")
    val clean = (df: org.apache.spark.sql.DataFrame) =>
      Clean.clean(df, timestampCols = Seq("d"), intCols = Nil,
        moneyCols = Seq("m"), volumeCols = Nil)

    val stats = Pipeline.run(spark, src, clean,
      s"$root/raw", s"$root/clean", s"$root/table", keys = Seq("id"))
    assert(stats == Pipeline.RunStats(3, 3, 3))

    // retry semantics (O3): the whole run again — load appends nothing
    val stats2 = Pipeline.run(spark, src, clean,
      s"$root/raw", s"$root/clean", s"$root/table", keys = Seq("id"))
    assert(stats2.loaded == 0)
    assert(spark.read.parquet(s"$root/table").count() == 3)

    // cleaned values carry the reference coercions: bad date -> null, bad money -> 0
    val b = spark.read.parquet(s"$root/table").where(col("id") === "b").collect()(0)
    assert(b.isNullAt(b.fieldIndex("d")))
    assert(b.getDecimal(b.fieldIndex("m")).toPlainString == "0.00")
  }

  test("CSV \\N round-trip preserves nulls (S6)") {
    val dir = tmp() + "/csv"
    val schema = StructType(Seq(
      StructField("k", StringType), StructField("v", StringType)))
    val df = Seq(("x", null: String), ("y", "has value"), (null: String, "z"))
      .toDF("k", "v")
    Pipeline.writeCsvForCopy(df, dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".csv"))
    val content = files.flatMap(f =>
      scala.io.Source.fromFile(f).getLines()).mkString("\n")
    assert(content.contains("\\N")) // the COPY null sentinel is on disk
    val back = Pipeline.readCsvForCopy(spark, dir, schema)
    val rows = back.collect()
    assert(rows.length == 3)
    assert(rows.exists(r => r.getString(0) == "x" && r.isNullAt(1)))
    assert(rows.exists(r => r.isNullAt(0) && r.getString(1) == "z"))
  }

  test("conflictIgnoringAppend: batch-internal dedup + cross-batch skip") {
    val dir = tmp() + "/table"
    val b1 = Seq((1, "v1"), (1, "v1-dup"), (2, "v2")).toDF("k", "v")
    val n1 = Pipeline.conflictIgnoringAppend(spark, b1, dir, Seq("k"))
    assert(n1 == 2) // in-batch dup collapsed
    val b2 = Seq((2, "v2-again"), (3, "v3")).toDF("k", "v")
    val n2 = Pipeline.conflictIgnoringAppend(spark, b2, dir, Seq("k"))
    assert(n2 == 1) // only key 3 is novel
    assert(spark.read.parquet(dir).select("k").as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
  }

  test("registerTable makes the directory addressable from SQL (S8)") {
    val dir = tmp() + "/cat"
    Seq((1, "a")).toDF("id", "s").write.parquet(dir)
    Pipeline.registerTable(spark, "graft_reg_test", dir)
    assert(spark.sql("SELECT count(*) FROM graft_reg_test").collect()(0).getLong(0) == 1)
    spark.sql("DROP TABLE graft_reg_test")
  }

  test("jdbcSink without a URL is a structural no-op (S7 stub)") {
    Pipeline.jdbcSink(Seq((1, "a")).toDF("id", "s"), None, "t") // must not throw
  }
}
