package graft.expressions

import graft.SparkSpecBase
import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** The native LSH bucketing kernel is EXACT: bit-identity against the
  * declarative per-table HOF arm — same splitmix plane matrix, same
  * IEEE fold order, same Spark NaN-above-everything `> 0` — across
  * random vectors, corruption shapes, and the registered SQL surface.
  */
class LshBucketsSpec extends SparkSpecBase {
  import spark.implicits._

  private def randomVectors(n: Int, dim: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat)))
      .toDF("id", "vec")
  }

  private def declarative(nTables: Int, nPlanes: Int, dim: Int) =
    array((0 until nTables).map(t =>
      Similarity.lshBucket(col("vec"), t, nPlanes, dim)): _*)

  test("native ≡ declarative across dims and table/plane shapes") {
    for ((nTables, nPlanes, dim) <- Seq((4, 8, 64), (2, 16, 7), (8, 3, 128))) {
      val df = randomVectors(n = 300, dim = dim, seed = dim.toLong)
      val bad = df.select(
          graft.functions.lshBucketsNative(col("vec"), nTables, nPlanes).as("n"),
          declarative(nTables, nPlanes, dim).as("d"))
        .where(col("n") =!= col("d")).count()
      assert(bad == 0L, s"($nTables, $nPlanes, $dim)")
    }
  }

  test("corruption parity: null, empty, and NaN vectors match the declarative arm") {
    val df = Seq(
      (1L, Array(1.0f, -2.0f)),
      (2L, null.asInstanceOf[Array[Float]]),
      (3L, Array.empty[Float]),
      (4L, Array(Float.NaN, 1.0f)),       // NaN dot → bit SET (Spark NaN > 0)
      (5L, Array(0.0f, 0.0f))             // zero dot → bit clear
    ).toDF("id", "vec")
    val rows = df.select(col("id"),
        graft.functions.lshBucketsNative(col("vec"), 2, 4).as("n"),
        declarative(2, 4, 2).as("d"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"id=${r.getLong(0)}")
    }
    // NaN vector: every plane dot is NaN → all nPlanes bits set, both tables
    val nan = rows.find(_.getLong(0) == 4L).get
    assert(nan.getSeq[Long](1) == Seq(15L, 15L))
    // null and empty vectors land in bucket 0 of every table (never null)
    for (id <- Seq(2L, 3L))
      assert(rows.find(_.getLong(0) == id).get.getSeq[Long](1) == Seq(0L, 0L))
  }

  test("a null ELEMENT matches the declarative arm: all-zero buckets") {
    val df = spark.sql(
      "SELECT array(cast(null as float), cast(3.0 as float)) AS vec")
    val r = df.select(
        graft.functions.lshBucketsNative(col("vec"), 2, 4).as("n"),
        declarative(2, 4, 2).as("d"))
      .collect().head
    assert(r.getSeq[Long](0) == Seq(0L, 0L))
    assert(r.getSeq[Long](0) == r.getSeq[Long](1))
  }

  test("SQL registration round-trips") {
    graft.GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT lsh_buckets(array(cast(1.5 as float), cast(-0.5 as float)), 2, 4) AS b")
      .collect().head.getSeq[Long](0)
    val want = Seq((Array(1.5f, -0.5f), 0)).toDF("vec", "z")
      .select(declarative(2, 4, 2).as("d")).collect().head.getSeq[Long](0)
    assert(got == want)
  }

  test("lshTopK buckets through the native kernel (plan-tree proof)") {
    val df = randomVectors(n = 50, dim = 8, seed = 9L)
    val res = Similarity.lshTopK(df.limit(5), df, "id", "vec", k = 3,
      nPlanes = 4, nTables = 2, dim = 8)
    val hasKernel = res.queryExecution.optimizedPlan.exists(
      _.expressions.exists(_.exists(_.isInstanceOf[LshBuckets])))
    assert(hasKernel, "lshTopK plan must bucket through the native kernel")
  }
}
