package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs = (0L until 1000L).map(i => (i, s"s${i % 3}")).toDF("id", "stratum")

  test("stratifiedExact takes ceil(fraction*n) per stratum, deterministically") {
    val sampled = Sampling.stratifiedExact(docs, col("stratum"), col("id"), 0.1)
    val got = sampled.groupBy("stratum").count().as[(String, Long)].collect().toMap
    // strata sizes: s0=334, s1=333, s2=333 -> ceil(0.1*n) = 34, 34, 34
    assert(got == Map("s0" -> 34L, "s1" -> 34L, "s2" -> 34L))
    // deterministic: same rows every run
    val a = sampled.select("id").as[Long].collect().sorted.toSeq
    val b = Sampling.stratifiedExact(docs, col("stratum"), col("id"), 0.1)
      .select("id").as[Long].collect().sorted.toSeq
    assert(a == b)
  }

  test("hashSplit is disjoint, exhaustive, ratio-correct, and stable") {
    val split = Sampling.hashSplit(docs, col("id"),
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
    assert(split.count() == 1000) // exhaustive, no dup/drop
    val counts = split.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts("train") > 700 && counts("train") < 900)
    assert(counts("val") > 50 && counts("val") < 160)
    // stable under repartitioning: per-id assignment identical
    val a = split.select("id", "split").as[(Long, String)].collect().toMap
    val b = Sampling.hashSplit(docs.repartition(7), col("id"),
        Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(a == b)
  }

  test("hashSplit routes every bucket (boundary buckets included)") {
    // ids covering all 100 buckets: check split boundaries respected
    val big = (0L until 20000L).toDF("id")
    val withBucket = Sampling.hashSplit(big, col("id"),
        Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .withColumn("bucket", pmod(xxhash64(col("id")), lit(100)))
    val bad = withBucket.where(
      (col("bucket") < 80 && col("split") =!= "train") ||
      (col("bucket") >= 80 && col("bucket") < 90 && col("split") =!= "val") ||
      (col("bucket") >= 90 && col("split") =!= "test")).count()
    assert(bad == 0)
  }
}
