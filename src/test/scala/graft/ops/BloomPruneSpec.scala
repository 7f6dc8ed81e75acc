package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class BloomPruneSpec extends SparkSpecBase {
  import spark.implicits._

  private def fact = (1L to 1000L).map(i => (i, i % 50)).toDF("id", "key")
  private def dim = Seq(3L, 7L, 11L, 42L).toDF("dkey")

  test("bloomSemiJoin equals exact semi join") {
    val got = BloomPrune.bloomSemiJoin(fact, "key", dim, "dkey", expectedItems = 10)
      .select("id").as[Long].collect().sorted
    val want = fact.join(dim.withColumnRenamed("dkey", "key"), Seq("key"), "left_semi")
      .select("id").as[Long].collect().sorted
    assert(got.toSeq == want.toSeq)
    assert(got.nonEmpty)
  }

  test("bloom prefilter has no false negatives and prunes most non-members") {
    val bloom = BloomPrune.buildBloom(dim, "dkey", expectedItems = 10, numBits = 640)
    val kept = fact.where(BloomPrune.mightContain(bloom, col("key")))
      .select("key").distinct().as[Long].collect().toSet
    // every true member survives
    assert(Set(3L, 7L, 11L, 42L).subsetOf(kept))
    // 50 distinct keys, 4 members: with 640 bits / 10 items the fpp is
    // tiny — expect nearly all 46 non-members pruned
    assert(kept.size <= 8, s"too many false positives: $kept")
  }

  test("null fact keys never pass the bloom (semi-join semantics)") {
    val bloom = BloomPrune.buildBloom(dim, "dkey", 10, 640)
    val withNull = Seq(Some(3L), None, Some(999L)).toDF("key")
    val kept = withNull.where(BloomPrune.mightContain(bloom, col("key")))
      .collect().map(_.getLong(0))
    assert(kept.toSeq == Seq(3L))
  }
}
