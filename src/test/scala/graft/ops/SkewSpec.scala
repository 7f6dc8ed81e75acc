package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpecBase {
  import spark.implicits._

  // heavy-tailed: key 1 has 1000 rows, keys 2-10 have one each
  private def large = ((1 to 1000).map(i => (1, i.toLong)) ++
    (2 to 10).map(k => (k, 0L))).toDF("k", "payload")
  private def small = (1 to 10).map(k => (k, s"dim$k")).toDF("k", "attr")

  test("saltedJoin row-identical to plain join") {
    val plain = large.join(small, "k")
      .select("k", "payload", "attr").as[(Int, Long, String)].collect().sorted
    val salted = Skew.saltedJoin(large, small, "k", saltFactor = 8,
        largeSaltCols = Seq("payload"))
      .select("k", "payload", "attr").as[(Int, Long, String)].collect().sorted
    assert(salted.toSeq == plain.toSeq)
  }

  test("salt actually spreads the hot key across sub-keys") {
    val salts = large.where(col("k") === 1)
      .select(Skew.salt(8, col("payload")).as("s"))
      .distinct().as[Int].collect()
    assert(salts.length > 4) // 1000 rows hit most of the 8 salt buckets
  }

  test("saltedSumCount equals direct aggregation") {
    val direct = large.groupBy("k")
      .agg(sum("payload").as("sum"), count(lit(1)).as("count"))
      .as[(Int, Long, Long)].collect().sorted
    val salted = Skew.saltedSumCount(large, "k", "payload", 8, Seq("payload"))
      .as[(Int, Long, Long)].collect().sorted
    assert(salted.toSeq == direct.toSeq)
  }
}
