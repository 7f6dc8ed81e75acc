package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs = Seq(
    (1L, 400L), (2L, 500L), (3L, 200L), // 400+500 fits 1024, +200 fits too
    (4L, 900L),                          // doesn't fit after 1100 -> new seq
    (5L, 2000L),                         // oversized: own sequence
    (6L, 10L)
  ).toDF("doc_id", "n_tokens").coalesce(1)

  test("next-fit packing: multi-doc sequences never exceed the budget") {
    val packed = Packing.packGreedy(docs, "doc_id", "n_tokens", budget = 1024)
    val seqs = packed.groupBy("seq_id")
      .agg(sum("n_tokens").as("t"), count(lit(1)).as("n"))
      .as[(Long, Long, Long)].collect()
    // every multi-doc sequence within budget
    assert(seqs.filter(_._3 > 1).forall(_._2 <= 1024))
    // every doc packed exactly once
    assert(packed.count() == 6)
    assert(packed.select("doc_id").distinct().count() == 6)
    // oversized doc 5 is alone in its sequence
    val seq5 = packed.where(col("doc_id") === 5).select("seq_id").as[Long].head()
    assert(packed.where(col("seq_id") === seq5).count() == 1)
  }

  test("packing is deterministic and positions are contiguous") {
    val a = Packing.packGreedy(docs, "doc_id", "n_tokens", 1024)
      .as[Packing.Packed].collect().sortBy(_.doc_id).toSeq
    val b = Packing.packGreedy(docs, "doc_id", "n_tokens", 1024)
      .as[Packing.Packed].collect().sortBy(_.doc_id).toSeq
    assert(a == b)
    // within each sequence, seq_pos is 0..n-1
    a.groupBy(_.seq_id).values.foreach { g =>
      assert(g.map(_.seq_pos).sorted == (0 until g.size))
    }
  }

  test("sequences never cross partitions") {
    val multi = docs.repartition(3)
    val packed = Packing.packGreedy(multi, "doc_id", "n_tokens", 1024)
    // seq_id embeds the partition id in the high bits: grouping by
    // seq_id >> 40 must reproduce the partition boundaries
    val n = packed.select((col("seq_id") / lit(1L << 40)).cast("long"))
      .distinct().count()
    assert(n <= 3)
  }
}
