package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Sequence packing: batch documents into fixed token-budget training
  * sequences — the step between a curated corpus and an LLM data
  * loader.
  *
  * Greedy next-fit packing is inherently sequential (each decision
  * depends on the running fill), so the distributed contract is
  * pack-WITHIN-partition: each partition packs its own documents into
  * its own sequences (ids prefixed by partition), sequences never
  * cross partitions. That is the contract every large-scale packer
  * uses — global bin packing is NP-hard and needless: with millions of
  * docs per partition the per-partition fill converges to the global
  * one.
  *
  * Deterministic given the input partitioning+order; pair with
  * `repartitionByRange(sortCol)` upstream for a reproducible layout.
  */
object Packing {

  case class Packed(doc_id: Long, n_tokens: Long, seq_id: Long, seq_pos: Int)

  /** Assign each doc a (seq_id, seq_pos): next-fit greedy per
    * partition. A doc larger than `budget` gets a sequence of its own
    * (callers chunk oversized docs upstream if that matters).
    * seq_id = partitionId * 2^40 + local counter (collision-free
    * for < 10^12 sequences per partition).
    */
  def packGreedy(docs: DataFrame, idCol: String, tokensCol: String,
      budget: Long): DataFrame = {
    require(budget > 0)
    val src = docs.select(col(idCol).cast("long"), col(tokensCol).cast("long"))
    src.mapPartitions { rows =>
      val pid = org.apache.spark.TaskContext.getPartitionId().toLong
      var seq = 0L; var fill = 0L; var pos = 0
      rows.map { r =>
        val id = r.getLong(0); val n = r.getLong(1)
        if (fill > 0 && fill + n > budget) { seq += 1; fill = 0; pos = 0 }
        fill += n
        val out = Packed(id, n, (pid << 40) | seq, pos)
        pos += 1
        out
      }
    }(Encoders.product[Packed]).toDF()
  }

  /** Packing quality report: sequences, mean fill ratio, max overflow. */
  def packingStats(packed: DataFrame, budget: Long): DataFrame =
    packed.groupBy("seq_id")
      .agg(sum(col("n_tokens")).as("seq_tokens"), count(lit(1)).as("n_docs"))
      .agg(
        count(lit(1)).as("n_sequences"),
        avg(col("seq_tokens").cast("double") / budget).as("mean_fill"),
        max(when(col("n_docs") > 1, col("seq_tokens")).otherwise(0L)).as("max_packed_tokens"))
}
