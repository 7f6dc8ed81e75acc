package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CCNet-style perplexity bucketing (Wenzek et al. 2020): per
  * language, split the corpus into head / middle / tail thirds by
  * LM cross-entropy — the standard "train mostly on the head,
  * downsample the tail" curation split.
  *
  * Scale design (100 TB): the naive formulation is
  * `ntile(3) over (partition by lang order by score)` — a full
  * per-language SORT of the corpus, where one language can be half
  * the data (one straggler task). Instead the cutoffs come from the
  * per-(lang, score) HISTOGRAM: the window runs over distinct score
  * values per language (score-cardinality-bounded, orders of
  * magnitude smaller than the corpus — nll6 is already quantized),
  * and bucket assignment is a broadcast join of two cutoff rows per
  * language back onto the scored corpus — map-side.
  *
  * Tie semantics (the determinism contract): equal scores share a
  * bucket — cutoff1 is the smallest nll6 whose cumulative count
  * reaches ⌈n/3⌉, cutoff2 likewise for ⌈2n/3⌉; bucket 1 (head) is
  * nll6 ≤ cutoff1, bucket 3 (tail) is nll6 > cutoff2. Unlike ntile
  * this never splits a tied score across buckets (so bucket sizes
  * deviate from n/3 exactly by tie mass), and it is reproducible in
  * any engine without relying on ntile's row-distribution rule.
  * Zero-transition docs (n_bigrams = 0, nll6 = 0) sort with the
  * head by construction; filter them first if that is not wanted.
  */
object PerplexityBuckets {

  /** Per-document perplexity bucket per language:
    * (doc_id, lang, nll6, bucket) with bucket ∈ {1, 2, 3}.
    * `scored` must carry (doc_id, lang, nll6) — the shape
    * [[LanguageModel.bigramCrossEntropy]] emits.
    *
    * `scored` is referenced TWICE (histogram + assignment join): pass
    * a materialized frame (a persisted stage, or `localCheckpoint` at
    * probe scale) when the scoring plan is expensive, or the LM
    * scoring recomputes per reference.
    */
  def terciles(scored: DataFrame): DataFrame = {
    val hist = scored.groupBy(col("lang"), col("nll6"))
      .agg(count(lit(1)).as("c"))
    // cumulative count over DISTINCT scores per language — the window
    // partition is score-cardinality-bounded, never corpus-sized
    val cum = hist.withColumn("cum",
        sum(col("c")).over(Window.partitionBy(col("lang"))
          .orderBy(col("nll6"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col("lang"))))
    val cuts = cum.groupBy(col("lang"), col("n"))
      .agg(
        min(when(col("cum") * 3 >= col("n"), col("nll6"))).as("cut1"),
        min(when(col("cum") * 3 >= col("n") * 2, col("nll6"))).as("cut2"))
      .select(col("lang"), col("cut1"), col("cut2"))
    scored.join(broadcast(cuts), Seq("lang"))
      .select(col("doc_id"), col("lang"), col("nll6"),
        when(col("nll6") <= col("cut1"), lit(1))
          .when(col("nll6") <= col("cut2"), lit(2))
          .otherwise(lit(3)).as("bucket"))
  }
}
