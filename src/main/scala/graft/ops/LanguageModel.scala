package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-based n-gram language-model scoring — the CCNet/KenLM-style
  * quality signal: train a smoothed bigram model on the corpus itself
  * (per language), score every document's cross-entropy under it.
  * Documents whose token transitions are typical of their language
  * score LOW; gibberish, shuffled text, and wrong-language documents
  * score HIGH — the classic perplexity-bucket curation filter.
  *
  * Scale design (100 TB):
  * - Training is two hash aggregates (bigram counts, prefix counts)
  *   plus a per-language distinct-token count — all partial-aggregated
  *   map-side; the shuffle carries one row per DISTINCT gram, not per
  *   occurrence.
  * - The count tables are vocabulary-bounded, orders of magnitude
  *   smaller than the corpus: they BROADCAST, and scoring is map-side
  *   work over each document's own bigrams. (On an open-vocab corpus
  *   where counts outgrow the broadcast budget, drop the `broadcast`
  *   hints and the same plan becomes shuffle hash joins on the gram
  *   key — the operator's shape does not change.)
  * - Per-document totals are one final hash aggregate on the doc id.
  *
  * Determinism contract (cross-engine oracle): P(b|a) =
  * (c₂(a,b)+1)/(c₁(a)+V) — add-one smoothing, so every probability is
  * a ratio of exact integers; each token's ln is quantized with
  * `floor(ln(p) · 10⁶)` to a long and per-document totals are exact
  * integer sums (no float-summation order dependence). V is the
  * language's distinct-token count, making Σ_b P(b|a) = 1 exactly.
  */
object LanguageModel {

  /** Per-document bigram cross-entropy under a self-trained add-one
    * bigram LM, grouped per `langCol`.
    *
    * Output: (doc_id, lang, n_bigrams, nll6, avg_nll) — `nll6` is the
    * exact scaled-long total negative log-likelihood, `avg_nll` =
    * nll6/10⁶/n_bigrams (nats per transition; 0.0 for docs with fewer
    * than 2 tokens, which have no transitions to score).
    */
  def bigramCrossEntropy(
      docs: DataFrame, idCol: String, textCol: String,
      langCol: String): DataFrame = {
    val toks = graft.engine.Tables.fanOut(docs.sparkSession, docs)
      .select(col(idCol).cast("long").as("doc"), col(langCol).as("lang"),
        TextOps.tokens(col(textCol)).as("w"))
    // one row per bigram OCCURRENCE (order within the doc is
    // irrelevant to the sum — exact longs commute)
    val grams = toks.where(size(col("w")) >= 2)
      .select(col("doc"), col("lang"), explode(expr(
        "transform(sequence(1, size(w) - 1), " +
          "i -> struct(w[i-1] AS a, w[i] AS b))")).as("g"))
      .select(col("doc"), col("lang"),
        col("g.a").as("a"), col("g.b").as("b"))
    val c2 = grams.groupBy("lang", "a", "b").agg(count(lit(1)).as("c2"))
    val c1 = grams.groupBy("lang", "a").agg(count(lit(1)).as("c1"))
    val vocab = toks.select(col("lang"), explode(col("w")).as("t"))
      .groupBy("lang").agg(countDistinct(col("t")).as("v"))
    val scored = grams
      .join(broadcast(c2), Seq("lang", "a", "b"))
      .join(broadcast(c1), Seq("lang", "a"))
      .join(broadcast(vocab), Seq("lang"))
      .withColumn("nll6", -floor(log(
        (col("c2").cast("double") + lit(1.0)) /
          (col("c1").cast("double") + col("v").cast("double"))) *
        lit(1000000.0)))
    val perDoc = scored.groupBy("doc")
      .agg(sum(col("nll6")).as("nll6"), count(lit(1)).as("n_bigrams"))
    docs.select(col(idCol).cast("long").as("doc"), col(langCol).as("lang"))
      .join(perDoc, Seq("doc"), "left")
      .select(col("doc").as("doc_id"), col("lang"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("nll6"), lit(0L)).as("nll6"),
        when(coalesce(col("n_bigrams"), lit(0L)) === 0, lit(0.0))
          .otherwise(col("nll6").cast("double") / lit(1000000.0) /
            col("n_bigrams").cast("double")).as("avg_nll"))
  }
}
