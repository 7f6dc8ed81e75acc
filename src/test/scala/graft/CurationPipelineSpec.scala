package graft

import graft.engine.Tables
import graft.ops._
import org.apache.spark.sql.functions._

/** End-to-end training-data curation over the real fixture corpus:
  * quality gate → near-dup detection → clustering → survivor
  * selection → deterministic split → sequence packing. Each stage is
  * an op with its own spec; this spec checks the COMPOSITION invariants
  * a pipeline user relies on.
  */
class CurationPipelineSpec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  test("curation pipeline: gates compose without losing or duplicating docs") {
    val docs = Tables.documents(spark, sf)
    val total = docs.count()

    // 1. quality gate: keep docs with enough tokens
    val scored = docs.select(col("doc_id"), col("text"), col("lang"),
      TextOps.bpeishTokenCount(col("text")).as("n_tokens"))
    val kept = scored.where(col("n_tokens") >= 10)
    val keptN = kept.count()
    assert(keptN > 0 && keptN <= total)

    // 2. near-dup pairs (minhash LSH) over survivors of the gate
    val pairs = Dedup.minhashLshPairs(kept, "doc_id", "text",
      n = 3, bands = 4, rowsPerBand = 8, threshold = 0.6)

    // 3. cluster + min-id survivor
    val labels = Dedup.connectedComponents(pairs.select("id_a", "id_b"))
    val deduped = kept.join(labels.withColumnRenamed("id", "doc_id"),
        Seq("doc_id"), "left")
      .where(col("label").isNull || col("label") === col("doc_id"))

    val dedupN = deduped.count()
    // survivors: every clustered doc except cluster minima is dropped
    val dropped = labels.where(col("id") =!= col("label")).count()
    assert(dedupN == keptN - dropped)

    // 4. deterministic split
    val split = Sampling.hashSplit(deduped, col("doc_id"),
      Seq("train" -> 90, "val" -> 10))
    assert(split.count() == dedupN)

    // 5. pack the train split
    val packed = Packing.packGreedy(
      split.where(col("split") === "train"), "doc_id", "n_tokens", budget = 512)
    val trainN = split.where(col("split") === "train").count()
    assert(packed.count() == trainN)
    assert(packed.select("doc_id").distinct().count() == trainN)
    // multi-doc sequences respect the budget
    val over = packed.groupBy("seq_id")
      .agg(sum("n_tokens").as("t"), count(lit(1)).as("n"))
      .where(col("n") > 1 && col("t") > 512).count()
    assert(over == 0)
  }

  test("full round-3 pipeline: decontaminate -> filter -> mix -> chunk -> pack") {
    val docs = Tables.documents(spark, sf)
    val bench = docs.where(col("doc_id") < 20)
    val corpus = docs.where(col("doc_id") >= 20)
    val corpusN = corpus.count()

    // 1. decontaminate against the "eval set"; report agrees with the drop
    val clean = Dedup.decontaminate(corpus, "doc_id", "text", bench, "text", 3)
    val flagged = Dedup.contaminationReport(corpus, "doc_id", "text", bench, "text", 3)
    assert(clean.count() == corpusN - flagged.count(),
      "binary verdict and triage report must agree")
    // no flagged doc survives; every dropped doc is accounted for
    assert(clean.join(flagged, Seq("doc_id"), "left_semi").count() == 0)

    // 2. quality + repetition gate
    val gated = clean
      .select(col("doc_id"), col("lang"), col("text"),
        TextOps.tokenCount(col("text")).as("n_tokens"))
      .where(TextOps.qualityScore(col("text")) >= 0.3 &&
        TextOps.dupLineRatio(col("text")) <= 0.5)
    assert(gated.count() > 0)

    // 3. per-language token-budget mixture
    val mixed = Sampling.tokenBudgetSample(
      gated, col("lang"), col("doc_id"), col("n_tokens"), 3000L)
    val mixedStats = mixed.groupBy("lang").agg(sum("n_tokens").as("t")).collect()
    // each stratum stays within budget + one overshoot doc
    val maxDoc = gated.agg(max("n_tokens")).head().getInt(0).toLong
    assert(mixedStats.forall(_.getLong(1) <= 3000L + maxDoc))

    // 4. chunk + BFD pack: zero overflow by construction
    val chunks = Packing.chunkOversized(mixed, "doc_id", "n_tokens", 512)
      .select((col("doc_id") * lit(1L << 32) + col("chunk")).as("cid"), col("n_tokens"))
    val packed = Packing.packBestFitDecreasing(chunks, "cid", "n_tokens", 512)
    assert(packed.groupBy("seq_id").agg(sum("n_tokens").as("t"))
      .where(col("t") > 512).count() == 0)
    // token mass is conserved through chunking and packing
    assert(packed.agg(sum("n_tokens")).head().getLong(0) ==
      mixed.agg(sum(col("n_tokens").cast("long"))).head().getLong(0))
  }
}
