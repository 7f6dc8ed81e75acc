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
}
