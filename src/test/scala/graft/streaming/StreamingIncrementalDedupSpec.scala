package graft.streaming

import graft.SparkSpecBase
import graft.ops.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Parity of the streaming ingest screen (TextStreams
  * .incrementalDedupStream — stream-static join against the stored
  * corpus band index) with the batch operator (q78's
  * Dedup.incrementalLshPairs): on a replayed stream the emitted pair
  * SET must equal the batch pair set (the stream may emit a pair once
  * per colliding band — the documented delivery contract — so the
  * comparison is over sets), with identical verified Jaccard values.
  */
class StreamingIncrementalDedupSpec extends SparkSpecBase {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog again and again today"
  private def corpusRows = Seq(
    (10L, base), (11L, base),
    (12L, "completely different text with no overlap at all here now ok"))
  private def batchRows = Seq(
    (20L, base + " x"), (21L, base + " x"),
    (30L, "unrelated batch document content nothing shared with anyone else"))

  test("replayed stream reproduces the batch incremental pair set") {
    val corpus = corpusRows.toDF("doc_id", "text")
    val batch = batchRows.toDF("doc_id", "text")
    val expected = Dedup.incrementalLshPairs(corpus, batch, "doc_id", "text",
        n = 3, bands = 4, rowsPerBand = 8, threshold = 0.6)
      .select("batch_id", "corpus_id", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    assert(expected.nonEmpty, "fixture must contain cross-side near-dups")

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = TextStreams.incrementalDedupStream(
        mem.toDF().toDF("doc_id", "text"), "doc_id", "text",
        corpus, n = 3, bands = 4, rowsPerBand = 8, threshold = 0.6)
      .writeStream.format("memory").queryName("inc_dedup_stream")
      .outputMode("append").start()
    try {
      // two micro-batches: screening is per-trigger, no cross-trigger
      // state to carry
      val (first, second) = batchRows.splitAt(1)
      mem.addData(first: _*)
      q.processAllAvailable()
      mem.addData(second: _*)
      q.processAllAvailable()
      val got = spark.table("inc_dedup_stream")
        .select("batch_id", "corpus_id", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
      assert(got == expected, s"stream $got != batch $expected")
      // no batch-internal pairs possible by construction: every
      // emitted corpus_id is from the static side
      assert(got.forall { case (b, c, _) => b >= 20L && c < 20L })
    } finally q.stop()
  }
}
