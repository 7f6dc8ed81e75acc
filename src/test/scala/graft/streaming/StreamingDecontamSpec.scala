package graft.streaming

import graft.SparkSpecBase
import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** The streaming decontamination gate (q133's operator): planted
  * contaminated docs must be dropped in WHICHEVER micro-batch they
  * arrive, and the streamed kept set must equal the batch
  * bloomScreen's kept set row-for-row (the one-sidedness and parity
  * the driver row asserts in aggregate, pinned here on explicit
  * plants).
  */
class StreamingDecontamSpec extends SparkSpecBase {
  import spark.implicits._

  test("planted contaminated docs drop across micro-batches; stream ≡ batch kept set") {
    val bench = Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    // doc_id mod 3 routes the batches: plants land in batches 1 and 2,
    // every batch also carries clean rows
    val corpus = Seq(
      (20L, "xxx alpha beta gamma yyy"),        // plant, batch 2
      (21L, "clean text one two three"),        // batch 0
      (22L, "totally different words here"),    // batch 1
      (23L, "prefix words beta gamma delta"),   // plant, batch 2
      (24L, "more clean content words"),        // batch 0
      (25L, "zzz qqq gamma delta epsilon end")  // plant, batch 1
    ).toDF("doc_id", "text")
    val (kept, nBatches) = Replay.decontamScreenReplay(
      spark, corpus, bench, n = 3, benchShingles = 64L, nBatches = 3)
    assert(nBatches >= 3, s"expected ≥3 data batches, got $nBatches")
    val keptIds = kept.as[Long].collect().toSet
    // one-sidedness across batches: every plant dropped
    assert(!keptIds.contains(20L) && !keptIds.contains(23L) &&
      !keptIds.contains(25L), s"a planted contaminated doc leaked: $keptIds")
    // clean docs survive (fp 'possible' in theory; at 64-shingle
    // sizing and 3 clean docs the expected overshoot is ≪ 1e-4 — a
    // failure here means the screen, not luck, broke)
    assert(keptIds == Set(21L, 22L, 24L), keptIds)
    // stream ≡ batch parity, row for row
    val batchKept = Dedup.bloomScreen(corpus, "doc_id", "text",
        bench, "text", n = 3, benchShingles = 64L)
      .where(!col("bloom_hit")).select("doc_id").as[Long].collect().toSet
    assert(keptIds == batchKept, s"stream $keptIds != batch $batchKept")
  }
}
