package graft.streaming

import graft.SparkSpecBase
import graft.ops.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The text-curation operators are pure Column expressions (zero
  * UDFs, zero state), so the SAME transform must run unchanged on a
  * streaming DataFrame — documents scored/filtered as they arrive,
  * with batch/stream row parity. This is the streaming face of the
  * training-data pipeline: the batch queries (q18-q20, q70) and a
  * readStream ingest share one implementation.
  */
class StreamingTextOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the riverbank today"),
    (1L, "x"),
    (2L, "Contact admin@example.com or visit https://example.com for info"),
    (3L, "le chat noir dort sur le tapis rouge dans la maison"))

  /** The shared transform — one definition for both execution modes. */
  private def curate(df: DataFrame): DataFrame =
    df.select(col("doc_id"),
      TextOps.tokenCount(col("text")).as("n_tokens"),
      TextOps.qualityScore(col("text")).as("quality"),
      TextOps.langId(col("text")).as("pred_lang"),
      length(TextOps.scrubPii(col("text"))).as("scrubbed_len"))

  test("quality/langid/scrub transforms run unchanged on a stream, row-parity") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = curate(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("curated")
      .outputMode("append").start()
    try {
      mem.addData(docs: _*)
      q.processAllAvailable()
      val streamed = spark.table("curated")
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      val batch = curate(docs.toDF("doc_id", "text"))
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      assert(streamed == batch)
      assert(streamed.length == 4)
    } finally q.stop()
  }

  test("streaming quality FILTER drops low-quality docs as they arrive") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = curate(mem.toDF().toDF("doc_id", "text"))
      .where(col("quality") >= 0.5 && col("n_tokens") >= 5)
      .writeStream.format("memory").queryName("kept_stream")
      .outputMode("append").start()
    try {
      mem.addData(docs: _*)
      q.processAllAvailable()
      val kept = spark.table("kept_stream")
        .select("doc_id").as[Long].collect().sorted.toSeq
      // doc 1 ("x") fails both gates; the rest are wordy enough
      assert(!kept.contains(1L))
      assert(kept.nonEmpty)
    } finally q.stop()
  }

  test("gopherRules and winnow run unchanged on a stream, row-parity") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val streamDf = mem.toDF().toDF("doc_id", "text")
    val g = TextOps.gopherRules(streamDf, "doc_id", "text")
      .writeStream.format("memory").queryName("gopher_stream")
      .outputMode("append").start()
    val wn = TextOps.winnow(streamDf, "doc_id", "text")
      .writeStream.format("memory").queryName("winnow_stream")
      .outputMode("append").start()
    try {
      mem.addData(docs: _*)
      g.processAllAvailable(); wn.processAllAvailable()
      val gStream = spark.table("gopher_stream")
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      val gBatch = TextOps.gopherRules(docs.toDF("doc_id", "text"),
        "doc_id", "text").orderBy("doc_id").collect().map(_.toSeq).toSeq
      assert(gStream == gBatch)
      val wStream = spark.table("winnow_stream")
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      val wBatch = TextOps.winnow(docs.toDF("doc_id", "text"),
        "doc_id", "text").orderBy("doc_id").collect().map(_.toSeq).toSeq
      assert(wStream == wBatch)
      assert(wStream.length == 4)
    } finally { g.stop(); wn.stop() }
  }
}
