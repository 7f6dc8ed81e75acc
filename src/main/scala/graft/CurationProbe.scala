package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-timing probe for the q129 streaming-curation harness: where
  * do the seconds go — training, staging, or the per-micro-batch sink
  * work? Run: `runMain graft.CurationProbe <sfDir>`.
  */
object CurationProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[probe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    import graft.ops.{Selection, TextOps}
    val docs = graft.engine.Tables.documents(spark, sfDir)
    // warm
    docs.count()
    for (round <- 1 to 2) {
      System.err.println(s"[probe] ---- round $round ----")
      val (w, defw6) = time("train classifier") {
        Selection.collectClassifierWeights(
          docs.where(col("doc_id") % 7 === 0),
          docs.where(col("doc_id") % 7 === 3),
          "doc_id", "text", nBuckets = 1024)
      }
      val gatedBatch = time("batch-side gate (reference)") {
        Selection.scoreWithClassifier(
            docs.select(col("doc_id").cast("long").as("doc_id"), col("text"))
              .withColumn("n_tokens", TextOps.tokenCount(col("text")).cast("long")),
            "doc_id", "text", w, defw6, nBuckets = 1024,
            keepCols = Seq("n_tokens"))
          .where(col("keep")).select("doc_id", "n_tokens").count()
      }
      System.err.println(s"[probe] kept $gatedBatch")
      val (layout, nb) = time("full curationLoaderReplay") {
        graft.streaming.Replay.curationLoaderReplay(spark, docs, window = 512L)
      }
      System.err.println(s"[probe] layout rows ${layout.count()} batches $nb")
    }
    spark.stop()
  }
}
