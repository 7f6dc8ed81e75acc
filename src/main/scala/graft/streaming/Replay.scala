package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Deterministic micro-batch REPLAY harness: drives a bounded frame
  * through a REAL Structured Streaming execution (file source,
  * `maxFilesPerTrigger=1`, `Trigger.AvailableNow`) and returns the
  * final state — so the streaming path itself (watermark plumbing,
  * state store, incremental aggregation) gets a driver CORRECTNESS
  * row, not just spec coverage (r7 verdict item 6).
  *
  * Determinism: the input is split into `nBatches` parquet files by
  * `pmod(splitCol, nBatches)` — a fixed partition of the rows — and
  * the aggregation runs in COMPLETE output mode, whose final table is
  * the aggregate over ALL arrived rows and therefore independent of
  * the batch arrival order the file lister happens to pick. The
  * replayed result must equal the batch twin exactly; the q106 oracle
  * is the same SQL as the batch rollup's.
  *
  * Scale shape: this harness is the TEST vehicle (bounded replay of a
  * fixture table through local files); production streams read the
  * same `hourlyRollupStream` plan from a real source — the operator
  * under test is identical, only the source differs.
  */
object Replay {

  /** Replay `events` through [[EventStreams.hourlyRollupStream]] in
    * `nBatches` micro-batches. Returns (final state, data batches
    * observed). Idempotent per (session, stage dir): the stage dir is
    * recreated and the memory sink view replaced on every call.
    */
  def hourlyRollupReplay(spark: SparkSession, events: DataFrame,
      nBatches: Int = 3, stageDir: String = "/tmp/graft_stream_replay_rollup")
      : (DataFrame, Int) = {
    require(nBatches >= 2, s"a replay needs ≥ 2 micro-batches, got $nBatches")
    val path = new org.apache.hadoop.fs.Path(stageDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) fs.delete(path, true)
    // one file per micro-batch: a fixed mod-N row partition, each
    // written as a single part file
    for (k <- 0 until nBatches)
      events.where(pmod(col("event_id"), lit(nBatches)) === k)
        .coalesce(1).write.mode("append").parquet(stageDir)
    val src = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "1").parquet(stageDir)
    val name = "graft_replay_rollup"
    spark.catalog.dropTempView(name)
    val q = EventStreams.hourlyRollupStream(src)
      .writeStream.format("memory").queryName(name)
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val dataBatches = q.recentProgress.count(_.numInputRows > 0)
    (spark.table(name), dataBatches)
  }
}
