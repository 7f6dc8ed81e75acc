package graft.streaming

import org.apache.spark.sql.DataFrame

/** foreachBatch sink patterns. Structured Streaming guarantees each
  * micro-batch a stable `batchId` that is REPLAYED with the same id
  * after a failure — exactly-once delivery is then the sink's job:
  * make the write idempotent in `batchId` and a replay overwrites
  * itself instead of duplicating.
  */
object BatchSinks {

  /** Idempotent parquet sink: batch `i` owns directory `batch_id=i`
    * (overwrite mode). A replayed batch rewrites its own directory —
    * at-least-once delivery becomes exactly-once output. The layout is
    * a standard hive-style partition column, so `spark.read.parquet(
    * outDir)` sees `batch_id` as a queryable column.
    */
  def idempotentParquet(outDir: String)(df: DataFrame, batchId: Long): Unit =
    df.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
}
