package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

/** Production-shaped streaming: readStream over a parquet DIRECTORY
  * (the file-arrival pattern), incremental micro-batches as new files
  * land, watermark rollup matching the batch result.
  */
class FileStreamSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("file-arrival stream processes incrementally and matches batch rollup") {
    val dir = Files.createTempDirectory("graft-stream").toString + "/events"
    val batch1 = Seq(
      (1L, ts("2024-01-01 10:00:05"), 7L, "view", 1.0, "{}"),
      (2L, ts("2024-01-01 10:20:00"), 7L, "view", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    batch1.write.parquet(dir)

    val stream = spark.readStream
      .schema(batch1.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    val q = EventStreams.hourlyRollupStream(stream)
      .writeStream.format("memory").queryName("file_rollup")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // append outputs nothing until the watermark passes the window —
      // land a later file to advance event time beyond 10:00-11:00 + 2h
      Seq((3L, ts("2024-01-01 14:30:00"), 9L, "click", 4.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("append").parquet(dir)
      q.processAllAvailable()
      q.processAllAvailable() // one more trigger to emit closed windows
      val got = spark.sql(
        "SELECT hour, event_type, n_events, value_sum FROM file_rollup ORDER BY hour")
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
      assert(got.toSeq == Seq(("2024-01-01 10:00:00.0", "view", 2L, 3.0)),
        s"got: ${got.toSeq}")
    } finally q.stop()
  }
}
