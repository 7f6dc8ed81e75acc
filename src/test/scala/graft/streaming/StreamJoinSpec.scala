package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

case class Ev(event_id: Long, user_id: Long, ts: Timestamp)

class StreamJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("watermarked stream-stream join emits clicks within the window only") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[Ev]
    val clicks = MemoryStream[Ev]
    val joined = EventStreams.impressionClickJoin(
      imps.toDF(), clicks.toDF(), withinSeconds = 60)
    val q = joined.writeStream.format("memory").queryName("attr")
      .outputMode("append").start()
    try {
      imps.addData(
        Ev(1L, 7L, ts("2024-01-01 10:00:00")),
        Ev(2L, 8L, ts("2024-01-01 10:00:10")))
      clicks.addData(
        Ev(100L, 7L, ts("2024-01-01 10:00:30")), // within 60s -> match
        Ev(101L, 8L, ts("2024-01-01 10:02:00")), // 110s late -> no match
        Ev(102L, 9L, ts("2024-01-01 10:00:40"))) // no impression -> no match
      q.processAllAvailable()
      val got = spark.sql("SELECT imp_id, click_id FROM attr")
        .as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 100L)))
    } finally q.stop()
  }

  test("batch execution of the same join function agrees (unified API)") {
    val imps = Seq(Ev(1L, 7L, ts("2024-01-01 10:00:00"))).toDF()
    val clicks = Seq(
      Ev(100L, 7L, ts("2024-01-01 10:00:30")),
      Ev(101L, 7L, ts("2024-01-01 10:05:00"))).toDF()
    val got = EventStreams.impressionClickJoin(imps, clicks, 60)
      .select("imp_id", "click_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 100L)))
  }
}
