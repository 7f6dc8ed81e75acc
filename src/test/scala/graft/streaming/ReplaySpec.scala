package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** The replay harness must drive a REAL multi-micro-batch streaming
  * execution whose final state equals the batch rollup exactly — the
  * q106 contract.
  */
class ReplaySpec extends SparkSpecBase {
  import spark.implicits._

  private def events = {
    val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00")
    (0 until 50).map { i =>
      (i.toLong,
        new java.sql.Timestamp(base.getTime + i * 7 * 60 * 1000L), // 7-min spacing
        if (i % 3 == 0) "click" else "view",
        i * 0.125)
    }.toDF("event_id", "ts", "event_type", "value")
  }

  test("replayed streaming rollup equals the batch rollup, over ≥3 micro-batches") {
    val (state, nBatches) = Replay.hourlyRollupReplay(spark, events,
      stageDir = "/tmp/graft_replay_spec")
    assert(nBatches >= 3, s"replay collapsed into $nBatches batches")
    val streamed = state.select("hour", "event_type", "n_events", "value_sum")
      .collect().map(_.toSeq).toSet
    val batch = EventStreams.hourlyRollup(events)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch,
      s"streamed=$streamed\nbatch=$batch")
  }

  test("replay is idempotent: a second run replaces stage dir and sink view") {
    val (s1, _) = Replay.hourlyRollupReplay(spark, events,
      stageDir = "/tmp/graft_replay_spec_idem")
    val first = s1.collect().map(_.toSeq).toSet
    val (s2, n2) = Replay.hourlyRollupReplay(spark, events,
      stageDir = "/tmp/graft_replay_spec_idem")
    assert(n2 >= 3)
    assert(s2.collect().map(_.toSeq).toSet == first)
  }
}
