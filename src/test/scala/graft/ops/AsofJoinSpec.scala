package graft.ops

import graft.SparkSpecBase
import java.sql.Timestamp

class AsofJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("asofJoin picks latest at-or-before right row per key") {
    val quotes = Seq(
      (1L, ts("2024-01-01 09:00:00"), 100.0),
      (1L, ts("2024-01-01 12:00:00"), 110.0),
      (2L, ts("2024-01-01 10:00:00"), 50.0)
    ).toDF("user_id", "t", "price")
    val events = Seq(
      (10L, 1L, ts("2024-01-01 08:00:00")), // before any quote -> null
      (11L, 1L, ts("2024-01-01 09:00:00")), // equal ts -> inclusive match 100
      (12L, 1L, ts("2024-01-01 11:59:59")), // -> 100
      (13L, 1L, ts("2024-01-01 12:00:01")), // -> 110
      (14L, 2L, ts("2024-01-02 00:00:00")), // -> 50
      (15L, 3L, ts("2024-01-01 12:00:00"))  // unseen key -> null
    ).toDF("event_id", "user_id", "t")
    val got = AsofJoin.asofJoin(events, quotes, "user_id", "t", Seq("price"))
      .orderBy("event_id")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(r.fieldIndex("price")))))
    assert(got.toSeq == Seq(
      (10L, None), (11L, Some(100.0)), (12L, Some(100.0)),
      (13L, Some(110.0)), (14L, Some(50.0)), (15L, None)))
  }

  test("forward direction picks earliest at-or-after; tolerance nulls far matches") {
    val quotes = Seq(
      (1L, ts("2024-01-01 09:00:00"), 100.0),
      (1L, ts("2024-01-01 12:00:00"), 110.0)
    ).toDF("user_id", "t", "price")
    val events = Seq(
      (10L, 1L, ts("2024-01-01 08:59:00")), // next quote 60s away -> 100
      (11L, 1L, ts("2024-01-01 09:00:00")), // equal ts inclusive -> 100
      (12L, 1L, ts("2024-01-01 09:00:01")), // next is 12:00, ~3h away
      (13L, 1L, ts("2024-01-01 13:00:00"))  // nothing after -> null
    ).toDF("event_id", "user_id", "t")
    val within = AsofJoin.asofJoin(events, quotes, "user_id", "t", Seq("price"),
        direction = "forward", toleranceSeconds = Some(120L))
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), Option(r.get(r.fieldIndex("price")))))
    assert(within.toSeq == Seq(
      (10L, Some(100.0)), (11L, Some(100.0)), (12L, None), (13L, None)))
    val noTol = AsofJoin.asofJoin(events, quotes, "user_id", "t", Seq("price"),
        direction = "forward")
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), Option(r.get(r.fieldIndex("price")))))
    assert(noTol.toSeq == Seq(
      (10L, Some(100.0)), (11L, Some(100.0)), (12L, Some(110.0)), (13L, None)))
  }

  test("backward tolerance nulls stale matches") {
    val quotes = Seq((1L, ts("2024-01-01 09:00:00"), 100.0)).toDF("user_id", "t", "price")
    val events = Seq(
      (10L, 1L, ts("2024-01-01 09:30:00")), // 30 min stale
      (11L, 1L, ts("2024-01-01 09:01:00"))  // 60s fresh
    ).toDF("event_id", "user_id", "t")
    val got = AsofJoin.asofJoin(events, quotes, "user_id", "t", Seq("price"),
        toleranceSeconds = Some(300L))
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), Option(r.get(r.fieldIndex("price")))))
    assert(got.toSeq == Seq((10L, None), (11L, Some(100.0))))
  }

  test("null keys never match null keys (SQL join semantics)") {
    val quotes = Seq(
      (Some(1L), ts("2024-01-01 09:00:00"), 100.0),
      (None, ts("2024-01-01 08:00:00"), 666.0) // null-key right row enriches nothing
    ).toDF("user_id", "t", "price")
    val events = Seq(
      (10L, Some(1L), ts("2024-01-01 10:00:00")), // normal match -> 100
      (11L, Option.empty[Long], ts("2024-01-01 10:00:00")) // null key -> null payload
    ).toDF("event_id", "user_id", "t")
    val got = AsofJoin.asofJoin(events, quotes, "user_id", "t", Seq("price"))
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), Option(r.get(r.fieldIndex("price")))))
    assert(got.toSeq == Seq((10L, Some(100.0)), (11L, None)))
  }

  test("left columns are preserved untouched") {
    val right = Seq((1L, ts("2024-01-01 00:00:00"), "payload")).toDF("k", "t", "p")
    val left = Seq((1L, ts("2024-01-02 00:00:00"), "own-data", 42))
      .toDF("k", "t", "extra", "num")
    val out = AsofJoin.asofJoin(left, right, "k", "t", Seq("p"))
    assert(out.columns.toSeq == Seq("k", "t", "extra", "num", "p"))
    val r = out.collect()(0)
    assert(r.getAs[String]("extra") == "own-data" && r.getAs[Int]("num") == 42)
    assert(r.getAs[String]("p") == "payload")
  }
}
