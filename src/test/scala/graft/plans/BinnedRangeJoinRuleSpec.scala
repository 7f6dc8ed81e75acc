package graft.plans

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class BinnedRangeJoinRuleSpec extends SparkSpecBase {
  import spark.implicits._

  private def points = (0L until 300L).map(i => (i, i * 13 % 2000)).toDF("pid", "x")
  private def intervals = Seq(
    (1L, 0L, 100L), (2L, 90L, 95L), (3L, 500L, 1500L), (4L, 700L, 700L),
    (5L, 1990L, 2300L)
  ).toDF("iid", "s", "e")

  private def thetaJoin = points.join(intervals,
    col("s") <= col("x") && col("x") < col("e"))

  private def withRule[A](width: Long)(body: => A): A = {
    graft.GraftExtensions.register(spark)
    spark.conf.set("spark.graft.rangeJoin.binWidth", width.toString)
    try body finally spark.conf.unset("spark.graft.rangeJoin.binWidth")
  }

  test("rule disabled (binWidth=0): pure range join plans a nested loop (the problem)") {
    withRule(0L) {
      val plan = thetaJoin.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    }
  }

  test("conf unset: width auto-derived from bound-side stats, join rewrites exactly") {
    graft.GraftExtensions.register(spark)
    spark.conf.unset("spark.graft.rangeJoin.binWidth")
    val expected = withRule(0L) { // disabled -> nested loop reference run
      thetaJoin.select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
    }
    val df = thetaJoin
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("Generate explode"), plan)
    val got = df.select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
    assert(got == expected)
  }

  test("rule on: same join plans bin-equi (no nested loop), same rows") {
    val expected = thetaJoin.select("pid", "iid")
      .as[(Long, Long)].collect().sorted.toSeq
    withRule(100L) {
      val df = thetaJoin
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(plan.contains("Generate explode"), plan)
      val got = df.select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
      assert(got == expected)
    }
  }

  test("rule leaves equi joins and non-range conditions alone") {
    withRule(100L) {
      val equi = points.join(intervals, col("x") === col("s"))
      assert(!equi.queryExecution.executedPlan.toString.contains("Generate"))
      // one-sided condition: not the two-bound pattern
      val half = points.join(intervals, col("x") >= col("s"))
      assert(!half.queryExecution.executedPlan.toString.contains("Generate"))
    }
  }

  test("closed upper bound (BETWEEN shape) rewrites and stays exact") {
    val naive = points.join(intervals,
      col("x") >= col("s") && col("x") <= col("e"))
    val expected = naive.select("pid", "iid").as[(Long, Long)]
      .collect().sorted.toSeq
    withRule(100L) {
      val df = points.join(intervals,
        col("x") >= col("s") && col("x") <= col("e"))
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      val got = df.select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
      assert(got == expected)
      // single-point intervals (s == e) must survive the closed filter
      val single = points.join(Seq((9L, 13L, 13L)).toDF("iid", "s", "e"),
          col("x") >= col("s") && col("x") <= col("e"))
        .select("pid").as[Long].collect()
      assert(single.length == points.where(col("x") === 13).count())
    }
  }

  test("timestamp axes: theta join on time windows rewrites exactly") {
    def ts(days: Long) = to_timestamp(lit("2024-01-01")) + expr(s"INTERVAL $days DAYS")
    val evs = (0L until 200L).map(d => (d, d % 60)).toDF("eid", "d")
      .select(col("eid"), (to_timestamp(lit("2024-01-01")) +
        expr("make_interval(0, 0, 0, d, 0, 0, 0)")).as("t"))
    val windows = Seq((1L, 0L, 10L), (2L, 15L, 16L), (3L, 40L, 70L))
      .toDF("wid", "ds", "de")
      .select(col("wid"),
        (to_timestamp(lit("2024-01-01")) +
          expr("make_interval(0, 0, 0, ds, 0, 0, 0)")).as("ws"),
        (to_timestamp(lit("2024-01-01")) +
          expr("make_interval(0, 0, 0, de, 0, 0, 0)")).as("we"))
    val naive = evs.join(windows, col("t") >= col("ws") && col("t") < col("we"))
      .select("eid", "wid").as[(Long, Long)].collect().sorted.toSeq
    assert(naive.nonEmpty)
    withRule(86400L * 7) { // weekly bins on epoch seconds
      val df = evs.join(windows, col("t") >= col("ws") && col("t") < col("we"))
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      val got = df.select("eid", "wid").as[(Long, Long)].collect().sorted.toSeq
      assert(got == naive)
    }
  }

  test("unparseable bin-width conf disables the rule instead of failing queries") {
    graft.GraftExtensions.register(spark)
    spark.conf.set("spark.graft.rangeJoin.binWidth", "not-a-number")
    try {
      // the rule runs on every plan — even a trivial query would throw
      // if the conf were parsed with a bare toLong
      assert(Seq(1, 2, 3).toDF("v").agg(sum(col("v"))).head().getLong(0) == 6L)
      val plan = thetaJoin.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    } finally spark.conf.unset("spark.graft.rangeJoin.binWidth")
  }

  test("flipped operand order still matches; swapped sides still match") {
    val expected = thetaJoin.select("pid", "iid")
      .as[(Long, Long)].collect().sorted.toSeq
    withRule(64L) {
      val flipped = points.join(intervals,
        col("x") >= col("s") && col("e") > col("x"))
      assert(flipped.select("pid", "iid").as[(Long, Long)]
        .collect().sorted.toSeq == expected)
      val swappedSides = intervals.join(points,
        col("s") <= col("x") && col("x") < col("e"))
      val got = swappedSides.select("pid", "iid").as[(Long, Long)]
        .collect().sorted.toSeq
      assert(got == expected)
      assert(!swappedSides.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
    }
  }
}
