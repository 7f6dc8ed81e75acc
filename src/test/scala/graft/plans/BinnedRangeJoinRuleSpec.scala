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

  test("rule off: pure range join plans a nested loop (the problem)") {
    val plan = thetaJoin.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
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
