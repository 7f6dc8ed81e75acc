package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def points = (0L until 200L).map(p => (p, p * 7 % 1000)).toDF("pid", "x")
  // intervals of assorted widths, including empty and bin-straddling
  private def intervals = Seq(
    (1L, 0L, 50L), (2L, 45L, 46L), (3L, 100L, 300L), (4L, 500L, 500L), // empty
    (5L, 990L, 1000L), (6L, 64L, 128L), (7L, 0L, 1000L)
  ).toDF("iid", "s", "e")

  private def naive = points.crossJoin(intervals)
    .where(col("x") >= col("s") && col("x") < col("e"))
    .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq

  test("binnedRangeJoin matches the naive theta join for assorted bin widths") {
    for (w <- Seq(1L, 7L, 64L, 100L, 1024L)) {
      val got = RangeJoin.binnedRangeJoin(points, "x", intervals, "s", "e", w)
        .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
      assert(got == naive, s"mismatch at binWidth=$w")
    }
  }

  test("no duplicate matches when an interval spans many bins") {
    val got = RangeJoin.binnedRangeJoin(points, "x", intervals, "s", "e", 10L)
      .select("pid", "iid").as[(Long, Long)].collect().toSeq
    assert(got.size == got.distinct.size)
  }

  test("plans an equi-join (hash/sort-merge), not a nested loop") {
    val df = RangeJoin.binnedRangeJoin(points, "x", intervals, "s", "e", 10L)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
