package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class ScalableWindowsSpec extends SparkSpecBase {
  import spark.implicits._

  // 3 "years" of a daily-ish series with gaps and non-uniform density
  private def series = Seq(
    (100L, 1.0), (101L, 2.0), (103L, 3.0), (105L, 4.0), (107L, 5.0),
    (109L, 6.0), (111L, 7.0), (113L, 8.0),
    (200L, 9.0), (201L, 10.0), (202L, 11.0), (204L, 12.0), (206L, 13.0),
    (208L, 14.0), (210L, 15.0),
    (300L, 16.0), (301L, 17.0), (305L, 18.0), (307L, 19.0), (309L, 20.0),
    (311L, 21.0), (313L, 22.0)
  ).toDF("t", "v")

  private val lookback = 4

  private def globalResult = {
    val w = Window.orderBy(col("t")).rowsBetween(-lookback.toLong, 0L)
    series
      .withColumn("s", sum(col("v")).over(w))
      .withColumn("n", count(lit(1)).over(w))
      .select("t", "v", "s", "n")
      .as[(Long, Double, Double, Long)].collect().sortBy(_._1).toSeq
  }

  private def bucketedResult(bucket: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
    ScalableWindows.trailingByBucket(series, "t", bucket, lookback,
        Seq("s" -> (w => sum(col("v")).over(w)),
            "n" -> (w => count(lit(1)).over(w))))
      .select("t", "v", "s", "n")
      .as[(Long, Double, Double, Long)].collect().sortBy(_._1).toSeq

  test("bucketed trailing frame is bit-identical to the global window") {
    assert(bucketedResult(c => c / 100) == globalResult)
  }

  test("holds when buckets are sparse (successor map skips empty buckets)") {
    // bucket by t/50: buckets 2,4,6 present; 3,5 absent entirely
    assert(bucketedResult(c => (c / 100) * 2) == globalResult)
  }

  test("single-bucket degenerate case matches too") {
    assert(bucketedResult(_ => lit(7)) == globalResult)
  }

  test("no single-partition window in the physical plan") {
    val df = ScalableWindows.trailingByBucket(series, "t", c => c / 100,
      lookback, Seq("s" -> (w => sum(col("v")).over(w))))
    // optimized logical plan: stable under AQE's physical re-wrapping
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    assert(windows.forall(_.partitionSpec.nonEmpty),
      "found a Window with no partition spec (global window)")
  }

  // ---- prefixSumByBucket ----

  private def prefixOracle(rows: Seq[(Long, Long)]): Map[Long, Long] = {
    var acc = 0L
    rows.sortBy(_._1).map { case (id, v) => val r = id -> acc; acc += v; r }.toMap
  }

  private def prefixRows(df: org.apache.spark.sql.DataFrame, nBuckets: Int) =
    ScalableWindows.prefixSumByBucket(df, "id", "v", "run", nBuckets)
      .select("id", "run").as[(Long, Long)].collect().toMap

  test("bucketed prefix sum is bit-identical to the sequential scan") {
    val rows = Seq((3L, 5L), (10L, 0L), (1L, 7L), (42L, 9L), (17L, 2L),
      (18L, 3L), (99L, 1L), (100L, 4L), (55L, 6L))
    val df = rows.toDF("id", "v").repartition(4)
    for (nBuckets <- Seq(1, 2, 7, 64, 1024))
      assert(prefixRows(df, nBuckets) == prefixOracle(rows),
        s"nBuckets=$nBuckets")
  }

  test("prefix sum survives sparse ids and cross-bucket boundaries") {
    // ids straddle arithmetic bucket edges at every width
    val rows = (0 until 200).map(i => (i.toLong * 13 + 7, (i % 5).toLong))
    val df = rows.toDF("id", "v").repartition(8)
    assert(prefixRows(df, 16) == prefixOracle(rows))
  }

  test("prefix sum rejects duplicate order keys and negative values") {
    val dup = Seq((1L, 2L), (1L, 3L)).toDF("id", "v")
    val e1 = intercept[IllegalArgumentException](prefixRows(dup, 4))
    assert(e1.getMessage.contains("duplicate"))
    val neg = Seq((1L, 2L), (2L, -3L)).toDF("id", "v")
    val e2 = intercept[IllegalArgumentException](prefixRows(neg, 4))
    assert(e2.getMessage.contains("non-negative"))
  }

  test("prefix sum on an empty frame yields zero offsets, no failure") {
    val empty = Seq.empty[(Long, Long)].toDF("id", "v")
    assert(prefixRows(empty, 4).isEmpty)
  }

  test("prefix sum survives a full-range (hash-valued) key domain") {
    // span > 2^63: (__o - lo) would overflow; the div-then-subtract
    // bucket form must not — and at nBuckets 1-2 the BigInt width
    // exceeds Long, where an unsaturated toLong wraps negative and
    // silently REVERSES the offsets
    val rows = Seq((Long.MinValue + 1, 3L), (-1000000007L, 5L), (0L, 7L),
      (42L, 2L), (Long.MaxValue - 1, 11L))
    val df = rows.toDF("id", "v").repartition(3)
    for (nBuckets <- Seq(1, 2, 8))
      assert(prefixRows(df, nBuckets) == prefixOracle(rows), s"nBuckets=$nBuckets")
  }

  test("all-null order keys are rejected loudly, not zero-filled") {
    val allNull = Seq(Some(1L), Some(2L)).toDF("v")
      .select(lit(null).cast("long").as("id"), col("v"))
    val e = intercept[IllegalArgumentException](prefixRows(allNull, 4))
    assert(e.getMessage.contains("non-null"))
  }

  test("prefix-sum windows are partitioned (never a global WindowExec)") {
    val df = (0 until 50).map(i => (i.toLong, 1L)).toDF("id", "v")
    val out = ScalableWindows.prefixSumByBucket(df, "id", "v", "run", 8)
    val windows = out.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    assert(windows.forall(_.partitionSpec.nonEmpty),
      "found a Window with no partition spec (global window)")
  }
}
