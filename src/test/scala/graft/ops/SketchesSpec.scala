package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpecBase {
  import spark.implicits._

  // 10k rows, user u = i % 700 across 20 "days"
  private def data = (0 until 10000)
    .map(i => (i % 20, (i % 700).toLong, s"type${i % 5}"))
    .toDF("day", "user", "etype")

  test("hll union estimate within 5% of exact distinct") {
    val daily = Sketches.hllSketches(data, Seq(col("day")), col("user"))
    assert(daily.count() == 20)
    val est = Sketches.hllRollup(daily, Seq(lit(1)), "est")
      .select(col("est").cast("double")).head().getDouble(0)
    assert(math.abs(est - 700.0) / 700.0 < 0.05, s"est=$est")
  }

  test("per-day sketches merge to ~the direct sketch's estimate") {
    val daily = Sketches.hllSketches(data, Seq(col("day")), col("user"))
    val merged = Sketches.hllRollup(daily, Seq(lit(1)), "est")
      .select(col("est").cast("long")).head().getLong(0)
    val direct = data.agg(
      hll_sketch_estimate(hll_sketch_agg(col("user"), lit(12))).cast("long"))
      .head().getLong(0)
    // not bit-identical: union promotes sparse-mode sketches to dense
    // HLL, so merged and direct can differ within the error bound
    assert(math.abs(merged - direct).toDouble / direct < 0.05,
      s"merged=$merged direct=$direct")
  }

  test("count-min estimates bound exact counts from above within eps*n") {
    val exact = data.groupBy("etype").count().as[(String, Long)].collect().toMap
    val est = Sketches.countMinEstimates(data, col("etype"),
        exact.keys.toSeq.sorted, eps = 1e-3)
      .as[(String, Long)].collect().toMap
    for ((k, e) <- est) {
      assert(e >= exact(k), s"$k: estimate below exact")
      assert(e <= exact(k) + (1e-3 * 10000).ceil.toLong + 1, s"$k: estimate too high")
    }
  }

  test("monitoredKeys: bounded domain collects; an over-cap domain fails loudly") {
    val small = Seq("a", "b", "c", "b", null).toDF("k")
    assert(Sketches.monitoredKeys(small, col("k"), cap = 10) == Seq("a", "b", "c"))
    // exactly-at-cap is fine
    assert(Sketches.monitoredKeys(small, col("k"), cap = 3).length == 3)
    // past the cap: loud failure, never a silently truncated key set
    val wide = (0 until 50).map(i => f"k$i%03d").toDF("k")
    val e = intercept[IllegalArgumentException] {
      Sketches.monitoredKeys(wide, col("k"), cap = 49)
    }
    assert(e.getMessage.contains("exceeds cap"))
    // a DERIVED key expression resolves too (r10 ADVICE finding: the
    // null filter used to reference the source columns after the
    // projection had dropped them — concat(a, b) threw AnalysisException)
    val two = Seq(("x", "1"), ("y", null), ("x", "1")).toDF("a", "b")
    assert(Sketches.monitoredKeys(two, concat(col("a"), col("b")), cap = 10)
      == Seq("x1"))
  }

  test("percentile_approx rank error is within the accuracy bound") {
    // 10k distinct values 0..9999: exact pth percentile ~ p*9999
    val vals = (0 until 10000).map(_.toDouble).toDF("v")
    val row = vals.agg(
      percentile_approx(col("v"), lit(0.5), lit(1000)).as("p50"),
      percentile_approx(col("v"), lit(0.99), lit(1000)).as("p99")).head()
    // accuracy=1000 -> rank error <= n/1000 = 10 ranks (use 2x slack)
    assert(math.abs(row.getDouble(0) - 4999.0) <= 20.0)
    assert(math.abs(row.getDouble(1) - 9899.0) <= 20.0)
  }
}
