package graft.ops

import graft.SparkSpecBase
import graft.engine.Tables
import org.apache.spark.sql.functions._

/** Libm-drift guard for the floor-quantized-ln oracles (the r9
  * verdict's portable-ln fragility finding): q130/q131 (and q114's
  * position discounts) are hash-exact because JVM `Math.log` and
  * DuckDB `ln` return identical doubles on exact integer operands,
  * then both floor-quantize at 10⁶. That identity holds on this box
  * (probed bitwise in r7), but a different libm may differ by an ulp
  * — harmless UNLESS a pre-floor value sits so close to an integer
  * boundary that the ulp flips the floor.
  *
  * This spec recomputes every pre-floor double the fixture oracles
  * quantize and asserts a distance > [[MinEdgeDistance]] from its
  * floor edge — ~100× the worst few-ulp drift (ln results are
  * magnitude ≲ 20, so a few ulps ≈ 1e-14; scaled by 10⁶ ≈ 1e-8 at
  * the boundary). A regenerated fixture that lands a score on a
  * boundary fails HERE with the offending value, instead of flaking
  * as a bare hash mismatch on someone else's libm.
  *
  * q82/q83 share the quantize-then-sum discipline; their ln operands
  * are likewise exact integer ratios and were bitwise-probed in r7 —
  * their tie surfaces are the same ln-of-integer-ratio shape covered
  * by the q130/q131 guards below (same fixture vocabulary).
  * Cancels when the testdata is absent.
  */
class QuantizationBoundarySpec extends SparkSpecBase {
  import spark.implicits._

  private val sfDirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
  private def present(d: String) = new java.io.File(d).isDirectory

  /** Distance from v·10⁶ to its nearest integer edge. */
  private def edgeDist(v: Double): Double = {
    val s = v * 1000000.0
    val f = s - math.floor(s)
    math.min(f, 1.0 - f)
  }

  private val MinEdgeDistance = 1e-6

  test("q130 idf6: no fixture idf sits on a quantization boundary") {
    for (dir <- sfDirs if present(dir)) {
      val docs = Tables.documents(spark, dir)
      val n = docs.count()
      // distinct (term, df) — the exact operands q130 takes ln of
      val dfs = docs.select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("t"))
        .distinct().groupBy("t").agg(count(lit(1)).as("df"))
        .select("df").distinct().as[Long].collect()
      assert(dfs.nonEmpty)
      dfs.foreach { df =>
        val v = math.log((n + 1.0) / (df + 1.0))
        assert(edgeDist(v) > MinEdgeDistance,
          s"$dir: idf for df=$df (N=$n) is ${edgeDist(v)} from a floor edge " +
            "— the q130 oracle would flake under libm drift; re-derive or " +
            "move q130 to the q54 scaled-integer discipline")
      }
    }
  }

  test("q131 pmi6: no fixture PMI sits on a quantization boundary") {
    for (dir <- sfDirs if present(dir)) {
      val docs = Tables.documents(spark, dir)
      val toks = docs.select(col("doc_id"), TextOps.tokens(col("text")).as("w"))
      val grams = toks.where(size(col("w")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(w) - 1), " +
            "i -> struct(w[i-1] AS a, w[i] AS b))")).as("g"))
        .select(col("g.a").as("a"), col("g.b").as("b"))
      val pairC = grams.groupBy("a", "b").agg(count(lit(1)).as("n_pair"))
        .where(col("n_pair") >= 3L)
      val uniC = toks.select(explode(col("w")).as("t"))
        .groupBy("t").agg(count(lit(1)).as("cu"))
      val tp = grams.count()
      val tu = uniC.agg(sum("cu")).as[Long].head()
      val rows = pairC
        .join(uniC.select(col("t").as("a"), col("cu").as("ca")), Seq("a"))
        .join(uniC.select(col("t").as("b"), col("cu").as("cb")), Seq("b"))
        .select(col("n_pair"), col("ca"), col("cb"))
        .as[(Long, Long, Long)].collect()
      assert(rows.nonEmpty)
      rows.foreach { case (np, ca, cb) =>
        // the EXACT expression shape q131 quantizes (term order matters)
        val v = math.log(np.toDouble) + 2.0 * math.log(tu.toDouble) -
          math.log(tp.toDouble) - math.log(ca.toDouble) - math.log(cb.toDouble)
        assert(edgeDist(v) > MinEdgeDistance,
          s"$dir: pmi for (n_pair=$np, ca=$ca, cb=$cb, tp=$tp, tu=$tu) is " +
            s"${edgeDist(v)} from a floor edge — the q131 oracle would " +
            "flake under libm drift")
      }
    }
  }

  test("q114 discounted gains: floor(rel·10⁶/ln(rank+1)) clears every " +
      "boundary over the plausible label domain") {
    // q114 quantizes rel·10⁶/ln(rank+1) (Retrieval.scala:194). rel is a
    // shared-token count (small int); sweep a superset of the fixture
    // label domain × the k=10 rank window. Drift here scales with the
    // VALUE: a 1-ulp ln error (~2.2e-16 relative, the worst a real
    // libm's not-correctly-rounded ln produces) moves v by ≈ v·1e-15;
    // guard at 100× that (v·1e-13) plus an absolute floor.
    for (rel <- 1 to 200; rank <- 1 to 10) {
      val v = rel * 1000000.0 / math.log(rank + 1.0)
      val f = v - math.floor(v)
      val d = math.min(f, 1.0 - f)
      assert(d > 1e-13 * v + 1e-9,
        s"gain(rel=$rel, rank=$rank) = $v is $d from a floor edge")
    }
  }
}
