package graft.expressions

import graft.SparkSpecBase
import graft.functions.{cosineExact, cosinePreNormed, vecNormExact}
import org.apache.spark.sql.functions._
import scala.util.Random

/** r16 optimization contract: hoisting the two self-dot norms out of
  * the pair loop (`dot/(an·bn)` with per-row `an = sqrt(dot(a,a))`)
  * must be BIT-identical to `cosineExact`'s inline
  * `dot/(sqrt(dot(a,a))·sqrt(dot(b,b)))` — same IEEE operations on
  * the same values, the sqrt just moves from per-pair to per-row.
  * The ANN candidate re-rank and brute-force arms rely on this for
  * their oracle hashes.
  */
class CosinePreNormedSpec extends SparkSpecBase {
  import spark.implicits._

  test("bit-identical to cosineExact, including zero-norm null path") {
    val rnd = new Random(13)
    val adversarial = Seq(
      Array.fill(8)(0.0f),                    // zero norm → null cosine
      Array.fill(8)(1e-8f),                   // sub-quantum → zero norm
      Array(1.0f, -1.0f, 0.5f, -0.5f, 0.125f, 0.0f, -0.0f, 2.0f),
      Array.fill(8)(299.0f))                  // near the headroom bound
    val vecs = adversarial ++
      Seq.fill(150)(Array.fill(64)(rnd.nextFloat() * 2 - 1))
    val pairs = vecs.zipWithIndex.flatMap { case (v, i) =>
      vecs.drop(i + 1).take(4)
        .map(w => (v.take(math.min(v.length, w.length)),
          w.take(math.min(v.length, w.length))))
    }
    val rows = pairs.toDF("a", "b")
      .withColumn("an", vecNormExact(col("a")))
      .withColumn("bn", vecNormExact(col("b")))
      .select(
        cosineExact(col("a"), col("b")).as("inline"),
        cosinePreNormed(col("a"), col("b"), col("an"), col("bn"))
          .as("hoisted"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (r.isNullAt(0) || r.isNullAt(1))
        assert(r.isNullAt(0) && r.isNullAt(1),
          s"null disagreement: ${r.mkString(",")}")
      else
        assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(1)),
          s"bit mismatch: ${r.getDouble(0)} vs ${r.getDouble(1)}")
    }
  }
}
