package graft.expressions

import graft.SparkSpecBase
import graft.functions.{decimalDot, decimalDotNative}
import org.apache.spark.sql.functions._
import scala.util.Random

/** The scaled-long dot must be BIT-identical to the decimal-arithmetic
  * formulation (which is what the DuckDB oracle reproduces).
  */
class DecimalScaledDotSpec extends SparkSpecBase {
  import spark.implicits._

  test("bit-identical to decimalDot on random and adversarial vectors") {
    val rnd = new Random(7)
    val adversarial = Seq(
      Array.fill(8)(1.0f / 128), // x*1e6 lands exactly on .5 ties
      Array.fill(8)(-1.0f / 128),
      Array(0.0f, -0.0f, Float.MinPositiveValue, 1e-7f, -1e-7f, 0.5f, -0.5f, 0.125f),
      Array.fill(8)(999.999f))
    val vecs = adversarial ++ Seq.fill(200)(Array.fill(64)(rnd.nextFloat() * 2 - 1))
    val pairs = vecs.zipWithIndex.flatMap { case (v, i) =>
      vecs.drop(i + 1).take(3).map(w => (v.take(math.min(v.length, w.length)),
        w.take(math.min(v.length, w.length))))
    }
    val df = pairs.toDF("a", "b").select(
      decimalDotNative(col("a"), col("b")).as("nat"),
      decimalDot(col("a"), col("b")).cast("double").as("dec"))
    df.collect().foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"native ${r.getDouble(0)} != decimal ${r.getDouble(1)}")
    }
  }

  test("null propagation") {
    val df = Seq((Some(Array(1.0f)), None: Option[Array[Float]]))
      .toDF("a", "b")
      .select(decimalDotNative(col("a"), col("b")).as("d"))
    assert(df.collect()(0).isNullAt(0))
  }
}
