package graft.expressions

import graft.SparkSpecBase
import graft.functions.nearestPackedCellsNative
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The packed-matrix fine-assignment kernel (the fine layer of the
  * two-level IVF quantizer) pinned against a declarative sort-slice
  * oracle — the [[NearestCentroidSpec]] discipline applied to the
  * column-carried matrix shape: bit-identity on clean data, defined
  * degradation (all-ties positions 0..n−1) on corrupt vectors, null
  * propagation on null inputs.
  */
class NearestPackedCellsSpec extends SparkSpecBase {
  import spark.implicits._

  /** Declarative oracle: (dot desc, position asc) sort-slice, the
    * [[graft.ops.Similarity.probeCellsDeclarative]] formulation over a
    * packed column instead of a driver literal.
    */
  private def declarativeProbe(vec: Column, packed: Column, n: Int): Column =
    transform(
      slice(reverse(array_sort(
        transform(sequence(lit(0), size(packed) - 1),
          i => struct(
            aggregate(zip_with(vec, element_at(packed, i + 1),
              (x, w) => x.cast("double") * w),
              lit(0.0), (acc, v) => acc + v).as("dot"),
            (-i).as("nidx"))))), 1, n),
      s => (-s.getField("nidx")).cast("long"))

  private def randomPacked(m: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(m)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  test("native packed probe ≡ declarative sort-slice, per-row matrices") {
    val rnd = new scala.util.Random(11L)
    // every row carries its OWN matrix — the join-shaped usage
    val rows = (0 until 300).map { i =>
      (i.toLong, Array.fill(10)(rnd.nextGaussian()),
        randomPacked(m = 7 + i % 5, dim = 10, seed = 100L + i % 13)
          .map(_.toArray).toArray)
    }.toDF("id", "vec", "packed")
    for (n <- Seq(1, 3, 9)) {
      val both = rows.select(
        nearestPackedCellsNative(col("vec"), col("packed"), n).as("native"),
        declarativeProbe(col("vec"), col("packed"), n).as("oracle"))
      val bad = both.where(not(col("native") <=> col("oracle"))).collect()
      assert(bad.isEmpty, s"n=$n: ${bad.take(3).mkString("; ")}")
    }
  }

  test("corrupt vectors degrade to the all-ties order; null inputs " +
      "propagate null; dim mismatch is all-ties") {
    val packed = randomPacked(m = 4, dim = 3, seed = 1L)
      .map(_.toArray).toArray
    val df = Seq(
      (1L, Array(1.0, Double.NaN, 0.0)), // NaN element
      (2L, Array(1.0, 2.0)),             // dim mismatch vs every centroid
      (3L, Array(0.5, -0.5, 1.5))        // clean
    ).toDF("id", "vec").withColumn("packed", typedLit(packed.map(_.toSeq).toSeq))
    val got = df.select(col("id"),
        nearestPackedCellsNative(col("vec"), col("packed"), 2).as("p"))
      .orderBy("id").as[(Long, Seq[Long])].collect()
    assert(got(0)._2 == Seq(0L, 1L), s"NaN vec must be all-ties: ${got(0)}")
    assert(got(1)._2 == Seq(0L, 1L), s"dim mismatch must be all-ties: ${got(1)}")
    assert(got(2)._2.length == 2 && got(2)._2.toSet.size == 2)
    // null vector / null matrix → null result
    val nulls = Seq((1L, Option.empty[Array[Double]]))
      .toDF("id", "vec").withColumn("packed", typedLit(packed.map(_.toSeq).toSeq))
    assert(nulls.select(nearestPackedCellsNative(col("vec"), col("packed"), 2))
      .head().isNullAt(0))
    val nullm = Seq((1L, Array(1.0, 0.0, 0.0))).toDF("id", "vec")
      .withColumn("packed", lit(null).cast("array<array<double>>"))
    assert(nullm.select(nearestPackedCellsNative(col("vec"), col("packed"), 2))
      .head().isNullAt(0))
  }

  test("nProbe past the matrix size returns every position, best first") {
    val packed = randomPacked(m = 3, dim = 4, seed = 9L)
    val df = Seq((1L, Array(0.3, -0.1, 0.7, 0.2)))
      .toDF("id", "vec").withColumn("packed", typedLit(packed))
    val both = df.select(
      nearestPackedCellsNative(col("vec"), col("packed"), 10).as("native"),
      declarativeProbe(col("vec"), col("packed"), 10).as("oracle"))
    val r = both.head()
    assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    assert(r.getSeq[Long](0).toSet == Set(0L, 1L, 2L))
  }
}
