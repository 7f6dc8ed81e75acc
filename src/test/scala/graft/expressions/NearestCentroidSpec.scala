package graft.expressions

import graft.SparkSpecBase
import graft.ops.Similarity
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The native two-level centroid-assignment kernel is EXACT, not
  * approximate: these specs pin bit-identity against the declarative
  * flat-scan arm — across both index regimes (single-group flat and
  * two-level pruned), on clean data and on every corruption shape the
  * declarative arm has defined semantics for.
  */
class NearestCentroidSpec extends SparkSpecBase {
  import spark.implicits._

  private def randomCentroids(k: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(k)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  private def randomVectors(n: Int, dim: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat)))
      .toDF("id", "vec")
  }

  test("native assign ≡ declarative flat scan — single-group regime (k ≤ 128)") {
    val cents = randomCentroids(k = 37, dim = 12, seed = 1L)
    val df = randomVectors(n = 500, dim = 12, seed = 2L)
    val both = df.select(
      Similarity.assignCell(col("vec"), cents).as("native"),
      Similarity.assignCellDeclarative(col("vec"), cents).as("flat"))
    assert(both.where(col("native") =!= col("flat")).count() == 0)
  }

  test("native assign ≡ declarative flat scan — two-level regime (k ≥ 1,024)") {
    // ≥1,024 cells: the regime the 65,536-cell cap design must hold in
    // (VERDICT r7 done-criterion); dim small to keep the interpreted
    // oracle affordable at fixture scale
    val cents = randomCentroids(k = 1024, dim = 8, seed = 3L)
    val df = randomVectors(n = 300, dim = 8, seed = 4L)
    val both = df.select(
      Similarity.assignCell(col("vec"), cents).as("native"),
      Similarity.assignCellDeclarative(col("vec"), cents).as("flat"))
    assert(both.where(col("native") =!= col("flat")).count() == 0)
  }

  test("native probe ≡ declarative sort-slice — both regimes, best-first order") {
    for ((k, dim, seedC, seedV) <- Seq((37, 12, 5L, 6L), (300, 8, 7L, 8L))) {
      val cents = randomCentroids(k, dim, seedC)
      val df = randomVectors(n = 200, dim = dim, seed = seedV)
      val both = df.select(
        Similarity.probeCells(col("vec"), cents, nProbe = 4).as("native"),
        Similarity.probeCellsDeclarative(col("vec"), cents, nProbe = 4).as("flat"))
      val bad = both.where(not(col("native") <=> col("flat"))).collect()
      assert(bad.isEmpty, s"k=$k: ${bad.take(3).mkString("; ")}")
    }
  }

  test("corruption semantics match the declarative arm exactly") {
    val cents = randomCentroids(k = 150, dim = 4, seed = 9L) // two-level regime
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("vec", ArrayType(DoubleType, containsNull = true))))
    val rows = Seq(
      Row(0L, null), // null vector
      Row(1L, Seq[Any](1.0, null, 0.5, 0.25)), // null element
      Row(2L, Seq[Any](1.0, Double.NaN, 0.5, 0.25)), // NaN element
      Row(3L, Seq[Any](1.0, Double.PositiveInfinity, 0.5, 0.25)), // +Inf
      Row(4L, Seq[Any](1.0, Double.NegativeInfinity, 0.5, 0.25)), // -Inf
      Row(5L, Seq[Any](1.0, 2.0)), // too short
      Row(6L, Seq[Any](1.0, 2.0, 3.0, 4.0, 5.0, 6.0)), // too long
      Row(7L, Seq[Any]()), // empty
      Row(8L, Seq[Any](0.0, 0.0, 0.0, 0.0)), // zero vector
      Row(9L, Seq[Any](0.3, -0.7, 0.2, 0.9))) // clean control
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    val both = df.select(col("id"),
      Similarity.assignCell(col("vec"), cents).as("native"),
      Similarity.assignCellDeclarative(col("vec"), cents).as("flat"),
      Similarity.probeCells(col("vec"), cents, 3).as("nativeP"),
      Similarity.probeCellsDeclarative(col("vec"), cents, 3).as("flatP"))
      .collect()
    both.foreach { r =>
      assert(r.get(1) == r.get(2), s"assign mismatch on id=${r.getLong(0)}: $r")
      assert(r.getSeq[Long](3) == r.getSeq[Long](4),
        s"probe mismatch on id=${r.getLong(0)}: $r")
    }
  }

  test("identical centroids tie to the lowest cell id through the native path") {
    val c = Seq(0.6, 0.8, 0.0, 0.0)
    val cents = Seq.fill(200)(c) // every cell identical → all rows tie
    val df = randomVectors(n = 50, dim = 4, seed = 10L)
    val cells = df.select(Similarity.assignCell(col("vec"), cents).as("cell"))
      .as[Long].collect()
    assert(cells.forall(_ == 0L), s"ties must resolve to cell 0: ${cells.toSeq.distinct}")
  }

  test("the assignment plan carries the compiled kernel, inside codegen") {
    val cents = randomCentroids(k = 300, dim = 8, seed = 11L)
    // RDD-backed input: a local Seq would be constant-folded into a
    // LocalTableScan and leave no plan to assert on
    val rnd = new scala.util.Random(12L)
    val df = spark.createDataFrame(spark.sparkContext.parallelize(
      (0 until 10).map(i => Row(i.toLong, Seq.fill(8)(rnd.nextGaussian())))),
      StructType(Seq(StructField("id", LongType),
        StructField("vec", ArrayType(DoubleType)))))
    val assigned = Similarity.ivfAssign(df, "vec", cents)
    val plan = assigned.queryExecution.executedPlan.toString
    assert(plan.contains("nearest_centroid"), s"native kernel missing:\n$plan")
    // "*(n)" prefixes mark WholeStageCodegen stages in the compact form
    assert(plan.linesIterator.exists(l =>
      l.contains("nearest_centroid") && l.trim.startsWith("*(")),
      s"assignment fell out of codegen:\n$plan")
    val probed = Similarity.ivfAssignProbes(df, "vec", cents, nProbe = 2)
    val planP = probed.queryExecution.executedPlan.toString
    assert(planP.contains("nearest_cells"), s"native probe kernel missing:\n$planP")
  }

  test("index build is deterministic and cached per centroid seq") {
    val cents = randomCentroids(k = 500, dim = 6, seed = 13L)
    val a = CentroidIndex.build(cents)
    val b = CentroidIndex.build(cents)
    val rnd = new scala.util.Random(14L)
    val probeVec = Array.fill(6)(rnd.nextGaussian())
    val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(probeVec)
    assert(a.assign(arr) == b.assign(arr))
    assert(a.probe(arr, 5).toLongArray.toSeq == b.probe(arr, 5).toLongArray.toSeq)
    // the cache hands back the same instance for an equal seq
    val c1 = CentroidIndex.forCentroids(cents)
    val c2 = CentroidIndex.forCentroids(cents.map(_.toVector))
    assert(c1 eq c2)
  }
}
