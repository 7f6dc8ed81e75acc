package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import graft.engine.Tables
import graft.expressions.CentroidIndex
import graft.ops.Similarity

/** Diagnostic main (RecallProbe convention): measures corpus-side IVF
  * cell assignment across the three implementations at growing cell
  * counts, so the two-level design's crossover claim in NOTES.md is
  * pinned to evidence:
  *
  *   - `interp` — the declarative HOF flat scan (the pre-r8 arm),
  *   - `flat`   — the native kernel with a single group (compiled
  *                O(k·dim) scan),
  *   - `two`    — the native two-level pruned kernel (expected
  *                O(√k·dim)).
  *
  * Centroids are trained once per k and shared; each timing is a full
  * count() over the assignment column (same corpus, same plan shape).
  * Run: sbt "runMain graft.CellAssignProbe /root/testdata/sf0.1"
  */
object CellAssignProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cellCounts = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq
      else Seq(256, 1024, 4096)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).cache()
    val nRows = e.count()

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    def sumAssign(assign: Column): Long =
      e.select(assign.as("cell")).agg(sum("cell")).head().getLong(0)

    for (k <- cellCounts) {
      val (cents, tTrain) = time(
        Similarity.trainIvfCentroids(e, "vec_id", "embedding", k, iters = 2))
      val idxTwo = CentroidIndex.build(cents)
      val idxFlat = CentroidIndex.build(cents, forceFlat = true)
      val (sTwo, tTwo) = time(sumAssign(
        coalesce(functions.nearestCentroidNative(col("embedding"), idxTwo), lit(0L))))
      val (sFlat, tFlat) = time(sumAssign(
        coalesce(functions.nearestCentroidNative(col("embedding"), idxFlat), lit(0L))))
      // the interpreted arm is O(k·dim) per row with lambda dispatch —
      // cap its corpus so the probe itself stays runnable at high k
      val interpCap = 2000L
      val eSmall = e.where(col("vec_id") < interpCap).cache()
      val nSmall = eSmall.count()
      val (_, tInterpSmall) = time(
        eSmall.select(Similarity.assignCellDeclarative(col("embedding"), cents)
          .as("cell")).agg(sum("cell")).head().getLong(0))
      eSmall.unpersist(blocking = false)
      val tInterpFull = tInterpSmall * (nRows.toDouble / math.max(nSmall, 1))
      assert(sTwo == sFlat, s"two-level != flat checksum at k=$k: $sTwo vs $sFlat")
      println(f"[cell-assign-probe] sf=$sfDir rows=$nRows k=$k%5d " +
        f"train=$tTrain%7.2fs interp_est=$tInterpFull%8.2fs " +
        f"(measured $tInterpSmall%6.2fs on $nSmall rows) " +
        f"flat=$tFlat%6.2fs two=$tTwo%6.2fs checksum_equal=true")
    }
    e.unpersist(blocking = false)

    // Corpus-scale arm: the fixture embeddings table is too small to
    // resolve flat-vs-two-level per-row cost, so measure on
    // deterministic generated corpora (hash-derived elements, columnar
    // codegen — no RNG) at the cell counts where the coarse layer is
    // supposed to earn its keep. TWO data regimes, because pruning
    // effectiveness is a property of the DATA:
    //  - `uniform`: i.i.d. elements — the curse-of-dimensionality
    //    worst case where every centroid looks equidistant and bounds
    //    cannot prune (expected ≈1× — the honest floor);
    //  - `clustered`: vectors = cluster center + small noise, the
    //    shape real embedding corpora have (it is WHY IVF works) —
    //    where the coarse layer must show its O(√k) win.
    val bigN = 200000L
    val dim = 64
    val uniformVec = transform(sequence(lit(1), lit(dim)), i =>
      (pmod(xxhash64(col("id") * dim + i), lit(2001)) - 1000.0) / 1000.0)
    // natural-cluster count well below k: the corpus-scale regime (at
    // the 65,536-cell cap, cells SUBDIVIDE the corpus's macro
    // structure — many cells per topic). With nClusters ≈ k the
    // centroids are near-orthogonal unit vectors and no grouping can
    // be tight (sphere geometry caps any Cauchy–Schwarz bound's
    // power) — that regime degrades toward the uniform floor.
    val nClusters = 256
    val clusteredVec = transform(sequence(lit(1), lit(dim)), i =>
      (pmod(xxhash64((col("id") % nClusters) * dim + i), lit(2001)) - 1000.0) / 1000.0
        + (pmod(xxhash64(col("id") * dim + i + lit(777777)), lit(201)) - 100.0) / 2000.0)
    for ((regime, vecExpr) <- Seq("uniform" -> uniformVec,
        "clustered" -> clusteredVec)) {
      val big = spark.range(bigN)
        .select(col("id").as("vec_id"), vecExpr.as("embedding")).cache()
      big.count()
      def sumAssignBig(assign: Column): Long =
        big.select(assign.as("cell")).agg(sum("cell")).head().getLong(0)
      for (k <- Seq(1024, 4096, 16384)) {
        val (cents, tTrain) = time(
          Similarity.trainIvfCentroids(big, "vec_id", "embedding", k, iters = 1,
            trainSampleCap = 32768, corpusRowsHint = Some(bigN)))
        val idxTwo = CentroidIndex.build(cents)
        val idxFlat = CentroidIndex.build(cents, forceFlat = true)
        val (sTwo, tTwo) = time(sumAssignBig(
          coalesce(functions.nearestCentroidNative(col("embedding"), idxTwo), lit(0L))))
        val (sFlat, tFlat) = time(sumAssignBig(
          coalesce(functions.nearestCentroidNative(col("embedding"), idxFlat), lit(0L))))
        assert(sTwo == sFlat, s"two-level != flat checksum at k=$k: $sTwo vs $sFlat")
        println(f"[cell-assign-probe] synthetic/$regime%-9s rows=$bigN dim=$dim " +
          f"k=$k%6d train=$tTrain%7.2fs flat=$tFlat%7.2fs two=$tTwo%7.2fs " +
          f"speedup=${tFlat / tTwo}%5.1fx checksum_equal=true")
      }
      big.unpersist(blocking = false)
    }
    spark.stop()
  }
}
