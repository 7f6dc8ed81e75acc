package graft.queries

import graft.SparkSpecBase
import graft.engine.Tables
import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** Re-measures every fixture-coupled constant in [[Calibration]]
  * against the LIVE testdata and fails with re-pin instructions when
  * one no longer holds — the self-explaining artifact that a fixture
  * regeneration (new seed) produces instead of a bare oracle hash
  * mismatch. Cancels (does not fail) when the fixture dir is absent.
  */
class CalibrationSpec extends SparkSpecBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private def fixturesPresent = new java.io.File(sfDir).isDirectory

  private def repin(constant: String, measured: String): String =
    s"""
       |FIXTURE CALIBRATION VIOLATION — the testdata seed has likely changed.
       |Measured on $sfDir: $measured
       |Re-pin graft.queries.Calibration.$constant
       |(src/main/scala/graft/queries/Calibration.scala) following that
       |file's re-pin procedure: run `sbt "runMain graft.RecallProbe <sf>"`
       |at all three scales and keep one full hit of margin below the
       |weakest measured value.""".stripMargin

  test("q25's MinHash LSH recall floor holds on the live fixtures") {
    assume(fixturesPresent, s"$sfDir absent")
    import graft.ops.Dedup
    val docs = Tables.documents(spark, sfDir)
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 4, 8, 0.6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val recall =
      if (exact.isEmpty) 1.0
      else (exact & lsh).size.toDouble / exact.size
    assert(recall >= Calibration.MinhashRecallFloor,
      repin("MinhashRecallFloor", s"pair recall $recall < " +
        s"floor ${Calibration.MinhashRecallFloor} (3-gram, 4 bands x 8 rows, tau=0.6)"))
  }

  test("q78's incremental LSH recall floor holds on the live fixtures") {
    assume(fixturesPresent, s"$sfDir absent")
    import graft.ops.Dedup
    val docs = Tables.documents(spark, sfDir)
    val allPairs: Set[(Long, Long)] =
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.6)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val exactCross = allPairs.collect {
      case (a, b) if (a % 5 == 0) != (b % 5 == 0) =>
        if (a % 5 == 0) (a, b) else (b, a) }
    val inc = Dedup.incrementalLshPairs(
        docs.where(col("doc_id") % 5 =!= 0), docs.where(col("doc_id") % 5 === 0),
        "doc_id", "text", 3, 4, 8, 0.6)
      .select("batch_id", "corpus_id").as[(Long, Long)].collect().toSet
    val recall =
      if (exactCross.isEmpty) 1.0
      else (exactCross & inc).size.toDouble / exactCross.size
    assert(recall >= Calibration.IncrementalRecallFloor,
      repin("IncrementalRecallFloor", s"cross-side pair recall $recall < " +
        s"floor ${Calibration.IncrementalRecallFloor} (3-gram, 4 bands x 8 rows, tau=0.6)"))
  }

  test("q29's LSH recall floor holds on the live fixtures") {
    assume(fixturesPresent, s"$sfDir absent")
    val e = Tables.embeddings(spark, sfDir)
    val q = e.where(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(q, e, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val lsh = Similarity.lshTopK(q, e, "vec_id", "embedding", k = 5,
        nPlanes = 4, nTables = 16)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val minRecall = exact.map { case (qid, ex) =>
      (lsh.getOrElse(qid, Set.empty) & ex).size.toDouble / ex.size }.min
    assert(minRecall >= Calibration.LshRecallFloor,
      repin("LshRecallFloor", s"per-query min recall $minRecall < " +
        s"floor ${Calibration.LshRecallFloor} (lshTopK planes=4 tables=16 k=5)"))
  }

  test("q41/q75's IVF mean-recall floor holds on the live fixtures") {
    assume(fixturesPresent, s"$sfDir absent")
    val e = Tables.embeddings(spark, sfDir)
    val q = e.where(col("vec_id") < 10)
    val dotFn = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      graft.functions.decimalDotNative(a, b)
    val exact = Similarity.bruteForceTopK(q, e, "vec_id", "embedding", k = 5,
        simFn = dotFn, simName = "dot")
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val cents = Similarity.trainIvfCentroids(e, "vec_id", "embedding", 8, iters = 3)
    for ((name, df) <- Seq(
        "ivfTopK" -> Similarity.ivfTopK(q, e, "vec_id", "embedding", k = 5,
          nProbe = 3, centroids = Some(cents), simFn = dotFn, simName = "dot"),
        "ivfTopKQuantizedRerank" -> Similarity.ivfTopKQuantizedRerank(
          q, e, "vec_id", "embedding", k = 5, nProbe = 3, rerankFactor = 4,
          centroids = Some(cents), simFn = dotFn, simName = "dot"))) {
      val got = df.select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val recalls = exact.map { case (qid, ex) =>
        (got.getOrElse(qid, Set.empty) & ex).size.toDouble / ex.size }
      val mean = recalls.sum / recalls.size
      assert(mean >= Calibration.IvfMeanRecallFloor,
        repin("IvfMeanRecallFloor",
          s"$name mean recall $mean < floor ${Calibration.IvfMeanRecallFloor} " +
          "(8 cells, nProbe=3, k=5)"))
    }
  }

  test("q103's projected-rerank mean-recall floor holds on the live fixtures") {
    assume(fixturesPresent, s"$sfDir absent")
    val e = Tables.embeddings(spark, sfDir)
    val q = e.where(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(q, e, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = Similarity.projectedRerankTopK(q, e, "vec_id", "embedding",
        k = 5, projDim = 32, rerankFactor = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (qid, ex) =>
      (got.getOrElse(qid, Set.empty) & ex).size.toDouble / ex.size }
    val mean = recalls.sum / recalls.size
    assert(mean >= Calibration.ProjectedRecallFloor,
      repin("ProjectedRecallFloor",
        s"projectedRerankTopK mean recall $mean < floor " +
        s"${Calibration.ProjectedRecallFloor} (projDim=32, rerankFactor=8, k=5)"))
  }

  test("q105's composed projected+quantized mean-recall floor holds on the live fixtures") {
    assume(fixturesPresent, s"$sfDir absent")
    val e = Tables.embeddings(spark, sfDir)
    val q = e.where(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(q, e, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = Similarity.projectedQuantizedRerankTopK(q, e, "vec_id", "embedding",
        k = 5, projDim = 32, shortlistFactor = 16, rerankFactor = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (qid, ex) =>
      (got.getOrElse(qid, Set.empty) & ex).size.toDouble / ex.size }
    val mean = recalls.sum / recalls.size
    assert(mean >= Calibration.ProjectedQuantizedRecallFloor,
      repin("ProjectedQuantizedRecallFloor",
        s"projectedQuantizedRerankTopK mean recall $mean < floor " +
        s"${Calibration.ProjectedQuantizedRecallFloor} " +
        "(projDim=32, shortlistFactor=16, rerankFactor=4, k=5)"))
  }

  test("production-scale IVF operating point holds at sf0.01: the " +
      "half-probe stored-index floor and the converged-mode floor — " +
      "the scale-relevant recall pins (every other floor re-measures " +
      "sf0.001)") {
    val sf01 = "/root/testdata/sf0.01"
    assume(new java.io.File(sf01).isDirectory, s"$sf01 absent")
    import graft.ops.AnnIndex
    val e = Tables.embeddings(spark, sf01)
    val qWide = e.where(col("vec_id") < 50)
    val exact = Similarity.bruteForceTopK(qWide, e, "vec_id", "embedding",
        k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val dir = java.nio.file.Files
      .createTempDirectory("graft_cal_sf01").toString
    AnnIndex.buildIvfIndex(e, "vec_id", "embedding", s"$dir/ivf",
      nCells = 16, iters = 3)
    def meanRecall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("query_id", "neighbor_id")
        .as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val rs = exact.map { case (qid, ex) =>
        (got.getOrElse(qid, Set.empty) & ex).size.toDouble / ex.size }
      rs.sum / rs.size
    }
    val half = meanRecall(AnnIndex.searchIvfIndex(spark, s"$dir/ivf",
      qWide, "vec_id", "embedding", k = 5, nProbe = 8))
    assert(half >= Calibration.IvfHalfProbeRecallFloor,
      repin("IvfHalfProbeRecallFloor",
        s"half-probe (16 cells, nProbe=8) mean recall@5 $half < " +
        s"floor ${Calibration.IvfHalfProbeRecallFloor} at sf0.01"))
    val convDf = AnnIndex.searchIvfIndexConverged(spark,
        s"$dir/ivf", qWide, "vec_id", "embedding", k = 5, nProbe0 = 1)
      .localCheckpoint(true) // feeds the recall AND the cost contract
    val conv = meanRecall(convDf)
    assert(conv >= Calibration.IvfConvergedRecallFloor,
      repin("IvfConvergedRecallFloor",
        s"converged-mode (16 cells, nProbe0=1) mean recall@5 $conv < " +
        s"floor ${Calibration.IvfConvergedRecallFloor} at sf0.01"))
    // the COST side (r15 order #5): the recall floor alone would pass
    // a regression that rides every query to the exhaustive width —
    // pin what the ladder pays. n_probe_used is constant within a
    // query, so distinct gives one row per query.
    val usedWidths = convDf.select("query_id", "n_probe_used").distinct()
      .as[(Long, Int)].collect()
    val meanFrac = usedWidths.map(_._2).sum.toDouble /
      (usedWidths.length * 16)
    assert(meanFrac <= Calibration.IvfConvergedMeanProbedFracCeiling,
      repin("IvfConvergedMeanProbedFracCeiling",
        s"converged-mode (16 cells, nProbe0=1) mean probed fraction " +
        s"$meanFrac > ceiling " +
        s"${Calibration.IvfConvergedMeanProbedFracCeiling} at sf0.01 — " +
        "the ladder is paying near-exhaustive width for every query"))
    // the ladder never does worse than its own starting width — the
    // superset-of-candidates theorem, re-checked at scale
    val base = meanRecall(AnnIndex.searchIvfIndex(spark, s"$dir/ivf",
      qWide, "vec_id", "embedding", k = 5, nProbe = 1))
    assert(conv >= base,
      s"converged recall $conv fell below its nProbe0=1 start $base")
  }

  test("two-level index recall holds at the half-fraction operating " +
      "point at sf0.01 — the absolute floor AND the equal-fraction " +
      "slack vs the flat 64-cell index (r15 order #2)") {
    val sf01 = "/root/testdata/sf0.01"
    assume(new java.io.File(sf01).isDirectory, s"$sf01 absent")
    import graft.ops.AnnIndex
    val e = Tables.embeddings(spark, sf01)
    val qWide = e.where(col("vec_id") < 50)
    val exact = Similarity.bruteForceTopK(qWide, e, "vec_id", "embedding",
        k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def meanRecall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("query_id", "neighbor_id")
        .as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val rs = exact.map { case (qid, ex) =>
        (got.getOrElse(qid, Set.empty) & ex).size.toDouble / ex.size }
      rs.sum / rs.size
    }
    val dir = java.nio.file.Files
      .createTempDirectory("graft_cal_ivf2").toString
    AnnIndex.buildIvfIndex(e, "vec_id", "embedding", s"$dir/flat",
      nCells = 64, iters = 3)
    AnnIndex.buildIvfIndexTwoLevel(e, "vec_id", "embedding", s"$dir/two",
      nCoarse = 8, nFinePerCell = 8, iters = 3, pqM = Some(8))
    val two = meanRecall(AnnIndex.searchIvfIndexTwoLevel(spark,
      s"$dir/two", qWide, "vec_id", "embedding", k = 5,
      nProbeCoarse = 4, nProbeFine = 8))
    assert(two >= Calibration.Ivf2HalfFracRecallFloor,
      repin("Ivf2HalfFracRecallFloor",
        s"two-level (8×8, pc=4, pf=8) mean recall@5 $two < floor " +
        s"${Calibration.Ivf2HalfFracRecallFloor} at sf0.01"))
    val flat = meanRecall(AnnIndex.searchIvfIndex(spark, s"$dir/flat",
      qWide, "vec_id", "embedding", k = 5, nProbe = 32))
    assert(two >= flat - Calibration.Ivf2EqualFracSlack,
      repin("Ivf2EqualFracSlack",
        s"two-level recall $two fell more than " +
        s"${Calibration.Ivf2EqualFracSlack} under the flat index's " +
        s"$flat at the same probed fraction"))
    // the PQ arm at the same point, production rerankFactor
    val pq = meanRecall(AnnIndex.searchIvfIndexTwoLevelPq(spark,
      s"$dir/two", qWide, "vec_id", "embedding", k = 5,
      nProbeCoarse = 4, nProbeFine = 8, rerankFactor = 4))
    assert(pq >= Calibration.Ivf2PqRerank4RecallFloor,
      repin("Ivf2PqRerank4RecallFloor",
        s"PQ arm (m=8, ks=256, rerank=4) mean recall@5 $pq < floor " +
        s"${Calibration.Ivf2PqRerank4RecallFloor} at sf0.01"))
  }

  test("the half-probe floor also holds at sf0.1 — the scale where the " +
      "r14 verdict observed 0.28-0.32 recall at the old nProbe=3/16 " +
      "default (measured 0.784 at the pinned operating point)") {
    val sf1 = "/root/testdata/sf0.1"
    assume(new java.io.File(sf1).isDirectory, s"$sf1 absent")
    import graft.ops.AnnIndex
    val e = Tables.embeddings(spark, sf1)
    val qWide = e.where(col("vec_id") < 50)
    val exact = Similarity.bruteForceTopK(qWide, e, "vec_id", "embedding",
        k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val dir = java.nio.file.Files
      .createTempDirectory("graft_cal_sf1").toString
    AnnIndex.buildIvfIndex(e, "vec_id", "embedding", s"$dir/ivf",
      nCells = 16, iters = 3)
    val got = AnnIndex.searchIvfIndex(spark, s"$dir/ivf", qWide,
        "vec_id", "embedding", k = 5, nProbe = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val rs = exact.map { case (qid, ex) =>
      (got.getOrElse(qid, Set.empty) & ex).size.toDouble / ex.size }
    val half = rs.sum / rs.size
    assert(half >= Calibration.IvfHalfProbeRecallFloor,
      repin("IvfHalfProbeRecallFloor",
        s"half-probe (16 cells, nProbe=8) mean recall@5 $half < " +
        s"floor ${Calibration.IvfHalfProbeRecallFloor} at sf0.1"))
  }

  test("q73's semantic-dedup tau keeps the operator non-vacuous on the live fixtures") {
    assume(fixturesPresent, s"$sfDir absent")
    // τ must sit BELOW the corpus's max pairwise cosine (else q73
    // never drops a vector and the contract oracle goes toothless)
    // — the synthetic embeddings top out near 0.45.
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val norm = sqrt(aggregate(transform(col("v"), x => x * x),
      lit(0.0), (a, x) => a + x))
    val n = e.select(col("vec_id"), col("v"), norm.as("nrm")).where(col("nrm") > 0)
    val a = n.select(col("vec_id").as("ia"), col("v").as("va"), col("nrm").as("na"))
    val b = n.select(col("vec_id").as("ib"), col("v").as("vb"), col("nrm").as("nb"))
    val maxCos = a.join(b, col("ia") < col("ib"))
      .select((aggregate(zip_with(col("va"), col("vb"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x) / (col("na") * col("nb"))).as("cos"))
      .agg(max("cos")).as[Double].head()
    assert(maxCos >= Calibration.SemanticDedupTau,
      repin("SemanticDedupTau",
        s"max pairwise cosine $maxCos < tau ${Calibration.SemanticDedupTau} — " +
        "q73 would drop nothing (vacuous contract)"))
  }

  test("index-lifecycle recall floors hold on the live fixtures: " +
      "tombstoned ≡ compacted EXACTLY, the frozen-centroid fold stays " +
      "above its floor, and maybeRetrain's fresh centroids never cost " +
      "recall") {
    assume(fixturesPresent, s"$sfDir absent")
    import graft.ops.AnnIndex
    val lcRoot = java.nio.file.Files
      .createTempDirectory("graft_calib_lc").toString
    // the RecallProbe ivf_lifecycle recipe, verbatim: build on 75%,
    // append the drifted 25%, tombstone ~30%, then the two maintenance
    // arms — compact (frozen centroids) vs maybeRetrain (fresh)
    val e = Tables.embeddings(spark, sfDir)
    val q = e.where(col("vec_id") < 10)
    val base = e.where(col("vec_id") % 4 =!= 0)
    val delta = e.where(col("vec_id") % 4 === 0)
    val delPred = col("vec_id") % 10 >= 1 &&
      col("vec_id") % 10 <= 3 && col("vec_id") >= 10
    val survivors = e.where(!delPred)
    val exactSurv = Similarity.bruteForceTopK(q, survivors,
        "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def results(dir: String): Map[Long, Set[Long]] =
      AnnIndex.searchIvfIndex(spark, dir, q,
          "vec_id", "embedding", k = 5, nProbe = 3)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def meanRecall(got: Map[Long, Set[Long]]): Double = {
      val rs = exactSurv.map { case (qid, ex) =>
        (got.getOrElse(qid, Set.empty) & ex).size.toDouble / ex.size }
      rs.sum / rs.size
    }
    var frozenMean = 0.0
    var freshMean = 0.0
    for (arm <- Seq("compact", "retrain")) {
      val dir = s"$lcRoot/$arm"
      AnnIndex.buildIvfIndex(base, "vec_id", "embedding", dir,
        nCells = 16, iters = 3)
      AnnIndex.appendToIvfIndex(spark, dir, delta,
        "vec_id", "embedding", gen = 1L)
      AnnIndex.deleteFromIvfIndex(spark, dir,
        e.where(delPred).select("vec_id"), "vec_id", del = 1L)
      if (arm == "compact") {
        val tombstoned = results(dir)
        AnnIndex.compactIvfIndex(spark, dir)
        val compacted = results(dir)
        // the identity law through the full lifecycle: the fold +
        // physical purge is a LAYOUT op — search-identical to the
        // tombstoned tree it folded (measured ≡ at all three scales)
        assert(compacted == tombstoned,
          "compaction under frozen centroids changed search results")
        frozenMean = meanRecall(compacted)
        assert(frozenMean >= Calibration.IvfLifecycleFrozenRecallFloor,
          repin("IvfLifecycleFrozenRecallFloor",
            s"compacted-frozen mean recall $frozenMean < floor " +
            s"${Calibration.IvfLifecycleFrozenRecallFloor} " +
            "(16 cells, nProbe=3, k=5, lifecycle recipe)"))
      } else {
        assert(AnnIndex.maybeRetrain(spark, dir, survivors,
          "vec_id", "embedding", nCells = 16, tau = 0.2, iters = 3),
          "appendedFraction 1/3 >= tau must fire the rebuild arm")
        freshMean = meanRecall(results(dir))
      }
    }
    assert(freshMean >= frozenMean - Calibration.IvfLifecycleRetrainSlack,
      repin("IvfLifecycleRetrainSlack",
        s"fresh-centroid mean recall $freshMean fell more than " +
        s"${Calibration.IvfLifecycleRetrainSlack} below the frozen fold " +
        s"$frozenMean — retraining should never cost recall"))
  }
}
