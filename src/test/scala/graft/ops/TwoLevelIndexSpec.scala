package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The two-level (coarse → fine) IVF index — the capacity path past
  * the flat quantizer's 65,536-cell ceiling (r15 order #2). The
  * contracts, per the verdict's done-criterion:
  *
  *  - IDENTITY vs the flat index: with nFinePerCell = 1 the two
  *    layers collapse onto the coarse quantizer, and search must be
  *    BIT-IDENTICAL to the flat index under the same centroids;
  *  - EXHAUSTIVE identity: full probing on both trees is exact within
  *    the index, so results must agree exactly whatever the layout;
  *  - layout: ≤ nCoarse partition DIRECTORIES (the proven bound — the
  *    fine axis is a sorted data column, not a directory explosion),
  *    probed scans touch fewer files than full scans on BOTH the
  *    postings and the fine-centroid tree;
  *  - determinism: two builds of the same corpus are value-identical
  *    (hash-seeded samples, decimal Lloyd sums);
  *  - corrupt rows post searchably and never surface as neighbors.
  *
  * The recall-at-equal-probed-fraction contract vs the flat index is
  * measured by RecallProbe's ivf2 section and pinned in
  * [[graft.queries.Calibration]] / CalibrationSpec (fixture-coupled);
  * the identity arms here are exact and fixture-free.
  */
class TwoLevelIndexSpec extends SparkSpecBase {
  import spark.implicits._

  private def corpus(n: Int) = (0 until n).map { i =>
    val c = i % 4
    (i.toLong, Array.tabulate(4)(d =>
      (if (d == c) 1.0f else 0.0f) + 0.01f * (i / 4)))
  }.toDF("vec_id", "embedding")

  private def collected(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("query_id", "rank")
      .as[(Long, Long, Double, Int)].collect().toSeq

  test("nFinePerCell = 1 collapses onto the coarse quantizer: search is " +
      "bit-identical to the flat index under the same centroids") {
    val dir = Files.createTempDirectory("graft_2lvl_id").toString
    val e = corpus(48)
    val cents = AnnIndex.buildIvfIndex(e, "vec_id", "embedding",
      s"$dir/flat", nCells = 4, iters = 3)
    AnnIndex.buildIvfIndexTwoLevel(e, "vec_id", "embedding",
      s"$dir/two", nCoarse = 4, nFinePerCell = 1,
      coarseCentroids = Some(cents))
    val q = e.where(col("vec_id") < 6)
    for (p <- Seq(1, 2, 4)) {
      val flat = collected(AnnIndex.searchIvfIndex(spark, s"$dir/flat", q,
        "vec_id", "embedding", k = 3, nProbe = p))
      val two = collected(AnnIndex.searchIvfIndexTwoLevel(spark,
        s"$dir/two", q, "vec_id", "embedding", k = 3,
        nProbeCoarse = p, nProbeFine = 1))
      assert(two == flat, s"nProbe=$p: two-level(nFine=1) must equal flat")
      assert(flat.nonEmpty && flat.forall(r => r._1 != r._2))
    }
  }

  test("exhaustive probing is exact within the index on both layouts: " +
      "two-level (4×3, full width) ≡ flat (full width)") {
    val dir = Files.createTempDirectory("graft_2lvl_ex").toString
    val e = corpus(60)
    AnnIndex.buildIvfIndex(e, "vec_id", "embedding", s"$dir/flat",
      nCells = 4, iters = 3)
    AnnIndex.buildIvfIndexTwoLevel(e, "vec_id", "embedding", s"$dir/two",
      nCoarse = 4, nFinePerCell = 3, iters = 2)
    val q = e.where(col("vec_id") < 6)
    val flat = collected(AnnIndex.searchIvfIndex(spark, s"$dir/flat", q,
      "vec_id", "embedding", k = 4, nProbe = 4))
    val two = collected(AnnIndex.searchIvfIndexTwoLevel(spark, s"$dir/two",
      q, "vec_id", "embedding", k = 4, nProbeCoarse = 4, nProbeFine = 3))
    assert(two == flat,
      "exhaustive-width results must agree exactly across layouts")
  }

  test("layout: directories stay ≤ nCoarse (fine is a sorted data " +
      "column), probed scans touch fewer files on postings AND fine " +
      "centroids; every vector posts exactly once") {
    val dir = Files.createTempDirectory("graft_2lvl_lay").toString
    val e = corpus(60)
    AnnIndex.buildIvfIndexTwoLevel(e, "vec_id", "embedding", s"$dir/two",
      nCoarse = 4, nFinePerCell = 3, iters = 2)
    val post = spark.read.parquet(s"$dir/two/postings.parquet")
    assert(post.count() == 60 &&
      post.select("vec_id").distinct().count() == 60)
    assert(post.columns.toSet ==
      Set("vec_id", "vec", "q_codes", "q_scale", "fine", "coarse"))
    // the directory bound: partition dirs = coarse values only
    val dirs = new java.io.File(s"$dir/two/postings.parquet").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("coarse="))
    assert(dirs.length <= 4 && dirs.length >= 2,
      s"expected 2..4 coarse partition dirs, got ${dirs.length}")
    // effective granularity really is two-level: > nCoarse distinct
    // (coarse, fine) cells exist
    val nEff = post.select("coarse", "fine").distinct().count()
    assert(nEff > dirs.length, s"expected fine splits, got $nEff cells")
    // probing one coarse group touches fewer files than a full scan
    val c0 = post.select("coarse").head().getInt(0)
    assert(post.where(col("coarse") === c0)
        .select(input_file_name()).distinct().count() <
      post.select(input_file_name()).distinct().count())
    val fineT = spark.read.parquet(s"$dir/two/fine_centroids.parquet")
    assert(fineT.where(col("coarse") === c0)
        .select(input_file_name()).distinct().count() <
      fineT.select(input_file_name()).distinct().count(),
      "a probe must not read unprobed groups' sub-centroids")
    // every group's fine ids are dense from 0 (the packing position
    // contract) and within bound
    val byGroup = fineT.groupBy("coarse")
      .agg(min("fine").as("lo"), max("fine").as("hi"),
        count(lit(1)).as("n"))
      .collect()
    assert(byGroup.forall(r => r.getInt(1) == 0 &&
      r.getLong(3) == r.getInt(2) + 1L && r.getLong(3) <= 3L),
      byGroup.mkString("; "))
  }

  test("the postings scan PLAN carries both pruning levels: a " +
      "PartitionFilter on coarse (directory pruning) and a pushed " +
      "data filter on fine (row-group stats on the write-sorted " +
      "column)") {
    val dir = Files.createTempDirectory("graft_2lvl_plan").toString
    val e = corpus(60)
    AnnIndex.buildIvfIndexTwoLevel(e, "vec_id", "embedding", s"$dir/two",
      nCoarse = 4, nFinePerCell = 3, iters = 2)
    val got = AnnIndex.searchIvfIndexTwoLevel(spark, s"$dir/two",
      e.where(col("vec_id") < 3), "vec_id", "embedding", k = 3,
      nProbeCoarse = 1, nProbeFine = 1)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [coarse#"),
      s"expected a coarse PartitionFilter on the postings scan:\n$plan")
    assert(plan.contains("PushedFilters: [In(fine,"),
      s"expected the fine IN-filter pushed to the parquet scan:\n$plan")
  }

  test("build is deterministic: two builds of the same corpus are " +
      "value-identical in centroids, fine centroids and assignments") {
    val dir = Files.createTempDirectory("graft_2lvl_det").toString
    val e = corpus(60)
    for (arm <- Seq("a", "b"))
      AnnIndex.buildIvfIndexTwoLevel(e, "vec_id", "embedding",
        s"$dir/$arm", nCoarse = 4, nFinePerCell = 3, iters = 2)
    def fineOf(d: String) = spark.read
      .parquet(s"$d/fine_centroids.parquet")
      .select(col("coarse").cast("int"), col("fine").cast("int"),
        col("centroid"))
      .collect().map(_.toSeq.toString).sorted.toSeq
    def postOf(d: String) = spark.read.parquet(s"$d/postings.parquet")
      .select(col("vec_id"), col("coarse").cast("int"), col("fine"))
      .collect().map(_.toSeq.toString).sorted.toSeq
    assert(fineOf(s"$dir/a") == fineOf(s"$dir/b"))
    assert(postOf(s"$dir/a") == postOf(s"$dir/b"))
  }

  test("corrupt vectors post searchably with FLAT-PARITY semantics: " +
      "quarantined from training, posted at the all-ties cell, ranked " +
      "identically to the flat index (NaN floats scale to 0 in the " +
      "decimal dot — the established corpus-wide policy)") {
    val dir = Files.createTempDirectory("graft_2lvl_cor").toString
    val clean = corpus(40)
    val bad = Seq((999L, Array(Float.NaN, 1.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val all = clean.unionByName(bad)
    val cents = AnnIndex.buildIvfIndex(all, "vec_id", "embedding",
      s"$dir/flat", nCells = 4, iters = 3)
    AnnIndex.buildIvfIndexTwoLevel(all, "vec_id", "embedding",
      s"$dir/two", nCoarse = 4, nFinePerCell = 2,
      coarseCentroids = Some(cents))
    assert(spark.read.parquet(s"$dir/two/postings.parquet").count() == 41,
      "the corrupt row still posts (quarantined from training only)")
    val q = clean.where(col("vec_id") < 4)
    // exhaustive width on both: whatever the corrupt row ranks as, the
    // two layouts must agree exactly
    val flat = collected(AnnIndex.searchIvfIndex(spark, s"$dir/flat", q,
      "vec_id", "embedding", k = 3, nProbe = 4))
    val two = collected(AnnIndex.searchIvfIndexTwoLevel(spark,
      s"$dir/two", q, "vec_id", "embedding", k = 3,
      nProbeCoarse = 4, nProbeFine = 2))
    assert(two == flat)
    assert(two.size == 12)
  }

  test("quantized two-level search with a generous shortlist is " +
      "IDENTICAL to the exact arm (the q126 plumbing contract on the " +
      "capacity tree)") {
    val dir = Files.createTempDirectory("graft_2lvl_q").toString
    val e = corpus(60)
    AnnIndex.buildIvfIndexTwoLevel(e, "vec_id", "embedding", s"$dir/two",
      nCoarse = 4, nFinePerCell = 3, iters = 2)
    val q = e.where(col("vec_id") < 6)
    val exact = collected(AnnIndex.searchIvfIndexTwoLevel(spark,
      s"$dir/two", q, "vec_id", "embedding", k = 3,
      nProbeCoarse = 2, nProbeFine = 2))
    val viaCodes = collected(AnnIndex.searchIvfIndexTwoLevelQuantized(
      spark, s"$dir/two", q, "vec_id", "embedding", k = 3,
      nProbeCoarse = 2, nProbeFine = 2, rerankFactor = 60))
    assert(viaCodes == exact)
  }

  test("converged ladder on the two-level tree: accepted rows equal a " +
      "fixed-width search at the reported coarse width (fine " +
      "exhaustive), terminal width is exact within the index, recall " +
      "never falls below the starting width's") {
    val dir = Files.createTempDirectory("graft_2lvl_cv").toString
    val e = corpus(60)
    AnnIndex.buildIvfIndexTwoLevel(e, "vec_id", "embedding", s"$dir/two",
      nCoarse = 4, nFinePerCell = 3, iters = 2)
    val q = e.where(col("vec_id") < 6)
    val conv = AnnIndex.searchIvfIndexTwoLevelConverged(spark,
      s"$dir/two", q, "vec_id", "embedding", k = 3, nProbeCoarse0 = 1)
    val rows = conv.orderBy("query_id", "rank")
      .select("query_id", "neighbor_id", "rank", "cosine", "n_probe_used")
      .as[(Long, Long, Int, Double, Int)].collect().toSeq
    assert(rows.nonEmpty && rows.size == 18, s"got ${rows.size} rows")
    // widths on the doubling ladder from 1 toward nCoarse = 4
    val widths = rows.map(_._5).distinct.sorted
    assert(widths.forall(Seq(2, 4).contains(_)), s"widths: $widths")
    // per reported width: identity with the fixed-width arm
    for (w <- widths) {
      val ids = rows.filter(_._5 == w).map(_._1).distinct
      val fixed = collected(AnnIndex.searchIvfIndexTwoLevel(spark,
        s"$dir/two", q.where(col("vec_id").isin(ids: _*)),
        "vec_id", "embedding", k = 3,
        nProbeCoarse = w, nProbeFine = Int.MaxValue))
      val acc = rows.filter(_._5 == w).map(r => (r._1, r._2, r._4, r._3))
      assert(acc == fixed, s"width $w: converged rows must equal the " +
        "fixed-width search")
    }
    // recall ≥ the nProbeCoarse0 = 1 start (candidate supersets)
    val ex = collected(AnnIndex.searchIvfIndexTwoLevel(spark, s"$dir/two",
      q, "vec_id", "embedding", k = 3,
      nProbeCoarse = 4, nProbeFine = 3)).map(r => (r._1, r._2)).toSet
    val start = collected(AnnIndex.searchIvfIndexTwoLevel(spark,
      s"$dir/two", q, "vec_id", "embedding", k = 3,
      nProbeCoarse = 1, nProbeFine = Int.MaxValue))
      .map(r => (r._1, r._2)).toSet
    val convPairs = rows.map(r => (r._1, r._2)).toSet
    assert((convPairs & ex).size >= (start & ex).size)
  }

  test("PQ arm: a generous shortlist is IDENTICAL to the exact arm; " +
      "the persisted codebook round-trips; a tree built without PQ " +
      "refuses the PQ search loudly") {
    val dir = Files.createTempDirectory("graft_2lvl_pq").toString
    val e = corpus(60)
    AnnIndex.buildIvfIndexTwoLevel(e, "vec_id", "embedding", s"$dir/two",
      nCoarse = 4, nFinePerCell = 3, iters = 2,
      pqM = Some(2), pqKs = 16)
    val cb = AnnIndex.loadPqCodebook(spark, s"$dir/two")
    assert(cb.m == 2 && cb.subDim == 2 && cb.ks >= 1 && cb.ks <= 16)
    val post = spark.read.parquet(s"$dir/two/postings.parquet")
    assert(post.columns.contains("pq_codes"))
    assert(post.select(size(col("pq_codes"))).distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(cb.m),
      "every posting carries m code bytes")
    val q = e.where(col("vec_id") < 6)
    val exact = collected(AnnIndex.searchIvfIndexTwoLevel(spark,
      s"$dir/two", q, "vec_id", "embedding", k = 3,
      nProbeCoarse = 2, nProbeFine = 2))
    val viaPq = collected(AnnIndex.searchIvfIndexTwoLevelPq(spark,
      s"$dir/two", q, "vec_id", "embedding", k = 3,
      nProbeCoarse = 2, nProbeFine = 2, rerankFactor = 60))
    assert(viaPq == exact,
      "a shortlist holding every candidate must reproduce the exact arm")
    // a no-PQ tree refuses loudly
    AnnIndex.buildIvfIndexTwoLevel(e, "vec_id", "embedding",
      s"$dir/nopq", nCoarse = 4, nFinePerCell = 3)
    val ex = intercept[IllegalArgumentException] {
      AnnIndex.searchIvfIndexTwoLevelPq(spark, s"$dir/nopq", q,
        "vec_id", "embedding", k = 3)
    }
    assert(ex.getMessage.contains("pqM"), ex.getMessage)
  }

  test("PQ arm: corrupt vectors carry NULL pq codes and never enter " +
      "the shortlist (the int8-arm quarantine, unlike the exact arms " +
      "where NaN floats scale to 0)") {
    val dir = Files.createTempDirectory("graft_2lvl_pqc").toString
    val clean = corpus(40)
    val bad = Seq((999L, Array(Float.NaN, 1.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    AnnIndex.buildIvfIndexTwoLevel(clean.unionByName(bad),
      "vec_id", "embedding", s"$dir/two", nCoarse = 4, nFinePerCell = 2,
      pqM = Some(2), pqKs = 16)
    val post = spark.read.parquet(s"$dir/two/postings.parquet")
    assert(post.where(col("vec_id") === 999L)
      .select(col("pq_codes").isNull).head().getBoolean(0),
      "the corrupt row must carry null codes")
    val got = AnnIndex.searchIvfIndexTwoLevelPq(spark, s"$dir/two",
      clean.where(col("vec_id") < 4), "vec_id", "embedding", k = 3,
      nProbeCoarse = 4, nProbeFine = 2, rerankFactor = 60)
    assert(got.where(col("neighbor_id") === 999L).isEmpty,
      "null codes never rank into a shortlist")
  }

  test("every incremental lifecycle mutation REFUSES a two-level tree " +
      "loudly and mutates nothing (r16 review finding: a delete's " +
      "tombstones would otherwise be silently ignored by the " +
      "two-level search arms — served takedown-obligated vectors)") {
    val dir = Files.createTempDirectory("graft_2lvl_guard").toString
    val e = corpus(40)
    AnnIndex.buildIvfIndexTwoLevel(e, "vec_id", "embedding", s"$dir/two",
      nCoarse = 4, nFinePerCell = 2)
    val before = spark.read.parquet(s"$dir/two/postings.parquet")
      .select("vec_id", "coarse", "fine")
      .collect().map(_.toSeq.toString).sorted.toSeq
    import spark.implicits._
    def refused(body: => Any): Unit = {
      val ex = intercept[IllegalArgumentException](body)
      assert(ex.getMessage.contains("TWO-LEVEL"), ex.getMessage)
    }
    refused(AnnIndex.appendToIvfIndex(spark, s"$dir/two",
      Seq((100L, Array(1f, 0f, 0f, 0f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", gen = 1L))
    refused(AnnIndex.deleteFromIvfIndex(spark, s"$dir/two",
      Seq(1L).toDF("vec_id"), "vec_id", del = 1L))
    refused(AnnIndex.compactIvfIndex(spark, s"$dir/two"))
    refused(AnnIndex.maybeRetrain(spark, s"$dir/two", e,
      "vec_id", "embedding", nCells = 4))
    val after = spark.read.parquet(s"$dir/two/postings.parquet")
      .select("vec_id", "coarse", "fine")
      .collect().map(_.toSeq.toString).sorted.toSeq
    assert(after == before, "a refused mutation must touch nothing")
    assert(!new java.io.File(s"$dir/two/_deletes").exists(),
      "no tombstone dir may appear on a two-level tree")
    // ... and the refused writers left no lock behind
    assert(!new java.io.File(s"$dir/two/_writer_lock").exists())
  }

  test("zero-downtime versioned rebuild composes: the published tree " +
      "searches identically to a direct build under the same coarse " +
      "centroids") {
    val root = Files.createTempDirectory("graft_2lvl_v").toString + "/idx"
    val e = corpus(48)
    val (v, cents) = AnnIndex.rebuildIvfIndexTwoLevelVersioned(
      e, "vec_id", "embedding", root, nCoarse = 4, nFinePerCell = 2)
    assert(v == 1L)
    val dirDirect = Files.createTempDirectory("graft_2lvl_vd").toString
    AnnIndex.buildIvfIndexTwoLevel(e, "vec_id", "embedding",
      s"$dirDirect/two", nCoarse = 4, nFinePerCell = 2,
      coarseCentroids = Some(cents))
    val q = e.where(col("vec_id") < 6)
    val viaPointer = collected(AnnIndex.searchIvfIndexTwoLevel(spark,
      AnnIndex.currentIndexDir(spark, root), q, "vec_id", "embedding",
      k = 3, nProbeCoarse = 2, nProbeFine = 2))
    val direct = collected(AnnIndex.searchIvfIndexTwoLevel(spark,
      s"$dirDirect/two", q, "vec_id", "embedding", k = 3,
      nProbeCoarse = 2, nProbeFine = 2))
    assert(viaPointer == direct && viaPointer.nonEmpty)
  }
}
