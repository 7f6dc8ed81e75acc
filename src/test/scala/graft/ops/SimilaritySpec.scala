package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpecBase {
  import spark.implicits._

  // Small deterministic corpus: three tight clusters around axes.
  private def corpus = {
    val rows = for {
      axis <- 0 until 3
      i <- 0 until 5
    } yield {
      val v = Array.fill(8)(0.01f * (i + 1))
      v(axis) = 1.0f
      (axis * 5 + i.toLong, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("bruteForceTopK: neighbors come from the query's own cluster") {
    val q = corpus.where(col("vec_id") === 0) // cluster-0 member
    val top = Similarity.bruteForceTopK(q, corpus, "vec_id", "embedding", k = 4)
      .select("neighbor_id").as[Long].collect().toSet
    assert(top == Set(1L, 2L, 3L, 4L)) // the other cluster-0 members
  }

  test("bruteForceTopK: rank is dense 1..k and self excluded") {
    val q = corpus.where(col("vec_id") < 2)
    val rows = Similarity.bruteForceTopK(q, corpus, "vec_id", "embedding", k = 3)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect()
    rows.groupBy(_._1).foreach { case (qid, rs) =>
      assert(rs.map(_._3).sorted.toSeq == Seq(1, 2, 3))
      assert(!rs.exists(_._2 == qid))
    }
  }

  test("lshTopK achieves high recall vs brute force on clustered data") {
    val q = corpus.where(col("vec_id").isin(0, 5, 10))
    val exact = Similarity.bruteForceTopK(q, corpus, "vec_id", "embedding", k = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(q, corpus, "vec_id", "embedding", k = 3,
        nPlanes = 4, nTables = 8, dim = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.65, s"LSH recall $recall too low (found ${approx.size} of ${exact.size})")
  }

  test("trainIvfCentroids recovers the three planted clusters") {
    val cents = Similarity.trainIvfCentroids(corpus, "vec_id", "embedding", k = 3, iters = 4)
    assert(cents.size == 3)
    val assigned = Similarity.ivfAssign(corpus, "embedding", cents)
      .select("vec_id", "cell").as[(Long, Long)].collect()
    // cluster purity: every member of an axis-cluster lands in one cell
    val byCluster = assigned.groupBy(_._1 / 5).values
    byCluster.foreach { members =>
      assert(members.map(_._2).distinct.length == 1,
        s"cluster split across cells: ${members.toSeq}")
    }
    // and the three clusters occupy three distinct cells
    assert(assigned.map(_._2).distinct.length == 3)
  }

  test("trainIvfCentroids scans a bounded sample, not the corpus") {
    // The training sample is a TakeOrdered limited to the cap — the
    // Lloyd iterations can never touch more rows than that at ANY
    // corpus size.
    val sample = Similarity.trainingSample(corpus, "vec_id", "embedding", cap = 6)
    val plan = sample.queryExecution.optimizedPlan.toString
    assert(plan.contains("GlobalLimit 6") || plan.contains("Limit 6"), plan)
    assert(sample.count() == 6)
    // Sampled training ≡ full-cap training on the manually-thinned
    // corpus: the cap is the ONLY thing the sample changes.
    val viaCap = Similarity.trainIvfCentroids(
      corpus, "vec_id", "embedding", k = 3, iters = 3, trainSampleCap = 6)
    val sampleDf = sample.select(col("__id").as("vec_id"), col("__v").as("embedding"))
    val viaThinned = Similarity.trainIvfCentroids(
      sampleDf, "vec_id", "embedding", k = 3, iters = 3)
    assert(viaCap == viaThinned)
    // the cap never drops below k: k seeds always survive
    val tiny = Similarity.trainIvfCentroids(
      corpus, "vec_id", "embedding", k = 3, iters = 1, trainSampleCap = 1)
    assert(tiny.size == 3)
  }

  test("trainingSample hash-quantile pre-thin is exact, wrong hints fall back") {
    val plain = Similarity.trainingSample(corpus, "vec_id", "embedding", cap = 6)
      .select("__id").as[Long].collect().toSeq
    // a hint just past the 16·cap engagement bound: the quantile
    // filter activates (keep-fraction just under 1/2) and the sample
    // is identical — via the thinned path or the exact fallback
    val n = corpus.count()
    val hinted = Similarity.trainingSample(corpus, "vec_id", "embedding",
      cap = 6, corpusRowsHint = Some(math.max(n, 16L * 6 + 1)))
    assert(hinted.select("__id").as[Long].collect().toSeq == plain)
    // a hint 1000× too LARGE makes the quantile filter drop everything
    // → the guard detects the under-collection and the unthinned path
    // returns the exact same sample
    val wayOff = Similarity.trainingSample(corpus, "vec_id", "embedding",
      cap = 6, corpusRowsHint = Some(n * 100000L))
    assert(wayOff.select("__id").as[Long].collect().toSeq == plain)
    // a small-corpus hint (≤ 8·cap) bypasses thinning entirely
    val small = Similarity.trainingSample(corpus, "vec_id", "embedding",
      cap = 6, corpusRowsHint = Some(10L))
    assert(small.select("__id").as[Long].collect().toSeq == plain)
    // hinted training produces identical centroids
    val c1 = Similarity.trainIvfCentroids(corpus, "vec_id", "embedding",
      k = 3, iters = 3, trainSampleCap = 6)
    val c2 = Similarity.trainIvfCentroids(corpus, "vec_id", "embedding",
      k = 3, iters = 3, trainSampleCap = 6, corpusRowsHint = Some(n))
    assert(c1 == c2)
  }

  test("adaptiveCellCount: √|C| growth halts at the 65,536-cell cap") {
    assert(Similarity.adaptiveCellCount(100L) == 10)
    assert(Similarity.adaptiveCellCount(100000L) == 316)
    assert(Similarity.adaptiveCellCount(0L) == 8) // floor
    // 10¹² vectors: uncapped √ would be 10⁶ centroids (~0.5 GB of
    // driver state, 6×10⁷ flops/row assignment) — the cap holds
    assert(Similarity.adaptiveCellCount(1000000000000L) == 65536)
    assert(Similarity.adaptiveCellCount(Long.MaxValue) == 65536)
  }

  test("ivfAssign puts each vector in its nearest centroid cell") {
    val centroids = Seq(
      Seq(1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0),
      Seq(0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0),
      Seq(0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0))
    val assigned = Similarity.ivfAssign(corpus, "embedding", centroids)
      .select("vec_id", "cell").as[(Long, Long)].collect()
    assigned.foreach { case (vid, cell) => assert(cell == vid / 5) }
  }

  test("assignCell ties break to the lowest cell id") {
    val centroids = Seq(
      Seq(1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0),
      Seq(1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)) // identical → tie on every row
    val cells = Similarity.ivfAssign(corpus, "embedding", centroids)
      .select("cell").as[Long].collect()
    assert(cells.forall(_ == 0L))
  }

  test("rankTopK handles string ids (window fallback) and null sims") {
    val scored = Seq(
      (1L, "doc-a", Some(0.9)), (1L, "doc-b", Some(0.9)), // tie -> id order
      (1L, "doc-c", Some(0.5)), (1L, "doc-null", Option.empty[Double])
    ).toDF("query_id", "neighbor_id", "sim")
    // both id-type paths honor the SAME output contract: exactly
    // (query_id, neighbor_id, <sim>, rank), extra columns dropped
    val viaWindow = Similarity.rankTopK(scored.withColumn("extra", lit(1)), k = 3, "sim")
    assert(viaWindow.columns.toSeq == Seq("query_id", "neighbor_id", "sim", "rank"))
    val got = Similarity.rankTopK(scored, k = 3, "sim")
      .orderBy("rank").select("neighbor_id", "rank")
      .as[(String, Int)].collect().toSeq
    // null sim excluded; string ids rank correctly instead of null-casting
    assert(got == Seq(("doc-a", 1), ("doc-b", 2), ("doc-c", 3)))
    // long ids with a null sim: aggregator path must not crash either
    val longIds = Seq((1L, 10L, Some(0.9)), (1L, 11L, Option.empty[Double]))
      .toDF("query_id", "neighbor_id", "sim")
    val got2 = Similarity.rankTopK(longIds, k = 2, "sim")
      .select("neighbor_id").as[Long].collect().toSeq
    assert(got2 == Seq(10L))
  }

  test("top-k ranking plans the bounded aggregate, never a window sort") {
    val q = corpus.where(col("vec_id") < 2)
    Seq(
      Similarity.bruteForceTopK(q, corpus, "vec_id", "embedding", k = 3),
      Similarity.lshTopK(q, corpus, "vec_id", "embedding", k = 3,
        nPlanes = 4, nTables = 2, dim = 8)
    ).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Window"), s"window in plan:\n$plan")
      assert(plan.contains("ObjectHashAggregate") || plan.contains("HashAggregate")
        || plan.contains("SortAggregate"), plan)
    }
  }

  test("lshTopK candidate dedup happens on id pairs, not on vector payloads") {
    val q = corpus.where(col("vec_id") < 2)
    val df = Similarity.lshTopK(q, corpus, "vec_id", "embedding", k = 3,
      nPlanes = 4, nTables = 2, dim = 8)
    // the distinct (HashAggregate with both ids as grouping keys and no
    // other columns) must not carry the embedding arrays
    val aggs = df.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
          if a.aggregateExpressions.map(_.name).toSet == Set("query_id", "neighbor_id") => a
    }
    assert(aggs.nonEmpty, "expected an id-pair distinct in the plan")
    aggs.foreach { a =>
      assert(!a.output.exists(_.dataType.simpleString.contains("array")),
        s"vectors flow through the dedup: ${a.output}")
    }
  }

  test("adaptiveTopK: small query batch takes the exact brute-force plan") {
    val q = corpus.where(col("vec_id") < 2)
    val df = Similarity.adaptiveTopK(q, corpus, "vec_id", "embedding", k = 3,
      nPlanes = 4, nTables = 2, dim = 8)
    // brute force broadcasts the query side; LSH plans carry a bucket
    // column — absence of "bucket" marks the exact path
    assert(!df.queryExecution.optimizedPlan.toString.contains("bucket"))
    val exact = Similarity.bruteForceTopK(q, corpus, "vec_id", "embedding", k = 3)
    assert(df.collect().map(_.toSeq).toSet == exact.collect().map(_.toSeq).toSet)
  }

  test("adaptiveTopK: corpus-sized query side takes the LSH-bucketed plan") {
    val df = Similarity.adaptiveTopK(corpus, corpus, "vec_id", "embedding",
      k = 3, nPlanes = 2, nTables = 2, dim = 8) // crossover 4 < 15 fixture vectors
    assert(df.queryExecution.optimizedPlan.toString.contains("bucket"))
    assert(df.count() > 0)
  }

  test("adaptiveTopK: large corpus + large query batch takes the IVF plan") {
    val df = Similarity.adaptiveTopK(corpus, corpus, "vec_id", "embedding",
      k = 3, nPlanes = 2, nTables = 2, dim = 8,
      corpusRows = Some(200), ivfCorpusFloor = 100) // past the IVF floor
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("cell") && !plan.contains("bucket"), plan)
    assert(df.count() > 0)
  }

  test("adaptiveTopK: quantizedCandidates routes the IVF branch through int8 scoring") {
    val df = Similarity.adaptiveTopK(corpus, corpus, "vec_id", "embedding",
      k = 3, nPlanes = 2, nTables = 2, dim = 8,
      corpusRows = Some(200), ivfCorpusFloor = 100,
      quantizedCandidates = true)
    val plan = df.queryExecution.optimizedPlan.toString
    // the quantized path is identified by its code columns in the plan
    assert(plan.contains("neighbor_codes") && plan.contains("cell"), plan)
    assert(df.count() > 0)
  }

  // plan-tree detection, not string matching: project-collapse
  // inlines column aliases away, but the native kernel expressions stay
  private def planHas(df: org.apache.spark.sql.DataFrame)(
      pred: org.apache.spark.sql.catalyst.expressions.Expression => Boolean): Boolean =
    df.queryExecution.optimizedPlan.exists(_.expressions.exists(_.exists(pred)))

  test("adaptiveTopK: high-dim mid-corpus takes the projected-shortlist plan") {
    val df = Similarity.adaptiveTopK(corpus, corpus, "vec_id", "embedding",
      k = 3, nPlanes = 2, nTables = 2, dim = 8,
      highDimFloor = 8) // dim 8 ≥ forced floor → projected arm
    assert(planHas(df)(_.isInstanceOf[graft.expressions.RandomProjection]))
    assert(!df.queryExecution.optimizedPlan.toString.contains("bucket"))
    // pure projected arm: no quantized mid-stage without codes/flag
    assert(!planHas(df)(_.isInstanceOf[graft.expressions.Int8Dot]))
    assert(df.count() > 0)
  }

  test("adaptiveTopK: high-dim + quantized stacks the int8 mid-stage on the projected plan") {
    val df = Similarity.adaptiveTopK(corpus, corpus, "vec_id", "embedding",
      k = 3, nPlanes = 2, nTables = 2, dim = 8,
      highDimFloor = 8, quantizedCandidates = true)
    assert(planHas(df)(_.isInstanceOf[graft.expressions.RandomProjection]))
    assert(planHas(df)(_.isInstanceOf[graft.expressions.Int8Dot]))
    assert(df.count() > 0)
  }

  test("adaptiveTopK: STORED corpus codes auto-route quantized scoring, no flag needed") {
    val quantCorpus = Similarity.withQuantizedInt8(corpus, "embedding")
    val df = Similarity.adaptiveTopK(corpus, quantCorpus, "vec_id", "embedding",
      k = 3, nPlanes = 2, nTables = 2, dim = 8,
      corpusRows = Some(200), ivfCorpusFloor = 100) // IVF branch
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("neighbor_codes") && plan.contains("cell"), plan)
    assert(df.count() > 0)
  }

  test("projectedQuantizedRerankTopK returns exact scores on the composed shortlist") {
    val res = Similarity.projectedQuantizedRerankTopK(
      corpus.where(col("vec_id") < 3), corpus, "vec_id", "embedding",
      k = 3, projDim = 8, shortlistFactor = 4, rerankFactor = 2)
    val exactTwin = Similarity.bruteForceTopK(
      corpus.where(col("vec_id") < 3), corpus, "vec_id", "embedding", k = 3)
      .select(col("query_id"), col("neighbor_id"), col("cosine"))
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    val rows = res.select("query_id", "neighbor_id", "cosine")
      .as[(Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, c) =>
      assert(a != b, s"self match $a")
      // any returned pair's score must equal the exact cosine for
      // that pair (the shortlist may differ from the exact top-k set,
      // but scores must never carry quantized/projected approximation)
      exactTwin.get((a, b)).foreach(ex => assert(c == ex, s"($a,$b): $c != $ex"))
    }
  }

  test("ivfAssignProbes: first probe is the assigned cell, probes distinct") {
    val cents = Similarity.trainIvfCentroids(corpus, "vec_id", "embedding",
      k = 3, iters = 4)
    val single = Similarity.ivfAssign(corpus, "embedding", cents)
      .select("vec_id", "cell").as[(Long, Long)].collect().toMap
    val probes = Similarity.ivfAssignProbes(corpus, "embedding", cents, nProbe = 2)
      .select("vec_id", "cell").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    probes.foreach { case (vid, cells) =>
      assert(cells.length == 2 && cells.distinct.length == 2, s"$vid -> $cells")
      assert(cells.head == single(vid),
        s"first probe ${cells.head} != assigned cell ${single(vid)}")
    }
  }

  test("ivfTopK probing every cell equals brute force (exact re-rank inside)") {
    val q = corpus.where(col("vec_id").isin(0, 7, 14))
    val exact = Similarity.bruteForceTopK(q, corpus, "vec_id", "embedding", k = 4)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val ivf = Similarity.ivfTopK(q, corpus, "vec_id", "embedding", k = 4,
        nCells = 3, iters = 4, nProbe = 3) // nProbe = nCells → all candidates
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(ivf == exact)
  }

  test("int8 quantization: codes in range, error within scale/2, zeros exact") {
    val emb = Seq(
      (0L, Array(1.0f, -0.5f, 0.25f, 0.0f)),
      (1L, Array(0.003f, -0.001f, 0.002f, 0.0005f)), // tiny magnitudes
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f))            // degenerate
    ).toDF("vec_id", "embedding")
    val q = Similarity.withQuantizedInt8(emb, "embedding")
    // Seq[Byte], not Array[Byte]: the latter encodes as BINARY, while
    // q_codes is a true array<tinyint> column
    val rows = q.select("vec_id", "embedding", "q_scale", "q_codes")
      .as[(Long, Array[Float], Double, Seq[Byte])].collect().sortBy(_._1)
    rows.foreach { case (id, vec, scale, codes) =>
      assert(codes.length == vec.length)
      assert(codes.forall(c => c >= -127 && c <= 127), s"$id codes ${codes.toSeq}")
      if (id == 2L) assert(scale == 0.0 && codes.forall(_ == 0))
      else {
        assert(scale > 0.0)
        vec.zip(codes).foreach { case (x, c) =>
          assert(math.abs(x.toDouble - c * scale) <= scale / 2 + 1e-12,
            s"$id: $x vs ${c * scale} (scale $scale)")
        }
        // the max-magnitude element maps to ±127 exactly
        assert(codes.map(c => math.abs(c.toInt)).max == 127)
      }
    }
  }

  test("int8 quantization: NaN/Infinity vectors get null scale+codes, no throw") {
    val emb = Seq(
      (0L, Array(1.0f, 2.0f)),
      (1L, Array(Float.NaN, 1.0f)),
      (2L, Array(Float.PositiveInfinity, 1.0f))
    ).toDF("vec_id", "embedding")
    val rows = Similarity.withQuantizedInt8(emb, "embedding")
      .select("vec_id", "q_scale", "q_codes").collect().sortBy(_.getLong(0))
    assert(!rows(0).isNullAt(1) && !rows(0).isNullAt(2))
    Seq(1, 2).foreach { i =>
      assert(rows(i).isNullAt(1), s"row $i scale should be null")
      assert(rows(i).isNullAt(2), s"row $i codes should be null")
    }
  }

  test("quantized rerank with exhaustive probes and ample shortlist equals brute force") {
    val q = corpus.where(col("vec_id").isin(0, 7, 14))
    val exact = Similarity.bruteForceTopK(q, corpus, "vec_id", "embedding", k = 4)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    // nProbe = nCells → every pair is a candidate; rerankFactor·k ≥
    // corpus → the int8 shortlist cannot evict a true neighbor; the
    // final ranking is then the full-precision exact ranking.
    val quant = Similarity.ivfTopKQuantizedRerank(q, corpus, "vec_id", "embedding",
        k = 4, nCells = 3, iters = 4, nProbe = 3, rerankFactor = 5)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(quant == exact)
  }

  test("quantized rerank: candidate joins carry int8 codes, never float vectors") {
    val q = corpus.where(col("vec_id") < 2)
    val df = Similarity.ivfTopKQuantizedRerank(q, corpus, "vec_id", "embedding",
      k = 3, nCells = 3, iters = 2, nProbe = 2)
    val codeJoins = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.output.exists(_.name == "neighbor_codes") => j
    }
    assert(codeJoins.nonEmpty, "expected the quantized candidate join in the plan")
    codeJoins.foreach { j =>
      val floats = j.output.filter(a =>
        a.dataType.simpleString.contains("array<float>") ||
        a.dataType.simpleString.contains("array<double>"))
      assert(floats.isEmpty,
        s"full-precision vectors ride the candidate join: $floats")
    }
  }

  test("quantized rerank reuses stored q_codes/q_scale instead of recomputing") {
    val q = corpus.where(col("vec_id") === 0)
    // pre-quantized corpus (codes stored at ingest — the q74 shape):
    // results must equal the recompute-from-vectors path
    val stored = Similarity.withQuantizedInt8(corpus, "embedding")
    val fresh = Similarity.ivfTopKQuantizedRerank(q, corpus, "vec_id", "embedding",
        k = 3, nCells = 3, iters = 3, nProbe = 3)
      .collect().map(_.toSeq).toSet
    val viaStored = Similarity.ivfTopKQuantizedRerank(q, stored, "vec_id", "embedding",
        k = 3, nCells = 3, iters = 3, nProbe = 3)
      .collect().map(_.toSeq).toSet
    assert(viaStored == fresh)
    // PROOF the stored codes are honored (not silently recomputed):
    // fake codes that give vector 14 (wrong cluster, true cosine low)
    // the max possible int8 dot and everyone else zero — with a
    // 1-element shortlist the returned neighbor must be the faked one
    val faked = corpus
      .withColumn("q_scale",
        when(col("vec_id") === 14, 1.0).otherwise(0.0))
      // Seq[Byte], not Array[Byte]: the latter encodes as BINARY,
      // q_codes must be a true array<tinyint>
      .withColumn("q_codes", when(col("vec_id") === 14,
          typedLit(Seq.fill(8)(127.toByte)))
        .otherwise(typedLit(Seq.fill(8)(0.toByte))))
    val steered = Similarity.ivfTopKQuantizedRerank(q, faked, "vec_id", "embedding",
        k = 1, nCells = 3, iters = 3, nProbe = 3, rerankFactor = 1)
      .select("neighbor_id").as[Long].collect().toSeq
    assert(steered == Seq(14L),
      s"stored codes ignored (got $steered — operator recomputed codes)")
  }

  test("zero-norm corpus vectors rank as neighbors of nothing — no ANSI abort") {
    // all-sub-quantum vector: decimal-scaled norm is 0; an unguarded
    // division would abort the whole job under ANSI DIVIDE_BY_ZERO —
    // try_divide nulls the cosine and ranking quarantines the row
    val dirty = corpus.union(
      Seq((99L, Array.fill(8)(1e-8f))).toDF("vec_id", "embedding"))
    val q = corpus.where(col("vec_id") === 0)
    val got = Similarity.bruteForceTopK(q, dirty, "vec_id", "embedding", k = 5)
      .select("neighbor_id").as[Long].collect()
    assert(!got.contains(99L))
    assert(got.length == 5)
  }

  test("stored codes with a dim mismatch are excluded, not partial-scored") {
    // stale codes (dim 4) on dim-8 vectors: a min-length dot would
    // silently score a truncated prefix — the guard nulls them out
    val stale = corpus
      .withColumn("q_scale", lit(1.0))
      .withColumn("q_codes", typedLit(Seq.fill(4)(127.toByte)))
    val q = corpus.where(col("vec_id") === 0)
    val got = Similarity.ivfTopKQuantizedRerank(q, stale, "vec_id", "embedding",
        k = 3, nCells = 3, iters = 2, nProbe = 3)
      .collect()
    assert(got.isEmpty, s"dim-mismatched codes scored anyway: ${got.toSeq}")
  }

  test("quantized rerank: corrupt (NaN) corpus vectors are excluded, no abort") {
    val dirty = corpus.union(
      Seq((99L, Array(Float.NaN, 1.0f, 0f, 0f, 0f, 0f, 0f, 0f)))
        .toDF("vec_id", "embedding"))
    val q = corpus.where(col("vec_id") === 0)
    val got = Similarity.ivfTopKQuantizedRerank(q, dirty, "vec_id", "embedding",
        k = 4, nCells = 3, iters = 2, nProbe = 3, rerankFactor = 5)
      .select("neighbor_id").as[Long].collect()
    assert(!got.contains(99L))
    assert(got.nonEmpty)
  }

  test("ivfTopK candidate dedup happens on id pairs, not vector payloads") {
    val q = corpus.where(col("vec_id") < 2)
    val df = Similarity.ivfTopK(q, corpus, "vec_id", "embedding", k = 3,
      nCells = 3, iters = 2, nProbe = 2)
    val aggs = df.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
          if a.aggregateExpressions.map(_.name).toSet == Set("query_id", "neighbor_id") => a
    }
    assert(aggs.nonEmpty, "expected an id-pair distinct in the plan")
    aggs.foreach { a =>
      assert(!a.output.exists(_.dataType.simpleString.contains("array")),
        s"vectors flow through the dedup: ${a.output}")
    }
  }

  // Scala mirror of the rpSign/quantize law — an independent recompute,
  // not a Spark re-execution.
  private def rpSignRef(j: Int, i: Int): Long = {
    val h1 = ((i + j * 1048576L + 1L) * 2654435761L) % 2147483648L
    val h2 = h1 ^ (h1 >> 13)
    val h3 = (h2 * 2246822519L) % 2147483648L
    val h4 = h3 ^ (h3 >> 11)
    val h5 = (h4 * 3266489917L) % 2147483648L
    val h6 = h5 ^ (h5 >> 16)
    if ((h6 & 1L) == 1L) 1L else -1L
  }

  private def rpRef(vec: Seq[Float], outDim: Int): Seq[Long] = {
    val q6 = vec.map(x => math.floor(x.toDouble * 1e6).toLong)
    (0 until outDim).map { j =>
      q6.zipWithIndex.map { case (v, i) => v * rpSignRef(j, i) }.sum
    }
  }

  test("randomProjection matches the independent recompute; identical in, identical out") {
    val vs = Seq(
      (0L, Array(0.25f, -0.5f, 0.125f, 1.0f)),
      (1L, Array(0.25f, -0.5f, 0.125f, 1.0f)), // duplicate of 0
      (2L, Array(-1.0f, 2.0f, -3.0f, 0.0f)))
    val df = vs.toDF("vec_id", "embedding")
    val got = Similarity.randomProjection(df, "vec_id", "embedding", outDim = 8)
      .orderBy("vec_id").collect()
    vs.zipWithIndex.foreach { case ((_, v), r) =>
      val expect = rpRef(v.toSeq, 8)
      (0 until 8).foreach { j =>
        assert(got(r).getLong(got(r).fieldIndex(f"p$j%02d")) == expect(j),
          s"row $r dim $j")
      }
    }
    // identical vectors project identically
    assert((0 until 8).forall(j =>
      got(0).getLong(j + 1) == got(1).getLong(j + 1)))
  }

  test("randomProjection sign rows are balanced, distinct, and uncorrelated") {
    // over 64 input dims: both signs used, no near-duplicate rows —
    // pairwise Gram off-diagonals must sit in true-random-matrix
    // range (the two-LCG first cut measured 58/64 — near rank
    // collapse — and near-random projected-cosine recall)
    val rows = (0 until 32).map { j =>
      (0 until 64).map(i => rpSignRef(j, i))
    }
    rows.foreach { r =>
      val ones = r.count(_ == 1L)
      assert(ones >= 16 && ones <= 48, s"degenerate sign row: $ones of 64")
    }
    assert(rows.distinct.size == 32, "duplicate sign rows")
    for (a <- 0 until 32; b <- (a + 1) until 32) {
      val dot = math.abs((0 until 64).map(i => rows(a)(i) * rows(b)(i)).sum)
      assert(dot <= 32, s"correlated sign rows $a,$b: |dot|=$dot of 64")
    }
  }

  test("projectedRerankTopK: exhaustive shortlist equals brute force exactly") {
    // rerankFactor large enough that the shortlist covers the whole
    // corpus -> the exact re-rank must reproduce bruteForceTopK
    // verbatim (ids, scores, ranks)
    val q = corpus.where(col("vec_id") < 3)
    val brute = Similarity.bruteForceTopK(q, corpus, "vec_id", "embedding", k = 3)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    val proj = Similarity.projectedRerankTopK(q, corpus, "vec_id", "embedding",
        k = 3, projDim = 8, rerankFactor = 8)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    assert(proj == brute)
  }

  test("randomProjection: native ≡ declarative on values, quarantine, and empties") {
    val df = Seq(
      (0L, Array(0.25f, -0.5f, 0.125f, 1.0f, 0.3f)),
      (1L, Array(-1.0f, 2.0f, -3.0f, 0.0f, 0.7f)),
      (2L, Array(Float.NaN, 1.0f, 1.0f, 1.0f, 1.0f)),
      (3L, Array.empty[Float])
    ).toDF("vec_id", "embedding")
    val native = Similarity.randomProjection(df, "vec_id", "embedding",
      outDim = 8, native = true).orderBy("vec_id").collect().map(_.toSeq).toSeq
    val decl = Similarity.randomProjection(df, "vec_id", "embedding",
      outDim = 8, native = false).orderBy("vec_id").collect().map(_.toSeq).toSeq
    assert(native == decl)
    // and both match the independent mirror on the clean rows
    assert((0 until 8).forall(j =>
      native(0)(j + 1) == rpRef(Seq(0.25f, -0.5f, 0.125f, 1.0f, 0.3f), 8)(j)))
  }

  test("randomProjection: NaN/Inf vectors quarantine to null, not abort") {
    val df = Seq(
      (0L, Array(1.0f, 2.0f)),
      (1L, Array(Float.NaN, 2.0f)),
      (2L, Array(Float.PositiveInfinity, 0.5f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.randomProjection(df, "vec_id", "embedding", outDim = 4)
      .orderBy("vec_id").collect()
    assert(!got(0).isNullAt(1))
    assert((1 to 4).forall(got(1).isNullAt))
    assert((1 to 4).forall(got(2).isNullAt))
  }

  // ---- bitextMine -------------------------------------------------------

  test("bitextMine: mutual margin-best pairs mine; one-directional bests do not") {
    // src 0 and tgt 10 are near-duplicates (the planted pair); src 2
    // points at tgt 11 but tgt 11's best source is src 4 (closer) —
    // mutual-best must reject the one-directional attraction
    val src = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.6f, 0.8f, 0.0f)),
      (4L, Array(0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val tgt = Seq(
      (10L, Array(0.99f, 0.01f, 0.0f)),
      (11L, Array(0.05f, 0.995f, 0.0f)),
      (12L, Array(0.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.bitextMine(src, tgt, "vec_id", "embedding", k = 2)
      .orderBy("src_id", "tgt_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(4), r.getBoolean(5)))
    val mutual = got.filter(_._3).map(t => (t._1, t._2)).toSet
    assert(mutual.contains((0L, 10L)), s"planted pair must be mutual: ${got.mkString(",")}")
    assert(mutual.contains((4L, 11L)), s"(4,11) mutual: ${got.mkString(",")}")
    assert(!mutual.contains((2L, 11L)), "one-directional best must not be mutual")
    // every src appears exactly k times in the forward candidate list
    assert(got.groupBy(_._1).forall(_._2.length == 2))
    // mined ⊆ mutual_best
    assert(got.filter(_._4).forall(_._3))
  }

  test("bitextMine margin matches the exact quantized-sum recompute") {
    val src = Seq((0L, Array(1.0f, 0.2f)), (1L, Array(0.3f, 1.0f)))
      .toDF("vec_id", "embedding")
    val tgt = Seq((10L, Array(0.9f, 0.1f)), (11L, Array(0.2f, 0.9f)))
      .toDF("vec_id", "embedding")
    val k = 2
    def q6(v: Float): Double = math.round(v.toDouble * 1e6).toDouble
    def cos(a: Array[Float], b: Array[Float]): Double = {
      def dot(x: Array[Float], y: Array[Float]) =
        x.indices.map(i => q6(x(i)) * q6(y(i))).sum / 1e12
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    val sv = Map(0L -> Array(1.0f, 0.2f), 1L -> Array(0.3f, 1.0f))
    val tv = Map(10L -> Array(0.9f, 0.1f), 11L -> Array(0.2f, 0.9f))
    def c9(d: Double): Long = math.floor(d * 1e9).toLong
    val sumF = sv.map { case (i, v) => i -> tv.values.map(w => c9(cos(v, w))).sum }
    val sumB = tv.map { case (i, v) => i -> sv.values.map(w => c9(cos(w, v))).sum }
    val got = Similarity.bitextMine(src, tgt, "vec_id", "embedding", k)
      .orderBy("src_id", "tgt_id").collect()
    got.foreach { r =>
      val (s, t) = (r.getLong(0), r.getLong(1))
      // ratio margin, the engine's IEEE shape: both neighborhoods
      // saturate at k=2 here, so each side averages over 2
      val expect = (c9(cos(sv(s), tv(t))) * 2L).toDouble /
        (sumF(s).toDouble / 2.0 + sumB(t).toDouble / 2.0)
      assert(r.getDouble(3) == expect, s"margin($s,$t) ${r.getDouble(3)} != $expect")
    }
  }

  test("bitextMine: asymmetric sub-k neighborhoods use per-side averages, " +
      "not the pooled mean") {
    // 2 sources x 1 target with k=2: every forward neighborhood holds
    // ONE member (cnt_f=1) while the backward neighborhood holds BOTH
    // sources (cnt_b=2) — the case where the Artetxe-Schwenk ratio
    // margin c9 / ((sum_f/cnt_f + sum_b/cnt_b)/2) differs from the
    // pooled mean c9*(cnt_f+cnt_b)/(sum_f+sum_b). The r10 ADVICE
    // finding: the pooled form was only tested at cnt_f == cnt_b.
    val sv = Map(0L -> Array(1.0f, 0.0f), 1L -> Array(0.6f, 0.8f))
    val tv = Map(10L -> Array(0.8f, 0.6f))
    val src = sv.toSeq.sortBy(_._1).toDF("vec_id", "embedding")
    val tgt = tv.toSeq.sortBy(_._1).toDF("vec_id", "embedding")
    def q6(v: Float): Double = math.round(v.toDouble * 1e6).toDouble
    def cos(a: Array[Float], b: Array[Float]): Double = {
      def dot(x: Array[Float], y: Array[Float]) =
        x.indices.map(i => q6(x(i)) * q6(y(i))).sum / 1e12
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    def c9(d: Double): Long = math.floor(d * 1e9).toLong
    val sumB = sv.values.map(w => c9(cos(w, tv(10L)))).sum
    val got = Similarity.bitextMine(src, tgt, "vec_id", "embedding", k = 2)
      .orderBy("src_id", "tgt_id").collect()
    assert(got.length == 2)
    got.foreach { r =>
      val s = r.getLong(0)
      val cc = c9(cos(sv(s), tv(10L)))
      val expect = (cc * 2L).toDouble /
        (cc.toDouble / 1.0 + sumB.toDouble / 2.0)
      assert(r.getDouble(3) == expect,
        s"asymmetric margin($s,10) ${r.getDouble(3)} != $expect")
      val pooled = (cc * 3L).toDouble / (cc + sumB).toDouble
      assert(r.getDouble(3) != pooled,
        "fixture must actually separate ratio from pooled margin")
    }
  }

  test("bitextMine: sub-k neighborhoods average over actual counts, not k") {
    // 1 source × 1 target with k=4: both neighborhoods hold ONE member,
    // so the ratio margin is 2·c9/(c9/1 + c9/1) = 1.0 exactly; the
    // old fixed-2k denominator would have reported 4.0 (averaging a
    // 1-member neighborhood over k). The ADVICE r9 finding.
    val src = Seq((0L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val tgt = Seq((10L, Array(0.6f, 0.8f))).toDF("vec_id", "embedding")
    val got = Similarity.bitextMine(src, tgt, "vec_id", "embedding", k = 4)
      .collect()
    assert(got.length == 1)
    assert(got.head.getDouble(3) == 1.0,
      s"sub-k margin must average over actual counts: got ${got.head.getDouble(3)}")
  }

  test("bitextMine: threshold gates mined; custom topKFn path is honored") {
    val src = Seq((0L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val tgt = Seq((10L, Array(1.0f, 0.0f)), (11L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val strict = Similarity.bitextMine(src, tgt, "vec_id", "embedding",
      k = 2, marginThreshold = 99.0).collect()
    assert(strict.forall(!_.getBoolean(5)), "nothing clears margin 99")
    // custom candidate generator (the ANN hook): brute per direction
    val viaFn = Similarity.bitextMine(src, tgt, "vec_id", "embedding", k = 2,
      topKFn = (q, c, id, v, kk) =>
        Similarity.bruteForceTopK(q, c, id, v, kk, excludeSelf = false))
      .orderBy("src_id", "tgt_id").collect().map(_.toSeq)
    val viaDefault = Similarity.bitextMine(src, tgt, "vec_id", "embedding", k = 2)
      .orderBy("src_id", "tgt_id").collect().map(_.toSeq)
    assert(viaFn.toSeq == viaDefault.toSeq)
  }

  test("hardNegativesTopK: nearest cross-label neighbors, pre-filtered " +
      "before k-bounding; null labels match nothing") {
    import spark.implicits._
    // two tight clusters; labels split WITHIN cluster A so anchors
    // there have same-label nearest neighbors a post-filter would keep
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f), "a"), (2L, Array(0.99f, 0.01f), "a"),
      (3L, Array(0.98f, 0.02f), "b"), (4L, Array(0.0f, 1.0f), "b"),
      (5L, Array(0.01f, 0.99f), null.asInstanceOf[String]))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegativesTopK(vecs, vecs, "vec_id",
        "embedding", "label", k = 2)
      .orderBy("query_id", "rank")
      .as[(Long, Long, Double, Int)].collect().toSeq
    val lab = Map(1L -> "a", 2L -> "a", 3L -> "b", 4L -> "b")
    // every mined pair crosses labels
    assert(got.forall(r => lab.get(r._1) != lab.get(r._2)))
    // anchor 1's HARD negative is the near-identical cross-label doc 3
    // (rank 1), which a post-filter over top-1 (doc 2, same label)
    // would have dropped entirely
    assert(got.filter(_._1 == 1L).head._2 == 3L)
    // null-labeled rows neither query nor serve
    assert(got.forall(r => r._1 != 5L && r._2 != 5L))
    // pre-filter semantics: every labeled anchor still fills k = 2
    assert(got.groupBy(_._1).forall(_._2.size == 2))
  }
}
