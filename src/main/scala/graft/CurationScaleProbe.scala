package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the round-7 curation operators (same protocol as
  * [[ScaleProbe]]: replicate the sf0.1 documents N× with perturbed
  * text, time 1× vs N×). What each one must show:
  * - dsirScores: near-linear (bucket table is nBuckets rows at any
  *   scale; per-doc scoring is map-side + one doc-keyed aggregate).
  * - stripRepeatedSpans: near-linear (span df is a two-level
  *   count-distinct; coverage explode is a bounded constant per
  *   frequent-span occurrence).
  * - Bpe.merges: SUBLINEAR in corpus size (the merge loop runs on the
  *   vocabulary; replicating documents multiplies occurrence counts,
  *   not distinct words — only the one corpus→vocab scan grows).
  * - PerplexityBuckets.terciles: near-linear (histogram window rides
  *   distinct quantized scores, not rows).
  */
object CurationScaleProbe {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(16)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val docs1 = graft.engine.Tables.documents(spark, dir)
      .select("doc_id", "text", "lang", "source")
    val docsN = docs1
      .crossJoin(spark.range(mult).toDF("rep"))
      .select((col("doc_id") + col("rep") * 1000000L).as("doc_id"),
        concat(lit("rep"), col("rep"), lit(" "), col("text")).as("text"),
        col("lang"), col("source"))
      .repartition(32)
      .persist()
    println(s"[probe] corpus 1x=${docs1.count()} docs, ${mult}x=${docsN.count()} docs")
    def t[A](label: String)(body: => A): Unit = {
      val t0 = System.nanoTime(); body
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    import graft.ops.{Bpe, Dedup, LanguageModel, PerplexityBuckets, Selection}
    val target1 = docs1.where(col("doc_id") < 20)
    t("dsirScores 1x") {
      Selection.dsirScores(docs1.where(col("doc_id") >= 20), target1,
        "doc_id", "text").count()
    }
    t(s"dsirScores ${mult}x") {
      Selection.dsirScores(docsN.where(col("doc_id") % 1000000L >= 20), target1,
        "doc_id", "text").count()
    }
    t("stripRepeatedSpans 1x") {
      Dedup.stripRepeatedSpans(docs1, "doc_id", "text", 6, 2).count()
    }
    t(s"stripRepeatedSpans ${mult}x") {
      Dedup.stripRepeatedSpans(docsN, "doc_id", "text", 6, 2).count()
    }
    t("bpeMerges 1x") {
      Bpe.merges(docs1, "doc_id", "text", 3).count()
    }
    t(s"bpeMerges ${mult}x") {
      Bpe.merges(docsN, "doc_id", "text", 3).count()
    }
    t("perplexityTerciles 1x") {
      PerplexityBuckets.terciles(LanguageModel.bigramCrossEntropy(
        docs1, "doc_id", "text", "lang")
        .select(col("doc_id"), col("lang"), col("nll6"))).count()
    }
    t(s"perplexityTerciles ${mult}x") {
      PerplexityBuckets.terciles(LanguageModel.bigramCrossEntropy(
        docsN, "doc_id", "text", "lang")
        .select(col("doc_id"), col("lang"), col("nll6"))).count()
    }
    import graft.ops.TextOps
    // Continuation additions — what each must show at N×:
    // gopherRules/winnow: linear (map-only scan→project);
    // winnowedPairs: the fingerprint postings join grows with
    //   replication-induced duplicate density (same inherent shape as
    //   q24's exact join, at ~2/(w+1) the index size — the cap bounds
    //   hot fingerprints);
    // ngramNovelty: near-linear (docfreq aggregate + join-back —
    //   no pair term at all).
    // .agg over computed columns — a bare count() would let Catalyst
    // prune the whole map stage and time nothing
    t("gopherRules 1x") {
      TextOps.gopherRules(docs1, "doc_id", "text")
        .agg(sum(when(col("keep"), 1L).otherwise(0L))).collect()
    }
    t(s"gopherRules ${mult}x") {
      TextOps.gopherRules(docsN, "doc_id", "text")
        .agg(sum(when(col("keep"), 1L).otherwise(0L))).collect()
    }
    t("winnow 1x") {
      TextOps.winnow(docs1, "doc_id", "text")
        .agg(sum(col("n_selected"))).collect()
    }
    t(s"winnow ${mult}x") {
      TextOps.winnow(docsN, "doc_id", "text")
        .agg(sum(col("n_selected"))).collect()
    }
    t("winnowedPairs 1x") {
      Dedup.winnowedPairs(docs1, "doc_id", "text", minShared = 3).count()
    }
    t(s"winnowedPairs ${mult}x") {
      Dedup.winnowedPairs(docsN, "doc_id", "text", minShared = 3).count()
    }
    t("ngramNovelty 1x") {
      Dedup.ngramNovelty(docs1, "doc_id", "text").count()
    }
    t(s"ngramNovelty ${mult}x") {
      Dedup.ngramNovelty(docsN, "doc_id", "text").count()
    }
    // r8 continuation — what each must show at N×:
    // containmentPairs: same postings shape as the exact Jaccard join;
    //   replication multiplies per-shingle posting lists, so the
    //   docFreq cap is what bounds it (probe runs the capped form —
    //   the uncapped arm is the q24-measured quadratic);
    // tokenStreamOffsets/windowManifest: near-linear (two scans + a
    //   bounded driver scan; explode is ~1 row per window);
    // snapshotDiff: near-linear (two hash projections + one 16-byte
    //   full-outer join).
    t("containmentPairs(cap=64) 1x") {
      Dedup.containmentPairs(docs1, "doc_id", "text", n = 3,
        threshold = 0.6, maxDocFreq = Some(64)).count()
    }
    t(s"containmentPairs(cap=64) ${mult}x") {
      Dedup.containmentPairs(docsN, "doc_id", "text", n = 3,
        threshold = 0.6, maxDocFreq = Some(64)).count()
    }
    import graft.ops.{Packing, Versioning}
    def denseIds(df: org.apache.spark.sql.DataFrame) = df.select(
      ((col("doc_id") % 1000000L) * mult +
        expr("doc_id div 1000000")).cast("long").as("doc_id"),
      TextOps.bpeishTokenCount(col("text")).cast("long").as("n_tokens"))
    t("tokenStream+manifest 1x") {
      Packing.windowManifest(Packing.tokenStreamOffsets(
        denseIds(docs1), "doc_id", "n_tokens", 2048L), 2048L)
        .agg(sum(col("tokens_in_window"))).collect()
    }
    t(s"tokenStream+manifest ${mult}x") {
      Packing.windowManifest(Packing.tokenStreamOffsets(
        denseIds(docsN), "doc_id", "n_tokens", 2048L), 2048L)
        .agg(sum(col("tokens_in_window"))).collect()
    }
    t("snapshotDiff 1x") {
      Versioning.snapshotDiff(
        docs1.where(col("doc_id") % 7 =!= 0),
        docs1.where(col("doc_id") % 5 =!= 0), "doc_id", "text").count()
    }
    t(s"snapshotDiff ${mult}x") {
      Versioning.snapshotDiff(
        docsN.where(col("doc_id") % 7 =!= 0),
        docsN.where(col("doc_id") % 5 =!= 0), "doc_id", "text").count()
    }
    // r10 — classifier scoring through the token_buckets kernel: must
    // be LINEAR in corpus (one compiled pass per doc, dense-array
    // weight lookup, no shuffle at all in the scorer); training is a
    // bounded seed-side job and does not ride the corpus.
    t("classifier train 1x-seeds") {
      val (w, d) = Selection.collectClassifierWeights(
        docs1.where(col("doc_id") % 7 === 0),
        docs1.where(col("doc_id") % 7 === 3),
        "doc_id", "text", nBuckets = 1024)
      probeClassifier = (w, d)
    }
    t("scoreWithClassifier 1x") {
      Selection.scoreWithClassifier(docs1, "doc_id", "text",
          probeClassifier._1, probeClassifier._2, nBuckets = 1024)
        .agg(sum(when(col("keep"), 1L).otherwise(0L))).collect()
    }
    t(s"scoreWithClassifier ${mult}x") {
      Selection.scoreWithClassifier(docsN, "doc_id", "text",
          probeClassifier._1, probeClassifier._2, nBuckets = 1024)
        .agg(sum(when(col("keep"), 1L).otherwise(0L))).collect()
    }
    docsN.unpersist()
    // r10 — incremental IVF append vs full rebuild at N×: the
    // hourly-ingest economics. Append assigns ONLY the delta against
    // the stored centroids (one delta-sized job + one generation
    // write); a rebuild re-trains and re-lays the whole corpus. The
    // gap is what the appendedFraction drift threshold trades against.
    // (locally{}: a bare block after the unpersist() line parses as
    // Dataset.apply(colName) — the block-argument trap)
    locally {
      import graft.ops.AnnIndex
      val emb1 = graft.engine.Tables.embeddings(spark, dir)
      val embN = emb1.crossJoin(spark.range(mult).toDF("rep"))
        .select((col("vec_id") + col("rep") * 1000000000L).as("vec_id"),
          col("embedding"))
        .repartition(32)
        .persist()
      println(s"[probe] vectors ${mult}x=${embN.count()}")
      val base = embN.where(col("vec_id") % 10L =!= 0L) // 90%
      val delta = embN.where(col("vec_id") % 10L === 0L) // the hourly 10%
      val idxDir = java.nio.file.Files.createTempDirectory("graft_probe_ivf")
      try {
        t(s"ivf build 90% of ${mult}x") {
          AnnIndex.buildIvfIndex(base, "vec_id", "embedding",
            s"$idxDir/ivf", nCells = 64, iters = 2)
        }
        t(s"ivf APPEND 10% of ${mult}x") {
          AnnIndex.appendToIvfIndex(spark, s"$idxDir/ivf", delta,
            "vec_id", "embedding", gen = 1L)
        }
        t(s"ivf REBUILD 100% of ${mult}x") {
          AnnIndex.buildIvfIndex(embN, "vec_id", "embedding",
            s"$idxDir/full", nCells = 64, iters = 2)
        }
        // r11 — compaction economics: a day of hourly appends leaves G
        // delta generations (G×cells part files, G×p directory seeks
        // per probed cell). Measure the search tax the fragmented tree
        // pays, the one-time fold cost, and the file-count collapse —
        // the datum behind AnnIndex.DefaultRetrainTau's "fold first,
        // retrain only on drift" split.
        locally {
          val qs = embN.where(col("vec_id") < 32)
          def searchT(label: String): Unit = t(label) {
            AnnIndex.searchIvfIndex(spark, s"$idxDir/ivf", qs,
              "vec_id", "embedding", k = 5, nProbe = 4).count()
          }
          def nFiles(): Long = spark.read
            .parquet(s"$idxDir/ivf/postings.parquet")
            .select(input_file_name()).distinct().count()
          // each hour brings NEW ids (the append contract): shift the
          // delta's id space per generation
          t(s"ivf 7 more hourly appends (gens 2..8)") {
            (2 to 8).foreach { g =>
              AnnIndex.appendToIvfIndex(spark, s"$idxDir/ivf",
                delta.select(
                  (col("vec_id") + lit(g) * 7000000000L).as("vec_id"),
                  col("embedding")),
                "vec_id", "embedding", gen = g.toLong)
            }
          }
          println(s"[probe] ivf files fragmented (9 gens): ${nFiles()}")
          searchT(s"ivf SEARCH fragmented (9 gens) ${mult}x")
          t(s"ivf COMPACT 9 gens ${mult}x") {
            AnnIndex.compactIvfIndex(spark, s"$idxDir/ivf")
          }
          println(s"[probe] ivf files compacted (1 gen): ${nFiles()}")
          searchT(s"ivf SEARCH compacted (1 gen) ${mult}x")
          // r11 — takedown economics: the tombstone write never touches
          // postings (O(delete set)), the search-side anti-join tax is
          // the price until the next fold makes the delete physical
          t(s"ivf DELETE 1% tombstones ${mult}x") {
            AnnIndex.deleteFromIvfIndex(spark, s"$idxDir/ivf",
              embN.where(col("vec_id") % 100 === 0).select("vec_id"),
              "vec_id", del = 1L)
          }
          searchT(s"ivf SEARCH tombstoned ${mult}x")
          t(s"ivf COMPACT purge tombstones ${mult}x") {
            AnnIndex.compactIvfIndex(spark, s"$idxDir/ivf")
          }
          searchT(s"ivf SEARCH purged ${mult}x")
        }
      } finally {
        embN.unpersist()
        graft.engine.FsUtil.deleteRecursively(idxDir)
      }
    }
    spark.stop()
  }

  private var probeClassifier: (Map[Long, Long], Long) = (Map.empty, 0L)
}
