package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway scale probe: replicate the documents fixture N× (ids
  * offset, text perturbed per replica so replicas are near- but not
  * exact-dups) and time the superlinear-risk dedup operators at 1× vs
  * N× — the local stand-in for "does the postings/banding formulation
  * stay near-linear when the corpus grows".
  */
object ScaleProbe {
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
      .select("doc_id", "text", "lang", "n_chars")
    val n1 = docs1.count()
    val docsN = docs1
      .crossJoin(spark.range(mult).toDF("rep"))
      .select((col("doc_id") + col("rep") * 1000000L).as("doc_id"),
        // perturb: prepend a replica tag word so replicas are near-dups,
        // not byte-dups (keeps shingle sets overlapping but distinct)
        concat(lit("rep"), col("rep"), lit(" "), col("text")).as("text"),
        col("lang"), col("n_chars"))
      .repartition(32)
      .persist()
    val nN = docsN.count()
    def t[A](label: String)(body: => A): Unit = {
      val t0 = System.nanoTime(); body
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    println(s"[probe] corpus 1x=$n1 docs, ${mult}x=$nN docs")
    import graft.ops.Dedup
    t(s"ngramJaccardPairs 1x") {
      Dedup.ngramJaccardPairs(docs1, "doc_id", "text", n = 3, threshold = 0.6,
        maxDocFreq = Some(500)).count()
    }
    t(s"ngramJaccardPairs ${mult}x") {
      Dedup.ngramJaccardPairs(docsN, "doc_id", "text", n = 3, threshold = 0.6,
        maxDocFreq = Some(500)).count()
    }
    t(s"minhashLshPairs 1x") {
      Dedup.minhashLshPairs(docs1, "doc_id", "text", n = 3, bands = 4,
        rowsPerBand = 8, threshold = 0.6).count()
    }
    t(s"minhashLshPairs ${mult}x") {
      Dedup.minhashLshPairs(docsN, "doc_id", "text", n = 3, bands = 4,
        rowsPerBand = 8, threshold = 0.6).count()
    }
    // materialize pairs OUTSIDE the timed block so the CC number
    // measures clustering, not a recomputed pair generation
    val ccPairs = Dedup.minhashLshPairs(docsN, "doc_id", "text", n = 3,
      bands = 4, rowsPerBand = 8, threshold = 0.6).persist()
    ccPairs.count()
    t(s"dedupClusters ${mult}x (CC over pre-built LSH pairs)") {
      Dedup.connectedComponents(ccPairs).count()
    }
    ccPairs.unpersist()
    docsN.unpersist()

    // ANN side: replicate embeddings Nx with a deterministic per-replica
    // rotation (component shift keeps vectors distinct but realistic);
    // corpus grows Nx while the query set stays fixed — the production
    // shape (a query batch against an ever-growing corpus).
    val emb1 = graft.engine.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding")
    val e1 = emb1.count()
    val embN = emb1
      .crossJoin(spark.range(mult).toDF("rep"))
      .select((col("vec_id") + col("rep") * 1000000L).as("vec_id"),
        // rotate: drop `rep % 8` leading components to the tail
        concat(slice(col("embedding"), (col("rep") % 8 + 1).cast("int"), lit(64)),
          slice(col("embedding"), lit(1), (col("rep") % 8).cast("int")))
          .as("embedding"))
      .repartition(32)
      .persist()
    val eN = embN.count()
    println(s"[probe] corpus 1x=$e1 vecs, ${mult}x=$eN vecs")
    import graft.ops.Similarity
    val queries = emb1.where(col("vec_id") < 10)
    t(s"bruteForceTopK 1x") {
      Similarity.bruteForceTopK(queries, emb1, "vec_id", "embedding", k = 5).count()
    }
    t(s"bruteForceTopK ${mult}x") {
      Similarity.bruteForceTopK(queries, embN, "vec_id", "embedding", k = 5).count()
    }
    t(s"lshTopK 1x") {
      Similarity.lshTopK(queries, emb1, "vec_id", "embedding", k = 5).count()
    }
    t(s"lshTopK ${mult}x") {
      Similarity.lshTopK(queries, embN, "vec_id", "embedding", k = 5).count()
    }
    t(s"ivf train+assign ${mult}x") {
      val cents = Similarity.trainIvfCentroids(embN, "vec_id", "embedding",
        k = 16, iters = 3)
      Similarity.ivfAssign(embN, "embedding", cents).groupBy("cell").count().count()
    }
    // corpus-vs-corpus (every vector is a query): the shape where
    // brute force is quadratic (32k² = 1e9 dots) and bucketing is the
    // only viable plan
    t(s"lshTopK corpus-vs-corpus ${mult}x") {
      Similarity.lshTopK(embN, embN, "vec_id", "embedding", k = 5).count()
    }
    // full-precision IVF vs int8-candidate + exact-rerank at the same
    // parameters, corpus-vs-corpus: the quantized path's candidate
    // join moves dim bytes instead of dim·8 — the gap is the
    // shuffle-width win (wall time at this dim/scale; bytes at 100 TB)
    val centsN = Similarity.trainIvfCentroids(embN, "vec_id", "embedding",
      k = 32, iters = 2)
    t(s"ivfTopK corpus-vs-corpus ${mult}x") {
      Similarity.ivfTopK(embN, embN, "vec_id", "embedding", k = 5,
        nProbe = 2, centroids = Some(centsN)).count()
    }
    t(s"ivfTopKQuantizedRerank corpus-vs-corpus ${mult}x") {
      Similarity.ivfTopKQuantizedRerank(embN, embN, "vec_id", "embedding", k = 5,
        nProbe = 2, rerankFactor = 4, centroids = Some(centsN)).count()
    }
    embN.unpersist()
    spark.stop()
  }
}
