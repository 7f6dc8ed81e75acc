package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops.Similarity

/** Diagnostic main (RecallProbe convention): measures the mid-corpus
  * ANN arms against vector dimension, pinning `adaptiveTopK`'s
  * high-dim dispatch crossover ([[Similarity.HighDimProjectionFloor]])
  * to evidence. LSH pays dim in both its stages (plane dots per
  * vector, full-dim candidate scoring); the JL shortlist pays dim once
  * in a map-only projection then scores pairs at fixed projDim — so
  * past some dim the projected arm must win. Corpus is deterministic
  * clustered synthetic (hash-derived center + noise — the shape real
  * embedding corpora have), 256-query batch, k=5.
  *
  * Run: sbt "runMain graft.ShortlistProbe"
  */
object ShortlistProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nRows = 20000L
    val nClusters = 64
    def corpusAt(dim: Int): DataFrame =
      spark.range(nRows).select(col("id").as("vec_id"),
        transform(sequence(lit(1), lit(dim)), i =>
          (((pmod(xxhash64((col("id") % nClusters) * dim + i), lit(2001)) - 1000.0) / 1000.0
            + (pmod(xxhash64(col("id") * dim + i + lit(777777)), lit(201)) - 100.0) / 2000.0)
            ).cast("float")).as("embedding"))

    def time(f: => Long): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = f
      (n, (System.nanoTime() - t0) / 1e9)
    }

    for (dim <- args.headOption.map(_.split(",").map(_.toInt).toSeq)
        .getOrElse(Seq(64, 128, 256, 512))) {
      val corpus = corpusAt(dim).cache()
      corpus.count()
      val queries = corpus.where(col("vec_id") < 256).cache()
      queries.count()
      val (nL, tLsh) = time(Similarity.lshTopK(queries, corpus,
        "vec_id", "embedding", k = 5, nPlanes = 8, nTables = 4, dim = dim).count())
      val (nP, tProj) = time(Similarity.projectedRerankTopK(queries, corpus,
        "vec_id", "embedding", k = 5, projDim = 32, rerankFactor = 8).count())
      val (nPQ, tProjQ) = time(Similarity.projectedQuantizedRerankTopK(queries,
        corpus, "vec_id", "embedding", k = 5,
        projDim = 32, shortlistFactor = 16, rerankFactor = 4).count())
      println(f"[shortlist-probe] rows=$nRows dim=$dim%4d " +
        f"lsh=$tLsh%6.2fs($nL) proj=$tProj%6.2fs($nP) projq=$tProjQ%6.2fs($nPQ) " +
        f"lsh/proj=${tLsh / tProj}%4.2fx lsh/projq=${tLsh / tProjQ}%4.2fx")
      corpus.unpersist(blocking = false)
      queries.unpersist(blocking = false)
    }
    spark.stop()
  }
}
