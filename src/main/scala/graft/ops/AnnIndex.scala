package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.cosineExact

/** Persisted IVF index — the stored-ingest shape for similarity
  * search, mirroring what the delta-dedup index does for MinHash-LSH:
  * train once at ingest, write the inverted lists to parquet, and let
  * every later search ride the stored layout instead of re-clustering
  * the corpus.
  *
  * Layout under `dir`:
  *   - `centroids.parquet` — (cell INT, centroid ARRAY<DOUBLE>), ≤
  *     [[Similarity.MaxAdaptiveCells]] rows.
  *   - `postings.parquet/cell=N/…` — (vec_id, vec, q_codes, q_scale),
  *     HIVE-PARTITIONED by cell: the on-disk analogue of IVF inverted
  *     lists. A search that probes p cells reads exactly p partition
  *     directories — partition pruning IS the inverted-list seek, and
  *     the int8 codes ride along for the quantized-shortlist path.
  *
  * Scale notes: centroid training is the bounded-sample discipline
  * ([[Similarity.trainIvfCentroids]]); the postings write is one
  * corpus pass + a cell-key shuffle (the write repartitions by cell so
  * each partition directory is written by few tasks, not one file per
  * task per cell). Search never scans unprobed cells.
  */
object AnnIndex {

  /** Train + persist. Returns the trained centroids (also persisted).
    * `corpus` needs only (idCol, vecCol); vectors with corrupt
    * elements follow the training quarantine and quantize to null
    * codes ([[Similarity.withQuantizedInt8]]).
    */
  def buildIvfIndex(corpus: DataFrame, idCol: String, vecCol: String,
      dir: String, nCells: Int, iters: Int = 2,
      corpusRowsHint: Option[Long] = None): Seq[Seq[Double]] = {
    val spark = corpus.sparkSession
    val cents = Similarity.trainIvfCentroids(
      corpus, idCol, vecCol, nCells, iters, corpusRowsHint = corpusRowsHint)
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      cents.zipWithIndex.map { case (c, i) => Row(i, c) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("cell",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("centroid",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType), nullable = false))))
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/centroids.parquet")
    val posted = Similarity.ivfAssign(
        Similarity.withQuantizedInt8(
          corpus.select(col(idCol).as("vec_id"), col(vecCol).as("vec")), "vec"),
        "vec", cents)
      // co-locate each cell before the partitioned write: without this
      // every task writes a file into every cell directory (tasks ×
      // cells small files — the classic partitionBy explosion)
      .repartition(col("cell"))
    posted.write.mode(SaveMode.Overwrite)
      .partitionBy("cell").parquet(s"$dir/postings.parquet")
    cents
  }

  /** Stored centroids in cell order — the search-time coarse
    * quantizer. Bounded: ≤ nCells rows collect.
    */
  def loadCentroids(spark: SparkSession, dir: String): Seq[Seq[Double]] =
    spark.read.parquet(s"$dir/centroids.parquet")
      .orderBy("cell").collect()
      .map(r => r.getSeq[Double](1).toSeq).toSeq

  /** Search the persisted index: queries probe their `nProbe` nearest
    * stored centroids; ONLY the probed cells' partition directories
    * are scanned (`cell IN (…)` over the hive-partition column — the
    * probed-cell set is ≤ nCells values, collected bounded); exact
    * cosine re-rank over candidates whose vectors come straight off
    * the pruned postings scan (no second corpus pass). Self-matches
    * (same id on both sides) are excluded, as in [[Similarity.ivfTopK]]
    * — with the same centroids the two produce IDENTICAL output
    * (driver-checked, q126).
    */
  /** QUANTIZED search over the persisted index — why the int8 codes
    * are stored: candidates are scored with [[Similarity.quantizedDot]]
    * over the CODES off the pruned postings scan (dim bytes cross the
    * cell join, not dim·4 floats — the 4× candidate-join IO cut), a
    * `rerankFactor·k` shortlist survives, and ONLY the shortlist joins
    * back to the pruned partitions for the exact cosine re-rank.
    * With a shortlist generous enough to hold every candidate the
    * result is IDENTICAL to [[searchIvfIndex]] (the q126 plumbing
    * contract); at production shortlist sizes recall follows the
    * measured [[Similarity.ivfTopKQuantizedRerank]] behavior (factor 4
    * recall-identical on the fixtures — RecallProbe). Corrupt stored
    * vectors carry null codes and never enter the shortlist.
    */
  def searchIvfIndexQuantized(spark: SparkSession, dir: String,
      queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nProbe: Int = 2, rerankFactor: Int = 4): DataFrame = {
    require(rerankFactor >= 1, s"rerankFactor must be ≥ 1, got $rerankFactor")
    val cents = loadCentroids(spark, dir)
    require(cents.nonEmpty, s"empty index at $dir")
    val qa = Similarity.ivfAssignProbes(
        Similarity.withQuantizedInt8(
          queries.select(col(idCol).as("query_id"), col(vecCol).as("queryv")),
          "queryv"),
        "queryv", cents, nProbe)
      .select(col("query_id"), col("queryv"),
        col("q_codes").as("query_codes"), col("q_scale").as("query_scale"),
        col("cell").cast("int").as("cell"))
    val probed = qa.select("cell").distinct().collect().map(_.getInt(0))
    val postings = spark.read.parquet(s"$dir/postings.parquet")
      .where(col("cell").isin(probed.map(Integer.valueOf).toSeq: _*))
    // codes-only candidate scoring off the pruned scan
    val cands = postings
      .select(col("cell"), col("vec_id").as("neighbor_id"),
        col("q_codes").as("neighbor_codes"), col("q_scale").as("neighbor_scale"))
      .join(qa.select(col("query_id"), col("query_codes"),
        col("query_scale"), col("cell")), Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
    val shortlist = Similarity.rankTopK(
      cands.select(col("query_id"), col("neighbor_id"),
        Similarity.quantizedDot(col("query_codes"), col("query_scale"),
          col("neighbor_codes"), col("neighbor_scale")).as("approx")),
      k * rerankFactor, "approx")
      .select("query_id", "neighbor_id")
    // exact re-rank: vectors only for the shortlist, still read from
    // the PRUNED partitions (the id join rides the cell-filtered scan)
    val rerank = shortlist
      .join(qa.select("query_id", "queryv").dropDuplicates("query_id"),
        Seq("query_id"))
      .join(postings.select(col("vec_id").as("neighbor_id"),
        col("vec").as("neighborv")), Seq("neighbor_id"))
    Similarity.rankTopK(
      rerank.select(col("query_id"), col("neighbor_id"),
        cosineExact(col("queryv"), col("neighborv")).as("cosine")),
      k, "cosine")
  }

  def searchIvfIndex(spark: SparkSession, dir: String,
      queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nProbe: Int = 2): DataFrame = {
    val cents = loadCentroids(spark, dir)
    require(cents.nonEmpty, s"empty index at $dir")
    // cell ids are LONG in-plan (the native kernel's type) but the
    // hive partition column reads back as INT — normalize to int here
    // so the join and the IN-list bind against the partition column
    // without a cast wrapping it (a cast would defeat pruning)
    val qa = Similarity.ivfAssignProbes(queries, vecCol, cents, nProbe)
      .select(col(idCol).as("query_id"), col(vecCol).as("queryv"),
        col("cell").cast("int").as("cell"))
    // bounded collect: ≤ nCells distinct probed cells
    val probed = qa.select("cell").distinct().collect().map(_.getInt(0))
    val postings = spark.read.parquet(s"$dir/postings.parquet")
      .where(col("cell").isin(probed.map(Integer.valueOf).toSeq: _*))
    val cands = postings
      .select(col("cell"), col("vec_id").as("neighbor_id"), col("vec").as("neighborv"))
      .join(qa, Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      // multi-probe dedup: a neighbor sharing 2 probed cells with a
      // query must score once; vector payloads are identical per id,
      // so which duplicate survives cannot change any value
      .dropDuplicates("query_id", "neighbor_id")
    Similarity.rankTopK(
      cands.select(col("query_id"), col("neighbor_id"),
        cosineExact(col("queryv"), col("neighborv")).as("cosine")),
      k, "cosine")
  }
}
