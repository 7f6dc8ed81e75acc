package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.cosineSim

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two tiers:
  * - `bruteForceTopK` — exact cosine top-k, O(|Q|·|C|). Correct baseline;
  *   fine when |Q| is small (the query side broadcasts) — at 100 TB the
  *   corpus side stays partitioned and never shuffles.
  * - `lshTopK` / `ivfTopK` — the scale path: candidates restricted to
  *   matching random-hyperplane LSH buckets (or coarse IVF cells), so the
  *   join is bucket-colocated instead of a cross product.
  *
  * All hash "randomness" is derived deterministically from xxhash64 of
  * (plane, dim) — no RNG, reproducible across runs and engines.
  */
object Similarity {

  /** Exact cosine top-k: for each query vector, the k corpus neighbors
    * by descending cosine, tiebroken by corpus id (deterministic).
    * Query side is broadcast; ranking is a per-query window.
    */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      excludeSelf: Boolean = true,
      simFn: (Column, Column) => Column = cosineSim,
      simName: String = "cosine"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val joined = c.join(broadcast(q),
      if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col(simName).desc, col("neighbor_id"))
    joined
      .select(col("query_id"), col("neighbor_id"),
        simFn(col("qv"), col("cv")).as(simName))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Deterministic ±1 hyperplane component for (table, plane, dim):
    * driver-side splitmix64-style bit mix of the coordinates. Row-
    * independent, so planes are materialized ONCE as literals — the
    * per-row work is only multiplies, never hashing.
    */
  private def planeComponent(table: Int, plane: Int, dim: Int): Double = {
    var x = table * 1000003L + plane * 7919L + dim * 104729L + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x = x ^ (x >>> 31)
    if ((x & 1L) == 1L) 1.0 else -1.0
  }

  /** Literal plane matrix for one (table, plane): a dim-length ±1 row. */
  private def planeLit(table: Int, plane: Int, dim: Int): Column =
    typedLit((0 until dim).map(d => planeComponent(table, plane, d)))

  /** Random-hyperplane LSH bucket id for one table: `nPlanes` sign bits
    * packed into a long. Vectors in the same bucket agree on every
    * hyperplane side — cosine-similar vectors collide with high
    * probability. `dim` is the embedding dimensionality (planes are
    * driver-side literals).
    */
  def lshBucket(vec: Column, table: Int, nPlanes: Int, dim: Int): Column =
    (0 until nPlanes).map { p =>
      val dotp = aggregate(
        zip_with(vec, planeLit(table, p, dim), (x, w) => x.cast("double") * w),
        lit(0.0), (acc, v) => acc + v)
      when(dotp > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** LSH-bucketed ANN top-k: queries only compare against corpus
    * vectors in the same bucket. Multi-probe via `nTables` independent
    * hash tables (different plane seeds) to recover recall; results
    * are the union of tables, re-ranked exactly.
    */
  def lshTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nPlanes: Int = 8, nTables: Int = 4, dim: Int = 64): DataFrame = {
    def withBuckets(df: DataFrame, side: String): DataFrame =
      df.select(
        col(idCol).as(s"${side}_id"), col(vecCol).as(s"${side}v"),
        posexplode(array((0 until nTables).map(t =>
          lshBucket(col(vecCol), t, nPlanes, dim)): _*)))
        .withColumnsRenamed(Map("pos" -> "table", "col" -> "bucket"))
    val qb = withBuckets(queries, "query")
    val cb = withBuckets(corpus, "neighbor")
    val cands = cb.join(qb, Seq("table", "bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("queryv"), col("neighborv"))
      .distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    cands
      .select(col("query_id"), col("neighbor_id"),
        cosineSim(col("queryv"), col("neighborv")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Deterministic IVF centroid training: k-means over the embedding
    * column with hash-seeded initialization (lowest xxhash64(id) rows —
    * reproducible, no RNG) and `iters` Lloyd iterations, each one
    * assignment (broadcast centroids) + one mean-reduction per cell
    * (partial aggregation map-side). Each iteration is two narrow
    * passes over the data — the shape that holds at corpus scale where
    * k ≪ n and centroids always fit in a broadcast.
    */
  def trainIvfCentroids(
      df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    val spark = df.sparkSession
    var centroids = df
      .withColumn("__h", xxhash64(col(idCol)))
      .orderBy(col("__h"), col(idCol))
      .limit(k)
      .withColumn("cid", (row_number().over(
        Window.orderBy(col("__h"), col(idCol))) - 1).cast("long"))
      .select(col("cid"), col(vecCol).cast("array<double>").as("cvec"))
    centroids.cache()
    for (_ <- 0 until iters) {
      val assigned = ivfAssign(df, idCol, vecCol, centroids, "cid", "cvec")
      // mean per cell, dimension-wise: aggregate element-sums + count
      val next = assigned
        .groupBy(col("cell"))
        .agg(
          count(lit(1)).as("n"),
          array((0 until dimOf(df, vecCol)).map(i =>
            sum(element_at(col(vecCol), i + 1).cast("double"))): _*).as("sums"))
        .select(col("cell").as("cid"),
          transform(col("sums"), s => s / col("n")).as("cvec"))
      val materialized = next.cache()
      materialized.count()
      centroids.unpersist()
      centroids = materialized
    }
    centroids
  }

  private def dimOf(df: DataFrame, vecCol: String): Int =
    df.select(size(col(vecCol))).head().getInt(0)

  /** IVF coarse quantization: assign each vector to its nearest of
    * `centroids` (id, vec) — the cell id becomes the blocking key.
    * Centroids are expected to be few (broadcast).
    */
  def ivfAssign(
      df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, cidCol: String, cvecCol: String): DataFrame = {
    val w = Window.partitionBy(col("__id")).orderBy(col("__sim").desc, col("__cell"))
    df.select(col("*"), col(idCol).as("__id"))
      .crossJoin(broadcast(centroids.select(
        col(cidCol).as("__cell"), col(cvecCol).as("__cvec"))))
      .withColumn("__sim", cosineSim(col(vecCol), col("__cvec")))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__cvec", "__sim", "__rn", "__id")
      .withColumnRenamed("__cell", "cell")
  }
}
