package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed —
  * at 100 TB a single hot key (one viral document, one mega-customer)
  * turns a shuffle join into one straggler task.
  *
  * `saltedJoin` splinters each hot key into `saltFactor` sub-keys:
  * the large (skewed) side gets a random-but-deterministic salt from a
  * row hash; the small side is replicated `saltFactor` times so every
  * salted key still finds its match. Result is row-identical to the
  * plain join. AQE's skew-join handling covers sort-merge spills
  * automatically; salting is the tool when the skew sits in an
  * aggregation or when AQE's split thresholds don't bite.
  */
object Skew {

  /** Deterministic salt in [0, saltFactor) derived from the row's other
    * columns (xxhash64 — stable across runs, unlike rand()).
    */
  def salt(saltFactor: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(saltFactor.toLong)).cast("int")

  /** Inner equi-join of a skewed large side with a small side, salted.
    * `largeSalt` columns feed the salt hash (any columns that spread
    * the hot key's rows, e.g. a line number or payload hash).
    */
  def saltedJoin(
      large: DataFrame, small: DataFrame, key: String,
      saltFactor: Int, largeSaltCols: Seq[String]): DataFrame = {
    val saltedLarge = large.withColumn("__salt",
      salt(saltFactor, largeSaltCols.map(col): _*))
    val saltedSmall = small
      .withColumn("__salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedLarge.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase (partial → final) aggregation for skewed group keys:
    * first aggregate per (key, salt), then merge the partials per key.
    * `partialAggs` must be algebraic (sum/count/min/max) so the merge
    * is the same function over partial results.
    */
  def saltedSumCount(
      df: DataFrame, key: String, valueCol: String,
      saltFactor: Int, saltCols: Seq[String]): DataFrame =
    df.withColumn("__salt", salt(saltFactor, saltCols.map(col): _*))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum(col("__psum")).as("sum"), sum(col("__pcnt")).as("count"))
}
