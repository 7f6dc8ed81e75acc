package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting for training-data pipelines.
  * Everything here is reproducible from the data alone — no RNG state,
  * no `rand()` (which re-draws per task retry and breaks exactly-once
  * semantics at scale).
  */
object Sampling {

  /** Stratified exact-fraction sample: the first `ceil(fraction · n_s)`
    * rows of each stratum in `orderCol` order (systematic sampling —
    * deterministic, re-runnable, oracle-checkable). One window over
    * the stratum partition; no global pass.
    */
  def stratifiedExact(df: DataFrame, strataCol: Column, orderCol: Column,
      fraction: Double): DataFrame = {
    val w = Window.partitionBy(strataCol).orderBy(orderCol)
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__cnt", count(lit(1)).over(Window.partitionBy(strataCol)))
      .where(col("__rn") <= ceil(col("__cnt") * fraction))
      .drop("__rn", "__cnt")
  }

  /** Train/val/test hash split: bucket = xxhash64(id) mod 100 routed by
    * cumulative `weights` percentages (e.g. Seq("train"->80, "val"->10,
    * "test"->10)). Pure map-side expression — each row's split is a
    * function of its id alone, so the assignment is stable under
    * re-partitioning, retries, and incremental re-runs (the property
    * `randomSplit` lacks).
    */
  def hashSplit(df: DataFrame, idCol: Column,
      weights: Seq[(String, Int)]): DataFrame = {
    require(weights.map(_._2).sum == 100, "weights must sum to 100")
    val bucket = pmod(xxhash64(idCol), lit(100))
    val cum = weights.scanLeft(0)(_ + _._2).tail
    val expr = weights.zip(cum).foldRight(lit(weights.last._1): Column) {
      case (((name, _), hi), acc) => when(bucket < hi, name).otherwise(acc)
    }
    df.withColumn("split", expr)
  }
}
