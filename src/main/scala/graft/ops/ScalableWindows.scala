package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Distributed equivalents of globally-ordered window frames.
  *
  * A window with no PARTITION BY ships every row to one task
  * (`WindowExec: No Partition Defined` → single partition) — fine on a
  * 2.5k-row date dimension, fatal on a 100 TB fact table. These
  * helpers keep the exact ROWS-frame semantics while partitioning by a
  * coarse bucket of the order column and patching the bucket
  * boundaries with carry rows.
  */
object ScalableWindows {

  /** Trailing ROWS-frame aggregates (`ROWS BETWEEN <lookback> PRECEDING
    * AND CURRENT ROW` over a global `ORDER BY orderCol`) computed with
    * a PARTITIONED window.
    *
    * Mechanics: rows are bucketed by `bucket(orderCol)` (e.g. year for
    * daily rows). The last `lookback` rows of each bucket are duplicated
    * into the next PRESENT bucket as carry rows, so the frame of each
    * bucket's first rows still sees its true predecessors; carries are
    * excluded from the output. The successor map is built driver-side —
    * buckets are coarse by construction (years over days, days over
    * minutes), so the distinct-bucket list is bounded and tiny even at
    * 100 TB of input rows.
    *
    * Result is bit-identical to the global window as long as every
    * bucket holds at least `lookback` rows (a carry chain never needs
    * to span two buckets) — callers pick a bucket with that density.
    * `orderCol` values must be unique (one row per order key), the
    * natural shape after the upstream groupBy that produces the series
    * being smoothed.
    *
    * @param bucket maps the order column to a LONG-castable coarse key
    * @param aggs   (outputName, frame => aggregate-over-frame) pairs,
    *               e.g. `"avg7" -> (w => avg(col("x")).over(w))`
    */
  def trailingByBucket(
      df: DataFrame, orderCol: String, bucket: Column => Column,
      lookback: Int, aggs: Seq[(String, WindowSpec => Column)]): DataFrame = {
    val keyed = df.withColumn("__b", bucket(col(orderCol)).cast("long"))
    val present = keyed.select("__b").distinct().orderBy("__b")
      .collect().map(_.getLong(0)).toSeq
    val nextOf: Map[Long, Long] =
      present.zip(present.drop(1)).toMap
    // last `lookback` rows of each bucket, re-keyed to the next bucket
    val tailW = Window.partitionBy(col("__b")).orderBy(col(orderCol).desc)
    val carries = keyed
      .withColumn("__rdesc", row_number().over(tailW))
      .where(col("__rdesc") <= lookback)
      .drop("__rdesc")
      .withColumn("__b", try_element_at(typedLit(nextOf), col("__b")))
      .where(col("__b").isNotNull) // last bucket has no successor
      .withColumn("__carry", lit(true))
    val frame = Window.partitionBy(col("__b")).orderBy(col(orderCol))
      .rowsBetween(-lookback.toLong, 0L)
    val withAggs = aggs.foldLeft(
      keyed.withColumn("__carry", lit(false)).unionByName(carries)) {
      case (acc, (name, mk)) => acc.withColumn(name, mk(frame))
    }
    withAggs.where(!col("__carry")).drop("__b", "__carry")
  }
}
