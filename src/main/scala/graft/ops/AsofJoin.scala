package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the most recent right row with
  * right.ts <= left.ts within the same key — the standard
  * event-enrichment operator (attach the latest dimension version /
  * signup / price quote known at event time).
  *
  * Implemented as tagged-union + one window pass (last non-null carried
  * payload), NOT a per-row range join: one shuffle on the key, one
  * sort — O(n log n) per key and AQE-skew-splittable, the shape that
  * survives 100 TB. At equal timestamps the right row sorts first, so
  * a same-instant right row IS visible to the left row (<=, matching
  * DuckDB's ASOF semantics).
  */
object AsofJoin {

  /** @param left      rows to enrich
    * @param right     versioned payload rows
    * @param key       equi-join column present on both sides
    * @param ts        event-time column present on both sides
    * @param payload   right-side columns to carry onto left rows
    *                  (null when no right row is at-or-before)
    */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      key: String, ts: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadStruct = struct(payload.map(col): _*)
    val l = left
      .withColumn("__tag", lit(1))
      .withColumn("__p", lit(null).cast(
        right.select(payloadStruct).schema.head.dataType))
      .select(col(key), col(ts).as("__ts"), col("__tag"), col("__p"),
        struct(leftCols.map(col): _*).as("__lrow"))
    val r = right
      .withColumn("__tag", lit(0))
      .withColumn("__p", payloadStruct)
      .select(col(key), col(ts).as("__ts"), col("__tag"), col("__p"),
        lit(null).cast(l.schema("__lrow").dataType).as("__lrow"))
    // right (tag 0) sorts before left (tag 1) at equal ts -> inclusive.
    val w = Window.partitionBy(col(key)).orderBy(col("__ts"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val joined = l.unionByName(r)
      .withColumn("__last", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__tag") === 1)
    val out = leftCols.map(c => col(s"__lrow.$c").as(c)) ++
      payload.map(p => col(s"__last.$p").as(p))
    joined.select(out: _*)
  }
}
