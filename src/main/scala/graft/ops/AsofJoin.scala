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
    *                  (null when no right row qualifies)
    * @param direction "backward" (default): latest right row with
    *                  right.ts <= left.ts; "forward": earliest right
    *                  row with right.ts >= left.ts (both inclusive,
    *                  matching DuckDB/pandas asof conventions)
    * @param toleranceSeconds when set, a match farther than this from
    *                  the left timestamp is nulled out (pandas
    *                  merge_asof `tolerance`)
    */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      key: String, ts: String, payload: Seq[String],
      direction: String = "backward",
      toleranceSeconds: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val leftCols = left.columns.toSeq
    // SQL join semantics: NULL never matches NULL. Window.partitionBy
    // groups null keys together, so null-key rows must be routed around
    // the window pass — left ones pass through with null payload, right
    // ones can enrich nothing (matches pandas merge_asof / DuckDB ASOF).
    val leftNullKeys = left.where(col(key).isNull)
    val leftKeyed = left.where(col(key).isNotNull)
    val rightKeyed = right.where(col(key).isNotNull)
    // right event time rides inside the payload struct so tolerance
    // can compare it against the left timestamp after the carry
    val payloadStruct = struct(payload.map(col) :+ col(ts).as("__rts"): _*)
    val l = leftKeyed
      .withColumn("__tag", lit(1))
      .withColumn("__p", lit(null).cast(
        right.select(payloadStruct).schema.head.dataType))
      .select(col(key), col(ts).as("__ts"), col("__tag"), col("__p"),
        struct(leftCols.map(col): _*).as("__lrow"))
    val r = rightKeyed
      .withColumn("__tag", lit(0))
      .withColumn("__p", payloadStruct)
      .select(col(key), col(ts).as("__ts"), col("__tag"), col("__p"),
        lit(null).cast(l.schema("__lrow").dataType).as("__lrow"))
    // right (tag 0) sorts before left (tag 1) at equal ts -> inclusive;
    // forward = the same carry over the REVERSED time order.
    val ord =
      if (direction == "backward") Seq(col("__ts").asc, col("__tag").asc)
      else Seq(col("__ts").desc, col("__tag").asc)
    val w = Window.partitionBy(col(key)).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val joined = l.unionByName(r)
      .withColumn("__last", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__tag") === 1)
    val withinTol = toleranceSeconds match {
      case None => joined
      case Some(tol) => joined.withColumn("__last",
        when(abs(unix_timestamp(col("__ts")) -
          unix_timestamp(col("__last.__rts"))) <= tol, col("__last")))
    }
    val out = leftCols.map(c => col(s"__lrow.$c").as(c)) ++
      payload.map(p => col(s"__last.$p").as(p))
    val nullKeyOut = leftNullKeys.select(
      leftCols.map(col) ++
        payload.map(p => lit(null).cast(right.schema(p).dataType).as(p)): _*)
    withinTol.select(out: _*).unionByName(nullKeyOut)
  }
}
