package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned (bucketed) range join: `points ⋈ intervals ON start <= p < end`
  * without the O(|points|·|intervals|) theta-join a naive BETWEEN
  * condition plans (Spark executes a pure inequality join as
  * BroadcastNestedLoopJoin — every point row tests every interval).
  *
  * The standard scale shape: quantize the axis into fixed-width bins;
  * each point lands in exactly ONE bin, each interval is replicated to
  * the bins it covers, and the join becomes an EQUI-join on bin id
  * (hash-partitionable, AQE-skew-splittable) followed by the exact
  * range predicate. Cost is |points| + Σ interval_spans instead of the
  * cross product, and since a point has one bin, no output dedup is
  * needed.
  *
  * `binWidth` tunes replication vs selectivity: bins ≈ median interval
  * length keep replication ≤ 2× while making each bin's candidate set
  * tight.
  */
object RangeJoin {

  /** Join `points` (with a LONG-castable axis column `ptCol`, e.g.
    * epoch seconds) to `intervals` with [startCol, endCol) bounds on
    * the same axis. Returns all point×interval matches.
    */
  def binnedRangeJoin(
      points: DataFrame, ptCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("__bin", floor(col(ptCol).cast("long") / binWidth))
    val i = intervals
      // empty intervals match nothing — and would make the bin
      // `sequence` run BACKWARDS (Spark auto-steps -1), replicating
      // them to every bin in between
      .where(col(endCol) > col(startCol))
      .withColumn("__bin", explode(sequence(
        floor(col(startCol).cast("long") / binWidth),
        // end is exclusive: a point at exactly `end` never matches, so
        // an interval ending on a bin boundary needn't cover that bin —
        // use the bin of (end - 1).
        floor((col(endCol).cast("long") - 1) / binWidth))))
    p.join(i, Seq("__bin"))
      .where(col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop("__bin")
  }

  /** Timestamp convenience: bins on epoch seconds. */
  def binnedRangeJoinTs(
      points: DataFrame, ptCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      binWidthSeconds: Long): DataFrame = {
    val p = points.withColumn("__pt_s", unix_timestamp(col(ptCol)))
    val i = intervals
      .withColumn("__start_s", unix_timestamp(col(startCol)))
      .withColumn("__end_s", unix_timestamp(col(endCol)))
    binnedRangeJoin(p, "__pt_s", i, "__start_s", "__end_s", binWidthSeconds)
      .drop("__pt_s", "__start_s", "__end_s")
  }
}
