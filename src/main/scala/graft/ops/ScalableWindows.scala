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

  /** Exclusive global running sum (`SUM(value) OVER (ORDER BY orderCol
    * ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)`) computed with
    * PARTITIONED windows — the two-phase prefix sum.
    *
    * Mechanics: the order-key domain is cut into `nBuckets` equal-width
    * ranges (deterministic arithmetic on the key — no sampled range
    * partitioner, so the bucketing is identical across jobs and
    * recomputations). Phase 1 aggregates one (bucket, total) row per
    * present bucket — ≤ `nBuckets` rows collected driver-side, an
    * exclusive scan of which yields each bucket's base offset. Phase 2
    * adds base + within-bucket exclusive running sum, each bucket its
    * own window partition. Two scans of the input, no single-partition
    * WindowExec, no global shuffle beyond the window's hash exchange.
    *
    * `orderCol` values must be unique and long-castable (the usual
    * dense doc-id shape); ties would make the within-bucket frame
    * order — and therefore the prefix sum — nondeterministic, so
    * duplicate keys are rejected by count. Dense ids give balanced
    * buckets; sparse ids degrade bucket balance, never correctness.
    * `valueCol` must be non-negative longs (token counts); the running
    * total lives in a LONG — fine to ~9.2e18 total tokens.
    *
    * `nBuckets` is the parallelism grain of phase 2 (each bucket is
    * ONE window task) AND the driver-scan bound — size it to a few ×
    * cluster cores (the default 1,024 serves up to ~10¹⁰ rows; go
    * higher for more, the driver scan stays trivially cheap to ~10⁶).
    */
  def prefixSumByBucket(df: DataFrame, orderCol: String, valueCol: String,
      outCol: String, nBuckets: Int = 1024): DataFrame = {
    require(nBuckets > 0, s"prefixSumByBucket: nBuckets=$nBuckets")
    val keyed = df.withColumn("__o", col(orderCol).cast("long"))
      .withColumn("__v", col(valueCol).cast("long"))
    // One column-pruned scan: key bounds + uniqueness + value contract.
    val stats = keyed.agg(
      min(col("__o")), max(col("__o")), count(col("__o")),
      count_distinct(col("__o")), count(lit(1)),
      sum(when(col("__v") < 0 || col("__v").isNull, 1L).otherwise(0L))).head()
    if (stats.getLong(4) == 0L) return df.withColumn(outCol, lit(0L))
    require(!stats.isNullAt(0) && stats.getLong(2) == stats.getLong(4) &&
      stats.getLong(5) == 0L,
      s"prefixSumByBucket: '$orderCol' must be non-null long-castable and " +
        s"'$valueCol' non-negative (nulls or negatives present)")
    val (lo, hi) = (stats.getLong(0), stats.getLong(1))
    require(stats.getLong(3) == stats.getLong(2),
      s"prefixSumByBucket: duplicate '$orderCol' keys — a global order " +
        "needs unique keys (dense-rank upstream)")
    // ceil((hi-lo+1)/nBuckets) without overflow on extreme key ranges;
    // SATURATE at Long.MaxValue before toLong — with nBuckets ≤ 2 over
    // a near-full hash-key domain the BigInt width exceeds Long and
    // toLong would wrap negative (making `div width` monotone
    // DECREASING — silently reversed offsets) or hit zero. Saturation
    // keeps div monotone; the degenerate 1-2-bucket layout it yields
    // is exactly what nBuckets ≤ 2 asked for.
    val span = BigInt(hi) - BigInt(lo) + 1
    val width = ((span + nBuckets - 1) / nBuckets)
      .max(1).min(BigInt(Long.MaxValue)).toLong
    // Bucket = (__o div w) - (lo div w), NOT (__o - lo) div w: the
    // subtraction-first form overflows for key ranges wider than 2^63
    // (hash-valued keys). Truncating `div` keeps each quotient in
    // range, the difference is ≤ span/w + 1, and trunc-division is
    // monotone in __o — the only property the exclusive scan needs
    // (the zero-straddling bucket may split in two; count stays
    // ≤ nBuckets + 2). `div`, never Column./ (double — lossy > 2^53).
    val bucketed = keyed.withColumn("__b",
      expr(s"(__o div ${width}L) - (${lo}L div ${width}L)"))
    val totals = bucketed.groupBy("__b").agg(sum(col("__v")).as("__t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val baseOf: Map[Long, Long] = { // exclusive scan over ≤ nBuckets rows
      var acc = 0L
      totals.map { case (b, t) => val r = b -> acc; acc += t; r }.toMap
    }
    val w = Window.partitionBy(col("__b")).orderBy(col("__o"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // Strict base lookup: the input plan is evaluated three times
    // (stats, totals, output), so a NONDETERMINISTIC input could
    // produce a bucket here that the collected totals never saw.
    // try_element_at would silently NULL every offset in that bucket;
    // raise_error makes the broken-input case loud instead. Callers
    // deriving the input nondeterministically must cache it first.
    bucketed
      .withColumn(outCol,
        coalesce(
          try_element_at(typedLit(baseOf), col("__b")),
          raise_error(concat(
            lit("prefixSumByBucket: bucket "), col("__b").cast("string"),
            lit(" absent from collected totals — nondeterministic or " +
              "uncached input plan?"))).cast("long")) +
          coalesce(sum(col("__v")).over(w), lit(0L)))
      .drop("__o", "__v", "__b")
  }
}
