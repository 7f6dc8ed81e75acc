package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout: co-locate rows that are close in
  * SEVERAL dimensions, so min/max file statistics prune multi-
  * dimensional predicates — a single-column sort prunes only its own
  * column's predicates and leaves every other dimension scattered
  * across all files.
  *
  * All expression-level (codegen'd HOFs, no UDF): bucket each
  * dimension to `bitsPer`-bit ranks, interleave the bits into one
  * Morton value, range-partition + sort by it, write. The classic
  * OPTIMIZE-ZORDER shape at the layout layer.
  */
object ZOrder {

  /** Interleave the low `bitsPer` bits of `a` (odd positions) and `b`
    * (even positions): the 2-D Morton code. Inputs must be
    * non-negative and < 2^bitsPer.
    */
  def interleave(a: Column, b: Column, bitsPer: Int): Column = {
    require(bitsPer >= 1 && bitsPer <= 31)
    aggregate(
      sequence(lit(0), lit(bitsPer - 1)),
      lit(0L),
      (acc, i) => acc
        .bitwiseOR(call_function("shiftleft",
          call_function("shiftright", a, i).bitwiseAND(lit(1L)), i * 2 + 1))
        .bitwiseOR(call_function("shiftleft",
          call_function("shiftright", b, i).bitwiseAND(lit(1L)), i * 2)))
  }

  /** Map a numeric column to a [0, 2^bits) rank using min/max bounds
    * (two tiny driver-side scalars — the same stats a writer keeps
    * anyway). Linear bucketing; ties/clamps at the edges.
    */
  def bucketed(c: Column, minV: Double, maxV: Double, bits: Int): Column = {
    val buckets = 1L << bits
    val span = math.max(maxV - minV, Double.MinPositiveValue)
    least(lit(buckets - 1), greatest(lit(0L),
      floor((c.cast("double") - minV) / span * buckets).cast("long")))
  }

  /** Z-order `df` by two numeric columns into `numFiles` output
    * ranges: compute the Morton value, range-partition on it (balanced
    * files), sort within partitions (tight per-file min/max on BOTH
    * dimensions), drop the helper column.
    */
  def zorderBy2(df: DataFrame, c1: String, c2: String,
      numFiles: Int, bitsPer: Int = 16): DataFrame = {
    val stats = df.agg(
      min(col(c1).cast("double")), max(col(c1).cast("double")),
      min(col(c2).cast("double")), max(col(c2).cast("double"))).head()
    val z = interleave(
      bucketed(col(c1), stats.getDouble(0), stats.getDouble(1), bitsPer),
      bucketed(col(c2), stats.getDouble(2), stats.getDouble(3), bitsPer),
      bitsPer)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
