package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning — the runtime-filter pattern Spark's own
  * `InjectRuntimeFilter` rule applies to shuffle joins, exposed as an
  * explicit operator for semi-join-shaped workloads.
  *
  * At 100 TB the win is scan-side: a fact⋈dim semi join must shuffle
  * (or at least fully scan) every fact row, while a bloom prefilter
  * drops non-matching rows inside the scan's codegen stage at ~10 bits
  * per dim key, before any exchange. False positives (fpp ≈ 1%) are
  * removed by the exact semi join that follows, so results are exact —
  * the bloom only prunes work.
  *
  * Built on Catalyst's own `BloomFilterAggregate` /
  * `BloomFilterMightContain` expressions (public classes, registered
  * only for internal use by the optimizer — bridged here the same way
  * as our native expressions).
  */
object BloomPrune {

  /** Distributed bloom build over `dim`'s `keyCol`: one partial
    * aggregate per partition, merged to a single serialized sketch.
    * The driver holds only the ~numBits/8-byte sketch (the same thing
    * Spark's runtime filter broadcasts), never the rows.
    */
  def buildBloom(dim: DataFrame, keyCol: String,
      expectedItems: Long, numBits: Long): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      GraftSqlBridge.expression(xxhash64(col(keyCol))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    dim.select(GraftSqlBridge.column(agg).as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** Scan-side prefilter: keep rows whose key MIGHT be in the sketch.
    * Stays inside whole-stage codegen (BloomFilterMightContain has
    * doGenCode); nulls never match, mirroring semi-join semantics.
    */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    GraftSqlBridge.column(BloomFilterMightContain(
      Literal(bloom), GraftSqlBridge.expression(xxhash64(key))))

  /** Exact semi join with bloom pre-pruning: bloom-filter the fact
    * scan, then confirm with a broadcast left-semi join against the
    * dim keys. Output rows are exactly `fact ⋉ dim` — the bloom stage
    * only reduces the rows that reach the join.
    */
  def bloomSemiJoin(fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    // standard bloom sizing: m = -n·ln(p)/ln(2)²
    val numBits = math.max(64L,
      math.ceil(-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    val bloom = buildBloom(dim, dimKey, expectedItems, numBits)
    fact.where(mightContain(bloom, col(factKey)))
      .join(broadcast(dim.select(col(dimKey).as(factKey)).distinct()),
        Seq(factKey), "left_semi")
  }
}
