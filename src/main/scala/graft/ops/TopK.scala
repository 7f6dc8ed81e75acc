package graft.ops

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k as a PARTIAL-AGGREGATING operator.
  *
  * The window formulation (`row_number().over(partitionBy(g).orderBy(
  * v.desc)) <= k`, q15) must shuffle and SORT every row of every
  * group. This Aggregator keeps k rows per group in the aggregation
  * buffer instead: map-side partial aggregation trims to k before the
  * shuffle, so the exchange carries ≤ k rows per group per partition
  * and nothing is ever globally sorted — the shape that wins when
  * groups are large (the common 100 TB case).
  *
  * Deterministic order: value DESC, then key ASC on ties.
  */
object TopK {

  /** One scored entry: `value` ranks (desc), `key` breaks ties (asc). */
  case class Entry(value: Double, key: Long)

  class TopKAggregator(k: Int, distinctKeys: Boolean = false)
      extends Aggregator[Entry, Seq[Entry], Seq[Entry]] {
    require(k > 0)
    private def trim(s: Seq[Entry]): Seq[Entry] = {
      // distinctKeys: collapse duplicate keys BEFORE the k-cut — the
      // caller guarantees duplicates carry the identical value (ANN
      // multi-probe / mixed-generation candidates), so which survives
      // cannot change any output value; doing it inside the partial
      // aggregate replaces a whole pre-ranking dropDuplicates exchange
      // (2 Exchange → 1) and keeps the shuffle at ≤ k rows per group
      // per partition instead of the full candidate set (guide §2.3).
      val d = if (distinctKeys) s.distinctBy(_.key) else s
      d.sortBy(e => (-e.value, e.key)).take(k)
    }
    // Small k (the production search shape) trims on EVERY insert:
    // the buffer stays sorted, so the k-th-best fast path below can
    // drop most rows in O(k) with a tight ≤k buffer crossing the
    // shuffle. Large k (the generous-shortlist identity arms rank
    // with k ≈ corpus/k) must NOT pay an O(n log n) sort per insert —
    // that is quadratic in the buffer and was measured as the q160
    // generous-arm hot spot (r16): inserts append loosely and the
    // trim amortizes at 2k (O(log k) per row), trading the early-drop
    // for bounded-by-2k buffers. Top-k is monotone, so trimming a
    // loose buffer to its best k keeps exactly the global answer.
    private val perInsertTrim = k <= 64
    override def zero: Seq[Entry] = Nil
    override def reduce(b: Seq[Entry], a: Entry): Seq[Entry] =
      if (perInsertTrim) {
        // buffer is always trimmed (sorted best-first, ≤ k) here, so
        // b.last is the current k-th best — the early-drop is sound
        if (b.sizeIs >= k && {
          val w = b.last; a.value < w.value || (a.value == w.value && a.key > w.key)
        }) b
        else trim(a +: b)
      } else {
        val nb = a +: b
        if (nb.sizeIs >= 2 * k) trim(nb) else nb
      }
    override def merge(x: Seq[Entry], y: Seq[Entry]): Seq[Entry] = trim(x ++ y)
    override def finish(r: Seq[Entry]): Seq[Entry] = trim(r)
    override def bufferEncoder: Encoder[Seq[Entry]] = ExpressionEncoder[Seq[Entry]]()
    override def outputEncoder: Encoder[Seq[Entry]] = ExpressionEncoder[Seq[Entry]]()
  }

  /** Untyped-API handle: `df.groupBy(g).agg(TopK.topK(3)(col(v), col(id)))`
    * yields an array<struct<value,key>> column sorted best-first.
    *
    * r17: backed by the native primitive-buffer
    * [[graft.expressions.TopKAgg]] (same TypedImperativeAggregate plan
    * shape as the udaf it replaces — ObjectHashAggregate, map-side
    * partial trim to ≤ k rows per group per partition — with the
    * per-row encoder/boxing/Seq-sort cost deleted; guide §1.2 step 2).
    * [[TopKAggregator]] above stays as the semantics oracle
    * (spec-pinned equal in TopKSpec).
    */
  def topK(k: Int): (Column, Column) => Column = (value, key) =>
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.expressions.TopKAgg(
        org.apache.spark.sql.GraftSqlBridge.expression(value),
        org.apache.spark.sql.GraftSqlBridge.expression(key),
        k, distinctKeys = false).toAggregateExpression())

  /** [[topK]] with per-key dedup inside the aggregation buffer.
    * ONLY for inputs where duplicate keys within a group are exact
    * value-duplicates (the ANN candidate contract) — it replaces a
    * dropDuplicates exchange ahead of the ranking.
    */
  def topKDistinct(k: Int): (Column, Column) => Column = (value, key) =>
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.expressions.TopKAgg(
        org.apache.spark.sql.GraftSqlBridge.expression(value),
        org.apache.spark.sql.GraftSqlBridge.expression(key),
        k, distinctKeys = true).toAggregateExpression())

  /** The legacy encoder-based udaf handles — kept callable so the
    * spec can pin native == legacy on shared inputs. Not used by any
    * query path.
    */
  def topKLegacy(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopKAggregator(k))
    (value, key) => fn(value, key)
  }

  def topKDistinctLegacy(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopKAggregator(k, distinctKeys = true))
    (value, key) => fn(value, key)
  }
}
