package graft.expressions

import org.apache.spark.sql.PackedCentroidInputTypes
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Top-`nProbe` nearest centroids of a vector against a PACKED,
  * COLUMN-CARRIED centroid matrix (`array<array<double>>`) — the fine
  * layer of the two-level IVF quantizer ([[graft.ops.AnnIndex
  * .buildIvfIndexTwoLevel]]).
  *
  * [[NearestCells]] evaluates against a DRIVER-BUILT
  * [[CentroidIndex]] riding task closures — the right shape while the
  * whole quantizer fits a closure (≤ 65,536 × dim doubles), and the
  * exact reason the flat quantizer CAPS there: past it the matrix is
  * a ~0.5 GB driver object shipped to every task. This expression is
  * the other half of breaking that ceiling: the fine sub-quantizer of
  * ONE coarse group arrives as an ordinary column value through a
  * join on the coarse cell (group matrices are nFine·dim doubles —
  * hundreds of KB), so no quantizer state beyond the coarse layer
  * ever touches the driver or a closure.
  *
  * Returns the POSITIONS (0-based, `array<long>`, best first) of the
  * `min(nProbe, m)` centroids maximizing dot(vec, centroid), ties to
  * the LOWEST position, NaN dots ordering greatest (the
  * [[CentroidIndex]] `cmpD` semantics). Centroids are expected
  * PRE-NORMALIZED (the packing step normalizes once per group, not
  * once per row), making argmax dot ≡ argmax cosine. A corrupt vector
  * (null/NaN element) — or one whose length matches no centroid —
  * degrades to the all-ties order: positions `0..n−1`, mirroring the
  * flat arm's corrupt-vector contract. A null vector or null matrix
  * returns NULL (callers coalesce).
  */
case class NearestPackedCells(left: Expression, right: Expression,
    nProbe: Int)
    extends BinaryExpression with PackedCentroidInputTypes {
  require(nProbe >= 1, s"nProbe must be ≥ 1, got $nProbe")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "nearest_packed_cells"

  override def nullSafeEval(vec: Any, cents: Any): Any =
    NearestPackedCells.probe(vec.asInstanceOf[ArrayData],
      cents.asInstanceOf[ArrayData], nProbe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, c) =>
      s"graft.expressions.NearestPackedCells.probe($v, $c, $nProbe)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestPackedCells =
    copy(left = newLeft, right = newRight)
}

object NearestPackedCells {

  /** [[CentroidIndex]]'s nan-safe total order on doubles. */
  private def cmpD(a: Double, b: Double): Int =
    if (a < b) -1
    else if (a > b) 1
    else if (a == b) 0
    else if (java.lang.Double.isNaN(a)) { if (java.lang.Double.isNaN(b)) 0 else 1 }
    else -1

  /** The kernel behind [[NearestPackedCells]] — public static so the
    * generated code can call it. Flat scan (the group matrix is small
    * by construction — pruning structure lives in the COARSE layer);
    * insertion-sorted best-n exactly like [[CentroidIndex.probe]].
    */
  def probe(vec: ArrayData, cents: ArrayData, nProbe: Int): ArrayData = {
    val m = cents.numElements()
    val n = math.min(nProbe, m)
    def allTies(): ArrayData = {
      val out = new Array[Long](n)
      var i = 0
      while (i < n) { out(i) = i.toLong; i += 1 }
      new GenericArrayData(out)
    }
    // validate + copy the vector (the CentroidIndex.checkedVector
    // contract: any null/NaN element ⇒ every dot is the same
    // non-value ⇒ all-ties)
    val d = vec.numElements()
    val x = new Array[Double](d)
    var i = 0
    while (i < d) {
      if (vec.isNullAt(i)) return allTies()
      val v = vec.getDouble(i)
      if (java.lang.Double.isNaN(v)) return allTies()
      x(i) = v
      i += 1
    }
    val topDot = new Array[Double](n)
    val topIdx = new Array[Int](n)
    var filled = 0
    var ci = 0
    while (ci < m) {
      if (!cents.isNullAt(ci)) {
        val c = cents.getArray(ci)
        if (c.numElements() == d) {
          var s = 0.0
          var ok = true
          var j = 0
          while (ok && j < d) {
            if (c.isNullAt(j)) ok = false
            else { s += x(j) * c.getDouble(j); j += 1 }
          }
          if (ok) {
            // insertion offer under (dot desc, idx asc)
            var pos = filled
            while (pos > 0 && {
              val cmp = cmpD(s, topDot(pos - 1))
              cmp > 0 || (cmp == 0 && ci < topIdx(pos - 1))
            }) pos -= 1
            if (pos < n) {
              val last = math.min(filled, n - 1)
              var k = last
              while (k > pos) {
                topDot(k) = topDot(k - 1); topIdx(k) = topIdx(k - 1); k -= 1
              }
              topDot(pos) = s
              topIdx(pos) = ci
              if (filled < n) filled += 1
            }
          }
        }
      }
      ci += 1
    }
    if (filled == 0) return allTies() // every centroid invalid: all-ties
    val out = new Array[Long](filled)
    var k = 0
    while (k < filled) { out(k) = topIdx(k).toLong; k += 1 }
    new GenericArrayData(out)
  }
}
