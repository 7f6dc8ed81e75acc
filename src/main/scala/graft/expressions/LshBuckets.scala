package graft.expressions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.FloatArrayInputTypes
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native random-hyperplane LSH bucketing: ALL `nTables` bucket ids of
  * a float vector in one compiled pass — bit-identical to the
  * declarative `Similarity.lshBucketDeclarative` HOF arm
  * (spec-enforced), which pays nTables·nPlanes interpreted lambda
  * aggregates per row. This is the corpus-side ingest kernel of the
  * LSH ANN family (every corpus row is bucketed once per search /
  * stream batch), the same hot-path shape `NearestCentroid` fixed for
  * IVF.
  *
  * Null/empty/short inputs follow the declarative arm exactly: a null
  * or empty vector has no positive plane dot, so every table's bucket
  * is 0 (NOT null — `when(null > 0, …).otherwise(0)` yields 0 per
  * plane); NaN elements poison the dot to NaN, and Spark SQL orders
  * NaN above every numeric, so a NaN dot SETS its plane bit — both
  * arms agree (a corrupt vector lands deterministically in the
  * all-ones bucket of every table).
  *
  * Dimensionality envelope: the kernel reads each vector's OWN length
  * as the plane width, so bit-identity to the declarative arm (whose
  * plane literals are built at a fixed dim) holds for vectors of
  * exactly that length. A wrong-length row — a truncated or stale
  * embedding in a fixed-dim corpus — buckets against a DIFFERENT
  * plane matrix than its peers (the declarative arm would null-pad it
  * to bucket 0): quarantine mixed-dim rows upstream, as the ANN entry
  * points already do for corrupt vectors.
  */
case class LshBuckets(child: Expression, nTables: Int, nPlanes: Int)
    extends UnaryExpression with FloatArrayInputTypes {
  require(nTables > 0 && nTables <= 64, s"nTables out of range: $nTables")
  require(nPlanes > 0 && nPlanes <= 63, s"nPlanes out of range: $nPlanes")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "lsh_buckets"

  // Null input maps to all-zero buckets (declarative parity), so this
  // expression is NOT null-intolerant: override eval, not nullSafeEval.
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    LshBucketsImpl.compute(
      if (v == null) null else v.asInstanceOf[ArrayData], nTables, nPlanes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = false;
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.expressions.LshBucketsImpl.compute(
          ${childGen.isNull} ? null : ${childGen.value}, $nTables, $nPlanes);""")
  }

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
}

object LshBucketsImpl {
  /** Sign of plane entry (table, plane, d) — the exact splitmix64
    * arithmetic of `Similarity.planeComponent` (the declarative arm's
    * literal plane matrix is built from the same function).
    */
  def planeSign(table: Int, plane: Int, d: Int): Double = {
    var x = table * 1000003L + plane * 7919L + d * 104729L + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x = x ^ (x >>> 31)
    if ((x & 1L) == 1L) 1.0 else -1.0
  }

  /** Plane-matrix entry budget: 2²⁶ booleans = 64 MB worst case. The
    * class requires alone (nTables ≤ 64, nPlanes ≤ 63, dim ≤ 2²⁰)
    * would allow 4.2e9 entries — an Int overflow and a multi-GB
    * allocation; realistic LSH shapes (≤ 64 tables × 63 planes ×
    * dim 16k, or 8×16×2²⁰) sit far inside the budget.
    */
  val MaxPlaneEntries: Long = 1L << 26

  // Plane matrices are pure functions of (nTables, nPlanes, dim) —
  // cached per executor JVM, keyed by the packed parameter triple.
  // positive(t·nPlanes·dim + p·dim + d) ⇔ planeSign(t, p, d) > 0.
  // Entry count is bounded by MaxPlaneEntries and shape count by
  // MaxCachedShapes (a workload uses one or two shapes; clearing on
  // overflow just recomputes a cheap pure function).
  private val MaxCachedShapes = 32
  private val cache = new ConcurrentHashMap[Long, Array[Boolean]]()

  private def planes(nTables: Int, nPlanes: Int, dim: Int): Array[Boolean] = {
    val entries = nTables.toLong * nPlanes.toLong * dim.toLong
    require(entries <= MaxPlaneEntries,
      s"lsh_buckets: plane matrix $nTables×$nPlanes×$dim = $entries entries " +
        s"exceeds the $MaxPlaneEntries budget — reduce tables/planes or " +
        "project the vectors down first")
    val key = (nTables.toLong << 42) | (nPlanes.toLong << 21) | dim.toLong
    var m = cache.get(key)
    if (m == null) {
      if (cache.size >= MaxCachedShapes) cache.clear()
      m = new Array[Boolean](entries.toInt)
      var i = 0
      var t = 0
      while (t < nTables) {
        var p = 0
        while (p < nPlanes) {
          var d = 0
          while (d < dim) {
            m(i) = planeSign(t, p, d) > 0.0
            i += 1; d += 1
          }
          p += 1
        }
        t += 1
      }
      cache.putIfAbsent(key, m)
    }
    m
  }

  def compute(arr: ArrayData, nTables: Int, nPlanes: Int): ArrayData = {
    val out = new Array[Long](nTables)
    if (arr == null || arr.numElements() == 0)
      return new GenericArrayData(out) // all-zero buckets: declarative parity
    val d = arr.numElements()
    require(d <= (1 << 20), s"lsh_buckets: input dim $d exceeds 2^20")
    val m = planes(nTables, nPlanes, d)
    val x = new Array[Double](d)
    var i = 0
    while (i < d) {
      // a null ELEMENT nulls every plane dot in the declarative arm
      // (`when(null > 0)` falls through to 0) → all-zero buckets;
      // getFloat on a null slot would silently read 0.0f instead
      if (arr.isNullAt(i)) return new GenericArrayData(out)
      x(i) = arr.getFloat(i).toDouble
      i += 1
    }
    var t = 0
    var base = 0
    while (t < nTables) {
      var bucket = 0L
      var p = 0
      while (p < nPlanes) {
        var dot = 0.0
        var k = 0
        while (k < d) {
          // x·(±1.0) accumulated in array order — IEEE-identical to
          // the declarative aggregate(zip_with(...)) fold
          dot += (if (m(base + k)) x(k) else -x(k))
          k += 1
        }
        // Spark SQL orders NaN above every numeric, so the declarative
        // `dot > 0` is TRUE for NaN dots — mirror it exactly
        if (dot > 0.0 || java.lang.Double.isNaN(dot)) bucket |= (1L << p)
        base += d
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}
