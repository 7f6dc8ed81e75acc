package graft.expressions

import org.apache.spark.sql.{DoubleArrayInputTypes, PqLutScoreInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, FloatType}

/** PRODUCT-QUANTIZATION codebook: the vector space split into `m`
  * contiguous sub-spaces of `subDim` dims each, each with `ks`
  * sub-centroids — `data` is flattened `[m][k][subDim]`. Driver-bounded
  * BY CONSTRUCTION (m·ks·subDim = ks·dim doubles — 128 KB at ks=256,
  * dim=64, i.e. the opposite end of the scale problem the two-level
  * quantizer solves: PQ codebooks are tiny, it's the per-vector CODES
  * that carry the compression, m bytes instead of dim·4 float bytes).
  * Rides into tasks as a reference object like [[CentroidIndex]].
  */
final class PqCodebook(val m: Int, val ks: Int, val subDim: Int,
    val data: Array[Double]) extends Serializable {
  require(m >= 1 && ks >= 1 && ks <= 256 && subDim >= 1 &&
    data.length == m * ks * subDim,
    s"PqCodebook: inconsistent shape m=$m ks=$ks subDim=$subDim " +
      s"data=${data.length}")
  def dim: Int = m * subDim
}

object PqKernels {

  /** Validate + copy, or null for corrupt vectors (wrong length,
    * null/NaN element) — the null-codes quarantine shared by encode
    * and lut.
    */
  private def checked(vec: ArrayData, dim: Int): Array[Double] = {
    val d = vec.numElements()
    if (d != dim) return null
    val x = new Array[Double](d)
    var i = 0
    while (i < d) {
      if (vec.isNullAt(i)) return null
      val v = vec.getDouble(i)
      if (java.lang.Double.isNaN(v)) return null
      x(i) = v
      i += 1
    }
    x
  }

  /** Encode: per sub-space, the L2-nearest sub-centroid's id (byte,
    * unsigned convention — id = code & 0xFF), ties to the LOWEST id
    * (strict < update). Null for corrupt vectors: null codes never
    * enter a shortlist ([[graft.ops.Similarity.withQuantizedInt8]]'s
    * quarantine policy).
    */
  def encode(vec: ArrayData, cb: PqCodebook): ArrayData = {
    val x = checked(vec, cb.dim)
    if (x == null) return null
    val out = new Array[Byte](cb.m)
    var mi = 0
    while (mi < cb.m) {
      val base = mi * cb.ks * cb.subDim
      val off = mi * cb.subDim
      var best = 0
      var bestD = Double.PositiveInfinity
      var k = 0
      while (k < cb.ks) {
        var d2 = 0.0
        var j = 0
        val cOff = base + k * cb.subDim
        while (j < cb.subDim) {
          val t = x(off + j) - cb.data(cOff + j)
          d2 += t * t
          j += 1
        }
        if (d2 < bestD) { bestD = d2; best = k }
        k += 1
      }
      out(mi) = best.toByte
      mi += 1
    }
    new GenericArrayData(out)
  }

  /** Per-query lookup table: LUT[mi·ks + k] = dot(q_mi, c_{mi,k}) —
    * computed ONCE per query row (ks·dim mults), after which every
    * candidate scores in m lookups. Null for corrupt query vectors.
    */
  def lut(vec: ArrayData, cb: PqCodebook): ArrayData = {
    val x = checked(vec, cb.dim)
    if (x == null) return null
    val out = new Array[Float](cb.m * cb.ks)
    var mi = 0
    while (mi < cb.m) {
      val base = mi * cb.ks * cb.subDim
      val off = mi * cb.subDim
      var k = 0
      while (k < cb.ks) {
        var s = 0.0
        var j = 0
        val cOff = base + k * cb.subDim
        while (j < cb.subDim) { s += x(off + j) * cb.data(cOff + j); j += 1 }
        out(mi * cb.ks + k) = s.toFloat
        k += 1
      }
      mi += 1
    }
    new GenericArrayData(out)
  }

  /** Asymmetric-distance score: Σ_mi LUT[mi·ks + code_mi] ≈
    * dot(query, reconstruction(codes)). Boxed Double, or null on a
    * codes/LUT shape mismatch or an out-of-range code (never a wrong
    * score). Null elements cannot occur by construction (both arrays
    * come from the kernels above); a null ELEMENT would still read as
    * 0.0 via getFloat — acceptable only because construction forbids
    * it, noted here for the reviewer.
    */
  def score(lut: ArrayData, codes: ArrayData, ks: Int): java.lang.Double = {
    val m = codes.numElements()
    if (lut.numElements() != m * ks) return null
    var s = 0.0
    var mi = 0
    while (mi < m) {
      val code = codes.getByte(mi) & 0xFF
      if (code >= ks) return null
      s += lut.getFloat(mi * ks + code)
      mi += 1
    }
    java.lang.Double.valueOf(s)
  }
}

/** PQ encode of a vector column against a driver-built [[PqCodebook]]
  * — array<byte> of length m, or NULL for corrupt vectors.
  */
case class PqEncode(child: Expression, cb: PqCodebook)
    extends UnaryExpression with DoubleArrayInputTypes {
  override def dataType: DataType = ArrayType(ByteType)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(input: Any): Any =
    PqKernels.encode(input.asInstanceOf[ArrayData], cb)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebook", cb, classOf[PqCodebook].getName)
    nullSafeCodeGen(ctx, ev, input => s"""
      ${ev.value} = graft.expressions.PqKernels.encode($input, $ref);
      ${ev.isNull} = (${ev.value} == null);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** Per-query PQ dot lookup table (array<float>, length m·ks) — NULL
  * for corrupt query vectors.
  */
case class PqDotLut(child: Expression, cb: PqCodebook)
    extends UnaryExpression with DoubleArrayInputTypes {
  override def dataType: DataType = ArrayType(FloatType)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_dot_lut"

  override def nullSafeEval(input: Any): Any =
    PqKernels.lut(input.asInstanceOf[ArrayData], cb)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebook", cb, classOf[PqCodebook].getName)
    nullSafeCodeGen(ctx, ev, input => s"""
      ${ev.value} = graft.expressions.PqKernels.lut($input, $ref);
      ${ev.isNull} = (${ev.value} == null);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): PqDotLut =
    copy(child = newChild)
}

/** LUT × codes score (double) — the per-candidate cost of the PQ
  * shortlist: m byte lookups. Null if either input is null or the
  * shapes mismatch.
  */
case class PqLutScore(left: Expression, right: Expression, ks: Int)
    extends BinaryExpression with PqLutScoreInputTypes {
  require(ks >= 1 && ks <= 256, s"ks must be in [1,256], got $ks")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_lut_score"

  override def nullSafeEval(lut: Any, codes: Any): Any =
    PqKernels.score(lut.asInstanceOf[ArrayData],
      codes.asInstanceOf[ArrayData], ks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lut, codes) => {
      val boxed = ctx.freshName("pqScore")
      s"""
        java.lang.Double $boxed =
          graft.expressions.PqKernels.score($lut, $codes, $ks);
        if ($boxed == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $boxed.doubleValue(); }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqLutScore =
    copy(left = newLeft, right = newRight)
}
