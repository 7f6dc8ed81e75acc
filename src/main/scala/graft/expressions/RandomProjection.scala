package graft.expressions

import org.apache.spark.sql.FloatArrayInputTypes
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native random ±1 projection (the JL/Achlioptas sign projection of
  * `graft.ops.Similarity.randomProjection`): quantize each float
  * element to `floor(x·10⁶)` longs and project onto `outDim`
  * deterministic sign rows from the portable multiply/xor-shift mix —
  * bit-identical to the declarative HOF formulation (spec-enforced),
  * one compiled pass per row instead of outDim interpreted lambda
  * aggregates.
  *
  * This is the INGEST-path kernel: at corpus scale the projection runs
  * over every vector once; the interpreted form measured ~2.4 ms/row
  * at dim 64 → outDim 16 (NOTES), which would dominate a 10¹²-vector
  * ingest.
  *
  * NULL for corrupt vectors (NaN/±Inf element) or empty arrays — the
  * quarantine contract; throws on inputs wider than the 2²⁰ sign-row
  * seed stride (row aliasing — reject loudly, never degrade).
  */
case class RandomProjection(child: Expression, outDim: Int)
    extends UnaryExpression with FloatArrayInputTypes {
  require(outDim > 0 && outDim <= 64, s"outDim out of range: $outDim")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "random_projection"

  override def nullSafeEval(input: Any): Any =
    RandomProjectionImpl.compute(input.asInstanceOf[ArrayData], outDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = true;
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      if (!${childGen.isNull}) {
        ${ev.value} = graft.expressions.RandomProjectionImpl.compute(
          ${childGen.value}, $outDim);
        ${ev.isNull} = ${ev.value} == null;
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): RandomProjection =
    copy(child = newChild)
}

object RandomProjectionImpl {
  /** Max supported input dim — the sign-row seed stride. */
  val MaxDim: Int = 1 << 20

  private final val M31 = 2147483648L

  /** Sign of matrix entry (j, i) — the exact arithmetic of
    * `Similarity.rpSign` (and its ANSI-SQL mirror in the q99 oracle):
    * three multiply-mod-2³¹ steps interleaved with xor-shifts on seed
    * `j·2²⁰ + i + 1`, low bit picks the sign.
    */
  def sign(j: Int, i: Int): Long = {
    val s = j * 1048576L + i + 1L
    var h = (s * 2654435761L) % M31
    h = h ^ (h >>> 13)
    h = (h * 2246822519L) % M31
    h = h ^ (h >>> 11)
    h = (h * 3266489917L) % M31
    h = h ^ (h >>> 16)
    if ((h & 1L) == 1L) 1L else -1L
  }

  def compute(arr: ArrayData, outDim: Int): ArrayData = {
    val d = arr.numElements()
    if (d < 1) return null
    if (d > MaxDim) throw new IllegalArgumentException(
      s"random_projection: input dim $d exceeds the $MaxDim sign-matrix stride")
    val q6 = new Array[Long](d)
    var i = 0
    while (i < d) {
      val x = arr.getFloat(i).toDouble
      if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) return null
      q6(i) = math.floor(x * 1000000.0).toLong
      i += 1
    }
    val out = new Array[Long](outDim)
    var j = 0
    while (j < outDim) {
      var sum = 0L
      var k = 0
      while (k < d) {
        sum += q6(k) * sign(j, k)
        k += 1
      }
      out(j) = sum
      j += 1
    }
    new GenericArrayData(out)
  }
}
