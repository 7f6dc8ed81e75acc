package graft.expressions

import org.apache.spark.sql.Int8ArrayInputTypes
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Integer dot product of two int8 code arrays (array<tinyint>) — the
  * quantized-candidate scoring kernel. Same value as the HOF
  * formulation `aggregate(zip_with(a, b, (x,y) -> int(x)*int(y)), 0, +)`
  * (spec-enforced on equal-length inputs), but one codegen'd
  * multiply-accumulate loop instead of an interpreted lambda chain —
  * measured 3–14× on the candidate join at probe scale (NOTES r7).
  * Walks the shorter of the two arrays on a length mismatch (where
  * zip_with would null-pad and poison the sum to NULL — equal-dim
  * code arrays never hit either case in production);
  * |code| ≤ 127 keeps the sum exact in Int up to ~131k dims. Elements
  * must be non-null (the quantizer emits whole-array null for corrupt
  * vectors, never null elements); a null array yields null.
  */
case class Int8Dot(left: Expression, right: Expression)
    extends BinaryExpression with Int8ArrayInputTypes {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "int8_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    Int8DotImpl.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.Int8DotImpl.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Int8Dot =
    copy(left = newLeft, right = newRight)
}

object Int8DotImpl {
  def compute(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var sum = 0
    var i = 0
    while (i < n) {
      sum += a.getByte(i) * b.getByte(i)
      i += 1
    }
    sum
  }
}
