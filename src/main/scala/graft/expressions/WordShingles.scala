package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word n-gram shingling: one byte-level pass over the string,
  * emitting each n-token window joined with single spaces. Byte-
  * identical to `graft.ops.TextOps.wordShingles` (spec-enforced), which
  * builds the same windows from `slice` + `array_join` lambdas — but
  * without materializing the token array or evaluating ~3 expression
  * nodes per window. Empty array (not null) when the document has
  * fewer than n tokens, matching the declarative contract.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    WordShinglesImpl.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.WordShinglesImpl.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShinglesImpl {
  private def isSpace(b: Byte): Boolean = b == 0x20 || (b >= 0x09 && b <= 0x0D)

  private val Empty = new GenericArrayData(Array.empty[Any])

  def compute(s: UTF8String, n: Int): ArrayData = {
    val nb = s.numBytes()
    var tokStarts = new Array[Int](16)
    var tokEnds = new Array[Int](16)
    var nTok = 0
    var i = 0
    while (i < nb) {
      while (i < nb && isSpace(s.getByte(i))) i += 1
      val start = i
      while (i < nb && !isSpace(s.getByte(i))) i += 1
      if (i > start) {
        if (nTok == tokStarts.length) {
          tokStarts = java.util.Arrays.copyOf(tokStarts, nTok * 2)
          tokEnds = java.util.Arrays.copyOf(tokEnds, nTok * 2)
        }
        tokStarts(nTok) = start
        tokEnds(nTok) = i
        nTok += 1
      }
    }
    if (nTok < n) return Empty
    val out = new Array[Any](nTok - n + 1)
    val buf = new Array[Byte](nb + n)
    var w = 0
    while (w <= nTok - n) {
      var len = 0
      var t = w
      while (t < w + n) {
        if (t > w) { buf(len) = ' '; len += 1 }
        var p = tokStarts(t)
        while (p < tokEnds(t)) { buf(len) = s.getByte(p); len += 1; p += 1 }
        t += 1
      }
      out(w) = UTF8String.fromBytes(java.util.Arrays.copyOf(buf, len))
      w += 1
    }
    new GenericArrayData(out)
  }
}
