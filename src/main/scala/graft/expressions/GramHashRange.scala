package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass [min, max] of xxhash64 over character k-grams — the
  * rolling-fingerprint kernel. Character-aware (a char→byte offset walk
  * first), so each gram hashes exactly the bytes `substring(s, i, k)`
  * would produce: bit-identical to
  * `array_min/array_max(transform(charShingles(s,k), xxhash64))`
  * (spec-enforced), without allocating 2.75M substrings per 5k docs.
  * NULL when the string has fewer than k characters (the declarative
  * form's array_min over an empty array).
  */
case class GramHashRange(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "gram_hash_range"

  override def nullSafeEval(input: Any): Any =
    GramHashRangeImpl.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = true;
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      if (!${childGen.isNull}) {
        ${ev.value} = graft.expressions.GramHashRangeImpl.compute(${childGen.value}, $k);
        ${ev.isNull} = ${ev.value} == null;
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): GramHashRange =
    copy(child = newChild)
}

object GramHashRangeImpl {
  def compute(s: UTF8String, k: Int): ArrayData = {
    val nb = s.numBytes()
    // char index -> byte offset (UTF-8 start bytes are not 10xxxxxx)
    val offsets = new Array[Int](nb + 1)
    var nChars = 0
    var i = 0
    while (i < nb) {
      offsets(nChars) = i
      val b = s.getByte(i)
      i += (if ((b & 0x80) == 0) 1
            else if ((b & 0xE0) == 0xC0) 2
            else if ((b & 0xF0) == 0xE0) 3
            else 4)
      nChars += 1
    }
    offsets(nChars) = nb
    if (nChars < k) return null
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var minH = Long.MaxValue
    var maxH = Long.MinValue
    var c = 0
    while (c <= nChars - k) {
      val h = XXH64.hashUnsafeBytes(base, off + offsets(c),
        offsets(c + k) - offsets(c), 42L)
      if (h < minH) minH = h
      if (h > maxH) maxH = h
      c += 1
    }
    new GenericArrayData(Array(minH, maxH))
  }
}
