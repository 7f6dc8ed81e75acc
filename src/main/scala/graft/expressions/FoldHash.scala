package graft.expressions

import org.apache.spark.sql.StringInputType
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Portable polynomial fold hash of a string over UNICODE CODEPOINTS:
  * `acc = (acc·31 + codepoint) mod 1,000,000,007`, accumulator
  * starting at 0 — exactly the ANSI-SQL-replayable formulation
  * `list_reduce(list_prepend(0, codepoints), (a,b) -> (a*31+b) % 1e9+7)`
  * the q100/q101 oracles run, for EVERY valid Unicode string.
  *
  * Replaces the declarative `split("")+ascii` fold, which walked
  * UTF-16 code units: supplementary-plane characters split into
  * surrogate halves and hashed as two bogus values, silently
  * diverging from the oracle's codepoint walk (the r7 ADVICE
  * portability-envelope finding — this kernel removes the envelope
  * instead of documenting it). Also one compiled codepoint walk per
  * row instead of a split→filter→aggregate lambda chain on the
  * winnowing hot path.
  *
  * NULL string → NULL; empty string → 0 (the fold's initial value,
  * matching both declarative arms).
  */
case class FoldHash(child: Expression)
    extends UnaryExpression with StringInputType {
  override def dataType: DataType = LongType
  override def prettyName: String = "fold_hash"

  override def nullSafeEval(input: Any): Any =
    FoldHashImpl.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.FoldHashImpl.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): FoldHash =
    copy(child = newChild)
}

object FoldHashImpl {
  private final val Mod = 1000000007L

  /** Codepoints decoded straight from the UTF8String's UTF-8 bytes —
    * no per-row String allocation on the winnowing hot path (one
    * transient String per gram per doc was pure GC pressure against
    * this kernel's own rationale). Any malformed byte sequence falls
    * back to the String walk, whose replacement-char (U+FFFD)
    * behavior defines the hash for invalid input — Spark guarantees
    * valid UTF-8 in practice, so the fast path is the only one taken.
    */
  def compute(s: UTF8String): Long = {
    val n = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var acc = 0L
    var i = 0
    while (i < n) {
      val b0 = org.apache.spark.unsafe.Platform.getByte(base, off + i) & 0xFF
      var cp = 0
      var len = 0
      if (b0 < 0x80) { cp = b0; len = 1 }
      else if ((b0 & 0xE0) == 0xC0) { cp = b0 & 0x1F; len = 2 }
      else if ((b0 & 0xF0) == 0xE0) { cp = b0 & 0x0F; len = 3 }
      else if ((b0 & 0xF8) == 0xF0) { cp = b0 & 0x07; len = 4 }
      else return computeSlow(s)
      if (i + len > n) return computeSlow(s)
      var j = 1
      while (j < len) {
        val bj = org.apache.spark.unsafe.Platform.getByte(base, off + i + j) & 0xFF
        if ((bj & 0xC0) != 0x80) return computeSlow(s)
        cp = (cp << 6) | (bj & 0x3F)
        j += 1
      }
      // overlong/surrogate/out-of-range encodings decode differently
      // from String's replacement-char policy — defer to it
      if (len == 2 && cp < 0x80) return computeSlow(s)
      if (len == 3 && (cp < 0x800 || (cp >= 0xD800 && cp <= 0xDFFF)))
        return computeSlow(s)
      if (len == 4 && (cp < 0x10000 || cp > 0x10FFFF)) return computeSlow(s)
      acc = (acc * 31L + cp) % Mod
      i += len
    }
    acc
  }

  /** The original String-based walk — the semantics reference for
    * malformed input (replacement chars) and the fast path's spec
    * oracle.
    */
  private[graft] def computeSlow(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      acc = (acc * 31L + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }
}
