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

  def compute(s: UTF8String): Long = {
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
