package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature: word n-gram shingles over ASCII-whitespace
  * tokens, ONE xxhash64 per shingle, then `numHashes` universal-hash
  * permutations `a_i * h + b_i` (odd a_i from a splitmix64 stream) with
  * running minima — the textbook MinHash implementation, one pass per
  * row.
  *
  * Replaces the interpreted formulation (32 lambda-evaluated hash
  * passes over a shingle array) in the hot path; returns NULL when the
  * document has fewer than n tokens (same contract as
  * `graft.ops.Dedup.minhashSignature`).
  */
case class MinHashSignature(child: Expression, n: Int, numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any =
    MinHashImpl.compute(input.asInstanceOf[UTF8String], n, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = true;
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      if (!${childGen.isNull}) {
        ${ev.value} = graft.expressions.MinHashImpl.compute(
          ${childGen.value}, $n, $numHashes);
        ${ev.isNull} = ${ev.value} == null;
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashImpl {
  private def isSpace(b: Byte): Boolean = b == 0x20 || (b >= 0x09 && b <= 0x0D)

  private def splitmix64(seed: Long): Long = {
    var x = seed + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Permutation multipliers/offsets, derived deterministically once. */
  private val MaxHashes = 256
  private val as: Array[Long] = Array.tabulate(MaxHashes)(i => splitmix64(2L * i) | 1L)
  private val bs: Array[Long] = Array.tabulate(MaxHashes)(i => splitmix64(2L * i + 1))

  def compute(s: UTF8String, n: Int, numHashes: Int): ArrayData = {
    require(numHashes <= MaxHashes)
    // token byte ranges
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
    if (nTok < n) return null
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val buf = new Array[Byte](nb + n) // shingle bytes, single-space joined
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
      val h = XXH64.hashUnsafeBytes(buf,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len, 42L)
      var k = 0
      while (k < numHashes) {
        val p = as(k) * h + bs(k)
        if (p < mins(k)) mins(k) = p
        k += 1
      }
      w += 1
    }
    new GenericArrayData(mins)
  }
}
