package graft.engine

import graft.SparkSpecBase
import graft.functions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests (SURVEY.md §5): for ANY input string, the reference
  * coercions never throw and land in their contracted ranges —
  * numeric → a decimal (0 for garbage), timestamp → value-or-null,
  * and the text kernels are total functions. Uses raw ScalaCheck
  * generators with a fixed seed (scalatestplus bridge isn't in the
  * offline dependency set).
  */
class CoercionProperties extends SparkSpecBase {
  import spark.implicits._

  private val anyString: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr,
    Gen.asciiPrintableStr,
    Gen.numStr.map("-" + _),
    Gen.choose(-1e12, 1e12).map(_.toString),
    Gen.oneOf("", " ", "\t", "NaN", "Infinity", "-Infinity", "1e99999",
      "2024-01-01", "2024-13-45 99:99:99", "0x12", "1.2.3", "½", "１２３"),
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '\t', '\n', '.', '-')))
      .map(_.mkString))

  /** 300 deterministic samples across sizes. */
  private val samples: Seq[String] =
    (0 until 300).flatMap { i =>
      anyString(Gen.Parameters.default.withSize(1 + i % 40), Seed(i.toLong))
    }

  test("coerceNumeric: total, null-free, garbage -> 0 over arbitrary strings") {
    val rows = (samples :+ null).toDF("s")
      .select(coerceNumeric(col("s"), DecimalType(18, 3)).as("v"))
      .collect()
    assert(rows.length == samples.length + 1)
    assert(rows.forall(r => !r.isNullAt(0))) // never null, never throws
  }

  test("coerceTimestamp: total, value-or-null over arbitrary strings") {
    val n = (samples :+ null).toDF("s")
      .select(coerceTimestamp(col("s")).as("t"))
      .count()
    assert(n == samples.length + 1)
  }

  test("tokenCount == |shingles(1)|; |shingles(n)| == max(n_tok - n + 1, 0)") {
    val rows = samples.toDF("s").select(
      graft.ops.TextOps.tokenCount(col("s")).as("n"),
      size(graft.ops.TextOps.wordShingles(col("s"), 1)).as("s1"),
      size(graft.ops.TextOps.wordShingles(col("s"), 3)).as("s3")).collect()
    rows.foreach { r =>
      val (n, s1, s3) = (r.getInt(0), r.getInt(1), r.getInt(2))
      assert(s1 == n)
      assert(s3 == math.max(n - 2, 0))
    }
  }

  test("native simhash total + equal to declarative form on arbitrary strings") {
    val rows = samples.toDF("s").select(
      simhash64Native(col("s")).as("a"),
      graft.ops.Dedup.simhash64FromHashes(
        transform(graft.ops.TextOps.tokens(col("s")), t => xxhash64(t))).as("b"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }
}
