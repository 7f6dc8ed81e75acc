package graft.expressions

import graft.SparkSpecBase
import graft.ops.TextOps
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Native shingling must equal the declarative HOF formulation on
  * arbitrary strings, including whitespace pathologies and unicode.
  */
class WordShinglesSpec extends SparkSpecBase {
  import spark.implicits._

  private val gen: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr,
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '\t', '\n', '\r')))
      .map(_.mkString),
    Gen.oneOf("", " ", "a", "a b", "café über straße tokens here",
      "  double  spaces  between  tokens  "))

  private val samples: Seq[String] =
    (0 until 200).flatMap(i => gen(Gen.Parameters.default.withSize(1 + i % 30), Seed(i.toLong)))

  for (n <- Seq(1, 2, 3, 5)) {
    test(s"native == declarative for n=$n over arbitrary strings") {
      val rows = samples.toDF("s").select(
        graft.functions.wordShinglesNative(col("s"), n).as("nat"),
        TextOps.wordShingles(col("s"), n).as("hof")).collect()
      rows.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1))
      }
    }
  }

  test("null in -> null out") {
    val got = Seq[Option[String]](None).toDF("s")
      .select(graft.functions.wordShinglesNative(col("s"), 3)).collect()
    assert(got(0).isNullAt(0))
  }

  for (k <- Seq(3, 8)) {
    test(s"gramHashRange == declarative min/max of xxhash64(charShingles) for k=$k") {
      val rows = samples.toDF("s").select(
        graft.functions.gramHashRangeNative(col("s"), k).as("nat"),
        array_min(transform(TextOps.charShingles(col("s"), k), g => xxhash64(g))).as("mn"),
        array_max(transform(TextOps.charShingles(col("s"), k), g => xxhash64(g))).as("mx"))
        .collect()
      rows.foreach { r =>
        if (r.isNullAt(0)) {
          assert(r.isNullAt(1) && r.isNullAt(2))
        } else {
          val arr = r.getSeq[Long](0)
          assert(arr(0) == r.getLong(1) && arr(1) == r.getLong(2))
        }
      }
    }
  }
}
