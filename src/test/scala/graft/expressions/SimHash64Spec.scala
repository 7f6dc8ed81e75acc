package graft.expressions

import graft.SparkSpecBase
import graft.ops.{Dedup, TextOps}
import org.apache.spark.sql.functions._

/** The native codegen'd SimHash must be bit-identical to the
  * declarative HOF formulation (same tokenization, same xxhash64 seed).
  */
class SimHash64Spec extends SparkSpecBase {
  import spark.implicits._

  test("native SimHash64 == declarative simhash64FromHashes, bit for bit") {
    val docs = Seq(
      "the quick brown fox",
      "  leading and trailing  ",
      "tabs\tand\nnewlines\rmixed",
      "single",
      "",
      "   ",
      "unicode tokens café über straße",
      "repeated repeated repeated words words"
    ).toDF("text")
    val both = docs.select(
      graft.functions.simhash64Native(col("text")).as("native"),
      Dedup.simhash64FromHashes(
        transform(TextOps.tokens(col("text")), t => xxhash64(t))).as("hof"))
    both.collect().foreach { r =>
      assert(r.getLong(0) == r.getLong(1),
        s"native ${r.getLong(0)} != hof ${r.getLong(1)}")
    }
  }

  test("null input -> null output") {
    val got = Seq[Option[String]](None, Some("x")).toDF("text")
      .select(graft.functions.simhash64Native(col("text")))
      .collect()
    assert(got(0).isNullAt(0) && !got(1).isNullAt(0))
  }
}
