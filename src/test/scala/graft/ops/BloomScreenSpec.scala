package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class BloomScreenSpec extends SparkSpecBase {
  import spark.implicits._

  private def bench = Seq(
    (100L, "secret eval question one answer"),
    (101L, "held out test prompt two")
  ).toDF("doc_id", "text")

  private def corpus = Seq(
    (1L, "secret eval question leaked into training"), // shares a 3-gram
    (2L, "held out test prompt two verbatim copy"),    // wholesale copy
    (3L, "completely unrelated clean document text"),
    (4L, "another clean doc with fresh words only"),
    (5L, "xy")                                         // < n tokens: no shingles
  ).toDF("doc_id", "text")

  private def screen(fpp: Double = 1e-6) =
    Dedup.bloomScreen(corpus, "doc_id", "text", bench, "text",
      n = 3, benchShingles = 64L, fpp = fpp)

  test("no false negatives: every truly contaminated doc is flagged") {
    val hits = screen().where(col("bloom_hit"))
      .select("doc_id").as[Long].collect().toSet
    assert(Set(1L, 2L).subsetOf(hits), hits)
    // shingle-less docs can never be flagged
    assert(!hits.contains(5L))
  }

  test("at generous sizing the screen is exact on this fixture") {
    val hits = screen().where(col("bloom_hit"))
      .select("doc_id").as[Long].collect().toSet
    assert(hits == Set(1L, 2L), hits)
  }

  test("one-sidedness survives an undersized sketch") {
    // deliberately tiny sketch (high fp rate): over-flagging is
    // allowed, missing a contaminated doc is not
    val hits = screen(fpp = 0.4).where(col("bloom_hit"))
      .select("doc_id").as[Long].collect().toSet
    assert(Set(1L, 2L).subsetOf(hits), hits)
  }

  test("screen verdicts are deterministic and partitioning-independent") {
    val a = screen().select("doc_id", "bloom_hit")
      .as[(Long, Boolean)].collect().toMap
    val b = Dedup.bloomScreen(corpus.repartition(5), "doc_id", "text",
        bench, "text", n = 3, benchShingles = 64L)
      .select("doc_id", "bloom_hit").as[(Long, Boolean)].collect().toMap
    assert(a == b)
  }

  test("agrees with the exact decontaminate verdict on real fixtures") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val b = docs.where(col("doc_id") < 20)
    val c = docs.where(col("doc_id") >= 20)
    val flagged = Dedup.bloomScreen(c, "doc_id", "text", b, "text",
        n = 3, benchShingles = 4096L)
      .where(col("bloom_hit")).select("doc_id").as[Long].collect().toSet
    val clean = Dedup.decontaminate(c, "doc_id", "text", b, "text", n = 3)
      .select("doc_id").as[Long].collect().toSet
    val truly = c.select("doc_id").as[Long].collect().toSet -- clean
    // one-sided: flagged ⊇ truly; at fpp=1e-6 expect zero overshoot here
    assert(truly.subsetOf(flagged))
    assert((flagged -- truly).size <= 5, s"fp overshoot: ${flagged -- truly}")
  }
}
