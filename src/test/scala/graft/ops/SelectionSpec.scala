package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class SelectionSpec extends SparkSpecBase {
  import spark.implicits._

  // pure-Scala reference of the portable feature hash
  private def refBucket(tok: String, b: Int): Long =
    tok.foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % b)

  test("tokenBucket matches the reference polynomial fold") {
    val toks = Seq("hello", "a", "Z9", "don't", "x-ray!", "émigré", "0", "~~~")
    val got = toks.toDF("t")
      .select(col("t"), Selection.tokenBucket(col("t"), 1024).as("b"))
      .as[(String, Long)].collect().toMap
    toks.foreach { t => assert(got(t) == refBucket(t, 1024), s"token $t") }
  }

  test("tokenBucket stays inside [0, nBuckets) and rejects bad sizes") {
    val got = Seq("alpha", "beta", "gamma").toDF("t")
      .select(Selection.tokenBucket(col("t"), 7).as("b")).as[Long].collect()
    assert(got.forall(b => b >= 0 && b < 7))
    intercept[IllegalArgumentException](Selection.tokenBucket(col("t"), 0))
  }

  test("dsirScores ranks target-like documents above off-target ones") {
    // target speaks only "alpha beta"; corpus docs 100-104 are
    // target-like, 200-204 are pure "zulu yankee" noise
    val target = (0L until 10L).map(i => (i, "alpha beta alpha beta")).toDF("doc_id", "text")
    val corpus = ((100L until 105L).map(i => (i, "alpha beta alpha")) ++
      (200L until 205L).map(i => (i, "zulu yankee zulu"))).toDF("doc_id", "text")
    val scored = Selection.dsirScores(corpus, target, "doc_id", "text",
      nBuckets = 64, k = 5)
    val rows = scored.as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    val likeW = (100L until 105L).map(rows(_)._3)
    val offW = (200L until 205L).map(rows(_)._3)
    assert(likeW.min > offW.max,
      s"target-like $likeW must outrank off-target $offW")
    // exactly the 5 target-like docs are selected at k=5
    assert((100L until 105L).forall(rows(_)._4))
    assert((200L until 205L).forall(!rows(_)._4))
  }

  test("dsirScores matches an exact Scala recompute (quantized-ln law)") {
    val b = 32
    val target = Seq((0L, "red green red"), (1L, "green blue")).toDF("doc_id", "text")
    val corpusRows = Seq((10L, "red blue blue"), (11L, "void void red"), (12L, ""))
    val corpus = corpusRows.toDF("doc_id", "text")
    def toks(t: String) = t.split("\\s+").filter(_.nonEmpty).toSeq
    val tBags = Seq("red green red", "green blue").flatMap(toks).map(refBucket(_, b))
    val rBags = corpusRows.flatMap(r => toks(r._2)).map(refBucket(_, b))
    val ct = tBags.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cr = rBags.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (nt, nr) = (tBags.size.toLong, rBags.size.toLong)
    def lr6(bk: Long): Long = math.floor(math.log(
      ((ct.getOrElse(bk, 0L) + 1.0) * (nr + b).toDouble) /
        ((cr(bk) + 1.0) * (nt + b).toDouble)) * 1e6).toLong
    val expected = corpusRows.map { case (id, text) =>
      id -> toks(text).map(t => lr6(refBucket(t, b))).sum
    }.toMap
    val got = Selection.dsirScores(corpus, target, "doc_id", "text",
        nBuckets = b, k = 2)
      .select("doc_id", "logw6").as[(Long, Long)].collect().toMap
    assert(got == expected)
  }

  test("dsirScores: zero-token docs score 0, never selected; tiebreak doc_id asc") {
    val target = Seq((0L, "same same")).toDF("doc_id", "text")
    // all corpus docs identical => identical (negative) scores; k=2
    // must pick the two LOWEST doc ids deterministically, and the
    // empty doc's neutral 0 must NOT outrank them
    val corpus = (10L until 15L).map(i => (i, "same same")).toDF("doc_id", "text")
      .union(Seq((20L, "")).toDF("doc_id", "text"))
    val got = Selection.dsirScores(corpus, target, "doc_id", "text",
        nBuckets = 16, k = 2)
      .as[(Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(got(20L)._2 == 0L && got(20L)._3 == 0L && !got(20L)._4)
    assert(got(10L)._4 && got(11L)._4)
    assert(Seq(12L, 13L, 14L).forall(!got(_)._4))
  }

  test("temperatureMixture matches the exact integer-allocation law") {
    val docs = Seq.fill(8)((("big"), "w w w w w w w w w w")) ++ // 80 tokens
      Seq.fill(2)(("small", "w w")) // 4 tokens
    val df = docs.toDF("source", "text")
    val got = Selection.temperatureMixture(df, "source", "text", budgetDocs = 100L)
      .as[(String, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val n = Map("big" -> 80L, "small" -> 4L)
    val w6 = n.view.mapValues(t =>
      math.floor(math.sqrt(t.toDouble / 84.0) * 1e6).toLong).toMap
    val total6 = w6.values.sum
    n.keys.foreach { s =>
      val (_, nd, ntk, w, alloc) = got(s)
      assert(ntk == n(s) && w == w6(s))
      assert(alloc == 100L * w6(s) / total6)
    }
    assert(got("big")._2 == 8L && got("small")._2 == 2L)
    // temperature up-weights the tail: small's share beats proportional
    val smallShare = got("small")._5.toDouble / 100.0
    assert(smallShare > 4.0 / 84.0)
    // floor allocation never overfills
    assert(got.values.map(_._5).sum <= 100L)
  }

  test("temperatureMixture: all-empty corpus yields zero allocations, no abort") {
    val df = Seq(("s0", ""), ("s1", " ")).toDF("source", "text")
    val got = Selection.temperatureMixture(df, "source", "text", 100L)
      .as[(String, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // n_total = 0: weights and allocations must be 0, not NaN-fed
    // longs or an ANSI divide-by-zero error
    assert(got("s0") == (("s0", 1L, 0L, 0L, 0L)))
    assert(got("s1") == (("s1", 1L, 0L, 0L, 0L)))
  }

  test("temperatureMixture floor under-fill is bounded by nSources - 1") {
    val df = (0 until 7).flatMap(s => Seq.fill(s + 1)((s"s$s", "a b c")))
      .toDF("source", "text")
    val allocs = Selection.temperatureMixture(df, "source", "text", 1000L)
      .select("alloc_docs").as[Long].collect()
    assert(allocs.sum > 1000L - 7 && allocs.sum <= 1000L)
  }
}
