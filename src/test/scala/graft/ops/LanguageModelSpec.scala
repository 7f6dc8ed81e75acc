package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class LanguageModelSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs = Seq(
    (1L, "en", "the cat sat on the mat"),
    (2L, "en", "the cat sat on the hat"),
    (3L, "en", "the cat sat on the mat"),
    (4L, "en", "zz qq vv pp rr ww"), // transitions seen nowhere else
    (5L, "en", "solo"),              // 1 token -> no transitions
    (6L, "fr", "le chat le chat le chat")
  ).toDF("doc_id", "lang", "text")

  private def run() =
    LanguageModel.bigramCrossEntropy(docs, "doc_id", "text", "lang")

  test("typical docs score lower cross-entropy than one-off transitions") {
    val nll = run().select("doc_id", "avg_nll").as[(Long, Double)]
      .collect().toMap
    // docs 1/3 are the modal text; doc 4's transitions occur once each
    assert(nll(1L) < nll(4L))
    assert(nll(2L) < nll(4L)) // shares most transitions with the mode
    assert(nll(1L) == nll(3L)) // identical text, identical score
  }

  test("docs without transitions score zero with zero counted bigrams") {
    val r = run().where(col("doc_id") === 5L)
      .select("n_bigrams", "nll6", "avg_nll")
      .as[(Long, Long, Double)].head()
    assert(r == ((0L, 0L, 0.0)))
  }

  test("per-language models are independent and vocab is per-language") {
    // doc 6 is the only fr doc: its bigram counts come from itself only
    val frRows = run().where(col("doc_id") === 6L)
      .select("n_bigrams").as[Long].head()
    assert(frRows == 5L)
    // removing the en docs must not change the fr score
    val frOnly = LanguageModel.bigramCrossEntropy(
        docs.where(col("lang") === "fr"), "doc_id", "text", "lang")
      .select("doc_id", "nll6").as[(Long, Long)].collect().toMap
    val full = run().select("doc_id", "nll6").as[(Long, Long)].collect().toMap
    assert(frOnly(6L) == full(6L))
  }

  test("matches a directly-computed add-one bigram model") {
    val en = docs.where(col("lang") === "en")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    val toks = en.map { case (id, t) => id -> t.split("\\s+").toSeq }
    val grams = toks.values.flatMap(w => w.zip(w.drop(1))).toSeq
    val c2 = grams.groupBy(identity).map { case (g, xs) => g -> xs.size }
    val c1 = grams.groupBy(_._1).map { case (a, xs) => a -> xs.size }
    val v = toks.values.flatten.toSet.size
    val expected = toks.map { case (id, w) =>
      val nll6 = w.zip(w.drop(1)).map { g =>
        -math.floor(math.log((c2(g).toDouble + 1.0) /
          (c1(g._1).toDouble + v.toDouble)) * 1000000.0).toLong
      }.sum
      id -> nll6
    }
    val got = run().where(col("lang") === "en")
      .select("doc_id", "nll6").as[(Long, Long)].collect().toMap
    assert(got == expected, s"got $got expected $expected")
  }

  test("smoothed conditionals sum to one over the vocabulary") {
    // P(b|a) = (c2+1)/(c1+V): over all b in V,
    // sum = (c1 + #observed-pairs-free mass) — verify exactly with BigInt
    val w = docs.where(col("lang") === "en").select("text").as[String]
      .collect().flatMap(_.split("\\s+")).toSeq
    val grams = {
      val ts = docs.where(col("lang") === "en")
        .select("text").as[String].collect().map(_.split("\\s+").toSeq)
      ts.flatMap(x => x.zip(x.drop(1))).toSeq
    }
    val vocab = w.toSet
    val c2 = grams.groupBy(identity).map { case (g, xs) => g -> xs.size }
    val c1 = grams.groupBy(_._1).map { case (a, xs) => a -> xs.size }
    for (a <- c1.keys) {
      val num = vocab.toSeq.map(b => BigInt(c2.getOrElse((a, b), 0) + 1)).sum
      assert(num == BigInt(c1(a) + vocab.size),
        s"P(.|$a) does not normalize")
    }
  }

  test("trigramStupidBackoff matches an exact recompute across all arms") {
    import org.apache.spark.sql.functions.col
    val train = Seq((0L, "a b c a b c d", "xx")).toDF("doc_id", "text", "lang")
    // scored doc hits: (a,b,c) trigram arm; (b,c,x) unseen trigram but
    // wait — pick grams so each arm fires: "a b c" = trigram arm;
    // "c a b" = trigram arm (train has it); "b c d" trigram arm;
    // "c d a" unseen trigram, bigram (d,a) unseen, unigram a arm;
    // "d a b" unseen trigram, bigram (a,b) seen -> bigram arm
    val score = Seq((10L, "a b c d a b", "xx")).toDF("doc_id", "text", "lang")
    val got = LanguageModel.trigramStupidBackoff(train, score,
        "doc_id", "text", "lang")
      .as[(Long, String, Long, Long, Double, Long, Long)].collect().head
    // train counts: tokens a,b,c,a,b,c,d: N=7 V=4
    // c3: (a,b,c)=2 (b,c,a)=1 (c,a,b)=1 (b,c,d)=1; c2: ab=2 bc=2 ca=1 cd=1
    // c1: a=2 b=2 c=2 d=1
    // score trigrams: (a,b,c): 2/2; (b,c,d): 1/2; (c,d,a): c3 0, bigram
    // (d,a) 0 -> unigram a: .4*.4*(2+1)/(7+4+1); (d,a,b): c3 0, bigram
    // (a,b)=2, c1(a)=2 -> .4*(2/2)
    def q(x: Double) = -math.floor(math.log(x) * 1e6).toLong
    val expNll = q(2.0 / 2.0) + q(1.0 / 2.0) +
      q(0.4 * 0.4 * ((2.0 + 1.0) / 12.0)) + q(0.4 * (2.0 / 2.0))
    assert(got == ((10L, "xx", 4L, expNll,
      expNll.toDouble / 1e6 / 4.0, 1L, 1L)), got)
  }

  test("trigramStupidBackoff: self-scoring never backs off") {
    val docs = Seq((0L, "p q r s t p q r", "yy")).toDF("doc_id", "text", "lang")
    val got = LanguageModel.trigramStupidBackoff(docs, docs,
        "doc_id", "text", "lang")
      .as[(Long, String, Long, Long, Double, Long, Long)].collect().head
    assert(got._6 == 0L && got._7 == 0L, s"self-trained must not back off: $got")
    assert(got._3 == 6L)
  }

  test("trigramStupidBackoff: language absent from train floors, no abort") {
    val train = Seq((0L, "a b c d", "xx")).toDF("doc_id", "text", "lang")
    val score = Seq((10L, "m n o p", "zz")).toDF("doc_id", "text", "lang")
    val got = LanguageModel.trigramStupidBackoff(train, score,
        "doc_id", "text", "lang")
      .as[(Long, String, Long, Long, Double, Long, Long)].collect().head
    // every trigram lands in the unigram floor: .4*.4*(0+1)/(0+0+1)
    def q(x: Double) = -math.floor(math.log(x) * 1e6).toLong
    assert(got._3 == 2L && got._7 == 2L)
    assert(got._4 == 2 * q(0.4 * 0.4 * 1.0), got)
  }

  test("collocationsPmi: collocated pairs score high, floor filters rare pairs") {
    // "new york" always adjacent; "the of" never; "a b" only twice
    val docs = Seq(
      (1L, "new york is big and new york is old"),
      (2L, "people love new york a b"),
      (3L, "new york again a b")).toDF("doc_id", "text")
    val got = LanguageModel.collocationsPmi(docs, "doc_id", "text",
        minCount = 3L)
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got.contains(("new", "york")), got)
    assert(got(("new", "york"))._1 == 4L)
    assert(!got.contains(("a", "b")), "below the floor")
    // exact recompute of the fixed sum-of-lns shape
    val allTokens = Seq("new york is big and new york is old",
      "people love new york a b", "new york again a b")
      .flatMap(_.split(" "))
    val tu = allTokens.size.toDouble
    val tp = (allTokens.size - 3).toDouble // pairs = tokens - docs
    val ca = allTokens.count(_ == "new").toDouble
    val cb = allTokens.count(_ == "york").toDouble
    val expect = math.floor((math.log(4.0) + 2.0 * math.log(tu) -
      math.log(tp) - math.log(ca) - math.log(cb)) * 1e6).toLong
    assert(got(("new", "york"))._2 == expect,
      s"${got(("new", "york"))._2} != $expect")
    // PMI of a perfect collocation is positive
    assert(got(("new", "york"))._2 > 0L)
    intercept[IllegalArgumentException](
      LanguageModel.collocationsPmi(docs, "doc_id", "text", minCount = 0L))
  }
}
