package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpecBase {
  import spark.implicits._

  // tiny corpus with a known relevance gradient for the query "alpha beta"
  private def corpus = Seq(
    (10L, "alpha beta alpha beta"),        // both terms, high tf
    (11L, "alpha beta gamma delta"),       // both terms, once each
    (12L, "alpha gamma gamma gamma"),      // one term
    (13L, "epsilon zeta eta theta"),       // no terms
    (14L, "beta beta beta beta beta beta") // one term, high tf, longer
  ).toDF("doc_id", "text")

  private def queries = Seq((1L, "alpha beta")).toDF("doc_id", "text")

  private def run(k: Int = 10) =
    Retrieval.bm25TopK(corpus, "doc_id", "text", queries, "doc_id", "text", k)

  test("ranks are contiguous from 1, scores non-increasing, no-term docs absent") {
    val rows = run().orderBy("rank")
      .select("rank", "doc_id", "score6").as[(Int, Long, Long)].collect()
    assert(rows.map(_._1).toSeq == (1 to rows.length))
    assert(rows.sliding(2).forall {
      case Array(a, b) => a._3 >= b._3
      case _           => true
    })
    // doc 13 shares no term with the query: it must not be retrieved
    assert(!rows.map(_._2).contains(13L))
    // docs matching BOTH terms outrank the single-term docs
    val pos = rows.map(_._2).zipWithIndex.toMap
    assert(pos(10L) < pos(12L) && pos(11L) < pos(12L))
  }

  test("k bounds the result per query; ties break by ascending doc id") {
    assert(run(k = 2).count() == 2)
    // two byte-identical docs tie exactly — lower id must rank first
    val tied = Seq((20L, "alpha beta"), (21L, "alpha beta")).toDF("doc_id", "text")
    val r = Retrieval.bm25TopK(tied, "doc_id", "text",
        queries, "doc_id", "text", k = 2)
      .orderBy("rank").select("doc_id").as[Long].collect().toSeq
    assert(r == Seq(20L, 21L))
  }

  test("score6 is the exact scaled sum and score its double view") {
    val rows = run().select("score6", "score").as[(Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (s6, s) => assert(s == s6.toDouble / 1000000.0) }
    // deterministic across runs and input partitioning
    val a = run().select("rank", "doc_id", "score6")
      .as[(Int, Long, Long)].collect().toSeq.sorted
    val b = Retrieval.bm25TopK(corpus.repartition(7), "doc_id", "text",
        queries, "doc_id", "text", 10)
      .select("rank", "doc_id", "score6").as[(Int, Long, Long)]
      .collect().toSeq.sorted
    assert(a == b)
  }

  test("matches a directly-computed BM25 on the fixture") {
    // independent recomputation in plain Scala (same quantization)
    val docs = corpus.as[(Long, String)].collect().toMap
    val toks = docs.map { case (id, t) => id -> t.split("\\s+").toSeq }
    val n = toks.size.toDouble
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    val qts = Seq("alpha", "beta")
    val expected = toks.flatMap { case (id, w) =>
      val dl = w.size.toDouble
      val s6 = qts.map { t =>
        val tf = w.count(_ == t).toDouble
        if (tf == 0) 0L
        else {
          val df = toks.values.count(_.contains(t)).toDouble
          val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
          math.floor(idf * (tf * (1.2 + 1.0) /
            (tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl))) * 1000000.0).toLong
        }
      }.sum
      if (s6 == 0L && !qts.exists(w.contains)) None else Some(id -> s6)
    }
    val got = run().select("doc_id", "score6").as[(Long, Long)].collect().toMap
    assert(got == expected, s"got $got expected $expected")
  }

  private def phraseRun(corpus: Seq[(Long, String)], phrases: Seq[(Long, Seq[String])]) = {
    import spark.implicits._
    Retrieval.phraseOccurrences(
        corpus.toDF("doc_id", "text"), "doc_id", "text",
        phrases.toDF("qid", "ph"), "qid", "ph")
      .as[(Long, Long, Long, Int)].collect().toSet
  }

  test("phraseOccurrences finds consecutive-token matches only") {
    val corpus = Seq(
      (10L, "the quick brown fox jumps"),
      (11L, "quick the brown fox"),        // tokens present, order wrong
      (12L, "the quick red fox"),          // gap breaks the phrase
      (13L, "prefix the quick brown tail")
    )
    val got = phraseRun(corpus, Seq((1L, Seq("the", "quick", "brown"))))
    assert(got == Set((1L, 10L, 1L, 0), (1L, 13L, 1L, 1)), got)
  }

  test("phraseOccurrences counts overlapping occurrences individually") {
    // "a a a" contains "a a" at starts 0 and 1
    val got = phraseRun(Seq((20L, "a a a")), Seq((1L, Seq("a", "a"))))
    assert(got == Set((1L, 20L, 2L, 0)), got)
  }

  test("phraseOccurrences handles repeated terms and multiple queries") {
    val corpus = Seq((30L, "x y x y x"), (31L, "y x y"))
    val got = phraseRun(corpus,
      Seq((1L, Seq("x", "y", "x")), (2L, Seq("y", "x"))))
    // q1 in doc 30 at starts 0 and 2; q2 in 30 at 1,3 and in 31 at 0
    assert(got == Set((1L, 30L, 2L, 0), (2L, 30L, 2L, 1), (2L, 31L, 1L, 0)), got)
  }

  test("phraseOccurrences: single-token and no-match phrases") {
    val corpus = Seq((40L, "alpha beta alpha"))
    val got = phraseRun(corpus,
      Seq((1L, Seq("alpha")), (2L, Seq("gamma"))))
    assert(got == Set((1L, 40L, 2L, 0)), got)
  }

  private def phraseRunMapSide(corpus: Seq[(Long, String)],
      phrases: Seq[(Long, Seq[String])]) = {
    import spark.implicits._
    Retrieval.phraseOccurrencesMapSide(
        corpus.toDF("doc_id", "text"), "doc_id", "text",
        phrases.toDF("qid", "ph"), "qid", "ph")
      .as[(Long, Long, Long, Int)].collect().toSet
  }

  test("map-side formulation is result-identical to the postings join") {
    val corpus = Seq(
      (10L, "the quick brown fox jumps the quick brown"),
      (11L, "a a a a"), (12L, "x y x y x"), (13L, "short"),
      (14L, "the quick red fox"))
    val phrases = Seq(
      (1L, Seq("the", "quick", "brown")), (2L, Seq("a", "a")),
      (3L, Seq("x", "y", "x")), (4L, Seq("nope")), (5L, Seq("short")))
    val joinRes = phraseRun(corpus, phrases)
    val mapRes = phraseRunMapSide(corpus, phrases)
    assert(mapRes == joinRes, s"map-side $mapRes vs join $joinRes")
    assert(joinRes.nonEmpty)
  }

  test("subseq_starts native kernel ≡ the declarative window filter, exhaustively") {
    import spark.implicits._
    // small vocab forces matches, overlaps, and repeats; fixed seed
    val rnd = new scala.util.Random(42L)
    val vocab = Seq("a", "b", "c")
    val hays = (0 until 200).map(i =>
      (i.toLong, Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(3)))))
    val needles = Seq(Seq("a"), Seq("a", "b"), Seq("b", "b"),
      Seq("a", "b", "a"), Seq("c", "c", "c", "c"))
    for (ndl <- needles) {
      val df = hays.toDF("id", "w")
      val both = df.select(
        graft.functions.subseqStartsNative(col("w"), typedlit(ndl)).as("native"),
        Retrieval.phraseStartsDeclarative(col("w"), typedlit(ndl)).as("decl"))
      val bad = both.where(not(col("native") <=> col("decl"))).collect()
      assert(bad.isEmpty, s"needle=$ndl: ${bad.take(3).mkString(";")}")
    }
    // SQL registration round-trips
    graft.GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT subseq_starts(array('x','y','x','y'), array('x','y')) AS s")
      .collect()(0).getSeq[Int](0)
    assert(viaSql == Seq(1, 3))
  }

  test("map-side phrase plan has no exchange before the output") {
    import spark.implicits._
    val df = Retrieval.phraseOccurrencesMapSide(
      Seq((10L, "p q r")).toDF("doc_id", "text"), "doc_id", "text",
      Seq((1L, Seq("p", "q"))).toDF("qid", "ph"), "qid", "ph")
    val plan = df.queryExecution.executedPlan.toString
    // only the broadcast of the phrase side may appear — no shuffle
    assert(!plan.contains("ShuffleExchange"), plan)
  }

  test("map-side handles docs shorter than the phrase (sequence guard)") {
    // sequence(a, b) REVERSES when b < a — the guard must keep short
    // docs from producing phantom windows
    val got = phraseRunMapSide(Seq((50L, "one two")),
      Seq((1L, Seq("one", "two", "three"))))
    assert(got.isEmpty, got)
  }

  test("ndcgAtK: ideal order scores 1.0, inversions score below, no labels score 0") {
    def g(rel: Long, rank: Long): Long =
      math.floor(rel * 1000000.0 / math.log(rank + 1.0)).toLong
    val rel = Seq((1L, 10L, 3L), (1L, 11L, 2L), (1L, 12L, 1L),
      (2L, 10L, 5L)).toDF("query_id", "doc_id", "rel")
    // query 1 ranked ideally; query 2's only relevant doc at rank 2;
    // query 3 retrieved docs but has no labels at all
    val ranked = Seq((1L, 1, 10L), (1L, 2, 11L), (1L, 3, 12L),
      (2L, 1, 99L), (2L, 2, 10L),
      (3L, 1, 10L)).toDF("query_id", "rank", "doc_id")
    val got = Retrieval.ndcgAtK(ranked, rel, k = 10)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    val ideal1 = g(3, 1) + g(2, 2) + g(1, 3)
    assert(got(0) == ((1L, ideal1, ideal1, 1.0)))
    val (dcg2, idcg2) = (g(0, 1) + g(5, 2), g(5, 1))
    assert(got(1) == ((2L, dcg2, idcg2, dcg2.toDouble / idcg2)))
    assert(got(1)._4 < 1.0)
    assert(got(2) == ((3L, 0L, 0L, 0.0)))
    // duplicate labels inflate both sums silently — rejected loudly
    val dup = rel.unionAll(rel.limit(1))
    val e = intercept[IllegalArgumentException](
      Retrieval.ndcgAtK(ranked, dup, k = 10))
    assert(e.getMessage.contains("duplicate"))
  }

  test("retrievalMetrics: rr/recall conventions incl. labeled-but-unranked queries") {
    val rel = Seq((1L, 10L, 3L), (1L, 11L, 1L),
      (2L, 20L, 2L),              // query 2: labels but NO ranked rows
      (4L, 40L, 0L)).toDF("query_id", "doc_id", "rel") // rel 0 = not relevant
    val ranked = Seq((1L, 1, 99L), (1L, 2, 10L), (1L, 3, 11L),
      (3L, 1, 30L),               // query 3: ranked rows, no labels at all
      (4L, 1, 40L)).toDF("query_id", "rank", "doc_id")
    val got = Retrieval.retrievalMetrics(ranked, rel, k = 10)
      .as[(Long, Int, Long, Long, Double, Double)].collect().sortBy(_._1)
    // q1: first hit at rank 2, both relevant docs retrieved
    assert(got(0) == ((1L, 2, 2L, 2L, 0.5, 1.0)))
    // q2: must APPEAR with rr 0 / recall 0 — dropping it would
    // overstate every mean (the full-outer contract)
    assert(got(1) == ((2L, 0, 0L, 1L, 0.0, 0.0)))
    // q3: retrieved, nothing labeled → all-zero row
    assert(got(2) == ((3L, 0, 0L, 0L, 0.0, 0.0)))
    // q4: its only label has rel 0 → doc 40 retrieved but NOT a hit
    assert(got(3) == ((4L, 0, 0L, 0L, 0.0, 0.0)))
    // duplicate labels rejected loudly, same guard as ndcgAtK
    val e = intercept[IllegalArgumentException](
      Retrieval.retrievalMetrics(ranked, rel.unionAll(rel.limit(1)), k = 10))
    assert(e.getMessage.contains("duplicate"))
  }

  test("rrfFuse: exact contributions, absent-arm zero, doc-id ties, k bound") {
    import spark.implicits._
    // arm A ranks docs 10,11,12; arm B ranks 11,10,13 — doc 12 and 13
    // are single-arm survivors
    val a = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
      .toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 11L, 1), (1L, 10L, 2), (1L, 13L, 3))
      .toDF("query_id", "doc_id", "rank")
    val fused = Retrieval.rrfFuse(Seq(a, b), k = 4)
      .orderBy("rank").as[(Long, Int, Long, Double)].collect().toSeq
    def c(r: Int) = 1.0 / (60.0 + r)
    // 10: 1/61 + 1/62; 11: 1/62 + 1/61 — EQUAL scores, tie → doc id
    assert(fused.map(_._3) == Seq(10L, 11L, 12L, 13L))
    assert(fused(0)._4 == c(1) + c(2) && fused(1)._4 == c(2) + c(1))
    assert(fused(2)._4 == c(3) && fused(3)._4 == c(3),
      "an absent arm contributes exactly zero")
    assert(fused.map(_._2) == Seq(1, 2, 3, 4))
    // k bounds the fused list
    assert(Retrieval.rrfFuse(Seq(a, b), k = 2).count() == 2L)
  }

  test("rrfFuse generalizes to three arms with a fixed-order sum") {
    import spark.implicits._
    val arms = Seq(
      Seq((1L, 5L, 1), (1L, 6L, 2)),
      Seq((1L, 6L, 1), (1L, 5L, 2)),
      Seq((1L, 7L, 1), (1L, 5L, 2))).map(
      _.toDF("query_id", "doc_id", "rank"))
    val fused = Retrieval.rrfFuse(arms, k = 3)
      .orderBy("rank").as[(Long, Int, Long, Double)].collect().toSeq
    def c(r: Int) = 1.0 / (60.0 + r)
    // 5: three contributions (left-to-right sum); 6: two; 7: one
    assert(fused.map(_._3) == Seq(5L, 6L, 7L))
    assert(fused(0)._4 == c(1) + c(2) + c(2))
    assert(fused(1)._4 == c(2) + c(1))
    assert(fused(2)._4 == c(1))
  }

  test("hybridTopK fuses BM25 and cosine arms; a dense-only doc places") {
    import spark.implicits._
    // docs 1-3 share the query's words; doc 4 is lexically alien but
    // its VECTOR matches the query exactly
    val docs = Seq(
      (1L, "liquor store sales report"),
      (2L, "liquor sales"),
      (3L, "store report"),
      (4L, "zzz qqq xxx")).toDF("doc_id", "text")
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(0.6f, 0.8f)))
      .toDF("vec_id", "embedding")
    val q = Seq((100L, "liquor sales")).toDF("doc_id", "text")
    val qv = Seq((100L, Array(0.6f, 0.8f))).toDF("vec_id", "embedding")
    val fused = Retrieval.hybridTopK(docs, "doc_id", "text",
        vecs, "vec_id", "embedding", q, "doc_id", "text",
        qv, "vec_id", "embedding", k = 4)
      .orderBy("rank").as[(Long, Int, Long, Double)].collect().toSeq
    assert(fused.map(_._1).distinct == Seq(100L))
    assert(fused.map(_._3).contains(4L),
      "the dense-only doc must surface through fusion")
    // identical to fusing the two arms by hand
    val lex = Retrieval.bm25TopK(docs, "doc_id", "text", q, "doc_id",
      "text", k = 4)
    val dense = Similarity.bruteForceTopK(qv, vecs, "vec_id", "embedding",
        k = 4)
      .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
    val manual = Retrieval.rrfFuse(Seq(lex, dense), k = 4)
      .orderBy("rank").as[(Long, Int, Long, Double)].collect().toSeq
    assert(fused == manual)
  }

  test("rrfFuse collapses a duplicated (query, doc) arm row to one vote at " +
      "its best rank") {
    import spark.implicits._
    val clean = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
      .toDF("query_id", "doc_id", "rank")
    // doc 11 double-listed at ranks 2 and 3 — must vote once, at 2
    val dup = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 11L, 3), (1L, 12L, 3))
      .toDF("query_id", "doc_id", "rank")
    val a = Retrieval.rrfFuse(Seq(clean), k = 3)
      .orderBy("rank").as[(Long, Int, Long, Double)].collect().toSeq
    val b = Retrieval.rrfFuse(Seq(dup), k = 3)
      .orderBy("rank").as[(Long, Int, Long, Double)].collect().toSeq
    assert(a == b, "a duplicated candidate must not occupy two rank slots")
  }

  test("hybridTopK excludes a query doc present in the corpus from BOTH " +
      "arms — never a half-score self-match") {
    import spark.implicits._
    val docs = Seq(
      (1L, "liquor sales report"),
      (2L, "liquor sales"),
      (3L, "store report")).toDF("doc_id", "text")
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    // the query IS corpus doc 2 — text and vector identical
    val q = docs.where(col("doc_id") === 2)
    val qv = vecs.where(col("vec_id") === 2)
    val fused = Retrieval.hybridTopK(docs, "doc_id", "text",
        vecs, "vec_id", "embedding", q, "doc_id", "text",
        qv, "vec_id", "embedding", k = 3)
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(fused.nonEmpty && fused.forall(_._3 != 2L),
      "the self-match must be excluded, not half-scored")
    // and each arm's k-bounding already excluded it (ranks contiguous)
    assert(fused.map(_._2).sorted == (1 to fused.size).toSeq)
  }

  test("tfidfTopTerms matches the exact quantized recompute; rare terms outrank stopwords") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat"),
      (3L, "the zebra zebra zebra"))
    val df = docs.toDF("doc_id", "text")
    val got = Retrieval.tfidfTopTerms(df, "doc_id", "text", k = 2)
      .orderBy("doc_id", "rk")
      .as[(Long, String, Long, Long, Int)].collect().toSeq
    // independent recompute
    val bags = docs.map { case (id, t) => id -> t.split(" ").toSeq }
    val n = docs.size
    val dfm = bags.flatMap(_._2.distinct).groupBy(identity).view.mapValues(_.size).toMap
    def idf6(t: String) = math.floor(math.log((n + 1.0) / (dfm(t) + 1.0)) * 1e6).toLong
    got.foreach { case (id, term, tf, score6, _) =>
      val expTf = bags.find(_._1 == id).get._2.count(_ == term).toLong
      assert(tf == expTf && score6 == tf * idf6(term), s"$id/$term")
    }
    // doc 3's top term: zebra (tf 3, df 1) far above 'the'
    assert(got.find(r => r._1 == 3L && r._5 == 1).get._2 == "zebra")
    // 'the' appears in every doc → idf6 = floor(ln(4/4)·1e6) = 0 → score 0
    assert(got.filter(_._2 == "the").forall(_._4 == 0L))
    // exactly ≤ k rows per doc, ranks contiguous from 1
    assert(got.groupBy(_._1).values.forall(rs =>
      rs.map(_._5).sorted == (1 to rs.size)))
  }
}
