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
}
