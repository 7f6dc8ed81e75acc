package graft.ops

import graft.SparkSpecBase

class PerplexityBucketsSpec extends SparkSpecBase {
  import spark.implicits._

  private def bucketsOf(rows: Seq[(Long, String, Long)]): Map[Long, Int] =
    PerplexityBuckets.terciles(rows.toDF("doc_id", "lang", "nll6"))
      .as[(Long, String, Long, Int)].collect()
      .map(r => r._1 -> r._4).toMap

  test("distinct scores split 1/3 - 1/3 - 1/3 (cutoff law)") {
    // 9 docs, scores 10..90: head = {10,20,30}, mid = {40,50,60}
    val rows = (1L to 9L).map(i => (i, "en", i * 10))
    val got = bucketsOf(rows)
    assert((1L to 3L).forall(got(_) == 1))
    assert((4L to 6L).forall(got(_) == 2))
    assert((7L to 9L).forall(got(_) == 3))
  }

  test("tied scores never split across buckets") {
    // 6 docs score 5 (tie mass crosses both cutoffs), 3 docs higher:
    // every 5 lands in bucket 1, the rest in bucket 3
    val rows = (1L to 6L).map(i => (i, "en", 5L)) ++
      (7L to 9L).map(i => (i, "en", 100L))
    val got = bucketsOf(rows)
    assert((1L to 6L).forall(got(_) == 1), got)
    assert((7L to 9L).forall(got(_) == 3), got)
  }

  test("languages bucket independently") {
    // same scores, shifted per language: cutoffs must not leak
    val rows = (1L to 6L).map(i => (i, "aa", i)) ++
      (11L to 16L).map(i => (i, "bb", i + 1000))
    val got = bucketsOf(rows)
    assert(got(1L) == 1 && got(2L) == 1 && got(3L) == 2 &&
      got(4L) == 2 && got(5L) == 3 && got(6L) == 3)
    assert(got(11L) == 1 && got(13L) == 2 && got(16L) == 3)
  }

  test("matches an exact reference recompute on mixed ties") {
    val scores = Seq(3L, 3L, 3L, 7L, 7L, 9L, 12L, 12L, 40L, 41L)
    val rows = scores.zipWithIndex.map { case (s, i) => (i.toLong, "xx", s) }
    val got = bucketsOf(rows)
    // reference: cumulative over distinct sorted scores
    val n = scores.size
    val hist = scores.groupBy(identity).view.mapValues(_.size).toSeq.sortBy(_._1)
    val cum = hist.scanLeft((0L, 0)) { case ((_, acc), (s, c)) => (s, acc + c) }.tail
    val cut1 = cum.collectFirst { case (s, c) if c * 3 >= n => s }.get
    val cut2 = cum.collectFirst { case (s, c) if c * 3 >= 2 * n => s }.get
    rows.foreach { case (id, _, s) =>
      val exp = if (s <= cut1) 1 else if (s <= cut2) 2 else 3
      assert(got(id) == exp, s"doc $id score $s: got ${got(id)}, want $exp")
    }
  }
}
