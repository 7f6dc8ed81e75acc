package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs = (0L until 1000L).map(i => (i, s"s${i % 3}")).toDF("id", "stratum")

  test("stratifiedExact takes ceil(fraction*n) per stratum, deterministically") {
    val sampled = Sampling.stratifiedExact(docs, col("stratum"), col("id"), 0.1)
    val got = sampled.groupBy("stratum").count().as[(String, Long)].collect().toMap
    // strata sizes: s0=334, s1=333, s2=333 -> ceil(0.1*n) = 34, 34, 34
    assert(got == Map("s0" -> 34L, "s1" -> 34L, "s2" -> 34L))
    // deterministic: same rows every run
    val a = sampled.select("id").as[Long].collect().sorted.toSeq
    val b = Sampling.stratifiedExact(docs, col("stratum"), col("id"), 0.1)
      .select("id").as[Long].collect().sorted.toSeq
    assert(a == b)
  }

  test("hashSplit is disjoint, exhaustive, ratio-correct, and stable") {
    val split = Sampling.hashSplit(docs, col("id"),
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
    assert(split.count() == 1000) // exhaustive, no dup/drop
    val counts = split.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts("train") > 700 && counts("train") < 900)
    assert(counts("val") > 50 && counts("val") < 160)
    // stable under repartitioning: per-id assignment identical
    val a = split.select("id", "split").as[(Long, String)].collect().toMap
    val b = Sampling.hashSplit(docs.repartition(7), col("id"),
        Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(a == b)
  }

  test("hashSplit routes every bucket (boundary buckets included)") {
    // ids covering all 100 buckets: check split boundaries respected
    val big = (0L until 20000L).toDF("id")
    val withBucket = Sampling.hashSplit(big, col("id"),
        Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .withColumn("bucket", pmod(xxhash64(col("id")), lit(100)))
    val bad = withBucket.where(
      (col("bucket") < 80 && col("split") =!= "train") ||
      (col("bucket") >= 80 && col("bucket") < 90 && col("split") =!= "val") ||
      (col("bucket") >= 90 && col("split") =!= "test")).count()
    assert(bad == 0)
  }

  test("tokenBudgetSample takes docs in order until the budget crosses") {
    val docs = Seq(
      ("en", 1L, 400L), ("en", 2L, 500L), ("en", 3L, 200L), ("en", 4L, 50L),
      ("fr", 10L, 2000L), ("fr", 11L, 1L), // first doc overshoots alone
      ("de", 20L, 999L), ("de", 21L, 1L), ("de", 22L, 1L) // exact boundary
    ).toDF("lang", "doc_id", "n_tokens")
    val kept = Sampling.tokenBudgetSample(
        docs, col("lang"), col("doc_id"), col("n_tokens"), 1000L)
      .select("doc_id").as[Long].collect().toSet
    // en: 400+500 = 900 < 1000 -> doc 3 crosses (kept), doc 4 sees 1100 -> out
    // fr: first doc always kept, second sees 2000 -> out
    // de: 999+1 = 1000 -> next sees budget exactly spent -> out
    assert(kept == Set(1L, 2L, 3L, 10L, 20L, 21L))
  }

  test("tokenBudgetSample per-stratum budgets, zero drops the stratum") {
    val docs = Seq(
      ("code", 1L, 10L), ("code", 2L, 10L),
      ("web", 10L, 10L), ("web", 11L, 10L),
      ("spam", 20L, 1L)
    ).toDF("lang", "doc_id", "n_tokens")
    val kept = Sampling.tokenBudgetSample(
        docs, col("lang"), col("doc_id"), col("n_tokens"),
        Map("code" -> 20L, "spam" -> 0L), defaultBudget = 10L)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 10L)) // code: both; web: default 10 -> one; spam: none
  }

  test("perGroupCap keeps the k smallest (priority, id) per group, full rows") {
    val capped = Sampling.perGroupCap(docs, col("stratum"), col("id"),
      col("id"), k = 5)
    // per group: exactly 5, and exactly the 5 smallest ids
    val byG = capped.select("stratum", "id").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byG.keySet == Set("s0", "s1", "s2"))
    byG.foreach { case (g, ids) =>
      val off = g.drop(1).toLong
      assert(ids == (0 until 5).map(i => off + 3L * i).toSet, s"$g -> $ids")
    }
    // full row schema survives the semi-join
    assert(capped.columns.toSeq == Seq("id", "stratum"))
    // a group smaller than k keeps everything
    val tiny = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "stratum")
    assert(Sampling.perGroupCap(tiny, col("stratum"), col("id"), col("id"), 5)
      .count() == 3)
  }

  test("perGroupCap excludes null/NaN priorities instead of aborting") {
    val withNulls = Seq(
      (1L, "a", Some(1.0)), (2L, "a", None), (3L, "a", Some(Double.NaN)),
      (4L, "a", Some(0.5))
    ).toDF("id", "stratum", "prio")
    val kept = Sampling.perGroupCap(withNulls, col("stratum"), col("id"),
        col("prio"), k = 1)
      .select("id").as[Long].collect().toSeq
    assert(kept == Seq(4L), kept) // lowest non-null priority wins; 2/3 never rank
  }

  test("perGroupCap priority column need not be the id (hash-order pick)") {
    // priority = id descending picks the LARGEST ids
    val capped = Sampling.perGroupCap(docs, col("stratum"), col("id"),
      -col("id"), k = 2)
    val ids = capped.select("id").as[Long].collect().toSet
    assert(ids == Set(999L, 996L, 997L, 994L, 998L, 995L), ids)
  }

  test("leakageSafeSplit co-locates normalized duplicates") {
    val texts = Seq(
      (1L, "Hello World"), (2L, "hello   world"), (3L, " HELLO WORLD "),
      (4L, "something else"), (5L, "SOMETHING ELSE")
    ) ++ (100L until 200L).map(i => (i, s"unique doc number $i"))
    val split = Sampling.leakageSafeSplit(texts.toDF("doc_id", "text"),
        col("doc_id"), col("text"),
        Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(split.size == 105) // exhaustive, no dup/drop
    assert(Set(split(1L), split(2L), split(3L)).size == 1, "group A split")
    assert(Set(split(4L), split(5L)).size == 1, "group B split")
    assert(split.values.toSet.subsetOf(Set("train", "val", "test")))
  }

  test("leakageSafeSplit routes each group by its min-id representative") {
    val df = Seq((7L, "dup text"), (3L, "dup  TEXT"), (9L, "solo")).toDF("doc_id", "text")
    val got = Sampling.leakageSafeSplit(df, col("doc_id"), col("text"),
        Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .select("doc_id", "rep", "split").as[(Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(7L)._2 == 3L && got(3L)._2 == 3L && got(9L)._2 == 9L)
    // the group's split equals hashSplit of the representative id
    val repSplit = Sampling.hashSplit(Seq(3L).toDF("id"), col("id"),
        Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .select("split").as[String].collect().head
    assert(got(7L)._3 == repSplit && got(3L)._3 == repSplit)
  }

  test("curriculumOrder: phases partition by thresholds, best data streams last") {
    val docs = (0L until 20L).map(i => (i, i / 20.0)).toDF("doc_id", "q")
    val got = Sampling.curriculumOrder(docs, "doc_id", "q",
        phaseThresholds = Seq(0.25, 0.75))
      .orderBy("doc_id")
      .as[(Long, Double, Int, Long, Long)].collect().toSeq
    // phase = count of thresholds cleared (boundaries are >=)
    got.foreach { case (_, q, p, _, _) =>
      val expect = (if (q >= 0.25) 1 else 0) + (if (q >= 0.75) 1 else 0)
      assert(p == expect, s"q=$q phase=$p")
    }
    // stream positions are a 0-based total order, phases in ascending blocks
    val byPos = got.sortBy(_._5)
    assert(byPos.map(_._5) == (0L until 20L))
    assert(byPos.map(_._3) == byPos.map(_._3).sorted)
    // within a phase the order follows the bijective shuffle key, not doc_id
    val p1 = byPos.filter(_._3 == 1)
    assert(p1.map(_._4) == p1.map(_._4).sorted)
    assert(p1.map(_._1) != p1.map(_._1).sorted, "must not degenerate to id order")
    // every doc keeps exactly one row
    assert(got.map(_._1) == (0L until 20L))
  }

  test("curriculumOrder: bounds — unsorted thresholds and even multipliers reject") {
    val docs = Seq((1L, 0.5)).toDF("doc_id", "q")
    intercept[IllegalArgumentException](
      Sampling.curriculumOrder(docs, "doc_id", "q", Seq(0.9, 0.1)))
    intercept[IllegalArgumentException](
      Sampling.curriculumOrder(docs, "doc_id", "q", Seq.empty))
    intercept[IllegalArgumentException](
      Sampling.curriculumOrder(docs, "doc_id", "q", Seq(0.5), mult = 2654435762L))
  }
}
