package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the scale-pattern operators: each optimized
  * formulation must be row-identical to its naive reference
  * formulation on randomized inputs (fixed seeds — same offline
  * raw-ScalaCheck pattern as CoercionProperties).
  */
class OpsProperties extends SparkSpecBase {
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i =>
      g(Gen.Parameters.default.withSize(20), Seed(seed + i)))

  test("binnedRangeJoin ≡ naive theta join on random intervals/points/widths") {
    val pts = sample(Gen.choose(-500L, 1500L), 300, 7L)
      .zipWithIndex.map { case (x, i) => (i.toLong, x) }
    val ivs = sample(Gen.zip(Gen.choose(-600L, 1600L), Gen.choose(-50L, 400L)), 60, 99L)
      .zipWithIndex.map { case ((s, w), i) => (i.toLong, s, s + w) } // some empty/negative
    val p = pts.toDF("pid", "x")
    val iv = ivs.toDF("iid", "s", "e")
    val naive = p.crossJoin(iv)
      .where(col("x") >= col("s") && col("x") < col("e"))
      .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
    for (w <- Seq(3L, 17L, 101L, 997L)) {
      val got = RangeJoin.binnedRangeJoin(p, "x", iv, "s", "e", w)
        .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
      assert(got == naive, s"binWidth=$w diverged")
    }
  }

  test("TopK aggregator ≡ window ranking on random data with heavy ties") {
    val rows = sample(Gen.zip(Gen.choose(0, 9), Gen.choose(0.0, 5.0)), 500, 13L)
      .zipWithIndex.map { case ((g, v), i) =>
        (s"g$g", math.round(v * 2) / 2.0, i.toLong) } // half-step values: many ties
    val df = rows.toDF("g", "v", "id")
    for (k <- Seq(1, 4, 50)) {
      val agg = df.groupBy("g").agg(TopK.topK(k)(col("v"), col("id")).as("top"))
        .select(col("g"), explode(col("top")))
        .select(col("g"), col("col.value"), col("col.key"))
        .as[(String, Double, Long)].collect().sorted.toSeq
      val w = Window.partitionBy("g").orderBy(col("v").desc, col("id"))
      val win = df.withColumn("r", row_number().over(w)).where(col("r") <= k)
        .select(col("g"), col("v"), col("id"))
        .as[(String, Double, Long)].collect().sorted.toSeq
      assert(agg == win, s"k=$k diverged")
    }
  }

  test("hashSplit partitions are a function: same id never lands in two splits") {
    val ids = sample(Gen.choose(Long.MinValue, Long.MaxValue), 400, 23L)
    val df = (ids ++ ids).toDF("id") // duplicated ids across partitions
    val splits = Sampling.hashSplit(df.repartition(8), col("id"),
        Seq("a" -> 50, "b" -> 30, "c" -> 20))
      .groupBy("id").agg(countDistinct(col("split")).as("n"))
      .where(col("n") > 1).count()
    assert(splits == 0)
  }

  test("chunk+BFD packing invariants hold on random doc sizes") {
    val sizes = sample(Gen.choose(0L, 3000L), 400, 21L)
      .zipWithIndex.map { case (n, i) => (i.toLong, n) }
    val docs = sizes.toDF("doc_id", "n_tokens").repartition(4)
    for (budget <- Seq(512L, 1024L, 4096L)) {
      val chunks = Packing.chunkOversized(docs, "doc_id", "n_tokens", budget)
        .select((col("doc_id") * lit(1L << 32) + col("chunk")).as("cid"), col("n_tokens"))
      val packed = Packing.packBestFitDecreasing(chunks, "cid", "n_tokens", budget)
      // zero overflow, ever (chunking guarantees every row fits)
      val over = packed.groupBy("seq_id").agg(sum("n_tokens").as("t"))
        .where(col("t") > budget).count()
      assert(over == 0, s"budget=$budget overflowed")
      // token mass and chunk count conserved
      assert(packed.agg(sum("n_tokens")).head().getLong(0) == sizes.map(_._2).sum,
        s"budget=$budget lost mass")
      assert(packed.select("doc_id").distinct().count() == chunks.count(),
        s"budget=$budget lost or duplicated chunks")
      // fill efficiency: can't use fewer sequences than ceil(mass/budget);
      // BFD within partitions stays within 2x of that floor on this data
      val nSeqs = packed.select("seq_id").distinct().count()
      val floor = (sizes.map(_._2).sum + budget - 1) / budget
      assert(nSeqs >= floor && nSeqs <= 2 * floor + 4,
        s"budget=$budget: $nSeqs seqs vs floor $floor")
    }
  }

  test("tokenBudgetSample ≡ SQL prefix-sum formulation on random strata") {
    val rows = sample(Gen.zip(Gen.choose(0, 4), Gen.choose(1L, 700L)), 300, 33L)
      .zipWithIndex.map { case ((s, n), i) => (s"s$s", i.toLong, n) }
    val df = rows.toDF("stratum", "id", "n_tokens")
    for (budget <- Seq(1L, 1000L, 100000L)) {
      val got = Sampling.tokenBudgetSample(
          df, col("stratum"), col("id"), col("n_tokens"), budget)
        .select("id").as[Long].collect().sorted.toSeq
      // reference: per-stratum running total in plain Scala
      val exp = rows.groupBy(_._1).values.flatMap { g =>
        g.sortBy(_._2).scanLeft((0L, -1L)) { case ((tot, _), (_, id, n)) =>
          (tot + n, id)
        }.tail.zip(g.sortBy(_._2))
          .collect { case ((totAfter, id), (_, _, n)) if totAfter - n < budget => id }
      }.toSeq.sorted
      assert(got == exp, s"budget=$budget diverged")
    }
  }
}
