package graft

import org.apache.spark.sql.SparkSession
import graft.engine.Tables
import graft.ops.Bpe

/** Diagnostic main (RecallProbe convention): pins the r9 BPE training
  * redesign to evidence for NOTES.md.
  *
  *   1. Wall-clock of driver-loop [[Bpe.merges]] vs the retained
  *      per-step-job [[Bpe.mergesDistributed]] at growing merge
  *      counts — the "one job per merge step does not survive 50k
  *      merges" claim.
  *   2. Sampled-vs-full merge-list agreement on the real fixture:
  *      merges at a cap of half the vocabulary vs the full
  *      vocabulary, nMerges = 8.
  *   3. Corpus-size independence: driver-loop training time on the
  *      documents table vs the same table unioned 4× (same cap —
  *      only the one vocabulary aggregate sees the extra rows).
  *
  * Run: sbt "runMain graft.BpeTrainProbe /root/testdata/sf0.01"
  */
object BpeTrainProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").cache()
    docs.count()

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // 1. driver loop vs per-step jobs
    for (n <- Seq(2, 4, 8)) {
      val (a, tDriver) = time(
        Bpe.merges(docs, "doc_id", "text", n).collect().toSeq)
      val (b, tJobs) = time(
        Bpe.mergesDistributed(docs, "doc_id", "text", n).collect().toSeq)
      val same = a.map(_.toString).sorted == b.map(_.toString).sorted
      println(f"merges n=$n%2d driver=$tDriver%6.2fs perStepJobs=$tJobs%6.2fs " +
        f"speedup=${tJobs / tDriver}%5.1fx identical=$same")
    }

    // 2. sampled-vs-full agreement at cap = vocab/2
    val vocabSize = docs
      .select(org.apache.spark.sql.functions.explode(
        graft.ops.TextOps.tokens(org.apache.spark.sql.functions.col("text"))).as("w"))
      .distinct().count()
    val full = Bpe.merges(docs, "doc_id", "text", 8).collect().toSeq
    val half = Bpe.merges(docs, "doc_id", "text", 8,
      vocabSampleCap = math.max(2, (vocabSize / 2).toInt)).collect().toSeq
    println(s"vocab=$vocabSize capHalf agreement=" +
      s"${full.map(_.toString) == half.map(_.toString)}")
    println("  full: " + full.map(r => s"${r.get(1)}+${r.get(2)}").mkString(" "))
    println("  half: " + half.map(r => s"${r.get(1)}+${r.get(2)}").mkString(" "))

    // 3. corpus-size independence of the training loop
    val big = (1 to 4).map(_ => docs).reduce(_ unionAll _).cache()
    big.count()
    val (_, t1) = time(Bpe.merges(docs, "doc_id", "text", 8).collect())
    val (_, t4) = time(Bpe.merges(big, "doc_id", "text", 8).collect())
    println(f"corpus 1x=$t1%6.2fs 4x=$t4%6.2fs ratio=${t4 / t1}%4.2f " +
      "(vocabulary aggregate is the only corpus-sized stage)")

    spark.stop()
  }
}
