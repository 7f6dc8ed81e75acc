package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.ScalableWindows

/** Diagnostic main (RecallProbe convention): measures the bucketed
  * two-phase prefix sum against the single-partition global window at
  * growing row counts, pinning the NOTES.md scale claim to evidence.
  * The global window is the naive formulation (`Window.orderBy` with
  * no partition — every row through ONE task); the bucketed path is
  * [[ScalableWindows.prefixSumByBucket]]. Checksums must agree —
  * both compute the same exclusive running sum.
  *
  * Run: sbt "runMain graft.PrefixSumProbe 1000000,8000000"
  */
object PrefixSumProbe {
  def main(args: Array[String]): Unit = {
    val sizes = args.headOption.map(_.split(",").map(_.toLong).toSeq)
      .getOrElse(Seq(1000000L, 8000000L))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    for (n <- sizes) {
      // deterministic synthetic: unique ids, value = id mod 977
      val df = spark.range(n).select(
        col("id"), (col("id") % 977).as("v")).cache()
      df.count()

      def checksum(run: org.apache.spark.sql.DataFrame): Long =
        run.agg(sum(expr("run % 1000000007"))).head().getLong(0)

      val (cGlobal, tGlobal) = time {
        val w = Window.orderBy(col("id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        checksum(df.withColumn("run", coalesce(sum(col("v")).over(w), lit(0L))))
      }
      val (cBucketed, tBucketed) = time {
        checksum(ScalableWindows.prefixSumByBucket(df, "id", "v", "run", 1024))
      }
      require(cGlobal == cBucketed, s"checksum mismatch at n=$n")
      println(f"n=$n%,d  global-window=$tGlobal%.2fs  " +
        f"bucketed=$tBucketed%.2fs  speedup=${tGlobal / tBucketed}%.1fx  " +
        s"checksum=$cBucketed")
      df.unpersist(blocking = false)
    }
    spark.stop()
  }
}
