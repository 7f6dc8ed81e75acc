package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement probe (guide §1): is the TopK udaf Aggregator the hot
  * part of the candidate-ranking stages, or the pair-dot? Times three
  * aggregations over the same synthetic candidate stream (2k groups ×
  * 1k rows): plain max (codegen HashAggregate floor), TopK, and
  * TopKDistinct. Min of 3 passes each, after a warm-up.
  */
object TopKProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.TopK
    val df = spark.range(2000L * 1000L).select(
      (col("id") % 2000L).as("g"),
      (pmod(hash(col("id")), lit(100000)) / lit(1000.0)).as("v"),
      col("id").as("k")).localCheckpoint(true)
    def time(tag: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      System.err.println(f"[topkprobe] $tag%-14s ${ts.min}%6.3f s (min of 3)")
    }
    // warm-up
    df.groupBy("g").agg(max("v")).write.format("noop").mode("overwrite").save()
    df.groupBy("g").agg(TopK.topK(5)(col("v"), col("k"))).write
      .format("noop").mode("overwrite").save()
    df.groupBy("g").agg(TopK.topKDistinct(5)(col("v"), col("k"))).write
      .format("noop").mode("overwrite").save()
    time("max")(df.groupBy("g").agg(max("v")))
    time("topK")(df.groupBy("g").agg(TopK.topK(5)(col("v"), col("k"))))
    time("topKDistinct")(
      df.groupBy("g").agg(TopK.topKDistinct(5)(col("v"), col("k"))))
    // r17: native primitive-buffer TopKAgg vs the legacy encoder udaf,
    // small-k and the loose large-k regime
    time("topKLegacy")(
      df.groupBy("g").agg(TopK.topKLegacy(5)(col("v"), col("k"))))
    time("topKDistLeg")(
      df.groupBy("g").agg(TopK.topKDistinctLegacy(5)(col("v"), col("k"))))
    time("topK500")(df.groupBy("g").agg(TopK.topK(500)(col("v"), col("k"))))
    time("topK500Leg")(
      df.groupBy("g").agg(TopK.topKLegacy(500)(col("v"), col("k"))))
    spark.stop()
  }
}
