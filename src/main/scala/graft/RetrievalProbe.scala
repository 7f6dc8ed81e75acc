package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement probe (guide §1): which component of the BM25 path
  * burns the executor CPU — the scan, the tokenizer, the tf kernel,
  * the postings explode, or the ranking? Times each slice with the
  * noop sink and reports wall + summed executor CPU, min of 3 after a
  * warm-up.
  */
object RetrievalProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cpuMs = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) cpuMs.addAndGet(t.taskMetrics.executorRunTime)
    })
    val docs = graft.engine.Tables.documents(spark, sfDir)
    def time(tag: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      mk.write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to 3).map { _ =>
        org.apache.spark.graft.ListenerDrain.drain(spark)
        cpuMs.set(0)
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        org.apache.spark.graft.ListenerDrain.drain(spark)
        (dt, cpuMs.get / 1000.0)
      }
      val best = ts.minBy(_._1)
      System.err.println(f"[retprobe] $tag%-24s ${best._1}%7.3f s wall  ${best._2}%7.1f cpu-s")
    }
    val toks = graft.engine.Tables.fanOut(spark, docs)
      .select(col("doc_id").cast("long").as("doc"),
        graft.ops.TextOps.tokens(col("text")).as("w"))
    time("scan")(docs.select("text"))
    time("fanout-scan")(graft.engine.Tables.fanOut(spark, docs).select("text"))
    time("tokens")(toks)
    time("tokens+size")(toks.withColumn("dl", size(col("w"))))
    time("termfreqs")(toks.select(col("doc"),
      explode(graft.functions.termFreqsNative(col("w"))).as("p")))
    time("stats-agg")(toks.withColumn("dl", size(col("w")))
      .agg(count(lit(1)), sum(col("dl").cast("long"))))
    val q = docs.where(col("doc_id") < 20)
    time("bm25-full")(graft.ops.Retrieval.bm25TopK(
      docs, "doc_id", "text", q, "doc_id", "text", 10))
    // decomposed bm25 internals
    val docToks = graft.engine.Tables.fanOut(spark, docs)
      .select(col("doc_id").cast("long").as("doc"),
        graft.ops.TextOps.tokens(col("text")).as("w"))
      .withColumn("dl", size(col("w")))
    val postings = docToks
      .select(col("doc"), col("dl"),
        explode(graft.functions.termFreqsNative(col("w"))).as("p"))
      .select(col("doc"), col("dl"), col("p.term").as("term"),
        col("p.tf").as("tf"))
    val qTerms = q.select(col("doc_id").cast("long").as("query_id"),
      explode(array_distinct(graft.ops.TextOps.tokens(col("text")))).as("term"))
    time("postings")(postings)
    time("matched")(postings.join(
      broadcast(qTerms.select("term").distinct()), Seq("term"), "left_semi"))
    val matched = postings.join(
      broadcast(qTerms.select("term").distinct()), Seq("term"), "left_semi")
    time("dfreq")(matched.groupBy("term").agg(count(lit(1)).as("df")))
    val dfreq = matched.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = docToks.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl").cast("long")).cast("double") /
        count(lit(1)).cast("double")).as("avgdl"))
    val scored = matched
      .join(broadcast(dfreq), Seq("term"))
      .join(broadcast(qTerms), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("idf", log(lit(1.0) +
        (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5))))
      .withColumn("s6", floor(col("idf") *
        (col("tf").cast("double") * lit(2.2) /
          (col("tf").cast("double") + lit(1.2) * (lit(0.25) +
            lit(0.75) * col("dl").cast("double") / col("avgdl")))) *
        lit(1000000.0)))
    time("scored")(scored)
    time("perdoc")(scored.groupBy("query_id", "doc")
      .agg(sum(col("s6")).as("score6")))
    // isolate: does the aggregate or the semi-join pay for the key type?
    time("gb-tokens")(toks.select(explode(col("w")).as("t"))
      .groupBy("t").agg(count(lit(1))))
    time("gb-termfreqs")(postings.groupBy("term").agg(count(lit(1))))
    time("dfreq-nosemi")(postings.groupBy("term").agg(count(lit(1)).as("df")))
    time("matched-gb")(matched.groupBy("doc").agg(count(lit(1))))
    // metric sanity: synthetic same-cardinality aggregates with no text
    time("range-gb")(spark.range(275000L)
      .groupBy(pmod(col("id"), lit(5000)).as("g")).agg(count(lit(1))))
    time("range-gb-str")(spark.range(275000L)
      .select(concat(lit("tok"), pmod(col("id"), lit(5000))).as("g"))
      .groupBy("g").agg(count(lit(1))))
    spark.stop()
  }
}
