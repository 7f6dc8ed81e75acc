package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Measurement tool (guide §1): per-query job/stage/task counts and
  * executor-time totals alongside wall time, so overhead-dominated
  * queries (many tiny jobs) are distinguishable from compute-bound
  * ones. Methodology mirrors Bench (warm-up pass, noop sink); output
  * is one human-readable line per query on stderr.
  *
  * Usage: SPARK_GRAFT_BENCH_ONLY=q154 runMain graft.JobProfile
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // A/B experiment knob: SPARK_GRAFT_PROFILE_CONF="k=v;k=v" layers
    // extra confs over the bench baseline so hypotheses (AQE cost on
    // tiny stages, codegen, broadcast thresholds) are testable without
    // touching the benched session
    sys.env.get("SPARK_GRAFT_PROFILE_CONF").foreach {
      _.split(";").map(_.trim).filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k, v)
      }
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskTimeMs = new AtomicLong(0L)
    val gcTimeMs = new AtomicLong(0L)
    val stageWall = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        val si = s.stageInfo
        for (sub <- si.submissionTime; done <- si.completionTime)
          stageWall.add((si.name.take(60), done - sub))
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          taskTimeMs.addAndGet(m.executorRunTime)
          gcTimeMs.addAndGet(m.jvmGCTime)
        }
      }
    })
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.exists(n.startsWith)) }
    // warm-up pass (uncounted): JIT/codegen/classloading out of the numbers
    for ((name, fn) <- selected)
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[profile] warmup $name failed: ${e.getMessage}")
      }
    System.err.println(
      f"[profile] ${"query"}%-36s ${"sec"}%7s ${"jobs"}%5s ${"stages"}%6s " +
        f"${"tasks"}%6s ${"cpu_s"}%8s ${"gc_s"}%6s")
    val topStages = sys.env.get("SPARK_GRAFT_PROFILE_STAGES").exists(_ == "1")
    for ((name, fn) <- selected) {
      jobs.set(0); stages.set(0); tasks.set(0)
      taskTimeMs.set(0L); gcTimeMs.set(0L); stageWall.clear()
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[profile] $name failed: ${e.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // listener bus is async: give straggler events a moment to drain
      org.apache.spark.graft.ListenerDrain.drain(spark)
      System.err.println(
        f"[profile] $name%-36s $dt%7.2f ${jobs.get}%5d ${stages.get}%6d " +
          f"${tasks.get}%6d ${taskTimeMs.get / 1000.0}%8.1f ${gcTimeMs.get / 1000.0}%6.1f")
      if (topStages) {
        import scala.jdk.CollectionConverters._
        stageWall.asScala.toSeq.sortBy(-_._2).take(8).foreach { case (n, ms) =>
          System.err.println(f"[profile]     ${ms / 1000.0}%6.2f s  $n")
        }
      }
    }
    spark.stop()
  }
}
