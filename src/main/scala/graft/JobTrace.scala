package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Measurement tool (guide §1): histogram of Spark job call sites for
  * one query — answers "where do the N jobs of an overhead-dominated
  * query come from" without the UI. Warm-up first (mirrors Bench),
  * then one traced run printing callSite.short counts sorted by
  * frequency, plus total wall.
  *
  * Usage: SPARK_GRAFT_BENCH_ONLY=q158 runMain graft.JobTrace
  */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sites = mutable.Map.empty[String, Int].withDefaultValue(0)
    val on = new java.util.concurrent.atomic.AtomicBoolean(false)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        if (on.get()) {
          // first in-repo frame of the job's last stage's call-site
          // stack; falls back to the stage name (Spark-internal jobs)
          val site = j.stageInfos.lastOption.map { si =>
            si.details.linesIterator
              .find(l => l.contains("graft.") && !l.contains("JobTrace"))
              .map(_.trim.stripPrefix("at "))
              .getOrElse(si.name)
          }.getOrElse("<none>")
          sites.synchronized { sites(site) += 1 }
        }
    })
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.exists(n.startsWith)) }
    for ((name, fn) <- selected)
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[trace] warmup $name failed: ${e.getMessage}")
      }
    for ((name, fn) <- selected) {
      sites.clear()
      on.set(true)
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[trace] $name failed: ${e.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graft.ListenerDrain.drain(spark)
      on.set(false)
      System.err.println(f"[trace] ==== $name $dt%.2f s, ${sites.values.sum} jobs ====")
      sites.toSeq.sortBy(-_._2).foreach { case (s, n) =>
        System.err.println(f"[trace] $n%5d  $s")
      }
    }
    spark.stop()
  }
}
