package graft.engine

import java.nio.file.Files

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** `Pipeline.writeBucketedTable`'s 100 TB claim is "repeated joins on
  * the bucket keys skip the shuffle entirely" — this spec makes the
  * claim checkable: two tables bucketed on the same key and bucket
  * count must sort-merge join with ZERO shuffle exchanges in the
  * executed plan, and the join output must match the plain join.
  */
class BucketedTableSpec extends SparkSpecBase {
  import spark.implicits._

  test("co-bucketed tables join with no shuffle exchange") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.sources.bucketing.enabled"
    ).map(k => k -> conf.getOption(k))
    // managed tables live in the session warehouse; DROP TABLE below
    // removes their data
    val (tf, td) = (s"bt_fact_${System.nanoTime()}", s"bt_dim_${System.nanoTime()}")
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.sources.bucketing.enabled", "true")
      val fact = (1 to 5000).map(i => (i.toLong % 97, s"f$i")).toDF("k", "fv")
      val dim = (0 to 96).map(i => (i.toLong, s"d$i")).toDF("k", "dv")
      Pipeline.writeBucketedTable(fact, tf, Seq("k"), numBuckets = 8)
      Pipeline.writeBucketedTable(dim, td, Seq("k"), numBuckets = 8)
      val joined = spark.table(tf).join(spark.table(td), "k")
      assert(joined.count() == 5000)
      // correctness vs the plain (shuffled) join
      val plain = fact.join(dim, "k").agg(sum(col("k"))).head().getLong(0)
      val bucketed = joined.agg(sum(col("k"))).head().getLong(0)
      assert(bucketed == plain)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"co-bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a non-broadcast join over bucketed scans:\n$plan")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tf")
      spark.sql(s"DROP TABLE IF EXISTS $td")
      saved.foreach { case (k, v) =>
        v match { case Some(x) => conf.set(k, x); case None => conf.unset(k) }
      }
    }
  }
}
