package graft.engine

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Physical-layout strategies: bucketed co-located joins (no shuffle)
  * and partition pruning — asserted at the PLAN level, not just results.
  */
class LayoutSpec extends SparkSpecBase {
  import spark.implicits._

  test("bucketed tables join without any shuffle exchange") {
    val fact = (1 to 1000).map(i => (i % 100, i.toLong)).toDF("k", "v")
    val dim = (0 until 100).map(i => (i, s"attr$i")).toDF("k", "attr")
    Pipeline.writeBucketedTable(fact, "graft_fact_b", Seq("k"), 4)
    Pipeline.writeBucketedTable(dim, "graft_dim_b", Seq("k"), 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("graft_fact_b").join(spark.table("graft_dim_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString()
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == 1000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE graft_fact_b")
      spark.sql("DROP TABLE graft_dim_b")
    }
  }

  test("partitioned layout prunes directories at plan time") {
    val dir = Files.createTempDirectory("graft-part").toString + "/t"
    val df = Seq((1995, 1L, "a"), (1995, 2L, "b"), (1996, 3L, "c"), (1997, 4L, "d"))
      .toDF("year", "id", "s")
    Pipeline.writePartitioned(df, dir, Seq("year"))
    val read = spark.read.parquet(dir).where(col("year") === 1995)
    val plan = read.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters"), s"plan:\n$plan")
    assert(read.count() == 2)
    // only the matching partition directory is read
    val scanned = read.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(scanned.contains("year=1995") || plan.contains("(year#"),
      s"pruned scan expected:\n$scanned")
  }
}
