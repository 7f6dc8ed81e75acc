package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** AQE skew-join handling: with thresholds scaled to test data, a
  * skewed sort-merge join partition is split at runtime — the built-in
  * complement to explicit salting (ops.Skew) for keys discovered
  * skewed only at execution time.
  */
class AqeSkewSpec extends SparkSpecBase {
  import spark.implicits._

  test("AQE splits a skewed sort-merge join partition at runtime") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold"
    ).map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // key 1 carries 50k fat rows; keys 2..40 one row each
      val big = ((1 to 50000).map(i => (1, s"payload_$i" * 8)) ++
        (2 to 40).map(k => (k, "x"))).toDF("k", "payload")
      val dim = (1 to 40).map(k => (k, s"dim$k")).toDF("k", "attr")
      val joined = big.join(dim, "k")
      // execute THIS DataFrame so its own AQE plan finalizes (count()
      // would execute a different QueryExecution)
      assert(joined.collect().length == 50039) // correctness under the split
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isSkew=true") || plan.contains("skew="),
        s"no skew split marker in final plan:\n$plan")
    } finally saved.foreach { case (k, v) =>
      v match { case Some(x) => conf.set(k, x); case None => conf.unset(k) }
    }
  }
}
