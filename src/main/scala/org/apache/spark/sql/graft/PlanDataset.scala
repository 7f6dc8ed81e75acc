package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to the `private[sql]` `Dataset.ofRows`: optimizer-rule code
  * (BinnedRangeJoinRule's bin-width derivation probe) needs to execute
  * a small statistics query expressed as a LogicalPlan it already
  * holds; this is the supported way to lift one into a DataFrame.
  */
object PlanDataset {
  def ofRows(spark: org.apache.spark.sql.SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
