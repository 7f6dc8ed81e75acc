package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{AnalyticsQueries, OrchestrationQueries, ParityQueries, PipelineQueries, ScaleQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query modules register here; every `queries` key with SQL-expressible
  * semantics has a DuckDB oracle in `oracleSql` (same column names, same
  * total order — the driver sorts columns by name and hashes values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ParityQueries.starRevenue(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ParityQueries.queries ++ PipelineQueries.queries ++
      AnalyticsQueries.queries ++ ScaleQueries.queries ++
      OrchestrationQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ParityQueries.oracleSql ++ PipelineQueries.oracleSql ++
      AnalyticsQueries.oracleSql ++ ScaleQueries.oracleSql ++
      OrchestrationQueries.oracleSql
}
