package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpecBase
import graft.engine.Tables

/** Pins the q64/q65 single-row contracts against independently computed
  * expectations at sf0.001 (the oracle re-checks them at sf0.01).
  */
class OrchestrationQueriesSpec extends SparkSpecBase {
  private val sfDir = "/root/testdata/sf0.001"

  test("q64: extract/clean preserve counts, load dedups PK, re-run loads zero") {
    val li = Tables.lineitem(spark, sfDir)
    val n = li.count()
    val nDistinct = li.select("l_orderkey", "l_linenumber").distinct().count()
    val row = OrchestrationQueries.queries("q64_pipeline_run")(spark, sfDir).head()
    assert(row.getLong(row.fieldIndex("extracted")) == n)
    assert(row.getLong(row.fieldIndex("cleaned")) == n)
    assert(row.getLong(row.fieldIndex("loaded_first")) == nDistinct)
    assert(row.getLong(row.fieldIndex("loaded_rerun")) == 0L)
    assert(row.getLong(row.fieldIndex("table_rows")) == nDistinct)
  }

  test("q65: NULL and empty string survive the CSV round-trip as distinct values") {
    val c = Tables.customer(spark, sfDir)
    val exp = c.agg(
      count(lit(1)).as("n_rows"),
      count(when(col("c_custkey") % 7 =!= 0, col("c_name"))).as("n_name"),
      sum(when(col("c_custkey") % 11 === 0, 1L).otherwise(0L)).as("n_empty_seg"),
      count(when(col("c_custkey") % 11 === 0 || col("c_mktsegment").isNotNull,
        lit(1))).as("n_seg"),
      sum(col("c_custkey")).as("key_sum"),
      sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("bal_sum")
    ).head()
    val got = OrchestrationQueries.queries("q65_csv_null_roundtrip")(spark, sfDir).head()
    Seq("n_rows", "n_name", "n_empty_seg", "n_seg", "key_sum").foreach { f =>
      assert(got.getLong(got.fieldIndex(f)) == exp.getLong(exp.fieldIndex(f)),
        s"field $f")
    }
    assert(got.getDouble(got.fieldIndex("bal_sum")) ==
      exp.getDouble(exp.fieldIndex("bal_sum")))
  }
}
