package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions._

/** Transform-stage parity: the reference's `_clean_chunk`
  * (reference `src/transform.py:11-23`) re-expressed as one declarative
  * projection.
  *
  * The reference loops 285 pandas chunks serially; here the whole clean
  * is a single `select` of Column expressions — Catalyst collapses it
  * into a whole-stage-codegen'd scan→project pipeline with zero
  * shuffles, one task per parquet split. At 100 TB this stage is pure
  * map-side work and scales linearly with executors.
  */
object Clean {

  /** Column-cleaning rules for the Iowa 24-column table (FIXTURES.md A.2):
    * timestamp null-on-error (F1), numeric coerce with zero-fill (F2).
    * Applied generically: callers pass which columns get which rule.
    */
  def clean(
      df: DataFrame,
      timestampCols: Seq[String],
      intCols: Seq[String],
      moneyCols: Seq[String],
      volumeCols: Seq[String]): DataFrame = {
    val rules: Map[String, Column => Column] =
      timestampCols.map(c => c -> (coerceTimestamp(_: Column))).toMap ++
        intCols.map(c => c -> ((x: Column) => coalesce(x.try_cast(IntegerType), lit(0)))).toMap ++
        moneyCols.map(c => c -> (coerceNumeric(_: Column, DecimalType(18, 2)))).toMap ++
        volumeCols.map(c => c -> (coerceNumeric(_: Column, DecimalType(18, 3)))).toMap
    val cols = df.columns.map { c =>
      rules.get(c).map(r => r(col(c)).as(c)).getOrElse(col(c))
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** The fixture-mapped clean: lineitem plays the wide Iowa fact
    * (FIXTURES.md B): quantities → int-ish, prices → money decimals,
    * shipdate → timestamp. Matches `src/transform.py:12-21` semantics:
    * every numeric null becomes 0, dates stay null-on-error.
    */
  def cleanLineitem(df: DataFrame): DataFrame =
    clean(df,
      timestampCols = Seq("l_shipdate"),
      intCols = Seq.empty,
      moneyCols = Seq("l_extendedprice"),
      volumeCols = Seq("l_quantity", "l_discount", "l_tax"))
}
