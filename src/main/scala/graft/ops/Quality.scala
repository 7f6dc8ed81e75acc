package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit — the generalized form of the
  * reference's implicit constraints (NOT NULL key filters, PRIMARY
  * KEY uniqueness, FK integrity: reference
  * `IowaLiquor-RDS.session.sql:94,182`, `include/sql/create_table.sql:2`).
  *
  * Scale shape: ALL row-local checks (null / range / pattern) compute
  * in ONE conditional-aggregation pass over the table — adding a check
  * adds a column to the aggregate, not a scan. Uniqueness adds one
  * self-aggregation, each FK check one broadcast anti-join; results
  * union into a small (check, violations, total) report.
  */
object Quality {

  sealed trait Check { def name: String }
  /** Null values violate. */
  case class NotNull(col: String) extends Check {
    def name = s"not_null:$col"
  }
  /** Non-null values outside [lo, hi] violate (nulls are NotNull's job). */
  case class InRange(col: String, lo: Double, hi: Double) extends Check {
    def name = s"in_range:$col"
  }
  /** Non-null values not fully matching `regex` violate. */
  case class Matches(col: String, regex: String) extends Check {
    def name = s"matches:$col"
  }
  /** Rows beyond the first in each duplicate key group violate. */
  case class Unique(cols: Seq[String]) extends Check {
    def name = s"unique:${cols.mkString(",")}"
  }
  /** Non-null keys with no match in the dimension violate. */
  case class FkIn(col: String, dim: DataFrame, dimCol: String) extends Check {
    def name = s"fk:$col"
  }

  private def violationExpr(c: Check): Column = c match {
    case NotNull(col0) => col(col0).isNull
    case InRange(col0, lo, hi) =>
      col(col0).isNotNull && !col(col0).between(lo, hi)
    case Matches(col0, re) => col(col0).isNotNull && !col(col0).rlike(re)
    case _ => lit(false)
  }

  /** Run all checks; returns (chk, violations, total) rows, one per
    * check, ordered by check name.
    *
    * Fully LAZY: the report is one composed plan — no check triggers a
    * driver-side action at build time. The grand total is a single
    * shared 1-row aggregate cross-joined (broadcast) into the Unique/
    * FkIn branches, so the table is never counted once per check, and
    * all branches execute inside the one job that materializes the
    * report.
    */
  def audit(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rowLocal = checks.filter {
      case _: NotNull | _: InRange | _: Matches => true; case _ => false
    }
    lazy val totalDf = df.agg(count(lit(1)).as("__grand_total"))
    def withTotal(oneRow: DataFrame, chkName: String): DataFrame =
      oneRow.crossJoin(broadcast(totalDf))
        .select(lit(chkName).as("chk"), col("violations"),
          col("__grand_total").as("total"))
    val parts = Seq.newBuilder[DataFrame]
    if (rowLocal.nonEmpty) {
      // one pass, one counter column per check + the row total
      val aggs = count(lit(1)).as("__total") +:
        rowLocal.map(c => sum(violationExpr(c).cast("long")).as(c.name))
      val row = df.agg(aggs.head, aggs.tail: _*)
      parts += row.select(explode(array(rowLocal.map(c =>
          struct(lit(c.name).as("chk"), col(c.name).as("violations"),
            col("__total").as("total"))): _*)).as("r"))
        .select("r.chk", "r.violations", "r.total")
    }
    checks.foreach {
      case u @ Unique(cols) =>
        parts += withTotal(
          df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__n"))
            .where(col("__n") > 1)
            .agg(coalesce(sum(col("__n") - 1), lit(0L)).as("violations")),
          u.name)
      case f @ FkIn(c, dim, dimCol) =>
        parts += withTotal(
          df.where(col(c).isNotNull)
            .join(broadcast(dim.select(col(dimCol).as(c)).distinct()), Seq(c), "left_anti")
            .agg(count(lit(1)).as("violations")),
          f.name)
      case _ => ()
    }
    parts.result() match {
      case Nil => Seq.empty[(String, Long, Long)].toDF("chk", "violations", "total")
      case ps => ps.reduce(_ unionByName _).orderBy("chk")
    }
  }
}
