package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions._

/** Star-schema builder: the reference's six `INSERT … SELECT [DISTINCT]
  * … WHERE … ON CONFLICT DO NOTHING` statements
  * (reference `IowaLiquor-RDS.session.sql:75-182`) as DataFrame
  * pipelines (SURVEY.md §2.4, §3.3).
  *
  * Scale notes (100 TB): every dim derivation is
  * project → filter → hash-aggregate — partial aggregation runs
  * map-side, so the shuffle carries only distinct keys (tiny for real
  * dimensions). FK audits broadcast the dim side; the fact table never
  * shuffles for them.
  */
object Star {

  /** D1 + P4 + P5: distinct projection of non-null-keyed rows — the
    * shape of every dimension insert (e.g. dim_store,
    * reference `IowaLiquor-RDS.session.sql:85-94`).
    */
  def dim(base: DataFrame, key: String, cols: String*): DataFrame =
    base.select((key +: cols).map(col).toIndexedSeq: _*)
      .where(col(key).isNotNull)
      .distinct()

  /** dim_date derivation (reference `IowaLiquor-RDS.session.sql:104-126`):
    * date_trunc-to-day (F3), year/quarter/month (F4-F6), PG-convention
    * day-of-week (F7), weekend flag (F8).
    */
  def dimDate(base: DataFrame, tsCol: String): DataFrame = {
    val d = to_date(col(tsCol))
    base.where(col(tsCol).isNotNull)
      .select(
        d.as("date"),
        year(d).as("year"),
        quarter(d).as("quarter"),
        month(d).as("month"),
        pgDow(d).as("day_of_week"),
        isWeekend(d).as("is_weekend"))
      .distinct()
  }

  /** D2: conflict-ignoring append (`ON CONFLICT (pk) DO NOTHING`,
    * reference `IowaLiquor-RDS.session.sql:94,...,182`): dedup the batch
    * on the key, then keep only rows whose key is absent from
    * `existing`. PG keeps the first arriving row; Spark's
    * `dropDuplicates` keeps an arbitrary row per key — set-equal on the
    * keys, documented in SURVEY.md §7.4 risk 2. The anti-join
    * broadcasts whichever side is under the broadcast threshold;
    * at scale, `existing` should be the keys-only projection.
    */
  def conflictIgnoreAppend(newRows: DataFrame, existing: DataFrame, keys: Seq[String]): DataFrame = {
    val existingKeys = existing.select(keys.map(col).toIndexedSeq: _*).distinct()
    newRows
      .dropDuplicates(keys)
      .join(existingKeys, keys, "left_anti")
  }

  /** J1 violation audit: fact rows whose FK has no match in the dim
    * (Postgres would reject these at insert,
    * reference `IowaLiquor-RDS.session.sql:68-72`). Dim side is
    * broadcast — keys-only projection keeps the broadcast tiny even
    * for big dimensions.
    */
  def fkViolations(fact: DataFrame, dimTable: DataFrame, factKey: String, dimKey: String): DataFrame =
    fact.join(
      broadcast(dimTable.select(col(dimKey).as(factKey)).distinct()),
      Seq(factKey), "left_anti")

  /** J1 retention: keep only fact rows whose FK resolves (left-semi). */
  def fkRetain(fact: DataFrame, dimTable: DataFrame, factKey: String, dimKey: String): DataFrame =
    fact.join(
      broadcast(dimTable.select(col(dimKey).as(factKey)).distinct()),
      Seq(factKey), "left_semi")

  /** D3: PK-uniqueness audit — keys appearing more than once
    * (reference `include/sql/create_table.sql:2` PRIMARY KEY contract).
    */
  def pkDuplicates(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col).toIndexedSeq: _*)
      .agg(count(lit(1)).as("n"))
      .where(col("n") > 1)
}
