package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's six star-schema builders, by name, over the real
  * Iowa 24-column table — a user of the reference maps each
  * `INSERT … SELECT [DISTINCT] … WHERE … ON CONFLICT DO NOTHING`
  * statement (reference `IowaLiquor-RDS.session.sql:75-182`) onto the
  * same-named function here. `clean` is the transform-stage coercion
  * (reference `src/transform.py:11-23`).
  */
object IowaStar {

  /** Transform stage over the raw extract — F1/F2 coercions with the
    * reference's exact semantics (bad date → NULL, bad number → 0).
    */
  def clean(raw: DataFrame): DataFrame =
    Clean.clean(raw,
      timestampCols = Seq("date"),
      intCols = IowaSchema.intCols,
      moneyCols = IowaSchema.moneyCols,
      volumeCols = IowaSchema.volumeCols)

  /** dim_store — `IowaLiquor-RDS.session.sql:75-94`. */
  def dimStore(base: DataFrame): DataFrame =
    Star.dim(base, "store", "name", "address", "city", "zipcode",
      "store_location", "county_number", "county")

  /** dim_date — `IowaLiquor-RDS.session.sql:96-128` (PG DOW, Sun=0). */
  def dimDate(base: DataFrame): DataFrame =
    Star.dimDate(base, "date")

  /** dim_item — `IowaLiquor-RDS.session.sql:130-145`. */
  def dimItem(base: DataFrame): DataFrame =
    Star.dim(base, "itemno", "im_desc", "pack", "bottle_volume_ml",
      "state_bottle_cost", "state_bottle_retail")

  /** dim_vendor — `IowaLiquor-RDS.session.sql:147-151`. */
  def dimVendor(base: DataFrame): DataFrame =
    Star.dim(base, "vendor_no", "vendor_name")

  /** dim_category — `IowaLiquor-RDS.session.sql:153-157`. */
  def dimCategory(base: DataFrame): DataFrame =
    Star.dim(base, "category", "category_name")

  /** fact_sales — `IowaLiquor-RDS.session.sql:159-182`: not-null PK
    * filter, day-grain date, measure subset. ON CONFLICT semantics are
    * applied when appending via `Star.conflictIgnoreAppend` /
    * `Pipeline.conflictIgnoringAppend` with key `invoice_line_no`.
    */
  def factSales(base: DataFrame): DataFrame =
    base.where(col("invoice_line_no").isNotNull)
      .select(
        col("invoice_line_no"),
        to_date(col("date")).as("date"),
        col("store"), col("itemno"), col("vendor_no"), col("category"),
        col("sale_bottles"), col("sale_dollars"), col("sale_liters"),
        col("sale_gallons"))

  /** FK-integrity audit of a built fact against the five dims
    * (reference `IowaLiquor-RDS.session.sql:68-72`): returns
    * (dimension name → violating-row count); all zeros = loadable.
    */
  def fkAudit(fact: DataFrame, store: DataFrame, date: DataFrame,
      item: DataFrame, vendor: DataFrame, category: DataFrame): Map[String, Long] =
    Map(
      "dim_store" -> Star.fkViolations(fact.where(col("store").isNotNull), store, "store", "store").count(),
      "dim_date" -> Star.fkViolations(fact.where(col("date").isNotNull), date, "date", "date").count(),
      "dim_item" -> Star.fkViolations(fact.where(col("itemno").isNotNull), item, "itemno", "itemno").count(),
      "dim_vendor" -> Star.fkViolations(fact.where(col("vendor_no").isNotNull), vendor, "vendor_no", "vendor_no").count(),
      "dim_category" -> Star.fkViolations(fact.where(col("category").isNotNull), category, "category", "category").count())
}
