package graft.engine

import graft.SparkSpecBase
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** End-to-end Iowa parity on the REAL 24-column schema with the
  * representative rows FIXTURES.md A.2 calls for: an unparseable date,
  * a non-numeric pack, a null store, and a duplicated invoice_line_no.
  */
class IowaStarSpec extends SparkSpecBase {

  /** Raw rows (all strings except nothing — raw schema parses date at
    * the transform here). Column order follows IowaSchema.raw.
    */
  private def rawRow(
      inv: String, date: String, store: String, storeName: String,
      itemno: String, vendor: String, category: String, pack: String,
      dollars: String): Row =
    Row(inv, date, store, storeName, "addr", "city", "50309", "POINT(0 0)",
      "77", "Polk", category, s"cat-$category", vendor, s"vnd-$vendor",
      itemno, s"item-$itemno", pack, "750", "5.00", "7.50", "6", dollars,
      "4.500", "1.189")

  private def raw: DataFrame = {
    val rows = Seq(
      rawRow("INV1", "2024-03-15 10:00:00", "S1", "Store One", "I1", "V1", "C1", "12", "90.00"),
      rawRow("INV2", "not-a-date", "S1", "Store One", "I1", "V1", "C1", "twelve", "45.00"),
      rawRow("INV3", "2024-03-16 09:00:00", null, "No Store", "I2", "V1", "C1", "6", "30.00"),
      rawRow("INV3", "2024-03-16 09:00:00", "S2", "Store Two", "I2", "V2", "C2", "6", "30.00"),
      rawRow("INV4", "2024-03-17 12:00:00", "S2", "Store Two", "I2", "V2", "C2", "6", "30.00"))
    val strSchema = org.apache.spark.sql.types.StructType(
      IowaSchema.raw.fields.map(_.copy(dataType = org.apache.spark.sql.types.StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), strSchema)
  }

  test("clean: reference coercion semantics on the 24-column table") {
    val cleaned = IowaStar.clean(raw)
    assert(cleaned.schema("date").dataType.typeName == "timestamp")
    val inv2 = cleaned.where(col("invoice_line_no") === "INV2").collect()(0)
    assert(inv2.isNullAt(inv2.fieldIndex("date")))  // bad date -> NULL
    assert(inv2.getAs[Int]("pack") == 0)            // "twelve" -> 0
    assert(inv2.getAs[java.math.BigDecimal]("sale_dollars").toPlainString == "45.00")
  }

  test("dims: distinct, null-keyed rows excluded, correct column sets") {
    val base = IowaStar.clean(raw)
    val stores = IowaStar.dimStore(base)
    assert(stores.columns.toSeq == Seq("store", "name", "address", "city",
      "zipcode", "store_location", "county_number", "county"))
    assert(stores.select("store").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("S1", "S2")) // null store filtered; duplicates collapsed
    assert(IowaStar.dimVendor(base).count() == 2)
    assert(IowaStar.dimCategory(base).count() == 2)
    // I1 has two attribute variants (pack 12, and the coerced pack 0) —
    // DISTINCT keeps both; the reference's ON CONFLICT (itemno) collapses
    // them at insert time, modeled by conflictIgnoreAppend on the key.
    val items = IowaStar.dimItem(base)
    assert(items.count() == 3)
    assert(Star.conflictIgnoreAppend(items, items.limit(0), Seq("itemno")).count() == 2)
    val dates = IowaStar.dimDate(base).orderBy("date").collect()
    assert(dates.length == 3) // INV2's null date dropped
    assert(dates.map(_.getAs[Int]("day_of_week")).toSeq == Seq(5, 6, 0)) // Fri,Sat,Sun (PG DOW)
    assert(dates.map(_.getAs[Boolean]("is_weekend")).toSeq == Seq(false, true, true))
  }

  test("fact + ON CONFLICT: duplicate invoice_line_no resolved, audit clean") {
    val base = IowaStar.clean(raw)
    val fact = IowaStar.factSales(base)
    assert(fact.count() == 5) // projection keeps all non-null-PK rows
    val loaded = Star.conflictIgnoreAppend(fact,
      fact.limit(0), Seq("invoice_line_no"))
    assert(loaded.count() == 4) // INV3 duplicate collapsed to one row
    val audit = IowaStar.fkAudit(loaded,
      IowaStar.dimStore(base), IowaStar.dimDate(base).select(col("date")),
      IowaStar.dimItem(base), IowaStar.dimVendor(base), IowaStar.dimCategory(base))
    assert(audit.values.forall(_ == 0L), s"audit: $audit")
  }
}
