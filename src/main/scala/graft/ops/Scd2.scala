package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2 merge — the versioned flavor of
  * the reference's conflict-ignoring dimension loads (reference
  * `IowaLiquor-RDS.session.sql:94,128,145,151,157`: `ON CONFLICT DO
  * NOTHING` keeps the first version forever; SCD2 instead closes the
  * old version and opens a new one, preserving history).
  *
  * Plan shape (one shuffle on the business key, dims ≪ facts):
  * current ⟗ incoming on the key, FULL OUTER, then per-row CASE:
  *  - key only in current → unchanged row passes through
  *  - key only in incoming → new row opens (from = asOf, to = null)
  *  - both, attributes equal → unchanged
  *  - both, attributes differ → old row closes (to = asOf),
  *    new row opens — emitted via an exploded two-element array.
  * No window functions, no iterative driver logic; the whole merge is
  * one join + one projection, partitioned by the key.
  */
object Scd2 {

  /** Merge `incoming` (the new snapshot of changed/new keys) into the
    * SCD2 `current` table.
    *
    * @param current  SCD2 state: key, attrs, `valid_from`, `valid_to`
    *                 (null = open), only OPEN rows participate; closed
    *                 rows pass through untouched.
    * @param incoming key + attrs (no validity columns)
    * @param keyCol   business key
    * @param attrCols compared attribute columns (a change in any opens
    *                 a new version)
    * @param asOf     effective timestamp of this merge
    */
  def merge(
      current: DataFrame, incoming: DataFrame,
      keyCol: String, attrCols: Seq[String], asOf: Column): DataFrame = {
    val closed = current.where(col("valid_to").isNotNull)
    val open = current.where(col("valid_to").isNull)

    val inc = incoming.select(
      col(keyCol).as("__k"),
      struct(attrCols.map(col): _*).as("__new_attrs"))
    val cur = open.select(
      col(keyCol).as("__k"),
      struct(attrCols.map(col): _*).as("__old_attrs"),
      col("valid_from").as("__old_from"))

    val joined = cur.join(inc, Seq("__k"), "full_outer")
    // <=> (null-safe) so a null attribute equals itself — plain = would
    // treat every null-attributed row as changed on every merge
    val same = col("__old_attrs") <=> col("__new_attrs")

    val rows = joined.select(col("__k"), explode(
      when(col("__new_attrs").isNull, // key disappeared from feed: stays open
        array(struct(col("__old_attrs").as("a"),
          col("__old_from").as("f"), lit(null).cast("timestamp").as("t"))))
      .when(col("__old_attrs").isNull, // brand-new key
        array(struct(col("__new_attrs").as("a"),
          asOf.as("f"), lit(null).cast("timestamp").as("t"))))
      .when(same, // unchanged
        array(struct(col("__old_attrs").as("a"),
          col("__old_from").as("f"), lit(null).cast("timestamp").as("t"))))
      .otherwise( // changed: close old, open new
        array(
          struct(col("__old_attrs").as("a"),
            col("__old_from").as("f"), asOf.as("t")),
          struct(col("__new_attrs").as("a"),
            asOf.as("f"), lit(null).cast("timestamp").as("t"))))).as("__r"))

    val merged = rows.select(
      (col("__k").as(keyCol) +:
        attrCols.map(c => col(s"__r.a.$c").as(c))) :+
        col("__r.f").as("valid_from") :+ col("__r.t").as("valid_to"): _*)

    merged.unionByName(
      closed.select(merged.columns.map(col): _*))
  }
}
