package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset versioning: what changed between two corpus snapshots —
  * the audit step before retraining on a refreshed crawl (which docs
  * arrived, which left, which were edited in place).
  */
object Versioning {

  /** Snapshot diff by content hash: (doc_id, change) for every doc
    * `added` / `removed` / `modified` between the two snapshots;
    * unchanged docs are dropped (at corpus scale the diff is the
    * small output, the corpus is the big input).
    *
    * Only (id, xxhash64(text)) pairs shuffle — document bodies never
    * cross the wire, so the full-outer join is 16 bytes/row no matter
    * how large the documents are. A modified doc whose old and new
    * texts collide on xxhash64 (2⁻⁶⁴) reports as unchanged — the
    * standard at-scale trade, same policy as the postings hash.
    * `idCol` must be unique within each snapshot (the PK contract of
    * a snapshot); duplicate ids would multiply join rows.
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    // A null text is a VALUE distinct from every string (IS DISTINCT
    // FROM semantics): the hash stays null for it — xxhash64 would
    // otherwise skip the null argument and emit the seed constant,
    // conflating null text with whatever string shares that hash —
    // and presence rides an explicit flag, never the hash's nullness.
    def sig(df: DataFrame, side: String) =
      df.select(col(idCol).as("doc_id"),
        when(col(textCol).isNotNull, xxhash64(col(textCol))).as(s"h_$side"),
        lit(true).as(s"in_$side"))
    sig(oldSnap, "old")
      .join(sig(newSnap, "new"), Seq("doc_id"), "full_outer")
      .withColumn("change",
        when(col("in_old").isNull, lit("added"))
          .when(col("in_new").isNull, lit("removed"))
          .when(!(col("h_old") <=> col("h_new")), lit("modified")))
      .where(col("change").isNotNull)
      .select(col("doc_id"), col("change"))
  }

  /** One-row diff summary: the counts a snapshot-promotion gate
    * alerts on (plus both snapshot sizes, recomputed in the same
    * pass for ratio rules like "reject if >30% of the corpus
    * changed").
    */
  def diffSummary(oldSnap: DataFrame, newSnap: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    def n(kind: String) =
      coalesce(sum(when(col("change") === kind, 1L)), lit(0L)).as(s"n_$kind")
    val d = snapshotDiff(oldSnap, newSnap, idCol, textCol)
      .agg(n("added"), n("removed"), n("modified"))
    val sizes = oldSnap.agg(count(lit(1)).as("n_old"))
      .crossJoin(newSnap.agg(count(lit(1)).as("n_new")))
    d.crossJoin(broadcast(sizes))
  }
}
