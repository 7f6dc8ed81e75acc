package graft.queries

import java.nio.file.{Files, Path}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.engine.{Clean, Pipeline, Tables}

/** End-to-end pipeline / sink / orchestration queries — the §2 operators
  * that previously only had ScalaTest coverage (S3/S5/S6/S8/S9, F10,
  * O1/O2/O4, A2) now observable by the driver's oracle compare.
  *
  * Both queries are side-effecting by design (they run the actual
  * staged pipeline against a fresh temp directory per invocation, the
  * way the reference DAG runs `extract >> transform >> load` per
  * schedule tick — reference `dags/iowa_liquor_dag.py:74`), and both
  * reduce to a single row of counts/sums that a DuckDB oracle computes
  * directly from the source table — so the *whole* write→read→load
  * path is hash-verified, not just rows>0. All distributed work
  * completes inside the query function (the returned frame is local),
  * so each invocation deletes its temp directory before returning —
  * repeated bench/verify rounds leak no disk.
  */
object OrchestrationQueries {
  type Q = (SparkSession, String) => DataFrame

  private def deleteRecursively(root: Path): Unit =
    if (Files.exists(root))
      Files.walk(root).sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))

  val queries: Map[String, Q] = Map(
    // O1/O2/O4 + S3/S5/S8/S9/A2 + D2-at-the-sink: the full 3-stage run,
    // executed TWICE over the same directories to prove idempotent
    // re-run semantics (overwrite stages + conflict-ignoring load ⇒ the
    // second run extracts/cleans the same counts but loads 0 novel
    // rows — the reference's Airflow retry story, dag.py:24-25).
    "q64_pipeline_run" -> { (s, dir) =>
      import s.implicits._
      val tmp = Files.createTempDirectory("graft_q64_")
      try {
        val keys = Seq("l_orderkey", "l_linenumber")
        // fan the one-row-group fixture scan out to cluster width so the
        // raw stage writes in parallel — downstream stages then inherit
        // the multi-file layout and parallelize for free (the reference's
        // CHUNK_ROWS re-chunking, done once at extract)
        def once() = Pipeline.run(s, Tables.fanOut(s, Tables.lineitem(s, dir)),
          Clean.cleanLineitem,
          s"$tmp/raw", s"$tmp/clean", s"$tmp/table", keys)
        val first = once()
        val rerun = once()
        // S8 — catalog bootstrap over the loaded table, then count through
        // the catalog name (unique per invocation; dropped after use).
        val tbl = "t" + tmp.toString.replaceAll("[^A-Za-z0-9]", "_")
        Pipeline.registerTable(s, tbl, s"$tmp/table")
        val tableRows = try s.table(tbl).count()
        finally s.sql(s"DROP TABLE IF EXISTS $tbl")
        Seq((first.extracted, first.cleaned, first.loaded, rerun.loaded, tableRows))
          .toDF("extracted", "cleaned", "loaded_first", "loaded_rerun", "table_rows")
      } finally deleteRecursively(tmp)
    },

    // S6/F10 — COPY-format CSV round-trip: inject NULLs (→ `\N`) and
    // empty strings (→ `""`, which must stay DISTINCT from NULL through
    // the file format — reference `src/load.py:37-38`), write, read
    // back with the schema, and aggregate. Money goes through
    // decimal(18,2) so the text round-trip and the sum are exact.
    // The aggregate is materialized EAGERLY so the CSV directory can be
    // deleted before returning.
    "q65_csv_null_roundtrip" -> { (s, dir) =>
      import s.implicits._
      val tmp = Files.createTempDirectory("graft_q65_")
      try {
        val src = Tables.customer(s, dir).select(
          col("c_custkey"),
          when(col("c_custkey") % 7 === 0, lit(null).cast("string"))
            .otherwise(col("c_name")).as("name"),
          when(col("c_custkey") % 11 === 0, lit(""))
            .otherwise(col("c_mktsegment")).as("seg"),
          col("c_acctbal").cast("decimal(18,2)").as("bal"))
        Pipeline.writeCsvForCopy(src, tmp.toString)
        val schema = StructType(Seq(
          StructField("c_custkey", LongType), StructField("name", StringType),
          StructField("seg", StringType), StructField("bal", DecimalType(18, 2))))
        val r = Pipeline.readCsvForCopy(s, tmp.toString, schema).agg(
          count(lit(1)).as("n_rows"),
          count(col("name")).as("n_name"),
          sum(when(col("seg") === "", 1L).otherwise(0L)).as("n_empty_seg"),
          count(col("seg")).as("n_seg"),
          sum(col("c_custkey")).as("key_sum"),
          sum(col("bal")).cast("double").as("bal_sum")).head()
        Seq((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getDouble(5)))
          .toDF("n_rows", "n_name", "n_empty_seg", "n_seg", "key_sum", "bal_sum")
      } finally deleteRecursively(tmp)
    }
  )

  val oracleSql: Map[String, String] = Map(
    // The oracle states the pipeline CONTRACT directly over the source:
    // extract and clean preserve row count; load dedups on the PK pair;
    // a re-run loads nothing; the catalog table holds the PK-distinct
    // row set.
    "q64_pipeline_run" ->
      """SELECT
        |  (SELECT COUNT(*) FROM lineitem) AS extracted,
        |  (SELECT COUNT(*) FROM lineitem) AS cleaned,
        |  (SELECT COUNT(*) FROM (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem)) AS loaded_first,
        |  CAST(0 AS BIGINT) AS loaded_rerun,
        |  (SELECT COUNT(*) FROM (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem)) AS table_rows""".stripMargin,
    "q65_csv_null_roundtrip" ->
      """SELECT COUNT(*) AS n_rows,
        |  COUNT(CASE WHEN c_custkey % 7 <> 0 AND c_name IS NOT NULL THEN 1 END) AS n_name,
        |  CAST(SUM(CASE WHEN c_custkey % 11 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_empty_seg,
        |  COUNT(CASE WHEN c_custkey % 11 = 0 OR c_mktsegment IS NOT NULL THEN 1 END) AS n_seg,
        |  CAST(SUM(c_custkey) AS BIGINT) AS key_sum,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal_sum
        |FROM customer""".stripMargin
  )
}
