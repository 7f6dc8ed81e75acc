package graft.engine

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Pipeline control-plane parity (SURVEY.md §2.1, §2.10): the
  * reference's 3-stage Airflow DAG `extract >> transform >> load`
  * (reference `dags/iowa_liquor_dag.py:74`) as sequential driver calls
  * over distributed jobs.
  *
  * Reference-semantics notes:
  * - Chunked extraction (285 × 50k-row pandas chunks,
  *   reference `src/extract.py:44-57`) dissolves into partition-grained
  *   execution: one Spark task per file split replaces one loop
  *   iteration per chunk. `maxPartitionBytes` plays CHUNK_ROWS' role.
  * - Per-stage idempotent `mode(Overwrite)` directories replace Airflow
  *   task retries (O3, reference `dags/iowa_liquor_dag.py:24-25`):
  *   a re-run of any stage overwrites its own output atomically
  *   (S9 — FileOutputCommitter job commit).
  * - Progress telemetry (O4, reference `src/load.py:61-66`) via
  *   `Observation` row-count metrics on each stage's write job instead
  *   of per-chunk prints.
  */
object Pipeline {

  /** Result of one pipeline run: per-stage row counts (A2). */
  case class RunStats(extracted: Long, cleaned: Long, loaded: Long)

  /** S3/S5 — parquet stage sink: overwrite-mode directory write, the
    * atomic, retry-safe replacement for `chunk_%05d.parquet` naming.
    */
  def writeStage(df: DataFrame, dir: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(dir)

  /** S6 — CSV serialization with the reference's NULL sentinel `\N`
    * and no header (reference `src/load.py:37-38`), the COPY-ready
    * interchange format.
    */
  def writeCsvForCopy(df: DataFrame, dir: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("nullValue", "\\N")
      .option("emptyValue", "\"\"")
      .option("header", "false")
      .csv(dir)

  /** Read back COPY-format CSV (inverse of [[writeCsvForCopy]]) given
    * the schema — used by the round-trip spec.
    */
  def readCsvForCopy(spark: SparkSession, dir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema)
      .option("nullValue", "\\N")
      .option("header", "false")
      .csv(dir)

  /** S7 — bulk relational sink. The idiomatic Spark path is
    * `df.write.format("jdbc")` with a large batchsize; exact
    * COPY-protocol parity would use `foreachPartition` + pgjdbc
    * CopyManager. No database exists in this environment, so this
    * builds the writer fully configured and only `.save()`s when a URL
    * is supplied — the structure is real, the connection is the stub.
    */
  def jdbcSink(df: DataFrame, url: Option[String], table: String,
      batchSize: Int = 50000): Unit =
    url match {
      case Some(u) =>
        df.write.format("jdbc")
          .option("url", u)
          .option("dbtable", table)
          .option("batchsize", batchSize)
          .mode(SaveMode.Append)
          .save()
      case None => () // no live database in the sandbox (SURVEY.md §7.4 risk 4)
    }

  /** D2 at the sink — conflict-ignoring append into a parquet "table"
    * directory: dedup the batch, anti-join existing keys, append only
    * novel rows. First write creates the table. This is the
    * `ON CONFLICT (pk) DO NOTHING` idempotency story against files.
    */
  def conflictIgnoringAppend(
      spark: SparkSession, batch: DataFrame, dir: String, keys: Seq[String]): Long = {
    // Filesystem-level first-write probe, NOT a spark.read that throws
    // on a missing path: a failed analysis is memoized on its
    // QueryExecution and resurfaces later on the async
    // ExecutionListenerBus as a spurious PATH_NOT_FOUND ERROR per run.
    // "Exists" means at least one COMMITTED data file — a directory
    // holding only _temporary/_SUCCESS debris (a crashed first append)
    // must count as first-write, or every retry would wedge on an
    // unreadable empty table.
    val exists = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.exists(p) && fs.listStatus(p).exists { st =>
        val n = st.getPath.getName
        !(n.startsWith("_") || n.startsWith("."))
      }
    }
    val novel =
      if (!exists) batch.dropDuplicates(keys)
      else Star.conflictIgnoreAppend(batch, spark.read.parquet(dir), keys)
    // Append is not atomic with respect to the existence check —
    // single-writer semantics assumed, matching the reference's single
    // loader process (src/load.py runs alone).
    // Cache the novel rows across count + write so the anti-join runs
    // once AND a zero-novel rerun writes nothing — an unconditional
    // append would leave empty part files behind on every scheduled
    // no-op re-run, degrading the table directory over time.
    novel.persist()
    try {
      val n = novel.count()
      if (n > 0) novel.write.mode(SaveMode.Append).parquet(dir)
      n
    } finally novel.unpersist()
  }

  /** O1/O2 — the full extract → transform → load flow over directories
    * (the XCom path-list handoff becomes directory-name convention).
    * `clean` is the caller-supplied transform stage (e.g.
    * `Clean.cleanLineitem`). Returns per-stage counts (A2/O4).
    */
  def run(
      spark: SparkSession,
      source: DataFrame,
      clean: DataFrame => DataFrame,
      rawDir: String, cleanDir: String, tableDir: String,
      keys: Seq[String]): RunStats = {
    // Per-stage row telemetry (A2/O4) rides each stage's OWN write job
    // as Observation metrics — the reference's per-chunk progress prints
    // (src/load.py:61-66) without any extra count jobs or re-scans:
    // the whole pipeline is exactly one job per stage.
    import org.apache.spark.sql.Observation

    // extract: source scan → raw parquet (S3)
    val obsExtract = Observation()
    writeStage(source.observe(obsExtract, count(lit(1)).as("rows")), rawDir)
    val nExtracted = obsExtract.get("rows").asInstanceOf[Long]

    // transform: stateless clean, one whole-stage-codegen'd pass (S4/S5)
    val obsClean = Observation()
    writeStage(
      clean(spark.read.parquet(rawDir)).observe(obsClean, count(lit(1)).as("rows")),
      cleanDir)
    val nClean = obsClean.get("rows").asInstanceOf[Long]

    // load: conflict-ignoring keyed append (S7 analog over files)
    val nLoaded = conflictIgnoringAppend(spark, spark.read.parquet(cleanDir), tableDir, keys)
    RunStats(nExtracted, nClean, nLoaded)
  }

  /** S8 — DDL bootstrap: register the parquet table directory in the
    * session catalog so downstream SQL can address it by name
    * (`CREATE TABLE IF NOT EXISTS ... USING parquet LOCATION ...`).
    */
  def registerTable(spark: SparkSession, name: String, dir: String): Unit =
    spark.sql(
      s"CREATE TABLE IF NOT EXISTS $name USING parquet LOCATION '$dir'")

  /** Bucketed catalog table: co-locates join/aggregation keys at write
    * time so repeated joins on `keys` skip the shuffle entirely — the
    * pre-partitioning strategy for fact tables read by many downstream
    * star joins at 100 TB. (Bucketed joins require catalog tables;
    * plain parquet directories don't carry bucket metadata.)
    */
  def writeBucketedTable(
      df: DataFrame, table: String, keys: Seq[String], numBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Hive-style partitioned directory layout: queries filtering on
    * `partitionCols` prune whole directories at planning time
    * (PartitionFilters), the coarse-grained complement to parquet
    * row-group pushdown.
    */
  def writePartitioned(df: DataFrame, dir: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(dir)

  /** Z-ordered writer: Morton-cluster on `zorderCols` (ZOrder.zorderByN)
    * before the partitioned write, so WITHIN each Hive partition the
    * part-files carry tight min/max footer statistics on EVERY z
    * dimension — directory pruning handles `partitionCols` predicates,
    * row-group stats pruning handles multi-dimensional `zorderCols`
    * predicates. Each write task owns a contiguous Morton range
    * (range partitioning), so per-(task × partition-dir) files stay
    * range-tight even after the writer's internal partition-column
    * sort. `partitionCols` empty = plain z-ordered layout.
    */
  def writeZOrdered(df: DataFrame, dir: String, partitionCols: Seq[String],
      zorderCols: Seq[String], numFiles: Int, bitsPer: Int = 16): Unit = {
    val z = graft.ops.ZOrder.zorderByN(df, zorderCols, numFiles, bitsPer)
    if (partitionCols.isEmpty) z.write.mode(SaveMode.Overwrite).parquet(dir)
    else writePartitioned(z, dir, partitionCols)
  }
}
