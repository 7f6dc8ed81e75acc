package graft.engine

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}

/** Postgres COPY bulk-sink structure (SURVEY.md §2.1 S7): the
  * reference streams each chunk as CSV bytes with `\N` nulls into
  * `COPY … FROM STDIN WITH (FORMAT CSV, NULL '\N')`
  * (reference `src/load.py:37-44`).
  *
  * The Spark-native shape: each PARTITION formats its rows into one
  * COPY-ready byte payload (`copyPayloads`), and a writer callback
  * streams payloads connection-per-partition (`foreachCopyPartition`) —
  * exactly where `pgjdbc`'s `CopyManager.copyIn(sql, stream)` plugs in.
  * No database or pg driver exists in this environment, so the
  * transport is caller-supplied; the wire FORMAT — the verifiable
  * part — is implemented and spec-checked byte-for-byte.
  */
object CopySink {

  /** RFC-4180-style field encoding with the COPY CSV NULL sentinel:
    * null → `\N` (unquoted — that's what distinguishes it from the
    * literal string), fields containing delimiter/quote/newline are
    * double-quoted with internal quotes doubled (matching pandas
    * `to_csv` as used by the reference).
    */
  def encodeField(v: Any): String = v match {
    case null => "\\N"
    case s: String
        if s.contains(",") || s.contains("\"") || s.contains("\n") || s.contains("\r") =>
      "\"" + s.replace("\"", "\"\"") + "\""
    case other => other.toString
  }

  /** One row → one CSV line (no header, matching `src/load.py:38`). */
  def encodeRow(row: Row): String =
    (0 until row.length).map(i => encodeField(row.get(i))).mkString(",")

  /** One (payload, rowCount) pair per non-empty partition — the single
    * encode path both public entry points build on; the count is taken
    * at encode time (a newline count over the bytes would miscount
    * quoted embedded newlines).
    */
  def payloadsWithCounts(df: DataFrame): Dataset[(Array[Byte], Long)] =
    df.mapPartitions { rows =>
      if (rows.isEmpty) Iterator.empty
      else {
        val sb = new StringBuilder
        var n = 0L
        rows.foreach { r => sb.append(encodeRow(r)); sb.append('\n'); n += 1 }
        Iterator.single((sb.toString.getBytes(StandardCharsets.UTF_8), n))
      }
    }(Encoders.tuple(Encoders.BINARY, Encoders.scalaLong))

  /** Distributed formatting: one COPY-ready byte payload per partition
    * (the unit `CopyManager.copyIn` consumes as a stream).
    */
  def copyPayloads(df: DataFrame): Dataset[Array[Byte]] =
    payloadsWithCounts(df).map(_._1)(Encoders.BINARY)

  /** The COPY statement the payloads pair with — column list from the
    * DataFrame, like the reference enumerates chunk columns
    * (`src/load.py:41`).
    */
  def copyStatement(df: DataFrame, table: String): String =
    s"""COPY $table (${df.columns.mkString(", ")}) FROM STDIN WITH (FORMAT CSV, NULL '\\N')"""

  /** Partition-parallel load driver: `writer` receives the COPY
    * statement and one payload per invocation and owns the connection
    * (pgjdbc CopyManager in production; a collector in tests). Runs on
    * executors — `writer` must be serializable.
    */
  def foreachCopyPartition(
      df: DataFrame, table: String,
      writer: (String, Array[Byte]) => Unit): Unit = {
    val stmt = copyStatement(df, table)
    copyPayloads(df).foreachPartition { (it: Iterator[Array[Byte]]) =>
      it.foreach(p => writer(stmt, p))
    }
  }

  /** Caller-supplied COPY transport with the full connection lifecycle
    * pgjdbc's CopyManager expects: one transport per PARTITION
    * (`open → copyIn × payloads → close`), created executor-side by the
    * serializable `factory`. A pgjdbc-backed implementation is
    * `conn = DriverManager.getConnection(url)` in `open`,
    * `new CopyManager(conn).copyIn(stmt, new ByteArrayInputStream(p))`
    * in `copyIn`, `conn.close()` in `close` — no engine change needed.
    * A transport failure fails the task; Spark's retry re-runs the
    * whole partition, so `copyIn` should ride one transaction per
    * partition (what COPY FROM STDIN gives naturally).
    */
  trait CopyTransport {
    def open(): Unit = ()
    def copyIn(statement: String, payload: Array[Byte]): Unit
    def close(): Unit = ()
  }

  /** S7 end-to-end: format + transport. Returns rows loaded — no
    * extra job.
    */
  def load(df: DataFrame, table: String,
      factory: () => CopyTransport): Long = {
    val stmt = copyStatement(df, table)
    val rows = df.sparkSession.sparkContext.longAccumulator("copy_rows")
    payloadsWithCounts(df).foreachPartition { (it: Iterator[(Array[Byte], Long)]) =>
      if (it.nonEmpty) {
        val t = factory()
        t.open()
        try it.foreach { case (p, n) =>
          t.copyIn(stmt, p)
          rows.add(n)
        } finally t.close()
      }
    }
    rows.value
  }
}
