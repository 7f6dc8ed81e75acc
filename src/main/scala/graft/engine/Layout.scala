package graft.engine

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.types._

/** Storage-layout control — the engine-side analog of the reference's
  * extract stage, which re-chunks its source into `chunk_%05d.parquet`
  * files sized for downstream parallelism (reference
  * `src/extract.py:51-52`, CHUNK_ROWS `src/config.py:19`).
  *
  * A parquet file is splittable only at row-group boundaries; the
  * driver fixtures arrive as ONE row group per table, so every scan
  * plans exactly one task regardless of cluster width. Re-laying the
  * hot tables as `targetFiles` part-files once makes every subsequent
  * scan parallel — the layout an ingest pipeline would produce in the
  * first place.
  */
object Layout {

  /** Raw events schema for NANOS-era fixtures: ts is TIMESTAMP(NANOS),
    * which Spark 4 refuses to read as a timestamp — carried as INT64
    * nanos through the relayout (Tables.events converts on read).
    * Fixtures regenerated with TIMESTAMP(MICROS) read natively (the
    * same sniff as Tables.events).
    */
  private val eventsRawSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Rewrite each fixture table under `outDir` with scan-parallel
    * layout: tables above `smallCutoffBytes` become `targetFiles`
    * part-files, small (broadcast-side) tables stay single-file.
    * Returns the output dir (usable as a Tables sfDir).
    */
  def relayout(spark: SparkSession, sfDir: String, outDir: String,
      targetFiles: Int, smallCutoffBytes: Long = 1024 * 1024): String = {
    Tables.all.foreach { name =>
      val src = s"$sfDir/$name.parquet"
      val df = if (name == "events") {
        if (Tables.eventsTsIsNative(spark, src)) spark.read.parquet(src)
        else spark.read.schema(eventsRawSchema).parquet(src)
      } else spark.read.parquet(src)
      // Hadoop FS, not java.io.File: relayout must size sources on
      // HDFS/S3 too (same round-9 fix as q116's part-file probe)
      val p = new org.apache.hadoop.fs.Path(src)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val bytes = fs.getContentSummary(p).getLength
      val out =
        if (bytes > smallCutoffBytes) df.repartition(targetFiles)
        else df.coalesce(1)
      out.write.mode(SaveMode.Overwrite).parquet(s"$outDir/$name.parquet")
    }
    outDir
  }
}
