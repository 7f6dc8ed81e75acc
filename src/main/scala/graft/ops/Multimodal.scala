package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque binary payloads with typed
  * metadata, decoded/feature-extracted per partition.
  *
  * The Spark-side shape is real — binary columns, metadata structs,
  * partition-batched decode via `mapPartitions` on a typed Dataset
  * (the Scala analog of `mapInPandas` batch processing) — while the
  * codec itself is a clearly-marked deterministic STUB: the actual
  * image/audio libraries are not in this container. Swapping
  * `decodeStub` for a real JNI/JavaCV decoder changes no schema,
  * partitioning, or call shape.
  */
object Multimodal {

  /** Typed row for the decode stage: payload plus its metadata. */
  case class MediaRow(
      media_id: Long, payload: Array[Byte], format: String,
      width: Int, height: Int)

  /** Extracted features per media item. */
  case class MediaFeatures(
      media_id: Long, n_bytes: Long, format: String,
      width: Int, height: Int,
      mean_byte: Double, frames_sampled: Int)

  /** Attach a binary payload + deterministic fake metadata to the
    * documents table — stands in for reading real image/audio bytes.
    * Payload is the UTF-8 text bytes (opaque to everything downstream).
    */
  def attachPayload(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      col(textCol).cast("binary").as("payload"),
      element_at(array(lit("jpeg"), lit("png"), lit("wav")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("format"),
      (pmod(col(idCol), lit(8)) * 160 + 320).cast("int").as("width"),
      (pmod(col(idCol), lit(8)) * 90 + 180).cast("int").as("height"))

  /** STUB decode: where a real implementation would parse the codec
    * (JPEG/PNG/WAV) and extract features, this computes deterministic
    * stand-ins from the raw bytes (byte count, mean byte value, a fake
    * frame-sample count from the metadata). Batch shape is the real
    * one: one iterator pass per partition, no per-row JVM boundary.
    */
  def decodeStub(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
    rows.map { r =>
      // --- STUB: real codec call goes here (not available in-container).
      val n = r.payload.length.toLong
      val mean = if (n == 0) 0.0 else r.payload.map(b => (b & 0xFF).toLong).sum.toDouble / n
      val frames = if (r.format == "wav") (n / 64).toInt else 1
      MediaFeatures(r.media_id, n, r.format, r.width, r.height, mean, frames)
    }

  /** Feature-extraction pipeline: documents → payload+metadata →
    * per-partition decode → features DataFrame. Partitioning is
    * preserved end-to-end; the decode is a narrow transformation.
    */
  def extractFeatures(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val media: Dataset[MediaRow] =
      attachPayload(docs, idCol, textCol).as[MediaRow](Encoders.product[MediaRow])
    media.mapPartitions(decodeStub _)(Encoders.product[MediaFeatures]).toDF()
  }

  /** Arrow columnar-batch variant of the decode stage — the batch shape
    * a real native codec integration needs (a JNI/FFI decoder consumes
    * Arrow buffers directly, so the decode loop must see columnar
    * batches, not JVM row objects). Scala Spark has no `mapInArrow`
    * (that is a Python-surface API), so the batch marshalling is
    * explicit and uses the public Arrow vector API: each partition is
    * packed into `batchSize`-row `VectorSchemaRoot`s, the (stub) codec
    * reads the columnar buffers batch-at-a-time, and features come
    * back as rows. Allocation is per-batch and closed eagerly — memory
    * stays bounded at batchSize × row width regardless of partition
    * size.
    *
    * Output contract is IDENTICAL to [[extractFeatures]] (spec-pinned).
    */
  def extractFeaturesArrow(docs: DataFrame, idCol: String, textCol: String,
      batchSize: Int = 512): DataFrame = {
    require(batchSize > 0)
    val media: Dataset[MediaRow] =
      attachPayload(docs, idCol, textCol).as[MediaRow](Encoders.product[MediaRow])
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(decodeArrowBatch)
    }(Encoders.product[MediaFeatures]).toDF()
  }

  /** One Arrow batch through the (stub) codec: marshal the rows into
    * Arrow vectors, run the decode against the COLUMNAR buffers (the
    * loop reads `VarBinaryVector`/`BigIntVector` cells, never a
    * MediaRow), release the buffers. A real decoder would hand
    * `root`'s buffers across the FFI boundary instead of the marked
    * stub block — nothing else changes.
    */
  private def decodeArrowBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] = {
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector._
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}
    import org.apache.arrow.vector.types.Types
    import scala.jdk.CollectionConverters._

    val schema = new Schema(Seq(
      new Field("media_id", FieldType.notNullable(new ArrowType.Int(64, true)), null),
      new Field("payload", FieldType.notNullable(Types.MinorType.VARBINARY.getType), null),
      new Field("format", FieldType.notNullable(Types.MinorType.VARCHAR.getType), null),
      new Field("width", FieldType.notNullable(new ArrowType.Int(32, true)), null),
      new Field("height", FieldType.notNullable(new ArrowType.Int(32, true)), null)
    ).asJava)
    val allocator = new RootAllocator()
    val root = VectorSchemaRoot.create(schema, allocator)
    try {
      val ids = root.getVector("media_id").asInstanceOf[BigIntVector]
      val payloads = root.getVector("payload").asInstanceOf[VarBinaryVector]
      val formats = root.getVector("format").asInstanceOf[VarCharVector]
      val widths = root.getVector("width").asInstanceOf[IntVector]
      val heights = root.getVector("height").asInstanceOf[IntVector]
      root.allocateNew()
      batch.zipWithIndex.foreach { case (r, i) =>
        ids.setSafe(i, r.media_id)
        payloads.setSafe(i, r.payload)
        formats.setSafe(i, r.format.getBytes("UTF-8"))
        widths.setSafe(i, r.width)
        heights.setSafe(i, r.height)
      }
      root.setRowCount(batch.size)
      (0 until root.getRowCount).map { i =>
        // --- STUB: real codec consumes the Arrow buffers here.
        val bytes = payloads.get(i)
        val fmt = new String(formats.get(i), "UTF-8")
        val n = bytes.length.toLong
        val mean =
          if (n == 0) 0.0 else bytes.map(b => (b & 0xFF).toLong).sum.toDouble / n
        val frames = if (fmt == "wav") (n / 64).toInt else 1
        MediaFeatures(ids.get(i), n, fmt, widths.get(i), heights.get(i), mean, frames)
      }
    } finally {
      root.close()
      allocator.close()
    }
  }

  /** "Resize" stage stub: recompute metadata for a target size while
    * passing the payload through — exercises schema evolution of the
    * media struct without a real resampler.
    */
  def resizeStub(media: DataFrame, targetW: Int, targetH: Int): DataFrame =
    media
      .withColumn("width", lit(targetW))
      .withColumn("height", lit(targetH))
      .withColumn("resized", lit(true))

  /** One sampled frame: parent media id, frame index, frame payload. */
  case class Frame(media_id: Long, frame_no: Int, frame: Array[Byte])

  /** Frame-sampling stage: every `stride`-th fixed-size chunk of the
    * payload becomes one frame row (1→N explode, the row-multiplying
    * shape real video sampling has). A real implementation would seek
    * keyframes in the container; the chunking STUB keeps the same
    * schema, batch shape, and output cardinality contract
    * (ceil(nChunks / stride) frames per media row).
    */
  def frameSampleStub(media: Dataset[MediaRow], frameBytes: Int,
      stride: Int): Dataset[Frame] = {
    require(frameBytes > 0 && stride > 0)
    implicit val enc = Encoders.product[Frame]
    media.flatMap { r =>
      // --- STUB: real keyframe-seek goes here (no codec in-container).
      r.payload.grouped(frameBytes).zipWithIndex
        .collect { case (chunk, i) if i % stride == 0 =>
          Frame(r.media_id, i, chunk) }
    }
  }
}
