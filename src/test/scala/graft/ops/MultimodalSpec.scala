package graft.ops

import graft.SparkSpecBase

class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs = Seq(
    (0L, "hello"), (1L, "abc"), (2L, "")
  ).toDF("doc_id", "text")

  test("attachPayload: binary payload + deterministic metadata") {
    val m = Multimodal.attachPayload(docs, "doc_id", "text").collect()
    val r0 = m.find(_.getLong(0) == 0L).get
    assert(r0.getAs[Array[Byte]]("payload").toSeq == "hello".getBytes("UTF-8").toSeq)
    assert(Set("jpeg", "png", "wav").contains(r0.getAs[String]("format")))
    assert(r0.getAs[Int]("width") > 0 && r0.getAs[Int]("height") > 0)
  }

  test("extractFeatures: per-partition decode stub computes byte stats") {
    val f = Multimodal.extractFeatures(docs, "doc_id", "text")
      .orderBy("media_id").collect()
    assert(f.length == 3)
    val hello = f(0)
    assert(hello.getAs[Long]("n_bytes") == 5L)
    val expectedMean = "hello".getBytes("UTF-8").map(_ & 0xFF).sum / 5.0
    assert(math.abs(hello.getAs[Double]("mean_byte") - expectedMean) < 1e-9)
    val empty = f(2)
    assert(empty.getAs[Long]("n_bytes") == 0L && empty.getAs[Double]("mean_byte") == 0.0)
  }

  test("Arrow columnar decode matches the row-path decode exactly") {
    // larger corpus than the batch size so partitions span several batches
    val many = (0L until 100L).map(i => (i, "x" * (i.toInt % 17))).toDF("doc_id", "text")
    val rowPath = Multimodal.extractFeatures(many, "doc_id", "text")
      .orderBy("media_id").collect().map(_.toSeq).toSeq
    val arrowPath = Multimodal.extractFeaturesArrow(many, "doc_id", "text", batchSize = 16)
      .orderBy("media_id").collect().map(_.toSeq).toSeq
    assert(arrowPath == rowPath)
    assert(arrowPath.length == 100)
  }

  test("resizeStub rewrites metadata and flags the row") {
    val resized = Multimodal.resizeStub(
      Multimodal.attachPayload(docs, "doc_id", "text"), 224, 224).collect()
    assert(resized.forall(r =>
      r.getAs[Int]("width") == 224 && r.getAs[Boolean]("resized")))
  }

  test("frameSampleStub explodes every stride-th chunk with stable indices") {
    import org.apache.spark.sql.Encoders
    val media = Multimodal.attachPayload(docs, "doc_id", "text")
      .as[Multimodal.MediaRow](Encoders.product[Multimodal.MediaRow])
    // "hello" (5 bytes), frameBytes=2 -> chunks 0..2, stride 2 -> 0 and 2
    val frames = Multimodal.frameSampleStub(media, frameBytes = 2, stride = 2)
      .collect().filter(_.media_id == 0L).sortBy(_.frame_no)
    assert(frames.map(_.frame_no).toSeq == Seq(0, 2))
    assert(new String(frames(0).frame, "UTF-8") == "he")
    assert(new String(frames(1).frame, "UTF-8") == "o")
    // empty payload -> zero frames, not a null row
    val empty = Multimodal.frameSampleStub(media, 2, 2)
      .collect().filter(_.media_id == 2L)
    assert(empty.isEmpty)
  }
}
