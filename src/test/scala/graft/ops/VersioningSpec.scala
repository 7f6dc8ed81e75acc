package graft.ops

import graft.SparkSpecBase

class VersioningSpec extends SparkSpecBase {
  import spark.implicits._

  private def vOld = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
  private def vNew = Seq((2L, "b"), (3L, "x"), (4L, "d")).toDF("doc_id", "text")

  test("snapshotDiff classifies added/removed/modified, drops unchanged") {
    val got = Versioning.snapshotDiff(vOld, vNew, "doc_id", "text")
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "removed"), (3L, "modified"), (4L, "added")))
  }

  test("identical snapshots diff to nothing; summary reports zeros + sizes") {
    assert(Versioning.snapshotDiff(vOld, vOld, "doc_id", "text").count() == 0L)
    val s = Versioning.diffSummary(vOld, vNew, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(s == ((1L, 1L, 1L, 3L, 3L)))
    val z = Versioning.diffSummary(vOld, vOld, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(z == ((0L, 0L, 0L, 3L, 3L)))
  }

  test("null text is a value: null -> text and text -> null are modifications") {
    val a = Seq((1L, null.asInstanceOf[String]), (2L, "x")).toDF("doc_id", "text")
    val b = Seq((1L, "y"), (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = Versioning.snapshotDiff(a, b, "doc_id", "text")
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "modified"), (2L, "modified")))
    // null == null: unchanged
    assert(Versioning.snapshotDiff(a, a, "doc_id", "text").count() == 0L)
  }
}
