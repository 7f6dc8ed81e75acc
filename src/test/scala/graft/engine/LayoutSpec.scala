package graft.engine

import graft.SparkSpecBase
import java.nio.file.Files

class LayoutSpec extends SparkSpecBase {

  test("relayout preserves every table's rows and widens big scans") {
    val sf = "/root/testdata/sf0.001"
    val out = Files.createTempDirectory("graft_layout").toString
    Layout.relayout(spark, sf, out, targetFiles = 4, smallCutoffBytes = 64 * 1024)
    for (t <- Tables.all if t != "events") { // events: nanos ts needs the typed reader
      val a = Tables.read(spark, sf, t)
      val b = Tables.read(spark, out, t)
      assert(a.count() == b.count(), s"$t row count changed")
    }
    // events survives the INT64-nanos carry: typed reader still works
    val ev = Tables.events(spark, out)
    assert(ev.count() == Tables.events(spark, sf).count())
    assert(ev.schema("ts").dataType.typeName == "timestamp")
  }
}
