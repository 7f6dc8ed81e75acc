package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class QualitySpec extends SparkSpecBase {
  import spark.implicits._
  import Quality._

  private def df = Seq(
    (Some(1L), Some(10.0), "A"),
    (Some(1L), Some(99.0), "A"),  // dup key 1; out of range
    (None, Some(5.0), "Z"),       // null key; bad pattern
    (Some(2L), None, "R"),        // null value: NOT an in_range violation
    (Some(9L), Some(50.0), "N")   // fk orphan (dim has 1,2)
  ).toDF("k", "v", "flag")

  private def dim = Seq(1L, 2L).toDF("dk")

  test("audit counts every violation class correctly in one report") {
    val got = audit(df, Seq(
        NotNull("k"), InRange("v", 1, 50), Matches("flag", "^[ARN]$"),
        Unique(Seq("k")), FkIn("k", dim, "dk")))
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(got == Map(
      "not_null:k" -> 1L,
      "in_range:v" -> 1L,     // 99.0 only; null v not counted
      "matches:flag" -> 1L,   // "Z"
      "unique:k" -> 1L,       // second row of key 1
      "fk:k" -> 1L))          // key 9 (null key not counted)
  }

  test("empty check list yields an empty report, not an exception") {
    val got = audit(df, Seq.empty)
    assert(got.columns.toSeq == Seq("chk", "violations", "total"))
    assert(got.count() == 0L)
  }

  test("clean table reports zero violations everywhere") {
    val clean = Seq((Some(1L), Some(10.0), "A")).toDF("k", "v", "flag")
    val got = audit(clean, Seq(NotNull("k"), InRange("v", 1, 50),
        Unique(Seq("k")), FkIn("k", dim, "dk")))
      .as[(String, Long, Long)].collect()
    assert(got.forall(_._2 == 0L))
    assert(got.forall(_._3 == 1L))
  }
}
