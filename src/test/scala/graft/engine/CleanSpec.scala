package graft.engine

import graft.SparkSpecBase
import graft.functions._
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.DecimalType

/** F1/F2 coercion semantics (reference src/transform.py:12-21):
  * unparseable numeric → 0 (not NULL); unparseable date → NULL.
  */
class CleanSpec extends SparkSpecBase {
  import spark.implicits._

  test("coerceNumeric: bad string -> 0, good string -> value, null -> 0") {
    val df = Seq("12.5", "oops", null, "0.125").toDF("v")
      .select(coerceNumeric(col("v"), DecimalType(18, 3)).as("v"))
    val got = df.collect().map(r => r.getDecimal(0).toPlainString)
    assert(got.toSeq == Seq("12.500", "0.000", "0.000", "0.125"))
  }

  test("coerceTimestamp: bad string -> null, ISO string -> parsed") {
    val df = Seq("2024-03-01 10:00:00", "not-a-date", null).toDF("t")
      .select(coerceTimestamp(col("t")).as("t"))
    val got = df.collect().map(r => Option(r.get(0)).map(_.toString))
    assert(got(0).contains("2024-03-01 10:00:00.0"))
    assert(got(1).isEmpty && got(2).isEmpty)
  }

  test("clean applies rules per column class and leaves others untouched") {
    val df = Seq(("a", "2024-01-01", "3", "1.55", "bad"))
      .toDF("id", "d", "n", "m", "vol")
    val out = Clean.clean(df,
      timestampCols = Seq("d"), intCols = Seq("n"),
      moneyCols = Seq("m"), volumeCols = Seq("vol"))
    val r = out.collect()(0)
    assert(r.getAs[String]("id") == "a")
    assert(r.getAs[java.sql.Timestamp]("d").toString.startsWith("2024-01-01"))
    assert(r.getAs[Int]("n") == 3)
    assert(r.getAs[java.math.BigDecimal]("m").toPlainString == "1.55")
    assert(r.getAs[java.math.BigDecimal]("vol").toPlainString == "0.000")
  }
}
