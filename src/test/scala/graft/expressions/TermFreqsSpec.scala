package graft.expressions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class TermFreqsSpec extends SparkSpecBase {
  import spark.implicits._

  // the declarative arm TermFreqs replaces (Retrieval.bm25TopK pre-r17)
  private val declarative =
    expr("transform(array_distinct(w), " +
      "t -> struct(t AS term, size(filter(w, x -> x = t)) AS tf))")

  private def both(df: org.apache.spark.sql.DataFrame) = {
    val n = df.select(col("id"),
        explode(graft.functions.termFreqsNative(col("w"))).as("p"))
      .select(col("id"), col("p.term"), col("p.tf"))
      .as[(Long, Option[String], Int)].collect().toSeq
    val d = df.select(col("id"), explode(declarative).as("p"))
      .select(col("id"), col("p.term"), col("p.tf"))
      .as[(Long, Option[String], Int)].collect().toSeq
    (n, d)
  }

  test("native == declarative: counts and first-occurrence order") {
    val df = Seq(
      (1L, Seq("a", "b", "a", "c", "b", "a")),
      (2L, Seq("x")),
      (3L, Seq("a", "a", "a")),
      (4L, Seq.empty[String]))
      .toDF("id", "w")
    val (n, d) = both(df)
    assert(n == d)
    assert(n.filter(_._1 == 1L).map(r => (r._2.get, r._3)) ==
      Seq(("a", 3), ("b", 2), ("c", 1)))
  }

  test("native == declarative: null tokens yield one (null, 0) entry in place") {
    val df = Seq(
      (1L, Seq(Some("a"), None, Some("a"), None, Some("b"))),
      (2L, Seq(None: Option[String])))
      .toDF("id", "w")
    val (n, d) = both(df)
    assert(n == d)
  }

  test("null input array propagates null") {
    val df = Seq((1L, null: Seq[String]), (2L, Seq("a")))
      .toDF("id", "w")
    val n = df.select(graft.functions.termFreqsNative(col("w")).as("p"))
      .where(col("p").isNull).count()
    assert(n == 1L)
  }

  test("output type matches the declarative struct") {
    val df = Seq((1L, Seq("a"))).toDF("id", "w")
    val nt = df.select(graft.functions.termFreqsNative(col("w")).as("p"))
      .schema("p").dataType
    val dt = df.select(declarative.as("p")).schema("p").dataType
    // same field names/types (declarative nullability differs only in
    // array containsNull, which no consumer observes post-explode)
    import org.apache.spark.sql.types.{ArrayType, StructType}
    val nf = nt.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
    val ef = dt.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
    assert(nf.fieldNames.toSeq == ef.fieldNames.toSeq)
    assert(nf.fields.map(_.dataType).toSeq == ef.fields.map(_.dataType).toSeq)
  }
}
