package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpecBase {
  import spark.implicits._

  // 5 groups x 200 entries, engineered ties (value = i/7)
  private def data = (0 until 1000)
    .map(i => (s"g${i % 5}", (i / 7).toDouble, i.toLong))
    .toDF("g", "v", "id")

  test("aggregator top-k equals the window formulation") {
    val agg = data.groupBy("g")
      .agg(TopK.topK(3)(col("v"), col("id")).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), col("col.value").as("v"), col("col.key").as("id"),
        (col("pos") + 1).as("rnk"))
      .as[(String, Double, Long, Long)].collect().sorted.toSeq
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id"))
    val win = data.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= 3)
      .select(col("g"), col("v"), col("id"), col("rnk").cast("long"))
      .as[(String, Double, Long, Long)].collect().sorted.toSeq
    assert(agg == win)
  }

  test("k larger than the group returns the whole group, ordered") {
    val small = Seq(("a", 1.0, 1L), ("a", 2.0, 2L)).toDF("g", "v", "id")
    val got = small.groupBy("g").agg(TopK.topK(10)(col("v"), col("id")).as("top"))
      .select(explode(col("top"))).select("col.value", "col.key")
      .as[(Double, Long)].collect().toSeq
    assert(got == Seq((2.0, 2L), (1.0, 1L)))
  }

  test("partial aggregation appears in the plan (no window sort)") {
    val df = data.groupBy("g").agg(TopK.topK(3)(col("v"), col("id")).as("top"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"no aggregate operator found:\n$plan")
    assert(!plan.contains("Window"), "top-k should not plan a window")
  }
}
