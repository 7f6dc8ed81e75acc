package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpecBase {
  import spark.implicits._

  test("approx_count_distinct lands within 5% of exact on 10k keys") {
    val df = (1 to 20000).map(i => (i % 10000, "g")).toDF("k", "g")
    val approx = df.groupBy("g").agg(approx_count_distinct(col("k")).as("a"))
      .select("a").collect()(0).getLong(0)
    assert(math.abs(approx - 10000.0) / 10000.0 < 0.05, s"approx=$approx")
  }

  test("rollup emits subtotal and grand-total rows") {
    val df = Seq(("r1", 1995, 10.0), ("r1", 1996, 20.0), ("r2", 1995, 5.0))
      .toDF("r", "y", "v")
    val out = df.rollup(col("r"), col("y")).agg(sum(col("v")).as("s")).collect()
    // 3 leaf + 2 region subtotals + 1 grand total
    assert(out.length == 6)
    val grand = out.find(r => r.isNullAt(0) && r.isNullAt(1)).get
    assert(grand.getDouble(2) == 35.0)
  }
}
