package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Plan capture for the operators the r16 optimization round touched —
  * the registered lifecycle queries end in `localCheckpoint`, whose
  * final plan is an opaque `Scan ExistingRDD`, so the reviewable plan
  * shape (Exchange count, join strategy, declared ReadSchema) lives at
  * the OPERATOR level. Builds a small index from the fixture
  * embeddings in a temp dir, prints `.explain("formatted")` for each
  * touched operator composition, cleans up.
  *
  * Usage: runMain graft.OpPlans [sfDir]; redirect stdout into the
  * committed plans/r16 capture files.
  */
object OpPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.engine.Tables
    import graft.ops.{AnnIndex, Similarity}
    val tmp = java.nio.file.Files.createTempDirectory("graft_opplans_")
    try {
      val e = Tables.embeddings(spark, sfDir)
      AnnIndex.buildIvfIndex(e, "vec_id", "embedding", s"$tmp/ivf",
        nCells = 8, iters = 1)
      val q = e.where(col("vec_id") < 10)
      def show(name: String, df: DataFrame): Unit = {
        println(s"\n================ $name ================")
        df.explain("formatted")
      }
      show("searchIvfIndexManyQueries",
        AnnIndex.searchIvfIndexManyQueries(spark, s"$tmp/ivf", q,
          "vec_id", "embedding", k = 5, nProbe = 2))
      show("searchIvfIndex_inlist",
        AnnIndex.searchIvfIndex(spark, s"$tmp/ivf", q,
          "vec_id", "embedding", k = 5, nProbe = 2))
      show("hardNegativesIndexed",
        AnnIndex.hardNegativesIndexed(spark, s"$tmp/ivf", q,
          "vec_id", "embedding", "label", e.select("vec_id", "label"),
          k = 3, nProbe = 2))
      show("searchIvfIndexQuantized",
        AnnIndex.searchIvfIndexQuantized(spark, s"$tmp/ivf", q,
          "vec_id", "embedding", k = 5, nProbe = 2))
      show("bruteForceTopK",
        Similarity.bruteForceTopK(q, e, "vec_id", "embedding", k = 5))
      AnnIndex.buildIvfIndexTwoLevel(e, "vec_id", "embedding", s"$tmp/two",
        nCoarse = 4, nFinePerCell = 4, iters = 1)
      show("searchIvfIndexTwoLevel",
        AnnIndex.searchIvfIndexTwoLevel(spark, s"$tmp/two", q,
          "vec_id", "embedding", k = 5))
    } finally {
      org.apache.spark.graft.ListenerDrain.drain(spark)
      graft.engine.FsUtil.deleteRecursively(tmp)
      spark.stop()
    }
  }
}
