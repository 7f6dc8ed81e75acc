package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Plan capture for the operators the r17 optimization round touched
  * (the OpPlans discipline, new file so the SAME source runs in a
  * pre-round worktree for the `_before` captures): BM25/TF-IDF
  * postings (native term-frequency kernel), the language-model count
  * tables (derived marginals instead of re-tokenizing passes), and a
  * representative TopK ranking (native TypedImperativeAggregate).
  *
  * Usage: runMain graft.OpPlansR17 [sfDir]; redirect stdout into the
  * committed plans/r17 capture files.
  */
object OpPlansR17 {
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
    import graft.ops.{LanguageModel, Retrieval, Similarity, TopK}
    def show(name: String, df: DataFrame): Unit = {
      println(s"\n================ $name ================")
      df.explain("formatted")
    }
    val docs = Tables.documents(spark, sfDir)
    val q = docs.where(col("doc_id") < 10)
    show("bm25TopK",
      Retrieval.bm25TopK(docs, "doc_id", "text", q, "doc_id", "text", 5))
    show("tfidfTopTerms", Retrieval.tfidfTopTerms(docs, "doc_id", "text", 3))
    show("bigramCrossEntropy",
      LanguageModel.bigramCrossEntropy(docs, "doc_id", "text", "lang"))
    show("trigramStupidBackoff",
      LanguageModel.trigramStupidBackoff(
        docs.where(col("doc_id") % 2 === 0), docs.where(col("doc_id") % 2 === 1),
        "doc_id", "text", "lang"))
    show("collocationsPmi",
      LanguageModel.collocationsPmi(docs, "doc_id", "text"))
    show("sourceOverlapExact",
      graft.ops.Dedup.sourceOverlapExact(docs, "source", "text", 3))
    show("dsirScores",
      graft.ops.Selection.dsirScores(docs, docs.where(col("doc_id") < 50),
        "doc_id", "text"))
    val e = Tables.embeddings(spark, sfDir)
    show("rankTopK_bruteforce",
      Similarity.bruteForceTopK(e.where(col("vec_id") < 5), e,
        "vec_id", "embedding", k = 3))
    show("topK_agg_plain",
      docs.select(col("source"), col("n_chars"), col("doc_id"))
        .groupBy("source")
        .agg(TopK.topK(3)(col("n_chars").cast("double"), col("doc_id"))))
    spark.stop()
  }
}
