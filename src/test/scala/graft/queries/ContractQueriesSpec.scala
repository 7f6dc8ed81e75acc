package graft.queries

import java.nio.file.Files

import graft.SparkSpecBase
import graft.engine.FsUtil

/** Degenerate-input behavior of the contract-oracle queries: a global
  * aggregate over an EMPTY pair set yields null sums unless coalesced,
  * and the oracles state literal zeros — so a legitimately dup-free
  * corpus must produce 0/0/true rows, never nulls.
  */
class ContractQueriesSpec extends SparkSpecBase {
  import spark.implicits._

  private def dupFreeCorpus(): String = {
    val dir = Files.createTempDirectory("graft_contract_docs_").toString
    Seq(
      (0L, "alpha beta gamma delta epsilon zeta", "en", 35),
      (1L, "one two three four five six seven", "en", 33),
      (2L, "uno dos tres cuatro cinco seis", "es", 30))
      .toDF("doc_id", "text", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q25 contract row is zero-valued, not null, on a dup-free corpus") {
    val dir = dupFreeCorpus()
    try {
      val rows = PipelineQueries.queries("q25_minhash_lsh")(spark, dir).collect()
      assert(rows.length == 1)
      val r = rows.head
      assert(!r.anyNull, s"nulls in contract row: $r")
      assert(r.getAs[Long]("n_exact") == 0L)
      assert(r.getAs[Long]("n_false_pos") == 0L)
      assert(r.getAs[Boolean]("recall_floor_met"))
    } finally FsUtil.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("q26 contract row is zero-valued, not null, on a dup-free corpus") {
    val dir = dupFreeCorpus()
    try {
      val rows = PipelineQueries.queries("q26_simhash")(spark, dir).collect()
      assert(rows.length == 1)
      val r = rows.head
      assert(!r.anyNull, s"nulls in contract row: $r")
      assert(r.getAs[Long]("n_docs") == 3L)
      assert(r.getAs[Long]("n_missed") == 0L)
      assert(r.getAs[Long]("n_spurious") == 0L)
    } finally FsUtil.deleteRecursively(java.nio.file.Paths.get(dir))
  }
}
