package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.{DecimalScaledDot, FoldHash, GramHashRange, Int8Dot, LshBuckets, MinHashSignature, RandomProjection, SimHash64, SubseqStarts, TokenBuckets, WordShingles}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions, so `spark.sql("SELECT simhash64(text)
  * ...")` works in sessions built with
  * `.withExtensions(new GraftExtensions)` or launched with
  * `spark.sql.extensions=graft.GraftExtensions`.
  *
  * Registered functions:
  * - `simhash64(text)` → BIGINT
  * - `minhash_signature(text, n, numHashes)` → ARRAY<BIGINT>
  * - `decimal_scaled_dot(a, b)` → DOUBLE
  * - `word_shingles(text, n)` → ARRAY<STRING>
  * - `gram_hash_range(text, k)` → ARRAY<BIGINT> (min/max k-gram hash)
  * - `int8_dot(a, b)` → INT (integer dot of int8 code arrays)
  * - `random_projection(vec, outDim)` → ARRAY<BIGINT> (JL ±1 sign
  *   projection at scale-6 quantization)
  * - `lsh_buckets(vec, nTables, nPlanes)` → ARRAY<BIGINT> (random-
  *   hyperplane LSH bucket ids, one long per table)
  * - `fold_hash(text)` → BIGINT (codepoint polynomial fold mod 1e9+7)
  * - `subseq_starts(haystack, needle)` → ARRAY<INT> (1-based phrase
  *   match starts over token arrays)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.all.foreach(ext.injectFunction)
    // pure-range inner joins -> binned equi-joins (config-gated:
    // spark.graft.rangeJoin.binWidth > 0)
    ext.injectOptimizerRule(graft.plans.BinnedRangeJoinRule)
  }
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  /** A scalar parameter of a SQL function must be a foldable integer
    * literal (it becomes part of the expression's shape, not a per-row
    * input). Checked here so `word_shingles(text, n_col)` fails with a
    * clear message at plan time instead of an internal
    * UnresolvedException / NPE / ClassCastException from a blind
    * `eval()`.
    */
  private def intLiteralArg(fn: String, argName: String, e: Expression): Int = {
    require(e.foldable,
      s"$fn: $argName must be an integer literal, got non-foldable ${e.sql}")
    e.eval() match {
      case n: Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"$fn: $argName must be an integer literal, got " +
          (if (other == null) "NULL" else other.getClass.getSimpleName))
    }
  }

  private def boolLiteralArg(fn: String, argName: String, e: Expression): Boolean = {
    require(e.foldable,
      s"$fn: $argName must be a boolean literal, got non-foldable ${e.sql}")
    e.eval() match {
      case b: java.lang.Boolean => b.booleanValue()
      case other => throw new IllegalArgumentException(
        s"$fn: $argName must be a boolean literal, got " +
          (if (other == null) "NULL" else other.getClass.getSimpleName))
    }
  }

  /** The registrations, shared by the extensions class (session-build
    * time, `spark.sql.extensions`) and [[register]] (runtime, for
    * sessions the caller didn't build).
    */
  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(text) - 64-bit SimHash over whitespace tokens"),
      (children: Seq[Expression]) => SimHash64(children.head)),
    (FunctionIdentifier("minhash_signature"),
      info("minhash_signature",
        "minhash_signature(text, n, numHashes) - MinHash over word n-gram shingles"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          "minhash_signature(text, n, numHashes) takes 3 arguments")
        MinHashSignature(children.head,
          intLiteralArg("minhash_signature", "n", children(1)),
          intLiteralArg("minhash_signature", "numHashes", children(2)))
      }),
    (FunctionIdentifier("decimal_scaled_dot"),
      info("decimal_scaled_dot",
        "decimal_scaled_dot(a, b) - exact dot product of float arrays at 6-decimal scale"),
      (children: Seq[Expression]) => DecimalScaledDot(children(0), children(1))),
    (FunctionIdentifier("word_shingles"),
      info("word_shingles",
        "word_shingles(text, n) - distinct word n-gram shingles, order-preserving"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "word_shingles(text, n) takes 2 arguments")
        WordShingles(children.head,
          intLiteralArg("word_shingles", "n", children(1)))
      }),
    (FunctionIdentifier("gram_hash_range"),
      info("gram_hash_range",
        "gram_hash_range(text, k) - [min, max] xxhash64 over character k-grams"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "gram_hash_range(text, k) takes 2 arguments")
        GramHashRange(children.head,
          intLiteralArg("gram_hash_range", "k", children(1)))
      }),
    (FunctionIdentifier("int8_dot"),
      info("int8_dot",
        "int8_dot(a, b) - integer dot product of two array<tinyint> code arrays"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "int8_dot(a, b) takes 2 arguments")
        Int8Dot(children(0), children(1))
      }),
    (FunctionIdentifier("random_projection"),
      info("random_projection",
        "random_projection(vec, outDim) - JL ±1 sign projection of a float array to outDim scale-6 integer coordinates"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "random_projection(vec, outDim) takes 2 arguments")
        RandomProjection(children.head,
          intLiteralArg("random_projection", "outDim", children(1)))
      }),
    (FunctionIdentifier("fold_hash"),
      info("fold_hash",
        "fold_hash(text) - polynomial codepoint fold (acc*31 + cp) mod 1e9+7"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "fold_hash(text) takes 1 argument")
        FoldHash(children.head)
      }),
    (FunctionIdentifier("lsh_buckets"),
      info("lsh_buckets",
        "lsh_buckets(vec, nTables, nPlanes) - random-hyperplane LSH bucket ids (one long per table) of a float array"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          "lsh_buckets(vec, nTables, nPlanes) takes 3 arguments")
        LshBuckets(children.head,
          intLiteralArg("lsh_buckets", "nTables", children(1)),
          intLiteralArg("lsh_buckets", "nPlanes", children(2)))
      }),
    (FunctionIdentifier("subseq_starts"),
      info("subseq_starts",
        "subseq_starts(haystack, needle) - 1-based starts where needle occurs contiguously in haystack (token arrays)"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "subseq_starts(haystack, needle) takes 2 arguments")
        SubseqStarts(children(0), children(1))
      }),
    (FunctionIdentifier("token_buckets"),
      info("token_buckets",
        "token_buckets(text, nBuckets, useBigrams) - unigram(+bigram) polynomial-fold feature bucket ids over whitespace tokens"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          "token_buckets(text, nBuckets, useBigrams) takes 3 arguments")
        TokenBuckets(children.head,
          intLiteralArg("token_buckets", "nBuckets", children(1)),
          boolLiteralArg("token_buckets", "useBigrams", children(2)))
      }))

  /** Register into an ALREADY-RUNNING session's function registry —
    * the path for environments where the session is handed to us
    * (notebooks, the round driver) rather than built with
    * `.withExtensions`.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    all.foreach { case (ident, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(ident.funcName, builder, "built-in")
    }
    // the running-session analog of injectOptimizerRule (idempotent)
    val rule = graft.plans.BinnedRangeJoinRule(spark)
    if (!spark.experimental.extraOptimizations.contains(rule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ rule
  }
}
