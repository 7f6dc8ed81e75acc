package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge discovery — tokenizer TRAINING as a
  * distributed operator (Sennrich et al. 2016's corpus statistics
  * loop, the step every LLM data pipeline runs before it can even
  * count tokens honestly).
  *
  * Scale design (100 TB): the corpus is scanned ONCE, into a
  * (word, count) vocabulary — bounded by language morphology (millions
  * of rows, not corpus-sized) and CAPPED by a deterministic
  * lowest-hash sample ([[DefaultVocabSampleCap]]); merge DISCOVERY
  * then runs on the driver over the collected sample, so training is
  * one distributed job + an in-heap loop whose cost is independent of
  * corpus size — never one Spark job per merge step. Full-corpus
  * ENCODE ([[encode]]/[[fertility]]) applies the learned rules per
  * DISTINCT word, unchanged and unsampled.
  *
  * Merge application semantics (the determinism contract): a word's
  * symbols are kept as a space-joined, space-padded string; applying
  * merge (a,b) is `replace(" a b " → " ab ")` run TWICE. String
  * replace is leftmost-match, rescan-after-replacement in both the
  * JVM and ANSI SQL engines — a chain of overlapping occurrences
  * (which share boundary spaces) merges odd occurrences on the first
  * pass and the now-isolated even ones on the second; a third pass
  * can never match (the rewrite cannot create a new " a b "
  * because symbols are space-free and ab ≠ a). On runs of a
  * SELF-pair (aaaaa…) this differs from per-word left-fold BPE in
  * which occurrence stays unmerged — both are valid deterministic
  * tie-resolutions; this one is chosen because it is exactly
  * reproducible in any engine with standard REPLACE semantics.
  */
object Bpe extends org.apache.spark.internal.Logging {

  /** Space-padded char-symbol string of a word: "the" → " t h e ". */
  private def symbolize(word: org.apache.spark.sql.Column) =
    concat(lit(" "),
      array_join(filter(split(word, ""), c => c =!= ""), " "), lit(" "))

  /** (word, n, sym) vocabulary with corpus occurrence counts. */
  private def vocabulary(docs: DataFrame, textCol: String): DataFrame =
    graft.engine.Tables.fanOut(docs.sparkSession, docs)
      .select(explode(TextOps.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .select(col("n"), symbolize(col("word")).as("sym"))

  /** Adjacent-pair counts over a vocabulary, weighted by word count. */
  private def pairCounts(vocab: DataFrame): DataFrame =
    vocab.select(col("n"), split(trim(col("sym")), " ").as("arr"))
      .where(size(col("arr")) >= 2)
      .select(col("n"), explode(expr(
        "transform(sequence(1, size(arr) - 1), " +
          "j -> struct(arr[j-1] AS a, arr[j] AS b))")).as("g"))
      .groupBy(col("g.a").as("a"), col("g.b").as("b"))
      .agg(sum(col("n")).as("cnt"))

  /** Default merge-discovery vocabulary cap: 2²⁰ distinct words. A
    * natural-language vocabulary rarely exceeds it, so at fixture AND
    * most production scales the sample is the EXACT vocabulary; past
    * it, discovery cost becomes independent of corpus size (the
    * trainingSample discipline — `ops/Similarity.scala`).
    */
  val DefaultVocabSampleCap: Int = 1 << 20

  /** Bounded deterministic (word, count) sample for merge DISCOVERY:
    * the `cap` lowest-xxhash64 words, counts carried unchanged. A
    * TakeOrdered (per-partition heaps + one driver merge) — never a
    * global sort. EXACT (identity) whenever the vocabulary fits the
    * cap, which is what keeps the registered queries' oracles valid;
    * past the cap it is the same uniform hash sample centroid
    * training uses, and frequency ranks of the surviving words are
    * unbiased (the hash is independent of count).
    */
  private def sampleVocabulary(vocab: DataFrame, cap: Int): DataFrame =
    vocab.orderBy(xxhash64(col("sym")), col("sym")).limit(cap)
      .select("n", "sym")

  /** UTF-8-byte lexicographic order — Spark's UTF8String / DuckDB's
    * binary collation, which Java's UTF-16 `compareTo` diverges from
    * on supplementary-plane characters. The driver-side argmax
    * tiebreak MUST use this order to stay bit-identical with the
    * distributed (and SQL-oracle) loops.
    */
  private val utf8Order: Ordering[String] = (a: String, b: String) => {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    var r = 0
    while (r == 0 && i < n) { r = (x(i) & 0xFF) - (y(i) & 0xFF); i += 1 }
    if (r != 0) r else x.length - y.length
  }

  /** The first `nMerges` BPE merge rules learned from the corpus:
    * (step, sym_a, sym_b, pair_count), step 1-based in learning
    * order.
    *
    * Scale design (the r8-verdict fix): the corpus is scanned ONCE
    * into the (word, count) vocabulary, the vocabulary is capped by
    * [[sampleVocabulary]], and the merge loop itself runs ON THE
    * DRIVER over that bounded sample — ONE distributed job total. The
    * previous shape (one pair-count aggregate + argmax + broadcast
    * rewrite job PER STEP, kept below as [[mergesDistributed]]) meant
    * a production 50k-merge vocabulary cost ~100k sequential
    * driver-coordinated jobs; now 50k merges over a ≤ 2²⁰-word sample
    * are a driver loop over in-heap strings — the same
    * train-on-a-bounded-sample discipline as IVF centroids, and what
    * tokenizer trainers do in practice. The driver loop is spec-pinned
    * byte-identical to the distributed loop (same double-REPLACE
    * contract — `String.replace` and SQL REPLACE share leftmost-
    * rescan semantics — same (count desc, pair asc) argmax under
    * UTF-8-byte string order).
    *
    * If the corpus runs out of adjacent pairs before `nMerges` steps
    * (e.g. every word is one char), the exhausted steps emit no row —
    * the output TRUNCATES rather than fabricating a merge; the SQL
    * replay truncates identically (its argmax CTEs go empty).
    */
  def merges(docs: DataFrame, idCol: String, textCol: String,
      nMerges: Int,
      vocabSampleCap: Int = DefaultVocabSampleCap): DataFrame = {
    require(nMerges >= 1 && nMerges <= (1 << 16),
      s"nMerges out of range: $nMerges")
    require(vocabSampleCap >= 2, s"vocabSampleCap too small: $vocabSampleCap")
    val spark = docs.sparkSession
    // ≤ cap+1 rows cross to the driver — bounded by construction. The
    // +1 fetch makes truncation DETECTABLE (the monitoredKeys
    // discipline): a vocabulary of exactly cap words is exact, one of
    // cap+1 is a sample, and the two must not warn identically.
    // TakeOrdered preserves the (hash, sym) sort through collect, so
    // dropping the overflow row leaves exactly the cap lowest-hash
    // sample the un-probed fetch would have produced.
    val fetchN = math.min(vocabSampleCap.toLong + 1L, Int.MaxValue.toLong).toInt
    val fetched = sampleVocabulary(vocabulary(docs, textCol), fetchN)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val sampled =
      if (fetched.length > vocabSampleCap) {
        // discovery runs on a uniform hash SAMPLE — learned rules can
        // diverge from full-vocabulary BPE and pair_count values are
        // sample counts. Callers deserve a runtime signal, not silence.
        logWarning(s"BPE merge discovery vocabulary exceeds vocabSampleCap=" +
          s"$vocabSampleCap: rules are learned from a hash sample, " +
          "pair_count values are sample counts (raise the cap for exact " +
          "full-vocabulary training)")
        fetched.take(vocabSampleCap)
      } else fetched
    val rules = mergesInMemory(sampled, nMerges)
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      rules.map { case (s, a, b, c) => org.apache.spark.sql.Row(s, a, b, c) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("step",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("sym_a",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("sym_b",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("pair_count",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }

  /** Driver-side merge loop over a collected (count, sym) vocabulary —
    * semantics bit-identical to [[mergesDistributed]] (the spec pins
    * it): per step, exact-Long adjacent-pair counts weighted by word
    * count, argmax under (count desc, a asc, b asc) with [[utf8Order]]
    * strings, then the double-REPLACE rewrite of every word. Cost
    * O(nMerges · Σ|sym|) on the driver, independent of corpus size.
    */
  private[graft] def mergesInMemory(vocab: Array[(Long, String)],
      nMerges: Int): Seq[(Int, String, String, Long)] = {
    val counts = vocab.map(_._1)
    val syms = vocab.map(_._2)
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var s = 1
    var exhausted = false
    while (s <= nMerges && !exhausted) {
      val pairCnt = scala.collection.mutable.HashMap.empty[(String, String), Long]
      var i = 0
      while (i < syms.length) {
        val parts = syms(i).trim.split(" ")
        var j = 1
        while (j < parts.length) {
          val key = (parts(j - 1), parts(j))
          pairCnt.update(key, pairCnt.getOrElse(key, 0L) + counts(i))
          j += 1
        }
        i += 1
      }
      if (pairCnt.isEmpty) exhausted = true
      else {
        var best: ((String, String), Long) = null
        pairCnt.foreach { case (k, v) =>
          if (best == null || v > best._2 ||
            (v == best._2 && (utf8Order.compare(k._1, best._1._1) < 0 ||
              (k._1 == best._1._1 && utf8Order.compare(k._2, best._1._2) < 0))))
            best = (k, v)
        }
        val (a, b) = best._1
        out += ((s, a, b, best._2))
        val pat = s" $a $b "
        val rep = s" $a$b "
        i = 0
        while (i < syms.length) {
          syms(i) = syms(i).replace(pat, rep).replace(pat, rep)
          i += 1
        }
        s += 1
      }
    }
    out.result()
  }

  /** The original one-job-per-step distributed merge loop, retained as
    * the SEMANTICS ORACLE the driver loop is spec-pinned against (and
    * the reference implementation of the double-REPLACE contract in
    * an engine-neutral form). Not on any registered query path — at
    * production merge counts it is ~2 driver-coordinated jobs per
    * step; use [[merges]].
    */
  private[graft] def mergesDistributed(docs: DataFrame, idCol: String,
      textCol: String, nMerges: Int): DataFrame = {
    require(nMerges >= 1 && nMerges <= 8, s"nMerges out of range: $nMerges")
    var vocab = vocabulary(docs, textCol).localCheckpoint(true)
    val steps = (1 to nMerges).map { s =>
      val top = pairCounts(vocab)
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc).limit(1)
      val pat = concat(lit(" "), col("a"), lit(" "), col("b"), lit(" "))
      val rep = concat(lit(" "), col("a"), col("b"), lit(" "))
      vocab = vocab.crossJoin(broadcast(top))
        .select(col("n"),
          replace(replace(col("sym"), pat, rep), pat, rep).as("sym"))
        .localCheckpoint(true)
      top.select(lit(s).as("step"), col("a").as("sym_a"),
        col("b").as("sym_b"), col("cnt").as("pair_count"))
    }
    steps.reduce(_ unionAll _)
  }

  /** Apply the learned merge rules to a frame carrying a `sym`
    * column, one broadcast rewrite per step — the single home of the
    * double-REPLACE determinism contract shared by [[fertility]] and
    * [[encode]].
    *
    * A step whose rule row is ABSENT (merge exhaustion truncated
    * [[merges]]' output) leaves the frame UNCHANGED: the rule side is
    * aggregated to exactly one row (null sym_a/sym_b when empty), so
    * an exhausted step can never annihilate the vocabulary the way a
    * crossJoin against an empty frame would (found in review: a
    * corpus of single-character words returned zero rows — and
    * therefore n_tokens = 0 for every document — instead of encoding
    * under the truncated rule set).
    */
  private def applyMerges(frame: DataFrame, ruleRows: DataFrame,
      nMerges: Int): DataFrame =
    (1 to nMerges).foldLeft(frame) { (v, s) =>
      val rule = ruleRows.where(col("step") === s)
        .agg(max(col("sym_a")).as("sym_a"), max(col("sym_b")).as("sym_b"))
      val pat = concat(lit(" "), col("sym_a"), lit(" "), col("sym_b"), lit(" "))
      val rep = concat(lit(" "), col("sym_a"), col("sym_b"), lit(" "))
      v.crossJoin(broadcast(rule))
        .withColumn("sym", when(col("sym_a").isNotNull,
          replace(replace(col("sym"), pat, rep), pat, rep))
          .otherwise(col("sym")))
        .drop("sym_a", "sym_b")
    }

  /** Corpus ENCODE with the learned tokenizer — the third leg of the
    * BPE story (train [[merges]] → diagnose [[fertility]] → encode):
    * per-document subword counts under the first `nMerges` learned
    * rules, i.e. the honest "how many tokens does this corpus cost"
    * number a budget/mixture pipeline needs.
    *
    * Scale design: the vocabulary-collapse trick again — merge
    * application runs per DISTINCT word (morphology-bounded), never
    * per occurrence; the corpus then joins word → symbol-count and
    * aggregates per document. The word→count side is vocabulary-sized
    * (Catalyst auto-broadcasts it under the threshold; at a
    * multi-million-word vocabulary it degrades gracefully to a
    * shuffle join on `word`, which is still vocab×1 — never
    * corpus×corpus).
    *
    * Output: (idCol, n_tokens, n_subwords, doc_fertility) — fertility
    * null for token-less documents (no division pole).
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      nMerges: Int): DataFrame = {
    val ruleRows = merges(docs, idCol, textCol, nMerges)
    val wordVocab = graft.engine.Tables.fanOut(docs.sparkSession, docs)
      .select(explode(TextOps.tokens(col(textCol))).as("word"))
      .distinct()
      .select(col("word"), symbolize(col("word")).as("sym"))
    val rewritten = applyMerges(wordVocab, ruleRows, nMerges)
    val wordSyms = rewritten.select(col("word"),
      size(split(trim(col("sym")), " ")).cast("long").as("n_syms"))
    val docWords = docs.select(col(idCol),
      explode(TextOps.tokens(col(textCol))).as("word"))
    val agg = docWords.join(wordSyms, Seq("word"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("n_syms")).as("n_subwords"))
    docs.select(col(idCol)).join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_subwords"), lit(0L)).as("n_subwords"),
        when(coalesce(col("n_tokens"), lit(0L)) > 0,
          col("n_subwords").cast("double") / col("n_tokens").cast("double"))
          .as("doc_fertility"))
  }

  /** Tokenizer-fertility report: apply the first `nMerges` learned
    * merges to the whole corpus and report symbols-per-word for each
    * language — the standard "how well does this tokenizer serve each
    * language" diagnostic (fertility ≫ 1 means the language pays more
    * sequence length per word).
    *
    * Scale: merge application is per DISTINCT (lang, word) — the
    * corpus collapses to a per-language vocabulary first, the merges
    * ride a 1-row broadcast each, and the final report is one hash
    * aggregate. `fertility` is one double division of exact longs.
    */
  def fertility(docs: DataFrame, idCol: String, textCol: String,
      langCol: String, nMerges: Int): DataFrame = {
    val ruleRows = merges(docs, idCol, textCol, nMerges)
    val langVocab = graft.engine.Tables.fanOut(docs.sparkSession, docs)
      .select(col(langCol).as("lang"),
        explode(TextOps.tokens(col(textCol))).as("word"))
      .groupBy("lang", "word").agg(count(lit(1)).as("n"))
      .select(col("lang"), col("n"), symbolize(col("word")).as("sym"))
    val rewritten = applyMerges(langVocab, ruleRows, nMerges)
    rewritten
      .select(col("lang"), col("n"),
        size(split(trim(col("sym")), " ")).cast("long").as("n_syms"))
      .groupBy("lang")
      .agg(sum(col("n")).as("n_words"),
        sum(col("n") * col("n_syms")).as("n_symbols"))
      .select(col("lang"), col("n_words"), col("n_symbols"),
        (col("n_symbols").cast("double") / col("n_words").cast("double"))
          .as("fertility"))
  }
}
