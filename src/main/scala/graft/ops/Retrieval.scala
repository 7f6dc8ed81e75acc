package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sparse lexical retrieval: BM25 scoring + top-k ranking — the text
  * counterpart of [[Similarity]]'s dense ANN (reference analytics
  * surface: IowaLiquor-RDS.session.sql's grouped-count rankings; the
  * retrieval generalization is the standard training-data tool for
  * "find the corpus documents most similar to this eval prompt").
  *
  * Scale design (100 TB):
  * - Per-document term frequencies and document length are computed
  *   MAP-SIDE inside the token-array expressions (no corpus-wide
  *   (doc, term) shuffle): `tf` is a `filter` HOF over the doc's own
  *   token array, `dl` is `size`.
  * - The query set is small by definition, so query terms BROADCAST;
  *   corpus postings are semi-joined against them map-side — only
  *   postings for query terms (a sliver) ever reach an exchange.
  * - Document frequency is aggregated over that sliver only (df of a
  *   term is the same whether or not non-query terms are counted).
  * - Ranking is the k-bounded [[TopK]] aggregate: map-side trim to k,
  *   the exchange carries ≤ k rows per query per partition, nothing is
  *   globally sorted.
  *
  * Determinism contract (cross-engine oracle): every per-(query, doc,
  * term) BM25 contribution is derived from integers (tf, df, dl,
  * n_docs) by a FIXED IEEE expression order, then quantized with
  * `floor(x · 10⁶)` to a long. Per-document scores are exact integer
  * sums of those longs — no float-summation order dependence anywhere.
  * Ties rank by ascending doc id.
  */
object Retrieval {

  /** BM25 top-k: for each query document, the `k` best corpus documents
    * under BM25(k1, b) over whitespace tokens.
    *
    * Output: (query_id, rank, doc_id, score6, score) — `score6` is the
    * exact scaled-long score (the comparison key), `score` = score6/10⁶
    * as a double for human consumption.
    *
    * idf = ln(1 + (N − df + 0.5)/(df + 0.5))  (Lucene's non-negative
    * variant), term = idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)).
    */
  def bm25TopK(
      corpus: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, queryIdCol: String, queryTextCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75,
      excludeSelf: Boolean = false): DataFrame = {
    require(k > 0, "k must be positive")
    val docToks = graft.engine.Tables.fanOut(corpus.sparkSession, corpus)
      .select(col(idCol).cast("long").as("doc"),
        TextOps.tokens(col(textCol)).as("w"))
      .withColumn("dl", size(col("w")))
    // map-side postings: one row per DISTINCT term of the doc, tf from
    // the doc's own array — no (doc, term) shuffle. Native one-pass
    // counting kernel (r17, guide §1.2 step 2): the declarative
    // `transform(array_distinct(w), t -> struct(t, size(filter(w,
    // x -> x = t))))` arm — |distinct|·|tokens| interpreted
    // comparisons per document, the profiled hot loop of every
    // retrieval query — stays as the kernel's spec oracle
    // (TermFreqsSpec).
    val postings = docToks
      .select(col("doc"), col("dl"),
        explode(graft.functions.termFreqsNative(col("w"))).as("p"))
      .select(col("doc"), col("dl"), col("p.term").as("term"),
        col("p.tf").as("tf"))
    val qTerms = queries
      .select(col(queryIdCol).cast("long").as("query_id"),
        explode(array_distinct(TextOps.tokens(col(queryTextCol)))).as("term"))
    // corpus-wide scalars: one tiny aggregate (N, avgdl)
    val stats = docToks.agg(
      count(lit(1)).as("n_docs"),
      (sum(col("dl").cast("long")).cast("double") /
        count(lit(1)).cast("double")).as("avgdl"))
    // the matched sliver feeds TWO consumers (the df aggregate and the
    // scoring join) — checkpointed once: the sliver is postings ×
    // query-term match rate, far smaller than re-running the full
    // corpus tokenize+explode+semi pass per consumer (r17; nothing
    // reuses exchanges across subtrees — OPTIMIZATION_r17.md change 3)
    val matched = postings.join(
      broadcast(qTerms.select("term").distinct()), Seq("term"), "left_semi")
      .localCheckpoint(false)
    val dfreq = matched.groupBy("term").agg(count(lit(1)).as("df"))
    val tfD = col("tf").cast("double")
    val scored = matched
      .join(broadcast(dfreq), Seq("term"))
      .join(broadcast(qTerms), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("idf", log(lit(1.0) +
        (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5))))
      .withColumn("s6", floor(col("idf") *
        (tfD * lit(k1 + 1.0) /
          (tfD + lit(k1) * (lit(1.0 - b) +
            lit(b) * col("dl").cast("double") / col("avgdl")))) *
        lit(1000000.0)))
    val perDocAll = scored.groupBy("query_id", "doc")
      .agg(sum(col("s6")).as("score6"))
    // self-exclusion happens BEFORE the k-bounding (a post-filter would
    // leave rank gaps); default keeps the historical include-self
    // semantics for disjoint query/corpus callers
    val perDoc =
      if (excludeSelf) perDocAll.where(col("query_id") =!= col("doc"))
      else perDocAll
    // score6 < 2^53 holds for any real score (capped by idf·(k1+1)·10⁶
    // per term times the query's term count) — exact as the TopK double
    perDoc.groupBy("query_id")
      .agg(TopK.topK(k)(col("score6").cast("double"), col("doc")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("i", "e")))
      .select(col("query_id"), (col("i") + 1).cast("int").as("rank"),
        col("e.key").as("doc_id"), col("e.value").cast("long").as("score6"),
        (col("e.value") / lit(1000000.0)).as("score"))
  }

  /** Exact positional phrase search: for each query phrase, every
    * corpus document containing the phrase as CONSECUTIVE tokens, with
    * occurrence count and first position — the Lucene-style phrase
    * query as one relational join.
    *
    * Formulation (arity-free — phrases of any/mixed length): a phrase
    * occurrence at start s exists iff every (idx, term) of the phrase
    * has a posting (doc, term, s + idx); so candidate rows
    * (qid, doc, pos − idx) from the postings⋈phrase-tokens join are
    * grouped and an occurrence is a group hitting all `m` DISTINCT
    * idx values. Overlapping occurrences count individually; repeated
    * terms inside a phrase are handled by the distinct-idx count.
    *
    * Scale: phrase tokens broadcast (the query set is small by
    * definition); corpus positions are semi-joined to query terms
    * MAP-SIDE before any exchange, so only the matched-term sliver
    * shuffles; the aggregate keys on (qid, doc, start). No corpus
    * (doc, term) materialization for non-query terms, no windows.
    *
    * `phrases` carries (qidCol, phraseCol: array<string>); empty
    * phrases yield no matches. Output:
    * (query_id, doc_id, n_occurrences, first_pos), positions 0-based.
    */
  def phraseOccurrences(corpus: DataFrame, idCol: String, textCol: String,
      phrases: DataFrame, qidCol: String, phraseCol: String): DataFrame = {
    val ptoks = phrases.select(col(qidCol).cast("long").as("qid"),
        posexplode(col(phraseCol)).as(Seq("idx", "term")))
    val plen = phrases.select(col(qidCol).cast("long").as("qid"),
      size(col(phraseCol)).as("m"))
    val postings = graft.engine.Tables.fanOut(corpus.sparkSession, corpus)
      .select(col(idCol).cast("long").as("doc"),
        posexplode(TextOps.tokens(col(textCol))).as(Seq("pos", "term")))
    // the broadcast inner join IS the map-side term filter — postings
    // for non-query terms die here, before any exchange
    val hits = postings.join(broadcast(ptoks), Seq("term"))
      .select(col("qid"), col("doc"), (col("pos") - col("idx")).as("start"),
        col("idx"))
      .groupBy("qid", "doc", "start")
      .agg(countDistinct(col("idx")).as("hit"))
    hits.join(broadcast(plen), Seq("qid"))
      .where(col("hit") === col("m"))
      .groupBy("qid", "doc")
      .agg(count(lit(1)).as("n_occurrences"), min(col("start")).as("first_pos"))
      .select(col("qid").as("query_id"), col("doc").as("doc_id"),
        col("n_occurrences"), col("first_pos"))
  }

  /** The MAP-ONLY formulation of [[phraseOccurrences]] — identical
    * results, zero shuffles: each (doc, phrase) pair is checked inside
    * one codegen'd array expression (every candidate start position
    * verified element-wise), with the phrase set riding a broadcast
    * cross join.
    *
    * When to use which: this one when the phrase set is small (the
    * per-row cost is |phrases| · positions · phrase-length — fine for
    * dozens of phrases, and the shape that drops into a STREAMING scan
    * unchanged, since it needs no state and no exchange); the postings
    * join when the phrase set is large (its cost scales with matched
    * postings, not |phrases| × corpus).
    */
  def phraseOccurrencesMapSide(corpus: DataFrame, idCol: String,
      textCol: String, phrases: DataFrame, qidCol: String,
      phraseCol: String): DataFrame = {
    val ph = phrases.select(col(qidCol).cast("long").as("qid"),
      col(phraseCol).as("ph"))
    // tokenize ONCE per doc BELOW the broadcast join (the projection
    // stays under the join node — |phrases|× re-tokenization was part
    // of the interpreted arm's measured cost), then one compiled
    // window walk per (doc, phrase) via the native kernel
    val toks = graft.engine.Tables.fanOut(corpus.sparkSession, corpus)
      .select(col(idCol).cast("long").as("doc_id"),
        TextOps.tokens(col(textCol)).as("__w"))
    toks.crossJoin(broadcast(ph))
      .where(size(col("ph")) > 0)
      .select(col("qid").as("query_id"), col("doc_id"),
        graft.functions.subseqStartsNative(col("__w"), col("ph")).as("starts"))
      .where(size(col("starts")) > 0)
      .select(col("query_id"), col("doc_id"),
        size(col("starts")).cast("long").as("n_occurrences"),
        (array_min(col("starts")) - 1).cast("int").as("first_pos"))
  }

  /** The pre-r8 interpreted HOF arm of [[phraseOccurrencesMapSide]]'s
    * window check — retained ONLY as the native kernel's spec oracle.
    */
  private[graft] def phraseStartsDeclarative(w: Column, ph: Column): Column =
    when(size(w) >= size(ph),
      filter(
        sequence(lit(1), greatest(size(w) - size(ph) + 1, lit(1))),
        s => size(filter(
          sequence(lit(0), size(ph) - 1),
          j => element_at(w, (s + j).cast("int")) ===
            element_at(ph, (j + 1).cast("int")))) === size(ph)))
    .otherwise(array().cast("array<int>"))

  /** Scale-6 quantized ln-discount gain: `floor(rel·10⁶ / ln(rank+1))`
    * — per-position terms are exact integers, so DCG sums are
    * order-independent and oracle-replayable (the q82/q83 ln
    * discipline applied to ranking evaluation).
    */
  private def gain6(rel: Column, rank: Column): Column =
    floor(rel.cast("double") * lit(1000000.0) /
      log(rank.cast("double") + lit(1.0))).cast("long")

  /** Retrieval quality evaluation — nDCG@k with the ln-position
    * discount: how close a ranked result list comes to the ideal
    * ordering under graded relevance labels, the metric a retrieval
    * pipeline regression-gates on.
    *
    * `ranked` is (query_id, rank, doc_id) — e.g. [[bm25TopK]] output;
    * `relevance` is (query_id, doc_id, rel ≥ 0) graded labels. The
    * ideal ranking takes each query's k highest-relevance docs
    * (rel desc, doc_id asc on ties) — a window PARTITIONED by query
    * over the rel > 0 label slice only (labels are sparse: the dense
    * corpus never enters the window). A query retrieved by `ranked`
    * but with zero relevant labels gets ndcg 0 by convention;
    * queries absent from `ranked` are absent from the output.
    */
  /** Duplicate (query, doc) labels would fan out metric joins AND
    * double-rank ideals — silently inflated metrics. Reject loudly
    * (the prefixSumByBucket convention). NOTE: the guard is an eager
    * action over the label plan — callers deriving labels from a
    * corpus-wide computation (rather than a stored judgment table)
    * should persist/materialize them first or pay the derivation
    * twice.
    */
  private def requireUniqueLabels(rel: DataFrame, op: String): Unit = {
    val s = rel.agg(count(lit(1)),
      count_distinct(col("query_id"), col("doc_id"))).head()
    require(s.getLong(0) == s.getLong(1),
      s"$op: duplicate (query_id, doc_id) relevance labels — " +
        "aggregate judgments upstream (max/mean per pair) first")
  }

  def ndcgAtK(ranked: DataFrame, relevance: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"ndcgAtK: k=$k")
    val rel = relevance.select(col("query_id"), col("doc_id"),
      col("rel").cast("long").as("rel"))
    requireUniqueLabels(rel, "ndcgAtK")
    val dcg = ranked.where(col("rank") <= k)
      .join(rel, Seq("query_id", "doc_id"), "left")
      .groupBy("query_id")
      .agg(sum(gain6(coalesce(col("rel"), lit(0L)), col("rank"))).as("dcg6"))
    val idealW = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("rel").desc, col("doc_id"))
    val ideal = rel.where(col("rel") > 0)
      .withColumn("irank", row_number().over(idealW))
      .where(col("irank") <= k)
      .groupBy("query_id")
      .agg(sum(gain6(col("rel"), col("irank"))).as("idcg6"))
    dcg.join(ideal, Seq("query_id"), "left")
      .select(col("query_id"), col("dcg6"),
        coalesce(col("idcg6"), lit(0L)).as("idcg6"),
        when(coalesce(col("idcg6"), lit(0L)) > 0,
          col("dcg6").cast("double") / col("idcg6").cast("double"))
          .otherwise(lit(0.0)).as("ndcg"))
  }

  /** Rank-based retrieval metrics per query — the binary-relevance
    * companions to [[ndcgAtK]]: reciprocal rank of the FIRST relevant
    * (rel > 0) retrieved doc and recall@k (relevant retrieved in the
    * top k / all relevant). Every number is a ratio of exact integers
    * computed by ONE IEEE division with the same expression shape on
    * both engines — no ln, no quantization needed. Same input
    * contracts as ndcgAtK (unique label pairs enforced there applies
    * here too — this op aggregates per pair, so duplicates would
    * inflate recall's denominator); label-free queries get rr 0 /
    * recall 0 by convention.
    */
  def retrievalMetrics(ranked: DataFrame, relevance: DataFrame,
      k: Int): DataFrame = {
    require(k > 0, s"retrievalMetrics: k=$k")
    val rel = relevance.select(col("query_id"), col("doc_id"),
      col("rel").cast("long").as("rel"))
    requireUniqueLabels(rel, "retrievalMetrics")
    val hits = ranked.where(col("rank") <= k)
      .join(rel.where(col("rel") > 0), Seq("query_id", "doc_id"), "left")
      .groupBy("query_id")
      .agg(
        min(when(col("rel") > 0, col("rank"))).as("first_rel_rank"),
        sum(when(col("rel") > 0, 1L).otherwise(0L)).as("n_hits"))
    val totals = rel.where(col("rel") > 0)
      .groupBy("query_id").agg(count(lit(1)).as("n_relevant"))
    // FULL outer: a query with relevance labels but NO ranked rows
    // (retrieval returned nothing) must score rr 0 / recall 0 — a
    // left join from hits would silently drop exactly the
    // worst-performing queries and overstate every mean.
    hits.join(totals, Seq("query_id"), "full_outer")
      .select(col("query_id"),
        coalesce(col("first_rel_rank"), lit(0)).as("first_rel_rank"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        coalesce(col("n_relevant"), lit(0L)).as("n_relevant"),
        when(col("first_rel_rank").isNotNull,
          lit(1.0) / col("first_rel_rank").cast("double"))
          .otherwise(lit(0.0)).as("reciprocal_rank"),
        when(coalesce(col("n_relevant"), lit(0L)) > 0,
          coalesce(col("n_hits"), lit(0L)).cast("double") /
            col("n_relevant").cast("double"))
          .otherwise(lit(0.0)).as("recall_at_k"))
  }

  /** Reciprocal-rank fusion of N ranked retrieval arms — the standard
    * way a curation pipeline combines lexical (BM25) and dense (ANN)
    * candidate lists into one hybrid ranking without score
    * calibration: rrf(d) = Σ_arms 1/(rrfK + rank_arm(d)), documents
    * absent from an arm contribute 0 (Cormack et al.'s formulation;
    * rrfK = 60 is the canonical damping).
    *
    * Determinism contract (cross-engine oracle): each contribution is
    * ONE IEEE double division off an integer rank, and the fused score
    * is a FIXED-ARITY left-to-right sum in arm order — a plain column
    * expression over the joined row, never a float aggregate over
    * arbitrary row order — so the score replays bit-exactly in any
    * engine. Ties rank by ascending doc id.
    *
    * Scale: the arms carry all the corpus-scale work (BM25's map-side
    * postings, ANN's pruned index probes); fusion touches ≤ arms·k
    * rows PER QUERY — the full-outer joins and the k-bounded TopK
    * ranking run on candidate lists, not the corpus.
    *
    * Each arm: (query_id, doc_id, rank) with rank 1-based (extra
    * columns are dropped). An arm that lists the same (query, doc)
    * twice votes ONCE, at its best rank — the min-rank collapse below
    * makes the contract structural instead of letting a duplicated
    * candidate fan out through the full-outer joins and occupy two
    * top-k slots (r11 review finding); it is a no-op on well-formed
    * arms. Output: (query_id, rank, doc_id, rrf).
    */
  def rrfFuse(arms: Seq[DataFrame], k: Int, rrfK: Int = 60): DataFrame = {
    require(arms.nonEmpty, "rrfFuse: no arms")
    require(k > 0, "k must be positive")
    require(rrfK >= 1, s"rrfK must be ≥ 1, got $rrfK")
    val prepped = arms.zipWithIndex.map { case (a, i) =>
      a.select(col("query_id"), col("doc_id"),
          col("rank").cast("int").as(s"__r$i"))
        .groupBy(col("query_id"), col("doc_id"))
        .agg(min(col(s"__r$i")).as(s"__r$i"))
    }
    val joined = prepped.reduce(
      (l, r) => l.join(r, Seq("query_id", "doc_id"), "full_outer"))
    val fused = prepped.indices
      .map(i => coalesce(
        lit(1.0) / (lit(rrfK.toDouble) + col(s"__r$i").cast("double")),
        lit(0.0)))
      .reduce(_ + _)
    Similarity.rankTopK(
        joined.select(col("query_id"), col("doc_id").as("neighbor_id"),
          fused.as("rrf")),
        k, "rrf")
      .select(col("query_id"), col("rank"), col("neighbor_id").as("doc_id"),
        col("rrf"))
  }

  /** Hybrid lexical + dense retrieval in one call: BM25 over the text
    * corpus and exact-cosine top-k over the embedding corpus (keyed by
    * the same document ids), fused by [[rrfFuse]]. The candidate-list
    * k of each arm is the fusion k — a document missing from one arm
    * can still win on the other, which is the point of RRF.
    *
    * Self-matches are excluded in BOTH arms, inside each arm's own
    * k-bounding: a query doc that is itself in the corpus would
    * otherwise fuse with only its lexical half (the dense arm excludes
    * self) and surface at a distorted half-score (r11 review finding).
    */
  def hybridTopK(corpus: DataFrame, idCol: String, textCol: String,
      vectors: DataFrame, vecIdCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryTextCol: String,
      queryVectors: DataFrame, queryVecIdCol: String, queryVecCol: String,
      k: Int, rrfK: Int = 60): DataFrame = {
    val lex = bm25TopK(corpus, idCol, textCol,
      queries, queryIdCol, queryTextCol, k, excludeSelf = true)
    val dense = Similarity.bruteForceTopK(
        queryVectors.select(col(queryVecIdCol).as("vec_id"),
          col(queryVecCol).as("embedding")),
        vectors.select(col(vecIdCol).as("vec_id"),
          col(vecCol).as("embedding")),
        "vec_id", "embedding", k,
        simFn = (q, c) => graft.functions.cosineExact(q, c),
        simName = "cosine")
      .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
    rrfFuse(Seq(lex, dense), k, rrfK)
  }

  /** Per-document TF-IDF keyword extraction: each document's `k` top
    * terms by `tf · idf6` with `idf6 = floor(10⁶ · ln((N+1)/(df+1)))`
    * (add-one smoothed, scale-6 quantized — the q83 ln discipline, so
    * the score is an exact long product and the ranking replays in
    * any engine; ties break term-ascending). The keyword/topic-label
    * signal a corpus browser or dedup-explainer consumes.
    *
    * Scale: per-(doc, term) counts and docfreq are two hash
    * aggregates over the same postings explode (map-side partial);
    * the idf side is vocab-bounded (auto-broadcasts under the
    * threshold, degrades to a vocab×1 shuffle join above it); the
    * top-k window partitions per doc over that doc's own distinct
    * terms — never a global sort.
    *
    * Output: (doc_id, term, tf, score6, rk), rk 1-based.
    */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"tfidfTopTerms: k=$k")
    val toks = graft.engine.Tables.fanOut(docs.sparkSession, docs)
      .select(col(idCol).cast("long").as("doc_id"),
        TextOps.tokens(col(textCol)).as("w"))
    // per-(doc, term) counts computed MAP-SIDE by the native
    // term-frequency kernel (r17): the per-occurrence explode +
    // groupBy(doc_id, term) it replaces paid a full exchange of one
    // row per token occurrence — plan: 3 Exchange → 2, and the doc's
    // own tf needs no shuffle at all (guide §2.4)
    val tf = toks.select(col("doc_id"),
        explode(graft.functions.termFreqsNative(col("w"))).as("p"))
      .select(col("doc_id"), col("p.term").as("term"),
        col("p.tf").cast("long").as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val idf = df.crossJoin(broadcast(n))
      .select(col("term"),
        floor(log((col("n").cast("double") + lit(1.0)) /
          (col("df").cast("double") + lit(1.0))) * lit(1000000.0)).as("idf6"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id")
      .orderBy(col("score6").desc, col("term"))
    tf.join(idf, Seq("term"))
      .select(col("doc_id"), col("term"), col("tf"),
        (col("tf") * col("idf6")).as("score6"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
  }
}
