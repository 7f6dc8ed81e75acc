package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.functions.money
import graft.ops.{BloomPrune, Packing, RangeJoin, ScalableWindows, Scd2, Sketches, TextOps}

/** Scale-pattern operators as registered queries: runtime-filter
  * (bloom) join pruning, binned range join, SCD2 dimension versioning,
  * mergeable sketches. These are the shapes that distinguish a 100 TB
  * plan from a laptop plan; each exact-output one has a DuckDB oracle.
  */
object ScaleQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(

    // Bloom-filter join pruning (runtime-filter pattern): lineitems of
    // one brand's parts — bloom prunes the fact scan in-place, exact
    // broadcast semi join removes false positives; output is exact.
    "q49_bloom_semi" -> { (s, dir) =>
      val dim = Tables.part(s, dir).where(col("p_brand") === "Brand#19")
      BloomPrune.bloomSemiJoin(
          Tables.lineitem(s, dir), "l_partkey", dim, "p_partkey",
          expectedItems = 1000L)
        .agg(count(lit(1)).as("n"),
          sum(money(col("l_extendedprice"))).cast("double").as("revenue"))
    },

    // Binned range join: lineitem ship events falling inside the
    // 3-day windows of the 10 highest-numbered orders — equi-join on
    // time bin + exact predicate instead of a nested-loop theta join.
    "q50_range_join" -> { (s, dir) =>
      val iv = Tables.orders(s, dir)
        .orderBy(col("o_orderkey").desc).limit(10)
        .select(col("o_orderkey"), col("o_orderdate").as("ws"),
          (col("o_orderdate") + expr("INTERVAL 3 DAYS")).as("we"))
      val matched = RangeJoin.binnedRangeJoinTs(
          Tables.lineitem(s, dir).select("l_orderkey", "l_extendedprice", "l_shipdate"),
          "l_shipdate", iv, "ws", "we", binWidthSeconds = 3L * 86400)
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n_matched"),
          sum(money(col("l_extendedprice"))).as("rev_dec"))
      iv.select("o_orderkey").join(matched, Seq("o_orderkey"), "left")
        .select(col("o_orderkey"),
          coalesce(col("n_matched"), lit(0L)).as("n"),
          coalesce(col("rev_dec").cast("double"), lit(0.0)).as("revenue"))
        .orderBy("o_orderkey")
    },

    // SCD2 dimension merge: customers with custkey%14=0 arrive changed
    // (segment -> PROMO, acctbal +100), custkey%7=0 but %14!=0 arrive
    // identical (must NOT version), everyone else is absent from the
    // feed. One full-outer join on the key — no windows, no iteration.
    "q51_scd2_merge" -> { (s, dir) =>
      val attrs = Seq("c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      val current = Tables.customer(s, dir).select(
        (col("c_custkey") +: attrs.map(col)) :+
          lit("1995-01-01").cast("timestamp").as("valid_from") :+
          lit(null).cast("timestamp").as("valid_to"): _*)
      val incoming = Tables.customer(s, dir)
        .where(col("c_custkey") % 7 === 0)
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
          when(col("c_custkey") % 14 === 0, col("c_acctbal") + 100.0)
            .otherwise(col("c_acctbal")).as("c_acctbal"),
          when(col("c_custkey") % 14 === 0, lit("PROMO"))
            .otherwise(col("c_mktsegment")).as("c_mktsegment"))
      Scd2.merge(current, incoming, "c_custkey", attrs,
          asOf = lit("2000-01-01").cast("timestamp"))
        .orderBy("c_custkey", "valid_from")
    },

    // Count-min heavy hitters: distributed sketch build, estimates for
    // the (small) candidate key set. The estimate VALUE is sketch-
    // specific, but count-min carries a one-sided GUARANTEE the oracle
    // states exactly: est ≥ true always, and est ≤ true + eps·N (holds
    // w.p. 1−δ per build; deterministic for fixed data+seed). True
    // per-key counts ride along exactly.
    "q52_countmin_topk" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      // bounded monitored-key derivation (loud failure past the cap —
      // never an unbounded distinct-collect to the driver)
      val keys = Sketches.monitoredKeys(ev, col("event_type"))
      val eps = 1e-3
      val est = Sketches.countMinEstimates(ev, col("event_type"), keys, eps = eps)
      val truth = ev.groupBy(col("event_type").as("key"))
        .agg(count(lit(1)).as("n_true"))
      val total = ev.agg(count(lit(1)).as("__n_total"))
      est.join(truth, "key").crossJoin(broadcast(total))
        .select(col("key"), col("n_true"),
          (col("est") >= col("n_true")).as("ge_true"),
          (col("est") <= col("n_true")
            + ceil(col("__n_total") * eps)).as("le_bound"))
        .orderBy("key")
    },

    // HLL sketch rollup: daily user sketches merged to a single
    // month estimate — pre-aggregation that re-aggregates to any
    // coarser grain without touching raw data. The compared output is
    // the merge CONTRACT: the unioned estimate lands within 5% of the
    // exact overall distinct count (lgConfigK 12 ⇒ ~1.6% se;
    // deterministic for fixed data). Exact count rides along.
    "q53_hll_union" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val daily = Sketches.hllSketches(
        ev, Seq(to_date(col("ts")).as("day")), col("user_id"))
      val est = Sketches.hllRollup(daily, Seq(lit(1).as("one")), "users_est")
        .select(col("users_est").cast("double").as("users_est"))
      val exact = ev.agg(countDistinct(col("user_id")).as("n_users"))
      est.crossJoin(broadcast(exact))
        .select(col("n_users"),
          (abs(col("users_est") - col("n_users"))
            <= col("n_users") * 0.05).as("within_tol"))
    },

    // TF-IDF, scaled-integer variant: idf = (1e6·N) div df keeps the
    // whole score in BIGINT arithmetic (ln() differs in final ulps
    // across libm implementations — not oracle-safe). df is derived
    // from the tf aggregate (one explode, two aggregations), the
    // doc subset filter applies to tf only — df stays corpus-global.
    // N enters the plan as a broadcast 1-row aggregate (cross join),
    // not a driver-side count() — the whole query is ONE job.
    "q54_tfidf" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      import graft.ops.TextOps
      val docs = Tables.documents(s, dir)
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      val tfAll = docs
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
        .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      val dfreq = tfAll.groupBy("token").agg(count(lit(1)).as("df"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("token"))
      tfAll.where(col("doc_id") < 50)
        .join(dfreq, "token")
        .crossJoin(broadcast(nDocs))
        .withColumn("score", expr("tf * ((1000000 * n_docs) div df)"))
        .withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= 3)
        .select(col("doc_id"), col("token"), col("tf"), col("score"), col("rnk"))
        .orderBy("doc_id", "rnk")
    },

    // Stratified exact-fraction sampling (per-language 10%):
    // deterministic systematic sample, window-partitioned by stratum.
    "q55_stratified_sample" -> { (s, dir) =>
      graft.ops.Sampling.stratifiedExact(
          Tables.documents(s, dir), col("lang"), col("doc_id"), 0.1)
        .select(col("lang"), col("doc_id"))
        .orderBy("lang", "doc_id")
    },

    // Deterministic train/val/test hash split: assignment is a pure
    // function of doc_id (stable under retries/re-partitioning, unlike
    // randomSplit). Per-split sizes are hash-specific, but the split
    // CONTRACT is SQL-stateable and the oracle checks it hash-exact:
    // every row assigned (exhaustive), each doc exactly once (disjoint),
    // only the three requested labels, all three non-empty, and the
    // train fraction within 5 points of the requested 80%.
    "q56_hash_split" -> { (s, dir) =>
      graft.ops.Sampling.hashSplit(
          Tables.documents(s, dir), col("doc_id"),
          Seq("train" -> 80, "val" -> 10, "test" -> 10))
        .agg(
          count(lit(1)).as("n_rows"),
          countDistinct(col("doc_id")).as("n_docs"),
          countDistinct(col("split")).as("n_splits"),
          sum(when(col("split").isin("train", "val", "test"), 0L)
            .otherwise(1L)).as("bad_labels"),
          (abs(avg(when(col("split") === "train", 1.0).otherwise(0.0)) - 0.8)
            < 0.05).as("train_frac_ok"))
    },

    // Sequence packing: curated docs -> fixed-token-budget training
    // sequences (chunk oversized, then best-fit-decreasing within
    // partition — the distributed packing contract). The sequence
    // LAYOUT depends on partitioning, but the packing CONTRACT is
    // SQL-stateable and the oracle checks it hash-exact: the chunk
    // pre-stage yields exactly ceil(tokens/budget) chunks per doc with
    // total token mass conserved, no chunk and (after chunking) no
    // SEQUENCE exceeds the budget, and every sequence is non-empty
    // (n_sequences ≤ n_chunks as a count identity via min 1 chunk/seq).
    "q63_pack_sequences" -> { (s, dir) =>
      import graft.ops.{Packing, TextOps}
      val budget = 512L
      val withTokens = Tables.documents(s, dir)
        .select(col("doc_id"), TextOps.bpeishTokenCount(col("text")).as("n_tokens"))
      // chunk index < 2^32 by construction (ceil(tokens/512) chunks),
      // so a 32-bit shift keys (doc, chunk) collision-free
      val chunks = Packing.chunkOversized(withTokens, "doc_id", "n_tokens", budget)
        .select((col("doc_id") * lit(1L << 32) + col("chunk")).as("chunk_id"),
          col("n_tokens"))
      val packed = Packing.packBestFitDecreasing(chunks, "chunk_id", "n_tokens", budget)
      val seqs = packed.groupBy("seq_id")
        .agg(sum(col("n_tokens")).as("seq_tokens"), count(lit(1)).as("n_chunks"))
      seqs.agg(
        sum(col("n_chunks")).as("n_chunks"),
        sum(col("seq_tokens")).as("token_mass"),
        sum(when(col("seq_tokens") > budget, 1L).otherwise(0L)).as("n_overflow_seqs"),
        sum(when(col("n_chunks") < 1, 1L).otherwise(0L)).as("n_empty_seqs"),
        (count(lit(1)) <= sum(col("n_chunks"))).as("seq_count_le_chunks"))
    },

    // Global token-stream layout: docs laid end-to-end in doc_id order,
    // each assigned its exclusive-prefix-sum start offset and the fixed
    // 2048-token training windows it spans. The offsets come from the
    // two-phase partitioned prefix sum (arithmetic bucketing + bounded
    // driver scan of bucket totals) — never a single-partition window.
    "q108_token_stream" -> { (s, dir) =>
      val withTokens = Tables.documents(s, dir)
        .select(col("doc_id"), TextOps.bpeishTokenCount(col("text")).as("n_tokens"))
      Packing.tokenStreamOffsets(withTokens, "doc_id", "n_tokens",
        window = 2048L, nBuckets = 64)
    },

    // Data-loader manifest for the token stream: which slice of which
    // doc fills each fixed 2048-token window — bounded map-side explode
    // over the q108 layout, no shuffle (window ids are arithmetic).
    "q109_window_manifest" -> { (s, dir) =>
      val withTokens = Tables.documents(s, dir)
        .select(col("doc_id"), TextOps.bpeishTokenCount(col("text")).as("n_tokens"))
      val offsets = Packing.tokenStreamOffsets(withTokens, "doc_id", "n_tokens",
        window = 2048L, nBuckets = 64)
      Packing.windowManifest(offsets, window = 2048L)
    },

    // Block-diagonal attention segments over the q109 manifest: the
    // boundary/reset positions a trainer derives its attention mask
    // from, so packed documents cannot attend across each other. Per
    // window: 1-based segment index in stream order, 0-based start,
    // slice length — the only window function partitions by
    // window_id over that window's own rows (bounded by docs per
    // window, never corpus rows).
    "q148_attention_segments" -> { (s, dir) =>
      val withTokens = Tables.documents(s, dir)
        .select(col("doc_id"), TextOps.bpeishTokenCount(col("text")).as("n_tokens"))
      val offsets = Packing.tokenStreamOffsets(withTokens, "doc_id", "n_tokens",
        window = 2048L, nBuckets = 64)
      Packing.windowSegments(Packing.windowManifest(offsets, window = 2048L))
        .orderBy("window_id", "seg_idx")
    },

    // Length-bucketed batch assembly for VARIABLE-length training
    // (SFT/eval, padded to the batch max — the other loader shape
    // besides the packed token stream): sorting by length before
    // batching makes Σ batch·max_len hug the true token mass. The row
    // reports the padding economics of the sorted assembly against
    // doc-id-order batching on identical data — both arms exact
    // integer arithmetic over the same global-rank machinery.
    "q150_length_batches" -> { (s, dir) =>
      import graft.ops.ScalableWindows
      val src = Tables.documents(s, dir)
        .select(col("doc_id"),
          TextOps.bpeishTokenCount(col("text")).cast("long").as("n_tokens"))
        // both arms' rank machinery takes several passes over this
        // frame; tokenize the corpus once, not ~7 times
        .localCheckpoint(false)
      def summary(assign: DataFrame, strategy: String) =
        assign.groupBy("batch_id")
          .agg(count(lit(1)).as("nd"), max(col("n_tokens")).as("mx"),
            sum(col("n_tokens")).as("sm"))
          .agg(count(lit(1)).as("n_batches"),
            sum(col("nd") * col("mx")).as("total_cost"),
            sum(col("sm")).as("total_tokens"))
          .select(lit(strategy).as("strategy"), col("n_batches"),
            col("total_cost"), col("total_tokens"),
            expr("(total_cost - total_tokens) * 1000000 div total_cost")
              .as("pad_share6"))
      val sorted = Packing.lengthBucketedBatches(src, "doc_id", "n_tokens",
        batchSize = 32, nBuckets = 64)
      val naive = ScalableWindows.prefixSumByBucket(
          src.withColumn("__one", lit(1L)), "doc_id", "__one", "__rank",
          nBuckets = 64)
        .withColumn("batch_id", expr("__rank div 32L"))
        .select(col("doc_id"), col("n_tokens"), col("batch_id"))
      summary(sorted, "length_sorted")
        .unionByName(summary(naive, "docid_order"))
        .orderBy("strategy")
    },

    // Shard integrity manifest + loader-side verification: a portable
    // exact-integer polynomial checksum per shard over the manifest's
    // (window, doc, start, len) rows, written next to the layout;
    // before training the loader recomputes under the EXPECTED shard
    // geometry and compares — a flipped length is pinned to exactly
    // its shard (the in-row tamper arm), while the untouched manifest
    // self-verifies clean.
    "q149_shard_integrity" -> { (s, dir) =>
      val withTokens = Tables.documents(s, dir)
        .select(col("doc_id"), TextOps.bpeishTokenCount(col("text")).as("n_tokens"))
      val manifest = Packing.windowManifest(
          Packing.tokenStreamOffsets(withTokens, "doc_id", "n_tokens",
            window = 2048L, nBuckets = 64), window = 2048L)
        .localCheckpoint(false) // feeds checksums + two verify arms
      val expected = Packing.shardChecksums(manifest, nShards = 8)
        .localCheckpoint(false) // feeds both verifies + the output row
      val selfOk = Packing.verifyShards(manifest, 8, expected)
        .select(col("shard"), col("ok").as("self_ok"))
      // tamper exactly ONE manifest row — (window 0, doc 0) exists at
      // every scale (doc 0 opens the stream); slice_start === 0 would
      // hit EVERY doc that starts inside window 0 (r11 review finding)
      val tampered = manifest.withColumn("tokens_in_window",
        when(col("window_id") === 0 && col("doc_id") === 0,
          col("tokens_in_window") + 1).otherwise(col("tokens_in_window")))
      val flags = Packing.verifyShards(tampered, 8, expected)
        .select(col("shard"), (!col("ok")).as("tamper_flagged"))
      expected.join(selfOk, Seq("shard")).join(flags, Seq("shard"))
        .orderBy("shard")
    },

    // Contiguous data-loader shards over the token-stream manifest:
    // 8 workers each own a contiguous window range of the packed
    // stream (sequential IO per worker; every shard exactly span
    // windows except the tail shard), token mass conserved — the
    // multi-GPU loader assignment, all pure window-id arithmetic
    // (no join, no sort).
    "q136_loader_shards" -> { (s, dir) =>
      val withTokens = Tables.documents(s, dir)
        .select(col("doc_id"), TextOps.bpeishTokenCount(col("text")).as("n_tokens"))
      val offsets = Packing.tokenStreamOffsets(withTokens, "doc_id", "n_tokens",
        window = 2048L, nBuckets = 64)
      Packing.shardManifest(
          Packing.windowManifest(offsets, window = 2048L), nShards = 8)
        .orderBy("shard")
    },

    // Loader READ path: the first five training windows REHYDRATED
    // into batch text — manifest slices pulled out of each document's
    // own whitespace tokens (count basis == slice basis), the
    // layout arithmetic turned back into model input. Window filter
    // BEFORE the join keeps unneeded docs out of it.
    "q137_window_rehydrate" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val withTokens = docs.select(col("doc_id"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
      val offsets = Packing.tokenStreamOffsets(withTokens, "doc_id", "n_tokens",
        window = 256L, nBuckets = 64)
      val manifest = Packing.windowManifest(offsets, window = 256L)
        .where(col("window_id") < 5)
      Packing.rehydrateWindows(manifest, docs, "doc_id", "text")
        .orderBy("window_id", "doc_id")
    },

    // Skew mitigation, driver-checked: the salted join (small side
    // replicated saltFactor×, hot keys splintered across 8 sub-keys)
    // composed with the salted two-phase aggregation — row-identical
    // to the plain join+groupBy by construction (salting only
    // redistributes), so the whole skew-handling path is hash-exact
    // against the unsalted SQL. Decimal sums keep the merge exact.
    "q115_salted_skew" -> { (s, dir) =>
      import graft.ops.Skew
      val li = Tables.lineitem(s, dir).select(
        col("l_suppkey").as("suppkey"), money(col("l_extendedprice")).as("rev"),
        col("l_orderkey"), col("l_linenumber"))
      val sup = Tables.supplier(s, dir)
        .select(col("s_suppkey").as("suppkey"), col("s_nationkey"))
      val joined = Skew.saltedJoin(li, sup, "suppkey",
        saltFactor = 8, largeSaltCols = Seq("l_orderkey", "l_linenumber"))
      Skew.saltedSumCount(joined, "s_nationkey", "rev",
          saltFactor = 8, saltCols = Seq("suppkey", "l_orderkey", "l_linenumber"))
        .select(col("s_nationkey"), col("sum").cast("double").as("revenue"),
          col("count").as("n"))
        .orderBy("s_nationkey")
    },

    // Deterministic multi-epoch shuffle order: each training epoch
    // re-permutes the corpus with a bijective odd-multiplier hash
    // (doc_id·m mod 2³² is a permutation of the id domain for any odd
    // m), and every (epoch, doc) gets its GLOBAL position in the
    // epoch-concatenated stream from the bucketed prefix sum — the
    // multi-epoch data-loader ordering, computed without a global
    // single-partition sort. doc_id must stay < 2³¹ (dense-id
    // contract); ANSI overflow rejects wider ids loudly.
    "q111_epoch_shuffle" -> { (s, dir) =>
      val epochs = 3
      val mults = Seq(2654435761L, 2246822519L, 3266489917L)
      val exploded = Tables.documents(s, dir).select(col("doc_id"))
        .select(col("doc_id"),
          explode(sequence(lit(0), lit(epochs - 1))).as("epoch"))
        .withColumn("shuffle_key",
          pmod(col("doc_id") * element_at(typedLit(mults), col("epoch") + 1),
            lit(4294967296L)))
        .withColumn("__ord",
          col("epoch").cast("long") * lit(8589934592L) + col("shuffle_key"))
        .withColumn("__one", lit(1L))
      ScalableWindows.prefixSumByBucket(
          exploded, "__ord", "__one", "stream_pos", nBuckets = 64)
        .select("epoch", "doc_id", "shuffle_key", "stream_pos")
    },

    // Incremental aggregate maintenance: a pre-aggregated "state"
    // (orders before 1998) merged with a partial aggregate of the new
    // "delta" partition — re-aggregation is exact because the decimal
    // sum is associative, so the merged table is bit-identical to a
    // full recompute (the oracle computes the full recompute). The
    // pattern that replaces rescanning history on every batch.
    "q62_incremental_agg" -> { (s, dir) =>
      def daily(df: DataFrame) = df
        .groupBy(to_date(col("o_orderdate")).cast("timestamp").as("day"))
        .agg(sum(money(col("o_totalprice"))).as("rev_dec"),
          count(lit(1)).as("n"))
      val orders = Tables.orders(s, dir)
      val state = daily(orders.where(col("o_orderdate") < "1998-01-01"))
      val delta = daily(orders.where(col("o_orderdate") >= "1998-01-01"))
      state.unionByName(delta)
        .groupBy("day")
        .agg(sum(col("rev_dec")).as("rev_dec"), sum(col("n")).as("n"))
        .select(col("day"), col("rev_dec").cast("double").as("revenue"), col("n"))
        .orderBy("day")
    },

    // Declarative data-quality report: all row-local checks in ONE
    // conditional-aggregation pass, plus a uniqueness self-agg and a
    // broadcast-anti FK check — the generalized form of the
    // reference's NOT NULL / PRIMARY KEY / FK constraints.
    "q61_quality_report" -> { (s, dir) =>
      import graft.ops.Quality._
      audit(Tables.lineitem(s, dir), Seq(
        NotNull("l_orderkey"),
        InRange("l_quantity", 1, 50),
        Matches("l_returnflag", "^[ARN]$"),
        Unique(Seq("l_orderkey", "l_linenumber")),
        FkIn("l_orderkey", Tables.orders(s, dir), "o_orderkey")))
    },

    // Edit-distance near-dup pairs: (lang, length-bucket) equality
    // blocking -> Levenshtein verify. Both engines implement standard
    // unit-cost edit distance -> oracle-exact.
    "q60_editdist_pairs" -> { (s, dir) =>
      import graft.ops.Dedup
      val d = Tables.documents(s, dir)
      Dedup.editDistancePairs(d, "doc_id", "text",
          struct(col("lang"), expr("n_chars div 40")),
          maxDist = 20)
        .orderBy("id_a", "id_b")
    },

    // Top-k per group as a PARTIAL-AGGREGATING operator (bounded heap
    // in the aggregation buffer): map-side combine trims to k before
    // the shuffle — vs the window formulation (q15) that sorts every
    // group's every row. Same result as q15's ranking, oracle-exact.
    "q59_topk_agg" -> { (s, dir) =>
      import graft.ops.TopK
      val rev = Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_partkey"))
        .agg(sum(money(col("l_extendedprice"))).cast("double").as("revenue"))
      rev.groupBy(col("p_brand"))
        .agg(TopK.topK(3)(col("revenue"), col("p_partkey")).as("top"))
        .select(col("p_brand"), posexplode(col("top")))
        .select(col("p_brand"), col("col.key").as("p_partkey"),
          col("col.value").as("revenue"), (col("pos") + 1).cast("int").as("rnk"))
        .orderBy("p_brand", "rnk")
    },

    // Forward as-of join with tolerance (pandas merge_asof semantics):
    // each event picks the EARLIEST signup at-or-after it, nulled when
    // farther than 1 hour. Same union+window shape as backward (q38) —
    // one shuffle, no range join.
    "q58_asof_forward" -> { (s, dir) =>
      import graft.ops.AsofJoin
      val ev = Tables.events(s, dir)
        .withColumn("ts_s", date_trunc("second", col("ts")))
      val signups = ev.where(col("event_type") === "signup")
        .withColumn("__rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("user_id"), col("ts_s"))
            .orderBy(col("event_id").desc)))
        .where(col("__rn") === 1)
        .select(col("user_id"), col("ts_s"), col("value").as("signup_value"))
      val others = ev.where(col("event_type") =!= "signup")
        .select("event_id", "user_id", "ts_s")
      AsofJoin.asofJoin(others, signups, "user_id", "ts_s",
          Seq("signup_value"), direction = "forward",
          toleranceSeconds = Some(3600L))
        .select("event_id", "user_id", "signup_value")
        .orderBy("event_id")
    },

    // Grouped approximate percentiles (KLL-style mergeable sketch,
    // deterministic): the fixed-memory path where exact per-group
    // percentiles (q42) would need a full sort per group. Sketch
    // values differ from DuckDB's t-digest, so the compared output is
    // the RANK-ERROR contract percentile_approx guarantees (error ≤
    // n/accuracy): for each group and q ∈ {.5,.95,.99}, the number of
    // values ≤/< the approximate quantile brackets rank q·n within
    // n/1000 (+1 slack for ties). Checked by counting against the
    // group's own rows; the oracle states per-group counts + TRUE.
    "q57_approx_percentiles" -> { (s, dir) =>
      val ev = Tables.events(s, dir).select("event_type", "value")
      val ap = ev.groupBy("event_type").agg(
        percentile_approx(col("value"), lit(0.5), lit(1000)).as("p50"),
        percentile_approx(col("value"), lit(0.95), lit(1000)).as("p95"),
        percentile_approx(col("value"), lit(0.99), lit(1000)).as("p99"))
      def rankOk(q: Double, p: String) = {
        val n = count(lit(1)).cast("double")
        val tol = n / 1000.0 + 1.0
        (sum(when(col("value") < col(p), 1.0).otherwise(0.0)) <= n * q + tol) &&
          (sum(when(col("value") <= col(p), 1.0).otherwise(0.0)) >= n * q - tol)
      }
      ev.join(broadcast(ap), "event_type")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_rows"),
          rankOk(0.5, "p50").as("p50_ok"),
          rankOk(0.95, "p95").as("p95_ok"),
          rankOk(0.99, "p99").as("p99_ok"))
        .orderBy("event_type")
    }
  )

  val oracleSql: Map[String, String] = Map(

    "q108_token_stream" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |o AS (
        |  SELECT doc_id, n_tokens,
        |         CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
        |  FROM t)
        |SELECT doc_id, n_tokens, start_offset,
        |       CASE WHEN n_tokens > 0 THEN start_offset // 2048 END AS first_window,
        |       CASE WHEN n_tokens > 0 THEN (start_offset + n_tokens - 1) // 2048 END AS last_window
        |FROM o
        |""".stripMargin,

    "q109_window_manifest" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |o AS (
        |  SELECT doc_id, n_tokens,
        |         CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
        |  FROM t),
        |m AS (
        |  SELECT doc_id, n_tokens, start_offset,
        |         unnest(generate_series(start_offset // 2048, (start_offset + n_tokens - 1) // 2048)) AS window_id
        |  FROM o WHERE n_tokens > 0)
        |SELECT window_id, doc_id,
        |       GREATEST(window_id * 2048, start_offset) - start_offset AS slice_start,
        |       LEAST((window_id + 1) * 2048, start_offset + n_tokens)
        |         - GREATEST(window_id * 2048, start_offset) AS tokens_in_window
        |FROM m
        |""".stripMargin,

    "q150_length_batches" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |s AS (
        |  SELECT n_tokens,
        |         (row_number() OVER (ORDER BY n_tokens, doc_id) - 1) // 32 AS batch_id
        |  FROM t),
        |n AS (
        |  SELECT n_tokens,
        |         (row_number() OVER (ORDER BY doc_id) - 1) // 32 AS batch_id
        |  FROM t),
        |sb AS (
        |  SELECT batch_id, COUNT(*) AS nd, MAX(n_tokens) AS mx,
        |         SUM(n_tokens) AS sm
        |  FROM s GROUP BY batch_id),
        |nb AS (
        |  SELECT batch_id, COUNT(*) AS nd, MAX(n_tokens) AS mx,
        |         SUM(n_tokens) AS sm
        |  FROM n GROUP BY batch_id)
        |SELECT * FROM (
        |  SELECT 'length_sorted' AS strategy,
        |    CAST(COUNT(*) AS BIGINT) AS n_batches,
        |    CAST(SUM(nd * mx) AS BIGINT) AS total_cost,
        |    CAST(SUM(sm) AS BIGINT) AS total_tokens,
        |    CAST((SUM(nd * mx) - SUM(sm)) * 1000000 // SUM(nd * mx) AS BIGINT)
        |      AS pad_share6
        |  FROM sb
        |  UNION ALL
        |  SELECT 'docid_order' AS strategy,
        |    CAST(COUNT(*) AS BIGINT) AS n_batches,
        |    CAST(SUM(nd * mx) AS BIGINT) AS total_cost,
        |    CAST(SUM(sm) AS BIGINT) AS total_tokens,
        |    CAST((SUM(nd * mx) - SUM(sm)) * 1000000 // SUM(nd * mx) AS BIGINT)
        |      AS pad_share6
        |  FROM nb
        |) ORDER BY strategy""".stripMargin,

    "q149_shard_integrity" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |o AS (
        |  SELECT doc_id, n_tokens,
        |         CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
        |  FROM t),
        |m AS (
        |  SELECT doc_id, n_tokens, start_offset,
        |         unnest(generate_series(start_offset // 2048, (start_offset + n_tokens - 1) // 2048)) AS window_id
        |  FROM o WHERE n_tokens > 0),
        |mf AS (
        |  SELECT window_id, doc_id,
        |         GREATEST(window_id * 2048, start_offset) - start_offset AS slice_start,
        |         LEAST((window_id + 1) * 2048, start_offset + n_tokens)
        |           - GREATEST(window_id * 2048, start_offset) AS tokens_in_window
        |  FROM m),
        |span AS (
        |  SELECT ((MAX(window_id) + 1) + 7) // 8 AS sp FROM mf),
        |sh AS (
        |  SELECT window_id // sp AS shard, window_id, doc_id, slice_start,
        |         tokens_in_window,
        |         (((((window_id % 1000003) * 8191 + doc_id % 1000003)
        |           % 1000003 * 8191 + slice_start % 1000003)
        |           % 1000003 + 1) * (tokens_in_window % 1000003 + 1))
        |           % 1000003 AS sig
        |  FROM mf CROSS JOIN span)
        |SELECT shard,
        |  CAST(MIN(window_id) AS BIGINT) AS first_window,
        |  CAST(MAX(window_id) AS BIGINT) AS last_window,
        |  CAST(COUNT(*) AS BIGINT) AS n_doc_slices,
        |  CAST(SUM(tokens_in_window) AS BIGINT) AS token_mass,
        |  CAST(SUM(sig) AS BIGINT) AS checksum,
        |  TRUE AS self_ok,
        |  (shard = 0) AS tamper_flagged
        |FROM sh GROUP BY shard ORDER BY shard""".stripMargin,

    "q148_attention_segments" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |o AS (
        |  SELECT doc_id, n_tokens,
        |         CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
        |  FROM t),
        |m AS (
        |  SELECT doc_id, n_tokens, start_offset,
        |         unnest(generate_series(start_offset // 2048, (start_offset + n_tokens - 1) // 2048)) AS window_id
        |  FROM o WHERE n_tokens > 0),
        |mf AS (
        |  SELECT window_id, doc_id,
        |         LEAST((window_id + 1) * 2048, start_offset + n_tokens)
        |           - GREATEST(window_id * 2048, start_offset) AS tokens_in_window
        |  FROM m)
        |SELECT CAST(window_id AS BIGINT) AS window_id,
        |  CAST(row_number() OVER (PARTITION BY window_id ORDER BY doc_id) AS INT)
        |    AS seg_idx,
        |  doc_id,
        |  CAST(COALESCE(SUM(tokens_in_window) OVER (PARTITION BY window_id
        |    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) AS seg_start,
        |  tokens_in_window AS seg_len
        |FROM mf ORDER BY window_id, seg_idx""".stripMargin,

    "q137_window_rehydrate" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS w
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, w, CAST(len(w) AS BIGINT) AS n_tokens FROM t),
        |o AS (
        |  SELECT doc_id, w, n_tokens,
        |         CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
        |  FROM c),
        |m AS (
        |  SELECT doc_id, w, n_tokens, start_offset,
        |         unnest(generate_series(start_offset // 256, (start_offset + n_tokens - 1) // 256)) AS window_id
        |  FROM o WHERE n_tokens > 0)
        |SELECT CAST(window_id AS BIGINT) AS window_id, doc_id,
        |  GREATEST(window_id * 256, start_offset) - start_offset AS slice_start,
        |  LEAST((window_id + 1) * 256, start_offset + n_tokens)
        |    - GREATEST(window_id * 256, start_offset) AS tokens_in_window,
        |  array_to_string(
        |    w[CAST(GREATEST(window_id * 256, start_offset) - start_offset + 1 AS BIGINT):
        |      CAST(LEAST((window_id + 1) * 256, start_offset + n_tokens) - start_offset AS BIGINT)],
        |    ' ') AS text_slice
        |FROM m WHERE window_id < 5
        |ORDER BY window_id, doc_id""".stripMargin,

    "q136_loader_shards" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |o AS (
        |  SELECT doc_id, n_tokens,
        |         CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
        |  FROM t),
        |m AS (
        |  SELECT doc_id, n_tokens, start_offset,
        |         unnest(generate_series(start_offset // 2048, (start_offset + n_tokens - 1) // 2048)) AS window_id
        |  FROM o WHERE n_tokens > 0),
        |mf AS (
        |  SELECT window_id,
        |         LEAST((window_id + 1) * 2048, start_offset + n_tokens)
        |           - GREATEST(window_id * 2048, start_offset) AS tokens_in_window
        |  FROM m),
        |w AS (SELECT MAX(window_id) + 1 AS wt FROM mf),
        |sh AS (
        |  SELECT CAST(window_id // ((w.wt + 7) // 8) AS BIGINT) AS shard,
        |         window_id, tokens_in_window
        |  FROM mf CROSS JOIN w)
        |SELECT shard,
        |  CAST(MIN(window_id) AS BIGINT) AS first_window,
        |  CAST(MAX(window_id) AS BIGINT) AS last_window,
        |  CAST(MAX(window_id) - MIN(window_id) + 1 AS BIGINT) AS n_windows,
        |  CAST(SUM(tokens_in_window) AS BIGINT) AS token_mass,
        |  CAST(COUNT(*) AS BIGINT) AS n_doc_slices
        |FROM sh GROUP BY shard ORDER BY shard""".stripMargin,

    "q115_salted_skew" ->
      """SELECT s_nationkey,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |       COUNT(*) AS n
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey
        |ORDER BY s_nationkey""".stripMargin,

    "q111_epoch_shuffle" ->
      """WITH m AS (
        |  SELECT unnest([0,1,2]) AS epoch,
        |         unnest([2654435761, 2246822519, 3266489917]) AS mult),
        |x AS (
        |  SELECT CAST(m.epoch AS INTEGER) AS epoch, d.doc_id,
        |         (d.doc_id * m.mult) % 4294967296 AS shuffle_key
        |  FROM documents d, m)
        |SELECT epoch, doc_id, shuffle_key,
        |       CAST(ROW_NUMBER() OVER (ORDER BY epoch, shuffle_key) - 1 AS BIGINT) AS stream_pos
        |FROM x
        |""".stripMargin,

    "q49_bloom_semi" ->
      """SELECT COUNT(*) AS n,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#19')
        |""".stripMargin,

    "q50_range_join" ->
      """WITH iv AS (
        |  SELECT o_orderkey, o_orderdate AS ws,
        |         o_orderdate + INTERVAL 3 DAY AS we
        |  FROM orders ORDER BY o_orderkey DESC LIMIT 10)
        |SELECT iv.o_orderkey,
        |       COUNT(l.l_orderkey) AS n,
        |       CAST(COALESCE(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS revenue
        |FROM iv LEFT JOIN lineitem l
        |  ON l.l_shipdate >= iv.ws AND l.l_shipdate < iv.we
        |GROUP BY iv.o_orderkey
        |ORDER BY iv.o_orderkey
        |""".stripMargin,

    "q51_scd2_merge" ->
      """WITH chg AS (SELECT c_custkey FROM customer WHERE c_custkey % 14 = 0)
        |SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
        |       TIMESTAMP '1995-01-01' AS valid_from,
        |       CASE WHEN c_custkey IN (SELECT c_custkey FROM chg)
        |            THEN TIMESTAMP '2000-01-01' ELSE CAST(NULL AS TIMESTAMP) END AS valid_to
        |FROM customer
        |UNION ALL
        |SELECT c_custkey, c_name, c_nationkey, c_acctbal + 100.0, 'PROMO',
        |       TIMESTAMP '2000-01-01', CAST(NULL AS TIMESTAMP)
        |FROM customer WHERE c_custkey % 14 = 0
        |ORDER BY c_custkey, valid_from
        |""".stripMargin,

    "q54_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(
        |    regexp_split_to_array(trim(text), '\s+'), t -> t <> '')) AS token
        |  FROM documents),
        |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        |dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT COUNT(*) AS n FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.token, tf.tf,
        |         tf.tf * ((1000000 * n.n) // dfreq.df) AS score
        |  FROM tf JOIN dfreq USING (token) CROSS JOIN n
        |  WHERE tf.doc_id < 50),
        |ranked AS (
        |  SELECT *, CAST(row_number() OVER (
        |    PARTITION BY doc_id ORDER BY score DESC, token) AS INT) AS rnk
        |  FROM scored)
        |SELECT doc_id, token, tf, score, rnk FROM ranked
        |WHERE rnk <= 3 ORDER BY doc_id, rnk
        |""".stripMargin,

    "q62_incremental_agg" ->
      """SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |       COUNT(*) AS n
        |FROM orders
        |GROUP BY day
        |ORDER BY day
        |""".stripMargin,

    "q61_quality_report" ->
      """WITH t AS (SELECT COUNT(*) AS total FROM lineitem)
        |SELECT 'fk:l_orderkey' AS chk,
        |       (SELECT COUNT(*) FROM lineitem l LEFT JOIN orders o
        |          ON l.l_orderkey = o.o_orderkey
        |        WHERE l.l_orderkey IS NOT NULL AND o.o_orderkey IS NULL) AS violations,
        |       total FROM t
        |UNION ALL
        |SELECT 'in_range:l_quantity',
        |       (SELECT COUNT(*) FROM lineitem
        |        WHERE l_quantity IS NOT NULL AND l_quantity NOT BETWEEN 1 AND 50),
        |       total FROM t
        |UNION ALL
        |SELECT 'matches:l_returnflag',
        |       (SELECT COUNT(*) FROM lineitem
        |        WHERE l_returnflag IS NOT NULL
        |          AND NOT regexp_matches(l_returnflag, '^[ARN]$')),
        |       total FROM t
        |UNION ALL
        |SELECT 'not_null:l_orderkey',
        |       (SELECT COUNT(*) FROM lineitem WHERE l_orderkey IS NULL),
        |       total FROM t
        |UNION ALL
        |SELECT 'unique:l_orderkey,l_linenumber',
        |       (SELECT CAST(COALESCE(SUM(n - 1), 0) AS BIGINT) FROM (
        |          SELECT COUNT(*) AS n FROM lineitem
        |          GROUP BY l_orderkey, l_linenumber) WHERE n > 1),
        |       total FROM t
        |ORDER BY chk
        |""".stripMargin,

    "q60_editdist_pairs" ->
      """WITH d AS (
        |  SELECT doc_id, text, lang, n_chars // 40 AS lb
        |  FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       CAST(levenshtein(a.text, b.text) AS INT) AS dist
        |FROM d a JOIN d b
        |  ON a.lang = b.lang AND a.lb = b.lb AND a.doc_id < b.doc_id
        |WHERE levenshtein(a.text, b.text) <= 20
        |ORDER BY id_a, id_b
        |""".stripMargin,

    "q59_topk_agg" ->
      """WITH rev AS (
        |  SELECT p_brand, p_partkey,
        |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1, 2),
        |ranked AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY p_brand
        |            ORDER BY revenue DESC, p_partkey) AS INT) AS rnk
        |  FROM rev)
        |SELECT p_brand, p_partkey, revenue, rnk FROM ranked WHERE rnk <= 3
        |ORDER BY p_brand, rnk
        |""".stripMargin,

    "q58_asof_forward" ->
      """WITH e AS (
        |  SELECT event_id, user_id,
        |         CAST(date_trunc('second', ts) AS TIMESTAMP) AS ts_s, event_type, value
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts_s, value AS signup_value FROM (
        |    SELECT user_id, ts_s, value,
        |           row_number() OVER (PARTITION BY user_id, ts_s
        |                              ORDER BY event_id DESC) AS rn
        |    FROM e WHERE event_type = 'signup') WHERE rn = 1)
        |SELECT e.event_id, e.user_id,
        |       (SELECT s.signup_value FROM s
        |        WHERE s.user_id = e.user_id AND s.ts_s >= e.ts_s
        |          AND s.ts_s <= e.ts_s + INTERVAL 3600 SECOND
        |        ORDER BY s.ts_s LIMIT 1) AS signup_value
        |FROM e WHERE e.event_type <> 'signup'
        |ORDER BY e.event_id
        |""".stripMargin,

    "q55_stratified_sample" ->
      """WITH s AS (
        |  SELECT lang, doc_id,
        |         row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn,
        |         COUNT(*) OVER (PARTITION BY lang) AS cnt
        |  FROM documents)
        |SELECT lang, doc_id FROM s
        |WHERE rn <= CEIL(cnt * 0.1)
        |ORDER BY lang, doc_id
        |""".stripMargin,

    // States the percentile_approx rank-error contract + exact counts.
    "q57_approx_percentiles" ->
      """SELECT event_type, COUNT(*) AS n_rows,
        |       TRUE AS p50_ok, TRUE AS p95_ok, TRUE AS p99_ok
        |FROM events GROUP BY event_type ORDER BY event_type
        |""".stripMargin,

    // States the count-min guarantee (overestimate-only, eps-bounded)
    // plus the exact per-key counts; estimate values are sketch-internal.
    "q52_countmin_topk" ->
      """SELECT event_type AS key, COUNT(*) AS n_true,
        |       TRUE AS ge_true, TRUE AS le_bound
        |FROM events GROUP BY event_type ORDER BY key
        |""".stripMargin,

    // States the HLL merge accuracy contract + the exact distinct count.
    "q53_hll_union" ->
      """SELECT COUNT(DISTINCT user_id) AS n_users, TRUE AS within_tol
        |FROM events
        |""".stripMargin,

    // States the split contract exactly: every doc assigned exactly
    // once, only the requested labels, all three splits realized, and
    // the train share within 5 points of the requested 80. The per-doc
    // routing is xxhash64-specific (spec-tested deterministic).
    "q56_hash_split" ->
      """SELECT COUNT(*) AS n_rows,
        |       COUNT(DISTINCT doc_id) AS n_docs,
        |       CAST(3 AS BIGINT) AS n_splits,
        |       CAST(0 AS BIGINT) AS bad_labels,
        |       TRUE AS train_frac_ok
        |FROM documents
        |""".stripMargin,

    // States the packing contract: the chunk pre-stage yields exactly
    // ceil(tokens/budget) chunks (min 1) per doc with token mass
    // conserved; chunked BFD can never overflow a sequence; sequences
    // are non-empty. The sequence layout itself is partition-dependent
    // (spec-tested: determinism, fill bounds).
    "q63_pack_sequences" ->
      """WITH t AS (
        |  SELECT len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n
        |  FROM documents)
        |SELECT CAST(SUM(GREATEST(1, (n + 511) // 512)) AS BIGINT) AS n_chunks,
        |       CAST(SUM(n) AS BIGINT) AS token_mass,
        |       CAST(0 AS BIGINT) AS n_overflow_seqs,
        |       CAST(0 AS BIGINT) AS n_empty_seqs,
        |       TRUE AS seq_count_le_chunks
        |FROM t
        |""".stripMargin
  )
}
