package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.functions.money
import graft.ops.{BloomPrune, RangeJoin, Scd2, Sketches}

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
    // the (small) candidate key set. Sketch-specific values → rows-only
    // vs the oracle; the error bound is spec-enforced.
    "q52_countmin_topk" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val keys = ev.select("event_type").distinct()
        .orderBy("event_type").collect().map(_.getString(0)).toSeq
      Sketches.countMinEstimates(ev, col("event_type"), keys)
        .orderBy("key")
    },

    // HLL sketch rollup: daily user sketches merged to a single
    // month estimate — pre-aggregation that re-aggregates to any
    // coarser grain without touching raw data. Rows-only (estimate);
    // accuracy spec-enforced.
    "q53_hll_union" -> { (s, dir) =>
      val daily = Sketches.hllSketches(
        Tables.events(s, dir),
        Seq(to_date(col("ts")).as("day")), col("user_id"))
      Sketches.hllRollup(daily, Seq(lit(1).as("one")), "users_est")
        .select(col("users_est").cast("long").as("users_est"))
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
    // randomSplit). Hash-based -> rows-only; invariants spec-enforced.
    "q56_hash_split" -> { (s, dir) =>
      graft.ops.Sampling.hashSplit(
          Tables.documents(s, dir), col("doc_id"),
          Seq("train" -> 80, "val" -> 10, "test" -> 10))
        .groupBy("split").agg(count(lit(1)).as("n"))
        .orderBy("split")
    },

    // Sequence packing: curated docs -> fixed-token-budget training
    // sequences (next-fit within partition — the distributed packing
    // contract). Stats output; packing invariants spec-enforced.
    "q63_pack_sequences" -> { (s, dir) =>
      import graft.ops.{Packing, TextOps}
      val withTokens = Tables.documents(s, dir)
        .select(col("doc_id"), TextOps.bpeishTokenCount(col("text")).as("n_tokens"))
      // full packing pipeline: chunk oversized docs to the budget, then
      // best-fit-decreasing within partition — zero overflow possible
      val chunks = Packing.chunkOversized(withTokens, "doc_id", "n_tokens", budget = 512)
        .select((col("doc_id") * 4096 + col("chunk")).as("chunk_id"), col("n_tokens"))
      val packed = Packing.packBestFitDecreasing(chunks, "chunk_id", "n_tokens", budget = 512)
      Packing.packingStats(packed, budget = 512)
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
    // values differ from DuckDB's t-digest -> rows-only; rank-error
    // bound vs exact is spec-enforced.
    "q57_approx_percentiles" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(
          percentile_approx(col("value"), lit(0.5), lit(1000)).as("p50"),
          percentile_approx(col("value"), lit(0.95), lit(1000)).as("p95"),
          percentile_approx(col("value"), lit(0.99), lit(1000)).as("p99"))
        .orderBy("event_type")
    }
  )

  val oracleSql: Map[String, String] = Map(

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
        |""".stripMargin
  )
}
