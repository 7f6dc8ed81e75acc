package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.functions._

/** Analytics extensions over the star schema: multi-dimensional
  * aggregation (rollup/cube), set operations, distinct counting (exact
  * and HLL), and JSON property extraction — the consumer-side query
  * surface the reference's dimensional model exists to serve.
  */
object AnalyticsQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ROLLUP: region × year revenue with subtotals and grand total.
    "q31_rollup_revenue" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir)
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), year(col("o_orderdate")).as("year"))
        .agg(sum(money(col("l_extendedprice"))).cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("r_name").asc_nulls_first, col("year").asc_nulls_first)
    },

    // CUBE: all 2^2 grouping combinations over returnflag × linestatus.
    "q32_cube_flags" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(volume(col("l_quantity"))).cast("double").as("sum_qty"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    },

    // Set ops: customers ordering in 1995 ∩ 1996, minus any who ordered
    // in 1997 — INTERSECT and EXCEPT with set (distinct) semantics.
    "q33_setops_customers" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
      def inYear(y: Int) =
        o.where(year(col("o_orderdate")) === y).select("o_custkey")
      inYear(1995).intersect(inYear(1996)).except(inYear(1997))
        .orderBy("o_custkey")
    },

    // Exact distinct counting per group (the DISTINCT-as-aggregation
    // surface, A3, at consumer grain).
    "q34_distinct_counts" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(countDistinct(col("o_custkey")).as("n_customers"),
          count(lit(1)).as("n_orders"))
        .orderBy("c_mktsegment")
    },

    // HLL sketch counting — the 100 TB path for distinct counts (fixed
    // memory, mergeable partial sketches). The estimate VALUE is
    // engine-specific, so the compared output is the accuracy CONTRACT:
    // per group, |approx − exact| ≤ 5% of exact (HLL++ at rsd 0.02 ⇒
    // 5% = 2.5σ; deterministic for fixed data, verified at sf0.01 and
    // sf0.1 — the default rsd 0.05 measured ~6% off on this data,
    // outside its own 1σ, and rsd 0.01's 2^14-register buffer measured
    // ~2× the whole query's runtime). Exact per-group counts ride
    // along.
    "q35_hll_counts" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
      // exact side as distinct→count (two clean hash aggregates), NOT a
      // mixed countDistinct+agg (the Expand-based distinct rewrite
      // measured ~8× slower next to the wide-register HLL buffer)
      val approx = o.groupBy(col("o_orderstatus"))
        .agg(approx_count_distinct(col("o_custkey"), 0.02).as("approx_customers"),
          count(lit(1)).as("n_orders"))
      val exact = o.select("o_orderstatus", "o_custkey").distinct()
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_customers"))
      approx.join(exact, "o_orderstatus")
        .select(col("o_orderstatus"), col("n_customers"), col("n_orders"),
          (abs(col("approx_customers") - col("n_customers"))
            <= col("n_customers") * 0.05).as("within_tol"))
        .orderBy("o_orderstatus")
    },

    // JSON property extraction from the events props column.
    "q36_events_json" -> { (s, dir) =>
      Tables.events(s, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("k")).as("k_sum"),
          min(col("k")).as("k_min"), max(col("k")).as("k_max"))
        .orderBy("event_type")
    },

    // As-of join: each non-signup event enriched with the user's most
    // recent at-or-before signup (second granularity; signups deduped
    // per (user, second) keeping the max event_id so the as-of pick is
    // deterministic). Union+window implementation, DuckDB ASOF oracle.
    "q38_asof_enrich" -> { (s, dir) =>
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
      AsofJoin.asofJoin(others, signups, "user_id", "ts_s", Seq("signup_value"))
        .select("event_id", "user_id", "signup_value")
        .orderBy("event_id")
    },

    // Pivot: daily event counts fanned out per type into columns.
    "q39_pivot_daily" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("day")
    },

    // Exact interpolated percentiles per group (both engines use the
    // p*(n-1) linear-interpolation definition).
    "q42_percentiles" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_quantity, 0.25)").as("p25"),
          median(col("l_quantity")).as("p50"),
          expr("percentile(l_quantity, 0.75)").as("p75"),
          expr("percentile(l_quantity, 0.99)").as("p99"))
        .orderBy("l_returnflag")
    },

    // Term frequency: top-5 tokens per language with deterministic
    // tiebreak — the corpus-statistics staple.
    "q43_term_freq" -> { (s, dir) =>
      import graft.ops.TextOps
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(col("n").desc, col("token"))
      Tables.documents(s, dir)
        .select(col("lang"), explode(TextOps.tokens(col("text"))).as("token"))
        .groupBy("lang", "token")
        .agg(count(lit(1)).as("n"))
        .withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= 5)
        .select(col("lang"), col("token"), col("n"), col("rnk"))
        .orderBy("lang", "rnk")
    },

    // Histogram binning with portable floor arithmetic (DuckDB 1.0 has
    // no width_bucket).
    "q44_histogram" -> { (s, dir) =>
      Tables.events(s, dir)
        .select(floor(col("value") / 10.0).cast("int").as("bucket"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"))
        .orderBy("bucket")
    },

    // Moving aggregate over an ordered frame: 7-row trailing average of
    // daily revenue (days are unique -> deterministic frame). Computed
    // with a year-partitioned window + boundary carries
    // (ScalableWindows) instead of a global ORDER BY window, so the
    // plan holds when the series is long enough to matter.
    "q45_moving_avg" -> { (s, dir) =>
      val daily = Tables.lineitem(s, dir)
        .groupBy(to_date(col("l_shipdate")).cast("timestamp").as("day"))
        .agg(sum(money(col("l_extendedprice"))).as("rev_dec"))
      graft.ops.ScalableWindows.trailingByBucket(
          daily, "day", year(_), lookback = 6,
          aggs = Seq(
            "avg7" -> (w => sum(col("rev_dec")).over(w).cast("double") /
              count(lit(1)).over(w).cast("double"))))
        .withColumn("revenue", col("rev_dec").cast("double"))
        .select("day", "revenue", "avg7")
        .orderBy("day")
    },

    // TPC-H Q17 shape: revenue lost to small-quantity orders — per-part
    // average quantity as a correlated aggregate, decimal-exact
    // internals, identical double threshold arithmetic on both sides.
    "q46_small_qty_revenue" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val avgQty = li.groupBy(col("l_partkey").as("pk"))
        .agg((sum(volume(col("l_quantity"))).cast("double") /
          count(lit(1)).cast("double")).as("avg_qty"))
      li.join(broadcast(avgQty), col("l_partkey") === col("pk"))
        .where(volume(col("l_quantity")).cast("double") < lit(0.5) * col("avg_qty"))
        .agg(
          (sum(money(col("l_extendedprice"))).cast("double") / lit(7.0)).as("avg_yearly"),
          count(lit(1)).as("n_lines"))
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q31_rollup_revenue" ->
      """SELECT r_name, CAST(EXTRACT(year FROM o_orderdate) AS INT) AS year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, year)
        |ORDER BY r_name NULLS FIRST, year NULLS FIRST""".stripMargin,
    "q32_cube_flags" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,3))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n_lines
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q33_setops_customers" ->
      """(SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995
        | INTERSECT
        | SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996)
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1997
        |ORDER BY o_custkey""".stripMargin,
    "q34_distinct_counts" ->
      """SELECT c_mktsegment, COUNT(DISTINCT o_custkey) AS n_customers,
        |  COUNT(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    // States the HLL accuracy contract; exact counts computed directly.
    "q35_hll_counts" ->
      """SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_customers,
        |  COUNT(*) AS n_orders, TRUE AS within_tol
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q36_events_json" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS k_sum,
        |  CAST(MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS k_min,
        |  CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS k_max
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q38_asof_enrich" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, event_type, value,
        |    CAST(date_trunc('second', ts) AS TIMESTAMP) AS ts_s
        |  FROM events
        |), signups AS (
        |  SELECT user_id, ts_s, value AS signup_value FROM ev
        |  WHERE event_type = 'signup'
        |  QUALIFY row_number() OVER (PARTITION BY user_id, ts_s ORDER BY event_id DESC) = 1
        |), others AS (
        |  SELECT event_id, user_id, ts_s FROM ev WHERE event_type <> 'signup'
        |)
        |SELECT o.event_id, o.user_id, s.signup_value
        |FROM others o
        |ASOF LEFT JOIN signups s
        |  ON o.user_id = s.user_id AND o.ts_s >= s.ts_s
        |ORDER BY o.event_id""".stripMargin,
    "q39_pivot_daily" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |  COUNT(*) FILTER (WHERE event_type = 'click') AS click,
        |  COUNT(*) FILTER (WHERE event_type = 'error') AS error,
        |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  COUNT(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events GROUP BY day ORDER BY day""".stripMargin,
    "q42_percentiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.25) AS p25,
        |  quantile_cont(l_quantity, 0.50) AS p50,
        |  quantile_cont(l_quantity, 0.75) AS p75,
        |  quantile_cont(l_quantity, 0.99) AS p99
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q43_term_freq" ->
      """WITH toks AS (
        |  SELECT lang, unnest(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |                                  t -> t <> '')) AS token
        |  FROM documents
        |), counts AS (
        |  SELECT lang, token, COUNT(*) AS n FROM toks GROUP BY lang, token
        |)
        |SELECT lang, token, n, CAST(rnk AS INT) AS rnk FROM (
        |  SELECT lang, token, n,
        |    row_number() OVER (PARTITION BY lang ORDER BY n DESC, token) AS rnk
        |  FROM counts
        |) WHERE rnk <= 5 ORDER BY lang, rnk""".stripMargin,
    "q44_histogram" ->
      """SELECT CAST(floor(value / 10.0) AS INT) AS bucket, COUNT(*) AS n
        |FROM events GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q45_moving_avg" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(l_shipdate AS DATE) AS TIMESTAMP) AS day,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev_dec
        |  FROM lineitem GROUP BY day
        |)
        |SELECT day, CAST(rev_dec AS DOUBLE) AS revenue,
        |  CAST(SUM(rev_dec) OVER w AS DOUBLE)
        |    / CAST(COUNT(*) OVER w AS DOUBLE) AS avg7
        |FROM daily
        |WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY day""".stripMargin,
    "q46_small_qty_revenue" ->
      """WITH avgq AS (
        |  SELECT l_partkey AS pk,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,3))) AS DOUBLE)
        |      / CAST(COUNT(*) AS DOUBLE) AS avg_qty
        |  FROM lineitem GROUP BY l_partkey
        |)
        |SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
        |  COUNT(*) AS n_lines
        |FROM lineitem JOIN avgq ON l_partkey = pk
        |WHERE CAST(CAST(l_quantity AS DECIMAL(18,3)) AS DOUBLE) < 0.5 * avg_qty""".stripMargin
  )
}
