package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational operator coverage over the testdata star schema.
  *
  * The reference (google/space) delegates OLAP SQL to external engines
  * (README.md:17 points at DuckDB); on Spark the whole relational surface
  * comes from Catalyst. These queries pin down the semantics the engine
  * exposes once a table materializes as a DataFrame: aggregation,
  * inner/semi/anti joins (space's join + insert-duplicate-check + delete
  * semantics, views.py:183-224 / insert.py:119-134 / delete.py:77),
  * top-k, window functions, distinct aggregation, set ops, rollup.
  *
  * Every aggregate over doubles is rounded in BOTH the Spark query and the
  * DuckDB oracle so float summation order cannot flip the comparison hash.
  */
object Relational {

  private def t(s: SparkSession, d: String, n: String) = Tables.read(s, d, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-style pricing summary: the canonical partial-agg +
    // final-agg shape; map-side combine keeps the shuffle tiny at scale.
    "q1_agg" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          count(lit(1)).as("count_order"))
    }),

    // Projection + predicate pushdown: only 3 columns reach the scan and
    // the filters land in PushedFilters (verified in RelationalSpec).
    "q2_filter_project" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    }),

    // One-key equi-join (the reference's only join form, views.py:183-224)
    // + aggregation. orders is the smaller side; at 100 TB this is a
    // shuffle join on the key — AQE handles skew; at bench SF Spark
    // auto-broadcasts below the 10MB threshold.
    "q3_join" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val o = t(s, d, "orders")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // Left-semi join: EXISTS — the shape of space's insert duplicate-PK
    // check (insert.py:119-134).
    "q4_semi_join" -> ((s, d) => {
      val o = t(s, d, "orders")
      val li = t(s, d, "lineitem").select(col("l_orderkey"))
      o.join(li, o("o_orderkey") === li("l_orderkey"), "left_semi")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("sum_price"))
    }),

    // Left-anti join: NOT EXISTS — the shape of space's CoW delete
    // (keep rows NOT matching, delete.py:77,103).
    "q5_anti_join" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders")
        .filter(col("o_totalprice") > 400000).select(col("o_custkey"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"))
    }),

    // Top-k with a total order (unique tiebreak so the result set is
    // deterministic). Spark plans TakeOrderedAndProject: no full sort.
    "q6_topk" -> ((s, d) =>
      t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select(col("o_orderkey"), col("o_totalprice"))),

    // Window functions: rank + running sum per partition, deterministic
    // ordering via unique key tiebreak.
    "q7_window" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .withColumn("run_spend", round(sum(col("o_totalprice"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("rn"), col("run_spend"))
    }),

    // Distinct aggregation (expand + two-phase agg under the hood).
    "q8_distinct_agg" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          count(lit(1)).as("n_rows"))),

    // Set operation: EXCEPT (distinct) — orders that have no lineitems.
    "q9_except" -> ((s, d) =>
      t(s, d, "orders").select(col("o_orderkey").as("k"))
        .except(t(s, d, "lineitem").select(col("l_orderkey").as("k")))),

    // ROLLUP grouping sets; coalesce the NULL markers to stable strings so
    // the oracle hash can't diverge on NULL-vs-"ALL" representation.
    "q10_rollup" -> ((s, d) =>
      t(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("sum_qty"), col("n"))),

    // Tumbling 5-minute window over the events table (batch shape of the
    // streaming agg; the streaming variant lives in graft.streaming).
    // Event time goes through EventTime.epochSeconds, which dispatches
    // on the dtype the parquet reader actually produced (timestamp[us]
    // vs legacy long-nanos). Window start = epoch seconds.
    "q11_events_window" -> ((s, d) => {
      val ev = t(s, d, "events")
      ev.withColumn("__es", graft.functions.EventTime.epochSeconds(ev.schema, "ts"))
        .withColumn("w_start", expr("__es div 300 * 300"))
        .groupBy(col("w_start"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
    }),

    // Point-in-time AS-OF join (AsofJoin operator): each click event
    // matched to the same user's most recent purchase at-or-before it.
    // One shuffle by user + one sort — no O(n·m) range-join blowup.
    "q21_asof_join" -> ((s, d) => {
      val ev = t(s, d, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("pts"), col("value"))
      val joined = AsofJoin.asofJoinFlat(clicks, purchases, Seq("user_id"), "ts", "pts",
          fields = Seq("value"))
      joined.select(col("event_id"), col("user_id"),
          graft.functions.EventTime.epochSeconds(joined.schema, "ts").as("click_s"),
          graft.functions.EventTime.epochSeconds(joined.schema, "asof_time").as("purchase_s"),
          round(col("asof_value"), 2).as("purchase_value"))
    }),

    // pivot: per-user event-type value matrix (conditional aggregation
    // in the oracle; Spark's pivot with explicit values — no extra pass
    // to discover the domain, and the agg stays map-side partial)
    "q22_pivot" -> ((s, d) => {
      t(s, d, "events")
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "purchase", "view", "signup", "error"))
        .agg(round(sum(col("value")), 2))
    }),

    // correlated scalar subquery, expressed as the decorrelated
    // agg+join Catalyst rewrites it to: orders 1.5x above their
    // customer's average order value
    "q23_above_cust_avg" -> ((s, d) => {
      val o = t(s, d, "orders")
      val avgByCust = o.groupBy(col("o_custkey").as("k"))
        .agg(avg(col("o_totalprice")).as("cust_avg"))
      o.join(avgByCust, o("o_custkey") === avgByCust("k"))
        .filter(col("o_totalprice") > col("cust_avg") * 1.5)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          round(max(col("o_totalprice")), 2).as("max_price"))
    }),

    // Native SESSION WINDOWS: Spark's session_window gap-merge aggregate
    // (the batch shape of the streaming session operator) — per (user,
    // session) event counts and value sums with a 30-minute gap. One
    // shuffle on user + the window merge; oracle replicates the gap
    // semantics with the lag/cumsum trick.
    "q24_session_window" -> ((s, d) => {
      val ev = t(s, d, "events")
      ev.withColumn("event_time",
          timestamp_seconds(graft.functions.EventTime.epochSeconds(ev.schema, "ts")))
        .groupBy(session_window(col("event_time"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
        .select(col("user_id"),
          unix_timestamp(col("session_window.start")).as("s_start"),
          col("n_events"), col("sum_value"))
    }),

    // LATERAL expansion: one row per (document, token position) for the
    // first 5 tokens — the explode/flatten shape of tokenization
    // pipelines (posexplode keeps the ordinal; codegen'd generator,
    // no UDF).
    "q25_lateral_tokens" -> ((s, d) => {
      t(s, d, "documents")
        .select(col("doc_id"),
          posexplode(slice(graft.functions.TextFunctions.tokens(col("text")), 1, 5)))
        .select(col("doc_id"), col("pos").as("token_pos"), col("col").as("token"))
    }),

    // Multi-way star join with broadcast dims: region→nation→customer→
    // orders revenue rollup. nation/region are tiny: explicit broadcast.
    "q12_star_join" -> ((s, d) => {
      val r = broadcast(t(s, d, "region"))
      val n = broadcast(t(s, d, "nation"))
      val c = t(s, d, "customer")
      val o = t(s, d, "orders")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(round(sum(col("o_totalprice")), 2).as("revenue"),
          count(lit(1)).as("n_orders"))
    }),

    // Interval join with NO equi-key (RangeJoin operator): events matched
    // into 200 overlapping, non-uniform maintenance windows over the
    // month. The bucketized rewrite keeps this an equi-join (shuffle or
    // broadcast) instead of the nested-loop plan Spark would pick for the
    // raw range predicate — see RangeJoin for the 100 TB shape.
    "q26_range_join" -> ((s, d) => {
      val ev = t(s, d, "events")
      val points = ev.select(col("event_id"),
        graft.functions.EventTime.epochSeconds(ev.schema, "ts").as("es"))
      // 2024-01-01 UTC + 3.6h steps; window i is (i%5)+1 hours long —
      // overlapping and non-uniform, so containment is a real interval
      // test, not a floor()
      val windows = s.range(0, 200).toDF("w_id")
        .select(col("w_id"),
          (lit(1704067200L) + col("w_id") * 12960L).as("w_start"))
        .withColumn("w_end",
          col("w_start") + (pmod(col("w_id"), lit(5L)) + 1L) * 3600L)
      RangeJoin.rangeJoin(points, "es", windows, "w_start", "w_end",
          bucketWidth = 14400L)
        .select(col("event_id"), col("w_id"))
    }),

    // exact interpolated percentiles (median / p90) per group — Spark's
    // sort-based `percentile` and DuckDB's `quantile_cont` share the
    // linear-interpolation definition, so the oracle is exact. The
    // shuffle carries one row per (group, value) partial — at 100 TB
    // the approx_percentile (KLL/GK sketch) variant is the single-pass
    // answer; this exact form is the oracle-checkable semantics.
    "q27_percentiles" -> ((s, d) => {
      t(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 2).as("median_price"),
          round(expr("percentile(o_totalprice, 0.9)"), 2).as("p90_price"),
          count(lit(1)).as("n"))
    }))

  val oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q2_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q3_join" ->
      """SELECT o_orderpriority,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,
    "q4_semi_join" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS sum_price
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        |GROUP BY o_orderstatus""".stripMargin,
    "q5_anti_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |GROUP BY c_mktsegment""".stripMargin,
    "q6_topk" ->
      """SELECT o_orderkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 10""".stripMargin,
    "q7_window" ->
      """SELECT o_custkey, o_orderkey, rn, run_spend FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER w AS rn,
        |    round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate ASC, o_orderkey ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_spend
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
        |) WHERE rn <= 3""".stripMargin,
    "q8_distinct_agg" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_suppkey) AS n_supp,
        |  count(DISTINCT l_partkey) AS n_part,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q9_except" ->
      """SELECT o_orderkey AS k FROM orders
        |EXCEPT
        |SELECT l_orderkey AS k FROM lineitem""".stripMargin,
    "q10_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "q11_events_window" ->
      """SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS w_start,
        |  event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM events
        |GROUP BY 1, 2""".stripMargin,
    "q21_asof_join" ->
      """SELECT a.event_id, a.user_id,
        |  CAST(floor(epoch(a.ts)) AS BIGINT) AS click_s,
        |  CAST(floor(epoch(b.ts)) AS BIGINT) AS purchase_s,
        |  round(b.value, 2) AS purchase_value
        |FROM (SELECT * FROM events WHERE event_type = 'click') a
        |ASOF JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
        |  ON a.user_id = b.user_id AND b.ts <= a.ts""".stripMargin,
    "q22_pivot" ->
      """SELECT user_id,
        |  round(sum(value) FILTER (event_type = 'click'), 2) AS click,
        |  round(sum(value) FILTER (event_type = 'purchase'), 2) AS purchase,
        |  round(sum(value) FILTER (event_type = 'view'), 2) AS view,
        |  round(sum(value) FILTER (event_type = 'signup'), 2) AS signup,
        |  round(sum(value) FILTER (event_type = 'error'), 2) AS error
        |FROM events GROUP BY user_id""".stripMargin,
    "q23_above_cust_avg" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  round(max(o_totalprice), 2) AS max_price
        |FROM orders o
        |WHERE o_totalprice > 1.5 * (SELECT avg(o2.o_totalprice)
        |  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |GROUP BY o_orderpriority""".stripMargin,
    "q24_session_window" ->
      """WITH e AS (
        |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t, value
        |  FROM events),
        |flags AS (
        |  SELECT user_id, t, value,
        |    -- STRICT >: Spark's session_window merges sessions whose
        |    -- windows touch, so a gap of exactly 1800s continues the
        |    -- session (latent until sf0.1 planted an exact-gap pair;
        |    -- the e_stream_sessions rule agrees)
        |    CASE WHEN lag(t) OVER w IS NULL OR t - lag(t) OVER w > 1800
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)),
        |g AS (
        |  SELECT user_id, t, value,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY t
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flags)
        |SELECT user_id, CAST(min(t) AS BIGINT) AS s_start,
        |  count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM g GROUP BY user_id, sid""".stripMargin,
    "q25_lateral_tokens" ->
      s"""WITH toks AS (
         |  SELECT doc_id, ${graft.operators.Pipeline.tokensSql} AS ts FROM documents),
         |s AS (SELECT doc_id, ts[1:5] AS f FROM toks)
         |SELECT doc_id, CAST(i - 1 AS INT) AS token_pos, f[i] AS token
         |FROM s CROSS JOIN LATERAL (SELECT unnest(range(1, len(f) + 1)) AS i)""".stripMargin,
    "q12_star_join" ->
      """SELECT r_name, round(sum(o_totalprice), 2) AS revenue,
        |  count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,
    "q26_range_join" ->
      """WITH w AS (
        |  SELECT i AS w_id, 1704067200 + i * 12960 AS w_start,
        |    1704067200 + i * 12960 + ((i % 5) + 1) * 3600 AS w_end
        |  FROM range(0, 200) t(i)),
        |e AS (SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS es
        |      FROM events)
        |SELECT e.event_id, w.w_id
        |FROM e JOIN w ON e.es >= w.w_start AND e.es < w.w_end""".stripMargin,
    "q27_percentiles" ->
      """SELECT o_orderpriority,
        |  round(quantile_cont(o_totalprice, 0.5), 2) AS median_price,
        |  round(quantile_cont(o_totalprice, 0.9), 2) AS p90_price,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderpriority""".stripMargin)
}
