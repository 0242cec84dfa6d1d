package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Scalar function-library coverage (SURVEY.md §2.9: absent in the
  * reference, free on Spark): string, date, math, array, and JSON
  * functions exercised with exact DuckDB parity. */
object Scalars {

  private def t(s: SparkSession, d: String, n: String) = Tables.read(s, d, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // string functions over part names
    "q13_string_funcs" -> ((s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        substring(col("p_name"), 1, 8).as("name8"),
        length(col("p_name")).as("name_len"),
        concat_ws("|", col("p_brand"), col("p_type")).as("bt"),
        regexp_replace(col("p_type"), "[aeiou]", "").as("novowel"),
        lpad(col("p_brand"), 12, "_").as("padded"),
        reverse(col("p_brand")).as("rev"))),

    // date/time functions over order dates (epoch-day output: engine-
    // neutral hashing, no timestamp repr differences)
    "q14_date_funcs" -> ((s, d) =>
      t(s, d, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dom"),
        quarter(col("o_orderdate")).as("q"),
        datediff(lit("1998-01-01").cast("date"), col("o_orderdate").cast("date")).as("days_to_98"))),

    // math functions
    "q15_math_funcs" -> ((s, d) =>
      t(s, d, "lineitem")
        .orderBy(col("l_orderkey").asc, col("l_linenumber").asc).limit(5000)
        .select(
        col("l_orderkey"), col("l_linenumber"),
        round(abs(col("l_discount") - 0.05), 4).as("disc_dev"),
        round(sqrt(col("l_quantity")), 4).as("sq"),
        round(ln(col("l_extendedprice")), 4).as("lnp"),
        round(pow(col("l_tax") + 1.0, 2), 4).as("taxsq"),
        floor(col("l_extendedprice")).as("pfloor"),
        ceil(col("l_extendedprice")).as("pceil"),
        pmod(col("l_orderkey"), lit(7L)).as("k7"))),

    // array construction + higher-order functions
    "q16_array_funcs" -> ((s, d) =>
      t(s, d, "documents").select(
        col("doc_id"),
        size(split(col("text"), " ")).as("raw_parts"),
        element_at(split(col("text"), " "), 1).as("first_tok"),
        array_max(transform(split(col("text"), " "), x => length(x))).as("max_tok_len"),
        // canonicalized to a string: the driver's pandas hash can't
        // factorize list columns (round-1 q16 oracle-harness crash)
        array_join(sort_array(slice(split(col("text"), " "), 1, 5)), " ").as("first5_sorted"))),

    // JSON extraction from the events props column
    "q17_json_funcs" -> ((s, d) => {
      t(s, d, "events").select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("n"))
    }),

    // window frames: lag/lead + range-style running aggregates
    "q18_window_frames" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      t(s, d, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        lag(col("o_orderkey"), 1).over(w).as("prev_key"),
        lead(col("o_orderkey"), 1).over(w).as("next_key"),
        // sum (not avg): 2-decimal inputs keep the rounded sum off the
        // .xx5 boundaries where engines' double-rounding diverges
        round(sum(col("o_totalprice")).over(w.rowsBetween(-2, 0)), 2).as("sum3"))
    }),

    // INTERSECT (q9 covers EXCEPT) + scalar subquery in one query:
    // orders above the global average price that have lineitems
    "q20_intersect_subquery" -> ((s, d) => {
      val o = t(s, d, "orders")
      val li = t(s, d, "lineitem")
      val avgPrice = o.agg(avg(col("o_totalprice"))).collect()(0).getDouble(0)
      o.filter(col("o_totalprice") > avgPrice).select(col("o_orderkey").as("k"))
        .intersect(li.select(col("l_orderkey").as("k")))
    }),

    // ranking window-function family (q18 covers lag/lead/frames):
    // rank, dense_rank, ntile, percent_rank, cume_dist over a total
    // order (price desc, key asc — deterministic ties)
    "q28_rank_funcs" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, d, "orders").select(
        col("o_orderkey"), col("o_orderpriority"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("prank"),
        round(cume_dist().over(w), 6).as("cdist"))
    }),

    // map construction + extraction (the §2.9 family q16's arrays left
    // out); the oracle pins the expected SCALARS, so Spark's map
    // semantics are verified without depending on engine map formats
    "q29_map_funcs" -> ((s, d) => {
      val m = map(
        col("p_brand"), length(col("p_name")),
        col("p_type"), length(col("p_type")))
      t(s, d, "part").select(
        col("p_partkey"),
        size(m).as("msize"),
        element_at(m, col("p_brand")).as("brand_v"),
        element_at(m, col("p_type")).as("type_v"),
        map_contains_key(m, col("p_brand")).as("has_brand"),
        array_join(sort_array(map_keys(m)), "|").as("keys_sorted"))
    }),

    // CUBE grouping sets (rollup already covered by q10)
    "q19_cube" -> ((s, d) =>
      t(s, d, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("pri"),
          col("n"), col("total"))))

  val oracleSql: Map[String, String] = Map(
    "q13_string_funcs" ->
      """SELECT p_partkey,
        |  upper(p_brand) AS brand_u,
        |  substring(p_name, 1, 8) AS name8,
        |  length(p_name) AS name_len,
        |  concat_ws('|', p_brand, p_type) AS bt,
        |  regexp_replace(p_type, '[aeiou]', '', 'g') AS novowel,
        |  lpad(p_brand, 12, '_') AS padded,
        |  reverse(p_brand) AS rev
        |FROM part""".stripMargin,
    "q14_date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS y,
        |  CAST(month(o_orderdate) AS INT) AS m,
        |  CAST(day(o_orderdate) AS INT) AS dom,
        |  CAST(quarter(o_orderdate) AS INT) AS q,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS INT)
        |    AS days_to_98
        |FROM orders""".stripMargin,
    "q15_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(abs(l_discount - 0.05), 4) AS disc_dev,
        |  round(sqrt(l_quantity), 4) AS sq,
        |  round(ln(l_extendedprice), 4) AS lnp,
        |  round(pow(l_tax + 1.0, 2), 4) AS taxsq,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS pfloor,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS pceil,
        |  l_orderkey % 7 AS k7
        |FROM (SELECT * FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 5000)""".stripMargin,
    "q16_array_funcs" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS raw_parts,
        |  string_split(text, ' ')[1] AS first_tok,
        |  list_max(list_transform(string_split(text, ' '), x -> length(x)))
        |    AS max_tok_len,
        |  array_to_string(list_sort(string_split(text, ' ')[1:5]), ' ') AS first5_sorted
        |FROM documents""".stripMargin,
    "q17_json_funcs" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k,
        |  count(*) AS n
        |FROM events GROUP BY 1""".stripMargin,
    "q18_window_frames" ->
      """SELECT o_custkey, o_orderkey,
        |  lag(o_orderkey, 1) OVER w AS prev_key,
        |  lead(o_orderkey, 1) OVER w AS next_key,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate ASC, o_orderkey ASC
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS sum3
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)""".stripMargin,
    "q20_intersect_subquery" ->
      """SELECT o_orderkey AS k FROM orders
        |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        |INTERSECT
        |SELECT l_orderkey AS k FROM lineitem""".stripMargin,
    "q28_rank_funcs" ->
      """SELECT o_orderkey, o_orderpriority,
        |  rank() OVER w AS rnk,
        |  dense_rank() OVER w AS drnk,
        |  ntile(4) OVER w AS quartile,
        |  round(percent_rank() OVER w, 6) AS prank,
        |  round(cume_dist() OVER w, 6) AS cdist
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |  ORDER BY o_totalprice DESC, o_orderkey ASC)""".stripMargin,
    "q29_map_funcs" ->
      """SELECT p_partkey,
        |  2 AS msize,
        |  CAST(length(p_name) AS INT) AS brand_v,
        |  CAST(length(p_type) AS INT) AS type_v,
        |  true AS has_brand,
        |  concat(least(p_brand, p_type), '|', greatest(p_brand, p_type))
        |    AS keys_sorted
        |FROM part""".stripMargin,
    "q19_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS st,
        |  coalesce(o_orderpriority, 'ALL') AS pri,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin)
}
