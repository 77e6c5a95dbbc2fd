package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import Q.{dec, asDouble}

/** Relational surface, part 2 (SURVEY.md §2.8): cube / grouping sets, set
  * operations, global top-k, scalar function families (string/date/regex),
  * pivot, range join, as-of join, CDC-latest dedup, partition derivation.
  *
  * The as-of join uses the union-interleave + last(ignoreNulls) window idiom:
  * one shuffle on the key, O(n log n) per partition, no pairwise blowup —
  * the shape that survives 100 TB, unlike a time-conditional theta join.
  */
object Relational2 {

  /** CUBE over two grouping dimensions (SQL surface — cube/rollup read best
    * and plan identically to the Dataset API). */
  val q11_cube = Q(
    "q11_cube",
    Some("""SELECT l_returnflag, l_linestatus, count(*) AS n,
            |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
            |FROM lineitem
            |GROUP BY CUBE (l_returnflag, l_linestatus)
            |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin),
    (s, d) => {
      Tables.views(s, d, "lineitem")
      s.sql("""SELECT l_returnflag, l_linestatus, count(*) AS n,
              |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
              |FROM lineitem
              |GROUP BY CUBE (l_returnflag, l_linestatus)
              |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
    })

  /** Explicit GROUPING SETS. */
  val q12_grouping_sets = Q(
    "q12_grouping_sets",
    Some("""SELECT o_orderpriority, o_orderstatus, count(*) AS n,
            |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
            |FROM orders
            |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
            |ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin),
    (s, d) => {
      Tables.views(s, d, "orders")
      s.sql("""SELECT o_orderpriority, o_orderstatus, count(*) AS n,
              |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
              |FROM orders
              |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
              |ORDER BY o_orderpriority ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST""".stripMargin)
    })

  /** INTERSECT (distinct): customers that do have orders. */
  val q13_intersect = Q(
    "q13_intersect",
    Some("""SELECT c_custkey AS custkey FROM customer
            |INTERSECT
            |SELECT o_custkey AS custkey FROM orders
            |ORDER BY custkey""".stripMargin),
    (s, d) => Tables.customer(s, d).select(col("c_custkey").as("custkey"))
      .intersect(Tables.orders(s, d).select(col("o_custkey").as("custkey")))
      .orderBy("custkey"))

  /** EXCEPT (distinct): ordered-by customers minus big spenders. */
  val q14_except = Q(
    "q14_except",
    Some("""SELECT o_custkey AS custkey FROM orders
            |EXCEPT
            |SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 250000.0
            |ORDER BY custkey""".stripMargin),
    (s, d) => Tables.orders(s, d).select(col("o_custkey").as("custkey"))
      .except(Tables.orders(s, d).filter(col("o_totalprice") > 250000.0)
        .select(col("o_custkey").as("custkey")))
      .orderBy("custkey"))

  /** UNION (distinct) across two derivations of the same domain. */
  val q15_union = Q(
    "q15_union",
    Some("""SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 280000.0
            |UNION
            |SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
            |ORDER BY custkey""".stripMargin),
    (s, d) => Tables.orders(s, d).filter(col("o_totalprice") > 280000.0)
      .select(col("o_custkey").as("custkey"))
      .union(Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("custkey")))
      .distinct()
      .orderBy("custkey"))

  /** Global top-k: plans as TakeOrderedAndProject (per-partition heaps +
    * driver merge of k·P rows — no global sort at any scale). */
  val q16_topk_global = Q(
    "q16_topk_global",
    Some("""SELECT o_orderkey, o_custkey, o_totalprice
            |FROM orders
            |ORDER BY o_totalprice DESC, o_orderkey
            |LIMIT 20""".stripMargin),
    (s, d) => Tables.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(20))

  /** String function family (F-series parity: the reference's only string
    * ops are decode/format; this is the full built-in surface). */
  val q17_string_funcs = Q(
    "q17_string_funcs",
    Some("""SELECT p_partkey,
            |  upper(p_name) AS name_upper,
            |  CAST(length(p_name) AS BIGINT) AS name_len,
            |  substr(p_name, 1, 5) AS name_pfx,
            |  concat_ws('-', p_brand, p_type) AS brand_type,
            |  replace(p_type, ' ', '_') AS type_snake
            |FROM part
            |ORDER BY p_partkey""".stripMargin),
    (s, d) => Tables.part(s, d).select(
      col("p_partkey"),
      upper(col("p_name")).as("name_upper"),
      length(col("p_name")).cast("long").as("name_len"),
      substring(col("p_name"), 1, 5).as("name_pfx"),
      concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
      regexp_replace(col("p_type"), " ", "_").as("type_snake"))
      .orderBy("p_partkey"))

  /** Date/time function family (F6 parity: partition derivation is
    * date_format; here the typed arithmetic too). */
  val q18_date_funcs = Q(
    "q18_date_funcs",
    Some("""SELECT o_orderkey,
            |  CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS order_year,
            |  CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS order_month,
            |  CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month_start,
            |  CAST(datediff('day', DATE '1995-01-01', o_orderdate) AS BIGINT) AS days_since_95
            |FROM orders
            |WHERE o_orderkey < 1000
            |ORDER BY o_orderkey""".stripMargin),
    (s, d) => Tables.orders(s, d)
      .filter(col("o_orderkey") < 1000)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("order_year"),
        month(col("o_orderdate")).cast("long").as("order_month"),
        date_trunc("month", col("o_orderdate")).cast("date").as("order_month_start"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).cast("long")
          .as("days_since_95"))
      .orderBy("o_orderkey"))

  /** Conditional aggregation (CASE inside agg). */
  val q19_case_agg = Q(
    "q19_case_agg",
    Some("""SELECT l_linestatus,
            |  CAST(sum(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS returned_qty,
            |  CAST(sum(CASE WHEN l_discount > 0.05 THEN CAST(l_extendedprice AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS discounted_price,
            |  count(*) AS n
            |FROM lineitem
            |GROUP BY l_linestatus
            |ORDER BY l_linestatus""".stripMargin),
    (s, d) => Tables.lineitem(s, d)
      .groupBy("l_linestatus")
      .agg(
        asDouble(sum(when(col("l_returnflag") === "R", dec(col("l_quantity")))
          .otherwise(lit(0)))).as("returned_qty"),
        asDouble(sum(when(col("l_discount") > 0.05, dec(col("l_extendedprice")))
          .otherwise(lit(0)))).as("discounted_price"),
        count(lit(1)).as("n"))
      .orderBy("l_linestatus"))

  /** GROUP BY + HAVING. */
  val q20_having = Q(
    "q20_having",
    Some("""SELECT o_custkey, count(*) AS n_orders
            |FROM orders
            |GROUP BY o_custkey
            |HAVING count(*) >= 15
            |ORDER BY o_custkey""".stripMargin),
    (s, d) => Tables.orders(s, d)
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= 15)
      .orderBy("o_custkey"))

  /** Pivot: per-linestatus quantity by return flag, as columns. */
  val q21_pivot = Q(
    "q21_pivot",
    Some("""SELECT l_linestatus,
            |  CAST(sum(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "A",
            |  CAST(sum(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "N",
            |  CAST(sum(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "R"
            |FROM lineitem
            |GROUP BY l_linestatus
            |ORDER BY l_linestatus""".stripMargin),
    (s, d) => Tables.lineitem(s, d)
      .groupBy("l_linestatus")
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(asDouble(sum(dec(col("l_quantity")))))
      .orderBy("l_linestatus"))

  /** Arg-max per group via ranking window (each customer's biggest order). */
  val q22_argmax = Q(
    "q22_argmax",
    Some("""SELECT o_custkey, o_orderkey, o_totalprice FROM (
            |  SELECT o_custkey, o_orderkey, o_totalprice,
            |         ROW_NUMBER() OVER (PARTITION BY o_custkey
            |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
            |  FROM orders) t
            |WHERE rn = 1
            |ORDER BY o_custkey""".stripMargin),
    (s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).as("rn"))
        .filter(col("rn") === 1)
        .drop("rn")
        .orderBy("o_custkey")
    })

  /** Range (interval) join: equi key + time-band condition. The equi key
    * carries the shuffle; the band is a post-join filter — stays a hash
    * join at scale, never a cartesian. */
  val q23_range_join = Q(
    "q23_range_join",
    Some("""SELECT l_linestatus, count(*) AS n_in_window,
            |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS price_in_window
            |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            |  AND l_shipdate >= o_orderdate
            |  AND l_shipdate <= o_orderdate + INTERVAL 90 DAY
            |GROUP BY l_linestatus
            |ORDER BY l_linestatus""".stripMargin),
    (s, d) => Tables.lineitem(s, d)
      .join(Tables.orders(s, d),
        col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") >= col("o_orderdate") &&
        col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .groupBy("l_linestatus")
      .agg(count(lit(1)).as("n_in_window"),
        asDouble(sum(dec(col("l_extendedprice")))).as("price_in_window"))
      .orderBy("l_linestatus"))

  /** As-of join: for each event, the most recent order date of that user at
    * event time. Union-interleave both sides on (time, kind), then
    * last(ignoreNulls) over an unbounded-preceding window — one shuffle on
    * the key, no pairwise expansion (the scalable as-of idiom). */
  val q24_asof_join = Q(
    "q24_asof_join",
    Some("""SELECT event_id, user_id,
            |  (SELECT CAST(max(o_orderdate) AS DATE) FROM orders
            |   WHERE o_custkey = user_id AND o_orderdate <= ts) AS last_order_day
            |FROM events
            |ORDER BY event_id""".stripMargin),
    (s, d) => {
      val ev = Tables.events(s, d).select(
        col("event_id"), col("user_id"),
        expr("timestamp_micros(ts div 1000)").as("ts_us"))
      graft.operators.AsOfJoin.leftAsOf(
          ev, "user_id", "ts_us",
          Tables.orders(s, d), "o_custkey", "o_orderdate",
          to_date(col("o_orderdate")), "last_order_day")
        .select("event_id", "user_id", "last_order_day")
        .orderBy("event_id")
    })

  /** JSON-ish field extraction from the events props payload (regex form —
    * identical semantics in both engines, codegen'd, no UDF). */
  val q25_json_extract = Q(
    "q25_json_extract",
    Some("""SELECT event_type,
            |  CAST(sum(CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
            |  count(*) AS n
            |FROM events
            |GROUP BY event_type
            |ORDER BY event_type""".stripMargin),
    (s, d) => Tables.events(s, d)
      .groupBy("event_type")
      .agg(
        sum(regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long")).as("sum_k"),
        count(lit(1)).as("n"))
      .orderBy("event_type"))

  /** F6 parity: yyyy/MM/dd/HH partition-path derivation from event time
    * (event-time variant of the reference's processing-time layout,
    * lambda_function.py:57,75-77). */
  val q26_partition_derivation = Q(
    "q26_partition_derivation",
    Some("""SELECT strftime(ts, '%Y') AS year, strftime(ts, '%m') AS month,
            |       strftime(ts, '%d') AS day, strftime(ts, '%H') AS hour,
            |       count(*) AS n
            |FROM events
            |GROUP BY 1, 2, 3, 4
            |ORDER BY year, month, day, hour""".stripMargin),
    (s, d) => Tables.events(s, d)
      .withColumn("ts_us", expr("timestamp_micros(ts div 1000)"))
      .groupBy(
        date_format(col("ts_us"), "yyyy").as("year"),
        date_format(col("ts_us"), "MM").as("month"),
        date_format(col("ts_us"), "dd").as("day"),
        date_format(col("ts_us"), "HH").as("hour"))
      .agg(count(lit(1)).as("n"))
      .orderBy("year", "month", "day", "hour"))

  /** CDC latest-record-per-key (the reference's implicit contract: replays
    * resolved by latest SRC_KEY_VAL version; SURVEY.md §2.6). */
  val q27_cdc_latest = Q(
    "q27_cdc_latest",
    Some("""SELECT user_id, event_type, event_id, value FROM (
            |  SELECT user_id, event_type, event_id, value,
            |         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
            |                            ORDER BY ts DESC, event_id DESC) AS rn
            |  FROM events) t
            |WHERE rn = 1
            |ORDER BY user_id, event_type""".stripMargin),
    (s, d) => {
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(expr("ts div 1000").desc, col("event_id").desc)
      Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("event_id"), col("value"),
          row_number().over(w).as("rn"))
        .filter(col("rn") === 1)
        .drop("rn")
        .orderBy("user_id", "event_type")
    })

  /** Exact distinct per group (A2 parity generalized to GROUP BY). */
  val q28_distinct_per_group = Q(
    "q28_distinct_per_group",
    Some("""SELECT l_suppkey, count(DISTINCT l_partkey) AS n_parts,
            |       count(*) AS n_lines
            |FROM lineitem
            |GROUP BY l_suppkey
            |ORDER BY l_suppkey""".stripMargin),
    (s, d) => Tables.lineitem(s, d)
      .groupBy("l_suppkey")
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        count(lit(1)).as("n_lines"))
      .orderBy("l_suppkey"))

  val all: Seq[Q] = Seq(
    q11_cube, q12_grouping_sets, q13_intersect, q14_except, q15_union,
    q16_topk_global, q17_string_funcs, q18_date_funcs, q19_case_agg,
    q20_having, q21_pivot, q22_argmax, q23_range_join, q24_asof_join,
    q25_json_extract, q26_partition_derivation, q27_cdc_latest,
    q28_distinct_per_group)
}
