package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import Q.{dec, asDouble}

/** Core relational operator surface (SURVEY.md §2.8): scans, filters,
  * aggregation, joins (broadcast/shuffle/semi/anti), windows, rollup.
  *
  * Scale notes (100 TB): all aggregations are partial+final hash aggregates
  * (map-side combine); small dimension tables are broadcast explicitly so
  * the big fact side never shuffles for those joins; filters/projections are
  * plain Column expressions so Catalyst pushes them into the parquet scan.
  */
object Relational {

  /** A1/A2 reference parity (lambda_function_with_AWS_datawrangler.py:67-72):
    * whole-batch total + exact distinct count. */
  val q01_counts = Q(
    "q01_counts",
    Some("""SELECT count(*) AS total_records,
            |       count(DISTINCT l_orderkey) AS distinct_records
            |FROM lineitem""".stripMargin),
    (s, d) => Tables.lineitem(s, d).agg(
      count(lit(1)).as("total_records"),
      countDistinct(col("l_orderkey")).as("distinct_records")))

  /** TPC-H Q1-shaped pricing summary: grouped partial+final agg, decimal-
    * exact money math surfaced as double. */
  val q02_agg_pricing = Q(
    "q02_agg_pricing",
    Some("""SELECT l_returnflag, l_linestatus,
            |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
            |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
            |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
            |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
            |  count(*) AS count_order
            |FROM lineitem
            |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
            |GROUP BY l_returnflag, l_linestatus
            |ORDER BY l_returnflag, l_linestatus""".stripMargin),
    (s, d) => Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-01 00:00:00").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        asDouble(sum(dec(col("l_quantity")))).as("sum_qty"),
        asDouble(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
        asDouble(sum((dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("decimal(18,4)"))).as("sum_disc_price"),
        (asDouble(sum(dec(col("l_quantity")))) / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus"))

  /** Filter + projection — both must reach the parquet scan (PushedFilters /
    * pruned ReadSchema in the physical plan). */
  val q03_filter_pushdown = Q(
    "q03_filter_pushdown",
    Some("""SELECT o_orderkey, o_custkey, o_totalprice
            |FROM orders
            |WHERE o_orderstatus = 'F' AND o_totalprice > 200000.0
            |ORDER BY o_orderkey""".stripMargin),
    (s, d) => Tables.orders(s, d)
      .filter(col("o_orderstatus") === "F" && col("o_totalprice") > 200000.0)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy("o_orderkey"))

  /** Broadcast join: customer is the small dimension — at 100 TB the orders
    * fact side must not shuffle, so broadcast explicitly. */
  val q04_join_broadcast = Q(
    "q04_join_broadcast",
    Some("""SELECT c_mktsegment,
            |       count(*) AS n_orders,
            |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
            |FROM orders JOIN customer ON o_custkey = c_custkey
            |GROUP BY c_mktsegment
            |ORDER BY c_mktsegment""".stripMargin),
    (s, d) => Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        asDouble(sum(dec(col("o_totalprice")))).as("revenue"))
      .orderBy("c_mktsegment"))

  /** TPC-H Q5-shaped multi-join: one shuffle join on the fact keys, all
    * dimensions broadcast. */
  val q05_join_multi = Q(
    "q05_join_multi",
    Some("""SELECT r_name, n_name,
            |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
            |  count(*) AS n_lines
            |FROM lineitem
            |  JOIN orders   ON l_orderkey = o_orderkey
            |  JOIN customer ON o_custkey = c_custkey
            |  JOIN nation   ON c_nationkey = n_nationkey
            |  JOIN region   ON n_regionkey = r_regionkey
            |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
            |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
            |GROUP BY r_name, n_name
            |ORDER BY r_name, n_name""".stripMargin),
    (s, d) => Tables.lineitem(s, d)
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
                  col("o_orderdate") <  lit("1998-01-01 00:00:00").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(
        asDouble(sum((dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("decimal(18,4)"))).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("r_name", "n_name"))

  /** Left-semi join = EXISTS; the build side is broadcast (dedup keys only
    * travel), no fact shuffle. */
  val q06_semi_join = Q(
    "q06_semi_join",
    Some("""SELECT c_custkey, c_name
            |FROM customer
            |WHERE EXISTS (SELECT 1 FROM orders
            |              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
            |ORDER BY c_custkey""".stripMargin),
    (s, d) => Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_orderstatus") === "O"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey"))

  /** Left-anti join = NOT EXISTS. */
  val q07_anti_join = Q(
    "q07_anti_join",
    Some("""SELECT c_custkey, c_name
            |FROM customer
            |WHERE NOT EXISTS (SELECT 1 FROM orders
            |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
            |ORDER BY c_custkey""".stripMargin),
    (s, d) => Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_totalprice") > 300000.0),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey"))

  /** Per-group top-k via ranking window — the scalable top-k idiom (no
    * global sort; one hash-partitioned shuffle on the group key). */
  val q08_window_topk = Q(
    "q08_window_topk",
    Some("""SELECT * FROM (
            |  SELECT o_custkey, o_orderkey, o_totalprice,
            |         ROW_NUMBER() OVER (PARTITION BY o_custkey
            |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
            |  FROM orders) t
            |WHERE rn <= 3
            |ORDER BY o_custkey, rn""".stripMargin),
    (s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).cast("long").as("rn"))
        .filter(col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    })

  /** Running aggregate + lag over an event stream, per key. */
  val q09_window_running = Q(
    "q09_window_running",
    Some("""SELECT user_id, event_id, value,
            |  CAST(sum(CAST(value AS DECIMAL(18,2)))
            |       OVER (PARTITION BY user_id ORDER BY ts, event_id
            |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
            |  lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
            |FROM events
            |ORDER BY user_id, event_id""".stripMargin),
    (s, d) => {
      // ts is epoch-nanos (nanosAsLong); order on µs truncation so the
      // oracle (which reads parquet nanos as µs timestamps) sorts identically.
      val w = Window.partitionBy("user_id").orderBy(expr("ts div 1000"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("value"),
          asDouble(sum(dec(col("value")))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
            .as("running_value"),
          lag(col("value"), 1).over(w).as("prev_value"))
        .orderBy("user_id", "event_id")
    })

  /** ROLLUP hierarchy totals (region → nation → grand total). */
  val q10_rollup = Q(
    "q10_rollup",
    Some("""SELECT r_name, n_name, count(*) AS n_customers,
            |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
            |FROM customer
            |  JOIN nation ON c_nationkey = n_nationkey
            |  JOIN region ON n_regionkey = r_regionkey
            |GROUP BY ROLLUP (r_name, n_name)
            |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin),
    (s, d) => {
      Tables.views(s, d, "customer", "nation", "region")
      s.sql("""SELECT r_name, n_name, count(*) AS n_customers,
              |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
              |FROM customer
              |  JOIN nation ON c_nationkey = n_nationkey
              |  JOIN region ON n_regionkey = r_regionkey
              |GROUP BY ROLLUP (r_name, n_name)
              |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin)
    })

  val all: Seq[Q] = Seq(
    q01_counts, q02_agg_pricing, q03_filter_pushdown, q04_join_broadcast,
    q05_join_multi, q06_semi_join, q07_anti_join, q08_window_topk,
    q09_window_running, q10_rollup)
}
