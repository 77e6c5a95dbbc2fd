package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.Q.{asDouble, dec}

/** Relational surface, part 4: bag (multiset) set-operations, calendar
  * gap-filling, and error-tolerant casts. */
object Relational4 {

  /** EXCEPT ALL / INTERSECT ALL — multiset semantics (count-aware, unlike
    * q13/q14's distinct set ops). */
  val q50_bag_ops = Q(
    "q50_bag_ops",
    Some("""SELECT custkey, count(*) AS n FROM (
            |  SELECT o_custkey AS custkey FROM orders
            |  EXCEPT ALL
            |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
            |) t
            |GROUP BY custkey
            |ORDER BY custkey""".stripMargin),
    (s, d) => Tables.orders(s, d).select(col("o_custkey").as("custkey"))
      .exceptAll(Tables.orders(s, d).filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("custkey")))
      .groupBy("custkey")
      .agg(count(lit(1)).as("n"))
      .orderBy("custkey"))

  /** Calendar gap-fill: dimension cross join (generated date spine ×
    * distinct users) left-joined to daily activity, zero-filled — the
    * standard time-series densification pattern; the spine is generated,
    * never collected. */
  val q51_gap_fill = Q(
    "q51_gap_fill",
    Some("""WITH spine AS (
            |  SELECT CAST(unnest(generate_series(DATE '2024-01-01',
            |                     DATE '2024-01-31', INTERVAL 1 DAY)) AS DATE) AS day),
            |users AS (SELECT DISTINCT user_id FROM events),
            |daily AS (
            |  SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n
            |  FROM events GROUP BY 1, 2)
            |SELECT u.user_id, s.day, coalesce(d.n, 0) AS n_events
            |FROM users u CROSS JOIN spine s
            |LEFT JOIN daily d ON d.user_id = u.user_id AND d.day = s.day
            |ORDER BY u.user_id, s.day""".stripMargin),
    (s, d) => {
      val spine = s.range(1).select(explode(sequence(
        lit(java.sql.Date.valueOf("2024-01-01")),
        lit(java.sql.Date.valueOf("2024-01-31")),
        expr("INTERVAL 1 DAY"))).as("day"))
      val events = Tables.events(s, d)
        .withColumn("day", expr("CAST(timestamp_micros(ts div 1000) AS DATE)"))
      val users = events.select("user_id").distinct()
      val daily = events.groupBy("user_id", "day").agg(count(lit(1)).as("n"))
      users.crossJoin(broadcast(spine))
        .join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day"),
          coalesce(col("n"), lit(0L)).as("n_events"))
        .orderBy("user_id", "day")
    })

  /** Error-tolerant casting (ANSI-safe): try_cast yields NULL instead of
    * failing on undecodable input — the relational analogue of the
    * reference's decode-cascade fallbacks (E1/E2). */
  val q52_try_cast = Q(
    "q52_try_cast",
    Some("""SELECT o_orderpriority,
            |  count(*) AS n,
            |  CAST(sum(TRY_CAST(substr(o_orderpriority, 1, 1) AS BIGINT)) AS BIGINT) AS sum_prio,
            |  count(TRY_CAST(substr(o_orderpriority, 3, 20) AS BIGINT)) AS n_numeric_suffix
            |FROM orders
            |GROUP BY o_orderpriority
            |ORDER BY o_orderpriority""".stripMargin),
    (s, d) => Tables.orders(s, d)
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n"),
        sum(expr("try_cast(substring(o_orderpriority, 1, 1) AS BIGINT)"))
          .as("sum_prio"),
        count(expr("try_cast(substring(o_orderpriority, 3, 20) AS BIGINT)"))
          .as("n_numeric_suffix"))
      .orderBy("o_orderpriority"))

  /** Unpivot / melt — the inverse of q21's pivot: wide numeric columns
    * become (measure, value) rows. Narrow transform, no shuffle; row
    * growth is the measure count. */
  val q94_unpivot = Q(
    "q94_unpivot",
    Some("""SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
            |  CAST(l_quantity AS DOUBLE) AS value
            |FROM lineitem WHERE l_orderkey < 100
            |UNION ALL
            |SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
            |FROM lineitem WHERE l_orderkey < 100
            |UNION ALL
            |SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
            |FROM lineitem WHERE l_orderkey < 100
            |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin),
    (s, d) => Tables.lineitem(s, d)
      .filter(col("l_orderkey") < 100)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("double").as("l_quantity"),
        col("l_extendedprice"), col("l_discount"))
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
        "measure", "value")
      .orderBy("l_orderkey", "l_linenumber", "measure"))

  /** ntile deciles — the remaining rank-family member (row_number/rank/
    * lag/lead live in q08/q09/q27): decile assignment over the
    * (month × order-priority) revenue grid plus per-decile bounds.
    * The ntile input is the post-agg GRID (≤ 5·months rows — grows
    * with the calendar, never with order volume), so the unpartitioned
    * tile window obeys the repo's grid-only window discipline; the r10
    * sweep caught the previous per-CUSTOMER version ranking a row-scale
    * frame through one partition (the q280 scale-killer). Customer-
    * scale decile SUMMARIES live in q293/q356 via the boundary-binning
    * device; this entry is the ntile FUNCTION's coverage. */
  val q95_ntile = Q(
    "q95_ntile",
    Some("""WITH t AS (
            |  SELECT date_trunc('month', o_orderdate) AS mon,
            |    o_orderpriority AS pri,
            |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
            |  FROM orders GROUP BY 1, 2),
            |d AS (
            |  SELECT spend,
            |    CAST(ntile(10) OVER (ORDER BY spend DESC, mon, pri) AS BIGINT) AS decile
            |  FROM t)
            |SELECT decile, CAST(count(*) AS BIGINT) AS n,
            |  min(spend) AS min_spend, max(spend) AS max_spend
            |FROM d GROUP BY decile
            |ORDER BY decile""".stripMargin),
    (s, d) => {
      val t = Tables.orders(s, d)
        .groupBy(date_trunc("month", col("o_orderdate")).as("mon"),
          col("o_orderpriority").as("pri"))
        .agg(asDouble(sum(dec(col("o_totalprice")))).as("spend"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("spend").desc, col("mon"), col("pri"))
      t.withColumn("decile", ntile(10).over(w).cast("long"))
        .groupBy("decile")
        .agg(count(lit(1)).as("n"),
          min(col("spend")).as("min_spend"), max(col("spend")).as("max_spend"))
        .orderBy("decile")
    })

  /** RANGE-frame window (vs the ROWS frames everywhere else): per
    * customer, the rolling count and decimal-exact sum of orders within
    * the trailing 30 days of each order — a frame defined by VALUE
    * distance, which ROWS frames cannot express. One window shuffle. */
  val q96_range_frame = Q(
    "q96_range_frame",
    Some("""WITH o AS (
            |  SELECT o_orderkey, o_custkey,
            |    CAST(epoch(CAST(o_orderdate AS DATE)) / 86400 AS BIGINT) AS od,
            |    CAST(o_totalprice AS DECIMAL(18,2)) AS p
            |  FROM orders)
            |SELECT o_orderkey, o_custkey,
            |  CAST(count(*) OVER w AS BIGINT) AS n_30d,
            |  CAST(CAST(sum(p) OVER w AS DECIMAL(28,2)) AS DOUBLE) AS spend_30d
            |FROM o
            |WINDOW w AS (PARTITION BY o_custkey ORDER BY od
            |  RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
            |ORDER BY o_orderkey""".stripMargin),
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey").orderBy("od")
        .rangeBetween(-30, org.apache.spark.sql.expressions.Window.currentRow)
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"),
          (unix_date(to_date(col("o_orderdate")))).cast("long").as("od"),
          dec(col("o_totalprice")).as("p"))
        .withColumn("n_30d", count(lit(1)).over(w).cast("long"))
        .withColumn("spend_30d",
          sum(col("p")).over(w).cast("decimal(28,2)").cast("double"))
        .select("o_orderkey", "o_custkey", "n_30d", "spend_30d")
        .orderBy("o_orderkey")
    })

  val all: Seq[Q] = Seq(q50_bag_ops, q51_gap_fill, q52_try_cast,
    q94_unpivot, q95_ntile, q96_range_frame)
}
