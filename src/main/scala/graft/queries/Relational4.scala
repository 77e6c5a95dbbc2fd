package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

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

  val all: Seq[Q] = Seq(q50_bag_ops, q51_gap_fill, q52_try_cast)
}
