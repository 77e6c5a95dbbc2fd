package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Event-analytics staples over the events table: gap-based batch
  * sessionization and an ordered funnel — the two canonical product-
  * analytics queries, both pure window/agg plans partitioned by user.
  * All event-time arithmetic runs on exact microsecond longs
  * (`ts div 1000` of the nano column ≡ DuckDB's epoch_us — the
  * convention every event-time entry shares). */
object EventOps {

  private val GapUs = 30L * 60 * 1000 * 1000 // 30-minute session gap

  /** Gap-based sessionization, batch form (the streaming twin is
    * StreamingOps.sessionize): a new session starts when the gap from
    * the previous event of the same user exceeds GapUs; one window
    * shuffle on user, then a hash agg on (user, session). */
  val q68_batch_sessions = Q(
    "q68_batch_sessions",
    Some(s"""WITH ev AS (
            |  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS tus, event_id
            |  FROM events),
            |flagged AS (
            |  SELECT user_id, tus, event_id,
            |    CASE WHEN lag(tus) OVER w IS NULL
            |              OR tus - lag(tus) OVER w > $GapUs
            |         THEN 1 ELSE 0 END AS new_sess
            |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
            |sessions AS (
            |  SELECT user_id, tus, CAST(sum(new_sess) OVER (
            |      PARTITION BY user_id ORDER BY tus, event_id
            |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
            |  FROM flagged)
            |SELECT user_id, session_idx,
            |  CAST(count(*) AS BIGINT) AS n_events,
            |  min(tus) AS start_us, max(tus) AS end_us
            |FROM sessions
            |GROUP BY user_id, session_idx
            |ORDER BY user_id, session_idx""".stripMargin),
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
      val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("user_id"), expr("ts div 1000").as("tus"), col("event_id"))
        .withColumn("new_sess",
          when(lag(col("tus"), 1).over(w).isNull ||
            col("tus") - lag(col("tus"), 1).over(w) > GapUs, 1).otherwise(0))
        .withColumn("session_idx", sum(col("new_sess")).over(cum).cast("long"))
        .groupBy("user_id", "session_idx")
        .agg(count(lit(1)).as("n_events"),
          min(col("tus")).as("start_us"), max(col("tus")).as("end_us"))
        .orderBy("user_id", "session_idx")
    })

  /** Ordered funnel signup → click → purchase: each stage's first time
    * must be at-or-after the previous stage's. Three chained per-user
    * window minima (same partitioning ⇒ one shuffle), then a global
    * count — the plan a funnel should have, not a 3-way self-join. */
  val q69_funnel = Q(
    "q69_funnel",
    Some("""WITH ev AS (
            |  SELECT user_id, event_type, CAST(epoch_us(ts) AS BIGINT) AS tus
            |  FROM events),
            |staged AS (
            |  SELECT user_id,
            |    min(CASE WHEN event_type = 'signup' THEN tus END) AS s
            |  FROM ev GROUP BY user_id),
            |clicked AS (
            |  SELECT ev.user_id, staged.s,
            |    min(CASE WHEN event_type = 'click' AND tus >= s THEN tus END) AS c
            |  FROM ev JOIN staged ON ev.user_id = staged.user_id
            |  GROUP BY ev.user_id, staged.s),
            |purchased AS (
            |  SELECT ev.user_id, clicked.s, clicked.c,
            |    min(CASE WHEN event_type = 'purchase' AND tus >= c THEN tus END) AS p
            |  FROM ev JOIN clicked ON ev.user_id = clicked.user_id
            |  GROUP BY ev.user_id, clicked.s, clicked.c)
            |SELECT CAST(count(*) AS BIGINT) AS n_users,
            |  CAST(count(s) AS BIGINT) AS n_signup,
            |  CAST(count(c) AS BIGINT) AS n_click_after,
            |  CAST(count(p) AS BIGINT) AS n_purchase_after
            |FROM purchased""".stripMargin),
    (s, d) => {
      val w = Window.partitionBy("user_id")
      Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          expr("ts div 1000").as("tus"))
        .withColumn("s",
          min(when(col("event_type") === "signup", col("tus"))).over(w))
        .withColumn("c",
          min(when(col("event_type") === "click" && col("tus") >= col("s"),
            col("tus"))).over(w))
        .withColumn("p",
          min(when(col("event_type") === "purchase" && col("tus") >= col("c"),
            col("tus"))).over(w))
        .groupBy("user_id")
        .agg(first(col("s")).as("s"), first(col("c")).as("c"),
          first(col("p")).as("p"))
        .agg(count(lit(1)).as("n_users"),
          count(col("s")).as("n_signup"),
          count(col("c")).as("n_click_after"),
          count(col("p")).as("n_purchase_after"))
    })

  /** Full outer join (the one join type the catalog lacked): per-user
    * event activity vs customer master — rows survive from either side,
    * null-bridged with explicit coalesces. Shuffle join on the key (both
    * sides large at scale); AQE handles skew. */
  val q70_full_outer = Q(
    "q70_full_outer",
    Some("""WITH act AS (
            |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
            |  FROM events GROUP BY user_id)
            |SELECT coalesce(c.c_custkey, a.user_id) AS id,
            |  c.c_name AS name,
            |  coalesce(a.n_events, 0) AS n_events,
            |  (c.c_custkey IS NOT NULL) AS known_customer,
            |  (a.user_id IS NOT NULL) AS active
            |FROM customer c FULL OUTER JOIN act a ON c.c_custkey = a.user_id
            |ORDER BY id""".stripMargin),
    (s, d) => {
      val act = Tables.events(s, d)
        .groupBy("user_id").agg(count(lit(1)).as("n_events"))
      Tables.customer(s, d)
        .join(act, col("c_custkey") === col("user_id"), "full_outer")
        .select(
          coalesce(col("c_custkey"), col("user_id")).as("id"),
          col("c_name").as("name"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          col("c_custkey").isNotNull.as("known_customer"),
          col("user_id").isNotNull.as("active"))
        .orderBy("id")
    })

  /** Spark's BUILT-IN session_window operator, oracle-checked against the
    * lag/cumsum formulation. One semantic difference from q68: a window
    * [start, last+gap) EXCLUDES an event landing exactly at the boundary
    * (>= starts a new session, vs q68's >), and the session end is
    * last event + gap — the oracle mirrors both exactly. */
  val q80_session_window = Q(
    "q80_session_window",
    Some(s"""WITH ev AS (
            |  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS tus, event_id
            |  FROM events),
            |flagged AS (
            |  SELECT user_id, tus, event_id,
            |    CASE WHEN lag(tus) OVER w IS NULL
            |              OR tus - lag(tus) OVER w >= $GapUs
            |         THEN 1 ELSE 0 END AS new_sess
            |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
            |s2 AS (
            |  SELECT user_id, tus, CAST(sum(new_sess) OVER (
            |      PARTITION BY user_id ORDER BY tus, event_id
            |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
            |  FROM flagged)
            |SELECT user_id, min(tus) AS start_us,
            |  max(tus) + $GapUs AS end_us,
            |  CAST(count(*) AS BIGINT) AS n_events
            |FROM s2
            |GROUP BY user_id, session_idx
            |ORDER BY user_id, start_us""".stripMargin),
    (s, d) => Tables.events(s, d)
      .select(col("user_id"), expr("timestamp_micros(ts div 1000)").as("tse"))
      .groupBy(col("user_id"), session_window(col("tse"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        unix_micros(col("session_window.end")).as("end_us"),
        col("n_events"))
      .orderBy("user_id", "start_us"))

  /** MARKETING ATTRIBUTION matrix: for every purchase, the first-touch
    * and last-touch channel within a 30-minute lookback, cross-tabulated
    * with purchase counts and revenue — the first-vs-last comparison
    * every attribution migration argues about.
    *
    * Determinism device: each touch is PACKED as tus·8 + channel-code
    * (monotone in time, code-tiebroken), so first/last touch are plain
    * min/max over a RANGE frame — no IGNORE NULLS ordering ambiguity
    * when touches share a microsecond, and nulls (non-touch rows) drop
    * out of min/max natively in both engines.
    *
    * Scale shape: ONE user-keyed shuffle carries both window aggregates
    * (same spec), then a ≤25-group hash agg; revenue sums ride exact
    * decimals. */
  val q197_attribution = Q(
    "q197_attribution", {
      val decode = (c: String) =>
        s"""CASE coalesce($c % 8, 0) WHEN 1 THEN 'click' WHEN 2 THEN 'error'
           |      WHEN 3 THEN 'signup' WHEN 4 THEN 'view'
           |      ELSE 'direct' END""".stripMargin
      Some(s"""WITH ev AS (
              |  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS tus,
              |    event_type, value
              |  FROM events),
              |packed AS (
              |  SELECT user_id, tus, event_type, value,
              |    CASE event_type WHEN 'click' THEN tus * 8 + 1
              |      WHEN 'error' THEN tus * 8 + 2
              |      WHEN 'signup' THEN tus * 8 + 3
              |      WHEN 'view' THEN tus * 8 + 4 END AS pk
              |  FROM ev),
              |wins AS (
              |  SELECT user_id, event_type, value,
              |    min(pk) OVER w AS fpk, max(pk) OVER w AS lpk
              |  FROM packed
              |  WINDOW w AS (PARTITION BY user_id ORDER BY tus
              |    RANGE BETWEEN $GapUs PRECEDING AND 1 PRECEDING)),
              |pur AS (
              |  SELECT ${decode("fpk")} AS first_channel,
              |    ${decode("lpk")} AS last_channel, value
              |  FROM wins WHERE event_type = 'purchase')
              |SELECT first_channel, last_channel,
              |  CAST(count(*) AS BIGINT) AS n_purchases,
              |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
              |    AS total_value
              |FROM pur GROUP BY first_channel, last_channel
              |ORDER BY first_channel, last_channel""".stripMargin)
    },
    (s, d) => {
      import Q.{dec, asDouble}
      def decode(c: Column): Column =
        when(coalesce(c % 8, lit(0)) === 1, "click")
          .when(coalesce(c % 8, lit(0)) === 2, "error")
          .when(coalesce(c % 8, lit(0)) === 3, "signup")
          .when(coalesce(c % 8, lit(0)) === 4, "view")
          .otherwise("direct")
      val w = Window.partitionBy("user_id").orderBy("tus")
        .rangeBetween(-GapUs, -1)
      Tables.events(s, d)
        .select(col("user_id"), expr("ts div 1000").as("tus"),
          col("event_type"), col("value"))
        .withColumn("pk",
          when(col("event_type") === "click", col("tus") * 8 + 1)
            .when(col("event_type") === "error", col("tus") * 8 + 2)
            .when(col("event_type") === "signup", col("tus") * 8 + 3)
            .when(col("event_type") === "view", col("tus") * 8 + 4))
        .withColumn("fpk", min(col("pk")).over(w))
        .withColumn("lpk", max(col("pk")).over(w))
        .filter(col("event_type") === "purchase")
        .select(decode(col("fpk")).as("first_channel"),
          decode(col("lpk")).as("last_channel"), col("value"))
        .groupBy("first_channel", "last_channel")
        .agg(count(lit(1)).as("n_purchases"),
          asDouble(sum(dec(col("value")))).as("total_value"))
        .orderBy("first_channel", "last_channel")
    })

  val all: Seq[Q] = Seq(q68_batch_sessions, q69_funnel, q70_full_outer,
    q80_session_window, q197_attribution)
}
