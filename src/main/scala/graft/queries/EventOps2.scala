package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.Q.{asDouble, dec}

/** Event analytics, part 2: hopping (sliding) windows, linear gap
  * interpolation, and a decimal-exact truncated EWMA — the time-series
  * transforms a feature pipeline runs over event logs.
  *
  * Timestamp convention as EventOps: Spark reads events.ts as nanos
  * (`ts div 1000` = µs) ≡ DuckDB's `epoch_us(ts)`.
  */
object EventOps2 {

  private val SlideMinutes = 5
  private val LenMinutes = 10 // = 2 slides: each event lands in 2 windows
  private val SlideUs = SlideMinutes * 60000000L

  /** Hopping-window aggregation: 10-minute windows every 5 minutes, so
    * each event lands in exactly len/slide = 2 windows. Spark's window()
    * is a scan-side generator (row expansion ×2) followed by ONE hash agg
    * on the window start — no self-join, no windows-spine table. The
    * oracle replays the same membership arithmetic: starts are the two
    * epoch-aligned 5-minute buckets at or before the event. */
  val q103_hopping_window = Q(
    "q103_hopping_window",
    Some(s"""WITH e AS (
            |  SELECT CAST(epoch_us(ts) AS BIGINT) AS us, value FROM events),
            |b AS (
            |  SELECT us, value, (us // $SlideUs) * $SlideUs AS b0 FROM e),
            |w AS (
            |  SELECT b0 AS ws, value FROM b
            |  UNION ALL
            |  SELECT b0 - $SlideUs AS ws, value FROM b)
            |SELECT CAST(ws AS BIGINT) AS w_start_us,
            |  CAST(count(*) AS BIGINT) AS n,
            |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
            |FROM w GROUP BY ws
            |ORDER BY w_start_us""".stripMargin),
    (s, d) => Tables.events(s, d)
      .select(timestamp_micros(expr("ts div 1000")).as("ets"), col("value"))
      .groupBy(window(col("ets"), s"$LenMinutes minutes",
        s"$SlideMinutes minutes").as("w"))
      .agg(count(lit(1)).as("n"), asDouble(sum(dec(col("value")))).as("sum_value"))
      .select(unix_micros(col("w.start")).as("w_start_us"), col("n"),
        col("sum_value"))
      .orderBy("w_start_us"))

  /** Linear interpolation over a gap-filled daily series (q51's spine):
    * missing days take prev + (next − prev) · elapsed/gap between the
    * nearest observed days; leading/trailing gaps stay NULL. The
    * carry-forward/backward scans are two frames of ONE user-keyed window
    * shuffle. All arithmetic is int/int and exact-decimal-sourced doubles
    * — bit-identical across engines (rounded anyway). */
  val q104_interpolate = Q(
    "q104_interpolate",
    Some("""WITH spine AS (
            |  SELECT CAST(unnest(generate_series(DATE '2024-01-01',
            |                     DATE '2024-01-31', INTERVAL 1 DAY)) AS DATE) AS day),
            |users AS (SELECT DISTINCT user_id FROM events),
            |daily AS (
            |  SELECT user_id, CAST(ts AS DATE) AS day,
            |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
            |  FROM events GROUP BY 1, 2),
            |g AS (
            |  SELECT u.user_id, s.day, d.v
            |  FROM users u CROSS JOIN spine s
            |  LEFT JOIN daily d ON d.user_id = u.user_id AND d.day = s.day),
            |f AS (
            |  SELECT user_id, day, v,
            |    last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER wp AS pd,
            |    last_value(v IGNORE NULLS) OVER wp AS pv,
            |    first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER wn AS nd,
            |    first_value(v IGNORE NULLS) OVER wn AS nv
            |  FROM g WINDOW
            |    wp AS (PARTITION BY user_id ORDER BY day
            |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
            |    wn AS (PARTITION BY user_id ORDER BY day
            |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
            |SELECT user_id, day,
            |  round(CASE WHEN v IS NOT NULL THEN v
            |             WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
            |               pv + (nv - pv) * ((day - pd) / (nd - pd))
            |        END, 6) AS filled,
            |  coalesce(v IS NULL AND pv IS NOT NULL AND nv IS NOT NULL, FALSE)
            |    AS interpolated
            |FROM f
            |ORDER BY user_id, day""".stripMargin),
    (s, d) => {
      val spine = s.range(1).select(explode(sequence(
        lit(java.sql.Date.valueOf("2024-01-01")),
        lit(java.sql.Date.valueOf("2024-01-31")),
        expr("INTERVAL 1 DAY"))).as("day"))
      val events = Tables.events(s, d)
        .withColumn("day", expr("CAST(timestamp_micros(ts div 1000) AS DATE)"))
      val users = events.select("user_id").distinct()
      val daily = events.groupBy("user_id", "day")
        .agg(asDouble(sum(dec(col("value")))).as("v"))
      val g = users.crossJoin(broadcast(spine))
        .join(daily, Seq("user_id", "day"), "left")
        .withColumn("dn", unix_date(col("day")))
      val wp = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wn = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val obs = when(col("v").isNotNull, struct(col("dn").as("d"), col("v").as("x")))
      val f = g
        .withColumn("p", last(obs, ignoreNulls = true).over(wp))
        .withColumn("nx", first(obs, ignoreNulls = true).over(wn))
      f.select(col("user_id"), col("day"),
          round(when(col("v").isNotNull, col("v"))
            .otherwise(col("p.x") + (col("nx.x") - col("p.x")) *
              ((col("dn") - col("p.d")) / (col("nx.d") - col("p.d")))), 6)
            .as("filled"),
          coalesce(col("v").isNull && col("p").isNotNull && col("nx").isNotNull,
            lit(false)).as("interpolated"))
        .orderBy("user_id", "day")
    })

  private val EwmaK = 8
  /** 0.5^(d+1) scaled by 2^K: integer weights 2^(K−1−d) = 128 … 1. */
  private val EwmaWeights: Seq[Long] =
    (0 until EwmaK).map(d => 1L << (EwmaK - 1 - d))

  /** Truncated exponential moving average (time-decayed feature): per
    * user, ewma_i = Σ_{d=0..7} 0.5^(d+1)·x_{i−d} over the ts-ordered
    * event values. Computed as Σ x·2^(7−d) in exact DECIMAL(…,2) (the
    * weights are scaled to integers) then divided by 256 — a pure
    * exponent shift on the double, so there is NO rounding step anywhere
    * and the result is bit-identical on any engine under any aggregation
    * order (round(double, n) is NOT portable: the two engines break
    * half-way ties differently). Spark computes it as a scan-side fold
    * over one window frame (no self-join); the oracle replays it as a
    * K-banded self-join on row position. */
  val q105_ewma = Q(
    "q105_ewma", {
      val w = EwmaWeights.mkString(", ")
      Some(s"""WITH r AS (
              |  SELECT user_id, event_id, CAST(value AS DECIMAL(18,2)) AS v,
              |    ROW_NUMBER() OVER (PARTITION BY user_id
              |      ORDER BY epoch_us(ts), event_id) AS rn
              |  FROM events)
              |SELECT a.user_id, a.event_id,
              |  CAST(sum(b.v * ([$w]::BIGINT[])[a.rn - b.rn + 1])
              |    AS DOUBLE) / 256.0 AS ewma
              |FROM r a JOIN r b
              |  ON a.user_id = b.user_id AND b.rn BETWEEN a.rn - ${EwmaK - 1} AND a.rn
              |GROUP BY a.user_id, a.event_id
              |ORDER BY a.user_id, a.event_id""".stripMargin)
    },
    (s, d) => {
      val wLit = EwmaWeights.map(x => s"${x}L").mkString("array(", ", ", ")")
      val frame = Window.partitionBy("user_id")
        .orderBy(col("us"), col("event_id"))
        .rowsBetween(-(EwmaK - 1), Window.currentRow)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          expr("ts div 1000").as("us"), dec(col("value")).as("v"))
        .withColumn("arr", collect_list(col("v")).over(frame))
        .select(col("user_id"), col("event_id"),
          expr(s"""CAST(aggregate(
            transform(arr, (v, i) -> CAST(v * element_at($wLit, size(arr) - i) AS DECIMAL(38,2))),
            CAST(0 AS DECIMAL(38,2)),
            (acc, t) -> CAST(acc + t AS DECIMAL(38,2))) AS DOUBLE) / 256.0""")
            .as("ewma"))
        .orderBy("user_id", "event_id")
    })

  /** Event-transition matrix (first-order Markov counts): per user the
    * ts-ordered event sequence yields (from → to) transition counts and
    * the per-from totals. One user-keyed window (lag) + one hash agg;
    * shares are left as exact integer (n, tot) pairs — a ratio column
    * would be n/tot anyway, and exact integers hash portably where a
    * rounded double could tie-break differently per engine. */
  val q113_transition_matrix = Q(
    "q113_transition_matrix",
    Some("""WITH s AS (
            |  SELECT user_id, event_type,
            |    lead(event_type) OVER (PARTITION BY user_id
            |      ORDER BY epoch_us(ts), event_id) AS next_type
            |  FROM events),
            |t AS (
            |  SELECT event_type AS from_type, next_type AS to_type,
            |    CAST(count(*) AS BIGINT) AS n
            |  FROM s WHERE next_type IS NOT NULL
            |  GROUP BY 1, 2)
            |SELECT from_type, to_type, n,
            |  CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS tot
            |FROM t
            |ORDER BY from_type, to_type""".stripMargin),
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      val t = Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          expr("ts div 1000").as("us"), col("event_id"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
      t.withColumn("tot",
          sum(col("n")).over(Window.partitionBy("from_type")).cast("long"))
        .orderBy("from_type", "to_type")
    })

  /** Weekly retention cohorts: users grouped by the week of their first
    * event; n_users active per (cohort, week offset). The cohort frame is
    * one per-user min agg; activity is a distinct (user, week) projection
    * joined back — both shuffles key on user_id. Monday-start weeks and
    * integer day arithmetic are identical in both engines. */
  val q114_retention_cohorts = Q(
    "q114_retention_cohorts",
    Some("""WITH u AS (
            |  SELECT user_id,
            |    CAST(date_trunc('week', min(CAST(ts AS DATE))) AS DATE) AS cw
            |  FROM events GROUP BY user_id),
            |e AS (
            |  SELECT DISTINCT user_id,
            |    CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS w
            |  FROM events)
            |SELECT u.cw AS cohort_week, CAST((e.w - u.cw) // 7 AS BIGINT) AS week_offset,
            |  CAST(count(*) AS BIGINT) AS n_users
            |FROM e JOIN u ON u.user_id = e.user_id
            |GROUP BY 1, 2
            |ORDER BY cohort_week, week_offset""".stripMargin),
    (s, d) => {
      val days = Tables.events(s, d)
        .select(col("user_id"),
          expr("CAST(timestamp_micros(ts div 1000) AS DATE)").as("day"))
      val u = days.groupBy("user_id")
        .agg(to_date(date_trunc("week", min(col("day")))).as("cw"))
      val e = days
        .select(col("user_id"), to_date(date_trunc("week", col("day"))).as("w"))
        .distinct()
      e.join(u, "user_id")
        .groupBy(col("cw").as("cohort_week"),
          (datediff(col("w"), col("cw")) / 7).cast("long").as("week_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_week", "week_offset")
    })

  /** Rolling 7-day distinct users per day (the WAU curve): exact distinct
    * over a trailing VALUE window. Neither engine supports
    * count(DISTINCT) in a window frame, and a per-day set union doesn't
    * decompose — the scalable exact form is the day-band join: the tiny
    * distinct day spine broadcasts against the distinct (day, user)
    * projection (≤ 7× replication), then one hash distinct-count per day.
    * (The approximate path at extreme scale is mergeable HLL per day —
    * q54's family; this is the exact complement.) */
  val q116_rolling_distinct = Q(
    "q116_rolling_distinct",
    Some("""WITH du AS (
            |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
            |days AS (SELECT DISTINCT day FROM du)
            |SELECT d.day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS wau
            |FROM days d JOIN du u ON u.day BETWEEN d.day - 6 AND d.day
            |GROUP BY d.day
            |ORDER BY d.day""".stripMargin),
    (s, d) => {
      val du = Tables.events(s, d)
        .select(expr("CAST(timestamp_micros(ts div 1000) AS DATE)").as("day"),
          col("user_id"))
        .distinct()
      val days = du.select(col("day").as("d")).distinct()
      // true ≤7× expansion: each activity day contributes to the 7 spine
      // days it can fall in, then an EQUI join keeps only real spine days
      // — a theta band join would plan as a nested-loop testing every
      // (activity, spine-day) pair
      du.select(col("user_id"),
          explode(sequence(lit(0), lit(6))).as("off"), col("day"))
        .select(col("user_id"), expr("date_add(day, off)").as("d"))
        .join(broadcast(days), "d")
        .groupBy(col("d").as("day"))
        .agg(count_distinct(col("user_id")).as("wau"))
        .orderBy("day")
    })

  private val WinLenUs = 7200000000L // 2-hour alert windows
  private val BinUs = 3600000000L    // 1-hour bin grid

  /** Binned KEYLESS interval join (the range-join optimization): every
    * 211th event opens a 2-hour alert window; count the events falling in
    * each window. With no equi key, a naive plan is a nested-loop testing
    * every (event, window) pair — instead both sides map onto a fixed
    * 1-hour bin grid: each window replicates into the ≤ len/bin + 1 bins
    * it overlaps (scan-side sequence explode), each point lands in
    * exactly ONE bin, and the bin equi-join + exact containment filter
    * yields each qualifying pair exactly once (the pair can only meet in
    * the point's bin — no dedup step exists). Replication is bounded by
    * the window/bin ratio, so the shuffle volume is O(n + m·len/bin) at
    * any scale. The oracle is the PLAIN theta join — equivalence is
    * hash-proven, the q132/q138 discipline. */
  val q153_binned_interval_join = Q(
    "q153_binned_interval_join",
    Some(s"""WITH e AS (
            |  SELECT event_id, CAST(epoch_us(ts) AS BIGINT) AS tus FROM events),
            |win AS (
            |  SELECT event_id AS win_id, tus AS ws, tus + $WinLenUs AS we
            |  FROM e WHERE event_id % 211 = 0)
            |SELECT win_id, ws,
            |  CAST(count(*) AS BIGINT) AS n_events
            |FROM win JOIN e ON e.tus >= win.ws AND e.tus < win.we
            |GROUP BY win_id, ws
            |ORDER BY win_id""".stripMargin),
    (s, d) => {
      val e = Tables.events(s, d)
        .select(col("event_id"), expr("ts div 1000").as("tus"))
      val win = e.filter(col("event_id") % 211 === 0)
        .select(col("event_id").as("win_id"), col("tus").as("ws"),
          (col("tus") + WinLenUs).as("we"))
      val winBins = win.withColumn("bin",
        explode(sequence(expr(s"ws div $BinUs"), expr(s"we div $BinUs"))))
      val pts = e.select(col("event_id"), col("tus"),
        expr(s"tus div $BinUs").as("bin"))
      winBins.join(pts, "bin")
        .filter(col("tus") >= col("ws") && col("tus") < col("we"))
        .groupBy("win_id", "ws")
        .agg(count(lit(1)).as("n_events"))
        .orderBy("win_id")
    })

  private val TriTopN = 20

  /** Frequent behavioral TRIGRAMS: each user's event stream in (ts,
    * event_id) order yields consecutive (a, b, c) event-type triples;
    * global counts with a deterministic top-N (count desc, then the
    * triple) — the sequence patterns (browse→click→purchase) a
    * first-order transition matrix (q113) cannot see.
    *
    * Scale shape: one user-keyed window builds the triples (two leads
    * over the same sort — no self-joins), one hash agg counts them, and
    * the top-N is a TakeOrdered. The pattern space is |types|³ bounded. */
  val q185_event_trigrams = Q(
    "q185_event_trigrams",
    Some(s"""WITH seq AS (
            |  SELECT user_id, event_type AS a,
            |    lead(event_type, 1) OVER w AS b,
            |    lead(event_type, 2) OVER w AS c
            |  FROM events
            |  WINDOW w AS (PARTITION BY user_id
            |               ORDER BY epoch_us(ts), event_id))
            |SELECT a, b, c, CAST(count(*) AS BIGINT) AS cnt
            |FROM seq WHERE b IS NOT NULL AND c IS NOT NULL
            |GROUP BY a, b, c
            |ORDER BY cnt DESC, a, b, c
            |LIMIT $TriTopN""".stripMargin),
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(expr("ts div 1000"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_type").as("a"),
          lead(col("event_type"), 1).over(w).as("b"),
          lead(col("event_type"), 2).over(w).as("c"))
        .filter(col("b").isNotNull && col("c").isNotNull)
        .groupBy("a", "b", "c").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"), col("c"))
        .limit(TriTopN)
    })

  /** Inter-event think-time profile: exact p50/p90/p99 (+ exact mean)
    * of per-user gaps between consecutive events, in seconds — the
    * distribution that justifies a session gap constant (q68/q72's
    * 30-minute default should sit past the knee of this curve). Gaps
    * come from one user-keyed lead window; percentiles use q193's
    * histogram-of-counts cumulative selection over the SECOND-bucketED
    * gap grid (integer rank predicate 100·cum ≥ p·total — no
    * interpolation, no global row sort). */
  val q215_gap_percentiles = Q(
    "q215_gap_percentiles",
    Some("""WITH g AS (
           |  SELECT (lead(us) OVER (PARTITION BY user_id
           |      ORDER BY us, event_id) - us) // 1000000 AS gap_s
           |  FROM (SELECT user_id, event_id,
           |          CAST(epoch_us(ts) AS BIGINT) AS us FROM events) t),
           |h AS (
           |  SELECT gap_s, CAST(count(*) AS BIGINT) AS k FROM g
           |  WHERE gap_s IS NOT NULL GROUP BY gap_s),
           |c AS (
           |  SELECT gap_s, k,
           |    sum(k) OVER (ORDER BY gap_s
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ck,
           |    sum(k) OVER () AS total
           |  FROM h)
           |SELECT CAST(max(total) AS BIGINT) AS n_gaps,
           |  round(CAST(sum(gap_s * k) AS DOUBLE) / max(total), 6) AS mean_s,
           |  CAST(min(CASE WHEN 100 * ck >= 50 * total THEN gap_s END) AS BIGINT) AS p50_s,
           |  CAST(min(CASE WHEN 100 * ck >= 90 * total THEN gap_s END) AS BIGINT) AS p90_s,
           |  CAST(min(CASE WHEN 100 * ck >= 99 * total THEN gap_s END) AS BIGINT) AS p99_s
           |FROM c""".stripMargin),
    (s, d) => {
      val wu = Window.partitionBy("user_id").orderBy("us", "event_id")
      val g = Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          expr("ts div 1000").as("us"))
        .select(floor((lead(col("us"), 1).over(wu) - col("us")) / 1000000L)
          .as("gap_s"))
        .where(col("gap_s").isNotNull)
      val h = g.groupBy("gap_s").agg(count(lit(1)).as("k"))
      val wc = Window.orderBy("gap_s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy()
      h.select(col("gap_s"), col("k"),
          sum(col("k")).over(wc).as("ck"),
          sum(col("k")).over(wAll).as("total"))
        .agg(max(col("total")).as("n_gaps"),
          round(sum(col("gap_s") * col("k")).cast("double")
            / max(col("total")), 6).as("mean_s"),
          min(when(lit(100) * col("ck") >= lit(50) * col("total"),
            col("gap_s"))).as("p50_s"),
          min(when(lit(100) * col("ck") >= lit(90) * col("total"),
            col("gap_s"))).as("p90_s"),
          min(when(lit(100) * col("ck") >= lit(99) * col("total"),
            col("gap_s"))).as("p99_s"))
    })

  val all: Seq[Q] = Seq(q103_hopping_window, q104_interpolate, q105_ewma,
    q113_transition_matrix, q114_retention_cohorts, q116_rolling_distinct,
    q153_binned_interval_join, q185_event_trigrams, q215_gap_percentiles)
}
