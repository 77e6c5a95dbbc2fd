package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Event analytics, part 3: survival analysis and seasonal-baseline
  * anomaly detection — two statistical families the earlier event
  * entries (sessionization q68, funnel q69, cohorts q114, per-user
  * anomaly days q183) don't cover.
  *
  *  - q225: Kaplan–Meier product-limit estimator over inter-purchase
  *    gaps. Durations are day-granular user purchase→purchase gaps;
  *    each user's final purchase→observation-end gap enters CENSORED
  *    (the estimator's whole point — dropping those biases survival
  *    down). This is the retention curve a growth team actually reads.
  *  - q227: corpus-level (day-of-week × hour) seasonal baseline over a
  *    DENSE day×hour grid (zero-event hours count — omitting them
  *    biases every mean up), then per-cell z-scores against the
  *    matching seasonal cell; top-20 |z| anomalies.
  *
  * Scale shape: both collapse the corpus with one hash agg onto a
  * BOUNDED grid (distinct gap days ≤ observation span; day×hour cells =
  * 24·span) — the q193/q215 histogram-of-counts device — so every
  * window/cumulation below the agg runs on grid-sized data, never rows.
  * The KM product runs in log space: per-day ln(1−d/n) rounded to 12
  * then decimal-summed cumulatively (the q89 logprob discipline), so
  * the running product is partial-agg-order independent and
  * engine-exact; one final exp + round(6) emits the curve.
  *
  * Event-time arithmetic is exact microsecond longs (`ts div 1000` ≡
  * DuckDB `epoch_us(ts)`); day-of-week is pure integer arithmetic on
  * epoch days ((day+4) mod 7; 1970-01-01 was a Thursday) so no
  * calendar/timezone function ever enters either engine.
  */
object EventOps3 {

  private val DayUs = 86400000000L // microseconds per day

  val q225_kaplan_meier = Q(
    "q225_kaplan_meier",
    Some(s"""WITH p AS (
            |  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS tus
            |  FROM events WHERE event_type = 'purchase'),
            |mx AS (SELECT CAST(max(epoch_us(ts)) AS BIGINT) AS mxus FROM events),
            |durs AS (
            |  SELECT user_id,
            |    CAST((COALESCE(lead(tus) OVER w, mxus) - tus) // $DayUs
            |      AS BIGINT) AS dur_days,
            |    CASE WHEN lead(tus) OVER w IS NULL THEN 0 ELSE 1 END AS ev
            |  FROM p CROSS JOIN mx
            |  WINDOW w AS (PARTITION BY user_id ORDER BY tus)),
            |byday AS (
            |  SELECT dur_days AS day,
            |    CAST(count(*) FILTER (ev = 1) AS BIGINT) AS d,
            |    CAST(count(*) AS BIGINT) AS leaving
            |  FROM durs GROUP BY dur_days),
            |risk AS (
            |  SELECT day, d,
            |    (SELECT count(*) FROM durs) - COALESCE(sum(leaving) OVER (
            |      ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
            |      AND 1 PRECEDING), 0) AS n
            |  FROM byday),
            |km AS (
            |  SELECT day, d, CAST(n AS BIGINT) AS n,
            |    sum(CASE WHEN d < n THEN
            |      CAST(round(ln((CAST(n AS DOUBLE) - d) / n), 12)
            |        AS DECIMAL(28,12)) END) OVER (
            |      ORDER BY day ROWS UNBOUNDED PRECEDING) AS lsum,
            |    max(CASE WHEN d = n THEN 1 ELSE 0 END) OVER (
            |      ORDER BY day ROWS UNBOUNDED PRECEDING) AS died_out
            |  FROM risk WHERE d > 0)
            |SELECT day, n AS n_risk, d AS n_events,
            |  CASE WHEN died_out = 1 THEN CAST(0 AS DOUBLE)
            |       ELSE round(exp(CAST(lsum AS DOUBLE)), 6) END AS survival
            |FROM km ORDER BY day""".stripMargin),
    (s, d) => {
      val ev = Tables.events(s, d)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), expr("ts div 1000").as("tus"))
      val mx = ev.agg(max(expr("ts div 1000")).as("mxus"))
      val w = Window.partitionBy("user_id").orderBy("tus")
      val durs = p.crossJoin(broadcast(mx))
        .select(
          (coalesce(lead(col("tus"), 1).over(w), col("mxus")) - col("tus"))
            .as("gap"),
          when(lead(col("tus"), 1).over(w).isNull, 0).otherwise(1).as("ev"))
        .select(expr(s"gap div $DayUs").as("dur_days"), col("ev"))
      val byday = durs.groupBy(col("dur_days").as("day"))
        .agg(sum(col("ev")).cast("long").as("d"),
          count(lit(1)).as("leaving"))
      val total = durs.agg(count(lit(1)).as("ntot"))
      // grid-sized (≤ observation-span rows) from here down: the
      // unpartitioned windows run on the aggregated day grid, not rows
      val wday = Window.orderBy("day")
      val risk = byday.crossJoin(broadcast(total))
        .withColumn("n", col("ntot") -
          coalesce(sum(col("leaving")).over(
            wday.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      val cum = wday.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      risk.filter(col("d") > 0)
        // d = n (the whole remaining risk set dies) pins S to exactly 0
        // from that day on — ln(0) must never evaluate
        .withColumn("lsum",
          sum(when(col("d") < col("n"),
            round(log((col("n").cast("double") - col("d")) / col("n")), 12)
              .cast("decimal(28,12)"))).over(cum))
        .withColumn("died_out",
          max(when(col("d") === col("n"), 1).otherwise(0)).over(cum))
        .select(col("day"), col("n").cast("long").as("n_risk"),
          col("d").as("n_events"),
          when(col("died_out") === 1, lit(0.0))
            .otherwise(round(exp(col("lsum").cast("double")), 6))
            .as("survival"))
        .orderBy("day")
    })

  val q227_seasonal_anomaly = Q(
    "q227_seasonal_anomaly",
    Some(s"""WITH ev AS (
            |  SELECT CAST(epoch_us(ts) AS BIGINT) // $DayUs AS day,
            |    (CAST(epoch_us(ts) AS BIGINT) % $DayUs) // 3600000000 AS hour
            |  FROM events),
            |span AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
            |grid AS (
            |  SELECT g.day, h.hour FROM span,
            |    unnest(generate_series(d0, d1)) AS g(day),
            |    unnest(generate_series(0, 23)) AS h(hour)),
            |cnt AS (
            |  SELECT day, hour, CAST(count(*) AS BIGINT) AS n
            |  FROM ev GROUP BY day, hour),
            |cells AS (
            |  SELECT grid.day, grid.hour, (grid.day + 4) % 7 AS dow,
            |    COALESCE(cnt.n, 0) AS n
            |  FROM grid LEFT JOIN cnt
            |    ON grid.day = cnt.day AND grid.hour = cnt.hour),
            |base AS (
            |  SELECT dow, hour, CAST(count(*) AS BIGINT) AS k,
            |    sum(CAST(n AS DECIMAL(28,12))) AS sx,
            |    sum(CAST(n * n AS DECIMAL(28,12))) AS sxx
            |  FROM cells GROUP BY dow, hour),
            |z AS (
            |  SELECT c.day, c.hour, c.n,
            |    round(CAST(b.sx AS DOUBLE) / b.k, 6) AS expected,
            |    round((c.n - CAST(b.sx AS DOUBLE) / b.k)
            |      / sqrt((CAST(b.sxx AS DOUBLE)
            |              - CAST(b.sx AS DOUBLE) * CAST(b.sx AS DOUBLE) / b.k)
            |             / b.k), 6) AS zscore
            |  FROM cells c JOIN base b ON c.dow = b.dow AND c.hour = b.hour
            |  WHERE b.k > 1 AND CAST(b.sxx AS DOUBLE) * b.k
            |        > CAST(b.sx AS DOUBLE) * CAST(b.sx AS DOUBLE))
            |SELECT day, hour, n, expected, zscore
            |FROM z ORDER BY abs(zscore) DESC, day, hour
            |LIMIT 20""".stripMargin),
    (s, d) => {
      val ev = Tables.events(s, d).select(
        expr(s"(ts div 1000) div $DayUs").as("day"),
        expr(s"((ts div 1000) % $DayUs) div 3600000000").as("hour"))
      val span = ev.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      val grid = span.select(explode(expr("sequence(d0, d1)")).as("day"))
        .select(col("day"),
          explode(expr("sequence(bigint(0), bigint(23))")).as("hour"))
      val cnt = ev.groupBy("day", "hour").agg(count(lit(1)).as("n"))
      val cells = grid.join(cnt, Seq("day", "hour"), "left")
        .select(col("day"), col("hour"), ((col("day") + 4) % 7).as("dow"),
          coalesce(col("n"), lit(0L)).as("n"))
      val base = cells.groupBy("dow", "hour")
        .agg(count(lit(1)).as("k"),
          sum(col("n").cast("decimal(28,12)")).as("sx"),
          sum((col("n") * col("n")).cast("decimal(28,12)")).as("sxx"))
      val mean = col("sx").cast("double") / col("k")
      cells.join(broadcast(base), Seq("dow", "hour"))
        .filter(col("k") > 1 &&
          col("sxx").cast("double") * col("k") >
            col("sx").cast("double") * col("sx").cast("double"))
        .select(col("day"), col("hour"), col("n"),
          round(mean, 6).as("expected"),
          round((col("n") - mean) /
            sqrt((col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double") / col("k"))
              / col("k")), 6).as("zscore"))
        .orderBy(abs(col("zscore")).desc, col("day"), col("hour"))
        .limit(20)
    })

  /** Time-weighted average value (TWAP) per user-day — the temporal
    * integral the plain mean gets wrong when observations are unevenly
    * spaced: each value is weighted by how LONG it held (until the next
    * event), normalized by the observed span. Step-function-integral
    * semantics, last value contributes nothing (no successor interval) —
    * stated in the docstring because both engines must replay the same
    * convention.
    *
    * Scale shape: one (user, day)-keyed window for the successor time +
    * one hash agg on the same key — a single shuffle. Exactness: value
    * is exact DECIMAL(18,2), dt exact µs longs, the weighted sum is an
    * exact decimal; one final double division + round(6). */
  val q239_twap = Q(
    "q239_twap",
    Some(s"""WITH ev AS (
            |  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS tus,
            |    CAST(epoch_us(ts) AS BIGINT) // $DayUs AS day,
            |    CAST(value AS DECIMAL(18,2)) AS v, event_id
            |  FROM events),
            |seg AS (
            |  SELECT user_id, day, tus, v,
            |    lead(tus) OVER (PARTITION BY user_id, day
            |      ORDER BY tus, event_id) AS nxt
            |  FROM ev),
            |agg AS (
            |  SELECT user_id, day,
            |    CAST(count(*) AS BIGINT) AS n_events,
            |    sum(CASE WHEN nxt IS NOT NULL THEN v * (nxt - tus) END) AS wsum,
            |    max(tus) - min(tus) AS span
            |  FROM seg GROUP BY user_id, day)
            |SELECT user_id, day, n_events,
            |  round(CAST(wsum AS DOUBLE) / span, 6) AS twap
            |FROM agg WHERE span > 0
            |ORDER BY user_id, day""".stripMargin),
    (s, d) => {
      val w = Window.partitionBy("user_id", "day").orderBy("tus", "event_id")
      Tables.events(s, d)
        .select(col("user_id"), expr("ts div 1000").as("tus"),
          expr(s"(ts div 1000) div $DayUs").as("day"),
          col("value").cast("decimal(18,2)").as("v"), col("event_id"))
        .withColumn("nxt", lead(col("tus"), 1).over(w))
        .groupBy("user_id", "day")
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("nxt").isNotNull,
            col("v") * (col("nxt") - col("tus")))).as("wsum"),
          (max(col("tus")) - min(col("tus"))).as("span"))
        .filter(col("span") > 0)
        .select(col("user_id"), col("day"), col("n_events"),
          round(col("wsum").cast("double") / col("span"), 6).as("twap"))
        .orderBy("user_id", "day")
    })

  /** Cumulative-reach curve: running count of distinct users ever seen,
    * by day — the audience-growth chart, and the standard workaround for
    * Spark's unsupported COUNT(DISTINCT) OVER: distinct-so-far ≡
    * cumulative sum of FIRST-SEEN counts, so one user-keyed min-day agg
    * plus a cumulative window on the day grid replaces any windowed
    * distinct (integer counts — trivially engine-exact).
    *
    * Scale shape: one user hash agg, then everything lives on the
    * ≤span-sized day grid (the q193/q215 rule). */
  val q268_cumulative_reach = Q(
    "q268_cumulative_reach",
    Some("""WITH f AS (
           |  SELECT user_id,
           |    CAST(min(epoch_us(ts) // 86400000000) AS BIGINT) AS first_day
           |  FROM events GROUP BY user_id),
           |d AS (SELECT first_day AS day, CAST(count(*) AS BIGINT)
           |      AS new_users FROM f GROUP BY 1),
           |days AS (SELECT DISTINCT CAST(epoch_us(ts) // 86400000000
           |         AS BIGINT) AS day FROM events)
           |SELECT days.day, CAST(coalesce(d.new_users, 0) AS BIGINT)
           |    AS new_users,
           |  CAST(sum(coalesce(d.new_users, 0)) OVER (ORDER BY days.day)
           |    AS BIGINT) AS cumulative_users
           |FROM days LEFT JOIN d ON d.day = days.day
           |ORDER BY days.day""".stripMargin),
    (s, d) => {
      val dayOf = expr("(ts div 1000) div 86400000000")
      val firsts = Tables.events(s, d)
        .groupBy("user_id").agg(min(dayOf).as("first_day"))
        .groupBy(col("first_day").as("day"))
        .agg(count(lit(1)).as("new_users"))
      val days = Tables.events(s, d).select(dayOf.as("day")).distinct()
      val wCum = org.apache.spark.sql.expressions.Window.orderBy("day")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      days.join(firsts, Seq("day"), "left")
        .withColumn("new_users", coalesce(col("new_users"), lit(0L)))
        .withColumn("cumulative_users", sum(col("new_users")).over(wCum))
        .orderBy("day")
    })

  /** SAX (symbolic aggregate approximation) daily motifs over the hourly
    * spend series: each complete 24-hour day is z-normalized, PAA'd into
    * four 6-hour segments, and each segment mapped to one of four
    * symbols by the fixed Gaussian breakpoints ±0.6745/0 — the classic
    * time-series symbolization, with motif discovery = counting the
    * resulting 4-letter daily words. Determinism discipline: hourly
    * means round at 6 into DECIMAL(18,6) so every later per-day /
    * per-segment sum is exact; z-scores round at 6 before the breakpoint
    * compare so both engines pick identical symbols; the word assembles
    * via 4 conditional MAXes (no ordered string_agg). One corpus pass
    * (the hour agg); everything after runs on the day×hour grid. */
  val q316_sax_motifs = Q(
    "q316_sax_motifs",
    Some(s"""WITH hourly AS (
            |  SELECT epoch_us(ts) // 3600000000 AS hour,
            |    CAST(round(CAST(sum(CAST(value AS DECIMAL(18,2)))
            |      AS DOUBLE) / count(*), 6) AS DECIMAL(18,6)) AS x
            |  FROM events GROUP BY 1),
            |hg AS (
            |  SELECT hour // 24 AS day, (hour % 24) // 6 AS seg, x
            |  FROM hourly),
            |full_days AS (
            |  SELECT day FROM hg GROUP BY day HAVING count(*) = 24),
            |dm AS (
            |  SELECT day, CAST(sum(x) AS DOUBLE) / 24 AS mu,
            |    sqrt(CAST(sum(x * x) AS DOUBLE) / 24
            |      - (CAST(sum(x) AS DOUBLE) / 24)
            |      * (CAST(sum(x) AS DOUBLE) / 24)) AS sd
            |  FROM hg JOIN full_days USING (day) GROUP BY day),
            |segs AS (
            |  SELECT hg.day, seg,
            |    CAST(sum(x) AS DOUBLE) / 6 AS seg_mean
            |  FROM hg JOIN full_days USING (day) GROUP BY hg.day, seg),
            |sym AS (
            |  SELECT s.day, s.seg,
            |    CASE
            |      WHEN z < -0.6745 THEN 'a'
            |      WHEN z < 0 THEN 'b'
            |      WHEN z < 0.6745 THEN 'c'
            |      ELSE 'd' END AS c
            |  FROM (SELECT s.day, s.seg,
            |          CASE WHEN d.sd = 0 THEN CAST(0 AS DOUBLE)
            |               ELSE round((s.seg_mean - d.mu) / d.sd, 6) END
            |            AS z
            |        FROM segs s JOIN dm d ON d.day = s.day) s),
            |words AS (
            |  SELECT day,
            |    max(CASE WHEN seg = 0 THEN c END)
            |    || max(CASE WHEN seg = 1 THEN c END)
            |    || max(CASE WHEN seg = 2 THEN c END)
            |    || max(CASE WHEN seg = 3 THEN c END) AS word
            |  FROM sym GROUP BY day)
            |SELECT word, CAST(count(*) AS BIGINT) AS n_days
            |FROM words GROUP BY word
            |ORDER BY n_days DESC, word""".stripMargin),
    (s, d) => {
      val hourly = Tables.events(s, d)
        .groupBy(expr("(ts div 1000) div 3600000000").as("hour"))
        .agg(round(sum(Q.dec(col("value"))).cast("double") /
          count(lit(1)), 6).cast("decimal(18,6)").as("x"))
      val hg = graft.operators.PlanCache.persist(hourly.select(
        expr("hour div 24").as("day"),
        expr("(hour % 24) div 6").as("seg"), col("x")))
      val fullDays = hg.groupBy("day").agg(count(lit(1)).as("nh"))
        .filter(col("nh") === 24).select("day")
      val base = hg.join(fullDays, "day")
      val mu = sum("x").cast("double") / 24
      val dm = base.groupBy("day")
        .agg(mu.as("mu"),
          sqrt(sum(col("x") * col("x")).cast("double") / 24 - mu * mu)
            .as("sd"))
      val segs = base.groupBy("day", "seg")
        .agg((sum("x").cast("double") / 6).as("seg_mean"))
      val z = when(col("sd") === 0, lit(0.0))
        .otherwise(round((col("seg_mean") - col("mu")) / col("sd"), 6))
      val sym = segs.join(dm, "day")
        .select(col("day"), col("seg"),
          when(z < -0.6745, "a").when(z < 0, "b")
            .when(z < 0.6745, "c").otherwise("d").as("c"))
      val words = sym.groupBy("day").agg(concat(
        max(when(col("seg") === 0, col("c"))),
        max(when(col("seg") === 1, col("c"))),
        max(when(col("seg") === 2, col("c"))),
        max(when(col("seg") === 3, col("c")))).as("word"))
      words.groupBy("word").agg(count(lit(1)).as("n_days"))
        .orderBy(col("n_days").desc, col("word"))
    })

  /** k-step absorption probability on the q113 Markov chain: treating
    * 'purchase' as absorbing, the probability of reaching it within 1/2/3
    * steps from each start state — r_{k+1}(s) = P(s,pur) +
    * Σ_{s'≠pur} P(s,s')·r_k(s'), the funnel question ("how close is each
    * state to converting") the raw transition matrix doesn't answer.
    * The chain estimate is q113's one window + one agg; the three
    * iterations run on the k×k grid with round(·,9)-then-decimal-sum
    * folds, so the matrix-vector products are partial-agg-order
    * independent on both engines. */
  val q325_markov_absorption = Q(
    "q325_markov_absorption", {
      def step(i: Int, prev: String) =
        s"""r$i AS (
           |  SELECT b.state,
           |    round(b.r1 + COALESCE((
           |      SELECT CAST(sum(CAST(round(p.p * rr.r, 9)
           |        AS DECIMAL(28,9))) AS DOUBLE)
           |      FROM p JOIN $prev rr ON rr.state = p.to_type
           |      WHERE p.from_type = b.state
           |        AND p.to_type <> 'purchase'), 0), 9) AS r
           |  FROM base b)""".stripMargin
      Some(s"""WITH s AS (
              |  SELECT user_id, event_type,
              |    lead(event_type) OVER (PARTITION BY user_id
              |      ORDER BY epoch_us(ts), event_id) AS next_type
              |  FROM events),
              |t AS (
              |  SELECT event_type AS from_type, next_type AS to_type,
              |    CAST(count(*) AS BIGINT) AS n
              |  FROM s WHERE next_type IS NOT NULL
              |  GROUP BY 1, 2),
              |p AS (
              |  SELECT from_type, to_type,
              |    round(CAST(n AS DOUBLE)
              |      / sum(n) OVER (PARTITION BY from_type), 9) AS p
              |  FROM t),
              |base AS (
              |  SELECT f.from_type AS state,
              |    COALESCE((SELECT p FROM p WHERE p.from_type = f.from_type
              |      AND p.to_type = 'purchase'), 0) AS r1
              |  FROM (SELECT DISTINCT from_type FROM p) f),
              |r1v AS (SELECT state, r1 AS r FROM base),
              |${step(2, "r1v")},
              |${step(3, "r2")}
              |SELECT b.state AS state, round(b.r1, 9) AS within_1,
              |  r2.r AS within_2, r3.r AS within_3
              |FROM base b JOIN r2 ON r2.state = b.state
              |JOIN r3 ON r3.state = b.state
              |ORDER BY b.state""".stripMargin)
    },
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      val t = Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          expr("ts div 1000").as("us"), col("event_id"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"),
          col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
      val p = graft.operators.PlanCache.persist(t.select(
        col("from_type"), col("to_type"),
        round(col("n").cast("double") /
          sum("n").over(Window.partitionBy("from_type")), 9).as("p")))
      val states = p.select(col("from_type").as("state")).distinct()
      val base = graft.operators.PlanCache.persist(states
        .join(p.filter(col("to_type") === "purchase")
          .select(col("from_type").as("state"), col("p").as("pp")),
          Seq("state"), "left")
        .select(col("state"), coalesce(col("pp"), lit(0.0)).as("r1")))
      def step(prev: org.apache.spark.sql.DataFrame) = {
        val carry = p.filter(col("to_type") =!= "purchase")
          .join(prev.select(col("state").as("to_type"), col("r")), "to_type")
          .groupBy(col("from_type").as("state"))
          .agg(sum(round(col("p") * col("r"), 9).cast("decimal(28,9)"))
            .cast("double").as("carry"))
        base.join(carry, Seq("state"), "left")
          .select(col("state"),
            round(col("r1") + coalesce(col("carry"), lit(0.0)), 9).as("r"))
      }
      val r1v = base.select(col("state"), col("r1").as("r"))
      val r2 = step(r1v)
      val r3 = step(r2)
      base.join(r2.select(col("state"), col("r").as("within_2")), "state")
        .join(r3.select(col("state"), col("r").as("within_3")), "state")
        .select(col("state"), round(col("r1"), 9).as("within_1"),
          col("within_2"), col("within_3"))
        .orderBy("state")
    })

  /** Seasonal-naive forecast BACKTEST — the eval q227's anomaly model
    * never gets: train weekday means on the first half of the daily
    * series, forecast the second half, and report MAE plus the
    * empirical coverage of the [train-residual p10, p90] band — the
    * "is the model calibrated out of sample" readout. Daily totals are
    * exact decimals; residual quantiles are exact order statistics
    * (rank windows) on the train-day grid; per-day error terms round at
    * 6 then decimal-sum. */
  val q339_seasonal_backtest = Q(
    "q339_seasonal_backtest",
    Some(s"""WITH daily AS (
            |  SELECT epoch_us(ts) // $DayUs AS day,
            |    sum(CAST(value AS DECIMAL(18,2))) AS y
            |  FROM events GROUP BY 1),
            |span AS (
            |  SELECT (min(day) + max(day)) // 2 AS cutoff FROM daily),
            |train AS (
            |  SELECT day, (day + 4) % 7 AS dow, y FROM daily CROSS JOIN span
            |  WHERE day < cutoff),
            |test AS (
            |  SELECT day, (day + 4) % 7 AS dow, y FROM daily CROSS JOIN span
            |  WHERE day >= cutoff),
            |wd AS (
            |  SELECT dow, round(CAST(sum(y) AS DOUBLE) / count(*), 6) AS fc
            |  FROM train GROUP BY dow),
            |resid AS (
            |  SELECT round(CAST(t.y AS DOUBLE) - wd.fc, 6) AS r
            |  FROM train t JOIN wd USING (dow)),
            |rq AS (
            |  SELECT
            |    max(CASE WHEN rk = CAST(ceil(0.1 * n) AS BIGINT)
            |      THEN r END) AS r10,
            |    max(CASE WHEN rk = CAST(ceil(0.9 * n) AS BIGINT)
            |      THEN r END) AS r90
            |  FROM (SELECT r, ROW_NUMBER() OVER (ORDER BY r) AS rk,
            |          count(*) OVER () AS n FROM resid) t),
            |ev AS (
            |  SELECT round(CAST(t.y AS DOUBLE) - wd.fc, 6) AS err
            |  FROM test t JOIN wd USING (dow)),
            |m AS (
            |  SELECT CAST(count(*) AS BIGINT) AS n_test,
            |    round(CAST(sum(CAST(round(abs(err), 6) AS DECIMAL(28,6)))
            |      AS DOUBLE) / count(*), 6) AS mae,
            |    CAST(sum(CASE WHEN err >= r10 AND err <= r90
            |      THEN 1 ELSE 0 END) AS BIGINT) AS n_in
            |  FROM ev CROSS JOIN rq)
            |SELECT (SELECT CAST(count(*) AS BIGINT) FROM train) AS n_train,
            |  n_test, mae, (SELECT r10 FROM rq) AS r10,
            |  (SELECT r90 FROM rq) AS r90,
            |  round(CAST(n_in AS DOUBLE) / n_test, 6) AS coverage
            |FROM m""".stripMargin),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, d)
        .groupBy(expr(s"(ts div 1000) div $DayUs").as("day"))
        .agg(sum(Q.dec(col("value"))).as("y"))
      val span = daily.agg(
        expr("(min(day) + max(day)) div 2").as("cutoff"))
      val flagged = graft.operators.PlanCache.persist(
        daily.crossJoin(broadcast(span))
          .select(col("day"), ((col("day") + 4) % 7).as("dow"), col("y"),
            (col("day") < col("cutoff")).as("is_train")))
      val train = flagged.filter(col("is_train"))
      val test = flagged.filter(!col("is_train"))
      val wd = train.groupBy("dow")
        .agg(round(sum("y").cast("double") / count(lit(1)), 6).as("fc"))
      val resid = train.join(broadcast(wd), "dow")
        .select(round(col("y").cast("double") - col("fc"), 6).as("r"))
      val wr = Window.orderBy("r")
      val wall = Window.orderBy("r")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val rq = resid
        .select(col("r"), row_number().over(wr).as("rk"),
          count(lit(1)).over(wall).as("n"))
        .agg(max(when(col("rk") ===
          ceil(lit(0.1) * col("n")).cast("long"), col("r"))).as("r10"),
          max(when(col("rk") ===
            ceil(lit(0.9) * col("n")).cast("long"), col("r"))).as("r90"))
      val ev = test.join(broadcast(wd), "dow")
        .select(round(col("y").cast("double") - col("fc"), 6).as("err"))
      val m = ev.crossJoin(broadcast(rq))
        .agg(count(lit(1)).as("n_test"),
          round(sum(round(abs(col("err")), 6).cast("decimal(28,6)"))
            .cast("double") / count(lit(1)), 6).as("mae"),
          sum(when(col("err") >= col("r10") && col("err") <= col("r90"),
            1L).otherwise(0L)).as("n_in"))
      val nTrain = train.agg(count(lit(1)).as("n_train"))
      broadcast(nTrain).crossJoin(m).crossJoin(broadcast(rq))
        .select(col("n_train"), col("n_test"), col("mae"),
          col("r10"), col("r90"),
          round(col("n_in").cast("double") / col("n_test"), 6)
            .as("coverage"))
    })

  /** Anomaly-detector CONSENSUS over the daily-spend series: three
    * detectors with different failure modes — global z-score (|z|>2,
    * mean/sd), modified z via MAD (|0.6745·(x−med)/MAD|>2.5, robust to
    * the outliers the first one chases), and Tukey's IQR fences
    * (1.5·IQR) — each voting per day; days flagged by ≥2 make the
    * consensus list. Median/quartiles are exact order statistics (rank
    * windows) on the day grid; all three detectors share ONE daily agg.
    * The ensemble is the operational answer to single-detector false
    * alarms. */
  val q343_anomaly_consensus = Q(
    "q343_anomaly_consensus",
    Some(s"""WITH daily AS (
            |  SELECT epoch_us(ts) // $DayUs AS day,
            |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS y
            |  FROM events GROUP BY 1),
            |mo AS (
            |  SELECT CAST(count(*) AS BIGINT) AS n,
            |    CAST(sum(CAST(y AS DECIMAL(18,2))) AS DOUBLE) AS s,
            |    CAST(sum(CAST(round(y * y, 6) AS DECIMAL(28,6)))
            |      AS DOUBLE) AS ss
            |  FROM daily),
            |rk AS (
            |  SELECT day, y, ROW_NUMBER() OVER (ORDER BY y, day) AS r,
            |    count(*) OVER () AS n
            |  FROM daily),
            |qs AS (
            |  SELECT
            |    max(CASE WHEN r = CAST(ceil(0.25 * n) AS BIGINT)
            |      THEN y END) AS q1,
            |    max(CASE WHEN r = CAST(ceil(0.50 * n) AS BIGINT)
            |      THEN y END) AS med,
            |    max(CASE WHEN r = CAST(ceil(0.75 * n) AS BIGINT)
            |      THEN y END) AS q3
            |  FROM rk),
            |madr AS (
            |  SELECT max(CASE WHEN r = CAST(ceil(0.50 * n) AS BIGINT)
            |    THEN ad END) AS mad
            |  FROM (SELECT abs(y - med) AS ad,
            |          ROW_NUMBER() OVER (ORDER BY abs(y - med), day) AS r,
            |          count(*) OVER () AS n
            |        FROM daily CROSS JOIN qs) t),
            |flags AS (
            |  SELECT day, round(y, 2) AS y,
            |    CASE WHEN abs((y - s / n)
            |      / sqrt((ss - s * s / n) / (n - 1))) > 2
            |      THEN 1 ELSE 0 END AS f_z,
            |    CASE WHEN mad > 0 AND
            |      abs(0.6745 * (y - med) / mad) > 2.5
            |      THEN 1 ELSE 0 END AS f_mad,
            |    CASE WHEN y < q1 - 1.5 * (q3 - q1)
            |      OR y > q3 + 1.5 * (q3 - q1) THEN 1 ELSE 0 END AS f_iqr
            |  FROM daily CROSS JOIN mo CROSS JOIN qs CROSS JOIN madr)
            |SELECT day, y, f_z, f_mad, f_iqr,
            |  CAST(f_z + f_mad + f_iqr AS BIGINT) AS votes
            |FROM flags WHERE f_z + f_mad + f_iqr >= 2
            |ORDER BY day""".stripMargin),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val daily = graft.operators.PlanCache.persist(Tables.events(s, d)
        .groupBy(expr(s"(ts div 1000) div $DayUs").as("day"))
        .agg(sum(Q.dec(col("value"))).cast("double").as("y")))
      val mo = daily.agg(count(lit(1)).as("n"),
        sum(col("y").cast("decimal(18,2)")).cast("double").as("s"),
        sum(round(col("y") * col("y"), 6).cast("decimal(28,6)"))
          .cast("double").as("ss"))
      val wr = Window.orderBy(col("y"), col("day"))
      val wall = wr.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      val rk = daily.select(col("y"), row_number().over(wr).as("r"),
        count(lit(1)).over(wall).as("n"))
      def oStat(p: Double) =
        max(when(col("r") === ceil(lit(p) * col("n")).cast("long"),
          col("y")))
      val qs = rk.agg(oStat(0.25).as("q1"), oStat(0.50).as("med"),
        oStat(0.75).as("q3"))
      val wad = Window.orderBy(col("ad"), col("day"))
      val madr = daily.crossJoin(broadcast(qs))
        .select(col("day"), abs(col("y") - col("med")).as("ad"))
        .select(col("ad"), row_number().over(wad).as("r"),
          count(lit(1)).over(Window.orderBy(col("ad"), col("day"))
            .rowsBetween(Window.unboundedPreceding,
              Window.unboundedFollowing)).as("n"))
        .agg(max(when(col("r") === ceil(lit(0.5) * col("n")).cast("long"),
          col("ad"))).as("mad"))
      val fz = when(abs((col("y") - col("s") / col("n")) /
        sqrt((col("ss") - col("s") * col("s") / col("n")) /
          (col("n") - 1))) > 2, 1).otherwise(0)
      val fmad = when(col("mad") > 0 &&
        abs(lit(0.6745) * (col("y") - col("med")) / col("mad")) > 2.5, 1)
        .otherwise(0)
      val fiqr = when(
        col("y") < col("q1") - lit(1.5) * (col("q3") - col("q1")) ||
          col("y") > col("q3") + lit(1.5) * (col("q3") - col("q1")), 1)
        .otherwise(0)
      daily.crossJoin(broadcast(mo)).crossJoin(broadcast(qs))
        .crossJoin(broadcast(madr))
        .select(col("day"), round(col("y"), 2).as("y"),
          fz.as("f_z"), fmad.as("f_mad"), fiqr.as("f_iqr"))
        .withColumn("votes",
          (col("f_z") + col("f_mad") + col("f_iqr")).cast("long"))
        .filter(col("votes") >= 2)
        .orderBy("day")
    })

  /** Offline policy evaluation by REPLAY MATCHING (the bandit-log
    * estimator): a target policy ("always play the action with the best
    * first-half conversion rate") is evaluated on the second half using
    * ONLY the logged events whose action matches the policy's choice —
    * the unbiased trick that lets logged traffic grade a policy that
    * never ran. Actions = event types, reward = high-value purchase
    * behavior (value > 250). Train/eval split at the corpus midpoint
    * day; the policy pick is a 1-row TakeOrdered off the train grid;
    * the replay estimate and the logged baseline are two conditional
    * aggs over the eval half. */
  val q349_bandit_replay = Q(
    "q349_bandit_replay",
    Some(s"""WITH ev AS (
            |  SELECT event_type AS action,
            |    CASE WHEN value > 250 THEN 1 ELSE 0 END AS reward,
            |    epoch_us(ts) // $DayUs AS day
            |  FROM events),
            |span AS (SELECT (min(day) + max(day)) // 2 AS cutoff FROM ev),
            |pick AS (
            |  SELECT action AS best_action FROM ev CROSS JOIN span
            |  WHERE day < cutoff
            |  GROUP BY action
            |  ORDER BY CAST(sum(reward) AS DOUBLE) / count(*) DESC, action
            |  LIMIT 1),
            |eval_h AS (
            |  SELECT action, reward FROM ev CROSS JOIN span
            |  WHERE day >= cutoff),
            |m AS (
            |  SELECT
            |    CAST(count(*) AS BIGINT) AS n_eval,
            |    CAST(sum(CASE WHEN action = best_action THEN 1 ELSE 0 END)
            |      AS BIGINT) AS n_matched,
            |    round(CAST(sum(CASE WHEN action = best_action
            |      THEN reward END) AS DOUBLE)
            |      / sum(CASE WHEN action = best_action THEN 1 ELSE 0 END),
            |      6) AS replay_reward,
            |    round(CAST(sum(reward) AS DOUBLE) / count(*), 6)
            |      AS logged_reward
            |  FROM eval_h CROSS JOIN pick)
            |SELECT (SELECT best_action FROM pick) AS best_action,
            |  n_eval, n_matched, replay_reward, logged_reward,
            |  round(replay_reward - logged_reward, 6) AS lift
            |FROM m""".stripMargin),
    (s, d) => {
      val ev = graft.operators.PlanCache.persist(Tables.events(s, d)
        .select(col("event_type").as("action"),
          when(col("value") > 250, 1).otherwise(0).as("reward"),
          expr(s"(ts div 1000) div $DayUs").as("day")))
      val span = ev.agg(expr("(min(day) + max(day)) div 2").as("cutoff"))
      val withCut = ev.crossJoin(broadcast(span))
      val pick = withCut.filter(col("day") < col("cutoff"))
        .groupBy("action")
        .agg((sum("reward").cast("double") / count(lit(1))).as("rate"))
        .orderBy(col("rate").desc, col("action")).limit(1)
        .select(col("action").as("best_action"))
      val m = withCut.filter(col("day") >= col("cutoff"))
        .crossJoin(broadcast(pick))
        .agg(count(lit(1)).as("n_eval"),
          sum(when(col("action") === col("best_action"), 1L).otherwise(0L))
            .as("n_matched"),
          round(sum(when(col("action") === col("best_action"),
            col("reward"))).cast("double") /
            sum(when(col("action") === col("best_action"), 1L)
              .otherwise(0L)), 6).as("replay_reward"),
          round(sum("reward").cast("double") / count(lit(1)), 6)
            .as("logged_reward"))
      broadcast(pick).crossJoin(m)
        .select(col("best_action"), col("n_eval"), col("n_matched"),
          col("replay_reward"), col("logged_reward"),
          round(col("replay_reward") - col("logged_reward"), 6).as("lift"))
    })

  /** Conditional quantile curve: P50/P90 of per-user total spend WITHIN
    * each user-activity quintile — the heteroskedasticity readout a
    * mean-regression (q287) hides: does spend dispersion grow with
    * activity?
    *
    * Scale shape (VERDICT r10 #1 — this entry previously ranked every
    * user through ONE unpartitioned row_number window): quintile cuts
    * now come from the integer n_ev HISTOGRAM-of-counts (the q162/q293
    * boundary device) — the cumulative window orders the distinct-
    * activity-count grid (≤ max events/user rows, never users) and the
    * 4 boundaries broadcast back as a 1-row frame, so quintile
    * assignment is a scan-side comparison. Ties in n_ev land in the
    * same quintile (bins deterministic if not exactly n/5). Within-
    * quintile p50/p90 are exact order statistics selected from the
    * (quintile, y) histogram — cumulative windows partition by quintile
    * and order the post-agg 2-decimal spend grid (the q202/q204/q358
    * device), so no raw-row sort exists anywhere in the plan. */
  val q350_conditional_quantiles = Q(
    "q350_conditional_quantiles",
    Some("""WITH u AS (
           |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_ev,
           |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS y
           |  FROM events GROUP BY user_id),
           |h AS (
           |  SELECT n_ev, CAST(count(*) AS BIGINT) AS c
           |  FROM u GROUP BY n_ev),
           |ch AS (
           |  SELECT n_ev,
           |    CAST(sum(c) OVER (ORDER BY n_ev
           |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
           |    CAST(sum(c) OVER () AS BIGINT) AS n
           |  FROM h),
           |b AS (
           |  SELECT
           |    min(CASE WHEN 5 * cum >= 1 * n THEN n_ev END) AS b1,
           |    min(CASE WHEN 5 * cum >= 2 * n THEN n_ev END) AS b2,
           |    min(CASE WHEN 5 * cum >= 3 * n THEN n_ev END) AS b3,
           |    min(CASE WHEN 5 * cum >= 4 * n THEN n_ev END) AS b4
           |  FROM ch),
           |q AS (
           |  SELECT y,
           |    CAST(n_ev > b1 AS INT) + CAST(n_ev > b2 AS INT) +
           |    CAST(n_ev > b3 AS INT) + CAST(n_ev > b4 AS INT) AS quintile
           |  FROM u CROSS JOIN b),
           |g AS (
           |  SELECT quintile, y, CAST(count(*) AS BIGINT) AS c
           |  FROM q GROUP BY quintile, y),
           |cg AS (
           |  SELECT quintile, y,
           |    CAST(sum(c) OVER (PARTITION BY quintile ORDER BY y
           |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
           |    CAST(sum(c) OVER (PARTITION BY quintile) AS BIGINT) AS nq
           |  FROM g)
           |SELECT quintile, CAST(max(nq) AS BIGINT) AS n_users,
           |  round(min(CASE WHEN cum >= CAST(ceil(0.5 * nq) AS BIGINT)
           |    THEN y END), 2) AS p50,
           |  round(min(CASE WHEN cum >= CAST(ceil(0.9 * nq) AS BIGINT)
           |    THEN y END), 2) AS p90
           |FROM cg GROUP BY quintile ORDER BY quintile""".stripMargin),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val u = graft.operators.PlanCache.persist(Tables.events(s, d)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_ev"),
          sum(Q.dec(col("value"))).cast("double").as("y")))
      val h = u.groupBy("n_ev").agg(count(lit(1)).as("c"))
      val wcum = Window.orderBy("n_ev")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wall = Window.orderBy("n_ev")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val ch = h.select(col("n_ev"),
        sum("c").over(wcum).cast("long").as("cum"),
        sum("c").over(wall).cast("long").as("n"))
      val b = ch.agg(
        min(when(lit(5) * col("cum") >= lit(1) * col("n"), col("n_ev")))
          .as("b1"),
        min(when(lit(5) * col("cum") >= lit(2) * col("n"), col("n_ev")))
          .as("b2"),
        min(when(lit(5) * col("cum") >= lit(3) * col("n"), col("n_ev")))
          .as("b3"),
        min(when(lit(5) * col("cum") >= lit(4) * col("n"), col("n_ev")))
          .as("b4"))
      val q = u.crossJoin(broadcast(b))
        .select(col("y"),
          ((col("n_ev") > col("b1")).cast("int") +
            (col("n_ev") > col("b2")).cast("int") +
            (col("n_ev") > col("b3")).cast("int") +
            (col("n_ev") > col("b4")).cast("int")).as("quintile"))
      val g = q.groupBy("quintile", "y").agg(count(lit(1)).as("c"))
      val wq = Window.partitionBy("quintile").orderBy("y")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // same partition AND order spec as wq (only the frame differs):
      // CollapseWindow then fuses both sums into ONE Window exec — an
      // order-free spec would plan a second window pass (VERDICT r11 #7)
      val wqa = Window.partitionBy("quintile").orderBy("y")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val cg = g.select(col("quintile"), col("y"),
        sum("c").over(wq).cast("long").as("cum"),
        sum("c").over(wqa).cast("long").as("nq"))
      cg.groupBy("quintile")
        .agg(max("nq").cast("long").as("n_users"),
          round(min(when(col("cum") >=
            ceil(lit(0.5) * col("nq")).cast("long"), col("y"))), 2)
            .as("p50"),
          round(min(when(col("cum") >=
            ceil(lit(0.9) * col("nq")).cast("long"), col("y"))), 2)
            .as("p90"))
        .orderBy("quintile")
    })

  /** Tail-based sampling planner (the observability-pipeline retention
    * rule): keep ALL error events, everything at or above the global
    * p99 value (the slow tail — exact order statistic), and a
    * deterministic 1% md5 baseline of the rest; report per-reason
    * retained counts, the overall retention rate, and the compression
    * factor. Reasons are disjoint by precedence (error > tail >
    * baseline) so the counts add up exactly; one corpus pass + the
    * p99 rank window on the value grid. */
  val q352_tail_sampling = Q(
    "q352_tail_sampling", {
      import graft.functions.TextFunctions.hexSpanValSql
      val base = s"${hexSpanValSql("md5(CAST(event_id AS VARCHAR))", 0, 3)} % 100 = 0"
      Some(s"""WITH v AS (
              |  SELECT CAST(value AS DECIMAL(18,2)) AS val,
              |    CAST(count(*) AS BIGINT) AS c
              |  FROM events GROUP BY 1),
              |p99 AS (
              |  SELECT min(val) AS p99 FROM (
              |    SELECT val, sum(c) OVER (ORDER BY val DESC
              |      ROWS UNBOUNDED PRECEDING) AS cum,
              |      sum(c) OVER () AS n
              |    FROM v) t WHERE cum <= ceil(0.01 * n)),
              |cls AS (
              |  SELECT CASE
              |      WHEN event_type = 'error' THEN 'error'
              |      WHEN CAST(value AS DECIMAL(18,2)) >= p99 THEN 'tail'
              |      WHEN $base THEN 'baseline'
              |      ELSE 'drop' END AS reason
              |  FROM events CROSS JOIN p99),
              |m AS (
              |  SELECT reason, CAST(count(*) AS BIGINT) AS n
              |  FROM cls GROUP BY reason),
              |tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM m)
              |SELECT reason, n,
              |  round(CAST(n AS DOUBLE) / total, 6) AS share,
              |  round(CAST(total AS DOUBLE)
              |    / sum(CASE WHEN reason <> 'drop' THEN n END) OVER (), 6)
              |    AS compression
              |FROM m CROSS JOIN tot
              |ORDER BY reason""".stripMargin)
    },
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      import graft.functions.TextFunctions.hexSpanValSql
      val ev = Tables.events(s, d)
      val v = ev.groupBy(Q.dec(col("value")).as("val"))
        .agg(count(lit(1)).as("c"))
      val wdesc = Window.orderBy(col("val").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wall = Window.orderBy(col("val").desc)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val p99 = v.select(col("val"), sum("c").over(wdesc).as("cum"),
          sum("c").over(wall).as("n"))
        .filter(col("cum") <= ceil(lit(0.01) * col("n")))
        .agg(min("val").as("p99"))
      val cls = ev.crossJoin(broadcast(p99))
        .withColumn("__h", md5(col("event_id").cast("string")))
        .select(when(col("event_type") === "error", "error")
          .when(Q.dec(col("value")) >= col("p99"), "tail")
          .when(expr(hexSpanValSql("__h", 0, 3)) % 100 === 0, "baseline")
          .otherwise("drop").as("reason"))
      val m = graft.operators.PlanCache.persist(
        cls.groupBy("reason").agg(count(lit(1)).as("n")))
      val tot = m.agg(sum("n").cast("long").as("total"))
      val kept = m.filter(col("reason") =!= "drop")
        .agg(sum("n").cast("long").as("kept"))
      m.crossJoin(broadcast(tot)).crossJoin(broadcast(kept))
        .select(col("reason"), col("n"),
          round(col("n").cast("double") / col("total"), 6).as("share"),
          round(col("total").cast("double") / col("kept"), 6)
            .as("compression"))
        .orderBy("reason")
    })

  private val DebounceUs = 1000000L // 1 second

  /** Telemetry debounce — collapse retry/double-fire BURSTS: within each
    * (user, type) stream, consecutive events each ≤ 1 s after their
    * predecessor form one burst, and only the burst's first event
    * survives. The chained semantics ("within 1 s of the previous KEPT"
    * = "within 1 s of the previous event", for bursts defined by
    * consecutive gaps) is exactly the sessionization device: flag gap >
    * 1 s, cumulative-sum the flags into burst ids, keep rank-1 — all
    * windows KEYED per (user, type), never global. Per-type collapse
    * rates are the readout an SDK team uses to size the client-side
    * debounce. */
  val q355_debounce = Q(
    "q355_debounce",
    Some(s"""WITH e AS (
            |  SELECT user_id, event_type, event_id,
            |    CAST(epoch_us(ts) AS BIGINT) AS tus
            |  FROM events),
            |flagged AS (
            |  SELECT event_type,
            |    CASE WHEN lag(tus) OVER w IS NULL
            |         OR tus - lag(tus) OVER w > $DebounceUs
            |         THEN 1 ELSE 0 END AS first_of_burst
            |  FROM e WINDOW w AS (PARTITION BY user_id, event_type
            |    ORDER BY tus, event_id))
            |SELECT event_type,
            |  CAST(count(*) AS BIGINT) AS n_events,
            |  CAST(sum(first_of_burst) AS BIGINT) AS n_kept,
            |  CAST(count(*) - sum(first_of_burst) AS BIGINT) AS n_collapsed,
            |  round(1 - CAST(sum(first_of_burst) AS DOUBLE) / count(*), 6)
            |    AS collapse_rate
            |FROM flagged GROUP BY event_type
            |ORDER BY event_type""".stripMargin),
    (s, d) => {
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(col("tus"), col("event_id"))
      val flagged = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("event_id"),
          expr("ts div 1000").as("tus"))
        .withColumn("first_of_burst",
          when(lag(col("tus"), 1).over(w).isNull ||
            col("tus") - lag(col("tus"), 1).over(w) > DebounceUs, 1)
            .otherwise(0))
      flagged.groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          sum("first_of_burst").cast("long").as("n_kept"),
          (count(lit(1)) - sum("first_of_burst")).cast("long")
            .as("n_collapsed"),
          round(lit(1) - sum("first_of_burst").cast("double") /
            count(lit(1)), 6).as("collapse_rate"))
        .orderBy("event_type")
    })

  /** Knee (elbow) detection on the spend-concentration capture curve:
    * users ranked by total spend, cumulative spend share per decile,
    * and the kneedle statistic — each decile's vertical gap above the
    * diagonal chord — whose argmax is the operating point where
    * marginal capture starts decaying (the "target this many users"
    * decision).
    *
    * Scale shape (caught by the r11 catalog-wide window sweep — the
    * same defect class as q350's r10 finding): deciles previously came
    * from ONE unpartitioned row_number over every user. They now come
    * from the integer-cent spend HISTOGRAM: cumulative counts ordered
    * over the distinct-y grid (the q202/q358 value-grid device), the 9
    * decile cut values broadcast back as a 1-row frame, and each GRID
    * cell — never a user row — binned by 9 comparisons. Ties at a cut
    * share the upper decile (bins deterministic if not exactly n/10);
    * per-decile spend sums also come straight off the histogram
    * (Σ c·y), so no row-scale window or sort exists anywhere. */
  val q356_capture_knee = Q(
    "q356_capture_knee",
    Some("""WITH u AS (
           |  SELECT user_id,
           |    CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
           |      AS y
           |  FROM events GROUP BY user_id),
           |h AS (SELECT y, CAST(count(*) AS BIGINT) AS c FROM u GROUP BY y),
           |ch AS (
           |  SELECT y, c,
           |    CAST(sum(c) OVER (ORDER BY y DESC
           |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
           |    CAST(sum(c) OVER () AS BIGINT) AS n
           |  FROM h),
           |b AS (
           |  SELECT
           |    max(CASE WHEN 10 * cum >= 1 * n THEN y END) AS c1,
           |    max(CASE WHEN 10 * cum >= 2 * n THEN y END) AS c2,
           |    max(CASE WHEN 10 * cum >= 3 * n THEN y END) AS c3,
           |    max(CASE WHEN 10 * cum >= 4 * n THEN y END) AS c4,
           |    max(CASE WHEN 10 * cum >= 5 * n THEN y END) AS c5,
           |    max(CASE WHEN 10 * cum >= 6 * n THEN y END) AS c6,
           |    max(CASE WHEN 10 * cum >= 7 * n THEN y END) AS c7,
           |    max(CASE WHEN 10 * cum >= 8 * n THEN y END) AS c8,
           |    max(CASE WHEN 10 * cum >= 9 * n THEN y END) AS c9
           |  FROM ch),
           |dd AS (
           |  SELECT CAST(y < c1 AS INT) + CAST(y < c2 AS INT) +
           |    CAST(y < c3 AS INT) + CAST(y < c4 AS INT) +
           |    CAST(y < c5 AS INT) + CAST(y < c6 AS INT) +
           |    CAST(y < c7 AS INT) + CAST(y < c8 AS INT) +
           |    CAST(y < c9 AS INT) AS decile,
           |    CAST(sum(CAST(y AS DECIMAL(38,0)) * c) AS DECIMAL(38,0))
           |      AS s
           |  FROM h CROSS JOIN b GROUP BY 1),
           |tot AS (SELECT CAST(sum(s) AS DECIMAL(38,0)) AS tot FROM dd),
           |curve AS (
           |  SELECT decile,
           |    round(CAST(sum(s) OVER (ORDER BY decile
           |      ROWS UNBOUNDED PRECEDING) AS DOUBLE) / CAST(tot AS DOUBLE),
           |      6) AS cum_share
           |  FROM dd CROSS JOIN tot),
           |gaps AS (
           |  SELECT decile, cum_share,
           |    round(cum_share - (decile + 1) / 10.0, 6) AS chord_gap
           |  FROM curve),
           |best AS (SELECT max(chord_gap) AS mg FROM gaps)
           |SELECT decile, cum_share, chord_gap,
           |  CASE WHEN chord_gap = mg THEN 1 ELSE 0 END AS is_knee
           |FROM gaps CROSS JOIN best ORDER BY decile""".stripMargin),
    (s, d) => {
      val u = Tables.events(s, d)
        .groupBy("user_id")
        .agg((sum(Q.dec(col("value"))) * 100).cast("long").as("y"))
      // persist the integer-cent histogram: the plan fans out through
      // (b × dd × curve/tot × gaps/best) branches that would otherwise
      // replay the EVENTS SCAN 8× (measured r12); cached, the corpus is
      // read once and every branch reruns only the bounded grid
      val h = graft.operators.PlanCache.persist(
        u.groupBy("y").agg(count(lit(1)).as("c")))
      val wdesc = Window.orderBy(col("y").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wall = Window.orderBy(col("y").desc)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val ch = h.select(col("y"), col("c"),
        sum("c").over(wdesc).cast("long").as("cum"),
        sum("c").over(wall).cast("long").as("n"))
      val cuts = (1 to 9).map(k =>
        max(when(lit(10) * col("cum") >= lit(k) * col("n"), col("y")))
          .as(s"c$k"))
      val b = ch.agg(cuts.head, cuts.tail: _*)
      val decile = (1 to 9)
        .map(k => (col("y") < col(s"c$k")).cast("int")).reduce(_ + _)
      val dd = h.crossJoin(broadcast(b))
        .groupBy(decile.as("decile"))
        .agg(sum(col("y").cast("decimal(38,0)") * col("c"))
          .cast("decimal(38,0)").as("s"))
      val tot = dd.agg(sum("s").cast("decimal(38,0)").as("tot"))
      val wcum = Window.orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val curve = dd.crossJoin(broadcast(tot)).select(col("decile"),
        round(sum("s").over(wcum).cast("double") /
          col("tot").cast("double"), 6).as("cum_share"))
      val gaps = curve.select(col("decile"), col("cum_share"),
        round(col("cum_share") - (col("decile") + 1) / 10.0, 6)
          .as("chord_gap"))
      val best = gaps.agg(max("chord_gap").as("mg"))
      gaps.crossJoin(broadcast(best))
        .select(col("decile"), col("cum_share"), col("chord_gap"),
          when(col("chord_gap") === col("mg"), 1).otherwise(0)
            .as("is_knee"))
        .orderBy("decile")
    })

  val all: Seq[Q] =
    Seq(q225_kaplan_meier, q227_seasonal_anomaly, q239_twap,
      q268_cumulative_reach, q316_sax_motifs, q325_markov_absorption,
      q339_seasonal_backtest, q343_anomaly_consensus, q349_bandit_replay,
      q350_conditional_quantiles, q352_tail_sampling, q355_debounce,
      q356_capture_knee)
}
