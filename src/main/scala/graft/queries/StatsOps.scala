package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.Q.dec

/** Model-evaluation & statistical-testing battery: the reports a
  * training-data pipeline runs to judge its own quality classifiers and
  * detect distribution drift — ROC AUC, a calibration/reliability table,
  * a two-sample Kolmogorov–Smirnov test, and a chi-squared independence
  * test. (The reference is a pure ETL — lambda_function.py:140 computes
  * only count/distinct — so this whole family is extension surface in
  * the SURVEY.md §2.11 sense.)
  *
  * All four are EXACT-arithmetic plans: counts and 2-decimal sums stay
  * in BIGINT/DECIMAL through every aggregation (order-independent under
  * Spark's partial aggs), and doubles appear only in final per-row
  * scalar expressions built identically on both engines — bit-stable
  * cross-engine, so the driver's value-hash comparison holds.
  *
  * Scale note shared by AUC and KS: both cumulate over the DISTINCT
  * SCORE DOMAIN, not over rows. Scores are 2-decimal money values, so
  * the domain is a bounded grid (≤ ~50k cells regardless of row count)
  * — the single-partition cumulative window runs on that tiny
  * post-aggregation frame, the same histogram-of-counts shape as
  * q193's percentiles. Row-scale work is one hash aggregation.
  */
object StatsOps {

  /** ROC AUC of `value` as a ranking score for the purchase event, via
    * the tie-aware Mann–Whitney rank statistic. Per distinct score:
    * (n, n_pos); a cumulative window over the score grid yields
    * 2×average-rank as the INTEGER rank2 = 2·cum_below + n + 1; then
    * AUC = (Σ_pos rank2 − P(P+1)) / (2·P·N). All moments are exact
    * BIGINTs; the one double division is a final 1-row expression. */
  val q202_auc = Q(
    "q202_auc",
    Some("""WITH s AS (
           |  SELECT CAST(value AS DECIMAL(18,2)) AS score,
           |    CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS p
           |  FROM events GROUP BY 1),
           |r AS (
           |  SELECT n, p,
           |    2 * COALESCE(sum(n) OVER (ORDER BY score
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |      + n + 1 AS rank2
           |  FROM s),
           |m AS (
           |  SELECT CAST(sum(p) AS BIGINT) AS n_pos,
           |    CAST(sum(n - p) AS BIGINT) AS n_neg,
           |    CAST(sum(p * rank2) AS BIGINT) AS s2
           |  FROM r)
           |SELECT n_pos, n_neg,
           |  round(CAST(s2 - n_pos * (n_pos + 1) AS DOUBLE)
           |    / (CAST(2 AS DOUBLE) * n_pos * n_neg), 6) AS auc
           |FROM m""".stripMargin),
    (s, d) => {
      val byScore = Tables.events(s, d)
        .groupBy(dec(col("value")).as("score"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("p"))
      val w = Window.orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
      byScore
        .withColumn("rank2",
          lit(2L) * coalesce(sum(col("n")).over(w), lit(0L)) + col("n") + 1L)
        .agg(sum(col("p")).as("n_pos"),
          sum(col("n") - col("p")).as("n_neg"),
          sum(col("p") * col("rank2")).as("s2"))
        .select(col("n_pos"), col("n_neg"),
          round((col("s2") - col("n_pos") * (col("n_pos") + 1L)).cast("double")
            / (lit(2L).cast("double") * col("n_pos") * col("n_neg")), 6)
            .as("auc"))
    })

  /** Calibration / reliability table: fixed-width score bins (50-unit
    * buckets of `value`, capped at bin 9) vs the empirical purchase
    * rate — the monotonicity check behind any "does the quality score
    * actually rank quality" audit. Exact decimal sums; the two ratios
    * are per-bin final doubles. One scan, one hash agg on the bin. */
  val q203_calibration = Q(
    "q203_calibration",
    Some("""SELECT LEAST(CAST(FLOOR(value / 50) AS BIGINT), 9) AS bin,
           |  CAST(count(*) AS BIGINT) AS n,
           |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
           |  round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS mean_score,
           |  round(CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS DOUBLE)
           |    / count(*), 6) AS pos_rate
           |FROM events
           |GROUP BY 1 ORDER BY bin""".stripMargin),
    (s, d) =>
      Tables.events(s, d)
        .groupBy(least(floor(col("value") / 50).cast("long"), lit(9L)).as("bin"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_pos"),
          round(sum(dec(col("value"))).cast("double") / count(lit(1)), 6)
            .as("mean_score"),
          round(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .cast("double") / count(lit(1)), 6).as("pos_rate"))
        .orderBy("bin"))

  /** Two-sample Kolmogorov–Smirnov test: sup-distance between the
    * `value` ECDFs of click vs view events (the drift test between two
    * sources/cohorts). D's numerator max|F1·n2 − F2·n1| stays an exact
    * BIGINT over the cumulated score grid; D and the scaled KS statistic
    * sqrt(n1·n2/(n1+n2))·D are final 1-row doubles mirrored verbatim in
    * the oracle. */
  val q204_ks_test = Q(
    "q204_ks_test",
    Some("""WITH s AS (
           |  SELECT CAST(value AS DECIMAL(18,2)) AS score,
           |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
           |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS c2
           |  FROM events WHERE event_type IN ('click', 'view') GROUP BY 1),
           |c AS (
           |  SELECT
           |    sum(c1) OVER (ORDER BY score
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f1,
           |    sum(c2) OVER (ORDER BY score
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f2
           |  FROM s),
           |m AS (
           |  SELECT CAST(max(f1) AS BIGINT) AS n1, CAST(max(f2) AS BIGINT) AS n2,
           |    CAST(max(abs(f1 * (SELECT max(f2) FROM c)
           |                 - f2 * (SELECT max(f1) FROM c))) AS BIGINT) AS d_num
           |  FROM c)
           |SELECT n1, n2,
           |  round(CAST(d_num AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2), 6) AS ks_d,
           |  round(sqrt(CAST(n1 AS DOUBLE) * n2 / (n1 + n2))
           |    * (CAST(d_num AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2)), 6) AS ks_stat
           |FROM m""".stripMargin),
    (s, d) => {
      val byScore = Tables.events(s, d)
        .where(col("event_type").isin("click", "view"))
        .groupBy(dec(col("value")).as("score"))
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("c1"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("c2"))
      val w = Window.orderBy("score")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = byScore.select(
        sum(col("c1")).over(w).as("f1"), sum(col("c2")).over(w).as("f2"))
      // n1/n2 are the final cumulative counts = max over the grid, so one
      // more tiny agg gets totals and the sup in the same pass via a
      // window-total trick kept identical to the oracle's scalar subquery.
      val wAll = Window.partitionBy()
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      cum
        .withColumn("t1", max(col("f1")).over(wAll))
        .withColumn("t2", max(col("f2")).over(wAll))
        .agg(max(col("t1")).as("n1"), max(col("t2")).as("n2"),
          max(abs(col("f1") * col("t2") - col("f2") * col("t1"))).as("d_num"))
        .select(col("n1"), col("n2"),
          round(col("d_num").cast("double") / (col("n1").cast("double") * col("n2")), 6)
            .as("ks_d"),
          round(sqrt(col("n1").cast("double") * col("n2") / (col("n1") + col("n2")))
            * (col("d_num").cast("double") / (col("n1").cast("double") * col("n2"))), 6)
            .as("ks_stat"))
    })

  /** Chi-squared independence test: event_type × hour-of-day (µs
    * integer arithmetic — engine-neutral, no weekday conventions). Cell
    * counts and margins are exact; each cell's o²·N/(r·c) term is a
    * structurally-identical double rounded to 9 decimals and summed in
    * DECIMAL (order-independent), so the statistic is bit-stable. The
    * margins come from windows over the tiny cell table (|types|·24
    * rows), not from re-scanning events. */
  val q205_chi2 = Q(
    "q205_chi2",
    Some("""WITH o AS (
           |  SELECT event_type, (epoch_us(ts) // 3600000000) % 24 AS hr,
           |    CAST(count(*) AS BIGINT) AS o
           |  FROM events GROUP BY 1, 2),
           |m AS (
           |  SELECT event_type, hr, o,
           |    sum(o) OVER (PARTITION BY event_type) AS rt,
           |    sum(o) OVER (PARTITION BY hr) AS ct,
           |    sum(o) OVER () AS n
           |  FROM o)
           |SELECT CAST(max(n) AS BIGINT) AS n,
           |  CAST((count(DISTINCT event_type) - 1)
           |    * (count(DISTINCT hr) - 1) AS BIGINT) AS dof,
           |  round(CAST(sum(CAST(round(CAST(o AS DOUBLE) * o * n / rt / ct, 9)
           |    AS DECIMAL(30,9))) AS DOUBLE) - max(n), 6) AS chi2
           |FROM m""".stripMargin),
    (s, d) => {
      val cells = Tables.events(s, d)
        .groupBy(col("event_type"),
          (expr("(ts div 1000) div 3600000000") % 24).as("hr"))
        .agg(count(lit(1)).as("o"))
      val m = cells.select(col("o"),
        sum(col("o")).over(Window.partitionBy("event_type")).as("rt"),
        sum(col("o")).over(Window.partitionBy("hr")).as("ct"),
        sum(col("o")).over(Window.partitionBy()).as("n"),
        col("event_type"), col("hr"))
      m.agg(max(col("n")).as("nn"),
          (countDistinct(col("event_type")) - 1).as("dr"),
          (countDistinct(col("hr")) - 1).as("dc"),
          sum(round(col("o").cast("double") * col("o") * col("n")
            / col("rt") / col("ct"), 9).cast("decimal(30,9)")).as("acc"))
        .select(col("nn").cast("long").as("n"),
          (col("dr") * col("dc")).cast("long").as("dof"),
          round(col("acc").cast("double") - col("nn"), 6).as("chi2"))
    })

  /** Autocorrelation function of the daily total value at lags 1..7 —
    * the seasonality probe behind batch-cadence decisions (a weekly
    * spike at lag 7 says "partition your training epochs by week").
    * Day totals are exact decimal sums keyed by the UTC day index
    * (µs // 86400000000 — engine-neutral integer arithmetic); lagged
    * pairs come from an equi-join on day+k (robust to calendar gaps,
    * unlike a row-ordered lead), and each lag's Pearson r uses the
    * exact-moment formula of q97. Row-scale work is one hash agg; the
    * lag join runs on the tiny day table. */
  val q206_acf = Q(
    "q206_acf",
    Some("""WITH daily AS (
           |  SELECT epoch_us(ts) // 86400000000 AS day,
           |    sum(CAST(value AS DECIMAL(18,2))) AS x
           |  FROM events GROUP BY 1),
           |p AS (
           |  SELECT l.lag AS lag, CAST(a.x AS DECIMAL(18,2)) AS x,
           |    CAST(b.x AS DECIMAL(18,2)) AS y
           |  FROM daily a
           |  CROSS JOIN (SELECT unnest(generate_series(1, 7)) AS lag) l
           |  JOIN daily b ON b.day = a.day + l.lag),
           |m AS (
           |  SELECT lag, CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
           |    CAST(sum(x * y) AS DOUBLE) AS sxy,
           |    CAST(sum(x * x) AS DOUBLE) AS sxx,
           |    CAST(sum(y * y) AS DOUBLE) AS syy
           |  FROM p GROUP BY lag)
           |SELECT CAST(lag AS BIGINT) AS lag, n,
           |  round((sxy - sx * sy / n)
           |    / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)), 6) AS acf
           |FROM m ORDER BY lag""".stripMargin),
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(expr("(ts div 1000) div 86400000000").as("day"))
        .agg(sum(dec(col("value"))).as("x"))
      val a = daily.withColumn("lag", explode(sequence(lit(1), lit(7))))
      val b = daily.select(col("day").as("bday"), col("x").as("bx"))
      val pairs = a.join(broadcast(b), a("day") + a("lag") === b("bday"))
        .select(col("lag"), col("x").cast("decimal(18,2)").as("px"),
          col("bx").cast("decimal(18,2)").as("py"))
      pairs.groupBy("lag")
        .agg(count(lit(1)).as("n"),
          sum(col("px")).cast("double").as("sx"),
          sum(col("py")).cast("double").as("sy"),
          sum(col("px") * col("py")).cast("double").as("sxy"),
          sum(col("px") * col("px")).cast("double").as("sxx"),
          sum(col("py") * col("py")).cast("double").as("syy"))
        .select(col("lag").cast("long").as("lag"), col("n"),
          round((col("sxy") - col("sx") * col("sy") / col("n"))
            / sqrt((col("sxx") - col("sx") * col("sx") / col("n"))
              * (col("syy") - col("sy") * col("sy") / col("n"))), 6).as("acf"))
        .orderBy("lag")
    })

  /** Decision-stump sweep (feature screening): for each candidate split
    * threshold on `value` (the 50-unit bin edges), the Gini impurity of
    * the induced (purchase vs rest) partition — the exact-arithmetic
    * alternative to entropy gain (whose log() is not bit-stable across
    * libm implementations). One hash agg builds the per-bin histogram;
    * a cumulative window over the 10-cell grid yields every threshold's
    * left/right counts at once (no per-threshold rescan); the impurity
    * is a per-row scalar double from exact BIGINTs, mirrored verbatim
    * in the oracle. Empty sides contribute zero impurity. */
  val q207_gini_stump = Q(
    "q207_gini_stump",
    Some("""WITH h AS (
           |  SELECT LEAST(CAST(FLOOR(value / 50) AS BIGINT), 9) AS bin,
           |    CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS p
           |  FROM events GROUP BY 1),
           |c AS (
           |  SELECT bin,
           |    CAST(sum(n) OVER (ORDER BY bin
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS nl,
           |    CAST(sum(p) OVER (ORDER BY bin
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pl,
           |    CAST(sum(n) OVER () AS BIGINT) AS nn,
           |    CAST(sum(p) OVER () AS BIGINT) AS pp
           |  FROM h)
           |SELECT (bin + 1) * 50 AS threshold, nl AS n_left, pl AS pos_left,
           |  round((
           |    CASE WHEN nl = 0 THEN 0 ELSE
           |      CAST(nl AS DOUBLE) - (CAST(pl AS DOUBLE) * pl
           |        + CAST(nl - pl AS DOUBLE) * (nl - pl)) / nl END
           |    + CASE WHEN nn - nl = 0 THEN 0 ELSE
           |      CAST(nn - nl AS DOUBLE) - (CAST(pp - pl AS DOUBLE) * (pp - pl)
           |        + CAST(nn - nl - (pp - pl) AS DOUBLE) * (nn - nl - (pp - pl))) / (nn - nl) END
           |  ) / nn, 6) AS gini_split
           |FROM c WHERE bin < 9
           |ORDER BY threshold""".stripMargin),
    (s, d) => {
      val h = Tables.events(s, d)
        .groupBy(least(floor(col("value") / 50).cast("long"), lit(9L)).as("bin"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("p"))
      val wc = Window.orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy()
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val c = h.select(col("bin"),
        sum(col("n")).over(wc).as("nl"), sum(col("p")).over(wc).as("pl"),
        sum(col("n")).over(wAll).as("nn"), sum(col("p")).over(wAll).as("pp"))
      val nl = col("nl"); val pl = col("pl"); val nn = col("nn"); val pp = col("pp")
      val leftTerm = when(nl === 0, lit(0.0)).otherwise(
        nl.cast("double") - (pl.cast("double") * pl
          + (nl - pl).cast("double") * (nl - pl)) / nl)
      val rightTerm = when(nn - nl === 0, lit(0.0)).otherwise(
        (nn - nl).cast("double") - ((pp - pl).cast("double") * (pp - pl)
          + (nn - nl - (pp - pl)).cast("double") * (nn - nl - (pp - pl))) / (nn - nl))
      c.where(col("bin") < 9)
        .select(((col("bin") + 1) * 50).as("threshold"),
          nl.as("n_left"), pl.as("pos_left"),
          round((leftTerm + rightTerm) / nn, 6).as("gini_split"))
        .orderBy("threshold")
    })

  /** Spearman rank correlation of (l_quantity, l_extendedprice) — the
    * robust monotone-association test (Pearson on average ranks). Both
    * columns are 2-decimal bounded grids, so the global average ranks
    * come from per-DISTINCT-VALUE cumulative windows over each grid
    * (the q193/q202 histogram-of-counts shape — no global row sort,
    * which is the classic Spearman scale-killer). rank2 = 2·avg_rank
    * stays integer; rows join their two rank maps (the small quantity
    * map broadcast), and ρ = Pearson over exact DECIMAL(38) rank
    * moments with one final double expression. */
  val q208_spearman = Q(
    "q208_spearman",
    Some("""WITH xg AS (
           |  SELECT CAST(l_quantity AS DECIMAL(18,2)) AS v,
           |    CAST(count(*) AS BIGINT) AS n
           |  FROM lineitem GROUP BY 1),
           |xr AS (
           |  SELECT v, 2 * COALESCE(sum(n) OVER (ORDER BY v
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |    + n + 1 AS rx
           |  FROM xg),
           |yg AS (
           |  SELECT CAST(l_extendedprice AS DECIMAL(18,2)) AS v,
           |    CAST(count(*) AS BIGINT) AS n
           |  FROM lineitem GROUP BY 1),
           |yr AS (
           |  SELECT v, 2 * COALESCE(sum(n) OVER (ORDER BY v
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |    + n + 1 AS ry
           |  FROM yg),
           |j AS (
           |  SELECT CAST(xr.rx AS DECIMAL(18,0)) AS rx,
           |    CAST(yr.ry AS DECIMAL(18,0)) AS ry
           |  FROM lineitem l
           |  JOIN xr ON CAST(l.l_quantity AS DECIMAL(18,2)) = xr.v
           |  JOIN yr ON CAST(l.l_extendedprice AS DECIMAL(18,2)) = yr.v),
           |m AS (
           |  SELECT CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(rx) AS DOUBLE) AS sx, CAST(sum(ry) AS DOUBLE) AS sy,
           |    CAST(sum(rx * ry) AS DOUBLE) AS sxy,
           |    CAST(sum(rx * rx) AS DOUBLE) AS sxx,
           |    CAST(sum(ry * ry) AS DOUBLE) AS syy
           |  FROM j)
           |SELECT n,
           |  round((sxy - sx * sy / n)
           |    / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)), 6) AS spearman_rho
           |FROM m""".stripMargin),
    (s, d) => {
      val li = Tables.lineitem(s, d)
      def rankMap(c: String, out: String) = {
        val g = li.groupBy(dec(col(c)).as("v")).agg(count(lit(1)).as("n"))
        val w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
        g.select(col("v"),
          (lit(2L) * coalesce(sum(col("n")).over(w), lit(0L)) + col("n") + 1L)
            .cast("decimal(18,0)").as(out))
      }
      val xr = rankMap("l_quantity", "rx")
      val yr = rankMap("l_extendedprice", "ry")
      val j = li
        .join(broadcast(xr), dec(col("l_quantity")) === xr("v"))
        .join(yr, dec(col("l_extendedprice")) === yr("v"))
        .select(col("rx"), col("ry"))
      j.agg(count(lit(1)).as("n"),
          sum(col("rx")).cast("double").as("sx"),
          sum(col("ry")).cast("double").as("sy"),
          sum(col("rx") * col("ry")).cast("double").as("sxy"),
          sum(col("rx") * col("rx")).cast("double").as("sxx"),
          sum(col("ry") * col("ry")).cast("double").as("syy"))
        .select(col("n"),
          round((col("sxy") - col("sx") * col("sy") / col("n"))
            / sqrt((col("sxx") - col("sx") * col("sx") / col("n"))
              * (col("syy") - col("sy") * col("sy") / col("n"))), 6)
            .as("spearman_rho"))
    })

  /** Left-outer interval join (click-after-impression WITH the misses):
    * every view event left-joins purchases by the same user within
    * [ts, ts+1h], then rolls up per user — total views, views that
    * converted, and total pairs. The unmatched side is the point: an
    * inner interval join (q71) cannot report conversion RATE. Batch
    * semantics here; the streaming twin (both sides watermarked, state
    * evicted past the horizon, null-padded rows emitted on watermark)
    * is StreamingOps.intervalJoin(joinType="leftOuter"), spec-gated. */
  val q209_left_interval = Q(
    "q209_left_interval",
    Some("""WITH v AS (
           |  SELECT user_id, epoch_us(ts) AS us FROM events
           |  WHERE event_type = 'view'),
           |p AS (
           |  SELECT user_id, epoch_us(ts) AS us FROM events
           |  WHERE event_type = 'purchase'),
           |j AS (
           |  SELECT v.user_id, v.us, count(p.us) AS n_purch
           |  FROM v LEFT JOIN p
           |    ON p.user_id = v.user_id
           |   AND p.us >= v.us AND p.us <= v.us + 3600000000
           |  GROUP BY v.user_id, v.us)
           |SELECT user_id, CAST(count(*) AS BIGINT) AS n_views,
           |  CAST(sum(CASE WHEN n_purch > 0 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_converted,
           |  CAST(sum(n_purch) AS BIGINT) AS n_pairs
           |FROM j GROUP BY user_id
           |ORDER BY user_id""".stripMargin),
    (s, d) => {
      val ev = Tables.events(s, d)
      val v = ev.where(col("event_type") === "view")
        .select(col("user_id"), expr("ts div 1000").as("us"))
      val p = ev.where(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), expr("ts div 1000").as("p_us"))
      v.join(p, col("p_user") === col("user_id")
            && col("p_us") >= col("us")
            && col("p_us") <= col("us") + 3600000000L, "left")
        .groupBy(col("user_id"), col("us"))
        .agg(count(col("p_us")).as("n_purch"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_views"),
          sum(when(col("n_purch") > 0, 1L).otherwise(0L)).as("n_converted"),
          sum(col("n_purch")).as("n_pairs"))
        .orderBy("user_id")
    })

  /** Per-source distribution-shift localization: for each document
    * source, the Mann–Whitney AUC of its n_chars distribution against
    * ALL documents (0.5 = no shift; →1 = this source is systematically
    * longer). This is the "which source drifted" report that follows a
    * failed global KS test (q204). Combined-sample ranks come from one
    * cumulative window over the bounded length grid; each source's
    * rank-sum is then a grouped dot product against the broadcast rank
    * map — one scan, one (value,source) shuffle, one source-keyed agg. */
  val q210_source_shift = Q(
    "q210_source_shift",
    Some("""WITH g AS (
           |  SELECT n_chars AS v, source, CAST(count(*) AS BIGINT) AS c
           |  FROM documents GROUP BY 1, 2),
           |vg AS (SELECT v, CAST(sum(c) AS BIGINT) AS n FROM g GROUP BY v),
           |vr AS (
           |  SELECT v, 2 * COALESCE(sum(n) OVER (ORDER BY v
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |    + n + 1 AS rank2
           |  FROM vg),
           |t AS (SELECT CAST(sum(c) AS BIGINT) AS nn FROM g),
           |s AS (
           |  SELECT g.source, CAST(sum(g.c) AS BIGINT) AS ns,
           |    CAST(sum(g.c * vr.rank2) AS BIGINT) AS s2
           |  FROM g JOIN vr ON g.v = vr.v GROUP BY g.source)
           |SELECT source, ns AS n_docs,
           |  round(CAST(s2 - ns * (ns + 1) AS DOUBLE)
           |    / (CAST(2 AS DOUBLE) * ns * (nn - ns)), 6) AS shift_auc
           |FROM s, t ORDER BY source""".stripMargin),
    (s, d) => {
      val g = Tables.documents(s, d)
        .groupBy(col("n_chars").as("v"), col("source"))
        .agg(count(lit(1)).as("c"))
      val vg = g.groupBy("v").agg(sum(col("c")).as("n"))
      val w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
      val vr = vg.select(col("v").as("rv"),
        (lit(2L) * coalesce(sum(col("n")).over(w), lit(0L)) + col("n") + 1L)
          .as("rank2"))
      val t = g.agg(sum(col("c")).as("nn"))
      g.join(broadcast(vr), col("v") === col("rv"))
        .groupBy("source")
        .agg(sum(col("c")).as("ns"), sum(col("c") * col("rank2")).as("s2"))
        .crossJoin(broadcast(t))
        .select(col("source"), col("ns").as("n_docs"),
          round((col("s2") - col("ns") * (col("ns") + 1L)).cast("double")
            / (lit(2L).cast("double") * col("ns") * (col("nn") - col("ns"))), 6)
            .as("shift_auc"))
        .orderBy("source")
    })

  /** Robust daily trend: the Theil–Sen estimator (median of all pairwise
    * slopes of daily totals vs the day index) next to the OLS slope it
    * robustifies — one outlier day drags OLS but not the pair median.
    * The O(days²) pair space lives entirely on the post-agg day table
    * (≤365 rows/year regardless of row count); slopes are exact-input
    * double divisions; the median is an explicit order-statistic select
    * (row_number against (n+1)/2 and (n+2)/2 — no engine-specific
    * interpolation), and OLS uses q97's exact decimal moments. */
  val q213_theil_sen = Q(
    "q213_theil_sen",
    Some("""WITH daily AS (
           |  SELECT epoch_us(ts) // 86400000000 AS day,
           |    sum(CAST(value AS DECIMAL(18,2))) AS x
           |  FROM events GROUP BY 1),
           |sl AS (
           |  SELECT CAST(b.x - a.x AS DOUBLE) / (b.day - a.day) AS slope
           |  FROM daily a JOIN daily b ON b.day > a.day),
           |r AS (
           |  SELECT slope,
           |    row_number() OVER (ORDER BY slope) AS rn,
           |    count(*) OVER () AS cnt
           |  FROM sl),
           |ts_med AS (
           |  SELECT CAST(max(cnt) AS BIGINT) AS n_pairs,
           |    round(avg(slope), 6) AS theil_sen_slope
           |  FROM r WHERE rn = (cnt + 1) // 2 OR rn = (cnt + 2) // 2),
           |m AS (
           |  SELECT CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(CAST(day AS DECIMAL(18,0))) AS DOUBLE) AS sd,
           |    CAST(sum(x) AS DOUBLE) AS sx,
           |    CAST(sum(CAST(day AS DECIMAL(18,0)) * x) AS DOUBLE) AS sdx,
           |    CAST(sum(CAST(day AS DECIMAL(18,0)) * CAST(day AS DECIMAL(18,0)))
           |      AS DOUBLE) AS sdd
           |  FROM daily)
           |SELECT m.n AS n_days, ts_med.n_pairs, ts_med.theil_sen_slope,
           |  round((m.n * sdx - sd * sx) / (m.n * sdd - sd * sd), 6) AS ols_slope
           |FROM ts_med, m""".stripMargin),
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(expr("(ts div 1000) div 86400000000").as("day"))
        .agg(sum(dec(col("value"))).as("x"))
      val b = daily.select(col("day").as("bday"), col("x").as("bx"))
      val sl = daily.join(broadcast(b), col("bday") > col("day"))
        .select(((col("bx") - col("x")).cast("double")
          / (col("bday") - col("day"))).as("slope"))
      val wAll = Window.partitionBy()
      val r = sl.select(col("slope"),
        row_number().over(Window.orderBy("slope")).as("rn"),
        count(lit(1)).over(wAll).as("cnt"))
      val tsMed = r
        .where(col("rn") === floor((col("cnt") + 1) / 2)
          || col("rn") === floor((col("cnt") + 2) / 2))
        .agg(max(col("cnt")).as("n_pairs"),
          round(avg(col("slope")), 6).as("theil_sen_slope"))
      val dd = col("day").cast("decimal(18,0)")
      val m = daily.agg(count(lit(1)).as("n"),
        sum(dd).cast("double").as("sd"),
        sum(col("x")).cast("double").as("sx"),
        sum(dd * col("x")).cast("double").as("sdx"),
        sum(dd * dd).cast("double").as("sdd"))
      tsMed.crossJoin(m)
        .select(col("n").as("n_days"), col("n_pairs"), col("theil_sen_slope"),
          round((col("n") * col("sdx") - col("sd") * col("sx"))
            / (col("n") * col("sdd") - col("sd") * col("sd")), 6)
            .as("ols_slope"))
    })

  /** Token-concentration Gini per source: how unequally the corpus'
    * token budget is spread over its documents (G→0: uniform lengths;
    * G→1: a few giant docs own the budget — the balance report behind
    * mixture/quota decisions, q155/q61). Computed from the LENGTH
    * HISTOGRAM, not a row sort: items in one (source, token-count) cell
    * occupy consecutive ranks, so Σ rank·x collapses to
    * Σ_cells x·(c·cum_before + c(c+1)/2) — the q193/q215
    * histogram-of-counts device. Row-scale work is one hash agg; the
    * cumulative window runs on the bounded per-source length grid. All
    * moments are exact BIGINTs; one final double expression. */
  val q224_token_gini = Q(
    "q224_token_gini",
    Some("""WITH x AS (
           |  SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
           |  FROM documents),
           |g AS (
           |  SELECT source, tok, CAST(count(*) AS BIGINT) AS c
           |  FROM x GROUP BY 1, 2),
           |w AS (
           |  SELECT source, tok, c,
           |    COALESCE(sum(c) OVER (PARTITION BY source ORDER BY tok
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
           |  FROM g),
           |m AS (
           |  SELECT source, CAST(sum(c) AS BIGINT) AS n,
           |    CAST(sum(tok * c) AS BIGINT) AS tot,
           |    CAST(sum(tok * (c * cb + (c * (c + 1)) // 2)) AS BIGINT) AS ws
           |  FROM w GROUP BY source)
           |SELECT source, n AS n_docs, tot AS total_tokens,
           |  round(CAST(2 * ws AS DOUBLE) / (CAST(n AS DOUBLE) * tot)
           |    - CAST(n + 1 AS DOUBLE) / n, 6) AS gini
           |FROM m ORDER BY source""".stripMargin),
    (s, d) => {
      val grid = Tables.documents(s, d)
        .select(col("source"),
          size(split(col("text"), " ")).cast("long").as("tok"))
        .groupBy("source", "tok").agg(count(lit(1)).as("c"))
      val wspec = Window.partitionBy("source").orderBy("tok")
        .rowsBetween(Window.unboundedPreceding, -1)
      grid
        .withColumn("cb", coalesce(sum(col("c")).over(wspec), lit(0L)))
        .groupBy("source")
        .agg(sum(col("c")).as("n"),
          sum(col("tok") * col("c")).as("tot"),
          sum(col("tok") * (col("c") * col("cb")
            + expr("(c * (c + 1)) div 2"))).as("ws"))
        .select(col("source"), col("n").as("n_docs"),
          col("tot").as("total_tokens"),
          round((col("ws") * 2).cast("double")
              / (col("n").cast("double") * col("tot"))
            - (col("n") + 1).cast("double") / col("n"), 6).as("gini"))
        .orderBy("source")
    })

  /** Mann–Kendall trend test on the daily-total series — the
    * SIGNIFICANCE complement of q213's Theil–Sen slope (the pair answers
    * "how steep" and "is it real"): S = Σ sign(xⱼ − xᵢ) over day pairs,
    * tie-corrected variance n(n−1)(2n+5) − Σt(t−1)(2t+5) over 18, and
    * the continuity-corrected Z. S, the tie term, and 18·Var are exact
    * BIGINTs; Z is one shared double expression (sqrt IEEE-exact).
    *
    * Scale shape: the O(days²) pair space lives on the post-agg DAY
    * GRID (the q213 rule) — ~30 rows self-joined, never events. */
  val q266_mann_kendall = Q(
    "q266_mann_kendall",
    Some("""WITH d AS (
           |  SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
           |    CAST(count(*) AS BIGINT) AS n
           |  FROM events GROUP BY 1),
           |p AS (
           |  SELECT CAST(sum(CASE WHEN b.n > a.n THEN 1
           |       WHEN b.n < a.n THEN -1 ELSE 0 END) AS BIGINT) AS s
           |  FROM d a JOIN d b ON a.day < b.day),
           |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
           |ties AS (
           |  SELECT CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0)
           |    AS BIGINT) AS tie_term
           |  FROM (SELECT n, CAST(count(*) AS BIGINT) AS t
           |        FROM d GROUP BY n HAVING count(*) > 1)),
           |v AS (
           |  SELECT CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tie_term
           |    AS BIGINT) AS v18
           |  FROM nn CROSS JOIN ties)
           |SELECT p.s, nn.n AS n_days,
           |  round(CAST(v.v18 AS DOUBLE) / 18, 6) AS var_s,
           |  round(CASE
           |    WHEN p.s > 0 THEN (p.s - 1) / sqrt(CAST(v.v18 AS DOUBLE) / 18)
           |    WHEN p.s < 0 THEN (p.s + 1) / sqrt(CAST(v.v18 AS DOUBLE) / 18)
           |    ELSE 0 END, 6) AS z
           |FROM p CROSS JOIN nn CROSS JOIN v""".stripMargin),
    (s, d) => {
      // checkpoint: the ~30-row day grid feeds the pair join (twice),
      // the count, and the tie branches
      val day = Tables.events(s, d)
        .groupBy(expr("(ts div 1000) div 86400000000").as("day"))
        .agg(count(lit(1)).as("n"))
        .localCheckpoint(true)
      val p = day.toDF("da", "na").join(day.toDF("db", "nb"),
          col("da") < col("db"))
        .agg(sum(when(col("nb") > col("na"), 1L)
          .when(col("nb") < col("na"), -1L).otherwise(0L)).as("s"))
      val nn = day.agg(count(lit(1)).as("n"))
      val ties = day.groupBy("n").agg(count(lit(1)).as("t"))
        .filter(col("t") > 1)
        .agg(coalesce(sum(col("t") * (col("t") - 1) * (lit(2) * col("t") + 5)),
          lit(0L)).as("tie_term"))
      val v18 = (col("n") * (col("n") - 1) * (lit(2) * col("n") + 5)
        - col("tie_term")).as("v18")
      val sd = sqrt(col("v18").cast("double") / 18)
      p.crossJoin(broadcast(nn)).crossJoin(broadcast(ties))
        .select(col("s"), col("n"), col("tie_term"), v18)
        .select(col("s"), col("n").as("n_days"),
          round(col("v18").cast("double") / 18, 6).as("var_s"),
          round(when(col("s") > 0, (col("s") - 1) / sd)
            .when(col("s") < 0, (col("s") + 1) / sd)
            .otherwise(lit(0)), 6).as("z"))
    })

  val all: Seq[Q] = Seq(q202_auc, q203_calibration, q204_ks_test, q205_chi2,
    q206_acf, q207_gini_stump, q208_spearman, q209_left_interval,
    q210_source_shift, q213_theil_sen, q224_token_gini, q266_mann_kendall)
}
