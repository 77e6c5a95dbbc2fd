package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.Q.dec

/** Round-9 statistics additions, part 2: one-way ANOVA, sample-ratio
  * mismatch, and capture–recapture population estimation.
  */
object StatsOps3 {

  /** One-way ANOVA F across event types ("does mean spend differ by
    * event type"): between/within sums of squares from per-group exact
    * decimal moments — SSB and SSW terms are per-group scalar doubles
    * rounded once and decimal-summed over the 5-row group grid, so the
    * F statistic is bit-identical under any partial-agg order. No
    * p-value on purpose: the F CDF needs the incomplete beta, which is
    * not bit-stable across libm builds — the statistic plus degrees of
    * freedom is the portable readout (compare to F-table off-engine). */
  val q300_anova_f = Q(
    "q300_anova_f",
    Some("""WITH g AS (
           |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_g,
           |    sum(CAST(value AS DECIMAL(18,2))) AS s_g,
           |    sum(CAST(round(value * value, 6) AS DECIMAL(28,6))) AS ss_g
           |  FROM events GROUP BY event_type),
           |t AS (
           |  SELECT CAST(sum(n_g) AS BIGINT) AS n,
           |    CAST(sum(s_g) AS DOUBLE) / sum(n_g) AS gmean,
           |    CAST(count(*) AS BIGINT) AS k
           |  FROM g),
           |parts AS (
           |  SELECT
           |    round(n_g * (CAST(s_g AS DOUBLE) / n_g - gmean)
           |      * (CAST(s_g AS DOUBLE) / n_g - gmean), 6) AS ssb_t,
           |    round(CAST(ss_g AS DOUBLE) - n_g * (CAST(s_g AS DOUBLE) / n_g)
           |      * (CAST(s_g AS DOUBLE) / n_g), 6) AS ssw_t
           |  FROM g CROSS JOIN t),
           |m AS (
           |  SELECT CAST(sum(CAST(ssb_t AS DECIMAL(28,6))) AS DOUBLE) AS ssb,
           |    CAST(sum(CAST(ssw_t AS DECIMAL(28,6))) AS DOUBLE) AS ssw
           |  FROM parts)
           |SELECT t.k, t.n, round(m.ssb, 6) AS ssb, round(m.ssw, 6) AS ssw,
           |  CAST(t.k - 1 AS BIGINT) AS df1, CAST(t.n - t.k AS BIGINT) AS df2,
           |  round((m.ssb / (t.k - 1)) / (m.ssw / (t.n - t.k)), 6) AS f
           |FROM t CROSS JOIN m""".stripMargin),
    (s, d) => {
      val g = Tables.events(s, d)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_g"),
          sum(dec(col("value"))).as("s_g"),
          sum(round(col("value") * col("value"), 6).cast("decimal(28,6)"))
            .as("ss_g"))
      val t = g.agg(sum("n_g").cast("long").as("n"),
        (sum("s_g").cast("double") / sum("n_g")).as("gmean"),
        count(lit(1)).as("k"))
      val meanG = col("s_g").cast("double") / col("n_g")
      val parts = g.crossJoin(broadcast(t))
        .select(
          round(col("n_g") * (meanG - col("gmean")) *
            (meanG - col("gmean")), 6).as("ssb_t"),
          round(col("ss_g").cast("double") - col("n_g") * meanG * meanG, 6)
            .as("ssw_t"))
      val m = parts.agg(
        sum(col("ssb_t").cast("decimal(28,6)")).cast("double").as("ssb"),
        sum(col("ssw_t").cast("decimal(28,6)")).cast("double").as("ssw"))
      broadcast(t).crossJoin(m)
        .select(col("k"), col("n"), round(col("ssb"), 6).as("ssb"),
          round(col("ssw"), 6).as("ssw"),
          (col("k") - 1).cast("long").as("df1"),
          (col("n") - col("k")).cast("long").as("df2"),
          round((col("ssb") / (col("k") - 1)) /
            (col("ssw") / (col("n") - col("k"))), 6).as("f"))
    })

  /** Sample-ratio mismatch guard for the q254/q270 experiment: the md5
    * arms should split users 50/50, and a drifted split invalidates
    * every downstream readout BEFORE any metric is examined. One-df
    * chi-square on the overall arm counts, plus the worst single DAY
    * (new-user assignment imbalance localizes to when it happened) —
    * all exact integer counts, one division each, windows on the day
    * grid. */
  val q301_srm = Q(
    "q301_srm", {
      import graft.functions.TextFunctions.hexSpanValSql
      val arm = s"${hexSpanValSql("md5(CAST(user_id AS VARCHAR))", 0, 2)} % 2"
      Some(s"""WITH u AS (
              |  SELECT user_id, $arm AS arm,
              |    CAST(min(epoch_us(ts) // 86400000000) AS BIGINT)
              |      AS first_day
              |  FROM events GROUP BY user_id),
              |o AS (
              |  SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)
              |      AS BIGINT) AS n0,
              |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
              |      AS n1
              |  FROM u),
              |dd AS (
              |  SELECT first_day AS day,
              |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
              |      AS d0,
              |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
              |      AS d1
              |  FROM u GROUP BY first_day),
              |dchi AS (
              |  SELECT day,
              |    round(CAST((d0 - d1) * (d0 - d1) AS DOUBLE) / (d0 + d1), 6)
              |      AS chi2_day
              |  FROM dd),
              |worst AS (
              |  SELECT day AS worst_day, chi2_day AS chi2_worst FROM dchi
              |  ORDER BY chi2_day DESC, day LIMIT 1)
              |SELECT n0, n1,
              |  round(CAST((n0 - n1) * (n0 - n1) AS DOUBLE) / (n0 + n1), 6)
              |    AS chi2_overall,
              |  worst_day, chi2_worst
              |FROM o CROSS JOIN worst""".stripMargin)
    },
    (s, d) => {
      import graft.functions.TextFunctions.hexSpanValSql
      val arm = expr(s"${hexSpanValSql("__h", 0, 2)} % 2")
      val u = graft.operators.PlanCache.persist(Tables.events(s, d)
        .withColumn("__h", md5(col("user_id").cast("string")))
        .groupBy(col("user_id"), arm.as("arm"))
        .agg(min(expr("(ts div 1000) div 86400000000")).as("first_day")))
      val o = u.agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"))
      val dd = u.groupBy(col("first_day").as("day"))
        .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("d0"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("d1"))
      val worst = dd
        .select(col("day"),
          round(((col("d0") - col("d1")) * (col("d0") - col("d1")))
            .cast("double") / (col("d0") + col("d1")), 6).as("chi2_day"))
        .orderBy(col("chi2_day").desc, col("day")).limit(1)
        .select(col("day").as("worst_day"), col("chi2_day").as("chi2_worst"))
      o.crossJoin(broadcast(worst))
        .select(col("n0"), col("n1"),
          round(((col("n0") - col("n1")) * (col("n0") - col("n1")))
            .cast("double") / (col("n0") + col("n1")), 6)
            .as("chi2_overall"),
          col("worst_day"), col("chi2_worst"))
    })

  /** Capture–recapture (Chapman-corrected Lincoln–Petersen) population
    * estimate: two deterministic md5-span "captures" (~30% each, drawn
    * from DISJOINT hex spans of the same digest so the draws are
    * independent-ish) estimate the total user population from capture
    * sizes and overlap — the estimator a dedup/telemetry pipeline uses
    * when it can sample but not enumerate. Per-user flags are scan-side
    * hash arithmetic; everything aggregates in ONE pass (no joins);
    * the known true count makes the relative error part of the report. */
  val q303_capture_recapture = Q(
    "q303_capture_recapture", {
      import graft.functions.TextFunctions.hexSpanValSql
      val f1 = s"(${hexSpanValSql("h", 0, 2)} % 10 < 3)"
      val f2 = s"(${hexSpanValSql("h", 2, 2)} % 10 < 3)"
      Some(s"""WITH u AS (
              |  SELECT user_id, $f1 AS in1, $f2 AS in2
              |  FROM (SELECT DISTINCT user_id,
              |          md5(CAST(user_id AS VARCHAR)) AS h FROM events)),
              |m AS (
              |  SELECT CAST(count(*) AS BIGINT) AS true_n,
              |    CAST(sum(CASE WHEN in1 THEN 1 ELSE 0 END) AS BIGINT)
              |      AS n1,
              |    CAST(sum(CASE WHEN in2 THEN 1 ELSE 0 END) AS BIGINT)
              |      AS n2,
              |    CAST(sum(CASE WHEN in1 AND in2 THEN 1 ELSE 0 END)
              |      AS BIGINT) AS overlap
              |  FROM u)
              |SELECT n1, n2, overlap, true_n,
              |  round(CAST((n1 + 1) AS DOUBLE) * (n2 + 1) / (overlap + 1)
              |    - 1, 6) AS chapman_est,
              |  round((CAST((n1 + 1) AS DOUBLE) * (n2 + 1) / (overlap + 1)
              |    - 1 - true_n) / true_n, 6) AS rel_err
              |FROM m""".stripMargin)
    },
    (s, d) => {
      import graft.functions.TextFunctions.hexSpanValSql
      val u = Tables.events(s, d).select("user_id").distinct()
        .withColumn("h", md5(col("user_id").cast("string")))
        .select(col("user_id"),
          (expr(hexSpanValSql("h", 0, 2)) % 10 < 3).as("in1"),
          (expr(hexSpanValSql("h", 2, 2)) % 10 < 3).as("in2"))
      val m = u.agg(count(lit(1)).as("true_n"),
        sum(when(col("in1"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("in2"), 1L).otherwise(0L)).as("n2"),
        sum(when(col("in1") && col("in2"), 1L).otherwise(0L)).as("overlap"))
      val est = (col("n1") + 1).cast("double") * (col("n2") + 1) /
        (col("overlap") + 1) - 1
      m.select(col("n1"), col("n2"), col("overlap"), col("true_n"),
        round(est, 6).as("chapman_est"),
        round((est - col("true_n")) / col("true_n"), 6).as("rel_err"))
    })

  // z literals shared across engines (9-decimal, computed offline):
  // two-sided α = 0.05 and 80% power
  private val ZAlpha = 1.959963985
  private val ZBeta = 0.841621234
  private val Mde = 0.02

  /** Experiment sizing (power analysis): the n-per-arm required to
    * detect a 2 pp absolute lift on the observed per-user conversion
    * rate at α = 0.05 / 80% power, with unpooled variances — the
    * question asked BEFORE q254/q270/q301 ever run. The baseline rate
    * comes from one user-keyed agg; the closed form runs on one row
    * with the z quantiles as shared 9-decimal literals (no engine
    * inverse-normal). Also reports the runway: days to enroll that many
    * users at the observed new-user rate. */
  val q304_power_analysis = Q(
    "q304_power_analysis",
    Some(s"""WITH u AS (
            |  SELECT user_id,
            |    CAST(max(CASE WHEN event_type = 'purchase' AND value > 250
            |      THEN 1 ELSE 0 END) AS BIGINT) AS conv,
            |    CAST(min(epoch_us(ts) // 86400000000) AS BIGINT)
            |      AS first_day
            |  FROM events GROUP BY user_id),
            |m AS (
            |  SELECT CAST(count(*) AS BIGINT) AS n_users,
            |    CAST(sum(conv) AS DOUBLE) / count(*) AS p,
            |    CAST(count(DISTINCT first_day) AS BIGINT) AS n_days
            |  FROM u),
            |c AS (
            |  SELECT n_users, n_days, p,
            |    ceil(($ZAlpha + $ZBeta) * ($ZAlpha + $ZBeta)
            |      * (p * (1 - p) + (p + $Mde) * (1 - p - $Mde))
            |      / ($Mde * $Mde)) AS n_arm
            |  FROM m)
            |SELECT n_users, round(p, 6) AS base_rate,
            |  $Mde AS mde,
            |  CAST(n_arm AS BIGINT) AS n_per_arm,
            |  CAST(ceil(2 * n_arm / (CAST(n_users AS DOUBLE) / n_days))
            |    AS BIGINT) AS days_to_enroll
            |FROM c""".stripMargin),
    (s, d) => {
      val u = Tables.events(s, d)
        .groupBy("user_id")
        .agg(max(when(col("event_type") === "purchase" &&
          col("value") > 250, 1L).otherwise(0L)).as("conv"),
          min(expr("(ts div 1000) div 86400000000")).as("first_day"))
      val m = u.agg(count(lit(1)).as("n_users"),
        (sum("conv").cast("double") / count(lit(1))).as("p"),
        countDistinct("first_day").as("n_days"))
      val z2 = (ZAlpha + ZBeta) * (ZAlpha + ZBeta)
      val nArm = ceil(lit(z2) *
        (col("p") * (lit(1) - col("p")) +
          (col("p") + Mde) * (lit(1) - col("p") - Mde)) / (Mde * Mde))
      m.select(col("n_users"), round(col("p"), 6).as("base_rate"),
        lit(Mde).as("mde"),
        nArm.cast("long").as("n_per_arm"),
        ceil(lit(2) * nArm /
          (col("n_users").cast("double") / col("n_days")))
          .cast("long").as("days_to_enroll"))
    })

  /** Inverse-propensity-weighted ATE with a KNOWN confounded
    * assignment — the causal-inference counterpoint to q254's
    * randomized arms: treatment probability depends on activity BY
    * CONSTRUCTION (p = 0.7 for high-activity users, 0.3 otherwise, md5
    * draw), and activity drives spend, so the naive treated-minus-
    * control difference carries structural confounding bias; weighting
    * each user by 1/p(treat|x) (known here — the construction-inversion
    * of a fitted propensity model) removes that bias. The true effect
    * is zero by construction, so the IPW column is an UNBIASED estimate
    * of zero — at this user count it still carries the estimator's
    * inflated variance (weights up to 1/0.3), the classic bias-for-
    * variance trade the side-by-side columns make visible. Per-user
    * terms round at 6 then decimal-sum, one user-keyed agg total. */
  val q305_ipw_ate = Q(
    "q305_ipw_ate", {
      import graft.functions.TextFunctions.hexSpanValSql
      val udraw = s"(${hexSpanValSql("h", 4, 4)} / 65536.0)"
      Some(s"""WITH u AS (
              |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_ev,
              |    CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
              |      AS y
              |  FROM events GROUP BY user_id),
              |t AS (
              |  SELECT user_id, y,
              |    CASE WHEN n_ev > 66 THEN 0.7 ELSE 0.3 END AS prop,
              |    CASE WHEN $udraw <
              |      (CASE WHEN n_ev > 66 THEN 0.7 ELSE 0.3 END)
              |      THEN 1 ELSE 0 END AS treat
              |  FROM (SELECT u.*, md5(CAST(user_id AS VARCHAR)) AS h FROM u)),
              |m AS (
              |  SELECT CAST(count(*) AS BIGINT) AS n,
              |    CAST(sum(treat) AS BIGINT) AS n_treat,
              |    CAST(sum(CASE WHEN treat = 1
              |      THEN CAST(y AS DECIMAL(38,0)) END) AS DOUBLE)
              |      / sum(treat) AS mean_t,
              |    CAST(sum(CASE WHEN treat = 0
              |      THEN CAST(y AS DECIMAL(38,0)) END) AS DOUBLE)
              |      / sum(1 - treat) AS mean_c,
              |    CAST(sum(CAST(round(treat * y / prop, 6)
              |      AS DECIMAL(28,6))) AS DOUBLE) / count(*) AS ipw_t,
              |    CAST(sum(CAST(round((1 - treat) * y / (1 - prop), 6)
              |      AS DECIMAL(28,6))) AS DOUBLE) / count(*) AS ipw_c
              |  FROM t)
              |SELECT n, n_treat,
              |  round((mean_t - mean_c) / 100, 6) AS naive_diff,
              |  round((ipw_t - ipw_c) / 100, 6) AS ipw_ate
              |FROM m""".stripMargin)
    },
    (s, d) => {
      import graft.functions.TextFunctions.hexSpanValSql
      val u = Tables.events(s, d)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_ev"),
          (sum(dec(col("value"))) * 100).cast("long").as("y"))
        .withColumn("h", md5(col("user_id").cast("string")))
      val prop = when(col("n_ev") > 66, 0.7).otherwise(0.3)
      val t = u.select(col("user_id"), col("y"), prop.as("prop"),
        when(expr(hexSpanValSql("h", 4, 4)) / 65536.0 < prop, 1)
          .otherwise(0).as("treat"))
      val m = t.agg(count(lit(1)).as("n"),
        sum("treat").cast("long").as("n_treat"),
        (sum(when(col("treat") === 1, col("y").cast("decimal(38,0)")))
          .cast("double") / sum("treat")).as("mean_t"),
        (sum(when(col("treat") === 0, col("y").cast("decimal(38,0)")))
          .cast("double") / sum(lit(1) - col("treat"))).as("mean_c"),
        (sum(round(col("treat") * col("y") / col("prop"), 6)
          .cast("decimal(28,6)")).cast("double") / count(lit(1)))
          .as("ipw_t"),
        (sum(round((lit(1) - col("treat")) * col("y") /
          (lit(1) - col("prop")), 6).cast("decimal(28,6)"))
          .cast("double") / count(lit(1))).as("ipw_c"))
      m.select(col("n"), col("n_treat"),
        round((col("mean_t") - col("mean_c")) / 100, 6).as("naive_diff"),
        round((col("ipw_t") - col("ipw_c")) / 100, 6).as("ipw_ate"))
    })

  val all: Seq[Q] = Seq(q300_anova_f, q301_srm, q303_capture_recapture,
    q304_power_analysis, q305_ipw_ate)
}
