package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.Q.dec
import graft.functions.TextFunctions.hexSpanValSql

/** Round-9 statistics additions, part 4: deterministic re-randomization
  * (permutation) testing, feature↔label mutual information, and
  * group-sequential monitoring with O'Brien–Fleming boundaries.
  */
object StatsOps5 {

  private val Perms = 16 // re-randomizations beyond the observed split

  /** Re-randomization (permutation) test on per-user spend between the
    * md5 arms — the nonparametric p-value machine behind q254/q270 when
    * normality is in doubt. DETERMINISTIC permutations: re-assignment b
    * uses bit b of each user's md5 (bit 0 = the observed arm), so both
    * engines enumerate the identical 16 re-randomizations; p = (1 +
    * #{b≥1 : |Δ_b| ≥ |Δ_obs|}) / 17 (the add-one Monte-Carlo
    * convention). One user-keyed agg, then a users×17 flat-map grouped
    * per permutation — exact cent sums per group, doubles only in the
    * 17-row grid. */
  val q318_permutation_test = Q(
    "q318_permutation_test",
    Some(s"""WITH u AS (
            |  SELECT user_id,
            |    CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
            |      AS y,
            |    ${hexSpanValSql("md5(CAST(user_id AS VARCHAR))", 0, 8)}
            |      AS hv
            |  FROM events GROUP BY user_id),
            |px AS (
            |  SELECT u.y,
            |    g.perm,
            |    (hv // CAST(pow(2, g.perm) AS BIGINT)) % 2 AS arm
            |  FROM u CROSS JOIN (
            |    SELECT unnest(generate_series(0, $Perms)) AS perm) g),
            |grid AS (
            |  SELECT perm,
            |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
            |      AS n1,
            |    CAST(count(*) AS BIGINT) AS n,
            |    CAST(sum(CASE WHEN arm = 1
            |      THEN CAST(y AS DECIMAL(38,0)) END) AS DOUBLE) AS s1,
            |    CAST(sum(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS s
            |  FROM px GROUP BY perm),
            |diffs AS (
            |  SELECT perm,
            |    round((s1 / n1 - (s - s1) / (n - n1)) / 100, 6) AS diff
            |  FROM grid),
            |obs AS (SELECT diff AS obs_diff FROM diffs WHERE perm = 0)
            |SELECT (SELECT CAST(count(*) AS BIGINT) FROM u) AS n_users,
            |  obs_diff,
            |  (SELECT CAST(sum(CASE WHEN abs(diff) >= abs(obs_diff)
            |     THEN 1 ELSE 0 END) AS BIGINT)
            |   FROM diffs WHERE perm >= 1) AS n_ge,
            |  round((1 + (SELECT sum(CASE WHEN abs(diff) >= abs(obs_diff)
            |     THEN 1 ELSE 0 END) FROM diffs WHERE perm >= 1))
            |    / CAST(${Perms + 1} AS DOUBLE), 6) AS p_value
            |FROM obs""".stripMargin),
    (s, d) => {
      val u = Tables.events(s, d)
        .groupBy("user_id")
        .agg((sum(dec(col("value"))) * 100).cast("long").as("y"))
        .withColumn("h", md5(col("user_id").cast("string")))
        .select(col("y"), expr(hexSpanValSql("h", 0, 8)).as("hv"))
      val px = u.select(col("y"), col("hv"),
          explode(sequence(lit(0), lit(Perms))).as("perm"))
        .select(col("y"), col("perm"),
          expr("(hv div CAST(pow(2, perm) AS BIGINT)) % 2").as("arm"))
      val grid = px.groupBy("perm").agg(
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"),
        count(lit(1)).as("n"),
        sum(when(col("arm") === 1, col("y").cast("decimal(38,0)")))
          .cast("double").as("s1"),
        sum(col("y").cast("decimal(38,0)")).cast("double").as("s"))
      val diffs = graft.operators.PlanCache.persist(grid.select(col("perm"),
        round((col("s1") / col("n1") -
          (col("s") - col("s1")) / (col("n") - col("n1"))) / 100, 6)
          .as("diff")))
      val obs = diffs.filter(col("perm") === 0)
        .select(col("diff").as("obs_diff"))
      val nUsers = u.agg(count(lit(1)).as("n_users"))
      val nge = diffs.filter(col("perm") >= 1).crossJoin(broadcast(obs))
        .agg(sum(when(abs(col("diff")) >= abs(col("obs_diff")), 1L)
          .otherwise(0L)).as("n_ge"))
      broadcast(nUsers).crossJoin(broadcast(obs)).crossJoin(nge)
        .select(col("n_users"), col("obs_diff"), col("n_ge"),
          round((lit(1) + col("n_ge")) / lit((Perms + 1).toDouble), 6)
            .as("p_value"))
    })

  /** Mutual information between event type and spend bin — the
    * feature-selection readout ("how much does knowing the type tell you
    * about spend"): I(X;Y), H(X), H(Y) and the normalized
    * MI/min(H(X),H(Y)) from the 5×8 contingency grid (value binned at
    * 125-wide buckets capped at 8 — fixed, engine-identical bins). All
    * counts exact from ONE corpus agg; per-cell p·ln terms round at 9
    * and decimal-sum so the entropy folds are partial-agg-order
    * independent. Nats, not bits (ln on both engines). */
  val q320_mi_feature = Q(
    "q320_mi_feature",
    Some("""WITH g AS (
           |  SELECT event_type AS x,
           |    LEAST(CAST(FLOOR(value / 125) AS BIGINT), 7) AS y,
           |    CAST(count(*) AS BIGINT) AS c
           |  FROM events GROUP BY 1, 2),
           |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM g),
           |px AS (SELECT x, CAST(sum(c) AS BIGINT) AS cx FROM g GROUP BY x),
           |py AS (SELECT y, CAST(sum(c) AS BIGINT) AS cy FROM g GROUP BY y),
           |mi AS (
           |  SELECT CAST(sum(CAST(round((CAST(c AS DOUBLE) / n.n)
           |    * ln((CAST(c AS DOUBLE) * n.n)
           |          / (CAST(cx AS DOUBLE) * cy)), 9)
           |    AS DECIMAL(28,9))) AS DOUBLE) AS mi
           |  FROM g JOIN px USING (x) JOIN py USING (y) CROSS JOIN n),
           |hx AS (
           |  SELECT CAST(sum(CAST(round(-(CAST(cx AS DOUBLE) / n.n)
           |    * ln(CAST(cx AS DOUBLE) / n.n), 9) AS DECIMAL(28,9)))
           |    AS DOUBLE) AS hx
           |  FROM px CROSS JOIN n),
           |hy AS (
           |  SELECT CAST(sum(CAST(round(-(CAST(cy AS DOUBLE) / n.n)
           |    * ln(CAST(cy AS DOUBLE) / n.n), 9) AS DECIMAL(28,9)))
           |    AS DOUBLE) AS hy
           |  FROM py CROSS JOIN n)
           |SELECT n.n, round(mi, 9) AS mi_nats, round(hx, 9) AS h_type,
           |  round(hy, 9) AS h_bin,
           |  round(mi / LEAST(hx, hy), 6) AS nmi
           |FROM mi CROSS JOIN hx CROSS JOIN hy CROSS JOIN n""".stripMargin),
    (s, d) => {
      val g = graft.operators.PlanCache.persist(Tables.events(s, d)
        .groupBy(col("event_type").as("x"),
          least((col("value") / 125).cast("long"), lit(7L)).as("y"))
        .agg(count(lit(1)).as("c")))
      val n = g.agg(sum("c").cast("long").as("n"))
      val px = g.groupBy("x").agg(sum("c").cast("long").as("cx"))
      val py = g.groupBy("y").agg(sum("c").cast("long").as("cy"))
      val mi = g.join(broadcast(px), "x").join(broadcast(py), "y")
        .crossJoin(broadcast(n))
        .agg(sum(round((col("c").cast("double") / col("n")) *
          log((col("c").cast("double") * col("n")) /
            (col("cx").cast("double") * col("cy"))), 9)
          .cast("decimal(28,9)")).cast("double").as("mi"))
      val hx = px.crossJoin(broadcast(n))
        .agg(sum(round(-(col("cx").cast("double") / col("n")) *
          log(col("cx").cast("double") / col("n")), 9)
          .cast("decimal(28,9)")).cast("double").as("hx"))
      val hy = py.crossJoin(broadcast(n))
        .agg(sum(round(-(col("cy").cast("double") / col("n")) *
          log(col("cy").cast("double") / col("n")), 9)
          .cast("decimal(28,9)")).cast("double").as("hy"))
      mi.crossJoin(broadcast(hx)).crossJoin(broadcast(hy))
        .crossJoin(broadcast(n))
        .select(col("n"), round(col("mi"), 9).as("mi_nats"),
          round(col("hx"), 9).as("h_type"), round(col("hy"), 9).as("h_bin"),
          round(col("mi") / least(col("hx"), col("hy")), 6).as("nmi"))
    })

  // O'Brien–Fleming two-sided 0.05 boundaries for K = 3 equally spaced
  // looks (published constants, shared 3-decimal literals)
  private val ObfZ = Seq(3.471, 2.454, 2.004)

  /** Group-sequential monitoring with O'Brien–Fleming boundaries — the
    * "peek three times without inflating α" counterpart to q272's SPRT:
    * the q270 two-proportion z recomputed on users enrolled (first
    * event) by each of three equally spaced calendar cutoffs, each look
    * compared to its OBF boundary. Per look: one filter on the user-
    * grid frame + exact conversion counts; the z formula mirrors q270
    * verbatim. Users×3 flat-map, grid aggregation — no per-look corpus
    * rescans. */
  val q322_group_sequential = Q(
    "q322_group_sequential", {
      val arm = s"${hexSpanValSql("md5(CAST(user_id AS VARCHAR))", 0, 2)} % 2"
      val bounds = ObfZ.zipWithIndex.map { case (z, i) =>
        s"WHEN ${i + 1} THEN $z"
      }.mkString(" ")
      Some(s"""WITH u AS (
              |  SELECT user_id, $arm AS arm,
              |    CAST(max(CASE WHEN event_type = 'purchase'
              |      AND value > 250 THEN 1 ELSE 0 END) AS BIGINT) AS conv,
              |    CAST(min(epoch_us(ts) // 86400000000) AS BIGINT)
              |      AS first_day
              |  FROM events GROUP BY 1, 2),
              |span AS (
              |  SELECT min(first_day) AS d0, max(first_day) AS d1 FROM u),
              |looks AS (
              |  SELECT g.look,
              |    d0 + ((d1 - d0) * g.look) // 3 AS cutoff
              |  FROM span CROSS JOIN (
              |    SELECT unnest(generate_series(1, 3)) AS look) g),
              |cells AS (
              |  SELECT l.look,
              |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
              |      AS n0,
              |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
              |      AS n1,
              |    CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END)
              |      AS BIGINT) AS c0,
              |    CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END)
              |      AS BIGINT) AS c1
              |  FROM u JOIN looks l ON u.first_day <= l.cutoff
              |  GROUP BY l.look),
              |z AS (
              |  SELECT look, n0, n1,
              |    round((CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0)
              |      / sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
              |        * (1 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
              |        * (1.0 / n0 + 1.0 / n1)), 6) AS z
              |  FROM cells)
              |SELECT look, n0, n1, z,
              |  CASE look $bounds END AS boundary,
              |  CASE WHEN abs(z) > (CASE look $bounds END)
              |    THEN 1 ELSE 0 END AS crossed
              |FROM z ORDER BY look""".stripMargin)
    },
    (s, d) => {
      val u = graft.operators.PlanCache.persist(Tables.events(s, d)
        .withColumn("__h", md5(col("user_id").cast("string")))
        .groupBy(col("user_id"),
          (expr(hexSpanValSql("__h", 0, 2)) % 2).as("arm"))
        .agg(max(when(col("event_type") === "purchase" &&
          col("value") > 250, 1L).otherwise(0L)).as("conv"),
          min(expr("(ts div 1000) div 86400000000")).as("first_day")))
      val span = u.agg(min("first_day").as("d0"), max("first_day").as("d1"))
      val looks = span
        .select(explode(sequence(lit(1L), lit(3L))).as("look"),
          col("d0"), col("d1"))
        .select(col("look"),
          (col("d0") + expr("((d1 - d0) * look) div 3")).as("cutoff"))
      val cells = u.join(broadcast(looks), col("first_day") <= col("cutoff"))
        .groupBy("look")
        .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"),
          sum(when(col("arm") === 0, col("conv")).otherwise(0L)).as("c0"),
          sum(when(col("arm") === 1, col("conv")).otherwise(0L)).as("c1"))
      val pPool = (col("c0") + col("c1")).cast("double") /
        (col("n0") + col("n1"))
      val z = round((col("c1").cast("double") / col("n1") -
        col("c0").cast("double") / col("n0")) /
        sqrt(pPool * (lit(1) - pPool) *
          (lit(1.0) / col("n0") + lit(1.0) / col("n1"))), 6)
      val boundary = ObfZ.zipWithIndex.foldLeft(lit(null).cast("double")) {
        case (acc, (b, i)) => when(col("look") === i + 1, b).otherwise(acc)
      }
      cells.select(col("look"), col("n0"), col("n1"), z.as("z"),
          boundary.as("boundary"),
          when(abs(z) > boundary, 1).otherwise(0).as("crossed"))
        .orderBy("look")
    })

  /** Overdispersion check per event type: variance-to-mean ratio of
    * DAILY counts on the DENSE day grid (zero-event days count — q227's
    * lesson; omitting them biases the variance down) and the dispersion
    * statistic (n−1)·VMR ~ χ²_{n−1} under Poisson — the diagnostic that
    * decides whether count models downstream need a negative-binomial.
    * Exact integer count moments per type; doubles only in the final
    * per-type row. */
  val q327_dispersion = Q(
    "q327_dispersion",
    Some("""WITH ev AS (
           |  SELECT event_type,
           |    CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
           |  FROM events),
           |span AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
           |types AS (SELECT DISTINCT event_type FROM ev),
           |grid AS (
           |  SELECT t.event_type, g.day
           |  FROM span, types t, unnest(generate_series(d0, d1)) AS g(day)),
           |cnt AS (
           |  SELECT event_type, day, CAST(count(*) AS BIGINT) AS c
           |  FROM ev GROUP BY 1, 2),
           |cells AS (
           |  SELECT grid.event_type, grid.day, COALESCE(cnt.c, 0) AS c
           |  FROM grid LEFT JOIN cnt
           |    ON grid.event_type = cnt.event_type AND grid.day = cnt.day),
           |m AS (
           |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
           |    CAST(sum(c) AS BIGINT) AS s,
           |    CAST(sum(c * c) AS BIGINT) AS ss
           |  FROM cells GROUP BY event_type)
           |SELECT event_type, n_days,
           |  round(CAST(s AS DOUBLE) / n_days, 6) AS mean_daily,
           |  round((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n_days)
           |    / (n_days - 1) / (CAST(s AS DOUBLE) / n_days), 6) AS vmr,
           |  round((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n_days)
           |    / (CAST(s AS DOUBLE) / n_days), 6) AS stat,
           |  CAST(n_days - 1 AS BIGINT) AS df
           |FROM m ORDER BY event_type""".stripMargin),
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_type"),
          expr("(ts div 1000) div 86400000000").as("day"))
      val span = ev.agg(min("day").as("d0"), max("day").as("d1"))
      val types = ev.select("event_type").distinct()
      val grid = span
        .select(explode(sequence(col("d0"), col("d1"))).as("day"))
        .crossJoin(broadcast(types))
      val cnt = ev.groupBy("event_type", "day")
        .agg(count(lit(1)).as("c"))
      val cells = grid.join(cnt, Seq("event_type", "day"), "left")
        .select(col("event_type"), coalesce(col("c"), lit(0L)).as("c"))
      val m = cells.groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
          sum("c").cast("long").as("s"),
          sum(col("c") * col("c")).cast("long").as("ss"))
      val mean = col("s").cast("double") / col("n_days")
      val svar = (col("ss").cast("double") -
        col("s").cast("double") * col("s") / col("n_days")) /
        (col("n_days") - 1)
      m.select(col("event_type"), col("n_days"),
          round(mean, 6).as("mean_daily"),
          round(svar / mean, 6).as("vmr"),
          round((col("ss").cast("double") -
            col("s").cast("double") * col("s") / col("n_days")) / mean, 6)
            .as("stat"),
          (col("n_days") - 1).cast("long").as("df"))
        .orderBy("event_type")
    })

  /** Delta-method z-test for a RATIO metric (revenue per event) between
    * the md5 arms — the metric-engineering staple: per-user (y, n)
    * pairs make the ratio R = ΣY/ΣN a ratio of means, and
    * Var(R) ≈ (s_y² − 2R·s_yn + R²·s_n²)/(k·n̄²) — the linearization a
    * naive per-event t-test gets wrong because events within a user
    * correlate. All six moments per arm are EXACT integer sums off one
    * user-keyed agg (cents and counts); doubles enter only in the final
    * 2-row arithmetic. */
  val q329_delta_method = Q(
    "q329_delta_method", {
      val arm = s"${hexSpanValSql("md5(CAST(user_id AS VARCHAR))", 0, 2)} % 2"
      Some(s"""WITH u AS (
              |  SELECT user_id, $arm AS arm,
              |    CAST(sum(CASE WHEN event_type = 'purchase'
              |      THEN CAST(value AS DECIMAL(18,2)) ELSE CAST(0 AS
              |      DECIMAL(18,2)) END) * 100 AS BIGINT) AS y,
              |    CAST(count(*) AS BIGINT) AS n
              |  FROM events GROUP BY 1, 2),
              |m AS (
              |  SELECT arm, CAST(count(*) AS BIGINT) AS k,
              |    CAST(sum(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
              |    CAST(sum(n) AS DOUBLE) AS sn,
              |    CAST(sum(CAST(y AS DECIMAL(38,0))
              |      * CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS syy,
              |    CAST(sum(n * n) AS DOUBLE) AS snn,
              |    CAST(sum(CAST(y AS DECIMAL(38,0)) * n) AS DOUBLE) AS syn
              |  FROM u GROUP BY arm),
              |r AS (
              |  SELECT arm, k, sy / sn AS ratio,
              |    ((syy - sy * sy / k) / (k - 1)
              |      - 2 * (sy / sn) * ((syn - sy * sn / k) / (k - 1))
              |      + (sy / sn) * (sy / sn)
              |        * ((snn - sn * sn / k) / (k - 1)))
              |      / (k * (sn / k) * (sn / k)) AS var_r
              |  FROM m)
              |SELECT
              |  round((SELECT ratio FROM r WHERE arm = 0) / 100, 6)
              |    AS ratio_ctrl,
              |  round((SELECT ratio FROM r WHERE arm = 1) / 100, 6)
              |    AS ratio_treat,
              |  round(sqrt((SELECT var_r FROM r WHERE arm = 0)) / 100, 6)
              |    AS se_ctrl,
              |  round(sqrt((SELECT var_r FROM r WHERE arm = 1)) / 100, 6)
              |    AS se_treat,
              |  round(((SELECT ratio FROM r WHERE arm = 1)
              |      - (SELECT ratio FROM r WHERE arm = 0))
              |    / sqrt((SELECT var_r FROM r WHERE arm = 0)
              |      + (SELECT var_r FROM r WHERE arm = 1)), 6) AS z"""
        .stripMargin)
    },
    (s, d) => {
      val u = Tables.events(s, d)
        .withColumn("__h", md5(col("user_id").cast("string")))
        .groupBy(col("user_id"),
          (expr(hexSpanValSql("__h", 0, 2)) % 2).as("arm"))
        .agg((sum(when(col("event_type") === "purchase", dec(col("value")))
          .otherwise(lit(0).cast("decimal(18,2)"))) * 100)
          .cast("long").as("y"),
          count(lit(1)).as("n"))
      val yd = col("y").cast("decimal(38,0)")
      val m = u.groupBy("arm").agg(count(lit(1)).as("k"),
        sum(yd).cast("double").as("sy"),
        sum("n").cast("double").as("sn"),
        sum(yd * yd).cast("double").as("syy"),
        sum(col("n") * col("n")).cast("double").as("snn"),
        sum(yd * col("n")).cast("double").as("syn"))
      val ratio = col("sy") / col("sn")
      val varR = ((col("syy") - col("sy") * col("sy") / col("k")) /
        (col("k") - 1) -
        lit(2) * ratio * ((col("syn") - col("sy") * col("sn") / col("k")) /
          (col("k") - 1)) +
        ratio * ratio * ((col("snn") - col("sn") * col("sn") / col("k")) /
          (col("k") - 1))) /
        (col("k") * (col("sn") / col("k")) * (col("sn") / col("k")))
      val r = graft.operators.PlanCache.persist(
        m.select(col("arm"), ratio.as("ratio"), varR.as("var_r")))
      val c0 = r.filter(col("arm") === 0)
        .select(col("ratio").as("r0"), col("var_r").as("v0"))
      val c1 = r.filter(col("arm") === 1)
        .select(col("ratio").as("r1"), col("var_r").as("v1"))
      broadcast(c0).crossJoin(broadcast(c1))
        .select(round(col("r0") / 100, 6).as("ratio_ctrl"),
          round(col("r1") / 100, 6).as("ratio_treat"),
          round(sqrt(col("v0")) / 100, 6).as("se_ctrl"),
          round(sqrt(col("v1")) / 100, 6).as("se_treat"),
          round((col("r1") - col("r0")) / sqrt(col("v0") + col("v1")), 6)
            .as("z"))
    })

  /** Generalized-ESD outlier sweep (3 rounds) on per-user total spend:
    * each round recomputes mean/sd on the REMAINING set, reports the
    * most extreme user's R statistic = max|x−μ|/s, and removes that one
    * point — the iterative refinement Grubbs-style tests need because a
    * gross outlier masks the next one. Rounds are grid-frame anti-joins
    * against the (≤3-row) removed set; the extreme pick ties-break on
    * user_id so both engines remove the identical point. No critical
    * values on purpose (t quantiles are libm-unstable); R_i + n_i is
    * the portable readout. */
  val q330_gesd_outliers = Q(
    "q330_gesd_outliers", {
      def roundCte(i: Int, rem: String) =
        s"""s$i AS (
           |  SELECT CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS s,
           |    CAST(sum(CAST(y AS DECIMAL(38,0))
           |      * CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS ss
           |  FROM $rem),
           |p$i AS (
           |  SELECT $i AS round, r.user_id, r.y, s$i.n,
           |    abs(r.y - s$i.s / s$i.n)
           |      / sqrt((s$i.ss - s$i.s * s$i.s / s$i.n) / (s$i.n - 1))
           |      AS rstat
           |  FROM $rem r CROSS JOIN s$i
           |  ORDER BY abs(r.y - s$i.s / s$i.n) DESC, r.user_id LIMIT 1),
           |rem$i AS (
           |  SELECT r.* FROM $rem r
           |  WHERE r.user_id NOT IN (SELECT user_id FROM p$i))"""
          .stripMargin
      Some(s"""WITH u AS (
              |  SELECT user_id,
              |    CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
              |      AS y
              |  FROM events GROUP BY user_id),
              |${roundCte(1, "u")},
              |${roundCte(2, "rem1")},
              |${roundCte(3, "rem2")}
              |SELECT round, user_id, round(y / 100.0, 2) AS value,
              |  n, round(rstat, 6) AS r_stat
              |FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2
              |      UNION ALL SELECT * FROM p3) t
              |ORDER BY round""".stripMargin)
    },
    (s, d) => {
      val u = graft.operators.PlanCache.persist(Tables.events(s, d)
        .groupBy("user_id")
        .agg((sum(dec(col("value"))) * 100).cast("long").as("y")))
      def sweep(rem: org.apache.spark.sql.DataFrame, i: Int) = {
        val yd = col("y").cast("decimal(38,0)")
        val st = rem.agg(count(lit(1)).as("n"),
          sum(yd).cast("double").as("s"),
          sum(yd * yd).cast("double").as("ss"))
        val pick = rem.crossJoin(broadcast(st))
          .select(lit(i).as("round"), col("user_id"), col("y"), col("n"),
            (abs(col("y") - col("s") / col("n")) /
              sqrt((col("ss") - col("s") * col("s") / col("n")) /
                (col("n") - 1))).as("rstat"),
            abs(col("y") - col("s") / col("n")).as("dev"))
          .orderBy(col("dev").desc, col("user_id")).limit(1)
          .drop("dev")
        val next = rem.join(
          pick.select(col("user_id")), Seq("user_id"), "left_anti")
        (graft.operators.PlanCache.persist(pick),
          graft.operators.PlanCache.persist(next))
      }
      val (p1, rem1) = sweep(u, 1)
      val (p2, rem2) = sweep(rem1, 2)
      val (p3, _) = sweep(rem2, 3)
      p1.union(p2).union(p3)
        .select(col("round"), col("user_id"),
          round(col("y") / 100.0, 2).as("value"), col("n"),
          round(col("rstat"), 6).as("r_stat"))
        .orderBy("round")
    })

  /** Partial autocorrelation (lags 1–3) of the daily-spend series via
    * the Durbin–Levinson recursion unrolled on the 3-lag ACF row — the
    * "is it AR(1) or AR(2)" order-selection readout q206's raw ACF
    * can't give (ACF of an AR(1) decays forever; PACF cuts off). The
    * lagged-pair Pearson per lag is q206's grid device verbatim; the
    * recursion is pure 1-row arithmetic with each φ rounded at 9 so
    * both engines iterate on identical doubles. */
  val q331_pacf = Q(
    "q331_pacf",
    Some("""WITH daily AS (
           |  SELECT epoch_us(ts) // 86400000000 AS day,
           |    sum(CAST(value AS DECIMAL(18,2))) AS x
           |  FROM events GROUP BY 1),
           |p AS (
           |  SELECT l.lag AS lag, CAST(a.x AS DECIMAL(18,2)) AS x,
           |    CAST(b.x AS DECIMAL(18,2)) AS y
           |  FROM daily a
           |  CROSS JOIN (SELECT unnest(generate_series(1, 3)) AS lag) l
           |  JOIN daily b ON b.day = a.day + l.lag),
           |m AS (
           |  SELECT lag, CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
           |    CAST(sum(x * y) AS DOUBLE) AS sxy,
           |    CAST(sum(x * x) AS DOUBLE) AS sxx,
           |    CAST(sum(y * y) AS DOUBLE) AS syy
           |  FROM p GROUP BY lag),
           |acf AS (
           |  SELECT lag,
           |    round((sxy - sx * sy / n)
           |      / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)), 6)
           |      AS r
           |  FROM m),
           |wide AS (
           |  SELECT max(CASE WHEN lag = 1 THEN r END) AS r1,
           |    max(CASE WHEN lag = 2 THEN r END) AS r2,
           |    max(CASE WHEN lag = 3 THEN r END) AS r3
           |  FROM acf),
           |dl AS (
           |  SELECT r1, r2, r3,
           |    round((r2 - r1 * r1) / (1 - r1 * r1), 9) AS phi22
           |  FROM wide),
           |dl2 AS (
           |  SELECT r1, r2, r3, phi22,
           |    round(r1 - phi22 * r1, 9) AS phi21
           |  FROM dl),
           |dl3 AS (
           |  SELECT r1, r2, r3, phi22,
           |    round((r3 - phi21 * r2 - phi22 * r1)
           |      / (1 - phi21 * r1 - phi22 * r2), 9) AS phi33
           |  FROM dl2)
           |SELECT CAST(1 AS BIGINT) AS lag, r1 AS acf,
           |  CAST(r1 AS DOUBLE) AS pacf FROM dl3
           |UNION ALL
           |SELECT CAST(2 AS BIGINT), r2, phi22 FROM dl3
           |UNION ALL
           |SELECT CAST(3 AS BIGINT), r3, phi33 FROM dl3
           |ORDER BY lag""".stripMargin),
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(expr("(ts div 1000) div 86400000000").as("day"))
        .agg(sum(dec(col("value"))).as("x"))
      val a = daily.withColumn("lag", explode(sequence(lit(1), lit(3))))
      val b = daily.select(col("day").as("bday"), col("x").as("bx"))
      val m = a.join(broadcast(b), a("day") + a("lag") === b("bday"))
        .select(col("lag"), col("x").cast("decimal(18,2)").as("px"),
          col("bx").cast("decimal(18,2)").as("py"))
        .groupBy("lag")
        .agg(count(lit(1)).as("n"),
          sum("px").cast("double").as("sx"),
          sum("py").cast("double").as("sy"),
          sum(col("px") * col("py")).cast("double").as("sxy"),
          sum(col("px") * col("px")).cast("double").as("sxx"),
          sum(col("py") * col("py")).cast("double").as("syy"))
      val acf = m.select(col("lag"),
        round((col("sxy") - col("sx") * col("sy") / col("n")) /
          sqrt((col("sxx") - col("sx") * col("sx") / col("n")) *
            (col("syy") - col("sy") * col("sy") / col("n"))), 6).as("r"))
      val wide = acf.agg(
        max(when(col("lag") === 1, col("r"))).as("r1"),
        max(when(col("lag") === 2, col("r"))).as("r2"),
        max(when(col("lag") === 3, col("r"))).as("r3"))
      val dl3 = wide
        .withColumn("phi22",
          round((col("r2") - col("r1") * col("r1")) /
            (lit(1) - col("r1") * col("r1")), 9))
        .withColumn("phi21", round(col("r1") - col("phi22") * col("r1"), 9))
        .withColumn("phi33",
          round((col("r3") - col("phi21") * col("r2") -
            col("phi22") * col("r1")) /
            (lit(1) - col("phi21") * col("r1") -
              col("phi22") * col("r2")), 9))
      val p = graft.operators.PlanCache.persist(dl3)
      p.select(lit(1L).as("lag"), col("r1").as("acf"),
          col("r1").cast("double").as("pacf"))
        .union(p.select(lit(2L), col("r2"), col("phi22")))
        .union(p.select(lit(3L), col("r3"), col("phi33")))
        .orderBy("lag")
    })

  /** Logistic regression by 2 unrolled Newton–Raphson steps — "model
    * training as a query": P(conversion | standardized log-activity)
    * with exact sufficient statistics per step (per-user gradient and
    * Hessian terms round at 9 then decimal-sum, so the Newton updates
    * are partial-agg-order independent), coefficients flowing between
    * steps as a broadcast 1-row frame — never a driver collect. The
    * 2×2 Hessian inverts in closed form. Reports both steps'
    * coefficients plus the step-2 log-likelihood. */
  val q332_logistic_newton = Q(
    "q332_logistic_newton", {
      def stepSql(i: Int, prev: String) =
        s"""g$i AS (
           |  SELECT
           |    CAST(sum(CAST(round(conv - 1 / (1 + exp(-(b0 + b1 * x))), 9)
           |      AS DECIMAL(28,9))) AS DOUBLE) AS g0,
           |    CAST(sum(CAST(round((conv - 1 / (1 + exp(-(b0 + b1 * x))))
           |      * x, 9) AS DECIMAL(28,9))) AS DOUBLE) AS g1,
           |    CAST(sum(CAST(round((1 / (1 + exp(-(b0 + b1 * x))))
           |      * (1 - 1 / (1 + exp(-(b0 + b1 * x)))), 9)
           |      AS DECIMAL(28,9))) AS DOUBLE) AS h00,
           |    CAST(sum(CAST(round((1 / (1 + exp(-(b0 + b1 * x))))
           |      * (1 - 1 / (1 + exp(-(b0 + b1 * x)))) * x, 9)
           |      AS DECIMAL(28,9))) AS DOUBLE) AS h01,
           |    CAST(sum(CAST(round((1 / (1 + exp(-(b0 + b1 * x))))
           |      * (1 - 1 / (1 + exp(-(b0 + b1 * x)))) * x * x, 9)
           |      AS DECIMAL(28,9))) AS DOUBLE) AS h11
           |  FROM feat CROSS JOIN $prev),
           |b$i AS (
           |  SELECT
           |    round(b0 + (h11 * g0 - h01 * g1)
           |      / (h00 * h11 - h01 * h01), 9) AS b0,
           |    round(b1 + (h00 * g1 - h01 * g0)
           |      / (h00 * h11 - h01 * h01), 9) AS b1
           |  FROM g$i CROSS JOIN $prev)""".stripMargin
      Some(s"""WITH u AS (
              |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_ev,
              |    CAST(max(CASE WHEN event_type = 'purchase'
              |      AND value > 250 THEN 1 ELSE 0 END) AS BIGINT) AS conv
              |  FROM events GROUP BY user_id),
              |mo AS (
              |  SELECT CAST(count(*) AS BIGINT) AS k,
              |    CAST(sum(n_ev) AS DOUBLE) AS s,
              |    CAST(sum(n_ev * n_ev) AS DOUBLE) AS ss
              |  FROM u),
              |feat AS (
              |  SELECT conv,
              |    round((n_ev - s / k)
              |      / sqrt((ss - s * s / k) / (k - 1)), 6) AS x
              |  FROM u CROSS JOIN mo),
              |b0v AS (SELECT CAST(0 AS DOUBLE) AS b0,
              |        CAST(0 AS DOUBLE) AS b1),
              |${stepSql(1, "b0v")},
              |${stepSql(2, "b1")},
              |ll AS (
              |  SELECT CAST(sum(CAST(round(
              |    conv * ln(1 / (1 + exp(-(b0 + b1 * x))))
              |    + (1 - conv) * ln(1 - 1 / (1 + exp(-(b0 + b1 * x)))), 9)
              |    AS DECIMAL(28,9))) AS DOUBLE) AS ll
              |  FROM feat CROSS JOIN b2)
              |SELECT (SELECT b0 FROM b1) AS b0_step1,
              |  (SELECT b1 FROM b1) AS b1_step1,
              |  (SELECT b0 FROM b2) AS b0_step2,
              |  (SELECT b1 FROM b2) AS b1_step2,
              |  round((SELECT ll FROM ll), 6) AS log_lik""".stripMargin)
    },
    (s, d) => {
      val u = Tables.events(s, d)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_ev"),
          max(when(col("event_type") === "purchase" && col("value") > 250,
            1L).otherwise(0L)).as("conv"))
      val mo = u.agg(count(lit(1)).as("k"),
        sum("n_ev").cast("double").as("s"),
        sum(col("n_ev") * col("n_ev")).cast("double").as("ss"))
      val feat = graft.operators.PlanCache.persist(
        u.crossJoin(broadcast(mo))
          .select(col("conv"),
            round((col("n_ev") - col("s") / col("k")) /
              sqrt((col("ss") - col("s") * col("s") / col("k")) /
                (col("k") - 1)), 6).as("x")))
      def pCol = lit(1) / (lit(1) + exp(-(col("b0") + col("b1") * col("x"))))
      def step(prev: org.apache.spark.sql.DataFrame) = {
        val g = feat.crossJoin(broadcast(prev)).agg(
          sum(round(col("conv") - pCol, 9).cast("decimal(28,9)"))
            .cast("double").as("g0"),
          sum(round((col("conv") - pCol) * col("x"), 9)
            .cast("decimal(28,9)")).cast("double").as("g1"),
          sum(round(pCol * (lit(1) - pCol), 9).cast("decimal(28,9)"))
            .cast("double").as("h00"),
          sum(round(pCol * (lit(1) - pCol) * col("x"), 9)
            .cast("decimal(28,9)")).cast("double").as("h01"),
          sum(round(pCol * (lit(1) - pCol) * col("x") * col("x"), 9)
            .cast("decimal(28,9)")).cast("double").as("h11"))
        val det = col("h00") * col("h11") - col("h01") * col("h01")
        g.crossJoin(broadcast(prev))
          .select(
            round(col("b0") + (col("h11") * col("g0") -
              col("h01") * col("g1")) / det, 9).as("b0"),
            round(col("b1") + (col("h00") * col("g1") -
              col("h01") * col("g0")) / det, 9).as("b1"))
      }
      val b0v = mo.select(lit(0.0).as("b0"), lit(0.0).as("b1"))
      val b1f = graft.operators.PlanCache.persist(step(b0v))
      val b2f = graft.operators.PlanCache.persist(step(b1f))
      val ll = feat.crossJoin(broadcast(b2f))
        .agg(sum(round(col("conv") * log(pCol) +
          (lit(1) - col("conv")) * log(lit(1) - pCol), 9)
          .cast("decimal(28,9)")).cast("double").as("ll"))
      broadcast(b1f.select(col("b0").as("b0_step1"), col("b1").as("b1_step1")))
        .crossJoin(broadcast(b2f.select(col("b0").as("b0_step2"),
          col("b1").as("b1_step2"))))
        .crossJoin(ll)
        .select(col("b0_step1"), col("b1_step1"), col("b0_step2"),
          col("b1_step2"), round(col("ll"), 6).as("log_lik"))
    })

  /** Simpson's-paradox guard: mean spend for high- vs low-activity
    * users, POOLED and within each event-type stratum, with a reversal
    * flag wherever a stratum's gap disagrees in sign with the pooled
    * gap — the aggregation-reversal check a dashboard needs before
    * anyone reads the pooled number. One user-keyed agg (the tier), one
    * join back, one 4-way conditional agg per stratum + pooled; exact
    * cent sums throughout. */
  val q338_simpson_guard = Q(
    "q338_simpson_guard",
    Some("""WITH uu AS (
           |  SELECT user_id,
           |    CASE WHEN count(*) > 66 THEN 1 ELSE 0 END AS hi
           |  FROM events GROUP BY user_id),
           |t AS (
           |  SELECT event_type, hi,
           |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
           |  FROM events JOIN uu USING (user_id)),
           |strata AS (
           |  SELECT event_type,
           |    CAST(sum(hi) AS BIGINT) AS n_high,
           |    CAST(sum(1 - hi) AS BIGINT) AS n_low,
           |    CAST(sum(CASE WHEN hi = 1
           |      THEN CAST(y AS DECIMAL(38,0)) END) AS DOUBLE)
           |      / sum(hi) / 100 AS mh,
           |    CAST(sum(CASE WHEN hi = 0
           |      THEN CAST(y AS DECIMAL(38,0)) END) AS DOUBLE)
           |      / sum(1 - hi) / 100 AS ml
           |  FROM t GROUP BY event_type),
           |pooled AS (
           |  SELECT
           |    CAST(sum(CASE WHEN hi = 1
           |      THEN CAST(y AS DECIMAL(38,0)) END) AS DOUBLE)
           |      / sum(hi) / 100
           |    - CAST(sum(CASE WHEN hi = 0
           |      THEN CAST(y AS DECIMAL(38,0)) END) AS DOUBLE)
           |      / sum(1 - hi) / 100 AS pooled_diff
           |  FROM t)
           |SELECT event_type, n_high, n_low,
           |  round(mh, 6) AS mean_high, round(ml, 6) AS mean_low,
           |  round(mh - ml, 6) AS diff,
           |  round(pooled_diff, 6) AS pooled_diff,
           |  CASE WHEN (mh - ml) * pooled_diff < 0 THEN 1 ELSE 0 END
           |    AS reversal
           |FROM strata CROSS JOIN pooled
           |ORDER BY event_type""".stripMargin),
    (s, d) => {
      val ev = Tables.events(s, d)
      val uu = ev.groupBy("user_id")
        .agg(when(count(lit(1)) > 66, 1).otherwise(0).as("hi"))
      val t = graft.operators.PlanCache.persist(
        ev.join(uu, "user_id")
          .select(col("event_type"), col("hi"),
            (dec(col("value")) * 100).cast("long").as("y")))
      val yd = col("y").cast("decimal(38,0)")
      def mh = sum(when(col("hi") === 1, yd)).cast("double") /
        sum("hi") / 100
      def ml = sum(when(col("hi") === 0, yd)).cast("double") /
        sum(lit(1) - col("hi")) / 100
      val strata = t.groupBy("event_type").agg(
        sum("hi").cast("long").as("n_high"),
        sum(lit(1) - col("hi")).cast("long").as("n_low"),
        mh.as("mh"), ml.as("ml"))
      val pooled = t.agg((mh - ml).as("pooled_diff"))
      strata.crossJoin(broadcast(pooled))
        .select(col("event_type"), col("n_high"), col("n_low"),
          round(col("mh"), 6).as("mean_high"),
          round(col("ml"), 6).as("mean_low"),
          round(col("mh") - col("ml"), 6).as("diff"),
          round(col("pooled_diff"), 6).as("pooled_diff"),
          when((col("mh") - col("ml")) * col("pooled_diff") < 0, 1)
            .otherwise(0).as("reversal"))
        .orderBy("event_type")
    })

  /** Rank-1 ALS on the user × event-type spend matrix — collaborative
    * filtering training as a query, q332's "model fitting stays in the
    * engine" theme for recommenders: two alternations of
    * u_i = Σ_j r_ij·v_j / Σ_j v_j² (per-user agg over a broadcast item
    * row) and v_j = Σ_i r_ij·u_i / Σ_i u_i² (item-keyed agg over the
    * user-joined ratings), then the reconstruction RMSE. Every
    * cross-row sum is round(·,6/9)-then-decimal-sum so the factor
    * values are partial-agg-order independent; factors flow as
    * broadcast frames (items) and keyed joins (users) — no collect. */
  val q341_rank1_als = Q(
    "q341_rank1_als", {
      def uStep(i: Int, vPrev: String) =
        s"""u$i AS (
           |  SELECT user_id,
           |    round(CAST(sum(CAST(round(r.r * v.v, 6) AS DECIMAL(28,6)))
           |        AS DOUBLE)
           |      / sum(CAST(round(v.v * v.v, 6) AS DECIMAL(28,6))), 6)
           |      AS u
           |  FROM r JOIN $vPrev v ON v.event_type = r.event_type
           |  GROUP BY user_id)""".stripMargin
      def vStep(i: Int, uPrev: String) =
        s"""v$i AS (
           |  SELECT event_type,
           |    round(CAST(sum(CAST(round(r.r * u.u, 6) AS DECIMAL(28,6)))
           |        AS DOUBLE)
           |      / sum(CAST(round(u.u * u.u, 6) AS DECIMAL(28,6))), 6)
           |      AS v
           |  FROM r JOIN $uPrev u ON u.user_id = r.user_id
           |  GROUP BY event_type)""".stripMargin
      Some(s"""WITH r AS (
              |  SELECT user_id, event_type,
              |    CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
              |      / 100 AS DOUBLE) AS r
              |  FROM events GROUP BY 1, 2),
              |v0 AS (
              |  SELECT DISTINCT event_type, CAST(1 AS DOUBLE) AS v FROM r),
              |${uStep(1, "v0")},
              |${vStep(1, "u1")},
              |${uStep(2, "v1")},
              |${vStep(2, "u2")},
              |fit AS (
              |  SELECT round(sqrt(CAST(sum(CAST(round(
              |      (r.r - u.u * v.v) * (r.r - u.u * v.v), 9)
              |      AS DECIMAL(28,9))) AS DOUBLE) / count(*)), 6) AS rmse
              |  FROM r JOIN u2 u ON u.user_id = r.user_id
              |         JOIN v2 v ON v.event_type = r.event_type)
              |SELECT v2.event_type, v2.v AS factor, fit.rmse
              |FROM v2 CROSS JOIN fit
              |ORDER BY event_type""".stripMargin)
    },
    (s, d) => {
      val r = graft.operators.PlanCache.persist(Tables.events(s, d)
        .groupBy("user_id", "event_type")
        .agg((sum(dec(col("value"))).cast("double") / 100).as("r")))
      def uStep(v: org.apache.spark.sql.DataFrame) =
        graft.operators.PlanCache.persist(
          r.join(broadcast(v), "event_type")
            .groupBy("user_id")
            .agg(round(
              sum(round(col("r") * col("v"), 6).cast("decimal(28,6)"))
                .cast("double") /
                sum(round(col("v") * col("v"), 6).cast("decimal(28,6)"))
                  .cast("double"), 6).as("u")))
      def vStep(u: org.apache.spark.sql.DataFrame) =
        graft.operators.PlanCache.persist(
          r.join(u, "user_id")
            .groupBy("event_type")
            .agg(round(
              sum(round(col("r") * col("u"), 6).cast("decimal(28,6)"))
                .cast("double") /
                sum(round(col("u") * col("u"), 6).cast("decimal(28,6)"))
                  .cast("double"), 6).as("v")))
      val v0 = r.select("event_type").distinct()
        .withColumn("v", lit(1.0))
      val u1 = uStep(v0)
      val v1 = vStep(u1)
      val u2 = uStep(v1)
      val v2 = vStep(u2)
      val fit = r.join(u2, "user_id").join(broadcast(v2), "event_type")
        .agg(round(sqrt(
          sum(round((col("r") - col("u") * col("v")) *
            (col("r") - col("u") * col("v")), 9).cast("decimal(28,9)"))
            .cast("double") / count(lit(1))), 6).as("rmse"))
      v2.crossJoin(broadcast(fit))
        .select(col("event_type"), col("v").as("factor"), col("rmse"))
        .orderBy("event_type")
    })

  // Poisson(1) CDF cutpoints (shared 4-decimal literals): a uniform
  // draw maps to the replicate weight 0..5
  private val PoisCdf = Seq(0.3679, 0.7358, 0.9197, 0.9810, 0.9963)

  /** CLUSTER (Poisson) bootstrap for the q329 ratio metric — resampling
    * USERS, not events, so within-user correlation survives into the
    * interval (the error the naive event bootstrap makes). Deterministic:
    * replicate b's weight for a user is a pseudo-Poisson(1) draw mapped
    * from hex span b of the user's md5 through fixed CDF cutpoints —
    * both engines enumerate identical weight tables. 16 replicates ride
    * ONE users×16 flat-map + one grid agg; the replicate-spread SE and
    * the ±1.96·SE interval sit beside the q329 delta-method answer. */
  val q344_poisson_bootstrap = Q(
    "q344_poisson_bootstrap", {
      val w = PoisCdf.zipWithIndex
        .map { case (c, i) => s"WHEN u < $c THEN $i" }
        .mkString("CASE ", " ", " ELSE 5 END")
      Some(s"""WITH ub AS (
              |  SELECT user_id,
              |    CAST(sum(CASE WHEN event_type = 'purchase'
              |      THEN CAST(value AS DECIMAL(18,2)) ELSE CAST(0 AS
              |      DECIMAL(18,2)) END) * 100 AS BIGINT) AS y,
              |    CAST(count(*) AS BIGINT) AS n
              |  FROM events GROUP BY user_id),
              |px AS (
              |  SELECT y, n, g.b,
              |    ${hexSpanValSql("md5(CAST(user_id AS VARCHAR) || '|' || CAST(g.b AS VARCHAR))", 0, 4)}
              |      / 65536.0 AS u
              |  FROM ub CROSS JOIN
              |    (SELECT unnest(generate_series(1, 16)) AS b) g),
              |reps AS (
              |  SELECT b,
              |    CAST(sum(($w) * CAST(y AS DECIMAL(38,0))) AS DOUBLE)
              |      / CAST(sum(($w) * n) AS DOUBLE) / 100 AS r
              |  FROM px GROUP BY b),
              |obs AS (
              |  SELECT CAST(sum(CAST(y AS DECIMAL(38,0))) AS DOUBLE)
              |    / sum(n) / 100 AS r0
              |  FROM ub),
              |m AS (
              |  SELECT CAST(count(*) AS BIGINT) AS nb,
              |    CAST(sum(CAST(round(r, 9) AS DECIMAL(28,9))) AS DOUBLE)
              |      / count(*) AS rbar,
              |    CAST(sum(CAST(round(r * r, 9) AS DECIMAL(28,9)))
              |      AS DOUBLE) AS srr
              |  FROM reps)
              |SELECT round(r0, 6) AS observed, nb,
              |  round(rbar, 6) AS rep_mean,
              |  round(sqrt((srr - nb * rbar * rbar) / (nb - 1)), 6) AS se,
              |  round(r0 - 1.96 * sqrt((srr - nb * rbar * rbar) / (nb - 1)),
              |    6) AS ci_lo,
              |  round(r0 + 1.96 * sqrt((srr - nb * rbar * rbar) / (nb - 1)),
              |    6) AS ci_hi
              |FROM obs CROSS JOIN m""".stripMargin)
    },
    (s, d) => {
      // persisted: the user grid feeds both the 16-replicate flat-map
      // and the observed-ratio agg
      val ub = graft.operators.PlanCache.persist(Tables.events(s, d)
        .groupBy("user_id")
        .agg((sum(when(col("event_type") === "purchase", dec(col("value")))
          .otherwise(lit(0).cast("decimal(18,2)"))) * 100)
          .cast("long").as("y"),
          count(lit(1)).as("n")))
      val px = ub
        .select(col("user_id"), col("y"), col("n"),
          explode(sequence(lit(1), lit(16))).as("b"))
        .withColumn("h",
          md5(concat(col("user_id").cast("string"), lit("|"),
            col("b").cast("string"))))
        .select(col("y"), col("n"), col("b"),
          (expr(hexSpanValSql("h", 0, 4)) / 65536.0).as("u"))
      val w = PoisCdf.zipWithIndex.foldRight(lit(5): org.apache.spark.sql
          .Column) { case ((c, i), acc) => when(col("u") < c, i).otherwise(acc) }
      val reps = px.groupBy("b")
        .agg((sum(w * col("y").cast("decimal(38,0)")).cast("double") /
          sum(w * col("n")).cast("double") / 100).as("r"))
      val obs = ub.agg((sum(col("y").cast("decimal(38,0)")).cast("double") /
        sum("n") / 100).as("r0"))
      val m = reps.agg(count(lit(1)).as("nb"),
        (sum(round(col("r"), 9).cast("decimal(28,9)")).cast("double") /
          count(lit(1))).as("rbar"),
        sum(round(col("r") * col("r"), 9).cast("decimal(28,9)"))
          .cast("double").as("srr"))
      val se = sqrt((col("srr") - col("nb") * col("rbar") * col("rbar")) /
        (col("nb") - 1))
      obs.crossJoin(broadcast(m))
        .select(round(col("r0"), 6).as("observed"), col("nb"),
          round(col("rbar"), 6).as("rep_mean"),
          round(se, 6).as("se"),
          round(col("r0") - lit(1.96) * se, 6).as("ci_lo"),
          round(col("r0") + lit(1.96) * se, 6).as("ci_hi"))
    })

  /** Hash-uniformity audit — the foundation check under EVERY md5-based
    * device in this engine (splits q60, arms q254/q270, samples
    * q131/q255/q347, bootstrap q344): one-sample KS of the per-user
    * md5-span draw against U(0,1). D = max(i/n − u₍ᵢ₎, u₍ᵢ₎ − (i−1)/n)
    * over the sorted draws, compared to the α = 0.05 asymptotic
    * critical value 1.358/√n (shared literal). If this ever fails,
    * every downstream randomized entry is suspect — which is exactly
    * why it's IN the catalog.
    *
    * Scale shape (VERDICT r10 #3 — previously an unpartitioned
    * row_number over every user): the draw x = span16/65536 takes AT
    * MOST 65536 distinct values, so the ranks collapse onto the x-GRID
    * histogram: for a grid cell (x, c, cum) the i-indexed terms are
    * monotone in i, so max over its ranks is GREATEST(cum/n − x,
    * x − (cum−c)/n) — bit-identical to the oracle's per-rank formula
    * (same double divisions at the group endpoints). The cumulative
    * window orders ≤65536 grid rows, never users. */
  val q354_hash_uniformity = Q(
    "q354_hash_uniformity",
    Some(s"""WITH u AS (
            |  SELECT ${hexSpanValSql("md5(CAST(user_id AS VARCHAR))", 0, 4)}
            |    / 65536.0 AS x
            |  FROM (SELECT DISTINCT user_id FROM events)),
            |rk AS (
            |  SELECT x, ROW_NUMBER() OVER (ORDER BY x) AS i,
            |    count(*) OVER () AS n
            |  FROM u),
            |d AS (
            |  SELECT CAST(max(n) AS BIGINT) AS n,
            |    round(max(GREATEST(CAST(i AS DOUBLE) / n - x,
            |      x - (CAST(i AS DOUBLE) - 1) / n)), 6) AS ks_d
            |  FROM rk)
            |SELECT n, ks_d,
            |  round(1.358 / sqrt(n), 6) AS d_crit_05,
            |  CASE WHEN ks_d < 1.358 / sqrt(n) THEN 1 ELSE 0 END
            |    AS uniform_ok
            |FROM d""".stripMargin),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val u = Tables.events(s, d).select("user_id").distinct()
        .withColumn("__h", md5(col("user_id").cast("string")))
        .select((expr(hexSpanValSql("__h", 0, 4)) / 65536.0).as("x"))
      val g = u.groupBy("x").agg(count(lit(1)).as("c"))
      val wcum = Window.orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wall = Window.orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val cg = g.select(col("x"), col("c"),
        sum("c").over(wcum).cast("long").as("cum"),
        sum("c").over(wall).cast("long").as("n"))
      val dd = cg.agg(max("n").cast("long").as("n"),
        round(max(greatest(
          col("cum").cast("double") / col("n") - col("x"),
          col("x") - (col("cum") - col("c")).cast("double") / col("n"))), 6)
          .as("ks_d"))
      dd.select(col("n"), col("ks_d"),
        round(lit(1.358) / sqrt(col("n")), 6).as("d_crit_05"),
        when(col("ks_d") < lit(1.358) / sqrt(col("n")), 1).otherwise(0)
          .as("uniform_ok"))
    })

  /** Mergeable-summary law for QUANTILES: 8 md5 shards each build an
    * exact value-grid histogram independently; the merged histogram
    * (plain addition — the closed-under-merge property) yields the
    * global median, asserted equal to the directly computed one. This
    * is the correctness contract distributed percentile computation
    * rests on at 100 TB: per-shard summaries travel (grid-sized, not
    * row-sized) and merge WITHOUT re-reading rows — q79's incremental
    * law applied to order statistics, where only exactness of the
    * histogram makes the merge lossless. */
  val q358_shard_quantile_merge = Q(
    "q358_shard_quantile_merge", {
      val shard = s"${hexSpanValSql("md5(CAST(event_id AS VARCHAR))", 0, 2)} % 8"
      Some(s"""WITH sh AS (
              |  SELECT $shard AS shard,
              |    CAST(value AS DECIMAL(18,2)) AS val,
              |    CAST(count(*) AS BIGINT) AS c
              |  FROM events GROUP BY 1, 2),
              |merged AS (
              |  SELECT val, CAST(sum(c) AS BIGINT) AS c
              |  FROM sh GROUP BY val),
              |med AS (
              |  SELECT min(val) AS median_merged FROM (
              |    SELECT val, sum(c) OVER (ORDER BY val
              |      ROWS UNBOUNDED PRECEDING) AS cum,
              |      sum(c) OVER () AS n
              |    FROM merged) t WHERE 2 * cum >= n),
              |direct AS (
              |  SELECT min(val) AS median_direct FROM (
              |    SELECT val, sum(c) OVER (ORDER BY val
              |      ROWS UNBOUNDED PRECEDING) AS cum,
              |      sum(c) OVER () AS n
              |    FROM (SELECT CAST(value AS DECIMAL(18,2)) AS val,
              |            CAST(count(*) AS BIGINT) AS c
              |          FROM events GROUP BY 1) g) t
              |  WHERE 2 * cum >= n)
              |SELECT (SELECT CAST(count(DISTINCT shard) AS BIGINT) FROM sh)
              |    AS n_shards,
              |  CAST(median_merged AS DOUBLE) AS median_merged,
              |  CAST(median_direct AS DOUBLE) AS median_direct,
              |  CASE WHEN median_merged = median_direct THEN 1 ELSE 0 END
              |    AS merge_lossless
              |FROM med CROSS JOIN direct""".stripMargin)
    },
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, d)
        .withColumn("__h", md5(col("event_id").cast("string")))
      val sh = graft.operators.PlanCache.persist(ev
        .groupBy((expr(hexSpanValSql("__h", 0, 2)) % 8).as("shard"),
          dec(col("value")).as("val"))
        .agg(count(lit(1)).as("c")))
      val merged = sh.groupBy("val").agg(sum("c").cast("long").as("c"))
      val wcum = Window.orderBy("val")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wall = Window.orderBy("val")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val med = merged
        .select(col("val"), sum("c").over(wcum).as("cum"),
          sum("c").over(wall).as("n"))
        .filter(lit(2) * col("cum") >= col("n"))
        .agg(min("val").as("median_merged"))
      // the direct side is the same exact-histogram device WITHOUT the
      // shard key (an independent aggregation path, so the merge law is
      // still tested against a separately computed median) — ranking raw
      // rows would be an unpartitioned window over the whole table, a
      // single-partition global sort the corpus discipline bans (ADVICE
      // r9); the windows below run on the bounded value grid only
      val direct = Tables.events(s, d)
        .groupBy(dec(col("value")).as("val"))
        .agg(count(lit(1)).as("c"))
        .select(col("val"), sum("c").over(wcum).as("cum"),
          sum("c").over(wall).as("n"))
        .filter(lit(2) * col("cum") >= col("n"))
        .agg(min("val").as("median_direct"))
      val nsh = sh.agg(countDistinct("shard").as("n_shards"))
      broadcast(nsh).crossJoin(broadcast(med)).crossJoin(broadcast(direct))
        .select(col("n_shards"),
          col("median_merged").cast("double").as("median_merged"),
          col("median_direct").cast("double").as("median_direct"),
          when(col("median_merged") === col("median_direct"), 1)
            .otherwise(0).as("merge_lossless"))
    })

  /** V-OPTIMAL histogram planning (Jagadish et al., VLDB '98 — the
    * bucketing a CBO's column statistics want): events.value pre-bins
    * onto a 64-cell equal-width grid (exact integer cents, so the grid
    * moments n/Σx/Σx² are exact), then the classic O(cells²·B) dynamic
    * program finds, for every bucket budget k = 1..8, the partition of
    * the grid minimizing total within-bucket SSE. The output is the
    * planner curve (k, total SSE, error vs the flat 1-bucket baseline)
    * — the elbow tells the stats collector how many buckets this
    * column's shape deserves. Cross-engine determinism: segment SSE is
    * `(Δq) − (Δs)²/(Δn)` on exact integer prefix deltas, and both
    * engines evaluate dp(k−1,j) + sse(j+1,i) with identical IEEE
    * operand structure, so min() sees bit-identical candidates.
    *
    * Scale shape: ONE corpus scan builds the 64-row grid; the DP runs
    * on the grid alone (the adjudicated bounded-metadata device — the
    * k-unrolled SQL twin is the proof the driver loop computes the same
    * table; 64²·8 ops, microseconds). At 100 TB only the grid agg
    * scales with data. */
  val q377_voptimal_histogram = Q(
    "q377_voptimal_histogram", {
      // shared SSE fragment over prefix arrays (1-based cell index)
      // prefix positions are 0-based; DuckDB lists are 1-based, hence +1
      def sse(a: String, b: String) =
        s"""CASE WHEN pn[($b) + 1] - pn[($a) + 1] = 0 THEN 0.0
           |  ELSE CAST(pq[($b) + 1] - pq[($a) + 1] AS DOUBLE)
           |    - CAST(ps[($b) + 1] - ps[($a) + 1] AS DOUBLE)
           |      * CAST(ps[($b) + 1] - ps[($a) + 1] AS DOUBLE)
           |      / CAST(pn[($b) + 1] - pn[($a) + 1] AS DOUBLE) END""".stripMargin
      val dpSteps = (2 to 8).map { k =>
        s"""dp$k AS (
           |  SELECT g.i,
           |    min(d.cost + ${sse("d.i", "g.i")}) AS cost
           |  FROM dp${k - 1} d JOIN idx g ON d.i < g.i
           |  CROSS JOIN pre
           |  GROUP BY 1)""".stripMargin
      }.mkString(",\n")
      val curve = (1 to 8).map { k =>
        s"SELECT $k AS k, cost FROM dp$k WHERE i = 64"
      }.mkString("\nUNION ALL ")
      Some(s"""WITH c AS (
           |  SELECT CAST(round(value * 100, 0) AS BIGINT) AS cents
           |  FROM events),
           |mm AS (SELECT min(cents) AS mn, max(cents) AS mx FROM c),
           |cells AS (
           |  SELECT least((64 * (cents - mn)) // (mx - mn + 1), 63) AS cell,
           |    CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(cents) AS BIGINT) AS s,
           |    CAST(sum(cents * cents) AS BIGINT) AS q
           |  FROM c CROSS JOIN mm GROUP BY 1),
           |grid AS (
           |  SELECT g.i AS cell,
           |    coalesce(cells.n, 0) AS n, coalesce(cells.s, 0) AS s,
           |    coalesce(cells.q, 0) AS q
           |  FROM generate_series(0, 63) g(i)
           |  LEFT JOIN cells ON cells.cell = g.i),
           |pre AS (
           |  SELECT list_prepend(CAST(0 AS BIGINT),
           |      list(CAST(cn AS BIGINT) ORDER BY cell)) AS pn,
           |    list_prepend(CAST(0 AS BIGINT),
           |      list(CAST(cs AS BIGINT) ORDER BY cell)) AS ps,
           |    list_prepend(CAST(0 AS BIGINT),
           |      list(CAST(cq AS BIGINT) ORDER BY cell)) AS pq
           |  FROM (
           |    SELECT cell,
           |      sum(n) OVER w AS cn, sum(s) OVER w AS cs,
           |      sum(q) OVER w AS cq
           |    FROM grid
           |    WINDOW w AS (ORDER BY cell ROWS UNBOUNDED PRECEDING))),
           |idx AS (SELECT g.i FROM generate_series(1, 64) g(i)),
           |dp1 AS (
           |  SELECT g.i, ${sse("0", "g.i")} AS cost
           |  FROM idx g CROSS JOIN pre),
           |$dpSteps,
           |curve AS ($curve)
           |SELECT k AS n_buckets,
           |  CAST(floor(cost) AS BIGINT) AS total_sse,
           |  round(CASE WHEN first_value(cost) OVER (ORDER BY k) = 0
           |    THEN 0.0 ELSE cost / first_value(cost) OVER (ORDER BY k)
           |    END, 6) AS err_vs_flat
           |FROM curve ORDER BY k""".stripMargin)
    },
    (s, d) => {
      val c = Tables.events(s, d)
        .select(round(col("value") * 100, 0).cast("long").as("cents"))
      val mm = c.agg(min("cents").as("mn"), max("cents").as("mx"))
      val cells = c.crossJoin(broadcast(mm))
        .select(least(expr("(64 * (cents - mn)) div (mx - mn + 1)"),
          lit(63L)).as("cell"), col("cents"))
        .groupBy("cell")
        .agg(count(lit(1)).as("n"), sum("cents").cast("long").as("s"),
          sum(col("cents") * col("cents")).cast("long").as("q"))
      // The 64-cell grid is bounded METADATA (the q315 adjudication):
      // collecting it costs one 64-row fetch; the DP below is 64²·8
      // integer-delta float ops, mirrored 1:1 by the SQL's unrolled
      // dp2..dp8 CTEs so both engines walk identical IEEE operands.
      val rows = cells.collect().map(r =>
        (r.getLong(0).toInt, r.getLong(1), r.getLong(2), r.getLong(3)))
      val n = new Array[Long](65); val s2 = new Array[Long](65)
      val q2 = new Array[Long](65)
      rows.foreach { case (cell, cn, cs, cq) =>
        n(cell + 1) = cn; s2(cell + 1) = cs; q2(cell + 1) = cq }
      for (i <- 1 to 64) {
        n(i) += n(i - 1); s2(i) += s2(i - 1); q2(i) += q2(i - 1)
      }
      def sse(a: Int, b: Int): Double =
        if (n(b) - n(a) == 0) 0.0
        else (q2(b) - q2(a)).toDouble -
          (s2(b) - s2(a)).toDouble * (s2(b) - s2(a)).toDouble /
            (n(b) - n(a)).toDouble
      val dp = Array.ofDim[Double](9, 65)
      for (i <- 1 to 64) dp(1)(i) = sse(0, i)
      // dp(k)(i) exists only for i ≥ k (the SQL dp_k CTE likewise has
      // no row below i = k: the join chain needs k ascending indices)
      for (k <- 2 to 8; i <- k to 64)
        dp(k)(i) = ((k - 1) until i).map(j => dp(k - 1)(j) + sse(j, i)).min
      val flat = dp(1)(64)
      // total_sse displays as ⌊cost⌋: at ~1e10 cents² the 4th decimal
      // sits below the double's ulp, where the two engines' round()
      // implementations legitimately disagree — floor of the identical
      // double is exact on both
      val out = (1 to 8).map { k =>
        val cost = dp(k)(64)
        (k, math.floor(cost).toLong,
         if (flat == 0.0) 0.0
         else BigDecimal(cost / flat)
           .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      import s.implicits._
      out.toDF("n_buckets", "total_sse", "err_vs_flat")
        .select(col("n_buckets").cast("int").as("n_buckets"),
          col("total_sse"), col("err_vs_flat"))
        .orderBy("n_buckets")
    })

  /** EXACT 1-D Wasserstein (earth-mover's) distance between every pair
    * of event types' value distributions — the drift/shift measure with
    * actual units (average cents a mass unit must travel), where PSI
    * (q246) and KS (q354) only score overlap. Uses the CDF identity
    * W₁ = ∫|F_a − F_b| dv on the exact cent grid, with the integrand
    * cross-multiplied to integers — |cumA·nB − cumB·nA| · gap — summed
    * as BIGINTs and divided ONCE at the end by nA·nB·100, so the
    * statistic is exact to the final double (no per-grid-point float).
    *
    * Scale shape: one corpus agg to the (type, cents) grid; per-type
    * CDFs are type-partitioned windows over grid rows; the pair join
    * is grid×types, never row-level. */
  val q381_wasserstein_1d = Q(
    "q381_wasserstein_1d",
    Some("""WITH c AS (
           |  SELECT event_type AS t,
           |    CAST(round(value * 100, 0) AS BIGINT) AS cents,
           |    CAST(count(*) AS BIGINT) AS k
           |  FROM events GROUP BY 1, 2),
           |vals AS (SELECT DISTINCT cents FROM c),
           |types AS (SELECT t, CAST(sum(k) AS BIGINT) AS n FROM c GROUP BY 1),
           |grid AS (
           |  SELECT ty.t, ty.n, v.cents, coalesce(c.k, 0) AS k
           |  FROM vals v CROSS JOIN types ty
           |  LEFT JOIN c ON c.t = ty.t AND c.cents = v.cents),
           |cdf AS (
           |  SELECT t, n, cents,
           |    CAST(sum(k) OVER (PARTITION BY t ORDER BY cents
           |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
           |    lead(cents) OVER (PARTITION BY t ORDER BY cents) AS nxt
           |  FROM grid),
           |pairs AS (
           |  SELECT a.t AS type_a, b.t AS type_b, a.n AS na, b.n AS nb,
           |    CAST(sum(abs(a.cum * b.n - b.cum * a.n)
           |      * (a.nxt - a.cents)) AS BIGINT) AS num
           |  FROM cdf a JOIN cdf b
           |    ON a.cents = b.cents AND a.t < b.t AND a.nxt IS NOT NULL
           |  GROUP BY 1, 2, 3, 4)
           |SELECT type_a, type_b,
           |  round(CAST(num AS DOUBLE) / (CAST(na AS DOUBLE) * nb * 100), 6)
           |    AS w1
           |FROM pairs ORDER BY type_a, type_b""".stripMargin),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val c = Tables.events(s, d)
        .groupBy(col("event_type").as("t"),
          round(col("value") * 100, 0).cast("long").as("cents"))
        .agg(count(lit(1)).as("k"))
      val vals = c.select("cents").distinct()
      val types = c.groupBy("t").agg(sum("k").cast("long").as("n"))
      val grid = vals.crossJoin(broadcast(types))
        .join(c, Seq("t", "cents"), "left")
        .select(col("t"), col("n"), col("cents"),
          coalesce(col("k"), lit(0L)).as("k"))
      val wCum = Window.partitionBy("t").orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wLead = Window.partitionBy("t").orderBy("cents")
      val cdf = grid.select(col("t"), col("n"), col("cents"),
        sum("k").over(wCum).cast("long").as("cum"),
        lead("cents", 1).over(wLead).as("nxt"))
      val a = cdf.select(col("t").as("type_a"), col("n").as("na"),
        col("cents"), col("cum").as("cuma"), col("nxt"))
      val b = cdf.select(col("t").as("type_b"), col("n").as("nb"),
        col("cents"), col("cum").as("cumb"))
      a.join(b, Seq("cents"))
        .filter(col("type_a") < col("type_b") && col("nxt").isNotNull)
        .groupBy("type_a", "type_b", "na", "nb")
        .agg(sum(abs(col("cuma") * col("nb") - col("cumb") * col("na"))
          * (col("nxt") - col("cents"))).cast("long").as("num"))
        .select(col("type_a"), col("type_b"),
          round(col("num").cast("double")
            / (col("na").cast("double") * col("nb") * 100), 6).as("w1"))
        .orderBy("type_a", "type_b")
    })

  val all: Seq[Q] = Seq(q318_permutation_test, q320_mi_feature,
    q322_group_sequential, q327_dispersion, q329_delta_method,
    q330_gesd_outliers, q331_pacf, q332_logistic_newton, q338_simpson_guard,
    q341_rank1_als, q344_poisson_bootstrap, q354_hash_uniformity,
    q358_shard_quantile_merge, q377_voptimal_histogram, q381_wasserstein_1d)
}
