package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.Q.dec

/** Round-9 statistics battery: rank correlation with ties (Kendall
  * τ-b), sequential hypothesis testing (SPRT), rank-based changepoint
  * (Pettitt), multivariate outliers (Mahalanobis), closed-form 2-D PCA,
  * and multi-feature OLS via exact normal equations.
  *
  * Shared discipline (q193/q202/q213 lineage): every row-scale pass is
  * ONE hash agg to a bounded grid (users, days, moment sums); all
  * quadratic work (pair joins, sign matrices) runs on the grid, never on
  * rows; doubles appear only in final closed-form arithmetic whose
  * expression tree is mirrored verbatim in the oracle, with engine-
  * computed transcendental constants replaced by 9-decimal literals
  * interpolated into BOTH sides from one Scala value.
  */
object StatsOps2 {

  /** Kendall τ-b between per-user activity (event count) and spend
    * (total-cents bucket) — the tie-aware rank correlation q208's
    * Spearman doesn't give (bucketed spend has heavy ties, and plain τ-a
    * undercounts them). The classic scale-killer is the O(n²) pair sort;
    * here both variables live on a bounded grid (count × spend-bucket
    * cells), so concordant/discordant mass comes from one cell-pair join
    * with product weights ca·cb — O(cells²) independent of row count —
    * and tie corrections are two marginal aggs. All counts are exact
    * BIGINTs; the only double is the final τ-b division. */
  val q271_kendall_tau = Q(
    "q271_kendall_tau",
    Some("""WITH u AS (
           |  SELECT user_id, CAST(count(*) AS BIGINT) AS x,
           |    CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
           |      // 50000 AS yb
           |  FROM events GROUP BY user_id),
           |g AS (
           |  SELECT x, yb, CAST(count(*) AS BIGINT) AS c
           |  FROM u GROUP BY x, yb),
           |cd AS (
           |  SELECT
           |    CAST(sum(CASE WHEN a.yb < b.yb THEN a.c * b.c ELSE 0 END)
           |      AS BIGINT) AS conc,
           |    CAST(sum(CASE WHEN a.yb > b.yb THEN a.c * b.c ELSE 0 END)
           |      AS BIGINT) AS disc
           |  FROM g a JOIN g b ON a.x < b.x),
           |tx AS (
           |  SELECT CAST(sum(nx * (nx - 1) / 2) AS BIGINT) AS ties_x
           |  FROM (SELECT CAST(sum(c) AS BIGINT) AS nx FROM g GROUP BY x)),
           |ty AS (
           |  SELECT CAST(sum(ny * (ny - 1) / 2) AS BIGINT) AS ties_y
           |  FROM (SELECT CAST(sum(c) AS BIGINT) AS ny FROM g GROUP BY yb)),
           |tot AS (
           |  SELECT CAST(sum(c) AS BIGINT) AS n,
           |    CAST(sum(c) * (sum(c) - 1) / 2 AS BIGINT) AS n0
           |  FROM g)
           |SELECT n, n0 AS n_pairs, conc AS concordant, disc AS discordant,
           |  ties_x, ties_y,
           |  round((CAST(conc AS DOUBLE) - disc)
           |    / sqrt(CAST(n0 - ties_x AS DOUBLE) * (n0 - ties_y)), 6)
           |    AS tau_b
           |FROM cd CROSS JOIN tx CROSS JOIN ty CROSS JOIN tot""".stripMargin),
    (s, d) => {
      val u = Tables.events(s, d)
        .groupBy("user_id")
        .agg(count(lit(1)).as("x"),
          (sum(dec(col("value"))) * 100).cast("long").as("__cents"))
        .select(col("x"), expr("__cents div 50000").as("yb"))
      val g = graft.operators.PlanCache.persist(
        u.groupBy("x", "yb").agg(count(lit(1)).as("c")))
      val a = g.select(col("x").as("ax"), col("yb").as("ay"), col("c").as("ac"))
      val b = g.select(col("x").as("bx"), col("yb").as("by"), col("c").as("bc"))
      // inequality join on the bounded grid only (cells², never rows²) —
      // the q213 Theil–Sen device
      val cd = a.join(b, col("ax") < col("bx"))
        .agg(sum(when(col("ay") < col("by"), col("ac") * col("bc"))
          .otherwise(0L)).as("conc"),
          sum(when(col("ay") > col("by"), col("ac") * col("bc"))
            .otherwise(0L)).as("disc"))
      val tx = g.groupBy("x").agg(sum("c").as("nx"))
        .agg(sum(col("nx") * (col("nx") - 1) / 2).cast("long").as("ties_x"))
      val ty = g.groupBy("yb").agg(sum("c").as("ny"))
        .agg(sum(col("ny") * (col("ny") - 1) / 2).cast("long").as("ties_y"))
      val tot = g.agg(sum("c").as("n"))
        .select(col("n"), (col("n") * (col("n") - 1) / 2).cast("long").as("n0"))
      cd.crossJoin(broadcast(tx)).crossJoin(broadcast(ty))
        .crossJoin(broadcast(tot))
        .select(col("n"), col("n0").as("n_pairs"),
          col("conc").as("concordant"), col("disc").as("discordant"),
          col("ties_x"), col("ties_y"),
          round((col("conc").cast("double") - col("disc")) /
            sqrt((col("n0") - col("ties_x")).cast("double") *
              (col("n0") - col("ties_y"))), 6).as("tau_b"))
    })

  // SPRT parameters: H0 purchase-share p0 vs H1 p1, α = β = 0.05. The
  // per-event log-likelihood increments and the decision boundaries are
  // 9-decimal literals computed ONCE here and interpolated into both
  // engines — neither engine's libm ln() is in the replay path.
  private val SprtP0 = 0.18
  private val SprtP1 = 0.22
  private def lit9(v: Double): Double =
    BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
  private val SprtLpos = lit9(math.log(SprtP1 / SprtP0))       // per success
  private val SprtLneg = lit9(math.log((1 - SprtP1) / (1 - SprtP0))) // per failure
  private val SprtBound = lit9(math.log(0.95 / 0.05))          // ±ln 19

  /** Sequential probability ratio test on the daily purchase share — the
    * always-valid sequential readout the fixed-horizon tests (q270 z,
    * q254 CUPED) can't give: after each day the cumulative log-likelihood
    * ratio either crosses ±ln((1−β)/α) and STOPS the experiment, or
    * continues. Day counts are one hash agg; each day's LLR increment is
    * c·ln(p1/p0) + (n−c)·ln((1−p1)/(1−p0)) with the logs as shared
    * 9-decimal literals, rounded to 6 then decimal-cumsummed over the
    * bounded day grid, so the walk is bit-identical on both engines and
    * under any partitioning. */
  val q272_sprt = Q(
    "q272_sprt",
    Some(s"""WITH daily AS (
            |  SELECT epoch_us(ts) // 86400000000 AS day,
            |    CAST(count(*) AS BIGINT) AS n,
            |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            |      AS BIGINT) AS c
            |  FROM events GROUP BY 1),
            |l AS (
            |  SELECT day, n, c,
            |    round(c * $SprtLpos + (n - c) * $SprtLneg, 6) AS llr
            |  FROM daily),
            |w AS (
            |  SELECT day, n, c, llr,
            |    CAST(sum(CAST(llr AS DECIMAL(18,6))) OVER (ORDER BY day)
            |      AS DOUBLE) AS cum_llr
            |  FROM l)
            |SELECT day, n, c, llr, round(cum_llr, 6) AS cum_llr,
            |  CASE WHEN cum_llr >= $SprtBound THEN 'accept_h1'
            |       WHEN cum_llr <= -$SprtBound THEN 'accept_h0'
            |       ELSE 'continue' END AS state
            |FROM w ORDER BY day""".stripMargin),
    (s, d) => {
      val wCum = org.apache.spark.sql.expressions.Window.orderBy("day")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val daily = Tables.events(s, d)
        .groupBy(expr("(ts div 1000) div 86400000000").as("day"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("c"))
        .withColumn("llr", round(col("c") * SprtLpos +
          (col("n") - col("c")) * SprtLneg, 6))
      // window over the 30-row day grid only (post-agg — q193 device)
      daily
        .withColumn("cum_llr",
          sum(col("llr").cast("decimal(18,6)")).over(wCum).cast("double"))
        .select(col("day"), col("n"), col("c"), col("llr"),
          round(col("cum_llr"), 6).as("cum_llr"),
          when(col("cum_llr") >= SprtBound, "accept_h1")
            .when(col("cum_llr") <= -SprtBound, "accept_h0")
            .otherwise("continue").as("state"))
        .orderBy("day")
    })

  /** Pettitt rank-based changepoint on the daily mean event value — the
    * nonparametric complement to q167's CUSUM (no variance estimate, no
    * normality assumption). U_t = Σ_{i≤t} Σ_{j>t} sgn(x_i − x_j) is the
    * O(days³) textbook sum collapsed to O(days²) by antisymmetry:
    * V_t = Σ_j sgn(x_t − x_j) (one grid self-join), then U = cumsum(V)
    * (the i≤t, j≤t block cancels). K = max |U_t|; the changepoint is the
    * first day attaining it; the approximate significance
    * 2·exp(−6K²/(n³+n²)) rounds at 6 (exp's last-ulp spread is far
    * below the rounding step). Day means are round-6 of exact decimal
    * sums, so every sign is decided identically on both engines. */
  val q273_pettitt = Q(
    "q273_pettitt",
    Some("""WITH daily AS (
           |  SELECT epoch_us(ts) // 86400000000 AS day,
           |    round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
           |      / count(*), 6) AS x
           |  FROM events GROUP BY 1),
           |v AS (
           |  SELECT a.day,
           |    CAST(sum(CASE WHEN a.x > b.x THEN 1
           |                  WHEN a.x < b.x THEN -1 ELSE 0 END) AS BIGINT)
           |      AS v
           |  FROM daily a JOIN daily b ON a.day <> b.day
           |  GROUP BY a.day),
           |u AS (
           |  SELECT day, CAST(sum(v) OVER (ORDER BY day) AS BIGINT) AS u
           |  FROM v),
           |n AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily),
           |k AS (SELECT CAST(max(abs(u)) AS BIGINT) AS k_stat FROM u)
           |SELECT n.n_days, k.k_stat,
           |  (SELECT min(day) FROM u WHERE abs(u) = k.k_stat) AS cp_day,
           |  round(2 * exp(-6.0 * k.k_stat * k.k_stat
           |    / (CAST(n.n_days AS DOUBLE) * n.n_days * n.n_days
           |       + CAST(n.n_days AS DOUBLE) * n.n_days)), 6) AS p_approx
           |FROM n CROSS JOIN k""".stripMargin),
    (s, d) => {
      val daily = graft.operators.PlanCache.persist(Tables.events(s, d)
        .groupBy(expr("(ts div 1000) div 86400000000").as("day"))
        .agg(round(sum(dec(col("value"))).cast("double") / count(lit(1)), 6)
          .as("x")))
      val b = daily.select(col("day").as("bday"), col("x").as("bx"))
      val v = daily.join(b, col("day") =!= col("bday"))
        .groupBy("day")
        .agg(sum(when(col("x") > col("bx"), 1L)
          .when(col("x") < col("bx"), -1L).otherwise(0L)).as("v"))
      val wCum = org.apache.spark.sql.expressions.Window.orderBy("day")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val u = graft.operators.PlanCache.persist(
        v.withColumn("u", sum(col("v")).over(wCum).cast("long")))
      val n = daily.agg(count(lit(1)).as("n_days"))
      val k = u.agg(max(abs(col("u"))).cast("long").as("k_stat"))
      val cp = u.crossJoin(broadcast(k))
        .filter(abs(col("u")) === col("k_stat"))
        .agg(min(col("day")).as("cp_day"))
      val nd = col("n_days").cast("double")
      broadcast(n).crossJoin(broadcast(k)).crossJoin(broadcast(cp))
        .select(col("n_days"), col("k_stat"), col("cp_day"),
          round(lit(2) * exp(lit(-6.0) * col("k_stat") * col("k_stat")
            / (nd * col("n_days") * col("n_days")
              + nd * col("n_days"))), 6).as("p_approx"))
    })

  /** Shared per-user (activity, spend) frame for q285/q286: one events
    * hash agg; x = event count, y = exact total cents. */
  private def userXY(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.events(s, d)
      .groupBy("user_id")
      .agg(count(lit(1)).as("x"),
        (sum(dec(col("value"))) * 100).cast("long").as("y"))
  private val UserXYSql =
    """SELECT user_id, CAST(count(*) AS BIGINT) AS x,
      |    CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS y
      |  FROM events GROUP BY user_id""".stripMargin

  /** Mahalanobis-distance outliers on the per-user (activity, spend)
    * plane — the multivariate upgrade of q90's per-axis z-scores: a user
    * who is unremarkable on each margin but off the correlation ridge
    * (many events, low spend) scores high. Moments are exact DECIMAL(38)
    * sums off ONE user-keyed hash agg; the 2×2 covariance inverse is
    * closed-form in doubles (identical IEEE tree both engines); the
    * 1-row moment frame re-enters broadcast and d² is scan-side
    * arithmetic feeding a TakeOrdered top-5 — no window, no sort of the
    * user frame. */
  val q285_mahalanobis = Q(
    "q285_mahalanobis",
    Some(s"""WITH u AS (
            |  $UserXYSql),
            |m AS (
            |  SELECT CAST(count(*) AS BIGINT) AS n,
            |    CAST(sum(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
            |    CAST(sum(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
            |    CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DOUBLE) AS sxx,
            |    CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DOUBLE) AS syy,
            |    CAST(sum(CAST(x AS DECIMAL(38,0)) * y) AS DOUBLE) AS sxy
            |  FROM u),
            |c AS (
            |  SELECT n, sx / n AS mx, sy / n AS my,
            |    sxx / n - (sx / n) * (sx / n) AS vx,
            |    syy / n - (sy / n) * (sy / n) AS vy,
            |    sxy / n - (sx / n) * (sy / n) AS cxy
            |  FROM m)
            |SELECT u.user_id, u.x, u.y,
            |  round((vy * (u.x - mx) * (u.x - mx)
            |       - 2 * cxy * (u.x - mx) * (u.y - my)
            |       + vx * (u.y - my) * (u.y - my))
            |    / (vx * vy - cxy * cxy), 6) AS d2
            |FROM u CROSS JOIN c
            |ORDER BY d2 DESC, user_id LIMIT 5""".stripMargin),
    (s, d) => {
      val u = userXY(s, d)
      val xd = col("x").cast("decimal(38,0)")
      val yd = col("y").cast("decimal(38,0)")
      val m = u.agg(count(lit(1)).as("n"),
        sum(xd).cast("double").as("sx"), sum(yd).cast("double").as("sy"),
        sum(xd * col("x")).cast("double").as("sxx"),
        sum(yd * col("y")).cast("double").as("syy"),
        sum(xd * col("y")).cast("double").as("sxy"))
      val c = m.select(col("n"),
        (col("sx") / col("n")).as("mx"), (col("sy") / col("n")).as("my"),
        (col("sxx") / col("n") - (col("sx") / col("n")) * (col("sx") / col("n"))).as("vx"),
        (col("syy") / col("n") - (col("sy") / col("n")) * (col("sy") / col("n"))).as("vy"),
        (col("sxy") / col("n") - (col("sx") / col("n")) * (col("sy") / col("n"))).as("cxy"))
      val dx = col("x") - col("mx")
      val dy = col("y") - col("my")
      u.crossJoin(broadcast(c))
        .select(col("user_id"), col("x"), col("y"),
          round((col("vy") * dx * dx - lit(2) * col("cxy") * dx * dy
            + col("vx") * dy * dy)
            / (col("vx") * col("vy") - col("cxy") * col("cxy")), 6).as("d2"))
        .orderBy(col("d2").desc, col("user_id"))
        .limit(5)
    })

  /** Closed-form 2-D PCA of the same (activity, spend) plane: the 2×2
    * covariance eigendecomposition is a quadratic —
    * λ = ((vx+vy) ± √((vx−vy)² + 4·cxy²))/2 — so explained-variance
    * ratio and the first component's loading ratio ((λ1−vx)/cxy) come
    * out of pure scalar arithmetic on the exact moment sums: no
    * iteration, no library eigensolver, no atan2 (whose libm spread
    * would break the oracle). The row-scale work is the single moment
    * agg; everything after is a 1-row projection. */
  val q286_pca2d = Q(
    "q286_pca2d",
    Some(s"""WITH u AS (
            |  $UserXYSql),
            |m AS (
            |  SELECT CAST(count(*) AS BIGINT) AS n,
            |    CAST(sum(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
            |    CAST(sum(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
            |    CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DOUBLE) AS sxx,
            |    CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DOUBLE) AS syy,
            |    CAST(sum(CAST(x AS DECIMAL(38,0)) * y) AS DOUBLE) AS sxy
            |  FROM u),
            |c AS (
            |  SELECT n,
            |    sxx / n - (sx / n) * (sx / n) AS vx,
            |    syy / n - (sy / n) * (sy / n) AS vy,
            |    sxy / n - (sx / n) * (sy / n) AS cxy
            |  FROM m),
            |e AS (
            |  SELECT n, vx, vy, cxy,
            |    ((vx + vy) + sqrt((vx - vy) * (vx - vy) + 4 * cxy * cxy)) / 2
            |      AS l1,
            |    ((vx + vy) - sqrt((vx - vy) * (vx - vy) + 4 * cxy * cxy)) / 2
            |      AS l2
            |  FROM c)
            |SELECT n, round(vx, 6) AS var_x, round(vy, 6) AS var_y,
            |  round(cxy, 6) AS cov_xy,
            |  round(l1, 6) AS lambda1, round(l2, 6) AS lambda2,
            |  round(l1 / (l1 + l2), 6) AS evr,
            |  round(CASE WHEN cxy <> 0 THEN (l1 - vx) / cxy ELSE 0 END, 6)
            |    AS loading_ratio
            |FROM e""".stripMargin),
    (s, d) => {
      val u = userXY(s, d)
      val xd = col("x").cast("decimal(38,0)")
      val yd = col("y").cast("decimal(38,0)")
      val m = u.agg(count(lit(1)).as("n"),
        sum(xd).cast("double").as("sx"), sum(yd).cast("double").as("sy"),
        sum(xd * col("x")).cast("double").as("sxx"),
        sum(yd * col("y")).cast("double").as("syy"),
        sum(xd * col("y")).cast("double").as("sxy"))
      val c = m.select(col("n"),
        (col("sxx") / col("n") - (col("sx") / col("n")) * (col("sx") / col("n"))).as("vx"),
        (col("syy") / col("n") - (col("sy") / col("n")) * (col("sy") / col("n"))).as("vy"),
        (col("sxy") / col("n") - (col("sx") / col("n")) * (col("sy") / col("n"))).as("cxy"))
      val disc = sqrt((col("vx") - col("vy")) * (col("vx") - col("vy"))
        + lit(4) * col("cxy") * col("cxy"))
      val e = c.select(col("n"), col("vx"), col("vy"), col("cxy"),
        (((col("vx") + col("vy")) + disc) / 2).as("l1"),
        (((col("vx") + col("vy")) - disc) / 2).as("l2"))
      e.select(col("n"), round(col("vx"), 6).as("var_x"),
        round(col("vy"), 6).as("var_y"), round(col("cxy"), 6).as("cov_xy"),
        round(col("l1"), 6).as("lambda1"), round(col("l2"), 6).as("lambda2"),
        round(col("l1") / (col("l1") + col("l2")), 6).as("evr"),
        round(when(col("cxy") =!= 0, (col("l1") - col("vx")) / col("cxy"))
          .otherwise(0.0), 6).as("loading_ratio"))
    })

  /** Two-feature OLS (order total ~ shipped quantity + line count) via
    * exact normal equations — the multivariate extension of q174's
    * single-feature fit. The per-order feature frame is one lineitem
    * hash agg joined to orders on the order key; the NINE moment sums it
    * needs are DECIMAL(38,0)-exact (quantity in exact hundredths, price
    * in exact cents — no double enters an aggregate), so the design
    * matrix X'X is bit-identical under any partitioning; the 3×3 system
    * is then solved by Cramer's rule in pure scalar doubles (identical
    * expression tree both engines). Also reports R². At 100 TB: one
    * fact-table agg + one key join + a 1-row closed form — the mergeable
    * moments law (q97/q174/q254) at one more dimension. */
  val q287_ols_multi = Q(
    "q287_ols_multi",
    Some("""WITH f AS (
           |  SELECT l_orderkey,
           |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT)
           |      AS x1,
           |    CAST(count(*) AS BIGINT) AS x2
           |  FROM lineitem GROUP BY l_orderkey),
           |o AS (
           |  SELECT f.x1, f.x2,
           |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           |      AS y
           |  FROM f JOIN orders ON o_orderkey = l_orderkey),
           |m AS (
           |  SELECT CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(CAST(x1 AS DECIMAL(38,0))) AS DOUBLE) AS s1,
           |    CAST(sum(CAST(x2 AS DECIMAL(38,0))) AS DOUBLE) AS s2,
           |    CAST(sum(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
           |    CAST(sum(CAST(x1 AS DECIMAL(38,0)) * x1) AS DOUBLE) AS s11,
           |    CAST(sum(CAST(x1 AS DECIMAL(38,0)) * x2) AS DOUBLE) AS s12,
           |    CAST(sum(CAST(x2 AS DECIMAL(38,0)) * x2) AS DOUBLE) AS s22,
           |    CAST(sum(CAST(x1 AS DECIMAL(38,0)) * y) AS DOUBLE) AS s1y,
           |    CAST(sum(CAST(x2 AS DECIMAL(38,0)) * y) AS DOUBLE) AS s2y,
           |    CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DOUBLE) AS syy
           |  FROM o),
           |s AS (
           |  SELECT n, s1, s2, sy, s11, s12, s22, s1y, s2y, syy,
           |    n * (s11 * s22 - s12 * s12)
           |      - s1 * (s1 * s22 - s12 * s2)
           |      + s2 * (s1 * s12 - s11 * s2) AS det,
           |    sy * (s11 * s22 - s12 * s12)
           |      - s1 * (s1y * s22 - s12 * s2y)
           |      + s2 * (s1y * s12 - s11 * s2y) AS det0,
           |    n * (s1y * s22 - s12 * s2y)
           |      - sy * (s1 * s22 - s12 * s2)
           |      + s2 * (s1 * s2y - s1y * s2) AS det1,
           |    n * (s11 * s2y - s1y * s12)
           |      - s1 * (s1 * s2y - s1y * s2)
           |      + sy * (s1 * s12 - s11 * s2) AS det2
           |  FROM m),
           |b AS (
           |  SELECT n, syy, sy, s1y, s2y,
           |    det0 / det AS b0, det1 / det AS b1, det2 / det AS b2
           |  FROM s)
           |SELECT n AS n_orders,
           |  round(b0, 6) AS b0, round(b1, 6) AS b1, round(b2, 6) AS b2,
           |  round(1 - (syy - b0 * sy - b1 * s1y - b2 * s2y)
           |    / (syy - sy * sy / n), 6) AS r2
           |FROM b""".stripMargin),
    (s, d) => {
      val f = Tables.lineitem(s, d)
        .groupBy("l_orderkey")
        .agg((sum(dec(col("l_quantity"))) * 100).cast("long").as("x1"),
          count(lit(1)).as("x2"))
      val o = f.join(Tables.orders(s, d),
        col("o_orderkey") === col("l_orderkey"))
        .select(col("x1"), col("x2"),
          (dec(col("o_totalprice")) * 100).cast("long").as("y"))
      def d38(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      val m = o.agg(count(lit(1)).as("n"),
        sum(d38(col("x1"))).cast("double").as("s1"),
        sum(d38(col("x2"))).cast("double").as("s2"),
        sum(d38(col("y"))).cast("double").as("sy"),
        sum(d38(col("x1")) * col("x1")).cast("double").as("s11"),
        sum(d38(col("x1")) * col("x2")).cast("double").as("s12"),
        sum(d38(col("x2")) * col("x2")).cast("double").as("s22"),
        sum(d38(col("x1")) * col("y")).cast("double").as("s1y"),
        sum(d38(col("x2")) * col("y")).cast("double").as("s2y"),
        sum(d38(col("y")) * col("y")).cast("double").as("syy"))
      val sdf = m.select(col("n"), col("s1"), col("s2"), col("sy"),
        col("s11"), col("s12"), col("s22"), col("s1y"), col("s2y"),
        col("syy"),
        (col("n") * (col("s11") * col("s22") - col("s12") * col("s12"))
          - col("s1") * (col("s1") * col("s22") - col("s12") * col("s2"))
          + col("s2") * (col("s1") * col("s12") - col("s11") * col("s2")))
          .as("det"),
        (col("sy") * (col("s11") * col("s22") - col("s12") * col("s12"))
          - col("s1") * (col("s1y") * col("s22") - col("s12") * col("s2y"))
          + col("s2") * (col("s1y") * col("s12") - col("s11") * col("s2y")))
          .as("det0"),
        (col("n") * (col("s1y") * col("s22") - col("s12") * col("s2y"))
          - col("sy") * (col("s1") * col("s22") - col("s12") * col("s2"))
          + col("s2") * (col("s1") * col("s2y") - col("s1y") * col("s2")))
          .as("det1"),
        (col("n") * (col("s11") * col("s2y") - col("s1y") * col("s12"))
          - col("s1") * (col("s1") * col("s2y") - col("s1y") * col("s2"))
          + col("sy") * (col("s1") * col("s12") - col("s11") * col("s2")))
          .as("det2"))
      val b = sdf.select(col("n"), col("syy"), col("sy"), col("s1y"),
        col("s2y"),
        (col("det0") / col("det")).as("b0"),
        (col("det1") / col("det")).as("b1"),
        (col("det2") / col("det")).as("b2"))
      b.select(col("n").as("n_orders"),
        round(col("b0"), 6).as("b0"), round(col("b1"), 6).as("b1"),
        round(col("b2"), 6).as("b2"),
        round(lit(1) - (col("syy") - col("b0") * col("sy")
          - col("b1") * col("s1y") - col("b2") * col("s2y"))
          / (col("syy") - col("sy") * col("sy") / col("n")), 6).as("r2"))
    })

  /** Seasonality strength of the daily revenue series: the STL-style
    * variance-decomposition number 1 − Var(residual)/Var(total), with
    * the seasonal component = weekday means — answers "is the weekly
    * cycle strong enough to partition training epochs by week" (the
    * decision q206's ACF hints at, as a single [0,1] statistic). Daily
    * totals are exact decimal sums; weekday means are a 7-row agg
    * broadcast back; residuals round at 6 then decimal-sum into the
    * variance moments, so the statistic is partition-order-independent.
    * Everything after the one events hash agg runs on the ≤|days| grid. */
  val q296_seasonality_strength = Q(
    "q296_seasonality_strength",
    Some("""WITH daily AS (
           |  SELECT epoch_us(ts) // 86400000000 AS day,
           |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS x
           |  FROM events GROUP BY 1),
           |wk AS (
           |  SELECT day % 7 AS w, CAST(count(*) AS BIGINT) AS nw,
           |    CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE) / count(*)
           |      AS wmean
           |  FROM daily GROUP BY 1),
           |r AS (
           |  SELECT day, x, round(x - wmean, 6) AS resid
           |  FROM daily JOIN wk ON wk.w = day % 7),
           |m AS (
           |  SELECT CAST(count(*) AS BIGINT) AS n_days,
           |    CAST(sum(CAST(round(x, 6) AS DECIMAL(28,6))) AS DOUBLE)
           |      AS sx,
           |    CAST(sum(CAST(round(x * x, 6) AS DECIMAL(28,6))) AS DOUBLE)
           |      AS sxx,
           |    CAST(sum(CAST(resid AS DECIMAL(28,6))) AS DOUBLE) AS sr,
           |    CAST(sum(CAST(round(resid * resid, 6) AS DECIMAL(28,6)))
           |      AS DOUBLE) AS srr
           |  FROM r)
           |SELECT n_days,
           |  round(sxx / n_days - (sx / n_days) * (sx / n_days), 6)
           |    AS var_total,
           |  round(srr / n_days - (sr / n_days) * (sr / n_days), 6)
           |    AS var_resid,
           |  round(greatest(0.0, 1 - (srr / n_days - (sr / n_days)
           |      * (sr / n_days))
           |    / (sxx / n_days - (sx / n_days) * (sx / n_days))), 6)
           |    AS strength
           |FROM m""".stripMargin),
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(expr("(ts div 1000) div 86400000000").as("day"))
        .agg(sum(dec(col("value"))).cast("double").as("x"))
      val wk = daily.groupBy((col("day") % 7).as("w"))
        .agg(count(lit(1)).as("nw"),
          (sum(col("x").cast("decimal(18,2)")).cast("double") /
            count(lit(1))).as("wmean"))
      val r = daily.join(broadcast(wk), col("w") === col("day") % 7)
        .select(col("day"), col("x"),
          round(col("x") - col("wmean"), 6).as("resid"))
      val m = r.agg(count(lit(1)).as("n_days"),
        sum(round(col("x"), 6).cast("decimal(28,6)")).cast("double").as("sx"),
        sum(round(col("x") * col("x"), 6).cast("decimal(28,6)"))
          .cast("double").as("sxx"),
        sum(col("resid").cast("decimal(28,6)")).cast("double").as("sr"),
        sum(round(col("resid") * col("resid"), 6).cast("decimal(28,6)"))
          .cast("double").as("srr"))
      val vt = col("sxx") / col("n_days") -
        (col("sx") / col("n_days")) * (col("sx") / col("n_days"))
      val vr = col("srr") / col("n_days") -
        (col("sr") / col("n_days")) * (col("sr") / col("n_days"))
      m.select(col("n_days"), round(vt, 6).as("var_total"),
        round(vr, 6).as("var_resid"),
        round(greatest(lit(0.0), lit(1) - vr / vt), 6).as("strength"))
    })

  val all: Seq[Q] = Seq(q271_kendall_tau, q272_sprt, q273_pettitt,
    q285_mahalanobis, q286_pca2d, q287_ols_multi,
    q296_seasonality_strength)
}
