package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.Q.dec

/** Round-9 statistics additions, part 3: t-closeness, the log-rank test,
  * difference-in-differences, Kruskal–Wallis, and Cliff's delta.
  *
  * House discipline throughout: exact integer/decimal arithmetic on the
  * corpus passes, doubles only on post-agg grids, per-row double terms
  * rounded once then decimal-summed (partition-order independent), one
  * deterministic total ORDER BY on both engines.
  */
object StatsOps4 {

  private val DayUs = 86400000000L // microseconds per day

  /** t-closeness audit (privacy family, completing q156 k-anonymity and
    * q257 l-diversity): for each quasi-identifier group (lang × 100-char
    * length bucket) the total-variation distance between the group's
    * sensitive-attribute (source) distribution and the global one. A
    * group whose TVD exceeds the policy's `t` leaks source membership
    * even when k-anonymous. Absent (group, source) cells contribute
    * q(s) to the TVD without being materialized: per present cell the
    * term is |p−q| − q, and TVD = 0.5·(Σ_present(|p−q|−q) + Σ_all q)
    * with Σ_all q = 1 — so one (g,s)-keyed agg is the only corpus pass,
    * and the zero-fill join a naive TVD needs never happens (at 100 TB
    * the absent-cell set is groups×sources and unbounded; this stays on
    * present cells only). Per-cell terms round at 6 then decimal-sum. */
  val q306_t_closeness = Q(
    "q306_t_closeness",
    Some("""WITH cells AS (
           |  SELECT lang, n_chars // 100 AS len_b, source,
           |    CAST(count(*) AS BIGINT) AS c
           |  FROM documents GROUP BY 1, 2, 3),
           |gsrc AS (
           |  SELECT source, CAST(count(*) AS BIGINT) AS n_s,
           |    CAST((SELECT count(*) FROM documents) AS BIGINT) AS n
           |  FROM documents GROUP BY source),
           |terms AS (
           |  SELECT lang, len_b,
           |    CAST(sum(c) OVER (PARTITION BY lang, len_b) AS BIGINT)
           |      AS n_g,
           |    c, CAST(n_s AS DOUBLE) / n AS q
           |  FROM cells JOIN gsrc USING (source)),
           |g AS (
           |  SELECT lang, len_b, n_g,
           |    sum(CAST(round(abs(CAST(c AS DOUBLE) / n_g - q) - q, 6)
           |      AS DECIMAL(28,6))) AS s
           |  FROM terms GROUP BY 1, 2, 3)
           |SELECT lang, len_b, n_g,
           |  round(0.5 * (CAST(s AS DOUBLE) + 1), 6) AS tvd
           |FROM g ORDER BY tvd DESC, lang, len_b""".stripMargin),
    (s, d) => {
      val docs = Tables.documents(s, d)
      val cells = docs
        .groupBy(col("lang"), expr("n_chars div 100").as("len_b"),
          col("source"))
        .agg(count(lit(1)).as("c"))
      val glob = docs.groupBy("source").agg(count(lit(1)).as("n_s"))
      val tot = docs.agg(count(lit(1)).as("n"))
      val wg = Window.partitionBy("lang", "len_b")
      val terms = cells
        .join(broadcast(glob), "source")
        .crossJoin(broadcast(tot))
        .select(col("lang"), col("len_b"),
          sum("c").over(wg).as("n_g"), col("c"),
          (col("n_s").cast("double") / col("n")).as("q"))
      terms
        .groupBy("lang", "len_b", "n_g")
        .agg(sum(round(abs(col("c").cast("double") / col("n_g") - col("q"))
          - col("q"), 6).cast("decimal(28,6)")).as("s"))
        .select(col("lang"), col("len_b"), col("n_g"),
          round(lit(0.5) * (col("s").cast("double") + 1), 6).as("tvd"))
        .orderBy(col("tvd").desc, col("lang"), col("len_b"))
    })

  /** Log-rank test between the q301 md5 arms on time-to-first-purchase
    * (completing q225's Kaplan–Meier curve with the two-sample TEST a
    * retention experiment actually reads): per user, duration from first
    * event to first purchase, censored at the corpus max timestamp. The
    * day × arm risk table is one user-keyed agg + one day-grid agg;
    * at-risk counts come from cumulative windows ON THE DAY GRID (a few
    * hundred rows at any corpus scale — the corpus passes stay
    * window-free). Expected-death and variance terms are per-day doubles
    * rounded at 6 and decimal-summed; observed deaths stay exact BIGINT.
    * χ² = (O₁−E₁)²/V against χ²₁ off-engine (no p-value: the χ² CDF is
    * not bit-stable across libm builds, q300's convention). */
  val q307_log_rank = Q(
    "q307_log_rank", {
      import graft.functions.TextFunctions.hexSpanValSql
      val arm = s"${hexSpanValSql("md5(CAST(user_id AS VARCHAR))", 0, 2)} % 2"
      Some(s"""WITH mx AS (
              |  SELECT CAST(max(epoch_us(ts)) AS BIGINT) AS mxus FROM events),
              |u AS (
              |  SELECT user_id, $arm AS arm,
              |    CAST(min(epoch_us(ts)) AS BIGINT) AS t0,
              |    CAST(min(CASE WHEN event_type = 'purchase'
              |      THEN epoch_us(ts) END) AS BIGINT) AS tp
              |  FROM events GROUP BY 1, 2),
              |durs AS (
              |  SELECT arm, (COALESCE(tp, mxus) - t0) // $DayUs AS day,
              |    CASE WHEN tp IS NULL THEN 0 ELSE 1 END AS ev
              |  FROM u CROSS JOIN mx),
              |grid AS (
              |  SELECT day,
              |    CAST(sum(CASE WHEN arm = 1 THEN ev ELSE 0 END) AS BIGINT)
              |      AS d1,
              |    CAST(sum(CASE WHEN arm = 0 THEN ev ELSE 0 END) AS BIGINT)
              |      AS d0,
              |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
              |      AS l1,
              |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
              |      AS l0
              |  FROM durs GROUP BY day),
              |risk AS (
              |  SELECT day, d1, d0,
              |    sum(l1) OVER all_g - COALESCE(sum(l1) OVER prior, 0) AS n1,
              |    sum(l0) OVER all_g - COALESCE(sum(l0) OVER prior, 0) AS n0
              |  FROM grid
              |  WINDOW prior AS (ORDER BY day
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              |    all_g AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
              |      AND UNBOUNDED FOLLOWING)),
              |terms AS (
              |  SELECT d1, d0,
              |    round((d1 + d0) * CAST(n1 AS DOUBLE) / (n1 + n0), 6)
              |      AS e1_t,
              |    round((d1 + d0) * (CAST(n1 AS DOUBLE) / (n1 + n0))
              |      * (CAST(n0 AS DOUBLE) / (n1 + n0))
              |      * (n1 + n0 - d1 - d0) / (n1 + n0 - 1), 6) AS v_t
              |  FROM risk WHERE d1 + d0 > 0 AND n1 + n0 > 1),
              |m AS (
              |  SELECT CAST(sum(d1) AS BIGINT) AS o1,
              |    CAST(sum(d0) AS BIGINT) AS o0,
              |    CAST(sum(CAST(e1_t AS DECIMAL(28,6))) AS DOUBLE) AS e1,
              |    CAST(sum(CAST(v_t AS DECIMAL(28,6))) AS DOUBLE) AS v
              |  FROM terms)
              |SELECT o1, o0, round(e1, 6) AS e1,
              |  round(CAST(o1 + o0 AS DOUBLE) - e1, 6) AS e0,
              |  round(v, 6) AS var,
              |  round((o1 - e1) * (o1 - e1) / v, 6) AS chi2
              |FROM m""".stripMargin)
    },
    (s, d) => {
      import graft.functions.TextFunctions.hexSpanValSql
      val ev = Tables.events(s, d)
      val mx = ev.agg(max(expr("ts div 1000")).as("mxus"))
      val u = ev
        .withColumn("__h", md5(col("user_id").cast("string")))
        .groupBy(col("user_id"),
          (expr(hexSpanValSql("__h", 0, 2)) % 2).as("arm"))
        .agg(min(expr("ts div 1000")).as("t0"),
          min(when(col("event_type") === "purchase", expr("ts div 1000")))
            .as("tp"))
      val durs = u.crossJoin(broadcast(mx))
        .select(col("arm"),
          expr(s"(COALESCE(tp, mxus) - t0) div $DayUs").as("day"),
          when(col("tp").isNull, 0).otherwise(1).as("ev"))
      val grid = durs.groupBy("day").agg(
        sum(when(col("arm") === 1, col("ev")).otherwise(0)).as("d1"),
        sum(when(col("arm") === 0, col("ev")).otherwise(0)).as("d0"),
        sum(when(col("arm") === 1, 1).otherwise(0)).as("l1"),
        sum(when(col("arm") === 0, 1).otherwise(0)).as("l0"))
      val prior = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
      val allG = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val risk = grid.select(col("day"), col("d1"), col("d0"),
        (sum("l1").over(allG) - coalesce(sum("l1").over(prior), lit(0L)))
          .as("n1"),
        (sum("l0").over(allG) - coalesce(sum("l0").over(prior), lit(0L)))
          .as("n0"))
      val n = col("n1") + col("n0")
      val dTot = col("d1") + col("d0")
      val terms = risk
        .filter(dTot > 0 && n > 1)
        .select(col("d1"), col("d0"),
          round(dTot * col("n1").cast("double") / n, 6).as("e1_t"),
          round(dTot * (col("n1").cast("double") / n) *
            (col("n0").cast("double") / n) * (n - dTot) / (n - 1), 6)
            .as("v_t"))
      val m = terms.agg(sum("d1").cast("long").as("o1"),
        sum("d0").cast("long").as("o0"),
        sum(col("e1_t").cast("decimal(28,6)")).cast("double").as("e1"),
        sum(col("v_t").cast("decimal(28,6)")).cast("double").as("v"))
      m.select(col("o1"), col("o0"), round(col("e1"), 6).as("e1"),
        round((col("o1") + col("o0")).cast("double") - col("e1"), 6)
          .as("e0"),
        round(col("v"), 6).as("var"),
        round((col("o1") - col("e1")) * (col("o1") - col("e1")) / col("v"),
          6).as("chi2"))
    })

  /** Difference-in-differences on the q305 confounded "treatment"
    * (high-activity users): pre/post = events before/after the corpus
    * midpoint day. The naive post-period treated-minus-control gap
    * carries the activity→spend confound; DiD subtracts each group's own
    * pre-period mean, removing every time-invariant user-level
    * difference — the panel-data counterpart to q305's IPW. One
    * user-keyed agg (treatment), one join back, one 8-way conditional
    * agg over exact cent sums; all four cell means plus both estimators
    * come from that single row. */
  val q308_did = Q(
    "q308_did",
    Some("""WITH span AS (
           |  SELECT (CAST(min(epoch_us(ts)) // 86400000000 AS BIGINT)
           |    + CAST(max(epoch_us(ts)) // 86400000000 AS BIGINT)) // 2
           |    AS mid_day
           |  FROM events),
           |uu AS (
           |  SELECT user_id,
           |    CASE WHEN count(*) > 66 THEN 1 ELSE 0 END AS treat
           |  FROM events GROUP BY user_id),
           |t AS (
           |  SELECT uu.treat,
           |    CASE WHEN epoch_us(ts) // 86400000000 >= mid_day
           |      THEN 1 ELSE 0 END AS post,
           |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
           |  FROM events JOIN uu USING (user_id) CROSS JOIN span),
           |m AS (
           |  SELECT
           |    CAST(sum(CASE WHEN treat = 1 AND post = 1 THEN y END)
           |      AS DOUBLE) / sum(CASE WHEN treat = 1 AND post = 1
           |      THEN 1 ELSE 0 END) / 100 AS tp,
           |    CAST(sum(CASE WHEN treat = 1 AND post = 0 THEN y END)
           |      AS DOUBLE) / sum(CASE WHEN treat = 1 AND post = 0
           |      THEN 1 ELSE 0 END) / 100 AS tq,
           |    CAST(sum(CASE WHEN treat = 0 AND post = 1 THEN y END)
           |      AS DOUBLE) / sum(CASE WHEN treat = 0 AND post = 1
           |      THEN 1 ELSE 0 END) / 100 AS cp,
           |    CAST(sum(CASE WHEN treat = 0 AND post = 0 THEN y END)
           |      AS DOUBLE) / sum(CASE WHEN treat = 0 AND post = 0
           |      THEN 1 ELSE 0 END) / 100 AS cq,
           |    CAST(count(*) AS BIGINT) AS n
           |  FROM t)
           |SELECT n, round(tq, 6) AS mean_treat_pre,
           |  round(tp, 6) AS mean_treat_post,
           |  round(cq, 6) AS mean_ctrl_pre, round(cp, 6) AS mean_ctrl_post,
           |  round(tp - cp, 6) AS naive_post_diff,
           |  round((tp - tq) - (cp - cq), 6) AS did
           |FROM m""".stripMargin),
    (s, d) => {
      val ev = Tables.events(s, d)
      val day = expr(s"(ts div 1000) div $DayUs")
      val span = ev.agg(
        ((min(day) + max(day)) / 2).cast("long").as("mid_day"))
      val uu = ev.groupBy("user_id")
        .agg(when(count(lit(1)) > 66, 1).otherwise(0).as("treat"))
      val t = ev.join(uu, "user_id").crossJoin(broadcast(span))
        .select(col("treat"),
          when(day >= col("mid_day"), 1).otherwise(0).as("post"),
          (dec(col("value")) * 100).cast("long").as("y"))
      def cell(tr: Int, po: Int) =
        sum(when(col("treat") === tr && col("post") === po, col("y")))
          .cast("double") /
          sum(when(col("treat") === tr && col("post") === po, 1)
            .otherwise(0)) / 100
      val m = t.agg(cell(1, 1).as("tp"), cell(1, 0).as("tq"),
        cell(0, 1).as("cp"), cell(0, 0).as("cq"),
        count(lit(1)).as("n"))
      m.select(col("n"), round(col("tq"), 6).as("mean_treat_pre"),
        round(col("tp"), 6).as("mean_treat_post"),
        round(col("cq"), 6).as("mean_ctrl_pre"),
        round(col("cp"), 6).as("mean_ctrl_post"),
        round(col("tp") - col("cp"), 6).as("naive_post_diff"),
        round((col("tp") - col("tq")) - (col("cp") - col("cq")), 6)
          .as("did"))
    })

  /** Kruskal–Wallis H across the five event types on `value` — the
    * rank-based counterpart to q300's ANOVA F (valid when spend is as
    * skewed as real spend is). All ranking happens on the DISTINCT-value
    * grid: average ranks are kept exact as 2·rank = 2·cum_before + c + 1
    * (integers), per-group rank sums stay BIGINT, and the only doubles
    * are the final closed-form H, the tie correction
    * C = 1 − Σ(c³−c)/(N³−N), and H/C — identical arithmetic from
    * identical exact integers on both engines. No corpus-wide sort: the
    * one ORDER BY window runs on the value grid (≤ ~10⁵ rows at any
    * corpus scale for 2-decimal values). */
  val q309_kruskal_wallis = Q(
    "q309_kruskal_wallis",
    Some("""WITH v AS (
           |  SELECT CAST(value AS DECIMAL(18,2)) AS val, event_type,
           |    CAST(count(*) AS BIGINT) AS c
           |  FROM events GROUP BY 1, 2),
           |g AS (
           |  SELECT val, CAST(sum(c) AS BIGINT) AS c
           |  FROM v GROUP BY val),
           |r AS (
           |  SELECT val,
           |    2 * COALESCE(sum(c) OVER (ORDER BY val
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |      + c + 1 AS rank2,
           |    c * c * c - c AS tie_t
           |  FROM g),
           |pg AS (
           |  SELECT event_type, CAST(sum(v.c) AS BIGINT) AS n_j,
           |    CAST(sum(v.c * r.rank2) AS BIGINT) AS r2_j
           |  FROM v JOIN r USING (val) GROUP BY event_type),
           |tot AS (
           |  SELECT CAST(sum(n_j) AS BIGINT) AS n,
           |    CAST(count(*) AS BIGINT) AS k,
           |    sum(CAST(r2_j AS DOUBLE) * r2_j / (4 * n_j)) AS sr
           |  FROM pg),
           |ties AS (SELECT CAST(sum(tie_t) AS BIGINT) AS tt FROM r),
           |m AS (
           |  SELECT n, k,
           |    12.0 / (CAST(n AS DOUBLE) * (n + 1)) * sr - 3.0 * (n + 1)
           |      AS h,
           |    1.0 - CAST(tt AS DOUBLE)
           |      / (CAST(n AS DOUBLE) * n * n - n) AS cc
           |  FROM tot CROSS JOIN ties)
           |SELECT n, k, CAST(k - 1 AS BIGINT) AS df, round(h, 6) AS h,
           |  round(cc, 9) AS tie_c, round(h / cc, 6) AS h_adj
           |FROM m""".stripMargin),
    (s, d) => {
      val v = Tables.events(s, d)
        .groupBy(dec(col("value")).as("val"), col("event_type"))
        .agg(count(lit(1)).as("c"))
      val g = v.groupBy("val").agg(sum("c").as("c"))
      val prior = Window.orderBy("val")
        .rowsBetween(Window.unboundedPreceding, -1)
      val r = g.select(col("val"),
        (lit(2) * coalesce(sum("c").over(prior), lit(0L)) + col("c") + 1)
          .as("rank2"),
        (col("c") * col("c") * col("c") - col("c")).as("tie_t"))
      val pg = v.join(r.select("val", "rank2"), "val")
        .groupBy("event_type")
        .agg(sum("c").cast("long").as("n_j"),
          sum(col("c") * col("rank2")).cast("long").as("r2_j"))
      val tot = pg.agg(sum("n_j").cast("long").as("n"),
        count(lit(1)).as("k"),
        sum(col("r2_j").cast("double") * col("r2_j") / (lit(4) * col("n_j")))
          .as("sr"))
      val ties = r.agg(sum("tie_t").cast("long").as("tt"))
      val m = tot.crossJoin(broadcast(ties))
        .select(col("n"), col("k"),
          (lit(12.0) / (col("n").cast("double") * (col("n") + 1)) *
            col("sr") - lit(3.0) * (col("n") + 1)).as("h"),
          (lit(1.0) - col("tt").cast("double") /
            (col("n").cast("double") * col("n") * col("n") - col("n")))
            .as("cc"))
      m.select(col("n"), col("k"), (col("k") - 1).cast("long").as("df"),
        round(col("h"), 6).as("h"), round(col("cc"), 9).as("tie_c"),
        round(col("h") / col("cc"), 6).as("h_adj"))
    })

  /** Cliff's delta between click and purchase values — the
    * distribution-free effect size q304's power analysis wants when
    * means mislead: δ = (#(x>y) − #(x<y)) / (n₁·n₂), computed entirely
    * from the distinct-value grid (per value: click count × cumulative
    * purchase count strictly below it), so the n₁·n₂ pair space is never
    * materialized and every count stays exact BIGINT. The magnitude
    * label applies the conventional |δ| thresholds .147/.33/.474. */
  val q310_cliffs_delta = Q(
    "q310_cliffs_delta",
    Some("""WITH v AS (
           |  SELECT CAST(value AS DECIMAL(18,2)) AS val,
           |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
           |      AS BIGINT) AS c1,
           |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           |      AS BIGINT) AS c2
           |  FROM events WHERE event_type IN ('click', 'purchase')
           |  GROUP BY 1),
           |r AS (
           |  SELECT c1, c2,
           |    COALESCE(sum(c2) OVER (ORDER BY val
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |      AS cum2,
           |    sum(c2) OVER (ORDER BY val ROWS BETWEEN UNBOUNDED PRECEDING
           |      AND UNBOUNDED FOLLOWING) AS n2
           |  FROM v),
           |m AS (
           |  SELECT CAST(sum(c1) AS BIGINT) AS n1,
           |    CAST(max(n2) AS BIGINT) AS n2,
           |    CAST(sum(c1 * cum2) AS BIGINT) AS gt,
           |    CAST(sum(c1 * (n2 - cum2 - c2)) AS BIGINT) AS lt
           |  FROM r)
           |SELECT n1, n2, gt, lt,
           |  round(CAST(gt - lt AS DOUBLE) / (n1 * n2), 6) AS delta,
           |  CASE
           |    WHEN abs(CAST(gt - lt AS DOUBLE) / (n1 * n2)) < 0.147
           |      THEN 'negligible'
           |    WHEN abs(CAST(gt - lt AS DOUBLE) / (n1 * n2)) < 0.33
           |      THEN 'small'
           |    WHEN abs(CAST(gt - lt AS DOUBLE) / (n1 * n2)) < 0.474
           |      THEN 'medium'
           |    ELSE 'large' END AS magnitude
           |FROM m""".stripMargin),
    (s, d) => {
      val v = Tables.events(s, d)
        .filter(col("event_type").isin("click", "purchase"))
        .groupBy(dec(col("value")).as("val"))
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("c1"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("c2"))
      val prior = Window.orderBy("val")
        .rowsBetween(Window.unboundedPreceding, -1)
      val allG = Window.orderBy("val")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val r = v.select(col("c1"), col("c2"),
        coalesce(sum("c2").over(prior), lit(0L)).as("cum2"),
        sum("c2").over(allG).as("n2"))
      val m = r.agg(sum("c1").cast("long").as("n1"),
        max("n2").cast("long").as("n2"),
        sum(col("c1") * col("cum2")).cast("long").as("gt"),
        sum(col("c1") * (col("n2") - col("cum2") - col("c2")))
          .cast("long").as("lt"))
      val delta = (col("gt") - col("lt")).cast("double") /
        (col("n1") * col("n2"))
      m.select(col("n1"), col("n2"), col("gt"), col("lt"),
        round(delta, 6).as("delta"),
        when(abs(delta) < 0.147, "negligible")
          .when(abs(delta) < 0.33, "small")
          .when(abs(delta) < 0.474, "medium")
          .otherwise("large").as("magnitude"))
    })

  /** Bradley–Terry strengths from pairwise comparisons — the preference-
    * data fitter an RLHF pipeline runs over A-vs-B judgments. Comparisons
    * derive deterministically from the corpus: per user, event type A
    * "beats" B when the user's exact decimal spend on A exceeds B (ties
    * drop; both-present pairs only). Three unrolled
    * minorization–maximization iterations run on the k×k pair grid
    * (k = 5 event types): p_i ← W_i / Σ_j n_ij/(p_i+p_j), then
    * sum-normalized to k. The corpus contributes ONE user×type agg and
    * ONE user-keyed pair self-join; every iteration is grid-only
    * arithmetic. Per-term doubles round at 9 then decimal-sum so the
    * Σ_j fold is partial-agg-order independent on both engines. */
  val q315_bradley_terry = Q(
    "q315_bradley_terry", {
      def iter(i: Int, prev: String) =
        s"""d$i AS (
           |  SELECT dirn.i AS t,
           |    CAST(sum(CAST(round(dirn.n / (pi.p + pj.p), 9)
           |      AS DECIMAL(28,9))) AS DOUBLE) AS dsum
           |  FROM dirn JOIN $prev pi ON pi.t = dirn.i
           |            JOIN $prev pj ON pj.t = dirn.j
           |  GROUP BY dirn.i),
           |praw$i AS (
           |  SELECT w.t, round(w.w / d.dsum, 9) AS praw
           |  FROM wtot w JOIN d$i d ON d.t = w.t),
           |p$i AS (
           |  SELECT t, round(praw * (SELECT count(*) FROM wtot)
           |    / (SELECT CAST(sum(CAST(praw AS DECIMAL(28,9))) AS DOUBLE)
           |       FROM praw$i), 9) AS p
           |  FROM praw$i)""".stripMargin
      Some(s"""WITH ut AS (
              |  SELECT user_id, event_type,
              |    sum(CAST(value AS DECIMAL(18,2))) AS s
              |  FROM events GROUP BY 1, 2),
              |pairs AS (
              |  SELECT a.event_type AS ta, b.event_type AS tb,
              |    CAST(count(*) AS BIGINT) AS n,
              |    CAST(sum(CASE WHEN a.s > b.s THEN 1 ELSE 0 END)
              |      AS BIGINT) AS wa
              |  FROM ut a JOIN ut b
              |    ON a.user_id = b.user_id AND a.event_type < b.event_type
              |  WHERE a.s <> b.s
              |  GROUP BY 1, 2),
              |dirn AS (
              |  SELECT ta AS i, tb AS j, n, wa AS w FROM pairs
              |  UNION ALL
              |  SELECT tb AS i, ta AS j, n, n - wa AS w FROM pairs),
              |wtot AS (
              |  SELECT i AS t, CAST(sum(n) AS BIGINT) AS games,
              |    CAST(sum(w) AS BIGINT) AS wins,
              |    CAST(sum(w) AS DOUBLE) AS w
              |  FROM dirn GROUP BY i),
              |p0 AS (SELECT t, CAST(1 AS DOUBLE) AS p FROM wtot),
              |${iter(1, "p0")},
              |${iter(2, "p1")},
              |${iter(3, "p2")}
              |SELECT w.t AS event_type, w.games, w.wins, p3.p AS strength
              |FROM wtot w JOIN p3 ON p3.t = w.t
              |ORDER BY strength DESC, event_type""".stripMargin)
    },
    (s, d) => {
      val ut = Tables.events(s, d)
        .groupBy("user_id", "event_type")
        .agg(sum(dec(col("value"))).as("s"))
      val a = ut.select(col("user_id"), col("event_type").as("ta"),
        col("s").as("sa"))
      val b = ut.select(col("user_id"), col("event_type").as("tb"),
        col("s").as("sb"))
      val pairs = a.join(b, Seq("user_id"))
        .filter(col("ta") < col("tb") && col("sa") =!= col("sb"))
        .groupBy("ta", "tb")
        .agg(count(lit(1)).as("n"),
          sum(when(col("sa") > col("sb"), 1L).otherwise(0L)).as("wa"))
      val dirn = graft.operators.PlanCache.persist(
        pairs.select(col("ta").as("i"), col("tb").as("j"), col("n"),
          col("wa").as("w"))
          .union(pairs.select(col("tb").as("i"), col("ta").as("j"),
            col("n"), (col("n") - col("wa")).as("w"))))
      // ADJUDICATED COLLECT (the Similarity.scala:262 regime): the
      // directed pair grid has k·(k−1) rows where k = |event_type|
      // domain (5 here; bounded by the type vocabulary at ANY corpus
      // size) — index metadata, not data. Running the 3 MM iterations
      // as a DataFrame chain cost ~12 tiny jobs (7.4 s of pure
      // scheduling in the isolated bench); on the collected grid the
      // iterations are microseconds. Arithmetic replicates the engines'
      // round() (BigDecimal HALF_UP on the double) and decimal-sums
      // each Σ_j fold, so the strengths are bit-identical to the SQL
      // oracle's CTE replay.
      val grid = dirn.collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      def r9(x: Double): Double =
        java.math.BigDecimal.valueOf(x)
          .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
      val types = grid.map(_._1).distinct.sorted
      val games = types.map(t => t -> grid.filter(_._1 == t).map(_._3).sum)
        .toMap
      val wins = types.map(t => t -> grid.filter(_._1 == t).map(_._4).sum)
        .toMap
      var p = types.map(_ -> 1.0).toMap
      for (_ <- 1 to 3) {
        val praw = types.map { t =>
          val dsum = grid.filter(_._1 == t)
            .map(e => java.math.BigDecimal.valueOf(
              r9(e._3.toDouble / (p(t) + p(e._2)))))
            .foldLeft(java.math.BigDecimal.ZERO)(_.add(_)).doubleValue()
          t -> r9(wins(t).toDouble / dsum)
        }.toMap
        val sp = types.map(t => java.math.BigDecimal.valueOf(praw(t)))
          .foldLeft(java.math.BigDecimal.ZERO)(_.add(_)).doubleValue()
        p = types.map(t => t -> r9(praw(t) * types.length / sp)).toMap
      }
      val out = types.map(t => (t, games(t), wins(t), p(t)))
      s.createDataFrame(out.toIndexedSeq)
        .toDF("event_type", "games", "wins", "strength")
        .orderBy(col("strength").desc, col("event_type"))
    })

  val all: Seq[Q] = Seq(q306_t_closeness, q307_log_rank, q308_did,
    q309_kruskal_wallis, q310_cliffs_delta, q315_bradley_terry)
}
