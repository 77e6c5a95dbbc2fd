package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions.hexSpanValSql

/** Round-11 statistics additions: equivalence testing (TOST), paired
  * classifier comparison (McNemar), multi-rater agreement (Fleiss κ),
  * and the parallel-variance merge law (Chan et al. 1979) — the second-
  * moment counterpart of q358's quantile merge law.
  */
object StatsOps7 {

  /** TOST equivalence test between the md5 experiment arms on mean
    * event value — the readout a "did the refactor change anything"
    * guardrail actually needs: q270's z can only FAIL to reject
    * difference; TOST positively demonstrates equivalence within a
    * margin. Two one-sided z statistics against ±δ (δ = 2.0, shared
    * literal); equivalent iff BOTH exceed 1.645 (α = 0.05). Moments per
    * arm are exact decimal sums (Σx at scale 2, Σx² at scale 4 — both
    * closed under addition, partial-agg-order-proof); the Welch
    * standard error and the two z's are one shared double expression
    * tree over the exact sums.
    *
    * Scale shape: one row-scale hash agg to 2 arm rows, scalar
    * arithmetic after — the same shape at any corpus size. */
  val q432_tost_equivalence = Q(
    "q432_tost_equivalence", {
      val arm = s"${hexSpanValSql("md5(CAST(user_id AS VARCHAR))", 0, 2)} % 2"
      Some(s"""WITH x AS (
              |  SELECT $arm AS arm,
              |    CAST(value AS DECIMAL(18,2)) AS v
              |  FROM events),
              |m AS (
              |  SELECT
              |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
              |      AS n0,
              |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
              |      AS n1,
              |    CAST(sum(CASE WHEN arm = 0 THEN v END) AS DOUBLE) AS s0,
              |    CAST(sum(CASE WHEN arm = 1 THEN v END) AS DOUBLE) AS s1,
              |    CAST(sum(CASE WHEN arm = 0 THEN CAST(v * v AS DECIMAL(38,4))
              |      END) AS DOUBLE) AS q0,
              |    CAST(sum(CASE WHEN arm = 1 THEN CAST(v * v AS DECIMAL(38,4))
              |      END) AS DOUBLE) AS q1
              |  FROM x),
              |t AS (
              |  SELECT n0, n1,
              |    s1 / n1 - s0 / n0 AS d,
              |    sqrt(((q0 - s0 * s0 / n0) / (n0 - 1)) / n0
              |       + ((q1 - s1 * s1 / n1) / (n1 - 1)) / n1) AS se
              |  FROM m)
              |SELECT n0, n1, round(d, 6) AS diff,
              |  round(se, 6) AS se,
              |  round((d + 2.0) / se, 6) AS z_lower,
              |  round((2.0 - d) / se, 6) AS z_upper,
              |  CASE WHEN (d + 2.0) / se > 1.645 AND (2.0 - d) / se > 1.645
              |    THEN 1 ELSE 0 END AS equivalent
              |FROM t""".stripMargin)
    },
    (s, d) => {
      val x = Tables.events(s, d)
        .withColumn("__h", md5(col("user_id").cast("string")))
        .select((expr(hexSpanValSql("__h", 0, 2)) % 2).as("arm"),
          Q.dec(col("value")).as("v"))
      val m = x.agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("arm") === 0, col("v"))).cast("double").as("s0"),
        sum(when(col("arm") === 1, col("v"))).cast("double").as("s1"),
        sum(when(col("arm") === 0,
          (col("v") * col("v")).cast("decimal(38,4)"))).cast("double")
          .as("q0"),
        sum(when(col("arm") === 1,
          (col("v") * col("v")).cast("decimal(38,4)"))).cast("double")
          .as("q1"))
      val dMean = col("s1") / col("n1") - col("s0") / col("n0")
      val se = sqrt(((col("q0") - col("s0") * col("s0") / col("n0"))
          / (col("n0") - 1)) / col("n0")
        + ((col("q1") - col("s1") * col("s1") / col("n1"))
          / (col("n1") - 1)) / col("n1"))
      m.select(col("n0"), col("n1"),
        round(dMean, 6).as("diff"), round(se, 6).as("se"),
        round((dMean + lit(2.0)) / se, 6).as("z_lower"),
        round((lit(2.0) - dMean) / se, 6).as("z_upper"),
        when((dMean + lit(2.0)) / se > 1.645 &&
          (lit(2.0) - dMean) / se > 1.645, 1).otherwise(0).as("equivalent"))
    })

  /** McNemar's test on PAIRED classifier disagreements — the correct
    * way to compare two rules evaluated on the SAME documents (a
    * two-proportion z over the same rows double-counts the concordant
    * mass): two deterministic language-ID heuristics (token "the"
    * present vs ≥ 2 "a" tokens) against the gold lang = 'en' label.
    * Only the discordant cells matter: χ² = (|b−c|−1)²/(b+c) with
    * continuity correction, vs the 3.841 α=0.05 critical value; b+c = 0
    * reports 0 by guard. Exact BIGINT cells; one double expression.
    *
    * Scale shape: per-row flags in the scan, one 4-cell roll-up. */
  val q433_mcnemar = Q(
    "q433_mcnemar",
    Some("""WITH r AS (
           |  SELECT
           |    CASE WHEN ' ' || text || ' ' LIKE '% the %' THEN 1 ELSE 0 END
           |      AS pred_a,
           |    CASE WHEN len(list_filter(string_split(text, ' '),
           |      t -> t = 'a')) >= 2 THEN 1 ELSE 0 END AS pred_b,
           |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS gold
           |  FROM documents),
           |c AS (
           |  SELECT
           |    CAST(sum(CASE WHEN pred_a = gold AND pred_b = gold
           |      THEN 1 ELSE 0 END) AS BIGINT) AS both_right,
           |    CAST(sum(CASE WHEN pred_a = gold AND pred_b <> gold
           |      THEN 1 ELSE 0 END) AS BIGINT) AS b,
           |    CAST(sum(CASE WHEN pred_a <> gold AND pred_b = gold
           |      THEN 1 ELSE 0 END) AS BIGINT) AS c,
           |    CAST(sum(CASE WHEN pred_a <> gold AND pred_b <> gold
           |      THEN 1 ELSE 0 END) AS BIGINT) AS both_wrong
           |  FROM r)
           |SELECT both_right, b, c, both_wrong,
           |  round(CASE WHEN b + c > 0
           |    THEN (abs(CAST(b AS DOUBLE) - c) - 1)
           |       * (abs(CAST(b AS DOUBLE) - c) - 1) / (b + c)
           |    ELSE 0 END, 6) AS chi2,
           |  CASE WHEN b + c > 0 AND
           |    (abs(CAST(b AS DOUBLE) - c) - 1)
           |      * (abs(CAST(b AS DOUBLE) - c) - 1) / (b + c) > 3.841
           |    THEN 1 ELSE 0 END AS differ
           |FROM c""".stripMargin),
    (s, d) => {
      val toks = split(col("text"), " ")
      val r = Tables.documents(s, d).select(
        when(concat(lit(" "), col("text"), lit(" ")).like("% the %"), 1)
          .otherwise(0).as("pred_a"),
        when(size(filter(toks, t => t === "a")) >= 2, 1).otherwise(0)
          .as("pred_b"),
        when(col("lang") === "en", 1).otherwise(0).as("gold"))
      val c = r.agg(
        sum(when(col("pred_a") === col("gold") &&
          col("pred_b") === col("gold"), 1L).otherwise(0L)).as("both_right"),
        sum(when(col("pred_a") === col("gold") &&
          col("pred_b") =!= col("gold"), 1L).otherwise(0L)).as("b"),
        sum(when(col("pred_a") =!= col("gold") &&
          col("pred_b") === col("gold"), 1L).otherwise(0L)).as("c"),
        sum(when(col("pred_a") =!= col("gold") &&
          col("pred_b") =!= col("gold"), 1L).otherwise(0L)).as("both_wrong"))
      val chi2 = (abs(col("b").cast("double") - col("c")) - 1) *
        (abs(col("b").cast("double") - col("c")) - 1) / (col("b") + col("c"))
      c.select(col("both_right"), col("b"), col("c"), col("both_wrong"),
        round(when(col("b") + col("c") > 0, chi2).otherwise(0), 6)
          .as("chi2"),
        when(col("b") + col("c") > 0 && chi2 > 3.841, 1).otherwise(0)
          .as("differ"))
    })

  /** Fleiss' κ over THREE deterministic quality raters (length ≥ 300
    * chars; stopword ratio ≥ 0.05 over the/a/of; mean token length
    * ≥ 4.0) rating every document high/low — the multi-rater
    * generalization of q247's two-rater Cohen κ, the agreement number a
    * labeling pipeline reads before trusting a rule ensemble. Per doc
    * the 3 ratings collapse to k = #high ∈ {0..3}; P̄ = mean pairwise
    * agreement Σ(k²+(3−k)²−3)/6 and P̄e from the pooled category shares,
    * all from exact BIGINT counts (the k-histogram has 4 cells), one
    * shared double κ expression.
    *
    * Scale shape: scan-side flags → one doc-keyed projection (no
    * shuffle: k is computed per row) → a 4-cell histogram agg. */
  val q434_fleiss_kappa = Q(
    "q434_fleiss_kappa",
    Some("""WITH r AS (
           |  SELECT
           |    (CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END) +
           |    (CASE WHEN len(list_filter(string_split(text, ' '),
           |       t -> t IN ('the', 'a', 'of')))
           |       * 1.0 / len(string_split(text, ' ')) >= 0.05
           |       THEN 1 ELSE 0 END) +
           |    (CASE WHEN n_chars * 1.0
           |       / (1 + len(string_split(text, ' '))) >= 4.0
           |       THEN 1 ELSE 0 END) AS k
           |  FROM documents),
           |h AS (
           |  SELECT CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(k) AS BIGINT) AS high,
           |    CAST(sum(3 - k) AS BIGINT) AS low,
           |    CAST(sum(k * k + (3 - k) * (3 - k) - 3) AS BIGINT) AS agr
           |  FROM r),
           |t AS (
           |  SELECT n, high, low,
           |    CAST(agr AS DOUBLE) / (n * 6) AS pbar,
           |    (CAST(high AS DOUBLE) / (3 * n)) * (CAST(high AS DOUBLE) / (3 * n))
           |    + (CAST(low AS DOUBLE) / (3 * n)) * (CAST(low AS DOUBLE) / (3 * n))
           |      AS pe
           |  FROM h)
           |SELECT n, high, low, round(pbar, 6) AS p_bar,
           |  round(pe, 6) AS p_e,
           |  round((pbar - pe) / (1 - pe), 6) AS kappa
           |FROM t""".stripMargin),
    (s, d) => {
      val toks = split(col("text"), " ")
      val stopN = size(filter(toks,
        t => t === "the" || t === "a" || t === "of"))
      val k = (when(col("n_chars") >= 300, 1).otherwise(0)
        + when(stopN * lit(1.0) / size(toks) >= 0.05, 1).otherwise(0)
        + when(col("n_chars") * lit(1.0) / (size(toks) + 1) >= 4.0, 1)
          .otherwise(0)).as("k")
      val h = Tables.documents(s, d).select(k)
        .agg(count(lit(1)).as("n"),
          sum("k").cast("long").as("high"),
          sum(lit(3) - col("k")).cast("long").as("low"),
          sum(col("k") * col("k") + (lit(3) - col("k")) *
            (lit(3) - col("k")) - 3).cast("long").as("agr"))
      val pbar = col("agr").cast("double") / (col("n") * 6)
      val pHigh = col("high").cast("double") / (col("n") * 3)
      val pLow = col("low").cast("double") / (col("n") * 3)
      val pe = pHigh * pHigh + pLow * pLow
      h.select(col("n"), col("high"), col("low"),
        round(pbar, 6).as("p_bar"), round(pe, 6).as("p_e"),
        round((pbar - pe) / (lit(1) - pe), 6).as("kappa"))
    })

  /** Parallel-variance MERGE LAW (Chan/Golub/LeVeque): 8 md5 shards
    * each compute (n, Σx, Σx²) in EXACT decimal independently; the
    * merged moments (plain addition — closed under merge) must equal
    * the directly computed ones bit-for-bit, and the variance derived
    * from the merged moments is reported. This is q358's quantile-merge
    * contract for SECOND moments — the law distributed mean/variance
    * at 100 TB rests on: per-shard summaries travel (3 numbers, not
    * rows) and merge without re-reading anything, and only EXACT
    * decimal sums make the merge associative (double sums drift with
    * partial-agg order, which is why the repo bans them).
    *
    * Scale shape: one shard-keyed hash agg (8 groups), one 8-row
    * roll-up, one direct agg for the cross-check. */
  val q436_variance_merge_law = Q(
    "q436_variance_merge_law", {
      val shard = s"${hexSpanValSql("md5(CAST(event_id AS VARCHAR))", 0, 2)} % 8"
      Some(s"""WITH sh AS (
              |  SELECT $shard AS shard,
              |    CAST(count(*) AS BIGINT) AS n,
              |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2))
              |      AS s,
              |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2))
              |      * CAST(value AS DECIMAL(18,2)) AS DECIMAL(38,4)))
              |      AS DECIMAL(38,4)) AS q
              |  FROM events GROUP BY 1),
              |merged AS (
              |  SELECT CAST(sum(n) AS BIGINT) AS n,
              |    CAST(sum(s) AS DECIMAL(38,2)) AS s,
              |    CAST(sum(q) AS DECIMAL(38,4)) AS q,
              |    CAST(count(*) AS BIGINT) AS n_shards
              |  FROM sh),
              |direct AS (
              |  SELECT CAST(count(*) AS BIGINT) AS n,
              |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2))
              |      AS s,
              |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2))
              |      * CAST(value AS DECIMAL(18,2)) AS DECIMAL(38,4)))
              |      AS DECIMAL(38,4)) AS q
              |  FROM events)
              |SELECT m.n_shards, m.n,
              |  CASE WHEN m.n = d.n AND m.s = d.s AND m.q = d.q
              |    THEN 1 ELSE 0 END AS merge_lossless,
              |  round(CAST(m.s AS DOUBLE) / m.n, 6) AS mean,
              |  round((CAST(m.q AS DOUBLE)
              |    - CAST(m.s AS DOUBLE) * CAST(m.s AS DOUBLE) / m.n)
              |    / (m.n - 1), 6) AS variance
              |FROM merged m CROSS JOIN direct d""".stripMargin)
    },
    (s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("__h", md5(col("event_id").cast("string")))
        .select((expr(hexSpanValSql("__h", 0, 2)) % 8).as("shard"),
          Q.dec(col("value")).as("v"))
      val sh = ev.groupBy("shard").agg(
        count(lit(1)).as("n"),
        sum("v").cast("decimal(38,2)").as("s"),
        sum((col("v") * col("v")).cast("decimal(38,4)"))
          .cast("decimal(38,4)").as("q"))
      val merged = sh.agg(sum("n").cast("long").as("n"),
        sum("s").cast("decimal(38,2)").as("s"),
        sum("q").cast("decimal(38,4)").as("q"),
        count(lit(1)).as("n_shards"))
      val direct = ev.agg(count(lit(1)).as("dn"),
        sum("v").cast("decimal(38,2)").as("ds"),
        sum((col("v") * col("v")).cast("decimal(38,4)"))
          .cast("decimal(38,4)").as("dq"))
      merged.crossJoin(broadcast(direct))
        .select(col("n_shards"), col("n"),
          when(col("n") === col("dn") && col("s") === col("ds") &&
            col("q") === col("dq"), 1).otherwise(0).as("merge_lossless"),
          round(col("s").cast("double") / col("n"), 6).as("mean"),
          round((col("q").cast("double")
            - col("s").cast("double") * col("s").cast("double") / col("n"))
            / (col("n") - 1), 6).as("variance"))
    })

  /** Pinball-loss quantile LAW: for τ ∈ {0.5, 0.9}, sweep the pinball
    * (quantile) loss L_τ(q) = τ·Σ(x−q)⁺ + (1−τ)·Σ(q−x)⁺ over every
    * candidate q on the value grid and verify its argmin IS the exact
    * τ-quantile — the identity quantile regression rests on, checked
    * in EXACT arithmetic: with grid prefix sums (cumN, cumS) the loss
    * is 10·L = 10τ·(S−cumS−q·(N−cumN)) + 10(1−τ)·(q·cumN−cumS), all
    * DECIMAL products of cent values and counts (10τ ∈ {5,9} keeps τ
    * integral), so the argmin is a deterministic min-by-(loss, q) —
    * no float comparison anywhere near the decision.
    *
    * Scale shape: one 2-decimal value-grid agg; cumulative windows
    * over the grid (q358 device); per-τ argmin via a 1-row broadcast
    * of the min loss. The loss sweep is O(grid), never O(rows²). */
  val q441_pinball_quantile = Q(
    "q441_pinball_quantile",
    Some("""WITH v AS (
           |  SELECT CAST(value AS DECIMAL(18,2)) AS q,
           |    CAST(count(*) AS BIGINT) AS c,
           |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS s
           |  FROM events GROUP BY 1),
           |cv AS (
           |  SELECT q,
           |    CAST(sum(c) OVER (ORDER BY q ROWS UNBOUNDED PRECEDING)
           |      AS BIGINT) AS cumn,
           |    CAST(sum(s) OVER (ORDER BY q ROWS UNBOUNDED PRECEDING)
           |      AS DECIMAL(38,2)) AS cums,
           |    CAST(sum(c) OVER () AS BIGINT) AS n,
           |    CAST(sum(s) OVER () AS DECIMAL(38,2)) AS stot
           |  FROM v),
           |t AS (SELECT unnest([5, 9]) AS tau10),
           |loss AS (
           |  SELECT t.tau10, cv.q,
           |    CAST(t.tau10 * (stot - cums - q * (n - cumn))
           |       + (10 - t.tau10) * (q * cumn - cums) AS DECIMAL(38,2))
           |      AS l10
           |  FROM cv CROSS JOIN t),
           |best AS (
           |  SELECT tau10, min(l10) AS ml FROM loss GROUP BY tau10),
           |am AS (
           |  SELECT l.tau10, min(l.q) AS argmin_q, min(l.l10) AS l10
           |  FROM loss l JOIN best b ON b.tau10 = l.tau10 AND l.l10 = b.ml
           |  GROUP BY l.tau10),
           |ex AS (
           |  SELECT t.tau10,
           |    min(CASE WHEN 10 * cumn >= t.tau10 * n THEN q END) AS exact_q
           |  FROM cv CROSS JOIN t GROUP BY t.tau10)
           |SELECT round(am.tau10 / 10.0, 1) AS tau,
           |  CAST(am.argmin_q AS DOUBLE) AS argmin_q,
           |  round(CAST(am.l10 AS DOUBLE) / 10, 2) AS min_loss,
           |  CAST(ex.exact_q AS DOUBLE) AS exact_q,
           |  CASE WHEN am.argmin_q = ex.exact_q THEN 1 ELSE 0 END
           |    AS law_holds
           |FROM am JOIN ex ON ex.tau10 = am.tau10
           |ORDER BY tau""".stripMargin),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val v = Tables.events(s, d)
        .groupBy(Q.dec(col("value")).as("q"))
        .agg(count(lit(1)).as("c"),
          sum(Q.dec(col("value"))).cast("decimal(38,2)").as("s"))
      val wc = Window.orderBy("q")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wa = Window.orderBy("q")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val cv = v.select(col("q"),
        sum("c").over(wc).cast("long").as("cumn"),
        sum("s").over(wc).cast("decimal(38,2)").as("cums"),
        sum("c").over(wa).cast("long").as("n"),
        sum("s").over(wa).cast("decimal(38,2)").as("stot"))
      val t = { import s.implicits._; Seq(5, 9).toDF("tau10") }
      // counts fit decimal(12,0): narrowing the integer factors keeps
      // every product inside precision 38 at scale 2 (the r10
      // allowPrecisionLoss scale-drop trap)
      val above = col("stot") - col("cums") -
        col("q") * (col("n") - col("cumn")).cast("decimal(12,0)")
      val below = col("q") * col("cumn").cast("decimal(12,0)") - col("cums")
      val loss = cv.crossJoin(broadcast(t))
        .select(col("tau10"), col("q"),
          (col("tau10").cast("decimal(3,0)") * above
            + (lit(10) - col("tau10")).cast("decimal(3,0)") * below)
            .cast("decimal(38,2)").as("l10"))
      val best = loss.groupBy("tau10").agg(min("l10").as("ml"))
      val am = loss.join(broadcast(best), "tau10")
        .filter(col("l10") === col("ml"))
        .groupBy("tau10")
        .agg(min("q").as("argmin_q"), min("l10").as("l10"))
      val ex = cv.crossJoin(broadcast(t)).groupBy("tau10")
        .agg(min(when(lit(10) * col("cumn") >= col("tau10") * col("n"),
          col("q"))).as("exact_q"))
      am.join(ex, "tau10")
        .select(round(col("tau10") / 10.0, 1).as("tau"),
          col("argmin_q").cast("double").as("argmin_q"),
          round(col("l10").cast("double") / 10, 2).as("min_loss"),
          col("exact_q").cast("double").as("exact_q"),
          when(col("argmin_q") === col("exact_q"), 1).otherwise(0)
            .as("law_holds"))
        .orderBy("tau")
    })

  /** Per-source KS DRIFT PANEL: two-sample Kolmogorov–Smirnov of each
    * source's n_chars distribution against the REST of the corpus —
    * the sup-gap counterpart of q210's Mann–Whitney panel (rank-sum
    * sees location shifts; KS sees ANY distributional difference), and
    * the per-source decomposition of q204's single two-sample test.
    * Every ECDF evaluates on the shared n_chars grid: D_s =
    * max_v |cum_s(v)/n_s − (cum_all(v) − cum_s(v))/(n − n_s)|, against
    * the α = 0.05 critical value 1.358·√((n_s + n_r)/(n_s·n_r))
    * (shared literal coefficient — no erf, no libm).
    *
    * Scale shape: one (source, v) hash agg; a source×grid frame
    * (#sources × grid cells, both bounded); source-partitioned
    * cumulative windows plus ONE unpartitioned window on the shared
    * grid. No row-scale window anywhere. */
  val q449_source_ks_panel = Q(
    "q449_source_ks_panel",
    Some("""WITH h AS (
           |  SELECT source, n_chars AS v, CAST(count(*) AS BIGINT) AS c
           |  FROM documents GROUP BY 1, 2),
           |grid AS (SELECT DISTINCT v FROM h),
           |ga AS (
           |  SELECT v,
           |    CAST(sum(sum(c)) OVER (ORDER BY v
           |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cuma
           |  FROM h GROUP BY v),
           |sn AS (
           |  SELECT source, CAST(sum(c) AS BIGINT) AS ns FROM h
           |  GROUP BY source),
           |na AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM h),
           |sg AS (
           |  SELECT sn.source, sn.ns, grid.v,
           |    CAST(sum(coalesce(h.c, 0)) OVER (PARTITION BY sn.source
           |      ORDER BY grid.v ROWS UNBOUNDED PRECEDING) AS BIGINT)
           |      AS cums
           |  FROM sn CROSS JOIN grid
           |  LEFT JOIN h ON h.source = sn.source AND h.v = grid.v),
           |d AS (
           |  SELECT sg.source, sg.ns, na.n,
           |    round(max(round(abs(CAST(sg.cums AS DOUBLE) / sg.ns
           |      - CAST(ga.cuma - sg.cums AS DOUBLE) / (na.n - sg.ns)),
           |      9)), 6) AS ks_d
           |  FROM sg JOIN ga ON ga.v = sg.v CROSS JOIN na
           |  GROUP BY sg.source, sg.ns, na.n)
           |SELECT source, ns AS n_source,
           |  ks_d,
           |  round(1.358 * sqrt(CAST(n AS DOUBLE) / (ns * (n - ns))), 6)
           |    AS d_crit_05,
           |  CASE WHEN ks_d > 1.358 * sqrt(CAST(n AS DOUBLE)
           |    / (ns * (n - ns))) THEN 1 ELSE 0 END AS drifted,
           |  round(ks_d / (1.358 * sqrt(CAST(n AS DOUBLE)
           |    / (ns * (n - ns)))), 6) AS severity
           |FROM d ORDER BY source""".stripMargin),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val h = graft.operators.PlanCache.persist(Tables.documents(s, d)
        .groupBy(col("source"), col("n_chars").as("v"))
        .agg(count(lit(1)).as("c")))
      val grid = h.select("v").distinct()
      val wg = Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ga = h.groupBy("v").agg(sum("c").as("ca"))
        .select(col("v"), sum("ca").over(wg).cast("long").as("cuma"))
      val sn = h.groupBy("source").agg(sum("c").cast("long").as("ns"))
      val na = h.agg(sum("c").cast("long").as("n"))
      val ws = Window.partitionBy("source").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val sg = sn.crossJoin(grid)
        .join(h, Seq("source", "v"), "left")
        .select(col("source"), col("ns"), col("v"),
          sum(coalesce(col("c"), lit(0L))).over(ws).cast("long").as("cums"))
      val dd = sg.join(ga, "v").crossJoin(broadcast(na))
        .groupBy("source", "ns", "n")
        .agg(round(max(round(abs(col("cums").cast("double") / col("ns")
          - (col("cuma") - col("cums")).cast("double")
            / (col("n") - col("ns"))), 9)), 6).as("ks_d"))
      val crit = lit(1.358) * sqrt(col("n").cast("double") /
        (col("ns") * (col("n") - col("ns"))))
      dd.select(col("source"), col("ns").as("n_source"), col("ks_d"),
          round(crit, 6).as("d_crit_05"),
          when(col("ks_d") > crit, 1).otherwise(0).as("drifted"),
          round(col("ks_d") / crit, 6).as("severity"))
        .orderBy("source")
    })

  /** Winsorized-OLS robustness delta: the slope of per-user spend on
    * activity, raw vs 1%/99%-winsorized — "how much of my regression
    * is three whales" made one number. Clip bounds are exact order
    * statistics from the integer-cent spend histogram (q356's grid);
    * both slopes come from exact BIGINT-in-decimal moment sums
    * (Σx, Σy, Σxy, Σx²) through one shared closed form, so the delta
    * is arithmetic, not sampling noise. Complements q139 (winsorized
    * MEAN) and q287 (the raw OLS family).
    *
    * Scale shape: one user agg; one y-grid histogram window for the
    * two bounds (broadcast back); two moment roll-ups. */
  val q451_winsorized_ols = Q(
    "q451_winsorized_ols",
    Some("""WITH u AS (
           |  SELECT user_id, CAST(count(*) AS BIGINT) AS x,
           |    CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
           |      AS y
           |  FROM events GROUP BY user_id),
           |h AS (SELECT y, CAST(count(*) AS BIGINT) AS c FROM u GROUP BY y),
           |ch AS (
           |  SELECT y,
           |    CAST(sum(c) OVER (ORDER BY y ROWS UNBOUNDED PRECEDING)
           |      AS BIGINT) AS cum,
           |    CAST(sum(c) OVER () AS BIGINT) AS n
           |  FROM h),
           |b AS (
           |  SELECT min(CASE WHEN 100 * cum >= 1 * n THEN y END) AS ylo,
           |    min(CASE WHEN 100 * cum >= 99 * n THEN y END) AS yhi
           |  FROM ch),
           |m AS (
           |  SELECT CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
           |    CAST(sum(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))
           |      AS DOUBLE) AS sxx,
           |    CAST(sum(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
           |    CAST(sum(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
           |      AS DOUBLE) AS sxy,
           |    CAST(sum(CAST(GREATEST(ylo, LEAST(yhi, y)) AS DECIMAL(38,0)))
           |      AS DOUBLE) AS syw,
           |    CAST(sum(CAST(x AS DECIMAL(19,0))
           |      * CAST(GREATEST(ylo, LEAST(yhi, y)) AS DECIMAL(19,0)))
           |      AS DOUBLE) AS sxyw
           |  FROM u CROSS JOIN b)
           |SELECT n, (SELECT ylo FROM b) AS y_lo_cents,
           |  (SELECT yhi FROM b) AS y_hi_cents,
           |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
           |    AS slope_raw,
           |  round((n * sxyw - sx * syw) / (n * sxx - sx * sx), 6)
           |    AS slope_wins,
           |  round((n * sxyw - sx * syw) / (n * sxx - sx * sx)
           |    - (n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
           |    AS slope_shift
           |FROM m""".stripMargin),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val u = graft.operators.PlanCache.persist(Tables.events(s, d)
        .groupBy("user_id")
        .agg(count(lit(1)).as("x"),
          (sum(Q.dec(col("value"))) * 100).cast("long").as("y")))
      val h = u.groupBy("y").agg(count(lit(1)).as("c"))
      val wc = Window.orderBy("y")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wa = Window.orderBy("y")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val ch = h.select(col("y"),
        sum("c").over(wc).cast("long").as("cum"),
        sum("c").over(wa).cast("long").as("n"))
      val b = ch.agg(
        min(when(lit(100) * col("cum") >= lit(1) * col("n"), col("y")))
          .as("ylo"),
        min(when(lit(100) * col("cum") >= lit(99) * col("n"), col("y")))
          .as("yhi"))
      val yw = greatest(col("ylo"), least(col("yhi"), col("y")))
      val m = u.crossJoin(broadcast(b)).agg(
        count(lit(1)).as("n"),
        sum(col("x").cast("decimal(38,0)")).cast("double").as("sx"),
        sum(col("x").cast("decimal(19,0)") * col("x").cast("decimal(19,0)"))
          .cast("double").as("sxx"),
        sum(col("y").cast("decimal(38,0)")).cast("double").as("sy"),
        sum(col("x").cast("decimal(19,0)") * col("y").cast("decimal(19,0)"))
          .cast("double").as("sxy"),
        sum(yw.cast("decimal(38,0)")).cast("double").as("syw"),
        sum(col("x").cast("decimal(19,0)") * yw.cast("decimal(19,0)"))
          .cast("double").as("sxyw"),
        max("ylo").as("y_lo_cents"), max("yhi").as("y_hi_cents"))
      val den = col("n") * col("sxx") - col("sx") * col("sx")
      val slopeRaw = (col("n") * col("sxy") - col("sx") * col("sy")) / den
      val slopeW = (col("n") * col("sxyw") - col("sx") * col("syw")) / den
      m.select(col("n"), col("y_lo_cents"), col("y_hi_cents"),
        round(slopeRaw, 6).as("slope_raw"),
        round(slopeW, 6).as("slope_wins"),
        round(slopeW - slopeRaw, 6).as("slope_shift"))
    })

  /** DKW distribution-free QUANTILE BANDS: the Dvoretzky–Kiefer–
    * Wolfowitz inequality puts a uniform ±ε band around the whole
    * ECDF with ε = √(ln(2/α)/2n) — no distributional assumption, the
    * guarantee every "p50 ± what?" dashboard actually needs (q195/
    * q264 bootstrap/order-statistic CIs are per-quantile; DKW is
    * SIMULTANEOUS across all of them). For each decile p: the exact
    * quantile and the conservative [q_lo, q_hi] bracket — the values
    * where ECDF ± ε crosses p. ln(2/0.05) is the hardcoded 6-decimal
    * literal 3.688879 (the q214 constant discipline — no libm call
    * whose last ulp could differ).
    *
    * Scale shape: one 2-decimal value-grid agg + cumulative windows
    * (q358 device); the nine targets are a broadcast row set. */
  val q453_dkw_band = Q(
    "q453_dkw_band",
    Some("""WITH v AS (
           |  SELECT CAST(value AS DECIMAL(18,2)) AS val,
           |    CAST(count(*) AS BIGINT) AS c
           |  FROM events GROUP BY 1),
           |cv AS (
           |  SELECT val,
           |    CAST(sum(c) OVER (ORDER BY val ROWS UNBOUNDED PRECEDING)
           |      AS BIGINT) AS cum,
           |    CAST(sum(c) OVER () AS BIGINT) AS n
           |  FROM v),
           |t AS (SELECT unnest([1, 2, 3, 4, 5, 6, 7, 8, 9]) AS d),
           |b AS (
           |  SELECT t.d, max(cv.n) AS n,
           |    sqrt(3.688879 / (2 * max(cv.n))) AS eps,
           |    min(CASE WHEN 10 * cv.cum >= t.d * cv.n THEN cv.val END)
           |      AS q_point,
           |    min(CASE WHEN CAST(cv.cum AS DOUBLE) / cv.n
           |      >= t.d / 10.0 - sqrt(3.688879 / (2 * cv.n))
           |      THEN cv.val END) AS q_lo,
           |    min(CASE WHEN CAST(cv.cum AS DOUBLE) / cv.n
           |      >= t.d / 10.0 + sqrt(3.688879 / (2 * cv.n))
           |      THEN cv.val END) AS q_hi
           |  FROM t CROSS JOIN cv GROUP BY t.d)
           |SELECT d AS decile, round(eps, 6) AS epsilon,
           |  CAST(q_lo AS DOUBLE) AS q_lo,
           |  CAST(q_point AS DOUBLE) AS q_point,
           |  CAST(q_hi AS DOUBLE) AS q_hi
           |FROM b ORDER BY decile""".stripMargin),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val v = Tables.events(s, d)
        .groupBy(Q.dec(col("value")).as("val"))
        .agg(count(lit(1)).as("c"))
      val wc = Window.orderBy("val")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wa = Window.orderBy("val")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val cv = v.select(col("val"),
        sum("c").over(wc).cast("long").as("cum"),
        sum("c").over(wa).cast("long").as("n"))
      val t = { import s.implicits._; (1 to 9).toDF("d") }
      val eps = sqrt(lit(3.688879) / (lit(2) * col("cum_n")))
      val epsRow = sqrt(lit(3.688879) / (lit(2) * col("n")))
      val b = t.crossJoin(cv).groupBy("d")
        .agg(max("n").as("cum_n"),
          min(when(lit(10) * col("cum") >= col("d") * col("n"),
            col("val"))).as("q_point"),
          min(when(col("cum").cast("double") / col("n") >=
            col("d") / lit(10.0) - epsRow, col("val"))).as("q_lo"),
          min(when(col("cum").cast("double") / col("n") >=
            col("d") / lit(10.0) + epsRow, col("val"))).as("q_hi"))
      b.select(col("d").as("decile"), round(eps, 6).as("epsilon"),
          col("q_lo").cast("double").as("q_lo"),
          col("q_point").cast("double").as("q_point"),
          col("q_hi").cast("double").as("q_hi"))
        .orderBy("decile")
    })

  val all: Seq[Q] = Seq(q432_tost_equivalence, q433_mcnemar,
    q434_fleiss_kappa, q436_variance_merge_law, q441_pinball_quantile,
    q449_source_ks_panel, q451_winsorized_ols, q453_dkw_band)
}
