package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions.hexSpanValSql

/** Round-10 statistics additions: KMV (bottom-k) cardinality sketching
  * with an exact-vs-estimate audit.
  */
object StatsOps6 {

  private val KmvK = 24

  /** KMV / bottom-k distinct-count sketch per event type, audited
    * against the exact count — the mergeable cardinality estimator
    * whose state is k hashes (vs HLL's register array, q54/q164): with
    * h_k the k-th smallest of the distinct 32-bit md5 hashes,
    * est = (k−1)·2³²/h_k, falling back to the exact seen-hash count
    * when a group holds fewer than k distinct hashes.
    *
    * Scale shape (and the point of the entry): the SQL twin ranks with
    * a per-type window, but the Spark side uses the TopKAggregator fed
    * −hv — partial aggregation keeps ≤ k hashes per partition per
    * group, so only k values per group ever shuffle and NO window/sort
    * touches the distinct-user frame. At 100 TB the window formulation
    * sorts every group; the sketch formulation ships 24 longs. */
  val q382_kmv_distinct = Q(
    "q382_kmv_distinct",
    Some(s"""WITH pu AS (
            |  SELECT DISTINCT event_type, user_id FROM events),
            |h AS (
            |  SELECT DISTINCT event_type,
            |    ${hexSpanValSql("md5(CAST(user_id AS VARCHAR))", 0, 8)} AS hv
            |  FROM pu),
            |ranked AS (
            |  SELECT event_type, hv,
            |    row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
            |  FROM h),
            |st AS (
            |  SELECT event_type,
            |    CAST(count(*) AS BIGINT) AS n_hashes,
            |    max(CASE WHEN rn = $KmvK THEN hv END) AS hk
            |  FROM ranked WHERE rn <= $KmvK GROUP BY event_type),
            |ex AS (
            |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_exact
            |  FROM pu GROUP BY event_type),
            |est AS (
            |  SELECT e.event_type, e.n_exact,
            |    round(CASE WHEN s.n_hashes < $KmvK
            |      THEN CAST(s.n_hashes AS DOUBLE)
            |      ELSE ${KmvK - 1} * 4294967296.0 / s.hk END, 4) AS kmv_est
            |  FROM ex e JOIN st s ON s.event_type = e.event_type)
            |SELECT event_type, n_exact, kmv_est,
            |  round(abs(kmv_est - n_exact) / n_exact, 6) AS rel_err
            |FROM est ORDER BY event_type""".stripMargin),
    (s, d) => {
      val pu = graft.operators.PlanCache.persist(
        Tables.events(s, d).select("event_type", "user_id").distinct())
      val h = pu
        .withColumn("__h", md5(col("user_id").cast("string")))
        .select(col("event_type"),
          expr(hexSpanValSql("__h", 0, 8)).as("hv"))
        .distinct()
      // bottom-k via the map-side-bounded top-k aggregator on −hv:
      // finish() emits ids ordered by score desc = hv asc, so the last
      // element of the ≤k array IS h_k
      val botk = udaf(new graft.functions.TopKAggregator(KmvK))
      val st = h.select(col("event_type"),
          (-col("hv")).cast("double").as("score"), col("hv").as("id"))
        .groupBy("event_type")
        .agg(botk(col("score"), col("id")).as("ids"))
        .select(col("event_type"), size(col("ids")).as("n_hashes"),
          element_at(col("ids"), size(col("ids"))).as("hk"))
      val ex = pu.groupBy("event_type").agg(count(lit(1)).as("n_exact"))
      ex.join(st, "event_type")
        .select(col("event_type"), col("n_exact"),
          round(when(col("n_hashes") < KmvK, col("n_hashes").cast("double"))
            .otherwise(lit((KmvK - 1) * 4294967296.0) / col("hk")), 4)
            .as("kmv_est"))
        .select(col("event_type"), col("n_exact"), col("kmv_est"),
          round(abs(col("kmv_est") - col("n_exact")) / col("n_exact"), 6)
            .as("rel_err"))
        .orderBy("event_type")
    })

  /** Leave-one-SOURCE-out OLS influence — data valuation at the
    * provenance grain (vs q363's per-point KNN-Shapley): fit
    * tokens ~ n_chars over all documents, then for every source re-fit
    * WITHOUT that source's docs and report the slope shift. The trick
    * that makes this O(sources) instead of O(sources) full refits: OLS
    * needs only the sufficient statistics (n, Σx, Σy, Σxx, Σxy), which
    * subtract groupwise — one corpus pass builds the per-source grid,
    * the global row is the grid's own sum, and every LOO fit is
    * arithmetic on two grid rows. All sums are exact DECIMAL(38,0)
    * integers; doubles appear only in the final divides. */
  val q384_loo_influence = Q(
    "q384_loo_influence",
    Some("""WITH d AS (
           |  SELECT source, n_chars AS x,
           |    CAST(len(string_split(text, ' ')) AS BIGINT) AS y
           |  FROM documents),
           |g AS (
           |  SELECT source, CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
           |    CAST(sum(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
           |    CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS sxx,
           |    CAST(sum(CAST(x AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS sxy
           |  FROM d GROUP BY source),
           |tot AS (
           |  SELECT CAST(sum(n) AS BIGINT) AS n, CAST(sum(sx) AS DECIMAL(38,0)) AS sx,
           |    CAST(sum(sy) AS DECIMAL(38,0)) AS sy, CAST(sum(sxx) AS DECIMAL(38,0)) AS sxx,
           |    CAST(sum(sxy) AS DECIMAL(38,0)) AS sxy
           |  FROM g),
           |fits AS (
           |  SELECT g.source, g.n AS n_docs,
           |    (CAST(t.n AS DOUBLE) * t.sxy - CAST(t.sx AS DOUBLE) * t.sy)
           |      / (CAST(t.n AS DOUBLE) * t.sxx - CAST(t.sx AS DOUBLE) * t.sx)
           |      AS slope_full,
           |    (CAST(t.n - g.n AS DOUBLE) * (t.sxy - g.sxy)
           |       - CAST(t.sx - g.sx AS DOUBLE) * (t.sy - g.sy))
           |      / (CAST(t.n - g.n AS DOUBLE) * (t.sxx - g.sxx)
           |       - CAST(t.sx - g.sx AS DOUBLE) * (t.sx - g.sx))
           |      AS slope_loo
           |  FROM g CROSS JOIN tot t)
           |SELECT source, n_docs, round(slope_full, 8) AS slope_full,
           |  round(slope_loo, 8) AS slope_loo,
           |  round(slope_loo - slope_full, 8) AS slope_delta
           |FROM fits ORDER BY source""".stripMargin),
    (s, d) => {
      val dd = Tables.documents(s, d).select(col("source"),
        col("n_chars").cast("decimal(38,0)").as("x"),
        size(split(col("text"), " ")).cast("decimal(38,0)").as("y"))
      val g = graft.operators.PlanCache.persist(
        dd.groupBy("source").agg(
          count(lit(1)).as("n"),
          sum("x").cast("decimal(38,0)").as("sx"),
          sum("y").cast("decimal(38,0)").as("sy"),
          sum(col("x") * col("x")).cast("decimal(38,0)").as("sxx"),
          sum(col("x") * col("y")).cast("decimal(38,0)").as("sxy")))
      val tot = g.agg(sum("n").cast("long").as("tn"),
        sum("sx").cast("decimal(38,0)").as("tsx"),
        sum("sy").cast("decimal(38,0)").as("tsy"),
        sum("sxx").cast("decimal(38,0)").as("tsxx"),
        sum("sxy").cast("decimal(38,0)").as("tsxy"))
      def dbl(c: org.apache.spark.sql.Column) = c.cast("double")
      g.crossJoin(broadcast(tot))
        .select(col("source"), col("n").as("n_docs"),
          ((dbl(col("tn")) * col("tsxy") - dbl(col("tsx")) * col("tsy"))
            / (dbl(col("tn")) * col("tsxx") - dbl(col("tsx")) * col("tsx")))
            .as("slope_full"),
          ((dbl(col("tn") - col("n")) * (col("tsxy") - col("sxy"))
            - dbl(col("tsx") - col("sx")) * (col("tsy") - col("sy")))
            / (dbl(col("tn") - col("n")) * (col("tsxx") - col("sxx"))
              - dbl(col("tsx") - col("sx")) * (col("tsx") - col("sx"))))
            .as("slope_loo"))
        .select(col("source"), col("n_docs"),
          round(col("slope_full"), 8).as("slope_full"),
          round(col("slope_loo"), 8).as("slope_loo"),
          round(col("slope_loo") - col("slope_full"), 8).as("slope_delta"))
        .orderBy("source")
    })

  private val NeymanN = 1000

  /** Neyman-optimal stratified sampling allocation: split a budget of
    * n = 1000 draws across event-type strata ∝ N_h·S_h (population size
    * × within-stratum sd) — the allocation minimizing the stratified
    * mean's variance — next to the proportional (∝ N_h) baseline.
    * Integerization is largest-remainder (floor every share, hand the
    * leftover units to the largest fractional parts, ties to the
    * earlier type name), so both columns sum to exactly n. S_h comes
    * from exact cent sums (n·Σv² − (Σv)² over BIGINTs); doubles enter
    * only at the sd/weight divides. One corpus agg to the ≤8-row
    * stratum grid; windows touch only that grid. */
  val q385_neyman_allocation = Q(
    "q385_neyman_allocation",
    Some(s"""WITH g AS (
            |  SELECT event_type, CAST(count(*) AS BIGINT) AS nh,
            |    CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS s1,
            |    CAST(sum(CAST(round(value * 100, 0) AS BIGINT)
            |      * CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS s2
            |  FROM events GROUP BY event_type),
            |sd AS (
            |  SELECT event_type, nh,
            |    sqrt((CAST(nh AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1)
            |      / (CAST(nh AS DOUBLE) * (nh - 1))) / 100 AS sh
            |  FROM g),
            |w AS (
            |  SELECT event_type, nh, sh,
            |    CAST(nh AS DOUBLE) * sh AS wne,
            |    CAST(nh AS DOUBLE) AS wpr,
            |    sum(CAST(nh AS DOUBLE) * sh) OVER () AS wne_tot,
            |    sum(CAST(nh AS DOUBLE)) OVER () AS wpr_tot
            |  FROM sd),
            |fl AS (
            |  SELECT event_type, nh, sh,
            |    floor($NeymanN * wne / wne_tot) AS f_ne,
            |    $NeymanN * wne / wne_tot - floor($NeymanN * wne / wne_tot) AS r_ne,
            |    floor($NeymanN * wpr / wpr_tot) AS f_pr,
            |    $NeymanN * wpr / wpr_tot - floor($NeymanN * wpr / wpr_tot) AS r_pr
            |  FROM w),
            |rk AS (
            |  SELECT *,
            |    row_number() OVER (ORDER BY r_ne DESC, event_type) AS k_ne,
            |    row_number() OVER (ORDER BY r_pr DESC, event_type) AS k_pr,
            |    $NeymanN - sum(f_ne) OVER () AS left_ne,
            |    $NeymanN - sum(f_pr) OVER () AS left_pr
            |  FROM fl)
            |SELECT event_type, nh AS n_pop, round(sh, 6) AS sd,
            |  CAST(f_pr + CASE WHEN k_pr <= left_pr THEN 1 ELSE 0 END AS BIGINT)
            |    AS n_prop,
            |  CAST(f_ne + CASE WHEN k_ne <= left_ne THEN 1 ELSE 0 END AS BIGINT)
            |    AS n_neyman
            |FROM rk ORDER BY event_type""".stripMargin),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val cents = round(col("value") * 100, 0).cast("long")
      val g = Tables.events(s, d)
        .select(col("event_type"), cents.as("c"))
        .groupBy("event_type").agg(
          count(lit(1)).as("nh"),
          sum("c").cast("long").as("s1"),
          sum(col("c") * col("c")).cast("long").as("s2"))
      val sd = g.select(col("event_type"), col("nh"),
        (sqrt((col("nh").cast("double") * col("s2")
          - col("s1").cast("double") * col("s1"))
          / (col("nh").cast("double") * (col("nh") - 1))) / 100).as("sh"))
      val wAll = Window.partitionBy()
      val w = sd.select(col("event_type"), col("nh"), col("sh"),
        (col("nh").cast("double") * col("sh")).as("wne"),
        col("nh").cast("double").as("wpr"))
        .withColumn("wne_tot", sum("wne").over(wAll))
        .withColumn("wpr_tot", sum("wpr").over(wAll))
      val fl = w.select(col("event_type"), col("nh"), col("sh"),
        floor(lit(NeymanN) * col("wne") / col("wne_tot")).as("f_ne"),
        (lit(NeymanN) * col("wne") / col("wne_tot")
          - floor(lit(NeymanN) * col("wne") / col("wne_tot"))).as("r_ne"),
        floor(lit(NeymanN) * col("wpr") / col("wpr_tot")).as("f_pr"),
        (lit(NeymanN) * col("wpr") / col("wpr_tot")
          - floor(lit(NeymanN) * col("wpr") / col("wpr_tot"))).as("r_pr"))
      val rk = fl
        .withColumn("k_ne", row_number().over(
          Window.orderBy(col("r_ne").desc, col("event_type"))))
        .withColumn("k_pr", row_number().over(
          Window.orderBy(col("r_pr").desc, col("event_type"))))
        .withColumn("left_ne", lit(NeymanN) - sum("f_ne").over(wAll))
        .withColumn("left_pr", lit(NeymanN) - sum("f_pr").over(wAll))
      rk.select(col("event_type"), col("nh").as("n_pop"),
          round(col("sh"), 6).as("sd"),
          (col("f_pr") + when(col("k_pr") <= col("left_pr"), 1L)
            .otherwise(0L)).cast("long").as("n_prop"),
          (col("f_ne") + when(col("k_ne") <= col("left_ne"), 1L)
            .otherwise(0L)).cast("long").as("n_neyman"))
        .orderBy("event_type")
    })

  private val RanTol = 50 // inlier band, chars
  private val RanC = 16 // candidate lines

  /** RANSAC robust line fit with DETERMINISTIC candidates (the
    * hash-seeded twist that makes the classic reproducible across
    * engines): the 32 docs with the smallest md5 hashes form 16
    * candidate (x=tokens, y=n_chars) point-pairs; each candidate line
    * counts its inliers (|y − a − b·x| ≤ 50) in one corpus×16 broadcast
    * pass; the winner (max inliers, tie → lowest candidate id) is
    * refit by exact-decimal OLS over its own inliers. Where q213's
    * Theil–Sen medians all pairwise slopes, RANSAC is the
    * O(candidates·n) regime that survives >50% structured outliers.
    *
    * Scale shape: anchor selection is the map-side-bounded
    * TopKAggregator (32 longs shuffle, no sort); then two corpus
    * passes — one counts all 16 candidates at once, one refits the
    * winner. */
  val q386_ransac_line = Q(
    "q386_ransac_line",
    Some(s"""WITH d AS (
            |  SELECT doc_id,
            |    CAST(len(string_split(text, ' ')) AS BIGINT) AS x,
            |    n_chars AS y
            |  FROM documents),
            |h AS (
            |  SELECT doc_id, x, y,
            |    ${hexSpanValSql("md5(CAST(doc_id AS VARCHAR))", 0, 8)} AS hv
            |  FROM d),
            |rk AS (
            |  SELECT x, y, row_number() OVER (ORDER BY hv, doc_id) AS rn
            |  FROM h),
            |cands AS (
            |  SELECT CAST((rn - 1) // 2 AS BIGINT) AS cand,
            |    max(CASE WHEN (rn - 1) % 2 = 0 THEN x END) AS x1,
            |    max(CASE WHEN (rn - 1) % 2 = 0 THEN y END) AS y1,
            |    max(CASE WHEN (rn - 1) % 2 = 1 THEN x END) AS x2,
            |    max(CASE WHEN (rn - 1) % 2 = 1 THEN y END) AS y2
            |  FROM rk WHERE rn <= ${2 * RanC} GROUP BY 1),
            |lines AS (
            |  SELECT cand,
            |    CAST(y2 - y1 AS DOUBLE) / (x2 - x1) AS b,
            |    y1 - CAST(y2 - y1 AS DOUBLE) / (x2 - x1) * x1 AS a
            |  FROM cands WHERE x1 <> x2),
            |inl AS (
            |  SELECT l.cand, CAST(count(*) AS BIGINT) AS n_inliers
            |  FROM d CROSS JOIN lines l
            |  WHERE abs(y - (l.a + l.b * x)) <= $RanTol
            |  GROUP BY l.cand),
            |win AS (
            |  SELECT cand, a, b FROM (
            |    SELECT i.cand, l.a, l.b,
            |      row_number() OVER (ORDER BY i.n_inliers DESC, i.cand) AS r
            |    FROM inl i JOIN lines l ON l.cand = i.cand) t
            |  WHERE r = 1),
            |ref AS (
            |  SELECT w.cand,
            |    CAST(count(*) AS BIGINT) AS n,
            |    CAST(sum(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
            |    CAST(sum(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
            |    CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DOUBLE) AS sxx,
            |    CAST(sum(CAST(x AS DECIMAL(38,0)) * y) AS DOUBLE) AS sxy
            |  FROM d CROSS JOIN win w
            |  WHERE abs(y - (w.a + w.b * x)) <= $RanTol
            |  GROUP BY w.cand),
            |refit AS (
            |  SELECT cand,
            |    (n * sxy - sx * sy) / (n * sxx - sx * sx) AS rb,
            |    (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS ra
            |  FROM ref)
            |SELECT l.cand, i.n_inliers, round(l.b, 6) AS slope_cand,
            |  round(r.rb, 6) AS refit_slope, round(r.ra, 6) AS refit_intercept
            |FROM lines l JOIN inl i ON i.cand = l.cand
            |LEFT JOIN refit r ON r.cand = l.cand
            |ORDER BY l.cand""".stripMargin),
    (s, d) => {
      val dd = graft.operators.PlanCache.persist(
        Tables.documents(s, d).select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("x"),
          col("n_chars").as("y")))
      val botk = udaf(new graft.functions.TopKAggregator(2 * RanC))
      val anchorIds = dd
        .withColumn("__h", md5(col("doc_id").cast("string")))
        .select(col("doc_id"),
          (-expr(hexSpanValSql("__h", 0, 8))).cast("double").as("score"))
        .agg(botk(col("score"), col("doc_id")).as("ids"))
        .select(posexplode(col("ids")).as(Seq("pos", "doc_id")))
      val cands = broadcast(anchorIds).join(dd, "doc_id")
        .select(expr("CAST(pos AS BIGINT) div 2").as("cand"),
          (col("pos") % 2).as("role"), col("x"), col("y"))
        .groupBy("cand").agg(
          max(when(col("role") === 0, col("x"))).as("x1"),
          max(when(col("role") === 0, col("y"))).as("y1"),
          max(when(col("role") === 1, col("x"))).as("x2"),
          max(when(col("role") === 1, col("y"))).as("y2"))
      val lines = graft.operators.PlanCache.persist(
        cands.filter(col("x1") =!= col("x2"))
          .select(col("cand"),
            ((col("y2") - col("y1")).cast("double") / (col("x2") - col("x1")))
              .as("b"))
          .join(cands.select("cand", "x1", "y1"), "cand")
          .select(col("cand"), col("b"),
            (col("y1") - col("b") * col("x1")).as("a")))
      val inl = graft.operators.PlanCache.persist(
        dd.crossJoin(broadcast(lines))
          .filter(abs(col("y") - (col("a") + col("b") * col("x"))) <= RanTol)
          .groupBy("cand").agg(count(lit(1)).as("n_inliers")))
      val win = inl.join(lines, "cand")
        .orderBy(col("n_inliers").desc, col("cand")).limit(1)
        .select("cand", "a", "b")
      val ref = dd.crossJoin(broadcast(win))
        .filter(abs(col("y") - (col("a") + col("b") * col("x"))) <= RanTol)
        .groupBy("cand").agg(
          count(lit(1)).cast("double").as("n"),
          sum(col("x").cast("decimal(38,0)")).cast("double").as("sx"),
          sum(col("y").cast("decimal(38,0)")).cast("double").as("sy"),
          sum((col("x") * col("x")).cast("decimal(38,0)")).cast("double")
            .as("sxx"),
          sum((col("x") * col("y")).cast("decimal(38,0)")).cast("double")
            .as("sxy"))
      val refit = ref.select(col("cand"),
        ((col("n") * col("sxy") - col("sx") * col("sy"))
          / (col("n") * col("sxx") - col("sx") * col("sx"))).as("rb"),
        col("n"), col("sx"), col("sy"))
        .select(col("cand"), col("rb"),
          ((col("sy") - col("rb") * col("sx")) / col("n")).as("ra"))
      lines.join(inl, "cand")
        .join(refit, Seq("cand"), "left")
        .select(col("cand"), col("n_inliers"),
          round(col("b"), 6).as("slope_cand"),
          round(col("rb"), 6).as("refit_slope"),
          round(col("ra"), 6).as("refit_intercept"))
        .orderBy("cand")
    })

  /** Isotonic calibration by PAV — computed through the MINIMAX
    * identity fitted(i) = max_{j≤i} min_{k≥i} mean(pos, j..k) rather
    * than the sequential pool-adjacent-violators loop, because minimax
    * is pure relational algebra: on B ≤ 20 observed score bins it is a
    * j×i×k grid (≤ B³ = 8000 tuples) of exact integer prefix-sum
    * differences, identical on both engines, where the PAV loop is
    * stateful and unportable. Score = stopword-ratio of each doc
    * (binned by INTEGER arithmetic, stop·20 div tokens — no float
    * boundary can flip a bin), label = lang='en'; output is the raw
    * vs isotonic per-bin rate, monotone by construction.
    *
    * Scale shape: one corpus pass to the ≤20-bin grid; the cubic
    * minimax runs on grid rows only. */
  val q391_isotonic_pav = Q(
    "q391_isotonic_pav",
    Some("""WITH d AS (
           |  SELECT len(list_filter(string_split(text, ' '),
           |      t -> t IN ('the', 'and', 'of', 'to', 'a'))) AS stop,
           |    len(string_split(text, ' ')) AS tok,
           |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
           |  FROM documents),
           |b AS (
           |  SELECT least((stop * 20) // tok, 19) AS bin,
           |    CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(y) AS BIGINT) AS pos
           |  FROM d WHERE tok > 0 GROUP BY 1),
           |idx AS (
           |  SELECT bin, n, pos,
           |    row_number() OVER (ORDER BY bin) AS i,
           |    sum(n) OVER (ORDER BY bin) AS cn,
           |    sum(pos) OVER (ORDER BY bin) AS cp
           |  FROM b),
           |mjk AS (
           |  SELECT j.i AS j, k.i AS k,
           |    CAST(k.cp - j.cp + j.pos AS DOUBLE)
           |      / (k.cn - j.cn + j.n) AS m
           |  FROM idx j JOIN idx k ON j.i <= k.i),
           |inner_min AS (
           |  SELECT i.i, p.j, min(p.m) AS mn
           |  FROM idx i JOIN mjk p ON p.j <= i.i AND p.k >= i.i
           |  GROUP BY i.i, p.j),
           |fit AS (SELECT i, max(mn) AS iso FROM inner_min GROUP BY i)
           |SELECT x.bin, x.n, x.pos,
           |  round(CAST(x.pos AS DOUBLE) / x.n, 6) AS raw_rate,
           |  round(f.iso, 6) AS iso_rate
           |FROM idx x JOIN fit f ON f.i = x.i
           |ORDER BY x.bin""".stripMargin),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val dd = Tables.documents(s, d)
        .select(expr("size(filter(split(text, ' '), " +
            "t -> t IN ('the', 'and', 'of', 'to', 'a')))").as("stop"),
          size(split(col("text"), " ")).as("tok"),
          when(col("lang") === "en", 1).otherwise(0).as("y"))
        .filter(col("tok") > 0)
      val b = dd
        .groupBy(least(expr("(stop * 20) div tok"), lit(19)).cast("long")
          .as("bin"))
        .agg(count(lit(1)).as("n"), sum("y").cast("long").as("pos"))
      val wB = Window.orderBy("bin")
      val idx = graft.operators.PlanCache.persist(b
        .withColumn("i", row_number().over(wB))
        .withColumn("cn", sum("n").over(wB))
        .withColumn("cp", sum("pos").over(wB)))
      val mjk = idx.toDF("binj", "nj", "posj", "j", "cnj", "cpj")
        .join(idx.toDF("bink", "nk", "posk", "k", "cnk", "cpk"),
          col("j") <= col("k"))
        .select(col("j"), col("k"),
          ((col("cpk") - col("cpj") + col("posj")).cast("double")
            / (col("cnk") - col("cnj") + col("nj"))).as("m"))
      val innerMin = idx.select(col("i"))
        .join(mjk, col("j") <= col("i") && col("k") >= col("i"))
        .groupBy("i", "j").agg(min("m").as("mn"))
      val fit = innerMin.groupBy("i").agg(max("mn").as("iso"))
      idx.join(fit, "i")
        .select(col("bin"), col("n"), col("pos"),
          round(col("pos").cast("double") / col("n"), 6).as("raw_rate"),
          round(col("iso"), 6).as("iso_rate"))
        .orderBy("bin")
    })

  /** Two-sample Cramér–von Mises distance between every event-type
    * pair's value distributions — the INTEGRATED squared CDF gap,
    * completing the drift toolkit next to KS (sup gap, q204), PSI
    * (binned likelihood, q246) and W₁ (mass transport, q381):
    * T = Σ_l h_l·(F_a(v_l) − F_b(v_l))² · (mn/N²) evaluated at every
    * pooled observation. The integrand cross-multiplies to integers —
    * h·(cumA·nB − cumB·nA)² — summed exactly in wide integers (the
    * square alone reaches ~10²¹ at sf0.1, past BIGINT: DECIMAL(38,0)
    * on Spark, HUGEINT on the oracle — DuckDB's decimal multiply
    * overflows its 38-digit width where hugeint does not), with ONE
    * double divide at the end, so the statistic is
    * exact to the final rounding. Same grid shape as q381: one corpus
    * agg to the (type, cents) grid, per-type CDF windows on grid rows,
    * a grid-level pair join. */
  val q392_cvm_test = Q(
    "q392_cvm_test",
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
           |  SELECT t, n, cents, k,
           |    CAST(sum(k) OVER (PARTITION BY t ORDER BY cents
           |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
           |  FROM grid),
           |pairs AS (
           |  SELECT a.t AS type_a, b.t AS type_b, a.n AS na, b.n AS nb,
           |    sum(CAST(a.k + b.k AS HUGEINT)
           |      * (a.cum * b.n - b.cum * a.n)
           |      * (a.cum * b.n - b.cum * a.n)) AS num
           |  FROM cdf a JOIN cdf b ON a.cents = b.cents AND a.t < b.t
           |  GROUP BY 1, 2, 3, 4)
           |SELECT type_a, type_b, na, nb,
           |  round(CAST(num AS DOUBLE)
           |    / (CAST(na AS DOUBLE) * nb * (na + nb) * (na + nb)), 8)
           |    AS cvm_t
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
      val cdf = grid.select(col("t"), col("n"), col("cents"), col("k"),
        sum("k").over(wCum).cast("long").as("cum"))
      val a = cdf.toDF("type_a", "na", "cents", "ka", "cuma")
      val b = cdf.toDF("type_b", "nb", "cents", "kb", "cumb")
      a.join(b, Seq("cents"))
        .filter(col("type_a") < col("type_b"))
        .groupBy("type_a", "type_b", "na", "nb")
        .agg(sum((col("ka") + col("kb")).cast("decimal(38,0)")
          * (col("cuma") * col("nb") - col("cumb") * col("na"))
          * (col("cuma") * col("nb") - col("cumb") * col("na")))
          .cast("decimal(38,0)").as("num"))
        .select(col("type_a"), col("type_b"), col("na"), col("nb"),
          round(col("num").cast("double")
            / (col("na").cast("double") * col("nb")
              * (col("na") + col("nb")) * (col("na") + col("nb"))), 8)
            .as("cvm_t"))
        .orderBy("type_a", "type_b")
    })

  private val FmM = 16 // stochastic-averaging buckets
  private val FmPhi = 0.77351 // Flajolet–Martin correction constant

  /** Flajolet–Martin probabilistic counting (the 1983 original, with
    * stochastic averaging) per event type, audited against the exact
    * count — the third cardinality sketch next to KMV (q382, k order
    * statistics) and HLL (q54/q164, registers): 16 buckets by hash%16,
    * per bucket R_j = max over elements of (trailing-zeros(h)+1), and
    * est = (m/φ)·2^(ΣR_j/m). The lowest-set-bit rank extracts as
    * log2(h & −h) — exact on both engines because the argument is a
    * power of two. ΣR_j is committed as an exact integer column so the
    * audit does not hinge on pow(2, fractional) ulps.
    *
    * Scale shape: scan-side rank, one (type × bucket) max-agg, a
    * 16-row-per-type grid join for empty buckets; maxes merge map-side
    * so only m smallints per group per partition shuffle. */
  val q394_fm_sketch = Q(
    "q394_fm_sketch",
    Some(s"""WITH pu AS (
            |  SELECT DISTINCT event_type, user_id FROM events),
            |h AS (
            |  SELECT event_type,
            |    ${hexSpanValSql("md5(CAST(user_id AS VARCHAR))", 0, 8)} AS hv
            |  FROM pu),
            |r AS (
            |  SELECT event_type, hv % $FmM AS b,
            |    CASE WHEN hv // $FmM = 0 THEN 0
            |         ELSE CAST(round(log2((hv // $FmM)
            |           & (-(hv // $FmM))), 0) AS BIGINT) + 1 END AS rho
            |  FROM h),
            |rmax AS (
            |  SELECT event_type, b, max(rho) AS rj
            |  FROM r GROUP BY 1, 2),
            |grid AS (
            |  SELECT t.event_type, g.b, coalesce(m.rj, 0) AS rj
            |  FROM (SELECT DISTINCT event_type FROM pu) t
            |  CROSS JOIN (SELECT unnest(generate_series(0, ${FmM - 1}))
            |              AS b) g
            |  LEFT JOIN rmax m ON m.event_type = t.event_type AND m.b = g.b),
            |st AS (
            |  SELECT event_type, CAST(sum(rj) AS BIGINT) AS r_sum
            |  FROM grid GROUP BY 1),
            |ex AS (
            |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_exact
            |  FROM pu GROUP BY 1),
            |est AS (
            |  SELECT e.event_type, e.n_exact, s.r_sum,
            |    round($FmM / $FmPhi
            |      * pow(2, CAST(s.r_sum AS DOUBLE) / $FmM), 4) AS fm_est
            |  FROM ex e JOIN st s ON s.event_type = e.event_type)
            |SELECT event_type, n_exact, r_sum, fm_est,
            |  round(abs(fm_est - n_exact) / n_exact, 6) AS rel_err
            |FROM est ORDER BY event_type""".stripMargin),
    (s, d) => {
      val pu = graft.operators.PlanCache.persist(
        Tables.events(s, d).select("event_type", "user_id").distinct())
      val h = pu.withColumn("__h", md5(col("user_id").cast("string")))
        .select(col("event_type"), expr(hexSpanValSql("__h", 0, 8)).as("hv"))
      val rest = expr(s"hv div $FmM")
      val r = h.select(col("event_type"), (col("hv") % FmM).as("b"),
        when(rest === 0, 0L)
          .otherwise(round(log2(rest.bitwiseAND(-rest)), 0).cast("long") + 1)
          .as("rho"))
      val rmax = r.groupBy("event_type", "b").agg(max("rho").as("rj"))
      val grid = pu.select("event_type").distinct()
        .crossJoin(broadcast(
          s.range(FmM).select(col("id").as("b"))))
        .join(rmax, Seq("event_type", "b"), "left")
        .select(col("event_type"), coalesce(col("rj"), lit(0L)).as("rj"))
      val st = grid.groupBy("event_type")
        .agg(sum("rj").cast("long").as("r_sum"))
      val ex = pu.groupBy("event_type").agg(count(lit(1)).as("n_exact"))
      ex.join(st, "event_type")
        .select(col("event_type"), col("n_exact"), col("r_sum"),
          round(lit(FmM / FmPhi)
            * pow(lit(2.0), col("r_sum").cast("double") / FmM), 4)
            .as("fm_est"))
        .select(col("event_type"), col("n_exact"), col("r_sum"),
          col("fm_est"),
          round(abs(col("fm_est") - col("n_exact")) / col("n_exact"), 6)
            .as("rel_err"))
        .orderBy("event_type")
    })

  /** LMG relative importance (the Shapley decomposition of R², Lindeman–
    * Merenda–Gold): how much of a document's n_chars does each of
    * token count / stopword count / distinct-token count deserve credit
    * for, averaging the incremental R² over all 3! regressor orderings.
    * These three regressors are heavily collinear (r ≈ 0.61–0.91) —
    * exactly the regime LMG exists for, where marginal R²s triple-count
    * the shared length signal and sum far past the full R². Needs R²
    * of all 7 regressor subsets; every one comes in closed form from
    * the correlation matrix (pairs via the partial-R² identity, the
    * triple via Cramer's-rule normal equations), and the correlation
    * matrix comes from ONE corpus pass of exact DECIMAL(38,0) sums
    * (BIGINT-safe at this sf, not at 10⁴× it). Doubles enter only in
    * the closed-form scalar algebra on the 1-row stat frame, written
    * with the identical expression shape on both engines. */
  val q399_lmg_importance = Q(
    "q399_lmg_importance",
    Some("""WITH v AS (
           |  SELECT n_chars AS y,
           |    CAST(len(string_split(text, ' ')) AS BIGINT) AS a,
           |    CAST(len(list_filter(string_split(text, ' '),
           |      t -> t IN ('the', 'and', 'of', 'to', 'a'))) AS BIGINT) AS b,
           |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
           |      AS c
           |  FROM documents),
           |st AS (
           |  SELECT CAST(count(*) AS DOUBLE) AS n,
           |    CAST(sum(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
           |    CAST(sum(CAST(a AS DECIMAL(38,0))) AS DOUBLE) AS sa,
           |    CAST(sum(CAST(b AS DECIMAL(38,0))) AS DOUBLE) AS sb,
           |    CAST(sum(CAST(c AS DECIMAL(38,0))) AS DOUBLE) AS sc,
           |    CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DOUBLE) AS pyy,
           |    CAST(sum(CAST(a AS DECIMAL(38,0)) * a) AS DOUBLE) AS paa,
           |    CAST(sum(CAST(b AS DECIMAL(38,0)) * b) AS DOUBLE) AS pbb,
           |    CAST(sum(CAST(c AS DECIMAL(38,0)) * c) AS DOUBLE) AS pcc,
           |    CAST(sum(CAST(y AS DECIMAL(38,0)) * a) AS DOUBLE) AS pya,
           |    CAST(sum(CAST(y AS DECIMAL(38,0)) * b) AS DOUBLE) AS pyb,
           |    CAST(sum(CAST(y AS DECIMAL(38,0)) * c) AS DOUBLE) AS pyc,
           |    CAST(sum(CAST(a AS DECIMAL(38,0)) * b) AS DOUBLE) AS pab,
           |    CAST(sum(CAST(a AS DECIMAL(38,0)) * c) AS DOUBLE) AS pac,
           |    CAST(sum(CAST(b AS DECIMAL(38,0)) * c) AS DOUBLE) AS pbc
           |  FROM v),
           |cr AS (
           |  SELECT
           |    (n * pya - sy * sa) / sqrt((n * pyy - sy * sy) * (n * paa - sa * sa)) AS r1,
           |    (n * pyb - sy * sb) / sqrt((n * pyy - sy * sy) * (n * pbb - sb * sb)) AS r2,
           |    (n * pyc - sy * sc) / sqrt((n * pyy - sy * sy) * (n * pcc - sc * sc)) AS r3,
           |    (n * pab - sa * sb) / sqrt((n * paa - sa * sa) * (n * pbb - sb * sb)) AS r12,
           |    (n * pac - sa * sc) / sqrt((n * paa - sa * sa) * (n * pcc - sc * sc)) AS r13,
           |    (n * pbc - sb * sc) / sqrt((n * pbb - sb * sb) * (n * pcc - sc * sc)) AS r23
           |  FROM st),
           |sub AS (
           |  SELECT r1 * r1 AS q1, r2 * r2 AS q2, r3 * r3 AS q3,
           |    (r1 * r1 + r2 * r2 - 2 * r1 * r2 * r12) / (1 - r12 * r12) AS q12,
           |    (r1 * r1 + r3 * r3 - 2 * r1 * r3 * r13) / (1 - r13 * r13) AS q13,
           |    (r2 * r2 + r3 * r3 - 2 * r2 * r3 * r23) / (1 - r23 * r23) AS q23,
           |    r1 * ((r1 * (1 - r23 * r23) + r2 * (r13 * r23 - r12)
           |        + r3 * (r12 * r23 - r13))
           |      / (1 + 2 * r12 * r13 * r23 - r12 * r12 - r13 * r13 - r23 * r23))
           |    + r2 * ((r2 * (1 - r13 * r13) + r1 * (r13 * r23 - r12)
           |        + r3 * (r12 * r13 - r23))
           |      / (1 + 2 * r12 * r13 * r23 - r12 * r12 - r13 * r13 - r23 * r23))
           |    + r3 * ((r3 * (1 - r12 * r12) + r1 * (r12 * r23 - r13)
           |        + r2 * (r12 * r13 - r23))
           |      / (1 + 2 * r12 * r13 * r23 - r12 * r12 - r13 * r13 - r23 * r23))
           |    AS q123
           |  FROM cr)
           |SELECT feature,
           |  round(alone, 6) AS r2_alone,
           |  round(lmg, 6) AS lmg_share,
           |  round(q123, 6) AS r2_full
           |FROM (
           |  SELECT 'tokens' AS feature, q1 AS alone,
           |    (2 * q1 + (q12 - q2) + (q13 - q3) + 2 * (q123 - q23)) / 6 AS lmg,
           |    q123 FROM sub
           |  UNION ALL
           |  SELECT 'stopwords', q2,
           |    (2 * q2 + (q12 - q1) + (q23 - q3) + 2 * (q123 - q13)) / 6,
           |    q123 FROM sub
           |  UNION ALL
           |  SELECT 'distinct_tokens', q3,
           |    (2 * q3 + (q13 - q1) + (q23 - q2) + 2 * (q123 - q12)) / 6,
           |    q123 FROM sub) t
           |ORDER BY feature""".stripMargin),
    (s, d) => {
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val v = Tables.documents(s, d).select(
        col("n_chars").as("y"),
        size(split(col("text"), " ")).cast("long").as("a"),
        expr("size(filter(split(text, ' '), " +
          "t -> t IN ('the', 'and', 'of', 'to', 'a')))").cast("long").as("b"),
        size(array_distinct(split(col("text"), " "))).cast("long").as("c"))
      val st = v.agg(
        count(lit(1)).cast("double").as("n"),
        sum(dec(col("y"))).cast("double").as("sy"),
        sum(dec(col("a"))).cast("double").as("sa"),
        sum(dec(col("b"))).cast("double").as("sb"),
        sum(dec(col("c"))).cast("double").as("sc"),
        sum(dec(col("y")) * col("y")).cast("double").as("pyy"),
        sum(dec(col("a")) * col("a")).cast("double").as("paa"),
        sum(dec(col("b")) * col("b")).cast("double").as("pbb"),
        sum(dec(col("c")) * col("c")).cast("double").as("pcc"),
        sum(dec(col("y")) * col("a")).cast("double").as("pya"),
        sum(dec(col("y")) * col("b")).cast("double").as("pyb"),
        sum(dec(col("y")) * col("c")).cast("double").as("pyc"),
        sum(dec(col("a")) * col("b")).cast("double").as("pab"),
        sum(dec(col("a")) * col("c")).cast("double").as("pac"),
        sum(dec(col("b")) * col("c")).cast("double").as("pbc"))
      val cr = st.selectExpr(
        "(n * pya - sy * sa) / sqrt((n * pyy - sy * sy) * (n * paa - sa * sa)) AS r1",
        "(n * pyb - sy * sb) / sqrt((n * pyy - sy * sy) * (n * pbb - sb * sb)) AS r2",
        "(n * pyc - sy * sc) / sqrt((n * pyy - sy * sy) * (n * pcc - sc * sc)) AS r3",
        "(n * pab - sa * sb) / sqrt((n * paa - sa * sa) * (n * pbb - sb * sb)) AS r12",
        "(n * pac - sa * sc) / sqrt((n * paa - sa * sa) * (n * pcc - sc * sc)) AS r13",
        "(n * pbc - sb * sc) / sqrt((n * pbb - sb * sb) * (n * pcc - sc * sc)) AS r23")
      val det = "(1 + 2 * r12 * r13 * r23 - r12 * r12 - r13 * r13 - r23 * r23)"
      val sub = cr.selectExpr(
        "r1 * r1 AS q1", "r2 * r2 AS q2", "r3 * r3 AS q3",
        "(r1 * r1 + r2 * r2 - 2 * r1 * r2 * r12) / (1 - r12 * r12) AS q12",
        "(r1 * r1 + r3 * r3 - 2 * r1 * r3 * r13) / (1 - r13 * r13) AS q13",
        "(r2 * r2 + r3 * r3 - 2 * r2 * r3 * r23) / (1 - r23 * r23) AS q23",
        s"""r1 * ((r1 * (1 - r23 * r23) + r2 * (r13 * r23 - r12)
           |    + r3 * (r12 * r23 - r13)) / $det)
           |+ r2 * ((r2 * (1 - r13 * r13) + r1 * (r13 * r23 - r12)
           |    + r3 * (r12 * r13 - r23)) / $det)
           |+ r3 * ((r3 * (1 - r12 * r12) + r1 * (r12 * r23 - r13)
           |    + r2 * (r12 * r13 - r23)) / $det) AS q123""".stripMargin)
      val one = graft.operators.PlanCache.persist(sub)
      def row(f: String, alone: String, lmg: String) =
        one.selectExpr(s"'$f' AS feature", s"$alone AS alone",
          s"$lmg AS lmg", "q123")
      row("tokens", "q1",
          "(2 * q1 + (q12 - q2) + (q13 - q3) + 2 * (q123 - q23)) / 6")
        .unionAll(row("stopwords", "q2",
          "(2 * q2 + (q12 - q1) + (q23 - q3) + 2 * (q123 - q13)) / 6"))
        .unionAll(row("distinct_tokens", "q3",
          "(2 * q3 + (q13 - q1) + (q23 - q2) + 2 * (q123 - q12)) / 6"))
        .select(col("feature"), round(col("alone"), 6).as("r2_alone"),
          round(col("lmg"), 6).as("lmg_share"),
          round(col("q123"), 6).as("r2_full"))
        .orderBy("feature")
    })

  private val MmdS = 5.0e7 // kernel scale: cents², ~E[x²] (value ≤ $490)

  /** Maximum mean discrepancy between event-type value distributions
    * under the CUBIC polynomial kernel k(x,y) = (1 + xy/s)³ — the
    * kernel two-sample test in its closed-form regime: expanding the
    * kernel, MMD² = 3Δ₁²/s + 3Δ₂²/s² + Δ₃²/s³ — weighted squared gaps
    * of the first three raw moments — so the WHOLE test
    * needs one exact-moment row per type and ZERO pairwise work — the
    * kernel trick running in closed form. RBF is deliberately not
    * used: exp() differs in the last ulp between libm and the JVM, and
    * summing thousands of such kernel values breaks the repo's
    * bit-determinism contract; the polynomial embedding is exact
    * (moments as DECIMAL(38,0) cent sums — Σx³ ≈ 10²³ — doubles only
    * in the final gap algebra).
    *
    * Scale shape: one corpus agg to a per-type moment row; the pair
    * grid is |types|². */
  val q400_mmd_poly = Q(
    "q400_mmd_poly",
    Some(s"""WITH v AS (
            |  SELECT event_type AS t,
            |    CAST(round(value * 100, 0) AS BIGINT) AS x
            |  FROM events),
            |m AS (
            |  SELECT t, CAST(count(*) AS DOUBLE) AS n,
            |    CAST(sum(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS s1,
            |    CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DOUBLE) AS s2,
            |    CAST(sum(CAST(x AS DECIMAL(38,0)) * x * x) AS DOUBLE) AS s3
            |  FROM v GROUP BY t)
            |SELECT a.t AS type_a, b.t AS type_b,
            |  round(3 * (a.s1 / a.n - b.s1 / b.n)
            |          * (a.s1 / a.n - b.s1 / b.n) / $MmdS
            |      + 3 * (a.s2 / a.n - b.s2 / b.n)
            |          * (a.s2 / a.n - b.s2 / b.n) / ($MmdS * $MmdS)
            |      + (a.s3 / a.n - b.s3 / b.n)
            |          * (a.s3 / a.n - b.s3 / b.n)
            |          / ($MmdS * $MmdS * $MmdS), 8) AS mmd2,
            |  round((a.s1 / a.n - b.s1 / b.n) / 100, 6) AS mean_gap
            |FROM m a JOIN m b ON a.t < b.t
            |ORDER BY type_a, type_b""".stripMargin),
    (s, d) => {
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val m = Tables.events(s, d)
        .select(col("event_type").as("t"),
          round(col("value") * 100, 0).cast("long").as("x"))
        .groupBy("t").agg(
          count(lit(1)).cast("double").as("n"),
          sum(dec(col("x"))).cast("double").as("s1"),
          sum(dec(col("x")) * col("x")).cast("double").as("s2"),
          sum(dec(col("x")) * col("x") * col("x")).cast("double").as("s3"))
      val a = m.toDF("type_a", "na", "a1", "a2", "a3")
      val b = m.toDF("type_b", "nb", "b1", "b2", "b3")
      def gap(x: org.apache.spark.sql.Column, nx: org.apache.spark.sql.Column,
          y: org.apache.spark.sql.Column, ny: org.apache.spark.sql.Column) =
        x / nx - y / ny
      val g1 = gap(col("a1"), col("na"), col("b1"), col("nb"))
      val g2 = gap(col("a2"), col("na"), col("b2"), col("nb"))
      val g3 = gap(col("a3"), col("na"), col("b3"), col("nb"))
      a.join(b, col("type_a") < col("type_b"))
        .select(col("type_a"), col("type_b"),
          round(lit(3) * g1 * g1 / MmdS
            + lit(3) * g2 * g2 / (MmdS * MmdS)
            + g3 * g3 / (MmdS * MmdS * MmdS), 8).as("mmd2"),
          round(g1 / 100, 6).as("mean_gap"))
        .orderBy("type_a", "type_b")
    })

  /** Warner randomized response (1965) — the original local-DP
    * mechanism, replayed deterministically: each user's sensitive bit
    * ("total spend over $3500") is reported truthfully with p = 12/16 and
    * flipped otherwise, the coin being an md5 digit so both engines
    * flip the SAME users; the analyst never sees who lied but debiases
    * the aggregate exactly: π̂ = (p̂_rep − (1−p)) / (2p−1). The entry
    * reports true π (the auditor's ground truth), the raw reported
    * rate, the debiased estimate, and its absolute error — the
    * plausible-deniability ↔ utility trade made measurable.
    * ε = ln(p/(1−p)) = ln 3. One user-keyed agg then one global row;
    * all rates are exact-count divisions. */
  val q404_randomized_response = Q(
    "q404_randomized_response",
    Some(s"""WITH u AS (
            |  SELECT user_id,
            |    CASE WHEN sum(CAST(round(value * 100, 0) AS BIGINT)) > 350000
            |      THEN 1 ELSE 0 END AS truth,
            |    ${hexSpanValSql("md5(CAST(user_id AS VARCHAR))", 0, 1)} < 12
            |      AS honest
            |  FROM events GROUP BY user_id),
            |rep AS (
            |  SELECT user_id, truth,
            |    CASE WHEN honest THEN truth ELSE 1 - truth END AS said
            |  FROM u)
            |SELECT CAST(count(*) AS BIGINT) AS n_users,
            |  round(CAST(sum(truth) AS DOUBLE) / count(*), 6) AS true_pi,
            |  round(CAST(sum(said) AS DOUBLE) / count(*), 6) AS reported_rate,
            |  round((CAST(sum(said) AS DOUBLE) / count(*) - 0.25) / 0.5, 6)
            |    AS debiased_pi,
            |  round(abs((CAST(sum(said) AS DOUBLE) / count(*) - 0.25) / 0.5
            |    - CAST(sum(truth) AS DOUBLE) / count(*)), 6) AS abs_err
            |FROM rep""".stripMargin),
    (s, d) => {
      val u = Tables.events(s, d)
        .groupBy("user_id")
        .agg(when(sum(round(col("value") * 100, 0).cast("long")) > 350000, 1)
          .otherwise(0).as("truth"))
        .withColumn("__h", md5(col("user_id").cast("string")))
        .withColumn("honest", expr(hexSpanValSql("__h", 0, 1)) < 12)
        .select(col("truth"),
          when(col("honest"), col("truth")).otherwise(lit(1) - col("truth"))
            .as("said"))
      u.agg(count(lit(1)).as("n_users"),
          round(sum("truth").cast("double") / count(lit(1)), 6).as("true_pi"),
          round(sum("said").cast("double") / count(lit(1)), 6)
            .as("reported_rate"),
          round((sum("said").cast("double") / count(lit(1)) - 0.25) / 0.5, 6)
            .as("debiased_pi"),
          round(abs((sum("said").cast("double") / count(lit(1)) - 0.25) / 0.5
            - sum("truth").cast("double") / count(lit(1))), 6).as("abs_err"))
    })

  /** Quantile treatment effects at the deciles — where q254's CUPED
    * and q270's z-test report ONE average effect, QTE shows WHERE in
    * the outcome distribution the arms differ (a treatment that only
    * moves the right tail has zero median effect). Arms are the md5
    * user split; outcome is per-user total spend; decile d's quantile
    * is the exact type-1 order statistic (min value whose cumulative
    * count reaches ⌈d·n/10⌉, all integer arithmetic).
    *
    * Scale shape: one user-keyed agg, then the CDF windows run on the
    * (arm × distinct-cent-total) VALUE GRID — bounded by the money
    * domain, not the user count (the q358 device). The decile probe is
    * a 9-row grid join against the grid CDF. */
  val q416_qte_deciles = Q(
    "q416_qte_deciles",
    Some(s"""WITH u AS (
            |  SELECT ${hexSpanValSql("md5(CAST(user_id AS VARCHAR))", 0, 1)}
            |      % 2 AS arm,
            |    CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
            |      AS y
            |  FROM events GROUP BY user_id),
            |g AS (
            |  SELECT arm, y, CAST(count(*) AS BIGINT) AS k
            |  FROM u GROUP BY arm, y),
            |cdf AS (
            |  SELECT arm, y, k,
            |    CAST(sum(k) OVER (PARTITION BY arm ORDER BY y
            |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
            |    CAST(sum(k) OVER (PARTITION BY arm) AS BIGINT) AS n
            |  FROM g),
            |dec_ AS (SELECT unnest(generate_series(1, 9)) AS d),
            |q AS (
            |  SELECT d.d, c.arm, min(c.y) AS q
            |  FROM dec_ d JOIN cdf c
            |    ON c.cum * 10 >= d.d * c.n
            |  GROUP BY d.d, c.arm)
            |SELECT a.d AS decile,
            |  round(a.q / 100.0, 2) AS q_control,
            |  round(b.q / 100.0, 2) AS q_treat,
            |  round((b.q - a.q) / 100.0, 2) AS qte
            |FROM q a JOIN q b ON b.d = a.d AND a.arm = 0 AND b.arm = 1
            |ORDER BY decile""".stripMargin),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val u = Tables.events(s, d)
        .groupBy("user_id")
        .agg(sum(round(col("value") * 100, 0).cast("long")).cast("long")
          .as("y"))
        .withColumn("__h", md5(col("user_id").cast("string")))
        .select((expr(hexSpanValSql("__h", 0, 1)) % 2).as("arm"), col("y"))
      val g = u.groupBy("arm", "y").agg(count(lit(1)).as("k"))
      val cdf = g
        .withColumn("cum", sum("k").over(Window.partitionBy("arm")
          .orderBy("y")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("long"))
        .withColumn("n", sum("k").over(Window.partitionBy("arm"))
          .cast("long"))
      val dec_ = s.range(1, 10).select(col("id").as("d"))
      val q = graft.operators.PlanCache.persist(
        broadcast(dec_).join(cdf, col("cum") * 10 >= col("d") * col("n"))
          .groupBy("d", "arm").agg(min("y").as("q")))
      q.filter(col("arm") === 0).select(col("d"), col("q").as("q0"))
        .join(q.filter(col("arm") === 1).select(col("d"), col("q").as("q1")),
          "d")
        .select(col("d").as("decile"),
          round(col("q0") / 100.0, 2).as("q_control"),
          round(col("q1") / 100.0, 2).as("q_treat"),
          round((col("q1") - col("q0")) / 100.0, 2).as("qte"))
        .orderBy("decile")
    })

  private val ThK = 24

  /** Theta-sketch set operations: union AND intersection cardinality
    * estimates per event-type pair from the bottom-k sketches alone —
    * the reason theta sketches beat HLL in warehouses (HLL unions but
    * cannot intersect; KMV/theta does both): merge the two hash sets,
    * θ = k-th smallest of the merged set, est_union = (k−1)·2³²/θ,
    * and est_inter counts sketch hashes present in BOTH sides below θ,
    * scaled by 2³²/θ. Audited against exact distinct-user counts.
    *
    * Scale shape: per-type sketches come from the map-side-bounded
    * TopKAggregator (q382); all set algebra runs on ≤2k-element arrays
    * on the 10-row pair grid. The exact audit is one user-keyed
    * pair join. */
  val q417_theta_set_ops = Q(
    "q417_theta_set_ops",
    Some(s"""WITH pu AS (
            |  SELECT DISTINCT event_type, user_id FROM events),
            |h AS (
            |  SELECT DISTINCT event_type,
            |    ${hexSpanValSql("md5(CAST(user_id AS VARCHAR))", 0, 8)} AS hv
            |  FROM pu),
            |rk AS (
            |  SELECT event_type, hv,
            |    row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
            |  FROM h),
            |sk AS (
            |  SELECT event_type, list(hv ORDER BY hv) AS sketch
            |  FROM rk WHERE rn <= $ThK GROUP BY event_type),
            |pairs AS (
            |  SELECT a.event_type AS type_a, b.event_type AS type_b,
            |    list_sort(list_distinct(list_concat(a.sketch, b.sketch)))
            |      AS merged,
            |    a.sketch AS sa, b.sketch AS sb
            |  FROM sk a JOIN sk b ON a.event_type < b.event_type),
            |est AS (
            |  SELECT type_a, type_b,
            |    merged[LEAST($ThK, len(merged))] AS theta,
            |    LEAST($ThK, len(merged)) AS kk,
            |    len(list_filter(list_intersect(sa, sb),
            |      x -> x < merged[LEAST($ThK, len(merged))])) AS n_both
            |  FROM pairs),
            |ex AS (
            |  SELECT a.event_type AS type_a, b.event_type AS type_b,
            |    CAST(count(*) AS BIGINT) AS exact_inter
            |  FROM pu a JOIN pu b
            |    ON a.user_id = b.user_id AND a.event_type < b.event_type
            |  GROUP BY 1, 2),
            |nn AS (
            |  SELECT event_type, CAST(count(*) AS BIGINT) AS n
            |  FROM pu GROUP BY event_type)
            |SELECT e.type_a, e.type_b,
            |  na.n + nb.n - coalesce(x.exact_inter, 0) AS exact_union,
            |  round((e.kk - 1) * 4294967296.0 / e.theta, 2) AS est_union,
            |  coalesce(x.exact_inter, 0) AS exact_inter,
            |  round(e.n_both * 4294967296.0 / e.theta, 2) AS est_inter
            |FROM est e
            |JOIN nn na ON na.event_type = e.type_a
            |JOIN nn nb ON nb.event_type = e.type_b
            |LEFT JOIN ex x ON x.type_a = e.type_a AND x.type_b = e.type_b
            |ORDER BY e.type_a, e.type_b""".stripMargin),
    (s, d) => {
      val pu = graft.operators.PlanCache.persist(
        Tables.events(s, d).select("event_type", "user_id").distinct())
      val h = pu.withColumn("__h", md5(col("user_id").cast("string")))
        .select(col("event_type"), expr(hexSpanValSql("__h", 0, 8)).as("hv"))
        .distinct()
      val botk = udaf(new graft.functions.TopKAggregator(ThK))
      val sk = h.select(col("event_type"),
          (-col("hv")).cast("double").as("score"), col("hv").as("id"))
        .groupBy("event_type")
        .agg(botk(col("score"), col("id")).as("sketch"))
      val pairs = sk.toDF("type_a", "sa")
        .join(sk.toDF("type_b", "sb"), col("type_a") < col("type_b"))
        .withColumn("merged",
          array_sort(array_distinct(concat(col("sa"), col("sb")))))
      val est = pairs.select(col("type_a"), col("type_b"),
        element_at(col("merged"), least(lit(ThK), size(col("merged"))))
          .as("theta"),
        least(lit(ThK), size(col("merged"))).as("kk"),
        col("sa"), col("sb"))
        .withColumn("n_both", size(filter(array_intersect(col("sa"),
          col("sb")), x => x < col("theta"))))
      val ex = pu.toDF("type_a", "user_id")
        .join(pu.toDF("type_b", "user_id"), "user_id")
        .filter(col("type_a") < col("type_b"))
        .groupBy("type_a", "type_b").agg(count(lit(1)).as("exact_inter"))
      val nn = pu.groupBy("event_type").agg(count(lit(1)).as("n"))
      est
        .join(broadcast(nn.toDF("type_a", "na")), "type_a")
        .join(broadcast(nn.toDF("type_b", "nb")), "type_b")
        .join(ex, Seq("type_a", "type_b"), "left")
        .select(col("type_a"), col("type_b"),
          (col("na") + col("nb") - coalesce(col("exact_inter"), lit(0L)))
            .as("exact_union"),
          round((col("kk") - 1) * lit(4294967296.0) / col("theta"), 2)
            .as("est_union"),
          coalesce(col("exact_inter"), lit(0L)).as("exact_inter"),
          round(col("n_both") * lit(4294967296.0) / col("theta"), 2)
            .as("est_inter"))
        .orderBy("type_a", "type_b")
    })

  val all: Seq[Q] = Seq(q382_kmv_distinct, q384_loo_influence,
    q385_neyman_allocation, q386_ransac_line, q391_isotonic_pav,
    q392_cvm_test, q394_fm_sketch, q399_lmg_importance, q400_mmd_poly,
    q404_randomized_response, q416_qte_deciles, q417_theta_set_ops)
}
