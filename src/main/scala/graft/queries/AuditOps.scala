package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Round-8 QA/audit addendum: annotator agreement, cheap-index
  * truncation quality, LSH band-parameter calibration and planning,
  * conformal coverage, CUPED experiment readouts, and RRF hybrid
  * fusion — the "is the pipeline's machinery still sound" gates beside
  * the q198/q222/q226 index-quality battery.
  *
  * Scale discipline: ground-truth passes are bounded to probe subsets
  * (the q110/q198 probe-cap rule), all scores derive from exact BIGINT
  * counts through one shared double expression, and every power is an
  * explicit multiply chain (no cross-engine `pow`).
  */
object AuditOps {

  private val KappaL = 10      // label classes (embeddings.label ∈ 0..9)
  private val KappaFlipMod = 5 // 1-in-5 ids get a disagreeing rater

  /** Cohen's kappa between two raters over the embedding labels — the
    * chance-corrected agreement score every labeling/eval pipeline
    * reports (raw agreement overstates quality when the label prior is
    * skewed). Rater A is the stored label; rater B is a deterministic
    * construction-inversion (the q212 device): ids whose md5 span ≡ 0
    * (mod 5) report (label+1) mod 10, everything else agrees — so the
    * expected agreement is known by construction and a drift in either
    * the confusion arithmetic or the md5 device flips the hash. po, pe,
    * κ all derive from exact BIGINT confusion counts through one shared
    * double expression.
    *
    * Scale shape: one scan → one (a, b) hash agg; the confusion matrix
    * (≤ L² rows) is checkpointed metadata feeding the marginal
    * branches. */
  val q247_cohens_kappa = Q(
    "q247_cohens_kappa", {
      import graft.functions.TextFunctions.hexSpanValSql
      val flip = s"${hexSpanValSql("md5(CAST(vec_id AS VARCHAR))", 0, 2)} % $KappaFlipMod = 0"
      Some(s"""WITH r AS (
              |  SELECT CAST(label AS BIGINT) AS a,
              |    CAST(CASE WHEN $flip THEN (label + 1) % $KappaL
              |         ELSE label END AS BIGINT) AS b
              |  FROM embeddings),
              |conf AS (
              |  SELECT a, b, CAST(count(*) AS BIGINT) AS n
              |  FROM r GROUP BY a, b),
              |tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_items FROM conf),
              |agree AS (
              |  SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS n_agree
              |  FROM conf WHERE a = b),
              |rs AS (SELECT a, CAST(sum(n) AS BIGINT) AS rn FROM conf GROUP BY a),
              |cs AS (SELECT b, CAST(sum(n) AS BIGINT) AS cn FROM conf GROUP BY b),
              |prod AS (
              |  SELECT CAST(sum(rs.rn * cs.cn) AS BIGINT) AS s_prod
              |  FROM rs JOIN cs ON rs.a = cs.b)
              |SELECT n_items, n_agree, s_prod,
              |  round(CAST(n_agree AS DOUBLE) / n_items, 6) AS po,
              |  round(CAST(s_prod AS DOUBLE) / n_items / n_items, 6) AS pe,
              |  round((CAST(n_agree AS DOUBLE) / n_items
              |         - CAST(s_prod AS DOUBLE) / n_items / n_items)
              |    / (1 - CAST(s_prod AS DOUBLE) / n_items / n_items), 6)
              |    AS kappa
              |FROM tot CROSS JOIN agree CROSS JOIN prod""".stripMargin)
    },
    (s, d) => {
      import graft.functions.TextFunctions.hexSpanValSql
      val flip = expr(s"${hexSpanValSql("__h", 0, 2)} % $KappaFlipMod = 0")
      // checkpoint: the ≤L²-row confusion matrix feeds four branches
      // (total, diagonal, row marginals, column marginals)
      val conf = Tables.embeddings(s, d)
        .withColumn("__h", md5(col("vec_id").cast("string")))
        .select(col("label").cast("long").as("a"),
          when(flip, (col("label") + 1) % KappaL)
            .otherwise(col("label")).cast("long").as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("n"))
        .localCheckpoint(true)
      val tot = conf.agg(sum(col("n")).as("n_items"))
      val agree = conf.filter(col("a") === col("b"))
        .agg(coalesce(sum(col("n")), lit(0L)).as("n_agree"))
      val prod = conf.groupBy("a").agg(sum(col("n")).as("rn"))
        .join(conf.groupBy("b").agg(sum(col("n")).as("cn")),
          col("a") === col("b"))
        .agg(sum(col("rn") * col("cn")).as("s_prod"))
      val po = col("n_agree").cast("double") / col("n_items")
      val pe = col("s_prod").cast("double") / col("n_items") / col("n_items")
      tot.crossJoin(agree).crossJoin(prod)
        .select(col("n_items"), col("n_agree"), col("s_prod"),
          round(po, 6).as("po"), round(pe, 6).as("pe"),
          round((po - pe) / (lit(1) - pe), 6).as("kappa"))
    })

  private val TruncDims = 16
  private val TruncQ = 8   // probe query batch (vec_id < 8, the q222 batch)
  private val TruncK = 10

  /** Embedding-truncation retrieval audit (the Matryoshka/dim-budget
    * question): per probe query, how much of the exact full-dimension
    * cosine top-10 survives when the index stores only the FIRST 16 of
    * 64 coordinates? The plain-truncation complement of q219's JL
    * projection — together they bound the two standard cheap-index
    * routes (keep a prefix vs project). Both rankings use the audited
    * brute-force device on the bounded probe batch; the comparison is
    * list-metadata-sized (8 queries × 10 ranks).
    *
    * Scale shape: one corpus pass per ranking against the broadcast
    * 8-query batch; candidate windows are keyed on the query id. */
  val q248_truncation_audit = Q(
    "q248_truncation_audit", {
      Some(s"""WITH $truncRankingSqlPrefix,
              |ov AS (
              |  SELECT f.qid, CAST(count(*) AS BIGINT) AS n_overlap
              |  FROM full_rk f JOIN trunc_rk t
              |    ON f.qid = t.qid AND f.vec_id = t.vec_id
              |  GROUP BY f.qid)
              |SELECT q.qid, CAST(coalesce(ov.n_overlap, 0) AS BIGINT) AS n_overlap,
              |  round(CAST(coalesce(ov.n_overlap, 0) AS DOUBLE) / $TruncK, 6)
              |    AS overlap_at_k
              |FROM q LEFT JOIN ov ON ov.qid = q.qid
              |ORDER BY q.qid""".stripMargin)
    },
    (s, d) => {
      val (queries, full, trunc) = truncRankings(s, d)
      val ov = full.join(trunc, Seq("qid", "vec_id"))
        .groupBy("qid").agg(count(lit(1)).as("n_overlap"))
      queries.select("qid").join(ov, Seq("qid"), "left")
        .select(col("qid"),
          coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
          round(coalesce(col("n_overlap"), lit(0L)).cast("double") / TruncK, 6)
            .as("overlap_at_k"))
        .orderBy("qid")
    })

  private def dotNSql(a: String, b: String, n: Int) =
    s"list_reduce(list_transform(generate_series(1, $n), i -> $a[i] * $b[i]), (x, y) -> x + y)"
  private def cosNSql(a: String, b: String, n: Int) =
    s"(${dotNSql(a, b, n)} / (sqrt(${dotNSql(a, a, n)}) * sqrt(${dotNSql(b, b, n)})))"

  /** Shared WITH-body for the exact full-dim and 16-dim-truncated
    * rankings over the bounded probe batch — q248 compares them, q262
    * fuses them; ONE definition keeps the two audits coupled (a tie-rule
    * or dimension change cannot silently diverge). */
  private def truncRankingSqlPrefix: String =
    s"""e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < $TruncQ),
       |c AS (SELECT vec_id, v FROM e WHERE vec_id >= $TruncQ),
       |full_rk AS (
       |  SELECT qid, vec_id, rf FROM (
       |    SELECT q.qid, c.vec_id, ROW_NUMBER() OVER (PARTITION BY q.qid
       |      ORDER BY round(${cosNSql("c.v", "q.qv", 64)}, 6) DESC, c.vec_id) AS rf
       |    FROM c CROSS JOIN q) t WHERE rf <= $TruncK),
       |trunc_rk AS (
       |  SELECT qid, vec_id, rt FROM (
       |    SELECT q.qid, c.vec_id, ROW_NUMBER() OVER (PARTITION BY q.qid
       |      ORDER BY round(${cosNSql("c.v", "q.qv", TruncDims)}, 6) DESC, c.vec_id) AS rt
       |    FROM c CROSS JOIN q) t WHERE rt <= $TruncK)""".stripMargin

  /** Scala twin of [[truncRankingSqlPrefix]]: (query ids, full-dim
    * top-10 with rank `rf`, truncated top-10 with rank `rt`). */
  private def truncRankings(s: org.apache.spark.sql.SparkSession, d: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
         org.apache.spark.sql.DataFrame) = {
    import graft.functions.VectorFunctions.cosine
    val emb = Tables.embeddings(s, d)
      .withColumn("v", col("embedding").cast("array<double>"))
    val queries = emb.filter(col("vec_id") < TruncQ)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val corpus = emb.filter(col("vec_id") >= TruncQ).select("vec_id", "v")
    def topk(simCol: org.apache.spark.sql.Column, as: String) = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))
      corpus.crossJoin(broadcast(queries))
        .select(col("qid"), col("vec_id"), round(simCol, 6).as("sim"))
        .withColumn(as, row_number().over(w).cast("long"))
        .filter(col(as) <= TruncK)
        .select("qid", "vec_id", as)
    }
    (queries,
      topk(cosine(col("v"), col("qv")), "rf"),
      topk(cosine(slice(col("v"), 1, TruncDims),
        slice(col("qv"), 1, TruncDims)), "rt"))
  }

  private val ScurveProbe = 300  // bounded probe subset (the q198 cap)
  private val ScurveBinW = 0.05

  /** LSH S-curve calibration: the banding design (k = 8 signatures, 8
    * bands of 1 row) promises candidate probability 1 − (1−s)⁸ at true
    * Jaccard s. This entry MEASURES that curve — on the q198 probe
    * subset, all pairs are bucketed by exact Jaccard (0.05-wide bins)
    * and the operator's raw candidate set gives the empirical rate per
    * bin, printed beside the closed form at the bin midpoint. q198
    * answers "did we lose recall at the threshold"; this answers "is
    * the whole curve where the banding math says it should be" — the
    * audit that catches a band-hash bug that q198's single threshold
    * can't see. The theoretical power is an explicit square-square-
    * square multiply chain (pure IEEE multiplies — no cross-engine
    * `pow`), and rates derive from exact BIGINT counts. Read the
    * comparison per-bin, not as equality: the closed form is evaluated
    * at the bin MIDPOINT while real pair mass sits at the bin bottom
    * (measured sf0.01: bin 0 emp 0.0068 vs midpoint-theo 0.183 — the
    * mass-weighted theo at s ≈ 0.001 is ~0.008, consistent), so the
    * audit signal is the exact-duplicate bin pinned at 1.0 and the
    * ORDER of the curve, which a band-hash bug breaks.
    *
    * Scale shape: the audited operator keeps its production plan; the
    * all-pairs truth is bounded to the probe subset, never the corpus. */
  val q249_lsh_scurve = Q(
    "q249_lsh_scurve", {
      import graft.functions.TextFunctions.minhashRotSql
      val mid = s"($ScurveBinW * bin + ${ScurveBinW / 2})"
      val sigExprs = (0 until 8)
        .map(i => minhashRotSql("hs", i) + s" AS sig_$i").mkString(",\n  ")
      val bandRows = (0 until 8)
        .map(i => s"SELECT doc_id, $i AS band, sig_$i AS h FROM sig")
        .mkString("\n  UNION ALL ")
      Some(s"""WITH tok AS (
              |  SELECT doc_id, string_split(text, ' ') AS toks
              |  FROM documents WHERE doc_id < $ScurveProbe),
              |sh AS (
              |  SELECT doc_id, list_distinct(list_transform(
              |    generate_series(1, greatest(len(toks) - 2, 0)),
              |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
              |    AS sset
              |  FROM tok),
              |pairs AS (
              |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
              |    CAST(len(list_filter(x.sset, v -> list_contains(y.sset, v))) AS DOUBLE)
              |      / (len(x.sset) + len(y.sset)
              |         - len(list_filter(x.sset, v -> list_contains(y.sset, v)))) AS jac
              |  FROM sh x JOIN sh y ON x.doc_id < y.doc_id),
              |hsh AS (
              |  SELECT doc_id, list_transform(sset, s -> md5(s)) AS hs
              |  FROM sh),
              |sig AS (
              |  SELECT doc_id,
              |  $sigExprs
              |  FROM hsh),
              |bands AS (
              |  $bandRows),
              |cand AS (
              |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              |  FROM bands a JOIN bands b ON a.band = b.band AND a.h = b.h
              |    AND a.doc_id < b.doc_id),
              |b AS (
              |  SELECT CAST(least(19, floor(p.jac / $ScurveBinW)) AS BIGINT) AS bin,
              |    CAST(count(*) AS BIGINT) AS n_pairs,
              |    CAST(sum(CASE WHEN c.doc_a IS NULL THEN 0 ELSE 1 END)
              |      AS BIGINT) AS n_cand
              |  FROM pairs p LEFT JOIN cand c
              |    ON p.doc_a = c.doc_a AND p.doc_b = c.doc_b
              |  GROUP BY 1)
              |SELECT bin, n_pairs, n_cand,
              |  round(CAST(n_cand AS DOUBLE) / n_pairs, 6) AS emp_rate,
              |  round(1 - (((1 - $mid) * (1 - $mid)) * ((1 - $mid) * (1 - $mid)))
              |          * (((1 - $mid) * (1 - $mid)) * ((1 - $mid) * (1 - $mid))), 6)
              |    AS theo_rate
              |FROM b ORDER BY bin""".stripMargin)
    },
    (s, d) => {
      import graft.functions.TextFunctions.{shingles, tokens}
      val subset = Tables.documents(s, d).filter(col("doc_id") < ScurveProbe)
      val cand = graft.operators.Dedup.minhashNearDupPairs(
        subset, "doc_id", "text", k = 8, shingleN = 3, threshold = 0.0)
        .select(col("doc_a"), col("doc_b"), lit(1L).as("is_cand"))
      val sh = subset.select(col("doc_id"),
        graft.functions.TextFunctions.shingleSet(tokens(col("text"))).as("sset"))
      val inter = size(array_intersect(col("sa"), col("sb")))
      val jac = inter.cast("double") /
        (size(col("sa")) + size(col("sb")) - inter)
      val pairs = sh.select(col("doc_id").as("doc_a"), col("sset").as("sa"))
        .join(sh.select(col("doc_id").as("doc_b"), col("sset").as("sb")),
          col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"), jac.as("jac"))
      val mid = lit(ScurveBinW) * col("bin") + lit(ScurveBinW / 2)
      val a = lit(1) - mid
      val a2 = a * a
      val a4 = a2 * a2
      pairs.join(cand, Seq("doc_a", "doc_b"), "left")
        .groupBy(least(lit(19), floor(col("jac") / ScurveBinW)).cast("long")
          .as("bin"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(coalesce(col("is_cand"), lit(0L))).as("n_cand"))
        .select(col("bin"), col("n_pairs"), col("n_cand"),
          round(col("n_cand").cast("double") / col("n_pairs"), 6)
            .as("emp_rate"),
          round(lit(1) - a4 * a4, 6).as("theo_rate"))
        .orderBy("bin")
    })

  private val ConfAlpha = 0.9  // nominal coverage 1 − α

  /** Split-conformal coverage audit: calibration folds (q252's md5-span
    * folds 0–3) set the threshold at the ⌈(n+1)·0.9⌉-th order statistic
    * of the score (n_chars — already integer, so the order statistic is
    * an EXACT histogram-of-counts cumulative selection, the q193/q215
    * device — never an interpolated percentile); the held-out fold 4
    * then measures empirical coverage, globally and PER SOURCE. The
    * conformal guarantee is marginal — group-conditional coverage is
    * exactly where it silently fails, which is what the per-source rows
    * surface (measured sf0.01: global 0.866, sources range 0.6–1.0).
    *
    * Scale shape: the fold-tagged projection is persisted once and feeds
    * the calibration histogram, the count, and the holdout branches; the
    * cumulative window runs on the bounded score grid; the 1-row
    * threshold re-enters broadcast. */
  val q253_conformal_coverage = Q(
    "q253_conformal_coverage", {
      import graft.functions.TextFunctions.hexSpanValSql
      val fold = s"${hexSpanValSql("md5(CAST(doc_id AS VARCHAR))", 0, 2)} % 5"
      Some(s"""WITH r AS (
              |  SELECT doc_id, source, n_chars, $fold AS fold FROM documents),
              |calib AS (SELECT n_chars FROM r WHERE fold < 4),
              |nc AS (SELECT CAST(count(*) AS BIGINT) AS n_cal FROM calib),
              |k AS (SELECT least(CAST(ceil((n_cal + 1) * $ConfAlpha)
              |      AS BIGINT), n_cal) AS kth FROM nc),
              |hist AS (
              |  SELECT n_chars, CAST(count(*) AS BIGINT) AS c
              |  FROM calib GROUP BY n_chars),
              |cum AS (
              |  SELECT n_chars, CAST(sum(c) OVER (ORDER BY n_chars)
              |    AS BIGINT) AS cum FROM hist),
              |thr AS (
              |  SELECT min(n_chars) AS threshold
              |  FROM cum CROSS JOIN k WHERE cum >= kth),
              |hold AS (SELECT source, n_chars FROM r WHERE fold = 4),
              |gcov AS (
              |  SELECT round(CAST(sum(CASE WHEN n_chars <= threshold
              |      THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
              |    AS global_coverage
              |  FROM hold CROSS JOIN thr)
              |SELECT h.source, CAST(count(*) AS BIGINT) AS n_hold_src,
              |  round(CAST(sum(CASE WHEN h.n_chars <= t.threshold
              |      THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS coverage,
              |  CAST(t.threshold AS BIGINT) AS threshold, g.global_coverage
              |FROM hold h CROSS JOIN thr t CROSS JOIN gcov g
              |GROUP BY h.source, t.threshold, g.global_coverage
              |ORDER BY h.source""".stripMargin)
    },
    (s, d) => {
      import graft.functions.TextFunctions.hexSpanValSql
      val fold = expr(s"${hexSpanValSql("__h", 0, 2)} % 5")
      // persisted: the fold-tagged projection feeds the calibration
      // count, the score histogram, and the holdout branches
      val r = graft.operators.PlanCache.persist(Tables.documents(s, d)
        .withColumn("__h", md5(col("doc_id").cast("string")))
        .select(col("source"), col("n_chars"), fold.as("fold")))
      val calib = r.filter(col("fold") < 4)
      // kth clamped to n_cal (ADVICE r8): ⌈(n+1)·0.9⌉ > n whenever the
      // calibration fold has < 9 rows, and an out-of-range order
      // statistic would make the threshold (and every coverage column)
      // silently NULL — clamping reports the largest calibration score
      // (the most conservative valid threshold) instead. No-op at any
      // real scale; matters only on degenerate tiny inputs.
      val k = calib.agg(count(lit(1)).as("n_cal"))
        .select(least(ceil((col("n_cal") + 1) * ConfAlpha).cast("long"),
          col("n_cal")).as("kth"))
      val wCum = org.apache.spark.sql.expressions.Window
        .orderBy("n_chars")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val thr = calib.groupBy("n_chars").agg(count(lit(1)).as("c"))
        .withColumn("cum", sum(col("c")).over(wCum))
        .crossJoin(broadcast(k))
        .filter(col("cum") >= col("kth"))
        .agg(min(col("n_chars")).as("threshold"))
      val hold = r.filter(col("fold") === 4)
      val covered = when(col("n_chars") <= col("threshold"), 1).otherwise(0)
      val gcov = hold.crossJoin(broadcast(thr))
        .agg(round(sum(covered).cast("double") / count(lit(1)), 6)
          .as("global_coverage"))
      hold.crossJoin(broadcast(thr)).crossJoin(broadcast(gcov))
        .groupBy("source", "threshold", "global_coverage")
        .agg(count(lit(1)).as("n_hold_src"),
          round(sum(covered).cast("double") / count(lit(1)), 6).as("coverage"))
        .select(col("source"), col("n_hold_src"), col("coverage"),
          col("threshold"), col("global_coverage"))
        .orderBy("source")
    })

  /** A/B experiment readout with CUPED variance reduction — the
    * experimentation-platform workhorse this catalog didn't yet cover:
    * users split into deterministic md5 arms, pre-period activity x
    * (events before the integer-µs midpoint) regresses out of the
    * post-period metric y via θ = cov(x,y)/var(x), and the adjusted
    * per-arm means plus the achieved variance-reduction ratio are
    * reported. EVERY statistic — θ, the adjusted means,
    * 1 − var(y−θx)/var(y) — expands into the five exact BIGINT moment
    * sums (the q97/q174 mergeable-summaries discipline), so the readout
    * is bit-identical under any partitioning and the only data-sized
    * steps are one events scan and one user-keyed hash agg.
    *
    * Scale shape: per-user (x, y, arm) is a hash-agg output persisted
    * once (feeds pooled moments and per-arm sums); bounds are a 1-row
    * broadcast; everything after is arithmetic on ≤ 2 + 1 rows. */
  val q254_cuped_ab = Q(
    "q254_cuped_ab", {
      import graft.functions.TextFunctions.hexSpanValSql
      val arm = s"${hexSpanValSql("md5(CAST(user_id AS VARCHAR))", 0, 2)} % 2"
      Some(s"""WITH e AS (
              |  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS tus
              |  FROM events),
              |bounds AS (SELECT CAST(min(tus) AS BIGINT) AS t0,
              |           CAST(max(tus) AS BIGINT) AS t1 FROM e),
              |mid AS (SELECT t0 + (t1 - t0) // 2 AS tm FROM bounds),
              |u AS (
              |  SELECT user_id,
              |    CAST(sum(CASE WHEN tus < tm THEN 1 ELSE 0 END) AS BIGINT)
              |      AS x,
              |    CAST(sum(CASE WHEN tus >= tm THEN 1 ELSE 0 END) AS BIGINT)
              |      AS y,
              |    $arm AS arm
              |  FROM e CROSS JOIN mid GROUP BY user_id),
              |m AS (
              |  SELECT CAST(count(*) AS BIGINT) AS n,
              |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
              |    CAST(sum(x*y) AS BIGINT) AS sxy,
              |    CAST(sum(x*x) AS BIGINT) AS sxx,
              |    CAST(sum(y*y) AS BIGINT) AS syy
              |  FROM u),
              |th AS (
              |  SELECT CAST(n*sxy - sx*sy AS DOUBLE) / (n*sxx - sx*sx)
              |    AS theta, CAST(sx AS DOUBLE) / n AS gx FROM m),
              |a AS (
              |  SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
              |    CAST(sum(x) AS BIGINT) AS asx, CAST(sum(y) AS BIGINT) AS asy
              |  FROM u GROUP BY arm)
              |SELECT CAST(a.arm AS BIGINT) AS arm, a.n_users,
              |  round(CAST(asy AS DOUBLE) / n_users, 6) AS mean_y,
              |  round(CAST(asy AS DOUBLE) / n_users
              |    - th.theta * (CAST(asx AS DOUBLE) / n_users - th.gx), 6)
              |    AS mean_y_cuped,
              |  round(th.theta, 6) AS theta,
              |  round(1 - (CAST(m.n*m.syy - m.sy*m.sy AS DOUBLE)
              |             - 2*th.theta*(m.n*m.sxy - m.sx*m.sy)
              |             + th.theta*th.theta*(m.n*m.sxx - m.sx*m.sx))
              |          / (m.n*m.syy - m.sy*m.sy), 6) AS var_reduction
              |FROM a CROSS JOIN th CROSS JOIN m
              |ORDER BY arm""".stripMargin)
    },
    (s, d) => {
      import graft.functions.TextFunctions.hexSpanValSql
      val arm = expr(s"${hexSpanValSql("__h", 0, 2)} % 2")
      val e = Tables.events(s, d)
        .select(col("user_id"), expr("ts div 1000").as("tus"))
      val mid = e.agg(min(col("tus")).as("t0"), max(col("tus")).as("t1"))
        .select(expr("t0 + (t1 - t0) div 2").as("tm"))
      // persisted: the per-user (x, y, arm) agg feeds the pooled moment
      // row and the per-arm sums
      val u = graft.operators.PlanCache.persist(e.crossJoin(broadcast(mid))
        .groupBy("user_id")
        .agg(sum(when(col("tus") < col("tm"), 1L).otherwise(0L)).as("x"),
          sum(when(col("tus") >= col("tm"), 1L).otherwise(0L)).as("y"))
        .withColumn("__h", md5(col("user_id").cast("string")))
        .withColumn("arm", arm))
      val m = u.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      val th = m.select(
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
          / (col("n") * col("sxx") - col("sx") * col("sx"))).as("theta"),
        (col("sx").cast("double") / col("n")).as("gx"))
      val a = u.groupBy("arm").agg(count(lit(1)).as("n_users"),
        sum(col("x")).as("asx"), sum(col("y")).as("asy"))
      val vy = (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
      val cxy = col("n") * col("sxy") - col("sx") * col("sy")
      val vx = col("n") * col("sxx") - col("sx") * col("sx")
      a.crossJoin(broadcast(th)).crossJoin(broadcast(m))
        .select(col("arm").cast("long").as("arm"), col("n_users"),
          round(col("asy").cast("double") / col("n_users"), 6).as("mean_y"),
          round(col("asy").cast("double") / col("n_users")
            - col("theta") * (col("asx").cast("double") / col("n_users")
              - col("gx")), 6).as("mean_y_cuped"),
          round(col("theta"), 6).as("theta"),
          round(lit(1) - (vy - lit(2) * col("theta") * cxy
            + col("theta") * col("theta") * vx) / vy, 6).as("var_reduction"))
        .orderBy("arm")
    })

  /** RRF weights 1/(60+r) for r = 1..10, rounded once to 9 decimals and
    * shared VERBATIM by both engines (the q222 rboW device) — no
    * cross-engine division of odd denominators ever runs. */
  private val rrfW: Seq[(Int, String)] = (1 to 10).map { r =>
    r -> BigDecimal(1).bigDecimal
      .divide(new java.math.BigDecimal(60 + r), 9,
        java.math.RoundingMode.HALF_UP).toPlainString
  }

  /** Reciprocal-rank fusion of two retrievers — the standard hybrid-
    * search combiner (score = Σ 1/(60+rankᵢ), absent → 0), fusing the
    * exact full-dimension ranking with q248's cheap 16-dim truncation:
    * the production pattern where an expensive and a cheap retriever
    * vote and RRF needs no score calibration between them. Weights are
    * shared 9-decimal literals summed in exact decimal, so the fused
    * ordering is bit-stable; ties break on vec_id.
    *
    * Scale shape: both rankings are the audited bounded-probe brute
    * device; the fusion join and the top-5 window run on 8×10-row list
    * metadata. */
  val q262_rrf_fusion = Q(
    "q262_rrf_fusion", {
      Some(s"""WITH $truncRankingSqlPrefix,
              |w(r, wt) AS (VALUES
              |  ${rrfW.map { case (r, w) => s"($r, $w::DECIMAL(18,9))" }
                     .mkString(",\n              |  ")}),
              |fused AS (
              |  SELECT coalesce(f.qid, t.qid) AS qid,
              |    coalesce(f.vec_id, t.vec_id) AS vec_id,
              |    CAST(coalesce(wf.wt, 0) + coalesce(wt2.wt, 0)
              |      AS DECIMAL(18,9)) AS rrf
              |  FROM full_rk f FULL OUTER JOIN trunc_rk t
              |    ON f.qid = t.qid AND f.vec_id = t.vec_id
              |  LEFT JOIN w wf ON wf.r = f.rf
              |  LEFT JOIN w wt2 ON wt2.r = t.rt)
              |SELECT qid, vec_id, CAST(rrf AS DOUBLE) AS rrf,
              |  CAST(frank AS BIGINT) AS frank
              |FROM (
              |  SELECT qid, vec_id, rrf, ROW_NUMBER() OVER (
              |    PARTITION BY qid ORDER BY rrf DESC, vec_id) AS frank
              |  FROM fused) t
              |WHERE frank <= 5 ORDER BY qid, frank""".stripMargin)
    },
    (s, d) => {
      import s.implicits._
      val (_, full, trunc) = truncRankings(s, d)
      val w = rrfW.map { case (r, wt) => (r.toLong, BigDecimal(wt)) }
        .toDF("r", "wt")
        .select(col("r"), col("wt").cast("decimal(18,9)").as("wt"))
      val fused = full.join(trunc, Seq("qid", "vec_id"), "full_outer")
        .join(broadcast(w.toDF("rf", "wf")), Seq("rf"), "left")
        .join(broadcast(w.toDF("rt", "wt2")), Seq("rt"), "left")
        .select(col("qid"), col("vec_id"),
          (coalesce(col("wf"), lit(0)) + coalesce(col("wt2"), lit(0)))
            .cast("decimal(18,9)").as("rrf"))
      val wRank = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(col("rrf").desc, col("vec_id"))
      fused.withColumn("frank", row_number().over(wRank).cast("long"))
        .filter(col("frank") <= 5)
        .select(col("qid"), col("vec_id"),
          col("rrf").cast("double").as("rrf"), col("frank"))
        .orderBy("qid", "frank")
    })

  /** (bands, rows-per-band) factorizations of the k = 8 signature. */
  private val BandingOptions = Seq((8, 1), (4, 2), (2, 4), (1, 8))

  /** LSH banding PLANNER — q249 audits the curve the current (8, 1)
    * banding produces; this entry chooses among every factorization of
    * the k = 8 signature by evaluating each design's closed-form curve
    * 1 − (1 − s^r)^b against the CORPUS's own pair-similarity histogram
    * (the probe-bounded all-pairs bins): per (b, r) the expected
    * candidate volume Σ n_pairs·P(mid) — the verify cost the design
    * buys — and the curve's separation P(0.7) − P(0.3) — the
    * selectivity it delivers. All powers are explicit square-square-
    * square multiply chains (integer exponents only, no cross-engine
    * `pow`); expected volumes are round-then-decimal-summed per bin.
    *
    * Measured (sf0.01): the production (8, 1) design buys its
    * recall-first curve (P(0.3) = 0.94 — right for the t = 0.15 dedup
    * gate) at 8229 expected verify candidates, while (4, 2) maximizes
    * separation (0.62) at 119 — the quantified trade a threshold change
    * would re-read this table for.
    *
    * Scale shape: one probe-bounded all-pairs histogram (the q198 cap),
    * then pure literal arithmetic on the 4-design × 20-bin grid. */
  val q265_banding_planner = Q(
    "q265_banding_planner", {
      def sq(t: String) = s"($t * $t)"
      def powTxt(x: String, n: Int): String = n match {
        case 1 => x
        case 2 => sq(x)
        case 4 => sq(sq(x))
        case 8 => sq(sq(sq(x)))
      }
      def pTxt(s: String, b: Int, r: Int) =
        s"(1 - ${powTxt(s"(1 - ${powTxt(s, r)})", b)})"
      val mid = s"($ScurveBinW * bin + ${ScurveBinW / 2})"
      def designRow(b: Int, r: Int) =
        s"""SELECT $b AS bands, $r AS rows_per_band,
           |    round(${pTxt("0.3", b, r)}, 6) AS p_at_030,
           |    round(${pTxt("0.7", b, r)}, 6) AS p_at_070,
           |    round(${pTxt("0.7", b, r)} - ${pTxt("0.3", b, r)}, 6)
           |      AS separation,
           |    round(CAST((SELECT sum(CAST(round(n_pairs * ${pTxt(mid, b, r)}, 9)
           |        AS DECIMAL(28,9))) FROM bins) AS DOUBLE), 3)
           |      AS exp_candidates""".stripMargin
      Some(s"""WITH tok AS (
              |  SELECT doc_id, string_split(text, ' ') AS toks
              |  FROM documents WHERE doc_id < $ScurveProbe),
              |sh AS (
              |  SELECT doc_id, list_transform(list_distinct(list_transform(
              |    generate_series(1, greatest(len(toks) - 2, 0)),
              |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])),
              |    s -> md5(s)) AS sset
              |  FROM tok),
              |pairs AS (
              |  SELECT CAST(least(19, floor(
              |    (CAST(len(list_filter(x.sset, v -> list_contains(y.sset, v))) AS DOUBLE)
              |      / (len(x.sset) + len(y.sset)
              |         - len(list_filter(x.sset, v -> list_contains(y.sset, v)))))
              |    / $ScurveBinW)) AS BIGINT) AS bin
              |  FROM sh x JOIN sh y ON x.doc_id < y.doc_id),
              |bins AS (
              |  SELECT bin, CAST(count(*) AS BIGINT) AS n_pairs
              |  FROM pairs GROUP BY bin)
              |SELECT * FROM (
              |  ${BandingOptions.map { case (b, r) => designRow(b, r) }
                   .mkString("\n  UNION ALL\n  ")})
              |ORDER BY bands DESC""".stripMargin)
    },
    (s, d) => {
      import s.implicits._
      import graft.functions.TextFunctions.{tokens, md5Shingles, sortedIntersectCount}
      def powCol(x: org.apache.spark.sql.Column, n: Int): org.apache.spark.sql.Column =
        n match {
          case 1 => x
          case 2 => x * x
          case 4 => { val a = x * x; a * a }
          case 8 => { val a = x * x; val b = a * a; b * b }
        }
      def p(sv: org.apache.spark.sql.Column, b: Int, r: Int) =
        lit(1) - powCol(lit(1) - powCol(sv, r), b)
      val subset = Tables.documents(s, d).filter(col("doc_id") < ScurveProbe)
      val sets = subset.select(col("doc_id"),
        sort_array(md5Shingles(tokens(col("text")), 3)).as("sh"))
        .select(col("doc_id"), col("sh"), size(col("sh")).as("n"))
      val inter = sortedIntersectCount(col("sa"), col("sb")).cast("long")
      val jac = inter.cast("double") / (col("na") + col("nb") - inter)
      // checkpoint: the 20-row bin histogram feeds one branch per design
      val bins = sets.toDF("doc_a", "sa", "na")
        .join(sets.toDF("doc_b", "sb", "nb"), col("doc_a") < col("doc_b"))
        .groupBy(least(lit(19), floor(jac / ScurveBinW)).cast("long")
          .as("bin"))
        .agg(count(lit(1)).as("n_pairs"))
        .localCheckpoint(true)
      val mid = lit(ScurveBinW) * col("bin") + lit(ScurveBinW / 2)
      val rows = BandingOptions.map { case (b, r) =>
        val expCand = bins
          .select(round(col("n_pairs") * p(mid, b, r), 9)
            .cast("decimal(28,9)").as("t"))
          .agg(round(sum(col("t")).cast("double"), 3).as("exp_candidates"))
        expCand.select(lit(b).as("bands"), lit(r).as("rows_per_band"),
          round(p(lit(0.3), b, r), 6).as("p_at_030"),
          round(p(lit(0.7), b, r), 6).as("p_at_070"),
          round(p(lit(0.7), b, r) - p(lit(0.3), b, r), 6).as("separation"),
          col("exp_candidates"))
      }
      rows.reduce(_.unionAll(_)).orderBy(col("bands").desc)
    })

  /** Two-proportion z-test between the q254 experiment arms — the
    * INFERENCE readout the CUPED entry's point estimates feed: per-user
    * high-value conversion (any purchase > 250), pooled-variance z from
    * the four exact BIGINT counts through one shared double expression
    * (sqrt IEEE-exact). A degenerate pool (all or none converted)
    * reports z = 0 by explicit guard rather than NaN — identically on
    * both engines.
    *
    * Scale shape: one user-keyed hash agg, one 4-count roll-up, scalar
    * arithmetic. */
  val q270_two_proportion_z = Q(
    "q270_two_proportion_z", {
      import graft.functions.TextFunctions.hexSpanValSql
      val arm = s"${hexSpanValSql("md5(CAST(user_id AS VARCHAR))", 0, 2)} % 2"
      Some(s"""WITH u AS (
              |  SELECT user_id, $arm AS arm,
              |    CAST(max(CASE WHEN event_type = 'purchase' AND value > 250
              |      THEN 1 ELSE 0 END) AS BIGINT) AS converted
              |  FROM events GROUP BY user_id),
              |a AS (
              |  SELECT
              |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
              |      AS n0,
              |    CAST(sum(CASE WHEN arm = 0 THEN converted ELSE 0 END)
              |      AS BIGINT) AS c0,
              |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
              |      AS n1,
              |    CAST(sum(CASE WHEN arm = 1 THEN converted ELSE 0 END)
              |      AS BIGINT) AS c1
              |  FROM u)
              |SELECT n0, c0, n1, c1,
              |  round(CAST(c0 AS DOUBLE) / n0, 6) AS p0,
              |  round(CAST(c1 AS DOUBLE) / n1, 6) AS p1,
              |  round(CASE WHEN c0 + c1 > 0 AND c0 + c1 < n0 + n1
              |    THEN (CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0)
              |      / sqrt(CAST(c0 + c1 AS DOUBLE) / (n0 + n1)
              |        * (1 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
              |        * (1.0 / n0 + 1.0 / n1))
              |    ELSE 0 END, 6) AS z
              |FROM a""".stripMargin)
    },
    (s, d) => {
      import graft.functions.TextFunctions.hexSpanValSql
      val arm = expr(s"${hexSpanValSql("__h", 0, 2)} % 2")
      val u = Tables.events(s, d)
        .withColumn("__h", md5(col("user_id").cast("string")))
        .groupBy(col("user_id"), arm.as("arm"))
        .agg(max(when(col("event_type") === "purchase" &&
          col("value") > 250, 1L).otherwise(0L)).as("converted"))
      val a = u.agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("arm") === 0, col("converted")).otherwise(0L)).as("c0"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("arm") === 1, col("converted")).otherwise(0L)).as("c1"))
      val pp = (col("c0") + col("c1")).cast("double") / (col("n0") + col("n1"))
      val z = (col("c1").cast("double") / col("n1")
        - col("c0").cast("double") / col("n0")) /
        sqrt(pp * (lit(1) - pp) * (lit(1.0) / col("n0") + lit(1.0) / col("n1")))
      a.select(col("n0"), col("c0"), col("n1"), col("c1"),
        round(col("c0").cast("double") / col("n0"), 6).as("p0"),
        round(col("c1").cast("double") / col("n1"), 6).as("p1"),
        round(when(col("c0") + col("c1") > 0 &&
          col("c0") + col("c1") < col("n0") + col("n1"), z)
          .otherwise(lit(0)), 6).as("z"))
    })

  val all: Seq[Q] = Seq(q247_cohens_kappa, q248_truncation_audit,
    q249_lsh_scurve, q253_conformal_coverage, q254_cuped_ab,
    q262_rrf_fusion, q265_banding_planner, q270_two_proportion_z)
}
