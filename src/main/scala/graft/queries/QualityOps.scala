package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Statistical quality control: unigram log-probability scoring (the
  * perplexity-filter stand-in a curation pipeline runs), deterministic
  * z-score outlier flagging, and a Deequ-style data-quality constraint
  * report — each oracle-checked.
  */
object QualityOps {

  /** Corpus-unigram log-probability per document: p(term) from global
    * term frequencies, score = mean log p over the document's tokens.
    * Low scorers are boilerplate/garbage candidates — the cheap proxy
    * for perplexity filtering. Per-token logprobs are rounded then
    * summed in EXACT decimal, so the per-doc mean is independent of
    * aggregation order (a raw double sum would drift under partial-agg
    * reordering). Two hash aggs + one broadcast of the term table. */
  val q89_unigram_logprob = Q(
    "q89_unigram_logprob",
    Some("""WITH tok AS (
            |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
            |  FROM documents),
            |tf AS (SELECT term, CAST(count(*) AS BIGINT) AS f FROM tok GROUP BY term),
            |n AS (SELECT CAST(count(*) AS BIGINT) AS total FROM tok)
            |SELECT doc_id,
            |  CAST(count(*) AS BIGINT) AS n_tokens,
            |  CAST(CAST(sum(CAST(round(ln(CAST(f AS DOUBLE) / total), 8)
            |        AS DECIMAL(20,8))) AS DOUBLE) / count(*) AS DOUBLE)
            |    AS mean_logp
            |FROM tok JOIN tf ON tok.term = tf.term CROSS JOIN n
            |GROUP BY doc_id
            |ORDER BY doc_id""".stripMargin),
    (s, d) => {
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      val tf = tok.groupBy("term").agg(count(lit(1)).as("f"))
      val n = tok.agg(count(lit(1)).as("total"))
      tok.join(broadcast(tf), "term")
        .crossJoin(broadcast(n))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          (sum(round(log(col("f").cast("double") / col("total")), 8)
            .cast("decimal(20,8)")).cast("double") / count(lit(1)))
            .cast("double").as("mean_logp"))
        .orderBy("doc_id")
    })

  /** Per-group z-score outliers with EXACT moments: the metric value is
    * fixed at 6 decimals up front, then mean and variance come from
    * decimal sums of x and x² (6-decimal x ⇒ x² exact in 12), so the
    * flag is bit-deterministic under any partial-agg order — the
    * discipline a plain double stddev can't offer (its sum order drifts
    * under retries/speculation). One agg + one broadcast join back;
    * flags |z| > 3 on the events value (the one heavy-tailed column in
    * the test data). */
  val q90_zscore_outliers = Q(
    "q90_zscore_outliers",
    Some("""WITH v AS (
            |  SELECT event_id, event_type,
            |    CAST(round(value, 6) AS DECIMAL(30,6)) AS x
            |  FROM events),
            |m AS (
            |  SELECT event_type,
            |    CAST(sum(x) AS DOUBLE) / count(*) AS mu,
            |    sqrt(CAST(sum(x * x) AS DOUBLE) / count(*)
            |      - (CAST(sum(x) AS DOUBLE) / count(*))
            |        * (CAST(sum(x) AS DOUBLE) / count(*))) AS sigma
            |  FROM v GROUP BY event_type)
            |SELECT event_id, v.event_type,
            |  round((CAST(x AS DOUBLE) - mu) / sigma, 6) AS z
            |FROM v JOIN m ON v.event_type = m.event_type
            |WHERE abs((CAST(x AS DOUBLE) - mu) / sigma) > 3
            |ORDER BY event_id""".stripMargin),
    (s, d) => {
      val v = Tables.events(s, d).select(col("event_id"), col("event_type"),
        round(col("value"), 6).cast("decimal(30,6)").as("x"))
      val m = v.groupBy("event_type").agg(
        (sum(col("x")).cast("double") / count(lit(1))).as("mu"),
        sqrt((sum(col("x") * col("x")).cast("double") / count(lit(1))) -
          (sum(col("x")).cast("double") / count(lit(1))) *
          (sum(col("x")).cast("double") / count(lit(1)))).as("sigma"))
      v.join(broadcast(m), "event_type")
        .withColumn("z", (col("x").cast("double") - col("mu")) / col("sigma"))
        .filter(abs(col("z")) > 3)
        .select(col("event_id"), col("event_type"), round(col("z"), 6).as("z"))
        .orderBy("event_id")
    })

  /** Data-quality constraint report (the Deequ-style gate before a
    * dataset ships): one scan computes every check's violation count —
    * null rate, range bound, key uniqueness, referential shape — then
    * unpivots to one row per check. Adding a check costs one column in
    * the agg, never another scan. */
  val q91_dq_checks = Q(
    "q91_dq_checks",
    Some("""WITH a AS (
            |  SELECT
            |    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_custkey,
            |    CAST(sum(CASE WHEN o_totalprice <= 0 OR o_totalprice > 1000000 THEN 1 ELSE 0 END) AS BIGINT) AS price_range,
            |    CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS dup_orderkey,
            |    CAST(sum(CASE WHEN TRY_CAST(o_orderdate AS DATE) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS bad_orderdate
            |  FROM orders)
            |SELECT 'null_custkey' AS check_name, null_custkey AS n_violations,
            |  null_custkey = 0 AS passed FROM a
            |UNION ALL SELECT 'price_range', price_range, price_range = 0 FROM a
            |UNION ALL SELECT 'dup_orderkey', dup_orderkey, dup_orderkey = 0 FROM a
            |UNION ALL SELECT 'bad_orderdate', bad_orderdate, bad_orderdate = 0 FROM a
            |ORDER BY check_name""".stripMargin),
    (s, d) => {
      val a = Tables.orders(s, d).agg(
        sum(when(col("o_custkey").isNull, 1).otherwise(0)).cast("long")
          .as("null_custkey"),
        sum(when(col("o_totalprice") <= 0 || col("o_totalprice") > 1000000, 1)
          .otherwise(0)).cast("long").as("price_range"),
        (count(lit(1)) - count_distinct(col("o_orderkey"))).cast("long")
          .as("dup_orderkey"),
        sum(when(expr("try_cast(o_orderdate as date)").isNull, 1).otherwise(0))
          .cast("long").as("bad_orderdate"))
      a.select(expr(
        """stack(4,
          |  'null_custkey', null_custkey,
          |  'price_range', price_range,
          |  'dup_orderkey', dup_orderkey,
          |  'bad_orderdate', bad_orderdate) AS (check_name, n_violations)""".stripMargin))
        .withColumn("passed", col("n_violations") === 0)
        .orderBy("check_name")
    })

  /** Bivariate statistics from EXACT decimal moments: covariance and
    * Pearson correlation of (quantity, price) per return flag, computed
    * from exact sums of x, y, xy, x², y² (2-decimal inputs ⇒ products
    * exact in 4 decimals) — deterministic under any partial-agg order,
    * where the built-in double corr() drifts. One scan, one hash agg. */
  val q97_bivariate_stats = Q(
    "q97_bivariate_stats",
    Some("""WITH m AS (
            |  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
            |    CAST(sum(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sx,
            |    CAST(sum(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS sy,
            |    CAST(sum(CAST(l_quantity AS DECIMAL(30,2))
            |           * CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS sxy,
            |    CAST(sum(CAST(l_quantity AS DECIMAL(30,2))
            |           * CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sxx,
            |    CAST(sum(CAST(l_extendedprice AS DECIMAL(30,2))
            |           * CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS syy
            |  FROM lineitem GROUP BY l_returnflag)
            |SELECT l_returnflag, n,
            |  round((sxy - sx * sy / n) / n, 6) AS cov_pop,
            |  round((sxy - sx * sy / n)
            |    / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)), 6) AS corr
            |FROM m
            |ORDER BY l_returnflag""".stripMargin),
    (s, d) => {
      val x = col("l_quantity").cast("decimal(30,2)")
      val y = col("l_extendedprice").cast("decimal(30,2)")
      Tables.lineitem(s, d).groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(x).cast("double").as("sx"), sum(y).cast("double").as("sy"),
          sum(x * y).cast("double").as("sxy"),
          sum(x * x).cast("double").as("sxx"),
          sum(y * y).cast("double").as("syy"))
        .select(col("l_returnflag"), col("n"),
          round((col("sxy") - col("sx") * col("sy") / col("n")) / col("n"), 6)
            .as("cov_pop"),
          round((col("sxy") - col("sx") * col("sy") / col("n")) /
            sqrt((col("sxx") - col("sx") * col("sx") / col("n")) *
              (col("syy") - col("sy") * col("sy") / col("n"))), 6).as("corr"))
        .orderBy("l_returnflag")
    })

  /** Median absolute deviation — the robust scale estimate (q90's
    * z-score breaks on heavy tails; MAD does not): per event type,
    * median of |x − median(x)| via exact percentiles. Two grouped
    * aggregations, the second over the residuals. */
  val q98_mad = Q(
    "q98_mad",
    Some("""WITH med AS (
            |  SELECT event_type, quantile_cont(value, 0.5) AS med
            |  FROM events GROUP BY event_type)
            |SELECT e.event_type,
            |  round(max(med), 6) AS median,
            |  round(quantile_cont(abs(e.value - med), 0.5), 6) AS mad
            |FROM events e JOIN med ON e.event_type = med.event_type
            |GROUP BY e.event_type
            |ORDER BY e.event_type""".stripMargin),
    (s, d) => {
      val ev = Tables.events(s, d)
      val med = ev.groupBy("event_type")
        .agg(expr("percentile(value, 0.5)").as("med"))
      ev.join(broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(round(max(col("med")), 6).as("median"),
          round(expr("percentile(abs(value - med), 0.5)"), 6).as("mad"))
        .orderBy("event_type")
    })

  /** Column profiling report (the dataset-card staple): per column, row
    * count, null count, exact distinct count, and min/max rendered
    * through engine-portable types (DECIMAL(18,2) / DATE before the
    * string cast — raw double/timestamp formatting differs between
    * engines). ONE scan computes every statistic (q91's stack pattern:
    * a profile column costs a column, not a scan); the oracle spells the
    * same stats as per-column selects. */
  val q121_profile = Q(
    "q121_profile", {
      def row(c: String, v: String) =
        s"""SELECT '$c' AS col, CAST(count(*) AS BIGINT) AS n,
           |  CAST(count(*) - count($v) AS BIGINT) AS n_null,
           |  CAST(count(DISTINCT $v) AS BIGINT) AS n_distinct,
           |  CAST(min($v) AS VARCHAR) AS min_v, CAST(max($v) AS VARCHAR) AS max_v
           |FROM orders""".stripMargin
      Some(Seq(
        row("o_orderstatus", "o_orderstatus"),
        row("o_orderpriority", "o_orderpriority"),
        row("o_totalprice", "CAST(o_totalprice AS DECIMAL(18,2))"),
        row("o_orderdate", "CAST(o_orderdate AS DATE)"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY col"))
    },
    (s, d) => {
      val cols = Seq(
        "o_orderstatus" -> col("o_orderstatus"),
        "o_orderpriority" -> col("o_orderpriority"),
        "o_totalprice" -> col("o_totalprice").cast("decimal(18,2)"),
        "o_orderdate" -> to_date(col("o_orderdate")))
      val aggs = cols.flatMap { case (name, c) => Seq(
        count(lit(1)).as(s"${name}__n"),
        (count(lit(1)) - count(c)).cast("long").as(s"${name}__nn"),
        count_distinct(c).as(s"${name}__nd"),
        min(c).cast("string").as(s"${name}__mn"),
        max(c).cast("string").as(s"${name}__mx"))
      }
      val stackArgs = cols.map { case (name, _) =>
        s"'$name', ${name}__n, ${name}__nn, ${name}__nd, ${name}__mn, ${name}__mx"
      }.mkString(",\n  ")
      // spread before the profile agg: 4 count-distinct groups Expand the
      // scan ×5 and min/max(string) forces SortAggregate — on a one-file
      // scan the whole partial pass ran on one core (r16, scale-gated)
      graft.operators.Spread.byKey(Tables.orders(s, d), "o_orderkey")
        .agg(aggs.head, aggs.tail: _*)
        .select(expr(
          s"stack(${cols.size},\n  $stackArgs) AS (col, n, n_null, n_distinct, min_v, max_v)"))
        .orderBy("col")
    })

  private val HistBuckets = 10

  /** Equi-width histogram per group (q121's distribution companion) over
    * a FIXED [1, 51) domain in 10 buckets of width 5 — a data-derived
    * domain would need a min/max pre-pass (two scans); the fixed domain
    * is the profiling-dashboard convention and keeps this one scan + one
    * hash agg. The bucket expression is explicit floor arithmetic shared
    * verbatim by both engines (DuckDB 1.0 has no width_bucket); exact
    * bucket boundaries only occur at integer quantities, where the
    * double division is exact. */
  private val histBucket =
    s"CAST(least(floor((l_quantity - 1) / 5.0), ${HistBuckets - 1}) AS BIGINT) + 1"

  val q129_histogram = Q(
    "q129_histogram",
    Some(s"""SELECT l_returnflag,
            |  $histBucket AS bucket,
            |  CAST(count(*) AS BIGINT) AS n
            |FROM lineitem
            |GROUP BY l_returnflag, bucket
            |ORDER BY l_returnflag, bucket""".stripMargin),
    (s, d) => Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), expr(histBucket).as("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy("l_returnflag", "bucket"))

  /** Winsorized (robust) mean: per group, clamp values into the exact
    * [p05, p95] band, then average — the outlier-tolerant location
    * estimate that complements q90's z-score flags and q98's MAD scale.
    * Thresholds are rounded to 6 decimals BEFORE clamping so both engines
    * clamp with bit-identical bounds; the mean routes through an exact
    * decimal sum (clamped values are ≤6-decimal by construction), so it
    * survives any partial-agg order. The threshold frame is rows-per-group
    * tiny and broadcasts. At extreme per-group cardinality the exact
    * percentile stage swaps for the q65 gated sketch — the clamp+mean
    * machinery is unchanged. */
  val q139_winsorized_mean = Q(
    "q139_winsorized_mean",
    Some("""WITH th AS (
            |  SELECT event_type,
            |    round(quantile_cont(value, 0.05), 6) AS p05,
            |    round(quantile_cont(value, 0.95), 6) AS p95
            |  FROM events GROUP BY event_type)
            |SELECT e.event_type, th.p05, th.p95,
            |  CAST(count(*) AS BIGINT) AS n,
            |  round(CAST(sum(CAST(least(greatest(e.value, th.p05), th.p95)
            |      AS DECIMAL(18,6))) AS DOUBLE)
            |    / CAST(count(*) AS DOUBLE), 6) AS wins_mean
            |FROM events e JOIN th ON th.event_type = e.event_type
            |GROUP BY e.event_type, th.p05, th.p95
            |ORDER BY e.event_type""".stripMargin),
    (s, d) => {
      val ev = Tables.events(s, d)
      val th = ev.groupBy("event_type")
        .agg(round(expr("percentile(value, 0.05)"), 6).as("p05"),
          round(expr("percentile(value, 0.95)"), 6).as("p95"))
      ev.join(broadcast(th), "event_type")
        .withColumn("wv", least(greatest(col("value"), col("p05")), col("p95")))
        .groupBy("event_type", "p05", "p95")
        .agg(count(lit(1)).as("n"),
          round(sum(col("wv").cast("decimal(18,6)")).cast("double") /
            count(lit(1)).cast("double"), 6).as("wins_mean"))
        .orderBy("event_type")
    })

  /** Median imputation (data repair): simulated missingness (every 7th
    * order's price masked, the q115 masking device) filled with the
    * PER-GROUP median of the surviving values — the robust-impute
    * counterpart of q139's robust mean. The median is rounded to cents
    * BEFORE imputing, so the filled column stays exact DECIMAL money and
    * the downstream sum survives any partial-agg order; the per-group
    * medians are a tiny broadcast frame. The output reports how much was
    * imputed next to the repaired aggregate — an imputation you can't
    * audit is a silent bias. */
  val q145_median_impute = Q(
    "q145_median_impute",
    Some("""WITH m AS (
            |  SELECT o_orderpriority,
            |    CASE WHEN o_orderkey % 7 = 0 THEN NULL
            |         ELSE CAST(o_totalprice AS DECIMAL(18,2)) END AS price
            |  FROM orders),
            |med AS (
            |  SELECT o_orderpriority,
            |    CAST(round(quantile_cont(CAST(price AS DOUBLE), 0.5), 2)
            |      AS DECIMAL(18,2)) AS med
            |  FROM m WHERE price IS NOT NULL GROUP BY o_orderpriority)
            |SELECT m.o_orderpriority,
            |  CAST(count(*) AS BIGINT) AS n,
            |  CAST(count(*) FILTER (WHERE price IS NULL) AS BIGINT)
            |    AS n_imputed,
            |  CAST(sum(coalesce(price, med)) AS DOUBLE) AS total_repaired
            |FROM m JOIN med ON med.o_orderpriority = m.o_orderpriority
            |GROUP BY m.o_orderpriority
            |ORDER BY m.o_orderpriority""".stripMargin),
    (s, d) => {
      val m = Tables.orders(s, d)
        .select(col("o_orderpriority"),
          when(col("o_orderkey") % 7 === 0, lit(null))
            .otherwise(col("o_totalprice").cast("decimal(18,2)")).as("price"))
      val med = m.filter(col("price").isNotNull)
        .groupBy("o_orderpriority")
        .agg(round(expr("percentile(CAST(price AS DOUBLE), 0.5)"), 2)
          .cast("decimal(18,2)").as("med"))
      m.join(broadcast(med), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          count(when(col("price").isNull, 1)).as("n_imputed"),
          sum(coalesce(col("price"), col("med"))).cast("double")
            .as("total_repaired"))
        .orderBy("o_orderpriority")
    })

  /** Multinomial naive-Bayes language-ID, trained AND honestly evaluated
    * on the corpus (train folds 0–3 by the md5 doc draw, test fold 4 —
    * q253's split device): Laplace-smoothed per-(term, lang) log-likelihoods
    * plus log priors, per-test-doc argmax, and the full confusion matrix —
    * the cheap trained classifier a curation pipeline prefers over the
    * q29-style n-gram heuristic once it has labels. EVERY score is an
    * exact DECIMAL(·,8) sum of per-term rounded log-probs (tf × round(lnp,
    * 8)), so the argmax — including its lang tie-break — is bit-identical
    * across engines and partial-agg orders; no raw double ever rides a
    * shuffle.
    *
    * Scale shape: one corpus token agg; the model is a vocab×langs table
    * (broadcast — vocab ≪ corpus, the q175 rule) joined LEFT so unseen
    * terms fall back to the per-lang smoothing floor; candidate rows =
    * test tokens × |langs| (a constant fanout), ranked by a doc-keyed
    * 5-row window. */
  /** Shared oracle-SQL prefix for the naive-Bayes chain (q368 + q372):
    * CTEs from tokenization through `sc` = per-(test doc, candidate
    * lang) exact DECIMAL(20,8) log-posterior score. Kept as one string
    * so the two entries can never drift apart on the model. */
  private val NbSqlThroughSc: String = {
    import graft.functions.TextFunctions.hexSpanValSql
    val fold = s"${hexSpanValSql("md5(CAST(doc_id AS VARCHAR))", 0, 2)} % 5"
    (s"""WITH base AS (
              |  SELECT doc_id, lang, $fold AS fold,
              |    unnest(string_split(text, ' ')) AS term
              |  FROM documents),
              |tok AS (
              |  SELECT doc_id, lang, fold, term, CAST(count(*) AS BIGINT) AS tf
              |  FROM base WHERE len(term) > 0 GROUP BY 1, 2, 3, 4),
              |tr AS (SELECT * FROM tok WHERE fold < 4),
              |model AS (
              |  SELECT term, lang, CAST(sum(tf) AS BIGINT) AS c
              |  FROM tr GROUP BY 1, 2),
              |lt AS (SELECT lang, CAST(sum(c) AS BIGINT) AS tot
              |       FROM model GROUP BY 1),
              |vv AS (SELECT CAST(count(DISTINCT term) AS BIGINT) AS v
              |       FROM model),
              |nd AS (
              |  SELECT lang, CAST(count(DISTINCT doc_id) AS BIGINT) AS ndl
              |  FROM documents WHERE $fold < 4 GROUP BY 1),
              |ndt AS (SELECT CAST(sum(ndl) AS BIGINT) AS ndall FROM nd),
              |lstat AS (
              |  SELECT l.lang, tot, v,
              |    CAST(round(ln(CAST(ndl AS DOUBLE) / ndall), 8)
              |      AS DECIMAL(20,8)) AS plp,
              |    CAST(round(ln(1.0 / (tot + v)), 8) AS DECIMAL(20,8)) AS dlp
              |  FROM lt l JOIN nd USING (lang) CROSS JOIN vv CROSS JOIN ndt),
              |te AS (SELECT doc_id, lang AS true_lang, term, tf
              |       FROM tok WHERE fold = 4),
              |cand AS (
              |  SELECT t.doc_id, t.true_lang, s.lang, s.plp,
              |    CAST(t.tf AS DECIMAL(12,0))
              |      * coalesce(CAST(round(ln(CAST(m.c + 1 AS DOUBLE)
              |        / (s.tot + s.v)), 8) AS DECIMAL(20,8)), s.dlp)
              |      AS contrib
              |  FROM te t CROSS JOIN lstat s
              |  LEFT JOIN model m ON m.term = t.term AND m.lang = s.lang),
              |sc AS (
              |  SELECT doc_id, true_lang, lang,
              |    max(plp) + sum(contrib) AS score
              |  FROM cand GROUP BY 1, 2, 3)""").stripMargin
  }

  val q368_naive_bayes_langid = Q(
    "q368_naive_bayes_langid",
    Some(NbSqlThroughSc + """,
              |pred AS (
              |  SELECT doc_id, true_lang, lang AS pred,
              |    ROW_NUMBER() OVER (PARTITION BY doc_id
              |      ORDER BY score DESC, lang) AS rk
              |  FROM sc)
              |SELECT true_lang AS lang, pred, CAST(count(*) AS BIGINT) AS n
              |FROM pred WHERE rk = 1
              |GROUP BY 1, 2 ORDER BY lang, pred""".stripMargin),
    (s, d) => {
      val sc = nbScores(s, d)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("score").desc, col("lang"))
      sc.withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .groupBy(col("true_lang").as("lang"), col("lang").as("pred"))
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "pred")
    })

  /** Spark side of `NbSqlThroughSc`: per-(test doc, candidate lang)
    * exact decimal log-posterior scores — the shared model behind the
    * q368 confusion matrix and the q372 calibration audit. Persists the
    * token and model frames (each feeds two+ aggregations). */
  private def nbScores(s: SparkSession, d: String): DataFrame = {
    import graft.functions.TextFunctions.hexSpanValSql
      val fold = graft.functions.TextFunctions.hexSpanVal(
        org.apache.spark.sql.functions.col("__h"), 0, 2) % 5
      // spread before the tokenize/explode head: the corpus token agg's
      // map side (split + explode + partial count) is the chain's big
      // CPU term and a single parquet file would run it on one core (r16)
      val docs = graft.operators.Spread.byKey(Tables.documents(s, d), "doc_id")
        .withColumn("__h", md5(col("doc_id").cast("string")))
      val tok = graft.operators.PlanCache.persist(docs
        .select(col("doc_id"), col("lang"), fold.as("fold"),
          explode(split(col("text"), " ")).as("term"))
        .filter(length(col("term")) > 0)
        .groupBy("doc_id", "lang", "fold", "term")
        .agg(count(lit(1)).as("tf")))
      val model = graft.operators.PlanCache.persist(
        tok.filter(col("fold") < 4)
          .groupBy("term", "lang").agg(sum("tf").cast("long").as("c")))
      val lt = model.groupBy("lang").agg(sum("c").cast("long").as("tot"))
      val vv = model.agg(countDistinct("term").as("v"))
      // documents are one row per doc_id, so the per-lang doc count is a
      // plain count — count(DISTINCT) would plan an Expand double-shuffle
      val nd = docs.filter(fold < 4)
        .groupBy("lang").agg(count(lit(1)).as("ndl"))
      val ndt = nd.agg(sum("ndl").cast("long").as("ndall"))
      val lstat = lt.join(nd, "lang")
        .crossJoin(broadcast(vv)).crossJoin(broadcast(ndt))
        .select(col("lang"), col("tot"), col("v"),
          round(log(col("ndl").cast("double") / col("ndall")), 8)
            .cast("decimal(20,8)").as("plp"),
          round(log(lit(1.0) / (col("tot") + col("v"))), 8)
            .cast("decimal(20,8)").as("dlp"))
      val te = tok.filter(col("fold") === 4)
        .select(col("doc_id"), col("lang").as("true_lang"),
          col("term"), col("tf"))
      val cand = te.crossJoin(broadcast(lstat))
        .join(broadcast(model), Seq("term", "lang"), "left")
        .select(col("doc_id"), col("true_lang"), col("lang"), col("plp"),
          // tf rides as DECIMAL(12,0), not LONG: long × decimal(20,8)
          // would overflow precision 38 and Spark would then drop the
          // result scale to 6 (allowPrecisionLoss), silently truncating
          // the 7th/8th log-prob decimals the oracle keeps — the r8
          // decimal-truncation trap, found here by q372's conf drift.
          (col("tf").cast("decimal(12,0)") * coalesce(
            round(log((col("c") + 1).cast("double")
              / (col("tot") + col("v"))), 8).cast("decimal(20,8)"),
            col("dlp"))).as("contrib"))
      cand.groupBy("doc_id", "true_lang", "lang")
        .agg((max(col("plp")) + sum(col("contrib"))).as("score"))
  }

  /** Calibration audit of the q368 classifier — the post-training step a
    * labeling pipeline runs before TRUSTING the model's confidence for
    * routing/auto-accept: per test doc the softmax confidence of the
    * argmax language (exp of exact-decimal score gaps, so the softmax's
    * only float op is one exp + one divide on deterministic inputs),
    * then the RELIABILITY TABLE (decile confidence bins × empirical
    * accuracy), the Brier score, and the expected calibration error.
    * ECE folds to Σ_b |n_correct_b − Σconf_b| / N — all-decimal until
    * the final display divides. An over-confident bin (avg_conf ≫ acc)
    * is the signal to recalibrate before using scores as probabilities.
    *
    * Scale shape: inherits the q368 chain (one corpus token agg, vocab
    * broadcast, constant |langs| fanout); everything after `sc` is
    * doc-keyed aggs onto a ≤ 10-row bin grid. */
  val q372_nb_calibration = Q(
    "q372_nb_calibration",
    Some(NbSqlThroughSc + """,
              |pred AS (
              |  SELECT doc_id, true_lang, lang,
              |    ROW_NUMBER() OVER (PARTITION BY doc_id
              |      ORDER BY score DESC, lang) AS rk
              |  FROM sc),
              |mx AS (SELECT doc_id, max(score) AS smax FROM sc GROUP BY 1),
              |rel AS (
              |  SELECT sc.doc_id,
              |    CAST(round(exp(CAST(sc.score - mx.smax AS DOUBLE)), 8)
              |      AS DECIMAL(20,8)) AS r
              |  FROM sc JOIN mx ON sc.doc_id = mx.doc_id),
              |rs AS (SELECT doc_id, sum(r) AS rsum FROM rel GROUP BY 1),
              |per AS (
              |  SELECT p.doc_id,
              |    CASE WHEN p.lang = p.true_lang THEN 1 ELSE 0 END AS correct,
              |    CAST(round(1.0 / CAST(rs.rsum AS DOUBLE), 6)
              |      AS DECIMAL(10,6)) AS conf
              |  FROM pred p JOIN rs ON p.doc_id = rs.doc_id
              |  WHERE p.rk = 1),
              |binned AS (
              |  SELECT least(CAST(floor(conf * 10) AS BIGINT), 9) AS bin,
              |    correct, conf
              |  FROM per),
              |bins AS (
              |  SELECT bin, CAST(count(*) AS BIGINT) AS n,
              |    CAST(sum(correct) AS BIGINT) AS n_correct,
              |    sum(conf) AS sumconf
              |  FROM binned GROUP BY 1),
              |gl AS (
              |  SELECT round(CAST(sum((conf - correct) * (conf - correct))
              |      AS DOUBLE) / count(*), 6) AS brier,
              |    CAST(count(*) AS BIGINT) AS nn
              |  FROM binned),
              |es AS (
              |  SELECT sum(abs(CAST(n_correct AS DECIMAL(20,6)) - sumconf))
              |    AS sabs FROM bins)
              |SELECT bin, n, n_correct,
              |  round(CAST(sumconf AS DOUBLE) / n, 6) AS avg_conf,
              |  round(CAST(n_correct AS DOUBLE) / n, 6) AS acc,
              |  gl.brier AS brier,
              |  round(CAST(es.sabs AS DOUBLE) / gl.nn, 6) AS ece
              |FROM bins CROSS JOIN gl CROSS JOIN es
              |ORDER BY bin""".stripMargin),
    (s, d) => {
      val sc = graft.operators.PlanCache.persist(nbScores(s, d))
      // per-doc candidate set is BOUNDED (≤ |langs|), so the whole
      // argmax + softmax tail folds into ONE doc-keyed agg + scan-side
      // array math — the previous window + max-agg + join + sum-agg
      // chain cost four jobs over the same 13-per-doc rows (r13 fuse;
      // sums stay exact decimal, identical values in any order, and the
      // comparator mirrors the window's (score DESC, lang ASC) exactly)
      val per = sc.groupBy("doc_id")
        .agg(collect_list(struct(col("score"), col("lang"),
          col("true_lang"))).as("cs"))
        .select(col("doc_id"), expr(
          """array_sort(cs, (l, r) ->
            |  CASE WHEN l.score > r.score THEN -1
            |       WHEN l.score < r.score THEN 1
            |       WHEN l.lang < r.lang THEN -1
            |       WHEN l.lang > r.lang THEN 1 ELSE 0 END)"""
            .stripMargin).as("cs"))
        .select(col("doc_id"),
          when(expr("cs[0].lang") === expr("cs[0].true_lang"), 1)
            .otherwise(0).as("correct"),
          expr("""aggregate(cs, CAST(0 AS DECIMAL(20,8)), (acc, x) ->
                 |  CAST(acc + CAST(round(exp(CAST(x.score - cs[0].score
                 |    AS DOUBLE)), 8) AS DECIMAL(20,8)) AS DECIMAL(20,8)))"""
            .stripMargin).as("rsum"))
        .select(col("doc_id"), col("correct"),
          round(lit(1.0) / col("rsum").cast("double"), 6)
            .cast("decimal(10,6)").as("conf"))
      val binned = graft.operators.PlanCache.persist(per.select(
        least(floor(col("conf") * 10).cast("long"), lit(9L)).as("bin"),
        col("correct"), col("conf")))
      val bins = graft.operators.PlanCache.persist(
        binned.groupBy("bin").agg(count(lit(1)).as("n"),
          sum("correct").cast("long").as("n_correct"),
          sum("conf").as("sumconf")))
      val glob = binned.agg(
        round(sum((col("conf") - col("correct")) *
          (col("conf") - col("correct"))).cast("double")
          / count(lit(1)), 6).as("brier"),
        count(lit(1)).as("nn"))
      val es = bins.agg(
        sum(abs(col("n_correct").cast("decimal(20,6)") - col("sumconf")))
          .as("sabs"))
      bins.crossJoin(broadcast(glob)).crossJoin(broadcast(es))
        .select(col("bin"), col("n"), col("n_correct"),
          round(col("sumconf").cast("double") / col("n"), 6).as("avg_conf"),
          round(col("n_correct").cast("double") / col("n"), 6).as("acc"),
          col("brier"),
          round(col("sabs").cast("double") / col("nn"), 6).as("ece"))
        .orderBy("bin")
    })

  /** Decision-STUMP training (exact threshold search): for each of three
    * cheap document features, the single split `x ≤ t` that best
    * separates English from non-English — majority class on each side,
    * threshold chosen by exact correct-count maximization (ties → the
    * smallest t). This is the depth-1 tree a labeling pipeline trains in
    * one pass as a quality/routing gate, and the exact-histogram
    * counterpart of sklearn's stump. All search arithmetic is integer
    * (cumulative pos/n on the value grid); the only doubles are the two
    * display accuracies, rounded once.
    *
    * Scale shape: ONE corpus scan melts the 3 features; per feature the
    * threshold search runs on the distinct-value GRID (cumulative
    * windows partitioned by feature over grid rows, never doc rows). */
  val q369_decision_stump = Q(
    "q369_decision_stump",
    Some("""WITH f AS (
           |  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
           |    n_chars,
           |    CAST(len(list_filter(string_split(text, ' '),
           |      x -> len(x) > 0)) AS BIGINT) AS n_tok
           |  FROM documents),
           |melt AS (
           |  SELECT 'n_chars' AS feature, n_chars AS x, y FROM f
           |  UNION ALL
           |  SELECT 'n_tok', n_tok, y FROM f
           |  UNION ALL
           |  SELECT 'chars_per_tok_x100',
           |    CASE WHEN n_tok > 0 THEN (n_chars * 100) // n_tok
           |         ELSE 0 END, y FROM f),
           |grid AS (
           |  SELECT feature, CAST(x AS BIGINT) AS x,
           |    CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS p
           |  FROM melt GROUP BY 1, 2),
           |cum AS (
           |  SELECT feature, x,
           |    CAST(sum(n) OVER w AS BIGINT) AS n1,
           |    CAST(sum(p) OVER w AS BIGINT) AS p1,
           |    CAST(sum(n) OVER (PARTITION BY feature) AS BIGINT) AS nt,
           |    CAST(sum(p) OVER (PARTITION BY feature) AS BIGINT) AS pt
           |  FROM grid
           |  WINDOW w AS (PARTITION BY feature ORDER BY x
           |    ROWS UNBOUNDED PRECEDING)),
           |scored AS (
           |  SELECT feature, x, nt, pt,
           |    greatest(p1, n1 - p1)
           |      + greatest(pt - p1, (nt - n1) - (pt - p1)) AS correct,
           |    ROW_NUMBER() OVER (PARTITION BY feature
           |      ORDER BY greatest(p1, n1 - p1)
           |        + greatest(pt - p1, (nt - n1) - (pt - p1)) DESC, x)
           |      AS rk
           |  FROM cum)
           |SELECT feature, x AS best_t, correct AS n_correct,
           |  round(CAST(correct AS DOUBLE) / nt, 6) AS acc,
           |  round(CAST(greatest(pt, nt - pt) AS DOUBLE) / nt, 6)
           |    AS baseline_acc
           |FROM scored WHERE rk = 1 ORDER BY feature""".stripMargin),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val f = Tables.documents(s, d)
        .select(when(col("lang") === "en", 1L).otherwise(0L).as("y"),
          col("n_chars"),
          size(expr("filter(split(text, ' '), x -> length(x) > 0)"))
            .cast("long").as("n_tok"))
      val melt = f.select(explode(array(
          struct(lit("n_chars").as("feature"), col("n_chars").as("x")),
          struct(lit("n_tok").as("feature"), col("n_tok").as("x")),
          struct(lit("chars_per_tok_x100").as("feature"),
            when(col("n_tok") > 0, expr("(n_chars * 100) div n_tok"))
              .otherwise(0L).as("x")))).as("m"), col("y"))
        .select(col("m.feature").as("feature"),
          col("m.x").cast("long").as("x"), col("y"))
      val grid = melt.groupBy("feature", "x")
        .agg(count(lit(1)).as("n"), sum("y").as("p"))
      val wCum = Window.partitionBy("feature").orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy("feature")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val cum = grid.select(col("feature"), col("x"),
        sum("n").over(wCum).cast("long").as("n1"),
        sum("p").over(wCum).cast("long").as("p1"),
        sum("n").over(wAll).cast("long").as("nt"),
        sum("p").over(wAll).cast("long").as("pt"))
      val correct = greatest(col("p1"), col("n1") - col("p1")) +
        greatest(col("pt") - col("p1"),
          (col("nt") - col("n1")) - (col("pt") - col("p1")))
      val wRk = Window.partitionBy("feature")
        .orderBy(correct.desc, col("x"))
      cum.withColumn("rk", row_number().over(wRk))
        .filter(col("rk") === 1)
        .select(col("feature"), col("x").as("best_t"),
          correct.as("n_correct"),
          round(correct.cast("double") / col("nt"), 6).as("acc"),
          round(greatest(col("pt"), col("nt") - col("pt")).cast("double")
            / col("nt"), 6).as("baseline_acc"))
        .orderBy("feature")
    })

  val all: Seq[Q] = Seq(q89_unigram_logprob, q90_zscore_outliers,
    q91_dq_checks, q97_bivariate_stats, q98_mad, q121_profile,
    q129_histogram, q139_winsorized_mean, q145_median_impute,
    q368_naive_bayes_langid, q369_decision_stump, q372_nb_calibration)
}
