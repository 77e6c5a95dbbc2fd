package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions.hexSpanValSql

/** Statistical quality control, part 2: distribution-matching selection
  * (DSIR-style importance resampling) and smoothed bigram language-model
  * scoring (the CCNet perplexity-filter shape) — the two model-based
  * selection signals a curation pipeline adds on top of QualityOps'
  * heuristics. Both follow the q89 determinism discipline: per-token
  * log terms are rounded, summed in exact decimal, and only the final
  * statistic returns to double.
  */
object QualityOps2 {

  private val DsirTargetSource = "src0" // stand-in "high-quality domain"
  private val DsirSlope = 10.0          // sigmoid sharpness on the mean LLR

  /** DSIR-style importance resampling (Xie et al., 2023, with unigram
    * LMs standing in for hashed n-gram features): estimate a TARGET
    * language model from the high-quality domain and a RAW model from
    * the whole pool (add-1 smoothing over the shared vocabulary), score
    * every document by its mean per-token log-likelihood RATIO, squash
    * through a sigmoid, and keep documents whose deterministic md5 draw
    * falls under that weight — raw documents that look like the target
    * survive with high probability, regardless of their own domain tag.
    *
    * Scale shape: both LMs are hash aggregations over the token stream;
    * the per-term score table broadcasts (vocab-sized index metadata);
    * the doc score is one doc-keyed aggregation; draw and gate are
    * scan-side md5 arithmetic (q75's replayable-draw device). Nothing
    * all-pairs, no driver state. */
  val q151_dsir_resample = Q(
    "q151_dsir_resample", {
      val u = s"(${hexSpanValSql("md5(CAST(doc_id AS VARCHAR))", 0, 13)} / CAST(4503599627370496 AS DOUBLE))"
      Some(s"""WITH tok AS (
              |  SELECT doc_id, source, unnest(string_split(text, ' ')) AS term
              |  FROM documents),
              |vocab AS (SELECT CAST(count(DISTINCT term) AS BIGINT) AS v FROM tok),
              |tgt AS (
              |  SELECT term, CAST(count(*) AS BIGINT) AS ft FROM tok
              |  WHERE source = '$DsirTargetSource' GROUP BY term),
              |nt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tok
              |  WHERE source = '$DsirTargetSource'),
              |raw AS (SELECT term, CAST(count(*) AS BIGINT) AS fr FROM tok GROUP BY term),
              |nr AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tok),
              |scores AS (
              |  SELECT raw.term,
              |    round(ln((coalesce(ft, 0) + 1.0) / (nt.n + vocab.v))
              |        - ln((fr + 1.0) / (nr.n + vocab.v)), 8) AS llr
              |  FROM raw LEFT JOIN tgt ON raw.term = tgt.term
              |    CROSS JOIN nt CROSS JOIN nr CROSS JOIN vocab),
              |docs AS (
              |  SELECT doc_id,
              |    CAST(count(*) AS BIGINT) AS n_tokens,
              |    CAST(CAST(sum(CAST(llr AS DECIMAL(20,8))) AS DOUBLE)
              |      / count(*) AS DOUBLE) AS mean_llr
              |  FROM tok JOIN scores ON tok.term = scores.term
              |  GROUP BY doc_id)
              |SELECT doc_id, n_tokens, round(mean_llr, 6) AS mean_llr,
              |  round(1.0 / (1.0 + exp(-$DsirSlope * mean_llr)), 6) AS weight,
              |  CAST(CASE WHEN $u <
              |    1.0 / (1.0 + exp(-$DsirSlope * mean_llr))
              |    THEN 1 ELSE 0 END AS BIGINT) AS kept
              |FROM docs
              |ORDER BY doc_id""".stripMargin)
    },
    (s, d) => {
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          explode(split(col("text"), " ")).as("term"))
      val vocab = tok.agg(count_distinct(col("term")).as("v"))
      val tgt = tok.filter(col("source") === DsirTargetSource)
        .groupBy("term").agg(count(lit(1)).as("ft"))
      val nt = tok.filter(col("source") === DsirTargetSource)
        .agg(count(lit(1)).as("__nt"))
      val raw = tok.groupBy("term").agg(count(lit(1)).as("fr"))
      val nr = tok.agg(count(lit(1)).as("__nr"))
      val scores = raw.join(tgt, Seq("term"), "left")
        .crossJoin(broadcast(nt))
        .crossJoin(broadcast(nr))
        .crossJoin(broadcast(vocab))
        .select(col("term"),
          round(log((coalesce(col("ft"), lit(0L)) + lit(1.0)) /
              (col("__nt") + col("v"))) -
            log((col("fr") + lit(1.0)) / (col("__nr") + col("v"))), 8)
            .as("llr"))
      val docs = tok.join(broadcast(scores), "term")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          (sum(col("llr").cast("decimal(20,8)")).cast("double") /
            count(lit(1))).cast("double").as("mean_llr"))
      // q132 lesson: hash ONCE into a column, then span-extract — passing
      // md5(...) textually into hexSpanValSql would re-evaluate the
      // digest for each of its 13 digit extractions per row
      val u = expr(s"(${hexSpanValSql("__uh", 0, 13)} / CAST(4503599627370496 AS DOUBLE))")
      val w = lit(1.0) / (lit(1.0) + exp(lit(-DsirSlope) * col("mean_llr")))
      docs.withColumn("__uh", md5(col("doc_id").cast("string")))
        .select(col("doc_id"), col("n_tokens"),
          round(col("mean_llr"), 6).as("mean_llr"),
          round(w, 6).as("weight"),
          when(u < w, 1L).otherwise(0L).as("kept"))
        .orderBy("doc_id")
    })

  /** Smoothed bigram LM scoring (the CCNet perplexity-filter shape,
    * one order up from q89's unigram): p(wᵢ | wᵢ₋₁) with add-1
    * smoothing over the corpus vocabulary, scored as the mean negative
    * log conditional per bigram — high scorers read as improbable
    * (garbage) under the corpus's own bigram statistics. Bigrams are
    * formed scan-side from the token array (no self-join of the token
    * stream); the bigram and unigram-context counts are hash aggs whose
    * score table re-enters as a broadcast. */
  val q152_bigram_ppl = Q(
    "q152_bigram_ppl",
    Some("""WITH toks AS (
            |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
            |tok AS (SELECT doc_id, unnest(ts) AS term FROM toks),
            |vocab AS (SELECT CAST(count(DISTINCT term) AS BIGINT) AS v FROM tok),
            |bg AS (
            |  SELECT doc_id, unnest(list_transform(range(1, len(ts)),
            |    i -> ts[i] || ' ' || ts[i+1])) AS big
            |  FROM toks WHERE len(ts) >= 2),
            |bgc AS (SELECT big, CAST(count(*) AS BIGINT) AS fb FROM bg GROUP BY big),
            |ctx AS (
            |  SELECT string_split(big, ' ')[1] AS w1,
            |    CAST(sum(fb) AS BIGINT) AS fc
            |  FROM bgc GROUP BY string_split(big, ' ')[1]),
            |scores AS (
            |  SELECT big, round(-ln((fb + 1.0) / (fc + vocab.v)), 8) AS nlp
            |  FROM bgc JOIN ctx ON string_split(bgc.big, ' ')[1] = ctx.w1
            |    CROSS JOIN vocab)
            |SELECT doc_id,
            |  CAST(count(*) AS BIGINT) AS n_bigrams,
            |  CAST(CAST(sum(CAST(nlp AS DECIMAL(20,8))) AS DOUBLE)
            |    / count(*) AS DOUBLE) AS mean_neg_logp
            |FROM bg JOIN scores ON bg.big = scores.big
            |GROUP BY doc_id
            |ORDER BY doc_id""".stripMargin),
    (s, d) => {
      val withTs = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("ts"))
      val tok = withTs.select(col("doc_id"), explode(col("ts")).as("term"))
      val vocab = tok.agg(count_distinct(col("term")).as("v"))
      // scan-side bigram formation: zip the token array with its tail
      val bg = withTs.filter(size(col("ts")) >= 2)
        .select(col("doc_id"), explode(
          graft.functions.TextFunctions.shingles(col("ts"), 2))
          .as("big"))
      val bgc = bg.groupBy("big").agg(count(lit(1)).as("fb"))
      val ctx = bgc.groupBy(split(col("big"), " ")(0).as("w1"))
        .agg(sum(col("fb")).as("fc"))
      val scores = bgc
        .join(broadcast(ctx), split(col("big"), " ")(0) === col("w1"))
        .crossJoin(broadcast(vocab))
        .select(col("big"),
          round(-log((col("fb") + lit(1.0)) / (col("fc") + col("v"))), 8)
            .as("nlp"))
      // NO broadcast hint here: unlike the unigram tables (q89/q151),
      // a natural corpus's BIGRAM table grows toward |V|² — force-
      // broadcasting it is the q110 probe-set mistake; the planner picks
      // broadcast while it fits and a big-keyed shuffle join beyond
      bg.join(scores, "big")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          (sum(col("nlp").cast("decimal(20,8)")).cast("double") /
            count(lit(1))).cast("double").as("mean_neg_logp"))
        .orderBy("doc_id")
    })

  /** Quantile binning (feature discretization): exact quartile
    * boundaries of the heavy-tailed events value (rounded once, the q48
    * percentile convention), then every event lands in a bin by pure
    * boundary arithmetic — bin = 1 + Σ (x > bᵢ), no CASE ladder to
    * drift between engines. The boundaries are a broadcast 1-row frame
    * (index metadata); the assignment is scan-side; the report is one
    * hash agg with a decimal-exact per-bin mean. */
  val q162_quantile_binning = Q(
    "q162_quantile_binning",
    Some("""WITH b AS (
            |  SELECT round(quantile_cont(value, 0.25), 6) AS b1,
            |    round(quantile_cont(value, 0.50), 6) AS b2,
            |    round(quantile_cont(value, 0.75), 6) AS b3
            |  FROM events),
            |x AS (SELECT round(value, 6) AS x FROM events)
            |SELECT 1 + CAST(x > b1 AS INT) + CAST(x > b2 AS INT)
            |    + CAST(x > b3 AS INT) AS bin,
            |  CAST(count(*) AS BIGINT) AS n,
            |  CAST(CAST(sum(CAST(x AS DECIMAL(30,6))) AS DOUBLE)
            |    / count(*) AS DOUBLE) AS mean_x
            |FROM x CROSS JOIN b
            |GROUP BY bin
            |ORDER BY bin""".stripMargin),
    (s, d) => {
      val ev = Tables.events(s, d).select(round(col("value"), 6).as("x"))
      val b = Tables.events(s, d).agg(
        round(expr("percentile(value, 0.25)"), 6).as("b1"),
        round(expr("percentile(value, 0.50)"), 6).as("b2"),
        round(expr("percentile(value, 0.75)"), 6).as("b3"))
      ev.crossJoin(broadcast(b))
        .select((lit(1) + (col("x") > col("b1")).cast("int") +
          (col("x") > col("b2")).cast("int") +
          (col("x") > col("b3")).cast("int")).as("bin"), col("x"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"),
          (sum(col("x").cast("decimal(30,6)")).cast("double") /
            count(lit(1))).cast("double").as("mean_x"))
        .orderBy("bin")
    })

  /** Weighted median (quantity-weighted price per return flag) — the
    * robust location statistic Spark has no native aggregate for: sort
    * each group by value, accumulate the weights in EXACT decimal, and
    * the weighted median is the first value whose running weight reaches
    * half the group total. Equal values make the crossing row's VALUE
    * deterministic even though tie order is not — only the value leaves
    * the query. One group-keyed window + one agg. */
  val q166_weighted_median = Q(
    "q166_weighted_median",
    Some("""WITH v AS (
            |  SELECT l_returnflag AS flag,
            |    CAST(l_extendedprice AS DECIMAL(18,2)) AS price,
            |    CAST(l_quantity AS DECIMAL(18,2)) AS wt
            |  FROM lineitem),
            |c AS (
            |  SELECT flag, price, sum(wt) OVER (
            |      PARTITION BY flag ORDER BY price
            |      ROWS UNBOUNDED PRECEDING) AS cw,
            |    sum(wt) OVER (PARTITION BY flag) AS tw
            |  FROM v)
            |SELECT flag, CAST(min(price) AS DOUBLE) AS weighted_median
            |FROM c WHERE 2 * cw >= tw
            |GROUP BY flag
            |ORDER BY flag""".stripMargin),
    (s, d) => {
      val v = Tables.lineitem(s, d).select(
        col("l_returnflag").as("flag"),
        Q.dec(col("l_extendedprice")).as("price"),
        Q.dec(col("l_quantity")).as("wt"))
      val wRun = org.apache.spark.sql.expressions.Window
        .partitionBy("flag").orderBy("price")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val wAll = org.apache.spark.sql.expressions.Window.partitionBy("flag")
      v.withColumn("cw", sum(col("wt")).over(wRun))
        .withColumn("tw", sum(col("wt")).over(wAll))
        .filter(lit(2) * col("cw") >= col("tw"))
        .groupBy("flag")
        .agg(min(col("price")).cast("double").as("weighted_median"))
        .orderBy("flag")
    })

  private val CusumH = 5.0

  /** CUSUM change detection (the monitoring chart a data pipeline runs
    * over its daily quality metrics): per-day means of the event value
    * in exact decimal, deviations from the period mean rounded once,
    * then the cumulative deviation sum in EXACT decimal over the day
    * order — |S| beyond the control limit flags a level shift. The
    * cumulative window runs over one row per DAY (metadata scale);
    * everything corpus-sized is one hash agg. */
  val q167_cusum = Q(
    "q167_cusum",
    Some(s"""WITH daily AS (
            |  SELECT CAST(ts AS DATE) AS day,
            |    CAST(CAST(sum(CAST(round(value, 6) AS DECIMAL(30,6)))
            |      AS DOUBLE) / count(*) AS DOUBLE) AS dmean
            |  FROM events GROUP BY day),
            |g AS (SELECT CAST(CAST(sum(CAST(round(value, 6) AS DECIMAL(30,6)))
            |    AS DOUBLE) / count(*) AS DOUBLE) AS gmean FROM events),
            |dev AS (
            |  SELECT day,
            |    floor((dmean - gmean) * 1000000 + 0.5) / 1000000.0 AS dev
            |  FROM daily CROSS JOIN g)
            |SELECT day, dev,
            |  CAST(CAST(sum(CAST(dev AS DECIMAL(30,6))) OVER (
            |    ORDER BY day ROWS UNBOUNDED PRECEDING) AS DOUBLE)
            |    AS DOUBLE) AS s,
            |  CAST(CASE WHEN abs(CAST(sum(CAST(dev AS DECIMAL(30,6))) OVER (
            |    ORDER BY day ROWS UNBOUNDED PRECEDING) AS DOUBLE)) > $CusumH
            |    THEN 1 ELSE 0 END AS BIGINT) AS shifted
            |FROM dev
            |ORDER BY day""".stripMargin),
    (s, d) => {
      val meanOf =
        (sum(round(col("value"), 6).cast("decimal(30,6)")).cast("double") /
          count(lit(1))).cast("double")
      val ev = Tables.events(s, d).select(
        expr("CAST(timestamp_micros(ts div 1000) AS DATE)").as("day"),
        col("value"))
      val daily = ev.groupBy("day").agg(meanOf.as("dmean"))
      val g = ev.agg(meanOf.as("gmean"))
      val w = org.apache.spark.sql.expressions.Window.orderBy("day")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val sCol = sum(col("dev").cast("decimal(30,6)")).over(w).cast("double")
      // dev via the explicit IEEE round formula (floor(x·1e6 + 0.5)/1e6,
      // the q220 quantization device) instead of library round(x, 6):
      // both engines evaluate the IDENTICAL double expression, where the
      // libraries' half-up rules can disagree by 1e-6 when the double
      // sits a sub-ulp from a .5 boundary (observed at sf0.001).
      daily.crossJoin(broadcast(g))
        .select(col("day"),
          (floor((col("dmean") - col("gmean")) * 1000000 + 0.5) /
            lit(1000000.0)).as("dev"))
        .select(col("day"), col("dev"), sCol.as("s"),
          when(abs(sCol) > CusumH, 1L).otherwise(0L).as("shifted"))
        .orderBy("day")
    })

  /** Source-influence audit: the corpus-wide OLS slope of vocabulary
    * richness (distinct tokens) on document length (tokens), and for
    * each source the LEAVE-THAT-SOURCE-OUT slope — the closed-form data
    * valuation a curator reads to see which slice is dragging a fitted
    * relation (a source of templated/duplicated text depresses richness
    * per token and shows up as positive influence).
    *
    * Determinism: x and y are INTEGERS, so all five regression moments
    * (n, Σx, Σy, Σxy, Σx²) are exact BIGINT sums — per-source moments
    * roll up to the global row, and leave-one-out is pure integer
    * subtraction (the mergeable-summaries law again: LOO needs no second
    * corpus pass). The only floating-point step is the final slope
    * division, an identical two-operand IEEE expression on both engines.
    * Magnitudes: Σxy ≤ docs·len·vocab ≈ 1e13 at sf1 — comfortably inside
    * BIGINT; a 100 TB deployment rescales the moments into DECIMAL(38,0)
    * at the same one-agg cost.
    *
    * Scale shape: ONE corpus hash agg (source-keyed, scan-side token
    * arithmetic), then source-count-sized frames. */
  val q174_source_influence = Q(
    "q174_source_influence",
    Some("""WITH t AS (
            |  SELECT source,
            |    CAST(len(string_split(text, ' ')) AS BIGINT) AS x,
            |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS y
            |  FROM documents),
            |m AS (
            |  SELECT source, CAST(count(*) AS BIGINT) AS n,
            |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
            |    CAST(sum(x * y) AS BIGINT) AS sxy,
            |    CAST(sum(x * x) AS BIGINT) AS sxx
            |  FROM t GROUP BY source),
            |g AS (
            |  SELECT CAST(sum(n) AS BIGINT) AS n, CAST(sum(sx) AS BIGINT) AS sx,
            |    CAST(sum(sy) AS BIGINT) AS sy, CAST(sum(sxy) AS BIGINT) AS sxy,
            |    CAST(sum(sxx) AS BIGINT) AS sxx
            |  FROM m)
            |SELECT m.source, m.n AS n_docs,
            |  round(CAST(g.n * g.sxy - g.sx * g.sy AS DOUBLE)
            |    / CAST(g.n * g.sxx - g.sx * g.sx AS DOUBLE), 6) AS slope_all,
            |  round(CAST((g.n - m.n) * (g.sxy - m.sxy)
            |        - (g.sx - m.sx) * (g.sy - m.sy) AS DOUBLE)
            |    / CAST((g.n - m.n) * (g.sxx - m.sxx)
            |        - (g.sx - m.sx) * (g.sx - m.sx) AS DOUBLE), 6) AS slope_loo,
            |  round(CAST(g.n * g.sxy - g.sx * g.sy AS DOUBLE)
            |      / CAST(g.n * g.sxx - g.sx * g.sx AS DOUBLE)
            |    - CAST((g.n - m.n) * (g.sxy - m.sxy)
            |          - (g.sx - m.sx) * (g.sy - m.sy) AS DOUBLE)
            |      / CAST((g.n - m.n) * (g.sxx - m.sxx)
            |          - (g.sx - m.sx) * (g.sx - m.sx) AS DOUBLE), 6)
            |    AS influence
            |FROM m CROSS JOIN g ORDER BY m.source""".stripMargin),
    (s, d) => {
      val t = Tables.documents(s, d).select(col("source"),
        size(split(col("text"), " ")).cast("long").as("x"),
        size(array_distinct(split(col("text"), " "))).cast("long").as("y"))
      val m = t.groupBy("source").agg(
        count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      val g = m.agg(sum(col("n")).as("gn"), sum(col("sx")).as("gsx"),
        sum(col("sy")).as("gsy"), sum(col("sxy")).as("gsxy"),
        sum(col("sxx")).as("gsxx"))
      def slope(n: org.apache.spark.sql.Column, sx: org.apache.spark.sql.Column,
          sy: org.apache.spark.sql.Column, sxy: org.apache.spark.sql.Column,
          sxx: org.apache.spark.sql.Column) =
        (n * sxy - sx * sy).cast("double") / (n * sxx - sx * sx).cast("double")
      val all = slope(col("gn"), col("gsx"), col("gsy"), col("gsxy"), col("gsxx"))
      val loo = slope(col("gn") - col("n"), col("gsx") - col("sx"),
        col("gsy") - col("sy"), col("gsxy") - col("sxy"),
        col("gsxx") - col("sxx"))
      m.crossJoin(broadcast(g))
        .select(col("source"), col("n").as("n_docs"),
          round(all, 6).as("slope_all"), round(loo, 6).as("slope_loo"),
          round(all - loo, 6).as("influence"))
        .orderBy("source")
    })

  /** Batch-over-batch DISTRIBUTION DRIFT: Jensen–Shannon divergence of
    * the source mix between consecutive arrival batches (doc_id mod 3 —
    * the q170 arrival model). JSD is the bounded, symmetric drift score
    * pipeline monitors chart: 0 = identical mix, ln 2 = disjoint. Per-
    * term p·ln(p/m) values are rounded once and summed in exact decimal
    * (the q160 ln discipline), so the score is bit-stable under any
    * partial-agg order.
    *
    * Scale shape: one (batch, source) hash agg over the corpus, then
    * everything is source-count-sized — the drift join touches ≤
    * |sources| rows per batch pair. */
  val q182_batch_drift = Q(
    "q182_batch_drift", {
      // one CTE block per (batch, prev) pair — the per-pair full outer
      // join keeps sources present in EITHER batch (a source that
      // disappears still contributes its q·ln(2) term)
      def pair(b: Int) =
        s"""pq$b AS (
           |  SELECT
           |    CAST(coalesce(x.c, 0) AS DOUBLE)
           |      / (SELECT n FROM t WHERE b = $b) AS p,
           |    CAST(coalesce(y.c, 0) AS DOUBLE)
           |      / (SELECT n FROM t WHERE b = ${b - 1}) AS q
           |  FROM (SELECT source, c FROM c WHERE b = $b) x
           |  FULL OUTER JOIN (SELECT source, c FROM c WHERE b = ${b - 1}) y
           |    USING (source)),
           |j$b AS (
           |  SELECT $b AS batch,
           |    round(0.5 * CAST(sum(CASE WHEN p > 0
           |        THEN CAST(round(p * ln(p / ((p + q) / 2)), 12)
           |             AS DECIMAL(28,12)) ELSE 0 END) AS DOUBLE)
           |      + 0.5 * CAST(sum(CASE WHEN q > 0
           |        THEN CAST(round(q * ln(q / ((p + q) / 2)), 12)
           |             AS DECIMAL(28,12)) ELSE 0 END) AS DOUBLE), 6)
           |      AS jsd_vs_prev
           |  FROM pq$b)""".stripMargin
      Some(s"""WITH c AS (
              |  SELECT doc_id % 3 AS b, source, CAST(count(*) AS BIGINT) AS c
              |  FROM documents GROUP BY 1, 2),
              |t AS (SELECT b, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY b),
              |${pair(1)},
              |${pair(2)}
              |SELECT t.b AS batch, t.n AS n_docs, j.jsd_vs_prev
              |FROM t LEFT JOIN (SELECT * FROM j1 UNION ALL SELECT * FROM j2) j
              |  ON j.batch = t.b
              |ORDER BY batch""".stripMargin)
    },
    (s, d) => {
      val c = Tables.documents(s, d)
        .groupBy(pmod(col("doc_id"), lit(3)).as("b"), col("source"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint(true) // tiny; feeds the per-pair branches
      val t = c.groupBy("b").agg(sum(col("c")).as("n"))
      val totals = t.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      def pairJsd(b: Int) = {
        val x = c.filter(col("b") === b).select(col("source"), col("c").as("xc"))
        val y = c.filter(col("b") === b - 1).select(col("source"), col("c").as("yc"))
        val p = coalesce(col("xc"), lit(0L)).cast("double") / lit(totals(b.toLong))
        val q = coalesce(col("yc"), lit(0L)).cast("double") / lit(totals(b - 1L))
        val m = (p + q) / 2
        x.join(y, Seq("source"), "full_outer")
          .select(
            when(p > 0, round(p * log(p / m), 12).cast("decimal(28,12)"))
              .otherwise(lit(0).cast("decimal(28,12)")).as("tp"),
            when(q > 0, round(q * log(q / m), 12).cast("decimal(28,12)"))
              .otherwise(lit(0).cast("decimal(28,12)")).as("tq"))
          .agg(round(lit(0.5) * sum(col("tp")).cast("double") +
            lit(0.5) * sum(col("tq")).cast("double"), 6).as("jsd_vs_prev"))
          .select(lit(b.toLong).as("batch"), col("jsd_vs_prev"))
      }
      t.select(col("b").as("batch"), col("n").as("n_docs"))
        .join(pairJsd(1).union(pairJsd(2)), Seq("batch"), "left")
        .orderBy("batch")
    })

  private val MadMult = 3.0

  /** Per-user robust activity anomalies: daily event counts, per-user
    * exact median and MAD (q98's device, grouped by user), days flagged
    * when count − median > 3·MAD. Robust per-entity outlier detection —
    * z-scores (q90) break when the entity's own history is heavy-tailed;
    * the median/MAD pair does not. Counts are small integers, so the
    * interpolated percentiles land on exact binary halves and every
    * comparison is bit-deterministic cross-engine.
    *
    * Scale shape: one (user, day) hash agg over events, then two
    * user-keyed aggregations over the (entity × day)-sized frame and a
    * broadcast-joined flag pass. No window, nothing corpus-pairwise. */
  val q183_user_anomaly_days = Q(
    "q183_user_anomaly_days",
    Some(s"""WITH dc AS (
            |  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day,
            |    CAST(count(*) AS BIGINT) AS cnt
            |  FROM events GROUP BY 1, 2),
            |med AS (
            |  SELECT user_id, quantile_cont(cnt, 0.5) AS med
            |  FROM dc GROUP BY user_id),
            |mad AS (
            |  SELECT dc.user_id, max(med) AS med,
            |    quantile_cont(abs(dc.cnt - med), 0.5) AS mad
            |  FROM dc JOIN med ON dc.user_id = med.user_id
            |  GROUP BY dc.user_id)
            |SELECT dc.user_id,
            |  CAST(count(*) AS BIGINT) AS n_days,
            |  round(max(m.med), 6) AS median_cnt,
            |  round(max(m.mad), 6) AS mad_cnt,
            |  CAST(sum(CASE WHEN dc.cnt - m.med > $MadMult * m.mad
            |           THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalous,
            |  max(dc.cnt) AS max_cnt
            |FROM dc JOIN mad m ON dc.user_id = m.user_id
            |GROUP BY dc.user_id
            |ORDER BY dc.user_id""".stripMargin),
    (s, d) => {
      val dc = Tables.events(s, d)
        .groupBy(col("user_id"), expr("ts div 86400000000000").as("day"))
        .agg(count(lit(1)).as("cnt"))
      val med = dc.groupBy("user_id")
        .agg(expr("percentile(cnt, 0.5)").as("med"))
      val mad = dc.join(broadcast(med), "user_id")
        .groupBy("user_id")
        .agg(max(col("med")).as("med"),
          expr("percentile(abs(cnt - med), 0.5)").as("mad"))
      dc.join(broadcast(mad), "user_id")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_days"),
          round(max(col("med")), 6).as("median_cnt"),
          round(max(col("mad")), 6).as("mad_cnt"),
          sum(when(col("cnt") - col("med") > lit(MadMult) * col("mad"), 1L)
            .otherwise(0L)).as("n_anomalous"),
          max(col("cnt")).as("max_cnt"))
        .orderBy("user_id")
    })

  /** Luhn-checksum PII audit, by construction-inversion (the q173/q186
    * device): 16-digit card-like strings are synthesized from order keys
    * — the correct Luhn check digit when o_orderkey % 3 = 0, off-by-one
    * otherwise — and the detector (a strict left-fold over digit
    * positions with the doubled-every-second-from-right rule) must
    * recover EXACTLY the constructed valid fraction. `expected_valid`
    * and `luhn_valid` agreeing inside one hash-gated row is the proof
    * the validator works; a real PII scrub would gate redaction (q62)
    * on this predicate. Scan-side integer arithmetic only. */
  val q212_luhn_audit = Q(
    "q212_luhn_audit",
    Some("""WITH base AS (
           |  SELECT o_orderkey,
           |    lpad(CAST(o_orderkey % 1000000000 AS VARCHAR), 15, '4') AS b
           |  FROM orders),
           |built AS (
           |  SELECT o_orderkey, b,
           |    list_reduce(list_transform(generate_series(1, 15), i ->
           |      CASE WHEN i % 2 = 1 THEN
           |        CASE WHEN 2 * CAST(substring(b, 16 - i, 1) AS INT) > 9
           |          THEN 2 * CAST(substring(b, 16 - i, 1) AS INT) - 9
           |          ELSE 2 * CAST(substring(b, 16 - i, 1) AS INT) END
           |      ELSE CAST(substring(b, 16 - i, 1) AS INT) END),
           |      (x, y) -> x + y) AS s15
           |  FROM base),
           |cards AS (
           |  SELECT o_orderkey,
           |    b || CAST(CASE WHEN o_orderkey % 3 = 0
           |      THEN (10 - s15 % 10) % 10
           |      ELSE ((10 - s15 % 10) % 10 + 1) % 10 END AS VARCHAR) AS card
           |  FROM built),
           |checked AS (
           |  SELECT o_orderkey,
           |    list_reduce(list_transform(generate_series(1, 16), i ->
           |      CASE WHEN i % 2 = 0 THEN
           |        CASE WHEN 2 * CAST(substring(card, 17 - i, 1) AS INT) > 9
           |          THEN 2 * CAST(substring(card, 17 - i, 1) AS INT) - 9
           |          ELSE 2 * CAST(substring(card, 17 - i, 1) AS INT) END
           |      ELSE CAST(substring(card, 17 - i, 1) AS INT) END),
           |      (x, y) -> x + y) % 10 = 0 AS ok
           |  FROM cards)
           |SELECT CAST(count(*) AS BIGINT) AS n_cards,
           |  CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS luhn_valid,
           |  CAST(sum(CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS expected_valid,
           |  CAST(sum(CASE WHEN ok THEN o_orderkey ELSE 0 END) AS BIGINT)
           |    AS valid_key_sum
           |FROM checked""".stripMargin),
    (s, d) => {
      val luhn15 =
        """aggregate(sequence(1, 15), 0, (x, i) ->
          |  x + CASE WHEN i % 2 = 1 THEN
          |    CASE WHEN 2 * CAST(substring(b, 16 - i, 1) AS INT) > 9
          |      THEN 2 * CAST(substring(b, 16 - i, 1) AS INT) - 9
          |      ELSE 2 * CAST(substring(b, 16 - i, 1) AS INT) END
          |  ELSE CAST(substring(b, 16 - i, 1) AS INT) END)""".stripMargin
      val luhn16 =
        """aggregate(sequence(1, 16), 0, (x, i) ->
          |  x + CASE WHEN i % 2 = 0 THEN
          |    CASE WHEN 2 * CAST(substring(card, 17 - i, 1) AS INT) > 9
          |      THEN 2 * CAST(substring(card, 17 - i, 1) AS INT) - 9
          |      ELSE 2 * CAST(substring(card, 17 - i, 1) AS INT) END
          |  ELSE CAST(substring(card, 17 - i, 1) AS INT) END) % 10 = 0""".stripMargin
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          lpad(col("o_orderkey").cast("long").mod(1000000000L).cast("string"),
            15, "4").as("b"))
        .withColumn("s15", expr(luhn15))
        .withColumn("card", concat(col("b"),
          when(col("o_orderkey") % 3 === 0,
            (lit(10) - col("s15") % 10) % 10)
            .otherwise(((lit(10) - col("s15") % 10) % 10 + 1) % 10)
            .cast("string")))
        .withColumn("ok", expr(luhn16))
        .agg(count(lit(1)).as("n_cards"),
          sum(when(col("ok"), 1L).otherwise(0L)).as("luhn_valid"),
          sum(when(col("o_orderkey") % 3 === 0, 1L).otherwise(0L))
            .as("expected_valid"),
          sum(when(col("ok"), col("o_orderkey")).otherwise(0L))
            .as("valid_key_sum"))
    })

  /** Benford first-significant-digit audit — the forensic screen for
    * fabricated numeric columns: observed leading-digit fractions of
    * `value` against the Benford expectation (log10(1+1/d) hardcoded as
    * 6-decimal literals — identical constants, no libm). The leading
    * digit comes from exact DECIMAL cents via string truncation, never
    * floating log10. One scan, 9-row output. */
  val q214_benford = Q(
    "q214_benford",
    Some("""WITH d AS (
           |  SELECT CAST(substring(CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100
           |    AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
           |  FROM events WHERE value > 0),
           |c AS (
           |  SELECT digit, CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(count(*)) OVER () AS BIGINT) AS total
           |  FROM d GROUP BY digit)
           |SELECT digit, n,
           |  round(CAST(n AS DOUBLE) / total, 6) AS obs_frac,
           |  CAST(CASE digit WHEN 1 THEN 0.301030 WHEN 2 THEN 0.176091
           |    WHEN 3 THEN 0.124939 WHEN 4 THEN 0.096910 WHEN 5 THEN 0.079181
           |    WHEN 6 THEN 0.066947 WHEN 7 THEN 0.057992 WHEN 8 THEN 0.051153
           |    WHEN 9 THEN 0.045757 END AS DOUBLE) AS benford_frac,
           |  round(CAST(n AS DOUBLE) / total
           |    - CAST(CASE digit WHEN 1 THEN 0.301030 WHEN 2 THEN 0.176091
           |      WHEN 3 THEN 0.124939 WHEN 4 THEN 0.096910 WHEN 5 THEN 0.079181
           |      WHEN 6 THEN 0.066947 WHEN 7 THEN 0.057992 WHEN 8 THEN 0.051153
           |      WHEN 9 THEN 0.045757 END AS DOUBLE), 6) AS deviation
           |FROM c ORDER BY digit""".stripMargin),
    (s, d) => {
      val benford = Map(1 -> 0.301030, 2 -> 0.176091, 3 -> 0.124939,
        4 -> 0.096910, 5 -> 0.079181, 6 -> 0.066947, 7 -> 0.057992,
        8 -> 0.051153, 9 -> 0.045757)
      val expFrac = benford.foldLeft(lit(null).cast("double")) {
        case (acc, (k, v)) => when(col("digit") === k, lit(v)).otherwise(acc)
      }
      val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
      Tables.events(s, d)
        .where(col("value") > 0)
        .select(substring((Q.dec(col("value")) * 100).cast("long").cast("string"),
          1, 1).cast("long").as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n"))
        .withColumn("total", sum(col("n")).over(wAll))
        .select(col("digit"), col("n"),
          round(col("n").cast("double") / col("total"), 6).as("obs_frac"),
          expFrac.as("benford_frac"),
          round(col("n").cast("double") / col("total") - expFrac, 6)
            .as("deviation"))
        .orderBy("digit")
    })

  /** Source-concentration report per language (the "are we one takedown
    * away from losing a language" curation readout): Herfindahl index of
    * source shares, its inverse (effective number of sources), and the
    * top-2 concentration ratio. Everything runs on the lang × source
    * count grid: per-source share² terms round at 9 then decimal-sum per
    * language; CR2 is a rank-2 window on the same grid. One corpus agg
    * total — the grid is |langs|·|sources| rows at any corpus size. */
  val q317_source_hhi = Q(
    "q317_source_hhi",
    Some("""WITH g AS (
           |  SELECT lang, source, CAST(count(*) AS BIGINT) AS c
           |  FROM documents GROUP BY 1, 2),
           |t AS (
           |  SELECT lang, source, c,
           |    CAST(sum(c) OVER (PARTITION BY lang) AS BIGINT) AS n,
           |    ROW_NUMBER() OVER (PARTITION BY lang
           |      ORDER BY c DESC, source) AS rk
           |  FROM g),
           |m AS (
           |  SELECT lang, CAST(max(n) AS BIGINT) AS n_docs,
           |    CAST(count(*) AS BIGINT) AS n_sources,
           |    CAST(sum(CAST(round((CAST(c AS DOUBLE) / n)
           |      * (CAST(c AS DOUBLE) / n), 9) AS DECIMAL(28,9)))
           |      AS DOUBLE) AS hhi,
           |    CAST(sum(CASE WHEN rk <= 2 THEN c ELSE 0 END) AS BIGINT)
           |      AS top2
           |  FROM t GROUP BY lang)
           |SELECT lang, n_docs, n_sources, round(hhi, 9) AS hhi,
           |  round(1 / hhi, 6) AS eff_sources,
           |  round(CAST(top2 AS DOUBLE) / n_docs, 6) AS cr2
           |FROM m ORDER BY lang""".stripMargin),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val g = Tables.documents(s, d)
        .groupBy("lang", "source").agg(count(lit(1)).as("c"))
      val wl = Window.partitionBy("lang")
      val t = g.select(col("lang"), col("source"), col("c"),
        sum("c").over(wl).as("n"),
        row_number().over(wl.orderBy(col("c").desc, col("source")))
          .as("rk"))
      val share = col("c").cast("double") / col("n")
      val m = t.groupBy("lang").agg(
        max("n").cast("long").as("n_docs"),
        count(lit(1)).as("n_sources"),
        sum(round(share * share, 9).cast("decimal(28,9)")).cast("double")
          .as("hhi"),
        sum(when(col("rk") <= 2, col("c")).otherwise(0L)).cast("long")
          .as("top2"))
      m.select(col("lang"), col("n_docs"), col("n_sources"),
        round(col("hhi"), 9).as("hhi"),
        round(lit(1) / col("hhi"), 6).as("eff_sources"),
        round(col("top2").cast("double") / col("n_docs"), 6).as("cr2"))
        .orderBy("lang")
    })

  /** HBOS — histogram-based outlier score (Goldstein–Dengel 2012), the
    * density-estimation member of the anomaly family beside q90's
    * z-score, q98's MAD, and q343's consensus vote: each of three cheap
    * event features (value, props length, hour-of-day) gets a 10-bin
    * equal-width histogram, a point's score is Σ_f −ln(density of its
    * bin), and the top 20 scorers surface. Unlike z-scores, HBOS flags
    * points in ANY low-density region — multimodal columns included —
    * with no distributional assumption. Per-bin −ln(density) rounds at
    * 8 and the 3-term per-event sum rides exact decimal, so the final
    * ranking (score desc, event_id) is engine- and order-identical.
    *
    * Scale shape: min/max "training" is one corpus agg onto a 3-row
    * grid; the histogram is a (feature, bin) agg onto ≤ 30 rows; both
    * join back broadcast; the result is a TakeOrdered 20 — no window,
    * no collect, three map-side-friendly passes. */
  val q375_hbos = Q(
    "q375_hbos",
    Some("""WITH f AS (
           |  SELECT event_id, CAST(value AS DOUBLE) AS v,
           |    CAST(len(props) AS DOUBLE) AS lp,
           |    CAST(extract(hour FROM ts) AS DOUBLE) AS hr
           |  FROM events),
           |melt AS (
           |  SELECT event_id, 'v' AS feature, v AS x FROM f
           |  UNION ALL SELECT event_id, 'lp', lp FROM f
           |  UNION ALL SELECT event_id, 'hr', hr FROM f),
           |mm AS (
           |  SELECT feature, min(x) AS mn, max(x) AS mx,
           |    CAST(count(*) AS BIGINT) AS n
           |  FROM melt GROUP BY 1),
           |bx AS (
           |  SELECT m.event_id, m.feature,
           |    CASE WHEN mm.mx = mm.mn THEN 0
           |      ELSE least(CAST(floor((m.x - mm.mn) * 10 / (mm.mx - mm.mn))
           |        AS BIGINT), 9) END AS bin
           |  FROM melt m JOIN mm USING (feature)),
           |hist AS (
           |  SELECT feature, bin, CAST(count(*) AS BIGINT) AS c
           |  FROM bx GROUP BY 1, 2),
           |scored AS (
           |  SELECT b.event_id,
           |    sum(CAST(round(-ln(CAST(h.c AS DOUBLE) / mm.n), 8)
           |      AS DECIMAL(20,8))) AS score
           |  FROM bx b
           |  JOIN hist h ON b.feature = h.feature AND b.bin = h.bin
           |  JOIN mm ON mm.feature = b.feature
           |  GROUP BY 1)
           |SELECT event_id, CAST(score AS DOUBLE) AS score
           |FROM scored
           |ORDER BY score DESC, event_id
           |LIMIT 20""".stripMargin),
    (s, d) => {
      val f = Tables.events(s, d).select(col("event_id"),
        col("value").cast("double").as("v"),
        length(col("props")).cast("double").as("lp"),
        expr("(ts div 3600000000000) % 24").cast("double").as("hr"))
      val melt = f.select(col("event_id"), explode(array(
          struct(lit("v").as("feature"), col("v").as("x")),
          struct(lit("lp").as("feature"), col("lp").as("x")),
          struct(lit("hr").as("feature"), col("hr").as("x")))).as("m"))
        .select(col("event_id"), col("m.feature").as("feature"),
          col("m.x").as("x"))
      val mm = melt.groupBy("feature").agg(min("x").as("mn"),
        max("x").as("mx"), count(lit(1)).as("n"))
      val bx = graft.operators.PlanCache.persist(
        melt.join(broadcast(mm), "feature")
          .select(col("event_id"), col("feature"),
            when(col("mx") === col("mn"), 0L)
              .otherwise(least(floor((col("x") - col("mn")) * 10
                / (col("mx") - col("mn"))).cast("long"), lit(9L)))
              .as("bin")))
      val hist = bx.groupBy("feature", "bin").agg(count(lit(1)).as("c"))
      bx.join(broadcast(hist), Seq("feature", "bin"))
        .join(broadcast(mm.select(col("feature"), col("n"))), "feature")
        .groupBy("event_id")
        .agg(sum(round(-log(col("c").cast("double") / col("n")), 8)
          .cast("decimal(20,8)")).as("score"))
        .select(col("event_id"), col("score").cast("double").as("score"))
        .orderBy(col("score").desc, col("event_id"))
        .limit(20)
    })


  /** GINI coefficient + Lorenz curve of per-source token contribution —
    * the inequality lens on corpus composition beside q317's HHI (which
    * answers "how concentrated"; Gini answers "how UNEQUAL", and the
    * Lorenz points show where the inequality lives). Gini uses the
    * exact mean-absolute-difference identity G = Σᵢⱼ|cᵢ−cⱼ| / (2n·Σc)
    * on integer token counts — an all-pairs sum, but over the SOURCE
    * grid (k×k, k = #sources), never over documents. Lorenz = sources
    * sorted by contribution ascending, cumulative share at each rank.
    * All arithmetic is integer until the two final display divides.
    *
    * Scale shape: one corpus token agg onto the source grid; the pair
    * sum and the rank window both run on grid rows. */
  val q379_source_gini = Q(
    "q379_source_gini",
    Some("""WITH t AS (
           |  SELECT source, CAST(sum(len(list_filter(
           |    string_split(text, ' '), x -> len(x) > 0))) AS BIGINT) AS c
           |  FROM documents GROUP BY 1),
           |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
           |               CAST(sum(c) AS BIGINT) AS sc FROM t),
           |gin AS (
           |  SELECT round(CAST(sum(abs(a.c - b.c)) AS DOUBLE)
           |    / (2.0 * tot.n * tot.sc), 6) AS gini
           |  FROM t a CROSS JOIN t b CROSS JOIN tot
           |  GROUP BY tot.n, tot.sc),
           |lor AS (
           |  SELECT source, c,
           |    ROW_NUMBER() OVER (ORDER BY c, source) AS rk,
           |    sum(c) OVER (ORDER BY c, source
           |      ROWS UNBOUNDED PRECEDING) AS cum
           |  FROM t)
           |SELECT CAST(rk AS BIGINT) AS rk, source, c AS tokens,
           |  round(CAST(cum AS DOUBLE) / tot.sc, 6) AS cum_share,
           |  gin.gini AS gini
           |FROM lor CROSS JOIN tot CROSS JOIN gin
           |ORDER BY rk""".stripMargin),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val t = graft.operators.PlanCache.persist(Tables.documents(s, d)
        .groupBy("source")
        .agg(sum(size(expr("filter(split(text, ' '), x -> length(x) > 0)"))
          .cast("long")).cast("long").as("c")))
      val tot = t.agg(count(lit(1)).as("n"), sum("c").cast("long").as("sc"))
      val gin = t.select(col("c").as("ca"))
        .crossJoin(t.select(col("c").as("cb")))
        .crossJoin(broadcast(tot))
        .groupBy("n", "sc")
        .agg(round(sum(abs(col("ca") - col("cb"))).cast("double")
          / (lit(2.0) * col("n") * col("sc")), 6).as("gini"))
        .select("gini")
      val w = Window.orderBy("c", "source")
      val wc = Window.orderBy("c", "source")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t.withColumn("rk", row_number().over(w).cast("long"))
        .withColumn("cum", sum("c").over(wc))
        .crossJoin(broadcast(tot)).crossJoin(broadcast(gin))
        .select(col("rk"), col("source"), col("c").as("tokens"),
          round(col("cum").cast("double") / col("sc"), 6).as("cum_share"),
          col("gini"))
        .orderBy("rk")
    })

  val all: Seq[Q] = Seq(q151_dsir_resample, q152_bigram_ppl,
    q162_quantile_binning, q166_weighted_median, q167_cusum,
    q174_source_influence, q182_batch_drift, q183_user_anomaly_days,
    q212_luhn_audit, q214_benford, q317_source_hhi, q375_hbos,
    q379_source_gini)
}
