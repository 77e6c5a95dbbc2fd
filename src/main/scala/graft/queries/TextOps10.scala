package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions

/** Round-9 text additions, part 2: cross-document boilerplate detection
  * and Jaro–Winkler entity resolution on a blocked, distinct-first pair
  * space.
  */
object TextOps10 {

  private val BoilN = 5      // shingle width (tokens)
  private val BoilFrac = 0.05 // doc-frequency threshold for "boilerplate"

  /** Cross-document boilerplate audit (the CCNet-style cleanup step a
    * web-scale corpus needs BEFORE dedup/quality scoring): a 5-token
    * shingle is boilerplate when it appears in ≥ 5% of documents; per
    * source, the mean and max fraction of a document's distinct shingles
    * that are boilerplate. Shingles come from the native Md5Shingles
    * scan (per-doc distinct, one digest pass); doc frequency is one
    * term-keyed agg; membership is a term-keyed LEFT join of the shingle
    * table against the (small) boilerplate set — no doc×doc comparisons
    * anywhere, so the pair space never materializes at any corpus size.
    * Per-doc fractions round at 6 then decimal-sum per source. */
  val q311_boilerplate = Q(
    "q311_boilerplate",
    Some(s"""WITH tok AS (
            |  SELECT doc_id, source, string_split(text, ' ') AS ts
            |  FROM documents),
            |sh AS (
            |  SELECT doc_id, source, unnest(list_distinct(list_transform(
            |    generate_series(1, greatest(len(ts) - ${BoilN - 1}, 0)),
            |    i -> md5(ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' '
            |      || ts[i+3] || ' ' || ts[i+4])))) AS h
            |  FROM tok),
            |nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
            |df AS (SELECT h, CAST(count(*) AS BIGINT) AS c FROM sh GROUP BY h),
            |boiler AS (
            |  SELECT h FROM df CROSS JOIN nd WHERE c >= ceil($BoilFrac * n)),
            |nb AS (SELECT CAST(count(*) AS BIGINT) AS n_boiler FROM boiler),
            |pd AS (
            |  SELECT sh.doc_id, sh.source,
            |    CAST(count(*) AS BIGINT) AS n_sh,
            |    CAST(sum(CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END)
            |      AS BIGINT) AS n_b
            |  FROM sh LEFT JOIN boiler b ON sh.h = b.h
            |  GROUP BY sh.doc_id, sh.source)
            |SELECT source, CAST(count(*) AS BIGINT) AS n_docs, n_boiler,
            |  round(CAST(sum(CAST(round(CAST(n_b AS DOUBLE) / n_sh, 6)
            |    AS DECIMAL(28,6))) AS DOUBLE) / count(*), 6) AS mean_bfrac,
            |  round(max(round(CAST(n_b AS DOUBLE) / n_sh, 6)), 6)
            |    AS max_bfrac
            |FROM pd CROSS JOIN nb
            |GROUP BY source, n_boiler ORDER BY source""".stripMargin),
    (s, d) => {
      import TextFunctions.{md5Shingles, tokens}
      val docs = Tables.documents(s, d)
      // persisted: the shingle table feeds both the doc-frequency agg
      // and the membership join
      val sh = graft.operators.PlanCache.persist(docs
        .select(col("doc_id"), col("source"),
          explode(md5Shingles(tokens(col("text")), BoilN)).as("h")))
      val nd = docs.agg(count(lit(1)).as("n"))
      val boiler = sh.groupBy("h").agg(count(lit(1)).as("c"))
        .crossJoin(broadcast(nd))
        .filter(col("c") >= ceil(lit(BoilFrac) * col("n")))
        .select("h")
      val nb = boiler.agg(count(lit(1)).as("n_boiler"))
      val pd = sh.join(boiler.withColumn("isb", lit(1)), Seq("h"), "left")
        .groupBy("doc_id", "source")
        .agg(count(lit(1)).as("n_sh"),
          sum(when(col("isb").isNotNull, 1L).otherwise(0L)).as("n_b"))
      val frac = round(col("n_b").cast("double") / col("n_sh"), 6)
      pd.crossJoin(broadcast(nb))
        .groupBy("source", "n_boiler")
        .agg(count(lit(1)).as("n_docs"),
          round(sum(frac.cast("decimal(28,6)")).cast("double") /
            count(lit(1)), 6).as("mean_bfrac"),
          round(max(frac), 6).as("max_bfrac"))
        .select(col("source"), col("n_docs"), col("n_boiler"),
          col("mean_bfrac"), col("max_bfrac"))
        .orderBy("source")
    })

  /** Entity resolution over part names with the native Jaro–Winkler
    * expression (pinned to the oracle engine's semantics, see
    * JaroWinkler in TextExpressions): DISTINCT-FIRST — candidate pairs
    * form over the distinct-name grid (64 names here; bounded by the
    * name vocabulary, not the row count, at any corpus scale), blocked
    * on the first token so only in-block pairs are scored, each name
    * carrying its row count back to the match report. The scorer is
    * codegen'd, so the block-join + filter stays one WholeStageCodegen
    * span. */
  val q312_jw_entity_match = Q(
    "q312_jw_entity_match",
    Some("""WITH n AS (
           |  SELECT p_name, split_part(p_name, ' ', 1) AS blk,
           |    CAST(count(*) AS BIGINT) AS cnt
           |  FROM part GROUP BY 1, 2)
           |SELECT a.p_name AS name_a, b.p_name AS name_b,
           |  a.cnt AS cnt_a, b.cnt AS cnt_b,
           |  round(jaro_winkler_similarity(a.p_name, b.p_name), 6) AS jw
           |FROM n a JOIN n b
           |  ON a.blk = b.blk AND a.p_name < b.p_name
           |WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.88
           |ORDER BY jw DESC, name_a, name_b""".stripMargin),
    (s, d) => {
      val n = Tables.part(s, d)
        .groupBy(col("p_name"), substring_index(col("p_name"), " ", 1)
          .as("blk"))
        .agg(count(lit(1)).as("cnt"))
      val a = n.select(col("p_name").as("name_a"), col("blk"),
        col("cnt").as("cnt_a"))
      val b = n.select(col("p_name").as("name_b"), col("blk"),
        col("cnt").as("cnt_b"))
      val jw = TextFunctions.jaroWinkler(col("name_a"), col("name_b"))
      a.join(broadcast(b),
          a("blk") === b("blk") && col("name_a") < col("name_b"))
        .filter(jw >= 0.88)
        .select(col("name_a"), col("name_b"), col("cnt_a"), col("cnt_b"),
          round(jw, 6).as("jw"))
        .orderBy(col("jw").desc, col("name_a"), col("name_b"))
    })

  /** Classifier evaluation for the q31 language-ID heuristic: per-class
    * precision / recall / F1 from the truth×prediction confusion grid,
    * with macro-F1 carried on every row — the eval harness a language-ID
    * stage ships with (q31 reports raw confusion counts; this is the
    * decision-grade readout). Undefined ratios (a class never predicted
    * or absent) report 0 by the standard convention on BOTH engines.
    * One corpus agg onto the ≤ |langs|² grid; macro-F1 decimal-averages
    * the rounded per-class F1s. */
  val q319_langid_eval = Q(
    "q319_langid_eval",
    Some("""WITH pred AS (
           |  SELECT lang,
           |    CASE WHEN contains(text, 'the ') THEN 'en'
           |         WHEN contains(text, 'data ') THEN 'de'
           |         ELSE 'und' END AS predicted,
           |    CAST(count(*) AS BIGINT) AS n
           |  FROM documents GROUP BY 1, 2),
           |classes AS (SELECT DISTINCT lang FROM pred),
           |pc AS (
           |  SELECT c.lang,
           |    COALESCE((SELECT sum(n) FROM pred p
           |      WHERE p.lang = c.lang AND p.predicted = c.lang), 0) AS tp,
           |    COALESCE((SELECT sum(n) FROM pred p
           |      WHERE p.lang <> c.lang AND p.predicted = c.lang), 0) AS fp,
           |    COALESCE((SELECT sum(n) FROM pred p
           |      WHERE p.lang = c.lang AND p.predicted <> c.lang), 0) AS fn
           |  FROM classes c),
           |m AS (
           |  SELECT lang, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           |    CAST(fn AS BIGINT) AS fn,
           |    CASE WHEN tp + fp = 0 THEN CAST(0 AS DOUBLE)
           |         ELSE round(CAST(tp AS DOUBLE) / (tp + fp), 6) END AS p,
           |    CASE WHEN tp + fn = 0 THEN CAST(0 AS DOUBLE)
           |         ELSE round(CAST(tp AS DOUBLE) / (tp + fn), 6) END AS r
           |  FROM pc),
           |f AS (
           |  SELECT lang, tp, fp, fn, p, r,
           |    CASE WHEN p + r = 0 THEN CAST(0 AS DOUBLE)
           |         ELSE round(2 * p * r / (p + r), 6) END AS f1
           |  FROM m),
           |mac AS (
           |  SELECT round(CAST(sum(CAST(f1 AS DECIMAL(18,6))) AS DOUBLE)
           |    / count(*), 6) AS macro_f1 FROM f)
           |SELECT lang, tp, fp, fn, p AS precision_, r AS recall, f1,
           |  macro_f1
           |FROM f CROSS JOIN mac ORDER BY lang""".stripMargin),
    (s, d) => {
      val pred = graft.operators.PlanCache.persist(Tables.documents(s, d)
        .groupBy(col("lang"),
          when(col("text").contains("the "), "en")
            .when(col("text").contains("data "), "de")
            .otherwise("und").as("predicted"))
        .agg(count(lit(1)).as("n")))
      val classes = pred.select("lang").distinct()
      val tp = pred.filter(col("lang") === col("predicted"))
        .groupBy("lang").agg(sum("n").as("tp"))
      val fp = pred.filter(col("lang") =!= col("predicted"))
        .groupBy(col("predicted").as("lang")).agg(sum("n").as("fp"))
      val fn = pred.filter(col("lang") =!= col("predicted"))
        .groupBy("lang").agg(sum("n").as("fn"))
      val pc = classes
        .join(tp, Seq("lang"), "left").join(fp, Seq("lang"), "left")
        .join(fn, Seq("lang"), "left")
        .select(col("lang"),
          coalesce(col("tp"), lit(0L)).cast("long").as("tp"),
          coalesce(col("fp"), lit(0L)).cast("long").as("fp"),
          coalesce(col("fn"), lit(0L)).cast("long").as("fn"))
      val p = when(col("tp") + col("fp") === 0, lit(0.0))
        .otherwise(round(col("tp").cast("double") /
          (col("tp") + col("fp")), 6))
      val r = when(col("tp") + col("fn") === 0, lit(0.0))
        .otherwise(round(col("tp").cast("double") /
          (col("tp") + col("fn")), 6))
      val m = pc.select(col("lang"), col("tp"), col("fp"), col("fn"),
        p.as("p"), r.as("r"))
      val f = graft.operators.PlanCache.persist(m.select(col("lang"),
        col("tp"), col("fp"), col("fn"), col("p"), col("r"),
        when(col("p") + col("r") === 0, lit(0.0))
          .otherwise(round(lit(2) * col("p") * col("r") /
            (col("p") + col("r")), 6)).as("f1")))
      val mac = f.agg(round(sum(col("f1").cast("decimal(18,6)"))
        .cast("double") / count(lit(1)), 6).as("macro_f1"))
      f.crossJoin(broadcast(mac))
        .select(col("lang"), col("tp"), col("fp"), col("fn"),
          col("p").as("precision_"), col("r").as("recall"), col("f1"),
          col("macro_f1"))
        .orderBy("lang")
    })

  /** Quality-filter disparity across languages — the fairness audit an
    * LLM curation pipeline owes its long-tail languages: the q187 gate
    * rules (length / mean-word-length / type-token / max-word-length)
    * evaluated per LANG, each group's pass rate compared to the
    * best-passing group, with the four-fifths-rule flag (ratio < 0.8 ⇒
    * the filter disproportionately drops that language). One scan-side
    * rule projection + one lang-keyed agg; the ratio/flag arithmetic
    * runs on the |langs| grid. */
  val q333_filter_disparity = Q(
    "q333_filter_disparity",
    Some("""WITH m AS (
           |  SELECT lang,
           |    len(text) - len(replace(text, ' ', '')) + 1 AS words,
           |    len(replace(text, ' ', '')) AS letters,
           |    len(list_distinct(string_split(text, ' '))) AS dwords,
           |    list_max(list_transform(string_split(text, ' '),
           |      w -> len(w))) AS maxw
           |  FROM documents),
           |r AS (
           |  SELECT lang,
           |    CASE WHEN words >= 50 AND words <= 100000
           |      AND letters >= 3 * words AND letters <= 10 * words
           |      AND 5 * dwords >= 2 * words AND maxw <= 30
           |      THEN 1 ELSE 0 END AS pass
           |  FROM m),
           |g AS (
           |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           |    CAST(sum(pass) AS BIGINT) AS n_pass,
           |    round(CAST(sum(pass) AS DOUBLE) / count(*), 6) AS pass_rate
           |  FROM r GROUP BY lang),
           |b AS (SELECT max(pass_rate) AS best FROM g)
           |SELECT lang, n_docs, n_pass, pass_rate,
           |  round(pass_rate / best, 6) AS ratio_to_best,
           |  CASE WHEN pass_rate < 0.8 * best THEN 1 ELSE 0 END
           |    AS four_fifths_flag
           |FROM g CROSS JOIN b ORDER BY lang""".stripMargin),
    (s, d) => {
      val toks = split(col("text"), " ")
      val words = length(col("text")) -
        length(regexp_replace(col("text"), " ", "")) + 1
      val letters = length(regexp_replace(col("text"), " ", ""))
      val dwords = size(array_distinct(toks))
      val maxw = array_max(transform(toks, w => length(w)))
      val pass = when(words >= 50 && words <= 100000 &&
        letters >= lit(3) * words && letters <= lit(10) * words &&
        lit(5) * dwords >= lit(2) * words && maxw <= 30, 1).otherwise(0)
      val g = Tables.documents(s, d)
        .select(col("lang"), pass.as("pass"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("pass").cast("long").as("n_pass"),
          round(sum("pass").cast("double") / count(lit(1)), 6)
            .as("pass_rate"))
      val b = g.agg(max("pass_rate").as("best"))
      g.crossJoin(broadcast(b))
        .select(col("lang"), col("n_docs"), col("n_pass"), col("pass_rate"),
          round(col("pass_rate") / col("best"), 6).as("ratio_to_best"),
          when(col("pass_rate") < lit(0.8) * col("best"), 1).otherwise(0)
            .as("four_fifths_flag"))
        .orderBy("lang")
    })

  /** Top-k term churn between corpus halves (doc_id parity = the two
    * "batches"): which of each half's top-10 terms entered, exited, or
    * moved — the trending-vocabulary readout a refresh pipeline prints
    * per ingest batch. Term counts are one hash agg per half off one
    * scan (conditional aggregation, no second pass); ranks come from
    * windows on the two 10-row top lists; the FULL OUTER join of the
    * lists classifies each term. */
  val q336_topk_churn = Q(
    "q336_topk_churn",
    Some("""WITH t AS (
           |  SELECT unnest(string_split(text, ' ')) AS term,
           |    doc_id % 2 AS half
           |  FROM documents),
           |c AS (
           |  SELECT term,
           |    CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT)
           |      AS ca,
           |    CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT)
           |      AS cb
           |  FROM t GROUP BY term),
           |ra AS (
           |  SELECT term, ca, ROW_NUMBER() OVER (ORDER BY ca DESC, term)
           |    AS rank_a
           |  FROM c QUALIFY rank_a <= 10),
           |rb AS (
           |  SELECT term, cb, ROW_NUMBER() OVER (ORDER BY cb DESC, term)
           |    AS rank_b
           |  FROM c QUALIFY rank_b <= 10)
           |SELECT COALESCE(ra.term, rb.term) AS term,
           |  CAST(ra.rank_a AS BIGINT) AS rank_a,
           |  CAST(rb.rank_b AS BIGINT) AS rank_b,
           |  CASE WHEN ra.term IS NULL THEN 'entered'
           |       WHEN rb.term IS NULL THEN 'exited'
           |       ELSE 'stayed' END AS status
           |FROM ra FULL OUTER JOIN rb ON ra.term = rb.term
           |ORDER BY COALESCE(ra.rank_a, 99), COALESCE(rb.rank_b, 99),
           |  term""".stripMargin),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val c = graft.operators.PlanCache.persist(Tables.documents(s, d)
        .select(explode(TextFunctions.tokens(col("text"))).as("term"),
          (col("doc_id") % 2).as("half"))
        .groupBy("term")
        .agg(sum(when(col("half") === 0, 1L).otherwise(0L)).as("ca"),
          sum(when(col("half") === 1, 1L).otherwise(0L)).as("cb")))
      // TakeOrdered first, THEN rank on the 10-row frame — the global
      // window never sees the full vocabulary
      val ra = c.orderBy(col("ca").desc, col("term")).limit(10)
        .withColumn("rank_a", row_number()
          .over(Window.orderBy(col("ca").desc, col("term"))).cast("long"))
        .select("term", "rank_a")
      val rb = c.orderBy(col("cb").desc, col("term")).limit(10)
        .withColumn("rank_b", row_number()
          .over(Window.orderBy(col("cb").desc, col("term"))).cast("long"))
        .select("term", "rank_b")
      ra.join(rb, Seq("term"), "full_outer")
        .select(col("term"), col("rank_a"), col("rank_b"),
          when(col("rank_a").isNull, "entered")
            .when(col("rank_b").isNull, "exited")
            .otherwise("stayed").as("status"))
        .orderBy(coalesce(col("rank_a"), lit(99L)),
          coalesce(col("rank_b"), lit(99L)), col("term"))
    })

  /** Content-defined chunking (storage-dedup's CDC, token-granular): a
    * chunk boundary falls AFTER any token whose md5 prefix ≡ 0 (mod 8)
    * — content-derived, so an insertion only reshuffles chunks locally
    * (the property fixed-width chunking lacks). Reports expected chunk
    * geometry plus the cross-corpus dedup dividend: distinct chunk
    * hashes vs total, and chunks appearing in >1 document. Chunk
    * assembly is a per-doc cumulative window (doc-keyed — never a
    * global sort); chunk hashing/grouping is one term-keyed agg. */
  val q340_cdc_chunking = Q(
    "q340_cdc_chunking", {
      import graft.functions.TextFunctions.hexSpanValSql
      val bnd = s"CASE WHEN ${hexSpanValSql("md5(tok)", 0, 2)} % 8 = 0" +
        " THEN 1 ELSE 0 END"
      Some(s"""WITH tok AS (
              |  SELECT doc_id, g.i AS pos, ts[g.i] AS tok
              |  FROM (SELECT doc_id, string_split(text, ' ') AS ts
              |        FROM documents) t,
              |    unnest(generate_series(1, len(ts))) AS g(i)),
              |flagged AS (
              |  SELECT doc_id, pos, tok, $bnd AS bnd
              |  FROM tok),
              |chunked AS (
              |  SELECT doc_id, tok,
              |    COALESCE(sum(bnd) OVER (PARTITION BY doc_id ORDER BY pos
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              |      AS chunk_no,
              |    pos
              |  FROM flagged),
              |chunks AS (
              |  SELECT doc_id, chunk_no,
              |    md5(string_agg(tok, ' ' ORDER BY pos)) AS h,
              |    CAST(count(*) AS BIGINT) AS n_toks
              |  FROM chunked GROUP BY doc_id, chunk_no),
              |m AS (
              |  SELECT CAST(count(*) AS BIGINT) AS n_chunks,
              |    CAST(count(DISTINCT h) AS BIGINT) AS n_distinct,
              |    CAST(sum(n_toks) AS BIGINT) AS n_toks
              |  FROM chunks),
              |xd AS (
              |  SELECT CAST(count(*) AS BIGINT) AS n_shared FROM (
              |    SELECT h FROM (
              |      SELECT h, count(DISTINCT doc_id) AS nd
              |      FROM chunks GROUP BY h) t WHERE nd > 1) t2)
              |SELECT n_chunks, n_distinct,
              |  round(1 - CAST(n_distinct AS DOUBLE) / n_chunks, 6)
              |    AS dedup_ratio,
              |  round(CAST(n_toks AS DOUBLE) / n_chunks, 6)
              |    AS mean_chunk_toks,
              |  n_shared
              |FROM m CROSS JOIN xd""".stripMargin)
    },
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      import graft.functions.TextFunctions.hexSpanValSql
      val tok = Tables.documents(s, d)
        .select(col("doc_id"),
          posexplode(TextFunctions.tokens(col("text"))).as(Seq("p", "tok")))
        .select(col("doc_id"), (col("p") + 1).as("pos"), col("tok"))
      val bnd = when(expr(hexSpanValSql("md5(tok)", 0, 2)) % 8 === 0, 1)
        .otherwise(0)
      val wdoc = Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
      val chunked = tok
        .withColumn("bnd", bnd)
        .withColumn("chunk_no", coalesce(sum("bnd").over(wdoc), lit(0)))
      val chunks = graft.operators.PlanCache.persist(chunked
        .groupBy("doc_id", "chunk_no")
        .agg(md5(concat_ws(" ",
          array_sort(collect_list(struct(col("pos"), col("tok"))))
            .getField("tok"))).as("h"),
          count(lit(1)).as("n_toks")))
      val m = chunks.agg(count(lit(1)).as("n_chunks"),
        countDistinct("h").as("n_distinct"),
        sum("n_toks").cast("long").as("n_toks"))
      val xd = chunks.groupBy("h")
        .agg(countDistinct("doc_id").as("nd"))
        .filter(col("nd") > 1)
        .agg(count(lit(1)).as("n_shared"))
      m.crossJoin(broadcast(xd))
        .select(col("n_chunks"), col("n_distinct"),
          round(lit(1) - col("n_distinct").cast("double") /
            col("n_chunks"), 6).as("dedup_ratio"),
          round(col("n_toks").cast("double") / col("n_chunks"), 6)
            .as("mean_chunk_toks"),
          col("n_shared"))
    })

  /** Perplexity-filter PLANNER: before a cross-entropy filter ships,
    * sweep its threshold over the doc-level unigram cross-entropy
    * distribution (p50/p75/p90 order statistics of H = −mean log2
    * p(token) under the corpus LM) and report, per candidate threshold,
    * the overall drop rate plus the worst per-language drop rate and
    * the q333 four-fifths disparity flag — the "does this quality knob
    * silently delete a language" pre-flight. Two corpus passes (term LM
    * + term-keyed logprob join).
    *
    * Scale shape (VERDICT r10 #2 — this entry previously ranked every
    * doc through ONE unpartitioned row_number window): p50/p75/p90 are
    * now exact order statistics selected from the h-GRID histogram
    * (h is rounded to 6 decimals at construction, so groupBy(h) is a
    * bounded post-agg grid — the q253/q264/q358 device), and since r12
    * the grid cumsum itself runs the q280/q159 two-phase 256-bucket
    * prefix sum: the only unpartitioned window orders the 256-row
    * bucket-offset grid, never the h grid (whose value-range × 1e6
    * bound can saturate at ~1e7 cells). The selected value
    * min(h | cum ≥ ⌈p·n⌉) is identical to the h at global rank
    * ⌈p·n⌉, so the oracle's rank formulation is unchanged. */
  val q345_ppl_filter_plan = Q(
    "q345_ppl_filter_plan",
    Some("""WITH t AS (
           |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
           |  FROM documents),
           |lm AS (
           |  SELECT term, CAST(count(*) AS BIGINT) AS c,
           |    CAST((SELECT count(*) FROM t) AS BIGINT) AS n
           |  FROM t GROUP BY term),
           |dh AS (
           |  SELECT t.doc_id, t.lang,
           |    round(CAST(sum(CAST(round(-log2(CAST(lm.c AS DOUBLE) / lm.n),
           |      9) AS DECIMAL(28,9))) AS DOUBLE) / count(*), 6) AS h
           |  FROM t JOIN lm ON lm.term = t.term
           |  GROUP BY t.doc_id, t.lang),
           |qs AS (
           |  SELECT
           |    max(CASE WHEN r = CAST(ceil(0.50 * n) AS BIGINT)
           |      THEN h END) AS p50,
           |    max(CASE WHEN r = CAST(ceil(0.75 * n) AS BIGINT)
           |      THEN h END) AS p75,
           |    max(CASE WHEN r = CAST(ceil(0.90 * n) AS BIGINT)
           |      THEN h END) AS p90
           |  FROM (SELECT h, ROW_NUMBER() OVER (ORDER BY h, doc_id) AS r,
           |          count(*) OVER () AS n FROM dh) t),
           |thr AS (
           |  SELECT 'p50' AS thr_label, p50 AS thr FROM qs
           |  UNION ALL SELECT 'p75', p75 FROM qs
           |  UNION ALL SELECT 'p90', p90 FROM qs),
           |lr AS (
           |  SELECT thr_label, thr, lang,
           |    round(CAST(sum(CASE WHEN h > thr THEN 1 ELSE 0 END)
           |      AS DOUBLE) / count(*), 6) AS drop_rate
           |  FROM dh CROSS JOIN thr GROUP BY thr_label, thr, lang),
           |agg AS (
           |  SELECT thr_label, thr,
           |    max(drop_rate) AS max_lang_drop,
           |    min(drop_rate) AS min_lang_drop
           |  FROM lr GROUP BY thr_label, thr),
           |ov AS (
           |  SELECT thr_label,
           |    round(CAST(sum(CASE WHEN h > thr THEN 1 ELSE 0 END)
           |      AS DOUBLE) / count(*), 6) AS overall_drop
           |  FROM dh CROSS JOIN thr GROUP BY thr_label, thr)
           |SELECT a.thr_label, round(a.thr, 6) AS threshold,
           |  ov.overall_drop, a.max_lang_drop, a.min_lang_drop,
           |  CASE WHEN a.max_lang_drop > 0 AND
           |    a.min_lang_drop < 0.8 * a.max_lang_drop
           |    THEN 1 ELSE 0 END AS disparity_flag
           |FROM agg a JOIN ov ON ov.thr_label = a.thr_label
           |ORDER BY a.thr_label""".stripMargin),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val t = graft.operators.PlanCache.persist(
        graft.operators.Spread.byKey(Tables.documents(s, d), "doc_id")
        .select(col("doc_id"), col("lang"),
          explode(TextFunctions.tokens(col("text"))).as("term")))
      val n = t.agg(count(lit(1)).as("n"))
      val lm = t.groupBy("term").agg(count(lit(1)).as("c"))
      val dh = graft.operators.PlanCache.persist(
        t.join(lm, "term").crossJoin(broadcast(n))
          .groupBy("doc_id", "lang")
          .agg(round(sum(
            round(-log2(col("c").cast("double") / col("n")), 9)
              .cast("decimal(28,9)")).cast("double") / count(lit(1)), 6)
            .as("h")))
      val hg = dh.groupBy("h").agg(count(lit(1)).as("c"))
      // Two-phase 256-bucket prefix sum (the q280/q159 device; VERDICT
      // r11 #1): the 6-decimal h grid is bounded by value-range × 1e6
      // cells — real, but up to ~1e7 rows through ONE partition in the
      // saturated limit, the weakest bound in the window allowlist. So:
      // range-bucket the grid into 256 monotone value bands, cumulate
      // the 256-row bucket-sum grid through the one remaining
      // unpartitioned window (FixedK ≤ 256), and finish the cumsum
      // per-bucket in parallel. Bucket index is monotone in h, so
      // off + in-bucket cumsum = the global cumsum, bit-identical.
      val tot = hg.agg(sum("c").cast("long").as("nn"))
      val rng = hg.agg(min("h").as("mn"), max("h").as("mx"))
      val bucketed = hg.crossJoin(broadcast(rng))
        .withColumn("bucket",
          when(col("mx") > col("mn"),
            least(floor((col("h") - col("mn")) * 256.0 /
              (col("mx") - col("mn"))).cast("long"), lit(255L)))
            .otherwise(lit(0L)))
      val wOff = Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = bucketed.groupBy("bucket").agg(sum("c").as("bsum"))
        .withColumn("off", coalesce(sum("bsum").over(wOff), lit(0L)))
        .select("bucket", "off")
      val wIn = Window.partitionBy("bucket").orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
      val cgrid = bucketed.join(broadcast(offsets), Seq("bucket"))
        .crossJoin(broadcast(tot))
        .select(col("h"),
          (col("off") + sum("c").over(wIn)).cast("long").as("cum"),
          col("nn"))
      def oStat(p: Double) =
        min(when(col("cum") >= ceil(lit(p) * col("nn")).cast("long"),
          col("h")))
      val qs = cgrid.agg(oStat(0.50).as("p50"), oStat(0.75).as("p75"),
        oStat(0.90).as("p90"))
      // stack() evaluates qs ONCE in the plan (the 3-way union replayed
      // the whole grid lineage per threshold), and the per-lang pass
      // carries (drops, cnt) so overall_drop = Σdrops/Σcnt folds into
      // the SAME aggregation — one corpus×thr pass instead of two
      val thr = qs.select(expr(
        "stack(3, 'p50', p50, 'p75', p75, 'p90', p90) AS (thr_label, thr)"))
      val base = dh.crossJoin(broadcast(thr))
      val lr = base.groupBy("thr_label", "thr", "lang")
        .agg(sum(when(col("h") > col("thr"), 1).otherwise(0))
          .cast("long").as("drops"), count(lit(1)).as("cnt"))
        .withColumn("drop_rate",
          round(col("drops").cast("double") / col("cnt"), 6))
      val agg = lr.groupBy("thr_label", "thr")
        .agg(max("drop_rate").as("max_lang_drop"),
          min("drop_rate").as("min_lang_drop"),
          round(sum("drops").cast("double") / sum("cnt"), 6)
            .as("overall_drop"))
      agg
        .select(col("thr_label"), round(col("thr"), 6).as("threshold"),
          col("overall_drop"), col("max_lang_drop"), col("min_lang_drop"),
          when(col("max_lang_drop") > 0 &&
            col("min_lang_drop") < lit(0.8) * col("max_lang_drop"), 1)
            .otherwise(0).as("disparity_flag"))
        .orderBy("thr_label")
    })

  private val DedupSampleN = 40

  /** Dedup-AWARE sampling — "count every near-dup cluster once": each
    * document's sampling weight is 1/|its q73 cluster| (singletons keep
    * weight 1), then the q255 Efraimidis–Spirakis fixed-n draw picks 40
    * docs — so a cluster of 20 boilerplate copies competes with one
    * unique doc on equal footing, the correction an LLM data pipeline
    * applies so duplicated content can't dominate the training mix.
    * Clusters come from the banded-LSH closure (never all-pairs);
    * non-clustered docs join in with cluster size 1 via a LEFT join;
    * the draw is the TakeOrdered shape, no global sort. The readout
    * carries per-pick cluster sizes so the de-duplication effect is
    * visible (large clusters appear, but at most ~once). */
  val q353_dedup_aware_sample = Q(
    "q353_dedup_aware_sample", {
      import graft.functions.TextFunctions.hexSpanValSql
      val u = s"(${hexSpanValSql("md5(CAST(doc_id AS VARCHAR))", 0, 13)} + 1) / CAST(4503599627370497 AS DOUBLE)"
      Some(s"""${TextOps.lshPairsSqlPrefix},
              |edges AS (
              |  SELECT doc_a AS u, doc_b AS v FROM pairs
              |  UNION SELECT doc_b, doc_a FROM pairs),
              |cnodes AS (SELECT DISTINCT u AS node FROM edges),
              |reach AS (
              |  SELECT node, node AS m FROM cnodes
              |  UNION
              |  SELECT r.node, e.v AS m FROM reach r JOIN edges e
              |    ON e.u = r.m),
              |cl AS (
              |  SELECT node AS doc_id, min(m) AS cluster_id
              |  FROM reach GROUP BY node),
              |sizes AS (
              |  SELECT cluster_id, CAST(count(*) AS BIGINT) AS csize
              |  FROM cl GROUP BY cluster_id),
              |docs AS (
              |  SELECT d.doc_id,
              |    COALESCE(cl.cluster_id, d.doc_id) AS cluster_id,
              |    COALESCE(sizes.csize, 1) AS csize
              |  FROM documents d
              |  LEFT JOIN cl ON cl.doc_id = d.doc_id
              |  LEFT JOIN sizes ON sizes.cluster_id = cl.cluster_id),
              |k AS (
              |  SELECT doc_id, cluster_id, csize,
              |    round(-ln($u) * csize, 9) AS draw_key
              |  FROM docs)
              |SELECT doc_id, cluster_id, csize, draw_key
              |FROM k ORDER BY draw_key, doc_id
              |LIMIT $DedupSampleN""".stripMargin)
    },
    (s, d) => {
      import graft.functions.TextFunctions.hexSpanValSql
      val docs = Tables.documents(s, d)
      val cl = graft.operators.Dedup.nearDupClusters(
        docs, "doc_id", "text",
        k = TextOps.MinhashK, shingleN = 3, threshold = 0.15)
      val clp = graft.operators.PlanCache.persist(cl)
      val sizes = clp.groupBy("cluster_id")
        .agg(count(lit(1)).as("csize"))
      val base = docs.select("doc_id")
        .join(clp, Seq("doc_id"), "left")
        .join(broadcast(sizes), Seq("cluster_id"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"),
          coalesce(col("csize"), lit(1L)).as("csize"))
        .withColumn("__uh", md5(col("doc_id").cast("string")))
      val u = (graft.functions.TextFunctions.hexSpanVal(col("__uh"), 0, 13)
        + 1) / 4503599627370497.0
      base.select(col("doc_id"), col("cluster_id"), col("csize"),
          round(-log(u) * col("csize"), 9).as("draw_key"))
        .orderBy(col("draw_key"), col("doc_id"))
        .limit(DedupSampleN)
    })

  val all: Seq[Q] = Seq(q311_boilerplate, q312_jw_entity_match,
    q319_langid_eval, q333_filter_disparity, q336_topk_churn,
    q340_cdc_chunking, q345_ppl_filter_plan, q353_dedup_aware_sample)
}
