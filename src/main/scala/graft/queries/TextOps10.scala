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

  val all: Seq[Q] = Seq(q311_boilerplate, q312_jw_entity_match,
    q319_langid_eval)
}
