package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Round-9 text additions: interpolated Kneser–Ney bigram scoring. */
object TextOps9 {

  private val KnD = 0.75 // absolute discount

  /** Interpolated Kneser–Ney bigram language model, scored per source —
    * the estimator that actually ships in n-gram LMs, where q152's
    * add-one smoothing is the didactic baseline: probability mass is
    * moved by ABSOLUTE DISCOUNTING (max(c−d,0)/c(v)) and backed off to
    * the CONTINUATION unigram (how many distinct contexts a word
    * follows, not how often it occurs — the "San Francisco" correction).
    * All model tables are exact-count aggs off ONE bigram hash agg:
    * c(v,w); per-context totals and fan-out N1+(v·) (one groupBy over
    * the bigram-TYPE table, so fan-out is a count, not a distinct);
    * continuation counts N1+(·w) likewise; the global type count is a
    * 1-row broadcast. p_KN is scalar arithmetic on those counts, −ln
    * rounds at 8 (the q152 convention), per-doc means are decimal-exact,
    * and the per-source roll-up averages the round-6 per-doc scores.
    * Scale shape = q152's: the score table joins the bigram stream on
    * the bigram key (no forced broadcast — a natural corpus's bigram
    * table grows toward |V|²). */
  val q284_kn_bigram = Q(
    "q284_kn_bigram",
    Some(s"""WITH toks AS (
            |  SELECT doc_id, source, string_split(text, ' ') AS ts
            |  FROM documents),
            |bg AS (
            |  SELECT doc_id, source, unnest(list_transform(
            |    range(1, len(ts)), i -> ts[i] || ' ' || ts[i+1])) AS big
            |  FROM toks WHERE len(ts) >= 2),
            |bgc AS (
            |  SELECT big, CAST(count(*) AS BIGINT) AS fb
            |  FROM bg GROUP BY big),
            |ctx AS (
            |  SELECT string_split(big, ' ')[1] AS w1,
            |    CAST(sum(fb) AS BIGINT) AS fc,
            |    CAST(count(*) AS BIGINT) AS n1fwd
            |  FROM bgc GROUP BY string_split(big, ' ')[1]),
            |cont AS (
            |  SELECT string_split(big, ' ')[2] AS w2,
            |    CAST(count(*) AS BIGINT) AS n1bwd
            |  FROM bgc GROUP BY string_split(big, ' ')[2]),
            |btot AS (SELECT CAST(count(*) AS BIGINT) AS bt FROM bgc),
            |scores AS (
            |  SELECT big, round(-ln(
            |    greatest(fb - $KnD, 0.0) / fc
            |    + ($KnD * n1fwd / fc) * (CAST(n1bwd AS DOUBLE) / bt)), 8)
            |    AS nlp
            |  FROM bgc
            |  JOIN ctx ON string_split(bgc.big, ' ')[1] = ctx.w1
            |  JOIN cont ON string_split(bgc.big, ' ')[2] = cont.w2
            |  CROSS JOIN btot),
            |docs AS (
            |  SELECT doc_id, source,
            |    round(CAST(sum(CAST(nlp AS DECIMAL(20,8))) AS DOUBLE)
            |      / count(*), 6) AS doc_nlp
            |  FROM bg JOIN scores ON bg.big = scores.big
            |  GROUP BY doc_id, source)
            |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
            |  round(CAST(sum(CAST(doc_nlp AS DECIMAL(20,6))) AS DOUBLE)
            |    / count(*), 6) AS mean_kn_nlp
            |FROM docs GROUP BY source
            |ORDER BY source""".stripMargin),
    (s, d) => {
      val withTs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), split(col("text"), " ").as("ts"))
      val bg = withTs.filter(size(col("ts")) >= 2)
        .select(col("doc_id"), col("source"), explode(
          graft.functions.TextFunctions.shingles(col("ts"), 2))
          .as("big"))
      val bgc = graft.operators.PlanCache.persist(
        bg.groupBy("big").agg(count(lit(1)).as("fb")))
      val ctx = bgc.groupBy(split(col("big"), " ")(0).as("w1"))
        .agg(sum(col("fb")).as("fc"), count(lit(1)).as("n1fwd"))
      val cont = bgc.groupBy(split(col("big"), " ")(1).as("w2"))
        .agg(count(lit(1)).as("n1bwd"))
      val btot = bgc.agg(count(lit(1)).as("bt"))
      val pkn = greatest(col("fb") - KnD, lit(0.0)) / col("fc") +
        (lit(KnD) * col("n1fwd") / col("fc")) *
          (col("n1bwd").cast("double") / col("bt"))
      val scores = bgc
        .join(ctx, split(col("big"), " ")(0) === col("w1"))
        .join(cont, split(col("big"), " ")(1) === col("w2"))
        .crossJoin(broadcast(btot))
        .select(col("big"), round(-log(pkn), 8).as("nlp"))
      // no broadcast hint on the bigram-keyed score join (q152's note)
      val docs = bg.join(scores, "big")
        .groupBy("doc_id", "source")
        .agg(round(sum(col("nlp").cast("decimal(20,8)")).cast("double")
          / count(lit(1)), 6).as("doc_nlp"))
      docs.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          round(sum(col("doc_nlp").cast("decimal(20,6)")).cast("double")
            / count(lit(1)), 6).as("mean_kn_nlp"))
        .orderBy("source")
    })

  /** Near-duplicate EVIDENCE report — the explainability layer a dedup
    * sign-off needs on top of q35/q36's pair lists: for each probe-set
    * pair above the threshold, the exact Jaccard AND the first three
    * shared shingles as human-readable proof (sorted order, joined to
    * one string so the report is flat). Spark's array_intersect and the
    * oracle's list_filter(contains) both preserve the LEFT (sorted)
    * array's order over distinct elements, so the evidence string is
    * engine-identical. Pair volume is probe-bounded (the q35 device);
    * in production the pair list comes from the banded q36 operator and
    * this report joins it — evidence extraction stays pair-bounded. */
  val q299_dup_evidence = Q(
    "q299_dup_evidence",
    Some("""WITH sh AS (
           |  SELECT doc_id, list_sort(list_distinct(list_transform(
           |    generate_series(1, greatest(len(string_split(text,' ')) - 2, 0)),
           |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
           |         || ' ' || string_split(text,' ')[i+2]))) AS sset
           |  FROM documents WHERE doc_id < 100),
           |p AS (
           |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           |    len(list_filter(a.sset, x -> list_contains(b.sset, x)))
           |      AS n_shared,
           |    len(a.sset) AS na, len(b.sset) AS nb,
           |    array_to_string(list_filter(a.sset,
           |      x -> list_contains(b.sset, x))[1:3], '|') AS evidence
           |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
           |SELECT doc_a, doc_b, CAST(n_shared AS BIGINT) AS n_shared,
           |  round(CAST(n_shared AS DOUBLE) / (na + nb - n_shared), 6)
           |    AS jaccard, evidence
           |FROM p
           |WHERE CAST(n_shared AS DOUBLE) / (na + nb - n_shared) >= 0.02
           |ORDER BY doc_a, doc_b""".stripMargin),
    (s, d) => {
      import graft.functions.TextFunctions.{shingles, tokens}
      val sh = Tables.documents(s, d)
        .filter(col("doc_id") < 100)
        .select(col("doc_id"),
          array_sort(graft.functions.TextFunctions.shingleSet(tokens(col("text"))))
            .as("sset"))
      val a = sh.select(col("doc_id").as("doc_a"), col("sset").as("sa"))
      val b = sh.select(col("doc_id").as("doc_b"), col("sset").as("sb"))
      val shared = array_intersect(col("sa"), col("sb"))
      val nShared = size(shared)
      val jac = nShared.cast("double") /
        (size(col("sa")) + size(col("sb")) - nShared)
      a.join(b, col("doc_a") < col("doc_b"))
        .filter(jac >= 0.02)
        .select(col("doc_a"), col("doc_b"),
          nShared.cast("long").as("n_shared"),
          round(jac, 6).as("jaccard"),
          concat_ws("|", slice(shared, 1, 3)).as("evidence"))
        .orderBy("doc_a", "doc_b")
    })

  val all: Seq[Q] = Seq(q284_kn_bigram, q299_dup_evidence)
}
