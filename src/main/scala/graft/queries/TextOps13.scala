package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions

/** Round-11 text additions: term burstiness — the df-vs-cf lens on
  * vocabulary behavior.
  */
object TextOps13 {

  /** Church–Gale term BURSTINESS over the top-20 collection-frequency
    * terms: cf/df — how many times a term repeats per document that
    * contains it at all. Content words burst (a doc about "kafka" says
    * it ten times); function words spread (cf/df ≈ corpus-wide rate) —
    * the diagnostic that separates boilerplate vocabulary from topical
    * vocabulary where raw frequency (q32) and IDF alone cannot, and
    * the signal the q311 boilerplate audit's shingle view gives only
    * indirectly. IDF is carried alongside so the two axes read
    * together (bursty+rare = topical; flat+common = glue).
    *
    * Scale shape: one term-keyed hash agg (count + distinct-doc count
    * share the shuffle), a 1-row doc-count broadcast, TakeOrdered
    * top-20 — no windows, no joins beyond the broadcast. */
  val q430_term_burstiness = Q(
    "q430_term_burstiness",
    Some("""WITH tok AS (
           |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
           |  FROM documents),
           |tf AS (
           |  SELECT term, CAST(count(*) AS BIGINT) AS cf,
           |    CAST(count(DISTINCT doc_id) AS BIGINT) AS df
           |  FROM tok GROUP BY term),
           |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
           |SELECT term, cf, df,
           |  round(CAST(cf AS DOUBLE) / df, 6) AS burstiness,
           |  round(ln(CAST(n_docs AS DOUBLE) / df), 6) AS idf
           |FROM tf CROSS JOIN nd
           |ORDER BY cf DESC, term
           |LIMIT 20""".stripMargin),
    (s, d) => {
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), explode(TextFunctions.tokens(col("text")))
          .as("term"))
      val tf = tok.groupBy("term")
        .agg(count(lit(1)).as("cf"), countDistinct("doc_id").as("df"))
      val nd = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
      tf.crossJoin(broadcast(nd))
        .select(col("term"), col("cf"), col("df"),
          round(col("cf").cast("double") / col("df"), 6).as("burstiness"),
          round(log(col("n_docs").cast("double") / col("df")), 6).as("idf"))
        .orderBy(col("cf").desc, col("term"))
        .limit(20)
    })

  /** Vocabulary-size COVERAGE curve: for candidate vocab sizes
    * K ∈ {500, 1000, 2000, 4000}, the held-out OOV token rate when the
    * vocabulary is the train half's top-K terms — the "how big must
    * the tokenizer vocab be" curve read next to q159's Heaps' law and
    * q135's fixed-vocab coverage. The top-K cut is computed WITHOUT
    * ranking the vocabulary: the K-th largest train count t_K comes
    * from the count-of-counts histogram (max c with cumDesc(c) ≥ K —
    * the q193 device), the vocab is {count > t_K} (boundary
    * semantics: ties at t_K excluded, deterministic), and the OOV
    * mass is one term-keyed join of eval counts against train counts
    * plus four broadcast threshold comparisons.
    *
    * Scale shape: two term aggs (train/eval halves), a bounded
    * count-of-counts grid window, a term-keyed LEFT join, 4-row
    * threshold broadcasts. No vocab-scale rank anywhere. */
  val q440_vocab_coverage = Q(
    "q440_vocab_coverage",
    Some("""WITH tok AS (
           |  SELECT doc_id % 2 AS half,
           |    unnest(string_split(text, ' ')) AS term
           |  FROM documents),
           |tc AS (
           |  SELECT term, CAST(count(*) AS BIGINT) AS cnt
           |  FROM tok WHERE half = 0 GROUP BY term),
           |coc AS (
           |  SELECT cnt, CAST(count(*) AS BIGINT) AS k FROM tc
           |  GROUP BY cnt),
           |cd AS (
           |  SELECT cnt, k,
           |    CAST(sum(k) OVER (ORDER BY cnt DESC
           |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumdesc
           |  FROM coc),
           |ks AS (SELECT CAST(unnest([500, 1000, 2000, 4000]) AS BIGINT)
           |       AS kk),
           |tks AS (
           |  SELECT ks.kk,
           |    coalesce(max(CASE WHEN cumdesc >= ks.kk THEN cnt END), 0)
           |      AS tk
           |  FROM ks CROSS JOIN cd GROUP BY ks.kk),
           |vs AS (
           |  SELECT t.kk, t.tk,
           |    CAST(coalesce(sum(CASE WHEN coc.cnt > t.tk THEN coc.k END),
           |      0) AS BIGINT) AS vocab_size
           |  FROM tks t CROSS JOIN coc GROUP BY t.kk, t.tk),
           |et AS (
           |  SELECT e.term, CAST(count(*) AS BIGINT) AS ecnt
           |  FROM (SELECT term FROM tok WHERE half = 1) e GROUP BY e.term),
           |ej AS (
           |  SELECT et.ecnt, coalesce(tc.cnt, 0) AS traincnt
           |  FROM et LEFT JOIN tc ON tc.term = et.term),
           |oov AS (
           |  SELECT t.kk, t.tk,
           |    CAST(sum(CASE WHEN traincnt <= t.tk THEN ecnt ELSE 0 END)
           |      AS BIGINT) AS oov_tokens,
           |    CAST(sum(ecnt) AS BIGINT) AS eval_tokens
           |  FROM tks t CROSS JOIN ej GROUP BY t.kk, t.tk)
           |SELECT o.kk AS vocab_k, o.tk AS count_cut, vs.vocab_size,
           |  o.oov_tokens, o.eval_tokens,
           |  round(CAST(o.oov_tokens AS DOUBLE) / o.eval_tokens, 6)
           |    AS oov_rate
           |FROM oov o JOIN vs ON vs.kk = o.kk
           |ORDER BY vocab_k""".stripMargin),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val tok = Tables.documents(s, d)
        .select((col("doc_id") % 2).as("half"),
          explode(TextFunctions.tokens(col("text"))).as("term"))
      val tc = graft.operators.PlanCache.persist(
        tok.filter(col("half") === 0).groupBy("term")
          .agg(count(lit(1)).as("cnt")))
      val coc = graft.operators.PlanCache.persist(
        tc.groupBy("cnt").agg(count(lit(1)).as("k")))
      val wd = Window.orderBy(col("cnt").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cd = coc.select(col("cnt"), col("k"),
        sum("k").over(wd).cast("long").as("cumdesc"))
      val ks = { import s.implicits._
        Seq(500L, 1000L, 2000L, 4000L).toDF("kk") }
      val tks = ks.crossJoin(cd).groupBy("kk")
        .agg(coalesce(max(when(col("cumdesc") >= col("kk"), col("cnt"))),
          lit(0L)).as("tk"))
      val vs = broadcast(tks).crossJoin(coc).groupBy("kk", "tk")
        .agg(coalesce(sum(when(col("cnt") > col("tk"), col("k"))), lit(0L))
          .cast("long").as("vocab_size"))
      val et = tok.filter(col("half") === 1).groupBy("term")
        .agg(count(lit(1)).as("ecnt"))
      val ej = et.join(tc, Seq("term"), "left")
        .select(col("ecnt"), coalesce(col("cnt"), lit(0L)).as("traincnt"))
      val oov = ej.crossJoin(broadcast(tks)).groupBy("kk", "tk")
        .agg(sum(when(col("traincnt") <= col("tk"), col("ecnt"))
            .otherwise(0L)).cast("long").as("oov_tokens"),
          sum("ecnt").cast("long").as("eval_tokens"))
      oov.join(broadcast(vs), Seq("kk", "tk"))
        .select(col("kk").as("vocab_k"), col("tk").as("count_cut"),
          col("vocab_size"), col("oov_tokens"), col("eval_tokens"),
          round(col("oov_tokens").cast("double") / col("eval_tokens"), 6)
            .as("oov_rate"))
        .orderBy("vocab_k")
    })

  /** Weighted-Jaccard source similarity: J_w(A,B) = Σ_t min(c_At, c_Bt)
    * / Σ_t max(c_At, c_Bt) over raw term counts — the multiset overlap
    * that tells a curation pipeline which sources are near-duplicates
    * of each other AT THE DISTRIBUTION level (q360's shingle
    * containment catches copied text; this catches same-template
    * sources with different text). Σmax = totA + totB − Σmin keeps the
    * whole computation in exact BIGINTs with one final divide.
    *
    * Scale shape: the pair space is TERM-KEYED (fanout per term ≤
    * #sources, a constant), never source×source over rows; totals are
    * a 20-row broadcast; top-10 by TakeOrdered. */
  val q444_weighted_jaccard = Q(
    "q444_weighted_jaccard",
    Some("""WITH st AS (
           |  SELECT source, term, CAST(count(*) AS BIGINT) AS c
           |  FROM (SELECT source, unnest(string_split(text, ' ')) AS term
           |        FROM documents) t
           |  GROUP BY source, term),
           |tot AS (
           |  SELECT source, CAST(sum(c) AS BIGINT) AS tot FROM st
           |  GROUP BY source),
           |mins AS (
           |  SELECT a.source AS src_a, b.source AS src_b,
           |    CAST(sum(LEAST(a.c, b.c)) AS BIGINT) AS sum_min
           |  FROM st a JOIN st b
           |    ON a.term = b.term AND a.source < b.source
           |  GROUP BY a.source, b.source)
           |SELECT m.src_a, m.src_b, m.sum_min,
           |  round(CAST(m.sum_min AS DOUBLE)
           |    / (ta.tot + tb.tot - m.sum_min), 6) AS j_weighted
           |FROM mins m
           |JOIN tot ta ON ta.source = m.src_a
           |JOIN tot tb ON tb.source = m.src_b
           |ORDER BY j_weighted DESC, src_a, src_b
           |LIMIT 10""".stripMargin),
    (s, d) => {
      // spread the tokenize head (serial on a one-file scan; scale-gated)
      val st = graft.operators.PlanCache.persist(
        graft.operators.Spread.byKey(Tables.documents(s, d), "doc_id")
        .select(col("source"),
          explode(TextFunctions.tokens(col("text"))).as("term"))
        .groupBy("source", "term").agg(count(lit(1)).as("c")))
      val tot = st.groupBy("source").agg(sum("c").cast("long").as("tot"))
      val mins = st.toDF("src_a", "term", "ca")
        .join(st.toDF("src_b", "term", "cb"), "term")
        .filter(col("src_a") < col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(sum(least(col("ca"), col("cb"))).cast("long").as("sum_min"))
      mins
        .join(broadcast(tot.toDF("src_a", "tot_a")), "src_a")
        .join(broadcast(tot.toDF("src_b", "tot_b")), "src_b")
        .select(col("src_a"), col("src_b"), col("sum_min"),
          round(col("sum_min").cast("double") /
            (col("tot_a") + col("tot_b") - col("sum_min")), 6)
            .as("j_weighted"))
        .orderBy(col("j_weighted").desc, col("src_a"), col("src_b"))
        .limit(10)
    })

  val all: Seq[Q] = Seq(q430_term_burstiness, q440_vocab_coverage,
    q444_weighted_jaccard)
}
