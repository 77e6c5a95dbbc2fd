package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Round-10 text additions: graph-based keyword extraction. */
object TextOps12 {

  private val TrIters = 3
  private val TrDamping = 0.85
  private val TrTopK = 20
  private val TrWindow = 2 // co-occurrence distance 1..2

  /** TextRank keyword extraction (Mihalcea & Tarau 2004): tokens
    * co-occurring within distance ≤ 2 form a weighted undirected graph
    * (weight = co-occurrence count, self-loops dropped), scored by
    * weighted PageRank — TR(v) = (1−d) + d·Σ w_uv/W_u·TR(u) — with
    * TR₀ = 1; top-20 words by round-6 score. Complements q134 (PMI
    * scores PAIRS by pointwise surprise; TextRank scores WORDS by graph
    * centrality) and q117 (unweighted, per-out-degree mass split).
    *
    * Determinism discipline = q117's: each contribution is
    * round(·, 12) → DECIMAL(28,12) sum → double, so partial-agg order
    * can't move a bit on either engine. Per iteration: one edges⋈ranks
    * join + one dst-keyed agg — constant shuffle count, term-keyed
    * throughout; the token explode is scan-side. Edges+wdeg persist
    * once (the q315 lesson: every iteration re-reads them at two join
    * sites). */
  val q383_textrank = Q(
    "q383_textrank", {
      val d = "CAST(0.85 AS DOUBLE)"
      def iter(prev: String, out: String) =
        s"""c$out AS (
           |  SELECT e.dst,
           |    CAST(sum(CAST(round(p.tr * e.w / e.wd, 12)
           |      AS DECIMAL(28,12))) AS DOUBLE) AS s
           |  FROM ew e JOIN p$prev p ON p.word = e.src
           |  GROUP BY e.dst),
           |p$out AS (
           |  SELECT n.word,
           |    (CAST(1 AS DOUBLE) - $d) + $d * coalesce(c.s, CAST(0 AS DOUBLE)) AS tr
           |  FROM n LEFT JOIN c$out c ON c.dst = n.word)""".stripMargin
      Some(s"""WITH toks AS (
              |  SELECT string_split(text, ' ') AS ts FROM documents),
              |pairs AS (
              |  SELECT CASE WHEN p.a < p.b THEN p.a ELSE p.b END AS w1,
              |         CASE WHEN p.a < p.b THEN p.b ELSE p.a END AS w2
              |  FROM (
              |    SELECT unnest(flatten(list_transform(range(1, len(ts)),
              |      i -> list_transform(
              |             range(i + 1, least(i + $TrWindow, len(ts)) + 1),
              |             j -> {'a': ts[i], 'b': ts[j]})))) AS p
              |    FROM toks) t
              |  WHERE p.a <> p.b),
              |und AS (
              |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS w
              |  FROM pairs GROUP BY 1, 2),
              |e AS (
              |  SELECT w1 AS src, w2 AS dst, w FROM und
              |  UNION ALL SELECT w2, w1, w FROM und),
              |wdeg AS (SELECT src, CAST(sum(w) AS BIGINT) AS wd
              |         FROM e GROUP BY src),
              |ew AS (SELECT e.src, e.dst, e.w, dg.wd
              |       FROM e JOIN wdeg dg ON dg.src = e.src),
              |n AS (SELECT DISTINCT src AS word FROM e),
              |p0 AS (SELECT word, CAST(1 AS DOUBLE) AS tr FROM n),
              |${iter("0", "1")},
              |${iter("1", "2")},
              |${iter("2", "3")}
              |SELECT word, round(tr, 6) AS score
              |FROM p3
              |ORDER BY score DESC, word
              |LIMIT $TrTopK""".stripMargin)
    },
    (s, d) => {
      val toks = Tables.documents(s, d)
        .select(split(col("text"), " ").as("ts"))
      val pairs = toks
        .select(explode(expr(
          s"flatten(transform(sequence(1, size(ts) - 1), i -> " +
            s"transform(sequence(i + 1, least(i + $TrWindow, size(ts))), " +
            "j -> struct(element_at(ts, i) AS a, element_at(ts, j) AS b))))"))
          .as("p"))
        .filter(col("p.a") =!= col("p.b"))
        .select(least(col("p.a"), col("p.b")).as("w1"),
          greatest(col("p.a"), col("p.b")).as("w2"))
      val und = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("w"))
      val e = und.select(col("w1").as("src"), col("w2").as("dst"), col("w"))
        .unionByName(und.select(col("w2").as("src"), col("w1").as("dst"),
          col("w")))
      val wdeg = e.groupBy("src").agg(sum("w").cast("long").as("wd"))
      val ew = graft.operators.PlanCache.persist(e.join(wdeg, "src"))
      val nodes = graft.operators.PlanCache.persist(
        ew.select(col("src").as("word")).distinct())
      var tr = nodes.withColumn("tr", lit(1.0))
      for (_ <- 0 until TrIters) {
        val sums = ew.join(tr, ew("src") === tr("word"))
          .select(col("dst"),
            round(col("tr") * col("w") / col("wd"), 12)
              .cast("decimal(28,12)").as("c"))
          .groupBy("dst").agg(sum("c").cast("double").as("s"))
        tr = nodes.join(sums, nodes("word") === sums("dst"), "left")
          .select(col("word"),
            (lit(1.0 - TrDamping) +
              lit(TrDamping) * coalesce(col("s"), lit(0.0))).as("tr"))
      }
      tr.select(col("word"), round(col("tr"), 6).as("score"))
        .orderBy(col("score").desc, col("word"))
        .limit(TrTopK)
    })

  private val GtMaxR = 10

  /** Good–Turing smoothing (the 1953 estimator behind Katz backoff and
    * every held-out vocabulary-mass argument): from the frequency-of-
    * frequencies table S(r), the smoothed count of an r-times-seen term
    * is rstar = (r+1)·S(r+1)/S(r), and the leftover mass S(1)/N is what
    * a language model must reserve for UNSEEN vocabulary. Output rows
    * r = 1..10: S(r), rstar, the smoothed probability mass S(r)·rstar/N
    * next to the maximum-likelihood mass S(r)·r/N it deflates (rstar NULL
    * where S(r+1) = 0 — simple GT is honest about needing the
    * smoothed-S regression beyond that point). Terms are BIGRAMS: the
    * unigram vocabulary here is 31 words with min count 26 (no tail at
    * all — GT would emit zero rows); bigrams give a 900+-term Zipf tail
    * with real hapaxes, which is also the n-gram grain Katz backoff
    * actually smooths.
    *
    * Scale shape: one corpus explode→term agg, a second agg to the
    * bounded count-of-counts grid; the r+1 lookup is a grid self-join. */
  val q398_good_turing = Q(
    "q398_good_turing",
    Some(s"""WITH tc AS (
            |  SELECT w, CAST(count(*) AS BIGINT) AS r
            |  FROM (
            |    SELECT unnest(list_transform(range(1, len(ts)),
            |      i -> ts[i] || ' ' || ts[i + 1])) AS w
            |    FROM (SELECT string_split(text, ' ') AS ts
            |          FROM documents) s) t
            |  GROUP BY w),
            |ff AS (
            |  SELECT r, CAST(count(*) AS BIGINT) AS s
            |  FROM tc GROUP BY r),
            |n AS (SELECT CAST(sum(r * s) AS BIGINT) AS n FROM ff)
            |SELECT f.r, f.s AS n_terms,
            |  round((f.r + 1) * CAST(f2.s AS DOUBLE) / f.s, 6) AS r_star,
            |  round(f.s * ((f.r + 1) * CAST(f2.s AS DOUBLE) / f.s) / n.n, 6)
            |    AS gt_mass,
            |  round(CAST(f.s * f.r AS DOUBLE) / n.n, 6) AS ml_mass
            |FROM ff f
            |LEFT JOIN ff f2 ON f2.r = f.r + 1
            |CROSS JOIN n
            |WHERE f.r <= $GtMaxR
            |ORDER BY f.r""".stripMargin),
    (s, d) => {
      val tc = Tables.documents(s, d)
        .select(split(col("text"), " ").as("ts"))
        .select(explode(expr(
          "CASE WHEN size(ts) >= 2 THEN transform(sequence(1, size(ts) - 1)," +
            " i -> concat(element_at(ts, i), ' ', element_at(ts, i + 1)))" +
            " ELSE array() END")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("r"))
      val ff = graft.operators.PlanCache.persist(
        tc.groupBy("r").agg(count(lit(1)).as("s")))
      val n = ff.agg(sum(col("r") * col("s")).cast("long").as("n"))
      ff.join(ff.toDF("r2", "s2"), col("r2") === col("r") + 1, "left")
        .crossJoin(broadcast(n))
        .filter(col("r") <= GtMaxR)
        .select(col("r"), col("s").as("n_terms"),
          round((col("r") + 1) * col("s2").cast("double") / col("s"), 6)
            .as("r_star"),
          round(col("s") * ((col("r") + 1) * col("s2").cast("double")
            / col("s")) / col("n"), 6).as("gt_mass"),
          round((col("s") * col("r")).cast("double") / col("n"), 6)
            .as("ml_mass"))
        .orderBy("r")
    })

  private val RakeTopK = 15

  /** RAKE keyphrase extraction (Rapid Automatic Keyword Extraction):
    * candidate phrases are the maximal stopword-free token runs inside
    * each document; each word scores degree/frequency where degree
    * sums the lengths of every phrase the word appears in; a phrase
    * scores the sum of its words' scores. The non-graph classic next
    * to q383's TextRank — RAKE rewards words that live in LONG
    * phrases, TextRank rewards words with central co-occurrence.
    * Top-15 phrases by round-6 score (ties → phrase text).
    *
    * Scale shape: phrase assembly is gaps-and-islands over (doc_id,
    * token position) — windows partition by doc, bounded by document
    * length, never corpus-wide; word stats and phrase scores are
    * term-keyed aggs + one broadcast word-score join. */
  val q403_rake_keywords = Q(
    "q403_rake_keywords",
    Some(s"""WITH tok0 AS (
            |  SELECT doc_id, unnest(generate_series(1, len(ts))) AS pos, ts
            |  FROM (SELECT doc_id, string_split(text, ' ') AS ts
            |        FROM documents) d),
            |tok AS (
            |  SELECT doc_id, pos, ts[pos] AS w,
            |    ts[pos] IN ('the', 'and', 'of', 'to', 'a') AS stop
            |  FROM tok0),
            |isl AS (
            |  SELECT doc_id, pos, w,
            |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
            |      AS grp
            |  FROM tok WHERE NOT stop),
            |phr AS (
            |  SELECT doc_id, grp,
            |    string_agg(w, ' ' ORDER BY pos) AS phrase,
            |    CAST(count(*) AS BIGINT) AS plen
            |  FROM isl GROUP BY doc_id, grp),
            |wstat AS (
            |  SELECT i.w,
            |    CAST(count(*) AS BIGINT) AS freq,
            |    CAST(sum(p.plen) AS BIGINT) AS deg
            |  FROM isl i JOIN phr p
            |    ON p.doc_id = i.doc_id AND p.grp = i.grp
            |  GROUP BY i.w),
            |pscore AS (
            |  SELECT p.phrase, p.plen,
            |    round(sum(CAST(ws.deg AS DOUBLE) / ws.freq), 6) AS score
            |  FROM phr p JOIN isl i
            |    ON i.doc_id = p.doc_id AND i.grp = p.grp
            |  JOIN wstat ws ON ws.w = i.w
            |  GROUP BY p.doc_id, p.grp, p.phrase, p.plen)
            |SELECT phrase, CAST(max(plen) AS BIGINT) AS n_words,
            |  max(score) AS score
            |FROM pscore
            |GROUP BY phrase
            |ORDER BY score DESC, phrase
            |LIMIT $RakeTopK""".stripMargin),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val tok = Tables.documents(s, d)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("p0", "w")))
        .select(col("doc_id"), (col("p0") + 1).as("pos"), col("w"),
          col("w").isin("the", "and", "of", "to", "a").as("stop"))
      val isl = graft.operators.PlanCache.persist(
        tok.filter(!col("stop"))
          .withColumn("grp", col("pos") - row_number().over(
            Window.partitionBy("doc_id").orderBy("pos"))))
      val phr = graft.operators.PlanCache.persist(
        isl.groupBy("doc_id", "grp")
          .agg(array_join(transform(array_sort(collect_list(
              struct(col("pos"), col("w")))), p => p("w")), " ")
              .as("phrase"),
            count(lit(1)).as("plen")))
      val wstat = isl.join(phr, Seq("doc_id", "grp"))
        .groupBy("w")
        .agg(count(lit(1)).as("freq"), sum("plen").cast("long").as("deg"))
      val pscore = phr.join(isl, Seq("doc_id", "grp"))
        .join(wstat, "w")
        .groupBy("doc_id", "grp", "phrase", "plen")
        .agg(round(sum(col("deg").cast("double") / col("freq")), 6)
          .as("score"))
      pscore.groupBy("phrase")
        .agg(max("plen").cast("long").as("n_words"), max("score").as("score"))
        .orderBy(col("score").desc, col("phrase"))
        .limit(RakeTopK)
    })

  val all: Seq[Q] = Seq(q383_textrank, q398_good_turing, q403_rake_keywords)
}
