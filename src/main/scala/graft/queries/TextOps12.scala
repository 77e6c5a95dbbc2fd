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
      // spread the window-pair explode head (~4M pair rows from the
      // corpus would otherwise generate + partially aggregate on one
      // core off a one-file scan; scale-gated no-op on real inputs)
      val toks = graft.operators.Spread.byKey(Tables.documents(s, d), "doc_id")
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
        .select(explode(
          graft.functions.TextFunctions.shingles(col("ts"), 2)).as("w"))
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

  private val Chi2MinDf = 5
  private val Chi2TopK = 20

  /** χ² feature selection — the standard first pass of every text
    * classifier pipeline: score each BIGRAM's association with the
    * lang='en' label from its document-presence 2×2 contingency table,
    * χ² = N(ad−bc)²/((a+b)(c+d)(a+c)(b+d)), and keep the most
    * discriminative features (df ≥ 5 to kill hapax flukes). Where q205
    * runs ONE χ² test, this sweeps the whole vocabulary — the
    * feature-ranking use, not the hypothesis-testing one. All cell
    * counts are exact integers; the statistic divides once per term.
    *
    * Scale shape: explode → distinct(doc, term) → term-keyed agg; the
    * label totals ride in as one broadcast row. */
  val q421_chi2_features = Q(
    "q421_chi2_features",
    Some(s"""WITH d AS (
            |  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
            |    string_split(text, ' ') AS ts
            |  FROM documents),
            |tot AS (
            |  SELECT CAST(count(*) AS BIGINT) AS n,
            |    CAST(sum(y) AS BIGINT) AS n_en
            |  FROM d),
            |pres AS (
            |  SELECT DISTINCT doc_id, y, w
            |  FROM (
            |    SELECT doc_id, y, unnest(list_transform(range(1, len(ts)),
            |      i -> ts[i] || ' ' || ts[i + 1])) AS w
            |    FROM d) t),
            |cell AS (
            |  SELECT w, CAST(sum(y) AS BIGINT) AS a,
            |    CAST(sum(1 - y) AS BIGINT) AS b
            |  FROM pres GROUP BY w
            |  HAVING count(*) >= $Chi2MinDf),
            |x2 AS (
            |  SELECT w, a, b,
            |    round(CAST(t.n AS DOUBLE)
            |      * (CAST(a AS DOUBLE) * (t.n - t.n_en - b)
            |         - CAST(b AS DOUBLE) * (t.n_en - a))
            |      * (CAST(a AS DOUBLE) * (t.n - t.n_en - b)
            |         - CAST(b AS DOUBLE) * (t.n_en - a))
            |      / (CAST(a + b AS DOUBLE)
            |         * (t.n - a - b) * t.n_en * (t.n - t.n_en)), 6) AS chi2
            |  FROM cell CROSS JOIN tot t)
            |SELECT w AS bigram, a AS df_en, b AS df_other, chi2
            |FROM x2
            |ORDER BY chi2 DESC, bigram
            |LIMIT $Chi2TopK""".stripMargin),
    (s, d) => {
      val dd = Tables.documents(s, d).select(col("doc_id"),
        when(col("lang") === "en", 1).otherwise(0).as("y"),
        split(col("text"), " ").as("ts"))
      val tot = dd.agg(count(lit(1)).as("n"), sum("y").cast("long").as("n_en"))
      val pres = dd
        .select(col("doc_id"), col("y"), explode(
          graft.functions.TextFunctions.shingles(col("ts"), 2)).as("w"))
        .distinct()
      val cell = pres.groupBy("w")
        .agg(sum("y").cast("long").as("a"),
          sum(lit(1) - col("y")).cast("long").as("b"),
          count(lit(1)).as("df"))
        .filter(col("df") >= Chi2MinDf)
      def dbl(c: org.apache.spark.sql.Column) = c.cast("double")
      cell.crossJoin(broadcast(tot))
        .select(col("w").as("bigram"), col("a").as("df_en"),
          col("b").as("df_other"),
          round(dbl(col("n"))
            * (dbl(col("a")) * (col("n") - col("n_en") - col("b"))
              - dbl(col("b")) * (col("n_en") - col("a")))
            * (dbl(col("a")) * (col("n") - col("n_en") - col("b"))
              - dbl(col("b")) * (col("n_en") - col("a")))
            / (dbl(col("a") + col("b"))
              * (col("n") - col("a") - col("b")) * col("n_en")
              * (col("n") - col("n_en"))), 6).as("chi2"))
        .orderBy(col("chi2").desc, col("bigram"))
        .limit(Chi2TopK)
    })

  /** Jelinek–Mercer interpolation sweep — the smoothing family q284's
    * Kneser–Ney competes with: held-out (every 5th doc) average
    * negative log-likelihood of λ·p(w|h) + (1−λ)·p_add1(w) for
    * λ ∈ {0.2, 0.4, 0.6, 0.8}, trained on the rest. The add-one
    * unigram floor absorbs OOV tokens so every held-out bigram has
    * positive mass. Determinism: each token's ln rides
    * round(·,12) → DECIMAL(28,12) before the sum (agg order differs
    * per engine), and the output is avg NLL — no exp(), so no
    * perplexity ulp to chase.
    *
    * Scale shape: two term-keyed count tables from the train split,
    * one broadcast-joined pass over held-out bigrams, a 4-row λ grid. */
  val q422_jm_smoothing = Q(
    "q422_jm_smoothing",
    Some("""WITH d AS (
           |  SELECT doc_id, string_split(text, ' ') AS ts,
           |    doc_id % 5 = 4 AS held
           |  FROM documents),
           |uni AS (
           |  SELECT w, CAST(count(*) AS BIGINT) AS c
           |  FROM (SELECT unnest(ts) AS w FROM d WHERE NOT held) t
           |  GROUP BY w),
           |un AS (SELECT CAST(sum(c) AS BIGINT) AS n,
           |       CAST(count(*) AS BIGINT) AS v FROM uni),
           |big AS (
           |  SELECT p['h'] AS h, p['w'] AS w, CAST(count(*) AS BIGINT) AS c
           |  FROM (
           |    SELECT unnest(list_transform(range(1, len(ts)),
           |      i -> {'h': ts[i], 'w': ts[i+1]})) AS p
           |    FROM d WHERE NOT held) t
           |  GROUP BY 1, 2),
           |hctx AS (SELECT h, CAST(sum(c) AS BIGINT) AS ch FROM big GROUP BY h),
           |ho AS (
           |  SELECT p['h'] AS h, p['w'] AS w
           |  FROM (
           |    SELECT unnest(list_transform(range(1, len(ts)),
           |      i -> {'h': ts[i], 'w': ts[i+1]})) AS p
           |    FROM d WHERE held) t),
           |scored AS (
           |  SELECT lam.l AS lambda_,
           |    CAST(round(ln(
           |      lam.l * coalesce(CAST(b.c AS DOUBLE) / hc.ch, 0)
           |      + (1 - lam.l) * (coalesce(u.c, 0) + 1.0) / (un.n + un.v + 1))
           |      , 12) AS DECIMAL(28,12)) AS nll
           |  FROM ho
           |  CROSS JOIN (SELECT unnest([0.2, 0.4, 0.6, 0.8]) AS l) lam
           |  LEFT JOIN big b ON b.h = ho.h AND b.w = ho.w
           |  LEFT JOIN hctx hc ON hc.h = ho.h
           |  LEFT JOIN uni u ON u.w = ho.w
           |  CROSS JOIN un)
           |SELECT lambda_, CAST(count(*) AS BIGINT) AS n_tokens,
           |  round(-CAST(sum(nll) AS DOUBLE) / count(*), 8) AS avg_nll
           |FROM scored GROUP BY lambda_
           |ORDER BY lambda_""".stripMargin),
    (s, d) => {
      val dd = Tables.documents(s, d).select(col("doc_id"),
        split(col("text"), " ").as("ts"),
        (col("doc_id") % 5 === 4).as("held"))
      def bigrams(f: org.apache.spark.sql.DataFrame) = f
        .select(explode(expr(
          "CASE WHEN size(ts) >= 2 THEN transform(sequence(1, size(ts) - 1)," +
            " i -> struct(element_at(ts, i) AS h, element_at(ts, i + 1) AS w))" +
            " ELSE array() END")).as("p"))
        .select(col("p.h").as("h"), col("p.w").as("w"))
      val train = dd.filter(!col("held"))
      val uni = graft.operators.PlanCache.persist(
        train.select(explode(col("ts")).as("w"))
          .groupBy("w").agg(count(lit(1)).as("c")))
      val un = uni.agg(sum("c").cast("long").as("n"),
        count(lit(1)).as("v"))
      val big = graft.operators.PlanCache.persist(
        bigrams(train).groupBy("h", "w").agg(count(lit(1)).as("c")))
      val hctx = big.groupBy("h").agg(sum("c").cast("long").as("ch"))
      val ho = bigrams(dd.filter(col("held")))
      val lam = s.createDataFrame(Seq(Tuple1(0.2), Tuple1(0.4),
        Tuple1(0.6), Tuple1(0.8))).toDF("l")
      ho.crossJoin(broadcast(lam))
        .join(big.toDF("h", "w", "bc"), Seq("h", "w"), "left")
        .join(hctx, Seq("h"), "left")
        .join(broadcast(uni.toDF("w", "uc")), Seq("w"), "left")
        .crossJoin(broadcast(un))
        .select(col("l").as("lambda_"),
          round(log(
            col("l") * coalesce(col("bc").cast("double") / col("ch"), lit(0.0))
              + (lit(1) - col("l")) * (coalesce(col("uc"), lit(0L)) + 1.0)
                / (col("n") + col("v") + 1)), 12)
            .cast("decimal(28,12)").as("nll"))
        .groupBy("lambda_")
        .agg(count(lit(1)).as("n_tokens"),
          round(-sum("nll").cast("double") / count(lit(1)), 8).as("avg_nll"))
        .orderBy("lambda_")
    })

  /** Rocchio / nearest-centroid text classification — the sparse
    * tf-idf pipeline next to q368's multinomial NB: per-language
    * centroids of train-split bigram tf-idf vectors, held-out docs
    * assigned to the cosine-nearest centroid, full confusion matrix.
    * The whole computation is SPARSE and term-keyed: dot products are
    * joins on the bigram, never dense vectors. Determinism: every
    * pointwise value (tf·idf, w², x·w) rounds before entering a
    * DECIMAL(28,12) sum, so no double aggregation order exists on
    * either engine; scores round to 10 before the argmax (tie → lang
    * ascending). */
  val q425_rocchio_classifier = Q(
    "q425_rocchio_classifier",
    Some("""WITH d AS (
           |  SELECT doc_id, lang, doc_id % 5 = 4 AS held,
           |    string_split(text, ' ') AS ts
           |  FROM documents),
           |tf AS (
           |  SELECT doc_id, lang, held, w, CAST(count(*) AS BIGINT) AS tf
           |  FROM (
           |    SELECT doc_id, lang, held,
           |      unnest(list_transform(range(1, len(ts)),
           |        i -> ts[i] || ' ' || ts[i + 1])) AS w
           |    FROM d) t
           |  GROUP BY 1, 2, 3, 4),
           |ntr AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d WHERE NOT held),
           |idf AS (
           |  SELECT w, ln(CAST(ntr.n AS DOUBLE)
           |    / count(DISTINCT doc_id)) AS idf
           |  FROM tf CROSS JOIN ntr WHERE NOT held GROUP BY w, ntr.n),
           |xt AS (
           |  SELECT tf.doc_id, tf.lang, tf.held, tf.w,
           |    round(tf.tf * i.idf, 8) AS x
           |  FROM tf JOIN idf i ON i.w = tf.w),
           |nl AS (SELECT lang, CAST(count(*) AS BIGINT) AS nd
           |       FROM d WHERE NOT held GROUP BY lang),
           |cent AS (
           |  SELECT x.lang, x.w,
           |    round(CAST(sum(CAST(x.x AS DECIMAL(28,12))) AS DOUBLE)
           |      / nl.nd, 8) AS cw
           |  FROM xt x JOIN nl ON nl.lang = x.lang
           |  WHERE NOT x.held GROUP BY x.lang, x.w, nl.nd),
           |cn AS (
           |  SELECT lang, sqrt(CAST(sum(CAST(round(cw * cw, 12)
           |    AS DECIMAL(28,12))) AS DOUBLE)) AS norm
           |  FROM cent GROUP BY lang),
           |dn AS (
           |  SELECT doc_id, sqrt(CAST(sum(CAST(round(x * x, 12)
           |    AS DECIMAL(28,12))) AS DOUBLE)) AS norm
           |  FROM xt WHERE held GROUP BY doc_id),
           |dots AS (
           |  SELECT x.doc_id, x.lang AS lang_true, c.lang AS cand,
           |    CAST(sum(CAST(round(x.x * c.cw, 12) AS DECIMAL(28,12)))
           |      AS DOUBLE) AS dot
           |  FROM xt x JOIN cent c ON c.w = x.w
           |  WHERE x.held GROUP BY 1, 2, 3),
           |scored AS (
           |  SELECT s.doc_id, s.lang_true, s.cand,
           |    round(s.dot / (dn.norm * cn.norm), 10) AS cos
           |  FROM dots s JOIN dn ON dn.doc_id = s.doc_id
           |  JOIN cn ON cn.lang = s.cand),
           |pred AS (
           |  SELECT doc_id, lang_true, cand AS lang_pred FROM (
           |    SELECT *, row_number() OVER (PARTITION BY doc_id
           |      ORDER BY cos DESC, cand) AS r
           |    FROM scored) t WHERE r = 1)
           |SELECT lang_true, lang_pred, CAST(count(*) AS BIGINT) AS n
           |FROM pred GROUP BY 1, 2
           |ORDER BY lang_true, lang_pred""".stripMargin),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      // spread before the bigram explode (single-file scan would run the
      // tf map side on one core; scale-gated no-op on real inputs — r16)
      val dd = graft.operators.Spread.byKey(Tables.documents(s, d), "doc_id")
        .select(col("doc_id"), col("lang"),
          (col("doc_id") % 5 === 4).as("held"),
          split(col("text"), " ").as("ts"))
      val tf = graft.operators.PlanCache.persist(dd
        .select(col("doc_id"), col("lang"), col("held"), explode(
          graft.functions.TextFunctions.shingles(col("ts"), 2)).as("w"))
        .groupBy("doc_id", "lang", "held", "w")
        .agg(count(lit(1)).as("tf")))
      val ntr = dd.filter(!col("held")).agg(count(lit(1)).as("n"))
      // tf is (doc_id, w)-unique by construction (grouped on both), so
      // document frequency is a plain count — count(DISTINCT) here would
      // plan a second full shuffle of the term table through Expand
      val idf = tf.filter(!col("held")).crossJoin(broadcast(ntr))
        .groupBy("w", "n")
        .agg(count(lit(1)).as("df"))
        .select(col("w"),
          log(col("n").cast("double") / col("df")).as("idf"))
      val xt = graft.operators.PlanCache.persist(
        tf.join(idf, "w")
          .select(col("doc_id"), col("lang"), col("held"), col("w"),
            round(col("tf") * col("idf"), 8).as("x")))
      val nl = dd.filter(!col("held")).groupBy("lang")
        .agg(count(lit(1)).as("nd"))
      val cent = graft.operators.PlanCache.persist(
        xt.filter(!col("held")).join(broadcast(nl), "lang")
          .groupBy("lang", "w", "nd")
          .agg(sum(col("x").cast("decimal(28,12)")).cast("double").as("sx"))
          .select(col("lang"), col("w"),
            round(col("sx") / col("nd"), 8).as("cw")))
      val cn = cent.groupBy("lang")
        .agg(sqrt(sum(round(col("cw") * col("cw"), 12)
          .cast("decimal(28,12)")).cast("double")).as("cnorm"))
      val ho = xt.filter(col("held"))
      val dn = ho.groupBy("doc_id")
        .agg(sqrt(sum(round(col("x") * col("x"), 12)
          .cast("decimal(28,12)")).cast("double")).as("dnorm"))
      val dots = ho.select(col("doc_id"), col("lang").as("lang_true"),
          col("w"), col("x"))
        .join(cent.toDF("cand", "w", "cw"), "w")
        .groupBy("doc_id", "lang_true", "cand")
        .agg(sum(round(col("x") * col("cw"), 12).cast("decimal(28,12)"))
          .cast("double").as("dot"))
      val scored = dots.join(dn, "doc_id")
        .join(cn.toDF("cand", "cnorm"), "cand")
        .select(col("doc_id"), col("lang_true"), col("cand"),
          round(col("dot") / (col("dnorm") * col("cnorm")), 10).as("cos"))
      scored
        .withColumn("r", row_number().over(Window.partitionBy("doc_id")
          .orderBy(col("cos").desc, col("cand"))))
        .filter(col("r") === 1)
        .groupBy(col("lang_true"), col("cand").as("lang_pred"))
        .agg(count(lit(1)).as("n"))
        .orderBy("lang_true", "lang_pred")
    })

  val all: Seq[Q] = Seq(q383_textrank, q398_good_turing, q403_rake_keywords,
    q421_chi2_features, q422_jm_smoothing, q425_rocchio_classifier)
}
