package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions.hexSpanValSql

/** Third curation block: the feature-hashing vectorizer ("hashing trick")
  * with an inverted-index sparse cosine join.
  */
object DataOps3 {

  // 2^15 buckets: ~100-200 distinct tokens/doc keeps postings lists and
  // per-bucket fan-out tight
  private val HashDim = 32768
  private val SparseK = 3
  // probe ids are doc_id % 100 = 7 capped below this id — a FIXED batch of
  // at most 15 probes regardless of corpus size, so the broadcast probe
  // postings stay KB-sized at any scale (an uncapped % predicate selects
  // 1% of the corpus: linear growth that would eventually exceed the
  // broadcast limit). Real serving submits small fixed query batches.
  private val SparseProbeCap = 1500

  /** Hashing-trick sparse vectors + inverted-index cosine retrieval: each
    * token maps to bucket md5(tok)[0..8) mod 2^15 (engine-portable hex
    * arithmetic, no engine hash functions), term frequencies become the
    * sparse vector, and a FIXED PROBE BATCH of query documents (capped at
    * 15 ids — see SparseProbeCap) retrieves its top-k corpus neighbors
    * through the postings lists — candidates are only docs sharing a
    * bucket with a probe, dot products accumulate as exact integers
    * through one (probe, doc) hash agg, norms are exact under sqrt. This
    * is the sparse-retrieval serving shape (BM25-style inverted index,
    * here with raw tf weights): the bounded probe postings broadcast,
    * the corpus index never moves, cost is linear in postings touched.
    * The ALL-PAIRS variant of the same index is deliberately absent: with
    * a same-vocab corpus nearly every doc pair shares a bucket, so its
    * pair aggregation is Θ(N²) no matter the dimension (measured 100+ s
    * at sf0.1) — all-pairs near-dup belongs to the banded families
    * (q36/q55/q41) whose candidate volume is tunable. */
  val q110_sparse_cosine = Q(
    "q110_sparse_cosine", {
      val bucket = s"(${hexSpanValSql("h", 0, 8)} % $HashDim)"
      Some(s"""WITH t AS (
              |  SELECT doc_id, md5(unnest(string_split(text, ' '))) AS h
              |  FROM documents),
              |v AS (
              |  SELECT doc_id, $bucket AS bucket, CAST(count(*) AS BIGINT) AS tf
              |  FROM t GROUP BY doc_id, $bucket),
              |nrm AS (
              |  SELECT doc_id, sqrt(CAST(sum(tf * tf) AS DOUBLE)) AS nrm
              |  FROM v GROUP BY doc_id),
              |p AS (
              |  SELECT q.doc_id AS probe_id, c.doc_id AS doc_b,
              |    CAST(sum(q.tf * c.tf) AS BIGINT) AS dot
              |  FROM v q JOIN v c ON q.bucket = c.bucket
              |  WHERE q.doc_id % 100 = 7 AND q.doc_id < $SparseProbeCap
              |    AND c.doc_id <> q.doc_id
              |  GROUP BY 1, 2),
              |r AS (
              |  SELECT probe_id, doc_b, dot,
              |    dot / (nq.nrm * nc.nrm) AS cosine,
              |    ROW_NUMBER() OVER (PARTITION BY probe_id
              |      ORDER BY dot / (nq.nrm * nc.nrm) DESC, doc_b) AS rk
              |  FROM p
              |  JOIN nrm nq ON nq.doc_id = probe_id
              |  JOIN nrm nc ON nc.doc_id = doc_b)
              |SELECT probe_id, CAST(rk AS BIGINT) AS rk, doc_b, dot,
              |  round(cosine, 6) AS cosine
              |FROM r WHERE rk <= $SparseK
              |ORDER BY probe_id, rk""".stripMargin)
    },
    (s, d) => {
      val v = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .withColumn("h", md5(col("tok")))
        // native span walk (HexSpanVal) — this runs PER TOKEN, the
        // hottest span site in the repo after q278
        .withColumn("bucket",
          graft.functions.TextFunctions.hexSpanVal(col("h"), 0, 8)
            % HashDim)
        .groupBy("doc_id", "bucket").agg(count(lit(1)).as("tf"))
      val nrm = v.groupBy("doc_id")
        .agg(sqrt(sum(col("tf") * col("tf")).cast("double")).as("nrm"))
      val probes = v
        .filter(col("doc_id") % 100 === 7 && col("doc_id") < SparseProbeCap)
        .toDF("probe_id", "bucket", "tf_q")
      val cand = broadcast(probes)
        .join(v.toDF("doc_b", "bucket", "tf_c"), "bucket")
        .filter(col("doc_b") =!= col("probe_id"))
        .groupBy("probe_id", "doc_b")
        .agg(sum(col("tf_q") * col("tf_c")).as("dot"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("probe_id")
        .orderBy(col("cosine_raw").desc, col("doc_b"))
      cand.join(nrm.toDF("probe_id", "nrm_q"), "probe_id")
        .join(nrm.toDF("doc_b", "nrm_c"), "doc_b")
        .withColumn("cosine_raw", col("dot") / (col("nrm_q") * col("nrm_c")))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= SparseK)
        .select(col("probe_id"), col("rk"), col("doc_b"), col("dot"),
          round(col("cosine_raw"), 6).as("cosine"))
        .orderBy("probe_id", "rk")
    })

  /** Survivorship merge ("golden record"): per entity, each field takes
    * its most recent NON-NULL value across the update history — the field
    * clocks differ, so this is NOT q27's latest-row-wins: a golden record
    * can mix values from different updates. Sparse fields are simulated
    * by masking order columns; recency = (o_orderdate, o_orderkey), a
    * total order so retries/speculation cannot flip a survivor. One
    * window + one post-filter — the per-entity sort never globalizes. */
  val q115_golden_record = Q(
    "q115_golden_record",
    Some("""WITH h AS (
            |  SELECT o_custkey, o_orderdate, o_orderkey,
            |    CASE WHEN o_orderkey % 3 = 0 THEN o_orderpriority END AS prio,
            |    CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice END AS price
            |  FROM orders),
            |f AS (
            |  SELECT o_custkey,
            |    last_value(prio IGNORE NULLS) OVER w AS last_prio,
            |    last_value(price IGNORE NULLS) OVER w AS last_price,
            |    ROW_NUMBER() OVER (PARTITION BY o_custkey
            |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rev,
            |    CAST(count(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS n_updates
            |  FROM h WINDOW w AS (PARTITION BY o_custkey
            |    ORDER BY o_orderdate, o_orderkey
            |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
            |SELECT o_custkey, last_prio, last_price, n_updates
            |FROM f WHERE rev = 1
            |ORDER BY o_custkey""".stripMargin),
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val wAll = org.apache.spark.sql.expressions.Window.partitionBy("o_custkey")
      val wRev = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey")
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
          when(col("o_orderkey") % 3 === 0, col("o_orderpriority")).as("prio"),
          when(col("o_orderkey") % 2 === 0, col("o_totalprice")).as("price"))
        .withColumn("last_prio", last(col("prio"), ignoreNulls = true).over(w))
        .withColumn("last_price", last(col("price"), ignoreNulls = true).over(w))
        .withColumn("rev", row_number().over(wRev))
        .withColumn("n_updates", count(lit(1)).over(wAll).cast("long"))
        .filter(col("rev") === 1)
        .select("o_custkey", "last_prio", "last_price", "n_updates")
        .orderBy("o_custkey")
    })

  private val PipeQuota = 25
  private val MinToks = 50
  private val MaxToks = 1000

  /** The composed training-data assembly pipeline, end to end in ONE
    * oracle-checked entry: exact dedup (q34's deterministic keeper) →
    * quality gate (token-count band + Gopher repetition rule, expressed
    * in EXACT INTEGER form 5·(ng−nd) ≤ ng so no double threshold exists)
    * → content-hash split (q60's decontamination-stable buckets) →
    * per-(split, source) quota (q61/q83's replayable md5 draw) →
    * per-cell counts, token mass, and the q119 checksum of surviving
    * doc_ids. Each stage is the already-oracle-checked rule; this entry
    * proves the COMPOSITION — the thing a user actually runs — stays
    * deterministic: same keepers, same gates, same splits, same draws,
    * on any cluster at any scale. Shuffle budget: dedup agg + semi join,
    * one quota window, one final agg — everything else is scan-side. */
  val q122_curation_pipeline = Q(
    "q122_curation_pipeline", {
      val bucket = s"(${hexSpanValSql("h", 0, 6)} % 100)"
      val fp = hexSpanValSql("ch", 0, 13)
      Some(s"""WITH keep AS (
              |  SELECT doc_id, text, source,
              |    ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
              |  FROM documents),
              |toks AS (
              |  SELECT doc_id, text, source, string_split(text, ' ') AS ts
              |  FROM keep WHERE rn = 1),
              |q AS (
              |  SELECT doc_id, text, source, len(ts) AS n_toks,
              |    greatest(len(ts) - 2, 0) AS ng,
              |    len(list_distinct(list_transform(
              |      range(1, greatest(len(ts) - 1, 1)),
              |      i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))) AS nd
              |  FROM toks),
              |gated AS (
              |  SELECT doc_id, md5(text) AS h, source, n_toks FROM q
              |  WHERE n_toks BETWEEN $MinToks AND $MaxToks
              |    AND 5 * (ng - nd) <= ng),
              |sp AS (
              |  SELECT doc_id, source, n_toks,
              |    CASE WHEN $bucket < 80 THEN 'train'
              |         WHEN $bucket < 90 THEN 'val'
              |         ELSE 'test' END AS split
              |  FROM gated),
              |quota AS (
              |  SELECT split, source, doc_id, n_toks,
              |    ROW_NUMBER() OVER (PARTITION BY split, source
              |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS qr
              |  FROM sp)
              |SELECT split, source, CAST(count(*) AS BIGINT) AS n_docs,
              |  CAST(sum(n_toks) AS BIGINT) AS n_tokens,
              |  CAST(sum($fp) AS BIGINT) AS checksum
              |FROM (SELECT split, source, n_toks,
              |        md5(CAST(doc_id AS VARCHAR)) AS ch
              |      FROM quota WHERE qr <= $PipeQuota) t
              |GROUP BY split, source
              |ORDER BY split, source""".stripMargin)
    },
    (s, d) => {
      import graft.functions.TextFunctions
      // parallelism aid for the shingle-gate stage (see operators/Spread)
      val docs = graft.operators.Spread.byKey(Tables.documents(s, d), "doc_id")
      val keepIds = graft.operators.Dedup.exact(docs, "doc_id", "text")
        .select(col("keep_id"))
      val kept = docs.join(keepIds,
        docs("doc_id") === keepIds("keep_id"), "left_semi")
      val gated = kept
        .withColumn("ts", TextFunctions.tokens(col("text")))
        .withColumn("n_toks", size(col("ts")))
        .withColumn("ng", greatest(size(col("ts")) - 2, lit(0)))
        // the fused native shingle op returns DISTINCT md5'd shingles, so
        // its size IS the distinct count — one pass, no intermediate
        // string arrays (md5 injectivity, parity-spec'd vs the composed
        // form the oracle replays)
        .withColumn("nd", size(TextFunctions.md5Shingles(col("ts"), 3)))
        .filter(col("n_toks").between(MinToks, MaxToks) &&
          lit(5) * (col("ng") - col("nd")) <= col("ng"))
        .withColumn("h", md5(col("text")))
      val bucket = expr(s"(${hexSpanValSql("h", 0, 6)} % 100)")
      val sp = gated.withColumn("split",
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("split", "source")
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      sp.withColumn("qr", row_number().over(w))
        .filter(col("qr") <= PipeQuota)
        .withColumn("ch", md5(col("doc_id").cast("string")))
        .groupBy("split", "source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_toks").cast("long")).as("n_tokens"),
          sum(expr(hexSpanValSql("ch", 0, 13))).as("checksum"))
        .orderBy("split", "source")
    })

  /** Proportional-allocation sampling: each source keeps ⌈10% of ITS
    * rows⌉ (q83 keeps a FIXED n per stratum — proportional preserves the
    * mixture weights instead of flattening them). The fraction stays in
    * exact DECIMAL (0.1·n then ceil) so the cutoff can't waver with a
    * double representation; same md5-ranked replayable draw as q83.
    * One window shuffle on source. */
  val q131_proportional_sample = Q(
    "q131_proportional_sample",
    Some("""WITH r AS (
            |  SELECT source, doc_id,
            |    ROW_NUMBER() OVER (PARTITION BY source
            |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
            |    COUNT(*) OVER (PARTITION BY source) AS ns
            |  FROM documents)
            |SELECT source, doc_id, CAST(rn AS BIGINT) AS draw_rank,
            |  CAST(ns AS BIGINT) AS n_source
            |FROM r WHERE rn <= ceil(0.1 * ns)
            |ORDER BY source, draw_rank""".stripMargin),
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("source")
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      val wAll = org.apache.spark.sql.expressions.Window.partitionBy("source")
      Tables.documents(s, d)
        .withColumn("rn", row_number().over(w))
        .withColumn("ns", count(lit(1)).over(wAll))
        .filter(expr("rn <= ceil(0.1 * ns)"))
        .select(col("source"), col("doc_id"), col("rn").cast("long").as("draw_rank"),
          col("ns").cast("long").as("n_source"))
        .orderBy("source", "draw_rank")
    })

  private val NegK = 5

  /** Contrastive negative mining: for each anchor of a FIXED probe batch
    * (the q110 cap — ≤15 ids at any scale), draw k deterministic
    * "hard-random" negatives from OTHER sources, ranked by the
    * md5(anchor|candidate) draw — replayable, content-independent, and
    * collision-free (the id pair is in the digest). The anchor batch
    * broadcasts into a nested-loop inequality join (anchor count × corpus
    * rows, bounded by the fixed batch); per-anchor ranking is one window
    * keyed on the anchor. At production scale the ranking input gets a
    * draw-prefix precut with a refill fallback — elided here to keep the
    * entry exactly-replayable. */
  val q140_negative_sampling = Q(
    "q140_negative_sampling",
    Some(s"""WITH a AS (
            |  SELECT doc_id AS anchor_id, source AS a_src FROM documents
            |  WHERE doc_id % 100 = 7 AND doc_id < $SparseProbeCap),
            |r AS (
            |  SELECT anchor_id, d.doc_id AS neg_id, d.source AS neg_source,
            |    ROW_NUMBER() OVER (PARTITION BY anchor_id ORDER BY
            |      md5(CAST(anchor_id AS VARCHAR) || '|'
            |        || CAST(d.doc_id AS VARCHAR)), d.doc_id) AS rk
            |  FROM a JOIN documents d ON d.source <> a.a_src)
            |SELECT anchor_id, CAST(rk AS BIGINT) AS rk, neg_id, neg_source
            |FROM r WHERE rk <= $NegK
            |ORDER BY anchor_id, rk""".stripMargin),
    (s, d) => {
      val docs = Tables.documents(s, d)
      val anchors = docs
        .filter(col("doc_id") % 100 === 7 && col("doc_id") < SparseProbeCap)
        .select(col("doc_id").as("anchor_id"), col("source").as("a_src"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("anchor_id").orderBy(col("draw"), col("neg_id"))
      broadcast(anchors)
        .join(docs.select(col("doc_id").as("neg_id"),
          col("source").as("neg_source")),
          col("neg_source") =!= col("a_src"))
        .withColumn("draw", md5(concat(col("anchor_id").cast("string"),
          lit("|"), col("neg_id").cast("string"))))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= NegK)
        .select("anchor_id", "rk", "neg_id", "neg_source")
        .orderBy("anchor_id", "rk")
    })

  /** Sequence-length bucketing report: docs bucketed to the next
    * power-of-two token capacity (explicit integer CASE ladder — no
    * floating log2, whose last-ulp behavior differs per libm), with the
    * padding waste and batch efficiency each bucket would cost. The
    * decision table behind length-grouped batching; one scan + one tiny
    * hash agg. Complements q74 (packing concatenates, bucketing pads). */
  val q141_length_buckets = Q(
    "q141_length_buckets", {
      val ladder = (6 to 12).map(p => s"WHEN n_tok <= ${1 << p} THEN ${1 << p}")
        .mkString("CASE ", " ", " ELSE 8192 END")
      Some(s"""WITH t AS (
              |  SELECT len(string_split(text, ' ')) AS n_tok FROM documents),
              |b AS (SELECT n_tok, $ladder AS cap FROM t)
              |SELECT cap, CAST(count(*) AS BIGINT) AS n_docs,
              |  CAST(sum(n_tok) AS BIGINT) AS sum_tokens,
              |  CAST(sum(cap - n_tok) AS BIGINT) AS pad_waste,
              |  round(CAST(sum(n_tok) AS DOUBLE)
              |    / CAST(count(*) * cap AS DOUBLE), 6) AS efficiency
              |FROM b GROUP BY cap
              |ORDER BY cap""".stripMargin)
    },
    (s, d) => {
      val ladder = (6 to 12).map(p => s"WHEN n_tok <= ${1 << p} THEN ${1 << p}")
        .mkString("CASE ", " ", " ELSE 8192 END")
      Tables.documents(s, d)
        .select(size(split(col("text"), " ")).cast("long").as("n_tok"))
        .withColumn("cap", expr(ladder))
        .groupBy("cap")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("sum_tokens"),
          sum(col("cap") - col("n_tok")).as("pad_waste"),
          round(sum(col("n_tok")).cast("double") /
            (count(lit(1)) * col("cap")).cast("double"), 6).as("efficiency"))
        .orderBy("cap")
    })

  private val Bm25K1 = 1.2
  private val Bm25B = 0.75
  private val Bm25K = 5

  /** BM25 ranking (q110's retrieval shape under the REAL lexical scoring
    * function — Lucene's non-negative idf variant): probe documents'
    * distinct terms query the term-keyed postings; each matching posting
    * contributes idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)); the
    * per-(probe, doc) score is the decimal sum of ROUNDED contributions,
    * so the result is independent of the order the engine adds postings
    * in — the q89 discipline applied to a ranking function. Same scale
    * shape as q110: bounded broadcast probe batch, postings join keyed
    * on the term, candidate-volume window for the top-k. */
  val q165_bm25 = Q(
    "q165_bm25", {
      val idf = s"ln((nd.n - df.df + 0.5) / (df.df + 0.5) + 1.0)"
      val tfw = s"(tf * (${Bm25K1} + 1.0)) / " +
        s"(tf + ${Bm25K1} * (1.0 - ${Bm25B} + ${Bm25B} * dl.dl / ad.avgdl))"
      Some(s"""WITH tok AS (
              |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
              |  FROM documents),
              |post AS (
              |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
              |  FROM tok GROUP BY doc_id, term),
              |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
              |  FROM tok GROUP BY doc_id),
              |ad AS (SELECT CAST(CAST(sum(dl) AS DECIMAL(28,8)) AS DOUBLE)
              |    / count(*) AS avgdl FROM dl),
              |nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
              |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df
              |  FROM post GROUP BY term),
              |q AS (SELECT doc_id AS probe_id, term FROM post
              |  WHERE doc_id % 100 = 7 AND doc_id < $SparseProbeCap),
              |hits AS (
              |  SELECT q.probe_id, p.doc_id AS doc_b,
              |    round($idf * $tfw, 8) AS contrib
              |  FROM q
              |  JOIN post p ON p.term = q.term AND p.doc_id <> q.probe_id
              |  JOIN df ON df.term = q.term
              |  JOIN dl ON dl.doc_id = p.doc_id
              |  CROSS JOIN ad CROSS JOIN nd),
              |sc AS (
              |  SELECT probe_id, doc_b,
              |    CAST(sum(CAST(contrib AS DECIMAL(20,8))) AS DOUBLE) AS score
              |  FROM hits GROUP BY probe_id, doc_b),
              |r AS (
              |  SELECT probe_id, doc_b, score, ROW_NUMBER() OVER (
              |    PARTITION BY probe_id ORDER BY score DESC, doc_b) AS rk
              |  FROM sc)
              |SELECT probe_id, CAST(rk AS BIGINT) AS rk, doc_b,
              |  round(score, 6) AS score
              |FROM r WHERE rk <= $Bm25K
              |ORDER BY probe_id, rk""".stripMargin)
    },
    (s, d) => {
      // spread before the tokenize head (one-file scan = serial explode
      // + partial tf agg on one core; scale-gated — r16)
      val tok = graft.operators.Spread.byKey(Tables.documents(s, d), "doc_id")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      // post feeds THREE branches (df counts, probe terms, the postings
      // stream) — persist so the scan+explode+agg runs once; dl = Σ tf
      // per doc comes from the cached postings, not a second full
      // shuffle of the raw token stream
      val post = graft.operators.PlanCache.persist(
        tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf")))
      val dl = post.groupBy("doc_id")
        .agg(sum("tf").cast("long").as("dl"))
      val ad = dl.agg((sum(col("dl").cast("decimal(28,8)")).cast("double") /
        count(lit(1))).as("avgdl"))
      val nd = Tables.documents(s, d).agg(count(lit(1)).as("n"))
      val dfT = post.groupBy("term").agg(count(lit(1)).as("df"))
      val q = post.filter(col("doc_id") % 100 === 7 &&
          col("doc_id") < SparseProbeCap)
        .select(col("doc_id").as("probe_id"), col("term"))
      val idf = log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
      val tfw = (col("tf") * (Bm25K1 + 1.0)) /
        (col("tf") + lit(Bm25K1) * (lit(1.0 - Bm25B) +
          lit(Bm25B) * col("dl") / col("avgdl")))
      val hits = broadcast(q)
        .join(post.toDF("doc_b", "term", "tf"), "term")
        .filter(col("doc_b") =!= col("probe_id"))
        .join(broadcast(dfT), "term")
        .join(dl.toDF("doc_b", "dl"), "doc_b")
        .crossJoin(broadcast(ad)).crossJoin(broadcast(nd))
        .select(col("probe_id"), col("doc_b"),
          round(idf * tfw, 8).as("contrib"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("probe_id")
        .orderBy(col("score").desc, col("doc_b"))
      hits.groupBy("probe_id", "doc_b")
        .agg(sum(col("contrib").cast("decimal(20,8)")).cast("double").as("score"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= Bm25K)
        .select(col("probe_id"), col("rk"), col("doc_b"),
          round(col("score"), 6).as("score"))
        .orderBy("probe_id", "rk")
    })

  val all: Seq[Q] = Seq(q110_sparse_cosine, q115_golden_record,
    q122_curation_pipeline, q131_proportional_sample,
    q140_negative_sampling, q141_length_buckets, q165_bm25)
}
