package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFunctions._

/** Round-9 vector-retrieval battery: MMR-diversified reranking, binary
  * (sign-bit) quantization with Hamming shortlisting, and Matryoshka
  * prefix-dimension recall — the serving-side levers (diversity, memory,
  * dimension truncation) around the ANN family q38–q260 built.
  */
object VectorOps5 {

  private val MmrK = 12      // retrieved candidate pool
  private val MmrPicks = 4   // diversified picks
  private val MmrLambda = 0.7

  /** Maximal-marginal-relevance reranking: retrieve a top-12 candidate
    * pool by cosine (the q38 scalable shape — broadcast query, corpus
    * TakeOrdered), then greedily pick 4 results maximizing
    * λ·rel − (1−λ)·max-sim-to-already-picked. The greedy is inherently
    * sequential, but it runs ENTIRELY on the candidate pool — pool
    * retrieval is the only corpus-scale work, and the 4 steps are
    * 1-row argmax fetches over ≤12 rows (the TextOps7 bounded-fetch
    * pattern); candidate pairwise sims are a 12×12 scan-side product.
    * The oracle replays the identical greedy as chained CTEs. Ties at
    * every argmax break by vec_id, and every compared score is the same
    * IEEE expression on round-6 inputs on both engines. */
  val q281_mmr_rerank = Q(
    "q281_mmr_rerank", {
      val lam = MmrLambda
      val om = 1 - MmrLambda   // literal 0.3 — parsed identically
      def pickStep(n: Int) = {
        val selPrev = (1 until n).map(i => s"SELECT vec_id FROM s$i")
          .mkString(" UNION ALL ")
        s"""p$n AS (
           |  SELECT c.vec_id, c.sim, max(pc.ps) AS pen
           |  FROM cand c JOIN pc ON pc.va = c.vec_id
           |    AND pc.vb IN ($selPrev)
           |  WHERE c.vec_id NOT IN ($selPrev)
           |  GROUP BY c.vec_id, c.sim),
           |s$n AS (
           |  SELECT vec_id, sim, pen FROM p$n
           |  ORDER BY $lam * sim - $om * pen DESC, vec_id LIMIT 1)"""
          .stripMargin
      }
      val steps = (2 to MmrPicks).map(pickStep).mkString(",\n")
      val outRows = (2 to MmrPicks).map { n =>
        s"""SELECT CAST($n AS BIGINT) AS step, vec_id, sim AS relevance,
           |  round(pen, 6) AS penalty,
           |  round($lam * sim - $om * pen, 6) AS mmr
           |FROM s$n""".stripMargin
      }.mkString("\nUNION ALL\n")
      Some(s"""WITH q AS (
              |  SELECT embedding::DOUBLE[] AS qe FROM embeddings
              |  WHERE vec_id = 0),
              |cand AS (
              |  SELECT vec_id, embedding::DOUBLE[] AS e,
              |    round(${cosineSql("(embedding::DOUBLE[])", "qe")}, 6) AS sim
              |  FROM embeddings CROSS JOIN q WHERE vec_id <> 0
              |  ORDER BY sim DESC, vec_id LIMIT $MmrK),
              |pc AS (
              |  SELECT a.vec_id AS va, b.vec_id AS vb,
              |    round(${cosineSql("a.e", "b.e")}, 6) AS ps
              |  FROM cand a JOIN cand b ON a.vec_id <> b.vec_id),
              |s1 AS (
              |  SELECT vec_id, sim FROM cand ORDER BY sim DESC, vec_id
              |  LIMIT 1),
              |$steps
              |SELECT CAST(1 AS BIGINT) AS step, vec_id, sim AS relevance,
              |  CAST(0.0 AS DOUBLE) AS penalty,
              |  round($lam * sim, 6) AS mmr
              |FROM s1
              |UNION ALL
              |$outRows
              |ORDER BY step""".stripMargin)
    },
    (s, d) => {
      val emb = Tables.embeddings(s, d)
        .withColumn("e", col("embedding").cast("array<double>"))
      val q = emb.filter(col("vec_id") === 0).select(col("e").as("qe"))
      val cand = graft.operators.PlanCache.persist(
        emb.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
          .select(col("vec_id"), col("e"),
            round(cosine(col("e"), col("qe")), 6).as("sim"))
          .orderBy(col("sim").desc, col("vec_id")).limit(MmrK))
      val b = cand.select(col("vec_id").as("vb"), col("e").as("be"))
      val pc = graft.operators.PlanCache.persist(
        cand.join(b, col("vec_id") =!= col("vb"))
          .select(col("vec_id").as("va"), col("vb"),
            round(cosine(col("e"), col("be")), 6).as("ps")))
      // greedy loop: each pick is a 1-row fetch over the ≤12-row pool
      val first = cand.orderBy(col("sim").desc, col("vec_id"))
        .select(col("vec_id"), col("sim")).limit(1)
      var picked = Seq(first.head().getLong(0))
      var out = first.select(lit(1L).as("step"), col("vec_id"),
        col("sim").as("relevance"), lit(0.0).as("penalty"),
        round(lit(MmrLambda) * col("sim"), 6).as("mmr"))
      for (step <- 2 to MmrPicks) {
        val pen = pc.filter(col("vb").isin(picked: _*))
          .groupBy("va").agg(max(col("ps")).as("pen"))
        val score = lit(MmrLambda) * col("sim") -
          lit(1 - MmrLambda) * col("pen")
        val pick = cand.filter(!col("vec_id").isin(picked: _*))
          .join(pen, col("vec_id") === col("va"))
          .orderBy(score.desc, col("vec_id")).limit(1)
          .select(lit(step.toLong).as("step"), col("vec_id"),
            col("sim").as("relevance"), round(col("pen"), 6).as("penalty"),
            round(score, 6).as("mmr"))
        picked = picked :+ pick.head().getLong(1)
        out = out.unionAll(pick)
      }
      out.orderBy("step")
    })

  /** Binary-quantization serving: every embedding's 64 sign bits packed
    * into two BIGINT halves (a scan-side fold — 16 bytes/vector instead
    * of 512, the memory story PQ told at finer grain), shortlist-by-
    * Hamming-distance (popcount over XOR, codegen-friendly integer ops),
    * then exact-cosine rerank of the 32-candidate shortlist; reports
    * recall@5 against the full-precision top-5. The corpus-scale work is
    * the packed scan + a 32-row TakeOrdered; floats only touch the
    * shortlist. Two 32-bit halves (not one 64-bit word) keep every
    * shifted literal non-negative in BIGINT on both engines. */
  val q282_hamming_rerank = Q(
    "q282_hamming_rerank", {
      def packSql(e: String, from: Int) =
        s"""list_reduce(list_transform(generate_series(1, 32),
           |  i -> CASE WHEN $e[i + ${from - 1}] > 0
           |       THEN (CAST(1 AS BIGINT) << (i - 1))
           |       ELSE CAST(0 AS BIGINT) END), (x, y) -> x + y)"""
          .stripMargin
      Some(s"""WITH p AS (
              |  SELECT vec_id, embedding::DOUBLE[] AS e,
              |    ${packSql("(embedding::DOUBLE[])", 1)} AS h1,
              |    ${packSql("(embedding::DOUBLE[])", 33)} AS h2
              |  FROM embeddings),
              |q AS (SELECT e AS qe, h1 AS qh1, h2 AS qh2 FROM p
              |      WHERE vec_id = 0),
              |cand AS (
              |  SELECT vec_id, e, qe,
              |    bit_count(xor(h1, qh1)) + bit_count(xor(h2, qh2)) AS ham
              |  FROM p CROSS JOIN q WHERE vec_id <> 0
              |  ORDER BY ham, vec_id LIMIT 32),
              |rr AS (
              |  SELECT vec_id, round(${cosineSql("e", "qe")}, 6) AS sim
              |  FROM cand ORDER BY sim DESC, vec_id LIMIT 5),
              |t AS (
              |  SELECT vec_id,
              |    round(${cosineSql("(embedding::DOUBLE[])", "qe")}, 6)
              |      AS sim
              |  FROM embeddings CROSS JOIN q WHERE vec_id <> 0
              |  ORDER BY sim DESC, vec_id LIMIT 5)
              |SELECT
              |  (SELECT CAST(count(*) AS BIGINT) FROM cand)
              |    AS n_candidates,
              |  (SELECT CAST(count(*) AS BIGINT) FROM rr JOIN t
              |     USING (vec_id)) AS n_overlap,
              |  (SELECT round(count(*) / 5.0, 6) FROM rr JOIN t
              |     USING (vec_id)) AS recall_at_5""".stripMargin)
    },
    (s, d) => {
      def pack(from: Int) =
        expr(s"""aggregate(transform(sequence(1, 32),
                |  i -> IF(element_at(e, i + ${from - 1}) > CAST(0 AS DOUBLE),
                |       shiftleft(CAST(1 AS BIGINT), i - 1),
                |       CAST(0 AS BIGINT))),
                |  CAST(0 AS BIGINT), (x, y) -> x + y)""".stripMargin)
      val p = Tables.embeddings(s, d)
        .withColumn("e", col("embedding").cast("array<double>"))
        .withColumn("h1", pack(1)).withColumn("h2", pack(33))
        .select("vec_id", "e", "h1", "h2")
      val q = p.filter(col("vec_id") === 0)
        .select(col("e").as("qe"), col("h1").as("qh1"), col("h2").as("qh2"))
      val ham = expr("bit_count(h1 ^ qh1) + bit_count(h2 ^ qh2)")
      val cand = graft.operators.PlanCache.persist(
        p.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
          .withColumn("ham", ham)
          .orderBy(col("ham"), col("vec_id")).limit(32))
      val rr = cand
        .select(col("vec_id"), round(cosine(col("e"), col("qe")), 6).as("sim"))
        .orderBy(col("sim").desc, col("vec_id")).limit(5)
      val t = p.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q.select(col("qe"))))
        .select(col("vec_id"), round(cosine(col("e"), col("qe")), 6).as("sim"))
        .orderBy(col("sim").desc, col("vec_id")).limit(5)
      val overlap = rr.select("vec_id")
        .join(t.select("vec_id"), "vec_id")
        .agg(count(lit(1)).as("n_overlap"))
      val nc = cand.agg(count(lit(1)).as("n_candidates"))
      broadcast(nc).crossJoin(broadcast(overlap))
        .select(col("n_candidates"), col("n_overlap"),
          round(col("n_overlap") / 5.0, 6).as("recall_at_5"))
    })

  private val MatDims = Seq(8, 16, 32)

  /** Matryoshka (prefix-dimension) recall: rank by cosine over only the
    * first m dimensions (m = 8/16/32) and measure top-10 recall against
    * the full 64-dim ranking — the measurement behind the
    * store-a-prefix / rerank-with-full-dims serving trade. Prefix
    * cosine folds the SAME index order as the full kernel (the oracle's
    * generate_series(1, m) fold mirrors the sliced native expression
    * bit-for-bit); each dimension level is one corpus pass + a top-10
    * TakeOrdered; the recall join is k×k. */
  val q283_matryoshka_recall = Q(
    "q283_matryoshka_recall", {
      def dotN(a: String, b: String, n: Int) =
        s"list_reduce(list_transform(generate_series(1, $n), i -> $a[i] * $b[i]), (x, y) -> x + y)"
      def cosN(a: String, b: String, n: Int) =
        s"(${dotN(a, b, n)} / (sqrt(${dotN(a, a, n)}) * sqrt(${dotN(b, b, n)})))"
      val e = "(embedding::DOUBLE[])"
      def top10(n: Int, name: String) =
        s"""$name AS (
           |  SELECT vec_id FROM (
           |    SELECT vec_id, round(${cosN(e, "qe", n)}, 6) AS sim
           |    FROM embeddings CROSS JOIN q WHERE vec_id <> 0)
           |  ORDER BY sim DESC, vec_id LIMIT 10)""".stripMargin
      val dims = MatDims.map(n => top10(n, s"p$n")).mkString(",\n")
      val rows = MatDims.map { n =>
        s"""SELECT CAST($n AS BIGINT) AS dim,
           |  (SELECT round(count(*) / 10.0, 6) FROM p$n JOIN t
           |     USING (vec_id)) AS recall_at_10""".stripMargin
      }.mkString("\nUNION ALL\n")
      Some(s"""WITH q AS (
              |  SELECT embedding::DOUBLE[] AS qe FROM embeddings
              |  WHERE vec_id = 0),
              |${top10(64, "t")},
              |$dims
              |$rows
              |ORDER BY dim""".stripMargin)
    },
    (s, d) => {
      val emb = Tables.embeddings(s, d)
        .withColumn("e", col("embedding").cast("array<double>"))
        .filter(col("vec_id") =!= 0)
      val q = Tables.embeddings(s, d).filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>").as("qe"))
      def top10(n: Int): DataFrame =
        emb.crossJoin(broadcast(q))
          .select(col("vec_id"),
            round(cosine(slice(col("e"), 1, n), slice(col("qe"), 1, n)), 6)
              .as("sim"))
          .orderBy(col("sim").desc, col("vec_id")).limit(10)
          .select("vec_id")
      val t = graft.operators.PlanCache.persist(top10(64))
      MatDims.map { n =>
        top10(n).join(t, "vec_id").agg(count(lit(1)).as("k"))
          .select(lit(n.toLong).as("dim"),
            round(col("k") / 10.0, 6).as("recall_at_10"))
      }.reduce(_.unionAll(_)).orderBy("dim")
    })

  private val MrrCent = 16
  private val MrrQ = 8
  private val MrrProbe = 2
  private val MrrK = 10

  /** Mean reciprocal rank of the IVF serving path — the eval metric the
    * recall (q260), nDCG (q226), and RBO (q222) audits don't give: "at
    * what position does the TRUE best answer surface", the number a
    * retrieval-augmented pipeline with a top-1 consumer actually cares
    * about. Per query in the q136 batch: the exact top-1 (brute-force,
    * probe-bounded) looked up in the audited `ivfTopKBatch` top-10;
    * rr = 1/rank (0 when absent), MRR = the decimal-exact mean. All
    * corpus-scale work is the two audited shapes (one IVF batch pass +
    * one exact pass over the bounded query batch); the join is k×|batch|
    * list metadata. */
  val q302_ann_mrr = Q(
    "q302_ann_mrr",
    Some(s"""WITH e AS (
            |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            |cent AS (
            |  SELECT vec_id AS cid, v AS cvec FROM e WHERE vec_id < $MrrCent),
            |assign AS (
            |  SELECT vec_id, v, cid,
            |    ROW_NUMBER() OVER (PARTITION BY vec_id
            |      ORDER BY round(${cosineSql("v", "cvec")}, 6) DESC, cid)
            |      AS rnk
            |  FROM e CROSS JOIN cent WHERE e.vec_id >= $MrrQ),
            |members AS (SELECT vec_id, v, cid FROM assign WHERE rnk = 1),
            |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < $MrrQ),
            |qprobe AS (
            |  SELECT qid, qv, cid FROM (
            |    SELECT qid, qv, cid, ROW_NUMBER() OVER (PARTITION BY qid
            |      ORDER BY round(${cosineSql("qv", "cvec")}, 6) DESC, cid)
            |      AS rnk
            |    FROM q CROSS JOIN cent) t
            |  WHERE rnk <= $MrrProbe),
            |cand AS (
            |  SELECT p.qid, m.vec_id,
            |    round(${cosineSql("m.v", "p.qv")}, 6) AS sim
            |  FROM members m JOIN qprobe p ON m.cid = p.cid),
            |ivf AS (
            |  SELECT qid, vec_id, CAST(rk AS BIGINT) AS rk FROM (
            |    SELECT qid, vec_id, ROW_NUMBER() OVER (
            |      PARTITION BY qid ORDER BY sim DESC, vec_id) AS rk
            |    FROM cand) t
            |  WHERE rk <= $MrrK),
            |truth AS (
            |  SELECT qid, vec_id AS true_best FROM (
            |    SELECT q.qid, e2.vec_id, ROW_NUMBER() OVER (
            |      PARTITION BY q.qid
            |      ORDER BY round(${cosineSql("e2.v", "q.qv")}, 6) DESC,
            |        e2.vec_id) AS rnk
            |    FROM e e2 CROSS JOIN q WHERE e2.vec_id >= $MrrQ) t
            |  WHERE rnk = 1),
            |j AS (
            |  SELECT t.qid, t.true_best, i.rk
            |  FROM truth t LEFT JOIN ivf i
            |    ON i.qid = t.qid AND i.vec_id = t.true_best),
            |m AS (
            |  SELECT round(CAST(sum(CAST(round(coalesce(1.0 / rk, 0), 9)
            |      AS DECIMAL(18,9))) AS DOUBLE) / count(*), 6) AS mrr
            |  FROM j)
            |SELECT j.qid, j.true_best, j.rk AS found_rank,
            |  round(coalesce(1.0 / j.rk, 0), 9) AS rr, m.mrr
            |FROM j CROSS JOIN m
            |ORDER BY j.qid""".stripMargin),
    (s, d) => {
      val emb = Tables.embeddings(s, d)
        .withColumn("e", col("embedding").cast("array<double>"))
      val corpus = emb.filter(col("vec_id") >= MrrQ).select("vec_id", "e")
      val queries = emb.filter(col("vec_id") < MrrQ)
        .select(col("vec_id").as("qid"), col("e"))
      val ivf = graft.operators.Similarity.ivfTopKBatch(
        corpus, "vec_id", "e",
        emb.filter(col("vec_id") < MrrCent)
          .select(col("vec_id").as("cid"), col("e").as("cvec")),
        "cid", "cvec", queries, "qid", "e", k = MrrK, nProbe = MrrProbe)
        .select(col("qid"), col("vec_id"), col("rk"))
      val wT = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))
      val truth = corpus
        .crossJoin(broadcast(queries.select(col("qid"), col("e").as("qv"))))
        .select(col("qid"), col("vec_id"),
          round(cosine(col("e"), col("qv")), 6).as("sim"))
        .withColumn("rnk", row_number().over(wT))
        .filter(col("rnk") === 1)
        .select(col("qid"), col("vec_id").as("true_best"))
      val j = graft.operators.PlanCache.persist(truth.join(ivf,
          truth("qid") === ivf("qid") &&
            col("true_best") === ivf("vec_id"), "left")
        .select(truth("qid"), col("true_best"), col("rk")))
      val rr = round(coalesce(lit(1.0) / col("rk"), lit(0.0)), 9)
      val m = j.agg(round(sum(rr.cast("decimal(18,9)")).cast("double")
        / count(lit(1)), 6).as("mrr"))
      j.crossJoin(broadcast(m))
        .select(col("qid"), col("true_best"), col("rk").as("found_rank"),
          rr.as("rr"), col("mrr"))
        .orderBy("qid")
    })

  private val FilQ = 30  // filtered-ANN query batch
  private val FilC = 16  // centroids (corpus vec_id 30..45)
  private val FilK = 5
  private val FilNp = 3

  /** Filtered ANN: pre-filter vs post-filter recall under a metadata
    * predicate (label must equal the query's label) — THE operational
    * choice in vector serving. Both strategies share one IVF route
    * (scan-side cell assignment, 3-probe candidate join); PRE-filter
    * applies the predicate to candidates before the top-5 window,
    * POST-filter ranks unfiltered then drops non-matching results,
    * losing shortlist slots to wrong-label neighbors — the measured
    * recall gap is the entry's readout. Ground truth is the exact
    * label-filtered top-5. Corpus passes: one assignment scan + one
    * candidate join per strategy-shared frame; windows run per-query on
    * candidates only. */
  val q314_filtered_ann = Q(
    "q314_filtered_ann",
    Some(s"""WITH e AS (
            |  SELECT vec_id, label, embedding::DOUBLE[] AS v
            |  FROM embeddings),
            |q AS (SELECT vec_id AS qid, label AS qlabel, v AS qv FROM e
            |      WHERE vec_id < $FilQ),
            |c AS (SELECT vec_id, label, v FROM e WHERE vec_id >= $FilQ),
            |cent AS (SELECT vec_id AS cid, v AS cvec FROM c
            |         WHERE vec_id < ${FilQ + FilC}),
            |exact AS (
            |  SELECT qid, vec_id FROM (
            |    SELECT q.qid, c.vec_id, ROW_NUMBER() OVER (
            |      PARTITION BY q.qid
            |      ORDER BY round(${cosineSql("c.v", "q.qv")}, 6) DESC,
            |        c.vec_id) AS ra
            |    FROM c JOIN q ON c.label = q.qlabel) t
            |  WHERE ra <= $FilK),
            |nex AS (SELECT CAST(count(*) AS BIGINT) AS n_exact FROM exact),
            |assign AS (
            |  SELECT vec_id, label, v, cid FROM (
            |    SELECT c.vec_id, c.label, c.v, cent.cid,
            |      ROW_NUMBER() OVER (PARTITION BY c.vec_id
            |        ORDER BY round(${cosineSql("c.v", "cent.cvec")}, 6)
            |          DESC, cid) AS rnk
            |    FROM c CROSS JOIN cent) t WHERE rnk = 1),
            |qpr AS (
            |  SELECT qid, qlabel, qv, cid FROM (
            |    SELECT q.qid, q.qlabel, q.qv, cent.cid,
            |      ROW_NUMBER() OVER (PARTITION BY q.qid
            |        ORDER BY round(${cosineSql("q.qv", "cent.cvec")}, 6)
            |          DESC, cid) AS rnk
            |    FROM q CROSS JOIN cent) t WHERE rnk <= $FilNp),
            |cand AS (
            |  SELECT p.qid, p.qlabel, a.vec_id, a.label,
            |    round(${cosineSql("a.v", "p.qv")}, 6) AS sim
            |  FROM assign a JOIN qpr p ON a.cid = p.cid),
            |pre AS (
            |  SELECT qid, vec_id FROM (
            |    SELECT qid, vec_id, ROW_NUMBER() OVER (PARTITION BY qid
            |      ORDER BY sim DESC, vec_id) AS rk
            |    FROM cand WHERE label = qlabel) t WHERE rk <= $FilK),
            |post AS (
            |  SELECT qid, vec_id FROM (
            |    SELECT qid, vec_id, label, qlabel,
            |      ROW_NUMBER() OVER (PARTITION BY qid
            |        ORDER BY sim DESC, vec_id) AS rk
            |    FROM cand) t WHERE rk <= $FilK AND label = qlabel),
            |hp AS (SELECT CAST(count(*) AS BIGINT) AS n FROM pre
            |       JOIN exact USING (qid, vec_id)),
            |ho AS (SELECT CAST(count(*) AS BIGINT) AS n FROM post
            |       JOIN exact USING (qid, vec_id))
            |SELECT * FROM (
            |  SELECT 'prefilter' AS strategy, n_exact, n AS n_hits,
            |    round(CAST(n AS DOUBLE) / n_exact, 6) AS recall
            |  FROM hp CROSS JOIN nex
            |  UNION ALL
            |  SELECT 'postfilter' AS strategy, n_exact, n AS n_hits,
            |    round(CAST(n AS DOUBLE) / n_exact, 6) AS recall
            |  FROM ho CROSS JOIN nex) t
            |ORDER BY strategy""".stripMargin),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val emb = Tables.embeddings(s, d)
        .withColumn("e", col("embedding").cast("array<double>"))
      val corpus = emb.filter(col("vec_id") >= FilQ)
        .select("vec_id", "label", "e")
      val queries = emb.filter(col("vec_id") < FilQ)
        .select(col("vec_id").as("qid"), col("label").as("qlabel"),
          col("e").as("qe"))
      val cents = emb
        .filter(col("vec_id") >= FilQ && col("vec_id") < FilQ + FilC)
        .select(col("vec_id").as("cid"), col("e").as("cvec"))
      val wq = Window.partitionBy("qid")
        .orderBy(col("sim").desc, col("vec_id"))
      val exact = graft.operators.PlanCache.persist(
        corpus.crossJoin(broadcast(queries))
          .filter(col("label") === col("qlabel"))
          .select(col("qid"), col("vec_id"),
            round(cosine(col("e"), col("qe")), 6).as("sim"))
          .withColumn("ra", row_number().over(wq))
          .filter(col("ra") <= FilK).select("qid", "vec_id"))
      val nex = exact.agg(count(lit(1)).as("n_exact"))
      val assigned = graft.operators.Similarity.assignCells(
        corpus, "e", cents, "cid", "cvec")
      val wqc = Window.partitionBy("qid")
        .orderBy(col("csim").desc, col("cid"))
      val probes = queries.crossJoin(broadcast(cents))
        .select(col("qid"), col("qlabel"), col("qe"), col("cid"),
          round(cosine(col("qe"), col("cvec")), 6).as("csim"))
        .withColumn("rnk", row_number().over(wqc))
        .filter(col("rnk") <= FilNp)
        .select("qid", "qlabel", "qe", "cid")
      val cand = graft.operators.PlanCache.persist(
        assigned.join(broadcast(probes), Seq("cid"))
          .select(col("qid"), col("qlabel"), col("vec_id"), col("label"),
            round(cosine(col("e"), col("qe")), 6).as("sim")))
      val pre = cand.filter(col("label") === col("qlabel"))
        .withColumn("rk", row_number().over(wq))
        .filter(col("rk") <= FilK).select("qid", "vec_id")
      val post = cand.withColumn("rk", row_number().over(wq))
        .filter(col("rk") <= FilK && col("label") === col("qlabel"))
        .select("qid", "vec_id")
      def row(name: String, hits: DataFrame) =
        hits.join(exact, Seq("qid", "vec_id"))
          .agg(count(lit(1)).as("n_hits"))
          .crossJoin(broadcast(nex))
          .select(lit(name).as("strategy"), col("n_exact"), col("n_hits"),
            round(col("n_hits").cast("double") / col("n_exact"), 6)
              .as("recall"))
      row("postfilter", post).union(row("prefilter", pre))
        .orderBy("strategy")
    })

  /** IVF nlist planner — the sizing decision made BEFORE q57/q136 train
    * anything: per candidate cell count, the expected per-query scan
    * cost model centroids + nprobe·(N/nlist) (the standard IVF cost
    * curve, minimized near √(nprobe·N)), evaluated from ONE corpus
    * count. The planner marks the argmin row and carries the analytic
    * optimum for comparison — pure metadata arithmetic, the q265/q298
    * planner pattern applied to the ANN index family. */
  val q323_ivf_nlist_planner = Q(
    "q323_ivf_nlist_planner", {
      val cells = Seq(4, 8, 16, 32, 64, 128)
      val rows = cells.map(c => s"SELECT CAST($c AS BIGINT) AS nlist")
        .mkString(" UNION ALL ")
      Some(s"""WITH n AS (
              |  SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings),
              |cand AS ($rows),
              |costs AS (
              |  SELECT nlist,
              |    CAST(nlist AS DOUBLE) AS centroid_cost,
              |    round(3.0 * n / nlist, 6) AS probe_cost,
              |    round(nlist + 3.0 * n / nlist, 6) AS total_cost
              |  FROM cand CROSS JOIN n),
              |best AS (
              |  SELECT min(total_cost) AS best_cost FROM costs)
              |SELECT nlist, centroid_cost, probe_cost, total_cost,
              |  CASE WHEN total_cost = best_cost THEN 1 ELSE 0 END
              |    AS is_optimal,
              |  round(sqrt(3.0 * n), 6) AS analytic_opt
              |FROM costs CROSS JOIN best CROSS JOIN n
              |ORDER BY nlist""".stripMargin)
    },
    (s, d) => {
      val n = Tables.embeddings(s, d).agg(count(lit(1)).as("n"))
      val cand = s.range(0, 6).toDF("i")
        .select(expr("shiftleft(4L, CAST(i AS INT))").as("nlist"))
      val costs = cand.crossJoin(broadcast(n))
        .select(col("nlist"),
          col("nlist").cast("double").as("centroid_cost"),
          round(lit(3.0) * col("n") / col("nlist"), 6).as("probe_cost"),
          round(col("nlist") + lit(3.0) * col("n") / col("nlist"), 6)
            .as("total_cost"),
          round(sqrt(lit(3.0) * col("n")), 6).as("analytic_opt"))
      val best = costs.agg(min("total_cost").as("best_cost"))
      costs.crossJoin(broadcast(best))
        .select(col("nlist"), col("centroid_cost"), col("probe_cost"),
          col("total_cost"),
          when(col("total_cost") === col("best_cost"), 1).otherwise(0)
            .as("is_optimal"),
          col("analytic_opt"))
        .orderBy("nlist")
    })

  /** Late-interaction (maxsim) retrieval — the ColBERT scoring shape:
    * "documents" are vec_id-div-10 groups of vectors, and
    * score(qdoc, cdoc) = Σ_{query vec} max_{corpus vec} cos — every
    * query vector independently finds its best corpus-side match and
    * the per-vector maxima sum. Corpus pass: ONE broadcast of the 30
    * query vectors against the corpus scan, then two grid aggs
    * ((qvec, cdoc) max → (qdoc, cdoc) decimal-sum of round-6 maxima —
    * partial-agg-order independent) and a per-qdoc top-5 window on the
    * doc-pair grid. At scale the (qvec, cdoc) partial-max is the
    * map-side combine that keeps the shuffle at |qvecs|·|docs|, never
    * |qvecs|·|vectors|. */
  val q326_maxsim_retrieval = Q(
    "q326_maxsim_retrieval",
    Some(s"""WITH e AS (
            |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            |qv AS (SELECT vec_id, vec_id // 10 AS qdoc, v FROM e
            |       WHERE vec_id < 30),
            |cv AS (SELECT vec_id, vec_id // 10 AS cdoc, v FROM e
            |       WHERE vec_id >= 30),
            |vm AS (
            |  SELECT qv.qdoc, qv.vec_id AS qvec, cv.cdoc,
            |    max(round(${cosineSql("qv.v", "cv.v")}, 6)) AS best
            |  FROM qv CROSS JOIN cv
            |  GROUP BY 1, 2, 3),
            |sc AS (
            |  SELECT qdoc, cdoc,
            |    CAST(sum(CAST(best AS DECIMAL(18,6))) AS DOUBLE) AS score
            |  FROM vm GROUP BY qdoc, cdoc),
            |rk AS (
            |  SELECT qdoc, cdoc, round(score, 6) AS score,
            |    ROW_NUMBER() OVER (PARTITION BY qdoc
            |      ORDER BY score DESC, cdoc) AS rank
            |  FROM sc)
            |SELECT qdoc, CAST(rank AS BIGINT) AS rank, cdoc, score
            |FROM rk WHERE rank <= 5 ORDER BY qdoc, rank""".stripMargin),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables.embeddings(s, d)
        .withColumn("v", col("embedding").cast("array<double>"))
      val qv = e.filter(col("vec_id") < 30)
        .select(col("vec_id").as("qvec"), expr("vec_id div 10").as("qdoc"),
          col("v").as("qv"))
      val cv = e.filter(col("vec_id") >= 30)
        .select(expr("vec_id div 10").as("cdoc"), col("v"))
      val vm = cv.crossJoin(broadcast(qv))
        .groupBy("qdoc", "qvec", "cdoc")
        .agg(max(round(cosine(col("qv"), col("v")), 6)).as("best"))
      val sc = vm.groupBy("qdoc", "cdoc")
        .agg(sum(col("best").cast("decimal(18,6)")).cast("double")
          .as("score"))
      val w = Window.partitionBy("qdoc")
        .orderBy(col("score").desc, col("cdoc"))
      sc.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 5)
        .select(col("qdoc"), col("rank"), col("cdoc"),
          round(col("score"), 6).as("score"))
        .orderBy("qdoc", "rank")
    })

  private val CalThresholds = Seq(0.20, 0.25, 0.30, 0.35, 0.40, 0.45)

  /** Semantic-dedup threshold calibration: for each candidate cosine
    * threshold, the merge count and FALSE-MERGE rate (merged pairs whose
    * labels disagree) measured on the sign-LSH in-bucket pair set — the
    * "pick the knob before running q150" audit, using labels as the
    * ground-truth proxy. Pairs come from the SAME bucket join the dedup
    * path uses (bounded, never all-pairs); the threshold sweep is 6
    * conditional aggs over that one pair frame. Rows with no merges
    * report 0 by convention. */
  val q328_dedup_threshold_cal = Q(
    "q328_dedup_threshold_cal", {
      import VectorOps.Planes8
      val sweep = CalThresholds.map { t =>
        s"""SELECT $t AS threshold,
           |  CAST(sum(CASE WHEN sim >= $t THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_merges,
           |  CASE WHEN sum(CASE WHEN sim >= $t THEN 1 ELSE 0 END) = 0
           |    THEN CAST(0 AS DOUBLE)
           |    ELSE round(CAST(sum(CASE WHEN sim >= $t AND la <> lb
           |      THEN 1 ELSE 0 END) AS DOUBLE)
           |      / sum(CASE WHEN sim >= $t THEN 1 ELSE 0 END), 6) END
           |    AS false_merge_rate
           |FROM prs""".stripMargin
      }.mkString("\nUNION ALL\n")
      Some(s"""WITH b AS (
              |  SELECT vec_id, label, embedding::DOUBLE[] AS e,
              |    ${lshBucketSql("(embedding::DOUBLE[])", Planes8)} AS bucket
              |  FROM embeddings),
              |prs AS (
              |  SELECT a.label AS la, b.label AS lb,
              |    round(${cosineSql("a.e", "b.e")}, 6) AS sim
              |  FROM b a JOIN b b ON a.bucket = b.bucket
              |    AND a.vec_id < b.vec_id)
              |SELECT * FROM ($sweep) t
              |ORDER BY threshold""".stripMargin)
    },
    (s, d) => {
      import VectorOps.Planes8
      val b = graft.operators.Similarity.withLshBucket(
        Tables.embeddings(s, d)
          .withColumn("e", col("embedding").cast("array<double>"))
          .select("vec_id", "label", "e"), "e", Planes8)
      val l = b.select(col("bucket"), col("vec_id").as("ia"),
        col("label").as("la"), col("e").as("ea"))
      val r = b.select(col("bucket"), col("vec_id").as("ib"),
        col("label").as("lb"), col("e").as("eb"))
      val prs = graft.operators.PlanCache.persist(
        l.join(r, Seq("bucket")).filter(col("ia") < col("ib"))
          .select(col("la"), col("lb"),
            round(cosine(col("ea"), col("eb")), 6).as("sim")))
      val rows = CalThresholds.map { t =>
        val merges = sum(when(col("sim") >= t, 1L).otherwise(0L))
        val bad = sum(when(col("sim") >= t && col("la") =!= col("lb"), 1L)
          .otherwise(0L))
        prs.agg(merges.as("n_merges"), bad.as("n_bad"))
          .select(lit(t).as("threshold"), col("n_merges"),
            when(col("n_merges") === 0, lit(0.0))
              .otherwise(round(col("n_bad").cast("double") /
                col("n_merges"), 6)).as("false_merge_rate"))
      }
      rows.reduce(_ union _).orderBy("threshold")
    })

  /** Serving-quality audit beyond accuracy: CATALOG COVERAGE (what
    * fraction of the corpus is ever recommended) and INTRA-LIST
    * DIVERSITY (mean pairwise 1−cos within each top-5 list) of the
    * exact top-5 results for a 30-query batch — the two metrics a
    * recommender audits when recall alone looks fine but everyone gets
    * the same five popular items. One corpus pass builds the result
    * lists (q38's broadcast top-k shape); the ILD pair space is
    * 10 pairs × 30 queries of GRID arithmetic. */
  val q334_rec_coverage_ild = Q(
    "q334_rec_coverage_ild",
    Some(s"""WITH e AS (
            |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 30),
            |c AS (SELECT vec_id, v FROM e WHERE vec_id >= 30),
            |res AS (
            |  SELECT qid, vec_id FROM (
            |    SELECT q.qid, c.vec_id, ROW_NUMBER() OVER (
            |      PARTITION BY q.qid
            |      ORDER BY round(${cosineSql("c.v", "q.qv")}, 6) DESC,
            |        c.vec_id) AS rk
            |    FROM c CROSS JOIN q) t WHERE rk <= 5),
            |cov AS (
            |  SELECT CAST(count(DISTINCT vec_id) AS BIGINT) AS n_rec,
            |    CAST((SELECT count(*) FROM c) AS BIGINT) AS n_corpus
            |  FROM res),
            |prs AS (
            |  SELECT a.qid,
            |    round(1 - round(${cosineSql("ea.v", "eb.v")}, 6), 6) AS dist
            |  FROM res a JOIN res b
            |    ON a.qid = b.qid AND a.vec_id < b.vec_id
            |  JOIN c ea ON ea.vec_id = a.vec_id
            |  JOIN c eb ON eb.vec_id = b.vec_id),
            |ild AS (
            |  SELECT round(CAST(sum(CAST(dist AS DECIMAL(18,6)))
            |    AS DOUBLE) / count(*), 6) AS mean_ild,
            |    CAST(count(*) AS BIGINT) AS n_pairs
            |  FROM prs)
            |SELECT n_corpus, n_rec,
            |  round(CAST(n_rec AS DOUBLE) / n_corpus, 6) AS coverage,
            |  n_pairs, mean_ild
            |FROM cov CROSS JOIN ild""".stripMargin),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables.embeddings(s, d)
        .withColumn("v", col("embedding").cast("array<double>"))
      val q = e.filter(col("vec_id") < 30)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      val c = e.filter(col("vec_id") >= 30).select("vec_id", "v")
      val wq = Window.partitionBy("qid")
        .orderBy(col("sim").desc, col("vec_id"))
      val res = graft.operators.PlanCache.persist(
        c.crossJoin(broadcast(q))
          .select(col("qid"), col("vec_id"),
            round(cosine(col("v"), col("qv")), 6).as("sim"))
          .withColumn("rk", row_number().over(wq))
          .filter(col("rk") <= 5).select("qid", "vec_id"))
      val nCorpus = c.agg(count(lit(1)).as("n_corpus"))
      val cov = res.agg(countDistinct("vec_id").as("n_rec"))
        .crossJoin(broadcast(nCorpus))
      val ea = c.select(col("vec_id").as("ia"), col("v").as("va"))
      val eb = c.select(col("vec_id").as("ib"), col("v").as("vb"))
      val prs = res.select(col("qid"), col("vec_id").as("ia"))
        .join(res.select(col("qid"), col("vec_id").as("ib")), Seq("qid"))
        .filter(col("ia") < col("ib"))
        .join(broadcast(ea), Seq("ia")).join(broadcast(eb), Seq("ib"))
        .select(round(lit(1) -
          round(cosine(col("va"), col("vb")), 6), 6).as("dist"))
      val ild = prs.agg(
        round(sum(col("dist").cast("decimal(18,6)")).cast("double") /
          count(lit(1)), 6).as("mean_ild"),
        count(lit(1)).as("n_pairs"))
      cov.crossJoin(broadcast(ild))
        .select(col("n_corpus"), col("n_rec"),
          round(col("n_rec").cast("double") / col("n_corpus"), 6)
            .as("coverage"),
          col("n_pairs"), col("mean_ild"))
    })

  /** Hubness audit — the high-dimensional ANN pathology where a few
    * "hub" vectors appear in everyone's neighbor lists: the
    * k-occurrence distribution (how often each corpus vector shows up
    * across the batch's exact top-5 lists, zeros included) summarized
    * as max occurrence, occupancy, and the moment skewness of the
    * counts — rising skew is the canonical hubness signal. Occurrence
    * counts come from the same one-pass result build as q334; the
    * zero-including moments use COUNT totals, never a zero-filled
    * join. */
  val q335_hubness = Q(
    "q335_hubness",
    Some(s"""WITH e AS (
            |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 30),
            |c AS (SELECT vec_id, v FROM e WHERE vec_id >= 30),
            |res AS (
            |  SELECT qid, vec_id FROM (
            |    SELECT q.qid, c.vec_id, ROW_NUMBER() OVER (
            |      PARTITION BY q.qid
            |      ORDER BY round(${cosineSql("c.v", "q.qv")}, 6) DESC,
            |        c.vec_id) AS rk
            |    FROM c CROSS JOIN q) t WHERE rk <= 5),
            |occ AS (
            |  SELECT vec_id, CAST(count(*) AS BIGINT) AS k
            |  FROM res GROUP BY vec_id),
            |m AS (
            |  SELECT CAST((SELECT count(*) FROM c) AS BIGINT) AS n,
            |    CAST((SELECT count(*) FROM occ) AS BIGINT) AS n_hit,
            |    CAST((SELECT max(k) FROM occ) AS BIGINT) AS max_occ,
            |    CAST((SELECT sum(k) FROM occ) AS BIGINT) AS s1,
            |    CAST((SELECT sum(k * k) FROM occ) AS BIGINT) AS s2,
            |    CAST((SELECT sum(k * k * k) FROM occ) AS BIGINT) AS s3)
            |SELECT n AS n_corpus, n_hit, max_occ,
            |  round(CAST(n_hit AS DOUBLE) / n, 6) AS occupancy,
            |  round((CAST(s3 AS DOUBLE) / n
            |      - 3.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n
            |        - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
            |      - pow(CAST(s1 AS DOUBLE) / n, 3))
            |    / pow(CAST(s2 AS DOUBLE) / n
            |      - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n),
            |      1.5), 6) AS skewness
            |FROM m""".stripMargin),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables.embeddings(s, d)
        .withColumn("v", col("embedding").cast("array<double>"))
      val q = e.filter(col("vec_id") < 30)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      val c = e.filter(col("vec_id") >= 30).select("vec_id", "v")
      val wq = Window.partitionBy("qid")
        .orderBy(col("sim").desc, col("vec_id"))
      val occ = c.crossJoin(broadcast(q))
        .select(col("qid"), col("vec_id"),
          round(cosine(col("v"), col("qv")), 6).as("sim"))
        .withColumn("rk", row_number().over(wq))
        .filter(col("rk") <= 5)
        .groupBy("vec_id").agg(count(lit(1)).as("k"))
      val mo = occ.agg(count(lit(1)).as("n_hit"),
        max("k").cast("long").as("max_occ"),
        sum("k").cast("long").as("s1"),
        sum(col("k") * col("k")).cast("long").as("s2"),
        sum(col("k") * col("k") * col("k")).cast("long").as("s3"))
      val n = c.agg(count(lit(1)).as("n"))
      val m1 = col("s1").cast("double") / col("n")
      val m2 = col("s2").cast("double") / col("n")
      val m3 = col("s3").cast("double") / col("n")
      val variance = m2 - m1 * m1
      mo.crossJoin(broadcast(n))
        .select(col("n").as("n_corpus"), col("n_hit"), col("max_occ"),
          round(col("n_hit").cast("double") / col("n"), 6).as("occupancy"),
          round((m3 - lit(3.0) * m1 * variance - pow(m1, 3)) /
            pow(variance, 1.5), 6).as("skewness"))
    })

  /** Hard-negative mining for contrastive training — per anchor, the
    * nearest SAME-label vector (the positive a batch would use) and the
    * nearest DIFFERENT-label vector (the hard negative), with the
    * margin between them; anchors ordered hardest-first (smallest
    * margin), the exact mining pass an embedding-finetune data pipeline
    * runs. One corpus pass (broadcast anchors), two label-gated rank-1
    * windows on candidates only. */
  val q337_hard_negatives = Q(
    "q337_hard_negatives",
    Some(s"""WITH e AS (
            |  SELECT vec_id, label, embedding::DOUBLE[] AS v
            |  FROM embeddings),
            |a AS (SELECT vec_id AS qid, label AS qlabel, v AS qv FROM e
            |      WHERE vec_id < 20),
            |c AS (SELECT vec_id, label, v FROM e WHERE vec_id >= 20),
            |cand AS (
            |  SELECT a.qid, a.qlabel, c.vec_id, c.label,
            |    round(${cosineSql("c.v", "a.qv")}, 6) AS sim
            |  FROM c CROSS JOIN a),
            |pos AS (
            |  SELECT qid, vec_id AS pos_id, sim AS pos_sim FROM (
            |    SELECT qid, vec_id, sim, ROW_NUMBER() OVER (
            |      PARTITION BY qid ORDER BY sim DESC, vec_id) AS rk
            |    FROM cand WHERE label = qlabel) t WHERE rk = 1),
            |neg AS (
            |  SELECT qid, vec_id AS neg_id, sim AS neg_sim FROM (
            |    SELECT qid, vec_id, sim, ROW_NUMBER() OVER (
            |      PARTITION BY qid ORDER BY sim DESC, vec_id) AS rk
            |    FROM cand WHERE label <> qlabel) t WHERE rk = 1)
            |SELECT a.qid, CAST(a.qlabel AS BIGINT) AS label,
            |  pos_id, pos_sim, neg_id, neg_sim,
            |  round(pos_sim - neg_sim, 6) AS margin
            |FROM a JOIN pos ON pos.qid = a.qid
            |JOIN neg ON neg.qid = a.qid
            |ORDER BY margin, a.qid""".stripMargin),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables.embeddings(s, d)
        .withColumn("v", col("embedding").cast("array<double>"))
      val a = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("label").as("qlabel"),
          col("v").as("qv"))
      val c = e.filter(col("vec_id") >= 20).select("vec_id", "label", "v")
      val cand = graft.operators.PlanCache.persist(
        c.crossJoin(broadcast(a))
          .select(col("qid"), col("qlabel"), col("vec_id"), col("label"),
            round(cosine(col("v"), col("qv")), 6).as("sim")))
      val wq = Window.partitionBy("qid")
        .orderBy(col("sim").desc, col("vec_id"))
      val pos = cand.filter(col("label") === col("qlabel"))
        .withColumn("rk", row_number().over(wq)).filter(col("rk") === 1)
        .select(col("qid"), col("vec_id").as("pos_id"),
          col("sim").as("pos_sim"))
      val neg = cand.filter(col("label") =!= col("qlabel"))
        .withColumn("rk", row_number().over(wq)).filter(col("rk") === 1)
        .select(col("qid"), col("vec_id").as("neg_id"),
          col("sim").as("neg_sim"))
      a.join(pos, "qid").join(neg, "qid")
        .select(col("qid"), col("qlabel").cast("long").as("label"),
          col("pos_id"), col("pos_sim"), col("neg_id"), col("neg_sim"),
          round(col("pos_sim") - col("neg_sim"), 6).as("margin"))
        .orderBy(col("margin"), col("qid"))
    })

  /** Deterministic k-means++ style initialization by FARTHEST-POINT
    * (maximin) traversal: seed with the lowest corpus id, then three
    * times pick the vector maximizing its min cosine-distance to the
    * chosen set — the spread-out init that beats random seeding for the
    * q57/q240 IVF training, made deterministic (maximin is the
    * derandomized k-means++). Each pick is one corpus scan against a
    * ≤4-row broadcast chosen set + a 1-row TakeOrdered fetch (the
    * TextOps7 bounded-fetch regime); the final row reports the
    * mean min-distance under the 4 centers (init quality). */
  val q342_maximin_init = Q(
    "q342_maximin_init", {
      def pick(i: Int, chosen: String) =
        s"""d$i AS (
           |  SELECT c.vec_id,
           |    min(round(1 - round(${cosineSql("c.v", "ch.v")}, 6), 6))
           |      AS mind
           |  FROM c CROSS JOIN $chosen ch GROUP BY c.vec_id),
           |p$i AS (
           |  SELECT $i AS pick_order, vec_id, mind FROM d$i
           |  WHERE vec_id NOT IN (SELECT vec_id FROM $chosen)
           |  ORDER BY mind DESC, vec_id LIMIT 1),
           |ch$i AS (
           |  SELECT ch.vec_id, ch.v FROM $chosen ch
           |  UNION ALL
           |  SELECT p.vec_id, c.v FROM p$i p JOIN c ON c.vec_id = p.vec_id)"""
          .stripMargin
      Some(s"""WITH e AS (
              |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
              |c AS (SELECT vec_id, v FROM e WHERE vec_id >= 30),
              |ch0 AS (SELECT vec_id, v FROM c
              |        ORDER BY vec_id LIMIT 1),
              |${pick(1, "ch0")},
              |${pick(2, "ch1")},
              |${pick(3, "ch2")},
              |q AS (
              |  SELECT round(CAST(sum(CAST(mind AS DECIMAL(18,6)))
              |    AS DOUBLE) / count(*), 6) AS mean_mind
              |  FROM (SELECT c.vec_id,
              |          min(round(1 - round(${cosineSql("c.v", "ch.v")}, 6),
              |            6)) AS mind
              |        FROM c CROSS JOIN ch3 ch GROUP BY c.vec_id) t)
              |SELECT * FROM (
              |  SELECT CAST(0 AS BIGINT) AS pick_order,
              |    (SELECT vec_id FROM ch0) AS vec_id,
              |    CAST(NULL AS DOUBLE) AS maximin_dist,
              |    (SELECT mean_mind FROM q) AS mean_mind_final
              |  UNION ALL
              |  SELECT CAST(pick_order AS BIGINT), vec_id, mind,
              |    (SELECT mean_mind FROM q) FROM p1
              |  UNION ALL
              |  SELECT CAST(pick_order AS BIGINT), vec_id, mind,
              |    (SELECT mean_mind FROM q) FROM p2
              |  UNION ALL
              |  SELECT CAST(pick_order AS BIGINT), vec_id, mind,
              |    (SELECT mean_mind FROM q) FROM p3) t
              |ORDER BY pick_order""".stripMargin)
    },
    (s, d) => {
      val e = Tables.embeddings(s, d)
        .withColumn("v", col("embedding").cast("array<double>"))
      val c = graft.operators.PlanCache.persist(
        e.filter(col("vec_id") >= 30).select("vec_id", "v"))
      val ch0 = c.orderBy("vec_id").limit(1)
      // per-row distance over the broadcast chosen set; the group-min
      // collapses the |chosen| copies
      def minDist2(chosen: DataFrame) = c.crossJoin(broadcast(chosen
          .select(col("vec_id").as("cid"), col("v").as("cv"))))
        .select(col("vec_id"),
          round(lit(1) - round(cosine(col("v"), col("cv")), 6), 6)
            .as("d1"))
        .groupBy("vec_id").agg(min("d1").as("mind"))
      def pick(i: Int, chosen: DataFrame) = {
        val d = minDist2(chosen)
        val p = d.join(chosen.select(col("vec_id")), Seq("vec_id"),
            "left_anti")
          .orderBy(col("mind").desc, col("vec_id")).limit(1)
          .select(lit(i.toLong).as("pick_order"), col("vec_id"),
            col("mind"))
        val next = chosen.select("vec_id", "v")
          .union(p.join(c, "vec_id").select(col("vec_id"), col("v")))
        (graft.operators.PlanCache.persist(p),
          graft.operators.PlanCache.persist(next))
      }
      val (p1, ch1) = pick(1, ch0)
      val (p2, ch2) = pick(2, ch1)
      val (p3, ch3) = pick(3, ch2)
      val q = minDist2(ch3)
        .agg(round(sum(col("mind").cast("decimal(18,6)")).cast("double") /
          count(lit(1)), 6).as("mean_mind"))
      val rows = ch0.select(lit(0L).as("pick_order"), col("vec_id"),
          lit(null).cast("double").as("maximin_dist"))
        .union(p1.select(col("pick_order"), col("vec_id"),
          col("mind").as("maximin_dist")))
        .union(p2.select(col("pick_order"), col("vec_id"), col("mind")))
        .union(p3.select(col("pick_order"), col("vec_id"), col("mind")))
      rows.crossJoin(broadcast(q))
        .select(col("pick_order"), col("vec_id"), col("maximin_dist"),
          col("mean_mind").as("mean_mind_final"))
        .orderBy("pick_order")
    })

  val all: Seq[Q] = Seq(q281_mmr_rerank, q282_hamming_rerank,
    q283_matryoshka_recall, q302_ann_mrr, q314_filtered_ann,
    q323_ivf_nlist_planner, q326_maxsim_retrieval, q328_dedup_threshold_cal,
    q334_rec_coverage_ild, q335_hubness, q337_hard_negatives,
    q342_maximin_init)
}
