package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFunctions._

/** Vector ops, part 2: IVF-style ANN (the second scale path next to
  * sign-LSH q39). Centroids here are the deterministic first-16 vectors —
  * a k-means stand-in that keeps the query oracle-checkable; the
  * distributed assignment/probe machinery is the real thing
  * (operators/Similarity.ivfTopK). */
object VectorOps2 {

  private val NCentroids = 16
  private val NProbe = 2

  val q56_ann_ivf = Q(
    "q56_ann_ivf",
    Some(s"""WITH e AS (
            |  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
            |cent AS (
            |  SELECT vec_id AS cid, v AS cvec FROM e WHERE vec_id < $NCentroids),
            |assign AS (
            |  SELECT vec_id, label, v, cid,
            |         ROW_NUMBER() OVER (PARTITION BY vec_id
            |           ORDER BY round(${cosineSql("v", "cvec")}, 6) DESC, cid) AS rnk
            |  FROM e CROSS JOIN cent),
            |members AS (
            |  SELECT vec_id, label, v, cid FROM assign WHERE rnk = 1),
            |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
            |qprobe AS (
            |  SELECT cid FROM (
            |    SELECT cid, ROW_NUMBER() OVER (
            |      ORDER BY round(${cosineSql("qv", "cvec")}, 6) DESC, cid) AS rnk
            |    FROM q CROSS JOIN cent) t
            |  WHERE rnk <= $NProbe)
            |SELECT m.vec_id, m.label, round(${cosineSql("m.v", "qv")}, 6) AS sim
            |FROM members m
            |  JOIN qprobe p ON m.cid = p.cid
            |  CROSS JOIN q
            |WHERE m.vec_id <> 0
            |ORDER BY sim DESC, vec_id
            |LIMIT 5""".stripMargin),
    (s, d) => {
      val emb = Tables.embeddings(s, d)
        .withColumn("e", col("embedding").cast("array<double>"))
      graft.operators.Similarity.ivfTopK(
        emb.filter(col("vec_id") =!= 0).select("vec_id", "label", "e"),
        "vec_id", "e",
        emb.filter(col("vec_id") < NCentroids)
          .select(col("vec_id").as("cid"), col("e").as("cvec")),
        "cid", "cvec",
        emb.filter(col("vec_id") === 0), "e",
        k = 5, nProbe = NProbe)
    })

  /** IVF cell-balance audit over the q56 index: per cell, population and
    * cosine-distance dispersion to the assigned centroid — the report
    * that decides whether the cell layout needs re-training (hot cell ⇒
    * nProbe search degrades to brute force) or fewer probe slots (empty
    * cells). Assignment is the identical scan-side argmax the serving
    * path uses, so the audit measures the REAL index, not a replica. */
  val q217_ivf_balance = Q(
    "q217_ivf_balance",
    Some(s"""WITH e AS (
            |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            |cent AS (
            |  SELECT vec_id AS cid, v AS cvec FROM e WHERE vec_id < $NCentroids),
            |assign AS (
            |  SELECT vec_id, cid, round(${cosineSql("v", "cvec")}, 6) AS sim,
            |         ROW_NUMBER() OVER (PARTITION BY vec_id
            |           ORDER BY round(${cosineSql("v", "cvec")}, 6) DESC, cid) AS rnk
            |  FROM e CROSS JOIN cent),
            |members AS (SELECT vec_id, cid, sim FROM assign WHERE rnk = 1)
            |SELECT cid, CAST(count(*) AS BIGINT) AS n,
            |  round(CAST(sum(CAST(1 - sim AS DECIMAL(18,6))) AS DOUBLE)
            |    / count(*), 6) AS mean_dist,
            |  round(max(1 - sim), 6) AS max_dist
            |FROM members GROUP BY cid ORDER BY cid""".stripMargin),
    (s, d) => {
      val emb = Tables.embeddings(s, d)
        .withColumn("e", col("embedding").cast("array<double>"))
      graft.operators.Similarity.ivfCellProfile(
        emb.select("vec_id", "e"), "e",
        emb.filter(col("vec_id") < NCentroids)
          .select(col("vec_id").as("cid"), col("e").as("cvec")),
        "cid", "cvec")
    })

  private val KTrained = 8
  private val Iters = 2

  /** One replayed k-means iteration: assign (argmax rounded cosine, ties to
    * lowest cid) then per-dimension decimal-exact means — the SQL mirror of
    * Similarity.trainCentroids' loop body. Assignment CTEs a/m are also
    * reused for the final corpus assignment (iteration without the mean
    * update). */
  private def kmeansIterSql(i: Int): String =
    s"""a$i AS (
       |  SELECT e.vec_id, e.label, e.v, cid,
       |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |      ORDER BY round(${cosineSql("e.v", "cvec")}, 6) DESC, cid) AS rnk
       |  FROM e CROSS JOIN c$i),
       |m$i AS (SELECT vec_id, label, v, cid FROM a$i WHERE rnk = 1),
       |d$i AS (
       |  SELECT cid, i,
       |    CAST(sum(CAST(v[i] AS DECIMAL(28,10))) AS DOUBLE) / count(*) AS m
       |  FROM m$i CROSS JOIN generate_series(1, $Dim) t(i)
       |  GROUP BY cid, i),
       |c${i + 1} AS (SELECT cid, list(m ORDER BY i) AS cvec FROM d$i GROUP BY cid),""".stripMargin

  /** IVF over k-means-TRAINED centroids (Lloyd's, $Iters iterations,
    * decimal-exact means ⇒ bit-deterministic) — the oracle replays the
    * identical training loop in SQL, so the trained index itself is
    * hash-checked, not just the probe machinery. */
  val q57_ann_ivf_trained = Q(
    "q57_ann_ivf_trained",
    Some(s"""WITH e AS (
            |  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
            |c0 AS (
            |  SELECT vec_id AS cid, v AS cvec FROM e
            |  ORDER BY vec_id LIMIT $KTrained),
            |${(0 until Iters).map(kmeansIterSql).mkString("\n")}
            |${kmeansIterSql(Iters).stripSuffix(",")}
            |SELECT m.vec_id, m.label, round(${cosineSql("m.v", "qv")}, 6) AS sim
            |FROM m$Iters m
            |  JOIN (
            |    SELECT cid FROM (
            |      SELECT cid, ROW_NUMBER() OVER (
            |        ORDER BY round(${cosineSql("qv", "cvec")}, 6) DESC, cid) AS rnk
            |      FROM (SELECT v AS qv FROM e WHERE vec_id = 0) q
            |        CROSS JOIN c$Iters) t
            |    WHERE rnk <= $NProbe) p ON m.cid = p.cid
            |  CROSS JOIN (SELECT v AS qv FROM e WHERE vec_id = 0) q
            |WHERE m.vec_id <> 0
            |ORDER BY sim DESC, vec_id
            |LIMIT 5""".stripMargin),
    (s, d) => {
      val emb = Tables.embeddings(s, d)
        .withColumn("e", col("embedding").cast("array<double>"))
      val cents = graft.operators.Similarity.trainCentroids(
        emb.select("vec_id", "e"), "vec_id", "e",
        k = KTrained, iters = Iters, dim = Dim)
      graft.operators.Similarity.ivfTopK(
        emb.filter(col("vec_id") =!= 0).select("vec_id", "label", "e"),
        "vec_id", "e",
        cents, "cid", "cvec",
        emb.filter(col("vec_id") === 0), "e",
        k = 5, nProbe = NProbe)
    })

  private val BatchQ = 8
  private val BatchK = 3

  /** Batched IVF ANN (Similarity.ivfTopKBatch): 8 query vectors served by
    * ONE corpus pass — per-query scans repeat the corpus read |batch|
    * times, so real retrieval amortizes; the only shuffle is the
    * candidate-set window keyed on the query id. Probe set disjoint from
    * the corpus (vec_id < 8 queries, ≥ 8 corpus) so ranks need no
    * self-match exclusion. The oracle replays assignment, probe choice,
    * and the per-query ranking per q56's formulation with a qid
    * partition. */
  val q136_ann_ivf_batch = Q(
    "q136_ann_ivf_batch",
    Some(s"""WITH e AS (
            |  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
            |cent AS (
            |  SELECT vec_id AS cid, v AS cvec FROM e WHERE vec_id < $NCentroids),
            |assign AS (
            |  SELECT vec_id, label, v, cid,
            |         ROW_NUMBER() OVER (PARTITION BY vec_id
            |           ORDER BY round(${cosineSql("v", "cvec")}, 6) DESC, cid) AS rnk
            |  FROM e CROSS JOIN cent WHERE e.vec_id >= $BatchQ),
            |members AS (
            |  SELECT vec_id, label, v, cid FROM assign WHERE rnk = 1),
            |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < $BatchQ),
            |qprobe AS (
            |  SELECT qid, qv, cid FROM (
            |    SELECT qid, qv, cid, ROW_NUMBER() OVER (PARTITION BY qid
            |      ORDER BY round(${cosineSql("qv", "cvec")}, 6) DESC, cid) AS rnk
            |    FROM q CROSS JOIN cent) t
            |  WHERE rnk <= $NProbe),
            |cand AS (
            |  SELECT p.qid, m.vec_id, m.label,
            |    round(${cosineSql("m.v", "p.qv")}, 6) AS sim
            |  FROM members m JOIN qprobe p ON m.cid = p.cid)
            |SELECT qid, CAST(rk AS BIGINT) AS rk, vec_id, label, sim FROM (
            |  SELECT qid, vec_id, label, sim, ROW_NUMBER() OVER (
            |    PARTITION BY qid ORDER BY sim DESC, vec_id) AS rk
            |  FROM cand) t
            |WHERE rk <= $BatchK
            |ORDER BY qid, rk""".stripMargin),
    (s, d) => {
      val emb = Tables.embeddings(s, d)
        .withColumn("e", col("embedding").cast("array<double>"))
      graft.operators.Similarity.ivfTopKBatch(
        emb.filter(col("vec_id") >= BatchQ).select("vec_id", "label", "e"),
        "vec_id", "e",
        emb.filter(col("vec_id") < NCentroids)
          .select(col("vec_id").as("cid"), col("e").as("cvec")),
        "cid", "cvec",
        emb.filter(col("vec_id") < BatchQ)
          .select(col("vec_id").as("qid"), col("e")),
        "qid", "e",
        k = BatchK, nProbe = NProbe)
        .orderBy("qid", "rk")
    })

  private val SemT = 0.3

  /** SemDeDup semantic deduplication (Similarity.semanticDedup): cluster
    * by nearest centroid, then drop any member whose cluster holds a
    * higher-priority member within cosine $SemT — priority keeps the
    * member FARTHEST from its centroid (the paper's diversity rule),
    * ties to the lowest id. Unlike q41's LSH buckets, the candidate
    * structure here is the semantic clustering itself, so the pairwise
    * work is bounded by cluster populations; assignment stays a
    * scan-side packed-broadcast fold, and no transitive closure is
    * needed (the priority rule is a total order — one self-join
    * decides). Oracle replays assignment (q56's idiom, keeping the
    * rnk=1 cosine as csim), the dominance join, and the keep flag. */
  val q150_semantic_dedup = Q(
    "q150_semantic_dedup",
    Some(s"""WITH e AS (
            |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            |cent AS (
            |  SELECT vec_id AS cid, v AS cvec FROM e WHERE vec_id < $NCentroids),
            |assign AS (
            |  SELECT vec_id, v, cid,
            |         round(${cosineSql("v", "cvec")}, 6) AS csim,
            |         ROW_NUMBER() OVER (PARTITION BY vec_id
            |           ORDER BY round(${cosineSql("v", "cvec")}, 6) DESC, cid) AS rnk
            |  FROM e CROSS JOIN cent),
            |m AS (SELECT vec_id, v, cid, csim FROM assign WHERE rnk = 1),
            |dropped AS (
            |  SELECT DISTINCT a.vec_id
            |  FROM m a JOIN m b ON a.cid = b.cid AND a.vec_id <> b.vec_id
            |  WHERE round(${cosineSql("a.v", "b.v")}, 6) >= $SemT
            |    AND (b.csim < a.csim
            |      OR (b.csim = a.csim AND b.vec_id < a.vec_id)))
            |SELECT m.vec_id, m.cid, m.csim,
            |  CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept
            |FROM m LEFT JOIN dropped d ON m.vec_id = d.vec_id
            |ORDER BY m.vec_id""".stripMargin),
    (s, d) => {
      val emb = Tables.embeddings(s, d)
        .withColumn("e", col("embedding").cast("array<double>"))
      graft.operators.Similarity.semanticDedup(
        emb.select("vec_id", "e"), "vec_id", "e",
        emb.filter(col("vec_id") < NCentroids)
          .select(col("vec_id").as("cid"), col("e").as("cvec")),
        "cid", "cvec", threshold = SemT)
        .orderBy("vec_id")
    })

  val all: Seq[Q] = Seq(q56_ann_ivf, q57_ann_ivf_trained, q136_ann_ivf_batch,
    q150_semantic_dedup, q217_ivf_balance)
}
