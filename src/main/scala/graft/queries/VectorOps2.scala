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

  private val IncB = 3

  /** One replayed k-means iteration over the TRAINING SLICE e0 only —
    * kmeansIterSql with the corpus swapped for the first batch (the
    * incremental entries train once on batch 0 and never retrain). */
  private def kmeansIterB0Sql(i: Int): String =
    s"""a$i AS (
       |  SELECT e0.vec_id, e0.v, cid,
       |    ROW_NUMBER() OVER (PARTITION BY e0.vec_id
       |      ORDER BY round(${cosineSql("e0.v", "cvec")}, 6) DESC, cid) AS rnk
       |  FROM e0 CROSS JOIN c$i),
       |m$i AS (SELECT vec_id, v, cid FROM a$i WHERE rnk = 1),
       |d$i AS (
       |  SELECT cid, i,
       |    CAST(sum(CAST(v[i] AS DECIMAL(28,10))) AS DOUBLE) / count(*) AS m
       |  FROM m$i CROSS JOIN generate_series(1, $Dim) t(i)
       |  GROUP BY cid, i),
       |c${i + 1} AS (SELECT cid, list(m ORDER BY i) AS cvec FROM d$i GROUP BY cid),""".stripMargin

  /** Shared oracle prefix for the incremental-index entries: train
    * k-means centroids on batch 0 (vec_id ≡ 0 mod $IncB) exactly as
    * Similarity.trainCentroids does, then assign EVERY vector (all
    * batches) to the trained centroids — rnk-1 rounded cosine, ties to
    * the lowest cid, csim kept. */
  private def incAssignSqlPrefix: String =
    s"""WITH e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |e0 AS (SELECT vec_id, v FROM e WHERE vec_id % $IncB = 0),
       |c0 AS (
       |  SELECT vec_id AS cid, v AS cvec FROM e0
       |  ORDER BY vec_id LIMIT $KTrained),
       |${(0 until Iters).map(kmeansIterB0Sql).mkString("\n")}
       |asg AS (
       |  SELECT vec_id, batch, cid, csim FROM (
       |    SELECT e.vec_id, e.vec_id % $IncB AS batch, cid,
       |      round(${cosineSql("e.v", "cvec")}, 6) AS csim,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |        ORDER BY round(${cosineSql("e.v", "cvec")}, 6) DESC, cid) AS rnk
       |    FROM e CROSS JOIN c$Iters) t
       |  WHERE rnk = 1)""".stripMargin

  /** INCREMENTAL ANN index maintenance (VERDICT r7 #4) — the production
    * shape of a growing 100 TB corpus: centroids are trained ONCE on the
    * initial batch (Similarity.trainCentroids on vec_id ≡ 0 mod $IncB,
    * never retrained), and each subsequent batch of new embeddings is
    * assigned to those FIXED centroids (Similarity.assignCells — one
    * scan-side packed-broadcast argmax per row) and appended to the
    * lake-held membership table, materialized between steps
    * (localCheckpoint here; the lake in production — the q170 dedup
    * discipline, now for the similarity family). The entry emits the
    * accumulated membership table; the oracle computes the BATCH
    * assignment of the whole corpus against the same trained centroids,
    * so the driver hash proves incremental-union ≡ batch-index — cell
    * assignment is per-row given fixed centroids, which is exactly why
    * the incremental shape is safe to run forever. */
  val q240_incremental_ivf = Q(
    "q240_incremental_ivf",
    Some(s"""$incAssignSqlPrefix
            |SELECT vec_id, cid, csim FROM asg
            |ORDER BY vec_id""".stripMargin),
    (s, d) => {
      val emb = Tables.embeddings(s, d)
        .withColumn("e", col("embedding").cast("array<double>"))
        .select("vec_id", "e")
      val cents = graft.operators.Similarity.trainCentroids(
        emb.filter(pmod(col("vec_id"), lit(IncB)) === 0), "vec_id", "e",
        k = KTrained, iters = Iters, dim = Dim)
      (0 until IncB).map { b =>
        graft.operators.Similarity.assignCells(
          emb.filter(pmod(col("vec_id"), lit(IncB)) === b), "e",
          cents, "cid", "cvec")
          .select("vec_id", "cid", "csim")
          .localCheckpoint(true) // the per-batch membership append
      }.reduce(_ union _).orderBy("vec_id")
    })

  private val DriftT = 0.15

  /** Embedding-centroid DRIFT monitor (VERDICT r7 #5) — the batch-over-
    * batch health check that tells an incremental index (q240) when its
    * once-trained centroids have gone stale: per (batch, cell), the
    * exact-decimal elementwise mean of the batch's members (the
    * q181 label-cohesion device — per-dim decimal sums, mean rounded
    * once to 12, bit-identical under any partial-agg order), compared
    * to the trained centroid by the round-6 cosine kernel; a cell-batch
    * whose mean has drifted more than $DriftT in cosine distance is
    * flagged. Scale shape: one (batch, cid, dim)-keyed hash agg over
    * the posexploded members (the only corpus-sized shuffle), then
    * everything is grid-sized — the batch mean vectors re-enter as a
    * (batches × cells)-row frame joined to the k-row centroid table. */
  val q241_centroid_drift = Q(
    "q241_centroid_drift",
    Some(s"""$incAssignSqlPrefix,
            |mem AS (
            |  SELECT a.batch, a.cid, e.v
            |  FROM asg a JOIN e ON e.vec_id = a.vec_id),
            |dm AS (
            |  SELECT batch, cid, i,
            |    round(CAST(sum(CAST(v[i] AS DECIMAL(28,12))) AS DOUBLE)
            |      / count(*), 12) AS m
            |  FROM mem CROSS JOIN generate_series(1, $Dim) t(i)
            |  GROUP BY batch, cid, i),
            |mv AS (
            |  SELECT batch, cid, list(m ORDER BY i) AS bvec
            |  FROM dm GROUP BY batch, cid),
            |nm AS (
            |  SELECT batch, cid, CAST(count(*) AS BIGINT) AS n
            |  FROM asg GROUP BY batch, cid)
            |SELECT nm.batch, nm.cid, nm.n,
            |  round(1 - round(${cosineSql("mv.bvec", "cvec")}, 6), 6) AS drift,
            |  CAST(CASE WHEN 1 - round(${cosineSql("mv.bvec", "cvec")}, 6)
            |    > $DriftT THEN 1 ELSE 0 END AS BIGINT) AS drifted
            |FROM nm JOIN mv ON mv.batch = nm.batch AND mv.cid = nm.cid
            |JOIN c$Iters c ON c.cid = nm.cid
            |ORDER BY nm.batch, nm.cid""".stripMargin),
    (s, d) => {
      val emb = Tables.embeddings(s, d)
        .withColumn("e", col("embedding").cast("array<double>"))
        .select("vec_id", "e")
      val cents = graft.operators.Similarity.trainCentroids(
        emb.filter(pmod(col("vec_id"), lit(IncB)) === 0), "vec_id", "e",
        k = KTrained, iters = Iters, dim = Dim)
      val assigned = graft.operators.Similarity.assignCells(
        emb.withColumn("batch", pmod(col("vec_id"), lit(IncB)).cast("long")),
        "e", cents, "cid", "cvec")
      val dm = assigned
        .select(col("batch"), col("cid"), posexplode(col("e")).as(Seq("d0", "x")))
        .groupBy(col("batch"), col("cid"), (col("d0") + 1).as("i"))
        .agg(round(sum(col("x").cast("decimal(28,12)")).cast("double") /
          count(lit(1)), 12).as("m"))
      val mv = dm.groupBy("batch", "cid")
        .agg(expr("transform(array_sort(collect_list(struct(i, m))), p -> p.m)")
          .as("bvec"))
      val nm = assigned.groupBy("batch", "cid")
        .agg(count(lit(1)).as("n"))
      val drift = lit(1) - round(cosine(col("bvec"), col("cvec")), 6)
      nm.join(mv, Seq("batch", "cid"))
        .join(broadcast(cents), "cid")
        .select(col("batch"), col("cid"), col("n"),
          round(drift, 6).as("drift"),
          when(drift > DriftT, 1L).otherwise(0L).as("drifted"))
        .orderBy("batch", "cid")
    })

  val all: Seq[Q] = Seq(q56_ann_ivf, q57_ann_ivf_trained, q136_ann_ivf_batch,
    q150_semantic_dedup, q217_ivf_balance, q240_incremental_ivf,
    q241_centroid_drift)
}
