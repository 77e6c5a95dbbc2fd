package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Round-10 vector additions: two-level residual vector quantization —
  * the faiss IVF-RQ encoding — trained, served, and recall-audited with
  * the whole pipeline replayed by the SQL oracle.
  */
object VectorOps7 {

  private val Dim = 64
  private val K1 = 16 // coarse centroids
  private val K2 = 16 // residual codewords
  private val RecK = 10

  private def l2Sql(a: String, b: String): String =
    s"list_sum(list_transform(generate_series(1, $Dim), " +
      s"i -> ($a[i] - $b[i]) * ($a[i] - $b[i])))"

  /** One replayed L2 Lloyd's iteration over full-dim vectors in CTE
    * `src(id, v)` against codebook `cb$i(cid, cvec)` → `cb${i+1}`; the
    * SQL mirror of `Similarity.trainCentroidsL2` (argmin rounded L2²,
    * ties to lowest cid, per-dimension decimal-exact means). */
  private def rqTrainSql(src: String, tag: String, i: Int): String =
    s"""a$tag$i AS (
       |  SELECT s.id, c.cid, ROW_NUMBER() OVER (PARTITION BY s.id
       |    ORDER BY round(${l2Sql("s.v", "c.cvec")}, 6) ASC, c.cid) AS rn
       |  FROM $src s CROSS JOIN cb$tag$i c),
       |m$tag$i AS (SELECT id, cid FROM a$tag$i WHERE rn = 1),
       |d$tag$i AS (
       |  SELECT cid, j,
       |    CAST(sum(CAST(s.v[j] AS DECIMAL(28,10))) AS DOUBLE) / count(*) AS m
       |  FROM m$tag$i mm JOIN $src s ON s.id = mm.id
       |    CROSS JOIN generate_series(1, $Dim) t(j)
       |  GROUP BY cid, j),
       |cb$tag${i + 1} AS (SELECT cid, list(m ORDER BY j) AS cvec
       |                   FROM d$tag$i GROUP BY cid)""".stripMargin

  /** Residual vector quantization (two-level additive coding, the
    * IVF-RQ cell of faiss): a coarse K1-centroid L2 codebook quantizes
    * each vector, a second K2-codeword codebook — trained on the
    * RESIDUALS v − c₁(v) — refines it, and serving ranks by distance
    * to the additive reconstruction c₁ + c₂ (32 codebook vectors describe
    * K1·K2 = 256 composite cells; vs q87's PQ the codebooks are trained
    * sequentially on what the previous level failed to explain).
    * recall@10 against exact L2 per query over a 16-query batch (the
    * absolute numbers are LOW by construction: the synthetic embeddings
    * are near-isotropic, so 256 composite cells explain little variance
    * — the entry's value is the end-to-end trained-index parity and the
    * honest recall audit, same role as q373's int8 floor); the
    * oracle replays BOTH Lloyd's trainings, both assignments, the
    * reconstruction, and the ranking, so the trained two-level index is
    * hash-checked end to end.
    *
    * Scale shape: training/assignment are scan-side packed-broadcast
    * folds (one corpus pass per Lloyd's iteration per level); ranking
    * windows key on qid over corpus×|batch| rows — the q136 batched
    * serving shape. Residual and reconstruction frames persist once. */
  val q393_residual_quant = Q(
    "q393_residual_quant",
    Some(s"""WITH e AS (
            |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            |corpus AS (SELECT vec_id AS id, v FROM e WHERE vec_id >= $K1),
            |qs AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < $K1),
            |cbc0 AS (SELECT id AS cid, v AS cvec FROM corpus
            |         ORDER BY id LIMIT $K1),
            |${rqTrainSql("corpus", "c", 0)},
            |asg AS (
            |  SELECT id, cid FROM (
            |    SELECT s.id, c.cid, ROW_NUMBER() OVER (PARTITION BY s.id
            |      ORDER BY round(${l2Sql("s.v", "c.cvec")}, 6) ASC, c.cid)
            |      AS rn
            |    FROM corpus s CROSS JOIN cbc1 c) t WHERE rn = 1),
            |res AS (
            |  SELECT s.id,
            |    list_transform(generate_series(1, $Dim),
            |      i -> s.v[i] - c.cvec[i]) AS v
            |  FROM corpus s JOIN asg ON asg.id = s.id
            |  JOIN cbc1 c ON c.cid = asg.cid),
            |cbf0 AS (SELECT id AS cid, v AS cvec FROM res
            |         ORDER BY id LIMIT $K2),
            |${rqTrainSql("res", "f", 0)},
            |fas AS (
            |  SELECT id, cid AS fid FROM (
            |    SELECT s.id, c.cid, ROW_NUMBER() OVER (PARTITION BY s.id
            |      ORDER BY round(${l2Sql("s.v", "c.cvec")}, 6) ASC, c.cid)
            |      AS rn
            |    FROM res s CROSS JOIN cbf1 c) t WHERE rn = 1),
            |recon AS (
            |  SELECT asg.id,
            |    list_transform(generate_series(1, $Dim),
            |      i -> c1.cvec[i] + c2.cvec[i]) AS rv
            |  FROM asg JOIN fas ON fas.id = asg.id
            |  JOIN cbc1 c1 ON c1.cid = asg.cid
            |  JOIN cbf1 c2 ON c2.cid = fas.fid),
            |exact AS (
            |  SELECT qid, id FROM (
            |    SELECT q.qid, s.id, ROW_NUMBER() OVER (PARTITION BY q.qid
            |      ORDER BY round(${l2Sql("s.v", "q.qv")}, 6) ASC, s.id) AS rk
            |    FROM corpus s CROSS JOIN qs q) t WHERE rk <= $RecK),
            |approx AS (
            |  SELECT qid, id FROM (
            |    SELECT q.qid, r.id, ROW_NUMBER() OVER (PARTITION BY q.qid
            |      ORDER BY round(${l2Sql("r.rv", "q.qv")}, 6) ASC, r.id) AS rk
            |    FROM recon r CROSS JOIN qs q) t WHERE rk <= $RecK)
            |SELECT x.qid,
            |  round(CAST(count(a.id) AS DOUBLE) / $RecK, 2) AS recall
            |FROM exact x LEFT JOIN approx a
            |  ON a.qid = x.qid AND a.id = x.id
            |GROUP BY x.qid
            |ORDER BY x.qid""".stripMargin),
    (s, d) => {
      val sim = graft.operators.Similarity
      // native L2Sq kernel — bit-identical to the zipped lambda fold
      // (same index-order additions; see functions.L2Sq)
      def l2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
        val br = org.apache.spark.sql.GraftBridge
        br.column(graft.functions.L2Sq(br.expression(a), br.expression(b)))
      }
      val e = Tables.embeddings(s, d)
        .withColumn("v", col("embedding").cast("array<double>"))
      val corpus = graft.operators.PlanCache.persist(
        e.filter(col("vec_id") >= K1)
          .select(col("vec_id").as("id"), col("v")))
      val qs = e.filter(col("vec_id") < K1)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      val cb1 = sim.trainCentroidsL2(corpus, "id", "v", K1, 1)
      val res = graft.operators.PlanCache.persist(
        sim.assignCellsL2(corpus, "v", cb1, "cid", "cvec")
          .join(broadcast(cb1), "cid")
          .select(col("id"), col("cid").as("c1"),
            zip_with(col("v"), col("cvec"), (a, b) => a - b).as("r")))
      val fb1 = sim.trainCentroidsL2(
        res.select(col("id"), col("r").as("v")), "id", "v", K2, 1)
      val recon = graft.operators.PlanCache.persist(
        sim.assignCellsL2(res, "r", fb1, "cid", "cvec")
          .join(broadcast(cb1.toDF("c1", "cv1")), "c1")
          .join(broadcast(fb1.toDF("fid", "cv2")),
            col("cid") === col("fid"))
          .select(col("id"),
            zip_with(col("cv1"), col("cv2"), (a, b) => a + b).as("rv")))
      def topk(frame: org.apache.spark.sql.DataFrame, vc: String) = {
        val w = Window.partitionBy("qid")
          .orderBy(round(l2(col(vc), col("qv")), 6).asc, col("id"))
        frame.crossJoin(broadcast(qs))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= RecK)
          .select("qid", "id")
      }
      val exact = topk(corpus.select(col("id"), col("v")), "v")
      val approx = topk(recon, "rv")
      exact.toDF("qid", "id")
        .join(approx.toDF("qid", "id").withColumn("hit", lit(1)),
          Seq("qid", "id"), "left")
        .groupBy("qid")
        .agg(round(sum(coalesce(col("hit"), lit(0))).cast("double") / RecK, 2)
          .as("recall"))
        .orderBy("qid")
    })

  val all: Seq[Q] = Seq(q393_residual_quant)
}
