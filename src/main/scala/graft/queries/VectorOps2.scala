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

  val all: Seq[Q] = Seq(q56_ann_ivf)
}
