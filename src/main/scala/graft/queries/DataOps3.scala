package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions.hexSpanValSql

/** Third curation block: the feature-hashing vectorizer ("hashing trick")
  * with an inverted-index sparse cosine join.
  */
object DataOps3 {

  private val HashDim = 4096
  private val CosT = 0.9

  /** Hashing-trick sparse vectors + cosine pairs: each token maps to
    * bucket md5(tok)[0..8) mod 4096 (engine-portable hex arithmetic, no
    * engine hash functions), term frequencies become the sparse vector,
    * and the pair dot product is an inverted-index equi-join on bucket —
    * sum(tf_a·tf_b) in exact integers, norms exact under sqrt. Nothing
    * pairwise ever materializes outside shared buckets; at 100 TB the
    * bucket is the shuffle key and hot buckets (stopword mass) are the
    * knob — raise the dimension or df-prune exactly as an inverted index
    * would. The vectorizer itself is one (doc, bucket) hash agg. */
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
              |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              |    CAST(sum(a.tf * b.tf) AS BIGINT) AS dot
              |  FROM v a JOIN v b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
              |  GROUP BY 1, 2)
              |SELECT doc_a, doc_b, dot,
              |  round(dot / (na.nrm * nb.nrm), 6) AS cosine
              |FROM p
              |JOIN nrm na ON na.doc_id = doc_a
              |JOIN nrm nb ON nb.doc_id = doc_b
              |WHERE dot / (na.nrm * nb.nrm) >= $CosT
              |ORDER BY doc_a, doc_b""".stripMargin)
    },
    (s, d) => {
      val v = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .withColumn("h", md5(col("tok")))
        .withColumn("bucket", expr(s"${hexSpanValSql("h", 0, 8)} % $HashDim"))
        .groupBy("doc_id", "bucket").agg(count(lit(1)).as("tf"))
      val nrm = v.groupBy("doc_id")
        .agg(sqrt(sum(col("tf") * col("tf")).cast("double")).as("nrm"))
      val right = v.toDF("doc_b", "bucket", "tf_b")
      val p = v.toDF("doc_a", "bucket", "tf_a")
        .join(right, "bucket")
        .filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(sum(col("tf_a") * col("tf_b")).as("dot"))
      p.join(nrm.toDF("doc_a", "nrm_a"), "doc_a")
        .join(nrm.toDF("doc_b", "nrm_b"), "doc_b")
        .withColumn("cosine", round(col("dot") / (col("nrm_a") * col("nrm_b")), 6))
        .filter(col("dot") / (col("nrm_a") * col("nrm_b")) >= CosT)
        .select("doc_a", "doc_b", "dot", "cosine")
        .orderBy("doc_a", "doc_b")
    })

  val all: Seq[Q] = Seq(q110_sparse_cosine)
}
