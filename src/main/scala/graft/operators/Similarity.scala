package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Reusable similarity-search operators over an embedding frame — the
  * library API behind catalog queries q38/q39/q41 (SURVEY.md §2.11).
  * `vecCol` must be array<double> (cast float embeddings first).
  */
object Similarity {

  /** Brute-force cosine top-k against a 1-row query frame (broadcast):
    * plans as a broadcast cross join + TakeOrderedAndProject — no shuffle
    * of the corpus at any scale. Returns the non-vector input columns
    * plus `sim` (rounded to 6). */
  def cosineTopK(corpus: DataFrame, vecCol: String,
      query: DataFrame, queryVecCol: String,
      k: Int, idCol: String): DataFrame = {
    val keep = corpus.columns.filter(_ != vecCol)
    corpus.crossJoin(broadcast(query.select(col(queryVecCol).as("__qe"))))
      .select(keep.map(col) :+
        round(cosine(col(vecCol), col("__qe")), 6).as("sim"): _*)
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** Sign-LSH bucket assignment (scan-side expression, no shuffle). */
  def withLshBucket(df: DataFrame, vecCol: String,
      planes: Array[Array[Double]], bucketCol: String = "bucket"): DataFrame =
    df.withColumn(bucketCol, lshBucket(col(vecCol), planes))

  /** Multi-probe ANN top-k: search the query's bucket plus all hamming-1
    * buckets (|planes|+1 probes). The probe list is a broadcast equi-join
    * key — bounded candidates, never a theta join. */
  def annTopK(corpus: DataFrame, vecCol: String,
      query: DataFrame, queryVecCol: String,
      planes: Array[Array[Double]], k: Int, idCol: String): DataFrame = {
    val bucketed = withLshBucket(corpus, vecCol, planes)
    val q = withLshBucket(query.select(col(queryVecCol).as("__qe")), "__qe", planes, "qb")
    val probeXors = 0L +: (0 until planes.length).map(1L << _)
    val probes = q.select(col("__qe"),
      explode(array(probeXors.map(x => col("qb").bitwiseXOR(lit(x))): _*)).as("bucket"))
    val keep = corpus.columns.filter(_ != vecCol)
    bucketed.join(broadcast(probes), Seq("bucket"))
      .select(keep.map(col) :+
        round(cosine(col(vecCol), col("__qe")), 6).as("sim"): _*)
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** IVF-style ANN: assign every vector to its nearest centroid (argmax
    * cosine, tie-broken by centroid id), then search only the query's
    * nProbe nearest clusters. Centroids are a broadcast dimension; the
    * assignment is a scan-side expression pipeline + one ranking window —
    * the cluster equi-join carries the only data shuffle. (A production
    * IVF trains centroids with k-means; the assignment/probe machinery —
    * the distributed part — is identical, so callers pass any centroid
    * frame (cid, cvec).) */
  def ivfTopK(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, cidCol: String, cvecCol: String,
      query: DataFrame, queryVecCol: String,
      k: Int, nProbe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = broadcast(centroids.select(col(cidCol).as("__cid"), col(cvecCol).as("__cvec")))
    def assign(df: DataFrame, vec: String): DataFrame = {
      val w = Window.partitionBy(col("__aid"))
        .orderBy(col("__csim").desc, col("__cid").asc)
      df.crossJoin(c)
        .withColumn("__csim", round(cosine(col(vec), col("__cvec")), 6))
        .withColumn("__rank", row_number().over(w))
        .drop("__cvec")
    }
    val assigned = assign(corpus.withColumn("__aid", col(idCol)), vecCol)
      .filter(col("__rank") === 1)
      .drop("__aid", "__csim", "__rank")
    val probes = assign(query.select(col(queryVecCol).as("__qe"), lit(0L).as("__aid")), "__qe")
      .filter(col("__rank") <= nProbe)
      .select(col("__qe"), col("__cid"))
    val keep = corpus.columns.filter(_ != vecCol)
    assigned.join(broadcast(probes), Seq("__cid"))
      .select(keep.map(col) :+
        round(cosine(col(vecCol), col("__qe")), 6).as("sim"): _*)
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** Cosine near-duplicate pairs within shared LSH buckets: the bucket
    * equi-join carries the shuffle; cosine verifies in-bucket candidates
    * only. Returns (id_a, id_b, sim ≥ threshold). */
  def nearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
      planes: Array[Array[Double]], threshold: Double): DataFrame = {
    val bucketed = withLshBucket(corpus, vecCol, planes)
    val a = bucketed.select(col(idCol).as("vec_a"), col(vecCol).as("__ea"), col("bucket"))
    val b = bucketed.select(col(idCol).as("vec_b"), col(vecCol).as("__eb"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(cosine(col("__ea"), col("__eb")), 6).as("sim"))
      .filter(col("sim") >= threshold)
  }
}
