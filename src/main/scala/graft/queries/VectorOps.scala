package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFunctions._

/** Similarity search + embedding analytics over the embeddings table
  * (SURVEY.md §2.11): brute-force cosine top-k (the correctness baseline),
  * sign-LSH bucketed ANN (the scale path), embedding statistics, and
  * cosine near-duplicate pairs within LSH buckets.
  *
  * Scale shape: bucket assignment is a scan-side expression (no shuffle);
  * the ANN search broadcasts the 1-row query side; the near-dup join
  * shuffles on bucket id only. Brute force stays as TakeOrderedAndProject
  * (per-partition heaps, k·P driver merge).
  */
object VectorOps {

  private[queries] val Planes8 = hyperplanes(8)

  /** Brute-force cosine top-10 against the vec_id=0 query vector. */
  val q38_cosine_topk = Q(
    "q38_cosine_topk",
    Some(s"""WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
            |e AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id <> 0)
            |SELECT vec_id, label, round(${cosineSql("e", "qe")}, 6) AS sim
            |FROM e CROSS JOIN q
            |ORDER BY sim DESC, vec_id
            |LIMIT 10""".stripMargin),
    (s, d) => {
      val emb = Tables.embeddings(s, d)
        .withColumn("e", col("embedding").cast("array<double>"))
      graft.operators.Similarity.cosineTopK(
        emb.filter(col("vec_id") =!= 0).select("vec_id", "label", "e"), "e",
        emb.filter(col("vec_id") === 0), "e",
        k = 10, idCol = "vec_id")
    })

  /** Sign-LSH ANN with multi-probe: search the query's bucket plus all
    * hamming-1 buckets (9 probes over 256 buckets ⇒ ~9/256 of the data).
    * Multi-probe recovers most of the recall single-bucket LSH loses on
    * near-uniform data, at a bounded candidate-set cost; the probe list is
    * a broadcast equi-join key — never a theta join. */
  val q39_ann_lsh = Q(
    "q39_ann_lsh", {
      val probeXors = 0L +: (0 until Planes8.length).map(1L << _)
      Some(s"""WITH b AS (
            |  SELECT vec_id, label, embedding::DOUBLE[] AS e,
            |         ${lshBucketSql("(embedding::DOUBLE[])", Planes8)} AS bucket
            |  FROM embeddings),
            |q AS (SELECT e AS qe, bucket AS qb FROM b WHERE vec_id = 0),
            |probes AS (
            |  SELECT qe, unnest([${probeXors.map(x => s"xor(qb, $x)").mkString(", ")}]) AS bucket
            |  FROM q)
            |SELECT vec_id, label, round(${cosineSql("e", "qe")}, 6) AS sim
            |FROM b JOIN probes USING (bucket)
            |WHERE vec_id <> 0
            |ORDER BY sim DESC, vec_id
            |LIMIT 5""".stripMargin)
    },
    (s, d) => {
      val emb = Tables.embeddings(s, d)
        .withColumn("e", col("embedding").cast("array<double>"))
      graft.operators.Similarity.annTopK(
        emb.filter(col("vec_id") =!= 0).select("vec_id", "label", "e"), "e",
        emb.filter(col("vec_id") === 0), "e",
        Planes8, k = 5, idCol = "vec_id")
    })

  /** Embedding statistics per label: exact-decimal averaged norms. */
  val q40_embedding_norms = Q(
    "q40_embedding_norms",
    Some(s"""SELECT label, count(*) AS n,
            |  CAST(CAST(sum(CAST(sqrt(${dotSql("(embedding::DOUBLE[])", "(embedding::DOUBLE[])")}) AS DECIMAL(28,12))) AS DOUBLE) / count(*) AS DOUBLE) AS avg_norm,
            |  round(max(sqrt(${dotSql("(embedding::DOUBLE[])", "(embedding::DOUBLE[])")})), 6) AS max_norm
            |FROM embeddings
            |GROUP BY label
            |ORDER BY label""".stripMargin),
    (s, d) => {
      val e = col("embedding").cast("array<double>")
      val norm = sqrt(dot(e, e))
      Tables.embeddings(s, d)
        .groupBy("label")
        .agg(count(lit(1)).as("n"),
          (sum(norm.cast("decimal(28,12)")).cast("double") / count(lit(1)))
            .cast("double").as("avg_norm"),
          round(max(norm), 6).as("max_norm"))
        .orderBy("label")
    })

  /** Embedding-cosine near-duplicate pairs within shared LSH buckets —
    * the scalable near-dup shape: bucket equi-join carries the shuffle,
    * cosine verifies only in-bucket candidates. */
  val q41_dedup_embedding = Q(
    "q41_dedup_embedding",
    Some(s"""WITH b AS (
            |  SELECT vec_id, embedding::DOUBLE[] AS e,
            |         ${lshBucketSql("(embedding::DOUBLE[])", Planes8)} AS bucket
            |  FROM embeddings)
            |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
            |  round(${cosineSql("a.e", "b.e")}, 6) AS sim
            |FROM b a JOIN b b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
            |WHERE round(${cosineSql("a.e", "b.e")}, 6) >= 0.2
            |ORDER BY vec_a, vec_b""".stripMargin),
    (s, d) => graft.operators.Similarity.nearDupPairs(
        Tables.embeddings(s, d)
          .withColumn("e", col("embedding").cast("array<double>"))
          .select("vec_id", "e"),
        "vec_id", "e", Planes8, threshold = 0.2)
      .orderBy("vec_a", "vec_b"))

  /** Semantic near-dup CLUSTERS: the transitive closure of q41's
    * embedding-cosine pairs, labeled by min member id — the embedding
    * modality's q73 (shingle clusters) twin, composing the existing
    * bucket-join pair generator with Dedup.connectedComponents. At scale
    * the pair set is index metadata (in-bucket verified pairs only), so
    * the closure runs the driver union-find regime; the oracle replays
    * the full recursive closure. */
  val q179_embedding_clusters = Q(
    "q179_embedding_clusters",
    Some(s"""WITH RECURSIVE b AS (
            |  SELECT vec_id, embedding::DOUBLE[] AS e,
            |         ${lshBucketSql("(embedding::DOUBLE[])", Planes8)} AS bucket
            |  FROM embeddings),
            |prs AS (
            |  SELECT a.vec_id AS u, b.vec_id AS v
            |  FROM b a JOIN b b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
            |  WHERE round(${cosineSql("a.e", "b.e")}, 6) >= 0.2),
            |edges AS (
            |  SELECT u, v FROM prs UNION SELECT v, u FROM prs),
            |cnodes AS (SELECT DISTINCT u AS node FROM edges),
            |reach AS (
            |  SELECT node, node AS m FROM cnodes
            |  UNION
            |  SELECT r.node, e.v AS m FROM reach r JOIN edges e ON e.u = r.m)
            |SELECT node AS vec_id, min(m) AS cluster_id
            |FROM reach GROUP BY node
            |ORDER BY vec_id""".stripMargin),
    (s, d) => {
      val pairs = graft.operators.Similarity.nearDupPairs(
        Tables.embeddings(s, d)
          .withColumn("e", col("embedding").cast("array<double>"))
          .select("vec_id", "e"),
        "vec_id", "e", Planes8, threshold = 0.2)
      graft.operators.Dedup.connectedComponents(pairs, "vec_a", "vec_b")
        .select(col("node").as("vec_id"), col("component").as("cluster_id"))
        .orderBy("vec_id")
    })

  private val EmbDim = 64

  /** Per-label embedding COHESION audit (mislabel/drift detection):
    * exact-decimal elementwise label centroids (the q57 trainCentroids
    * aggregation discipline — per-(label, dim) decimal sums, mean rounded
    * once to 12, so the centroid is bit-identical under any partial-agg
    * order), then each member's cosine to its own centroid, reported as
    * per-label count / mean / worst. A label whose min cosine collapses
    * contains foreign vectors; a drifting mean flags annotation drift.
    *
    * Scale shape: one (label, dim)-keyed hash agg over the posexploded
    * corpus (the only corpus-sized shuffle), centroids re-enter as a
    * label-count-sized broadcast array table, and the scoring pass is the
    * scan-side codegen'd cosine kernel — no window, nothing pairwise. */
  val q181_label_cohesion = Q(
    "q181_label_cohesion",
    Some(s"""WITH e AS (
            |  SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
            |d AS (
            |  SELECT label, i AS dim, e[i] AS v
            |  FROM e, unnest(generate_series(1, $EmbDim)) AS u(i)),
            |ctr0 AS (
            |  SELECT label, dim,
            |    round(CAST(sum(CAST(v AS DECIMAL(28,12))) AS DOUBLE)
            |      / count(*), 12) AS m
            |  FROM d GROUP BY 1, 2),
            |ctr AS (SELECT label, list(m ORDER BY dim) AS c FROM ctr0
            |        GROUP BY label),
            |sc AS (
            |  SELECT e.label, round(${cosineSql("e.e", "ctr.c")}, 6) AS cos
            |  FROM e JOIN ctr USING (label))
            |SELECT label, CAST(count(*) AS BIGINT) AS n,
            |  round(CAST(sum(CAST(cos AS DECIMAL(28,12))) AS DOUBLE)
            |    / count(*), 6) AS avg_cos,
            |  round(min(cos), 6) AS min_cos
            |FROM sc GROUP BY label ORDER BY label""".stripMargin),
    (s, d) => {
      val emb = Tables.embeddings(s, d)
        .withColumn("e", col("embedding").cast("array<double>"))
      val dims = emb.select(col("label"), posexplode(col("e")))
        .toDF("label", "dim0", "v")
      val ctr0 = dims.groupBy(col("label"), (col("dim0") + 1).as("dim"))
        .agg(round(sum(col("v").cast("decimal(28,12)")).cast("double") /
          count(lit(1)), 12).as("m"))
      val ctr = ctr0.groupBy("label").agg(
        expr("transform(array_sort(collect_list(struct(dim, m))), x -> x.m)")
          .as("c"))
      emb.join(broadcast(ctr), "label")
        .select(col("label"), round(cosine(col("e"), col("c")), 6).as("cos"))
        .groupBy("label")
        .agg(count(lit(1)).as("n"),
          round(sum(col("cos").cast("decimal(28,12)")).cast("double") /
            count(lit(1)), 6).as("avg_cos"),
          round(min(col("cos")), 6).as("min_cos"))
        .orderBy("label")
    })

  val all: Seq[Q] = Seq(
    q38_cosine_topk, q39_ann_lsh, q40_embedding_norms, q41_dedup_embedding,
    q179_embedding_clusters, q181_label_cohesion)
}
