package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFunctions._

/** Round-11 vector additions: corpus-level embedding ISOTROPY — the
  * all-pairs statistic computed in one pass.
  */
object VectorOps8 {

  /** Embedding isotropy audit: the MEAN PAIRWISE COSINE over all n²
    * vector pairs — the "is this embedding space collapsing into a
    * cone" number (anisotropic spaces break cosine-threshold dedup
    * q41/q150 and ANN recall q56+) — WITHOUT any pairwise work:
    * Σ_pairs cos(i,j) = ‖Σ v̂‖² − Σ‖v̂‖², so one pass accumulates the
    * 64 per-dimension sums of the normalized vectors and the closed
    * form does the rest. Adds the dimension-concentration readout:
    * max_j s_j²/‖s‖² vs the 1/64 uniform share (a high ratio = one
    * rogue dimension carries the mean direction).
    *
    * Determinism: each normalized component is rounded once (9
    * decimals) and summed in exact decimal (partial-agg-order-proof);
    * the 64 squared sums roll up through the same device. The ‖v̂‖²≈1
    * diagonal is taken as exactly n — the rounding residual is ~1e-9·d
    * and identical on both engines because both compute the same
    * rounded components.
    *
    * Scale shape: one posexplode pass → a 64-group hash agg → 64-row
    * roll-up. No joins, no windows, no pairwise anything: the n²
    * statistic costs one corpus scan at any n. */
  val q429_embedding_isotropy = Q(
    "q429_embedding_isotropy",
    Some(s"""WITH e AS (
            |  SELECT embedding::DOUBLE[] AS e,
            |    sqrt(${dotSql("(embedding::DOUBLE[])", "(embedding::DOUBLE[])")})
            |      AS nrm
            |  FROM embeddings),
            |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM e),
            |comp AS (
            |  SELECT p.pos, round(e.e[p.pos] / e.nrm, 9) AS xh
            |  FROM e CROSS JOIN
            |    (SELECT unnest(generate_series(1, $Dim)) AS pos) p),
            |s AS (
            |  SELECT pos, CAST(sum(CAST(xh AS DECIMAL(28,9))) AS DOUBLE)
            |    AS sj
            |  FROM comp GROUP BY pos),
            |t AS (
            |  SELECT
            |    CAST(sum(CAST(round(sj * sj, 9) AS DECIMAL(28,9)))
            |      AS DOUBLE) AS ss,
            |    max(round(sj * sj, 9)) AS mx
            |  FROM s)
            |SELECT n, round((ss - n) / (n * (n - 1.0)), 6)
            |    AS mean_pairwise_cos,
            |  round(mx / ss, 6) AS max_dim_share,
            |  round(1.0 / $Dim, 6) AS uniform_share,
            |  round(mx / ss * $Dim, 6) AS anisotropy_ratio
            |FROM t CROSS JOIN n""".stripMargin),
    (s, d) => {
      val e = col("embedding").cast("array<double>")
      val base = Tables.embeddings(s, d)
        .select(e.as("e"), sqrt(dot(e, e)).as("nrm"))
      val n = base.agg(count(lit(1)).as("n"))
      val comp = base.select(col("nrm"), posexplode(col("e")))
        .select(col("pos"), round(col("col") / col("nrm"), 9).as("xh"))
      val sj = comp.groupBy("pos")
        .agg(sum(col("xh").cast("decimal(28,9)")).cast("double").as("sj"))
      val t = sj.agg(
        sum(round(col("sj") * col("sj"), 9).cast("decimal(28,9)"))
          .cast("double").as("ss"),
        max(round(col("sj") * col("sj"), 9)).as("mx"))
      t.crossJoin(broadcast(n))
        .select(col("n"),
          round((col("ss") - col("n")) / (col("n") * (col("n") - lit(1.0))),
            6).as("mean_pairwise_cos"),
          round(col("mx") / col("ss"), 6).as("max_dim_share"),
          round(lit(1.0) / Dim, 6).as("uniform_share"),
          round(col("mx") / col("ss") * Dim, 6).as("anisotropy_ratio"))
    })

  val all: Seq[Q] = Seq(q429_embedding_isotropy)
}
