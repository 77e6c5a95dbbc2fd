package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFunctions.{cosine, cosineSql}

/** Vector ops, part 4: embedding-space QUALITY audits — the reports a
  * pipeline runs before trusting its vector column at scale.
  *
  *  - q219: Johnson–Lindenstrauss random-projection distortion. The
  *    64-d embeddings are projected to 16-d with a DETERMINISTIC ±1
  *    sign matrix (sign = first md5 hex nibble of "i_j" < '8' — the
  *    engine's standard portable-hash device, replayable bit-exactly in
  *    any engine) and the pairwise squared-distance ratio
  *    d²_proj/d²_orig is histogrammed over a bounded probe set. This is
  *    the go/no-go report for shipping the cheaper 16-d index.
  *  - q220: dimension-correlation audit — top-20 most correlated
  *    coordinate pairs. Highly correlated dims mean wasted index bytes
  *    (PQ subspaces assume decorrelation; q78/q87 inherit this).
  *
  * Scale shape: both are scan-side expression work + one bounded-group
  * aggregation. q219's projection is O(N·d·r) inside the scan with NO
  * shuffle; the pairwise audit is O(probe²) on a 100-vector broadcast
  * probe set BY DESIGN (the audit samples, the projection scales).
  * q220 quantizes coordinates once to the 6-decimal integer grid and
  * accumulates the exact integer Gram moments per partition in one
  * zero-allocation mapPartitions loop; the wire carries one
  * (64+64+2016)-long summary row per partition, nothing more.
  *
  * Exactness: per-row products are rounded to 6 decimals and summed in
  * DECIMAL(38,6) (order-independent under partial-agg reordering); the
  * few genuinely sequential folds (projection, distance) use the
  * engine's proven sequential-fold parity (aggregate ≡ list_sum, the
  * cosineSql device). Doubles appear only in final per-row expressions
  * built identically on both engines.
  */
object VectorOps4 {

  private val Dim = 64
  private val RDim = 16   // projected dimensionality (sqrt = 4)
  private val ProbeN = 100

  /** Spark-side projection: v (array<double>, 64) → 16-d array, each
    * coordinate a sequential signed fold scaled by 1/sqrt(16), rounded
    * to 6 decimals so downstream arithmetic is replayable. */
  private val projSparkSql: String =
    s"""transform(sequence(1, $RDim), j ->
       |  round(aggregate(sequence(1, $Dim), CAST(0 AS DOUBLE), (acc, i) ->
       |    acc + element_at(v, i) *
       |      (CASE WHEN substring(md5(concat(CAST(i AS STRING), '_', CAST(j AS STRING))), 1, 1) < '8'
       |            THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END)) / 4, 6))""".stripMargin

  private val projDuckSql: String =
    s"""list_transform(generate_series(1, $RDim), j ->
       |  round(list_sum(list_transform(generate_series(1, $Dim), i ->
       |    v[i] * (CASE WHEN substring(md5(i::VARCHAR || '_' || j::VARCHAR), 1, 1) < '8'
       |            THEN 1.0 ELSE -1.0 END))) / 4, 6))""".stripMargin

  /** JL distortion report: histogram (decile buckets of the squared
    * distance ratio) + per-bucket mean over all probe pairs. A healthy
    * projection concentrates mass near bucket 10 (ratio ≈ 1.0). */
  val q219_jl_projection = Q(
    "q219_jl_projection",
    Some(s"""WITH e AS (
            |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
            |  WHERE vec_id < $ProbeN),
            |p AS (
            |  SELECT vec_id, v, $projDuckSql AS pv FROM e),
            |pr AS (
            |  SELECT
            |    list_sum(list_transform(generate_series(1, $Dim),
            |      i -> (a.v[i] - b.v[i]) * (a.v[i] - b.v[i]))) AS do2,
            |    list_sum(list_transform(generate_series(1, $RDim),
            |      j -> (a.pv[j] - b.pv[j]) * (a.pv[j] - b.pv[j]))) AS dp2
            |  FROM p a JOIN p b ON a.vec_id < b.vec_id),
            |r AS (SELECT round(dp2 / do2, 6) AS ratio FROM pr WHERE do2 > 0)
            |SELECT CAST(floor(ratio * 10) AS BIGINT) AS bucket,
            |  CAST(count(*) AS BIGINT) AS n,
            |  round(CAST(sum(CAST(ratio AS DECIMAL(18,6))) AS DOUBLE)
            |    / count(*), 6) AS mean_ratio
            |FROM r GROUP BY 1 ORDER BY 1""".stripMargin),
    (s, d) => {
      val p = Tables.embeddings(s, d)
        .filter(col("vec_id") < ProbeN)
        .withColumn("v", col("embedding").cast("array<double>"))
        .select(col("vec_id"), col("v"), expr(projSparkSql).as("pv"))
      val pa = p.toDF("ia", "va", "pa")
      val pb = p.toDF("ib", "vb", "pb")
      pa.join(broadcast(pb), col("ia") < col("ib"))
        .select(
          expr(s"""aggregate(sequence(1, $Dim), CAST(0 AS DOUBLE), (acc, i) ->
                  |  acc + (element_at(va, i) - element_at(vb, i))
                  |      * (element_at(va, i) - element_at(vb, i)))""".stripMargin)
            .as("do2"),
          expr(s"""aggregate(sequence(1, $RDim), CAST(0 AS DOUBLE), (acc, j) ->
                  |  acc + (element_at(pa, j) - element_at(pb, j))
                  |      * (element_at(pa, j) - element_at(pb, j)))""".stripMargin)
            .as("dp2"))
        .where(col("do2") > 0)
        .select(round(col("dp2") / col("do2"), 6).as("ratio"))
        .groupBy(floor(col("ratio") * 10).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("ratio").cast("decimal(18,6)")).cast("double")
            / count(lit(1)), 6).as("mean_ratio"))
        .orderBy("bucket")
    })

  /** Dimension-correlation audit: Pearson r for every coordinate pair
    * (i < j), top-20 by |r|. Pair-product sums use the array-of-sums
    * device (VecSumAggregator): each row contributes ONE flattened
    * d(d−1)/2-wide vector of 6-decimal-scaled integer products, summed
    * elementwise map-side — no row expansion at all (the first cut
    * exploded 2016 structs per row; VERDICT r6 flagged the per-row CPU).
    * The single 2016-wide result row unpacks to (i,j) pairs only AFTER
    * aggregation; per-dim moments come from one posexplode pass.
    * Scaled-long sums are exact and associative, so the result is
    * bit-identical to the oracle's decimal(38,6) sums. */
  val q220_dim_corr = Q(
    "q220_dim_corr",
    Some(s"""WITH e AS (
            |  SELECT list_transform(embedding::DOUBLE[],
            |    x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS u
            |  FROM embeddings),
            |idx AS (SELECT i FROM generate_series(1, $Dim) t(i)),
            |dim AS MATERIALIZED (
            |  SELECT i, CAST(count(*) AS BIGINT) AS n,
            |    sum(u[i]) AS s, sum(u[i] * u[i]) AS q
            |  FROM e CROSS JOIN idx GROUP BY i),
            |ps AS (SELECT a.i AS i, b.i AS j FROM idx a JOIN idx b ON a.i < b.i),
            |pg AS (
            |  SELECT i, j, sum(u[i] * u[j]) AS p
            |  FROM e CROSS JOIN ps GROUP BY i, j),
            |c AS (
            |  SELECT pg.i, pg.j,
            |    round(CAST(da.n * pg.p - da.s * db.s AS DOUBLE)
            |      / sqrt(CAST(da.n * da.q - da.s * da.s AS DOUBLE)
            |           * CAST(db.n * db.q - db.s * db.s AS DOUBLE)), 6) AS corr
            |  FROM pg JOIN dim da ON pg.i = da.i JOIN dim db ON pg.j = db.i)
            |SELECT i, j, corr FROM c
            |ORDER BY abs(corr) DESC, i, j LIMIT 20""".stripMargin),
    (s, d) => {
      import s.implicits._
      val nPairs = Dim * (Dim - 1) / 2
      // Per-partition exact integer Gram accumulation. Every coordinate
      // is quantized ONCE to the 6-decimal grid — u = floor(x·1e6 + 0.5),
      // pure IEEE ops, bit-identical in any engine — and all moments
      // (Σu_i, Σu_i², Σu_iu_j) are plain long multiply-adds in one tight
      // zero-allocation loop. This is the one place mapPartitions beats
      // every declarative form: 2016 pair terms per row made the explode
      // plan interpreter-bound (HOF lambdas don't codegen; 2×BigDecimal
      // round per term) and a typed Aggregator boxes a 2016-long Seq per
      // row through its encoder. Here a row costs 64 quantizes + 2080
      // primitive FMAs, and a partition emits ONE (n, 64, 64, 2016)-long
      // summary row — partial aggregation in its ideal form.
      // Long-overflow bound: |u| ≤ 1e7 ⇒ |u·u| ≤ 1e14 ⇒ safe below
      // ~9e4 rows·partition⁻¹·1e14 ≈ 9e18 — i.e. ≲ 90k rows of unit-norm
      // 64-d vectors per partition; files.maxPartitionBytes (128 MB /
      // 64 floats ≈ 500k rows) with |v| ≤ 1 keeps Σ|u·u| ≤ 5e17. The
      // cross-partition merge below sums in DECIMAL(38,0).
      val moments = Tables.embeddings(s, d)
        .select(col("embedding").cast("array<double>").as("v"))
        .as[Array[Double]]
        .mapPartitions { it =>
          var n = 0L
          val u = new Array[Long](Dim)
          val s1 = new Array[Long](Dim)
          val sq = new Array[Long](Dim)
          val sp = new Array[Long](nPairs)
          while (it.hasNext) {
            val v = it.next()
            var i = 0
            while (i < Dim) {
              u(i) = math.floor(v(i) * 1e6 + 0.5).toLong
              // Enforce the overflow bound the accumulators rely on
              // (|u| ≤ 1e7, see docstring): a coordinate outside ±10
              // would let the Long pair-sums wrap SILENTLY at ~90k
              // rows/partition — fail loudly instead (ADVICE r7).
              if (u(i) > 10000000L || u(i) < -10000000L)
                throw new IllegalStateException(
                  s"q220: |embedding coord| ${v(i)} exceeds the ±10 " +
                    "contract backing exact-Long Gram accumulation")
              i += 1
            }
            n += 1
            var k = 0
            i = 0
            while (i < Dim) {
              s1(i) += u(i); sq(i) += u(i) * u(i)
              var j = i + 1
              while (j < Dim) { sp(k) += u(i) * u(j); k += 1; j += 1 }
              i += 1
            }
          }
          if (n == 0) Iterator.empty
          else Iterator.single((n, s1.toSeq, sq.toSeq, sp.toSeq))
        }.toDF("n", "s1", "sq", "sp")
        .localCheckpoint(true) // ≤ #partitions rows; read 3× below
      val total = moments.agg(sum(col("n")).as("n"))
      val dim = moments
        .select(posexplode(arrays_zip(col("s1"), col("sq"))).as(Seq("i0", "z")))
        .groupBy((col("i0") + 1).as("i"))
        .agg(sum(col("z.s1").cast("decimal(38,0)")).as("s"),
          sum(col("z.sq").cast("decimal(38,0)")).as("q"))
      val pairIdx = s.range(1).select(posexplode(expr(
          s"""flatten(transform(sequence(1, ${Dim - 1}), i ->
             |  transform(sequence(i + 1, $Dim), j ->
             |    named_struct('i', i, 'j', j))))""".stripMargin))
          .as(Seq("k", "c")))
        .select(col("k"), col("c.i").as("i"), col("c.j").as("j"))
      val pg = moments.select(posexplode(col("sp")).as(Seq("k", "pk")))
        .groupBy("k").agg(sum(col("pk").cast("decimal(38,0)")).as("p"))
        .join(broadcast(pairIdx), "k")
      val da = dim.toDF("di", "sa", "qa")
      val db = dim.toDF("dj", "sb", "qb")
      pg.join(broadcast(da), col("i") === col("di"))
        .join(broadcast(db), col("j") === col("dj"))
        .crossJoin(broadcast(total))
        .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
          round((col("n") * col("p") - col("sa") * col("sb")).cast("double")
            / sqrt((col("n") * col("qa") - col("sa") * col("sa")).cast("double")
              * (col("n") * col("qb") - col("sb") * col("sb")).cast("double")),
            6).as("corr"))
        .orderBy(abs(col("corr")).desc, col("i"), col("j"))
        .limit(20)
    })

  private val NCentroids = 16
  private val NProbe = 2
  private val BatchQ = 8
  private val RboK = 10

  /** Truncated rank-biased-overlap weights for p = 0.9, depth 10:
    * W(m) = Σ_{d=m..10} round(p^{d−1}/d, 10), as exact-decimal
    * literals shared verbatim by both engines. RBO = (1−p)·Σ_{matched
    * items} W(max(rank_A, rank_B)) — the per-item form of
    * (1−p)·Σ_d p^{d−1}·overlap_d/d (an item in both lists from depth m
    * onward contributes to every overlap_d with d ≥ m). Truncated = no
    * extrapolation residual: identical lists score 1−p¹⁰ ≈ 0.651. */
  private val rboW: Seq[(Int, String)] = Seq(
    1 -> "2.3541639943", 2 -> "1.3541639943", 3 -> "0.9041639943",
    4 -> "0.6341639943", 5 -> "0.4519139943", 6 -> "0.3206939943",
    7 -> "0.2222789943", 8 -> "0.1463588514", 9 -> "0.0865717389",
    10 -> "0.0387420489")

  /** ANN quality beyond recall: per-query rank-biased overlap between
    * the EXACT cosine top-10 and the IVF top-10 (q136's serving path,
    * k=10). Recall counts hits; RBO weights them by rank — the metric
    * that catches an index that finds the right items in the wrong
    * order. Exact side is one corpus pass against the broadcast query
    * batch; IVF side is the audited ivfTopKBatch plan; the comparison
    * itself is list-metadata-sized (8 queries × 10 ranks). */
  val q222_rbo = Q(
    "q222_rbo",
    Some(s"""WITH e AS (
            |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            |cent AS (
            |  SELECT vec_id AS cid, v AS cvec FROM e WHERE vec_id < $NCentroids),
            |assign AS (
            |  SELECT vec_id, v, cid,
            |         ROW_NUMBER() OVER (PARTITION BY vec_id
            |           ORDER BY round(${cosineSql("v", "cvec")}, 6) DESC, cid) AS rnk
            |  FROM e CROSS JOIN cent WHERE e.vec_id >= $BatchQ),
            |members AS (SELECT vec_id, v, cid FROM assign WHERE rnk = 1),
            |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < $BatchQ),
            |qprobe AS (
            |  SELECT qid, qv, cid FROM (
            |    SELECT qid, qv, cid, ROW_NUMBER() OVER (PARTITION BY qid
            |      ORDER BY round(${cosineSql("qv", "cvec")}, 6) DESC, cid) AS rnk
            |    FROM q CROSS JOIN cent) t
            |  WHERE rnk <= $NProbe),
            |cand AS (
            |  SELECT p.qid, m.vec_id,
            |    round(${cosineSql("m.v", "p.qv")}, 6) AS sim
            |  FROM members m JOIN qprobe p ON m.cid = p.cid),
            |ivf AS (
            |  SELECT qid, vec_id, rk FROM (
            |    SELECT qid, vec_id, ROW_NUMBER() OVER (
            |      PARTITION BY qid ORDER BY sim DESC, vec_id) AS rk
            |    FROM cand) t WHERE rk <= $RboK),
            |exact AS (
            |  SELECT qid, vec_id, ra FROM (
            |    SELECT q.qid, e.vec_id, ROW_NUMBER() OVER (PARTITION BY q.qid
            |      ORDER BY round(${cosineSql("e.v", "q.qv")}, 6) DESC, e.vec_id) AS ra
            |    FROM e CROSS JOIN q WHERE e.vec_id >= $BatchQ) t
            |  WHERE ra <= $RboK),
            |wt(m, w) AS (VALUES
            |  ${rboW.map { case (m, w) => s"($m, $w::DECIMAL(18,10))" }
                     .mkString(",\n            |  ")}),
            |ov AS (
            |  SELECT x.qid, CAST(count(*) AS BIGINT) AS n_overlap,
            |    sum(w.w) AS sw
            |  FROM exact x JOIN ivf i ON x.qid = i.qid AND x.vec_id = i.vec_id
            |  JOIN wt w ON w.m = greatest(x.ra, i.rk)
            |  GROUP BY x.qid)
            |SELECT q.qid, CAST(COALESCE(ov.n_overlap, 0) AS BIGINT) AS n_overlap,
            |  round(0.1 * CAST(COALESCE(ov.sw, 0) AS DOUBLE), 6) AS rbo
            |FROM q LEFT JOIN ov ON q.qid = ov.qid
            |ORDER BY q.qid""".stripMargin),
    (s, d) => {
      import s.implicits._
      val emb = Tables.embeddings(s, d)
        .withColumn("e", col("embedding").cast("array<double>"))
      val corpus = emb.filter(col("vec_id") >= BatchQ).select("vec_id", "e")
      val queries = emb.filter(col("vec_id") < BatchQ)
        .select(col("vec_id").as("qid"), col("e").as("qe"))
      val wexact = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))
      val exact = corpus.crossJoin(broadcast(queries))
        .select(col("qid"), col("vec_id"),
          round(cosine(col("e"), col("qe")), 6).as("sim"))
        .withColumn("ra", row_number().over(wexact).cast("long"))
        .filter(col("ra") <= RboK)
        .select("qid", "vec_id", "ra")
      val ivf = graft.operators.Similarity.ivfTopKBatch(
          corpus, "vec_id", "e",
          emb.filter(col("vec_id") < NCentroids)
            .select(col("vec_id").as("cid"), col("e").as("cvec")),
          "cid", "cvec",
          emb.filter(col("vec_id") < BatchQ), "vec_id", "e",
          k = RboK, nProbe = NProbe)
        .select(col("qid"), col("vec_id"), col("rk"))
      val wts = rboW.map { case (m, w) => (m.toLong, BigDecimal(w)) }
        .toDF("m", "w")
      val ov = exact.join(ivf, Seq("qid", "vec_id"))
        .withColumn("m", greatest(col("ra"), col("rk")))
        .join(broadcast(wts), Seq("m"))
        .groupBy("qid")
        .agg(count(lit(1)).as("n_overlap"), sum(col("w")).as("sw"))
      queries.select("qid").join(ov, Seq("qid"), "left")
        .select(col("qid"),
          coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
          round(lit(0.1) * coalesce(col("sw").cast("double"), lit(0.0)), 6)
            .as("rbo"))
        .orderBy("qid")
    })

  /** Position discounts 1/log2(p+1), p = 1..10, rounded once to 10
    * decimals and shared VERBATIM by both engines (the rboW device) — no
    * cross-engine log2 ever runs. Relevance is graded by exact rank
    * (rel = 11 − exact_rank for the exact top-10, else 0), so DCG is a
    * sum of integer·decimal terms — exact, order-independent. */
  private val ndcgDisc: Seq[(Int, String)] = Seq(
    1 -> "1.0000000000", 2 -> "0.6309297536", 3 -> "0.5000000000",
    4 -> "0.4306765581", 5 -> "0.3868528072", 6 -> "0.3562071871",
    7 -> "0.3333333333", 8 -> "0.3154648768", 9 -> "0.3010299957",
    10 -> "0.2890648263")

  /** ANN quality, third lens: NDCG@10 of the IVF serving path against
    * exact cosine. Recall (q198) counts hits, RBO (q222) weights by
    * agreement depth; NDCG grades each hit by HOW relevant the item it
    * displaced was — the metric that punishes an index whose misses are
    * the best items. Same audited harness as q222: exact side is one
    * corpus pass against the broadcast query batch, IVF side is
    * ivfTopKBatch, the comparison is list-metadata-sized. */
  val q226_ndcg = Q(
    "q226_ndcg",
    Some(s"""WITH e AS (
            |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            |cent AS (
            |  SELECT vec_id AS cid, v AS cvec FROM e WHERE vec_id < $NCentroids),
            |assign AS (
            |  SELECT vec_id, v, cid,
            |         ROW_NUMBER() OVER (PARTITION BY vec_id
            |           ORDER BY round(${cosineSql("v", "cvec")}, 6) DESC, cid) AS rnk
            |  FROM e CROSS JOIN cent WHERE e.vec_id >= $BatchQ),
            |members AS (SELECT vec_id, v, cid FROM assign WHERE rnk = 1),
            |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < $BatchQ),
            |qprobe AS (
            |  SELECT qid, qv, cid FROM (
            |    SELECT qid, qv, cid, ROW_NUMBER() OVER (PARTITION BY qid
            |      ORDER BY round(${cosineSql("qv", "cvec")}, 6) DESC, cid) AS rnk
            |    FROM q CROSS JOIN cent) t
            |  WHERE rnk <= $NProbe),
            |cand AS (
            |  SELECT p.qid, m.vec_id,
            |    round(${cosineSql("m.v", "p.qv")}, 6) AS sim
            |  FROM members m JOIN qprobe p ON m.cid = p.cid),
            |ivf AS (
            |  SELECT qid, vec_id, rk FROM (
            |    SELECT qid, vec_id, ROW_NUMBER() OVER (
            |      PARTITION BY qid ORDER BY sim DESC, vec_id) AS rk
            |    FROM cand) t WHERE rk <= $RboK),
            |exact AS (
            |  SELECT qid, vec_id, ra FROM (
            |    SELECT q.qid, e.vec_id, ROW_NUMBER() OVER (PARTITION BY q.qid
            |      ORDER BY round(${cosineSql("e.v", "q.qv")}, 6) DESC, e.vec_id) AS ra
            |    FROM e CROSS JOIN q WHERE e.vec_id >= $BatchQ) t
            |  WHERE ra <= $RboK),
            |disc(p, w) AS (VALUES
            |  ${ndcgDisc.map { case (p, w) => s"($p, $w::DECIMAL(18,10))" }
                       .mkString(",\n            |  ")}),
            |idcg AS (
            |  SELECT sum((11 - p) * w) AS iw FROM disc),
            |dcg AS (
            |  SELECT i.qid, sum((11 - x.ra) * disc.w) AS dw
            |  FROM ivf i JOIN exact x ON i.qid = x.qid AND i.vec_id = x.vec_id
            |  JOIN disc ON disc.p = i.rk
            |  GROUP BY i.qid)
            |SELECT q.qid,
            |  floor(CAST(COALESCE(dcg.dw, 0) AS DOUBLE)
            |    / CAST(idcg.iw AS DOUBLE) * 1000000 + 0.5) / 1000000.0
            |    AS ndcg
            |FROM q CROSS JOIN idcg LEFT JOIN dcg ON q.qid = dcg.qid
            |ORDER BY q.qid""".stripMargin),
    (s, d) => {
      import s.implicits._
      val emb = Tables.embeddings(s, d)
        .withColumn("e", col("embedding").cast("array<double>"))
      val corpus = emb.filter(col("vec_id") >= BatchQ).select("vec_id", "e")
      val queries = emb.filter(col("vec_id") < BatchQ)
        .select(col("vec_id").as("qid"), col("e").as("qe"))
      val wexact = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))
      val exact = corpus.crossJoin(broadcast(queries))
        .select(col("qid"), col("vec_id"),
          round(cosine(col("e"), col("qe")), 6).as("sim"))
        .withColumn("ra", row_number().over(wexact).cast("long"))
        .filter(col("ra") <= RboK)
        .select("qid", "vec_id", "ra")
      val ivf = graft.operators.Similarity.ivfTopKBatch(
          corpus, "vec_id", "e",
          emb.filter(col("vec_id") < NCentroids)
            .select(col("vec_id").as("cid"), col("e").as("cvec")),
          "cid", "cvec",
          emb.filter(col("vec_id") < BatchQ), "vec_id", "e",
          k = RboK, nProbe = NProbe)
        .select(col("qid"), col("vec_id"), col("rk"))
      // Tight decimal types keep the gain×weight products EXACT at scale
      // 10 (the oracle's DECIMAL(18,10) arithmetic): with the default
      // long × decimal(38,18) promotion the product exceeds precision 38
      // and Spark's allowPrecisionLoss truncates the scale to 6 — dw then
      // differs from DuckDB's in the 7th decimal, which at sf0.001 landed
      // the final ratio across a 1e-6 rounding boundary.
      val disc = ndcgDisc.map { case (p, w) => (p.toLong, BigDecimal(w)) }
        .toDF("p", "w")
        .select(col("p"), col("w").cast("decimal(18,10)").as("w"))
      def gain(c: org.apache.spark.sql.Column) =
        (lit(11) - c).cast("decimal(2,0)")
      val idcg = disc.agg(sum(gain(col("p")) * col("w")).as("iw"))
      val dcg = ivf.join(exact, Seq("qid", "vec_id"))
        .join(broadcast(disc), col("p") === col("rk"))
        .groupBy("qid")
        .agg(sum(gain(col("ra")) * col("w")).as("dw"))
      // final ratio quantized by the explicit IEEE formula (q220 device)
      // rather than library round: the engines' half-up rules disagree by
      // 1e-6 when the ratio lands a sub-ulp from a .5 boundary (sf0.001)
      queries.select("qid").join(dcg, Seq("qid"), "left")
        .crossJoin(broadcast(idcg))
        .select(col("qid"),
          (floor(coalesce(col("dw").cast("double"), lit(0.0))
            / col("iw").cast("double") * 1000000 + 0.5) /
            lit(1000000.0)).as("ndcg"))
        .orderBy("qid")
    })

  private val SweepProbes = Seq(1, 2, 4)

  /** IVF nProbe sweep — the serving-knob tuning table: recall@10 of the
    * audited `ivfTopKBatch` path at nProbe ∈ {1, 2, 4} against the exact
    * cosine top-10, one row per setting. q198/q222/q226 grade ONE
    * operating point; this is the curve an index operator reads to pick
    * it (more probes = more candidate scan per query = higher recall —
    * the table quantifies the exchange rate). Exact side computed once
    * and persisted; each sweep point reuses the production plan with
    * only the probe count changed; hits are exact BIGINTs.
    *
    * Scale shape: one corpus pass for the exact baseline + one per sweep
    * point (each the audited scan-side IVF plan); comparisons are
    * list-metadata-sized. */
  val q260_nprobe_sweep = Q(
    "q260_nprobe_sweep", {
      def ivfBlock(np: Int) =
        s"""cand_$np AS (
           |  SELECT p.qid, m.vec_id,
           |    round(${cosineSql("m.v", "p.qv")}, 6) AS sim
           |  FROM members m JOIN (SELECT qid, qv, cid FROM qpr
           |                       WHERE rnk <= $np) p ON m.cid = p.cid),
           |ivf_$np AS (
           |  SELECT qid, vec_id FROM (
           |    SELECT qid, vec_id, ROW_NUMBER() OVER (
           |      PARTITION BY qid ORDER BY sim DESC, vec_id) AS rk
           |    FROM cand_$np) t WHERE rk <= $RboK),
           |row_$np AS (
           |  SELECT $np AS nprobe, CAST(count(*) AS BIGINT) AS n_hits,
           |    round(CAST(count(*) AS DOUBLE) / ${BatchQ * RboK}, 6)
           |      AS recall_at_10
           |  FROM ivf_$np i JOIN exact x
           |    ON i.qid = x.qid AND i.vec_id = x.vec_id)""".stripMargin
      Some(s"""WITH e AS (
              |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
              |cent AS (
              |  SELECT vec_id AS cid, v AS cvec FROM e
              |  WHERE vec_id < $NCentroids),
              |assign AS (
              |  SELECT vec_id, v, cid,
              |         ROW_NUMBER() OVER (PARTITION BY vec_id
              |           ORDER BY round(${cosineSql("v", "cvec")}, 6) DESC,
              |             cid) AS rnk
              |  FROM e CROSS JOIN cent WHERE e.vec_id >= $BatchQ),
              |members AS (SELECT vec_id, v, cid FROM assign WHERE rnk = 1),
              |q AS (SELECT vec_id AS qid, v AS qv FROM e
              |      WHERE vec_id < $BatchQ),
              |qpr AS (
              |  SELECT qid, qv, cid, ROW_NUMBER() OVER (PARTITION BY qid
              |      ORDER BY round(${cosineSql("qv", "cvec")}, 6) DESC, cid)
              |    AS rnk
              |  FROM q CROSS JOIN cent),
              |exact AS (
              |  SELECT qid, vec_id FROM (
              |    SELECT q.qid, e.vec_id, ROW_NUMBER() OVER (
              |      PARTITION BY q.qid
              |      ORDER BY round(${cosineSql("e.v", "q.qv")}, 6) DESC,
              |        e.vec_id) AS ra
              |    FROM e CROSS JOIN q WHERE e.vec_id >= $BatchQ) t
              |  WHERE ra <= $RboK),
              |${SweepProbes.map(ivfBlock).mkString(",\n")}
              |SELECT nprobe, n_hits, recall_at_10 FROM (
              |  ${SweepProbes.map(np => s"SELECT * FROM row_$np")
                   .mkString("\n  UNION ALL ")})
              |ORDER BY nprobe""".stripMargin)
    },
    (s, d) => {
      val emb = Tables.embeddings(s, d)
        .withColumn("e", col("embedding").cast("array<double>"))
      val corpus = emb.filter(col("vec_id") >= BatchQ).select("vec_id", "e")
      val queries = emb.filter(col("vec_id") < BatchQ)
        .select(col("vec_id").as("qid"), col("e").as("qe"))
      val wexact = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))
      // persisted: the 80-row exact baseline joins once per sweep point
      val exact = graft.operators.PlanCache.persist(
        corpus.crossJoin(broadcast(queries))
          .select(col("qid"), col("vec_id"),
            round(cosine(col("e"), col("qe")), 6).as("sim"))
          .withColumn("ra", row_number().over(wexact).cast("long"))
          .filter(col("ra") <= RboK)
          .select("qid", "vec_id"))
      val rows = SweepProbes.map { np =>
        graft.operators.Similarity.ivfTopKBatch(
            corpus, "vec_id", "e",
            emb.filter(col("vec_id") < NCentroids)
              .select(col("vec_id").as("cid"), col("e").as("cvec")),
            "cid", "cvec",
            emb.filter(col("vec_id") < BatchQ), "vec_id", "e",
            k = RboK, nProbe = np)
          .select("qid", "vec_id")
          .join(exact, Seq("qid", "vec_id"))
          .agg(count(lit(1)).as("n_hits"))
          .select(lit(np).as("nprobe"), col("n_hits"),
            round(col("n_hits").cast("double") / (BatchQ * RboK), 6)
              .as("recall_at_10"))
      }
      rows.reduce(_.unionAll(_)).orderBy("nprobe")
    })

  /** Simplified silhouette per cluster — the clustering-quality score
    * beside q217's balance audit and q241's drift monitor: for each
    * point, a = cosine distance to its OWN (nearest) centroid, b = the
    * best alternative centroid's distance, s = (b − a)/max(a, b) — the
    * centroid-proxy silhouette (full silhouette's pairwise means would
    * be corpus-quadratic; the proxy is the standard scale substitute).
    * Per-point s is rounded once and per-cluster means are exact-decimal
    * sums. A degenerate point (a = b = 0) scores 0 by explicit guard.
    *
    * Scale shape: the point×centroid grid is one scan-side broadcast
    * cross (k = 16 constant), the per-point window is k-sized, and
    * everything after is cluster-grid arithmetic. */
  val q269_silhouette = Q(
    "q269_silhouette",
    Some(s"""WITH e AS (
            |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            |cent AS (
            |  SELECT vec_id AS cid, v AS cvec FROM e
            |  WHERE vec_id < $NCentroids),
            |dist AS (
            |  SELECT e.vec_id, cent.cid,
            |    round(1 - round(${cosineSql("e.v", "cent.cvec")}, 6), 6)
            |      AS dist,
            |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
            |      ORDER BY round(${cosineSql("e.v", "cent.cvec")}, 6) DESC,
            |        cent.cid) AS rnk
            |  FROM e CROSS JOIN cent WHERE e.vec_id >= $NCentroids),
            |ab AS (
            |  SELECT vec_id,
            |    min(CASE WHEN rnk = 1 THEN cid END) AS own_cid,
            |    min(CASE WHEN rnk = 1 THEN dist END) AS a,
            |    min(CASE WHEN rnk > 1 THEN dist END) AS b
            |  FROM dist GROUP BY vec_id),
            |s AS (
            |  SELECT own_cid, CAST(round(CASE WHEN greatest(a, b) > 0
            |      THEN (b - a) / greatest(a, b) ELSE 0 END, 9)
            |    AS DECIMAL(28,9)) AS sil
            |  FROM ab)
            |SELECT CAST(own_cid AS BIGINT) AS cid,
            |  CAST(count(*) AS BIGINT) AS n_members,
            |  round(CAST(sum(sil) AS DOUBLE) / count(*), 6)
            |    AS mean_silhouette
            |FROM s GROUP BY own_cid ORDER BY cid""".stripMargin),
    (s, d) => {
      val emb = Tables.embeddings(s, d)
        .withColumn("v", col("embedding").cast("array<double>"))
      val cent = emb.filter(col("vec_id") < NCentroids)
        .select(col("vec_id").as("cid"), col("v").as("cvec"))
      val wRnk = org.apache.spark.sql.expressions.Window
        .partitionBy("vec_id").orderBy(col("sim").desc, col("cid"))
      val dist = emb.filter(col("vec_id") >= NCentroids)
        .crossJoin(broadcast(cent))
        .select(col("vec_id"), col("cid"),
          round(cosine(col("v"), col("cvec")), 6).as("sim"))
        .withColumn("dist", round(lit(1) - col("sim"), 6))
        .withColumn("rnk", row_number().over(wRnk))
      val ab = dist.groupBy("vec_id").agg(
        min(when(col("rnk") === 1, col("cid"))).as("own_cid"),
        min(when(col("rnk") === 1, col("dist"))).as("a"),
        min(when(col("rnk") > 1, col("dist"))).as("b"))
      val sil = when(greatest(col("a"), col("b")) > 0,
        (col("b") - col("a")) / greatest(col("a"), col("b"))).otherwise(lit(0))
      ab.select(col("own_cid"),
          round(sil, 9).cast("decimal(28,9)").as("sil"))
        .groupBy(col("own_cid").cast("long").as("cid"))
        .agg(count(lit(1)).as("n_members"),
          round(sum(col("sil")).cast("double") / count(lit(1)), 6)
            .as("mean_silhouette"))
        .orderBy("cid")
    })

  val all: Seq[Q] =
    Seq(q219_jl_projection, q220_dim_corr, q222_rbo, q226_ndcg,
      q260_nprobe_sweep, q269_silhouette)
}
