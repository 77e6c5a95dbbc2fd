package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.VectorFunctions.{cosine, cosineSql, hyperplanes, lshBucket, lshBucketSql}

/** Round-10 vector additions: task-specific DATA VALUATION (KNN-Shapley)
  * and external clustering validation (adjusted Rand index) — the two
  * audits that close the loop from "we built an index / we filtered the
  * corpus" to "which points actually helped".
  */
object VectorOps6 {

  private val ShapK = 5 // the KNN classifier's K being valued

  /** KNN-Shapley DATA VALUATION (Jia et al., VLDB 2019): the exact
    * Shapley value of every training point for a K-NN classifier is
    * computable in closed form from the validation-ranked neighbor
    * lists — s(α_N) = 𝟙[y_N = y_q]/N and
    * s(α_i) = s(α_{i+1}) + (𝟙_i − 𝟙_{i+1})·min(K,i)/(K·i) — i.e. a
    * SUFFIX SUM down each query's ranking, no 2^N coalitions. Negative
    * values flag mislabeled/harmful points; that per-label census is
    * the output. Per-rank terms round at 9 and travel as decimals
    * through the suffix window (partial-agg-order-proof), every later
    * mean re-rounds once — the engine-parity discipline.
    *
    * Scale shape: the ranking is the bounded-query-batch brute shape
    * (q38's device): |val|·|train| scored rows, windows keyed by qid —
    * the corpus is never self-joined; at production scale the same
    * closed form runs on shortlists from the IVF index (q57) instead
    * of exact rankings, identically shaped. */
  val q363_knn_shapley = Q(
    "q363_knn_shapley",
    Some(s"""WITH emb AS (
            |  SELECT vec_id, label, embedding::DOUBLE[] AS e
            |  FROM embeddings),
            |q AS (SELECT vec_id AS qid, label AS ql, e AS qe
            |      FROM emb WHERE vec_id % 50 = 0),
            |t AS (SELECT vec_id AS tid, label AS tl, e AS te
            |      FROM emb WHERE vec_id % 50 <> 0),
            |ranked AS (
            |  SELECT qid, tid, tl,
            |    CASE WHEN tl = ql THEN 1 ELSE 0 END AS m,
            |    ROW_NUMBER() OVER (PARTITION BY qid
            |      ORDER BY round(${cosineSql("te", "qe")}, 6) DESC, tid) AS r,
            |    CAST(count(*) OVER (PARTITION BY qid) AS BIGINT) AS n
            |  FROM t CROSS JOIN q),
            |terms AS (
            |  SELECT qid, tid, tl, m, r, n,
            |    CAST(round(coalesce(
            |      (m - lead(m) OVER (PARTITION BY qid ORDER BY r))
            |        * CAST(least($ShapK, r) AS DOUBLE) / ($ShapK * r),
            |      0), 9) AS DECIMAL(28,9)) AS term,
            |    CAST(max(CASE WHEN r = n THEN m END)
            |      OVER (PARTITION BY qid) AS DOUBLE) / n AS base
            |  FROM ranked),
            |sv AS (
            |  SELECT qid, tid, tl,
            |    round(base + CAST(sum(term) OVER (PARTITION BY qid
            |      ORDER BY r DESC ROWS UNBOUNDED PRECEDING) AS DOUBLE), 6)
            |      AS s
            |  FROM terms),
            |pt AS (
            |  SELECT tid, tl,
            |    round(CAST(sum(CAST(s AS DECIMAL(28,6))) AS DOUBLE)
            |      / count(*), 6) AS v
            |  FROM sv GROUP BY tid, tl)
            |SELECT tl AS label, CAST(count(*) AS BIGINT) AS n_train,
            |  round(CAST(sum(CAST(v AS DECIMAL(28,6))) AS DOUBLE)
            |    / count(*), 6) AS mean_sv,
            |  CAST(sum(CASE WHEN v < 0 THEN 1 ELSE 0 END) AS BIGINT)
            |    AS n_negative
            |FROM pt GROUP BY tl ORDER BY label""".stripMargin),
    (s, d) => {
      val emb = Tables.embeddings(s, d)
        .withColumn("e", col("embedding").cast("array<double>"))
      val q = emb.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("qid"), col("label").as("ql"),
          col("e").as("qe"))
      val t = emb.filter(col("vec_id") % 50 =!= 0)
        .select(col("vec_id").as("tid"), col("label").as("tl"),
          col("e").as("te"))
      val wRank = Window.partitionBy("qid")
        .orderBy(col("__sim").desc, col("tid"))
      val wAll = Window.partitionBy("qid")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val ranked = t.crossJoin(broadcast(q))
        .withColumn("__sim", round(cosine(col("te"), col("qe")), 6))
        .withColumn("m", when(col("tl") === col("ql"), 1).otherwise(0))
        .withColumn("r", row_number().over(wRank))
        .withColumn("n", count(lit(1)).over(wAll).cast("long"))
      val wLead = Window.partitionBy("qid").orderBy("r")
      val terms = ranked
        .withColumn("term", round(coalesce(
          (col("m") - lead("m", 1).over(wLead))
            * least(lit(ShapK), col("r")).cast("double")
            / (lit(ShapK) * col("r")), lit(0.0)), 9).cast("decimal(28,9)"))
        .withColumn("base",
          max(when(col("r") === col("n"), col("m"))).over(wAll)
            .cast("double") / col("n"))
      val wSuffix = Window.partitionBy("qid").orderBy(col("r").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val sv = terms.withColumn("s",
        round(col("base") + sum(col("term")).over(wSuffix).cast("double"), 6))
      val pt = sv.groupBy("tid", "tl")
        .agg(round(sum(col("s").cast("decimal(28,6)")).cast("double")
          / count(lit(1)), 6).as("v"))
      pt.groupBy(col("tl").as("label"))
        .agg(count(lit(1)).as("n_train"),
          round(sum(col("v").cast("decimal(28,6)")).cast("double")
            / count(lit(1)), 6).as("mean_sv"),
          sum(when(col("v") < 0, 1L).otherwise(0L)).as("n_negative"))
        .orderBy("label")
    })

  private val AriPlanes = hyperplanes(4)

  /** Adjusted Rand index — EXTERNAL validation of an unsupervised
    * clustering against reference labels, chance-corrected (plain Rand
    * rewards any fine clustering; ARI is 0 in expectation for a random
    * one). The clustering under audit is the 4-plane sign-LSH bucket
    * (q39's sketch family: does a 4-bit projection recover label
    * structure at all?). Everything is pair-counting combinatorics on
    * the cluster×label CONTINGENCY GRID: with SI = Σ C(n_ij,2),
    * SA = Σ C(a_i,2), SB = Σ C(b_j,2), CN = C(N,2),
    * ARI = (2·SI·CN − 2·SA·SB) / (CN·(SA+SB) − 2·SA·SB) — computed on
    * exact integer products (decimal/hugeint) with ONE double division
    * at the end, so no floating intermediate exists anywhere.
    *
    * Scale shape: one corpus hash agg to the contingency grid
    * (clusters × labels, bounded); the combinatorics run on the grid.
    * (The exact products bound the auditable N to ~10^9 before
    * decimal(38) overflows — audit samples, not raw 100 TB corpora;
    * the docstring is the contract.) */
  val q364_clustering_ari = Q(
    "q364_clustering_ari",
    Some(s"""WITH b AS (
            |  SELECT ${lshBucketSql("(embedding::DOUBLE[])", AriPlanes)}
            |      AS cl, label
            |  FROM embeddings),
            |grid AS (
            |  SELECT cl, label, CAST(count(*) AS BIGINT) AS c
            |  FROM b GROUP BY cl, label),
            |si AS (SELECT CAST(sum(c * (c - 1) / 2) AS HUGEINT) AS si
            |       FROM grid),
            |sa AS (SELECT CAST(sum(a * (a - 1) / 2) AS HUGEINT) AS sa FROM
            |       (SELECT CAST(sum(c) AS BIGINT) AS a FROM grid GROUP BY cl)),
            |sb AS (SELECT CAST(sum(b2 * (b2 - 1) / 2) AS HUGEINT) AS sb FROM
            |       (SELECT CAST(sum(c) AS BIGINT) AS b2 FROM grid
            |        GROUP BY label)),
            |nn AS (SELECT CAST(sum(c) AS BIGINT) AS n,
            |         CAST(sum(c) * (sum(c) - 1) / 2 AS HUGEINT) AS cn
            |       FROM grid),
            |k AS (SELECT CAST(count(DISTINCT cl) AS BIGINT) AS n_clusters,
            |        CAST(count(DISTINCT label) AS BIGINT) AS n_labels
            |      FROM grid)
            |SELECT n, n_clusters, n_labels,
            |  round(CAST(2 * si * cn - 2 * sa * sb AS DOUBLE)
            |    / CAST(cn * (sa + sb) - 2 * sa * sb AS DOUBLE), 6) AS ari
            |FROM si CROSS JOIN sa CROSS JOIN sb CROSS JOIN nn
            |CROSS JOIN k""".stripMargin),
    (s, d) => {
      val emb = Tables.embeddings(s, d)
        .withColumn("e", col("embedding").cast("array<double>"))
      val grid = graft.operators.PlanCache.persist(emb
        .select(lshBucket(col("e"), AriPlanes).as("cl"), col("label"))
        .groupBy("cl", "label").agg(count(lit(1)).as("c")))
      def c2(x: org.apache.spark.sql.Column) =
        (x.cast("decimal(38,0)") * (x - 1)) / 2
      val si = grid.agg(sum(c2(col("c"))).cast("decimal(38,0)").as("si"))
      val sa = grid.groupBy("cl").agg(sum("c").cast("long").as("a"))
        .agg(sum(c2(col("a"))).cast("decimal(38,0)").as("sa"))
      val sb = grid.groupBy("label").agg(sum("c").cast("long").as("b2"))
        .agg(sum(c2(col("b2"))).cast("decimal(38,0)").as("sb"))
      val nn = grid.agg(sum("c").cast("long").as("n"))
        .select(col("n"), c2(col("n")).cast("decimal(38,0)").as("cn"))
      val k = grid.agg(countDistinct("cl").as("n_clusters"),
        countDistinct("label").as("n_labels"))
      broadcast(si).crossJoin(broadcast(sa)).crossJoin(broadcast(sb))
        .crossJoin(broadcast(nn)).crossJoin(broadcast(k))
        .select(col("n"), col("n_clusters"), col("n_labels"),
          round((lit(2) * col("si") * col("cn")
            - lit(2) * col("sa") * col("sb")).cast("double")
            / (col("cn") * (col("sa") + col("sb"))
              - lit(2) * col("sa") * col("sb")).cast("double"), 6)
            .as("ari"))
    })

  /** INT8 scalar quantization (per-dimension min–max, the vector-DB
    * storage workhorse: 64 B/vector instead of 256 B float32) with its
    * serving-quality audit: codes are `⌊(x−mn_d)·255/(mx_d−mn_d)+0.5⌋`
    * clamped to [0,255], candidate ranking uses the INTEGER code dot
    * product (exact arithmetic — no float drift can exist in the
    * quantized ranking), and recall@10 vs the exact float cosine top-10
    * is reported per query. Complements q78/q87 (product quantization —
    * codebook per subspace) with the simpler, rotation-free scheme real
    * systems try first. Constant dims quantize to 0 by the mx=mn guard.
    *
    * Scale shape: the per-dimension min/max "training" is ONE corpus agg
    * onto a 64-row grid, carried as a 1-row broadcast of two arrays (the
    * centroid-localization device — bounded metadata, no data collect);
    * quantization is a scan-side transform; the audit is the bounded-
    * query-batch brute shape (q38): 10 broadcast queries × one corpus
    * pass computing BOTH rankings, so exact-vs-quantized needs no second
    * scan. At 100 TB the same plan serves with the code column stored
    * and the float column only fetched for rerank. */
  val q373_int8_quant_recall = Q(
    "q373_int8_quant_recall",
    Some(s"""WITH e AS (
            |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            |dims AS (
            |  SELECT r.i AS i, min(v[r.i]) AS mn, max(v[r.i]) AS mx
            |  FROM e CROSS JOIN generate_series(1, 64) r(i) GROUP BY 1),
            |mm AS (SELECT list(mn ORDER BY i) AS mns,
            |              list(mx ORDER BY i) AS mxs FROM dims),
            |codes AS (
            |  SELECT vec_id, v,
            |    list_transform(generate_series(1, 64), i ->
            |      CASE WHEN mxs[i] = mns[i] THEN CAST(0 AS BIGINT)
            |        ELSE greatest(CAST(0 AS BIGINT), least(CAST(255 AS BIGINT),
            |          CAST(floor((v[i] - mns[i]) * 255 / (mxs[i] - mns[i])
            |            + 0.5) AS BIGINT))) END) AS c
            |  FROM e CROSS JOIN mm),
            |q AS (SELECT vec_id AS qid, v AS qv, c AS qc
            |      FROM codes WHERE vec_id % 50 = 0),
            |pairs AS (
            |  SELECT q.qid, s.vec_id AS vid,
            |    round(${cosineSql("s.v", "q.qv")}, 6) AS sim,
            |    list_reduce(list_transform(generate_series(1, 64),
            |      i -> q.qc[i] * s.c[i]), (x, y) -> x + y) AS qd
            |  FROM codes s CROSS JOIN q WHERE s.vec_id <> q.qid),
            |rk AS (
            |  SELECT qid, vid,
            |    ROW_NUMBER() OVER (PARTITION BY qid
            |      ORDER BY sim DESC, vid) AS erk,
            |    ROW_NUMBER() OVER (PARTITION BY qid
            |      ORDER BY qd DESC, vid) AS qrk
            |  FROM pairs)
            |SELECT qid,
            |  CAST(sum(CASE WHEN erk <= 10 AND qrk <= 10 THEN 1 ELSE 0 END)
            |    AS BIGINT) AS n_hit,
            |  CAST(sum(CASE WHEN erk <= 10 AND qrk <= 10 THEN 1 ELSE 0 END)
            |    AS DOUBLE) / 10 AS recall
            |FROM rk GROUP BY 1 ORDER BY qid""".stripMargin),
    (s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val dims = e.select(posexplode(col("v")).as(Seq("p", "x")))
        .groupBy("p").agg(min("x").as("mn"), max("x").as("mx"))
      val mm = dims.agg(
        expr("transform(array_sort(collect_list(struct(p, mn))), s -> s.mn)")
          .as("mns"),
        expr("transform(array_sort(collect_list(struct(p, mx))), s -> s.mx)")
          .as("mxs"))
      val codes = graft.operators.PlanCache.persist(
        e.crossJoin(broadcast(mm)).select(col("vec_id"), col("v"),
          expr("""transform(v, (x, i) ->
                 |  CASE WHEN mxs[i] = mns[i] THEN CAST(0 AS BIGINT)
                 |    ELSE greatest(CAST(0 AS BIGINT),
                 |      least(CAST(255 AS BIGINT),
                 |        CAST(floor((x - mns[i]) * 255 / (mxs[i] - mns[i])
                 |          + 0.5) AS BIGINT))) END)""".stripMargin).as("c")))
      val q = codes.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("qid"), col("v").as("qv"),
          col("c").as("qc"))
      val pairs = codes.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("vid"),
          round(cosine(col("v"), col("qv")), 6).as("sim"),
          expr("aggregate(zip_with(qc, c, (a, b) -> a * b), 0L, " +
            "(acc, x) -> acc + x)").as("qd"))
      val er = Window.partitionBy("qid").orderBy(col("sim").desc, col("vid"))
      val qr = Window.partitionBy("qid").orderBy(col("qd").desc, col("vid"))
      val hit = when(col("erk") <= 10 && col("qrk") <= 10, 1L).otherwise(0L)
      pairs
        .withColumn("erk", row_number().over(er))
        .withColumn("qrk", row_number().over(qr))
        .groupBy("qid")
        .agg(sum(hit).as("n_hit"))
        .select(col("qid"), col("n_hit"),
          (col("n_hit").cast("double") / 10).as("recall"))
        .orderBy("qid")
    })

  /** FACILITY-LOCATION greedy selection (submodular coverage — the
    * standard objective behind "pick k representative documents for
    * annotation/eval"): maximize Σ_corpus max_{s∈S} cos(v, s) over a
    * bounded candidate pool, greedily. The (1−1/e) guarantee makes the
    * greedy chain THE practical algorithm; this is the coverage-side
    * complement of q342's maximin (diversity) pick. Six rounds; each
    * round scores every remaining candidate by total covered similarity
    * given the current best-coverage vector and takes the argmax
    * (ties → smallest id). Similarities round at 6 and ride decimal,
    * so every round's argmax and the coverage curve are engine- and
    * order-identical; the pre-pick state is best = −1 (cosine's floor),
    * making round-1 gains a constant shift — argmax unaffected.
    *
    * Scale shape: ONE corpus×24-candidate similarity pass (the bounded
    * query-batch brute shape), persisted; each round is a corpus-keyed
    * join + candidate-grid agg + 1-row argmax fetch (the q342 device);
    * the per-round best vector is persisted to break the iteration-
    * lineage blowup (the q315 trap). */
  val q378_facility_location = Q(
    "q378_facility_location", {
      val rounds = (1 to 6).map { r =>
        val prev = if (r == 1) "best0" else s"best${r - 1}"
        val excl =
          if (r == 1) ""
          else "WHERE s.cand NOT IN (" +
            (1 until r).map(i => s"SELECT cand FROM pick$i")
              .mkString(" UNION ALL ") + ")"
        s"""pick$r AS (
           |  SELECT s.cand, sum(greatest(b.best, s.sim)) AS cov
           |  FROM $prev b JOIN base s ON s.vid = b.vid
           |  $excl
           |  GROUP BY 1 ORDER BY cov DESC, cand LIMIT 1),
           |best$r AS (
           |  SELECT b.vid, greatest(b.best, s.sim) AS best
           |  FROM $prev b JOIN base s ON s.vid = b.vid
           |   AND s.cand = (SELECT cand FROM pick$r))""".stripMargin
      }.mkString(",\n")
      val curve = (1 to 6).map(r =>
        s"SELECT $r AS pick, cand, cov FROM pick$r").mkString("\nUNION ALL ")
      Some(s"""WITH e AS (
           |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           |cands AS (SELECT vec_id AS cand, v AS cv FROM e
           |          WHERE vec_id < 24),
           |base AS (
           |  SELECT e.vec_id AS vid, c.cand,
           |    CAST(round(${cosineSql("e.v", "c.cv")}, 6)
           |      AS DECIMAL(10,6)) AS sim
           |  FROM e CROSS JOIN cands c),
           |best0 AS (
           |  SELECT vec_id AS vid, CAST(-1 AS DECIMAL(10,6)) AS best
           |  FROM e),
           |$rounds,
           |curve AS ($curve)
           |SELECT pick, cand AS chosen,
           |  CAST(CAST(cov AS DECIMAL(18,6)) AS DOUBLE) AS coverage,
           |  CAST(CAST(cov - coalesce(lag(cov) OVER (ORDER BY pick), cov)
           |    AS DECIMAL(18,6)) AS DOUBLE) AS gain
           |FROM curve ORDER BY pick""".stripMargin)
    },
    (s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val cands = e.filter(col("vec_id") < 24)
        .select(col("vec_id").as("cand"), col("v").as("cv"))
      val base = graft.operators.PlanCache.persist(
        e.crossJoin(broadcast(cands))
          .select(col("vec_id").as("vid"), col("cand"),
            round(cosine(col("v"), col("cv")), 6)
              .cast("decimal(10,6)").as("sim")))
      var best = graft.operators.PlanCache.persist(
        e.select(col("vec_id").as("vid"),
          lit(-1).cast("decimal(10,6)").as("best")))
      var chosen = List.empty[(Int, Long, java.math.BigDecimal)]
      for (r <- 1 to 6) {
        val taken = chosen.map(_._2)
        val scores = best.join(base, "vid")
          .filter(if (taken.isEmpty) lit(true)
            else !col("cand").isin(taken: _*))
          .groupBy("cand")
          .agg(sum(greatest(col("best"), col("sim"))).as("cov"))
          .orderBy(col("cov").desc, col("cand"))
          .limit(1).collect()(0)
        val pick = scores.getLong(0)
        val cov = scores.getDecimal(1)
        chosen = chosen :+ ((r, pick, cov))
        best = graft.operators.PlanCache.persist(
          best.join(base.filter(col("cand") === pick)
              .select(col("vid"), col("sim")), "vid")
            .select(col("vid"),
              greatest(col("best"), col("sim")).as("best")))
      }
      import s.implicits._
      val rowsOut = chosen.map { case (r, c, cov) =>
        (r, c, cov.doubleValue,
          if (r == 1) 0.0
          else cov.subtract(chosen(r - 2)._3).doubleValue)
      }
      rowsOut.toDF("pick", "chosen", "coverage", "gain")
        .select(col("pick").cast("int").as("pick"), col("chosen"),
          col("coverage"), col("gain"))
        .orderBy("pick")
    })

  /** GRID-DBSCAN density clustering (the cell-quantized DBSCAN every
    * scale-out system actually runs): embeddings project onto their
    * first two dimensions, a 16×16 grid bins them, cells with ≥ 3
    * points are CORE, clusters are 8-neighborhood connected components
    * of core cells (label = min linear cell id), non-core populated
    * cells adjacent to a core cell join as BORDER (min adjacent core
    * label), everything else is noise (cluster −1). Density clustering
    * finds non-convex shapes k-means (q179/q342) cannot, with no k.
    *
    * Scale shape: binning is scan-side; at 100 TB only the binning agg
    * touches data. The per-cell step runs on the driver over the
    * CONSTRUCTION-BOUNDED ≤ 256-row grid (same bounded-metadata regime
    * as Dedup.scala's sub-threshold union-find): union-find over core
    * 8-adjacency with min-cid labels, which is exactly the SQL twin's
    * reflexive-closure min(dst). The first draft instead unrolled the
    * closure as 8 in-plan squaring self-joins — Spark's
    * InjectRuntimeFilter then embeds a copy of the opposite side's full
    * lineage in a bloom subquery at EVERY squaring, so plan size grows
    * ~3× per iteration and the optimizer OOMs before any data moves;
    * a 256-cell graph is metadata, not a dataset, and is treated as
    * such. */
  val q380_grid_dbscan = Q(
    "q380_grid_dbscan", {
      val sq = (1 to 8).map { h =>
        s"""r$h AS (
           |  SELECT DISTINCT a.src, b.dst
           |  FROM r${h - 1} a JOIN r${h - 1} b ON a.dst = b.src)"""
          .stripMargin
      }.mkString(",\n")
      Some(s"""WITH e AS (
           |  SELECT vec_id, embedding[1]::DOUBLE AS x,
           |    embedding[2]::DOUBLE AS y
           |  FROM embeddings),
           |mm AS (SELECT min(x) AS mnx, max(x) AS mxx,
           |              min(y) AS mny, max(y) AS mxy FROM e),
           |cells AS (
           |  SELECT least(CAST(floor((x - mnx) * 16 / (mxx - mnx))
           |      AS BIGINT), 15) AS gx,
           |    least(CAST(floor((y - mny) * 16 / (mxy - mny))
           |      AS BIGINT), 15) AS gy,
           |    CAST(count(*) AS BIGINT) AS n
           |  FROM e CROSS JOIN mm GROUP BY 1, 2),
           |core AS (SELECT gx, gy, gx * 16 + gy AS cid, n
           |         FROM cells WHERE n >= 3),
           |edges AS (
           |  SELECT a.cid AS src, b.cid AS dst
           |  FROM core a JOIN core b
           |    ON abs(a.gx - b.gx) <= 1 AND abs(a.gy - b.gy) <= 1),
           |r0 AS (SELECT src, dst FROM edges),
           |$sq,
           |lab AS (SELECT src AS cid, min(dst) AS cluster
           |        FROM r8 GROUP BY 1),
           |border AS (
           |  SELECT c.gx, c.gy, c.n, min(l.cluster) AS cluster
           |  FROM cells c JOIN core k
           |    ON abs(c.gx - k.gx) <= 1 AND abs(c.gy - k.gy) <= 1
           |   AND c.n < 3
           |  JOIN lab l ON l.cid = k.cid
           |  GROUP BY 1, 2, 3),
           |assigned AS (
           |  SELECT l.cluster, CAST(1 AS BIGINT) AS is_core, c.n
           |  FROM core c JOIN lab l ON l.cid = c.cid
           |  UNION ALL
           |  SELECT cluster, CAST(0 AS BIGINT), n FROM border),
           |noise AS (
           |  SELECT CAST(-1 AS BIGINT) AS cluster,
           |    CAST(count(*) AS BIGINT) AS n_cells,
           |    CAST(coalesce(sum(n), 0) AS BIGINT) AS n_core_pts,
           |    CAST(0 AS BIGINT) AS n_border_pts
           |  FROM cells c
           |  WHERE NOT EXISTS (SELECT 1 FROM core k
           |    WHERE abs(c.gx - k.gx) <= 1 AND abs(c.gy - k.gy) <= 1))
           |SELECT cluster, CAST(count(*) AS BIGINT) AS n_cells,
           |  CAST(sum(CASE WHEN is_core = 1 THEN n ELSE 0 END) AS BIGINT)
           |    AS n_core_pts,
           |  CAST(sum(CASE WHEN is_core = 0 THEN n ELSE 0 END) AS BIGINT)
           |    AS n_border_pts
           |FROM assigned GROUP BY 1
           |UNION ALL SELECT * FROM noise
           |ORDER BY cluster""".stripMargin)
    },
    (s, d) => {
      import s.implicits._
      val e = Tables.embeddings(s, d).select(
        element_at(col("embedding"), 1).cast("double").as("x"),
        element_at(col("embedding"), 2).cast("double").as("y"))
      val mm = e.agg(min("x").as("mnx"), max("x").as("mxx"),
        min("y").as("mny"), max("y").as("mxy"))
      // The ONLY corpus pass: scan-side binning to the ≤256-cell grid.
      // Collecting that grid is bounded metadata by construction
      // (16×16 = 256 rows max regardless of input size).
      val grid: Array[(Long, Long, Long)] = e.crossJoin(broadcast(mm))
        .select(
          least(floor((col("x") - col("mnx")) * 16
            / (col("mxx") - col("mnx"))).cast("long"), lit(15L)).as("gx"),
          least(floor((col("y") - col("mny")) * 16
            / (col("mxy") - col("mny"))).cast("long"), lit(15L)).as("gy"))
        .groupBy("gx", "gy").agg(count(lit(1)).as("n"))
        .as[(Long, Long, Long)].collect()
      val core = grid.filter(_._3 >= 3)
      val cid = core.map { case (gx, gy, _) => gx * 16 + gy }
      val idx = cid.zipWithIndex.toMap
      // union-find over 8-adjacency of core cells, min-cid component
      // label == the SQL twin's reflexive-closure min(dst)
      val parent = Array.tabulate(core.length)(identity)
      def find(i: Int): Int = {
        var r = i; while (parent(r) != r) r = parent(r)
        var c = i
        while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      for (i <- core.indices; j <- core.indices
           if i < j && math.abs(core(i)._1 - core(j)._1) <= 1 &&
             math.abs(core(i)._2 - core(j)._2) <= 1) {
        val (ri, rj) = (find(i), find(j))
        if (ri != rj) parent(ri) = rj
      }
      val rootMin = core.indices.groupBy(find)
        .map { case (r, ms) => r -> ms.map(cid).min }
      val label = core.indices.map(i => rootMin(find(i))).toArray
      val coreRows = core.indices.map(i =>
        (label(i), 1L, core(i)._3))
      val borderRows = grid.filter(_._3 < 3).flatMap { case (gx, gy, n) =>
        val adj = core.indices.filter(i =>
          math.abs(core(i)._1 - gx) <= 1 && math.abs(core(i)._2 - gy) <= 1)
        if (adj.isEmpty) None else Some((adj.map(label).min, 0L, n))
      }
      val clustered = (coreRows ++ borderRows)
        .groupBy(_._1).toSeq.map { case (cl, rows) =>
          (cl, rows.size.toLong,
            rows.collect { case (_, 1L, n) => n }.sum,
            rows.collect { case (_, 0L, n) => n }.sum)
        }
      val noiseCells = grid.filter { case (gx, gy, _) =>
        !core.exists(k =>
          math.abs(k._1 - gx) <= 1 && math.abs(k._2 - gy) <= 1)
      }
      val noise = (-1L, noiseCells.length.toLong,
        noiseCells.map(_._3).sum, 0L)
      (clustered :+ noise)
        .toDF("cluster", "n_cells", "n_core_pts", "n_border_pts")
        .orderBy("cluster")
    })

  val all: Seq[Q] = Seq(q363_knn_shapley, q364_clustering_ari,
    q373_int8_quant_recall, q378_facility_location, q380_grid_dbscan)
}
