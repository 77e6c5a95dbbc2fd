package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFunctions.cosineSql

/** Vector ops, part 3: product quantization (operators/Similarity.pqTopK)
  * — the byte-budget half of a production ANN stack (q56/q57's IVF bounds
  * candidates; PQ bounds memory: m codes per vector instead of dim
  * doubles). Codebook = the deterministic first-16 vectors (the q56
  * stand-in convention that keeps the oracle replayable); encode and ADC
  * arithmetic are mirrored exactly in SQL.
  */
object VectorOps3 {

  private val M = 4        // subspaces
  private val L = 16       // dims per subspace (M * L = Dim = 64)
  private val NCodes = 16

  private def l2SliceSql(s: Int): String =
    s"list_sum(list_transform(generate_series(1, $L), " +
      s"j -> (e.v[${s * L} + j] - cb.cv[${s * L} + j]) * " +
      s"(e.v[${s * L} + j] - cb.cv[${s * L} + j])))"

  private def dotSliceSql(s: Int): String =
    s"list_sum(list_transform(generate_series(1, $L), " +
      s"j -> qv[${s * L} + j] * b$s.cv[${s * L} + j]))"

  /** The q78 ADC serving query as replayed SQL (DuckDB cannot correlate
    * an outer table into a lambda inside a scalar subquery — the
    * per-subspace argmin is a cross join + row_number instead, the q56
    * assignment idiom). Shared by q78 (LIMIT 5) and q128's first stage
    * (LIMIT 20 candidate pool). */
  private def adcQuerySql(limit: Int): String = {
    val encCtes = (0 until M).map(s =>
      s"""r$s AS (
         |  SELECT e.vec_id, cb.code, ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |    ORDER BY round(${l2SliceSql(s)}, 6) ASC, cb.code) AS rn
         |  FROM e CROSS JOIN cb WHERE e.vec_id <> 0),
         |k$s AS (SELECT vec_id, code AS code_$s FROM r$s WHERE rn = 1)""".stripMargin)
      .mkString(",\n")
    val encJoins = (0 until M).map(s =>
      s"JOIN k$s ON e.vec_id = k$s.vec_id").mkString(" ")
    val joins = (0 until M).map(s =>
      s"JOIN cb b$s ON enc.code_$s = b$s.code").mkString("\n  ")
    val adc = (0 until M).map(dotSliceSql).mkString(" + ")
    s"""WITH e AS (
       |  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
       |cb AS (SELECT vec_id AS code, v AS cv FROM e WHERE vec_id < $NCodes),
       |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
       |$encCtes,
       |enc AS (
       |  SELECT e.vec_id, e.label,
       |    ${(0 until M).map(s => s"code_$s").mkString(", ")}
       |  FROM e $encJoins)
       |SELECT enc.vec_id, enc.label,
       |  ${(0 until M).map(s => s"enc.code_$s").mkString(", ")},
       |  round($adc, 6) AS adc
       |FROM enc
       |  $joins
       |  CROSS JOIN q
       |ORDER BY adc DESC, vec_id
       |LIMIT $limit""".stripMargin
  }

  private def embFrame(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.embeddings(s, d)
      .withColumn("e", col("embedding").cast("array<double>"))

  /** The q78 ADC serving call, shared with q128's candidate stage so the
    * codebook convention (first-NCodes stand-in, double cast) cannot
    * drift between the scorer and the reranker's pool. */
  private def adcTopK(emb: org.apache.spark.sql.DataFrame, k: Int) =
    graft.operators.Similarity.pqTopK(
      emb.filter(col("vec_id") =!= 0).select("vec_id", "label", "e"),
      "vec_id", "e",
      emb.filter(col("vec_id") < NCodes)
        .select(col("vec_id").as("code"), col("e").as("cvec")),
      "code", "cvec",
      emb.filter(col("vec_id") === 0), "e",
      k = k, m = M, dim = M * L)

  val q78_pq_adc = Q(
    "q78_pq_adc",
    Some(adcQuerySql(5)),
    (s, d) => adcTopK(embFrame(s, d), 5))

  private val KCodes = 8
  private val Iters = 1

  /** One replayed L2 k-means iteration for subspace `s`: assign every
    * slice to its nearest codeword (argmin rounded L2², ties to lowest
    * cid), then per-dimension decimal-exact means — the SQL mirror of
    * `Similarity.trainCentroidsL2` on the slice frame. */
  private def pqTrainSql(s: Int, i: Int): String = {
    val off = s * L
    val l2 = s"list_sum(list_transform(generate_series(1, $L), " +
      s"j -> (e.v[$off + j] - c.cv[j]) * (e.v[$off + j] - c.cv[j])))"
    s"""a$s$i AS (
       |  SELECT e.vec_id, c.cid, ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |    ORDER BY round($l2, 6) ASC, c.cid) AS rn
       |  FROM e CROSS JOIN cb$s$i c),
       |m$s$i AS (SELECT vec_id, cid FROM a$s$i WHERE rn = 1),
       |d$s$i AS (
       |  SELECT cid, j,
       |    CAST(sum(CAST(e.v[$off + j] AS DECIMAL(28,10))) AS DOUBLE)
       |      / count(*) AS m
       |  FROM m$s$i JOIN e ON m$s$i.vec_id = e.vec_id
       |    CROSS JOIN generate_series(1, $L) t(j)
       |  GROUP BY cid, j),
       |cb$s${i + 1} AS (SELECT cid, list(m ORDER BY j) AS cv FROM d$s$i GROUP BY cid)""".stripMargin
  }

  /** PQ over TRAINED per-subspace codebooks: `trainCentroidsL2` runs
    * Lloyd's on each slice of the corpus (decimal-exact means ⇒
    * bit-deterministic), and the oracle replays training + encode + ADC
    * entirely in SQL — the trained compression index itself is
    * hash-checked, completing the q57 story for the PQ axis. */
  val q87_pq_trained = Q(
    "q87_pq_trained", {
      val trainCtes = (0 until M).map(s =>
        (0 until Iters).map(i => pqTrainSql(s, i)).mkString(",\n")).mkString(",\n")
      val encCtes = (0 until M).map { s =>
        val off = s * L
        val l2 = s"list_sum(list_transform(generate_series(1, $L), " +
          s"j -> (e.v[$off + j] - c.cv[j]) * (e.v[$off + j] - c.cv[j])))"
        s"""r$s AS (
           |  SELECT e.vec_id, c.cid AS code, ROW_NUMBER() OVER (PARTITION BY e.vec_id
           |    ORDER BY round($l2, 6) ASC, c.cid) AS rn
           |  FROM e CROSS JOIN cb$s$Iters c WHERE e.vec_id <> 0),
           |k$s AS (SELECT vec_id, code AS code_$s FROM r$s WHERE rn = 1)""".stripMargin
      }.mkString(",\n")
      val encJoins = (0 until M).map(s =>
        s"JOIN k$s ON e.vec_id = k$s.vec_id").mkString(" ")
      val joins = (0 until M).map(s =>
        s"JOIN cb$s$Iters b$s ON enc.code_$s = b$s.cid").mkString("\n  ")
      val adc = (0 until M).map { s =>
        val off = s * L
        s"list_sum(list_transform(generate_series(1, $L), j -> qv[$off + j] * b$s.cv[j]))"
      }.mkString(" + ")
      val cb0s = (0 until M).map { s =>
        val off = s * L
        s"cb${s}0 AS (SELECT vec_id AS cid, v[${off + 1}:${off + L}] AS cv FROM e ORDER BY vec_id LIMIT $KCodes)"
      }.mkString(",\n")
      Some(s"""WITH e AS (
              |  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
              |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
              |$cb0s,
              |$trainCtes,
              |$encCtes,
              |enc AS (
              |  SELECT e.vec_id, e.label,
              |    ${(0 until M).map(s => s"code_$s").mkString(", ")}
              |  FROM e $encJoins)
              |SELECT enc.vec_id, enc.label,
              |  ${(0 until M).map(s => s"enc.code_$s").mkString(", ")},
              |  round($adc, 6) AS adc
              |FROM enc
              |  $joins
              |  CROSS JOIN q
              |ORDER BY adc DESC, vec_id
              |LIMIT 5""".stripMargin)
    },
    (s, d) => {
      val emb = Tables.embeddings(s, d)
        .withColumn("e", col("embedding").cast("array<double>"))
      // joint training: ONE corpus pass per iteration covers all M
      // subspaces (per-subspace results identical — the oracle replays
      // each subspace's Lloyd's independently and still hash-matches)
      val cbs = graft.operators.Similarity.trainPqCodebooksL2(
          emb.select(col("vec_id"), col("e")), "vec_id", "e",
          m = M, k = KCodes, iters = Iters, dim = M * L)
        .map(_.select(col("cid").as("code"), col("cvec")))
      graft.operators.Similarity.pqTopKWithCodebooks(
        emb.filter(col("vec_id") =!= 0).select("vec_id", "label", "e"),
        "vec_id", "e", cbs, "code", "cvec",
        emb.filter(col("vec_id") === 0), "e",
        k = 5, dim = M * L)
    })

  private val KnnK = 15

  /** k-NN label vote — the classification read of the similarity index:
    * the query's top-15 cosine neighbors vote on a label (count desc,
    * ties to the lexicographically first label). Pure composition:
    * broadcast query + TakeOrderedAndProject top-k + one k-row agg. */
  val q93_knn_label = Q(
    "q93_knn_label",
    Some(s"""WITH e AS (
            |  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
            |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
            |top AS (
            |  SELECT label FROM e CROSS JOIN q
            |  WHERE vec_id <> 0
            |  ORDER BY round(${cosineSql("v", "qv")}, 6) DESC, vec_id
            |  LIMIT $KnnK)
            |SELECT label AS predicted, CAST(count(*) AS BIGINT) AS votes
            |FROM top GROUP BY label
            |ORDER BY votes DESC, predicted
            |LIMIT 1""".stripMargin),
    (s, d) => {
      val emb = Tables.embeddings(s, d)
        .withColumn("e", col("embedding").cast("array<double>"))
      graft.operators.Similarity.cosineTopK(
          emb.filter(col("vec_id") =!= 0).select("vec_id", "label", "e"),
          "e", emb.filter(col("vec_id") === 0), "e", KnnK, "vec_id")
        .groupBy(col("label").as("predicted"))
        .agg(count(lit(1)).as("votes"))
        .orderBy(col("votes").desc, col("predicted"))
        .limit(1)
    })

  private val RerankPool = 20
  private val RerankK = 5

  /** Two-stage retrieval (the production ANN serving pattern): PQ/ADC
    * scores a compressed index to shortlist a candidate pool, then the
    * pool alone is re-ranked with EXACT cosines against the full-
    * precision vectors — approximate scoring touches everything, exact
    * arithmetic touches only pool-size rows. At 100 TB the pool join is
    * 20 ids against the corpus (a broadcast semi-shape), so the full
    * vectors are read for 20 rows, not N. Oracle: replay ADC (q78's
    * SQL), pool LIMIT 20, exact-cosine rerank. */
  val q128_pq_rerank = Q(
    "q128_pq_rerank",
    Some(s"""WITH cand AS (
            |${adcQuerySql(RerankPool)}
            |),
            |e2 AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
            |q2 AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
            |SELECT c.vec_id, c.label, round(${cosineSql("e2.v", "qv")}, 6) AS sim
            |FROM cand c
            |JOIN e2 ON e2.vec_id = c.vec_id
            |CROSS JOIN q2
            |ORDER BY sim DESC, c.vec_id
            |LIMIT $RerankK""".stripMargin),
    (s, d) => {
      val emb = embFrame(s, d)
      val corpus = emb.filter(col("vec_id") =!= 0).select("vec_id", "label", "e")
      val cand = adcTopK(emb, RerankPool).select("vec_id")
      cand.join(corpus, "vec_id")
        .crossJoin(broadcast(
          emb.filter(col("vec_id") === 0).select(col("e").as("qe"))))
        .select(col("vec_id"), col("label"),
          round(graft.functions.VectorFunctions.cosine(col("e"), col("qe")), 6)
            .as("sim"))
        .orderBy(col("sim").desc, col("vec_id"))
        .limit(RerankK)
    })

  /** Int8 scalar-quantization audit: per-vector min/max affine
    * quantization to 255 levels (the standard embedding-store
    * compression), reporting per label the reconstruction MSE and the
    * worst absolute element error. Everything is scan-side per-row
    * arithmetic — the elementwise dequantization error is a strict
    * left-fold in BOTH engines (aggregate() vs list_reduce — identical
    * operation order ⇒ identical doubles), per-row results cross rows
    * only through exact DECIMAL sums. Degenerate constant vectors
    * (max = min) quantize exactly (zero error) by convention. */
  val q211_int8_quant = Q(
    "q211_int8_quant",
    Some("""WITH q AS (
           |  SELECT label,
           |    CASE WHEN list_max(embedding::DOUBLE[]) = list_min(embedding::DOUBLE[])
           |      THEN 0.0 ELSE
           |      list_reduce(list_transform(embedding::DOUBLE[], x ->
           |        (x - (list_min(embedding::DOUBLE[])
           |           + round((x - list_min(embedding::DOUBLE[]))
           |               / ((list_max(embedding::DOUBLE[]) - list_min(embedding::DOUBLE[])) / 255), 0)
           |             * ((list_max(embedding::DOUBLE[]) - list_min(embedding::DOUBLE[])) / 255)))
           |        * (x - (list_min(embedding::DOUBLE[])
           |           + round((x - list_min(embedding::DOUBLE[]))
           |               / ((list_max(embedding::DOUBLE[]) - list_min(embedding::DOUBLE[])) / 255), 0)
           |             * ((list_max(embedding::DOUBLE[]) - list_min(embedding::DOUBLE[])) / 255)))),
           |        (a, b) -> a + b) END AS sse,
           |    CASE WHEN list_max(embedding::DOUBLE[]) = list_min(embedding::DOUBLE[])
           |      THEN 0.0 ELSE
           |      list_max(list_transform(embedding::DOUBLE[], x ->
           |        abs(x - (list_min(embedding::DOUBLE[])
           |          + round((x - list_min(embedding::DOUBLE[]))
           |              / ((list_max(embedding::DOUBLE[]) - list_min(embedding::DOUBLE[])) / 255), 0)
           |            * ((list_max(embedding::DOUBLE[]) - list_min(embedding::DOUBLE[])) / 255))))) END
           |      AS max_err
           |  FROM embeddings)
           |SELECT label, CAST(count(*) AS BIGINT) AS n,
           |  round(CAST(sum(CAST(sse AS DECIMAL(28,14))) AS DOUBLE) / count(*), 8)
           |    AS avg_sse,
           |  round(max(max_err), 8) AS worst_abs_err
           |FROM q GROUP BY label ORDER BY label""".stripMargin),
    (s, d) => {
      val e = col("embedding").cast("array<double>")
      val mn = array_min(e)
      val mx = array_max(e)
      val sc = (mx - mn) / 255
      def errExpr(x: Column): Column = x - (mn + round((x - mn) / sc, 0) * sc)
      val sse = when(mx === mn, lit(0.0)).otherwise(
        aggregate(transform(e, x => errExpr(x) * errExpr(x)),
          lit(0.0), (acc, v) => acc + v))
      val maxErr = when(mx === mn, lit(0.0)).otherwise(
        array_max(transform(e, x => abs(errExpr(x)))))
      Tables.embeddings(s, d)
        .select(col("label"), sse.as("sse"), maxErr.as("max_err"))
        .groupBy("label")
        .agg(count(lit(1)).as("n"),
          round(sum(col("sse").cast("decimal(28,14)")).cast("double")
            / count(lit(1)), 8).as("avg_sse"),
          round(max(col("max_err")), 8).as("worst_abs_err"))
        .orderBy("label")
    })

  val all: Seq[Q] = Seq(q78_pq_adc, q87_pq_trained, q93_knn_label,
    q128_pq_rerank, q211_int8_quant)
}
