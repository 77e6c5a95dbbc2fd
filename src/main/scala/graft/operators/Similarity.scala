package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
      .select(keep.toIndexedSeq.map(col) :+
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
      .select(keep.toIndexedSeq.map(col) :+
        round(cosine(col(vecCol), col("__qe")), 6).as("sim"): _*)
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** Pack a (cid, cvec) centroid frame into ONE broadcastable row holding
    * array<struct<__cid,__cvec>> — attaching it to a scan is a broadcast
    * nested-loop join with a single-row build side: no shuffle, no row
    * expansion, and nearest-centroid assignment becomes a pure scan-side
    * expression.
    *
    * Fail-loud guard: the global `collect_list` agg still yields one row
    * for an EMPTY centroid frame, and every downstream argmax fold would
    * then return its sentinel seed (cid 0, sim −2.0) — silently assigning
    * every row of a batch that arrived before training. The guard rides
    * INSIDE the packed row (`raise_error` on an empty array), so it costs
    * zero extra Spark jobs and fires on whichever query first consumes the
    * untrained index (ADVICE r8: the former eager `require(!isEmpty)` in
    * `assignCells` executed the centroid plan once per call just to
    * check). */
  private def packCentroids(centroids: DataFrame,
      cidCol: String, cvecCol: String): DataFrame =
    broadcast(centroids
      .select(struct(col(cidCol).cast("long").as("__cid"),
        col(cvecCol).as("__cvec")).as("__c"))
      .agg(collect_list(col("__c")).as("__cents"))
      .select(when(size(col("__cents")) > 0, col("__cents"))
        .otherwise(raise_error(lit(
          "packCentroids: centroid frame is empty — train centroids " +
            "before use (an empty index would silently assign every row " +
            "to the argmax sentinel)"))).as("__cents")))

  /** Scan-side nearest-centroid assignment, given the packed `__cents`
    * array: argmax of round(cosine, 6), ties to the LOWEST cid, as ONE
    * fold — score each centroid exactly once (k cosines per row), then
    * reduce with a [bestSim, bestCid] running pair. Zero shuffle, zero
    * windows. Two deliberate representation choices: no struct field
    * names inside lambdas (the analyzer strips those aliases — positional
    * array access instead; cid is exact in double up to 2^53), and no
    * column that is referenced twice (CollapseProject would inline the
    * k-cosine array into every per-element re-reference, turning O(k)
    * into O(k^2) cosines per row). Adds `__cid`. */
  private def withNearestCid(df: DataFrame, vec: Column): DataFrame =
    df.withColumn("__cid", aggregate(
      transform(col("__cents"), c =>
        array(round(cosine(vec, c("__cvec")), 6), c("__cid").cast("double"))),
      array(lit(-2.0), lit(0.0)),
      (acc, p) => when(p(0) > acc(0) ||
        (p(0) === acc(0) && p(1) < acc(1)), p).otherwise(acc),
      acc => acc(1).cast("long")))

  /** IVF-style ANN: assign every vector to its nearest centroid (argmax
    * cosine, tie-broken by lowest centroid id), then search only the
    * query's nProbe nearest clusters. Centroids travel as one packed
    * broadcast row; both the corpus assignment and the query's probe
    * ranking are scan-side expressions (no crossJoin expansion, no
    * window) — the cluster equi-join carries the only data movement, and
    * it is itself a broadcast of the tiny probe side. Callers pass any
    * (cid, cvec) centroid frame — `trainCentroids` or their own. */
  def ivfTopK(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, cidCol: String, cvecCol: String,
      query: DataFrame, queryVecCol: String,
      k: Int, nProbe: Int): DataFrame = {
    val packed = packCentroids(centroids, cidCol, cvecCol)
    val assigned = withNearestCid(corpus.crossJoin(packed), col(vecCol))
      .drop("__cents")
    // Query probe list: sort struct(-sim, cid) ascending = sim desc, cid
    // asc — rank order without a window — and take the first nProbe.
    val probes = query.select(col(queryVecCol).as("__qe"))
      .crossJoin(packed)
      .select(col("__qe"), explode(slice(array_sort(
        transform(col("__cents"), c =>
          struct((-round(cosine(col("__qe"), c("__cvec")), 6)).as("ns"),
            c("__cid").as("cid")))), 1, nProbe)).as("p"))
      .select(col("__qe"), col("p.cid").as("__cid"))
    val keep = corpus.columns.filter(_ != vecCol)
    assigned.join(broadcast(probes), Seq("__cid"))
      .select(keep.toIndexedSeq.map(col) :+
        round(cosine(col(vecCol), col("__qe")), 6).as("sim"): _*)
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** Per-cell IVF population & dispersion audit — the cell-BALANCE
    * report behind any IVF deployment decision (a hot cell turns nProbe
    * search back into brute force; an empty cell wastes a probe slot).
    * Same packed-broadcast scan-side argmax as `ivfTopK`, but the fold
    * keeps the [bestSim, bestCid] pair so each row emits its cell AND
    * its cosine distance to the assigned centroid in one pass. The pair
    * column is referenced twice, which CollapseProject inlines into two
    * folds per row — a deliberate constant-factor trade (2k cosines)
    * that keeps the plan shuffle-free below the final cid-keyed agg.
    * Distances are 6-decimal by construction, so the per-cell mean sums
    * them in exact DECIMAL. */
  def ivfCellProfile(corpus: DataFrame, vecCol: String,
      centroids: DataFrame, cidCol: String, cvecCol: String): DataFrame = {
    val packed = packCentroids(centroids, cidCol, cvecCol)
    corpus.crossJoin(packed)
      .withColumn("__pair", aggregate(
        transform(col("__cents"), c =>
          array(round(cosine(col(vecCol), c("__cvec")), 6),
            c("__cid").cast("double"))),
        array(lit(-2.0), lit(0.0)),
        (acc, p) => when(p(0) > acc(0) ||
          (p(0) === acc(0) && p(1) < acc(1)), p).otherwise(acc)))
      .select(col("__pair")(1).cast("long").as("cid"),
        (lit(1.0) - col("__pair")(0)).as("dist"))
      .groupBy("cid")
      .agg(count(lit(1)).as("n"),
        round(sum(col("dist").cast("decimal(18,6)")).cast("double")
          / count(lit(1)), 6).as("mean_dist"),
        round(max(col("dist")), 6).as("max_dist"))
      .orderBy("cid")
  }

  /** Per-vector cell assignment against a FIXED centroid set — the
    * incremental index-maintenance primitive: each arriving batch of
    * embeddings is assigned to the already-trained centroids and
    * appended to the lake-held membership table, so a growing corpus
    * never retrains or re-scans old batches (the ANN analogue of
    * `Dedup.incrementalNearDupStep`). One scan-side packed-broadcast
    * argmax fold per row (the `ivfTopK` shape): no window, no corpus
    * shuffle, centroids ride in as one array row. Returns every corpus
    * column (including the vector — callers drop it if the membership
    * table stores ids only) + (`cid`, `csim`) where csim is the
    * round-6 cosine to the owning centroid (ties to the lowest cid). */
  def assignCells(corpus: DataFrame, vecCol: String,
      centroids: DataFrame, cidCol: String, cvecCol: String): DataFrame = {
    // An untrained (empty) index fails loudly at execution time via the
    // raise_error guard packCentroids embeds in the packed row — no
    // eager emptiness job here (ADVICE r8).
    val packed = packCentroids(centroids, cidCol, cvecCol)
    corpus.crossJoin(packed)
      .withColumn("__pair", aggregate(
        transform(col("__cents"), c =>
          array(round(cosine(col(vecCol), c("__cvec")), 6),
            c("__cid").cast("double"))),
        array(lit(-2.0), lit(0.0)),
        (acc, p) => when(p(0) > acc(0) ||
          (p(0) === acc(0) && p(1) < acc(1)), p).otherwise(acc)))
      .select(corpus.columns.toIndexedSeq.map(col) :+
        col("__pair")(1).cast("long").as("cid") :+
        col("__pair")(0).as("csim"): _*)
  }

  /** Batched IVF ANN: ONE corpus pass serves a whole query batch — the
    * production serving shape, where per-query scans (q56) would repeat
    * the corpus read |batch| times. Corpus assignment is the same
    * scan-side argmax as `ivfTopK`; every query's nProbe list joins in as
    * one broadcast (probe rows = |batch|·nProbe, KB-scale for real
    * batches); per-query ranking is ONE window keyed on the query id over
    * candidates only — the sole shuffle whose volume is the candidate
    * set, never the corpus. Returns (qid, rk, <corpus cols>, sim). */
  def ivfTopKBatch(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, cidCol: String, cvecCol: String,
      queries: DataFrame, qidCol: String, queryVecCol: String,
      k: Int, nProbe: Int): DataFrame = {
    val packed = packCentroids(centroids, cidCol, cvecCol)
    val assigned = withNearestCid(corpus.crossJoin(packed), col(vecCol))
      .drop("__cents")
    val probes = queries
      .select(col(qidCol).as("__qid"), col(queryVecCol).as("__qe"))
      .crossJoin(packed)
      .select(col("__qid"), col("__qe"), explode(slice(array_sort(
        transform(col("__cents"), c =>
          struct((-round(cosine(col("__qe"), c("__cvec")), 6)).as("ns"),
            c("__cid").as("cid")))), 1, nProbe)).as("p"))
      .select(col("__qid"), col("__qe"), col("p.cid").as("__cid"))
    val keep = corpus.columns.filter(_ != vecCol)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__qid").orderBy(col("sim").desc, col(idCol).asc)
    assigned.join(broadcast(probes), Seq("__cid"))
      .select(col("__qid") +: keep.toIndexedSeq.map(col) :+
        round(cosine(col(vecCol), col("__qe")), 6).as("sim"): _*)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("__qid").as("qid") +: col("rk") +:
        keep.toIndexedSeq.map(col) :+ col("sim"): _*)
  }

  /** Deterministic distributed k-means (Lloyd's) for IVF centroids.
    *
    * Init = the k lowest-id vectors (cid keeps the seed vector's id); each
    * iteration reassigns via the same scan-side argmax as `ivfTopK` and
    * recomputes per-dimension means with EXACT decimal sums, so the result
    * is bit-identical under any partitioning / partial-agg order — the
    * property that keeps a trained index reproducible across cluster runs
    * (and lets a DuckDB oracle replay the same iterations). Clusters that
    * lose all members drop out (k may shrink), matching the replayed SQL.
    *
    * Shape at scale: per iteration, one broadcast of k packed centroids +
    * one hash agg keyed (cid, dim) — no windows, no crossJoin expansion;
    * the k×dim result is collected only into the next broadcast. */
  def trainCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, dim: Int): DataFrame = {
    var cents = localize(corpus.orderBy(col(idCol)).limit(k)
      .select(col(idCol).cast("long").as("cid"), col(vecCol).as("cvec")))
    for (_ <- 0 until iters) {
      val assigned =
        withNearestCid(corpus.crossJoin(packCentroids(cents, "cid", "cvec")),
          col(vecCol))
        .select(col("__cid").as("cid"),
          posexplode(col(vecCol)).as(Seq("pos", "x")))
      cents = localize(assigned
        .groupBy(col("cid"), col("pos"))
        .agg((sum(col("x").cast("decimal(28,10)")).cast("double") /
          count(lit(1))).as("m"))
        .groupBy(col("cid"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cid"), transform(col("pm"), p => p("m")).as("cvec")))
    }
    cents
  }

  /** Collapse a tiny frame's lineage into a LocalRelation. A trained
    * centroid set is k×dim doubles of index metadata — without this, every
    * consumer branch (corpus assignment, query probes, the next Lloyd's
    * iteration) re-executes the full training lineage, multiplying whole
    * corpus passes at scale. Rows are ordered by the first column so the
    * local data is deterministic. (The "no driver collect" rule targets
    * data paths; an ANN index's centroid table is the canonical
    * broadcast-side exception.) */
  private def localize(df: DataFrame): DataFrame = {
    import scala.jdk.CollectionConverters._
    val rows = df.orderBy(col(df.columns.head)).collect().toList
    df.sparkSession.createDataFrame(rows.asJava, df.schema)
  }

  /** Squared L2 distance — native codegen'd kernel (functions.L2Sq),
    * bit-identical to the zipped lambda fold it replaced (same
    * left-to-right index-order additions; the lambda form stays the
    * oracle's formulation, parity-spec'd in VectorExpressionsSpec). */
  private def l2sq(a: Column, b: Column): Column = {
    val br = org.apache.spark.sql.GraftBridge
    br.column(graft.functions.L2Sq(br.expression(a), br.expression(b)))
  }

  /** Scan-side nearest-CODE assignment for one PQ subspace: argmin of
    * round(L2², 6) over the packed sub-codebook, ties to the LOWEST code —
    * the same single-fold / positional-struct discipline as
    * `withNearestCid` (argmin instead of argmax, L2 instead of cosine). */
  private def withNearestCode(df: DataFrame, vecSlice: Column,
      centsCol: String, outCol: String): DataFrame =
    df.withColumn(outCol, aggregate(
      transform(col(centsCol), c =>
        array(round(l2sq(vecSlice, c("__cvec")), 6), c("__cid").cast("double"))),
      array(lit(Double.MaxValue), lit(0.0)),
      (acc, p) => when(p(0) < acc(0) ||
        (p(0) === acc(0) && p(1) < acc(1)), p).otherwise(acc),
      acc => acc(1).cast("long")))

  /** Deterministic k-means under SQUARED-L2 assignment (the PQ training
    * metric): same init (k lowest-id vectors), same decimal-exact means,
    * and the same bit-determinism contract as `trainCentroids` — only the
    * assignment rule differs (argmin round(L2², 6), ties to lowest cid).
    * Used per PQ subspace on SLICE frames; an oracle replays it in SQL. */
  def trainCentroidsL2(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    var cents = localize(corpus.orderBy(col(idCol)).limit(k)
      .select(col(idCol).cast("long").as("cid"), col(vecCol).as("cvec")))
    for (_ <- 0 until iters) {
      val assigned = withNearestCode(
          corpus.crossJoin(packCentroids(cents, "cid", "cvec")),
          col(vecCol), "__cents", "__cid")
        .select(col("__cid").as("cid"),
          posexplode(col(vecCol)).as(Seq("pos", "x")))
      cents = localize(assigned
        .groupBy(col("cid"), col("pos"))
        .agg((sum(col("x").cast("decimal(28,10)")).cast("double") /
          count(lit(1))).as("m"))
        .groupBy(col("cid"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cid"), transform(col("pm"), p => p("m")).as("cvec")))
    }
    cents
  }

  /** Train ALL m PQ sub-codebooks jointly — ONE corpus pass per Lloyd's
    * iteration instead of m: a single scan computes every subspace's
    * nearest-code fold (m·k L2² kernels per row), the persisted encoded
    * frame feeds all m mean aggregations keyed (sub, cid, pos), and one
    * m·k-row collect seeds the next iteration's broadcasts. Identical
    * results to training each subspace alone (subspaces are independent —
    * q87's per-subspace SQL oracle still hash-matches), but at 100 TB the
    * dominant cost is corpus scans, and this does iters of them, not
    * m·iters. Returns one (cid, cvec) frame per subspace. */
  def trainPqCodebooksL2(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int, iters: Int, dim: Int): Seq[DataFrame] = {
    require(m >= 1 && dim % m == 0, s"dim $dim must split evenly into $m subspaces")
    val l = dim / m
    // ONE corpus-head collect seeds every subspace (r16): the first-k
    // rows are localized once with the full vector and the m sub-books
    // are driver-local slices — the per-subspace form ran m TakeOrdered
    // jobs over the corpus for the identical k rows.
    val seed = localize(corpus.orderBy(col(idCol)).limit(k)
      .select(col(idCol).cast("long").as("cid"), col(vecCol).as("__v")))
    var books: Seq[DataFrame] = (0 until m).map(s =>
      seed.select(col("cid"), slice(col("__v"), s * l + 1, l).as("cvec")))
    for (_ <- 0 until iters) {
      val encoded = books.zipWithIndex.foldLeft(corpus) { case (df, (cb, s)) =>
        val packed = packCentroids(cb, "cid", "cvec")
          .withColumnRenamed("__cents", s"__cents_$s")
        withNearestCode(df.crossJoin(packed),
          slice(col(vecCol), s * l + 1, l), s"__cents_$s", s"__code_$s")
          .drop(s"__cents_$s")
      }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val perSub = (0 until m).map(s =>
        encoded.select(lit(s).as("sub"), col(s"__code_$s").as("cid"),
          posexplode(slice(col(vecCol), s * l + 1, l)).as(Seq("pos", "x"))))
      val means = localize(perSub.reduce(_ unionByName _)
        .groupBy(col("sub"), col("cid"), col("pos"))
        .agg((sum(col("x").cast("decimal(28,10)")).cast("double") /
          count(lit(1))).as("m"))
        .groupBy(col("sub"), col("cid"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("sub"), col("cid"), transform(col("pm"), p => p("m")).as("cvec")))
      encoded.unpersist()
      books = (0 until m).map(s =>
        means.filter(col("sub") === s).select(col("cid"), col("cvec")))
    }
    books
  }

  /** Product quantization + asymmetric-distance top-k — the memory half
    * of a 100 TB ANN serving stack (IVF bounds the candidates searched;
    * PQ bounds the BYTES kept per vector: m small codes instead of dim
    * doubles, a 64× compression at m=4/dim=64).
    *
    * Encode: the vector splits into m contiguous dim/m-slices; each slice
    * becomes the id of its nearest sub-codeword (L2², rounded, ties to
    * the lowest code) — one scan-side fold per subspace over the packed
    * broadcast codebook, zero shuffle, query-independent (encode once,
    * serve forever). Serve: ADC inner product — score ≈ Σₛ ⟨query slice,
    * codeword slice⟩, reconstructed through m broadcast joins against the
    * k-row sub-codebooks, then TakeOrderedAndProject. The codebook here is
    * any (code, full-dim vector) frame; sub-codewords are its slices
    * (q78 uses the deterministic first-k stand-in, as q56 does —
    * `trainCentroids` on slices is the trained path). */
  def pqTopK(corpus: DataFrame, idCol: String, vecCol: String,
      codebook: DataFrame, codeCol: String, cvecCol: String,
      query: DataFrame, queryVecCol: String,
      k: Int, m: Int, dim: Int): DataFrame = {
    require(dim % m == 0, s"dim $dim must split evenly into $m subspaces")
    val l = dim / m
    pqTopKWithCodebooks(corpus, idCol, vecCol,
      (0 until m).map(s => codebook.select(col(codeCol),
        slice(col(cvecCol), s * l + 1, l).as(cvecCol))),
      codeCol, cvecCol, query, queryVecCol, k, dim)
  }

  /** PQ over PER-SUBSPACE codebooks — each a (code, dim/m-length slice
    * vector) frame, e.g. `trainCentroidsL2` run on each slice of the
    * corpus (the trained path, q87) or slices of one full-dim frame (the
    * stand-in path, q78). Same encode/serve plan shape as `pqTopK`. */
  def pqTopKWithCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
      codebooks: Seq[DataFrame], codeCol: String, cvecCol: String,
      query: DataFrame, queryVecCol: String,
      k: Int, dim: Int): DataFrame = {
    val m = codebooks.length
    require(m >= 1 && dim % m == 0, s"dim $dim must split evenly into $m subspaces")
    val l = dim / m
    // encode: one packed-codebook fold per subspace
    val encoded = codebooks.zipWithIndex.foldLeft(corpus) { case (df, (cb, s)) =>
      val packed = packCentroids(
        cb.select(col(codeCol).as("__pc"), col(cvecCol).as("__pv")),
        "__pc", "__pv")
        .withColumnRenamed("__cents", s"__cents_$s")
      withNearestCode(df.crossJoin(packed),
        slice(col(vecCol), s * l + 1, l), s"__cents_$s", s"code_$s")
        .drop(s"__cents_$s")
    }
    // serve: reconstruct the ADC score through m tiny broadcast joins
    val served = codebooks.zipWithIndex.foldLeft(
      encoded.crossJoin(broadcast(query.select(col(queryVecCol).as("__qe"))))) {
      case (df, (cb, s)) =>
        df.join(broadcast(cb.select(col(codeCol).as(s"code_$s"),
          col(cvecCol).as(s"__cw_$s"))), s"code_$s")
    }
    val adc = (0 until m).map(s =>
      graft.functions.VectorFunctions.dot(
        slice(col("__qe"), s * l + 1, l), col(s"__cw_$s"))).reduce(_ + _)
    val keep = corpus.columns.filter(_ != vecCol)
    served
      .select(keep.toIndexedSeq.map(col) ++
        (0 until m).map(s => col(s"code_$s")) :+ round(adc, 6).as("adc"): _*)
      .orderBy(col("adc").desc, col(idCol).asc)
      .limit(k)
  }

  /** SemDeDup-style semantic deduplication (Abbas et al., 2023): assign
    * every vector to its nearest centroid, then dedup WITHIN clusters —
    * a member is dropped when some same-cluster member with higher keep
    * priority sits within `threshold` cosine of it. Keep priority follows
    * the paper's rule (keep the member FARTHEST from the centroid — low
    * centroid-cosine first), ties to the lowest id, so the decision is
    * deterministic and needs no iteration: one self-join per cluster,
    * no transitive closure.
    *
    * Scale shape: centroid assignment is the same packed-broadcast
    * scan-side fold as `ivfTopK` (zero shuffle); the only data movement
    * is the cluster equi-join, which bounds the pairwise work to
    * in-cluster candidates — the clustering plays exactly the role LSH
    * buckets play in `nearDupPairs`, but with the semantic structure a
    * trained index gives. Returns (id, cid, csim, kept 1/0).
    *
    * The assignment fold is evaluated twice per row (once for cid, once
    * for csim — CollapseProject inlines the shared pair into both
    * consumers): a deliberate 2k-cosine constant, still scan-side. */
  def semanticDedup(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, cidCol: String, cvecCol: String,
      threshold: Double): DataFrame = {
    val packed = packCentroids(centroids, cidCol, cvecCol)
    val best = aggregate(
      transform(col("__cents"), c =>
        array(round(cosine(col(vecCol), c("__cvec")), 6), c("__cid").cast("double"))),
      array(lit(-2.0), lit(0.0)),
      (acc, p) => when(p(0) > acc(0) ||
        (p(0) === acc(0) && p(1) < acc(1)), p).otherwise(acc))
    // the assigned frame feeds three branches (both pair sides + the
    // final keep flag) — persist it, as minhashNearDupPairs does its
    // signature frame; registered with PlanCache, released by
    // PlanCache.releaseAll() / clearCache() after materialization
    val m = graft.operators.PlanCache.persist(corpus.crossJoin(packed)
      .select(col(idCol), col(vecCol),
        best(1).cast("long").as("cid"), best(0).as("csim")))
    val a = m.select(col(idCol).as("__ida"), col(vecCol).as("__va"),
      col("cid"), col("csim").as("__ca"))
    val b = m.select(col(idCol).as("__idb"), col(vecCol).as("__vb"),
      col("cid"), col("csim").as("__cb"))
    // b dominates a: same cluster, within threshold, and b is kept first
    // (farther from the centroid, ties to the lower id)
    val dropped = a.join(b, Seq("cid"))
      .filter(col("__ida") =!= col("__idb"))
      .filter(round(cosine(col("__va"), col("__vb")), 6) >= threshold)
      .filter(col("__cb") < col("__ca") ||
        (col("__cb") === col("__ca") && col("__idb") < col("__ida")))
      .select(col("__ida").as(idCol)).distinct()
      .withColumn("__drop", lit(1))
    m.join(dropped, Seq(idCol), "left")
      .select(col(idCol), col("cid"), col("csim"),
        when(col("__drop").isNull, 1L).otherwise(0L).as("kept"))
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

  /** Scan-side nearest-centroid assignment under SQUARED L2 — the
    * residual-quantization / PQ-metric sibling of [[assignCells]]
    * (argmin round(L2², 6), ties to lowest cid, same single-fold packed
    * broadcast, same lazy raise_error emptiness guard). Appends
    * (cid, cdist) to the corpus columns. */
  def assignCellsL2(corpus: DataFrame, vecCol: String,
      centroids: DataFrame, cidCol: String, cvecCol: String): DataFrame = {
    val packed = packCentroids(centroids, cidCol, cvecCol)
    corpus.crossJoin(packed)
      .withColumn("__pair", aggregate(
        transform(col("__cents"), c =>
          array(round(l2sq(col(vecCol), c("__cvec")), 6),
            c("__cid").cast("double"))),
        array(lit(Double.MaxValue), lit(0.0)),
        (acc, p) => when(p(0) < acc(0) ||
          (p(0) === acc(0) && p(1) < acc(1)), p).otherwise(acc)))
      .select(corpus.columns.toIndexedSeq.map(col) :+
        col("__pair")(1).cast("long").as("cid") :+
        col("__pair")(0).as("cdist"): _*)
  }
}
