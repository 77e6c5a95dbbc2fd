package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Reusable deduplication operators over a (id, text) document frame —
  * the library API behind catalog queries q34/q36 (SURVEY.md §2.11).
  */
object Dedup {

  /** Exact content dedup with a deterministic keeper (min id per content
    * hash) — unlike dropDuplicates, whose survivor depends on partition
    * order. Returns (content_fp, keep_id, n_copies). */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** MinHash+LSH near-duplicate pairs with exact-Jaccard verification.
    *
    * shingle → single md5 per distinct shingle → k signature components
    * (hex rotations) → k single-row bands → band-bucket self-join (the
    * only shuffles are on band hash and pair ids) → exact Jaccard on the
    * md5'd shingle sets (identical to word-shingle Jaccard: md5 is
    * injective on the distinct shingles) → pairs ≥ threshold as
    * (doc_a, doc_b, jaccard).
    *
    * The signature frame feeds three plan branches and is persisted — the
    * local analogue of materializing a signature table, which is what a
    * 100 TB deployment does between the scan and the band join. Callers
    * should `spark.catalog.clearCache()` when done.
    */
  def minhashNearDupPairs(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8, shingleN: Int = 3, threshold: Double = 0.15): DataFrame = {
    // Local-mode parallelism aid only: one small parquet file = one input
    // partition, which would serialize the md5 hashing stage. On a real
    // cluster file counts already provide parallelism, so gate the shuffle
    // on the input actually being under-partitioned. File count stands in
    // for partition count (cheap driver-side listing — no .rdd conversion);
    // non-file-backed frames (inputFiles empty) get the spread, which only
    // costs a shuffle of data small enough to live in memory anyway.
    val sc = docs.sparkSession.sparkContext
    val spread =
      if (docs.inputFiles.length * 2 <= sc.defaultParallelism)
        docs.repartition(sc.defaultParallelism, col(idCol))
      else docs
    // Only the md5'd shingle set travels: every downstream use (signature
    // rotations, set sizes, exact-Jaccard verify) is invariant under the
    // injective per-shingle md5, and 32-char fixed-width hashes are far
    // cheaper to shuffle/intersect than raw n-gram strings. Sorted once
    // here so the verify stage can intersect by two-pointer merge —
    // rotation mins and sizes don't care about element order.
    val base = spread
      .select(col(idCol).as("__id"),
        sort_array(md5Shingles(tokens(col(textCol)), shingleN)).as("hs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // The band frame carries size(hs) — one int per band row — so the
    // length-ratio prefilter below needs no separate size-lookup joins
    // (round 2 spent two extra joins fetching |A|/|B| for the candidates).
    val bands = base.select(col("__id"), size(col("hs")).as("__n"),
      explode(array((0 until k).map(i =>
        struct(lit(i).as("band"), minhashRot(col("hs"), i).as("h"))): _*)).as("bh"))
      .select(col("__id"), col("__n"), col("bh.band").as("band"), col("bh.h").as("h"))
    val a = bands.select(col("__id").as("doc_a"), col("__n").as("__na"),
      col("band"), col("h"))
    val b = bands.select(col("__id").as("doc_b"), col("__n").as("__nb"),
      col("band"), col("h"))
    // Length-ratio prefilter: jaccard(A,B) ≤ min(|A|,|B|)/max(|A|,|B|), so
    // pairs whose set sizes differ by more than the threshold ratio cannot
    // qualify — prune them with cheap ints before shipping shingle arrays
    // into the verify join (a lossless necessary-condition filter). The
    // sizes ride the distinct for free: they are functions of the ids, so
    // the (doc_a, doc_b) cardinality is unchanged.
    val pruned = a.join(b, Seq("band", "h")).filter(col("doc_a") < col("doc_b"))
      .filter(least(col("__na"), col("__nb")).cast("double") >=
        greatest(col("__na"), col("__nb")) * threshold)
      .select("doc_a", "doc_b").distinct()
    val x = base.select(col("__id").as("doc_a"), col("hs").as("sa"))
    val y = base.select(col("__id").as("doc_b"), col("hs").as("sb"))
    val inter = sortedIntersectCount(col("sa"), col("sb"))
    val jac = inter.cast("double") / (size(col("sa")) + size(col("sb")) - inter)
    pruned.join(x, "doc_a").join(y, "doc_b")
      .select(col("doc_a"), col("doc_b"), jac.as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Connected components over an undirected edge list — the step that
    * turns pairwise near-dup PAIRS into dedup CLUSTERS (transitive
    * near-duplicates share one canonical keeper).
    *
    * Min-label propagation with pointer jumping: each round every node
    * takes the min label among itself and its neighbors, then labels
    * chase their own label's label — the doubling step that makes long
    * chains converge in O(log diameter) rounds instead of O(diameter).
    * Each round is two hash-joins and a min-aggregation on the node key;
    * nothing touches the driver except a one-value convergence probe
    * (the sum of labels, which decreases monotonically until fixpoint —
    * an aggregate, not a collect). This is the MapReduce-CC recipe of
    * Kiveris et al. (SoCC'14) in its label-propagation form.
    *
    * Returns (node, component) where component = min node id reachable.
    * Deterministic under any partitioning: min is order-insensitive. */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxIters: Int = 20): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val undirected = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .union(edges.select(col(dstCol).as("u"), col(srcCol).as("v")))
    // self-loops let one edge join carry a node's own label alongside its
    // neighbors' — no per-round union needed
    val sym = undirected
      .union(undirected.select(col("u"), col("u").as("v")).distinct())
      .persist(lvl)
    // The pointer-jump self-join references each round's result twice, so
    // lineage grows exponentially without a cut — localCheckpoint truncates
    // the plan per round (the iterative-algorithm staple; a cluster
    // deployment with executor churn would use reliable checkpoint() to a
    // durable dir instead).
    var labels = sym.select(col("u").as("node")).distinct()
      .select(col("node"), col("node").as("component"))
      .localCheckpoint(true)
    var prevSum: java.math.BigDecimal = null
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val propagated = sym
        .join(labels.withColumnRenamed("node", "u"), "u")
        .select(col("v").as("node"), col("component"))
        .groupBy("node").agg(min(col("component")).as("component"))
      // pointer jump: component ids are themselves nodes, so follow one hop
      val next = propagated.as("x")
        .join(propagated.select(col("node").as("jn"), col("component").as("jc")),
          col("x.component") === col("jn"), "left")
        .select(col("x.node").as("node"),
          least(col("x.component"), coalesce(col("jc"), col("x.component")))
            .as("component"))
        .localCheckpoint(true)
      // decimal sum: overflow-safe at any id scale; equality ⇔ fixpoint
      val s = next.agg(sum(col("component").cast("decimal(38,0)"))).head().getDecimal(0)
      converged = prevSum != null && s.compareTo(prevSum) == 0
      prevSum = s
      labels = next
      i += 1
    }
    sym.unpersist()
    labels
  }

  /** Near-duplicate clusters: LSH pairs → connected components →
    * (doc_id, cluster_id = min doc id of the cluster) for every document
    * that participates in at least one verified near-dup pair. Keeping
    * `doc_id == cluster_id` and dropping the rest is the dedup policy. */
  def nearDupClusters(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8, shingleN: Int = 3, threshold: Double = 0.15): DataFrame = {
    val pairs = minhashNearDupPairs(docs, idCol, textCol, k, shingleN, threshold)
    connectedComponents(pairs, "doc_a", "doc_b")
      .select(col("node").as(idCol), col("component").as("cluster_id"))
  }
}
