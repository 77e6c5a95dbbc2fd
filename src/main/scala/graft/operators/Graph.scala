package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics beyond connected components (Dedup):
  * fixed-iteration PageRank and HITS whose per-iteration arithmetic is
  * engine- and partitioning-independent, so the trained scores are
  * reproducible AND replayable by a SQL oracle.
  */
object Graph {

  /** Node-count ceiling under which the per-iteration score table is
    * broadcast (≈ 24 bytes/row → ~120 MB at the ceiling, comfortably
    * inside Spark's 8 GB / 512 M-row broadcast hard limits and a sane
    * driver heap). An explicit `broadcast()` hint is honored
    * UNCONDITIONALLY by Spark — past driver scale it fails (driver OOM
    * or the broadcast hard limit), it does not degrade — so the hint
    * must be gated, not merely commented (ADVICE r13). Above the
    * ceiling the same plan runs as a shuffle join; values are unchanged
    * either way (the round-12 decimal sum is order-independent). */
  private[graft] val BroadcastNodeLimit = 5L * 1000 * 1000

  private def maybeBroadcast(df: DataFrame, estRows: Long): DataFrame =
    if (estRows <= BroadcastNodeLimit) broadcast(df) else df

  /** Fixed-iteration PageRank over an edge list (src, dst), uniform
    * teleport, dangling mass dropped (the common simplification — the
    * oracle replays the same rule).
    *
    * Determinism at any scale: the only cross-row reduction is the
    * in-neighbor contribution sum, and each contribution is rounded to 12
    * decimals and summed in DECIMAL(28,12) — the round-then-exact-sum
    * trick (q89/q109) that makes a double-valued reduction independent of
    * partial-aggregation order, so retries/speculation at 1000 executors
    * produce bit-identical ranks. Per-row double ops (division by
    * out-degree, damping) are IEEE-deterministic already.
    *
    * Each iteration: one join of edges→ranks on src (edges also carry
    * out-degree, precomputed once) + one hash agg on dst + one left join
    * back to the node set — shuffle count is constant per iteration, keyed
    * on node ids throughout. Node count n is the one driver scalar (index
    * metadata, same rule as the centroid/union-find localizations).
    */
  def pageRank(edges: DataFrame, iters: Int, damping: Double = 0.85): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val e = edges.select(col("src"), col("dst")).distinct()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // both frames feed every iteration's lineage — without the persist
    // the edge distinct/degree agg re-executes once per iteration
    val withDeg = e.join(
      e.groupBy("src").agg(count(lit(1)).as("deg")), "src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count() // also materializes the nodes cache
    var pr = nodes.withColumn("pr", lit(1.0) / n)
    for (_ <- 0 until iters) {
      // the score tables (pr/sums) are node-domain-sized — below
      // [[BroadcastNodeLimit]] broadcasting them makes each iteration's
      // ONLY shuffle the contribution agg, instead of re-exchanging the
      // cached edge table per iteration (the q461 round device); above
      // it the hint is withheld and the join shuffles, because an
      // explicit broadcast hint would be honored unconditionally and
      // fail at driver scale rather than degrade (ADVICE r13)
      val sums = withDeg
        .join(maybeBroadcast(pr, n), withDeg("src") === pr("node"))
        .select(col("dst"),
          round(col("pr") / col("deg"), 12).cast("decimal(28,12)").as("c"))
        .groupBy("dst")
        .agg(sum(col("c")).cast("double").as("s"))
      pr = nodes.join(maybeBroadcast(sums, n), nodes("node") === sums("dst"),
          "left")
        .select(col("node"),
          (lit((1.0 - damping) / n) +
            lit(damping) * coalesce(col("s"), lit(0.0))).as("pr"))
    }
    // materialize the final ranks, then release the cached inputs — a
    // library caller embedding this in a longer job must not accumulate
    // blocks (same discipline as Similarity.pqTrain / Dedup.connectedComponents)
    val out = pr.localCheckpoint(true)
    nodes.unpersist()
    withDeg.unpersist()
    out
  }

  /** PERSONALIZED PageRank: teleport lands uniformly on the probe set
    * instead of all nodes — the random-walk-with-restart relevance score
    * behind "related to THESE items" recommendations. Same fixed-
    * iteration, round-12 decimal-sum discipline as [[pageRank]] (scores
    * bit-identical under any partitioning); the teleport vector enters
    * as a broadcast membership join, never a collect. Dangling mass
    * dropped, as in the uniform variant. */
  def pageRankPersonalized(edges: DataFrame, probes: DataFrame,
      iters: Int, damping: Double = 0.85): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val e = edges.select(col("src"), col("dst")).distinct()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val withDeg = e.join(
      e.groupBy("src").agg(count(lit(1)).as("deg")), "src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count()
    // teleport(node) = 1/|probes| on the probe set, 0 elsewhere — built
    // once, re-read by every iteration as a materialized frame
    val p = probes.select(col("node")).distinct()
    val teleport = nodes
      .join(p.withColumn("__hit", lit(1)), Seq("node"), "left")
      .crossJoin(broadcast(p.agg(count(lit(1)).as("np"))))
      .select(col("node"),
        when(col("__hit").isNotNull, lit(1.0) / col("np"))
          .otherwise(lit(0.0)).as("t"))
      .localCheckpoint(true)
    var pr = teleport.select(col("node"), col("t").as("pr"))
    for (_ <- 0 until iters) {
      // same gated broadcast-the-scores device as [[pageRank]]: the edge
      // cache is never re-exchanged, the agg is the iteration's shuffle
      val sums = withDeg
        .join(maybeBroadcast(pr, n), withDeg("src") === pr("node"))
        .select(col("dst"),
          round(col("pr") / col("deg"), 12).cast("decimal(28,12)").as("c"))
        .groupBy("dst")
        .agg(sum(col("c")).cast("double").as("s"))
      pr = teleport.join(maybeBroadcast(sums, n),
          teleport("node") === sums("dst"), "left")
        .select(col("node"),
          (lit(1.0 - damping) * col("t") +
            lit(damping) * coalesce(col("s"), lit(0.0))).as("pr"))
    }
    val out = pr.localCheckpoint(true)
    nodes.unpersist()
    withDeg.unpersist()
    out
  }

  /** Fixed-iteration HITS (hubs & authorities, Kleinberg) over a directed
    * edge list (src, dst). Each iteration: authority(dst) = Σ hub of
    * in-neighbors, hub(src) = Σ authority of out-neighbors, each side
    * max-normalized (÷ max, not L2 — no cross-engine sqrt-of-sum enters
    * the recurrence) and rounded to 12 decimals.
    *
    * Determinism: the same round-to-12 + DECIMAL(28,12)-sum rule as
    * [[pageRank]] makes both reductions partial-agg-order independent;
    * the max-norm divisor is an exact double max. So 3 iterations on
    * 1000 executors reproduce the oracle bit-for-bit.
    *
    * Shape at scale: per iteration, one edges⋈scores join keyed on one
    * endpoint + one hash agg on the other + one broadcast of the 1-row
    * max — constant shuffle count, node-keyed throughout; nothing is
    * ever collected. Returns ('auth'|'hub', node, score) with score
    * rounded to 6.
    */
  def hits(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = edges.select(col("src"), col("dst")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // materialize once; every iteration's lineage reads it. The edge
    // count also bounds the node domain (nodes ≤ 2·edges) for the
    // broadcast gate below.
    val nodeBound = 2L * e.count()
    var hub = e.select(col("src")).distinct().withColumn("h", lit(1.0))
    var auth: DataFrame = null
    for (_ <- 0 until iters) {
      // each side is MATERIALIZED before its max-normalizer runs: the
      // 1-row agg would otherwise sit INSIDE the next iteration's
      // lineage, and every re-evaluation (rows + max, both sides, per
      // iteration) re-runs the whole prefix — measured 64 s vs 3 s at
      // sf0.1. Same per-round discipline as the CC/BFS fixpoints.
      // hub/auth are node-domain-sized score tables — below the gate
      // the edge cache streams un-exchanged through a broadcast hash
      // join and each half-iteration's only shuffle is its sum agg;
      // above it the join shuffles (see [[BroadcastNodeLimit]]). The
      // 1-row max aggs stay unconditionally broadcast.
      val ar = e.join(maybeBroadcast(hub, nodeBound), "src")
        .select(col("dst"), round(col("h"), 12).cast("decimal(28,12)").as("c"))
        .groupBy("dst").agg(sum(col("c")).cast("double").as("a"))
        .localCheckpoint(true)
      auth = ar.crossJoin(broadcast(ar.agg(max(col("a")).as("am"))))
        .select(col("dst"), round(col("a") / col("am"), 12).as("a"))
      val hr = e.join(maybeBroadcast(auth, nodeBound), "dst")
        .select(col("src"), round(col("a"), 12).cast("decimal(28,12)").as("c"))
        .groupBy("src").agg(sum(col("c")).cast("double").as("h"))
        .localCheckpoint(true)
      hub = hr.crossJoin(broadcast(hr.agg(max(col("h")).as("hm"))))
        .select(col("src"), round(col("h") / col("hm"), 12).as("h"))
    }
    val out = auth.select(lit("auth").as("side"), col("dst").as("node"),
        round(col("a"), 6).as("score"))
      .union(hub.select(lit("hub").as("side"), col("src").as("node"),
        round(col("h"), 6).as("score")))
      .localCheckpoint(true)
    e.unpersist()
    out
  }

  /** Bounded multi-source BFS: exact hop distances from each probe node
    * to every node within `maxHops`, over an undirected edge list
    * (symmetrize before calling if needed). Returns (probe, node, dist)
    * with dist = the MINIMUM hop count.
    *
    * Level-synchronous frontier expansion — the textbook distributed
    * BFS: each round joins the current frontier to the edge list on the
    * frontier node (one node-keyed shuffle), min-aggregates candidate
    * distances, and anti-joins out already-settled nodes, so a node
    * enters the distance table exactly once, at its true distance.
    * Rounds are materialized (localCheckpoint) like the CC fixpoint —
    * lineage stays constant-depth, retries re-read a materialized
    * frontier instead of replaying k joins. Frontier size is bounded by
    * the reachable set; nothing is ever collected. Integer distances ⇒
    * nothing to round; the result is trivially engine-exact.
    */
  def bfsHops(edges: DataFrame, probes: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val e = edges.select(col("src").as("u"), col("dst").as("v")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    e.count()
    // Dedup probes defensively (the other operators here distinct their
    // inputs too): a duplicated probe row would duplicate every
    // (probe, node, dist) row through the union below — the anti-join
    // only guards keys ALREADY in dist, not same-round duplicates.
    var dist = probes.select(col("probe")).distinct()
      .select(col("probe"), col("probe").as("node"),
        lit(0L).as("dist")).localCheckpoint(true)
    var frontier = dist
    var hop = 1L
    while (hop <= maxHops && frontier.take(1).nonEmpty) {
      val candidates = frontier.join(e, frontier("node") === e("u"))
        .select(col("probe"), col("v").as("node"))
        .distinct()
      frontier = candidates
        .join(dist.select(col("probe"), col("node")), Seq("probe", "node"),
          "left_anti")
        .withColumn("dist", lit(hop))
        .localCheckpoint(true)
      dist = dist.union(frontier).localCheckpoint(true)
      hop += 1
    }
    e.unpersist()
    dist
  }
}
