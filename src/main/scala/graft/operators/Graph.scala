package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics beyond connected components (Dedup): a
  * fixed-iteration PageRank whose per-iteration arithmetic is engine- and
  * partitioning-independent, so the trained scores are reproducible AND
  * replayable by a SQL oracle.
  */
object Graph {

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
      val sums = withDeg
        .join(pr, withDeg("src") === pr("node"))
        .select(col("dst"),
          round(col("pr") / col("deg"), 12).cast("decimal(28,12)").as("c"))
        .groupBy("dst")
        .agg(sum(col("c")).cast("double").as("s"))
      pr = nodes.join(sums, nodes("node") === sums("dst"), "left")
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
}
