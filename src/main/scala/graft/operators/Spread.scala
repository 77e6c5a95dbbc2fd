package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Local-mode parallelism aid for CPU-heavy scan stages (per-char md5
  * hashing and the like): one small parquet file = one input partition,
  * which would serialize the stage on a single core. On a real cluster
  * file counts already provide parallelism, so the shuffle is gated on
  * the input actually being under-partitioned.
  *
  * Gate (r17 — VERDICT r16 #4): file COUNT alone is a bad proxy for scan
  * parallelism at scale (900 files × 100 GB would have "few files" under
  * a 2000-way cluster yet its parquet scan already splits into thousands
  * of row-group tasks). The decision therefore estimates the scan's own
  * task count as max(nFiles, totalBytes / maxPartitionBytes) — one task
  * per file floor, plus the byte-driven splits Spark's FilePartition
  * packing produces — and spreads only when even that estimate cannot
  * reach half the cluster. Sizes come from a driver-side stat of the
  * (few) input files; the stat is skipped entirely when the file count
  * alone clears the gate. Non-file-backed frames (inputFiles empty:
  * localCheckpoint, in-memory, unions of such) are gated on their plan's
  * actual partition count instead of being spread unconditionally
  * (ADVICE r16).
  *
  * One definition for every call site (the LSH pipeline, the prefix
  * join, the curation pipeline) so the gate threshold and keying can't
  * drift apart. */
object Spread {
  def byKey(df: DataFrame, keyCol: String): DataFrame = byKeys(df, keyCol)

  /** Pure gate decision, unit-tested in isolation: spread only when the
    * scan's estimated task count — one per file, or the byte-driven
    * split count if larger — cannot reach half of `parallelism`. */
  private[graft] def shouldSpread(nFiles: Long, totalBytes: Long,
      maxPartitionBytes: Long, parallelism: Int): Boolean = {
    val byBytes = totalBytes / math.max(1L, maxPartitionBytes)
    val scanTasks = math.max(nFiles, byBytes)
    scanTasks * 2 <= parallelism
  }

  /** Composite-key form (r16): blocked joins spread by their BLOCK key,
    * so the downstream per-pair work (levenshtein and the like) runs in
    * the block partitioning — the same exchange a cluster-scale blocked
    * join pays anyway, gated off when the input is already parallel. */
  def byKeys(df: DataFrame, keyCols: String*): DataFrame = {
    val sess = df.sparkSession
    val sc = sess.sparkContext
    val par = sc.defaultParallelism
    val files = df.inputFiles
    val spread =
      if (files.isEmpty) {
        // non-file-backed: the plan's own partitioning is the truth
        // (getNumPartitions plans but does not execute)
        df.rdd.getNumPartitions.toLong * 2 <= par
      } else if (files.length.toLong * 2 > par) {
        false // enough scan parallelism by file count alone — no stat
      } else {
        val hadoopConf = sc.hadoopConfiguration
        val totalBytes = files.map { f =>
          try {
            val p = new org.apache.hadoop.fs.Path(f)
            p.getFileSystem(hadoopConf).getFileStatus(p).getLen
          } catch { case _: Throwable => 0L }
        }.sum
        val maxPB = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
          sess.conf.get("spark.sql.files.maxPartitionBytes", "128m"))
        shouldSpread(files.length.toLong, totalBytes, maxPB, par)
      }
    if (spread) df.repartition(par, keyCols.map(col): _*) else df
  }
}
