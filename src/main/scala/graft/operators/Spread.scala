package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Local-mode parallelism aid for CPU-heavy scan stages (per-char md5
  * hashing and the like): one small parquet file = one input partition,
  * which would serialize the stage on a single core. On a real cluster
  * file counts already provide parallelism, so the shuffle is gated on
  * the input actually being under-partitioned. File count stands in for
  * partition count (cheap driver-side listing — no .rdd conversion);
  * non-file-backed frames (inputFiles empty) get the spread, which only
  * costs a shuffle of data small enough to live in memory anyway.
  *
  * One definition for every call site (the LSH pipeline, the prefix
  * join, the curation pipeline) so the gate threshold and keying can't
  * drift apart. */
object Spread {
  def byKey(df: DataFrame, keyCol: String): DataFrame = byKeys(df, keyCol)

  /** Composite-key form (r16): blocked joins spread by their BLOCK key,
    * so the downstream per-pair work (levenshtein and the like) runs in
    * the block partitioning — the same exchange a cluster-scale blocked
    * join pays anyway, gated off when the input is already parallel. */
  def byKeys(df: DataFrame, keyCols: String*): DataFrame = {
    val sc = df.sparkSession.sparkContext
    if (df.inputFiles.length * 2 <= sc.defaultParallelism)
      df.repartition(sc.defaultParallelism, keyCols.map(col): _*)
    else df
  }
}
