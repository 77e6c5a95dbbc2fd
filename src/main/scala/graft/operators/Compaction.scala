package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Small-file compaction for the micro-batch lake.
  *
  * The reference's one-file-per-invocation contract (lambda_function.py:59)
  * fragments a topic into thousands of tiny parquet files per day — the
  * classic small-file problem that kills scan parallelism bookkeeping and
  * NameNode/S3 listing at scale. Compaction rewrites a partition directory
  * into ~targetBytes-sized files and atomically swaps it in.
  */
object Compaction {

  /** Rewrite one partition directory (e.g. base/topic/2021/09/02/18) into
    * max(1, totalBytes/targetBytes) files. Returns (filesBefore,
    * filesAfter).
    *
    * The swap is rename-based and defensive: fail fast on a stale backup
    * (evidence of an earlier interrupted swap needing manual resolution),
    * abort with the original data intact if the first rename fails, and
    * roll the backup back if the second rename fails — the backup is
    * deleted only after the new partition dir verifiably exists. On HDFS
    * (atomic dir rename) readers see old or new, never a mix; on S3A,
    * rename is a copy and the swap window is not atomic — run compaction
    * there under an external partition lock or a table format. */
  def compactPartition(spark: SparkSession, dir: String,
      targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val path = new Path(dir)
    val fs = FileSystem.get(path.toUri, spark.sparkContext.hadoopConfiguration)
    val backup = new Path(path.getParent, s".old_${path.getName}")
    if (fs.exists(backup))
      throw new java.io.IOException(
        s"stale backup $backup exists — a previous compaction was interrupted; resolve it first")
    val parts = fs.listStatus(path)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val totalBytes = parts.map(_.getLen).sum
    val nOut = math.max(1, (totalBytes / targetBytes).toInt)

    val staging = new Path(path.getParent, s".compact_${path.getName}")
    spark.read.parquet(dir)
      .repartition(nOut)
      .write.mode(SaveMode.Overwrite).parquet(staging.toString)

    swapDir(fs, staging, path)

    val after = fs.listStatus(path)
      .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    (parts.length, after)
  }

  /** Atomically replace `path` with `staging` under the defensive rename
    * discipline documented on `compactPartition` (fail fast on a stale
    * backup; abort with the original intact if the first rename fails;
    * roll back if the second fails; delete the backup only once the new
    * dir verifiably exists). Shared by compaction and the streaming CDC
    * upsert sink.
    *
    * Visibility contract: between the two renames `path` briefly does not
    * exist, so this swap assumes SINGLE WRITER and NO CONCURRENT READER of
    * the target dir (a query scanning the snapshot mid-swap fails with
    * path-not-found). That is the contract of the compaction window and
    * the micro-batch boundary here; a reader-safe variant publishes each
    * version to its own dir and flips a manifest pointer (the
    * Delta/Iceberg recipe) — out of scope for this lake layout. */
  def swapDir(fs: FileSystem, staging: Path, path: Path): Unit = {
    val backup = new Path(path.getParent, s".old_${path.getName}")
    if (fs.exists(backup))
      throw new java.io.IOException(
        s"stale backup $backup exists — a previous swap was interrupted; resolve it first")
    if (!fs.rename(path, backup))
      throw new java.io.IOException(
        s"rename $path -> $backup failed; target left untouched")
    if (!fs.rename(staging, path)) {
      fs.rename(backup, path) // restore the original before failing
      throw new java.io.IOException(
        s"rename $staging -> $path failed; original restored")
    }
    if (!fs.exists(path))
      throw new java.io.IOException(
        s"$path missing after swap; backup preserved at $backup")
    fs.delete(backup, true)
  }
}
