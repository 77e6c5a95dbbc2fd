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
    * filesAfter). The swap is rename-based: write to a sibling staging
    * dir, then replace the partition dir — readers see old or new, never
    * a mix. */
  def compactPartition(spark: SparkSession, dir: String,
      targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val path = new Path(dir)
    val fs = FileSystem.get(path.toUri, spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(path)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val totalBytes = parts.map(_.getLen).sum
    val nOut = math.max(1, (totalBytes / targetBytes).toInt)

    val staging = new Path(path.getParent, s".compact_${path.getName}")
    spark.read.parquet(dir)
      .repartition(nOut)
      .write.mode(SaveMode.Overwrite).parquet(staging.toString)

    val backup = new Path(path.getParent, s".old_${path.getName}")
    fs.rename(path, backup)
    fs.rename(staging, path)
    fs.delete(backup, true)

    val after = fs.listStatus(path)
      .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    (parts.length, after)
  }
}
