package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S3/S4/K2 seams: S3A read/write configuration, including SSE-KMS — the
  * exact Hadoop conf keys the reference sets (check_parquet.py:37-51) and
  * the encryption contract of its uploads (lambda_function.py:96-105).
  * Offline, local paths stand in for buckets; on a cluster these confs make
  * the same `spark.read.parquet("s3a://...")` calls work unchanged.
  */
object S3Config {

  /** SSE-KMS on the S3A connector — identical keys to check_parquet.py:44-49. */
  def applySseKms(spark: SparkSession, kmsKeyArn: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.s3a.server-side-encryption-algorithm", "SSE-KMS")
    conf.set("fs.s3a.server-side-encryption.key", kmsKeyArn)
  }

  /** E5/S7 parity: required configuration must fail fast at startup
    * (lambda_function.py:33-37's env-var guard). */
  def requiredSetting(name: String): String =
    sys.env.getOrElse(name,
      throw new IllegalStateException(s"missing required setting $name"))

  /** S3 partition-glob scan (check_parquet.py:83-91): read one or more
    * time partitions of the lake layout, e.g. base/topic/2021/09/02/18. */
  def readPartition(spark: SparkSession, base: String, topic: String,
      yyyy: String, mm: String = "*", dd: String = "*", hh: String = "*"): DataFrame =
    spark.read.parquet(s"$base/$topic/$yyyy/$mm/$dd/$hh")
}
