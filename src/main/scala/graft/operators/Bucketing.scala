package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (pre-partitioned) tables: the shuffle-elimination path for
  * repeated big joins (SURVEY.md §2.8 / the 100 TB co-location story).
  *
  * Writing both join sides bucketed+sorted on the join key lets Spark plan
  * a sort-merge join with NO Exchange on either side — at 100 TB that
  * removes the dominant cost (a full shuffle of the fact table) from every
  * subsequent join on that key. Bucket count is chosen once per table at
  * write time and should match cluster parallelism at the target scale.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key — plans shuffle-free
    * when both sides share the bucket spec. */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame =
    spark.table(left).join(spark.table(right),
      spark.table(left)(leftKey) === spark.table(right)(rightKey))
}
