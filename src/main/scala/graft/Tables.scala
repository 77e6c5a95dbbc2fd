package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * Every query receives an `sfDir` (e.g. /root/testdata/sf0.01) and reads
  * only the tables it needs; column pruning + predicate pushdown then reach
  * the parquet scan via Catalyst. At cluster scale the same call sites work
  * against a partitioned lake path — nothing here assumes local mode.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") normalizeEventTs(df) else df
  }

  /** The query surface treats `events.ts` as epoch-nanoseconds BIGINT (the
    * original testdata shipped `timestamp[ns]`, surfaced as LongType via
    * `spark.sql.legacy.parquet.nanosAsLong`). Later testdata generations
    * write `timestamp[us]` (isAdjustedToUTC=false → TIMESTAMP_NTZ in
    * Spark), which broke every `ts div …` site with DATATYPE_MISMATCH.
    * Normalizing here — one projection at the scan, fully codegen'd,
    * pruned away when `ts` is unused — keeps all 94 call sites unchanged
    * under either physical type. Sessions run with
    * `spark.sql.session.timeZone=UTC`, so the NTZ→timestamp cast
    * interprets values as UTC, matching the DuckDB oracle's `epoch_us(ts)`.
    */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) => df
      case Some(TimestampType) =>
        df.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      case Some(TimestampNTZType) =>
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case _ => df
    }

  /** Register temp views for SQL-surface queries (rollup/cube/grouping sets
    * read best in SQL). Idempotent per session+dir. */
  def views(spark: SparkSession, sfDir: String, names: String*): Unit =
    names.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = apply(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
