package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the lakehouse pattern that keeps a
  * 100 TB summary current without recomputing history: each new partition
  * is summarized alone (touching only its own bytes) and MERGED into the
  * standing summary by group.
  *
  * The summary form (count, decimal sum, min, max per group) is closed
  * under merge — merge(summarize(A), summarize(B)) ≡ summarize(A ∪ B) for
  * ANY split of the input, which is exactly the partial-aggregation law
  * Spark's own map-side combine relies on. Decimal sums make the law hold
  * bit-for-bit (double sums only hold approximately, which would poison an
  * summary that is merged thousands of times). Averages are derived, never
  * stored: sum/count stay mergeable, avg does not.
  */
object IncrementalAgg {

  /** Summarize one batch into the mergeable form. */
  def summarize(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(28,2)")).as("sum_v"),
        min(col(valueCol)).as("min_v"),
        max(col(valueCol)).as("max_v"))

  /** Merge any number of summaries (previous standing summary + new batch
    * summaries) into one — groups present in several inputs combine,
    * groups in one pass through. */
  def merge(keys: Seq[String], summaries: DataFrame*): DataFrame = {
    require(summaries.nonEmpty, "need at least one summary")
    summaries.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"),
        sum(col("sum_v")).as("sum_v"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))
  }
}
