package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sequence packing for training-data assembly: lay documents head-to-tail
  * into one token stream per group and split the stream into fixed-size
  * context windows ("concat-and-split", the standard LLM pretraining
  * batcher). A document belongs to the window containing its FIRST token.
  *
  * Shape at scale: one window shuffle per group (partitionBy group,
  * orderBy id) — the running offset never needs a GLOBAL total order, which
  * is what makes this viable at 100 TB: groups (source, shard, date...)
  * bound the sort, and each group's stream packs independently.
  */
object Packing {

  /** Per-document window assignment: returns the input plus
    * `start_offset` (tokens before this doc within its group's stream) and
    * `chunk_id` (= start_offset div windowTokens). Deterministic for any
    * partitioning: the (groupCol, idCol) order defines the stream. */
  def packSequences(docs: DataFrame, groupCol: String, idCol: String,
      nTokens: Column, windowTokens: Int): DataFrame = {
    require(windowTokens >= 1, s"window must be >= 1 token, got $windowTokens")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
    docs
      .withColumn("__tok", nTokens.cast("long"))
      .withColumn("start_offset",
        coalesce(sum(col("__tok")).over(w) - col("__tok"), lit(0L)))
      .withColumn("chunk_id", expr(s"start_offset div $windowTokens"))
      .drop("__tok")
  }
}
