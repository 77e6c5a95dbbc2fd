package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Generic as-of join: for every left row, attach the most recent right-side
  * value at-or-before the left row's time, per key.
  *
  * Implementation is the union-interleave idiom: both sides are unioned on
  * (key, time, kind) and a single `last(ignoreNulls)` window over
  * unbounded-preceding rows resolves the as-of value — ONE shuffle on the
  * key, O(n log n) per partition, no pairwise time-band expansion. This is
  * the shape that survives 100 TB; a time-conditional theta join does not.
  *
  * Rows at exactly equal times: right-side rows sort before left-side rows
  * (kind 0 < 1), so an exactly-simultaneous right value is visible to the
  * left row (≤ semantics, matching a correlated max(right.time <= left.time)
  * subquery). Multiple right rows sharing (key, time) are tie-broken by the
  * carry value itself (greatest wins), making the survivor deterministic
  * regardless of partition order — this requires the carry type to be
  * orderable (any atomic or struct type; not map).
  */
object AsOfJoin {

  /** The custom-physical-operator variant: a true sort-merge as-of via
    * graft.plans.AsOfJoinNode/Exec — co-clustered sorted children, one
    * O(n+m) forward merge per partition, no union row expansion, no
    * window buffer. Same semantics as [[leftAsOf]] (≤, greatest-carry
    * tiebreak); `carryCol` must be a column of `right` (pre-project
    * derived carries). Registers the planner strategy on the session
    * idempotently. */
  def leftAsOfNative(
      left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String,
      carryCol: String, carryName: String): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    val spark = left.sparkSession
    GraftBridge.registerStrategy(spark, graft.plans.AsOfJoinStrategy)
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        n: String) = p.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"no column '$n' in ${p.output.map(_.name)}"))
    val c = attr(rPlan, carryCol)
    GraftBridge.ofRows(spark, graft.plans.AsOfJoinNode(
      lPlan, rPlan,
      attr(lPlan, leftKey), attr(lPlan, leftTime),
      attr(rPlan, rightKey), attr(rPlan, rightTime),
      c, AttributeReference(carryName, c.dataType, nullable = true)()))
  }

  def leftAsOf(
      left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String,
      carry: Column, carryName: String): DataFrame = {
    val leftRowType = org.apache.spark.sql.types.StructType(left.schema.fields)
    val carried = right.select(carry.as("__carry"))
    val carryType = carried.schema.fields.head.dataType

    val rightSide = right.select(
      col(rightKey).as("__k"),
      col(rightTime).as("__t"),
      lit(0).as("__kind"),
      carry.as("__carry"),
      lit(null).cast(leftRowType).as("__row"))
    val leftSide = left.select(
      col(leftKey).as("__k"),
      col(leftTime).as("__t"),
      lit(1).as("__kind"),
      lit(null).cast(carryType).as("__carry"),
      struct(left.columns.toIndexedSeq.map(col): _*).as("__row"))

    // __carry in the sort order: right rows with identical (key, time) sort
    // among themselves by carry, so last(ignoreNulls) picks the greatest —
    // deterministic under any partitioning (left rows carry null, which
    // sorts first within a tie and never displaces a right row).
    val w = Window.partitionBy("__k")
      .orderBy(col("__t"), col("__kind"), col("__carry"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    rightSide.unionByName(leftSide)
      .withColumn(carryName, last(col("__carry"), ignoreNulls = true).over(w))
      .filter(col("__kind") === 1)
      .select(left.columns.toIndexedSeq.map(c => col(s"__row.$c")) :+ col(carryName): _*)
  }
}
