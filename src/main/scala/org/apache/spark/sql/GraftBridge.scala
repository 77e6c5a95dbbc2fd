package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the classic Column ⇄ Expression conversions, which are
  * `private[sql]` in Spark 4 (Column became ColumnNode-based and no longer
  * exposes `.expr`). This is the standard extension-library pattern for
  * registering custom Catalyst expressions as user-facing Columns.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Apply an extensions object's injected functions to an ALREADY-BUILT
    * session (SparkSessionExtensions.registerFunctions is private[sql];
    * builder().withExtensions is the production path — this exists so a
    * shared test session can exercise the same registration). */
  def applyFunctionExtensions(spark: SparkSession,
      ext: SparkSessionExtensions => Unit): Unit = {
    val e = new SparkSessionExtensions
    ext(e)
    e.registerFunctions(spark.sessionState.functionRegistry)
  }

  /** Wrap a custom logical plan as a DataFrame (classic.Dataset.ofRows is
    * private[sql] — the standard extension-library entry for custom
    * LogicalPlan nodes). */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Idempotently register a planner strategy on an already-built session
    * (runtime path; builder().withExtensions / spark.sql.extensions is
    * the config path). */
  def registerStrategy(spark: SparkSession,
      s: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    if (!cs.experimental.extraStrategies.contains(s))
      cs.experimental.extraStrategies = cs.experimental.extraStrategies :+ s
  }

  /** Idempotently register an optimizer rule on an already-built session
    * (runtime twin of SparkSessionExtensions.injectOptimizerRule; rules
    * land in the fixed-point "User Provided Optimizers" batch). */
  def registerOptimizerRule(spark: SparkSession,
      r: org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    if (!cs.experimental.extraOptimizations.contains(r))
      cs.experimental.extraOptimizations = cs.experimental.extraOptimizations :+ r
  }

  /** Remove a runtime-registered optimizer rule (test hygiene: the shared
    * suite session must not leak a rule into unrelated suites). */
  def unregisterOptimizerRule(spark: SparkSession,
      r: org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    cs.experimental.extraOptimizations =
      cs.experimental.extraOptimizations.filterNot(_ == r)
  }
}
