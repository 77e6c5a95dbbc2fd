package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  AttributeReference, BindReferences, Expression, GenericInternalRow,
  JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native sort-merge as-of join — the deepest extension tier (custom
  * LogicalPlan + SparkStrategy + SparkPlan) for the one operator whose
  * semantics Spark's relational algebra can only emulate: "for every left
  * row, the most recent right value at-or-before its time, per key".
  *
  * The generic emulation (operators/AsOfJoin: union-interleave + window)
  * shuffles BOTH sides into one union and carries a window buffer; this
  * plan instead asks the planner for co-clustered children sorted by
  * (key, time) — the same requirement contract SortMergeJoin uses, so
  * EnsureRequirements inserts exactly one exchange+sort per side — and
  * then streams a single forward merge per partition: O(n+m), zero
  * buffering beyond one carry value, no union row expansion.
  *
  * Semantics (matches operators/AsOfJoin and the q24 correlated-subquery
  * oracle): right values at exactly the left time are visible (≤); among
  * right rows sharing (key, time) the greatest carry wins (right side is
  * sorted by (key, time, carry), deterministic for orderable carry);
  * right rows with a null key or time are skipped (undefined in as-of
  * order); left rows with a null key or time emit a null carry — matching
  * the generic operator's nulls-first interleave and the correlated oracle.
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression,
    carry: Expression, carryAttr: AttributeReference)
    extends BinaryNode {
  override def output: Seq[Attribute] = left.output :+ carryAttr
  // carryAttr is born here (like Window's window expressions) — without
  // this the analyzer flags it as missing from the children
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(carryAttr)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, lt, rk, rt, c, attr) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt, c, attr) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression,
    carry: Expression, carryAttr: AttributeReference)
    extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output :+ carryAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(carryAttr)

  // the standard physical-operator observability contract — the metric
  // shows up in the SQL UI / plan like any built-in join's
  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"))

  // SortMergeJoin's contract: co-clustered on the keys...
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  // ...and sorted (key, time) within partitions; the right side adds the
  // carry to the order so equal-(key,time) rows resolve deterministically
  // (last = greatest carry, mirroring the generic operator's tiebreak).
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(carry, Ascending)))

  // left rows pass through in order — downstream sorts on the same
  // ordering are eliminated
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTimeB = BindReferences.bindReference(leftTime, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTimeB = BindReferences.bindReference(rightTime, right.output)
    val carryB = BindReferences.bindReference(carry, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val outAttrs = output
    val leftAttrs = left.output
    val cAttr = carryAttr
    val numOutputRows = longMetric("numOutputRows")

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(outAttrs, leftAttrs :+ cAttr)
      val joined = new JoinedRow
      val carryRow = new GenericInternalRow(1)

      // right cursor state: values are extracted immediately AND copied —
      // eval on a sort-output row returns views into a reused backing buffer
      // for non-primitive types (UTF8String/binary/array/struct), and the
      // spill reader reuses that buffer across next(). copyValue clones
      // those and passes primitives through unchanged (same pattern as
      // SortMergeJoinExec's buffered side).
      var rValid = false
      var rKey: Any = null
      var rTime: Any = null
      var rCarry: Any = null
      def advanceR(): Unit =
        if (rIter.hasNext) {
          val r = rIter.next()
          rKey = InternalRow.copyValue(rKeyB.eval(r))
          rTime = InternalRow.copyValue(rTimeB.eval(r))
          rCarry = if (rKey == null || rTime == null) null
                   else InternalRow.copyValue(carryB.eval(r))
          rValid = true
        } else rValid = false
      advanceR()
      // skip right rows with null key/time (undefined in as-of order)
      while (rValid && (rKey == null || rTime == null)) advanceR()

      var haveCarry = false
      var carryKey: Any = null
      var lastCarry: Any = null

      lIter.map { l =>
        val lk = lKeyB.eval(l)
        val lt = lTimeB.eval(l)
        if (lk != null && lt != null) {
          // consume all right rows at-or-before (lk, lt)
          var continue = rValid
          while (continue) {
            val kc = keyOrd.compare(rKey.asInstanceOf[AnyRef], lk.asInstanceOf[AnyRef])
            if (kc < 0 ||
                (kc == 0 && timeOrd.compare(rTime.asInstanceOf[AnyRef],
                  lt.asInstanceOf[AnyRef]) <= 0)) {
              if (kc == 0) { haveCarry = true; carryKey = rKey; lastCarry = rCarry }
              advanceR()
              while (rValid && (rKey == null || rTime == null)) advanceR()
              continue = rValid
            } else continue = false
          }
        }
        // lt != null matters: a left row with a key but null time consumes
        // nothing, and the generic operator/correlated oracle yield null
        // there — a stale same-key carry must not leak through.
        val valid = lk != null && lt != null && haveCarry &&
          keyOrd.compare(carryKey.asInstanceOf[AnyRef], lk.asInstanceOf[AnyRef]) == 0
        carryRow(0) = if (valid) lastCarry else null
        numOutputRows += 1
        proj(joined(l, carryRow))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
