package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for the vector hot path (SURVEY.md §2.11).
  *
  * The higher-order-function formulation (`aggregate(zip_with(a, b, *),
  * 0.0, +)`) is semantically right but allocates an intermediate array and
  * walks an interpreted expression tree per element, per centroid, per row
  * — measurable in every ANN/near-dup pipeline. These expressions keep the
  * per-element loop in one tight JVM (or codegen'd) loop with zero
  * allocation. Numeric contract: the SAME left-to-right index-order folds
  * as the lambda form and the DuckDB oracle's list_reduce, so results are
  * bit-identical and every oracle stays green.
  *
  * Element contract: non-null elements (embedding vectors), lengths
  * compared up to min(|a|, |b|) — same rows the zip_with form would
  * produce on equal-length inputs, which is the only shape the operators
  * feed.
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs two array<double> inputs, got $l / $r")
    }
}

/** Sequential dot product Σ a(i)·b(i), accumulated in index order. */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "vec_dot"
}

/** Cosine similarity in ONE pass: the three sums (a·b, a·a, b·b) advance
  * together in index order — each accumulator sees the identical addition
  * sequence as its standalone fold, so the result is bit-identical to
  * dot(a,b)/(sqrt(dot(a,a))·sqrt(dot(b,b))) while reading each element
  * once instead of three times. */
case class CosineSim(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sab = 0.0
    var saa = 0.0
    var sbb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i)
      val yi = y.getDouble(i)
      sab += xi * yi; saa += xi * xi; sbb += yi * yi
      i += 1
    }
    sab / (math.sqrt(saa) * math.sqrt(sbb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sab = ctx.freshName("sab")
      val saa = ctx.freshName("saa")
      val sbb = ctx.freshName("sbb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sab = 0.0; double $saa = 0.0; double $sbb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $a.getDouble($i);
         |  double $yi = $b.getDouble($i);
         |  $sab += $xi * $yi; $saa += $xi * $xi; $sbb += $yi * $yi;
         |}
         |${ev.value} = $sab / (java.lang.Math.sqrt($saa) * java.lang.Math.sqrt($sbb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "vec_cosine"
}

/** Squared L2 distance Σ (a(i)−b(i))², accumulated in index order —
  * the assignment metric under every Lloyd's training / IVF / PQ / RQ
  * entry. Same numeric contract as [[DotProduct]]: the identical
  * left-to-right (x−y)·(x−y) additions as the
  * `aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0d, +)` lambda
  * form and the oracle's list fold, so swapping forms is bit-exact ON
  * THE SHAPES THE OPERATORS FEED: equal-length arrays of non-null
  * doubles. Off that contract the forms diverge (ADVICE r13) — the
  * lambda returns NULL for mismatched lengths (zip_with null-pads and
  * the pad poisons the fold) and for null elements, while this
  * expression truncates to min(|a|,|b|) and reads a null slot as 0.0.
  * Callers needing lambda-equivalent NULL semantics must pre-validate
  * lengths/elements; none of the repo's call sites do, by contract. */
case class L2Sq(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $a.getDouble($i) - $b.getDouble($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "vec_l2sq"
}
