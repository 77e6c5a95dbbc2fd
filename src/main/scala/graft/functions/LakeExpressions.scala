package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Consistent-hash ring owner lookup: for a 52-bit key position, return
  * the shard of the first ring position at-or-after it, wrapping to the
  * lowest position — exactly the "smallest clockwise distance
  * (rpos − kpos mod 2^52)" rule q238's oracle states, made unique by
  * requiring DISTINCT ring positions (collisions among a few hundred
  * 52-bit md5 spans are ~2⁻⁴⁰; the builder fails loudly if one ever
  * appears, because a tie would need the oracle's lowest-shard rule).
  *
  * Why an expression: the ring is a CONSTANT (shards × vnodes, computed
  * driver-side from the same md5-hex-span arithmetic the SQL uses), so
  * the O(|ring|) interpreted higher-order-function fold the first
  * scan-side version paid per row collapses to one binary search
  * (log₂|ring| long compares). CodegenFallback costs one boxed call per
  * row — nothing next to the fold it replaces. */
case class RingOwner(child: Expression, rpos: Array[Long],
    shard: Array[Long]) extends UnaryExpression with CodegenFallback {

  require(rpos.length > 0 && rpos.length == shard.length,
    s"ring arrays must be equal-length and non-empty")
  require((1 until rpos.length).forall(i => rpos(i - 1) < rpos(i)),
    "ring positions must be strictly ascending (sorted, distinct)")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a BIGINT key position, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val k = input.asInstanceOf[Long]
    // lower_bound: first index with rpos(idx) >= k; wrap past the end
    var lo = 0
    var hi = rpos.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (rpos(mid) < k) lo = mid + 1 else hi = mid
    }
    shard(if (lo == rpos.length) 0 else lo)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "ring_owner"
}

/** Hilbert-curve index (order-`bits`, 2-D): maps (x, y) in
  * [0, 2^bits)² to the cell's position along the Hilbert space-filling
  * curve — the layout key whose every unit step is a grid-adjacent
  * move, unlike Z-order's long diagonal jumps at quadrant boundaries,
  * so range boxes touch strictly fewer key-contiguous files (q390
  * measures exactly that against [[graft.operators.Layout.zValue]]).
  *
  * Algorithm: the public-domain iterative xy→d walk (descend quadrant
  * levels; per level accumulate s²·((3·rx) XOR ry) and rotate/reflect
  * the frame). Fully codegen'd: the loop inlines into whole-stage
  * codegen as `bits` iterations of shift/mask/branch on two longs —
  * no allocation, no virtual call, same cost class as the Morton
  * interleave. */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && bits <= 31, s"bits must be 1..31, got $bits")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs two BIGINT coordinates, got $other")
    }

  override def nullSafeEval(xi: Any, yi: Any): Any = {
    val n = 1L << bits
    var x = xi.asInstanceOf[Long]
    var y = yi.asInstanceOf[Long]
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) { // rotate/reflect the frame, then swap axes
        if (rx == 1L) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xv, yv) => {
      val n = 1L << bits
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      s"""
         |long $x = $xv;
         |long $y = $yv;
         |long $d = 0L;
         |for (long $s = ${n >> 1}L; $s > 0L; $s >>= 1) {
         |  long $rx = (($x & $s) > 0L) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0L) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = ${n}L - 1L - $x; $y = ${n}L - 1L - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "hilbert_xy"
}
