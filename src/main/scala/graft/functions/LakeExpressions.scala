package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
