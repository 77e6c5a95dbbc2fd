package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Elementwise sum of fixed-width Long vectors — the "array-of-sums"
  * aggregation device: a per-row array of scaled-integer terms collapses
  * to ONE width-d vector per partition map-side, so the shuffle carries
  * d longs per partition instead of d rows per input row.
  *
  * Motivating case (q220 dimension-correlation): d(d−1)/2 = 2016 pair
  * products per row. The first implementation exploded 2016
  * `named_struct`s per row into a (i,j)-keyed hash agg — correct shuffle
  * volume (≤2016 groups) but heavy scan-side CPU and 2016× row
  * expansion. This aggregator sums the flattened products vector with no
  * expansion at all; the 2016-wide result unpacks to (i,j) rows AFTER
  * aggregation, on one row.
  *
  * Terms are pre-scaled to integers (e.g. round(x,6)·10⁶ as Long), so
  * the sum is exact and associative — bit-identical under any
  * partial-agg order, same discipline as the decimal sums elsewhere.
  * Long bound: 9.2e18; 6-decimal-scaled unit-ish products over ≤1e9 rows
  * stay ≤~1e15. Null input vectors are ignored (treated as absent row).
  */
class VecSumAggregator(width: Int)
    extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  def zero: Array[Long] = new Array[Long](width)

  def reduce(buf: Array[Long], row: Seq[Long]): Array[Long] = {
    if (row != null) {
      var i = 0
      while (i < width) { buf(i) += row(i); i += 1 }
    }
    buf
  }

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < width) { a(i) += b(i); i += 1 }
    a
  }

  def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
