package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Per-group top-k as a typed aggregate: keep the k largest
  * (score, id) pairs, score descending with ascending id as the
  * deterministic tiebreak.
  *
  * Why not a window? row_number().over(partitionBy(g).orderBy(...))
  * SORTS every group in full — O(n log n) per group and the whole group's
  * rows shuffle. This aggregator's merge is associative + commutative, so
  * Spark runs it map-side: only k pairs per group per partition ever
  * travel, and work is O(n log k). At 100 TB with million-row groups that
  * is the difference between a shuffle of n rows and a shuffle of k.
  *
  * The buffer is a sorted Seq (descending score, ascending id) of length
  * ≤ k — insertion keeps it sorted; k is small by contract. */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[Long]] {
  require(k >= 1, s"k must be >= 1, got $k")

  // ordering: higher score first; equal scores -> lower id first
  private def lt(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(buf: Seq[(Double, Long)],
      v: (Double, Long)): Seq[(Double, Long)] = {
    if (buf.length == k && !lt(v, buf.last)) buf
    else {
      val idx = buf.indexWhere(e => lt(v, e)) match {
        case -1 => buf.length
        case i => i
      }
      val grown = (buf.take(idx) :+ v) ++ buf.drop(idx)
      if (grown.length > k) grown.take(k) else grown
    }
  }

  def zero: Seq[(Double, Long)] = Seq.empty

  def reduce(buf: Seq[(Double, Long)], row: (Double, Long)): Seq[(Double, Long)] =
    insert(buf, row)

  def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    b.foldLeft(a)(insert)

  def finish(buf: Seq[(Double, Long)]): Seq[Long] = buf.map(_._2)

  def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
