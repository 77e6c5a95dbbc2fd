package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregate (SURVEY.md §2.9's one justified Aggregator):
  * merge per-row MinHash signature vectors into a per-GROUP signature by
  * elementwise minimum — the signature of the union of the group's shingle
  * sets (min-merge law, property-tested in PropertiesSpec).
  *
  * Shape at scale: associative + commutative merge ⇒ Spark runs it as a
  * partial aggregate (map-side combine) before the shuffle, so only k
  * strings per group travel — the same contract as built-in min().
  */
class MinHashAggregator(k: Int)
    extends Aggregator[Seq[String], Array[String], Seq[String]] {

  def zero: Array[String] = Array.fill(k)(null)

  def reduce(buf: Array[String], row: Seq[String]): Array[String] = {
    var i = 0
    while (i < k) {
      val v = row(i)
      if (buf(i) == null || (v != null && v < buf(i))) buf(i) = v
      i += 1
    }
    buf
  }

  def merge(a: Array[String], b: Array[String]): Array[String] = {
    var i = 0
    while (i < k) {
      if (a(i) == null || (b(i) != null && b(i) < a(i))) a(i) = b(i)
      i += 1
    }
    a
  }

  def finish(buf: Array[String]): Seq[String] = buf.toSeq

  // ExpressionEncoders on both sides: the buffer crosses a serialization
  // boundary on every map-side partial → shuffle → merge hop, and Java
  // serialization there is measurable at scale (VERDICT r1 #6).
  def bufferEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
  def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}
