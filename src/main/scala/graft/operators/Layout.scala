package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) interleaving, the lake
  * clustering technique that makes per-file min/max statistics prune on
  * TWO columns at once. Sorting 100 TB by (a) alone leaves b's per-file
  * ranges as wide as the table; sorting by z(a, b) bounds BOTH — a box
  * predicate then touches a handful of files instead of all of them.
  * The write path is ordinary Spark (`repartitionByRange(zCol)` +
  * `sortWithinPartitions(zCol)` before `.write`); this object owns the
  * key computation, kept as a pure codegen-friendly column expression.
  */
object Layout {

  /** Morton key: bit i of x lands at bit 2i, bit i of y at bit 2i+1.
    * Inputs must be non-negative and < 2^bits (callers bucket/scale
    * first); bits ≤ 31 keeps the key in a long. */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be 1..31, got $bits")
    (0 until bits).map { i =>
      shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** The same key as portable SQL (Spark AND DuckDB): bit extraction via
    * floor-divide + mod (no shift operators — the dialects disagree on
    * them), BIGINT-cast weights (ANSI int multiply overflows past 2^28). */
  def zValueSql(x: String, y: String, bits: Int): String = {
    require(bits >= 1 && bits <= 31, s"bits must be 1..31, got $bits")
    (0 until bits).map { i =>
      val p = 1L << i
      val wx = 1L << (2 * i)
      val wy = 1L << (2 * i + 1)
      s"(CAST(floor(($x) / $p.0) AS BIGINT) % 2) * CAST($wx AS BIGINT)" +
        s" + (CAST(floor(($y) / $p.0) AS BIGINT) % 2) * CAST($wy AS BIGINT)"
    }.mkString("(", " + ", ")")
  }
}
