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

object HilbertLayout {

  /** Hilbert key as a Column over the codegen'd native expression
    * ([[graft.functions.HilbertIndex]]). Same input contract as
    * [[Layout.zValue]]: non-negative coords < 2^bits. */
  def hilbertValue(x: Column, y: Column, bits: Int): Column = {
    val bridge = org.apache.spark.sql.GraftBridge
    bridge.column(graft.functions.HilbertIndex(
      bridge.expression(x), bridge.expression(y), bits))
  }

  /** DuckDB CTE chain replaying the identical xy→d walk for the oracle:
    * given a prior CTE `src` exposing columns (x, y, …), emits
    * `bits` chained CTEs h1..h{bits} that thread the per-level
    * (hx, hy, hd) rotation state; the final CTE's `hd` is the Hilbert
    * key. Bit ops spelled as floor-divide + mod (the portability rule
    * from [[Layout.zValueSql]]). */
  def hilbertCtesSql(src: String, bits: Int): (String, String) = {
    require(bits >= 1 && bits <= 15, s"oracle unroll supports 1..15 bits, got $bits")
    val n = 1L << bits
    val levels = (1 to bits).map { k =>
      val s = n >> k
      val prev = if (k == 1) "h0" else s"h${k - 1}"
      s"""h$k AS (
         |  SELECT * EXCLUDE (hx, hy, hd, rx, ry),
         |    hd + CAST($s AS BIGINT) * $s *
         |      (CASE WHEN rx = 0 AND ry = 0 THEN 0
         |            WHEN rx = 0 THEN 1
         |            WHEN ry = 1 THEN 2 ELSE 3 END) AS hd,
         |    CASE WHEN ry = 0 THEN
         |      (CASE WHEN rx = 1 THEN $n - 1 - hy ELSE hy END)
         |      ELSE hx END AS hx,
         |    CASE WHEN ry = 0 THEN
         |      (CASE WHEN rx = 1 THEN $n - 1 - hx ELSE hx END)
         |      ELSE hy END AS hy
         |  FROM (SELECT *, (hx // $s) % 2 AS rx, (hy // $s) % 2 AS ry
         |        FROM $prev) t)""".stripMargin
    }
    val chain =
      (s"""h0 AS (SELECT *, x AS hx, y AS hy, CAST(0 AS BIGINT) AS hd
          |       FROM $src)""".stripMargin +: levels).mkString(",\n")
    (chain, s"h$bits")
  }
}
