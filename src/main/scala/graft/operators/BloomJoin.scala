package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join reduction — the runtime-filter pattern Spark's
  * own `spark.sql.optimizer.runtime.bloomFilter` applies, made explicit
  * and engine-portable (deterministic md5-derived hash family, so a SQL
  * oracle can replay membership exactly).
  *
  * WHY at 100 TB: when the build side of a join is too large to broadcast
  * the join itself (so it shuffles BOTH sides), its key SET is still tiny
  * compared to the probe side. Folding that set into an m-bit mask and
  * filtering the probe scan BEFORE the shuffle cuts the dominant cost —
  * probe-side shuffle volume — by the filter's selectivity, at zero risk:
  * the mask has no false negatives by construction, and the exact join
  * removes the false positives. The mask (m/64 longs, a few KB) is driver
  * metadata like the packed IVF centroids — collected once, shipped as a
  * literal into the scan, never a shuffle of its own.
  *
  * Hash family: h_j(key) = first-8-hex-digit value of
  * md5("<j>|" || CAST(key AS STRING)) mod m — the same portable
  * construction as the MinHash seeds (functions/TextFunctions),
  * replayable verbatim in ANSI SQL via [[bitPosSql]].
  */
object BloomJoin {

  /** SQL fragment for h_j(key): first-8-hex-digit value of the seeded
    * md5, via ONE md5 + ONE base-16 conv — the hex-digit place-value sum
    * (`hexSpanValSql`) would textually inline the md5 into each of its 8
    * digit extractions, evaluating the digest 8× per position. `keyExpr`
    * must already be a string. (ANSI replay, should an oracle ever need
    * membership itself: `('0x' || substr(md5(...), 1, 8))::BIGINT`.) */
  def bitPosSql(keyExpr: String, seed: Int, m: Int): String =
    s"(CAST(conv(substr(md5('$seed|' || $keyExpr), 1, 8), 16, 10) AS BIGINT) % $m)"

  /** Build the m-bit mask from the build side's distinct keys: k bit
    * positions per key, OR-folded on the driver. The collect is bounded by
    * min(k·|keys|, m) ints — mask metadata, not data movement; m is sized
    * by the caller to the build side's expected cardinality. NULL build
    * keys are dropped before hashing: a null key can never match the
    * downstream inner join, and its hash is null (md5 of a null cast),
    * which must not survive into the position set. */
  def buildMask(keys: DataFrame, keyCol: String, m: Int, k: Int): Array[Long] = {
    require(m > 0 && m % 64 == 0, s"m must be a positive multiple of 64, got $m")
    require(k >= 1 && k <= 8, s"k must be 1..8, got $k")
    val positions = keys
      .filter(col(keyCol).isNotNull)
      .select(explode(array((0 until k).map { j =>
        expr(bitPosSql(s"CAST($keyCol AS STRING)", j, m)).cast("int")
      }: _*)).as("pos"))
      .distinct()
      .collect()
      .map(_.getInt(0))
    val mask = new Array[Long](m / 64)
    positions.foreach(p => mask(p / 64) |= 1L << (p % 64))
    mask
  }

  /** Scan-side probe filter: keep a row iff ALL k bit positions of its key
    * are set in the mask. The mask ships as a literal array of longs;
    * each membership test is a hex-prefix hash, one array index, and two
    * bit ops — O(k) per row, codegen'd, no join, no shuffle. (The position
    * expression appears twice per test — word index and shift — so each
    * test evaluates its md5 twice; 2k scan-side md5s per row is noise next
    * to the shuffle volume the filter removes.) Null keys hash on the
    * cast's null → predicate null → dropped, matching inner-join
    * semantics on the downstream exact join. */
  def probeFilter(df: DataFrame, keyCol: String,
      mask: Array[Long], m: Int, k: Int): DataFrame = {
    require(mask.length == m / 64, s"mask has ${mask.length} words, want ${m / 64}")
    val maskSql = mask.map(w => s"${w}L").mkString("array(", ",", ")")
    val tests = (0 until k).map { j =>
      val pos = bitPosSql(s"CAST($keyCol AS STRING)", j, m)
      s"((element_at($maskSql, CAST($pos / 64 AS INT) + 1) & " +
        s"shiftleft(1L, CAST($pos % 64 AS INT))) != 0)"
    }
    df.filter(expr(tests.mkString("(", " AND ", ")")))
  }
}
