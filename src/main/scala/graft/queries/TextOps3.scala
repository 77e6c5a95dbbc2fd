package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Text ops, part 3: simhash near-duplicate pairs via hamming-band LSH —
  * completes the simhash dedup path (q37 computes values; this finds
  * close pairs without an O(n²) comparison).
  */
object TextOps3 {

  // 32-bit simhash with 4 bands of 8 bits: pigeonhole guarantees 100%
  // recall at hamming ≤ 3 (3 flipped bits touch ≤ 3 of 4 bands), while
  // 8-bit band keys keep bucket sizes ~n/256 — at 4-bit keys (16 buckets)
  // candidate volume grows ~n²/16 and measured 15s at sf0.1; 8-bit keys
  // bring it to ~n²/256. More bits also make the similarity bar itself
  // selective (3/32 bits ≈ 9% disagreement vs 3/16 ≈ 19%).
  private val Bits = 32
  private val BandBits = 8
  private val NBands = Bits / BandBits
  private val HammingMax = 3
  private val BandMask = (1L << BandBits) - 1

  private val NDigits = Bits / 4

  /** Same packed-lane simhash as q37 (one popcount sum per hex digit,
    * majority ⟺ 2·popcount ≥ n — bit-identical to the ±1-sum form). */
  private def simhashSelect(fromExploded: String): String = {
    val digits = (0 until NDigits)
      .map(p => s"${hexDigitValSql("mh", p + 1)} AS v$p").mkString(", ")
    val lanes = (0 until NDigits)
      .map(p => s"CAST(sum(${packedBitLanesSql(s"v$p")}) AS BIGINT) AS ps$p")
      .mkString(",\n  ")
    val assemble = (0 until Bits)
      .map(j => s"${simhashBitFromLanesSql(j)} * ${1L << j}")
      .mkString(" + ")
    s"""hashed AS (SELECT doc_id, md5(tok) AS mh FROM $fromExploded),
       |digits AS (SELECT doc_id, $digits FROM hashed),
       |bitsums AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
       |  $lanes
       |  FROM digits GROUP BY doc_id),
       |sh AS (SELECT doc_id, CAST($assemble AS BIGINT) AS simhash FROM bitsums)""".stripMargin
  }

  /** Simhash hamming-band near-dup (see banding analysis above). Band
    * equi-joins carry the shuffle — never a pairwise comparison; the
    * hamming verify runs only on in-band candidates. */
  val q55_simhash_pairs = Q(
    "q55_simhash_pairs", {
      val bandRows = (0 until NBands).map(i =>
        s"SELECT doc_id, simhash, $i AS band, (simhash >> ${i * BandBits}) & $BandMask AS bkey FROM sh")
        .mkString("\n  UNION ALL ")
      Some(s"""WITH exploded AS (
            |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
            |${simhashSelect("exploded")},
            |bands AS (
            |  $bandRows)
            |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
            |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
            |FROM bands a JOIN bands b
            |  ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
            |WHERE bit_count(xor(a.simhash, b.simhash)) <= $HammingMax
            |ORDER BY doc_a, doc_b""".stripMargin)
    },
    (s, d) => {
      // scan-side simhash per document (SimhashBits expression) — the
      // exploded/grouped formulation lives on only as the oracle SQL
      val sh = Tables.documents(s, d)
        .select(col("doc_id"),
          simhashOf(tokens(col("text")), Bits).as("simhash"))
      val bands = (0 until NBands).map(i =>
        sh.select(col("doc_id"), col("simhash"), lit(i).as("band"),
          shiftright(col("simhash"), i * BandBits).bitwiseAND(lit(BandMask)).as("bkey")))
        .reduce(_ unionByName _)
      val a = bands.select(col("doc_id").as("doc_a"), col("simhash").as("ha"),
        col("band"), col("bkey"))
      val b = bands.select(col("doc_id").as("doc_b"), col("simhash").as("hb"),
        col("band"), col("bkey"))
      a.join(b, Seq("band", "bkey")).filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long").as("hamming"))
        .filter(col("hamming") <= HammingMax)
        .distinct()
        .orderBy("doc_a", "doc_b")
    })

  val all: Seq[Q] = Seq(q55_simhash_pairs)
}
