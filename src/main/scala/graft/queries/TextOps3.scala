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

  private val SweepProbe = 300
  private val SweepMaxT = 8

  /** SimHash threshold sweep — q260's tuning-curve idea pointed at the
    * OTHER near-dup family: on the q198 probe subset, every pair's
    * 32-bit simhash hamming distance meets the exact-Jaccard ≥ 0.15
    * ground truth, and each threshold t ∈ 0..8 gets its
    * precision/recall row. q55 ships one operating point (bands +
    * hamming ≤ 3); this is the curve that justifies it — a simhash or
    * banding bug bends the whole curve, not just one cell. Counts are
    * exact BIGINTs; precision is NULL where nothing is flagged (both
    * engines agree by construction).
    *
    * Scale shape: the all-pairs truth is bounded to the probe subset
    * (the q110/q198 cap); the production path stays banded (q55). */
  val q263_simhash_sweep = Q(
    "q263_simhash_sweep",
    Some(s"""WITH exploded AS (
            |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            |  FROM documents WHERE doc_id < $SweepProbe),
            |${simhashSelect("exploded")},
            |tok3 AS (
            |  SELECT doc_id, string_split(text, ' ') AS toks
            |  FROM documents WHERE doc_id < $SweepProbe),
            |sh3 AS (
            |  SELECT doc_id, list_transform(list_distinct(list_transform(
            |    generate_series(1, greatest(len(toks) - 2, 0)),
            |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])),
            |    s -> md5(s)) AS sset
            |  FROM tok3),
            |pairs AS (
            |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
            |    CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT)
            |      AS hamming
            |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
            |truth AS (
            |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
            |  FROM sh3 x JOIN sh3 y ON x.doc_id < y.doc_id
            |  WHERE CAST(len(list_filter(x.sset, v -> list_contains(y.sset, v))) AS DOUBLE)
            |      / (len(x.sset) + len(y.sset)
            |         - len(list_filter(x.sset, v -> list_contains(y.sset, v)))) >= 0.15),
            |marked AS (
            |  SELECT p.doc_a, p.doc_b, p.hamming,
            |    CAST(CASE WHEN t.doc_a IS NULL THEN 0 ELSE 1 END AS BIGINT)
            |      AS is_truth
            |  FROM pairs p LEFT JOIN truth t
            |    ON p.doc_a = t.doc_a AND p.doc_b = t.doc_b)
            |SELECT g.t,
            |  CAST(sum(CASE WHEN hamming <= g.t THEN 1 ELSE 0 END) AS BIGINT)
            |    AS n_flagged,
            |  CAST(sum(is_truth) AS BIGINT) AS n_truth,
            |  CAST(sum(CASE WHEN hamming <= g.t THEN is_truth ELSE 0 END)
            |    AS BIGINT) AS n_hit,
            |  round(CAST(sum(CASE WHEN hamming <= g.t THEN is_truth ELSE 0
            |      END) AS DOUBLE)
            |    / nullif(sum(CASE WHEN hamming <= g.t THEN 1 ELSE 0 END), 0),
            |    6) AS precision,
            |  round(CAST(sum(CASE WHEN hamming <= g.t THEN is_truth ELSE 0
            |      END) AS DOUBLE) / nullif(sum(is_truth), 0), 6) AS recall
            |FROM marked CROSS JOIN
            |  (SELECT unnest(range(0, ${SweepMaxT + 1})) AS t) g
            |GROUP BY g.t ORDER BY g.t""".stripMargin),
    (s, d) => {
      import s.implicits._
      // spread the probe subset: both all-pairs stages below stream it as
      // the left side of a nested-loop join, so a one-file scan would run
      // the O(n²) hamming/intersect verify on one core (scale-gated); the
      // simhash and shingle-set frames each feed BOTH join sides — persist
      // so the per-doc hashing runs once, not twice (r16)
      val subset = graft.operators.Spread.byKey(
        Tables.documents(s, d).filter(col("doc_id") < SweepProbe), "doc_id")
      val sh = graft.operators.PlanCache.persist(
        subset.select(col("doc_id"),
          simhashOf(tokens(col("text")), Bits).as("simhash")))
      val pairs = sh.toDF("doc_a", "ha").join(sh.toDF("doc_b", "hb"),
          col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long")
            .as("hamming"))
      // truth sets travel as SORTED md5 arrays so the intersection is
      // the native two-pointer sorted_intersect_count (the q36 verify
      // device) — cardinalities, hence Jaccard, are invariant under the
      // injective hash; the oracle mirrors the md5'd sets (unsorted —
      // list_filter doesn't need the order, the count is the same)
      val sets = graft.operators.PlanCache.persist(
        subset.select(col("doc_id"),
          sort_array(md5Shingles(tokens(col("text")), 3)).as("sh"))
        .select(col("doc_id"), col("sh"), size(col("sh")).as("n")))
      val inter = sortedIntersectCount(col("sa"), col("sb")).cast("long")
      val jac = inter.cast("double") / (col("na") + col("nb") - inter)
      val truth = sets.toDF("doc_a", "sa", "na")
        .join(sets.toDF("doc_b", "sb", "nb"), col("doc_a") < col("doc_b"))
        .filter(jac >= 0.15)
        .select(col("doc_a"), col("doc_b"), lit(1L).as("is_truth"))
      val marked = pairs.join(truth, Seq("doc_a", "doc_b"), "left")
        .select(col("hamming"), coalesce(col("is_truth"), lit(0L))
          .as("is_truth"))
      val flagged = when(col("hamming") <= col("t"), 1L).otherwise(0L)
      val hit = when(col("hamming") <= col("t"), col("is_truth"))
        .otherwise(0L)
      marked.crossJoin(broadcast(
          (0 to SweepMaxT).map(_.toLong).toDF("t")))
        .groupBy("t")
        .agg(sum(flagged).as("n_flagged"), sum(col("is_truth")).as("n_truth"),
          sum(hit).as("n_hit"),
          round(sum(hit).cast("double")
            / nullif(sum(flagged), lit(0)), 6).as("precision"),
          round(sum(hit).cast("double")
            / nullif(sum(col("is_truth")), lit(0)), 6).as("recall"))
        .orderBy("t")
    })

  val all: Seq[Q] = Seq(q55_simhash_pairs, q263_simhash_sweep)
}
