package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions.hexSpanValSql

/** Round-10 record-linkage additions: the Fellegi–Sunter probabilistic
  * model (JASA 1969) — the standard behind every production
  * entity-resolution engine.
  */
object LinkOps {

  /** Fellegi–Sunter record linkage against a deterministically
    * corrupted replica: each replica record damages exactly one field
    * chosen by an md5 digit (name / balance-cents / segment, or none),
    * candidate pairs come from compound blocking, per-field m
    * (P(agree|match)) and u (P(agree|non-match)) probabilities are
    * estimated from the block-join itself with add-one smoothing, and
    * each pair scores Σ ln(m/u) over agreeing fields + Σ ln((1−m)/(1−u))
    * over disagreeing ones. Output: the precision/recall operating
    * curve over a score-threshold grid — the match/possible/non-match
    * banding decision FS formalizes.
    *
    * Scale shape: the comparison space is BLOCKED on a key whose
    * cardinality GROWS with n (VERDICT r10 #4 — nation alone is a fixed
    * 25-value key, Σ block² = Θ(n²/25)): block = (nation, 15-char name
    * prefix). Names are `Customer#%09d`, so a prefix-15 bucket spans at
    * most 1000 consecutive custkeys; split across 25 nations a block
    * holds ~40 records regardless of n, giving #blocks = Θ(n) × bounded
    * block size ⇒ Σ block² = Θ(n) candidate pairs, linear at any scale.
    * Recall is preserved: the name corruption APPENDS '~' (length 18 →
    * 19), so both halves of every true pair keep the same prefix-15 and
    * the same nation. m/u are one aggregate row broadcast back; the
    * threshold sweep runs on the (score × is_match) HISTOGRAM — three
    * binary fields admit at most 8 distinct scores, so the sweep grid
    * is ≤16 rows regardless of pair volume. Scores round to 6 before
    * the ≥θ compare so a last-ulp ln() divergence between engines
    * cannot flip a band. */
  val q388_fellegi_sunter = Q(
    "q388_fellegi_sunter",
    Some(s"""WITH a AS (
            |  SELECT c_custkey AS ck, c_nationkey AS nk, c_name AS nm,
            |    CAST(round(c_acctbal * 100, 0) AS BIGINT) AS bal,
            |    c_mktsegment AS seg
            |  FROM customer),
            |b AS (
            |  SELECT ck, nk,
            |    CASE WHEN sel = 0 THEN nm || '~' ELSE nm END AS nm,
            |    bal + CASE WHEN sel = 1 THEN 100 ELSE 0 END AS bal,
            |    CASE WHEN sel = 2 THEN 'CORRUPTED' ELSE seg END AS seg
            |  FROM (SELECT a.*,
            |    ${hexSpanValSql("md5(CAST(ck AS VARCHAR))", 0, 1)} % 4 AS sel
            |    FROM a) t),
            |pr AS (
            |  SELECT a.ck = b.ck AS is_match,
            |    CASE WHEN a.nm = b.nm THEN 1 ELSE 0 END AS g1,
            |    CASE WHEN a.bal = b.bal THEN 1 ELSE 0 END AS g2,
            |    CASE WHEN a.seg = b.seg THEN 1 ELSE 0 END AS g3
            |  FROM a JOIN b ON a.nk = b.nk
            |    AND substring(a.nm, 1, 15) = substring(b.nm, 1, 15)),
            |mu AS (
            |  SELECT
            |    CAST(sum(CASE WHEN is_match THEN 1 ELSE 0 END) AS BIGINT) AS nm_,
            |    CAST(sum(CASE WHEN is_match THEN 0 ELSE 1 END) AS BIGINT) AS nu_,
            |    (sum(CASE WHEN is_match THEN g1 ELSE 0 END) + 1.0)
            |      / (sum(CASE WHEN is_match THEN 1 ELSE 0 END) + 2) AS m1,
            |    (sum(CASE WHEN is_match THEN 0 ELSE g1 END) + 1.0)
            |      / (sum(CASE WHEN is_match THEN 0 ELSE 1 END) + 2) AS u1,
            |    (sum(CASE WHEN is_match THEN g2 ELSE 0 END) + 1.0)
            |      / (sum(CASE WHEN is_match THEN 1 ELSE 0 END) + 2) AS m2,
            |    (sum(CASE WHEN is_match THEN 0 ELSE g2 END) + 1.0)
            |      / (sum(CASE WHEN is_match THEN 0 ELSE 1 END) + 2) AS u2,
            |    (sum(CASE WHEN is_match THEN g3 ELSE 0 END) + 1.0)
            |      / (sum(CASE WHEN is_match THEN 1 ELSE 0 END) + 2) AS m3,
            |    (sum(CASE WHEN is_match THEN 0 ELSE g3 END) + 1.0)
            |      / (sum(CASE WHEN is_match THEN 0 ELSE 1 END) + 2) AS u3
            |  FROM pr),
            |sc AS (
            |  SELECT is_match,
            |    round(
            |      (CASE WHEN g1 = 1 THEN ln(m1 / u1)
            |            ELSE ln((1 - m1) / (1 - u1)) END) +
            |      (CASE WHEN g2 = 1 THEN ln(m2 / u2)
            |            ELSE ln((1 - m2) / (1 - u2)) END) +
            |      (CASE WHEN g3 = 1 THEN ln(m3 / u3)
            |            ELSE ln((1 - m3) / (1 - u3)) END), 6) AS score
            |  FROM pr CROSS JOIN mu),
            |hist AS (
            |  SELECT score, is_match, CAST(count(*) AS BIGINT) AS k
            |  FROM sc GROUP BY score, is_match),
            |th AS (SELECT CAST(unnest(generate_series(-12, 12, 3)) AS BIGINT)
            |       AS theta),
            |cm AS (
            |  SELECT th.theta,
            |    CAST(sum(CASE WHEN score >= theta THEN k ELSE 0 END) AS BIGINT)
            |      AS n_flagged,
            |    CAST(sum(CASE WHEN score >= theta AND is_match
            |      THEN k ELSE 0 END) AS BIGINT) AS tp
            |  FROM th CROSS JOIN hist GROUP BY th.theta)
            |SELECT theta, n_flagged, tp, n_flagged - tp AS fp,
            |  mu.nm_ - tp AS fn,
            |  CASE WHEN n_flagged > 0
            |    THEN round(CAST(tp AS DOUBLE) / n_flagged, 6) END AS precision,
            |  round(CAST(tp AS DOUBLE) / mu.nm_, 6) AS recall
            |FROM cm CROSS JOIN mu
            |ORDER BY theta""".stripMargin),
    (s, d) => {
      val a = Tables.customer(s, d).select(
        col("c_custkey").as("ck"), col("c_nationkey").as("nk"),
        col("c_name").as("nm"),
        round(col("c_acctbal") * 100, 0).cast("long").as("bal"),
        col("c_mktsegment").as("seg"))
      val b = a
        .withColumn("__h", md5(col("ck").cast("string")))
        .withColumn("sel", expr(hexSpanValSql("__h", 0, 1)) % 4)
        .select(col("ck"), col("nk"),
          when(col("sel") === 0, concat(col("nm"), lit("~")))
            .otherwise(col("nm")).as("nm"),
          (col("bal") + when(col("sel") === 1, 100L).otherwise(0L)).as("bal"),
          when(col("sel") === 2, lit("CORRUPTED")).otherwise(col("seg"))
            .as("seg"))
      // compound equi block key: (nation, name prefix-15) — see docstring
      val aB = a.toDF("ck_a", "nk", "nm_a", "bal_a", "seg_a")
        .withColumn("blk", substring(col("nm_a"), 1, 15))
      val bB = b.toDF("ck_b", "nk", "nm_b", "bal_b", "seg_b")
        .withColumn("blk", substring(col("nm_b"), 1, 15))
      val pr = graft.operators.PlanCache.persist(
        aB.join(bB, Seq("nk", "blk"))
          .select((col("ck_a") === col("ck_b")).as("is_match"),
            when(col("nm_a") === col("nm_b"), 1).otherwise(0).as("g1"),
            when(col("bal_a") === col("bal_b"), 1).otherwise(0).as("g2"),
            when(col("seg_a") === col("seg_b"), 1).otherwise(0).as("g3")))
      val flag = (m: org.apache.spark.sql.Column) => when(m, 1).otherwise(0)
      val mu = pr.agg(
        sum(flag(col("is_match"))).cast("long").as("nm_"),
        sum(flag(!col("is_match"))).cast("long").as("nu_"),
        ((sum(when(col("is_match"), col("g1")).otherwise(0)) + 1.0)
          / (sum(flag(col("is_match"))) + 2)).as("m1"),
        ((sum(when(col("is_match"), 0).otherwise(col("g1"))) + 1.0)
          / (sum(flag(!col("is_match"))) + 2)).as("u1"),
        ((sum(when(col("is_match"), col("g2")).otherwise(0)) + 1.0)
          / (sum(flag(col("is_match"))) + 2)).as("m2"),
        ((sum(when(col("is_match"), 0).otherwise(col("g2"))) + 1.0)
          / (sum(flag(!col("is_match"))) + 2)).as("u2"),
        ((sum(when(col("is_match"), col("g3")).otherwise(0)) + 1.0)
          / (sum(flag(col("is_match"))) + 2)).as("m3"),
        ((sum(when(col("is_match"), 0).otherwise(col("g3"))) + 1.0)
          / (sum(flag(!col("is_match"))) + 2)).as("u3"))
      def term(g: String, m: String, u: String) =
        when(col(g) === 1, log(col(m) / col(u)))
          .otherwise(log((lit(1) - col(m)) / (lit(1) - col(u))))
      val sc = pr.crossJoin(broadcast(mu))
        .select(col("is_match"), col("nm_"),
          round(term("g1", "m1", "u1") + term("g2", "m2", "u2")
            + term("g3", "m3", "u3"), 6).as("score"))
      // 3 binary agreement fields => at most 8 distinct scores: collapse
      // the 9M scored pairs to a (score, is_match) histogram BEFORE the
      // threshold sweep, so the 9-way explode touches <=16 rows, not the
      // pair set (was the entry's dominant cost: 81M exploded rows)
      val hist = sc.groupBy("score", "is_match", "nm_")
        .agg(count(lit(1)).as("k"))
      val cm = hist
        .select(col("is_match"), col("nm_"), col("score"), col("k"),
          explode(sequence(lit(-12), lit(12), lit(3))).as("theta"))
        .groupBy(col("theta").cast("long").as("theta"))
        .agg(sum(when(col("score") >= col("theta"), col("k")).otherwise(0L))
            .cast("long").as("n_flagged"),
          sum(when(col("score") >= col("theta") && col("is_match"), col("k"))
            .otherwise(0L)).cast("long").as("tp"),
          first(col("nm_")).as("nm_"))
      cm.select(col("theta"), col("n_flagged"), col("tp"),
          (col("n_flagged") - col("tp")).as("fp"),
          (col("nm_") - col("tp")).as("fn"),
          when(col("n_flagged") > 0,
            round(col("tp").cast("double") / col("n_flagged"), 6))
            .as("precision"),
          round(col("tp").cast("double") / col("nm_"), 6).as("recall"))
        .orderBy("theta")
    })

  val all: Seq[Q] = Seq(q388_fellegi_sunter)
}
