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
        .withColumn("sel",
          graft.functions.TextFunctions.hexSpanVal(col("__h"), 0, 1) % 4)
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

  /** Fellegi–Sunter with UNSUPERVISED EM (Winkler's method) — q388
    * estimates m/u from ground truth the real world never has; this
    * entry estimates them from the agreement-pattern data alone. The
    * EM runs entirely on the SUFFICIENT STATISTIC: three binary
    * comparison fields admit at most 8 agreement patterns, so the
    * blocked pair space collapses to an 8-row (g1,g2,g3,N) histogram
    * and every E/M step is arithmetic on that grid — the reason EM
    * record linkage scales: iterations touch 8 rows whether the pair
    * space holds 10⁴ or 10¹² candidates. Three unrolled iterations
    * from (p=0.1, m=0.9, u=0.1); every posterior w rounds to 12
    * decimals and every weighted count is rounded-then-decimal-summed,
    * so both engines walk the identical parameter trajectory.
    *
    * Scale shape: one blocked pair pass (the q388 compound key) → the
    * 8-cell histogram; 3 iterations of 1-row broadcast algebra. */
  val q439_fs_em = Q(
    "q439_fs_em",
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
            |hist AS (
            |  SELECT CASE WHEN a.nm = b.nm THEN 1 ELSE 0 END AS g1,
            |    CASE WHEN a.bal = b.bal THEN 1 ELSE 0 END AS g2,
            |    CASE WHEN a.seg = b.seg THEN 1 ELSE 0 END AS g3,
            |    CAST(count(*) AS BIGINT) AS cnt
            |  FROM a JOIN b ON a.nk = b.nk
            |    AND substring(a.nm, 1, 15) = substring(b.nm, 1, 15)
            |  GROUP BY 1, 2, 3),
            |n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM hist),
            |e1 AS (
            |  SELECT g1, g2, g3, cnt, round(
            |    (0.1 * (CASE WHEN g1 = 1 THEN 0.9 ELSE 0.1 END)
            |         * (CASE WHEN g2 = 1 THEN 0.9 ELSE 0.1 END)
            |         * (CASE WHEN g3 = 1 THEN 0.9 ELSE 0.1 END)) /
            |    (0.1 * (CASE WHEN g1 = 1 THEN 0.9 ELSE 0.1 END)
            |         * (CASE WHEN g2 = 1 THEN 0.9 ELSE 0.1 END)
            |         * (CASE WHEN g3 = 1 THEN 0.9 ELSE 0.1 END)
            |     + 0.9 * (CASE WHEN g1 = 1 THEN 0.1 ELSE 0.9 END)
            |         * (CASE WHEN g2 = 1 THEN 0.1 ELSE 0.9 END)
            |         * (CASE WHEN g3 = 1 THEN 0.1 ELSE 0.9 END)), 12)
            |    AS w
            |  FROM hist),
            |m1 AS (
            |  SELECT
            |    round(CAST(sum(CAST(round(cnt * w, 6) AS DECIMAL(28,6)))
            |      AS DOUBLE) / max(n.n), 12) AS p,
            |    round(CAST(sum(CAST(round(cnt * w * g1, 6) AS DECIMAL(28,6))) AS DOUBLE)
            |      / CAST(sum(CAST(round(cnt * w, 6) AS DECIMAL(28,6))) AS DOUBLE), 12) AS m1,
            |    round(CAST(sum(CAST(round(cnt * w * g2, 6) AS DECIMAL(28,6))) AS DOUBLE)
            |      / CAST(sum(CAST(round(cnt * w, 6) AS DECIMAL(28,6))) AS DOUBLE), 12) AS m2,
            |    round(CAST(sum(CAST(round(cnt * w * g3, 6) AS DECIMAL(28,6))) AS DOUBLE)
            |      / CAST(sum(CAST(round(cnt * w, 6) AS DECIMAL(28,6))) AS DOUBLE), 12) AS m3,
            |    round(CAST(sum(CAST(round(cnt * (1 - w) * g1, 6) AS DECIMAL(28,6))) AS DOUBLE)
            |      / CAST(sum(CAST(round(cnt * (1 - w), 6) AS DECIMAL(28,6))) AS DOUBLE), 12) AS u1,
            |    round(CAST(sum(CAST(round(cnt * (1 - w) * g2, 6) AS DECIMAL(28,6))) AS DOUBLE)
            |      / CAST(sum(CAST(round(cnt * (1 - w), 6) AS DECIMAL(28,6))) AS DOUBLE), 12) AS u2,
            |    round(CAST(sum(CAST(round(cnt * (1 - w) * g3, 6) AS DECIMAL(28,6))) AS DOUBLE)
            |      / CAST(sum(CAST(round(cnt * (1 - w), 6) AS DECIMAL(28,6))) AS DOUBLE), 12) AS u3
            |  FROM e1 CROSS JOIN n),
            |e2 AS (
            |  SELECT g1, g2, g3, cnt, round(
            |    (p * (CASE WHEN g1 = 1 THEN m1 ELSE 1 - m1 END)
            |       * (CASE WHEN g2 = 1 THEN m2 ELSE 1 - m2 END)
            |       * (CASE WHEN g3 = 1 THEN m3 ELSE 1 - m3 END)) /
            |    (p * (CASE WHEN g1 = 1 THEN m1 ELSE 1 - m1 END)
            |       * (CASE WHEN g2 = 1 THEN m2 ELSE 1 - m2 END)
            |       * (CASE WHEN g3 = 1 THEN m3 ELSE 1 - m3 END)
            |     + (1 - p) * (CASE WHEN g1 = 1 THEN u1 ELSE 1 - u1 END)
            |       * (CASE WHEN g2 = 1 THEN u2 ELSE 1 - u2 END)
            |       * (CASE WHEN g3 = 1 THEN u3 ELSE 1 - u3 END)), 12) AS w
            |  FROM hist CROSS JOIN m1),
            |m2_ AS (
            |  SELECT
            |    round(CAST(sum(CAST(round(cnt * w, 6) AS DECIMAL(28,6)))
            |      AS DOUBLE) / max(n.n), 12) AS p,
            |    round(CAST(sum(CAST(round(cnt * w * g1, 6) AS DECIMAL(28,6))) AS DOUBLE)
            |      / CAST(sum(CAST(round(cnt * w, 6) AS DECIMAL(28,6))) AS DOUBLE), 12) AS m1,
            |    round(CAST(sum(CAST(round(cnt * w * g2, 6) AS DECIMAL(28,6))) AS DOUBLE)
            |      / CAST(sum(CAST(round(cnt * w, 6) AS DECIMAL(28,6))) AS DOUBLE), 12) AS m2,
            |    round(CAST(sum(CAST(round(cnt * w * g3, 6) AS DECIMAL(28,6))) AS DOUBLE)
            |      / CAST(sum(CAST(round(cnt * w, 6) AS DECIMAL(28,6))) AS DOUBLE), 12) AS m3,
            |    round(CAST(sum(CAST(round(cnt * (1 - w) * g1, 6) AS DECIMAL(28,6))) AS DOUBLE)
            |      / CAST(sum(CAST(round(cnt * (1 - w), 6) AS DECIMAL(28,6))) AS DOUBLE), 12) AS u1,
            |    round(CAST(sum(CAST(round(cnt * (1 - w) * g2, 6) AS DECIMAL(28,6))) AS DOUBLE)
            |      / CAST(sum(CAST(round(cnt * (1 - w), 6) AS DECIMAL(28,6))) AS DOUBLE), 12) AS u2,
            |    round(CAST(sum(CAST(round(cnt * (1 - w) * g3, 6) AS DECIMAL(28,6))) AS DOUBLE)
            |      / CAST(sum(CAST(round(cnt * (1 - w), 6) AS DECIMAL(28,6))) AS DOUBLE), 12) AS u3
            |  FROM e2 CROSS JOIN n),
            |e3 AS (
            |  SELECT g1, g2, g3, cnt, round(
            |    (p * (CASE WHEN g1 = 1 THEN m1 ELSE 1 - m1 END)
            |       * (CASE WHEN g2 = 1 THEN m2 ELSE 1 - m2 END)
            |       * (CASE WHEN g3 = 1 THEN m3 ELSE 1 - m3 END)) /
            |    (p * (CASE WHEN g1 = 1 THEN m1 ELSE 1 - m1 END)
            |       * (CASE WHEN g2 = 1 THEN m2 ELSE 1 - m2 END)
            |       * (CASE WHEN g3 = 1 THEN m3 ELSE 1 - m3 END)
            |     + (1 - p) * (CASE WHEN g1 = 1 THEN u1 ELSE 1 - u1 END)
            |       * (CASE WHEN g2 = 1 THEN u2 ELSE 1 - u2 END)
            |       * (CASE WHEN g3 = 1 THEN u3 ELSE 1 - u3 END)), 12) AS w
            |  FROM hist CROSS JOIN m2_),
            |m3_ AS (
            |  SELECT
            |    round(CAST(sum(CAST(round(cnt * w, 6) AS DECIMAL(28,6)))
            |      AS DOUBLE) / max(n.n), 12) AS p,
            |    round(CAST(sum(CAST(round(cnt * w * g1, 6) AS DECIMAL(28,6))) AS DOUBLE)
            |      / CAST(sum(CAST(round(cnt * w, 6) AS DECIMAL(28,6))) AS DOUBLE), 12) AS m1,
            |    round(CAST(sum(CAST(round(cnt * w * g2, 6) AS DECIMAL(28,6))) AS DOUBLE)
            |      / CAST(sum(CAST(round(cnt * w, 6) AS DECIMAL(28,6))) AS DOUBLE), 12) AS m2,
            |    round(CAST(sum(CAST(round(cnt * w * g3, 6) AS DECIMAL(28,6))) AS DOUBLE)
            |      / CAST(sum(CAST(round(cnt * w, 6) AS DECIMAL(28,6))) AS DOUBLE), 12) AS m3,
            |    round(CAST(sum(CAST(round(cnt * (1 - w) * g1, 6) AS DECIMAL(28,6))) AS DOUBLE)
            |      / CAST(sum(CAST(round(cnt * (1 - w), 6) AS DECIMAL(28,6))) AS DOUBLE), 12) AS u1,
            |    round(CAST(sum(CAST(round(cnt * (1 - w) * g2, 6) AS DECIMAL(28,6))) AS DOUBLE)
            |      / CAST(sum(CAST(round(cnt * (1 - w), 6) AS DECIMAL(28,6))) AS DOUBLE), 12) AS u2,
            |    round(CAST(sum(CAST(round(cnt * (1 - w) * g3, 6) AS DECIMAL(28,6))) AS DOUBLE)
            |      / CAST(sum(CAST(round(cnt * (1 - w), 6) AS DECIMAL(28,6))) AS DOUBLE), 12) AS u3
            |  FROM e3 CROSS JOIN n)
            |SELECT 1 AS field, round(m1, 6) AS m, round(u1, 6) AS u,
            |  round(p, 6) AS p, (SELECT n FROM n) AS n_pairs FROM m3_
            |UNION ALL
            |SELECT 2, round(m2, 6), round(u2, 6), round(p, 6),
            |  (SELECT n FROM n) FROM m3_
            |UNION ALL
            |SELECT 3, round(m3, 6), round(u3, 6), round(p, 6),
            |  (SELECT n FROM n) FROM m3_
            |ORDER BY field""".stripMargin),
    (s, d) => {
      val a = Tables.customer(s, d).select(
        col("c_custkey").as("ck"), col("c_nationkey").as("nk"),
        col("c_name").as("nm"),
        round(col("c_acctbal") * 100, 0).cast("long").as("bal"),
        col("c_mktsegment").as("seg"))
      val b = a
        .withColumn("__h", md5(col("ck").cast("string")))
        .withColumn("sel",
          graft.functions.TextFunctions.hexSpanVal(col("__h"), 0, 1) % 4)
        .select(col("ck"), col("nk"),
          when(col("sel") === 0, concat(col("nm"), lit("~")))
            .otherwise(col("nm")).as("nm"),
          (col("bal") + when(col("sel") === 1, 100L).otherwise(0L)).as("bal"),
          when(col("sel") === 2, lit("CORRUPTED")).otherwise(col("seg"))
            .as("seg"))
      val aB = a.toDF("ck_a", "nk", "nm_a", "bal_a", "seg_a")
        .withColumn("blk", substring(col("nm_a"), 1, 15))
      val bB = b.toDF("ck_b", "nk", "nm_b", "bal_b", "seg_b")
        .withColumn("blk", substring(col("nm_b"), 1, 15))
      val hist = graft.operators.PlanCache.persist(
        aB.join(bB, Seq("nk", "blk"))
          .groupBy(
            when(col("nm_a") === col("nm_b"), 1).otherwise(0).as("g1"),
            when(col("bal_a") === col("bal_b"), 1).otherwise(0).as("g2"),
            when(col("seg_a") === col("seg_b"), 1).otherwise(0).as("g3"))
          .agg(count(lit(1)).as("cnt")))
      val n = hist.agg(sum("cnt").cast("long").as("n"))
      def lik(g: String, hi: org.apache.spark.sql.Column,
          lo: org.apache.spark.sql.Column) =
        when(col(g) === 1, hi).otherwise(lo)
      // one EM iteration: histogram × 1-row params -> new 1-row params
      def step(params: org.apache.spark.sql.DataFrame)
          : org.apache.spark.sql.DataFrame = {
        val pm = col("p") * lik("g1", col("m1"), lit(1) - col("m1")) *
          lik("g2", col("m2"), lit(1) - col("m2")) *
          lik("g3", col("m3"), lit(1) - col("m3"))
        val pu = (lit(1) - col("p")) *
          lik("g1", col("u1"), lit(1) - col("u1")) *
          lik("g2", col("u2"), lit(1) - col("u2")) *
          lik("g3", col("u3"), lit(1) - col("u3"))
        val e = hist.crossJoin(broadcast(params))
          .select(col("g1"), col("g2"), col("g3"), col("cnt"),
            round(pm / (pm + pu), 12).as("w"))
        def dsum(c: org.apache.spark.sql.Column) =
          sum(round(c, 6).cast("decimal(28,6)")).cast("double")
        e.crossJoin(broadcast(n)).agg(
          round(dsum(col("cnt") * col("w")) / max("n"), 12).as("p"),
          round(dsum(col("cnt") * col("w") * col("g1")) /
            dsum(col("cnt") * col("w")), 12).as("m1"),
          round(dsum(col("cnt") * col("w") * col("g2")) /
            dsum(col("cnt") * col("w")), 12).as("m2"),
          round(dsum(col("cnt") * col("w") * col("g3")) /
            dsum(col("cnt") * col("w")), 12).as("m3"),
          round(dsum(col("cnt") * (lit(1) - col("w")) * col("g1")) /
            dsum(col("cnt") * (lit(1) - col("w"))), 12).as("u1"),
          round(dsum(col("cnt") * (lit(1) - col("w")) * col("g2")) /
            dsum(col("cnt") * (lit(1) - col("w"))), 12).as("u2"),
          round(dsum(col("cnt") * (lit(1) - col("w")) * col("g3")) /
            dsum(col("cnt") * (lit(1) - col("w"))), 12).as("u3"))
      }
      val p0 = n.select(lit(0.1).as("p"),
        lit(0.9).as("m1"), lit(0.9).as("m2"), lit(0.9).as("m3"),
        lit(0.1).as("u1"), lit(0.1).as("u2"), lit(0.1).as("u3"))
      val p3 = step(step(step(p0))).crossJoin(broadcast(n))
      // stack() fans the 1-row parameter frame into the 3 field rows in
      // ONE evaluation — the previous 3-way unionAll re-executed the
      // whole EM chain (its per-step broadcast builds included) once per
      // field: 73 jobs -> ~30 at identical values (r16)
      p3.select(expr(
          """stack(3,
            |  1, round(m1, 6), round(u1, 6),
            |  2, round(m2, 6), round(u2, 6),
            |  3, round(m3, 6), round(u3, 6)) AS (field, m, u)""".stripMargin),
          round(col("p"), 6).as("p"), col("n").as("n_pairs"))
        .orderBy("field")
    })

  val all: Seq[Q] = Seq(q388_fellegi_sunter, q439_fs_em)
}
