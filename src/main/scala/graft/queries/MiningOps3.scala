package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Round-10 sequence-mining additions. */
object MiningOps3 {

  private val SeqMinSup = 0.05

  /** Sequential-pattern support (the PrefixSpan depth-2 core): for
    * every ordered event-type pair a→b, the share of users with SOME
    * occurrence of a strictly before SOME occurrence of b — true
    * subsequence containment with arbitrary gap, NOT the adjacent
    * n-gram q185 counts. The containment test needs only each user's
    * per-type first/last timestamps (a before b ⇔ min_ts(a) <
    * max_ts(b)), so the corpus collapses to a (user × type) grid in
    * one agg and the pair join is user-local over ≤|types|² rows —
    * no corpus self-join, no window. Confidence = support(a→b) /
    * support(a present). */
  val q389_seq_patterns = Q(
    "q389_seq_patterns",
    Some(s"""WITH ut AS (
            |  SELECT user_id, event_type,
            |    CAST(min(epoch_us(ts)) AS BIGINT) AS mn,
            |    CAST(max(epoch_us(ts)) AS BIGINT) AS mx
            |  FROM events GROUP BY 1, 2),
            |nu AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n
            |       FROM ut),
            |na AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_a
            |       FROM ut GROUP BY 1),
            |ab AS (
            |  SELECT a.event_type AS ta, b.event_type AS tb,
            |    CAST(count(*) AS BIGINT) AS n_users
            |  FROM ut a JOIN ut b
            |    ON a.user_id = b.user_id AND a.event_type <> b.event_type
            |   AND a.mn < b.mx
            |  GROUP BY 1, 2)
            |SELECT ta, tb, n_users,
            |  round(CAST(n_users AS DOUBLE) / nu.n, 6) AS support,
            |  round(CAST(n_users AS DOUBLE) / na.n_a, 6) AS confidence
            |FROM ab JOIN na ON na.event_type = ab.ta
            |CROSS JOIN nu
            |WHERE CAST(n_users AS DOUBLE) / nu.n >= $SeqMinSup
            |ORDER BY ta, tb""".stripMargin),
    (s, d) => {
      val ut = graft.operators.PlanCache.persist(
        Tables.events(s, d)
          .select(col("user_id"), col("event_type"),
            expr("ts div 1000").as("us"))
          .groupBy("user_id", "event_type")
          .agg(min("us").as("mn"), max("us").as("mx")))
      val nu = ut.agg(countDistinct("user_id").as("n"))
      val na = ut.groupBy(col("event_type").as("ta"))
        .agg(count(lit(1)).as("n_a"))
      val ab = ut.toDF("user_id", "ta", "mn_a", "mx_a")
        .join(ut.toDF("user_id", "tb", "mn_b", "mx_b"), "user_id")
        .filter(col("ta") =!= col("tb") && col("mn_a") < col("mx_b"))
        .groupBy("ta", "tb").agg(count(lit(1)).as("n_users"))
      ab.join(na, "ta").crossJoin(broadcast(nu))
        .filter(col("n_users").cast("double") / col("n") >= SeqMinSup)
        .select(col("ta"), col("tb"), col("n_users"),
          round(col("n_users").cast("double") / col("n"), 6).as("support"),
          round(col("n_users").cast("double") / col("n_a"), 6)
            .as("confidence"))
        .orderBy("ta", "tb")
    })

  /** CART's optimal categorical split (Breiman's theorem): to split a
    * categorical feature on a binary target you do NOT search all 2^C
    * subsets — order the categories by positive rate and the optimal
    * split is one of the C−1 contiguous prefix cuts. Feature = doc
    * source, target = lang='en': per-cut weighted Gini impurity
    * (nL·gL + nR·gR)/N over the rate-ordered prefix, best cut flagged
    * (ties → smallest cut). Complements q369's numeric threshold
    * stump with the categorical half of the tree-split toolkit. All
    * counts are exact integers; the Gini doubles divide exact ints
    * < 2⁵³ with the same expression shape on both engines, so the
    * argmin cannot drift.
    *
    * Scale shape: one corpus agg to the ≤|sources| grid; ordering,
    * prefix sums, and the cut scan all run on grid rows. */
  val q397_cart_split = Q(
    "q397_cart_split",
    Some("""WITH g AS (
           |  SELECT source, CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
           |      AS pos
           |  FROM documents GROUP BY source),
           |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
           |        CAST(sum(pos) AS BIGINT) AS pp FROM g),
           |ord AS (
           |  SELECT source, n, pos,
           |    row_number() OVER (ORDER BY CAST(pos AS DOUBLE) / n, source)
           |      AS k,
           |    CAST(sum(n) OVER (ORDER BY CAST(pos AS DOUBLE) / n, source
           |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cn,
           |    CAST(sum(pos) OVER (ORDER BY CAST(pos AS DOUBLE) / n, source
           |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cp
           |  FROM g),
           |cuts AS (
           |  SELECT o.k AS cut_k, o.source AS last_left,
           |    o.cn AS n_left, o.cp AS pos_left,
           |    (o.cn - (CAST(o.cp AS DOUBLE) * o.cp
           |       + CAST(o.cn - o.cp AS DOUBLE) * (o.cn - o.cp)) / o.cn
           |     + (t.nn - o.cn)
           |     - (CAST(t.pp - o.cp AS DOUBLE) * (t.pp - o.cp)
           |       + CAST(t.nn - o.cn - t.pp + o.cp AS DOUBLE)
           |         * (t.nn - o.cn - t.pp + o.cp)) / (t.nn - o.cn))
           |    / t.nn AS gini_w
           |  FROM ord o CROSS JOIN tot t
           |  WHERE o.cn < t.nn),
           |best AS (
           |  SELECT cut_k, row_number() OVER (
           |    ORDER BY round(gini_w, 12), cut_k) AS r
           |  FROM cuts)
           |SELECT c.cut_k, c.last_left, c.n_left, c.pos_left,
           |  round(c.gini_w, 6) AS gini_w,
           |  CAST(CASE WHEN b.r = 1 THEN 1 ELSE 0 END AS BIGINT) AS best
           |FROM cuts c JOIN best b ON b.cut_k = c.cut_k
           |ORDER BY c.cut_k""".stripMargin),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val g = Tables.documents(s, d)
        .groupBy("source").agg(count(lit(1)).as("n"),
          sum(when(col("lang") === "en", 1).otherwise(0)).cast("long")
            .as("pos"))
      val tot = g.agg(sum("n").cast("long").as("nn"),
        sum("pos").cast("long").as("pp"))
      val ordW = Window.orderBy(col("pos").cast("double") / col("n"),
        col("source"))
      val ord = g
        .withColumn("k", row_number().over(ordW))
        .withColumn("cn", sum("n").over(
          ordW.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("long"))
        .withColumn("cp", sum("pos").over(
          ordW.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("long"))
      def dbl(c: org.apache.spark.sql.Column) = c.cast("double")
      val cuts = graft.operators.PlanCache.persist(
        ord.crossJoin(broadcast(tot))
          .filter(col("cn") < col("nn"))
          .select(col("k").cast("long").as("cut_k"),
            col("source").as("last_left"),
            col("cn").as("n_left"), col("cp").as("pos_left"),
            ((col("cn") - (dbl(col("cp")) * col("cp")
              + dbl(col("cn") - col("cp")) * (col("cn") - col("cp")))
                / col("cn")
              + (col("nn") - col("cn"))
              - (dbl(col("pp") - col("cp")) * (col("pp") - col("cp"))
                + dbl(col("nn") - col("cn") - col("pp") + col("cp"))
                  * (col("nn") - col("cn") - col("pp") + col("cp")))
                / (col("nn") - col("cn")))
              / col("nn")).as("gini_w")))
      val best = cuts.select(col("cut_k"),
        row_number().over(Window.orderBy(round(col("gini_w"), 12),
          col("cut_k"))).as("r"))
      cuts.join(best, "cut_k")
        .select(col("cut_k"), col("last_left"), col("n_left"),
          col("pos_left"), round(col("gini_w"), 6).as("gini_w"),
          when(col("r") === 1, 1L).otherwise(0L).cast("long").as("best"))
        .orderBy("cut_k")
    })

  val all: Seq[Q] = Seq(q389_seq_patterns, q397_cart_split)
}
