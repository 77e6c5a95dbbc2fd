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

  val all: Seq[Q] = Seq(q389_seq_patterns)
}
