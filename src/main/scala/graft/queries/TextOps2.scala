package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._
import graft.functions.MinHashAggregator

/** Text ops, part 2: the custom typed Aggregator surface + sketches. */
object TextOps2 {

  private val K = 4

  /** Per-source MinHash signature via the custom Aggregator (elementwise
    * min-merge of per-doc signatures). Oracle: per-component min() over
    * the same rotated md5 values — semantically identical, so the custom
    * aggregate is fully correctness-gated. Signature emitted as columns
    * (array cells don't hash portably). */
  val q53_minhash_agg = Q(
    "q53_minhash_agg", {
      val comps = (0 until K).map { i =>
        val rot = if (i == 0) "md5(text)"
          else s"substr(md5(text), ${4 * i + 1}) || substr(md5(text), 1, ${4 * i})"
        s"min($rot) AS sig_$i"
      }.mkString(",\n  ")
      Some(s"""SELECT source,
            |  $comps
            |FROM documents
            |GROUP BY source
            |ORDER BY source""".stripMargin)
    },
    (s, d) => {
      val sigAgg = udaf(new MinHashAggregator(K))
      val perDoc = Tables.documents(s, d).select(
        col("source"),
        array((0 until K).map { i =>
          if (i == 0) md5(col("text"))
          else concat(substring(md5(col("text")), 4 * i + 1, 32 - 4 * i),
            substring(md5(col("text")), 1, 4 * i))
        }: _*).as("sig"))
      val grouped = perDoc.groupBy("source").agg(sigAgg(col("sig")).as("gsig"))
      grouped.select(
        col("source") +:
          (0 until K).map(i => element_at(col("gsig"), i + 1).as(s"sig_$i")): _*)
        .orderBy("source")
    })

  /** HLL / sketch surface. Approx values are engine-specific by design, so
    * the sketch itself can't be cross-engine hashed — instead the entry
    * emits the exact count plus a within-5% accuracy gate on the approx
    * count, and the oracle asserts the exact count and literal TRUE: a
    * drifting or broken HLL flips the boolean and fails the hash match. */
  val q54_approx_distinct = Q(
    "q54_approx_distinct",
    Some("""SELECT lang,
            |  CAST(count(DISTINCT text) AS BIGINT) AS exact_distinct,
            |  TRUE AS within_5pct
            |FROM documents
            |GROUP BY lang
            |ORDER BY lang""".stripMargin),
    (s, d) => Tables.documents(s, d)
      .groupBy("lang")
      .agg(
        countDistinct(col("text")).as("exact_distinct"),
        approx_count_distinct(col("text"), 0.02).as("approx_distinct"))
      .select(col("lang"), col("exact_distinct"),
        (abs(col("approx_distinct") - col("exact_distinct")).cast("double") /
          col("exact_distinct") <= 0.05).as("within_5pct"))
      .orderBy("lang"))

  /** Mergeable HLL sketches (Spark 4's Datasketches surface): one
    * 4 KB-class sketch per DAY of events, then `hll_union_agg` merges the
    * daily sketches into the period's distinct-user estimate — the
    * mergeable-summaries infrastructure that lets 100 TB of daily
    * partitions answer cross-period distincts WITHOUT re-scanning raw
    * data (only sketches move in the second agg). The estimate is gated
    * by the exact answer (q54's discipline: the oracle computes exact +
    * literal TRUE, so estimator drift flips the hash); union-of-parts ≡
    * sketch-of-whole is the law being exercised. */
  val q164_hll_merge = Q(
    "q164_hll_merge",
    Some("""WITH e AS (
            |  SELECT CAST(ts AS DATE) AS day, user_id FROM events)
            |SELECT CAST(count(DISTINCT day) AS BIGINT) AS n_days,
            |  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
            |  TRUE AS within_5pct
            |FROM e""".stripMargin),
    (s, d) => {
      val e = Tables.events(s, d).select(
        expr("CAST(timestamp_micros(ts div 1000) AS DATE)").as("day"),
        col("user_id"))
      val daily = e.groupBy("day")
        .agg(expr("hll_sketch_agg(user_id)").as("sk"))
      val merged = daily.agg(
        count(lit(1)).as("n_days"),
        expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      val exact = e.agg(count_distinct(col("user_id")).as("exact_users"))
      merged.crossJoin(exact)
        .select(col("n_days"), col("exact_users"),
          (abs(col("est") - col("exact_users")).cast("double") /
            col("exact_users") <= 0.05).as("within_5pct"))
    })

  /** HLL COHORT-OVERLAP estimate: |A∩B| for two behavioral cohorts
    * (purchasers vs clickers) via sketch algebra — estA + estB −
    * est(A ∪ B), the union computed by merging the two sketches
    * (hll_union), never by re-scanning rows. The audience-overlap
    * question every activation pipeline answers from pre-built daily
    * sketches. Inclusion-exclusion inherits both sketches' error, so
    * the gate is 10% (vs q54/q164's 5% single-set gates); exact counts
    * ride the same scan and the oracle asserts them plus literal TRUE —
    * estimator drift flips the hash.
    *
    * Scale shape: two sketch aggs + one exact per-user flag agg (the
    * gate's witness — at production scale the gate is sampled, the
    * sketches are the product); only KB-scale sketches move. */
  val q200_hll_intersect = Q(
    "q200_hll_intersect",
    Some("""WITH f AS (
            |  SELECT user_id,
            |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS a,
            |    max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS b
            |  FROM events GROUP BY user_id)
            |SELECT CAST(sum(a) AS BIGINT) AS exact_a,
            |  CAST(sum(b) AS BIGINT) AS exact_b,
            |  CAST(sum(a * b) AS BIGINT) AS exact_intersect,
            |  TRUE AS within_10pct
            |FROM f""".stripMargin),
    (s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"), col("event_type"))
      val ska = ev.filter(col("event_type") === "purchase")
        .agg(expr("hll_sketch_agg(user_id)").as("ska"))
      val skb = ev.filter(col("event_type") === "click")
        .agg(expr("hll_sketch_agg(user_id)").as("skb"))
      val est = ska.crossJoin(skb).select(
        expr("hll_sketch_estimate(ska)").as("est_a"),
        expr("hll_sketch_estimate(skb)").as("est_b"),
        expr("hll_sketch_estimate(hll_union(ska, skb))").as("est_u"))
      val exact = ev.groupBy("user_id")
        .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("a"),
          max(when(col("event_type") === "click", 1L).otherwise(0L))
            .as("b"))
        .agg(sum(col("a")).as("exact_a"), sum(col("b")).as("exact_b"),
          sum(col("a") * col("b")).as("exact_intersect"))
      exact.crossJoin(est)
        .select(col("exact_a"), col("exact_b"), col("exact_intersect"),
          (abs(col("est_a") + col("est_b") - col("est_u") -
            col("exact_intersect")).cast("double") /
            col("exact_intersect") <= 0.10).as("within_10pct"))
    })

  val all: Seq[Q] = Seq(q53_minhash_agg, q54_approx_distinct,
    q164_hll_merge, q200_hll_intersect)
}
