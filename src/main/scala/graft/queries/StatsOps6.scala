package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions.hexSpanValSql

/** Round-10 statistics additions: KMV (bottom-k) cardinality sketching
  * with an exact-vs-estimate audit.
  */
object StatsOps6 {

  private val KmvK = 24

  /** KMV / bottom-k distinct-count sketch per event type, audited
    * against the exact count — the mergeable cardinality estimator
    * whose state is k hashes (vs HLL's register array, q54/q164): with
    * h_k the k-th smallest of the distinct 32-bit md5 hashes,
    * est = (k−1)·2³²/h_k, falling back to the exact seen-hash count
    * when a group holds fewer than k distinct hashes.
    *
    * Scale shape (and the point of the entry): the SQL twin ranks with
    * a per-type window, but the Spark side uses the TopKAggregator fed
    * −hv — partial aggregation keeps ≤ k hashes per partition per
    * group, so only k values per group ever shuffle and NO window/sort
    * touches the distinct-user frame. At 100 TB the window formulation
    * sorts every group; the sketch formulation ships 24 longs. */
  val q382_kmv_distinct = Q(
    "q382_kmv_distinct",
    Some(s"""WITH pu AS (
            |  SELECT DISTINCT event_type, user_id FROM events),
            |h AS (
            |  SELECT DISTINCT event_type,
            |    ${hexSpanValSql("md5(CAST(user_id AS VARCHAR))", 0, 8)} AS hv
            |  FROM pu),
            |ranked AS (
            |  SELECT event_type, hv,
            |    row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
            |  FROM h),
            |st AS (
            |  SELECT event_type,
            |    CAST(count(*) AS BIGINT) AS n_hashes,
            |    max(CASE WHEN rn = $KmvK THEN hv END) AS hk
            |  FROM ranked WHERE rn <= $KmvK GROUP BY event_type),
            |ex AS (
            |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_exact
            |  FROM pu GROUP BY event_type),
            |est AS (
            |  SELECT e.event_type, e.n_exact,
            |    round(CASE WHEN s.n_hashes < $KmvK
            |      THEN CAST(s.n_hashes AS DOUBLE)
            |      ELSE ${KmvK - 1} * 4294967296.0 / s.hk END, 4) AS kmv_est
            |  FROM ex e JOIN st s ON s.event_type = e.event_type)
            |SELECT event_type, n_exact, kmv_est,
            |  round(abs(kmv_est - n_exact) / n_exact, 6) AS rel_err
            |FROM est ORDER BY event_type""".stripMargin),
    (s, d) => {
      val pu = graft.operators.PlanCache.persist(
        Tables.events(s, d).select("event_type", "user_id").distinct())
      val h = pu
        .withColumn("__h", md5(col("user_id").cast("string")))
        .select(col("event_type"),
          expr(hexSpanValSql("__h", 0, 8)).as("hv"))
        .distinct()
      // bottom-k via the map-side-bounded top-k aggregator on −hv:
      // finish() emits ids ordered by score desc = hv asc, so the last
      // element of the ≤k array IS h_k
      val botk = udaf(new graft.functions.TopKAggregator(KmvK))
      val st = h.select(col("event_type"),
          (-col("hv")).cast("double").as("score"), col("hv").as("id"))
        .groupBy("event_type")
        .agg(botk(col("score"), col("id")).as("ids"))
        .select(col("event_type"), size(col("ids")).as("n_hashes"),
          element_at(col("ids"), size(col("ids"))).as("hk"))
      val ex = pu.groupBy("event_type").agg(count(lit(1)).as("n_exact"))
      ex.join(st, "event_type")
        .select(col("event_type"), col("n_exact"),
          round(when(col("n_hashes") < KmvK, col("n_hashes").cast("double"))
            .otherwise(lit((KmvK - 1) * 4294967296.0) / col("hk")), 4)
            .as("kmv_est"))
        .select(col("event_type"), col("n_exact"), col("kmv_est"),
          round(abs(col("kmv_est") - col("n_exact")) / col("n_exact"), 6)
            .as("rel_err"))
        .orderBy("event_type")
    })

  val all: Seq[Q] = Seq(q382_kmv_distinct)
}
