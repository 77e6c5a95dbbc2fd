package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.Q.dec

/** Round-9 pipeline-diagnostics additions: freshness SLA, heavy-tail
  * index estimation, and multiple-testing control.
  */
object OpsDiag2 {

  /** Per-stream freshness SLA: each event type's latest event time
    * lagged against the globally freshest stream — the staleness
    * dashboard every ingest DAG ships (a stuck consumer shows up as one
    * type's lag growing while the others advance). Two tiny aggs: one
    * (type → max ts), one global max re-entering as a 1-row broadcast;
    * lag is integer µs arithmetic, breach at the 24 h line. */
  val q288_freshness_sla = Q(
    "q288_freshness_sla",
    Some("""WITH t AS (
           |  SELECT event_type, CAST(max(epoch_us(ts)) AS BIGINT) AS max_us
           |  FROM events GROUP BY event_type),
           |g AS (SELECT CAST(max(max_us) AS BIGINT) AS g_us FROM t)
           |SELECT event_type, max_us,
           |  CAST((g_us - max_us) // 3600000000 AS BIGINT) AS lag_hours,
           |  CAST(CASE WHEN g_us - max_us > 86400000000 THEN 1 ELSE 0 END
           |    AS BIGINT) AS sla_breach
           |FROM t CROSS JOIN g
           |ORDER BY event_type""".stripMargin),
    (s, d) => {
      val t = Tables.events(s, d)
        .groupBy("event_type")
        .agg(max(expr("ts div 1000")).as("max_us"))
      val g = t.agg(max("max_us").as("g_us"))
      t.crossJoin(broadcast(g))
        .select(col("event_type"), col("max_us"),
          expr("(g_us - max_us) div 3600000000").as("lag_hours"),
          when(col("g_us") - col("max_us") > 86400000000L, 1L)
            .otherwise(0L).as("sla_breach"))
        .orderBy("event_type")
    })

  private val HillK = 50

  /** Hill estimator of the document-length tail index — the "how heavy
    * is the tail" number that decides whether max-length truncation
    * (q248) or outlier quarantine is needed before batching. The
    * textbook estimator sorts the sample and averages ln(x₍ᵢ₎/x₍ₖ₊₁₎)
    * over the top k — a global sort. Here the order statistics come from
    * the bounded length histogram (the q193/q215 device): the (k+1)-th
    * largest is a cumulative-count selection, and since values tied with
    * it contribute ln(1)=0, the top-k sum is exactly the histogram sum
    * over lengths strictly above it — tie-order never matters. Per-term
    * logs round at 8 then decimal-sum (the PMI convention). */
  val q289_hill_tail = Q(
    "q289_hill_tail",
    Some(s"""WITH h AS (
            |  SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS c
            |  FROM documents GROUP BY n_chars),
            |cum AS (
            |  SELECT v, c, CAST(sum(c) OVER (ORDER BY v DESC
            |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cnt_ge
            |  FROM h),
            |t AS (
            |  SELECT CAST(max(v) AS BIGINT) AS xk1 FROM cum
            |  WHERE cnt_ge >= ${HillK + 1}),
            |s AS (
            |  SELECT round(CAST(sum(CAST(round(
            |      c * ln(CAST(v AS DOUBLE) / xk1), 8) AS DECIMAL(20,8)))
            |    AS DOUBLE) / $HillK, 6) AS hill_h
            |  FROM h CROSS JOIN t WHERE v > xk1)
            |SELECT CAST($HillK AS BIGINT) AS k, t.xk1, s.hill_h,
            |  round(CASE WHEN s.hill_h > 0 THEN 1.0 / s.hill_h ELSE 0 END, 6)
            |    AS alpha
            |FROM t CROSS JOIN s""".stripMargin),
    (s, d) => {
      val h = graft.operators.PlanCache.persist(Tables.documents(s, d)
        .groupBy(col("n_chars").as("v")).agg(count(lit(1)).as("c")))
      val wCum = org.apache.spark.sql.expressions.Window
        .orderBy(col("v").desc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val t = h.withColumn("cnt_ge", sum("c").over(wCum).cast("long"))
        .filter(col("cnt_ge") >= HillK + 1)
        .agg(max("v").cast("long").as("xk1"))
      val sdf = h.crossJoin(broadcast(t)).filter(col("v") > col("xk1"))
        .select(round(col("c") * log(col("v").cast("double") / col("xk1")), 8)
          .cast("decimal(20,8)").as("term"))
        .agg(round(sum("term").cast("double") / HillK, 6).as("hill_h"))
      broadcast(t).crossJoin(sdf)
        .select(lit(HillK.toLong).as("k"), col("xk1"), col("hill_h"),
          round(when(col("hill_h") > 0, lit(1.0) / col("hill_h"))
            .otherwise(0.0), 6).as("alpha"))
    })

  private val FdrQ = 0.10

  /** Benjamini–Hochberg FDR control over the per-source mean-length
    * tests — the multiple-testing layer q270's single z-test lacks: 20
    * sources = 20 simultaneous hypotheses, and raw per-test thresholds
    * inflate false discoveries. Per source, a known-variance z against
    * the global mean from exact decimal moments; the p-value is the
    * Gaussian tail BOUND 2·exp(−z²/2) (a deterministic monotone
    * surrogate — erf is not bit-stable across libm builds, and BH only
    * needs valid p-values: a bound is conservative). The BH step-up is
    * two windows over the 20-row source grid: rank by p, find the
    * largest rank with p ≤ q·i/m, reject everything at or below it. */
  val q290_bh_fdr = Q(
    "q290_bh_fdr",
    Some(s"""WITH src AS (
            |  SELECT source, CAST(count(*) AS BIGINT) AS n_s,
            |    CAST(sum(CAST(n_chars AS DECIMAL(38,0))) AS DOUBLE)
            |      / count(*) AS mean_s
            |  FROM documents GROUP BY source),
            |g AS (
            |  SELECT CAST(count(*) AS BIGINT) AS n,
            |    CAST(sum(CAST(n_chars AS DECIMAL(38,0))) AS DOUBLE)
            |      / count(*) AS mean_g,
            |    CAST(sum(CAST(n_chars AS DECIMAL(38,0)) * n_chars)
            |      AS DOUBLE) / count(*) AS m2
            |  FROM documents),
            |z AS (
            |  SELECT source, n_s,
            |    (mean_s - mean_g) / sqrt((m2 - mean_g * mean_g) / n_s) AS z
            |  FROM src CROSS JOIN g),
            |p AS (
            |  SELECT source, n_s, z,
            |    least(1.0, 2 * exp(-(z * z) / 2)) AS pb
            |  FROM z),
            |r AS (
            |  SELECT source, n_s, z, pb,
            |    CAST(row_number() OVER (ORDER BY pb, source) AS BIGINT)
            |      AS rk,
            |    CAST(count(*) OVER () AS BIGINT) AS m
            |  FROM p),
            |k AS (
            |  SELECT coalesce(max(CASE WHEN pb <= $FdrQ * rk / m
            |    THEN rk END), 0) AS kmax
            |  FROM r)
            |SELECT source, round(z, 6) AS z, round(pb, 8) AS p_bound, rk,
            |  round($FdrQ * rk / m, 8) AS bh_thresh,
            |  CAST(CASE WHEN rk <= kmax THEN 1 ELSE 0 END AS BIGINT)
            |    AS rejected
            |FROM r CROSS JOIN k
            |ORDER BY source""".stripMargin),
    (s, d) => {
      val docs = Tables.documents(s, d)
      val nd = col("n_chars").cast("decimal(38,0)")
      val src = docs.groupBy("source")
        .agg(count(lit(1)).as("n_s"),
          (sum(nd).cast("double") / count(lit(1))).as("mean_s"))
      val g = docs.agg(count(lit(1)).as("n"),
        (sum(nd).cast("double") / count(lit(1))).as("mean_g"),
        (sum(nd * col("n_chars")).cast("double") / count(lit(1))).as("m2"))
      val z = src.crossJoin(broadcast(g))
        .select(col("source"), col("n_s"),
          ((col("mean_s") - col("mean_g")) /
            sqrt((col("m2") - col("mean_g") * col("mean_g")) / col("n_s")))
            .as("z"))
      val p = z.withColumn("pb",
        least(lit(1.0), lit(2) * exp(-(col("z") * col("z")) / 2)))
      // windows over the source grid only (≤ |sources| rows)
      val wRank = org.apache.spark.sql.expressions.Window
        .orderBy(col("pb"), col("source"))
      val r = graft.operators.PlanCache.persist(p
        .withColumn("rk", row_number().over(wRank).cast("long"))
        .withColumn("m", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy()).cast("long")))
      val k = r.agg(coalesce(max(when(
        col("pb") <= lit(FdrQ) * col("rk") / col("m"), col("rk"))), lit(0L))
        .as("kmax"))
      r.crossJoin(broadcast(k))
        .select(col("source"), round(col("z"), 6).as("z"),
          round(col("pb"), 8).as("p_bound"), col("rk"),
          round(lit(FdrQ) * col("rk") / col("m"), 8).as("bh_thresh"),
          when(col("rk") <= col("kmax"), 1L).otherwise(0L).as("rejected"))
        .orderBy("source")
    })

  private val SaltTargetRows = 50000L
  private val SaltCap = 32L

  /** Salting planner — the decision layer in front of q47/q64's salted
    * execution: WHICH keys need salting and by how much. Per join/agg
    * key, the exact row count → salt factor = ⌈count/target⌉ capped at
    * the q64 replication bound; reports the post-salt expected max
    * per-reducer share so the plan's effect is visible before running
    * it. One key-keyed hash agg + a 1-row total broadcast; the planner
    * output is key-domain-sized metadata (the thing a nightly job
    * materializes and the morning's joins read). */
  val q298_salt_planner = Q(
    "q298_salt_planner",
    Some(s"""WITH k AS (
            |  SELECT l_returnflag AS key, CAST(count(*) AS BIGINT) AS n
            |  FROM lineitem GROUP BY l_returnflag),
            |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM k)
            |SELECT key, n,
            |  round(CAST(n AS DOUBLE) / total, 6) AS share,
            |  least(CAST(ceil(CAST(n AS DOUBLE) / $SaltTargetRows)
            |    AS BIGINT), $SaltCap) AS salt_factor,
            |  round(CAST(n AS DOUBLE)
            |    / least(CAST(ceil(CAST(n AS DOUBLE) / $SaltTargetRows)
            |        AS BIGINT), $SaltCap) / total, 6) AS post_salt_share
            |FROM k CROSS JOIN t
            |ORDER BY key""".stripMargin),
    (s, d) => {
      val k = Tables.lineitem(s, d)
        .groupBy(col("l_returnflag").as("key"))
        .agg(count(lit(1)).as("n"))
      val t = k.agg(sum("n").cast("long").as("total"))
      val factor = least(
        ceil(col("n").cast("double") / SaltTargetRows).cast("long"),
        lit(SaltCap))
      k.crossJoin(broadcast(t))
        .select(col("key"), col("n"),
          round(col("n").cast("double") / col("total"), 6).as("share"),
          factor.as("salt_factor"),
          round(col("n").cast("double") / factor / col("total"), 6)
            .as("post_salt_share"))
        .orderBy("key")
    })

  /** HOT-KEY broadcast-cache sizing: if a lookup service caches the
    * top-k hottest keys driver-side, what fraction of row lookups hit
    * the cache? coverage(k) for k ∈ {10, 100, 1000} computed EXACTLY
    * from the count-of-counts histogram — the k-th hottest count t_k
    * is the q193/q440 threshold device, full-count keys above t_k
    * contribute everything, and the tie tier at t_k contributes only
    * the (k − #above) keys that fit, all in BIGINT arithmetic. This is
    * the "is a broadcast cache worth it" curve (q298's salt planner
    * decides how to SPREAD a hot key; this decides whether to SHORT-
    * CIRCUIT it).
    *
    * Scale shape: one key agg, a count-of-counts grid window, three
    * broadcast threshold rows — survives billion-key tables. */
  val q450_hot_key_cache_plan = Q(
    "q450_hot_key_cache_plan",
    Some("""WITH kc AS (
           |  SELECT user_id, CAST(count(*) AS BIGINT) AS c
           |  FROM events GROUP BY user_id),
           |coc AS (
           |  SELECT c, CAST(count(*) AS BIGINT) AS k FROM kc GROUP BY c),
           |cd AS (
           |  SELECT c, k,
           |    CAST(sum(k) OVER (ORDER BY c DESC
           |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumdesc,
           |    CAST(sum(c * k) OVER (ORDER BY c DESC
           |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumrows,
           |    CAST(sum(c * k) OVER () AS BIGINT) AS total
           |  FROM coc),
           |ks AS (SELECT CAST(unnest([10, 100, 1000]) AS BIGINT) AS kk),
           |t AS (
           |  SELECT ks.kk,
           |    coalesce(max(CASE WHEN cumdesc >= ks.kk THEN c END), 0)
           |      AS tk,
           |    max(total) AS total
           |  FROM ks CROSS JOIN cd GROUP BY ks.kk),
           |cov AS (
           |  SELECT t.kk, t.tk, t.total,
           |    CAST(coalesce(sum(CASE WHEN cd.c > t.tk
           |      THEN cd.c * cd.k END), 0) AS BIGINT) AS full_rows,
           |    CAST(coalesce(sum(CASE WHEN cd.c > t.tk THEN cd.k END), 0)
           |      AS BIGINT) AS full_keys
           |  FROM t CROSS JOIN coc cd GROUP BY t.kk, t.tk, t.total)
           |SELECT kk AS cache_k, tk AS count_cut,
           |  full_rows + (kk - full_keys) * tk AS covered_rows,
           |  total,
           |  round(CAST(full_rows + (kk - full_keys) * tk AS DOUBLE)
           |    / total, 6) AS hit_rate
           |FROM cov ORDER BY cache_k""".stripMargin),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val kc = Tables.events(s, d).groupBy("user_id")
        .agg(count(lit(1)).as("c"))
      val coc = graft.operators.PlanCache.persist(
        kc.groupBy("c").agg(count(lit(1)).as("k")))
      val wd = Window.orderBy(col("c").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wa = Window.orderBy(col("c").desc)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val cd = coc.select(col("c"), col("k"),
        sum("k").over(wd).cast("long").as("cumdesc"),
        sum(col("c") * col("k")).over(wd).cast("long").as("cumrows"),
        sum(col("c") * col("k")).over(wa).cast("long").as("total"))
      val ks = { import s.implicits._; Seq(10L, 100L, 1000L).toDF("kk") }
      val t = ks.crossJoin(cd).groupBy("kk")
        .agg(coalesce(max(when(col("cumdesc") >= col("kk"), col("c"))),
          lit(0L)).as("tk"), max("total").as("total"))
      val cov = broadcast(t).crossJoin(coc).groupBy("kk", "tk", "total")
        .agg(coalesce(sum(when(col("c") > col("tk"),
            col("c") * col("k"))), lit(0L)).cast("long").as("full_rows"),
          coalesce(sum(when(col("c") > col("tk"), col("k"))), lit(0L))
            .cast("long").as("full_keys"))
      // tie-tier take: t_k's minimality guarantees full_keys < kk and
      // cumdesc(t_k) >= kk guarantees enough tied keys exist; tk = 0
      // (fewer than kk keys in total) zeroes the term
      val covered = col("full_rows") +
        (col("kk") - col("full_keys")) * col("tk")
      cov.select(col("kk").as("cache_k"), col("tk").as("count_cut"),
          covered.as("covered_rows"), col("total"),
          round(covered.cast("double") / col("total"), 6).as("hit_rate"))
        .orderBy("cache_k")
    })

  val all: Seq[Q] = Seq(q288_freshness_sla, q289_hill_tail, q290_bh_fdr,
    q298_salt_planner, q450_hot_key_cache_plan)
}
