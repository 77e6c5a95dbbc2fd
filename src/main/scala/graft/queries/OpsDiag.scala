package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Operational diagnostics: the reports an engine operator runs BEFORE
  * sizing a job — key-skew profiling (decides salting, AQE skew
  * thresholds, partition counts) and a join-cardinality estimator audit
  * (the CBO formula vs ground truth). Both are exact-integer plans so
  * the numbers are bit-stable cross-engine.
  */
object OpsDiag {

  /** KEY-SKEW report over events.user_id: per-key row counts summarized
    * into the numbers a salting/AQE decision needs — max/mean ratio,
    * coefficient of variation, top-key share, and exact p50/p99 of the
    * per-key counts.
    *
    * The percentiles come from a HISTOGRAM-OF-COUNTS cumulative
    * selection (count value → #keys at that value, cumulate over the
    * tiny distinct-count domain, pick the smallest value covering the
    * rank), NOT from a global rank window — so the plan has no
    * single-partition sort over |keys| rows and survives billion-key
    * tables. CV uses exact BIGINT moments (n·Σc² − (Σc)²) divided in
    * double at the end; at extreme scale the moment products route
    * through DECIMAL(38) before the final division (same report).
    *
    * Scale shape: one key-keyed hash agg (|keys| rows out), one
    * count-domain hash agg (tiny), one count-domain window, one global
    * 1-row agg. */
  val q193_key_skew = Q(
    "q193_key_skew",
    Some("""WITH c AS (
           |  SELECT user_id, CAST(count(*) AS BIGINT) AS c
           |  FROM events GROUP BY user_id),
           |m AS (
           |  SELECT CAST(count(*) AS BIGINT) AS n_keys,
           |    CAST(sum(c) AS BIGINT) AS total_rows,
           |    CAST(max(c) AS BIGINT) AS max_c,
           |    CAST(sum(c * c) AS BIGINT) AS sum_sq
           |  FROM c),
           |h AS (
           |  SELECT c, CAST(count(*) AS BIGINT) AS k FROM c GROUP BY c),
           |cum AS (
           |  SELECT c, sum(k) OVER (ORDER BY c
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ck
           |  FROM h),
           |p AS (
           |  SELECT
           |    min(CASE WHEN ck >= (SELECT (n_keys + 1) // 2 FROM m)
           |        THEN c END) AS p50_c,
           |    min(CASE WHEN ck >= (SELECT (99 * n_keys + 99) // 100 FROM m)
           |        THEN c END) AS p99_c
           |  FROM cum)
           |SELECT n_keys, total_rows, max_c, p50_c, p99_c,
           |  round(CAST(max_c * n_keys AS DOUBLE) / total_rows, 6)
           |    AS max_over_mean,
           |  round(sqrt(CAST(n_keys * sum_sq - total_rows * total_rows
           |    AS DOUBLE)) / total_rows, 6) AS cv,
           |  round(CAST(max_c AS DOUBLE) / total_rows, 6) AS top1_share
           |FROM m, p""".stripMargin),
    (s, d) => {
      val counts = Tables.events(s, d)
        .groupBy("user_id").agg(count(lit(1)).as("c"))
      val m = counts.agg(
        count(lit(1)).as("n_keys"),
        sum(col("c")).as("total_rows"),
        max(col("c")).as("max_c"),
        sum(col("c") * col("c")).as("sum_sq"))
      val wCum = Window.orderBy("c")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = counts.groupBy("c").agg(count(lit(1)).as("k"))
        .withColumn("ck", sum(col("k")).over(wCum))
      // the count-domain frame is tiny (distinct count values), so the
      // 1-row broadcast of m onto it is free; rank thresholds are exact
      // integer arithmetic
      val p = cum.crossJoin(broadcast(m))
        .agg(
          // Column./ is DOUBLE division — cast back to long for the
          // integer rank (// in the oracle)
          min(when(col("ck") >= ((col("n_keys") + 1) / 2).cast("long"),
            col("c"))).as("p50_c"),
          min(when(col("ck") >= ((col("n_keys") * 99 + 99) / 100)
            .cast("long"), col("c"))).as("p99_c"))
      m.crossJoin(broadcast(p))
        .select(col("n_keys"), col("total_rows"), col("max_c"),
          col("p50_c"), col("p99_c"),
          round((col("max_c") * col("n_keys")).cast("double") /
            col("total_rows"), 6).as("max_over_mean"),
          round(sqrt((col("n_keys") * col("sum_sq") -
            col("total_rows") * col("total_rows")).cast("double")) /
            col("total_rows"), 6).as("cv"),
          round(col("max_c").cast("double") / col("total_rows"), 6)
            .as("top1_share"))
    })

  /** JOIN-CARDINALITY ESTIMATOR AUDIT: the textbook CBO formula
    * |R ⋈ S| ≈ |R|·|S| / max(ndv_R(k), ndv_S(k)) checked against the
    * true join count for three real key relationships (FK exact, FK
    * filtered-child, M:N-ish). The audit an optimizer regression suite
    * runs: est_rows is rounded FIRST and the error ratio computed from
    * the rounded value, so every float is derived from exact BIGINTs in
    * one deterministic step.
    *
    * Scale shape: per pair, two single-row stat aggs (count + exact
    * NDV; swap for HLL at extreme scale) and one keys-only equi-join
    * count — the join projects nothing but the key, so the shuffle
    * carries 8-byte keys. */
  val q194_join_estimator = Q(
    "q194_join_estimator",
    Some("""WITH pairs AS (
           |  SELECT 'customer_orders' AS pair,
           |    (SELECT count(*) FROM customer) AS n1,
           |    (SELECT count(DISTINCT c_custkey) FROM customer) AS d1,
           |    (SELECT count(*) FROM orders) AS n2,
           |    (SELECT count(DISTINCT o_custkey) FROM orders) AS d2,
           |    (SELECT count(*) FROM customer JOIN orders
           |       ON c_custkey = o_custkey) AS actual
           |  UNION ALL
           |  SELECT 'orders_lineitem',
           |    (SELECT count(*) FROM orders),
           |    (SELECT count(DISTINCT o_orderkey) FROM orders),
           |    (SELECT count(*) FROM lineitem),
           |    (SELECT count(DISTINCT l_orderkey) FROM lineitem),
           |    (SELECT count(*) FROM orders JOIN lineitem
           |       ON o_orderkey = l_orderkey)
           |  UNION ALL
           |  SELECT 'part_lineitem',
           |    (SELECT count(*) FROM part),
           |    (SELECT count(DISTINCT p_partkey) FROM part),
           |    (SELECT count(*) FROM lineitem),
           |    (SELECT count(DISTINCT l_partkey) FROM lineitem),
           |    (SELECT count(*) FROM part JOIN lineitem
           |       ON p_partkey = l_partkey))
           |SELECT pair,
           |  CAST(n1 AS BIGINT) AS n1, CAST(d1 AS BIGINT) AS d1,
           |  CAST(n2 AS BIGINT) AS n2, CAST(d2 AS BIGINT) AS d2,
           |  CAST(actual AS BIGINT) AS actual_rows,
           |  round(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
           |    / greatest(d1, d2), 2) AS est_rows,
           |  round(CAST(actual AS DOUBLE) /
           |    round(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
           |      / greatest(d1, d2), 2), 6) AS actual_over_est
           |FROM pairs ORDER BY pair""".stripMargin),
    (s, d) => {
      def audit(pair: String, t1: org.apache.spark.sql.DataFrame, k1: String,
          t2: org.apache.spark.sql.DataFrame, k2: String) = {
        val s1 = t1.select(col(k1)).agg(count(lit(1)).as("n1"),
          countDistinct(col(k1)).as("d1"))
        val s2 = t2.select(col(k2)).agg(count(lit(1)).as("n2"),
          countDistinct(col(k2)).as("d2"))
        val act = t1.select(col(k1)).join(t2.select(col(k2)),
            col(k1) === col(k2))
          .agg(count(lit(1)).as("actual"))
        s1.crossJoin(s2).crossJoin(act).select(lit(pair).as("pair"),
          col("n1"), col("d1"), col("n2"), col("d2"),
          col("actual").as("actual_rows"),
          round(col("n1").cast("double") * col("n2").cast("double") /
            greatest(col("d1"), col("d2")), 2).as("est_rows"))
      }
      val cust = Tables.customer(s, d); val ord = Tables.orders(s, d)
      val li = Tables.lineitem(s, d); val pt = Tables.part(s, d)
      audit("customer_orders", cust, "c_custkey", ord, "o_custkey")
        .union(audit("orders_lineitem", ord, "o_orderkey", li, "l_orderkey"))
        .union(audit("part_lineitem", pt, "p_partkey", li, "l_partkey"))
        .select(col("pair"), col("n1"), col("d1"), col("n2"), col("d2"),
          col("actual_rows"), col("est_rows"),
          round(col("actual_rows").cast("double") / col("est_rows"), 6)
            .as("actual_over_est"))
        .orderBy("pair")
    })

  /** POISSON-BOOTSTRAP confidence interval for a corpus metric (mean
    * tokens per document, per source): B=64 replicates where each
    * document's replicate weight is a Poisson(1) draw — the streaming/
    * distributed bootstrap (the multinomial resample needs global
    * coordination; Poissonization doesn't). Every float in the pipeline
    * is derived from exact BIGINTs: the draw is a 24-bit hash span
    * compared against PRECOMPUTED integer CDF thresholds (no runtime
    * exp/factorial), replicate sums are BIGINT, and each replicate mean
    * is one rounded division. The CI bounds are ORDER STATISTICS
    * (ranks 2 and B−1 of the 64 ordered means ≈ 2.5/97.5%), never
    * interpolated — so the result is bit-stable cross-engine.
    *
    * Scale shape: the replicate dimension rides the single corpus scan
    * (explode ×64, a constant factor); one (source, b) hash agg; the
    * per-source window orders exactly B=64 rows. Weights are capped at
    * 8 (P(X>7) ≈ 1e-5, identically in both engines). */
  val q195_bootstrap_ci = {
    import graft.functions.TextFunctions.hexSpanValSql
    // Poisson(1) CDF × 16^6, floored: P(X<=k) for k = 0..7
    val Cdf = Seq(6171992L, 12343985L, 15429982L, 16458647L, 16715813L,
      16767247L, 16775819L, 16777044L)
    def wCaseSql(u: String) =
      Cdf.zipWithIndex.map { case (t, k) => s"WHEN $u < $t THEN $k" }
        .mkString("CASE ", " ", " ELSE 8 END")
    Q("q195_bootstrap_ci",
      Some(s"""WITH d AS (
              |  SELECT source, doc_id,
              |    CAST(len(text) - len(replace(text, ' ', '')) + 1 AS BIGINT)
              |      AS toks
              |  FROM documents),
              |draws AS (
              |  SELECT source, toks, b,
              |    md5(CAST(doc_id AS VARCHAR) || '_' || CAST(b AS VARCHAR))
              |      AS h
              |  FROM d CROSS JOIN (SELECT unnest(range(1, 65)) AS b)),
              |wts AS (
              |  SELECT source, toks, b,
              |    ${wCaseSql(hexSpanValSql("h", 0, 6))} AS w
              |  FROM draws),
              |rep AS (
              |  SELECT source, b, CAST(sum(w * toks) AS BIGINT) AS swt,
              |    CAST(sum(w) AS BIGINT) AS sw
              |  FROM wts GROUP BY source, b),
              |means AS (
              |  SELECT source, b, round(CAST(swt AS DOUBLE) / sw, 6) AS mb
              |  FROM rep WHERE sw > 0),
              |ranked AS (
              |  SELECT source, mb,
              |    row_number() OVER (PARTITION BY source ORDER BY mb, b)
              |      AS rn,
              |    count(*) OVER (PARTITION BY source) AS nb
              |  FROM means),
              |ci AS (
              |  SELECT source, CAST(max(nb) AS BIGINT) AS n_reps,
              |    min(CASE WHEN rn = 2 THEN mb END) AS boot_lo,
              |    min(CASE WHEN rn = nb - 1 THEN mb END) AS boot_hi
              |  FROM ranked GROUP BY source),
              |pt AS (
              |  SELECT source,
              |    round(CAST(sum(toks) AS DOUBLE) / count(*), 6)
              |      AS point_mean
              |  FROM d GROUP BY source)
              |SELECT ci.source, n_reps, point_mean, boot_lo, boot_hi
              |FROM ci JOIN pt ON ci.source = pt.source
              |ORDER BY ci.source""".stripMargin),
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("source"), col("doc_id"),
            (length(col("text")) -
              length(translate(col("text"), " ", "")) + lit(1))
              .cast("long").as("toks"))
        val draws = docs
          .select(col("source"), col("toks"), col("doc_id"),
            explode(sequence(lit(1), lit(64))).as("b"))
          // q132 lesson: hash once into a column — the 6 hex digit reads
          // below would otherwise re-digest per digit
          .withColumn("h",
            md5(concat(col("doc_id").cast("string"), lit("_"),
              col("b").cast("string"))))
        val wts = draws.withColumn("w",
          expr(wCaseSql(hexSpanValSql("h", 0, 6))))
        val rep = wts.groupBy("source", "b")
          .agg(sum(col("w") * col("toks")).as("swt"),
            sum(col("w")).cast("long").as("sw"))
        val means = rep.filter(col("sw") > 0)
          .select(col("source"), col("b"),
            round(col("swt").cast("double") / col("sw"), 6).as("mb"))
        val wRank = Window.partitionBy("source").orderBy("mb", "b")
        val ci = means
          .withColumn("rn", row_number().over(wRank))
          .withColumn("nb", count(lit(1)).over(Window.partitionBy("source")))
          .groupBy("source")
          .agg(max(col("nb")).cast("long").as("n_reps"),
            min(when(col("rn") === 2, col("mb"))).as("boot_lo"),
            min(when(col("rn") === col("nb") - 1, col("mb"))).as("boot_hi"))
        val pt = docs.groupBy("source")
          .agg(round(sum(col("toks")).cast("double") / count(lit(1)), 6)
            .as("point_mean"))
        ci.join(pt, "source")
          .select(col("source"), col("n_reps"), col("point_mean"),
            col("boot_lo"), col("boot_hi"))
          .orderBy("source")
      })
  }

  val all: Seq[Q] = Seq(q193_key_skew, q194_join_estimator,
    q195_bootstrap_ci)
}
