package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Pattern mining: frequent-pair association rules — the market-basket
  * family (support / confidence / lift) the event- and text-mining
  * entries don't cover.
  *
  * Scale shape: the pair space unfolds PER BASKET from a bounded
  * per-order item array, so the blow-up is Σ c(b,2) over basket sizes —
  * a per-basket constant (≤ C(7,2) here; real carts are small), never a
  * corpus-pairwise product. Everything after is (item, item)-keyed hash
  * aggs joined to item counts. All scores derive from exact BIGINT
  * counts through one final double expression written identically in
  * both engines.
  */
object MiningOps {

  private val MinPairCount = 3L

  val q231_assoc_rules = Q(
    "q231_assoc_rules",
    Some(s"""WITH op AS (
            |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
            |n AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n_orders FROM op),
            |ic AS (SELECT p, CAST(count(*) AS BIGINT) AS np FROM op GROUP BY p),
            |pc AS (
            |  SELECT a.p AS pa, b.p AS pb, CAST(count(*) AS BIGINT) AS nab
            |  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
            |  GROUP BY a.p, b.p),
            |r AS (
            |  SELECT pa, pb, nab,
            |    round(CAST(nab AS DOUBLE) / n.n_orders, 6) AS support,
            |    round(CAST(nab AS DOUBLE) / ia.np, 6) AS confidence,
            |    round(CAST(nab AS DOUBLE) * n.n_orders / (ia.np * ib.np), 6)
            |      AS lift
            |  FROM pc CROSS JOIN n
            |  JOIN ic ia ON ia.p = pc.pa
            |  JOIN ic ib ON ib.p = pc.pb
            |  WHERE nab >= $MinPairCount)
            |SELECT pa, pb, nab, support, confidence, lift FROM r
            |ORDER BY lift DESC, pa, pb LIMIT 20""".stripMargin),
    (s, d) => {
      // BASKET-ARRAY form (late-r13, the q292 device): a cart is ≤ 7
      // lineitems, so ONE (o)-keyed collect_set (map-side partial sets —
      // the distinct pass disappears into the agg) builds bounded basket
      // arrays, and the i<j pairs explode SCAN-SIDE from the sorted
      // array instead of re-shuffling both sides of a basket self-join.
      // Persisted: the basket frame feeds three branches (pair stream,
      // item counts, basket total).
      val baskets = graft.operators.PlanCache.persist(Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .groupBy("o").agg(sort_array(collect_set(col("p"))).as("ps")))
      val n = baskets.agg(count(lit(1)).as("n_orders"))
      val ic = baskets.select(explode(col("ps")).as("p"))
        .groupBy("p").agg(count(lit(1)).as("np"))
      val pc = baskets.select(explode(expr(
          """flatten(transform(ps, (x, i) ->
            |  transform(slice(ps, i + 2, size(ps)),
            |    y -> struct(x AS pa, y AS pb))))""".stripMargin)).as("q"))
        .select(col("q.pa").as("pa"), col("q.pb").as("pb"))
        .groupBy("pa", "pb").agg(count(lit(1)).as("nab"))
        .filter(col("nab") >= MinPairCount)
      pc.crossJoin(broadcast(n))
        .join(broadcast(ic.toDF("pa", "npa")), "pa")
        .join(broadcast(ic.toDF("pb", "npb")), "pb")
        .select(col("pa"), col("pb"), col("nab"),
          round(col("nab").cast("double") / col("n_orders"), 6).as("support"),
          round(col("nab").cast("double") / col("npa"), 6).as("confidence"),
          round(col("nab").cast("double") * col("n_orders")
            / (col("npa") * col("npb")), 6).as("lift"))
        .orderBy(col("lift").desc, col("pa"), col("pb"))
        .limit(20)
    })

  /** Quantile normalization of a per-source feature onto the GLOBAL
    * distribution (batch-effect correction: after mapping, every
    * source's n_chars distribution is a resampling of the corpus-wide
    * one — the standard fix when one source's length profile would skew
    * a length-aware sampler). Min-rank convention for ties, nearest-rank
    * (ceiling) quantile lookup — both pure integer rules, so the whole
    * mapping is exact: r = (rank of the value's first occurrence within
    * its source), g = ⌈r·N/n_s⌉, mapped = the smallest global value
    * whose cumulative count reaches g.
    *
    * Scale shape: everything runs on the (source, value) HISTOGRAM grid
    * (the q193/q215 device) — per-source windows order grid rows, never
    * documents; the global grid re-enters as a broadcast and the
    * quantile lookup is a grid×grid bounded range join + min. Integer
    * bound: r·N ≤ n·N — switch the product to DECIMAL(38,0) past ~3·10⁹
    * rows (documented, same class as the q116 note). */
  val q234_quantile_norm = Q(
    "q234_quantile_norm",
    Some("""WITH d AS (SELECT source, n_chars AS v FROM documents),
            |n AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM d),
            |sg AS (
            |  SELECT source, v, CAST(count(*) AS BIGINT) AS cnt
            |  FROM d GROUP BY source, v),
            |sr AS (
            |  SELECT source, v, cnt,
            |    CAST(sum(cnt) OVER (PARTITION BY source) AS BIGINT) AS ns,
            |    CAST(COALESCE(sum(cnt) OVER (PARTITION BY source ORDER BY v
            |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            |      + 1 AS BIGINT) AS r
            |  FROM sg),
            |sq AS (
            |  SELECT source, v, cnt,
            |    (r * nt + ns - 1) // ns AS g
            |  FROM sr CROSS JOIN n),
            |gg AS (
            |  SELECT v, CAST(sum(count(*)) OVER (ORDER BY v
            |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS gcum
            |  FROM d GROUP BY v)
            |SELECT s.source, s.v AS value, s.cnt AS n,
            |  min(g2.v) AS mapped
            |FROM sq s JOIN gg g2 ON g2.gcum >= s.g
            |GROUP BY s.source, s.v, s.cnt
            |ORDER BY source, value""".stripMargin),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
        .select(col("source"), col("n_chars").as("v"))
      val n = docs.agg(count(lit(1)).as("nt"))
      val sg = docs.groupBy("source", "v").agg(count(lit(1)).as("cnt"))
      val wsrc = Window.partitionBy("source")
      val wrun = wsrc.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
      val sq = sg
        .withColumn("ns", sum(col("cnt")).over(wsrc))
        .withColumn("r", coalesce(sum(col("cnt")).over(wrun), lit(0L)) + 1)
        .crossJoin(broadcast(n))
        .withColumn("g", expr("(r * nt + ns - 1) div ns"))
      val gg = docs.groupBy("v").agg(count(lit(1)).as("gcnt"))
        .withColumn("gcum", sum(col("gcnt")).over(
          Window.orderBy("v").rowsBetween(Window.unboundedPreceding,
            Window.currentRow)))
        .select(col("v").as("gv"), col("gcum"))
      sq.join(broadcast(gg), col("gcum") >= col("g"))
        .groupBy(col("source"), col("v").as("value"), col("cnt").as("n"))
        .agg(min(col("gv")).as("mapped"))
        .orderBy("source", "value")
    })

  val all: Seq[Q] = Seq(q231_assoc_rules, q234_quantile_norm)
}
