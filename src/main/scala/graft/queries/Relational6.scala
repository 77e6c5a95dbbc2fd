package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.Q.dec

/** Round-10 relational additions: faithful TPC-H query shapes (Q3, Q5,
  * Q10) on the reduced synthetic schema — the canonical OLAP join-agg
  * patterns, named and recognizable, run with the repo's exact-decimal
  * revenue discipline. o_shippriority does not exist in the reduced
  * schema; Q3 carries o_orderpriority instead (same role in the
  * output, different domain).
  */
object Relational6 {

  private val Rev = "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) " +
    "* (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)"

  private def revCol = sum(dec(col("l_extendedprice"))
    * (lit(1) - dec(col("l_discount")))).cast("double")

  /** TPC-H Q3 (shipping priority): revenue of not-yet-shipped lineitems
    * of BUILDING-segment customers' pre-cutoff orders, top 10. The
    * classic 3-way join where the two date filters push to opposite
    * scan sides and the aggregation keys on the join key itself
    * (map-side combine after the join). */
  val q406_tpch_q3 = Q(
    "q406_tpch_q3",
    Some(s"""SELECT l_orderkey, $Rev AS revenue,
            |  o_orderdate, o_orderpriority
            |FROM customer
            |JOIN orders ON c_custkey = o_custkey
            |JOIN lineitem ON l_orderkey = o_orderkey
            |WHERE c_mktsegment = 'BUILDING'
            |  AND o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
            |  AND l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
            |GROUP BY l_orderkey, o_orderdate, o_orderpriority
            |ORDER BY revenue DESC, o_orderdate, l_orderkey
            |LIMIT 10""".stripMargin),
    (s, d) => {
      val cutoff = lit("1996-03-15 00:00:00").cast("timestamp")
      Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .join(Tables.orders(s, d).filter(col("o_orderdate") < cutoff),
          col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, d).filter(col("l_shipdate") > cutoff),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revCol.as("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)
    })

  /** TPC-H Q5 (local supplier volume): revenue per nation where the
    * ordering customer and the supplying supplier sit in the SAME
    * nation of one region, one order-year. Five joins; nation/region
    * broadcast (they are the canonical broadcast dims), the
    * same-nation predicate rides the supplier join condition. */
  val q407_tpch_q5 = Q(
    "q407_tpch_q5",
    Some(s"""SELECT n_name, $Rev AS revenue
            |FROM customer
            |JOIN orders ON c_custkey = o_custkey
            |JOIN lineitem ON l_orderkey = o_orderkey
            |JOIN supplier ON l_suppkey = s_suppkey
            |  AND c_nationkey = s_nationkey
            |JOIN nation ON s_nationkey = n_nationkey
            |JOIN region ON n_regionkey = r_regionkey
            |WHERE r_name = 'ASIA'
            |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
            |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
            |GROUP BY n_name
            |ORDER BY revenue DESC, n_name""".stripMargin),
    (s, d) => {
      val orders = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00")
          .cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01 00:00:00").cast("timestamp"))
      Tables.customer(s, d)
        .join(orders, col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.supplier(s, d),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(revCol.as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    })

  /** TPC-H Q10 (returned item reporting): the 20 customers losing the
    * most revenue to returns in one quarter — lineitem filtered to
    * RETURNFLAG='R', orders to the quarter, then customer + nation
    * enrich. The join-then-topk shape where TakeOrderedAndProject
    * bounds what leaves the aggregation. */
  val q408_tpch_q10 = Q(
    "q408_tpch_q10",
    Some(s"""SELECT c_custkey, c_name, $Rev AS revenue, c_acctbal, n_name
            |FROM customer
            |JOIN orders ON c_custkey = o_custkey
            |JOIN lineitem ON l_orderkey = o_orderkey
            |JOIN nation ON c_nationkey = n_nationkey
            |WHERE l_returnflag = 'R'
            |  AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
            |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
            |GROUP BY c_custkey, c_name, c_acctbal, n_name
            |ORDER BY revenue DESC, c_custkey
            |LIMIT 20""".stripMargin),
    (s, d) => {
      val orders = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-10-01 00:00:00")
          .cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01 00:00:00").cast("timestamp"))
      Tables.customer(s, d)
        .join(orders, col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, d).filter(col("l_returnflag") === "R"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(revCol.as("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    })

  /** TPC-H Q6 (forecasting revenue change): the pure scan-filter-agg —
    * one table, three pushable predicates, one exact-decimal product
    * sum. The baseline every pushdown/codegen audit wants: no join, no
    * shuffle beyond the final 1-row reduce. */
  val q409_tpch_q6 = Q(
    "q409_tpch_q6",
    Some("""SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
           |  * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           |  CAST(count(*) AS BIGINT) AS n_rows
           |FROM lineitem
           |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
           |  AND l_discount BETWEEN 0.05 AND 0.07
           |  AND l_quantity < 24""".stripMargin),
    (s, d) => Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00")
        .cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01 00:00:00").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg((sum(dec(col("l_extendedprice")) * dec(col("l_discount"))))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_rows")))

  /** TPC-H Q14 (promotion effect): share of one month's revenue carried
    * by PROMO-type parts — the lineitem⋈part join where the part side
    * is the broadcast dim and the metric is a ratio of two exact
    * decimal sums over the SAME rows (one conditional). */
  val q410_tpch_q14 = Q(
    "q410_tpch_q14",
    Some(s"""SELECT round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
            |    THEN CAST(l_extendedprice AS DECIMAL(18,2))
            |      * (1 - CAST(l_discount AS DECIMAL(18,2)))
            |    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
            |  / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
            |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 6)
            |  AS promo_revenue_pct,
            |  CAST(count(*) AS BIGINT) AS n_rows
            |FROM lineitem JOIN part ON l_partkey = p_partkey
            |WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
            |  AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'""".stripMargin),
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-09-01 00:00:00")
          .cast("timestamp") &&
          col("l_shipdate") < lit("1996-10-01 00:00:00").cast("timestamp"))
      val rev = dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))
      li.join(broadcast(Tables.part(s, d)),
          col("l_partkey") === col("p_partkey"))
        .agg(round(lit(100.0)
          * sum(when(col("p_type") === "PROMO", rev)
            .otherwise(lit(0).cast("decimal(18,2)"))).cast("double")
          / sum(rev).cast("double"), 6).as("promo_revenue_pct"),
          count(lit(1)).as("n_rows"))
    })

  /** TPC-H Q8 (national market share): NATION_2's share of ASIA-region
    * customers' STANDARD-part revenue per order year — the deep
    * snowflake (6 joins, two different nation roles) whose answer is a
    * conditional-over-total ratio per group. Nation joins twice under
    * two aliases: once for the customer's region gate, once for the
    * supplier's nationality. */
  val q411_tpch_q8 = Q(
    "q411_tpch_q8",
    Some("""WITH base AS (
           |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           |    CAST(l_extendedprice AS DECIMAL(18,2))
           |      * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume,
           |    sn.n_name AS supp_nation
           |  FROM lineitem
           |  JOIN part ON l_partkey = p_partkey
           |  JOIN orders ON l_orderkey = o_orderkey
           |  JOIN customer ON o_custkey = c_custkey
           |  JOIN nation cn ON c_nationkey = cn.n_nationkey
           |  JOIN region ON cn.n_regionkey = r_regionkey
           |  JOIN supplier ON l_suppkey = s_suppkey
           |  JOIN nation sn ON s_nationkey = sn.n_nationkey
           |  WHERE r_name = 'ASIA' AND p_type = 'STANDARD')
           |SELECT o_year,
           |  round(CAST(sum(CASE WHEN supp_nation = 'NATION_2'
           |      THEN volume ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
           |    / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share,
           |  CAST(count(*) AS BIGINT) AS n_rows
           |FROM base GROUP BY o_year
           |ORDER BY o_year""".stripMargin),
    (s, d) => {
      val cn = Tables.nation(s, d)
        .select(col("n_nationkey").as("cn_key"), col("n_regionkey"))
      val sn = Tables.nation(s, d)
        .select(col("n_nationkey").as("sn_key"),
          col("n_name").as("supp_nation"))
      val vol = dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)
          .filter(col("p_type") === "STANDARD")),
          col("l_partkey") === col("p_partkey"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(cn), col("c_nationkey") === col("cn_key"))
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(sn), col("s_nationkey") === col("sn_key"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(round(
          sum(when(col("supp_nation") === "NATION_2", vol)
            .otherwise(lit(0).cast("decimal(18,2)"))).cast("double")
            / sum(vol).cast("double"), 6).as("mkt_share"),
          count(lit(1)).as("n_rows"))
        .orderBy("o_year")
    })

  /** TPC-H Q13 (customer distribution): how many customers placed k
    * orders, INCLUDING k = 0 — the left-outer-join + double-aggregation
    * idiom (count per customer, then histogram the counts) that an
    * inner join silently corrupts by dropping the zero bucket. */
  val q412_tpch_q13 = Q(
    "q412_tpch_q13",
    Some("""WITH c_orders AS (
           |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
           |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
           |  GROUP BY c_custkey)
           |SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
           |FROM c_orders
           |GROUP BY c_count
           |ORDER BY custdist DESC, c_count DESC""".stripMargin),
    (s, d) => Tables.customer(s, d)
      .join(Tables.orders(s, d),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc))

  /** TPC-H Q18 (large-volume customers): orders whose total lineitem
    * quantity clears a threshold, enriched with their customer — the
    * aggregate-filter-then-semi-join shape: the HAVING aggregation runs
    * once over lineitem, and only qualifying orderkeys rejoin the fact
    * table. Quantities are exact decimal sums. */
  val q419_tpch_q18 = Q(
    "q419_tpch_q18",
    Some("""WITH big AS (
           |  SELECT l_orderkey
           |  FROM lineitem GROUP BY l_orderkey
           |  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150)
           |SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
           |    AS total_qty
           |FROM customer
           |JOIN orders ON c_custkey = o_custkey
           |JOIN lineitem ON o_orderkey = l_orderkey
           |WHERE o_orderkey IN (SELECT l_orderkey FROM big)
           |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
           |ORDER BY o_totalprice DESC, o_orderkey
           |LIMIT 20""".stripMargin),
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val big = li.groupBy("l_orderkey")
        .agg(sum(dec(col("l_quantity"))).as("q"))
        .filter(col("q") > 150)
        .select(col("l_orderkey").as("bk"))
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .join(big, col("o_orderkey") === col("bk"), "left_semi")
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate",
          "o_totalprice")
        .agg(sum(dec(col("l_quantity"))).cast("double").as("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
    })

  /** TPC-H Q17 (small-quantity-order revenue): revenue lost to orders
    * below 20% of their part's average quantity — the canonical
    * correlated-average decorrelation: the per-part mean aggregates
    * once and rejoins the fact table instead of re-running per row
    * (p_container is absent from the reduced schema; the part gate is
    * p_brand + p_size). The mean is an exact decimal ratio carried as
    * (sum, count) and compared by CROSS-MULTIPLICATION — qty < 0.2·avg
    * becomes qty·5·cnt < sum, all integers-in-decimal, so the filter
    * cannot drift between engines. */
  val q420_tpch_q17 = Q(
    "q420_tpch_q17",
    Some("""WITH pavg AS (
           |  SELECT l_partkey AS pk,
           |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2))
           |      AS sq,
           |    CAST(count(*) AS BIGINT) AS cq
           |  FROM lineitem GROUP BY l_partkey)
           |SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
           |    / 7.0 AS avg_yearly,
           |  CAST(count(*) AS BIGINT) AS n_rows
           |FROM lineitem
           |JOIN part ON p_partkey = l_partkey
           |JOIN pavg ON pk = l_partkey
           |WHERE p_brand = 'Brand#1' AND p_size <= 15
           |  AND CAST(l_quantity AS DECIMAL(18,2)) * 5 * cq < sq""".stripMargin),
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val pavg = li.groupBy(col("l_partkey").as("pk"))
        .agg(sum(dec(col("l_quantity"))).cast("decimal(18,2)").as("sq"),
          count(lit(1)).as("cq"))
      li.join(broadcast(Tables.part(s, d)
          .filter(col("p_brand") === "Brand#1" && col("p_size") <= 15)),
          col("p_partkey") === col("l_partkey"))
        .join(pavg, col("pk") === col("l_partkey"))
        .filter(dec(col("l_quantity")) * 5 * col("cq") < col("sq"))
        .agg((sum(dec(col("l_extendedprice"))).cast("double") / 7.0)
          .as("avg_yearly"),
          count(lit(1)).as("n_rows"))
    })

  /** TPC-H Q19 (discounted revenue, disjunctive predicates): three OR
    * branches, each constraining BOTH sides of the part⋈lineitem join —
    * the canonical test of disjunction handling. The scalable plan
    * extracts each side's IMPLIED single-table predicate (part:
    * brand ∈ {12,23,34} with its size cap; lineitem: quantity ∈
    * [1,30]) so both scans prune before the join, the filtered part
    * side broadcasts, and only the residual per-branch conjunction
    * runs post-join — vs the naive plan that joins everything and
    * filters after. Quantity bounds are exact decimal compares
    * (l_quantity is integral-valued; no float boundary risk). */
  val q431_tpch_q19 = Q(
    "q431_tpch_q19",
    Some("""SELECT
           |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
           |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           |    AS revenue,
           |  CAST(count(*) AS BIGINT) AS n_lines
           |FROM lineitem JOIN part ON p_partkey = l_partkey
           |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           |       AND CAST(l_quantity AS DECIMAL(18,2)) BETWEEN 1 AND 11)
           |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           |       AND CAST(l_quantity AS DECIMAL(18,2)) BETWEEN 10 AND 20)
           |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           |       AND CAST(l_quantity AS DECIMAL(18,2)) BETWEEN 20 AND 30)""".stripMargin),
    (s, d) => {
      // each side's scan prunes on the UNION of its branch predicates
      // (implied-by-the-disjunction single-table filters), then the
      // tiny surviving part side broadcasts and the exact per-branch
      // conjunction runs as the join residual
      val p = Tables.part(s, d).filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10)) ||
        (col("p_brand") === "Brand#34" && col("p_size").between(1, 15)))
      val q = dec(col("l_quantity"))
      val li = Tables.lineitem(s, d).filter(q.between(1, 30))
      val branch =
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
          q.between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
          q.between(10, 20)) ||
        (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
          q.between(20, 30))
      li.join(broadcast(p), col("p_partkey") === col("l_partkey"))
        .filter(branch)
        .agg(revCol.as("revenue"), count(lit(1)).as("n_lines"))
    })

  val all: Seq[Q] = Seq(q406_tpch_q3, q407_tpch_q5, q408_tpch_q10,
    q409_tpch_q6, q410_tpch_q14, q411_tpch_q8, q412_tpch_q13,
    q419_tpch_q18, q420_tpch_q17, q431_tpch_q19)
}
