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

  val all: Seq[Q] = Seq(q406_tpch_q3, q407_tpch_q5, q408_tpch_q10)
}
