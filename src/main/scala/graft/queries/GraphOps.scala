package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Iterative graph analytics entries (beyond q73's connected components):
  * PageRank with fully-replayable arithmetic.
  */
object GraphOps {

  private val PrIters = 3
  private val Damping = 0.85

  /** Fixed-iteration PageRank (operators/Graph.pageRank) over the
    * supplier → part-bucket bipartite graph from lineitem. Every
    * iteration's contribution sum is rounded-then-decimal-summed, so the
    * ranks are identical under any partitioning/retry — and the oracle
    * replays all three iterations as chained CTEs with the same IEEE
    * operation sequence (double literals CAST on the SQL side so both
    * engines compute 1.0−0.85 in binary, not decimal). Per iteration:
    * one edges⋈ranks join + one dst-keyed agg + one left join — constant
    * shuffle count, node-keyed throughout. */
  val q117_pagerank = Q(
    "q117_pagerank", {
      val d = "CAST(0.85 AS DOUBLE)"
      def iter(prev: String, out: String) =
        s"""c$out AS (
           |  SELECT e.dst, CAST(sum(CAST(round(p.pr / dg.deg, 12) AS DECIMAL(28,12))) AS DOUBLE) AS s
           |  FROM e JOIN p$prev p ON p.node = e.src
           |  JOIN deg dg ON dg.src = e.src
           |  GROUP BY e.dst),
           |p$out AS (
           |  SELECT n.node,
           |    (CAST(1 AS DOUBLE) - $d) / nn.n + $d * coalesce(c.s, CAST(0 AS DOUBLE)) AS pr
           |  FROM n CROSS JOIN nn LEFT JOIN c$out c ON c.dst = n.node)""".stripMargin
      Some(s"""WITH e AS (
              |  SELECT DISTINCT l_suppkey AS src, l_partkey % 100 AS dst
              |  FROM lineitem),
              |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
              |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src),
              |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM n),
              |p0 AS (SELECT node, CAST(1 AS DOUBLE) / nn.n AS pr FROM n CROSS JOIN nn),
              |${iter("0", "1")},
              |${iter("1", "2")},
              |${iter("2", "3")}
              |SELECT node, pr FROM p3
              |ORDER BY node""".stripMargin)
    },
    (s, d) => {
      val edges = Tables.lineitem(s, d)
        .select(col("l_suppkey").as("src"), (col("l_partkey") % 100).as("dst"))
      graft.operators.Graph.pageRank(edges, PrIters, Damping)
        .orderBy("node")
    })

  val all: Seq[Q] = Seq(q117_pagerank)
}
