package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Spark 4 SQL-surface features a migrating user expects to keep:
  * recursive CTEs (hierarchy/graph walks in plain SQL) and the VARIANT
  * semi-structured type (the open-lakehouse JSON column). Both entries
  * run the REAL feature (spark.sql WITH RECURSIVE; parse_json/
  * variant_get) and are hash-checked against DuckDB replays.
  */
object ModernSql {

  /** Recursive CTE hierarchy walk: suppliers arranged as a binary heap
    * (parent(k) = (k−1) div 2, root 0), walked root-to-leaves with WITH
    * RECURSIVE — the plain-SQL form of a bounded-depth graph traversal.
    * Spark executes each recursion step as one join+union over the
    * previous frontier, so depth bounds the iteration count (log₂ n
    * here). Deep/unbounded closures at 100 TB belong to the pointer-
    * jumping operator (Dedup.connectedComponents, log n rounds) — this
    * entry pins the SQL surface and its exact semantics. */
  val q143_recursive_cte = Q(
    "q143_recursive_cte",
    Some("""WITH RECURSIVE chain AS (
            |  SELECT s_suppkey AS node, CAST(0 AS BIGINT) AS depth
            |  FROM supplier WHERE s_suppkey = 0
            |  UNION ALL
            |  SELECT s.s_suppkey, c.depth + 1
            |  FROM supplier s JOIN chain c
            |    ON (s.s_suppkey - 1) // 2 = c.node AND s.s_suppkey >= 1)
            |SELECT depth, CAST(count(*) AS BIGINT) AS n,
            |  min(node) AS min_node, max(node) AS max_node
            |FROM chain GROUP BY depth
            |ORDER BY depth""".stripMargin),
    (s, d) => {
      Tables.views(s, d, "supplier")
      s.sql("""WITH RECURSIVE chain AS (
              |  SELECT s_suppkey AS node, CAST(0 AS BIGINT) AS depth
              |  FROM supplier WHERE s_suppkey = 0
              |  UNION ALL
              |  SELECT s.s_suppkey, c.depth + 1
              |  FROM supplier s JOIN chain c
              |    ON (s.s_suppkey - 1) div 2 = c.node AND s.s_suppkey >= 1)
              |SELECT depth, CAST(count(*) AS BIGINT) AS n,
              |  min(node) AS min_node, max(node) AS max_node
              |FROM chain GROUP BY depth
              |ORDER BY depth""".stripMargin)
    })

  /** VARIANT semi-structured access: the event props JSON ingested ONCE
    * as a variant (parse_json), fields then read with typed variant_get
    * paths — the shredded-JSON pattern every open-lakehouse format is
    * converging on (a variant column parses at write, not per query; path
    * reads skip re-tokenizing the text). The oracle replays the same
    * extraction with its JSON path reader — identical typed values prove
    * the variant decode is faithful. */
  val q144_variant_json = Q(
    "q144_variant_json",
    Some("""SELECT CAST(json_extract(props, '$.k')::INT % 10 AS BIGINT)
            |    AS k_mod,
            |  CAST(count(*) AS BIGINT) AS n,
            |  CAST(sum(json_extract(props, '$.k')::INT) AS BIGINT) AS sum_k,
            |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
            |FROM events
            |GROUP BY 1
            |ORDER BY k_mod""".stripMargin),
    (s, d) => Tables.events(s, d)
      .withColumn("k", expr("variant_get(parse_json(props), '$.k', 'int')"))
      .groupBy((col("k") % 10).cast("long").as("k_mod"))
      .agg(count(lit(1)).as("n"),
        sum(col("k")).cast("long").as("sum_k"),
        count_distinct(col("user_id")).as("n_users"))
      .orderBy("k_mod"))

  val all: Seq[Q] = Seq(q143_recursive_cte, q144_variant_json)
}
