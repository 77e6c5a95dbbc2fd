package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import Q.{dec, asDouble}

/** Relational surface, part 3: array/map scalar families, event-time
  * windows shared with the streaming path, skew-mitigated (salted)
  * aggregation, exact percentiles, scalar subqueries.
  */
object Relational3 {

  /** Array function family over the embeddings table: slice/contains/
    * sort/distinct/position + aggregate-of-array, emitted as scalars and
    * joined strings (array cells don't hash portably across engines). */
  val q44_array_funcs = Q(
    "q44_array_funcs",
    Some("""SELECT vec_id,
            |  CAST(len(embedding) AS BIGINT) AS dim,
            |  round(list_reduce(list_transform(embedding[1:4]::DOUBLE[], x -> x),
            |                    (a, b) -> a + b), 6) AS head4_sum,
            |  round(list_max(embedding::DOUBLE[]), 6) AS max_elem,
            |  round(list_min(embedding::DOUBLE[]), 6) AS min_elem,
            |  CAST(list_position(list_transform(embedding::DOUBLE[], x -> x),
            |                     list_max(embedding::DOUBLE[])) AS BIGINT) AS argmax_pos
            |FROM embeddings
            |WHERE vec_id < 50
            |ORDER BY vec_id""".stripMargin),
    (s, d) => {
      val e = col("embedding").cast("array<double>")
      Tables.embeddings(s, d)
        .filter(col("vec_id") < 50)
        .select(
          col("vec_id"),
          size(col("embedding")).cast("long").as("dim"),
          round(aggregate(slice(e, 1, 4), lit(0.0), (a, x) => a + x), 6)
            .as("head4_sum"),
          round(array_max(e), 6).as("max_elem"),
          round(array_min(e), 6).as("min_elem"),
          array_position(e, array_max(e)).as("argmax_pos"))
        .orderBy("vec_id")
    })

  /** Map function family: parse the events props JSON into a map, then
    * key/value introspection. Map cells don't compare portably, so emit
    * sorted joined keys + extracted values. */
  val q45_map_funcs = Q(
    "q45_map_funcs",
    Some("""SELECT event_id,
            |  array_to_string(list_sort(json_keys(props)), ',') AS prop_keys,
            |  CAST(json_extract(props, '$.k') AS BIGINT) AS k_value
            |FROM events
            |WHERE event_id < 200
            |ORDER BY event_id""".stripMargin),
    (s, d) => Tables.events(s, d)
      .filter(col("event_id") < 200)
      .withColumn("m", from_json(col("props"),
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.StringType)))
      .select(
        col("event_id"),
        concat_ws(",", array_sort(map_keys(col("m")))).as("prop_keys"),
        element_at(col("m"), "k").cast("long").as("k_value"))
      .orderBy("event_id"))

  /** Event-time windowed aggregation — the SAME function the streaming
    * path uses (graft.streaming.StreamingOps.windowedCounts), run in batch
    * mode and oracle-checked; DuckDB mirrors with time_bucket. */
  val q46_event_time_window = Q(
    "q46_event_time_window",
    Some("""SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
            |       time_bucket(INTERVAL 1 HOUR, ts) + INTERVAL 1 HOUR AS window_end,
            |       event_type, count(*) AS n,
            |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
            |FROM events
            |GROUP BY 1, 2, 3
            |ORDER BY window_start, event_type""".stripMargin),
    (s, d) => graft.streaming.StreamingOps.windowedCounts(
        Tables.events(s, d)
          .withColumn("ts", expr("timestamp_micros(ts div 1000)")))
      .orderBy("window_start", "event_type"))

  /** Salted high-cardinality aggregation: two-phase (salt → partial →
    * final) so one hot key cannot overwhelm a single reducer. Result is
    * identical to the plain GROUP BY (the oracle); only the physical
    * shuffle distribution changes. */
  val q47_salted_agg = Q(
    "q47_salted_agg",
    Some("""SELECT event_type, count(*) AS n,
            |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
            |FROM events
            |GROUP BY event_type
            |ORDER BY event_type""".stripMargin),
    (s, d) => {
      // phase 1: spread each (hot) key over 16 salt shards
      val salted = Tables.events(s, d)
        .withColumn("salt", pmod(col("event_id"), lit(16)))
        .groupBy(col("event_type"), col("salt"))
        .agg(count(lit(1)).as("pn"),
          sum(dec(col("value"))).as("pv"))
      // phase 2: merge shards per key
      salted.groupBy("event_type")
        .agg(sum(col("pn")).as("n"),
          asDouble(sum(col("pv"))).as("total_value"))
        .orderBy("event_type")
    })

  /** Exact percentiles (median/p90) — Spark percentile == DuckDB
    * quantile_cont (both exact linear interpolation over sorted values). */
  val q48_percentiles = Q(
    "q48_percentiles",
    Some("""SELECT l_returnflag,
            |  round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
            |  round(quantile_cont(l_extendedprice, 0.9), 6) AS p90_price
            |FROM lineitem
            |GROUP BY l_returnflag
            |ORDER BY l_returnflag""".stripMargin),
    (s, d) => Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_quantity, 0.5)"), 6).as("median_qty"),
        round(expr("percentile(l_extendedprice, 0.9)"), 6).as("p90_price"))
      .orderBy("l_returnflag"))

  /** Scalar subquery + correlated filter: orders above 95% of their
    * customer segment's maximum. */
  val q49_scalar_subquery = Q(
    "q49_scalar_subquery",
    Some("""SELECT o_orderkey, o_custkey, o_totalprice
            |FROM orders
            |WHERE o_totalprice > 0.95 * (SELECT max(o_totalprice) FROM orders)
            |ORDER BY o_orderkey""".stripMargin),
    (s, d) => {
      Tables.views(s, d, "orders")
      s.sql("""SELECT o_orderkey, o_custkey, o_totalprice
              |FROM orders
              |WHERE o_totalprice > 0.95 * (SELECT max(o_totalprice) FROM orders)
              |ORDER BY o_orderkey""".stripMargin)
    })

  val all: Seq[Q] = Seq(
    q44_array_funcs, q45_map_funcs, q46_event_time_window, q47_salted_agg,
    q48_percentiles, q49_scalar_subquery)
}
