package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Fourth curation/relational block: nested-data higher-order pipelines,
  * runtime-discovered pivots, and the deterministic epoch reshuffle.
  */
object DataOps4 {

  /** Nested-data pipeline ≡ relational aggregation: line items are packed
    * into per-order struct arrays (collect_list), then size/filter/
    * aggregate HIGHER-ORDER FUNCTIONS compute item counts, a conditional
    * count, an exact-decimal total, and a max — and the ORACLE computes
    * the same numbers with plain GROUP BY. The hash match proves the
    * nested formulation loses nothing: the dual representation every
    * document-shaped lake table (structs-in-arrays) relies on. The
    * aggregate lambda's accumulator stays DECIMAL so the nested sum is as
    * partial-order-proof as the relational one. One shuffle (the
    * order-key groupBy) either way. */
  val q146_nested_ops = Q(
    "q146_nested_ops",
    Some("""SELECT l_orderkey,
            |  CAST(count(*) AS BIGINT) AS n_items,
            |  CAST(count(*) FILTER (WHERE l_quantity > 30) AS BIGINT)
            |    AS n_big,
            |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
            |    AS total,
            |  CAST(max(l_quantity) AS DOUBLE) AS max_qty
            |FROM lineitem
            |WHERE l_orderkey < 2000
            |GROUP BY l_orderkey
            |ORDER BY l_orderkey""".stripMargin),
    (s, d) => Tables.lineitem(s, d)
      .filter(col("l_orderkey") < 2000)
      .groupBy("l_orderkey")
      .agg(collect_list(struct(
        col("l_quantity").as("qty"),
        col("l_extendedprice").cast("decimal(18,2)").as("price"))).as("items"))
      .select(col("l_orderkey"),
        size(col("items")).cast("long").as("n_items"),
        size(filter(col("items"), i => i("qty") > 30)).cast("long").as("n_big"),
        aggregate(col("items"),
          lit(BigDecimal(0)).cast("decimal(28,2)"),
          (acc, i) => (acc + i("price")).cast("decimal(28,2)"))
          .cast("double").as("total"),
        array_max(transform(col("items"), i => i("qty"))).cast("double")
          .as("max_qty"))
      .orderBy("l_orderkey"))

  /** Dynamic pivot: the pivot column set discovered FROM THE DATA at plan
    * time (sorted distinct event types — a bounded metadata collect, the
    * packed-centroid rule), then one pivot aggregation. The oracle states
    * the same columns statically — a hash match proves discovery found
    * exactly the live domain. Spark's two-arg pivot(col, values) skips
    * the extra discovery pass when values are supplied, which is what the
    * collected list feeds. */
  val q147_dynamic_pivot = Q(
    "q147_dynamic_pivot",
    Some("""SELECT user_id % 10 AS user_bucket,
            |  CAST(sum(CAST(value AS DECIMAL(18,2)))
            |    FILTER (WHERE event_type = 'click') AS DOUBLE) AS click,
            |  CAST(sum(CAST(value AS DECIMAL(18,2)))
            |    FILTER (WHERE event_type = 'error') AS DOUBLE) AS error,
            |  CAST(sum(CAST(value AS DECIMAL(18,2)))
            |    FILTER (WHERE event_type = 'purchase') AS DOUBLE) AS purchase,
            |  CAST(sum(CAST(value AS DECIMAL(18,2)))
            |    FILTER (WHERE event_type = 'signup') AS DOUBLE) AS signup,
            |  CAST(sum(CAST(value AS DECIMAL(18,2)))
            |    FILTER (WHERE event_type = 'view') AS DOUBLE) AS view
            |FROM events
            |GROUP BY 1
            |ORDER BY user_bucket""".stripMargin),
    (s, d) => {
      val ev = Tables.events(s, d)
      val types = ev.select("event_type").distinct()
        .collect().map(_.getString(0)).sorted.toSeq
      val pivoted = ev
        .groupBy((col("user_id") % 10).as("user_bucket"))
        .pivot("event_type", types)
        .agg(sum(col("value").cast("decimal(18,2)")).cast("double"))
        .orderBy("user_bucket")
      pivoted
    })

  private val EpochTopK = 10

  /** Deterministic epoch reshuffle: training epochs need a DIFFERENT but
    * REPRODUCIBLE document order each pass — rank by md5(epoch|doc_id),
    * the same content-independent draw as the sampling family (q75/q83).
    * Any worker, any retry, any engine derives the identical permutation;
    * emitted here as each epoch's first k documents. The rank is one
    * window per epoch partition; a real input pipeline consumes the SORT
    * KEY itself (a scan-side expression) and never materializes a global
    * permutation. */
  val q148_epoch_shuffle = Q(
    "q148_epoch_shuffle",
    Some(s"""WITH r AS (
            |  SELECT e.epoch, d.doc_id,
            |    ROW_NUMBER() OVER (PARTITION BY e.epoch ORDER BY
            |      md5(CAST(e.epoch AS VARCHAR) || '|'
            |        || CAST(d.doc_id AS VARCHAR)), d.doc_id) AS rk
            |  FROM documents d CROSS JOIN (SELECT unnest([0, 1]) AS epoch) e)
            |SELECT epoch, CAST(rk AS BIGINT) AS rk, doc_id
            |FROM r WHERE rk <= $EpochTopK
            |ORDER BY epoch, rk""".stripMargin),
    (s, d) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("epoch").orderBy(col("draw"), col("doc_id"))
      Tables.documents(s, d).select("doc_id")
        .crossJoin(Seq(0, 1).toDF("epoch"))
        .withColumn("draw", md5(concat(col("epoch").cast("string"),
          lit("|"), col("doc_id").cast("string"))))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= EpochTopK)
        .select("epoch", "rk", "doc_id")
        .orderBy("epoch", "rk")
    })

  val all: Seq[Q] = Seq(q146_nested_ops, q147_dynamic_pivot,
    q148_epoch_shuffle)
}
