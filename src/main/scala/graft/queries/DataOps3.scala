package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions.hexSpanValSql

/** Third curation block: the feature-hashing vectorizer ("hashing trick")
  * with an inverted-index sparse cosine join.
  */
object DataOps3 {

  // 2^15 buckets: ~100-200 distinct tokens/doc keeps postings lists and
  // per-bucket fan-out tight
  private val HashDim = 32768
  private val SparseK = 3

  /** Hashing-trick sparse vectors + inverted-index cosine retrieval: each
    * token maps to bucket md5(tok)[0..8) mod 2^15 (engine-portable hex
    * arithmetic, no engine hash functions), term frequencies become the
    * sparse vector, and a PROBE SET of query documents retrieves its
    * top-k corpus neighbors through the postings lists — candidates are
    * only docs sharing a bucket with a probe, dot products accumulate as
    * exact integers through one (probe, doc) hash agg, norms are exact
    * under sqrt. This is the sparse-retrieval serving shape (BM25-style
    * inverted index, here with raw tf weights): probe postings broadcast,
    * the corpus index never moves, cost is linear in postings touched.
    * The ALL-PAIRS variant of the same index is deliberately absent: with
    * a same-vocab corpus nearly every doc pair shares a bucket, so its
    * pair aggregation is Θ(N²) no matter the dimension (measured 100+ s
    * at sf0.1) — all-pairs near-dup belongs to the banded families
    * (q36/q55/q41) whose candidate volume is tunable. */
  val q110_sparse_cosine = Q(
    "q110_sparse_cosine", {
      val bucket = s"(${hexSpanValSql("h", 0, 8)} % $HashDim)"
      Some(s"""WITH t AS (
              |  SELECT doc_id, md5(unnest(string_split(text, ' '))) AS h
              |  FROM documents),
              |v AS (
              |  SELECT doc_id, $bucket AS bucket, CAST(count(*) AS BIGINT) AS tf
              |  FROM t GROUP BY doc_id, $bucket),
              |nrm AS (
              |  SELECT doc_id, sqrt(CAST(sum(tf * tf) AS DOUBLE)) AS nrm
              |  FROM v GROUP BY doc_id),
              |p AS (
              |  SELECT q.doc_id AS probe_id, c.doc_id AS doc_b,
              |    CAST(sum(q.tf * c.tf) AS BIGINT) AS dot
              |  FROM v q JOIN v c ON q.bucket = c.bucket
              |  WHERE q.doc_id % 100 = 7 AND c.doc_id <> q.doc_id
              |  GROUP BY 1, 2),
              |r AS (
              |  SELECT probe_id, doc_b, dot,
              |    dot / (nq.nrm * nc.nrm) AS cosine,
              |    ROW_NUMBER() OVER (PARTITION BY probe_id
              |      ORDER BY dot / (nq.nrm * nc.nrm) DESC, doc_b) AS rk
              |  FROM p
              |  JOIN nrm nq ON nq.doc_id = probe_id
              |  JOIN nrm nc ON nc.doc_id = doc_b)
              |SELECT probe_id, CAST(rk AS BIGINT) AS rk, doc_b, dot,
              |  round(cosine, 6) AS cosine
              |FROM r WHERE rk <= $SparseK
              |ORDER BY probe_id, rk""".stripMargin)
    },
    (s, d) => {
      val v = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .withColumn("h", md5(col("tok")))
        .withColumn("bucket", expr(s"${hexSpanValSql("h", 0, 8)} % $HashDim"))
        .groupBy("doc_id", "bucket").agg(count(lit(1)).as("tf"))
      val nrm = v.groupBy("doc_id")
        .agg(sqrt(sum(col("tf") * col("tf")).cast("double")).as("nrm"))
      val probes = v.filter(col("doc_id") % 100 === 7)
        .toDF("probe_id", "bucket", "tf_q")
      val cand = broadcast(probes)
        .join(v.toDF("doc_b", "bucket", "tf_c"), "bucket")
        .filter(col("doc_b") =!= col("probe_id"))
        .groupBy("probe_id", "doc_b")
        .agg(sum(col("tf_q") * col("tf_c")).as("dot"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("probe_id")
        .orderBy(col("cosine_raw").desc, col("doc_b"))
      cand.join(nrm.toDF("probe_id", "nrm_q"), "probe_id")
        .join(nrm.toDF("doc_b", "nrm_c"), "doc_b")
        .withColumn("cosine_raw", col("dot") / (col("nrm_q") * col("nrm_c")))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= SparseK)
        .select(col("probe_id"), col("rk"), col("doc_b"), col("dot"),
          round(col("cosine_raw"), 6).as("cosine"))
        .orderBy("probe_id", "rk")
    })

  /** Survivorship merge ("golden record"): per entity, each field takes
    * its most recent NON-NULL value across the update history — the field
    * clocks differ, so this is NOT q27's latest-row-wins: a golden record
    * can mix values from different updates. Sparse fields are simulated
    * by masking order columns; recency = (o_orderdate, o_orderkey), a
    * total order so retries/speculation cannot flip a survivor. One
    * window + one post-filter — the per-entity sort never globalizes. */
  val q115_golden_record = Q(
    "q115_golden_record",
    Some("""WITH h AS (
            |  SELECT o_custkey, o_orderdate, o_orderkey,
            |    CASE WHEN o_orderkey % 3 = 0 THEN o_orderpriority END AS prio,
            |    CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice END AS price
            |  FROM orders),
            |f AS (
            |  SELECT o_custkey,
            |    last_value(prio IGNORE NULLS) OVER w AS last_prio,
            |    last_value(price IGNORE NULLS) OVER w AS last_price,
            |    ROW_NUMBER() OVER (PARTITION BY o_custkey
            |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rev,
            |    CAST(count(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS n_updates
            |  FROM h WINDOW w AS (PARTITION BY o_custkey
            |    ORDER BY o_orderdate, o_orderkey
            |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
            |SELECT o_custkey, last_prio, last_price, n_updates
            |FROM f WHERE rev = 1
            |ORDER BY o_custkey""".stripMargin),
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val wAll = org.apache.spark.sql.expressions.Window.partitionBy("o_custkey")
      val wRev = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey")
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
          when(col("o_orderkey") % 3 === 0, col("o_orderpriority")).as("prio"),
          when(col("o_orderkey") % 2 === 0, col("o_totalprice")).as("price"))
        .withColumn("last_prio", last(col("prio"), ignoreNulls = true).over(w))
        .withColumn("last_price", last(col("price"), ignoreNulls = true).over(w))
        .withColumn("rev", row_number().over(wRev))
        .withColumn("n_updates", count(lit(1)).over(wAll).cast("long"))
        .filter(col("rev") === 1)
        .select("o_custkey", "last_prio", "last_price", "n_updates")
        .orderBy("o_custkey")
    })

  val all: Seq[Q] = Seq(q110_sparse_cosine, q115_golden_record)
}
