package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions.hexSpanValSql

/** Second curation block: sequence packing, deterministic weighted
  * sampling, and the count-min heavy-hitter sketch gate — the remaining
  * staples of a training-data assembly pipeline, each oracle-checked.
  */
object DataOps2 {

  private val WindowTokens = 2048

  /** Concat-and-split sequence packing (operators/Packing): documents in
    * doc_id order within each source form one token stream, split into
    * 2048-token context windows; a doc belongs to the window holding its
    * first token. Per-chunk occupancy stats out. One window shuffle per
    * source — no global order anywhere. */
  val q74_seq_packing = Q(
    "q74_seq_packing",
    Some(s"""WITH t AS (
            |  SELECT source, doc_id,
            |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
            |  FROM documents),
            |c AS (
            |  SELECT source, doc_id, tok,
            |    CAST(sum(tok) OVER (PARTITION BY source ORDER BY doc_id
            |      ROWS UNBOUNDED PRECEDING) - tok AS BIGINT) AS start_offset
            |  FROM t)
            |SELECT source, CAST(start_offset // $WindowTokens AS BIGINT) AS chunk_id,
            |  CAST(count(*) AS BIGINT) AS n_docs,
            |  CAST(sum(tok) AS BIGINT) AS n_tokens,
            |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
            |FROM c GROUP BY source, start_offset // $WindowTokens
            |ORDER BY source, chunk_id""".stripMargin),
    (s, d) => graft.operators.Packing.packSequences(
        Tables.documents(s, d)
          .select(col("source"), col("doc_id"),
            size(split(col("text"), " ")).as("tok")),
        "source", "doc_id", col("tok"), WindowTokens)
      .groupBy(col("source"), col("chunk_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tok").cast("long")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy("source", "chunk_id"))

  /** Deterministic quality-weighted subsampling: keep a document with
    * probability = its weight, decided by comparing the weight against a
    * uniform drawn from the md5 of the doc id — pure scan-side arithmetic,
    * identical on any cluster at any scale, replayable (same id ⇒ same
    * draw), and independent of the content edits that change quality.
    * 13 hex digits = 52 bits, exact in a double; both engines run the
    * same digit arithmetic. */
  val q75_weighted_sample = Q(
    "q75_weighted_sample", {
      val u = s"(${hexSpanValSql("md5(CAST(doc_id AS VARCHAR))", 0, 13)} / CAST(4503599627370496 AS DOUBLE))"
      val w = "least(1.0, CAST(len(string_split(text, ' ')) AS DOUBLE) / 200.0)"
      Some(s"""SELECT doc_id, round($u, 6) AS draw, round($w, 6) AS keep_p
              |FROM documents
              |WHERE $u < $w
              |ORDER BY doc_id""".stripMargin)
    },
    (s, d) => {
      // CAST the divisor: a bare `4503599627370496.0` literal parses as
      // DECIMAL in Spark, making the draw DECIMAL(…,6) while DuckDB emits
      // DOUBLE — the values agree but the hash of the cells does not.
      // q132 lesson: hash once into a column — textual md5 inside
      // hexSpanValSql would re-evaluate the digest 13× per row.
      val u = expr(s"(${hexSpanValSql("__uh", 0, 13)} / CAST(4503599627370496 AS DOUBLE))")
      val w = least(lit(1.0), size(split(col("text"), " ")).cast("double") / 200.0)
      Tables.documents(s, d)
        .withColumn("__uh", md5(col("doc_id").cast("string")))
        .select(col("doc_id"), u.as("__u"), w.as("__w"))
        .filter(col("__u") < col("__w"))
        .select(col("doc_id"), round(col("__u"), 6).as("draw"),
          round(col("__w"), 6).as("keep_p"))
        .orderBy("doc_id")
    })

  private val CmsEps = 0.001
  private val CmsConf = 0.99
  private val TopK = 5

  /** Count-min heavy hitters, gated by exact bounds (the third sketch
    * family beside q54 HLL and q65 quantiles): the sketch's estimate for
    * each exact top-5 key must satisfy the CMS guarantee
    * exact ≤ est ≤ exact + ⌈eps·N⌉. The sketch is a few KB of mergeable
    * counters built in one pass (map-side partial merge — the 100 TB way
    * to get hot keys without a full groupBy); only the sketch and the
    * 5 candidate rows ever reach the driver. The oracle computes the
    * exact counts and literal TRUE, so estimator drift flips the hash. */
  val q76_heavy_hitters = Q(
    "q76_heavy_hitters",
    Some(s"""SELECT l_orderkey AS key, CAST(count(*) AS BIGINT) AS exact_n,
            |  TRUE AS within_bounds
            |FROM lineitem GROUP BY l_orderkey
            |ORDER BY exact_n DESC, key
            |LIMIT $TopK""".stripMargin),
    (s, d) => {
      import s.implicits._
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("key"))
      val total = li.count()
      val skBytes = li
        .agg(expr(s"count_min_sketch(key, ${CmsEps}d, ${CmsConf}d, 42)"))
        .head().getAs[Array[Byte]](0)
      val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(skBytes))
      val slack = math.ceil(CmsEps * total).toLong
      val top = li.groupBy("key").agg(count(lit(1)).as("exact_n"))
        .orderBy(col("exact_n").desc, col("key"))
        .limit(TopK)
        .as[(Long, Long)].collect()
      top.map { case (k, n) =>
        val est = cms.estimateCount(k)
        (k, n, est >= n && est <= n + slack)
      }.toSeq.toDF("key", "exact_n", "within_bounds")
    })

  private val ZBits = 12

  /** Z-order (Morton) layout key (operators/Layout): interleave two
    * bucketed dimensions so ONE sort bounds both columns' per-file ranges
    * — the clustering that lets min/max stats prune a 2-D box predicate
    * at 100 TB. Scan-side arithmetic, identical in both engines; the
    * locality property itself (a box query touches few z-bins) is
    * asserted in LayoutSpec. */
  val q77_zorder_key = Q(
    "q77_zorder_key", {
      val z = graft.operators.Layout.zValueSql(
        s"l_partkey % 4096", s"l_suppkey % 4096", ZBits)
      Some(s"""SELECT l_orderkey, l_linenumber,
              |  CAST(l_partkey % 4096 AS BIGINT) AS x,
              |  CAST(l_suppkey % 4096 AS BIGINT) AS y,
              |  CAST($z AS BIGINT) AS z
              |FROM lineitem
              |ORDER BY z, l_orderkey, l_linenumber
              |LIMIT 100""".stripMargin)
    },
    (s, d) => {
      val li = Tables.lineitem(s, d)
      li.select(col("l_orderkey"), col("l_linenumber"),
          (col("l_partkey") % 4096).cast("long").as("x"),
          (col("l_suppkey") % 4096).cast("long").as("y"))
        .withColumn("z", graft.operators.Layout.zValue(col("x"), col("y"), ZBits))
        .orderBy("z", "l_orderkey", "l_linenumber")
        .limit(100)
    })

  /** Incremental aggregate maintenance (operators/IncrementalAgg): the
    * input arrives as three disjoint "partitions", each summarized alone,
    * merged into one standing summary — the oracle computes the same
    * statistics over the FULL table in one pass, so the hash match proves
    * the mergeability law (decimal sums make it exact, not approximate). */
  val q79_incremental_agg = Q(
    "q79_incremental_agg",
    Some("""SELECT l_returnflag, l_linestatus,
            |  CAST(count(*) AS BIGINT) AS n,
            |  CAST(sum(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_v,
            |  min(l_extendedprice) AS min_v,
            |  max(l_extendedprice) AS max_v
            |FROM lineitem
            |GROUP BY l_returnflag, l_linestatus
            |ORDER BY l_returnflag, l_linestatus""".stripMargin),
    (s, d) => {
      val keys = Seq("l_returnflag", "l_linestatus")
      val li = Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_linestatus"),
          col("l_extendedprice"), col("l_linenumber"))
      val parts = (0 until 3).map(i =>
        graft.operators.IncrementalAgg.summarize(
          li.filter(col("l_linenumber") % 3 === i), keys, "l_extendedprice"))
      graft.operators.IncrementalAgg.merge(keys, parts: _*)
        .select(col("l_returnflag"), col("l_linestatus"),
          col("n").cast("long").as("n"),
          col("sum_v").cast("double").as("sum_v"),
          col("min_v"), col("max_v"))
        .orderBy("l_returnflag", "l_linestatus")
    })

  private val TopN = 5

  /** Per-group top-k as a typed Aggregator (functions/TopKAggregator)
    * instead of a window: map-side partial top-k means only k pairs per
    * group per partition shuffle — O(n log k) work and a k-row shuffle
    * where row_number().over(...) sorts and ships whole groups. The
    * oracle IS the window formulation, so the hash match proves the
    * aggregator ≡ sort semantics (score desc, id asc tiebreak). */
  val q81_topk_agg = Q(
    "q81_topk_agg", {
      val cols = (1 to TopN).map(i =>
        s"max(CASE WHEN rn = $i THEN id END) AS id_$i").mkString(",\n  ")
      Some(s"""WITH ranked AS (
              |  SELECT l_returnflag,
              |    CAST(l_orderkey * 10 + l_linenumber AS BIGINT) AS id,
              |    ROW_NUMBER() OVER (PARTITION BY l_returnflag
              |      ORDER BY l_extendedprice DESC,
              |        l_orderkey * 10 + l_linenumber) AS rn
              |  FROM lineitem)
              |SELECT l_returnflag,
              |  $cols
              |FROM ranked WHERE rn <= $TopN
              |GROUP BY l_returnflag
              |ORDER BY l_returnflag""".stripMargin)
    },
    (s, d) => {
      val topk = udaf(new graft.functions.TopKAggregator(TopN))
      Tables.lineitem(s, d)
        .select(col("l_returnflag"),
          col("l_extendedprice").as("score"),
          (col("l_orderkey") * 10 + col("l_linenumber")).cast("long").as("id"))
        .groupBy("l_returnflag")
        .agg(topk(col("score"), col("id")).as("ids"))
        .select(col("l_returnflag") +:
          (1 to TopN).map(i => element_at(col("ids"), i).as(s"id_$i")): _*)
        .orderBy("l_returnflag")
    })

  private val ChunkSize = 200
  private val ChunkStride = 150 // 50-char overlap

  /** Overlapping document chunking (the RAG/embedding-prep staple):
    * fixed-size char windows every stride chars, chunk k covering
    * [k·stride+1, k·stride+size]. Pure scan-side explode — row count
    * grows by ~L/stride but nothing shuffles; chunk content travels as
    * md5 so the result stays hash-portable. */
  val q82_doc_chunks = Q(
    "q82_doc_chunks", {
      val overlap = ChunkSize - ChunkStride
      Some(s"""WITH c AS (
              |  SELECT doc_id, text,
              |    unnest(range(0, greatest(1,
              |      (length(text) - $overlap + ${ChunkStride - 1}) // $ChunkStride))) AS k
              |  FROM documents)
              |SELECT doc_id, CAST(k AS BIGINT) AS chunk_idx,
              |  CAST(k * $ChunkStride + 1 AS BIGINT) AS start_pos,
              |  CAST(length(substr(text, CAST(k * $ChunkStride + 1 AS INT), $ChunkSize)) AS BIGINT)
              |    AS chunk_len,
              |  md5(substr(text, CAST(k * $ChunkStride + 1 AS INT), $ChunkSize)) AS chunk_md5
              |FROM c
              |ORDER BY doc_id, chunk_idx""".stripMargin)
    },
    (s, d) => {
      val overlap = ChunkSize - ChunkStride
      Tables.documents(s, d)
        .withColumn("__n", greatest(lit(1L),
          expr(s"(length(text) - $overlap + ${ChunkStride - 1}) div $ChunkStride")))
        .select(col("doc_id"), col("text"),
          explode(sequence(lit(0L), col("__n") - 1)).as("k"))
        .select(col("doc_id"), col("k").as("chunk_idx"),
          (col("k") * ChunkStride + 1).as("start_pos"),
          length(expr(s"substr(text, cast(k * $ChunkStride + 1 as int), $ChunkSize)"))
            .cast("long").as("chunk_len"),
          md5(expr(s"substr(text, cast(k * $ChunkStride + 1 as int), $ChunkSize)"))
            .as("chunk_md5"))
        .orderBy("doc_id", "chunk_idx")
    })

  private val StratumN = 30

  /** Deterministic stratified sampling: a fixed-n uniform-but-replayable
    * sample per source, ranked by md5(doc_id) — the content-independent
    * shuffle order that makes the sample stable across clusters and
    * re-crawls (q61 picks the BEST per source; this picks a FAIR draw).
    * One window shuffle on source. */
  val q83_stratified_sample = Q(
    "q83_stratified_sample",
    Some(s"""SELECT source, doc_id, CAST(rn AS BIGINT) AS draw_rank FROM (
            |  SELECT source, doc_id,
            |    ROW_NUMBER() OVER (PARTITION BY source
            |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
            |  FROM documents) t
            |WHERE rn <= $StratumN
            |ORDER BY source, draw_rank""".stripMargin),
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("source")
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      Tables.documents(s, d)
        .withColumn("draw_rank", row_number().over(w).cast("long"))
        .filter(col("draw_rank") <= StratumN)
        .select("source", "doc_id", "draw_rank")
        .orderBy("source", "draw_rank")
    })

  val all: Seq[Q] = Seq(q74_seq_packing, q75_weighted_sample,
    q76_heavy_hitters, q77_zorder_key, q79_incremental_agg, q81_topk_agg,
    q82_doc_chunks, q83_stratified_sample)
}
