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

  private val MixBudget = 100000L // total training-token budget

  /** Data-mixing budget planner (the static-mixture stage of The Pile /
    * DoReMi-style training recipes): given per-source token inventories
    * and target mixture weights, emit each source's token target and the
    * epoch multiplier (>1 = upsample, <1 = subsample) a sampler must
    * apply. Weights here derive deterministically from the source id
    * (1 + id mod 5, normalized) — in production they arrive as a config
    * table; the plan is the same one hash-agg over the corpus plus
    * arithmetic on the 20-row inventory. Every ratio is computed on
    * exact integer counts and rounded once at the end, so the plan is
    * bit-identical on both engines. */
  val q155_mixture_plan = Q(
    "q155_mixture_plan",
    Some(s"""WITH inv AS (
            |  SELECT source,
            |    CAST(substr(source, 4) AS BIGINT) AS sid,
            |    CAST(count(*) AS BIGINT) AS n_docs,
            |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
            |  FROM documents GROUP BY source),
            |w AS (SELECT *, 1 + sid % 5 AS wt FROM inv),
            |tot AS (SELECT CAST(sum(wt) AS BIGINT) AS wsum FROM w)
            |SELECT source, n_docs, n_tokens,
            |  round(CAST(wt AS DOUBLE) / wsum, 6) AS weight_share,
            |  CAST(round($MixBudget * CAST(wt AS DOUBLE) / wsum, 0) AS BIGINT)
            |    AS tokens_target,
            |  round(($MixBudget * CAST(wt AS DOUBLE) / wsum) / n_tokens, 6)
            |    AS epochs
            |FROM w CROSS JOIN tot
            |ORDER BY source""".stripMargin),
    (s, d) => {
      val inv = Tables.documents(s, d)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
        .withColumn("sid", substring(col("source"), 4, 10).cast("long"))
        .withColumn("wt", lit(1L) + col("sid") % 5)
      val tot = inv.agg(sum(col("wt")).as("wsum"))
      val target = lit(MixBudget) * col("wt").cast("double") / col("wsum")
      inv.crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          round(col("wt").cast("double") / col("wsum"), 6).as("weight_share"),
          round(target, 0).cast("long").as("tokens_target"),
          round(target / col("n_tokens"), 6).as("epochs"))
        .orderBy("source")
    })

  private val AnonK = 3L

  /** k-anonymity audit over quasi-identifiers (the privacy gate a
    * governed dataset release runs): every (lang, source) combination
    * occurring fewer than k times is a re-identification risk and is
    * flagged for suppression. One hash agg over the quasi-identifier
    * tuple; the suppression decision is pure arithmetic on the group
    * size — the same one-scan shape as the q91 quality gate, pointed at
    * privacy. */
  val q156_k_anonymity = Q(
    "q156_k_anonymity",
    Some(s"""SELECT lang, source, CAST(count(*) AS BIGINT) AS group_n,
            |  CAST(CASE WHEN count(*) < $AnonK THEN 1 ELSE 0 END AS BIGINT)
            |    AS suppress
            |FROM documents
            |GROUP BY lang, source
            |ORDER BY lang, source""".stripMargin),
    (s, d) => Tables.documents(s, d)
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("group_n"))
      .select(col("lang"), col("source"), col("group_n"),
        when(col("group_n") < AnonK, 1L).otherwise(0L).as("suppress"))
      .orderBy("lang", "source"))

  private val NShards = 8

  /** Training-shard export manifest — the closing composition of the
    * curation stack (q122's sibling for the SERVING side): exact dedup
    * (q34's deterministic keeper), epoch-keyed md5 shard assignment
    * (q148's reshuffle device WITHOUT a global rank window — the bucket
    * comes straight from the hash, so no single-partition bottleneck
    * exists at any scale), and a per-shard manifest (doc count, token
    * count, order-independent id checksum — q119's anti-entropy form)
    * that a downstream training job can verify its reads against. One
    * content-hash window + one shard hash agg; everything else is
    * scan-side. */
  val q163_training_shards = Q(
    "q163_training_shards", {
      import graft.functions.TextFunctions.hexSpanValSql
      val draw = hexSpanValSql("md5('0|' || CAST(doc_id AS VARCHAR))", 0, 13)
      val fp = hexSpanValSql("md5(CAST(doc_id AS VARCHAR))", 0, 13)
      Some(s"""WITH dd AS (
              |  SELECT doc_id, text, ROW_NUMBER() OVER (
              |    PARTITION BY md5(text) ORDER BY doc_id) AS rn
              |  FROM documents),
              |k AS (SELECT doc_id, text FROM dd WHERE rn = 1),
              |sh AS (
              |  SELECT doc_id,
              |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
              |    CAST($draw % $NShards AS BIGINT) AS shard
              |  FROM k)
              |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
              |  CAST(sum(toks) AS BIGINT) AS n_tokens,
              |  CAST(sum($fp) AS BIGINT) AS id_checksum
              |FROM sh
              |GROUP BY shard
              |ORDER BY shard""".stripMargin)
    },
    (s, d) => {
      import graft.functions.TextFunctions.hexSpanValSql
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(md5(col("text"))).orderBy("doc_id")
      val kept = Tables.documents(s, d)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      // q132 lesson: hash once into a column, THEN span-extract — the
      // text-level helper would paste the md5 into every digit read
      val sh = kept
        .withColumn("__d", md5(concat(lit("0|"), col("doc_id").cast("string"))))
        .withColumn("__h", md5(col("doc_id").cast("string")))
        .select(
          (expr(hexSpanValSql("__d", 0, 13)) % NShards).cast("long").as("shard"),
          size(split(col("text"), " ")).cast("long").as("toks"),
          expr(hexSpanValSql("__h", 0, 13)).as("fp"))
      sh.groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"),
          sum(col("fp")).as("id_checksum"))
        .orderBy("shard")
    })

  /** PADDING-WASTE report: docs bucketed to the next power-of-two token
    * length (floor 16) — the shape a fixed-length training batcher pads
    * to — with per-bucket token, padding, and waste-fraction totals. The
    * number that decides whether a packing stage (q82) pays for itself.
    *
    * The bucket is computed with INTEGER machinery (2^len(bin(t−1)) —
    * the binary-representation length IS ⌈log2⌉), not float log2, so a
    * doc sitting exactly on a power of two lands identically in both
    * engines.
    *
    * Scale shape: scan-side arithmetic + one hash agg over ≤ ~20 bucket
    * groups. */
  val q188_padding_waste = Q(
    "q188_padding_waste",
    Some("""WITH t AS (
           |  SELECT len(text) - len(replace(text, ' ', '')) + 1 AS toks
           |  FROM documents),
           |b AS (
           |  SELECT toks,
           |    greatest(16, CAST(pow(2, len(bin(toks - 1))) AS BIGINT))
           |      AS bucket
           |  FROM t)
           |SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(toks) AS BIGINT) AS tokens,
           |  CAST(sum(bucket - toks) AS BIGINT) AS padding,
           |  round(CAST(sum(bucket - toks) AS DOUBLE) / sum(bucket), 6)
           |    AS waste_pct
           |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin),
    (s, d) => {
      val toks = (length(col("text")) -
        length(translate(col("text"), " ", "")) + lit(1)).cast("long")
      Tables.documents(s, d)
        .select(toks.as("toks"))
        .withColumn("bucket",
          greatest(lit(16L), pow(lit(2), length(bin(col("toks") - 1)))
            .cast("long")))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("toks")).as("tokens"),
          sum(col("bucket") - col("toks")).as("padding"))
        .select(col("bucket"), col("n_docs"), col("tokens"), col("padding"),
          round(col("padding").cast("double") /
            (col("tokens") + col("padding")), 6).as("waste_pct"))
        .orderBy("bucket")
    })

  /** TOKEN-BUDGET FILL: execute a per-source token budget (40% of each
    * source's tokens) by taking documents in (n_chars desc, doc_id)
    * priority order until the running total would exceed the budget —
    * how a mixture plan (q155) becomes an actual selected set. The
    * budget test is exact integer arithmetic (5·cum <= 2·total), so the
    * boundary document is decided identically in both engines.
    *
    * Scale shape: ONE shuffle on source feeds both window specs (the
    * per-source total and the priority-ordered running sum share the
    * partitioning); per-source partitions are mixture-plan-sized, never
    * corpus-sized in one partition. */
  val q190_budget_fill = Q(
    "q190_budget_fill",
    Some("""WITH t AS (
           |  SELECT source, doc_id, n_chars,
           |    len(text) - len(replace(text, ' ', '')) + 1 AS toks
           |  FROM documents),
           |w AS (
           |  SELECT source, toks,
           |    sum(toks) OVER (PARTITION BY source) AS total,
           |    sum(toks) OVER (PARTITION BY source
           |      ORDER BY n_chars DESC, doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           |  FROM t)
           |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(CASE WHEN 5 * cum <= 2 * total THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_selected,
           |  CAST(sum(toks) AS BIGINT) AS total_tokens,
           |  CAST(sum(CASE WHEN 5 * cum <= 2 * total THEN toks ELSE 0 END)
           |    AS BIGINT) AS tokens_selected,
           |  round(CAST(sum(CASE WHEN 5 * cum <= 2 * total THEN toks
           |    ELSE 0 END) AS DOUBLE) / sum(toks), 6) AS utilization
           |FROM w GROUP BY source ORDER BY source""".stripMargin),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val toks = (length(col("text")) -
        length(translate(col("text"), " ", "")) + lit(1)).cast("long")
      val wTotal = Window.partitionBy("source")
      val wCum = Window.partitionBy("source")
        .orderBy(col("n_chars").desc, col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val sel = col("cum") * 5 <= col("total") * 2
      Tables.documents(s, d)
        .select(col("source"), col("doc_id"), col("n_chars"),
          toks.as("toks"))
        .withColumn("total", sum(col("toks")).over(wTotal))
        .withColumn("cum", sum(col("toks")).over(wCum))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(sel, 1L).otherwise(0L)).as("n_selected"),
          sum(col("toks")).as("total_tokens"),
          sum(when(sel, col("toks")).otherwise(0L)).as("tokens_selected"))
        .select(col("source"), col("n_docs"), col("n_selected"),
          col("total_tokens"), col("tokens_selected"),
          round(col("tokens_selected").cast("double") /
            col("total_tokens"), 6).as("utilization"))
        .orderBy("source")
    })

  val all: Seq[Q] = Seq(q146_nested_ops, q147_dynamic_pivot,
    q148_epoch_shuffle, q155_mixture_plan, q156_k_anonymity,
    q163_training_shards, q188_padding_waste, q190_budget_fill)
}
