package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.TextFunctions.hexSpanValSql

/** Dataset-curation operators a large training-data pipeline runs after
  * dedup/quality scoring: deterministic split assignment, per-source
  * quota capping, and PII-style redaction. All scan-side or single-window
  * plans; every entry oracle-checked.
  */
object DataOps {

  /** Content-hash split assignment (train/val/test 80/10/10): bucket =
    * integer value of the md5 prefix mod 100 — a pure function of the
    * CONTENT, so duplicated or re-crawled documents land in the same
    * split on any cluster at any scale (the decontamination property;
    * row-random splits don't have it). Scan-side expression, no shuffle;
    * the same hex arithmetic runs in both engines. */
  val q60_hash_split = Q(
    "q60_hash_split", {
      val bucket = s"(${hexSpanValSql("md5(text)", 0, 6)} % 100)"
      Some(s"""SELECT doc_id, CAST($bucket AS BIGINT) AS bucket,
              |  CASE WHEN $bucket < 80 THEN 'train'
              |       WHEN $bucket < 90 THEN 'val'
              |       ELSE 'test' END AS split
              |FROM documents
              |ORDER BY doc_id""".stripMargin)
    },
    (s, d) => {
      val bucket = expr(s"(${hexSpanValSql("md5(text)", 0, 6)} % 100)")
      Tables.documents(s, d).select(
        col("doc_id"),
        bucket.cast("long").as("bucket"),
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
          .as("split"))
        .orderBy("doc_id")
    })

  private val Quota = 50

  /** Per-source quota: keep the top-N documents per source by quality
    * (here: length, ties by id) — the domain-balance cap that stops one
    * crawl source from dominating a mixture. One window shuffle on
    * source; rank filter never globalizes. */
  val q61_source_quota = Q(
    "q61_source_quota",
    Some(s"""SELECT source, doc_id, CAST(rn AS BIGINT) AS rank FROM (
            |  SELECT source, doc_id,
            |    ROW_NUMBER() OVER (PARTITION BY source
            |      ORDER BY n_chars DESC, doc_id) AS rn
            |  FROM documents) t
            |WHERE rn <= $Quota
            |ORDER BY source, rank""".stripMargin),
    (s, d) => {
      val w = Window.partitionBy("source")
        .orderBy(col("n_chars").desc, col("doc_id").asc)
      Tables.documents(s, d)
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= Quota)
        .select("source", "doc_id", "rank")
        .orderBy("source", "rank")
    })

  /** PII-style redaction: mask email-shaped tokens and long digit runs,
    * count the redactions per doc (counted BEFORE replacement). Pure
    * scan-side regex; patterns kept in the Java∩RE2 common dialect. */
  val q62_redact = Q(
    "q62_redact",
    Some("""SELECT doc_id,
            |  regexp_replace(
            |    regexp_replace(text, '[a-z0-9._-]+@[a-z0-9.-]+', '<EMAIL>', 'g'),
            |    '[0-9][0-9][0-9]+', '<NUM>', 'g') AS redacted,
            |  CAST(len(regexp_extract_all(text, '[a-z0-9._-]+@[a-z0-9.-]+')) AS BIGINT)
            |    + CAST(len(regexp_extract_all(text, '[0-9][0-9][0-9]+')) AS BIGINT)
            |    AS n_redactions
            |FROM documents
            |ORDER BY doc_id""".stripMargin),
    (s, d) => Tables.documents(s, d).select(
      col("doc_id"),
      regexp_replace(
        regexp_replace(col("text"), "[a-z0-9._-]+@[a-z0-9.-]+", "<EMAIL>"),
        "[0-9][0-9][0-9]+", "<NUM>").as("redacted"),
      (size(regexp_extract_all(col("text"), lit("[a-z0-9._-]+@[a-z0-9.-]+"), lit(0))).cast("long")
        + size(regexp_extract_all(col("text"), lit("[0-9][0-9][0-9]+"), lit(0))).cast("long"))
        .as("n_redactions"))
      .orderBy("doc_id"))

  /** CDC-apply / batch MERGE (operators/CdcApply): the events stream acts
    * as a change feed over the customer snapshot — latest event per user
    * wins (version = event time then id; 'error' = delete), upserts
    * replace rows, deletes drop keys, untouched rows pass through.
    * events.ts is TIMESTAMP(NANOS) read as nano longs here (truncated to
    * the oracle's µs via div 1000 — same total order per convention). */
  val q63_cdc_apply = Q(
    "q63_cdc_apply",
    Some("""WITH ch AS (
            |  SELECT user_id AS id,
            |    'user_' || CAST(user_id AS VARCHAR) AS name,
            |    value AS bal,
            |    CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
            |    ROW_NUMBER() OVER (PARTITION BY user_id
            |      ORDER BY ts DESC, event_id DESC) AS rn
            |  FROM events),
            |latest AS (SELECT id, name, bal, op FROM ch WHERE rn = 1)
            |SELECT c_custkey AS id, c_name AS name, c_acctbal AS bal
            |FROM customer
            |WHERE c_custkey NOT IN (SELECT id FROM latest)
            |UNION ALL
            |SELECT id, name, bal FROM latest WHERE op <> 'D'
            |ORDER BY id""".stripMargin),
    (s, d) => {
      val snap = Tables.customer(s, d).select(
        col("c_custkey").as("id"), col("c_name").as("name"),
        col("c_acctbal").as("bal"))
      val feed = Tables.events(s, d).select(
        col("user_id").as("id"),
        concat(lit("user_"), col("user_id").cast("string")).as("name"),
        col("value").as("bal"),
        expr("ts div 1000").as("__v1"),
        col("event_id").as("__v2"),
        when(col("event_type") === "error", "D").otherwise("U").as("op"))
      graft.operators.CdcApply.applyChanges(
        snap, feed, "id", Seq(col("__v1"), col("__v2")), "op", "D")
        .orderBy("id")
    })

  /** Salted skew join (operators/SkewJoin): lineitem⋈orders through 8
    * deterministic salt buckets — the oracle is the PLAIN join, so the
    * hash match proves the salted plan is row-for-row equivalent. */
  val q64_salted_join = Q(
    "q64_salted_join",
    Some("""SELECT o_orderkey,
            |  CAST(count(*) AS BIGINT) AS n_lines,
            |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
            |  min(o_orderstatus) AS status
            |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            |GROUP BY o_orderkey
            |HAVING count(*) >= 5
            |ORDER BY o_orderkey""".stripMargin),
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"),
          col("l_linenumber"))
      val ords = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"))
      graft.operators.SkewJoin.saltedJoin(
        li, ords, "o_orderkey", col("l_linenumber"), salts = 8)
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n_lines"),
          Q.asDouble(sum(Q.dec(col("l_quantity")))).as("total_qty"),
          min(col("o_orderstatus")).as("status"))
        .filter(col("n_lines") >= 5)
        .orderBy("o_orderkey")
    })

  /** Quantile-sketch surface (the second sketch family beside q54's HLL):
    * approx_percentile's value is engine-specific, so the gate asserts it
    * lands inside the exact [p40, p60] band around the true median —
    * the oracle computes the exact band and literal TRUE, making a
    * drifting sketch flip the hash. */
  val q65_approx_quantile = Q(
    "q65_approx_quantile",
    Some("""SELECT l_returnflag,
            |  round(quantile_cont(l_quantity, 0.5), 6) AS exact_median,
            |  TRUE AS within_band
            |FROM lineitem
            |GROUP BY l_returnflag
            |ORDER BY l_returnflag""".stripMargin),
    (s, d) => Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_quantity, 0.5)"), 6).as("exact_median"),
        expr("approx_percentile(l_quantity, 0.5, 1000)").as("approx"),
        expr("percentile(l_quantity, 0.4)").as("lo"),
        expr("percentile(l_quantity, 0.6)").as("hi"))
      .select(col("l_returnflag"), col("exact_median"),
        (col("approx") >= col("lo") && col("approx") <= col("hi"))
          .as("within_band"))
      .orderBy("l_returnflag"))

  private val TopTerms = 15

  /** TF-IDF top terms: per-term document frequency joined back to
    * per-doc term frequency, scored tf·ln(N/df) — two hash aggs + one
    * broadcast-size join on term; both engines evaluate ln on identical
    * doubles and the score is rounded before ordering. */
  val q66_tfidf = Q(
    "q66_tfidf",
    Some(s"""WITH tf AS (
            |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM (
            |    SELECT doc_id, unnest(string_split(text, ' ')) AS term
            |    FROM documents) x
            |  GROUP BY doc_id, term),
            |df AS (
            |  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
            |n AS (SELECT count(*) AS n_docs FROM documents)
            |SELECT tf.term, tf.doc_id, tf.tf, df.df,
            |  round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS score
            |FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
            |ORDER BY score DESC, tf.term, doc_id
            |LIMIT $TopTerms""".stripMargin),
    (s, d) => {
      val docs = Tables.documents(s, d)
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val tf = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
      tf.join(df, "term")
        .crossJoin(broadcast(n))
        .select(col("term"), col("doc_id"), col("tf"), col("df"),
          round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6)
            .as("score"))
        .orderBy(col("score").desc, col("term"), col("doc_id"))
        .limit(TopTerms)
    })

  /** The NATIVE as-of join (custom LogicalPlan + Strategy + SparkPlan,
    * graft.plans.AsOfJoinExec): identical semantics and oracle as q24's
    * union-interleave emulation — two implementations, one correlated-
    * subquery oracle, both hash-matched. */
  val q67_asof_native = Q(
    "q67_asof_native",
    Some("""SELECT event_id, user_id,
            |  (SELECT CAST(max(o_orderdate) AS DATE) FROM orders
            |   WHERE o_custkey = user_id AND o_orderdate <= ts) AS last_order_day
            |FROM events
            |ORDER BY event_id""".stripMargin),
    (s, d) => {
      val ev = Tables.events(s, d).select(
        col("event_id"), col("user_id"),
        expr("timestamp_micros(ts div 1000)").as("ts_us"))
      val ords = Tables.orders(s, d).select(
        col("o_custkey"), col("o_orderdate"),
        to_date(col("o_orderdate")).as("last_order_day"))
      graft.operators.AsOfJoin.leftAsOfNative(
          ev, "user_id", "ts_us",
          ords, "o_custkey", "o_orderdate",
          "last_order_day", "last_order_day")
        .select("event_id", "user_id", "last_order_day")
        .orderBy("event_id")
    })

  val all: Seq[Q] = Seq(q60_hash_split, q61_source_quota, q62_redact,
    q63_cdc_apply, q64_salted_join, q65_approx_quantile, q66_tfidf,
    q67_asof_native)
}
