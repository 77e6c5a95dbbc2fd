package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions.hexSpanValSql

/** Relational surface, part 5: correlated existence subqueries, LATERAL
  * joins, the exact-percentile family (median / percentile_disc /
  * deterministic mode), and the ratio rank family (percent_rank /
  * cume_dist). Catalyst rewrites the subquery forms into the same
  * semi/anti/window plans the explicit formulations produce — these
  * entries pin the SQL surface, not new physical shapes.
  */
object Relational5 {

  /** Correlated EXISTS + NOT EXISTS — decorrelated by Catalyst into one
    * left-semi and one left-anti hash join on o_custkey (no per-row
    * subquery execution anywhere). Identical SQL runs on both engines. */
  private val existsSql =
    """SELECT c_custkey, c_name FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey
      |                AND o.o_orderstatus = 'F')
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey
      |                AND o.o_orderstatus = 'O')
      |ORDER BY c_custkey""".stripMargin

  val q99_exists_subquery = Q(
    "q99_exists_subquery",
    Some(existsSql),
    (s, d) => {
      Tables.views(s, d, "customer", "orders")
      s.sql(existsSql)
    })

  /** Correlated LATERAL subquery with ORDER BY + LIMIT — top-2 orders per
    * customer. Catalyst decorrelates the limit into a rank-over-join
    * (one shuffle on the correlation key), so the per-row "subquery" is
    * really a window — the same plan a hand-written row_number() produces.
    * Identical SQL runs on both engines. */
  private val lateralSql =
    """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
      |FROM customer c, LATERAL (
      |  SELECT o_orderkey, o_totalprice FROM orders o
      |  WHERE o.o_custkey = c.c_custkey
      |  ORDER BY o_totalprice DESC, o_orderkey
      |  LIMIT 2) t
      |WHERE c.c_custkey <= 200
      |ORDER BY c.c_custkey, t.o_orderkey""".stripMargin

  val q100_lateral_join = Q(
    "q100_lateral_join",
    Some(lateralSql),
    (s, d) => {
      Tables.views(s, d, "customer", "orders")
      s.sql(lateralSql)
    })

  /** Exact order statistics per group: interpolated median, discrete 75th
    * percentile (smallest value whose cume_dist ≥ 0.75), and the
    * DETERMINISTIC mode (max count, lexicographic tiebreak — engine mode()
    * functions break ties arbitrarily, so the tie rule is spelled out as
    * an argmax both engines replay identically). One hash agg plus one
    * tiny window over the 6 group rows. */
  private val modeCte =
    """WITH m AS (
      |  SELECT l_linestatus, l_returnflag, count(*) AS c,
      |    ROW_NUMBER() OVER (PARTITION BY l_linestatus
      |      ORDER BY count(*) DESC, l_returnflag) AS rn
      |  FROM lineitem GROUP BY l_linestatus, l_returnflag)""".stripMargin

  val q101_median_mode = Q(
    "q101_median_mode",
    Some(s"""$modeCte,
            |a AS (
            |  SELECT l_linestatus, round(median(l_quantity), 6) AS med_qty,
            |    CAST(quantile_disc(l_extendedprice, 0.75) AS DOUBLE) AS p75_price
            |  FROM lineitem GROUP BY l_linestatus)
            |SELECT a.l_linestatus, a.med_qty, a.p75_price,
            |  m.l_returnflag AS mode_flag, CAST(m.c AS BIGINT) AS mode_n
            |FROM a JOIN m ON a.l_linestatus = m.l_linestatus AND m.rn = 1
            |ORDER BY a.l_linestatus""".stripMargin),
    (s, d) => {
      Tables.views(s, d, "lineitem")
      s.sql(s"""$modeCte,
               |a AS (
               |  SELECT l_linestatus, round(median(l_quantity), 6) AS med_qty,
               |    CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY l_extendedprice)
               |      AS DOUBLE) AS p75_price
               |  FROM lineitem GROUP BY l_linestatus)
               |SELECT a.l_linestatus, a.med_qty, a.p75_price,
               |  m.l_returnflag AS mode_flag, CAST(m.c AS BIGINT) AS mode_n
               |FROM a JOIN m ON a.l_linestatus = m.l_linestatus AND m.rn = 1
               |ORDER BY a.l_linestatus""".stripMargin)
    })

  /** Ratio ranks: dense_rank / percent_rank / cume_dist per nation over
    * supplier balances. The tiebreak column makes every peer group a
    * singleton, so the ratio values are exact small-integer divisions —
    * bit-identical doubles on both engines (rounded anyway for the hash).
    * One window shuffle on s_nationkey. Identical SQL on both engines. */
  private val rankSql =
    """SELECT s_nationkey, s_suppkey,
      |  CAST(dense_rank() OVER w AS BIGINT) AS drk,
      |  round(percent_rank() OVER w, 6) AS prk,
      |  round(cume_dist() OVER w, 6) AS cd
      |FROM supplier
      |WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
      |ORDER BY s_nationkey, s_suppkey""".stripMargin

  val q102_rank_ratios = Q(
    "q102_rank_ratios",
    Some(rankSql),
    (s, d) => {
      Tables.views(s, d, "supplier")
      s.sql(rankSql)
    })

  /** Ordered string aggregation (listagg/group_concat): distinct order
    * statuses per priority, sorted then joined — the ORDER makes the
    * concatenation deterministic (bare listagg output depends on
    * arrival order and is unusable for a hash contract). */
  val q123_string_agg = Q(
    "q123_string_agg",
    Some("""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
            |  string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus)
            |    AS statuses
            |FROM orders
            |GROUP BY o_orderpriority
            |ORDER BY o_orderpriority""".stripMargin),
    (s, d) => Tables.orders(s, d)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        array_join(array_sort(collect_set(col("o_orderstatus"))), ",")
          .as("statuses"))
      .orderBy("o_orderpriority"))

  /** Multi-match regex extraction: every ≥8-char word per document, as
    * count + lexicographic min — regexp_extract_all is the scan-side
    * tokenizer surface (one pass, array out, no explode needed for
    * aggregate views of the matches). */
  val q124_regexp_extract_all = Q(
    "q124_regexp_extract_all",
    Some("""SELECT doc_id,
            |  CAST(len(regexp_extract_all(text, '[a-z]{8,}')) AS BIGINT)
            |    AS n_long,
            |  list_min(regexp_extract_all(text, '[a-z]{8,}')) AS first_long
            |FROM documents
            |ORDER BY doc_id""".stripMargin),
    (s, d) => Tables.documents(s, d)
      .select(col("doc_id"),
        size(expr("regexp_extract_all(text, '[a-z]{8,}', 0)")).cast("long")
          .as("n_long"),
        array_min(expr("regexp_extract_all(text, '[a-z]{8,}', 0)"))
          .as("first_long"))
      .orderBy("doc_id"))

  /** Window navigation family: nth_value (null until the frame holds n
    * rows — the default RANGE frame is shared by both engines), lag with
    * an explicit default, and lead IGNORE NULLS skipping masked rows.
    * Only the IGNORE NULLS placement differs (DuckDB: inside the call;
    * Spark: after it); one window shuffle. */
  private def navSql(leadExpr: String) =
    s"""SELECT s_nationkey, s_suppkey,
       |  nth_value(s_suppkey, 2) OVER w AS second_key,
       |  lag(s_suppkey, 2, -1) OVER w AS lag2_key,
       |  $leadExpr OVER w AS next_mult3
       |FROM supplier
       |WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
       |ORDER BY s_nationkey, s_suppkey""".stripMargin

  private val navCase = "CASE WHEN s_suppkey % 3 = 0 THEN s_suppkey END"

  val q126_window_nav = Q(
    "q126_window_nav",
    Some(navSql(s"lead($navCase IGNORE NULLS)")),
    (s, d) => {
      Tables.views(s, d, "supplier")
      s.sql(navSql(s"lead($navCase) IGNORE NULLS"))
    })

  /** Aggregate FILTER clause — per-group conditional aggregation without
    * CASE scaffolding (and unlike q19's CASE form, FILTER composes with
    * count(DISTINCT)). Identical SQL on both engines; one hash agg. */
  private val filterSql =
    """SELECT l_returnflag,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(count(*) FILTER (WHERE l_quantity > 25) AS BIGINT) AS n_bulk,
      |  CAST(count(DISTINCT l_suppkey) FILTER (WHERE l_discount > 0.05)
      |    AS BIGINT) AS n_disc_supp,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
      |    FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS f_price
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  val q127_agg_filter = Q(
    "q127_agg_filter",
    Some(filterSql),
    (s, d) => {
      Tables.views(s, d, "lineitem")
      s.sql(filterSql)
    })

  private val BloomM = 4096
  private val BloomK = 3
  private val BloomNation = 3L

  /** Bloom-filter semi-join reduction (operators/BloomJoin): the build
    * side's key set folds into a 4096-bit mask, the probe (fact) scan is
    * prefiltered by k=3 mask tests BEFORE the shuffle, and the exact join
    * then removes the bloom's false positives. The final join is forced
    * to shuffle (merge hint) — the scenario where the pattern pays: a
    * non-broadcastable build side whose key set still fits a KB-scale
    * mask, cutting probe shuffle volume by the filter's selectivity with
    * zero false-negative risk. The ORACLE IS THE PLAIN JOIN — the hash
    * match proves the reduction loses and invents nothing. */
  val q132_bloom_join = Q(
    "q132_bloom_join",
    Some("""SELECT s_suppkey, CAST(count(*) AS BIGINT) AS n_items,
            |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
            |FROM lineitem
            |JOIN supplier ON l_suppkey = s_suppkey
            |WHERE s_nationkey = 3
            |GROUP BY s_suppkey
            |ORDER BY s_suppkey""".stripMargin),
    (s, d) => {
      import graft.operators.BloomJoin
      val dim = Tables.supplier(s, d)
        .filter(col("s_nationkey") === BloomNation)
        .select("s_suppkey")
      val mask = BloomJoin.buildMask(dim, "s_suppkey", BloomM, BloomK)
      val fact = BloomJoin.probeFilter(
        Tables.lineitem(s, d).select("l_suppkey", "l_quantity"),
        "l_suppkey", mask, BloomM, BloomK)
      fact.join(dim.hint("merge"), col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_suppkey")
        .agg(count(lit(1)).as("n_items"),
          Q.asDouble(sum(Q.dec(col("l_quantity")))).as("sum_qty"))
        .orderBy("s_suppkey")
    })

  /** ANALYZE-style COLUMN PROFILE: per-column row count, null count,
    * exact NDV, and min/max over a heterogeneous column set (bigint /
    * double / varchar / timestamp) in ONE scan — the statistics pass a
    * catalog or CBO runs before planning. Min/max are projected to a
    * deterministic string representation per type (decimal(18,2) for the
    * money double, DATE for the timestamp) so one uniform report schema
    * hashes identically across engines.
    *
    * Scale shape: two scans of the pruned 4-column read — NDVs in one
    * distinct-only aggregate (the Expand multi-distinct plan, kept
    * HASH-based by excluding non-distinct aggs: mixing them in trips
    * Spark's first()-buffer recombination and sorts the whole x4
    * Expand through a keyed SortAggregate), plain stats in a second
    * expand-free keyless aggregate (string min/max buffers make it a
    * SortAggregate by name, but with no keys it is a sort-free single
    * pass). The single-row result is unpivoted driver-free via
    * stack(). At extreme scale the exact NDVs swap for the mergeable
    * HLL family (q164) — same report shape. */
  val q189_column_profile = Q(
    "q189_column_profile",
    Some("""SELECT * FROM (
           |  SELECT 'l_orderkey' AS column_name,
           |    CAST(count(*) AS BIGINT) AS n_rows,
           |    CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)
           |      AS BIGINT) AS n_nulls,
           |    CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_distinct,
           |    CAST(min(l_orderkey) AS VARCHAR) AS min_repr,
           |    CAST(max(l_orderkey) AS VARCHAR) AS max_repr
           |  FROM lineitem
           |  UNION ALL
           |  SELECT 'l_quantity', CAST(count(*) AS BIGINT),
           |    CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END)
           |      AS BIGINT),
           |    CAST(count(DISTINCT l_quantity) AS BIGINT),
           |    CAST(CAST(min(l_quantity) AS DECIMAL(18,2)) AS VARCHAR),
           |    CAST(CAST(max(l_quantity) AS DECIMAL(18,2)) AS VARCHAR)
           |  FROM lineitem
           |  UNION ALL
           |  SELECT 'l_returnflag', CAST(count(*) AS BIGINT),
           |    CAST(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END)
           |      AS BIGINT),
           |    CAST(count(DISTINCT l_returnflag) AS BIGINT),
           |    min(l_returnflag), max(l_returnflag)
           |  FROM lineitem
           |  UNION ALL
           |  SELECT 'l_shipdate', CAST(count(*) AS BIGINT),
           |    CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
           |      AS BIGINT),
           |    CAST(count(DISTINCT l_shipdate) AS BIGINT),
           |    CAST(CAST(min(l_shipdate) AS DATE) AS VARCHAR),
           |    CAST(CAST(max(l_shipdate) AS DATE) AS VARCHAR)
           |  FROM lineitem)
           |ORDER BY column_name""".stripMargin),
    (s, d) => {
      def nulls(c: String) =
        sum(when(col(c).isNull, 1L).otherwise(0L))
      // The NDVs and the plain stats are SEPARATE aggregates on purpose:
      // one combined agg triggers Spark's mixed-distinct rewrite, whose
      // first()-based recombination downgrades the whole cascade to a
      // KEYED SortAggregate (two full sorts of the x5 Expand - measured
      // 10 s at sf0.1 vs ~2 s split). Distinct-only stays a codegen'd
      // HashAggregate pair; the stats agg never expands (its keyless
      // SortAggregate is sort-free). The crossJoin glues two 1-row
      // frames.
      val li = Tables.lineitem(s, d)
      val nd = li.agg(
        countDistinct(col("l_orderkey")).as("nd_ok"),
        countDistinct(col("l_quantity")).as("nd_qt"),
        countDistinct(col("l_returnflag")).as("nd_rf"),
        countDistinct(col("l_shipdate")).as("nd_sd"))
      val st = li.agg(
        count(lit(1)).as("n_rows"),
        nulls("l_orderkey").as("nu_ok"),
        min(col("l_orderkey")).cast("string").as("mn_ok"),
        max(col("l_orderkey")).cast("string").as("mx_ok"),
        nulls("l_quantity").as("nu_qt"),
        min(col("l_quantity")).cast("decimal(18,2)").cast("string").as("mn_qt"),
        max(col("l_quantity")).cast("decimal(18,2)").cast("string").as("mx_qt"),
        nulls("l_returnflag").as("nu_rf"),
        min(col("l_returnflag")).as("mn_rf"),
        max(col("l_returnflag")).as("mx_rf"),
        nulls("l_shipdate").as("nu_sd"),
        min(col("l_shipdate")).cast("date").cast("string").as("mn_sd"),
        max(col("l_shipdate")).cast("date").cast("string").as("mx_sd"))
      val one = st.crossJoin(nd)
      one.selectExpr(
        """stack(4,
          |  'l_orderkey',  n_rows, nu_ok, nd_ok, mn_ok, mx_ok,
          |  'l_quantity',  n_rows, nu_qt, nd_qt, mn_qt, mx_qt,
          |  'l_returnflag', n_rows, nu_rf, nd_rf, mn_rf, mx_rf,
          |  'l_shipdate',  n_rows, nu_sd, nd_sd, mn_sd, mx_sd)
          |AS (column_name, n_rows, n_nulls, n_distinct, min_repr, max_repr)
          |""".stripMargin)
        .orderBy("column_name")
    })

  private val AsOfTolDays = 7L
  private val AsOfTolUs = AsOfTolDays * 86400000000L

  /** As-of join WITH TOLERANCE (pandas merge_asof's `tolerance`, the
    * staleness cap every feature-store lookup needs): each event takes
    * the latest order at-or-before it, but a match older than the
    * tolerance is DROPPED to null — a stale feature is worse than no
    * feature. Composition, not a new operator: the q24 union-interleave
    * as-of carries (match time, value) as a struct (time leads, so the
    * window's last() still picks the greatest match deterministically),
    * and one scan-side predicate applies the staleness cap in exact
    * microsecond longs. Same one-shuffle plan as q24. */
  val q233_asof_tolerance = Q(
    "q233_asof_tolerance",
    Some(s"""SELECT event_id, user_id,
            |  (SELECT CAST(max(o_orderdate) AS DATE) FROM orders
            |   WHERE o_custkey = user_id AND o_orderdate <= ts
            |     AND o_orderdate >= ts - INTERVAL $AsOfTolDays DAY)
            |    AS recent_order_day
            |FROM events
            |ORDER BY event_id""".stripMargin),
    (s, d) => {
      val ev = Tables.events(s, d).select(
        col("event_id"), col("user_id"),
        expr("timestamp_micros(ts div 1000)").as("ts_us"),
        expr("ts div 1000").as("tus"))
      graft.operators.AsOfJoin.leftAsOf(
          ev, "user_id", "ts_us",
          Tables.orders(s, d), "o_custkey", "o_orderdate",
          struct(
            expr("unix_micros(cast(o_orderdate as timestamp))").as("t"),
            to_date(col("o_orderdate")).as("day")),
          "m")
        .select(col("event_id"), col("user_id"),
          when(col("m").isNotNull &&
            col("tus") - col("m.t") <= AsOfTolUs, col("m.day"))
            .as("recent_order_day"))
        .orderBy("event_id")
    })

  /** Bloom-filter FALSE-POSITIVE-RATE audit — the measurement behind
    * q132's semi-join reduction: every true NON-member key (ground truth
    * from an anti-join) probes the REAL mask `BloomJoin.buildMask`
    * produced, and the measured FPR sits next to the standard
    * (1−e^{−kn/m})^k bound. A hash-family or masking bug shows up as
    * measured ≫ bound; an oversized mask as measured ≈ 0 ≪ bound. The
    * oracle recomputes every bit position from the same md5 place-value
    * device (`hexSpanValSql` ≡ the operator's `conv(substr(md5..)))`),
    * so the filter's exact decisions — not just the count — are what the
    * hash checks. Only key sets and the KB-scale bit mask move. */
  val q235_bloom_fpr = Q(
    "q235_bloom_fpr", {
      def pos(seedExpr: String, keyExpr: String) =
        s"(${hexSpanValSql(s"md5($seedExpr || '|' || CAST($keyExpr AS VARCHAR))", 0, 8)} % $BloomM)"
      Some(s"""WITH members AS (
              |  SELECT DISTINCT s_suppkey AS key FROM supplier
              |  WHERE s_nationkey = $BloomNation),
              |seeds AS (SELECT CAST(i AS VARCHAR) AS s
              |          FROM generate_series(0, ${BloomK - 1}) t(i)),
              |bits AS (
              |  SELECT DISTINCT ${pos("s", "key")} AS b
              |  FROM members CROSS JOIN seeds),
              |probes AS (
              |  SELECT DISTINCT l_suppkey AS key FROM lineitem
              |  WHERE l_suppkey NOT IN (SELECT key FROM members)),
              |hits AS (
              |  SELECT p.key, CAST(count(*) AS BIGINT) AS nhit
              |  FROM probes p CROSS JOIN seeds s
              |  JOIN bits ON bits.b = ${pos("s.s", "p.key")}
              |  GROUP BY p.key),
              |fp AS (SELECT key FROM hits WHERE nhit = $BloomK)
              |SELECT
              |  CAST((SELECT count(*) FROM members) AS BIGINT) AS n_members,
              |  CAST((SELECT count(*) FROM probes) AS BIGINT) AS n_probes,
              |  CAST((SELECT count(*) FROM fp) AS BIGINT) AS n_false_pos,
              |  round(CAST((SELECT count(*) FROM fp) AS DOUBLE)
              |    / (SELECT count(*) FROM probes), 6) AS fpr""".stripMargin)
    },
    (s, d) => {
      import graft.operators.BloomJoin
      val members = Tables.supplier(s, d)
        .filter(col("s_nationkey") === BloomNation)
        .select(col("s_suppkey").as("key")).distinct()
      val mask = BloomJoin.buildMask(members, "key", BloomM, BloomK)
      val probes = Tables.lineitem(s, d)
        .select(col("l_suppkey").as("key")).distinct()
        .join(members, Seq("key"), "left_anti")
        .localCheckpoint(true) // feeds the probe filter AND its own count
      val fp = BloomJoin.probeFilter(probes, "key", mask, BloomM, BloomK)
      members.agg(count(lit(1)).as("n_members"))
        .crossJoin(probes.agg(count(lit(1)).as("n_probes")))
        .crossJoin(fp.agg(count(lit(1)).as("n_false_pos")))
        .select(col("n_members"), col("n_probes"), col("n_false_pos"),
          round(col("n_false_pos").cast("double") / col("n_probes"), 6)
            .as("fpr"))
    })

  /** Per-group top-k WITH TIES — the rank() semantics SELECT TOP ...
    * WITH TIES / FETCH FIRST ... WITH TIES expresses: every row tied
    * with the k-th keeps its place, so the result size is data-dependent
    * (q08's row_number() arbitrarily drops tied rows; this keeps them —
    * the two entries together pin the difference). doc_id appears in the
    * OUTPUT ordering only, never the rank ordering, so tie GROUPS are
    * deterministic even though Spark's WindowGroupLimit pushdown applies
    * to rank() exactly as to row_number(). */
  val q259_topk_with_ties = Q(
    "q259_topk_with_ties",
    Some("""SELECT source, doc_id, n_chars, rnk FROM (
            |  SELECT source, doc_id, n_chars,
            |    CAST(rank() OVER (PARTITION BY source
            |      ORDER BY n_chars DESC) AS BIGINT) AS rnk
            |  FROM documents) t
            |WHERE rnk <= 3 ORDER BY source, rnk, doc_id""".stripMargin),
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy(col("n_chars").desc)
      Tables.documents(s, d)
        .select(col("source"), col("doc_id"), col("n_chars"),
          rank().over(w).cast("long").as("rnk"))
        .filter(col("rnk") <= 3)
        .orderBy("source", "rnk", "doc_id")
    })

  val all: Seq[Q] = Seq(q99_exists_subquery, q100_lateral_join,
    q101_median_mode, q102_rank_ratios, q123_string_agg,
    q124_regexp_extract_all, q126_window_nav, q127_agg_filter,
    q132_bloom_join, q189_column_profile, q233_asof_tolerance,
    q235_bloom_fpr, q259_topk_with_ties)
}
