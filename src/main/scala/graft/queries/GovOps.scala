package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.Q.dec

/** Round-9 governance / lake-operations battery: skyline queries,
  * key discovery, referential-integrity and erasure audits, replica
  * anti-entropy (Merkle-style), column-encoding advice, and scale-safe
  * dense id minting.
  *
  * Shared discipline: anything quadratic runs on a bounded grid or
  * inside a pruned bucket; global ordering never materializes as a
  * single-partition sort over rows (q280's two-phase rank is the
  * explicit alternative); audits move keys and counts, not payloads.
  */
object GovOps {

  /** 2-D skyline (Pareto frontier) of orders — maximize total price,
    * minimize order date ("earliest big orders"): the dominance query
    * whose textbook form is an O(n²) NOT EXISTS self-theta-join. Scale
    * shape is a TWO-PHASE exact skyline: (1) bucket prices ($2000 cents
    * buckets) and take each bucket's min date — a bounded grid; (2) a
    * running min over strictly-higher buckets gives every bucket a
    * dominance threshold (any row at-or-after it is dominated by some
    * strictly-more-expensive row), broadcast back to prune the scan;
    * (3) only in-bucket survivor pairs are compared exactly. Any
    * same-bucket dominator of a survivor is itself a survivor (its date
    * is ≤ and the threshold prunes monotonically), so the in-bucket
    * anti-join over survivors is exact. The oracle replays the brute
    * NOT EXISTS on a deterministic 1/3 key slice (the slice keeps its
    * O(n²) affordable; the Spark side runs the same slice). */
  val q274_pareto_frontier = Q(
    "q274_pareto_frontier",
    Some("""WITH o AS (
           |  SELECT o_orderkey,
           |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           |      AS cents,
           |    CAST(datediff('day', DATE '1970-01-01', o_orderdate)
           |      AS BIGINT) AS order_day
           |  FROM orders WHERE o_orderkey % 3 = 0)
           |SELECT a.o_orderkey, a.cents, a.order_day
           |FROM o a
           |WHERE NOT EXISTS (
           |  SELECT 1 FROM o b
           |  WHERE b.cents >= a.cents AND b.order_day <= a.order_day
           |    AND (b.cents > a.cents OR b.order_day < a.order_day))
           |ORDER BY a.cents DESC, a.o_orderkey""".stripMargin),
    (s, d) => {
      val o = graft.operators.PlanCache.persist(Tables.orders(s, d)
        .filter(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey"),
          (dec(col("o_totalprice")) * 100).cast("long").as("cents"),
          datediff(col("o_orderdate"), lit("1970-01-01")).cast("long")
            .as("order_day"))
        .withColumn("bucket", expr("cents div 200000")))
      // phase 1+2: bucket grid → per-bucket min date → strict-upper
      // running min (the dominance threshold), tiny post-agg window
      val wUp = org.apache.spark.sql.expressions.Window
        .orderBy(col("bucket").desc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val thr = o.groupBy("bucket").agg(min("order_day").as("m"))
        .withColumn("thr", min(col("m")).over(wUp))
        .select(col("bucket"), col("thr"))
      // phase 3: prune, then exact dominance only within a bucket
      val surv = graft.operators.PlanCache.persist(
        o.join(broadcast(thr), Seq("bucket"))
          .filter(col("thr").isNull || col("order_day") < col("thr"))
          .select("bucket", "o_orderkey", "cents", "order_day"))
      val b = surv.select(col("bucket").as("bbucket"),
        col("cents").as("bc"), col("order_day").as("bd"))
      surv.join(b, col("bucket") === col("bbucket") &&
          col("bc") >= col("cents") && col("bd") <= col("order_day") &&
          (col("bc") > col("cents") || col("bd") < col("order_day")),
          "left_anti")
        .select("o_orderkey", "cents", "order_day")
        .orderBy(col("cents").desc, col("o_orderkey"))
    })

  /** Candidate-key discovery over orders: exact NDV per candidate column
    * (and two composites) vs the row count — the primary-key audit every
    * inherited table needs before an upsert/CDC pipeline can key on it.
    * One scan with a multi-count-distinct Expand (the q189 profile
    * plan); composites ride the same agg as '|'-joined strings (no NULL
    * columns here, so the concat is injective on the domain). */
  val q275_candidate_keys = Q(
    "q275_candidate_keys",
    Some("""WITH m AS (
           |  SELECT CAST(count(*) AS BIGINT) AS n,
           |    CAST(count(DISTINCT o_orderkey) AS BIGINT) AS d1,
           |    CAST(count(DISTINCT o_custkey) AS BIGINT) AS d2,
           |    CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS d3,
           |    CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS d4,
           |    CAST(count(DISTINCT datediff('day', DATE '1970-01-01',
           |      o_orderdate)) AS BIGINT) AS d5,
           |    CAST(count(DISTINCT CAST(o_custkey AS VARCHAR) || '|' ||
           |      CAST(datediff('day', DATE '1970-01-01', o_orderdate)
           |        AS VARCHAR)) AS BIGINT) AS d6,
           |    CAST(count(DISTINCT o_orderstatus || '|' || o_orderpriority)
           |      AS BIGINT) AS d7
           |  FROM orders)
           |SELECT col_name, ndv, n AS n_rows,
           |  round(CAST(ndv AS DOUBLE) / n, 6) AS unique_ratio,
           |  CAST(CASE WHEN ndv = n THEN 1 ELSE 0 END AS BIGINT) AS is_key
           |FROM (
           |  SELECT 'o_orderkey' AS col_name, d1 AS ndv, n FROM m
           |  UNION ALL SELECT 'o_custkey', d2, n FROM m
           |  UNION ALL SELECT 'o_orderstatus', d3, n FROM m
           |  UNION ALL SELECT 'o_orderpriority', d4, n FROM m
           |  UNION ALL SELECT 'order_day', d5, n FROM m
           |  UNION ALL SELECT 'o_custkey+order_day', d6, n FROM m
           |  UNION ALL SELECT 'o_orderstatus+o_orderpriority', d7, n FROM m)
           |ORDER BY col_name""".stripMargin),
    (s, d) => {
      val day = datediff(col("o_orderdate"), lit("1970-01-01")).cast("long")
      val m = Tables.orders(s, d).agg(count(lit(1)).as("n"),
        countDistinct(col("o_orderkey")).as("d1"),
        countDistinct(col("o_custkey")).as("d2"),
        countDistinct(col("o_orderstatus")).as("d3"),
        countDistinct(col("o_orderpriority")).as("d4"),
        countDistinct(day).as("d5"),
        countDistinct(concat_ws("|", col("o_custkey"), day)).as("d6"),
        countDistinct(concat_ws("|", col("o_orderstatus"),
          col("o_orderpriority"))).as("d7"))
      val named = Seq("o_orderkey" -> "d1", "o_custkey" -> "d2",
        "o_orderstatus" -> "d3", "o_orderpriority" -> "d4",
        "order_day" -> "d5", "o_custkey+order_day" -> "d6",
        "o_orderstatus+o_orderpriority" -> "d7")
      m.select(explode(array(named.map { case (nm, dc) =>
          struct(lit(nm).as("col_name"), col(dc).as("ndv"), col("n"))
        }: _*)).as("r"))
        .select(col("r.col_name"), col("r.ndv"), col("r.n").as("n_rows"),
          round(col("r.ndv").cast("double") / col("r.n"), 6)
            .as("unique_ratio"),
          when(col("r.ndv") === col("r.n"), 1L).otherwise(0L).as("is_key"))
        .orderBy("col_name")
    })

  private case class FkEdge(name: String, child: String, fk: String,
      parent: String, pk: String)
  private val FkEdges = Seq(
    FkEdge("customer.c_nationkey->nation", "customer", "c_nationkey",
      "nation", "n_nationkey"),
    FkEdge("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
      "orders", "o_orderkey"),
    FkEdge("lineitem.l_partkey->part", "lineitem", "l_partkey",
      "part", "p_partkey"),
    FkEdge("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
      "supplier", "s_suppkey"),
    FkEdge("orders.o_custkey->customer", "orders", "o_custkey",
      "customer", "c_custkey"),
    FkEdge("supplier.s_nationkey->nation", "supplier", "s_nationkey",
      "nation", "n_nationkey"))

  /** Referential-integrity audit across every foreign-key edge of the
    * star schema: child rows whose key has no parent (orphans), as count
    * and distinct-key count — the pre-flight every join-dependent
    * pipeline (and every q04-style broadcast join) silently assumes.
    * Per edge: one LEFT join of the child's key column against the
    * parent's DISTINCT key set (dimension-sized → broadcast; the fact
    * side never moves beyond its own agg). Six 1-row branches union. */
  val q276_fk_orphans = Q(
    "q276_fk_orphans",
    Some(FkEdges.map { e =>
      s"""SELECT '${e.name}' AS edge,
         |  CAST(count(*) AS BIGINT) AS n_child,
         |  CAST(sum(CASE WHEN p.__pk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_orphans,
         |  CAST(count(DISTINCT CASE WHEN p.__pk IS NULL THEN c.${e.fk} END)
         |    AS BIGINT) AS n_orphan_keys,
         |  round(CAST(sum(CASE WHEN p.__pk IS NULL THEN 1 ELSE 0 END)
         |    AS DOUBLE) / count(*), 6) AS orphan_rate
         |FROM ${e.child} c
         |LEFT JOIN (SELECT DISTINCT ${e.pk} AS __pk FROM ${e.parent}) p
         |  ON c.${e.fk} = p.__pk""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY edge")),
    (s, d) => {
      FkEdges.map { e =>
        val parentK = Tables(s, d, e.parent)
          .select(col(e.pk).as("__pk")).distinct()
        Tables(s, d, e.child).select(col(e.fk))
          .join(broadcast(parentK), col(e.fk) === col("__pk"), "left")
          .agg(count(lit(1)).as("n_child"),
            sum(when(col("__pk").isNull, 1L).otherwise(0L)).as("n_orphans"),
            countDistinct(when(col("__pk").isNull, col(e.fk)))
              .as("n_orphan_keys"))
          .select(lit(e.name).as("edge"), col("n_child"), col("n_orphans"),
            col("n_orphan_keys"),
            round(col("n_orphans").cast("double") / col("n_child"), 6)
              .as("orphan_rate"))
      }.reduce(_.unionAll(_)).orderBy("edge")
    })

  /** GDPR-style erasure cascade: a deterministic tombstone set (every
    * 97th customer key) propagated through the FK graph — per table, how
    * many rows the erasure touches. The cascade is two semi-joins
    * (orders on the tombstoned customers, lineitem on the affected
    * orders); tombstone and affected-order key sets are
    * erasure-request-sized, so they broadcast and the fact tables are
    * each read once. The count report is what a deletion-SLA dashboard
    * ships; the same semi-join shape with a NOT turns into the actual
    * retention delete. */
  val q277_erasure_cascade = Q(
    "q277_erasure_cascade",
    Some("""WITH tomb AS (
           |  SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0),
           |eo AS (
           |  SELECT o_orderkey FROM orders
           |  WHERE o_custkey IN (SELECT c_custkey FROM tomb)),
           |r AS (
           |  SELECT 'customer' AS table_name,
           |    (SELECT CAST(count(*) AS BIGINT) FROM customer) AS n_rows,
           |    (SELECT CAST(count(*) AS BIGINT) FROM tomb) AS n_erased
           |  UNION ALL
           |  SELECT 'orders',
           |    (SELECT CAST(count(*) AS BIGINT) FROM orders),
           |    (SELECT CAST(count(*) AS BIGINT) FROM eo)
           |  UNION ALL
           |  SELECT 'lineitem',
           |    (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
           |    (SELECT CAST(count(*) AS BIGINT) FROM lineitem
           |     WHERE l_orderkey IN (SELECT o_orderkey FROM eo)))
           |SELECT table_name, n_rows, n_erased,
           |  round(CAST(n_erased AS DOUBLE) / n_rows, 6) AS erased_pct
           |FROM r ORDER BY table_name""".stripMargin),
    (s, d) => {
      val tomb = Tables.customer(s, d)
        .filter(col("c_custkey") % 97 === 0).select("c_custkey")
      val eo = Tables.orders(s, d)
        .join(broadcast(tomb), col("o_custkey") === col("c_custkey"),
          "left_semi")
        .select("o_orderkey")
      def row(name: String, total: DataFrame, erased: DataFrame): DataFrame =
        total.agg(count(lit(1)).as("n_rows"))
          .crossJoin(erased.agg(count(lit(1)).as("n_erased")))
          .select(lit(name).as("table_name"), col("n_rows"), col("n_erased"),
            round(col("n_erased").cast("double") / col("n_rows"), 6)
              .as("erased_pct"))
      val li = Tables.lineitem(s, d)
      val liErased = li.join(broadcast(eo),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      row("customer", Tables.customer(s, d), tomb)
        .unionAll(row("orders", Tables.orders(s, d), eo))
        .unionAll(row("lineitem", li, liErased))
        .orderBy("table_name")
    })

  /** Merkle-style replica anti-entropy: two lineitem "replicas" (B is A
    * with a deterministic corruption — +1 quantity on every orderkey
    * ≡ 7 mod 1000), compared bucket-first: per-bucket checksums (exact
    * DECIMAL(38) sums of a 13-hex-digit digest value) disagree only
    * where rows actually differ, so the row-level drill re-reads ONLY
    * the disagreeing buckets (a bucket-keyed semi join) — at 100 TB the
    * repair pass touches diff-bucket data, not the table. This is q119's
    * table checksum extended into the localizing hierarchy an actual
    * repair needs. */
  val q278_merkle_diff = Q(
    "q278_merkle_diff", {
      def side(corrupt: Boolean) = {
        val qc =
          if (corrupt)
            """CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)
              |      + CASE WHEN l_orderkey % 1000 = 7 THEN 100 ELSE 0 END"""
              .stripMargin
          else "CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)"
        s"""SELECT l_orderkey, l_linenumber, l_orderkey % 256 AS bucket,
           |    md5(CAST(l_orderkey AS VARCHAR) || '|' ||
           |        CAST(l_linenumber AS VARCHAR) || '|' ||
           |        CAST($qc AS VARCHAR)) AS dg
           |  FROM lineitem""".stripMargin
      }
      import graft.functions.TextFunctions.hexSpanValSql
      val dv = hexSpanValSql("dg", 0, 13)
      Some(s"""WITH a AS (${side(false)}),
              |b AS (${side(true)}),
              |av AS (SELECT l_orderkey, l_linenumber, bucket, $dv AS v FROM a),
              |bv AS (SELECT l_orderkey, l_linenumber, bucket, $dv AS v FROM b),
              |ac AS (SELECT bucket, sum(CAST(v AS DECIMAL(38,0))) AS cks
              |       FROM av GROUP BY bucket),
              |bc AS (SELECT bucket, sum(CAST(v AS DECIMAL(38,0))) AS cks
              |       FROM bv GROUP BY bucket),
              |diff AS (
              |  SELECT ac.bucket FROM ac JOIN bc ON ac.bucket = bc.bucket
              |  WHERE ac.cks <> bc.cks),
              |ak AS (
              |  SELECT bucket, l_orderkey, l_linenumber,
              |    sum(CAST(v AS DECIMAL(38,0))) AS kv
              |  FROM av WHERE bucket IN (SELECT bucket FROM diff)
              |  GROUP BY bucket, l_orderkey, l_linenumber),
              |bk AS (
              |  SELECT bucket, l_orderkey, l_linenumber,
              |    sum(CAST(v AS DECIMAL(38,0))) AS kv
              |  FROM bv WHERE bucket IN (SELECT bucket FROM diff)
              |  GROUP BY bucket, l_orderkey, l_linenumber),
              |drill AS (
              |  SELECT CAST(count(*) AS BIGINT) AS n_keys_checked,
              |    CAST(sum(CASE WHEN ak.kv <> bk.kv THEN 1 ELSE 0 END)
              |      AS BIGINT) AS n_keys_diff
              |  FROM ak JOIN bk ON ak.l_orderkey = bk.l_orderkey
              |    AND ak.l_linenumber = bk.l_linenumber)
              |SELECT
              |  (SELECT CAST(count(*) AS BIGINT) FROM ac) AS n_buckets,
              |  (SELECT CAST(count(*) AS BIGINT) FROM diff) AS n_buckets_diff,
              |  n_keys_checked, n_keys_diff
              |FROM drill""".stripMargin)
    },
    (s, d) => {
      import graft.functions.TextFunctions.hexSpanValSql
      // Both replicas' digests ride ONE lineitem scan: replica B is
      // derived from A here, so computing v_a and v_b side by side
      // halves the table reads (and the per-row digest passes feed one
      // shared projection) vs the naive per-replica formulation, which
      // benched 4.4 s isolated at sf0.1. With physically separate
      // replicas each side contributes its own scan + bucket agg; the
      // comparison and drill shapes below are unchanged.
      val qa = (dec(col("l_quantity")) * 100).cast("long")
      val qb = qa + when(col("l_orderkey") % 1000 === 7, 100L).otherwise(0L)
      def dig(qc: org.apache.spark.sql.Column) =
        md5(concat_ws("|", col("l_orderkey"), col("l_linenumber"), qc))
      // replica B's digest differs from A's ONLY on the corrupt keys
      // (l_orderkey % 1000 = 7), so B's md5 runs on ~0.1% of rows and
      // every other row REUSES A's digest (the when(...) with no
      // otherwise is NULL off the corrupt branch; coalesce falls back to
      // __dga) — md5 dominates this entry's cost and this nearly halves
      // the digest work (VERDICT r9 #4). Conditional subexpression
      // elimination keeps dig(qb) unevaluated off-branch; with
      // physically separate replicas each side hashes its own rows.
      // spread by the bucket's own key before the digest projection: the
      // md5 pass is this entry's dominant cost and a one-file scan would
      // hash all 600k rows on one core (r16, scale-gated)
      val both = graft.operators.PlanCache.persist(
        graft.operators.Spread.byKey(Tables.lineitem(s, d), "l_orderkey")
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_orderkey") % 256).as("bucket"),
          dig(qa).as("__dga"),
          when(col("l_orderkey") % 1000 === 7, dig(qb)).as("__dgbC"))
        .select(col("l_orderkey"), col("l_linenumber"), col("bucket"),
          // native span walk (HexSpanVal, macro-parity-tested): the SQL
          // macro costs 13 instr∘substr exprs per span per row — 26/row
          // here, the entry's second-largest term after the md5 itself
          graft.functions.TextFunctions.hexSpanVal(col("__dga"), 0, 13)
            .as("v_a"),
          graft.functions.TextFunctions.hexSpanVal(
            coalesce(col("__dgbC"), col("__dga")), 0, 13).as("v_b")))
      // one bucket agg carries BOTH checksums; disagreement is a filter,
      // not a join
      val cks = both.groupBy("bucket")
        .agg(sum(col("v_a").cast("decimal(38,0)")).as("cks_a"),
          sum(col("v_b").cast("decimal(38,0)")).as("cks_b"))
      val diff = cks.filter(col("cks_a") =!= col("cks_b")).select("bucket")
      // (l_orderkey, l_linenumber) is NOT unique in the testdata, so the
      // drill compares per-key AGGREGATED checksums (exact decimal sums)
      // instead of joining raw rows — a raw-key join would m×m-expand
      // duplicate keys and count cross-matches as phantom diffs.
      val drill = both.join(broadcast(diff), Seq("bucket"), "left_semi")
        .groupBy("l_orderkey", "l_linenumber")
        .agg(sum(col("v_a").cast("decimal(38,0)")).as("kv_a"),
          sum(col("v_b").cast("decimal(38,0)")).as("kv_b"))
        .agg(count(lit(1)).as("n_keys_checked"),
          sum(when(col("kv_a") =!= col("kv_b"), 1L).otherwise(0L))
            .as("n_keys_diff"))
      val nb = cks.agg(count(lit(1)).as("n_buckets"))
      val nd = diff.agg(count(lit(1)).as("n_buckets_diff"))
      broadcast(nb).crossJoin(broadcast(nd)).crossJoin(drill)
        .select("n_buckets", "n_buckets_diff", "n_keys_checked",
          "n_keys_diff")
    })

  private val EncCols = Seq("l_returnflag", "l_linestatus", "l_suppkey")

  /** Column-encoding advisor: per column, exact NDV and the average
    * run length in the table's natural (orderkey, linenumber) order —
    * the two statistics that decide dictionary vs RLE vs plain parquet
    * encoding (the decision a lake compaction job applies file by
    * file). Runs are counted inside order-key partitions (a keyed
    * window, never a global sort); rule: NDV ≤ 64 → dict, else mean
    * run ≥ 2 → RLE, else plain. One scan per audited column. */
  val q279_encoding_advisor = Q(
    "q279_encoding_advisor",
    Some(EncCols.map { c =>
      s"""SELECT '$c' AS col_name, n_rows, ndv, n_runs,
         |  round(CAST(n_rows AS DOUBLE) / n_runs, 6) AS avg_run_len,
         |  CASE WHEN ndv <= 64 THEN 'dict'
         |       WHEN n_rows >= 2 * n_runs THEN 'rle'
         |       ELSE 'plain' END AS advice
         |FROM (
         |  SELECT CAST(count(*) AS BIGINT) AS n_rows,
         |    CAST(count(DISTINCT v) AS BIGINT) AS ndv,
         |    CAST(sum(CASE WHEN pv IS NULL OR v <> pv THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_runs
         |  FROM (
         |    SELECT CAST($c AS VARCHAR) AS v,
         |      lag(CAST($c AS VARCHAR)) OVER (PARTITION BY l_orderkey
         |        ORDER BY l_linenumber, CAST($c AS VARCHAR)) AS pv
         |    FROM lineitem))""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")),
    (s, d) => {
      // (l_orderkey, l_linenumber) is NOT unique in the testdata, so the
      // in-partition order adds the value itself as tiebreak: rows tied
      // on linenumber sort by value (deterministic), and equal values'
      // relative order cannot change the run count.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("l_orderkey").orderBy(col("l_linenumber"), col("v"))
      EncCols.map { c =>
        Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_linenumber"),
            col(c).cast("string").as("v"))
          .withColumn("pv", lag(col("v"), 1).over(w))
          .agg(count(lit(1)).as("n_rows"),
            countDistinct(col("v")).as("ndv"),
            sum(when(col("pv").isNull || col("v") =!= col("pv"), 1L)
              .otherwise(0L)).as("n_runs"))
          .select(lit(c).as("col_name"), col("n_rows"), col("ndv"),
            col("n_runs"),
            round(col("n_rows").cast("double") / col("n_runs"), 6)
              .as("avg_run_len"),
            when(col("ndv") <= 64, "dict")
              .when(col("n_rows") >= lit(2) * col("n_runs"), "rle")
              .otherwise("plain").as("advice"))
      }.reduce(_.unionAll(_)).orderBy("col_name")
    })

  /** Scale-safe dense id minting: assign documents contiguous ids
    * 1..N in a deterministic global order (md5 of the natural key)
    * WITHOUT the classic global-window row_number() — which plans as a
    * single-partition sort of the whole table and is the canonical
    * scale-killer this entry exists to replace. Two-phase rank instead:
    * the md5's leading byte buckets rows into 256 hash-ordered ranges;
    * per-bucket counts (one 256-row agg) prefix-sum into bucket offsets
    * on the post-agg grid; each row's id = its bucket's offset + its
    * rank WITHIN the bucket (a bucket-keyed window). Because the bucket
    * value IS the md5 prefix, (bucket, md5) order equals global md5
    * order, so the result is bit-identical to the oracle's global
    * row_number. */
  val q280_id_minting = Q(
    "q280_id_minting",
    Some("""SELECT doc_id,
           |  CAST(row_number() OVER (
           |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
           |    AS new_id
           |FROM documents
           |ORDER BY doc_id""".stripMargin),
    (s, d) => {
      import graft.functions.TextFunctions.hexSpanValSql
      val docs = Tables.documents(s, d).select(col("doc_id"))
        .withColumn("__h", md5(col("doc_id").cast("string")))
        .withColumn("bucket", expr(hexSpanValSql("__h", 0, 2)))
      val wOff = org.apache.spark.sql.expressions.Window
        .orderBy("bucket")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val offsets = docs.groupBy("bucket").agg(count(lit(1)).as("c"))
        .withColumn("off", coalesce(sum(col("c")).over(wOff), lit(0L)))
        .select("bucket", "off")
      val wIn = org.apache.spark.sql.expressions.Window
        .partitionBy("bucket").orderBy(col("__h"), col("doc_id"))
      docs.join(broadcast(offsets), Seq("bucket"))
        .withColumn("new_id",
          (col("off") + row_number().over(wIn)).cast("long"))
        .select("doc_id", "new_id")
        .orderBy("doc_id")
    })

  /** Differential-privacy release planner (privacy family #4 after
    * q156/q257/q306): for each (lang, source) cell of a counts release
    * under ε = 1.0 split across 3 releases (Laplace scale b = 3 for
    * sensitivity-1 counts — shared literals, no noise is drawn, the
    * PLAN is the deterministic artifact), the relative noise b/count
    * and the suppress decision (count < 10·b ⇒ expected |noise| swamps
    * the value). One corpus agg onto the release grid; the flag is the
    * "publish, coarsen, or suppress" decision a data-governance release
    * pipeline applies before any DP mechanism runs. */
  val q324_dp_release_plan = Q(
    "q324_dp_release_plan",
    Some("""WITH g AS (
           |  SELECT lang, source, CAST(count(*) AS BIGINT) AS c
           |  FROM documents GROUP BY 1, 2)
           |SELECT lang, source, c,
           |  CAST(3.0 AS DOUBLE) AS laplace_b,
           |  round(3.0 / c, 6) AS rel_noise,
           |  CASE WHEN c < 30 THEN 1 ELSE 0 END AS suppress
           |FROM g ORDER BY lang, source""".stripMargin),
    (s, d) =>
      Tables.documents(s, d)
        .groupBy("lang", "source").agg(count(lit(1)).as("c"))
        .select(col("lang"), col("source"), col("c"),
          lit(3.0).as("laplace_b"),
          round(lit(3.0) / col("c"), 6).as("rel_noise"),
          when(col("c") < 30, 1).otherwise(0).as("suppress"))
        .orderBy("lang", "source"))

  /** Exponential-mechanism MEDIAN release plan (privacy family #5
    * after q156/q257/q306/q324): the mechanism McSherry–Talwar defined
    * for non-numeric/order-statistic queries, in q324's "the PLAN is
    * the deterministic artifact" style — no noise is drawn. Utility of
    * candidate v is u(v) = −|2·cum(v) − n| (rank distance to the
    * median, sensitivity 1, kept in exact integers by doubling); under
    * ε = 1.0 each candidate's selection weight is ∝ exp(ε·u/2), so the
    * report carries the LOG-weight gap ε·(u−u*)/2 of the top-5
    * candidates — exp-free, engine-exact — telling the release owner
    * how concentrated the mechanism is around the true median (a wide
    * near-tie set = a safe, uninformative release; one dominant
    * candidate = the release basically publishes the median).
    *
    * Scale shape: one n_chars-grid hash agg; the cumulative window
    * orders the bounded grid (q253/q264 device); top-5 by TakeOrdered. */
  val q435_exp_mech_median = Q(
    "q435_exp_mech_median",
    Some("""WITH h AS (
           |  SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS c
           |  FROM documents GROUP BY 1),
           |ch AS (
           |  SELECT v,
           |    CAST(sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
           |      AS BIGINT) AS cum,
           |    CAST(sum(c) OVER () AS BIGINT) AS n
           |  FROM h),
           |u AS (SELECT v, -abs(2 * cum - n) AS util FROM ch),
           |best AS (SELECT max(util) AS ustar FROM u)
           |SELECT v AS candidate, CAST(util AS BIGINT) AS utility,
           |  round(0.5 * (util - ustar), 6) AS log_weight_gap,
           |  CASE WHEN util = ustar THEN 1 ELSE 0 END AS is_argmax
           |FROM u CROSS JOIN best
           |ORDER BY utility DESC, candidate
           |LIMIT 5""".stripMargin),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val h = Tables.documents(s, d)
        .groupBy(col("n_chars").as("v")).agg(count(lit(1)).as("c"))
      val wcum = Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wall = Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val u = h.select(col("v"),
          sum("c").over(wcum).cast("long").as("cum"),
          sum("c").over(wall).cast("long").as("n"))
        .select(col("v"), (-abs(lit(2) * col("cum") - col("n"))).as("util"))
      val best = u.agg(max("util").as("ustar"))
      u.crossJoin(broadcast(best))
        .select(col("v").as("candidate"),
          col("util").cast("long").as("utility"),
          round(lit(0.5) * (col("util") - col("ustar")), 6)
            .as("log_weight_gap"),
          when(col("util") === col("ustar"), 1).otherwise(0).as("is_argmax"))
        .orderBy(col("utility").desc, col("candidate"))
        .limit(5)
    })

  val all: Seq[Q] = Seq(q274_pareto_frontier, q275_candidate_keys,
    q276_fk_orphans, q277_erasure_cascade, q278_merkle_diff,
    q279_encoding_advisor, q280_id_minting, q324_dp_release_plan,
    q435_exp_mech_median)
}
