package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.TextFunctions

/** Round-11 distributed-summary additions: the top-k merge audit and
  * the fixed-grid quantile sketch audit — both "does the distributed
  * shortcut stay inside its error bound" checks, each proved against
  * the exact answer on the same data.
  */
object DataOps7 {

  private val ShardN = 8
  private val TopPerShard = 25
  private val GlobalTop = 10

  /** Distributed TOP-K MERGE audit: 8 arrival shards (doc_id mod 8)
    * each keep only their local top-25 terms (count desc, term); the
    * coordinator merges by summing the surviving counts — the standard
    * two-level top-k every distributed engine runs. For each of the
    * exact global top-10 terms: the merged (possibly under-counted)
    * count, how many shards' summaries it survived in, and the
    * THEOREM check — the undercount can never exceed the sum of the
    * 25th-place counts of the shards that dropped it (a term absent
    * from a shard's top-25 contributed less there than that shard's
    * threshold). `bound_holds` = 1 on every row is the distributed
    * correctness contract.
    *
    * Scale shape: one (shard, term) hash agg; the per-shard top-25 is
    * a shard-PARTITIONED rank that compiles to WindowGroupLimit
    * (partial top-25 ahead of the shuffle — the q149 pin); everything
    * after runs on ≤ 8·25 summary rows + a 10-row exact top list. */
  val q426_sharded_topk_error = Q(
    "q426_sharded_topk_error",
    Some(s"""WITH tok AS (
            |  SELECT doc_id % $ShardN AS shard,
            |    unnest(string_split(text, ' ')) AS term
            |  FROM documents),
            |tc AS (
            |  SELECT shard, term, CAST(count(*) AS BIGINT) AS c
            |  FROM tok GROUP BY 1, 2),
            |surv AS (
            |  SELECT shard, term, c FROM (
            |    SELECT shard, term, c, ROW_NUMBER() OVER (
            |      PARTITION BY shard ORDER BY c DESC, term) AS rn
            |    FROM tc) r WHERE rn <= $TopPerShard),
            |kth AS (
            |  SELECT shard, CAST(min(c) AS BIGINT) AS kc FROM surv
            |  GROUP BY shard),
            |ktot AS (SELECT CAST(sum(kc) AS BIGINT) AS kt FROM kth),
            |exact AS (
            |  SELECT term, CAST(sum(c) AS BIGINT) AS exact_c
            |  FROM tc GROUP BY term
            |  ORDER BY exact_c DESC, term LIMIT $GlobalTop),
            |m AS (
            |  SELECT e.term, e.exact_c,
            |    CAST(coalesce(sum(s.c), 0) AS BIGINT) AS merged_c,
            |    CAST(count(s.shard) AS BIGINT) AS n_shards_present,
            |    CAST(coalesce(sum(k.kc), 0) AS BIGINT) AS kth_present
            |  FROM exact e
            |  LEFT JOIN surv s ON s.term = e.term
            |  LEFT JOIN kth k ON k.shard = s.shard
            |  GROUP BY e.term, e.exact_c)
            |SELECT term, exact_c, merged_c,
            |  exact_c - merged_c AS undercount, n_shards_present,
            |  kt - kth_present AS missed_bound,
            |  CASE WHEN exact_c - merged_c <= kt - kth_present
            |    THEN 1 ELSE 0 END AS bound_holds
            |FROM m CROSS JOIN ktot
            |ORDER BY exact_c DESC, term""".stripMargin),
    (s, d) => {
      val tc = graft.operators.PlanCache.persist(Tables.documents(s, d)
        .select((col("doc_id") % ShardN).as("shard"),
          explode(TextFunctions.tokens(col("text"))).as("term"))
        .groupBy("shard", "term").agg(count(lit(1)).as("c")))
      val wTop = Window.partitionBy("shard")
        .orderBy(col("c").desc, col("term"))
      val surv = tc.withColumn("rn", row_number().over(wTop))
        .filter(col("rn") <= TopPerShard).drop("rn")
      val kth = surv.groupBy("shard").agg(min("c").cast("long").as("kc"))
      val ktot = kth.agg(sum("kc").cast("long").as("kt"))
      val exact = tc.groupBy("term").agg(sum("c").cast("long").as("exact_c"))
        .orderBy(col("exact_c").desc, col("term")).limit(GlobalTop)
      val m = exact
        .join(broadcast(surv.join(broadcast(kth), "shard")),
          Seq("term"), "left")
        .groupBy("term", "exact_c")
        .agg(coalesce(sum("c"), lit(0L)).cast("long").as("merged_c"),
          count(col("shard")).as("n_shards_present"),
          coalesce(sum("kc"), lit(0L)).cast("long").as("kth_present"))
      m.crossJoin(broadcast(ktot))
        .select(col("term"), col("exact_c"), col("merged_c"),
          (col("exact_c") - col("merged_c")).as("undercount"),
          col("n_shards_present"),
          (col("kt") - col("kth_present")).as("missed_bound"),
          when(col("exact_c") - col("merged_c") <=
            col("kt") - col("kth_present"), 1).otherwise(0)
            .as("bound_holds"))
        .orderBy(col("exact_c").desc, col("term"))
    })

  private val SketchBins = 256
  private val SketchBinW = 2.5 // covers value ∈ [0, 640)

  /** Fixed-grid quantile SKETCH audit: a 256-bin equi-width histogram
    * (the poor man's t-digest — constant-size, mergeable, one pass) vs
    * the exact 2-decimal order statistics, at p50/p90/p99/p999. The
    * sketch answers with the covering bin's UPPER edge, so its error is
    * bounded by the bin width; `within_bound` = 1 on every row is the
    * sketch's correctness contract PROVIDED the data fits the grid:
    * values ≥ ${SketchBins} × ${SketchBinW} = 640 clamp into the
    * overflow bin 255 and the bound claim does not cover them (both
    * engines clamp identically, so the oracle never diverges — only the
    * bound interpretation weakens). The generated events.value lies in
    * [0, 100], far inside the grid; a production deployment re-derives
    * bin width from a first-pass min/max, and `abs_err` is the actual price
    * paid at each tail — the number that decides whether 256 bins
    * suffice before a pipeline swaps in a real t-digest.
    *
    * Scale shape: two independent hash aggs (256-cell sketch; exact
    * 2-decimal value grid); order-statistic selection by cumulative
    * windows over each bounded grid (q358 device), never rows. */
  val q427_sketch_quantile_error = Q(
    "q427_sketch_quantile_error",
    Some(s"""WITH v AS (
            |  SELECT CAST(value AS DECIMAL(18,2)) AS val,
            |    CAST(count(*) AS BIGINT) AS c
            |  FROM events GROUP BY 1),
            |cv AS (
            |  SELECT val,
            |    CAST(sum(c) OVER (ORDER BY val ROWS UNBOUNDED PRECEDING)
            |      AS BIGINT) AS cum,
            |    CAST(sum(c) OVER () AS BIGINT) AS n
            |  FROM v),
            |sk AS (
            |  SELECT LEAST(CAST(FLOOR(value / $SketchBinW) AS BIGINT),
            |      ${SketchBins - 1}) AS bin,
            |    CAST(count(*) AS BIGINT) AS c
            |  FROM events GROUP BY 1),
            |csk AS (
            |  SELECT bin,
            |    CAST(sum(c) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)
            |      AS BIGINT) AS cum,
            |    CAST(sum(c) OVER () AS BIGINT) AS n
            |  FROM sk),
            |t AS (
            |  SELECT CAST(unnest([500, 900, 990, 999]) AS BIGINT) AS pm),
            |ex AS (
            |  SELECT t.pm,
            |    CAST(min(CASE WHEN 1000 * cv.cum >= t.pm * cv.n
            |      THEN cv.val END) AS DOUBLE) AS exact_q
            |  FROM t CROSS JOIN cv GROUP BY t.pm),
            |es AS (
            |  SELECT t.pm,
            |    (min(CASE WHEN 1000 * csk.cum >= t.pm * csk.n
            |      THEN csk.bin END) + 1) * $SketchBinW AS sketch_q
            |  FROM t CROSS JOIN csk GROUP BY t.pm)
            |SELECT ex.pm AS permille, ex.exact_q, es.sketch_q,
            |  round(abs(es.sketch_q - ex.exact_q), 6) AS abs_err,
            |  CAST($SketchBinW AS DOUBLE) AS err_bound,
            |  CASE WHEN abs(es.sketch_q - ex.exact_q) <= $SketchBinW
            |    THEN 1 ELSE 0 END AS within_bound
            |FROM ex JOIN es ON es.pm = ex.pm
            |ORDER BY permille""".stripMargin),
    (s, d) => {
      val ev = Tables.events(s, d)
      val v = ev.groupBy(Q.dec(col("value")).as("val"))
        .agg(count(lit(1)).as("c"))
      val wv = Window.orderBy("val")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wva = Window.orderBy("val")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val cv = v.select(col("val"),
        sum("c").over(wv).cast("long").as("cum"),
        sum("c").over(wva).cast("long").as("n"))
      val sk = ev.groupBy(least(floor(col("value") / SketchBinW)
          .cast("long"), lit(SketchBins - 1L)).as("bin"))
        .agg(count(lit(1)).as("c"))
      val wb = Window.orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wba = Window.orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val csk = sk.select(col("bin"),
        sum("c").over(wb).cast("long").as("cum"),
        sum("c").over(wba).cast("long").as("n"))
      val t = { import s.implicits._; Seq(500L, 900L, 990L, 999L).toDF("pm") }
      val ex = t.crossJoin(cv).groupBy("pm")
        .agg(min(when(lit(1000) * col("cum") >= col("pm") * col("n"),
          col("val"))).cast("double").as("exact_q"))
      val es = t.crossJoin(csk).groupBy("pm")
        .agg(((min(when(lit(1000) * col("cum") >= col("pm") * col("n"),
          col("bin"))) + 1) * SketchBinW).as("sketch_q"))
      ex.join(es, "pm")
        .select(col("pm").as("permille"), col("exact_q"), col("sketch_q"),
          round(abs(col("sketch_q") - col("exact_q")), 6).as("abs_err"),
          lit(SketchBinW).as("err_bound"),
          when(abs(col("sketch_q") - col("exact_q")) <= SketchBinW, 1)
            .otherwise(0).as("within_bound"))
        .orderBy("permille")
    })

  /** TIME TRAVEL (`VERSION AS OF` — TableCatalog.loadTable(ident,
    * version), the DSv2 contract behind every lake format's snapshot
    * reads): the file-backed store retains each mutating commit's
    * predecessor (files leave the manifest, not the disk), so one query
    * reads the SAME table at three versions — post-seed (v2),
    * post-DELETE (v3), and current post-UPDATE (v4) — and the deltas
    * between snapshots are exactly the DML statements between them.
    * The oracle replays all three states from `part`. At 100 TB this
    * is reproducibility infrastructure: training-data audits pin a
    * snapshot version, not "whatever the table says today".
    * FileLakeSpec pins the retention mechanics (files on disk until
    * VACUUM, snapshot schema binding by column id). */
  val q472_time_travel = Q(
    "q472_time_travel",
    Some("""WITH t AS (
           |  SELECT p_partkey, p_brand,
           |    CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           |      AS cents
           |  FROM part),
           |v3 AS (SELECT * FROM t WHERE NOT (cents % 3 = 0)),
           |v4 AS (
           |  SELECT p_partkey, p_brand,
           |    CASE WHEN p_brand = 'Brand#11' THEN cents + 5 ELSE cents END
           |      AS cents
           |  FROM v3),
           |states AS (
           |  SELECT 'v2_seed' AS snap, CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(cents) AS BIGINT) AS sum_cents FROM t
           |  UNION ALL
           |  SELECT 'v3_deleted', CAST(count(*) AS BIGINT),
           |    CAST(sum(cents) AS BIGINT) FROM v3
           |  UNION ALL
           |  SELECT 'v4_current', CAST(count(*) AS BIGINT),
           |    CAST(sum(cents) AS BIGINT) FROM v4)
           |SELECT snap, n, sum_cents FROM states ORDER BY snap""".stripMargin),
    (s, d) => {
      val tbl = "graftlake.ns.q472_part"
      s.sql(s"DROP TABLE IF EXISTS $tbl")
      s.sql(s"CREATE TABLE $tbl (p_partkey BIGINT, p_brand STRING, " +
        "cents BIGINT) TBLPROPERTIES('graft.storage'='files', " +
        "'graft.partitioncol'='p_brand')")
      graft.Tables.part(s, d)
        .select(col("p_partkey").cast("long").as("p_partkey"),
          col("p_brand"),
          (col("p_retailprice").cast("decimal(18,2)") * 100).cast("long")
            .as("cents"))
        .writeTo(tbl).append()                                       // v2
      s.sql(s"DELETE FROM $tbl WHERE cents % 3 = 0")                 // v3
      s.sql(s"UPDATE $tbl SET cents = cents + 5 " +
        "WHERE p_brand = 'Brand#11'")                                // v4
      def state(v: Int, label: String) =
        s.sql(s"SELECT '$label' AS snap, CAST(count(*) AS BIGINT) AS n, " +
          s"CAST(sum(cents) AS BIGINT) AS sum_cents " +
          s"FROM $tbl VERSION AS OF $v")
      state(2, "v2_seed")
        .unionAll(state(3, "v3_deleted"))
        .unionAll(state(4, "v4_current"))
        .orderBy("snap")
    })

  /** LAKE COMPACTION through a V2 PROCEDURE (`CALL graftlake.system
    * .compact(...)` — ProcedureCatalog, the maintenance surface Iceberg
    * ships rewrite_data_files on): three appends leave every market
    * segment with multiple small files; the procedure bin-packs each
    * multi-file group with ONE DISTRIBUTED TASK PER GROUP (executor-side
    * parquet read+write, driver commits one manifest swap retaining the
    * pre-compaction snapshot), and afterwards the invariant
    * `files_after == distinct groups` holds by construction. Contents
    * are proven row-identical by the oracle aggregate; `compact_ok`
    * pins the file-count invariant inside the result. Small-file
    * compaction is THE standing maintenance job of a streaming lake —
    * a 100 TB table ingesting micro-batches decays into millions of
    * small files without it. */
  val q473_lake_compaction = Q(
    "q473_lake_compaction",
    Some("""WITH t AS (
           |  SELECT c_custkey, c_mktsegment,
           |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
           |      AS cents
           |  FROM customer)
           |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
           |  CAST(sum(cents) AS BIGINT) AS sum_cents,
           |  TRUE AS compact_ok
           |FROM t GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),
    (s, d) => {
      val tbl = "graftlake.ns.q473_customer"
      s.sql(s"DROP TABLE IF EXISTS $tbl")
      s.sql(s"CREATE TABLE $tbl (c_custkey BIGINT, c_mktsegment STRING, " +
        "cents BIGINT) TBLPROPERTIES('graft.storage'='files', " +
        "'graft.partitioncol'='c_mktsegment')")
      val cust = graft.Tables.customer(s, d)
        .select(col("c_custkey").cast("long").as("c_custkey"),
          col("c_mktsegment"),
          (col("c_acctbal").cast("decimal(18,2)") * 100).cast("long")
            .as("cents"))
      // three appends — each lands its own files per segment
      for (i <- 0 until 3)
        cust.filter(col("c_custkey") % 3 === i).writeTo(tbl).append()
      val res = s.sql(s"CALL graftlake.system.compact('ns.q473_customer')")
        .select(col("files_after"))
      // the invariant: after bin-packing, exactly one file per group
      val ok = res.crossJoin(
        s.table(tbl).agg(countDistinct("c_mktsegment").as("gs")))
        .select((col("files_after") === col("gs")).as("compact_ok"))
      s.table(tbl)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), sum("cents").cast("long").as("sum_cents"))
        .crossJoin(broadcast(ok))
        .select(col("c_mktsegment"), col("n"), col("sum_cents"),
          col("compact_ok"))
        .orderBy("c_mktsegment")
    })

  /** VACUUM + SNAPSHOT LEDGER through V2 procedures (`CALL graftlake
    * .system.{snapshots,vacuum}` — expire_snapshots/remove_orphan_files
    * in one metadata-bounded sweep): the table accrues a version per
    * commit (create, seed, metadata delete, cow delete = 4), the
    * snapshots procedure lists that ledger, and vacuum drops history
    * and physically deletes every file the current manifest doesn't
    * reference — zero row reads, O(files) metadata work. The entry
    * pins the ledger depth before/after and that vacuum freed at least
    * the dropped partition's files, alongside the surviving contents.
    * At 100 TB vacuum IS the storage-cost control: retained snapshots
    * hold deleted data on disk until an explicit, auditable forget. */
  val q474_lake_vacuum = Q(
    "q474_lake_vacuum",
    Some("""WITH t AS (
           |  SELECT o_orderkey, o_orderstatus,
           |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           |      AS cents
           |  FROM orders),
           |kept AS (
           |  SELECT * FROM t
           |  WHERE o_orderstatus <> 'P' AND NOT (cents % 7 = 0))
           |SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
           |  CAST(sum(cents) AS BIGINT) AS sum_cents,
           |  CAST(4 AS BIGINT) AS versions_before,
           |  CAST(1 AS BIGINT) AS versions_after,
           |  TRUE AS vacuumed_some
           |FROM kept GROUP BY o_orderstatus
           |ORDER BY o_orderstatus""".stripMargin),
    (s, d) => {
      val tbl = "graftlake.ns.q474_orders"
      s.sql(s"DROP TABLE IF EXISTS $tbl")
      s.sql(s"CREATE TABLE $tbl (o_orderkey BIGINT, o_orderstatus STRING, " +
        "cents BIGINT) TBLPROPERTIES('graft.storage'='files', " +
        "'graft.partitioncol'='o_orderstatus')")
      graft.Tables.orders(s, d)
        .select(col("o_orderkey").cast("long").as("o_orderkey"),
          col("o_orderstatus"),
          (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
            .as("cents"))
        .writeTo(tbl).append()                                       // v2
      s.sql(s"DELETE FROM $tbl WHERE o_orderstatus = 'P'")           // v3 meta
      s.sql(s"DELETE FROM $tbl WHERE cents % 7 = 0")                 // v4 cow
      val before = s.sql(s"CALL graftlake.system.snapshots('ns.q474_orders')")
        .agg(count(lit(1)).as("versions_before"))
      val vac = s.sql(s"CALL graftlake.system.vacuum('ns.q474_orders')")
        .select((col("files_deleted") > 0).as("vacuumed_some"))
      val after = s.sql(s"CALL graftlake.system.snapshots('ns.q474_orders')")
        .agg(count(lit(1)).as("versions_after"))
      s.table(tbl)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), sum("cents").cast("long").as("sum_cents"))
        .crossJoin(broadcast(before))
        .crossJoin(broadcast(after))
        .crossJoin(broadcast(vac))
        .select(col("o_orderstatus"), col("n"), col("sum_cents"),
          col("versions_before"), col("versions_after"),
          col("vacuumed_some"))
        .orderBy("o_orderstatus")
    })

  /** DEDUP-IN-PLACE ON THE LAKE — the capstone composition: the
    * LLM-pipeline's near-dup detection (q36's banded MinHash+LSH pairs,
    * verified Jaccard ≥ 0.15) produces a DROP LIST, and `MERGE INTO ...
    * WHEN MATCHED THEN DELETE` applies it to a FILE-BACKED documents
    * table through the engine-native row-level path (group-based
    * ReplaceData over real parquet files). This is what a curation
    * pipeline actually does at 100 TB: dedup findings don't produce a
    * report, they MUTATE THE LAKE, atomically, through the same DML
    * protocol every other writer uses — and the pre-dedup snapshot
    * stays readable via VERSION AS OF until vacuum. Drop rule here is
    * the non-transitive pair rule (the LARGER doc of each qualifying
    * pair drops — deterministic and closed-form; q88 carries the
    * cluster-transitive variant). Oracle replays pairs + drops +
    * survivors from the same documents table. */
  val q476_lake_dedup_merge = Q(
    "q476_lake_dedup_merge", {
      val pairsPrefix = TextOps.lshPairsSqlPrefix
      Some(s"""$pairsPrefix,
              |drops AS (SELECT DISTINCT doc_b AS doc_id FROM pairs),
              |survivors AS (
              |  SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_chars
              |  FROM documents d
              |  WHERE d.doc_id NOT IN (SELECT doc_id FROM drops))
              |SELECT CAST(doc_id % 7 AS BIGINT) AS grp,
              |  CAST(count(*) AS BIGINT) AS n,
              |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
              |FROM survivors GROUP BY 1 ORDER BY grp""".stripMargin)
    },
    (s, d) => {
      val tbl = "graftlake.ns.q476_docs"
      s.sql(s"DROP TABLE IF EXISTS $tbl")
      s.sql(s"CREATE TABLE $tbl (doc_id BIGINT, n_chars BIGINT) " +
        "TBLPROPERTIES('graft.storage'='files')")
      graft.Tables.documents(s, d)
        .select(col("doc_id").cast("long").as("doc_id"),
          length(col("text")).cast("long").as("n_chars"))
        .writeTo(tbl).append()
      graft.operators.Dedup.minhashNearDupPairs(
          graft.Tables.documents(s, d), "doc_id", "text",
          k = TextOps.MinhashK, shingleN = 3, threshold = 0.15)
        .select(col("doc_b").cast("long").as("doc_id")).distinct()
        .createOrReplaceTempView("q476_drops")
      s.sql(s"""MERGE INTO $tbl t USING q476_drops s ON t.doc_id = s.doc_id
               |WHEN MATCHED THEN DELETE""".stripMargin)
      s.table(tbl)
        .groupBy((col("doc_id") % 7).as("grp"))
        .agg(count(lit(1)).as("n"),
          sum("n_chars").cast("long").as("sum_chars"))
        .orderBy("grp")
    })

  /** SNAPSHOT DIFF VIA TIME TRAVEL — q85's snapshot-diff semantics
    * without a second table: ONE query reads the SAME lake table at two
    * retained versions (`VERSION AS OF` twice) and anti-joins them into
    * the change set — removed keys, plus changed keys with old and new
    * values side by side. This is the audit query a 100 TB lake answers
    * from its manifest history ("what did yesterday's DELETE+UPDATE
    * actually touch?") with zero extra storage beyond the retained
    * snapshots — the two scans share every untouched partition's files.
    * Oracle replays both states and the diff from `part`. */
  val q477_snapshot_diff = Q(
    "q477_snapshot_diff",
    Some("""WITH t AS (
           |  SELECT p_partkey, p_brand,
           |    CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           |      AS cents
           |  FROM part),
           |v3 AS (SELECT * FROM t WHERE NOT (p_brand = 'Brand#23')),
           |v4 AS (
           |  SELECT p_partkey, p_brand,
           |    CASE WHEN cents % 5 = 0 THEN cents + 1 ELSE cents END AS cents
           |  FROM v3),
           |removed AS (
           |  SELECT 'removed' AS change, CAST(count(*) AS BIGINT) AS n,
           |    CAST(coalesce(sum(cents), 0) AS BIGINT) AS old_cents,
           |    CAST(0 AS BIGINT) AS new_cents
           |  FROM t WHERE p_partkey NOT IN (SELECT p_partkey FROM v4)),
           |changed AS (
           |  SELECT 'changed' AS change, CAST(count(*) AS BIGINT) AS n,
           |    CAST(coalesce(sum(o.cents), 0) AS BIGINT) AS old_cents,
           |    CAST(coalesce(sum(c.cents), 0) AS BIGINT) AS new_cents
           |  FROM t o JOIN v4 c ON o.p_partkey = c.p_partkey
           |  WHERE o.cents <> c.cents)
           |SELECT * FROM removed UNION ALL SELECT * FROM changed
           |ORDER BY change""".stripMargin),
    (s, d) => {
      val tbl = "graftlake.ns.q477_part"
      s.sql(s"DROP TABLE IF EXISTS $tbl")
      s.sql(s"CREATE TABLE $tbl (p_partkey BIGINT, p_brand STRING, " +
        "cents BIGINT) TBLPROPERTIES('graft.storage'='files', " +
        "'graft.partitioncol'='p_brand')")
      graft.Tables.part(s, d)
        .select(col("p_partkey").cast("long").as("p_partkey"),
          col("p_brand"),
          (col("p_retailprice").cast("decimal(18,2)") * 100).cast("long")
            .as("cents"))
        .writeTo(tbl).append()                                       // v2
      s.sql(s"DELETE FROM $tbl WHERE p_brand = 'Brand#23'")          // v3
      s.sql(s"UPDATE $tbl SET cents = cents + 1 WHERE cents % 5 = 0") // v4
      val old = s.sql(s"SELECT p_partkey, cents FROM $tbl VERSION AS OF 2")
        .toDF("k", "old_cents")
      val cur = s.sql(s"SELECT p_partkey, cents FROM $tbl VERSION AS OF 4")
        .toDF("k", "new_cents")
      val removed = old.join(cur, Seq("k"), "left_anti")
        .agg(count(lit(1)).as("n"),
          coalesce(sum("old_cents"), lit(0L)).cast("long").as("old_cents"))
        .select(lit("removed").as("change"), col("n"), col("old_cents"),
          lit(0L).as("new_cents"))
      val changed = old.join(cur, "k")
        .filter(col("old_cents") =!= col("new_cents"))
        .agg(count(lit(1)).as("n"),
          coalesce(sum("old_cents"), lit(0L)).cast("long").as("old_cents"),
          coalesce(sum("new_cents"), lit(0L)).cast("long").as("new_cents"))
        .select(lit("changed").as("change"), col("n"), col("old_cents"),
          col("new_cents"))
      removed.unionAll(changed).orderBy("change")
    })

  /** INCREMENTAL CHANGED-FILE READ (VERDICT r14 #4 — q477's snapshot
    * diff WITHOUT re-scanning unchanged partitions): `VERSION AS OF
    * '2..4'` serves the manifest diff between two retained versions as
    * a change feed — rows of files v4 added tagged 'added', rows of
    * files v4 removed tagged 'removed'; untouched groups' files are
    * NEVER OPENED (the manifest knows which files each commit
    * added/removed, so the diff costs O(change), not O(table) — the
    * property that makes "what changed since yesterday" answerable on
    * a 100 TB lake). Rows a rewrite carried over unchanged appear on
    * both sides and cancel in the value-compare join. The DML here
    * touches only BUILDING (metadata delete) and MACHINERY (cow
    * rewrite); `diff_only_ok` pins — from the planned partitions —
    * that the three other segments' shared files stayed unread.
    * Oracle replays both states and the diff from `customer`. */
  val q478_lake_changes = Q(
    "q478_lake_changes",
    Some("""WITH t AS (
           |  SELECT c_custkey, c_mktsegment,
           |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
           |      AS cents
           |  FROM customer),
           |v3 AS (SELECT * FROM t WHERE c_mktsegment <> 'BUILDING'),
           |v4 AS (
           |  SELECT c_custkey, c_mktsegment,
           |    CASE WHEN c_mktsegment = 'MACHINERY' AND cents % 5 = 0
           |         THEN cents + 1 ELSE cents END AS cents
           |  FROM v3),
           |removed AS (
           |  SELECT 'removed' AS change, CAST(count(*) AS BIGINT) AS n,
           |    CAST(coalesce(sum(cents), 0) AS BIGINT) AS old_cents,
           |    CAST(0 AS BIGINT) AS new_cents
           |  FROM t WHERE c_custkey NOT IN (SELECT c_custkey FROM v4)),
           |changed AS (
           |  SELECT 'changed' AS change, CAST(count(*) AS BIGINT) AS n,
           |    CAST(coalesce(sum(o.cents), 0) AS BIGINT) AS old_cents,
           |    CAST(coalesce(sum(c.cents), 0) AS BIGINT) AS new_cents
           |  FROM t o JOIN v4 c ON o.c_custkey = c.c_custkey
           |  WHERE o.cents <> c.cents)
           |SELECT change, n, old_cents, new_cents, TRUE AS diff_only_ok
           |FROM (SELECT * FROM removed UNION ALL SELECT * FROM changed)
           |ORDER BY change""".stripMargin),
    (s, d) => {
      val tbl = "graftlake.ns.q478_customer"
      val key = "ns.q478_customer"
      s.sql(s"DROP TABLE IF EXISTS $tbl")
      s.sql(s"CREATE TABLE $tbl (c_custkey BIGINT, c_mktsegment STRING, " +
        "cents BIGINT) TBLPROPERTIES('graft.storage'='files', " +
        "'graft.partitioncol'='c_mktsegment')")
      graft.Tables.customer(s, d)
        .select(col("c_custkey").cast("long").as("c_custkey"),
          col("c_mktsegment"),
          (col("c_acctbal").cast("decimal(18,2)") * 100).cast("long")
            .as("cents"))
        .writeTo(tbl).append()                                       // v2
      s.sql(s"DELETE FROM $tbl WHERE c_mktsegment = 'BUILDING'")     // v3
      s.sql(s"UPDATE $tbl SET cents = cents + 1 " +
        "WHERE c_mktsegment = 'MACHINERY' AND cents % 5 = 0")        // v4
      // the change feed: ONLY the diff's files are planned
      val feed = s.sql(
        s"SELECT c_custkey, cents, _change_type FROM $tbl " +
          "VERSION AS OF '2..4'")
      val old = feed.filter(col("_change_type") === "removed")
        .select(col("c_custkey").as("k"), col("cents").as("old_cents"))
      val cur = feed.filter(col("_change_type") === "added")
        .select(col("c_custkey").as("k"), col("cents").as("new_cents"))
      val removed = old.join(cur, Seq("k"), "left_anti")
        .agg(count(lit(1)).as("n"),
          coalesce(sum("old_cents"), lit(0L)).cast("long").as("old_cents"))
        .select(lit("removed").as("change"), col("n"), col("old_cents"),
          lit(0L).as("new_cents"))
      val changed = old.join(cur, "k")
        .filter(col("old_cents") =!= col("new_cents"))
        .agg(count(lit(1)).as("n"),
          coalesce(sum("old_cents"), lit(0L)).cast("long").as("old_cents"),
          coalesce(sum("new_cents"), lit(0L)).cast("long").as("new_cents"))
        .select(lit("changed").as("change"), col("n"), col("old_cents"),
          col("new_cents"))
      // plan pin: the diff scan plans exactly |added|+|removed| file
      // partitions, and the versions genuinely SHARE files it skipped
      val st = graft.sources.FileStore.stateOf(key).get
      val (from, to) = (st.snapshotAt(2).get, st.snapshotAt(4).get)
      val scan = new graft.sources.FileChangesScan(key, from, to)
      val shared = from.files.map(_.name).toSet
        .intersect(to.files.map(_.name).toSet)
      val ok = shared.nonEmpty &&
        scan.planInputPartitions().length ==
          (from.files.length - shared.size) +
            (to.files.length - shared.size)
      removed.unionAll(changed)
        .withColumn("diff_only_ok", lit(ok))
        .orderBy("change")
    })

  /** MANIFEST MIN/MAX FILE SKIPPING (VERDICT r14 #2 — the connector
    * form of q138's bucket-stats device): every base-file write records
    * per-column min/max in the manifest, and the scan builder turns
    * range predicates over ANY stats-bearing column into interval tests
    * that drop whole files before any I/O — here four ordered appends
    * give four p_partkey-disjoint files and the range query plans
    * exactly ONE (`pruned_ok`, read off the executed plan). Residual
    * re-application above the scan keeps results exact whatever the
    * stats say. At 100 TB this is the difference between a range query
    * reading a partition's worth of files and reading the table: sort
    * the layout once, skip forever. FileLakeSpec pins the skipping
    * mechanics (string equality, impossible ranges, no-stats files). */
  val q479_lake_stats_skipping = Q(
    "q479_lake_stats_skipping",
    Some("""WITH b AS (SELECT CAST(max(p_partkey) AS BIGINT) // 8 AS hi
           |          FROM part),
           |t AS (
           |  SELECT p_brand,
           |    CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           |      AS cents
           |  FROM part, b WHERE p_partkey <= b.hi)
           |SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
           |  CAST(sum(cents) AS BIGINT) AS sum_cents,
           |  TRUE AS pruned_ok
           |FROM t GROUP BY p_brand ORDER BY p_brand""".stripMargin),
    (s, d) => {
      val tbl = "graftlake.ns.q479_part"
      s.sql(s"DROP TABLE IF EXISTS $tbl")
      s.sql(s"CREATE TABLE $tbl (p_partkey BIGINT, p_brand STRING, " +
        "cents BIGINT) TBLPROPERTIES('graft.storage'='files')")
      val src = graft.Tables.part(s, d)
        .select(col("p_partkey").cast("long").as("p_partkey"),
          col("p_brand"),
          (col("p_retailprice").cast("decimal(18,2)") * 100).cast("long")
            .as("cents"))
      val maxK = src.agg(max("p_partkey")).head.getLong(0) // metadata probe
      // four appends over disjoint key ranges — a sorted layout's files
      // (half-open [lo, hi) buckets; the last takes the tail — keys may
      // start at 0, so the lower bound is inclusive)
      for (q <- 0L until 4L)
        src.filter(col("p_partkey") >= q * (maxK / 4) &&
            (col("p_partkey") < (q + 1) * (maxK / 4) || lit(q == 3L)))
          .coalesce(1).writeTo(tbl).append()
      val hi = maxK / 8 // inside chunk 0 only
      val range = s.table(tbl).filter(col("p_partkey") <= hi)
      val plan = range.queryExecution.executedPlan.toString
      val planned = "files=(\\d+)".r.findFirstMatchIn(plan)
        .map(_.group(1).toInt).getOrElse(-1)
      range.groupBy("p_brand")
        .agg(count(lit(1)).as("n"),
          sum("cents").cast("long").as("sum_cents"))
        .withColumn("pruned_ok", lit(planned == 1))
        .orderBy("p_brand")
    })

  /** THE REFERENCE PIPELINE INTO THE LAKE TIER (VERDICT r14 #5 — ties
    * §2.10 parity to the r14 DML protocol end-to-end): the golden
    * envelope batch (S1→F1-F4→P1-P3, the reference's 16-record CDC
    * window, reference `lambda_function.py` decode → pivot) is applied
    * to a file-backed table as ACTUAL DML — `MERGE` dispatching on
    * `SRC_CDC_OPER_NM` (DELETE drops, anything else upserts), the
    * reference's INSERT/UPDATE/DELETE feed semantics executed through
    * the engine-native row-level path instead of append-only files.
    * A deterministic second window (DELETE every 5th key, UPDATE the
    * rest) exercises all three verbs, and the PRE-APPLY snapshot stays
    * time-travel readable (`pre_apply_rows` reads `VERSION AS OF 2`).
    * Oracle replays seed + both windows from the golden parquet. */
  val q480_cdc_lake_apply = Q(
    "q480_cdc_lake_apply",
    Some(s"""WITH w1 AS (
            |  SELECT CAST(RATE_CARD_ID AS BIGINT) AS rate_card_id,
            |    RATE_CARD_NM AS rate_card_nm,
            |    CAST(CRNCY_ID AS BIGINT) AS crncy_id,
            |    CAST(BASE_UNIT_LENGTH AS BIGINT) AS base_unit_length
            |  FROM read_parquet('${Ingest.goldenParquet}')),
            |seed AS (
            |  SELECT rate_card_id, 'stale' AS rate_card_nm,
            |    CAST(-1 AS BIGINT) AS crncy_id,
            |    CAST(-1 AS BIGINT) AS base_unit_length
            |  FROM w1 WHERE rate_card_id <= 6
            |  UNION ALL
            |  SELECT * FROM (VALUES
            |    (CAST(900 AS BIGINT), 'keep', CAST(7 AS BIGINT),
            |     CAST(7 AS BIGINT)),
            |    (CAST(901 AS BIGINT), 'keep', CAST(8 AS BIGINT),
            |     CAST(8 AS BIGINT)))
            |    v(rate_card_id, rate_card_nm, crncy_id,
            |      base_unit_length)),
            |after1 AS (
            |  SELECT * FROM seed WHERE rate_card_id NOT IN
            |    (SELECT rate_card_id FROM w1)
            |  UNION ALL SELECT * FROM w1),
            |w2 AS (
            |  SELECT rate_card_id, rate_card_nm, crncy_id,
            |    base_unit_length + 1 AS base_unit_length,
            |    CASE WHEN rate_card_id % 5 = 0 THEN 'DELETE'
            |         ELSE 'UPDATE' END AS op
            |  FROM w1),
            |final AS (
            |  SELECT a.* FROM after1 a WHERE a.rate_card_id NOT IN
            |    (SELECT rate_card_id FROM w2)
            |  UNION ALL
            |  SELECT rate_card_id, rate_card_nm, crncy_id,
            |    base_unit_length
            |  FROM w2 WHERE op <> 'DELETE')
            |SELECT rate_card_id, rate_card_nm, crncy_id,
            |  base_unit_length, CAST(8 AS BIGINT) AS pre_apply_rows
            |FROM final ORDER BY rate_card_id""".stripMargin),
    (s, d) => {
      import s.implicits._
      // same guard (and failure text) as the Ingest parity entries, so
      // a reference-less machine sees ONE consistent skip class instead
      // of a bespoke hard failure (ADVICE r15)
      require(Ingest.haveFixture, s"fixture missing: ${Ingest.sampleEvent}")
      val tbl = "graftlake.ns.q480_ratecard"
      s.sql(s"DROP TABLE IF EXISTS $tbl")
      s.sql(s"CREATE TABLE $tbl (rate_card_id BIGINT, " +
        "rate_card_nm STRING, crncy_id BIGINT, base_unit_length BIGINT) " +
        "TBLPROPERTIES('graft.storage'='files')")
      // the golden envelope path: S3-event JSON → base64 → Confluent-
      // Avro decode → pivoted typed frame (the reference's window 1)
      val w1 = graft.pipeline.KafkaToParquet.decodeRecords(
          graft.ingest.Envelope.readEventJson(s, Ingest.sampleEvent),
          graft.ingest.RatecardSchema.topic,
          graft.ingest.RatecardSchema.provider)
        .select(col("RATE_CARD_ID").cast("long").as("rate_card_id"),
          col("RATE_CARD_NM").as("rate_card_nm"),
          col("CRNCY_ID").cast("long").as("crncy_id"),
          col("BASE_UNIT_LENGTH").cast("long").as("base_unit_length"),
          col("SRC_CDC_OPER_NM").as("op"))
      // seed: stale rows for 6 feed keys + 2 keys the feed never touches
      w1.filter(col("rate_card_id") <= 6)
        .select(col("rate_card_id"), lit("stale").as("rate_card_nm"),
          lit(-1L).as("crncy_id"), lit(-1L).as("base_unit_length"))
        .unionAll(Seq((900L, "keep", 7L, 7L), (901L, "keep", 8L, 8L))
          .toDF("rate_card_id", "rate_card_nm", "crncy_id",
            "base_unit_length"))
        .writeTo(tbl).append()                                      // v2
      def applyWindow(view: String): Unit = s.sql(
        s"""MERGE INTO $tbl t USING $view s
           |ON t.rate_card_id = s.rate_card_id
           |WHEN MATCHED AND s.op = 'DELETE' THEN DELETE
           |WHEN MATCHED THEN UPDATE SET
           |  rate_card_nm = s.rate_card_nm, crncy_id = s.crncy_id,
           |  base_unit_length = s.base_unit_length
           |WHEN NOT MATCHED AND s.op <> 'DELETE' THEN
           |  INSERT (rate_card_id, rate_card_nm, crncy_id,
           |    base_unit_length)
           |  VALUES (s.rate_card_id, s.rate_card_nm, s.crncy_id,
           |    s.base_unit_length)""".stripMargin)
      w1.createOrReplaceTempView("q480_w1")
      applyWindow("q480_w1")                                        // v3
      // window 2: the next CDC batch — DELETE every 5th key, UPDATE
      // the rest (deterministic; the fixture's one window is INSERTs)
      w1.select(col("rate_card_id"), col("rate_card_nm"),
          col("crncy_id"),
          (col("base_unit_length") + 1).as("base_unit_length"),
          when(col("rate_card_id") % 5 === 0, "DELETE")
            .otherwise("UPDATE").as("op"))
        .createOrReplaceTempView("q480_w2")
      applyWindow("q480_w2")                                        // v4
      val preApply = s.sql(
        s"SELECT count(*) AS pre_apply_rows FROM $tbl VERSION AS OF 2")
      s.table(tbl)
        .crossJoin(broadcast(preApply))
        .select(col("rate_card_id"), col("rate_card_nm"),
          col("crncy_id"), col("base_unit_length"),
          col("pre_apply_rows"))
        .orderBy("rate_card_id")
    })

  /** DISTRIBUTED SORT-LAYOUT REWRITE (`CALL graftlake.system.sort` —
    * Iceberg's rewrite_data_files(sort), the write-once investment that
    * makes q479's stats maximally selective from ANY starting layout):
    * four INTERLEAVED appends (p_partkey mod 4) give four files that
    * each span the whole key range — stats skipping can prune nothing —
    * then one range-partitioned shuffle rewrites them into four
    * disjoint sorted runs, and the same range predicate plans ≤ 2 of 4
    * files (`pruned_ok`; boundaries come from RangePartitioner's
    * sampling, so the pin allows one boundary file). At 100 TB: a
    * standing maintenance job pays ONE shuffle so that every
    * subsequent range query reads O(selectivity) instead of O(table) —
    * the sort-once/skip-forever trade. Pre-sort snapshot retained for
    * time travel; oracle is the layout-independent query. */
  val q482_lake_sort_layout = Q(
    "q482_lake_sort_layout",
    Some("""WITH b AS (SELECT CAST(max(p_partkey) AS BIGINT) // 8 AS hi
           |          FROM part),
           |t AS (
           |  SELECT p_brand,
           |    CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           |      AS cents
           |  FROM part, b WHERE p_partkey <= b.hi)
           |SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
           |  CAST(sum(cents) AS BIGINT) AS sum_cents,
           |  TRUE AS pruned_ok
           |FROM t GROUP BY p_brand ORDER BY p_brand""".stripMargin),
    (s, d) => {
      val tbl = "graftlake.ns.q482_part"
      s.sql(s"DROP TABLE IF EXISTS $tbl")
      s.sql(s"CREATE TABLE $tbl (p_partkey BIGINT, p_brand STRING, " +
        "cents BIGINT) TBLPROPERTIES('graft.storage'='files')")
      val src = graft.Tables.part(s, d)
        .select(col("p_partkey").cast("long").as("p_partkey"),
          col("p_brand"),
          (col("p_retailprice").cast("decimal(18,2)") * 100).cast("long")
            .as("cents"))
      // interleaved appends: every file spans the whole key range
      for (m <- 0L until 4L)
        src.filter(col("p_partkey") % 4 === m)
          .coalesce(1).writeTo(tbl).append()
      val maxK = src.agg(max("p_partkey")).head.getLong(0)
      val hi = maxK / 8
      val unsorted = s.table(tbl).filter(col("p_partkey") <= hi)
      def planned(df: org.apache.spark.sql.DataFrame): Int =
        "files=(\\d+)".r.findFirstMatchIn(
          df.queryExecution.executedPlan.toString)
          .map(_.group(1).toInt).getOrElse(-1)
      val beforeFiles = planned(unsorted) // 4: nothing prunable
      s.sql(s"CALL graftlake.system.sort('ns.q482_part', 'p_partkey', 4)")
      val range = s.table(tbl).filter(col("p_partkey") <= hi)
      val afterFiles = planned(range)
      range.groupBy("p_brand")
        .agg(count(lit(1)).as("n"),
          sum("cents").cast("long").as("sum_cents"))
        .withColumn("pruned_ok",
          lit(beforeFiles == 4 && afterFiles <= 2))
        .orderBy("p_brand")
    })

  /** LAKE DURABILITY — OPEN FROM DISK (VERDICT r15 #1, the round's top
    * ask): the manifest chain is now read back, so the on-disk
    * `manifest-v{N}.json` files are the AUTHORITATIVE metastore and the
    * in-JVM map is just a cache. Mid-query this entry seeds a table,
    * runs a metadata DELETE, then simulates a DRIVER RESTART
    * (`FileStore.forget` drops the cached state; disk untouched) — and
    * the very next catalog reference rebuilds everything from the
    * manifests: the current read, the retained history (`VERSION AS OF
    * 2` serves the pre-delete snapshot), and a CONTINUING CAS append
    * (the restarted driver publishes v4 against the reloaded chain).
    * `reopened_ok` pins the reload really happened (cache observably
    * empty, then version line continued). This is the reference's real
    * topology — each Lambda invocation is a fresh "driver" sharing only
    * S3 state (configure_lambda_triggeres.sh:3-31) — and the 100 TB
    * contract: a lake nobody can reopen is a cache, not a table.
    * Oracle replays seed → delete → append from `customer`. */
  val q484_lake_reopen = Q(
    "q484_lake_reopen",
    Some("""WITH t AS (
           |  SELECT c_custkey, c_mktsegment,
           |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
           |      AS cents
           |  FROM customer),
           |v3 AS (SELECT * FROM t WHERE c_mktsegment <> 'BUILDING'),
           |fin AS (
           |  SELECT * FROM v3
           |  UNION ALL
           |  SELECT * FROM (VALUES
           |    (CAST(-1 AS BIGINT), 'SYNTH', CAST(5 AS BIGINT)),
           |    (CAST(-2 AS BIGINT), 'SYNTH', CAST(7 AS BIGINT)))
           |    v(c_custkey, c_mktsegment, cents))
           |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
           |  CAST(sum(cents) AS BIGINT) AS sum_cents,
           |  (SELECT CAST(count(*) AS BIGINT) FROM t) AS pre_rows,
           |  TRUE AS reopened_ok
           |FROM fin GROUP BY 1 ORDER BY 1""".stripMargin),
    (s, d) => {
      import s.implicits._
      val tbl = "graftlake.ns.q484_customer"
      val key = "ns.q484_customer"
      s.sql(s"DROP TABLE IF EXISTS $tbl")
      s.sql(s"CREATE TABLE $tbl (c_custkey BIGINT, c_mktsegment STRING, " +
        "cents BIGINT) TBLPROPERTIES('graft.storage'='files', " +
        "'graft.partitioncol'='c_mktsegment')")
      graft.Tables.customer(s, d)
        .select(col("c_custkey").cast("long").as("c_custkey"),
          col("c_mktsegment"),
          (col("c_acctbal").cast("decimal(18,2)") * 100).cast("long")
            .as("cents"))
        .writeTo(tbl).append()                                       // v2
      s.sql(s"DELETE FROM $tbl WHERE c_mktsegment = 'BUILDING'")     // v3
      // ---- simulated driver restart: cache cold, disk is the truth ----
      graft.sources.FileStore.forget(key)
      val cacheCold = graft.sources.FileStore.stateOf(key).isEmpty
      // the pre-delete snapshot reads from the RELOADED history
      val preRows = s.sql(
        s"SELECT count(*) AS pre_rows FROM $tbl VERSION AS OF 2")
      // and the restarted "driver" continues the version line via CAS
      Seq((-1L, "SYNTH", 5L), (-2L, "SYNTH", 7L))
        .toDF("c_custkey", "c_mktsegment", "cents")
        .writeTo(tbl).append()                                       // v4
      val st = graft.sources.FileStore.stateOf(key).get
      val ok = cacheCold && st.version == 4 &&
        st.snaps.map(_.version) == List(3, 2, 1)
      s.table(tbl)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
          sum("cents").cast("long").as("sum_cents"))
        .crossJoin(broadcast(preRows))
        .withColumn("reopened_ok", lit(ok))
        .orderBy("c_mktsegment")
    })

  /** STATS SKIPPING ACROSS THE MERGE-ON-READ OVERLAY (VERDICT r15 #5):
    * file pruning used to switch off the moment any delta generation
    * was outstanding — the conservative mor-safety rule. But the
    * standing delta encoding is delete(old id) + insert(row): a DELETE
    * only removes rows (a file whose stats exclude the predicate still
    * cannot match after the merge) and overlay inserts ride their own
    * input partitions that pruning never touches — so the skip stays
    * sound until a legacy full-row UPDATE appears. Here a delta-mode
    * table in q479's sorted four-file layout takes a DELETE (overlay
    * outstanding, spec-pinned) and the range query still plans exactly
    * ONE base file (`pruned_ok` reads the executed plan; the
    * outstanding-overlay condition is asserted into the same flag). At
    * 100 TB this is the difference between "every CDC delete defeats
    * file skipping until the next compaction" and skipping that
    * survives steady-state deletes. Oracle replays layout + delete. */
  val q486_lake_mor_pruned_scan = Q(
    "q486_lake_mor_pruned_scan",
    Some("""WITH b AS (SELECT CAST(max(p_partkey) AS BIGINT) // 8 AS hi
           |          FROM part),
           |t AS (
           |  SELECT p_brand,
           |    CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           |      AS cents
           |  FROM part, b
           |  WHERE p_partkey <= b.hi AND p_partkey % 10 <> 3)
           |SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
           |  CAST(sum(cents) AS BIGINT) AS sum_cents,
           |  TRUE AS pruned_ok
           |FROM t GROUP BY p_brand ORDER BY p_brand""".stripMargin),
    (s, d) => {
      val tbl = "graftlake.ns.q486_part"
      val key = "ns.q486_part"
      s.sql(s"DROP TABLE IF EXISTS $tbl")
      s.sql(s"CREATE TABLE $tbl (p_partkey BIGINT, p_brand STRING, " +
        "cents BIGINT) TBLPROPERTIES('graft.storage'='files', " +
        "'graft.mode'='delta')")
      val src = graft.Tables.part(s, d)
        .select(col("p_partkey").cast("long").as("p_partkey"),
          col("p_brand"),
          (col("p_retailprice").cast("decimal(18,2)") * 100).cast("long")
            .as("cents"))
      val maxK = src.agg(max("p_partkey")).head.getLong(0)
      // q479's sorted layout: four disjoint-key files
      for (q <- 0L until 4L)
        src.filter(col("p_partkey") >= q * (maxK / 4) &&
            (col("p_partkey") < (q + 1) * (maxK / 4) || lit(q == 3L)))
          .coalesce(1).writeTo(tbl).append()
      // steady-state CDC: a delete lands as an OUTSTANDING delta
      s.sql(s"DELETE FROM $tbl WHERE p_partkey % 10 = 3")
      val overlayOut =
        graft.sources.FileStore.stateOf(key).get.deltas.nonEmpty
      val hi = maxK / 8 // inside chunk 0 only
      val range = s.table(tbl).filter(col("p_partkey") <= hi)
      val planned = "files=(\\d+)".r.findFirstMatchIn(
          range.queryExecution.executedPlan.toString)
        .map(_.group(1).toInt).getOrElse(-1)
      range.groupBy("p_brand")
        .agg(count(lit(1)).as("n"),
          sum("cents").cast("long").as("sum_cents"))
        .withColumn("pruned_ok", lit(planned == 1 && overlayOut))
        .orderBy("p_brand")
    })

  val all: Seq[Q] = Seq(q426_sharded_topk_error, q427_sketch_quantile_error,
    q472_time_travel, q473_lake_compaction, q474_lake_vacuum,
    q476_lake_dedup_merge, q477_snapshot_diff, q478_lake_changes,
    q479_lake_stats_skipping, q480_cdc_lake_apply, q482_lake_sort_layout,
    q484_lake_reopen, q486_lake_mor_pruned_scan)
}
