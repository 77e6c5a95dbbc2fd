package graft.queries

import org.apache.spark.sql.functions._

/** Round-10 connector additions: limit / top-N pushdown on the DSv2
  * generator source.
  */
object DataOps6 {

  /** DSv2 LIMIT + TOP-N pushdown (SupportsPushDownLimit /
    * SupportsPushDownTopN — the last two scan-time optimization hooks
    * the GenDocs connector hadn't claimed): because the generator's
    * rows are a contiguous ascending id interval, a bare LIMIT n or an
    * ORDER BY id LIMIT n truncates the interval itself — the scan
    * GENERATES ≤ n rows instead of 10⁶ and Spark's
    * TakeOrderedAndProject merely re-sorts the survivors. Both
    * directions exercised: ASC keeps the interval's head, DESC its
    * tail. GenDocsSpec pins the narrowed `GenScan id=[…)` descriptions
    * in the executed plan; this entry hash-checks the data outcome
    * against closed forms.
    *
    * At 100 TB this is the difference between "LIMIT 100 reads one
    * input split" and "LIMIT 100 launches the full scan and discards
    * it" — the contract matters for any preview/sample path. */
  val q415_topn_pushdown = Q(
    "q415_topn_pushdown",
    Some("""WITH asc_ AS (
           |  SELECT CAST(count(*) AS BIGINT) AS asc_n,
           |    CAST(min(id) AS BIGINT) AS asc_min,
           |    CAST(max(id) AS BIGINT) AS asc_max,
           |    CAST(sum(id) AS BIGINT) AS asc_sum
           |  FROM (SELECT unnest(generate_series(500000, 500099)) AS id)),
           |desc_ AS (
           |  SELECT CAST(count(*) AS BIGINT) AS desc_n,
           |    CAST(min(id) AS BIGINT) AS desc_min,
           |    CAST(max(id) AS BIGINT) AS desc_max,
           |    CAST(sum(id) AS BIGINT) AS desc_sum
           |  FROM (SELECT unnest(generate_series(999950, 999999)) AS id))
           |SELECT * FROM asc_ CROSS JOIN desc_""".stripMargin),
    (s, d) => {
      def gen = s.read.format("graft.sources.GenDocs")
        .option("rows", "1000000").option("slices", "8").load()
      val asc = gen.filter(col("id") >= 500000L)
        .orderBy(col("id")).limit(100)
        .agg(count(lit(1)).as("asc_n"), min("id").as("asc_min"),
          max("id").as("asc_max"), sum("id").cast("long").as("asc_sum"))
      val desc = gen.orderBy(col("id").desc).limit(50)
        .agg(count(lit(1)).as("desc_n"), min("id").as("desc_min"),
          max("id").as("desc_max"), sum("id").cast("long").as("desc_sum"))
      broadcast(asc).crossJoin(broadcast(desc))
    })

  /** PRESORTED storage-partitioned join (SupportsReportOrdering, the
    * scan-time contract added in r11 beside statistics/partitioning/
    * pushdown): two keyed generator scans join ON (tag, id). The
    * partitioning report (KeyGroupedPartitioning on tag, q362) already
    * removes every Exchange; the ORDERING report ((tag, id) ascending
    * within each slice) now also removes every Sort — EnsureRequirements
    * sees the sort-merge join's required child ordering already
    * satisfied by the scan itself. This is the fully-clustered read
    * path a sorted+bucketed lake table earns at 100 TB: a join that
    * moves nothing and sorts nothing, pinned in PlanAuditSpec (zero
    * Exchange hashpartitioning, zero Sort operators). Sides are sized
    * past the broadcast threshold so the merge path is the one planned.
    * The oracle replays the closed forms; layout can only change the
    * plan, never the result. */
  val q438_presorted_join = Q(
    "q438_presorted_join",
    Some("""WITH j AS (
           |  SELECT id,
           |    CAST(CAST((id * 7919) % 10000 AS DECIMAL(18,2)) / 100
           |      AS DECIMAL(18,2)) AS v
           |  FROM (SELECT unnest(generate_series(0, 449999)) AS id))
           |SELECT CAST(count(*) AS BIGINT) AS n_matched,
           |  CAST(min(id) AS BIGINT) AS min_id,
           |  CAST(max(id) AS BIGINT) AS max_id,
           |  CAST(sum(CAST(v * v AS DECIMAL(38,4))) AS DOUBLE) AS sum_vv
           |FROM j""".stripMargin),
    (s, d) => {
      def keyedGen(rows: Long) = s.read.format("graft.sources.GenDocs")
        .option("rows", rows.toString).option("partitionBy", "tag").load()
      val a = keyedGen(500000).select(col("tag"), col("id"),
        Q.dec(col("v")).as("va"))
      val b = keyedGen(450000).select(col("tag"), col("id"),
        Q.dec(col("v")).as("vb"))
      a.join(b, Seq("tag", "id"))
        .agg(count(lit(1)).as("n_matched"),
          min("id").cast("long").as("min_id"),
          max("id").cast("long").as("max_id"),
          sum((col("va") * col("vb")).cast("decimal(38,4)"))
            .cast("double").as("sum_vv"))
    })

  /** TABLESAMPLE pushdown (SupportsPushDownTableSample — the r11 rung
    * after limit/top-N): `df.sample(0.25, seed=42)` reaches the
    * GenDocs source, which owns the sampling decision and uses the
    * repo's replayable md5-span rule (keep id iff
    * span₅(md5("id:42"))/2²⁰ < 0.25) — so the Sample operator VANISHES
    * from the plan (rows that fail the rule never exist) AND the SQL
    * oracle replays the sampled scan row-for-row, something no
    * private-RNG connector sample can offer. At 100 TB this is the
    * difference between "sample 1% = read 1%" and "sample 1% = read
    * everything, keep 1%". Plan pinned: scan description carries
    * sample=[0.0,0.25,seed=42], no Sample operator survives. */
  val q447_sample_pushdown = Q(
    "q447_sample_pushdown", {
      import graft.functions.TextFunctions.hexSpanValSql
      Some(s"""WITH g AS (
              |  SELECT id,
              |    CAST(CAST((id * 7919) % 10000 AS DECIMAL(18,2)) / 100
              |      AS DECIMAL(18,2)) AS v
              |  FROM (SELECT unnest(generate_series(0, 199999)) AS id)
              |  WHERE ${hexSpanValSql("md5(CAST(id AS VARCHAR) || ':42')", 0, 5)}
              |    / 1048576.0 < 0.25)
              |SELECT CAST(count(*) AS BIGINT) AS n,
              |  CAST(min(id) AS BIGINT) AS min_id,
              |  CAST(max(id) AS BIGINT) AS max_id,
              |  CAST(sum(id) AS BIGINT) AS sum_id,
              |  CAST(sum(v) AS DOUBLE) AS sum_v
              |FROM g""".stripMargin)
    },
    (s, d) => {
      val gen = s.read.format("graft.sources.GenDocs")
        .option("rows", "200000").option("slices", "8").load()
      gen.sample(withReplacement = false, 0.25, 42L)
        .agg(count(lit(1)).as("n"),
          min("id").cast("long").as("min_id"),
          max("id").cast("long").as("max_id"),
          sum("id").cast("long").as("sum_id"),
          sum(graft.queries.Q.dec(col("v"))).cast("double").as("sum_v"))
    })

  /** OFFSET pushdown (SupportsPushDownOffset — closing the limit family
    * after LIMIT/top-N/TABLESAMPLE): `df.offset(20000).limit(12000)`
    * reaches the GenDocs source as pushLimit(32000) + pushOffset(20000),
    * which compose to the generated interval [20000, 32000) — the
    * skipped rows NEVER EXIST (a connector without this reads and
    * discards the prefix; a paginating 100 TB export pays that per
    * page). OFFSET without ORDER BY is row-order-defined; the generator's
    * row order IS ascending id, which the oracle replays. Plan pinned:
    * scan description carries id=[20000,32000), no Offset operator
    * survives. */
  val q457_offset_pushdown = Q(
    "q457_offset_pushdown",
    Some("""WITH g AS (
           |  SELECT id,
           |    CAST(CAST((id * 7919) % 10000 AS DECIMAL(18,2)) / 100
           |      AS DECIMAL(18,2)) AS v,
           |    't' || CAST(id % 7 AS VARCHAR) AS tag
           |  FROM (SELECT unnest(generate_series(20000, 31999)) AS id))
           |SELECT tag, CAST(count(*) AS BIGINT) AS n,
           |  CAST(min(id) AS BIGINT) AS min_id,
           |  CAST(max(id) AS BIGINT) AS max_id,
           |  CAST(CAST(sum(v) AS DECIMAL(18,2)) AS DOUBLE) AS sum_v
           |FROM g GROUP BY tag ORDER BY tag""".stripMargin),
    (s, d) => {
      val gen = s.read.format("graft.sources.GenDocs")
        .option("rows", "50000").option("slices", "8").load()
      gen.offset(20000).limit(12000)
        .groupBy("tag")
        .agg(count(lit(1)).as("n"),
          min("id").cast("long").as("min_id"),
          max("id").cast("long").as("max_id"),
          sum(Q.dec(col("v"))).cast("decimal(18,2)").cast("double")
            .as("sum_v"))
        .orderBy("tag")
    })

  /** METADATA COLUMNS (SupportsMetadataColumns — the DSv2 provenance
    * contract: Kafka's partition/offset, the file source's `_metadata`):
    * `_slice` is the generated input-partition ordinal, HIDDEN from
    * `SELECT *` (pinned in GenDocsSpec) and materialized only when
    * named. The audit query below groups rows by their provenance
    * partition with zero joins — at 100 TB this is how a consumer
    * attributes bad rows to the file/partition that produced them.
    * Oracle: slice layout is closed-form (8 slices over 40000 rows =
    * 5000-id stripes), so `id // 5000` replays the metadata column
    * exactly. */
  val q458_metadata_slice = Q(
    "q458_metadata_slice",
    Some("""WITH g AS (
           |  SELECT id, id // 5000 AS sl,
           |    CAST(CAST((id * 7919) % 10000 AS DECIMAL(18,2)) / 100
           |      AS DECIMAL(18,2)) AS v
           |  FROM (SELECT unnest(generate_series(0, 39999)) AS id))
           |SELECT CAST(sl AS BIGINT) AS slice_ord,
           |  CAST(count(*) AS BIGINT) AS n,
           |  CAST(min(id) AS BIGINT) AS min_id,
           |  CAST(max(id) AS BIGINT) AS max_id,
           |  CAST(CAST(sum(v) AS DECIMAL(18,2)) AS DOUBLE) AS sum_v
           |FROM g GROUP BY sl ORDER BY slice_ord""".stripMargin),
    (s, d) => {
      val gen = s.read.format("graft.sources.GenDocs")
        .option("rows", "40000").option("slices", "8").load()
      gen.select(col("_slice"), col("id"), col("v"))
        .groupBy(col("_slice").as("slice_ord"))
        .agg(count(lit(1)).as("n"),
          min("id").cast("long").as("min_id"),
          max("id").cast("long").as("max_id"),
          sum(Q.dec(col("v"))).cast("decimal(18,2)").cast("double")
            .as("sum_v"))
        .orderBy("slice_ord")
    })

  /** V2 FUNCTION CATALOG (FunctionCatalog + ScalarFunction — the
    * extension surface beside the TableProvider; GraftExtensions covers
    * session-extension registration, this covers CATALOG-resolved,
    * namespaced functions): `graftfns.fns.bits_jaccard(a, b)` resolves
    * through `graft.functions.GraftFunctionCatalog` and compiles via the
    * MAGIC `invoke(long, long)` method to a direct codegen'd call (the
    * plan shows `invoke(...)` inside WholeStageCodegen — no per-row
    * InternalRow boxing; ExtensionsSpec pins it). The oracle replays the
    * popcount arithmetic with DuckDB's bit_count. */
  val q459_v2_function_catalog = Q(
    "q459_v2_function_catalog",
    Some("""WITH g AS (SELECT unnest(generate_series(0, 19999)) AS id),
           |j AS (
           |  SELECT id % 7 AS grp,
           |    CASE WHEN bit_count(id | (id * 3)) = 0 THEN 0.0
           |         ELSE CAST(bit_count(id & (id * 3)) AS DOUBLE)
           |           / bit_count(id | (id * 3)) END AS jac
           |  FROM g)
           |SELECT CAST(grp AS BIGINT) AS grp,
           |  CAST(count(*) AS BIGINT) AS n,
           |  round(CAST(sum(CAST(round(jac, 6) AS DECIMAL(12,6)))
           |    AS DOUBLE) / count(*), 6) AS mean_jac
           |FROM j GROUP BY grp ORDER BY grp""".stripMargin),
    (s, d) => {
      // graftfns is bound at session build (see Verify/Bench builders;
      // ADVICE r12 — a per-query conf.set leaked into subsequent entries)
      s.sql("""SELECT CAST(id % 7 AS BIGINT) AS grp,
              |  CAST(count(*) AS BIGINT) AS n,
              |  round(CAST(sum(CAST(round(
              |      graftfns.fns.bits_jaccard(id, id * 3), 6)
              |    AS DECIMAL(12,6))) AS DOUBLE) / count(*), 6) AS mean_jac
              |FROM range(20000) GROUP BY 1 ORDER BY grp""".stripMargin)
    })

  /** V2 AGGREGATE function (AggregateFunction — the FunctionCatalog's
    * other half): `graftfns.fns.sumsq_cents` is planned by Spark as a
    * REAL distributed aggregate — the plan carries
    * `partial_v2aggregator` map-side and the final `v2aggregator`
    * above the exchange (PlanAuditSpec pins both), so what this entry
    * proves is the user-supplied partial-aggregation contract, not
    * scalar math. State = one Long of exactly-summed squared integer
    * cents, so partial order can never change a bit and the oracle
    * replays it as plain integer arithmetic over the generator's
    * closed form (cents = (id·7919) mod 10⁴ exactly). */
  val q460_v2_aggregate_function = Q(
    "q460_v2_aggregate_function",
    Some("""WITH g AS (SELECT unnest(generate_series(0, 19999)) AS id),
           |c AS (
           |  SELECT 't' || CAST(id % 7 AS VARCHAR) AS tag,
           |    (id * 7919) % 10000 AS cents
           |  FROM g)
           |SELECT tag, CAST(count(*) AS BIGINT) AS n,
           |  CAST(sum(cents * cents) AS BIGINT) AS ssq
           |FROM c GROUP BY tag ORDER BY tag""".stripMargin),
    (s, d) => {
      // graftfns is bound at session build (ADVICE r12, see q459 note)
      s.read.format("graft.sources.GenDocs")
        .option("rows", "20000").option("slices", "8").load()
        .createOrReplaceTempView("q460_gen")
      s.sql("""SELECT tag, CAST(count(*) AS BIGINT) AS n,
              |  graftfns.fns.sumsq_cents(v) AS ssq
              |FROM q460_gen GROUP BY tag ORDER BY tag""".stripMargin)
    })

  /** NATIVE ROW-LEVEL DELETE (SupportsRowLevelOperations — VERDICT r12
    * #4, the DML rung of the connector ladder): orders seeds a v2
    * row-store table through the catalog-plugin write path, then a SQL
    * `DELETE FROM graftlake.ns...` is planned by Spark's OWN
    * `RewriteDeleteFromTable` into group-based copy-on-write
    * `ReplaceData` — the row-level operation's scan reads the group,
    * Catalyst keeps `NOT coalesce(cond, false)` survivors, and the
    * operation's write replaces the group atomically at driver commit
    * (ExtensionsSpec pins the ReplaceData plan and that the survivors
    * arrive through the operation's writer, not a foreachBatch). The
    * oracle replays seed+delete as a plain WHERE NOT filter. The CDC
    * merge family (q63/q85) applies the same semantics via foreachBatch;
    * this entry proves the engine-native path.
    *
    * FILE-BACKED since r14 (VERDICT r13 #1): the table is
    * `graft.storage`='files' partitioned on o_orderstatus — seed rows
    * land as real parquet files (one group per file, written by tasks,
    * manifest-committed by the driver), and the DELETE's rewrite is
    * pruned by Spark's RowLevelOperationRuntimeGroupFiltering through
    * the scan's SupportsRuntimeV2Filtering: only status='F' files are
    * replaced; 'O'/'P' files stay BYTE-IDENTICAL on disk (FileLakeSpec
    * pins both). That is the 100 TB cow contract — a delete that
    * touches one partition rewrites one partition. Money is exact
    * integer cents. */
  val q463_rowlevel_delete = Q(
    "q463_rowlevel_delete",
    Some("""WITH t AS (
           |  SELECT o_orderkey,
           |    o_orderstatus,
           |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           |      AS cents
           |  FROM orders),
           |kept AS (
           |  SELECT * FROM t
           |  WHERE NOT (o_orderstatus = 'F' AND o_orderkey % 3 = 0))
           |SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
           |  CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_keys,
           |  CAST(sum(cents) AS BIGINT) AS sum_cents
           |FROM kept GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),
    (s, d) => {
      val tbl = "graftlake.ns.q463_orders"
      s.sql(s"DROP TABLE IF EXISTS $tbl")
      s.sql(s"CREATE TABLE $tbl (o_orderkey BIGINT, o_orderstatus STRING, " +
        "cents BIGINT) TBLPROPERTIES('graft.storage'='files', " +
        "'graft.partitioncol'='o_orderstatus')")
      graft.Tables.orders(s, d)
        .select(col("o_orderkey").cast("long").as("o_orderkey"),
          col("o_orderstatus"),
          (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
            .as("cents"))
        .writeTo(tbl).append()
      s.sql(s"DELETE FROM $tbl " +
        "WHERE o_orderstatus = 'F' AND o_orderkey % 3 = 0")
      s.table(tbl)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          countDistinct("o_orderkey").as("n_keys"),
          sum("cents").cast("long").as("sum_cents"))
        .orderBy("o_orderstatus")
    })

  /** NATIVE ROW-LEVEL UPDATE (the second DML rung): `UPDATE ... SET
    * cents = cents + 100 WHERE segment = 'BUILDING'` rewrites to the
    * same group-based `ReplaceData` as q463 — Catalyst turns the SET
    * into per-column `if(cond, new, old)` projections over the
    * operation's scan and the write replaces the group. The oracle
    * replays the conditional arithmetic. Exact integer cents (acctbal
    * can be negative; decimal-cast → long is engine-identical).
    * File-backed + partitioned on c_mktsegment (r14): only the
    * BUILDING segment's files are rewritten; the other four segments'
    * files stay byte-identical (runtime group filter, see q463). */
  val q464_rowlevel_update = Q(
    "q464_rowlevel_update",
    Some("""WITH t AS (
           |  SELECT c_custkey, c_mktsegment,
           |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
           |      AS cents
           |  FROM customer),
           |u AS (
           |  SELECT c_mktsegment,
           |    CASE WHEN c_mktsegment = 'BUILDING' THEN cents + 100
           |         ELSE cents END AS cents
           |  FROM t)
           |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
           |  CAST(sum(cents) AS BIGINT) AS sum_cents
           |FROM u GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),
    (s, d) => {
      val tbl = "graftlake.ns.q464_customer"
      s.sql(s"DROP TABLE IF EXISTS $tbl")
      s.sql(s"CREATE TABLE $tbl (c_custkey BIGINT, c_mktsegment STRING, " +
        "cents BIGINT) TBLPROPERTIES('graft.storage'='files', " +
        "'graft.partitioncol'='c_mktsegment')")
      graft.Tables.customer(s, d)
        .select(col("c_custkey").cast("long").as("c_custkey"),
          col("c_mktsegment"),
          (col("c_acctbal").cast("decimal(18,2)") * 100).cast("long")
            .as("cents"))
        .writeTo(tbl).append()
      s.sql(s"UPDATE $tbl SET cents = cents + 100 " +
        "WHERE c_mktsegment = 'BUILDING'")
      s.table(tbl)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
          sum("cents").cast("long").as("sum_cents"))
        .orderBy("c_mktsegment")
    })

  /** NATIVE MERGE INTO (the CDC workhorse, engine-native): target =
    * even-keyed customers, source = per-customer order-cents totals for
    * div-3 keys (grouped, so MERGE's cardinality contract holds);
    * `WHEN MATCHED UPDATE` adds the total, `WHEN NOT MATCHED INSERT`
    * lands the unmatched source keys as 'NEW' rows. Spark's
    * `RewriteMergeIntoTable` plans the group-based form: a FULL OUTER
    * join target×source feeding `MergeRows`, whose output replaces the
    * group through the SAME ReplaceData write as q463/q464 (RowLevelSpec
    * pins MergeRows + ReplaceData; the runtime group-filter subquery
    * prunes unmatched groups on sources that support it). Oracle =
    * LEFT JOIN + anti-union replay. This is q63/q85's foreachBatch CDC
    * upsert moved onto the engine-native DML path. */
  val q465_rowlevel_merge = Q(
    "q465_rowlevel_merge",
    Some("""WITH tgt AS (
           |  SELECT c_custkey AS k, c_mktsegment AS seg,
           |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
           |      AS cents
           |  FROM customer WHERE c_custkey % 2 = 0),
           |src AS (
           |  SELECT o_custkey AS k,
           |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
           |      AS BIGINT)) AS BIGINT) AS total
           |  FROM orders WHERE o_custkey % 3 = 0 GROUP BY o_custkey),
           |merged AS (
           |  SELECT t.seg, t.cents + COALESCE(s.total, 0) AS cents
           |  FROM tgt t LEFT JOIN src s ON t.k = s.k
           |  UNION ALL
           |  SELECT 'NEW', s.total FROM src s
           |  WHERE s.k NOT IN (SELECT k FROM tgt))
           |SELECT seg, CAST(count(*) AS BIGINT) AS n,
           |  CAST(sum(cents) AS BIGINT) AS sum_cents
           |FROM merged GROUP BY seg ORDER BY seg""".stripMargin),
    (s, d) => {
      val tbl = "graftlake.ns.q465_target"
      s.sql(s"DROP TABLE IF EXISTS $tbl")
      // file-backed (r14); unpartitioned — MERGE's inserts can land in
      // any group, so the safe whole-table ReplaceData is the honest
      // shape here (a keyed lake table would bucket on k)
      s.sql(s"CREATE TABLE $tbl (k BIGINT, seg STRING, cents BIGINT) " +
        "TBLPROPERTIES('graft.storage'='files')")
      graft.Tables.customer(s, d)
        .filter(col("c_custkey") % 2 === 0)
        .select(col("c_custkey").cast("long").as("k"),
          col("c_mktsegment").as("seg"),
          (col("c_acctbal").cast("decimal(18,2)") * 100).cast("long")
            .as("cents"))
        .writeTo(tbl).append()
      graft.Tables.orders(s, d)
        .filter(col("o_custkey") % 3 === 0)
        .groupBy(col("o_custkey").cast("long").as("k"))
        .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long")).cast("long").as("total"))
        .createOrReplaceTempView("q465_src")
      s.sql(
        s"""MERGE INTO $tbl t USING q465_src s ON t.k = s.k
           |WHEN MATCHED THEN UPDATE SET cents = t.cents + s.total
           |WHEN NOT MATCHED THEN INSERT (k, seg, cents)
           |  VALUES (s.k, 'NEW', s.total)""".stripMargin)
      s.table(tbl)
        .groupBy("seg")
        .agg(count(lit(1)).as("n"),
          sum("cents").cast("long").as("sum_cents"))
        .orderBy("seg")
    })

  /** DELTA-BASED (merge-on-read) row-level DML — `SupportsDelta`, the
    * OTHER row-level mode beside q463–q465's group-based copy-on-write:
    * the same SQL DELETE/UPDATE now plans `WriteDelta`, whose scan reads
    * ONLY the matching rows (the plan carries the POSITIVE condition —
    * copy-on-write scans everything and keeps NOT(cond)) and emits
    * per-row deltas (op, rowId[, row]) into the writer's typed
    * delete/update/insert hooks; the driver applies all deltas in one
    * atomic commit. Cheap writes + read-side merge vs cheap reads +
    * group rewrites — exposing both modes is the lakehouse trade-off a
    * 100 TB mutation workload actually tunes. RowLevelSpec pins the
    * WriteDelta plan and the positive-filter shape. Oracle replays
    * delete-then-update arithmetic over part. */
  val q466_rowlevel_delta = Q(
    "q466_rowlevel_delta",
    Some("""WITH t AS (
           |  SELECT p_partkey, p_brand,
           |    CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           |      AS cents
           |  FROM part),
           |afterdel AS (
           |  SELECT * FROM t
           |  WHERE NOT (p_brand = 'Brand#33' AND p_partkey % 2 = 1)),
           |afterup AS (
           |  SELECT p_brand,
           |    CASE WHEN p_brand = 'Brand#13' THEN cents + 7
           |         ELSE cents END AS cents
           |  FROM afterdel)
           |SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
           |  CAST(sum(cents) AS BIGINT) AS sum_cents
           |FROM afterup GROUP BY p_brand ORDER BY p_brand""".stripMargin),
    (s, d) => {
      val tbl = "graftlake.ns.q466_part"
      s.sql(s"DROP TABLE IF EXISTS $tbl")
      // file-backed merge-on-read (r14): the DELETE/UPDATE deltas land
      // as parquet files under delta/ and the BASE files are never
      // rewritten — FileLakeSpec pins base-file byte-identity
      s.sql(s"CREATE TABLE $tbl (p_partkey BIGINT, p_brand STRING, " +
        "cents BIGINT) TBLPROPERTIES('graft.mode'='delta', " +
        "'graft.storage'='files')")
      graft.Tables.part(s, d)
        .select(col("p_partkey").cast("long").as("p_partkey"),
          col("p_brand"),
          (col("p_retailprice").cast("decimal(18,2)") * 100).cast("long")
            .as("cents"))
        .writeTo(tbl).append()
      s.sql(s"DELETE FROM $tbl " +
        "WHERE p_brand = 'Brand#33' AND p_partkey % 2 = 1")
      s.sql(s"UPDATE $tbl SET cents = cents + 7 WHERE p_brand = 'Brand#13'")
      s.table(tbl)
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"),
          sum("cents").cast("long").as("sum_cents"))
        .orderBy("p_brand")
    })

  /** METADATA-ONLY DELETE (SupportsDeleteV2 — the THIRD row-level mode
    * after q463's copy-on-write and q466's merge-on-read): the table
    * declares `graft.partitioncol`, and a DELETE whose every predicate
    * is a plain `=`/`IN` on that column is executed by Spark's
    * OptimizeMetadataOnlyDeleteFromTable as ONE `deleteWhere` catalog
    * call — no scan, no shuffle, no write-back (the executed plan is a
    * bare DeleteFromTable, RowLevelSpec pin). This is the partition-drop
    * every lake format serves from its manifest: at 100 TB, dropping a
    * source/date partition must cost O(metadata), not a full rewrite of
    * the partition's data. The third DELETE here is deliberately NOT
    * partition-aligned (arithmetic on another column) and takes the
    * full ReplaceData rewrite — both paths mixed on one table, final
    * contents oracle-checked. */
  val q469_metadata_delete = Q(
    "q469_metadata_delete",
    Some("""WITH t AS (
           |  SELECT p_partkey, p_brand,
           |    CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           |      AS cents
           |  FROM part),
           |afterm AS (
           |  SELECT * FROM t
           |  WHERE p_brand NOT IN ('Brand#33', 'Brand#13', 'Brand#55')),
           |afterrw AS (SELECT * FROM afterm WHERE NOT (cents % 10 = 1))
           |SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
           |  CAST(sum(cents) AS BIGINT) AS sum_cents
           |FROM afterrw GROUP BY p_brand ORDER BY p_brand""".stripMargin),
    (s, d) => {
      val tbl = "graftlake.ns.q469_part"
      s.sql(s"DROP TABLE IF EXISTS $tbl")
      // file-backed (r14): the two metadata deletes drop whole files
      // from the manifest with zero reads; the third (non-aligned)
      // delete takes the group-filtered ReplaceData rewrite
      s.sql(s"CREATE TABLE $tbl (p_partkey BIGINT, p_brand STRING, " +
        "cents BIGINT) TBLPROPERTIES('graft.partitioncol'='p_brand', " +
        "'graft.storage'='files')")
      graft.Tables.part(s, d)
        .select(col("p_partkey").cast("long").as("p_partkey"),
          col("p_brand"),
          (col("p_retailprice").cast("decimal(18,2)") * 100).cast("long")
            .as("cents"))
        .writeTo(tbl).append()
      // metadata path: equality, then IN — each is one deleteWhere call
      s.sql(s"DELETE FROM $tbl WHERE p_brand = 'Brand#33'")
      s.sql(s"DELETE FROM $tbl WHERE p_brand IN ('Brand#13', 'Brand#55')")
      // rewrite path: not partition-aligned — ReplaceData on survivors
      s.sql(s"DELETE FROM $tbl WHERE cents % 10 = 1")
      s.table(tbl)
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"),
          sum("cents").cast("long").as("sum_cents"))
        .orderBy("p_brand")
    })

  /** ATOMIC CTAS / RTAS (StagingTableCatalog — the catalog's
    * transactional DDL surface beside q463–q466's DML): `CREATE TABLE
    * ... AS SELECT` and `REPLACE TABLE ... AS SELECT` write the
    * SELECT's rows into a STAGED table invisible to readers and publish
    * them in one commit (AtomicCreate/ReplaceTableAsSelectExec,
    * RowLevelSpec pin) — without the interface Spark's fallback drops
    * the old table BEFORE writing, so a mid-write failure destroys it.
    * The entry proves the contract the hard way: after a successful
    * RTAS it runs a SECOND RTAS that fails mid-write (assert_true blows
    * up on the 4th row) and the readable contents must be byte-for-byte
    * the first RTAS's — which is what the oracle checks. At 100 TB this
    * is the atomic-snapshot-swap every daily-rebuild pipeline
    * (dimension refresh, mart rebuild) relies on. */
  val q470_atomic_rtas = Q(
    "q470_atomic_rtas",
    Some("""WITH t AS (
           |  SELECT p_brand,
           |    CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100
           |      AS BIGINT)) AS BIGINT) AS cents
           |  FROM part WHERE p_size <= 25 GROUP BY p_brand)
           |SELECT p_brand, n, cents FROM t ORDER BY p_brand""".stripMargin),
    (s, d) => {
      val tbl = "graftlake.ns.q470_brands"
      s.sql(s"DROP TABLE IF EXISTS $tbl")
      graft.Tables.part(s, d).createOrReplaceTempView("q470_part")
      // atomic CTAS: the seed snapshot (all sizes). File-backed (r14):
      // the staged rows land as parquet files OUT of the manifest; only
      // commit publishes them, and the failed RTAS below must leave the
      // published snapshot's files untouched ON DISK (FileLakeSpec pin)
      s.sql(s"""CREATE TABLE $tbl TBLPROPERTIES('graft.storage'='files') AS
               |SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
               |  CAST(sum(CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100
               |    AS BIGINT)) AS BIGINT) AS cents
               |FROM q470_part GROUP BY p_brand""".stripMargin)
      // atomic RTAS: the refreshed snapshot (sizes <= 25) — one swap
      s.sql(s"""REPLACE TABLE $tbl TBLPROPERTIES('graft.storage'='files') AS
               |SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
               |  CAST(sum(CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100
               |    AS BIGINT)) AS BIGINT) AS cents
               |FROM q470_part WHERE p_size <= 25 GROUP BY p_brand""".stripMargin)
      // a FAILING RTAS mid-write: the staged protocol must leave the
      // refreshed snapshot untouched (this is the oracle's assertion —
      // if the old contents were dropped, the result would be the
      // poisoned SELECT's surviving prefix, not the size<=25 snapshot).
      // The task failure is EXPECTED — Spark logs it with a full stack
      // at ERROR, which used to end the bench tail in a trace (VERDICT
      // r13 #4); scope the scheduler/executor loggers OFF around just
      // this statement and print a marker instead.
      Q.withExpectedTaskFailureSilenced("q470 mid-write failure") {
        try s.sql(s"REPLACE TABLE $tbl " +
          "TBLPROPERTIES('graft.storage'='files') AS SELECT p_brand, " +
          "assert_true(p_size < 4, 'mid-write failure') AS n, " +
          "CAST(0 AS BIGINT) AS cents FROM q470_part")
        catch { case _: Exception => () }
      }
      s.table(tbl).orderBy("p_brand")
    })

  /** SCHEMA-EVOLUTION DDL (ALTER TABLE on the v2 catalog — the DDL
    * face of q118's unionByName read-side evolution): a first
    * generation of rows lands under the narrow schema, `ALTER TABLE
    * ... ADD COLUMN` evolves the table WITHOUT rewriting them (old rows
    * read back null — the lake-format contract: old files stay, readers
    * null-fill), a second generation lands with the new column, and
    * `RENAME COLUMN` is metadata-only. The final aggregate reads both
    * generations through one schema; count(col) vs count(*) makes the
    * null-filled generation visible to the oracle. RowLevelSpec pins
    * add/rename/drop and the protected anchor column. */
  val q471_schema_evolution = Q(
    "q471_schema_evolution",
    Some("""WITH t AS (
           |  SELECT p_partkey, p_brand,
           |    CASE WHEN p_partkey % 2 = 1 THEN
           |      CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           |    END AS price_cents
           |  FROM part)
           |SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
           |  CAST(count(price_cents) AS BIGINT) AS n_priced,
           |  CAST(coalesce(sum(price_cents), 0) AS BIGINT) AS sum_cents
           |FROM t GROUP BY p_brand ORDER BY p_brand""".stripMargin),
    (s, d) => {
      val tbl = "graftlake.ns.q471_part"
      s.sql(s"DROP TABLE IF EXISTS $tbl")
      // file-backed (r14): ADD COLUMN touches the manifest only — the
      // generation-1 parquet files are NEVER rewritten (they predate
      // the column id and null-fill at read), and RENAME is pure
      // metadata because files bind columns by id (FileLakeSpec pins
      // generation-1 byte-identity across both ALTERs)
      s.sql(s"CREATE TABLE $tbl (p_partkey BIGINT, p_brand STRING) " +
        "TBLPROPERTIES('graft.storage'='files')")
      val part = graft.Tables.part(s, d)
        .select(col("p_partkey").cast("long").as("p_partkey"),
          col("p_brand"),
          (col("p_retailprice").cast("decimal(18,2)") * 100).cast("long")
            .as("cents"))
      // generation 1: narrow schema
      part.filter(col("p_partkey") % 2 === 0)
        .select("p_partkey", "p_brand").writeTo(tbl).append()
      // evolve, then generation 2 with the new column
      s.sql(s"ALTER TABLE $tbl ADD COLUMN cents BIGINT")
      part.filter(col("p_partkey") % 2 === 1).writeTo(tbl).append()
      s.sql(s"ALTER TABLE $tbl RENAME COLUMN cents TO price_cents")
      s.table(tbl)
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"),
          count(col("price_cents")).as("n_priced"),
          coalesce(sum("price_cents"), lit(0L)).cast("long").as("sum_cents"))
        .orderBy("p_brand")
    })

  /** DSv2 COLUMNAR read path (`supportColumnarReads` /
    * `createColumnarReader` — the vectorized rung of the connector
    * ladder, the mechanism behind Spark's own vectorized parquet/ORC
    * readers): with `columnar=true` the generator writes its closed
    * forms column-at-a-time into OnHeapColumnVectors, 4096 ids per
    * ColumnarBatch, and the scan feeds WholeStageCodegen through one
    * ColumnarToRow boundary instead of allocating a boxed
    * GenericInternalRow per id. Composes with every scan-time pushdown
    * the source already owns: the id-range predicate still tightens the
    * generated interval, pruning still reaches the vector builder (only
    * the projected fields get a vector), and pushed aggregates/samples
    * fall back to the scalar reader (GenDocsSpec pins all three plus
    * exact row-path parity). At 100 TB the columnar batch shape is
    * what keeps a scan-heavy plan inside the CPU's vector units —
    * per-row materialization is the first thing profilers flag on
    * wide-scan workloads. Oracle replays the closed forms over
    * generate_series, same construction-inversion as q346. */
  val q468_columnar_scan = Q(
    "q468_columnar_scan",
    Some("""SELECT tag,
           |  CAST(count(*) AS BIGINT) AS n,
           |  CAST(sum(CAST(CAST((g.id * 7919) % 10000 AS DECIMAL(18,2))
           |    / 100 AS DECIMAL(18,2))) AS DOUBLE) AS sum_v,
           |  CAST(sum(g.id % 97) AS BIGINT) AS sum_bucket
           |FROM (SELECT unnest(generate_series(2000, 801999)) AS id) g,
           |  LATERAL (SELECT 't' || CAST(g.id % 7 AS VARCHAR) AS tag) t
           |GROUP BY tag ORDER BY tag""".stripMargin),
    (s, d) => {
      val gen = s.read.format("graft.sources.GenDocs")
        .option("rows", "1000000").option("slices", "8")
        .option("columnar", "true").load()
      gen.filter(col("id") >= 2000L && col("id") < 802000L)
        .groupBy("tag")
        .agg(count(lit(1)).as("n"),
          sum(Q.dec(col("v"))).cast("double").as("sum_v"),
          sum("bucket").cast("long").as("sum_bucket"))
        .orderBy("tag")
    })

  val all: Seq[Q] = Seq(q415_topn_pushdown, q438_presorted_join,
    q447_sample_pushdown, q457_offset_pushdown, q458_metadata_slice,
    q459_v2_function_catalog, q460_v2_aggregate_function,
    q463_rowlevel_delete, q464_rowlevel_update, q465_rowlevel_merge,
    q466_rowlevel_delta, q468_columnar_scan, q469_metadata_delete,
    q470_atomic_rtas, q471_schema_evolution)
}
