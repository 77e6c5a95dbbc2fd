package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{HilbertLayout, Layout}
import graft.functions.TextFunctions.hexSpanValSql

/** Round-10 lake-layout additions: Hilbert-curve clustering measured
  * against Z-order.
  */
object LakeOps2 {

  private val HBits = 8 // 256×256 grid → 16-bit keys
  // Key range per "file". DELIBERATELY not a power of 4: a 4^k span
  // makes every file an aligned 2^k×2^k quadrant under BOTH curves —
  // identical spatial partitions, identical file counts (measured: at
  // span 1024 all four boxes tie 4=4). Misaligned 1500-key files
  // (≈44 of them) expose the real difference: a box is few contiguous
  // key runs under Hilbert, many Morton-jump fragments under Z.
  private val FileSpan = 1500L

  /** Z-order vs Hilbert-curve clustering shoot-out: lineitem rows land
    * on a 256×256 (partkey-bucket × orderkey-bucket) grid, each row gets
    * both layout keys (Morton via q77's interleave, Hilbert via the new
    * native codegen'd `hilbert_xy` expression), keys split into ~44
    * equal-width key-range "files", and four representative box
    * predicates count how many files each layout makes a min/max-
    * pruning reader touch. Hilbert's guarantee — every unit key step is
    * a grid-adjacent move, no Morton quadrant jumps — shows up directly
    * as files_hilbert ≤ files_z on compact boxes; this entry is the
    * measured justification for choosing the curve before rewriting
    * 100 TB (the write path itself is q77's repartitionByRange +
    * sortWithinPartitions, unchanged).
    *
    * Oracle: the SQL twin replays the identical xy→d walk as a chained
    * per-level CTE rotation (HilbertLayout.hilbertCtesSql), so the
    * native expression is pinned bit-for-bit at every grid cell the
    * data exercises. */
  val q390_hilbert_layout = Q(
    "q390_hilbert_layout", {
      val z = Layout.zValueSql("x", "y", HBits)
      val (hCtes, hLast) = HilbertLayout.hilbertCtesSql("src", HBits)
      Some(s"""WITH src AS (
              |  SELECT CAST(l_partkey % 256 AS BIGINT) AS x,
              |    CAST(l_orderkey % 256 AS BIGINT) AS y
              |  FROM lineitem),
              |$hCtes,
              |keyed AS (
              |  SELECT x, y, CAST($z AS BIGINT) AS zk, hd AS hk
              |  FROM $hLast),
              |boxes AS (
              |  SELECT * FROM (VALUES
              |    (CAST(1 AS BIGINT), 0, 63, 0, 63),
              |    (2, 96, 159, 96, 159),
              |    (3, 200, 255, 0, 55),
              |    (4, 32, 47, 128, 255)) b(box_id, x1, x2, y1, y2))
              |SELECT b.box_id,
              |  CAST(count(*) AS BIGINT) AS n_rows,
              |  CAST(count(DISTINCT k.zk // $FileSpan) AS BIGINT) AS files_z,
              |  CAST(count(DISTINCT k.hk // $FileSpan) AS BIGINT)
              |    AS files_hilbert
              |FROM keyed k JOIN boxes b
              |  ON k.x BETWEEN b.x1 AND b.x2 AND k.y BETWEEN b.y1 AND b.y2
              |GROUP BY b.box_id
              |ORDER BY b.box_id""".stripMargin)
    },
    (s, d) => {
      import s.implicits._
      val keyed = Tables.lineitem(s, d)
        .select((col("l_partkey") % 256).cast("long").as("x"),
          (col("l_orderkey") % 256).cast("long").as("y"))
        .withColumn("zk", Layout.zValue(col("x"), col("y"), HBits))
        .withColumn("hk", HilbertLayout.hilbertValue(col("x"), col("y"),
          HBits))
      val boxes = Seq((1L, 0, 63, 0, 63), (2L, 96, 159, 96, 159),
        (3L, 200, 255, 0, 55), (4L, 32, 47, 128, 255))
        .toDF("box_id", "x1", "x2", "y1", "y2")
      keyed.join(broadcast(boxes),
          col("x").between(col("x1"), col("x2")) &&
            col("y").between(col("y1"), col("y2")))
        .groupBy("box_id")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(expr(s"zk div $FileSpan")).as("files_z"),
          countDistinct(expr(s"hk div $FileSpan")).as("files_hilbert"))
        .orderBy("box_id")
    })

  private val DvFiles = 16

  /** Deletion-vector merge-on-read (the Delta/Iceberg v2 "position
    * delete" path): rows live in 16 immutable "files" keyed by a
    * derived in-file position; deletes land NOT as rewrites but as a
    * per-file sidecar of dead positions; a read applies the sidecar as
    * a scan-side membership test. Here the DV sidecar is built as one
    * sorted position array per file (an md5 rule kills ~3/16 of rows),
    * broadcast to the scan, and applied with array_contains — the
    * real merge-on-read shape where the DV is KB-scale metadata riding
    * the broadcast, NEVER a row-level anti-join shuffle (the oracle states the delete
    * rule inline — construction inversion). Output:
    * per-file total/deleted/surviving counts and a surviving-rows
    * checksum.
    *
    * Scale note: a per-file DV is a compressed bitmap a few KB wide
    * even for multi-GB files — collecting it to the broadcast side is
    * the design, not a shortcut; the data path stays one scan. */
  val q401_deletion_vectors = Q(
    "q401_deletion_vectors",
    Some(s"""WITH rows_ AS (
            |  SELECT DISTINCT l_orderkey % $DvFiles AS file_id,
            |    (l_orderkey // $DvFiles) * 10 + l_linenumber AS pos,
            |    l_orderkey AS ok
            |  FROM lineitem),
            |flagged AS (
            |  SELECT file_id, pos, ok,
            |    ${hexDigit("md5(CAST(file_id * 10000000 + pos AS VARCHAR))")}
            |      < 3 AS dead
            |  FROM rows_)
            |SELECT file_id,
            |  CAST(count(*) AS BIGINT) AS n_rows,
            |  CAST(sum(CASE WHEN dead THEN 1 ELSE 0 END) AS BIGINT)
            |    AS n_deleted,
            |  CAST(sum(CASE WHEN dead THEN 0 ELSE 1 END) AS BIGINT)
            |    AS n_surviving,
            |  CAST(sum(CASE WHEN dead THEN NULL ELSE ok END) AS BIGINT)
            |    AS survivor_checksum
            |FROM flagged
            |GROUP BY file_id
            |ORDER BY file_id""".stripMargin),
    (s, d) => {
      // DISTINCT: (l_orderkey, l_linenumber) pairs duplicate in the
      // testdata (the known trap) — the derived position must be unique
      // within its file for deletion-vector semantics to be well-formed
      val rows = graft.operators.PlanCache.persist(
        Tables.lineitem(s, d).select(
          (col("l_orderkey") % DvFiles).as("file_id"),
          (expr(s"l_orderkey div $DvFiles") * 10 + col("l_linenumber"))
            .as("pos"),
          col("l_orderkey").as("ok")).distinct())
      // the DV sidecar: one sorted dead-position array per file —
      // bounded per-file metadata, the unit a real reader broadcasts
      val dv = rows
        .withColumn("__h",
          md5((col("file_id") * 10000000 + col("pos")).cast("string")))
        .filter(expr(hexDigit("__h")) < 3)
        .groupBy("file_id")
        .agg(array_sort(collect_list(col("pos"))).as("dead"))
      val read = rows.join(broadcast(dv), Seq("file_id"), "left")
        .withColumn("is_dead",
          coalesce(array_contains(col("dead"), col("pos")), lit(false)))
      read.groupBy("file_id")
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("is_dead"), 1L).otherwise(0L)).cast("long")
            .as("n_deleted"),
          sum(when(!col("is_dead"), 1L).otherwise(0L)).cast("long")
            .as("n_surviving"),
          sum(when(!col("is_dead"), col("ok"))).cast("long")
            .as("survivor_checksum"))
        .orderBy("file_id")
    })

  private def hexDigit(h: String): String =
    graft.functions.TextFunctions.hexSpanValSql(h, 0, 1)

  /** Partition-column advisor — the decision every lake schema faces
    * once: for each candidate partition key of the events stream
    * (type, day, user bucket, hash bucket), report the metrics that
    * decide it: partition count, median partition rows (file-size
    * proxy), EXPECTED SCAN FRACTION under a volume-weighted equality
    * predicate — which is exactly Σp² (a query hits partition v with
    * probability ∝ its volume, then reads p_v of the data; q317's HHI
    * reused as an I/O forecast) — and the count of tiny partitions
    * (< 10% of the mean, the small-file smell). Low scan_frac wants
    * MANY partitions; healthy file sizes want FEW; the table makes the
    * tension explicit instead of folklore.
    *
    * Scale shape: one grouped agg per candidate to its bounded
    * partition grid; medians and HHI run on grid rows. */
  val q423_partition_advisor = Q(
    "q423_partition_advisor", {
      def cand(name: String, key: String) =
        s"""SELECT '$name' AS candidate,
           |  CAST(count(*) AS BIGINT) AS n_parts,
           |  CAST(quantile_disc(k, 0.5) AS BIGINT) AS p50_rows,
           |  round(sum(CAST(k AS DOUBLE) * k)
           |    / (sum(CAST(k AS DOUBLE)) * sum(CAST(k AS DOUBLE))), 6)
           |    AS scan_frac,
           |  CAST(sum(CASE WHEN k * np * 10 < tot THEN 1 ELSE 0 END)
           |    AS BIGINT) AS tiny_parts
           |FROM (
           |  SELECT k, count(*) OVER () AS np,
           |    CAST(sum(k) OVER () AS BIGINT) AS tot
           |  FROM (SELECT $key AS v, CAST(count(*) AS BIGINT) AS k
           |        FROM events GROUP BY 1) g0) g""".stripMargin
      Some(s"""${cand("event_type", "event_type")}
              |UNION ALL
              |${cand("day", "CAST(epoch_us(ts) // 86400000000 AS BIGINT)")}
              |UNION ALL
              |${cand("user_bucket", "user_id % 256")}
              |UNION ALL
              |${cand("hash_bucket",
                hexSpanValSql("md5(CAST(event_id AS VARCHAR))", 0, 8)
                  + " % 64")}
              |ORDER BY candidate""".stripMargin)
    },
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ev = graft.operators.PlanCache.persist(
        Tables.events(s, d).select(col("event_id"), col("user_id"),
          col("event_type"), expr("(ts div 1000) div 86400000000").as("day"))
          .withColumn("__h", md5(col("event_id").cast("string"))))
      def cand(name: String, key: org.apache.spark.sql.Column) = {
        val g = ev.groupBy(key.as("v")).agg(count(lit(1)).as("k"))
        val w = Window.partitionBy()
        val ranked = g
          .withColumn("np", count(lit(1)).over(w))
          .withColumn("tot", sum("k").over(w).cast("long"))
          .withColumn("rn", row_number().over(Window.orderBy("k", "v")))
        ranked
          .agg(first(col("np")).as("n_parts0"),
            min(when(col("rn") * 2 >= col("np"), col("k"))).as("p50_rows"),
            round(sum(col("k").cast("double") * col("k"))
              / (sum(col("k").cast("double"))
                * sum(col("k").cast("double"))), 6).as("scan_frac"),
            sum(when(col("k") * col("np") * 10 < col("tot"), 1L)
              .otherwise(0L)).cast("long").as("tiny_parts"))
          .select(lit(name).as("candidate"),
            col("n_parts0").cast("long").as("n_parts"), col("p50_rows"),
            col("scan_frac"), col("tiny_parts"))
      }
      cand("event_type", col("event_type"))
        .unionByName(cand("day", col("day")))
        .unionByName(cand("user_bucket", col("user_id") % 256))
        .unionByName(cand("hash_bucket",
          expr(hexSpanValSql("__h", 0, 8)) % 64))
        .orderBy("candidate")
    })

  /** Zone-map OVERLAP DEPTH — the clustering-health metric behind
    * q138/q201's min-max skipping: model files as 50-doc ingest chunks
    * per source and take each file's (min, max) n_chars zone map; the
    * overlap depth at value x is how many files a point query x must
    * open. max depth ≈ 1 means the layout is effectively clustered on
    * n_chars; depth ≈ n_files means zone maps prune nothing (the
    * signal that a re-cluster/OPTIMIZE pays). Computed by the classic
    * boundary sweep: +1 at min, −1 at max+1, deltas grouped per
    * boundary value, cumulative sum over the boundary grid.
    *
    * Scale shape: one (source, file) stats agg — file METADATA, the
    * q245 class: rows = files, not data — then source-PARTITIONED
    * cumulative windows over ≤2 boundaries per file. The data itself
    * is scanned once for the stats agg. */
  val q428_zone_overlap_depth = Q(
    "q428_zone_overlap_depth",
    Some("""WITH f AS (
           |  SELECT source, doc_id // 50 AS file_id,
           |    CAST(min(n_chars) AS BIGINT) AS lo,
           |    CAST(max(n_chars) AS BIGINT) AS hi
           |  FROM documents GROUP BY 1, 2),
           |meta AS (
           |  SELECT source, CAST(count(*) AS BIGINT) AS n_files
           |  FROM f GROUP BY source),
           |ev AS (
           |  SELECT source, lo AS x, 1 AS delta FROM f
           |  UNION ALL SELECT source, hi + 1, -1 FROM f),
           |gx AS (
           |  SELECT source, x, CAST(sum(delta) AS BIGINT) AS dsum
           |  FROM ev GROUP BY 1, 2),
           |cum AS (
           |  SELECT source, x,
           |    CAST(sum(dsum) OVER (PARTITION BY source ORDER BY x
           |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS depth
           |  FROM gx),
           |mx AS (
           |  SELECT source, max(depth) AS max_depth FROM cum
           |  GROUP BY source)
           |SELECT m.source, meta.n_files, m.max_depth,
           |  CAST(min(c.x) AS BIGINT) AS first_max_x,
           |  round(CAST(m.max_depth AS DOUBLE) / meta.n_files, 6)
           |    AS overlap_frac
           |FROM mx m
           |JOIN meta ON meta.source = m.source
           |JOIN cum c ON c.source = m.source AND c.depth = m.max_depth
           |GROUP BY m.source, meta.n_files, m.max_depth
           |ORDER BY m.source""".stripMargin),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val f = graft.operators.PlanCache.persist(Tables.documents(s, d)
        .groupBy(col("source"), expr("doc_id div 50").as("file_id"))
        .agg(min("n_chars").cast("long").as("lo"),
          max("n_chars").cast("long").as("hi")))
      val meta = f.groupBy("source").agg(count(lit(1)).as("n_files"))
      val ev = f.select(col("source"), col("lo").as("x"), lit(1).as("delta"))
        .unionAll(f.select(col("source"), (col("hi") + 1).as("x"),
          lit(-1).as("delta")))
      val gx = ev.groupBy("source", "x")
        .agg(sum("delta").cast("long").as("dsum"))
      val wcum = Window.partitionBy("source").orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = gx.select(col("source"), col("x"),
        sum("dsum").over(wcum).cast("long").as("depth"))
      val mx = cum.groupBy("source").agg(max("depth").as("max_depth"))
      mx.join(broadcast(meta), "source")
        .join(cum.withColumnRenamed("depth", "cdepth"), "source")
        .filter(col("cdepth") === col("max_depth"))
        .groupBy("source", "n_files", "max_depth")
        .agg(min("x").cast("long").as("first_max_x"))
        .select(col("source"), col("n_files"), col("max_depth"),
          col("first_max_x"),
          round(col("max_depth").cast("double") / col("n_files"), 6)
            .as("overlap_frac"))
        .orderBy("source")
    })

  /** AQE partition-COALESCING simulation: model the post-shuffle state
    * of a 200-way hash repartition (pid = user_id mod 200, 32 B/row)
    * and apply the deterministic coalescing rule `group =
    * cum_bytes_exclusive div target` (target 256 KiB — a stated
    * simplification of AQE's greedy adjacent-merge, same asymptotics)
    * — the readout that justifies `spark.sql.adaptive.coalesce-
    * Partitions`: how many of the 200 reducers survive, how balanced
    * the merged groups are vs the raw ones. At sf0.001 everything
    * collapses to one group; at sf0.1 ~¼ survive — the knob's whole
    * point made measurable.
    *
    * Scale shape: one 200-group agg; cumulative window on the 200-row
    * partition grid; two 1-row roll-ups. */
  val q452_aqe_coalesce_sim = Q(
    "q452_aqe_coalesce_sim",
    Some("""WITH p AS (
           |  SELECT user_id % 200 AS pid,
           |    CAST(count(*) * 32 AS BIGINT) AS bytes
           |  FROM events GROUP BY 1),
           |c AS (
           |  SELECT pid, bytes,
           |    CAST(coalesce(sum(bytes) OVER (ORDER BY pid
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |      AS BIGINT) // 262144 AS grp
           |  FROM p),
           |g AS (
           |  SELECT grp, CAST(sum(bytes) AS BIGINT) AS gbytes FROM c
           |  GROUP BY grp),
           |before AS (
           |  SELECT CAST(count(*) AS BIGINT) AS n_before,
           |    CAST(max(bytes) AS BIGINT) AS max_before,
           |    CAST(sum(bytes) AS BIGINT) AS total FROM p),
           |after AS (
           |  SELECT CAST(count(*) AS BIGINT) AS n_after,
           |    CAST(max(gbytes) AS BIGINT) AS max_after,
           |    CAST(min(gbytes) AS BIGINT) AS min_after FROM g)
           |SELECT n_before, n_after, total AS total_bytes,
           |  max_before, max_after,
           |  round(CAST(max_before AS DOUBLE) * n_before / total, 6)
           |    AS skew_before,
           |  round(CAST(max_after AS DOUBLE) * n_after / total, 6)
           |    AS skew_after
           |FROM before CROSS JOIN after""".stripMargin),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val p = graft.operators.PlanCache.persist(Tables.events(s, d)
        .groupBy((col("user_id") % 200).as("pid"))
        .agg((count(lit(1)) * 32).cast("long").as("bytes")))
      val wx = Window.orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)
      // double division + long cast == floor-div for non-negative bytes
      val cumx = coalesce(sum("bytes").over(wx), lit(0L)).cast("long")
      val c = p.select(col("pid"), col("bytes"),
        (cumx / 262144).cast("long").as("grp"))
      val g = c.groupBy("grp").agg(sum("bytes").cast("long").as("gbytes"))
      val before = p.agg(count(lit(1)).as("n_before"),
        max("bytes").cast("long").as("max_before"),
        sum("bytes").cast("long").as("total"))
      val after = g.agg(count(lit(1)).as("n_after"),
        max("gbytes").cast("long").as("max_after"),
        min("gbytes").cast("long").as("min_after"))
      before.crossJoin(broadcast(after))
        .select(col("n_before"), col("n_after"),
          col("total").as("total_bytes"),
          col("max_before"), col("max_after"),
          round(col("max_before").cast("double") * col("n_before")
            / col("total"), 6).as("skew_before"),
          round(col("max_after").cast("double") * col("n_after")
            / col("total"), 6).as("skew_after"))
    })

  val all: Seq[Q] = Seq(q390_hilbert_layout, q401_deletion_vectors,
    q423_partition_advisor, q428_zone_overlap_depth, q452_aqe_coalesce_sim)
}
