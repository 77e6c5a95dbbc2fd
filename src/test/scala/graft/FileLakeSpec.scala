package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** FILE-LEVEL pins for the parquet-backed row store (VERDICT r13 #1):
  * the DML protocol rungs were already oracle-green on the memory
  * store; what these tests add is the part only a lake exercises —
  * WHICH FILES move on disk:
  *   - copy-on-write rewrites ONLY the touched groups' files (runtime
  *     group filtering), untouched groups stay byte-identical;
  *   - merge-on-read writes delta files and leaves base files
  *     byte-identical;
  *   - a metadata delete drops whole files without a rewrite;
  *   - a failed RTAS leaves the published snapshot's files on disk;
  *   - schema evolution (ADD/RENAME) never rewrites a data file;
  *   - the data files are ordinary parquet (spark.read.parquet reads
  *     them back).
  */
class FileLakeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** name → md5 of every parquet file under the table dir. */
  private def snap(dir: String): Map[String, String] = {
    import scala.jdk.CollectionConverters._
    val base = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.exists(base)) Map.empty
    else java.nio.file.Files.walk(base).iterator().asScala
      .filter(_.toString.endsWith(".parquet"))
      .map { p =>
        val md = java.security.MessageDigest.getInstance("MD5")
        base.relativize(p).toString ->
          md.digest(java.nio.file.Files.readAllBytes(p))
            .map("%02x".format(_)).mkString
      }.toMap
  }

  private def tableDir(tbl: String): String =
    sources.FileStore.tableDir(tbl.stripPrefix("graftlake.")).getOrElse(
      fail(s"no file-store dir for $tbl"))

  private def groupFiles(tbl: String, g: String): Set[String] =
    sources.FileStore.stateOf(tbl.stripPrefix("graftlake.")).get
      .files.filter(_.group.exists(_.toString == g)).map(_.name).toSet

  test("cow DELETE rewrites only the matching group's files; " +
      "other groups byte-identical (runtime group filter)") {
    import spark.implicits._
    val tbl = "graftlake.ns.spec_fl_cow"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, status STRING, cents BIGINT) " +
      "TBLPROPERTIES('graft.storage'='files', " +
      "'graft.partitioncol'='status')")
    (1L to 60L).map(k => (k, Seq("F", "O", "P")((k % 3).toInt), k * 10L))
      .toDF("k", "status", "cents").repartition(3)
      .writeTo(tbl).append()
    val dir = tableDir(tbl)
    val before = snap(dir)
    val fBefore = groupFiles(tbl, "F")
    val oBefore = groupFiles(tbl, "O")
    val pBefore = groupFiles(tbl, "P")
    assert(fBefore.nonEmpty && oBefore.nonEmpty && pBefore.nonEmpty)

    val del = spark.sql(s"DELETE FROM $tbl WHERE status = 'F' AND k % 2 = 0")
    assert(del.queryExecution.optimizedPlan.toString.contains("ReplaceData"),
      "DELETE did not plan through ReplaceData")

    val after = snap(dir)
    // untouched groups: same file names, same bytes
    for (n <- oBefore ++ pBefore)
      assert(after.get(n) == before.get(n),
        s"untouched-group file $n changed or vanished")
    // touched group: every old file left the MANIFEST (replaced by the
    // rewrite) but stays on disk as the retained snapshot until VACUUM
    val fAfter = groupFiles(tbl, "F")
    for (n <- fBefore) {
      assert(!fAfter.contains(n), s"matched-group file $n was not replaced")
      assert(after.get(n) == before.get(n),
        s"retired file $n should stay byte-identical until VACUUM")
    }
    assert(fAfter.nonEmpty, "F survivors missing")
    // VACUUM is the explicit forget: history dropped, retired files gone
    val vac = spark.sql(s"CALL graftlake.system.vacuum('ns.spec_fl_cow')")
      .head.getLong(0)
    assert(vac >= fBefore.size, s"vacuum deleted $vac files")
    val cleaned = snap(dir)
    for (n <- fBefore)
      assert(!cleaned.contains(n), s"vacuum left retired file $n")
    for (n <- oBefore ++ pBefore)
      assert(cleaned.get(n) == before.get(n),
        s"vacuum touched live file $n")
    // and the data is right
    val left = spark.table(tbl).agg(count(lit(1)), sum("cents")).head
    val expect = (1L to 60L)
      .filterNot(k => (k % 3) == 0 && k % 2 == 0) // status F = k%3==0
    assert(left.getLong(0) == expect.size)
    assert(left.getLong(1) == expect.map(_ * 10L).sum)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("merge-on-read: deltas land under delta/, base files " +
      "byte-identical across DELETE, UPDATE and MERGE generations") {
    import spark.implicits._
    val tbl = "graftlake.ns.spec_fl_mor"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, seg STRING, cents BIGINT) " +
      "TBLPROPERTIES('graft.mode'='delta', 'graft.storage'='files')")
    (1L to 20L).map(k => (k, if (k % 2 == 0) "E" else "O", k * 100L))
      .toDF("k", "seg", "cents").repartition(2).writeTo(tbl).append()
    val dir = tableDir(tbl)
    val baseFiles = snap(dir).filter(_._1.startsWith("data/"))
    assert(baseFiles.nonEmpty)

    val del = spark.sql(s"DELETE FROM $tbl WHERE k % 5 = 0")
    assert(del.queryExecution.optimizedPlan.toString.contains("WriteDelta"),
      "delta-mode DELETE did not plan through WriteDelta")
    spark.sql(s"UPDATE $tbl SET cents = cents + 7 WHERE seg = 'E'")
    Seq((2L, 1L), (99L, 9900L)).toDF("k", "delta")
      .createOrReplaceTempView("spec_fl_mor_src")
    spark.sql(
      s"""MERGE INTO $tbl t USING spec_fl_mor_src s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET cents = t.cents + s.delta
         |WHEN NOT MATCHED THEN INSERT (k, seg, cents)
         |  VALUES (s.k, 'N', s.delta)""".stripMargin)

    val after = snap(dir)
    for ((n, h) <- baseFiles)
      assert(after.get(n).contains(h), s"base file $n was rewritten")
    assert(after.keys.exists(_.startsWith("delta/")),
      "no delta files were written")

    // replay the three generations over the seed, in order
    var rows = (1L to 20L)
      .map(k => (k, if (k % 2 == 0) "E" else "O", k * 100L))
    rows = rows.filterNot(_._1 % 5 == 0)
    rows = rows.map { case (k, s, c) => (k, s, if (s == "E") c + 7 else c) }
    rows = rows.map { case (k, s, c) => (k, s, if (k == 2L) c + 1 else c) } :+
      ((99L, "N", 9900L))
    val got = spark.table(tbl).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == rows.sortBy(_._1), s"merged read mismatch:\n$got")
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("metadata delete drops whole files; no rewrite, others untouched") {
    import spark.implicits._
    val tbl = "graftlake.ns.spec_fl_meta"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, status STRING) " +
      "TBLPROPERTIES('graft.storage'='files', " +
      "'graft.partitioncol'='status')")
    (1L to 30L).map(k => (k, Seq("A", "B", "C")((k % 3).toInt)))
      .toDF("k", "status").repartition(2).writeTo(tbl).append()
    val dir = tableDir(tbl)
    val before = snap(dir)
    val aFiles = groupFiles(tbl, "A")
    assert(aFiles.nonEmpty)

    // the EXECUTED plan is the pin — the optimized DeleteFromTable node
    // keeps the rewrite as its nested fallback child (see RowLevelSpec)
    val del = spark.sql(s"DELETE FROM $tbl WHERE status = 'A'")
    val plan = del.queryExecution.executedPlan.toString
    assert(!plan.contains("ReplaceData"),
      s"partition-aligned DELETE took the rewrite path:\n$plan")

    // a metadata delete is a pure MANIFEST operation: the disk is
    // UNTOUCHED — dropped files stay (retained snapshot), nothing new
    // is written, nothing is read
    assert(snap(dir) == before, "metadata delete disturbed the disk")
    assert(groupFiles(tbl, "A").isEmpty, "dropped partition still listed")
    assert(spark.table(tbl).filter(col("status") === "A").count() == 0)
    // vacuum deletes exactly the dropped partition's files
    val vac = spark.sql(s"CALL graftlake.system.vacuum('ns.spec_fl_meta')")
      .head.getLong(0)
    assert(vac == aFiles.size, s"vacuum deleted $vac, expected ${aFiles.size}")
    assert(snap(dir).keySet.filter(_.startsWith("data/")) ==
      before.keySet.filter(_.startsWith("data/")) -- aFiles)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("failed RTAS leaves the published snapshot's files on disk; " +
      "successful RTAS swaps them atomically") {
    import spark.implicits._
    val tbl = "graftlake.ns.spec_fl_rtas"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    (1L to 10L).map(k => (k, k * 2L)).toDF("k", "v")
      .createOrReplaceTempView("spec_fl_rtas_src")
    spark.sql(s"CREATE TABLE $tbl TBLPROPERTIES('graft.storage'='files') " +
      "AS SELECT k, v FROM spec_fl_rtas_src")
    val dir = tableDir(tbl)
    val published = snap(dir)
    assert(published.nonEmpty)

    // poisoned RTAS: fails mid-write; snapshot must be untouched
    queries.Q.withExpectedTaskFailureSilenced("spec_fl_rtas poison") {
      intercept[Exception] {
        spark.sql(s"REPLACE TABLE $tbl " +
          "TBLPROPERTIES('graft.storage'='files') AS " +
          "SELECT k, assert_true(k < 3, 'poison') AS v " +
          "FROM spec_fl_rtas_src")
      }
    }
    assert(snap(dir) == published,
      "failed RTAS disturbed the published snapshot's files")
    assert(spark.table(tbl).count() == 10)

    // successful RTAS: old files leave the MANIFEST (stay on disk as a
    // snapshot), new snapshot readable; VERSION AS OF reads the old one
    spark.sql(s"REPLACE TABLE $tbl " +
      "TBLPROPERTIES('graft.storage'='files') AS " +
      "SELECT k, v * 10 AS v FROM spec_fl_rtas_src WHERE k <= 4")
    assert(spark.table(tbl).count() == 4)
    assert(spark.table(tbl).agg(sum("v")).head.getLong(0) == 200L)
    for ((n, h) <- published)
      assert(snap(dir).get(n).contains(h),
        s"pre-RTAS file $n should survive until VACUUM")
    val old = spark.sql(s"SELECT sum(v) FROM $tbl VERSION AS OF 1")
      .head.getLong(0)
    assert(old == (1L to 10L).map(_ * 2).sum, s"time travel read $old")
    // vacuum forgets the old snapshot; the versioned read then fails
    spark.sql(s"CALL graftlake.system.vacuum('ns.spec_fl_rtas')")
    for (n <- published.keys)
      assert(!snap(dir).contains(n), s"vacuum left pre-RTAS file $n")
    intercept[Exception] {
      spark.sql(s"SELECT sum(v) FROM $tbl VERSION AS OF 1").collect()
    }
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("ALTER ADD/RENAME never rewrites data files; old files " +
      "null-fill; files are plain parquet") {
    import spark.implicits._
    val tbl = "graftlake.ns.spec_fl_evo"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, tag STRING) " +
      "TBLPROPERTIES('graft.storage'='files')")
    (1L to 5L).map(k => (k, s"t$k")).toDF("k", "tag")
      .coalesce(1).writeTo(tbl).append()
    val dir = tableDir(tbl)
    val gen1 = snap(dir)
    assert(gen1.size == 1)

    spark.sql(s"ALTER TABLE $tbl ADD COLUMN score BIGINT")
    (6L to 8L).map(k => (k, s"t$k", k * 11L)).toDF("k", "tag", "score")
      .coalesce(1).writeTo(tbl).append()
    spark.sql(s"ALTER TABLE $tbl RENAME COLUMN score TO points")

    val after = snap(dir)
    for ((n, h) <- gen1)
      assert(after.get(n).contains(h),
        s"generation-1 file $n was rewritten by ALTER")

    val got = spark.table(tbl).orderBy("k")
      .select("k", "points").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(got.toSeq == Seq((1L, -1L), (2L, -1L), (3L, -1L), (4L, -1L),
      (5L, -1L), (6L, 66L), (7L, 77L), (8L, 88L)), got.mkString(", "))

    // the files are ordinary parquet: Spark's own reader reads them
    // (columns are id-named c0, c1, …)
    val raw = spark.read.parquet(s"$dir/data")
    assert(raw.columns.toSet.contains("c0"))
    assert(raw.count() == 8)

    // time travel ACROSS schema evolution: version 2 (post gen-1
    // append) reads with ITS OWN schema — no score/points column, only
    // the 5 gen-1 rows — over the very same files the current version
    // reads through the evolved schema
    val v2 = spark.sql(s"SELECT * FROM $tbl VERSION AS OF 2")
    assert(v2.columns.toSeq == Seq("k", "tag"), v2.columns.mkString(","))
    assert(v2.count() == 5)
    // and version 4 (post gen-2, pre-RENAME) still calls it `score`
    val v4 = spark.sql(s"SELECT * FROM $tbl VERSION AS OF 4")
    assert(v4.columns.toSeq == Seq("k", "tag", "score"),
      v4.columns.mkString(","))
    assert(v4.where(col("score").isNotNull).count() == 3)

    // TIMESTAMP AS OF binds to the latest commit at or before the
    // instant: "now" resolves to the current version, and an instant
    // before the table existed is a loud error (never an empty read)
    val now = spark.sql(
      s"SELECT count(*) FROM $tbl TIMESTAMP AS OF current_timestamp()")
      .head.getLong(0)
    assert(now == 8L, s"TIMESTAMP AS OF now read $now rows")
    intercept[Exception] {
      spark.sql(s"SELECT * FROM $tbl " +
        "TIMESTAMP AS OF TIMESTAMP'1999-01-01 00:00:00'").collect()
    }
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("CALL compact bin-packs multi-file groups, leaves single-file " +
      "groups byte-identical; snapshots procedure lists the history") {
    import spark.implicits._
    val tbl = "graftlake.ns.spec_fl_cmp"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, g STRING, v BIGINT) " +
      "TBLPROPERTIES('graft.storage'='files', 'graft.partitioncol'='g')")
    // three appends → three files per group for g0/g1; g2 seeded once
    for (i <- 0 until 3)
      (1L to 10L).map(k => (k + i * 10, s"g${k % 2}", k))
        .toDF("k", "g", "v").coalesce(1).writeTo(tbl).append()
    (1L to 5L).map(k => (k + 100, "g2", k)).toDF("k", "g", "v")
      .coalesce(1).writeTo(tbl).append()
    val dir = tableDir(tbl)
    val g2Files = groupFiles(tbl, "g2")
    assert(g2Files.size == 1)
    assert(groupFiles(tbl, "g0").size == 3 && groupFiles(tbl, "g1").size == 3)
    val before = snap(dir)
    val contents = spark.table(tbl).orderBy("k").collect().map(_.toString)

    val res = spark.sql(s"CALL graftlake.system.compact('ns.spec_fl_cmp')")
      .head
    assert((res.getLong(0), res.getLong(1), res.getLong(2)) == ((2L, 7L, 3L)),
      res.toString) // 2 multi-file groups, 7 files -> 3

    assert(groupFiles(tbl, "g0").size == 1 && groupFiles(tbl, "g1").size == 1)
    // the single-file group's file is untouched on disk
    for (n <- g2Files)
      assert(snap(dir).get(n) == before.get(n), s"compact touched $n")
    // contents are row-identical
    assert(spark.table(tbl).orderBy("k").collect().map(_.toString)
      .sameElements(contents), "compaction changed table contents")
    // history lists every commit: create=1, 4 appends, compact -> v6
    val snaps = spark.sql(
      s"CALL graftlake.system.snapshots('ns.spec_fl_cmp')")
      .orderBy(col("version")).collect()
    assert(snaps.length == 6, snaps.mkString(", "))
    assert(snaps.last.getLong(0) == 6L && snaps.last.getBoolean(1))
    assert(snaps.last.getLong(4) == 35L) // 30 + 5 rows
    // pre-compaction version still readable (files retained)
    assert(spark.sql(s"SELECT count(*) FROM $tbl VERSION AS OF 5")
      .head.getLong(0) == 35L)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("file-backed streaming upsert: epochs land as delta files, " +
      "base files untouched, replay skipped, abort traceless") {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.unsafe.types.UTF8String
    import spark.implicits._
    val tbl = "graftlake.ns.spec_fl_up"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, v STRING) " +
      "TBLPROPERTIES('graft.storage'='files')")
    Seq((1L, "base1"), (2L, "base2"), (5L, "base5")).toDF("k", "v")
      .coalesce(1).writeTo(tbl).append()
    val dir = tableDir(tbl)
    val baseFiles = snap(dir).filter(_._1.startsWith("data/"))
    assert(baseFiles.nonEmpty)

    val sw = new graft.sources.FileStreamingUpsert("ns.spec_fl_up")
    val factory = sw.createStreamingWriterFactory(null)
    def msg(epoch: Long, rows: (Long, String)*) = {
      val w = factory.createWriter(0, 0L, epoch)
      rows.foreach { case (k, v) => w.write(new GenericInternalRow(
        Array[Any](k, UTF8String.fromString(v)))) }
      Array(w.commit())
    }
    sw.commit(0L, msg(0L, 1L -> "a", 3L -> "c"))
    val deltasAfter0 = snap(dir).keySet.count(_.startsWith("delta/"))
    // replayed epoch 0 with divergent content: skipped, AND the
    // replay's freshly written file leaves the disk (never manifested)
    sw.commit(0L, msg(0L, 1L -> "STALE", 9L -> "STALE"))
    assert(snap(dir).keySet.count(_.startsWith("delta/")) == deltasAfter0,
      "replayed epoch left a delta file behind")
    sw.commit(1L, msg(1L, 1L -> "a2", 4L -> "d"))
    sw.abort(2L, msg(2L, 8L -> "never"))

    // base files byte-identical through all of it
    val after = snap(dir)
    for ((n, h) <- baseFiles)
      assert(after.get(n).contains(h), s"base file $n was rewritten")
    val rows = spark.table(tbl).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq == Seq(1L -> "a2", 2L -> "base2", 3L -> "c",
      4L -> "d", 5L -> "base5"), rows.mkString(", "))

    // MAJOR compaction: the outstanding overlay folds into rewritten
    // base files and the delta log clears — contents identical, read
    // path back to zero merge cost
    val res = spark.sql(s"CALL graftlake.system.compact('ns.spec_fl_up')")
      .head
    assert(res.getLong(2) == 1L, s"major compact left ${res.getLong(2)} files")
    val st = sources.FileStore.stateOf("ns.spec_fl_up").get
    assert(st.deltas.isEmpty, "major compaction must clear the delta log")
    val rows2 = spark.table(tbl).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows2.toSeq == rows.toSeq, "major compaction changed contents")
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("read-path pruning: projection reaches parquet, partition-" +
      "aligned filters drop whole files, count(*) is metadata-only") {
    import spark.implicits._
    val tbl = "graftlake.ns.spec_fl_prune"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, g STRING, v BIGINT, " +
      "w STRING) TBLPROPERTIES('graft.storage'='files', " +
      "'graft.partitioncol'='g')")
    (1L to 30L).map(k => (k, s"g${k % 3}", k * 10L, s"w$k"))
      .toDF("k", "g", "v", "w").coalesce(1).writeTo(tbl).append()
    // 3 files (one per group), 4 columns

    def scanDesc(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString

    // partition-aligned equality: one file planned, result exact
    val pruned = spark.table(tbl).filter(col("g") === "g1")
      .select(col("k"), col("v"))
    val d1 = scanDesc(pruned)
    assert(d1.contains("files=1"), s"expected files=1 in:\n$d1")
    assert(d1.contains("cols=k,v") || d1.contains("cols=k,g,v") ||
      d1.contains("cols=g,k,v"), s"projection did not prune:\n$d1")
    assert(pruned.count() == 10)
    assert(pruned.agg(sum("v")).head.getLong(0) ==
      (1L to 30L).filter(_ % 3 == 1).map(_ * 10).sum)

    // non-aligned predicate: all files, every row still correct
    val full = spark.table(tbl).filter(col("v") % 20 === 0)
    assert(scanDesc(full).contains("files=3"))

    // count(*): empty projection, no overlay → manifest counts answer
    val cnt = spark.table(tbl)
    assert(scanDesc(cnt.groupBy().count()).contains("cols=") )
    assert(cnt.count() == 30)

    // reported statistics follow the pruning: the one-partition scan's
    // manifest row count makes it a broadcast build against a larger
    // frame (the join plan pin a small lake dimension earns)
    val dim = spark.table(tbl).filter(col("g") === "g1")
      .select(col("k"), col("v"))
    val fact = spark.range(0, 100000).toDF("k")
    val joined = fact.join(dim, "k")
    val jplan = joined.queryExecution.executedPlan.toString
    assert(jplan.contains("BroadcastHashJoin"),
      s"pruned lake scan did not broadcast:\n$jplan")
    assert(joined.count() == 10)

    // SAFETY across an outstanding overlay (r16: pruning stays ON for
    // the standing delete+insert delta encoding): a delta UPDATE that
    // moves a row's partition value kills the old row (a delete, which
    // only ever REMOVES rows from pruned-away files) and re-emits it as
    // an overlay INSERT, which rides its own input partition that
    // pruning never touches — so both base-file groups prune away
    // (files=0) and the moved row is STILL found on its insert slice
    val dtbl = "graftlake.ns.spec_fl_prune_d"
    spark.sql(s"DROP TABLE IF EXISTS $dtbl")
    spark.sql(s"CREATE TABLE $dtbl (k BIGINT, g STRING) " +
      "TBLPROPERTIES('graft.storage'='files', 'graft.mode'='delta', " +
      "'graft.partitioncol'='g')")
    Seq((1L, "a"), (2L, "b")).toDF("k", "g").coalesce(1)
      .writeTo(dtbl).append()
    spark.sql(s"UPDATE $dtbl SET g = 'c' WHERE k = 1")
    val moved = spark.table(dtbl).filter(col("g") === "c")
    assert(scanDesc(moved).contains("files=0"),
      "delete+insert overlay: group pruning should stay enabled")
    assert(moved.collect().map(_.getLong(0)).toSeq == Seq(1L),
      "the moved row must still be found (insert slices bypass pruning)")
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"DROP TABLE IF EXISTS $dtbl")
  }

  test("ParquetRowIO round-trip property: all types, null patterns, " +
      "projection orders, and evolution bindings") {
    import sources.{FileStore, ParquetRowIO}
    import org.apache.spark.sql.types._
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(461014L) // seeded: replayable
    val dir = java.nio.file.Files.createTempDirectory("graft_pio").toString
    val types = Seq[DataType](LongType, IntegerType, DoubleType,
      BooleanType, StringType)
    for (trial <- 0 until 20) {
      val nCols = 1 + rnd.nextInt(5)
      val cols = (0 until nCols).map(i =>
        FileStore.FCol(i, s"c$i", types(rnd.nextInt(types.length)))).toArray
      def value(dt: DataType): Any = dt match {
        case LongType => rnd.nextLong(): java.lang.Long
        case IntegerType => rnd.nextInt(): java.lang.Integer
        case DoubleType => rnd.nextDouble(): java.lang.Double
        case BooleanType => rnd.nextBoolean(): java.lang.Boolean
        case StringType => UTF8String.fromString(
          rnd.alphanumeric.take(rnd.nextInt(12)).mkString +
            (if (rnd.nextBoolean()) "é✓" else ""))
        case _ => null
      }
      val rows = (0 until rnd.nextInt(40)).map(_ =>
        cols.map(c => if (rnd.nextInt(4) == 0) null else value(c.dt))
          .toArray[Any]).toArray
      val path = s"$dir/t$trial.parquet"
      val written = ParquetRowIO.writeFile(path, cols, rows.iterator)
      assert(written.rows == rows.length)
      // write-time stats are the TRUE min/max of the non-null values
      // (null when a column saw none) — the contract file skipping and
      // overlay scoping rely on
      for (i <- cols.indices) {
        val vs = rows.map(_(i)).filter(_ != null)
        if (vs.isEmpty) {
          assert(written.mins(i) == null && written.maxs(i) == null)
        } else {
          implicit val ord: Ordering[Any] =
            (a, b) => a.asInstanceOf[Comparable[Any]].compareTo(b)
          assert(written.mins(i) == vs.min, s"trial $trial col $i min")
          assert(written.maxs(i) == vs.max, s"trial $trial col $i max")
        }
      }
      // identity read
      val back = ParquetRowIO.readFile(path, cols.map(_.id), cols).toArray
      assert(back.length == rows.length)
      for ((a, b) <- rows.zip(back); i <- cols.indices)
        assert(a(i) == b(i), s"trial $trial col $i: ${a(i)} vs ${b(i)}")
      // random projection (subset, shuffled order) — physical pruning
      val proj = rnd.shuffle(cols.toSeq).take(1 + rnd.nextInt(nCols)).toArray
      val pback = ParquetRowIO.readFile(path, cols.map(_.id), proj).toArray
      for ((a, b) <- rows.zip(pback); (w, j) <- proj.zipWithIndex)
        assert(a(w.id) == b(j), s"trial $trial proj ${w.name}")
      // evolution binding: a NEVER-WRITTEN id null-fills, a renamed id
      // still binds positionally
      val evolved = proj.map(c => c.copy(name = c.name + "_renamed")) :+
        FileStore.FCol(99, "added", LongType)
      val eback = ParquetRowIO.readFile(path, cols.map(_.id), evolved).toArray
      for ((a, b) <- rows.zip(eback)) {
        for ((w, j) <- proj.zipWithIndex)
          assert(a(w.id) == b(j))
        assert(b(proj.length) == null, "post-ADD column must null-fill")
      }
    }
  }

  test("mor UPDATE keys the overlay on the OLD row id: a key-changing " +
      "update retires the old row and lands the new one (ADVICE r14)") {
    import spark.implicits._
    val tbl = "graftlake.ns.spec_fl_keymove"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, v STRING) " +
      "TBLPROPERTIES('graft.mode'='delta', 'graft.storage'='files')")
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
      .coalesce(1).writeTo(tbl).append()
    // UPDATE that changes the row-id column itself: the base row k=2
    // must die (keyed by its OLD id) and (20, b2) must appear — the
    // old bug keyed the retirement on the NEW id, so (2, b) survived
    // and the update silently vanished
    spark.sql(s"UPDATE $tbl SET k = 20, v = 'b2' WHERE k = 2")
    val got = spark.table(tbl).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq(1L -> "a", 3L -> "c", 20L -> "b2"), got.toString)
    // and the same read after folding the overlay (major compact)
    spark.sql(s"CALL graftlake.system.compact('ns.spec_fl_keymove')")
    val folded = spark.table(tbl).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(folded == got, s"compaction changed the merged view: $folded")
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("major compaction re-buckets rows whose partition value a delta " +
      "update moved; pruning and metadata delete stay truthful after " +
      "the fold (ADVICE r14)") {
    import spark.implicits._
    val tbl = "graftlake.ns.spec_fl_rebucket"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, g STRING) " +
      "TBLPROPERTIES('graft.storage'='files', 'graft.mode'='delta', " +
      "'graft.partitioncol'='g')")
    Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("k", "g").coalesce(1)
      .writeTo(tbl).append()
    spark.sql(s"UPDATE $tbl SET g = 'c' WHERE k = 1") // moves partition
    spark.sql(s"CALL graftlake.system.compact('ns.spec_fl_rebucket')")
    val st = sources.FileStore.stateOf("ns.spec_fl_rebucket").get
    assert(st.deltas.isEmpty, "major compaction must clear the delta log")
    // every post-fold file's group tag matches its rows' actual value
    for (f <- st.files) {
      val gs = sources.ParquetRowIO
        .readFile(s"${st.dir}/${f.name}", f.colIds, st.cols)
        .map(_(1)).toSet
      assert(gs == Set(f.group.get),
        s"file ${f.name} tagged ${f.group} holds groups $gs")
    }
    // the re-enabled fast paths answer truthfully
    val moved = spark.table(tbl).filter(col("g") === "c")
      .collect().map(_.getLong(0)).toSeq
    assert(moved == Seq(1L), s"pruned read lost the moved row: $moved")
    spark.sql(s"DELETE FROM $tbl WHERE g = 'a'") // metadata delete
    val left = spark.table(tbl).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(left == Seq(1L -> "c", 3L -> "b"), left.toString)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("overlay budget: a streaming-upsert feed auto-folds via MAJOR " +
      "compaction, so the plan-time overlay stays bounded (VERDICT " +
      "r14 #1) and slices carry only their own keys' deltas") {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import spark.implicits._
    val tbl = "graftlake.ns.spec_fl_budget"
    val key = "ns.spec_fl_budget"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES('graft.storage'='files', " +
      "'graft.overlaybudget'='16')")
    (0L until 40L).map(k => (k, 0L)).toDF("k", "v").coalesce(1)
      .writeTo(tbl).append()
    val sw = new graft.sources.FileStreamingUpsert(key)
    val factory = sw.createStreamingWriterFactory(null)
    var maxOutstanding = 0L
    for (epoch <- 0 until 12) {
      val w = factory.createWriter(0, 0L, epoch.toLong)
      // 4 keys per epoch → 8 delta rows (del+ins); budget 16 trips
      // every other epoch — outstanding overlay can NEVER reach the
      // 96-row total the feed lands
      for (i <- 0 until 4) {
        val k = (epoch * 4 + i) % 40L
        w.write(new GenericInternalRow(Array[Any](k, epoch.toLong + 1)))
      }
      sw.commit(epoch.toLong, Array(w.commit()))
      val st = sources.FileStore.stateOf(key).get
      maxOutstanding = math.max(maxOutstanding,
        sources.FileStore.overlayRows(st))
    }
    assert(maxOutstanding <= 16L,
      s"outstanding overlay reached $maxOutstanding rows (budget 16) — " +
        "auto-compaction did not bound it")
    // final contents = last write per key (seed value 0 if never hit)
    val expect = scala.collection.mutable.Map(
      (0L until 40L).map(_ -> 0L): _*)
    for (e <- 0 until 12; i <- 0 until 4)
      expect(((e * 4 + i) % 40).toLong) = e + 1L
    val got = spark.table(tbl).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.size == 40)
    for (k <- 0L until 40L)
      assert(got(k) == expect(k), s"key $k: got ${got(k)}, want ${expect(k)}")
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("overlay budget also governs batch delta DML: an over-budget " +
      "DELETE folds immediately, answer unchanged") {
    import spark.implicits._
    val tbl = "graftlake.ns.spec_fl_budget_b"
    val key = "ns.spec_fl_budget_b"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, v STRING) " +
      "TBLPROPERTIES('graft.mode'='delta', 'graft.storage'='files', " +
      "'graft.overlaybudget'='4')")
    (1L to 20L).map(k => (k, s"v$k")).toDF("k", "v").coalesce(1)
      .writeTo(tbl).append()
    spark.sql(s"DELETE FROM $tbl WHERE k % 3 = 0") // 6 delta rows > 4
    val st = sources.FileStore.stateOf(key).get
    assert(st.deltas.isEmpty,
      "over-budget batch delta commit must auto-fold")
    assert(spark.table(tbl).count() == 14)
    // an under-budget mutation keeps the cheap delta path
    spark.sql(s"UPDATE $tbl SET v = 'x' WHERE k = 1") // 2 rows <= 4
    assert(sources.FileStore.stateOf(key).get.deltas.nonEmpty,
      "under-budget delta commit must stay merge-on-read")
    assert(spark.table(tbl).where(col("v") === "x").count() == 1)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("overlay scoping: a slice whose key range the outstanding " +
      "deletes cannot touch carries an EMPTY overlay (closure stays " +
      "file-local)") {
    import spark.implicits._
    val tbl = "graftlake.ns.spec_fl_scope"
    val key = "ns.spec_fl_scope"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, v STRING) " +
      "TBLPROPERTIES('graft.mode'='delta', 'graft.storage'='files')")
    (1L to 10L).map(k => (k, s"a$k")).toDF("k", "v").coalesce(1)
      .writeTo(tbl).append()
    (100L to 110L).map(k => (k, s"b$k")).toDF("k", "v").coalesce(1)
      .writeTo(tbl).append()
    spark.sql(s"DELETE FROM $tbl WHERE k >= 100 AND k <= 105")
    val st = sources.FileStore.stateOf(key).get
    val slices = graft.sources.FileTableOps.currentScan(st)
      .planInputPartitions().collect {
        case s: graft.sources.FileSlice => s
      }
    assert(slices.length == 2)
    val lowSlice = slices.find(_.file.rows == 10L).get
    val highSlice = slices.find(_.file.rows == 11L).get
    assert(lowSlice.gens.isEmpty,
      "the 1-10 file's slice must carry no overlay (deletes are 100-105)")
    assert(highSlice.gens.map(_.deletes.length).sum == 6,
      s"the 100-110 file's slice must carry its 6 deletes, " +
        s"got ${highSlice.gens.map(_.deletes.length).sum}")
    assert(spark.table(tbl).count() == 15)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("stats skipping: a range predicate on a non-partition column " +
      "drops files whose min/max exclude it; residual keeps results " +
      "exact") {
    import spark.implicits._
    val tbl = "graftlake.ns.spec_fl_stats"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, v BIGINT, s STRING) " +
      "TBLPROPERTIES('graft.storage'='files')")
    // four appends with disjoint k ranges → four files with tight stats
    for (chunk <- 0 until 4)
      (0L until 25L).map(i => (chunk * 100L + i, i * 2L, s"c$chunk"))
        .toDF("k", "v", "s").coalesce(1).writeTo(tbl).append()
    def planned(df: org.apache.spark.sql.DataFrame): Int = {
      val d = df.queryExecution.executedPlan.toString
      "files=(\\d+)".r.findFirstMatchIn(d).map(_.group(1).toInt)
        .getOrElse(fail(s"no files= marker in:\n$d"))
    }
    // k BETWEEN 110 AND 120 → only chunk-1's file may match
    val range = spark.table(tbl)
      .filter(col("k") >= 110L && col("k") <= 120L)
    assert(planned(range) == 1, "range predicate did not skip files")
    assert(range.count() == 11)
    // equality on a string column: only one file's [min,max] covers it
    val eq = spark.table(tbl).filter(col("s") === "c2")
    assert(planned(eq) == 1, "string equality did not skip files")
    assert(eq.count() == 25)
    // a predicate matching nothing plans zero files
    val none = spark.table(tbl).filter(col("k") > 1000L)
    assert(planned(none) == 0, "impossible range still planned files")
    assert(none.count() == 0)
    // unpruned full scan still sees everything
    assert(spark.table(tbl).count() == 100)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("CALL sort: rewrites base files into disjoint sorted key ranges; " +
      "range scans then plan a fraction of the files; pre-sort version " +
      "retained") {
    import spark.implicits._
    val tbl = "graftlake.ns.spec_fl_sort"
    val key = "ns.spec_fl_sort"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, v STRING) " +
      "TBLPROPERTIES('graft.storage'='files')")
    // interleaved appends: every file spans the whole key range, so
    // stats skipping is useless until the layout is sorted
    for (m <- 0L until 4L)
      (1L to 100L).filter(_ % 4 == m).map(k => (k, s"v$k"))
        .toDF("k", "v").coalesce(1).writeTo(tbl).append()
    def planned(df: org.apache.spark.sql.DataFrame): Int =
      "files=(\\d+)".r.findFirstMatchIn(
        df.queryExecution.executedPlan.toString).map(_.group(1).toInt).get
    val rangeQ = spark.table(tbl).filter(col("k") <= 20L)
    assert(planned(rangeQ) == 4, "interleaved layout should prune nothing")
    val preSortVersion = sources.FileStore.stateOf(key).get.version

    val res = spark.sql(
      s"CALL graftlake.system.sort('ns.spec_fl_sort', 'k', 4)").head
    assert((res.getLong(0), res.getLong(1)) == ((4L, 4L)), res.toString)
    val st = sources.FileStore.stateOf(key).get
    // files now carry pairwise-DISJOINT sorted key ranges
    val ranges = st.files.map { f =>
      val ki = f.colIds.indexOf(st.cols.head.id)
      (f.mins(ki).asInstanceOf[Long], f.maxs(ki).asInstanceOf[Long])
    }.sortBy(_._1)
    for (Seq((_, hi), (lo2, _)) <- ranges.toSeq.sliding(2))
      assert(hi < lo2, s"overlapping sorted ranges: ${ranges.mkString(",")}")
    // the same range query now skips most files
    val sortedQ = spark.table(tbl).filter(col("k") <= 20L)
    assert(planned(sortedQ) <= 2, "sorted layout did not prune")
    assert(sortedQ.count() == 20)
    // contents identical; pre-sort version still readable
    assert(spark.table(tbl).count() == 100)
    assert(spark.sql(
      s"SELECT count(*) FROM $tbl VERSION AS OF $preSortVersion")
      .head.getLong(0) == 100)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("streaming read from the lake table: first run delivers the " +
      "snapshot, a checkpointed restart delivers ONLY appended files, " +
      "non-append commits refuse loudly") {
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val tbl = "graftlake.ns.spec_fl_streamread"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, v STRING) " +
      "TBLPROPERTIES('graft.storage'='files')")
    (1L to 5L).map(k => (k, s"v$k")).toDF("k", "v").coalesce(1)
      .writeTo(tbl).append()
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_sfl_stream").toString
    val got = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    val batches = scala.collection.mutable.ArrayBuffer[Long]()
    def runOnce(): Unit = {
      val q = spark.readStream.table(tbl)
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          val rows = df.collect().map(r => (r.getLong(0), r.getString(1)))
          got.synchronized { got ++= rows; batches += id }
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce()
    assert(got.map(_._1).sorted.toSeq == (1L to 5L),
      s"initial snapshot read: $got")
    // appends between runs: the restart resumes at the committed
    // VERSION and delivers exactly the new files' rows
    got.clear()
    (6L to 8L).map(k => (k, s"v$k")).toDF("k", "v").coalesce(1)
      .writeTo(tbl).append()
    (9L to 9L).map(k => (k, s"v$k")).toDF("k", "v").coalesce(1)
      .writeTo(tbl).append()
    runOnce()
    assert(got.map(_._1).sorted.toSeq == (6L to 9L),
      s"incremental read must deliver ONLY the appended files: $got")
    // an idle restart delivers nothing
    got.clear()
    runOnce()
    assert(got.isEmpty, s"idle restart delivered rows: $got")
    // a cow DELETE removes files — the next streamed range refuses
    spark.sql(s"DELETE FROM $tbl WHERE k = 1")
    val ex = intercept[Exception] { runOnce() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("non-append")),
      s"unclear non-append refusal: $ex")
    spark.sql(s"DROP TABLE IF EXISTS $tbl")

    // ADMISSION CONTROL: maxVersionsPerTrigger=1 drains a 3-append
    // backfill as THREE version-aligned micro-batches, not one load
    val t2 = "graftlake.ns.spec_fl_streamrate"
    spark.sql(s"DROP TABLE IF EXISTS $t2")
    spark.sql(s"CREATE TABLE $t2 (k BIGINT, v STRING) " +
      "TBLPROPERTIES('graft.storage'='files')")
    for (w <- 0L until 3L)
      (w * 10 + 1 to w * 10 + 3).map(k => (k, s"v$k")).toDF("k", "v")
        .coalesce(1).writeTo(t2).append()
    val perBatch = scala.collection.mutable.ArrayBuffer[Seq[Long]]()
    val q2 = spark.readStream.option("maxVersionsPerTrigger", "1")
      .table(t2)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val ks = df.collect().map(_.getLong(0)).sorted.toSeq
        perBatch.synchronized { if (ks.nonEmpty) perBatch += ks }
        ()
      }
      .option("checkpointLocation", java.nio.file.Files
        .createTempDirectory("graft_sfl_rate").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q2.awaitTermination()
    assert(perBatch.toSeq == Seq(Seq(1L, 2L, 3L), Seq(11L, 12L, 13L),
      Seq(21L, 22L, 23L)),
      s"expected three version-aligned batches, got $perBatch")
    spark.sql(s"DROP TABLE IF EXISTS $t2")
  }

  test("CAS commit seam: a version already published by another writer " +
      "loses the race loudly, the table is undisturbed, and the retry " +
      "succeeds (VERDICT r14 #3)") {
    import spark.implicits._
    val tbl = "graftlake.ns.spec_fl_cas"
    val key = "ns.spec_fl_cas"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES('graft.storage'='files')")
    Seq((1L, 10L), (2L, 20L)).toDF("k", "v").coalesce(1)
      .writeTo(tbl).append()
    val st = sources.FileStore.stateOf(key).get
    // simulate a FOREIGN driver having published the next version: the
    // CAS file for version+1 already exists on shared storage
    val foreign = java.nio.file.Paths.get(st.dir,
      s"manifest-v${st.version + 1}.json")
    java.nio.file.Files.writeString(foreign, "{\"foreign\":true}\n",
      java.nio.file.StandardOpenOption.CREATE_NEW)
    val before = snap(st.dir).filter(_._1.startsWith("data/"))
    val ex = intercept[Exception] {
      queries.Q.withExpectedTaskFailureSilenced("spec_fl_cas race") {
        Seq((3L, 30L)).toDF("k", "v").coalesce(1).writeTo(tbl).append()
      }
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(
      _.isInstanceOf[java.util.ConcurrentModificationException]),
      s"expected a commit-conflict error, got $ex")
    // no lost update: the winner's (simulated) CAS file is untouched,
    // the local snapshot still reads, its files are intact
    assert(java.nio.file.Files.readString(foreign).contains("foreign"))
    assert(sources.FileStore.stateOf(key).get.version == st.version)
    assert(spark.table(tbl).count() == 2)
    for ((n, h) <- before)
      assert(snap(st.dir).get(n).contains(h), s"race disturbed $n")
    // the retry (after rebasing — here: the foreign claim withdrawn)
    // lands cleanly
    java.nio.file.Files.delete(foreign)
    Seq((3L, 30L)).toDF("k", "v").coalesce(1).writeTo(tbl).append()
    assert(spark.table(tbl).count() == 3)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("vacuum deletes ONLY retired-manifest files: in-flight/unknown " +
      "files survive, files shared with the live version survive, and " +
      "a vacuumed version fails its read with a clear error") {
    import spark.implicits._
    val tbl = "graftlake.ns.spec_fl_vacsafe"
    val key = "ns.spec_fl_vacsafe"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, g STRING) " +
      "TBLPROPERTIES('graft.storage'='files', " +
      "'graft.partitioncol'='g')")
    Seq((1L, "a"), (2L, "a")).toDF("k", "g").coalesce(1)
      .writeTo(tbl).append()                       // file A (shared)
    Seq((3L, "b")).toDF("k", "g").coalesce(1)
      .writeTo(tbl).append()                       // file B (will retire)
    val st = sources.FileStore.stateOf(key).get
    val fileA = st.files.find(_.group.exists(_.toString == "a")).get.name
    val fileB = st.files.find(_.group.exists(_.toString == "b")).get.name
    spark.sql(s"DELETE FROM $tbl WHERE g = 'b'")   // retires file B only
    // plant look-alikes of IN-FLIGHT work: a staged RTAS file and a
    // writer-task temp — out of every manifest, exactly what a racing
    // uncommitted write leaves on disk mid-flight
    val dir = st.dir
    val staged = s"$dir/data/staged-p0-t9-inflight.parquet"
    val inflight = s"$dir/data/w-p0-t9-inflight.parquet"
    java.nio.file.Files.write(java.nio.file.Paths.get(staged),
      "fake".getBytes)
    java.nio.file.Files.write(java.nio.file.Paths.get(inflight),
      "fake".getBytes)
    val deleted = spark.sql(
      s"CALL graftlake.system.vacuum('ns.spec_fl_vacsafe')")
      .head.getLong(0)
    assert(deleted == 1L, s"vacuum deleted $deleted files, expected 1 (B)")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/$fileB")), "retired file B survived")
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/$fileA")),
      "file A is in the LIVE manifest and a retired snapshot — vacuum " +
        "must keep it")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(staged)),
      "vacuum ate a staged (out-of-manifest) file")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(inflight)),
      "vacuum ate an in-flight writer file")
    assert(spark.table(tbl).count() == 2)
    // time travel to a vacuumed version: a CLEAR catalog-level error at
    // resolution, not a missing-file crash mid-scan
    val ex = intercept[Exception] {
      spark.sql(s"SELECT * FROM $tbl VERSION AS OF 2").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(m => m.contains("no retained version") &&
      m.contains("VACUUM")), s"unclear vacuumed-read error: $ex")
    java.nio.file.Files.delete(java.nio.file.Paths.get(staged))
    java.nio.file.Files.delete(java.nio.file.Paths.get(inflight))
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("vacuum retain_last: the newest K versions stay time-travelable, " +
      "their files survive, older history and its files expire") {
    import spark.implicits._
    val tbl = "graftlake.ns.spec_fl_retain"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, g STRING) " +
      "TBLPROPERTIES('graft.storage'='files', " +
      "'graft.partitioncol'='g')")
    Seq((1L, "a")).toDF("k", "g").coalesce(1).writeTo(tbl).append() // v2
    Seq((2L, "b")).toDF("k", "g").coalesce(1).writeTo(tbl).append() // v3
    spark.sql(s"DELETE FROM $tbl WHERE g = 'a'")                    // v4
    spark.sql(s"DELETE FROM $tbl WHERE g = 'b'")                    // v5
    // keep the newest 2 versions (v5 pre-vacuum current + v4):
    // the a-file is referenced only by v2/v3 → expires; the b-file is
    // referenced by v4 (retained) → must survive on disk
    val n = spark.sql(
      s"CALL graftlake.system.vacuum('ns.spec_fl_retain', 2)")
      .head.getLong(0)
    assert(n == 1L, s"vacuum(retain 2) deleted $n files, expected 1 (a)")
    assert(spark.sql(s"SELECT count(*) FROM $tbl VERSION AS OF 4")
      .head.getLong(0) == 1L, "retained v4 must still read (file intact)")
    assert(spark.sql(s"SELECT count(*) FROM $tbl VERSION AS OF 5")
      .head.getLong(0) == 0L, "retained pre-vacuum current must read")
    val ex = intercept[Exception] {
      spark.sql(s"SELECT * FROM $tbl VERSION AS OF 3").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("no retained version")), ex.toString)
    assert(spark.table(tbl).count() == 0)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("MAJOR compaction with a net-nothing overlay still clears the " +
      "delta log; a losing vacuum deletes nothing") {
    import spark.implicits._
    val tbl = "graftlake.ns.spec_fl_netzero"
    val key = "ns.spec_fl_netzero"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, v STRING) " +
      "TBLPROPERTIES('graft.mode'='delta', 'graft.storage'='files')")
    (1L to 10L).map(k => (k, s"v$k")).toDF("k", "v").coalesce(1)
      .writeTo(tbl).append()
    // inserts 100..105 (gen), then delete them all (gen): the overlay's
    // keys miss the base file's [1,10] range and its inserts all die —
    // net effect nothing, but the LOG must still clear on compact
    Seq((100L, "x"), (101L, "x"), (102L, "x")).toDF("k", "v")
      .createOrReplaceTempView("spec_fl_netzero_src")
    spark.sql(s"""MERGE INTO $tbl t USING spec_fl_netzero_src s
                 |ON t.k = s.k
                 |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)
                 |""".stripMargin)
    spark.sql(s"DELETE FROM $tbl WHERE k >= 100")
    val before = snap(tableDir(tbl)).filter(_._1.startsWith("data/"))
    spark.sql(s"CALL graftlake.system.compact('ns.spec_fl_netzero')")
    val st = sources.FileStore.stateOf(key).get
    assert(st.deltas.isEmpty,
      "net-nothing MAJOR compaction must still clear the delta log")
    // and it was metadata-only: base files untouched
    for ((n, h) <- before)
      assert(snap(tableDir(tbl)).get(n).contains(h),
        s"net-nothing fold rewrote $n")
    assert(spark.table(tbl).count() == 10)
    // vacuum that LOSES its CAS publish deletes nothing: the retired
    // snapshot files must survive a lost race (publish-first contract)
    spark.sql(s"UPDATE $tbl SET v = 'u' WHERE k = 2") // delta gen
    spark.sql(s"CALL graftlake.system.compact('ns.spec_fl_netzero')")
    val st2 = sources.FileStore.stateOf(key).get
    assert(st2.snaps.nonEmpty)
    val allBefore = snap(st2.dir)
    val foreign = java.nio.file.Paths.get(st2.dir,
      s"manifest-v${st2.version + 1}.json")
    java.nio.file.Files.writeString(foreign, "{\"foreign\":true}\n",
      java.nio.file.StandardOpenOption.CREATE_NEW)
    val ex = intercept[Exception] {
      spark.sql(s"CALL graftlake.system.vacuum('ns.spec_fl_netzero')")
        .collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(
      _.isInstanceOf[java.util.ConcurrentModificationException]), ex.toString)
    assert(snap(st2.dir) == allBefore,
      "a losing vacuum must not delete ANY file")
    java.nio.file.Files.delete(foreign)
    val n = spark.sql(s"CALL graftlake.system.vacuum('ns.spec_fl_netzero')")
      .head.getLong(0)
    assert(n > 0, "the retried vacuum reclaims the retired files")
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("change feed ('v1..v2'): plans ONLY the manifest diff's files, " +
      "tags rows added/removed, binds by column id across evolution, " +
      "and refuses unfolded overlays") {
    import spark.implicits._
    val tbl = "graftlake.ns.spec_fl_changes"
    val key = "ns.spec_fl_changes"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, g STRING) " +
      "TBLPROPERTIES('graft.storage'='files', " +
      "'graft.partitioncol'='g')")
    Seq((1L, "a"), (2L, "b")).toDF("k", "g").coalesce(1)
      .writeTo(tbl).append()                        // v2: files a1, b1
    spark.sql(s"ALTER TABLE $tbl ADD COLUMN w BIGINT") // v3
    Seq((3L, "b", 30L)).toDF("k", "g", "w").coalesce(1)
      .writeTo(tbl).append()                        // v4: file b2
    spark.sql(s"DELETE FROM $tbl WHERE g = 'a'")    // v5: drops a1 (meta)
    val feed = spark.sql(s"SELECT * FROM $tbl VERSION AS OF '2..5'")
    // schema = TO version's (has w) + _change_type
    assert(feed.columns.toSeq == Seq("k", "g", "w", "_change_type"),
      feed.columns.mkString(","))
    val rows = feed.collect().map(r => (r.getLong(0), r.getString(1),
      if (r.isNullAt(2)) -1L else r.getLong(2), r.getString(3))).toSet
    // a1 removed; b2 added; b1 SHARED by both versions — never read.
    // a1 predates column w → null-fills through the id binding
    assert(rows == Set((1L, "a", -1L, "removed"), (3L, "b", 30L, "added")),
      rows.toString)
    // the plan really is diff-only: 2 slices for a 3-file history
    val st = sources.FileStore.stateOf(key).get
    val scan = new graft.sources.FileChangesScan(key,
      st.snapshotAt(2).get, st.snapshotAt(5).get)
    assert(scan.planInputPartitions().length == 2)
    assert(scan.description().contains("unread=1"), scan.description())
    // the feed obeys column pruning like any scan: a (k, tag)
    // projection decodes only k, and the tag is synthesized mid-row
    val pruned = spark.sql(
      s"SELECT k, _change_type, k + 1 AS k2 FROM $tbl " +
        "VERSION AS OF '2..5'")
    val pd = pruned.queryExecution.executedPlan.toString
    assert(pd.contains("cols=k,_change_type"), s"no pruning in:\n$pd")
    assert(pruned.collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2))).toSet ==
      Set((1L, "removed", 2L), (3L, "added", 4L)))
    // the summary procedure answers the same diff from pure metadata
    val sm = spark.sql(
      s"CALL graftlake.system.changes('ns.spec_fl_changes', 2, 5)").head
    assert((sm.getLong(0), sm.getLong(1), sm.getLong(2),
      sm.getLong(3), sm.getLong(4)) == ((1L, 1L, 1L, 1L, 1L)), sm.toString)
    // an endpoint with outstanding merge-on-read deltas is refused
    // loudly — a delta generation is row-scale change the file diff
    // cannot see
    val dtbl = "graftlake.ns.spec_fl_changes_d"
    spark.sql(s"DROP TABLE IF EXISTS $dtbl")
    spark.sql(s"CREATE TABLE $dtbl (k BIGINT, v STRING) " +
      "TBLPROPERTIES('graft.storage'='files', 'graft.mode'='delta')")
    Seq((1L, "x")).toDF("k", "v").coalesce(1).writeTo(dtbl).append()
    spark.sql(s"DELETE FROM $dtbl WHERE k = 1")     // delta gen out
    val ex = intercept[Exception] {
      spark.sql(s"SELECT * FROM $dtbl VERSION AS OF '2..3'").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("compact")),
      s"unclear unfolded-overlay error: $ex")
    // the summary procedure refuses identically — it must never report
    // "nothing changed" over a delta generation it cannot see
    val ex2 = intercept[Exception] {
      spark.sql(
        s"CALL graftlake.system.changes('ns.spec_fl_changes_d', 2, 3)")
        .collect()
    }
    assert(msgs(ex2).exists(_.contains("compact")), ex2.toString)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"DROP TABLE IF EXISTS $dtbl")
  }

  test("cow over an outstanding merge-on-read overlay is refused " +
      "group pruning and folds the overlay in") {
    // delta-mode tables keep WriteDelta for DML — the cow-over-overlay
    // path only arises on a cow table that ALSO has deltas, which the
    // catalog never produces today; pin the guard that keeps it safe:
    // the scan built for a cow table with an empty overlay IS the
    // filtered variant, so this test asserts the mode wiring.
    import spark.implicits._
    val tbl = "graftlake.ns.spec_fl_mode"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, g STRING) " +
      "TBLPROPERTIES('graft.storage'='files', 'graft.partitioncol'='g')")
    (1L to 6L).map(k => (k, s"g${k % 2}")).toDF("k", "g")
      .writeTo(tbl).append()
    val st = sources.FileStore.stateOf("ns.spec_fl_mode").get
    assert(!st.delta && st.partitionColId.isDefined)
    // metadata delete refuses while deltas are outstanding — no deltas
    // here, so the aligned predicate takes the fast path (plan pin)
    val del = spark.sql(s"DELETE FROM $tbl WHERE g = 'g0'")
    assert(!del.queryExecution.executedPlan.toString.contains("ReplaceData"))
    assert(spark.table(tbl).count() == 3)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }
}
