package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral contract of the `graft.sources.GenDocs` DSv2 read
  * connector's filter pushdown — in particular the Long.MaxValue
  * boundary (ADVICE r9): `v + 1` inside pushFilters would wrap negative
  * and silently corrupt the generated interval while the filter is
  * reported fully handled, i.e. WRONG RESULTS, not an error. The plan
  * shape itself (pushed range + pruned columns, no surviving Filter) is
  * pinned in PlanAuditSpec's q346 test. */
class GenDocsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def gen = spark.read.format("graft.sources.GenDocs")
    .option("rows", "100").option("slices", "4").load()

  test("plain range pushdown generates exactly the requested interval") {
    assert(gen.filter(col("id") >= 10L && col("id") < 20L).count() == 10L)
    assert(gen.filter(col("id") > 10L && col("id") <= 20L).count() == 10L)
    assert(gen.filter(col("id") === 42L).count() == 1L)
  }

  test("id > Long.MaxValue yields an empty scan, not a wrapped range") {
    assert(gen.filter(col("id") > lit(Long.MaxValue)).count() == 0L)
  }

  test("id <= Long.MaxValue constrains nothing — all rows survive") {
    assert(gen.filter(col("id") <= lit(Long.MaxValue)).count() == 100L)
    // and combined with a real bound, only the real bound applies
    assert(gen.filter(col("id") <= lit(Long.MaxValue) && col("id") >= 90L)
      .count() == 10L)
  }

  private def keyedGen(rows: Long) = spark.read
    .format("graft.sources.GenDocs")
    .option("rows", rows.toString).option("partitionBy", "tag").load()

  test("partitionBy=tag generates the same table, laid out one tag per slice") {
    val plain = gen.groupBy("tag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val keyed = keyedGen(100).groupBy("tag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(keyed == plain)
    // pushed id ranges compose with the keyed layout (per-tag stepping
    // must start at the first id ≥ lo congruent to the tag)
    assert(keyedGen(100).filter(col("id") >= 13L && col("id") < 57L)
      .count() == 44L)
    assert(keyedGen(100).filter(col("id") >= 13L && col("id") < 57L)
      .agg(sum(col("id"))).collect()(0).getLong(0) == (13L until 57L).sum)
  }

  test("grouped aggregate pushdown: closed-form per-tag results, no aggregate operator") {
    val df = keyedGen(1000)
      .filter(col("id") >= 10L && col("id") < 900L)
      .groupBy("tag")
      .agg(count(lit(1)).as("n"), min("id").as("mn"),
        max("id").as("mx"), sum("id").as("s"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("pushedAggs=[AggCount,AggMinId,AggMaxId,AggSumId]"),
      plan)
    assert(!plan.contains("HashAggregate"), plan)
    val got = df.collect().map(r => (r.getString(0),
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val want = (10L until 900L).groupBy(id => "t" + (id % 7))
      .map { case (t, ids) => t -> (ids.size.toLong, ids.min, ids.max,
        ids.sum) }
    assert(got == want)
  }

  test("global aggregate pushdown stays partial and folds per-slice closed forms") {
    val df = keyedGen(1000).filter(col("id") >= 10L && col("id") < 900L)
      .agg(count(lit(1)).as("n"), min("id").as("mn"),
        max("id").as("mx"), sum("id").as("s"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("pushedAggs="), plan)
    val r = df.collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      (890L, 10L, 899L, (10L until 900L).sum))
    // an empty pushed range must still report count 0
    val e = keyedGen(1000).filter(col("id") > lit(Long.MaxValue))
      .agg(count(lit(1)).as("n")).collect()(0)
    assert(e.getLong(0) == 0L)
  }

  test("runtime filtering narrows the generated interval to the build side's key envelope") {
    def g(rows: Long) = spark.read.format("graft.sources.GenDocs")
      .option("rows", rows.toString).option("slices", "4").load()
    val big = g(1000000L).select("id", "v")
    // the dim filter is on bucket, NOT the join key, so no static filter
    // can be inferred onto the probe side — the runtime In-filter is the
    // only pruning; ids ≡ 5 (mod 97) below 500 = {5,102,199,296,393,490}
    val dim = g(500L).filter(col("bucket") === 5L).select(col("id"))
    val j = big.join(dim, "id").agg(count(lit(1)).as("n"), sum("id").as("s"))
    val r = j.collect()(0)
    assert(r.getLong(0) == 6L)
    assert(r.getLong(1) == Seq(5L, 102L, 199L, 296L, 393L, 490L).sum)
    // after execution the probe scan's description reflects the
    // runtime-narrowed interval (filter() mutated the range before
    // partition planning) and carries a live dynamicpruning filter
    val p = j.queryExecution.executedPlan.toString
    assert(p.contains("GenScan id=[5,491)"), p)
    assert(p.contains("dynamicpruningexpression(id"), p)
  }

  test("reported statistics make the small gen side a broadcast build") {
    def g(rows: Long) = spark.read.format("graft.sources.GenDocs")
      .option("rows", rows.toString).option("slices", "4").load()
    val j = g(1000000L).join(g(100L).select("id"), "id")
    val p = j.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      p)
  }

  test("unsupported aggregates fall back to row generation") {
    // sum(v) is not a closed form the source offers — no pushdown
    val df = keyedGen(100).groupBy("tag").agg(sum("v").as("sv"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("pushedAggs="), plan)
    assert(plan.contains("HashAggregate"), plan)
    assert(df.count() == 7L)
  }

  test("limit and top-N push into the generated interval") {
    def g = spark.read.format("graft.sources.GenDocs")
      .option("rows", "1000000").option("slices", "8").load()
    val asc = g.filter(col("id") >= 500000L).orderBy(col("id")).limit(100)
      .agg(count(lit(1)).as("n"), max("id").as("mx"))
    val ra = asc.collect()(0)
    assert(ra.getLong(0) == 100L && ra.getLong(1) == 500099L)
    val pa = asc.queryExecution.executedPlan.toString
    assert(pa.contains("GenScan id=[500000,500100)"), pa)
    val desc = g.orderBy(col("id").desc).limit(50)
      .agg(count(lit(1)).as("n"), min("id").as("mn"))
    val rd = desc.collect()(0)
    assert(rd.getLong(0) == 50L && rd.getLong(1) == 999950L)
    val pd = desc.queryExecution.executedPlan.toString
    assert(pd.contains("GenScan id=[999950,1000000)"), pd)
    // a bare limit (no sort) also narrows: any n rows satisfy it
    val lim = g.limit(30).agg(count(lit(1)).as("n"))
    assert(lim.collect()(0).getLong(0) == 30L)
    assert(lim.queryExecution.executedPlan.toString
      .contains("GenScan id=[0,30)"))
    // keyed mode must NOT push (slice list preserves the reported
    // KeyGroupedPartitioning) -- results stay correct via Spark's Limit
    val keyed = spark.read.format("graft.sources.GenDocs")
      .option("rows", "1000").option("partitionBy", "tag").load()
      .orderBy(col("id")).limit(10)
    assert(keyed.count() == 10L)
    assert(!keyed.queryExecution.executedPlan.toString
      .contains("id=[0,10)"))
  }

  test("_slice metadata column: hidden from star, exact slice ordinals when named") {
    val g = spark.read.format("graft.sources.GenDocs")
      .option("rows", "40000").option("slices", "8").load()
    // the DSv2 metadata-column rule: absent unless named
    assert(!g.columns.contains("_slice"), g.columns.mkString(","))
    val per = g.select(col("_slice"), col("id"))
      .groupBy("_slice")
      .agg(count(lit(1)).as("n"), min("id").as("mn"), max("id").as("mx"))
      .orderBy("_slice").collect()
    assert(per.length == 8)
    per.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) == i.toLong && r.getLong(1) == 5000L &&
        r.getLong(2) == 5000L * i && r.getLong(3) == 5000L * i + 4999L,
        r.toString)
    }
    // keyed mode: the slice ordinal IS the tag index
    val k = spark.read.format("graft.sources.GenDocs")
      .option("rows", "700").option("partitionBy", "tag").load()
      .select(col("_slice"), col("tag")).distinct().orderBy("_slice")
      .collect()
    assert(k.length == 7)
    k.foreach(r => assert(r.getString(1) == "t" + r.getLong(0), r.toString))
  }

  test("_slice under MICRO_BATCH_READ: batch-stable slice-start ordinals, both query shapes") {
    import org.apache.spark.sql.streaming.Trigger
    // Streaming plans never re-prune, so the scan only sees the table
    // schema while the analyzer binds `_slice` at ordinal |schema| when
    // named — the reader appends the provenance field unconditionally
    // (r13 fix: a base-width row crashed the executor with
    // ArrayIndexOutOfBounds). Ordinals are the slice START IDS (ADVICE
    // r12): batch-relative zipWithIndex would alias ranges across
    // batches; start ids replay identically from the offset log.
    spark.catalog.dropTempView("gds_s1")
    val q1 = spark.readStream.format("graft.sources.GenDocs")
      .option("rows", "2000").option("batchRows", "500")
      .option("slices", "2").load()
      .select(col("_slice"), col("id"))
      .groupBy("_slice")
      .agg(count(lit(1)).as("n"), min("id").as("mn"), max("id").as("mx"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("gds_s1")
      .trigger(Trigger.AvailableNow()).start()
    q1.awaitTermination()
    val per = spark.table("gds_s1").orderBy("_slice").collect()
    // 4 batches × 2 slices of 250 ids; ordinal = slice start id
    assert(per.length == 8, per.mkString(", "))
    per.foreach { r =>
      val ord = r.getLong(0)
      assert(ord % 250 == 0 && r.getLong(1) == 250L &&
        r.getLong(2) == ord && r.getLong(3) == ord + 249L, r.toString)
    }
    // shape 2: `_slice` NOT named — the appended trailing field must be
    // invisible (ordinal binding never reaches it)
    spark.catalog.dropTempView("gds_s2")
    val q2 = spark.readStream.format("graft.sources.GenDocs")
      .option("rows", "2000").option("batchRows", "500")
      .option("slices", "2").load()
      .groupBy("bucket").agg(count(lit(1)).as("n"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("gds_s2")
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    assert(spark.table("gds_s2").count() == 97L)
  }

  test("columnar under MICRO_BATCH_READ: vectorized batches, exact " +
      "row-path parity, same offset pacing") {
    import org.apache.spark.sql.streaming.Trigger
    // the streaming scan rides the same columnar reader as the batch
    // scan (VERDICT r13 #5): per micro-batch, ColumnarBatches feed one
    // ColumnarToRow boundary; offsets/pacing/results must be identical
    // to the row path.
    def run(name: String, columnar: Boolean) = {
      spark.catalog.dropTempView(name)
      val q = spark.readStream.format("graft.sources.GenDocs")
        .option("rows", "3000").option("batchRows", "700")
        .option("slices", "2").option("columnar", columnar.toString).load()
        .groupBy("tag")
        .agg(count(lit(1)).as("n"), sum("bucket").as("sb"),
          sum("v").cast("decimal(18,2)").as("sv"))
        .writeStream.outputMode("complete")
        .format("memory").queryName(name)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val plan = q
        .asInstanceOf[org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
        .streamingQuery.lastExecution.executedPlan.toString
      (spark.table(name).orderBy("tag").collect().toSeq.map(_.toString), plan)
    }
    val (rows, rowPlan) = run("gds_sc_row", columnar = false)
    val (cols, colPlan) = run("gds_sc_col", columnar = true)
    assert(cols == rows, s"streaming columnar diverged:\n$cols\nvs\n$rows")
    assert(colPlan.contains("ColumnarToRow"),
      s"columnar streaming scan did not vectorize:\n$colPlan")
    assert(!rowPlan.contains("ColumnarToRow"), rowPlan)
  }

  private def genC(columnar: Boolean, extra: (String, String)*) = {
    val base = spark.read.format("graft.sources.GenDocs")
      .option("rows", "20000").option("slices", "4")
      .option("columnar", columnar.toString)
    extra.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }.load()
  }

  test("columnar=true: vectorized batches behind ColumnarToRow, exact row-path parity") {
    val c = genC(columnar = true)
      .filter(col("id") >= 123L && col("id") < 17456L)
      .select("id", "bucket", "v", "tag")
    assert(c.queryExecution.executedPlan.toString.contains("ColumnarToRow"),
      c.queryExecution.executedPlan.toString)
    val r = genC(columnar = false)
      .filter(col("id") >= 123L && col("id") < 17456L)
      .select("id", "bucket", "v", "tag")
    assert(!r.queryExecution.executedPlan.toString.contains("ColumnarToRow"))
    val got = c.collect().map(x =>
      (x.getLong(0), x.getLong(1), x.getDouble(2), x.getString(3)))
      .sortBy(_._1)
    val want = r.collect().map(x =>
      (x.getLong(0), x.getLong(1), x.getDouble(2), x.getString(3)))
      .sortBy(_._1)
    assert(got.length == 17456 - 123)
    assert(got.sameElements(want))
  }

  test("columnar composes with the keyed layout and the _slice metadata column") {
    val k = genC(columnar = true, "partitionBy" -> "tag")
      .select(col("_slice"), col("id"), col("tag"))
    assert(k.queryExecution.executedPlan.toString.contains("ColumnarToRow"))
    val rows = k.collect()
    assert(rows.length == 20000)
    rows.foreach { x =>
      assert(x.getLong(0) == x.getLong(1) % 7, x.toString) // ordinal = tag
      assert(x.getString(2) == "t" + (x.getLong(1) % 7))
    }
  }

  test("custom scan metrics: rowsGenerated and rowsSkippedBySample fold into the SQL metrics") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    def scanOf(df: org.apache.spark.sql.DataFrame): BatchScanExec = {
      def unwrap(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[BatchScanExec] = p match {
        case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
        // AQE wraps materialized stages as LEAVES — children is Nil,
        // the actual subtree hangs off .plan
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          unwrap(q.plan)
        case b: BatchScanExec => Seq(b)
        case other => other.children.flatMap(unwrap) ++
          other.subqueries.flatMap(unwrap)
      }
      unwrap(df.queryExecution.executedPlan).head
    }
    // sum(bucket) is NOT agg-pushable, so rows really materialize —
    // count(*) would push down as a closed form and generate NOTHING
    // (which is itself the pushdown working; see the q365 family)
    val dfr = spark.read.format("graft.sources.GenDocs")
      .option("rows", "100000").option("slices", "4").load()
      .filter(col("id") >= 1000L && col("id") < 4000L)
      .agg(count(lit(1)), sum("bucket"))
    assert(dfr.collect()(0).getLong(0) == 3000L) // collect() runs THIS queryExecution; head() would plan a separate limited one
    val m1 = scanOf(dfr).metrics
    assert(m1("rowsGenerated").value == 3000L, m1("rowsGenerated").value)
    assert(m1("rowsSkippedBySample").value == 0L)
    // pushed-sample scan: generated + skipped == the scanned interval
    val dfs = spark.read.format("graft.sources.GenDocs")
      .option("rows", "1000").option("slices", "4").load()
      .sample(withReplacement = false, 0.25, 42L)
      .agg(count(lit(1)), sum("bucket"))
    val kept = dfs.collect()(0).getLong(0)
    val m2 = scanOf(dfs).metrics
    assert(m2("rowsGenerated").value == kept)
    assert(m2("rowsGenerated").value + m2("rowsSkippedBySample").value
      == 1000L, m2.toString)
    // columnar scan reports generated too
    val dfc = genC(columnar = true)
      .filter(col("id") < 5000L).agg(count(lit(1)), sum("bucket"))
    assert(dfc.collect()(0).getLong(0) == 5000L)
    assert(scanOf(dfc).metrics("rowsGenerated").value == 5000L)
  }

  test("columnar falls back to row reads for pushed aggregates and pushed samples") {
    val agg = genC(columnar = true, "partitionBy" -> "tag")
      .groupBy("tag").agg(count(lit(1)).as("n"), sum("id").as("s"))
    val ap = agg.queryExecution.executedPlan.toString
    assert(ap.contains("pushedAggs="), ap) // the pushdown still happens
    assert(!ap.contains("ColumnarToRow"), ap) // summary rows stay scalar
    assert(agg.count() == 7L)
    val smp = genC(columnar = true).sample(0.2, 7L)
      .agg(count(lit(1)).as("n"))
    assert(!smp.queryExecution.executedPlan.toString.contains("ColumnarToRow"))
    assert(smp.collect()(0).getLong(0) > 0L)
  }
}
