package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingOps

import java.sql.Timestamp

/** Structured Streaming operator surface: watermarked windowed aggregation,
  * in-stream dedup, stateful sessionization, JSON emission. Each op is
  * driven through a real streaming query (MemoryStream → memory sink). */
class StreamingOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)
  private def ts(minute: Int) = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  /** Shared windowed-aggregation run (used plain and under the RocksDB
    * provider swap): returns the sink rows and the state operator's
    * custom-metric names from the final progress — the metric names
    * identify which state store ACTUALLY served the query. */
  private def windowedAggRun(name: String): (Array[org.apache.spark.sql.Row], String) = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val agg = StreamingOps.windowedCounts(
      in.toDF(), "10 minutes", "10 minutes", "5 minutes")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName(name)
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      in.addData(
        Ev(1, ts(1), 1, "click", 1.0), Ev(2, ts(4), 1, "click", 2.0),
        Ev(3, ts(12), 2, "view", 3.0))
      q.processAllAvailable()
      // advance event time far enough to close the 10:00 and 10:10 windows
      in.addData(Ev(4, ts(40), 1, "click", 4.0))
      q.processAllAvailable()
      val metrics = Option(q.lastProgress).toSeq
        .flatMap(_.stateOperators.toSeq)
        .flatMap(_.customMetrics.keySet.toArray.map(_.toString))
        .mkString(",")
      (spark.table(name).collect(), metrics)
    } finally q.stop()
  }

  private def assertWindows(out: Array[org.apache.spark.sql.Row]): Unit = {
    val w0 = out.find(r => r.getAs[Timestamp]("window_start") == ts(0))
    assert(w0.exists(r => r.getAs[Long]("n") == 2 &&
      r.getAs[Double]("total_value") == 3.0))
    val w1 = out.find(r => r.getAs[Timestamp]("window_start") == ts(10))
    assert(w1.exists(r => r.getAs[Long]("n") == 1))
  }

  test("watermarked windowed aggregation over a stream emits finalized windows") {
    val (out, _) = windowedAggRun("win_out")
    assertWindows(out)
  }

  test("stateful ops run unchanged on the RocksDB state store provider") {
    // the 100 TB state backend: keyed state lives off-heap/on-disk in
    // RocksDB instead of the in-memory HDFS-backed map — same results,
    // state size no longer bounded by executor heap. Provider is pinned
    // per query at start; this guards that our stateful operators carry
    // no HDFSBackedStateStore assumption.
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val (out, metrics) = windowedAggRun("rocks_out")
      assertWindows(out)
      // guard against a vacuous pass: if the conf key ever rots, the query
      // silently runs on the default provider — the custom metric names
      // prove RocksDB actually served the state
      assert(metrics.toLowerCase.contains("rocksdb"), metrics)
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("transformWithState running totals: monotone per-key updates across micro-batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // transformWithState requires the RocksDB provider
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[StreamingOps.TwsEvent]
    val q = StreamingOps.runningTotals(in.toDS()).toDF()
      .writeStream.outputMode("update")
      .format("memory").queryName("tws_out")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      in.addData(StreamingOps.TwsEvent(1, 100), StreamingOps.TwsEvent(1, 250),
        StreamingOps.TwsEvent(2, 40))
      q.processAllAvailable()
      in.addData(StreamingOps.TwsEvent(1, 50), StreamingOps.TwsEvent(3, 7))
      q.processAllAvailable()
      val rows = spark.table("tws_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // batch 1 emits (1, 2, 350) and (2, 1, 40); batch 2 carries user 1's
      // state forward to (1, 3, 400) and opens (3, 1, 7) — the per-key
      // update stream is monotone in n, so max-n recovers the final state
      assert(rows.toSet == Set((1L, 2L, 350L), (2L, 1L, 40L),
        (1L, 3L, 400L), (3L, 1L, 7L)), rows.mkString(","))
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState state survives a checkpoint stop/restart") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_tws_ckpt").toString
    val in = MemoryStream[StreamingOps.TwsEvent]
    // memory sink cannot recover from a checkpoint; foreachBatch can —
    // collect every update emission into a driver-side buffer
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long)]()
    def start() = StreamingOps.runningTotals(in.toDS()).toDF()
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r => buf.add((r.getLong(0), r.getLong(1), r.getLong(2))))
      }
      .trigger(Trigger.ProcessingTime(0)).start()
    val q1 = start()
    try {
      in.addData(StreamingOps.TwsEvent(1, 100), StreamingOps.TwsEvent(1, 250),
        StreamingOps.TwsEvent(2, 40))
      q1.processAllAvailable()
    } finally q1.stop() // stop after batch 1 — state now lives ONLY in the checkpoint
    in.addData(StreamingOps.TwsEvent(1, 50), StreamingOps.TwsEvent(3, 7))
    val q2 = start() // fresh query object, same checkpoint
    try {
      q2.processAllAvailable()
      // final state per key = max-n_events emission; user 1's batch-2 total
      // MUST include batch 1's state (3 events, 400 cents) — a state loss
      // would restart it at (1, 50)
      import scala.jdk.CollectionConverters._
      val finalState = buf.asScala.toSeq.groupBy(_._1)
        .map { case (k, vs) => k -> vs.maxBy(_._2) }
      assert(finalState == Map(
        1L -> ((1L, 3L, 400L)), 2L -> ((2L, 1L, 40L)), 3L -> ((3L, 1L, 7L))),
        buf.asScala.mkString(","))
    } finally {
      q2.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("incremental near-dup via foreachBatch equals the batch pair set") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import graft.operators.Dedup
    // two cross-batch near-dup groups + one unique doc: (1,4) arrive in
    // different micro-batches, (2,5) likewise — the accumulated signature
    // index is the only way a later batch can see an earlier doc
    val b1 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "spark engines process very large corpora with partitioned joins"),
      (3L, "completely unrelated text about nothing in particular at all"))
    val b2 = Seq(
      (4L, "the quick brown fox jumps over the lazy cat today"),
      (5L, "spark engines process very large corpora with partitioned shuffles"))
    val allDocs = (b1 ++ b2).toDF("doc_id", "text")
    var index = Dedup.minhashSignatures(allDocs.limit(0), "doc_id", "text")
    val found = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("doc_id", "text")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val (pairs, updated) = Dedup.incrementalNearDupStep(
          index, batch, "doc_id", "text")
        pairs.collect().foreach(r => found.add((r.getLong(0), r.getLong(1))))
        index = updated.localCheckpoint(true) // the persisted signature table
      }
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val batchPairs = Dedup.minhashNearDupPairs(allDocs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    import scala.jdk.CollectionConverters._
    assert(found.asScala.toSet == batchPairs && batchPairs.nonEmpty,
      s"incremental=${found.asScala.toSet} batch=$batchPairs")
    graft.operators.PlanCache.releaseAll()
  }

  test("dropDuplicatesWithinWatermark removes in-horizon duplicate keys") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val dedup = StreamingOps.dedupWithinWatermark(
      in.toDF(), Seq("event_id"), "1 hour")
    val q = dedup.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      in.addData(
        Ev(1, ts(1), 1, "click", 1.0),
        Ev(1, ts(2), 1, "click", 1.0),   // duplicate id within horizon
        Ev(2, ts(3), 2, "view", 2.0))
      q.processAllAvailable()
      in.addData(Ev(1, ts(5), 1, "click", 1.0)) // still duplicate
      q.processAllAvailable()
      assert(spark.table("dedup_out").select("event_id")
        .as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization closes sessions via event-time gap") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[StreamingOps.SessionEvent]
    // 1-minute gap, 10s watermark delay: user 7's session (ends 10:02)
    // times out once the watermark passes 10:03.
    val sessions = StreamingOps.sessionize(in.toDS(), gapMs = 60 * 1000L)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sess_out")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      in.addData(
        StreamingOps.SessionEvent(7, ts(1), 10.0),
        StreamingOps.SessionEvent(7, ts(2), 5.0))
      q.processAllAvailable()
      // advance event time: watermark 10:30-10s >> 10:03 closes user 7
      in.addData(StreamingOps.SessionEvent(8, ts(30), 1.0))
      q.processAllAvailable()
      in.addData(StreamingOps.SessionEvent(8, ts(31), 1.0))
      q.processAllAvailable()
      val out = spark.table("sess_out").as[StreamingOps.Session].collect()
      val s7 = out.find(_.user_id == 7)
      assert(s7.exists(s => s.n_events == 2 && s.total_value == 15.0 &&
        s.start_ts == ts(1) && s.end_ts == ts(2)))
    } finally q.stop()
  }

  test("sessionization absorbs a late out-of-order event from a later batch") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[StreamingOps.SessionEvent]
    // 10-minute gap, 10-minute watermark delay: a second micro-batch can
    // deliver an event whose ts lies INSIDE the open session's span.
    val sessions = StreamingOps.sessionize(in.toDS(),
      gapMs = 10 * 60 * 1000L, watermarkDelay = "10 minutes")
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sess_late_out")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      in.addData(
        StreamingOps.SessionEvent(7, ts(1), 1.0),
        StreamingOps.SessionEvent(7, ts(5), 2.0))
      q.processAllAvailable()
      // late but within the watermark (10:05 - 10min = 9:55): must merge
      // WITHOUT dragging end_ts (and the close timer) back to 10:03
      in.addData(StreamingOps.SessionEvent(7, ts(3), 4.0))
      q.processAllAvailable()
      // advance the watermark past 10:05 + gap to close user 7's session,
      // then one more batch so the fired timer's emission is collected
      in.addData(StreamingOps.SessionEvent(8, Timestamp.valueOf("2024-01-01 11:00:00"), 1.0))
      q.processAllAvailable()
      in.addData(StreamingOps.SessionEvent(8, Timestamp.valueOf("2024-01-01 11:01:00"), 1.0))
      q.processAllAvailable()
      val out = spark.table("sess_late_out").as[StreamingOps.Session].collect()
      val s7 = out.find(_.user_id == 7)
      assert(s7.exists(s => s.n_events == 3 && s.total_value == 7.0 &&
        s.start_ts == ts(1) && s.end_ts == ts(5)), s"got $out")
    } finally q.stop()
  }

  test("stream-stream interval join pairs right events inside the horizon") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val imps = MemoryStream[Ev]    // left: impressions
    val clicks = MemoryStream[Ev]  // right: clicks
    val joined = StreamingOps.intervalJoin(
      imps.toDF(), clicks.toDF(), "user_id",
      horizon = "10 minutes", watermark = "30 minutes")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ij_out")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      imps.addData(Ev(1, ts(0), 7, "imp", 0.0), Ev(2, ts(20), 7, "imp", 0.0))
      clicks.addData(
        Ev(10, ts(5), 7, "click", 1.0),   // within 10 min of imp 1
        Ev(11, ts(25), 7, "click", 1.0),  // within 10 min of imp 2 only
        Ev(12, ts(45), 8, "click", 1.0))  // wrong user
      q.processAllAvailable()
      val pairs = spark.table("ij_out")
        .select("l_event_id", "r_event_id").as[(Long, Long)]
        .collect().sorted.toSeq
      assert(pairs == Seq((1L, 10L), (2L, 11L)))
    } finally q.stop()
  }

  test("left-outer interval join emits null-padded misses after the watermark passes") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val imps = MemoryStream[Ev]
    val clicks = MemoryStream[Ev]
    val joined = StreamingOps.intervalJoin(
      imps.toDF(), clicks.toDF(), "user_id",
      horizon = "10 minutes", watermark = "30 minutes",
      joinType = "leftOuter")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("loj_out")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      imps.addData(Ev(1, ts(0), 7, "imp", 0.0), Ev(2, ts(1), 9, "imp", 0.0))
      clicks.addData(Ev(10, ts(5), 7, "click", 1.0)) // user 9 never clicks
      q.processAllAvailable()
      // advance both watermarks far past imp 2's interval end so the
      // unmatched row is finalized and emitted null-padded
      imps.addData(Ev(3, Timestamp.valueOf("2024-01-01 12:00:00"), 1, "imp", 0.0))
      clicks.addData(Ev(11, Timestamp.valueOf("2024-01-01 12:00:00"), 1, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("loj_out")
        .select("l_event_id", "r_event_id").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toSet
      assert(rows.contains((1L, 10L)), s"matched pair missing: $rows")
      assert(rows.contains((2L, -1L)), s"null-padded miss missing: $rows")
    } finally q.stop()
  }

  test("left-outer join-state eviction boundary: unmatched left emits iff t + horizon < min-of-branch watermarks (strict)") {
    // Pins the eviction rule q230's oracle encodes (ADVICE r7) so a
    // Spark upgrade that changes JoinStateWatermarkPredicates fails THIS
    // named test instead of q230's opaque hash check. The rule, for
    // condition r >= l && r <= l + horizon with watermark delay 0:
    //   - the global watermark is the MIN over the two branch
    //     watermarks (each = that side's max seen event time);
    //   - an unmatched left row at event time t is finalized (emitted
    //     null-padded) iff t + horizon < wm — STRICTLY: equality keeps
    //     the row in state.
    // The right side's watermark is held at 10:21 while the left runs
    // ahead to 10:41, so this also fails if the min policy changes.
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val imps = MemoryStream[Ev]
    val clicks = MemoryStream[Ev]
    val joined = StreamingOps.intervalJoin(
      imps.toDF(), clicks.toDF(), "user_id",
      horizon = "10 minutes", watermark = "0 seconds",
      joinType = "leftOuter")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("loj_evict")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      // three unmatched imps straddling the boundary for wm = 10:21
      imps.addData(
        Ev(1, ts(0), 7, "imp", 0.0),   // 10:00 + 10min = 10:10 < 10:21 → emit
        Ev(2, ts(11), 8, "imp", 0.0),  // 10:11 + 10min = 10:21 = wm   → HELD
        Ev(3, ts(15), 9, "imp", 0.0))  // 10:15 + 10min = 10:25 > wm   → HELD
      q.processAllAvailable()
      // left watermark → 10:41, right watermark → 10:21; global = 10:21
      imps.addData(Ev(4, ts(41), 1, "imp", 0.0))
      clicks.addData(Ev(10, ts(21), 2, "click", 1.0))
      q.processAllAvailable()
      val unmatchedUsers = spark.table("loj_evict")
        .filter(col("r_event_id").isNull)
        .select("l_user_id").as[Long].collect().toSet
      assert(unmatchedUsers == Set(7L),
        s"eviction boundary drifted: unmatched users $unmatchedUsers " +
          "(expected exactly user 7: t+horizon strictly below " +
          "min(left wm, right wm))")
    } finally q.stop()
  }

  test("incremental ANN cell assignment via foreachBatch equals the batch index") {
    // The q240 production shape driven through a real stream: centroids
    // trained once (fixed frame here), each arriving micro-batch of new
    // embeddings assigned via Similarity.assignCells and appended to the
    // membership buffer — union over batches must equal the one-shot
    // batch assignment of the same corpus, because assignment is per-row
    // given fixed centroids.
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import graft.operators.Similarity
    val cents = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 0.0)),
      (1L, Seq(0.0, 1.0, 0.0, 0.0))).toDF("cid", "cvec")
    val b1 = Seq((10L, Seq(0.9, 0.1, 0.0, 0.0)), (11L, Seq(0.1, 0.8, 0.0, 0.1)))
    val b2 = Seq((12L, Seq(0.7, 0.2, 0.1, 0.0)), (13L, Seq(0.0, 0.9, 0.4, 0.0)))
    val in = MemoryStream[(Long, Seq[Double])]
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val q = in.toDF().toDF("vec_id", "e").writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Similarity.assignCells(batch, "e", cents, "cid", "cvec")
          .select("vec_id", "cid").collect()
          .foreach(r => buf.add((r.getLong(0), r.getLong(1))))
      }
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    import scala.jdk.CollectionConverters._
    val batchIndex = Similarity.assignCells(
        (b1 ++ b2).toDF("vec_id", "e"), "e", cents, "cid", "cvec")
      .select("vec_id", "cid").as[(Long, Long)].collect().toSet
    assert(buf.asScala.toSet == batchIndex && batchIndex.nonEmpty,
      s"incremental ${buf.asScala.toSet} vs batch $batchIndex")
  }

  test("drift-monitor bin counts maintained via foreachBatch equal the batch counts") {
    // The q251 maintenance claim driven through a real stream: the
    // monitor keeps one (bin -> count) map and each arriving micro-batch
    // only ADDS its own bin counts — counts are associative, so the
    // maintained map after all batches must equal the one-shot batch
    // groupBy of the same rows. (The PSI arithmetic downstream is pure
    // grid math over these counts; the streaming-specific part is
    // exactly this accumulation.)
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val binOf: Double => Long = v => math.min(9L, math.floor(v / 40.0).toLong)
    val b1 = Seq(12.0, 47.0, 388.0, 41.0)
    val b2 = Seq(3.0, 79.9, 120.0)
    val maintained = scala.collection.concurrent.TrieMap.empty[Long, Long]
    val in = MemoryStream[Double]
    val q = in.toDF().toDF("value").writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.select(least(lit(9), floor(col("value") / 40.0).cast("long"))
            .as("bin"))
          .groupBy("bin").count().collect()
          .foreach { r =>
            val bin = r.getLong(0)
            maintained.updateWith(bin)(c => Some(c.getOrElse(0L) + r.getLong(1)))
          }
      }
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val batchCounts = (b1 ++ b2).groupBy(binOf).map { case (k, v) => k -> v.size.toLong }
    assert(maintained.toMap == batchCounts && batchCounts.nonEmpty,
      s"maintained ${maintained.toMap} vs batch $batchCounts")
  }

  test("toJsonLines serializes rows as JSON objects (F5 parity)") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val lines = StreamingOps.toJsonLines(df).collect().sorted
    assert(lines.toSeq == Seq("""{"id":1,"s":"a"}""", """{"id":2,"s":"b"}"""))
  }
}
