package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOfJoin

/** The native sort-merge as-of operator (custom LogicalPlan + Strategy +
  * SparkPlan) must agree row-for-row with the generic union-interleave
  * emulation, and its plan must be the sort-merge shape: AsOfJoinExec
  * with one exchange per side, no window, no union. */
class AsOfJoinNativeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def inputs = {
    val ev = Tables.events(spark, sfDir).select(
      col("event_id"), col("user_id"),
      expr("timestamp_micros(ts div 1000)").as("ts_us"))
    val ords = spark.read.parquet(s"$sfDir/orders.parquet").select(
      col("o_custkey"), col("o_orderdate"),
      to_date(col("o_orderdate")).as("last_order_day"))
    (ev, ords)
  }

  test("native as-of equals the generic union-interleave operator") {
    val (ev, ords) = inputs
    val native = AsOfJoin.leftAsOfNative(ev, "user_id", "ts_us",
        ords, "o_custkey", "o_orderdate", "last_order_day", "last_order_day")
      .select("event_id", "last_order_day")
    val generic = AsOfJoin.leftAsOf(ev, "user_id", "ts_us",
        ords.drop("last_order_day"), "o_custkey", "o_orderdate",
        to_date(col("o_orderdate")), "last_order_day")
      .select("event_id", "last_order_day")
    assert(native.count() == ev.count())
    assert(native.exceptAll(generic).count() == 0)
    assert(generic.exceptAll(native).count() == 0)
  }

  test("native as-of plans as AsOfJoinExec: one exchange per side, no window/union") {
    val (ev, ords) = inputs
    val df = AsOfJoin.leftAsOfNative(ev, "user_id", "ts_us",
      ords, "o_custkey", "o_orderdate", "last_order_day", "last_order_day")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin "), plan) // AsOfJoinExec prints as "AsOfJoin"
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Union"), plan)
    assert("Exchange hashpartitioning".r.findAllMatchIn(plan).length == 2, plan)
  }

  test("rows with no prior right value carry null; exact-time match is visible") {
    import spark.implicits._
    val l = Seq((1L, 10L), (1L, 20L), (2L, 10L)).toDF("k", "t")
    val r = Seq((1L, 10L, "a"), (1L, 15L, "b"), (3L, 1L, "z")).toDF("k", "t", "v")
    val out = AsOfJoin.leftAsOfNative(l, "k", "t", r, "k", "t", "v", "v_asof")
      .select("k", "t", "v_asof").as[(Long, Long, Option[String])]
      .collect().sortBy(x => (x._1, x._2)).toSeq
    assert(out == Seq((1L, 10L, Some("a")), (1L, 20L, Some("b")), (2L, 10L, None)))
  }

  test("null left key or time emits null carry (never a stale same-key carry)") {
    import spark.implicits._
    val l = Seq((Some(1L), Some(10L)), (Some(1L), None), (None, Some(10L)))
      .toDF("k", "t")
    val r = Seq((1L, 5L, "a")).toDF("k", "t", "v")
    val out = AsOfJoin.leftAsOfNative(l, "k", "t", r, "k", "t", "v", "v_asof")
      .select("k", "t", "v_asof").as[(Option[Long], Option[Long], Option[String])]
      .collect().toSeq
    assert(out.filter(x => x._1.isEmpty || x._2.isEmpty).forall(_._3.isEmpty))
    assert(out.contains((Some(1L), Some(10L), Some("a"))))
  }

  test("string key and carry survive sort spill (retained values are copied)") {
    // 60k right rows per side with the suite-wide 4096-row force-spill
    // threshold guarantee the sort feeding AsOfJoinExec spills; the spill
    // reader reuses its row buffer across next(), so any UTF8String the
    // exec retained un-copied across advanceR() would silently mutate.
    // Every left row has an exact-time right match, so the expected carry
    // is computable per row and a single corrupted value fails the filter.
    import spark.implicits._
    val spilled = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null) spilled.addAndGet(
          e.taskMetrics.memoryBytesSpilled + e.taskMetrics.diskBytesSpilled)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val n = 60000L
      val mk = (side: String) => spark.range(n).select(
        concat(lit("key_"), format_string("%04d", col("id") % 200)).as("k"),
        (col("id") / 200).as("t"),
        concat(lit(s"carry_${side}_"), col("id") % 200, lit("_"), col("id") / 200).as("v"))
      val l = mk("x").drop("v")
      val r = mk("x")
      val out = AsOfJoin.leftAsOfNative(l, "k", "t", r, "k", "t", "v", "v_asof")
      val bad = out.filter(col("v_asof").isNull ||
        col("v_asof") =!= concat(lit("carry_x_"), expr("cast(substring(k, 5) as int)"),
          lit("_"), col("t")))
      assert(bad.count() == 0)
      assert(out.count() == n)
    } finally spark.sparkContext.removeSparkListener(listener)
    // self-check: the test is only meaningful if something actually spilled
    val deadline = System.currentTimeMillis() + 10000
    while (spilled.get() == 0 && System.currentTimeMillis() < deadline) Thread.sleep(100)
    assert(spilled.get() > 0, "expected the force-spill threshold to trigger a sort spill")
  }
}
