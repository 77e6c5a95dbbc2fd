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
    val ev = spark.read.parquet(s"$sfDir/events.parquet").select(
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
}
