package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{AsOfJoin, Dedup}

import java.sql.Timestamp

/** The reusable operator API (as-of join, dedup) on hand-built frames with
  * known answers. */
class OperatorsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private def ts(s: String) = Timestamp.valueOf(s)

  test("leftAsOf attaches the most recent right value at-or-before each left time") {
    val trades = Seq(
      (1L, "A", ts("2024-01-01 10:00:00")),
      (2L, "A", ts("2024-01-01 10:05:00")),
      (3L, "B", ts("2024-01-01 10:02:00")),
      (4L, "A", ts("2024-01-01 09:00:00"))   // before any quote
    ).toDF("trade_id", "sym", "t")
    val quotes = Seq(
      ("A", ts("2024-01-01 09:30:00"), 100.0),
      ("A", ts("2024-01-01 10:05:00"), 105.0), // exactly simultaneous w/ trade 2
      ("B", ts("2024-01-01 10:01:00"), 50.0)
    ).toDF("sym", "qt", "px")
    val got = AsOfJoin.leftAsOf(trades, "sym", "t", quotes, "sym", "qt",
        col("px"), "last_px")
      .orderBy("trade_id")
      .select("trade_id", "last_px")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    assert(got.toSeq == Seq(
      1L -> Some(100.0),   // 09:30 quote
      2L -> Some(105.0),   // simultaneous quote visible (≤ semantics)
      3L -> Some(50.0),
      4L -> None))         // no quote yet
  }

  test("Dedup.exact keeps the minimum id per content and counts copies") {
    val docs = Seq((10L, "x"), (3L, "x"), (7L, "y")).toDF("id", "body")
    val got = Dedup.exact(docs, "id", "body")
      .orderBy("keep_id")
      .select("keep_id", "n_copies").as[(Long, Long)].collect()
    assert(got.toSeq == Seq((3L, 2L), (7L, 1L)))
  }

  test("minhashNearDupPairs finds an exact near-duplicate pair") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      (1L, base),
      (2L, base + " tonight"),                       // near-dup of 1
      (3L, "completely different words entirely here with nothing shared at all ok")
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDupPairs(docs, "doc_id", "text", threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    spark.catalog.clearCache()
    assert(pairs.toSeq == Seq((1L, 2L)))
  }
}
