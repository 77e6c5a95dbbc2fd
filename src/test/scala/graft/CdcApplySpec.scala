package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{CdcApply, SkewJoin}

/** CDC-merge edge semantics (delete wins, version tiebreak, new-key
  * insert, untouched passthrough) and salted-join equivalence corners. */
class CdcApplySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("applyChanges: upsert, delete, insert, passthrough, version tiebreak") {
    val snap = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val feed = Seq(
      (1L, "a2", 10L, 1L, "U"),  // older update...
      (1L, "a3", 10L, 2L, "U"),  // ...same version col 1, higher col 2 wins
      (2L, "xx", 5L, 1L, "D"),   // delete key 2
      (9L, "new", 1L, 1L, "U"))  // brand-new key
      .toDF("id", "v", "ver", "seq", "op")
    val out = CdcApply.applyChanges(
        snap, feed, "id", Seq(col("ver"), col("seq")), "op")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, "a3"), (3L, "c"), (9L, "new")))
  }

  test("applyChanges: a delete outversioned by a later upsert keeps the row") {
    val snap = Seq((1L, "a")).toDF("id", "v")
    val feed = Seq(
      (1L, "gone", 1L, 1L, "D"),
      (1L, "back", 2L, 1L, "U"))
      .toDF("id", "v", "ver", "seq", "op")
    val out = CdcApply.applyChanges(
        snap, feed, "id", Seq(col("ver"), col("seq")), "op")
      .as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "back")))
  }

  test("saltedJoin equals the plain join for any salt count") {
    val left = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    val right = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
    val plain = left.join(right, "l_orderkey")
    for (s <- Seq(1, 7)) {
      val salted = SkewJoin.saltedJoin(left, right, "l_orderkey",
        col("l_linenumber"), s)
      assert(salted.count() == plain.count(), s"salts=$s")
      assert(salted.exceptAll(plain).count() == 0, s"salts=$s")
    }
  }
}
