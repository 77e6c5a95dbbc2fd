package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Bucketing, CdcApply, SkewJoin, SnapshotDiff}

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

  test("bucketed snapshot merges with zero exchange on the snapshot side") {
    // The CdcApply doc's scale claim: with a bucketed snapshot the merge's
    // only shuffles belong to the (small) feed — the snapshot scan feeds
    // the anti join pre-clustered. Proven here structurally (no
    // ShuffleExchange anywhere above the bucketed scan) and by result
    // equality with the plain-snapshot merge.
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val snap0 = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    Bucketing.writeBucketed(snap0, "cust_snap_b", "c_custkey", 8)
    val feed = snap0.limit(50)
      .withColumn("c_name", concat(lit("upd_"), col("c_name")))
      .withColumn("op", when(col("c_custkey") % 2 === 0, "D").otherwise("U"))
      .withColumn("ver", lit(1L))
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val merged = CdcApply.applyChanges(
        spark.table("cust_snap_b"), feed, "c_custkey", Seq(col("ver")), "op")
      val plan = merged.queryExecution.executedPlan
      val shuffledSnapshotScans = plan.collect {
        case e: ShuffleExchangeExec => e.collectLeaves().collect {
          case s: FileSourceScanExec
              if s.tableIdentifier.exists(_.table == "cust_snap_b") => s
        }
      }.flatten
      assert(shuffledSnapshotScans.isEmpty,
        s"snapshot side must not shuffle, plan was:\n$plan")
      assert(plan.toString.contains("SortMergeJoin"), plan.toString)
      val plain = CdcApply.applyChanges(
        snap0, feed, "c_custkey", Seq(col("ver")), "op")
      assert(merged.exceptAll(plain).count() == 0)
      assert(plain.exceptAll(merged).count() == 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS cust_snap_b")
    }
  }

  test("round trip: applyChanges(old, diff(old, new)) == new") {
    // diff is the inverse of apply — the law that makes the pair a
    // complete snapshot-maintenance story
    val old = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .select(col("c_custkey").as("id"), col("c_name").as("name"),
        col("c_acctbal").as("bal"))
    val neu = old.filter(col("id") % 13 =!= 0) // deletes
      .withColumn("bal", when(col("id") % 3 === 0, col("bal") * 2)
        .otherwise(col("bal")))                // updates
      .unionByName(old.limit(5).select(       // inserts (fresh keys)
        (col("id") + 1000000).as("id"), col("name"), col("bal")))
    val feed = SnapshotDiff.diff(old, neu, "id").withColumn("ver", lit(1L))
    val rebuilt = CdcApply.applyChanges(old, feed, "id", Seq(col("ver")), "op")
    assert(rebuilt.exceptAll(neu).count() == 0)
    assert(neu.exceptAll(rebuilt).count() == 0)
    // and the feed carries no no-op rows
    val unchanged = SnapshotDiff.diff(old, old, "id")
    assert(unchanged.count() == 0)
  }

  test("diff detects changes through null value fields correctly") {
    // null == null must read unchanged; null -> value must read updated
    // (struct comparison uses ordering semantics, proven here so a
    // refactor to a null-unsafe comparison fails loudly)
    val old = Seq((1L, Some("a")), (2L, None: Option[String]),
      (3L, None: Option[String])).toDF("id", "v")
    val neu = Seq((1L, Some("a")), (2L, None: Option[String]),
      (3L, Some("x"))).toDF("id", "v")
    val got = SnapshotDiff.diff(old, neu, "id")
      .select("id", "op").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq((3L, "U")))
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
