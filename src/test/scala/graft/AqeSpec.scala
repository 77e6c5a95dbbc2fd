package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime-adaptive execution evidence: the scale story for skew is
  * "salt only what AQE can't fix" (SCALE.md skew strategy; q47/q64 are
  * the explicit-salt fallbacks). This spec proves the implicit half
  * actually engages in this build: a deliberately skewed sort-merge
  * join re-plans at runtime with the skewed partition SPLIT, so one
  * hot key cannot serialize a 1000-executor stage.
  */
class AqeSpec extends AnyFunSuite {

  test("AQE splits the hot partition of a skewed sort-merge join") {
    val s = SparkTestSession.spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    s.conf.set("spark.sql.shuffle.partitions", "8")
    // one hot key (0) carrying 80% of the left side; the INCOMPRESSIBLE
    // md5 payload must survive into the join output — a pruned or
    // constant column compresses the hot shuffle partition below the
    // skew threshold and AQE (correctly) sees no skew
    val left = s.range(0, 100000)
      .select(
        when(col("id") < 80000, 0L).otherwise(col("id") % 50).as("k"),
        md5(col("id").cast("string")).as("pad"))
    val right = s.range(0, 50).select(col("id").as("k"),
      col("id").cast("string").as("rv"))
    val joined = left.join(right, "k").select(col("k"), col("pad"))
    // collect THIS frame: count() would execute a different
    // QueryExecution and leave this one's adaptive plan unfinalized
    assert(joined.collect().length == 100000)
    val finalPlan = joined.queryExecution.executedPlan.toString
    assert(finalPlan.contains("skew=true"),
      s"expected a skew-split sort-merge join in the adaptive final plan:\n$finalPlan")
  }

  test("AQE coalesces an over-partitioned small shuffle") {
    val s = SparkTestSession.spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    s.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1MB")
    s.conf.set("spark.sql.shuffle.partitions", "200")
    val agg = s.range(0, 1000)
      .groupBy((col("id") % 10).as("g")).agg(count(lit(1)).as("n"))
    assert(agg.collect().length == 10)
    val finalPlan = agg.queryExecution.executedPlan.toString
    // 200 configured partitions collapse to far fewer at runtime
    assert(finalPlan.contains("AQEShuffleRead coalesced") ||
      finalPlan.contains("coalesced"),
      s"expected a coalesced AQE shuffle read:\n$finalPlan")
  }
}
