package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dynamic partition pruning: on a partition-layout lake table, a join
  * against a filtered dimension must prune fact PARTITIONS at runtime
  * (the 100 TB path: the dim filter decides which date/flag directories
  * are read at all — without DPP the scan reads every partition and the
  * join discards the rows after IO). Catalyst inserts the pruning
  * subquery automatically when the join key is the partition column;
  * this spec pins that the repo's session settings keep it firing. */
class DppSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("partitioned fact ⋈ filtered dim plans a dynamicpruning partition filter") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    Tables.lineitem(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").partitionBy("l_returnflag").parquet(dir)
    val fact = spark.read.parquet(dir)
    // the dim must be a SCANNED relation: a literal LocalRelation gets its
    // filter constant-folded away (ConvertToLocalRelation), and with no
    // Filter node left DPP sees no selective predicate to propagate
    val dimDir = java.nio.file.Files.createTempDirectory("graft_dpp_dim").toString
    Seq(("R", 1), ("A", 2), ("N", 3)).toDF("flag", "grp")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter(col("grp") === 1)
    val joined = fact.join(dim, fact("l_returnflag") === dim("flag"))
      .groupBy("flag").agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"), plan)
    // and the result is still correct: only the R partition's rows
    val byFlag = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .filter(col("l_returnflag") === "R").count()
    assert(joined.collect().map(r => r.getLong(1)).sum == byFlag)
  }
}
