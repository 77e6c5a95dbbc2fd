package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All catalog sections, in order. */
  def catalog: Seq[Q] =
    Relational.all ++ Relational2.all ++ Relational3.all ++
      Relational4.all ++ Relational5.all ++ Relational6.all ++ ModernSql.all ++
      Ingest.all ++ TextOps.all ++
      TextOps2.all ++ TextOps3.all ++ TextOps4.all ++ TextOps5.all ++
      TextOps6.all ++ TextOps7.all ++ TextOps8.all ++ TextOps9.all ++
      TextOps10.all ++ TextOps11.all ++ TextOps12.all ++ TextOps13.all ++
      DataOps.all ++ DataOps2.all ++ DataOps3.all ++ DataOps4.all ++
      DataOps5.all ++ DataOps6.all ++ DataOps7.all ++ AuditOps.all ++
      LakeOps.all ++ LakeOps2.all ++ GovOps.all ++ QualityOps.all ++ QualityOps2.all ++
      EventOps.all ++ EventOps2.all ++ EventOps3.all ++ EventOps4.all ++
      OpsDiag.all ++ OpsDiag2.all ++ StatsOps.all ++ StatsOps2.all ++
      StatsOps3.all ++ StatsOps4.all ++ StatsOps5.all ++ StatsOps6.all ++
      StatsOps7.all ++
      GraphOps.all ++ GraphOps2.all ++ MiningOps.all ++ MiningOps2.all ++ MiningOps3.all ++
      LinkOps.all ++ SpatialOps.all ++
      VectorOps.all ++ VectorOps2.all ++ VectorOps3.all ++ VectorOps4.all ++
      VectorOps5.all ++ VectorOps6.all ++ VectorOps7.all ++ VectorOps8.all ++
      MultimodalQ.all ++ StreamQ.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q05_join_multi.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    catalog.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
