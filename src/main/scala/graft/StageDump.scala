package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** TEMPORARY dev scratch tool (r17): per-stage shuffle bytes for one
  * catalog entry. Deleted before commit. */
object StageDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.catalog.graftfns", "graft.functions.GraftFunctionCatalog")
      .config("spark.sql.catalog.graftlake", "graft.sources.GraftRowCatalog")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.graft.bench.singleWave", "true")
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val m = i.taskMetrics
        rows.add(f"stage ${i.stageId}%4d tasks=${i.numTasks}%4d " +
          f"shW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.1fMB " +
          f"shR=${m.shuffleReadMetrics.totalBytesRead / 1e6}%8.1fMB " +
          f"runMs=${m.executorRunTime}%7d  ${i.name.takeWhile(_ != '\n').take(80)}")
      }
    })
    val q = SparkEntry.catalog.find(_.name == name).get
    Bench.timeEntry(spark, sfDir, q) // warm
    rows.clear()
    val (sec, err) = Bench.timeEntry(spark, sfDir, q)
    org.apache.spark.GraftListenerBridge.drain(spark.sparkContext)
    println(s"== $name: $sec s  err=$err")
    rows.forEach(println(_))
    spark.stop()
  }
}
