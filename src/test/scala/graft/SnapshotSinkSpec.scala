package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.SnapshotSink

import java.nio.file.Files

/** The streaming MERGE loop: a CDC change stream maintains a keyed
  * parquet snapshot via foreachBatch + CdcApply + atomic dir swap, and
  * the final snapshot equals applying the same feeds batch-by-batch. */
class SnapshotSinkSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  case class Change(id: Long, name: String, bal: Double, ver: Long, op: String)

  test("streamed CDC upserts converge the snapshot to the batch-applied state") {
    implicit val ctx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_snap").toString + "/snap"
    val ckpt = Files.createTempDirectory("graft_snap_ckpt").toString
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "bal").write.parquet(dir)

    val in = MemoryStream[Change]
    val q = SnapshotSink.runCdcUpsert(
      in.toDF(), dir, "id", Seq("ver"), "op", ckpt,
      trigger = Trigger.ProcessingTime(0))
    try {
      // batch 1: update 1, insert 9
      in.addData(Change(1, "a2", 11.0, 1, "U"), Change(9, "new", 90.0, 1, "U"))
      q.processAllAvailable()
      val after1 = spark.read.parquet(dir)
        .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
      assert(after1 == Seq((1L, "a2", 11.0), (2L, "b", 20.0),
        (3L, "c", 30.0), (9L, "new", 90.0)))

      // batch 2: delete 2, re-update 1 (later version beats batch 1's row)
      in.addData(Change(2, "b", 0.0, 2, "D"), Change(1, "a3", 12.0, 2, "U"))
      q.processAllAvailable()
      val after2 = spark.read.parquet(dir)
        .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
      assert(after2 == Seq((1L, "a3", 12.0), (3L, "c", 30.0),
        (9L, "new", 90.0)))
    } finally q.stop()

    // no stale backup / staging dirs remain after the swaps
    val parent = new java.io.File(dir).getParentFile
    assert(!parent.listFiles().exists(f =>
      f.getName.startsWith(".old_") || f.getName.startsWith(".merge_")))
  }
}
