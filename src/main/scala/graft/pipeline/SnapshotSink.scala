package graft.pipeline

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.{CdcApply, Compaction}

/** Streaming MERGE loop: maintain a keyed parquet snapshot under a CDC
  * change stream — foreachBatch + CdcApply, the upsert sink a lakehouse
  * runs without a table format. Per micro-batch: read the current
  * snapshot, apply the batch's changes (latest version per key within the
  * batch; batches apply in stream-commit order), write the merged
  * snapshot to a staging dir, and swap it in under Compaction's defensive
  * rename discipline. The staging write MATERIALIZES the merge before the
  * old snapshot moves — the swap never races its own input.
  *
  * Delivery: checkpointed offsets make the loop at-least-once; a replayed
  * batch re-applies the same change set onto the already-merged snapshot,
  * which the latest-version-wins merge absorbs (idempotent for a replay
  * of identical changes — same contract as the reference's retry).
  *
  * Reader visibility: `swapDir` has a window between its two renames
  * where the snapshot dir does not exist, so readers must query BETWEEN
  * micro-batches, not concurrently with the commit (a concurrent scan
  * fails with path-not-found, never sees half a snapshot). A deployment
  * needing always-on readers publishes versioned dirs behind a manifest
  * pointer — see the note on `Compaction.swapDir`.
  */
object SnapshotSink {

  def runCdcUpsert(
      changes: DataFrame,
      snapshotDir: String,
      keyCol: String,
      versionCols: Seq[String],
      opCol: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val snap = spark.read.parquet(snapshotDir)
          val merged = CdcApply.applyChanges(
            snap, batch, keyCol, versionCols.map(col), opCol)
          val path = new Path(snapshotDir)
          val fs = FileSystem.get(path.toUri,
            spark.sparkContext.hadoopConfiguration)
          val staging = new Path(path.getParent, s".merge_${path.getName}")
          merged.write.mode(SaveMode.Overwrite).parquet(staging.toString)
          Compaction.swapDir(fs, staging, path)
        }
      }
      .start()
}
