package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Apply a CDC change feed to a snapshot (the batch MERGE a parquet lake
  * needs once a stream like the reference's ratecard CDC topic has landed:
  * lambda_function.py's records carry SRC_CDC_OPER_NM / SRC_COMMIT_DT_UTC
  * / CNCRNCY_VRSN for exactly this).
  *
  * Semantics: per key, the change with the greatest version wins;
  * a winning upsert replaces the snapshot row (or inserts a new key),
  * a winning delete removes the key; untouched snapshot rows pass through.
  * Version tiebreak must be total per key (caller supplies the columns) —
  * that is what makes the merged snapshot deterministic under retries.
  *
  * Shape at scale: one window over the FEED keyed by the merge key (the
  * feed is the small side — a day of changes, not the snapshot), one
  * anti join + union on the snapshot. The snapshot shuffles once on the
  * key; with a bucketed snapshot table (operators/Bucketing) even that
  * exchange disappears.
  */
object CdcApply {

  /** `changes` must carry the snapshot's columns (the full row image)
    * plus `opCol` and the version columns. Returns the merged snapshot
    * with exactly the snapshot's columns. */
  def applyChanges(
      snapshot: DataFrame, changes: DataFrame, keyCol: String,
      versionCols: Seq[Column], opCol: String,
      deleteOp: String = "D"): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(versionCols.map(_.desc): _*)
    val latest = changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
    val kept = snapshot.join(
      latest.select(col(keyCol)), Seq(keyCol), "left_anti")
    val upserts = latest.filter(col(opCol) =!= deleteOp)
      .select(snapshot.columns.toIndexedSeq.map(col): _*)
    kept.unionByName(upserts)
  }
}
