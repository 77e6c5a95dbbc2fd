package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot differencing — the INVERSE of CdcApply: given two versions of
  * a keyed table, emit the change feed (insert/update/delete full-row
  * images) that transforms one into the other. The round-trip law
  * `CdcApply.applyChanges(old, diff(old, new)) == new` is what makes the
  * pair a complete lakehouse maintenance story (build feeds from
  * snapshots you have; apply feeds to snapshots you keep) — asserted in
  * CdcApplySpec.
  *
  * Shape at scale: ONE full-outer join on the key (both sides large —
  * the same join q70 plans; AQE handles skew); change detection is a
  * scan-side struct comparison, unchanged rows never leave the join. */
object SnapshotDiff {

  /** Returns newSnap's columns plus `op` ('I' | 'U' | 'D'); deleted keys
    * carry the OLD row image (the tombstone's last-known values). */
  def diff(oldSnap: DataFrame, newSnap: DataFrame, keyCol: String): DataFrame = {
    val cols = newSnap.columns.toIndexedSeq
    require(oldSnap.columns.toIndexedSeq == cols,
      "snapshots must share one schema")
    val valCols = cols.filter(_ != keyCol)
    val o = oldSnap.select(cols.map(c => col(c).as(s"__o_$c")): _*)
    val n = newSnap.select(cols.map(c => col(c).as(s"__n_$c")): _*)
    val joined = o.join(n,
      col(s"__o_$keyCol") === col(s"__n_$keyCol"), "full_outer")
    val changed = struct(valCols.map(c => col(s"__o_$c")): _*) =!=
      struct(valCols.map(c => col(s"__n_$c")): _*)
    joined
      .withColumn("op",
        when(col(s"__n_$keyCol").isNull, "D")
          .when(col(s"__o_$keyCol").isNull, "I")
          .when(changed, "U"))
      .filter(col("op").isNotNull)
      .select(cols.map(c =>
        when(col("op") === "D", col(s"__o_$c"))
          .otherwise(col(s"__n_$c")).as(c)) :+ col("op"): _*)
  }
}
