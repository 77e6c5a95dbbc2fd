package org.apache.spark

/** Bridge into the `private[spark]` listener bus for the dev-side
  * profiling harness (graft.Profile): SparkListener events are delivered
  * asynchronously, so per-rep metric deltas must DRAIN the bus before
  * snapshotting, or in-flight onTaskEnd/onStageCompleted events bleed
  * into the next rep's delta (ADVICE r16). Dev-tool plumbing only — the
  * bench/verify contract paths never touch this. */
object GraftListenerBridge {
  def drain(sc: SparkContext, timeoutMs: Long = 10000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: Throwable => () }
}
