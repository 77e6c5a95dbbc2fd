package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operator surface beyond the foreachBatch parity
  * pipeline (SURVEY.md §2.6 marks these as the extension path: the
  * reference has no event-time logic, so these are the capabilities a
  * 100 TB streaming deployment adds on top of reference semantics).
  *
  * All transforms take a DataFrame with the events-table shape
  * (event_id, ts timestamp, user_id, event_type, value) and work
  * identically on batch or streaming inputs — callers pick the source.
  */
object StreamingOps {

  /** Event-time tumbling/sliding windowed aggregation with a watermark:
    * late data beyond the watermark is dropped, state is bounded. */
  def windowedCounts(
      events: DataFrame,
      windowDur: String = "1 hour",
      slideDur: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur, slideDur), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n"), col("total_value"))

  /** Streaming exact dedup with bounded state: duplicates within the
    * watermark horizon are dropped (the streaming analogue of the A2
    * distinct-count contract — SURVEY.md §2.6 delivery semantics). */
  def dedupWithinWatermark(
      events: DataFrame,
      keys: Seq[String],
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys)

  case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class Session(user_id: Long, n_events: Long, total_value: Double,
      start_ts: java.sql.Timestamp, end_ts: java.sql.Timestamp)

  /** Exact microseconds of a Timestamp (getTime alone truncates the
    * sub-millisecond part that nano-precision event times carry). */
  private def micros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** Custom stateful operator: gap-based sessionization per user via
    * flatMapGroupsWithState with EVENT-time timeouts. Sessions split on
    * gaps WITHIN a micro-batch (emitted immediately — this is what makes
    * the operator agree with batch gap-sessionization, q68) and the
    * trailing open session closes when the watermark passes
    * (last event + gap). Event-time state is deterministic and
    * replay-stable, which is what a 100 TB deployment needs
    * (processing-time timeouts re-fire differently on restart).
    * Gap comparisons run on exact microseconds; the close timer is the
    * millisecond floor of (end + gap), the granularity watermarks use.
    * Input must carry a watermark on `ts`. Emits closed sessions.
    *
    * CONTRACT: `watermarkDelay` must be <= `gapMs`. The order-insensitive
    * min/max session merge is safe only because any event that reaches the
    * operator is within the watermark horizon of the max seen time; with
    * delay > gap, a late event older than an open session's start by more
    * than the gap would silently merge into it instead of forming its own
    * session, diverging from batch gap-sessionization. Enforced below. */
  def sessionize(events: Dataset[SessionEvent],
      gapMs: Long = 30 * 60 * 1000L,
      watermarkDelay: String = "10 seconds"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapMs * 1000L
    val delayIv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(watermarkDelay))
    require(delayIv.months == 0,
      s"watermarkDelay must not use month units, got '$watermarkDelay'")
    val delayUs = delayIv.days * 86400000000L + delayIv.microseconds
    require(delayUs <= gapUs,
      s"watermarkDelay ('$watermarkDelay' = ${delayUs}us) must be <= gap " +
        s"(${gapUs}us): beyond-gap-late events would merge into the wrong session")
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Session, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, it: Iterator[SessionEvent], state: GroupState[Session]) => {
          if (state.hasTimedOut) {
            val done = state.get
            state.remove()
            Iterator.single(done)
          } else {
            val evs = it.toIndexedSeq.sortBy(e => micros(e.ts))
            if (evs.isEmpty) Iterator.empty
            else {
              val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
              var cur = state.getOption.orNull
              evs.foreach { e =>
                cur =
                  if (cur == null)
                    Session(userId, 1L, e.value, e.ts, e.ts)
                  else if (micros(e.ts) - micros(cur.end_ts) > gapUs) {
                    closed += cur
                    Session(userId, 1L, e.value, e.ts, e.ts)
                  } else {
                    // min/max merge, not start=cur/end=e: a late-but-within-
                    // watermark event from a LATER micro-batch can carry
                    // ts < cur.end_ts, and taking end_ts = e.ts would drag
                    // the session end (and the event-time close timer)
                    // backwards — closing the session too early and
                    // diverging from the batch gap-sessionization oracle.
                    // Order-insensitive state is safe here because any event
                    // that reaches the operator is within the watermark
                    // horizon (<< gap) of the max seen time, so it can never
                    // belong to a separate earlier session.
                    val st = if (micros(e.ts) < micros(cur.start_ts)) e.ts
                             else cur.start_ts
                    val en = if (micros(e.ts) > micros(cur.end_ts)) e.ts
                             else cur.end_ts
                    Session(userId, cur.n_events + 1,
                      cur.total_value + e.value, st, en)
                  }
              }
              state.update(cur)
              // never at-or-behind the current watermark (the API rejects
              // that); a stale timer fires on the next batch instead
              state.setTimeoutTimestamp(math.max(
                Math.floorDiv(micros(cur.end_ts) + gapUs, 1000L),
                state.getCurrentWatermarkMs() + 1))
              closed.iterator
            }
          }
        })
  }

  /** Watermarked stream-stream interval join (the click-after-impression
    * pattern): each left event pairs with right events for the same key
    * whose time lies in [left.ts, left.ts + horizon]. BOTH sides carry
    * watermarks and the join condition bounds the time distance, so state
    * on each side is evictable — the only stream-stream join shape whose
    * state does not grow without bound. Columns are prefixed to keep both
    * timestamps addressable downstream.
    *
    * `joinType` extends the shape to the outer variants ("leftOuter",
    * "rightOuter", "fullOuter"): unmatched rows emit null-padded ONLY
    * once the watermark passes the end of their match interval — the
    * outer result is late by the watermark delay, which is the price of
    * a correct "did not convert" signal on an unbounded stream. */
  def intervalJoin(
      left: DataFrame, right: DataFrame, key: String,
      horizon: String = "1 hour",
      watermark: String = "2 hours",
      tsCol: String = "ts",
      joinType: String = "inner"): DataFrame = {
    val l = left.select(left.columns.toIndexedSeq.map(c => col(c).as(s"l_$c")): _*)
      .withWatermark(s"l_$tsCol", watermark)
    val r = right.select(right.columns.toIndexedSeq.map(c => col(c).as(s"r_$c")): _*)
      .withWatermark(s"r_$tsCol", watermark)
    l.join(r, col(s"l_$key") === col(s"r_$key") &&
      col(s"r_$tsCol") >= col(s"l_$tsCol") &&
      col(s"r_$tsCol") <= col(s"l_$tsCol") + expr(s"INTERVAL $horizon"),
      joinType)
  }

  /** F5 parity: JSON serialization of a batch (the v1 response body,
    * lambda_function.py:228) — one JSON object per row. */
  def toJsonLines(df: DataFrame): Dataset[String] = {
    import df.sparkSession.implicits._
    df.select(to_json(struct(df.columns.toIndexedSeq.map(col): _*)).as("json")).as[String]
  }

  // Aliases: the case classes live at the package top level because
  // Janino cannot resolve methods on classes with '$' in their binary
  // name (StreamingOps$TwsState) — the state encoder's UnsafeProjection
  // silently fell back to interpreter mode when they were nested here.
  type TwsEvent = graft.streaming.TwsEvent
  val TwsEvent = graft.streaming.TwsEvent
  type TwsTotals = graft.streaming.TwsTotals
  val TwsTotals = graft.streaming.TwsTotals

  /** Running per-user totals on the `transformWithState` arbitrary-state
    * API (the successor of [flat]mapGroupsWithState — typed state handles
    * from `getHandle`, explicit TTL, timer registry; requires the RocksDB
    * state store provider). Each micro-batch folds the key's rows into a
    * `ValueState` and EMITS the updated totals (Update semantics): the
    * per-key update stream is monotone in `n_events`, so the final state
    * is recoverable from any at-least-once update sink as the per-key row
    * with max `n_events` — independent of how the input was micro-batched.
    * Money stays in exact integer cents; the caller converts once at the
    * scan. */
  class RunningTotalsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, TwsEvent, TwsTotals] {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[TwsState] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[TwsState]("totals",
        org.apache.spark.sql.Encoders.product[TwsState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[TwsEvent],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[TwsTotals] = {
      var n = 0L
      var cents = 0L
      rows.foreach { e => n += 1; cents += e.cents }
      val prev = if (st.exists()) st.get() else TwsState(0L, 0L)
      val next = TwsState(prev.n + n, prev.cents + cents)
      st.update(next)
      Iterator.single(TwsTotals(key, next.n, next.cents))
    }
  }

  /** Wire [[RunningTotalsProcessor]] over an event frame. Update output
    * mode — each batch emits the keys it touched with their new totals. */
  def runningTotals(events: Dataset[TwsEvent]): Dataset[TwsTotals] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new RunningTotalsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }
}

/** Top-level (no '$' in the binary name) so Spark's codegen'd encoders
  * compile — see the alias note inside [[StreamingOps]]. */
case class TwsEvent(user_id: Long, cents: Long)
case class TwsTotals(user_id: Long, n_events: Long, total_cents: Long)
private[streaming] case class TwsState(n: Long, cents: Long)
