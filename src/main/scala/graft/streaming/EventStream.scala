package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-streaming twins of the batch window/session operators.
  *
  * The reference is batch-incremental (re-run discovers only new PDFs
  * via the max-ts watermark — `src/scrape/normanpd.py:24-46`); the
  * streaming form makes that continuous: event-time watermark +
  * tumbling windows for the hourly rollup, and a stateful session
  * operator for gap-based sessionization.
  */
object EventStream {

  /** Watermarked tumbling-window rollup (streaming q11_hourly_rollup).
    * Works on any DataFrame with (ts: timestamp, event_type: string,
    * value: double) — batch or streaming.
    */
  def hourlyRollup(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(avg("value"), 4).as("avg_value"))

  /** Streaming form of the reference's idempotent keyed insert
    * (`INSERT .. ON CONFLICT DO NOTHING`, reference
    * `src/db/incidents.py:41-46`): keep the first row per key, with
    * state bounded by the event-time watermark. Works on batch
    * DataFrames too (where it degenerates to dropDuplicates).
    */
  def dedupKeyed(events: DataFrame, keys: Seq[String], tsCol: String,
                 watermark: String = "1 hour"): DataFrame = {
    val wm = events.withWatermark(tsCol, watermark)
    if (events.isStreaming) wm.dropDuplicatesWithinWatermark(keys)
    else wm.dropDuplicates(keys)
  }

  case class Event(user_id: Long, event_id: Long, ts: Timestamp)
  case class SessionState(start: Long, end: Long, n: Long)
  case class SessionOut(user_id: Long, start_ms: Long, end_ms: Long, n_events: Long)

  /** Watermarked stream-stream interval join (streaming q16_asof):
    * each purchase matches the views of the SAME user in the
    * `maxGap` of event time before it. Both sides carry watermarks
    * and the join condition is a bounded event-time interval, which
    * is exactly what lets Spark expire join state: a buffered view
    * can be dropped once the watermark passes its ts + maxGap, so
    * state is O(rate · (maxGap + lateness)), never O(stream).
    * Works on batch frames too (plain interval join, same rows).
    */
  def viewPurchaseJoin(views: Dataset[Event], purchases: Dataset[Event],
                       maxGap: String = "1 hour",
                       watermarkDelay: String = "10 minutes"): DataFrame = {
    val streaming = views.isStreaming
    val v0 = views.toDF("v_user", "view_id", "v_ts")
    val p0 = purchases.toDF("p_user", "purchase_id", "p_ts")
    val v = if (streaming) v0.withWatermark("v_ts", watermarkDelay) else v0
    val p = if (streaming) p0.withWatermark("p_ts", watermarkDelay) else p0
    v.join(p,
        col("v_user") === col("p_user") &&
          col("v_ts") <= col("p_ts") &&
          col("v_ts") >= col("p_ts") - expr(s"INTERVAL $maxGap"))
      .select(col("p_user").as("user_id"), col("purchase_id"), col("view_id"),
        (unix_millis(col("p_ts")) - unix_millis(col("v_ts"))).as("gap_ms"))
  }

  /** Gap-based sessionization with explicit state (streaming
    * q12_sessionize): a session closes `gapMs` of EVENT TIME after its
    * last event — the timeout is the watermark passing session end +
    * gap, so emission is deterministic w.r.t. the data, not the
    * wall clock, and replays produce identical sessions. State is
    * bounded by the watermark (`watermarkDelay` of allowed lateness).
    */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L,
                 watermarkDelay: String = "10 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val streaming = events.isStreaming
    val src = if (streaming) events.withWatermark("ts", watermarkDelay) else events
    src.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(user, s.start, s.end, s.n))
          } else {
            val sorted = rows.map(_.ts.getTime).toSeq.sorted
            var out = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { t =>
              cur match {
                case Some(s) if t - s.end <= gapMs =>
                  // max/min guards: a late (out-of-order) event must not
                  // rewind the session span
                  cur = Some(s.copy(start = math.min(s.start, t),
                    end = math.max(s.end, t), n = s.n + 1))
                case Some(s) =>
                  out ::= SessionOut(user, s.start, s.end, s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach(state.update)
            // fire when the watermark passes end + gap; clamp to just
            // past the current watermark for groups fed only by late
            // events (a timeout in the past is rejected by Spark)
            if (streaming) cur.foreach { s =>
              state.setTimeoutTimestamp(
                math.max(s.end + gapMs, state.getCurrentWatermarkMs() + 1))
            }
            out.reverseIterator
          }
      }
  }
}
