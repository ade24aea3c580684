package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming twins of the `stream_*` batch queries
  * (SURVEY.md §5.2(4)): same event-time semantics, expressed with the
  * built-in streaming primitives. Each takes an unbounded `events`-shaped
  * DataFrame (from MemoryStream in tests, or `readStream` on a directory
  * in production) and returns a streaming DataFrame.
  *
  * The watermark plays the role of the reference's inactivity flush +
  * LSN ack: state for windows older than the watermark is finalized and
  * emitted, exactly like pg2ch's periodic buffer flush finalizes a batch
  * (SURVEY §3.4 mapping table).
  */
object StreamTwins {

  /** Tumbling 1h count per event_type ≡ stream_tumbling_window. */
  def tumblingCounts(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_timestamp(col("window.start")).as("h"), col("event_type"), col("cnt"))

  /** 30-minute-gap sessions per user ≡ stream_session_window (built-in
    * session_window: a session closes when no event arrives within the
    * gap — identical to the batch lag()>30min flag arithmetic).
    */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
                    watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("events_in_session"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("events_in_session"))

  /** Watermark-dropped late rows ≡ stream_late_data's `late` column: rows
    * arriving more than `watermark` behind the max seen ts never reach the
    * aggregate, so `sum(cnt)` over this stream counts only on-time rows.
    */
  def onTimeCounts(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("cnt"))
}
