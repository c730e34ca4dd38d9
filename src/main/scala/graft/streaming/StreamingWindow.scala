package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Watermarked tumbling-window aggregation over the point stream — the
  * streaming counterpart of the query path's honored `GROUP BY time(X)`
  * (the reference has NO streaming windows at all, SURVEY §2.9 T6; its
  * docker stack delegates this to Kapacitor).
  *
  * Structured-Streaming semantics, chosen deliberately:
  *  - event-time windows (the point's own timestamp, like the ingest
  *    path's T2/T3 rules), not arrival time;
  *  - `withWatermark` bounds state: a window's state is dropped once the
  *    watermark passes its end, so state size is
  *    O(series × open windows), independent of stream length — the
  *    property that survives an unbounded ingest feed;
  *  - append output mode: each window emits exactly once, when it can no
  *    longer change — the right contract for a downstream sink.
  * Late points within the allowed lateness still land in their window;
  * points older than the watermark are dropped (vs the batch ingest path,
  * which accepts them unconditionally — T3's divergence, documented).
  */
object StreamingWindow {

  /** Per-series tumbling mean + count over `windowDur` windows, tolerating
    * `lateness` of out-of-order arrival.
    * Output (series, window_start_ms, mean, n), append-mode streamable. */
  def windowedMean(points: Dataset[Point], windowDur: String, lateness: String): DataFrame =
    points
      .withColumn("event_time", timestamp_millis(col("ts")))
      .withWatermark("event_time", lateness)
      .groupBy(col("series"), window(col("event_time"), windowDur))
      .agg(avg("value").as("mean"), count(lit(1)).as("n"))
      .select(col("series"),
        unix_millis(col("window.start")).as("window_start_ms"),
        col("mean"), col("n"))

  /** Streaming sessionization: the live counterpart of
    * `operators.Sessionize` — Spark's `session_window` merges points of
    * one series into sessions separated by at least `gap` of inactivity.
    * A session's state closes (and the row emits, append-mode-once) when
    * the watermark passes session end + gap; state is
    * O(series × open sessions), the bound an unbounded feed needs.
    * Output (series, session_start_ms, session_end_ms, n, mean). */
  def sessionized(points: Dataset[Point], gap: String, lateness: String): DataFrame =
    points
      .withColumn("event_time", timestamp_millis(col("ts")))
      .withWatermark("event_time", lateness)
      .groupBy(col("series"), session_window(col("event_time"), gap))
      .agg(count(lit(1)).as("n"), avg("value").as("mean"))
      .select(col("series"),
        unix_millis(col("session_window.start")).as("session_start_ms"),
        unix_millis(col("session_window.end")).as("session_end_ms"),
        col("n"), col("mean"))
}
