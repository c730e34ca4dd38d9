package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inactivity-gap sessionization: number each key's events into sessions
  * that break after `gapMs` of silence — the batch counterpart of a
  * streaming session window (which Spark covers via
  * `session_window`/`flatMapGroupsWithState`; this form works on stored
  * history and is exactly mirrorable in SQL).
  *
  * Shape: one shuffle on the key, one sorted window pass computing
  * (lag, boundary flag, running sum). All integer arithmetic — the
  * assignment is deterministic even under timestamp ties (a tied row
  * contributes a zero boundary flag regardless of its order among ties).
  * At 100 TB: per-key streams sort within partitions; skewed keys split
  * via AQE; no state beyond the window frame.
  */
object Sessionize {

  /** Add a `session_idx` column (1-based per key) to `df`. */
  def assign(df: DataFrame, keys: Seq[String], tsCol: String, gapMs: Long): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(tsCol)
    val prev = lag(col(tsCol), 1).over(w)
    val boundary = when(prev.isNull || col(tsCol) - prev > gapMs, 1).otherwise(0)
    df.withColumn("session_idx",
      sum(boundary).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"))
  }

  /** Per-session rollup: (keys..., session_idx, n_events, start_ms, end_ms). */
  def sessions(df: DataFrame, keys: Seq[String], tsCol: String, gapMs: Long): DataFrame =
    assign(df, keys, tsCol, gapMs)
      .groupBy((keys :+ "session_idx").map(col): _*)
      .agg(count(lit(1)).as("n_events"),
        min(tsCol).cast("long").as("start_ms"),
        max(tsCol).cast("long").as("end_ms"))
      .orderBy((keys :+ "session_idx").map(col): _*)
}
