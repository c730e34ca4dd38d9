package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TICK-script-style stream transforms over SELECT-shaped output
  * (time_ms, name, value, labelname, labelvalue, message) — the operator
  * family the reference's docker stack delegates to Kapacitor
  * (`difference('counter')` task, /root/reference/docker/config/diffs.tick:1-13;
  * SURVEY §2.5 window-function note).
  *
  * Implemented as plain Spark `Window` functions partitioned by series
  * identity: one shuffle on the series key, then a codegen'd window scan.
  * At 100 TB: series cardinality bounds the partition count, per-series
  * streams are time-sorted within partitions (no global sort), and skewed
  * series fall back to AQE-split partitions.
  */
object Tick {

  private val SeriesKeys = Seq("name", "labelname", "labelvalue", "message")
  private def w = Window.partitionBy(SeriesKeys.map(col): _*).orderBy("time_ms")

  /** Per-series first difference: value - lag(value). Rows without a
    * predecessor are dropped (Kapacitor difference semantics). */
  def difference(sel: DataFrame): DataFrame =
    sel.withColumn("value", col("value") - lag("value", 1).over(w))
      .filter(col("value").isNotNull)

  /** Per-series rate of change per `unitMs` (default: per second):
    * difference / (Δt / unit). */
  def derivative(sel: DataFrame, unitMs: Long = 1000L): DataFrame =
    sel
      .withColumn("__dv", col("value") - lag("value", 1).over(w))
      .withColumn("__dt", (col("time_ms") - lag("time_ms", 1).over(w)) / unitMs.toDouble)
      .filter(col("__dv").isNotNull && col("__dt") > 0)
      .withColumn("value", col("__dv") / col("__dt"))
      .drop("__dv", "__dt")

  /** Per-series trailing moving average over n rows (frame, not range —
    * gaps don't widen the window, matching Kapacitor movingAverage). */
  def movingAverage(sel: DataFrame, n: Int): DataFrame =
    sel.withColumn("value",
      avg("value").over(w.rowsBetween(-(n - 1), 0)))

  /** Per-series running total in time order (ordered window accumulation
    * — the same sequential order in any engine, so doubles stay
    * deterministic). */
  def cumulativeSum(sel: DataFrame): DataFrame =
    sel.withColumn("value",
      sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)))
}
