package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Stream-stream interval join — correlating two live event streams per
  * key within a time bound (the reference has no streaming joins at all;
  * its docker stack delegates stream processing to Kapacitor, SURVEY
  * §2.9). The canonical product shape: attribute each `right` event to a
  * `left` event of the same key that happened within the preceding
  * interval (click → purchase, request → error, …).
  *
  * Structured-Streaming semantics, chosen deliberately:
  *  - BOTH sides are watermarked and the join condition bounds the event
  *    times relative to each other, so Spark derives a state-eviction
  *    bound: buffered rows are dropped once the other side's watermark
  *    passes the interval — state is O(rate × interval), independent of
  *    stream length (the property that survives an unbounded feed);
  *  - inner join + append mode: a pair emits exactly once, when both
  *    sides have arrived and the pair can no longer change.
  *
  * At 100 TB/day the join is hash-partitioned on the key across
  * executors, and the interval bound is what keeps every executor's
  * state store finite.
  */
object StreamingJoin {

  /** Pairs of (cause, effect) per series key: effect.ts within
    * (cause.ts, cause.ts + withinMs]. Output (series, cause_ts, effect_ts,
    * cause_value, effect_value), append-mode streamable.
    *
    * @param lateness allowed out-of-order arrival on both sides
    */
  def causeEffect(cause: Dataset[Point], effect: Dataset[Point],
                  withinMs: Long, lateness: String): DataFrame = {
    val l = cause
      .withColumn("cause_time", timestamp_millis(col("ts")))
      .withWatermark("cause_time", lateness)
      .select(col("series"), col("cause_time"), col("value").as("cause_value"))
    val r = effect
      .withColumn("effect_time", timestamp_millis(col("ts")))
      .withWatermark("effect_time", lateness)
      .select(col("series").as("r_series"), col("effect_time"),
        col("value").as("effect_value"))
    l.join(r,
        col("series") === col("r_series") &&
          col("effect_time") > col("cause_time") &&
          col("effect_time") <= col("cause_time") + expr(s"INTERVAL $withinMs MILLISECONDS"))
      .select(col("series"),
        unix_millis(col("cause_time")).as("cause_ts"),
        unix_millis(col("effect_time")).as("effect_ts"),
        col("cause_value"), col("effect_value"))
  }

  /** Stream-static enrichment: live points decorated with a static
    * dimension (series metadata, device registry, …) keyed by `series`.
    * The static side is broadcast to every executor — NO state store, no
    * watermark requirement, each micro-batch is a map-side hash join
    * (the dimension re-resolves per batch, so a replaced dimension
    * table is picked up without restarting the query). Unmatched points
    * pass through with null attributes (left join): an enrichment must
    * never drop telemetry because the registry lags the fleet.
    * Output (series, ts, value, <dim columns>), append-mode streamable. */
  def enrich(points: Dataset[Point], dim: DataFrame): DataFrame = {
    val d = broadcast(dim.withColumnRenamed("series", "d_series"))
    points.toDF()
      .join(d, col("series") === col("d_series"), "left")
      .drop("d_series")
  }
}
