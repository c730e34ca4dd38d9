package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A threshold-crossing event: level ∈ crit | ok, emitted only on the
  * TRANSITION (Kapacitor's alert-node semantics: one event per state
  * change, not one per offending point). */
final case class AlertEvent(series: String, ts: Long, value: Double, level: String)

/** Kapacitor-style streaming threshold alerting over the point stream —
  * the alert node of the TICK script family the reference's docker stack
  * delegates to Kapacitor (SURVEY §2.9; diffs.tick shows the stream →
  * groupBy → node pipeline shape).
  *
  * `flatMapGroupsWithState` keeps exactly ONE boolean per series (are we
  * currently above the threshold?), carried across micro-batches: state
  * is bounded by series cardinality, never stream length. Points within
  * a micro-batch are ordered by timestamp before evaluation, so a batch
  * that dips below and re-crosses emits both transitions in order —
  * deduplicated alerting that an unbounded 100 TB/day feed can't bloat.
  */
object StreamingAlert {

  /** Emit (series, ts, value, "crit") when a series first goes above
    * `threshold` and (…, "ok") when it first returns to ≤ threshold;
    * points that stay on one side emit nothing. */
  def threshold(points: Dataset[Point], threshold: Double): Dataset[AlertEvent] = {
    val spark = points.sparkSession
    import spark.implicits._
    points
      .groupByKey(_.series)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        alertGroup(threshold))
  }

  private def alertGroup(threshold: Double)(
      series: String, it: Iterator[Point],
      state: GroupState[Boolean]): Iterator[AlertEvent] = {
    val sorted = it.toSeq.sortBy(p => (p.ts, p.value))
    var above = state.exists && state.get
    val out = sorted.flatMap { p =>
      val nowAbove = p.value > threshold
      val ev =
        if (nowAbove && !above) Some(AlertEvent(series, p.ts, p.value, "crit"))
        else if (!nowAbove && above) Some(AlertEvent(series, p.ts, p.value, "ok"))
        else None
      above = nowAbove
      ev
    }
    state.update(above)
    out.iterator
  }
}
