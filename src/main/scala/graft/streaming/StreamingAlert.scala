package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A threshold-crossing event: level ∈ crit | ok, emitted only on the
  * TRANSITION (Kapacitor's alert-node semantics: one event per state
  * change, not one per offending point). */
final case class AlertEvent(series: String, ts: Long, value: Double, level: String)

/** A no-data event: `series` last reported at `lastTs` and stayed silent
  * past `deadlineTs` = lastTs + timeout (event time, watermark-decided). */
final case class DeadmanEvent(series: String, lastTs: Long, deadlineTs: Long)

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

  /** Deadman switch (Kapacitor's `deadman` node): emit one event when a
    * series that WAS reporting goes silent for more than `timeoutMs` of
    * EVENT time. Silence is decided by the watermark passing
    * lastSeen + timeoutMs — deterministic under replay, unlike a
    * wall-clock timer — and state (one long per series) is removed on
    * firing, so a series that resumes re-arms from scratch. State is
    * bounded by live series cardinality at any stream rate. */
  def deadman(points: Dataset[Point], timeoutMs: Long,
              lateness: String = "0 seconds"): Dataset[DeadmanEvent] = {
    val spark = points.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_millis}
    points
      .select(col("series"), col("ts"), col("value"),
        timestamp_millis(col("ts")).as("event_time"))
      .withWatermark("event_time", lateness)
      .as[(String, Long, Double, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        deadmanGroup(timeoutMs))
  }

  /** Running per-series statistics for [[drift]]: Welford count/mean/M2
    * plus the breach flag for transition semantics. */
  final case class DriftState(n: Long, mean: Double, m2: Double, breached: Boolean)

  /** A drift event: `level` ∈ high | low | ok, `z_x100` the z-score at
    * the transition (×100 fixed point), `mean` the pre-update baseline. */
  final case class DriftEvent(series: String, ts: Long, value: Double,
                              mean: Double, z_x100: Long, level: String)

  /** Streaming drift / level-shift detector — the online counterpart of
    * the batch CUSUM entry (`events_cusum`): per series, Welford running
    * mean/variance learned across micro-batches; a point whose |z| vs
    * the learned baseline exceeds `zMax` (after `warmup` observations)
    * emits one high/low transition, and the return to baseline emits
    * one ok — Kapacitor's sigma() alert semantics. The shifted level is
    * always LEARNED (the outlier updates the stats too), so a sustained
    * shift is absorbed into the new baseline and the detector re-arms
    * rather than alerting forever.
    *
    * State is three doubles + a flag per series — bounded by series
    * cardinality at any stream rate; batch-internal points evaluate in
    * (ts, value) order so replays are deterministic. */
  def drift(points: Dataset[Point], zMax: Double = 4.0,
            warmup: Int = 20): Dataset[DriftEvent] = {
    val spark = points.sparkSession
    import spark.implicits._
    points
      .groupByKey(_.series)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        driftGroup(zMax, warmup))
  }

  private def driftGroup(zMax: Double, warmup: Int)(
      series: String, it: Iterator[Point],
      state: GroupState[DriftState]): Iterator[DriftEvent] = {
    val sorted = it.toSeq.sortBy(p => (p.ts, p.value))
    var st = if (state.exists) state.get else DriftState(0L, 0.0, 0.0, breached = false)
    val out = Seq.newBuilder[DriftEvent]
    sorted.foreach { p =>
      val sigma = if (st.n >= 2) math.sqrt(st.m2 / (st.n - 1)) else 0.0
      val z = if (sigma > 0) (p.value - st.mean) / sigma else 0.0
      val nowBreach = st.n >= warmup && math.abs(z) > zMax
      if (nowBreach && !st.breached)
        out += DriftEvent(series, p.ts, p.value, st.mean, (z * 100).toLong,
          if (z > 0) "high" else "low")
      else if (!nowBreach && st.breached)
        out += DriftEvent(series, p.ts, p.value, st.mean, (z * 100).toLong, "ok")
      val n1 = st.n + 1
      val d = p.value - st.mean
      val mean1 = st.mean + d / n1
      st = DriftState(n1, mean1, st.m2 + d * (p.value - mean1), nowBreach)
    }
    state.update(st)
    out.result().iterator
  }

  private def deadmanGroup(timeoutMs: Long)(
      series: String, it: Iterator[(String, Long, Double, java.sql.Timestamp)],
      state: GroupState[Long]): Iterator[DeadmanEvent] = {
    if (state.hasTimedOut) {
      val lastSeen = state.get
      state.remove() // a resuming series re-arms from scratch
      Iterator.single(DeadmanEvent(series, lastSeen, lastSeen + timeoutMs))
    } else {
      val lastSeen = it.map(_._2).foldLeft(if (state.exists) state.get else Long.MinValue)(math.max)
      state.update(lastSeen)
      state.setTimeoutTimestamp(lastSeen + timeoutMs)
      Iterator.empty
    }
  }
}
