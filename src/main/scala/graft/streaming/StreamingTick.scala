package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One time-series point in a stream. */
final case class Point(series: String, ts: Long, value: Double)
/** A differenced point (value - previous value of the same series). */
final case class DiffPoint(series: String, ts: Long, diff: Double)

/** Streaming TICK `difference`: the stateful-stream counterpart of
  * `operators.Tick.difference`, matching what Kapacitor computes over the
  * reference's subscription feed (difference('counter') grouped by tag,
  * /root/reference/docker/config/diffs.tick:1-13).
  *
  * `flatMapGroupsWithState` keeps exactly ONE double per series as state
  * (the last seen value), carried across micro-batches — state size is
  * bounded by series cardinality, not stream length, which is what
  * survives an unbounded 100 TB/day stream. Points inside a micro-batch
  * are ordered by timestamp before differencing; cross-batch reordering
  * follows the source's delivery order (the same realtime semantics as
  * Kapacitor — a late point diffs against the latest seen value, not a
  * reconstructed history).
  */
object StreamingTick {

  def difference(points: Dataset[Point]): Dataset[DiffPoint] = {
    val spark = points.sparkSession
    import spark.implicits._
    points
      .groupByKey(_.series)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(diffGroup)
  }

  private def diffGroup(series: String, it: Iterator[Point],
                        state: GroupState[Double]): Iterator[DiffPoint] = {
    val sorted = it.toSeq.sortBy(p => (p.ts, p.value))
    var prev: Option[Double] = if (state.exists) Some(state.get) else None
    val out = sorted.flatMap { p =>
      val d = prev.map(last => DiffPoint(series, p.ts, p.value - last))
      prev = Some(p.value)
      d
    }
    prev.foreach(state.update)
    out.iterator
  }
}
