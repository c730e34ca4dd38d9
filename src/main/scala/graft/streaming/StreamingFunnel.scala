package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A funnel event (the streaming face of the events store rows). */
final case class FunnelEvent(user_id: Long, event_type: String, ts_ms: Long)

/** A funnel-level transition: `user_id` first reached `level` at `ts_ms`. */
final case class FunnelLevel(user_id: Long, ts_ms: Long, level: Int)

/** Streaming windowed funnel — the online, EXACT counterpart of
  * `EventOps.windowFunnel` (ClickHouse windowFunnel semantics: deepest
  * signup→view→click→purchase chain with every step inside `windowMs`
  * of the chain's FIRST step, any signup an entry point).
  *
  * Exactness needs more than one candidate chain per level: two partial
  * chains can be incomparable — one started later (more window budget
  * left), the other reached the level earlier (can extend through
  * earlier next-step events) — so the state keeps, per level, the
  * PARETO FRONTIER of (chain_start, reach_time) pairs: a pair survives
  * iff no other pair has both a later start and an earlier reach. A
  * step event extends the deepest viable predecessor with the LATEST
  * start (same reach for any choice → that point dominates every other
  * choice), which makes the online result equal to the batch operator's
  * max-over-entry-points level, event for event — pinned by a
  * differential spec that streams the real events table and compares
  * histograms.
  *
  * State bound: frontier size is the number of incomparable chains,
  * ≤ the user's step events inside one window span (typically a
  * handful); entries older than `windowMs` behind the user's max
  * timestamp can never extend and are pruned each batch. Transitions
  * emit once per level per user (monotone `best`), so output is ≤ 4
  * rows per user ever. Within a batch, events evaluate in (ts, type)
  * order; exact under in-order delivery across batches (a cross-batch
  * late event older than the pruning horizon may be missed — the
  * documented at-most-late-by-window contract). */
object StreamingFunnel {

  /** Funnel steps, in order. */
  val Steps: Seq[String] = Seq("signup", "view", "click", "purchase")

  /** Per-user state: level → Pareto pairs (chain_start, reach_ts), plus
    * the highest level already emitted. */
  final case class FunnelState(frontier: Map[Int, Seq[(Long, Long)]], best: Int)

  def funnel(events: Dataset[FunnelEvent], windowMs: Long): Dataset[FunnelLevel] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        funnelGroup(windowMs))
  }

  /** Insert keeping the Pareto frontier: drop the new pair if some pair
    * has start ≥ its start AND reach ≤ its reach; else add it and drop
    * every pair it dominates. */
  private def paretoAdd(fr: Seq[(Long, Long)], p: (Long, Long)): Seq[(Long, Long)] =
    if (fr.exists(q => q._1 >= p._1 && q._2 <= p._2)) fr
    else fr.filterNot(q => p._1 >= q._1 && p._2 <= q._2) :+ p

  private def funnelGroup(windowMs: Long)(
      user: Long, it: Iterator[FunnelEvent],
      state: GroupState[FunnelState]): Iterator[FunnelLevel] = {
    val sorted = it.toSeq.sortBy(e => (e.ts_ms, e.event_type))
    var st = state.getOption.getOrElse(FunnelState(Map.empty, 0))
    var maxTs = Long.MinValue
    val out = Seq.newBuilder[FunnelLevel]
    sorted.foreach { e =>
      maxTs = math.max(maxTs, e.ts_ms)
      val k = Steps.indexOf(e.event_type) + 1
      if (k == 1) {
        st = st.copy(frontier =
          st.frontier.updated(1, paretoAdd(st.frontier.getOrElse(1, Nil), (e.ts_ms, e.ts_ms))))
        if (st.best < 1) { st = st.copy(best = 1); out += FunnelLevel(user, e.ts_ms, 1) }
      } else if (k >= 2) {
        val viable = st.frontier.getOrElse(k - 1, Nil)
          .filter(p => p._2 < e.ts_ms && e.ts_ms - p._1 <= windowMs)
        if (viable.nonEmpty) {
          val t1 = viable.map(_._1).max
          st = st.copy(frontier =
            st.frontier.updated(k, paretoAdd(st.frontier.getOrElse(k, Nil), (t1, e.ts_ms))))
          if (k > st.best) { st = st.copy(best = k); out += FunnelLevel(user, e.ts_ms, k) }
        }
      }
    }
    // prune chains that can never extend (start more than a window behind
    // the newest event seen in this batch)
    if (maxTs != Long.MinValue) {
      val horizon = maxTs - windowMs
      st = st.copy(frontier =
        st.frontier.view.mapValues(_.filter(_._1 >= horizon)).filter(_._2.nonEmpty).toMap)
    }
    state.update(st)
    out.result().iterator
  }
}
