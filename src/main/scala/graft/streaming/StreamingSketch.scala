package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One distinct-count estimate for a closed tumbling window. */
final case class WindowDistinct(windowStart: Long, estDistinct: Long)

/** One heavy-hitter report for a closed tumbling window: `estCount` ≥
  * true count ≥ `estCount - maxErr` (SpaceSaving one-sided bound). */
final case class WindowHeavyHitter(windowStart: Long, series: String,
                                   estCount: Long, maxErr: Long)

/** One quantile report for a closed tumbling window: each quantile is a
  * bin UPPER edge — est ≥ true, error bounded by one bin width. */
final case class WindowQuantiles(windowStart: Long, n: Long,
                                 p50: Double, p90: Double, p99: Double)

/** Streaming windowed HyperLogLog: approximate distinct `series` per
  * tumbling event-time window, emitted ONCE when the window closes —
  * the streaming face of `pipeline.Sketches.hllDistinctUsers`.
  *
  * State per open window is the 256-byte register array (the HLL sketch
  * itself), updated by register-max as batches arrive — max IS the HLL
  * merge operator, so out-of-order arrivals within the lateness horizon
  * fold in losslessly. `flatMapGroupsWithState` with an event-time
  * timeout closes the window watermark-style: the timeout fires once the
  * event-time watermark passes the window end, the estimate emits, and
  * the state is dropped. At 100 TB/day: state is
  * O(open windows × 256 bytes) regardless of stream rate or key
  * cardinality — the property that makes sketched distinct viable where
  * exact per-window sets are not.
  *
  * Same estimator arithmetic as the batch sketch (integer rho via
  * leading zeros, harmonic fold, linear-counting small-range
  * correction), so a window seeing few distinct elements reports the
  * EXACT count (linear counting is exact while registers are sparse).
  */
object StreamingSketch {

  val P = 8
  val M: Int = 1 << P // 256 registers
  private val WBits = 60 - P
  private val WMask = (1L << WBits) - 1L
  private val AlphaM2: Double = 0.7213 / (1 + 1.079 / M) * M * M

  private[streaming] def hash60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(s.getBytes("UTF-8"))
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h >>> 4
  }

  private def estimate(regs: Array[Byte]): Long = {
    var psum = 0.0
    var zeros = 0
    var j = 0
    while (j < M) {
      psum += 1.0 / (1L << regs(j)).toDouble
      if (regs(j) == 0) zeros += 1
      j += 1
    }
    val raw = AlphaM2 / psum
    val corrected =
      if (raw <= 2.5 * M && zeros > 0) M.toDouble * math.log(M.toDouble / zeros)
      else raw
    math.floor(corrected).toLong
  }

  /** Distinct `series` per `windowMs` tumbling window over event time,
    * closing `latenessMs` after the max seen event time passes the
    * window end. */
  def windowedDistinct(points: Dataset[Point], windowMs: Long,
                       latenessMs: Long): Dataset[WindowDistinct] = {
    val spark = points.sparkSession
    import spark.implicits._
    points
      .withColumnRenamed("ts", "tsMs")
      .selectExpr("series", "tsMs", "timestamp_millis(tsMs) AS eventTime")
      .withWatermark("eventTime", s"$latenessMs milliseconds")
      .as[(String, Long, java.sql.Timestamp)]
      .groupByKey { case (_, ts, _) => ts - Math.floorMod(ts, windowMs) }
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (windowStart: Long, it: Iterator[(String, Long, java.sql.Timestamp)],
         state: GroupState[Array[Byte]]) =>
          if (state.hasTimedOut) {
            val est = estimate(state.get)
            state.remove()
            Iterator.single(WindowDistinct(windowStart, est))
          } else {
            val regs = if (state.exists) state.get else new Array[Byte](M)
            it.foreach { case (series, _, _) =>
              val h = hash60(series)
              val reg = (h >>> WBits).toInt
              val w = h & WMask
              val rho =
                (if (w == 0) WBits + 1
                 else WBits + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))).toByte
              if (rho > regs(reg)) regs(reg) = rho
            }
            state.update(regs)
            // close once the event-time watermark passes the window end
            state.setTimeoutTimestamp(windowStart + windowMs)
            Iterator.empty
          }
      }
  }

  /** Histogram bins for [[windowedQuantiles]] — the per-window state is
    * exactly this many longs. */
  val QBins = 64

  /** Streaming windowed quantile sketch: per tumbling event-time window,
    * a fixed-bin histogram over the value domain `[lo, hi)` (clamped),
    * closed watermark-style like [[windowedDistinct]] — the streaming
    * face of `pipeline.Sketches.histQuantiles`. Bin counts are a
    * MERGEABLE sketch: addition folds out-of-order batches losslessly,
    * so the reported quantiles depend only on the window's value
    * multiset, never on arrival order. On close, emit
    * (n, p50, p90, p99) where each quantile is the UPPER EDGE of the
    * bin containing rank ceil(q·n) — deterministic, one-sided (est ≥
    * true), max error one bin width. State is
    * O(open windows × [[QBins]] longs) at any stream rate. */
  def windowedQuantiles(points: Dataset[Point], windowMs: Long,
                        latenessMs: Long, lo: Double, hi: Double): Dataset[WindowQuantiles] = {
    val spark = points.sparkSession
    import spark.implicits._
    // primitives only in the closure (a local def would lift onto this
    // module and drag the non-serializable object into the task)
    val width = (hi - lo) / QBins
    val bins = QBins
    val lo0 = lo
    points
      .withColumnRenamed("ts", "tsMs")
      .selectExpr("series", "tsMs", "value", "timestamp_millis(tsMs) AS eventTime")
      .withWatermark("eventTime", s"$latenessMs milliseconds")
      .as[(String, Long, Double, java.sql.Timestamp)]
      .groupByKey { case (_, ts, _, _) => ts - Math.floorMod(ts, windowMs) }
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (windowStart: Long, it: Iterator[(String, Long, Double, java.sql.Timestamp)],
         state: GroupState[Array[Long]]) =>
          if (state.hasTimedOut) {
            val counts = state.get
            val n = counts.sum
            def quantile(q: Double): Double = {
              val rank = math.max(math.ceil(q * n).toLong, 1L)
              var cum = 0L
              var b = 0
              var out = lo0 + bins * width
              var found = false
              while (b < bins && !found) {
                cum += counts(b)
                if (cum >= rank) { out = lo0 + (b + 1) * width; found = true }
                b += 1
              }
              out
            }
            state.remove()
            Iterator.single(WindowQuantiles(windowStart, n,
              quantile(0.5), quantile(0.9), quantile(0.99)))
          } else {
            val counts = if (state.exists) state.get else new Array[Long](bins)
            it.foreach { case (_, _, v, _) =>
              val b0 = math.floor((v - lo0) / width).toInt
              val b = if (b0 < 0) 0 else if (b0 >= bins) bins - 1 else b0
              counts(b) += 1
            }
            state.update(counts)
            state.setTimeoutTimestamp(windowStart + windowMs)
            Iterator.empty
          }
      }
  }

  /** SpaceSaving summary capacity — the hard bound on per-window state. */
  val HHCapacity = 64

  /** Streaming windowed heavy hitters via SpaceSaving (Metwally et al.):
    * per tumbling event-time window, track at most [[HHCapacity]]
    * (series, count, overestimate) counters; an unseen series evicts the
    * current minimum and inherits its count as its error bound. On
    * window close (event-time timeout, same watermark discipline as
    * [[windowedDistinct]]) emit every series whose estimated count ≥
    * `minCount`, with its error bound.
    *
    * The SpaceSaving guarantees hold per window regardless of stream
    * rate: est ≥ true ≥ est − err, and any series with true count >
    * n/capacity is guaranteed present in the summary. State is
    * O(open windows × capacity) — the bounded-memory form of "GROUP BY
    * series ORDER BY count DESC" that an exact computation can't give a
    * stream. Emission order is count-desc/series-asc so replays are
    * byte-identical. */
  def windowedHeavyHitters(points: Dataset[Point], windowMs: Long,
                           latenessMs: Long, minCount: Long): Dataset[WindowHeavyHitter] = {
    val spark = points.sparkSession
    import spark.implicits._
    points
      .withColumnRenamed("ts", "tsMs")
      .selectExpr("series", "tsMs", "timestamp_millis(tsMs) AS eventTime")
      .withWatermark("eventTime", s"$latenessMs milliseconds")
      .as[(String, Long, java.sql.Timestamp)]
      .groupByKey { case (_, ts, _) => ts - Math.floorMod(ts, windowMs) }
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (windowStart: Long, it: Iterator[(String, Long, java.sql.Timestamp)],
         state: GroupState[Seq[(String, Long, Long)]]) =>
          if (state.hasTimedOut) {
            val out = state.get
              .filter { case (_, c, _) => c >= minCount }
              .sortBy { case (s, c, _) => (-c, s) }
              .map { case (s, c, e) => WindowHeavyHitter(windowStart, s, c, e) }
            state.remove()
            out.iterator
          } else {
            val m = scala.collection.mutable.LinkedHashMap.empty[String, (Long, Long)]
            if (state.exists) state.get.foreach { case (s, c, e) => m.put(s, (c, e)) }
            it.foreach { case (series, _, _) =>
              m.get(series) match {
                case Some((c, e)) => m.put(series, (c + 1, e))
                case None if m.size < HHCapacity => m.put(series, (1L, 0L))
                case None =>
                  // evict the min-count counter (ties: lexicographically
                  // smallest series, so replay order can't change the pick)
                  val (vs, (vc, _)) = m.minBy { case (s, (c, _)) => (c, s) }
                  m.remove(vs)
                  m.put(series, (vc + 1, vc))
              }
            }
            state.update(m.toSeq.map { case (s, (c, e)) => (s, c, e) })
            state.setTimeoutTimestamp(windowStart + windowMs)
            Iterator.empty
          }
      }
  }
}
