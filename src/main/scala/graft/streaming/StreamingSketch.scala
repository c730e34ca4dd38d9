package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One distinct-count estimate for a closed tumbling window. */
final case class WindowDistinct(windowStart: Long, estDistinct: Long)

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
}
