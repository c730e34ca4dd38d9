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

  /** Flux/Kapacitor `increase`: running total of the NON-NEGATIVE deltas
    * per series — the counter-reset-tolerant form of cumulative change (a
    * counter that resets to 0 contributes nothing instead of a huge
    * negative step). First point drops (no predecessor). Two stacked
    * passes over the SAME series window partitioning — lag then running
    * sum, one shuffle. */
  def increase(sel: DataFrame): DataFrame =
    sel
      .withColumn("__d", col("value") - lag("value", 1).over(w))
      .filter(col("__d").isNotNull)
      .withColumn("value",
        sum(greatest(col("__d"), lit(0.0))).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__d")

  /** InfluxQL `exponential_moving_average(agg(field), N)`: EMA with
    * α = 2/(N+1), seeded by the first point (ema₀ = x₀) — one output per
    * input point. The recurrence is inherently sequential, so like
    * [[HoltWinters]] this is the rare typed-mapGroups operator: state is
    * one double per series, groups are bounded by the query's bucket
    * count. α is an IEEE division both engines perform identically and
    * the fold order is the time order in both, so doubles stay
    * bit-identical vs the oracle's recursive CTE. (InfluxDB additionally
    * offers warmup-type variants; seed-by-first matches its default
    * hold period = N semantics only for N=1 — documented divergence.) */
  def exponentialMovingAverage(sel: DataFrame, n: Int): DataFrame = {
    require(n >= 1, "exponential_moving_average needs a positive window")
    val spark = sel.sparkSession
    import spark.implicits._
    val alpha = 2.0 / (n + 1)
    val oneMinus = 1.0 - alpha
    sel.select("time_ms", "name", "value", "labelname", "labelvalue", "message")
      // fill(null/previous/linear) compositions inject null gap rows; the
      // typed decode below is primitive-Double and must never see them
      // (InfluxDB moving averages skip missing points)
      .filter(col("value").isNotNull)
      .as[(Long, String, Double, String, String, String)]
      .groupByKey(r => (r._2, r._4, r._5, r._6))
      .flatMapGroups { (key: (String, String, String, String),
                        it: Iterator[(Long, String, Double, String, String, String)]) =>
        val (name, ln, lv, msg) = key
        val pts = it.toVector.sortBy(r => (r._1, r._3))
        var e = 0.0
        pts.iterator.zipWithIndex.map { case (p, i) =>
          e = if (i == 0) p._3 else alpha * p._3 + oneMinus * e
          (p._1, name, e, ln, lv, msg)
        }
      }
      .toDF("time_ms", "name", "value", "labelname", "labelvalue", "message")
  }

  /** InfluxQL `double_exponential_moving_average(agg(field), N)`:
    * DEMA = 2·EMA − EMA(EMA), both EMAs with α = 2/(N+1) seeded by their
    * first input (same seeding as [[exponentialMovingAverage]]). The two
    * chained recurrences run in ONE typed-mapGroups pass — state is two
    * doubles per series. Both EMA folds and the final 2·e1 − e2 are the
    * identical IEEE op sequence the oracle's stacked recursive CTEs
    * perform, so doubles stay bit-identical. */
  def doubleExponentialMovingAverage(sel: DataFrame, n: Int): DataFrame = {
    require(n >= 1, "double_exponential_moving_average needs a positive window")
    val spark = sel.sparkSession
    import spark.implicits._
    val alpha = 2.0 / (n + 1)
    val oneMinus = 1.0 - alpha
    sel.select("time_ms", "name", "value", "labelname", "labelvalue", "message")
      // fill(null/previous/linear) compositions inject null gap rows; the
      // typed decode below is primitive-Double and must never see them
      // (InfluxDB moving averages skip missing points)
      .filter(col("value").isNotNull)
      .as[(Long, String, Double, String, String, String)]
      .groupByKey(r => (r._2, r._4, r._5, r._6))
      .flatMapGroups { (key: (String, String, String, String),
                        it: Iterator[(Long, String, Double, String, String, String)]) =>
        val (name, ln, lv, msg) = key
        val pts = it.toVector.sortBy(r => (r._1, r._3))
        var e1 = 0.0
        var e2 = 0.0
        pts.iterator.zipWithIndex.map { case (p, i) =>
          e1 = if (i == 0) p._3 else alpha * p._3 + oneMinus * e1
          e2 = if (i == 0) e1 else alpha * e1 + oneMinus * e2
          (p._1, name, 2.0 * e1 - e2, ln, lv, msg)
        }
      }
      .toDF("time_ms", "name", "value", "labelname", "labelvalue", "message")
  }

  /** InfluxQL `relative_strength_index(agg(field), N)`: Wilder RSI.
    * Seed after the first N differences: avgGain/avgLoss = plain means of
    * the first N gains/losses (ascending-order folds); then Wilder
    * smoothing avg_t = (avg_{t-1}·(N−1) + x_t)/N. RSI = 100 when
    * avgLoss = 0, else 100 − 100/(1 + avgGain/avgLoss) — that exact
    * formula, mirrored op-for-op by the oracle's recursive CTE, keeps
    * the doubles bit-identical. Sequential recurrence ⇒ typed mapGroups
    * (the [[exponentialMovingAverage]] discipline): 2 doubles of state
    * per series. */
  def relativeStrengthIndex(sel: DataFrame, n: Int): DataFrame = {
    require(n >= 1, "relative_strength_index needs a positive period")
    val spark = sel.sparkSession
    import spark.implicits._
    sel.select("time_ms", "name", "value", "labelname", "labelvalue", "message")
      // fill(null/previous/linear) compositions inject null gap rows; the
      // typed decode below is primitive-Double and must never see them
      // (InfluxDB moving averages skip missing points)
      .filter(col("value").isNotNull)
      .as[(Long, String, Double, String, String, String)]
      .groupByKey(r => (r._2, r._4, r._5, r._6))
      .flatMapGroups { (key: (String, String, String, String),
                        it: Iterator[(Long, String, Double, String, String, String)]) =>
        val (name, ln, lv, msg) = key
        val pts = it.toVector.sortBy(r => (r._1, r._3))
        val diffs = pts.sliding(2).collect {
          case Vector(a, b) => (b._1, b._3 - a._3)
        }.toVector
        if (diffs.length < n) Iterator.empty
        else {
          var ag = 0.0
          var al = 0.0
          // seed: ascending-order folds over the first n diffs
          diffs.take(n).foreach { case (_, d) =>
            if (d > 0) ag = ag + d else al = al + (-d)
          }
          ag = ag / n
          al = al / n
          def rsi: Double = if (al == 0.0) 100.0 else 100.0 - 100.0 / (1.0 + ag / al)
          val first = (diffs(n - 1)._1, name, rsi, ln, lv, msg)
          val rest = diffs.drop(n).map { case (t, d) =>
            val gain = if (d > 0) d else 0.0
            val loss = if (d < 0) -d else 0.0
            ag = (ag * (n - 1) + gain) / n
            al = (al * (n - 1) + loss) / n
            (t, name, rsi, ln, lv, msg)
          }
          (first +: rest).iterator
        }
      }
      .toDF("time_ms", "name", "value", "labelname", "labelvalue", "message")
  }

  /** InfluxQL `chande_momentum_oscillator(agg(field), N)`:
    * 100 · (ΣUp − ΣDown) / (ΣUp + ΣDown) over the last N first
    * differences per series; emitted only once N differences exist
    * (InfluxDB's warm-up). 0 when all N differences are zero.
    *
    * Declarative — NO recurrence: the N-term up/down sums are explicit
    * lag-k chains folded left-to-right, a fixed IEEE op sequence
    * identical to the oracle's mirrored expression (a windowed SUM would
    * leave summation order to each engine's frame implementation). */
  /** InfluxQL `kaufmans_efficiency_ratio(agg(field), N)`:
    * |net change over N periods| / Σ|period changes| per series — 1 on a
    * straight trend, →0 on pure chop. Net change is the SAME lag-k diff
    * chain summed without abs (identical fold order), so both engines
    * compute the identical IEEE sequence; emitted once N differences
    * exist; 0 when volatility is 0. */
  def kaufmansEfficiency(sel: DataFrame, n: Int): DataFrame = {
    require(n >= 1, "kaufmans_efficiency_ratio needs a positive period")
    val d = sel
      .withColumn("__d", col("value") - lag("value", 1).over(w))
      .filter(col("__d").isNotNull)
    val terms = (0 until n).map { k =>
      val dk = lag(col("__d"), k).over(w)
      (dk, abs(dk), dk.isNotNull)
    }
    val net = terms.map(_._1).reduce(_ + _)
    val vol = terms.map(_._2).reduce(_ + _)
    val full = terms.map(_._3).reduce(_ && _)
    d.withColumn("__net", net).withColumn("__vol", vol).withColumn("__full", full)
      .filter(col("__full"))
      .withColumn("value",
        when(col("__vol") === 0.0, lit(0.0)).otherwise(abs(col("__net")) / col("__vol")))
      .drop("__d", "__net", "__vol", "__full")
  }

  /** InfluxQL `triple_exponential_moving_average(agg(field), N)`:
    * TEMA = 3·EMA − 3·EMA(EMA) + EMA(EMA(EMA)), all three recurrences
    * with α = 2/(N+1) seeded by their first input — the
    * [[doubleExponentialMovingAverage]] discipline extended one level,
    * still ONE typed-mapGroups pass with three doubles of state per
    * series. The combination is evaluated as (3·e1 − 3·e2) + e3, the
    * exact op order the oracle's stacked recursive CTEs mirror. */
  def tripleExponentialMovingAverage(sel: DataFrame, n: Int): DataFrame = {
    require(n >= 1, "triple_exponential_moving_average needs a positive window")
    val spark = sel.sparkSession
    import spark.implicits._
    val alpha = 2.0 / (n + 1)
    val oneMinus = 1.0 - alpha
    sel.select("time_ms", "name", "value", "labelname", "labelvalue", "message")
      // fill(null/previous/linear) compositions inject null gap rows; the
      // typed decode below is primitive-Double and must never see them
      // (InfluxDB moving averages skip missing points)
      .filter(col("value").isNotNull)
      .as[(Long, String, Double, String, String, String)]
      .groupByKey(r => (r._2, r._4, r._5, r._6))
      .flatMapGroups { (key: (String, String, String, String),
                        it: Iterator[(Long, String, Double, String, String, String)]) =>
        val (name, ln, lv, msg) = key
        val pts = it.toVector.sortBy(r => (r._1, r._3))
        var e1 = 0.0
        var e2 = 0.0
        var e3 = 0.0
        pts.iterator.zipWithIndex.map { case (p, i) =>
          e1 = if (i == 0) p._3 else alpha * p._3 + oneMinus * e1
          e2 = if (i == 0) e1 else alpha * e1 + oneMinus * e2
          e3 = if (i == 0) e2 else alpha * e2 + oneMinus * e3
          (p._1, name, 3.0 * e1 - 3.0 * e2 + e3, ln, lv, msg)
        }
      }
      .toDF("time_ms", "name", "value", "labelname", "labelvalue", "message")
  }

  /** InfluxQL `triple_exponential_derivative(agg(field), N)` (TRIX):
    * 100 · (e3ₜ − e3ₜ₋₁) / e3ₜ₋₁ over the triple-smoothed EMA chain —
    * the percent rate of change of E³. First point has no predecessor
    * and rows whose previous e3 is exactly 0 are dropped (division
    * guard; InfluxDB emits nothing useful there either). Same single
    * mapGroups pass as [[tripleExponentialMovingAverage]] plus one
    * double of carry for the previous e3. */
  def tripleExponentialDerivative(sel: DataFrame, n: Int): DataFrame = {
    require(n >= 1, "triple_exponential_derivative needs a positive window")
    val spark = sel.sparkSession
    import spark.implicits._
    val alpha = 2.0 / (n + 1)
    val oneMinus = 1.0 - alpha
    sel.select("time_ms", "name", "value", "labelname", "labelvalue", "message")
      // fill(null/previous/linear) compositions inject null gap rows; the
      // typed decode below is primitive-Double and must never see them
      // (InfluxDB moving averages skip missing points)
      .filter(col("value").isNotNull)
      .as[(Long, String, Double, String, String, String)]
      .groupByKey(r => (r._2, r._4, r._5, r._6))
      .flatMapGroups { (key: (String, String, String, String),
                        it: Iterator[(Long, String, Double, String, String, String)]) =>
        val (name, ln, lv, msg) = key
        val pts = it.toVector.sortBy(r => (r._1, r._3))
        var e1 = 0.0
        var e2 = 0.0
        var e3 = 0.0
        var prev = 0.0
        pts.iterator.zipWithIndex.flatMap { case (p, i) =>
          e1 = if (i == 0) p._3 else alpha * p._3 + oneMinus * e1
          e2 = if (i == 0) e1 else alpha * e1 + oneMinus * e2
          val p3 = prev
          e3 = if (i == 0) e2 else alpha * e2 + oneMinus * e3
          prev = e3
          if (i == 0 || p3 == 0.0) None
          else Some((p._1, name, 100.0 * (e3 - p3) / p3, ln, lv, msg))
        }
      }
      .toDF("time_ms", "name", "value", "labelname", "labelvalue", "message")
  }

  /** InfluxQL `kaufmans_adaptive_moving_average(agg(field), N)` (KAMA):
    * an EMA whose smoothing constant adapts to the efficiency ratio —
    * sc = (ER·(2/3 − 2/31) + 2/31)², kamaₜ = kamaₜ₋₁ + sc·(xₜ − kamaₜ₋₁)
    * with the standard fastest=2 / slowest=30 periods. ER at index t is
    * |xₜ − xₜ₋ₙ| / Σ|xⱼ − xⱼ₋₁| (j ascending over the last N diffs —
    * the [[kaufmansEfficiency]] quantity, folded oldest-first so the
    * oracle's explicit lag-chain reproduces the identical IEEE
    * sequence); ER = 0 when volatility is 0. Warmup: first output at
    * the N-th diff, seeded kama = x there (the [[relativeStrengthIndex]]
    * seed-row discipline; InfluxDB's hold-period variants diverge —
    * documented). Sequential recurrence ⇒ typed mapGroups, one double
    * of state per series. */
  def kaufmansAdaptiveMovingAverage(sel: DataFrame, n: Int): DataFrame = {
    require(n >= 1, "kaufmans_adaptive_moving_average needs a positive period")
    val spark = sel.sparkSession
    import spark.implicits._
    val fast = 2.0 / 3.0   // 2/(2+1)
    val slow = 2.0 / 31.0  // 2/(30+1)
    sel.select("time_ms", "name", "value", "labelname", "labelvalue", "message")
      // fill(null/previous/linear) compositions inject null gap rows; the
      // typed decode below is primitive-Double and must never see them
      // (InfluxDB moving averages skip missing points)
      .filter(col("value").isNotNull)
      .as[(Long, String, Double, String, String, String)]
      .groupByKey(r => (r._2, r._4, r._5, r._6))
      .flatMapGroups { (key: (String, String, String, String),
                        it: Iterator[(Long, String, Double, String, String, String)]) =>
        val (name, ln, lv, msg) = key
        val pts = it.toVector.sortBy(r => (r._1, r._3))
        if (pts.length <= n) Iterator.empty
        else {
          var kama = 0.0
          (n until pts.length).iterator.map { i =>
            val x = pts(i)._3
            if (i == n) kama = x
            else {
              // volatility: ascending-order fold over the last n diffs
              var vol = 0.0
              var j = i - n + 1
              while (j <= i) { vol = vol + math.abs(pts(j)._3 - pts(j - 1)._3); j += 1 }
              val net = math.abs(x - pts(i - n)._3)
              val er = if (vol == 0.0) 0.0 else net / vol
              val scRoot = er * (fast - slow) + slow
              kama = kama + scRoot * scRoot * (x - kama)
            }
            (pts(i)._1, name, kama, ln, lv, msg)
          }
        }
      }
      .toDF("time_ms", "name", "value", "labelname", "labelvalue", "message")
  }

  /** Flux-style `stateCount`: for points satisfying value > threshold,
    * the ordinal position within the current consecutive run per series
    * (1-based); out-of-state points drop. Declarative gaps-and-islands:
    * change flag → running change-count island id (one window pass) →
    * row_number within (series, island). No recurrence, no mapGroups —
    * both windows ride the SAME series partitioning, one shuffle. */
  def stateCount(sel: DataFrame, threshold: Double): DataFrame = {
    val flagged = sel
      .withColumn("__in", col("value") > threshold)
      .withColumn("__chg",
        when(lag("__in", 1).over(w).isNull ||
          col("__in") =!= lag("__in", 1).over(w), 1L).otherwise(0L))
      .withColumn("__grp", sum("__chg").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    val wg = Window.partitionBy((SeriesKeys.map(col) :+ col("__grp")): _*).orderBy("time_ms")
    flagged.filter(col("__in"))
      .withColumn("value", row_number().over(wg).cast("double"))
      .drop("__in", "__chg", "__grp")
  }

  /** Flux-style `stateDuration`: ms since the current in-state run began
    * per series (0 at the run's first point), ÷ `unitMs`. Same island
    * construction as [[stateCount]]; the run start is a min-window over
    * the island, still on the series partitioning. */
  def stateDuration(sel: DataFrame, threshold: Double, unitMs: Long = 1000L): DataFrame = {
    val flagged = sel
      .withColumn("__in", col("value") > threshold)
      .withColumn("__chg",
        when(lag("__in", 1).over(w).isNull ||
          col("__in") =!= lag("__in", 1).over(w), 1L).otherwise(0L))
      .withColumn("__grp", sum("__chg").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    val wg = Window.partitionBy((SeriesKeys.map(col) :+ col("__grp")): _*).orderBy("time_ms")
    flagged.filter(col("__in"))
      .withColumn("value",
        ((col("time_ms") - min("time_ms").over(wg)) / lit(unitMs.toDouble)))
      .drop("__in", "__chg", "__grp")
  }

  def chandeMomentum(sel: DataFrame, n: Int): DataFrame = {
    require(n >= 1, "chande_momentum_oscillator needs a positive period")
    val d = sel
      .withColumn("__d", col("value") - lag("value", 1).over(w))
      .filter(col("__d").isNotNull)
    val wd = w // same series partitioning, time order, over the diff rows
    val terms = (0 until n).map { k =>
      val dk = lag(col("__d"), k).over(wd)
      (when(dk > 0, dk).otherwise(lit(0.0)),
        when(dk < 0, -dk).otherwise(lit(0.0)),
        dk.isNotNull)
    }
    val up = terms.map(_._1).reduce(_ + _)
    val dn = terms.map(_._2).reduce(_ + _)
    val full = terms.map(_._3).reduce(_ && _)
    d.withColumn("__up", up).withColumn("__dn", dn).withColumn("__full", full)
      .filter(col("__full"))
      .withColumn("value",
        when(col("__up") + col("__dn") === 0.0, lit(0.0))
          .otherwise(lit(100.0) * (col("__up") - col("__dn")) / (col("__up") + col("__dn"))))
      .drop("__d", "__up", "__dn", "__full")
  }
}
