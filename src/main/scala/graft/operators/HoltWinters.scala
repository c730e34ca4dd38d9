package graft.operators

import org.apache.spark.sql.DataFrame

/** InfluxQL `holt_winters(agg(field), N)` — Holt LINEAR double-exponential
  * smoothing over the bucketed per-series stream, emitting N forecast
  * points past the last bucket.
  *
  * Divergences from InfluxDB, both deliberate and documented:
  *  - InfluxDB fits the smoothing coefficients per query with Nelder-Mead
  *    (unreproducible across runs/engines); we fix α=0.5, β=0.25 — both
  *    binary-exact doubles, so the sequential recurrence is bit-identical
  *    in any IEEE engine and the DuckDB oracle can replay it.
  *  - no seasonal term (the InfluxQL S argument; S=0 semantics).
  *
  * Shape: groupByKey on the series identity + a per-group sequential fold
  * (the recurrence is inherently ordered — this is the rare operator
  * where a typed mapGroups IS the right Spark form; state is two doubles
  * per series, groups are bounded by the query's bucket count).
  */
object HoltWinters {

  val Alpha = 0.5
  val OneMinusAlpha = 0.5
  val Beta = 0.25
  val OneMinusBeta = 0.75

  /** Forecast n points per series from SELECT-shaped rows
    * (time_ms, name, value, labelname, labelvalue, message); series with
    * fewer than 2 points yield nothing. */
  def forecast(sel: DataFrame, n: Int, bucketMs: Long): DataFrame = {
    val spark = sel.sparkSession
    import spark.implicits._
    sel.select("time_ms", "name", "value", "labelname", "labelvalue", "message")
      // fill(null/previous/linear) compositions inject null gap rows; the
      // typed decode below is primitive-Double and must never see them
      // (InfluxDB moving averages skip missing points)
      .filter(org.apache.spark.sql.functions.col("value").isNotNull)
      .as[(Long, String, Double, String, String, String)]
      .groupByKey(r => (r._2, r._4, r._5, r._6))
      .flatMapGroups { (key: (String, String, String, String),
                        it: Iterator[(Long, String, Double, String, String, String)]) =>
        val (name, ln, lv, msg) = key
        val pts = it.toVector.sortBy(r => (r._1, r._3))
        if (pts.length < 2) Iterator.empty
        else {
          // init: level = x1, trend = x2 - x1; recurrence over x2..xn
          var l = pts(0)._3
          var b = pts(1)._3 - pts(0)._3
          pts.drop(1).foreach { p =>
            val v = p._3
            val lNew = Alpha * v + OneMinusAlpha * (l + b)
            val bNew = Beta * (lNew - l) + OneMinusBeta * b
            l = lNew
            b = bNew
          }
          val lastT = pts.last._1
          (1 to n).iterator.map { h =>
            (lastT + h * bucketMs, name, l + h * b, ln, lv, msg)
          }
        }
      }
      .toDF("time_ms", "name", "value", "labelname", "labelvalue", "message")
  }

  /** InfluxQL `holt_winters_with_fit(agg(field), N)`: the fitted curve at
    * every input bucket, then the N forecasts. Fit definition (fixed so
    * both engines replay it bit-for-bit): point 1 emits the init level
    * x1; point i ≥ 2 emits the model's ONE-STEP-AHEAD prediction
    * l + b computed from points 1..i-1, i.e. the value the recurrence
    * blends with x_i. Same recurrence, same single pass, state still two
    * doubles per series. */
  def forecastWithFit(sel: DataFrame, n: Int, bucketMs: Long): DataFrame = {
    val spark = sel.sparkSession
    import spark.implicits._
    sel.select("time_ms", "name", "value", "labelname", "labelvalue", "message")
      // fill(null/previous/linear) compositions inject null gap rows; the
      // typed decode below is primitive-Double and must never see them
      // (InfluxDB moving averages skip missing points)
      .filter(org.apache.spark.sql.functions.col("value").isNotNull)
      .as[(Long, String, Double, String, String, String)]
      .groupByKey(r => (r._2, r._4, r._5, r._6))
      .flatMapGroups { (key: (String, String, String, String),
                        it: Iterator[(Long, String, Double, String, String, String)]) =>
        val (name, ln, lv, msg) = key
        val pts = it.toVector.sortBy(r => (r._1, r._3))
        if (pts.length < 2) Iterator.empty
        else {
          var l = pts(0)._3
          var b = pts(1)._3 - pts(0)._3
          val fits = Vector.newBuilder[(Long, String, Double, String, String, String)]
          fits += ((pts(0)._1, name, l, ln, lv, msg))
          pts.drop(1).foreach { p =>
            fits += ((p._1, name, l + b, ln, lv, msg))
            val lNew = Alpha * p._3 + OneMinusAlpha * (l + b)
            val bNew = Beta * (lNew - l) + OneMinusBeta * b
            l = lNew
            b = bNew
          }
          val lastT = pts.last._1
          fits.result().iterator ++ (1 to n).iterator.map { h =>
            (lastT + h * bucketMs, name, l + h * b, ln, lv, msg)
          }
        }
      }
      .toDF("time_ms", "name", "value", "labelname", "labelvalue", "message")
  }
}
