package graft.tools

import graft.query.TsCatalog
import graft.sources.EventsAdapter
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Query-path scale probe beyond the driver testdata (dev tool): the
  * largest generated events table is 100k rows (sf0.1), so the
  * README's measured scaling evidence stops one decade short of
  * interesting. This probe synthesizes events tables of ARBITRARY row
  * count with the sf-testdata shape (same columns, same tag
  * cardinalities ~ 500 users × 5 types, values on the same 0–100
  * scale, one month of timestamps) — NOT for correctness (the DuckDB
  * gate only ever runs on driver testdata) but to time the same
  * parse→plan→execute path at 1×/10×/100× and print per-query
  * ratios. Sub-linear ratios here are the evidence that the planner's
  * shapes (broadcast series side, hash aggregates, per-series windows,
  * TakeOrdered selectors) survive data growth; anything super-linear
  * is a regression to hunt.
  *
  * usage: ScaleProbe [baseRows] [factor]   (default 1M × 10)
  */
object ScaleProbe {

  private def synthEvents(spark: SparkSession, n: Long): DataFrame = {
    val types = array(lit("click"), lit("view"), lit("purchase"),
      lit("signup"), lit("error"))
    spark.range(n).select(
        (col("id") % 500).as("user_id"),
        element_at(types, (col("id") % 5 + 1).cast("int")).as("event_type"),
        // deterministic pseudo-values on the testdata's 0-100 scale
        ((col("id") * 2654435761L % 10000L) / lit(100.0)).as("value"),
        (lit(1704067200000L) + pmod(col("id") * 37L, lit(31L * 86400000L)))
          .as("ts_ms"))
      .withColumn("ts_ns", col("ts_ms") * 1000000L)
  }

  private def catalogFor(spark: SparkSession, n: Long): TsCatalog = {
    val ev = synthEvents(spark, n)
    TsCatalog(Seq("graft"),
      Map(EventsAdapter.Measurement -> EventsAdapter.samples(ev).localCheckpoint(true)),
      EventsAdapter.seriesIndex(ev).localCheckpoint(true))
  }

  // representative planner shapes: bucketed agg, honored GROUP BY tag,
  // grouped selector, fill spine, per-series window transform, raw scan
  private val FromNs = 1704067200000L * 1000000L
  private val ToNs = (1704067200000L + 31L * 86400000L) * 1000000L
  private val Queries: Seq[(String, String)] = Seq(
    "mean_1h_series" ->
      s"""SELECT mean("value") FROM "events" WHERE time > $FromNs AND time < $ToNs AND "event_type" = 'click' AND "user_id" = '7' GROUP BY time(1h)""",
    "count_1h_groupby_tag" ->
      s"""SELECT count("value") FROM "events" WHERE time > $FromNs AND time < $ToNs GROUP BY time(1h), "event_type"""",
    "top3_6h_groupby_tag" ->
      s"""SELECT top("value", 3) FROM "events" WHERE time > $FromNs AND time < $ToNs GROUP BY time(6h), "event_type"""",
    "fill_linear_6h" ->
      s"""SELECT mean("value") FROM "events" WHERE time > $FromNs AND time < $ToNs AND "event_type" = 'click' AND "user_id" = '7' GROUP BY time(6h) fill(linear)""",
    "movavg_1h" ->
      s"""SELECT moving_average(mean("value"), 3) FROM "events" WHERE time > $FromNs AND time < $ToNs AND "event_type" = 'click' AND "user_id" = '7' GROUP BY time(1h)""",
    "integral_6h" ->
      s"""SELECT integral("value", 1s) FROM "events" WHERE time > $FromNs AND time < $ToNs AND "event_type" = 'click' AND "user_id" = '7' GROUP BY time(6h)""")

  private def time(spark: SparkSession, cat: TsCatalog, q: String): Double = {
    val stmt = graft.query.InfluxQlParser.parse(q)
      .fold(e => throw new IllegalArgumentException(e), identity)
    val df = graft.query.Planner.plan(spark, stmt, cat, graft.SparkEntry.NowMs)
    df.count() // untimed warmup (Janino)
    (1 to 2).map { _ =>
      System.gc()
      val t0 = System.nanoTime()
      df.count()
      (System.nanoTime() - t0) / 1e9
    }.min
  }

  def main(args: Array[String]): Unit = {
    val base = if (args.length > 0) args(0).toLong else 1000000L
    val factor = if (args.length > 1) args(1).toLong else 10L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val small = catalogFor(spark, base)
    val big = catalogFor(spark, base * factor)
    val rows = Queries.map { case (name, q) =>
      val ts = time(spark, small, q)
      val tb = time(spark, big, q)
      println(f"[probe] $name%-22s ${base}%9d rows ${ts}%7.2fs   ${base * factor}%10d rows ${tb}%7.2fs   x${tb / ts}%.2f")
      (name, ts, tb)
    }
    val (sSum, bSum) = (rows.map(_._2).sum, rows.map(_._3).sum)
    println(f"[probe] TOTAL ${sSum}%7.2fs -> ${bSum}%7.2fs  x${bSum / sSum}%.2f for x$factor data")
    spark.stop()
  }
}
