package graft

import graft.ingest.Ingest
import graft.query.{Ast, InfluxQlParser, Planner, Response, TsCatalog}
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end: line protocol in → ingest → catalog → InfluxQL → DataFrame →
  * InfluxDB JSON. The minimum slice of SURVEY §7.2 step 3 plus goldens. */
class PlannerSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  // t0 = 2018-12-21T20:37:00Z in ns (minute-aligned so bucket math is easy)
  private val t0ns = 1545424620000000000L
  private val t0ms = t0ns / 1000000L
  private def ns(offsetS: Long) = t0ns + offsetS * 1000000000L

  private lazy val cat: TsCatalog = {
    import spark.implicits._
    val lines = Seq(
      s"cpu,cpu=cpu0,host=h1 usage_user=10.0,usage_system=2.0 ${ns(0)}",
      s"cpu,cpu=cpu0,host=h1 usage_user=20.0,usage_system=4.0 ${ns(30)}",
      s"cpu,cpu=cpu0,host=h1 usage_user=40.0 ${ns(70)}",
      s"cpu,cpu=cpu1,host=h1 usage_user=100.0 ${ns(10)}",
      s"cpu,cpu=cpu0,host=h2 usage_user=7.0 ${ns(20)}",
      s"mem,host=h1 used_percent=71.2 ${ns(5)}",
      s"syslog,host=h1 message=\"boot ok\" ${ns(15)}"
    ).toDS()
    val batch = Ingest.fromLines(lines, nowMs = t0ms)
    batch.samples.cache(); batch.series.cache()
    val byMeasurement = Seq("cpu", "mem", "syslog").map { m =>
      // per-measurement samples table: filter via the series index fingerprints
      val fps = batch.series.filter(org.apache.spark.sql.functions.col("measurement") === m)
        .select("fingerprint")
      m -> batch.samples.join(fps, Seq("fingerprint"), "left_semi")
    }.toMap
    TsCatalog(Seq("telegraf"), byMeasurement, batch.series)
  }

  private def run(q: String, nowMs: Long = t0ms + 3600000L) = {
    val stmt = InfluxQlParser.parse(q).fold(e => fail(s"parse: $e"), identity)
    Planner.plan(spark, stmt, cat, nowMs)
  }

  test("flagship SELECT mean grouped to 1m buckets with tag filter") {
    val df = run("""SELECT mean("usage_user") FROM "cpu" WHERE time > now() - 2h AND "cpu"='cpu0' GROUP BY time(1m)""")
    val rows = df.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
      r.getString(3), r.getString(4))).toSeq
    val m0 = t0ms - t0ms % 60000L
    // cpu0/h1: minute0 avg(10,20)=15, minute1 avg(40)=40; cpu0/h2: minute0 avg(7)
    // one row per (bucket, series, label pair): cpu=cpu0 and host=hX
    assert(rows.contains((m0, "usage_user", 15.0, "cpu", "cpu0")))
    assert(rows.contains((m0, "usage_user", 15.0, "host", "h1")))
    assert(rows.contains((m0 + 60000L, "usage_user", 40.0, "cpu", "cpu0")))
    assert(rows.contains((m0, "usage_user", 7.0, "host", "h2")))
    // cpu1 series excluded by tag filter
    assert(!rows.exists(_._5 == "cpu1"))
  }

  test("aggregate dispatch: sum/min/max/count/first/last") {
    def agg1(fn: String): Seq[(Long, Double)] = {
      val df = run(s"""SELECT $fn("usage_user") FROM "cpu" WHERE time > now() - 2h AND "cpu"='cpu0' AND "host"='h1' GROUP BY time(10m)""")
      df.filter("labelname = 'cpu'").collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    }
    val b = t0ms - t0ms % 600000L
    assert(agg1("sum") == Seq((b, 70.0)))
    assert(agg1("min") == Seq((b, 10.0)))
    assert(agg1("max") == Seq((b, 40.0)))
    assert(agg1("count") == Seq((b, 3.0)))
    assert(agg1("first") == Seq((b, 10.0)))
    assert(agg1("last") == Seq((b, 40.0)))
    assert(agg1("spread") == Seq((b, 30.0)))
  }

  test("multi-metric SELECT unions per-metric subqueries (U1)") {
    val df = run("""SELECT mean("usage_user"), mean("usage_system") FROM "cpu" WHERE time > now() - 2h AND "host"='h1' GROUP BY time(1h)""")
    val names = df.select("name").distinct().collect().map(_.getString(0)).toSet
    assert(names == Set("usage_user", "usage_system"))
  }

  test("absolute ns time range honors strict comparators (InfluxQL >, <)") {
    // strict >: the point exactly AT t0 is excluded (the reference's
    // BETWEEN included it — the pagination-duplicating conflation we fix)
    val strict = run(s"""SELECT mean("usage_user") FROM "cpu" WHERE time > ${ns(0)} AND time < ${ns(60)} GROUP BY time(1m)""")
    val sVals = strict.filter("labelname = 'cpu'").collect().map(_.getDouble(2)).toSet
    assert(sVals == Set(20.0, 100.0, 7.0)) // cpu0/h1 keeps only @30s
    // inclusive >= keeps it
    val incl = run(s"""SELECT mean("usage_user") FROM "cpu" WHERE time >= ${ns(0)} AND time <= ${ns(60)} GROUP BY time(1m)""")
    val iVals = incl.filter("labelname = 'cpu'").collect().map(_.getDouble(2)).toSet
    assert(iVals == Set(15.0, 100.0, 7.0)) // cpu0/h1 mean(10@0s, 20@30s)
  }

  test("string field SELECT carries message through (string pipeline)") {
    val df = run("""SELECT mean("message") FROM "syslog" WHERE time > now() - 2h GROUP BY time(1m)""")
    val r = df.collect()
    assert(r.nonEmpty && r.forall(_.getAs[String]("message") == "boot ok"))
  }

  test("LIMIT honored (divergence from reference which strips it)") {
    val df = run("""SELECT mean("usage_user") FROM "cpu" WHERE time > now() - 2h GROUP BY time(1m) LIMIT 2""")
    assert(df.count() == 2)
  }

  test("SHOW MEASUREMENTS / FIELD KEYS / TAG KEYS / TAG VALUES") {
    assert(run("SHOW MEASUREMENTS").collect().map(_.getString(0)).toSeq ==
      Seq("cpu", "mem", "syslog"))
    assert(run("""SHOW FIELD KEYS FROM "cpu"""").collect().map(_.getString(0)).toSeq ==
      Seq("usage_system", "usage_user"))
    assert(run("""SHOW TAG KEYS FROM "cpu"""").collect().map(_.getString(0)).toSeq ==
      Seq("cpu", "host"))
    assert(run("""SHOW TAG VALUES FROM "cpu" WITH KEY IN ("host")""")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("host", "h1"), ("host", "h2")))
  }

  test("fallback time range is 300s (cflux.js:719-726)") {
    val (from, to) = Planner.resolveTime(Ast.TimeBounds(None, None), nowMs = 1000000L)
    assert(to == 1000000L && from == 700000L)
  }

  test("golden InfluxDB JSON shape for SELECT") {
    val df = run("""SELECT mean("usage_user") FROM "cpu" WHERE time > now() - 2h AND "cpu"='cpu1' GROUP BY time(1m)""")
    val json = Response.selectJson(df, "cpu")
    val m0 = t0ms - t0ms % 60000L
    // reference shape (cflux.js:815-832): series name = MEASUREMENT,
    // columns ["time", metric], one results entry per (metric, tag pair),
    // each an independent object (aliasing bug fixed per SURVEY §3.2)
    assert(json ==
      s"""{"results":[""" +
      s"""{"statement_id":0,"series":[{"name":"cpu","tags":{"cpu":"cpu1"},"columns":["time","usage_user"],"values":[[$m0,100]]}]},""" +
      s"""{"statement_id":0,"series":[{"name":"cpu","tags":{"host":"h1"},"columns":["time","usage_user"],"values":[[$m0,100]]}]}]}""")
  }

  test("chunked statement-level partial spans ALL series of a statement") {
    import spark.implicits._
    // series (host=a): 3 points → 2 chunks at chunk_size=2; series (host=b): 1
    val df = Seq(
      (1000L, "usage", 1.0, "host", "a", ""),
      (2000L, "usage", 2.0, "host", "a", ""),
      (3000L, "usage", 3.0, "host", "a", ""),
      (1000L, "usage", 9.0, "host", "b", ""))
      .toDF("time_ms", "name", "value", "labelname", "labelvalue", "message")
    val entries = Response.selectEntries(Seq("cpu" -> df), baseId = 0,
      perMetricIds = true, chunkSize = Some(2))
    assert(entries.size === 3, entries)
    // chunk 0: mid-series → partial at BOTH series and statement level
    assert(entries(0).contains(""""values":[[1000,1],[2000,2]],"partial":true}"""), entries(0))
    assert(entries(0).endsWith("""],"partial":true}"""), entries(0))
    // chunk 1: LAST chunk of series a but NOT of the statement → no series
    // flag, statement flag present (InfluxDB keeps result-level partial
    // until the statement's final chunk)
    assert(entries(1).contains(""""values":[[3000,3]]}"""), entries(1))
    assert(entries(1).endsWith("""],"partial":true}"""), entries(1))
    // chunk 2: the statement's final chunk → no flags anywhere
    assert(!entries(2).contains(""""partial""""), entries(2))
  }

  test("golden JSON for SHOW MEASUREMENTS and empty result") {
    val json = Response.showJson("measurements", run("SHOW MEASUREMENTS"))
    // column is "name", matching cflux.js:654 / InfluxDB's response shape
    assert(json == """{"results":[{"statement_id":0,"series":[{"name":"measurements","columns":["name"],"values":[["cpu"],["mem"],["syslog"]]}]}]}""")
    assert(Response.emptyResult == """{"results":[{"statement_id":0}]}""")
  }

  test("typed transforms over gap-filled spines never see null rows") {
    // range opens 150s before the first point, so the FILL spine carries
    // leading NULL buckets. The typed transforms (EMA family, KAMA, RSI,
    // holt_winters) decode value into a primitive Double and previously
    // crashed on those rows ("Null value appeared in non-nullable field");
    // they now skip missing points (InfluxDB moving-average semantics).
    val q = s"""SELECT exponential_moving_average(mean("usage_user"), 3) FROM "cpu" WHERE time > ${ns(-150)} AND time < ${ns(80)} AND "cpu" = 'cpu0' AND "host" = 'h1' GROUP BY time(1m) FILL(previous)"""
    val rows = run(q)
      .select("time_ms", "value").distinct().collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).sortBy(_._1)
    // two real buckets: mean(10,20)=15 at t0's minute, 40 at the next;
    // EMA(3): seed 15, then 0.5*40 + 0.5*15 = 27.5 — leading null
    // buckets contribute nothing
    assert(rows.map(_._2).toSeq === Seq(15.0, 27.5))
    // holt_winters over the same gap-filled spine is also total
    val hw = s"""SELECT holt_winters(mean("usage_user"), 2) FROM "cpu" WHERE time > ${ns(-150)} AND time < ${ns(80)} AND "cpu" = 'cpu0' AND "host" = 'h1' GROUP BY time(1m) FILL(previous)"""
    assert(run(hw).collect().nonEmpty)
    // and a window-based transform keeps its drop-null contract
    val df = s"""SELECT difference(mean("usage_user")) FROM "cpu" WHERE time > ${ns(-150)} AND time < ${ns(80)} AND "cpu" = 'cpu0' AND "host" = 'h1' GROUP BY time(1m) FILL(previous)"""
    val diffs = run(df)
      .select("value").distinct().collect().map(_.getDouble(0))
    assert(diffs.toSeq === Seq(25.0)) // 40 - 15; null-lag rows dropped
  }
}
