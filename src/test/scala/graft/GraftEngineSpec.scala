package graft

import graft.api.GraftEngine
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** End-to-end engine façade: write line protocol, query it back as
  * InfluxDB JSON — the full reference lifecycle (SURVEY §3.1 + §3.2/§3.3)
  * without HTTP. */
class GraftEngineSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  private val NowMs = 1735689600000L // 2025-01-01T00:00:00Z

  private def newEngine() = {
    val root = Files.createTempDirectory("graft-engine").toString
    new GraftEngine(spark, root, () => NowMs)
  }

  test("write then SELECT returns InfluxDB-shaped series JSON") {
    val e = newEngine()
    e.write("telegraf",
      """cpu,host=a,region=eu usage=10 1735689540000000000
        |cpu,host=a,region=eu usage=20 1735689550000000000
        |cpu,host=b,region=eu usage=30 1735689560000000000""".stripMargin)
    val json = e.query("telegraf",
      """SELECT mean("usage") FROM "cpu" WHERE time > now() - 5m GROUP BY time(1m)""")
    // host=a bucket mean = 15, host=b = 30; one series per (metric, tag
    // pair), named after the MEASUREMENT with columns ["time", metric]
    assert(json.contains(""""name":"cpu""""))
    assert(json.contains(""""columns":["time","usage"]"""))
    assert(json.contains(""""tags":{"host":"a"}"""))
    assert(json.contains(""""tags":{"host":"b"}"""))
    assert(json.contains(""""tags":{"region":"eu"}"""))
    assert(json.contains("[1735689540000,15]"))
    assert(json.contains("[1735689540000,30]"))
  }

  test("streaming chunked SELECT: per-chunk emission, series + statement partial flags") {
    val e = newEngine()
    // two series: host=a with 5 raw points, host=b with 1
    e.write("chdb", (1 to 5).map(i =>
      s"cpu,host=a usage=$i 17356895${40 + i}000000000").mkString("\n") +
      "\ncpu,host=b usage=9 1735689541000000000")
    val q = """SELECT "usage" FROM "cpu" WHERE time > now() - 5m"""
    val chunks = e.queryChunkStream("chdb", q, None, Some(2)).toSeq
    // host=a: 5 points → chunks of 2,2,1; host=b: 1 point → 1 chunk = 4 docs
    assert(chunks.size === 4, chunks)
    chunks.foreach(c => assert(c.startsWith("""{"results":[""") && c.endsWith("]}"), c))
    val aChunks = chunks.filter(_.contains(""""tags":{"host":"a"}"""))
    val bChunks = chunks.filter(_.contains(""""tags":{"host":"b"}"""))
    assert(aChunks.size === 3 && bChunks.size === 1)
    // series-level flag sits INSIDE the series object, right after values
    assert(aChunks(0).contains("""]],"partial":true}"""), aChunks(0))
    assert(aChunks(1).contains("""]],"partial":true}"""), aChunks(1))
    assert(!aChunks(2).contains("""]],"partial":true}"""), aChunks(2))
    assert(!bChunks(0).contains("""]],"partial":true}"""), bChunks(0))
    // statement-level: every doc but the statement's final one is partial
    chunks.init.foreach(c => assert(c.endsWith("""],"partial":true}]}"""), c))
    assert(!chunks.last.endsWith("""],"partial":true}]}"""), chunks.last)
    // every point arrives exactly once across chunks
    val pts = chunks.flatMap("""\[17356895\d\d000,(\d+)\]""".r.findAllMatchIn(_).map(_.group(1)))
    assert(pts.sorted === Seq("1", "2", "3", "4", "5", "9"), pts)
    // the eager wrapper sees the same documents
    assert(e.queryChunks("chdb", q, None, Some(2)) === chunks)
  }

  test("multi-measurement catalog: per-measurement isolation + SHOW MEASUREMENTS") {
    val e = newEngine()
    e.write("db1",
      """cpu,host=a usage=1 1735689540000000000
        |mem,host=a used=2 1735689540000000000""".stripMargin)
    val shows = e.query("db1", "SHOW MEASUREMENTS")
    assert(shows.contains("cpu") && shows.contains("mem"))
    // SELECT over cpu must not see mem's samples
    val json = e.query("db1",
      """SELECT mean("usage") FROM "cpu" WHERE time > now() - 5m GROUP BY time(1m)""")
    assert(json.contains("[1735689540000,1]") && !json.contains("used"))
  }

  test("string fields ride the message pipeline into the response") {
    val e = newEngine()
    e.write("db2", """app,host=a level="warn",code=7 1735689540000000000""")
    val json = e.query("db2",
      """SELECT mean("level") FROM "app" WHERE time > now() - 5m GROUP BY time(1m)""")
    // string value wins over the (0) mean in the pivot (cflux.js:795 message||mean)
    assert(json.contains("""[1735689540000,"warn"]"""))
  }

  test("subscription fan-out receives the raw write body (keyed by bare db)") {
    val e = newEngine()
    e.query("db3", """CREATE SUBSCRIPTION "sub0" ON "db3"."autogen" DESTINATIONS ANY 'http://sink'""")
    val got = new java.util.concurrent.atomic.AtomicReference[String]("")
    e.withTransport("db3", got.set)
    val body = "cpu,host=a usage=5 1735689540000000000"
    e.write("db3", body)
    assert(got.get() === body)
    // SHOW SUBSCRIPTIONS lists the live registry (reference mocks empty)
    val subs = e.query("db3", "SHOW SUBSCRIPTIONS")
    assert(subs.contains(""""name":"db3"""") && subs.contains("sub0"), subs)
    // destinations is a real JSON array of strings, not a quoted literal
    assert(subs.contains("""["http://sink"]"""), subs)
  }

  test("default transport POSTs the raw body over HTTP; a dead sink never blocks the write") {
    import com.sun.net.httpserver.HttpServer
    import java.net.InetSocketAddress
    val received = new java.util.concurrent.LinkedBlockingQueue[String]()
    val sink = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    sink.createContext("/write", ex => {
      received.put(new String(ex.getRequestBody.readAllBytes, "UTF-8"))
      ex.sendResponseHeaders(204, -1); ex.close()
    })
    sink.start()
    try {
      val e = newEngine()
      val port = sink.getAddress.getPort
      e.query("db3h",
        s"""CREATE SUBSCRIPTION "sub1" ON "db3h"."autogen" DESTINATIONS ANY 'http://127.0.0.1:$port/write'""")
      val body = "cpu,host=a usage=6 1735689540000000000"
      e.write("db3h", body)
      assert(received.poll(5, java.util.concurrent.TimeUnit.SECONDS) === body)
      // dead sink: write must complete (fire-and-forget, reference parity)
      val e2 = newEngine()
      e2.query("db3x",
        """CREATE SUBSCRIPTION "sub2" ON "db3x"."autogen" DESTINATIONS ANY 'http://127.0.0.1:1/write'""")
      e2.write("db3x", "cpu,host=a usage=7 1735689540000000000")
      assert(e2.query("db3x", "SHOW MEASUREMENTS").contains("cpu"))
    } finally sink.stop(0)
  }

  test("metadata statements: SHOW DATABASES / FIELD KEYS / TAG VALUES / unsupported") {
    val e = newEngine()
    e.write("dbm", "cpu,host=a,region=eu usage=1,temp=2 1735689540000000000")
    assert(e.query("dbm", "SHOW DATABASES").contains("dbm"))
    val fk = e.query("dbm", """SHOW FIELD KEYS FROM "cpu"""")
    assert(fk.contains("usage") && fk.contains("temp") && fk.contains("float"))
    val tv = e.query("dbm", """SHOW TAG VALUES FROM "cpu" WITH KEY IN ("host")""")
    assert(tv.contains("host") && tv.contains("a") && !tv.contains("region"))
    assert(e.query("dbm", "DROP SERIES FROM cpu") === Response0)
  }

  private val Response0 = """{"results":[{"statement_id":0}]}"""

  test("write precision scales wire timestamps (s/ms/us/ns)") {
    val e = newEngine()
    // same instant expressed in four precisions -> one 1m bucket
    e.write("dbt", "m1,h=a f=1 1735689540", "s")
    e.write("dbt", "m1,h=a f=2 1735689540000", "ms")
    e.write("dbt", "m1,h=a f=3 1735689540000000", "us")
    e.write("dbt", "m1,h=a f=4 1735689540000000000", "ns")
    val json = e.query("dbt",
      """SELECT mean("f") FROM "m1" WHERE time > now() - 5m GROUP BY time(1m)""")
    assert(json.contains("[1735689540000,2.5]")) // mean(1,2,3,4) in ONE bucket
    intercept[IllegalArgumentException](e.write("dbt", "m1 f=1", "fortnights"))
  }

  test("SELECT against unknown measurement or fresh db returns empty result") {
    val e = newEngine()
    e.write("dbe", "cpu,h=a f=1 1735689540000000000")
    assert(e.query("dbe",
      """SELECT mean("f") FROM "nope" WHERE time > now() - 5m GROUP BY time(1m)""")
      === Response0)
  }

  test("raw SELECT returns unbucketed points at original timestamps") {
    val e = newEngine()
    e.write("dbr",
      """cpu,host=a usage=10 1735689543000000000
        |cpu,host=a usage=20 1735689547000000000""".stripMargin)
    val json = e.query("dbr",
      """SELECT "usage" FROM "cpu" WHERE time > now() - 5m""")
    // raw timestamps survive (no minute flooring), both points present
    assert(json.contains("[1735689543000,10]") && json.contains("[1735689547000,20]"), json)
  }

  test("SELECT * expands to every field of the measurement") {
    val e = newEngine()
    e.write("dbs", "app,host=a cpu=1,mem=2 1735689540000000000")
    val json = e.query("dbs", """SELECT * FROM "app" WHERE time > now() - 5m""")
    assert(json.contains(""""columns":["time","cpu"]""") &&
      json.contains(""""columns":["time","mem"]"""), json)
  }

  test("regex FROM matches multiple measurements, each series named by its own") {
    val e = newEngine()
    e.write("dbx",
      """cpu,host=a usage=1 1735689540000000000
        |cpuload,host=a v=2 1735689540000000000
        |mem,host=a used=3 1735689540000000000""".stripMargin)
    val json = e.query("dbx",
      """SELECT mean(*) FROM /^cpu/ WHERE time > now() - 5m GROUP BY time(1m)""")
    assert(json.contains(""""name":"cpu"""") && json.contains(""""name":"cpuload""""), json)
    assert(!json.contains(""""name":"mem""""), json)
  }

  test("SLIMIT/SOFFSET page series; OFFSET pages points") {
    val e = newEngine()
    e.write("dbl",
      """cpu,host=a u=1 1735689540000000000
        |cpu,host=b u=2 1735689540000000000
        |cpu,host=c u=3 1735689540000000000""".stripMargin)
    // series sorted by (name, labelname, labelvalue): host=a, host=b, host=c
    val json = e.query("dbl",
      """SELECT mean("u") FROM "cpu" WHERE time > now() - 5m GROUP BY time(1m) SLIMIT 1 SOFFSET 1""")
    assert(json.contains(""""tags":{"host":"b"}"""), json)
    assert(!json.contains(""""tags":{"host":"a"}""") && !json.contains(""""tags":{"host":"c"}"""), json)
    val j2 = e.query("dbl",
      """SELECT "u" FROM "cpu" WHERE time > now() - 5m LIMIT 1 OFFSET 1""")
    assert(j2.contains(",2]") && !j2.contains(",1]") && !j2.contains(",3]"), j2)
  }

  test("subquery: outer max over inner per-minute means") {
    val e = newEngine()
    // minute 0: values 10,20 (mean 15); minute 1: 40 (mean 40)
    e.write("dbq",
      """cpu,host=a u=10 1735689540000000000
        |cpu,host=a u=20 1735689550000000000
        |cpu,host=a u=40 1735689600000000000""".stripMargin)
    val json = e.query("dbq",
      """SELECT max("mean") FROM (SELECT mean("u") FROM "cpu" WHERE time > now() - 10m """ +
        """GROUP BY time(1m)) WHERE time > now() - 10m GROUP BY time(10m)""")
    // the two minute-means land in different 10-min buckets: 23:50 → 15
    // (max of a single mean), 00:00 → 40; raw points must not leak through
    assert(json.contains("[1735689000000,15]") && json.contains("[1735689600000,40]"), json)
    assert(!json.contains("[1735689540000,10]") && !json.contains("[1735689550000,20]"), json)
    assert(json.contains(""""columns":["time","mean"]"""), json)
  }

  test("transform composes over a subquery: difference of inner means") {
    val e = newEngine()
    // minutes 23:57, 23:58, 23:59 → means 10, 30, 25
    e.write("dbtc",
      """cpu,host=a u=10 1735689420000000000
        |cpu,host=a u=30 1735689480000000000
        |cpu,host=a u=25 1735689540000000000""".stripMargin)
    val json = e.query("dbtc",
      """SELECT difference(max("mean")) FROM (SELECT mean("u") FROM "cpu" """ +
        """WHERE time > now() - 10m GROUP BY time(1m)) """ +
        """WHERE time > now() - 10m GROUP BY time(1m)""")
    // per-minute maxes of the inner means differenced: 30-10=20, 25-30=-5
    assert(json.contains("[1735689480000,20]") && json.contains("[1735689540000,-5]"), json)
    assert(!json.contains("[1735689420000"), json) // first bucket dropped
  }

  test("subquery inner inherits the outer WHERE time when it has none") {
    val e = newEngine()
    // 2h before "now" — outside the 300s default window the inner would
    // otherwise fall back to
    e.write("dbi", "cpu,host=a u=6 1735682400000000000")
    val json = e.query("dbi",
      """SELECT max("mean") FROM (SELECT mean("u") FROM "cpu" GROUP BY time(1m)) """ +
        """WHERE time > now() - 3h GROUP BY time(10m)""")
    assert(json.contains(",6]"), json)
  }

  test("FILL(null) gap rows serialize as JSON null, distinct from FILL(0)") {
    val e = newEngine()
    // two points 3 minutes apart → 2 gap buckets between them
    e.write("dbf",
      """cpu,host=a usage=10 1735689420000000000
        |cpu,host=a usage=20 1735689600000000000""".stripMargin)
    val jn = e.query("dbf",
      """SELECT mean("usage") FROM "cpu" WHERE time > now() - 10m GROUP BY time(1m) FILL(null)""")
    assert(jn.contains("[1735689480000,null]"), s"expected null gap row in $jn")
    val jz = e.query("dbf",
      """SELECT mean("usage") FROM "cpu" WHERE time > now() - 10m GROUP BY time(1m) FILL(0)""")
    assert(jz.contains("[1735689480000,0]") && !jz.contains("null"))
  }

  test("FILL(<number>) plugs gaps with the constant; FILL(none) drops them") {
    val e = newEngine()
    e.write("dbfn",
      """cpu,host=a usage=10 1735689420000000000
        |cpu,host=a usage=20 1735689600000000000""".stripMargin)
    val jn = e.query("dbfn",
      """SELECT mean("usage") FROM "cpu" WHERE time > now() - 10m GROUP BY time(1m) FILL(-5)""")
    assert(jn.contains("[1735689480000,-5]"), s"expected -5 gap row in $jn")
    val none = e.query("dbfn",
      """SELECT mean("usage") FROM "cpu" WHERE time > now() - 10m GROUP BY time(1m) FILL(none)""")
    assert(!none.contains("1735689480000"), s"expected no gap rows in $none")
    assert(none.contains("1735689420000") && none.contains("1735689600000"))
  }

  test("malformed queries return the clean empty result, never throw") {
    val e = newEngine()
    e.write("dbm", "cpu,h=a f=1 1735689540000000000")
    val bad = Seq(
      // decimal time literal → parser Left (previously NumberFormatException)
      """SELECT mean("f") FROM "cpu" WHERE time > 1.5""",
      // overflowing time literal
      """SELECT mean("f") FROM "cpu" WHERE time > 99999999999999999999999999""",
      // unparseable date string → planner DateTimeParseException path
      """SELECT mean("f") FROM "cpu" WHERE time > 'not a date'""")
    bad.foreach { q => assert(e.query("dbm", q) === Response0, s"for: $q") }
    // transform over a selector is rejected with an explicit per-statement
    // error (InfluxDB shape), not a silent empty result
    val sel = e.query("dbm",
      """SELECT derivative(top("f", 3), 1s) FROM "cpu" WHERE time > now() - 5m GROUP BY time(1m)""")
    assert(sel.contains(""""statement_id":0,"error":"derivative cannot wrap selector top""""), sel)
  }

  test("SHOW CARDINALITY family and epoch= time units") {
    val e = newEngine()
    e.write("dbc",
      """cpu,host=a,region=eu usage=1,load=2 1735689540000000000
        |mem,host=a used=3 1735689540000000000""".stripMargin)
    assert(e.query("dbc", "SHOW MEASUREMENT CARDINALITY").contains("[2]"))
    // field keys: (cpu,usage), (cpu,load), (mem,used)
    assert(e.query("dbc", "SHOW FIELD KEY EXACT CARDINALITY").contains("[3]"))
    // tag keys: (cpu,host), (cpu,region), (mem,host)
    assert(e.query("dbc", "SHOW TAG KEY CARDINALITY").contains("[3]"))
    val json = e.query("dbc",
      """SELECT mean("used") FROM "mem" WHERE time > now() - 5m GROUP BY time(1m)""",
      Some("s"))
    assert(json.contains("[1735689540,3]"), json)
  }

  test("multi-statement query: one results entry per statement, ids by index") {
    val e = newEngine()
    e.write("dbms",
      """cpu,host=a usage=10 1735689540000000000
        |mem,host=a used=5 1735689540000000000""".stripMargin)
    val json = e.query("dbms",
      """SELECT mean("usage") FROM "cpu" WHERE time > now() - 5m GROUP BY time(1m); """ +
        """SHOW MEASUREMENTS; CREATE DATABASE "dbms2"""")
    assert(json.contains(""""statement_id":0""") && json.contains("[1735689540000,10]"), json)
    assert(json.contains(""""statement_id":1""") && json.contains("measurements"), json)
    assert(json.contains("""{"statement_id":2}"""), json)
    // the CREATE side effect ran
    assert(e.query("dbms2", "SHOW MEASUREMENTS").contains("results"))
    // a bad statement inside a batch errors alone, the rest still answer
    val mixed = e.query("dbms",
      """SELECT mean("usage") FROM "cpu" WHERE time > 1.5; SHOW MEASUREMENTS""")
    assert(mixed.contains(""""statement_id":0,"error""""), mixed)
    assert(mixed.contains(""""statement_id":1""") && mixed.contains("cpu"), mixed)
  }

  test("DROP MEASUREMENT removes data and series metadata; others untouched") {
    val e = newEngine()
    e.write("dbd",
      """cpu,host=a usage=1 1735689540000000000
        |mem,host=a used=2 1735689540000000000""".stripMargin)
    assert(e.query("dbd", "DROP MEASUREMENT \"cpu\"") === Response0)
    val shows = e.query("dbd", "SHOW MEASUREMENTS")
    assert(!shows.contains("cpu") && shows.contains("mem"), shows)
    assert(e.query("dbd",
      """SELECT mean("usage") FROM "cpu" WHERE time > now() - 5m GROUP BY time(1m)""")
      === Response0)
    // mem still answers
    assert(e.query("dbd",
      """SELECT mean("used") FROM "mem" WHERE time > now() - 5m GROUP BY time(1m)""")
      .contains("[1735689540000,2]"))
  }

  test("DELETE drops covered hour partitions and rewrites only boundaries") {
    val e = newEngine()
    // hour 482136: 00:10, 00:20; hour 482137: 01:10, 01:50
    e.write("dbdel",
      """cpu,host=a u=1 1735690200000000000
        |cpu,host=a u=2 1735690800000000000
        |cpu,host=a u=3 1735693800000000000
        |cpu,host=a u=4 1735696200000000000""".stripMargin)
    // delete everything up to 01:20 → hour 482136 fully covered (dir
    // drop), hour 482137 partially (rewrite keeps only the 01:50 point)
    assert(e.query("dbdel",
      "DELETE FROM \"cpu\" WHERE time <= 1735694400000000000") === Response0)
    val json = e.query("dbdel",
      """SELECT "u" FROM "cpu" WHERE time > 1735689600000000000 AND time < 1735700000000000000""")
    assert(json.contains(",4]") && !json.contains(",1]") && !json.contains(",2]") && !json.contains(",3]"), json)
    // series metadata survives point deletion
    assert(e.query("dbdel", "SHOW SERIES FROM \"cpu\"").contains("cpu,host=a"))
  }

  test("tz() day buckets follow the DST transition (Chicago, 2025-03-09)") {
    val e = newEngine()
    // America/Chicago DST begins 2025-03-09 02:00 local (UTC-6 → UTC-5):
    // local midnight Mar 9 = 06:00Z, local midnight Mar 10 = 05:00Z.
    // One point each local day, written at ns epochs:
    //   Mar 9 12:00 local = 17:00Z = 1741539600s
    //   Mar 10 12:00 local = 17:00Z = 1741626000s
    e.write("dbtz",
      """cpu,host=a u=1 1741539600000000000
        |cpu,host=a u=2 1741626000000000000""".stripMargin)
    val json = e.query("dbtz",
      """SELECT mean("u") FROM "cpu" WHERE time > 1741400000000000000""" +
        """ AND time < 1741700000000000000 GROUP BY time(1d) tz('America/Chicago')""")
    // bucket starts at the UTC instants of the LOCAL midnights:
    // Mar 9 00:00 CST = 1741500000000 ms; Mar 10 00:00 CDT = 1741582800000 ms
    // (23-hour DST day — the UTC gap between starts is 82800000 ms)
    assert(json.contains("[1741500000000,1]"), json)
    assert(json.contains("[1741582800000,2]"), json)
  }

  test("EXPLAIN SELECT returns the real physical plan as a series") {
    val e = newEngine()
    e.write("dbex", "cpu,host=a u=1 1735689540000000000")
    val plan = e.query("dbex",
      """EXPLAIN SELECT mean("u") FROM "cpu" WHERE time > now() - 5m GROUP BY time(1m)""")
    assert(plan.contains("QUERY PLAN"), plan)
    // the plan must show the engine's actual join strategy and agg
    assert(plan.contains("BroadcastHashJoin") && plan.contains("HashAggregate"), plan)
    // unknown measurement stays a clean bare statement
    assert(e.query("dbex", """EXPLAIN SELECT mean("u") FROM "nope"""") === Response0)
  }

  test("retention policy: registered policy shows, enforcement drops expired hours only") {
    val e = newEngine()
    // now = 1735689600000 (2025-01-01T00:00Z); write one point 3 h old,
    // one 30 min old
    e.write("dbrp",
      """cpu,host=a u=1 1735678800000000000
        |cpu,host=a u=2 1735687800000000000""".stripMargin)
    assert(e.query("dbrp",
      """CREATE RETENTION POLICY "short" ON "dbrp" DURATION 1h REPLICATION 1 DEFAULT""")
      === Response0)
    val show = e.query("dbrp", "SHOW RETENTION POLICIES ON \"dbrp\"")
    assert(show.contains(""""short","1h0m0s"""") && show.contains("true"), show)
    e.enforceRetention()
    val q = e.query("dbrp", """SELECT "u" FROM "cpu" WHERE time > now() - 6h""")
    assert(q.contains(",2]") && !q.contains(",1]"), q)
    // series metadata survives expiry
    assert(e.query("dbrp", "SHOW SERIES FROM \"cpu\"").contains("cpu,host=a"))
  }

  test("multi-measurement FROM: one series set per measurement, missing refs skipped") {
    val e = newEngine()
    e.write("dbmf",
      """cpu,host=a usage=10 1735689540000000000
        |mem,host=a usage=30 1735689540000000000""".stripMargin)
    val json = e.query("dbmf",
      """SELECT mean("usage") FROM "cpu", "mem" WHERE time > now() - 5m GROUP BY time(1m)""")
    assert(json.contains(""""name":"cpu"""") && json.contains(""""name":"mem""""), json)
    assert(json.contains("[1735689540000,10]") && json.contains("[1735689540000,30]"), json)
    // a nonexistent ref contributes nothing, the rest still answer
    val part = e.query("dbmf",
      """SELECT mean("usage") FROM "cpu", "nope" WHERE time > now() - 5m GROUP BY time(1m)""")
    assert(part.contains(""""name":"cpu"""") && !part.contains("nope"), part)
  }

  test("DROP SERIES removes matching series data AND metadata; others untouched") {
    val e = newEngine()
    e.write("dbds",
      """cpu,host=a usage=1 1735689540000000000
        |cpu,host=b usage=2 1735689540000000000
        |mem,host=a used=3 1735689540000000000""".stripMargin)
    assert(e.query("dbds", """DROP SERIES FROM "cpu" WHERE "host" = 'a'""") === Response0)
    // host=a series gone from data and SHOW SERIES; host=b intact
    val series = e.query("dbds", "SHOW SERIES FROM \"cpu\"")
    assert(!series.contains("cpu,host=a") && series.contains("cpu,host=b"), series)
    val q = e.query("dbds",
      """SELECT "usage" FROM "cpu" WHERE time > now() - 5m""")
    assert(q.contains(",2]") && !q.contains(",1]"), q)
    // other measurements untouched (scoped FROM)
    assert(e.query("dbds", "SHOW SERIES FROM \"mem\"").contains("mem,host=a"))
    // un-scoped DROP SERIES with a filter hits every measurement
    assert(e.query("dbds", """DROP SERIES WHERE "host" = 'a'""") === Response0)
    assert(!e.query("dbds", "SHOW SERIES FROM \"mem\"").contains("mem,host=a"))
  }

  test("planner rejections surface as per-statement error; unknown measurement stays bare") {
    val e = newEngine()
    e.write("dberr", "cpu,host=a usage=1 1735689540000000000")
    // user-facing rejection (missing window arg) → error object, not a
    // silent empty result
    val bad = e.query("dberr",
      """SELECT moving_average(mean("usage")) FROM "cpu" WHERE time > now() - 5m GROUP BY time(1m)""")
    assert(bad.contains(""""statement_id":0,"error":"moving_average needs a window size""""), bad)
    // transform-over-selector rejection surfaces too
    val sel = e.query("dberr",
      """SELECT derivative(top("usage", 3)) FROM "cpu" WHERE time > now() - 5m GROUP BY time(1m)""")
    assert(sel.contains(""""error""""), sel)
    // unknown measurement / empty db keep the reference's clean empty shape
    assert(e.query("dberr",
      """SELECT mean("x") FROM "nosuch" WHERE time > now() - 5m GROUP BY time(1m)""") === Response0)
    assert(e.query("dberr",
      """SELECT mean("x") FROM /nomatch.*/ WHERE time > now() - 5m GROUP BY time(1m)""") === Response0)
    // error messages never leak raw control characters into the JSON
    val batch = e.query("dberr", "SELECT mean(\"usage\") FROM \"cpu\" WHERE time > \n\t1.5; SHOW MEASUREMENTS")
    assert(!batch.exists(_ < ' '), batch)
    assert(batch.contains(""""statement_id":0,"error""""), batch)
  }

  test("tag '=' with empty string matches series lacking the tag") {
    val e = newEngine()
    // host=a carries region; host=b does not
    e.write("dbtag",
      """cpu,host=a,region=eu usage=10 1735689540000000000
        |cpu,host=b usage=20 1735689540000000000""".stripMargin)
    val json = e.query("dbtag",
      """SELECT mean("usage") FROM "cpu" WHERE time > now() - 5m AND "region" = '' GROUP BY time(1m)""")
    assert(json.contains("[1735689540000,20]"), json)
    assert(!json.contains("[1735689540000,10]"), json)
    // and '=' with a real value still excludes the tagless series
    val eu = e.query("dbtag",
      """SELECT mean("usage") FROM "cpu" WHERE time > now() - 5m AND "region" = 'eu' GROUP BY time(1m)""")
    assert(eu.contains("[1735689540000,10]") && !eu.contains("[1735689540000,20]"), eu)
  }

  test("DELETE FROM /regex/ deletes from every matching measurement") {
    val e = newEngine()
    e.write("dbre",
      """cpu,host=a u=1 1735689540000000000
        |cpu2,host=a u=2 1735689540000000000
        |mem,host=a u=3 1735689540000000000""".stripMargin)
    assert(e.query("dbre", "DELETE FROM /cpu.*/ WHERE time <= 1735700000000000000") === Response0)
    val range = "time > 1735689000000000000 AND time < 1735700000000000000"
    assert(!e.query("dbre", s"""SELECT "u" FROM "cpu" WHERE $range""").contains(",1]"))
    assert(!e.query("dbre", s"""SELECT "u" FROM "cpu2" WHERE $range""").contains(",2]"))
    assert(e.query("dbre", s"""SELECT "u" FROM "mem" WHERE $range""").contains(",3]"))
  }

  test("distinct() and mode() selectors; ORDER BY time DESC honored") {
    val e = newEngine()
    // one series, one 1-min bucket: values 5,5,2 → distinct {2,5}, mode 5;
    // a second bucket with 7 once → mode tie rule irrelevant, value 7
    e.write("dbdm",
      """cpu,host=a u=5 1735689540000000000
        |cpu,host=a u=5 1735689541000000000
        |cpu,host=a u=2 1735689542000000000
        |cpu,host=a u=7 1735689481000000000""".stripMargin)
    val dq = e.query("dbdm",
      """SELECT distinct("u") FROM "cpu" WHERE time > now() - 5m GROUP BY time(1m)""")
    assert(dq.contains("[1735689540000,2]") && dq.contains("[1735689540000,5]"), dq)
    assert(!dq.contains("[1735689540000,5],[1735689540000,5]"), dq) // deduped
    val mq = e.query("dbdm",
      """SELECT mode("u") FROM "cpu" WHERE time > now() - 5m GROUP BY time(1m)""")
    assert(mq.contains("[1735689540000,5]") && !mq.contains("[1735689540000,2]"), mq)
    assert(mq.contains("[1735689480000,7]"), mq)
    // mode tie → lowest value: bucket with 3 once and 9 once
    e.write("dbdm2", "cpu,host=a u=9 1735689540000000000\ncpu,host=a u=3 1735689541000000000")
    val tie = e.query("dbdm2",
      """SELECT mode("u") FROM "cpu" WHERE time > now() - 5m GROUP BY time(1m)""")
    assert(tie.contains("[1735689540000,3]") && !tie.contains(",9]"), tie)
    // ORDER BY time DESC reverses the emitted value order
    val desc = e.query("dbdm",
      """SELECT mean("u") FROM "cpu" WHERE time > now() - 5m GROUP BY time(1m) ORDER BY time DESC""")
    val i540 = desc.indexOf("1735689540000")
    val i480 = desc.indexOf("1735689480000")
    assert(i540 >= 0 && i480 >= 0 && i540 < i480, desc)
  }

  test("SELECT INTO writes a downsampled measurement; continuous queries run it") {
    val e = newEngine()
    e.write("dbcq",
      """cpu,host=a u=10 1735689540000000000
        |cpu,host=a u=20 1735689550000000000
        |cpu,host=b u=30 1735689560000000000""".stripMargin)
    val into = e.query("dbcq",
      """SELECT mean("u") INTO "cpu_1m" FROM "cpu" WHERE time > now() - 5m GROUP BY time(1m)""")
    assert(into.contains(""""name":"result"""") && into.contains("[[0,2]]"), into)
    // written field key is the aggregate output name ("mean"); tags survive
    val back = e.query("dbcq",
      """SELECT mean("mean") FROM "cpu_1m" WHERE time > now() - 5m GROUP BY time(1m)""")
    assert(back.contains("[1735689540000,15]") && back.contains("[1735689540000,30]"), back)
    assert(back.contains(""""tags":{"host":"a"}"""), back)
    // continuous query: registered, visible, runnable, droppable
    assert(e.query("dbcq",
      """CREATE CONTINUOUS QUERY "cq1" ON "dbcq" BEGIN SELECT mean("u") INTO "cpu_cq" FROM "cpu" GROUP BY time(1m) END""")
      === Response0)
    val shows = e.query("dbcq", "SHOW CONTINUOUS QUERIES")
    assert(shows.contains("cq1") && shows.contains("cpu_cq"), shows)
    val ran = e.runContinuousQueries("dbcq")
    assert(ran("cq1") === 2L, ran.toString)
    // a second tick covers only (last run, now] — nothing new to write
    assert(e.runContinuousQueries("dbcq")("cq1") === 0L)
    val cqRes = e.query("dbcq",
      """SELECT mean("mean") FROM "cpu_cq" WHERE time > now() - 5m GROUP BY time(1m)""")
    assert(cqRes.contains("[1735689540000,15]"), cqRes)
    e.query("dbcq", """DROP CONTINUOUS QUERY "cq1" ON "dbcq"""")
    assert(!e.query("dbcq", "SHOW CONTINUOUS QUERIES").contains("cq1"))
    // unsupported INTO shapes surface as per-statement errors
    val rej = e.query("dbcq",
      """SELECT mean("u") INTO "x" FROM "cpu" WHERE time > now() - 5m GROUP BY time(1m) FILL(0)""")
    assert(rej.contains(""""error":"INTO does not support FILL""""), rej)
  }

  test("INTO :MEASUREMENT backref fans out over regex FROM, rp prefix namespaces") {
    val e = newEngine()
    e.write("dbbr",
      """cpu,host=a u=10 1735689540000000000
        |mem,host=a u=40 1735689545000000000
        |disk,host=a u=70 1735689550000000000""".stripMargin)
    val into = e.query("dbbr",
      """SELECT mean("u") INTO "agg".:MEASUREMENT FROM /^(cpu|mem)$/""" +
        """ WHERE time > now() - 5m GROUP BY time(1m)""")
    assert(into.contains("[[0,2]]"), into) // one bucket-row per source
    // each source landed in its own rp-prefixed target; disk untouched
    val ms = e.query("dbbr", "SHOW MEASUREMENTS")
    assert(ms.contains("agg.cpu") && ms.contains("agg.mem") && !ms.contains("agg.disk"), ms)
    val back = e.query("dbbr",
      """SELECT mean("mean") FROM "agg.cpu" WHERE time > now() - 5m GROUP BY time(1m)""")
    assert(back.contains("[1735689540000,10]"), back)
    // bare backref without FROM regex targets the same-named measurement
    val bare = e.query("dbbr",
      """SELECT mean("u") INTO :MEASUREMENT FROM "disk" WHERE time > now() - 5m GROUP BY time(1m)""")
    assert(bare.contains("[[0,1]]"), bare)
  }

  test("RESAMPLE CQ: EVERY throttles the tick, FOR recomputes late data in place") {
    var now = NowMs
    val root = Files.createTempDirectory("graft-engine").toString
    val e = new GraftEngine(spark, root, () => now)
    e.write("dbr", "cpu,host=a u=10 1735689540000000000") // 23:59:00
    assert(e.query("dbr",
      """CREATE CONTINUOUS QUERY "cq" ON "dbr" RESAMPLE EVERY 10m FOR 30m""" +
        """ BEGIN SELECT mean("u") INTO "cpu_1m" FROM "cpu" GROUP BY time(1m) END""")
      === Response0)
    assert(e.runContinuousQueries("dbr")("cq") === 1L)
    // EVERY 10m: an immediate second tick skips the CQ entirely
    assert(e.runContinuousQueries("dbr").isEmpty)
    // a LATE point lands in the already-written minute bucket
    e.write("dbr", "cpu,host=a u=30 1735689545000000000")
    now += 660000L // +11 min: past EVERY, bucket still inside FOR
    assert(e.runContinuousQueries("dbr")("cq") === 1L)
    // the bucket was recomputed IN PLACE: mean(10,30)=20, old row gone
    val res = e.query("dbr", """SELECT "mean" FROM "cpu_1m" WHERE time > now() - 30m""")
    assert(res.contains("[1735689540000,20]"), res)
    assert(!res.contains("[1735689540000,10]"), res)
    // RESAMPLE without EVERY/FOR is a parse error
    assert(graft.query.InfluxQlParser.parse(
      """CREATE CONTINUOUS QUERY "x" ON "d" RESAMPLE BEGIN SELECT mean("u") INTO "y" FROM "c" GROUP BY time(1m) END""").isLeft)
  }

  test("field arithmetic through the engine: agg math, raw pairing, math fns") {
    val e = newEngine()
    e.write("dbar",
      """m,host=a u=16 1735689540000000000
        |m,host=a u=4,v=3 1735689550000000000""".stripMargin)
    // mean(u) * 2 + 1 over one 1m bucket: mean(16,4)=10 -> 21
    val r1 = e.query("dbar",
      """SELECT mean("u") * 2 + 1 FROM "m" WHERE time > now() - 10m GROUP BY time(1m)""")
    assert(r1.contains("[1735689540000,21]"), r1)
    // raw field pairing: u+v exists only at the shared timestamp
    // (InfluxQL drops unpaired points)
    val r2 = e.query("dbar", """SELECT "u" + "v" FROM "m" WHERE time > now() - 10m""")
    assert(r2.contains("[1735689550000,7]") && !r2.contains("1735689540000"), r2)
    assert(r2.contains(""""columns":["time","u_v"]"""), r2)
    // math fn over an aggregate; alias names the output column
    val r3 = e.query("dbar",
      """SELECT sqrt(mean("u")) AS root FROM "m" WHERE time > now() - 10m GROUP BY time(1m)""")
    assert(r3.contains("[1735689540000,3.1622776601683795]") && r3.contains(""""columns":["time","root"]"""), r3)
    // division lexes as division (not regex) after a call
    val r4 = e.query("dbar",
      """SELECT mean("u") / 2 FROM "m" WHERE time > now() - 10m GROUP BY time(1m)""")
    assert(r4.contains("[1735689540000,5]"), r4)
  }

  test("WHERE field-value filter applies to raw points before aggregation") {
    val e = newEngine()
    e.write("dbfv",
      """m,host=a u=10 1735689540000000000
        |m,host=a u=80 1735689550000000000
        |m,host=a u=60 1735689555000000000""".stripMargin)
    // mean over points with u > 50 only: mean(80, 60) = 70
    val r = e.query("dbfv",
      """SELECT mean("u") FROM "m" WHERE time > now() - 10m AND "u" > 50 GROUP BY time(1m)""")
    assert(r.contains("[1735689540000,70]"), r)
    // cross-field filter: the condition names a DIFFERENT field — the
    // whole point drops when it fails (pairing on tagset + timestamp)
    e.write("dbfv",
      """m,host=a u=5,w=100 1735689560000000000
        |m,host=a u=7,w=1 1735689565000000000""".stripMargin)
    val crossed = e.query("dbfv",
      """SELECT mean("u") FROM "m" WHERE time > now() - 10m AND "w" > 50 GROUP BY time(1m)""")
    // only the w=100 point qualifies → mean(u) = 5
    assert(crossed.contains("[1735689540000,5]"), crossed)
    assert(!crossed.contains(",7]"), crossed)
    // a filter on a field that doesn't exist qualifies nothing → the
    // zero-series response shape
    val none = e.query("dbfv",
      """SELECT mean("u") FROM "m" WHERE time > now() - 10m AND "nope" > 50 GROUP BY time(1m)""")
    assert(!none.contains("values"), none)
  }

  test("transform directly over raw points: difference, derivative") {
    val e = newEngine()
    e.write("dbtr",
      """m,host=a u=10 1735689540000000000
        |m,host=a u=25 1735689550000000000
        |m,host=a u=20 1735689560000000000""".stripMargin)
    val d = e.query("dbtr",
      """SELECT difference("u") FROM "m" WHERE time > now() - 10m""")
    assert(d.contains("[1735689550000,15]") && d.contains("[1735689560000,-5]"), d)
    assert(d.contains(""""columns":["time","difference"]"""), d)
    // derivative per second: 15 over 10s -> 1.5
    val dv = e.query("dbtr",
      """SELECT derivative("u", 1s) FROM "m" WHERE time > now() - 10m""")
    assert(dv.contains("[1735689550000,1.5]"), dv)
    // bare-field transform under GROUP BY time errors explicitly
    val bad = e.query("dbtr",
      """SELECT difference("u") FROM "m" WHERE time > now() - 10m GROUP BY time(1m)""")
    assert(bad.contains(""""error""""), bad)
  }

  test("OR-group of tag predicates selects the union of matching series") {
    val e = newEngine()
    e.write("dbor",
      """m,host=a u=1 1735689540000000000
        |m,host=b u=2 1735689540000000000
        |m,host=c u=3 1735689540000000000""".stripMargin)
    val r = e.query("dbor",
      """SELECT mean("u") FROM "m" WHERE time > now() - 10m""" +
        """ AND ("host" = 'a' OR "host" = 'b') GROUP BY time(1m)""")
    assert(r.contains(""""tags":{"host":"a"}""") && r.contains(""""tags":{"host":"b"}"""), r)
    assert(!r.contains(""""host":"c""""), r)
  }

  test("DROP DATABASE removes storage and every db-keyed registration") {
    val e = newEngine()
    e.write("dbdrop", "cpu,host=a u=1 1735689540000000000")
    e.query("dbdrop",
      """CREATE RETENTION POLICY "keep1d" ON "dbdrop" DURATION 24h REPLICATION 1""")
    assert(e.query("dbdrop", "SHOW MEASUREMENTS").contains("cpu"))
    e.query("dbdrop", """DROP DATABASE "dbdrop"""")
    assert(!new java.io.File(e.root + "/dbdrop").exists())
    assert(!e.query("dbdrop", "SHOW MEASUREMENTS").contains("cpu"))
    assert(!e.query("dbdrop", "SHOW DATABASES").contains("dbdrop"))
    // policy registry cleared → fabricated static retention response again
    assert(!e.query("dbdrop", "SHOW RETENTION POLICIES ON \"dbdrop\"").contains("keep1d"))
  }

  test("DROP RETENTION POLICY unregisters; SHOW falls back to the static shape") {
    val e = newEngine()
    e.query("dbrp2", """CREATE RETENTION POLICY "p1" ON "dbrp2" DURATION 24h REPLICATION 1""")
    assert(e.query("dbrp2", "SHOW RETENTION POLICIES ON \"dbrp2\"").contains("p1"))
    e.query("dbrp2", """DROP RETENTION POLICY "p1" ON "dbrp2"""")
    assert(!e.query("dbrp2", "SHOW RETENTION POLICIES ON \"dbrp2\"").contains("p1"))
    // ALTER re-registers with the new duration
    e.query("dbrp2", """CREATE RETENTION POLICY "p2" ON "dbrp2" DURATION 24h REPLICATION 1""")
    e.query("dbrp2", """ALTER RETENTION POLICY "p2" ON "dbrp2" DURATION 48h""")
    assert(e.query("dbrp2", "SHOW RETENTION POLICIES ON \"dbrp2\"").contains("48h0m0s"))
  }

  test("maintenance tick: retention + compaction + CQs in one idempotent pass") {
    val e = newEngine()
    // three separate writes in one hour -> 3 files; plus an old hour that
    // a 24h retention policy must expire (NowMs is 2025-01-01)
    e.write("dbmt", "cpu,host=a u=1 1735689540000000000")
    e.write("dbmt", "cpu,host=a u=2 1735689541000000000")
    e.write("dbmt", "cpu,host=a u=9 1704067200000000000") // 2024-01-01, expired
    e.query("dbmt", """CREATE RETENTION POLICY "d1" ON "dbmt" DURATION 24h REPLICATION 1""")
    val res = e.maintenanceTick()
    assert(res.contains("dbmt"), res)
    assert(res("dbmt")._2 === 1, s"one multi-file partition compacts: $res")
    assert(!new java.io.File(
      e.root + "/dbmt/samples/measurement=cpu/hour=473352").exists(),
      "expired hour partition must be gone")
    // second tick: nothing left to do
    val again = e.maintenanceTick()
    assert(again("dbmt")._2 === 0, s"idempotent: $again")
  }

  test("compaction merges multi-file hour partitions; results and sort order survive") {
    val e = newEngine()
    // three separate writes → three parquet files in the same hour dir
    e.write("dbc", "cpu,host=a u=1 1735689540000000000")
    e.write("dbc", "cpu,host=a u=2 1735689541000000000")
    e.write("dbc", "cpu,host=b u=3 1735689542000000000")
    val before = e.query("dbc",
      """SELECT mean("u") FROM "cpu" WHERE time > now() - 10m GROUP BY time(1m)""")
    val hourDir = new java.io.File(
      e.root + "/dbc/samples/measurement=cpu/hour=482135")
    def parquets = hourDir.listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquets >= 3, s"expected one file per write, got $parquets")
    assert(e.compact("dbc", "cpu") === 1)
    assert(parquets === 1, "compaction must leave a single file")
    assert(e.compact("dbc", "cpu") === 0, "idempotent: nothing left to merge")
    val after = e.query("dbc",
      """SELECT mean("u") FROM "cpu" WHERE time > now() - 10m GROUP BY time(1m)""")
    assert(after === before, "compaction must not change query results")
  }

  test("z-order compaction: live layout serves time-window AND series reads; fp-clustering can't") {
    import org.apache.spark.sql.functions._
    val e = newEngine()
    // one hour (2024-12-31T23:00Z), 64 series × 60 minutes
    val baseMs = 1735686000000L
    val lines = (for (h <- 0 until 64; m <- 0 until 60)
      yield s"cpu,host=h$h u=${h + m} ${(baseMs + m * 60000L)}000000").mkString("\n")
    e.write("dbz", lines)
    val q = """SELECT mean("u") FROM "cpu" WHERE time >= '2024-12-31 23:00:00' AND time < '2025-01-01 00:00:00' GROUP BY time(10m)"""
    val before = e.query("dbz", q)
    val part = e.root + "/dbz/samples/measurement=cpu"

    // per-file zone maps (parquet footer min/max as any engine sees them)
    def zoneMaps() = spark.read.parquet(part)
      .groupBy(input_file_name().as("f"))
      .agg(min("fingerprint").as("fmn"), max("fingerprint").as("fmx"),
        min("timestamp_ms").as("tmn"), max("timestamp_ms").as("tmx"))
      .collect()
    // file bill of a predicate under zone-map skipping
    def billTime(lo: Long, hi: Long) =
      zoneMaps().count(r => r.getLong(3) <= hi && r.getLong(4) >= lo)
    def billSeries(fp: Long) =
      zoneMaps().count(r => r.getLong(1) <= fp && r.getLong(2) >= fp)
    val someFp = spark.read.parquet(part).select("fingerprint")
      .orderBy("fingerprint").collect().apply(1900).getLong(0)
    val win = (baseMs + 10 * 60000L, baseMs + 15 * 60000L) // 5-minute window

    assert(e.compactClustered("dbz", "cpu", files = 8, zorder = false) === 1)
    val sortedFiles = zoneMaps().length
    val (sortedTime, sortedSeries) = (billTime(win._1, win._2), billSeries(someFp))

    assert(e.compactClustered("dbz", "cpu", files = 8, zorder = true) === 1)
    assert(e.query("dbz", q) === before, "compaction must not change results")
    val zFiles = zoneMaps().length
    val (zTime, zSeries) = (billTime(win._1, win._2), billSeries(someFp))

    assert(sortedFiles === 8 && zFiles === 8, s"$sortedFiles/$zFiles files")
    // fingerprint clustering is blind to time: a 5-minute window bills
    // the whole hour; the Morton layout prunes it
    assert(sortedTime === 8, s"fp-clustered time bill: $sortedTime")
    assert(zTime < sortedTime, s"z-order time bill $zTime !< $sortedTime")
    // and stays within a small constant of the single-column layout on
    // ITS predicate (a range boundary may split one fingerprint across
    // two files, so the fp layout bills 1-2)
    assert(sortedSeries <= 2, s"fp-clustered series bill: $sortedSeries")
    assert(zSeries <= 4, s"z-order series bill: $zSeries")
  }

  test("SHOW SERIES WHERE tag filters series keys") {
    val e = newEngine()
    e.write("dbss",
      """cpu,host=a,region=eu u=1 1735689540000000000
        |cpu,host=b,region=eu u=2 1735689540000000000
        |cpu,host=a,region=us u=3 1735689540000000000""".stripMargin)
    val all = e.query("dbss", "SHOW SERIES")
    assert(all.contains("cpu,host=a,region=eu") && all.contains("cpu,host=b,region=eu"))
    val filtered = e.query("dbss", """SHOW SERIES WHERE "host" = 'a'""")
    assert(filtered.contains("cpu,host=a,region=eu") && filtered.contains("cpu,host=a,region=us"), filtered)
    assert(!filtered.contains("host=b"), filtered)
    val neq = e.query("dbss", """SHOW SERIES FROM "cpu" WHERE "region" != 'us'""")
    assert(neq.contains("region=eu") && !neq.contains("region=us"), neq)
    // SHOW TAG VALUES scoped by another tag: hosts active in region=us
    val tv = e.query("dbss",
      """SHOW TAG VALUES FROM "cpu" WITH KEY = "host" WHERE "region" = 'us'""")
    assert(tv.contains("""["host","a"]"""), tv)
    assert(!tv.contains("""["host","b"]"""), tv)
    // regex matcher in the SHOW WHERE (=~ /re/)
    val rx = e.query("dbss", """SHOW SERIES WHERE "region" =~ /^e/""")
    assert(rx.contains("region=eu") && !rx.contains("region=us"), rx)
  }

  test("SHOW MEASUREMENTS WITH MEASUREMENT =~ /re/ filters the listing") {
    val e = newEngine()
    e.write("dbrx",
      """cpu,host=a u=1 1735689540000000000
        |cpu_temp,host=a t=2 1735689540000000000
        |mem,host=a m=3 1735689540000000000""".stripMargin)
    val all = e.query("dbrx", "SHOW MEASUREMENTS")
    assert(all.contains("cpu") && all.contains("cpu_temp") && all.contains("mem"))
    val filtered = e.query("dbrx", "SHOW MEASUREMENTS WITH MEASUREMENT =~ /^cpu/")
    assert(filtered.contains("cpu") && filtered.contains("cpu_temp"), filtered)
    assert(!filtered.contains("mem"), filtered)
  }

  test("SHOW SHARDS lists hour partitions honestly; SHOW USERS is the empty mock") {
    val e = newEngine()
    // two measurements, cpu spanning two hour partitions
    e.write("dbsh",
      """cpu,host=a usage=1 1735689540000000000
        |cpu,host=a usage=2 1735693200000000000
        |mem,host=a used=3 1735689540000000000""".stripMargin)
    val sh = e.query("dbsh", "SHOW SHARDS")
    assert(sh.contains(""""name":"dbsh""""), sh)
    assert(sh.contains(""""columns":["id","database","retention_policy","shard_group","start_time","end_time","expiry_time","owners"]"""), sh)
    // 1735689540000 is in hour 482135, 1735693200000 opens hour 482137? no:
    // 1735693200000 / 3600000 = 482137.0 exactly → hour 482137
    assert(sh.contains("482135") && sh.contains(""""cpu""""), sh)
    assert(sh.contains("2024-12-31T23:00:00Z"), sh) // hour-482135 start
    val shardRows = "\"cpu\"|\"mem\"".r.findAllIn(sh).length
    assert(shardRows >= 3, s"expected cpu x2 + mem x1 shard rows: $sh")
    val us = e.query("dbsh", "SHOW USERS")
    assert(us.contains(""""columns":["user","admin"]"""), us)
    // honest stats: 2 measurements, 3 series (cpu/usage x2 hosts? -> usage
    // has host=a only twice across hours = 1 series; mem 1 series), 3 hour
    // partitions — assert the column shape and the partition count
    val st = e.query("dbsh", "SHOW STATS")
    assert(st.contains(""""columns":["measurements","series","hourPartitions","parquetFiles"]"""), st)
    assert(st.contains("""[2,2,3,"""), st) // 2 measurements, 2 series, 3 hour dirs
    val di = e.query("dbsh", "SHOW DIAGNOSTICS")
    assert(di.contains(""""sparkVersion""""), di)
    // DROP SHARD 482135 removes that hour across BOTH measurements (the
    // shard group spans the db); hour 482137 survives
    e.query("dbsh", "DROP SHARD 482135")
    val sh2 = e.query("dbsh", "SHOW SHARDS")
    assert(!sh2.contains("482135") && sh2.contains("482137"), sh2)
    // series metadata stays (shard removal is data expiry, not schema)
    assert(e.query("dbsh", "SHOW MEASUREMENTS").contains("mem"))
    // unknown id: silent no-op
    assert(e.query("dbsh", "DROP SHARD 999999") === Response0)
  }

  test("user registry: CREATE/DROP USER, GRANT/REVOKE, SHOW USERS/GRANTS round-trip") {
    val e = newEngine()
    assert(e.query("db0", "SHOW USERS").contains(""""columns":["user","admin"]"""))
    e.query("db0", "CREATE USER \"alice\" WITH PASSWORD 'pw' WITH ALL PRIVILEGES")
    e.query("db0", "CREATE USER \"bob\" WITH PASSWORD 'pw'")
    val us = e.query("db0", "SHOW USERS")
    assert(us.contains("""["alice",true]""") && us.contains("""["bob",false]"""), us)
    e.query("db0", "GRANT READ ON \"metrics\" TO \"bob\"")
    e.query("db0", "GRANT WRITE ON \"logs\" TO \"bob\"")
    val gr = e.query("db0", "SHOW GRANTS FOR \"bob\"")
    assert(gr.contains(""""columns":["database","privilege"]"""), gr)
    assert(gr.contains("""["logs","WRITE"]""") && gr.contains("""["metrics","READ"]"""), gr)
    e.query("db0", "REVOKE READ ON \"metrics\" FROM \"bob\"")
    assert(!e.query("db0", "SHOW GRANTS FOR \"bob\"").contains("metrics"))
    // cluster-wide GRANT ALL promotes to admin; REVOKE ALL demotes
    e.query("db0", "GRANT ALL PRIVILEGES TO \"bob\"")
    assert(e.query("db0", "SHOW USERS").contains("""["bob",true]"""))
    e.query("db0", "REVOKE ALL PRIVILEGES FROM \"bob\"")
    assert(e.query("db0", "SHOW USERS").contains("""["bob",false]"""))
    e.query("db0", "DROP USER \"bob\"")
    assert(!e.query("db0", "SHOW USERS").contains("bob"))
    // grammar guard: scoped privilege requires ON
    assert(e.query("db0", "GRANT READ TO \"alice\"; SELECT 1")
      .contains("error"))
  }

  test("measurement + hour partition pruning reaches the file scan") {
    val e = newEngine()
    e.write("dbp",
      """cpu,host=a usage=1 1735689540000000000
        |cpu,host=a usage=2 1735693200000000000
        |mem,host=a used=3 1735689540000000000""".stripMargin)
    val cat = e.catalog("dbp")
    val plan = cat.measurements("cpu")
      .filter(org.apache.spark.sql.functions.col("hour") === 482136L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"))
    assert(plan.contains("measurement"), "measurement predicate should prune partitions")
  }

  test("SHOW listings paginate with LIMIT/OFFSET") {
    val e = newEngine()
    e.write("dbl",
      """cpu,host=a usage=1 1735689540000000000
        |mem,host=a used=1 1735689540000000000
        |net,host=a rx=1 1735689540000000000""".stripMargin)
    val lim = e.query("dbl", "SHOW MEASUREMENTS LIMIT 2")
    assert(lim.contains("""["cpu"],["mem"]""") && !lim.contains("net"), lim)
    val off = e.query("dbl", "SHOW MEASUREMENTS LIMIT 2 OFFSET 2")
    assert(off.contains("net") && !off.contains("cpu"), off)
    val ser = e.query("dbl", "SHOW SERIES LIMIT 1 OFFSET 1")
    assert(ser.contains("mem,host=a") && !ser.contains("cpu"), ser)
    // LIMIT on a non-listing SHOW is a parse error inside a batch
    val bad = e.query("dbl", "SHOW STATS LIMIT 2; SHOW DATABASES")
    assert(bad.contains("error"), bad)
  }

  test("line-protocol export round-trips: re-ingest reproduces samples + fingerprints") {
    val e = newEngine()
    // escapes in tag values, a string field with quote + backslash, a
    // float field, negative + scientific-notation values
    e.write("dbx",
      """cpu,host=a\ b,path=c\,d usage=10.5 1735689540000000000
        |cpu,host=a\ b,path=c\,d usage=-2.25 1735689550000000000
        |cpu,host=e\=f note="say \"hi\" \\ bye" 1735689540000000000
        |cpu,host=g tiny=0.0000001 1735689560000000000""".stripMargin)
    val lines = e.exportLineProtocol("dbx", "cpu")
      .collect().map(_.getString(0)).sorted
    assert(lines.length === 4, lines.mkString("\n"))
    val e2 = newEngine()
    e2.write("dbx", lines.mkString("\n"))
    def snapshot(en: GraftEngine) = en.catalog("dbx").measurements("cpu")
      .select("fingerprint", "timestamp_ms", "value", "string", "message")
      .collect().map(_.toSeq).toSet
    assert(snapshot(e2) === snapshot(e))
    // export of a measurement with no data is empty, not an error
    assert(e.exportLineProtocol("dbx", "cpu").count() === 4)
  }

  test("concurrent writers on separate dbs with interleaved readers stay isolated") {
    // the engine's shared state is all TrieMap-keyed by db (plus the two
    // per-db relation caches); concurrent clients on DIFFERENT dbs must
    // never observe each other's rows or corrupt each other's indexes.
    // (Same-db write∥read is a documented non-goal: parquet appends and
    // in-flight file listings race at the storage layer, as they do in
    // any file-backed store without snapshot isolation.)
    val e = newEngine()
    val dbs = (0 until 4).map(i => s"cdb$i")
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = dbs.zipWithIndex.map { case (db, i) =>
      new Thread(() => {
        try {
          (0 until 3).foreach { b =>
            e.write(db, (0 until 10).map(k =>
              s"m$i,host=h$i v=${i * 100 + b * 10 + k}.0 ${1735689600000000000L + b * 1000000000L + k * 1000000L}")
              .mkString("\n"))
            // interleaved read on own db between writes
            val j = e.query(db, s"""SELECT count("v") FROM "m$i"""")
            assert(j.contains(""""results""""), j)
          }
        } catch { case t: Throwable => errs.add(t) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    assert(errs.isEmpty, s"concurrent failures: ${errs.size}: ${Option(errs.peek()).map(_.toString)}")
    // every db sees exactly its own 30 rows, and only its own measurement
    dbs.zipWithIndex.foreach { case (db, i) =>
      val cat = e.catalog(db)
      assert(cat.measurements.keySet === Set(s"m$i"), db)
      assert(cat.measurements(s"m$i").count() === 30L, db)
    }
  }
}
