package graft

import graft.query.{Ast, InfluxQlParser}
import org.scalatest.funsuite.AnyFunSuite

class InfluxQlParserSpec extends AnyFunSuite {

  private def parseOk(q: String): Ast.Statement =
    InfluxQlParser.parse(q).fold(e => fail(s"parse failed for <$q>: $e"), identity)

  test("flagship SELECT with now()-relative range, tag filter, group by time") {
    val s = parseOk("""SELECT mean("usage_user") FROM "telegraf"."autogen"."cpu" """ +
      """WHERE time > now() - 1h AND "host"='h1' GROUP BY time(1m)""").asInstanceOf[Ast.Select]
    assert(s.fields == Seq(Ast.Field(Some("mean"), "usage_user", None)))
    assert(s.from == Ast.TableRef(Some("telegraf"), Some("autogen"), "cpu"))
    assert(s.time == Ast.TimeBounds(Some(Ast.NowMinus(3600000L)), None, lowerStrict = true))
    assert(s.tagFilters == Seq(Ast.TagFilter("host", "=", "h1")))
    assert(s.groupByTimeMs.contains(60000L))
  }

  test("multi-metric SELECT with absolute ns range") {
    val s = parseOk("""SELECT mean("usage_user"), mean("usage_system") FROM "cpu" """ +
      """WHERE time > 1545424651000000000 AND time < 1545428251000000000""").asInstanceOf[Ast.Select]
    assert(s.fields.map(_.name) == Seq("usage_user", "usage_system"))
    assert(s.time == Ast.TimeBounds(
      Some(Ast.AbsoluteNs(1545424651000000000L)), Some(Ast.AbsoluteNs(1545428251000000000L)),
      lowerStrict = true, upperStrict = true))
  }

  test("SELECT with string datetime range") {
    val s = parseOk("""SELECT mean("used_percent") FROM "mem" """ +
      """WHERE time > '2018-12-21 00:00:00' AND time < '2018-12-22 00:00:00'""").asInstanceOf[Ast.Select]
    assert(s.time == Ast.TimeBounds(
      Some(Ast.DateString("2018-12-21 00:00:00")), Some(Ast.DateString("2018-12-22 00:00:00")),
      lowerStrict = true, upperStrict = true))
  }

  test("SELECT honors aggregate dispatch, alias, limit, fill") {
    val s = parseOk("""SELECT sum("value") AS total FROM "events" """ +
      """WHERE time > now() - 5m GROUP BY time(30s) FILL(null) LIMIT 10""").asInstanceOf[Ast.Select]
    assert(s.fields == Seq(Ast.Field(Some("sum"), "value", Some("total"))))
    assert(s.groupByTimeMs.contains(30000L))
    assert(s.fill.contains("null"))
    assert(s.limit.contains(10))
  }

  test("SELECT extensions: regex FROM, OFFSET, SLIMIT/SOFFSET, star field") {
    val s = parseOk("""SELECT "value" FROM /^cpu.*/ WHERE time > now() - 5m """ +
      """LIMIT 10 OFFSET 20 SLIMIT 2 SOFFSET 1""").asInstanceOf[Ast.Select]
    assert(s.from.regex.contains("^cpu.*"))
    assert(s.fields == Seq(Ast.Field(None, "value", None)))
    assert(s.limit.contains(10) && s.offset.contains(20))
    assert(s.slimit.contains(2) && s.soffset.contains(1))
    val star = parseOk("""SELECT mean(*) FROM "events" GROUP BY time(1h)""").asInstanceOf[Ast.Select]
    assert(star.fields == Seq(Ast.Field(Some("mean"), "*", None)))
    val rawStar = parseOk("""SELECT * FROM "events"""").asInstanceOf[Ast.Select]
    assert(rawStar.fields == Seq(Ast.Field(None, "*", None)))
    // escaped slash inside the regex literal
    val esc = parseOk("""SELECT mean("v") FROM /a\/b/ WHERE time > now() - 5m""").asInstanceOf[Ast.Select]
    assert(esc.from.regex.contains("a/b"))
  }

  test("parser is total: arbitrary input returns Either, never throws") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // random garbage + mutated fragments of real queries
    val fragments = Seq("SELECT", "FROM", "WHERE", "time", ">", "now()", "-",
      "GROUP BY", "time(1h, 30m)", "FILL(linear)", "\"cpu\"", "/re/", "'str",
      "mean(", "LIMIT", "9999999999999999999999", "1.5", ";", "=~", "!~",
      "top(\"v\",", "DELETE", "DROP MEASUREMENT", "(SELECT", "::", "..", "\\")
    val gen = Gen.oneOf(
      Gen.listOf(Gen.oneOf(fragments)).map(_.mkString(" ")),
      Gen.asciiPrintableStr,
      Gen.listOf(Gen.oneOf(Gen.asciiPrintableStr, Gen.oneOf(fragments))).map(_.mkString(" ")))
    (0 until 500).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(7L + i)).foreach { q =>
        InfluxQlParser.parseAll(q) // must return, not throw
        InfluxQlParser.parse(q)
      }
    }
  }

  test("GROUP BY time with offset; multi-statement parseAll") {
    val s = parseOk("""SELECT mean("v") FROM "cpu" GROUP BY time(1h, 30m)""").asInstanceOf[Ast.Select]
    assert(s.groupByTimeMs.contains(3600000L) && s.groupByTimeOffsetMs == 1800000L)
    val all = InfluxQlParser.parseAll("""SHOW DATABASES; SHOW MEASUREMENTS;""")
    assert(all == Right(Seq(Ast.ShowDatabases, Ast.ShowMeasurements(None))))
    assert(InfluxQlParser.parse("SHOW DATABASES; SHOW MEASUREMENTS").isLeft)
  }

  test("tag filter operators: !=, =~, !~") {
    val s = parseOk("""SELECT mean("v") FROM "cpu" WHERE time > now() - 5m """ +
      """AND "host" != 'h1' AND "region" =~ /^eu-/ AND "dc" !~ /test$/""")
      .asInstanceOf[Ast.Select]
    assert(s.tagFilters == Seq(
      Ast.TagFilter("host", "!=", "h1"),
      Ast.TagFilter("region", "=~", "^eu-"),
      Ast.TagFilter("dc", "!~", "test$")))
  }

  test("function-of-function: transform(agg(field), arg) parses") {
    val d = parseOk("""SELECT derivative(mean("value"), 1s) FROM "cpu" WHERE time > now() - 1h GROUP BY time(1m)""")
      .asInstanceOf[Ast.Select]
    assert(d.fields == Seq(Ast.Field(Some("mean"), "value", None,
      transform = Some(Ast.Transform("derivative", Some(1000L), None)))))
    val m = parseOk("""SELECT moving_average(sum("v"), 5) AS ma FROM "cpu"""").asInstanceOf[Ast.Select]
    assert(m.fields == Seq(Ast.Field(Some("sum"), "v", Some("ma"),
      transform = Some(Ast.Transform("moving_average", None, Some(5))))))
    val c = parseOk("""SELECT cumulative_sum(mean("v")) FROM "cpu"""").asInstanceOf[Ast.Select]
    assert(c.fields.head.transform.contains(Ast.Transform("cumulative_sum")))
    val hw = parseOk("""SELECT holt_winters(mean("v"), 4) FROM "cpu" GROUP BY time(1h)""")
      .asInstanceOf[Ast.Select]
    assert(hw.fields.head.transform.contains(Ast.Transform("holt_winters", None, Some(4))))
    val hwf = parseOk("""SELECT holt_winters_with_fit(mean("v"), 4) FROM "cpu" GROUP BY time(1h)""")
      .asInstanceOf[Ast.Select]
    assert(hwf.fields.head.transform.contains(Ast.Transform("holt_winters_with_fit", None, Some(4))))
    // INTO :MEASUREMENT backref, bare and rp-/db-prefixed
    val br = parseOk("""SELECT mean("v") INTO :MEASUREMENT FROM /cpu.*/ GROUP BY time(1m)""")
      .asInstanceOf[Ast.Select]
    assert(br.into.contains(Ast.TableRef(None, None, ":MEASUREMENT")))
    val brp = parseOk("""SELECT mean("v") INTO "rp".:MEASUREMENT FROM "m" GROUP BY time(1m)""")
      .asInstanceOf[Ast.Select]
    assert(brp.into.contains(Ast.TableRef(None, Some("rp"), ":MEASUREMENT")))
    assert(InfluxQlParser.parse("""SELECT mean("v") INTO :SERIES FROM "m"""").isLeft)
    // unsupported outer function is a parse error, not a silent drop
    assert(InfluxQlParser.parse("""SELECT chande_momentum(mean("v"), 10) FROM "cpu"""").isLeft)
  }

  test("FROM (SELECT …) subquery parses recursively") {
    val s = parseOk("""SELECT max("mean") FROM (SELECT mean("v") FROM "cpu" """ +
      """WHERE time > now() - 1h GROUP BY time(1m)) WHERE time > now() - 1h GROUP BY time(10m)""")
      .asInstanceOf[Ast.Select]
    assert(s.fromSub.isDefined)
    assert(s.from.measurement == "cpu") // outer mirrors the innermost ref
    assert(s.fields == Seq(Ast.Field(Some("max"), "mean", None)))
    val inner = s.fromSub.get
    assert(inner.fields == Seq(Ast.Field(Some("mean"), "v", None)))
    assert(inner.groupByTimeMs.contains(60000L) && s.groupByTimeMs.contains(600000L))
    // two levels deep
    val s2 = parseOk("""SELECT mean("max") FROM (SELECT max("mean") FROM """ +
      """(SELECT mean("v") FROM "cpu" GROUP BY time(1m)) GROUP BY time(5m)) GROUP BY time(10m)""")
      .asInstanceOf[Ast.Select]
    assert(s2.fromSub.get.fromSub.isDefined)
  }

  test("SELECT with time < now() upper bound (stripped by reference, honored here)") {
    val s = parseOk("""SELECT mean("v") FROM "m" WHERE time > now() - 5m AND time < now()""")
      .asInstanceOf[Ast.Select]
    assert(s.time == Ast.TimeBounds(Some(Ast.NowMinus(300000L)), Some(Ast.Now), lowerStrict = true, upperStrict = true))
  }

  test("SHOW statements (dispatch table of cflux.js:395-852)") {
    assert(parseOk("SHOW DATABASES") == Ast.ShowDatabases)
    assert(parseOk("SHOW MEASUREMENTS") == Ast.ShowMeasurements(None))
    assert(parseOk("""SHOW RETENTION POLICIES ON "telegraf"""") ==
      Ast.ShowRetentionPolicies(Some("telegraf")))
    assert(parseOk("""SHOW FIELD KEYS FROM "telegraf"."autogen"."cpu"""") ==
      Ast.ShowFieldKeys(Some(Ast.TableRef(Some("telegraf"), Some("autogen"), "cpu"))))
    assert(parseOk("""SHOW TAG KEYS FROM "cpu"""") ==
      Ast.ShowTagKeys(Some(Ast.TableRef(None, None, "cpu"))))
    assert(parseOk("""SHOW TAG VALUES FROM "cpu" WITH KEY IN ("host","cpu")""") ==
      Ast.ShowTagValues(Some(Ast.TableRef(None, None, "cpu")), Seq("host", "cpu")))
    assert(parseOk("""SHOW TAG VALUES FROM "cpu" WITH KEY = "host"""") ==
      Ast.ShowTagValues(Some(Ast.TableRef(None, None, "cpu")), Seq("host")))
    assert(parseOk("""SHOW TAG VALUES FROM "cpu" WITH KEY =~ /^h/""") ==
      Ast.ShowTagValues(Some(Ast.TableRef(None, None, "cpu")), Nil, Some("^h")))
    assert(parseOk("SHOW SUBSCRIPTIONS") == Ast.ShowSubscriptions)
  }

  test("CREATE statements") {
    assert(parseOk("""CREATE DATABASE "fixtures"""") == Ast.CreateDatabase("fixtures"))
    assert(parseOk("""CREATE DATABASE "d" WITH DURATION 3d REPLICATION 1 SHARD DURATION 1h NAME "rp"""")
      === Ast.CreateDatabase("d", Some(3L * 86400000L), Some("rp")))
    assert(parseOk("""CREATE DATABASE "d" WITH NAME "rp"""")
      === Ast.CreateDatabase("d", None, Some("rp")))
    assert(InfluxQlParser.parse("""CREATE DATABASE "d" WITH""").isLeft)
    assert(parseOk("""CREATE SUBSCRIPTION "sub1" ON "telegraf"."autogen" DESTINATIONS ANY 'http://localhost:9092'""") ==
      Ast.CreateSubscription("sub1", "telegraf", "autogen", "http://localhost:9092"))
  }

  test("review fixes: trailing clauses, GROUP BY *, epoch suffixes, ORDER BY") {
    // silent-drop is gone: unconsumed tokens are a parse error
    assert(InfluxQlParser.parse(
      """SELECT mean("v") FROM "m" WHERE "a"='x' OR "b"='y'""").isLeft)
    // GROUP BY * = all tags = default per-series grouping (Grafana shape)
    val star = parseOk("""SELECT mean("v") FROM "m" WHERE time > now() - 1h GROUP BY time(1m), *""")
      .asInstanceOf[Ast.Select]
    assert(star.groupByTags.isEmpty && star.groupByTimeMs.contains(60000L))
    // epoch-with-unit literal converts via the unit; ambiguous units error
    val es = parseOk("""SELECT mean("v") FROM "m" WHERE time > 1545424651s""")
      .asInstanceOf[Ast.Select]
    assert(es.time.lower.contains(Ast.AbsoluteNs(1545424651000000000L)))
    assert(InfluxQlParser.parse("""SELECT mean("v") FROM "m" WHERE time > 123m""").isLeft)
    // ORDER BY time DESC honored; huge LIMIT is an error not a crash
    val od = parseOk("""SELECT mean("v") FROM "m" WHERE time > now() - 1h ORDER BY time DESC LIMIT 5""")
      .asInstanceOf[Ast.Select]
    assert(od.orderDesc && od.limit.contains(5))
    assert(InfluxQlParser.parse("""SELECT mean("v") FROM "m" LIMIT 99999999999999""").isLeft)
  }

  test("unsupported statements degrade to Unsupported, not error") {
    assert(parseOk("DROP SHARD 3") === Ast.DropShard(3L))
    assert(InfluxQlParser.parse("DROP SHARD x").isLeft)
    assert(parseOk("DROP STATS FOR 'x'").isInstanceOf[Ast.Unsupported])
  }

  test("SHOW QUERIES and KILL QUERY parse; retention policy parses") {
    assert(parseOk("SHOW QUERIES") === Ast.ShowQueries)
    assert(parseOk("KILL QUERY 42") === Ast.KillQuery(42L))
    assert(parseOk("SHOW SHARDS") === Ast.ShowShards)
    assert(parseOk("SHOW USERS") === Ast.ShowUsers)
    assert(parseOk("CREATE USER \"u\" WITH PASSWORD 'p'") === Ast.CreateUser("u", admin = false))
    assert(parseOk("CREATE USER \"u\" WITH PASSWORD 'p' WITH ALL PRIVILEGES")
      === Ast.CreateUser("u", admin = true))
    assert(parseOk("""DROP USER "u"""") === Ast.DropUser("u"))
    assert(parseOk("""GRANT READ ON "d" TO "u"""") === Ast.Grant("READ", Some("d"), "u"))
    assert(parseOk("""GRANT ALL TO "u"""") === Ast.Grant("ALL PRIVILEGES", None, "u"))
    assert(parseOk("""REVOKE WRITE ON "d" FROM "u"""") === Ast.Revoke("WRITE", Some("d"), "u"))
    assert(InfluxQlParser.parse("""GRANT READ TO "u"""").isLeft) // scoped needs ON
    assert(parseOk("""SHOW GRANTS FOR "u"""") === Ast.ShowGrants("u"))
    assert(parseOk("SHOW STATS") === Ast.ShowStats)
    assert(parseOk("SHOW DIAGNOSTICS") === Ast.ShowDiagnostics)
    assert(parseOk("""DROP DATABASE "d"""") === Ast.DropDatabase("d"))
    assert(parseOk("""DROP RETENTION POLICY "p" ON "d"""") === Ast.DropRetentionPolicy("p", "d"))
    assert(parseOk("""ALTER RETENTION POLICY "p" ON "d" DURATION 1h REPLICATION 1 DEFAULT""")
      === Ast.AlterRetentionPolicy("p", "d", 3600000L, default = true))
    parseOk("""CREATE RETENTION POLICY "d" ON "db" DURATION 24h REPLICATION 1 DEFAULT""") match {
      case Ast.CreateRetentionPolicy("d", "db", dur, true) =>
        assert(dur === 86400000L)
      case other => fail(s"bad parse: $other")
    }
  }

  test("multi-measurement FROM parses into fromMulti") {
    val s = parseOk("""SELECT mean("u") FROM "cpu", "mem", "disk" WHERE time > now() - 1h""")
      .asInstanceOf[Ast.Select]
    assert(s.from.measurement === "cpu")
    assert(s.fromMulti.map(_.measurement) === Seq("mem", "disk"))
  }

  test("DROP SERIES parses: scoped, filtered, bare") {
    parseOk("""DROP SERIES FROM "cpu" WHERE "host" = 'a' AND "dc" != 'x'""") match {
      case Ast.DropSeries(Some(ref), fs) =>
        assert(ref.measurement === "cpu")
        assert(fs === Seq(Ast.TagFilter("host", "=", "a"), Ast.TagFilter("dc", "!=", "x")))
      case other => fail(s"bad parse: $other")
    }
    assert(parseOk("DROP SERIES FROM cpu") === Ast.DropSeries(
      Some(Ast.TableRef(None, None, "cpu")), Nil))
    assert(parseOk("""DROP SERIES WHERE "host" = 'a'""") ===
      Ast.DropSeries(None, Seq(Ast.TagFilter("host", "=", "a"))))
  }

  test("field arithmetic: precedence, parens, derived names, alias") {
    val a = parseOk("""SELECT mean("u") * 2 + 1 FROM "m" WHERE time > now() - 1h GROUP BY time(1m)""")
      .asInstanceOf[Ast.Select]
    val f = a.fields.head
    assert(f.name === "mean" && f.expr.isDefined)
    f.expr.get match {
      case Ast.FBin("+", Ast.FBin("*", Ast.FLeaf(lf), Ast.FNum(2.0)), Ast.FNum(1.0)) =>
        assert(lf.func.contains("mean") && lf.name === "u")
      case other => fail(s"bad tree $other")
    }
    val b = parseOk("""SELECT "a" + "b" FROM "m" WHERE time > now() - 1h""")
      .asInstanceOf[Ast.Select]
    assert(b.fields.head.name === "a_b")
    val c = parseOk("""SELECT ("a" + "b") / 2 AS half FROM "m" WHERE time > now() - 1h""")
      .asInstanceOf[Ast.Select]
    assert(c.fields.head.alias.contains("half"))
    // * / binds tighter than + -
    val d = parseOk("""SELECT "a" + "b" * 3 FROM "m" WHERE time > now() - 1h""")
      .asInstanceOf[Ast.Select].fields.head.expr.get
    d match {
      case Ast.FBin("+", Ast.FLeaf(_), Ast.FBin("*", Ast.FLeaf(_), Ast.FNum(3.0))) =>
      case other => fail(s"precedence wrong: $other")
    }
  }

  test("math functions parse; pow needs exponent; * banned in arithmetic") {
    val a = parseOk("""SELECT sqrt(mean("u")) FROM "m" WHERE time > now() - 1h GROUP BY time(1m)""")
      .asInstanceOf[Ast.Select].fields.head
    assert(a.name === "sqrt")
    a.expr.get match {
      case Ast.FMath("sqrt", Ast.FLeaf(lf), None) => assert(lf.func.contains("mean"))
      case other                                  => fail(s"bad $other")
    }
    val pw = parseOk("""SELECT pow("u", 2) FROM "m" WHERE time > now() - 1h""")
      .asInstanceOf[Ast.Select].fields.head
    assert(pw.expr.get === Ast.FMath("pow", Ast.FLeaf(Ast.Field(None, "u", None)), Some(2.0)))
    assert(InfluxQlParser.parse("""SELECT pow("u") FROM "m"""").isLeft)
    assert(InfluxQlParser.parse("""SELECT * + 1 FROM "m"""").isLeft)
    // trig family; atan2 needs its divisor, sin rejects a second arg
    val tg = parseOk("""SELECT atan2(mean("u"), 30) FROM "m" WHERE time > now() - 1h""")
      .asInstanceOf[Ast.Select].fields.head
    assert(tg.expr.get match {
      case Ast.FMath("atan2", _, Some(30.0)) => true; case _ => false
    })
    assert(parseOk("""SELECT sin(mean("u")) FROM "m" WHERE time > now() - 1h""")
      .asInstanceOf[Ast.Select].fields.head.name === "sin")
    assert(InfluxQlParser.parse("""SELECT atan2(mean("u")) FROM "m"""").isLeft)
    assert(InfluxQlParser.parse("""SELECT sin(mean("u"), 2) FROM "m"""").isLeft)
    // binary log: log(field, base) accepted, log(field) rejected
    val lg = parseOk("""SELECT log("u", 2) FROM "m" WHERE time > now() - 1h""")
      .asInstanceOf[Ast.Select].fields.head
    assert(lg.expr.get === Ast.FMath("log", Ast.FLeaf(Ast.Field(None, "u", None)), Some(2.0)))
    assert(InfluxQlParser.parse("""SELECT log("u") FROM "m"""").isLeft)
    // FILL numeric (incl. negative) and none parse through
    assert(parseOk("""SELECT mean("u") FROM "m" WHERE time > now() - 1h GROUP BY time(1m) FILL(-5)""")
      .asInstanceOf[Ast.Select].fill.contains("-5"))
    assert(parseOk("""SELECT mean("u") FROM "m" WHERE time > now() - 1h GROUP BY time(1m) FILL(none)""")
      .asInstanceOf[Ast.Select].fill.contains("none"))
    assert(InfluxQlParser.parse(
      """SELECT derivative(mean("u"), 1s) + 1 FROM "m" GROUP BY time(1m)""").isLeft)
  }

  test("WHERE field-value conjuncts: numeric RHS is a field filter") {
    val a = parseOk(
      """SELECT mean("v") FROM "m" WHERE time > now() - 1h AND "v" > 50 AND "host" = 'a'""")
      .asInstanceOf[Ast.Select]
    assert(a.fieldFilters === Seq(Ast.FieldFilter("v", ">", 50.0)))
    assert(a.tagFilters === Seq(Ast.TagFilter("host", "=", "a")))
    // numeric equality is a FIELD comparison (tag values are strings)
    val b = parseOk("""SELECT "v" FROM "m" WHERE time > now() - 1h AND "v" = 3""")
      .asInstanceOf[Ast.Select]
    assert(b.fieldFilters === Seq(Ast.FieldFilter("v", "=", 3.0)))
    // negative literals
    val c = parseOk("""SELECT "v" FROM "m" WHERE time > now() - 1h AND "v" <= -1.5""")
      .asInstanceOf[Ast.Select]
    assert(c.fieldFilters === Seq(Ast.FieldFilter("v", "<=", -1.5)))
    // DELETE still rejects non-time predicates
    assert(InfluxQlParser.parse("""DELETE FROM "m" WHERE "v" > 1""").isLeft)
  }

  test("parenthesized OR-groups of tag predicates") {
    val a = parseOk("""SELECT mean("v") FROM "m" WHERE time > now() - 1h""" +
      """ AND ("host" = 'a' OR "host" = 'b') AND "region" = 'eu'""")
      .asInstanceOf[Ast.Select]
    assert(a.tagOrGroups === Seq(Seq(
      Ast.TagFilter("host", "=", "a"), Ast.TagFilter("host", "=", "b"))))
    assert(a.tagFilters === Seq(Ast.TagFilter("region", "=", "eu")))
    // single-element group collapses to a plain conjunct
    val b = parseOk("""SELECT "v" FROM "m" WHERE ("host" = 'a') AND time > now() - 1h""")
      .asInstanceOf[Ast.Select]
    assert(b.tagOrGroups.isEmpty && b.tagFilters === Seq(Ast.TagFilter("host", "=", "a")))
    // time/field predicates are rejected inside a group, explicitly
    assert(InfluxQlParser.parse(
      """SELECT "v" FROM "m" WHERE (time > now() OR "host" = 'a')""").isLeft)
    assert(InfluxQlParser.parse(
      """SELECT "v" FROM "m" WHERE ("v" > 1 OR "host" = 'a')""").isLeft)
  }

  test("'/' lexes as division after values, as regex after keywords") {
    val d = parseOk("""SELECT mean("u") / 2 FROM "m" WHERE time > now() - 1h""")
      .asInstanceOf[Ast.Select].fields.head
    d.expr.get match {
      case Ast.FBin("/", Ast.FLeaf(_), Ast.FNum(2.0)) =>
      case other => fail(s"bad division parse: $other")
    }
    val r = parseOk("""SELECT mean("u") FROM /cpu.*/ WHERE time > now() - 1h""")
      .asInstanceOf[Ast.Select]
    assert(r.from.regex.contains("cpu.*"))
    val t = parseOk("""SELECT mean("u") FROM "m" WHERE time > now() - 1h AND "host" =~ /web-\d+/""")
      .asInstanceOf[Ast.Select]
    assert(t.tagFilters.head.op === "=~")
    // field/field division
    val ff = parseOk("""SELECT "a" / "b" FROM "m" WHERE time > now() - 1h""")
      .asInstanceOf[Ast.Select].fields.head
    assert(ff.name === "a_b")
  }

  test("tz clause and SHOW TAG VALUES CARDINALITY parse") {
    val s = parseOk(
      """SELECT mean("v") FROM "m" WHERE time > now() - 1h GROUP BY time(1d) tz('America/Chicago')""")
      .asInstanceOf[Ast.Select]
    assert(s.tz.contains("America/Chicago"))
    assert(s.groupByTimeMs.contains(86400000L))
    parseOk("""SHOW TAG VALUES EXACT CARDINALITY FROM "m" WITH KEY = "host"""") match {
      case Ast.ShowTagValuesCardinality(Some(ref), Seq("host")) =>
        assert(ref.measurement === "m")
      case other => fail(s"bad parse: $other")
    }
  }

  test("sample selector and exponential_moving_average transform parse") {
    val s = parseOk("""SELECT sample("value", 4) FROM "m" WHERE time > now() - 1h""")
      .asInstanceOf[Ast.Select].fields.head
    assert(s.func.contains("sample") && s.arg.contains(4.0))
    val cd = parseOk("""SELECT count(distinct("v")) FROM "m" WHERE time > now() - 1h""")
      .asInstanceOf[Ast.Select].fields.head
    assert(cd.func.contains("count_distinct") && cd.name === "v")
    // only distinct() nests inside count
    assert(InfluxQlParser.parse("""SELECT count(mean("v")) FROM "m"""").isLeft)
    val e = parseOk(
      """SELECT exponential_moving_average(mean("v"), 3) FROM "m" WHERE time > now() - 1h GROUP BY time(1m)""")
      .asInstanceOf[Ast.Select].fields.head
    assert(e.func.contains("mean"))
    assert(e.transform.exists(t => t.fn == "exponential_moving_average" && t.n.contains(3)))
  }

  test("dema / cmo / non_negative_difference transforms parse") {
    val d = parseOk(
      """SELECT double_exponential_moving_average(mean("v"), 3) FROM "m" GROUP BY time(1m)""")
      .asInstanceOf[Ast.Select].fields.head
    assert(d.transform.exists(t => t.fn == "double_exponential_moving_average" && t.n.contains(3)))
    val c = parseOk(
      """SELECT chande_momentum_oscillator(mean("v"), 4) FROM "m" GROUP BY time(1m)""")
      .asInstanceOf[Ast.Select].fields.head
    assert(c.transform.exists(t => t.fn == "chande_momentum_oscillator" && t.n.contains(4)))
    val nn = parseOk(
      """SELECT non_negative_difference(mean("v")) FROM "m" GROUP BY time(1m)""")
      .asInstanceOf[Ast.Select].fields.head
    assert(nn.transform.exists(t => t.fn == "non_negative_difference" && t.n.isEmpty))
    val ker = parseOk(
      """SELECT kaufmans_efficiency_ratio(mean("v"), 4) FROM "m" GROUP BY time(1m)""")
      .asInstanceOf[Ast.Select].fields.head
    assert(ker.transform.exists(t => t.fn == "kaufmans_efficiency_ratio" && t.n.contains(4)))
    // 3-arg selector form: per-tag-value extremes
    val tt = parseOk("""SELECT top("v", "host", 3) FROM "m" WHERE time > now() - 1h""")
      .asInstanceOf[Ast.Select].fields.head
    assert(tt.func.contains("top") && tt.selTag.contains("host") && tt.arg.contains(3.0))
    // tag arg is only valid on top/bottom
    assert(InfluxQlParser.parse("""SELECT mean("v", "host", 3) FROM "m"""").isLeft)
    // regex field projection
    val rf = parseOk("""SELECT /^usage/ FROM "m" WHERE time > now() - 1h""")
      .asInstanceOf[Ast.Select].fields.head
    assert(rf.nameRegex.contains("^usage") && rf.func.isEmpty)
    // raw-field form parses too
    val raw = parseOk("""SELECT non_negative_difference("v") FROM "m"""")
      .asInstanceOf[Ast.Select].fields.head
    assert(raw.func.isEmpty && raw.transform.exists(_.fn == "non_negative_difference"))
  }

  test("::field / ::tag casts: namespace assertions and vetoes") {
    // ::field on projection leaves and aggregate args is a no-op
    val s1 = parseOk(
      """SELECT mean("usage"::field) FROM "cpu" WHERE "host"::tag = 'a' GROUP BY time(1m), "host"::tag""")
      .asInstanceOf[Ast.Select]
    assert(s1.fields.head.func.contains("mean") && s1.fields.head.name == "usage")
    assert(s1.tagFilters == Seq(Ast.TagFilter("host", "=", "a")))
    assert(s1.groupByTags == Seq("host"))
    val s2 = parseOk("""SELECT "usage"::field FROM "cpu"""").asInstanceOf[Ast.Select]
    assert(s2.fields.head.name == "usage" && s2.fields.head.func.isEmpty)
    // ::field on a string comparison vetoes the tag-filter inference
    assert(InfluxQlParser.parse("""SELECT mean("v") FROM "m" WHERE "x"::field = 'a'""").isLeft)
    // ::tag cannot compare to a number
    assert(InfluxQlParser.parse("""SELECT mean("v") FROM "m" WHERE "x"::tag > 5""").isLeft)
    // ::tag is not projectable; GROUP BY rejects ::field
    assert(InfluxQlParser.parse("""SELECT "host"::tag FROM "m"""").isLeft)
    assert(InfluxQlParser.parse("""SELECT mean("v") FROM "m" GROUP BY "v"::field""").isLeft)
    assert(InfluxQlParser.parse("""SELECT mean("v"::tag) FROM "m"""").isLeft)
    // numeric WHERE with ::field stays a field filter
    val s3 = parseOk("""SELECT mean("v") FROM "m" WHERE "value"::field > 50""")
      .asInstanceOf[Ast.Select]
    assert(s3.fieldFilters == Seq(Ast.FieldFilter("value", ">", 50.0)))
  }
}
