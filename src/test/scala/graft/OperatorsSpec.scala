package graft

import graft.functions.VectorMath
import graft.operators.{AsOf, Tick}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AsOf join, TICK transforms, and the SQL-registered custom function. */
class OperatorsSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  test("asof latestPrior picks latest right row <= left time, per key") {
    import spark.implicits._
    val left = Seq((1L, 100L), (1L, 200L), (2L, 150L)).toDF("k", "t")
    val right = Seq((1L, 50L, 5.0), (1L, 100L, 7.0), (1L, 250L, 9.0), (3L, 10L, 1.0))
      .toDF("k", "t", "v")
    val out = AsOf.latestPrior(left, right, Seq("k"), "t", "v", "prior")
      .select("k", "t", "prior").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)))).toSet
    assert(out === Set(
      (1L, 100L, Some(7.0)), // equal timestamp counts (<=)
      (1L, 200L, Some(7.0)), // 250 is later, skipped
      (2L, 150L, None)))     // no right rows for key 2
  }

  test("dot_f64 callable from SQL after registration") {
    VectorMath.register(spark)
    val d = spark.sql("SELECT dot_f64(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect()(0).getDouble(0)
    assert(d === 11.0)
  }

  test("GraftExtensions injects dot_f64 through the SparkSessionExtensions hook") {
    // exercise the builder-time path (spark.sql.extensions=graft.GraftExtensions)
    // against the shared session's registry
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions().apply(ext)
    org.apache.spark.sql.graftbridge.Bridge.applyExtensionFunctions(ext, spark)
    val d = spark.sql("SELECT dot_f64(array(2.0d, 3.0d), array(4.0d, 5.0d)) AS d")
      .collect()(0).getDouble(0)
    assert(d === 23.0)
  }

  test("parse_line: SQL-callable line-protocol parser matches the ingest parser") {
    import spark.implicits._
    // column API on a line exercising escapes, int suffix, bool, string
    val line = """cpu\,a,host=h\ 1,dc=eu usage=1.5,count=3i,ok=true,msg="q\"x" 1735689540000000000"""
    val r = Seq(line).toDF("l")
      .select(graft.functions.ParseLine.parseLine(col("l")).as("p"))
      .selectExpr("p.measurement", "p.tags", "p.floats", "p.strings", "p.ts_ns")
      .collect()(0)
    assert(r.getString(0) === "cpu,a")
    assert(r.getMap[String, String](1) === Map("host" -> "h 1", "dc" -> "eu"))
    // type policy: numerics (incl. i-suffix ints) → floats; booleans and
    // quoted strings → the string pipeline — exactly LineProtocol.parse
    assert(r.getMap[String, Double](2) === Map("usage" -> 1.5, "count" -> 3.0))
    assert(r.getMap[String, String](3) === Map("ok" -> "true", "msg" -> "q\"x"))
    assert(r.getLong(4) === 1735689540000000000L)
    // SQL registration; no timestamp → null ts_ns; malformed → NULL row
    graft.functions.ParseLine.register(spark)
    val n = spark.sql(
      "SELECT parse_line('m f=1') AS a, parse_line('garbage no fields') AS b")
      .collect()(0)
    assert(!n.isNullAt(0) && n.getStruct(0).isNullAt(4))
    assert(n.isNullAt(1))
  }

  test("dot_f64 column API matches declarative fold bit-for-bit") {
    import spark.implicits._
    val df = Seq((Seq(0.1, 0.2, 0.3), Seq(0.4, 0.5, 0.6))).toDF("a", "b")
    val custom = df.select(VectorMath.dotF64(col("a"), col("b"))).collect()(0).getDouble(0)
    val declarative = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), (s, x) => s + x))
      .collect()(0).getDouble(0)
    assert(java.lang.Double.doubleToLongBits(custom) ===
      java.lang.Double.doubleToLongBits(declarative))
  }

  test("hyperplane_buckets matches the per-plane declarative fold bit-for-bit") {
    import spark.implicits._
    val bands = 16; val bits = 8
    // deterministic 64-dim vector with mixed signs and magnitudes
    val v = (0 until 64).map(d => math.sin(d * 1.7) * (d % 7 - 3) * 0.31)
    val df = Seq(Tuple1(v)).toDF("v")
    val custom = df.select(VectorMath.hyperplaneBuckets(col("v"), bands, bits))
      .collect()(0).getSeq[Long](0)
    // the declarative mirror: one aggregate(zip_with) fold per plane,
    // same quadratic-mixed coefficient stream as the codegen'd expression
    def planeDot(j: Int) = aggregate(
      zip_with(col("v"), sequence(lit(j * 64L + 1L), lit(j * 64L + 64L)),
        (x, idx) => {
          val x0 = (lit(2654435761L) * idx) % 2147483647L
          x * ((x0 * x0 + x0) % 2147483647L % 2001L - 1000L).cast("double")
        }),
      lit(0.0), (acc, x) => acc + x)
    def bandBucket(b: Int) = (0 until bits).map { k =>
      when(planeDot(b * bits + k) > 0, lit(1L << k)).otherwise(lit(0L))
    }.reduce(_ + _)
    val declarative = df.select(array((0 until bands).map(bandBucket): _*))
      .collect()(0).getSeq[Long](0)
    assert(custom === declarative)
    // SQL registration path agrees too
    graft.functions.VectorMath.register(spark)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions().apply(ext)
    org.apache.spark.sql.graftbridge.Bridge.applyExtensionFunctions(ext, spark)
    val viaSql = df.createOrReplaceTempView("hv")
    val s = spark.sql(s"SELECT hyperplane_buckets(v, $bands, $bits) FROM hv")
      .collect()(0).getSeq[Long](0)
    assert(s === custom)
  }

  test("tick difference drops first row per series; moving average keeps it") {
    import spark.implicits._
    val sel = Seq(
      (1000L, "value", 10.0, "h", "a", ""),
      (2000L, "value", 15.0, "h", "a", ""),
      (3000L, "value", 12.0, "h", "a", ""),
      (1000L, "value", 100.0, "h", "b", ""))
      .toDF("time_ms", "name", "value", "labelname", "labelvalue", "message")
    val diff = Tick.difference(sel).select("labelvalue", "time_ms", "value")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(diff === Set(("a", 2000L, 5.0), ("a", 3000L, -3.0)))
    val ma = Tick.movingAverage(sel, 2).filter(col("labelvalue") === "a")
      .orderBy("time_ms").select("value")
      .collect().map(_.getDouble(0)).toSeq
    assert(ma === Seq(10.0, 12.5, 13.5))
  }

  test("exponential moving average: seeded by first point, α=0.5 recurrence") {
    import spark.implicits._
    val sel = Seq(
      (1000L, "value", 10.0, "h", "a", ""),
      (2000L, "value", 20.0, "h", "a", ""),
      (3000L, "value", 30.0, "h", "a", ""))
      .toDF("time_ms", "name", "value", "labelname", "labelvalue", "message")
    val ema = Tick.exponentialMovingAverage(sel, 3) // α = 2/4 = 0.5
      .orderBy("time_ms").select("value").collect().map(_.getDouble(0)).toSeq
    // e1=10; e2=0.5*20+0.5*10=15; e3=0.5*30+0.5*15=22.5
    assert(ema === Seq(10.0, 15.0, 22.5))
  }

  test("DEMA = 2*EMA - EMA(EMA); RSI hits 0/100 on pure trends; CMO/KER extremes") {
    import spark.implicits._
    def series(vs: Double*) = vs.zipWithIndex.map { case (v, i) =>
      ((i + 1) * 1000L, "value", v, "h", "a", "")
    }.toDF("time_ms", "name", "value", "labelname", "labelvalue", "message")

    // DEMA, α=0.5: e1 = 10, 15, 22.5; e2 = 10, 12.5, 17.5 → 2e1-e2
    val dema = Tick.doubleExponentialMovingAverage(series(10, 20, 30), 3)
      .orderBy("time_ms").select("value").collect().map(_.getDouble(0)).toSeq
    assert(dema === Seq(10.0, 17.5, 27.5))

    // strictly rising series: every diff positive → RSI = 100, CMO = 100,
    // KER = 1 (|net| == volatility)
    val up = series(1, 2, 3, 4, 5, 6, 7)
    val rsi = Tick.relativeStrengthIndex(up, 4)
      .select("value").collect().map(_.getDouble(0)).toSeq
    assert(rsi.nonEmpty && rsi.forall(_ === 100.0))
    val cmo = Tick.chandeMomentum(up, 4)
      .select("value").collect().map(_.getDouble(0)).toSeq
    assert(cmo.nonEmpty && cmo.forall(_ === 100.0))
    val ker = Tick.kaufmansEfficiency(up, 4)
      .select("value").collect().map(_.getDouble(0)).toSeq
    assert(ker.nonEmpty && ker.forall(_ === 1.0))

    // strictly falling: RSI = 0, CMO = -100, KER still 1 (perfect trend)
    val down = series(7, 6, 5, 4, 3, 2, 1)
    val rsiD = Tick.relativeStrengthIndex(down, 4)
      .select("value").collect().map(_.getDouble(0)).toSeq
    assert(rsiD.nonEmpty && rsiD.forall(_ === 0.0))
    val cmoD = Tick.chandeMomentum(down, 4)
      .select("value").collect().map(_.getDouble(0)).toSeq
    assert(cmoD.nonEmpty && cmoD.forall(_ === -100.0))
    val kerD = Tick.kaufmansEfficiency(down, 4)
      .select("value").collect().map(_.getDouble(0)).toSeq
    assert(kerD.nonEmpty && kerD.forall(_ === 1.0))

    // flat series: no movement → CMO 0, KER 0 (0-volatility guard)
    val flat = series(5, 5, 5, 5, 5, 5)
    val cmoF = Tick.chandeMomentum(flat, 4)
      .select("value").collect().map(_.getDouble(0)).toSeq
    assert(cmoF.nonEmpty && cmoF.forall(_ === 0.0))
    val kerF = Tick.kaufmansEfficiency(flat, 4)
      .select("value").collect().map(_.getDouble(0)).toSeq
    assert(kerF.nonEmpty && kerF.forall(_ === 0.0))
  }

  test("bounded-heap top-K equals the window truth under forced partial merges") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // deterministic pseudo-random rows over few keys, scattered across
    // 16 partitions so every map task builds its own partial heap
    val rows = (1L to 4000L).map { i =>
      val t = "t" + (i % 5)
      (i, java.time.Instant.ofEpochMilli(0), i % 97, t, ((i * 2654435761L) % 1000L).toDouble / 7.0, "")
    }
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(16)
    val heap = graft.operators.TopK.topValuesPerType(ev, 7).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val truth = ev.select(col("event_type"),
        floor(col("value") * 1000).cast("long").as("s"), col("event_id").as("id"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("event_type").orderBy(col("s").desc, col("id"))))
      .filter(col("rank") <= 7)
      .select("event_type", "rank", "id", "s").collect()
      .map(r => (r.getString(0), r.getInt(1).toLong, r.getLong(2), r.getLong(3)))
    assert(heap.toSeq.sorted === truth.toSeq.sorted)
    // ties break toward the smaller event_id (duplicate scores exist by
    // construction: 5 keys x 1000 score values over 4000 rows)
    assert(heap.groupBy(_._1).values.forall { g =>
      val sorted = g.sortBy(_._2)
      sorted.zip(sorted.tail).forall { case (a, b) =>
        a._4 > b._4 || (a._4 == b._4 && a._3 < b._3) }
    })
  }

  test("asof tolerance: stale priors null out, fresh ones carry") {
    import spark.implicits._
    val left = Seq((1L, 1000L), (1L, 5000L)).toDF("k", "t")
    val right = Seq((1L, 900L, 7.0)).toDF("k", "t", "v")
    val out = AsOf.latestPriorWithin(left, right, Seq("k"), "t", "v", "prior", 500L)
      .select("t", "prior").collect()
      .map(r => (r.getLong(0), Option(r.get(1)))).toMap
    assert(out(1000L) === Some(7.0)) // 100 <= 500: fresh
    assert(out(5000L) === None)      // 4100 > 500: stale
  }

  test("increase: counter resets contribute nothing, monotone output") {
    import spark.implicits._
    val sel = Seq(
      (1000L, 10.0), (2000L, 15.0), (3000L, 2.0), // reset 15 -> 2 ignored
      (4000L, 6.0), (5000L, 6.0))
      .map { case (t, v) => (t, "value", v, "h", "a", "") }
      .toDF("time_ms", "name", "value", "labelname", "labelvalue", "message")
    val out = Tick.increase(sel).orderBy("time_ms")
      .select("time_ms", "value").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // deltas: +5, -13(->0), +4, 0  => running 5, 5, 9, 9; first point drops
    assert(out === Seq((2000L, 5.0), (3000L, 5.0), (4000L, 9.0), (5000L, 9.0)))
  }

  test("stateCount/stateDuration: islands restart on exit, duration 0 at entry") {
    import spark.implicits._
    val sel = Seq(
      (1000L, 10.0), (2000L, 30.0), (3000L, 40.0), // run 1: 2 points
      (4000L, 5.0),                                // out
      (5000L, 50.0), (6000L, 60.0), (7000L, 70.0)) // run 2: 3 points
      .map { case (t, v) => (t, "value", v, "h", "a", "") }
      .toDF("time_ms", "name", "value", "labelname", "labelvalue", "message")
    val cnt = Tick.stateCount(sel, 25.0).orderBy("time_ms")
      .select("time_ms", "value").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(cnt === Seq((2000L, 1.0), (3000L, 2.0), (5000L, 1.0), (6000L, 2.0), (7000L, 3.0)))
    val dur = Tick.stateDuration(sel, 25.0).orderBy("time_ms")
      .select("time_ms", "value").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(dur === Seq((2000L, 0.0), (3000L, 1.0), (5000L, 0.0), (6000L, 1.0), (7000L, 2.0)))
  }

  test("TEMA/TRIX: triple-EMA chain; KAMA warmup, flat invariance, trend adaptation") {
    import spark.implicits._
    def series(vs: Double*) = vs.zipWithIndex.map { case (v, i) =>
      ((i + 1) * 1000L, "value", v, "h", "a", "")
    }.toDF("time_ms", "name", "value", "labelname", "labelvalue", "message")

    // α=0.5: e1 = 10, 15, 22.5; e2 = 10, 12.5, 17.5; e3 = 10, 11.25, 14.375
    // TEMA = 3e1 − 3e2 + e3 → 10, 18.75, 29.375
    val tema = Tick.tripleExponentialMovingAverage(series(10, 20, 30), 3)
      .orderBy("time_ms").select("value").collect().map(_.getDouble(0)).toSeq
    assert(tema === Seq(10.0, 18.75, 29.375))

    // TRIX over the same e3 chain: first row dropped; 100·(11.25−10)/10 = 12.5
    val trix = Tick.tripleExponentialDerivative(series(10, 20, 30), 3)
      .orderBy("time_ms").select("value").collect().map(_.getDouble(0)).toSeq
    assert(trix.length === 2 && trix.head === 12.5 &&
      math.abs(trix(1) - 100.0 * 3.125 / 11.25) < 1e-12)

    // KAMA n=2 on 10,20,30,40: warmup drops 2 rows; seed = 30; then a
    // perfect trend → er=1 → sc=(2/3)² → 30 + 4/9·10
    val kama = Tick.kaufmansAdaptiveMovingAverage(series(10, 20, 30, 40), 2)
      .orderBy("time_ms").select("value").collect().map(_.getDouble(0)).toSeq
    assert(kama.length === 2 && kama.head === 30.0 &&
      math.abs(kama(1) - (30.0 + 4.0 / 9.0 * 10.0)) < 1e-9)

    // flat series: x − kama = 0 every step → kama pinned to the seed
    val kamaF = Tick.kaufmansAdaptiveMovingAverage(series(5, 5, 5, 5, 5, 5), 3)
      .select("value").collect().map(_.getDouble(0)).toSeq
    assert(kamaF.length === 3 && kamaF.forall(_ === 5.0))
  }
}
