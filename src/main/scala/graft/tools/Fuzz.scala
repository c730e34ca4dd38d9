package graft.tools

import graft.SparkEntry.{FromNs, ToNs}
import graft.query.{InfluxQlParser, Planner}
import graft.sources.EventsAdapter
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Differential InfluxQL fuzzing against the DuckDB oracle (round-4
  * verdict item 3): the 89 curated `ts_*` entries exercise shapes the
  * builder thought of; this generator sweeps the supported grammar
  * cross-product — aggregate × bucket × tag predicate × time range
  * (× LIMIT/OFFSET where the inner order is total) — emitting paired
  * (InfluxQL, DuckDB SQL) cases the `check_oracle.py` harness compares
  * value-for-value.
  *
  * Usage: `graft.tools.Fuzz <sfDir> <outDir> [nCases]` writes one parquet
  * dir per case plus `oracle_sql.json`, the exact layout `Verify` emits,
  * then `python3 tools/check_oracle.py <sfDir> <outDir>` gates it.
  * `tools/fuzz_check.sh` wraps both. Case selection is a deterministic
  * coprime stride over the full cross-product — the same `n` always
  * replays the same cases.
  */
object Fuzz {

  final case class FuzzCase(name: String, influxQl: String, oracleSql: String)

  // aggregate functions with exact oracle formulas (quantized via
  // floor(x*100) on both sides, like every ts_select entry)
  private val Fns = Seq(
    "mean" -> "avg(value)",
    "sum" -> "sum(value)",
    "min" -> "min(value)",
    "max" -> "max(value)",
    "count" -> "count(value)",
    "spread" -> "max(value) - min(value)")

  private val Buckets = Seq(
    "1m" -> 60000L, "10m" -> 600000L, "30m" -> 1800000L,
    "1h" -> 3600000L, "6h" -> 21600000L, "1d" -> 86400000L)

  // (influx fragment, duckdb fragment, singleSeries)
  private val TagPreds = Seq(
    ("", "", false),
    (""" AND "event_type" = 'click'""", " AND event_type = 'click'", false),
    (""" AND "user_id" = '7'""", " AND user_id = 7", false),
    (""" AND "event_type" = 'click' AND "user_id" = '7'""",
      " AND event_type = 'click' AND user_id = 7", true),
    (""" AND "event_type" != 'click'""", " AND event_type <> 'click'", false),
    (""" AND ("event_type" = 'click' OR "event_type" = 'view')""",
      " AND (event_type = 'click' OR event_type = 'view')", false),
    // regex matchers (unanchored, rlike ≡ regexp_matches)
    (""" AND "event_type" =~ /^(cl|vi)/""",
      " AND regexp_matches(event_type, '^(cl|vi)')", false),
    (""" AND "event_type" !~ /^(cl|vi)/""",
      " AND NOT regexp_matches(event_type, '^(cl|vi)')", false))

  // arithmetic on an aggregate (aliased AS "value" — the parser keeps the
  // alias, the oracle mirrors the expression inside the quantization)
  private val Ariths = Seq(
    ("arith0", """mean("value") * 2 + 10""", "(avg(value) * 2 + 10)"),
    ("arith1", """mean("value") / 4""", "(avg(value) / 4)"),
    ("arith2", """sum("value") - 100""", "(sum(value) - 100)"))

  // outer transforms over the single-series bucketed mean:
  // (slug, influx select, oracle window setup, oracle value expr)
  private val Transforms = Seq(
    ("deriv", """derivative(mean("value"), 1s)""",
      "raw, lag(raw) OVER (ORDER BY time_ms) AS pr, lag(time_ms) OVER (ORDER BY time_ms) AS pt",
      "CASE WHEN pr IS NOT NULL AND time_ms > pt THEN (raw - pr) / ((time_ms - pt) / 1000.0) END"),
    ("diff", """difference(mean("value"))""",
      "raw, lag(raw) OVER (ORDER BY time_ms) AS pr",
      "CASE WHEN pr IS NOT NULL THEN raw - pr END"),
    ("movavg3", """moving_average(mean("value"), 3)""",
      "raw, avg(raw) OVER (ORDER BY time_ms ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS ma",
      "ma"),
    ("cumsum", """cumulative_sum(mean("value"))""",
      "raw, sum(raw) OVER (ORDER BY time_ms ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs",
      "cs"),
    // EMA with N=3 → α = 0.5 exactly: the fold 0.5*b + 0.5*a is the
    // identical IEEE op sequence as Tick.exponentialMovingAverage's
    // alpha*x + oneMinus*e (window fields unused — foldExpr drives it)
    ("ema3", """exponential_moving_average(mean("value"), 3)""", "raw", "raw"))

  private val SlimitParams = Seq((1, 0), (2, 1), (3, 0))

  // ordered/positional aggregates the base family doesn't cover:
  // first/last = value at the bucket's earliest/latest point (ms
  // timestamps are unique within a series — no arg ties), interpolated
  // median (same contract as the percentile family), sample stddev.
  // stddev of a single-point group is NULL in BOTH engines (Spark since
  // the non-legacy statistical aggregates; DuckDB always) — but NULL sorts
  // first in Spark and last in DuckDB, so run() sentinel-encodes it as
  // -999 and the oracle coalesces to the same value before quantization.
  private val ExtraFns = Seq(
    "first" -> "arg_min(value, epoch_ms(ts))",
    "last" -> "arg_max(value, epoch_ms(ts))",
    "median" -> "quantile_cont(value, 0.5)",
    "stddev" -> "coalesce(stddev_samp(value), -999.0)")

  // math function applied to the bucketed mean (per-row, no association
  // risk; events values are non-negative so sqrt is real everywhere).
  // round mirrors the planner's floor(v + 0.5) definition exactly.
  private val MathFns = Seq(
    ("msqrt", """sqrt(mean("value"))""", "sqrt(avg(value))"),
    ("mabs", """abs(mean("value"))""", "abs(avg(value))"),
    ("mpow2", """pow(mean("value"), 2)""", "pow(avg(value), 2)"),
    ("mround", """round(mean("value"))""", "floor(avg(value) + 0.5)"))

  // GROUP BY time(bucket, offset): phase-shifted bucket boundaries
  // (epoch_ms is always > offset here, so floor division stays positive)
  private val BucketOffsets = Seq(
    ("1h", "30m", 3600000L, 1800000L),
    ("1h", "15m", 3600000L, 900000L),
    ("6h", "1h", 21600000L, 3600000L),
    ("1d", "6h", 86400000L, 21600000L),
    ("10m", "5m", 600000L, 300000L))

  // two aggregates of the same field in ONE statement — both project
  // under the source field's name ('value'), two rows per (bucket, label)
  private val MultiPairs = Seq(
    ("mean", "avg(value)", "max", "max(value)"),
    ("min", "min(value)", "sum", "sum(value)"),
    ("count", "count(value)", "spread", "max(value) - min(value)"),
    ("first", "arg_min(value, epoch_ms(ts))", "last", "arg_max(value, epoch_ms(ts))"))

  // field-VALUE predicates (WHERE value > X): the parser's FieldConj
  // path — points are filtered BEFORE aggregation in both engines.
  // (influx fragment, duckdb fragment)
  private val FieldPreds = Seq(
    (""" AND "value" > 50""", " AND value > 50"),
    (""" AND "value" <= 30""", " AND value <= 30"),
    (""" AND "value" > 20 AND "value" < 80""", " AND value > 20 AND value < 80"))

  // strict ns bounds inside the events window (Jan 2024); resolveTime
  // maps `time > X` to X/1e6 + 1 ms and `time < Y` to Y/1e6 - 1 ms
  private val Ranges: Seq[(Long, Long)] = Seq(
    (FromNs, ToNs),
    (FromNs, FromNs + 7L * 86400000L * 1000000L),             // first week
    (FromNs + 10L * 86400000L * 1000000L,
      FromNs + 13L * 86400000L * 1000000L))                   // days 10-13

  // LIMIT/OFFSET only where the inner order is total (single series)
  private val Limits = Seq((50, 0), (100, 25), (7, 3))

  /** Full cross-product, in a fixed order. */
  def allCases: Vector[FuzzCase] = {
    val base = for {
      (fn, fnSql) <- Fns.toVector
      (bName, bMs) <- Buckets
      pi <- TagPreds.indices
      ri <- Ranges.indices
    } yield mk(fn, fnSql, bName, bMs, pi, ri, None)
    val limited = for {
      (fn, fnSql) <- Fns.toVector
      (bName, bMs) <- Buckets
      pi <- TagPreds.indices if TagPreds(pi)._3
      ri <- Ranges.indices
      lim <- Limits
    } yield mk(fn, fnSql, bName, bMs, pi, ri, Some(lim))
    // GROUP BY time(X), "event_type": label rows collapse to the grouped
    // tag only; aggregation spans user_ids within each (bucket, type)
    val grouped = for {
      (fn, fnSql) <- Fns.toVector
      (bName, bMs) <- Buckets
      pi <- TagPreds.indices if !TagPreds(pi)._3
      ri <- Ranges.indices
    } yield mkGroupBy(fn, fnSql, bName, bMs, pi, ri)
    // ORDER BY time DESC over the single-series predicate (total order)
    val desc = for {
      (fn, fnSql) <- Fns.toVector
      (bName, bMs) <- Buckets
      ri <- Ranges.indices
    } yield mkDesc(fn, fnSql, bName, bMs, ri)
    // FILL modes over the single-series predicate; buckets >= 1h keep the
    // query-range spine bounded (the spine spans the QUERY range)
    val fills = for {
      mode <- Vector("0", "-5", "previous", "linear")
      (bName, bMs) <- Buckets if bMs >= 3600000L
      ri <- Ranges.indices
    } yield mkFill(mode, bName, bMs, ri)
    // percentile(p): interpolated continuous quantile (quantile_cont)
    val pcts = for {
      p <- Vector(50, 90, 99)
      (bName, bMs) <- Vector("10m" -> 600000L, "1h" -> 3600000L, "1d" -> 86400000L)
      pi <- Vector(0, 1, 3)
      ri <- Ranges.indices
    } yield mk("percentile", s"quantile_cont(value, ${p / 100.0})",
      bName, bMs, pi, ri, None, fnArg = Some(p))
    // top/bottom selectors: N extreme POINTS per bucket at their own
    // timestamps (single series — deterministic tie-break on time)
    val sels = for {
      (fn, dir) <- Vector("top" -> "DESC", "bottom" -> "ASC")
      nSel <- Vector(1, 3)
      (bName, bMs) <- Vector("1h" -> 3600000L, "6h" -> 21600000L, "1d" -> 86400000L)
      ri <- Ranges.indices
    } yield mkSelector(fn, dir, nSel, bName, bMs, ri)
    // arithmetic on aggregates: expression evaluated per bucket/series
    val ariths = for {
      (slug, sel, fnSql) <- Ariths.toVector
      (bName, bMs) <- Buckets
      pi <- Vector(0, 3)
      ri <- Ranges.indices
    } yield mk(slug, fnSql, bName, bMs, pi, ri, None, selRaw = Some(sel))
    // outer transforms (derivative/difference/moving_average/cumulative_sum
    // of the bucketed mean) over the single total-order series
    val tfs = for {
      t <- Transforms.toVector
      (bName, bMs) <- Buckets if bMs >= 1800000L
      ri <- Ranges.indices
    } yield mkTransform(t, bName, bMs, ri)
    // SLIMIT/SOFFSET over the full multi-series listing
    val slims = for {
      (sl, so) <- SlimitParams.toVector
      (bName, bMs) <- Vector("6h" -> 21600000L, "1d" -> 86400000L)
      ri <- Ranges.indices
    } yield mkSlimit(sl, so, bName, bMs, ri)
    // FILL × GROUP BY tag: per-series spines — every grouped tag value
    // gets its own gap-filled bucket sequence (the combination the
    // curated single-series fill entries never exercise)
    val fillGbs = for {
      mode <- Vector("0", "-5", "previous", "linear")
      (bName, bMs) <- Buckets if bMs >= 3600000L
      ri <- Ranges.indices
    } yield mkFillGb(mode, bName, bMs, ri)
    // outer transforms × GROUP BY tag: the per-series window must
    // partition by the grouped tag value, never run globally
    val tfGbs = for {
      t <- Transforms.toVector
      (bName, bMs) <- Vector("1h" -> 3600000L, "6h" -> 21600000L, "1d" -> 86400000L)
      ri <- Ranges.indices
    } yield mkTransformGb(t, bName, bMs, ri)
    // transforms × FILL: numeric modes with every transform; the
    // null-leaving modes (previous/linear) with the lag-based transforms
    // whose null outputs both engines drop identically
    val tfFills = for {
      t <- Transforms.toVector
      mode <- Vector("0", "-5", "previous", "linear")
      if mode == "0" || mode == "-5" || t._1 == "diff" || t._1 == "deriv"
      (bName, bMs) <- Vector("1h" -> 3600000L, "6h" -> 21600000L, "1d" -> 86400000L)
      ri <- Ranges.indices
    } yield mkTransformFill(t, mode, bName, bMs, ri)
    // percentile × GROUP BY tag: interpolated quantile per (bucket, type)
    val pctGbs = for {
      p <- Vector(50, 90, 99)
      (bName, bMs) <- Vector("1h" -> 3600000L, "1d" -> 86400000L)
      ri <- Ranges.indices
    } yield mkPctGb(p, bName, bMs, ri)
    // ordered/positional aggregates + stddev (sentinel NULL contract)
    val extras = for {
      (fn, fnSql) <- ExtraFns.toVector
      (bName, bMs) <- Buckets
      pi <- Vector(0, 1, 3)
      ri <- Ranges.indices
    } yield mk(fn, fnSql, bName, bMs, pi, ri, None)
    // math-of-aggregate: per-row function over the bucketed mean
    val maths = for {
      (slug, sel, fnSql) <- MathFns.toVector
      (bName, bMs) <- Buckets
      pi <- Vector(0, 3)
      ri <- Ranges.indices
    } yield mk(slug, fnSql, bName, bMs, pi, ri, None, selRaw = Some(sel))
    // phase-shifted buckets: GROUP BY time(X, offset)
    val offsets = for {
      (fn, fnSql) <- Vector("mean" -> "avg(value)", "count" -> "count(value)")
      (bName, oName, bMs, oMs) <- BucketOffsets.toVector
      pi <- Vector(0, 3)
      ri <- Ranges.indices
    } yield mkOffset(fn, fnSql, bName, oName, bMs, oMs, pi, ri)
    // subquery re-aggregation: outer fn over the inner 1h bucketed mean.
    // Order-insensitive outer fns only: sum/mean of inner doubles diverge
    // ±1 ulp from the oracle because neither engine pins the accumulation
    // order of a re-aggregation (measured: 26/240 cells at sf0.01).
    val subqs = for {
      (ofn, ofnSql) <- Vector("max" -> "max(value)", "min" -> "min(value)",
        "count" -> "count(value)")
      (obName, obMs) <- Vector("6h" -> 21600000L, "1d" -> 86400000L)
      ri <- Ranges.indices
    } yield mkSubq(ofn, ofnSql, obName, obMs, ri)
    // two aggregates of the same field in one statement
    val multis = for {
      (f1, s1, f2, s2) <- MultiPairs.toVector
      (bName, bMs) <- Vector("1h" -> 3600000L, "6h" -> 21600000L, "1d" -> 86400000L)
      pi <- Vector(0, 3)
      ri <- Ranges.indices
    } yield mkMulti(f1, s1, f2, s2, bName, bMs, pi, ri)
    // selectors × GROUP BY tag: extreme points per (bucket, tag value)
    val selGbs = for {
      (fn, dir) <- Vector("top" -> "DESC", "bottom" -> "ASC")
      nSel <- Vector(1, 3)
      (bName, bMs) <- Vector("6h" -> 21600000L, "1d" -> 86400000L)
      ri <- Vector(0, 1)
    } yield mkSelectorGb(fn, dir, nSel, bName, bMs, ri)
    // elapsed/integral over the single total-order series: elapsed's
    // truncated point deltas x unit, and integral's bucket-CLIPPED
    // trapezoids (interpolated endpoints) x bucket x unit — the
    // hairiest planner arithmetic, previously covered by ONE curated
    // case each
    val elapseds = for {
      unitMs <- Vector(1000L, 30000L)
      ri <- Ranges.indices
    } yield mkElapsed(unitMs, ri)
    val integrals = for {
      (bName, bMs) <- Vector("1h" -> 3600000L, "6h" -> 21600000L, "1d" -> 86400000L)
      unitMs <- Vector(1000L, 60000L)
      ri <- Ranges.indices
    } yield mkIntegral(bName, bMs, unitMs, ri)
    // field-value predicates (WHERE value > X), alone and composed with
    // a tag predicate — the FieldConj parse/plan path the curated
    // entries and every family above leave untouched
    val fields = for {
      (fn, fnSql) <- Fns.toVector
      fi <- FieldPreds.indices
      (bName, bMs) <- Vector("10m" -> 600000L, "1h" -> 3600000L, "1d" -> 86400000L)
      pi <- Vector(0, 3)
      ri <- Vector(0, 1)
    } yield mk(fn, fnSql, bName, bMs, pi, ri, None, fi = Some(fi))
    // mode: frequency-ranked point value with the lowest-value tie-break
    val modes = for {
      (bName, bMs) <- Buckets.toVector if bMs >= 600000L
      pi <- Vector(0, 1, 3)
      ri <- Ranges.indices
    } yield mkMode(bName, bMs, pi, ri)
    // count(distinct(value)): the distinct-shape aggregate the base
    // family's plain aggregates never exercise
    val cdists = for {
      (bName, bMs) <- Buckets.toVector
      pi <- Vector(0, 1, 3)
      ri <- Ranges.indices
    } yield mk("count_distinct", "count(DISTINCT value)", bName, bMs, pi, ri,
      None, selRaw = Some("""count(distinct("value"))"""))
    base ++ limited ++ grouped ++ desc ++ fills ++ pcts ++ sels ++
      ariths ++ tfs ++ slims ++ fillGbs ++ tfGbs ++ tfFills ++ pctGbs ++
      extras ++ maths ++ offsets ++ subqs ++ multis ++ fields ++
      selGbs ++ elapseds ++ integrals ++ modes ++ cdists ++ showCases
  }

  /** Deterministic n-case subset: coprime stride walk over [[allCases]]
    * (stride 389 is prime and ≠ any divisor of realistic sizes). */
  def cases(n: Int): Vector[FuzzCase] = {
    val all = allCases
    val stride = 389
    require(all.size % stride != 0)
    (0 until math.min(n, all.size)).map(i => all((i * stride) % all.size)).toVector
      .distinct
  }

  private def mk(fn: String, fnSql: String, bName: String, bMs: Long,
                 pi: Int, ri: Int, lim: Option[(Int, Int)],
                 fnArg: Option[Int] = None,
                 selRaw: Option[String] = None,
                 fi: Option[Int] = None): FuzzCase = {
    val (influxPred0, sqlPred0, _) = TagPreds(pi)
    val (influxPred, sqlPred) = fi match {
      case Some(f) => (influxPred0 + FieldPreds(f)._1, sqlPred0 + FieldPreds(f)._2)
      case None    => (influxPred0, sqlPred0)
    }
    val (fromNs, toNs) = Ranges(ri)
    val limClause = lim.map { case (n, o) =>
      if (o == 0) s" LIMIT $n" else s" LIMIT $n OFFSET $o"
    }.getOrElse("")
    val sel = selRaw.map(s => s"""$s AS "value"""").getOrElse(
      fnArg.map(a => s"""$fn("value", $a)""").getOrElse(s"""$fn("value")"""))
    val q = s"""SELECT $sel FROM "events" WHERE time > $fromNs AND time < $toNs$influxPred GROUP BY time($bName)$limClause"""
    val fromMs = fromNs / 1000000L + 1
    val toMs = toNs / 1000000L - 1
    val inner =
      s"""WITH g AS (
         |  SELECT (epoch_ms(ts) // $bMs) * $bMs AS time_ms,
         |         event_type, CAST(user_id AS VARCHAR) AS user_id,
         |         CAST(floor(($fnSql) * 100) AS BIGINT) AS value
         |  FROM events
         |  WHERE epoch_ms(ts) >= $fromMs AND epoch_ms(ts) <= $toMs$sqlPred
         |  GROUP BY 1, 2, 3),
         |u AS (
         |  SELECT time_ms, 'value' AS name, value, 'event_type' AS labelname,
         |         event_type AS labelvalue, '' AS message FROM g
         |  UNION ALL
         |  SELECT time_ms, 'value' AS name, value, 'user_id' AS labelname,
         |         user_id AS labelvalue, '' AS message FROM g)""".stripMargin
    val sql = lim match {
      case None =>
        s"""$inner
           |SELECT * FROM u
           |ORDER BY time_ms, name, labelname, labelvalue, message, value""".stripMargin
      case Some((n, o)) =>
        val off = if (o == 0) "" else s" OFFSET $o"
        s"""$inner,
           |l AS (SELECT * FROM u ORDER BY time_ms, name, labelname, labelvalue, message LIMIT $n$off)
           |SELECT * FROM l
           |ORDER BY time_ms, name, labelname, labelvalue, message, value""".stripMargin
    }
    val slug = s"${fn}${fnArg.map(a => s"$a").getOrElse("")}_${bName}_p${pi}_r$ri" +
      fi.map(f => s"_f$f").getOrElse("") +
      lim.map(l => s"_l${l._1}o${l._2}").getOrElse("")
    FuzzCase(s"fuzz_$slug", q, sql)
  }

  /** mode(value): most frequent point value per (bucket, series); ties
    * break to the LOWEST value (InfluxDB semantics) — DuckDB's own
    * mode() aggregate leaves ties unspecified, so the oracle ranks
    * (count DESC, value ASC) explicitly like the curated entry. */
  private def mkMode(bName: String, bMs: Long, pi: Int, ri: Int): FuzzCase = {
    val (influxPred, sqlPred, _) = TagPreds(pi)
    val (fromNs, toNs) = Ranges(ri)
    val (fromMs, toMs) = (fromNs / 1000000L + 1, toNs / 1000000L - 1)
    val q = s"""SELECT mode("value") FROM "events" WHERE time > $fromNs AND time < $toNs$influxPred GROUP BY time($bName)"""
    val sql =
      s"""WITH c AS (
         |  SELECT (epoch_ms(ts) // $bMs) * $bMs AS time_ms,
         |         event_type, CAST(user_id AS VARCHAR) AS user_id, value, count(*) AS n
         |  FROM events
         |  WHERE epoch_ms(ts) >= $fromMs AND epoch_ms(ts) <= $toMs$sqlPred
         |  GROUP BY 1, 2, 3, 4),
         |m AS (
         |  SELECT time_ms, event_type, user_id, value,
         |         row_number() OVER (PARTITION BY time_ms, event_type, user_id
         |                            ORDER BY n DESC, value ASC) AS rn
         |  FROM c),
         |sel AS (
         |  SELECT time_ms, event_type, user_id,
         |         CAST(floor(value * 100) AS BIGINT) AS value FROM m WHERE rn = 1)
         |SELECT time_ms, 'value' AS name, value, 'event_type' AS labelname,
         |       event_type AS labelvalue, '' AS message FROM sel
         |UNION ALL
         |SELECT time_ms, 'value' AS name, value, 'user_id' AS labelname,
         |       user_id AS labelvalue, '' AS message FROM sel
         |ORDER BY time_ms, name, labelname, labelvalue, message, value""".stripMargin
    FuzzCase(s"fuzz_mode_${bName}_p${pi}_r$ri", q, sql)
  }

  private def durName(ms: Long): String =
    if (ms % 60000L == 0) s"${ms / 60000L}m" else s"${ms / 1000L}s"

  /** elapsed(value, unit) over the single total-order series: truncated
    * per-point time deltas (planner path: per-series lag window). */
  private def mkElapsed(unitMs: Long, ri: Int): FuzzCase = {
    val (fromNs, toNs) = Ranges(ri)
    val (fromMs, toMs) = (fromNs / 1000000L + 1, toNs / 1000000L - 1)
    val q = s"""SELECT elapsed("value", ${durName(unitMs)}) FROM "events" WHERE time > $fromNs AND time < $toNs AND "event_type" = 'click' AND "user_id" = '7'"""
    val sql =
      s"""WITH p AS (
         |  SELECT epoch_ms(ts) AS time_ms, value FROM events
         |  WHERE epoch_ms(ts) >= $fromMs AND epoch_ms(ts) <= $toMs
         |    AND event_type = 'click' AND user_id = 7),
         |d AS (SELECT time_ms,
         |             lag(time_ms) OVER (ORDER BY time_ms, value) AS pt
         |      FROM p),
         |f AS (SELECT time_ms,
         |             CAST(floor(floor((time_ms - pt) / $unitMs.0) * 100) AS BIGINT) AS value
         |      FROM d WHERE pt IS NOT NULL)
         |SELECT time_ms, 'value' AS name, value, 'event_type' AS labelname,
         |       'click' AS labelvalue, '' AS message FROM f
         |UNION ALL
         |SELECT time_ms, 'value' AS name, value, 'user_id' AS labelname,
         |       '7' AS labelvalue, '' AS message FROM f
         |ORDER BY time_ms, name, labelname, labelvalue, message, value""".stripMargin
    FuzzCase(s"fuzz_elapsed_${durName(unitMs)}_r$ri", q, sql)
  }

  /** integral(value, unit) GROUP BY time(bucket): trapezoid area with
    * segments CLIPPED at bucket boundaries (interpolated endpoints),
    * each piece floor-quantized to 1e6 fixed point BEFORE the sum —
    * the curated ts_select_integral template generalized over
    * bucket × unit × range. */
  private def mkIntegral(bName: String, bMs: Long, unitMs: Long, ri: Int): FuzzCase = {
    val (fromNs, toNs) = Ranges(ri)
    val (fromMs, toMs) = (fromNs / 1000000L + 1, toNs / 1000000L - 1)
    val q = s"""SELECT integral("value", ${durName(unitMs)}) FROM "events" WHERE time > $fromNs AND time < $toNs AND "event_type" = 'click' AND "user_id" = '7' GROUP BY time($bName)"""
    val sql =
      s"""WITH p AS (
         |  SELECT epoch_ms(ts) AS time_ms, value FROM events
         |  WHERE epoch_ms(ts) >= $fromMs AND epoch_ms(ts) <= $toMs
         |    AND event_type = 'click' AND user_id = 7),
         |s AS (SELECT time_ms, value,
         |             lag(time_ms) OVER (ORDER BY time_ms, value) AS pt,
         |             lag(value) OVER (ORDER BY time_ms, value) AS pv
         |      FROM p),
         |seg AS (SELECT * FROM s WHERE pt IS NOT NULL AND time_ms > pt),
         |pieces AS (
         |  SELECT t.b,
         |         greatest(s2.pt, t.b) AS ss,
         |         least(s2.time_ms, t.b + $bMs) AS ee,
         |         s2.pv + (s2.value - s2.pv) *
         |           ((greatest(s2.pt, t.b) - s2.pt) / (s2.time_ms - s2.pt)) AS vs,
         |         s2.pv + (s2.value - s2.pv) *
         |           ((least(s2.time_ms, t.b + $bMs) - s2.pt) / (s2.time_ms - s2.pt)) AS ve
         |  FROM seg s2
         |  JOIN generate_series(${(fromMs / bMs) * bMs},
         |                       ${(toMs / bMs) * bMs},
         |                       $bMs) t(b)
         |    ON t.b >= (s2.pt // $bMs) * $bMs
         |   AND t.b <= ((s2.time_ms - 1) // $bMs) * $bMs),
         |areas AS (SELECT b AS time_ms,
         |                 CAST(floor((vs + ve) / 2.0 * ((ee - ss) / $unitMs.0) * 1e6) AS BIGINT) AS a
         |          FROM pieces),
         |g AS (SELECT time_ms, CAST(sum(a) AS BIGINT) AS sfp FROM areas GROUP BY 1),
         |f AS (SELECT time_ms, CAST(floor((sfp / 1e6) * 100) AS BIGINT) AS value FROM g)
         |SELECT time_ms, 'value' AS name, value, 'event_type' AS labelname,
         |       'click' AS labelvalue, '' AS message FROM f
         |UNION ALL
         |SELECT time_ms, 'value' AS name, value, 'user_id' AS labelname,
         |       '7' AS labelvalue, '' AS message FROM f
         |ORDER BY time_ms, name, labelname, labelvalue, message, value""".stripMargin
    FuzzCase(s"fuzz_integral_${bName}_${durName(unitMs)}_r$ri", q, sql)
  }

  /** SHOW metadata listings: TAG VALUES (KEY =/IN/=~) × WHERE scoping ×
    * LIMIT/OFFSET pagination, TAG KEYS and SERIES with WHERE filters —
    * the planner's SHOW dispatch fuzzed like the SELECT surface. String
    * results: run() skips the fixed-point quantization for `_show` cases
    * and orders by every column (name-sorted, the checker's row order). */
  private def mkShow(slug: String, influxQl: String, oracleSql: String): FuzzCase =
    FuzzCase(s"fuzz_${slug}_show", influxQl, oracleSql)

  private def showCases: Vector[FuzzCase] = {
    // WHERE scopes: (slug, influx clause, duckdb predicate)
    val wheres = Vector(
      ("w0", "", ""),
      ("w1", """ WHERE "event_type" = 'click'""", " WHERE event_type = 'click'"),
      ("w2", """ WHERE "user_id" = '7'""", " WHERE user_id = 7"))
    val limits = Vector(("l0", "", ""), ("l1", " LIMIT 5", " LIMIT 5"),
      ("l2", " LIMIT 3 OFFSET 2", " LIMIT 3 OFFSET 2"))
    // tag-values key selections: (slug, WITH KEY clause, oracle key rows)
    val keySels = Vector(
      ("ket", """WITH KEY = "event_type"""",
        "SELECT DISTINCT 'event_type' AS key, event_type AS value FROM events%W"),
      ("kuid", """WITH KEY = "user_id"""",
        "SELECT DISTINCT 'user_id' AS key, CAST(user_id AS VARCHAR) AS value FROM events%W"),
      ("kin", """WITH KEY IN ("event_type", "user_id")""",
        "SELECT DISTINCT 'event_type' AS key, event_type AS value FROM events%W" +
          " UNION SELECT DISTINCT 'user_id', CAST(user_id AS VARCHAR) FROM events%W"),
      ("kre", """WITH KEY =~ /user/""",
        "SELECT DISTINCT 'user_id' AS key, CAST(user_id AS VARCHAR) AS value FROM events%W"))
    val tagValues = for {
      (ks, withKey, oracleBase) <- keySels
      (ws, wInflux, wSql) <- wheres
      (ls, lInflux, lSql) <- limits
    } yield {
      val q = s"""SHOW TAG VALUES FROM "events" $withKey$wInflux$lInflux"""
      val inner = oracleBase.replace("%W", wSql)
      val sql =
        if (lSql.isEmpty) s"SELECT * FROM ($inner) ORDER BY key, value"
        else s"SELECT * FROM (SELECT * FROM ($inner) ORDER BY key, value$lSql) ORDER BY key, value"
      mkShow(s"tv_${ks}_${ws}_$ls", q, sql)
    }
    val tagKeys = for ((ws, wInflux, wSql) <- wheres) yield mkShow(s"tk_$ws",
      s"""SHOW TAG KEYS FROM "events"$wInflux""",
      // both tag keys appear on every series; WHERE scoping never empties
      // a key at these SFs (each scope matches at least one series)
      s"SELECT 'event_type' AS tagKey WHERE EXISTS (SELECT 1 FROM events$wSql) " +
        s"UNION ALL SELECT 'user_id' WHERE EXISTS (SELECT 1 FROM events$wSql) ORDER BY tagKey")
    val series = for {
      (ws, wInflux, wSql) <- wheres
      (ls, lInflux, lSql) <- limits
    } yield {
      val inner = "SELECT DISTINCT 'events,event_type=' || event_type || " +
        s"',user_id=' || CAST(user_id AS VARCHAR) AS key FROM events$wSql"
      val sql =
        if (lSql.isEmpty) s"SELECT * FROM ($inner) ORDER BY key"
        else s"SELECT * FROM (SELECT * FROM ($inner) ORDER BY key$lSql) ORDER BY key"
      mkShow(s"se_${ws}_$ls", s"""SHOW SERIES FROM "events"$wInflux$lInflux""", sql)
    }
    tagValues ++ tagKeys ++ series
  }

  /** GROUP BY time(bucket, offset): bucket boundaries shifted by the
    * offset — `((ms - off) // bucket) * bucket + off` on both sides. */
  private def mkOffset(fn: String, fnSql: String, bName: String, oName: String,
                       bMs: Long, oMs: Long, pi: Int, ri: Int): FuzzCase = {
    val (influxPred, sqlPred, _) = TagPreds(pi)
    val (fromNs, toNs) = Ranges(ri)
    val q = s"""SELECT $fn("value") FROM "events" WHERE time > $fromNs AND time < $toNs$influxPred GROUP BY time($bName, $oName)"""
    val fromMs = fromNs / 1000000L + 1
    val toMs = toNs / 1000000L - 1
    val sql =
      s"""WITH g AS (
         |  SELECT ((epoch_ms(ts) - $oMs) // $bMs) * $bMs + $oMs AS time_ms,
         |         event_type, CAST(user_id AS VARCHAR) AS user_id,
         |         CAST(floor(($fnSql) * 100) AS BIGINT) AS value
         |  FROM events
         |  WHERE epoch_ms(ts) >= $fromMs AND epoch_ms(ts) <= $toMs$sqlPred
         |  GROUP BY 1, 2, 3),
         |u AS (
         |  SELECT time_ms, 'value' AS name, value, 'event_type' AS labelname,
         |         event_type AS labelvalue, '' AS message FROM g
         |  UNION ALL
         |  SELECT time_ms, 'value' AS name, value, 'user_id' AS labelname,
         |         user_id AS labelvalue, '' AS message FROM g)
         |SELECT * FROM u
         |ORDER BY time_ms, name, labelname, labelvalue, message, value""".stripMargin
    FuzzCase(s"fuzz_${fn}_${bName}o${oName}_p${pi}_r${ri}_boff", q, sql)
  }

  /** Subquery re-aggregation: `SELECT ofn("mean") FROM (SELECT mean(...)
    * GROUP BY time(1h)) GROUP BY time(obName)` — the inner per-series
    * bucketed mean becomes the outer's input field (named `mean`), and the
    * outer aggregates each (name, label) row stream independently. */
  private def mkSubq(ofn: String, ofnSql: String, obName: String, obMs: Long,
                     ri: Int): FuzzCase = {
    val (fromNs, toNs) = Ranges(ri)
    val q = s"""SELECT $ofn("mean") FROM (SELECT mean("value") FROM "events"""" +
      s""" WHERE time > $fromNs AND time < $toNs GROUP BY time(1h))""" +
      s""" WHERE time > $fromNs AND time < $toNs GROUP BY time($obName)"""
    val fromMs = fromNs / 1000000L + 1
    val toMs = toNs / 1000000L - 1
    val sql =
      s"""WITH g AS (
         |  SELECT (epoch_ms(ts) // 3600000) * 3600000 AS time_ms,
         |         event_type, CAST(user_id AS VARCHAR) AS user_id,
         |         avg(value) AS value
         |  FROM events
         |  WHERE epoch_ms(ts) >= $fromMs AND epoch_ms(ts) <= $toMs
         |  GROUP BY 1, 2, 3),
         |u AS (
         |  SELECT time_ms, 'mean' AS name, value, 'event_type' AS labelname,
         |         event_type AS labelvalue, '' AS message FROM g
         |  UNION ALL
         |  SELECT time_ms, 'mean' AS name, value, 'user_id' AS labelname,
         |         user_id AS labelvalue, '' AS message FROM g),
         |o AS (
         |  SELECT (time_ms // $obMs) * $obMs AS time_ms, name, labelname,
         |         labelvalue, message,
         |         CAST(floor(($ofnSql) * 100) AS BIGINT) AS value
         |  FROM u
         |  WHERE time_ms >= $fromMs AND time_ms <= $toMs
         |  GROUP BY 1, 2, 3, 4, 5)
         |SELECT time_ms, name, value, labelname, labelvalue, message FROM o
         |ORDER BY time_ms, name, labelname, labelvalue, message, value""".stripMargin
    FuzzCase(s"fuzz_${ofn}_${obName}_r${ri}_subq", q, sql)
  }

  /** Two aggregates of the same field in one statement: both project under
    * the source field name, two value rows per (bucket, label) — the same
    * row-model contract the curated ts_select_first_last entry pins. */
  private def mkMulti(f1: String, s1: String, f2: String, s2: String,
                      bName: String, bMs: Long, pi: Int, ri: Int): FuzzCase = {
    val (influxPred, sqlPred, _) = TagPreds(pi)
    val (fromNs, toNs) = Ranges(ri)
    val q = s"""SELECT $f1("value"), $f2("value") FROM "events" WHERE time > $fromNs AND time < $toNs$influxPred GROUP BY time($bName)"""
    val fromMs = fromNs / 1000000L + 1
    val toMs = toNs / 1000000L - 1
    val sql =
      s"""WITH g AS (
         |  SELECT (epoch_ms(ts) // $bMs) * $bMs AS time_ms,
         |         event_type, CAST(user_id AS VARCHAR) AS user_id,
         |         CAST(floor(($s1) * 100) AS BIGINT) AS v1,
         |         CAST(floor(($s2) * 100) AS BIGINT) AS v2
         |  FROM events
         |  WHERE epoch_ms(ts) >= $fromMs AND epoch_ms(ts) <= $toMs$sqlPred
         |  GROUP BY 1, 2, 3),
         |p AS (SELECT time_ms, event_type, user_id, v1 AS value FROM g
         |      UNION ALL SELECT time_ms, event_type, user_id, v2 FROM g),
         |u AS (
         |  SELECT time_ms, 'value' AS name, value, 'event_type' AS labelname,
         |         event_type AS labelvalue, '' AS message FROM p
         |  UNION ALL
         |  SELECT time_ms, 'value' AS name, value, 'user_id' AS labelname,
         |         user_id AS labelvalue, '' AS message FROM p)
         |SELECT * FROM u
         |ORDER BY time_ms, name, labelname, labelvalue, message, value""".stripMargin
    FuzzCase(s"fuzz_${f1}_${f2}_${bName}_p${pi}_r${ri}_mf", q, sql)
  }

  /** Sequential-fold value expression for the accumulating transforms:
    * DuckDB's windowed SUM/AVG may associate pairwise (segment tree),
    * while Spark's running frames accumulate sequentially — an explicit
    * `list_reduce` over the ordered prefix pins the fold order (the same
    * ulp divergence the curated entries avoid by convention; surfaced by
    * the cumsum × GROUP-BY-tag cases). deriv/diff use lag only (exact
    * subtraction of identical doubles) and keep plain windows. */
  private def foldExpr(slug: String): Option[String] = slug match {
    case "cumsum" => Some("list_reduce(l.vs[1:r.rn], (a, b) -> a + b)")
    case "movavg3" => Some(
      "list_reduce(l.vs[(CASE WHEN r.rn >= 3 THEN r.rn - 2 ELSE 1 END):r.rn], (a, b) -> a + b)" +
        " / (CASE WHEN r.rn >= 3 THEN 3 ELSE r.rn END)")
    case "ema3" => Some("list_reduce(l.vs[1:r.rn], (a, b) -> 0.5 * b + 0.5 * a)")
    case _ => None
  }

  /** Transform × FILL: the composition the planner runs as fillGaps
    * THEN applyTransform. Numeric modes plug every gap (no null
    * contract); previous/linear leave leading(/trailing) gaps NULL, so
    * the transform's null semantics are part of the differential
    * surface — lag propagates NULL, windowed avg/sum ignore NULLs,
    * identically in both engines; rows whose transformed value is still
    * NULL take the -1 sentinel (run() na.fills, the oracle coalesces).
    * The highest-state-space planner path (round-5 verdict item 7). */
  private def mkTransformFill(t: (String, String, String, String), mode: String,
                              bName: String, bMs: Long, ri: Int): FuzzCase = {
    val (slug, sel, winSetup, winExpr) = t
    val (fromNs, toNs) = Ranges(ri)
    val q = s"""SELECT $sel FROM "events" WHERE time > $fromNs AND time < $toNs AND "event_type" = 'click' AND "user_id" = '7' GROUP BY time($bName) FILL($mode)"""
    val fromMs = fromNs / 1000000L + 1
    val toMs = toNs / 1000000L - 1
    val fromB = Math.floorDiv(fromMs, bMs) * bMs
    val toB = Math.floorDiv(toMs, bMs) * bMs
    val fillExpr = mode match {
      case "previous" =>
        "last_value(j.raw IGNORE NULLS) OVER " +
          "(ORDER BY j.time_ms ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
      case "linear" =>
        """CASE WHEN j.raw IS NOT NULL THEN j.raw
          |  WHEN pv IS NOT NULL AND nv IS NOT NULL
          |    THEN pv + (nv - pv) * ((j.time_ms - pt) / (nt - pt))
          |  END""".stripMargin
      case n => s"coalesce(j.raw, $n)"
    }
    val linearWins = if (mode != "linear") "" else
      """,
        |  last_value(j.raw IGNORE NULLS) OVER wp AS pv,
        |  last_value(CASE WHEN j.raw IS NOT NULL THEN j.time_ms END IGNORE NULLS) OVER wp AS pt,
        |  first_value(j.raw IGNORE NULLS) OVER wn AS nv,
        |  first_value(CASE WHEN j.raw IS NOT NULL THEN j.time_ms END IGNORE NULLS) OVER wn AS nt""".stripMargin
    val linearWindowDefs = if (mode != "linear") "" else
      """
        |      WINDOW wp AS (ORDER BY j.time_ms ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |             wn AS (ORDER BY j.time_ms ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)""".stripMargin
    val g =
      s"""WITH g AS (
         |  SELECT (epoch_ms(ts) // $bMs) * $bMs AS time_ms, avg(value) AS raw
         |  FROM events
         |  WHERE epoch_ms(ts) >= $fromMs AND epoch_ms(ts) <= $toMs
         |    AND event_type = 'click' AND user_id = 7
         |  GROUP BY 1),
         |j0 AS (SELECT s.time_ms, g.raw
         |       FROM generate_series($fromB, $toB, $bMs) s(time_ms)
         |       LEFT JOIN g ON g.time_ms = s.time_ms
         |       WHERE EXISTS (SELECT 1 FROM g)),
         |j2 AS (SELECT j.time_ms, j.raw$linearWins FROM j0 j$linearWindowDefs),
         |sp AS (SELECT j.time_ms, $fillExpr AS raw FROM j2 j)""".stripMargin
    // null-leaving modes (previous/linear) are generated ONLY with the
    // lag-based transforms (diff/deriv): their null outputs are DROPPED
    // by both engines (Kapacitor semantics ≡ the NOT-NULL filter), so no
    // sentinel is needed. The fold-replayed transforms (cumsum/movavg/
    // ema) can't compose with nulls differentially — Spark's windowed
    // sum/avg IGNORE nulls while an ordered list_reduce propagates them,
    // so those combinations are excluded at the family comprehension.
    val fCte = foldExpr(slug) match {
      case Some(e) =>
        s"""r AS (SELECT time_ms, row_number() OVER (ORDER BY time_ms) AS rn FROM sp),
           |l AS (SELECT list(raw ORDER BY time_ms) AS vs FROM sp),
           |f AS (SELECT r.time_ms, CAST(floor(($e) * 100) AS BIGINT) AS value FROM r, l)""".stripMargin
      case None =>
        s"""d AS (SELECT time_ms, $winSetup FROM sp),
           |f AS (SELECT time_ms, CAST(floor(($winExpr) * 100) AS BIGINT) AS value
           |      FROM d WHERE ($winExpr) IS NOT NULL)""".stripMargin
    }
    val sql =
      s"""$g,
         |$fCte
         |SELECT time_ms, 'value' AS name, value, 'event_type' AS labelname,
         |       'click' AS labelvalue, '' AS message FROM f
         |UNION ALL
         |SELECT time_ms, 'value' AS name, value, 'user_id' AS labelname,
         |       '7' AS labelvalue, '' AS message FROM f
         |ORDER BY time_ms, name, labelname, labelvalue, message, value""".stripMargin
    FuzzCase(s"fuzz_${slug}_fill${mode.replace("-", "m")}_${bName}_r${ri}_tff", q, sql)
  }

  private def mkTransform(t: (String, String, String, String),
                          bName: String, bMs: Long, ri: Int): FuzzCase = {
    val (slug, sel, winSetup, winExpr) = t
    val (fromNs, toNs) = Ranges(ri)
    val q = s"""SELECT $sel FROM "events" WHERE time > $fromNs AND time < $toNs AND "event_type" = 'click' AND "user_id" = '7' GROUP BY time($bName)"""
    val fromMs = fromNs / 1000000L + 1
    val toMs = toNs / 1000000L - 1
    val g =
      s"""WITH g AS (
         |  SELECT (epoch_ms(ts) // $bMs) * $bMs AS time_ms, avg(value) AS raw
         |  FROM events
         |  WHERE epoch_ms(ts) >= $fromMs AND epoch_ms(ts) <= $toMs
         |    AND event_type = 'click' AND user_id = 7
         |  GROUP BY 1)""".stripMargin
    val fCte = foldExpr(slug) match {
      case Some(e) =>
        s"""r AS (SELECT time_ms, row_number() OVER (ORDER BY time_ms) AS rn FROM g),
           |l AS (SELECT list(raw ORDER BY time_ms) AS vs FROM g),
           |f AS (SELECT r.time_ms, CAST(floor(($e) * 100) AS BIGINT) AS value FROM r, l)""".stripMargin
      case None =>
        s"""d AS (SELECT time_ms, $winSetup FROM g),
           |f AS (SELECT time_ms, CAST(floor(($winExpr) * 100) AS BIGINT) AS value
           |      FROM d WHERE ($winExpr) IS NOT NULL)""".stripMargin
    }
    val sql =
      s"""$g,
         |$fCte
         |SELECT time_ms, 'value' AS name, value, 'event_type' AS labelname,
         |       'click' AS labelvalue, '' AS message FROM f
         |UNION ALL
         |SELECT time_ms, 'value' AS name, value, 'user_id' AS labelname,
         |       '7' AS labelvalue, '' AS message FROM f
         |ORDER BY time_ms, name, labelname, labelvalue, message, value""".stripMargin
    FuzzCase(s"fuzz_${slug}_${bName}_r${ri}_tf", q, sql)
  }

  private def mkTransformGb(t: (String, String, String, String),
                            bName: String, bMs: Long, ri: Int): FuzzCase = {
    val (slug, sel, winSetup0, winExpr) = t
    // the single-series window setups gain a per-type partition
    val winSetup = winSetup0.replace("OVER (ORDER BY time_ms",
      "OVER (PARTITION BY event_type ORDER BY time_ms")
    val (fromNs, toNs) = Ranges(ri)
    val q = s"""SELECT $sel FROM "events" WHERE time > $fromNs AND time < $toNs GROUP BY time($bName), "event_type""""
    val fromMs = fromNs / 1000000L + 1
    val toMs = toNs / 1000000L - 1
    val g =
      s"""WITH g AS (
         |  SELECT (epoch_ms(ts) // $bMs) * $bMs AS time_ms, event_type, avg(value) AS raw
         |  FROM events
         |  WHERE epoch_ms(ts) >= $fromMs AND epoch_ms(ts) <= $toMs
         |  GROUP BY 1, 2)""".stripMargin
    val fCte = foldExpr(slug) match {
      case Some(e) =>
        s"""r AS (SELECT time_ms, event_type,
           |             row_number() OVER (PARTITION BY event_type ORDER BY time_ms) AS rn FROM g),
           |l AS (SELECT event_type, list(raw ORDER BY time_ms) AS vs FROM g GROUP BY 1),
           |f AS (SELECT r.time_ms, r.event_type,
           |             CAST(floor(($e) * 100) AS BIGINT) AS value
           |      FROM r JOIN l USING (event_type))""".stripMargin
      case None =>
        s"""d AS (SELECT time_ms, event_type, $winSetup FROM g),
           |f AS (SELECT time_ms, event_type,
           |             CAST(floor(($winExpr) * 100) AS BIGINT) AS value
           |      FROM d WHERE ($winExpr) IS NOT NULL)""".stripMargin
    }
    val sql =
      s"""$g,
         |$fCte
         |SELECT time_ms, 'value' AS name, value, 'event_type' AS labelname,
         |       event_type AS labelvalue, '' AS message FROM f
         |ORDER BY time_ms, name, labelname, labelvalue, message, value""".stripMargin
    FuzzCase(s"fuzz_${slug}_${bName}_r${ri}_tfgb", q, sql)
  }

  private def mkPctGb(p: Int, bName: String, bMs: Long, ri: Int): FuzzCase = {
    val (fromNs, toNs) = Ranges(ri)
    val q = s"""SELECT percentile("value", $p) FROM "events" WHERE time > $fromNs AND time < $toNs GROUP BY time($bName), "event_type""""
    val fromMs = fromNs / 1000000L + 1
    val toMs = toNs / 1000000L - 1
    val sql =
      s"""WITH g AS (
         |  SELECT (epoch_ms(ts) // $bMs) * $bMs AS time_ms, event_type,
         |         CAST(floor((quantile_cont(value, ${p / 100.0})) * 100) AS BIGINT) AS value
         |  FROM events
         |  WHERE epoch_ms(ts) >= $fromMs AND epoch_ms(ts) <= $toMs
         |  GROUP BY 1, 2)
         |SELECT time_ms, 'value' AS name, value, 'event_type' AS labelname,
         |       event_type AS labelvalue, '' AS message FROM g
         |ORDER BY time_ms, name, labelname, labelvalue, message, value""".stripMargin
    FuzzCase(s"fuzz_percentile${p}_${bName}_r${ri}_pgb", q, sql)
  }

  private def mkSlimit(sl: Int, so: Int, bName: String, bMs: Long,
                       ri: Int): FuzzCase = {
    val (fromNs, toNs) = Ranges(ri)
    val soClause = if (so == 0) "" else s" SOFFSET $so"
    val q = s"""SELECT mean("value") FROM "events" WHERE time > $fromNs AND time < $toNs GROUP BY time($bName) SLIMIT $sl$soClause"""
    val fromMs = fromNs / 1000000L + 1
    val toMs = toNs / 1000000L - 1
    val sql =
      s"""WITH g AS (
         |  SELECT (epoch_ms(ts) // $bMs) * $bMs AS time_ms,
         |         event_type, CAST(user_id AS VARCHAR) AS user_id,
         |         CAST(floor(avg(value) * 100) AS BIGINT) AS value
         |  FROM events
         |  WHERE epoch_ms(ts) >= $fromMs AND epoch_ms(ts) <= $toMs
         |  GROUP BY 1, 2, 3),
         |u AS (
         |  SELECT time_ms, 'value' AS name, value, 'event_type' AS labelname,
         |         event_type AS labelvalue, '' AS message FROM g
         |  UNION ALL
         |  SELECT time_ms, 'value' AS name, value, 'user_id' AS labelname,
         |         user_id AS labelvalue, '' AS message FROM g),
         |r AS (SELECT u.*, dense_rank() OVER (ORDER BY name, labelname, labelvalue) AS sr FROM u)
         |SELECT time_ms, name, value, labelname, labelvalue, message FROM r
         |WHERE sr > $so AND sr <= $so + $sl
         |ORDER BY time_ms, name, labelname, labelvalue, message, value""".stripMargin
    FuzzCase(s"fuzz_slimit${sl}o${so}_${bName}_r$ri", q, sql)
  }

  private def mkSelector(fn: String, dir: String, nSel: Int,
                         bName: String, bMs: Long, ri: Int): FuzzCase = {
    val (fromNs, toNs) = Ranges(ri)
    val q = s"""SELECT $fn("value", $nSel) FROM "events" WHERE time > $fromNs AND time < $toNs AND "event_type" = 'click' AND "user_id" = '7' GROUP BY time($bName)"""
    val fromMs = fromNs / 1000000L + 1
    val toMs = toNs / 1000000L - 1
    val sql =
      s"""WITH p AS (
         |  SELECT epoch_ms(ts) AS time_ms, epoch_ms(ts) // $bMs AS b, value,
         |         event_type, CAST(user_id AS VARCHAR) AS user_id
         |  FROM events
         |  WHERE epoch_ms(ts) >= $fromMs AND epoch_ms(ts) <= $toMs
         |    AND event_type = 'click' AND user_id = 7),
         |r AS (SELECT *, row_number() OVER (PARTITION BY b ORDER BY value $dir, time_ms ASC) AS rn
         |      FROM p),
         |f AS (SELECT time_ms, CAST(floor(value * 100) AS BIGINT) AS value FROM r WHERE rn <= $nSel)
         |SELECT time_ms, 'value' AS name, value, 'event_type' AS labelname,
         |       'click' AS labelvalue, '' AS message FROM f
         |UNION ALL
         |SELECT time_ms, 'value' AS name, value, 'user_id' AS labelname,
         |       '7' AS labelvalue, '' AS message FROM f
         |ORDER BY time_ms, name, labelname, labelvalue, message, value""".stripMargin
    FuzzCase(s"fuzz_${fn}${nSel}_${bName}_r${ri}_sel", q, sql)
  }

  /** top/bottom × GROUP BY tag: N extreme points per (bucket, tag value),
    * competing ACROSS the series that share the tag value — the grouped
    * selector window must partition on (bucket, tag), never globally and
    * never per-fingerprint. Ties beyond (value, time) are unobservable:
    * the emitted row is (time, value, tag) only. */
  private def mkSelectorGb(fn: String, dir: String, nSel: Int,
                           bName: String, bMs: Long, ri: Int): FuzzCase = {
    val (fromNs, toNs) = Ranges(ri)
    val q = s"""SELECT $fn("value", $nSel) FROM "events" WHERE time > $fromNs AND time < $toNs GROUP BY time($bName), "event_type""""
    val fromMs = fromNs / 1000000L + 1
    val toMs = toNs / 1000000L - 1
    val sql =
      s"""WITH p AS (
         |  SELECT epoch_ms(ts) AS time_ms, epoch_ms(ts) // $bMs AS b, value, event_type
         |  FROM events
         |  WHERE epoch_ms(ts) >= $fromMs AND epoch_ms(ts) <= $toMs),
         |r AS (SELECT *, row_number() OVER (PARTITION BY b, event_type
         |                                   ORDER BY value $dir, time_ms ASC) AS rn
         |      FROM p),
         |f AS (SELECT time_ms, event_type,
         |             CAST(floor(value * 100) AS BIGINT) AS value
         |      FROM r WHERE rn <= $nSel)
         |SELECT time_ms, 'value' AS name, value, 'event_type' AS labelname,
         |       event_type AS labelvalue, '' AS message FROM f
         |ORDER BY time_ms, name, labelname, labelvalue, message, value""".stripMargin
    FuzzCase(s"fuzz_${fn}${nSel}_${bName}_r${ri}_selgb", q, sql)
  }

  private def mkGroupBy(fn: String, fnSql: String, bName: String, bMs: Long,
                        pi: Int, ri: Int): FuzzCase = {
    val (influxPred, sqlPred, _) = TagPreds(pi)
    val (fromNs, toNs) = Ranges(ri)
    val q = s"""SELECT $fn("value") FROM "events" WHERE time > $fromNs AND time < $toNs$influxPred GROUP BY time($bName), "event_type""""
    val fromMs = fromNs / 1000000L + 1
    val toMs = toNs / 1000000L - 1
    val sql =
      s"""WITH g AS (
         |  SELECT (epoch_ms(ts) // $bMs) * $bMs AS time_ms, event_type,
         |         CAST(floor(($fnSql) * 100) AS BIGINT) AS value
         |  FROM events
         |  WHERE epoch_ms(ts) >= $fromMs AND epoch_ms(ts) <= $toMs$sqlPred
         |  GROUP BY 1, 2)
         |SELECT time_ms, 'value' AS name, value, 'event_type' AS labelname,
         |       event_type AS labelvalue, '' AS message FROM g
         |ORDER BY time_ms, name, labelname, labelvalue, message, value""".stripMargin
    FuzzCase(s"fuzz_${fn}_${bName}_p${pi}_r${ri}_gbtag", q, sql)
  }

  private def mkDesc(fn: String, fnSql: String, bName: String, bMs: Long,
                     ri: Int): FuzzCase = {
    val (fromNs, toNs) = Ranges(ri)
    val q = s"""SELECT $fn("value") FROM "events" WHERE time > $fromNs AND time < $toNs AND "event_type" = 'click' AND "user_id" = '7' GROUP BY time($bName) ORDER BY time DESC"""
    val fromMs = fromNs / 1000000L + 1
    val toMs = toNs / 1000000L - 1
    val sql =
      s"""WITH g AS (
         |  SELECT (epoch_ms(ts) // $bMs) * $bMs AS time_ms,
         |         CAST(floor(($fnSql) * 100) AS BIGINT) AS value
         |  FROM events
         |  WHERE epoch_ms(ts) >= $fromMs AND epoch_ms(ts) <= $toMs
         |    AND event_type = 'click' AND user_id = 7
         |  GROUP BY 1)
         |SELECT * FROM (
         |  SELECT time_ms, 'value' AS name, value, 'event_type' AS labelname,
         |         'click' AS labelvalue, '' AS message FROM g
         |  UNION ALL
         |  SELECT time_ms, 'value' AS name, value, 'user_id' AS labelname,
         |         '7' AS labelvalue, '' AS message FROM g)
         |ORDER BY time_ms DESC, name, labelname, labelvalue, message, value""".stripMargin
    FuzzCase(s"fuzz_${fn}_${bName}_r${ri}_desc", q, sql)
  }

  private def mkFill(mode: String, bName: String, bMs: Long, ri: Int): FuzzCase = {
    val (fromNs, toNs) = Ranges(ri)
    val q = s"""SELECT mean("value") FROM "events" WHERE time > $fromNs AND time < $toNs AND "event_type" = 'click' AND "user_id" = '7' GROUP BY time($bName) FILL($mode)"""
    val fromMs = fromNs / 1000000L + 1
    val toMs = toNs / 1000000L - 1
    val fromB = Math.floorDiv(fromMs, bMs) * bMs
    val toB = Math.floorDiv(toMs, bMs) * bMs
    val fillExpr = mode match {
      case "previous" =>
        "coalesce(last_value(j.raw IGNORE NULLS) OVER " +
          "(ORDER BY j.time_ms ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1)"
      case "linear" =>
        """coalesce(CASE WHEN j.raw IS NOT NULL THEN j.raw
          |  WHEN pv IS NOT NULL AND nv IS NOT NULL
          |    THEN pv + (nv - pv) * ((j.time_ms - pt) / (nt - pt))
          |  END, -1)""".stripMargin
      case n => s"coalesce(j.raw, $n)"
    }
    val linearWins = if (mode != "linear") "" else
      """,
        |  last_value(j.raw IGNORE NULLS) OVER wp AS pv,
        |  last_value(CASE WHEN j.raw IS NOT NULL THEN j.time_ms END IGNORE NULLS) OVER wp AS pt,
        |  first_value(j.raw IGNORE NULLS) OVER wn AS nv,
        |  first_value(CASE WHEN j.raw IS NOT NULL THEN j.time_ms END IGNORE NULLS) OVER wn AS nt""".stripMargin
    val linearWindowDefs = if (mode != "linear") "" else
      """
        |      WINDOW wp AS (ORDER BY j.time_ms ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |             wn AS (ORDER BY j.time_ms ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)""".stripMargin
    val sql =
      s"""WITH g AS (
         |  SELECT (epoch_ms(ts) // $bMs) * $bMs AS time_ms, avg(value) AS raw
         |  FROM events
         |  WHERE epoch_ms(ts) >= $fromMs AND epoch_ms(ts) <= $toMs
         |    AND event_type = 'click' AND user_id = 7
         |  GROUP BY 1),
         |j0 AS (SELECT s.time_ms, g.raw
         |      FROM generate_series($fromB, $toB, $bMs) s(time_ms)
         |      LEFT JOIN g ON g.time_ms = s.time_ms),
         |j2 AS (SELECT j.time_ms, j.raw$linearWins FROM j0 j$linearWindowDefs),
         |f AS (SELECT j.time_ms, CAST(floor(($fillExpr) * 100) AS BIGINT) AS value FROM j2 j
         |      WHERE EXISTS (SELECT 1 FROM g))
         |SELECT time_ms, 'value' AS name, value, 'event_type' AS labelname,
         |       'click' AS labelvalue, '' AS message FROM f
         |UNION ALL
         |SELECT time_ms, 'value' AS name, value, 'user_id' AS labelname,
         |       '7' AS labelvalue, '' AS message FROM f
         |ORDER BY time_ms, name, labelname, labelvalue, message, value""".stripMargin
    FuzzCase(s"fuzz_fill${mode.replace("-", "m")}_${bName}_r$ri", q, sql)
  }

  private def mkFillGb(mode: String, bName: String, bMs: Long, ri: Int): FuzzCase = {
    val (fromNs, toNs) = Ranges(ri)
    val q = s"""SELECT mean("value") FROM "events" WHERE time > $fromNs AND time < $toNs GROUP BY time($bName), "event_type" FILL($mode)"""
    val fromMs = fromNs / 1000000L + 1
    val toMs = toNs / 1000000L - 1
    val fromB = Math.floorDiv(fromMs, bMs) * bMs
    val toB = Math.floorDiv(toMs, bMs) * bMs
    val fillExpr = mode match {
      case "previous" =>
        "coalesce(last_value(j.raw IGNORE NULLS) OVER " +
          "(PARTITION BY j.event_type ORDER BY j.time_ms ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1)"
      case "linear" =>
        """coalesce(CASE WHEN j.raw IS NOT NULL THEN j.raw
          |  WHEN pv IS NOT NULL AND nv IS NOT NULL
          |    THEN pv + (nv - pv) * ((j.time_ms - pt) / (nt - pt))
          |  END, -1)""".stripMargin
      case n => s"coalesce(j.raw, $n)"
    }
    val linearWins = if (mode != "linear") "" else
      """,
        |  last_value(j.raw IGNORE NULLS) OVER wp AS pv,
        |  last_value(CASE WHEN j.raw IS NOT NULL THEN j.time_ms END IGNORE NULLS) OVER wp AS pt,
        |  first_value(j.raw IGNORE NULLS) OVER wn AS nv,
        |  first_value(CASE WHEN j.raw IS NOT NULL THEN j.time_ms END IGNORE NULLS) OVER wn AS nt""".stripMargin
    val linearWindowDefs = if (mode != "linear") "" else
      """
        |      WINDOW wp AS (PARTITION BY j.event_type ORDER BY j.time_ms ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |             wn AS (PARTITION BY j.event_type ORDER BY j.time_ms ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)""".stripMargin
    val sql =
      s"""WITH g AS (
         |  SELECT (epoch_ms(ts) // $bMs) * $bMs AS time_ms, event_type, avg(value) AS raw
         |  FROM events
         |  WHERE epoch_ms(ts) >= $fromMs AND epoch_ms(ts) <= $toMs
         |  GROUP BY 1, 2),
         |ty AS (SELECT DISTINCT event_type FROM g),
         |sp AS (SELECT ty.event_type, s.time_ms
         |       FROM ty, generate_series($fromB, $toB, $bMs) s(time_ms)),
         |j0 AS (SELECT sp.event_type, sp.time_ms, g.raw
         |       FROM sp LEFT JOIN g
         |         ON g.event_type = sp.event_type AND g.time_ms = sp.time_ms),
         |j2 AS (SELECT j.event_type, j.time_ms, j.raw$linearWins FROM j0 j$linearWindowDefs),
         |f AS (SELECT j.event_type, j.time_ms,
         |             CAST(floor(($fillExpr) * 100) AS BIGINT) AS value FROM j2 j)
         |SELECT time_ms, 'value' AS name, value, 'event_type' AS labelname,
         |       event_type AS labelvalue, '' AS message FROM f
         |ORDER BY time_ms, name, labelname, labelvalue, message, value""".stripMargin
    FuzzCase(s"fuzz_fill${mode.replace("-", "m")}_${bName}_r${ri}_gb", q, sql)
  }

  /** Descending-time cases need the DESC-preserving quantize order. */
  private def isDesc(c: FuzzCase): Boolean = c.name.endsWith("_desc")

  /** Run a case through the real parse → plan path and quantize exactly
    * like the `ts_select_*` entries (shared contract with the oracle). */
  def run(spark: SparkSession, cat: graft.query.TsCatalog, c: FuzzCase): DataFrame = {
    val stmt = InfluxQlParser.parse(c.influxQl)
      .fold(e => sys.error(s"parse ${c.name}: $e"), identity)
    val planned = Planner.plan(spark, stmt, cat, graft.SparkEntry.NowMs)
    // SHOW listings: string results, no fixed-point value column — order
    // by every column in checker (name-sorted) order and return as-is
    if (c.name.endsWith("_show"))
      return planned.orderBy(planned.columns.sorted.map(col).toIndexedSeq: _*)
    // fill(previous/linear) leave leading/trailing gaps NULL (InfluxDB
    // semantics); the oracle encodes those nulls as -1 (hash-safe), the
    // same contract as the curated ts_select_fill_* entries
    val encoded =
      if (c.name.startsWith("fuzz_fillprevious") || c.name.startsWith("fuzz_filllinear"))
        planned.na.fill(-1.0, Seq("value"))
      else if (c.name.startsWith("fuzz_stddev"))
        // single-point buckets: NULL in both engines, but NULL sorts first
        // in Spark and last in DuckDB — sentinel before quantization (the
        // oracle coalesces stddev_samp to the same -999)
        planned.withColumn("value",
          when(col("value").isNull || isnan(col("value")), lit(-999.0))
            .otherwise(col("value")))
      else planned
    val df = encoded.withColumn("value", floor(col("value") * 100).cast("long"))
    if (isDesc(c))
      df.orderBy(col("time_ms").desc, col("name"), col("labelname"),
        col("labelvalue"), col("message"), col("value"))
    else
      df.orderBy("time_ms", "name", "labelname", "labelvalue", "message", "value")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val n = if (args.length > 2) args(2).toInt else 500
    // optional 4th arg: only run cases whose name contains the substring
    // (targeted family sweeps while iterating on the generator);
    // "store" / "store:<substring>" instead routes the cases through the
    // REAL engine store — events rendered as line protocol, ingested via
    // the distributed writeLines path into the hour-partitioned parquet
    // layout, then queried through GraftEngine.catalog — so the whole
    // grammar space differentially verifies ingest∘store∘query (the
    // oracle still reads the raw parquet: a value that doesn't round-trip
    // bit-exactly through render→parse→store fails its case)
    val rawFilter = if (args.length > 3) Some(args(3)) else None
    val (storeMode, nameFilter) = rawFilter match {
      case Some("store") => (true, None)
      case Some(f) if f.startsWith("store:") => (true, Some(f.stripPrefix("store:")))
      case other => (false, other)
    }
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cat0 =
      if (storeMode) {
        import spark.implicits._
        val root = java.nio.file.Files.createTempDirectory("fuzz_store").toString
        val eng = new graft.api.GraftEngine(spark, root, () => graft.SparkEntry.NowMs)
        eng.writeLines("fuzzdb",
          EventsAdapter.asLineProtocol(EventsAdapter.events(spark, sfDir)).as[String])
        eng.catalog("fuzzdb")
      } else EventsAdapter.catalog(spark, sfDir)
    // materialize the shared samples relation once — 500 plans would
    // otherwise re-scan/re-derive the adapter lineage per case
    val cat = cat0.copy(measurements =
      cat0.measurements.map { case (k, v) => k -> v.localCheckpoint(true) })
    val cs = nameFilter match {
      case Some(f) => allCases.filter(_.name.contains(f)).take(n)
      case None => cases(n)
    }
    var failed = 0
    val sqlJson = new StringBuilder("{")
    cs.zipWithIndex.foreach { case (c, i) =>
      try {
        run(spark, cat, c).write.mode("overwrite").parquet(s"$outDir/${c.name}")
        if (sqlJson.length > 1) sqlJson.append(",")
        sqlJson.append(s""""${c.name}":${jsonStr(c.oracleSql)}""")
      } catch { case e: Throwable =>
        failed += 1
        System.err.println(s"[fuzz] ${c.name} FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
      if ((i + 1) % 50 == 0) System.err.println(s"[fuzz] ${i + 1}/${cs.size}")
    }
    sqlJson.append("}")
    java.nio.file.Files.write(java.nio.file.Paths.get(outDir, "oracle_sql.json"),
      sqlJson.toString.getBytes("UTF-8"))
    System.err.println(s"[fuzz] ${cs.size - failed}/${cs.size} planned+dumped ok")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
