package graft.query

import graft.model.TimeUnits
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Catalog handed to the planner: per-measurement samples tables + the
  * per-database series index (SURVEY §1.1). DataFrames, so the same planner
  * serves parquet-backed, in-memory, and streaming-ingested tables. */
final case class TsCatalog(
    databases: Seq[String],
    measurements: Map[String, DataFrame],
    seriesIndex: DataFrame
)

/** AST → DataFrame planner. Declarative DataFrame ops only — Catalyst does
  * pushdown/pruning/broadcast (SURVEY §4: zero custom rules needed).
  *
  * The SELECT pipeline mirrors the reference's emitted ClickHouse SQL
  * (cflux.js:745-774): per metric, series-index FINAL dedup → per-label-pair
  * explode (ARRAY JOIN) → name/tag PREWHERE → ANY INNER JOIN on fingerprint
  * → time-range filter → time-bucket group → agg → UNION ALL → outer sort.
  */
object Planner {

  /** SELECT over a measurement/field that doesn't exist: the engine answers
    * with a clean empty result (reference behavior for unknown tables), so
    * these must stay distinguishable from user-facing query REJECTIONS
    * (plain IllegalArgumentException), which surface as per-statement error
    * objects like InfluxDB's. */
  final class UnknownMeasurement(msg: String) extends IllegalArgumentException(msg)

  /** One WHERE-time expression → epoch ms (shared by SELECT's resolveTime
    * and the DELETE path, which has different missing-bound defaults). */
  def evalTime(te: Ast.TimeExpr, nowMs: Long): Long = te match {
    case Ast.Now            => nowMs
    case Ast.NowMinus(d)    => nowMs - d
    case Ast.AbsoluteNs(ns) => TimeUnits.nsToMs(ns)
    case Ast.DateString(s) =>
      // reference floors string datetimes to 5 minutes (cflux.js:32-34);
      // we parse exactly (documented divergence — SURVEY §2.5 W2)
      val ld = java.time.LocalDateTime.parse(
        if (s.length == 10) s + " 00:00:00" else s,
        java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
      ld.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
  }

  /** Resolve the four WHERE-time shapes of cflux.js:702-727 to [fromMs, toMs]. */
  /** Time bounds over a samples relation: the timestamp_ms range PLUS the
    * derived hour-bucket bounds. The hour predicate is what actually
    * partition-prunes the engine's `hour=`-partitioned store — pruning
    * needs a predicate on the partition column itself; timestamp_ms alone
    * only buys row-group skipping after the file is listed. (Reference
    * analogue: PREWHERE minute BETWEEN, cflux.js:765.) */
  private def timeFiltered(samples: DataFrame, fromMs: Long, toMs: Long): DataFrame = {
    val base = samples.filter(col("timestamp_ms") >= fromMs && col("timestamp_ms") <= toMs)
    // subquery-inner relations have no hour column — only stored/adapter
    // samples carry the partition key
    if (samples.columns.contains("hour"))
      base.filter(col("hour") >= graft.model.TimeUnits.msToHourBucket(fromMs) &&
        col("hour") <= graft.model.TimeUnits.msToHourBucket(toMs))
    else base
  }

  def resolveTime(b: Ast.TimeBounds, nowMs: Long): (Long, Long) = {
    def eval(te: Ast.TimeExpr): Long = evalTime(te, nowMs)
    // fallback window = 300 s, matching cflux.js:719-726
    val to = b.upper.map(eval).getOrElse(nowMs)
    val from = b.lower.map(eval).getOrElse(to - 300000L)
    // strict comparators shrink the inclusive ms range by one
    (if (b.lowerStrict) from + 1 else from,
     if (b.upperStrict) to - 1 else to)
  }

  /** Honest aggregate dispatch (SURVEY §2.4 build note): the reference
    * always emits avg (cflux.js:749); we dispatch on the parsed function
    * with mean as the compat default. */
  def aggFor(func: Option[String], value: Column, ts: Column,
             arg: Option[Double] = None): Column = func match {
    case None | Some("mean") => avg(value)
    case Some("sum")         => sum(value)
    case Some("count")       => count(value)
    case Some("count_distinct") => countDistinct(value) // count(distinct("v"))
    case Some("min")         => min(value)
    case Some("max")         => max(value)
    case Some("first")       => min_by(value, ts)
    case Some("last")        => max_by(value, ts)
    case Some("spread")      => max(value) - min(value)
    case Some("median")      => median(value)
    case Some("stddev")      => stddev_samp(value)
    case Some("percentile")  => // exact interpolated percentile, arg in [0,100]
      percentile(value, lit(arg.getOrElse(
        throw new IllegalArgumentException("percentile needs a numeric argument")) / 100.0))
    case Some(other)         => throw new IllegalArgumentException(s"unsupported aggregate: $other")
  }

  /** Series-index FINAL + ARRAY JOIN + PREWHERE subquery (cflux.js:750-764):
    * last-write-wins dedup by fingerprint, exploded to one row per label
    * pair, filtered by metric name and tag equalities. Small by design —
    * the planner broadcasts it into the samples join. */
  /** @param groupTags honored `GROUP BY time(x), "tag"` keys (extension:
    *                   the reference reads and ignores groupby tags,
    *                   cflux.js:695) — when non-empty, only those label
    *                   pairs survive the explode, so the downstream
    *                   group-by collapses series onto the requested tags. */
  /** One tag predicate as a Column over the series-index row shape.
    * Reference: labelvalue[arrayFirstIndex(x -> x = k, labelname)] = v
    * (cflux.js:759); map lookup is the Spark-native equivalent (F6).
    * InfluxDB treats a missing tag as '' — negative/regex operators must
    * match series that lack the key entirely. */
  private[graft] def tagPred(tf: Ast.TagFilter): Column = {
    val v = element_at(map_from_arrays(col("labelname"), col("labelvalue")), tf.key)
    tf.op match {
      case "="   => coalesce(v, lit("")) === tf.value
      case "!="  => coalesce(v, lit("")) =!= tf.value
      case "=~"  => coalesce(v, lit("")).rlike(tf.value)
      case "!~"  => !coalesce(v, lit("")).rlike(tf.value)
      case other => throw new IllegalArgumentException(s"bad tag operator $other")
    }
  }

  /** ReplacingMergeTree-FINAL analogue: last-write-wins dedup of the
    * series index by fingerprint (cflux.js:754). */
  private def dedupIndex(seriesIndex: DataFrame): DataFrame =
    seriesIndex
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("fingerprint")).orderBy(col("date").desc)))
      .filter(col("__rn") === 1).drop("__rn")

  def seriesSide(seriesIndex: DataFrame, measurement: String, metric: String,
                 tagFilters: Seq[Ast.TagFilter],
                 groupTags: Seq[String] = Nil,
                 tagOrGroups: Seq[Seq[Ast.TagFilter]] = Nil): DataFrame =
    seriesSideMulti(seriesIndex, measurement, Seq(metric), tagFilters,
      groupTags, tagOrGroups)

  /** [[seriesSide]] over a SET of metrics — the multi-metric pivot plans
    * one samples scan for all of them; `name` in the group keys keeps
    * the metrics separated downstream. */
  def seriesSideMulti(seriesIndex: DataFrame, measurement: String, metrics: Seq[String],
                      tagFilters: Seq[Ast.TagFilter],
                      groupTags: Seq[String] = Nil,
                      tagOrGroups: Seq[Seq[Ast.TagFilter]] = Nil): DataFrame = {
    val deduped = dedupIndex(seriesIndex)
      .filter(col("measurement") === measurement && col("name").isin(metrics: _*))
    val anded = tagFilters.foldLeft(deduped)((df, tf) => df.filter(tagPred(tf)))
    // OR-groups: AND across groups, OR within one (each group one
    // predicate Column — still a plain pushable filter on the small
    // series relation)
    val tagged = tagOrGroups.foldLeft(anded)((df, g) =>
      df.filter(g.map(tagPred).reduce(_ || _)))
    val exploded = tagged
      .select(col("fingerprint"), col("name"),
        explode(arrays_zip(col("labelname"), col("labelvalue"))).as("lp"))
      .select(col("fingerprint"), col("name"),
        col("lp.labelname").as("labelname"), col("lp.labelvalue").as("labelvalue"))
    if (groupTags.nonEmpty) exploded.filter(col("labelname").isin(groupTags: _*))
    else exploded
  }

  def plan(spark: SparkSession, stmt: Ast.Statement, cat: TsCatalog, nowMs: Long): DataFrame =
    stmt match {
      case s: Ast.Select            => planSelect(spark, s, cat, nowMs)
      case Ast.ShowLimited(inner, lim, off) =>
        // pagination rides the SAME Catalyst plan as the listing —
        // offset/limit are plan nodes, not a driver-side slice
        val df0 = plan(spark, inner, cat, nowMs)
        val df1 = off.map(df0.offset).getOrElse(df0)
        lim.map(df1.limit).getOrElse(df1)
      case Ast.ShowDatabases        => spark.createDataFrame(
        spark.sparkContext.parallelize(cat.databases.map(org.apache.spark.sql.Row(_))),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("name", org.apache.spark.sql.types.StringType))))
      case Ast.ShowMeasurements(_, regex)  =>
        // response column is "name" (cflux.js:654, InfluxDB shape);
        // WITH MEASUREMENT =~ /re/ filters (unanchored, like InfluxDB)
        val base = cat.seriesIndex.select(col("measurement").as("name")).distinct()
        regex.fold(base)(re => base.filter(col("name").rlike(re)))
          .orderBy("name")
      case Ast.ShowFieldKeys(from)  =>
        scoped(cat, from).select(col("name").as("fieldKey"))
          .distinct()
          // reference reports every field as float (cflux.js:461,483)
          .withColumn("fieldType", lit("float"))
          .orderBy("fieldKey")
      case Ast.ShowTagKeys(from, tagFilters) =>
        tagFilters.foldLeft(scoped(cat, from))((df, tf) => df.filter(tagPred(tf)))
          .select(explode(col("labelname")).as("tagKey"))
          .distinct().orderBy("tagKey")
      case Ast.ShowTagValues(from, keys, keyRegex, tagFilters) =>
        // WHERE conjuncts scope the contributing SERIES before the pair
        // explode (missing-tag-as-'' semantics, shared predicate)
        val pairs = tagFilters
          .foldLeft(scoped(cat, from))((df, tf) => df.filter(tagPred(tf)))
          .select(explode(arrays_zip(col("labelname"), col("labelvalue"))).as("lp"))
          .select(col("lp.labelname").as("key"), col("lp.labelvalue").as("value"))
        val filtered = keyRegex match {
          case Some(re) => pairs.filter(col("key").rlike(re))
          case None if keys.nonEmpty => pairs.filter(col("key").isin(keys: _*))
          case None => pairs
        }
        filtered.distinct().orderBy("key", "value")
      case Ast.ShowSeries(from, tagFilters) =>
        // InfluxDB series key: measurement,k1=v1,k2=v2 (tags already sorted
        // by key in the index). Distinct across field names — the series
        // key excludes the field (one key per tagset, not per metric).
        // WHERE tag conjuncts apply per series row with missing-tag-as-''
        // semantics (same predicate as the SELECT path's series side).
        tagFilters.foldLeft(scoped(cat, from))((df, tf) => df.filter(tagPred(tf)))
          .select(concat(col("measurement"), lit(","),
            array_join(zip_with(col("labelname"), col("labelvalue"),
              (k, v) => concat(k, lit("="), v)), ",")).as("key"))
          .distinct().orderBy("key")
      case Ast.ShowSeriesCardinality(from) =>
        // exact distinct-tagset count; the approximate path at scale is
        // pipeline.Sketches (HLL over the same key)
        scoped(cat, from)
          .select(concat(col("measurement"), lit(","),
            array_join(zip_with(col("labelname"), col("labelvalue"),
              (k, v) => concat(k, lit("="), v)), ",")).as("key"))
          .agg(countDistinct("key").as("count"))
      case Ast.ShowCardinality(kind, from) =>
        // exact counts over the schema-sized series index (single "count"
        // row; InfluxDB groups by measurement — simplification documented)
        val base = scoped(cat, from)
        kind match {
          case "measurement" =>
            base.agg(countDistinct("measurement").as("count"))
          case "field_key" =>
            base.agg(countDistinct("measurement", "name").as("count"))
          case "tag_key" =>
            base.select(col("measurement"), explode(col("labelname")).as("k"))
              .agg(countDistinct("measurement", "k").as("count"))
          case other => throw new IllegalArgumentException(s"bad cardinality kind $other")
        }
      case Ast.ShowTagValuesCardinality(from, keys) =>
        // distinct value count per tag key over the schema-sized series
        // index (exact; the scale path for data-sized cardinality is the
        // HLL sketch in pipeline.Sketches)
        val pairs = scoped(cat, from)
          .select(explode(arrays_zip(col("labelname"), col("labelvalue"))).as("lp"))
          .select(col("lp.labelname").as("key"), col("lp.labelvalue").as("value"))
        val filtered = if (keys.nonEmpty) pairs.filter(col("key").isin(keys: _*)) else pairs
        filtered.groupBy("key").agg(countDistinct("value").as("count")).orderBy("key")
      case Ast.ShowRetentionPolicies(_) =>
        // fabricated static response, matching cflux.js:419-448
        import spark.implicits._
        Seq(("autogen", "0s", "168h0m0s", 1, true))
          .toDF("name", "duration", "shardGroupDuration", "replicaN", "default")
      case other =>
        throw new IllegalArgumentException(s"not a plannable query: $other")
    }

  private def scoped(cat: TsCatalog, from: Option[Ast.TableRef]): DataFrame =
    from.map(r => cat.seriesIndex.filter(col("measurement") === r.measurement))
      .getOrElse(cat.seriesIndex)

  /** Measurement names a regex FROM resolves to, sorted (extension). */
  def regexMeasurements(cat: TsCatalog, pattern: String): Seq[String] = {
    val r = pattern.r
    cat.measurements.keys.toSeq.filter(m => r.findFirstIn(m).isDefined).sorted
  }

  def planSelect(spark: SparkSession, s: Ast.Select, cat: TsCatalog, nowMs: Long): DataFrame =
    planSelectImpl(spark, s, cat, nowMs, renameFields = false)

  /** Plan a SELECT … INTO body: output-field naming (like subqueries — the
    * written field key is the aggregate/alias name, InfluxDB INTO
    * semantics) plus the source fingerprint kept in the output so the
    * engine can rebuild series identity for the target measurement.
    * Shapes whose output rows don't carry a per-series fingerprint are
    * rejected explicitly (surfaced as per-statement errors). */
  def planSelectInto(spark: SparkSession, s: Ast.Select, cat: TsCatalog, nowMs: Long): DataFrame = {
    val selectors = Set("top", "bottom", "elapsed", "integral", "distinct", "mode", "sample")
    if (s.fields.exists(_.transform.isDefined))
      throw new IllegalArgumentException("INTO does not support window transforms")
    if (s.fields.exists(_.expr.isDefined))
      throw new IllegalArgumentException("INTO does not support arithmetic projections")
    if (s.fields.exists(_.func.exists(selectors)))
      throw new IllegalArgumentException("INTO does not support selector functions")
    if (s.fill.isDefined)
      throw new IllegalArgumentException("INTO does not support FILL")
    if (s.groupByTags.nonEmpty)
      throw new IllegalArgumentException("INTO supports per-series grouping (GROUP BY *) only")
    if (s.from.regex.isDefined)
      throw new IllegalArgumentException("INTO does not support regex FROM")
    if (s.fromSub.isDefined)
      throw new IllegalArgumentException("INTO does not support subquery FROM")
    if (s.fromMulti.nonEmpty)
      throw new IllegalArgumentException("INTO does not support multi-measurement FROM")
    planSelectImpl(spark, s, cat, nowMs, renameFields = true, keepFp = true)
  }

  /** The SELECT output relation with zero rows — the empty-store /
    * unmatched-projection result ([[planSelectImpl]]'s normal output
    * columns; fingerprint first when the INTO path asked for it). */
  private def emptySelectResult(spark: SparkSession, keepFp: Boolean): DataFrame = {
    import org.apache.spark.sql.types._
    val base = Seq(
      StructField("time_ms", LongType), StructField("name", StringType),
      StructField("value", DoubleType), StructField("labelname", StringType),
      StructField("labelvalue", StringType), StructField("message", StringType))
    val fields = if (keepFp) StructField("fingerprint", LongType) +: base else base
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(fields))
  }

  /** Synthetic fingerprint for a subquery's per-(label pair) series. */
  private def subFingerprint: Column =
    xxhash64(concat_ws("\u0000", col("name"), col("labelname"), col("labelvalue")))

  /** @param renameFields inner-subquery mode: the output `name` becomes
    *                     the field's output name (alias/function), which
    *                     is the field key the OUTER query selects —
    *                     InfluxDB subquery naming. */
  private def planSelectImpl(spark: SparkSession, s: Ast.Select, cat: TsCatalog,
                             nowMs: Long, renameFields: Boolean,
                             keepFp: Boolean = false): DataFrame = {
    // FROM (SELECT …): plan the inner with field-name outputs, wrap its
    // result as a synthetic (samples, series index) catalog, and run the
    // outer over it. Series identity = the inner's per-(label pair) rows
    // — the engine's series model (the reference pivots one series per
    // tag pair, cflux.js:815-832); InfluxDB proper keys series by full
    // tagset (documented divergence). Fully lazy: the inner plan nests
    // inside the outer's, one composed Catalyst tree.
    s.fromSub.foreach { inner0 =>
      // InfluxDB: an inner query without its own time bounds inherits the
      // outer WHERE time
      val inner =
        if (inner0.time.lower.isEmpty && inner0.time.upper.isEmpty)
          inner0.copy(time = s.time)
        else inner0
      // Materialize the inner result ONCE (lazy localCheckpoint = the
      // DataFrame form of CTE materialization): the outer consumes it at
      // least twice — synthetic samples AND synthetic series derive from
      // it, and each arithmetic leaf plans it again. Without this the
      // subtree duplicates per consumer and Spark re-executes the whole
      // inner scan+aggregate each time (no ReuseExchange across the
      // copies — verified on the final adaptive plan). The checkpointed
      // relation is the inner's AGGREGATED output — bounded by buckets ×
      // series, far smaller than its input at any scale — and its blocks
      // are dropped by the ContextCleaner when the plan is collected.
      val innerDf = planSelectImpl(spark, inner, cat, nowMs, renameFields = true)
        .localCheckpoint(false)
      val synthSamples = innerDf.select(
        subFingerprint.as("fingerprint"),
        col("time_ms").as("timestamp_ms"), col("value"), col("message"))
      val synthSeries = innerDf.select("name", "labelname", "labelvalue").distinct()
        .select(
          lit(java.sql.Date.valueOf("2024-01-01")).as("date"),
          subFingerprint.as("fingerprint"),
          lit(s.from.measurement).as("measurement"),
          col("name"),
          array(col("labelname")).as("labelname"),
          array(col("labelvalue")).as("labelvalue"))
      val synthCat = TsCatalog(cat.databases,
        Map(s.from.measurement -> synthSamples), synthSeries)
      return planSelectImpl(spark, s.copy(fromSub = None), synthCat, nowMs, renameFields, keepFp)
    }
    // FROM "a", "b": union the identical plan over every listed
    // measurement (same mechanics as regex FROM below; the engine names
    // each measurement's series separately)
    if (s.fromMulti.nonEmpty) {
      return (s.from +: s.fromMulti).map { r =>
        planSelectImpl(spark, s.copy(from = r, fromMulti = Nil), cat, nowMs, renameFields)
      }.reduce(_ unionAll _)
    }
    // regex FROM: union the identical plan over every matching measurement
    // (rows carry the same schema; JSON naming per measurement happens at
    // the engine layer, which plans each match separately)
    s.from.regex.foreach { pattern =>
      val ms = regexMeasurements(cat, pattern)
      if (ms.isEmpty) throw new UnknownMeasurement(s"no measurement matches /$pattern/")
      return ms.map { m =>
        planSelectImpl(spark, s.copy(from = s.from.copy(measurement = m, regex = None)),
          cat, nowMs, renameFields)
      }.reduce(_ unionAll _)
    }
    val samples = cat.measurements.getOrElse(s.from.measurement,
      throw new UnknownMeasurement(s"unknown measurement ${s.from.measurement}"))
    // tz() composes with the agg/selector bucket paths; FILL's bucket
    // spine and integral's boundary clipping are UTC-arithmetic — an
    // explicit error beats silently-UTC buckets under a tz() clause
    if (s.tz.isDefined && s.fill.isDefined)
      throw new IllegalArgumentException("tz() with FILL is not supported")
    if (s.tz.isDefined && s.fields.exists(_.func.contains("integral")))
      throw new IllegalArgumentException("tz() with integral is not supported")
    val (fromMs, toMs) = resolveTime(s.time, nowMs)
    val bucketMs = s.groupByTimeMs.getOrElse(TimeUnits.MsPerMinute) // 1-min default (cflux.js:749)
    val bucketOffMs = s.groupByTimeOffsetMs // GROUP BY time(x, offset) shift

    // `SELECT *` / `mean(*)` / `SELECT /re/`: expand to the measurement's
    // field keys from the series index — a driver-side collect bounded by
    // field-key cardinality (schema-sized, not data-sized)
    val fields: Seq[Ast.Field] =
      if (s.fields.exists(f => f.name == "*" || f.nameRegex.isDefined)) {
        val names = cat.seriesIndex
          .filter(col("measurement") === s.from.measurement)
          .select("name").distinct().orderBy("name")
          .collect().map(_.getString(0)).toSeq
        if (names.isEmpty)
          // a store with no series for the measurement: InfluxDB returns
          // an empty statement result for star/regex projections, not an
          // error — total on empty input (the literal-field path below
          // yields the same empty relation through the normal plan)
          return emptySelectResult(spark, keepFp)
        val expanded = s.fields.flatMap { f =>
          if (f.name == "*") names.map(n => f.copy(name = n, alias = None))
          else f.nameRegex match {
            case Some(re) =>
              val p = java.util.regex.Pattern.compile(re)
              names.filter(n => p.matcher(n).find())
                .map(n => f.copy(name = n, alias = None, nameRegex = None))
            case None => Seq(f)
          }
        }
        if (expanded.isEmpty)
          // regex projection matching no field keys: empty result, like
          // InfluxDB (an unmatched /re/ SELECT is not an error)
          return emptySelectResult(spark, keepFp)
        expanded
      } else s.fields

    // raw (non-aggregated) SELECT — honest InfluxDB semantics the
    // reference can't express (it hardwires avg, cflux.js:749): no
    // bucketing, no groupBy; each sample row at its own timestamp
    def leavesOf(f: Ast.Field): Seq[Ast.Field] =
      f.expr.map(Ast.FExpr.leaves).getOrElse(Seq(f))
    val isRaw = fields.flatMap(leavesOf).forall(_.func.isEmpty) &&
      s.groupByTimeMs.isEmpty && s.fill.isEmpty

    // Shared leaf plumbing: the time-filtered samples ⋈ series relation
    // for one metric, with WHERE field-value conjuncts applied. Factored
    // out of planLeaf so the aggregate-pivot fast path (several
    // functions of the SAME metric in one grouped pass) reuses it.
    def timedFor(metric: String): DataFrame = {
      val series = seriesSide(cat.seriesIndex, s.from.measurement, metric,
        s.tagFilters, s.groupByTags, s.tagOrGroups)
      val timed0 = samples
        // time filter FIRST: prunes hour partitions + parquet row groups
        // before the join (reference PREWHERE minute BETWEEN, cflux.js:765).
        // The redundant hour-bucket bounds are what actually PRUNE a
        // `hour=`-partitioned store: partition pruning needs a predicate
        // on the partition column itself — timestamp_ms only buys
        // row-group skipping after the file is already listed.
        .transform(timeFiltered(_, fromMs, toMs))
        // ANY INNER JOIN USING(fingerprint) with broadcast series side (J1)
        .join(broadcast(series), Seq("fingerprint"))
      // WHERE field-value conjuncts apply to RAW points BEFORE any
      // aggregation (InfluxDB). Same-field filters land next to the time
      // filter, pushing into the scan alongside it. Filters on OTHER
      // fields pair across the per-field row model on (tagset,
      // timestamp): InfluxDB drops the whole point when the condition
      // field fails, so the projection's rows semi-join against the
      // qualifying (tagset, ts) keys of the condition field's rows.
      def opFilter(df: DataFrame, ff: Ast.FieldFilter): DataFrame = ff.op match {
        case ">"  => df.filter(col("value") > ff.v)
        case ">=" => df.filter(col("value") >= ff.v)
        case "<"  => df.filter(col("value") < ff.v)
        case "<=" => df.filter(col("value") <= ff.v)
        case "="  => df.filter(col("value") === ff.v)
        case "!=" => df.filter(col("value") =!= ff.v)
        case o    => throw new IllegalArgumentException(s"bad field operator $o")
      }
      val (own, cross) = s.fieldFilters.partition(_.name == metric)
      val timed1 = own.foldLeft(timed0)(opFilter)
      if (cross.isEmpty) timed1 else {
        // tagset key = hash of the full (sorted) tag arrays — the series
        // identity MINUS the field, shared by every field of one series.
        // The fingerprint→tagkey map is schema-sized → broadcast; the
        // (tagkey, ts) semi-join is the only data-sized exchange, hash-
        // partitioned on keys that are unique per point at scale.
        val fpTag = dedupIndex(cat.seriesIndex)
          .filter(col("measurement") === s.from.measurement)
          .select(col("fingerprint"), col("name"),
            xxhash64(concat_ws("\u0000",
              concat(col("labelname"), col("labelvalue")))).as("__tagkey"))
        val qual = cross.groupBy(_.name).map { case (fn, ffs) =>
          val fps = fpTag.filter(col("name") === fn)
            .select("fingerprint", "__tagkey")
          val q0 = samples
            .transform(timeFiltered(_, fromMs, toMs))
            .join(broadcast(fps), Seq("fingerprint"))
          ffs.foldLeft(q0)(opFilter)
            .select(col("__tagkey"), col("timestamp_ms"))
        }.reduce(_.join(_, Seq("__tagkey", "timestamp_ms"))) // AND across fields
          .distinct()
        timed1
          .join(broadcast(fpTag.select("fingerprint", "__tagkey").distinct()),
            Seq("fingerprint"))
          .join(qual, Seq("__tagkey", "timestamp_ms"), "left_semi")
          .drop("__tagkey")
      }
    }

    def bucketStart: Column = s.tz match {
      case None =>
        (floor((col("timestamp_ms") - bucketOffMs) / bucketMs) * bucketMs
          + bucketOffMs).cast("long")
      case Some(zone) =>
        // tz('Zone'): floor on the LOCAL wall-clock epoch, then map the
        // local bucket start back to a UTC instant — buckets align to
        // the zone's calendar boundaries, DST-aware (JVM tzdata; the
        // DuckDB oracle's IANA tables agree on post-1970 zones)
        val localMs = unix_millis(
          from_utc_timestamp(timestamp_millis(col("timestamp_ms")), zone))
        val localBucket = (floor((localMs - bucketOffMs) / bucketMs) * bucketMs
          + bucketOffMs).cast("long")
        unix_millis(to_utc_timestamp(timestamp_millis(localBucket), zone))
    }

    def planLeaf(f: Ast.Field): DataFrame = {
      val outName = f.alias.getOrElse(
        f.transform.map(_.fn).getOrElse(f.func.getOrElse("mean")))
      val timed = timedFor(f.name)
      // subquery-inner mode: the output name is the field's output name
      // (the field key the outer query will select)
      val nameOut = if (renameFields && !isRaw) lit(outName) else col("name")
      // transforms compose over bucketed AGGREGATES only; wrapping a
      // selector (top/bottom/elapsed/integral) is an explicit error, not
      // a silent drop
      if (f.transform.isDefined &&
          f.func.exists(Set("top", "bottom", "elapsed", "integral", "distinct", "mode", "sample")))
        throw new IllegalArgumentException(
          s"${f.transform.get.fn} cannot wrap selector ${f.func.get}")
      def fpCol: Seq[Column] = if (keepFp) Seq(col("fingerprint")) else Nil
      if (isRaw) {
        // transform output is named after the transform (InfluxDB:
        // difference("v") -> column "difference"); plain raw keeps the
        // field key
        val rawName = if (f.transform.isDefined) lit(outName) else nameOut
        val rawOut = timed.select(fpCol ++ Seq(col("timestamp_ms").as("time_ms"),
          rawName.as("name"), col("value"), col("labelname"), col("labelvalue"),
          col("message")): _*)
        // transform directly over raw points (difference("v"),
        // derivative("v", 1s), cumulative_sum, moving_average): the same
        // per-series Tick windows, applied at point granularity
        f.transform.map { t =>
          if (t.fn.startsWith("holt_winters"))
            throw new IllegalArgumentException(
              s"${t.fn} requires an aggregate and GROUP BY time")
          applyTransform(rawOut, t, bucketMs)
        }.getOrElse(rawOut)
      } else if (f.func.isEmpty && f.transform.isDefined) {
        // transform of a bare field under GROUP BY time: InfluxDB requires
        // an aggregate inside the call — explicit error, not a silent mean
        throw new IllegalArgumentException(
          s"${f.transform.get.fn} over a bare field requires no GROUP BY time " +
            "(or wrap the field in an aggregate)")
      } else if (f.func.contains("elapsed")) {
        // elapsed("v"[, unit]): truncated time delta between consecutive
        // RAW points of each series, emitted at the later point (InfluxQL;
        // default unit 1ms). One per-series window, no global sort.
        val unitMs = f.argDur.getOrElse(1L)
        val partCols = (if (s.groupByTags.nonEmpty) Nil else Seq(col("fingerprint"))) ++
          Seq(col("name"), col("labelname"), col("labelvalue"), col("message"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(partCols: _*).orderBy(col("timestamp_ms"), col("value"))
        timed.withColumn("__pt", lag("timestamp_ms", 1).over(w))
          .filter(col("__pt").isNotNull)
          .select(col("timestamp_ms").as("time_ms"), nameOut.as("name"),
            floor((col("timestamp_ms") - col("__pt")) / unitMs.toDouble)
              .cast("double").as("value"),
            col("labelname"), col("labelvalue"), col("message"))
      } else if (f.func.contains("integral")) {
        // integral("v"[, unit]): trapezoid area under consecutive raw
        // points, summed per bucket per series, with segments CLIPPED at
        // bucket boundaries (interpolated endpoint values — InfluxDB
        // semantics). Each clipped piece is emitted as fixed-point 1e6
        // BEFORE the sum: exact int64 accumulation, partitioning/order
        // independent, and the oracle mirrors the floor per piece.
        val unitMs = f.argDur.getOrElse(1000L) // default 1s (InfluxQL)
        val partCols = (if (s.groupByTags.nonEmpty) Nil else Seq(col("fingerprint"))) ++
          Seq(col("name"), col("labelname"), col("labelvalue"), col("message"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(partCols: _*).orderBy(col("timestamp_ms"), col("value"))
        val segs = timed
          .withColumn("__pt", lag("timestamp_ms", 1).over(w))
          .withColumn("__pv", lag("value", 1).over(w))
          .filter(col("__pt").isNotNull && col("timestamp_ms") > col("__pt"))
        def bucketOf(t: Column): Column =
          (floor((t - bucketOffMs) / bucketMs) * bucketMs + bucketOffMs).cast("long")
        // one row per bucket the segment overlaps (segment end exclusive);
        // clip to the bucket and interpolate the clipped endpoint values
        val pieces = segs
          .withColumn("time_ms", explode(sequence(
            bucketOf(col("__pt")), bucketOf(col("timestamp_ms") - 1), lit(bucketMs))))
          .withColumn("__s", greatest(col("__pt"), col("time_ms")))
          .withColumn("__e", least(col("timestamp_ms"), col("time_ms") + bucketMs))
          .withColumn("__vs", col("__pv") + (col("value") - col("__pv")) *
            ((col("__s") - col("__pt")) / (col("timestamp_ms") - col("__pt"))))
          .withColumn("__ve", col("__pv") + (col("value") - col("__pv")) *
            ((col("__e") - col("__pt")) / (col("timestamp_ms") - col("__pt"))))
          .withColumn("__area_fp",
            floor((col("__vs") + col("__ve")) / 2.0 *
              ((col("__e") - col("__s")) / unitMs.toDouble) * 1e6).cast("long"))
        pieces
          .groupBy((partCols :+ col("time_ms")): _*)
          .agg((sum("__area_fp") / 1e6).as(outName))
          .select(col("time_ms"), nameOut.as("name"), col(outName).as("value"),
            col("labelname"), col("labelvalue"), col("message"))
      } else if (f.func.contains("distinct")) {
        // distinct("v"): the distinct field values per bucket per tag pair,
        // emitted at the bucket start (InfluxQL). A plain distinct over the
        // output shape — map-side partial dedup, no window, no extra
        // shuffle beyond the hash aggregate.
        timed.withColumn("time_ms", bucketStart)
          .select(col("time_ms"), nameOut.as("name"), col("value"),
            col("labelname"), col("labelvalue"), col("message"))
          .distinct()
      } else if (f.func.contains("mode")) {
        // mode("v"): most frequent value per bucket per series; ties →
        // lowest value (InfluxDB). Two stacked hash aggregates — count per
        // value, then single-pass argmax via max(struct(count, -value)) —
        // no window sort.
        val keys = (if (s.groupByTags.nonEmpty) Nil else Seq(col("fingerprint"))) ++
          Seq(col("time_ms"), col("name"), col("labelname"), col("labelvalue"),
            col("message"))
        timed.withColumn("time_ms", bucketStart)
          .groupBy((keys :+ col("value")): _*).agg(count(lit(1)).as("__c"))
          .groupBy(keys: _*)
          .agg(max(struct(col("__c"), (-col("value")).as("__negv"))).as("__b"))
          .select(col("time_ms"), nameOut.as("name"),
            (-col("__b.__negv")).cast("double").as("value"),
            col("labelname"), col("labelvalue"), col("message"))
      } else if (f.func.contains("sample")) {
        // sample("v", N): N points per bucket per series at their own
        // timestamps. InfluxDB picks via reservoir sampling (random,
        // unreproducible); we take the N smallest md5(timestamp) — a
        // deterministic uniform-spread pick any engine can replay
        // (documented divergence). Same row_number window shape as
        // top/bottom: partitions are series × buckets, no global sort.
        val n = f.arg.map(_.toInt).getOrElse(
          throw new IllegalArgumentException("sample needs a point count"))
        val bucketed = timed.withColumn("__bucket",
          if (s.groupByTimeMs.isDefined) bucketStart else lit(0L))
        val partCols = (if (s.groupByTags.nonEmpty) Nil else Seq(col("fingerprint"))) ++
          Seq(col("__bucket"), col("name"), col("labelname"), col("labelvalue"), col("message"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(partCols: _*)
          .orderBy(md5(col("timestamp_ms").cast("string")), col("timestamp_ms"))
        bucketed.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= n)
          .select(col("timestamp_ms").as("time_ms"), nameOut.as("name"), col("value"),
            col("labelname"), col("labelvalue"), col("message"))
      } else if (f.func.exists(fn => fn == "top" || fn == "bottom")) {
        // top/bottom SELECTORS (InfluxQL): N extreme POINTS per bucket per
        // series, emitted at their own timestamps. Without GROUP BY time
        // the whole range is one bucket (InfluxDB semantics). A per-group
        // row_number window — no global sort; partitions are series ×
        // buckets.
        val n = f.arg.map(_.toInt).getOrElse(
          throw new IllegalArgumentException(s"${f.func.get} needs a point count"))
        val bucketed = timed.withColumn("__bucket",
          if (s.groupByTimeMs.isDefined) bucketStart else lit(0L))
        val ord =
          if (f.func.contains("top")) Seq(col("value").desc, col("timestamp_ms").asc)
          else Seq(col("value").asc, col("timestamp_ms").asc)
        f.selTag match {
          case Some(tag) =>
            // 3-arg form top("field", "tag", N): the single extreme point
            // per tag VALUE, for the N tag values with the most extreme
            // points (InfluxDB's per-tag-value competition). Two stacked
            // windows: best-per-tag-value (competing across series that
            // share the value), then rank the tag values; neither is a
            // global sort — partitions are buckets × tag values.
            val tagged = bucketed.filter(col("labelname") === tag)
            val w1 = org.apache.spark.sql.expressions.Window
              .partitionBy(col("__bucket"), col("name"), col("labelname"), col("labelvalue"))
              .orderBy(ord: _*)
            val best = tagged.withColumn("__rn", row_number().over(w1))
              .filter(col("__rn") === 1)
            val rankOrd =
              (if (f.func.contains("top")) col("value").desc else col("value").asc) +:
                Seq(col("labelvalue").asc)
            val w2 = org.apache.spark.sql.expressions.Window
              .partitionBy(col("__bucket"), col("name"), col("labelname"))
              .orderBy(rankOrd: _*)
            best.withColumn("__rk", row_number().over(w2)).filter(col("__rk") <= n)
              .select(col("timestamp_ms").as("time_ms"), nameOut.as("name"), col("value"),
                col("labelname"), col("labelvalue"), col("message"))
          case None =>
            val partCols = (if (s.groupByTags.nonEmpty) Nil else Seq(col("fingerprint"))) ++
              Seq(col("__bucket"), col("name"), col("labelname"), col("labelvalue"), col("message"))
            val w = org.apache.spark.sql.expressions.Window
              .partitionBy(partCols: _*).orderBy(ord: _*)
            bucketed.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= n)
              .select(col("timestamp_ms").as("time_ms"), nameOut.as("name"), col("value"),
                col("labelname"), col("labelvalue"), col("message"))
        }
      } else {
        val agged = timed
          .withColumn("time_ms", bucketStart)
          // honored GROUP BY tags collapse across series (no fingerprint in
          // the keys); default keeps per-series groups like the reference
          // (A2, cflux.js:766)
          .groupBy((if (s.groupByTags.nonEmpty) Nil
                    else Seq(col("fingerprint"))) ++
            Seq(col("time_ms"), col("name"),
              col("labelname"), col("labelvalue"), col("message")): _*)
          .agg(aggFor(f.func, col("value"), col("timestamp_ms"), f.arg).cast("double").as(outName))
          .select(fpCol ++ Seq(col("time_ms"), nameOut.as("name"), col(outName).as("value"),
            col("labelname"), col("labelvalue"), col("message")): _*)
        val filled = fillGaps(agged, s.fill, fromMs, toMs, bucketMs, bucketOffMs)
        // window transform over the (filled) bucketed series — the
        // function-of-function surface (operators.Tick over SELECT shape)
        f.transform.map(applyTransform(filled, _, bucketMs)).getOrElse(filled)
      }
    }

    // Multi-metric aggregate pivot: several plain-aggregate projections
    // (`SELECT mean("a"), count("b"), …`) share ONE samples scan and ONE
    // grouped pass — `name` in the group keys keeps metrics separate, and
    // every field's aggregate is a column of the same hash aggregate. The
    // per-metric union model would otherwise scan the fact table once PER
    // field. The aggregated relation is bounded by buckets × series, so
    // it localCheckpoints once and each field's branch (rename → FILL →
    // transform, identical to the single-metric tail) reads the cache.
    // Field filters fall back to per-leaf plans (their own/cross split is
    // per-metric); selectors and raw projections are never pivoted.
    val multiPivotAggs = Set("mean", "sum", "count", "min", "max",
      "spread", "stddev", "median", "first", "last", "percentile")
    val multiPivotIdx: Map[Int, Ast.Field] =
      if (isRaw || s.fieldFilters.nonEmpty) Map.empty
      else fields.zipWithIndex.collect {
        case (f, i) if f.expr.isEmpty && f.func.exists(multiPivotAggs) => (i, f)
      }.toMap
    val multiPivotBranches: Map[Int, DataFrame] =
      if (multiPivotIdx.size < 2) Map.empty
      else {
        val pf = multiPivotIdx.toSeq.sortBy(_._1)
        val metrics = pf.map(_._2.name).distinct
        val series = seriesSideMulti(cat.seriesIndex, s.from.measurement, metrics,
          s.tagFilters, s.groupByTags, s.tagOrGroups)
        val timed = samples
          .transform(timeFiltered(_, fromMs, toMs))
          .join(broadcast(series), Seq("fingerprint"))
        val gKeys = (if (s.groupByTags.nonEmpty) Nil else Seq(col("fingerprint"))) ++
          Seq(col("time_ms"), col("name"),
            col("labelname"), col("labelvalue"), col("message"))
        val aggCols = pf.map { case (i, f) =>
          aggFor(f.func, col("value"), col("timestamp_ms"), f.arg)
            .cast("double").as(s"__a$i") }
        val agged = timed.withColumn("time_ms", bucketStart)
          .groupBy(gKeys: _*).agg(aggCols.head, aggCols.tail: _*)
          .localCheckpoint(false)
        pf.map { case (i, f) =>
          val outName = f.alias.getOrElse(
            f.transform.map(_.fn).getOrElse(f.func.get))
          val nameOut = if (renameFields) lit(outName) else col("name")
          val fpCols = if (keepFp) Seq(col("fingerprint")) else Nil
          val branch = agged.filter(col("name") === f.name)
            .select(fpCols ++ Seq(col("time_ms"), nameOut.as("name"),
              col(s"__a$i").as("value"),
              col("labelname"), col("labelvalue"), col("message")): _*)
          val filled = fillGaps(branch, s.fill, fromMs, toMs, bucketMs, bucketOffMs)
          i -> f.transform.map(applyTransform(filled, _, bucketMs)).getOrElse(filled)
        }.toMap
      }

    val perMetric = fields.zipWithIndex.map { case (f, fieldIdx) =>
      multiPivotBranches.get(fieldIdx).getOrElse(f.expr match {
        case None => planLeaf(f)
        case Some(tree) =>
          // arithmetic projection (extension): plan every leaf metric with
          // the ordinary machinery, pair points of the same series and
          // timestamp/bucket (InfluxQL drops unpaired points), and fold
          // the expression over the paired values — all built-in Column
          // ops, fully codegen'd. FILL applies per leaf BEFORE pairing,
          // so fill(0) arithmetic sees the gap rows.
          val leaves = Ast.FExpr.leaves(tree)
          val banned = Set("top", "bottom", "elapsed", "integral", "distinct", "mode", "sample")
          leaves.find(_.func.exists(banned)).foreach { lf =>
            throw new IllegalArgumentException(
              s"${lf.func.get} cannot appear in arithmetic") }
          if (leaves.exists(_.func.isEmpty) && leaves.exists(_.func.isDefined))
            throw new IllegalArgumentException(
              "cannot mix aggregated and raw fields in arithmetic")
          val outName = f.alias.getOrElse(f.name)
          // Aggregate-pivot fast path: every leaf is a plain aggregate of
          // the SAME field → compute all of them in ONE grouped pass over
          // one scan — no per-leaf re-plan, no pairing join at all. (The
          // general path below scans per leaf and joins on (time, labels);
          // at scale that is N scans of the same hour partitions plus an
          // exchange the single groupBy never needs.) FILL falls back to
          // the join path, whose per-leaf spine semantics are pinned.
          val pivotAggs = Set("mean", "sum", "count", "min", "max",
            "spread", "stddev", "median", "first", "last", "percentile")
          val pivotable = s.fill.isEmpty &&
            leaves.forall(lf => lf.transform.isEmpty &&
              lf.func.exists(pivotAggs) && lf.name == leaves.head.name)
          val (joined, vcols) =
            if (pivotable) {
              val gKeys = (if (s.groupByTags.nonEmpty) Nil else Seq(col("fingerprint"))) ++
                Seq(col("time_ms"), col("labelname"), col("labelvalue"), col("message"))
              val aggCols = leaves.zipWithIndex.map { case (lf, i) =>
                aggFor(lf.func, col("value"), col("timestamp_ms"), lf.arg)
                  .cast("double").as(s"__v$i") }
              val agged = timedFor(leaves.head.name)
                .withColumn("time_ms", bucketStart)
                .groupBy(gKeys: _*)
                .agg(aggCols.head, aggCols.tail: _*)
              (agged, leaves.zipWithIndex.map { case (lf, i) => (lf, col(s"__v$i")) }.toMap)
            } else {
              val keys = Seq("time_ms", "labelname", "labelvalue", "message")
              val planned = leaves.zipWithIndex.map { case (lf, i) =>
                planLeaf(lf).select(keys.map(col) :+ col("value").as(s"__v$i"): _*) }
              (planned.reduce(_.join(_, keys)),
                leaves.zipWithIndex.map { case (lf, i) => (lf, col(s"__v$i")) }.toMap)
            }
          def ev(e: Ast.FExpr): Column = e match {
            case Ast.FLeaf(lf)       => vcols(lf)
            case Ast.FNum(v)         => lit(v)
            case Ast.FBin("+", l, r) => ev(l) + ev(r)
            case Ast.FBin("-", l, r) => ev(l) - ev(r)
            case Ast.FBin("*", l, r) => ev(l) * ev(r)
            case Ast.FBin("/", l, r) => ev(l) / ev(r)
            case Ast.FBin(o, _, _) =>
              throw new IllegalArgumentException(s"bad operator $o")
            case Ast.FMath(fn, x, arg) =>
              val v = ev(x)
              fn match {
                case "abs"   => abs(v)
                case "ceil"  => ceil(v).cast("double")
                case "floor" => floor(v).cast("double")
                // half-up, NOT Spark round(): HALF_UP on the binary double
                // both engines hold — InfluxDB rounds half away from zero
                // (divergence at negative .5 boundaries, documented)
                case "round" => floor(v + 0.5).cast("double")
                case "sqrt"  => sqrt(v)
                case "exp"   => exp(v)
                case "ln"    => log(v)
                case "log2"  => log2(v)
                case "log10" => log10(v)
                case "pow"   => pow(v, lit(arg.getOrElse(
                  throw new IllegalArgumentException("pow needs an exponent"))))
                // log(field, b) = log base b (InfluxQL argument order is
                // (field, base); Spark's functions.log is (base, col))
                case "log"   => log(arg.getOrElse(
                  throw new IllegalArgumentException("log needs a base")), v)
                case "sin"   => sin(v)
                case "cos"   => cos(v)
                case "tan"   => tan(v)
                case "asin"  => asin(v)
                case "acos"  => acos(v)
                case "atan"  => atan(v)
                case "atan2" => atan2(v, lit(arg.getOrElse(
                  throw new IllegalArgumentException("atan2 needs a divisor"))))
                case other =>
                  throw new IllegalArgumentException(s"unknown math function $other")
              }
          }
          joined.select(col("time_ms"), lit(outName).as("name"),
            ev(tree).cast("double").as("value"),
            col("labelname"), col("labelvalue"), col("message"))
      })
    }

    val unioned = perMetric.reduce(_ unionAll _) // U1 (cflux.js:772)
    // SLIMIT/SOFFSET page SERIES (extension): page the small distinct
    // series-key relation, then semi-join — no global window, so the
    // row-side stays fully distributed at scale
    val paged = if (s.slimit.isDefined || s.soffset.isDefined) {
      val sk = Seq("name", "labelname", "labelvalue")
      val keys = unioned.select(sk.map(col): _*).distinct().orderBy(sk.map(col): _*)
      val off = s.soffset.map(keys.offset).getOrElse(keys)
      val kept = s.slimit.map(off.limit).getOrElse(off)
      unioned.join(broadcast(kept), sk, "left_semi")
    } else unioned
    val timeKey = if (s.orderDesc) col("time_ms").desc else col("time_ms").asc
    val sorted = paged.orderBy(timeKey, col("name"), col("labelname"),
      col("labelvalue"), col("message")) // O2 (+ honored ORDER BY time DESC)
    val off = s.offset.map(sorted.offset).getOrElse(sorted) // point pagination
    s.limit.map(off.limit).getOrElse(off) // O3, honored (divergence)
  }

  /** InfluxQL function-of-function: the parsed outer transform applied to
    * the per-series bucketed aggregate stream (after FILL, so gap-filled
    * buckets participate — e.g. derivative over fill(previous) yields 0).
    * Delegates to operators.Tick: one shuffle on the series key, codegen'd
    * window scan (SURVEY §2.5 note). */
  private def applyTransform(sel: DataFrame, t: Ast.Transform,
                             bucketMs: Long): DataFrame = t.fn match {
    case "holt_winters" =>
      graft.operators.HoltWinters.forecast(sel,
        t.n.getOrElse(throw new IllegalArgumentException("holt_winters needs a forecast count")),
        bucketMs)
    case "holt_winters_with_fit" =>
      graft.operators.HoltWinters.forecastWithFit(sel,
        t.n.getOrElse(throw new IllegalArgumentException(
          "holt_winters_with_fit needs a forecast count")),
        bucketMs)
    case "difference"  => graft.operators.Tick.difference(sel)
    case "non_negative_difference" =>
      graft.operators.Tick.difference(sel).filter(col("value") >= 0)
    case "derivative"  => graft.operators.Tick.derivative(sel, t.durMs.getOrElse(1000L))
    case "non_negative_derivative" =>
      graft.operators.Tick.derivative(sel, t.durMs.getOrElse(1000L))
        .filter(col("value") >= 0)
    case "moving_average" =>
      graft.operators.Tick.movingAverage(sel,
        t.n.getOrElse(throw new IllegalArgumentException("moving_average needs a window size")))
    case "cumulative_sum" => graft.operators.Tick.cumulativeSum(sel)
    case "exponential_moving_average" =>
      graft.operators.Tick.exponentialMovingAverage(sel,
        t.n.getOrElse(throw new IllegalArgumentException(
          "exponential_moving_average needs a window size")))
    case "double_exponential_moving_average" =>
      graft.operators.Tick.doubleExponentialMovingAverage(sel,
        t.n.getOrElse(throw new IllegalArgumentException(
          "double_exponential_moving_average needs a window size")))
    case "chande_momentum_oscillator" =>
      graft.operators.Tick.chandeMomentum(sel,
        t.n.getOrElse(throw new IllegalArgumentException(
          "chande_momentum_oscillator needs a period count")))
    case "kaufmans_efficiency_ratio" =>
      graft.operators.Tick.kaufmansEfficiency(sel,
        t.n.getOrElse(throw new IllegalArgumentException(
          "kaufmans_efficiency_ratio needs a period count")))
    case "relative_strength_index" =>
      graft.operators.Tick.relativeStrengthIndex(sel,
        t.n.getOrElse(throw new IllegalArgumentException(
          "relative_strength_index needs a period count")))
    case "triple_exponential_moving_average" =>
      graft.operators.Tick.tripleExponentialMovingAverage(sel,
        t.n.getOrElse(throw new IllegalArgumentException(
          "triple_exponential_moving_average needs a window size")))
    case "triple_exponential_derivative" =>
      graft.operators.Tick.tripleExponentialDerivative(sel,
        t.n.getOrElse(throw new IllegalArgumentException(
          "triple_exponential_derivative needs a window size")))
    case "kaufmans_adaptive_moving_average" =>
      graft.operators.Tick.kaufmansAdaptiveMovingAverage(sel,
        t.n.getOrElse(throw new IllegalArgumentException(
          "kaufmans_adaptive_moving_average needs a period count")))
    case other => throw new IllegalArgumentException(s"unsupported transform: $other")
  }

  /** Honest FILL() gap filling — an extension: the reference only injects
    * the text `FILL(null)` to pacify its parser and never fills
    * (cflux.js:378, SURVEY §2.5). Semantics follow InfluxDB: for each
    * series present in the range, emit every bucket in
    * [floor(from), floor(to)]; missing buckets get null / 0 / the
    * previous value. Series with no points at all stay absent.
    *
    * Scale: the spine is (series in result) × (buckets in range) — bounded
    * by the query range, built per-series with no extra shuffle beyond the
    * spine join (broadcast: the distinct-series side is small). */
  private def fillGaps(agged: DataFrame, fill: Option[String],
                       fromMs: Long, toMs: Long, bucketMs: Long,
                       bucketOffMs: Long = 0L): DataFrame =
    fill.map(_.toLowerCase) match {
      // fill(none): drop gap rows entirely — identical to the no-FILL
      // default here (InfluxDB's default for GROUP BY time is fill(null);
      // ours is none — documented divergence, explicit token honored)
      case Some("none") => agged
      case Some(mode) if mode == "null" || mode == "previous" ||
          mode == "linear" || numericFill(mode).isDefined =>
        val keys = Seq("name", "labelname", "labelvalue", "message")
        val fromBucket = Math.floorDiv(fromMs - bucketOffMs, bucketMs) * bucketMs + bucketOffMs
        val toBucket = Math.floorDiv(toMs - bucketOffMs, bucketMs) * bucketMs + bucketOffMs
        val spine = agged.select(keys.map(col): _*).distinct()
          .withColumn("time_ms",
            explode(sequence(lit(fromBucket), lit(toBucket), lit(bucketMs))))
        val joined = spine.join(agged, keys :+ "time_ms", "left")
          .select(col("time_ms"), col("name"), col("value"),
            col("labelname"), col("labelvalue"), col("message"))
        mode match {
          // fill(<number>): any numeric constant plugs the gaps —
          // fill(0) is just the common case (InfluxQL fill(100) etc.)
          case n if numericFill(n).isDefined =>
            joined.na.fill(numericFill(n).get, Seq("value"))
          case "previous" =>
            val w = org.apache.spark.sql.expressions.Window
              .partitionBy(keys.map(col): _*).orderBy("time_ms")
              .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
            joined.withColumn("value", last("value", ignoreNulls = true).over(w))
          case "linear" =>
            // interpolate interior gaps between the nearest non-null
            // neighbors; leading/trailing gaps stay null (InfluxDB
            // fill(linear)). Two ordered window passes per series.
            import org.apache.spark.sql.expressions.Window.{unboundedFollowing, unboundedPreceding}
            val wb = org.apache.spark.sql.expressions.Window
              .partitionBy(keys.map(col): _*).orderBy("time_ms")
            val wp = wb.rowsBetween(unboundedPreceding, 0)
            val wn = wb.rowsBetween(0, unboundedFollowing)
            joined
              .withColumn("__pv", last("value", ignoreNulls = true).over(wp))
              .withColumn("__pt",
                last(when(col("value").isNotNull, col("time_ms")), ignoreNulls = true).over(wp))
              .withColumn("__nv", first(col("value"), ignoreNulls = true).over(wn))
              .withColumn("__nt",
                first(when(col("value").isNotNull, col("time_ms")), ignoreNulls = true).over(wn))
              .withColumn("value",
                when(col("value").isNotNull, col("value"))
                  .when(col("__pv").isNotNull && col("__nv").isNotNull,
                    col("__pv") + (col("__nv") - col("__pv")) *
                      ((col("time_ms") - col("__pt")) / (col("__nt") - col("__pt")))))
              .drop("__pv", "__pt", "__nv", "__nt")
          case _ => joined // null
        }
      case _ => agged // absent or unrecognized
    }

  /** FILL(<number>) argument, if the token is a numeric literal (the
    * parser passes the raw token text through; "null"/"previous"/...
    * fall out as None). */
  private def numericFill(tok: String): Option[Double] =
    try Some(java.lang.Double.parseDouble(tok)) catch { case _: NumberFormatException => None }
}
