package graft.sources

import graft.query.TsCatalog
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adapts the driver's `events` testdata table into the engine's time-series
  * model (SURVEY §1): measurement "events", tags {event_type, user_id},
  * field "value". Everything is built with codegen'd column expressions —
  * the canonical-series string + xxhash64 fingerprint here matches
  * `graft.ingest.Fingerprint` byte-for-byte, so adapter-built tables and
  * line-protocol-ingested tables interoperate.
  */
object EventsAdapter {

  val Measurement = "events"
  val FieldKey = "value"

  /** Canonical series JSON for tags sorted by key: event_type < user_id.
    * Each entry is rendered with `to_json` so tag values containing quotes,
    * backslashes, or control chars get Jackson's escaping — the exact rules
    * `Fingerprint.canonical` applies — keeping adapter-built and
    * ingest-built fingerprints byte-identical for all inputs. */
  private[sources] def canonicalCol(eventType: Column, userId: Column): Column =
    concat(
      lit("["),
      lit(s"""{"__measurement__":"$Measurement"}"""), lit(","),
      to_json(map(lit("event_type"), eventType)), lit(","),
      to_json(map(lit("user_id"), userId.cast("string"))), lit(","),
      lit(s"""{"__name__":"$FieldKey"}"""),
      lit("]"))

  /** Read events with the `ts` column surfaced as BOTH `ts_ns` (long) and
    * `ts_ms` (long), regardless of how the driver's testdata generator
    * encoded it. Dispatching on the READ schema (not an assumed one) is what
    * keeps a testdata regeneration from breaking the engine:
    *  - parquet TIMESTAMP(NANOS): Spark 4 only reads it as a raw long
    *    (spark.sql.legacy.parquet.nanosAsLong) — the long IS nanoseconds;
    *  - parquet timestamp[us] adjusted-to-UTC → TimestampType: unix_micros;
    *  - parquet timestamp[us] local → TimestampNTZType: cast to TimestampType
    *    first (session tz is pinned UTC engine-wide, so this is lossless),
    *    then unix_micros. A direct cast ntz→long is illegal in Spark 4. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Pin UTC here, not only in entrypoints: the TimestampNTZType branch
    // below is lossless only under a UTC session tz, and tools/bench mains
    // must not each have to remember it.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    import org.apache.spark.sql.types.{LongType, TimestampType, TimestampNTZType}
    val tsNs: Column = raw.schema("ts").dataType match {
      case LongType         => col("ts")
      case TimestampType    => unix_micros(col("ts")) * lit(1000L)
      case TimestampNTZType => unix_micros(col("ts").cast(TimestampType)) * lit(1000L)
      case other => throw new IllegalStateException(
        s"events.ts has unsupported type $other; expected long(ns)/timestamp/timestamp_ntz")
    }
    raw.withColumn("ts_ns", tsNs)
      .withColumn("ts_ms", expr("ts_ns div 1000000"))
  }

  /** events rows → samples table (FIXTURES.md §2 schema). */
  def samples(ev: DataFrame): DataFrame =
    ev.select(
      xxhash64(canonicalCol(col("event_type"), col("user_id"))).as("fingerprint"),
      col("ts_ms").as("timestamp_ms"),
      col("value"),
      lit(FieldKey).as("string"),
      lit("").as("message"),
      expr("ts_ms div 3600000").as("hour"))

  /** Distinct series → series-index table (FIXTURES.md §3 schema). Small by
    * construction (tag-cardinality-bounded): safe to broadcast at any SF. */
  def seriesIndex(ev: DataFrame): DataFrame =
    ev.select(col("event_type"), col("user_id").cast("string").as("user_id"))
      .distinct()
      .select(
        lit(java.sql.Date.valueOf("2024-01-01")).as("date"),
        xxhash64(canonicalCol(col("event_type"), col("user_id"))).as("fingerprint"),
        lit(Measurement).as("measurement"),
        lit(FieldKey).as("name"),
        array(lit("event_type"), lit("user_id")).as("labelname"),
        array(col("event_type"), col("user_id")).as("labelvalue"),
        canonicalCol(col("event_type"), col("user_id")).as("labels"))

  def catalog(spark: SparkSession, sfDir: String): TsCatalog = {
    val ev = events(spark, sfDir)
    TsCatalog(Seq("graft"), Map(Measurement -> samples(ev)), seriesIndex(ev))
  }

  /** Render events as InfluxDB line protocol — drives the real ingest path
    * (parser + fingerprint + type split) from parquet testdata. `props`
    * rides along as a string field to exercise the string pipeline. */
  def asLineProtocol(ev: DataFrame): DataFrame =
    graft.util.Spread(ev.select("event_type", "user_id", "value", "props", "ts_ns"))
      .select(concat(
      lit(Measurement),
      lit(",event_type="), col("event_type"),
      lit(",user_id="), col("user_id").cast("string"),
      lit(" value="), col("value").cast("string"),
      lit(",props=\""), regexp_replace(regexp_replace(col("props"), lit("\\\\"), lit("\\\\\\\\")), lit("\""), lit("\\\\\"")),
      lit("\" "),
      col("ts_ns").cast("string")).as("value"))
}
