package graft.model

import org.apache.spark.sql.types._

/** Physical schemas of the engine's two table kinds.
  *
  * Mirrors the reference's data model (two ClickHouse DDLs at
  * /root/reference/cflux.js:152 and cflux.js:164) re-expressed as Spark
  * StructTypes over partitioned parquet. See SURVEY.md §1.2/§1.4.
  */
object Schemas {

  /** Samples table — one per measurement.
    *
    * Reference: cflux.js:152 `CREATE TABLE <m> (fingerprint UInt64,
    * timestamp_ms Int64, value Float64, string String, message String)
    * PARTITION BY toRelativeHourNum(...) ORDER BY (fingerprint, timestamp_ms)`.
    *
    * `hour` is the write-partition column (= floor(timestamp_ms / 3.6e6));
    * Catalyst partition pruning on a time-range filter then matches the
    * reference's hour-partition pruning for free.
    */
  val samples: StructType = StructType(Seq(
    StructField("fingerprint", LongType, nullable = false),
    StructField("timestamp_ms", LongType, nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("string", StringType, nullable = false), // field KEY (both row kinds)
    StructField("message", StringType, nullable = false), // string field value, else ""
    StructField("hour", LongType, nullable = false)
  ))

  /** Series-index table — one per database, shared by all measurements.
    *
    * Reference: cflux.js:164 (`time_series` ReplacingMergeTree ORDER BY
    * fingerprint) — last-write-wins dedup by fingerprint; we reproduce that
    * with `dropDuplicates("fingerprint")` at read (the FINAL analogue).
    */
  val seriesIndex: StructType = StructType(Seq(
    StructField("date", DateType, nullable = false),
    StructField("fingerprint", LongType, nullable = false),
    StructField("measurement", StringType, nullable = false),
    StructField("name", StringType, nullable = false), // field key
    StructField("labelname", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("labelvalue", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("labels", StringType, nullable = false) // canonical JSON
  ))

  /** Raw parsed-point schema: one row per line-protocol point before the
    * per-field explode (SURVEY §2.2 P1). */
  val point: StructType = StructType(Seq(
    StructField("measurement", StringType, nullable = false),
    StructField("tags", MapType(StringType, StringType, valueContainsNull = false), nullable = false),
    StructField("floatFields", MapType(StringType, DoubleType, valueContainsNull = false), nullable = false),
    StructField("stringFields", MapType(StringType, StringType, valueContainsNull = false), nullable = false),
    StructField("timestamp_ms", LongType, nullable = true)
  ))
}

/** Timestamp unit conversions, centralized (SURVEY §7.4: "ns wire → ms
  * storage → s/minute bucketing → ms response", reference cflux.js:360,749,795).
  */
object TimeUnits {
  val NsPerMs = 1000000L
  val MsPerSecond = 1000L
  val MsPerMinute = 60000L
  val MsPerHour = 3600000L

  def nsToMs(ns: Long): Long = Math.floorDiv(ns, NsPerMs)
  def msToHourBucket(ms: Long): Long = Math.floorDiv(ms, MsPerHour)
  def msToMinuteFloorMs(ms: Long): Long = Math.floorDiv(ms, MsPerMinute) * MsPerMinute

  /** InfluxQL duration literal → milliseconds (reference `to-time`,
    * cflux.js:27,708). Supports ns/u/µ/ms/s/m/h/d/w and compound
    * literals like "1h30m". */
  def durationMs(lit: String): Long = {
    val re = "([0-9]+)(ns|u|µs|us|ms|s|m|h|d|w)".r
    val ms = re.findAllMatchIn(lit).map { m =>
      val n = m.group(1).toLong
      m.group(2) match {
        case "ns"              => n / 1000000L
        case "u" | "µs" | "us" => n / 1000L
        case "ms"              => n
        case "s"               => n * 1000L
        case "m"               => n * 60000L
        case "h"               => n * 3600000L
        case "d"               => n * 86400000L
        case "w"               => n * 604800000L
      }
    }.sum
    require(re.findFirstIn(lit).isDefined, s"bad duration literal: $lit")
    // sub-ms durations floor to 0 → clamp to the storage resolution (1 ms);
    // a zero bucket would divide-by-zero downstream
    math.max(1L, ms)
  }
}
