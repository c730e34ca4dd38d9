package graft

import graft.ingest.Fingerprint
import graft.sources.EventsAdapter
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Adapter/ingest fingerprint interop: the column-built canonical string
  * (to_json, Jackson escaping) must hash identically to the Scala-built
  * one (Fingerprint.canonical) for every escapable input, so adapter-built
  * tables and line-protocol-ingested tables share series identity. */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  test("adapter fingerprints match Fingerprint.of for quotes/backslashes/control chars") {
    import spark.implicits._
    val nasty = Seq(
      "plain",
      """has"quote""",
      """back\slash""",
      "tab\there",
      "newline\nhere",
      "bellbell",
      "\b\f",
      """mixed\"both\\""")
    val ev = nasty.zipWithIndex
      .map { case (s, i) => (s, i.toLong, 1000L + i, 1.0) }
      .toDF("event_type", "user_id", "ts_ms", "value")
    val got = EventsAdapter.samples(ev.withColumn("ts_ns", col("ts_ms") * 1000000L))
      .select("fingerprint").as[Long].collect().toSeq
    val want = nasty.zipWithIndex.map { case (s, i) =>
      Fingerprint.of(EventsAdapter.Measurement,
        Seq("event_type" -> s, "user_id" -> i.toString), EventsAdapter.FieldKey)
    }
    assert(got === want)
  }

  // Schema-drift guard (round-3 postmortem): the driver regenerates testdata
  // and the `ts` column's parquet encoding has already changed once
  // (int64-ns → timestamp[us]). EventsAdapter.events must yield identical
  // ts_ns/ts_ms for every encoding the generator might emit.
  test("events() yields identical ts_ns across int64-ns / timestamp[us] / timestamp_ntz encodings") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-tsenc").toString
    val tsNs = Seq(1704067200000000000L, 1704067200123456000L, 1704070800999999000L)
    val rows = tsNs.zipWithIndex.map { case (ns, i) =>
      (ns, s"click$i", i.toLong, i.toDouble, s"p$i")
    }

    // encoding 1: raw int64 nanoseconds (pre-regeneration format)
    val longDir = s"$base/enc_long"
    rows.toDF("ts", "event_type", "user_id", "value", "props")
      .coalesce(1).write.parquet(s"$longDir/events.parquet")

    // encoding 2: timestamp[us] — Spark TimestampType writes parquet
    // timestamp(MICROS) (the current driver format)
    val usDir = s"$base/enc_us"
    rows.toDF("ts_raw", "event_type", "user_id", "value", "props")
      .withColumn("ts", timestamp_micros(expr("ts_raw div 1000")))
      .drop("ts_raw").select("ts", "event_type", "user_id", "value", "props")
      .coalesce(1).write.parquet(s"$usDir/events.parquet")

    // encoding 3: timestamp_ntz micros — parquet timestamp(MICROS,
    // isAdjustedToUTC=false), reads back as TimestampNTZType
    val ntzDir = s"$base/enc_ntz"
    rows.toDF("ts_raw", "event_type", "user_id", "value", "props")
      .withColumn("ts", timestamp_micros(expr("ts_raw div 1000")).cast("timestamp_ntz"))
      .drop("ts_raw").select("ts", "event_type", "user_id", "value", "props")
      .coalesce(1).write.parquet(s"$ntzDir/events.parquet")

    def read(dir: String): Seq[(Long, Long)] =
      EventsAdapter.events(spark, dir)
        .select("ts_ns", "ts_ms").as[(Long, Long)].collect().sorted.toSeq

    val fromLong = read(longDir)
    assert(fromLong.map(_._1) === tsNs.sorted)
    assert(read(usDir) === fromLong)
    assert(read(ntzDir) === fromLong)
  }
}
