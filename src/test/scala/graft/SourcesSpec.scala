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
}
