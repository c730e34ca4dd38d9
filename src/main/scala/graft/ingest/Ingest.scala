package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Batch ingest pipeline: line-protocol text → (samples DF, series-index DF).
  *
  * Mirrors the reference's /write path (SURVEY §3.1, cflux.js:298-372):
  * parse each line, explode per field, fingerprint the series, split rows
  * into the float vs string pipeline, and register unseen series in the
  * series index. All of it executor-side (Dataset.flatMap over the pure
  * parser) — no driver loops, so the same code path scales to arbitrarily
  * many input splits.
  */
object Ingest {

  /** One output sample row (FIXTURES.md §2; reference DDL cflux.js:152).
    * `measurement` realizes the reference's table-per-measurement as a
    * partition column (one dataset per db, partition-pruned per query). */
  final case class SampleRow(
      fingerprint: Long,
      timestamp_ms: Long,
      value: Double,
      string: String, // field KEY
      message: String, // string value ("" on float rows)
      hour: Long,
      measurement: String
  )

  /** One series-index row (FIXTURES.md §3; reference cflux.js:327). */
  final case class SeriesRow(
      date: java.sql.Date,
      fingerprint: Long,
      measurement: String,
      name: String,
      labelname: Seq[String],
      labelvalue: Seq[String],
      labels: String
  )

  final case class IngestBatch(samples: DataFrame, series: DataFrame)

  /** One parsed point, pre-split by value type (internal to the parse
    * stage; both output relations derive from it). */
  final case class ParsedPoint(
      measurement: String,
      tags: Seq[(String, String)],
      floatFields: Seq[(String, Double)],
      stringFields: Seq[(String, String)],
      tsMs: Long
  )

  /** Parse + normalize a batch of line-protocol lines.
    *
    * @param nowMs  wall-clock fallback for points without a timestamp
    *               (reference cflux.js:360). Passed in, not sampled, so the
    *               pipeline stays deterministic and testable.
    * @param tsToNs multiplier converting wire timestamps to ns (InfluxDB
    *               `precision=` param; reference `tsDivide` env,
    *               cflux.js:10,712). 1 = wire is already ns.
    * @param materializeParsed localCheckpoint the parsed points so the
    *               samples and series relations don't each re-run the
    *               parse (use on batch call sites that consume BOTH —
    *               GraftEngine.write, foreachBatch sinks).
    */
  def fromLines(lines: Dataset[String], nowMs: Long, tsToNs: Long = 1L,
                materializeParsed: Boolean = false): IngestBatch = {
    val spark = lines.sparkSession
    import spark.implicits._

    val parsed0: Dataset[ParsedPoint] = lines.flatMap { line =>
      LineProtocol.parse(line) match {
        case Left(_) => Iterator.empty // malformed lines skipped (reference logs & continues)
        case Right(p) =>
          val tsMs = p.timestampNs.map(t => graft.model.TimeUnits.nsToMs(t * tsToNs)).getOrElse(nowMs)
          Iterator.single(ParsedPoint(
            p.measurement, p.tags,
            p.fields.collect { case (k, LineProtocol.FloatV(v)) => (k, v) },
            p.fields.collect { case (k, LineProtocol.StringV(v)) => (k, v) },
            tsMs))
      }
    }
    val parsed = if (materializeParsed) parsed0.localCheckpoint(true) else parsed0

    // Per-partition fingerprint memo — the executor-side analogue of the
    // reference's 50k-entry label LRU (cflux.js:126-130): series
    // cardinality ≪ sample count, so the canonical-JSON build + hash runs
    // once per series per partition instead of once per row. Bounded like
    // the reference's cache (clear-on-overflow ≈ LRU for a skew-free
    // key distribution).
    val MemoCap = 65536
    val samples = parsed.mapPartitions { it =>
      val memo = scala.collection.mutable.HashMap
        .empty[(String, Seq[(String, String)], String), Long]
      def fp(m: String, tags: Seq[(String, String)], k: String): Long = {
        if (memo.size > MemoCap) memo.clear()
        memo.getOrElseUpdate((m, tags, k), Fingerprint.of(m, tags, k))
      }
      it.flatMap { p =>
        val hour = graft.model.TimeUnits.msToHourBucket(p.tsMs)
        p.floatFields.iterator.map { case (k, v) =>
          SampleRow(fp(p.measurement, p.tags, k), p.tsMs, v, k, "", hour, p.measurement)
        } ++ p.stringFields.iterator.map { case (k, v) =>
          SampleRow(fp(p.measurement, p.tags, k), p.tsMs, 0.0, k, v, hour, p.measurement)
        }
      }
    }.toDF()

    val epochDay = new java.sql.Date(nowMs - Math.floorMod(nowMs, 86400000L))
    // Series rows: the same memo doubles as a partition-local first-seen
    // filter (the write-path LRU registration, cflux.js:321-332) — only
    // the first occurrence per partition emits; the dropDuplicates below
    // finishes the job across partitions.
    val series = parsed.mapPartitions { it =>
      val seen = scala.collection.mutable.HashSet
        .empty[(String, Seq[(String, String)], String)]
      it.flatMap { p =>
        val sorted = p.tags.sortBy(_._1)
        (p.floatFields.iterator ++ p.stringFields.iterator).flatMap { case (k, _) =>
          val key = (p.measurement, p.tags, k)
          if (seen.size > MemoCap) seen.clear()
          if (seen.add(key)) {
            val canon = Fingerprint.canonical(p.measurement, p.tags, k)
            Iterator.single(SeriesRow(epochDay, Fingerprint.hash(canon), p.measurement, k,
              sorted.map(_._1), sorted.map(_._2), canon))
          } else Iterator.empty
        }
      }
    }.toDF()
      // batch analogue of the write-path LRU (cflux.js:126-130,326): one
      // registration per fingerprint. Map-side partial dedup happens via the
      // aggregate; result is small (series cardinality, not sample count).
      .dropDuplicates("fingerprint")

    IngestBatch(samples, series)
  }

  /** Write samples partitioned by hour, sorted within partitions by
    * (fingerprint, timestamp_ms) — the parquet analogue of the reference's
    * `PARTITION BY toRelativeHourNum ORDER BY (fingerprint, timestamp_ms)`
    * (cflux.js:152): partition pruning on time ranges + row-group min/max
    * skipping on fingerprint. */
  def writeSamples(samples: DataFrame, path: String): Unit =
    samples
      .repartition(col("measurement"), col("hour"))
      .sortWithinPartitions("fingerprint", "timestamp_ms")
      .write.mode("append").partitionBy("measurement", "hour").parquet(path)

  /** Samples as a BUCKETED catalog table: hour-partitioned like
    * [[writeSamples]], additionally bucketed AND sorted by fingerprint
    * (SURVEY §7.4 100 TB note: "partitioned by hour + bucketed by
    * fingerprint"). Joins and aggregations keyed on fingerprint read the
    * bucket spec from the catalog and plan WITHOUT an Exchange on the big
    * side — at 100 TB the series join and every per-series window reuse
    * the on-disk clustering instead of shuffling the corpus. Requires a
    * catalog (`saveAsTable`) because the bucket spec lives in table
    * metadata, not parquet. */
  def writeSamplesBucketed(samples: DataFrame, table: String, buckets: Int = 32): Unit =
    samples
      .repartition(col("measurement"), col("hour"))
      .write.mode("overwrite")
      .partitionBy("measurement", "hour")
      .bucketBy(buckets, "fingerprint")
      .sortBy("fingerprint", "timestamp_ms")
      .saveAsTable(table)

  def writeSeriesIndex(series: DataFrame, path: String): Unit =
    series.write.mode("append").parquet(path)

  /** Read a series index with ReplacingMergeTree+FINAL semantics
    * (last-write-wins by fingerprint, cflux.js:164,754). */
  def readSeriesIndexFinal(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val raw = spark.read.parquet(path)
    raw.withColumn("__rn",
        row_number().over(Window.partitionBy(col("fingerprint")).orderBy(col("date").desc)))
      .filter(col("__rn") === 1).drop("__rn")
  }
}
