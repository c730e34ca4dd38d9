package graft.streaming

import graft.ingest.Ingest
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured Streaming wrapper of the batch ingest pipeline — capability
  * parity with the reference's buffered /write path (SURVEY §2.9 T1-T5):
  *
  *  - T1 micro-batching: `Trigger.ProcessingTime` replaces the reference's
  *    5000-row/2000-ms record-cache flush (count-based triggers have no
  *    Spark equivalent; time bound kept, divergence documented in SURVEY);
  *  - T2 event time: point timestamp when present, else the batch's
  *    wall-clock (injectable for tests);
  *  - T3 late data: accepted unconditionally — samples carry no watermark,
  *    every row lands in the hour partition its own timestamp names;
  *  - T4 series-index dedup: per-batch `dropDuplicates` (already inside
  *    `Ingest.fromLines`) + left-anti join against the stored index — the
  *    streaming analogue of the reference's LRU + warm-load
  *    (cflux.js:126-130,199-229); restart-safe because the stored index IS
  *    the state (no state store to lose);
  *  - T5 delivery: `foreachBatch` + checkpointing gives at-least-once,
  *    strictly stronger than the reference's at-most-once; the subscription
  *    fan-out hook fires before parsing, matching cflux.js:313-315 ordering.
  *
  * Scale notes (100 TB): each micro-batch is one parse+explode pass (no
  * shuffle except the hour repartition at the sink) and one anti-join whose
  * right side is the series index (tag-cardinality-bounded → broadcast).
  * Parallelism follows the source's partitioning (e.g. Kafka partitions).
  */
object StreamingIngest {

  final case class Config(
      samplesPath: String,
      seriesPath: String,
      checkpointDir: String,
      triggerMs: Long = 2000L, // reference maxAge (cflux.js:109-118)
      /** Fixed event-time fallback for tests; None = wall clock (T2). */
      fixedNowMs: Option[Long] = None,
      /** Subscription fan-out (S9): called with each batch's raw lines
        * before parsing, fire-and-forget semantics up to the callback. */
      onBatch: Option[Dataset[String] => Unit] = None
  )

  /** Fingerprints already registered in the stored series index (empty
    * relation when the index doesn't exist yet — first ever batch). */
  private def existingFingerprints(spark: SparkSession, path: String): DataFrame =
    try spark.read.parquet(path).select("fingerprint").distinct()
    catch {
      case _: org.apache.spark.sql.AnalysisException =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("fingerprint",
              org.apache.spark.sql.types.LongType))))
    }

  /** File-backed line source with the reference's count-based flush bound
    * (5000 rows, cflux.js:109-118) approximated at the SOURCE: Spark has
    * no count trigger, but `maxFilesPerTrigger` caps how much each
    * micro-batch admits, which is where a rate bound belongs in a pull
    * model (a Kafka source gets the same property from
    * `maxOffsetsPerTrigger`). Combined with [[Config.triggerMs]] this
    * reproduces the reference's rows-OR-time flush as files-OR-time. */
  def fileLines(spark: SparkSession, dir: String,
                maxFilesPerTrigger: Int = 16): Dataset[String] = {
    import spark.implicits._
    spark.readStream.option("maxFilesPerTrigger", maxFilesPerTrigger).textFile(dir)
  }

  /** Start the ingest stream over a streaming Dataset of line-protocol
    * lines (socket, file, Kafka, or MemoryStream in tests). */
  def start(lines: Dataset[String], cfg: Config): StreamingQuery =
    lines.writeStream
      .queryName("graft-ingest")
      .trigger(Trigger.ProcessingTime(cfg.triggerMs))
      .option("checkpointLocation", cfg.checkpointDir)
      .foreachBatch { (batch: Dataset[String], _: Long) =>
        val spark = batch.sparkSession
        cfg.onBatch.foreach(f => f(batch)) // S9 fan-out before parse
        val nowMs = cfg.fixedNowMs.getOrElse(System.currentTimeMillis())
        val b = Ingest.fromLines(batch, nowMs, materializeParsed = true)
        Ingest.writeSamples(b.samples, cfg.samplesPath)
        val novel = b.series.join(
          broadcast(existingFingerprints(spark, cfg.seriesPath)),
          Seq("fingerprint"), "left_anti")
        Ingest.writeSeriesIndex(novel, cfg.seriesPath)
      }
      .start()
}
