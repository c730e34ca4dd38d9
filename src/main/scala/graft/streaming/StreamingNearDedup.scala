package graft.streaming

import graft.pipeline.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming near-duplicate filtering: incoming documents are admitted
  * only if none of their MinHash LSH bands collide with the band index of
  * everything admitted so far — the streaming face of [[Dedup.minhashLsh]],
  * the shape a crawl-ingest pipeline runs ahead of training-data storage.
  *
  * Semantics: band collision = REJECT (candidate-level, no exact-Jaccard
  * verify) — a recall-oriented conservative prefilter, strictly more
  * aggressive than the batch operator's verified pairs; the batch verify
  * can re-admit false positives offline. Within a batch the smallest
  * doc_id of a colliding group survives (deterministic under replay).
  *
  * State design (100 TB): the stored band index is the ONLY state — a
  * (doc_id, band, bv) parquet relation, Bands(=8) fixed-width rows per
  * admitted doc, so state size tracks the ADMITTED corpus, not the
  * stream; the probe is a left-semi equi-join on (band, bv) that Spark
  * shuffles on band-value keys (hash-distributed by construction). No
  * state store, so restart safety falls out of checkpointed foreachBatch
  * + append-only writes: a fully-indexed replayed batch re-probes the
  * index and rejects itself (idempotent); a crash between the two sink
  * writes can at worst duplicate an accepted row, never drop one
  * (at-least-once — the T5 posture, strictly stronger than the
  * reference's at-most-once).
  */
object StreamingNearDedup {

  final case class Config(
      bandsPath: String,     // stored band index (the dedup state)
      acceptedPath: String,  // admitted (doc_id, text) sink
      checkpointDir: String)

  private def storedBands(spark: SparkSession, path: String): DataFrame =
    try spark.read.parquet(path).select("band", "bv")
    catch {
      case _: org.apache.spark.sql.AnalysisException =>
        import spark.implicits._
        Seq.empty[(Int, String)].toDF("band", "bv")
    }

  /** Start over a streaming (doc_id, text) DataFrame. */
  def start(docs: DataFrame, cfg: Config): StreamingQuery =
    docs.writeStream
      .queryName("graft-dedup")
      .option("checkpointLocation", cfg.checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        // one signature pass per batch, consumed by 2-3 joins below
        val bands = Dedup.bandRows(batch).localCheckpoint(true)
        // vs corpus: any band collision with the stored index rejects
        val dupVsStored = bands
          .join(storedBands(spark, cfg.bandsPath), Seq("band", "bv"), "left_semi")
          .select("doc_id").distinct()
        val fresh = bands.join(dupVsStored, Seq("doc_id"), "left_anti")
        // within batch: smallest doc_id of each colliding band group wins
        val groupMin = min("doc_id").over(Window.partitionBy("band", "bv"))
        val dupWithin = fresh.withColumn("m", groupMin)
          .filter(col("doc_id") > col("m")).select("doc_id").distinct()
        val admitted = fresh.join(dupWithin, Seq("doc_id"), "left_anti")
          .localCheckpoint(true) // consumed by both sinks below
        // accepted BEFORE bands: a crash between the writes replays the
        // batch un-indexed → re-admit → duplicate accepted row
        // (at-least-once, T5 posture), never a silently dropped doc.
        // Admission is anti-join on the REJECTED set, not semi-join on the
        // admitted band rows: docs too short to shingle (<3 tokens) emit no
        // band rows, can't collide with anything, and must pass through.
        val rejected = dupVsStored.union(dupWithin).distinct()
        batch.join(rejected, Seq("doc_id"), "left_anti")
          .write.mode("append").parquet(cfg.acceptedPath)
        admitted.write.mode("append").parquet(cfg.bandsPath)
      }
      .start()
}
