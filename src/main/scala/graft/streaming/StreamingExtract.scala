package graft.streaming

import graft.pipeline.Extract
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming boilerplate extraction: [[Extract.extractPages]]' block-
  * level link-density rule applied to raw pages at ingest time — the
  * crawl-side deployment of the batch operator (a fetcher emits pages;
  * the curation stack wants extracted text plus a keep verdict before
  * anything downstream sees a "document").
  *
  * Per micro-batch: the SAME one-projection extraction the batch entry
  * runs (shared code path, so the differential spec is exact), plus a
  * keep verdict — kept iff the extracted text has at least
  * [[Config.minKeptWords]] words. A page that is ALL chrome (or whose
  * markup the splitter cannot find prose in) extracts to zero words
  * and is dropped — the gate fails closed on content-free pages, the
  * [[StreamingMediaGate]] posture on the text side.
  *
  * State design (100 TB): NO stream state — extraction is per-row, the
  * verdict is deterministic, so restart safety is checkpointed
  * foreachBatch + append-only writes (at-least-once: a replayed batch
  * re-extracts identically and at worst duplicates a verdict row,
  * never flips one). */
object StreamingExtract {

  final case class Config(
      verdictsPath: String, // (doc_id, n_blocks, n_kept, kept_words, extracted_hash, kept)
      checkpointDir: String,
      minKeptWords: Long)

  /** Start over a streaming (doc_id, html) DataFrame. */
  def start(pages: DataFrame, cfg: Config): StreamingQuery =
    pages.writeStream
      .queryName("graft-extract-gate")
      .option("checkpointLocation", cfg.checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Extract.extractPages(batch)
          .withColumn("kept", col("kept_words") >= cfg.minKeptWords)
          .write.mode("append").parquet(cfg.verdictsPath)
        ()
      }
      .start()
}
