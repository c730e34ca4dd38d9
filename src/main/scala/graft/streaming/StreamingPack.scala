package graft.streaming

import graft.pipeline.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming SEQUENCE PACKING — the ingest-time face of the GPT-style
  * loader discipline ([[TextOps.packSplit]] is the batch half): every
  * curated document that arrives is assigned its exact
  * [first_seq, last_seq] training-sequence span INCREMENTALLY, so the
  * training manifest can be cut while the corpus is still streaming in,
  * instead of re-packing the whole store per snapshot.
  *
  * Semantics: within a batch, docs pack in doc_id order (deterministic
  * under replay); across batches, the STORED CUMULATIVE TOKEN COUNT is
  * the only state — each batch's prefix sums start where the admitted
  * corpus ended, so sequence ids keep global meaning. A stream cannot
  * reorder what it already admitted, so the streamed packing equals the
  * batch operator's exactly when batches arrive in doc_id order
  * (spec-pinned differential); otherwise it is the arrival-order pack —
  * the standard incremental posture ([[StreamingSpanDedup]]'s
  * contract). Token counts here are whitespace counts (the packBins
  * accounting); a deployment packing by a trained tokenizer feeds
  * pre-counted (doc_id, n) rows through the same path.
  *
  * State design (100 TB): the state is ONE NUMBER — the admitted token
  * total — stored as an append-only (run, batch_id, delta) parquet
  * ledger. Summing max(delta) per (run, batch_id) makes the total
  * EXACTLY-once over at-least-once appends, and the CURRENT
  * (run, batch_id) is excluded from the read, so a batch replayed after
  * a crash between the two writes reads the same offset and re-emits
  * byte-identical assignment rows (consumers dedup by doc_id; nothing
  * shifts). `run` disambiguates a restart with a fresh checkpoint: a
  * nonce file INSIDE the checkpoint directory (create-if-absent at
  * [[start]]) mints the run id, so deleting the checkpoint — even when
  * the ledger survives at the SAME paths — starts a new run whose
  * batch 0 is distinct from the old run's batch 0 in the ledger, while
  * a normal resume re-reads the old nonce (round-10 advice: deriving
  * run from the checkpoint PATH conflated old and new deltas after a
  * delete-checkpoint-keep-ledger restart). Within a batch the prefix sum is
  * the two-phase pid-offset discipline of the batch operator — never a
  * one-partition window; everything else is batch-sized.
  */
object StreamingPack {

  final case class Config(
      assignedPath: String, // (doc_id, n_tokens, first_seq, last_seq, is_straddle)
      statePath: String,    // (run, batch_id, delta) token-count ledger
      checkpointDir: String)

  /** Admitted token total from the ledger, excluding the in-flight
    * (run, batch) so crash-replay reads the pre-batch offset. */
  private def storedTotal(spark: SparkSession, cfg: Config,
      run: String, batchId: Long): Long =
    try spark.read.parquet(cfg.statePath)
      .filter(!(col("run") === run && col("batch_id") === batchId))
      .groupBy("run", "batch_id").agg(max("delta").as("d"))
      .agg(coalesce(sum("d"), lit(0L))).head.getLong(0)
    catch { case _: org.apache.spark.sql.AnalysisException => 0L }

  /** The run nonce lives INSIDE the checkpoint so its lifetime IS the
    * checkpoint's: resume reads it back, delete-and-restart mints a new
    * one (and thus a fresh ledger run) even at the same paths. */
  private def runNonce(checkpointDir: String): String = {
    val dir = java.nio.file.Paths.get(checkpointDir)
    java.nio.file.Files.createDirectories(dir)
    val f = dir.resolve("graft-run-nonce")
    if (java.nio.file.Files.exists(f))
      new String(java.nio.file.Files.readAllBytes(f), "UTF-8").trim
    else {
      val n = java.util.UUID.randomUUID().toString
      java.nio.file.Files.write(f, n.getBytes("UTF-8"))
      n
    }
  }

  /** Start over a streaming (doc_id, text) DataFrame. */
  def start(docs: DataFrame, cfg: Config): StreamingQuery = {
    val run = runNonce(cfg.checkpointDir)
    docs.writeStream
      .queryName("graft-pack")
      .option("checkpointLocation", cfg.checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        val counts = batch.select(col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("n"))
          .localCheckpoint(true)
        val total = storedTotal(spark, cfg, run, batchId)
        val assigned = TextOps.packSplitOn(counts, total)
          .localCheckpoint(true) // consumed before + independent of the ledger write
        assigned.write.mode("append").parquet(cfg.assignedPath)
        val delta = counts.agg(coalesce(sum("n"), lit(0L))).head.getLong(0)
        Seq((run, batchId, delta)).toDF("run", "batch_id", "delta")
          .write.mode("append").parquet(cfg.statePath)
      }
      .start()
  }
}
