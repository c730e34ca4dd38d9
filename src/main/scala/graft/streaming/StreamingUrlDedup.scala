package graft.streaming

import graft.pipeline.UrlOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming URL-level dedup: an incoming document is admitted only if
  * its CANONICAL url (UrlOps.canonicalize — scheme fold, host/port/www
  * normalization, tracking-param strip, fragment drop) has never been
  * admitted before — the streaming face of [[UrlOps.urlDedup]], and the
  * FIRST gate of a live crawl pipeline (URL dedup is cheaper than any
  * content pass, so it runs before fetching/content dedup ever see the
  * doc).
  *
  * Semantics: first-crawled wins — within a batch the smallest doc_id
  * per canonical URL survives (deterministic under replay), across
  * batches the stored index decides.
  *
  * State design (100 TB): the stored canonical-url index is the ONLY
  * state — one string row per admitted PAGE (not per crawl attempt), so
  * state tracks the unique-page corpus; the probe is a left-semi
  * equi-join on canon_url (hash-distributed by construction — URLs have
  * no hot key after canonicalization collapses variants). Same
  * accepted-before-index write order as [[StreamingNearDedup]]: a crash
  * between the two appends can at worst duplicate an accepted row,
  * never drop one (at-least-once, the T5 posture). */
object StreamingUrlDedup {

  final case class Config(
      canonPath: String,     // stored canonical-url index (the dedup state)
      acceptedPath: String,  // admitted rows sink
      checkpointDir: String)

  private def storedCanon(spark: SparkSession, path: String): DataFrame =
    try spark.read.parquet(path).select("canon_url")
    catch {
      case _: org.apache.spark.sql.AnalysisException =>
        import spark.implicits._
        Seq.empty[String].toDF("canon_url")
    }

  /** Start over a streaming DataFrame carrying (doc_id, url, ...). */
  def start(docs: DataFrame, cfg: Config): StreamingQuery =
    docs.writeStream
      .queryName("graft-url-dedup")
      .option("checkpointLocation", cfg.checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        // one canonicalization pass per batch, consumed by the joins below
        val canon = batch
          .withColumn("canon_url", UrlOps.canonicalize(col("url")))
          .localCheckpoint(true) // batch-bounded (Materialize.bounded class)
        val dupVsStored = canon
          .join(storedCanon(spark, cfg.canonPath), Seq("canon_url"), "left_semi")
          .select("doc_id").distinct()
        val fresh = canon.join(dupVsStored, Seq("doc_id"), "left_anti")
        // within batch: first-crawled (smallest doc_id) per canonical wins
        val groupMin = min("doc_id").over(Window.partitionBy("canon_url"))
        val dupWithin = fresh.withColumn("m", groupMin)
          .filter(col("doc_id") > col("m")).select("doc_id").distinct()
        val admitted = fresh.join(dupWithin, Seq("doc_id"), "left_anti")
          .localCheckpoint(true) // consumed by both sinks below
        // accepted BEFORE the index: replaying a half-written batch
        // re-admits (duplicate accepted row) rather than dropping
        admitted.write.mode("append").parquet(cfg.acceptedPath)
        admitted.select("canon_url").distinct()
          .write.mode("append").parquet(cfg.canonPath)
      }
      .start()
}
