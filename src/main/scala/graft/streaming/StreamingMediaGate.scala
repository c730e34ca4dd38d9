package graft.streaming

import graft.pipeline.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming trained-media gate: the batch-trained image-content
  * classifier ([[Multimodal.imageClassify]]'s NB profile) applied to
  * incoming media blobs at ingest time — the "model trained offline,
  * deployed in the stream" posture every production curation stack
  * runs (the profile is versioned and tiny; the stream never trains).
  *
  * Per micro-batch: decode each REAL BMP payload (the batch decode
  * path, mapPartitions, zero shuffle), bucket the decoded pixels into
  * the 16-bin intensity histogram, dot against the BROADCAST 4×16
  * profile, argmax with the batch operator's exact (score DESC, class
  * ASC) tie-break, and append (media_id, class_pred, score, kept) —
  * kept iff the predicted class is not in the configured drop set.
  * Undecodable blobs predict "unk" with score 0 and are DROPPED (a
  * gate fails closed on garbage).
  *
  * State design (100 TB): there is NO stream state at all — the model
  * is a broadcast constant and every batch is embarrassingly parallel,
  * so restart safety is just checkpointed foreachBatch + append-only
  * writes (at-least-once: a replayed batch re-scores identically and
  * at worst duplicates an appended verdict row, never flips one — the
  * scoring is deterministic).
  */
object StreamingMediaGate {

  final case class Config(
      verdictsPath: String,   // (media_id, class_pred, score, kept) sink
      checkpointDir: String,
      dropClasses: Set[String])

  /** Train the NB profile batch-side from a reference corpus and
    * compact it to the driver: class → 16 ppm weights. Model size is
    * 4×[[Multimodal.ImgBuckets]] int64s — catalog-sized by design. */
  def trainProfile(referenceDocs: DataFrame): Map[String, Array[Long]] = {
    val rows = Multimodal.imageClassProfile(referenceDocs).collect()
    rows.groupBy(_.getString(0)).map { case (c, rs) =>
      val w = new Array[Long](Multimodal.ImgBuckets)
      rs.foreach(r => w(r.getLong(1).toInt) = r.getLong(2))
      c -> w
    }
  }

  /** Start over a streaming (media_id, payload) DataFrame. */
  def start(media: DataFrame, profile: Map[String, Array[Long]],
      cfg: Config): StreamingQuery = {
    // deterministic class order for the argmax tie-break (c ASC)
    val classes = profile.toSeq.sortBy(_._1)
    media.writeStream
      .queryName("graft-media-gate")
      .option("checkpointLocation", cfg.checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        val verdicts = batch.as[(Long, Array[Byte])]
          .mapPartitions(_.map { case (id, payload) =>
            Multimodal.decodeBmpPixels(payload) match {
              case None => (id, "unk", 0L, false)
              case Some((_, _, px)) =>
                val h = new Array[Long](Multimodal.ImgBuckets)
                var j = 0
                while (j < px.length) { h(px(j) / Multimodal.ImgBuckets) += 1L; j += 1 }
                var bestC = "unk"; var bestS = Long.MinValue
                classes.foreach { case (c, w) =>
                  var s = 0L
                  var b = 0
                  while (b < Multimodal.ImgBuckets) { s += h(b) * w(b); b += 1 }
                  if (s > bestS) { bestS = s; bestC = c } // ties: first = c ASC
                }
                (id, bestC, bestS, !cfg.dropClasses.contains(bestC))
            }
          })
          .toDF("media_id", "class_pred", "score", "kept")
        verdicts.write.mode("append").parquet(cfg.verdictsPath)
      }
      .start()
  }
}
