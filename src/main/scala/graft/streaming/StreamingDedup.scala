package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One document flowing through a streaming ingest pipeline. */
final case class StreamDoc(docId: Long, text: String)

/** Streaming exact deduplication: the stateful-stream counterpart of
  * `pipeline.Dedup.exact`, for ingest-time curation (drop an arriving
  * document whose content has been seen before — ever, across
  * micro-batches). The same first-seen-registration shape as the
  * reference's fingerprint LRU on the write path
  * (/root/reference/cflux.js:321-332, SURVEY §2.1 S4), applied to
  * document content instead of series identity.
  *
  * `flatMapGroupsWithState` keyed by the 60-bit content hash keeps ONE
  * boolean per distinct content as state. Within a micro-batch,
  * duplicates collapse to the smallest docId (deterministic); across
  * batches, first batch wins. State is bounded by distinct-content
  * cardinality, not stream length — the streaming analogue of the
  * batch operator's groupBy key set. At 100 TB/day the state store
  * backs onto RocksDB and the key is the 8-byte hash, never the text;
  * for bounded retention (dedup-within-horizon), swap NoTimeout for a
  * ProcessingTimeTimeout and re-admit after expiry — the same
  * LRU-with-warm-load compromise the reference makes.
  */
object StreamingDedup {

  /** Content hash: first 60 bits of md5 — same base hash family as the
    * batch dedup operators (TextOps.baseHash), computed driver-side-free
    * in the executor task. */
  private[streaming] def contentKey(text: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(text.getBytes("UTF-8"))
    // 60 bits: 7.5 bytes, matching substring(md5_hex, 1, 15) semantics
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h >>> 4
  }

  /** Pass through only the first document ever seen with each distinct
    * content; duplicates (within or across micro-batches) are dropped. */
  def firstSeen(docs: Dataset[StreamDoc]): Dataset[StreamDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .groupByKey(d => contentKey(d.text))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(dedupGroup)
  }

  private def dedupGroup(key: Long, it: Iterator[StreamDoc],
                         state: GroupState[Boolean]): Iterator[StreamDoc] = {
    if (state.exists) Iterator.empty
    else {
      val first = it.minBy(_.docId)
      state.update(true)
      Iterator.single(first)
    }
  }
}
