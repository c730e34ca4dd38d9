package graft.ingest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Series fingerprint: a stable 64-bit hash of (sorted tag-set + field name).
  *
  * Reference: cflux.js:133-137,323-325 — `uuid = JSON(tags + {"__name__":
  * field})`, `fingerprint = parseInt(shortHash(uuid), 16)`. We keep the
  * same canonical-JSON identity but hash with xxhash64 (Spark built-in,
  * 64-bit, codegen'd). The divergence is invisible: fingerprints never leave
  * the engine (SURVEY §1.4).
  */
object Fingerprint {

  /** Canonical series string: tags sorted by key rendered as a JSON array of
    * single-entry objects, with {"__name__": field} appended — the shape the
    * reference builds at cflux.js:323 — PLUS a leading {"__measurement__":m}
    * entry the reference omits. Without it, series with identical tagsets
    * and field names in different measurements collide, and the shared
    * series index (deduped by fingerprint alone, the ReplacingMergeTree
    * ORDER BY fingerprint of cflux.js:164) silently drops all but one — a
    * latent reference bug. Fingerprints never leave the engine (SURVEY
    * §1.4), so the divergence is invisible to clients. */
  def canonical(measurement: String, tags: Seq[(String, String)], fieldKey: String): String = {
    val parts = s"""{"__measurement__":"${j(measurement)}"}""" +:
      tags.sortBy(_._1).map { case (k, v) => s"""{"${j(k)}":"${j(v)}"}""" } :+
      s"""{"__name__":"${j(fieldKey)}"}"""
    parts.mkString("[", ",", "]")
  }

  /** JSON string escaping, byte-for-byte Jackson's (what Spark's `to_json`
    * emits) — so canonical strings built column-side with `to_json` (e.g.
    * sources.EventsAdapter) hash identically to ingest-built ones. Jackson
    * short-escapes \b \t \n \f \r and writes other control chars as
    * uppercase-hex \u00XX. */
  private def j(s: String): String =
    s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case '\b'         => "\\b"
      case '\f'         => "\\f"
      case '\n'         => "\\n"
      case '\r'         => "\\r"
      case '\t'         => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04X"
      case c            => c.toString
    }

  /** Driver/executor-side hash, bit-identical to the DataFrame `xxhash64`
    * function (seed 42, matching org.apache.spark.sql.functions.xxhash64). */
  def hash(canonical: String): Long = {
    val u = UTF8String.fromString(canonical)
    org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
  }

  def of(measurement: String, tags: Seq[(String, String)], fieldKey: String): Long =
    hash(canonical(measurement, tags, fieldKey))

  /** Column-level fingerprint over a canonical-string column. */
  def col(canonicalCol: Column): Column = xxhash64(canonicalCol)
}
