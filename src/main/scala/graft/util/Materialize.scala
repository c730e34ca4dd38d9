package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Materialization policy for multi-consumer intermediates.
  *
  * Two classes, deliberately distinct (round-5 verdict item 2):
  *
  *  - [[corpus]] — relations whose row count scales with the corpus
  *    (shingle rows, minhash signatures, banded candidates, subvector
  *    explodes, token windows). These are `persist(DISK_ONLY)`:
  *    blocks spill to disk instead of pinning executor memory, they are
  *    evictable, and — unlike a local checkpoint — the lineage survives,
  *    so a lost executor recomputes its blocks instead of failing the
  *    job. That is the only acceptable shape at 100 TB, where a shingle
  *    relation is ~10× the corpus and "keep it in executor memory" is
  *    not a plan. The cost is (de)serialization per consumer read,
  *    invisible at bench SF and dominated by the avoided recompute.
  *
  *  - [[bounded]] — intermediates whose size is bounded by something
  *    structurally small (a K-row sketch per source, a codebook, a
  *    sampled eval subset, one micro-batch, a per-iteration loop state
  *    that must also CUT lineage). These keep the eager
  *    `localCheckpoint(true)`: fastest access, and pinning a few MB of
  *    non-evictable memory is fine when the bound is real. Iterative
  *    loops (pagerank, connected components, MMR, BPE rounds) MUST stay
  *    in this class regardless of size — persist alone would let the
  *    logical plan grow per iteration, which is its own scale failure
  *    (planning time, lineage depth), so loop states trade fault
  *    tolerance for a truncated plan and a fixed, small iteration count.
  *
  * One deliberate exception documented at its site: `TextOps.packDocs`
  * phase-1/phase-2 prefix sums require the SAME physical
  * materialization (a recompute may range-sample differently and shift
  * doc→partition assignment between phases), so it keeps
  * `localCheckpoint` even though it is corpus-sized; the 100 TB form is
  * a reliable checkpoint, not a persist.
  */
object Materialize {
  /** Storage policy for corpus-scale relations. MEMORY_AND_DISK: blocks
    * are evictable (unlike localCheckpoint's pinned blocks) and overflow
    * to disk under pressure — at 100 TB the memory share is negligible
    * and behavior converges to DISK_ONLY, while at bench SF iterative
    * consumers (pagerank's per-round edge reads) stay memory-hot
    * (measured: DISK_ONLY cost pagerank +50% at sf0.1 for zero
    * robustness gain — eviction already provides the spill path). */
  val CorpusLevel: StorageLevel = StorageLevel.MEMORY_AND_DISK

  /** Corpus-scale multi-consumer relation: spill-safe, evictable,
    * recomputable. Lazy — the first consumer materializes it. */
  def corpus(df: DataFrame): DataFrame = df.persist(CorpusLevel)

  /** Structurally-bounded intermediate (or per-iteration loop state
    * that needs its lineage cut): eager local checkpoint. */
  def bounded(df: DataFrame): DataFrame = df.localCheckpoint(true)
}
