package graft.util

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Global ranking over a range-sorted relation WITHOUT a distinct
  * relation, a pid window, or a join-back (r11, guide §2.3/§2.4): the
  * relation is range-partitioned + sorted by the keys once, a
  * metadata-only pass collects per-partition counts (plus boundary keys
  * for the dense variant), and the rank pass assigns driver-prefix-
  * scanned offsets per partition — re-reading the same exchange's
  * shuffle files, so the relation crosses the wire exactly once. The
  * same two-phase pid-offset discipline as before (no global-order
  * window ever runs on one partition), with rank values a pure function
  * of sorted key CONTENT — never of partition ids or sample outcomes
  * (range bounds are fixed once in the partitioner) — so recomputed
  * partitions reproduce their ranks exactly. */
object RangeRank {

  /** Dense rank (1-based) of the key tuples in lexicographic order,
    * appended as `out`. Equal keys share a rank. `keepKeys = false`
    * drops the key columns from the output. */
  def denseRank(rel: DataFrame, keys: Seq[String], out: String,
      keepKeys: Boolean = true): DataFrame = {
    val ranked = rankBy(rel, keys, out, dense = true)
    if (keepKeys) ranked else ranked.drop(keys: _*)
  }

  /** Global 0-based row number in key order, appended as `out`.
    * UNLIKE [[denseRank]], tie order among EQUAL keys is NOT a function
    * of key content: it depends on shuffle-fetch arrival order before
    * `sortWithinPartitions`, which can differ between the metadata pass,
    * the rank pass, and any partition recompute. Callers that consume
    * the result more than once (or need retry-stability) must
    * materialize it first; currently unused in production paths
    * (LayoutOps kept its pid-window). */
  def rowNumber(rel: DataFrame, keys: Seq[String], out: String): DataFrame =
    rankBy(rel, keys, out, dense = false)

  /** Key columns must be atomic (string/numeric/etc). Array or binary
    * keys would compare by REFERENCE under `Seq[Any]` equality in the
    * partition passes — every row a "new" key, silently wrong dense
    * ranks — so they are rejected loudly here. */
  private def assertAtomicKeys(rel: DataFrame, keys: Seq[String]): Unit =
    keys.foreach { k =>
      val dt = rel.schema(k).dataType
      require(dt.isInstanceOf[org.apache.spark.sql.types.AtomicType],
        s"RangeRank keys must be atomic types; '$k' is ${dt.simpleString} " +
          "(array/binary/struct keys compare by reference in the rank passes)")
    }

  private def rankBy(rel: DataFrame, keys: Seq[String], out: String,
      dense: Boolean): DataFrame = {
    assertAtomicKeys(rel, keys)
    val spark = rel.sparkSession
    val kc = keys.map(col)
    val rest = rel.columns.filterNot(keys.contains).toSeq
    val ordered = rel.select((keys ++ rest).map(col): _*)
      .repartitionByRange(kc: _*)
      .sortWithinPartitions(kc: _*)
    val nk = keys.length
    val rdd0 = ordered.rdd
    // pass 1 (metadata-only collect): per-partition counts and, for the
    // dense variant, the boundary keys
    val parts = rdd0.mapPartitionsWithIndex { (pid, it) =>
      var rows = 0L
      var n = 0L
      var first: Seq[Any] = null
      var prev: Seq[Any] = null
      while (it.hasNext) {
        val k = it.next().toSeq.take(nk)
        rows += 1
        if (prev == null || k != prev) { n += 1; if (first == null) first = k }
        prev = k
      }
      Iterator.single((pid, rows, n, first, prev))
    }.collect().sortBy(_._1)
    val offs = new Array[Long](parts.length)
    var acc = 0L
    var lastKey: Seq[Any] = null
    for (((_, rows, n, first, last), i) <- parts.zipWithIndex) {
      if (dense) {
        // a key straddling two partitions must keep ONE rank
        val adj = if (first != null && lastKey != null && first == lastKey) 1L else 0L
        offs(i) = acc - adj
        acc += n - adj
        if (last != null) lastKey = last
      } else {
        offs(i) = acc
        acc += rows
      }
    }
    val offsB = spark.sparkContext.broadcast(offs)
    val schema = StructType(ordered.schema.fields :+
      StructField(out, LongType, nullable = false))
    spark.createDataFrame(
      rdd0.mapPartitionsWithIndex { (pid, it) =>
        var r = offsB.value(pid)
        var prev: Seq[Any] = null
        if (dense) it.map { row =>
          val k = row.toSeq.take(nk)
          if (prev == null || k != prev) r += 1
          prev = k
          Row.fromSeq(row.toSeq :+ r)
        } else it.map { row =>
          val v = r
          r += 1
          Row.fromSeq(row.toSeq :+ v)
        }
      }, schema)
  }
}
