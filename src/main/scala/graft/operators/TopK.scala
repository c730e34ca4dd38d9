package graft.operators

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Encoder}

/** (score, id) pair ranked by score desc, ties → smaller id. Scores are
  * int64 fixed-point — anything that ranks must be quantized BEFORE the
  * aggregate (float sums are order-dependent; the heap's keep/drop
  * decisions must be engine-exact). */
final case class ScoredId(score: Long, id: Long)

/** Bounded-heap top-K as a typed [[Aggregator]] — the map-side-combinable
  * alternative to `row_number() OVER (PARTITION BY k ORDER BY s) <= K`.
  *
  * The window form shuffles EVERY row of every group to its group's
  * task and sorts there: at 100 TB that is a full-data exchange plus an
  * O(n log n) sort per group, and a skewed group funnels its whole row
  * set through one task. The aggregator form rides Spark's
  * partial/final hash aggregation instead: each map task reduces its
  * slice to ≤K rows per group before the exchange, so the shuffle
  * carries at most (map tasks × K) rows per group no matter the input
  * size or skew — the same reason `TakeOrderedAndProject` beats
  * sort-then-limit globally, applied per key.
  *
  * Buffer: an unordered list, compacted to the K best whenever it
  * exceeds [[slack]]×K — amortized O(1) insertion per row without
  * per-row sorting; `merge` concatenates and compacts once.
  */
final class TopKAggregator(k: Int, slack: Int = 4)
    extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {
  require(k >= 1, "top-k needs k >= 1")

  private def best(a: ScoredId, b: ScoredId): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)
  private def compact(xs: Seq[ScoredId]): Seq[ScoredId] =
    if (xs.lengthCompare(k) <= 0) xs else xs.sortWith(best).take(k)

  override def zero: Seq[ScoredId] = Vector.empty
  override def reduce(buf: Seq[ScoredId], x: ScoredId): Seq[ScoredId] = {
    val grown = buf :+ x
    if (grown.lengthCompare(slack * k) > 0) compact(grown) else grown
  }
  override def merge(a: Seq[ScoredId], b: Seq[ScoredId]): Seq[ScoredId] =
    compact(a ++ b)
  override def finish(buf: Seq[ScoredId]): Seq[ScoredId] =
    compact(buf).sortWith(best)
  override def bufferEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
}

object TopK {
  /** Top-[[k]] events by quantized value per event_type via the bounded
    * heap, exploded back to (event_type, rank, event_id, value_fp) rows.
    * The plan is two narrow stages: partial heaps map-side, one exchange
    * of ≤K rows per (task, type), final merge + explode. */
  def topValuesPerType(ev: DataFrame, k: Int): DataFrame = {
    val spark = ev.sparkSession
    import spark.implicits._
    val agg = new TopKAggregator(k).toColumn
    ev.select(col("event_type"),
        floor(col("value") * 1000).cast("long").as("score"),
        col("event_id").as("id"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapValues(r => ScoredId(r._2, r._3))
      .agg(agg.name("top"))
      .flatMap { case (et, top) =>
        top.iterator.zipWithIndex.map { case (s, i) => (et, (i + 1).toLong, s.id, s.score) }
      }
      .toDF("event_type", "rank", "event_id", "value_fp")
      .orderBy("event_type", "rank")
  }

  val TopKPerType = 10

  def topValuesPerTypeOracle(k: Int): String =
    s"""WITH s AS (
       |  SELECT event_type, CAST(floor(value * 1000) AS BIGINT) AS score, event_id AS id
       |  FROM events),
       |r AS (
       |  SELECT event_type, score, id, row_number() OVER (
       |           PARTITION BY event_type ORDER BY score DESC, id) AS rn
       |  FROM s)
       |SELECT event_type, rn AS rank, id AS event_id, score AS value_fp
       |FROM r WHERE rn <= $k ORDER BY event_type, rank""".stripMargin
}
