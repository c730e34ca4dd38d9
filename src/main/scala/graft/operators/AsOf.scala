package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join — an operator the reference lacks and
  * Spark SQL has no native form of (SURVEY §2.3: "not present"). Following
  * the builder preference order, it composes from built-ins rather than a
  * custom physical operator: tag both sides, union, and take a running
  * `last(ignoreNulls)` of the right payload per key ordered by
  * (time, side) — each left row then carries the latest right row with
  * `right.time <= left.time`.
  *
  * Scale notes (100 TB): this is the formulation that survives — ONE
  * shuffle on the join keys and a sorted window scan, with O(1) running
  * state per key; a naive range join (`r.time <= l.time` theta join)
  * explodes quadratically and a per-left-row subquery doesn't vectorize.
  * Skewed keys split via AQE; time-sorted storage makes the sort cheap.
  */
object AsOf {

  /** For each `left` row: latest `right` row with right.time <= left.time
    * on equal `keys`. Right rows at the identical timestamp count as
    * "prior" (<=), matching DuckDB's ASOF JOIN used as the oracle.
    *
    * @param payloadCol right column to carry over (null when no prior row)
    */
  def latestPrior(left: DataFrame, right: DataFrame, keys: Seq[String],
                  timeCol: String, payloadCol: String, outCol: String): DataFrame = {
    val r = right.select(
      (keys.map(col) :+ col(timeCol) :+ col(payloadCol).as("__p") :+ lit(0).as("__side")): _*)
    val l = left.withColumn("__side", lit(1))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    u.withColumn(outCol, last("__p", ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__side", "__p")
  }

  /** [[latestPrior]] with a staleness bound: the carried right row must
    * be no older than `toleranceNs` before the left time, else the
    * payload is null — ASOF JOIN's tolerance form (a quote older than
    * the bound is no quote). Same single union + running-last pass; one
    * extra running column (the prior row's time) decides the cutoff —
    * still ONE shuffle, O(1) state per key. */
  def latestPriorWithin(left: DataFrame, right: DataFrame, keys: Seq[String],
                        timeCol: String, payloadCol: String, outCol: String,
                        toleranceNs: Long): DataFrame = {
    val r = right.select(
      (keys.map(col) :+ col(timeCol) :+ col(payloadCol).as("__p") :+ lit(0).as("__side")): _*)
    val l = left.withColumn("__side", lit(1))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    u.withColumn("__pv", last("__p", ignoreNulls = true).over(w))
      .withColumn("__pt",
        last(when(col("__side") === 0, col(timeCol)), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .withColumn(outCol,
        when(col(timeCol) - col("__pt") <= toleranceNs, col("__pv")))
      .drop("__side", "__p", "__pv", "__pt")
  }
}
