package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import TextOps.{baseHash, baseHashSql}

/** Approximate-aggregate sketches for 100 TB-scale analytics (SURVEY §2.4
  * lists them as absent in the reference; this is the extension).
  *
  * HyperLogLog, hand-rolled rather than Spark's approx_count_distinct,
  * for one reason: the oracle. Spark's HLL++ and DuckDB's approx_distinct
  * use different hash functions and bias tables, so their estimates can
  * never be compared bit-for-bit. This implementation defines the sketch
  * arithmetic from the shared md5-based 60-bit hash (TextOps.baseHash) in
  * BOTH engines, so the estimate is a deterministic function of the data
  * and the driver gate hash-compares it exactly.
  *
  * Scale shape: the heavy reduction is `groupBy(keys, register).max(rho)`
  * — map-side combinable, shuffle cardinality = |groups| × 256 regardless
  * of input size, and register-max IS the HLL merge operator, so partial
  * aggregation is lossless. The per-group finalization folds 256 values.
  *
  * Determinism notes:
  *  - rho via length(bin(w)) — integer ops, no float log;
  *  - 2^-Mj as 1.0 / (1::BIGINT << Mj) — exact powers of two;
  *  - the harmonic sum folds registers in ascending register order on
  *    both engines (Spark aggregate over array_sort == DuckDB list_reduce
  *    over list_sort; the 0.0 start is exact);
  *  - linear-counting correction uses ln(m/zeros): both engines' libm is
  *    within 1 ulp, and the final floor() to whole counts absorbs it.
  */
object Sketches {

  val HllP = 8
  val HllM: Int = 1 << HllP // 256 registers
  /** alpha_256 * m^2, spliced into both engines via shortest-round-trip
    * decimal repr (parses back to the identical double). */
  val AlphaM2: Double = 0.7213 / (1 + 1.079 / HllM) * HllM * HllM
  /** Hash bits below the register index (60-bit baseHash - p). */
  val WBits: Int = 60 - HllP
  val WMask: Long = (1L << WBits) - 1
  /** Small-range correction threshold 2.5m. */
  val SmallRange: Double = 2.5 * HllM

  /** Per-event_type HLL distinct-user estimate next to the exact count
    * (the honesty column: |est - exact| / exact ~ 1.04/sqrt(256) ≈ 6.5%).
    * Output: (event_type, est_users, exact_users). */
  def hllDistinctUsers(ev: DataFrame): DataFrame = {
    val h = baseHash(col("user_id").cast("string"))
    val regs = ev
      .select(col("event_type"), shiftright(h, WBits).as("reg"), h.bitwiseAND(WMask).as("w"))
      .withColumn("rho",
        when(col("w") === 0, lit(WBits + 1))
          .otherwise(lit(WBits + 1) - length(bin(col("w")))))
      .groupBy("event_type", "reg").agg(max("rho").as("mj"))
      // 2^-Mj exactly, while mj is still a scalar column (shift by column
      // is expression-level only)
      .withColumn("p", expr("1.0 / cast(shiftleft(cast(1 as bigint), mj) as double)"))
    val est = regs.groupBy("event_type")
      .agg(
        count(lit(1)).as("nregs"),
        aggregate(
          transform(array_sort(collect_list(struct(col("reg"), col("p")))),
            s => s.getField("p")),
          lit(0.0), (acc, x) => acc + x).as("psum"))
      .withColumn("total", (lit(HllM) - col("nregs")).cast("double") + col("psum"))
      .withColumn("est_raw", lit(AlphaM2) / col("total"))
      .withColumn("est_users",
        floor(when(col("est_raw") <= SmallRange && col("nregs") < HllM,
          lit(HllM.toDouble) * log(lit(HllM.toDouble) / (lit(HllM) - col("nregs")).cast("double")))
          .otherwise(col("est_raw"))).cast("long"))
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_users"))
    est.select("event_type", "est_users")
      .join(exact, Seq("event_type"))
      .orderBy("event_type")
  }

  val hllDistinctUsersOracle: String =
    s"""WITH h AS (
       |  SELECT event_type, ${baseHashSql("CAST(user_id AS VARCHAR)")} AS h FROM events),
       |b AS (SELECT event_type, h >> $WBits AS reg, h & $WMask AS w FROM h),
       |r AS (SELECT event_type, reg,
       |             CASE WHEN w = 0 THEN ${WBits + 1} ELSE ${WBits + 1} - length(bin(w)) END AS rho
       |      FROM b),
       |m AS (SELECT event_type, reg, max(rho) AS mj FROM r GROUP BY 1, 2),
       |p AS (SELECT event_type, reg, 1.0::DOUBLE / ((1::BIGINT << mj)::DOUBLE) AS p FROM m),
       |g AS (SELECT event_type, count(*) AS nregs,
       |             list_reduce(
       |               list_prepend(0.0::DOUBLE,
       |                 list_transform(list_sort(list({'reg': reg, 'p': p})), s -> s.p)),
       |               (x, y) -> x + y) AS psum
       |      FROM p GROUP BY event_type),
       |e AS (SELECT event_type, nregs,
       |             ($HllM - nregs)::DOUBLE + psum AS total FROM g),
       |f AS (SELECT event_type, nregs, $AlphaM2 / total AS est_raw FROM e)
       |SELECT f.event_type,
       |       CAST(floor(CASE WHEN est_raw <= $SmallRange AND nregs < $HllM
       |                       THEN ${HllM.toDouble} * ln(${HllM.toDouble} / ($HllM - nregs)::DOUBLE)
       |                       ELSE est_raw END) AS BIGINT) AS est_users,
       |       x.exact_users
       |FROM f JOIN (SELECT event_type, count(DISTINCT user_id) AS exact_users
       |             FROM events GROUP BY event_type) x USING (event_type)
       |ORDER BY event_type""".stripMargin
}
