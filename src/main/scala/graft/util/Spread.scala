package graft.util

import org.apache.spark.sql.DataFrame

/** Parallelism guard for compute-heavy projections over small scans.
  *
  * The test-SF parquet inputs are single-row-group files, so Spark plans
  * exactly one scan task — and any expensive per-row work chained onto the
  * scan (shingle explosion, per-shingle md5, line-protocol parsing) runs
  * on one core while 31 idle. `Spread` repartitions to the cluster's
  * default parallelism FIRST, moving only the narrow projected input once
  * (bytes ≈ input size, negligible vs the compute it parallelizes).
  *
  * At 100 TB this is a no-op by construction: the scan already yields far
  * more splits than cores, the condition is false, and no shuffle is
  * added. Callers should project to the needed columns before spreading.
  */
object Spread {
  def apply(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
