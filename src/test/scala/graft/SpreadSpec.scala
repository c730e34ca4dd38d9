package graft

import org.scalatest.funsuite.AnyFunSuite

/** util.Spread: repartitions single-task scans up to the default
  * parallelism, and leaves already-parallel inputs untouched (the no-op
  * condition that makes it free at real scale). */
class SpreadSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  test("small scan spreads to default parallelism; wide input is untouched") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    assume(docs.rdd.getNumPartitions < spark.sparkContext.defaultParallelism)
    val spreadOut = graft.util.Spread(docs)
    assert(spreadOut.rdd.getNumPartitions === spark.sparkContext.defaultParallelism)
    assert(spreadOut.count() === docs.count())
    val wide = docs.repartition(spark.sparkContext.defaultParallelism + 7)
    // already >= parallelism: Spread must not add an exchange
    assert(graft.util.Spread(wide) eq wide)
  }
}
