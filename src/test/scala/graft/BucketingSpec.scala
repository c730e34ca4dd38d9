package graft

import graft.ingest.Ingest
import org.scalatest.funsuite.AnyFunSuite

/** The bucketed-storage scale path (SURVEY §7.4: "partitioned by hour +
  * bucketed by fingerprint"): fingerprint-keyed aggregations and joins
  * over a bucketed samples table must plan WITHOUT an Exchange on the
  * table side — the on-disk clustering replaces the shuffle. This is the
  * property that matters at 100 TB; the spec pins it at fixture scale. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  test("bucketed samples: fingerprint aggregation and self-join plan shuffle-free") {
    import spark.implicits._
    val lines = spark.createDataset(Seq(
      "cpu,host=a usage=1,load=5 1735689540000000000",
      "cpu,host=a usage=2 1735689550000000000",
      "cpu,host=b usage=3 1735693200000000000",
      "mem,host=a used=7 1735689540000000000"))
    val batch = Ingest.fromLines(lines, nowMs = 1735689600000L)
    Ingest.writeSamplesBucketed(batch.samples, "graft_bucketed_spec", buckets = 4)
    try {
      val t = spark.table("graft_bucketed_spec")
      // per-series aggregation: bucketing satisfies the hash distribution
      val aggPlan = t.groupBy("fingerprint").count()
        .queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange"),
        s"bucketed scan must feed the aggregate directly:\n$aggPlan")
      // fingerprint equi-join of two bucketed reads: no shuffle either side
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val j = t.as("a").join(spark.table("graft_bucketed_spec").as("b"), "fingerprint")
        val jPlan = j.queryExecution.executedPlan.toString
        assert(!jPlan.contains("Exchange"),
          s"bucketed join must not shuffle:\n$jPlan")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      // and the data round-trips
      assert(spark.table("graft_bucketed_spec").count() === batch.samples.count())
    } finally spark.sql("DROP TABLE IF EXISTS graft_bucketed_spec")
  }
}
