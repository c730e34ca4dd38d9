package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Scratch: dump the post-execution (AQE-final) plan string of a query. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(args(0))(spark, "/root/testdata/sf0.001")
    df.collect() // materialize THIS plan instance so AQE finalizes it
    println("===FINAL PLAN===")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
