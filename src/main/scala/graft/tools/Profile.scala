package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev profiler: time one named SparkEntry query (arg 1) on a given SF dir
  * (arg 2), optionally printing the formatted plan (arg 3 = "explain").
  * Runs the query twice — cold + warm — to separate JIT/IO from plan cost. */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val doExplain = args.contains("explain")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    if (doExplain) fn(spark, sfDir).explain("formatted")
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[profile] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }
    spark.stop()
  }
}
