package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev tool: time named queries / shared builds IN ISOLATION — fresh
  * Memo per op (so a shared build pays its own cost, not a cache hit),
  * bench-identical session shape (local[$SPARK_GRAFT_CPUS], shuffle
  * partitions = cpus), min-of-N after one untimed warmup run at the
  * TARGET sf (Janino/codegen cost excluded, like Bench's warm pass).
  *
  * usage: MicroBench <sfDir> <name1,name2,...> [reps=2]
  * Names resolve against SparkEntry.sharedBuilds first, then
  * SparkEntry.queries. Prints one line per op: `name min [all]`.
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val builds = SparkEntry.sharedBuilds.toMap
    def runOp(name: String): Unit =
      builds.get(name) match {
        case Some(fn) => fn(spark, sfDir)
        case None => SparkEntry.queries(name)(spark, sfDir).count(); ()
      }
    names.foreach { name =>
      val isBuild = builds.contains(name)
      // untimed warmup (codegen); for CONSUMER queries it also populates
      // the memo/cache exactly like Bench's warm pass + run 1, so timed
      // reps measure the same steady state Bench's min-of-2 reports
      graft.util.Memo.clear()
      try runOp(name) catch { case e: Throwable =>
        System.err.println(s"[micro] warmup $name FAILED: ${e.getMessage}") }
      val ts = (1 to reps).map { _ =>
        if (isBuild) graft.util.Memo.clear() // a build must pay its build
        System.gc()
        val t0 = System.nanoTime()
        runOp(name)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[micro] $name%-32s min=${ts.min}%7.3f  all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
