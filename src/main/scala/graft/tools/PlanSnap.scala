package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dump `explain("formatted")` of named entries to <outDir>/<name>.txt —
  * the round's plan-evidence artifact (plans/rNN/<entry>_before|after.txt).
  *
  * usage: PlanSnap <sfDir> <outDir> <suffix> <name1,name2,...|all>
  * Bench-identical session shape. Constructing an entry's DataFrame runs
  * any memoized shared build it consumes (eager checkpoints), so the
  * dumped plan is the steady-state plan Bench times.
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, nameArg) = args.take(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    val names =
      if (nameArg == "all") SparkEntry.queries.keys.toSeq
      else nameArg.split(",").toSeq
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.write(Paths.get(outDir, s"${name}_$suffix.txt"),
          txt.getBytes("UTF-8"))
        println(s"[plan] $name -> ${name}_$suffix.txt")
      } catch { case e: Throwable =>
        System.err.println(s"[plan] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
