package graft.tools
import graft.SparkEntry
import org.apache.spark.sql.SparkSession
object AuditAll {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      try {
        val plan = SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString
        val cart = plan.contains("CartesianProduct")
        val nlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).length
        val ex = "Exchange".r.findAllIn(plan).length
        if (cart || nlj > 0 || ex > 12)
          println(s"[FLAG] $name: cartesian=$cart nlj=$nlj exchanges=$ex")
      } catch { case e: Throwable => println(s"[ERR] $name: ${e.getMessage.take(100)}") }
    }
    println("[audit] done")
    spark.stop()
  }
}
