package graft.tools
import graft.SparkEntry
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (name <- Seq("dedup_minhash_lsh", "ts_asof_prior_view", "ts_sessionize",
                     "ann_lsh_topk", "olap_top_users_per_type", "ts_select_fill_zero",
                     "ts_select_subquery", "ts_select_slimit", "ts_select_raw",
                     "ts_select_fn_derivative", "ann_ivf_topk", "approx_distinct_hll")) {
      val plan = SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString
      val bad = Seq("CartesianProduct").filter(plan.contains)
      val nlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).length
      val bhj = "BroadcastHashJoin".r.findAllIn(plan).length
      val smj = "SortMergeJoin".r.findAllIn(plan).length
      val ex = "Exchange".r.findAllIn(plan).length
      println(s"[audit] $name: cartesian=${bad.nonEmpty} nlj=$nlj bhj=$bhj smj=$smj exchanges=$ex")
    }
    spark.stop()
  }
}
