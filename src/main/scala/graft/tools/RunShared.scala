package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time SHARED builds (SparkEntry.sharedBuilds) in ISOLATION —
  * one build per sample with `graft.util.Memo.clear()` in between, so
  * every sample is a true cold build. Bench times each build ONCE per
  * run, overlapped with the other builds on a 4-thread pool, which is
  * the honest deployment account but a noisy basis for baseline
  * re-pins; ratchet re-pins use THIS tool's 8-run warm-JIT floors
  * (round-10 verdict item 8).
  *
  * usage: RunShared <sfDir> <name1,name2|all> [reps=8]
  */
object RunShared {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1)
    val reps = if (args.length > 2) args(2).toInt else 8
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val builds = graft.SparkEntry.sharedBuilds.toMap
    val wanted: Seq[String] =
      if (names == "all") graft.SparkEntry.sharedBuilds.map(_._1)
      else names.split(',').toSeq
    wanted.foreach { name =>
      val fn = builds(name)
      // one untimed pass at the smallest SF: Janino/JIT warmup, the same
      // reasoning as Bench's warm phase — measure plan cost, not compile
      graft.util.Memo.clear()
      try fn(spark, "/root/testdata/sf0.001") catch { case _: Throwable => () }
      val ts = (1 to reps).map { _ =>
        graft.util.Memo.clear() // next build is cache-cold
        System.gc()             // let ContextCleaner drop prior runs' blocks
        val t0 = System.nanoTime()
        fn(spark, sfDir)
        (System.nanoTime() - t0) / 1e9
      }
      val sorted = ts.sorted
      println(f"[shared] $name%-28s floor ${sorted.head}%6.2f  " +
        f"median ${sorted(sorted.size / 2)}%6.2f  " +
        s"runs ${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
