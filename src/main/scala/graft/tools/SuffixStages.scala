package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratch: per-stage timing of the production suffix builds
  * (memoized internals, Memo-cleared between reps). */
object SuffixStages {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); () }
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); tasks.addAndGet(s.stageInfo.numTasks); () }
    })
    def time[T](label: String)(f: => T): T = {
      val (j0, s0, t0n) = (jobs.get, stages.get, tasks.get)
      val t0 = System.nanoTime()
      val r = f
      Thread.sleep(100) // let listener events drain
      println(f"[st] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s  " +
        f"jobs=${jobs.get - j0}%3d stages=${stages.get - s0}%3d tasks=${tasks.get - t0n}%5d")
      r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val planted = graft.pipeline.Dedup.plantSpans(docs)
    for (round <- 1 to 2) {
      println(s"=== round $round ===")
      graft.util.Memo.clear()
      System.gc()
      time("g8(raw)")(graft.pipeline.SuffixOps.gram8Rows(docs).count())
      time("levels16(raw)")(graft.pipeline.SuffixOps.suffixLevelRows(docs, 16).count())
      time("g8(planted)")(graft.pipeline.SuffixOps.gram8Rows(planted).count())
      time("levels16(planted)")(graft.pipeline.SuffixOps.suffixLevelRows(planted, 16).count())
      time("depth16(planted)")(graft.pipeline.SuffixOps.saDepthRows(planted, 16).count())
      time("levels32(planted)")(graft.pipeline.SuffixOps.suffixLevelRows(planted, 32).count())
      time("levels64(planted)")(graft.pipeline.SuffixOps.suffixLevelRows(planted, 64).count())
      time("depth64(planted)")(graft.pipeline.SuffixOps.saDepthRows(planted, 64).count())
    }
    spark.stop()
  }
}
