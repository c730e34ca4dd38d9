package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratch: per-method timing of the ANN eval top-K builders. */
object AnnProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.pipeline.{EvalSampling, Similarity}
    val emb0 = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val emb = EvalSampling(emb0, "vec_id")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ann] $label%-16s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    for (round <- 1 to 2) {
      println(s"=== round $round ===")
      graft.util.Memo.clear()
      System.gc()
      time("ivfClusterMemo")(Similarity.buildIvfIndex(emb))
      Seq("brute" -> Similarity.bruteTopK _,
          "graph" -> ((d: org.apache.spark.sql.DataFrame) => Similarity.graphTopK(d)),
          "hamming" -> Similarity.hammingTopK _,
          "ivf" -> Similarity.ivfTopK _,
          "ivfpq" -> Similarity.ivfpqTopK _,
          "lsh" -> Similarity.lshTopK _,
          "pq" -> Similarity.pqTopK _).foreach { case (n, f) =>
        time(n)(f(emb).count())
      }
    }
    spark.stop()
  }
}
