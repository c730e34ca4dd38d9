package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Empty-input totality probe (dev tool): every `SparkEntry.queries`
  * entry is run against a testdata directory whose tables have the SAME
  * schemas but ZERO rows — the shape a partition filter that matches
  * nothing, an empty stream batch, or a brand-new tenant produces. The
  * contract probed: an entry must TOTAL (return an empty or
  * constant-row result), never throw — a driver-side `head()` on an
  * empty aggregate or a division by a zero count is a crash a library
  * user hits in production even though the corpus-SF oracle gate never
  * does.
  *
  * usage: EmptyProbe [srcSfDir] — derives the empty twin by
  * `limit(0)`-rewriting every parquet table into a temp dir (schema,
  * including the events ts encoding, is preserved exactly), then runs
  * every entry and prints PASS/FAIL per entry plus a summary.
  */
object EmptyProbe {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = java.nio.file.Files.createTempDirectory("graft_empty").toString
    new java.io.File(src).listFiles().filter(_.getName.endsWith(".parquet"))
      .foreach { f =>
        spark.read.parquet(f.getPath).limit(0)
          .coalesce(1).write.mode("overwrite")
          .parquet(s"$dir/${f.getName}")
      }

    var bad = 0
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      try {
        val n = SparkEntry.queries(name)(spark, dir).collect().length
        println(s"[empty] PASS $name rows=$n")
      } catch {
        case e: Throwable =>
          bad += 1
          val root = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
            .toSeq.last
          println(s"[empty] FAIL $name: ${root.getClass.getSimpleName}: " +
            String.valueOf(root.getMessage).linesIterator.take(1).mkString.take(140))
      }
    }
    println(s"[empty] done failures=$bad of ${SparkEntry.queries.size}")
    spark.stop()
  }
}
