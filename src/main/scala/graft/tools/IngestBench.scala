package graft.tools
import graft.ingest.Ingest
import graft.sources.EventsAdapter
import org.apache.spark.sql.SparkSession
object IngestBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"
    val out = java.nio.file.Files.createTempDirectory("ingest-bench").toString
    val lines = EventsAdapter.asLineProtocol(EventsAdapter.events(spark, dir)).as[String]
    val n = lines.count() // warm the read
    // timed: parse + fingerprint + type-split + hour-partitioned write +
    // series index; two passes so JIT cost is visible separately
    for (pass <- 1 to 2) {
      val t0 = System.nanoTime()
      // materializeParsed like the engine write path: the parse runs once,
      // not once per consumer
      val b = Ingest.fromLines(lines, 1735689600000L, materializeParsed = true)
      val t1 = System.nanoTime()
      Ingest.writeSamples(b.samples, s"$out/samples$pass")
      val t2 = System.nanoTime()
      Ingest.writeSeriesIndex(b.series, s"$out/series$pass")
      val t3 = System.nanoTime()
      val secs = (t3 - t0) / 1e9
      val rows = spark.read.parquet(s"$out/samples$pass").count()
      println(f"[ingest-bench] pass$pass: $n%d lines -> $rows%d sample rows in $secs%.2fs = ${n / secs}%.0f lines/s, ${rows / secs}%.0f samples/s" +
        f" (parse ${(t1 - t0) / 1e9}%.2fs, samples ${(t2 - t1) / 1e9}%.2fs, series ${(t3 - t2) / 1e9}%.2fs)")
    }
    spark.stop()
  }
}
