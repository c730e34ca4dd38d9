package graft.tools
import graft.ingest.Ingest
import graft.sources.EventsAdapter
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ingest-path throughput probe WITH decade evidence (round-7): times
  * the full write path (line-protocol parse → fingerprint → type-split
  * → hour-partitioned samples + series index) at 1× and 10× input in
  * one run, so the scaling ratio is measured, not asserted. The 10×
  * input multiplies SERIES CARDINALITY too (each copy gets a disjoint
  * user_id tag space and a distinct ns timestamp) — the dimension that
  * actually stresses the fingerprint/series side; replaying identical
  * lines would dedup to the same series set and fake a sub-linear
  * signal.
  *
  * usage: IngestBench [sfDir] [mults, e.g. 1,10]
  */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val mults = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq else Seq(1, 10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("ingest-bench").toString
    val base = EventsAdapter.events(spark, dir)
    val times = mults.map { mult =>
      val ev = if (mult == 1) base
      else base
        .withColumn("k", explode(sequence(lit(0L), lit(mult - 1L))))
        .withColumn("user_id", col("user_id") + col("k") * 1000000000L)
        .withColumn("ts_ns", col("ts_ns") + col("k"))
        .drop("k")
      val lines = EventsAdapter.asLineProtocol(ev).as[String]
      val n = lines.count() // warm the read + rendering lineage
      // timed: parse + fingerprint + type-split + hour-partitioned write +
      // series index; two passes so JIT cost is visible separately; the
      // min is the steady-state figure the decade ratio uses
      val best = (1 to 2).map { pass =>
        val t0 = System.nanoTime()
        // materializeParsed like the engine write path: the parse runs
        // once, not once per consumer
        val b = Ingest.fromLines(lines, 1735689600000L, materializeParsed = true)
        val t1 = System.nanoTime()
        Ingest.writeSamples(b.samples, s"$out/samples-x$mult-$pass")
        val t2 = System.nanoTime()
        Ingest.writeSeriesIndex(b.series, s"$out/series-x$mult-$pass")
        val t3 = System.nanoTime()
        val secs = (t3 - t0) / 1e9
        val rows = spark.read.parquet(s"$out/samples-x$mult-$pass").count()
        val files = spark.read.parquet(s"$out/samples-x$mult-$pass")
          .select(input_file_name()).distinct().count()
        println(f"[ingest-bench] x$mult pass$pass: $n%d lines -> $rows%d sample rows, $files%d files in $secs%.2fs" +
          f" = ${n / secs}%.0f lines/s (parse ${(t1 - t0) / 1e9}%.2fs, samples ${(t2 - t1) / 1e9}%.2fs, series ${(t3 - t2) / 1e9}%.2fs)")
        secs
      }.min
      mult -> best
    }
    for (Seq((ma, ta), (mb, tb)) <- times.sliding(2))
      println(f"[ingest-bench] DECADE x$ma ${ta}%.2fs -> x$mb ${tb}%.2fs : x${tb / ta}%.2f wall for x${mb / ma}%d input")
    spark.stop()
  }
}
