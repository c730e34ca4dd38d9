package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump a subset of SparkEntry.queries (comma-separated names in
  * args(2); "all" for everything) to outDir, plus the matching oracle_sql
  * entries — a fast local slice of the driver's Verify gate for iterating
  * on one operator without re-running all of them. */
object RunEntries {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, names) = args.take(3)
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wanted: Seq[String] =
      if (names == "all") graft.SparkEntry.queries.keys.toSeq.sorted
      else names.split(',').toSeq
    new java.io.File(outDir).mkdirs()
    wanted.foreach { name =>
      val t0 = System.nanoTime()
      try {
        graft.SparkEntry.queries(name)(spark, sfDir).coalesce(1)
          .write.mode("overwrite").parquet(s"$outDir/$name")
        println(f"[run] $name ok ${(System.nanoTime() - t0) / 1e9}%.2fs")
      } catch {
        case e: Throwable => println(s"[run] $name FAILED: ${e.getMessage}")
      }
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case '\n'         => "\\n"
      case '\r'         => "\\r"
      case '\t'         => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c            => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql.filter(kv => wanted.contains(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
