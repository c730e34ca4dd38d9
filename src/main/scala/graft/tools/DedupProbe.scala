package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.{Dedup, TextOps}

/** Scratch profiler for the dedup family: times each pipeline piece
  * separately (shingle scan, self-join, aggregations) to locate cost. */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time(name: String)(f: => Long): Unit =
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[probe] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
      }
    val sh = docs.select(col("doc_id"),
      explode(array_distinct(
        transform(TextOps.shingles(TextOps.tokens(col("text"))), s => TextOps.baseHash(s)))).as("h"))
    time("sh_scan") { sh.count() }
    time("sh_nohash") { docs.select(col("doc_id"),
      explode(array_distinct(TextOps.shingles(TextOps.tokens(col("text"))))).as("h")).count() }
    time("cnt") { sh.groupBy("doc_id").agg(count(lit(1))).count() }
    val inter = sh.as("a").join(sh.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .agg(count(lit(1)).as("inter"))
    time("inter_join") { inter.count() }
    time("full") { Dedup.ngramJaccard(docs).count() }
    time("minhash") { Dedup.minhashLsh(docs).count() }
    time("clusters") { Dedup.clusters(docs).count() }
    spark.stop()
  }
}
