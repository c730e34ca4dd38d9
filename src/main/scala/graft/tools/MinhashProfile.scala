package graft.tools

import graft.pipeline.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level profile of the MinHash-LSH pipeline on synthetic docs
  * (dev tool): times shingles / signatures / band candidates / full
  * verify separately at a given corpus size, to localize which stage
  * moves when a scale probe flags the whole operator as super-linear.
  *
  * usage: MinhashProfile [rows] [fixedVocab|scaledVocab]
  */
object MinhashProfile {

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 1000000L
    val mode = if (args.length > 1) args(1) else "fixedVocab"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val vocabSize: Long = mode match {
      case "scaledVocab" => math.max(30L, n / 10L) // Heaps-ish growth
      case _ => 30L
    }
    val isNear = pmod(col("doc_id"), lit(100L)) === 1L
    val isExact = pmod(col("doc_id"), lit(100L)) === 51L
    val docs = spark.range(n).select(col("id").as("doc_id"))
      .withColumn("base",
        when(isNear || isExact, col("doc_id") - 1).otherwise(col("doc_id")))
      .withColumn("toks", transform(sequence(lit(1), lit(40)),
        i => concat(lit("w"), pmod(xxhash64(col("base"), i), lit(vocabSize)))))
      .withColumn("toks", when(isNear,
          concat(slice(col("toks"), 1, 39), array(lit("mutant"))))
        .otherwise(col("toks")))
      .withColumn("text", array_join(col("toks"), " "))
      .select(col("doc_id"), col("text"))

    def t(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[prof] $label%-12s ${(System.nanoTime() - t0) / 1e9}%7.2fs  ($r rows)")
    }

    println(s"[prof] n=$n vocab=$vocabSize mode=$mode")
    // minhashParts eagerly materializes sh+sig (localCheckpoint(true)):
    // the "parts" timer covers shingle build + signature build
    var parts: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
      org.apache.spark.sql.DataFrame) = null
    t("parts") { parts = Dedup.minhashParts(docs); 0L }
    val (sh, sig, cand) = parts
    t("shingles") { sh.count() }
    t("signatures") { sig.count() }
    t("candidates") { cand.count() }
    t("full") { Dedup.minhashLsh(docs).count() }
    spark.stop()
  }
}
