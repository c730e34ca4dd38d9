package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev scratch: stage-by-stage timing of the suffix-level build and
  * checkpoint-policy A/Bs. Not wired into any entry. */
object SuffixProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.pipeline.TextOps.tokens

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-36s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    // --- replica of the cap-16 seed pipeline, instrumented ---
    def denseRankKeys(rel: DataFrame, keys: Seq[String], out: String,
        keepKeys: Boolean, label: String): DataFrame = {
      val kc = keys.map(col)
      val dk = time(s"$label.distinct+sort+pin") {
        graft.util.Materialize.pinned(rel.select(kc: _*).distinct()
          .repartitionByRange(kc: _*)
          .sortWithinPartitions(kc: _*)
          .withColumn("pid", spark_partition_id()))
      }
      val totals = time(s"$label.offsets-collect") {
        dk.groupBy("pid").agg(count(lit(1)).as("tot"))
          .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
      }
      import spark.implicits._
      val offsets = totals.map(_._1)
        .zip(totals.scanLeft(0L) { case (acc, (_, tot)) => acc + tot })
        .toSeq.toDF("pid", "off")
      val w = Window.partitionBy("pid").orderBy(kc: _*)
      val ranked = dk.join(broadcast(offsets), Seq("pid"))
        .withColumn(out, row_number().over(w).cast("long") + col("off"))
        .select(kc :+ col(out): _*)
      val joined = rel.join(ranked, keys)
      if (keepKeys) joined else joined.drop(keys: _*)
    }

    for (round <- 1 to 2) {
      println(s"=== round $round ===")
      val toks = graft.util.Spread(docs.select("doc_id", "text"))
        .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("p0", "tok")))
      val tids = denseRankKeys(toks, Seq("tok"), "tid", keepKeys = false, "dr1-tok")
      val docArr = time("docArr collect_list + bounded") {
        graft.util.Materialize.bounded(tids.groupBy("doc_id")
          .agg(transform(array_sort(collect_list(struct(col("p0"), col("tid")))),
            x => x.getField("tid")).as("wi")))
      }
      val grams = (1 to 7).map(j =>
        expr(s"IF(p0 + $j < size(wi), wi[p0 + $j], 0L)").as(s"k${j + 1}"))
      val pos8 = docArr
        .select(col("doc_id"), col("wi"), posexplode(col("wi")).as(Seq("p0", "k1")))
        .select(Seq(col("doc_id"), (col("p0") + 1).cast("long").as("pos"),
          (size(col("wi")).cast("long") - col("p0")).as("rem"),
          col("k1")) ++ grams: _*)
      val r8 = time("r8 rank + bounded") {
        graft.util.Materialize.bounded(
          denseRankKeys(pos8, (1 to 8).map(j => s"k$j"), "r8", keepKeys = true, "dr2-8gram")
            .drop("k5", "k6", "k7", "k8"))
      }
      val shifted = r8.select(col("doc_id"),
        (col("pos") - 8).as("pos"), col("r8").as("nb"))
      val paired = r8.join(shifted, Seq("doc_id", "pos"), "left")
        .na.fill(0L, Seq("nb"))
      val lv = time("r16 rank + bounded") {
        graft.util.Materialize.bounded(
          denseRankKeys(paired, Seq("r8", "nb"), "r16", keepKeys = true, "dr3-r16")
            .drop("nb"))
      }
      time("final count")(lv.count())
    }
    spark.stop()
  }
}
