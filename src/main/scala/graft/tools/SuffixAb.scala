package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Dev scratch: A/B of dense-rank assignment policies on the 8-gram
  * seed relation. Not wired into any entry. */
object SuffixAb {
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
    import spark.implicits._

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ab] $label%-44s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // fixed token-id base (built once, localCheckpointed) so every variant
    // starts from the same materialized pos8 relation
    val toks = graft.util.Spread(docs.select("doc_id", "text"))
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("p0", "tok")))
    val dtok = toks.select("tok").distinct().orderBy("tok")
      .withColumn("tid", monotonically_increasing_id()) // order-scrambled but injective enough for an A/B
    val tids = toks.join(dtok, Seq("tok")).drop("tok")
    val docArr = tids.groupBy("doc_id")
      .agg(transform(array_sort(collect_list(struct(col("p0"), col("tid")))),
        x => x.getField("tid")).as("wi"))
      .localCheckpoint(true)
    val grams = (1 to 7).map(j =>
      expr(s"IF(p0 + $j < size(wi), wi[p0 + $j], 0L)").as(s"k${j + 1}"))
    val pos8 = docArr
      .select(col("doc_id"), col("wi"), posexplode(col("wi")).as(Seq("p0", "k1")))
      .select(Seq(col("doc_id"), (col("p0") + 1).cast("long").as("pos"),
        (size(col("wi")).cast("long") - col("p0")).as("rem"),
        col("k1")) ++ grams: _*)
      .localCheckpoint(true)
    println(s"[ab] pos8 rows = ${pos8.count()}")
    val keys = (1 to 8).map(j => s"k$j")
    val kc = keys.map(col)

    for (round <- 1 to 2) {
      println(s"=== round $round ===")
      // A: current — distinct -> range sort -> reliable ckpt -> window+offsets -> join back
      time("A current (pin=reliable ckpt)") {
        val dk = graft.util.Materialize.pinned(pos8.select(kc: _*).distinct()
          .repartitionByRange(kc: _*).sortWithinPartitions(kc: _*)
          .withColumn("pid", spark_partition_id()))
        val totals = dk.groupBy("pid").agg(count(lit(1)).as("tot"))
          .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
        val offsets = totals.map(_._1)
          .zip(totals.scanLeft(0L) { case (acc, (_, tot)) => acc + tot })
          .toSeq.toDF("pid", "off")
        val w = Window.partitionBy("pid").orderBy(kc: _*)
        val ranked = dk.join(broadcast(offsets), Seq("pid"))
          .withColumn("r8", row_number().over(w).cast("long") + col("off"))
          .select(kc :+ col("r8"): _*)
        pos8.join(ranked, keys).localCheckpoint(true).count()
      }
      // B: persist before the reliable checkpoint (kill double compute)
      time("B pin with persist-first") {
        val pre = pos8.select(kc: _*).distinct()
          .repartitionByRange(kc: _*).sortWithinPartitions(kc: _*)
          .withColumn("pid", spark_partition_id())
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val dk = pre.checkpoint(eager = true)
        pre.unpersist(false)
        val totals = dk.groupBy("pid").agg(count(lit(1)).as("tot"))
          .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
        val offsets = totals.map(_._1)
          .zip(totals.scanLeft(0L) { case (acc, (_, tot)) => acc + tot })
          .toSeq.toDF("pid", "off")
        val w = Window.partitionBy("pid").orderBy(kc: _*)
        val ranked = dk.join(broadcast(offsets), Seq("pid"))
          .withColumn("r8", row_number().over(w).cast("long") + col("off"))
          .select(kc :+ col("r8"): _*)
        pos8.join(ranked, keys).localCheckpoint(true).count()
      }
      // C: localCheckpoint the sorted distinct
      time("C pin=localCheckpoint") {
        val dk = pos8.select(kc: _*).distinct()
          .repartitionByRange(kc: _*).sortWithinPartitions(kc: _*)
          .withColumn("pid", spark_partition_id())
          .localCheckpoint(true)
        val totals = dk.groupBy("pid").agg(count(lit(1)).as("tot"))
          .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
        val offsets = totals.map(_._1)
          .zip(totals.scanLeft(0L) { case (acc, (_, tot)) => acc + tot })
          .toSeq.toDF("pid", "off")
        val w = Window.partitionBy("pid").orderBy(kc: _*)
        val ranked = dk.join(broadcast(offsets), Seq("pid"))
          .withColumn("r8", row_number().over(w).cast("long") + col("off"))
          .select(kc :+ col("r8"): _*)
        pos8.join(ranked, keys).localCheckpoint(true).count()
      }
      // D: localCheckpoint + rdd.zipWithIndex instead of pid window+offsets
      time("D localCkpt + zipWithIndex rank") {
        val dk = pos8.select(kc: _*).distinct()
          .repartitionByRange(kc: _*).sortWithinPartitions(kc: _*)
          .localCheckpoint(true)
        val schema = org.apache.spark.sql.types.StructType(
          dk.schema.fields :+ org.apache.spark.sql.types.StructField("r8", LongType, false))
        val ranked = spark.createDataFrame(
          dk.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ (i + 1L)) },
          schema)
        pos8.join(ranked, keys).localCheckpoint(true).count()
      }
    }
    spark.stop()
  }
}
