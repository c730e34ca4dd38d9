package graft

import org.scalatest.funsuite.AnyFunSuite

/** Empty-input totality: entries must RETURN (empty or constant-row
  * results), never throw, when every table has zero rows — the shape an
  * empty stream batch, a partition filter matching nothing, or a new
  * tenant produces. The full 221-entry surface is probed by
  * `tools/EmptyProbe` (0 failures recorded round 5); this spec pins the
  * entries that USED to crash (driver-side head() on an empty
  * aggregate, x div 0 in eval ratios, UnknownMeasurement from star
  * projections over an empty series index) plus one representative per
  * family, so the property can't silently regress where it already
  * broke once.
  */
class EmptyInputSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  /** limit(0) twins of the sf0.001 tables, schemas preserved exactly. */
  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty_spec").toString
    new java.io.File("/root/testdata/sf0.001").listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .foreach { f =>
        spark.read.parquet(f.getPath).limit(0)
          .coalesce(1).write.mode("overwrite").parquet(s"$dir/${f.getName}")
      }
    dir
  }

  private val regressed = Seq(
    // div-by-zero in eval ratios (greatest(...,1) guards now)
    "ann_recall_report", "dedup_emb_cosine_eval", "dedup_simhash_eval",
    // driver head() on an empty aggregate / PrScale div 0
    "doc_mixture_weights", "emb_pagerank",
    // UnknownMeasurement from star/regex field expansion on an empty
    // series index (now the InfluxDB-faithful empty statement result)
    "ts_select_mean_regex", "ts_select_regex_field", "ts_select_star_mean_2h")

  private val representatives = Seq(
    "dedup_exact", "dedup_minhash_lsh", "doc_quality", "doc_unimax_alloc",
    "emb_semdedup", "ann_ivfpq_topk", "events_funnel", "sketch_theta_overlap",
    "mm_scene_cuts", "olap_pricing_summary", "ts_select_mean_1m",
    "ingest_lp_roundtrip")

  (regressed ++ representatives).foreach { name =>
    test(s"empty input: $name totals") {
      val rows = SparkEntry.queries(name)(spark, emptyDir).collect()
      assert(rows != null) // the contract is totality; row count may be 0 or constant
    }
  }
}
