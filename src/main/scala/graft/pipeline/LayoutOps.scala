package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-LAYOUT optimization operators — the write-side half of scan
  * performance that no query-side operator can recover once the bytes
  * are on disk. At 100 TB the dominant cost of a selective scan is how
  * many files (parquet row groups / zone maps) the predicate SKIPS,
  * and skipping is a property of the row order the writer chose.
  * Single-column clustering (ORDER BY k1) makes min/max zones tight on
  * k1 and useless on every other column; Z-ORDER (Morton-curve)
  * clustering interleaves the bits of several keys so every file
  * covers a small HYPER-RECTANGLE of key space and multi-column
  * predicates prune on ALL clustered dimensions — the discipline
  * behind Delta/Iceberg `OPTIMIZE ZORDER BY`.
  *
  * Two details make the curve work and are both here:
  *  - keys are first NORMALIZED to a common 8-bit rank space via the
  *    per-column (min, max) affine map — interleaving raw values of
  *    unequal bit width lets the wide column's high bits dominate the
  *    curve and the narrow column barely prunes (measured: suppkey-box
  *    pruning 45/64 files raw vs 13/64 normalized at sf0.01). Real
  *    writers use per-column range-partition ids; the affine map is
  *    the deterministic, oracle-expressible stand-in with the same
  *    pruning behavior on near-uniform keys;
  *  - the z-value is pure shift/mask bit arithmetic (magic-number bit
  *    spreading) — whole-stage codegen in Spark, bit-identical `& | <<`
  *    in DuckDB.
  *
  * The operator simulates the three writer choices (natural arrival
  * order, single-column clustering, z-order) as [[NBuckets]] equal
  * files, computes each file's min/max zone map, and reports the files
  * each of two predicates must touch under each layout: a 2-D box, and
  * a suppkey-only range — the predicate single-column clustering
  * cannot serve at all (64/64 files) while z-order still prunes. File
  * assignment uses the two-phase pid-offset global rank
  * (`TextOps.prefixSumOn` discipline) — a single-partition
  * `row_number()` over the fact table is exactly the thing that cannot
  * run at 100 TB. The real cluster writer is this plan minus the
  * simulation: `repartitionByRange(zval)` + `sortWithinPartitions` +
  * parquet write; parquet's per-column min/max statistics then ARE the
  * zone maps computed explicitly here.
  */
object LayoutOps {

  /** Simulated file count per layout (a 100 TB table has ~10⁵ files;
    * the pruning RATIO measured here is scale-free). */
  val NBuckets = 64

  /** 2-D box predicate in the NORMALIZED 8-bit rank space (≈10% of the
    * part range × ≈20% of the supp range) — rank-space predicates keep
    * the entry's selectivity scale-free across SFs whose raw key
    * ranges differ 100×. */
  val PartLo = 102L
  val PartHi = 127L
  val SuppLo = 51L
  val SuppHi = 101L

  /** Second-column-only range (≈5%) — the case that separates z-order
    * from single-column clustering. */
  val SuppOnlyLo = 51L
  val SuppOnlyHi = 63L

  /** Spread the low 16 bits of x to even bit positions (Morton
    * "part1by1"): 4 shift-or-mask rounds, all long arithmetic. */
  private def spread16(x: Column): Column = {
    val a = x.bitwiseAND(lit(0xFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0x00FF00FFL))
    val c = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val d = c.bitwiseOR(shiftleft(c, 2)).bitwiseAND(lit(0x33333333L))
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton code of (p, s): p's bits at even positions, s's at odd —
    * the space-filling-curve key a z-order writer sorts by. */
  def zval(p: Column, s: Column): Column =
    spread16(p).bitwiseOR(shiftleft(spread16(s), 1))

  private def spreadSql(x: String): String = {
    val a = s"($x & 65535)"
    val b = s"(($a | ($a << 8)) & 16711935)"
    val c = s"(($b | ($b << 4)) & 252645135)"
    val d = s"(($c | ($c << 2)) & 858993459)"
    s"(($d | ($d << 1)) & 1431655765)"
  }

  /** Same Morton code in DuckDB's bit operators — generated from the
    * same masks so the two engines agree bit-for-bit. */
  def zvalSql(p: String, s: String): String =
    s"(${spreadSql(p)} | (${spreadSql(s)} << 1))"

  /** Assign each row its file under `ORDER BY sortCols` with the
    * two-phase global rank: range-partition on the sort key, per-
    * partition row_number (parallel), plus the driver-prefix-scanned
    * partition offset — never a global single-partition window. The
    * materialization must make `spark_partition_id()` non-recomputable
    * because both phases read ONE physical partitioning; r11 uses the
    * bounded localCheckpoint (pinned blocks, no recompute path at all)
    * instead of the reliable checkpoint — this is a zone-map SIMULATION
    * over a 4-column projection, and the A/B showed the reliable
    * checkpoint's write+reread pass cost ~0.3 s per layout here while
    * the RangeRank RDD pass (better for the suffix builds) was slower
    * still (4.4 s vs 2.6 s for the whole entry: three layouts × two
    * re-sorted passes + row conversions outweigh the saved window). */
  private def bucketed(rows: DataFrame, layout: String, sortCols: Seq[String]): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    val cols = sortCols.map(col)
    val toks = graft.util.Materialize.bounded(rows
      .repartitionByRange(cols: _*)
      .sortWithinPartitions(cols: _*)
      .withColumn("pid", spark_partition_id()))
    val totals = toks.groupBy("pid").agg(count(lit(1)).as("tot"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val n = math.max(totals.map(_._2).sum, 1L)
    val offsets = totals.map(_._1)
      .zip(totals.scanLeft(0L) { case (acc, (_, tot)) => acc + tot })
      .toSeq.toDF("pid", "off")
    val w = Window.partitionBy("pid").orderBy(cols: _*)
    toks.join(broadcast(offsets), Seq("pid"))
      .withColumn("rnk", row_number().over(w).cast("long") - 1L + col("off"))
      .select(lit(layout).as("layout"), col("p8"), col("s8"),
        expr(s"(rnk * $NBuckets) div ${n}L").as("bucket"))
  }

  /** Zone-map pruning report: for each simulated layout, the
    * [[NBuckets]]-file bill of the 2-D box predicate and of the
    * suppkey-only range, plus each predicate's true row count (the
    * read-amplification denominators). Output one row per layout:
    * (layout, box_buckets, box_rows_scanned, supp_buckets,
    * supp_rows_scanned, box_matched, supp_matched). */
  def zorderPrune(lineitem: DataFrame): DataFrame = {
    val mm = lineitem.agg(
      min("l_partkey").as("pmn"), max("l_partkey").as("pmx"),
      min("l_suppkey").as("smn"), max("l_suppkey").as("smx"))
    val base = graft.util.Materialize.bounded(
      lineitem.select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
        .crossJoin(broadcast(mm)) // 1-row scalar join: per-column ranges
        .withColumn("p8", expr("((l_partkey - pmn) * 255) div greatest(pmx - pmn, 1)"))
        .withColumn("s8", expr("((l_suppkey - smn) * 255) div greatest(smx - smn, 1)"))
        .withColumn("zval", zval(col("p8"), col("s8")))
        .drop("pmn", "pmx", "smn", "smx"))
    val layouts =
      bucketed(base, "l1_natural", Seq("l_orderkey", "l_linenumber"))
        .union(bucketed(base, "l2_partkey", Seq("l_partkey", "l_orderkey", "l_linenumber")))
        .union(bucketed(base, "l3_zorder", Seq("zval", "l_orderkey", "l_linenumber")))
    val boxHit = col("pmin") <= PartHi && col("pmax") >= PartLo &&
      col("smin") <= SuppHi && col("smax") >= SuppLo
    val suppHit = col("smin") <= SuppOnlyHi && col("smax") >= SuppOnlyLo
    val matched = base.agg(
      sum(when(col("p8").between(PartLo, PartHi) &&
        col("s8").between(SuppLo, SuppHi), 1L).otherwise(0L)).as("box_matched"),
      sum(when(col("s8").between(SuppOnlyLo, SuppOnlyHi), 1L)
        .otherwise(0L)).as("supp_matched"))
    layouts
      .groupBy("layout", "bucket")
      .agg(min("p8").as("pmin"), max("p8").as("pmax"),
        min("s8").as("smin"), max("s8").as("smax"),
        count(lit(1)).as("nrows"))
      .groupBy("layout")
      .agg(sum(when(boxHit, 1L).otherwise(0L)).as("box_buckets"),
        coalesce(sum(when(boxHit, col("nrows"))), lit(0L)).as("box_rows_scanned"),
        sum(when(suppHit, 1L).otherwise(0L)).as("supp_buckets"),
        coalesce(sum(when(suppHit, col("nrows"))), lit(0L)).as("supp_rows_scanned"))
      .crossJoin(broadcast(matched)) // 1-row scalar join
      .select("layout", "box_buckets", "box_rows_scanned",
        "supp_buckets", "supp_rows_scanned", "box_matched", "supp_matched")
      .orderBy("layout")
  }

  val zorderPruneOracle: String = {
    val box = s"p8 BETWEEN $PartLo AND $PartHi AND s8 BETWEEN $SuppLo AND $SuppHi"
    val supp = s"s8 BETWEEN $SuppOnlyLo AND $SuppOnlyHi"
    val boxHit = s"pmin <= $PartHi AND pmax >= $PartLo AND smin <= $SuppHi AND smax >= $SuppLo"
    val suppHit = s"smin <= $SuppOnlyHi AND smax >= $SuppOnlyLo"
    s"""WITH li0 AS (
       |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey FROM lineitem),
       |mm AS (SELECT min(l_partkey) AS pmn, max(l_partkey) AS pmx,
       |              min(l_suppkey) AS smn, max(l_suppkey) AS smx FROM li0),
       |li AS (
       |  SELECT li0.*, ${zvalSql("p8", "s8")} AS zval
       |  FROM (SELECT li0.*,
       |          ((l_partkey - pmn) * 255) // greatest(pmx - pmn, 1) AS p8,
       |          ((l_suppkey - smn) * 255) // greatest(smx - smn, 1) AS s8
       |        FROM li0, mm) li0),
       |n AS (SELECT count(*) AS n FROM li),
       |ord AS (
       |  SELECT 'l1_natural' AS layout, p8, s8,
       |         ((row_number() OVER (ORDER BY l_orderkey, l_linenumber) - 1)
       |           * $NBuckets) // (SELECT n FROM n) AS bucket
       |  FROM li
       |  UNION ALL
       |  SELECT 'l2_partkey', p8, s8,
       |         ((row_number() OVER (ORDER BY l_partkey, l_orderkey, l_linenumber) - 1)
       |           * $NBuckets) // (SELECT n FROM n)
       |  FROM li
       |  UNION ALL
       |  SELECT 'l3_zorder', p8, s8,
       |         ((row_number() OVER (ORDER BY zval, l_orderkey, l_linenumber) - 1)
       |           * $NBuckets) // (SELECT n FROM n)
       |  FROM li),
       |st AS (
       |  SELECT layout, bucket,
       |         min(p8) AS pmin, max(p8) AS pmax,
       |         min(s8) AS smin, max(s8) AS smax,
       |         count(*) AS nrows
       |  FROM ord GROUP BY 1, 2),
       |m AS (SELECT count(*) FILTER (WHERE $box)::BIGINT AS box_matched,
       |             count(*) FILTER (WHERE $supp)::BIGINT AS supp_matched
       |      FROM li)
       |SELECT layout,
       |       coalesce(sum(CASE WHEN $boxHit THEN 1 ELSE 0 END), 0)::BIGINT
       |         AS box_buckets,
       |       coalesce(sum(CASE WHEN $boxHit THEN nrows END), 0)::BIGINT
       |         AS box_rows_scanned,
       |       coalesce(sum(CASE WHEN $suppHit THEN 1 ELSE 0 END), 0)::BIGINT
       |         AS supp_buckets,
       |       coalesce(sum(CASE WHEN $suppHit THEN nrows END), 0)::BIGINT
       |         AS supp_rows_scanned,
       |       m.box_matched, m.supp_matched
       |FROM st, m
       |GROUP BY layout, m.box_matched, m.supp_matched
       |ORDER BY layout""".stripMargin
  }
}
