package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import TextOps._

/** Distributed SUFFIX-ARRAY construction by prefix doubling — the real
  * algorithm class behind exact substring dedup (Lee et al. 2022 build
  * a suffix array to find every duplicated ≥50-token extent; the
  * `Dedup.dupSpans*` family approximates that with fixed windows).
  * This operator ranks every token position of the corpus by its
  * [[SuffixCap]]-token capped suffix — the generalized-suffix-array
  * order restricted to the match lengths dedup actually uses — via the
  * textbook doubling recurrence: rank_2k(i) = rank of the PAIR
  * (rank_k(i), rank_k(i+k)), seeded from a 4-gram rank, so 3 rounds of
  * sort+join replace any comparison of long strings. The shuffle keys are (int, int)
  * pairs END TO END: no suffix string ever moves, which is the entire
  * point of the algorithm at 100 TB (a naive sort of n suffix strings
  * moves O(n·cap) bytes; doubling moves O(n·log cap) ints).
  *
  * Every doubling's dense rank is assigned with the two-phase
  * pid-offset discipline (`TextOps.prefixSumOn`): range-partition the
  * DISTINCT pairs, rank within partitions in parallel, add the
  * driver-prefix-scanned partition offsets — a global window never
  * runs on one partition.
  *
  * The oracle is a genuinely INDEPENDENT derivation: DuckDB
  * dense_rank()s the materialized suffix strings directly (valid
  * because the token separator ' ' sorts below every token character,
  * so joined-string order equals token-sequence order). Agreement
  * means the doubling recurrence, the pair ordering, and the
  * short-suffix padding all reproduce the definitional sort. */
object SuffixOps {

  /** Rank suffixes by their first 16 tokens — the match-length class
    * published dedup recipes threshold at, and 4 doublings. */
  val SuffixCap = 16

  /** Dense rank (1-based) of the DISTINCT key tuples in lexicographic
    * order, joined back onto `rel` as column `rank` — the two-phase
    * global rank on the distinct relation. */
  private def denseRankKeys(rel: DataFrame, keys: Seq[String]): DataFrame = {
    val spark = rel.sparkSession
    import spark.implicits._
    val kc = keys.map(col)
    val dk = graft.util.Materialize.pinned(rel.select(kc: _*).distinct()
      .repartitionByRange(kc: _*)
      .sortWithinPartitions(kc: _*)
      .withColumn("pid", spark_partition_id()))
    val totals = dk.groupBy("pid").agg(count(lit(1)).as("tot"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = totals.map(_._1)
      .zip(totals.scanLeft(0L) { case (acc, (_, tot)) => acc + tot })
      .toSeq.toDF("pid", "off")
    val w = Window.partitionBy("pid").orderBy(kc: _*)
    val ranked = dk.join(broadcast(offsets), Seq("pid"))
      .withColumn("rank", row_number().over(w).cast("long") + col("off"))
      .select(kc :+ col("rank"): _*)
    rel.join(ranked, keys).drop(keys: _*)
  }

  /** (doc_id, pos, rank): rank of each position's capped suffix in the
    * global generalized-suffix order. Round 0 ranks 4-GRAMS directly
    * (the k-mer seeding every practical SA builder uses — 4 short
    * strings per position in one distinct relation beats two extra
    * doubling rounds of global ranking; measured 9.8 → ~6 s at sf0.1),
    * then 2 doublings lift 4 → 8 → 16. Missing tail tokens pad with ''
    * (sorts below every token, so a shorter suffix ranks first — the
    * definitional tie rule). */
  private[graft] def suffixRankRows(docs: DataFrame): DataFrame = {
    val pos4 = graft.util.Spread(docs.select("doc_id", "text"))
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .select(col("doc_id"), col("w"), posexplode(col("w")).as(Seq("p0", "k1")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"), col("k1"),
        expr("IF(p0 + 1 < size(w), w[p0 + 1], '')").as("k2"),
        expr("IF(p0 + 2 < size(w), w[p0 + 2], '')").as("k3"),
        expr("IF(p0 + 3 < size(w), w[p0 + 3], '')").as("k4"))
    var r = denseRankKeys(pos4, Seq("k1", "k2", "k3", "k4"))
      .select("doc_id", "pos", "rank")
      .transform(graft.util.Materialize.corpus)
    var k = 4
    while (k < SuffixCap) {
      // rank_2k(i) = dense rank of (rank_k(i), rank_k(i+k)); positions
      // whose suffix ends before i+k pair with 0 — shorter sorts first
      val shifted = r.select(col("doc_id"),
        (col("pos") - k).as("pos"), col("rank").as("k2"))
      val paired = r.withColumnRenamed("rank", "k1")
        .join(shifted, Seq("doc_id", "pos"), "left")
        .na.fill(0L, Seq("k2"))
      r = denseRankKeys(paired, Seq("k1", "k2"))
        .select("doc_id", "pos", "rank")
        .transform(graft.util.Materialize.corpus)
      k *= 2
    }
    r
  }

  /** Per-document suffix-order profile: position count, positions whose
    * capped suffix occurs elsewhere in the corpus (the duplicated-
    * substring mass a span-removal pass would target), rank extrema,
    * and a position-weighted rank checksum that pins the entire rank
    * assignment. Output (doc_id, n_pos, n_dup_pos, min_rank, max_rank,
    * rank_checksum). */
  def suffixRanks(docs: DataFrame): DataFrame = {
    val r = suffixRankRows(docs)
    val cnt = r.groupBy("rank").agg(count(lit(1)).as("cnt"))
    r.join(cnt, Seq("rank"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_pos"),
        sum(when(col("cnt") >= 2, 1L).otherwise(0L)).as("n_dup_pos"),
        min("rank").as("min_rank"), max("rank").as("max_rank"),
        sum(col("rank") * col("pos")).as("rank_checksum"))
      .orderBy("doc_id")
  }

  val suffixRanksOracle: String =
    s"""WITH d AS (SELECT doc_id, $tokensSql AS w FROM documents),
       |pos AS (
       |  SELECT doc_id, u.i + 1 AS pos,
       |         array_to_string(w[u.i + 1 : u.i + $SuffixCap], ' ') AS sfx
       |  FROM d, unnest(range(0, len(w))) u(i)),
       |r AS (
       |  SELECT doc_id, pos,
       |         dense_rank() OVER (ORDER BY sfx) AS rank,
       |         count(*) OVER (PARTITION BY sfx) AS cnt
       |  FROM pos)
       |SELECT doc_id, count(*)::BIGINT AS n_pos,
       |       sum(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_dup_pos,
       |       CAST(min(rank) AS BIGINT) AS min_rank,
       |       CAST(max(rank) AS BIGINT) AS max_rank,
       |       CAST(sum(rank * pos) AS BIGINT) AS rank_checksum
       |FROM r GROUP BY doc_id ORDER BY doc_id""".stripMargin
}
