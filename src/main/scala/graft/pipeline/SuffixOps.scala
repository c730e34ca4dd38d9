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
    * order, joined back onto `rel` as column `out` — the two-phase
    * global rank on the distinct relation. `keepKeys` retains the key
    * columns in the output (the multi-level builder ranks the SAME
    * relation at several granularities). */
  private def denseRankKeys(rel: DataFrame, keys: Seq[String],
      out: String = "rank", keepKeys: Boolean = false): DataFrame = {
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
      .withColumn(out, row_number().over(w).cast("long") + col("off"))
      .select(kc :+ col(out): _*)
    val joined = rel.join(ranked, keys)
    if (keepKeys) joined else joined.drop(keys: _*)
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

  // ---- LCP + exact duplicated extents (completes the Lee et al. SA recipe) --

  /** ALL-LEVEL suffix view: (doc_id, pos, slen, k1..k4, r8, r16),
    * where `r{k}` is the dense rank of the position's k-token capped
    * prefix, `k1..k4` are the position's first four tokens ('' pad),
    * and `slen` = min([[SuffixCap]], tokens remaining). The greedy LCP
    * descent in [[saDepthRows]] only needs EQUALITY per level, not
    * order — order is needed solely to build the next doubling — so
    * levels 1/2/4 are served by the raw token tuples (capped-gram
    * equality IS capped-prefix equality, exact and free) and only
    * 8/16 pay a dense rank: one 8-GRAM string seed + one doubling.
    * The 8-gram seed trades a wider one-pass distinct for two whole
    * rank rounds (each a distinct + range-sample + checkpoint +
    * offset collect) — measured isolated cold build at sf0.1:
    * 28.5 → 23.3 s.
    * Shuffle keys are 8 short strings at the seed and (long, long)
    * pairs after — no suffix string ever moves.
    *
    * Each level is [[graft.util.Materialize.bounded]] (NOT
    * corpus-persist): the doubling references the previous level twice
    * and the LCP descent re-references the result 8 more times —
    * without plan truncation the logical tree grows 2^levels and
    * Catalyst re-analysis dominates every downstream action (measured
    * 14 s of pure re-planning at sf0.01). The iterative-loop-state rule
    * from Materialize's doc applies verbatim. */
  private[graft] def suffixLevelRows(docs: DataFrame): DataFrame = {
    val grams = (1 to 7).map(j =>
      expr(s"IF(p0 + $j < size(w), w[p0 + $j], '')").as(s"k${j + 1}"))
    val pos8 = graft.util.Spread(docs.select("doc_id", "text"))
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .select(col("doc_id"), col("w"), posexplode(col("w")).as(Seq("p0", "k1")))
      .select(Seq(col("doc_id"), (col("p0") + 1).cast("long").as("pos"),
        least(lit(SuffixCap.toLong), size(col("w")).cast("long") - col("p0")).as("slen"),
        col("k1")) ++ grams: _*)
    val rel8 = denseRankKeys(pos8, (1 to 8).map(j => s"k$j"), "r8", keepKeys = true)
      .drop("k5", "k6", "k7", "k8") // k1..k4 stay: they ARE levels 1/2/4
      .transform(graft.util.Materialize.bounded)
    // r16 = dense rank of (r8(i), r8(i+8)); a suffix ending before i+8
    // pairs with 0, which sorts below every rank — shorter first
    val shifted = rel8.select(col("doc_id"),
      (col("pos") - 8).as("pos"), col("r8").as("nb"))
    val paired = rel8.join(shifted, Seq("doc_id", "pos"), "left")
      .na.fill(0L, Seq("nb"))
    denseRankKeys(paired, Seq("r8", "nb"), "r16", keepKeys = true)
      .drop("nb")
      .transform(graft.util.Materialize.bounded)
  }

  /** Per-position DUPLICATION DEPTH — the LCP layer of the suffix-array
    * dedup recipe: depth(p) = length of the longest prefix of p's
    * capped suffix that occurs anywhere else in the corpus (0 if even
    * the single token is unique). This is the quantity Lee et al. 2022
    * threshold to cut duplicated extents ("every position whose suffix
    * shares ≥ L leading tokens with another suffix").
    *
    * Distributed derivation, int-only shuffles end to end:
    *  1. positions with a NON-UNIQUE final rank share their entire
    *     capped suffix with another position → depth = slen;
    *  2. for the rest, the classic SA fact applies: the maximum LCP
    *     with any other suffix is attained at a RANK-ADJACENT suffix,
    *     and because ranks are DENSE the adjacent pair relation is an
    *     equi-join on r16 = r16' − 1 — no global-order window at all;
    *  3. the LCP of one adjacent pair is computed by greedy binary
    *     descent over the level ranks (8,4,2,1): if the k-prefixes at
    *     the current offset match, advance by k. Rank equality at a
    *     level is prefix equality by construction, so no token is ever
    *     re-read — each level is one equi-join of the pair relation
    *     against the level relation per side. Adjacent DISTINCT ranks
    *     bound LCP ≤ 15, so level 16 is never tested. A both-sides-
    *     short full match overshoots the greedy sum, which the final
    *     least(l, len_a, len_b) clamp restores (the padding rule makes
    *     a short prefix unequal to any longer one, so the overshoot
    *     case is exactly "both suffixes exhausted and identical").
    *  4. LCP is a function of the rank VALUES, so only one
    *     representative position per distinct rank enters the pair
    *     relation; depth joins back per rank.
    * Output (doc_id, pos, slen, depth), memoized per (session, input)
    * — `doc_sa_lcp` and `doc_sa_dup_extents` share one build. */
  private[graft] def saDepthRows(docs: DataFrame): DataFrame =
    graft.util.Memo((docs.sparkSession, "SuffixOps.saDepth", docs.semanticHash())) {
      val lv = suffixLevelRows(docs)
      // one pass per distinct rank: its member count AND a representative
      val cr = lv.groupBy("r16")
        .agg(count(lit(1)).as("cnt"),
          min(struct(col("doc_id"), col("pos"), col("slen"))).as("rep"))
        .transform(graft.util.Materialize.bounded)
      val reps = cr.select(col("r16"), col("rep.doc_id").as("rd"),
        col("rep.pos").as("rp"), col("rep.slen").as("rl"))
      var pairs = reps.select(col("r16").as("ra"), col("rd").as("da"),
          col("rp").as("pa"), col("rl").as("la"))
        .join(reps.select((col("r16") - 1).as("ra"), col("rd").as("db"),
          col("rp").as("pb"), col("rl").as("lb")), Seq("ra"))
        .withColumn("l", lit(0L))
      // level -> the equality witness: ordered ranks for 8/4 (doubling
      // artifacts), raw token tuples for 2/1 (prefix equality there IS
      // token equality — exact, and two dense-rank builds cheaper)
      def witness(k: Int) = k match {
        case 4 => struct(col("k1"), col("k2"), col("k3"), col("k4"))
        case 2 => struct(col("k1"), col("k2"))
        case 1 => col("k1")
        case _ => col(s"r$k")
      }
      for (k <- Seq(8, 4, 2, 1)) {
        val lvA = lv.select(col("doc_id").as("ja"), col("pos").as("qa"),
          witness(k).as("rka"))
        val lvB = lv.select(col("doc_id").as("jb"), col("pos").as("qb"),
          witness(k).as("rkb"))
        pairs = pairs
          .join(lvA, col("da") === col("ja") &&
            (col("pa") + col("l")) === col("qa"), "left")
          .join(lvB, col("db") === col("jb") &&
            (col("pb") + col("l")) === col("qb"), "left")
          .withColumn("l",
            col("l") + when(col("rka") === col("rkb"), lit(k.toLong)).otherwise(0L))
          .drop("ja", "qa", "rka", "jb", "qb", "rkb")
      }
      // pair (ra, ra+1): its LCP bounds the depth of BOTH endpoint ranks
      val lcp = pairs.select(col("ra"),
        least(col("l"), col("la"), col("lb")).as("lcp"))
      val nbr = lcp.select(col("ra").as("r16"), col("lcp"))
        .unionByName(lcp.select((col("ra") + 1).as("r16"), col("lcp")))
        .groupBy("r16").agg(max("lcp").as("nd"))
      lv.join(cr.select("r16", "cnt"), Seq("r16"))
        .join(nbr, Seq("r16"), "left")
        .select(col("doc_id"), col("pos"), col("slen"),
          when(col("cnt") >= 2, col("slen"))
            .otherwise(coalesce(col("nd"), lit(0L))).as("depth"))
        .transform(graft.util.Materialize.bounded)
    }

  /** Per-document LCP/depth profile: position count, duplicated-prefix
    * mass (sum of depths — the token mass a threshold-0 removal pass
    * would weigh), deepest shared prefix, and a position-weighted
    * checksum pinning every per-position depth. Output
    * (doc_id, n_pos, sum_depth, max_depth, depth_checksum). */
  def saDepthProfile(docs: DataFrame): DataFrame =
    saDepthRows(docs)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_pos"),
        sum("depth").as("sum_depth"),
        max("depth").as("max_depth"),
        sum(col("depth") * col("pos")).as("depth_checksum"))
      .orderBy("doc_id")

  /** EXACT maximal duplicated extents of ANY length ≥ `minLen`, from
    * the suffix array: a position starts a duplicated `minLen`-window
    * iff depth(p) ≥ minLen (≥ minLen leading tokens occur elsewhere),
    * and merging consecutive qualifying positions (gaps-and-islands)
    * recovers each maximal extent exactly — the same merge discipline
    * as [[Dedup.dupSpansVar]], but fed by the SA/LCP layer instead of
    * fixed-width window hashes, so ONE build serves every threshold
    * ≤ [[SuffixCap]] (dupSpansVar must re-window per threshold) and
    * matches are exact, not 61-bit-hash-probable. At minLen =
    * [[Dedup.SpanLen]] the output is law-identical to dupSpansVar
    * (spec-pinned). Output (doc_id, span_start, span_end, span_tokens)
    * per maximal extent, ordered. */
  def saDupExtents(docs: DataFrame, minLen: Int): DataFrame = {
    val wn = Window.partitionBy("doc_id").orderBy("pos")
    saDepthRows(docs).filter(col("depth") >= minLen)
      .select("doc_id", "pos")
      .withColumn("grp", col("pos") - row_number().over(wn))
      .groupBy("doc_id", "grp")
      .agg(min("pos").as("span_start"), count(lit(1)).as("run"))
      .select(col("doc_id"), col("span_start"),
        (col("span_start") + col("run") + lit(minLen.toLong - 2)).as("span_end"),
        (col("run") + lit(minLen.toLong - 1)).as("span_tokens"))
      .orderBy("doc_id", "span_start")
  }

  /** SPAN REMOVAL driven by the SA extents — the REWRITE half of the
    * Lee et al. recipe at ANY threshold ≤ [[SuffixCap]], where
    * [[Dedup.removeSpans]] is locked to the [[Dedup.SpanLen]] window
    * class. Composition of verified parts: [[saDupExtents]] finds the
    * maximal extents, [[Dedup.removeByExtents]] excises every covered
    * position (position-covered-by-ANY-extent, overlap-safe — two
    * islands separated by a gap < minLen produce extents whose token
    * ranges intersect, so n_removed derives as n_tokens − n_kept,
    * never a sum of span lengths). A fully-duplicated document
    * rewrites to the empty string. Output
    * (doc_id, n_tokens, n_removed, n_kept, new_hash), ordered. */
  def saRemoveSpans(docs: DataFrame, minLen: Int): DataFrame =
    Dedup.removeByExtents(docs, saDupExtents(docs, minLen))
      .select(col("doc_id"), col("n_tokens"), col("n_removed"), col("n_kept"),
        baseHash(col("new_text")).as("new_hash"))
      .orderBy("doc_id")

  /** Definitional oracle for [[saRemoveSpans]] at threshold `minLen`
    * over the planted corpus: exact-string duplicated windows →
    * islands → a NOT EXISTS coverage filter over the token relation —
    * no suffix array, no depth, no hash candidates. */
  def saRemoveSpansOracle(minLen: Int): String =
    s"""WITH base AS (SELECT doc_id, ${Dedup.plantedTextSql} AS text FROM documents),
       |d AS (SELECT doc_id, $tokensSql AS w FROM base),
       |wins AS (
       |  SELECT doc_id, u.i + 1 AS pos,
       |         array_to_string(w[u.i + 1 : u.i + $minLen], ' ') AS s
       |  FROM d, unnest(range(0, len(w) - $minLen + 1)) u(i)
       |  WHERE len(w) >= $minLen),
       |dup AS (SELECT s FROM wins GROUP BY s HAVING count(*) >= 2),
       |dp AS (SELECT doc_id, pos FROM wins WHERE s IN (SELECT s FROM dup)),
       |runs AS (SELECT doc_id, min(pos) AS span_start, count(*) AS run FROM (
       |           SELECT doc_id, pos, pos - row_number() OVER (
       |                    PARTITION BY doc_id ORDER BY pos) AS grp
       |           FROM dp) i GROUP BY doc_id, grp),
       |toks AS (
       |  SELECT doc_id, u.i + 1 AS pos, w[CAST(u.i AS INTEGER) + 1] AS tok
       |  FROM d, unnest(range(0, len(w))) u(i)),
       |kept AS (
       |  SELECT t.doc_id, t.pos, t.tok FROM toks t
       |  WHERE NOT EXISTS (
       |    SELECT 1 FROM runs r
       |    WHERE r.doc_id = t.doc_id
       |      AND t.pos BETWEEN r.span_start AND r.span_start + r.run + ${minLen - 2})),
       |ka AS (SELECT doc_id, count(*)::BIGINT AS n_kept,
       |              string_agg(tok, ' ' ORDER BY pos) AS ntext
       |       FROM kept GROUP BY doc_id)
       |SELECT d.doc_id, len(w)::BIGINT AS n_tokens,
       |       (len(w) - COALESCE(ka.n_kept, 0))::BIGINT AS n_removed,
       |       COALESCE(ka.n_kept, 0)::BIGINT AS n_kept,
       |       ${baseHashSql("COALESCE(ka.ntext, '')")} AS new_hash
       |FROM d LEFT JOIN ka USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  /** Definitional oracle for [[saDepthProfile]] over the
    * [[Dedup.plantSpans]]-planted corpus: depth(p) is re-derived with
    * NO suffix array at all — for each L in 1..16, a count-over-
    * partition by the L-token prefix string marks "this capped-L prefix
    * occurs elsewhere", and depth = max over L of least(L, slen) where
    * the count is ≥ 2 (the least-clamp handles two short identical
    * suffixes, which match at every L ≥ their length). Agreement pins
    * the doubling ranks, the adjacency join, the greedy descent, and
    * the clamp. */
  lazy val saDepthProfileOracle: String = {
    val pcols = (1 to SuffixCap).map(l =>
      s"array_to_string(w[u.i + 1 : u.i + $l], ' ') AS p$l").mkString(",\n       |         ")
    val ccols = (1 to SuffixCap).map(l =>
      s"count(*) OVER (PARTITION BY p$l) AS c$l").mkString(",\n       |         ")
    val cases = (1 to SuffixCap).map(l =>
      s"CASE WHEN c$l >= 2 THEN least($l, slen) ELSE 0 END").mkString(",\n       |         ")
    s"""WITH base AS (SELECT doc_id, ${Dedup.plantedTextSql} AS text FROM documents),
       |d AS (SELECT doc_id, $tokensSql AS w FROM base),
       |pos AS (
       |  SELECT doc_id, u.i + 1 AS pos, least($SuffixCap, len(w) - u.i) AS slen,
       |         $pcols
       |  FROM d, unnest(range(0, len(w))) u(i)),
       |c AS (
       |  SELECT doc_id, pos, slen,
       |         $ccols
       |  FROM pos),
       |dep AS (
       |  SELECT doc_id, pos, greatest(
       |         $cases) AS depth
       |  FROM c)
       |SELECT doc_id, count(*)::BIGINT AS n_pos,
       |       CAST(sum(depth) AS BIGINT) AS sum_depth,
       |       CAST(max(depth) AS BIGINT) AS max_depth,
       |       CAST(sum(depth * pos) AS BIGINT) AS depth_checksum
       |FROM dep GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** Definitional oracle for [[saDupExtents]] at threshold `minLen`
    * over the planted corpus: duplicated windows by EXACT string
    * grouping (no hash), islands merged per doc. */
  def saDupExtentsOracle(minLen: Int): String =
    s"""WITH base AS (SELECT doc_id, ${Dedup.plantedTextSql} AS text FROM documents),
       |wins AS (
       |  SELECT doc_id, u.i + 1 AS pos,
       |         array_to_string(w[u.i + 1 : u.i + $minLen], ' ') AS s
       |  FROM (SELECT doc_id, $tokensSql AS w FROM base) d,
       |       unnest(range(0, len(w) - $minLen + 1)) u(i)
       |  WHERE len(w) >= $minLen),
       |dup AS (SELECT s FROM wins GROUP BY s HAVING count(*) >= 2),
       |dp AS (SELECT doc_id, pos FROM wins WHERE s IN (SELECT s FROM dup)),
       |runs AS (SELECT doc_id, grp, min(pos) AS span_start, count(*) AS run FROM (
       |           SELECT doc_id, pos, pos - row_number() OVER (
       |                    PARTITION BY doc_id ORDER BY pos) AS grp
       |           FROM dp) i GROUP BY 1, 2)
       |SELECT doc_id, span_start,
       |       span_start + run + ${minLen - 2} AS span_end,
       |       run + ${minLen - 1} AS span_tokens
       |FROM runs ORDER BY doc_id, span_start""".stripMargin

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
