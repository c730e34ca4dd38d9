package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import TextOps._

/** Deduplication operator family for the training-data pipeline
  * (extension beyond the reference surface; see builder brief).
  *
  * Five operators, in increasing sophistication:
  *  - exact:        hash-groupBy on full text            (1 shuffle)
  *  - ngramJaccard: shingle-blocked exact Jaccard        (shuffle on shingle)
  *  - minhashLsh:   MinHash signatures + banded LSH      (the 100 TB path)
  *  - simhash:      64-bit SimHash + banded Hamming join (the 100 TB path)
  *  - cosinePairs:  embedding near-dup by cosine         (brute; LSH in Similarity)
  *
  * Scale notes (100 TB):
  *  - exact dedup shuffles once on text (or better, on md5(text) — we
  *    group by the 60-bit hash then confirm, keeping shuffle keys small);
  *  - ngramJaccard's shingle self-join explodes on common shingles; it is
  *    the *verify* stage — candidate generation at scale is minhashLsh,
  *    whose band join shuffles only (band_id, band_value) pairs: 8 rows
  *    per doc regardless of doc length;
  *  - all aggregations are map-side partial (min/count), no skew on the
  *    signature keys (hash-distributed by construction);
  *  - every expression is a built-in function → whole-stage codegen.
  *
  * Every operator's DuckDB oracle is generated from the SAME Scala
  * constants (permutation seeds, band layout, thresholds) a few lines
  * below its Spark twin.
  */
object Dedup {

  // ---- exact ------------------------------------------------------------

  /** Exact dedup: one representative (min doc_id) per distinct text.
    * Grouping key is the 60-bit content hash, not the full text, so the
    * shuffle moves 8-byte keys instead of documents. */
  def exact(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), baseHash(col("text")).as("h"))
      .groupBy("h")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies")
      .orderBy("keep_id")

  val exactOracle: String =
    s"""SELECT min(doc_id) AS keep_id, count(*) AS n_copies
       |FROM documents GROUP BY ${baseHashSql("text")}
       |ORDER BY keep_id""".stripMargin

  // ---- shared shingle relation ------------------------------------------

  /** (doc_id, h): distinct word-3-shingles per doc, pre-hashed to 60-bit
    * longs — set operations and joins downstream move 8-byte keys instead
    * of ~30-byte shingle strings (shuffle volume, hash probes). Collisions
    * (~n²/2^61) are negligible and mirrored exactly by the oracle. */
  private def shingleRows(docs: DataFrame): DataFrame =
    graft.util.Spread(docs.select("doc_id", "text"))
      .select(col("doc_id"),
        explode(array_distinct(
          transform(shingles(tokens(col("text"))), s => baseHash(s)))).as("h"))

  private val shingleRowsSql: String =
    s"""SELECT DISTINCT doc_id, u.h
       |  FROM (SELECT doc_id, list_transform(${shinglesSql(tokensSql)}, s -> ${baseHashSql("s")}) AS hs
       |          FROM documents) d,
       |       unnest(d.hs) u(h)""".stripMargin

  /** Jaccard threshold, fixed-point 1e6. */
  val JaccardThresholdFp = 800000L

  // ---- n-gram Jaccard ----------------------------------------------------

  /** Exact word-3-gram Jaccard near-dup pairs (jac >= 0.8), candidate
    * pairs blocked by sharing at least one shingle. Output (i, j, jac_fp). */
  def ngramJaccard(docs: DataFrame): DataFrame =
    jaccardPairs(docs).orderBy("i", "j")

  /** [[ngramJaccard]] without the presentation sort — the clustering
    * consumers ([[clusters]], [[keepBest]]) feed the pairs straight into
    * the propagation loop, where a total order buys nothing but a range
    * exchange. */
  /** Memoized per (session, corpus): the exact-Jaccard near-dup pair
    * relation is consumed by SIX entries in a run (ngram_jaccard,
    * clusters, keep_best, cc_star, corpus_report, lsh_sweep's truth
    * side), each of which previously re-paid the shingle explode + the
    * banded self-join + the exact verify (r11, guide §2.4 — compute
    * once, reuse). Bench accounts the build once in its shared_build
    * phase (`shared_jaccard_pairs`); the result is pair-count-bounded
    * (near-dup graphs are sparse by construction — the same bound the
    * driver union-find fast path banks on), so it takes the bounded
    * localCheckpoint policy. */
  private[graft] def jaccardPairs(docs: DataFrame): DataFrame =
    graft.util.Memo((docs.sparkSession, "Dedup.jaccardPairs", docs.semanticHash())) {
      graft.util.Materialize.bounded(jaccardPairsBuild(docs))
    }

  /** Memoized per (session, corpus): the shingle-intersection relation
    * (i, j, inter) over co-shingling doc pairs plus the per-doc shingle
    * counts — the expensive self-join shared by [[jaccardPairs]] and
    * [[containment]] (r11: containment previously re-paid the whole
    * join). The count side is doc-bounded; the intersection relation is
    * candidate-pair-bounded and takes the spill-safe corpus persist. */
  private def interParts(docs: DataFrame): (DataFrame, DataFrame) =
    graft.util.Memo((docs.sparkSession, "Dedup.interParts", docs.semanticHash())) {
      // materialize the shingle relation once: it feeds the self-join
      // (twice) and the count side — without this, the tokenize + md5 +
      // explode lineage recomputes per consumer. Corpus-scale, so it
      // takes the spill-safe Materialize.corpus policy (MEMORY_AND_DISK,
      // evictable, spills).
      val sh = shingleRows(docs).transform(graft.util.Materialize.corpus)
      val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("c"))
        .transform(graft.util.Materialize.bounded)
      val inter = sh.as("a").join(sh.as("b"),
          col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
        .agg(count(lit(1)).as("inter"))
        .transform(graft.util.Materialize.corpus)
      (cnt, inter)
    }

  private def jaccardPairsBuild(docs: DataFrame): DataFrame = {
    val (cnt, inter) = interParts(docs)
    inter
      .join(broadcast(cnt.as("ca")), col("i") === col("ca.doc_id"))
      .join(broadcast(cnt.as("cb")), col("j") === col("cb.doc_id"))
      .select(col("i"), col("j"),
        expr("inter * 1000000 div (ca.c + cb.c - inter)").as("jac_fp"))
      .filter(col("jac_fp") >= JaccardThresholdFp)
  }

  val ngramJaccardOracle: String =
    s"""WITH sh AS ($shingleRowsSql),
       |cnt AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id i, b.doc_id j, count(*) n
       |  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT i, j, n * 1000000 // (ca.c + cb.c - n) AS jac_fp
       |FROM inter JOIN cnt ca ON ca.doc_id = i JOIN cnt cb ON cb.doc_id = j
       |WHERE n * 1000000 // (ca.c + cb.c - n) >= $JaccardThresholdFp
       |ORDER BY i, j""".stripMargin

  // ---- passage-level dedup ------------------------------------------------

  private val PassageLen = 16
  private val PassageStride = 8

  /** Cross-document duplicated PASSAGES: 16-token windows at stride 8,
    * hashed; a window is "shared" when its hash occurs in more than one
    * document. Per-doc output: window count, shared-window count, shared
    * fraction (per-mille fixed point) — the passage-granular complement
    * of whole-doc near-dup (quotes, boilerplate, templated sections that
    * document-level Jaccard dilutes away). Docs under 16 tokens have no
    * windows and are excluded.
    *
    * Scale shape: windows are (doc_id, 8-byte hash) pairs, ~n_tokens/8
    * rows per doc; the dup-hash relation is a map-side-partial aggregate
    * and the join back is a semi-join on the hash — hash-distributed, no
    * skew short of genuinely viral passages (salt those at 100 TB).
    * Output (doc_id, n_windows, n_shared, shared_fp). */
  def passage(docs: DataFrame): DataFrame = {
    val wins = graft.util.Spread(docs.select("doc_id", "text"))
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .filter(size(col("w")) >= PassageLen)
      .select(col("doc_id"),
        explode(transform(
          sequence(lit(0), size(col("w")) - PassageLen, lit(PassageStride)),
          i => baseHash(concat_ws(" ", slice(col("w"), i + lit(1), lit(PassageLen)))))).as("h"))
      .transform(graft.util.Materialize.corpus) // feeds the dup set, the semi-join, and per-doc counts
    val dup = wins.groupBy("h").agg(countDistinct("doc_id").as("nd"))
      .filter(col("nd") >= 2).select("h")
    val perDoc = wins.groupBy("doc_id").agg(count(lit(1)).as("n_windows"))
    val shared = wins.join(dup, Seq("h"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
    perDoc.join(shared, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_windows"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"))
      .withColumn("shared_fp", expr("n_shared * 1000 div n_windows"))
      .orderBy("doc_id")
  }

  val passageOracle: String =
    s"""WITH wins AS (
       |  SELECT doc_id,
       |         ('0x' || substr(md5(array_to_string(w[i+1:i+$PassageLen], ' ')), 1, 15))::BIGINT AS h
       |  FROM (SELECT doc_id, $tokensSql AS w FROM documents) d,
       |       unnest(range(0, len(w) - $PassageLen + 1, $PassageStride)) u(i)
       |  WHERE len(w) >= $PassageLen),
       |dup AS (SELECT h FROM wins GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
       |pd AS (SELECT doc_id, count(*) AS n_windows FROM wins GROUP BY 1),
       |sh AS (SELECT doc_id, count(*) AS n_shared FROM wins
       |       WHERE h IN (SELECT h FROM dup) GROUP BY 1)
       |SELECT pd.doc_id AS doc_id, pd.n_windows,
       |       COALESCE(sh.n_shared, 0) AS n_shared,
       |       CAST(COALESCE(sh.n_shared, 0) * 1000 // pd.n_windows AS BIGINT) AS shared_fp
       |FROM pd LEFT JOIN sh ON pd.doc_id = sh.doc_id
       |ORDER BY pd.doc_id""".stripMargin

  // ---- C4-style duplicated-segment removal (text rewrite) -----------------

  /** Non-overlapping segment width for [[lineDedup]], tokens. */
  private val SegTokens = 10

  /** C4-style corpus-level duplicate-segment REMOVAL (Raffel et al. 2020
    * §2.2 dedup "three-sentence spans occurring more than once keep one
    * occurrence"): the rewrite complement of [[passage]]/[[dupSpans]],
    * which only MEASURE duplication. Text partitions into non-overlapping
    * [[SegTokens]]-token segments (trailing remainder included, so the
    * rejoin of all segments reproduces the input exactly); a segment
    * whose hash occurs ≥2 times anywhere in the corpus keeps only its
    * canonical occurrence — the (doc_id, idx)-least one — and every other
    * copy is dropped; the document is reassembled from its kept segments
    * in order. A fully-boilerplate doc survives with clean_text = ''
    * (downstream length filters decide its fate — this operator never
    * drops rows).
    *
    * Scale shape: the segment relation is n_tokens/10 rows; both the
    * occurrence-count and canonical-pick come from ONE window shuffle on
    * the segment hash (group size = duplicate multiplicity — viral
    * boilerplate is the only skew, salt it at 100 TB); reassembly is a
    * map-side-combinable collect per doc_id. All built-ins, codegen'd.
    * Output (doc_id, n_segs, n_dropped, clean_text, clean_hash). */
  def lineDedup(docs: DataFrame): DataFrame = {
    val segs = graft.util.Spread(docs.select("doc_id", "text"))
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .select(col("doc_id"),
        explode(sequence(lit(0L),
          ceil(size(col("w")) / lit(SegTokens.toDouble)).cast("long") - 1)).as("idx"),
        col("w"))
      .select(col("doc_id"), col("idx"),
        concat_ws(" ",
          slice(col("w"), (col("idx") * SegTokens + 1).cast("int"), lit(SegTokens))).as("seg"))
      .withColumn("h", baseHash(col("seg")))
    val wh = Window.partitionBy("h")
    val whOrd = Window.partitionBy("h").orderBy("doc_id", "idx")
    segs
      .withColumn("cnt", count(lit(1)).over(wh))
      .withColumn("rn", row_number().over(whOrd))
      .withColumn("dropped", col("cnt") >= 2 && col("rn") > 1)
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_segs"),
        sum(when(col("dropped"), 1L).otherwise(0L)).as("n_dropped"),
        array_join(transform(
          array_sort(collect_list(when(!col("dropped"), struct(col("idx"), col("seg"))))),
          x => x("seg")), " ").as("clean_text"))
      .withColumn("clean_hash", baseHash(col("clean_text")))
      .orderBy("doc_id")
  }

  val lineDedupOracle: String =
    s"""WITH d AS (SELECT doc_id, $tokensSql AS w FROM documents),
       |s AS (SELECT doc_id, t.i AS idx,
       |             array_to_string(w[(t.i*$SegTokens+1):((t.i+1)*$SegTokens)], ' ') AS seg
       |      FROM d, unnest(range(0, CAST(ceil(len(w) / ${SegTokens}.0) AS BIGINT))) t(i)),
       |h AS (SELECT doc_id, idx, seg, ${baseHashSql("seg")} AS hh FROM s),
       |k AS (SELECT doc_id, idx, seg,
       |             count(*) OVER (PARTITION BY hh) AS cnt,
       |             row_number() OVER (PARTITION BY hh ORDER BY doc_id, idx) AS rn
       |      FROM h),
       |a AS (SELECT doc_id, count(*) AS n_segs,
       |             CAST(sum(CASE WHEN cnt >= 2 AND rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
       |               AS n_dropped,
       |             coalesce(string_agg(CASE WHEN NOT (cnt >= 2 AND rn > 1) THEN seg END,
       |                                 ' ' ORDER BY idx), '') AS clean_text
       |      FROM k GROUP BY doc_id)
       |SELECT doc_id, n_segs, n_dropped, clean_text,
       |       ${baseHashSql("clean_text")} AS clean_hash
       |FROM a ORDER BY doc_id""".stripMargin

  // ---- exact duplicated-substring spans -----------------------------------

  /** Duplicated-span window length, tokens. */
  val SpanLen = 16

  /** Exact duplicated-substring detection (the published "dedup exact
    * substrings ≥ L tokens" recipe): stride-1 [[SpanLen]]-token window
    * hashes; a window whose hash occurs ≥2 times anywhere in the corpus
    * (cross-doc or a self-repeat) is duplicated; per doc, consecutive
    * duplicated windows merge into maximal spans via gaps-and-islands,
    * and the longest span is reported in tokens (run + SpanLen − 1).
    * Complements [[passage]] (stride-8 shared-window FRACTION): this
    * reports exact span GEOMETRY — the "how long is the longest copied
    * run" signal used to decide span-removal vs doc-removal.
    *
    * Scale shape: stride-1 windows cost one row per token — the same
    * linear blowup a suffix-array pass pays, map-side generated; the dup
    * set is a map-side-combinable count ≥2; the islands window is
    * per-doc (bounded by doc length), never global.
    * Output (doc_id, n_windows, n_dup_windows, max_span_tokens). */
  def dupSpans(docs: DataFrame): DataFrame = {
    val wins = graft.util.Spread(docs.select("doc_id", "text"))
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .filter(size(col("w")) >= SpanLen)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(col("w")) - SpanLen),
          i => struct((i + 1).cast("long").as("pos"),
            baseHash(concat_ws(" ", slice(col("w"), i + lit(1), lit(SpanLen)))).as("h")))).as("s"))
      .select(col("doc_id"), col("s.pos").as("pos"), col("s.h").as("h"))
      .transform(graft.util.Materialize.corpus) // feeds the dup set, the semi-join, and per-doc counts
    val dup = wins.groupBy("h").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2).select("h")
    val dupPos = wins.join(dup, Seq("h"), "left_semi").select("doc_id", "pos")
    val wn = Window.partitionBy("doc_id").orderBy("pos")
    val spans = dupPos.withColumn("grp", col("pos") - row_number().over(wn))
      .groupBy("doc_id", "grp").agg(count(lit(1)).as("run"))
      .groupBy("doc_id")
      .agg(max("run").as("max_run"), sum("run").as("n_dup_windows"))
    val perDoc = wins.groupBy("doc_id").agg(count(lit(1)).as("n_windows"))
    docs.select("doc_id")
      .join(perDoc, Seq("doc_id"), "left_outer")
      .join(spans, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        coalesce(col("max_run") + lit(SpanLen - 1), lit(0L)).as("max_span_tokens"))
      .orderBy("doc_id")
  }

  val dupSpansOracle: String =
    s"""WITH wins AS (
       |  SELECT doc_id, u.i + 1 AS pos,
       |         ('0x' || substr(md5(array_to_string(w[i+1:i+$SpanLen], ' ')), 1, 15))::BIGINT AS h
       |  FROM (SELECT doc_id, $tokensSql AS w FROM documents) d,
       |       unnest(range(0, len(w) - $SpanLen + 1)) u(i)
       |  WHERE len(w) >= $SpanLen),
       |dup AS (SELECT h FROM wins GROUP BY h HAVING count(*) >= 2),
       |dp AS (SELECT doc_id, pos FROM wins WHERE h IN (SELECT h FROM dup)),
       |runs AS (SELECT doc_id, grp, count(*) AS run FROM (
       |           SELECT doc_id, pos - row_number() OVER (
       |                    PARTITION BY doc_id ORDER BY pos) AS grp
       |           FROM dp) i GROUP BY 1, 2),
       |agg AS (SELECT doc_id, max(run) AS max_run,
       |               CAST(sum(run) AS BIGINT) AS n_dup FROM runs GROUP BY 1),
       |pd AS (SELECT doc_id, count(*) AS n_windows FROM wins GROUP BY 1)
       |SELECT d.doc_id, COALESCE(pd.n_windows, 0) AS n_windows,
       |       COALESCE(agg.n_dup, 0) AS n_dup_windows,
       |       COALESCE(agg.max_run + ${SpanLen - 1}, 0) AS max_span_tokens
       |FROM documents d LEFT JOIN pd USING (doc_id) LEFT JOIN agg USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  // ---- variable-length duplicated-span extents ----------------------------

  /** Planted duplicate spans for [[dupSpansVar]]'s differential gate:
    * (doc_id modulus, span length in tokens). Three lengths bracket the
    * window size (just above, 2×, 4×) so the extent merge is verified
    * at genuinely different span geometries. */
  val SpanPlants: Seq[(Long, Int)] = Seq((97L, 18), (89L, 32), (83L, 64))

  private def spanSnippet(len: Int): String =
    (0 until len).map(i => s"xdup${len}w$i").mkString(" ")

  /** Deterministic span planter: docs whose id hits a [[SpanPlants]]
    * modulus get that plant's snippet appended — every planted
    * occurrence is byte-identical across its docs, and the snippet
    * tokens (xdup…) occur nowhere in natural text, so each plant is a
    * clean duplicated span of a KNOWN length at a KNOWN position. */
  /** DuckDB-side twin of [[plantSpans]] — the planted `text` expression
    * every span oracle shares. */
  private[graft] lazy val plantedTextSql: String =
    SpanPlants.foldLeft("text") { case (acc, (m, len)) =>
      s"(CASE WHEN doc_id % $m = 0 THEN $acc || ' ${spanSnippet(len)}' ELSE $acc END)"
    }

  def plantSpans(docs: DataFrame): DataFrame = {
    val planted = SpanPlants.foldLeft(col("text")) { case (acc, (m, len)) =>
      when(col("doc_id") % m === 0,
        concat(acc, lit(" " + spanSnippet(len)))).otherwise(acc)
    }
    docs.select(col("doc_id"), planted.as("text"))
  }

  /** VARIABLE-LENGTH exact duplicated-span extents — the full output of
    * the published suffix-array dedup recipe (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better"): the
    * exact (start, end) token ranges of every maximal substring of
    * length ≥ [[SpanLen]] that occurs more than once in the corpus —
    * the ranges a span-REMOVAL pass cuts, where [[dupSpans]] only
    * reports per-doc geometry statistics.
    *
    * Form: the two-pass extend-merge over matched windows — a
    * duplicated substring of length L contributes exactly L−[[SpanLen]]+1
    * duplicated stride-1 windows, so merging consecutive duplicated
    * window positions (gaps-and-islands) recovers the exact extent
    * [min pos, min pos + run + SpanLen − 2] of length run+SpanLen−1 for
    * ANY L ≥ SpanLen — no binary lifting needed, and the row count
    * stays linear in tokens (the suffix-array cost class, in Spark's
    * shuffle model). Runs over the [[plantSpans]]-planted corpus so the
    * differential gate verifies exact extents at three span lengths.
    * Output (doc_id, span_start, span_end, span_tokens) per maximal
    * span, ordered. */
  def dupSpansVar(docs: DataFrame): DataFrame = {
    val wins = graft.util.Spread(plantSpans(docs))
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .filter(size(col("w")) >= SpanLen)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(col("w")) - SpanLen),
          i => struct((i + 1).cast("long").as("pos"),
            baseHash(concat_ws(" ", slice(col("w"), i + lit(1), lit(SpanLen)))).as("h")))).as("s"))
      .select(col("doc_id"), col("s.pos").as("pos"), col("s.h").as("h"))
      .transform(graft.util.Materialize.corpus) // dup set + semi-join probe
    val dup = wins.groupBy("h").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2).select("h")
    val wn = Window.partitionBy("doc_id").orderBy("pos")
    wins.join(dup, Seq("h"), "left_semi")
      .select("doc_id", "pos")
      .withColumn("grp", col("pos") - row_number().over(wn))
      .groupBy("doc_id", "grp")
      .agg(min("pos").as("span_start"), count(lit(1)).as("run"))
      .select(col("doc_id"), col("span_start"),
        (col("span_start") + col("run") + lit(SpanLen - 2)).as("span_end"),
        (col("run") + lit(SpanLen - 1)).as("span_tokens"))
      .orderBy("doc_id", "span_start")
  }

  val dupSpansVarOracle: String = {
    s"""WITH base AS (SELECT doc_id, $plantedTextSql AS text FROM documents),
       |wins AS (
       |  SELECT doc_id, u.i + 1 AS pos,
       |         ('0x' || substr(md5(array_to_string(w[i+1:i+$SpanLen], ' ')), 1, 15))::BIGINT AS h
       |  FROM (SELECT doc_id, $tokensSql AS w FROM base) d,
       |       unnest(range(0, len(w) - $SpanLen + 1)) u(i)
       |  WHERE len(w) >= $SpanLen),
       |dup AS (SELECT h FROM wins GROUP BY h HAVING count(*) >= 2),
       |dp AS (SELECT doc_id, pos FROM wins WHERE h IN (SELECT h FROM dup)),
       |runs AS (SELECT doc_id, grp, min(pos) AS span_start, count(*) AS run FROM (
       |           SELECT doc_id, pos, pos - row_number() OVER (
       |                    PARTITION BY doc_id ORDER BY pos) AS grp
       |           FROM dp) i GROUP BY 1, 2)
       |SELECT doc_id, span_start,
       |       span_start + run + ${SpanLen - 2} AS span_end,
       |       run + ${SpanLen - 1} AS span_tokens
       |FROM runs ORDER BY doc_id, span_start""".stripMargin
  }

  // ---- duplicated-span REMOVAL (the rewrite half of Lee et al. 2022) ------

  /** SPAN REMOVAL — completes the Lee et al. recipe: every token
    * position covered by a [[dupSpansVar]] maximal duplicated extent is
    * excised and the survivors reassembled into the rewritten document
    * (the [[lineDedup]] discipline at token-span granularity). NOTE:
    * maximal extents can OVERLAP in token space — duplicated-window-start
    * islands separated by a gap of 1..SpanLen−1 positions produce extents
    * whose token ranges intersect (the gaps-and-islands merge joins only
    * gap-0 islands) — so n_removed is derived as n_tokens − n_kept, never
    * as a sum of span lengths, which would double-count the overlap.
    * Removal itself is a single indexed `filter` over the token array
    * against the doc's ≤handful of spans (position-covered-by-ANY-extent,
    * naturally overlap-safe) — no per-token join, no quadratic work; the
    * only corpus-sized shuffle is the doc_id join of spans back to text.
    * A fully-duplicated document rewrites to the empty string (hash of
    * "" — the conservation law still holds).
    * Output (doc_id, n_tokens, n_removed, n_kept, new_hash), where
    * n_removed + n_kept == n_tokens is spec-pinned. */
  def removeSpans(docs: DataFrame): DataFrame = {
    val spans = dupSpansVar(docs)
      .groupBy("doc_id")
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("spans"))
    graft.util.Spread(plantSpans(docs))
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .join(spans, Seq("doc_id"), "left")
      .withColumn("kept",
        when(col("spans").isNull, col("w")).otherwise(expr(
          "filter(w, (t, i) -> NOT exists(spans, s -> i + 1 >= s.span_start AND i + 1 <= s.span_end))")))
      .select(col("doc_id"),
        size(col("w")).cast("long").as("n_tokens"),
        (size(col("w")) - size(col("kept"))).cast("long").as("n_removed"),
        size(col("kept")).cast("long").as("n_kept"),
        baseHash(concat_ws(" ", col("kept"))).as("new_hash"))
      .orderBy("doc_id")
  }

  lazy val removeSpansOracle: String = {
    s"""WITH base AS (SELECT doc_id, $plantedTextSql AS text FROM documents),
       |d AS (SELECT doc_id, $tokensSql AS w FROM base),
       |wins AS (
       |  SELECT doc_id, u.i + 1 AS pos,
       |         ('0x' || substr(md5(array_to_string(w[i+1:i+$SpanLen], ' ')), 1, 15))::BIGINT AS h
       |  FROM d, unnest(range(0, len(w) - $SpanLen + 1)) u(i)
       |  WHERE len(w) >= $SpanLen),
       |dup AS (SELECT h FROM wins GROUP BY h HAVING count(*) >= 2),
       |dp AS (SELECT doc_id, pos FROM wins WHERE h IN (SELECT h FROM dup)),
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
       |      AND t.pos BETWEEN r.span_start AND r.span_start + r.run + ${SpanLen - 2})),
       |ka AS (SELECT doc_id, count(*)::BIGINT AS n_kept,
       |              string_agg(tok, ' ' ORDER BY pos) AS ntext
       |       FROM kept GROUP BY doc_id)
       |SELECT d.doc_id, len(w)::BIGINT AS n_tokens,
       |       (len(w) - COALESCE(ka.n_kept, 0))::BIGINT AS n_removed,
       |       COALESCE(ka.n_kept, 0)::BIGINT AS n_kept,
       |       ('0x' || substr(md5(COALESCE(ka.ntext, '')), 1, 15))::BIGINT AS new_hash
       |FROM d LEFT JOIN ka USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
  }

  // ---- span primitives shared with the STREAMING face ---------------------

  /** Stride-1 [[SpanLen]]-token window hashes of a (doc_id, text) corpus:
    * (doc_id, pos, h) — the window primitive behind [[dupSpans]]/
    * [[dupSpansVar]], exposed for
    * [[graft.streaming.StreamingSpanDedup]]'s stored-index probes.
    * Linear in tokens, map-side generated, no shuffle. */
  private[graft] def spanWindows(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), tokens(col("text")).as("w"))
      .filter(size(col("w")) >= SpanLen)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(col("w")) - SpanLen),
          i => struct((i + 1).cast("long").as("pos"),
            baseHash(concat_ws(" ", slice(col("w"), i + lit(1), lit(SpanLen)))).as("h")))).as("s"))
      .select(col("doc_id"), col("s.pos").as("pos"), col("s.h").as("h"))

  /** Merge duplicated window-start positions (doc_id, pos) into maximal
    * token extents [span_start, span_end] — the gaps-and-islands closed
    * form shared by the batch and streaming span operators. The islands
    * window is per-doc (bounded by doc length), never global. */
  private[graft] def extentsOf(dupPos: DataFrame): DataFrame = {
    val wn = Window.partitionBy("doc_id").orderBy("pos")
    dupPos.withColumn("grp", col("pos") - row_number().over(wn))
      .groupBy("doc_id", "grp")
      .agg(min("pos").as("span_start"), count(lit(1)).as("run"))
      .select(col("doc_id"), col("span_start"),
        (col("span_start") + col("run") + lit(SpanLen - 2)).as("span_end"))
  }

  /** Excise every token position covered by an extent and reassemble —
    * the [[removeSpans]] filter, parameterized by the extent relation so
    * the streaming operator can feed stored-index extents. Extents may
    * overlap (position-covered-by-ANY is overlap-safe); n_removed is
    * derived, never summed. Output (doc_id, n_tokens, n_removed,
    * n_kept, new_text). */
  private[graft] def removeByExtents(docs: DataFrame, extents: DataFrame): DataFrame = {
    val spans = extents.groupBy("doc_id")
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("spans"))
    docs.select(col("doc_id"), tokens(col("text")).as("w"))
      .join(spans, Seq("doc_id"), "left")
      .withColumn("kept",
        when(col("spans").isNull, col("w")).otherwise(expr(
          "filter(w, (t, i) -> NOT exists(spans, s -> i + 1 >= s.span_start AND i + 1 <= s.span_end))")))
      .select(col("doc_id"),
        size(col("w")).cast("long").as("n_tokens"),
        (size(col("w")) - size(col("kept"))).cast("long").as("n_removed"),
        size(col("kept")).cast("long").as("n_kept"),
        concat_ws(" ", col("kept")).as("new_text"))
  }

  // ---- incremental dedup --------------------------------------------------

  /** Incremental-ingest dedup: an incoming batch (odd doc_ids here — the
    * deterministic stand-in for "today's crawl") admits only documents
    * whose content hash is absent from the existing corpus (even ids),
    * deduping within the batch too (min doc_id per hash). The anti-join
    * against the corpus hash set is THE shape of continuous corpus
    * growth; at 100 TB a bloom pre-filter (see
    * [[graft.pipeline.Sketches.bloomProbe]]) screens the batch before
    * the shuffle so only probable-duplicates join. Output
    * (n_incoming, n_admitted, docid_sum). */
  def incremental(docs: DataFrame): DataFrame = {
    val existing = docs.filter(col("doc_id") % 2 === 0)
      .select(baseHash(col("text")).as("h")).distinct()
    val incoming = docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), baseHash(col("text")).as("h"))
    val admitted = incoming.join(existing, Seq("h"), "left_anti")
      .groupBy("h").agg(min("doc_id").as("doc_id"))
    incoming.agg(count(lit(1)).as("n_incoming"))
      .crossJoin(admitted.agg(
        count(lit(1)).as("n_admitted"), sum("doc_id").as("docid_sum")))
  }

  val incrementalOracle: String =
    s"""WITH ex AS (
       |  SELECT DISTINCT ${baseHashSql("text")} AS h FROM documents WHERE doc_id % 2 = 0),
       |inc AS (
       |  SELECT doc_id, ${baseHashSql("text")} AS h FROM documents WHERE doc_id % 2 = 1),
       |adm AS (
       |  SELECT h, min(doc_id) AS doc_id FROM inc
       |  WHERE h NOT IN (SELECT h FROM ex) GROUP BY h)
       |SELECT (SELECT count(*) FROM inc) AS n_incoming,
       |       count(*) AS n_admitted,
       |       CAST(sum(doc_id) AS BIGINT) AS docid_sum
       |FROM adm""".stripMargin

  // ---- asymmetric containment ---------------------------------------------

  /** Containment threshold, fixed-point 1e6. */
  val ContainmentThresholdFp = 500000L

  /** Asymmetric shingle containment C(A→B) = |A∩B| / |A| — the near-dup
    * measure that catches quote/subset relationships Jaccard misses when
    * document lengths differ (a short doc fully contained in a long one
    * has high containment but low Jaccard). Emits pairs where EITHER
    * direction reaches the threshold, with both directions' values.
    * Same blocked self-join + broadcast-counts shape as [[ngramJaccard]]
    * (one intersection aggregation serves both directions).
    * Output (i, j, cont_i_fp, cont_j_fp). */
  def containment(docs: DataFrame): DataFrame = {
    // shares the memoized shingle-intersection relation with
    // [[jaccardPairs]] (r11) — only the threshold/output math differs
    val (cnt, inter) = interParts(docs)
    inter
      .join(broadcast(cnt.as("ca")), col("i") === col("ca.doc_id"))
      .join(broadcast(cnt.as("cb")), col("j") === col("cb.doc_id"))
      .select(col("i"), col("j"),
        expr("inter * 1000000 div ca.c").as("cont_i_fp"),
        expr("inter * 1000000 div cb.c").as("cont_j_fp"))
      .filter(col("cont_i_fp") >= ContainmentThresholdFp ||
        col("cont_j_fp") >= ContainmentThresholdFp)
      .orderBy("i", "j")
  }

  val containmentOracle: String =
    s"""WITH sh AS ($shingleRowsSql),
       |cnt AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id i, b.doc_id j, count(*) n
       |  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT i, j,
       |       n * 1000000 // ca.c AS cont_i_fp,
       |       n * 1000000 // cb.c AS cont_j_fp
       |FROM inter JOIN cnt ca ON ca.doc_id = i JOIN cnt cb ON cb.doc_id = j
       |WHERE n * 1000000 // ca.c >= $ContainmentThresholdFp
       |   OR n * 1000000 // cb.c >= $ContainmentThresholdFp
       |ORDER BY i, j""".stripMargin

  // ---- soft deduplication (frequency reweighting) --------------------------

  /** Soft-dedup frequency reweighting (the published alternative to hard
    * removal: keep every document but DOWN-WEIGHT redundant ones in the
    * training sampler, so boilerplate stops dominating the loss without
    * discarding the rare content embedded inside near-duplicates). A
    * doc's commonness is the mean corpus document-frequency of its
    * 3-shingles — a doc copied k times has commonness ≈ k — and its
    * sampling weight is the integer inverse in per-mille:
    * weight_pm = 1e9 div mean_freq_fp (unique doc → 1000, a
    * 10×-duplicated doc → ~100). Docs too short to shingle carry no
    * redundancy signal and keep full weight.
    *
    * Scale shape: the shingle relation is linear in corpus tokens, the
    * document-frequency relation is vocabulary-bounded with a map-side-
    * combinable count, and the per-doc collapse is one groupBy — NO pair
    * relation anywhere, the property that makes soft dedup attractive at
    * corpus scale (no candidate join at all, unlike every hard-dedup
    * operator above). All arithmetic is integer division, engine-exact.
    * Output (doc_id, n_shingles, mean_freq_fp, weight_pm) per doc. */
  def softDedupWeights(docs: DataFrame): DataFrame = {
    val sh = shingleRows(docs)
    val freq = sh.groupBy("h").agg(count(lit(1)).as("df"))
    val perDoc = sh.join(freq, "h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"), sum("df").as("s"))
      .withColumn("mean_freq_fp", expr("s * 1000000 div n_shingles"))
      .withColumn("weight_pm", expr("1000000000 div mean_freq_fp"))
    docs.select("doc_id").join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("mean_freq_fp"), lit(0L)).as("mean_freq_fp"),
        coalesce(col("weight_pm"), lit(1000L)).as("weight_pm"))
      .orderBy("doc_id")
  }

  val softDedupWeightsOracle: String =
    s"""WITH sh AS ($shingleRowsSql),
       |freq AS (SELECT h, count(*) AS df FROM sh GROUP BY h),
       |d AS (SELECT doc_id, count(*) AS n_shingles,
       |             CAST(sum(df) AS BIGINT) AS s
       |      FROM sh JOIN freq USING (h) GROUP BY doc_id),
       |m AS (SELECT doc_id, n_shingles, s * 1000000 // n_shingles AS mean_freq_fp
       |      FROM d)
       |SELECT doc_id,
       |       coalesce(n_shingles, 0) AS n_shingles,
       |       coalesce(mean_freq_fp, 0) AS mean_freq_fp,
       |       coalesce(1000000000 // mean_freq_fp, 1000) AS weight_pm
       |FROM documents LEFT JOIN m USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  // ---- MinHash + LSH -----------------------------------------------------

  val NumPerms = 32
  val Bands = 8
  val RowsPerBand = NumPerms / Bands

  /** Universal-hash permutation coefficients, mod Mersenne prime P,
    * drawn from a splitmix64 mixing stream. The previous Knuth
    * multiplicative family (a_i = c·(i+1) mod P) was LINEARLY DEPENDENT
    * across i (a_2 = 2·a_1, a_3 = 3·a_1, …), which correlates the
    * per-permutation argmin shingle: whole signature prefixes collapse
    * onto the corpus's highest-df shingles, and the band join's bucket
    * occupancy degenerates — measured by the 1M-doc scale probe as 73M
    * candidate pairs for ~20k true near-dups (invisible at the 5k-doc
    * oracle SF; verify filters the false candidates, so only candidate
    * VOLUME, not correctness, was affected). Mixed coefficients restore
    * min-wise independence (same probe: candidates track true pairs).
    * Still deterministic: the literals are generated once here and
    * spliced into BOTH the Spark plan and the DuckDB oracle. */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  def permA(i: Int): Long = java.lang.Math.floorMod(mix64(i + 1L), P - 1) + 1
  def permB(i: Int): Long = java.lang.Math.floorMod(mix64(0x5DEECE66DL + i), P)

  /** MinHash+LSH near-dup pairs: 32-perm signatures, 8 bands x 4 rows
    * (s-curve threshold ~0.59), banded candidate join, exact-Jaccard
    * verify at 0.8. Output (i, j, jac_fp) — identical to [[ngramJaccard]]
    * whenever LSH recall is 1 at the threshold.
    *
    * This is the shape that survives 100 TB: per doc the band join ships
    * 8 fixed-width rows, never the shingle set; the verify join touches
    * only candidate pairs. */
  /** MinHash band rows (doc_id, band, bv) for a (doc_id, text) relation —
    * the shareable signature stage of [[minhashLsh]], exposed for
    * incremental/streaming use (a stored band index IS a dedup state).
    * One row per (doc, band): fixed-width, corpus-size-independent keys. */
  def bandRows(docs: DataFrame): DataFrame = {
    val sh = shingleRows(docs).withColumn("hp", col("h") % P)
    val sigCols = (0 until NumPerms).map { i =>
      min((col("hp") * permA(i) + permB(i)) % P).as(s"sig$i")
    }
    val sig = sh.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
    val bandStructs = (0 until Bands).map { b =>
      val rows = (0 until RowsPerBand).map(r => col(s"sig${b * RowsPerBand + r}"))
      struct(lit(b).as("band"), concat_ws("_", rows: _*).as("bv"))
    }
    sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("e"))
      .select(col("doc_id"), col("e.band"), col("e.bv"))
  }

  /** Shared MinHash pipeline: materialized shingle rows, 32-column
    * signature relation, banded candidate pairs. Consumed by
    * [[minhashLsh]] (threshold verify) and [[minhashEstEval]]
    * (estimate-vs-exact report). */
  private[graft] def minhashParts(docs: DataFrame): (DataFrame, DataFrame, DataFrame) =
    // memoized per (session, corpus) — r11: three entries consume this
    // triple (minhash_lsh, minhash_est_eval, lsh_sweep) and each
    // previously re-paid the signature aggregate + banded self-join.
    // Bench accounts the build once (`shared_minhash_sig`); the persists
    // inside are the corpus policy, the candidate relation is
    // pair-bounded (banded), so the memo holds only persisted/bounded
    // relations.
    graft.util.Memo((docs.sparkSession, "Dedup.minhashParts", docs.semanticHash())) {
      val (sh, sig, cand) = minhashPartsBuild(docs)
      (sh, sig, graft.util.Materialize.bounded(cand))
    }

  private def minhashPartsBuild(docs: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    // shingles feed the signature build AND the verify self-join AND the
    // set-size counts — materialize once (6 consumers otherwise re-run
    // the tokenize+hash+explode lineage; this one call took 13 s/query
    // at sf0.1 before, 6x the materialized cost)
    val sh = shingleRows(docs).withColumn("hp", col("h") % P).transform(graft.util.Materialize.corpus)
    val sigCols = (0 until NumPerms).map { i =>
      // hp (< P < 2^31) keeps hp * permA inside signed-64 range
      min((col("hp") * permA(i) + permB(i)) % P).as(s"sig$i")
    }
    // signatures are consumed by both sides of the band self-join
    val sig = sh.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
      .transform(graft.util.Materialize.corpus)
    val bandStructs = (0 until Bands).map { b =>
      val rows = (0 until RowsPerBand).map(r => col(s"sig${b * RowsPerBand + r}"))
      struct(lit(b).as("band"), concat_ws("_", rows: _*).as("bv"))
    }
    val bands = sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("e"))
      .select(col("doc_id"), col("e.band"), col("e.bv"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("i"), col("y.doc_id").as("j"))
      .distinct()
    (sh, sig, cand)
  }

  def minhashLsh(docs: DataFrame): DataFrame = {
    val (sh, _, cand) = minhashParts(docs)
    // exact-Jaccard verify restricted to candidates
    val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("c"))
    val inter = cand
      .join(sh.as("sa"), col("i") === col("sa.doc_id"))
      .join(sh.as("sb"), col("j") === col("sb.doc_id") && col("sa.h") === col("sb.h"))
      .groupBy("i", "j").agg(count(lit(1)).as("inter"))
    inter
      .join(broadcast(cnt.as("ca")), col("i") === col("ca.doc_id"))
      .join(broadcast(cnt.as("cb")), col("j") === col("cb.doc_id"))
      .select(col("i"), col("j"),
        expr("inter * 1000000 div (ca.c + cb.c - inter)").as("jac_fp"))
      .filter(col("jac_fp") >= JaccardThresholdFp)
      .orderBy("i", "j")
  }

  val minhashLshOracle: String = {
    val sigExprs = (0 until NumPerms)
      .map(i => s"min((hp * ${permA(i)} + ${permB(i)}) % $P) AS sig$i").mkString(",\n       ")
    val bandCase = (0 until Bands).map { b =>
      val rows = (0 until RowsPerBand).map(r => s"sig${b * RowsPerBand + r}").mkString(", ")
      s"WHEN $b THEN concat_ws('_', $rows)"
    }.mkString(" ")
    s"""WITH sh AS ($shingleRowsSql),
       |hs AS (SELECT doc_id, h % $P AS hp FROM sh),
       |sig AS (SELECT doc_id,
       |       $sigExprs
       |  FROM hs GROUP BY doc_id),
       |bands AS (
       |  SELECT doc_id, t.band, CASE t.band $bandCase END AS bv
       |  FROM sig, range(${Bands}) t(band)),
       |cand AS (
       |  SELECT DISTINCT x.doc_id i, y.doc_id j
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.bv = y.bv AND x.doc_id < y.doc_id),
       |cnt AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT c.i, c.j, count(*) n
       |  FROM cand c
       |  JOIN sh sa ON sa.doc_id = c.i
       |  JOIN sh sb ON sb.doc_id = c.j AND sb.h = sa.h
       |  GROUP BY 1, 2)
       |SELECT i, j, n * 1000000 // (ca.c + cb.c - n) AS jac_fp
       |FROM inter JOIN cnt ca ON ca.doc_id = i JOIN cnt cb ON cb.doc_id = j
       |WHERE n * 1000000 // (ca.c + cb.c - n) >= $JaccardThresholdFp
       |ORDER BY i, j""".stripMargin
  }

  /** MinHash estimator accuracy report: for every banded candidate pair,
    * the SIGNATURE-based Jaccard estimate (matching components / 32)
    * next to the exact shingle Jaccard and the absolute error — the
    * sketch-accuracy eval that justifies trusting bare signatures when
    * the shingle sets are too big to re-intersect ([[simhashEval]]'s
    * MinHash counterpart, but candidates-only by construction: no brute
    * truth relation, so no sample bound needed). Output
    * (i, j, est_fp, jac_fp, err_fp). */
  def minhashEstEval(docs: DataFrame): DataFrame = {
    val (sh, sig, cand) = minhashParts(docs)
    val matches = (0 until NumPerms).map(i =>
      when(col(s"a.sig$i") === col(s"b.sig$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    val est = cand
      .join(sig.as("a"), col("i") === col("a.doc_id"))
      .join(sig.as("b"), col("j") === col("b.doc_id"))
      .select(col("i"), col("j"),
        // 1e6/32 is exact — a multiplication, identical in the oracle
        (matches * lit(1000000L / NumPerms)).as("est_fp"))
    val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("c"))
    val exact = cand
      .join(sh.as("sa"), col("i") === col("sa.doc_id"))
      .join(sh.as("sb"), col("j") === col("sb.doc_id") && col("sa.h") === col("sb.h"))
      .groupBy("i", "j").agg(count(lit(1)).as("inter"))
      .join(broadcast(cnt.as("ca")), col("i") === col("ca.doc_id"))
      .join(broadcast(cnt.as("cb")), col("j") === col("cb.doc_id"))
      .select(col("i"), col("j"),
        expr("inter * 1000000 div (ca.c + cb.c - inter)").as("jac_fp"))
    est.join(exact, Seq("i", "j"), "left_outer")
      .select(col("i"), col("j"), col("est_fp"),
        coalesce(col("jac_fp"), lit(0L)).as("jac_fp"),
        abs(col("est_fp") - coalesce(col("jac_fp"), lit(0L))).as("err_fp"))
      .orderBy("i", "j")
  }

  val minhashEstEvalOracle: String = {
    val sigExprs = (0 until NumPerms)
      .map(i => s"min((hp * ${permA(i)} + ${permB(i)}) % $P) AS sig$i").mkString(",\n       ")
    val bandCase = (0 until Bands).map { b =>
      val rows = (0 until RowsPerBand).map(r => s"sig${b * RowsPerBand + r}").mkString(", ")
      s"WHEN $b THEN concat_ws('_', $rows)"
    }.mkString(" ")
    val matchSum = (0 until NumPerms)
      .map(i => s"CASE WHEN a.sig$i = b.sig$i THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH sh AS ($shingleRowsSql),
       |hs AS (SELECT doc_id, h % $P AS hp FROM sh),
       |sig AS (SELECT doc_id,
       |       $sigExprs
       |  FROM hs GROUP BY doc_id),
       |bands AS (
       |  SELECT doc_id, t.band, CASE t.band $bandCase END AS bv
       |  FROM sig, range(${Bands}) t(band)),
       |cand AS (
       |  SELECT DISTINCT x.doc_id i, y.doc_id j
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.bv = y.bv AND x.doc_id < y.doc_id),
       |est AS (
       |  SELECT c.i, c.j, ($matchSum) * ${1000000L / NumPerms} AS est_fp
       |  FROM cand c JOIN sig a ON a.doc_id = c.i JOIN sig b ON b.doc_id = c.j),
       |cnt AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
       |ex AS (
       |  SELECT t.i, t.j, t.n * 1000000 // (ca.c + cb.c - t.n) AS jac_fp
       |  FROM (SELECT c.i, c.j, count(*) n
       |        FROM cand c
       |        JOIN sh sa ON sa.doc_id = c.i
       |        JOIN sh sb ON sb.doc_id = c.j AND sb.h = sa.h
       |        GROUP BY 1, 2) t
       |  JOIN cnt ca ON ca.doc_id = t.i JOIN cnt cb ON cb.doc_id = t.j)
       |SELECT est.i, est.j, est.est_fp,
       |       COALESCE(ex.jac_fp, 0) AS jac_fp,
       |       abs(est.est_fp - COALESCE(ex.jac_fp, 0)) AS err_fp
       |FROM est LEFT JOIN ex ON ex.i = est.i AND ex.j = est.j
       |ORDER BY est.i, est.j""".stripMargin
  }

  // ---- LSH parameter sweep ------------------------------------------------

  /** (bands, rows-per-band) configurations swept by [[lshSweep]] — every
    * grouping of the same [[NumPerms]]-component signature, so the sweep
    * costs ONE signature build plus three band joins. */
  val SweepConfigs: Seq[(Int, Int)] = Seq((4, 8), (8, 4), (16, 2))

  /** LSH PARAMETER SWEEP — the tuning table an operator consults before
    * committing a band shape at corpus scale: for each (bands, rows)
    * grouping of the ONE shared 32-perm signature, the banded candidate
    * volume, the exact-verified duplicates found, candidate-level
    * precision, and recall against the exact-Jaccard truth
    * ([[ngramJaccard]] — shingle-blocked, perfect recall at the
    * threshold, so verified ⊆ truth by construction and recall needs no
    * sampling). More rows per band → fewer, higher-precision candidates
    * (the S-curve steepens); fewer rows → recall at the cost of
    * candidate volume. Scale shape: the signature/shingle relations
    * build once ([[minhashParts]]' materialization discipline); each
    * config adds one band self-join + a candidates-only verify; the
    * report itself is three rows of 1-row broadcast scalar joins.
    * Output (bands, rows_per_band, n_candidates, n_dups_found,
    * n_true_dups, precision_pm, recall_pm). */
  def lshSweep(docs: DataFrame): DataFrame = {
    val (_, sig, _) = minhashParts(docs)
    // verified = candidates ∩ truth (both sides are the SAME exact
    // Jaccard at the same threshold), so the per-config verify is one
    // semi-join against the truth pairs computed once — never three
    // re-runs of the shingle intersection
    val truthPairs = graft.util.Materialize.bounded(
      jaccardPairs(docs).select("i", "j"))
    val truthN = truthPairs.agg(count(lit(1)).as("n_true_dups"))
    SweepConfigs.map { case (nb, rpb) =>
      val bandStructs = (0 until nb).map { b =>
        val rows = (0 until rpb).map(r => col(s"sig${b * rpb + r}"))
        struct(lit(b).as("band"), concat_ws("_", rows: _*).as("bv"))
      }
      val bands = sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("e"))
        .select(col("doc_id"), col("e.band"), col("e.bv"))
      val cand = bands.as("x").join(bands.as("y"),
          col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("i"), col("y.doc_id").as("j"))
        .distinct()
        .transform(graft.util.Materialize.corpus) // counted + verified below
      val found = cand.join(truthPairs, Seq("i", "j"), "left_semi")
        .agg(count(lit(1)).as("n_dups_found"))
      cand.agg(count(lit(1)).as("n_candidates"))
        .crossJoin(broadcast(found))          // 1-row scalar joins
        .crossJoin(broadcast(truthN))
        .select(lit(nb.toLong).as("bands"), lit(rpb.toLong).as("rows_per_band"),
          col("n_candidates"), col("n_dups_found"), col("n_true_dups"),
          expr("CASE WHEN n_candidates > 0 THEN n_dups_found * 1000 div n_candidates ELSE 0 END")
            .as("precision_pm"),
          expr("CASE WHEN n_true_dups > 0 THEN n_dups_found * 1000 div n_true_dups ELSE 0 END")
            .as("recall_pm"))
    }.reduce(_ unionByName _).orderBy("bands")
  }

  lazy val lshSweepOracle: String = {
    val sigExprs = (0 until NumPerms)
      .map(i => s"min((hp * ${permA(i)} + ${permB(i)}) % $P) AS sig$i").mkString(",\n       ")
    val cfg = SweepConfigs.map { case (nb, rpb) =>
      val bandCase = (0 until nb).map { b =>
        val rows = (0 until rpb).map(r => s"sig${b * rpb + r}").mkString(", ")
        s"WHEN $b THEN concat_ws('_', $rows)"
      }.mkString(" ")
      s"""bands_$nb AS (
         |  SELECT doc_id, t.band, CASE t.band $bandCase END AS bv
         |  FROM sig, range($nb) t(band)),
         |cand_$nb AS (
         |  SELECT DISTINCT x.doc_id i, y.doc_id j
         |  FROM bands_$nb x JOIN bands_$nb y
         |    ON x.band = y.band AND x.bv = y.bv AND x.doc_id < y.doc_id),
         |found_$nb AS (
         |  SELECT c.i, c.j FROM cand_$nb c
         |  WHERE EXISTS (SELECT 1 FROM truth t WHERE t.i = c.i AND t.j = c.j))""".stripMargin
    }.mkString(",\n|")
    val rows = SweepConfigs.map { case (nb, rpb) =>
      s"""SELECT ${nb}::BIGINT AS bands, ${rpb}::BIGINT AS rows_per_band,
         |       (SELECT count(*) FROM cand_$nb)::BIGINT AS n_candidates,
         |       (SELECT count(*) FROM found_$nb)::BIGINT AS n_dups_found,
         |       (SELECT count(*) FROM truth)::BIGINT AS n_true_dups,
         |       CAST(CASE WHEN (SELECT count(*) FROM cand_$nb) > 0
         |            THEN (SELECT count(*) FROM found_$nb) * 1000 // (SELECT count(*) FROM cand_$nb)
         |            ELSE 0 END AS BIGINT) AS precision_pm,
         |       CAST(CASE WHEN (SELECT count(*) FROM truth) > 0
         |            THEN (SELECT count(*) FROM found_$nb) * 1000 // (SELECT count(*) FROM truth)
         |            ELSE 0 END AS BIGINT) AS recall_pm""".stripMargin
    }.mkString("\n|UNION ALL\n|")
    s"""WITH sh AS ($shingleRowsSql),
       |hs AS (SELECT doc_id, h % $P AS hp FROM sh),
       |sig AS (SELECT doc_id,
       |       $sigExprs
       |  FROM hs GROUP BY doc_id),
       |truth AS MATERIALIZED (SELECT i, j FROM ($ngramJaccardOracle)),
       |$cfg
       |$rows
       |ORDER BY bands""".stripMargin
  }

  // ---- SimHash -----------------------------------------------------------

  val SimBits = 60               // baseHash is 60 bits
  val SimBands = 4
  val SimBandBits = SimBits / SimBands
  val HammingMax = 3L

  /** Token-frequency-weighted 60-bit SimHash per doc, then near-dup pairs
    * by banded Hamming join (4 bands x 15 bits; any equal band → candidate;
    * verify Hamming <= 3). Output (i, j, hamming). */
  def simhash(docs: DataFrame): DataFrame = {
    val tok = graft.util.Spread(docs.select("doc_id", "text"))
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("cnt"))
      .withColumn("h", baseHash(col("tok")))
    val bits = tok
      .select(col("doc_id"), col("cnt"), col("h"),
        explode(sequence(lit(0), lit(SimBits - 1))).as("b"))
      .groupBy("doc_id", "b")
      .agg(sum(col("cnt") * (expr("(h >> b) & 1") * 2 - 1)).as("s"))
    // one 64-bit signature per doc, consumed by BOTH sides of the band
    // self-join — materialize so the 64-way bit explode + two aggregations
    // run once, not twice
    val sims = bits.groupBy("doc_id")
      .agg(sum(when(col("s") > 0, expr("shiftleft(cast(1 AS bigint), b)"))
        .otherwise(0L)).as("sim"))
      .transform(graft.util.Materialize.corpus)
    val bandStructs = (0 until SimBands).map { b =>
      struct(lit(b).as("band"),
        expr(s"(sim >> ${b * SimBandBits}) & ${(1L << SimBandBits) - 1}").as("bv"))
    }
    val bands = sims.select(col("doc_id"), col("sim"),
        explode(array(bandStructs: _*)).as("e"))
      .select(col("doc_id"), col("sim"), col("e.band"), col("e.bv"))
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("i"), col("y.doc_id").as("j"),
        bit_count(col("x.sim").bitwiseXOR(col("y.sim"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= HammingMax)
      .orderBy("i", "j")
  }

  val simhashOracle: String =
    s"""WITH tok AS (
       |  SELECT doc_id, u.tok, count(*) AS cnt
       |  FROM (SELECT doc_id, $tokensSql AS w FROM documents) d, unnest(d.w) u(tok)
       |  GROUP BY 1, 2),
       |hs AS (SELECT doc_id, cnt, ${baseHashSql("tok")} AS h FROM tok),
       |bits AS (
       |  SELECT doc_id, t.b, sum(cnt * (((h >> t.b) & 1) * 2 - 1)) AS s
       |  FROM hs, range(${SimBits}) t(b) GROUP BY 1, 2),
       |sims AS (
       |  SELECT doc_id,
       |         sum(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END) AS sim
       |  FROM bits GROUP BY doc_id),
       |bands AS (
       |  SELECT doc_id, sim, t.band,
       |         (sim >> (t.band * ${SimBandBits})) & ${(1L << SimBandBits) - 1} AS bv
       |  FROM sims, range(${SimBands}) t(band))
       |SELECT DISTINCT x.doc_id AS i, y.doc_id AS j,
       |       bit_count(xor(x.sim, y.sim)) AS hamming
       |FROM bands x JOIN bands y
       |  ON x.band = y.band AND x.bv = y.bv AND x.doc_id < y.doc_id
       |WHERE bit_count(xor(x.sim, y.sim)) <= $HammingMax
       |ORDER BY i, j""".stripMargin

  // ---- dedup clusters (connected components) -----------------------------

  /** Skew-safe per-cluster member count: aggregate + BROADCAST join,
    * never `count().over(Window.partitionBy("cluster_id"))` — the
    * window puts every member row of the LARGEST cluster into one task,
    * and at 100 TB a boilerplate near-dup component can hold a large
    * fraction of the corpus (the one non-AQE-splittable stage flagged
    * in round 9).
    *
    * The broadcast side is counts of MULTI-member clusters only
    * (n ≥ 2): singletons — the overwhelming corpus majority — are
    * reconstructed as fill(1) after a left join, so the broadcast
    * relation is COMPONENT-bounded (≤ edge count / 2, the same bound
    * the driver union-find fast path already banks on), never
    * doc-count-bounded. That kills the round-10 shape's second
    * shuffle+sort of the full labeled relation (round-10's reproduced
    * ×1.8 on dedup_clusters, attributed this round by isolated
    * fresh-JVM A/B: window 1.35 s floor, shuffled agg+join 2.15 s,
    * this form 1.4 s) while keeping the skew safety: a broadcast hash
    * join has no partition-by-cluster stage at all.
    *
    * `labeled` is deliberately NOT persisted for its two consumers
    * (counts + the join probe): every caller's relation is a
    * column-pruned id scan joined to labels derived from CHECKPOINTED
    * loop state, so the double consumption re-reads one int64 column
    * twice — measured strictly cheaper than building an
    * InMemoryRelation (the persist cost ccStar ~2 s/run at bench SF),
    * and the same trade holds at scale. Recompute is deterministic:
    * both inputs are checkpoint-backed or source scans. Output
    * preserves (idCol, cluster_id, n_members). */
  /** r12 size gate (round-11 verdict item 1): the broadcast is only
    * taken when the caller can BOUND the multi-member count relation
    * from something it already knows driver-side (the collected edge
    * list of the union-find fast path, ccStar's loop-signature edge
    * count). An unconditional `broadcast()` hint bypasses
    * autoBroadcastJoinThreshold, and the count relation's true bound is
    * edge-count/2 — multi-GB at 10⁹ near-dup pairs, a guaranteed
    * driver/executor OOM at 100 TB. The fallback is a plain equi-join:
    * sort-merge/shuffled-hash under AQE, whose skew-join splitting
    * handles the giant-component partition the broadcast was originally
    * protecting against. */
  private[graft] def withMemberCounts(labeled: DataFrame, idCol: String,
      broadcastCounts: Boolean): DataFrame = {
    val counts = labeled.groupBy("cluster_id")
      .agg(count(lit(1)).cast("long").as("n_members"))
      .filter(col("n_members") >= 2L)
    labeled.join(
        if (broadcastCounts) broadcast(counts) else counts,
        Seq("cluster_id"), "left")
      .na.fill(1L, Seq("n_members"))
      .select(col(idCol), col("cluster_id"), col("n_members"))
  }

  /** Group near-duplicates into clusters: connected components over the
    * ngram-Jaccard pair graph, labeled by the min doc_id in each
    * component (the canonical "keep" representative). Every doc gets a
    * row; singletons are their own cluster. Output
    * (doc_id, cluster_id, n_members).
    *
    * Distributed min-label propagation with a driver convergence loop —
    * the standard Spark shape for iterative graph algorithms (GraphX
    * Pregel does the same). Near-dup components are shallow (pairs/
    * chains), so convergence is 2-3 rounds; `localCheckpoint` cuts the
    * growing lineage each round. At 100 TB: same loop, with the label
    * relation hash-partitioned on doc_id so each round is one shuffle;
    * iteration count is bounded by component diameter, which dedup
    * graphs keep tiny. */
  def clusters(docs: DataFrame): DataFrame = {
    val labeled = labelDf(docs) // eager: propagateClusters has chosen its path
    // fast path taken ⇔ the whole edge list fit on the driver ⇒ the
    // multi-member count relation is ≤ driverEdgeLimit rows — broadcast
    // is safe; otherwise fall back to the AQE-splittable shuffle join
    withMemberCounts(labeled, "doc_id",
        broadcastCounts = lastPropagationRounds == 0)
      .orderBy("doc_id")
  }

  /** Core of [[clusters]]: (doc_id, cluster_id) via distributed min-label
    * propagation, without the n_members window (callers that aggregate
    * per cluster — [[keepBest]] — skip the window sort entirely). */
  private def labelDf(docs: DataFrame): DataFrame =
    propagateClusters(jaccardPairs(docs).select("i", "j"), docs.select("doc_id"))

  /** Generic distributed connected components by min-label propagation:
    * `pairs` is an undirected (i, j) edge list; `nodes` (single id column)
    * supplies the universe — ids touching no edge come back as singleton
    * clusters. Output columns: (<nodes' id column>, cluster_id). Shared by
    * the text near-dup clustering and the embedding semantic-dup
    * clustering. */
  /** Edge-count ceiling for the driver-side union-find fast path: 2M
    * (i, j) pairs ≈ 32 MB on the driver — far below any sane driver
    * heap. Near-dup graphs are sparse by construction (that's what makes
    * dedup a dedup problem), so in practice even 100 TB corpora land
    * here; the distributed loop below is the correctness backstop when
    * they don't. */
  private val DriverEdgeLimit = 2000000

  /** Test hook: lowering this forces the distributed min-label loop (the
    * branch that actually runs when a 100 TB edge set overflows the
    * driver cap) so specs can diff it against the union-find fast path.
    * Production code never writes it. */
  private[graft] var driverEdgeLimit: Int = DriverEdgeLimit

  /** Observability for specs: rounds the last distributed propagation ran
    * (0 when the driver fast path was taken). */
  private[graft] var lastPropagationRounds: Int = 0

  private[graft] def propagateClusters(pairsDf: DataFrame, nodes: DataFrame): DataFrame = {
    val idName = nodes.columns.head
    val spark = pairsDf.sparkSession
    import spark.implicits._
    // Adaptive strategy (the AQE-broadcast analogue for iterative graph
    // work): collect up to limit+1 edges; if the whole edge list fits,
    // run exact union-find on the driver — the iterative joins, per-round
    // shuffles, and convergence-check jobs all disappear. Only when the
    // edge list overflows the cap does the distributed min-label loop
    // run (and then its per-round cost is justified by the data size).
    val sample = pairsDf.limit(driverEdgeLimit + 1).collect()
    if (sample.length <= driverEdgeLimit) {
      lastPropagationRounds = 0
      // `limit` returned everything → `sample` IS the edge list
      val parent = new java.util.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.get(r) != r) r = parent.get(r)
        var c = x // path compression
        while (parent.get(c) != r) { val n = parent.get(c); parent.put(c, r); c = n }
        r
      }
      sample.foreach { row =>
        val i = row.getLong(0); val j = row.getLong(1)
        if (!parent.containsKey(i)) parent.put(i, i)
        if (!parent.containsKey(j)) parent.put(j, j)
        val ri = find(i); val rj = find(j)
        if (ri != rj) { if (ri < rj) parent.put(rj, ri) else parent.put(ri, rj) }
      }
      // min node id per component — roots were always united downward to
      // the smaller id, so find(x) already IS the component minimum
      val labels = new scala.collection.mutable.ArrayBuffer[(Long, Long)](parent.size)
      parent.keySet.forEach(k => labels += ((k, find(k))))
      val connected = spark.createDataset(labels.toSeq).toDF(idName, "cluster_id")
      val singletons = nodes
        .join(broadcast(connected.select(idName)), Seq(idName), "left_anti")
        .withColumn("cluster_id", col(idName))
      return connected.unionByName(singletons)
    }
    import org.apache.spark.HashPartitioner
    import org.apache.spark.storage.StorageLevel
    // RDD-level loop (the GraphX/Pregel exception to DataFrame-first):
    // each round persists exactly one labels RDD and eagerly unpersists
    // the previous one — localCheckpoint blocks are NOT evictable and
    // were accumulating across invocations until the memory store
    // thrashed (353 s bench spike); persist/unpersist keeps at most two
    // small relations alive.
    //
    // Only nodes that touch an edge participate in the loop: the near-dup
    // graph is a tiny fraction of the corpus (that's what makes it a
    // DEDUP problem), so propagation cost is bounded by the edge set, not
    // the doc count — every other doc is a singleton cluster appended as
    // one anti-join afterwards. One shared HashPartitioner, sized by the
    // edge count, co-partitions edges and labels so each round's joins
    // are narrow (the only per-round shuffle is the small reduceByKey of
    // freshly-propagated labels).
    val pairs = pairsDf.as[(Long, Long)].rdd
    val both = pairs.flatMap { case (i, j) => Seq((i, j), (j, i)) }
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nEdges = both.count()
    val part = new HashPartitioner(math.max(1, math.min(
      (nEdges / 50000L).toInt + 1, spark.sparkContext.defaultParallelism)))
    val edges = both.partitionBy(part).persist(StorageLevel.MEMORY_AND_DISK)
    edges.count() // materialize via `both`, then drop the unpartitioned copy
    both.unpersist(blocking = false)
    var labels = edges.keys.distinct(part.numPartitions).map(d => (d, d))
      .partitionBy(part).persist(StorageLevel.MEMORY_AND_DISK)
    var converged = false
    var iter = 0
    // bound only as a runaway backstop — and fail LOUDLY if hit, never
    // return silently-unconverged (wrong) labels
    while (!converged && iter < 64) {
      val prop = edges.join(labels).map { case (_, (dst, lab)) => (dst, lab) }
      val next = labels.union(prop).reduceByKey(part, math.min(_, _))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val changed = next.join(labels)
        .filter { case (_, (a, b)) => a != b }.count()
      labels.unpersist(blocking = false)
      labels = next
      converged = changed == 0
      iter += 1
    }
    require(converged, s"label propagation did not converge in $iter rounds")
    lastPropagationRounds = iter
    edges.unpersist(blocking = false)
    val connected = labels.toDF(idName, "cluster_id")
    val singletons = nodes
      .join(connected.select(idName), Seq(idName), "left_anti")
      .withColumn("cluster_id", col(idName))
    connected.unionByName(singletons)
  }

  /** DuckDB mirror: min reachable id via a recursive CTE (UNION dedup
    * guarantees termination), same fixpoint as the propagation loop. */
  val clustersOracle: String =
    s"""WITH RECURSIVE sh AS ($shingleRowsSql),
       |cnt AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id i, b.doc_id j, count(*) n
       |  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |pairs AS (
       |  SELECT i, j FROM inter
       |  JOIN cnt ca ON ca.doc_id = i JOIN cnt cb ON cb.doc_id = j
       |  WHERE n * 1000000 // (ca.c + cb.c - n) >= $JaccardThresholdFp),
       |e AS (SELECT i AS a, j AS b FROM pairs UNION ALL SELECT j, i FROM pairs),
       |r(doc_id, lab) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT r.doc_id, e.b FROM r JOIN e ON e.a = r.lab),
       |lbl AS (SELECT doc_id, min(lab) AS cluster_id FROM r GROUP BY doc_id)
       |SELECT doc_id, cluster_id,
       |       count(*) OVER (PARTITION BY cluster_id) AS n_members
       |FROM lbl ORDER BY doc_id""".stripMargin

  // ---- star-contraction connected components ----------------------------

  /** Chain stride for the planted path component: every doc_id ≡ 0
    * (mod 4) links to the next multiple — a path of n/4 nodes, the
    * graph shape that DEFEATS min-label propagation (diameter rounds)
    * and the driver union-find narrative (a 100 TB edge set need not
    * fit any driver). */
  val StarChainStep = 4L

  /** Chain ceiling: the path stops at this doc_id, so the planted
    * diameter (≈ [[StarChainMax]]/[[StarChainStep]] ≈ 500 hops) is the
    * same at every SF and the oracle's independent closure stays
    * fixture-bounded rather than corpus-bounded. 500 hops is still two
    * orders past what a diameter-bound propagation loop tolerates. */
  val StarChainMax = 1996L

  /** Rounds the last [[ccStar]] run took (spec observability). */
  private[graft] var lastStarRounds: Int = 0

  /** Connected components by ALTERNATING STAR CONTRACTION (Kiveris et
    * al. 2014, "Connected Components in MapReduce and Beyond" — the
    * published O(log n)-round algorithm): each round, large-star hangs
    * every strictly-larger neighbor of a node onto its neighborhood
    * minimum, then small-star hangs the smaller neighbors onto it;
    * components collapse to stars on their minimum in ~log n rounds
    * REGARDLESS of diameter. [[propagateClusters]]' min-label loop needs
    * diameter rounds (the planted [[StarChainStep]] path would take
    * n/4 of them) and its union-find fast path needs the edges on the
    * driver; this operator needs neither — every round is two
    * edge-bounded shuffles, and the loop-control checksum is the only
    * thing the driver sees. Same output contract as [[clusters]]:
    * (doc_id, cluster_id, n_members), cluster_id = component minimum. */
  def ccStar(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    // coalesce: max of zero rows is null — empty input must return empty,
    // not NPE (the other operators' totality contract)
    val maxId = docs.agg(coalesce(max("doc_id"), lit(-1L))).head.getLong(0)
    val chain = docs.select(col("doc_id").as("i"))
      .filter(col("i") % StarChainStep === 0 &&
        col("i") + StarChainStep <= least(lit(StarChainMax), lit(maxId)))
      .withColumn("j", col("i") + StarChainStep)
    var e = jaccardPairs(docs).select("i", "j").unionByName(chain)
      .filter(col("i") =!= col("j")).distinct()
      .select(col("i").as("u"), col("j").as("v"))
      .transform(graft.util.Materialize.bounded)
    // loop control only. Failure mode of a (count, hash-sum) collision:
    // PREMATURE exit — declaring stability while the edge set is still
    // changing, i.e. potentially wrong labels — not an extra round;
    // including the edge count in the signature bounds that risk (the
    // colliding round would need identical cardinality AND hash mass)
    def sig(df: DataFrame) = {
      val r = df.agg(count(lit(1)), coalesce(sum(expr("hash(u, v)")), lit(0L))).head
      (r.getLong(0), r.getLong(1))
    }
    // one large-star + small-star round as a pure plan transform
    def roundStep(cur: DataFrame): DataFrame = {
      // LARGE-STAR: over the symmetric closure, center u connects every
      // strictly-larger neighbor to m = min(N(u) ∪ {u}). Intermediate
      // relations stay UNDEDUPED — min-aggregates are duplicate-blind
      // and the per-round fanout is degree-bounded; the one distinct per
      // round runs at the checkpoint, saving two shuffles per round.
      val sym = cur.union(cur.select(col("v").as("u"), col("u").as("v")))
      val lm = sym.groupBy("u").agg(least(min("v"), col("u")).as("m"))
      val large = sym.join(lm, Seq("u"))
        .filter(col("v") > col("u") && col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
      // SMALL-STAR: orient toward the smaller endpoint; center u
      // connects its (all-smaller) neighbors and itself to the minimum
      val o = large.select(greatest(col("u"), col("v")).as("u"),
          least(col("u"), col("v")).as("v"))
        .filter(col("u") =!= col("v"))
      val sm = o.groupBy("u").agg(min("v").as("m"))
      o.join(sm, Seq("u"))
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(sm.filter(col("u") =!= col("m")).select(col("u"), col("m").as("v")))
        .distinct()
    }
    var s = sig(e)
    var rounds = 0
    var stable = false
    while (!stable && rounds < 40) {
      // exactly ONE star round per materialization: each round body
      // references its input several times (symmetric-closure union,
      // aggregate + join pairs), which is free against a checkpointed
      // leaf but multiplies compute when chained un-materialized —
      // fusing two rounds per checkpoint was measured 2× SLOWER at
      // sf0.1 (11.7 s vs 6.1 s: only exchanges are runtime-reused;
      // the post-exchange operators of the inner round re-execute per
      // reference).
      val next = roundStep(e)
      e = graft.util.Materialize.bounded(next)
      rounds += 1
      val s2 = sig(e)
      stable = s2 == s
      s = s2
    }
    if (!stable)
      throw new IllegalStateException(
        s"ccStar: star contraction did not stabilize within $rounds rounds — " +
          "log-round convergence is the algorithm's theorem, so this input " +
          "hit a bug, not a big graph; refusing to emit possibly-wrong labels")
    lastStarRounds = rounds
    val labels = e.groupBy("u").agg(min("v").as("cluster_id"))
      .select(col("u").as("doc_id"), col("cluster_id"))
    val labeled = docs.select("doc_id")
      .join(labels, Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
    // the loop signature's final edge count bounds the multi-member
    // count relation (one count row per star root ≤ contracted edges)
    withMemberCounts(labeled, "doc_id",
        broadcastCounts = s._1 <= driverEdgeLimit)
      .orderBy("doc_id")
  }

  /** Same closure as [[clustersOracle]], over pairs ∪ the planted
    * chain — the oracle states the SEMANTICS (components), not the
    * algorithm, so the star contraction is verified against an
    * independent derivation. */
  val ccStarOracle: String =
    s"""WITH RECURSIVE sh AS ($shingleRowsSql),
       |cnt AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id i, b.doc_id j, count(*) n
       |  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |jp AS (
       |  SELECT i, j FROM inter
       |  JOIN cnt ca ON ca.doc_id = i JOIN cnt cb ON cb.doc_id = j
       |  WHERE n * 1000000 // (ca.c + cb.c - n) >= $JaccardThresholdFp),
       |chain AS (
       |  SELECT doc_id AS i, doc_id + $StarChainStep AS j FROM documents
       |  WHERE doc_id % $StarChainStep = 0
       |    AND doc_id + $StarChainStep <=
       |          least($StarChainMax, (SELECT max(doc_id) FROM documents))),
       |pairs AS (SELECT i, j FROM jp UNION SELECT i, j FROM chain),
       |e AS (SELECT i AS a, j AS b FROM pairs UNION ALL SELECT j, i FROM pairs),
       |r(doc_id, lab) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT r.doc_id, e.b FROM r JOIN e ON e.a = r.lab),
       |lbl AS (SELECT doc_id, min(lab) AS cluster_id FROM r GROUP BY doc_id)
       |SELECT doc_id, cluster_id,
       |       count(*) OVER (PARTITION BY cluster_id) AS n_members
       |FROM lbl ORDER BY doc_id""".stripMargin

  /** Dataset-curation output: one surviving doc per cluster — the member
    * with the highest quality score (ties → smaller doc_id). This is the
    * "what do I actually train on" composition of [[clusters]] ×
    * [[TextOps.qualityScore]]. Output (cluster_id, keep_id, quality_fp,
    * n_members). */
  def keepBest(docs: DataFrame): DataFrame = {
    val labeled = labelDf(docs)
      .join(TextOps.qualityFp(docs).select(col("doc_id"), col("quality_fp")), Seq("doc_id"))
    // single-pass per-cluster argmax: max of (quality, -doc_id) struct ==
    // "highest quality, ties -> smallest doc_id" — one groupBy instead of
    // two window sorts (each a full exchange + sort at scale)
    labeled.groupBy("cluster_id")
      .agg(
        count(lit(1)).as("n_members"),
        max(struct(col("quality_fp"), (-col("doc_id")).as("neg_id"))).as("b"))
      .select(col("cluster_id"), (-col("b.neg_id")).as("keep_id"),
        col("b.quality_fp").as("quality_fp"), col("n_members"))
      .orderBy("cluster_id")
  }

  val keepBestOracle: String = {
    // clusters CTE chain + quality join + per-cluster argmax
    val qualityCte =
      s"""q AS (
         |  SELECT doc_id,
         |         (len(list_distinct(${TextOps.tokensSql})) * 1000 // len(${TextOps.tokensSql}))
         |           + (CASE WHEN len(${TextOps.tokensSql}) BETWEEN 30 AND 500 THEN 200 ELSE 0 END)
         |           - len(regexp_extract_all(text, '[^a-z0-9 ]')) * 50 AS quality_fp
         |  FROM documents)""".stripMargin
    s"""WITH RECURSIVE sh AS ($shingleRowsSql),
       |cnt AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id i, b.doc_id j, count(*) n
       |  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |pairs AS (
       |  SELECT i, j FROM inter
       |  JOIN cnt ca ON ca.doc_id = i JOIN cnt cb ON cb.doc_id = j
       |  WHERE n * 1000000 // (ca.c + cb.c - n) >= $JaccardThresholdFp),
       |e AS (SELECT i AS a, j AS b FROM pairs UNION ALL SELECT j, i FROM pairs),
       |r(doc_id, lab) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT r.doc_id, e.b FROM r JOIN e ON e.a = r.lab),
       |lbl AS (SELECT doc_id, min(lab) AS cluster_id FROM r GROUP BY doc_id),
       |mem AS (SELECT cluster_id, count(*) AS n_members FROM lbl GROUP BY cluster_id),
       |$qualityCte,
       |ranked AS (
       |  SELECT l.cluster_id, l.doc_id, q.quality_fp, m.n_members,
       |         row_number() OVER (PARTITION BY l.cluster_id
       |                            ORDER BY q.quality_fp DESC, l.doc_id) AS rn
       |  FROM lbl l JOIN q ON q.doc_id = l.doc_id
       |  JOIN mem m ON m.cluster_id = l.cluster_id)
       |SELECT cluster_id, doc_id AS keep_id, quality_fp, n_members
       |FROM ranked WHERE rn = 1 ORDER BY cluster_id""".stripMargin
  }

  // ---- detector evaluation -----------------------------------------------

  /** Precision/recall of the SimHash near-dup detector against the
    * exact-Jaccard truth set — the evaluation loop a curation pipeline
    * runs before trusting an approximate detector at scale (the ANN
    * recall report's dedup-side counterpart). Pair sets compose via
    * semi/anti joins (no full materialization of either side beyond the
    * pair relations the detectors already produce); fixed-point ratios
    * in exact integer arithmetic. Output one row
    * (tp, fp, fn, precision_fp, recall_fp). */
  def simhashEval(docs: DataFrame): DataFrame = {
    // each relation feeds three joins (semi/anti/anti) — materialize once
    // instead of recomputing the shingle/signature pipelines per probe
    // (round-3 verdict: this was the slowest entry at 7.9 s)
    val truth = jaccardPairs(docs).select("i", "j").localCheckpoint(true)
    val cand = simhash(docs).select("i", "j").localCheckpoint(true)
    val tp = cand.join(truth, Seq("i", "j"), "left_semi").agg(count(lit(1)).as("tp"))
    val fp = cand.join(truth, Seq("i", "j"), "left_anti").agg(count(lit(1)).as("fp"))
    val fn = truth.join(cand, Seq("i", "j"), "left_anti").agg(count(lit(1)).as("fn"))
    tp.crossJoin(fp).crossJoin(fn)
      .select(col("tp"), col("fp"), col("fn"),
        expr("tp * 1000000 div greatest(tp + fp, 1)").as("precision_fp"),
        expr("tp * 1000000 div greatest(tp + fn, 1)").as("recall_fp"))
  }

  lazy val simhashEvalOracle: String =
    s"""WITH truth AS (SELECT i, j FROM ($ngramJaccardOracle)),
       |cand AS (SELECT i, j FROM ($simhashOracle)),
       |tp AS (SELECT count(*) AS tp FROM cand WHERE EXISTS
       |        (SELECT 1 FROM truth t WHERE t.i = cand.i AND t.j = cand.j)),
       |fp AS (SELECT count(*) AS fp FROM cand WHERE NOT EXISTS
       |        (SELECT 1 FROM truth t WHERE t.i = cand.i AND t.j = cand.j)),
       |fn AS (SELECT count(*) AS fn FROM truth WHERE NOT EXISTS
       |        (SELECT 1 FROM cand c WHERE c.i = truth.i AND c.j = truth.j))
       |SELECT tp, fp, fn,
       |       tp * 1000000 // greatest(tp + fp, 1) AS precision_fp,
       |       tp * 1000000 // greatest(tp + fn, 1) AS recall_fp
       |FROM tp, fp, fn""".stripMargin

  // ---- corpus curation report --------------------------------------------

  /** One-row corpus health summary — the numbers a curation run reports
    * before/after each pass: doc and token totals, exact-duplicate
    * surplus (docs beyond one keeper per distinct text), docs touched by
    * a near-dup pair, short docs, and the integer mean quality score.
    *
    * Every column is a full-corpus aggregate with map-side partials; the
    * near-dup count reuses [[jaccardPairs]] (blocking + exact verify),
    * so the only non-linear stage is the same bounded shingle self-join
    * the dedup passes already pay. Single-row cross-joins are
    * 1×1 broadcast composition, not data joins. */
  def corpusReport(docs: DataFrame): DataFrame = {
    val nt = size(tokens(col("text"))).cast("long")
    val basic = docs.select(col("text"), nt.as("nt"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum("nt").as("n_tokens"),
        (count(lit(1)) - count_distinct(col("text"))).as("exact_dup_extra"),
        sum(when(col("nt") < 30, 1L).otherwise(0L)).as("short_docs"))
    val neardup = jaccardPairs(docs)
      .select(explode(array(col("i"), col("j"))).as("d"))
      .agg(count_distinct(col("d")).as("neardup_docs"))
    val quality = TextOps.qualityFp(docs)
      .agg(expr("sum(quality_fp) div count(1)").as("mean_quality_fp"))
    basic.crossJoin(neardup).crossJoin(quality)
  }

  val corpusReportOracle: String =
    s"""WITH sh AS ($shingleRowsSql),
       |cnt AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id i, b.doc_id j, count(*) n
       |  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |pairs AS (
       |  SELECT i, j FROM inter
       |  JOIN cnt ca ON ca.doc_id = i JOIN cnt cb ON cb.doc_id = j
       |  WHERE n * 1000000 // (ca.c + cb.c - n) >= $JaccardThresholdFp),
       |nd AS (SELECT count(DISTINCT d) AS neardup_docs
       |       FROM (SELECT i AS d FROM pairs UNION SELECT j FROM pairs)),
       |b AS (SELECT count(*) AS n_docs,
       |             CAST(sum(len(${TextOps.tokensSql})) AS BIGINT) AS n_tokens,
       |             count(*) - count(DISTINCT text) AS exact_dup_extra,
       |             CAST(sum(CASE WHEN len(${TextOps.tokensSql}) < 30 THEN 1 ELSE 0 END) AS BIGINT)
       |               AS short_docs
       |      FROM documents),
       |q AS (SELECT CAST(sum(
       |               (len(list_distinct(${TextOps.tokensSql})) * 1000 // len(${TextOps.tokensSql}))
       |                 + (CASE WHEN len(${TextOps.tokensSql}) BETWEEN 30 AND 500 THEN 200 ELSE 0 END)
       |                 - len(regexp_extract_all(text, '[^a-z0-9 ]')) * 50) // count(*) AS BIGINT)
       |               AS mean_quality_fp
       |      FROM documents)
       |SELECT n_docs, n_tokens, exact_dup_extra, short_docs, neardup_docs, mean_quality_fp
       |FROM b, nd, q""".stripMargin

  /** Pairwise shingle-set Jaccard BETWEEN SOURCES — the corpus-analysis
    * view of duplication: which sources mirror each other (syndication,
    * scrapes of the same site, republication). 100 TB shape: the relation
    * is distinct (source, shingle) — vocabulary-bounded, not doc-bounded —
    * and intersections come from a per-shingle source-set explode (fanout
    * ≤ |sources|² per shingle, with |sources| a catalog-sized dimension),
    * never a shingle self-join. Output (s1, s2, inter, jac_fp). */
  def crossSourceOverlap(docs: DataFrame): DataFrame = {
    val sh = graft.util.Spread(docs.select("source", "text"))
      .select(col("source"),
        explode(array_distinct(
          transform(shingles(tokens(col("text"))), s => baseHash(s)))).as("h"))
      .distinct()
      .transform(graft.util.Materialize.corpus) // feeds the pair explode AND the per-source counts
    val cnt = sh.groupBy("source").agg(count(lit(1)).as("c"))
    val inter = sh.groupBy("h")
      .agg(sort_array(collect_set(col("source"))).as("ss"))
      .filter(size(col("ss")) > 1)
      .select(explode(expr(
        "flatten(transform(ss, (x, i) -> transform(slice(ss, i + 2, size(ss)), " +
          "y -> struct(x AS s1, y AS s2))))")).as("p"))
      .groupBy(col("p.s1").as("s1"), col("p.s2").as("s2"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(broadcast(cnt.as("ca")), col("s1") === col("ca.source"))
      .join(broadcast(cnt.as("cb")), col("s2") === col("cb.source"))
      .select(col("s1"), col("s2"), col("inter"),
        expr("inter * 1000000 div (ca.c + cb.c - inter)").as("jac_fp"))
      .orderBy("s1", "s2")
  }

  val crossSourceOverlapOracle: String =
    s"""WITH sh AS (
       |  SELECT DISTINCT source, u.h
       |  FROM (SELECT source, list_transform(${TextOps.shinglesSql(TextOps.tokensSql)},
       |                                      s -> ${TextOps.baseHashSql("s")}) AS hs
       |        FROM documents) d,
       |       unnest(d.hs) u(h)),
       |cnt AS (SELECT source, count(*) AS c FROM sh GROUP BY source),
       |inter AS (
       |  SELECT a.source s1, b.source s2, count(*) AS inter
       |  FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source
       |  GROUP BY 1, 2)
       |SELECT s1, s2, inter,
       |       CAST(inter * 1000000 // (ca.c + cb.c - inter) AS BIGINT) AS jac_fp
       |FROM inter
       |JOIN cnt ca ON s1 = ca.source
       |JOIN cnt cb ON s2 = cb.source
       |ORDER BY s1, s2""".stripMargin

  /** Deterministic hash-split (train/valid/test 90/5/5 by content hash) —
    * the standard leakage-safe way to split a corpus: membership depends
    * only on the text, never on row order or partitioning. Output:
    * per-split doc count + doc_id checksum. */
  def trainTestSplit(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), (baseHash(col("text")) % 100).as("bucket"))
      .withColumn("split",
        when(col("bucket") < 90, "train")
          .when(col("bucket") < 95, "valid")
          .otherwise("test"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"), sum("doc_id").as("docid_sum"))
      .orderBy("split")

  val trainTestSplitOracle: String =
    s"""WITH b AS (
       |  SELECT doc_id, ${baseHashSql("text")} % 100 AS bucket FROM documents),
       |s AS (SELECT doc_id, CASE WHEN bucket < 90 THEN 'train'
       |                          WHEN bucket < 95 THEN 'valid'
       |                          ELSE 'test' END AS split FROM b)
       |SELECT split, count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS docid_sum
       |FROM s GROUP BY split ORDER BY split""".stripMargin

  // ---- embedding cosine near-dup ----------------------------------------

  /** Cosine threshold, fixed-point 1e6 (testdata max pair cosine ~0.51,
    * so 0.45 exercises the operator non-trivially). */
  val CosineThresholdFp = 450000L

  /** Embedding near-dup pairs by cosine >= 0.45, brute-force O(n^2)
    * verify form. The scale path is Similarity.lshTopK's hyperplane
    * bucketing; this operator is its exact counterpart. */
  def cosinePairs(emb: DataFrame): DataFrame =
    cosinePairsUnsorted(emb).orderBy("i", "j")

  private def cosinePairsUnsorted(emb: DataFrame): DataFrame = {
    import graft.functions.VectorMath.dotF64
    val dot = (a: String, b: String) => dotF64(col(a), col(b))
    val e = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dotF64(col("v"), col("v"))))
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"),
        floor(dot("a.v", "b.v") / (col("a.nrm") * col("b.nrm")) * 1e6).cast("long").as("cos_fp"))
      .filter(col("cos_fp") >= CosineThresholdFp)
  }

  // ---- banded hyperplane LSH near-dup (the 100 TB path) ------------------

  /** Band layout: EmbBands bands of EmbBandBits sign-bits each. A pair is a
    * candidate iff it collides in at least one band. Bucket count per band
    * is 2^EmbBandBits = 256 (and grows with EmbBandBits, not with corpus
    * size) — the band self-join shuffles fixed-width (band, bucket) rows,
    * never vectors, and touches only same-bucket pairs. */
  val EmbBands = 16
  val EmbBandBits = 8

  /** All EmbBands band buckets in ONE codegen'd vector pass (replaces 128
    * per-plane `aggregate(zip_with(...))` dots — the 6× `emb_dup_clusters`
    * regression of round 4). Same quadratic-mixed coefficient stream as
    * VectorMath.HyperplaneBuckets (decorrelated planes — the round-5
    * scale probe found the old linear stream concentrating buckets),
    * same ascending-d IEEE summation order → bit-identical buckets with
    * the DuckDB `bandedCandSql` mirror below. */
  private def allBandBuckets: Column =
    graft.functions.VectorMath.hyperplaneBuckets(col("v"), EmbBands, EmbBandBits)

  /** Embedding near-dup pairs, banded-LSH candidate generation + exact
    * cosine verify — the scale form of [[cosinePairs]]. Candidates are
    * pairs sharing a band bucket (union over bands, deduped), then the
    * exact threshold filter runs on candidates only, so precision is 1.0
    * by construction and recall is the band-collision probability
    * (measured against brute truth by [[cosineBandedEval]]).
    *
    * Recall tracks the similarity regime: per-hyperplane collision is
    * p = 1 - angle/pi, so at a real near-dup threshold (cos 0.9, p~0.86)
    * the default parameters give 1-(1-p^8)^16 ~ 0.997 recall, while the
    * testdata's deliberately low 0.45 threshold (p~0.65) yields ~0.40 —
    * the eval entry keeps that trade measured instead of hidden.
    *
    * Band width must SCALE with the corpus: with b band bits there are
    * 2^b buckets per band, so expected occupancy is n/2^b and the
    * candidate join emits Θ(bands · n²/2^b) pairs — at a FIXED width the
    * pair count grows quadratically in n (measured: the 8-bit default
    * that's instant on 5k vectors degenerates to ~10^10 candidates on 1M
    * random vectors). Size bandBits ≈ log2(n / targetOccupancy) so
    * occupancy stays O(1) and the join stays linear; recall lost to
    * narrower buckets is bought back with MORE BANDS, never wider
    * buckets. The 8-bit default anchors the sf-scale DuckDB oracle;
    * scale callers pass bandBits explicitly ([[bandBitsFor]]).
    *
    * Scale shape: the banded relation is EmbBands fixed-width rows per
    * vector; the candidate join is an equi-join on (band, bucket); the
    * verify joins are equi-joins on vec_id. No non-equi self-join
    * anywhere (pinned in PlanHygieneSpec). */
  def cosinePairsBanded(emb: DataFrame): DataFrame =
    cosinePairsBandedUnsorted(emb, EmbBandBits).orderBy("i", "j")

  def cosinePairsBanded(emb: DataFrame, bandBits: Int): DataFrame =
    cosinePairsBandedUnsorted(emb, bandBits).orderBy("i", "j")

  /** Band width for an n-vector corpus, sized so FALSE-candidate volume
    * stays O(n): random sign-agreement per band is ~n²·bands/2^bits
    * pairs, so bits ≈ log2(n·bands) keeps it ≈ n/2 (measured at 1M
    * vectors: occupancy-4 sizing still emitted 30M candidates whose
    * 512-byte vector payloads wrote ~50 GB of verify-join shuffle; this
    * sizing cuts candidates to ~n). The trade is recall at LOW cosine
    * thresholds (per-band survival p^bits falls with width) — exact and
    * very-near duplicates (p≈1) survive any width, and lower-threshold
    * semantic near-dup mining at corpus scale belongs to the more-bands
    * config or the k-means path ([[graft.pipeline.Similarity.semDedup]])
    * instead of wider buckets. Floored at the oracle-anchored default. */
  def bandBitsFor(n: Long): Int =
    math.max(EmbBandBits,
      (64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, n))) + 3)

  private def cosinePairsBandedUnsorted(emb: DataFrame, bandBits: Int): DataFrame = {
    import graft.functions.VectorMath.dotF64
    val e = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dotF64(col("v"), col("v"))))
    val banded = e.select(col("vec_id"),
      posexplode(graft.functions.VectorMath.hyperplaneBuckets(
        col("v"), EmbBands, bandBits)).as(Seq("band", "bkt")))
      .transform(graft.util.Materialize.corpus) // plane dots — compute once, not per join side
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bkt") === col("b.bkt") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"))
      .distinct()
    cand
      .join(e.select(col("vec_id").as("i"), col("v").as("av"), col("nrm").as("an")), Seq("i"))
      .join(e.select(col("vec_id").as("j"), col("v").as("bv"), col("nrm").as("bn")), Seq("j"))
      .select(col("i"), col("j"),
        floor(dotF64(col("av"), col("bv")) / (col("an") * col("bn")) * 1e6)
          .cast("long").as("cos_fp"))
      .filter(col("cos_fp") >= CosineThresholdFp)
  }

  /** DuckDB mirror of the banded relation: same quadratic-mixed
    * coefficient stream (see VectorMath.HyperplaneBuckets — the linear
    * stream correlated planes and concentrated buckets at scale), same
    * band layout, nested list_reduce folds in array order. */
  private val bandsCteSql: String =
    s"""ev AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |bands AS (
       |  SELECT vec_id, band,
       |         list_reduce(list_transform(range(0, $EmbBandBits), k ->
       |           CASE WHEN list_reduce(list_transform(range(0, 64),
       |                  d -> v[d+1] * ((((((2654435761 * ((band*$EmbBandBits+k)*64 + d + 1)) % 2147483647) * ((2654435761 * ((band*$EmbBandBits+k)*64 + d + 1)) % 2147483647) + ((2654435761 * ((band*$EmbBandBits+k)*64 + d + 1)) % 2147483647)) % 2147483647) % 2001) - 1000)),
       |                (x, y) -> x + y) > 0
       |                THEN (1::BIGINT << k) ELSE 0::BIGINT END),
       |           (a, b) -> a + b) AS bkt
       |  FROM ev, (SELECT unnest(range(0, $EmbBands)) AS band) bs)""".stripMargin

  /** [[bandsCteSql]] + the self-join candidate stage. */
  private val bandedCandSql: String =
    s"""$bandsCteSql,
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS i, b.vec_id AS j
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bkt = b.bkt AND a.vec_id < b.vec_id)""".stripMargin

  /** Benchmark-vector modulus for [[semanticDecontaminate]] (the
    * embedding-space mirror of TextOps.decontaminate's BenchMod: every
    * 10th vec_id is "the benchmark split"). */
  val SemBenchMod = 10L

  /** Semantic decontamination: flag TRAIN vectors whose cosine to ANY
    * benchmark vector reaches [[CosineThresholdFp]] — the
    * embedding-space complement of the 13-gram `doc_decontaminate`
    * (n-gram overlap misses paraphrased leakage; embedding similarity
    * catches it). Same banded-LSH discipline as [[cosinePairsBanded]],
    * but the candidate stage is a CROSS-side equi-join on
    * (band, bucket): train rows probe benchmark rows only, so candidate
    * volume is Θ(bands · n_train · n_bench / 2^bits), never all-pairs —
    * and at 100 TB the bench side is tiny (a benchmark suite), making
    * the probe effectively a broadcast-scale lookup. Exact-cosine
    * verify on candidates only. Output one row per CONTAMINATED train
    * vector: (vec_id, n_bench_hits, max_cos_fp). */
  def semanticDecontaminate(emb: DataFrame): DataFrame = {
    import graft.functions.VectorMath.dotF64
    val e = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dotF64(col("v"), col("v"))))
    val banded = e.select(col("vec_id"),
        posexplode(graft.functions.VectorMath.hyperplaneBuckets(
          col("v"), EmbBands, EmbBandBits)).as(Seq("band", "bkt")))
      .transform(graft.util.Materialize.corpus) // consumed by both join sides
    val isBench = col("vec_id") % SemBenchMod === 0L
    val cand = banded.filter(!isBench).as("t")
      .join(banded.filter(isBench).as("b"),
        col("t.band") === col("b.band") && col("t.bkt") === col("b.bkt"))
      .select(col("t.vec_id").as("i"), col("b.vec_id").as("j"))
      .distinct()
    cand
      .join(e.select(col("vec_id").as("i"), col("v").as("av"), col("nrm").as("an")), Seq("i"))
      .join(e.select(col("vec_id").as("j"), col("v").as("bv"), col("nrm").as("bn")), Seq("j"))
      .select(col("i"),
        floor(dotF64(col("av"), col("bv")) / (col("an") * col("bn")) * 1e6)
          .cast("long").as("cos_fp"))
      .filter(col("cos_fp") >= CosineThresholdFp)
      .groupBy("i")
      .agg(count(lit(1)).as("n_bench_hits"), max("cos_fp").as("max_cos_fp"))
      .select(col("i").as("vec_id"), col("n_bench_hits"), col("max_cos_fp"))
      .orderBy("vec_id")
  }

  /** The bands+cand+hits chain — spliced into
    * [[semanticDecontaminateOracle]] and the trainManifestV2 oracle. */
  private[pipeline] val semDecontamCtes: String =
    s"""$bandsCteSql,
       |cand AS (
       |  SELECT DISTINCT t.vec_id AS i, b.vec_id AS j
       |  FROM bands t JOIN bands b ON t.band = b.band AND t.bkt = b.bkt
       |  WHERE t.vec_id % $SemBenchMod != 0 AND b.vec_id % $SemBenchMod = 0),
       |hits AS (
       |  SELECT cand.i,
       |         floor(list_reduce(list_transform(range(1, 65), d -> av.v[d] * bv.v[d]), (x, y) -> x + y)
       |           / (sqrt(list_reduce(list_transform(range(1, 65), d -> av.v[d] * av.v[d]), (x, y) -> x + y))
       |              * sqrt(list_reduce(list_transform(range(1, 65), d -> bv.v[d] * bv.v[d]), (x, y) -> x + y)))
       |           * 1e6)::BIGINT AS cos_fp
       |  FROM cand JOIN ev av ON av.vec_id = cand.i JOIN ev bv ON bv.vec_id = cand.j)""".stripMargin

  val semanticDecontaminateOracle: String =
    s"""WITH $semDecontamCtes
       |SELECT i AS vec_id, count(*)::BIGINT AS n_bench_hits, max(cos_fp) AS max_cos_fp
       |FROM hits WHERE cos_fp >= $CosineThresholdFp
       |GROUP BY i ORDER BY vec_id""".stripMargin

  private val pairDotSql =
    "list_reduce(list_transform(range(1, 65), d -> av.v[d] * bv.v[d]), (x, y) -> x + y)"
  private def pairNrmSql(t: String) =
    s"sqrt(list_reduce(list_transform(range(1, 65), d -> $t.v[d] * $t.v[d]), (x, y) -> x + y))"

  val cosinePairsBandedOracle: String =
    s"""WITH $bandedCandSql
       |SELECT cand.i, cand.j,
       |       floor($pairDotSql / (${pairNrmSql("av")} * ${pairNrmSql("bv")}) * 1e6)::BIGINT AS cos_fp
       |FROM cand JOIN ev av ON av.vec_id = cand.i JOIN ev bv ON bv.vec_id = cand.j
       |WHERE floor($pairDotSql / (${pairNrmSql("av")} * ${pairNrmSql("bv")}) * 1e6) >= $CosineThresholdFp
       |ORDER BY i, j""".stripMargin

  // ---- kNN similarity-join graph -----------------------------------------

  /** Neighbors kept per vector in the kNN graph. */
  val KnnGraphK = 3

  /** Approximate kNN-graph construction — the all-vectors similarity JOIN
    * (every vector gets its top-K most-similar neighbors), the input
    * relation semantic-clustering and graph-based dedup pipelines build
    * first. Candidates come from the same banded hyperplane-LSH relation
    * as [[cosinePairsBanded]] (no all-pairs join anywhere); each unordered
    * collision feeds both directions, exact cosine scores candidates
    * only, and a per-vector top-K window ranks them. Vectors with no band
    * collision have no neighbors at this recall setting and are absent —
    * the measured approximation (see [[cosineBandedEval]]).
    *
    * Scale shape: band join shuffles fixed-width (band, bucket) rows;
    * score joins are equi-joins on vec_id; the window partitions by
    * vec_id over candidate lists bounded by band-bucket occupancy.
    * The no-arg form pins the oracle-scale band width; corpus-scale
    * callers MUST size bandBits with [[bandBitsFor]] (same quadratic
    * fixed-width degeneration as [[cosinePairsBanded]] — measured ×50
    * for ×10 data at 100k vectors on the default width).
    * Output (vec_id, rank, neighbor_id, cos_fp). */
  def knnGraph(emb: DataFrame): DataFrame = knnGraph(emb, EmbBandBits)

  def knnGraph(emb: DataFrame, bandBits: Int): DataFrame =
    // memoized per (session, input plan, band width): the edge list feeds
    // emb_knn_graph, emb_knn_triangles, emb_pagerank, AND ann_graph_topk
    // in one run — n·K rows (corpus-scaled) → evictable spill-safe
    // persist, forced so consumers read blocks instead of re-running the
    // band join (Bench builds it once in its shared_build phase).
    graft.util.Memo(
      (emb.sparkSession, "Dedup.knnGraph", emb.semanticHash(), bandBits)) {
      val g = graft.util.Materialize.corpus(knnGraphBuild(emb, bandBits))
      g.count()
      g
    }

  private def knnGraphBuild(emb: DataFrame, bandBits: Int): DataFrame = {
    import graft.functions.VectorMath.dotF64
    val e = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dotF64(col("v"), col("v"))))
    val banded = e.select(col("vec_id"),
      posexplode(graft.functions.VectorMath.hyperplaneBuckets(
        col("v"), EmbBands, bandBits)).as(Seq("band", "bkt")))
      .transform(graft.util.Materialize.corpus)
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bkt") === col("b.bkt") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"))
      .distinct()
    val directed = cand.union(cand.select(col("j").as("i"), col("i").as("j")))
    val scored = directed
      .join(e.select(col("vec_id").as("i"), col("v").as("av"), col("nrm").as("an")), Seq("i"))
      .join(e.select(col("vec_id").as("j"), col("v").as("bv"), col("nrm").as("bn")), Seq("j"))
      .select(col("i").as("vec_id"), col("j").as("neighbor_id"),
        floor(dotF64(col("av"), col("bv")) / (col("an") * col("bn")) * 1e6)
          .cast("long").as("cos_fp"))
    val w = Window.partitionBy("vec_id").orderBy(col("cos_fp").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= KnnGraphK)
      .select("vec_id", "rank", "neighbor_id", "cos_fp")
      .orderBy("vec_id", "rank")
  }

  /** Shared CTE chain ending in `r` = the ranked kNN edge list; consumed
    * by [[knnGraphOracle]], [[knnTrianglesOracle]], and
    * Similarity.graphTopKOracle (CTE names: ev, bands, cand, dir,
    * scored, r — splice-safe alongside non-clashing names). */
  private[pipeline] val knnEdgesCte: String =
    s"""$bandedCandSql,
       |dir AS (SELECT i, j FROM cand UNION ALL SELECT j AS i, i AS j FROM cand),
       |scored AS (
       |  SELECT d.i AS vec_id, d.j AS neighbor_id,
       |         floor($pairDotSql / (${pairNrmSql("av")} * ${pairNrmSql("bv")}) * 1e6)::BIGINT AS cos_fp
       |  FROM dir d JOIN ev av ON av.vec_id = d.i JOIN ev bv ON bv.vec_id = d.j),
       |r AS (SELECT vec_id, neighbor_id, cos_fp,
       |             row_number() OVER (PARTITION BY vec_id ORDER BY cos_fp DESC, neighbor_id) AS rank
       |      FROM scored)""".stripMargin

  val knnGraphOracle: String =
    s"""WITH $knnEdgesCte
       |SELECT vec_id, rank, neighbor_id, cos_fp FROM r WHERE rank <= $KnnGraphK
       |ORDER BY vec_id, rank""".stripMargin

  /** Triangle count and local clustering coefficient over the symmetrized
    * [[knnGraph]] edge set — the corpus-structure readout an embedding
    * pipeline runs to tell tight semantic clusters (cc → 1) from hub-and-
    * spoke noise (cc → 0) before trusting kNN labels or SemDeDup radii
    * (Watts–Strogatz local coefficient, computed exactly).
    *
    * Scale shape: the undirected edge relation is ≤ n·K rows; triangle
    * enumeration is two self-joins on single vertex keys with every
    * wedge (x<y<z ordered, so each triangle counts ONCE) checked by a
    * semi-join — per-vertex fan-out is bounded by the graph degree (≤ 2K
    * here), so no quadratic stage exists at any corpus size. cc_fp is
    * integer fixed-point: 2e6·tri / (deg·(deg−1)).
    * Output (vec_id, deg, n_tri, cc_fp). */
  def knnTriangles(emb: DataFrame): DataFrame = knnTriangles(emb, EmbBandBits)

  def knnTriangles(emb: DataFrame, bandBits: Int): DataFrame = {
    val edges = knnGraph(emb, bandBits)
      .select(least(col("vec_id"), col("neighbor_id")).as("a"),
        greatest(col("vec_id"), col("neighbor_id")).as("b"))
      .distinct()
      .transform(graft.util.Materialize.corpus) // feeds degrees + both sides of the wedge join
    val deg = edges.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    val tri = edges.as("e1").join(edges.as("e2"), col("e1.b") === col("e2.a"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
      .join(edges.as("e3"),
        col("x") === col("e3.a") && col("z") === col("e3.b"), "left_semi")
    val triPerV = tri.select(explode(array(col("x"), col("y"), col("z"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("n_tri"))
    deg.join(triPerV, Seq("v"), "left_outer")
      .select(col("v").as("vec_id"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .withColumn("cc_fp",
        expr("IF(deg >= 2, 2000000 * n_tri div (deg * (deg - 1)), CAST(0 AS BIGINT))"))
      .orderBy("vec_id")
  }

  val knnTrianglesOracle: String =
    s"""WITH $knnEdgesCte,
       |g AS (SELECT vec_id, neighbor_id FROM r WHERE rank <= $KnnGraphK),
       |e AS (SELECT DISTINCT least(vec_id, neighbor_id) AS a,
       |                      greatest(vec_id, neighbor_id) AS b FROM g),
       |deg AS (SELECT v, count(*) AS deg
       |        FROM (SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e) GROUP BY 1),
       |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
       |        FROM e e1 JOIN e e2 ON e1.b = e2.a
       |        WHERE EXISTS (SELECT 1 FROM e e3 WHERE e3.a = e1.a AND e3.b = e2.b)),
       |tv AS (SELECT v, count(*) AS n_tri
       |       FROM (SELECT x AS v FROM tri UNION ALL SELECT y AS v FROM tri
       |             UNION ALL SELECT z AS v FROM tri) GROUP BY 1)
       |SELECT deg.v AS vec_id, deg.deg AS deg,
       |       coalesce(tv.n_tri, 0) AS n_tri,
       |       CASE WHEN deg.deg >= 2
       |            THEN 2000000 * coalesce(tv.n_tri, 0) // (deg.deg * (deg.deg - 1))
       |            ELSE 0 END AS cc_fp
       |FROM deg LEFT JOIN tv ON deg.v = tv.v
       |ORDER BY vec_id""".stripMargin

  /** PageRank damping numerator (d = 85/100) and fixed-point scale. */
  val PrDamp = 85L
  val PrScale = 1000000000L

  /** PageRank iterations — fixed so both engines run the identical
    * unrolled computation (convergence rank-stabilizes in a handful of
    * rounds on a K-out-regular graph; the ENTRY pins the count, it is
    * not an until-convergence loop). */
  val PrIters = 5

  /** PageRank over the [[knnGraph]] — graph-based centrality on the
    * similarity graph (the authority signal graph-dedup / representative
    * selection ranks by: a vector many near-dups point at is the
    * cluster's natural exemplar). The iterative-relational pattern at
    * 100 TB: scores and edges stay distributed; each round is one
    * equi-join + map-side-combinable sum, localCheckpoint'd so lineage
    * stays flat (same discipline as [[propagateClusters]]' distributed
    * branch).
    *
    * Determinism: all arithmetic is int64 fixed-point ([[PrScale]]) —
    * per-edge contribution is `score div out_degree` (exact), sums are
    * integer (order-free), damping is `85·x div 100`. Nodes without
    * out-edges (no banded candidates) drop their mass — documented sink
    * semantics, identical in both engines. Output (vec_id, pr_fp). */
  def knnPagerank(emb: DataFrame): DataFrame = {
    val edges = knnGraph(emb).select(col("vec_id").as("i"), col("neighbor_id").as("j"))
      .transform(graft.util.Materialize.corpus)
    val vecs = emb.select("vec_id")
    val n = vecs.count()
    val base = PrScale / math.max(n, 1L) // total on an empty corpus
    val tele = (100L - PrDamp) * base / 100L // teleport term, constant per node
    // out-degree joined onto the edge list ONCE: each iteration is then
    // a single equi-join + map-side-combinable sum instead of two joins
    // (5 rounds × 1 join saved; same int64 arithmetic, identical output)
    val deg = edges.groupBy("i").agg(count(lit(1)).as("d"))
    val edgesDeg = edges.join(deg, Seq("i"))
      .select(col("i"), col("j"), col("d"))
      .transform(graft.util.Materialize.corpus)
    // r12 (guide §2.4): the loop state is the SPARSE in-mass relation
    // `m` (nodes receiving any mass), not the dense (vec_id, s) table —
    // a node absent from `m` has score exactly `tele` (its in-sum is 0),
    // a constant, so the old per-round `vecs LEFT JOIN inc` densification
    // is recoverable with one coalesce at the NEXT join and the dense
    // relation only materializes once, at the end. Identical int64
    // arithmetic: s = tele + 85·coalesce(m, 0) div 100 unchanged.
    var m: DataFrame = null // iteration-0 scores are uniformly `base`
    for (_ <- 1 to PrIters) {
      val src =
        if (m == null) edgesDeg.withColumn("s", lit(base))
        else edgesDeg.join(m.select(col("vec_id").as("i"), col("m")), Seq("i"), "left_outer")
          .withColumn("s", lit(tele) + expr(s"$PrDamp * coalesce(m, 0L) div 100"))
      m = src
        .select(col("j"), expr("s div d").as("c"))
        .groupBy(col("j").as("vec_id"))
        .agg(sum("c").as("m"))
        .localCheckpoint(true) // loop state: cut lineage per iteration (Materialize.bounded class)
    }
    vecs.join(m, Seq("vec_id"), "left_outer")
      .select(col("vec_id"),
        (lit(tele) + expr(s"$PrDamp * coalesce(m, 0L) div 100")).as("pr_fp"))
      .orderBy("vec_id")
  }

  val knnPagerankOracle: String = {
    val iterCtes = (1 to PrIters).map { k =>
      s"""pr$k AS (
         |  SELECT v.vec_id,
         |         (15 * (SELECT $PrScale // n FROM nn))::BIGINT // 100
         |           + ($PrDamp * COALESCE(inc.m, 0)) // 100 AS s
         |  FROM embeddings v LEFT JOIN (
         |    SELECT e.j AS vec_id, CAST(sum(p.s // d.d) AS BIGINT) AS m
         |    FROM pr${k - 1} p
         |    JOIN deg d ON d.i = p.vec_id
         |    JOIN edges e ON e.i = p.vec_id
         |    GROUP BY e.j) inc USING (vec_id))""".stripMargin
    }.mkString(",\n")
    s"""WITH $bandedCandSql,
       |dir AS (SELECT i, j FROM cand UNION ALL SELECT j AS i, i AS j FROM cand),
       |scored AS (
       |  SELECT d.i AS vec_id, d.j AS neighbor_id,
       |         floor($pairDotSql / (${pairNrmSql("av")} * ${pairNrmSql("bv")}) * 1e6)::BIGINT AS cos_fp
       |  FROM dir d JOIN ev av ON av.vec_id = d.i JOIN ev bv ON bv.vec_id = d.j),
       |r AS (SELECT vec_id, neighbor_id,
       |             row_number() OVER (PARTITION BY vec_id ORDER BY cos_fp DESC, neighbor_id) AS rank
       |      FROM scored),
       |edges AS (SELECT vec_id AS i, neighbor_id AS j FROM r WHERE rank <= $KnnGraphK),
       |deg AS (SELECT i, count(*) AS d FROM edges GROUP BY 1),
       |nn AS (SELECT count(*) AS n FROM embeddings),
       |pr0 AS (SELECT vec_id, (SELECT $PrScale // n FROM nn)::BIGINT AS s FROM embeddings),
       |$iterCtes
       |SELECT vec_id, CAST(s AS BIGINT) AS pr_fp FROM pr$PrIters ORDER BY vec_id""".stripMargin
  }

  /** Banded-vs-brute evaluation: banded pairs are an exact subset of the
    * brute truth (candidates are verified with the same threshold), so
    * precision is 1.0 and the one number that matters is recall. The brute
    * O(n^2) join lives ONLY here, as the eval reference — the operator
    * entries run the banded path. */
  def cosineBandedEval(emb: DataFrame): DataFrame = {
    val t = cosinePairsUnsorted(emb).agg(count(lit(1)).cast("long").as("n_truth"))
    val c = cosinePairsBandedUnsorted(emb, EmbBandBits).agg(count(lit(1)).cast("long").as("n_banded"))
    t.crossJoin(c).select(col("n_truth"), col("n_banded"),
      floor(col("n_banded") * 1e6 / greatest(col("n_truth"), lit(1L)))
        .cast("long").as("recall_fp"))
  }

  val cosineBandedEvalOracle: String = {
    val dot = "list_reduce(list_transform(range(1, 65), d -> a.v[d] * b.v[d]), (x, y) -> x + y)"
    val nrm = (t: String) => s"sqrt(list_reduce(list_transform(range(1, 65), d -> $t.v[d] * $t.v[d]), (x, y) -> x + y))"
    s"""WITH $bandedCandSql,
       |banded AS (
       |  SELECT cand.i, cand.j
       |  FROM cand JOIN ev av ON av.vec_id = cand.i JOIN ev bv ON bv.vec_id = cand.j
       |  WHERE floor($pairDotSql / (${pairNrmSql("av")} * ${pairNrmSql("bv")}) * 1e6) >= $CosineThresholdFp),
       |truth AS (
       |  SELECT a.vec_id AS i, b.vec_id AS j
       |  FROM ev a JOIN ev b ON a.vec_id < b.vec_id
       |  WHERE floor($dot / (${nrm("a")} * ${nrm("b")}) * 1e6) >= $CosineThresholdFp)
       |SELECT (SELECT count(*) FROM truth)::BIGINT AS n_truth,
       |       (SELECT count(*) FROM banded)::BIGINT AS n_banded,
       |       floor((SELECT count(*) FROM banded) * 1e6 /
       |             greatest((SELECT count(*) FROM truth), 1))::BIGINT AS recall_fp""".stripMargin
  }

  /** DuckDB mirror: sequential left-fold sums (list_reduce) match Spark's
    * aggregate() fold bit-for-bit (both accumulate in array order). */
  val cosinePairsOracle: String = {
    val dot = "list_reduce(list_transform(range(1, 65), d -> a.v[d] * b.v[d]), (x, y) -> x + y)"
    val nrm = (t: String) => s"sqrt(list_reduce(list_transform(range(1, 65), d -> $t.v[d] * $t.v[d]), (x, y) -> x + y))"
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
       |SELECT a.vec_id AS i, b.vec_id AS j,
       |       floor($dot / (${nrm("a")} * ${nrm("b")}) * 1e6)::BIGINT AS cos_fp
       |FROM e a JOIN e b ON a.vec_id < b.vec_id
       |WHERE floor($dot / (${nrm("a")} * ${nrm("b")}) * 1e6) >= $CosineThresholdFp
       |ORDER BY i, j""".stripMargin
  }

  /** Semantic-duplicate clusters: connected components over the
    * embedding-cosine near-dup edges — [[propagateClusters]] applied to
    * [[cosinePairsBanded]] exactly as text clustering applies it to
    * [[ngramJaccard]]. Edge generation is the banded-LSH path, so no
    * all-pairs join rides into the clustering at scale.
    * Output (vec_id, cluster_id, n_members). */
  def semanticClusters(emb: DataFrame): DataFrame = {
    val labeled =
      propagateClusters(cosinePairsBandedUnsorted(emb, EmbBandBits).select("i", "j"),
        emb.select("vec_id"))
    withMemberCounts(labeled, "vec_id",
        broadcastCounts = lastPropagationRounds == 0)
      .orderBy("vec_id")
  }

  val semanticClustersOracle: String = {
    s"""WITH RECURSIVE $bandedCandSql,
       |pairs AS (
       |  SELECT cand.i, cand.j
       |  FROM cand JOIN ev av ON av.vec_id = cand.i JOIN ev bv ON bv.vec_id = cand.j
       |  WHERE floor($pairDotSql / (${pairNrmSql("av")} * ${pairNrmSql("bv")}) * 1e6) >= $CosineThresholdFp),
       |e AS (SELECT i AS a, j AS b FROM pairs UNION ALL SELECT j, i FROM pairs),
       |r(vec_id, lab) AS (
       |  SELECT vec_id, vec_id FROM embeddings
       |  UNION
       |  SELECT r.vec_id, e.b FROM r JOIN e ON e.a = r.lab),
       |lbl AS (SELECT vec_id, min(lab) AS cluster_id FROM r GROUP BY vec_id)
       |SELECT vec_id, cluster_id,
       |       count(*) OVER (PARTITION BY cluster_id) AS n_members
       |FROM lbl ORDER BY vec_id""".stripMargin
  }
}
