package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the training-data pipeline operators
  * (SURVEY.md extension phase; reference has no text ops — these are the
  * LLM-data-pipeline additions over the `documents` table).
  *
  * Every operator here is defined TWICE, side by side: once as a Spark
  * `Column`/`DataFrame` expression and once as the equivalent DuckDB SQL
  * (the driver's oracle). Keeping both in one file, generated from the
  * same constants, is what keeps them from drifting.
  *
  * Cross-engine determinism:
  *  - hash base = first 15 hex chars of md5 (60 bits, fits a signed
  *    long; md5 is bit-identical in Spark and DuckDB);
  *  - all scores are integer fixed-point (floor), never raw doubles;
  *  - token = single-space split, matching the generator's format.
  *
  * Scale notes (100 TB): everything here is a narrow per-row projection
  * (no shuffle) except the per-doc aggregates, which are map-side
  * partial-aggregated by Catalyst. All expressions are built-in
  * functions → whole-stage codegen, no UDFs.
  */
object TextOps {

  /** 2^31-1, the Mersenne prime used as the MinHash permutation modulus. */
  val P: Long = 2147483647L

  // ---- tokens & shingles ------------------------------------------------

  /** Whitespace tokens. Spark `split` is regex-based; a single-space
    * pattern matches DuckDB's literal `string_split(text, ' ')`. */
  def tokens(text: Column): Column = split(text, " ")

  val tokensSql = "string_split(text, ' ')"

  /** Word k-shingles (k=3): "w1 w2 w3" strings. Empty array when the doc
    * has fewer than k tokens (guard: Spark's sequence(1,0) would produce
    * a DESCENDING range, not an empty one). */
  def shingles(w: Column): Column =
    when(size(w) >= 3,
      transform(sequence(lit(1), size(w) - 2),
        i => concat_ws(" ", element_at(w, i), element_at(w, i + 1), element_at(w, i + 2))))
      .otherwise(array().cast("array<string>"))

  /** DuckDB twin of [[shingles]] over a list-of-words expression `w`. */
  def shinglesSql(w: String): String =
    s"list_transform(range(1, len($w) - 1), i -> $w[i] || ' ' || $w[i+1] || ' ' || $w[i+2])"

  // ---- cross-engine hash ------------------------------------------------

  /** 60-bit deterministic string hash: first 15 hex chars of md5.
    * Identical in Spark (`conv`) and DuckDB (`'0x…'::BIGINT`). */
  def baseHash(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  def baseHashSql(s: String): String =
    s"(('0x' || substr(md5($s), 1, 15))::BIGINT)"

  // ---- operator: token counting ----------------------------------------

  /** Whitespace token count + BPE-ish subtoken count (runs of [a-z0-9]).
    * Output: (doc_id, n_tokens, n_subtokens, n_chars). */
  def tokenStats(docs: DataFrame): DataFrame = {
    val w = tokens(col("text"))
    docs.select(
      col("doc_id"),
      size(w).cast("long").as("n_tokens"),
      size(regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0))).cast("long").as("n_subtokens"),
      length(col("text")).cast("long").as("n_chars"))
      .orderBy("doc_id")
  }

  val tokenStatsOracle: String =
    s"""SELECT doc_id,
       |       len($tokensSql) AS n_tokens,
       |       len(regexp_extract_all(text, '[a-z0-9]+')) AS n_subtokens,
       |       length(text) AS n_chars
       |FROM documents ORDER BY doc_id""".stripMargin

  // ---- operator: quality scoring ---------------------------------------

  /** Heuristic quality score from length, type-token ratio and
    * punctuation density; all integer fixed-point.
    * quality_fp = 1000*distinct/total (TTR) + 200 if 30<=n<=500 - 50*punct. */
  def qualityScore(docs: DataFrame): DataFrame = {
    val w = tokens(col("text"))
    docs.select(col("doc_id"), w.as("w"),
        size(regexp_extract_all(col("text"), lit("[^a-z0-9 ]"), lit(0))).cast("long").as("n_punct"))
      .select(
        col("doc_id"),
        size(col("w")).cast("long").as("n_tokens"),
        size(array_distinct(col("w"))).cast("long").as("n_distinct"),
        col("n_punct"))
      .withColumn("quality_fp",
        expr("n_distinct * 1000 div n_tokens") +
          when(col("n_tokens").between(30, 500), 200L).otherwise(0L) -
          col("n_punct") * 50L)
      .orderBy("doc_id")
  }

  val qualityScoreOracle: String =
    s"""WITH q AS (
       |  SELECT doc_id,
       |         len($tokensSql) AS n_tokens,
       |         len(list_distinct($tokensSql)) AS n_distinct,
       |         len(regexp_extract_all(text, '[^a-z0-9 ]')) AS n_punct
       |  FROM documents)
       |SELECT doc_id, n_tokens, n_distinct, n_punct,
       |       (n_distinct * 1000 // n_tokens)
       |         + (CASE WHEN n_tokens BETWEEN 30 AND 500 THEN 200 ELSE 0 END)
       |         - n_punct * 50 AS quality_fp
       |FROM q ORDER BY doc_id""".stripMargin

  // ---- operator: language ID (stopword-ratio heuristic) -----------------

  /** English function words; hit-ratio >= 4% → 'en'. A real system would
    * use char-n-gram profiles per language; the *shape* (per-row narrow
    * projection, no shuffle) is identical. */
  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "to", "in", "and", "is", "on", "for", "it")

  def langId(docs: DataFrame): DataFrame = {
    val w = tokens(col("text"))
    val isStop = (x: Column) => Stopwords.map(x === _).reduce(_ || _)
    docs.select(
        col("doc_id"),
        size(w).cast("long").as("n_tokens"),
        size(filter(w, isStop)).cast("long").as("en_hits"))
      .withColumn("pred_lang",
        when(col("en_hits") * 100 >= col("n_tokens") * 4, "en").otherwise("unk"))
      .orderBy("doc_id")
  }

  val langIdOracle: String = {
    val inList = Stopwords.map(s => s"'$s'").mkString(", ")
    s"""SELECT doc_id,
       |       len($tokensSql) AS n_tokens,
       |       len(list_filter($tokensSql, x -> x IN ($inList))) AS en_hits,
       |       CASE WHEN len(list_filter($tokensSql, x -> x IN ($inList))) * 100
       |                 >= len($tokensSql) * 4
       |            THEN 'en' ELSE 'unk' END AS pred_lang
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // ---- operator: vocabulary building ------------------------------------

  /** Corpus vocabulary with term frequency + document frequency — the
    * precursor to tokenizer/BPE training. One explode + one groupBy
    * (map-side combined); vocabulary is bounded by distinct-token count,
    * not corpus size. Output (token, tf, df) ordered by tf desc. */
  def vocabulary(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("tf"), countDistinct("doc_id").as("df"))
      .orderBy(col("tf").desc, col("token"))

  val vocabularyOracle: String =
    s"""SELECT u.token, count(*) AS tf, count(DISTINCT doc_id) AS df
       |FROM (SELECT doc_id, $tokensSql AS w FROM documents) d, unnest(d.w) u(token)
       |GROUP BY u.token ORDER BY tf DESC, token""".stripMargin

  // ---- operator: document fingerprinting --------------------------------

  /** Rolling-shingle fingerprint: min shingle hash (MinHash with one
    * permutation) + mod-p sampled shingle count (winnowing-style sketch).
    * Output: (doc_id, fp_min, n_sampled). */
  def fingerprint(docs: DataFrame): DataFrame = {
    val hs = transform(shingles(tokens(col("text"))), s => baseHash(s))
    docs.select(
        col("doc_id"),
        array_min(hs).as("fp_min"),
        size(filter(hs, h => h % 16 === 0)).cast("long").as("n_sampled"))
      .orderBy("doc_id")
  }

  val fingerprintOracle: String = {
    val hs = s"list_transform(${shinglesSql(tokensSql)}, s -> ${baseHashSql("s")})"
    s"""SELECT doc_id,
       |       list_min($hs) AS fp_min,
       |       len(list_filter($hs, h -> h % 16 = 0)) AS n_sampled
       |FROM documents ORDER BY doc_id""".stripMargin
  }
}
