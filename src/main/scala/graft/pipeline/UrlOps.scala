package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + crawl-style dedup — the host/URL half of a
  * curation pipeline (C4/CCNet dedup by canonical URL before any
  * content pass; host-level stats drive crawl budgeting).
  *
  * The documents table carries no URL column, so [[urlsFromDocs]]
  * derives one synthetically from doc metadata (same pattern as
  * `Multimodal.mediaFromDocs`), deliberately cycling through the messy
  * real-world variants canonicalization must collapse: scheme/host
  * case, `www.` prefixes, default `:80`/`:443` ports, trailing
  * slashes, tracking params (`utm_*`, `fbclid`, `gclid`), unsorted
  * query strings, fragments.
  *
  * Everything here is a per-row string projection followed by one hash
  * aggregate — no window, no join, no shuffle beyond the aggregate's —
  * which is the only acceptable shape for the first pass over a 100 TB
  * crawl. */
object UrlOps {

  /** Deterministic synthetic URL per doc. Groups of 4 consecutive
    * doc_ids share one logical page: variants 0–2 collapse to the same
    * canonical URL (a 3-way dup the dedup pass must catch); variant 3
    * carries REAL query params (plus tracking noise and a fragment) and
    * canonicalizes to a distinct URL — the negative case that proves
    * the strip is selective, not "drop all params". */
  def urlsFromDocs(docs: DataFrame): DataFrame = {
    val h = expr("(doc_id div 4) % 50").cast("string")
    val p = expr("doc_id div 200").cast("string")
    val g = expr("doc_id div 4").cast("string")
    val url = when(expr("doc_id % 4") === 0,
        concat(lit("https://site"), h, lit(".example.com/p/"), p))
      .when(expr("doc_id % 4") === 1,
        concat(lit("HTTPS://WWW.SITE"), h, lit(".EXAMPLE.COM/p/"), p, lit("/")))
      .when(expr("doc_id % 4") === 2,
        concat(lit("https://site"), h, lit(".example.com:443/p/"), p,
          lit("?utm_source=feed&utm_campaign=c"), g))
      .otherwise(
        concat(lit("http://www.site"), h, lit(".example.com:80/p/"), p,
          lit("?b=2&a=1&utm_medium=m#sec-"), col("doc_id").cast("string")))
    docs.select(col("doc_id"), url.as("url"))
  }

  /** SQL twin of [[urlsFromDocs]]'s url column (DuckDB). */
  // NOTE: no line here may BEGIN with "||" — these fragments are
  // re-interpolated into templates that run stripMargin again, which
  // would eat the first pipe. Operators trail the line instead.
  private[pipeline] val urlSql: String =
    """CASE doc_id % 4
      |  WHEN 0 THEN 'https://site' || ((doc_id // 4) % 50)::VARCHAR ||
      |              '.example.com/p/' || (doc_id // 200)::VARCHAR
      |  WHEN 1 THEN 'HTTPS://WWW.SITE' || ((doc_id // 4) % 50)::VARCHAR ||
      |              '.EXAMPLE.COM/p/' || (doc_id // 200)::VARCHAR || '/'
      |  WHEN 2 THEN 'https://site' || ((doc_id // 4) % 50)::VARCHAR ||
      |              '.example.com:443/p/' || (doc_id // 200)::VARCHAR ||
      |              '?utm_source=feed&utm_campaign=c' || (doc_id // 4)::VARCHAR
      |  ELSE 'http://www.site' || ((doc_id // 4) % 50)::VARCHAR ||
      |       '.example.com:80/p/' || (doc_id // 200)::VARCHAR ||
      |       '?b=2&a=1&utm_medium=m#sec-' || doc_id::VARCHAR
      |END""".stripMargin

  /** Tracking-parameter pattern (param NAME match, not substring). */
  private val TrackRe = "^(utm_[^=]*|fbclid|gclid)(=|$)"

  /** Canonical host of a URL: lowercased, `www.`-stripped, default
    * ports removed. Empty string when the input has no `scheme://`. */
  def hostOf(url: Column): Column = {
    val raw = lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    regexp_replace(regexp_replace(raw, "^www\\.", ""), ":(80|443)$", "")
  }

  /** Canonical form: `https://` (scheme folded — crawl dedup treats the
    * http/https twins of a page as one), canonical host, path with the
    * trailing slash stripped, surviving query params sorted and
    * rejoined, fragment dropped. Pure codegen'd string expressions —
    * no UDF. */
  def canonicalize(url: Column): Column = {
    val nf = regexp_replace(url, "#.*$", "")
    val path = regexp_replace(
      regexp_extract(nf, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1), "/$", "")
    val q = array_join(array_sort(filter(split(
      regexp_extract(nf, "\\?([^#]*)$", 1), "&"),
      x => x =!= "" && !x.rlike(TrackRe))), "&")
    concat(lit("https://"), hostOf(url), path,
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }

  /** DuckDB twins of [[hostOf]] / [[canonicalize]] over a column u. */
  private def hostSql(u: String) =
    s"""regexp_replace(regexp_replace(
       |  lower(regexp_extract($u, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)),
       |  '^www\\.', ''), ':(80|443)$$', '')""".stripMargin
  private[pipeline] def canonSql(u: String) =
    s"""'https://' || ${hostSql(u)} ||
       |regexp_replace(regexp_extract(regexp_replace($u, '#.*$$', ''),
       |  '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1), '/$$', '') ||
       |CASE WHEN COALESCE(array_to_string(list_sort(list_filter(string_split(
       |       regexp_extract(regexp_replace($u, '#.*$$', ''), '\\?([^#]*)$$', 1), '&'),
       |       x -> x != '' AND NOT regexp_matches(x, '$TrackRe'))), '&'), '') = ''
       |     THEN ''
       |     ELSE '?' || COALESCE(array_to_string(list_sort(list_filter(string_split(
       |       regexp_extract(regexp_replace($u, '#.*$$', ''), '\\?([^#]*)$$', 1), '&'),
       |       x -> x != '' AND NOT regexp_matches(x, '$TrackRe'))), '&'), '')
       |END""".stripMargin

  /** Per-doc canonicalization audit: (doc_id, url, canon_url). Verifies
    * every normalization rule row-exactly. One projection, no shuffle
    * before the presentation sort. */
  def urlCanon(docs: DataFrame): DataFrame =
    urlsFromDocs(docs)
      .select(col("doc_id"), col("url"), canonicalize(col("url")).as("canon_url"))
      .orderBy("doc_id")

  val urlCanonOracle: String =
    s"""WITH u AS (SELECT doc_id, $urlSql AS url FROM documents)
       |SELECT doc_id, url, ${canonSql("url")} AS canon_url
       |FROM u ORDER BY doc_id""".stripMargin

  /** URL-level dedup: one hash aggregate on the canonical URL. Keeps
    * the smallest doc_id (first-crawled wins — the standard crawl
    * policy) and reports the GROUP size (keeper included — `n_docs`,
    * not a duplicate count); a 100 TB run broadcast-joins the keeper
    * set back against the corpus, so the per-doc keep flag is
    * deliberately NOT computed here (that join is the consumer's
    * choice, not the operator's). Output (canon_url, keep_doc_id,
    * n_docs). */
  def urlDedup(docs: DataFrame): DataFrame =
    urlsFromDocs(docs)
      .select(canonicalize(col("url")).as("canon_url"), col("doc_id"))
      .groupBy("canon_url")
      .agg(min("doc_id").as("keep_doc_id"), count(lit(1)).as("n_docs"))
      .orderBy("canon_url")

  val urlDedupOracle: String =
    s"""WITH u AS (SELECT doc_id, $urlSql AS url FROM documents),
       |c AS (SELECT doc_id, ${canonSql("url")} AS canon_url FROM u)
       |SELECT canon_url, min(doc_id) AS keep_doc_id, count(*)::BIGINT AS n_docs
       |FROM c GROUP BY canon_url ORDER BY canon_url""".stripMargin

  /** Host-level aggregation (crawl budgeting / per-host caps): docs and
    * distinct canonical pages per canonical host. The distinct count is
    * Spark's two-phase partial-distinct aggregate — no extra pass.
    * Output (host, n_docs, n_pages). */
  def hostStats(docs: DataFrame): DataFrame =
    urlsFromDocs(docs)
      .select(hostOf(col("url")).as("host"), canonicalize(col("url")).as("canon_url"))
      .groupBy("host")
      .agg(count(lit(1)).as("n_docs"), countDistinct("canon_url").as("n_pages"))
      .orderBy("host")

  val hostStatsOracle: String =
    s"""WITH u AS (SELECT doc_id, $urlSql AS url FROM documents),
       |c AS (SELECT ${hostSql("url")} AS host, ${canonSql("url")} AS canon_url FROM u)
       |SELECT host, count(*)::BIGINT AS n_docs,
       |       count(DISTINCT canon_url)::BIGINT AS n_pages
       |FROM c GROUP BY host ORDER BY host""".stripMargin

  /** Per-host quality rollup → crawl budget shares (the CCNet-style
    * domain statistics a crawler's scheduler consumes): each host's
    * docs are scored by the fixed-weight quality classifier, clamped at
    * zero (a host full of junk earns no budget, not negative budget),
    * and the host's budget share is its clamped score mass in ppm of
    * the corpus total. One projection + one hash aggregate + a 1-row
    * broadcast total — no window, no join against anything corpus-sized.
    * Output (host, n_docs, mean_score_fp, budget_ppm). */
  def hostQualityBudget(docs: DataFrame): DataFrame = {
    val scored = TextOps.qualityClassifier(docs)
      .select(col("doc_id"), greatest(col("score_fp"), lit(0L)).as("s"))
    val hosts = urlsFromDocs(docs)
      .select(col("doc_id"), hostOf(col("url")).as("host"))
    val per = hosts.join(scored, Seq("doc_id"))
      .groupBy("host")
      .agg(count(lit(1)).as("n_docs"), sum("s").as("smass"))
    val tot = per.agg(sum("smass").as("stot"))
    // budget share without int64 overflow: smass*1e6 only overflows when
    // smass > Long.Max/1e6 ≈ 9.2e12 (at 100 TB smass ~5.5e3/doc × ~1e10
    // docs/host ≈ 5.5e13 crosses it; DuckDB would silently promote to
    // HUGEINT — engines diverge exactly at scale). Branch on the ACTUAL
    // overflow bound, not on stot (the round-7 advice fix: the old
    // stot≥1e6 switch truncated the divisor and inflated ppm by up to
    // 1/(stot div 1e6) — ~10% at stot~1e7): the exact product is used
    // whenever it fits, and only beyond ~9.2e12 does the pre-scaled
    // divisor take over, where stot ≥ smass > 9.2e12 makes its relative
    // error ≤ 1e6/stot < 1.1e-7. Oracle mirrors the same rule bit-for-bit.
    per.crossJoin(broadcast(tot))
      .select(col("host"), col("n_docs"),
        expr("smass div n_docs").as("mean_score_fp"),
        expr("""CASE WHEN stot <= 0 THEN 0
                     WHEN smass <= 9223372036854 THEN smass * 1000000 div stot
                     ELSE smass div (stot div 1000000) END""").as("budget_ppm"))
      .orderBy("host")
  }

  // lazy: TextOps.qualityClassifierOracle is an object val that may not
  // be initialized yet when UrlOps loads (cross-object init order)
  lazy val hostQualityBudgetOracle: String = {
    val inList = graft.pipeline.TextOps.Stopwords.map(s => s"'$s'").mkString(", ")
    s"""WITH q AS (
       |  SELECT doc_id,
       |         len(string_split(text, ' ')) AS n_tokens,
       |         len(list_distinct(string_split(text, ' '))) AS n_distinct,
       |         len(list_filter(string_split(text, ' '), x -> x IN ($inList))) AS en_hits,
       |         length(replace(text, ' ', '')) AS sum_wl
       |  FROM documents),
       |f AS (SELECT doc_id,
       |             n_distinct * 1000 // n_tokens AS ttr_pm,
       |             en_hits * 1000 // n_tokens AS stop_pm,
       |             sum_wl * 100 // n_tokens AS mwl_c,
       |             CASE WHEN n_tokens BETWEEN 20 AND 800
       |                  THEN 1::BIGINT ELSE 0::BIGINT END AS len_ok
       |      FROM q),
       |sc AS (SELECT doc_id,
       |              GREATEST(ttr_pm * 2 + stop_pm * 3 + len_ok * 500
       |                - abs(mwl_c - 450), 0::BIGINT) AS s
       |       FROM f),
       |u AS (SELECT doc_id, $urlSql AS url FROM documents),
       |h AS (SELECT doc_id, ${hostSql("url")} AS host FROM u),
       |per AS (SELECT host, count(*)::BIGINT AS n_docs, sum(sc.s) AS smass
       |        FROM h JOIN sc USING (doc_id) GROUP BY host),
       |tot AS (SELECT sum(smass) AS stot FROM per)
       |SELECT host, n_docs, CAST(smass // n_docs AS BIGINT) AS mean_score_fp,
       |       CAST(CASE WHEN stot <= 0 THEN 0
       |                 WHEN smass <= 9223372036854 THEN smass * 1000000 // stot
       |                 ELSE smass // (stot // 1000000) END AS BIGINT) AS budget_ppm
       |FROM per, tot ORDER BY host""".stripMargin
  }
}
