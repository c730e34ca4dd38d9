package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import TextOps._

/** Content EXTRACTION from raw markup — the step a crawl pipeline runs
  * before any curation operator sees a "document": strip the page
  * chrome (nav, ads, footer) and keep the article text. The published
  * recipe (boilerpipe / Arc90 readability / trafilatura) is
  * block-level link-density filtering: split the page into block
  * elements, and a block whose words are mostly anchor text is
  * boilerplate — navigation and ad units are lists of links, article
  * paragraphs are prose with few links.
  *
  * The fixture is a deterministic HTML PLANT (the codec round-trip
  * discipline of `Multimodal`): each document is wrapped into a page —
  * nav header, its text as `<p>` paragraphs of [[ParaWords]] words, an
  * ad block after the first paragraph for every third doc, and a
  * footer — and the extractor must recover the original text exactly
  * (`recovered` pins hash equality per doc). The plant and the
  * extractor are independent code paths on both engines, so a planted
  * page that round-trips through DuckDB too is evidence the heuristic,
  * not the fixture, does the work.
  *
  * Scale shape: the whole operator is ONE projection — per-row array
  * ops (split, per-block strip/count, filter, rejoin), no shuffle, no
  * join, no aggregation; extraction at 100 TB is embarrassingly
  * parallel and this plan is exactly that. */
object Extract {

  /** Words per planted paragraph block. */
  val ParaWords = 20

  /** Keep a block iff anchors × LinkDensityInv < words — i.e. less
    * than one link per [[LinkDensityInv]] words of block text. */
  val LinkDensityInv = 3

  val Nav = """<div class="nav"><a href="/">home</a> <a href="/about">about</a></div>"""
  val Ad = """<p class="ad"><a href="/s">share</a> <a href="/l">like</a></p>"""
  val Footer = """<div class="footer"><a href="/tos">terms</a> (c) example</div>"""

  /** Wrap each doc's text into the planted page (one string column
    * `html`, blocks newline-separated). Kept separate from
    * [[htmlExtract]] so specs can feed the extractor adversarial pages
    * that the plant never produces. */
  def plantHtml(docs: DataFrame): DataFrame =
    docs
      .withColumn("w", tokens(col("text")))
      .withColumn("paras", expr(
        s"""transform(sequence(0, greatest((size(w) + ${ParaWords - 1}) div $ParaWords, 1) - 1),
           |  i -> concat('<p>', coalesce(array_join(slice(w, i * $ParaWords + 1, $ParaWords), ' '), ''), '</p>'))""".stripMargin))
      .withColumn("html", expr(
        s"""array_join(concat(
           |  array('$Nav'),
           |  slice(paras, 1, 1),
           |  IF(doc_id % 3 = 0, array('$Ad'), slice(paras, 1, 0)),
           |  slice(paras, 2, 2147483647),
           |  array('$Footer')), '\n')""".stripMargin))
      .drop("w", "paras")

  /** The block/strip/density computation, columns `bi` + `kept` added
    * to any (doc_id, html, …) relation — other columns pass through. */
  private def withExtraction(pages: DataFrame): DataFrame =
    pages
      .withColumn("bi", expr(
        """transform(split(html, '\n'), b -> named_struct(
          |  's', trim(regexp_replace(b, '<[^>]*>', ' ')),
          |  'na', (length(b) - length(replace(b, '<a ', ''))) div 3))""".stripMargin))
      .withColumn("bi", expr(
        "transform(bi, x -> named_struct('s', x.s, 'na', x.na, " +
          "'nw', size(filter(split(x.s, ' '), t -> t != ''))))"))
      .withColumn("kept", expr(s"filter(bi, x -> x.na * $LinkDensityInv < x.nw)"))

  /** Core extractor over any (doc_id, html) relation — shared by the
    * batch entry and [[graft.streaming.StreamingExtract]]. Output
    * (doc_id, n_blocks, n_kept, kept_words, extracted_hash), one
    * projection, no shuffle. */
  def extractPages(pages: DataFrame): DataFrame =
    withExtraction(pages)
      .select(col("doc_id"),
        expr("CAST(size(split(html, '\n')) AS BIGINT)").as("n_blocks"),
        expr("CAST(size(kept) AS BIGINT)").as("n_kept"),
        expr("CAST(aggregate(kept, 0, (a, x) -> a + x.nw) AS BIGINT)").as("kept_words"),
        baseHash(expr("array_join(transform(kept, x -> x.s), ' ')")).as("extracted_hash"))

  /** Block-level link-density extraction over the planted pages.
    * Output (doc_id, n_blocks, n_kept, kept_words, extracted_hash,
    * recovered) per doc, ordered — still ONE projection (plantHtml
    * carries `text` through, so the recovery law needs no join). */
  def htmlExtract(docs: DataFrame): DataFrame =
    withExtraction(plantHtml(docs))
      .select(col("doc_id"),
        expr("CAST(size(split(html, '\n')) AS BIGINT)").as("n_blocks"),
        expr("CAST(size(kept) AS BIGINT)").as("n_kept"),
        expr("CAST(aggregate(kept, 0, (a, x) -> a + x.nw) AS BIGINT)").as("kept_words"),
        baseHash(expr("array_join(transform(kept, x -> x.s), ' ')")).as("extracted_hash"),
        (baseHash(expr("array_join(transform(kept, x -> x.s), ' ')")) ===
          baseHash(col("text"))).as("recovered"))
      .orderBy("doc_id")

  val htmlExtractOracle: String =
    s"""WITH d AS (SELECT doc_id, text, $tokensSql AS w FROM documents),
       |p AS (
       |  SELECT doc_id, text,
       |         list_transform(range(0, greatest((len(w) + ${ParaWords - 1}) // $ParaWords, 1)),
       |           i -> '<p>' || coalesce(array_to_string(w[i * $ParaWords + 1 : i * $ParaWords + $ParaWords], ' '), '') || '</p>') AS paras
       |  FROM d),
       |h AS (
       |  SELECT doc_id, text,
       |         list_concat(list_concat(list_concat(list_concat(
       |           ['$Nav'],
       |           paras[1:1]),
       |           CASE WHEN doc_id % 3 = 0 THEN ['$Ad'] ELSE []::VARCHAR[] END),
       |           paras[2:]),
       |           ['$Footer']) AS blocks
       |  FROM p),
       |b AS (
       |  SELECT doc_id, text, blocks,
       |         list_filter(
       |           list_transform(blocks, x -> struct_pack(
       |             s := trim(regexp_replace(x, '<[^>]*>', ' ', 'g')),
       |             na := (length(x) - length(replace(x, '<a ', ''))) // 3,
       |             nw := len(list_filter(string_split(trim(regexp_replace(x, '<[^>]*>', ' ', 'g')), ' '), t -> t != '')))),
       |           x -> x.na * $LinkDensityInv < x.nw) AS kept
       |  FROM h)
       |SELECT doc_id,
       |       len(blocks)::BIGINT AS n_blocks,
       |       len(kept)::BIGINT AS n_kept,
       |       coalesce(list_sum(list_transform(kept, x -> x.nw)), 0)::BIGINT AS kept_words,
       |       ${baseHashSql("coalesce(array_to_string(list_transform(kept, x -> x.s), ' '), '')")} AS extracted_hash,
       |       ${baseHashSql("coalesce(array_to_string(list_transform(kept, x -> x.s), ' '), '')")} = ${baseHashSql("text")} AS recovered
       |FROM b ORDER BY doc_id""".stripMargin
}
