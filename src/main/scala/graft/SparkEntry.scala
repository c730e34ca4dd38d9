package graft

import graft.ingest.Ingest
import graft.pipeline.{Dedup, EvalSampling, EventOps, Extract, LayoutOps, Multimodal, Privacy, Similarity, Sketches, SuffixOps, TextOps, UrlOps}
import graft.query.{InfluxQlParser, Planner, TsCatalog}
import graft.sources.EventsAdapter
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Conventions for every (queries, oracleSql) pair:
  *  - column names identical on both sides (driver sorts columns by name);
  *  - a total ORDER BY on both sides so row order is deterministic;
  *  - order-dependent float aggregates (sum/avg of doubles) are emitted as
  *    fixed-point BIGINT via floor(x*100) — IEEE-identical in Spark and
  *    DuckDB, immune to summation-order ulp drift and to engine-specific
  *    round() semantics. Exact aggregates (count/min/max) keep natural types.
  */
object SparkEntry {

  /** Fixed "now" so relative time queries are deterministic & oracle-able. */
  val NowMs = 1735689600000L // 2025-01-01T00:00:00Z
  /** [2024-01-01, 2025-01-01] in ns — covers the whole events table. */
  val FromNs = 1704067200000000000L
  val ToNs = 1735689600000000000L

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
  private def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** Shared-artifact builders — trained structures consumed by MULTIPLE
    * entries in one run (the ANN method top-Ks both eval reports read,
    * the full-corpus IVF clustering behind ivf/ivfpq/semdedup, the BPE
    * merge table behind every bpe-family entry). Bench times each ONCE
    * in its shared_build phase so the training cost is counted exactly
    * once and entries then measure steady-state plan cost; Verify needs
    * no special handling (the first consuming entry builds lazily
    * through the same memo). */
  val sharedBuilds: Seq[(String, (SparkSession, String) => Unit)] = Seq(
    "shared_bpe_train" ->
      ((s, dir) => { TextOps.bpeTrain(docs(s, dir)).count(); () }),
    // the tokenizer trained ON the curated train split (doc_train_manifest);
    // shares docWords' single tokenize pass with shared_bpe_train (Memo is
    // single-flight, so whichever build arrives first tokenizes for both)
    "shared_tokenizer_curated" ->
      ((s, dir) => { TextOps.bpeTrainCurated(docs(s, dir)).count(); () }),
    // the unigram-LM EM loop (doc_unigram_train/_encode share its memo)
    "shared_unigram_train" ->
      ((s, dir) => { TextOps.unigramTrain(docs(s, dir)).count(); () }),
    // the WordPiece likelihood-merge loop (doc_wordpiece_train/_encode)
    "shared_wordpiece_train" ->
      ((s, dir) => { TextOps.wordpieceTrain(docs(s, dir)).count(); () }),
    "shared_ivf_cluster" ->
      ((s, dir) => Similarity.buildIvfIndex(emb(s, dir))),
    // the full-corpus PQ / IVF-PQ trained structures (r12): codebooks +
    // corpus codes built once; ann_pq_topk / ann_ivfpq_topk then measure
    // steady-state query cost (the index-build/search split a production
    // ANN deployment has). ivfpq reuses the memoized shared_ivf_cluster.
    "shared_pq_codes" ->
      ((s, dir) => Similarity.buildPqIndex(emb(s, dir))),
    "shared_ivfpq_codes" ->
      ((s, dir) => Similarity.buildIvfpqIndex(emb(s, dir))),
    "shared_ann_eval_topks" ->
      ((s, dir) => Similarity.methodTopKs(EvalSampling(emb(s, dir), "vec_id"))
        .foreach(_._2.count())),
    // FULL-corpus kNN edge list (emb_knn_graph / emb_knn_triangles /
    // emb_pagerank / ann_graph_topk all consume it) — without this the
    // first consumer pays the band join on run 1 and min-of-2 erases the
    // build from the total (round-7 advice item)
    "shared_knn_graph" ->
      ((s, dir) => { Dedup.knnGraph(emb(s, dir)).count(); () }),
    // the PCA eigen builds (gram collect + integer iterations) feed
    // emb_pca_power/_project (top-1) and emb_pca_map (deflated top-2) —
    // same accounting contract
    "shared_pca_eigen" ->
      ((s, dir) => { Similarity.pcaEigen(emb(s, dir))
        Similarity.pcaEigenPair(emb(s, dir)); () }),
    // the RAW-corpus suffix levels (doc_suffix_ranks is a projection of
    // this build since the round-11 engine unification; suffixLevelRows
    // memoizes, so without this builder min-of-2 would erase its cost)
    "shared_suffix_levels" ->
      ((s, dir) => { SuffixOps.suffixRankRows(docs(s, dir)).count(); () }),
    // the SA depth relation (all-level ranks + adjacent-rank LCP descent)
    // feeds doc_sa_lcp, doc_sa_dup_extents, doc_sa_remove_spans AND the
    // re-based doc_dup_spans_var/_removed (round-10 verdict item 2)
    "shared_sa_depth" ->
      ((s, dir) => { SuffixOps.saDepthRows(
        Dedup.plantSpans(docs(s, dir))).count(); () }),
    // the cap-64 build behind doc_sa_extents_t50 — two more doublings
    // lift the engine to the published >=50-token threshold class
    "shared_sa_depth64" ->
      ((s, dir) => { SuffixOps.saDepthRows(
        Dedup.plantSpans(docs(s, dir)), cap = 64).count(); () }),
    // the exact-Jaccard near-dup pair relation (r11): six entries
    // consume it (ngram_jaccard, clusters, keep_best, cc_star,
    // corpus_report, lsh_sweep's truth side) — built and accounted once
    "shared_jaccard_pairs" ->
      ((s, dir) => { Dedup.jaccardPairs(docs(s, dir)).count(); () }),
    // the MinHash signature + banded-candidate triple (r11): consumed by
    // minhash_lsh, minhash_est_eval, lsh_sweep
    "shared_minhash_sig" ->
      ((s, dir) => { Dedup.minhashParts(docs(s, dir))._3.count(); () }))

  private def influx(spark: SparkSession, sfDir: String, q: String): DataFrame =
    influxCat(spark, EventsAdapter.catalog(spark, sfDir), q)

  private def influxCat(spark: SparkSession, cat: TsCatalog, q: String): DataFrame = {
    val stmt = InfluxQlParser.parse(q).fold(e => sys.error(s"parse: $e"), identity)
    Planner.plan(spark, stmt, cat, NowMs)
  }

  /** Catalog built through the REAL ingest path: events rendered as line
    * protocol, parsed, fingerprinted, type-split (SURVEY §3.1) — so the
    * SELECT entries over it verify ingest∘query end-to-end. */
  /** Ingest-once memo: several entries query the line-protocol-ingested
    * catalog; a deployment ingests once and queries many times (the
    * reference's model too — writes land in ClickHouse once), so the
    * parse/fingerprint/type-split runs once per (JVM, sf dir) and every
    * ingested-path SELECT reuses the materialized relations. The ingest
    * path's own cost stays measured by `ingest_lp_roundtrip`. */
  private val ingestedCatCache =
    scala.collection.concurrent.TrieMap.empty[String, TsCatalog]

  private def ingestedCatalog(s: SparkSession, dir: String): TsCatalog =
    ingestedCatCache.getOrElseUpdate(dir, {
      import s.implicits._
      val lines = EventsAdapter.asLineProtocol(EventsAdapter.events(s, dir)).as[String]
      val batch = Ingest.fromLines(lines, nowMs = NowMs)
      // materialize the parse once — the SELECT plan references samples and
      // the series side per metric, which would otherwise re-run the
      // render+parse lineage up to 4x per statement
      TsCatalog(Seq("graft"),
        Map(EventsAdapter.Measurement -> batch.samples.localCheckpoint(true)),
        batch.series.localCheckpoint(true))
    })

  /** Planner SELECT output → hash-stable shape (fixed-point value + total order). */
  private def stable(df: DataFrame): DataFrame =
    df.withColumn("value", floor(col("value") * 100).cast("long"))
      .orderBy("time_ms", "name", "labelname", "labelvalue", "message", "value")

  /** [[stable]] with the honored ORDER BY time DESC preserved (the oracle
    * row order must match: the checker compares rows as-written). */
  private def stableDesc(df: DataFrame): DataFrame =
    df.withColumn("value", floor(col("value") * 100).cast("long"))
      .orderBy(col("time_ms").desc, col("name"), col("labelname"),
        col("labelvalue"), col("message"), col("value"))

  /** Single-series (both tags pinned) query — total inner order. */
  private def tagFilterQuery(bucket: String): String =
    s"""SELECT mean("value") FROM "events" WHERE time > $FromNs AND time < $ToNs""" +
      s""" AND "event_type" = 'click' AND "user_id" = '7' GROUP BY time($bucket)"""

  private def tsSelect(agg: String, bucket: String)(s: SparkSession, dir: String): DataFrame =
    stable(influx(s, dir,
      s"""SELECT $agg("value") FROM "events" WHERE time > $FromNs AND time < $ToNs GROUP BY time($bucket)"""))

  /** Oracle for tsSelect: same pipeline in DuckDB SQL — per-series groups,
    * exploded per label pair (the reference's ARRAY JOIN output shape). */
  private def tsSelectOracle(aggSql: String, bucketMs: Long,
                             fromMs: Long = FromNs / 1000000L + 1,
                             toMs: Long = ToNs / 1000000L - 1,
                             extraWhere: String = ""): String =
    s"""WITH g AS (
       |  SELECT (epoch_ms(ts) // $bucketMs) * $bucketMs AS time_ms,
       |         event_type, CAST(user_id AS VARCHAR) AS user_id,
       |         CAST(floor(($aggSql) * 100) AS BIGINT) AS value
       |  FROM events
       |  WHERE epoch_ms(ts) >= $fromMs AND epoch_ms(ts) <= $toMs $extraWhere
       |  GROUP BY 1, 2, 3)
       |SELECT time_ms, 'value' AS name, value, 'event_type' AS labelname,
       |       event_type AS labelvalue, '' AS message FROM g
       |UNION ALL
       |SELECT time_ms, 'value' AS name, value, 'user_id' AS labelname,
       |       user_id AS labelvalue, '' AS message FROM g
       |ORDER BY time_ms, name, labelname, labelvalue, message, value""".stripMargin

  /** Oracle for the tag-filtered single-series SELECTs (mean, bucketed).
    * The inner sort is total (one series → per-bucket rows distinct by
    * labelname), so an inner LIMIT is deterministic on both engines. */
  private def tagFilterOracle(bucketMs: Long, limit: Option[Int],
                              offset: Option[Int] = None): String = {
    val inner =
      s"""WITH g AS (
         |  SELECT (epoch_ms(ts) // $bucketMs) * $bucketMs AS time_ms,
         |         event_type, CAST(user_id AS VARCHAR) AS user_id,
         |         CAST(floor(avg(value) * 100) AS BIGINT) AS value
         |  FROM events
         |  WHERE epoch_ms(ts) >= ${FromNs / 1000000L + 1} AND epoch_ms(ts) <= ${ToNs / 1000000L - 1}
         |    AND event_type = 'click' AND user_id = 7
         |  GROUP BY 1, 2, 3),
         |u AS (
         |  SELECT time_ms, 'value' AS name, value, 'event_type' AS labelname,
         |         event_type AS labelvalue, '' AS message FROM g
         |  UNION ALL
         |  SELECT time_ms, 'value' AS name, value, 'user_id' AS labelname,
         |         user_id AS labelvalue, '' AS message FROM g)""".stripMargin
    limit match {
      case None =>
        s"""$inner
           |SELECT * FROM u
           |ORDER BY time_ms, name, labelname, labelvalue, message, value""".stripMargin
      case Some(n) =>
        val off = offset.map(o => s" OFFSET $o").getOrElse("")
        s"""$inner,
           |l AS (SELECT * FROM u ORDER BY time_ms, name, labelname, labelvalue, message LIMIT $n$off)
           |SELECT * FROM l
           |ORDER BY time_ms, name, labelname, labelvalue, message, value""".stripMargin
    }
  }

  /** Oracle for top/bottom selectors over the click/user-7 series: N
    * extreme points per bucket, ties broken by earlier timestamp, emitted
    * at the point's own timestamp. */
  private def selectorOracle(bucketMs: Long, n: Int, dir: String): String =
    s"""WITH p AS (
       |  SELECT epoch_ms(ts) AS time_ms, epoch_ms(ts) // $bucketMs AS b, value,
       |         event_type, CAST(user_id AS VARCHAR) AS user_id
       |  FROM events
       |  WHERE epoch_ms(ts) >= ${FromNs / 1000000L + 1} AND epoch_ms(ts) <= ${ToNs / 1000000L - 1}
       |    AND event_type = 'click' AND user_id = 7),
       |r AS (SELECT *, row_number() OVER (PARTITION BY b ORDER BY value $dir, time_ms ASC) AS rn
       |      FROM p),
       |f AS (SELECT time_ms, CAST(floor(value * 100) AS BIGINT) AS value FROM r WHERE rn <= $n)
       |SELECT time_ms, 'value' AS name, value, 'event_type' AS labelname,
       |       'click' AS labelvalue, '' AS message FROM f
       |UNION ALL
       |SELECT time_ms, 'value' AS name, value, 'user_id' AS labelname,
       |       '7' AS labelvalue, '' AS message FROM f
       |ORDER BY time_ms, name, labelname, labelvalue, message, value""".stripMargin

  /** Oracle for the raw (non-aggregated) SELECT: every click/user-7 sample
    * at its own timestamp, exploded per label pair. */
  private def rawSelectOracle: String =
    s"""WITH g AS (
       |  SELECT epoch_ms(ts) AS time_ms, event_type, CAST(user_id AS VARCHAR) AS user_id,
       |         CAST(floor(value * 100) AS BIGINT) AS value
       |  FROM events
       |  WHERE epoch_ms(ts) >= ${FromNs / 1000000L + 1} AND epoch_ms(ts) <= ${ToNs / 1000000L - 1}
       |    AND event_type = 'click' AND user_id = 7)
       |SELECT time_ms, 'value' AS name, value, 'event_type' AS labelname,
       |       event_type AS labelvalue, '' AS message FROM g
       |UNION ALL
       |SELECT time_ms, 'value' AS name, value, 'user_id' AS labelname,
       |       user_id AS labelvalue, '' AS message FROM g
       |ORDER BY time_ms, name, labelname, labelvalue, message, value""".stripMargin

  /** Oracle for SLIMIT/SOFFSET: series = distinct (name, labelname,
    * labelvalue) in sorted order; dense_rank pages them like the planner's
    * paged semi-join. */
  private def slimitOracle(bucketMs: Long, slimit: Int, soffset: Int): String =
    s"""WITH g AS (
       |  SELECT (epoch_ms(ts) // $bucketMs) * $bucketMs AS time_ms,
       |         event_type, CAST(user_id AS VARCHAR) AS user_id,
       |         CAST(floor(avg(value) * 100) AS BIGINT) AS value
       |  FROM events
       |  WHERE epoch_ms(ts) >= ${FromNs / 1000000L + 1} AND epoch_ms(ts) <= ${ToNs / 1000000L - 1}
       |  GROUP BY 1, 2, 3),
       |u AS (
       |  SELECT time_ms, 'value' AS name, value, 'event_type' AS labelname,
       |         event_type AS labelvalue, '' AS message FROM g
       |  UNION ALL
       |  SELECT time_ms, 'value' AS name, value, 'user_id' AS labelname,
       |         user_id AS labelvalue, '' AS message FROM g),
       |r AS (SELECT u.*, dense_rank() OVER (ORDER BY name, labelname, labelvalue) AS sr FROM u)
       |SELECT time_ms, name, value, labelname, labelvalue, message FROM r
       |WHERE sr > $soffset AND sr <= $soffset + $slimit
       |ORDER BY time_ms, name, labelname, labelvalue, message, value""".stripMargin

  /** Oracle for the TICK window transforms over the single-series 1h-mean
    * stream: `winExpr` computes the transformed value from per-bucket raw
    * means inside a window over time; NULL rows are dropped (difference/
    * derivative drop the first row; moving average keeps all). */
  private def tickOracle(bucketMs: Long, winSetup: String, winExpr: String): String =
    s"""WITH g AS (
       |  SELECT (epoch_ms(ts) // $bucketMs) * $bucketMs AS time_ms, avg(value) AS raw
       |  FROM events
       |  WHERE epoch_ms(ts) >= ${FromNs / 1000000L + 1} AND epoch_ms(ts) <= ${ToNs / 1000000L - 1}
       |    AND event_type = 'click' AND user_id = 7
       |  GROUP BY 1),
       |d AS (SELECT time_ms, $winSetup FROM g),
       |f AS (SELECT time_ms, CAST(floor(($winExpr) * 100) AS BIGINT) AS value
       |      FROM d WHERE ($winExpr) IS NOT NULL)
       |SELECT time_ms, 'value' AS name, value, 'event_type' AS labelname,
       |       'click' AS labelvalue, '' AS message FROM f
       |UNION ALL
       |SELECT time_ms, 'value' AS name, value, 'user_id' AS labelname,
       |       '7' AS labelvalue, '' AS message FROM f
       |ORDER BY time_ms, name, labelname, labelvalue, message, value""".stripMargin

  /** Oracle for the state-run entries (Flux stateCount/stateDuration over
    * the single-series hourly means): gaps-and-islands via change-count
    * island ids, `valueExpr` computed per in-state row over `grp`. */
  private def stateOracle(valueExpr: String): String =
    s"""WITH g AS (
       |  SELECT (epoch_ms(ts) // 3600000) * 3600000 AS time_ms, avg(value) AS raw
       |  FROM events
       |  WHERE epoch_ms(ts) >= ${FromNs / 1000000L + 1} AND epoch_ms(ts) <= ${ToNs / 1000000L - 1}
       |    AND event_type = 'click' AND user_id = 7
       |  GROUP BY 1),
       |c AS (SELECT time_ms, (raw > 25.0) AS ins,
       |             CASE WHEN lag(raw > 25.0) OVER (ORDER BY time_ms) IS NULL
       |                    OR (raw > 25.0) <> lag(raw > 25.0) OVER (ORDER BY time_ms)
       |                  THEN 1 ELSE 0 END AS chg
       |      FROM g),
       |i AS (SELECT time_ms, ins, sum(chg) OVER (ORDER BY time_ms) AS grp FROM c),
       |f AS (SELECT time_ms, $valueExpr AS value FROM i WHERE ins)
       |SELECT time_ms, 'value' AS name, value, 'event_type' AS labelname,
       |       'click' AS labelvalue, '' AS message FROM f
       |UNION ALL
       |SELECT time_ms, 'value' AS name, value, 'user_id' AS labelname,
       |       '7' AS labelvalue, '' AS message FROM f
       |ORDER BY time_ms, name, labelname, labelvalue, message, value""".stripMargin

  /** Oracle for the FILL entries: bucket spine ⟕ per-bucket means, gaps
    * filled per mode; single series → two identical label-pair streams. */
  private def fillOracle(bucketMs: Long, mode: String): String = {
    val fromB = Math.floorDiv(FromNs / 1000000L + 1, bucketMs) * bucketMs
    val toB = Math.floorDiv(ToNs / 1000000L - 1, bucketMs) * bucketMs
    val fillExpr = mode match {
      case "0" => "coalesce(j.raw, 0)"
      case n if n.matches("-?[0-9.]+") => s"coalesce(j.raw, $n)"
      case "previous" =>
        "coalesce(last_value(j.raw IGNORE NULLS) OVER " +
          "(ORDER BY j.time_ms ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1)"
      case "linear" =>
        // same neighbor windows + interpolation expression as the planner
        // (identical op order keeps the doubles bit-equal)
        """coalesce(CASE WHEN j.raw IS NOT NULL THEN j.raw
          |  WHEN pv IS NOT NULL AND nv IS NOT NULL
          |    THEN pv + (nv - pv) * ((j.time_ms - pt) / (nt - pt))
          |  END, -1)""".stripMargin
    }
    val linearWins = if (mode != "linear") "" else
      """,
        |  last_value(j.raw IGNORE NULLS) OVER wp AS pv,
        |  last_value(CASE WHEN j.raw IS NOT NULL THEN j.time_ms END IGNORE NULLS) OVER wp AS pt,
        |  first_value(j.raw IGNORE NULLS) OVER wn AS nv,
        |  first_value(CASE WHEN j.raw IS NOT NULL THEN j.time_ms END IGNORE NULLS) OVER wn AS nt""".stripMargin
    val linearWindowDefs = if (mode != "linear") "" else
      """
        |      WINDOW wp AS (ORDER BY j.time_ms ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |             wn AS (ORDER BY j.time_ms ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)""".stripMargin
    s"""WITH g AS (
       |  SELECT (epoch_ms(ts) // $bucketMs) * $bucketMs AS time_ms, avg(value) AS raw
       |  FROM events
       |  WHERE epoch_ms(ts) >= ${FromNs / 1000000L + 1} AND epoch_ms(ts) <= ${ToNs / 1000000L - 1}
       |    AND event_type = 'click' AND user_id = 7
       |  GROUP BY 1),
       |j0 AS (SELECT s.time_ms, g.raw
       |      FROM generate_series($fromB, $toB, $bucketMs) s(time_ms)
       |      LEFT JOIN g ON g.time_ms = s.time_ms),
       |j2 AS (SELECT j.time_ms, j.raw$linearWins FROM j0 j$linearWindowDefs),
       |f AS (SELECT j.time_ms, CAST(floor(($fillExpr) * 100) AS BIGINT) AS value FROM j2 j
       |      WHERE EXISTS (SELECT 1 FROM g))
       |SELECT time_ms, 'value' AS name, value, 'event_type' AS labelname,
       |       'click' AS labelvalue, '' AS message FROM f
       |UNION ALL
       |SELECT time_ms, 'value' AS name, value, 'user_id' AS labelname,
       |       '7' AS labelvalue, '' AS message FROM f
       |ORDER BY time_ms, name, labelname, labelvalue, message, value""".stripMargin
    // the EXISTS guard keeps the spine data-conditional: an absent series
    // (e.g. a testdata regeneration dropping the pinned user) yields an
    // EMPTY result on both engines, matching InfluxDB's no-series answer,
    // instead of a 17568-row oracle-only spine (round-4 postmortem)
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Exercises the full SURVEY §3.2 pipeline: series-index dedup + label
    * explode → broadcast fingerprint join → time bucket → agg → sort. */
  def entry(spark: SparkSession): DataFrame =
    tsSelect("mean", "1m")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- §3.2 SELECT pipeline (P2 time range, J1 join, W1 bucket, A1 agg,
    //     A2 group, O1/O2 sort, U1 union via per-label explode) ---
    "ts_select_mean_1m" -> (tsSelect("mean", "1m") _),
    "ts_select_sum_1h" -> (tsSelect("sum", "1h") _),
    "ts_select_mean_1w" -> (tsSelect("mean", "1w") _),
    "ts_select_count_10m" -> (tsSelect("count", "10m") _),
    "ts_select_max_1h" -> (tsSelect("max", "1h") _),
    "ts_select_min_1h" -> (tsSelect("min", "1h") _),
    "ts_select_spread_1h" -> (tsSelect("spread", "1h") _),
    "ts_select_p95_1h" -> ((s, dir) => stable(influx(s, dir,
      s"""SELECT percentile("value", 95) FROM "events" WHERE time > $FromNs AND time < $ToNs GROUP BY time(1h)"""))),

    // --- P4 tag-equality predicates (single series) + O3 honored LIMIT ---
    "ts_select_tagfilter" -> ((s, dir) => stable(influx(s, dir, tagFilterQuery("5m")))),
    "ts_select_limit" -> ((s, dir) => stable(influx(s, dir, tagFilterQuery("1m") + " LIMIT 20"))),
    // ::field / ::tag namespace casts (InfluxQL cast syntax): semantics
    // identical to the uncast query — the casts assert namespaces the
    // engine already infers, and the parser vetoes contradictions
    "ts_select_cast" -> ((s, dir) => stable(influx(s, dir,
      s"""SELECT mean("value"::field) FROM "events" WHERE time > $FromNs AND time < $ToNs""" +
        """ AND "event_type"::tag = 'click' AND "user_id"::tag = '7' GROUP BY time(5m)"""))),

    // --- SELECT-shape extensions beyond the reference: raw points, star
    //     expansion, point pagination (OFFSET), series pagination
    //     (SLIMIT/SOFFSET), regex measurement refs ---
    "ts_select_raw" -> ((s, dir) => stable(influx(s, dir,
      s"""SELECT "value" FROM "events" WHERE time > $FromNs AND time < $ToNs""" +
        """ AND "event_type" = 'click' AND "user_id" = '7'"""))),
    // regex field projection expands to the matching field keys ("value"
    // here — /^v/ excludes "props"), then follows the ordinary raw path
    "ts_select_regex_field" -> ((s, dir) => stable(influx(s, dir,
      s"""SELECT /^v/ FROM "events" WHERE time > $FromNs AND time < $ToNs""" +
        """ AND "event_type" = 'click' AND "user_id" = '7'"""))),
    "ts_select_mean_regex" -> ((s, dir) => stable(influx(s, dir,
      s"""SELECT mean(/^v/) FROM "events" WHERE time > $FromNs AND time < $ToNs GROUP BY time(2h)"""))),
    "ts_select_star_mean_2h" -> ((s, dir) => stable(influx(s, dir,
      s"""SELECT mean(*) FROM "events" WHERE time > $FromNs AND time < $ToNs GROUP BY time(2h)"""))),
    "ts_select_offset" -> ((s, dir) => stable(influx(s, dir,
      tagFilterQuery("1m") + " LIMIT 20 OFFSET 20"))),
    "ts_select_slimit" -> ((s, dir) => stable(influx(s, dir,
      s"""SELECT mean("value") FROM "events" WHERE time > $FromNs AND time < $ToNs""" +
        """ GROUP BY time(6h) SLIMIT 1 SOFFSET 1"""))),
    "ts_select_regex_from" -> ((s, dir) => stable(influx(s, dir,
      s"""SELECT sum("value") FROM /^ev/ WHERE time > $FromNs AND time < $ToNs GROUP BY time(2h)"""))),
    // --- SHOW SERIES metadata (InfluxDB surface the reference lacks) ---
    "ts_show_series" -> ((s, dir) => influx(s, dir, "SHOW SERIES FROM \"events\"")),
    "ts_show_series_cardinality" -> ((s, dir) =>
      influx(s, dir, "SHOW SERIES EXACT CARDINALITY FROM \"events\"")),
    "ts_show_tag_values_regex" -> ((s, dir) =>
      influx(s, dir, """SHOW TAG VALUES FROM "events" WITH KEY =~ /^u/""")),
    "ts_show_fieldkey_cardinality" -> ((s, dir) =>
      influx(s, dir, "SHOW FIELD KEY EXACT CARDINALITY FROM \"events\"")),
    "ts_show_tagvalues_cardinality" -> ((s, dir) =>
      influx(s, dir, "SHOW TAG VALUES EXACT CARDINALITY FROM \"events\"")),
    "ts_show_tagkey_cardinality" -> ((s, dir) =>
      influx(s, dir, "SHOW TAG KEY EXACT CARDINALITY FROM \"events\"")),

    // --- tag filter operators beyond equality: !=, =~, !~ ---
    "ts_select_tag_neq" -> ((s, dir) => stable(influx(s, dir,
      s"""SELECT mean("value") FROM "events" WHERE time > $FromNs AND time < $ToNs""" +
        """ AND "event_type" != 'click' GROUP BY time(6h)"""))),
    "ts_select_tag_regex" -> ((s, dir) => stable(influx(s, dir,
      s"""SELECT mean("value") FROM "events" WHERE time > $FromNs AND time < $ToNs""" +
        """ AND "event_type" =~ /^(cl|pu)/ GROUP BY time(6h)"""))),

    // --- distinct/mode selectors (InfluxQL): per-bucket distinct values /
    //     most-frequent value (ties → lowest) ---
    "ts_select_distinct" -> ((s, dir) => stable(influx(s, dir,
      s"""SELECT distinct("value") FROM "events" WHERE time > $FromNs AND time < $ToNs""" +
        """ AND "event_type" = 'click' AND "user_id" = '7' GROUP BY time(6h)"""))),
    "ts_select_mode" -> ((s, dir) => stable(influx(s, dir,
      s"""SELECT mode("value") FROM "events" WHERE time > $FromNs AND time < $ToNs GROUP BY time(6h)"""))),

    // --- honored ORDER BY time DESC (reference ignores ORDER BY) ---
    "ts_select_order_desc" -> ((s, dir) => stableDesc(influx(s, dir,
      s"""SELECT mean("value") FROM "events" WHERE time > $FromNs AND time < $ToNs""" +
        """ AND "event_type" = 'click' AND "user_id" = '7' GROUP BY time(1h) ORDER BY time DESC"""))),

    // --- top/bottom selectors: N extreme points per bucket at their own
    //     timestamps ---
    "ts_select_top" -> ((s, dir) => stable(influx(s, dir,
      s"""SELECT top("value", 3) FROM "events" WHERE time > $FromNs AND time < $ToNs""" +
        """ AND "event_type" = 'click' AND "user_id" = '7' GROUP BY time(6h)"""))),
    "ts_select_bottom" -> ((s, dir) => stable(influx(s, dir,
      s"""SELECT bottom("value", 2) FROM "events" WHERE time > $FromNs AND time < $ToNs""" +
        """ AND "event_type" = 'click' AND "user_id" = '7' GROUP BY time(6h)"""))),

    "ts_select_bucket_offset" -> ((s, dir) => stable(influx(s, dir,
      s"""SELECT mean("value") FROM "events" WHERE time > $FromNs AND time < $ToNs""" +
        """ AND "event_type" = 'click' AND "user_id" = '7' GROUP BY time(1h, 30m)"""))),
    "ts_select_count_distinct" -> ((s, dir) => stable(influx(s, dir,
      s"""SELECT count(distinct("value")) FROM "events" WHERE time > $FromNs AND time < $ToNs GROUP BY time(6h)"""))),
    // audio windows run on REAL WAVs, decoded sample-by-sample (round-7)
    "mm_audio_windows" -> ((s, dir) =>
      Multimodal.windowAudio(Multimodal.audioFromDocs(docs(s, dir)))),
    "ts_select_first_last" -> ((s, dir) => stable(influx(s, dir,
      s"""SELECT first("value"), last("value") FROM "events" WHERE time > $FromNs AND time < $ToNs""" +
        """ AND "event_type" = 'click' AND "user_id" = '7' GROUP BY time(6h)"""))),
    "ts_select_tz_day" -> ((s, dir) => stable(influx(s, dir,
      s"""SELECT mean("value") FROM "events" WHERE time > $FromNs AND time < $ToNs""" +
        """ AND "event_type" = 'click' AND "user_id" = '7' GROUP BY time(1d) tz('America/Chicago')"""))),
    "ts_select_integral" -> ((s, dir) => stable(influx(s, dir,
      s"""SELECT integral("value", 1s) FROM "events" WHERE time > $FromNs AND time < $ToNs""" +
        """ AND "event_type" = 'click' AND "user_id" = '7' GROUP BY time(6h)"""))),
    "ts_select_elapsed" -> ((s, dir) => stable(influx(s, dir,
      s"""SELECT elapsed("value", 1s) FROM "events" WHERE time > $FromNs AND time < $ToNs""" +
        """ AND "event_type" = 'click' AND "user_id" = '7'"""))),

    // --- function-of-function: window transforms parsed from the query
    //     text and applied by the planner (same semantics as the direct
    //     operators.Tick entries above) ---
    "ts_select_fn_derivative" -> ((s, dir) => stable(influx(s, dir,
      s"""SELECT derivative(mean("value"), 1s) FROM "events" WHERE time > $FromNs AND time < $ToNs""" +
        """ AND "event_type" = 'click' AND "user_id" = '7' GROUP BY time(1h)"""))),
    "ts_select_fn_movavg" -> ((s, dir) => stable(influx(s, dir,
      s"""SELECT moving_average(mean("value"), 3) FROM "events" WHERE time > $FromNs AND time < $ToNs""" +
        """ AND "event_type" = 'click' AND "user_id" = '7' GROUP BY time(1h)"""))),
    "ts_select_fn_cumsum" -> ((s, dir) => stable(influx(s, dir,
      s"""SELECT cumulative_sum(mean("value")) FROM "events" WHERE time > $FromNs AND time < $ToNs""" +
        """ AND "event_type" = 'click' AND "user_id" = '7' GROUP BY time(1h)"""))),
    "ts_select_fn_holt" -> ((s, dir) => stable(influx(s, dir,
      s"""SELECT holt_winters(mean("value"), 4) FROM "events" WHERE time > $FromNs AND time < $ToNs""" +
        """ AND "event_type" = 'click' AND "user_id" = '7' GROUP BY time(1h)"""))),
    "ts_select_fn_holt_fit" -> ((s, dir) => stable(influx(s, dir,
      s"""SELECT holt_winters_with_fit(mean("value"), 4) FROM "events" WHERE time > $FromNs AND time < $ToNs""" +
        """ AND "event_type" = 'click' AND "user_id" = '7' GROUP BY time(1h)"""))),
    "ts_select_fn_ema" -> ((s, dir) => stable(influx(s, dir,
      s"""SELECT exponential_moving_average(mean("value"), 3) FROM "events" WHERE time > $FromNs AND time < $ToNs""" +
        """ AND "event_type" = 'click' AND "user_id" = '7' GROUP BY time(1h)"""))),
    "ts_select_sample" -> ((s, dir) => stable(influx(s, dir,
      s"""SELECT sample("value", 4) FROM "events" WHERE time > $FromNs AND time < $ToNs""" +
        """ AND "event_type" = 'click' AND "user_id" = '7' GROUP BY time(6h)"""))),
    "ts_select_fn_nnd" -> ((s, dir) => stable(influx(s, dir,
      s"""SELECT non_negative_derivative(mean("value"), 1s) FROM "events" WHERE time > $FromNs AND time < $ToNs""" +
        """ AND "event_type" = 'click' AND "user_id" = '7' GROUP BY time(1h)"""))),
    "ts_select_fn_nndiff" -> ((s, dir) => stable(influx(s, dir,
      s"""SELECT non_negative_difference(mean("value")) FROM "events" WHERE time > $FromNs AND time < $ToNs""" +
        """ AND "event_type" = 'click' AND "user_id" = '7' GROUP BY time(1h)"""))),
    // two transforms of the same aggregate in ONE statement — pins that
    // the per-field pipelines compose through the union (each field runs
    // its own transform independently)
    "ts_select_multi_transform" -> ((s, dir) => stable(influx(s, dir,
      s"""SELECT difference(mean("value")), moving_average(mean("value"), 3) FROM "events"""" +
        s""" WHERE time > $FromNs AND time < $ToNs""" +
        """ AND "event_type" = 'click' AND "user_id" = '7' GROUP BY time(1h)"""))),
    "ts_select_fn_dema" -> ((s, dir) => stable(influx(s, dir,
      s"""SELECT double_exponential_moving_average(mean("value"), 3) FROM "events" WHERE time > $FromNs AND time < $ToNs""" +
        """ AND "event_type" = 'click' AND "user_id" = '7' GROUP BY time(1h)"""))),
    "ts_select_fn_cmo" -> ((s, dir) => stable(influx(s, dir,
      s"""SELECT chande_momentum_oscillator(mean("value"), 4) FROM "events" WHERE time > $FromNs AND time < $ToNs""" +
        """ AND "event_type" = 'click' AND "user_id" = '7' GROUP BY time(1h)"""))),
    "ts_select_fn_ker" -> ((s, dir) => stable(influx(s, dir,
      s"""SELECT kaufmans_efficiency_ratio(mean("value"), 4) FROM "events" WHERE time > $FromNs AND time < $ToNs""" +
        """ AND "event_type" = 'click' AND "user_id" = '7' GROUP BY time(1h)"""))),
    "ts_select_fn_rsi" -> ((s, dir) => stable(influx(s, dir,
      s"""SELECT relative_strength_index(mean("value"), 4) FROM "events" WHERE time > $FromNs AND time < $ToNs""" +
        """ AND "event_type" = 'click' AND "user_id" = '7' GROUP BY time(1h)"""))),
    "ts_select_fn_tema" -> ((s, dir) => stable(influx(s, dir,
      s"""SELECT triple_exponential_moving_average(mean("value"), 3) FROM "events" WHERE time > $FromNs AND time < $ToNs""" +
        """ AND "event_type" = 'click' AND "user_id" = '7' GROUP BY time(1h)"""))),
    "ts_select_fn_trix" -> ((s, dir) => stable(influx(s, dir,
      s"""SELECT triple_exponential_derivative(mean("value"), 3) FROM "events" WHERE time > $FromNs AND time < $ToNs""" +
        """ AND "event_type" = 'click' AND "user_id" = '7' GROUP BY time(1h)"""))),
    "ts_select_fn_kama" -> ((s, dir) => stable(influx(s, dir,
      s"""SELECT kaufmans_adaptive_moving_average(mean("value"), 4) FROM "events" WHERE time > $FromNs AND time < $ToNs""" +
        """ AND "event_type" = 'click' AND "user_id" = '7' GROUP BY time(1h)"""))),
    "ts_select_top_tag" -> ((s, dir) => stable(influx(s, dir,
      s"""SELECT top("value", "event_type", 3) FROM "events" WHERE time > $FromNs AND time < $ToNs""" +
        """ GROUP BY time(6h)"""))),
    "ts_select_subquery" -> ((s, dir) => stable(influx(s, dir,
      s"""SELECT max("mean") FROM (SELECT mean("value") FROM "events"""" +
        s""" WHERE time > $FromNs AND time < $ToNs GROUP BY time(1h))""" +
        s""" WHERE time > $FromNs AND time < $ToNs GROUP BY time(6h)"""))),

    // --- InfluxQL operator surface: arithmetic + math over fields/aggs ---
    "ts_select_raw_difference" -> ((s, dir) => stable(influx(s, dir,
      s"""SELECT difference("value") FROM "events" WHERE time > $FromNs AND time < $ToNs""" +
        """ AND "event_type" = 'click' AND "user_id" = '7'"""))),
    "ts_select_tag_or" -> ((s, dir) => stable(influx(s, dir,
      s"""SELECT mean("value") FROM "events" WHERE time > $FromNs AND time < $ToNs""" +
        s""" AND ("event_type" = 'click' OR "event_type" = 'view') GROUP BY time(1h)"""))),
    "ts_select_where_value" -> ((s, dir) => stable(influx(s, dir,
      s"""SELECT mean("value") FROM "events" WHERE time > $FromNs AND time < $ToNs""" +
        s""" AND "value" > 50 GROUP BY time(1h)"""))),
    "ts_select_arith_1h" -> ((s, dir) => stable(influx(s, dir,
      s"""SELECT mean("value") * 2 + 10 AS "value" FROM "events"""" +
        s""" WHERE time > $FromNs AND time < $ToNs GROUP BY time(1h)"""))),
    "ts_select_math_sqrt" -> ((s, dir) => stable(influx(s, dir,
      s"""SELECT sqrt(mean("value")) AS "value" FROM "events"""" +
        s""" WHERE time > $FromNs AND time < $ToNs GROUP BY time(1h)"""))),
    "ts_select_math_trig" -> ((s, dir) => stable(influx(s, dir,
      s"""SELECT atan2(mean("value"), 30) AS "value" FROM "events"""" +
        s""" WHERE time > $FromNs AND time < $ToNs GROUP BY time(1h)"""))),
    // log of a non-positive mean is NULL in Spark but an ERROR in DuckDB
    // (surfaced at sf0.1 where an all-zero bucket exists): sentinel-fill
    // the NULLs on the Spark side, CASE-guard + coalesce on the oracle
    "ts_select_math_log" -> ((s, dir) => stable(influx(s, dir,
      s"""SELECT log(mean("value"), 2) AS "value" FROM "events"""" +
        s""" WHERE time > $FromNs AND time < $ToNs GROUP BY time(1h)""")
      .na.fill(-999.0, Seq("value")))),
    "ts_select_arith_fields" -> ((s, dir) => stable(influx(s, dir,
      s"""SELECT "mean" + "spread" AS "value" FROM (SELECT mean("value"), spread("value")""" +
        s""" FROM "events" WHERE time > $FromNs AND time < $ToNs""" +
        s""" AND "event_type" = 'click' AND "user_id" = '7' GROUP BY time(1h))""" +
        s""" WHERE time > $FromNs AND time < $ToNs"""))),

    // --- §3.1∘§3.2 end-to-end: line-protocol ingest feeding the SELECT
    //     pipeline (float field), plus the string-field pipeline (message
    //     column carried through group keys, reference cflux.js:55,364) ---
    "ts_select_ingested_sum_1h" -> ((s, dir) => stable(influxCat(s, ingestedCatalog(s, dir),
      s"""SELECT sum("value") FROM "events" WHERE time > $FromNs AND time < $ToNs GROUP BY time(1h)"""))),
    "ts_select_string_count_1h" -> ((s, dir) => stable(influxCat(s, ingestedCatalog(s, dir),
      s"""SELECT count("props") FROM "events" WHERE time > $FromNs AND time < $ToNs GROUP BY time(1h)"""))),

    // --- cross-field WHERE: the condition names a DIFFERENT field than
    //     the projection — the whole point drops when it fails (InfluxDB);
    //     rows pair on (tagset, timestamp) across the per-field row model ---
    "ts_select_where_other_field" -> ((s, dir) => stable(influxCat(s, ingestedCatalog(s, dir),
      s"""SELECT count("props") FROM "events" WHERE time > $FromNs AND time < $ToNs""" +
        """ AND "value" > 50 GROUP BY time(6h)"""))),

    // --- U1 multi-metric UNION ALL: one subquery per projected metric,
    //     float + string pipelines in one statement (cflux.js:745-772) ---
    "ts_select_multi_metric" -> ((s, dir) => stable(influxCat(s, ingestedCatalog(s, dir),
      s"""SELECT mean("value"), count("props") FROM "events" WHERE time > $FromNs AND time < $ToNs GROUP BY time(1h)"""))),

    // --- P2 shape 1: now()-relative time range (now fixed at NowMs) ---
    "ts_select_relative_range" -> ((s, dir) => stable(influx(s, dir,
      """SELECT mean("value") FROM "events" WHERE time > now() - 364d GROUP BY time(1h)"""))),

    // --- §3.3 metadata statements over the series index (A3-A6, P5-P6, F7) ---
    "ts_show_measurements" -> ((s, dir) =>
      influx(s, dir, "SHOW MEASUREMENTS")),
    "ts_show_field_keys" -> ((s, dir) =>
      influx(s, dir, """SHOW FIELD KEYS FROM "events"""")),
    "ts_show_tag_keys" -> ((s, dir) =>
      influx(s, dir, """SHOW TAG KEYS FROM "events"""")),
    "ts_show_tag_values" -> ((s, dir) =>
      influx(s, dir, """SHOW TAG VALUES FROM "events" WITH KEY IN ("event_type")""")),

    // --- TICK-style window transforms (SURVEY §2.5 note; Kapacitor
    //     difference/derivative/movingAverage over per-series streams) ---
    "ts_difference_1h" -> ((s, dir) => stable(
      graft.operators.Tick.difference(influx(s, dir, tagFilterQuery("1h"))))),
    "ts_derivative_1h" -> ((s, dir) => stable(
      graft.operators.Tick.derivative(influx(s, dir, tagFilterQuery("1h"))))),
    "ts_moving_avg_1h" -> ((s, dir) => stable(
      graft.operators.Tick.movingAverage(influx(s, dir, tagFilterQuery("1h")), 3))),
    "ts_increase_1h" -> ((s, dir) => stable(
      graft.operators.Tick.increase(influx(s, dir, tagFilterQuery("1h"))))),
    "ts_state_count" -> ((s, dir) => stable(
      graft.operators.Tick.stateCount(influx(s, dir, tagFilterQuery("1h")), 25.0))),
    "ts_state_duration" -> ((s, dir) => stable(
      graft.operators.Tick.stateDuration(influx(s, dir, tagFilterQuery("1h")), 25.0))),

    // --- honored GROUP BY tag (reference parses and ignores, cflux.js:695):
    //     series collapse onto the requested tag's values ---
    "ts_select_groupby_tag" -> ((s, dir) => stable(influx(s, dir,
      s"""SELECT mean("value") FROM "events" WHERE time > $FromNs AND time < $ToNs""" +
        """ GROUP BY time(1h), "event_type""""))),

    // --- honest FILL() gap filling (reference injects FILL(null) as a
    //     parser pacifier and never fills; SURVEY §2.5) ---
    "ts_select_fill_zero" -> ((s, dir) => stable(
      influx(s, dir, tagFilterQuery("1h") + " FILL(0)"))),
    "ts_select_fill_number" -> ((s, dir) => stable(
      influx(s, dir, tagFilterQuery("1h") + " FILL(-5)"))),
    "ts_select_fill_previous" -> ((s, dir) => stable(
      influx(s, dir, tagFilterQuery("1h") + " FILL(previous)")
        .na.fill(-1.0, Seq("value")))), // leading gap → -1 (hash-safe, no nulls)
    "ts_select_fill_linear" -> ((s, dir) => stable(
      influx(s, dir, tagFilterQuery("1h") + " FILL(linear)")
        .na.fill(-1.0, Seq("value")))), // boundary gaps → -1 (hash-safe)

    // --- as-of join (operator absent from both reference and Spark SQL;
    //     composed union + running last per SURVEY §2.3 extension) ---
    "ts_asof_prior_view" -> ((s, dir) => {
      val ev = EventsAdapter.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
      val views = ev.filter(col("event_type") === "view")
      graft.operators.AsOf
        .latestPrior(clicks, views, Seq("user_id"), "ts_ns", "value", "prior_view")
        .select(col("event_id"), col("user_id"), col("ts_ms").as("time_ms"),
          coalesce(floor(col("prior_view") * 100), lit(-100L)).cast("long")
            .as("prior_view_cents"))
        .orderBy("event_id")
    }),

    "ts_asof_tolerance" -> ((s, dir) => {
      val ev = EventsAdapter.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
      val views = ev.filter(col("event_type") === "view")
      graft.operators.AsOf
        .latestPriorWithin(clicks, views, Seq("user_id"), "ts_ns", "value",
          "prior_view", 3600L * 1000000000L) // 1h staleness bound
        .select(col("event_id"), col("user_id"), col("ts_ms").as("time_ms"),
          coalesce(floor(col("prior_view") * 100), lit(-100L)).cast("long")
            .as("prior_view_cents"))
        .orderBy("event_id")
    }),

    // --- sessionization (inactivity-gap sessions over events) ---
    "ts_sessionize" -> ((s, dir) =>
      graft.operators.Sessionize.sessions(
        EventsAdapter.events(s, dir).select(col("user_id"), col("ts_ms")),
        Seq("user_id"), "ts_ms", gapMs = 1800000L)),

    // --- §3.3 remaining metadata statements ---
    "ts_show_databases" -> ((s, dir) => influx(s, dir, "SHOW DATABASES")),
    "ts_show_retention" -> ((s, dir) =>
      influx(s, dir, """SHOW RETENTION POLICIES ON "graft"""")),

    // --- general OLAP over the TPC-H-ish tables (engine credibility:
    //     classic scan→filter→agg and grouped top-k shapes) ---
    "olap_pricing_summary" -> ((s, dir) =>
      s.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          floor(sum("l_quantity") * 100).cast("long").as("sum_qty_c"),
          floor(sum("l_extendedprice") * 100).cast("long").as("sum_base_c"),
          floor(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))) * 100)
            .cast("long").as("sum_disc_c"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")),
    // Q3-shape shipping-priority top-N: selective dim filter reduced
    // before the fact joins; revenue as exact fixed-point (per-row floor,
    // long sum — partitioning-independent); top-10 via sort+limit
    // (TakeOrderedAndProject, no full sort materialization)
    "olap_q3_topn" -> ((s, dir) => {
      val cut = java.sql.Timestamp.valueOf("1998-01-01 00:00:00")
      val cust = s.read.parquet(s"$dir/customer.parquet")
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val ord = s.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderdate") < cut)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_shipdate") > cut)
        .select(col("l_orderkey"),
          floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
            .cast("long").as("rev_c"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("o_orderdate"),
          col("o_orderpriority"))
        .agg(sum("rev_c").as("revenue_fp"))
        .orderBy(col("revenue_fp").desc, col("l_orderkey"))
        .limit(10)
    }),
    // Q5-shape local-supplier revenue: region→nation broadcast chain
    // restricts supplier; the two fact joins shuffle on their natural
    // keys; c_nationkey = s_nationkey rides the supplier join as an
    // extra equi-key
    "olap_q5_revenue" -> ((s, dir) => {
      val reg = s.read.parquet(s"$dir/region.parquet").filter(col("r_name") === "ASIA")
      val nat = s.read.parquet(s"$dir/nation.parquet")
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      val supp = s.read.parquet(s"$dir/supplier.parquet")
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
      val cust = s.read.parquet(s"$dir/customer.parquet").select("c_custkey", "c_nationkey")
      val ord = s.read.parquet(s"$dir/orders.parquet").select("o_orderkey", "o_custkey")
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_suppkey"),
          floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
            .cast("long").as("rev_c"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(supp),
          col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .groupBy("n_name")
        .agg(sum("rev_c").as("revenue_fp"))
        .orderBy(col("revenue_fp").desc, col("n_name"))
    }),
    "olap_q10_returns" -> ((s, dir) => {
      // TPC-H Q10 shape: returned-item revenue per customer in a quarter.
      // Dim chain (nation) broadcasts; lineitem is filtered on returnflag
      // at the scan; customer⋈orders⋈lineitem shuffle on the join keys;
      // final top-20 is TakeOrderedAndProject, no global sort. Revenue is
      // per-row fixed-point then an exact long sum.
      val nat = s.read.parquet(s"$dir/nation.parquet").select("n_nationkey", "n_name")
      val cust = s.read.parquet(s"$dir/customer.parquet")
        .select("c_custkey", "c_name", "c_nationkey")
      val ord = s.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1996-04-01")
        .select("o_orderkey", "o_custkey")
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"),
          floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
            .cast("long").as("rev_c"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(sum("rev_c").as("revenue_fp"))
        .orderBy(col("revenue_fp").desc, col("c_custkey"))
        .limit(20)
    }),
    "olap_running_revenue" -> ((s, dir) => {
      // cumulative monthly revenue per order priority: windowed running
      // sum over exact fixed-point longs; partitions = priorities (5),
      // rows per partition = months — a bounded window even at 100 TB
      // because the agg collapses to (priority × month) BEFORE the window
      val monthly = s.read.parquet(s"$dir/orders.parquet")
        .groupBy(col("o_orderpriority"),
          (year(col("o_orderdate")) * 100 + month(col("o_orderdate"))).cast("long").as("ym"))
        .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("rev_fp"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_orderpriority").orderBy("ym")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      monthly.withColumn("cum_rev_fp", sum("rev_fp").over(w))
        .orderBy("o_orderpriority", "ym")
    }),
    "olap_rollup_revenue" -> ((s, dir) => {
      // multi-level report totals in ONE pass: ROLLUP (year, priority)
      // emits per-(year, priority), per-year subtotal, and grand total
      // from a single Expand + hash aggregate — no per-level re-scan,
      // the 100 TB shape for report cubes. grouping_id disambiguates the
      // rolled-up NULL keys; keys sentinel-coalesced for hash-safe output.
      import org.apache.spark.sql.functions.{grouping_id => gid}
      s.read.parquet(s"$dir/orders.parquet")
        .rollup(year(col("o_orderdate")).cast("long").as("yr"), col("o_orderpriority"))
        .agg(gid().cast("long").as("lvl"), // must be computed IN the agg
          sum(floor(col("o_totalprice") * 100).cast("long")).as("rev_fp"),
          count(lit(1)).as("n_orders"))
        .select(coalesce(col("yr"), lit(-1L)).as("yr"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("lvl"), col("rev_fp"), col("n_orders"))
        .orderBy("lvl", "yr", "priority")
    }),
    "sketch_cms_heavy" -> ((s, dir) =>
      Sketches.cmsHeavyUsers(EventsAdapter.events(s, dir))),
    "sketch_hist_quantiles" -> ((s, dir) =>
      Sketches.histQuantiles(EventsAdapter.events(s, dir))),
    "events_topk_heap" -> ((s, dir) =>
      graft.operators.TopK.topValuesPerType(
        EventsAdapter.events(s, dir), graft.operators.TopK.TopKPerType)),
    "sketch_bloom_probe" -> ((s, dir) =>
      Sketches.bloomProbe(
        s.read.parquet(s"$dir/customer.parquet"),
        s.read.parquet(s"$dir/orders.parquet"))),
    "sketch_kmv_jaccard" -> ((s, dir) =>
      Sketches.kmvJaccard(EventsAdapter.events(s, dir))),
    "olap_q19_disjunctive" -> ((s, dir) => {
      // TPC-H Q19 shape: OR-of-ANDs over (brand, quantity band) — the
      // disjunctive-predicate entry. The part dimension broadcasts; the
      // disjunction evaluates inside the join's codegen stage (each arm
      // pairs a dimension attribute with a fact attribute, so it cannot
      // push below the join — what CAN push is the quantity range union,
      // which Catalyst derives as l_quantity <= 30 on the scan).
      val part = s.read.parquet(s"$dir/part.parquet").select("p_partkey", "p_brand")
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_partkey"), col("l_quantity"),
          floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
            .cast("long").as("rev_c"))
      li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("l_quantity").between(1, 10)) ||
          (col("p_brand") === "Brand#9" && col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#17" && col("l_quantity").between(20, 30)))
        .agg(sum("rev_c").as("revenue_fp"), count(lit(1)).as("n_lines"))
    }),
    "olap_q4_exists" -> ((s, dir) => {
      // TPC-H Q4 shape: order counts by priority where a qualifying
      // lineitem EXISTS — the left-semi join entry (Q18 covers the
      // HAVING-broadcast shape, Q5/Q10 the inner chains). The semi-join
      // keeps the orders side deduplicated by construction: no fanout,
      // no distinct needed.
      val ord = s.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1996-04-01")
        .select("o_orderkey", "o_orderpriority")
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_returnflag") === "R")
        .select("l_orderkey")
      ord.join(li, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),
    "olap_q14_promo" -> ((s, dir) => {
      // TPC-H Q14 shape: revenue share of one part class in a shipping
      // quarter. The part dimension broadcasts; both the class-filtered
      // and total revenue ride ONE conditional hash aggregate; the share
      // is an exact integer ratio of the per-row fixed-point sums.
      val part = s.read.parquet(s"$dir/part.parquet").select("p_partkey", "p_type")
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1996-04-01")
        .select(col("l_partkey"),
          floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
            .cast("long").as("rev_c"))
      li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "ECONOMY", col("rev_c")).otherwise(0L)).as("promo_c"),
          sum(col("rev_c")).as("total_c"))
        .select(
          expr("promo_c * 1000000 div total_c").as("promo_share_fp"),
          col("total_c").as("revenue_fp"))
    }),
    "olap_q6_forecast" -> ((s, dir) => {
      // TPC-H Q6: single-table filter + aggregate — every predicate
      // reaches the parquet scan (PushedFilters), no join, no shuffle
      // beyond the scalar aggregate's partial/final pair. The purest
      // pushdown showcase: at 100 TB this reads only the row groups whose
      // min/max survive the date range.
      s.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01" &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(
          sum(floor(col("l_extendedprice") * col("l_discount") * 100).cast("long"))
            .as("revenue_fp"),
          count(lit(1)).as("n_lines"))
    }),
    "olap_q12_priority" -> ((s, dir) => {
      // TPC-H Q12 shape (adapted to the synthetic columns): per
      // returnflag, high- vs low-priority line counts for a shipping
      // year. The conditional aggregation rides the SAME hash aggregate
      // as a plain count (no extra pass); date filter pushed to the
      // lineitem scan; orders side carries only (key, priority).
      val ord = s.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"), col("o_orderpriority"))
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01")
        .select("l_orderkey", "l_returnflag")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
            .as("high_line_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
            .as("low_line_count"))
        .orderBy("l_returnflag")
    }),
    "olap_q18_large_orders" -> ((s, dir) => {
      // TPC-H Q18 shape: large-volume orders. The HAVING subquery is the
      // same lineitem aggregation reused (one scan, map-side combinable);
      // its survivors (p99 tail — tiny) broadcast into the order/customer
      // joins; final top-100 is TakeOrderedAndProject.
      val bigOrders = s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy("l_orderkey")
        .agg(floor(sum(col("l_quantity")) * 100).cast("long").as("qty_fp"))
        .filter(col("qty_fp") > 250 * 100)
      val ord = s.read.parquet(s"$dir/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      val cust = s.read.parquet(s"$dir/customer.parquet")
        .select("c_custkey", "c_name")
      ord.join(broadcast(bigOrders), col("o_orderkey") === col("l_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate").cast("string").as("o_orderdate"),
          floor(col("o_totalprice") * 100).cast("long").as("total_fp"),
          col("qty_fp"))
        .orderBy(col("total_fp").desc, col("o_orderkey"))
        .limit(100)
    }),
    "olap_q7_volume" -> ((s, dir) => {
      // TPC-H Q7 shape: bilateral trade volume between two nations by
      // ship year. Both nation-role sides reduce to (key, name) before
      // the fact chain; the supplier role broadcasts; the inequality
      // between the two roles evaluates in the joined codegen stage.
      val nat = s.read.parquet(s"$dir/nation.parquet")
        .filter(col("n_name").isin("NATION_1", "NATION_2"))
        .select("n_nationkey", "n_name")
      val supp = s.read.parquet(s"$dir/supplier.parquet")
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cust = s.read.parquet(s"$dir/customer.parquet")
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      val ord = s.read.parquet(s"$dir/orders.parquet").select("o_orderkey", "o_custkey")
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_suppkey"),
          year(col("l_shipdate")).cast("long").as("l_year"),
          floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
            .cast("long").as("rev_c"))
      li.join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(sum("rev_c").as("revenue_fp"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),
    "olap_q8_market_share" -> ((s, dir) => {
      // TPC-H Q8 shape: one nation's share of a part class's revenue
      // among a region's customers, by order year. Share = conditional /
      // total sums riding ONE hash aggregate, exact integer ratio; the
      // region→nation and part dimensions broadcast; customer keys join
      // inner (unique keys — no fanout).
      val reg = s.read.parquet(s"$dir/region.parquet").filter(col("r_name") === "ASIA")
      val natAll = s.read.parquet(s"$dir/nation.parquet")
      val custNat = natAll
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("cnk"))
      val cust = s.read.parquet(s"$dir/customer.parquet")
        .join(broadcast(custNat), col("c_nationkey") === col("cnk"))
        .select("c_custkey")
      val part = s.read.parquet(s"$dir/part.parquet")
        .filter(col("p_type") === "ECONOMY").select("p_partkey")
      val suppNat = s.read.parquet(s"$dir/supplier.parquet")
        .join(broadcast(natAll.select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val ord = s.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey"),
          year(col("o_orderdate")).cast("long").as("o_year"))
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
            .cast("long").as("rev_c"))
      li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .join(broadcast(suppNat), col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy("o_year")
        .agg(
          sum(when(col("supp_nation") === "NATION_3", col("rev_c")).otherwise(0L)).as("nat_c"),
          sum(col("rev_c")).as("total_c"))
        .select(col("o_year"),
          expr("nat_c * 1000000 div total_c").as("share_fp"),
          col("total_c").as("revenue_fp"))
        .orderBy("o_year")
    }),
    "olap_q13_custdist" -> ((s, dir) => {
      // TPC-H Q13 shape: THE outer-join entry. The right-side predicate
      // filters orders BEFORE the join (ON-clause semantics); customers
      // with no qualifying orders survive with count 0; then the
      // distribution of counts. Two hash aggregates, no window.
      val cust = s.read.parquet(s"$dir/customer.parquet").select("c_custkey")
      val ord = s.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .select("o_orderkey", "o_custkey")
      cust.join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),
    "olap_q15_top_supplier" -> ((s, dir) => {
      // TPC-H Q15 shape: revenue per supplier for a quarter, then the
      // supplier(s) achieving the maximum — the scalar-max
      // self-reference as a one-row broadcast join (no window over all
      // suppliers, no second fact scan: the max re-aggregates the
      // supplier-cardinality relation).
      val rev = s.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1996-04-01")
        .groupBy("l_suppkey")
        .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
          .cast("long")).as("total_revenue_fp"))
      val maxRev = rev.agg(max("total_revenue_fp").as("mx"))
      val supp = s.read.parquet(s"$dir/supplier.parquet").select("s_suppkey", "s_name")
      rev.join(broadcast(maxRev), col("total_revenue_fp") === col("mx"))
        .join(supp, col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue_fp"))
        .orderBy("s_suppkey")
    }),
    "olap_q17_small_qty" -> ((s, dir) => {
      // TPC-H Q17 shape: compare each fact row to its GROUP's average
      // without a window — the per-part (count, sum) relation is
      // part-cardinality-sized and broadcasts back; qty < 0.2·avg is the
      // exact integer cross-multiply 10·qty·cnt < 2·sumq (no float
      // division reaches the predicate).
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"),
          floor(col("l_extendedprice") * 100).cast("long").as("price_c"))
      val brandParts = s.read.parquet(s"$dir/part.parquet")
        .filter(col("p_brand") === "Brand#11").select("p_partkey")
      val perPart = li.groupBy("l_partkey")
        .agg(count(lit(1)).as("cnt"), sum("qty").as("sumq"))
        .withColumnRenamed("l_partkey", "ap_partkey")
      li.join(broadcast(brandParts), col("l_partkey") === col("p_partkey"))
        .join(broadcast(perPart), col("l_partkey") === col("ap_partkey"))
        .filter(col("qty") * 10 * col("cnt") < col("sumq") * 2)
        .agg(sum("price_c").as("sum_c"), count(lit(1)).as("n_lines"))
        .select(expr("sum_c div 7").as("avg_yearly_fp"), col("n_lines"))
    }),
    "olap_q22_dormant" -> ((s, dir) => {
      // TPC-H Q22 shape: anti join + scalar-average subquery. Customers
      // with above-average positive balance and no orders in the data's
      // last two years, grouped by nation. The average is a one-row
      // broadcast (cross-multiply predicate, no float division); recent
      // orders reduce to a distinct key set BEFORE the anti join.
      val cust = s.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey"), col("c_nationkey"),
          floor(col("c_acctbal") * 100).cast("long").as("bal_c"))
      val avgBal = cust.filter(col("bal_c") > 0)
        .agg(sum("bal_c").as("sum_c"), count(lit(1)).as("n_c"))
      val recent = s.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderdate") >= "2000-01-01")
        .select("o_custkey").distinct()
      cust.crossJoin(broadcast(avgBal))
        .filter(col("bal_c") * col("n_c") > col("sum_c"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("numcust"), sum("bal_c").as("totacctbal_fp"))
        .orderBy("c_nationkey")
    }),
    "olap_q2_min_cost" -> ((s, dir) => {
      // TPC-H Q2 shape (adapted: no partsupp table — lineitem is the
      // offer relation): for each PROMO small part, the supplier(s)
      // selling it at the part's minimum price — THE groupwise-min
      // correlated-subquery shape. The per-part min is part-cardinality
      // bounded and broadcasts back (no window over the fact table, no
      // second scan); supplier×nation decorates after the distinct.
      val parts = s.read.parquet(s"$dir/part.parquet")
        .filter(col("p_type") === "PROMO" && col("p_size") < 15)
        .select("p_partkey")
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_partkey"), col("l_suppkey"),
          floor(col("l_extendedprice") * 100).cast("long").as("price_c"))
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      val mins = li.groupBy(col("l_partkey").as("mp_partkey"))
        .agg(min("price_c").as("min_price_c"))
      val suppNat = s.read.parquet(s"$dir/supplier.parquet")
        .join(broadcast(s.read.parquet(s"$dir/nation.parquet")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
      li.join(broadcast(mins),
          col("l_partkey") === col("mp_partkey") && col("price_c") === col("min_price_c"))
        .select(col("l_partkey").as("p_partkey"), col("l_suppkey"), col("min_price_c"))
        .distinct()
        .join(broadcast(suppNat), col("l_suppkey") === col("s_suppkey"))
        .select("p_partkey", "s_suppkey", "s_name", "n_name", "min_price_c")
        .orderBy("p_partkey", "s_suppkey")
    }),
    "olap_q9_profit" -> ((s, dir) => {
      // TPC-H Q9 shape (adapted: cost proxy = 80% of p_retailprice in
      // cents — partsupp's ps_supplycost doesn't exist here): profit by
      // (supplier nation, ship year) over name-matched parts. Revenue
      // and cost both integer cents, so the profit sum is exact; part
      // and supplier×nation dimensions broadcast into one fact scan.
      val parts = s.read.parquet(s"$dir/part.parquet")
        .filter(col("p_name").like("%gear%"))
        .select(col("p_partkey"), floor(col("p_retailprice") * 80).cast("long").as("cost_c"))
      val suppNat = s.read.parquet(s"$dir/supplier.parquet")
        .join(broadcast(s.read.parquet(s"$dir/nation.parquet")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "n_name")
      s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_partkey"), col("l_suppkey"),
          col("l_quantity").cast("long").as("qty"),
          year(col("l_shipdate")).cast("long").as("o_year"),
          floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
            .cast("long").as("rev_c"))
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
        .join(broadcast(suppNat), col("l_suppkey") === col("s_suppkey"))
        .groupBy("n_name", "o_year")
        .agg(sum(col("rev_c") - col("qty") * col("cost_c")).as("profit_fp"))
        .orderBy("n_name", "o_year")
    }),
    "olap_q11_important" -> ((s, dir) => {
      // TPC-H Q11 shape: per-part inventory value restricted to one
      // nation's suppliers, HAVING value > 1/1000 of that nation's
      // total — the group-vs-global-scalar fraction. The total is a
      // one-row broadcast; the predicate is the exact integer
      // cross-multiply value·1000 > total (no float division).
      val suppN = s.read.parquet(s"$dir/supplier.parquet")
        .join(broadcast(s.read.parquet(s"$dir/nation.parquet")
          .filter(col("n_name") === "NATION_1")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey")
      val per = s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_partkey"), col("l_suppkey"),
          (col("l_quantity").cast("long") *
            floor(col("l_extendedprice") * 100).cast("long")).as("val_c"))
        .join(broadcast(suppN), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_partkey").as("p_partkey"))
        .agg(sum("val_c").as("value_fp"))
      val total = per.agg(sum("value_fp").as("total_fp"))
      per.crossJoin(broadcast(total))
        .filter(col("value_fp") * 1000 > col("total_fp"))
        .select("p_partkey", "value_fp")
        .orderBy(col("value_fp").desc, col("p_partkey"))
    }),
    "olap_q16_supplier_cnt" -> ((s, dir) => {
      // TPC-H Q16 shape: supplier diversity per (brand, type),
      // excluding a blocklist — THE anti-join + count-distinct entry.
      // The blocklist ("complaints" proxy: every 5th supplier) and the
      // brand-filtered part dimension both broadcast; count(distinct)
      // runs as two stacked hash aggregates on (brand, type, suppkey).
      val bl = s.read.parquet(s"$dir/supplier.parquet")
        .filter(col("s_suppkey") % 5 === 0)
        .select(col("s_suppkey").as("bl_suppkey"))
      val parts = s.read.parquet(s"$dir/part.parquet")
        .filter(col("p_brand") =!= "Brand#5")
        .select("p_partkey", "p_brand", "p_type")
      s.read.parquet(s"$dir/lineitem.parquet")
        .select("l_partkey", "l_suppkey")
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
        .join(broadcast(bl), col("l_suppkey") === col("bl_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type")
        .agg(countDistinct("l_suppkey").as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"))
    }),
    "olap_q20_excess" -> ((s, dir) => {
      // TPC-H Q20 shape: the nested-semi chain. Suppliers who moved
      // >100 units of 'small…' parts in 1997 (aggregate-then-filter on
      // the supplier-cardinality relation) semi-select the supplier
      // dimension; nation decorates. No fanout ever reaches the
      // output — the fact table collapses before any wide join.
      val smallParts = s.read.parquet(s"$dir/part.parquet")
        .filter(col("p_name").like("small%")).select("p_partkey")
      val sold = s.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_shipdate") >= "1997-01-01" && col("l_shipdate") < "1998-01-01")
        .select(col("l_partkey"), col("l_suppkey"), col("l_quantity").cast("long").as("qty"))
        .join(broadcast(smallParts), col("l_partkey") === col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(sum("qty").as("sold_qty"))
        .filter(col("sold_qty") > 300)
      s.read.parquet(s"$dir/supplier.parquet")
        .join(sold, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .join(broadcast(s.read.parquet(s"$dir/nation.parquet")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    }),
    "olap_q21_waiting" -> ((s, dir) => {
      // TPC-H Q21 shape: the self-semi + self-anti on the fact table.
      // A supplier "kept an F order waiting": shipped >60 days after
      // the order date, in a multi-supplier order where NO other
      // supplier shipped late. Both existence probes join the distinct
      // (order, supplier) relation — dedup before the self-joins keeps
      // them key-sized; top-10 via TakeOrderedAndProject.
      val ord = s.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderdate")
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
      val late = li
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY"))
        .select("l_orderkey", "l_suppkey").distinct()
      val anySupp = li.select("l_orderkey", "l_suppkey").distinct()
        .select(col("l_orderkey").as("a_orderkey"), col("l_suppkey").as("a_suppkey"))
      val lateOther = late
        .select(col("l_orderkey").as("b_orderkey"), col("l_suppkey").as("b_suppkey"))
      late
        .join(anySupp, col("l_orderkey") === col("a_orderkey") &&
          col("l_suppkey") =!= col("a_suppkey"), "left_semi")
        .join(lateOther, col("l_orderkey") === col("b_orderkey") &&
          col("l_suppkey") =!= col("b_suppkey"), "left_anti")
        .groupBy("l_suppkey")
        .agg(count(lit(1)).as("numwait"))
        .join(broadcast(s.read.parquet(s"$dir/supplier.parquet")
          .select("s_suppkey", "s_name")), col("l_suppkey") === col("s_suppkey"))
        .select("s_suppkey", "s_name", "numwait")
        .orderBy(col("numwait").desc, col("s_suppkey"))
        .limit(10)
    }),
    "emb_matryoshka" -> ((s, dir) => Similarity.matryoshka(emb(s, dir))),
    "emb_rp_project" -> ((s, dir) => Similarity.rpProject(emb(s, dir))),
    "ann_filtered_topk" -> ((s, dir) => Similarity.filteredTopK(emb(s, dir))),
    "ann_pq_topk" -> ((s, dir) => Similarity.pqTopK(emb(s, dir))),
    "ann_ivfpq_topk" -> ((s, dir) => Similarity.ivfpqTopK(emb(s, dir))),
    "olap_top_users_per_type" -> ((s, dir) => {
      val totals = EventsAdapter.events(s, dir)
        .groupBy("event_type", "user_id")
        .agg(floor(sum("value") * 100).cast("long").as("total_c"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy(col("total_c").desc, col("user_id"))
      totals.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .orderBy("event_type", "rank")
    }),

    // --- LLM-pipeline: text analysis over documents ---
    "doc_token_stats" -> ((s, dir) => TextOps.tokenStats(docs(s, dir))),
    "doc_quality" -> ((s, dir) => TextOps.qualityScore(docs(s, dir))),
    "doc_langid" -> ((s, dir) => TextOps.langId(docs(s, dir))),
    // round-8: TRAINED multi-class language ID — char-trigram NB profiles
    // learned on the train split of a derived 4-language polyglot corpus,
    // held-out confusion matrix as its own gated entry
    "doc_langid_multi" -> ((s, dir) => TextOps.langIdMulti(docs(s, dir))),
    "doc_langid_confusion" -> ((s, dir) => TextOps.langIdConfusion(docs(s, dir))),
    "doc_fingerprint" -> ((s, dir) => TextOps.fingerprint(docs(s, dir))),
    "doc_repetition" -> ((s, dir) => TextOps.repetition(docs(s, dir))),
    "doc_sample_stratified" -> ((s, dir) => TextOps.stratifiedSample(docs(s, dir))),
    "doc_tfidf" -> ((s, dir) => TextOps.tfidf(docs(s, dir))),
    "doc_lm_surprisal" -> ((s, dir) => TextOps.lmSurprisal(docs(s, dir))),
    "doc_bpe_pairs" -> ((s, dir) => TextOps.bpePairs(docs(s, dir))),
    "doc_bpe_train" -> ((s, dir) => TextOps.bpeTrain(docs(s, dir))),
    "doc_unigram_train" -> ((s, dir) => TextOps.unigramTrain(docs(s, dir))),
    "doc_unigram_encode" -> ((s, dir) => TextOps.unigramEncode(docs(s, dir))),
    // round-9: the THIRD tokenizer family (likelihood merges + max-munch)
    "doc_wordpiece_train" -> ((s, dir) => TextOps.wordpieceTrain(docs(s, dir))),
    "doc_wordpiece_encode" -> ((s, dir) => TextOps.wordpieceEncode(docs(s, dir))),
    // round-9: cross-family fertility report off the three memoized cores
    "doc_tokenizer_compare" -> ((s, dir) => TextOps.tokenizerCompare(docs(s, dir))),
    // round-9: GPT-style exact-boundary sequence packing (docs straddle)
    "doc_pack_split" -> ((s, dir) => TextOps.packSplit(docs(s, dir))),
    // round-9: per-snapshot new-ngram rate (crawl freshness)
    "doc_ngram_novelty" -> ((s, dir) => TextOps.ngramNovelty(docs(s, dir))),
    // round-9: deterministic easy->hard global training order
    "doc_curriculum_order" -> ((s, dir) => TextOps.curriculumOrder(docs(s, dir))),
    // round-8: trained-tokens-per-word by source (vocab-allocation metric)
    "doc_bpe_fertility" -> ((s, dir) => TextOps.bpeFertility(docs(s, dir))),
    "doc_bpe_compression" -> ((s, dir) => TextOps.bpeCompression(docs(s, dir))),
    // tokenizer APPLICATION: encode the corpus with the trained merges —
    // shares the memoized training pass with the two entries above
    "doc_bpe_encode" -> ((s, dir) => TextOps.bpeEncode(docs(s, dir))),
    "doc_pack_bins_bpe" -> ((s, dir) => TextOps.packBinsBpe(docs(s, dir))),
    "doc_shard_plan_bpe" -> ((s, dir) => TextOps.shardPlanBpe(docs(s, dir))),
    // capstone: curate -> train tokenizer on the curated split -> encode
    // -> shard manifest in trained-token units
    "doc_train_manifest" -> ((s, dir) => TextOps.trainManifest(docs(s, dir))),
    "doc_train_manifest_v2" ->
      ((s, dir) => TextOps.trainManifestV2(docs(s, dir), emb(s, dir))),
    "doc_snapshot_diff" -> ((s, dir) =>
      TextOps.snapshotDiff(TextOps.snapshotOld(docs(s, dir)), docs(s, dir))),
    "doc_bigram_lm" -> ((s, dir) => TextOps.bigramLm(docs(s, dir))),
    "doc_quality_normalized" -> ((s, dir) => TextOps.qualityNormalized(docs(s, dir))),
    "doc_shard_plan" -> ((s, dir) => TextOps.shardPlan(docs(s, dir))),
    "doc_bm25_topk" -> ((s, dir) => TextOps.bm25TopK(docs(s, dir))),
    "doc_source_cap" -> ((s, dir) => TextOps.sourceCap(docs(s, dir))),
    "doc_gopher_filters" -> ((s, dir) => TextOps.gopherFilters(docs(s, dir))),
    // round-8: the Gopher REPETITION battery (top {2,3,4}-gram coverage +
    // exact duplicated-8-gram coverage via interval-merge islands; the
    // 3-shingle dup/top fractions stay in doc_repetition)
    "doc_gopher_repetition" -> ((s, dir) => TextOps.gopherRepetition(docs(s, dir))),
    "doc_pii_scrub" -> ((s, dir) => TextOps.piiScrub(docs(s, dir))),
    "doc_dsir_weights" -> ((s, dir) => TextOps.dsirWeights(docs(s, dir))),
    "doc_winnowing" -> ((s, dir) => TextOps.winnowing(docs(s, dir))),
    "doc_quality_classifier" -> ((s, dir) => TextOps.qualityClassifier(docs(s, dir))),
    "doc_quality_train" -> ((s, dir) => TextOps.qualityTrain(docs(s, dir))),
    "doc_quality_trained_scores" -> ((s, dir) => TextOps.qualityTrainedScores(docs(s, dir))),
    "doc_url_canon" -> ((s, dir) => UrlOps.urlCanon(docs(s, dir))),
    "doc_url_dedup" -> ((s, dir) => UrlOps.urlDedup(docs(s, dir))),
    "doc_url_host_stats" -> ((s, dir) => UrlOps.hostStats(docs(s, dir))),
    "doc_curation_full" -> ((s, dir) => TextOps.curationFull(docs(s, dir))),
    "doc_url_host_budget" -> ((s, dir) => UrlOps.hostQualityBudget(docs(s, dir))),
    "emb_semantic_decontaminate" -> ((s, dir) => Dedup.semanticDecontaminate(emb(s, dir))),
    "doc_cdc_chunks" -> ((s, dir) => TextOps.cdcChunks(docs(s, dir))),
    "doc_dsir_resample" -> ((s, dir) => TextOps.dsirResample(docs(s, dir))),
    "doc_corpus_zipf" -> ((s, dir) => TextOps.corpusZipf(docs(s, dir))),
    "doc_mixture_weights" -> ((s, dir) => TextOps.mixtureWeights(docs(s, dir))),
    "doc_unimax_alloc" -> ((s, dir) => TextOps.unimaxAlloc(docs(s, dir))),
    "doc_ccnet_buckets" -> ((s, dir) => TextOps.ccnetBuckets(docs(s, dir))),
    "doc_curation_pipeline" -> ((s, dir) => TextOps.curationPipeline(docs(s, dir))),

    // --- LLM-pipeline: event analytics ---
    "events_funnel" -> ((s, dir) => EventOps.funnel(EventsAdapter.events(s, dir))),
    "events_retention" -> ((s, dir) => EventOps.retention(EventsAdapter.events(s, dir))),
    "events_json_extract" -> ((s, dir) => EventOps.jsonExtract(EventsAdapter.events(s, dir))),
    "events_active_users" -> ((s, dir) => EventOps.activeUsers(EventsAdapter.events(s, dir))),
    "events_attribution" -> ((s, dir) => EventOps.attribution(EventsAdapter.events(s, dir))),
    "events_transitions" -> ((s, dir) => EventOps.transitions(EventsAdapter.events(s, dir))),
    "events_top_paths" -> ((s, dir) => EventOps.topPaths(EventsAdapter.events(s, dir))),
    "events_assoc_lift" -> ((s, dir) => EventOps.assocLift(EventsAdapter.events(s, dir))),
    "events_markov" -> ((s, dir) => EventOps.markov(EventsAdapter.events(s, dir))),
    "events_type_correlation" -> ((s, dir) =>
      EventOps.typeCorrelation(EventsAdapter.events(s, dir))),
    "events_power_users" -> ((s, dir) => EventOps.powerUsers(EventsAdapter.events(s, dir))),
    "events_streaks" -> ((s, dir) => EventOps.streaks(EventsAdapter.events(s, dir))),
    "events_bursts" -> ((s, dir) => EventOps.bursts(EventsAdapter.events(s, dir))),
    "events_anomaly_days" -> ((s, dir) => EventOps.anomalyDays(EventsAdapter.events(s, dir))),
    "events_ab_lift" -> ((s, dir) => EventOps.abLift(EventsAdapter.events(s, dir))),
    "events_ltv_cohort" -> ((s, dir) => EventOps.ltvCohort(EventsAdapter.events(s, dir))),
    "events_survival_km" -> ((s, dir) => EventOps.survivalKm(EventsAdapter.events(s, dir))),
    "events_cusum" -> ((s, dir) => EventOps.cusumChangepoint(EventsAdapter.events(s, dir))),
    "events_window_funnel" -> ((s, dir) => EventOps.windowFunnel(EventsAdapter.events(s, dir))),
    "events_mad_outliers" -> ((s, dir) => EventOps.madOutliers(EventsAdapter.events(s, dir))),
    "events_time_to_convert" -> ((s, dir) => EventOps.timeToConvert(EventsAdapter.events(s, dir))),
    "events_rfm" -> ((s, dir) => EventOps.rfm(EventsAdapter.events(s, dir))),
    "events_first_touch" -> ((s, dir) => EventOps.firstTouch(EventsAdapter.events(s, dir))),
    "events_weekly_profile" -> ((s, dir) => EventOps.weeklyProfile(EventsAdapter.events(s, dir))),
    "dedup_containment" -> ((s, dir) => Dedup.containment(docs(s, dir))),
    "dedup_corpus_report" -> ((s, dir) => Dedup.corpusReport(docs(s, dir))),
    "dedup_soft_weights" -> ((s, dir) => Dedup.softDedupWeights(docs(s, dir))),
    "dedup_source_overlap" -> ((s, dir) => Dedup.crossSourceOverlap(docs(s, dir))),
    "sketch_theta_overlap" -> ((s, dir) => Sketches.thetaSourceOps(docs(s, dir))),
    "emb_gram_matrix" -> ((s, dir) => Similarity.gramMatrix(emb(s, dir))),
    // eval entries run on a deterministic ~50% hash sample: the exact/brute
    // truth relations they compare against are the only quadratic stages in
    // the engine, so the eval form is estimate-on-sample (EvalSampling)
    "dedup_simhash_eval" -> ((s, dir) =>
      Dedup.simhashEval(EvalSampling(docs(s, dir), "doc_id"))),

    // --- LLM-pipeline: dedup family ---
    "dedup_exact" -> ((s, dir) => Dedup.exact(docs(s, dir))),
    "dedup_ngram_jaccard" -> ((s, dir) => Dedup.ngramJaccard(docs(s, dir))),
    "dedup_minhash_lsh" -> ((s, dir) => Dedup.minhashLsh(docs(s, dir))),
    "dedup_simhash" -> ((s, dir) => Dedup.simhash(docs(s, dir))),
    "dedup_clusters" -> ((s, dir) => Dedup.clusters(docs(s, dir))),
    "dedup_keep_best" -> ((s, dir) => Dedup.keepBest(docs(s, dir))),
    "doc_train_test_split" -> ((s, dir) => Dedup.trainTestSplit(docs(s, dir))),
    "doc_decontaminate" -> ((s, dir) => TextOps.decontaminate(docs(s, dir))),
    "doc_hot_ngrams" -> ((s, dir) => TextOps.hotNgrams(docs(s, dir))),
    "doc_char_diversity" -> ((s, dir) => TextOps.charDiversity(docs(s, dir))),
    "emb_dup_clusters" -> ((s, dir) => Dedup.semanticClusters(emb(s, dir))),
    "doc_vocabulary" -> ((s, dir) => TextOps.vocabulary(docs(s, dir))),
    "doc_chunk" -> ((s, dir) => TextOps.chunk(docs(s, dir))),
    "doc_pack_bins" -> ((s, dir) => TextOps.packBins(docs(s, dir))),
    "emb_quantize_int8" -> ((s, dir) => Similarity.quantizeInt8(emb(s, dir))),
    "emb_bitext_mine" -> ((s, dir) => Similarity.bitextMine(emb(s, dir))),
    "emb_binary_quant" -> ((s, dir) => Similarity.binaryQuantize(emb(s, dir))),
    "emb_outliers" -> ((s, dir) => Similarity.centroidOutliers(emb(s, dir))),
    "emb_centroid_classify" -> ((s, dir) => Similarity.centroidClassify(emb(s, dir))),
    "emb_calibration" -> ((s, dir) => Similarity.centroidCalibration(emb(s, dir))),
    "emb_pagerank" -> ((s, dir) => Dedup.knnPagerank(emb(s, dir))),
    "dedup_minhash_est_eval" -> ((s, dir) => Dedup.minhashEstEval(docs(s, dir))),
    // round-9: the LSH tuning table — 3 band shapes over ONE signature
    "dedup_lsh_sweep" -> ((s, dir) => Dedup.lshSweep(docs(s, dir))),
    // round-9: write-side layout — z-order vs linear zone-map pruning
    "store_zorder_prune" -> ((s, dir) =>
      LayoutOps.zorderPrune(s.read.parquet(s"$dir/lineitem.parquet"))),
    // round-9: boilerplate extraction from planted HTML (link density)
    "doc_html_extract" -> ((s, dir) => Extract.htmlExtract(docs(s, dir))),
    // round-9: DP release of corpus stats (geometric mechanism + k-anon)
    "doc_dp_release" -> ((s, dir) => Privacy.dpRelease(docs(s, dir))),
    // round-10: the RELEASE view — noised counts only, sub-k cells gone,
    // seed a parameter (the audit view above is the parity demo)
    "doc_dp_release_public" -> ((s, dir) =>
      Privacy.dpReleasePublic(docs(s, dir), Privacy.PublicDemoSeed)),
    // round-9: star-contraction connected components (log-round CC)
    "dedup_cc_star" -> ((s, dir) => Dedup.ccStar(docs(s, dir))),
    // round-9: suffix-array ranks by distributed prefix doubling
    "doc_suffix_ranks" -> ((s, dir) => SuffixOps.suffixRanks(docs(s, dir))),
    // round-10: LCP layer (per-position duplication depth) + EXACT
    // any-length duplicated extents off the suffix array — both over the
    // planted corpus, sharing one memoized depth build; threshold 8 on the
    // extents exercises real LCP values (below the 16-token window class)
    "doc_sa_lcp" -> ((s, dir) =>
      SuffixOps.saDepthProfile(Dedup.plantSpans(docs(s, dir)))),
    "doc_sa_dup_extents" -> ((s, dir) =>
      SuffixOps.saDupExtents(Dedup.plantSpans(docs(s, dir)), 8)),
    // the REWRITE half off the same depth build: SA-driven span removal
    // at the sub-window threshold
    "doc_sa_remove_spans" -> ((s, dir) =>
      SuffixOps.saRemoveSpans(Dedup.plantSpans(docs(s, dir)), 8)),
    // round-11: THE published threshold — every duplicated extent >= 50
    // tokens (Lee et al. 2022), exact, off the cap-64 engine (three
    // doublings past the 8-gram seed); the 64-token plant plus any
    // natural >=50-token mirror surfaces whole
    "doc_sa_extents_t50" -> ((s, dir) =>
      SuffixOps.saDupExtents(Dedup.plantSpans(docs(s, dir)), 50, cap = 64)),
    // round-11: cross-document extent ATTRIBUTION — who shares each
    // extent (capped smallest-partner sets via bounded-heap aggregators,
    // two-stage cap with the composition lemma in the scaladoc); rides
    // the same shared depth + level build as the extents
    "doc_sa_extent_sources" -> ((s, dir) =>
      SuffixOps.saExtentSources(Dedup.plantSpans(docs(s, dir)))),
    // round-11: EXACT-SUBSTRING decontamination (the published Lee et
    // al./GPT-3 train-test overlap standard; hashed-13-gram rule stays
    // in doc_decontaminate) — benchmark window classes broadcast, train
    // side resolves through the shared SA build's rank classes
    "doc_sa_decontaminate" -> ((s, dir) =>
      SuffixOps.saDecontaminate(Dedup.plantSpans(docs(s, dir)))),
    // round-9: realized temperature mixture (epochs + keyed-hash frac)
    "doc_mixture_sample" -> ((s, dir) => TextOps.mixtureSample(docs(s, dir))),
    // round-9: integer-exact PCA power iteration + principal-axis profile
    "emb_pca_power" -> ((s, dir) => Similarity.pcaPower(emb(s, dir))),
    "emb_pca_project" -> ((s, dir) => Similarity.pcaProject(emb(s, dir))),
    "emb_pca_map" -> ((s, dir) => Similarity.pcaMap(emb(s, dir))),
    "ann_graph_topk" -> ((s, dir) => Similarity.graphTopK(emb(s, dir))),
    "ann_ranking_metrics" -> ((s, dir) =>
      Similarity.rankingMetrics(EvalSampling(emb(s, dir), "vec_id"))),
    "ann_recall_report" -> ((s, dir) =>
      Similarity.annRecall(EvalSampling(emb(s, dir), "vec_id"))),
    "doc_length_quantiles" -> ((s, dir) => TextOps.lengthQuantiles(docs(s, dir))),
    "doc_fertility" -> ((s, dir) => TextOps.fertilityBySource(docs(s, dir))),
    "dedup_incremental" -> ((s, dir) => Dedup.incremental(docs(s, dir))),
    "dedup_passage" -> ((s, dir) => Dedup.passage(docs(s, dir))),
    "doc_dup_spans" -> ((s, dir) => Dedup.dupSpans(docs(s, dir))),
    // variable-length exact span EXTENTS over the span-planted corpus —
    // round-11: re-based on the SA engine (one shared depth build serves
    // every threshold; spec-pinned law-identical to the windowed
    // dupSpansVar, which stays as the streaming path + doc_dup_spans'
    // windowed eval form)
    "doc_dup_spans_var" -> ((s, dir) =>
      SuffixOps.saDupExtents(Dedup.plantSpans(docs(s, dir)), Dedup.SpanLen)),
    // round-8: the rewrite half of Lee et al. — duplicated extents excised,
    // documents reassembled, conservation law (removed+kept==total)
    // spec-pinned; round-11: SA-driven off the same shared build
    "doc_dup_spans_removed" -> ((s, dir) =>
      SuffixOps.saRemoveSpans(Dedup.plantSpans(docs(s, dir)), Dedup.SpanLen)),
    "doc_line_dedup" -> ((s, dir) => Dedup.lineDedup(docs(s, dir))),
    "ann_hamming_topk" -> ((s, dir) => Similarity.hammingTopK(emb(s, dir))),
    "ann_ivf_topk" -> ((s, dir) => Similarity.ivfTopK(emb(s, dir))),
    "emb_semdedup" -> ((s, dir) => Similarity.semDedup(emb(s, dir))),
    "emb_knn_graph" -> ((s, dir) => Dedup.knnGraph(emb(s, dir))),
    "emb_knn_triangles" -> ((s, dir) => Dedup.knnTriangles(emb(s, dir))),
    "emb_cluster_quality" -> ((s, dir) => Similarity.clusterQuality(emb(s, dir))),
    "emb_prototype_prune" -> ((s, dir) => Similarity.prototypePrune(emb(s, dir))),
    "ann_mmr_rerank" -> ((s, dir) => Similarity.mmrRerank(emb(s, dir))),

    // --- approximate aggregates (SURVEY §2.4 "not present" list): HLL
    //     distinct, deterministic cross-engine (see pipeline.Sketches) ---
    "approx_distinct_hll" -> ((s, dir) =>
      Sketches.hllDistinctUsers(EventsAdapter.events(s, dir))),
    "dedup_emb_cosine" -> ((s, dir) => Dedup.cosinePairsBanded(emb(s, dir))),
    "dedup_emb_cosine_eval" -> ((s, dir) =>
      Dedup.cosineBandedEval(EvalSampling(emb(s, dir), "vec_id"))),

    // --- LLM-pipeline: similarity search over embeddings ---
    "ann_brute_topk" -> ((s, dir) => Similarity.bruteTopK(emb(s, dir))),
    "ann_lsh_topk" -> ((s, dir) => Similarity.lshTopK(emb(s, dir))),
    // round-9: hybrid retrieval — RRF fusion of the dense (exact-cosine)
    // and sketch (hamming) rankings, the standard RAG combiner
    "ann_rrf_fusion" -> ((s, dir) => Similarity.rrfFusion(emb(s, dir))),
    "emb_centroids" -> ((s, dir) => Similarity.centroids(emb(s, dir))),
    "emb_knn_classify" -> ((s, dir) => Similarity.knnClassify(emb(s, dir))),
    "emb_hard_negatives" -> ((s, dir) => Similarity.hardNegatives(emb(s, dir))),

    // --- LLM-pipeline: multimodal binary columns (REAL codecs) ---
    // content-routed feature extraction over the mixed table: BMP / PNG /
    // WAV / video decoded for real, opaque byte features only for the
    // genuinely unknown kind (round-8: decodeStub retired)
    "mm_decode_features" -> ((s, dir) =>
      Multimodal.extractFeatures(Multimodal.mixedMediaFromDocs(docs(s, dir)))),
    // frame sampling + scene cuts run on REAL videos: length-prefixed
    // containers of real BMP frames, decoded pixel-by-pixel (round-7)
    "mm_frame_sample" -> ((s, dir) =>
      Multimodal.sampleFrames(Multimodal.videoFromDocs(docs(s, dir)))),
    "mm_image_tiles" -> ((s, dir) =>
      Multimodal.tileImages(Multimodal.mediaFromDocs(docs(s, dir)))),
    "mm_aspect_plan" -> ((s, dir) =>
      Multimodal.aspectPlan(Multimodal.mediaFromDocs(docs(s, dir)))),
    "mm_scene_cuts" -> ((s, dir) =>
      Multimodal.sceneCuts(Multimodal.videoFromDocs(docs(s, dir)))),
    // magic-byte dispatch over a heterogeneous media column → the real
    // decoder per detected format, stub only for unknown
    "mm_decode_router" -> ((s, dir) =>
      Multimodal.decodeRouter(Multimodal.mixedMediaFromDocs(docs(s, dir)))),
    // perceptual hashing runs the REAL aHash on decoded BMP pixels (round-7)
    "mm_phash" -> ((s, dir) =>
      Multimodal.phashes(Multimodal.imagesFromDocs(docs(s, dir))).orderBy("media_id")),
    "mm_phash_dup" -> ((s, dir) =>
      Multimodal.phashDup(Multimodal.imagesFromDocs(docs(s, dir)))),
    // round-8: audio perceptual dedup — energy-envelope hash over decoded
    // samples; planted volume-doubled duplicates hash identically
    "mm_audio_phash" -> ((s, dir) =>
      Multimodal.audioPhashes(Multimodal.audioDupFromDocs(docs(s, dir)))
        .orderBy("media_id")),
    "mm_audio_dup" -> ((s, dir) =>
      Multimodal.audioDup(Multimodal.audioDupFromDocs(docs(s, dir)))),
    // round-9: video near-dup — frame-fingerprint containment finds the
    // planted head-trimmed re-uploads via a frame-hash equi-join
    "mm_video_dup" -> ((s, dir) => Multimodal.videoDup(docs(s, dir))),
    // round-9: trained image-content gate over DECODED pixels (NB on
    // intensity histograms; held-out confusion is its own entry)
    "mm_image_classify" -> ((s, dir) => Multimodal.imageClassify(docs(s, dir))),
    "mm_image_confusion" -> ((s, dir) => Multimodal.imageConfusion(docs(s, dir))),
    "mm_bmp_roundtrip" -> ((s, dir) => Multimodal.bmpRoundtrip(docs(s, dir))),
    // round-8: REAL PNG (DEFLATE + filters 0-4, JDK Inflater/CRC32) —
    // encode∘decode identity certified feature-wise against text
    "mm_png_roundtrip" -> ((s, dir) => Multimodal.pngRoundtrip(docs(s, dir))),
    // round-8: GIF87a (grayscale palette + REAL LZW: variable code width,
    // CLEAR/EOI, dict reset) — lossless, so the roundtrip oracle is exact
    "mm_gif_roundtrip" -> ((s, dir) => Multimodal.gifRoundtrip(docs(s, dir))),
    "mm_jpeg_roundtrip" -> ((s, dir) => Multimodal.jpegRoundtrip(docs(s, dir))),
    // round-8: CLIP-recipe alignment gate — per-pair scores + per-source
    // retention over derived image/text embedding pairs with planted swaps
    "mm_align_scores" -> ((s, dir) =>
      Multimodal.alignScores(emb(s, dir), docs(s, dir))),
    "mm_text_align" -> ((s, dir) =>
      Multimodal.textAlign(emb(s, dir), docs(s, dir))),
    "mm_wav_roundtrip" -> ((s, dir) => Multimodal.wavRoundtrip(docs(s, dir))),
    "mm_bmp_resize" -> ((s, dir) => Multimodal.bmpResize(docs(s, dir))),
    "mm_wav_resample" -> ((s, dir) => Multimodal.wavResample(docs(s, dir))),

    // --- §3.1 ingest path: line-protocol render → parse → fingerprint →
    //     type-split samples (S2-S5, P1), aggregated per hour partition ---
    "ingest_lp_roundtrip" -> ((s, dir) => {
      import s.implicits._
      val lines = EventsAdapter.asLineProtocol(EventsAdapter.events(s, dir)).as[String]
      val batch = Ingest.fromLines(lines, nowMs = NowMs)
      batch.samples
        .groupBy(col("hour"))
        .agg(
          sum(when(col("message") === "", 1).otherwise(0)).as("n_float"),
          sum(when(col("message") =!= "", 1).otherwise(0)).as("n_str"),
          // per-row floor before the sum: summing integral doubles is
          // exact (< 2^53), so the result is independent of partitioning
          // and summation order on both engines
          sum(floor(col("value") * 100)).cast("long").as("sum_cents"))
        .orderBy("hour")
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "ts_select_raw" -> rawSelectOracle,
    "ts_select_regex_field" -> rawSelectOracle,
    "ts_select_mean_regex" -> tsSelectOracle("avg(value)", 7200000L),
    "ts_select_star_mean_2h" -> tsSelectOracle("avg(value)", 7200000L),
    "ts_select_offset" -> tagFilterOracle(60000L, Some(20), offset = Some(20)),
    "ts_select_slimit" -> slimitOracle(21600000L, 1, 1),
    "ts_select_regex_from" -> tsSelectOracle("sum(value)", 7200000L),
    "ts_select_raw_difference" ->
      s"""WITH g AS (
         |  SELECT epoch_ms(ts) AS time_ms, event_type,
         |         CAST(user_id AS VARCHAR) AS user_id, value
         |  FROM events
         |  WHERE epoch_ms(ts) >= ${FromNs / 1000000L + 1} AND epoch_ms(ts) <= ${ToNs / 1000000L - 1}
         |    AND event_type = 'click' AND user_id = 7),
         |d AS (
         |  SELECT time_ms, event_type, user_id,
         |         CAST(floor((value - lag(value) OVER (ORDER BY time_ms)) * 100) AS BIGINT) AS value
         |  FROM g QUALIFY lag(value) OVER (ORDER BY time_ms) IS NOT NULL)
         |SELECT time_ms, 'difference' AS name, value, 'event_type' AS labelname,
         |       event_type AS labelvalue, '' AS message FROM d
         |UNION ALL
         |SELECT time_ms, 'difference' AS name, value, 'user_id' AS labelname,
         |       user_id AS labelvalue, '' AS message FROM d
         |ORDER BY time_ms, name, labelname, labelvalue, message, value""".stripMargin,
    "ts_select_tag_or" -> tsSelectOracle("avg(value)", 3600000L,
      extraWhere = "AND (event_type = 'click' OR event_type = 'view')"),
    "ts_select_where_value" ->
      tsSelectOracle("avg(value)", 3600000L, extraWhere = "AND value > 50"),
    "ts_select_arith_1h" -> tsSelectOracle("avg(value) * 2 + 10", 3600000L),
    "ts_select_math_sqrt" -> tsSelectOracle("sqrt(avg(value))", 3600000L),
    "ts_select_math_trig" -> tsSelectOracle("atan2(avg(value), 30)", 3600000L),
    "ts_select_math_log" -> tsSelectOracle(
      "coalesce(CASE WHEN avg(value) > 0 THEN log2(avg(value)) END, -999)", 3600000L),
    "ts_select_arith_fields" ->
      s"""WITH g AS (
         |  SELECT (epoch_ms(ts) // 3600000) * 3600000 AS time_ms,
         |         event_type, CAST(user_id AS VARCHAR) AS user_id,
         |         CAST(floor((avg(value) + (max(value) - min(value))) * 100) AS BIGINT) AS value
         |  FROM events
         |  WHERE epoch_ms(ts) >= ${FromNs / 1000000L + 1} AND epoch_ms(ts) <= ${ToNs / 1000000L - 1}
         |    AND event_type = 'click' AND user_id = 7
         |  GROUP BY 1, 2, 3)
         |SELECT time_ms, 'value' AS name, value, 'event_type' AS labelname,
         |       event_type AS labelvalue, '' AS message FROM g
         |UNION ALL
         |SELECT time_ms, 'value' AS name, value, 'user_id' AS labelname,
         |       user_id AS labelvalue, '' AS message FROM g
         |ORDER BY time_ms, name, labelname, labelvalue, message, value""".stripMargin,
    "ts_select_subquery" ->
      s"""WITH g AS (
         |  SELECT (epoch_ms(ts) // 3600000) * 3600000 AS time_ms,
         |         event_type, CAST(user_id AS VARCHAR) AS user_id,
         |         avg(value) AS value
         |  FROM events
         |  WHERE epoch_ms(ts) >= ${FromNs / 1000000L + 1} AND epoch_ms(ts) <= ${ToNs / 1000000L - 1}
         |  GROUP BY 1, 2, 3),
         |u AS (
         |  SELECT time_ms, 'mean' AS name, value, 'event_type' AS labelname,
         |         event_type AS labelvalue, '' AS message FROM g
         |  UNION ALL
         |  SELECT time_ms, 'mean' AS name, value, 'user_id' AS labelname,
         |         user_id AS labelvalue, '' AS message FROM g),
         |o AS (
         |  SELECT (time_ms // 21600000) * 21600000 AS time_ms, name, labelname,
         |         labelvalue, message,
         |         CAST(floor(max(value) * 100) AS BIGINT) AS value
         |  FROM u
         |  WHERE time_ms >= ${FromNs / 1000000L + 1} AND time_ms <= ${ToNs / 1000000L - 1}
         |  GROUP BY 1, 2, 3, 4, 5)
         |SELECT time_ms, name, value, labelname, labelvalue, message FROM o
         |ORDER BY time_ms, name, labelname, labelvalue, message, value""".stripMargin,
    "ts_select_mean_1m" -> tsSelectOracle("avg(value)", 60000L),
    "ts_select_sum_1h" -> tsSelectOracle("sum(value)", 3600000L),
    "ts_select_mean_1w" -> tsSelectOracle("avg(value)", 7L * 86400000L),
    "ts_select_count_10m" -> tsSelectOracle("CAST(count(value) AS DOUBLE)", 600000L),
    "ts_select_max_1h" -> tsSelectOracle("max(value)", 3600000L),
    "ts_select_min_1h" -> tsSelectOracle("min(value)", 3600000L),
    "ts_select_spread_1h" -> tsSelectOracle("max(value) - min(value)", 3600000L),
    "ts_select_p95_1h" -> tsSelectOracle("quantile_cont(value, 0.95)", 3600000L),
    "ts_select_distinct" ->
      s"""WITH d AS (
         |  SELECT DISTINCT (epoch_ms(ts) // 21600000) * 21600000 AS time_ms, value
         |  FROM events
         |  WHERE epoch_ms(ts) >= ${FromNs / 1000000L + 1} AND epoch_ms(ts) <= ${ToNs / 1000000L - 1}
         |    AND event_type = 'click' AND user_id = 7),
         |u AS (
         |  SELECT time_ms, value, 'event_type' AS labelname, 'click' AS labelvalue FROM d
         |  UNION ALL
         |  SELECT time_ms, value, 'user_id' AS labelname, '7' AS labelvalue FROM d)
         |SELECT time_ms, 'value' AS name, CAST(floor(value * 100) AS BIGINT) AS value,
         |       labelname, labelvalue, '' AS message
         |FROM u ORDER BY time_ms, name, labelname, labelvalue, message, value""".stripMargin,
    "ts_select_mode" ->
      s"""WITH c AS (
         |  SELECT (epoch_ms(ts) // 21600000) * 21600000 AS time_ms,
         |         event_type, CAST(user_id AS VARCHAR) AS user_id, value, count(*) AS n
         |  FROM events
         |  WHERE epoch_ms(ts) >= ${FromNs / 1000000L + 1} AND epoch_ms(ts) <= ${ToNs / 1000000L - 1}
         |  GROUP BY 1, 2, 3, 4),
         |m AS (
         |  SELECT time_ms, event_type, user_id, value,
         |         row_number() OVER (PARTITION BY time_ms, event_type, user_id
         |                            ORDER BY n DESC, value ASC) AS rn
         |  FROM c),
         |sel AS (
         |  SELECT time_ms, event_type, user_id,
         |         CAST(floor(value * 100) AS BIGINT) AS value FROM m WHERE rn = 1)
         |SELECT time_ms, 'value' AS name, value, 'event_type' AS labelname,
         |       event_type AS labelvalue, '' AS message FROM sel
         |UNION ALL
         |SELECT time_ms, 'value' AS name, value, 'user_id' AS labelname,
         |       user_id AS labelvalue, '' AS message FROM sel
         |ORDER BY time_ms, name, labelname, labelvalue, message, value""".stripMargin,
    "ts_select_order_desc" ->
      s"""WITH g AS (
         |  SELECT (epoch_ms(ts) // 3600000) * 3600000 AS time_ms,
         |         CAST(floor(avg(value) * 100) AS BIGINT) AS value
         |  FROM events
         |  WHERE epoch_ms(ts) >= ${FromNs / 1000000L + 1} AND epoch_ms(ts) <= ${ToNs / 1000000L - 1}
         |    AND event_type = 'click' AND user_id = 7
         |  GROUP BY 1)
         |SELECT * FROM (
         |  SELECT time_ms, 'value' AS name, value, 'event_type' AS labelname,
         |         'click' AS labelvalue, '' AS message FROM g
         |  UNION ALL
         |  SELECT time_ms, 'value' AS name, value, 'user_id' AS labelname,
         |         '7' AS labelvalue, '' AS message FROM g)
         |ORDER BY time_ms DESC, name, labelname, labelvalue, message, value""".stripMargin,
    "ts_select_tagfilter" -> tagFilterOracle(300000L, limit = None),
    "ts_select_cast" -> tagFilterOracle(300000L, limit = None),
    "ts_select_limit" -> tagFilterOracle(60000L, limit = Some(20)),
    "ts_select_ingested_sum_1h" -> tsSelectOracle("sum(value)", 3600000L),
    "ts_select_string_count_1h" ->
      s"""WITH g AS (
         |  SELECT (epoch_ms(ts) // 3600000) * 3600000 AS time_ms,
         |         event_type, CAST(user_id AS VARCHAR) AS user_id, props,
         |         CAST(floor(count(*) * 100) AS BIGINT) AS value
         |  FROM events
         |  WHERE epoch_ms(ts) >= ${FromNs / 1000000L + 1} AND epoch_ms(ts) <= ${ToNs / 1000000L - 1}
         |  GROUP BY 1, 2, 3, 4)
         |SELECT time_ms, 'props' AS name, value, 'event_type' AS labelname,
         |       event_type AS labelvalue, props AS message FROM g
         |UNION ALL
         |SELECT time_ms, 'props' AS name, value, 'user_id' AS labelname,
         |       user_id AS labelvalue, props AS message FROM g
         |ORDER BY time_ms, name, labelname, labelvalue, message, value""".stripMargin,
    "ts_select_where_other_field" ->
      s"""WITH g AS (
         |  SELECT (epoch_ms(ts) // 21600000) * 21600000 AS time_ms,
         |         event_type, CAST(user_id AS VARCHAR) AS user_id, props,
         |         CAST(floor(count(*) * 100) AS BIGINT) AS value
         |  FROM events
         |  WHERE epoch_ms(ts) >= ${FromNs / 1000000L + 1} AND epoch_ms(ts) <= ${ToNs / 1000000L - 1}
         |    AND value > 50
         |  GROUP BY 1, 2, 3, 4)
         |SELECT time_ms, 'props' AS name, value, 'event_type' AS labelname,
         |       event_type AS labelvalue, props AS message FROM g
         |UNION ALL
         |SELECT time_ms, 'props' AS name, value, 'user_id' AS labelname,
         |       user_id AS labelvalue, props AS message FROM g
         |ORDER BY time_ms, name, labelname, labelvalue, message, value""".stripMargin,
    "ts_show_measurements" ->
      "SELECT DISTINCT 'events' AS name FROM events ORDER BY name",
    "ts_show_field_keys" ->
      "SELECT DISTINCT 'value' AS fieldKey, 'float' AS fieldType FROM events ORDER BY fieldKey",
    "ts_show_tag_keys" ->
      "SELECT 'event_type' AS tagKey UNION ALL SELECT 'user_id' ORDER BY tagKey",
    "ts_show_tag_values" ->
      "SELECT DISTINCT 'event_type' AS key, event_type AS value FROM events ORDER BY key, value",
    "ingest_lp_roundtrip" ->
      """SELECT epoch_ms(ts) // 3600000 AS hour, count(*) AS n_float, count(*) AS n_str,
        |       CAST(sum(floor(value * 100)) AS BIGINT) AS sum_cents
        |FROM events GROUP BY hour ORDER BY hour""".stripMargin,
    "ts_show_series" ->
      """SELECT DISTINCT 'events,event_type=' || event_type || ',user_id=' || CAST(user_id AS VARCHAR) AS key
        |FROM events ORDER BY key""".stripMargin,
    "ts_show_series_cardinality" ->
      """SELECT CAST(count(DISTINCT (event_type, user_id)) AS BIGINT) AS "count" FROM events""",
    "ts_show_tag_values_regex" ->
      """SELECT DISTINCT 'user_id' AS key, CAST(user_id AS VARCHAR) AS value
        |FROM events ORDER BY key, value""".stripMargin,
    "ts_show_fieldkey_cardinality" -> """SELECT CAST(1 AS BIGINT) AS "count"""",
    "ts_show_tagkey_cardinality" -> """SELECT CAST(2 AS BIGINT) AS "count"""",
    "ts_show_tagvalues_cardinality" ->
      """SELECT * FROM (
        |  SELECT 'event_type' AS key, count(DISTINCT event_type) AS count FROM events
        |  UNION ALL
        |  SELECT 'user_id', count(DISTINCT user_id) FROM events)
        |ORDER BY key""".stripMargin,
    "ts_select_tag_neq" ->
      tsSelectOracle("avg(value)", 21600000L, extraWhere = "AND event_type <> 'click'"),
    "ts_select_tag_regex" ->
      tsSelectOracle("avg(value)", 21600000L,
        extraWhere = "AND regexp_matches(event_type, '^(cl|pu)')"),
    "ts_select_top" -> selectorOracle(21600000L, 3, "DESC"),
    "ts_select_bottom" -> selectorOracle(21600000L, 2, "ASC"),
    "ts_select_count_distinct" ->
      tsSelectOracle("count(DISTINCT value)", 21600000L),
    "mm_audio_windows" -> Multimodal.windowAudioOracle,
    "ts_select_first_last" ->
      // first()/last() = value at the bucket's earliest/latest timestamp
      // (ms timestamps are unique within the series — no arg ties)
      s"""WITH g AS (
         |  SELECT (epoch_ms(ts) // 21600000) * 21600000 AS time_ms,
         |         CAST(floor(arg_min(value, epoch_ms(ts)) * 100) AS BIGINT) AS v_first,
         |         CAST(floor(arg_max(value, epoch_ms(ts)) * 100) AS BIGINT) AS v_last
         |  FROM events
         |  WHERE epoch_ms(ts) >= ${FromNs / 1000000L + 1} AND epoch_ms(ts) <= ${ToNs / 1000000L - 1}
         |    AND event_type = 'click' AND user_id = 7
         |  GROUP BY 1),
         |u AS (SELECT time_ms, v_first AS value FROM g
         |      UNION ALL SELECT time_ms, v_last FROM g)
         |SELECT time_ms, 'value' AS name, value, 'event_type' AS labelname,
         |       'click' AS labelvalue, '' AS message FROM u
         |UNION ALL
         |SELECT time_ms, 'value' AS name, value, 'user_id' AS labelname,
         |       '7' AS labelvalue, '' AS message FROM u
         |ORDER BY time_ms, name, labelname, labelvalue, message, value""".stripMargin,
    "ts_select_tz_day" ->
      // local-midnight day buckets: UTC instant → Chicago wall clock →
      // floor to day → back to the UTC instant of that local midnight
      s"""WITH g AS (
         |  SELECT epoch_ms(timezone('UTC',
         |           timezone('America/Chicago', make_timestamp(
         |             ((epoch_ms(timezone('America/Chicago', timezone('UTC', ts)))
         |               // 86400000) * 86400000) * 1000)))) AS time_ms,
         |         CAST(floor(avg(value) * 100) AS BIGINT) AS value
         |  FROM events
         |  WHERE epoch_ms(ts) >= ${FromNs / 1000000L + 1} AND epoch_ms(ts) <= ${ToNs / 1000000L - 1}
         |    AND event_type = 'click' AND user_id = 7
         |  GROUP BY 1)
         |SELECT time_ms, 'value' AS name, value, 'event_type' AS labelname,
         |       'click' AS labelvalue, '' AS message FROM g
         |UNION ALL
         |SELECT time_ms, 'value' AS name, value, 'user_id' AS labelname,
         |       '7' AS labelvalue, '' AS message FROM g
         |ORDER BY time_ms, name, labelname, labelvalue, message, value""".stripMargin,
    "ts_select_bucket_offset" ->
      s"""WITH g AS (
         |  SELECT ((epoch_ms(ts) - 1800000) // 3600000) * 3600000 + 1800000 AS time_ms,
         |         CAST(floor(avg(value) * 100) AS BIGINT) AS value
         |  FROM events
         |  WHERE epoch_ms(ts) >= ${FromNs / 1000000L + 1} AND epoch_ms(ts) <= ${ToNs / 1000000L - 1}
         |    AND event_type = 'click' AND user_id = 7
         |  GROUP BY 1)
         |SELECT time_ms, 'value' AS name, value, 'event_type' AS labelname,
         |       'click' AS labelvalue, '' AS message FROM g
         |UNION ALL
         |SELECT time_ms, 'value' AS name, value, 'user_id' AS labelname,
         |       '7' AS labelvalue, '' AS message FROM g
         |ORDER BY time_ms, name, labelname, labelvalue, message, value""".stripMargin,
    "ts_select_integral" ->
      s"""WITH p AS (
         |  SELECT epoch_ms(ts) AS time_ms, value
         |  FROM events
         |  WHERE epoch_ms(ts) >= ${FromNs / 1000000L + 1} AND epoch_ms(ts) <= ${ToNs / 1000000L - 1}
         |    AND event_type = 'click' AND user_id = 7),
         |s AS (SELECT time_ms, value,
         |             lag(time_ms) OVER (ORDER BY time_ms, value) AS pt,
         |             lag(value) OVER (ORDER BY time_ms, value) AS pv
         |      FROM p),
         |seg AS (SELECT * FROM s WHERE pt IS NOT NULL AND time_ms > pt),
         |pieces AS (
         |  SELECT t.b,
         |         greatest(s2.pt, t.b) AS ss,
         |         least(s2.time_ms, t.b + 21600000) AS ee,
         |         s2.pv + (s2.value - s2.pv) *
         |           ((greatest(s2.pt, t.b) - s2.pt) / (s2.time_ms - s2.pt)) AS vs,
         |         s2.pv + (s2.value - s2.pv) *
         |           ((least(s2.time_ms, t.b + 21600000) - s2.pt) / (s2.time_ms - s2.pt)) AS ve
         |  FROM seg s2
         |  JOIN generate_series(${(FromNs / 1000000L / 21600000L) * 21600000L},
         |                       ${(ToNs / 1000000L / 21600000L) * 21600000L},
         |                       21600000) t(b)
         |    ON t.b >= (s2.pt // 21600000) * 21600000
         |   AND t.b <= ((s2.time_ms - 1) // 21600000) * 21600000),
         |areas AS (SELECT b AS time_ms,
         |                 CAST(floor((vs + ve) / 2.0 * ((ee - ss) / 1000.0) * 1e6) AS BIGINT) AS a
         |          FROM pieces),
         |g AS (SELECT time_ms, CAST(sum(a) AS BIGINT) AS sfp FROM areas GROUP BY 1),
         |f AS (SELECT time_ms, CAST(floor((sfp / 1e6) * 100) AS BIGINT) AS value FROM g)
         |SELECT time_ms, 'value' AS name, value, 'event_type' AS labelname,
         |       'click' AS labelvalue, '' AS message FROM f
         |UNION ALL
         |SELECT time_ms, 'value' AS name, value, 'user_id' AS labelname,
         |       '7' AS labelvalue, '' AS message FROM f
         |ORDER BY time_ms, name, labelname, labelvalue, message, value""".stripMargin,
    "ts_select_elapsed" ->
      s"""WITH p AS (
         |  SELECT epoch_ms(ts) AS time_ms, value
         |  FROM events
         |  WHERE epoch_ms(ts) >= ${FromNs / 1000000L + 1} AND epoch_ms(ts) <= ${ToNs / 1000000L - 1}
         |    AND event_type = 'click' AND user_id = 7),
         |d AS (SELECT time_ms,
         |             lag(time_ms) OVER (ORDER BY time_ms, value) AS pt
         |      FROM p),
         |f AS (SELECT time_ms,
         |             CAST(floor(floor((time_ms - pt) / 1000.0) * 100) AS BIGINT) AS value
         |      FROM d WHERE pt IS NOT NULL)
         |SELECT time_ms, 'value' AS name, value, 'event_type' AS labelname,
         |       'click' AS labelvalue, '' AS message FROM f
         |UNION ALL
         |SELECT time_ms, 'value' AS name, value, 'user_id' AS labelname,
         |       '7' AS labelvalue, '' AS message FROM f
         |ORDER BY time_ms, name, labelname, labelvalue, message, value""".stripMargin,
    "ts_select_fn_derivative" -> tickOracle(3600000L,
      "raw, lag(raw) OVER (ORDER BY time_ms) AS pr, lag(time_ms) OVER (ORDER BY time_ms) AS pt",
      "CASE WHEN pr IS NOT NULL AND time_ms > pt THEN (raw - pr) / ((time_ms - pt) / 1000.0) END"),
    "ts_select_fn_movavg" -> tickOracle(3600000L,
      "avg(raw) OVER (ORDER BY time_ms ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS ma", "ma"),
    "ts_select_fn_cumsum" -> tickOracle(3600000L,
      "sum(raw) OVER (ORDER BY time_ms ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs", "cs"),
    "ts_select_fn_holt" ->
      // recursive CTE replays the Holt recurrence row by row: DuckDB's
      // list_reduce struct lambdas mutate the accumulator field-by-field
      // (later fields read already-updated values), so a fold cannot
      // carry (l, b) state faithfully — a CTE SELECT can
      s"""WITH RECURSIVE g AS (
         |  SELECT (epoch_ms(ts) // 3600000) * 3600000 AS time_ms, avg(value) AS value
         |  FROM events
         |  WHERE epoch_ms(ts) >= ${FromNs / 1000000L + 1} AND epoch_ms(ts) <= ${ToNs / 1000000L - 1}
         |    AND event_type = 'click' AND user_id = 7
         |  GROUP BY 1),
         |agg AS (SELECT max(time_ms) AS last_t,
         |               list(value ORDER BY time_ms, value) AS vs FROM g),
         |r(i, l, b) AS (
         |  SELECT 1, vs[1], vs[2] - vs[1] FROM agg WHERE len(vs) > 0
         |  UNION ALL
         |  SELECT i + 1,
         |         0.5 * vs[i + 1] + 0.5 * (l + b),
         |         0.25 * ((0.5 * vs[i + 1] + 0.5 * (l + b)) - l) + 0.75 * b
         |  FROM r, agg WHERE i + 1 <= len(vs)),
         |folded AS (SELECT last_t, l, b FROM r, agg WHERE i = len(vs)),
         |f AS (SELECT last_t + t.h * 3600000 AS time_ms,
         |             CAST(floor((l + t.h * b) * 100) AS BIGINT) AS value
         |      FROM folded, range(1, 5) t(h))
         |SELECT time_ms, 'value' AS name, value, 'event_type' AS labelname,
         |       'click' AS labelvalue, '' AS message FROM f
         |UNION ALL
         |SELECT time_ms, 'value' AS name, value, 'user_id' AS labelname,
         |       '7' AS labelvalue, '' AS message FROM f
         |ORDER BY time_ms, name, labelname, labelvalue, message, value""".stripMargin,
    "ts_select_fn_holt_fit" ->
      // same recurrence as holt; fits are the one-step-ahead predictions
      // (point 1 = the init level, point i>=2 = l+b of state i-1), then
      // the 4 forecasts from the folded state
      s"""WITH RECURSIVE g AS (
         |  SELECT (epoch_ms(ts) // 3600000) * 3600000 AS time_ms, avg(value) AS value
         |  FROM events
         |  WHERE epoch_ms(ts) >= ${FromNs / 1000000L + 1} AND epoch_ms(ts) <= ${ToNs / 1000000L - 1}
         |    AND event_type = 'click' AND user_id = 7
         |  GROUP BY 1),
         |agg AS (SELECT max(time_ms) AS last_t,
         |               list(time_ms ORDER BY time_ms, value) AS ts,
         |               list(value ORDER BY time_ms, value) AS vs FROM g),
         |r(i, l, b) AS (
         |  SELECT 1, vs[1], vs[2] - vs[1] FROM agg WHERE len(vs) > 0
         |  UNION ALL
         |  SELECT i + 1,
         |         0.5 * vs[i + 1] + 0.5 * (l + b),
         |         0.25 * ((0.5 * vs[i + 1] + 0.5 * (l + b)) - l) + 0.75 * b
         |  FROM r, agg WHERE i + 1 <= len(vs)),
         |folded AS (SELECT last_t, l, b FROM r, agg WHERE i = len(vs)),
         |f AS (SELECT ts[1] AS time_ms, CAST(floor(vs[1] * 100) AS BIGINT) AS value FROM agg
         |      WHERE len(vs) > 0
         |      UNION ALL
         |      SELECT ts[i + 1], CAST(floor((l + b) * 100) AS BIGINT)
         |      FROM r, agg WHERE i + 1 <= len(vs)
         |      UNION ALL
         |      SELECT last_t + t.h * 3600000,
         |             CAST(floor((l + t.h * b) * 100) AS BIGINT)
         |      FROM folded, range(1, 5) t(h))
         |SELECT time_ms, 'value' AS name, value, 'event_type' AS labelname,
         |       'click' AS labelvalue, '' AS message FROM f
         |UNION ALL
         |SELECT time_ms, 'value' AS name, value, 'user_id' AS labelname,
         |       '7' AS labelvalue, '' AS message FROM f
         |ORDER BY time_ms, name, labelname, labelvalue, message, value""".stripMargin,
    "ts_select_fn_ema" ->
      // EMA recurrence replayed by a recursive CTE (same shape as holt):
      // α = 2/(N+1) = 0.5 for N=3 — binary-exact, so 0.5*x + 0.5*e is the
      // identical IEEE op sequence as the Spark mapGroups fold
      s"""WITH RECURSIVE g AS (
         |  SELECT (epoch_ms(ts) // 3600000) * 3600000 AS time_ms, avg(value) AS value
         |  FROM events
         |  WHERE epoch_ms(ts) >= ${FromNs / 1000000L + 1} AND epoch_ms(ts) <= ${ToNs / 1000000L - 1}
         |    AND event_type = 'click' AND user_id = 7
         |  GROUP BY 1),
         |agg AS (SELECT list(value ORDER BY time_ms, value) AS vs,
         |               list(time_ms ORDER BY time_ms, value) AS tt FROM g),
         |r(i, e) AS (
         |  SELECT 1, vs[1] FROM agg WHERE len(vs) > 0
         |  UNION ALL
         |  SELECT i + 1, 0.5 * vs[i + 1] + 0.5 * e
         |  FROM r, agg WHERE i + 1 <= len(vs)),
         |f AS (SELECT tt[i] AS time_ms, CAST(floor(e * 100) AS BIGINT) AS value
         |      FROM r, agg)
         |SELECT time_ms, 'value' AS name, value, 'event_type' AS labelname,
         |       'click' AS labelvalue, '' AS message FROM f
         |UNION ALL
         |SELECT time_ms, 'value' AS name, value, 'user_id' AS labelname,
         |       '7' AS labelvalue, '' AS message FROM f
         |ORDER BY time_ms, name, labelname, labelvalue, message, value""".stripMargin,
    "ts_select_sample" ->
      // deterministic sample: N smallest md5(timestamp) per bucket —
      // both engines hash the same decimal string to the same lowercase
      // hex, so the pick is identical
      s"""WITH p AS (
         |  SELECT epoch_ms(ts) AS time_ms, (epoch_ms(ts) // 21600000) AS b, value
         |  FROM events
         |  WHERE epoch_ms(ts) >= ${FromNs / 1000000L + 1} AND epoch_ms(ts) <= ${ToNs / 1000000L - 1}
         |    AND event_type = 'click' AND user_id = 7),
         |r AS (SELECT *, row_number() OVER (
         |        PARTITION BY b ORDER BY md5(CAST(time_ms AS VARCHAR)), time_ms) AS rn
         |      FROM p),
         |f AS (SELECT time_ms, CAST(floor(value * 100) AS BIGINT) AS value FROM r WHERE rn <= 4)
         |SELECT time_ms, 'value' AS name, value, 'event_type' AS labelname,
         |       'click' AS labelvalue, '' AS message FROM f
         |UNION ALL
         |SELECT time_ms, 'value' AS name, value, 'user_id' AS labelname,
         |       '7' AS labelvalue, '' AS message FROM f
         |ORDER BY time_ms, name, labelname, labelvalue, message, value""".stripMargin,
    "ts_select_fn_nnd" -> tickOracle(3600000L,
      "raw, lag(raw) OVER (ORDER BY time_ms) AS pr, lag(time_ms) OVER (ORDER BY time_ms) AS pt",
      "CASE WHEN pr IS NOT NULL AND time_ms > pt AND (raw - pr) >= 0 THEN (raw - pr) / ((time_ms - pt) / 1000.0) END"),
    "ts_select_fn_nndiff" -> tickOracle(3600000L,
      "raw, lag(raw) OVER (ORDER BY time_ms) AS pr",
      "CASE WHEN pr IS NOT NULL AND (raw - pr) >= 0 THEN raw - pr END"),
    "ts_select_multi_transform" ->
      // both transforms' outputs union before the pivot (each keeps the
      // field name 'value'), then the usual two label-pair streams
      s"""WITH g AS (
         |  SELECT (epoch_ms(ts) // 3600000) * 3600000 AS time_ms, avg(value) AS raw
         |  FROM events
         |  WHERE epoch_ms(ts) >= ${FromNs / 1000000L + 1} AND epoch_ms(ts) <= ${ToNs / 1000000L - 1}
         |    AND event_type = 'click' AND user_id = 7
         |  GROUP BY 1),
         |d AS (SELECT time_ms, raw - lag(raw) OVER (ORDER BY time_ms) AS v FROM g),
         |m AS (SELECT time_ms, avg(raw) OVER (ORDER BY time_ms
         |        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS v FROM g),
         |f AS (
         |  SELECT time_ms, CAST(floor(v * 100) AS BIGINT) AS value FROM d WHERE v IS NOT NULL
         |  UNION ALL
         |  SELECT time_ms, CAST(floor(v * 100) AS BIGINT) FROM m)
         |SELECT time_ms, 'value' AS name, value, 'event_type' AS labelname,
         |       'click' AS labelvalue, '' AS message FROM f
         |UNION ALL
         |SELECT time_ms, 'value' AS name, value, 'user_id' AS labelname,
         |       '7' AS labelvalue, '' AS message FROM f
         |ORDER BY time_ms, name, labelname, labelvalue, message, value""".stripMargin,
    "ts_select_fn_dema" ->
      // two stacked EMA recurrences (recursive CTEs), DEMA = 2·e1 − e2;
      // α = 0.5 for N=3 is binary-exact, so every step is the identical
      // IEEE op sequence as the Spark mapGroups fold
      s"""WITH RECURSIVE g AS (
         |  SELECT (epoch_ms(ts) // 3600000) * 3600000 AS time_ms, avg(value) AS value
         |  FROM events
         |  WHERE epoch_ms(ts) >= ${FromNs / 1000000L + 1} AND epoch_ms(ts) <= ${ToNs / 1000000L - 1}
         |    AND event_type = 'click' AND user_id = 7
         |  GROUP BY 1),
         |agg AS (SELECT list(value ORDER BY time_ms, value) AS vs,
         |               list(time_ms ORDER BY time_ms, value) AS tt FROM g),
         |r1(i, e) AS (
         |  SELECT 1, vs[1] FROM agg WHERE len(vs) > 0
         |  UNION ALL
         |  SELECT i + 1, 0.5 * vs[i + 1] + 0.5 * e
         |  FROM r1, agg WHERE i + 1 <= len(vs)),
         |a1 AS (SELECT list(e ORDER BY i) AS es FROM r1),
         |r2(i, e2) AS (
         |  SELECT 1, es[1] FROM a1 WHERE len(es) > 0
         |  UNION ALL
         |  SELECT i + 1, 0.5 * es[i + 1] + 0.5 * e2
         |  FROM r2, a1 WHERE i + 1 <= len(es)),
         |f AS (SELECT tt[r1.i] AS time_ms,
         |             CAST(floor((2.0 * r1.e - r2.e2) * 100) AS BIGINT) AS value
         |      FROM r1 JOIN r2 ON r1.i = r2.i CROSS JOIN agg)
         |SELECT time_ms, 'value' AS name, value, 'event_type' AS labelname,
         |       'click' AS labelvalue, '' AS message FROM f
         |UNION ALL
         |SELECT time_ms, 'value' AS name, value, 'user_id' AS labelname,
         |       '7' AS labelvalue, '' AS message FROM f
         |ORDER BY time_ms, name, labelname, labelvalue, message, value""".stripMargin,
    "ts_select_fn_tema" ->
      // three stacked EMA recurrences (recursive CTEs), TEMA = 3·e1 −
      // 3·e2 + e3 evaluated in that exact op order; α = 0.5 for N=3 is
      // binary-exact, so every step is the identical IEEE op sequence
      // as the Spark mapGroups fold
      s"""WITH RECURSIVE g AS (
         |  SELECT (epoch_ms(ts) // 3600000) * 3600000 AS time_ms, avg(value) AS value
         |  FROM events
         |  WHERE epoch_ms(ts) >= ${FromNs / 1000000L + 1} AND epoch_ms(ts) <= ${ToNs / 1000000L - 1}
         |    AND event_type = 'click' AND user_id = 7
         |  GROUP BY 1),
         |agg AS (SELECT list(value ORDER BY time_ms, value) AS vs,
         |               list(time_ms ORDER BY time_ms, value) AS tt FROM g),
         |r1(i, e) AS (
         |  SELECT 1, vs[1] FROM agg WHERE len(vs) > 0
         |  UNION ALL
         |  SELECT i + 1, 0.5 * vs[i + 1] + 0.5 * e
         |  FROM r1, agg WHERE i + 1 <= len(vs)),
         |a1 AS (SELECT list(e ORDER BY i) AS es FROM r1),
         |r2(i, e2) AS (
         |  SELECT 1, es[1] FROM a1 WHERE len(es) > 0
         |  UNION ALL
         |  SELECT i + 1, 0.5 * es[i + 1] + 0.5 * e2
         |  FROM r2, a1 WHERE i + 1 <= len(es)),
         |a2 AS (SELECT list(e2 ORDER BY i) AS fs FROM r2),
         |r3(i, e3) AS (
         |  SELECT 1, fs[1] FROM a2 WHERE len(fs) > 0
         |  UNION ALL
         |  SELECT i + 1, 0.5 * fs[i + 1] + 0.5 * e3
         |  FROM r3, a2 WHERE i + 1 <= len(fs)),
         |f AS (SELECT tt[r1.i] AS time_ms,
         |             CAST(floor((3.0 * r1.e - 3.0 * r2.e2 + r3.e3) * 100) AS BIGINT) AS value
         |      FROM r1 JOIN r2 ON r1.i = r2.i JOIN r3 ON r1.i = r3.i CROSS JOIN agg)
         |SELECT time_ms, 'value' AS name, value, 'event_type' AS labelname,
         |       'click' AS labelvalue, '' AS message FROM f
         |UNION ALL
         |SELECT time_ms, 'value' AS name, value, 'user_id' AS labelname,
         |       '7' AS labelvalue, '' AS message FROM f
         |ORDER BY time_ms, name, labelname, labelvalue, message, value""".stripMargin,
    "ts_select_fn_trix" ->
      // the same triple-EMA chain; TRIX = 100·(e3 − prev e3)/prev e3,
      // first row and zero-predecessor rows dropped (the Spark guard)
      s"""WITH RECURSIVE g AS (
         |  SELECT (epoch_ms(ts) // 3600000) * 3600000 AS time_ms, avg(value) AS value
         |  FROM events
         |  WHERE epoch_ms(ts) >= ${FromNs / 1000000L + 1} AND epoch_ms(ts) <= ${ToNs / 1000000L - 1}
         |    AND event_type = 'click' AND user_id = 7
         |  GROUP BY 1),
         |agg AS (SELECT list(value ORDER BY time_ms, value) AS vs,
         |               list(time_ms ORDER BY time_ms, value) AS tt FROM g),
         |r1(i, e) AS (
         |  SELECT 1, vs[1] FROM agg WHERE len(vs) > 0
         |  UNION ALL
         |  SELECT i + 1, 0.5 * vs[i + 1] + 0.5 * e
         |  FROM r1, agg WHERE i + 1 <= len(vs)),
         |a1 AS (SELECT list(e ORDER BY i) AS es FROM r1),
         |r2(i, e2) AS (
         |  SELECT 1, es[1] FROM a1 WHERE len(es) > 0
         |  UNION ALL
         |  SELECT i + 1, 0.5 * es[i + 1] + 0.5 * e2
         |  FROM r2, a1 WHERE i + 1 <= len(es)),
         |a2 AS (SELECT list(e2 ORDER BY i) AS fs FROM r2),
         |r3(i, e3) AS (
         |  SELECT 1, fs[1] FROM a2 WHERE len(fs) > 0
         |  UNION ALL
         |  SELECT i + 1, 0.5 * fs[i + 1] + 0.5 * e3
         |  FROM r3, a2 WHERE i + 1 <= len(fs)),
         |t AS (SELECT i, e3, lag(e3) OVER (ORDER BY i) AS p3 FROM r3),
         |f AS (SELECT tt[t.i] AS time_ms,
         |             CAST(floor((100.0 * (e3 - p3) / p3) * 100) AS BIGINT) AS value
         |      FROM t CROSS JOIN agg WHERE p3 IS NOT NULL AND p3 <> 0.0)
         |SELECT time_ms, 'value' AS name, value, 'event_type' AS labelname,
         |       'click' AS labelvalue, '' AS message FROM f
         |UNION ALL
         |SELECT time_ms, 'value' AS name, value, 'user_id' AS labelname,
         |       '7' AS labelvalue, '' AS message FROM f
         |ORDER BY time_ms, name, labelname, labelvalue, message, value""".stripMargin,
    "ts_select_fn_kama" ->
      // ER/sc per row from the explicit ascending lag-chain (the KER
      // fold-order discipline: oldest term first, left-assoc), then the
      // KAMA recurrence replayed by a recursive CTE over the (x, sc)
      // lists; seed = the price at the first row with N prior diffs
      s"""WITH RECURSIVE g AS (
         |  SELECT (epoch_ms(ts) // 3600000) * 3600000 AS time_ms, avg(value) AS value
         |  FROM events
         |  WHERE epoch_ms(ts) >= ${FromNs / 1000000L + 1} AND epoch_ms(ts) <= ${ToNs / 1000000L - 1}
         |    AND event_type = 'click' AND user_id = 7
         |  GROUP BY 1),
         |b AS (SELECT value AS x, time_ms,
         |             row_number() OVER (ORDER BY time_ms, value) AS i FROM g),
         |d AS (SELECT i, time_ms, x,
         |             lag(x, 1) OVER (ORDER BY i) AS x1,
         |             lag(x, 2) OVER (ORDER BY i) AS x2,
         |             lag(x, 3) OVER (ORDER BY i) AS x3,
         |             lag(x, 4) OVER (ORDER BY i) AS x4
         |      FROM b),
         |er AS (SELECT i, time_ms, x,
         |              CASE WHEN (abs(x3 - x4) + abs(x2 - x3) + abs(x1 - x2) + abs(x - x1)) = 0.0
         |                   THEN 0.0
         |                   ELSE abs(x - x4) /
         |                        (abs(x3 - x4) + abs(x2 - x3) + abs(x1 - x2) + abs(x - x1)) END AS er
         |       FROM d WHERE x4 IS NOT NULL),
         |sc AS (SELECT i, time_ms, x,
         |              (er * (2.0/3.0 - 2.0/31.0) + 2.0/31.0) AS scr FROM er),
         |agg AS (SELECT list(x ORDER BY i) AS xs, list(scr * scr ORDER BY i) AS ss,
         |               list(time_ms ORDER BY i) AS tt FROM sc),
         |r(j, k) AS (
         |  SELECT 1, xs[1] FROM agg WHERE len(xs) > 0
         |  UNION ALL
         |  SELECT j + 1, k + ss[j + 1] * (xs[j + 1] - k)
         |  FROM r, agg WHERE j + 1 <= len(xs)),
         |f AS (SELECT tt[j] AS time_ms, CAST(floor(k * 100) AS BIGINT) AS value
         |      FROM r, agg)
         |SELECT time_ms, 'value' AS name, value, 'event_type' AS labelname,
         |       'click' AS labelvalue, '' AS message FROM f
         |UNION ALL
         |SELECT time_ms, 'value' AS name, value, 'user_id' AS labelname,
         |       '7' AS labelvalue, '' AS message FROM f
         |ORDER BY time_ms, name, labelname, labelvalue, message, value""".stripMargin,
    "ts_select_top_tag" ->
      // 3-arg top: best point per (bucket, tag value), then the 3 tag
      // values with the highest best points — two stacked windows
      s"""WITH p AS (
         |  SELECT epoch_ms(ts) AS time_ms, event_type, value,
         |         (epoch_ms(ts) // 21600000) * 21600000 AS b
         |  FROM events
         |  WHERE epoch_ms(ts) >= ${FromNs / 1000000L + 1} AND epoch_ms(ts) <= ${ToNs / 1000000L - 1}),
         |best AS (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY b, event_type ORDER BY value DESC, time_ms) AS rn
         |  FROM p),
         |r AS (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY b ORDER BY value DESC, event_type) AS rk
         |  FROM best WHERE rn = 1)
         |SELECT time_ms, 'value' AS name,
         |       CAST(floor(value * 100) AS BIGINT) AS value,
         |       'event_type' AS labelname, event_type AS labelvalue, '' AS message
         |FROM r WHERE rk <= 3
         |ORDER BY time_ms, name, labelname, labelvalue, message, value""".stripMargin,
    "ts_select_fn_rsi" ->
      // Wilder RSI replayed by a recursive CTE over the ordered diff
      // list: seed = ascending folds of the first 4 gains/losses (zeros
      // for the other sign — x + 0.0 is exact), then
      // avg_t = (avg·3 + x)/4; RSI formula mirrored op-for-op
      s"""WITH RECURSIVE g AS (
         |  SELECT (epoch_ms(ts) // 3600000) * 3600000 AS time_ms, avg(value) AS value
         |  FROM events
         |  WHERE epoch_ms(ts) >= ${FromNs / 1000000L + 1} AND epoch_ms(ts) <= ${ToNs / 1000000L - 1}
         |    AND event_type = 'click' AND user_id = 7
         |  GROUP BY 1),
         |agg AS (SELECT list(value ORDER BY time_ms, value) AS vs,
         |               list(time_ms ORDER BY time_ms, value) AS tt FROM g),
         |dl AS (SELECT list_transform(range(1, len(vs)), i -> vs[i + 1] - vs[i]) AS ds,
         |              tt FROM agg),
         |r(i, ag, al) AS (
         |  SELECT 4,
         |         list_reduce(list_prepend(0.0::DOUBLE,
         |           list_transform(ds[1:4], d -> CASE WHEN d > 0 THEN d ELSE 0.0 END)),
         |           (a, b) -> a + b) / 4,
         |         list_reduce(list_prepend(0.0::DOUBLE,
         |           list_transform(ds[1:4], d -> CASE WHEN d < 0 THEN -d ELSE 0.0 END)),
         |           (a, b) -> a + b) / 4
         |  FROM dl
         |  UNION ALL
         |  SELECT i + 1,
         |         (ag * 3 + (CASE WHEN ds[i + 1] > 0 THEN ds[i + 1] ELSE 0.0 END)) / 4,
         |         (al * 3 + (CASE WHEN ds[i + 1] < 0 THEN -ds[i + 1] ELSE 0.0 END)) / 4
         |  FROM r, dl WHERE i + 1 <= len(ds)),
         |f AS (SELECT tt[i + 1] AS time_ms,
         |             CAST(floor((CASE WHEN al = 0 THEN 100.0
         |                              ELSE 100.0 - 100.0 / (1.0 + ag / al) END) * 100) AS BIGINT) AS value
         |      FROM r, dl)
         |SELECT time_ms, 'value' AS name, value, 'event_type' AS labelname,
         |       'click' AS labelvalue, '' AS message FROM f
         |UNION ALL
         |SELECT time_ms, 'value' AS name, value, 'user_id' AS labelname,
         |       '7' AS labelvalue, '' AS message FROM f
         |ORDER BY time_ms, name, labelname, labelvalue, message, value""".stripMargin,
    "ts_select_fn_ker" -> {
      // net change = the same lag-chain sum WITHOUT abs, identical fold
      // order to Tick.kaufmansEfficiency
      val net = (0 until 4).map(k => s"d$k").mkString(" + ")
      val vol = (0 until 4).map(k => s"abs(d$k)").mkString(" + ")
      s"""WITH g AS (
         |  SELECT (epoch_ms(ts) // 3600000) * 3600000 AS time_ms, avg(value) AS raw
         |  FROM events
         |  WHERE epoch_ms(ts) >= ${FromNs / 1000000L + 1} AND epoch_ms(ts) <= ${ToNs / 1000000L - 1}
         |    AND event_type = 'click' AND user_id = 7
         |  GROUP BY 1),
         |d0 AS (SELECT time_ms, raw - lag(raw) OVER (ORDER BY time_ms) AS d FROM g),
         |dd AS (SELECT time_ms, d AS d0,
         |              lag(d, 1) OVER (ORDER BY time_ms) AS d1,
         |              lag(d, 2) OVER (ORDER BY time_ms) AS d2,
         |              lag(d, 3) OVER (ORDER BY time_ms) AS d3
         |       FROM d0 WHERE d IS NOT NULL),
         |c AS (SELECT time_ms, ($net) AS net, ($vol) AS vol
         |      FROM dd WHERE d3 IS NOT NULL),
         |f AS (SELECT time_ms,
         |             CAST(floor((CASE WHEN vol = 0 THEN 0.0
         |                              ELSE abs(net) / vol END) * 100) AS BIGINT) AS value
         |      FROM c)
         |SELECT time_ms, 'value' AS name, value, 'event_type' AS labelname,
         |       'click' AS labelvalue, '' AS message FROM f
         |UNION ALL
         |SELECT time_ms, 'value' AS name, value, 'user_id' AS labelname,
         |       '7' AS labelvalue, '' AS message FROM f
         |ORDER BY time_ms, name, labelname, labelvalue, message, value""".stripMargin
    },
    "ts_select_fn_cmo" -> {
      // explicit lag-chain sums mirror Tick.chandeMomentum's fixed
      // left-to-right fold (a windowed SUM would leave summation order
      // to the engine's frame implementation)
      val up = (0 until 4).map(k =>
        s"(CASE WHEN d$k > 0 THEN d$k ELSE 0.0 END)").mkString(" + ")
      val dn = (0 until 4).map(k =>
        s"(CASE WHEN d$k < 0 THEN -d$k ELSE 0.0 END)").mkString(" + ")
      s"""WITH g AS (
         |  SELECT (epoch_ms(ts) // 3600000) * 3600000 AS time_ms, avg(value) AS raw
         |  FROM events
         |  WHERE epoch_ms(ts) >= ${FromNs / 1000000L + 1} AND epoch_ms(ts) <= ${ToNs / 1000000L - 1}
         |    AND event_type = 'click' AND user_id = 7
         |  GROUP BY 1),
         |d0 AS (SELECT time_ms, raw - lag(raw) OVER (ORDER BY time_ms) AS d FROM g),
         |dd AS (SELECT time_ms, d AS d0,
         |              lag(d, 1) OVER (ORDER BY time_ms) AS d1,
         |              lag(d, 2) OVER (ORDER BY time_ms) AS d2,
         |              lag(d, 3) OVER (ORDER BY time_ms) AS d3
         |       FROM d0 WHERE d IS NOT NULL),
         |c AS (SELECT time_ms, ($up) AS up, ($dn) AS dn
         |      FROM dd WHERE d3 IS NOT NULL),
         |f AS (SELECT time_ms,
         |             CAST(floor((CASE WHEN up + dn = 0 THEN 0.0
         |                              ELSE 100.0 * (up - dn) / (up + dn) END) * 100) AS BIGINT) AS value
         |      FROM c)
         |SELECT time_ms, 'value' AS name, value, 'event_type' AS labelname,
         |       'click' AS labelvalue, '' AS message FROM f
         |UNION ALL
         |SELECT time_ms, 'value' AS name, value, 'user_id' AS labelname,
         |       '7' AS labelvalue, '' AS message FROM f
         |ORDER BY time_ms, name, labelname, labelvalue, message, value""".stripMargin
    },
    "ts_difference_1h" -> tickOracle(3600000L,
      "raw, lag(raw) OVER (ORDER BY time_ms) AS pr", "raw - pr"),
    "ts_derivative_1h" -> tickOracle(3600000L,
      "raw, lag(raw) OVER (ORDER BY time_ms) AS pr, lag(time_ms) OVER (ORDER BY time_ms) AS pt",
      "CASE WHEN pr IS NOT NULL AND time_ms > pt THEN (raw - pr) / ((time_ms - pt) / 1000.0) END"),
    "ts_moving_avg_1h" -> tickOracle(3600000L,
      "avg(raw) OVER (ORDER BY time_ms ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS ma", "ma"),
    "ts_increase_1h" ->
      // running sum of non-negative deltas; window over the lag-filtered
      // rows in time order = the Spark two-pass form exactly
      s"""WITH g AS (
         |  SELECT (epoch_ms(ts) // 3600000) * 3600000 AS time_ms, avg(value) AS raw
         |  FROM events
         |  WHERE epoch_ms(ts) >= ${FromNs / 1000000L + 1} AND epoch_ms(ts) <= ${ToNs / 1000000L - 1}
         |    AND event_type = 'click' AND user_id = 7
         |  GROUP BY 1),
         |d AS (SELECT time_ms, raw - lag(raw) OVER (ORDER BY time_ms) AS dd FROM g),
         |s AS (SELECT time_ms, sum(greatest(dd, 0)) OVER (
         |        ORDER BY time_ms ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v
         |      FROM d WHERE dd IS NOT NULL),
         |f AS (SELECT time_ms, CAST(floor(v * 100) AS BIGINT) AS value FROM s)
         |SELECT time_ms, 'value' AS name, value, 'event_type' AS labelname,
         |       'click' AS labelvalue, '' AS message FROM f
         |UNION ALL
         |SELECT time_ms, 'value' AS name, value, 'user_id' AS labelname,
         |       '7' AS labelvalue, '' AS message FROM f
         |ORDER BY time_ms, name, labelname, labelvalue, message, value""".stripMargin,
    "ts_state_count" -> stateOracle(
      "CAST(row_number() OVER (PARTITION BY grp ORDER BY time_ms) * 100 AS BIGINT)"),
    "ts_state_duration" -> stateOracle(
      "CAST(floor(((time_ms - min(time_ms) OVER (PARTITION BY grp)) / 1000.0) * 100) AS BIGINT)"),
    "ts_select_relative_range" -> tsSelectOracle("avg(value)", 3600000L,
      fromMs = NowMs - 364L * 86400000L + 1, toMs = NowMs),
    "ts_select_multi_metric" ->
      s"""WITH gv AS (
         |  SELECT (epoch_ms(ts) // 3600000) * 3600000 AS time_ms,
         |         event_type, CAST(user_id AS VARCHAR) AS user_id,
         |         CAST(floor(avg(value) * 100) AS BIGINT) AS value
         |  FROM events
         |  WHERE epoch_ms(ts) >= ${FromNs / 1000000L + 1} AND epoch_ms(ts) <= ${ToNs / 1000000L - 1}
         |  GROUP BY 1, 2, 3),
         |gp AS (
         |  SELECT (epoch_ms(ts) // 3600000) * 3600000 AS time_ms,
         |         event_type, CAST(user_id AS VARCHAR) AS user_id, props,
         |         CAST(floor(count(*) * 100) AS BIGINT) AS value
         |  FROM events
         |  WHERE epoch_ms(ts) >= ${FromNs / 1000000L + 1} AND epoch_ms(ts) <= ${ToNs / 1000000L - 1}
         |  GROUP BY 1, 2, 3, 4)
         |SELECT time_ms, 'value' AS name, value, 'event_type' AS labelname,
         |       event_type AS labelvalue, '' AS message FROM gv
         |UNION ALL
         |SELECT time_ms, 'value' AS name, value, 'user_id' AS labelname,
         |       user_id AS labelvalue, '' AS message FROM gv
         |UNION ALL
         |SELECT time_ms, 'props' AS name, value, 'event_type' AS labelname,
         |       event_type AS labelvalue, props AS message FROM gp
         |UNION ALL
         |SELECT time_ms, 'props' AS name, value, 'user_id' AS labelname,
         |       user_id AS labelvalue, props AS message FROM gp
         |ORDER BY time_ms, name, labelname, labelvalue, message, value""".stripMargin,
    "ts_select_fill_zero" -> fillOracle(3600000L, "0"),
    "ts_select_fill_number" -> fillOracle(3600000L, "-5"),
    "ts_select_fill_linear" -> fillOracle(3600000L, "linear"),
    "ts_select_fill_previous" -> fillOracle(3600000L, "previous"),
    "ts_asof_prior_view" ->
      """SELECT c.event_id, c.user_id, epoch_ms(c.ts) AS time_ms,
        |       CAST(coalesce(floor(v.value * 100), -100) AS BIGINT) AS prior_view_cents
        |FROM events c ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
        |  ON c.user_id = v.user_id AND v.ts <= c.ts
        |WHERE c.event_type = 'click' ORDER BY c.event_id""".stripMargin,
    "ts_asof_tolerance" ->
      // ASOF with staleness bound: the matched prior view only counts
      // within 1h of the click (the CASE nulls out stale matches)
      """SELECT c.event_id, c.user_id, epoch_ms(c.ts) AS time_ms,
        |       CAST(coalesce(CASE WHEN epoch_ns(c.ts) - epoch_ns(v.ts) <= 3600000000000
        |                          THEN floor(v.value * 100) END, -100) AS BIGINT)
        |         AS prior_view_cents
        |FROM events c ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
        |  ON c.user_id = v.user_id AND v.ts <= c.ts
        |WHERE c.event_type = 'click' ORDER BY c.event_id""".stripMargin,
    "ts_sessionize" ->
      """WITH x AS (SELECT user_id, epoch_ms(ts) AS t FROM events),
        |s AS (SELECT user_id, t,
        |             CASE WHEN lag(t) OVER w IS NULL OR t - lag(t) OVER w > 1800000
        |                  THEN 1 ELSE 0 END AS ns
        |      FROM x WINDOW w AS (PARTITION BY user_id ORDER BY t)),
        |i AS (SELECT user_id, t,
        |             CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY t
        |                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
        |      FROM s)
        |SELECT user_id, session_idx, count(*) AS n_events,
        |       min(t) AS start_ms, max(t) AS end_ms
        |FROM i GROUP BY 1, 2 ORDER BY user_id, session_idx""".stripMargin,
    "ts_show_databases" -> "SELECT 'graft' AS name",
    "ts_show_retention" ->
      """SELECT 'autogen' AS name, '0s' AS duration, '168h0m0s' AS shardGroupDuration,
        |       1 AS replicaN, CAST(1 AS BOOLEAN) AS "default"""".stripMargin,
    "olap_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(floor(sum(l_quantity) * 100) AS BIGINT) AS sum_qty_c,
        |       CAST(floor(sum(l_extendedprice) * 100) AS BIGINT) AS sum_base_c,
        |       CAST(floor(sum(l_extendedprice * (1 - l_discount)) * 100) AS BIGINT) AS sum_disc_c,
        |       count(*) AS n
        |FROM lineitem WHERE l_shipdate <= '1998-09-02'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "olap_q3_topn" ->
      """SELECT l_orderkey,
        |       CAST(o_orderdate AS VARCHAR) AS o_orderdate,
        |       o_orderpriority,
        |       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_fp
        |FROM customer, orders, lineitem
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue_fp DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "olap_q5_revenue" ->
      """SELECT n_name,
        |       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_fp
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY revenue_fp DESC, n_name""".stripMargin,
    "olap_q10_returns" ->
      """WITH r AS (
        |  SELECT c_custkey, c_name, n_name,
        |         CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_fp
        |  FROM customer, orders, lineitem, nation
        |  WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |    AND o_orderdate >= '1996-01-01' AND o_orderdate < '1996-04-01'
        |    AND l_returnflag = 'R' AND c_nationkey = n_nationkey
        |  GROUP BY 1, 2, 3)
        |SELECT * FROM r ORDER BY revenue_fp DESC, c_custkey LIMIT 20""".stripMargin,
    "olap_running_revenue" ->
      """WITH m AS (
        |  SELECT o_orderpriority,
        |         year(o_orderdate) * 100 + month(o_orderdate) AS ym,
        |         CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_fp
        |  FROM orders GROUP BY 1, 2)
        |SELECT o_orderpriority, ym, rev_fp,
        |       CAST(sum(rev_fp) OVER (PARTITION BY o_orderpriority ORDER BY ym
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_rev_fp
        |FROM m ORDER BY o_orderpriority, ym""".stripMargin,
    "olap_rollup_revenue" ->
      """WITH b AS (SELECT year(o_orderdate) AS yr, o_orderpriority, o_totalprice
        |           FROM orders)
        |SELECT COALESCE(yr, -1) AS yr,
        |       COALESCE(o_orderpriority, 'ALL') AS priority,
        |       CAST(GROUPING(yr) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS lvl,
        |       CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_fp,
        |       count(*) AS n_orders
        |FROM b
        |GROUP BY ROLLUP (yr, o_orderpriority)
        |ORDER BY lvl, yr, priority""".stripMargin,
    "sketch_cms_heavy" -> Sketches.cmsHeavyUsersOracle,
    "sketch_hist_quantiles" -> Sketches.histQuantilesOracle,
    "events_topk_heap" ->
      graft.operators.TopK.topValuesPerTypeOracle(graft.operators.TopK.TopKPerType),
    "sketch_bloom_probe" -> Sketches.bloomProbeOracle,
    "sketch_kmv_jaccard" -> Sketches.kmvJaccardOracle,
    "olap_q19_disjunctive" ->
      """SELECT CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_fp,
        |       count(*) AS n_lines
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 10)
        |   OR (p_brand = 'Brand#9' AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#17' AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "olap_q4_exists" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1996-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "olap_q14_promo" ->
      """WITH j AS (
        |  SELECT p.p_type,
        |         CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS rev_c
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01')
        |SELECT CAST(sum(CASE WHEN p_type = 'ECONOMY' THEN rev_c ELSE 0 END)
        |              * 1000000 // sum(rev_c) AS BIGINT) AS promo_share_fp,
        |       CAST(sum(rev_c) AS BIGINT) AS revenue_fp
        |FROM j""".stripMargin,
    "olap_q6_forecast" ->
      """SELECT CAST(sum(CAST(floor(l_extendedprice * l_discount * 100) AS BIGINT)) AS BIGINT) AS revenue_fp,
        |       count(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "olap_q12_priority" ->
      """SELECT l_returnflag,
        |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "doc_mixture_weights" -> TextOps.mixtureWeightsOracle,
    "doc_unimax_alloc" -> TextOps.unimaxAllocOracle,
    "doc_ccnet_buckets" -> TextOps.ccnetBucketsOracle,
    "doc_curation_pipeline" -> TextOps.curationPipelineOracle,
    "emb_matryoshka" -> Similarity.matryoshkaOracle,
    "emb_rp_project" -> Similarity.rpProjectOracle,
    "ann_filtered_topk" -> Similarity.filteredTopKOracle,
    "ann_pq_topk" -> Similarity.pqTopKOracle,
    "ann_ivfpq_topk" -> Similarity.ivfpqTopKOracle,
    "emb_binary_quant" -> Similarity.binaryQuantizeOracle,
    "emb_outliers" -> Similarity.centroidOutliersOracle,
    "emb_centroid_classify" -> Similarity.centroidClassifyOracle,
    "emb_calibration" -> Similarity.centroidCalibrationOracle,
    "emb_pagerank" -> Dedup.knnPagerankOracle,
    "dedup_minhash_est_eval" -> Dedup.minhashEstEvalOracle,
    "dedup_lsh_sweep" -> Dedup.lshSweepOracle,
    "store_zorder_prune" -> LayoutOps.zorderPruneOracle,
    "doc_html_extract" -> Extract.htmlExtractOracle,
    "doc_dp_release" -> Privacy.dpReleaseOracle,
    "doc_dp_release_public" -> Privacy.dpReleasePublicOracle,
    "dedup_cc_star" -> Dedup.ccStarOracle,
    "doc_suffix_ranks" -> SuffixOps.suffixRanksOracle,
    "doc_sa_lcp" -> SuffixOps.saDepthProfileOracle,
    "doc_sa_dup_extents" -> SuffixOps.saDupExtentsOracle(8),
    "doc_sa_remove_spans" -> SuffixOps.saRemoveSpansOracle(8),
    "doc_sa_extents_t50" -> SuffixOps.saDupExtentsOracle(50),
    "doc_sa_extent_sources" -> SuffixOps.saExtentSourcesOracle(SuffixOps.SuffixCap),
    "doc_sa_decontaminate" -> SuffixOps.saDecontaminateOracle(SuffixOps.SuffixCap),
    "doc_mixture_sample" -> TextOps.mixtureSampleOracle,
    "emb_pca_power" -> Similarity.pcaPowerOracle,
    "emb_pca_map" -> Similarity.pcaMapOracle,
    "emb_pca_project" -> Similarity.pcaProjectOracle,
    "ann_graph_topk" -> Similarity.graphTopKOracle,
    "ann_ranking_metrics" ->
      EvalSampling.sampleOracle(Similarity.rankingMetricsOracle, "embeddings", "vec_id"),
    "ann_recall_report" -> EvalSampling.sampleOracle(Similarity.annRecallOracle, "embeddings", "vec_id"),
    "doc_length_quantiles" -> TextOps.lengthQuantilesOracle,
    "doc_fertility" -> TextOps.fertilityBySourceOracle,
    "dedup_incremental" -> Dedup.incrementalOracle,
    "dedup_passage" -> Dedup.passageOracle,
    "doc_dup_spans" -> Dedup.dupSpansOracle,
    // exact-string oracles (the windowed md5-hash forms remain on
    // Dedup.dupSpansVarOracle/removeSpansOracle for the law specs; both
    // derivations emit identical rows absent a 61-bit hash collision)
    "doc_dup_spans_var" -> SuffixOps.saDupExtentsOracle(Dedup.SpanLen),
    "doc_dup_spans_removed" -> SuffixOps.saRemoveSpansOracle(Dedup.SpanLen),
    "doc_line_dedup" -> Dedup.lineDedupOracle,
    "ann_hamming_topk" -> Similarity.hammingTopKOracle,
    "events_streaks" -> EventOps.streaksOracle,
    "events_bursts" -> EventOps.burstsOracle,
    "events_anomaly_days" -> EventOps.anomalyDaysOracle,
    "events_ab_lift" -> EventOps.abLiftOracle,
    "events_ltv_cohort" -> EventOps.ltvCohortOracle,
    "events_survival_km" -> EventOps.survivalKmOracle,
    "events_cusum" -> EventOps.cusumChangepointOracle,
    "events_window_funnel" -> EventOps.windowFunnelOracle,
    "events_mad_outliers" -> EventOps.madOutliersOracle,
    "events_time_to_convert" -> EventOps.timeToConvertOracle,
    "events_rfm" -> EventOps.rfmOracle,
    "events_first_touch" -> EventOps.firstTouchOracle,
    "events_weekly_profile" -> EventOps.weeklyProfileOracle,
    "dedup_containment" -> Dedup.containmentOracle,
    "dedup_corpus_report" -> Dedup.corpusReportOracle,
    "dedup_soft_weights" -> Dedup.softDedupWeightsOracle,
    "dedup_source_overlap" -> Dedup.crossSourceOverlapOracle,
    "sketch_theta_overlap" -> Sketches.thetaSourceOpsOracle,
    "emb_gram_matrix" -> Similarity.gramMatrixOracle,
    "dedup_simhash_eval" -> EvalSampling.sampleOracle(Dedup.simhashEvalOracle, "documents", "doc_id"),
    "doc_gopher_filters" -> TextOps.gopherFiltersOracle,
    "doc_gopher_repetition" -> TextOps.gopherRepetitionOracle,
    "doc_pii_scrub" -> TextOps.piiScrubOracle,
    "doc_dsir_weights" -> TextOps.dsirWeightsOracle,
    "doc_winnowing" -> TextOps.winnowingOracle,
    "doc_quality_classifier" -> TextOps.qualityClassifierOracle,
    "doc_quality_train" -> TextOps.qualityTrainOracle,
    "doc_quality_trained_scores" -> TextOps.qualityTrainedScoresOracle,
    "doc_url_canon" -> UrlOps.urlCanonOracle,
    "doc_url_dedup" -> UrlOps.urlDedupOracle,
    "doc_url_host_stats" -> UrlOps.hostStatsOracle,
    "doc_curation_full" -> TextOps.curationFullOracle,
    "doc_url_host_budget" -> UrlOps.hostQualityBudgetOracle,
    "emb_semantic_decontaminate" -> Dedup.semanticDecontaminateOracle,
    "doc_cdc_chunks" -> TextOps.cdcChunksOracle,
    "doc_dsir_resample" -> TextOps.dsirResampleOracle,
    "doc_corpus_zipf" -> TextOps.corpusZipfOracle,
    "olap_q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, CAST(floor(sum(l_quantity) * 100) AS BIGINT) AS qty_fp
        |  FROM lineitem GROUP BY 1
        |  HAVING CAST(floor(sum(l_quantity) * 100) AS BIGINT) > 25000)
        |SELECT c.c_name, c.c_custkey, o.o_orderkey,
        |       CAST(o.o_orderdate AS VARCHAR) AS o_orderdate,
        |       CAST(floor(o.o_totalprice * 100) AS BIGINT) AS total_fp, b.qty_fp
        |FROM orders o JOIN big b ON o.o_orderkey = b.l_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |ORDER BY total_fp DESC, o_orderkey LIMIT 100""".stripMargin,
    "olap_q7_volume" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |       CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_fp
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |WHERE sn.n_name IN ('NATION_1', 'NATION_2')
        |  AND cn.n_name IN ('NATION_1', 'NATION_2')
        |  AND sn.n_name <> cn.n_name
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "olap_q8_market_share" ->
      """WITH j AS (
        |  SELECT year(o_orderdate) AS o_year, n2.n_name AS supp_nation,
        |         CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS rev_c
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN region ON n1.n_regionkey = r_regionkey
        |  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY')
        |SELECT CAST(o_year AS BIGINT) AS o_year,
        |       CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN rev_c ELSE 0 END)
        |              * 1000000 // sum(rev_c) AS BIGINT) AS share_fp,
        |       CAST(sum(rev_c) AS BIGINT) AS revenue_fp
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    "olap_q13_custdist" ->
      """WITH cnts AS (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY 1)
        |SELECT c_count, count(*) AS custdist
        |FROM cnts GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "olap_q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |         CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS total_revenue_fp
        |  FROM lineitem
        |  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, total_revenue_fp
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_revenue_fp = (SELECT max(total_revenue_fp) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "olap_q17_small_qty" ->
      """WITH li AS (
        |  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
        |         CAST(floor(l_extendedprice * 100) AS BIGINT) AS price_c
        |  FROM lineitem),
        |pp AS (SELECT l_partkey, count(*) AS cnt, CAST(sum(qty) AS BIGINT) AS sumq
        |       FROM li GROUP BY 1)
        |SELECT CAST(sum(price_c) // 7 AS BIGINT) AS avg_yearly_fp, count(*) AS n_lines
        |FROM li
        |JOIN part ON li.l_partkey = p_partkey
        |JOIN pp ON li.l_partkey = pp.l_partkey
        |WHERE p_brand = 'Brand#11' AND qty * 10 * cnt < sumq * 2""".stripMargin,
    "olap_q22_dormant" ->
      """WITH cust AS (
        |  SELECT c_custkey, c_nationkey,
        |         CAST(floor(c_acctbal * 100) AS BIGINT) AS bal_c
        |  FROM customer),
        |avg_b AS (SELECT CAST(sum(bal_c) AS BIGINT) AS sum_c, count(*) AS n_c
        |          FROM cust WHERE bal_c > 0),
        |recent AS (SELECT DISTINCT o_custkey FROM orders
        |           WHERE o_orderdate >= '2000-01-01')
        |SELECT c_nationkey, count(*) AS numcust,
        |       CAST(sum(bal_c) AS BIGINT) AS totacctbal_fp
        |FROM cust, avg_b
        |WHERE bal_c * n_c > sum_c
        |  AND c_custkey NOT IN (SELECT o_custkey FROM recent)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "olap_q2_min_cost" ->
      """WITH li AS (
        |  SELECT l_partkey, l_suppkey,
        |         CAST(floor(l_extendedprice * 100) AS BIGINT) AS price_c
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  WHERE p_type = 'PROMO' AND p_size < 15),
        |mins AS (SELECT l_partkey AS mp_partkey, min(price_c) AS min_price_c
        |         FROM li GROUP BY 1),
        |win AS (SELECT DISTINCT l_partkey AS p_partkey, l_suppkey, min_price_c
        |        FROM li JOIN mins
        |          ON l_partkey = mp_partkey AND price_c = min_price_c)
        |SELECT p_partkey, s_suppkey, s_name, n_name, min_price_c
        |FROM win
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |ORDER BY p_partkey, s_suppkey""".stripMargin,
    "olap_q9_profit" ->
      """SELECT n_name, CAST(year(l_shipdate) AS BIGINT) AS o_year,
        |       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
        |              - CAST(l_quantity AS BIGINT) *
        |                CAST(floor(p_retailprice * 80) AS BIGINT)) AS BIGINT) AS profit_fp
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%gear%'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "olap_q11_important" ->
      """WITH per AS (
        |  SELECT l_partkey AS p_partkey,
        |         CAST(sum(CAST(l_quantity AS BIGINT) *
        |                  CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS value_fp
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name = 'NATION_1'
        |  GROUP BY 1),
        |tot AS (SELECT CAST(sum(value_fp) AS BIGINT) AS total_fp FROM per)
        |SELECT p_partkey, value_fp
        |FROM per, tot WHERE value_fp * 1000 > total_fp
        |ORDER BY value_fp DESC, p_partkey""".stripMargin,
    "olap_q16_supplier_cnt" ->
      """SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#5'
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_suppkey % 5 = 0)
        |GROUP BY 1, 2
        |ORDER BY supplier_cnt DESC, p_brand, p_type""".stripMargin,
    "olap_q20_excess" ->
      """WITH sold AS (
        |  SELECT l_suppkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sold_qty
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE 'small%'
        |    AND l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, n_name
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE s_suppkey IN (SELECT l_suppkey FROM sold WHERE sold_qty > 300)
        |ORDER BY s_suppkey""".stripMargin,
    "olap_q21_waiting" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'),
        |late AS (SELECT DISTINCT l_orderkey, l_suppkey FROM li
        |         WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY),
        |anysupp AS (SELECT DISTINCT l_orderkey, l_suppkey FROM li),
        |waiting AS (
        |  SELECT l.l_orderkey, l.l_suppkey FROM late l
        |  WHERE EXISTS (SELECT 1 FROM anysupp a
        |                WHERE a.l_orderkey = l.l_orderkey
        |                  AND a.l_suppkey <> l.l_suppkey)
        |    AND NOT EXISTS (SELECT 1 FROM late b
        |                    WHERE b.l_orderkey = l.l_orderkey
        |                      AND b.l_suppkey <> l.l_suppkey))
        |SELECT s_suppkey, s_name, count(*) AS numwait
        |FROM waiting JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY 1, 2
        |ORDER BY numwait DESC, s_suppkey
        |LIMIT 10""".stripMargin,
    "olap_top_users_per_type" ->
      """WITH t AS (
        |  SELECT event_type, user_id, CAST(floor(sum(value) * 100) AS BIGINT) AS total_c
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT event_type, user_id, total_c,
        |         row_number() OVER (PARTITION BY event_type ORDER BY total_c DESC, user_id) AS rank
        |  FROM t)
        |SELECT event_type, user_id, total_c, rank FROM r
        |WHERE rank <= 3 ORDER BY event_type, rank""".stripMargin,
    "doc_token_stats" -> TextOps.tokenStatsOracle,
    "doc_quality" -> TextOps.qualityScoreOracle,
    "doc_langid" -> TextOps.langIdOracle,
    "doc_langid_multi" -> TextOps.langIdMultiOracle,
    "doc_langid_confusion" -> TextOps.langIdConfusionOracle,
    "doc_fingerprint" -> TextOps.fingerprintOracle,
    "doc_repetition" -> TextOps.repetitionOracle,
    "doc_sample_stratified" -> TextOps.stratifiedSampleOracle,
    "doc_tfidf" -> TextOps.tfidfOracle,
    "doc_lm_surprisal" -> TextOps.lmSurprisalOracle,
    "doc_bpe_pairs" -> TextOps.bpePairsOracle,
    "doc_bpe_train" -> TextOps.bpeTrainOracle,
    "doc_unigram_train" -> TextOps.unigramTrainOracle,
    "doc_unigram_encode" -> TextOps.unigramEncodeOracle,
    "doc_wordpiece_train" -> TextOps.wordpieceTrainOracle,
    "doc_wordpiece_encode" -> TextOps.wordpieceEncodeOracle,
    "doc_tokenizer_compare" -> TextOps.tokenizerCompareOracle,
    "doc_pack_split" -> TextOps.packSplitOracle,
    "doc_ngram_novelty" -> TextOps.ngramNoveltyOracle,
    "doc_curriculum_order" -> TextOps.curriculumOrderOracle,
    "doc_bpe_fertility" -> TextOps.bpeFertilityOracle,
    "doc_bpe_compression" -> TextOps.bpeCompressionOracle,
    "doc_bpe_encode" -> TextOps.bpeEncodeOracle,
    "doc_pack_bins_bpe" -> TextOps.packBinsBpeOracle,
    "doc_shard_plan_bpe" -> TextOps.shardPlanBpeOracle,
    "doc_train_manifest" -> TextOps.trainManifestOracle,
    "doc_train_manifest_v2" -> TextOps.trainManifestV2Oracle,
    "doc_snapshot_diff" -> TextOps.snapshotDiffOracle,
    "doc_bigram_lm" -> TextOps.bigramLmOracle,
    "doc_quality_normalized" -> TextOps.qualityNormalizedOracle,
    "doc_shard_plan" -> TextOps.shardPlanOracle,
    "doc_bm25_topk" -> TextOps.bm25TopKOracle,
    "doc_source_cap" -> TextOps.sourceCapOracle,
    "events_funnel" -> EventOps.funnelOracle,
    "events_retention" -> EventOps.retentionOracle,
    "events_json_extract" -> EventOps.jsonExtractOracle,
    "events_active_users" -> EventOps.activeUsersOracle,
    "events_attribution" -> EventOps.attributionOracle,
    "events_transitions" -> EventOps.transitionsOracle,
    "events_top_paths" -> EventOps.topPathsOracle,
    "events_assoc_lift" -> EventOps.assocLiftOracle,
    "events_markov" -> EventOps.markovOracle,
    "events_type_correlation" -> EventOps.typeCorrelationOracle,
    "events_power_users" -> EventOps.powerUsersOracle,
    "dedup_exact" -> Dedup.exactOracle,
    "dedup_ngram_jaccard" -> Dedup.ngramJaccardOracle,
    "dedup_minhash_lsh" -> Dedup.minhashLshOracle,
    "dedup_simhash" -> Dedup.simhashOracle,
    "dedup_clusters" -> Dedup.clustersOracle,
    "dedup_keep_best" -> Dedup.keepBestOracle,
    "doc_train_test_split" -> Dedup.trainTestSplitOracle,
    "doc_decontaminate" -> TextOps.decontaminateOracle,
    "doc_hot_ngrams" -> TextOps.hotNgramsOracle,
    "doc_char_diversity" -> TextOps.charDiversityOracle,
    "emb_dup_clusters" -> Dedup.semanticClustersOracle,
    "doc_vocabulary" -> TextOps.vocabularyOracle,
    "doc_chunk" -> TextOps.chunkOracle,
    "doc_pack_bins" -> TextOps.packBinsOracle,
    "emb_quantize_int8" -> Similarity.quantizeInt8Oracle,
    "emb_bitext_mine" -> Similarity.bitextMineOracle,
    "approx_distinct_hll" -> Sketches.hllDistinctUsersOracle,
    "ann_ivf_topk" -> Similarity.ivfTopKOracle,
    "emb_semdedup" -> Similarity.semDedupOracle,
    "emb_knn_graph" -> Dedup.knnGraphOracle,
    "emb_knn_triangles" -> Dedup.knnTrianglesOracle,
    "emb_cluster_quality" -> Similarity.clusterQualityOracle,
    "emb_prototype_prune" -> Similarity.prototypePruneOracle,
    "ann_mmr_rerank" -> Similarity.mmrRerankOracle,
    "dedup_emb_cosine" -> Dedup.cosinePairsBandedOracle,
    "dedup_emb_cosine_eval" -> EvalSampling.sampleOracle(Dedup.cosineBandedEvalOracle, "embeddings", "vec_id"),
    "ann_brute_topk" -> Similarity.bruteTopKOracle,
    "ann_rrf_fusion" -> Similarity.rrfFusionOracle,
    "ann_lsh_topk" -> Similarity.lshTopKOracle,
    "emb_centroids" -> Similarity.centroidsOracle,
    "emb_knn_classify" -> Similarity.knnClassifyOracle,
    "emb_hard_negatives" -> Similarity.hardNegativesOracle,
    "ts_select_groupby_tag" ->
      s"""WITH g AS (
         |  SELECT (epoch_ms(ts) // 3600000) * 3600000 AS time_ms, event_type,
         |         CAST(floor(avg(value) * 100) AS BIGINT) AS value
         |  FROM events
         |  WHERE epoch_ms(ts) >= ${FromNs / 1000000L + 1} AND epoch_ms(ts) <= ${ToNs / 1000000L - 1}
         |  GROUP BY 1, 2)
         |SELECT time_ms, 'value' AS name, value, 'event_type' AS labelname,
         |       event_type AS labelvalue, '' AS message FROM g
         |ORDER BY time_ms, name, labelname, labelvalue, message, value""".stripMargin,
    "mm_decode_features" -> Multimodal.extractFeaturesOracle,
    "mm_frame_sample" -> Multimodal.sampleFramesOracle,
    "mm_image_tiles" -> Multimodal.tileImagesOracle,
    "mm_aspect_plan" -> Multimodal.aspectPlanOracle,
    "mm_scene_cuts" -> Multimodal.sceneCutsOracle,
    "mm_decode_router" -> Multimodal.decodeRouterOracle,
    "mm_phash" -> Multimodal.phashesOracle,
    "mm_phash_dup" -> Multimodal.phashDupOracle,
    "mm_bmp_roundtrip" -> Multimodal.bmpRoundtripOracle,
    "mm_png_roundtrip" -> Multimodal.pngRoundtripOracle,
    "mm_gif_roundtrip" -> Multimodal.gifRoundtripOracle,
    "mm_jpeg_roundtrip" -> Multimodal.jpegRoundtripOracle,
    "mm_align_scores" -> Multimodal.alignScoresOracle,
    "mm_audio_phash" -> Multimodal.audioPhashesOracle,
    "mm_audio_dup" -> Multimodal.audioDupOracle,
    "mm_video_dup" -> Multimodal.videoDupOracle,
    "mm_image_classify" -> Multimodal.imageClassifyOracle,
    "mm_image_confusion" -> Multimodal.imageConfusionOracle,
    "mm_text_align" -> Multimodal.textAlignOracle,
    "mm_wav_roundtrip" -> Multimodal.wavRoundtripOracle,
    "mm_bmp_resize" -> Multimodal.bmpResizeOracle,
    "mm_wav_resample" -> Multimodal.wavResampleOracle
  )
}
