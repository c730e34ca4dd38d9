package graft.tools

import graft.pipeline.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dedup-pipeline scale probe beyond the driver testdata (dev tool):
  * the largest generated documents table is 5k rows, so the measured
  * scaling evidence for the dedup family stops far short of corpus
  * scale. This probe synthesizes documents/embeddings of ARBITRARY
  * row count with the sf-testdata shape AND a CONSTANT planted-dup
  * rate (1% near-dups with one mutated token, 1% exact dups — per
  * 100 docs, independent of n), so the candidate-pair workload grows
  * linearly with the corpus the way a real crawl's does — replicating
  * testdata rows would instead inflate pairs quadratically and fake a
  * super-linear signal. NOT for correctness (the DuckDB gate only
  * runs on driver testdata); it times the same operators at 1×/10×
  * and prints per-operator ratios. Sub-linear-to-linear ratios are
  * the evidence the banded/blocked shapes (shingle blocks, minhash
  * bands, simhash bands, hyperplane buckets, per-doc windows) survive
  * data growth; anything clearly super-linear is a regression.
  *
  * usage: PipelineScaleProbe [baseRows] [factor] [op-substring]
  * (default 100k × 10, all ops)
  */
object PipelineScaleProbe {

  private val TokensPerDoc = 40

  /** sf-shaped documents: ~40-token texts; doc_id%100==1 is a near-dup
    * of doc_id-1 (last token mutated), doc_id%100==51 an exact dup.
    * The vocabulary SCALES with the corpus (max(30, n/10) hash-derived
    * words — Heaps-law-ish), so per-shingle document frequency stays
    * O(1) as n grows, the regime a real crawl sits in. (A FIXED tiny
    * vocabulary makes shingle df grow linearly with n and stresses
    * every blocked join quadratically — that degenerate regime is what
    * exposed the correlated-permutation minhash bug and the fixed-width
    * hyperplane-band blow-up; see MinhashProfile's fixedVocab mode.) */
  private def synthDocs(spark: SparkSession, n: Long): DataFrame = {
    val vocabSize = math.max(30L, n / 10L)
    val isNear = pmod(col("doc_id"), lit(100L)) === 1L
    val isExact = pmod(col("doc_id"), lit(100L)) === 51L
    spark.range(n).select(col("id").as("doc_id"))
      .withColumn("base",
        when(isNear || isExact, col("doc_id") - 1).otherwise(col("doc_id")))
      .withColumn("toks", transform(sequence(lit(1), lit(TokensPerDoc)),
        i => concat(lit("w"), pmod(xxhash64(col("base"), i), lit(vocabSize)))))
      .withColumn("toks", when(isNear,
          concat(slice(col("toks"), 1, TokensPerDoc - 1), array(lit("mutant"))))
        .otherwise(col("toks")))
      .withColumn("text", array_join(col("toks"), " "))
      .select(col("doc_id"), col("text"),
        element_at(array(lit("en"), lit("de"), lit("fr"), lit("es"), lit("zh")),
          (pmod(col("doc_id"), lit(5L)) + 1).cast("int")).as("lang"),
        element_at(array(lit("web"), lit("books"), lit("code")),
          (pmod(col("doc_id"), lit(3L)) + 1).cast("int")).as("source"),
        length(col("text")).as("n_chars"))
  }

  /** sf-shaped events: ~20 events/user over a 30-day window. */
  private def synthEvents(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(
      col("id").as("event_id"),
      (col("id") / 20L).cast("long").as("user_id"),
      element_at(array(lit("view"), lit("click"), lit("purchase"),
        lit("signup"), lit("error")), (pmod(xxhash64(col("id")), lit(5L)) + 1)
        .cast("int")).as("event_type"),
      (pmod(xxhash64(col("id"), lit(7L)), lit(30L * 86400000000000L)))
        .as("ts_ns"))

  /** sf-shaped embeddings: 64-dim floats in [-1, 1] from a hash stream;
    * vec_id%100==1 is an exact copy of vec_id-1 (cosine 1.0). */
  private def synthEmb(spark: SparkSession, n: Long): DataFrame = {
    val isDup = pmod(col("vec_id"), lit(100L)) === 1L
    spark.range(n).select(col("id").as("vec_id"))
      .withColumn("base", when(isDup, col("vec_id") - 1).otherwise(col("vec_id")))
      .select(col("vec_id"),
        transform(sequence(lit(1), lit(64)),
          d => ((pmod(xxhash64(col("base"), d), lit(2001L)) - 1000L) / 1000.0)
            .cast("float")).as("embedding"),
        pmod(col("vec_id"), lit(8L)).cast("int").as("label"))
  }

  /** Timed reps per point (min taken). SPARK_PROBE_REPS=0 → ONE COLD
    * build, no untimed warmup: the disk-bounded mode for the largest
    * decade points, where warmup+2 reps triples transient shuffle
    * footprint and a 124M-position build alone is tens of GB (round-11:
    * the ×100 sa_depth point filled /tmp under the default mode).
    * Cold mode carries Janino compile (~seconds) inside the
    * measurement — negligible at the hundreds-of-seconds scale the mode
    * exists for, and stated alongside any number it produces. */
  private val Reps: Int =
    sys.env.getOrElse("SPARK_PROBE_REPS", "2").toInt

  private def time(body: => Long): (Double, Long) = {
    if (Reps <= 0) {
      graft.util.Memo.clear()
      System.gc()
      val t0 = System.nanoTime()
      val rows = body
      return ((System.nanoTime() - t0) / 1e9, rows)
    }
    var rows = body // untimed warmup (Janino + shuffle files)
    val t = (1 to Reps).map { _ =>
      // the probe measures the BUILD's scaling — memoized artifacts
      // (IVF clustering, kNN graph, BPE vocab) must be rebuilt per run,
      // not served from the cross-entry cache
      graft.util.Memo.clear()
      System.gc()
      val t0 = System.nanoTime()
      rows = body
      (System.nanoTime() - t0) / 1e9
    }.min
    (t, rows)
  }

  def main(args: Array[String]): Unit = {
    val base = if (args.length > 0) args(0).toLong else 100000L
    val factor = if (args.length > 1) args(1).toLong else 10L
    val opFilter = if (args.length > 2) Some(args(2)) else None
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val ops: Seq[(String, Long => Long)] = Seq(
      "dedup_exact" -> (n => Dedup.exact(synthDocs(spark, n)).count()),
      "minhash_lsh" -> (n => Dedup.minhashLsh(synthDocs(spark, n)).count()),
      "simhash" -> (n => Dedup.simhash(synthDocs(spark, n)).count()),
      "dup_spans" -> (n => Dedup.dupSpans(synthDocs(spark, n)).count()),
      // band width sized to the corpus (log2(n/occupancy)): the fixed
      // oracle-scale 8-bit default degenerates quadratically here —
      // ~10^10 candidate pairs at 1M random vectors (measured; that run
      // was killed, and the scaling law is now documented on the operator)
      "emb_banded" -> (n =>
        Dedup.cosinePairsBanded(synthEmb(spark, n), Dedup.bandBitsFor(n)).count()),
      // round-5 session additions: histogram/sketch-shaped operators whose
      // claim is sub-linear pairwise work — measure it, don't assert it
      "soft_weights" -> (n => Dedup.softDedupWeights(synthDocs(spark, n)).count()),
      "theta_overlap" -> (n =>
        graft.pipeline.Sketches.thetaSourceOps(synthDocs(spark, n)).count()),
      "unimax" -> (n => graft.pipeline.TextOps.unimaxAlloc(synthDocs(spark, n)).count()),
      "ccnet" -> (n => graft.pipeline.TextOps.ccnetBuckets(synthDocs(spark, n)).count()),
      "survival_km" -> (n =>
        graft.pipeline.EventOps.survivalKm(synthEvents(spark, n)).count()),
      "line_dedup" -> (n => Dedup.lineDedup(synthDocs(spark, n)).count()),
      "cusum" -> (n =>
        graft.pipeline.EventOps.cusumChangepoint(
          synthEvents(spark, n).withColumn("ts_ms", expr("ts_ns div 1000000"))).count()),
      "knn_triangles" -> (n =>
        Dedup.knnTriangles(synthEmb(spark, n), Dedup.bandBitsFor(n)).count()),
      // claim: corpus collapses to the vocab FIRST, rounds are vocab-bounded
      "bpe_train" -> (n => graft.pipeline.TextOps.bpeTrain(synthDocs(spark, n)).count()),
      // round-7: tokenizer APPLICATION (vocab-bounded merge application +
      // one corpus equi-join) and variable-length span extents (stride-1
      // window rows — the linear suffix-array cost class)
      "bpe_encode" -> (n => graft.pipeline.TextOps.bpeEncode(synthDocs(spark, n)).count()),
      "dup_spans_var" -> (n => Dedup.dupSpansVar(synthDocs(spark, n)).count()),
      "bigram_lm" -> (n => graft.pipeline.TextOps.bigramLm(synthDocs(spark, n)).count()),
      "window_funnel" -> (n =>
        graft.pipeline.EventOps.windowFunnel(synthEvents(spark, n)).count()),
      // synth vocab is w<N> — pass a matching query so scoring is exercised
      "bm25" -> (n => graft.pipeline.TextOps.bm25TopK(synthDocs(spark, n),
        Seq("w1", "w2", "w3", "w4", "w5")).count()),
      "shard_plan" -> (n => graft.pipeline.TextOps.shardPlan(synthDocs(spark, n)).count()),
      "mad_outliers" -> (n =>
        graft.pipeline.EventOps.madOutliers(
          synthEvents(spark, n).withColumn("ts_ms", expr("ts_ns div 1000000"))).count()),
      // round-6: URL dedup (one hash aggregate) and the trained quality
      // classifier (9 full-corpus aggregate passes + scoring) — the GD
      // loop is the main fixed-pass-count suspect at scale
      "url_dedup" -> (n =>
        graft.pipeline.UrlOps.urlDedup(synthDocs(spark, n)).count()),
      "quality_train" -> (n =>
        graft.pipeline.TextOps.qualityTrainedScores(synthDocs(spark, n)).count()),
      "curation_full" -> (n =>
        graft.pipeline.TextOps.curationFull(synthDocs(spark, n)).count()),
      // round-7 capstone: curation -> tokenizer trained on the curated
      // split -> encode -> shard manifest (GD passes + vocab-bounded
      // merge rounds + one corpus equi-join — fixed pass count end to
      // end). The synth word-soup has no stopwords, so the Gopher stage
      // would reject every doc and the probe would measure an empty
      // pipeline — prepend a stopword preamble so docs survive curation.
      "train_manifest" -> (n =>
        graft.pipeline.TextOps.trainManifest(
          synthDocs(spark, n).withColumn("text",
            concat(lit("the of and is in to it was "), col("text")))).count()),
      // round-6: the ANN index builds (fixed NumQueries, corpus-sized
      // index side) — codebook-training assignment passes are the most
      // likely super-linear suspects, so measure them a decade up
      "ann_ivf" -> (n =>
        graft.pipeline.Similarity.ivfTopK(synthEmb(spark, n)).count()),
      "ann_pq" -> (n =>
        graft.pipeline.Similarity.pqTopK(synthEmb(spark, n)).count()),
      "ann_ivfpq" -> (n =>
        graft.pipeline.Similarity.ivfpqTopK(synthEmb(spark, n)).count()),
      "ann_lsh" -> (n =>
        graft.pipeline.Similarity.lshTopK(synthEmb(spark, n)).count()),
      "ann_hamming" -> (n =>
        graft.pipeline.Similarity.hammingTopK(synthEmb(spark, n)).count()),
      // round-7: graph-traversal ANN — graph build + fixed-hop beam walk;
      // band width sized to the corpus like every banded operator
      "ann_graph" -> (n =>
        graft.pipeline.Similarity.graphTopK(synthEmb(spark, n),
          Dedup.bandBitsFor(n)).count()),
      // diverse payloads (hash hex), NOT synthDocs: near-constant word-soup
      // corpora collapse every doc into a handful of phash buckets and the
      // band join degenerates quadratically — the generic LSH skew law;
      // real media bytes are high-entropy, which this models
      "phash_dup" -> (n => graft.pipeline.Multimodal.phashDup(
        spark.range(n).select(
          col("id").as("media_id"), lit("image").as("kind"),
          encode(concat((0 until 8).map(k =>
            hex(xxhash64(col("id"), lit(k)))): _*), "UTF-8").as("payload"),
          lit(64).as("width"), lit(64).as("height"))).count()),
      // round-8: trained language ID (linear trigram explode + bounded
      // profile), span REMOVAL (linear token rows + per-doc filter), PNG
      // codec round-trip (embarrassingly parallel decode), cross-modal
      // alignment (two equi-joins), audio envelope dedup (banded join)
      "langid_multi" -> (n =>
        graft.pipeline.TextOps.langIdMulti(synthDocs(spark, n)).count()),
      "spans_removed" -> (n => Dedup.removeSpans(synthDocs(spark, n)).count()),
      "png_roundtrip" -> (n =>
        graft.pipeline.Multimodal.pngRoundtrip(synthDocs(spark, n)).count()),
      "text_align" -> (n =>
        graft.pipeline.Multimodal.textAlign(
          synthEmb(spark, n), synthDocs(spark, n)).count()),
      // high-entropy clip text (hash hex), NOT synthDocs — measured: the
      // word-soup's "wNN " period-4 byte rhythm aligns with the 4-sample
      // energy window and collapses envelope hashes into a handful of
      // buckets (x106 for x10 at 1M clips — the generic LSH skew law the
      // phash_dup probe documents); real audio bytes are high-entropy
      "audio_dup" -> (n => graft.pipeline.Multimodal.audioDup(
        graft.pipeline.Multimodal.audioDupFromDocs(
          spark.range(n).select(col("id").as("doc_id"),
            concat_ws(" ", (0 until 8).map(k =>
              hex(xxhash64(col("id"), lit(k)))): _*).as("text"),
            pmod(xxhash64(col("id")), lit(1000L)).as("n_chars")))).count()),
      // round-9: the two remaining tokenizer families (claims: corpus
      // collapses to the vocab first; EM / merge rounds are vocab-bounded;
      // encode = one corpus equi-join) and the capstone with embedding
      // gates (fixed stage count, each stage already probed)
      "unigram_train" -> (n =>
        graft.pipeline.TextOps.unigramTrain(synthDocs(spark, n)).count()),
      "wordpiece_train" -> (n =>
        graft.pipeline.TextOps.wordpieceTrain(synthDocs(spark, n)).count()),
      "wordpiece_encode" -> (n =>
        graft.pipeline.TextOps.wordpieceEncode(synthDocs(spark, n)).count()),
      "jpeg_roundtrip" -> (n =>
        graft.pipeline.Multimodal.jpegRoundtrip(synthDocs(spark, n)).count()),
      // high-entropy clip text like audio_dup (frame fingerprints are
      // exact pixel hashes — a word-soup corpus would plant cross-doc
      // frame collisions the skew law already documents)
      "video_dup" -> (n => graft.pipeline.Multimodal.videoDup(
        spark.range(n).select(col("id").as("doc_id"),
          concat_ws(" ", (0 until 8).map(k =>
            hex(xxhash64(col("id"), lit(k)))): _*).as("text"),
          pmod(xxhash64(col("id")), lit(1000L)).as("n_chars"))).count()),
      // round-9 session 2: two-phase prefix-sum packing (claims: the
      // global running sum never runs on one partition), the novelty
      // rollup (one gram-keyed hash aggregate), and the three-core
      // fertility report (bounded by the slowest tokenizer training)
      "pack_split" -> (n =>
        graft.pipeline.TextOps.packSplit(synthDocs(spark, n)).count()),
      "ngram_novelty" -> (n =>
        graft.pipeline.TextOps.ngramNovelty(synthDocs(spark, n)).count()),
      "tok_compare" -> (n =>
        graft.pipeline.TextOps.tokenizerCompare(synthDocs(spark, n)).count()),
      // decode pass + bounded histogram aggregate + broadcast profile —
      // the langid cost shape on the pixel domain
      "image_classify" -> (n =>
        graft.pipeline.Multimodal.imageClassify(synthDocs(spark, n)).count()),
      // surprisal scoring + the two-phase global rank (claim: the global
      // row_number never lands on one partition)
      "curriculum" -> (n =>
        graft.pipeline.TextOps.curriculumOrder(synthDocs(spark, n)).count()),
      // round-9 session 3: star CC (claims: rounds stay ~log despite the
      // fixed 500-hop planted diameter; per-round work edge-bounded),
      // one-projection extraction, one-aggregate DP release, linear gram
      // pass + dimension-sized driver iteration, and the three-layout
      // two-phase global rank
      "cc_star" -> (n => Dedup.ccStar(synthDocs(spark, n)).count()),
      // suffix ranks: 3 global-rank rounds, int-pair shuffle keys; the
      // claim is rounds stay FIXED while per-round work is linear
      "suffix_ranks" -> (n =>
        graft.pipeline.SuffixOps.suffixRanks(synthDocs(spark, n)).count()),
      // round-10 flagship: the LCP/depth layer (3 dense ranks + the
      // adjacent-rank greedy descent) — the cost class must stay the
      // suffix_ranks one (sorts of the position relation), not the
      // pair-relation's square
      "sa_depth" -> (n =>
        graft.pipeline.SuffixOps.saDepthRows(
          Dedup.plantSpans(synthDocs(spark, n))).count()),
      "mixture_sample" -> (n =>
        graft.pipeline.TextOps.mixtureSample(synthDocs(spark, n)).count()),
      // NOT .count(): a pure projection prunes to nothing under count —
      // the aggregate forces every page through the extractor
      "html_extract" -> (n =>
        graft.pipeline.Extract.htmlExtract(synthDocs(spark, n))
          .agg(sum("kept_words")).head().getLong(0)),
      "dp_release" -> (n =>
        graft.pipeline.Privacy.dpRelease(synthDocs(spark, n)).count()),
      "pca_project" -> (n =>
        graft.pipeline.Similarity.pcaProject(synthEmb(spark, n)).count()),
      "zorder_prune" -> { n =>
        val (pk, sk) = (math.max(n / 30, 100L), math.max(n / 600, 10L))
        graft.pipeline.LayoutOps.zorderPrune(spark.range(n).select(
          col("id").as("l_orderkey"), lit(1).as("l_linenumber"),
          pmod(xxhash64(col("id"), lit(1L)), lit(pk)).as("l_partkey"),
          pmod(xxhash64(col("id"), lit(2L)), lit(sk)).as("l_suppkey"))).count()
      })
      // trainManifestV2 is deliberately NOT probed here (no silent caps:
      // this is a documented drop, not coverage): the composition is a
      // fixed stage count of individually-probed operators, but its
      // embedding gates (semDedup, semanticDecontaminate) run with the
      // testdata-sized k / band bits — at 1M synthetic vectors the
      // within-cluster pair stage degenerates exactly as the SemDeDup
      // cost model predicts when k is NOT scaled with the corpus (k must
      // grow to hold n/k fixed; see the operator's scale note). Probing
      // it un-rescaled would measure that documented degeneracy, not the
      // composition.

    val rows = ops.filter(o =>
      opFilter.forall(_.split(",").exists(o._1.contains))).map { case (name, op) =>
      // factor 1 = SINGLE-POINT mode (one size, one JVM): decade curves
      // whose large point is disk-bounded run each point in its own
      // process instead of tripling transient shuffle footprint here
      val (ts, rs) = time(op(base))
      if (factor == 1) {
        println(f"[probe] $name%-12s ${base}%8d rows ${ts}%7.2fs ($rs%d pairs)   single-point")
        (ts, ts)
      } else {
        val (tb, rb) = time(op(base * factor))
        println(f"[probe] $name%-12s ${base}%8d rows ${ts}%7.2fs ($rs%d pairs)   " +
          f"${base * factor}%9d rows ${tb}%7.2fs ($rb%d pairs)   x${tb / ts}%.2f")
        (ts, tb)
      }
    }
    val (sSum, bSum) = (rows.map(_._1).sum, rows.map(_._2).sum)
    println(f"[probe] TOTAL ${sSum}%7.2fs -> ${bSum}%7.2fs  x${bSum / sSum}%.2f for x$factor data")
    spark.stop()
  }
}
