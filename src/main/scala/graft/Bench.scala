package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup at the smallest SF (untimed): cold-run cost is
    // dominated by Janino compilation of the generated stages, which a
    // long-lived cluster pays once — measure plan cost, not JIT.
    val warmDir = "/root/testdata/sf0.001"
    // warmup failures are logged (first per query) — a query broken at
    // warmup-SF only must not vanish silently (round-4 verdict item 6)
    val warmFailed = scala.collection.mutable.Set[String]()
    def warm(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
             dir: String): Unit =
      try { fn(spark, dir).count(); () } catch { case e: Throwable =>
        if (warmFailed.add(name)) System.err.println(
          s"[bench] warmup $name FAILED at $dir: ${e.getClass.getSimpleName}: " +
            String.valueOf(e.getMessage).take(200))
      }
    SparkEntry.queries.foreach { case (name, fn) => warm(name, fn, warmDir) }
    // The heavy dedup queries get one untimed pass at the TARGET SF too:
    // AQE picks different physical joins at sf0.1 than sf0.001 (size
    // thresholds), so their codegen stages would otherwise Janino-compile
    // inside the first timed run — steady-state cost is what a long-lived
    // cluster pays, and what we want to measure.
    Seq("dedup_keep_best", "dedup_minhash_lsh", "dedup_ngram_jaccard",
        "dedup_clusters", "dedup_simhash").foreach { q =>
      SparkEntry.queries.get(q).foreach(fn => warm(q, fn, sfDir))
    }
    // A query that crashes must NOT report its time-to-crash as if it were a
    // query time (round-3 postmortem): failures surface in an "errors" field
    // and as -1 in the per-query map, and are excluded from the total.
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // ---- shared-artifact build phase (round-7) ----
    // Trained structures consumed by multiple entries (ANN method top-Ks,
    // the full-corpus IVF clustering, the BPE merge table) build exactly
    // once per run, TIMED here and counted once in the total — the
    // consuming entries below then measure steady-state cost against the
    // shared artifact instead of re-paying (or min-of-2-erasing) the
    // training inside whichever entry happens to run first. Single run,
    // no min-of-2: a build happens once per deployment, cache-cold.
    //
    // r11 measurement fix (declared in OPTIMIZATION_r11.md): builds run
    // SEQUENTIALLY. Round 7 overlapped them on a 4-thread pool while
    // still summing per-build times into the total — but with 12 heavy
    // builds the concurrent builds contend for the same 32 cores and
    // each build's measured time includes the others' load (measured at
    // r11 head: the suffix family read 60.5 s contended vs 45.7 s
    // isolated, same code). Sequential runs give each build the whole
    // scheduler, so the summed total is a sum of ISOLATED costs — the
    // number a deployment actually pays per build — at the price of a
    // longer bench wall-clock. shared_build_wall stays reported; builds
    // that share a memoized prefix (the suffix-level chain) run in
    // dependency-friendly declaration order, so each slot times its own
    // increment exactly like before.
    System.gc()
    val sharedWall0 = System.nanoTime()
    val sharedTimes: Seq[(String, Double)] = SparkEntry.sharedBuilds.map {
      case (name, fn) =>
        System.gc()
        val t0 = System.nanoTime()
        val t = try { fn(spark, sfDir); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          errors.getOrElseUpdate(name,
            s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
          -1.0
        }
        name -> t
    }
    val sharedWall = (System.nanoTime() - sharedWall0) / 1e9
    val results = SparkEntry.queries.map { case (name, fn) =>
      // min of two runs: this microVM throttles bursty CPU, and a single
      // sample can read 2-3x high through no fault of the plan — the min
      // is the plan's cost. System.gc() before each run lets the
      // ContextCleaner drop stale broadcasts/shuffles from prior queries
      // (they pile up across ~150 executions in this one JVM and GC
      // pauses land inside whichever query runs next); outside the timed
      // section.
      val t = (1 to 2).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          errors.getOrElseUpdate(name,
            s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
          -1.0
        }
      }.min
      name -> t
    }
    // ---- engine-store partition pruning (round-4 verdict item 7) ----
    // Every ts_* entry reads the in-memory adapter catalog; the layout a
    // deployment actually queries is the hour-partitioned store the engine
    // WRITES. Load the target SF's events once (untimed — a store ingests
    // once, queries many times), then time a 1-hour-window query THROUGH
    // the engine: partition pruning on hour= is what pays here.
    val (storeTime, storeZTime): (Double, Double) =
      try {
        import spark.implicits._
        val storeRoot = java.nio.file.Files.createTempDirectory("graft-bench-store").toString
        val engine = new graft.api.GraftEngine(spark, storeRoot, () => SparkEntry.NowMs)
        engine.writeLines("bench", graft.sources.EventsAdapter.asLineProtocol(
          graft.sources.EventsAdapter.events(spark, sfDir)).as[String])
        // absolute 1-hour window inside the events range (the table spans
        // Jan 2024): pruning must cut the ~720 hour= partitions to 1-2
        val q = """SELECT mean("value") FROM "events" WHERE time >= '2024-01-15 00:00:00' AND time < '2024-01-15 01:00:00' GROUP BY time(5m)"""
        engine.query("bench", q) // untimed Janino warmup
        val t1 = (1 to 2).map { _ =>
          System.gc()
          val t0 = System.nanoTime()
          engine.query("bench", q)
          (System.nanoTime() - t0) / 1e9
        }.min
        // store_zorder_live (round-9 verdict item 5): z-order compaction is
        // a maintenance pass (untimed, like the ingest above); the timed
        // part is the SAME query over the live Morton layout — comparable
        // to store_hour_prune's number directly.
        val zt =
          try {
            engine.compactClustered("bench",
              graft.sources.EventsAdapter.Measurement, files = 8, zorder = true)
            engine.query("bench", q) // warm the new file listing
            (1 to 2).map { _ =>
              System.gc()
              val t0 = System.nanoTime()
              engine.query("bench", q)
              (System.nanoTime() - t0) / 1e9
            }.min
          } catch { case e: Throwable =>
            errors.getOrElseUpdate("store_zorder_live",
              s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
            -1.0
          }
        (t1, zt)
      } catch { case e: Throwable =>
        errors.getOrElseUpdate("store_hour_prune",
          s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
        (-1.0, -1.0)
      }

    // The driver keeps only a bounded tail of stdout; a per-query map over
    // all ~80 entries overflows it and the JSON line gets truncated
    // (BENCH_r02 parsed:null). Report the headline subset — one per operator
    // family — rounded to ms; "value" still totals EVERY query.
    val headline = Seq(
      "ts_select_mean_1m", "ts_select_sum_1h", "ts_select_p95_1h",
      "ts_select_groupby_tag", "ts_select_fill_linear", "ts_select_subquery",
      "ts_select_multi_metric", "ts_select_raw", "ts_select_string_count_1h",
      "ts_select_regex_from", "ts_difference_1h", "ts_moving_avg_1h",
      "ts_asof_prior_view", "ts_sessionize",
      "olap_pricing_summary", "olap_q3_topn", "olap_q5_revenue",
      "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
      "dedup_ngram_jaccard", "dedup_clusters", "dedup_keep_best",
      "dedup_emb_cosine", "ann_brute_topk", "ann_lsh_topk", "ann_ivf_topk",
      "emb_centroids", "emb_knn_classify", "approx_distinct_hll",
      "doc_token_stats", "doc_quality", "doc_langid", "doc_fingerprint",
      "doc_pack_bins", "mm_decode_features", "ingest_lp_roundtrip",
      // round 3 families
      "doc_decontaminate", "doc_hot_ngrams", "doc_char_diversity",
      "sketch_cms_heavy", "sketch_bloom_probe", "events_active_users",
      "events_attribution", "events_funnel", "ts_select_tz_day",
      "ts_select_fn_ema", "ts_select_sample", "emb_dup_clusters",
      "emb_matryoshka", "mm_audio_windows", "olap_q10_returns",
      "olap_running_revenue", "ann_pq_topk", "events_power_users",
      // round-3 additions
      "emb_binary_quant", "ann_hamming_topk", "sketch_kmv_jaccard",
      "events_streaks", "events_bursts", "events_rfm",
      "events_time_to_convert", "doc_gopher_filters", "dedup_containment",
      "olap_q18_large_orders", "ts_select_fn_rsi", "ts_select_fn_cmo",
      "ts_select_fn_dema", "ts_select_fn_ker", "ts_select_top_tag",
      "olap_q12_priority", "doc_mixture_weights",
      "olap_q7_volume", "olap_q8_market_share", "olap_q13_custdist",
      "olap_q15_top_supplier", "olap_q17_small_qty", "olap_q22_dormant",
      "dedup_passage", "events_anomaly_days", "ts_select_cast",
      "ts_select_fn_tema", "ts_select_fn_kama", "olap_q2_min_cost",
      "olap_q9_profit", "olap_q21_waiting", "olap_q16_supplier_cnt",
      // round-4 additions
      "events_topk_heap", "doc_bpe_pairs", "doc_source_cap",
      "emb_bitext_mine", "sketch_hist_quantiles", "doc_lm_surprisal",
      "ts_state_count", "ts_select_fn_holt_fit", "ts_select_math_trig",
      "ts_select_fill_number", "ts_select_arith_fields",
      "dedup_corpus_report", "events_markov", "events_type_correlation",
      "ts_increase_1h", "ts_select_mean_1w", "ts_select_arith_1h",
      "dedup_simhash_eval", "ts_asof_tolerance",
      // round-4 (current) additions
      "dedup_emb_cosine_eval", "ts_select_math_log", "emb_hard_negatives",
      "doc_pii_scrub",
      // round-5 additions
      "emb_semdedup", "doc_dup_spans", "doc_dsir_weights", "doc_winnowing",
      "events_ab_lift", "olap_rollup_revenue", "emb_knn_graph",
      "emb_cluster_quality", "events_ltv_cohort", "dedup_source_overlap",
      "emb_gram_matrix",
      // round-5 (current session) additions
      "doc_quality_classifier", "doc_cdc_chunks", "emb_centroid_classify",
      "events_top_paths", "emb_pagerank", "doc_dsir_resample",
      "mm_aspect_plan", "events_assoc_lift", "doc_corpus_zipf",
      "dedup_minhash_est_eval", "ann_ranking_metrics", "emb_prototype_prune",
      "ann_mmr_rerank", "dedup_soft_weights", "doc_unimax_alloc",
      "ann_ivfpq_topk", "mm_scene_cuts", "sketch_theta_overlap",
      "doc_ccnet_buckets", "events_survival_km",
      // round-5 session-4 additions
      "events_cusum", "doc_line_dedup", "emb_knn_triangles",
      "emb_rp_project", "doc_bpe_train", "mm_phash", "mm_phash_dup",
      "emb_calibration", "doc_snapshot_diff", "events_window_funnel",
      "doc_bigram_lm", "doc_quality_normalized", "doc_bpe_compression",
      "events_mad_outliers", "doc_shard_plan", "ann_filtered_topk",
      "doc_bm25_topk",
      // round-7 additions
      "ann_graph_topk", "doc_bpe_encode", "doc_pack_bins_bpe",
      "doc_shard_plan_bpe", "doc_dup_spans_var", "mm_frame_sample",
      // round-8 additions
      "doc_langid_multi", "doc_dup_spans_removed", "mm_png_roundtrip",
      "mm_text_align", "mm_audio_dup", "mm_decode_router",
      "mm_gif_roundtrip", "doc_gopher_repetition", "doc_bpe_fertility",
      // round-9 additions
      "mm_jpeg_roundtrip", "doc_train_manifest_v2",
      "doc_unigram_train", "doc_unigram_encode",
      "doc_wordpiece_train", "doc_wordpiece_encode", "mm_video_dup",
      "doc_tokenizer_compare", "doc_pack_split", "doc_ngram_novelty",
      "mm_image_classify", "mm_image_confusion", "ann_rrf_fusion",
      "doc_curriculum_order", "dedup_lsh_sweep")
    val qs = (headline.flatMap(k => results.get(k).map(v => f""""$k":$v%.3f""")) ++
      sharedTimes.map { case (k, v) => f""""$k":$v%.3f""" } :+
      f""""shared_build_wall":$sharedWall%.3f""" :+
      f""""store_hour_prune":$storeTime%.3f""" :+
      f""""store_zorder_live":$storeZTime%.3f""").mkString("{", ",", "}")
    val total = (results.values.filter(_ >= 0) ++
      sharedTimes.map(_._2).filter(_ >= 0) ++
      Seq(storeTime, storeZTime).filter(_ >= 0)).sum
    val errField =
      if (errors.isEmpty) """"errors":0"""
      else s""""errors":${errors.size},"error_queries":${errors.keys.map(k => s""""$k"""").mkString("[", ",", "]")}"""
    // ---- protocol self-labeling (round-9 verdict item 4) ----
    // A bench record is only comparable under the pinned protocol (16g
    // driver, no JVM outside this process' own ancestry — an idle sbt
    // launcher parent is part of the protocol; a CONCURRENT sbt compiling
    // in another tree is exactly the round-9 contamination). Stamp the
    // run's actual environment and source SHA into the artifact so the
    // gates can tell "drifted environment" from "regressed code" and
    // stale-prev two-run comparisons can be detected, instead of either
    // failing on both or silently masking real regressions.
    val driverMemGb = Runtime.getRuntime.maxMemory / (1024.0 * 1024 * 1024)
    val siblingJvms: Int = try {
      val anc = scala.collection.mutable.Set[Long]()
      var h = ProcessHandle.current()
      anc += h.pid()
      while (h.parent().isPresent) { h = h.parent().get(); anc += h.pid() }
      new java.io.File("/proc").listFiles().count { f =>
        f.getName.forall(_.isDigit) && !anc.contains(f.getName.toLong) && {
          try new String(java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(f.getPath, "cmdline")))
            .takeWhile(_ != '\u0000').endsWith("java") // argv[0] is NUL-terminated
          catch { case _: Throwable => false }
        }
      }
    } catch { case _: Throwable => -1 }
    // Loose ref first; PACKED refs (post-`git gc`/clone) fall back to
    // .git/packed-refs, so a packed HEAD never degrades to "unknown" —
    // bench_gate treats unknown as a SHA mismatch, but silently re-arming
    // two-run confirmation against a stale prev via unknown==unknown was
    // exactly the masking the SHA check exists to prevent (round-10 advice).
    val gitSha: String = try {
      val gitDir = java.nio.file.Paths.get(".git")
      val head = new String(java.nio.file.Files.readAllBytes(gitDir.resolve("HEAD"))).trim
      if (head.startsWith("ref: ")) {
        val ref = head.drop(5)
        val loose = gitDir.resolve(ref)
        if (java.nio.file.Files.exists(loose))
          new String(java.nio.file.Files.readAllBytes(loose)).trim.take(12)
        else {
          val packed = new String(java.nio.file.Files.readAllBytes(
            gitDir.resolve("packed-refs")))
          packed.linesIterator
            .find(l => !l.startsWith("#") && !l.startsWith("^") && l.endsWith(" " + ref))
            .map(_.take(12)).getOrElse("unknown")
        }
      } else head.take(12)
    } catch { case _: Throwable => "unknown" }
    val protocolOk = driverMemGb >= 12.0 && siblingJvms == 0
    val protoField =
      f""""protocol":{"driver_mem_gb":$driverMemGb%.1f,"sibling_jvms":$siblingJvms,"git_sha":"$gitSha","ok":$protocolOk}"""
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir",$errField,$protoField}""")
    // The stdout line is tail-truncated by the driver (BENCH_r05 kept only
    // the last 73 of 239 timings), so the COMPLETE per-query record — every
    // entry, not the headline subset — is additionally written as a repo
    // artifact (round-5 verdict item 1). Path overridable for local runs.
    val fullQs = (results.toSeq ++ sharedTimes
        :+ ("store_hour_prune" -> storeTime) :+ ("store_zorder_live" -> storeZTime))
      .map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$fullQs,"sf":"$sfDir",$errField,$protoField}%n"""
        .getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}") }
    errors.foreach { case (k, v) => System.err.println(s"[bench] $k FAILED: $v") }
    spark.stop()
  }
}
