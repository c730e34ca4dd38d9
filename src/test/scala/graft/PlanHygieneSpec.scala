package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression tests for the properties that decide 100 TB
  * behavior: column pruning reaching the parquet scan, predicate
  * pushdown, broadcast joins for dimension sides, whole-stage codegen in
  * hot paths, and absence of cartesian products. A plan that silently
  * loses one of these still passes the correctness gate — these pin it. */
class PlanHygieneSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("column pruning: text ops read only (doc_id, text), not all 5 columns") {
    // When another suite cached the table in this shared JVM, pruning
    // happens at the InMemoryTableScan (the cache's own build FileScan
    // legitimately reads every column); otherwise it must reach the
    // parquet ReadSchema.
    val p = plan("doc_token_stats")
    val imts = p.linesIterator.filter(_.contains("InMemoryTableScan")).toSeq
    val scans =
      if (imts.nonEmpty) imts
      else p.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(scans.nonEmpty, p)
    scans.foreach { l =>
      assert(!l.contains("lang") && !l.contains("source"),
        s"unused document columns must be pruned from the scan: $l")
    }
  }

  test("aspect plan: metadata-only — the payload/text column never reaches the scan") {
    // the multimodal batching claim: width/height metadata drive the
    // whole plan, the opaque blob (derived from `text`) is pruned out
    val p = plan("mm_aspect_plan")
    val scans = p.linesIterator.filter(l =>
      l.contains("ReadSchema") || l.contains("InMemoryTableScan")).toSeq
    assert(scans.nonEmpty, p)
    scans.foreach(l => assert(!l.contains("text"),
      s"payload source column must be pruned from the scan: $l"))
  }

  test("cross-modal alignment: partner/doc joins stay equi — no cartesian, no NLJ") {
    // the caption-swap partner lookup and the source attribution are
    // both equi-joins; nothing here may degenerate to all-pairs
    Seq("mm_align_scores", "mm_text_align").foreach { e =>
      val p = plan(e)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
    }
  }

  test("round-9 entries: html extract shuffle-free; zorder/dp/pca joins stay sane") {
    // html extraction is ONE projection — no Exchange except the
    // trailing presentation sort, no join of any kind
    val hx = graft.pipeline.Extract.htmlExtract(
      spark.read.parquet(s"$dir/documents.parquet"))
      .queryExecution.executedPlan.toString
    val hxCore = hx.linesIterator.filterNot(_.contains("rangepartitioning")).mkString("\n")
    assert(!hxCore.contains("ExchangeHash"), hx)
    assert(!hx.contains("Join"), hx)
    // dp release: the domain cross join is catalog² and the noise
    // threshold scan is a literal array — no corpus-sized cartesian
    // (the tiny domain crossJoin is the accepted 1-row-class shape),
    // counts aggregate is hash-based (map-side combinable)
    val dp = plan("doc_dp_release")
    assert(dp.contains("HashAggregate"), dp)
    // pca projection: the eigenvector rides as a LITERAL array into one
    // map pass + hash aggregate — no join at all
    val pj = graft.pipeline.Similarity.pcaProject(
      spark.read.parquet(s"$dir/embeddings.parquet"))
      .queryExecution.executedPlan.toString
    assert(!pj.contains("Join"), pj)
    // zorder: the scalar min/max and matched sides broadcast; no NLJ
    // beyond the two 1-row broadcast scalar joins
    val zo = plan("store_zorder_prune")
    assert(!zo.contains("CartesianProduct"), zo)
  }

  test("session-6 entries: rp_project shuffle-free, triangle/line-dedup joins stay equi") {
    // rp projection is ONE map pass: no Exchange anywhere in the plan
    // (the trailing global orderBy is the entry's presentation sort —
    // assert on the projection itself)
    val rp = graft.pipeline.Similarity.rpProject(
      spark.read.parquet(s"$dir/embeddings.parquet"))
      .queryExecution.executedPlan.toString
    val rpCore = rp.linesIterator.filterNot(_.contains("rangepartitioning")).mkString("\n")
    assert(!rpCore.contains("ExchangeHash"), rp)
    assert(!rp.contains("CartesianProduct"), rp)
    // triangle enumeration: wedge + closure joins are equi-joins, never
    // cartesian / broadcast NLJ
    val tr = plan("emb_knn_triangles")
    assert(!tr.contains("CartesianProduct") && !tr.contains("BroadcastNestedLoop"), tr)
    // line dedup: dup detection + canonical pick ride ONE hash-partition
    // window on the segment hash (two window functions, one Exchange for h)
    val ld = plan("doc_line_dedup")
    assert(!ld.contains("CartesianProduct"), ld)
    assert(ld.linesIterator.count(l =>
      l.contains("hashpartitioning(h#")) <= 1, ld)
    // cusum: the stream collapses to (type, day) BEFORE any window runs —
    // windows sit above HashAggregate, never over raw events
    val cu = plan("events_cusum")
    assert(!cu.contains("CartesianProduct"), cu)
    // window funnel: stage chain is equi-joins only, and the shared s2
    // stage materializes ONCE (ReusedExchange in the FINAL adaptive
    // plan — AQE applies reuse at runtime, so execute first)
    val wfDf = SparkEntry.queries("events_window_funnel")(spark, dir)
    wfDf.collect()
    val wf = wfDf.queryExecution.executedPlan.toString
    assert(!wf.contains("CartesianProduct") && !wf.contains("BroadcastNestedLoop"), wf)
    assert(wf.contains("ReusedExchange"), wf)
  }

  test("session-5 entries: top-N stays TakeOrdered, pair joins stay equi, no cartesians") {
    // top paths: final top-20 must be a TakeOrdered, not a global sort
    val tp = plan("events_top_paths")
    assert(tp.contains("TakeOrderedAndProject"), tp)
    // association lift: the per-user pair join is an equi self-join on
    // user_id over the collapsed (user, type) relation — no cartesian
    val al = plan("events_assoc_lift")
    assert(!al.contains("CartesianProduct"), al)
    // minhash estimator eval rides the banded candidates — never an
    // all-pairs or non-equi signature self-join
    val me = plan("dedup_minhash_est_eval")
    assert(!me.contains("CartesianProduct"), me)
    // dsir resample: selection is a TakeOrdered over the scored relation
    val dr = plan("doc_dsir_resample")
    assert(dr.contains("TakeOrderedAndProject"), dr)
  }

  test("pagerank: every iteration joins hash/broadcast — no cartesian, no nested loop") {
    val p = plan("emb_pagerank")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("predicate pushdown: Q3's date filters reach the parquet scans") {
    val p = plan("olap_q3_topn")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThan(l_shipdate"), p)
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate), LessThan(o_orderdate"), p)
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"), p)
  }

  test("series-index side of every SELECT broadcasts into the samples join") {
    val p = plan("ts_select_sum_1h")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"))
  }

  test("top-N is TakeOrderedAndProject, not a full global sort") {
    val p = plan("olap_q3_topn")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("Q10: returnflag + date filters pushed; nation broadcast; top-20 TakeOrdered") {
    val p = plan("olap_q10_returns")
    assert(p.contains("EqualTo(l_returnflag,R)"), p)
    assert(p.contains("GreaterThanOrEqual(o_orderdate"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"))
  }

  test("decontamination: the benchmark gram side broadcasts, the corpus side never shuffles into it") {
    val p = plan("doc_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"))
  }

  test("bloom probe: the bit-set side broadcasts as a semi-join") {
    val p = plan("sketch_bloom_probe")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p)
    assert(!p.contains("CartesianProduct"))
  }

  test("hamming ANN: query codes broadcast into the coarse scan; no cartesian") {
    val p = plan("ann_hamming_topk")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"))
  }

  test("ivfpq ANN: codebooks/ADC table broadcast; no cartesian anywhere") {
    val p = plan("ann_ivfpq_topk")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"))
  }

  test("Q18: the HAVING-survivor side broadcasts; top-100 is TakeOrdered") {
    val p = plan("olap_q18_large_orders")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"))
  }

  test("streaks: top-N is TakeOrderedAndProject over the island aggregate") {
    val p = plan("events_streaks")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("Q6: every predicate reaches the parquet scan; no join, no exchange but the aggregate's") {
    val p = plan("olap_q6_forecast")
    // the PushedFilters list is elided in toString — assert its head and
    // that all three columns participate in the scan-level filter
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p)
    assert(p.contains("IsNotNull(l_discount)") && p.contains("IsNotNull(l_quantity)"), p)
    assert(!p.contains("Join"), p)
  }

  test("KMV: sketch membership joins are hash-based; only the tiny pair build nests") {
    val p = plan("sketch_kmv_jaccard")
    assert(!p.contains("CartesianProduct"))
    // exactly two nested-loop joins are expected, both over broadcast
    // sides bounded by |types|² ≈ tens of rows: the pair construction
    // (t < t) and the pair × mask-histogram cross. The sketch membership
    // join — the one that scales with k×|types| — exploded to equi-join
    // keys and must plan hash-based.
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).length <= 2, p)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"), p)
  }

  test("running revenue: window AFTER the (priority, month) collapse, no raw-row window") {
    val p = plan("olap_running_revenue")
    // exactly one Window node, fed by an aggregate (not by the scan)
    assert("Window".r.findAllIn(p).length >= 1, p)
    assert(p.indexOf("Window") < p.indexOf("Scan parquet"), // physical plan prints top-down
      "the window must sit above the monthly aggregate, not over raw orders")
  }

  test("embedding near-dup runs banded, not all-pairs: no cartesian/non-equi self-join") {
    // round-3 verdict: the O(n²) `a.vec_id < b.vec_id` self-join must not
    // plan for the operator entries; candidates come from the band
    // equi-join (the `<` survives only as a post-join filter on it).
    for (name <- Seq("dedup_emb_cosine", "emb_dup_clusters")) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name: $p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$name: $p")
    }
  }

  test("engine-written store: a narrow window reads only matching hour= partitions") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-store-prune").toString
    val e = new graft.api.GraftEngine(spark, root, () => SparkEntry.NowMs)
    // first 72h of events → up to 72 hour= partition dirs (bounded spec
    // runtime; the bench ingests the full range)
    val ev = graft.sources.EventsAdapter.events(spark, dir)
      .filter(org.apache.spark.sql.functions.col("ts_ms") <
        1704067200000L + 72L * 3600000L) // < 2024-01-04T00:00:00Z
    e.writeLines("prune", graft.sources.EventsAdapter.asLineProtocol(ev).as[String])
    val stmt = graft.query.InfluxQlParser.parse(
      """SELECT mean("value") FROM "events" WHERE time >= '2024-01-02 10:00:00' AND time < '2024-01-02 11:00:00' GROUP BY time(5m)""")
      .fold(err => fail(err.toString), identity)
    val df = graft.query.Planner.plan(spark, stmt, e.catalog("prune"), SparkEntry.NowMs)
    // the hour-bucket bounds must reach the scan as PARTITION filters
    // (window [10:00, 11:00] on 2024-01-02 → hour buckets 473386..473387).
    // Assert on the scan node's metadata, not the plan STRING — toString
    // truncates long plans under a shared JVM.
    val scans = df.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.metadata.get("Location").exists(_.contains("samples")) => f
    }
    assert(scans.nonEmpty, df.queryExecution.sparkPlan.toString)
    scans.foreach { f =>
      val pf = f.metadata.getOrElse("PartitionFilters", "")
      assert(pf.contains("hour"), s"no hour partition filter: $pf")
    }
    // and actually prune: selectedPartitions IS the post-pruning listing
    val all = spark.read.parquet(s"$root/prune/samples").queryExecution.sparkPlan
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .map(_.selectedPartitions.partitionCount).sum
    assert(all > 10, s"store unexpectedly small: $all partitions")
    scans.foreach { f =>
      assert(f.selectedPartitions.partitionCount <= 2,
        s"expected <=2 pruned hour partitions, read ${f.selectedPartitions.partitionCount} of $all")
    }
  }

  test("eval entries are sample-bounded: the hash-sample predicate reaches every eval input") {
    // The brute/exact truth stages inside the eval entries are the only
    // quadratic joins in the engine; round-4 verdict requires them bounded
    // by a deterministic id-hash sample. Pin that each eval entry's plan
    // actually filters its inputs with the EvalSampling predicate (the
    // LCG multiplier in a Filter/scan, so the quadratic truth join runs
    // over the sampled relation, never the full table).
    // (a) the gate itself compares the SAMPLED form: every eval oracle
    // carries the LCG sample predicate (Spark must then match it
    // value-for-value through the correctness gate)
    for (name <- Seq("dedup_simhash_eval", "dedup_emb_cosine_eval", "ann_recall_report",
                     "ann_ranking_metrics", "sketch_theta_overlap"))
      assert(SparkEntry.oracleSql(name).contains("1103515245"),
        s"$name: oracle is not sample-bounded")
    // (b) the Spark-side sample predicate reaches the parquet scan (the
    // entries checkpoint their truth relations, which cuts the filter out
    // of the FINAL plan string — so pin pushdown on the sampled source
    // itself, the relation every quadratic truth join consumes)
    val sampled = graft.pipeline.EvalSampling(
      spark.read.parquet(s"$dir/documents.parquet"), "doc_id")
    val sp = sampled.queryExecution.executedPlan.toString
    assert(sp.contains("1103515245"), sp)
  }

  test("LM surprisal: no window at all — broadcast rank table into a hash aggregate") {
    val p = plan("doc_lm_surprisal")
    assert(!p.contains("Window"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("semdedup: pairs come from a cid equi-join, never a global cross") {
    val p = plan("emb_semdedup")
    assert(!p.contains("CartesianProduct"), p)
    // the only nested loops are the k-means centroid broadcasts (8-row
    // side); the quadratic pair stage must plan as a hash/merge join on
    // the cluster id
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"), p)
  }

  test("dsir weights: bucket-weight relation broadcasts; corpus side never re-shuffles past (doc, bucket)") {
    val p = plan("doc_dsir_weights")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("dup spans and winnowing: every window is per-doc, never unpartitioned") {
    for (name <- Seq("doc_dup_spans", "doc_winnowing")) {
      val p = plan(name)
      val winLines = p.linesIterator.filter(_.contains("Window [")).toSeq
      assert(winLines.nonEmpty, s"$name: expected a per-doc window\n$p")
      winLines.foreach(l => assert(l.contains("doc_id"),
        s"$name: window must partition by doc_id: $l"))
    }
  }

  test("rollup: one Expand + aggregate pass, no per-level union of scans") {
    val p = plan("olap_rollup_revenue")
    assert(p.contains("Expand"), p)
    assert("Scan parquet".r.findAllIn(p).length === 1,
      s"rollup must read orders exactly once\n$p")
    assert(!p.contains("Union"), p)
  }

  test("knn graph: banded candidates only — no cartesian/non-equi self-join") {
    val p = plan("emb_knn_graph")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("graph ANN: hop expansion joins stay equi — no cartesian/nested loop") {
    val p = plan("ann_graph_topk")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("LTV triangle: cumulative window after the (cohort, offset) collapse; cohort sizes broadcast") {
    val p = plan("events_ltv_cohort")
    assert(p.contains("Window ["), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("cluster member counts: aggregate + join back, never a partition-only window") {
    // round-9 verdict item: count().over(Window.partitionBy(cluster_id))
    // puts every member row of the LARGEST component into one task — a
    // boilerplate near-dup cluster at 100 TB can hold much of the corpus.
    // The fix (groupBy + shuffle join) is AQE-skew-splittable; pin that no
    // cluster entry plans a window partitioned by cluster_id.
    Seq("dedup_clusters", "dedup_cc_star", "emb_dup_clusters").foreach { name =>
      val p = plan(name)
      assert(!p.contains("windowspecdefinition(cluster_id"),
        s"$name plans a partition-only window over cluster_id:\n$p")
    }
  }

  test("AQE splits a skewed join partition at runtime; result stays exact") {
    // The 100 TB skew story: a hot key (90% of one side) must not pin a
    // single reducer. With broadcast disabled (forcing the shuffle join)
    // and spec-scale skew thresholds, AQE's skew-join rule must split the
    // oversized partition — visible as skew=true on the sort-merge join —
    // and the join result must be byte-identical to the unskewed plan.
    import org.apache.spark.sql.functions._
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    val saved = keys.map(k => k -> conf.getOption(k))
    def restore(): Unit = saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      val left = spark.range(0, 200000).select(
        when(col("id") % 10 < 9, 0L).otherwise(col("id") % 100).as("k"),
        rpad(col("id").cast("string"), 64, "x").as("payload"))
      val right = spark.range(0, 100).select(col("id").as("k"), (col("id") * 7).as("rv"))
      val agg = left.join(right, "k")
        .agg(count(lit(1)).as("n"), sum(length(col("payload"))).as("bytes"),
          sum(col("rv")).as("rvsum"))
      val row = agg.collect().head
      assert(row.getLong(0) === 200000L, "every left row joins exactly once")
      assert(row.getLong(1) === 200000L * 64)
      val p = agg.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"AQE must mark the skewed join side as split:\n$p")
    } finally restore()
  }

  test("hot paths stay inside whole-stage codegen") {
    // AQE finalizes the physical plan only on execution — run the query,
    // then inspect the final adaptive plan for codegen stages
    def finalPlan(name: String): String = {
      val df = SparkEntry.queries(name)(spark, dir)
      df.collect() // count() would execute a derived plan, not df's own
      df.queryExecution.executedPlan.toString
    }
    // simple-mode plan strings mark codegen stages with a "*(n)" prefix
    assert(finalPlan("dedup_exact").contains("*("))
    assert(finalPlan("doc_quality").contains("*("))
  }

  test("pack bins: partition offsets ride a broadcast join, never an O(partitions) expression") {
    // round-6 verdict item 3: the per-partition prefix offset must come
    // back as a 2-column broadcast join on pid — a when()-chain is
    // O(partitions) generated code and blows janino's method limits at
    // real cluster partition counts
    val p = plan("doc_pack_bins")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"offset carry must be a broadcast join: $p")
    assert(!p.contains("CASE WHEN (pid"),
      s"no per-partition CASE chain may appear in the plan: $p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("cross-source overlap: pair counts from the source-set explode, no shingle self-join") {
    // intersections must come from the per-shingle collect_set explode
    // (fanout ≤ |sources|²), never an h=h shingle self-join; the only
    // joins are the two broadcast per-source count lookups.
    val p = plan("dedup_source_overlap")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert("BroadcastHashJoin".r.findAllIn(p).length == 2, p)
  }

  test("round-6 entries: url dedup is one hash aggregate; trained scores stay shuffle-free") {
    // urlDedup: projection -> ONE hash aggregate (partial+final = one
    // Exchange on canon_url) -> presentation sort. No join, no window.
    val ud = plan("doc_url_dedup")
    assert(!ud.contains("CartesianProduct") && !ud.contains("Join"), ud)
    assert(!ud.contains("Window"), ud)
    val udExch = ud.linesIterator.count(_.trim.startsWith("+- Exchange hashpartitioning"))
    assert(udExch <= 1, s"urlDedup must shuffle once (the aggregate): $ud")
    // urlCanon: pure per-row projection — nothing but the presentation
    // sort's range exchange
    val uc = plan("doc_url_canon")
    assert(!uc.contains("hashpartitioning") && !uc.contains("Join"), uc)
    // trained scores: the per-doc scoring pass is a projection over the
    // persisted feature relation — no join/window in the scoring plan
    val ts = plan("doc_quality_trained_scores")
    assert(!ts.contains("Join") && !ts.contains("Window") &&
      !ts.contains("CartesianProduct"), ts)
  }

  test("semantic decontamination: cross-side candidates stay equi, no cartesian") {
    val p = plan("emb_semantic_decontaminate")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }
}
