package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`, 64-dim testdata). Two tiers:
  *
  *  - [[bruteTopK]]: exact cosine top-k — the correctness baseline.
  *    Query set is broadcast; the big side streams once. At 100 TB this
  *    is a single pass, no shuffle except the final per-query top-k
  *    (Window over q_id, k rows each — tiny).
  *  - [[lshTopK]]: random-hyperplane LSH. Each vector gets a
  *    `NumPlanes`-bit bucket (sign of dot with deterministic integer
  *    hyperplanes); candidates = same bucket; exact cosine re-rank
  *    within bucket. At scale the bucket join replaces the cross
  *    product: shuffle keys are (bucket), each side ~n/2^planes per
  *    bucket. Recall tunes with NumPlanes (fewer planes → bigger
  *    buckets → higher recall).
  *
  * Hyperplane coefficients come from an LCG formula spliced identically
  * into the Spark plan and the DuckDB oracle — no stored random state.
  * All sums are sequential left folds in both engines (Spark
  * `aggregate` / DuckDB `list_reduce`), so doubles match bit-for-bit.
  */
object Similarity {

  val K = 10
  /** Queries = vec_id < NumQueries (deterministic, data-independent). */
  val NumQueries = 10
  val Dim = 64
  val NumPlanes = 8

  // ---- shared expressions -----------------------------------------------

  /** Codegen'd scalar loop (graft.functions.DotF64); same ascending-index
    * summation order as the declarative aggregate fold and DuckDB's
    * list_reduce, so oracle results stay bit-identical. */
  private def dotCols(a: Column, b: Column): Column =
    graft.functions.VectorMath.dotF64(a, b)

  private def norm(v: Column): Column = sqrt(dotCols(v, v))

  private def normalized(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", norm(col("v")))

  private val dotSql = "list_reduce(list_transform(range(1, 65), d -> q.v[d] * c.v[d]), (x, y) -> x + y)"
  private def nrmSql(t: String) =
    s"sqrt(list_reduce(list_transform(range(1, 65), d -> $t.v[d] * $t.v[d]), (x, y) -> x + y))"

  // ---- exact top-k -------------------------------------------------------

  /** Exact cosine top-K for each query vector (vec_id < NumQueries),
    * self-match excluded; ties broken by neighbor id on the fixed-point
    * score so ranking is engine-independent.
    * Output (q_id, rank, neighbor_id, cos_fp). */
  def bruteTopK(emb: DataFrame): DataFrame = {
    val e = normalized(emb)
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val scored = e.join(broadcast(q), col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        floor(dotCols(col("qv"), col("v")) / (col("qn") * col("nrm")) * 1e6)
          .cast("long").as("cos_fp"))
    val w = Window.partitionBy("q_id").orderBy(col("cos_fp").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
      .select("q_id", "rank", "neighbor_id", "cos_fp")
      .orderBy("q_id", "rank")
  }

  val bruteTopKOracle: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |scored AS (
       |  SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
       |         floor($dotSql / (${nrmSql("q")} * ${nrmSql("c")}) * 1e6)::BIGINT AS cos_fp
       |  FROM e q JOIN e c ON q.vec_id < $NumQueries AND c.vec_id <> q.vec_id),
       |ranked AS (
       |  SELECT q_id, neighbor_id, cos_fp,
       |         row_number() OVER (PARTITION BY q_id ORDER BY cos_fp DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT q_id, rank, neighbor_id, cos_fp FROM ranked
       |WHERE rank <= $K ORDER BY q_id, rank""".stripMargin

  // ---- reciprocal-rank fusion ----------------------------------------------

  /** RRF smoothing constant (Cormack et al. 2009's k=60). */
  val RrfK = 60L

  /** RECIPROCAL-RANK FUSION of two retrievers per query — the standard
    * hybrid-retrieval combiner (every production RAG stack fuses a
    * dense ranking with a cheap sketch/lexical one): fused score =
    * Σ_methods 1e6 div (60 + rank), integer-quantized so both engines
    * rank identically; ties broken by neighbor id. Fused here: the
    * exact-cosine ranking ([[bruteTopK]], the dense retriever) and the
    * binary-sketch ranking ([[hammingTopK]], the cheap first-stage) —
    * a neighbor surfaced by BOTH beats either's solo top hit exactly
    * when its ranks satisfy the RRF inequality, which the spec pins.
    * Scale shape: two already-verified top-K relations (each
    * NumQueries·K rows — eval-bounded), one full-outer join on
    * (q_id, neighbor_id), one window per query. Output
    * (q_id, rank, neighbor_id, rrf_fp, n_methods). */
  def rrfFusion(emb: DataFrame): DataFrame = {
    def side(df: DataFrame, m: String) = df
      .select(col("q_id"), col("neighbor_id"),
        expr(s"1000000 div ($RrfK + rank)").as(s"rrf_$m"))
    val fused = side(bruteTopK(emb), "dense")
      .join(side(hammingTopK(emb), "sketch"), Seq("q_id", "neighbor_id"), "full_outer")
      .select(col("q_id"), col("neighbor_id"),
        (coalesce(col("rrf_dense"), lit(0L)) + coalesce(col("rrf_sketch"), lit(0L)))
          .as("rrf_fp"),
        (when(col("rrf_dense").isNotNull, 1L).otherwise(0L) +
          when(col("rrf_sketch").isNotNull, 1L).otherwise(0L)).as("n_methods"))
    val w = Window.partitionBy("q_id").orderBy(col("rrf_fp").desc, col("neighbor_id"))
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
      .select("q_id", "rank", "neighbor_id", "rrf_fp", "n_methods")
      .orderBy("q_id", "rank")
  }

  lazy val rrfFusionOracle: String =
    s"""WITH bd AS (SELECT q_id, neighbor_id,
       |                   1000000 // ($RrfK + rank) AS rrf_dense
       |            FROM ($bruteTopKOracle) b),
       |hd AS (SELECT q_id, neighbor_id,
       |              1000000 // ($RrfK + rank) AS rrf_sketch
       |       FROM ($hammingTopKOracle) h),
       |fused AS (
       |  SELECT coalesce(bd.q_id, hd.q_id) AS q_id,
       |         coalesce(bd.neighbor_id, hd.neighbor_id) AS neighbor_id,
       |         CAST(coalesce(bd.rrf_dense, 0) + coalesce(hd.rrf_sketch, 0) AS BIGINT) AS rrf_fp,
       |         CAST((CASE WHEN bd.rrf_dense IS NOT NULL THEN 1 ELSE 0 END)
       |            + (CASE WHEN hd.rrf_sketch IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_methods
       |  FROM bd FULL OUTER JOIN hd
       |    ON bd.q_id = hd.q_id AND bd.neighbor_id = hd.neighbor_id),
       |ranked AS (
       |  SELECT q_id, neighbor_id, rrf_fp, n_methods,
       |         row_number() OVER (PARTITION BY q_id
       |           ORDER BY rrf_fp DESC, neighbor_id) AS rank
       |  FROM fused)
       |SELECT q_id, rank, neighbor_id, rrf_fp, n_methods FROM ranked
       |WHERE rank <= $K ORDER BY q_id, rank""".stripMargin

  // ---- filtered ANN -------------------------------------------------------

  /** Metadata-filtered exact top-K: each query's neighbors restricted
    * to its OWN label — the "filtered vector search" shape every
    * retrieval deployment needs (tenant/language/visibility scoping).
    * This is the PRE-filter strategy: the predicate lands before
    * scoring, so each query scans only its label's stratum — the right
    * plan whenever the filter is selective (post-filtering a top-K
    * retrieved without the predicate silently returns < K results
    * exactly when the filter matters most). At corpus scale the label
    * is a partition/bucket key and the scan prunes to matching
    * partitions; the scoring join stays the broadcast-queries shape of
    * [[bruteTopK]] with an extra label equi-key.
    * Output (q_id, rank, neighbor_id, cos_fp). */
  def filteredTopK(emb: DataFrame): DataFrame = {
    val e = normalized(emb)
      .join(emb.select(col("vec_id"), col("label")), "vec_id")
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("label").as("q_label"))
    val scored = e.join(broadcast(q),
        col("label") === col("q_label") && col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        floor(dotCols(col("qv"), col("v")) / (col("qn") * col("nrm")) * 1e6)
          .cast("long").as("cos_fp"))
    val w = Window.partitionBy("q_id").orderBy(col("cos_fp").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
      .select("q_id", "rank", "neighbor_id", "cos_fp")
      .orderBy("q_id", "rank")
  }

  val filteredTopKOracle: String =
    s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
       |scored AS (
       |  SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
       |         floor($dotSql / (${nrmSql("q")} * ${nrmSql("c")}) * 1e6)::BIGINT AS cos_fp
       |  FROM e q JOIN e c ON q.vec_id < $NumQueries AND c.vec_id <> q.vec_id
       |                   AND c.label = q.label),
       |ranked AS (
       |  SELECT q_id, neighbor_id, cos_fp,
       |         row_number() OVER (PARTITION BY q_id ORDER BY cos_fp DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT q_id, rank, neighbor_id, cos_fp FROM ranked
       |WHERE rank <= $K ORDER BY q_id, rank""".stripMargin

  // ---- MMR diversified re-ranking -----------------------------------------

  val MmrCand = 20    // candidate pool per query (brute top-C baseline)
  val MmrPick = 5     // diversified results returned per query
  val MmrLambda10 = 7L // λ in tenths: score = 7·relevance − 3·max-sim-to-selected

  /** Maximal-marginal-relevance re-ranking (the classic Carbonell &
    * Goldstein recipe): from each query's top-[[MmrCand]] cosine
    * candidates, greedily select [[MmrPick]] results maximizing
    * λ·relevance − (1−λ)·max-similarity-to-already-selected — the
    * diversification pass that keeps a retrieval batch from returning
    * five copies of the same near-duplicate passage. All scores are
    * int64 fixed-point (cosines quantized to 1e6 BEFORE the λ-blend,
    * λ = [[MmrLambda10]]/10 applied as integer multipliers), ties broken
    * by candidate id, so the greedy trajectory is engine-exact.
    *
    * Scale shape: the candidate stage is the brute queries×corpus
    * broadcast scan (swap in any `*TopK` index relation at corpus
    * scale); everything after is bounded by queries × MmrCand² — the
    * pairwise-sim relation and the [[MmrPick]] unrolled greedy joins
    * never touch the corpus again. Each greedy round localCheckpoints
    * the (queries × picks)-row selection so the final plan stays flat.
    * Output (q_id, pick, cand_id, score_fp) ordered by (q_id, pick). */
  def mmrRerank(emb: DataFrame): DataFrame = {
    val e = normalized(emb)
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val scored = e.join(broadcast(q), col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("cand_id"),
        floor(dotCols(col("qv"), col("v")) / (col("qn") * col("nrm")) * 1e6)
          .cast("long").as("rel_fp"))
    val wc = Window.partitionBy("q_id").orderBy(col("rel_fp").desc, col("cand_id"))
    val cand = scored.withColumn("rn", row_number().over(wc))
      .filter(col("rn") <= MmrCand).select("q_id", "cand_id", "rel_fp")
      .localCheckpoint(true)
    val cv = cand.join(e, cand("cand_id") === e("vec_id"))
      .select(col("q_id"), col("cand_id"), col("v"), col("nrm"))
    val a = cv.select(col("q_id"), col("cand_id").as("a_id"),
      col("v").as("av"), col("nrm").as("an"))
    val b = cv.select(col("q_id"), col("cand_id").as("b_id"),
      col("v").as("bv"), col("nrm").as("bn"))
    val sims = a.join(b, Seq("q_id")).filter(col("a_id") =!= col("b_id"))
      .select(col("q_id"), col("a_id"), col("b_id"),
        floor(dotCols(col("av"), col("bv")) / (col("an") * col("bn")) * 1e6)
          .cast("long").as("sim_fp"))
      .localCheckpoint(true)
    // pick 1: pure relevance (argmax via struct-max, ties → lowest id)
    var sel = cand.groupBy("q_id")
      .agg(max(struct((col("rel_fp") * MmrLambda10).as("s"),
        (-col("cand_id")).as("nid"))).as("m"))
      .select(col("q_id"), (-col("m.nid")).as("cand_id"),
        lit(1L).as("pick"), col("m.s").as("score_fp"))
      .localCheckpoint(true)
    for (k <- 2 to MmrPick) {
      val maxsim = sims
        .join(sel.select(col("q_id"), col("cand_id").as("b_id")), Seq("q_id", "b_id"))
        .groupBy("q_id", "a_id").agg(max("sim_fp").as("maxsim"))
        .withColumnRenamed("a_id", "cand_id")
      val next = cand
        .join(sel.select("q_id", "cand_id"), Seq("q_id", "cand_id"), "left_anti")
        .join(maxsim, Seq("q_id", "cand_id"))
        .groupBy("q_id")
        .agg(max(struct(
          (col("rel_fp") * MmrLambda10 - col("maxsim") * (10L - MmrLambda10)).as("s"),
          (-col("cand_id")).as("nid"))).as("m"))
        .select(col("q_id"), (-col("m.nid")).as("cand_id"),
          lit(k.toLong).as("pick"), col("m.s").as("score_fp"))
      sel = sel.unionByName(next).localCheckpoint(true)
    }
    sel.select("q_id", "pick", "cand_id", "score_fp").orderBy("q_id", "pick")
  }

  val mmrRerankOracle: String = {
    def dotAb(x: String, y: String) =
      s"list_reduce(list_transform(range(1, ${Dim + 1}), d -> $x.v[d] * $y.v[d]), (p, r) -> p + r)"
    val mu = 10L - MmrLambda10
    val steps = (2 to MmrPick).map { k =>
      s"""ms$k AS (SELECT s.q_id, s.a_id, max(s.sim_fp) AS maxsim
         |        FROM sim s JOIN sel${k - 1} p ON p.q_id = s.q_id AND p.cand_id = s.b_id
         |        GROUP BY 1, 2),
         |pk$k AS (SELECT q_id, cand_id, score_fp FROM (
         |         SELECT c.q_id, c.cand_id,
         |                c.rel_fp * $MmrLambda10 - m.maxsim * $mu AS score_fp,
         |                row_number() OVER (PARTITION BY c.q_id
         |                  ORDER BY c.rel_fp * $MmrLambda10 - m.maxsim * $mu DESC,
         |                           c.cand_id) AS rn
         |         FROM cand c JOIN ms$k m ON m.q_id = c.q_id AND m.a_id = c.cand_id
         |         WHERE NOT EXISTS (SELECT 1 FROM sel${k - 1} x
         |                           WHERE x.q_id = c.q_id AND x.cand_id = c.cand_id)) t
         |         WHERE rn = 1),
         |sel$k AS (SELECT * FROM sel${k - 1} UNION ALL
         |          SELECT q_id, cand_id, CAST($k AS BIGINT) AS pick, score_fp FROM pk$k)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |scored AS (
       |  SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
       |         floor(${dotAb("q", "c")} / (${nrmSql("q")} * ${nrmSql("c")}) * 1e6)::BIGINT AS rel_fp
       |  FROM e q JOIN e c ON q.vec_id < $NumQueries AND c.vec_id <> q.vec_id),
       |cand AS (SELECT q_id, cand_id, rel_fp FROM (
       |           SELECT q_id, cand_id, rel_fp,
       |                  row_number() OVER (PARTITION BY q_id ORDER BY rel_fp DESC, cand_id) AS rn
       |           FROM scored) t WHERE rn <= $MmrCand),
       |cv AS (SELECT c.q_id, c.cand_id, e.v FROM cand c JOIN e ON e.vec_id = c.cand_id),
       |sim AS (SELECT a.q_id, a.cand_id AS a_id, b.cand_id AS b_id,
       |               floor(${dotAb("a", "b")} / (${nrmSql("a")} * ${nrmSql("b")}) * 1e6)::BIGINT AS sim_fp
       |        FROM cv a JOIN cv b ON a.q_id = b.q_id AND a.cand_id <> b.cand_id),
       |sel1 AS (SELECT q_id, cand_id, CAST(1 AS BIGINT) AS pick,
       |                rel_fp * $MmrLambda10 AS score_fp FROM (
       |           SELECT q_id, cand_id, rel_fp,
       |                  row_number() OVER (PARTITION BY q_id ORDER BY rel_fp DESC, cand_id) AS rn
       |           FROM cand) t WHERE rn = 1),
       |$steps
       |SELECT q_id, pick, cand_id, score_fp FROM sel$MmrPick ORDER BY q_id, pick""".stripMargin
  }

  // ---- margin-based bitext mining ----------------------------------------

  /** Mined pairs reported (highest-margin page). */
  val BitextTopK = 50

  /** Margin-based cross-set nearest-neighbor mining — the CCMatrix /
    * LASER bitext-alignment shape: treat label-0 vectors as the source
    * language and label-1 as the target, find each source's best target
    * by cosine, and score confidence as the margin over the runner-up
    * (absolute-margin criterion; a best match barely better than the
    * second-best is a weak alignment). Cosines are quantized to int64
    * fixed-point BEFORE any ranking, so best/second/margin are
    * engine-exact.
    *
    * Scale shape: the target index broadcasts (one language's index;
    * with both sides huge you'd LSH-bucket first — [[lshTopK]] is that
    * path) while the source side streams through map-side scoring; the
    * only shuffle is the per-source top-2, whose input is already
    * score-quantized. Output: top-[[BitextTopK]] pairs by margin. */
  def bitextMine(emb: DataFrame): DataFrame = {
    val e = emb.select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", norm(col("v")))
    val src = e.filter(col("label") === 0)
      .select(col("vec_id").as("src_id"), col("v").as("sv"), col("nrm").as("sn"))
    val tgt = e.filter(col("label") === 1)
      .select(col("vec_id").as("tgt_id"), col("v").as("tv"), col("nrm").as("tn"))
    val scored = src.join(broadcast(tgt))
      .select(col("src_id"), col("tgt_id"),
        floor(dotCols(col("sv"), col("tv")) / (col("sn") * col("tn")) * 1e6)
          .cast("long").as("cos_fp"))
    val w = Window.partitionBy("src_id").orderBy(col("cos_fp").desc, col("tgt_id"))
    val top2 = scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
    val best = top2.filter(col("rn") === 1)
      .select(col("src_id"), col("tgt_id").as("best_tgt_id"), col("cos_fp").as("best_fp"))
    val second = top2.filter(col("rn") === 2)
      .select(col("src_id"), col("cos_fp").as("second_fp"))
    best.join(second, Seq("src_id"), "left")
      .withColumn("margin_fp", col("best_fp") - coalesce(col("second_fp"), lit(0L)))
      .select("src_id", "best_tgt_id", "best_fp", "margin_fp")
      .orderBy(col("margin_fp").desc, col("src_id")).limit(BitextTopK)
  }

  val bitextMineOracle: String =
    s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
       |scored AS (
       |  SELECT q.vec_id AS src_id, c.vec_id AS tgt_id,
       |         floor($dotSql / (${nrmSql("q")} * ${nrmSql("c")}) * 1e6)::BIGINT AS cos_fp
       |  FROM e q JOIN e c ON q.label = 0 AND c.label = 1),
       |ranked AS (
       |  SELECT src_id, tgt_id, cos_fp, row_number() OVER (
       |           PARTITION BY src_id ORDER BY cos_fp DESC, tgt_id) AS rn
       |  FROM scored),
       |best AS (SELECT src_id, tgt_id AS best_tgt_id, cos_fp AS best_fp
       |         FROM ranked WHERE rn = 1),
       |second AS (SELECT src_id, cos_fp AS second_fp FROM ranked WHERE rn = 2)
       |SELECT b.src_id, b.best_tgt_id, b.best_fp,
       |       b.best_fp - coalesce(s.second_fp, 0) AS margin_fp
       |FROM best b LEFT JOIN second s ON s.src_id = b.src_id
       |ORDER BY margin_fp DESC, b.src_id LIMIT $BitextTopK""".stripMargin

  // ---- LSH-bucketed top-k ------------------------------------------------

  private def bucketCol: Column =
    // single band of NumPlanes sign-bits — one codegen'd vector pass
    // (bit-identical to the per-plane fold; same LCG stream as the oracle)
    graft.functions.VectorMath.hyperplaneBuckets(col("v"), 1, NumPlanes)
      .getItem(0).as("bucket")

  /** ANN top-K via NumPlanes-bit hyperplane buckets: exact cosine re-rank
    * restricted to the query's bucket. Approximate by construction — the
    * oracle mirrors the bucketing exactly, so results are deterministic.
    * Output (q_id, rank, neighbor_id, cos_fp). */
  def lshTopK(emb: DataFrame): DataFrame = {
    val e = normalized(emb).withColumn("bucket", bucketCol)
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"),
        col("bucket").as("qb"))
    val scored = e.join(broadcast(q),
        col("qb") === col("bucket") && col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        floor(dotCols(col("qv"), col("v")) / (col("qn") * col("nrm")) * 1e6)
          .cast("long").as("cos_fp"))
    val w = Window.partitionBy("q_id").orderBy(col("cos_fp").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
      .select("q_id", "rank", "neighbor_id", "cos_fp")
      .orderBy("q_id", "rank")
  }

  // ---- graph ANN: beam search over the kNN graph ---------------------------

  /** Beam width — frontier vertices expanded per hop per query. */
  val GraphBeam = 8
  /** Fixed expansion hops (the deterministic batch analogue of
    * best-first's "until no improvement"). */
  val GraphHops = 2

  /** Graph-traversal ANN — the production-dominant proximity-graph
    * family (Malkov & Yashunin's NSW/HNSW), in its Spark-batch shape:
    * HNSW's sequential insert order has no batch meaning, but the
    * navigate-by-neighbors SEARCH does. Each query seeds with its LSH
    * bucket members (the [[lshTopK]] bucketing), then walks the
    * [[Dedup.knnGraph]] edge list for [[GraphHops]] hops with a
    * [[GraphBeam]]-wide frontier, exact-cosine scoring visited vertices
    * only; final top-K over the visited set. Deterministic by
    * construction (fixed hops/beam, id tie-breaks), and recall ≥
    * [[lshTopK]] structurally — the visited set contains the whole seed
    * bucket.
    *
    * Scale shape: the graph build amortizes across every graph consumer
    * (memoized; Bench's shared_build pays it once); per hop, the
    * frontier is NumQueries×[[GraphBeam]] rows — broadcast into one
    * equi-join against the n·K edge list — and scoring joins fetch
    * vectors by id for visited candidates only. Nothing quadratic in
    * the corpus anywhere. Output (q_id, rank, neighbor_id, cos_fp).
    *
    * The no-arg form pins the oracle-scale band width; corpus-scale
    * callers size bandBits with Dedup.bandBitsFor(n) — same law as the
    * graph itself. */
  def graphTopK(emb: DataFrame): DataFrame = graphTopK(emb, Dedup.EmbBandBits)

  def graphTopK(emb: DataFrame, bandBits: Int): DataFrame = {
    val e = normalized(emb)
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    def score(ids: DataFrame): DataFrame = // (q_id, id) → + cos_fp
      ids.join(e.select(col("vec_id").as("id"), col("v"), col("nrm")), Seq("id"))
        .join(broadcast(q), Seq("q_id"))
        .select(col("q_id"), col("id"),
          floor(dotCols(col("qv"), col("v")) / (col("qn") * col("nrm")) * 1e6)
            .cast("long").as("cos_fp"))
    def beam(scored: DataFrame): DataFrame = {
      val w = Window.partitionBy("q_id").orderBy(col("cos_fp").desc, col("id"))
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= GraphBeam).select("q_id", "id")
    }
    val eb = e.withColumn("bucket", bucketCol)
    val qb = eb.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("bucket").as("qb"))
    val edges = Dedup.knnGraph(emb, bandBits)
      .select(col("vec_id").as("id"), col("neighbor_id").as("nb"))
    // seeds = the query's LSH bucket members ∪ its own graph neighbors
    // (the standard entry-point trick: sparse buckets alone strand a
    // query; its kNN edges always give the walk somewhere to start)
    val seeds = eb.join(broadcast(qb),
        col("qb") === col("bucket") && col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("id"))
      .unionByName(edges.filter(col("id") < NumQueries)
        .select(col("id").as("q_id"), col("nb").as("id")))
      .distinct()
    // visited is bounded: seed-bucket occupancy + hops·queries·beam·K.
    // r12: only each hop's FRESH scores are checkpointed; `visited` is a
    // plain union of those leaves — the old re-checkpoint of the growing
    // union rewrote every previously-visited row once per hop (guide §5:
    // materialize the increment, not the accumulation).
    val sc0 = graft.util.Materialize.bounded(score(seeds))
    var visited = sc0
    var frontier = beam(sc0)
    for (_ <- 1 to GraphHops) {
      val fresh = frontier.join(edges, Seq("id"))
        .select(col("q_id"), col("nb").as("id"))
        .filter(col("id") =!= col("q_id"))
        .distinct()
        .join(visited.select("q_id", "id"), Seq("q_id", "id"), "left_anti")
      val sc = graft.util.Materialize.bounded(score(fresh))
      visited = visited.unionByName(sc)
      frontier = beam(sc)
    }
    val w = Window.partitionBy("q_id").orderBy(col("cos_fp").desc, col("id"))
    visited.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
      .select(col("q_id"), col("rank"), col("id").as("neighbor_id"), col("cos_fp"))
      .orderBy("q_id", "rank")
  }

  // ---- IVF (inverted-file) top-k ------------------------------------------

  val IvfK = 8 // coarse centroids
  val NProbe = 2 // clusters searched per query

  /** Components quantized to fixed-point 1e6 longs: ALL k-means arithmetic
    * (distances, sums, means) happens in exact int64, so assignments and
    * centroids are order/partitioning-independent — the property that lets
    * DuckDB mirror the clustering bit-for-bit with no ordered folds. */
  private def quantCol: Column =
    transform(col("v"), y => floor(y * 1e6).cast("long"))

  /** Exact integer squared-L2 between two fp-1e6 vectors (fits int64:
    * 64 * (diff ≤ 1e7)^2 ≈ 6.4e15). */
  private def distSq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), (acc, x) => acc + x)

  /** Codebook argmin WITHOUT the crossjoin→groupBy shuffle (guide §2.4):
    * the codebook collapses to one array-of-(id, c) column (broadcast),
    * and every row picks its nearest entry by folding that array in
    * place — `array_min(struct(d, id))` computes exactly
    * `min(struct(d, id))` (lexicographic: min distance, ties to the
    * smallest id), so assignments and every downstream oracle hash are
    * unchanged while the corpus×K intermediate rows and the
    * per-assignment exchange disappear. Null on an empty codebook —
    * callers filter, matching the old inner-join's empty result. */
  private def argminCode(sub: Column, cbs: Column): Column =
    array_min(transform(cbs, e =>
      struct(distSq(sub, e.getField("c")).as("d"), e.getField("id").as("id"))))
      .getField("id")

  /** IVF ANN top-K: deterministic quantized k-means (init = first IvfK
    * vectors, one recompute round — fixed iterations over convergence
    * checks, for reproducibility), then each query probes its NProbe
    * nearest clusters and exact-cosine re-ranks only their members.
    *
    * Scale shape (the 100 TB path next to [[lshTopK]]):
    *  - assignment: broadcast of IvfK centroids + map-side partial argmin
    *    → shuffle is one row per vector;
    *  - centroid recompute: groupBy (cid, pos) with map-side combine →
    *    shuffle volume is partitions × IvfK × Dim, independent of rows;
    *  - search: probes (queries × NProbe) broadcast into the member scan —
    *    only ~NProbe/IvfK of the corpus is scored per query.
    * Output (q_id, rank, neighbor_id, cos_fp). */
  /** Deterministic quantized k-means shared by [[ivfTopK]] and
    * [[semDedup]]: init = first IvfK vectors, one recompute round.
    * Returns (final centroids `(cid, c)`, final assignments
    * `(vec_id, cid)`). */
  private def ivfCluster(x: DataFrame): (DataFrame, DataFrame) =
    // memoized per (session, input plan): the SAME clustering feeds
    // ivfTopK, ivfpqTopK, semDedup, and both eval reports in one run —
    // round-6 verdict item 2 (IVF k-means trained once, not per entry).
    // Centroids are IvfK rows (bounded); assignments are corpus-sized →
    // evictable spill-safe persist, forced here so every consumer reads
    // blocks instead of re-running the two assignment passes.
    graft.util.Memo((x.sparkSession, "Similarity.ivfCluster", x.semanticHash())) {
      val (c1, a2) = ivfClusterBuild(x)
      val cM = graft.util.Materialize.bounded(c1)
      val aM = graft.util.Materialize.corpus(a2)
      aM.count()
      (cM, aM)
    }

  private def ivfClusterBuild(x: DataFrame): (DataFrame, DataFrame) = {
    val x0 = x.select("vec_id", "xq")
    // r12: assignment via [[argminCode]] — one broadcast array row, a
    // map-only argmin per vector; the old crossjoin + groupBy(vec_id)
    // min(struct) computed the identical (d, cid) lexicographic minimum
    // through an IvfK× row blowup and an exchange (guide §2.4).
    def assign(cent: DataFrame): DataFrame =
      x0.join(broadcast(cent.agg(
          collect_list(struct(col("cid").as("id"), col("c"))).as("cbs"))), lit(true))
        .select(col("vec_id"), argminCode(col("xq"), col("cbs")).as("cid"))
        .filter(col("cid").isNotNull)
    val c0 = x0.filter(col("vec_id") < IvfK)
      .select(col("vec_id").as("cid"), col("xq").as("c"))
    val a1 = assign(c0)
    // per-dim integer mean: floor(sum/count) in doubles is exact here
    // (sum < 2^53) and identical to DuckDB's floor division
    val c1 = x0.join(a1, "vec_id")
      .select(col("cid"), col("xq"), explode(sequence(lit(1), lit(Dim))).as("pos"))
      .withColumn("comp", element_at(col("xq"), col("pos")))
      .groupBy("cid", "pos")
      .agg(floor(sum("comp") / count(lit(1))).cast("long").as("cp"))
      .groupBy("cid")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("cp")))),
        s => s.getField("cp")).as("c"))
    (c1, assign(c1))
  }

  /** Force-build the full-corpus IVF clustering (Bench's shared_build
    * hook): ann_ivf_topk, ann_ivfpq_topk, and emb_semdedup all consume
    * the same memoized (centroids, assignments) pair. */
  def buildIvfIndex(emb: DataFrame): Unit = {
    ivfCluster(normalized(emb).withColumn("xq", quantCol))
    ()
  }

  def ivfTopK(emb: DataFrame): DataFrame = {
    val x = normalized(emb).withColumn("xq", quantCol)
    val (c1, a2) = ivfCluster(x)
    val q = x.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"),
        col("xq").as("qq"))
    val qc = q.join(broadcast(c1), lit(true))
      .select(col("q_id"), col("qv"), col("qn"), col("cid"),
        distSq(col("qq"), col("c")).as("d"))
    val wp = Window.partitionBy("q_id").orderBy(col("d"), col("cid"))
    val probes = qc.withColumn("rn", row_number().over(wp)).filter(col("rn") <= NProbe)
      .select("q_id", "qv", "qn", "cid")
    val members = x.join(a2, "vec_id") // each vector in exactly one cluster
    val scored = members.join(broadcast(probes), Seq("cid"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        floor(dotCols(col("qv"), col("v")) / (col("qn") * col("nrm")) * 1e6)
          .cast("long").as("cos_fp"))
    val w = Window.partitionBy("q_id").orderBy(col("cos_fp").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
      .select("q_id", "rank", "neighbor_id", "cos_fp")
      .orderBy("q_id", "rank")
  }

  /** Shared k-means CTE chain (e, x, c0..a2) — spliced into the IVF,
    * SemDeDup, and trainManifestV2 oracles so the clustering is
    * textually identical. */
  private[pipeline] val ivfClusterCtes: String = {
    val dSq = (xt: String, ct: String) =>
      s"""list_reduce(list_transform(range(1, ${Dim + 1}),
         |        d -> ($xt.xq[d] - $ct.c[d]) * ($xt.xq[d] - $ct.c[d])), (a, b) -> a + b)""".stripMargin
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |x AS (SELECT vec_id, v,
       |             list_transform(v, y -> CAST(floor(y * 1e6) AS BIGINT)) AS xq FROM e),
       |c0 AS (SELECT vec_id AS cid, xq AS c FROM x WHERE vec_id < $IvfK),
       |d1 AS (SELECT x.vec_id, c.cid, ${dSq("x", "c")} AS d FROM x, c0 c),
       |a1 AS (SELECT vec_id, cid FROM (
       |         SELECT vec_id, cid,
       |                row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
       |         FROM d1) t WHERE rn = 1),
       |cp1 AS (SELECT a1.cid, t.pos,
       |               CAST(floor(sum(x.xq[t.pos])::DOUBLE / count(*)::DOUBLE) AS BIGINT) AS cp
       |        FROM x JOIN a1 USING (vec_id), range(1, ${Dim + 1}) t(pos)
       |        GROUP BY 1, 2),
       |c1 AS (SELECT cid, list(cp ORDER BY pos) AS c FROM cp1 GROUP BY cid),
       |d2 AS (SELECT x.vec_id, c.cid, ${dSq("x", "c")} AS d FROM x, c1 c),
       |a2 AS (SELECT vec_id, cid FROM (
       |         SELECT vec_id, cid,
       |                row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
       |         FROM d2) t WHERE rn = 1)""".stripMargin
  }

  val ivfTopKOracle: String = {
    val dSq = (xt: String, ct: String) =>
      s"""list_reduce(list_transform(range(1, ${Dim + 1}),
         |        d -> ($xt.xq[d] - $ct.c[d]) * ($xt.xq[d] - $ct.c[d])), (a, b) -> a + b)""".stripMargin
    s"""$ivfClusterCtes,
       |qd AS (SELECT x.vec_id AS q_id, c.cid, ${dSq("x", "c")} AS d
       |       FROM x, c1 c WHERE x.vec_id < $NumQueries),
       |probes AS (SELECT q_id, cid FROM (
       |             SELECT q_id, cid,
       |                    row_number() OVER (PARTITION BY q_id ORDER BY d, cid) AS rn
       |             FROM qd) t WHERE rn <= $NProbe),
       |scored AS (
       |  SELECT p.q_id, a2.vec_id AS neighbor_id,
       |         floor($dotSql / (${nrmSql("q")} * ${nrmSql("c")}) * 1e6)::BIGINT AS cos_fp
       |  FROM probes p
       |  JOIN a2 ON a2.cid = p.cid AND a2.vec_id <> p.q_id
       |  JOIN e c ON c.vec_id = a2.vec_id
       |  JOIN e q ON q.vec_id = p.q_id),
       |ranked AS (
       |  SELECT q_id, neighbor_id, cos_fp,
       |         row_number() OVER (PARTITION BY q_id ORDER BY cos_fp DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT q_id, rank, neighbor_id, cos_fp FROM ranked
       |WHERE rank <= $K ORDER BY q_id, rank""".stripMargin
  }

  // ---- SemDeDup: semantic dedup within k-means clusters -------------------

  /** Cosine at or above this (fixed-point 1e6) within a cluster marks the
    * higher-id vector a semantic duplicate. */
  val SemDedupTauFp = 950000L

  /** SemDeDup-shaped semantic deduplication (public recipe: cluster the
    * embedding space with k-means, then compare pairs ONLY within each
    * cluster; pairs above a cosine threshold are semantic duplicates and
    * all but one representative are pruned). Reuses the deterministic
    * quantized k-means from [[ivfTopK]] — same centroids, same
    * assignments — and keeps the LOWEST vec_id of each duplicate pair
    * (deterministic representative).
    *
    * Scale shape: the global all-pairs problem never materializes — the
    * only shuffle keys are `cid`, and the quadratic stage is confined to
    * within-cluster pairs, bounded by (n/k)² per cluster; k scales with
    * the corpus so n/k stays fixed (the published SemDeDup cost model).
    * Contrast with [[Dedup.cosinePairsBanded]]: LSH bands find high-cosine
    * near-exact pairs anywhere; SemDeDup prunes semantic redundancy
    * around cluster modes.
    *
    * Output (vec_id, cid, keep) for every vector, ordered by vec_id. */
  def semDedup(emb: DataFrame): DataFrame = {
    val x = normalized(emb).withColumn("xq", quantCol)
    val (_, a2) = ivfCluster(x)
    // materialize the clustered relation once: it feeds both pair sides
    // and the verdict join, and carries the whole k-means lineage
    val m = x.join(a2, "vec_id").select("vec_id", "cid", "v", "nrm")
      .transform(graft.util.Materialize.corpus)
    val l = m.select(col("cid"), col("vec_id").as("a_id"),
      col("v").as("av"), col("nrm").as("an"))
    val r = m.select(col("cid"), col("vec_id").as("b_id"),
      col("v").as("bv"), col("nrm").as("bn"))
    val dups = l.join(r, Seq("cid"))
      .filter(col("a_id") < col("b_id"))
      .filter(floor(dotCols(col("av"), col("bv")) / (col("an") * col("bn")) * 1e6)
        .cast("long") >= SemDedupTauFp)
      .select(col("b_id").as("vec_id")).distinct()
    m.select("vec_id", "cid")
      .join(dups.withColumn("dup", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cid"), coalesce(col("dup"), lit(false)) === false)
      .toDF("vec_id", "cid", "keep")
      .orderBy("vec_id")
  }

  /** The m+dup chain over [[ivfClusterCtes]] — spliced into
    * [[semDedupOracle]] and the trainManifestV2 oracle. */
  private[pipeline] val semDedupCtes: String =
    s"""m AS (SELECT e.vec_id, a2.cid, e.v FROM e JOIN a2 USING (vec_id)),
       |dup AS (SELECT DISTINCT c.vec_id
       |        FROM m q JOIN m c ON q.cid = c.cid AND q.vec_id < c.vec_id
       |        WHERE floor($dotSql / (${nrmSql("q")} * ${nrmSql("c")}) * 1e6)::BIGINT >= $SemDedupTauFp)""".stripMargin

  val semDedupOracle: String =
    s"""$ivfClusterCtes,
       |$semDedupCtes
       |SELECT m.vec_id, m.cid, d.vec_id IS NULL AS keep
       |FROM m LEFT JOIN dup d ON d.vec_id = m.vec_id
       |ORDER BY m.vec_id""".stripMargin

  // ---- cluster quality report ---------------------------------------------

  /** Per-cluster health readout over the shared deterministic k-means
    * ([[ivfCluster]]): member count plus mean/min/max cosine of members to
    * their own centroid — the "is this clustering tight enough to prune
    * against" check run before [[semDedup]] and before trusting
    * [[ivfTopK]]'s probe routing. Centroids are the integer fp-1e6
    * vectors, so the cosine kernel sees exact inputs in both engines; the
    * mean divides via an explicit floor over doubles (sum is exact
    * < 2^53), keeping negative sums engine-identical.
    *
    * Scale shape: one broadcast of IvfK centroids into the member scan,
    * then a map-side-combinable per-cid aggregate — nothing scales past
    * (clusters × stats). Output (cid, n_vectors, mean_cos_fp,
    * min_cos_fp, max_cos_fp). */
  def clusterQuality(emb: DataFrame): DataFrame = {
    val x = normalized(emb).withColumn("xq", quantCol)
    val (c1, a2) = ivfCluster(x)
    val cD = transform(col("c"), y => y.cast("double"))
    val cosFp = floor(dotCols(col("v"), cD) /
      (col("nrm") * sqrt(dotCols(cD, cD))) * 1e6).cast("long")
    x.join(a2, "vec_id").join(broadcast(c1), Seq("cid"))
      .select(col("cid"), cosFp.as("cos_fp"))
      .groupBy("cid")
      .agg(count(lit(1)).as("n_vectors"),
        floor(sum("cos_fp") / count(lit(1))).cast("long").as("mean_cos_fp"),
        min("cos_fp").as("min_cos_fp"), max("cos_fp").as("max_cos_fp"))
      .orderBy("cid")
  }

  val clusterQualityOracle: String = {
    val cDot = "list_reduce(list_transform(range(1, 65), d -> m.v[d] * m.c[d]), (x, y) -> x + y)"
    val cNrm = "sqrt(list_reduce(list_transform(range(1, 65), d -> (m.c[d] * m.c[d])::DOUBLE), (x, y) -> x + y))"
    val vNrm = "sqrt(list_reduce(list_transform(range(1, 65), d -> m.v[d] * m.v[d]), (x, y) -> x + y))"
    s"""$ivfClusterCtes,
       |m AS (SELECT e.vec_id, a2.cid, e.v, c1.c
       |      FROM e JOIN a2 USING (vec_id) JOIN c1 USING (cid)),
       |s AS (SELECT cid,
       |             floor($cDot / ($vNrm * $cNrm) * 1e6)::BIGINT AS cos_fp
       |      FROM m)
       |SELECT cid, count(*) AS n_vectors,
       |       CAST(floor(CAST(sum(cos_fp) AS BIGINT)::DOUBLE / count(*)) AS BIGINT) AS mean_cos_fp,
       |       min(cos_fp) AS min_cos_fp, max(cos_fp) AS max_cos_fp
       |FROM s GROUP BY cid ORDER BY cid""".stripMargin
  }

  // ---- prototype-based data pruning ---------------------------------------

  /** Per-mille of each cluster's MOST prototypical members to drop. */
  val PrunePermille = 250L

  /** Cluster-prototypicality data pruning (published recipe: score every
    * example by cosine to its k-means cluster centroid, then PRUNE the
    * most prototypical — easiest — fraction, keeping the hard examples
    * that carry training signal on large corpora). Reuses the shared
    * deterministic quantized k-means ([[ivfCluster]]) and the exact
    * member-to-centroid cosine kernel from [[clusterQuality]]; the drop
    * count per cluster is floor(n · PrunePermille / 1000), rank ties
    * broken by vec_id, so the keep set is engine-independent.
    *
    * Scale shape: one broadcast of IvfK centroids into the member scan,
    * then a single window partitioned by `cid` — per-cluster sort bounded
    * by n/k members, shuffle keys are cluster ids only (the same cost
    * envelope as [[semDedup]], without the pair stage).
    * Output (vec_id, cid, cos_fp, proto_rank, keep) ordered by vec_id. */
  def prototypePrune(emb: DataFrame): DataFrame = {
    val x = normalized(emb).withColumn("xq", quantCol)
    val (c1, a2) = ivfCluster(x)
    val cD = transform(col("c"), y => y.cast("double"))
    val cosFp = floor(dotCols(col("v"), cD) /
      (col("nrm") * sqrt(dotCols(cD, cD))) * 1e6).cast("long")
    val scored = x.join(a2, "vec_id").join(broadcast(c1), Seq("cid"))
      .select(col("vec_id"), col("cid"), cosFp.as("cos_fp"))
    val wr = Window.partitionBy("cid").orderBy(col("cos_fp").desc, col("vec_id"))
    val wn = Window.partitionBy("cid")
    scored
      .withColumn("proto_rank", row_number().over(wr).cast("long"))
      .withColumn("drop_n",
        floor(count(lit(1)).over(wn) * PrunePermille / 1000.0).cast("long"))
      .select(col("vec_id"), col("cid"), col("cos_fp"), col("proto_rank"),
        (col("proto_rank") > col("drop_n")).as("keep"))
      .orderBy("vec_id")
  }

  val prototypePruneOracle: String = {
    val cDot = "list_reduce(list_transform(range(1, 65), d -> m.v[d] * m.c[d]), (x, y) -> x + y)"
    val cNrm = "sqrt(list_reduce(list_transform(range(1, 65), d -> (m.c[d] * m.c[d])::DOUBLE), (x, y) -> x + y))"
    val vNrm = "sqrt(list_reduce(list_transform(range(1, 65), d -> m.v[d] * m.v[d]), (x, y) -> x + y))"
    s"""$ivfClusterCtes,
       |m AS (SELECT e.vec_id, a2.cid, e.v, c1.c
       |      FROM e JOIN a2 USING (vec_id) JOIN c1 USING (cid)),
       |s AS (SELECT vec_id, cid,
       |             floor($cDot / ($vNrm * $cNrm) * 1e6)::BIGINT AS cos_fp
       |      FROM m),
       |r AS (SELECT vec_id, cid, cos_fp,
       |             row_number() OVER (PARTITION BY cid
       |                                ORDER BY cos_fp DESC, vec_id) AS proto_rank,
       |             count(*) OVER (PARTITION BY cid) AS n
       |      FROM s)
       |SELECT vec_id, cid, cos_fp, proto_rank,
       |       proto_rank > CAST(floor(n * $PrunePermille / 1000.0) AS BIGINT) AS keep
       |FROM r ORDER BY vec_id""".stripMargin
  }

  // ---- int8 quantization --------------------------------------------------

  /** Symmetric int8 quantization per vector: scale = max|v|/127,
    * q_d = floor(v_d/scale + 0.5) (explicit half-up — `round` semantics
    * differ between engines). Emits the per-vector scale (fixed-point)
    * and a position-weighted checksum of the quantized codes, so the
    * oracle verifies every code without shipping arrays. 4× memory cut
    * for the 100 TB ANN path; codes re-expand in the cosine kernel. */
  def quantizeInt8(emb: DataFrame): DataFrame = {
    val v = col("embedding").cast("array<double>")
    val absMax = array_max(transform(v, x => abs(x)))
    val scale = absMax / 127.0
    val q = transform(v, x => floor(x / scale + 0.5).cast("long"))
    emb.select(
        col("vec_id"),
        floor(scale * lit(1e9)).cast("long").as("scale_fp"),
        aggregate(zip_with(q, sequence(lit(1), lit(Dim)), (c, d) => c * d),
          lit(0L), (acc, x) => acc + x).as("q_checksum"))
      .orderBy("vec_id")
  }

  val quantizeInt8Oracle: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |s AS (SELECT vec_id, v,
       |             list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
       |      FROM e)
       |SELECT vec_id,
       |       CAST(floor(scale * 1e9) AS BIGINT) AS scale_fp,
       |       list_reduce(
       |         list_transform(range(1, ${Dim + 1}),
       |           d -> CAST(floor(v[d] / scale + 0.5) AS BIGINT) * d),
       |         (a, b) -> a + b) AS q_checksum
       |FROM s ORDER BY vec_id""".stripMargin

  // ---- product quantization ----------------------------------------------

  val PqM = 4 // subspaces
  val PqSub: Int = Dim / PqM // 16 dims each
  val PqK = 16 // codebook entries per subspace

  /** Product-quantization ANN top-K: per-subspace deterministic k-means
    * codebooks (init = first PqK subvectors, one recompute round — the
    * same fixed-iteration discipline as [[ivfTopK]]), each vector encoded
    * as PqM codebook ids, queries scored by ADC (asymmetric distance:
    * query subvector vs codebook entry of the neighbor's code, summed
    * across subspaces — exact int64 arithmetic end to end).
    *
    * The 100 TB shape this demonstrates: the scan side touches CODES
    * (PqM small ints per vector ≈ 4 bytes) instead of raw vectors
    * (Dim × 8 bytes) — a 64× memory-bandwidth reduction; the per-query
    * distance table (PqM × PqK entries) and the codebooks broadcast. */
  /** The TRAINED PQ structure over the quantized corpus `x`: (final
    * per-subspace codebooks `(m, cid, c)`, corpus codes
    * `(vec_id, m, cid)`). Memoized per (session, corpus) like
    * [[ivfCluster]]: training runs once per run (Bench counts it in its
    * `shared_pq_codes` slot) and [[pqTopK]] measures steady-state query
    * cost against the artifact — the index-build/search split every
    * production PQ deployment has. Assignments use [[argminCode]] (one
    * broadcast codebook array per subspace, map-only argmin) instead of
    * the old crossjoin + groupBy(vec_id, m) exchange; identical
    * lexicographic (d, cid) minima, identical codes. */
  private def pqStruct(x: DataFrame): (DataFrame, DataFrame) =
    graft.util.Memo((x.sparkSession, "Similarity.pqStruct", x.semanticHash())) {
      val subs = x.select(col("vec_id"), col("xq"),
          explode(sequence(lit(0), lit(PqM - 1))).as("m"))
        .select(col("vec_id"), col("m"),
          slice(col("xq"), col("m") * PqSub + 1, lit(PqSub)).as("sub"))
        .transform(graft.util.Materialize.corpus) // feeds codebook build + both assignments
      def assign(cb: DataFrame): DataFrame =
        subs.join(broadcast(cb.groupBy("m").agg(
            collect_list(struct(col("cid").as("id"), col("c"))).as("cbs"))), Seq("m"))
          .select(col("vec_id"), col("m"), argminCode(col("sub"), col("cbs")).as("cid"))
          .filter(col("cid").isNotNull)
      val cb0 = subs.filter(col("vec_id") < PqK)
        .select(col("m"), col("vec_id").as("cid"), col("sub").as("c"))
      val a1 = assign(cb0)
      val cb1 = subs.join(a1, Seq("vec_id", "m"))
        .select(col("m"), col("cid"), col("sub"),
          explode(sequence(lit(1), lit(PqSub))).as("pos"))
        .withColumn("comp", element_at(col("sub"), col("pos")))
        .groupBy("m", "cid", "pos")
        .agg(floor(sum("comp") / count(lit(1))).cast("long").as("cp"))
        .groupBy("m", "cid")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("cp")))),
          s => s.getField("cp")).as("c"))
        .localCheckpoint(true) // consumed by assignment + every query's distance table
      val codes = graft.util.Materialize.corpus(assign(cb1))
      codes.count()
      subs.unpersist(blocking = false) // training-only intermediate
      (cb1, codes)
    }

  /** Force-build the full-corpus PQ structure (Bench's shared_build
    * hook — [[pqTopK]] then measures query cost only). */
  def buildPqIndex(emb: DataFrame): Unit = {
    pqStruct(normalized(emb).withColumn("xq", quantCol))
    ()
  }

  def pqTopK(emb: DataFrame): DataFrame = {
    val x = normalized(emb).withColumn("xq", quantCol)
    val (cb1, codes) = pqStruct(x)
    // query-side distance table: the query rows' subvectors recompute
    // from the (pruned, NumQueries-bounded) scan — same slices the old
    // corpus-wide `subs` relation carried for them
    val dtab = x.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("xq"),
        explode(sequence(lit(0), lit(PqM - 1))).as("m"))
      .select(col("q_id"), col("m"),
        slice(col("xq"), col("m") * PqSub + 1, lit(PqSub)).as("qsub"))
      .join(broadcast(cb1), Seq("m"))
      .select(col("q_id"), col("m"), col("cid"),
        distSq(col("qsub"), col("c")).as("d"))
    val scored = codes.join(broadcast(dtab), Seq("m", "cid"))
      .filter(col("q_id") =!= col("vec_id"))
      .groupBy(col("q_id"), col("vec_id").as("neighbor_id"))
      .agg(sum("d").as("adc_fp"))
    val w = Window.partitionBy("q_id").orderBy(col("adc_fp"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
      .select("q_id", "rank", "neighbor_id", "adc_fp")
      .orderBy("q_id", "rank")
  }

  val pqTopKOracle: String = {
    val dSq = (st: String, ct: String) =>
      s"""list_reduce(list_transform(range(1, ${PqSub + 1}),
         |        d -> ($st.sub[d] - $ct.c[d]) * ($st.sub[d] - $ct.c[d])), (a, b) -> a + b)""".stripMargin
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |x AS (SELECT vec_id,
       |             list_transform(v, y -> CAST(floor(y * 1e6) AS BIGINT)) AS xq FROM e),
       |subs AS (SELECT vec_id, t.m,
       |                xq[t.m * $PqSub + 1 : t.m * $PqSub + $PqSub] AS sub
       |         FROM x, range(0, $PqM) t(m)),
       |cb0 AS (SELECT m, vec_id AS cid, sub AS c FROM subs WHERE vec_id < $PqK),
       |d1 AS (SELECT s.vec_id, s.m, c.cid, ${dSq("s", "c")} AS d
       |       FROM subs s JOIN cb0 c ON c.m = s.m),
       |a1 AS (SELECT vec_id, m, cid FROM (
       |         SELECT vec_id, m, cid,
       |                row_number() OVER (PARTITION BY vec_id, m ORDER BY d, cid) AS rn
       |         FROM d1) t WHERE rn = 1),
       |cp1 AS (SELECT a1.m, a1.cid, t.pos,
       |               CAST(floor(sum(s.sub[t.pos])::DOUBLE / count(*)::DOUBLE) AS BIGINT) AS cp
       |        FROM subs s JOIN a1 ON a1.vec_id = s.vec_id AND a1.m = s.m,
       |             range(1, ${PqSub + 1}) t(pos)
       |        GROUP BY 1, 2, 3),
       |cb1 AS (SELECT m, cid, list(cp ORDER BY pos) AS c FROM cp1 GROUP BY 1, 2),
       |d2 AS (SELECT s.vec_id, s.m, c.cid, ${dSq("s", "c")} AS d
       |       FROM subs s JOIN cb1 c ON c.m = s.m),
       |codes AS (SELECT vec_id, m, cid FROM (
       |            SELECT vec_id, m, cid,
       |                   row_number() OVER (PARTITION BY vec_id, m ORDER BY d, cid) AS rn
       |            FROM d2) t WHERE rn = 1),
       |dtab AS (SELECT s.vec_id AS q_id, s.m, c.cid, ${dSq("s", "c")} AS d
       |         FROM subs s JOIN cb1 c ON c.m = s.m WHERE s.vec_id < $NumQueries),
       |scored AS (SELECT dt.q_id, a.vec_id AS neighbor_id, CAST(sum(dt.d) AS BIGINT) AS adc_fp
       |           FROM codes a JOIN dtab dt ON dt.m = a.m AND dt.cid = a.cid
       |           WHERE dt.q_id != a.vec_id GROUP BY 1, 2),
       |r AS (SELECT q_id, neighbor_id, adc_fp,
       |             row_number() OVER (PARTITION BY q_id
       |                                ORDER BY adc_fp, neighbor_id) AS rank
       |      FROM scored)
       |SELECT q_id, rank, neighbor_id, adc_fp FROM r
       |WHERE rank <= $K ORDER BY q_id, rank""".stripMargin
  }

  // ---- IVF-PQ (IVFADC): coarse cells + residual product codes ------------

  /** IVF-PQ ANN top-K — the inverted-file-with-ADC structure (Jégou,
    * Douze, Schmid, "Product Quantization for Nearest Neighbor Search",
    * TPAMI 2011; FAISS `IVFPQ`): the coarse k-means cells of
    * [[ivfCluster]] prune the corpus, and each member is stored as PqM
    * product codes of its RESIDUAL (xq − cell centroid) against ONE
    * shared residual codebook — residuals concentrate around 0 across
    * cells, so one codebook serves all of them (the paper's key
    * observation). A query probes its NProbe nearest cells, forms its
    * own residual PER CELL, builds the (cell, subspace, code) ADC
    * distance table, and scores members by summed table lookups.
    *
    * The 100 TB shape this adds over [[ivfTopK]] + [[pqTopK]] alone:
    * the scan is restricted to probed cells (IVF pruning) AND touches
    * only PqM-byte codes (PQ compression) — the combination is what
    * production ANN indexes actually ship. Broadcast sides: centroids
    * (IvfK), codebooks (PqM·PqK), ADC table (queries·NProbe·PqM·PqK ≈
    * 13k rows). All arithmetic exact int64; the one float division
    * (centroid/codebook means) is exact under 2^53 as in [[ivfTopK]].
    * Output (q_id, rank, neighbor_id, adc_fp). */
  /** The TRAINED IVF-PQ structure over the quantized corpus `x`:
    * (final shared residual codebooks `(m, cbid, c)`, corpus codes
    * `(vec_id, cid, m, cbid)`). Memoized per (session, corpus) — Bench
    * counts the build once in `shared_ivfpq_codes`; [[ivfpqTopK]]
    * measures query cost. Same [[argminCode]] assignment rewrite as
    * [[pqStruct]] (identical minima, identical codes). */
  private def ivfpqStruct(x: DataFrame): (DataFrame, DataFrame) =
    graft.util.Memo((x.sparkSession, "Similarity.ivfpqStruct", x.semanticHash())) {
      val (cent, asg) = ivfCluster(x)
      // residual per vector, then PqM subspace slices (3 consumers:
      // codebook init, both assignment passes, codebook recompute)
      val subs = x.join(asg, "vec_id").join(broadcast(cent), "cid")
        .select(col("vec_id"), col("cid"),
          zip_with(col("xq"), col("c"), (a, b) => a - b).as("r"))
        .select(col("vec_id"), col("cid"),
          explode(sequence(lit(0), lit(PqM - 1))).as("m"), col("r"))
        .select(col("vec_id"), col("cid"), col("m"),
          expr(s"slice(r, m * $PqSub + 1, $PqSub)").as("sub"))
        .transform(graft.util.Materialize.corpus)
      def assign(cb: DataFrame): DataFrame =
        subs.join(broadcast(cb.groupBy("m").agg(
            collect_list(struct(col("cbid").as("id"), col("c"))).as("cbs"))), Seq("m"))
          .select(col("vec_id"), col("cid"), col("m"),
            argminCode(col("sub"), col("cbs")).as("cbid"))
          .filter(col("cbid").isNotNull)
      val cb0 = subs.filter(col("vec_id") < PqK)
        .select(col("m"), col("vec_id").as("cbid"), col("sub").as("c"))
      val a1 = assign(cb0)
      val cb1 = subs.join(a1.select("vec_id", "m", "cbid"), Seq("vec_id", "m"))
        .select(col("m"), col("cbid"), col("sub"),
          explode(sequence(lit(1), lit(PqSub))).as("pos"))
        .withColumn("comp", element_at(col("sub"), col("pos")))
        .groupBy("m", "cbid", "pos")
        .agg(floor(sum("comp") / count(lit(1))).cast("long").as("cp"))
        .groupBy("m", "cbid")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("cp")))),
          s => s.getField("cp")).as("c"))
        .localCheckpoint(true) // consumed by assignment + every query's ADC table
      val codes = graft.util.Materialize.corpus(assign(cb1))
      codes.count()
      subs.unpersist(blocking = false) // training-only intermediate
      (cb1, codes)
    }

  /** Force-build the full-corpus IVF-PQ structure (Bench's shared_build
    * hook — [[ivfpqTopK]] then measures query cost only). */
  def buildIvfpqIndex(emb: DataFrame): Unit = {
    ivfpqStruct(normalized(emb).withColumn("xq", quantCol))
    ()
  }

  def ivfpqTopK(emb: DataFrame): DataFrame = {
    val x = normalized(emb).withColumn("xq", quantCol)
    val (cent, _) = ivfCluster(x)
    val (cb1, codes) = ivfpqStruct(x)
    // query side: NProbe nearest cells, one residual per probed cell
    val q = x.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("xq").as("qq"))
    val qc = q.join(broadcast(cent), lit(true))
      .select(col("q_id"), col("cid"), col("c"), col("qq"),
        distSq(col("qq"), col("c")).as("d"))
    val wp = Window.partitionBy("q_id").orderBy(col("d"), col("cid"))
    val dtab = qc.withColumn("rn", row_number().over(wp)).filter(col("rn") <= NProbe)
      .select(col("q_id"), col("cid"),
        zip_with(col("qq"), col("c"), (a, b) => a - b).as("qr"))
      .select(col("q_id"), col("cid"),
        explode(sequence(lit(0), lit(PqM - 1))).as("m"), col("qr"))
      .select(col("q_id"), col("cid"), col("m"),
        expr(s"slice(qr, m * $PqSub + 1, $PqSub)").as("qsub"))
      .join(broadcast(cb1), Seq("m"))
      .select(col("q_id"), col("cid"), col("m"), col("cbid"),
        distSq(col("qsub"), col("c")).as("d"))
    val scored = codes.join(broadcast(dtab), Seq("cid", "m", "cbid"))
      .filter(col("q_id") =!= col("vec_id"))
      .groupBy(col("q_id"), col("vec_id").as("neighbor_id"))
      .agg(sum("d").as("adc_fp"))
    val w = Window.partitionBy("q_id").orderBy(col("adc_fp"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
      .select("q_id", "rank", "neighbor_id", "adc_fp")
      .orderBy("q_id", "rank")
  }

  val ivfpqTopKOracle: String = {
    val dSq = (st: String, ct: String) =>
      s"""list_reduce(list_transform(range(1, ${PqSub + 1}),
         |        d -> ($st.sub[d] - $ct.c[d]) * ($st.sub[d] - $ct.c[d])), (a, b) -> a + b)""".stripMargin
    s"""$ivfClusterCtes,
       |rx AS (SELECT x.vec_id, a2.cid,
       |              list_transform(range(1, ${Dim + 1}), d -> x.xq[d] - c1.c[d]) AS r
       |       FROM x JOIN a2 USING (vec_id) JOIN c1 ON c1.cid = a2.cid),
       |psubs AS (SELECT vec_id, cid, t.m,
       |                 r[t.m * $PqSub + 1 : t.m * $PqSub + $PqSub] AS sub
       |          FROM rx, range(0, $PqM) t(m)),
       |pcb0 AS (SELECT m, vec_id AS cbid, sub AS c FROM psubs WHERE vec_id < $PqK),
       |pd1 AS (SELECT s.vec_id, s.m, c.cbid, ${dSq("s", "c")} AS d
       |        FROM psubs s JOIN pcb0 c ON c.m = s.m),
       |pa1 AS (SELECT vec_id, m, cbid FROM (
       |          SELECT vec_id, m, cbid,
       |                 row_number() OVER (PARTITION BY vec_id, m ORDER BY d, cbid) AS rn
       |          FROM pd1) t WHERE rn = 1),
       |pcp AS (SELECT pa1.m, pa1.cbid, t.pos,
       |               CAST(floor(sum(s.sub[t.pos])::DOUBLE / count(*)::DOUBLE) AS BIGINT) AS cp
       |        FROM psubs s JOIN pa1 ON pa1.vec_id = s.vec_id AND pa1.m = s.m,
       |             range(1, ${PqSub + 1}) t(pos)
       |        GROUP BY 1, 2, 3),
       |pcb1 AS (SELECT m, cbid, list(cp ORDER BY pos) AS c FROM pcp GROUP BY 1, 2),
       |pd2 AS (SELECT s.vec_id, s.cid, s.m, c.cbid, ${dSq("s", "c")} AS d
       |        FROM psubs s JOIN pcb1 c ON c.m = s.m),
       |pcodes AS (SELECT vec_id, cid, m, cbid FROM (
       |             SELECT vec_id, cid, m, cbid,
       |                    row_number() OVER (PARTITION BY vec_id, m ORDER BY d, cbid) AS rn
       |             FROM pd2) t WHERE rn = 1),
       |qd AS (SELECT x.vec_id AS q_id, c.cid,
       |              list_reduce(list_transform(range(1, ${Dim + 1}),
       |                d -> (x.xq[d] - c.c[d]) * (x.xq[d] - c.c[d])), (a, b) -> a + b) AS d
       |       FROM x, c1 c WHERE x.vec_id < $NumQueries),
       |probes AS (SELECT q_id, cid FROM (
       |             SELECT q_id, cid,
       |                    row_number() OVER (PARTITION BY q_id ORDER BY d, cid) AS rn
       |             FROM qd) t WHERE rn <= $NProbe),
       |qr AS (SELECT p.q_id, p.cid,
       |              list_transform(range(1, ${Dim + 1}), d -> x.xq[d] - c1.c[d]) AS r
       |       FROM probes p JOIN x ON x.vec_id = p.q_id JOIN c1 ON c1.cid = p.cid),
       |qsub AS (SELECT q_id, cid, t.m,
       |                r[t.m * $PqSub + 1 : t.m * $PqSub + $PqSub] AS sub
       |         FROM qr, range(0, $PqM) t(m)),
       |dtab AS (SELECT s.q_id, s.cid, s.m, c.cbid, ${dSq("s", "c")} AS d
       |         FROM qsub s JOIN pcb1 c ON c.m = s.m),
       |scored AS (SELECT dt.q_id, k.vec_id AS neighbor_id, CAST(sum(dt.d) AS BIGINT) AS adc_fp
       |           FROM pcodes k
       |           JOIN dtab dt ON dt.cid = k.cid AND dt.m = k.m AND dt.cbid = k.cbid
       |           WHERE dt.q_id != k.vec_id GROUP BY 1, 2),
       |rk AS (SELECT q_id, neighbor_id, adc_fp,
       |              row_number() OVER (PARTITION BY q_id
       |                                 ORDER BY adc_fp, neighbor_id) AS rank
       |       FROM scored)
       |SELECT q_id, rank, neighbor_id, adc_fp FROM rk
       |WHERE rank <= $K ORDER BY q_id, rank""".stripMargin
  }

  // ---- matryoshka truncation ---------------------------------------------

  /** Matryoshka dimensionality reduction: keep the first 16 components,
    * L2-renormalize — the "truncate an MRL-trained embedding" shape.
    * Output is (vec_id, prefix-norm, position-weighted checksum of the
    * renormalized fixed-point components): verifies every component
    * without shipping the array. Narrow per-row projection, no shuffle;
    * both the norm fold and the checksum fold run in ascending index
    * order in both engines (bit-identical doubles). */
  val MatDim = 16

  def matryoshka(emb: DataFrame): DataFrame = {
    val p = slice(col("embedding").cast("array<double>"), 1, MatDim)
    val nrm = sqrt(aggregate(p, lit(0.0), (a, x) => a + x * x))
    emb.select(
        col("vec_id"),
        floor(nrm * 1e6).cast("long").as("norm_fp"),
        aggregate(
          zip_with(
            transform(p, x => floor(x / nrm * 1e6).cast("long")),
            sequence(lit(1), lit(MatDim)), (c, d) => c * d),
          lit(0L), (acc, x) => acc + x).as("m_checksum"))
      .orderBy("vec_id")
  }

  val matryoshkaOracle: String =
    s"""WITH e AS (SELECT vec_id, (embedding::DOUBLE[])[1:$MatDim] AS p FROM embeddings),
       |n AS (SELECT vec_id, p,
       |             sqrt(list_reduce(list_prepend(0.0::DOUBLE, p), (a, x) -> a + x * x)) AS nrm
       |      FROM e)
       |SELECT vec_id,
       |       CAST(floor(nrm * 1e6) AS BIGINT) AS norm_fp,
       |       list_reduce(
       |         list_transform(range(1, ${MatDim + 1}),
       |           d -> CAST(floor(p[d] / nrm * 1e6) AS BIGINT) * d),
       |         (a, b) -> a + b) AS m_checksum
       |FROM n ORDER BY vec_id""".stripMargin

  // ---- Johnson-Lindenstrauss random projection ---------------------------

  /** Target dimensionality for [[rpProject]]. */
  val RpK = 16

  /** ±1 sign matrix (RpK × Dim) from one LCG stream; the SAME Scala
    * values are interpolated into the oracle SQL, so both engines apply
    * the identical projection. */
  private val rpSigns: Array[Array[Int]] = {
    var s = 0x9E3779B97F4A7C15L
    Array.fill(RpK, Dim) {
      s = s * 6364136223846793005L + 1442695040888963407L
      if (((s >>> 33) & 1L) == 0L) 1 else -1
    }
  }

  /** Johnson-Lindenstrauss random projection (Achlioptas 2003 database-
    * friendly ±1 form): Dim → [[RpK]] via a fixed sign matrix — the
    * cheap dimensionality-reduction step a 100 TB pipeline runs before
    * clustering or coarse ANN when trained projections aren't worth the
    * pass. With ±1 entries, E[‖y‖²/K] = ‖x‖², so the per-vector
    * distortion readout dist_fp = 1e4·‖y‖²/(K·‖x‖²) concentrates at
    * 10000 — emitted per row so the tail (the vectors JL treats worst)
    * is directly visible, not averaged away.
    *
    * Scale shape: one codegen'd map pass, no shuffle at all (16 dotF64
    * folds against literal arrays); zero vectors report dist_fp = −1
    * instead of dividing. Output (vec_id, y0_fp..y3_fp, dist_fp). */
  def rpProject(emb: DataFrame): DataFrame = {
    val e = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val ys = (0 until RpK).map { j =>
      dotCols(col("v"), array(rpSigns(j).map(s => lit(s.toDouble)): _*)).as(s"y$j")
    }
    val proj = e.select(col("vec_id") +: ys :+ dotCols(col("v"), col("v")).as("x2"): _*)
    val yss = expr((0 until RpK).map(j => s"y$j * y$j").mkString(" + "))
    proj
      .withColumn("dist_fp",
        when(col("x2") === 0.0, lit(-1L)).otherwise(
          floor(lit(10000.0) * yss / (lit(RpK.toDouble) * col("x2"))).cast("long")))
      .select(col("vec_id") +:
        (0 until 4).map(j => floor(col(s"y$j") * 100).cast("long").as(s"y${j}_fp")) :+
        col("dist_fp"): _*)
      .orderBy("vec_id")
  }

  val rpProjectOracle: String = {
    def signList(j: Int) = rpSigns(j).mkString("[", ", ", "]")
    def yj(j: Int) =
      s"list_reduce(list_transform(range(1, ${Dim + 1}), d -> (${signList(j)}[d]) * v[d]), (x, y) -> x + y) AS y$j"
    val yss = (0 until RpK).map(j => s"y$j * y$j").mkString(" + ")
    s"""WITH ev AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |p AS (SELECT vec_id,
       |  ${(0 until RpK).map(yj).mkString(",\n|  ")},
       |  list_reduce(list_transform(range(1, ${Dim + 1}), d -> v[d] * v[d]), (x, y) -> x + y) AS x2
       |FROM ev)
       |SELECT vec_id,
       |  ${(0 until 4).map(j => s"floor(y$j * 100)::BIGINT AS y${j}_fp").mkString(",\n|  ")},
       |  CASE WHEN x2 = 0 THEN -1
       |       ELSE floor((10000.0::DOUBLE * ($yss)) / (${RpK}.0::DOUBLE * x2))::BIGINT
       |  END AS dist_fp
       |FROM p ORDER BY vec_id""".stripMargin
  }

  // ---- label centroids & kNN classification ------------------------------

  /** Per-label centroid, emitted as exploded (label, pos, mean_fp) rows —
    * elementwise mean over the embedding column. One shuffle on
    * (label, pos); map-side partial aggregation carries the sums. */
  def centroids(emb: DataFrame): DataFrame =
    emb.select(col("label"), col("embedding").cast("array<double>").as("v"))
      .select(col("label"), col("v"), explode(sequence(lit(1), lit(Dim))).as("pos"))
      .withColumn("component", element_at(col("v"), col("pos")))
      .groupBy("label", "pos")
      .agg(floor(avg(col("component")) * 1e6).cast("long").as("mean_fp"))
      .orderBy("label", "pos")

  val centroidsOracle: String =
    s"""SELECT label, t.pos,
       |       CAST(floor(avg(embedding[t.pos]::DOUBLE) * 1e6) AS BIGINT) AS mean_fp
       |FROM embeddings, range(1, ${Dim + 1}) t(pos)
       |GROUP BY 1, 2 ORDER BY label, pos""".stripMargin

  /** ANN evaluation: recall@K of every approximate index against the
    * exact [[bruteTopK]] ground truth, as a first-class operator — the
    * measurement that decides which index a 100 TB deployment ships.
    * recall_fp = |approx ∩ exact| × 1e6 / (NumQueries × K). Ground truth
    * is materialized once and semi-joined against each method's result;
    * each method's cost is its own entry's cost (this op IS the four
    * pipelines plus four tiny joins). Output (method, recall_fp). */
  /** The raw per-method builders, by report row name. */
  private val methodBuilders: Seq[(String, DataFrame => DataFrame)] = Seq(
    "brute" -> bruteTopK _,
    "graph" -> graphTopK _,
    "hamming" -> hammingTopK _,
    "ivf" -> ivfTopK _,
    "ivfpq" -> ivfpqTopK _,
    "lsh" -> lshTopK _,
    "pq" -> pqTopK _)

  /** One MATERIALIZED top-K relation per index method, memoized per
    * (session, input plan) — round-6 verdict item 2: both eval reports
    * consume every method's top-K, so each index (IVF k-means, the PQ /
    * IVF-PQ codebooks, the brute truth) trains ONCE per run instead of
    * once per report. Each relation is ≤ NumQueries·K rows → bounded.
    * Bench builds these in its timed shared_build phase; Verify's first
    * consuming entry builds lazily. */
  def methodTopKs(emb: DataFrame): Seq[(String, DataFrame)] = {
    // the per-method builds are independent job DAGs over one corpus —
    // launch them concurrently so the sample-scale index builds overlap
    // on the scheduler (local[32]: wall ≈ the slowest build, not the
    // sum; on a cluster, concurrent stages pipeline through executors).
    // A racy double-build of the shared ivfCluster memo wastes a few
    // overlapped cycles at worst (Memo is last-writer-wins by design).
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val key = emb.semanticHash()
    Await.result(Future.traverse(methodBuilders) { case (name, build) =>
      Future(name -> graft.util.Memo(
        (emb.sparkSession, s"Similarity.topk.$name", key)) {
        graft.util.Materialize.bounded(build(emb))
      })
    }, Duration.Inf)
  }

  def annRecall(emb: DataFrame): DataFrame = {
    val topks = methodTopKs(emb).toMap
    val truth = topks("brute").select("q_id", "neighbor_id")
    // denominator = ACTUAL truth size, not NumQueries*K: identical when the
    // corpus is large enough, and correct when the input is a sampled
    // subset (queries that fall out of the sample shrink the truth)
    val tot = truth.agg(count(lit(1)).as("n_truth"))
    Seq("graph", "hamming", "ivf", "ivfpq", "lsh", "pq").map { name =>
      topks(name).select("q_id", "neighbor_id")
        .join(broadcast(truth), Seq("q_id", "neighbor_id"), "left_semi")
        .agg(count(lit(1)).as("hits"))
        .crossJoin(broadcast(tot))
        .select(lit(name).as("method"),
          expr("hits * 1000000 div greatest(n_truth, 1)").as("recall_fp"))
    }.reduce(_ unionByName _).orderBy("method")
  }

  def annRecallOracle: String = {
    def block(name: String, oracle: String) =
      s"""SELECT '$name' AS method,
         |       CAST(count(*) * 1000000 // greatest((SELECT count(*) FROM truth), 1) AS BIGINT) AS recall_fp
         |FROM (SELECT * FROM ($oracle) g
         |      WHERE EXISTS (SELECT 1 FROM truth t
         |                    WHERE t.q_id = g.q_id AND t.neighbor_id = g.neighbor_id)) m""".stripMargin
    s"""WITH truth AS (SELECT q_id, neighbor_id FROM ($bruteTopKOracle) b)
       |${block("graph", graphTopKOracle)}
       |UNION ALL
       |${block("hamming", hammingTopKOracle)}
       |UNION ALL
       |${block("ivf", ivfTopKOracle)}
       |UNION ALL
       |${block("ivfpq", ivfpqTopKOracle)}
       |UNION ALL
       |${block("lsh", lshTopKOracle)}
       |UNION ALL
       |${block("pq", pqTopKOracle)}
       |ORDER BY method""".stripMargin
  }

  /** Retrieval ranking metrics for every index (brute + the four ANN
    * methods) against LABEL relevance: a retrieved neighbor is relevant
    * iff it shares the query's label. Reports MRR (mean reciprocal rank
    * of the first relevant hit), hit-rate, and mean precision@[[K]] —
    * the retrieval-quality complement of [[annRecall]]'s overlap-with-
    * exact measure (an index can have high brute-recall yet poor label
    * precision, and vice versa). Denominators are the FIXED query count,
    * so a method that misses a query entirely scores it as a miss rather
    * than shrinking its own denominator.
    *
    * All-integer: rr = 1e6 div rank (reciprocals of integer ranks),
    * precision in 1e6, hit-rate per-mille. The label relation is
    * corpus-keyed but join-pruned to (vec_id, label) and broadcast.
    * Output (method, mrr_fp, hit_pm, mean_prec_fp), 5 rows. */
  def rankingMetrics(emb: DataFrame): DataFrame = {
    val labels = emb.select("vec_id", "label").localCheckpoint(true)
    def metricsFor(name: String, df: DataFrame): DataFrame = {
      val perQ = df.select("q_id", "rank", "neighbor_id")
        .join(broadcast(labels.select(col("vec_id").as("q_id"), col("label").as("ql"))), Seq("q_id"))
        .join(broadcast(labels.select(col("vec_id").as("neighbor_id"), col("label").as("nl"))),
          Seq("neighbor_id"))
        .withColumn("rel", (col("ql") === col("nl")).cast("long"))
        .groupBy("q_id").agg(
          min(when(col("rel") === 1L, col("rank"))).as("first_rel"),
          sum("rel").as("n_rel"))
      perQ.agg(
          sum(expr("coalesce(1000000 div first_rel, 0)")).as("rr_sum"),
          sum(when(col("first_rel").isNotNull, 1L).otherwise(0L)).as("n_hit"),
          sum("n_rel").as("rel_sum"))
        .select(lit(name).as("method"),
          expr(s"rr_sum div $NumQueries").as("mrr_fp"),
          expr(s"n_hit * 1000 div $NumQueries").as("hit_pm"),
          expr(s"rel_sum * 1000000 div ${NumQueries * K}").as("mean_prec_fp"))
    }
    methodTopKs(emb).map { case (n, df) => metricsFor(n, df) }
      .reduce(_ unionByName _).orderBy("method")
  }

  def rankingMetricsOracle: String = {
    def block(name: String, oracle: String) =
      s"""SELECT '$name' AS method,
         |       CAST(sum(COALESCE(1000000 // first_rel, 0)) // $NumQueries AS BIGINT) AS mrr_fp,
         |       CAST(sum(CASE WHEN first_rel IS NOT NULL THEN 1 ELSE 0 END) * 1000
         |            // $NumQueries AS BIGINT) AS hit_pm,
         |       CAST(sum(n_rel) * 1000000 // ${NumQueries * K} AS BIGINT) AS mean_prec_fp
         |FROM (
         |  SELECT j.q_id,
         |         min(CASE WHEN j.rel THEN j.rank END) AS first_rel,
         |         sum(CASE WHEN j.rel THEN 1 ELSE 0 END) AS n_rel
         |  FROM (
         |    SELECT m.q_id, m.rank, (ql.label = nl.label) AS rel
         |    FROM ($oracle) m
         |    JOIN embeddings ql ON ql.vec_id = m.q_id
         |    JOIN embeddings nl ON nl.vec_id = m.neighbor_id) j
         |  GROUP BY j.q_id) pq""".stripMargin
    s"""${block("brute", bruteTopKOracle)}
       |UNION ALL
       |${block("graph", graphTopKOracle)}
       |UNION ALL
       |${block("hamming", hammingTopKOracle)}
       |UNION ALL
       |${block("ivf", ivfTopKOracle)}
       |UNION ALL
       |${block("ivfpq", ivfpqTopKOracle)}
       |UNION ALL
       |${block("lsh", lshTopKOracle)}
       |UNION ALL
       |${block("pq", pqTopKOracle)}
       |ORDER BY method""".stripMargin
  }

  /** Outliers kept per label. */
  val OutlierK = 10

  /** Embedding outlier detection: the [[OutlierK]] vectors per label
    * with the LOWEST cosine to their own label centroid — the curation
    * step that flags mislabeled/noise vectors before training. The
    * centroid is the [[centroids]] output re-assembled from its
    * fixed-point components (quantizing first makes the cosine a
    * deterministic function of values both engines already hash-match —
    * raw averaged centroids would leak summation-order ulps into the
    * ranking). Centroid relation is label-cardinality-sized → broadcast;
    * the corpus side streams once. Output (label, rank, vec_id,
    * cos_fp). */
  def centroidOutliers(emb: DataFrame): DataFrame = {
    val cvec = centroids(emb).groupBy("label")
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("mean_fp")))),
        s => s.getField("mean_fp").cast("double") / 1e6).as("c"))
    val e = emb.select(col("vec_id"), col("label"),
      col("embedding").cast("array<double>").as("v"))
    val scored = e.join(broadcast(cvec), Seq("label"))
      .select(col("label"), col("vec_id"),
        floor(dotCols(col("v"), col("c")) / (norm(col("v")) * norm(col("c"))) * 1e6)
          .cast("long").as("cos_fp"))
    val w = Window.partitionBy("label").orderBy(col("cos_fp"), col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= OutlierK)
      .select("label", "rank", "vec_id", "cos_fp")
      .orderBy("label", "rank")
  }

  val centroidOutliersOracle: String = {
    val dotVC = "list_reduce(list_transform(range(1, 65), d -> e.v[d] * cv.c[d]), (x, y) -> x + y)"
    val nrmV = "sqrt(list_reduce(list_transform(range(1, 65), d -> e.v[d] * e.v[d]), (x, y) -> x + y))"
    val nrmC = "sqrt(list_reduce(list_transform(range(1, 65), d -> cv.c[d] * cv.c[d]), (x, y) -> x + y))"
    s"""WITH cent AS (
       |  SELECT label, t.pos,
       |         CAST(floor(avg(embedding[t.pos]::DOUBLE) * 1e6) AS BIGINT) AS mean_fp
       |  FROM embeddings, range(1, ${Dim + 1}) t(pos)
       |  GROUP BY 1, 2),
       |cv AS (SELECT label, list(mean_fp::DOUBLE / 1e6 ORDER BY pos) AS c
       |       FROM cent GROUP BY label),
       |e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
       |s AS (
       |  SELECT e.label, e.vec_id,
       |         floor($dotVC / ($nrmV * $nrmC) * 1e6)::BIGINT AS cos_fp
       |  FROM e JOIN cv USING (label)),
       |r AS (
       |  SELECT label, vec_id, cos_fp,
       |         row_number() OVER (PARTITION BY label ORDER BY cos_fp, vec_id) AS rank
       |  FROM s)
       |SELECT label, rank, vec_id, cos_fp FROM r
       |WHERE rank <= $OutlierK ORDER BY label, rank""".stripMargin
  }

  /** Nearest-centroid classification + confusion matrix — the
    * linear-time domain/topic classifier (Rocchio): each vector is
    * assigned the label of its most-cosine-similar label centroid, and
    * the output is the (true label, predicted label, n) confusion
    * relation. Complements [[knnClassify]]: the centroid model is
    * O(corpus × labels) instead of O(corpus × corpus-candidates), which
    * is the shape a 100 TB corpus actually classifies under.
    *
    * Determinism: centroids are re-assembled from their fixed-point
    * components (same contract as [[centroidOutliers]]); argmax runs on
    * the quantized cos_fp with smaller-label tie-break, expressed as
    * max(struct(cos_fp, −label)) so the per-vector decision is a
    * map-side-combinable hash aggregate, not a window sort. Scale: the
    * centroid relation is label-cardinality-sized → broadcast; the
    * corpus streams once through a ×labels projection; the confusion
    * output is labels²-bounded. */
  /** Per-vector nearest-centroid prediction with its score — the shared
    * core of [[centroidClassify]] (confusion matrix) and
    * [[centroidCalibration]] (reliability diagram).
    * Ties on cos_fp break to the LOWEST label (max of (cos, −label)). */
  private def centroidScored(emb: DataFrame): DataFrame = {
    val cvec = centroids(emb).groupBy("label")
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("mean_fp")))),
        s => s.getField("mean_fp").cast("double") / 1e6).as("c"))
      .withColumnRenamed("label", "c_label")
    val e = emb.select(col("vec_id"), col("label"),
      col("embedding").cast("array<double>").as("v"))
    e.crossJoin(broadcast(cvec))
      .select(col("vec_id"), col("label"),
        struct(
          floor(dotCols(col("v"), col("c")) / (norm(col("v")) * norm(col("c"))) * 1e6)
            .cast("long").as("cos_fp"),
          (-col("c_label")).as("neg_label")).as("cand"))
      .groupBy("vec_id", "label")
      .agg(max(col("cand")).as("best"))
      .select(col("vec_id"), col("label"),
        (-col("best.neg_label")).cast("long").as("pred_label"),
        col("best.cos_fp").as("cos_fp"))
  }

  def centroidClassify(emb: DataFrame): DataFrame =
    centroidScored(emb)
      .groupBy("label", "pred_label")
      .agg(count(lit(1)).as("n"))
      .orderBy("label", "pred_label")

  /** Reliability diagram / calibration readout for the nearest-centroid
    * classifier (the ECE binning of Guo et al. 2017): confidence = the
    * winning cosine mapped to [0, 1] (fixed-point 1e4), bucketed into
    * ten bins; each bin reports its size, accuracy, mean confidence and
    * |confidence − accuracy| gap — the per-bin terms of expected
    * calibration error, emitted unaggregated so the miscalibrated
    * REGION is visible, not just the scalar. All integer arithmetic
    * after the shared scored relation; one shuffle on the 10-row bin
    * key. Output (bin, n, n_correct, mean_conf_fp, acc_fp, gap_fp). */
  def centroidCalibration(emb: DataFrame): DataFrame =
    centroidScored(emb)
      .withColumn("conf_fp", expr("(cos_fp + 1000000) div 200"))
      .withColumn("bin", least(expr("conf_fp div 1000"), lit(9L)))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum(when(col("pred_label") === col("label"), 1L).otherwise(0L)).as("n_correct"),
        sum("conf_fp").as("sc"))
      .select(col("bin"), col("n"), col("n_correct"),
        expr("sc div n").as("mean_conf_fp"),
        expr("n_correct * 10000 div n").as("acc_fp"))
      .withColumn("gap_fp", abs(col("mean_conf_fp") - col("acc_fp")))
      .orderBy("bin")

  /** Shared CTE chain ending in the per-vector winner relation `w`
    * (vec_id, label, pred_label, cos_fp) — the oracle mirror of
    * [[centroidScored]]. */
  private val centroidScoredCte: String = {
    val dotVC = s"list_reduce(list_transform(range(1, ${Dim + 1}), d -> e.v[d] * cv.c[d]), (x, y) -> x + y)"
    val nrmV = s"sqrt(list_reduce(list_transform(range(1, ${Dim + 1}), d -> e.v[d] * e.v[d]), (x, y) -> x + y))"
    val nrmC = s"sqrt(list_reduce(list_transform(range(1, ${Dim + 1}), d -> cv.c[d] * cv.c[d]), (x, y) -> x + y))"
    s"""cent AS (
       |  SELECT label, t.pos,
       |         CAST(floor(avg(embedding[t.pos]::DOUBLE) * 1e6) AS BIGINT) AS mean_fp
       |  FROM embeddings, range(1, ${Dim + 1}) t(pos)
       |  GROUP BY 1, 2),
       |cv AS (SELECT label AS c_label, list(mean_fp::DOUBLE / 1e6 ORDER BY pos) AS c
       |       FROM cent GROUP BY label),
       |e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
       |s AS (
       |  SELECT e.vec_id, e.label, cv.c_label,
       |         floor($dotVC / ($nrmV * $nrmC) * 1e6)::BIGINT AS cos_fp
       |  FROM e CROSS JOIN cv),
       |p AS (
       |  SELECT vec_id, label, c_label AS pred_label, cos_fp,
       |         row_number() OVER (PARTITION BY vec_id
       |                            ORDER BY cos_fp DESC, c_label) AS rn
       |  FROM s),
       |w AS (SELECT vec_id, label, CAST(pred_label AS BIGINT) AS pred_label, cos_fp
       |      FROM p WHERE rn = 1)""".stripMargin
  }

  val centroidClassifyOracle: String =
    s"""WITH $centroidScoredCte
       |SELECT label, pred_label, count(*) AS n
       |FROM w GROUP BY 1, 2 ORDER BY label, pred_label""".stripMargin

  val centroidCalibrationOracle: String =
    s"""WITH $centroidScoredCte,
       |cf AS (SELECT label, pred_label, (cos_fp + 1000000) // 200 AS conf_fp FROM w),
       |b AS (SELECT least(conf_fp // 1000, 9) AS bin, count(*) AS n,
       |             CAST(sum(CASE WHEN pred_label = label THEN 1 ELSE 0 END) AS BIGINT)
       |               AS n_correct,
       |             CAST(sum(conf_fp) AS BIGINT) AS sc
       |      FROM cf GROUP BY 1)
       |SELECT bin, n, n_correct, sc // n AS mean_conf_fp,
       |       n_correct * 10000 // n AS acc_fp,
       |       abs(sc // n - n_correct * 10000 // n) AS gap_fp
       |FROM b ORDER BY bin""".stripMargin

  /** kNN label vote: predict each query vector's label from its 5 exact
    * nearest neighbors (majority, ties broken by smaller label).
    * Composition of [[bruteTopK]] + a broadcast label join + a windowed
    * vote — shows the ANN result feeding a downstream decision. */
  def knnClassify(emb: DataFrame, k: Int = 5): DataFrame = {
    val neighbors = bruteTopK(emb).filter(col("rank") <= k)
    val labels = emb.select(col("vec_id").as("neighbor_id"), col("label"))
    val votes = neighbors.join(broadcast(labels), Seq("neighbor_id"))
      .groupBy("q_id", "label").agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy("q_id").orderBy(col("votes").desc, col("label"))
    votes.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("q_id"), col("label").as("pred_label"), col("votes"))
      .orderBy("q_id")
  }

  /** Hard-negative mining (contrastive-training data prep): for each
    * query vector, the K most similar vectors whose LABEL differs — the
    * "close but wrong" examples a contrastive loss learns most from.
    * Margin = how much closer the hardest negative is than the FARTHEST
    * top-K positive (positive-negative gap, fixed-point 1e6).
    *
    * Scale shape: identical to [[bruteTopK]] — queries broadcast into one
    * corpus scan (swap in the LSH/IVF candidate stage for a 100 TB corpus;
    * the label filter composes with any of them unchanged).
    * Output (q_id, rank, neg_id, neg_label, cos_fp, margin_fp). */
  val HardNegK = 5 // shared by the operator default AND its oracle SQL
  def hardNegatives(emb: DataFrame, k: Int = HardNegK): DataFrame = {
    val e = normalized(emb)
      .join(emb.select(col("vec_id"), col("label")), Seq("vec_id"))
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"),
        col("label").as("q_label"))
    val scored = e.join(broadcast(q), col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("q_label"), col("vec_id").as("neighbor_id"),
        col("label"),
        floor(dotCols(col("qv"), col("v")) / (col("qn") * col("nrm")) * 1e6)
          .cast("long").as("cos_fp"))
    val wNeg = Window.partitionBy("q_id")
      .orderBy(col("cos_fp").desc, col("neighbor_id"))
    val negs = scored.filter(col("label") =!= col("q_label"))
      .withColumn("rank", row_number().over(wNeg).cast("long"))
      .filter(col("rank") <= k)
    val posFloor = scored.filter(col("label") === col("q_label"))
      .withColumn("prank", row_number().over(wNeg))
      .filter(col("prank") <= k)
      .groupBy("q_id").agg(min("cos_fp").as("pos_floor_fp"))
    negs.join(broadcast(posFloor), Seq("q_id"), "left")
      .select(col("q_id"), col("rank"), col("neighbor_id").as("neg_id"),
        col("label").as("neg_label"), col("cos_fp"),
        (col("cos_fp") - coalesce(col("pos_floor_fp"), lit(0L))).as("margin_fp"))
      .orderBy("q_id", "rank")
  }

  val hardNegativesOracle: String =
    s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
       |scored AS (
       |  SELECT q.vec_id AS q_id, q.label AS q_label, c.vec_id AS neighbor_id,
       |         c.label,
       |         floor($dotSql / (${nrmSql("q")} * ${nrmSql("c")}) * 1e6)::BIGINT AS cos_fp
       |  FROM e q JOIN e c ON q.vec_id < $NumQueries AND c.vec_id <> q.vec_id),
       |negs AS (
       |  SELECT q_id, neighbor_id AS neg_id, label AS neg_label, cos_fp,
       |         row_number() OVER (PARTITION BY q_id ORDER BY cos_fp DESC, neighbor_id) AS rank
       |  FROM scored WHERE label <> q_label),
       |pos AS (
       |  SELECT q_id, cos_fp,
       |         row_number() OVER (PARTITION BY q_id ORDER BY cos_fp DESC, neighbor_id) AS prank
       |  FROM scored WHERE label = q_label),
       |pf AS (SELECT q_id, min(cos_fp) AS pos_floor_fp FROM pos WHERE prank <= $HardNegK GROUP BY q_id)
       |SELECT n.q_id, n.rank, n.neg_id, n.neg_label, n.cos_fp,
       |       n.cos_fp - coalesce(pf.pos_floor_fp, 0) AS margin_fp
       |FROM negs n LEFT JOIN pf ON pf.q_id = n.q_id
       |WHERE n.rank <= $HardNegK ORDER BY n.q_id, n.rank""".stripMargin

  val knnClassifyOracle: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |scored AS (
       |  SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
       |         floor($dotSql / (${nrmSql("q")} * ${nrmSql("c")}) * 1e6)::BIGINT AS cos_fp
       |  FROM e q JOIN e c ON q.vec_id < $NumQueries AND c.vec_id <> q.vec_id),
       |ranked AS (
       |  SELECT q_id, neighbor_id,
       |         row_number() OVER (PARTITION BY q_id ORDER BY cos_fp DESC, neighbor_id) AS rank
       |  FROM scored),
       |votes AS (
       |  SELECT r.q_id, emb.label, count(*) AS votes
       |  FROM ranked r JOIN embeddings emb ON emb.vec_id = r.neighbor_id
       |  WHERE r.rank <= 5 GROUP BY 1, 2),
       |top AS (
       |  SELECT q_id, label, votes,
       |         row_number() OVER (PARTITION BY q_id ORDER BY votes DESC, label) AS rn
       |  FROM votes)
       |SELECT q_id, label AS pred_label, votes FROM top WHERE rn = 1 ORDER BY q_id""".stripMargin

  /** DuckDB twin of [[bucketCol]]'s single-band NumPlanes-bit bucket
    * (same LCG plane stream) over a relation aliased `t` with column v. */
  private def lshPlaneDotSql(t: String, j: Int): String =
    s"""list_reduce(list_transform(range(0, $Dim),
       |      d -> $t.v[d+1] * ((((((2654435761 * (${j * Dim} + d + 1)) % 2147483647) * ((2654435761 * (${j * Dim} + d + 1)) % 2147483647) + ((2654435761 * (${j * Dim} + d + 1)) % 2147483647)) % 2147483647) % 2001) - 1000)),
       |    (x, y) -> x + y)""".stripMargin
  private def lshBucketSql(t: String): String = (0 until NumPlanes)
    .map(j => s"(CASE WHEN ${lshPlaneDotSql(t, j)} > 0 THEN ${1L << j} ELSE 0 END)")
    .mkString("(", " + ", ")")

  val lshTopKOracle: String = {
    val bucket = lshBucketSql _
    s"""WITH e AS (
       |  SELECT vec_id, v, ${bucket("t")} AS bucket
       |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings) t),
       |scored AS (
       |  SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
       |         floor($dotSql / (${nrmSql("q")} * ${nrmSql("c")}) * 1e6)::BIGINT AS cos_fp
       |  FROM e q JOIN e c
       |    ON q.vec_id < $NumQueries AND c.bucket = q.bucket AND c.vec_id <> q.vec_id),
       |ranked AS (
       |  SELECT q_id, neighbor_id, cos_fp,
       |         row_number() OVER (PARTITION BY q_id ORDER BY cos_fp DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT q_id, rank, neighbor_id, cos_fp FROM ranked
       |WHERE rank <= $K ORDER BY q_id, rank""".stripMargin
  }

  /** DuckDB twin of [[graphTopK]]: the [[GraphHops]]=2 beam loop
    * unrolled (seeds → sc0/f0 → hop x1/sc1/f1 → hop x2/sc2 → final rank
    * over the visited union). Splices Dedup.knnEdgesCte (ev, bands,
    * cand, dir, scored, r) for the edge list and the shared LSH bucket
    * stream for the seeds. */
  lazy val graphTopKOracle: String = {
    def scoreSql(src: String) =
      s"""SELECT s.q_id, s.id,
         |       floor($dotSql / (${nrmSql("q")} * ${nrmSql("c")}) * 1e6)::BIGINT AS cos_fp
         |FROM $src s JOIN ev q ON q.vec_id = s.q_id JOIN ev c ON c.vec_id = s.id""".stripMargin
    def beamSql(src: String) =
      s"""SELECT q_id, id FROM (
         |  SELECT q_id, id,
         |         row_number() OVER (PARTITION BY q_id ORDER BY cos_fp DESC, id) AS rk
         |  FROM $src) t WHERE rk <= $GraphBeam""".stripMargin
    s"""WITH ${Dedup.knnEdgesCte},
       |eg AS (SELECT vec_id, ${lshBucketSql("t")} AS bucket
       |       FROM (SELECT vec_id, v FROM ev) t),
       |edges AS (SELECT vec_id AS id, neighbor_id AS nb FROM r
       |          WHERE rank <= ${Dedup.KnnGraphK}),
       |seeds AS (SELECT q.vec_id AS q_id, c.vec_id AS id
       |          FROM eg q JOIN eg c ON q.vec_id < $NumQueries
       |            AND c.bucket = q.bucket AND c.vec_id <> q.vec_id
       |          UNION
       |          SELECT ed.id AS q_id, ed.nb AS id FROM edges ed
       |          WHERE ed.id < $NumQueries),
       |sc0 AS (${scoreSql("seeds")}),
       |f0 AS (${beamSql("sc0")}),
       |x1 AS (SELECT DISTINCT f.q_id, ed.nb AS id
       |       FROM f0 f JOIN edges ed ON ed.id = f.id
       |       WHERE ed.nb <> f.q_id
       |         AND NOT EXISTS (SELECT 1 FROM sc0 v WHERE v.q_id = f.q_id AND v.id = ed.nb)),
       |sc1 AS (${scoreSql("x1")}),
       |f1 AS (${beamSql("sc1")}),
       |x2 AS (SELECT DISTINCT f.q_id, ed.nb AS id
       |       FROM f1 f JOIN edges ed ON ed.id = f.id
       |       WHERE ed.nb <> f.q_id
       |         AND NOT EXISTS (SELECT 1 FROM sc0 v WHERE v.q_id = f.q_id AND v.id = ed.nb)
       |         AND NOT EXISTS (SELECT 1 FROM sc1 v WHERE v.q_id = f.q_id AND v.id = ed.nb)),
       |sc2 AS (${scoreSql("x2")}),
       |vis AS (SELECT * FROM sc0 UNION ALL SELECT * FROM sc1 UNION ALL SELECT * FROM sc2),
       |rg AS (SELECT q_id, id, cos_fp,
       |              row_number() OVER (PARTITION BY q_id ORDER BY cos_fp DESC, id) AS rank
       |       FROM vis)
       |SELECT q_id, rank, id AS neighbor_id, cos_fp FROM rg
       |WHERE rank <= $K ORDER BY q_id, rank""".stripMargin
  }

  // ---- binary (sign-bit) quantization + Hamming ANN ------------------------

  /** Hamming candidates kept per query before the exact re-rank. */
  val BinRerank = 50

  /** Sign-bit code half: bit d set iff v[off + d + 1] > 0, d in [0, 32).
    * Two 32-bit halves instead of one 64-bit word keeps every shift
    * below the sign bit — identical, unambiguous semantics in Spark and
    * DuckDB (no reliance on either engine's signed-overflow behavior). */
  private def binHalf(off: Int): Column =
    expr(s"""aggregate(
       transform(sequence(0, 31),
         d -> IF(element_at(v, d + ${off + 1}) > CAST(0 AS DOUBLE),
                 shiftleft(CAST(1 AS BIGINT), d), CAST(0 AS BIGINT))),
       CAST(0 AS BIGINT), (a, x) -> a + x)""")

  private def binHalfSql(t: String, off: Int): String =
    s"""list_reduce(list_transform(range(0, 32),
       |      d -> CASE WHEN $t.v[d + ${off + 1}] > 0 THEN (1::BIGINT << d) ELSE 0 END),
       |    (a, b) -> a + b)""".stripMargin

  /** Binary quantization: 64 dims → 64 sign bits, materialized as two
    * 32-bit halves (code_lo = dims 1-32, code_hi = dims 33-64). 8 bytes
    * per vector — a 64× cut vs float32 — is what a 100 TB ANN corpus
    * scans in the coarse phase. Output (vec_id, code_lo, code_hi,
    * n_bits). */
  def binaryQuantize(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .select(col("vec_id"), binHalf(0).as("code_lo"), binHalf(32).as("code_hi"))
      .withColumn("n_bits",
        (bit_count(col("code_lo")) + bit_count(col("code_hi"))).cast("long"))
      .orderBy("vec_id")

  val binaryQuantizeOracle: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |c AS (SELECT vec_id,
       |             ${binHalfSql("e", 0)} AS code_lo,
       |             ${binHalfSql("e", 32)} AS code_hi
       |      FROM e)
       |SELECT vec_id, code_lo, code_hi,
       |       bit_count(code_lo) + bit_count(code_hi) AS n_bits
       |FROM c ORDER BY vec_id""".stripMargin

  /** ANN top-K via binary codes: coarse scan ranks ALL neighbors by
    * Hamming distance on the 64-bit sign code (ties → neighbor id),
    * keeps [[BinRerank]] candidates per query, then re-ranks those by
    * exact cosine. Output (q_id, rank, neighbor_id, hamming, cos_fp).
    *
    * The 100 TB shape: the scan side touches an 8-byte code per vector
    * (the codes relation — no raw vectors), the per-query top-[[BinRerank]]
    * is a window over broadcast-joined rows (no shuffle of the corpus),
    * and raw vectors are fetched by id for candidates only
    * (NumQueries × BinRerank rows) in the re-rank join. */
  def hammingTopK(emb: DataFrame): DataFrame = {
    val e = normalized(emb)
    val codes = e
      .select(col("vec_id"), col("v"))
      .select(col("vec_id"), binHalf(0).as("lo"), binHalf(32).as("hi"))
    val qCodes = codes.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("lo").as("qlo"), col("hi").as("qhi"))
    val scored = codes.join(broadcast(qCodes), col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        (bit_count(col("lo").bitwiseXOR(col("qlo"))) +
          bit_count(col("hi").bitwiseXOR(col("qhi")))).cast("long").as("hamming"))
    val wH = Window.partitionBy("q_id").orderBy(col("hamming"), col("neighbor_id"))
    val cand = scored.withColumn("hrank", row_number().over(wH))
      .filter(col("hrank") <= BinRerank)
      .select("q_id", "neighbor_id", "hamming")
    val qVec = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val reranked = cand
      .join(e.select(col("vec_id").as("neighbor_id"), col("v"), col("nrm")), Seq("neighbor_id"))
      .join(broadcast(qVec), Seq("q_id"))
      .select(col("q_id"), col("neighbor_id"), col("hamming"),
        floor(dotCols(col("qv"), col("v")) / (col("qn") * col("nrm")) * 1e6)
          .cast("long").as("cos_fp"))
    val wC = Window.partitionBy("q_id").orderBy(col("cos_fp").desc, col("neighbor_id"))
    reranked.withColumn("rank", row_number().over(wC).cast("long"))
      .filter(col("rank") <= K)
      .select("q_id", "rank", "neighbor_id", "hamming", "cos_fp")
      .orderBy("q_id", "rank")
  }

  val hammingTopKOracle: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |codes AS (SELECT vec_id,
       |                 ${binHalfSql("e", 0)} AS lo,
       |                 ${binHalfSql("e", 32)} AS hi
       |          FROM e),
       |scored AS (
       |  SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
       |         bit_count(xor(c.lo, q.lo)) + bit_count(xor(c.hi, q.hi)) AS hamming
       |  FROM codes q JOIN codes c ON q.vec_id < $NumQueries AND c.vec_id <> q.vec_id),
       |cand AS (
       |  SELECT q_id, neighbor_id, hamming,
       |         row_number() OVER (PARTITION BY q_id ORDER BY hamming, neighbor_id) AS hrank
       |  FROM scored),
       |rer AS (
       |  SELECT t.q_id, t.neighbor_id, t.hamming,
       |         floor($dotSql / (${nrmSql("q")} * ${nrmSql("c")}) * 1e6)::BIGINT AS cos_fp
       |  FROM cand t
       |  JOIN e c ON c.vec_id = t.neighbor_id
       |  JOIN e q ON q.vec_id = t.q_id
       |  WHERE t.hrank <= $BinRerank),
       |ranked AS (
       |  SELECT q_id, neighbor_id, hamming, cos_fp,
       |         row_number() OVER (PARTITION BY q_id ORDER BY cos_fp DESC, neighbor_id) AS rank
       |  FROM rer)
       |SELECT q_id, rank, neighbor_id, hamming, cos_fp FROM ranked
       |WHERE rank <= $K ORDER BY q_id, rank""".stripMargin

  // ---- Gram matrix (covariance prep: PCA / whitening / spectral stats) ----

  /** Component quantization for the Gram accumulation: floor(x * 1000).
    * Products and sums of int64 are ASSOCIATIVE — the aggregate is exact
    * under any partition/merge order (the repo-wide fixed-point contract,
    * applied before the sum instead of after). Magnitudes: |q| ≤ ~1e4,
    * so q_i·q_j ≤ 1e8 and 1e9 vectors stay below 2^63. */
  val GramScaleFp = 1000L

  /** Upper-triangle Gram matrix Σ_v q(v)·q(v)ᵀ over the embedding column —
    * the one-pass, map-side-combinable covariance input (PCA/whitening
    * run driver-side on the d×d result, which is dimension-sized, not
    * data-sized). Built as a typed
    * [[org.apache.spark.sql.expressions.Aggregator]]:
    * each task accumulates a d(d+1)/2 long buffer, the exchange carries
    * one buffer per task — shuffle volume independent of row count.
    * Output: (i, j, g) with 0 ≤ i ≤ j < d, g exact int64. */
  def gramMatrix(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val d = Dim
    val q = emb.select(
      expr(s"transform(embedding, x -> cast(floor(cast(x as double) * $GramScaleFp) as bigint))")
        .as("q")).as[Array[Long]]
    val flat = q.select(new GramAggregator(d).toColumn.name("g"))
    // k → (i, j): f(i) = i(2d - i + 1)/2 is the row offset; the inner
    // discriminant (2d+1)² − 8·f(i) = (2(d−i)+1)² is a perfect square, so
    // the double sqrt is exact at every boundary
    flat.select(posexplode(col("g")).as(Seq("k", "g")))
      .withColumn("i", expr(
        s"cast(floor((${2 * d + 1} - sqrt(cast(${(2 * d + 1) * (2 * d + 1)} - 8 * k as double))) / 2) as bigint)"))
      .withColumn("j", expr(s"k - (i * ${2 * d} - i * i + i) div 2 + i"))
      .select("i", "j", "g")
      .orderBy("i", "j")
  }

  val gramMatrixOracle: String =
    s"""WITH q AS (
       |  SELECT list_transform(embedding,
       |           x -> CAST(floor(CAST(x AS DOUBLE) * $GramScaleFp) AS BIGINT)) AS q
       |  FROM embeddings),
       |idx AS (SELECT CAST(i AS BIGINT) AS i FROM range($Dim) t(i))
       |SELECT a.i, b.i AS j, CAST(sum(q.q[a.i + 1] * q.q[b.i + 1]) AS BIGINT) AS g
       |FROM q, idx a, idx b
       |WHERE b.i >= a.i
       |GROUP BY 1, 2
       |ORDER BY 1, 2""".stripMargin

  /** Top principal eigenvalue/vector of the (centered-free) Gram matrix by
    * fixed-iteration power method — driver-side on the d×d result (the
    * correct locus: the matrix is dimension-sized). Deterministic: fixed
    * uniform start vector, fixed 500 iterations, no convergence test —
    * convergence rate is (λ₂/λ₁)^k, so a narrow eigengap leaves a small
    * residual rather than a wrong direction.
    * Returns (eigenvalue, eigenvector) in un-quantized double units. */
  def gramTopEigen(gram: Array[Array[Double]]): (Double, Array[Double]) = {
    val d = gram.length
    var v = Array.fill(d)(1.0 / math.sqrt(d))
    var lambda = 0.0
    var it = 0
    while (it < 500) {
      val w = Array.tabulate(d)(i => {
        var s = 0.0; var j = 0
        while (j < d) { s += gram(i)(j) * v(j); j += 1 }
        s
      })
      val n = math.sqrt(w.map(x => x * x).sum)
      if (n > 0) { v = w.map(_ / n); lambda = n }
      it += 1
    }
    (lambda, v)
  }

  // ---- PCA: integer-exact power iteration + principal-axis projection ----

  /** Fixed iteration count for the ORACLE-GATED power method (vs
    * [[gramTopEigen]]'s 500 double iterations): [[PcaSquarings]]
    * matrix squarings then 8 integer vector rounds — the convergence
    * residual is part of the operator's defined output, so both
    * engines land on the identical iterate. */
  val PcaIters = 8

  /** Repeated-squaring boost: G → G² (rescaled) [[PcaSquarings]] times
    * before iterating, so the 8 vector rounds apply G^(2^6) and the
    * effective power is 512. Needed because the embedding spectrum is
    * near-degenerate (λ₂/λ₁ ≈ 0.98 at sf0.1) AND the fixed start
    * vector can be nearly orthogonal to the top direction — plain
    * unrolled iteration cannot converge in any SQL-expressible round
    * count (measured cos 0.18 after 96 rounds at sf0.1; with the
    * squarings, ≥ 0.9999 at every SF). */
  val PcaSquarings = 6

  /** Fixed-point unit of the PCA iterate (2^20). */
  val PcaUnit = 1L << 20

  /** Top principal direction of the uncentered Gram matrix by INTEGER
    * power iteration — every multiply, normalize, and division is int64
    * with truncate-toward-zero semantics, identical in Scala, Spark
    * `div`, and DuckDB `//`, so the iterate (including its convergence
    * residual) is bit-exact cross-engine. Overflow discipline: the
    * gram is pre-scaled to |g| ≤ 2^20 (so y = G·x ≤ d·2^40 < 2^47),
    * normalization divides by (max|y| div 2^20 + 1) instead of
    * multiplying first, and the Rayleigh quotient pre-shifts both
    * factors 10 bits. Runs driver-side on the d×d collect — the
    * correct locus (dimension-sized, not data-sized); the corpus-sized
    * work is [[gramMatrix]]'s one-pass aggregator. Sign is fixed by
    * Σx ≥ 0. Returns (eigvec in [[PcaUnit]] fixed point, λ_q). */
  private def pcaRescale(m: Array[Array[Long]]): Array[Array[Long]] = {
    val mx = math.max(m.iterator.flatMap(_.iterator).map(math.abs).max, 1L)
    val dv = mx / PcaUnit + 1
    m.map(_.map(_ / dv))
  }

  private def pcaMul(m: Array[Array[Long]], v: Array[Long]): Array[Long] =
    Array.tabulate(m.length) { i =>
      var s = 0L; var j = 0
      while (j < m.length) { s += m(i)(j) * v(j); j += 1 }
      s
    }

  /** Squaring-boosted integer iteration on an already once-rescaled
    * matrix: returns the UNSIGNED final iterate, its Rayleigh λ_q
    * against the input matrix, and the pre-shifted denominator the
    * deflation step reuses. */
  private def pcaIterate(gn0: Array[Array[Long]]): (Array[Long], Long, Long) = {
    val d = gn0.length
    var gsq = gn0
    var k = 0
    while (k < PcaSquarings) {
      gsq = pcaRescale(Array.tabulate(d, d) { (i, j) =>
        var s = 0L; var l = 0
        while (l < d) { s += gsq(i)(l) * gsq(l)(j); l += 1 }
        s
      })
      k += 1
    }
    var x = Array.fill(d)(PcaUnit)
    var t = 0
    while (t < PcaIters) {
      val y = pcaMul(gsq, x)
      val q = y.iterator.map(math.abs).max / PcaUnit + 1
      x = y.map(_ / q)
      t += 1
    }
    // Rayleigh against the ONCE-scaled input (not the squared one)
    val y = pcaMul(gn0, x)
    val num = x.zip(y).map { case (a, b) => (a / 1024) * (b / 1024) }.sum
    val den = math.max(x.map(a => (a / 1024) * (a / 1024)).sum, 1L)
    (x, num / den, den)
  }

  private def pcaGram(emb: DataFrame): Array[Array[Long]] = {
    val d = Dim
    val tri = gramMatrix(emb).collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt, r.getLong(2)))
    val g = Array.ofDim[Long](d, d)
    tri.foreach { case (i, j, v) => g(i)(j) = v; g(j)(i) = v }
    g
  }

  def pcaEigen(emb: DataFrame): (Array[Long], Long) = {
    val key = (emb.sparkSession, "Similarity.pcaEigen", emb.semanticHash())
    graft.util.Memo(key) {
      val (x, lambda, _) = pcaIterate(pcaRescale(pcaGram(emb)))
      val sgn = if (x.sum < 0) -1L else 1L
      (x.map(_ * sgn), lambda)
    }
  }

  /** Top-TWO principal directions: the first from [[pcaIterate]], the
    * second from the same iteration on the DEFLATED matrix
    * gn0 − λ₁·(x̂₁x̂₁ᵀ)/(x̂₁·x̂₁) (Hotelling deflation, all divisions
    * integer and order-pinned, so both engines land on the identical
    * second iterate). The quantization residual of the deflation
    * (≈2⁻¹⁰ of λ₁) stays far below λ₂/λ₁ ≈ 0.98, so the squaring
    * boost re-amplifies the true second direction, not the leftover
    * first. Returns (e1, e2, λ1_q, λ2_q), both sign-fixed. */
  def pcaEigenPair(emb: DataFrame): (Array[Long], Array[Long], Long, Long) = {
    val key = (emb.sparkSession, "Similarity.pcaEigenPair", emb.semanticHash())
    graft.util.Memo(key) {
      val d = Dim
      val gn0 = pcaRescale(pcaGram(emb))
      val (x1, lam1, den1) = pcaIterate(gn0)
      val defl = Array.tabulate(d, d) { (i, j) =>
        gn0(i)(j) - (lam1 * ((x1(i) / 1024) * (x1(j) / 1024))) / den1
      }
      val (x2, lam2, _) = pcaIterate(pcaRescale(defl))
      val s1 = if (x1.sum < 0) -1L else 1L
      val s2 = if (x2.sum < 0) -1L else 1L
      (x1.map(_ * s1), x2.map(_ * s2), lam1, lam2)
    }
  }

  /** Dataset cartography: per-label centroid in the top-2 principal
    * plane — (label, n, mean_x, mean_y), with the e1·e2 orthogonality
    * residual riding along as a constant diagnostic column. One
    * broadcast of two d-vectors + one map-side aggregate. */
  def pcaMap(emb: DataFrame): DataFrame = {
    val (e1, e2, _, _) = pcaEigenPair(emb)
    val ortho = e1.zip(e2).map { case (a, b) => (a / 1024) * (b / 1024) }.sum / PcaUnit
    val a1 = e1.mkString("array(", "L, ", "L)")
    val a2 = e2.mkString("array(", "L, ", "L)")
    emb
      .withColumn("q", expr(
        s"transform(embedding, x -> cast(floor(cast(x as double) * $GramScaleFp) as bigint))"))
      .withColumn("px", expr(
        s"aggregate(zip_with(q, $a1, (a, b) -> a * b), 0L, (acc, v) -> acc + v)"))
      .withColumn("py", expr(
        s"aggregate(zip_with(q, $a2, (a, b) -> a * b), 0L, (acc, v) -> acc + v)"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"), sum("px").as("sx"), sum("py").as("sy"))
      .select(col("label"), col("n"),
        expr("sx div n").as("mean_x"), expr("sy div n").as("mean_y"),
        lit(ortho).as("ortho_q"))
      .orderBy("label")
  }

  /** Entry face of [[pcaEigen]]: (i, eig_q, lambda_q), d rows. */
  def pcaPower(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val (e, lam) = pcaEigen(emb)
    e.toSeq.zipWithIndex
      .map { case (v, i) => (i.toLong, v, lam) }
      .toDF("i", "eig_q", "lambda_q")
      .orderBy("i")
  }

  /** Per-label projection profile along the principal axis — the PCA
    * diagnostic a dataset report ships (which classes sit where on the
    * dominant direction, and how spread): proj(v) = Σ q(v)ᵢ·eᵢ, exact
    * int64. One broadcast of the d-vector + one map-side aggregate. */
  def pcaProject(emb: DataFrame): DataFrame = {
    val (e, _) = pcaEigen(emb)
    val earr = e.mkString("array(", "L, ", "L)")
    emb
      .withColumn("q", expr(
        s"transform(embedding, x -> cast(floor(cast(x as double) * $GramScaleFp) as bigint))"))
      .withColumn("p", expr(
        s"aggregate(zip_with(q, $earr, (a, b) -> a * b), 0L, (acc, v) -> acc + v)"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"), sum("p").as("sum_proj"),
        min("p").as("min_proj"), max("p").as("max_proj"))
      .withColumn("mean_proj", expr("sum_proj div n"))
      .select("label", "n", "sum_proj", "mean_proj", "min_proj", "max_proj")
      .orderBy("label")
  }

  /** One squaring+iteration chain in SQL: from a once-rescaled matrix
    * CTE `src(i, j, g)`, emits `${p}g0..g6` (squarings), `${p}x0..x8`
    * (iterations), `${p}yf`, `${p}ray(num, den)`, `${p}lam(l)`,
    * `${p}sgn(s)`, `${p}eig(i, e)` — the SQL twin of [[pcaIterate]]. */
  private def pcaChain(src: String, p: String): String = {
    val sqs = (1 to PcaSquarings).map { k =>
      val q = k - 1
      s"""${p}r$k AS MATERIALIZED (
         |  SELECT a.i, b.j, CAST(sum(a.g * b.g) AS BIGINT) AS g
         |  FROM ${p}g$q a JOIN ${p}g$q b ON a.j = b.i GROUP BY 1, 2),
         |${p}rd$k AS (SELECT greatest(max(abs(g)), 1) // $PcaUnit + 1 AS dv FROM ${p}r$k),
         |${p}g$k AS MATERIALIZED (SELECT i, j, CAST(g // dv AS BIGINT) AS g FROM ${p}r$k, ${p}rd$k)""".stripMargin
    }.mkString(",\n")
    val gs = s"${p}g$PcaSquarings"
    val iters = (1 to PcaIters).map { t =>
      val q = t - 1
      s"""${p}y$t AS MATERIALIZED (SELECT $gs.i, CAST(sum($gs.g * ${p}x$q.x) AS BIGINT) AS y
         |        FROM $gs JOIN ${p}x$q ON ${p}x$q.i = $gs.j GROUP BY 1),
         |${p}m$t AS (SELECT max(abs(y)) // $PcaUnit + 1 AS q FROM ${p}y$t),
         |${p}x$t AS MATERIALIZED (SELECT i, CAST(y // q AS BIGINT) AS x FROM ${p}y$t, ${p}m$t)""".stripMargin
    }.mkString(",\n")
    val f = PcaIters
    s"""${p}g0 AS MATERIALIZED (SELECT i, j, g FROM $src),
       |$sqs,
       |${p}x0 AS (SELECT i, CAST($PcaUnit AS BIGINT) AS x FROM idx),
       |$iters,
       |${p}yf AS MATERIALIZED (SELECT ${p}g0.i, CAST(sum(${p}g0.g * ${p}x$f.x) AS BIGINT) AS y
       |       FROM ${p}g0 JOIN ${p}x$f ON ${p}x$f.i = ${p}g0.j GROUP BY 1),
       |${p}ray AS (SELECT CAST(sum((${p}x$f.x // 1024) * (${p}yf.y // 1024)) AS BIGINT) AS num,
       |               greatest(CAST(sum((${p}x$f.x // 1024) * (${p}x$f.x // 1024)) AS BIGINT), 1) AS den
       |        FROM ${p}x$f JOIN ${p}yf ON ${p}x$f.i = ${p}yf.i),
       |${p}lam AS (SELECT num // den AS l FROM ${p}ray),
       |${p}sgn AS (SELECT CASE WHEN (SELECT sum(x) FROM ${p}x$f) < 0 THEN -1 ELSE 1 END AS s),
       |${p}eig AS (SELECT i, CAST(x * s AS BIGINT) AS e FROM ${p}x$f, ${p}sgn)""".stripMargin
  }

  /** Shared preamble: gram triangle → full matrix → once-rescaled
    * `base1`, plus chain `a` (first eigenpair). */
  lazy val pcaCtes: String = {
    s"""q AS MATERIALIZED (
       |  SELECT vec_id, label, list_transform(embedding,
       |           x -> CAST(floor(CAST(x AS DOUBLE) * $GramScaleFp) AS BIGINT)) AS q
       |  FROM embeddings),
       |idx AS (SELECT CAST(i AS BIGINT) AS i FROM range($Dim) t(i)),
       |tri AS MATERIALIZED (
       |  SELECT a.i, b.i AS j, CAST(sum(q.q[a.i + 1] * q.q[b.i + 1]) AS BIGINT) AS g
       |  FROM q, idx a, idx b WHERE b.i >= a.i GROUP BY 1, 2),
       |gfull AS (SELECT i, j, g FROM tri
       |          UNION ALL SELECT j, i, g FROM tri WHERE i <> j),
       |gdv AS (SELECT greatest(max(abs(g)), 1) // $PcaUnit + 1 AS dv FROM tri),
       |base1 AS MATERIALIZED (SELECT i, j, CAST(g // dv AS BIGINT) AS g FROM gfull, gdv),
       |${pcaChain("base1", "a")}""".stripMargin
  }

  /** Hotelling deflation + chain `b` (second eigenpair) — appended
    * after [[pcaCtes]] by the oracles that need both directions. */
  lazy val pcaCtes2: String = {
    val f = PcaIters
    s"""defl AS MATERIALIZED (
       |  SELECT b.i, b.j,
       |         b.g - (alam.l * ((xi.x // 1024) * (xj.x // 1024))) // aray.den AS g
       |  FROM base1 b
       |  JOIN ax$f xi ON xi.i = b.i
       |  JOIN ax$f xj ON xj.i = b.j, alam, aray),
       |d2dv AS (SELECT greatest(max(abs(g)), 1) // $PcaUnit + 1 AS dv FROM defl),
       |base2 AS MATERIALIZED (SELECT i, j, CAST(g // dv AS BIGINT) AS g FROM defl, d2dv),
       |${pcaChain("base2", "b")}""".stripMargin
  }

  lazy val pcaPowerOracle: String =
    s"""WITH $pcaCtes
       |SELECT e.i, e.e AS eig_q, alam.l AS lambda_q
       |FROM aeig e, alam ORDER BY e.i""".stripMargin

  lazy val pcaProjectOracle: String =
    s"""WITH $pcaCtes,
       |pr AS (
       |  SELECT m.vec_id, m.label, CAST(sum(m.q[e.i + 1] * e.e) AS BIGINT) AS p
       |  FROM q m, aeig e GROUP BY 1, 2)
       |SELECT label, count(*)::BIGINT AS n,
       |       CAST(sum(p) AS BIGINT) AS sum_proj,
       |       CAST(sum(p) AS BIGINT) // count(*) AS mean_proj,
       |       min(p) AS min_proj, max(p) AS max_proj
       |FROM pr GROUP BY label ORDER BY label""".stripMargin

  lazy val pcaMapOracle: String =
    s"""WITH $pcaCtes,
       |$pcaCtes2,
       |pr AS (
       |  SELECT m.vec_id, m.label,
       |         CAST(sum(m.q[a.i + 1] * a.e) AS BIGINT) AS px,
       |         CAST(sum(m.q[b.i + 1] * b.e) AS BIGINT) AS py
       |  FROM q m, aeig a JOIN beig b ON a.i = b.i GROUP BY 1, 2),
       |o AS (SELECT CAST(sum((a.e // 1024) * (b.e // 1024)) AS BIGINT) // $PcaUnit AS ortho_q
       |      FROM aeig a JOIN beig b ON a.i = b.i)
       |SELECT label, count(*)::BIGINT AS n,
       |       CAST(sum(px) AS BIGINT) // count(*) AS mean_x,
       |       CAST(sum(py) AS BIGINT) // count(*) AS mean_y,
       |       o.ortho_q
       |FROM pr, o GROUP BY label, o.ortho_q ORDER BY label""".stripMargin
}

/** Map-side-combining upper-triangle Gram accumulator: buffer is the
  * flattened d(d+1)/2 triangle, reduce is the outer-product row update,
  * merge is elementwise add — all int64, exact in any order. */
final class GramAggregator(d: Int)
    extends org.apache.spark.sql.expressions.Aggregator[Array[Long], Array[Long], Array[Long]] {
  override def zero: Array[Long] = new Array[Long](d * (d + 1) / 2)
  override def reduce(acc: Array[Long], q: Array[Long]): Array[Long] = {
    var k = 0
    var i = 0
    while (i < d) {
      val qi = q(i)
      var j = i
      while (j < d) { acc(k) += qi * q(j); k += 1; j += 1 }
      i += 1
    }
    acc
  }
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var k = 0
    while (k < a.length) { a(k) += b(k); k += 1 }
    a
  }
  override def finish(buf: Array[Long]): Array[Long] = buf
  override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
