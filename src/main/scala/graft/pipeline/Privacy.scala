package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import TextOps._

/** PRIVACY-preserving release operators — the compliance half of a
  * training-data pipeline: corpus statistics leave the curation
  * boundary (per-source × per-language document counts feed dashboards
  * and data statements), and releasing them raw leaks membership.
  * Two published disciplines, composed in one report:
  *
  *  - DIFFERENTIAL PRIVACY via the geometric mechanism (Ghosh-
  *    Roughgarden-Sundararajan 2009 — the discrete counterpart of
  *    Laplace, the right mechanism for integer counts): released =
  *    true + k where P(k) ∝ α^|k|, α = e^-ε, sensitivity 1 for
  *    per-document counting queries;
  *  - k-ANONYMITY-style suppression flagging: groups whose true count
  *    is below [[KAnonMin]] are marked — small cells stay risky even
  *    noised, and real releases suppress them.
  *
  * Determinism (the oracle contract — and how real pipelines make DP
  * releases REPRODUCIBLE across reruns): the noise draw per group is
  * u = baseHash(seed ‖ group) ∈ [0, 2^60) — a keyed-hash uniform —
  * pushed through the inverse CDF of the two-sided geometric as a
  * precomputed INTEGER threshold table (floor(CDF·2^60), computed once
  * on the driver, embedded as literals in both engines' plans). Noise
  * is then `rank of u in the table`, pure integer comparisons — no
  * libm in either engine, bit-identical everywhere; the noise is still
  * exactly geometric-distributed under the hash-uniform assumption.
  *
  * SECRECY CAVEAT (round-9 advice, adopted): determinism and privacy
  * trade off THROUGH THE SEED. The noise is a deterministic function
  * of (seed, cell); with a public seed anyone holding the code
  * recovers n_true exactly — effective ε = ∞. So the surface is split:
  *
  *  - [[dpRelease]] is the AUDIT view — diagnostic columns (n_true,
  *    noise, suppress) included, fixture seed, the cross-engine
  *    determinism/parity demonstration. It must never leave the
  *    curation boundary.
  *  - [[dpReleasePublic]] is the RELEASE view — noised counts ONLY
  *    (no n_true, no noise, no flag), cells whose NOISED count falls
  *    below [[KAnonMin]] REMOVED, and the seed is a caller-supplied
  *    parameter that a deployment draws from a secret store.
  *    Thresholding on the noised count matters (round-10 advice):
  *    a threshold on n_true makes cell presence/absence a
  *    DETERMINISTIC function of the raw data — a neighboring dataset
  *    flips a cell in/out with unbounded likelihood ratio — whereas
  *    the noised threshold keeps presence itself randomized (the
  *    standard "noisy thresholding" release). GUARANTEE CLASS: with a
  *    secret seed this is ε-DP up to the ±[[NoiseCap]] truncation —
  *    the truncated geometric has zero mass beyond ±35, so outputs
  *    more than 35 from a true count have likelihood ratio ∞; the
  *    tail chopped is < 4e-16 per cell at ε = 1, i.e. (ε, δ≈4e-16)-DP
  *    rather than pure ε-DP. Both caveats are inherent to any
  *    bounded-support deterministic-replay release, and are the
  *    documented contract here, not an oversight.
  *
  * Scale shape: one map-side-combinable count aggregate over the
  * corpus; the release domain (sources × languages — released over the
  * FULL domain, not just non-empty cells, because which cells exist is
  * itself the membership leak) and the threshold table are
  * catalog-bounded; everything after the count touches O(domain) rows. */
object Privacy {

  /** ε (×1000): the per-release privacy budget, ε = 1. */
  val EpsPermille = 1000

  /** Suppression floor: cells with fewer than this many true documents
    * get flagged for suppression. */
  val KAnonMin = 10L

  /** Noise support is truncated to ±[[NoiseCap]]: P(|k| > 35) < 4e-16
    * at ε = 1 — and 35 is also where consecutive quantized CDF steps
    * stay DISTINCT in 2^-60 resolution (α^36·2^60 ≈ 265; a larger cap
    * would collide thresholds and silently skew the extreme tail). */
  val NoiseCap = 35

  /** floor(CDF(j)·2^60) for j = -NoiseCap..NoiseCap of the two-sided
    * geometric with α = e^-ε: P(0) = (1-α)/(1+α), P(k) = P(0)·α^|k|.
    * CDF(j<0) = α^-j/(1+α); CDF(j≥0) = 1 − α^(j+1)/(1+α) — the upper
    * branch is computed via its COMPLEMENT (the small tail mass), not
    * `1 − tiny`, because doubles near 1.0 only resolve 2^-52 and the
    * naive form collapses the top ~5 thresholds into equal integers.
    * Computed once here, embedded as LITERALS in both engines. */
  val NoiseThresholds: IndexedSeq[Long] = {
    val eps = EpsPermille / 1000.0
    val alpha = math.exp(-eps)
    val two60 = math.pow(2, 60)
    (-NoiseCap to NoiseCap).map { j =>
      if (j < 0) math.floor(math.pow(alpha, -j) / (1 + alpha) * two60).toLong
      else (1L << 60) - math.floor(math.pow(alpha, j + 1) / (1 + alpha) * two60).toLong
    }
  }

  private def thresholdsSql: String = NoiseThresholds.mkString("[", ", ", "]")

  /** DP-noised (source, lang) document-count AUDIT view over the full
    * source × lang domain — diagnostic columns included; see the
    * secrecy caveat above. Output (source, lang, n_true, noise,
    * n_released, suppress), ordered; n_released is clamped at 0 (a
    * negative count is not a plausible release). */
  def dpRelease(docs: DataFrame, seed: String = "dpv1"): DataFrame = {
    val counts = docs.groupBy("source", "lang").agg(count(lit(1)).as("n_true"))
    val domain = docs.select("source").distinct()
      .crossJoin(docs.select("lang").distinct()) // catalog² rows, both tiny
    val arr = NoiseThresholds.mkString("array(", "L, ", "L)")
    domain.join(counts, Seq("source", "lang"), "left")
      .na.fill(0L, Seq("n_true"))
      .withColumn("u", baseHash(concat_ws("|", lit(seed), col("source"), col("lang"))))
      .withColumn("noise",
        expr(s"CAST(size(filter($arr, t -> t <= u)) AS BIGINT) - $NoiseCap"))
      .select(col("source"), col("lang"), col("n_true"), col("noise"),
        greatest(col("n_true") + col("noise"), lit(0L)).as("n_released"),
        (col("n_true") < KAnonMin).as("suppress"))
      .orderBy("source", "lang")
  }

  /** The RELEASE view: what actually crosses the boundary. Noised
    * counts only — n_true/noise/suppress never appear — and cells
    * whose NOISED count is below [[KAnonMin]] are REMOVED (publishing
    * nothing about them), not flagged. The threshold reads the noised
    * value on purpose: thresholding n_true would make cell presence a
    * deterministic leak of the raw data (see the guarantee-class note
    * in the object doc). `seed` is caller-supplied; a deployment draws
    * it from a secret store, and the entry's fixture seed exists only
    * so the oracle can replay the projection. Output
    * (source, lang, n_released), ordered. */
  def dpReleasePublic(docs: DataFrame, seed: String): DataFrame =
    dpRelease(docs, seed)
      .filter(col("n_released") >= KAnonMin)
      .select("source", "lang", "n_released")
      .orderBy("source", "lang")

  private def noisedCte(seed: String): String =
    s"""WITH counts AS (
       |  SELECT source, lang, count(*) AS n_true FROM documents GROUP BY 1, 2),
       |domain AS (
       |  SELECT s.source, l.lang
       |  FROM (SELECT DISTINCT source FROM documents) s,
       |       (SELECT DISTINCT lang FROM documents) l),
       |noised AS (
       |  SELECT d.source, d.lang, coalesce(c.n_true, 0) AS n_true,
       |         len(list_filter($thresholdsSql,
       |           t -> t <= ${baseHashSql(s"'$seed' || '|' || d.source || '|' || d.lang")}))::BIGINT
       |           - $NoiseCap AS noise
       |  FROM domain d LEFT JOIN counts c USING (source, lang))""".stripMargin

  lazy val dpReleaseOracle: String =
    s"""${noisedCte("dpv1")}
       |SELECT source, lang, n_true::BIGINT AS n_true, noise,
       |       greatest(n_true + noise, 0)::BIGINT AS n_released,
       |       n_true < $KAnonMin AS suppress
       |FROM noised ORDER BY source, lang""".stripMargin

  /** Fixture seed for the release-view ENTRY only — a deployment
    * passes a secret instead. */
  val PublicDemoSeed = "release-demo-seed"

  /** Oracle for [[dpReleasePublic]] at the entry's fixture seed —
    * the noisy-threshold filter replayed on the noised value. */
  lazy val dpReleasePublicOracle: String =
    s"""${noisedCte(PublicDemoSeed)}
       |SELECT source, lang,
       |       greatest(n_true + noise, 0)::BIGINT AS n_released
       |FROM noised WHERE greatest(n_true + noise, 0) >= $KAnonMin
       |ORDER BY source, lang""".stripMargin
}
