package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import TextOps.{baseHash, baseHashSql}

/** Approximate-aggregate sketches for 100 TB-scale analytics (SURVEY §2.4
  * lists them as absent in the reference; this is the extension).
  *
  * HyperLogLog, hand-rolled rather than Spark's approx_count_distinct,
  * for one reason: the oracle. Spark's HLL++ and DuckDB's approx_distinct
  * use different hash functions and bias tables, so their estimates can
  * never be compared bit-for-bit. This implementation defines the sketch
  * arithmetic from the shared md5-based 60-bit hash (TextOps.baseHash) in
  * BOTH engines, so the estimate is a deterministic function of the data
  * and the driver gate hash-compares it exactly.
  *
  * Scale shape: the heavy reduction is `groupBy(keys, register).max(rho)`
  * — map-side combinable, shuffle cardinality = |groups| × 256 regardless
  * of input size, and register-max IS the HLL merge operator, so partial
  * aggregation is lossless. The per-group finalization folds 256 values.
  *
  * Determinism notes:
  *  - rho via length(bin(w)) — integer ops, no float log;
  *  - 2^-Mj as 1.0 / (1::BIGINT << Mj) — exact powers of two;
  *  - the harmonic sum folds registers in ascending register order on
  *    both engines (Spark aggregate over array_sort == DuckDB list_reduce
  *    over list_sort; the 0.0 start is exact);
  *  - linear-counting correction uses ln(m/zeros): both engines' libm is
  *    within 1 ulp, and the final floor() to whole counts absorbs it.
  */
object Sketches {

  val HllP = 8
  val HllM: Int = 1 << HllP // 256 registers
  /** alpha_256 * m^2, spliced into both engines via shortest-round-trip
    * decimal repr (parses back to the identical double). */
  val AlphaM2: Double = 0.7213 / (1 + 1.079 / HllM) * HllM * HllM
  /** Hash bits below the register index (60-bit baseHash - p). */
  val WBits: Int = 60 - HllP
  val WMask: Long = (1L << WBits) - 1
  /** Small-range correction threshold 2.5m. */
  val SmallRange: Double = 2.5 * HllM

  /** Per-event_type HLL distinct-user estimate next to the exact count
    * (the honesty column: |est - exact| / exact ~ 1.04/sqrt(256) ≈ 6.5%).
    * Output: (event_type, est_users, exact_users). */
  def hllDistinctUsers(ev: DataFrame): DataFrame = {
    val h = baseHash(col("user_id").cast("string"))
    val regs = ev
      .select(col("event_type"), shiftright(h, WBits).as("reg"), h.bitwiseAND(WMask).as("w"))
      .withColumn("rho",
        when(col("w") === 0, lit(WBits + 1))
          .otherwise(lit(WBits + 1) - length(bin(col("w")))))
      .groupBy("event_type", "reg").agg(max("rho").as("mj"))
      // 2^-Mj exactly, while mj is still a scalar column (shift by column
      // is expression-level only)
      .withColumn("p", expr("1.0 / cast(shiftleft(cast(1 as bigint), mj) as double)"))
    val est = regs.groupBy("event_type")
      .agg(
        count(lit(1)).as("nregs"),
        aggregate(
          transform(array_sort(collect_list(struct(col("reg"), col("p")))),
            s => s.getField("p")),
          lit(0.0), (acc, x) => acc + x).as("psum"))
      .withColumn("total", (lit(HllM) - col("nregs")).cast("double") + col("psum"))
      .withColumn("est_raw", lit(AlphaM2) / col("total"))
      .withColumn("est_users",
        floor(when(col("est_raw") <= SmallRange && col("nregs") < HllM,
          lit(HllM.toDouble) * log(lit(HllM.toDouble) / (lit(HllM) - col("nregs")).cast("double")))
          .otherwise(col("est_raw"))).cast("long"))
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_users"))
    est.select("event_type", "est_users")
      .join(exact, Seq("event_type"))
      .orderBy("event_type")
  }

  val hllDistinctUsersOracle: String =
    s"""WITH h AS (
       |  SELECT event_type, ${baseHashSql("CAST(user_id AS VARCHAR)")} AS h FROM events),
       |b AS (SELECT event_type, h >> $WBits AS reg, h & $WMask AS w FROM h),
       |r AS (SELECT event_type, reg,
       |             CASE WHEN w = 0 THEN ${WBits + 1} ELSE ${WBits + 1} - length(bin(w)) END AS rho
       |      FROM b),
       |m AS (SELECT event_type, reg, max(rho) AS mj FROM r GROUP BY 1, 2),
       |p AS (SELECT event_type, reg, 1.0::DOUBLE / ((1::BIGINT << mj)::DOUBLE) AS p FROM m),
       |g AS (SELECT event_type, count(*) AS nregs,
       |             list_reduce(
       |               list_prepend(0.0::DOUBLE,
       |                 list_transform(list_sort(list({'reg': reg, 'p': p})), s -> s.p)),
       |               (x, y) -> x + y) AS psum
       |      FROM p GROUP BY event_type),
       |e AS (SELECT event_type, nregs,
       |             ($HllM - nregs)::DOUBLE + psum AS total FROM g),
       |f AS (SELECT event_type, nregs, $AlphaM2 / total AS est_raw FROM e)
       |SELECT f.event_type,
       |       CAST(floor(CASE WHEN est_raw <= $SmallRange AND nregs < $HllM
       |                       THEN ${HllM.toDouble} * ln(${HllM.toDouble} / ($HllM - nregs)::DOUBLE)
       |                       ELSE est_raw END) AS BIGINT) AS est_users,
       |       x.exact_users
       |FROM f JOIN (SELECT event_type, count(DISTINCT user_id) AS exact_users
       |             FROM events GROUP BY event_type) x USING (event_type)
       |ORDER BY event_type""".stripMargin

  // ---- Count-Min sketch: heavy hitters ----------------------------------

  val CmsDepth = 4
  val CmsWidth = 512
  /** Heavy-hitter threshold: estimated event count ≥ this. */
  val CmsThreshold = 80L

  /** Count-Min heavy hitters over per-user event counts: build a d×w
    * counter matrix (d independent md5-seeded hashes), estimate each
    * candidate as min over its d buckets, report users whose ESTIMATE
    * crosses the threshold next to their exact count (CMS guarantees
    * est ≥ exact, so no true heavy hitter is missed — the overcount is
    * visible in the output).
    *
    * Scale shape: the matrix build is `groupBy(row, bucket).count` —
    * map-side combinable, shuffle cardinality d×w = 2048 cells TOTAL
    * regardless of input size (the whole point of the sketch at 100 TB).
    * The candidate probe joins d rows per candidate against the 2048-cell
    * matrix — broadcast. Candidates here = distinct users (the driver
    * gate needs a total answer); in production the candidate stream would
    * be a sampled pass, the matrix unchanged. */
  def cmsHeavyUsers(ev: DataFrame): DataFrame = {
    val rows = ev.select(col("user_id").cast("string").as("u"))
    val cells = rows
      .select(col("u"), explode(sequence(lit(0), lit(CmsDepth - 1))).as("d"))
      .select(col("d"),
        pmod(baseHash(concat_ws(":", col("d"), col("u"))), lit(CmsWidth)).as("bucket"))
      .groupBy("d", "bucket").agg(count(lit(1)).as("c"))
    val exact = rows.groupBy("u").agg(count(lit(1)).as("exact_n"))
    val probes = exact.select(col("u"), col("exact_n"),
        explode(sequence(lit(0), lit(CmsDepth - 1))).as("d"))
      .select(col("u"), col("exact_n"), col("d"),
        pmod(baseHash(concat_ws(":", col("d"), col("u"))), lit(CmsWidth)).as("bucket"))
    probes.join(broadcast(cells), Seq("d", "bucket"))
      .groupBy("u", "exact_n").agg(min("c").as("est_n"))
      .filter(col("est_n") >= CmsThreshold)
      .select(col("u").cast("long").as("user_id"), col("est_n"), col("exact_n"))
      .orderBy("user_id")
  }

  val cmsHeavyUsersOracle: String = {
    val h = baseHashSql("(t.d || ':' || u)")
    s"""WITH rows_ AS (SELECT CAST(user_id AS VARCHAR) AS u FROM events),
       |cells AS (
       |  SELECT t.d, $h % $CmsWidth AS bucket, count(*) AS c
       |  FROM rows_, range(0, $CmsDepth) t(d) GROUP BY 1, 2),
       |exact AS (SELECT u, count(*) AS exact_n FROM rows_ GROUP BY 1),
       |probes AS (
       |  SELECT u, exact_n, t.d, $h % $CmsWidth AS bucket
       |  FROM exact, range(0, $CmsDepth) t(d)),
       |est AS (
       |  SELECT u, exact_n, min(c) AS est_n
       |  FROM probes JOIN cells USING (d, bucket) GROUP BY 1, 2)
       |SELECT CAST(u AS BIGINT) AS user_id, est_n, exact_n
       |FROM est WHERE est_n >= $CmsThreshold ORDER BY user_id""".stripMargin
  }

  // ---- fixed-bin histogram quantile sketch -------------------------------

  /** Histogram bin width in milli-value units (100 = 0.1-wide bins). */
  val HistBinMv = 100L
  /** Quantiles reported, as integer percents (exact rank arithmetic). */
  val HistQs: Seq[Int] = Seq(50, 95, 99)

  /** Mergeable fixed-bin histogram quantile sketch — the distributed
    * percentile story at 100 TB: per-group bin counts are map-side
    * combinable and the shuffle is bounded by groups × bins no matter
    * the input size, where an exact percentile needs a per-group sort
    * of the raw data. Estimate = lower edge of the first bin whose
    * running count reaches the target rank.
    *
    * Rank arithmetic is all-integer (rank = ⌈n·q/100⌉ via
    * (n·q + 99) div 100 — no float ceil at the boundary), and the
    * honesty column is the exact k-th order statistic of the QUANTIZED
    * milli-value (an integer order statistic is engine-independent;
    * interpolated float quantiles are not). The exact column's
    * per-group sort is the very cost the sketch exists to avoid —
    * it rides along here as the verification baseline.
    * Output: (event_type, q, n, est_fp, exact_fp) — fp = milli-value. */
  def histQuantiles(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val mv = ev.select(col("event_type"), floor(col("value") * 1000).cast("long").as("mv"))
    val ranks = mv.groupBy("event_type").agg(count(lit(1)).as("n"))
      .withColumn("q", explode(array(HistQs.map(q => lit(q.toLong)): _*)))
      .withColumn("rank", expr("(n * q + 99) div 100"))
    val cum = mv.select(col("event_type"), expr(s"mv div $HistBinMv").as("bin"))
      .groupBy("event_type", "bin").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum("c").over(
        Window.partitionBy("event_type").orderBy("bin")))
    val est = cum.join(ranks, "event_type")
      .filter(col("cum") >= col("rank"))
      .groupBy("event_type", "q", "n", "rank")
      .agg(min("bin").as("bin"))
      .withColumn("est_fp", col("bin") * HistBinMv)
    val exact = mv.withColumn("rn", row_number().over(
        Window.partitionBy("event_type").orderBy("mv")))
      .join(ranks.select("event_type", "q", "rank"), "event_type")
      .filter(col("rn") === col("rank"))
      .select(col("event_type"), col("q"), col("mv").as("exact_fp"))
    est.join(exact, Seq("event_type", "q"))
      .select("event_type", "q", "n", "est_fp", "exact_fp")
      .orderBy("event_type", "q")
  }

  val histQuantilesOracle: String =
    s"""WITH mv AS (
       |  SELECT event_type, CAST(floor(value * 1000) AS BIGINT) AS mv FROM events),
       |ranks AS (
       |  SELECT event_type, n, q, (n * q + 99) // 100 AS rank
       |  FROM (SELECT event_type, count(*) AS n FROM mv GROUP BY 1),
       |       (SELECT unnest([${HistQs.mkString(", ")}]::BIGINT[]) AS q)),
       |cum AS (
       |  SELECT event_type, bin, sum(c) OVER (
       |           PARTITION BY event_type ORDER BY bin) AS cum
       |  FROM (SELECT event_type, mv // $HistBinMv AS bin, count(*) AS c
       |        FROM mv GROUP BY 1, 2)),
       |est AS (
       |  SELECT event_type, q, n, CAST(min(bin) * $HistBinMv AS BIGINT) AS est_fp
       |  FROM cum JOIN ranks USING (event_type)
       |  WHERE cum >= rank GROUP BY 1, 2, 3),
       |ordered AS (
       |  SELECT event_type, mv, row_number() OVER (
       |           PARTITION BY event_type ORDER BY mv) AS rn FROM mv),
       |exact AS (
       |  SELECT event_type, q, mv AS exact_fp
       |  FROM ordered JOIN ranks USING (event_type) WHERE rn = rank)
       |SELECT event_type, q, n, est_fp, exact_fp
       |FROM est JOIN exact USING (event_type, q)
       |ORDER BY event_type, q""".stripMargin

  // ---- Bloom filter: membership probe ------------------------------------

  val BloomBits = 4096
  val BloomK = 3
  /** Offset that turns every real key into a guaranteed-absent probe. */
  val BloomAbsentOffset = 1000000L

  /** Bloom-filter membership summary: build a 4096-bit filter (k=3
    * md5-seeded hashes) over customer keys, probe it with every order's
    * custkey (all true members) AND the same keys shifted by 1e6 (all
    * non-members), and report the 2×2 (is_member, bloom_hit) contingency
    * counts — false-positive behavior measured, false negatives provably
    * zero.
    *
    * Scale shape: the filter is the groupBy-distinct of k positions per
    * build key — ≤ 4096 rows however large the build side; probes stream
    * through a broadcast join on position (the classic use: replace a
    * shuffle semi-join of a 100 TB fact against a dimension with a
    * broadcast bit-set pre-filter that discards most rows scan-side). */
  def bloomProbe(customer: DataFrame, orders: DataFrame): DataFrame = {
    def positions(key: org.apache.spark.sql.Column, d: org.apache.spark.sql.Column) =
      pmod(baseHash(concat_ws(":", d, key.cast("string"))), lit(BloomBits))
    val bits = customer
      .select(col("c_custkey"), explode(sequence(lit(0), lit(BloomK - 1))).as("d"))
      .select(positions(col("c_custkey"), col("d")).as("pos"))
      .distinct()
    val probes = orders.select(col("o_custkey")).distinct()
      .select(explode(array(col("o_custkey"), col("o_custkey") + BloomAbsentOffset)).as("key"))
      .withColumn("is_member", col("key") < BloomAbsentOffset)
    val hits = probes
      .select(col("key"), col("is_member"),
        explode(sequence(lit(0), lit(BloomK - 1))).as("d"))
      .select(col("key"), col("is_member"), positions(col("key"), col("d")).as("pos"))
      .join(broadcast(bits), Seq("pos"), "left_semi")
      .groupBy("key", "is_member").agg(count(lit(1)).as("nhit"))
    probes.join(hits, Seq("key", "is_member"), "left")
      .withColumn("bloom_hit", coalesce(col("nhit"), lit(0L)) === BloomK)
      .groupBy("is_member", "bloom_hit").agg(count(lit(1)).as("n"))
      .orderBy("is_member", "bloom_hit")
  }

  val bloomProbeOracle: String = {
    val hc = baseHashSql("(t.d || ':' || CAST(c_custkey AS VARCHAR))")
    val hp = baseHashSql("(t.d || ':' || CAST(key AS VARCHAR))")
    s"""WITH bits AS (
       |  SELECT DISTINCT $hc % $BloomBits AS pos
       |  FROM customer, range(0, $BloomK) t(d)),
       |probes AS (
       |  SELECT u.key, u.key < $BloomAbsentOffset AS is_member
       |  FROM (SELECT DISTINCT o_custkey FROM orders) o,
       |       unnest([o.o_custkey, o.o_custkey + $BloomAbsentOffset]) u(key)),
       |ph AS (
       |  SELECT key, is_member, t.d, $hp % $BloomBits AS pos
       |  FROM probes, range(0, $BloomK) t(d)),
       |hits AS (
       |  SELECT key, is_member, count(*) AS nhit
       |  FROM ph WHERE pos IN (SELECT pos FROM bits)
       |  GROUP BY 1, 2),
       |flags AS (
       |  SELECT p.is_member, coalesce(h.nhit, 0) = $BloomK AS bloom_hit
       |  FROM probes p LEFT JOIN hits h USING (key, is_member))
       |SELECT is_member, bloom_hit, count(*) AS n
       |FROM flags GROUP BY 1, 2 ORDER BY is_member, bloom_hit""".stripMargin
  }

  // ---- KMV (bottom-k) set-similarity sketch ------------------------------

  /** KMV sketch size: the k smallest hash values of each set. */
  val KmvK = 64

  /** Pairwise Jaccard similarity between the active user-day sets of
    * every event-type pair (set element = user_id ⊗ activity day — the
    * engagement-overlap question "do the same users do A and B on the
    * same days"), estimated from KMV (bottom-k) sketches, next to the
    * exact value (the honesty column).
    *
    * Sketch: per event_type, the [[KmvK]] smallest md5-based hashes of
    * its distinct elements. Pair estimate: take the k smallest of the
    * union of both sketches; J_est = |values present in both sketches| / k.
    * Deterministic — the sketch is a pure function of the set, so the
    * DuckDB oracle reproduces it bit-for-bit (no random seeds at all).
    *
    * Scale shape: the per-type sketch is a map-side-combinable top-k
    * (distinct → window or partial min-heap), k rows per group REGARDLESS
    * of set cardinality — billions of elements reduce to 64 longs before
    * anything is joined. The pairwise stage runs on |types|² × k rows,
    * never on the raw sets. The exact side — the thing the sketch
    * replaces at 100 TB — is computed here via a per-element 5-bit type
    * bitmask (one groupBy + one pass over the mask histogram), which is
    * itself the efficient exact shape: all pairwise intersections from
    * one pass, no self-join of element sets.
    * Output (type_a, type_b, est_fp, exact_fp). */
  def kmvJaccard(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val el = expr("user_id * 100000 + ts_ns div 86400000000000")
    val h = baseHash(el.cast("string"))
    // distinct (type, element-hash); hash collisions are mirrored by the oracle
    val sk0 = ev.select(col("event_type"), h.as("h")).distinct()
    // two-phase bottom-k: per-(type, salt) local k smallest first, so the
    // final per-type window sorts ≤ 64k rows per type instead of the whole
    // distinct set — |types| is tiny, which would otherwise make the
    // single window partition the skew bottleneck at scale
    val wLocal = Window.partitionBy("event_type", "salt").orderBy("h")
    val wK = Window.partitionBy("event_type").orderBy("h")
    val pre = sk0.withColumn("salt", pmod(col("h"), lit(64)))
      .withColumn("rk", row_number().over(wLocal)).filter(col("rk") <= KmvK)
      .select("event_type", "h")
    val sk = pre.withColumn("rk", row_number().over(wK)).filter(col("rk") <= KmvK)
      .select("event_type", "h")
    // type pairs (a < b) from the sketch relation itself
    val types = sk.select(col("event_type").as("t")).distinct()
    val pairs = types.as("x").join(types.as("y"), col("x.t") < col("y.t"))
      .select(col("x.t").as("type_a"), col("y.t").as("type_b"))
    // union of the two sketches per pair, flagged by membership side.
    // The pair relation explodes to one row per (pair, member type) so
    // the sketch join is a plain equi-join on event_type (an OR condition
    // here planned as a nested-loop join)
    val members = pairs
      .select(col("type_a"), col("type_b"),
        explode(array(col("type_a"), col("type_b"))).as("event_type"))
      .join(sk, "event_type")
      .groupBy("type_a", "type_b", "h")
      .agg(
        max(when(col("event_type") === col("type_a"), 1).otherwise(0)).as("in_a"),
        max(when(col("event_type") === col("type_b"), 1).otherwise(0)).as("in_b"))
    val wU = Window.partitionBy("type_a", "type_b").orderBy("h")
    val est = members.withColumn("rk", row_number().over(wU))
      .filter(col("rk") <= KmvK)
      .groupBy("type_a", "type_b")
      .agg(expr("sum(in_a * in_b) * 1000000 div count(1)").as("est_fp"))
    // exact: per-element type bitmask → all pairwise counts from ONE pass
    // over elements (then one pass over the tiny mask-histogram
    // relation) — no self-join of element sets
    val spark = ev.sparkSession
    import spark.implicits._
    val typeNames = ev.select(col("event_type")).distinct()
      .orderBy("event_type").collect().map(_.getString(0))
    val rowBit = typeNames.zipWithIndex.foldLeft(lit(0L)) { case (acc, (t, i)) =>
      acc.bitwiseOR(when(col("event_type") === t, lit(1L << i)).otherwise(0L))
    }
    val masks = ev.select(el.as("el"), rowBit.as("b"))
      .groupBy("el").agg(expr("bit_or(b)").as("m0"))
      .groupBy("m0").agg(count(lit(1)).as("n"))
    val pairsLocal = for {
      (ta, ia) <- typeNames.zipWithIndex.toSeq
      (tb, ib) <- typeNames.zipWithIndex.toSeq if ta < tb
    } yield (ta, tb, (1L << ia) | (1L << ib))
    val exact = broadcast(pairsLocal.toDF("pa", "pb", "pm")).crossJoin(masks)
      .groupBy("pa", "pb")
      .agg(expr(
        """sum(IF((m0 & pm) = pm, n, CAST(0 AS BIGINT))) * 1000000
          | div sum(IF((m0 & pm) != 0, n, CAST(0 AS BIGINT)))""".stripMargin).as("exact_fp"))
      .select(col("pa").as("type_a"), col("pb").as("type_b"), col("exact_fp"))
    est.join(exact, Seq("type_a", "type_b"))
      .select("type_a", "type_b", "est_fp", "exact_fp")
      .orderBy("type_a", "type_b")
  }

  val kmvJaccardOracle: String =
    s"""WITH els AS (
       |  SELECT event_type, user_id * 100000 + epoch_ms(ts) // 86400000 AS el
       |  FROM events),
       |d AS (
       |  SELECT DISTINCT event_type, ${baseHashSql("CAST(el AS VARCHAR)")} AS h
       |  FROM els),
       |sk AS (
       |  SELECT event_type, h FROM (
       |    SELECT event_type, h,
       |           row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk
       |    FROM d) WHERE rk <= $KmvK),
       |t AS (SELECT DISTINCT event_type AS ty FROM sk),
       |pairs AS (SELECT x.ty AS type_a, y.ty AS type_b FROM t x JOIN t y ON x.ty < y.ty),
       |members AS (
       |  SELECT p.type_a, p.type_b, s.h,
       |         max(CASE WHEN s.event_type = p.type_a THEN 1 ELSE 0 END) AS in_a,
       |         max(CASE WHEN s.event_type = p.type_b THEN 1 ELSE 0 END) AS in_b
       |  FROM pairs p JOIN sk s ON s.event_type IN (p.type_a, p.type_b)
       |  GROUP BY 1, 2, 3),
       |u AS (
       |  SELECT type_a, type_b, in_a, in_b,
       |         row_number() OVER (PARTITION BY type_a, type_b ORDER BY h) AS rk
       |  FROM members),
       |est AS (
       |  SELECT type_a, type_b,
       |         CAST(sum(in_a * in_b) * 1000000 // count(*) AS BIGINT) AS est_fp
       |  FROM u WHERE rk <= $KmvK GROUP BY 1, 2),
       |ut AS (SELECT DISTINCT event_type FROM events),
       |bits AS (SELECT event_type, row_number() OVER (ORDER BY event_type) - 1 AS bit FROM ut),
       |um AS (
       |  SELECT e.el, CAST(sum(DISTINCT (1::BIGINT << b.bit)) AS BIGINT) AS m0
       |  FROM els e JOIN bits b USING (event_type) GROUP BY e.el),
       |exact AS (
       |  SELECT a.event_type AS type_a, b.event_type AS type_b,
       |         CAST(sum(CASE WHEN (m.m0 & ((1::BIGINT << a.bit) | (1::BIGINT << b.bit)))
       |                       = ((1::BIGINT << a.bit) | (1::BIGINT << b.bit)) THEN 1 ELSE 0 END)
       |           * 1000000
       |           // sum(CASE WHEN (m.m0 & ((1::BIGINT << a.bit) | (1::BIGINT << b.bit)))
       |                          != 0 THEN 1 ELSE 0 END) AS BIGINT) AS exact_fp
       |  FROM bits a JOIN bits b ON a.event_type < b.event_type CROSS JOIN um m
       |  GROUP BY 1, 2)
       |SELECT type_a, type_b, est_fp, exact_fp
       |FROM est JOIN exact USING (type_a, type_b)
       |ORDER BY type_a, type_b""".stripMargin

  // ---- theta/KMV set algebra across sources ------------------------------

  /** Hash-space size of [[TextOps.baseHash]] (60 bits). */
  val ThetaM: Long = 1L << 60

  /** Overflow guard for the KMV estimator: `(k−1)·(M div h_k)` with h_k
    * floored here stays ≤ 63·2^48 ≈ 1.7e16, inside int64. The floor
    * only binds when the true distinct count approaches M/4096·k ≈
    * 1.8e16 elements — far beyond any corpus. */
  val ThetaMinHk = 4096L

  /** Theta/KMV set algebra over source pairs — the sketch-union algebra
    * the theta-sketch family is built for (KMV distinct estimates:
    * Beyer et al., SIGMOD 2007; set operations on theta sketches:
    * Dasgupta et al.): per source, the [[KmvK]] smallest 60-bit shingle
    * hashes form the sketch; a pair's UNION sketch is bottom-K of the
    * merged sketches, giving |A∪B| ≈ (k−1)·M/h_k, the Jaccard from the
    * union sketch's both-sides fraction, |A∩B| = J·|A∪B|, and
    * |A\B| = |A| − |A∩B| — every set operation computed from bounded
    * sketches, never from the corpus. A sketch with fewer than K rows
    * IS its set, so its count is exact (the standard KMV small-set
    * rule); estimator arithmetic is all integer with the [[ThetaMinHk]]
    * overflow floor, engine-exact. The exact honesty columns per pair
    * come from one pass over a source-bitmask histogram (no pair×corpus
    * join) computed on the [[EvalSampling]] doc-id subset — the sketch
    * side reads the full corpus (that's the operator), but the exact
    * ground truth it's audited against is the sample-bounded form every
    * eval entry uses (a 100 TB run dials the sample down; exact-on-
    * full-corpus is exactly what sketches exist to avoid).
    *
    * Scale shape: the corpus-sized work is shingle → distinct (source,
    * hash) → per-source two-phase bottom-K (the salt pre-pass bounds
    * every sort partition); everything pairwise operates on ≤ K rows
    * per sketch across |sources|² pairs. The exact side is one
    * map-side-combinable mask aggregate over the sample; source
    * cardinality beyond 60 spills into additional mask words (the
    * bitmask is chunked, not a `require`). Output per (src_a < src_b):
    * (union_est, inter_est, diff_a_est, union_exact_s, inter_exact_s). */
  def thetaSourceOps(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // ONE tokenize+hash pass carries doc_id so the full sketch side and
    // the sampled exact side both derive from the same materialized
    // relation (a second tokenize pass for the sample measured +40% on
    // this entry at sf0.1 — the explode+md5 is the dominant cost).
    // Round-8 (verdict item 3): the pass is persisted UNDEDUPED — the
    // old (doc_id, source, h) distinct() was the entry's widest
    // exchange and neither consumer needs it: the sketch side dedups at
    // (source, h) width below, the sampled exact side dedups after its
    // doc-id filter. Within-doc shingles are mostly unique anyway, so
    // the persist grows little while the wide shuffle disappears.
    val shDoc = docs.select(col("doc_id"), col("source"),
        explode(TextOps.shingles(TextOps.tokens(col("text")))).as("s"))
      .select(col("doc_id"), col("source"), baseHash(col("s")).as("h"))
      .transform(graft.util.Materialize.corpus)
    val sh = shDoc.select("source", "h").distinct()
    // two-phase bottom-K per source (same skew discipline as kmvJaccard)
    val wLocal = Window.partitionBy("source", "salt").orderBy("h")
    val wK = Window.partitionBy("source").orderBy("h")
    val sk = sh.withColumn("salt", pmod(col("h"), lit(64)))
      .withColumn("rk", row_number().over(wLocal)).filter(col("rk") <= KmvK)
      .withColumn("rk", row_number().over(wK)).filter(col("rk") <= KmvK)
      .select("source", "h")
      .localCheckpoint(true) // feeds per-source stats + every pair union
    def kmvEst(cnt: String, hk: String) = expr(
      s"IF($cnt < $KmvK, $cnt, ${KmvK - 1} * (${ThetaM}L div greatest($hk, ${ThetaMinHk}L)))")
    val perSrc = sk.groupBy("source")
      .agg(count(lit(1)).as("cnt"), max("h").as("hk"))
      .withColumn("a_est", kmvEst("cnt", "hk"))
    val srcs = sk.select(col("source").as("t")).distinct()
    val pairs = srcs.as("x").join(srcs.as("y"), col("x.t") < col("y.t"))
      .select(col("x.t").as("src_a"), col("y.t").as("src_b"))
    val members = pairs
      .select(col("src_a"), col("src_b"),
        explode(array(col("src_a"), col("src_b"))).as("source"))
      .join(sk, "source")
      .groupBy("src_a", "src_b", "h")
      .agg(
        max(when(col("source") === col("src_a"), 1L).otherwise(0L)).as("in_a"),
        max(when(col("source") === col("src_b"), 1L).otherwise(0L)).as("in_b"))
    val wU = Window.partitionBy("src_a", "src_b").orderBy("h")
    val est = members.withColumn("rk", row_number().over(wU))
      .filter(col("rk") <= KmvK)
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("ucnt"), max("h").as("uhk"),
        sum(col("in_a") * col("in_b")).as("matches"))
      .withColumn("union_est", kmvEst("ucnt", "uhk"))
      .withColumn("inter_est", expr("matches * union_est div ucnt"))
      .join(broadcast(perSrc.select(col("source").as("src_a"), col("a_est"))), Seq("src_a"))
      .withColumn("diff_a_est", greatest(col("a_est") - col("inter_est"), lit(0L)))
    // exact honesty side: sampled corpus → one bitmask histogram pass.
    // Sources get (word, bit) slots 60 per int64 mask word, so source
    // cardinality beyond 60 degrades into more mask columns, not a crash.
    val spark = docs.sparkSession
    import spark.implicits._
    val srcNames = docs.select(col("source")).distinct()
      .orderBy("source").collect().map(_.getString(0))
    val nWords = math.max(1, (srcNames.length + 59) / 60)
    def wordExpr(w: Int) = srcNames.zipWithIndex
      .filter(_._2 / 60 == w)
      .foldLeft(lit(0L)) { case (acc, (t, i)) =>
        acc.bitwiseOR(when(col("source") === t, lit(1L << (i % 60))).otherwise(0L))
      }
    val shS = shDoc.filter(expr(EvalSampling.sqlPred("doc_id")))
      .select("source", "h").distinct()
    val wordAggs = (0 until nWords).map(w => expr(s"bit_or(b$w)").as(s"m$w"))
    val masks = shS
      .select(col("h") +: (0 until nWords).map(w => wordExpr(w).as(s"b$w")): _*)
      .groupBy("h").agg(wordAggs.head, wordAggs.tail: _*)
      .groupBy((0 until nWords).map(w => col(s"m$w")): _*)
      .agg(count(lit(1)).as("n"))
    val pairsLocal = for {
      (ta, ia) <- srcNames.zipWithIndex.toSeq
      (tb, ib) <- srcNames.zipWithIndex.toSeq if ta < tb
    } yield (ta, tb, ia / 60, 1L << (ia % 60), ib / 60, 1L << (ib % 60))
    val maskArr = array((0 until nWords).map(w => col(s"m$w")): _*)
    val exact = broadcast(pairsLocal.toDF("pa", "pb", "wa", "ba", "wb", "bb"))
      .crossJoin(masks)
      .withColumn("hit_a",
        element_at(maskArr, col("wa") + 1).bitwiseAND(col("ba")) =!= 0L)
      .withColumn("hit_b",
        element_at(maskArr, col("wb") + 1).bitwiseAND(col("bb")) =!= 0L)
      .groupBy("pa", "pb")
      .agg(
        sum(when(col("hit_a") || col("hit_b"), col("n")).otherwise(0L)).as("union_exact_s"),
        sum(when(col("hit_a") && col("hit_b"), col("n")).otherwise(0L)).as("inter_exact_s"))
      .select(col("pa").as("src_a"), col("pb").as("src_b"),
        col("union_exact_s"), col("inter_exact_s"))
    est.join(exact, Seq("src_a", "src_b"))
      .select("src_a", "src_b", "union_est", "inter_est", "diff_a_est",
        "union_exact_s", "inter_exact_s")
      .orderBy("src_a", "src_b")
  }

  val thetaSourceOpsOracle: String = {
    val estSql = (cnt: String, hk: String) =>
      s"CASE WHEN $cnt < $KmvK THEN $cnt ELSE ${KmvK - 1} * ($ThetaM // greatest($hk, $ThetaMinHk)) END"
    s"""WITH sh AS (
       |  SELECT DISTINCT source, ${baseHashSql("s")} AS h
       |  FROM (SELECT source, unnest(${TextOps.shinglesSql(TextOps.tokensSql)}) AS s
       |        FROM documents)),
       |sk AS (
       |  SELECT source, h FROM (
       |    SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rk
       |    FROM sh) WHERE rk <= $KmvK),
       |ps AS (
       |  SELECT source, count(*) AS cnt, max(h) AS hk,
       |         ${estSql("count(*)", "max(h)")} AS a_est
       |  FROM sk GROUP BY source),
       |t AS (SELECT DISTINCT source AS ty FROM sk),
       |pairs AS (SELECT x.ty AS src_a, y.ty AS src_b FROM t x JOIN t y ON x.ty < y.ty),
       |members AS (
       |  SELECT p.src_a, p.src_b, s.h,
       |         max(CASE WHEN s.source = p.src_a THEN 1 ELSE 0 END) AS in_a,
       |         max(CASE WHEN s.source = p.src_b THEN 1 ELSE 0 END) AS in_b
       |  FROM pairs p JOIN sk s ON s.source IN (p.src_a, p.src_b)
       |  GROUP BY 1, 2, 3),
       |u AS (
       |  SELECT src_a, src_b, h, in_a, in_b,
       |         row_number() OVER (PARTITION BY src_a, src_b ORDER BY h) AS rk
       |  FROM members),
       |agg AS (
       |  SELECT src_a, src_b, count(*) AS ucnt, max(h) AS uhk,
       |         sum(in_a * in_b) AS matches
       |  FROM u WHERE rk <= $KmvK GROUP BY 1, 2),
       |est AS (
       |  SELECT a.src_a, a.src_b,
       |         ${estSql("a.ucnt", "a.uhk")} AS union_est,
       |         CAST(a.matches * ${estSql("a.ucnt", "a.uhk")} // a.ucnt AS BIGINT) AS inter_est,
       |         p.a_est
       |  FROM agg a JOIN ps p ON p.source = a.src_a),
       |shs AS (
       |  SELECT DISTINCT source, ${baseHashSql("s")} AS h
       |  FROM (SELECT source, unnest(${TextOps.shinglesSql(TextOps.tokensSql)}) AS s
       |        FROM (SELECT * FROM documents
       |              WHERE ${EvalSampling.sqlPred("doc_id")}))),
       |mex AS (
       |  -- exact side WITHOUT the Spark bitmask encoding: the mask is a
       |  -- Spark scale shape (60-bit word chunking, Sketches.scala), not a
       |  -- semantic; the oracle states the RESULT directly so it carries
       |  -- no source-cardinality bound at all (the old single-int64 m0
       |  -- broke silently past 63 sources — the asymmetry the Spark-side
       |  -- chunking fix removed)
       |  SELECT p.src_a, p.src_b, s.h,
       |         max(CASE WHEN s.source = p.src_a THEN 1 ELSE 0 END) AS in_a,
       |         max(CASE WHEN s.source = p.src_b THEN 1 ELSE 0 END) AS in_b
       |  FROM pairs p JOIN shs s ON s.source IN (p.src_a, p.src_b)
       |  GROUP BY 1, 2, 3),
       |exact AS (
       |  SELECT src_a, src_b,
       |         count(*)::BIGINT AS union_exact_s,
       |         CAST(sum(in_a * in_b) AS BIGINT) AS inter_exact_s
       |  FROM mex GROUP BY 1, 2)
       |SELECT e.src_a, e.src_b,
       |       CAST(e.union_est AS BIGINT) AS union_est, e.inter_est,
       |       CAST(greatest(e.a_est - e.inter_est, 0) AS BIGINT) AS diff_a_est,
       |       x.union_exact_s, x.inter_exact_s
       |FROM est e JOIN exact x USING (src_a, src_b)
       |ORDER BY src_a, src_b""".stripMargin
  }
}
