package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-analytics operator family over the `events` table (extension
  * beyond the reference surface: the product-analytics shapes a
  * timeseries engine at scale is actually asked for — funnels, cohort
  * retention, semi-structured property extraction).
  *
  * Scale notes (100 TB):
  *  - every stage keys on `user_id` — the natural partition key of an
  *    event store; the chained funnel joins and the retention self-join
  *    all co-partition on it, so after the first shuffle the rest are
  *    narrow (one Exchange reused across stages);
  *  - event-type filters are pushed into the parquet scan before any
  *    shuffle (predicate pushdown — each stage reads only its type);
  *  - per-user state is O(#stages) aggregates, never a collected event
  *    list: no skew blowup on power users;
  *  - JSON extraction is `get_json_object` (codegen'd, no UDF).
  */
object EventOps {

  private val WeekMs = 7L * 86400000L

  /** Ordered conversion funnel signup → view → click → purchase: a user
    * reaches stage N+1 only with an event of that type STRICTLY AFTER the
    * timestamp that reached stage N (InfluxDB can't express this; every
    * product-analytics store ships it). Emits one row per stage with the
    * number of users reaching it.
    *
    * Shape: one aggregation per stage, each joined user-to-user with the
    * previous stage's reach time — min(ts of qualifying events). */
  def funnel(events: DataFrame): DataFrame = {
    val byType = (t: String) => events.filter(col("event_type") === t)
      .select(col("user_id"), expr("ts_ns div 1000000").as("ts_ms"))
    val s1 = byType("signup").groupBy("user_id").agg(min("ts_ms").as("t1"))
    val s2 = byType("view").join(s1, "user_id").filter(col("ts_ms") > col("t1"))
      .groupBy("user_id").agg(min("ts_ms").as("t2"))
    val s3 = byType("click").join(s2, "user_id").filter(col("ts_ms") > col("t2"))
      .groupBy("user_id").agg(min("ts_ms").as("t3"))
    val s4 = byType("purchase").join(s3, "user_id").filter(col("ts_ms") > col("t3"))
      .groupBy("user_id").agg(min("ts_ms").as("t4"))
    val stage = (n: Int, t: String, df: DataFrame) =>
      df.agg(count(lit(1)).as("n_users")).select(
        lit(n.toLong).as("stage"), lit(t).as("event_type"), col("n_users"))
    stage(1, "signup", s1)
      .unionByName(stage(2, "view", s2))
      .unionByName(stage(3, "click", s3))
      .unionByName(stage(4, "purchase", s4))
      .orderBy("stage")
  }

  val funnelOracle: String =
    """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ts_ms FROM events),
      |s1 AS (SELECT user_id, min(ts_ms) AS t1 FROM e WHERE event_type = 'signup' GROUP BY 1),
      |s2 AS (SELECT e.user_id, min(ts_ms) AS t2 FROM e JOIN s1 USING (user_id)
      |       WHERE event_type = 'view' AND ts_ms > t1 GROUP BY 1),
      |s3 AS (SELECT e.user_id, min(ts_ms) AS t3 FROM e JOIN s2 USING (user_id)
      |       WHERE event_type = 'click' AND ts_ms > t2 GROUP BY 1),
      |s4 AS (SELECT e.user_id, min(ts_ms) AS t4 FROM e JOIN s3 USING (user_id)
      |       WHERE event_type = 'purchase' AND ts_ms > t3 GROUP BY 1)
      |SELECT 1::BIGINT AS stage, 'signup' AS event_type, count(*) AS n_users FROM s1
      |UNION ALL SELECT 2, 'view', count(*) FROM s2
      |UNION ALL SELECT 3, 'click', count(*) FROM s3
      |UNION ALL SELECT 4, 'purchase', count(*) FROM s4
      |ORDER BY stage""".stripMargin

  /** Weekly cohort retention: users grouped by the epoch-week of their
    * first event; for each (cohort_week, week_offset), how many of the
    * cohort were active that week. The classic retention triangle.
    *
    * Shape: distinct (user, week) first — collapses the event volume to
    * user-week granularity BEFORE the cohort join, so the join input is
    * bounded by users x weeks, not by raw events. */
  def retention(events: DataFrame): DataFrame = {
    val weeks = events
      .select(col("user_id"), expr(s"ts_ns div 1000000 div $WeekMs").as("week"))
      .distinct()
    val cohort = weeks.groupBy("user_id").agg(min("week").as("cohort_week"))
    weeks.join(cohort, "user_id")
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  val retentionOracle: String =
    s"""WITH w AS (SELECT DISTINCT user_id, epoch_ms(ts) // $WeekMs AS week FROM events),
       |c AS (SELECT user_id, min(week) AS cohort_week FROM w GROUP BY 1)
       |SELECT cohort_week, week - cohort_week AS week_offset, count(*) AS n_users
       |FROM w JOIN c USING (user_id)
       |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin

  /** Semi-structured property extraction: pull `$$.k` out of the JSON
    * `props` column (codegen'd `get_json_object`, no UDF) and aggregate
    * it per event type. The "events carry a JSON blob" shape every
    * telemetry pipeline has. */
  def jsonExtract(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(sum("k").as("sum_k"), max("k").as("max_k"),
        count(lit(1)).as("n_events"))
      .orderBy("event_type")

  val jsonExtractOracle: String =
    """SELECT event_type,
      |       CAST(sum(json_extract(props, '$.k')::BIGINT) AS BIGINT) AS sum_k,
      |       max(json_extract(props, '$.k')::BIGINT) AS max_k,
      |       count(*) AS n_events
      |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin

  private val DayMs = 86400000L

  /** Rolling active users: for every day, DAU (distinct users that day)
    * and trailing-7-day WAU (distinct users in [day-6, day]). Emits every
    * window-day any event contributes to, including the trailing 6 past
    * the last event day (still well-defined trailing windows).
    *
    * Shape: dedup to (user, day) FIRST — the explode and the distinct
    * aggregation run over user×day granularity, bounded by users × days,
    * not raw event volume; the ×7 window explode replaces a self-join
    * range predicate (which would be a non-equi join Spark can only
    * nested-loop). One shuffle for the dedup, one for the final agg. */
  def activeUsers(events: DataFrame): DataFrame =
    events
      .select(col("user_id"), expr(s"ts_ns div 1000000 div $DayMs").as("day"))
      .distinct()
      .select(col("user_id"), col("day"),
        explode(sequence(col("day"), col("day") + 6)).as("win_day"))
      .groupBy(col("win_day").as("day"))
      .agg(
        countDistinct(when(col("win_day") === col("day"), col("user_id"))).as("dau"),
        countDistinct("user_id").as("wau7"))
      .orderBy("day")

  val activeUsersOracle: String =
    s"""WITH du AS (SELECT DISTINCT user_id, epoch_ms(ts) // $DayMs AS day FROM events),
       |x AS (SELECT user_id, day, day + t.o AS win_day FROM du, range(0, 7) t(o))
       |SELECT win_day AS day,
       |       count(DISTINCT CASE WHEN day = win_day THEN user_id END) AS dau,
       |       count(DISTINCT user_id) AS wau7
       |FROM x GROUP BY 1 ORDER BY day""".stripMargin

  /** Last-touch attribution: each purchase is credited to the user's most
    * recent prior click/view ('none' when the purchase has no prior
    * touch). The as-of machinery is [[graft.operators.AsOf.latestPrior]] —
    * one shuffle on user_id, running-last window, no range join. Ordering
    * key is the ns timestamp (unique per user in the events model), so
    * the credited touch is exact, not a tie-broken guess. */
  def attribution(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_ns"))
    val touches = events.filter(col("event_type").isin("click", "view"))
      .select(col("user_id"), col("ts_ns"), col("event_type"))
    graft.operators.AsOf.latestPrior(
        purchases, touches, Seq("user_id"), "ts_ns", "event_type", "touch")
      .groupBy(coalesce(col("touch"), lit("none")).as("touch"))
      .agg(count(lit(1)).as("n_purchases"))
      .orderBy("touch")
  }

  val attributionOracle: String =
    """WITH p AS (SELECT user_id, epoch_ns(ts) AS ts_ns FROM events WHERE event_type = 'purchase'),
      |t AS (SELECT user_id, epoch_ns(ts) AS ts_ns, event_type FROM events
      |      WHERE event_type IN ('click', 'view'))
      |SELECT coalesce(t.event_type, 'none') AS touch, count(*) AS n_purchases
      |FROM p ASOF LEFT JOIN t ON p.user_id = t.user_id AND t.ts_ns <= p.ts_ns
      |GROUP BY 1 ORDER BY touch""".stripMargin

  /** Pareto power users: the smallest prefix of users (by event count,
    * ties → lower user_id) that covers ≥ 50% of all events. Output
    * (rank, user_id, n_events, cum_events), one row per needed user.
    *
    * Shape: events collapse to per-user counts FIRST (map-side partial),
    * so the ranking window runs over the user relation — bounded by
    * user cardinality, not event volume; the cumulative share is
    * inherently sequential and stays on that small relation. */
  def powerUsers(events: DataFrame): DataFrame = {
    val counts = events.groupBy("user_id").agg(count(lit(1)).as("n_events"))
    val total = events.count()
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_events").desc, col("user_id"))
    counts
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum_events", sum("n_events").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      // a user is needed while coverage BEFORE them is still < 50%
      .filter((col("cum_events") - col("n_events")) * 2 < total)
      .select("rank", "user_id", "n_events", "cum_events")
      .orderBy("rank")
  }

  val powerUsersOracle: String =
    """WITH c AS (SELECT user_id, count(*) AS n_events FROM events GROUP BY 1),
      |t AS (SELECT count(*) AS total FROM events),
      |r AS (SELECT user_id, n_events,
      |             row_number() OVER (ORDER BY n_events DESC, user_id) AS rank,
      |             sum(n_events) OVER (ORDER BY n_events DESC, user_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_events
      |      FROM c)
      |SELECT rank, user_id, n_events, CAST(cum_events AS BIGINT) AS cum_events
      |FROM r, t WHERE (cum_events - n_events) * 2 < total
      |ORDER BY rank""".stripMargin

  /** User-path transitions: counts of consecutive (prev_type → type)
    * bigrams per user journey — the Markov-chain edge weights of product
    * flow analysis. One window shuffle on user_id (ordered by the unique
    * (ts_ns, event_id) key), then a plain hash aggregate. */
  def transitions(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts_ns", "event_id")
    events
      .select(col("user_id"), col("event_id"), col("ts_ns"), col("event_type"))
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("prev_type", "next_type")
  }

  val transitionsOracle: String =
    """WITH s AS (
      |  SELECT user_id, event_type,
      |         lag(event_type) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) AS prev_type
      |  FROM events)
      |SELECT prev_type, event_type AS next_type, count(*) AS n
      |FROM s WHERE prev_type IS NOT NULL
      |GROUP BY 1, 2 ORDER BY prev_type, next_type""".stripMargin

  /** Markov next-event model over [[transitions]]: row-normalized
    * transition probabilities in 1e6 fixed point (integer division, so
    * both engines bucket identically). The normalizing row totals are a
    * per-prev_type aggregate over the transition matrix — a relation
    * bounded by event-type² regardless of stream size — broadcast back.
    * Output (prev_type, next_type, n, prob_fp). */
  def markov(events: DataFrame): DataFrame = {
    val t = transitions(events)
    val totals = t.groupBy("prev_type").agg(sum("n").as("tot"))
    t.join(broadcast(totals), Seq("prev_type"))
      .select(col("prev_type"), col("next_type"), col("n"),
        expr("n * 1000000 div tot").as("prob_fp"))
      .orderBy("prev_type", "next_type")
  }

  val markovOracle: String =
    """WITH s AS (
      |  SELECT user_id, event_type,
      |         lag(event_type) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) AS prev_type
      |  FROM events),
      |t AS (
      |  SELECT prev_type, event_type AS next_type, count(*) AS n
      |  FROM s WHERE prev_type IS NOT NULL GROUP BY 1, 2),
      |tot AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS tot FROM t GROUP BY 1)
      |SELECT t.prev_type, t.next_type, t.n,
      |       CAST(t.n * 1000000 // tot.tot AS BIGINT) AS prob_fp
      |FROM t JOIN tot USING (prev_type)
      |ORDER BY prev_type, next_type""".stripMargin

  /** Cross-series Pearson correlation (the Flux `pearsonr`/`cov` shape):
    * correlation of hourly mean values between every event-type pair.
    * The raw stream collapses to (type × hour) QUANTIZED means first —
    * map-side-combinable, bounded by types × hours regardless of event
    * volume — and every later stage (self-join on hour, moment sums)
    * runs on that bounded relation. Moments are exact int64 sums of the
    * quantized values, so the one float expression at the end (fixed op
    * order in both engines) is deterministic. Constant series drop
    * (zero variance). Output (type_a, type_b, n, corr_fp). */
  def typeCorrelation(events: DataFrame): DataFrame = {
    val hourly = events
      .select(col("event_type"),
        expr("(ts_ns div 3600000000000) * 3600000").as("hour_ms"),
        col("value"))
      .groupBy("event_type", "hour_ms")
      .agg(floor(avg("value") * 100).cast("long").as("v"))
    val p = hourly.as("a").join(hourly.as("b"),
        col("a.hour_ms") === col("b.hour_ms") &&
          col("a.event_type") < col("b.event_type"))
      .select(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"),
        col("a.v").as("x"), col("b.v").as("y"))
    p.groupBy("type_a", "type_b")
      .agg(count(lit(1)).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .withColumn("dx", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("dy", col("n") * col("syy") - col("sy") * col("sy"))
      .filter(col("dx") > 0 && col("dy") > 0)
      .select(col("type_a"), col("type_b"), col("n"),
        floor((col("n") * col("sxy") - col("sx") * col("sy")) /
          sqrt(col("dx").cast("double") * col("dy").cast("double")) * 1e6)
          .cast("long").as("corr_fp"))
      .orderBy("type_a", "type_b")
  }

  val typeCorrelationOracle: String =
    """WITH h AS (
      |  SELECT event_type, (epoch_ms(ts) // 3600000) * 3600000 AS hour_ms,
      |         CAST(floor(avg(value) * 100) AS BIGINT) AS v
      |  FROM events GROUP BY 1, 2),
      |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b, a.v AS x, b.v AS y
      |      FROM h a JOIN h b ON a.hour_ms = b.hour_ms AND a.event_type < b.event_type),
      |s AS (SELECT type_a, type_b, count(*) AS n,
      |             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |             CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy,
      |             CAST(sum(x * y) AS BIGINT) AS sxy
      |      FROM p GROUP BY 1, 2)
      |SELECT type_a, type_b, n,
      |       CAST(floor((n * sxy - sx * sy) /
      |              sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE))
      |              * 1000000) AS BIGINT) AS corr_fp
      |FROM s WHERE (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
      |ORDER BY type_a, type_b""".stripMargin

  // ---- first-touch attribution --------------------------------------------

  /** First-touch attribution: each purchase credits the user's EARLIEST
    * view (the acquisition touch), vs [[attribution]]'s last-touch.
    * Per-user first-view times are one map-side-combinable min — a
    * user-cardinality relation that joins back to conversions without
    * re-shuffling events. Daily counts of attributed vs organic
    * (no prior view) conversions. Output
    * (day_ms, n_attributed, n_organic). */
  def firstTouch(events: DataFrame): DataFrame = {
    val firstView = events.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(expr("ts_ns")).as("ft_ns"))
    events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_ns"))
      .join(firstView, Seq("user_id"), "left")
      .select(
        (expr("ts_ns div 86400000000000") * 86400000L).as("day_ms"),
        when(col("ft_ns").isNotNull && col("ft_ns") < col("ts_ns"), 1L)
          .otherwise(0L).as("att"))
      .groupBy("day_ms")
      .agg(sum("att").as("n_attributed"),
        (count(lit(1)) - sum("att")).as("n_organic"))
      .orderBy("day_ms")
  }

  val firstTouchOracle: String =
    """WITH fv AS (
      |  SELECT user_id, min(epoch_ns(ts)) AS ft_ns FROM events
      |  WHERE event_type = 'view' GROUP BY 1),
      |p AS (
      |  SELECT (epoch_ns(e.ts) // 86400000000000) * 86400000 AS day_ms,
      |         CASE WHEN fv.ft_ns IS NOT NULL AND fv.ft_ns < epoch_ns(e.ts)
      |              THEN 1 ELSE 0 END AS att
      |  FROM events e LEFT JOIN fv USING (user_id)
      |  WHERE e.event_type = 'purchase')
      |SELECT day_ms, CAST(sum(att) AS BIGINT) AS n_attributed,
      |       CAST(count(*) - sum(att) AS BIGINT) AS n_organic
      |FROM p GROUP BY day_ms ORDER BY day_ms""".stripMargin

  // ---- RFM segmentation ---------------------------------------------------

  /** RFM (recency / frequency / monetary) quartile segmentation — the
    * classic customer-value cube. One aggregation collapses events to a
    * per-user (last_ms, n_events, monetary) triple; three ntile(4)
    * windows run over that user-cardinality relation (never raw events);
    * quartile 1 = best (most recent / most active / highest spend), ties
    * broken by user_id so both engines bucket identically. Output
    * (r, f, m, n_users, monetary_fp_sum). */
  def rfm(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val base = events.groupBy("user_id").agg(
      max(expr("ts_ns div 1000000")).as("last_ms"),
      count(lit(1)).as("n_events"),
      sum(floor(col("value") * 100)).cast("long").as("m_fp"))
    base
      .withColumn("r", ntile(4).over(w.orderBy(col("last_ms").desc, col("user_id"))).cast("long"))
      .withColumn("f", ntile(4).over(w.orderBy(col("n_events").desc, col("user_id"))).cast("long"))
      .withColumn("m", ntile(4).over(w.orderBy(col("m_fp").desc, col("user_id"))).cast("long"))
      .groupBy("r", "f", "m")
      .agg(count(lit(1)).as("n_users"), sum("m_fp").as("monetary_fp_sum"))
      .orderBy("r", "f", "m")
  }

  val rfmOracle: String =
    """WITH base AS (
      |  SELECT user_id, max(epoch_ms(ts)) AS last_ms, count(*) AS n_events,
      |         CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS m_fp
      |  FROM events GROUP BY 1),
      |q AS (
      |  SELECT user_id, m_fp,
      |         ntile(4) OVER (ORDER BY last_ms DESC, user_id) AS r,
      |         ntile(4) OVER (ORDER BY n_events DESC, user_id) AS f,
      |         ntile(4) OVER (ORDER BY m_fp DESC, user_id) AS m
      |  FROM base)
      |SELECT r, f, m, count(*) AS n_users,
      |       CAST(sum(m_fp) AS BIGINT) AS monetary_fp_sum
      |FROM q GROUP BY 1, 2, 3 ORDER BY r, f, m""".stripMargin

  // ---- time to convert ----------------------------------------------------

  /** Signup→purchase conversion-delay histogram (whole days): per user,
    * first signup and first purchase strictly after it — the same
    * stage-pairing joins as [[funnel]], co-partitioned on user_id — then
    * one tiny aggregation over delay buckets. Output
    * (delay_days, n_users). */
  def timeToConvert(events: DataFrame): DataFrame = {
    val byType = (t: String) => events.filter(col("event_type") === t)
      .select(col("user_id"), expr("ts_ns div 1000000").as("ts_ms"))
    val s = byType("signup").groupBy("user_id").agg(min("ts_ms").as("t1"))
    val p = byType("purchase").join(s, "user_id").filter(col("ts_ms") > col("t1"))
      .groupBy("user_id").agg(min("ts_ms").as("t2"), min("t1").as("t1m"))
    p.select(expr("(t2 - t1m) div 86400000").as("delay_days"))
      .groupBy("delay_days").agg(count(lit(1)).as("n_users"))
      .orderBy("delay_days")
  }

  val timeToConvertOracle: String =
    """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ts_ms FROM events),
      |s AS (SELECT user_id, min(ts_ms) AS t1 FROM e WHERE event_type = 'signup' GROUP BY 1),
      |p AS (SELECT e.user_id, min(ts_ms) AS t2, min(t1) AS t1m
      |      FROM e JOIN s USING (user_id)
      |      WHERE event_type = 'purchase' AND ts_ms > t1 GROUP BY 1)
      |SELECT (t2 - t1m) // 86400000 AS delay_days, count(*) AS n_users
      |FROM p GROUP BY 1 ORDER BY delay_days""".stripMargin

  // ---- activity streaks (gaps and islands) --------------------------------

  /** Longest streaks kept. */
  val StreakTopN = 20

  /** Top-[[StreakTopN]] longest consecutive-day activity streaks: the
    * classic gaps-and-islands shape. Collapse to distinct (user, day)
    * FIRST (the per-user relation is then bounded by days, not events —
    * no power-user skew), then island key = day - row_number() per user,
    * then one aggregation per island. The final top-N is
    * TakeOrderedAndProject over per-user maxima — no global sort of the
    * island relation. Output (user_id, start_day_ms, streak_len). */
  def streaks(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("day")
    events
      .select(col("user_id"), expr("ts_ns div 86400000000000").as("day"))
      .distinct()
      .withColumn("isl", col("day") - row_number().over(w))
      .groupBy("user_id", "isl")
      .agg(count(lit(1)).as("streak_len"), (min("day") * 86400000L).as("start_day_ms"))
      .select("user_id", "start_day_ms", "streak_len")
      .orderBy(col("streak_len").desc, col("user_id"), col("start_day_ms"))
      .limit(StreakTopN)
  }

  val streaksOracle: String =
    s"""WITH d AS (
       |  SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day FROM events),
       |i AS (
       |  SELECT user_id, day,
       |         day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS isl
       |  FROM d),
       |s AS (
       |  SELECT user_id, min(day) * 86400000 AS start_day_ms, count(*) AS streak_len
       |  FROM i GROUP BY user_id, isl)
       |SELECT user_id, start_day_ms, streak_len FROM s
       |ORDER BY streak_len DESC, user_id, start_day_ms LIMIT $StreakTopN""".stripMargin

  // ---- weekly activity profile --------------------------------------------

  /** Day-of-week × hour-of-day activity heatmap — the seasonality
    * profile behind load forecasting and anomaly baselines. Day-of-week
    * from epoch-day arithmetic ((day + 4) % 7, 0 = Sunday) — integer
    * math, no timezone/locale dependency in either engine. One
    * map-side-combinable aggregate to a fixed 168-cell relation.
    * Output (dow, hour, n_events). */
  def weeklyProfile(events: DataFrame): DataFrame =
    events.select(
        expr("(ts_ns div 86400000000000 + 4) % 7").as("dow"),
        expr("(ts_ns div 3600000000000) % 24").as("hour"))
      .groupBy("dow", "hour").agg(count(lit(1)).as("n_events"))
      .orderBy("dow", "hour")

  val weeklyProfileOracle: String =
    """SELECT (epoch_ms(ts) // 86400000 + 4) % 7 AS dow,
      |       (epoch_ms(ts) // 3600000) % 24 AS hour,
      |       count(*) AS n_events
      |FROM events GROUP BY 1, 2 ORDER BY dow, hour""".stripMargin

  // ---- burst detection ----------------------------------------------------

  /** Hours whose event count exceeds 2× the per-type hourly mean —
    * anomaly/burst detection in exact integer arithmetic
    * (n × n_hours > 2 × total avoids any float mean). Two stacked
    * map-side-combinable aggregations plus a broadcast of the per-type
    * totals (|event types| rows); the hourly-count relation never
    * re-shuffles. Output (event_type, hour_ms, n). */
  def bursts(events: DataFrame): DataFrame = {
    val hourly = events
      .select(col("event_type"), expr("ts_ns div 3600000000000").as("h"))
      .groupBy("event_type", "h").agg(count(lit(1)).as("n"))
    val totals = hourly.groupBy("event_type")
      .agg(count(lit(1)).as("n_hours"), sum("n").as("total"))
    hourly.join(broadcast(totals), Seq("event_type"))
      .filter(col("n") * col("n_hours") > lit(2) * col("total"))
      .select(col("event_type"), (col("h") * 3600000L).as("hour_ms"), col("n"))
      .orderBy("event_type", "hour_ms")
  }

  val burstsOracle: String =
    """WITH c AS (
      |  SELECT event_type, epoch_ms(ts) // 3600000 AS h, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |t AS (SELECT event_type, count(*) AS n_hours, sum(n) AS total FROM c GROUP BY 1)
      |SELECT c.event_type, c.h * 3600000 AS hour_ms, c.n
      |FROM c JOIN t USING (event_type)
      |WHERE c.n * t.n_hours > 2 * t.total
      |ORDER BY event_type, hour_ms""".stripMargin

  /** Daily-count anomalies per event type: days whose count deviates
    * from the type's mean by MORE than two standard deviations, decided
    * in exact integer arithmetic — |x−μ| > 2σ cross-multiplied to
    * (x·n − S)² > 4·(n·Q − S²) with S=Σx, Q=Σx², n=#days — so no float
    * summation order ever reaches the verdict (z-score thresholding is
    * the usual ulp trap). Two stacked map-side aggregates; the
    * type-cardinality stats relation broadcasts. Output
    * (event_type, day_ms, n_events). */
  def anomalyDays(events: DataFrame): DataFrame = {
    val daily = events
      .select(col("event_type"), expr("ts_ms div 86400000").as("d"))
      .groupBy("event_type", "d").agg(count(lit(1)).as("n_events"))
    val stats = daily.groupBy("event_type").agg(
      count(lit(1)).as("n_days"),
      sum("n_events").as("s"),
      sum(col("n_events") * col("n_events")).as("q"))
    val dev = col("n_events") * col("n_days") - col("s")
    daily.join(broadcast(stats), Seq("event_type"))
      .filter(dev * dev > lit(4) * (col("n_days") * col("q") - col("s") * col("s")))
      .select(col("event_type"), (col("d") * 86400000L).as("day_ms"), col("n_events"))
      .orderBy("event_type", "day_ms")
  }

  val anomalyDaysOracle: String =
    """WITH daily AS (
      |  SELECT event_type, epoch_ms(ts) // 86400000 AS d, count(*) AS n_events
      |  FROM events GROUP BY 1, 2),
      |st AS (
      |  SELECT event_type, count(*) AS n_days,
      |         CAST(sum(n_events) AS BIGINT) AS s,
      |         CAST(sum(n_events * n_events) AS BIGINT) AS q
      |  FROM daily GROUP BY 1)
      |SELECT d.event_type, d.d * 86400000 AS day_ms, d.n_events
      |FROM daily d JOIN st USING (event_type)
      |WHERE (d.n_events * st.n_days - st.s) * (d.n_events * st.n_days - st.s)
      |      > 4 * (st.n_days * st.q - st.s * st.s)
      |ORDER BY event_type, day_ms""".stripMargin

  // ---- cohort LTV triangle ------------------------------------------------

  /** Lifetime-value triangle: cohort = a user's FIRST-ever activity week
    * (any event type), each later week contributes that cohort's purchase
    * revenue at its week offset, and a per-cohort cumulative sum yields
    * LTV; normalized per cohort member (the marketing-payback readout
    * product analytics stores ship next to [[retention]]).
    *
    * Shape: per-user first-week and per-(user, week) revenue both collapse
    * map-side on user_id; the triangle is (cohorts × offsets) rows, so the
    * cumulative window runs on the collapsed relation and the cohort-size
    * join is a broadcast. Revenue is exact centi-integer; per-user LTV is
    * a positive integer floor division (identical in both engines).
    * Output (cohort_week, week_offset, rev_fp, n_buyers, cohort_size,
    * cum_rev_fp, ltv_per_user_fp). */
  def ltvCohort(events: DataFrame): DataFrame = {
    val wk = events.select(col("user_id"),
      expr(s"ts_ns div 1000000 div $WeekMs").as("week"),
      col("event_type"), col("value"))
    val cohort = wk.groupBy("user_id").agg(min("week").as("cohort_week"))
    val cohortSize = cohort.groupBy("cohort_week").agg(count(lit(1)).as("cohort_size"))
    val rev = wk.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("week"), floor(col("value") * 100).cast("long").as("r"))
    val tri = rev.join(cohort, "user_id")
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(sum("r").as("rev_fp"), countDistinct("user_id").as("n_buyers"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cohort_week").orderBy("week_offset")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    tri.withColumn("cum_rev_fp", sum("rev_fp").over(w))
      .join(broadcast(cohortSize), Seq("cohort_week"))
      .withColumn("ltv_per_user_fp", expr("cum_rev_fp * 1000 div cohort_size"))
      .select("cohort_week", "week_offset", "rev_fp", "n_buyers",
        "cohort_size", "cum_rev_fp", "ltv_per_user_fp")
      .orderBy("cohort_week", "week_offset")
  }

  val ltvCohortOracle: String =
    s"""WITH wk AS (SELECT user_id, epoch_ms(ts) // $WeekMs AS week, event_type, value
       |            FROM events),
       |c AS (SELECT user_id, min(week) AS cohort_week FROM wk GROUP BY 1),
       |cs AS (SELECT cohort_week, count(*) AS cohort_size FROM c GROUP BY 1),
       |r AS (SELECT user_id, week, CAST(floor(value * 100) AS BIGINT) AS r
       |      FROM wk WHERE event_type = 'purchase'),
       |t AS (SELECT c.cohort_week, r.week - c.cohort_week AS week_offset,
       |             CAST(sum(r.r) AS BIGINT) AS rev_fp,
       |             count(DISTINCT r.user_id) AS n_buyers
       |      FROM r JOIN c USING (user_id) GROUP BY 1, 2),
       |x AS (SELECT t.*, CAST(sum(rev_fp) OVER (
       |               PARTITION BY cohort_week ORDER BY week_offset
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_rev_fp
       |      FROM t)
       |SELECT x.cohort_week, x.week_offset, x.rev_fp, x.n_buyers, cs.cohort_size,
       |       x.cum_rev_fp, x.cum_rev_fp * 1000 // cs.cohort_size AS ltv_per_user_fp
       |FROM x JOIN cs USING (cohort_week)
       |ORDER BY cohort_week, week_offset""".stripMargin

  // ---- A/B lift report ----------------------------------------------------

  /** Deterministic A/B experiment readout: variant = user_id % 2 (the
    * hash-bucket assignment every experimentation system uses — here the
    * id itself, already uniform in the synthetic data), metric = per-user
    * purchase revenue. Emits ONE row: per-variant user counts, ARPU in
    * 1e6 fixed point, relative lift in per-mille, and a Welch-style
    * two-sigma significance verdict.
    *
    * Determinism: per-user revenue is integer centi-units; variant
    * aggregates (n, Σr, Σr²) are exact int64; the verdict and lift are
    * scalar IEEE-double expressions over those integers, written
    * token-identically in both engines — no float ever enters an
    * aggregation, so summation order can't reach the result.
    *
    * Scale shape: collapse to per-user revenue first (map-side
    * combinable, keyed on user_id), then a 2-row variant aggregate and a
    * 1×1 join — nothing downstream of the first aggregate depends on
    * event cardinality. Output (n_a, n_b, arpu_a_fp, arpu_b_fp, lift_pm,
    * significant). */
  def abLift(events: DataFrame): DataFrame = {
    val perUser = events.filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(sum(floor(col("value") * 100)).cast("long").as("r"))
      .withColumn("variant", expr("user_id % 2"))
    val stats = perUser.groupBy("variant").agg(
      count(lit(1)).as("n"), sum("r").as("s"),
      sum(col("r") * col("r")).as("q"))
    val a = stats.filter(col("variant") === 0)
      .select(col("n").as("n_a"), col("s").as("s_a"), col("q").as("q_a"))
    val b = stats.filter(col("variant") === 1)
      .select(col("n").as("n_b"), col("s").as("s_b"), col("q").as("q_b"))
    a.crossJoin(b)
      .withColumn("arpu_a_fp", expr("s_a * 1000000 div n_a"))
      .withColumn("arpu_b_fp", expr("s_b * 1000000 div n_b"))
      .withColumn("lift_pm", expr(
        "cast(floor(cast(arpu_b_fp - arpu_a_fp as double) * 1000 / arpu_a_fp) as bigint)"))
      .withColumn("significant", expr(
        """(cast(s_b as double) / n_b - cast(s_a as double) / n_a)
          | * (cast(s_b as double) / n_b - cast(s_a as double) / n_a)
          | > 4 * (cast(n_a * q_a - s_a * s_a as double) / (n_a * n_a * (n_a - 1))
          |      + cast(n_b * q_b - s_b * s_b as double) / (n_b * n_b * (n_b - 1)))""".stripMargin))
      .select("n_a", "n_b", "arpu_a_fp", "arpu_b_fp", "lift_pm", "significant")
  }

  val abLiftOracle: String =
    """WITH r AS (
      |  SELECT user_id, user_id % 2 AS variant,
      |         CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS r
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      |s AS (SELECT variant, count(*) AS n, CAST(sum(r) AS BIGINT) AS s,
      |             CAST(sum(r * r) AS BIGINT) AS q
      |      FROM r GROUP BY 1),
      |a AS (SELECT n AS n_a, s AS s_a, q AS q_a FROM s WHERE variant = 0),
      |b AS (SELECT n AS n_b, s AS s_b, q AS q_b FROM s WHERE variant = 1),
      |m AS (SELECT n_a, n_b, s_a, s_b, q_a, q_b,
      |             s_a * 1000000 // n_a AS arpu_a_fp,
      |             s_b * 1000000 // n_b AS arpu_b_fp
      |      FROM a, b)
      |SELECT n_a, n_b, arpu_a_fp, arpu_b_fp,
      |       CAST(floor(CAST(arpu_b_fp - arpu_a_fp AS DOUBLE) * 1000 / arpu_a_fp) AS BIGINT) AS lift_pm,
      |       (CAST(s_b AS DOUBLE) / n_b - CAST(s_a AS DOUBLE) / n_a)
      |        * (CAST(s_b AS DOUBLE) / n_b - CAST(s_a AS DOUBLE) / n_a)
      |        > 4 * (CAST(n_a * q_a - s_a * s_a AS DOUBLE) / (n_a * n_a * (n_a - 1))
      |             + CAST(n_b * q_b - s_b * s_b AS DOUBLE) / (n_b * n_b * (n_b - 1))) AS significant
      |FROM m""".stripMargin

  // ---- operator: event-type association lift ------------------------------

  /** Market-basket association over event types: for every unordered
    * type pair, the number of users who did BOTH and the lift
    * (P(a∧b) / (P(a)·P(b)), user-based, 1e6 fixed-point) — the
    * co-engagement matrix behind "users who X also Y". Everything
    * collapses to the (user, type) distinct relation FIRST (bounded by
    * users × types, not events); the pair join is per-user and
    * co-partitioned on user_id; per-type totals are a types-bounded
    * broadcast. Output (type_a, type_b, n_both, lift_fp), types²-bounded.
    *
    * lift_fp = n_both · n_users · 1e6 div (n_a · n_b) — all-integer,
    * >1e6 means positive association. */
  def assocLift(events: DataFrame): DataFrame = {
    val ut = events.select("user_id", "event_type").distinct()
      .transform(graft.util.Materialize.corpus) // feeds totals, both sides of the pair join
    val totals = ut.groupBy("event_type").agg(count(lit(1)).as("n"))
    val nUsers = ut.select("user_id").distinct().count()
    val pairs = ut.as("x").join(ut.as("y"),
        col("x.user_id") === col("y.user_id") &&
          col("x.event_type") < col("y.event_type"))
      .groupBy(col("x.event_type").as("type_a"), col("y.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_both"))
    pairs
      .join(broadcast(totals.select(col("event_type").as("type_a"), col("n").as("n_a"))), Seq("type_a"))
      .join(broadcast(totals.select(col("event_type").as("type_b"), col("n").as("n_b"))), Seq("type_b"))
      .select(col("type_a"), col("type_b"), col("n_both"),
        expr(s"n_both * $nUsers * 1000000 div (n_a * n_b)").as("lift_fp"))
      .orderBy("type_a", "type_b")
  }

  val assocLiftOracle: String =
    """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
      |t AS (SELECT event_type, count(*) AS n FROM ut GROUP BY 1),
      |nu AS (SELECT count(DISTINCT user_id) AS nu FROM ut),
      |p AS (SELECT x.event_type AS type_a, y.event_type AS type_b,
      |             count(*) AS n_both
      |      FROM ut x JOIN ut y ON x.user_id = y.user_id
      |                         AND x.event_type < y.event_type
      |      GROUP BY 1, 2)
      |SELECT type_a, type_b, n_both,
      |       n_both * (SELECT nu FROM nu) * 1000000
      |         // (ta.n * tb.n) AS lift_fp
      |FROM p JOIN t ta ON ta.event_type = type_a
      |       JOIN t tb ON tb.event_type = type_b
      |ORDER BY type_a, type_b""".stripMargin

  // ---- operator: session path mining --------------------------------------

  /** Paths longer than this are truncated (the classic "first K steps"
    * path report — unbounded paths explode the distinct-path space). */
  val PathMaxLen = 8

  /** Paths reported. */
  val PathTopN = 20

  /** Session path mining: the most frequent within-session event-type
    * sequences (the product-analytics "top user journeys" report —
    * [[transitions]]' bigram model widened to whole ordered paths).
    * Sessions come from [[graft.operators.Sessionize]] (30 min gap);
    * each session's path is its first [[PathMaxLen]] event types in
    * (ts_ns, event_id) order joined with '>', counted corpus-wide, top
    * [[PathTopN]] by (count desc, path asc).
    *
    * Scale: the per-session collect_list is bounded by session length
    * (behavioral, not corpus-sized); distinct paths are capped by the
    * event-type^[[PathMaxLen]] space but in practice follow a Zipf head;
    * the final top-N is a TakeOrdered, never a global sort. */
  def topPaths(events: DataFrame, gapMs: Long = 1800000L): DataFrame = {
    val assigned = graft.operators.Sessionize.assign(
      events.select(col("user_id"), col("ts_ms"), col("ts_ns"),
        col("event_id"), col("event_type")),
      Seq("user_id"), "ts_ms", gapMs)
    assigned.groupBy("user_id", "session_idx")
      .agg(array_join(
        slice(transform(
          array_sort(collect_list(struct(col("ts_ns"), col("event_id"), col("event_type")))),
          s => s.getField("event_type")), 1, PathMaxLen), ">").as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(PathTopN)
  }

  val topPathsOracle: String =
    s"""WITH x AS (SELECT user_id, event_id, event_type,
       |                  epoch_ms(ts) AS t, epoch_ns(ts) AS tn FROM events),
       |s AS (SELECT user_id, event_id, event_type, t, tn,
       |             CASE WHEN lag(t) OVER w IS NULL OR t - lag(t) OVER w > 1800000
       |                  THEN 1 ELSE 0 END AS ns
       |      FROM x WINDOW w AS (PARTITION BY user_id ORDER BY t)),
       |i AS (SELECT user_id, event_id, event_type, tn,
       |             CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY t
       |                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
       |      FROM s),
       |p AS (SELECT user_id, session_idx,
       |             array_to_string(
       |               (list(event_type ORDER BY tn, event_id))[1:$PathMaxLen],
       |               '>') AS path
       |      FROM i GROUP BY 1, 2)
       |SELECT path, count(*) AS n FROM p
       |GROUP BY 1 ORDER BY n DESC, path LIMIT $PathTopN""".stripMargin

  // ---- operator: Kaplan-Meier survival (user lifetime) -------------------

  /** Kaplan-Meier survival over inter-event WAITING TIMES, by the type
    * of the preceding event — the product-limit estimator (Kaplan &
    * Meier 1958) applied to "how long until this user's next event
    * after a view / click / purchase …", the waiting-time question
    * behind re-engagement and notification timing. Each consecutive
    * event pair of a user contributes a complete (uncensored) gap in
    * hours; each user's OPEN gap (last event → corpus horizon) is
    * right-censored — dropping it would bias the curve optimistic,
    * which is the defect naive next-event analyses have. Per preceding
    * type and gap t: at_risk = gaps ≥ t, deaths = complete gaps = t,
    * and S(t) multiplies (at_risk−deaths)/at_risk over t' ≤ t as an
    * integer fixed-point fold (floor at each step, seed 1e6), so both
    * engines walk the exact same value sequence.
    *
    * Scale shape: corpus-sized work is one lag window on the event
    * store's natural (user_id) key (ordered by ts, event_id — total
    * order, so the gap attribution is deterministic); everything after
    * lives on the (type, gap) histogram — value-bounded at ≤ hours in
    * the observation window per type — including the O(k²) per-type
    * prefix folds. at_risk < 2^31 is assumed by the oracle's
    * packed-BIGINT fold encoding. Output (prev_type, gap_hours,
    * at_risk, deaths, censored, surv_fp). */
  def survivalKm(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = events.select(col("user_id"), col("event_id"), col("event_type"),
      expr("ts_ns div 3600000000000").as("th"))
    val horizon = ev.agg(max("th").as("h"))
    val w = Window.partitionBy("user_id").orderBy("th", "event_id")
    val gaps = ev.withColumn("nth", lead("th", 1).over(w))
      .crossJoin(broadcast(horizon))
      .select(col("event_type").as("ptype"),
        coalesce(col("nth") - col("th"), col("h") - col("th")).as("gap"),
        when(col("nth").isNull, 1L).otherwise(0L).as("cen"))
    val g = gaps.groupBy("ptype", "gap")
      .agg(sum(expr("1 - cen")).as("d"), sum("cen").as("c"))
    val r = g
      .withColumn("cum", sum(col("d") + col("c"))
        .over(Window.partitionBy("ptype").orderBy("gap")))
      .withColumn("n", sum(col("d") + col("c")).over(Window.partitionBy("ptype")))
      .withColumn("at_risk", col("n") - col("cum") + col("d") + col("c"))
    val arr = r.groupBy("ptype").agg(
      sort_array(collect_list(struct(col("gap"), col("at_risk"), col("d"), col("c")))).as("a"))
    arr.select(col("ptype").as("prev_type"), col("a"),
        posexplode(col("a")).as(Seq("i", "x")))
      .select(col("prev_type"),
        col("x.gap").as("gap_hours"), col("x.at_risk").as("at_risk"),
        col("x.d").as("deaths"), col("x.c").as("censored"),
        expr("""aggregate(slice(a, 1, i + 1), 1000000L,
               |(s, e) -> s * (e.at_risk - e.d) div e.at_risk)""".stripMargin)
          .as("surv_fp"))
      .orderBy("prev_type", "gap_hours")
  }

  val survivalKmOracle: String =
    s"""WITH ev AS (SELECT user_id, event_id, event_type,
       |                   epoch_ms(ts) // 3600000 AS th FROM events),
       |h AS (SELECT max(th) AS h FROM ev),
       |gaps AS (SELECT event_type AS ptype,
       |                coalesce(lead(th) OVER (PARTITION BY user_id
       |                                        ORDER BY th, event_id) - th,
       |                         (SELECT h FROM h) - th) AS gap,
       |                CASE WHEN lead(th) OVER (PARTITION BY user_id
       |                                         ORDER BY th, event_id) IS NULL
       |                     THEN 1 ELSE 0 END AS cen
       |         FROM ev),
       |g AS (SELECT ptype, gap, CAST(sum(1 - cen) AS BIGINT) AS d,
       |             CAST(sum(cen) AS BIGINT) AS c
       |      FROM gaps GROUP BY 1, 2),
       |r AS (SELECT ptype, gap, d, c,
       |             CAST(sum(d + c) OVER (PARTITION BY ptype ORDER BY gap
       |                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
       |             CAST(sum(d + c) OVER (PARTITION BY ptype) AS BIGINT) AS n
       |      FROM g),
       |rr AS (SELECT ptype, gap, d, c, n - cum + d + c AS at_risk FROM r),
       |arr AS (SELECT ptype,
       |               list(struct_pack(gap := gap, at_risk := at_risk, d := d, c := c)
       |                    ORDER BY gap) AS a
       |        FROM rr GROUP BY ptype),
       |f AS (SELECT ptype,
       |             unnest(list_transform(range(1, len(a) + 1), i -> struct_pack(
       |               gap := a[i].gap, at_risk := a[i].at_risk,
       |               d := a[i].d, c := a[i].c,
       |               surv := list_reduce(
       |                 list_prepend(1000000::BIGINT,
       |                   list_transform(a[1:i],
       |                     x -> (x.at_risk - x.d) * 2147483648 + x.at_risk)),
       |                 (s, e) -> s * (e // 2147483648) // (e % 2147483648))))) AS o
       |      FROM arr)
       |SELECT ptype AS prev_type, o.gap AS gap_hours, o.at_risk AS at_risk,
       |       o.d AS deaths, o.c AS censored, o.surv AS surv_fp
       |FROM f ORDER BY prev_type, gap_hours""".stripMargin

  // ---- robust (MAD) outlier days ------------------------------------------

  /** Robust daily-volume outliers via median absolute deviation — the
    * heavy-tail-safe complement of [[anomalyDays]]' 2σ rule (one viral
    * day inflates a standard deviation enough to hide a second one; the
    * median/MAD pair is 50%-breakdown robust). Integer-exact: median =
    * the lower order statistic at rank (n+1) div 2 (well-defined under
    * ties regardless of tie order), MAD likewise over |x − med|, flag =
    * dev > 3·MAD with no consistency constant (documented integer
    * rule). A zero MAD (half the days identical) flags every deviating
    * day — the intended alarm for frozen counters.
    *
    * Scale shape: the stream collapses map-side to (type, day) counts;
    * both order-statistic windows run over calendar-bounded day
    * cardinality; medians broadcast back. Output (event_type, day_ms,
    * n_events, med, mad). */
  def madOutliers(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events
      .select(col("event_type"), expr("ts_ms div 86400000").as("d"))
      .groupBy("event_type", "d").agg(count(lit(1)).as("x"))
    val wN = Window.partitionBy("event_type")
    def lowerMedian(df: DataFrame, valueCol: String, outName: String) = df
      .withColumn("rn", row_number().over(
        Window.partitionBy("event_type").orderBy(valueCol)))
      .withColumn("n", count(lit(1)).over(wN))
      .filter(col("rn") === expr("(n + 1) div 2"))
      .select(col("event_type"), col(valueCol).as(outName))
    val med = lowerMedian(daily, "x", "med")
    val dev = daily.join(broadcast(med), "event_type")
      .withColumn("dev", abs(col("x") - col("med")))
    val mad = lowerMedian(dev.select(col("event_type"), col("dev")), "dev", "mad")
    dev.join(broadcast(mad), "event_type")
      .filter(col("dev") > lit(3) * col("mad"))
      .select(col("event_type"), (col("d") * 86400000L).as("day_ms"),
        col("x").as("n_events"), col("med"), col("mad"))
      .orderBy("event_type", "day_ms")
  }

  val madOutliersOracle: String =
    """WITH daily AS (
      |  SELECT event_type, epoch_ms(ts) // 86400000 AS d, count(*) AS x
      |  FROM events GROUP BY 1, 2),
      |mr AS (SELECT event_type, x,
      |              row_number() OVER (PARTITION BY event_type ORDER BY x) AS rn,
      |              count(*) OVER (PARTITION BY event_type) AS n
      |       FROM daily),
      |med AS (SELECT event_type, x AS med FROM mr WHERE rn = (n + 1) // 2),
      |dv AS (SELECT d.event_type, d.d, d.x, m.med, abs(d.x - m.med) AS dev
      |       FROM daily d JOIN med m USING (event_type)),
      |dr AS (SELECT event_type, dev,
      |              row_number() OVER (PARTITION BY event_type ORDER BY dev) AS rn,
      |              count(*) OVER (PARTITION BY event_type) AS n
      |       FROM dv),
      |mad AS (SELECT event_type, dev AS mad FROM dr WHERE rn = (n + 1) // 2)
      |SELECT dv.event_type, dv.d * 86400000 AS day_ms, dv.x AS n_events,
      |       dv.med AS med, mad.mad AS mad
      |FROM dv JOIN mad USING (event_type)
      |WHERE dv.dev > 3 * mad.mad
      |ORDER BY event_type, day_ms""".stripMargin

  // ---- windowed funnel ----------------------------------------------------

  /** Conversion window for [[windowFunnel]], ms (3 days). */
  val FunnelWindowMs = 3L * 86400000L

  /** Windowed funnel (ClickHouse `windowFunnel` semantics): the deepest
    * signup→view→click→purchase chain a user completes with every step
    * inside `windowMs` of the FIRST step — the time-bounded variant of
    * [[funnel]], which admits conversions years apart. EVERY signup is a
    * candidate entry point (not just the user's first): the chain from
    * each t1 takes the EARLIEST qualifying event per step, which is
    * optimal (each minimal t_i only relaxes the constraint on t_{i+1}),
    * so the per-user level is exact, and t2<t3<t4 makes the window test
    * monotone — check t4 first, fall through. Users' best level over all
    * entry points, histogrammed.
    *
    * Shape: every stage keys on user_id (the store's natural partition
    * key); per-stage fan-out is bounded by per-user event counts, the
    * level relation is (user, t1) rows, and the histogram is 4 rows.
    * Output (level, n_users). */
  def windowFunnel(events: DataFrame, windowMs: Long = FunnelWindowMs): DataFrame = {
    val e = events.select(col("user_id"), col("event_type"),
      expr("ts_ns div 1000000").as("ts_ms"))
    val s1 = e.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts_ms").as("t1"))
    val s2 = e.filter(col("event_type") === "view").join(s1, "user_id")
      .filter(col("ts_ms") > col("t1"))
      .groupBy("user_id", "t1").agg(min("ts_ms").as("t2"))
    val s3 = e.filter(col("event_type") === "click").join(s2, "user_id")
      .filter(col("ts_ms") > col("t2"))
      .groupBy("user_id", "t1").agg(min("ts_ms").as("t3"))
    val s4 = e.filter(col("event_type") === "purchase").join(s3, "user_id")
      .filter(col("ts_ms") > col("t3"))
      .groupBy("user_id", "t1").agg(min("ts_ms").as("t4"))
    val lvl = s1
      .join(s2, Seq("user_id", "t1"), "left_outer")
      .join(s3.select("user_id", "t1", "t3"), Seq("user_id", "t1"), "left_outer")
      .join(s4.select("user_id", "t1", "t4"), Seq("user_id", "t1"), "left_outer")
      .select(col("user_id"),
        when(col("t4") - col("t1") <= windowMs, 4L)
          .when(col("t3") - col("t1") <= windowMs, 3L)
          .when(col("t2") - col("t1") <= windowMs, 2L)
          .otherwise(1L).as("lvl"))
    lvl.groupBy("user_id").agg(max("lvl").as("level"))
      .groupBy("level").agg(count(lit(1)).as("n_users"))
      .orderBy("level")
  }

  val windowFunnelOracle: String =
    s"""WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ts_ms FROM events),
       |s1 AS (SELECT user_id, ts_ms AS t1 FROM e WHERE event_type = 'signup'),
       |s2 AS (SELECT e.user_id, t1, min(ts_ms) AS t2 FROM e JOIN s1 USING (user_id)
       |       WHERE event_type = 'view' AND ts_ms > t1 GROUP BY 1, 2),
       |s3 AS (SELECT e.user_id, t1, min(ts_ms) AS t3 FROM e JOIN s2 USING (user_id)
       |       WHERE event_type = 'click' AND ts_ms > t2 GROUP BY 1, 2),
       |s4 AS (SELECT e.user_id, t1, min(ts_ms) AS t4 FROM e JOIN s3 USING (user_id)
       |       WHERE event_type = 'purchase' AND ts_ms > t3 GROUP BY 1, 2),
       |lv AS (SELECT s1.user_id,
       |              CASE WHEN t4 - t1 <= $FunnelWindowMs THEN 4
       |                   WHEN t3 - t1 <= $FunnelWindowMs THEN 3
       |                   WHEN t2 - t1 <= $FunnelWindowMs THEN 2
       |                   ELSE 1 END AS lvl
       |       FROM s1
       |       LEFT JOIN s2 USING (user_id, t1)
       |       LEFT JOIN s3 USING (user_id, t1)
       |       LEFT JOIN s4 USING (user_id, t1)),
       |ul AS (SELECT user_id, max(lvl) AS level FROM lv GROUP BY 1)
       |SELECT level, count(*) AS n_users FROM ul GROUP BY 1 ORDER BY level""".stripMargin

  // ---- CUSUM changepoint on daily volumes ---------------------------------

  /** CUSUM changepoint detection per event type (Page 1954 cumulative
    * sums, in the Taylor change-point form: the argmax of |S_i| over the
    * centered cumulative sum locates the most likely level shift in the
    * daily-volume series — the drift monitor a pipeline runs over its
    * ingest counters).
    *
    * Integer-exact throughout: with x_i the day-i count, n days and
    * S = Σx, the centered cumsum n·(cum_i − i·x̄) = n·cum_i − i·S needs
    * no division, so the argmax is bit-identical in both engines; the
    * before/after means only get fixed-pointed (×100 integer division)
    * at output. Ties on |dev| break to the EARLIEST day.
    *
    * Scale shape: the raw stream collapses map-side to (type, day)
    * counts, so the per-type ordered window runs over day cardinality
    * (bounded by calendar span, never by event volume), types fan out
    * across partitions. The final day of each series has dev = 0 by
    * construction and can only win the argmax in a constant series,
    * where the earliest-day tie-break elects day 1 — mean_after then
    * covers n−1 days, so the division is always defined for n ≥ 2;
    * single-day types report mean_after_fp = −1.
    * Output (event_type, cp_day_ms, dev_abs, mean_before_fp,
    * mean_after_fp). */
  def cusumChangepoint(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events
      .select(col("event_type"), expr("ts_ms div 86400000").as("d"))
      .groupBy("event_type", "d").agg(count(lit(1)).as("x"))
    val wOrd = Window.partitionBy("event_type").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("event_type")
    val scanned = daily
      .withColumn("cum", sum("x").over(wOrd))
      .withColumn("i", count(lit(1)).over(wOrd))
      .withColumn("s", sum("x").over(wAll))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("dev", abs(col("n") * col("cum") - col("i") * col("s")))
    val wPick = Window.partitionBy("event_type")
      .orderBy(col("dev").desc, col("d"))
    scanned
      .withColumn("rk", row_number().over(wPick))
      .filter(col("rk") === 1)
      .select(col("event_type"),
        (col("d") * 86400000L).as("cp_day_ms"),
        col("dev").as("dev_abs"),
        expr("(100 * cum) div i").as("mean_before_fp"),
        coalesce(expr("CASE WHEN n > i THEN (100 * (s - cum)) div (n - i) END"),
          lit(-1L)).as("mean_after_fp"))
      .orderBy("event_type")
  }

  val cusumChangepointOracle: String =
    """WITH daily AS (
      |  SELECT event_type, epoch_ms(ts) // 86400000 AS d, count(*) AS x
      |  FROM events GROUP BY 1, 2),
      |sc AS (
      |  SELECT event_type, d, x,
      |         CAST(sum(x) OVER (PARTITION BY event_type ORDER BY d
      |                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
      |         CAST(count(*) OVER (PARTITION BY event_type ORDER BY d
      |                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS i,
      |         CAST(sum(x) OVER (PARTITION BY event_type) AS BIGINT) AS s,
      |         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
      |  FROM daily),
      |dv AS (SELECT *, abs(n * cum - i * s) AS dev FROM sc),
      |pk AS (SELECT *, row_number() OVER (PARTITION BY event_type
      |                                    ORDER BY dev DESC, d) AS rk FROM dv)
      |SELECT event_type, d * 86400000 AS cp_day_ms, dev AS dev_abs,
      |       (100 * cum) // i AS mean_before_fp,
      |       coalesce(CASE WHEN n > i THEN (100 * (s - cum)) // (n - i) END, -1)
      |         AS mean_after_fp
      |FROM pk WHERE rk = 1 ORDER BY event_type""".stripMargin
}
