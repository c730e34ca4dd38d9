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
}
