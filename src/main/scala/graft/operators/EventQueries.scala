package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Oracle-checked event-stream queries (#24-26). */
object EventQueries {

  private def ev(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")

  private val probeTimes = Seq("2024-01-10 00:00:00", "2024-01-20 00:00:00",
    "2024-01-28 00:00:00")

  def eventsWindowedAgg(spark: SparkSession, dir: String): DataFrame =
    Events.windowedAgg(ev(spark, dir))

  def eventsSlidingAgg(spark: SparkSession, dir: String): DataFrame =
    Events.slidingAgg(ev(spark, dir))

  def eventsSessionize(spark: SparkSession, dir: String): DataFrame =
    Events.sessionize(ev(spark, dir))

  def asofJoinQuery(spark: SparkSession, dir: String): DataFrame = {
    val e = ev(spark, dir)
    val probes = e.select(col("user_id")).distinct()
      .select(col("user_id"),
        explode(array(probeTimes.map(t => lit(t).cast("timestamp")): _*))
          .as("probe_ts"))
    Events.asofJoin(e, probes, "user_id", "ts", "probe_ts",
      Seq("event_id", "event_type", "value"), "event_id")
  }

  /** Semi-structured extraction: the `props` JSON payload column is
    * parsed inline (`get_json_object` stays codegen'd — no UDF, no
    * shuffle) and aggregated; null-safe for rows whose JSON lacks
    * the key. The engine-side counterpart of the reference's
    * pyspark_function per-column transforms for JSON columns.
    */
  def eventsJsonExtract(spark: SparkSession, dir: String): DataFrame =
    ev(spark, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n_with_k"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))

  /** Batch interval join: every (purchase, prior click within 2h)
    * pair per user — the attribution-window shape. Same operator
    * contract as the streaming interval join (StreamingSpec asserts
    * stream == batch on this very shape).
    */
  def eventsIntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = ev(spark, dir).select("event_id", "ts", "user_id", "event_type")
    Events.intervalJoin(
      e.filter(col("event_type") === "purchase"),
      e.filter(col("event_type") === "click"),
      "user_id", "ts", "ts", "2 hours")
      .select(col("l_user_id").as("user_id"),
        col("l_event_id").as("purchase_id"),
        col("r_event_id").as("click_id"))
  }

  /** Ordered view→click→purchase funnel over the events table. */
  def eventsFunnel(spark: SparkSession, dir: String): DataFrame =
    Events.funnel(ev(spark, dir), Seq("view", "click", "purchase"))

  /** The funnel under a 24-hour conversion window. */
  def eventsFunnelWindowed(spark: SparkSession, dir: String): DataFrame =
    Events.funnelWindowed(ev(spark, dir), Seq("view", "click", "purchase"),
      within = "24 hours")

  /** Weekly cohort retention over the events table. */
  def eventsRetention(spark: SparkSession, dir: String): DataFrame =
    Events.retention(ev(spark, dir))

  /** Event-type transition matrix over the events table. */
  def eventsTransitions(spark: SparkSession, dir: String): DataFrame =
    Events.transitions(ev(spark, dir))

  /** Hourly rate-spike detection per event type (3× trailing-24h
    * mean, ≥6 observed trailing hours).
    */
  def eventsAnomaly(spark: SparkSession, dir: String): DataFrame =
    Events.rateAnomaly(ev(spark, dir))

  /** Exact DAU / trailing-7-day WAU / stickiness per observed day. */
  def eventsActive(spark: SparkSession, dir: String): DataFrame =
    Events.activeUsers(ev(spark, dir))

  /** HLL-sketch companion of [[eventsActive]] (rows-only: estimates).
    */
  def eventsActiveSketch(spark: SparkSession, dir: String): DataFrame =
    Events.activeUsersSketch(ev(spark, dir))

  /** Top 20 three-step entry paths across users. */
  def eventsPaths(spark: SparkSession, dir: String): DataFrame =
    Events.entryPaths(ev(spark, dir))

  /** Last-touch attribution of purchases to the preceding channel. */
  def eventsAttribution(spark: SparkSession, dir: String): DataFrame =
    Events.lastTouchAttribution(ev(spark, dir))

  /** The 6-hour-lookback sibling: staler touches fall to 'direct'. */
  def eventsAttributionWindowed(spark: SparkSession, dir: String): DataFrame =
    Events.lastTouchAttributionWindowed(ev(spark, dir))

  /** RFM quintile segmentation, anchored after the corpus window. */
  def eventsRfm(spark: SparkSession, dir: String): DataFrame =
    Events.rfm(ev(spark, dir), anchor = "2024-02-01")

  /** [[eventsRfm]]'s sketch-boundary scale path. The oracle's
    * exactness precondition is SUB-CAPACITY KLL (boundaries = exact
    * order statistics), so sketchK is derived from the ACTUAL key
    * count rather than assumed — a testdata regeneration that grows
    * the user population can never silently turn the boundaries
    * into estimates and spuriously red the gate. One countDistinct
    * pass; at true scale a caller uses the operator's fixed-k
    * default and a rows-only check instead.
    */
  def eventsRfmSketch(spark: SparkSession, dir: String): DataFrame = {
    val events = ev(spark, dir)
    val nKeys = events.select(col("user_id")).distinct().count()
    require(nKeys < Int.MaxValue / 2, "rfm sketch oracle: key count overflow")
    Events.rfmSketch(events, anchor = "2024-02-01",
      sketchK = math.max(512, nKeys.toInt + 1))
  }

  /** Burst debounce at a 1-day chain gap (the synthetic stream is
    * sparse per (user, type); production telemetry uses seconds).
    */
  def eventsDedupWindow(spark: SparkSession, dir: String): DataFrame =
    Events.debounce(ev(spark, dir), gapSec = 86400L)

  /** Top-decile purchase-value concentration (Pareto profile). */
  def eventsValuePareto(spark: SparkSession, dir: String): DataFrame =
    Events.valueConcentration(ev(spark, dir), topPct = 10)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_windowed_agg" -> (eventsWindowedAgg _),
    "events_sliding_agg" -> (eventsSlidingAgg _),
    "events_sessionize" -> (eventsSessionize _),
    "events_json_extract" -> (eventsJsonExtract _),
    "events_interval_join" -> (eventsIntervalJoin _),
    "events_funnel" -> (eventsFunnel _),
    "events_funnel_windowed" -> (eventsFunnelWindowed _),
    "events_retention" -> (eventsRetention _),
    "events_transitions" -> (eventsTransitions _),
    "events_anomaly" -> (eventsAnomaly _),
    "events_paths" -> (eventsPaths _),
    "events_attribution" -> (eventsAttribution _),
    "events_attribution_windowed" -> (eventsAttributionWindowed _),
    "events_rfm" -> (eventsRfm _),
    "events_rfm_sketch" -> (eventsRfmSketch _),
    "events_dedup_window" -> (eventsDedupWindow _),
    "events_value_pareto" -> (eventsValuePareto _),
    "events_active" -> (eventsActive _),
    "events_active_sketch" -> (eventsActiveSketch _),
    "asof_join" -> (asofJoinQuery _))

  val oracleSql: Map[String, String] = Map(
    // chain semantics: lag -> new-burst flag -> running burst id ->
    // leader by (ts, event_id); integer-exact microsecond gaps
    // exact-integer cutoff, exact decimal sums, one share division
    "events_value_pareto" ->
      """WITH pu AS (
        |  SELECT user_id, SUM(CAST(value AS DECIMAL(18,2))) AS v
        |  FROM events WHERE event_type = 'purchase'
        |  GROUP BY user_id),
        |r AS (
        |  SELECT v,
        |    CAST(ROW_NUMBER() OVER (ORDER BY v DESC, user_id ASC) AS BIGINT) AS rn,
        |    CAST(COUNT(*) OVER () AS BIGINT) AS n
        |  FROM pu),
        |k AS (SELECT v, n, rn <= (n * 10 + 99) // 100 AS keep FROM r)
        |SELECT MAX(n) AS n_users,
        |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS top_users,
        |  CAST(SUM(CASE WHEN keep THEN v END) AS DOUBLE) AS top_value,
        |  CAST(SUM(v) AS DOUBLE) AS total_value,
        |  CAST(SUM(CASE WHEN keep THEN v END) AS DOUBLE)
        |    / CAST(SUM(v) AS DOUBLE) AS value_share
        |FROM k""".stripMargin,
    "events_dedup_window" ->
      """WITH x AS (
        |  SELECT user_id, event_type, ts, event_id, value,
        |    LAG(ts) OVER (PARTITION BY user_id, event_type
        |      ORDER BY ts, event_id) AS prev
        |  FROM events),
        |b AS (
        |  SELECT *, CASE WHEN prev IS NULL
        |      OR epoch_us(ts) - epoch_us(prev) > CAST(86400 AS BIGINT) * 1000000
        |    THEN 1 ELSE 0 END AS nb
        |  FROM x),
        |c AS (
        |  SELECT *, SUM(nb) OVER (PARTITION BY user_id, event_type
        |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS seq
        |  FROM b),
        |r AS (
        |  SELECT user_id, event_type, ts, event_id, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type, seq
        |      ORDER BY ts, event_id) AS rn,
        |    CAST(COUNT(*) OVER (PARTITION BY user_id, event_type, seq) AS BIGINT)
        |      AS burst_size
        |  FROM c)
        |SELECT user_id, event_type, ts, event_id, value, burst_size
        |FROM r WHERE rn = 1""".stripMargin,
    "events_funnel" ->
      """WITH t0 AS (
        |  SELECT user_id, min(ts) AS t FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |t1 AS (
        |  SELECT e.user_id, min(e.ts) AS t FROM events e
        |  JOIN t0 ON e.user_id = t0.user_id AND e.ts > t0.t
        |  WHERE e.event_type = 'click' GROUP BY 1),
        |t2 AS (
        |  SELECT e.user_id, min(e.ts) AS t FROM events e
        |  JOIN t1 ON e.user_id = t1.user_id AND e.ts > t1.t
        |  WHERE e.event_type = 'purchase' GROUP BY 1)
        |SELECT CAST(1 AS INT) AS step, 'view' AS event_type,
        |  (SELECT count(*) FROM t0) AS n_users
        |UNION ALL SELECT CAST(2 AS INT), 'click', (SELECT count(*) FROM t1)
        |UNION ALL SELECT CAST(3 AS INT), 'purchase', (SELECT count(*) FROM t2)""".stripMargin,
    "events_funnel_windowed" ->
      """WITH t0 AS (
        |  SELECT user_id, min(ts) AS t FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |t1 AS (
        |  SELECT e.user_id, t0.t AS t_first, min(e.ts) AS t FROM events e
        |  JOIN t0 ON e.user_id = t0.user_id AND e.ts > t0.t
        |    AND e.ts <= t0.t + INTERVAL 24 HOURS
        |  WHERE e.event_type = 'click' GROUP BY 1, 2),
        |t2 AS (
        |  SELECT e.user_id, min(e.ts) AS t FROM events e
        |  JOIN t1 ON e.user_id = t1.user_id AND e.ts > t1.t
        |    AND e.ts <= t1.t_first + INTERVAL 24 HOURS
        |  WHERE e.event_type = 'purchase' GROUP BY 1)
        |SELECT CAST(1 AS INT) AS step, 'view' AS event_type,
        |  (SELECT count(*) FROM t0) AS n_users
        |UNION ALL SELECT CAST(2 AS INT), 'click', (SELECT count(*) FROM t1)
        |UNION ALL SELECT CAST(3 AS INT), 'purchase', (SELECT count(*) FROM t2)""".stripMargin,
    "events_retention" ->
      """WITH uw AS (
        |  SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events),
        |fs AS (
        |  SELECT user_id, min(week) AS cohort_week FROM uw GROUP BY 1)
        |SELECT fs.cohort_week,
        |  CAST(date_diff('day', CAST(fs.cohort_week AS DATE),
        |    CAST(uw.week AS DATE)) // 7 AS INT) AS week_number,
        |  count(*) AS n_active
        |FROM uw JOIN fs USING (user_id)
        |GROUP BY 1, 2""".stripMargin,
    // WAU materializes each distinct (user, day) pair into the <=7
    // trailing windows it serves — the explode runs over the
    // |users|x|days| frame, never events; anchors outside the
    // observed-day set drop via the dau join
    "events_active" ->
      """WITH pairs AS (
        |  SELECT DISTINCT user_id AS k, CAST(ts AS DATE) AS day FROM events),
        |dau AS (
        |  SELECT day, CAST(count(*) AS BIGINT) AS dau
        |  FROM pairs GROUP BY day),
        |served AS (
        |  SELECT p.k, p.day + CAST(t.o AS INT) AS day
        |  FROM pairs p, UNNEST(range(0, 7)) AS t(o)),
        |wau AS (
        |  SELECT s.day, CAST(count(DISTINCT s.k) AS BIGINT) AS wau
        |  FROM served s JOIN dau d ON s.day = d.day
        |  GROUP BY s.day)
        |SELECT d.day, d.dau, w.wau,
        |  CAST(d.dau AS DOUBLE) / CAST(w.wau AS DOUBLE) AS stickiness
        |FROM dau d JOIN wau w USING (day)""".stripMargin,
    // the touch column nulls out conversions and null-ts rows,
    // last_value IGNORE NULLS carries the latest channel forward
    // over (ts, event_id) — a unique ordering, so ROWS == Spark's
    // RANGE default frame; DuckDB's ASC default is NULLS LAST,
    // matching the Spark side's pinned asc_nulls_last; money sums
    // in exact DECIMAL(18,2), surfaced as DOUBLE
    "events_attribution" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_id, event_type, value,
        |    CASE WHEN event_type = 'purchase' OR ts IS NULL THEN NULL
        |         ELSE event_type END AS touch
        |  FROM events),
        |lt AS (
        |  SELECT event_type, value,
        |    last_value(touch IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS touch
        |  FROM e),
        |per AS (
        |  SELECT COALESCE(touch, 'direct') AS channel,
        |    CAST(COUNT(*) AS BIGINT) AS n_conversions,
        |    SUM(CAST(value AS DECIMAL(18,2))) AS v
        |  FROM lt WHERE event_type = 'purchase' GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n_conversions) AS BIGINT) AS t FROM per)
        |SELECT channel, n_conversions,
        |  CAST(v AS DOUBLE) AS attributed_value,
        |  CAST(n_conversions AS DOUBLE) / CAST(t AS DOUBLE)
        |    AS conversion_share
        |FROM per CROSS JOIN tot""".stripMargin,
    // the lookback sibling: the touch timestamp rides a second
    // IGNORE NULLS last_value nulling on the same rows, so channel
    // and timestamp always describe the same touch; stale -> direct
    "events_attribution_windowed" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_id, event_type, value,
        |    CASE WHEN event_type = 'purchase' OR ts IS NULL THEN NULL
        |         ELSE event_type END AS touch,
        |    CASE WHEN event_type = 'purchase' OR ts IS NULL THEN NULL
        |         ELSE epoch_us(ts) END AS tus
        |  FROM events),
        |lt AS (
        |  SELECT ts, event_type, value,
        |    last_value(touch IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS touch,
        |    last_value(tus IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tus
        |  FROM e),
        |per AS (
        |  SELECT CASE WHEN touch IS NOT NULL
        |      AND epoch_us(ts) - tus <= CAST(21600 AS BIGINT) * 1000000
        |      THEN touch ELSE 'direct' END AS channel,
        |    CAST(COUNT(*) AS BIGINT) AS n_conversions,
        |    SUM(CAST(value AS DECIMAL(18,2))) AS v
        |  FROM lt WHERE event_type = 'purchase' GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n_conversions) AS BIGINT) AS t FROM per)
        |SELECT channel, n_conversions,
        |  CAST(v AS DOUBLE) AS attributed_value,
        |  CAST(n_conversions AS DOUBLE) / CAST(t AS DOUBLE)
        |    AS conversion_share
        |FROM per CROSS JOIN tot""".stripMargin,
    "events_paths" ->
      """WITH r AS (
        |  SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts ASC, event_id ASC) AS rn
        |  FROM events),
        |p AS (
        |  SELECT user_id,
        |    string_agg(event_type, '>' ORDER BY rn) AS path
        |  FROM r WHERE rn <= 3 GROUP BY user_id)
        |SELECT path, CAST(count(*) AS BIGINT) AS n_keys
        |FROM p GROUP BY path
        |ORDER BY n_keys DESC, path ASC
        |LIMIT 20""".stripMargin,
    // monetary sums DECIMAL(18,2) on both engines (a double sum is
    // partition-order dependent) and EMITS as DOUBLE — a raw
    // DECIMAL output hashes differently across engines even when
    // values are row-identical (the r12/r13 driver red), and
    // cent-sums are exactly double-representable; every ntile order
    // carries the key tiebreak so quintile edges cannot float
    "events_rfm" ->
      """WITH per AS (
        |  SELECT user_id, max(ts) AS last_ts,
        |    CAST(count(*) AS BIGINT) AS frequency,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(28,2))
        |      AS monetary
        |  FROM events GROUP BY user_id),
        |d AS (
        |  SELECT *, CAST(date_diff('day', CAST(last_ts AS DATE),
        |    DATE '2024-02-01') AS INT) AS recency_days
        |  FROM per)
        |SELECT user_id, last_ts, recency_days, frequency,
        |  CAST(monetary AS DOUBLE) AS monetary,
        |  CAST(ntile(5) OVER (ORDER BY recency_days ASC, user_id ASC) AS INT)
        |    AS r_score,
        |  CAST(ntile(5) OVER (ORDER BY frequency DESC, user_id ASC) AS INT)
        |    AS f_score,
        |  CAST(ntile(5) OVER (ORDER BY monetary DESC, user_id ASC) AS INT)
        |    AS m_score,
        |  CAST(ntile(5) OVER (ORDER BY recency_days ASC, user_id ASC) * 100
        |    + ntile(5) OVER (ORDER BY frequency DESC, user_id ASC) * 10
        |    + ntile(5) OVER (ORDER BY monetary DESC, user_id ASC) AS INT)
        |    AS rfm
        |FROM d""".stripMargin,
    // sketch-boundary RFM: sub-capacity KLL == exact order
    // statistics, so the boundaries replay as ascending-list ranks
    // at GREATEST(1, ceil(q*n)) (the kllQuantiles rule, same IEEE
    // double multiply) and scores bin by value comparison
    "events_rfm_sketch" ->
      """WITH per AS (
        |  SELECT user_id, max(ts) AS last_ts,
        |    CAST(count(*) AS BIGINT) AS frequency,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(28,2))
        |      AS monetary
        |  FROM events GROUP BY user_id),
        |d AS (
        |  SELECT *, CAST(date_diff('day', CAST(last_ts AS DATE),
        |    DATE '2024-02-01') AS INT) AS recency_days
        |  FROM per),
        |b AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    list(CAST(recency_days AS DOUBLE)
        |      ORDER BY CAST(recency_days AS DOUBLE)) AS lr,
        |    list(CAST(frequency AS DOUBLE)
        |      ORDER BY CAST(frequency AS DOUBLE)) AS lf,
        |    list(CAST(monetary AS DOUBLE)
        |      ORDER BY CAST(monetary AS DOUBLE)) AS lm
        |  FROM d),
        |q AS (
        |  SELECT
        |    lr[GREATEST(1, CAST(ceil(0.2 * n) AS BIGINT))] AS r1,
        |    lr[GREATEST(1, CAST(ceil(0.4 * n) AS BIGINT))] AS r2,
        |    lr[GREATEST(1, CAST(ceil(0.6 * n) AS BIGINT))] AS r3,
        |    lr[GREATEST(1, CAST(ceil(0.8 * n) AS BIGINT))] AS r4,
        |    lf[GREATEST(1, CAST(ceil(0.2 * n) AS BIGINT))] AS f1,
        |    lf[GREATEST(1, CAST(ceil(0.4 * n) AS BIGINT))] AS f2,
        |    lf[GREATEST(1, CAST(ceil(0.6 * n) AS BIGINT))] AS f3,
        |    lf[GREATEST(1, CAST(ceil(0.8 * n) AS BIGINT))] AS f4,
        |    lm[GREATEST(1, CAST(ceil(0.2 * n) AS BIGINT))] AS m1,
        |    lm[GREATEST(1, CAST(ceil(0.4 * n) AS BIGINT))] AS m2,
        |    lm[GREATEST(1, CAST(ceil(0.6 * n) AS BIGINT))] AS m3,
        |    lm[GREATEST(1, CAST(ceil(0.8 * n) AS BIGINT))] AS m4
        |  FROM b),
        |s AS (
        |  SELECT d.*,
        |    1 + CAST(CAST(recency_days AS DOUBLE) > q.r1 AS INT)
        |      + CAST(CAST(recency_days AS DOUBLE) > q.r2 AS INT)
        |      + CAST(CAST(recency_days AS DOUBLE) > q.r3 AS INT)
        |      + CAST(CAST(recency_days AS DOUBLE) > q.r4 AS INT) AS r_score,
        |    1 + CAST(CAST(frequency AS DOUBLE) <= q.f4 AS INT)
        |      + CAST(CAST(frequency AS DOUBLE) <= q.f3 AS INT)
        |      + CAST(CAST(frequency AS DOUBLE) <= q.f2 AS INT)
        |      + CAST(CAST(frequency AS DOUBLE) <= q.f1 AS INT) AS f_score,
        |    1 + CAST(CAST(monetary AS DOUBLE) <= q.m4 AS INT)
        |      + CAST(CAST(monetary AS DOUBLE) <= q.m3 AS INT)
        |      + CAST(CAST(monetary AS DOUBLE) <= q.m2 AS INT)
        |      + CAST(CAST(monetary AS DOUBLE) <= q.m1 AS INT) AS m_score
        |  FROM d, q)
        |SELECT user_id, last_ts, recency_days, frequency,
        |  CAST(monetary AS DOUBLE) AS monetary,
        |  CAST(r_score AS INT) AS r_score, CAST(f_score AS INT) AS f_score,
        |  CAST(m_score AS INT) AS m_score,
        |  CAST(r_score * 100 + f_score * 10 + m_score AS INT) AS rfm
        |FROM s""".stripMargin,
    // integer cross-product spike test (n·trail_hours > 3·trail_sum):
    // the flag never touches floating point; the ratio divides two
    // exact longs as doubles once — same IEEE op on both engines
    "events_anomaly" ->
      """WITH h AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour,
        |    CAST(count(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY 1, 2),
        |t AS (
        |  SELECT *,
        |    SUM(n_events) OVER w AS trail_sum,
        |    CAST(COUNT(n_events) OVER w AS BIGINT) AS trail_hours
        |  FROM h
        |  WINDOW w AS (PARTITION BY event_type ORDER BY hour ASC
        |    ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, hour, n_events,
        |  CAST(trail_sum AS BIGINT) AS trail_sum, trail_hours,
        |  CASE WHEN trail_hours >= 6 THEN
        |    CAST(n_events * trail_hours AS DOUBLE) / CAST(trail_sum AS DOUBLE)
        |  END AS rate_ratio,
        |  CASE WHEN trail_hours >= 6 THEN
        |    n_events * trail_hours > 3 * trail_sum
        |  END AS is_spike
        |FROM t""".stripMargin,
    "events_transitions" ->
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev_type
        |  FROM events),
        |m AS (
        |  SELECT prev_type AS from_type, event_type AS to_type,
        |    count(*) AS n_transitions
        |  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n_transitions,
        |  CAST(n_transitions AS DOUBLE) /
        |    CAST(sum(n_transitions) OVER (PARTITION BY from_type) AS DOUBLE)
        |    AS p_transition
        |FROM m""".stripMargin,
    "events_json_extract" ->
      """SELECT event_type,
        |  CAST(COUNT(k) AS BIGINT) AS n_with_k,
        |  CAST(SUM(k) AS BIGINT) AS sum_k,
        |  CAST(MIN(k) AS BIGINT) AS min_k,
        |  CAST(MAX(k) AS BIGINT) AS max_k
        |FROM (
        |  SELECT event_type,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |  FROM events)
        |GROUP BY event_type""".stripMargin,
    "events_windowed_agg" ->
      """SELECT
        |  make_timestamp((epoch_us(ts) // 21600000000) * 21600000000) AS window_start,
        |  make_timestamp(((epoch_us(ts) // 21600000000) + 1) * 21600000000) AS window_end,
        |  event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY 1, 2, 3""".stripMargin,
    "events_sliding_agg" ->
      """SELECT
        |  make_timestamp(start_us) AS window_start,
        |  make_timestamp(start_us + 21600000000) AS window_end,
        |  event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM (
        |  SELECT e.*, (epoch_us(ts) // 10800000000) * 10800000000 - s.off AS start_us
        |  FROM events e
        |  CROSS JOIN (VALUES (CAST(0 AS BIGINT)), (CAST(10800000000 AS BIGINT))) s(off))
        |GROUP BY 1, 2, 3""".stripMargin,
    "events_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR date_diff('microsecond', lag(ts) OVER w, ts) > 1800000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT *, SUM(new_session) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS session_seq
        |  FROM g)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        |  COUNT(*) AS n_events,
        |  CAST(min(ts) AS TIMESTAMP) AS session_start,
        |  CAST(max(ts) AS TIMESTAMP) AS session_end,
        |  date_diff('microsecond', CAST(min(ts) AS TIMESTAMP), CAST(max(ts) AS TIMESTAMP)) / 1000000.0 AS duration_sec,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
        |FROM s GROUP BY user_id, session_seq""".stripMargin,
    "events_interval_join" ->
      """SELECT p.user_id AS user_id, p.event_id AS purchase_id,
        |  c.event_id AS click_id
        |FROM events p
        |JOIN events c ON c.user_id = p.user_id
        |  AND p.event_type = 'purchase' AND c.event_type = 'click'
        |  AND CAST(c.ts AS TIMESTAMP) >=
        |      CAST(p.ts AS TIMESTAMP) - INTERVAL 2 HOUR
        |  AND CAST(c.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)""".stripMargin,
    "asof_join" ->
      """WITH probes AS (
        |  SELECT DISTINCT user_id, probe_ts
        |  FROM events CROSS JOIN (VALUES
        |    (TIMESTAMP '2024-01-10 00:00:00'),
        |    (TIMESTAMP '2024-01-20 00:00:00'),
        |    (TIMESTAMP '2024-01-28 00:00:00')) AS v(probe_ts)),
        |ranked AS (
        |  SELECT p.user_id, p.probe_ts, e.event_id, e.event_type, e.value,
        |    ROW_NUMBER() OVER (
        |      PARTITION BY p.user_id, p.probe_ts
        |      ORDER BY CAST(e.ts AS TIMESTAMP) DESC, e.event_id DESC) AS rn
        |  FROM probes p
        |  JOIN events e ON e.user_id = p.user_id
        |    AND CAST(e.ts AS TIMESTAMP) <= p.probe_ts)
        |SELECT user_id, probe_ts, event_id, event_type, value
        |FROM ranked WHERE rn = 1""".stripMargin)
}
