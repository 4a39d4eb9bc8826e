package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Event-stream operators (SURVEY.md §2 #24-26): tumbling-window
  * aggregation, gap sessionization, and as-of join.
  *
  * All three are expressed with windows + unions over built-in
  * functions: one hash shuffle on the key (user_id) each, partial
  * aggregation preserved, no custom physical nodes needed. The same
  * plans run unchanged under Structured Streaming (see
  * graft.streaming) because they avoid non-streamable constructs.
  */
object Events {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** #24 Tumbling-window aggregation (batch shape of the streaming
    * windowed agg — identical results on the same input).
    */
  def windowedAgg(events: DataFrame, windowLen: String = "6 hours"): DataFrame =
    events.groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(dec(col("value"))).cast("double").as("total_value"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Sliding-window aggregation: length `windowLen`, sliding every
    * `slide` — each event lands in len/slide windows (Spark expands
    * rows inside codegen before the one aggregate shuffle; no
    * self-join). Same shape as the streaming sliding agg.
    */
  def slidingAgg(events: DataFrame, windowLen: String = "6 hours",
                 slide: String = "3 hours"): DataFrame =
    events.groupBy(window(col("ts"), windowLen, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(dec(col("value"))).cast("double").as("total_value"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))

  /** #25 Gap-based sessionization: a new session starts when the gap
    * to the previous event exceeds `gapSec`. lag -> cumsum gives the
    * session sequence without any iterative processing; one shuffle
    * on user_id shared by both window functions and the final
    * aggregate.
    */
  def sessionize(events: DataFrame, gapSec: Long = 1800L): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("_prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("_new_session",
        when(col("_prev_us").isNull ||
          unix_micros(col("ts")) - col("_prev_us") > gapSec * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("_new_session")).over(run))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        ((unix_micros(max(col("ts"))) - unix_micros(min(col("ts")))) / 1000000.0)
          .as("duration_sec"),
        sum(dec(col("value"))).cast("double").as("session_value"))
  }

  /** Value concentration (Pareto profile): what share of total
    * purchase value comes from the top `topPct`% of users — the
    * whale-concentration number every monetization/abuse review
    * starts from. The cutoff is exact-integer
    * (`rank <= ceil(n·topPct/100)` computed as `(n·topPct+99)/100`
    * in longs), value sums are exact decimals, and the single share
    * division is one IEEE op — fully oracle-exact.
    *
    * The ranking window is unpartitioned but runs over the PER-USER
    * aggregate, bounded by user cardinality, not event volume (the
    * dq_outliers family contract; at extreme user counts rank via
    * the distinct-value cumulative shape or sketch quantiles
    * instead).
    *
    * Output: one row (n_users, top_users, top_value, total_value,
    * value_share).
    */
  def valueConcentration(events: DataFrame, topPct: Int = 10): DataFrame = {
    require(topPct >= 1 && topPct <= 100, "topPct must be in [1, 100]")
    val perUser = events.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(sum(dec(col("value"))).as("_v"))
    val w = Window.orderBy(col("_v").desc, col("user_id").asc)
    val n = Window.partitionBy()
    perUser
      .withColumn("_rn", row_number().over(w).cast("long"))
      .withColumn("_n", count(lit(1)).over(n))
      // `div` keeps the ceil in integer arithmetic (Column `/` on
      // longs is double division, only ceil-equivalent below 2^53)
      .withColumn("_keep",
        col("_rn") <= expr(s"(_n * $topPct + 99) div 100"))
      .agg(
        max(col("_n")).as("n_users"),
        sum(when(col("_keep"), 1L).otherwise(0L)).as("top_users"),
        sum(when(col("_keep"), col("_v"))).cast("double").as("top_value"),
        sum(col("_v")).cast("double").as("total_value"),
        (sum(when(col("_keep"), col("_v"))).cast("double") /
          sum(col("_v")).cast("double")).as("value_share"))
  }

  /** Burst debounce: keep only the FIRST event of each per-(user,
    * type) burst — consecutive same-type events within `gapSec` of
    * the previous one collapse into their leader. The telemetry
    * dedup every event pipeline runs before counting anything
    * (double-clicks, retry storms, at-least-once producer repeats);
    * the batch twin of streaming's
    * `dropDuplicatesWithinWatermark`-style suppression, with CHAIN
    * semantics (each kept event re-anchors the window, so a burst
    * longer than the gap still collapses to one leader — the
    * [[sessionize]] lag→cumsum fold, not a fixed bucket).
    *
    * One shuffle on (user, type); both windows and the leader filter
    * share it. Output: the surviving event rows plus `burst_size`
    * (how many raw events the leader absorbed — audit column, exact).
    */
  def debounce(events: DataFrame, gapSec: Long = 60L): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("_prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("_new_burst",
        when(col("_prev_us").isNull ||
          unix_micros(col("ts")) - col("_prev_us") > gapSec * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("_burst_seq", sum(col("_new_burst")).over(run))
      .groupBy(col("user_id"), col("event_type"), col("_burst_seq"))
      .agg(min(struct(col("ts"), col("event_id"), col("value"))).as("_lead"),
        count(lit(1)).as("burst_size"))
      .select(col("user_id"), col("event_type"),
        col("_lead.ts").as("ts"), col("_lead.event_id").as("event_id"),
        col("_lead.value").as("value"), col("burst_size"))
  }

  /** #26b Interval (range) join, batch twin of
    * StreamingIngest.intervalJoin (same column-prefix contract so the
    * two can't drift): each left row pairs with same-key right rows
    * whose event time falls in [left ts - lookback, left ts]. The
    * equi-key keeps it ONE hash shuffle per side — the range
    * predicate rides the sort-merge join as a residual, no cartesian,
    * no per-row re-scan; at 100 TB the cost is the key shuffle plus
    * in-partition pair emission bounded by the lookback width.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
                   leftTsCol: String, rightTsCol: String,
                   lookback: String): DataFrame = {
    val l = left.columns.foldLeft(left)((d, c) => d.withColumnRenamed(c, s"l_$c"))
    val r = right.columns.foldLeft(right)((d, c) => d.withColumnRenamed(c, s"r_$c"))
    l.join(r,
      col(s"l_$keyCol") === col(s"r_$keyCol") &&
        col(s"r_$rightTsCol") >= col(s"l_$leftTsCol") - expr(s"INTERVAL $lookback") &&
        col(s"r_$rightTsCol") <= col(s"l_$leftTsCol"))
  }

  /** #26 As-of join via union + window (the shuffle-once shape): tag
    * probe rows, union with events, and for each probe take the last
    * event at-or-before it with `last(..., ignoreNulls)` over
    * (ts, is_probe, tiebreak). No range-join explosion, no
    * per-probe scan — one shuffle on the key for any number of
    * probes. Probes with no prior event are dropped (inner-join
    * semantics).
    */
  /** Ordered funnel analysis: how many users reach each step of
    * `steps` IN ORDER (step k's event strictly after the user's
    * step-(k-1) time; step times are the earliest qualifying event —
    * the standard "first-touch" funnel).
    *
    * Spark-first shape: a cascade of conditional whole-partition
    * window minima over ONE hash exchange on the key — window k's
    * input references window (k-1)'s output column, and because
    * every Window partitions identically Catalyst plans them as
    * chained Window nodes over a single shuffle (no self-joins, no
    * per-step passes over the fact table). The per-user reduction
    * and the final global count are partial-aggregated, so shuffle
    * bytes scale with |users|, not |events| — the property that
    * matters at 100 TB.
    *
    * Output: (step, event_type, n_users), step 1-based, one row per
    * funnel step.
    */
  def funnel(events: DataFrame, steps: Seq[String],
             keyCol: String = "user_id", tsCol: String = "ts",
             typeCol: String = "event_type"): DataFrame =
    funnelBounded(events, steps, keyCol, tsCol, typeCol, _ => lit(true))

  /** [[funnel]] with a CONVERSION WINDOW: later steps only count
    * within `within` (e.g. "24 hours") of the user's step-1 time —
    * the product-analytics default, where an unbounded funnel
    * overcounts conversions that were really new journeys. Same
    * one-exchange chained-window plan; the bound is one more
    * predicate inside each step's conditional minimum.
    */
  def funnelWindowed(events: DataFrame, steps: Seq[String],
                     within: String, keyCol: String = "user_id",
                     tsCol: String = "ts",
                     typeCol: String = "event_type"): DataFrame =
    funnelBounded(events, steps, keyCol, tsCol, typeCol,
      i => if (i == 0) lit(true)
        else col(tsCol) <= col("_t0") + expr(s"INTERVAL $within"))

  private def funnelBounded(events: DataFrame, steps: Seq[String],
                            keyCol: String, tsCol: String,
                            typeCol: String,
                            bound: Int => Column): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val w = Window.partitionBy(col(keyCol))
    val withSteps = steps.zipWithIndex.foldLeft(events) { case (df, (et, i)) =>
      val qualifies =
        if (i == 0) col(typeCol) === et
        else col(typeCol) === et && col(tsCol) > col(s"_t${i - 1}") &&
          bound(i)
      df.withColumn(s"_t$i", min(when(qualifies, col(tsCol))).over(w))
    }
    // every row of a user carries identical _t* values: reduce to one
    // row per user (max = the value), then count reached users per step
    val perUser = withSteps.groupBy(col(keyCol))
      .agg(max(col("_t0")).as("_t0"),
        steps.indices.drop(1).map(i => max(col(s"_t$i")).as(s"_t$i")): _*)
    val counts = perUser.agg(
      sum(when(col("_t0").isNotNull, 1L).otherwise(0L)).as("_n0"),
      steps.indices.drop(1).map(i =>
        sum(when(col(s"_t$i").isNotNull, 1L).otherwise(0L)).as(s"_n$i")): _*)
    counts.select(explode(array(steps.zipWithIndex.map { case (et, i) =>
        struct(lit(i + 1).as("step"), lit(et).as("event_type"),
          col(s"_n$i").as("n_users"))
      }: _*)).as("s"))
      .select(col("s.step"), col("s.event_type"), col("s.n_users"))
  }

  /** Weekly cohort retention: users grouped by the week of their
    * first event (`cohort_week`), counted per subsequent active week
    * (`week_number` = weeks since cohort entry, 0 = the entry week).
    *
    * Both sides pre-aggregate BEFORE any wide exchange: the activity
    * side reduces events to distinct (user, week) pairs and the
    * cohort side to one min-week row per user (map-side partial
    * aggregation), so the join and final aggregate shuffle rows
    * proportional to |users|×|active weeks| — never |events|.
    *
    * Output: (cohort_week, week_number, n_active).
    */
  def retention(events: DataFrame, keyCol: String = "user_id",
                tsCol: String = "ts"): DataFrame = {
    val weeks = events
      .select(col(keyCol), date_trunc("week", col(tsCol)).as("week"))
      .distinct()
    val cohort = weeks.groupBy(col(keyCol))
      .agg(min(col("week")).as("cohort_week"))
    weeks.join(cohort, keyCol)
      // date, not timestamp: a week bucket has no time-of-day — and
      // engines disagree on week-trunc return types, so the portable
      // contract is DATE
      .groupBy(to_date(col("cohort_week")).as("cohort_week"),
        (datediff(col("week"), col("cohort_week")) / 7).cast("int")
          .as("week_number"))
      .agg(count(lit(1)).as("n_active"))
  }

  /** Event transition matrix — the path-analysis primitive: per key,
    * order events by (ts, id) (the id tiebreak makes simultaneous
    * events deterministic — engines would otherwise disagree on lag
    * order), pair each event with its predecessor's type, and count
    * (from_type, to_type) globally, with the row-conditional
    * probability alongside.
    *
    * Shape: ONE hash exchange on the key for the lag window (the
    * same per-key sort sessionize pays), then a partial-agg count to
    * a |types|²-sized matrix; the probability window runs over that
    * tiny matrix, never the fact table. `n / total` divides two
    * exact longs as doubles — bit-identical across engines.
    *
    * Output: (from_type, to_type, n_transitions, p_transition).
    */
  def transitions(events: DataFrame, keyCol: String = "user_id",
                  tsCol: String = "ts", typeCol: String = "event_type",
                  idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    val matrix = events
      .withColumn("_prev", lag(col(typeCol), 1).over(w))
      .filter(col("_prev").isNotNull)
      .groupBy(col("_prev").as("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
    val wTot = Window.partitionBy(col("from_type"))
    matrix.withColumn("p_transition",
      col("n_transitions").cast("double") /
        sum(col("n_transitions")).over(wTot).cast("double"))
  }

  /** Rate-spike detection per event type: hourly counts vs the mean
    * of the type's trailing `trailHours` OBSERVED hourly buckets
    * (hours with zero events don't emit rows, so a sparse type's
    * trail is its last active hours — the operating-metric
    * convention; calendar-gap semantics would need a generated hour
    * spine). An hour is a spike when its count exceeds `factor` ×
    * the trailing mean, evaluated as the INTEGER cross-product
    * `n·trail_hours > factor·trail_sum` — no floating point in the
    * decision, so the flag is bit-stable across engines; the
    * reported ratio divides two exact longs as doubles once.
    *
    * Scale shape: one corpus shuffle to (type, hour) counts with
    * map-side partial aggregation — the window then runs over the
    * |types|×|hours| matrix, never the fact table. Rows with fewer
    * than `minTrail` observed trailing hours report null ratio/flag
    * (cold start).
    *
    * Output: (event_type, hour, n_events, trail_sum, trail_hours,
    * rate_ratio, is_spike).
    */
  def rateAnomaly(events: DataFrame, typeCol: String = "event_type",
                  tsCol: String = "ts", trailHours: Int = 24,
                  minTrail: Int = 6, factor: Int = 3): DataFrame =
    rateAnomalyFromHourly(hourlyCounts(events, typeCol, tsCol),
      trailHours, minTrail, factor)

  /** The fact-table pass of [[rateAnomaly]]: (event_type, hour,
    * n_events) with map-side partial aggregation. Also the shape a
    * STREAMING count table maintains (a stateful windowed agg keyed
    * on the same columns), which [[rateAnomalyFromHourly]] then
    * scores without ever re-reading events — StreamingSpec proves
    * that composition equals the batch operator.
    */
  def hourlyCounts(events: DataFrame, typeCol: String = "event_type",
                   tsCol: String = "ts"): DataFrame =
    events
      .groupBy(col(typeCol).as("event_type"),
        date_trunc("hour", col(tsCol)).as("hour"))
      .agg(count(lit(1)).as("n_events"))

  /** The matrix pass of [[rateAnomaly]] — runs over any
    * (event_type, hour, n_events) frame, |types|×|hours| sized.
    */
  def rateAnomalyFromHourly(hourly: DataFrame, trailHours: Int = 24,
                            minTrail: Int = 6, factor: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour").asc)
      .rowsBetween(-trailHours, -1)
    val enough = col("trail_hours") >= minTrail
    hourly
      .withColumn("trail_sum", sum(col("n_events")).over(w))
      .withColumn("trail_hours", count(col("n_events")).over(w))
      .withColumn("rate_ratio", when(enough,
        (col("n_events") * col("trail_hours")).cast("double") /
          col("trail_sum").cast("double")))
      .withColumn("is_spike", when(enough,
        col("n_events") * col("trail_hours") > col("trail_sum") * factor))
  }

  /** Top entry paths: each key's first `steps` event types in
    * (ts, id) order joined with '>' — the "how do users start"
    * path-analysis companion of [[transitions]] (which loses
    * ordering beyond pairs) and [[funnel]] (which fixes the path in
    * advance). One hash exchange on the key for the rank window
    * (WindowGroupLimit keeps only `steps` rows per key per partition
    * before it), then the per-key path assembles from ≤ steps rows
    * and the count lands on |distinct paths| groups. `orderBy.limit`
    * is a TakeOrderedAndProject.
    *
    * Output: (path, n_keys, k) — top k paths by key count,
    * deterministic (count desc, path asc).
    */
  /** LAST-TOUCH conversion attribution: credit each conversion to
    * the nearest PRECEDING non-conversion event of the same user —
    * the standard product/marketing attribution rollup ("which
    * channel gets the purchase"). Per attributed channel:
    * conversions, exactly-summed attributed value (DECIMAL(18,2)
    * sums — the events family's money-math contract — surfaced as
    * DOUBLE), and the conversion share.
    *
    * One window over (key, ts, id) — the sessionize exchange shape;
    * `last(_, ignoreNulls)` carries the latest touch forward, so a
    * conversion with no preceding touch lands in 'direct'.
    * Conversion rows, null-typed rows, and null-ts rows are not
    * touches (an event with no timestamp cannot claim recency), and
    * the ordering is pinned NULLS LAST so both engines place any
    * null-ts conversion at the same end of its partition. The
    * per-channel rollup is |channels|-sized; the share total
    * attaches through the constant-key broadcast.
    */
  def lastTouchAttribution(events: DataFrame, keyCol: String = "user_id",
                           tsCol: String = "ts", typeCol: String = "event_type",
                           idCol: String = "event_id",
                           valueCol: String = "value",
                           conversionType: String = "purchase"): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc_nulls_last, col(idCol).asc)
    val touch = when(col(typeCol) === conversionType ||
      col(tsCol).isNull, lit(null).cast("string")).otherwise(col(typeCol))
    attributionRollup(events
      .withColumn("_touch", last(touch, ignoreNulls = true).over(w))
      .filter(col(typeCol) === conversionType)
      .withColumn("channel", coalesce(col("_touch"), lit("direct"))),
      valueCol)
  }

  /** [[lastTouchAttribution]] under a LOOKBACK WINDOW: a touch gets
    * credit only if it happened within `withinSec` of the
    * conversion — staler touches fall to 'direct'. The
    * [[funnel]]/[[funnelWindowed]] symmetry applied to attribution
    * (an hours-old page view should not claim tonight's purchase).
    * The touch timestamp rides a second ignore-nulls `last` that
    * nulls on exactly the same rows as the channel column, so both
    * always describe the same touch event; null-ts rows are not
    * touches. Same plan shape as the unwindowed form — one window,
    * one tiny rollup.
    */
  def lastTouchAttributionWindowed(events: DataFrame,
                                   keyCol: String = "user_id",
                                   tsCol: String = "ts",
                                   typeCol: String = "event_type",
                                   idCol: String = "event_id",
                                   valueCol: String = "value",
                                   conversionType: String = "purchase",
                                   withinSec: Long = 21600L): DataFrame = {
    require(withinSec > 0, "withinSec must be positive")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc_nulls_last, col(idCol).asc)
    val touch = when(col(typeCol) === conversionType ||
      col(tsCol).isNull, lit(null).cast("string")).otherwise(col(typeCol))
    val touchUs = when(touch.isNotNull, unix_micros(col(tsCol)))
    attributionRollup(events
      .withColumn("_touch", last(touch, ignoreNulls = true).over(w))
      .withColumn("_tus", last(touchUs, ignoreNulls = true).over(w))
      .filter(col(typeCol) === conversionType)
      .withColumn("channel",
        when(col("_touch").isNotNull &&
          unix_micros(col(tsCol)) - col("_tus") <= withinSec * 1000000L,
          col("_touch")).otherwise(lit("direct"))),
      valueCol)
  }

  /** The shared attribution tail: per-channel conversions, exact
    * DECIMAL(18,2) value sums surfaced as DOUBLE, and the share via
    * the constant-key broadcast total — one implementation so the
    * windowed and unwindowed forms cannot drift.
    */
  private def attributionRollup(conv: DataFrame,
                                valueCol: String): DataFrame = {
    val per = graft.Materialize.eager(conv
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_conversions"),
        sum(col(valueCol).cast("decimal(18,2)")).as("_v")))
    val tot = per.agg(sum(col("n_conversions")).as("_t"),
        count(lit(1)).as("_nc"))
      .withColumn("_k", pmod(col("_nc"), lit(1)).cast("int")).drop("_nc")
    per.withColumn("_k", pmod(col("n_conversions"), lit(1)).cast("int"))
      .join(broadcast(tot), Seq("_k"))
      .select(col("channel"), col("n_conversions"),
        col("_v").cast("double").as("attributed_value"),
        (col("n_conversions").cast("double") / col("_t").cast("double"))
          .as("conversion_share"))
  }

  def entryPaths(events: DataFrame, keyCol: String = "user_id",
                 tsCol: String = "ts", typeCol: String = "event_type",
                 idCol: String = "event_id", steps: Int = 3,
                 k: Int = 20): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    events
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= steps)
      .groupBy(col(keyCol))
      .agg(array_join(transform(array_sort(
          collect_list(struct(col("_rn"), col(typeCol).as("t")))),
          s => s.getField("t")), ">").as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_keys"))
      .orderBy(col("n_keys").desc, col("path").asc)
      .limit(k)
  }

  /** Rolling active users — DAU, trailing-7-day WAU, and the
    * DAU/WAU stickiness ratio per calendar day. Both counts are
    * EXACT: the corpus collapses to distinct (key, day) pairs first
    * (one shuffle with partial agg — days are coarse, so this frame
    * is tiny), DAU is a per-day count, and WAU materializes each
    * pair into the ≤7 trailing windows it serves (a 7-way explode of
    * the |keys|×|days| frame, NOT the fact table) and counts
    * distinct keys per window day. Only days present in the data
    * report (observed-day semantics, like [[rateAnomaly]]).
    * Stickiness divides two exact longs as doubles once.
    *
    * At extreme key cardinality the distinct-pair frame is the cost;
    * the mergeable-sketch companion (per-day `hll_sketch_agg`,
    * trailing `hll_union_agg`) trades exactness for a registers-only
    * shuffle — the same trade the DQ profile documents.
    *
    * Output: (day, dau, wau, stickiness).
    */
  def activeUsers(events: DataFrame, keyCol: String = "user_id",
                  tsCol: String = "ts", windowDays: Int = 7): DataFrame =
    activeUsersFromPairs(
      events.select(col(keyCol).as("_k"), to_date(col(tsCol)).as("day"))
        .distinct(),
      windowDays)

  /** The scoring pass of [[activeUsers]] over a (_k, day) DISTINCT
    * pair frame — also the shape a streaming sink maintains as a
    * keyed merge table (keys = (_k, day), idempotent under replay),
    * which this pass then scores without re-reading events;
    * StreamingSpec proves that composition equals the batch operator.
    */
  def activeUsersFromPairs(pairs: DataFrame,
                           windowDays: Int = 7): DataFrame = {
    val dau = pairs.groupBy(col("day"))
      .agg(count(lit(1)).as("dau"))
    // pair (k, d) serves windows anchored at d .. d+6; anchors not in
    // the observed-day set are dropped by the semi join below
    val served = pairs.select(col("_k"),
        explode(sequence(lit(0), lit(windowDays - 1))).as("_off"),
        col("day"))
      .select(col("_k"), date_add(col("day"), col("_off")).as("day"))
    val wau = served
      .join(dau.select(col("day")), Seq("day"), "left_semi")
      .groupBy(col("day"))
      .agg(count_distinct(col("_k")).as("wau"))
    dau.join(wau, Seq("day"))
      .withColumn("stickiness",
        col("dau").cast("double") / col("wau").cast("double"))
  }

  /** Mergeable-sketch companion of [[activeUsers]] — the 100 TB
    * shape at extreme key cardinality: one Datasketches HLL per day
    * (registers-only shuffle, never the key space), then a trailing
    * CALENDAR-day range window unions the sketches and estimates
    * WAU. `rangeBetween` over `unix_date` keeps window semantics
    * identical to the exact operator across observed-day gaps.
    * Estimates are deterministic for a given input set (register
    * maxima — no RNG, order-free) but are estimates: the query
    * entry is rows-only, the error bound is spec-pinned vs exact.
    * The unpartitioned window runs over the |days| frame.
    *
    * Output: (day, dau, wau_est, stickiness_est).
    */
  def activeUsersSketch(events: DataFrame, keyCol: String = "user_id",
                        tsCol: String = "ts", windowDays: Int = 7,
                        lgConfigK: Int = 12): DataFrame = {
    val daily = events
      .groupBy(to_date(col(tsCol)).as("day"))
      .agg(count_distinct(col(keyCol)).as("dau"),
        hll_sketch_agg(col(keyCol), lit(lgConfigK)).as("_sk"))
    val w = Window.orderBy(unix_date(col("day")))
      .rangeBetween(-(windowDays - 1), 0)
    daily
      .withColumn("wau_est",
        hll_sketch_estimate(hll_union_agg(col("_sk"), lit(false)).over(w)))
      .select(col("day"), col("dau"), col("wau_est"),
        (col("dau").cast("double") / col("wau_est").cast("double"))
          .as("stickiness_est"))
  }

  /** RFM scoring — recency / frequency / monetary quintiles per key,
    * the classic engagement segmentation. One key-grouped aggregate
    * collapses the fact table to |keys| rows (recency = whole days
    * from the LAST event to the caller's anchor — an explicit
    * timestamp, because "now" is not reproducible; monetary sums
    * DECIMAL(18,2), exact under any partition order where a double
    * sum is not); the three ntile(5) windows then run over the
    * per-key frame, each with a (metric, key) total order so ties
    * cannot float between engines. Cardinality bound: the
    * unpartitioned ntile sorts the |keys| frame in one task — fine
    * to tens of millions of keys; at billions, derive the quintile
    * boundaries from [[graft.dq.DataQuality.sketchPercentiles]]
    * over the same aggregate and bin with a codegen'd comparison.
    *
    * Output: (key, last_ts, recency_days, frequency, monetary
    * [double], r_score, f_score, m_score, rfm) — rank-style scores,
    * LOWER = better (1 = most recent / most events / highest spend),
    * rfm = r·100 + f·10 + m (111 = best segment).
    */
  def rfm(events: DataFrame, anchor: String,
          keyCol: String = "user_id", tsCol: String = "ts",
          valueCol: String = "value"): DataFrame = {
    val per = rfmAggregate(events, anchor, keyCol, tsCol, valueCol)
    def quintile(order: Seq[Column]) =
      ntile(5).over(Window.orderBy(order: _*))
    per
      .withColumn("r_score",
        quintile(Seq(col("recency_days").asc, col(keyCol).asc)))
      .withColumn("f_score",
        quintile(Seq(col("frequency").desc, col(keyCol).asc)))
      .withColumn("m_score",
        quintile(Seq(col("monetary").desc, col(keyCol).asc)))
      .withColumn("rfm",
        col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
      // positional contract: the driver hashes columns in schema order,
      // so the output order is part of the operator's interface.
      // monetary SUMS as DECIMAL(18,2) (exact under any partition
      // order) but EMITS as double: a raw DECIMAL output column
      // hashes differently across engines even when values are
      // row-identical, and cent-sums at any realistic magnitude are
      // exactly representable in a double
      .select(col(keyCol), col("last_ts"), col("recency_days"),
        col("frequency"), col("monetary").cast("double").as("monetary"),
        col("r_score"), col("f_score"), col("m_score"), col("rfm"))
  }

  /** The shared per-key collapse of [[rfm]]/[[rfmSketch]]: one
    * key-grouped aggregate reduces the fact table to |keys| rows of
    * (key, last_ts, frequency, monetary, recency_days).
    */
  private def rfmAggregate(events: DataFrame, anchor: String,
                           keyCol: String, tsCol: String,
                           valueCol: String): DataFrame =
    events.groupBy(col(keyCol))
      .agg(max(col(tsCol)).as("last_ts"),
        count(lit(1)).as("frequency"),
        sum(dec(col(valueCol))).as("monetary"))
      .withColumn("recency_days",
        datediff(lit(anchor).cast("date"), col("last_ts").cast("date")))

  /** [[rfm]]'s sketch-boundary scale path — the billions-of-keys
    * form the exact operator's scaladoc names. The exact ntile(5)
    * sorts the whole |keys| frame in ONE task; here the quintile
    * BOUNDARIES come instead from one KLL sketch pass over the
    * per-key aggregate (partial-aggregable — O(k·log n) buffers
    * shuffle, never keys) and each key is then binned by a codegen'd
    * comparison against the four broadcast boundary values per
    * metric. No global sort at any cardinality.
    *
    * Semantics vs [[rfm]]: scores bin by VALUE, so equal metric
    * values always share a score (ntile splits ties arbitrarily by
    * the key tiebreak to force equal-size tiles) and tile sizes are
    * only approximately n/5 under heavy ties; boundary values are
    * rank estimates within the KLL bound once n exceeds sketch
    * capacity. On sub-capacity tie-free frames with 5 | n the two
    * operators agree exactly (spec-pinned: the sketch stores every
    * value, its ceil(q·n) rank rule picks the ntile tile edges, and
    * distinct values make rank-binning == value-binning).
    *
    * Output: identical shape and column order to [[rfm]].
    */
  def rfmSketch(events: DataFrame, anchor: String,
                keyCol: String = "user_id", tsCol: String = "ts",
                valueCol: String = "value", sketchK: Int = 512): DataFrame = {
    import graft.functions.Kll
    // materialized once: the frame feeds the boundary sketch pass AND
    // the scoring join — unmaterialized, the fact-table aggregate
    // would run twice
    val per = rfmAggregate(events, anchor, keyCol, tsCol, valueCol)
      .transform(graft.Materialize.eager)
    val qs = Seq(0.2, 0.4, 0.6, 0.8)
    // constant-key equi-join for the one-row boundary frame: a bare
    // crossJoin plans BroadcastNestedLoopJoin and trips the blanket
    // all-pairs alarm PlanSpec keeps strict (the q15TopSupplier
    // note); a non-foldable zero key on both sides keeps it a
    // BroadcastHashJoin
    val bounds = per.agg(
        Kll.kllSketch(col("recency_days").cast("double"), sketchK).as("_sr"),
        Kll.kllSketch(col("frequency").cast("double"), sketchK).as("_sf"),
        Kll.kllSketch(col("monetary").cast("double"), sketchK).as("_sm"))
      .select(Kll.kllQuantiles(col("_sr"), qs).as("_qr"),
        Kll.kllQuantiles(col("_sf"), qs).as("_qf"),
        Kll.kllQuantiles(col("_sm"), qs).as("_qm"))
      .withColumn("_k",
        pmod(coalesce(col("_qr").getItem(0), lit(0.0)) * lit(0), lit(1))
          .cast("int"))
    // lower = better, as in rfm: recency bins ascending (small
    // recency → 1), frequency/monetary descending (large → 1)
    def asc(v: Column, q: Column): Column =
      lit(1) + (v > q.getItem(0)).cast("int") + (v > q.getItem(1)).cast("int") +
        (v > q.getItem(2)).cast("int") + (v > q.getItem(3)).cast("int")
    def desc(v: Column, q: Column): Column =
      lit(1) + (v <= q.getItem(3)).cast("int") + (v <= q.getItem(2)).cast("int") +
        (v <= q.getItem(1)).cast("int") + (v <= q.getItem(0)).cast("int")
    per.withColumn("_k", pmod(col("frequency"), lit(1)).cast("int"))
      .join(broadcast(bounds), Seq("_k"))
      .withColumn("r_score", asc(col("recency_days").cast("double"), col("_qr")))
      .withColumn("f_score", desc(col("frequency").cast("double"), col("_qf")))
      .withColumn("m_score", desc(col("monetary").cast("double"), col("_qm")))
      .withColumn("rfm",
        col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
      // same double-typed monetary output contract as [[rfm]]
      .select(col(keyCol), col("last_ts"), col("recency_days"),
        col("frequency"), col("monetary").cast("double").as("monetary"),
        col("r_score"), col("f_score"), col("m_score"), col("rfm"))
  }

  def asofJoin(events: DataFrame, probes: DataFrame,
               keyCol: String, tsCol: String, probeTsCol: String,
               payloadCols: Seq[String], tiebreakCol: String): DataFrame = {
    val evSide = events.select(
      col(keyCol),
      col(tsCol).as("_t"),
      lit(0).as("_is_probe"),
      col(tiebreakCol).as("_tb"),
      struct(payloadCols.map(col): _*).as("_payload"),
      lit(null).cast(events.schema(tsCol).dataType).as(probeTsCol))
    val prSide = probes.select(
      col(keyCol),
      col(probeTsCol).as("_t"),
      lit(1).as("_is_probe"),
      lit(null).cast(events.schema(tiebreakCol).dataType).as("_tb"),
      lit(null).cast(evSide.schema("_payload").dataType).as("_payload"),
      col(probeTsCol))
    // events sort before probes at equal ts => "at-or-before" includes
    // the equal-timestamp event; tiebreak makes equal-ts events ordered
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("_t").asc, col("_is_probe").asc, col("_tb").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    evSide.unionByName(prSide)
      .withColumn("_last", last(when(col("_is_probe") === 0, col("_payload")),
        ignoreNulls = true).over(w))
      .filter(col("_is_probe") === 1 && col("_last").isNotNull)
      .select(col(keyCol) +: col(probeTsCol) +:
        payloadCols.map(c => col(s"_last.$c").as(c)): _*)
  }
}
