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
