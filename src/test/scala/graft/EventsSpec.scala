package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Events

/** Hand-computed toy cases for the batch event-analytics operators
  * (the corpus-scale shapes are oracle-checked via EventQueries).
  */
class EventsSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("funnel counts users reaching each ordered step") {
    // u1 completes view->click->purchase in order; u2 clicks BEFORE
    // its first view (click must not count — order matters) and never
    // purchases; u3 views only; u4 has a purchase with no prior
    // click (purchase must not count)
    val e = Seq(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 10:05:00"),
      (1L, "purchase", "2024-01-01 10:10:00"),
      (2L, "click", "2024-01-01 09:00:00"),
      (2L, "view", "2024-01-01 09:30:00"),
      (3L, "view", "2024-01-01 08:00:00"),
      (4L, "view", "2024-01-01 07:00:00"),
      (4L, "purchase", "2024-01-01 07:30:00"))
      .map { case (u, t, s) => (u, t, ts(s)) }
      .toDF("user_id", "event_type", "ts")
    val out = Events.funnel(e, Seq("view", "click", "purchase"))
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(out.sameElements(Array(
      (1, "view", 4L), (2, "click", 1L), (3, "purchase", 1L))), out.toSeq)
  }

  test("transition matrix counts consecutive pairs per user with deterministic tiebreak") {
    // u1: view->click->view (two transitions); u2: view->view; u3 has
    // two SIMULTANEOUS events — the event_id tiebreak must order them
    // (3,"a") before (4,"b"), giving a->b, not b->a
    val e = Seq(
      (1L, 10L, "view", "2024-01-01 10:00:00"),
      (1L, 11L, "click", "2024-01-01 10:05:00"),
      (1L, 12L, "view", "2024-01-01 10:10:00"),
      (2L, 20L, "view", "2024-01-01 09:00:00"),
      (2L, 21L, "view", "2024-01-01 09:30:00"),
      (3L, 3L, "a", "2024-01-01 08:00:00"),
      (3L, 4L, "b", "2024-01-01 08:00:00"))
      .map { case (u, id, t, s) => (u, id, t, ts(s)) }
      .toDF("user_id", "event_id", "event_type", "ts")
    val out = Events.transitions(e)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sorted
    assert(out == Seq(
      ("a", "b", 1L, 1.0),
      ("click", "view", 1L, 1.0),
      ("view", "click", 1L, 0.5),
      ("view", "view", 1L, 0.5)), out)
  }

  test("funnel step times are strictly increasing (equal ts does not advance)") {
    val e = Seq(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 10:00:00")) // same instant: not after
      .map { case (u, t, s) => (u, t, ts(s)) }
      .toDF("user_id", "event_type", "ts")
    val out = Events.funnel(e, Seq("view", "click"))
      .orderBy("step").collect().map(_.getLong(2))
    assert(out.sameElements(Array(1L, 0L)), out.toSeq)
  }

  test("retention buckets users by first-seen week") {
    // u1 first seen week of Jan 1 (Mon), active again 2 weeks later;
    // u2 first seen week of Jan 8, active the next week; u3 one-shot
    val e = Seq(
      (1L, "2024-01-02 10:00:00"), // cohort 2024-01-01, week 0
      (1L, "2024-01-03 10:00:00"), // same week: one active row
      (1L, "2024-01-16 10:00:00"), // week 2
      (2L, "2024-01-09 10:00:00"), // cohort 2024-01-08, week 0
      (2L, "2024-01-15 10:00:00"), // week 1
      (3L, "2024-01-02 12:00:00")) // cohort 2024-01-01, week 0
      .map { case (u, s) => (u, "view", ts(s)) }
      .toDF("user_id", "event_type", "ts")
    val out = Events.retention(e)
      .orderBy("cohort_week", "week_number").collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2)))
    assert(out.sameElements(Array(
      ("2024-01-01", 0, 2L), ("2024-01-01", 2, 1L),
      ("2024-01-08", 0, 1L), ("2024-01-08", 1, 1L))), out.toSeq)
  }

  test("funnel plans one exchange: chained windows share the user partitioning") {
    val e = Seq((1L, "view", ts("2024-01-01 10:00:00")))
      .toDF("user_id", "event_type", "ts")
    val plan = Events.funnel(e, Seq("view", "click", "purchase"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).length
    // one hash exchange feeds all three Window nodes + the per-user
    // aggregate; the only other exchange is the final single-row agg
    assert(exchanges <= 1, s"funnel must not re-shuffle per step:\n$plan")
  }

  test("rate anomaly flags hours above factor x trailing mean, integer-exact") {
    // one type, 5 observed hours: counts 2,2,2,10,2. With a 3-hour
    // trail and minTrail=2: hour0 has no trail (null flag), hour1 has
    // 1 trailing hour (< minTrail, null), hour2 trail=(2,2) mean 2,
    // hour3 trail=(2,2,2) mean 2 -> 10 > 2*2 SPIKES, hour4
    // trail=(2,2,10) mean 14/3 -> 2 is not a spike
    val rows = (0 until 5).flatMap { h =>
      val n = if (h == 3) 10 else 2
      (0 until n).map(i => ("page", ts(f"2024-01-01 0$h%d:00:${i % 60}%02d")))
    }
    val out = Events.rateAnomaly(rows.toDF("event_type", "ts"),
        trailHours = 3, minTrail = 2, factor = 2)
      .orderBy("hour").collect()
    assert(out.length == 5)
    assert(out(0).isNullAt(out(0).fieldIndex("is_spike")) &&
      out(1).isNullAt(out(1).fieldIndex("is_spike")),
      "cold-start hours report null flag")
    val h3 = out(3)
    assert(h3.getLong(h3.fieldIndex("n_events")) == 10L &&
      h3.getLong(h3.fieldIndex("trail_sum")) == 6L &&
      h3.getLong(h3.fieldIndex("trail_hours")) == 3L &&
      h3.getBoolean(h3.fieldIndex("is_spike")), h3.toString)
    assert(h3.getDouble(h3.fieldIndex("rate_ratio")) == 5.0, "10*3/6")
    val h4 = out(4)
    assert(!h4.getBoolean(h4.fieldIndex("is_spike")) &&
      h4.getLong(h4.fieldIndex("trail_sum")) == 14L, h4.toString)
    // trailing window is per type: a second type's hours don't leak
    val mixed = rows ++ Seq(("other", ts("2024-01-01 03:00:00")))
    val o2 = Events.rateAnomaly(mixed.toDF("event_type", "ts"),
        trailHours = 3, minTrail = 2, factor = 2)
      .filter(col("event_type") === "page").orderBy("hour").collect()
    assert(o2.map(_.toString).sameElements(out.map(_.toString)),
      "per-type partition isolation")
  }
}
