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

  test("windowed funnel drops conversions outside the window; unbounded keeps them") {
    // u1 converts within 24h of the first view; u2's click lands 25h
    // after the first view (outside); u3's click is inside but the
    // purchase is outside the window ANCHORED AT THE FIRST VIEW
    val e = Seq(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 20:00:00"),
      (1L, "purchase", "2024-01-02 09:00:00"),
      (2L, "view", "2024-01-01 10:00:00"),
      (2L, "click", "2024-01-02 11:00:00"),
      (3L, "view", "2024-01-01 10:00:00"),
      (3L, "click", "2024-01-02 09:00:00"),
      (3L, "purchase", "2024-01-02 11:00:00"))
      .map { case (u, t, s) => (u, t, ts(s)) }
      .toDF("user_id", "event_type", "ts")
    val steps = Seq("view", "click", "purchase")
    val bounded = Events.funnelWindowed(e, steps, within = "24 hours")
      .orderBy("step").collect().map(r => (r.getInt(0), r.getLong(2)))
    assert(bounded.sameElements(Array((1, 3L), (2, 2L), (3, 1L))),
      bounded.toSeq.toString)
    val unbounded = Events.funnel(e, steps)
      .orderBy("step").collect().map(r => (r.getInt(0), r.getLong(2)))
    assert(unbounded.sameElements(Array((1, 3L), (2, 3L), (3, 2L))),
      unbounded.toSeq.toString)
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

  test("debounce collapses chains, re-anchoring each kept event") {
    // u1/click at 0s, 50s, 100s with gap 60: CHAIN semantics keep
    // only the 0s leader (each event is within 60s of its
    // predecessor) even though 100s is beyond 60s of the leader —
    // a fixed-bucket dedup would wrongly keep 100s. The 300s event
    // (200s after its predecessor) starts a new burst. u1/view
    // (other type) is untouched; same-ts ties break by event_id.
    val e = Seq(
      (1L, "click", 10L, "2024-01-01 10:00:00", 1.0),
      (1L, "click", 11L, "2024-01-01 10:00:50", 2.0),
      (1L, "click", 12L, "2024-01-01 10:01:40", 3.0),
      (1L, "click", 13L, "2024-01-01 10:05:00", 4.0),
      (1L, "view", 14L, "2024-01-01 10:00:30", 5.0),
      (2L, "click", 16L, "2024-01-01 10:00:00", 7.0),
      (2L, "click", 15L, "2024-01-01 10:00:00", 6.0))
      .map { case (u, t, id, s, v) => (u, t, id, ts(s), v) }
      .toDF("user_id", "event_type", "event_id", "ts", "value")
    val out = Events.debounce(e, gapSec = 60L)
      .orderBy("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getLong(r.fieldIndex("event_id")),
        r.getLong(r.fieldIndex("burst_size"))))
      .toSeq
    assert(out == Seq(
      (1L, "click", 10L, 3L),  // 0s leader absorbs 50s and 100s
      (1L, "click", 13L, 1L),  // 300s: new burst
      (1L, "view", 14L, 1L),
      (2L, "click", 15L, 2L)), // tie at same ts: lower event_id leads
      out.toString)
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

  test("entry paths take each key's first events in (ts, id) order") {
    // u1 and u2 share a>b>c; u3 has only two events (short path);
    // u4 has simultaneous first events ordered by the id tiebreak
    val e = Seq(
      (1L, 10L, "a", "2024-01-01 10:00:00"),
      (1L, 11L, "b", "2024-01-01 10:01:00"),
      (1L, 12L, "c", "2024-01-01 10:02:00"),
      (1L, 13L, "d", "2024-01-01 10:03:00"), // beyond steps, ignored
      (2L, 20L, "a", "2024-01-01 09:00:00"),
      (2L, 21L, "b", "2024-01-01 09:01:00"),
      (2L, 22L, "c", "2024-01-01 09:02:00"),
      (3L, 30L, "x", "2024-01-01 08:00:00"),
      (3L, 31L, "y", "2024-01-01 08:01:00"),
      (4L, 41L, "p", "2024-01-01 07:00:00"),
      (4L, 40L, "q", "2024-01-01 07:00:00"), // same ts: id 40 first
      (4L, 42L, "r", "2024-01-01 07:05:00"))
      .map { case (u, id, t, s) => (u, id, t, ts(s)) }
      .toDF("user_id", "event_id", "event_type", "ts")
    val out = Events.entryPaths(e, steps = 3, k = 10).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("a>b>c", 2L), ("q>p>r", 1L), ("x>y", 1L)),
      out.toString)
    // the rank filter plans as WindowGroupLimit: each partition
    // retains <= steps rows per key BEFORE the exchange
    val plan = Events.entryPaths(e, steps = 3, k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(1500))
  }

  test("active users: exact DAU/WAU across a day gap; sketch agrees within error") {
    // u1 active days 1,2,9; u2 active days 1,8; u3 active day 8.
    // observed days: 1, 2, 8, 9 (gap 3..7). Trailing-7-day windows:
    //   day1: {u1,u2}            dau=2 wau=2
    //   day2: {u1(1,2), u2(1)}   dau=1 wau=2
    //   day8: {u1(2: 8-6=2 yes), u2(8), u3(8)} -> wau={u1,u2,u3}=3, dau=2
    //   day9: {u1(9), u2(8), u3(8)} wau=3, dau=1
    val e = Seq(
      (1L, "2024-03-01 10:00:00"), (1L, "2024-03-01 11:00:00"),
      (1L, "2024-03-02 10:00:00"), (1L, "2024-03-09 10:00:00"),
      (2L, "2024-03-01 10:00:00"), (2L, "2024-03-08 10:00:00"),
      (3L, "2024-03-08 10:00:00"))
      .map { case (u, s) => (u, ts(s)) }
      .toDF("user_id", "ts")
    val out = Events.activeUsers(e).orderBy("day").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(
      ("2024-03-01", 2L, 2L),
      ("2024-03-02", 1L, 2L),
      ("2024-03-08", 2L, 3L),
      ("2024-03-09", 1L, 3L)), out.toString)
    // the sketch companion must use CALENDAR windows (the range
    // window over unix_date), so the day-8 window still reaches
    // day 2 across the gap; at this cardinality HLL is exact
    val sk = Events.activeUsersSketch(e).orderBy("day").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSeq
    assert(sk == out.map { case (d, dau, wau) => (d, dau, wau) },
      sk.toString)
    // corpus-scale: estimates within the documented HLL error of exact
    val exact = Events.activeUsers(Tables.load(spark, sf, "events"))
      .select("day", "wau").collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val est = Events.activeUsersSketch(Tables.load(spark, sf, "events"))
      .select("day", "wau_est").collect()
      .map(r => r.getDate(0).toString -> r.getLong(1))
    assert(est.nonEmpty && est.forall { case (d, v) =>
      math.abs(v - exact(d)) <= math.max(2.0, 0.05 * exact(d))
    }, "HLL estimate within 5% of exact")
  }

  test("rfm quintiles are deterministic and integer-anchored") {
    // 5 users with strictly ordered metrics so every quintile is
    // forced: user i has i events of value 10.00 each on day i
    val e = (1 to 5).flatMap { u =>
      (1 to u).map(i =>
        (u.toLong, ts(f"2024-01-0$u%d 10:$i%02d:00"), 10.0))
    }.toDF("user_id", "ts", "value")
    val out = Events.rfm(e, anchor = "2024-01-10")
      .orderBy("user_id").collect()
    val u5 = out(4)
    // rank-style scores: 1 = best (most recent / most events /
    // highest spend) — user 5 should be the 111 segment
    val got = out.map { r =>
      (r.getLong(r.fieldIndex("user_id")),
        r.getInt(r.fieldIndex("recency_days")),
        r.getLong(r.fieldIndex("frequency")),
        r.getInt(r.fieldIndex("r_score")),
        r.getInt(r.fieldIndex("f_score")),
        r.getInt(r.fieldIndex("m_score")),
        r.getInt(r.fieldIndex("rfm")))
    }.toSeq
    // recency_days: user u last event on day u -> 10 - u days.
    // r_score orders recency ASC (most recent first): u5 -> 1 ... u1 -> 5
    // f_score orders frequency DESC: u5 -> 1 ... u1 -> 5
    // m_score orders monetary DESC: same ordering
    assert(got == Seq(
      (1L, 9, 1L, 5, 5, 5, 555),
      (2L, 8, 2L, 4, 4, 4, 444),
      (3L, 7, 3L, 3, 3, 3, 333),
      (4L, 6, 4L, 2, 2, 2, 222),
      (5L, 5, 5L, 1, 1, 1, 111)), got.toString)
    // monetary SUMS as exact decimal, EMITS as double (the one raw
    // DECIMAL output column on the query surface was the r12/r13
    // driver-hash red): 5 * 10.00 = 50.00 exactly
    assert(u5.schema(u5.fieldIndex("monetary")).dataType ==
      org.apache.spark.sql.types.DoubleType)
    assert(u5.getDouble(u5.fieldIndex("monetary")) == 50.0)
  }

  test("rfmSketch equals exact rfm on a sub-capacity tie-free frame") {
    // 10 users, strictly ordered metrics, 5 | n: the KLL boundaries
    // are exact order statistics and value-binning == ntile ranks
    val e = (1 to 10).flatMap { u =>
      (1 to u).map(i =>
        (u.toLong, ts(f"2024-01-$u%02d 10:$i%02d:00"), u * 1.25))
    }.toDF("user_id", "ts", "value")
    val exact = Events.rfm(e, anchor = "2024-01-20")
      .orderBy("user_id").collect().map(_.toString).toSeq
    val sk = Events.rfmSketch(e, anchor = "2024-01-20")
      .orderBy("user_id").collect().map(_.toString).toSeq
    assert(sk == exact, s"sketch=$sk\nexact=$exact")
    // and the schemas (incl. column ORDER — the positional driver
    // contract) agree
    assert(Events.rfmSketch(e, anchor = "2024-01-20").columns.toSeq ==
      Events.rfm(e, anchor = "2024-01-20").columns.toSeq)
  }

  test("rfmSketch gives equal metric values equal scores (no tie split)") {
    // all 10 users identical -> every boundary equals the value,
    // every score must be the SAME (ntile would force tiles 1..5)
    val e = (1 to 10).map(u =>
      (u.toLong, ts("2024-01-05 10:00:00"), 10.0))
      .toDF("user_id", "ts", "value")
    val out = Events.rfmSketch(e, anchor = "2024-01-20").collect()
    assert(out.length == 10)
    val scores = out.map(r => (r.getInt(r.fieldIndex("r_score")),
      r.getInt(r.fieldIndex("f_score")),
      r.getInt(r.fieldIndex("m_score")))).distinct
    assert(scores.length == 1, s"tied metrics split scores: ${scores.toSeq}")
  }

  test("last-touch attribution credits the nearest preceding channel, direct when none") {
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    // user 1: view, click, purchase(5), purchase(7), signup, purchase(3)
    //   -> click x2 (12.00), signup x1 (3.00)
    // user 2: purchase(9) with no prior touch -> direct
    // user 3: null-typed event then purchase -> null types are not
    //   touches, lands in direct too
    val rows = Seq(
      (1L, t(1), 1L, "view", 0.0), (2L, t(2), 1L, "click", 0.0),
      (3L, t(3), 1L, "purchase", 5.0), (4L, t(4), 1L, "purchase", 7.0),
      (5L, t(5), 1L, "signup", 0.0), (6L, t(6), 1L, "purchase", 3.0),
      (7L, t(1), 2L, "purchase", 9.0),
      (8L, t(1), 3L, null.asInstanceOf[String], 0.0),
      (9L, t(2), 3L, "purchase", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Events.lastTouchAttribution(rows).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toMap
    assert(out.keySet == Set("click", "signup", "direct"), out.toString)
    assert(out("click") == ((2L, 12.0, 2.0 / 5.0)))
    assert(out("signup") == ((1L, 3.0, 1.0 / 5.0)))
    assert(out("direct") == ((2L, 10.0, 2.0 / 5.0)))
    // the LOOKBACK sibling: purchase@4 sits exactly 120s after its
    // click touch — the window is INCLUSIVE, so within=120 matches
    // the unwindowed rollup while within=90 pushes it to direct
    def windowed(sec: Long) = Events
      .lastTouchAttributionWindowed(rows, withinSec = sec).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toMap
    assert(windowed(120L) == out, "inclusive boundary must match")
    val tight = windowed(90L)
    assert(tight("click") == ((1L, 5.0, 1.0 / 5.0)))
    assert(tight("signup") == ((1L, 3.0, 1.0 / 5.0)))
    assert(tight("direct") == ((3L, 17.0, 3.0 / 5.0)), tight.toString)
  }

  test("attribution: null-ts events are not touches in either form") {
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    // user 1's only touch has a NULL timestamp: it must not claim
    // the purchase in the unwindowed OR windowed form (an event with
    // no timestamp cannot establish recency), and with the pinned
    // NULLS LAST ordering both engines would agree on its position
    val rows = Seq(
      (1L, null.asInstanceOf[Timestamp], 1L, "click", 0.0),
      (2L, t(2), 1L, "purchase", 4.0),
      (3L, t(1), 2L, "view", 0.0), (4L, t(2), 2L, "purchase", 6.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val plain = m(Events.lastTouchAttribution(rows))
    val win = m(Events.lastTouchAttributionWindowed(rows))
    val want = Map("direct" -> ((1L, 4.0)), "view" -> ((1L, 6.0)))
    assert(plain == want, plain.toString)
    assert(win == want, win.toString)
  }

}
