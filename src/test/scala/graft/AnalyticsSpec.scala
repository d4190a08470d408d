package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.Events

/** Pins the x53-x55 analytics operators: pivot columns, funnel stage
  * ordering, cohort arithmetic. */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(ms: Long) = new Timestamp(ms)
  private val H = 3600000L

  test("hourlyPivot: one column per event type, absent combos are 0") {
    val evs = Seq(
      (1L, ts(H), 7L, "view", 1.0, "{}"),
      (2L, ts(H), 7L, "view", 1.0, "{}"),
      (3L, ts(H), 8L, "click", 1.0, "{}"),
      (4L, ts(2 * H), 9L, "purchase", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Events.hourlyPivot(evs)
    assert(out.columns.toSeq === "hour" +: Events.EventTypes)
    val byHour = out.collect().map(r => r.getString(0) -> r).toMap
    val h1 = byHour("1970-01-01 01:00:00")
    assert(h1.getLong(h1.fieldIndex("view")) === 2L)
    assert(h1.getLong(h1.fieldIndex("click")) === 1L)
    assert(h1.getLong(h1.fieldIndex("purchase")) === 0L, "absent combo → 0")
    val h2 = byHour("1970-01-01 02:00:00")
    assert(h2.getLong(h2.fieldIndex("purchase")) === 1L)
  }

  test("sessionFunnel: stages require strict min-time ordering within one session") {
    val evs = Seq(
      // user 1, one session: view < click < purchase → all stages
      (1L, ts(1000L), 1L, "view", 0.0, "{}"),
      (2L, ts(2000L), 1L, "click", 0.0, "{}"),
      (3L, ts(3000L), 1L, "purchase", 0.0, "{}"),
      // user 2: click BEFORE view → stops at stage view
      (4L, ts(1000L), 2L, "click", 0.0, "{}"),
      (5L, ts(2000L), 2L, "view", 0.0, "{}"),
      // user 3: view+click ok, purchase in a LATER session (gap) → view_click only
      (6L, ts(1000L), 3L, "view", 0.0, "{}"),
      (7L, ts(2000L), 3L, "click", 0.0, "{}"),
      (8L, ts(2000L + Events.SessionGapMs + 1), 3L, "purchase", 0.0, "{}"),
      // user 4: no view at all
      (9L, ts(1000L), 4L, "error", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Events.sessionFunnel(evs).as[(String, Long)].collect().toMap
    assert(out("1_sessions") === 5L, "user 3's purchase opens its own session")
    assert(out("2_view") === 3L)
    assert(out("3_view_click") === 2L, "user 2's click precedes its view")
    assert(out("4_view_click_purchase") === 1L)
  }

  test("userSetOps: intersect and except over distinct per-type user sets") {
    val evs = Seq(
      (1L, ts(1000L), 1L, "signup", 0.0, "{}"),
      (2L, ts(2000L), 1L, "purchase", 0.0, "{}"),   // signup ∩ buy
      (3L, ts(1000L), 2L, "purchase", 0.0, "{}"),
      (4L, ts(2000L), 2L, "error", 0.0, "{}"),      // buyer with error
      (5L, ts(1000L), 3L, "purchase", 0.0, "{}"),   // clean buyer, no signup
      (6L, ts(2000L), 3L, "purchase", 0.0, "{}"),   // duplicate membership
      (7L, ts(1000L), 4L, "signup", 0.0, "{}")      // signup only
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Events.userSetOps(evs).as[(String, Long)].collect().toSet
    assert(out === Set(
      ("signup_and_buy", 1L),
      ("buy_no_error", 1L), ("buy_no_error", 3L)))
  }

  test("hourlySliding: each event lands in exactly 4 overlapping windows") {
    val evs = Seq((1L, ts(50 * 60 * 1000L), 7L, "view", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Events.hourlySliding(evs)
      .select("window_start", "n_events", "value_cents")
      .as[(Long, Long, Long)].collect().toSet
    // window starts align to hop multiples (same as streaming
    // window()): ts at minute 50 → windows starting 45, 30, 15, 0
    val m = 60000L
    assert(out === Set((45 * m, 1L, 200L), (30 * m, 1L, 200L),
      (15 * m, 1L, 200L), (0L, 1L, 200L)))
  }

  test("normalizedValues: z-scores from exact sums; degenerate groups are null") {
    val evs = Seq(
      (1L, ts(1000L), 1L, "view", 1.0, "{}"),   // cents 100
      (2L, ts(2000L), 2L, "view", 3.0, "{}"),   // cents 300
      (3L, ts(3000L), 3L, "click", 5.0, "{}")   // singleton group
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Events.normalizedValues(evs)
      .select("event_id", "z").as[(Long, Option[Double])].collect().toMap
    // mean 200, var = (100²+300²)/2 − 200² = 10000, σ = 100
    assert(out(1L) === Some(-1.0))
    assert(out(2L) === Some(1.0))
    assert(out(3L) === None, "zero-variance singleton reports null")
  }

  test("cohortRetention: offsets measured from each user's first day, users distinct") {
    val D = 86400000L
    val evs = Seq(
      (1L, ts(0L), 1L, "view", 0.0, "{}"),          // u1 cohort day 0
      (2L, ts(1000L), 1L, "view", 0.0, "{}"),       // same day — distinct once
      (3L, ts(2 * D), 1L, "view", 0.0, "{}"),       // u1 returns day 2
      (4L, ts(D), 2L, "view", 0.0, "{}"),           // u2 cohort day 1
      (5L, ts(2 * D), 2L, "view", 0.0, "{}")        // u2 returns day 1 (offset 1)
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Events.cohortRetention(evs)
      .as[(Long, Long, Long)].collect().toSet
    assert(out === Set((0L, 0L, 1L), (0L, 2L, 1L), (1L, 0L, 1L), (1L, 1L, 1L)))
  }
}
