package graft

import java.sql.Timestamp

import graft.streaming.EventStream

/** Pins x154 — the built-in `session_window` aggregate — including the
  * exact-gap boundary where it differs from the custom x24 operator. */
class NativeSessionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(ms: Long) = new Timestamp(ms)
  private val Gap = 30 * 60 * 1000L

  test("x154 batch semantics: a pause of exactly the gap still MERGES") {
    // u1: 0 and gap-1ms → merge; u2: 0 and exactly gap → ALSO merges
    // (windows [0,gap) and [gap,2gap) are adjacent and Spark's merge
    // treats touching as overlapping) — the same `> gap` split rule as
    // the custom x24 operator, so the two operators agree everywhere
    val events = Seq(
      (1L, ts(0), 1L, "click", 1.0, "{}"),
      (2L, ts(Gap - 1), 1L, "click", 1.0, "{}"),
      (3L, ts(0), 2L, "click", 1.0, "{}"),
      (4L, ts(Gap), 2L, "click", 1.0, "{}"),
      (5L, ts(0), 3L, "click", 1.0, "{}"),
      (6L, ts(Gap + 1), 3L, "click", 1.0, "{}")   // > gap → splits
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventStream.nativeSessions(events)
      .select("user_id", "start_ms", "end_ms", "n_events")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out === Set(
      (1L, 0L, Gap - 1 + Gap, 2L),
      (2L, 0L, 2 * Gap, 2L),
      (3L, 0L, Gap, 1L),
      (3L, Gap + 1, 2 * Gap + 1, 1L)))
  }
}
