package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.functions.{CmsCell, CountMinSketch}
import graft.ops.Events

/** Pins the Count-Min-Sketch aggregator and the as-of carry-forward. */
class CmsAsofSpec extends SparkSpec {
  import spark.implicits._

  test("CMS cells sum to depth × token count; estimates upper-bound true counts") {
    val toks = Seq("a", "b", "a", "c", "a", "b").toDS()
    val cells = toks.select(CountMinSketch.toColumn).head()
    assert(cells.map(_.cnt).sum === CountMinSketch.Depth.toLong * 6)
    // CMS property: estimate ≥ true count (equality with no collisions)
    assert(CountMinSketch.estimate(cells, "a") >= 3L)
    assert(CountMinSketch.estimate(cells, "b") >= 2L)
    assert(CountMinSketch.estimate(cells, "c") >= 1L)
    // a token never added can only over-count via collisions, and with
    // 3 tokens in 256 buckets min-over-4-rows is almost surely 0
    assert(CountMinSketch.estimate(cells, "zzz") === 0L)
  }

  test("CMS merge is distributive (partition-independent)") {
    val one = Seq("a", "b", "a").toDS()
      .select(CountMinSketch.toColumn).head()
    val parts = Seq("a", "b", "a").toDS().repartition(3)
      .select(CountMinSketch.toColumn).head()
    assert(one.sortBy(c => (c.row_idx, c.bucket)) === parts.sortBy(c => (c.row_idx, c.bucket)))
  }

  test("asofCarry attributes each event to the latest prior signup") {
    def ts(min: Long) = new Timestamp(min * 60000L)
    val events = Seq(
      (1L, ts(0), 10L, "click", 0.0, "{}"),
      (2L, ts(5), 10L, "signup", 0.0, "{}"),
      (3L, ts(9), 10L, "click", 0.0, "{}"),
      (4L, ts(20), 10L, "signup", 0.0, "{}"),
      (5L, ts(30), 10L, "buy", 0.0, "{}"),
      (6L, ts(2), 20L, "click", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Events.asofCarry(events)
      .select("event_id", "last_signup_ms").as[(Long, Option[Long])]
      .collect().toMap
    assert(out(1L).isEmpty)                     // before any signup
    assert(out(3L) === Some(5 * 60000L))        // first signup carried
    assert(out(5L) === Some(20 * 60000L))       // superseded by second
    assert(out(6L).isEmpty)                     // other user unaffected
  }
}
