package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.Temporal
import graft.ops.Temporal._

/** Pins the temporal operator semantics: as-of inclusivity and ties,
  * interval-join boundary/bucket behavior, SCD-2 compression, and
  * time-range frame peers. */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin attaches the most recent right row at-or-before, else null") {
    val left = Seq((1L, 100L, "a"), (1L, 250L, "b"), (2L, 50L, "c"))
      .toDF("k", "ms", "tag")
    val right = Seq((1L, 100L, 10L), (1L, 200L, 20L), (2L, 60L, 30L))
      .toDF("k", "ms", "payload")
    val out = asofJoin(left, right, "k", "ms", Seq("payload"))
      .select("tag", "payload").as[(String, Option[Long])].collect().toMap
    assert(out("a") === Some(10L), "equal timestamps match (inclusive as-of)")
    assert(out("b") === Some(20L), "most recent preceding wins, not the first")
    assert(out("c") === None, "no right row at-or-before → null payload")
  }

  test("asofJoin breaks equal-(key,ts) right ties by max payload, deterministically") {
    val left = Seq((1L, 100L)).toDF("k", "ms")
    val right = Seq((1L, 100L, 7L), (1L, 100L, 9L)).toDF("k", "ms", "payload")
    val out = asofJoin(left, right, "k", "ms", Seq("payload"))
      .select("payload").as[Long].collect()
    assert(out.toSeq === Seq(9L))
  }

  test("intervalJoin: inclusive start, exclusive end, cross-bucket intervals") {
    val points = Seq((1L, 0L), (2L, 999L), (3L, 1000L), (4L, BucketMs + 10L))
      .toDF("pid", "ms")
    // one interval spanning two buckets: [999, BucketMs + 11)
    val ivs = Seq(("w", 999L, BucketMs + 11L)).toDF("wid", "ws", "we")
    val out = intervalJoin(points, ivs, "ms", "ws", "we")
      .select("pid").as[Long].collect().toSet
    assert(out === Set(2L, 3L, 4L), "0 < ws excluded; ws inclusive; we exclusive")
    // each matching pair appears exactly once even though the interval
    // replicates to two buckets (a point hashes to exactly one bucket)
    assert(intervalJoin(points, ivs, "ms", "ws", "we").count() === 3L)
  }

  test("intervalJoin equals the naive range join on overlapping intervals") {
    val points = (0L until 200L).map(i => (i, i * 977L % 50000L)).toDF("pid", "ms")
    val ivs = (0L until 30L).map(i => (i, i * 1637L % 40000L, i * 1637L % 40000L + 7000L))
      .toDF("wid", "ws", "we")
    val fast = intervalJoin(points, ivs, "ms", "ws", "we")
      .select("pid", "wid").as[(Long, Long)].collect().toSet
    val naive = points.join(ivs, col("ms") >= col("ws") && col("ms") < col("we"))
      .select("pid", "wid").as[(Long, Long)].collect().toSet
    assert(fast === naive)
  }

  test("scd2 compresses consecutive duplicate states and chains validity") {
    def ts(ms: Long) = new Timestamp(ms)
    val evs = Seq(
      (1L, ts(1000L), 7L, "view", 0.0, "{}"),
      (2L, ts(2000L), 7L, "view", 0.0, "{}"),  // same state → compressed
      (3L, ts(3000L), 7L, "click", 0.0, "{}"),
      (4L, ts(4000L), 7L, "view", 0.0, "{}"),
      (5L, ts(9000L), 8L, "error", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = scd2(evs)
      .select("user_id", "state", "valid_from_ms", "valid_to_ms", "version")
      .as[(Long, String, Long, Option[Long], Long)].collect().toSet
    assert(out === Set(
      (7L, "view", 1000L, Some(3000L), 1L),
      (7L, "click", 3000L, Some(4000L), 2L),
      (7L, "view", 4000L, None, 3L),
      (8L, "error", 9000L, None, 1L)))
  }

  test("rollingValue: time-range frame includes equal-ms peers, expires old rows") {
    def ts(ms: Long) = new Timestamp(ms)
    val evs = Seq(
      (1L, ts(0L), 7L, "view", 1.0, "{}"),
      (2L, ts(RollingRangeMs), 7L, "view", 2.0, "{}"),      // 0 still in range (inclusive)
      (3L, ts(RollingRangeMs), 7L, "view", 3.0, "{}"),      // equal-ms peer of 2
      (4L, ts(2 * RollingRangeMs + 1), 7L, "view", 4.0, "{}") // everything expired
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = rollingValue(evs).select("event_id", "n_1h", "cents_1h")
      .as[(Long, Long, Long)].collect().map { case (e, n, c) => e -> ((n, c)) }.toMap
    assert(out(1L) === ((1L, 100L)))
    // range frames are peer-inclusive: rows 2 and 3 see each other
    assert(out(2L) === ((3L, 600L)))
    assert(out(3L) === ((3L, 600L)))
    assert(out(4L) === ((1L, 400L)))
  }

  test("plan gates: interval join is a hash join on the bucket; asof is one window pass") {
    val d = "/root/testdata/sf0.001"
    val iv = errorsInBusyWindows(graft.sources.Tables.events(spark, d))
    iv.collect()
    // AQE's toString repeats nodes under "== Initial Plan ==" — gate on
    // the final plan section only
    val p = iv.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!p.contains("CartesianProduct"), s"x46 plans a cartesian:\n$p")
    // the point-in-interval join itself must be a HASH join on the
    // bucket key; the only permitted nested loop is the 1-row global
    // threshold attach (scalar broadcast — map-only at any scale)
    assert(p.contains("BroadcastHashJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("SortMergeJoin"), s"x46 bucket join must be a hash join:\n$p")
    assert("BroadcastNestedLoopJoin".r.findAllMatchIn(p).size <= 1,
      s"x46: only the scalar-attach may nest-loop:\n$p")
    val asof = Temporal.purchaseAsofSignup(graft.sources.Tables.events(spark, d))
    asof.collect()
    val pa = asof.queryExecution.executedPlan.toString
    assert(!pa.contains("Join"),
      s"x45 must not plan any join — the carry trick is union+window:\n$pa")
  }
}
