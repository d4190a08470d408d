package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.ops.Events
import graft.streaming.{Ev, EventStream}

/** Streaming twins equal their batch counterparts on the same data. */
class EventStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(min * 60000L)

  test("streaming hourly windows match the batch hourly aggregation") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    in.addData(
      (1L, ts(5), 10L, "click", 1.0, "{}"),
      (2L, ts(61), 10L, "click", 2.0, "{}"),
      (3L, ts(70), 20L, "buy", 3.0, "{}"))
    val df = in.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = EventStream.hourlyCounts(df)
      .writeStream.format("memory").queryName("hourly")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val streaming = spark.table("hourly")
      .select("hour", "event_type", "n_events", "value_cents")
      .as[(String, String, Long, Long)].collect().toSet
    val batch = Events.hourlyAgg(df.sparkSession.createDataFrame(
      Seq((1L, ts(5), 10L, "click", 1.0, "{}"),
          (2L, ts(61), 10L, "click", 2.0, "{}"),
          (3L, ts(70), 20L, "buy", 3.0, "{}")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      .select("hour", "event_type", "n_events", "value_cents")
      .as[(String, String, Long, Long)].collect().toSet
    assert(streaming === batch)
    assert(streaming === Set(
      ("1970-01-01 00:00:00", "click", 1L, 100L),
      ("1970-01-01 01:00:00", "click", 1L, 200L),
      ("1970-01-01 01:00:00", "buy", 1L, 300L)))
  }

  test("streaming ingest filter passes only fingerprints unseen by the store") {
    implicit val sc = spark.sqlContext
    // doc_ids 0,3,6 are the arriving slice (%3==0); 1,2 are history.
    // doc 0 duplicates history doc 1's text → filtered; 3 and 6 are
    // new (6 duplicates 3 — the row-wise filter passes BOTH; within-
    // batch grouping is x32's batch-side job)
    val in = MemoryStream[(Long, String)]
    in.addData((0L, "alpha beta"), (3L, "gamma delta"), (6L, "gamma delta"))
    val hist = Seq((1L, "Alpha  beta"), (2L, "epsilon")).toDF("doc_id", "text")
      .select(graft.ops.TextAnalysis.fingerprint(col("text")).as("fp")).distinct()
    val q = EventStream.ingestFilter(
        in.toDF().toDF("doc_id", "text"), hist)
      .writeStream.format("memory").queryName("ingest")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("ingest").as[(Long, String)].collect()
    assert(out.map(_._1).sorted.toSeq === Seq(3L, 6L))
    // the canonicalizing fingerprint (lowercase, collapsed whitespace)
    // is what matched doc 0 against "Alpha  beta"
    assert(out.map(_._2).distinct.length === 1)
  }

  test("streaming near-dup ingest flags bands shared with the historical store") {
    implicit val sc = spark.sqlContext
    // doc 0 (arriving, %3==0) repeats history doc 1's text verbatim →
    // every one of its 4 LSH bands collides; doc 3's text shares no
    // shingle with history → no band can collide (a band hash is a
    // function of the shingle set alone, and the hash constants are
    // fixed, so this is deterministic)
    val in = MemoryStream[(Long, String)]
    in.addData(
      (0L, "one two three four five"),
      (3L, "totally different words over here now"))
    val hist = EventStream.historicalBandStore(
      Seq((1L, "one two three four five"), (2L, "unrelated history text entry"))
        .toDF("doc_id", "text"))
    val q = EventStream.nearDupIngest(in.toDF().toDF("doc_id", "text"), hist)
      .writeStream.format("memory").queryName("neardup")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("neardup").as[(Long, Long, String)].collect()
    assert(out.map(_._1).distinct.toSeq === Seq(0L))
    assert(out.map(_._2).sorted.toSeq === Seq(0L, 1L, 2L, 3L))
  }

  test("stateful sessionization closes sessions on gap within a batch") {
    implicit val sc = spark.sqlContext
    // offset from epoch: an event at exactly t=0 is "older than the
    // initial watermark (0)" and gets dropped as late data
    val base = 1440L
    val baseMs = base * 60000L
    val in = MemoryStream[Ev]
    in.addData(
      Ev(10L, ts(base), 1.0), Ev(10L, ts(base + 10), 2.0), // session 1 (closed by gap)
      Ev(10L, ts(base + 50), 3.0),                         // session 2 (stays open)
      Ev(20L, ts(base + 5), 4.0))                          // stays open
    val q = EventStream.sessions(in.toDF())
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("sessions")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // only user 10's first session closed inside the batch
    assert(out === Set((10L, baseMs, baseMs + 600000L, 2L, 300L)))
  }

  test("late event within gap widens the open session; far-earlier event emits as fragment") {
    implicit val sc = spark.sqlContext
    val base = 2880L
    val m = 60000L
    val in = MemoryStream[Ev]
    // default trigger (AvailableNow would terminate after batch 1)
    val q = EventStream.sessions(in.toDF())
      .writeStream.format("memory").queryName("late_sessions")
      .outputMode("append").start()
    in.addData(Ev(30L, ts(base + 100), 1.0)) // open session [100,100]
    q.processAllAvailable() // watermark advances to base+40 (delay 1h)
    // batch 2, all above the base+40 watermark:
    in.addData(
      Ev(30L, ts(base + 50), 9.99), // > gap before start → lone fragment
      Ev(30L, ts(base + 95), 1.0),  // within gap before start → widen to [95,100]
      Ev(30L, ts(base + 200), 1.0)) // gap > 30min after 100 → closes [95,100]
    q.processAllAvailable(); q.stop()
    val out = spark.table("late_sessions")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(out === Set(
      (30L, (base + 50) * m, (base + 50) * m, 1L, 999L),        // fragment
      (30L, (base + 95) * m, (base + 100) * m, 2L, 200L)))      // widened, closed
  }

  test("streaming exact dedup drops re-delivered event ids") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    in.addData(
      (1L, ts(1500), 10L, "click", 1.0, "{}"),
      (1L, ts(1501), 10L, "click", 1.0, "{}"), // re-delivery
      (2L, ts(1502), 10L, "click", 2.0, "{}"))
    val df = in.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = EventStream.dedupedEvents(df)
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("dedup").select("event_id").as[Long].collect().sorted
      === Array(1L, 2L))
  }

  test("file-source streaming scan reads the events fixture") {
    val q = EventStream.readEvents(spark, "/root/testdata/sf0.001")
      .writeStream.format("memory").queryName("rawev")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("rawev").count() === 1000L)
  }

  test("stream-stream interval join attributes buys to signups within the hour") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    // times offset from epoch: an event at EXACTLY the initial
    // watermark (epoch 0) would be treated as late on the state side
    in.addData(
      (1L, ts(1000), 10L, "signup", 0.0, "{}"),
      (2L, ts(1030), 10L, "purchase", 5.0, "{}"),    // 30min after signup → attributed
      (3L, ts(1090), 10L, "purchase", 7.0, "{}"),    // 90min after signup 1 → outside its window
      (4L, ts(1080), 10L, "signup", 0.0, "{}"), // buy 3 is 10min after → attributed
      (5L, ts(1040), 20L, "purchase", 9.0, "{}"))    // user 20 never signed up
    val q = EventStream.attributedBuys(
      in.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      .writeStream.format("memory").queryName("attr")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("attr").select("buy_id", "signup_id", "value_cents")
      .as[(Long, Long, Long)].collect().toSet
    assert(out === Set((2L, 1L, 500L), (3L, 4L, 700L)))
  }

  test("foreachBatch idempotent sink: per-batch deltas compact to latest-per-user") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "upsert").toString
    val in = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    in.addData(
      (1L, ts(3000), 10L, "click", 1.0, "{}"),
      (2L, ts(3010), 10L, "click", 2.0, "{}"),  // later → wins for user 10
      (3L, ts(3005), 20L, "click", 3.0, "{}"))
    val df = in.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q1 = EventStream.latestPerUser(df, dir)
    q1.awaitTermination()
    // second run = a later micro-batch updating user 10 and adding 30
    in.addData(
      (4L, ts(3020), 10L, "click", 4.0, "{}"),
      (5L, ts(3001), 30L, "click", 5.0, "{}"))
    val q2 = EventStream.latestPerUser(df, dir)
    q2.awaitTermination()
    val out = EventStream.readLatestPerUser(spark, dir)
      .as[(Long, Long, Long)].collect().toSet
    assert(out === Set(
      (10L, 3020L * 60000L, 400L),
      (20L, 3005L * 60000L, 300L),
      (30L, 3001L * 60000L, 500L)))
    // idempotence: a batch directory is written at most once
    val deltas = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("delta_"))
    assert(deltas.toSet === Set("delta_0", "delta_1"))
  }

  test("transformWithState running totals equal the batch prefix sums") {
    import org.apache.spark.sql.expressions.Window
    val d = "/root/testdata/sf0.001"
    val out = graft.streaming.EventStream.runningTotalsAvailableNow(spark, d)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ms"), col("event_id")).rowsBetween(Window.unboundedPreceding, 0)
    val batch = graft.sources.Tables.events(spark, d)
      .select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("ms"),
        graft.ops.Events.valueCents(col("value")).as("cents"))
      .select(col("user_id"), col("event_id"), col("ms"),
        count(lit(1)).over(w).as("running_n"),
        sum(col("cents")).over(w).as("running_cents"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(out === batch)
  }

  test("AvailableNow runs equal the batch answer under the final-watermark cut") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val ev = graft.sources.Tables.events(spark, dir)
    val wm = ev.select(max(unix_millis(col("ts")))).head().getLong(0) - 3600000L

    val streamH = EventStream.hourlyAvailableNow(spark, dir)
      .as[(String, String, Long, Long)].collect().sorted
    val batchH = Events.hourlyAgg(ev).drop("n_users")
      .filter(unix_millis(to_timestamp(col("hour"))) + 3600000L <= wm)
      .select("hour", "event_type", "n_events", "value_cents")
      .as[(String, String, Long, Long)].collect().sorted
    assert(streamH.nonEmpty && (streamH sameElements batchH))

    val streamS = EventStream.sessionsAvailableNow(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().sorted
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
    val batchS = Events.sessions(ev)
      .withColumn("max_seq", max(col("session_seq")).over(w))
      .filter(col("session_seq") < col("max_seq") ||
        col("end_ms") + Events.SessionGapMs < wm)
      .select("user_id", "start_ms", "end_ms", "n_events", "value_cents")
      .as[(Long, Long, Long, Long, Long)].collect().sorted
    assert(streamS.nonEmpty && (streamS sameElements batchS))
  }
}
