package graft

import java.sql.Timestamp

import graft.ops.{Events, Multimodal}

/** Pins event sessionization/aggregation and the multimodal decode
  * plumbing. */
class EventsMultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(min * 60000L)

  private def events = Seq(
    (1L, ts(0), 10L, "click", 1.005, """{"k": 1}"""),
    (2L, ts(10), 10L, "click", 2.0, """{"k": 2}"""),
    (3L, ts(50), 10L, "buy", 3.0, """{"k": 3}"""),   // 40min gap → new session
    (4L, ts(5), 20L, "click", 4.0, """{"k": 4}""")
  ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("sessions split on >30min gaps; cents are exact") {
    val out = Events.sessions(events)
      .select("user_id", "session_seq", "n_events", "value_cents")
      .as[(Long, Long, Long, Long)].collect().toSet
    // floor(1.005*100+0.5) = 100 (1.005 is 1.00499… in binary), 2.0→200
    assert(out === Set((10L, 1L, 2L, 300L), (10L, 2L, 1L, 300L), (20L, 1L, 1L, 400L)))
  }

  test("parsedEvents extracts JSON k and hour bucket") {
    val row = Events.parsedEvents(events).filter($"event_id" === 3L)
      .select("k", "value_cents", "hour").as[(Long, Long, String)].head()
    assert(row === ((3L, 300L, "1970-01-01 00:00:00")))
  }

  test("hourlyAgg counts events and distinct users per (hour, type)") {
    val row = Events.hourlyAgg(events)
      .select("event_type", "n_events", "value_cents", "n_users")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(row === Set(("click", 3L, 700L, 2L), ("buy", 1L, 300L, 1L)))
  }

  test("rollupAgg emits per-group, per-type subtotal, and grand-total levels") {
    val out = Events.rollupAgg(events)
      .select("event_type", "hour", "n_events", "value_cents")
      .as[(Option[String], Option[String], Long, Long)].collect().toSet
    val h = "1970-01-01 00:00:00"
    assert(out === Set(
      (Some("click"), Some(h), 3L, 700L),
      (Some("buy"), Some(h), 1L, 300L),
      (Some("click"), None, 3L, 700L),
      (Some("buy"), None, 1L, 300L),
      (None, None, 4L, 1000L)))
  }

  test("topQualityDocs ranks per lang with doc_id tie-break") {
    val docs = Seq(
      (1L, "the the the of and a data data", "en"),   // high stopword ratio
      (2L, "xxxx!!!!", "en"),                          // punct-heavy
      (3L, "words words words", "fr")
    ).toDF("doc_id", "text", "lang")
    val out = graft.ops.TextAnalysis.topQualityDocs(docs, k = 1)
      .select("lang", "doc_id", "rnk").as[(String, Long, Long)].collect().toSet
    assert(out === Set(("en", 1L, 1L), ("fr", 3L, 1L)))
  }

  test("media decode stub is deterministic and frame sampling strides") {
    val docs = Seq((7L, "x" * 600, "en")).toDF("doc_id", "text", "lang")
    val meta = Multimodal.mediaMeta(spark, docs).collect().head
    assert(meta.n_bytes === 600L)
    assert(meta.width === 16 + 600 % 640)
    assert(meta.n_frames === 1 + 600 / 256) // 3 frames
    val frames = Multimodal.frameSample(spark, docs).select("frame_idx")
      .as[Long].collect().toSet
    assert(frames === Set(0L)) // frames 0..2, stride 4 → only 0
  }
}
