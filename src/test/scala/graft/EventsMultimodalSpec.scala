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

  test("valueQuantiles interpolates exactly on cents (p50 of [100,200,300,400])") {
    val out = Events.valueQuantiles(events).filter($"event_type" === "click")
      .select("n", "p50", "p90", "p99").as[(Long, Double, Double, Double)].head()
    // clicks: cents 100, 200, 400 → p50 = 200; p90 = 200+0.8·200 = 360
    assert(out._1 === 3L)
    assert(out._2 === 200.0)
    assert(out._3 === 360.0)
  }

  test("rateAnomaly z-scores against the trailing window; degenerate baselines are null") {
    // hourly counts for one type: 1, 3, 1, 5 (hours 0..3)
    val evs = (Seq(ts(10)) ++ Seq(70, 80, 90).map(m => ts(m.toLong)) ++
      Seq(ts(130)) ++ Seq(190, 200, 210, 220, 230).map(m => ts(m.toLong)))
      .zipWithIndex.map { case (t, i) => (i.toLong, t, 1L, "click", 0.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Events.rateAnomaly(evs)
      .select("hour", "c", "z").as[(String, Long, Option[Double])].collect()
      .map(r => r._1.substring(11, 13) -> ((r._2, r._3))).toMap
    def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    assert(out("00") === ((1L, None)))        // no baseline
    assert(out("01") === ((3L, None)))        // n_base = 1
    assert(out("02") === ((1L, Some(r4((1 - 2.0) / 1.0))))) // base [1,3]: mean 2, sigma 1
    val mean = 5.0 / 3; val sigma = math.sqrt(11.0 / 3 - mean * mean)
    assert(out("03") === ((5L, Some(r4((5 - mean) / sigma)))))
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

  /** md5 first hex nibble of the text decides the format class. */
  private def fmtClass(text: String): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(text.getBytes("UTF-8"))
    ((d(0) >> 4) & 0xf) % 3
  }

  test("decode stub handles unknown bytes; frame sampling strides") {
    // every fixture class now carries a real header — the stub is the
    // fallback for genuinely unknown bytes, exercised directly
    val md = java.security.MessageDigest.getInstance("MD5")
    val raw = Array.fill(600)('x'.toByte)
    val stub = Multimodal.decode(md, 7L, raw)
    assert(stub.n_bytes === 600L)
    assert(stub.width === 16 + 600 % 640)
    assert(stub === Multimodal.decode(md, 7L, raw), "deterministic")
    // frame sampling through the real jpeg path
    val text = (590 to 700).map("x" * _).find(fmtClass(_) == 0).get
    val n = text.length + Multimodal.JpegHeaderLen
    val docs = Seq((7L, text, "en")).toDF("doc_id", "text", "lang")
    val meta = Multimodal.mediaMeta(spark, docs).collect().head
    assert(meta.n_frames === 1 + n / 256)
    val frames = Multimodal.frameSample(spark, docs).select("frame_idx")
      .as[Long].collect().toSet
    assert(frames === Set(0L)) // frames 0..2, stride 4 → only 0
  }

  test("jpeg-class media carries walkable SOI/APP0/SOF0 segments the decoder parses") {
    val jpegText = (0 to 99).map(i => "doc body " + ("j" * i)).find(fmtClass(_) == 0).get
    val docs = Seq((9L, jpegText, "en")).toDF("doc_id", "text", "lang")
    val content = Multimodal.mediaTable(docs)
      .select("content").as[Array[Byte]].collect().head
    val payloadLen = jpegText.getBytes("UTF-8").length
    assert(content.length === payloadLen + Multimodal.JpegHeaderLen)
    assert((content(0) & 0xff) === 0xff && (content(1) & 0xff) === 0xd8) // SOI
    assert(new String(content.slice(6, 10), "US-ASCII") === "JFIF")
    // the parser must WALK segments (APP0 first) to find SOF0's dims
    assert(Multimodal.parseJpegHeader(content) ===
      Some((16L + payloadLen % 640, 16L + (payloadLen * 7L) % 480)))
    val meta = Multimodal.mediaMeta(spark, docs).collect().head
    assert(meta.fmt === "jpeg")
    assert(meta.n_bytes === payloadLen + Multimodal.JpegHeaderLen)
  }

  test("png-class media carries a spec-valid PNG header the decoder truly parses") {
    // deterministically pick one text per class (search is in-test, no magic constants)
    val pngText = (0 to 99).map(i => "doc body " + ("y" * i)).find(fmtClass(_) == 1).get
    val jpgText = (0 to 99).map(i => "doc body " + ("z" * i)).find(fmtClass(_) == 0).get
    val docs = Seq((1L, pngText, "en"), (2L, jpgText, "en")).toDF("doc_id", "text", "lang")

    val content = Multimodal.mediaTable(docs).where($"doc_id" === 1L)
      .select("content").as[Array[Byte]].collect().head
    val payloadLen = pngText.getBytes("UTF-8").length
    assert(content.length === payloadLen + Multimodal.PngHeaderLen)
    assert(content.startsWith(Multimodal.PngMagic))
    // IHDR CRC32 in the emitted bytes is a true CRC over type+data
    val crc = new java.util.zip.CRC32
    crc.update(content, 12, 17) // "IHDR" + 13 data bytes
    val embedded = java.nio.ByteBuffer.wrap(content, 29, 4).getInt & 0xffffffffL
    assert(embedded === crc.getValue)
    // the decoder byte-parses width/height out of the IHDR
    val parsed = Multimodal.parsePngHeader(content)
    assert(parsed === Some((16L + payloadLen % 640, 16L + (payloadLen * 7L) % 480)))

    val metas = Multimodal.mediaMeta(spark, docs).collect()
      .map(m => m.doc_id -> m).toMap
    assert(metas(1L).fmt === "png")
    assert(metas(1L).n_bytes === payloadLen + Multimodal.PngHeaderLen)
    assert(metas(1L).width === 16L + payloadLen % 640)
    assert(metas(2L).fmt === "jpeg") // jpeg class: its own real parse path
    assert(metas(2L).n_bytes ===
      jpgText.getBytes("UTF-8").length.toLong + Multimodal.JpegHeaderLen)
  }

  test("webp-class media carries a valid RIFF/VP8L header the decoder truly parses") {
    val webpText = (0 to 99).map(i => "doc body " + ("w" * i)).find(fmtClass(_) == 2).get
    val docs = Seq((3L, webpText, "en")).toDF("doc_id", "text", "lang")
    val content = Multimodal.mediaTable(docs)
      .select("content").as[Array[Byte]].collect().head
    val payloadLen = webpText.getBytes("UTF-8").length
    assert(content.length === payloadLen + Multimodal.WebpHeaderLen)
    // container structure, independently of our parser
    assert(new String(content.slice(0, 4), "US-ASCII") === "RIFF")
    assert(new String(content.slice(8, 12), "US-ASCII") === "WEBP")
    assert(new String(content.slice(12, 16), "US-ASCII") === "VP8L")
    assert(content(20) === 0x2f.toByte)
    // RIFF size field = total length - 8, little-endian
    val riffSize = java.nio.ByteBuffer.wrap(content, 4, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    assert(riffSize === content.length - 8)
    // decoder bit-unpacks the dims the table embedded
    assert(Multimodal.parseWebpHeader(content) ===
      Some((16L + payloadLen % 640, 16L + (payloadLen * 7L) % 480)))
    val meta = Multimodal.mediaMeta(spark, docs).collect().head
    assert(meta.fmt === "webp")
    assert(meta.n_bytes === payloadLen + Multimodal.WebpHeaderLen)
  }

  test("gif video table emits walkable multi-frame streams; parser handles extensions") {
    val text = "0123456789abc" // 13 bytes → 1 + 13%7 = 7 frames
    val docs = Seq((9L, text, "en")).toDF("doc_id", "text", "lang")
    val content = Multimodal.videoTable(docs)
      .select("content").as[Array[Byte]].collect().head
    assert(new String(content.slice(0, 6), "US-ASCII") === "GIF89a")
    val meta = Multimodal.videoMeta(spark, docs).collect().head
    assert(meta === graft.ops.VideoMeta(9L, 13L + 12L * 7 + 1 + 13, 16L + 13, 16L + 39, 7L))
    // a hand-built GIF with a graphic-control EXTENSION before the
    // frame (our table never emits one — the walker must still skip it)
    val ext = Array[Byte](0x21.toByte, 0xf9.toByte, 4, 0, 0, 0, 0, 0)
    val withExt =
      content.slice(0, 13) ++ ext ++ content.slice(13, 13 + 12) ++ Array[Byte](0x3b)
    assert(Multimodal.parseGifMeta(1L, withExt) ===
      Some(graft.ops.VideoMeta(1L, withExt.length.toLong, meta.width, meta.height, 1L)))
    // corrupt stream (bad block introducer) refuses rather than fakes
    val corrupt = content.slice(0, 13) ++ Array[Byte](0x55)
    assert(Multimodal.parseGifMeta(1L, corrupt) === None)
  }
}
