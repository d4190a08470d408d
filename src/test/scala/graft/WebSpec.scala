package graft

import org.apache.spark.sql.functions._

import graft.ops.Web

/** x108 HTML extraction + x109 URL/domain stats. */
class WebSpec extends SparkSpec {
  import spark.implicits._

  private def docsOf(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("x108: full-page cohort loses script/style/comment/tags, keeps the body text") {
    // doc_id 0 -> full page, 1 -> fragment, 2 -> plain
    val out = Web.htmlExtract(docsOf(
      0L -> "hello world", 1L -> "mid text", 2L -> "bare words"))
      .orderBy("doc_id").collect()

    val full = out(0)
    assert(full.getAs[String]("title") === "Doc 0")
    // script var x / style color must NOT leak into the clean text;
    // the nav link labels DO survive (tag strip, not content strip)
    assert(full.getAs[Long]("n_links") === 2L)
    assert(full.getAs[Long]("n_tags") > 10L)

    val frag = out(1)
    assert(frag.getAs[String]("title") === "")
    assert(frag.getAs[Long]("n_links") === 0L)

    val plain = out(2)
    assert(plain.getAs[Long]("n_tags") === 0L)
    assert(plain.getAs[Long]("n_raw") === plain.getAs[Long]("n_clean"))
  }

  test("x108: clean text equals the hand-extracted expectation") {
    val cleaned = Web.htmlExtract(docsOf(0L -> "hello world", 1L -> "mid text"))
      .orderBy("doc_id")
    // recompute clean text locally from the same injection
    val raw0 = "<html><head><title>Doc 0</title><script type=\"text/javascript\">var x=0;\n" +
      "if(x>1){x=0;}</script><style>p {color: red}</style></head><body><p>hello world" +
      "</p><div id=\"nav\"><a href=\"/home\">home</a> <a href=\"/p0\">more</a></div></body></html>"
    val expect0 = raw0
      .replaceAll(Web.ScriptPattern, "").replaceAll(Web.StylePattern, "")
      .replaceAll(Web.CommentPattern, "").replaceAll(Web.TagPattern, " ")
      .replaceAll(Web.WsPattern, " ").trim
    assert(expect0 === "Doc 0 hello world home more")
    val fp = cleaned.collect().head
    assert(fp.getAs[Long]("n_clean") === expect0.length.toLong)
    assert(fp.getAs[String]("clean_fp") ===
      java.security.MessageDigest.getInstance("MD5")
        .digest(expect0.getBytes("UTF-8")).map("%02x".format(_)).mkString)
  }

  test("x109: domains aggregate with host counts, depth and blocklist verdicts") {
    // ids 0..7 -> cohorts 0,1,2,none,0,1,2,none
    val out = Web.urlStats(docsOf((0L to 7L).map(i => i -> "t"): _*))
      .collect().map(r => r.getAs[String]("domain") -> r).toMap
    assert(out.keySet === Set("corpus-hub.com", "static-assets.org", "spam-mirror.net", "(none)"))

    val hub = out("corpus-hub.com")
    assert(hub.getAs[Long]("n_docs") === 2L)     // ids 0, 4
    assert(hub.getAs[Long]("n_hosts") === 2L)    // www0, www4
    assert(hub.getAs[Long]("sum_depth") === 4L)  // /archive/dN = 2 each
    assert(hub.getAs[Long]("n_https") === 2L)
    assert(hub.getAs[Long]("blocked") === 0L)

    val cdn = out("static-assets.org")
    assert(cdn.getAs[Long]("n_docs") === 2L)     // ids 1, 5
    assert(cdn.getAs[Long]("n_hosts") === 2L)    // cdn1, cdn2
    assert(cdn.getAs[Long]("n_https") === 0L)    // http
    assert(cdn.getAs[Long]("sum_depth") === 2L)  // /fN.png = 1 each

    val spam = out("spam-mirror.net")
    assert(spam.getAs[Long]("blocked") === 1L)
    assert(spam.getAs[Long]("n_hosts") === 1L)   // ids 2,6 both hash to m0

    val none = out("(none)")
    assert(none.getAs[Long]("n_docs") === 2L)    // ids 3, 7
    assert(none.getAs[Long]("sum_depth") === 0L)
  }
}
