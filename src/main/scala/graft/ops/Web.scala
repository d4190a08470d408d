package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** x108/x109: the web-preprocessing front of a training-data pipeline —
  * HTML boilerplate extraction and URL parsing/domain stats. Every
  * public corpus pipeline starts here: C4/CCNet consume WET (already
  * tag-stripped) but RefinedWeb/Dolma run their own trafilatura-style
  * extraction (arXiv:2306.01116 §3.1 "text extraction"), and all of
  * them run URL-level filtering (RefinedWeb's blocklist + domain
  * dedup; C4's bad-words-by-domain).
  *
  * The fixture corpus is markup-free plain words, so both operators
  * deterministically INJECT their raw material (same simulation
  * convention as x99's PII / x105's decomposed marks), mirrored
  * codepoint-for-codepoint in the DuckDB oracle so the regexes face
  * real multi-line markup and mixed URL shapes, not 500 empty rows.
  *
  * Scale: x108 is map-only — five regex passes in ONE whole-stage-
  * codegen projection, no shuffle (PlanSpec-gated); this is how tag
  * stripping behaves over 100 TB (pure per-split CPU). x109 is one
  * map-only parse + ONE hash aggregate on the registrable domain —
  * partial aggregation collapses each split to its few distinct
  * domains before the (domain-cardinality) shuffle.
  */
object Web {

  // ---- x108 HTML boilerplate extraction ----------------------------

  /** Script/style/comment blocks die first (their CONTENT must not
    * leak into the text), then remaining tags become spaces. All
    * patterns sit in the Java-regex ∩ RE2 common subset: inline
    * `(?s)` instead of flags, non-greedy `.*?`, no lookaround. */
  val ScriptPattern  = "(?s)<script[^>]*>.*?</script>"
  val StylePattern   = "(?s)<style[^>]*>.*?</style>"
  val CommentPattern = "(?s)<!--.*?-->"
  val TagPattern     = "<[^>]+>"
  val TitlePattern   = "<title>([^<]*)</title>"
  val LinkPattern    = "<a [^>]*>"
  val WsPattern      = "\\s+"

  /** The doc_id-derived HTML wrapper around `text`:
    *  - doc_id % 3 == 0 → full page: head with title + script + style,
    *    body with the text in a `<p>` and a nav div of two links;
    *  - doc_id % 3 == 1 → fragment: h1 + p + an HTML comment;
    *  - doc_id % 3 == 2 → plain text (the no-markup cohort).
    * Mirrored literally in [[graft.pipelines.ExtSql]]. */
  def injectHtml(text: Column, docId: Column): Column = {
    val d3 = pmod(docId, lit(3))
    when(d3 === 0, concat(
      lit("<html><head><title>Doc "), docId,
      lit("</title><script type=\"text/javascript\">var x="), docId,
      lit(";\nif(x>1){x=0;}</script><style>p {color: red}</style></head><body><p>"),
      text,
      lit("</p><div id=\"nav\"><a href=\"/home\">home</a> <a href=\"/p"), docId,
      lit("\">more</a></div></body></html>")))
      .when(d3 === 1, concat(
        lit("<body><h1>Doc "), docId, lit("</h1>\n<p>"), text,
        lit("</p>\n<!-- footer "), docId, lit(" --></body>")))
      .otherwise(text)
  }

  /** The extraction chain: kill script/style/comment blocks, turn
    * every remaining tag into a space, collapse whitespace, trim. */
  def extractText(html: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(html, ScriptPattern, ""),
            StylePattern, ""),
          CommentPattern, ""),
        TagPattern, " "),
      WsPattern, " "))

  /** x108: per document — the extracted title, tag/link counts on the
    * raw markup, raw/clean lengths, and the clean text's md5 (the
    * fingerprint downstream dedup would hash). */
  def htmlExtract(documents: DataFrame): DataFrame = {
    val aug = injectHtml(col("text"), col("doc_id"))
    documents
      .select(col("doc_id"), aug.as("raw"))
      .select(
        col("doc_id"),
        regexp_extract(col("raw"), TitlePattern, 1).as("title"),
        size(regexp_extract_all(col("raw"), lit(TagPattern), lit(0)))
          .cast("long").as("n_tags"),
        size(regexp_extract_all(col("raw"), lit(LinkPattern), lit(0)))
          .cast("long").as("n_links"),
        length(col("raw")).cast("long").as("n_raw"),
        extractText(col("raw")).as("clean"))
      .select(col("doc_id"), col("title"), col("n_tags"), col("n_links"),
        col("n_raw"),
        length(col("clean")).cast("long").as("n_clean"),
        md5(col("clean")).as("clean_fp"))
  }

  // ---- x109 URL parse + per-domain stats ---------------------------

  /** First URL in the text (scrub-stage convention: the simple
    * greedy-to-whitespace shape every public pipeline greps with). */
  val UrlPattern    = "https?://[^\\s]+"
  val SchemePattern = "(https?)://"
  val HostPattern   = "https?://([^/\\s]+)"
  /** Registrable domain ≈ last two dot-labels of the host. */
  val DomainPattern = "([^.]+\\.[^.]+)$"
  /** Everything between the host and a `?`/`#` — the path. */
  val PathPattern   = "https?://[^/\\s]+(/[^?#\\s]*)"

  /** RefinedWeb-style domain blocklist (the fixture stand-in). */
  val BlockedDomains: Seq[String] = Seq("spam-mirror.net")

  /** The doc_id-derived URL mention appended to `text`:
    *  - doc_id % 4 == 0 → a www host, 2-deep path + query;
    *  - doc_id % 4 == 1 → a cdn host, 1-deep file path;
    *  - doc_id % 4 == 2 → a blocklisted domain;
    *  - doc_id % 4 == 3 → no URL (the `(none)` cohort).
    * Mirrored literally in [[graft.pipelines.ExtSql]]. */
  def injectUrl(text: Column, docId: Column): Column = {
    val d4 = pmod(docId, lit(4))
    concat(text,
      when(d4 === 0, concat(lit(" see https://www"), pmod(docId, lit(5)),
        lit(".corpus-hub.com/archive/d"), docId, lit("?ref=idx")))
        .when(d4 === 1, concat(lit(" img http://cdn"), pmod(docId, lit(3)),
          lit(".static-assets.org/f"), docId, lit(".png")))
        .when(d4 === 2, concat(lit(" via https://m"), pmod(docId, lit(2)),
          lit(".spam-mirror.net/x")))
        .otherwise(lit("")))
  }

  /** x109: per registrable domain — docs linking it, distinct hosts,
    * total path depth (count of `/` in paths), scheme split, and the
    * blocklist verdict. Docs with no URL aggregate under `(none)`. */
  def urlStats(documents: DataFrame): DataFrame = {
    val aug = injectUrl(col("text"), col("doc_id"))
    val url = regexp_extract(aug, UrlPattern, 0)
    val host = regexp_extract(url, HostPattern, 1)
    val path = regexp_extract(url, PathPattern, 1)
    val domain = when(host === "", "(none)")
      .otherwise(regexp_extract(host, DomainPattern, 1))
    documents
      .select(col("doc_id"),
        domain.as("domain"), host.as("host"),
        regexp_extract(url, SchemePattern, 1).as("scheme"),
        (length(path) - length(regexp_replace(path, "/", "")))
          .cast("long").as("depth"))
      .groupBy(col("domain"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("host")).as("n_hosts"),
        sum(col("depth")).as("sum_depth"),
        sum(when(col("scheme") === "https", 1L).otherwise(0L)).as("n_https"))
      .withColumn("blocked",
        col("domain").isInCollection(BlockedDomains).cast("long"))
  }

  /** Tracking query params stripped by [[normalizeUrl]] (the CCNet/
    * crawl-dedup canonicalization set: referrer + ad-click IDs). */
  val TrackingParamPattern = "(?:ref|utm_[a-z0-9]+|fbclid|gclid)=[^&#]*(?:&|$)"

  /** Canonical form of one URL column: fragment dropped, tracking
    * params dropped (dangling `?`/`&` cleaned), scheme + host
    * lowercased, path left byte-exact. Pure regexp chain — RE2-safe
    * (no backreferences), so DuckDB mirrors it verbatim. */
  def normalizeUrl(url: Column): Column = {
    val noFrag  = regexp_replace(url, "#.*$", "")
    val noTrack = regexp_replace(noFrag, TrackingParamPattern, "")
    val clean   = regexp_replace(noTrack, "[?&]+$", "")
    val rest    = regexp_replace(clean, "^https?://[^/\\s?#]+", "")
    concat(lower(regexp_extract(clean, SchemePattern, 1)), lit("://"),
      lower(regexp_extract(clean, HostPattern, 1)), rest)
  }

  /** x130: URL CANONICALIZATION + collapse — normalize each doc's URL
    * and count docs per canonical URL (the crawl-frontier dedup step:
    * `?ref=`/`utm_` variants of one page must collapse to one key
    * BEFORE fetch-dedup, or the crawler re-fetches every variant).
    * Docs without a URL land on `(none)`.
    *
    * Scale: a map-only regexp projection (no UDF, codegen'd) into one
    * hash aggregate keyed by the canonical URL — the same shape as
    * exact dedup (x4), keys shuffle, bodies never do. */
  def urlNormalize(documents: DataFrame): DataFrame = {
    val aug = injectUrl(col("text"), col("doc_id"))
    val url = regexp_extract(aug, UrlPattern, 0)
    documents
      .select(when(url === "", "(none)")
        .otherwise(normalizeUrl(url)).as("url_norm"))
      .groupBy(col("url_norm"))
      .agg(count(lit(1)).as("n_docs"))
  }

  // ---- x145 cross-split URL leakage --------------------------------

  /** x145: URL-level SPLIT LEAKAGE audit — canonical URLs (x130's
    * normalization) that appear in MORE THAN ONE of the x29
    * train/val/test splits, with per-split doc counts. Content-level
    * decontamination (x37/x78) misses the page-identity channel: two
    * crawls of one URL differ textually but are still the same
    * document, so a URL straddling train and test leaks the benchmark.
    * Split assignment is content-hash-based (doc_id), so URL collisions
    * across splits are exactly what this surfaces.
    *
    * Scale: map-only canonicalization + split tagging in ONE
    * projection (both are doc-local), then a single hash aggregate on
    * the canonical URL with conditional counts — the x4 dedup shape;
    * no join (the split comes from the same row), keys-only shuffle. */
  def urlSplitLeakage(documents: DataFrame): DataFrame = {
    val aug = injectUrl(col("text"), col("doc_id"))
    val url = regexp_extract(aug, UrlPattern, 0)
    documents
      .select(normalizeUrl(url).as("url_norm"),
        TextAnalysis.splitOf(col("doc_id")).as("split"))
      .filter(col("url_norm") =!= "://")
      .groupBy(col("url_norm"))
      .agg(
        sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
        sum(when(col("split") === "val", 1L).otherwise(0L)).as("n_val"),
        sum(when(col("split") === "test", 1L).otherwise(0L)).as("n_test"))
      .filter(
        (when(col("n_train") > 0, 1).otherwise(0) +
          when(col("n_val") > 0, 1).otherwise(0) +
          when(col("n_test") > 0, 1).otherwise(0)) >= 2)
  }
}
