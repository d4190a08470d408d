package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** x99: PII detection + redaction — the scrub stage every public
  * training-data pipeline runs before anything else sees the text
  * (CCNet and Dolma both ship an email/phone/IP pass; see also the
  * C4 pipeline's blocklist stage). Counts each PII class via
  * `regexp_extract_all` and emits the md5 of the text with every
  * match replaced by a typed placeholder (`regexp_replace`).
  *
  * The synthetic fixture corpus contains no PII-shaped strings (its
  * vocabulary is ~40 plain words), so the operator deterministically
  * INJECTS them first: doc_id-derived emails / phone numbers / IPv4s
  * appended to the raw text, the exact simulation pattern the
  * incremental-dedup (x32) and contamination (x37) queries use for
  * their missing real-world inputs. Both engines run the IDENTICAL
  * injection expression, so the oracle exercises real multi-match
  * detection and replacement, not 500 rows of zero.
  *
  * Scale: map-only — one projection, no shuffle, no UDF; the three
  * regex passes run inside whole-stage codegen per 128 MB input
  * split, which is exactly how this stage behaves over 100 TB (the
  * PlanSpec gate asserts zero exchanges). Counts are taken on the
  * pre-scrub text; replacement runs email → IPv4 → phone so the IP
  * pass cannot eat a phone's digit groups.
  */
object Pii {

  /** Email: local part `@` dotted domain with a ≥2-letter TLD. Kept to
    * the Java-regex ∩ RE2 common subset (no lookaround, no backrefs)
    * like every shared pattern in this engine. */
  val EmailPattern = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  /** NANP-style dashed phone: 555-010-1234. */
  val PhonePattern = """\b\d{3}-\d{3}-\d{4}\b"""
  /** Dotted-quad IPv4 (unvalidated octet range, standard scrub shape). */
  val Ipv4Pattern = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""

  val EmailToken = "<EMAIL>"
  val PhoneToken = "<PHONE>"
  val IpToken    = "<IP>"

  /** The doc_id-derived PII injection, appended to `text`:
    *  - doc_id % 4 == 0 → two emails (multi-match per class);
    *  - doc_id % 4 == 1 → a phone;
    *  - doc_id % 4 == 2 → an IPv4 and a phone (cross-class mix);
    *  - doc_id % 4 == 3 → nothing (the clean cohort).
    * Mirrored literally in [[graft.pipelines.ExtSql]]. */
  def injectPii(text: Column, docId: Column): Column = {
    val d4 = pmod(docId, lit(4))
    concat(text,
      when(d4 === 0, concat(lit(" contact u"), docId, lit("@example.com or admin"),
        docId, lit("@mail.example.org now")))
        .when(d4 === 1, concat(lit(" call 555-"), lpad(pmod(docId, lit(1000)).cast("string"), 3, "0"),
          lit("-"), lpad(pmod(docId * 7, lit(10000)).cast("string"), 4, "0"), lit(" today")))
        .when(d4 === 2, concat(lit(" host 10."), pmod(docId, lit(256)), lit("."),
          pmod(docId * 3, lit(256)), lit("."), pmod(docId * 7, lit(256)),
          lit(" rang 555-"), lpad(pmod(docId, lit(1000)).cast("string"), 3, "0"),
          lit("-0000")))
        .otherwise(lit("")))
  }

  /** All three redaction passes, email → IPv4 → phone. */
  def scrub(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, EmailToken),
        Ipv4Pattern, IpToken),
      PhonePattern, PhoneToken)

  /** One row per document: per-class match counts (over the pre-scrub
    * text) + the scrubbed text's md5 + its residual length. */
  def piiScrub(documents: DataFrame): DataFrame = {
    val aug = injectPii(col("text"), col("doc_id"))
    val scrubbed = scrub(aug)
    documents.select(
      col("doc_id"),
      size(regexp_extract_all(aug, lit(EmailPattern), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(aug, lit(PhonePattern), lit(0))).cast("long").as("n_phones"),
      size(regexp_extract_all(aug, lit(Ipv4Pattern), lit(0))).cast("long").as("n_ips"),
      md5(scrubbed).as("scrub_fp"),
      length(scrubbed).cast("long").as("n_scrub_chars"))
  }
}
