package graft

import org.apache.spark.sql.functions._

import graft.ops.Pii

/** Pins the x99 PII semantics: per-class counts over the pre-scrub
  * text, typed-token substitution, and the deterministic doc_id-keyed
  * injection cohorts. */
class PiiSpec extends SparkSpec {
  import spark.implicits._

  test("per-class counts include organic and injected matches per cohort") {
    val df = Seq(
      (100L, "mail me at bob@x.io or sue@y.org"),    // %4=0 → +2 emails
      (101L, "server 8.8.8.8 and 10.0.0.1 up"),      // %4=1 → +1 phone
      (102L, "dial 555-123-4567 then 555-000-1111"), // %4=2 → +1 ip, +1 phone
      (103L, "no pii here at all")                   // %4=3 → clean cohort
    ).toDF("doc_id", "text")
    val out = Pii.piiScrub(df).orderBy("doc_id")
      .select("doc_id", "n_emails", "n_phones", "n_ips")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (100L, 4L, 0L, 0L),
      (101L, 0L, 1L, 2L),
      (102L, 0L, 3L, 1L),
      (103L, 0L, 0L, 0L)))
  }

  test("scrub substitutes typed tokens and leaves no residual match") {
    val df = Seq(Tuple1("bob@x.io calls 555-123-4567 from 1.2.3.4")).toDF("text")
    val s = df.select(Pii.scrub(col("text")).as("s")).as[String].head()
    assert(s === s"${Pii.EmailToken} calls ${Pii.PhoneToken} from ${Pii.IpToken}")
    val residual = df.select(Pii.scrub(col("text")).as("t"))
      .select(
        size(regexp_extract_all(col("t"), lit(Pii.EmailPattern), lit(0))) +
        size(regexp_extract_all(col("t"), lit(Pii.PhonePattern), lit(0))) +
        size(regexp_extract_all(col("t"), lit(Pii.Ipv4Pattern), lit(0))))
      .as[Int].head()
    assert(residual === 0)
  }

  test("scrub_fp changes iff PII was present; lengths track the rewrite") {
    val df = Seq(
      (3L, "alpha beta gamma"),            // %4=3: no injection, no PII
      (7L, "ping 127.0.0.1 beta")          // %4=3: organic IP only
    ).toDF("doc_id", "text")
    val out = Pii.piiScrub(df).orderBy("doc_id")
      .select("doc_id", "scrub_fp", "n_scrub_chars")
      .as[(Long, String, Long)].collect()
    val cleanFp = df.filter(col("doc_id") === 3)
      .select(md5(col("text"))).as[String].head()
    assert(out(0)._2 === cleanFp) // untouched text hashes identically
    assert(out(0)._3 === "alpha beta gamma".length.toLong)
    assert(out(1)._3 === s"ping ${Pii.IpToken} beta".length.toLong)
  }
}
