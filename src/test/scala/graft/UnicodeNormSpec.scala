package graft

import java.text.Normalizer

import org.apache.spark.sql.functions._

import graft.functions.NfcNormalize
import graft.ops.TextAnalysis

/** Pins the native `graft_nfc` expression against the JDK's own
  * Normalizer (the second independent implementation locally; DuckDB's
  * `nfc_normalize` is the third, via the x105 oracle row). */
class UnicodeNormSpec extends SparkSpec {
  import spark.implicits._

  private def nfcOf(rows: Seq[String]): Seq[String] = {
    NfcNormalize.register(spark)
    rows.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "s")
      .select(col("id"), NfcNormalize.nfcCol(col("s")).as("n"))
      .orderBy("id").as[(Long, String)].collect().map(_._2).toSeq
  }

  test("composes decomposed pairs, leaves NFC text alone") {
    val out = nfcOf(Seq(
      "cafe\u0301",            // e + combining acute -> e-acute
      "caf\u00E9",             // already precomposed
      "A\u030Angstro\u0308m", // ring + diaeresis pairs
      "plain ascii",
      ""))
    assert(out(0) === "caf\u00E9")
    assert(out(1) === "caf\u00E9")
    assert(out(2) === "\u00C5ngstr\u00F6m")
    assert(out(3) === "plain ascii")
    assert(out(4) === "")
  }

  test("null propagates") {
    NfcNormalize.register(spark)
    val out = Seq((1L, Option.empty[String]), (2L, Some("x")))
      .toDF("id", "s")
      .select(NfcNormalize.nfcCol(col("s")).as("n")).orderBy("n")
      .as[Option[String]].collect()
    assert(out.toSeq === Seq(None, Some("x")))
  }

  test("matches java.text.Normalizer on randomized mark soup") {
    // seeded strings over base letters, precomposed chars and
    // combining marks — incl. mark-first and stacked-marks cases
    val rnd = new scala.util.Random(42)
    val pool = "abcde \u00E9\u00C5\u00F6".toVector.map(_.toString) ++
      Vector("\u0301", "\u0308", "\u030A")
    val strings = Seq.fill(200)(
      Seq.fill(rnd.nextInt(12))(pool(rnd.nextInt(pool.size))).mkString)
    val expected = strings.map(Normalizer.normalize(_, Normalizer.Form.NFC))
    assert(nfcOf(strings) === expected)
  }

  test("x105 frame: per-cohort composition counts and change flags") {
    // doc_ids 0..4 hit each injection cohort exactly once
    val docs = (0L to 4L).map(i => (i, "base text")).toDF("doc_id", "text")
    val out = TextAnalysis.unicodeNfc(docs)
      .orderBy("doc_id")
      .select("doc_id", "n_composed", "changed")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (0L, 1L, 1L),  // one decomposed é composes
      (1L, 2L, 1L),  // two umlaut pairs compose
      (2L, 0L, 0L),  // precomposed é: non-ASCII but already NFC
      (3L, 2L, 1L),  // ring + diaeresis pairs compose
      (4L, 0L, 0L))) // pure ASCII
  }
}
