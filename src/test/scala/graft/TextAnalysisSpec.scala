package graft

import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis._

/** Pins the text-analysis operator semantics (beyond-reference track):
  * tokenization, shingles, language-ID argmax tie-break, quality-score
  * arithmetic, fingerprint canonicalization. */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def doc(text: String) =
    Seq((1L, text, "en")).toDF("doc_id", "text", "lang")

  test("tokens split on whitespace runs and drop empties") {
    val out = doc("  a  b\tc ").select(tokens(col("text"))).as[Seq[String]].head()
    assert(out === Seq("a", "b", "c"))
  }

  test("shingles are distinct word trigrams; short docs yield empty") {
    val out = doc("a b c d a b c d").select(shingles(tokens(col("text"))))
      .as[Seq[String]].head()
    assert(out.toSet === Set("a b c", "b c d", "c d a", "d a b"))
    val short = doc("a b").select(shingles(tokens(col("text")))).as[Seq[String]].head()
    assert(short === Seq.empty)
  }

  test("bpe count: letter runs, digit runs, single symbols") {
    val out = doc("Hello, wor1d!").select(bpeCount(col("text"))).as[Int].head()
    // hello / , / wor / 1 / d / !
    assert(out === 6)
  }

  test("langId argmax ties break to the earlier marker list") {
    // "the" (en) and "key" (es) tie at 1-1 → en wins; "key value" alone → es
    assert(doc("the key").select(langId(tokens(col("text")))).as[String].head() === "en")
    assert(doc("key value").select(langId(tokens(col("text")))).as[String].head() === "es")
    assert(doc("spark hash scan").select(langId(tokens(col("text")))).as[String].head() === "zh")
  }

  test("quality score arithmetic") {
    // 4 tokens, 1 stopword ("the"), 0 punct, 15 chars
    val q = doc("the quick brown fox").select(qualityScore(col("text"), tokens(col("text"))))
      .as[Double].head()
    val raw = math.min(1.0, 4 / 100.0) * 0.4 + (1.0 / 4) * 0.3 + (1.0 - 0.0) * 0.3
    val expected = math.floor(raw * 10000 + 0.5) / 10000 // Portable.round4
    assert(q === expected)
  }

  test("fingerprint canonicalizes case and whitespace") {
    val a = doc("Hello   World").select(fingerprint(col("text"))).as[String].head()
    val b = doc(" hello world ").select(fingerprint(col("text"))).as[String].head()
    assert(a === b)
  }
}
