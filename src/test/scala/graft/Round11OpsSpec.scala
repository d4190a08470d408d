package graft

import graft.ops.TextAnalysis

/** Pins the round-6 additions: BPE corpus encoding (x197) semantics —
  * greedy merge application, dense lexicographic subword ids, per-doc
  * assembly order. */
class Round11OpsSpec extends SparkSpec {
  import spark.implicits._

  private def docsOf(rows: (Long, String)*) =
    rows.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("bpeMergesList learns the frequency-ordered merge trajectory") {
    // vocab: abab×2, ab×1, cd×1 → pairs (a,b):5, (b,a):2, (c,d):1
    // merge1 (a,b); then (ab,ab):2 beats (c,d):1; then (c,d)
    val docs = docsOf(1L -> "abab ab", 2L -> "abab cd")
    val got = TextAnalysis.bpeMergesList(docs, iters = 3)
    assert(got === Seq((1L, "a", "b", 5L), (2L, "ab", "ab", 2L), (3L, "c", "d", 1L)))
  }

  test("bpeEncode applies learned merges and assigns dense lexicographic ids") {
    val docs = docsOf(1L -> "abab ab", 2L -> "abab cd")
    val merges = TextAnalysis.bpeMergesList(docs, iters = 3).map(m => (m._2, m._3))
    val got = TextAnalysis.bpeEncode(docs, merges)
      .as[(Long, Long, String)].collect().sortBy(_._1)
    // subword vocab after encode: ab < abab < cd → ids 0, 1, 2
    assert(got === Seq((1L, 2L, "1,0"), (2L, 2L, "1,2")))
  }

  test("bpeEncode merge application is greedy left-to-right (aaa → [aa, a])") {
    val docs = docsOf(1L -> "aaa")
    val got = TextAnalysis.bpeEncode(docs, Seq(("a", "a")))
      .as[(Long, Long, String)].collect()
    // syms: a < aa → ids a=0, aa=1; greedy non-overlapping → [aa, a]
    assert(got === Seq((1L, 2L, "1,0")))
  }

  test("bpeEncode composes merges in rank order (multi-char symbols form)") {
    val docs = docsOf(1L -> "abcd ab")
    val got = TextAnalysis.bpeEncode(docs, Seq(("a", "b"), ("ab", "c")))
      .as[(Long, Long, String)].collect()
    // abcd → [abc, d], ab → [ab]; syms ab < abc < d → 0, 1, 2
    assert(got === Seq((1L, 3L, "1,2,0")))
  }
}
