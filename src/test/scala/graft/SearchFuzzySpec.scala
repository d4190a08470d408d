package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Fuzzy, Search, Similarity}

/** Pins the round-3 corpus operators: CDC segment dedup semantics,
  * blocked fuzzy matching, BM25 ranking, and centroid-blocked
  * semantic dedup. */
class SearchFuzzySpec extends SparkSpec {
  import spark.implicits._

  test("cdcSegments: boundaries are shift-invariant around anchor tokens") {
    // "hash" is an anchor in the fixture vocabulary (tokenHash16 % 8 == 0).
    // Prepending a token must NOT change the segments after the anchor.
    val docs = Seq(
      (1L, "alpha beta hash gamma delta", "en"),
      (2L, "extra alpha beta hash gamma delta", "en")
    ).toDF("doc_id", "text", "lang")
    val segs = Dedup.cdcSegments(docs)
      .select("doc_id", "seg_text").as[(Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // "gamma" is an anchor too — segments after the first anchor are
    // ("hash", "gamma delta") in BOTH docs despite the prepended token
    assert(segs(1L).intersect(Set("hash", "gamma delta")) === Set("hash", "gamma delta"))
    assert(segs(2L).intersect(Set("hash", "gamma delta")) === Set("hash", "gamma delta"),
      "prepended token must not shift the anchored segments")
  }

  test("segmentDedup removes shared long segments from every doc, keeps short ones") {
    // shared 3-token run behind the anchor appears in two docs → dup;
    // doc 3 has no shared segment → clean
    val docs = Seq(
      (1L, "alpha beta hash gamma delta epsilon", "en"),
      (2L, "zeta hash gamma delta epsilon", "en"),
      (3L, "alpha beta unique words only", "en")
    ).toDF("doc_id", "text", "lang")
    val out = Dedup.segmentDedup(docs)
      .select("doc_id", "n_segs", "n_dup_segs")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L)._2 >= 1L, "doc 1 carries the duplicated anchored segment")
    assert(out(2L)._2 >= 1L, "doc 2 carries it too — all copies removed")
    assert(out(3L)._2 === 0L, "unique doc loses nothing")
    // clean_fp of a doc with zero dup segments = md5 of its full
    // segment-joined text; for doc 3 that's the original text
    val fp3 = Dedup.segmentDedup(docs).filter(col("doc_id") === 3)
      .select("clean_fp").as[String].head()
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("alpha beta unique words only".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(fp3 === expected)
  }

  test("fuzzyNameMatch finds near names within blocks only, respects distance cap") {
    val parts = Seq(
      (1L, "cold ring"), (2L, "old ring"), (3L, "bold ring"),
      (4L, "cold gear"), (5L, "totally different ring")
    ).toDF("p_partkey", "p_name")
    val out = Fuzzy.fuzzyNameMatch(parts)
      .select("name_a", "name_b", "dist").as[(String, String, Long)].collect().toSet
    assert(out.contains(("cold ring", "old ring", 1L)))
    assert(out.contains(("bold ring", "cold ring", 1L)))
    assert(out.contains(("bold ring", "old ring", 1L)))
    // cross-block pair never compared ("cold gear" blocks under gear)
    assert(!out.exists { case (a, b, _) => a.contains("gear") || b.contains("gear") })
    // same block but > MaxEditDist apart: excluded by the length filter
    assert(!out.exists { case (a, b, _) => a.startsWith("totally") || b.startsWith("totally") })
  }

  test("bm25Search: exact-match docs rank above partial matches, k respected") {
    val docs = Seq(
      (1L, "spark join fast spark join", "en"),   // all three q_spark_join terms, high tf
      (2L, "spark alpha beta gamma delta", "en"), // one term
      (3L, "alpha beta gamma delta epsilon", "en") // no terms
    ).toDF("doc_id", "text", "lang")
    val out = Search.bm25Search(docs)
      .filter(col("query") === "q_spark_join")
      .select("doc_id", "rnk").as[(Long, Long)].collect().toMap
    assert(out(1L) === 1L, "doc with every term and max tf ranks first")
    assert(out(2L) === 2L)
    assert(!out.contains(3L), "docs with no query term never appear")
    val big = (1L to 30L).map(i => (i, s"spark doc number $i", "en"))
      .toDF("doc_id", "text", "lang")
    assert(Search.bm25Search(big).filter(col("query") === "q_spark_join").count()
      === Search.TopK.toLong)
  }

  test("wav audio: synthesized streams parse to the injected header fields") {
    import graft.ops.Multimodal
    val docs = Seq((7L, "0123456789", "en")).toDF("doc_id", "text", "lang") // 10 bytes
    val m = Multimodal.audioMeta(spark, docs).collect().head
    // len=10 → channels = 1, rate = 8000 + 2*1000 = 10000, block 2
    assert(m === graft.ops.AudioMeta(7L, 54L, 10000L, 1L, 16L, 5L, 0L))
    val odd = Seq((8L, "01234567890", "en")).toDF("doc_id", "text", "lang") // 11 bytes
    val m2 = Multimodal.audioMeta(spark, odd).collect().head
    // len=11 → channels 2, rate 11000, block 4, samples 2, dur 0
    assert(m2.channels === 2L && m2.sample_rate === 11000L && m2.n_samples === 2L)
    // non-WAV bytes refuse loudly
    assert(Multimodal.parseWavHeader(1L, Array.fill[Byte](64)(0)) === None)
  }

  test("semanticDupPairs ⊆ brute pairs; within-cell high-cosine pairs survive") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val sem = Similarity.semanticDupPairs(embs)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val brute = Similarity.embeddingNearDupBrute(embs)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(sem.subsetOf(brute), "centroid blocking may miss pairs, never invent them")
    assert(sem.nonEmpty, "the fixture's near-dup pairs include same-cell ones")
  }
}
