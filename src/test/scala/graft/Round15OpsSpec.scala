package graft

import org.apache.spark.sql.functions._

import graft.ops.Multimodal

/** Pins the round-10 additions that aren't oracle-expressible by
  * construction: the perceptual image hash's bit semantics (x242) and
  * the banded near-dup join's candidate algebra (x243). */
class Round15OpsSpec extends SparkSpec {
  import spark.implicits._

  private def media(texts: (Long, String)*) =
    Multimodal.mediaTable(texts.toDF("doc_id", "text"))

  test("x242 aHash: constant payload hashes to all-zero bits") {
    // 64 identical bytes: every cell mean EQUALS the global mean, and
    // the bit rule is strictly-greater — no bit set
    val sig = Multimodal.ahashSignatures(media(1L -> ("a" * 64)))
      .select("ahash").as[String].head()
    assert(sig === "0000000000000000")
  }

  test("x242 aHash: a bright half sets exactly the low 32 bits") {
    // cells 0..31 average 'z' (122), cells 32..63 average 'a' (97);
    // the global mean sits between, so bits 0..31 set → words 0 and 1
    // are 0xffff, words 2 and 3 zero; hex prints words 3..0
    val sig = Multimodal.ahashSignatures(media(1L -> ("z" * 32 + "a" * 32)))
      .select("ahash").as[String].head()
    assert(sig === "00000000ffffffff")
  }

  test("x242 aHash: sub-grid payloads are dropped, format detected from magic") {
    val rows = Multimodal.ahashSignatures(media(
      1L -> ("q" * 63), // payload < 64 B: no meaningful hash
      2L -> ("The quick brown fox jumps over the lazy dog, twice over. " * 3)))
      .select("doc_id", "fmt", "n_bytes").as[(Long, String, Long)].collect()
    assert(rows.map(_._1).toSet === Set(2L))
    assert(Set("png", "webp", "jpeg").contains(rows.head._2))
    assert(rows.head._3 === ("The quick brown fox jumps over the lazy dog, twice over. " * 3).length.toLong)
  }

  test("x243 near-dup pairs: identical payloads pair at Hamming 0, distant ones don't") {
    val a = "The quick brown fox jumps over the lazy dog and keeps running. " * 2
    // same byte grid → same signature regardless of the md5 format class
    val got = Multimodal.ahashNearDupPairs(media(1L -> a, 2L -> a,
      3L -> ("zzzzzzzzaaaaaaaa" * 8)))
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 2L, 0L)))
  }

  test("x244 block-max: lossless and at least as tight as the global split") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val rows = graft.ops.Search.blockMaxAudit(docs)
      .select("query", "n_candidates", "n_candidates_bm",
        "pruned_frac", "pruned_frac_bm", "n_exact", "hits")
      .as[(String, Long, Long, Double, Double, Long, Long)].collect()
    assert(rows.nonEmpty)
    for ((q, nc, ncbm, pf, pfbm, ne, h) <- rows) {
      // the block pass only removes candidates — never adds
      assert(ncbm <= nc, s"$q: block-max grew the candidate set")
      assert(pfbm >= pf, s"$q: block-max loosened the cut")
      // and the cut is EXACT: the pruned top-k is the unpruned top-k
      assert(h === ne, s"$q: block-max lost a top-k doc ($h of $ne)")
    }
    // the per-block ceilings genuinely tighten somewhere on this
    // fixture (the point of storing them)
    assert(rows.exists { case (_, nc, ncbm, _, _, _, _) => ncbm < nc },
      "block-max never improved on the global ub — blocks too coarse?")
  }

  test("x245 streamed view == from-scratch v3 aggregate (three epochs of deltas)") {
    val dir = "/root/testdata/sf0.001"
    val streamed = graft.streaming.EventStream.streamIncrementalMv(spark, dir)
      .as[(String, Long, Long)].collect().map { case (l, n, c) => l -> ((n, c)) }.toMap
    // from-scratch v3 state: bucket-1 update (+1000), offset inserts
    // of bucket-1 seeds, mod-7 deletes of ORIGINAL keys only
    val d0 = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val nb = graft.sources.TxnLog.NumBuckets
    val expect = d0.filter(col("doc_id") % 7 =!= 0)
      .withColumn("n_chars", col("n_chars") +
        when(col("doc_id") % nb === 1, 1000L).otherwise(0L))
      .unionByName(d0.filter(col("doc_id") % nb === 1)
        .withColumn("n_chars", col("n_chars") + 1000L))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("c"))
      .as[(String, Long, Long)].collect().map { case (l, n, c) => l -> ((n, c)) }.toMap
    assert(streamed === expect)
  }

  test("x246 beam frontier: recall is non-decreasing in beam width") {
    val dir = "/root/testdata/sf0.001"
    val vs = graft.ops.Similarity.vectors(
      graft.sources.Tables.embeddings(spark, dir))
    val cents = graft.ops.Similarity.kmeansCentroids(vs)
    val knn = graft.ops.Similarity.knnGraphFrom(vs, cents)
    val rows = graft.ops.Similarity.graphAnnBeamFrontier(vs, cents, knn)
      .select("beam", "mean_recall").as[(Long, Double)].collect()
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq ===
      graft.ops.Similarity.GraphAnnBeamSweep.map(_.toLong))
    // a wider beam keeps a superset of frontier candidates per round —
    // recall can only improve or saturate
    rows.sliding(2).foreach { case Array((b1, r1), (b2, r2)) =>
      assert(r2 >= r1, s"recall fell from $r1 (beam $b1) to $r2 (beam $b2)")
    }
  }

  test("x247 audio fingerprint: silence hashes to zero, a loud half sets low bits") {
    // "silence": constant samples → every cell's energy equals the
    // mean → no bit (the x242 constant-payload property on PCM)
    def audio(texts: (Long, String)*) =
      Multimodal.audioTable(texts.toDF("doc_id", "text"))
    val quiet = "aa" * 64 // 64 identical samples
    val half = ("za" * 32) + ("aa" * 32) // loud first half, 64 samples
    val got = Multimodal.audioFingerprintSignatures(
      audio(1L -> quiet, 2L -> half, 3L -> "aa")) // doc 3: sub-grid, dropped
      .select("doc_id", "n_samples", "fp")
      .as[(Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(!got.contains(3L))
    assert(got(1L) === ((1L, 64L, "0000000000000000")))
    assert(got(2L)._2 === 64L)
    assert(got(2L)._3 === "00000000ffffffff")
  }

  test("x248 audio near-dups: identical clips pair at Hamming 0") {
    def audio(texts: (Long, String)*) =
      Multimodal.audioTable(texts.toDF("doc_id", "text"))
    val clip = "The quick brown fox jumps over the lazy dog and keeps running." * 3
    val pairs = Multimodal.audioNearDupPairs(
      audio(1L -> clip, 2L -> clip, 3L -> ("za" * 120)))
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L, 0L)))
  }

  test("x243 pigeonhole: a one-band corruption still pairs, all-band corruption doesn't") {
    val base = "z" * 32 + "a" * 32 // bits 0..31 set
    // flip bits only in word 0's cells: vary the first 8 bytes so some
    // low bits differ while words 1..3 stay identical → band agreement
    // on 3 of 4 bands keeps the pair as a candidate
    val oneBand = "z" * 4 + "a" * 4 + "z" * 24 + "a" * 32
    val pairs = Multimodal.ahashNearDupPairs(media(1L -> base, 2L -> oneBand))
      .as[(Long, Long, Long)].collect()
    assert(pairs.length === 1 && pairs.head._3 > 0L &&
      pairs.head._3 <= Multimodal.AHashHammingMax)
  }
}
