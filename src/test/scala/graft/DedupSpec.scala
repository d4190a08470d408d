package graft

import org.apache.spark.sql.functions._

import graft.ops.Dedup._

/** Pins dedup semantics: exact groups, MinHash/LSH recall on planted
  * near-dups, SimHash locality, Jaccard math. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", "en"),
    (2L, "THE  QUICK  brown fox jumps over the lazy dog", "en"), // ≠ exact (case), near-dup
    (3L, "the quick brown fox jumps over the lazy dog", "en"),   // exact dup of 1
    (4L, "completely different words about spark engines here", "en"),
    (5L, "completely different words about spark engines here now", "en") // near-dup of 4
  ).toDF("doc_id", "text", "lang")

  test("exactDedup groups canonically-equal texts, keeps min doc_id") {
    val out = exactDedup(docs).select("keep_doc_id", "n_copies")
      .as[(Long, Long)].collect().toSet
    // 1≡2≡3 after lower+ws-collapse; 4 and 5 are singletons
    assert(out === Set((1L, 3L), (4L, 1L), (5L, 1L)))
  }

  test("spanDedup finds cross-doc and within-doc repeated token spans") {
    // span width is SpanTokens = 8; the shared 8-token run sits at
    // pos 0 of doc 1 and pos 2 of doc 2; doc 3 repeats its own first
    // 8 tokens at pos 8; doc 4 is too short to window at all
    val docs = Seq(
      (1L, "a b c d e f g h x y z", "en"),
      (2L, "q r a b c d e f g h", "en"),
      (3L, "p1 p2 p3 p4 p5 p6 p7 p8 p1 p2 p3 p4 p5 p6 p7 p8", "en"),
      (4L, "too short to span", "en")
    ).toDF("doc_id", "text", "lang")
    val out = spanDedup(docs)
      .select("n_occurrences", "n_docs", "keep_doc_id", "keep_pos")
      .as[(Long, Long, Long, Long)].collect().toSet
    // exactly two duplicated spans: "a b c d e f g h" (docs 1+2,
    // keeper = doc 1 pos 0) and "p1..p8" (doc 3 twice, keeper pos 0);
    // every other window (incl. doc 3's interior cyclic shifts) is
    // unique and filtered
    assert(out === Set((2L, 2L, 1L, 0L), (2L, 1L, 3L, 0L)))
  }

  test("spanCleanText keeps the canonical occurrence, cuts the rest") {
    // same fixture as the spanDedup test: "a b c d e f g h" is shared
    // (keeper doc 1 pos 0), doc 3 repeats its own first 8 tokens
    val docs = Seq(
      (1L, "a b c d e f g h x y z", "en"),
      (2L, "q r a b c d e f g h", "en"),
      (3L, "p1 p2 p3 p4 p5 p6 p7 p8 p1 p2 p3 p4 p5 p6 p7 p8", "en"),
      (4L, "too short to span", "en")
    ).toDF("doc_id", "text", "lang")
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val out = spanCleanText(docs)
      .select("doc_id", "n_toks", "n_removed", "clean_fp")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    graft.ops.Caching.reapTemps()
    // keeper doc: untouched
    assert(out(1L) === ((11L, 0L, m("a b c d e f g h x y z"))))
    // non-keeper cross-doc occurrence: its 8 covered tokens are cut
    assert(out(2L) === ((10L, 8L, m("q r"))))
    // within-doc repeat: second occurrence cut, first kept
    assert(out(3L) === ((16L, 8L, m("p1 p2 p3 p4 p5 p6 p7 p8"))))
    // window-less doc passes through whole
    assert(out(4L) === ((4L, 0L, m("too short to span"))))
  }

  test("minhash LSH finds planted near-dup pairs and self-consistent jaccard") {
    val pairs = minhashNearDupPairs(docs, threshold = 0.3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // identical docs always share all bands
    assert(pairs.contains((1L, 3L)))
    // 4 vs 5 share 4 of 6 distinct shingles (j = 4/8 = 0.5 ≥ 0.3) — found
    // unless all 4 bands miss; with identical minhashes on shared
    // shingles the first bands match.
    assert(pairs.contains((4L, 5L)))
  }

  test("jaccard is intersection over union of distinct sets") {
    val j = docs.limit(0).sparkSession.range(1)
      .select(jaccard(typedLit(Seq("a", "b", "c")), typedLit(Seq("b", "c", "d"))))
      .as[Double].head()
    assert(j === 0.5)
  }

  test("simhash: identical docs get identical hashes; signatures in 16-bit range") {
    val sigs = simhashSignatures(docs).select("doc_id", "simhash")
      .as[(Long, Long)].collect().toMap
    assert(sigs(1L) === sigs(3L))
    assert(sigs.values.forall(s => s >= 0 && s < (1L << 16)))
  }

  test("simhash pairs include hamming-0 exact dups") {
    val pairs = simhashNearDupPairs(docs)
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Long)].collect()
    assert(pairs.exists { case (a, b, h) => a == 1L && b == 3L && h == 0L })
  }

  test("maxBucket guard drops degenerate buckets (exact dups share all bands)") {
    // docs 1 and 3 are identical → their 4 band buckets each hold ≥2
    // rows; capping at 1 removes every candidate pair they generate
    val capped = minhashNearDupPairs(docs, threshold = 0.0, maxBucket = 1)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(!capped.contains((1L, 3L)))
    val uncapped = minhashNearDupPairs(docs, threshold = 0.0)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(uncapped.contains((1L, 3L)))
  }

  test("default bucket cap keeps a boilerplate-heavy corpus sub-quadratic") {
    // 200 copies of one boilerplate text + one planted near-dup pair.
    // Uncapped LSH would emit 200·199/2 = 19900 boilerplate candidate
    // pairs; with the default MaxBucket cap those buckets (size 200)
    // are dropped wholesale while the planted pair's buckets (size 2)
    // survive. Exact dedup (x4) remains the channel that reports the
    // identical copies.
    val boiler = (1 to 200).map(i => (1000L + i,
      "standard legal disclaimer text repeated across every document in this corpus", "en"))
    val planted = Seq(
      (1L, "completely different words about spark engines here", "en"),
      (2L, "completely different words about spark engines here now", "en"))
    val corpus = (boiler ++ planted).toDF("doc_id", "text", "lang")
    val pairs = minhashNearDupPairs(corpus, threshold = 0.3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), "planted near-dup must survive the cap")
    assert(!pairs.exists { case (a, b) => a > 1000L || b > 1000L },
      "no boilerplate pair may be emitted — their buckets exceed MaxBucket")
  }

  test("candidates-only LSH variant emits identical pairs to the default") {
    // fixture docs + the real sf0.001 documents table: the slim variant
    // must reproduce (doc_a, doc_b, jaccard) exactly — same candidates,
    // same verify values — differing only in what rides the shuffle
    for (d <- Seq(docs, spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))) {
      val full = minhashNearDupPairs(d).as[(Long, Long, Double)].collect().toSet
      val slim = minhashNearDupPairsSlim(d).as[(Long, Long, Double)].collect().toSet
      assert(slim === full)
    }
  }

  test("exact inverted-index jaccard ⊇ LSH pairs and matches brute force") {
    val brute = jaccardPairsBrute(docs, 0.3).as[(Long, Long, Double)].collect().toSet
    val exact = jaccardPairsExact(docs, 0.3).as[(Long, Long, Double)].collect().toSet
    // no shingle here exceeds MaxShingleDf, so the inverted index is complete
    assert(exact === brute)
    val lsh = minhashNearDupPairs(docs, 0.3).as[(Long, Long, Double)].collect().toSet
    assert(lsh.subsetOf(exact))
  }

  test("MaxShingleDf cap drops boilerplate-only overlap by design; uncapped is exact") {
    // ADVICE r2: pin the documented loss semantics on a corpus where
    // the cap actually fires (fixtures never reach df > 128). All
    // MaxShingleDf+12 boilerplate docs are identical → every shingle's
    // df exceeds the cap → zero postings → NO pairs, even for
    // identical twins (exact dedup is the channel that reports them).
    // A planted low-df near-dup pair must still be found, and lifting
    // the cap makes the method truly exact all-pairs.
    val n = MaxShingleDf + 12
    val boiler = (1 to n).map(i => (1000L + i,
      "identical boilerplate text shared by every single document in this corpus today", "en"))
    val planted = Seq(
      (1L, "completely different words about spark engines here", "en"),
      (2L, "completely different words about spark engines here now", "en"))
    val corpus = (boiler ++ planted).toDF("doc_id", "text", "lang")
    val capped = jaccardPairsExact(corpus, 0.3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(capped === Set((1L, 2L)),
      "under the cap: planted pair only; boilerplate pairs dropped wholesale")
    val uncapped = jaccardPairsExact(corpus, 0.3, maxDf = Int.MaxValue)
      .filter(col("doc_a") > 1000L).count()
    assert(uncapped === n.toLong * (n - 1) / 2,
      "cap lifted: all boilerplate pairs reappear — the drop was the cap, nothing else")
  }

  test("dupClusters: connected components carry min doc_id, singletons excluded") {
    // 1≡3 (exact) cluster; 4~5 near-dup cluster; 2 joins {1,3} via
    // case-insensitive near-dup; unpaired docs don't appear
    val out = dupClusters(docs).select("doc_id", "cluster_id", "n_members")
      .as[(Long, Long, Long)].collect().toSet
    val byDoc = out.map { case (d, c, _) => d -> c }.toMap
    assert(byDoc(1L) === byDoc(3L))
    assert(byDoc(4L) === byDoc(5L))
    assert(byDoc(4L) === 4L, "cluster label is the component's min doc_id")
    // transitivity: every member of a cluster reports the same size
    assert(out.groupBy(_._2).forall { case (_, ms) => ms.map(_._3).size == 1 })
  }

  test("dupClusters converges on a chain longer than one hop") {
    // a → b → c → d chain of near-dups (each adjacent pair shares most
    // shingles, ends share few): min label must propagate the full path
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val toks = base.split(" ")
    val chain = (0 to 3).map { i =>
      (10L + i, (toks.drop(i * 2) ++ toks.take(i * 2)).take(8).mkString(" "), "en")
    }.toDF("doc_id", "text", "lang")
    val out = dupClusters(chain, maxIters = 20)
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toMap
    // whatever the pair graph looks like, labels must be a fixpoint:
    // every doc's cluster equals the min over its component
    val pairs = minhashNearDupPairs(chain).select("doc_a", "doc_b")
      .as[(Long, Long)].collect()
    pairs.foreach { case (a, b) => assert(out(a) === out(b)) }
  }

  test("incrementalNew admits only unseen-fingerprint batch docs, min-id per group") {
    // batch = ids % 3 == 0: doc 3 duplicates state doc 1 (blocked),
    // docs 6+9 are identical new texts (collapse to min id 6), doc 12 new
    val corpus = Seq(
      (1L, "seen text one", "en"), (2L, "seen text two", "en"),
      (3L, "seen  TEXT one", "en"),          // canonical dup of state doc 1
      (6L, "fresh batch text", "en"),
      (9L, "FRESH  batch text", "en"),       // canonical dup within batch
      (12L, "another new document", "en")
    ).toDF("doc_id", "text", "lang")
    val out = incrementalNew(corpus).select("doc_id", "n_batch_copies")
      .as[(Long, Long)].collect().toSet
    assert(out === Set((6L, 2L), (12L, 1L)))
  }

  test("contamination flags test docs copying train docs") {
    // find ids landing in the needed splits (split is md5-bucketed)
    def bucket(id: Long) = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"split:$id".getBytes("UTF-8"))
      (java.lang.Long.parseLong(h.take(2).map("%02x".format(_)).mkString, 16) % 100).toInt
    }
    val trainId = (0L to 500L).find(bucket(_) < 80).get
    val train2Id = (0L to 500L).filter(bucket(_) < 80).drop(1).head
    val testId = (0L to 500L).find(bucket(_) >= 90).get
    val leaked = "one two three four five six seven eight"
    val corpus = Seq(
      (trainId, leaked, "en"),
      (train2Id, "totally different words appear in this training document", "en"),
      (testId, leaked, "en") // verbatim leak of the train doc
    ).toDF("doc_id", "text", "lang")
    val out = contamination(corpus).select("test_doc", "train_doc", "n_shared")
      .as[(Long, Long, Long)].collect().toSet
    assert(out === Set((testId, trainId, 6L))) // 8 tokens → 6 shared trigrams
  }

  test("brute jaccard pairs match LSH-verified pairs at the same threshold") {
    val brute = jaccardPairsBrute(docs, 0.5).select("doc_a", "doc_b")
      .as[(Long, Long)].collect().toSet
    val lsh = minhashNearDupPairs(docs, 0.5).select("doc_a", "doc_b")
      .as[(Long, Long)].collect().toSet
    // LSH ⊆ brute (verification step guarantees no false positives)
    assert(lsh.subsetOf(brute))
    assert(brute.contains((1L, 3L)))
  }

  test("x111 containment is asymmetric: subset flags src->superset only") {
    // A's 2 shingles all occur in B (A = B's prefix); B has 4 shingles
    // so B->A containment is 0.5 and must NOT appear at tau = 0.8
    val corpus = Seq(
      (1L, "a b c d", "en"),                 // subset doc
      (2L, "a b c d e f", "en"),             // superset doc
      (3L, "x y z w v", "en"),               // unrelated
      (4L, "x y z w v", "en")                // exact dup of 3
    ).toDF("doc_id", "text", "lang")
    val out = containmentPairs(corpus)
      .as[(Long, Long, Double)].collect().toSet
    assert(out === Set((1L, 2L, 1.0), (3L, 4L, 1.0), (4L, 3L, 1.0)))
  }

  test("x111 containment values are exact under the df cap") {
    // capped candidates may be dropped, but emitted values must come
    // from FULL shingle sets: uncapped is a superset with equal values
    val docs17 = (1L to 17L).map(i => (i, s"common ngram here tail$i", "en"))
    val corpus = (docs17 :+ ((100L, "common ngram here", "en")))
      .toDF("doc_id", "text", "lang")
    val capped = containmentPairs(corpus, maxDf = 16)
      .as[(Long, Long, Double)].collect().toSet
    val uncapped = containmentPairs(corpus, maxDf = Int.MaxValue)
      .as[(Long, Long, Double)].collect().toSet
    assert(capped.subsetOf(uncapped))
    // doc 100's only shingle "common ngram here" has df 18 > 16: with
    // the cap it can't be a candidate, without it C(100 -> i) = 1.0
    assert(!capped.exists(_._1 == 100L))
    assert(uncapped.count(_._1 == 100L) === 17)
  }
}
