package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ops.QualityFilters._

/** Pins the corpus-quality filter semantics (Gopher rule battery, C4
  * line filters, source mixture weights) on hand-computable corpora. */
class QualityFiltersSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("x118 UniMax: small sources cap out, the rest split the freed budget evenly") {
    // sources: tiny=2 tokens, small=4, big=12, huge=18 → B=36,
    // caps (1.1 epochs, tenths) = 2, 4, 13, 19
    // walk ascending: tiny 2·4+0=8≤36 capped; small 4·3+2=14≤36 capped;
    // big 13·2+6=32≤36 capped; huge 19+19=38>36 uncapped →
    // alloc = 36−19 = 17 (floor-div by 1)
    val corpus = Seq(
      (1L, "a b", "t"), (2L, "c d e f", "s"),
      (3L, ("g " * 12).trim, "b"), (4L, ("h " * 18).trim, "h")
    ).toDF("doc_id", "text", "source")
    val out = unimaxAlloc(corpus).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("cap_tokens"), r.getAs[Long]("capped"),
          r.getAs[Long]("alloc_tokens"))).toMap
    assert(out("t") === ((2L, 1L, 2L)))
    assert(out("s") === ((4L, 1L, 4L)))
    assert(out("b") === ((13L, 1L, 13L)))
    assert(out("h") === ((19L, 0L, 17L)))
    // budget exactly exhausted here: 2+4+13+17 = 36
    assert(out.values.map(_._3).sum === 36L)
  }

  test("x115 DSIR weights separate target-like from off-target docs") {
    // target (en) docs draw from vocabulary A, others from disjoint
    // vocabulary B → an A-worded doc's features are target-typical
    // (positive log ratio), a B-worded doc's are target-atypical
    val corpus = Seq(
      (1L, "alpha beta gamma delta alpha beta", "en"),
      (2L, "alpha gamma delta beta gamma alpha", "en"),
      (3L, "omega sigma kappa zeta omega sigma", "fr"),
      (4L, "sigma zeta kappa omega zeta kappa", "zh"),
      (5L, "alpha beta gamma delta beta gamma", "es") // A-worded non-target
    ).toDF("doc_id", "text", "lang")
    val w = dsirWeights(corpus).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("log_weight"))).toMap
    assert(w.values.forall(_._1 === 6L))
    // every A-worded doc outranks every B-worded doc, regardless of
    // its own lang label (DSIR scores CONTENT against the target model)
    // (absolute signs are smoothing-dependent at this corpus size —
    // B=64 dwarfs the 30-token totals — so only the ordering is pinned)
    for (a <- Seq(1L, 2L, 5L); b <- Seq(3L, 4L))
      assert(w(a)._2 > w(b)._2, s"doc $a should outrank doc $b in $w")
  }

  test("gopher metrics on a hand-computed doc") {
    // 6 words, lengths 3+1+3+3+3+3 = 16 → mean 2.6667; stopwords:
    // the, a, the → 3 hits; distinct {the,a,big,cat,sat} = 5/6;
    // bigrams: [the a, a big, big cat, cat sat, sat the] → all
    // unique → top share 1/5 = 0.2
    val out = gopherRules(docs(1L -> "the a big cat sat the")).head()
    assert(out.getAs[Long]("n_words") === 6L)
    assert(out.getAs[Double]("mean_word_len") === 2.6667)
    assert(out.getAs[Long]("stop_hits") === 3L)
    assert(out.getAs[Double]("distinct_ratio") === 0.8333)
    assert(out.getAs[Double]("top_bigram_frac") === 0.2)
    // fails ok_words (6 < 30) and ok_mean_len (2.6667 < 3) and
    // ok_repetition (0.2 > 0.1); passes ok_stop → keep = 0
    assert(out.getAs[Long]("ok_words") === 0L)
    assert(out.getAs[Long]("ok_mean_len") === 0L)
    assert(out.getAs[Long]("ok_stop") === 1L)
    assert(out.getAs[Long]("ok_repetition") === 0L)
    assert(out.getAs[Long]("keep") === 0L)
  }

  test("gopher keep fires on a doc passing every rule") {
    // 40 distinct-ish words incl. 2 stopwords, mean length in range,
    // no dominant bigram
    val words = (1 to 38).map(i => s"word$i") ++ Seq("the", "a")
    val out = gopherRules(docs(1L -> words.mkString(" "))).head()
    assert(out.getAs[Long]("n_words") === 40L)
    assert(out.getAs[Long]("keep") === 1L)
  }

  test("top-bigram share catches a repeated-bigram doc") {
    // "x y x y x y" → bigrams [x y, y x, x y, y x, x y] → top 3/5
    val out = gopherRules(docs(1L -> "x y x y x y")).head()
    assert(out.getAs[Double]("top_bigram_frac") === 0.6)
  }

  test("c4 lines: width, terminality and blocklist by construction") {
    // doc_id=2 → w=10; 23 tokens → lines of 10/10/3. Terminal iff
    // (2+i)%4 != 0: i=0,1 terminal, i=2 (2+2=4) not — but line 2 also
    // fails MinLineWords. Line 0 contains 'slow' → dropped. So kept =
    // line 1 only (tokens at positions 11-20 = t10..t19, terminal).
    val toks = ("slow" +: (1 to 22).map(i => s"t$i")).mkString(" ")
    val out = c4LineFilters(docs(2L -> toks)).head()
    assert(out.getAs[Long]("n_lines") === 3L)
    assert(out.getAs[Long]("n_kept") === 1L)
    assert(out.getAs[Long]("n_kept_words") === 10L)
    val expected = (10 to 19).map(i => s"t$i").mkString(" ") + "."
    val fp = spark.sql(s"SELECT md5('${expected}') AS h").as[String].head()
    assert(out.getAs[String]("clean_fp") === fp)
  }

  test("c4 empty-keep doc hashes the empty string") {
    // doc_id=0, 4 tokens → one line, 4 < MinLineWords → nothing kept
    val out = c4LineFilters(docs(0L -> "a b c d")).head()
    assert(out.getAs[Long]("n_lines") === 1L)
    assert(out.getAs[Long]("n_kept") === 0L)
    val fp = spark.sql("SELECT md5('') AS h").as[String].head()
    assert(out.getAs[String]("clean_fp") === fp)
  }

  test("mixture weights normalize to ~1 and upweight small sources") {
    val df = Seq(
      (1L, Seq.fill(100)("tok").mkString(" "), "big"),
      (2L, Seq.fill(100)("tok").mkString(" "), "big"),
      (3L, Seq.fill(10)("tok").mkString(" "), "small"))
      .toDF("doc_id", "text", "source")
    val rows = mixtureWeights(df).collect().map(r =>
      r.getAs[String]("source") -> r).toMap
    assert(rows("big").getAs[Long]("n_tokens") === 200L)
    assert(rows("small").getAs[Long]("n_tokens") === 10L)
    val wBig = rows("big").getAs[Double]("weight")
    val wSmall = rows("small").getAs[Double]("weight")
    assert(math.abs(wBig + wSmall - 1.0) < 2e-4)
    // tokens ratio 20:1 but weight ratio only 20^0.3 ≈ 2.46:1
    assert(wBig / wSmall < 3.0 && wBig / wSmall > 2.0)
  }

  test("mixture sample: per-source caps fire, picks the md5-first docs") {
    // 3 equal sources × 120 docs → weight ≈ 1/3 each, n_take =
    // round(0.3333 * 200) = 67 < 120, so the cap genuinely bites
    val rows = for (s <- 0 until 3; i <- 0 until 120)
      yield ((s * 1000 + i).toLong, "a b c d e", s"src$s")
    val df = rows.toDF("doc_id", "text", "source")
    val out = mixtureSample(df).collect()
    val bySource = out.groupBy(_.getAs[String]("source"))
    assert(bySource.keySet === Set("src0", "src1", "src2"))
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String) = md.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    for ((src, picked) <- bySource) {
      val n = picked.length
      // n_take from the same weight the engine emitted
      val w = picked.head.getAs[Double]("weight")
      assert(n === math.max(1L, math.floor(w * SampleTarget + 0.5).toLong))
      // ranks are exactly 1..n
      assert(picked.map(_.getAs[Long]("rnk")).sorted.toSeq === (1L to n).toSeq)
      // and the chosen ids are the md5-order prefix of the source
      val srcIds = rows.filter(_._3 == src).map(_._1)
      val expect = srcIds.sortBy(id => (md5hex(id.toString), id)).take(n).toSet
      assert(picked.map(_.getAs[Long]("doc_id")).toSet === expect)
    }
  }

  test("classifier score replicates the scalar formula on the gopher metrics") {
    def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    val corpus = docs(
      1L -> "the a big cat sat the",
      2L -> ((1 to 34).map(i => s"word$i") ++ Seq("the", "a", "of", "and", "to", "in")).mkString(" "))
    val metrics = gopherRules(corpus).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val scored = classifierScore(corpus).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    for (id <- Seq(1L, 2L)) {
      val m = metrics(id)
      // the fixed-point assembly the operator uses: exact integer
      // micro-units (1e-5), divided once — no rounding boundary
      val zE5 = math.round(ClfBias * 100000) +
        m.getAs[Long]("n_words") * math.round(ClfWordsW * 100000) +
        m.getAs[Long]("stop_hits") * math.round(ClfStopW * 100000) +
        math.round(m.getAs[Double]("distinct_ratio") * 10000) * math.round(ClfDistinctW * 10) +
        math.round(m.getAs[Double]("mean_word_len") * 10000) * math.round(ClfMeanLenW * 10) +
        math.round(m.getAs[Double]("top_bigram_frac") * 10000) * math.round(ClfBigramW * 10)
      val z = zE5.toDouble / 100000.0
      assert(scored(id).getAs[Double]("logit") === z)
      val expectScore = r4(1.0 / (1.0 + math.exp(-z)))
      assert(scored(id).getAs[Double]("clf_score") === expectScore)
      assert(scored(id).getAs[Long]("clf_keep") === (if (expectScore >= 0.5) 1L else 0L))
    }
    // the junk doc scores below the keep line, the wordy one above it
    assert(scored(1L).getAs[Long]("clf_keep") === 0L)
    assert(scored(1L).getAs[Double]("clf_score") < scored(2L).getAs[Double]("clf_score"))
  }
}
