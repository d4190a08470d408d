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

  private def corpus = Seq(
    (1L, "spark data spark", "en"),
    (2L, "spark tools", "en"),
    (3L, "other words", "en")
  ).toDF("doc_id", "text", "lang")

  test("vocabIdf: df counts docs, cf counts occurrences, idf = ln((N+1)/(df+1))") {
    val out = vocabIdf(corpus).select("tok", "df", "cf", "idf")
      .as[(String, Long, Long, Double)].collect()
      .map { case (t, df, cf, idf) => t -> ((df, cf, idf)) }.toMap
    def idf4(df: Long) = math.floor(math.log(4.0 / (df + 1)) * 10000 + 0.5) / 10000
    assert(out("spark") === ((2L, 3L, idf4(2))))
    assert(out("tools") === ((1L, 1L, idf4(1))))
    assert(out.size === 5)
  }

  test("tfidfTopTerms ranks tf·idf per doc with token tie-break") {
    val top1 = tfidfTopTerms(corpus, k = 1)
      .select("doc_id", "tok").as[(Long, String)].collect().toMap
    // doc 1: rarer "data" (1·ln(4/2) ≈ 0.693) beats frequent "spark"
    // (2·ln(4/3) ≈ 0.575) — idf downweights corpus-common terms
    assert(top1(1L) === "data")
    // doc 3: "other" vs "words" tie on tf·idf → token asc
    assert(top1(3L) === "other")
  }

  test("stratifiedSample: k hash-smallest per stratum, dense ranks, stable") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = stratifiedSample(docs, k = 20)
      .select("lang", "doc_id", "rnk").as[(String, Long, Long)].collect()
    val langSizes = docs.groupBy(col("lang")).count()
      .as[(String, Long)].collect().toMap
    val byLang = out.groupBy(_._1)
    byLang.foreach { case (lang, rows) =>
      assert(rows.length === math.min(20L, langSizes(lang)).toInt)
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.length).toSeq, "dense ranks")
    }
    val again = stratifiedSample(docs, k = 20)
      .select("lang", "doc_id", "rnk").as[(String, Long, Long)].collect()
    assert(out.toSet === again.toSet, "deterministic")
  }

  test("packBins packs contiguous docs into token-budget bins per shard") {
    val docs = Seq(
      (1L, "a b c", "en"),    // 3 toks, starts at 0 → bin 0
      (2L, "d e f g", "en"),  // starts at 3 < 5 → still bin 0 (overflows budget, by design)
      (3L, "h i", "en"),      // starts at 7 → bin 1
      (4L, "j", "fr")         // separate shard packs independently
    ).toDF("doc_id", "text", "lang")
    val out = packBins(docs, budget = 5)
      .select("lang", "bin", "n_docs", "bin_tokens", "first_doc", "last_doc")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(out === Set(
      ("en", 0L, 2L, 7L, 1L, 2L),
      ("en", 1L, 1L, 2L, 3L, 3L),
      ("fr", 0L, 1L, 1L, 4L, 4L)))
  }

  test("lmScore: common phrasing scores lower NLL than rare phrasing") {
    // bigram counts: (a,b)x2, (a,c)x1; c1(a)=3; V=3
    val docs = Seq(
      (1L, "a b", "en"), (2L, "a b", "en"), (3L, "a c", "en")
    ).toDF("doc_id", "text", "lang")
    val out = lmScore(docs).select("doc_id", "n_bigrams", "nll")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    def fp(x: Double) = math.floor(x * 1e7) / 1e7 // the portable fixed-point grid
    assert(out(1L) === ((1L, r4(-fp(math.log(3.0 / 6))))))
    assert(out(3L) === ((1L, r4(-fp(math.log(2.0 / 6))))))
    assert(out(1L)._2 < out(3L)._2, "repeated phrase is more likely under the corpus LM")
  }

  test("repetitionStats flags repeated tokens and bigrams; 1-token docs are total") {
    val docs = Seq((1L, "a a a b", "en"), (2L, "x", "en"))
      .toDF("doc_id", "text", "lang")
    val out = repetitionStats(docs)
      .select("doc_id", "distinct_frac", "top_tok_frac", "top_bigram_frac")
      .as[(Long, Double, Double, Double)].collect().map(r => r._1 -> r).toMap
    // doc 1: 4 tokens, 2 distinct; top "a"=3; bigrams (a,a)x2 (a,b)x1
    assert(out(1L) === ((1L, 0.5, 0.75, math.floor(2.0 / 3 * 10000 + 0.5) / 10000)))
    assert(out(2L) === ((2L, 1.0, 1.0, 0.0)))
  }

  test("splitAssign is deterministic, content-addressed, and ~80/10/10") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = splitAssign(docs).select("doc_id", "split").as[(Long, String)].collect()
    val byId = out.toMap
    val again = splitAssign(docs).select("doc_id", "split").as[(Long, String)].collect()
    assert(byId === again.toMap, "stable across runs")
    val frac = out.groupBy(_._2).view.mapValues(_.length.toDouble / out.length).toMap
    assert(math.abs(frac("train") - 0.8) < 0.08)
    assert(math.abs(frac("val") - 0.1) < 0.05)
    assert(math.abs(frac("test") - 0.1) < 0.05)
    // adding docs never reassigns existing ones (content-addressed)
    val half = splitAssign(docs.filter(col("doc_id") < 250))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(half.forall { case (id, s) => byId(id) == s })
  }

  test("x110 scriptProfile: injected scripts dominate, counts reconcile") {
    // doc_id picks the cohort: 0 -> Cyrillic, 1 -> Han, 2 -> accented
    // Latin + digits, 3 -> pure ASCII
    val out = scriptProfile(Seq(
      (0L, "ab"), (1L, "ab"), (2L, "ab"), (3L, "ab, c!"))
      .toDF("doc_id", "text")).orderBy("doc_id").collect()

    val cyr = out(0)
    assert(cyr.getAs[Long]("n_latin") === 2L)        // just "ab"
    assert(cyr.getAs[Long]("n_cyrillic") === 9L)     // privet(6) + mir(3)
    assert(cyr.getAs[String]("main_script") === "Cyrillic")

    val han = out(1)
    assert(han.getAs[Long]("n_han") === 6L)
    assert(han.getAs[String]("main_script") === "Han")
    // ASCII = "ab" + the two injected separator spaces
    assert(han.getAs[Long]("n_ascii") === 4L)

    val acc = out(2)
    // e-acute and u-umlaut are Latin SCRIPT but not ASCII
    assert(acc.getAs[Long]("n_latin") === 12L)
    assert(acc.getAs[Long]("n_digit") === 4L)
    assert(acc.getAs[Long]("n_ascii") === acc.getAs[Long]("n_chars") - 2L)
    assert(acc.getAs[String]("main_script") === "Latin")

    val ascii = out(3)
    assert(ascii.getAs[Long]("n_ascii") === ascii.getAs[Long]("n_chars"))
    assert(ascii.getAs[Long]("n_other") === 2L)      // ',' and '!'

    // the remainder identity holds on every row
    out.foreach { r =>
      assert(r.getAs[Long]("n_other") ===
        r.getAs[Long]("n_chars") - r.getAs[Long]("n_latin") -
        r.getAs[Long]("n_cyrillic") - r.getAs[Long]("n_han") -
        r.getAs[Long]("n_digit") - r.getAs[Long]("n_space"))
    }
  }

  test("x112 chunkDocs: sliding windows tile the doc with the stated overlap") {
    // 100 tokens, width 64, stride 48 -> starts 0, 48, 96
    val toks100 = (0 until 100).map(i => s"t$i").mkString(" ")
    val out = chunkDocs(Seq((1L, toks100)).toDF("doc_id", "text"))
      .orderBy("chunk_idx").collect()
    assert(out.map(_.getAs[Long]("chunk_idx")).toSeq === Seq(0L, 1L, 2L))
    assert(out.map(_.getAs[Long]("tok_start")).toSeq === Seq(0L, 48L, 96L))
    assert(out.map(_.getAs[Long]("n_chunk_tokens")).toSeq === Seq(64L, 52L, 4L))
    // consecutive chunks overlap by width - stride = 16 tokens
    val c0 = out(0).getAs[String]("chunk_text").split(" ")
    val c1 = out(1).getAs[String]("chunk_text").split(" ")
    assert(c0.takeRight(16).toSeq === c1.take(16).toSeq)
    // every token appears in at least one chunk
    assert(out.flatMap(_.getAs[String]("chunk_text").split(" ")).toSet.size === 100)
  }

  test("x112 chunkDocs: short docs get exactly one whole-doc chunk") {
    val out = chunkDocs(Seq((1L, "a b c"), (2L, "  ")).toDF("doc_id", "text")).collect()
    assert(out.length === 1)                        // tokenize-empty doc dropped
    assert(out.head.getAs[Long]("chunk_idx") === 0L)
    assert(out.head.getAs[Long]("n_chunk_tokens") === 3L)
    assert(out.head.getAs[String]("chunk_text") === "a b c")
  }
}
