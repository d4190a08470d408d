package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Similarity, TextAnalysis}

/** Pins the round-7 additions: exact-substring dedup regions (x206 —
  * maximal-span merge semantics), MMR diversity selection (x207 —
  * the greedy trajectory vs an in-memory reference), and tokenizer
  * fertility per language (x208 — langid grouping + merge
  * application). */
class Round12OpsSpec extends SparkSpec {
  import spark.implicits._

  private def docsOf(rows: (Long, String)*) =
    rows.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  // ---- x206 exact-substring spans ----------------------------------

  test("exactSubstrSpans merges duplicated windows into one maximal span") {
    // "a b c d" (4 tokens) shared across docs; L=3 → two duplicated
    // 3-windows each, merged to one span of 4 tokens per doc
    val docs = docsOf(
      1L -> "a b c d e f g h",
      2L -> "x y a b c d z w")
    val got = Dedup.exactSubstrSpans(docs, minTokens = 3)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 0L, 3L, 4L, 2L), (2L, 2L, 5L, 4L, 2L)))
  }

  test("exactSubstrSpans finds within-document repeats as separate spans") {
    // "p q r" occurs at pos 0 and pos 4 of the SAME doc
    val docs = docsOf(1L -> "p q r s p q r t")
    val got = Dedup.exactSubstrSpans(docs, minTokens = 3)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 0L, 2L, 3L, 1L), (1L, 4L, 6L, 3L, 1L)))
  }

  test("overlapping repeats from different partners merge into ONE covered span") {
    // doc 1's duplicated starts are {0, 2} (gap 2 < L from different
    // partners) — consecutive-only merging would emit two OVERLAPPING
    // rows and x209 would count 6 dup tokens in a 5-token doc
    val docs = docsOf(
      1L -> "a b c d e",
      2L -> "a b c",
      3L -> "c d e")
    val got = Dedup.exactSubstrSpans(docs, minTokens = 3)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 0L, 4L, 5L, 2L), (2L, 0L, 2L, 3L, 1L),
      (3L, 0L, 2L, 3L, 1L)))
    val rate = graft.ops.Dedup.dupRateBySource(docs, minTokens = 3)
      .as[(String, Long, Long, Long, Long, Option[Double])].collect().toSet
    assert(rate === Set(("s", 3L, 11L, 11L, 3L, Some(1.0))))
  }

  test("exactSubstrSpans reports nothing on a repeat-free corpus") {
    val docs = docsOf(1L -> "a b c d e", 2L -> "f g h i j")
    assert(Dedup.exactSubstrSpans(docs, minTokens = 3).count() === 0L)
  }

  test("a full-doc copy surfaces as one whole-doc span in both docs") {
    val text = (1 to 6).map(i => s"tok$i").mkString(" ")
    val docs = docsOf(1L -> text, 2L -> text)
    val got = Dedup.exactSubstrSpans(docs, minTokens = 3)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // 4 duplicated 3-windows per doc merge into one 6-token span
    assert(got === Set((1L, 0L, 5L, 6L, 4L), (2L, 0L, 5L, 6L, 4L)))
  }

  // ---- x207 MMR diversity selection --------------------------------

  test("mmrSelectFrom equals the in-memory greedy MMR reference on the fixture") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val vs = Similarity.vectors(embs).persist()
    val cents = Similarity.kmeansCentroids(vs)
    val got = Similarity.mmrSelectFrom(vs, cents)
      .as[(Long, Long, Long, Double, Option[Double], Double)].collect().toSet

    val pool = Similarity.annIvfFrom(vs, cents)
      .as[(Long, Long, Double, Long)].collect()
    val vecs = vs.select(col("vec_id"), col("v"), col("nrm"))
      .as[(Long, Seq[Double], Double)].collect()
      .map { case (id, v, nr) => id -> ((v.toArray, nr)) }.toMap
    def cos4i(a: Long, b: Long): Long = {
      val (va, na) = vecs(a); val (vb, nb) = vecs(b)
      var d = 0.0; var i = 0
      while (i < va.length) { d += va(i) * vb(i); i += 1 }
      val c = math.floor(d / (na * nb) * 10000 + 0.5) / 10000
      math.floor(c * 10000 + 0.5).toLong
    }
    val expect = pool.groupBy(_._1).toSeq.flatMap { case (q, cs) =>
      val rel = cs.map(c => c._2 -> math.floor(c._3 * 10000 + 0.5).toLong).toMap
      var selected = Vector.empty[(Long, Long, Long, Option[Long], Long)]
      var remaining = rel.keySet
      for (t <- 1 to Similarity.MmrK if remaining.nonEmpty) {
        val scored = remaining.toSeq.map { d =>
          val pen = if (t == 1) None
                    else Some(selected.map(s => cos4i(d, s._1)).max)
          (d, rel(d), pen, rel(d) - pen.getOrElse(0L))
        }
        val best = scored.minBy(s => (-s._4, s._1))
        selected :+= ((best._1, t.toLong, best._2, best._3, best._4))
        remaining -= best._1
      }
      selected.map(s => (q, s._1, s._2, s._3.toDouble / 10000,
        s._4.map(_.toDouble / 10000), s._5.toDouble / 10000))
    }.toSet
    assert(got === expect)
    vs.unpersist()
  }

  test("mmr selection is a distinct prefix of rounds topped by the IVF rank-1") {
    // (mmr is NOT monotone across rounds: the penalty is a signed
    // cosine, so an anti-correlated round-2 pick can out-score the
    // round-1 relevance argmax — structural invariants only here;
    // the trajectory itself is pinned by the reference test above)
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val vs = Similarity.vectors(embs).persist()
    val cents = Similarity.kmeansCentroids(vs)
    val got = Similarity.mmrSelectFrom(vs, cents)
      .as[(Long, Long, Long, Double, Option[Double], Double)].collect()
    val top1 = Similarity.annIvfFrom(vs, cents)
      .filter(col("rnk") === 1L)
      .as[(Long, Long, Double, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    got.groupBy(_._1).foreach { case (q, rows) =>
      val rounds = rows.map(_._3).sorted
      assert(rounds === (1L to rounds.length).toArray.toSeq,
        s"q=$q rounds not a contiguous prefix: ${rounds.mkString(",")}")
      assert(rows.map(_._2).distinct.length === rows.length,
        s"q=$q picked a vec twice")
      assert(rows.length <= Similarity.MmrK)
      val r1 = rows.find(_._3 == 1L).get
      assert(r1._2 === top1(q), s"q=$q round 1 must be the relevance argmax")
      assert(r1._5.isEmpty, "round 1 carries no penalty")
    }
    vs.unpersist()
  }

  // ---- x208 tokenizer fertility per language -----------------------

  test("tokenizerFertility groups the compression ratios by predicted language") {
    // doc 1 hits only en markers, doc 2 only fr; no merges → subword
    // count = character count per token
    val docs = docsOf(1L -> "the of and", 2L -> "merge join sort")
    val got = TextAnalysis.tokenizerFertility(docs, Seq.empty)
      .as[(String, Long, Long, Long, Long, Option[Double], Option[Double])]
      .collect().toSet
    // en: 3 toks, 3+2+3=8 subs, 10 chars → 8/3≈2.6667, 10/8=1.25
    // fr: 3 toks, 5+4+4=13 subs, 15 chars → 13/3≈4.3333, 15/13≈1.1538
    assert(got === Set(
      ("en", 1L, 10L, 3L, 8L, Some(2.6667), Some(1.25)),
      ("fr", 1L, 15L, 3L, 13L, Some(4.3333), Some(1.1538))))
  }

  test("tokenizerFertility applies the merge table before counting subwords") {
    val docs = docsOf(1L -> "the the")
    val got = TextAnalysis.tokenizerFertility(docs, Seq(("t", "h")))
      .as[(String, Long, Long, Long, Long, Option[Double], Option[Double])]
      .collect().toSet
    // "the" → [th, e] per token: 2 toks, 4 subs, 7 chars
    assert(got === Set(("en", 1L, 7L, 2L, 4L, Some(2.0), Some(1.75))))
  }

  // ---- x209 duplicated-token rate per source -----------------------

  test("dupRateBySource sums disjoint span coverage per source") {
    val docs = Seq(
      (1L, "a b c d e f g h", "en", "srcA", 15L),
      (2L, "x y a b c d z w", "en", "srcA", 15L),
      (3L, "m n o p q", "en", "srcB", 9L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = graft.ops.Dedup.dupRateBySource(docs, minTokens = 3)
      .as[(String, Long, Long, Long, Long, Option[Double])].collect().toSet
    // srcA: 16 tokens, one 4-token span per doc → 8 dup tokens, 0.5
    assert(got === Set(
      ("srcA", 2L, 16L, 8L, 2L, Some(0.5)),
      ("srcB", 1L, 5L, 0L, 0L, Some(0.0))))
  }

  // ---- x210 curriculum mix table -----------------------------------

  test("curriculumMix fuses community, langid and quality into weights") {
    val docs = docsOf(0L -> "the of and", 1L -> "merge join sort",
      2L -> "the a data")
    val labels = Seq((0L, 0L), (1L, 0L)).toDF("u", "lbl") // doc 2 unclustered
    val got = graft.ops.QualityFilters.curriculumMix(labels, docs)
      .as[(Long, String, Long, Double, Double)].collect().toSet
    // qualities: doc0 0.612 (3/3 stopwords), doc1 0.312 (0), doc2 0.512
    // (2/3); three singleton groups → equal sqrt weights 1/3
    assert(got === Set(
      (0L, "en", 1L, 0.612, 0.3333),
      (0L, "fr", 1L, 0.312, 0.3333),
      (-1L, "en", 1L, 0.512, 0.3333)))
  }

  // ---- x212 corpus curation manifest -------------------------------

  /** The x29 split bucket, reproduced bit-for-bit (first 4 md5 hex
    * chars mod 100) so tests can pick ids by split deterministically. */
  private def splitBucket(id: Long): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(s"split:$id".getBytes("UTF-8"))
    (((h(0) & 0xff) << 8) | (h(1) & 0xff)) % 100
  }
  private def trainIds: Seq[Long] =
    (0L until 200L).filter(splitBucket(_) < graft.ops.TextAnalysis.TrainPct)
  /** Gopher-passing text: 40 distinct words (2 stopwords), mean word
    * length ~5.6, all bigrams distinct. */
  private def goodText(tag: String, extra: Int = 0): String =
    ("the and " + (1 to 38 + extra).map(i => s"${tag}word$i").mkString(" "))

  test("corpusManifest reports the first failing stage per doc") {
    import graft.ops.{QualityFilters, TextAnalysis}
    val Seq(a, b, c) = trainIds.take(3)
    val heldoutId =
      (0L until 200L).find(splitBucket(_) >= TextAnalysis.ValPct).get
    val text = goodText("x")
    val docs = Seq(
      (a, text, "en", "s", text.length.toLong),          // keeper (min id)
      (b, text, "en", "s", text.length.toLong),          // exact copy
      (c, "tiny", "en", "s", 4L),                        // fails Gopher
      (heldoutId, text, "en", "s", text.length.toLong)   // val/test split
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val noClusters = Seq.empty[(Long, Long, Long)]
      .toDF("doc_id", "cluster_id", "n_members")
    val noContam = Seq.empty[(Long, Long, Long)]
      .toDF("test_doc", "train_doc", "n_shared")
    val got = QualityFilters.corpusManifest(docs, noClusters, noContam)
      .as[(Long, String, String, String)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(got(math.min(a, b)) === "keep")
    assert(got(math.max(a, b)) === "exact_dup")
    assert(got(c) === "low_quality")
    assert(got(heldoutId) === "heldout")
  }

  test("corpusManifest: near-dup rep survives, loser and contaminated drop") {
    import graft.ops.QualityFilters
    val Seq(a, b, c) = trainIds.take(3)
    val text1 = goodText("p")
    val text2 = goodText("q", extra = 1) // one more word → longer
    val text3 = goodText("r")
    val docs = Seq(
      (a, text1, "en", "s", text1.length.toLong),
      (b, text2, "en", "s", text2.length.toLong),
      (c, text3, "en", "s", text3.length.toLong)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val clusters = Seq((a, 0L, 2L), (b, 0L, 2L))
      .toDF("doc_id", "cluster_id", "n_members")
    val contam = Seq((999L, c, 5L)).toDF("test_doc", "train_doc", "n_shared")
    val got = QualityFilters.corpusManifest(docs, clusters, contam)
      .as[(Long, String, String, String)].collect()
      .map(r => r._1 -> r._4).toMap
    // text2 is longer → b is the x86 rep; a loses as near_dup even
    // though it passes quality; c is flagged by the x37 train side
    assert(got(a) === "near_dup")
    assert(got(b) === "keep")
    assert(got(c) === "contaminated")
  }

  // ---- x213 champion-list recall audit -----------------------------

  test("championRecall is 1.0 when no term's df exceeds the cap") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = graft.ops.Search.championRecall(docs)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    assert(got.forall(_._4 === 1.0),
      s"df <= cap at sf0.001 => truncation inactive: ${got.mkString(",")}")
  }

  test("champion truncation drops docs outside a term's top-C postings") {
    import graft.ops.Search
    // probe doc 0 queries with {a, b}; docs 1 and 2 both match 'a' but
    // with cap=1 only doc 1 (higher tf) stays reachable
    val docs = docsOf(0L -> "a b", 1L -> "a a c", 2L -> "a d")
    val exact = Search.docProbeBm25(docs, championCap = Int.MaxValue)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2)).toSet
    val champ = Search.docProbeBm25(docs, championCap = 1)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2)).toSet
    assert(exact === Set((0L, 1L), (0L, 2L)))
    assert(champ === Set((0L, 1L)))
  }

  // ---- x211 embedding outlier screen -------------------------------

  test("embeddingOutliers flags the far-from-centroid member, skips zero-variance labels") {
    // label 0: nine copies of e1 + one e2 → algebra gives the e2
    // member z = -3 exactly, the e1 members z = +1/3 (not flagged);
    // label 1: identical members → zero variance, no rows
    val e1 = Array(1f, 0f, 0f, 0f)
    val e2 = Array(0f, 1f, 0f, 0f)
    val rows = (0L to 8L).map(i => (i, e1, 0)) :+ ((9L, e2, 0)) :+
      ((10L, e1, 1)) :+ ((11L, e1, 1)) :+ ((12L, e1, 1))
    val embs = rows.toDF("vec_id", "embedding", "label")
    val got = graft.ops.Similarity.embeddingOutliers(embs)
      .as[(Long, Long, Double, Double)].collect().toSet
    // centroid (0.9, 0.1, 0, 0); cos(e2, c) = 0.1/sqrt(0.82) → 0.1104
    assert(got === Set((9L, 0L, 0.1104, -3.0)))
  }
}
