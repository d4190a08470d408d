package graft

import org.apache.spark.sql.functions._

import graft.ops.{Search, Similarity}

/** Pins the round-8 additions: graph-based ANN beam search (x214 —
  * dominance over its own IVF seeds), its recall audit (x215), and
  * the chunk-level retrieval eval (x217 — needle recovery on a
  * hand-traceable corpus). The x216 txn-log protocol is pinned in
  * TxnLogSpec. */
class Round13OpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vs = {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    Similarity.vectors(embs).persist()
  }
  private lazy val cents = Similarity.kmeansCentroids(vs)
  private lazy val knn = Similarity.knnGraphFrom(vs, cents).persist()

  // ---- x214 / x215 graph ANN ---------------------------------------

  test("graphAnnFrom emits a well-formed per-probe top-k") {
    val got = Similarity.graphAnnFrom(vs, cents, knn)
      .as[(Long, Long, Double, Long)].collect()
    assert(got.nonEmpty)
    got.groupBy(_._1).foreach { case (q, rows0) =>
      val rows = rows0.sortBy(_._4)
      assert(rows.map(_._4).toSeq === (1L to rows.length).toSeq, s"q=$q ranks")
      assert(rows.forall(_._2 != q), s"q=$q self-match")
      // cos_sim non-increasing in rank (ties broken by vec_id)
      rows.sliding(2).foreach { case Array(a, b) =>
        assert(a._3 > b._3 || (a._3 == b._3 && a._2 < b._2), s"q=$q order")
      case _ => ()
      }
    }
  }

  test("graphAnnFrom equals an in-memory beam-search reference") {
    // the beam LOGIC (round count, hop expansion, self-exclusion,
    // dedup, (cos desc, vec_id) cuts) replayed in plain Scala from the
    // engine's own collected inputs — any drift in the distributed
    // round structure diverges from this trajectory
    val vecs = vs.select(col("vec_id"), col("v"), col("nrm"))
      .as[(Long, Seq[Double], Double)].collect()
      .map { case (id, v, n) => id -> ((v.toArray, n)) }.toMap
    val adj0 = knn.select(col("vec_a"), col("vec_b")).as[(Long, Long)].collect()
    val adj = (adj0 ++ adj0.map(p => (p._2, p._1)))
      .groupBy(_._1).map { case (k, es) => k -> es.map(_._2).toSet }
    val seeds = Similarity.annIvfFrom(vs, cents)
      .select(col("q_id"), col("vec_id")).as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, r) => q -> r.map(_._2).toSet }
    def cos4(q: Long, c: Long): Double = {
      val (qv, qn) = vecs(q); val (cv, cn) = vecs(c)
      var d = 0.0; var i = 0
      while (i < qv.length) { d += qv(i) * cv(i); i += 1 }
      math.floor(d / (qn * cn) * 10000 + 0.5) / 10000
    }
    val expected = seeds.flatMap { case (q, s0) =>
      var cand: Set[Long] = s0 - q
      for (_ <- 1 to Similarity.GraphAnnRounds) {
        val pool = (cand ++ cand.flatMap(c => adj.getOrElse(c, Set.empty))) - q
        cand = pool.toSeq.map(c => (c, cos4(q, c)))
          .sortBy { case (c, s) => (-s, c) }
          .take(Similarity.GraphAnnBeam).map(_._1).toSet
      }
      cand.toSeq.map(c => (c, cos4(q, c)))
        .sortBy { case (c, s) => (-s, c) }
        .take(Similarity.TopK)
        .zipWithIndex.map { case ((c, s), i) => (q, c, s, (i + 1).toLong) }
    }.toSet
    val got = Similarity.graphAnnFrom(vs, cents, knn)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(got === expected)
  }

  test("graph expansion never loses recall vs the IVF seeds, per probe") {
    // the final top-k is the best-of-pool under the SAME total order
    // brute uses, and the pool contains every IVF seed — so per-probe
    // brute overlap can only grow
    val ivf = Similarity.ivfRecall(vs, cents)
      .select(col("q_id"), col("n_common").as("ivf_common"))
    val g = Similarity.graphAnnRecall(vs, cents, knn)
      .select(col("q_id"), col("n_common").as("g_common"))
    val joined = ivf.join(g, Seq("q_id"))
      .as[(Long, Long, Long)].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (q, ic, gc) =>
      assert(gc >= ic, s"q=$q graph recall $gc < ivf recall $ic")
    }
  }

  test("graphAnnRecall rows carry k-bounded counts and a 4dp ratio") {
    val got = Similarity.graphAnnRecall(vs, cents, knn)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (_, nb, nc, r) =>
      assert(nb <= Similarity.TopK && nc <= nb)
      assert(math.abs(r - nc.toDouble / Similarity.TopK) < 1e-9)
    }
  }

  // ---- x218 PQ re-rank refinement ------------------------------------

  test("exact re-rank of the widened short-list never loses recall vs plain ADC") {
    // every brute-top-k doc present in the k·factor short-list has a
    // higher exact cosine than any non-top-k short-list member, so it
    // must survive the re-rank cut — rerank_common = |brute ∩ short|
    // ⊇ |brute ∩ adc_topk| per probe, provably
    val pq = Similarity.ivfPqRecall(vs, cents)
      .select(col("q_id"), col("n_common").as("pq_common"))
    val rr = Similarity.pqRerankRecall(vs, cents)
      .select(col("q_id"), col("n_common").as("rr_common"))
    val joined = pq.join(rr, Seq("q_id")).as[(Long, Long, Long)].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (q, p, r) =>
      assert(r >= p, s"q=$q rerank recall $r < adc recall $p")
    }
  }

  test("pqRerankRecall rows are k-bounded with a 4dp ratio") {
    val got = Similarity.pqRerankRecall(vs, cents)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (_, nb, nc, r) =>
      assert(nb <= Search.TopK && nc <= nb)
      assert(math.abs(r - nc.toDouble / Search.TopK) < 1e-9)
    }
  }

  // ---- x220 BM25F ----------------------------------------------------

  test("a title hit outranks the same-tf body hit in an equal-length doc") {
    // both docs are 12 tokens with exactly one 'spark'; doc 1 carries
    // it in the first TitleTokens positions, doc 2 in the body —
    // BM25F's doubled title weight must rank doc 1 first
    val pad = (1 to 9).map(i => s"p$i")
    val docs = docsOf(
      1L -> (Seq("spark", "x", "y") ++ pad).mkString(" "),
      2L -> ((Seq("x", "y") ++ pad ++ Seq("spark")).mkString(" ")))
    val got = Search.bm25fSearch(docs)
      .filter(col("query") === "q_spark_join")
      .as[(String, Long, Double, Long)].collect().sortBy(_._4)
    assert(got.map(_._2).toSeq === Seq(1L, 2L))
    assert(got(0)._3 > got(1)._3)
  }

  test("a doc shorter than the title width scores on the title leg alone") {
    val docs = docsOf(
      3L -> "spark join",
      4L -> ("nope " * 20).trim)
    val got = Search.bm25fSearch(docs)
      .filter(col("query") === "q_spark_join")
      .as[(String, Long, Double, Long)].collect()
    assert(got.map(_._2).toSet === Set(3L))
    assert(got.forall(_._3 > 0.0))
  }

  // ---- x217 chunk retrieval eval -----------------------------------

  private def docsOf(rows: (Long, String)*) =
    rows.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("a probe's own single-chunk doc wins rank 1 over a tying duplicate") {
    // docs < 64 tokens are one chunk each; doc 0 (a probe: 0 % 100 = 0)
    // ties with its duplicate doc 1 on every term and the
    // (total desc, src_doc asc, chunk_idx asc) break picks doc 0
    val docs = docsOf(
      0L -> "alpha beta gamma",
      1L -> "alpha beta gamma",
      2L -> "zeta eta theta")
    val got = Search.chunkRetrievalEval(docs)
      .as[(Long, Long, Option[Long], Double)].collect().toSet
    assert(got === Set((0L, 1L, Some(1L), 1.0)))
  }

  test("a multi-chunk probe doc fills the hit list when no other doc matches") {
    // 120 tokens cycling over 8 words -> chunks at starts 0/48/96,
    // EVERY chunk contains all 8 words, so the probe's top-QTermCap
    // query terms (all 8) hit every chunk; no other doc shares a
    // term, so every scored chunk is a source chunk
    val longText = (0 until 120).map(i => s"r${i % 8}").mkString(" ")
    val docs = docsOf(
      100L -> longText,
      3L -> "completely different words here")
    val got = Search.chunkRetrievalEval(docs)
      .as[(Long, Long, Option[Long], Double)].collect().toSet
    assert(got === Set((100L, 3L, Some(1L), 1.0)))
  }

  test("chunkRetrievalEval per-probe mrr is 1/first_rank on the fixture corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = Search.chunkRetrievalEval(docs)
      .as[(Long, Long, Option[Long], Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (q, nh, fr, mrr) =>
      assert(q % Similarity.QueryStride === 0L)
      assert(nh <= Search.TopK)
      fr match {
        case Some(r) =>
          assert(nh >= 1 && r >= 1 && r <= Search.TopK)
          assert(math.abs(mrr - math.floor(1.0 / r * 10000 + 0.5) / 10000) < 1e-9)
        case None => assert(nh === 0L && mrr === 0.0)
      }
    }
  }
}
