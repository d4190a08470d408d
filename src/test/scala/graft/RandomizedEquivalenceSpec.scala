package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

import graft.ops.{Dedup, Skew}

/** Randomized cross-implementation equivalence: properties that must
  * hold on ANY corpus, checked on generated ones (fixed seeds — each
  * sample costs Spark jobs, so a few diverse corpora beat hundreds of
  * tiny ones):
  *
  *  - prefix+length-filtered exact similarity join ≡ brute-force
  *    all-pairs (the PPJoin losslessness theorem, as implemented);
  *  - candidates-only LSH ≡ carry-the-sets LSH;
  *  - salted join ≡ plain join under key skew.
  */
class RandomizedEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic corpus: docs drawn from a small vocab so overlaps
    * and near-dups actually occur; sizes vary to exercise the length
    * filter. */
  private def corpus(seed: Long, nDocs: Int): Seq[(Long, String, String)] = {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val gen = for {
      n <- Gen.choose(3, 14)
      toks <- Gen.listOfN(n, Gen.oneOf(vocab))
    } yield toks.mkString(" ")
    val params = Gen.Parameters.default
    (0 until nDocs).map { i =>
      val text = gen.pureApply(params, rng.Seed(seed + i), 100)
      (i.toLong, text, "en")
    }
  }

  test("exact similarity join equals brute force on random corpora") {
    for (seed <- Seq(11L, 42L, 99L)) {
      val docs = corpus(seed, 40).toDF("doc_id", "text", "lang")
      val brute = Dedup.jaccardPairsBrute(docs, 0.4)
        .as[(Long, Long, Double)].collect().toSet
      val exact = Dedup.jaccardPairsExact(docs, 0.4)
        .as[(Long, Long, Double)].collect().toSet
      assert(exact === brute, s"seed $seed")
    }
  }

  test("asymmetric containment join equals brute force on random corpora") {
    // the one-sided prefix/length filters are lossless (uncapped df):
    // C(A->B) >= tau forces |A∩B| >= ceil(tau·n_A), which cannot fit
    // in A's post-prefix suffix of ceil(tau·n_A) - 1 shingles
    for (seed <- Seq(11L, 42L, 99L)) {
      val docs = corpus(seed, 40).toDF("doc_id", "text", "lang")
      val brute = Dedup.containmentPairsBrute(docs, 0.6)
        .as[(Long, Long, Double)].collect().toSet
      val fast = Dedup.containmentPairs(docs, 0.6, maxDf = Int.MaxValue)
        .as[(Long, Long, Double)].collect().toSet
      assert(fast === brute, s"seed $seed")
    }
  }

  test("candidates-only LSH equals carry-the-sets LSH on random corpora") {
    for (seed <- Seq(7L, 123L)) {
      val docs = corpus(seed, 40).toDF("doc_id", "text", "lang")
      val full = Dedup.minhashNearDupPairs(docs, 0.3)
        .as[(Long, Long, Double)].collect().toSet
      val slim = Dedup.minhashNearDupPairsSlim(docs, 0.3)
        .as[(Long, Long, Double)].collect().toSet
      assert(slim === full, s"seed $seed")
    }
  }

  test("custom heap top-k equals the window form on random keyed data") {
    import org.apache.spark.sql.expressions.Window
    for (seed <- Seq(7L, 23L)) {
      // keys of wildly different sizes incl. below-k groups; scores
      // collide frequently so the id tiebreak matters
      val rows = (0 until 400).map { i =>
        val h = rng.Seed(seed + i).long._1
        (s"k${math.floorMod(h, 11)}", i.toLong, math.floorMod(h >> 8, 13))
      }
      val df = rows.toDF("key", "id", "score").repartition(5)
      for (k <- Seq(1, 3, 7)) {
        val fast = graft.plans.TopKPerKey.topKPerKey(df,
            Seq(col("key")), Seq(col("score").desc, col("id").asc), k)
          .as[(String, Long, Long)].collect().toSet
        val w = Window.partitionBy(col("key")).orderBy(col("score").desc, col("id").asc)
        val slow = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
          .drop("rn").as[(String, Long, Long)].collect().toSet
        assert(fast === slow, s"seed $seed k=$k")
      }
    }
  }

  test("star-contraction components equal label propagation on random graphs") {
    // random pair graphs with components of mixed shape (chains via
    // consecutive ids, blobs via a shared hub) — both algorithms must
    // emit the identical (doc_id, cluster_id, n_members) rows
    for (seed <- Seq(5L, 77L, 301L)) {
      val pairs = (0 until 120).map { i =>
        val h = rng.Seed(seed + i).long._1
        val a = math.floorMod(h, 60L)
        val b = if (i % 3 == 0) a + 1 else math.floorMod(h >> 16, 60L)
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2)
        .toDF("doc_a", "doc_b").distinct()
      val prop = Dedup.dupClustersFrom(pairs, maxIters = 100)
        .as[(Long, Long, Long)].collect().toSet
      val star = Dedup.dupClustersStarFrom(pairs, maxIters = 100)
        .as[(Long, Long, Long)].collect().toSet
      assert(star === prop, s"seed $seed")
    }
  }

  test("star contraction converges in far fewer rounds than propagation on a chain") {
    // a 48-hop chain: label propagation moves the min one hop per
    // round (needs ~47), star contraction halves distances each pass —
    // 8 rounds must be enough for star and must NOT be enough for
    // propagation (fail-loud non-convergence is part of its contract)
    val chain = (0L until 48L).sliding(2).map(s => (s(0), s(1))).toSeq
      .toDF("doc_a", "doc_b")
    val star = Dedup.dupClustersStarFrom(chain, maxIters = 8)
      .as[(Long, Long, Long)].collect().toSet
    assert(star === (0L until 48L).map(i => (i, 0L, 48L)).toSet)
    assertThrows[IllegalStateException] {
      Dedup.dupClustersFrom(chain, maxIters = 8).collect()
    }
  }

  test("spanDedup equals an in-memory reference on random corpora") {
    // independent reference implementation: plain Scala sliding
    // windows over the same whitespace tokenization — pins the
    // explode/slice/group pipeline end to end (window arithmetic,
    // within- vs cross-doc counting, keeper tie-breaks)
    for (seed <- Seq(13L, 211L)) {
      val rows = corpus(seed, 50)
      val k = 4 // short docs: default 8 would window almost nothing
      val expected = rows
        .flatMap { case (id, text, _) =>
          text.split("\\s+").filter(_.nonEmpty).toSeq.sliding(k)
            .filter(_.size == k).zipWithIndex
            .map { case (w, pos) => (w.mkString(" "), id, pos.toLong) }
        }
        .groupBy(_._1).values
        .filter(_.size > 1)
        .map { occ =>
          val keep = occ.map(o => (o._2, o._3)).min
          (occ.size.toLong, occ.map(_._2).distinct.size.toLong, keep._1, keep._2)
        }.toSet
      val got = Dedup.spanDedup(rows.toDF("doc_id", "text", "lang"), k)
        .select("n_occurrences", "n_docs", "keep_doc_id", "keep_pos")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got === expected, s"seed $seed")
    }
  }

  test("gopher rules equal a plain-Scala reference on random corpora") {
    import graft.ops.QualityFilters._
    for (seed <- Seq(17L, 333L)) {
      val rows = corpus(seed, 50)
      val expected = rows.map { case (id, text, _) =>
        val toks = text.split("\\s+").filter(_.nonEmpty).toSeq
        def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
        val n = toks.size
        val mwl = if (n > 0) r4(toks.map(_.length).sum.toDouble / n) else 0.0
        val dr = if (n > 0) r4(toks.distinct.size.toDouble / n) else 0.0
        val stop = toks.count(graft.ops.TextAnalysis.Stopwords.contains)
        val bg = toks.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
        val tbf = if (bg.nonEmpty)
          r4(bg.groupBy(identity).values.map(_.size).max.toDouble / bg.size) else 0.0
        val keep = (n >= MinWords && n <= MaxWords) &&
          (mwl >= MinMeanLen && mwl <= MaxMeanLen) &&
          stop >= MinStopHits &&
          (tbf <= MaxTopBigramFrac && dr >= MinDistinctRatio)
        (id, n.toLong, mwl, stop.toLong, dr, tbf, if (keep) 1L else 0L)
      }.toSet
      val got = gopherRules(rows.toDF("doc_id", "text", "lang"))
        .select("doc_id", "n_words", "mean_word_len", "stop_hits",
          "distinct_ratio", "top_bigram_frac", "keep")
        .as[(Long, Long, Double, Long, Double, Double, Long)].collect().toSet
      assert(got === expected, s"seed $seed")
    }
  }

  test("c4 line filters equal a plain-Scala reference on random corpora") {
    import graft.ops.QualityFilters._
    for (seed <- Seq(29L, 404L)) {
      val rows = corpus(seed, 50)
      val expected = rows.map { case (id, text, _) =>
        val toks = text.split("\\s+").filter(_.nonEmpty).toSeq
        val w = (8 + id % 5).toInt
        val lines = toks.grouped(w).zipWithIndex.map { case (lt, i) =>
          val terminal = (id + i) % 4 != 0
          val out = lt.mkString(" ") + (if (terminal) "." else "")
          (out, lt.size.toLong,
            lt.size >= MinLineWords && terminal && !lt.contains(BlockToken))
        }.toSeq
        val kept = lines.filter(_._3)
        (id, lines.size.toLong, kept.size.toLong, kept.map(_._2).sum)
      }.toSet
      val got = c4LineFilters(rows.toDF("doc_id", "text", "lang"))
        .select("doc_id", "n_lines", "n_kept", "n_kept_words")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got === expected, s"seed $seed")
    }
  }

  test("salted join equals plain join under heavy key skew") {
    // 90% of facts hit one hot key — the scenario salting exists for
    val facts = (1 to 500).map { i =>
      (i.toLong, if (i % 10 == 0) i.toLong % 7 else 1L)
    }.toDF("row_id", "k")
    val dim = (0L to 6L).map(k => (k, s"dim_$k")).toDF("k", "attr")
    val plain = facts.join(dim, Seq("k")).select("row_id", "k", "attr")
      .as[(Long, Long, String)].collect().toSet
    val salted = Skew.saltedJoin(facts, dim, Seq("k"), col("row_id"))
      .select("row_id", "k", "attr")
      .as[(Long, Long, String)].collect().toSet
    assert(salted === plain)
  }

  test("pareto frontier equals the quadratic NOT-EXISTS reference on random parts") {
    for (seed <- Seq(7L, 23L, 77L)) {
      val params = Gen.Parameters.default
      val gen = for {
        p <- Gen.choose(100, 140) // narrow price domain → many ties
        s <- Gen.choose(1, 12)
      } yield (p, s)
      val rows = (0 until 120).map { i =>
        val (p, s) = gen.pureApply(params, rng.Seed(seed * 1000 + i), 100)
        (i.toLong, s"part$i", "B", "T", s, p / 10.0)
      }
      val df = rows.toDF("p_partkey", "p_name", "p_brand", "p_type",
        "p_size", "p_retailprice")
      // reference: p survives iff no q with price<=p, size>=s, one strict
      val pts = rows.map { case (k, _, _, _, s, pr) =>
        (k, math.floor(pr * 100 + 0.5).toLong, s.toLong)
      }
      val expected = pts.filter { case (_, p, s) =>
        !pts.exists { case (_, p2, s2) =>
          p2 <= p && s2 >= s && (p2 < p || s2 > s)
        }
      }.map(_._1).toSet
      val got = graft.ops.Olap.paretoFront(df).select("p_partkey")
        .as[Long].collect().toSet
      assert(got === expected, s"seed $seed")
    }
  }

  test("eventuallyFollows equals an in-memory footprint on random sessions") {
    import java.sql.Timestamp
    for (seed <- Seq(3L, 19L, 64L)) {
      val params = Gen.Parameters.default
      val types = Vector("view", "cart", "purchase", "error")
      val gen = for {
        u <- Gen.choose(1, 6)
        t <- Gen.oneOf(types)
        m <- Gen.choose(0, 120000) // all gaps < 30 min → one session/user
      } yield (u.toLong, t, m.toLong)
      val rows = (0 until 150).map { i =>
        val (u, t, m) = gen.pureApply(params, rng.Seed(seed * 300 + i), 100)
        (i.toLong, new Timestamp(m), u, t, 1.0, "{}")
      }
      // in-memory reference: per user (one session), ordered by (ms, id)
      val byUser = rows.groupBy(_._3).values.map(_.sortBy(r => (r._2.getTime, r._1)))
      val expected = byUser.flatMap { s =>
        val seq = s.map(_._4)
        for {
          a <- seq.distinct; b <- seq.distinct
          if seq.indexOf(a) < seq.lastIndexOf(b)
        } yield (a, b)
      }.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val nSess = byUser.size.toLong
      val got = graft.ops.Events.eventuallyFollows(
          rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
        .as[(String, String, Long, Double)].collect()
      assert(got.map(r => (r._1, r._2) -> r._3).toMap === expected, s"seed $seed")
      got.foreach { case (a, b, n, sup) =>
        assert(sup === math.floor(n.toDouble / nSess * 10000 + 0.5) / 10000,
          s"seed $seed support($a,$b)")
      }
    }
  }

  test("quantileNormalize is a within-source monotone map onto the global multiset") {
    for (seed <- Seq(13L, 57L)) {
      val params = Gen.Parameters.default
      val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg")
      val gen = for {
        n <- Gen.choose(4, 20)
        ws <- Gen.listOfN(n, Gen.oneOf(vocab))
        src <- Gen.oneOf("s1", "s2", "s3")
      } yield (ws.mkString(" "), src)
      val rows = (0 until 60).map { i =>
        val (t, src) = gen.pureApply(params, rng.Seed(seed * 100 + i), 100)
        (i.toLong, t, "en", src, t.length.toLong)
      }
      val out = graft.ops.QualityFilters.quantileNormalize(
          rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
        .as[(Long, String, Double, Double)].collect()
      assert(out.length === 60, s"seed $seed")
      val global = out.map(_._3).toSet
      assert(out.forall(r => global.contains(r._4)), s"seed $seed: range ⊆ scores")
      out.groupBy(_._2).foreach { case (src, g) =>
        val sorted = g.sortBy(r => (r._3, r._1)).map(_._4)
        assert(sorted.sorted.toSeq === sorted.toSeq, s"seed $seed $src monotone")
      }
    }
  }

  test("distributed k-core equals an in-memory peel on random co-purchase data") {
    import graft.ops.Graph.{KCoreK, KCoreMinSupport}
    for (seed <- Seq(5L, 31L, 88L)) {
      val params = Gen.Parameters.default
      val gen = for {
        o <- Gen.choose(0, 59)
        p <- Gen.choose(0, 29)
      } yield (o.toLong, p.toLong)
      val rows = (0 until 400).map(i =>
        gen.pureApply(params, rng.Seed(seed * 500 + i), 100))
      // in-memory reference peel
      val ob = rows.distinct
      val sup = ob.groupBy(_._1).values.toSeq
        .flatMap(b => b.map(_._2).sorted.combinations(2).map(c => (c(0), c(1))))
        .groupBy(identity).view.mapValues(_.size)
        .filter(_._2 >= KCoreMinSupport).keys.toSeq
      var adj = sup.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      var changed = true
      while (changed) {
        val weak = adj.filter(_._2.size < KCoreK).keySet
        changed = weak.nonEmpty
        adj = (adj -- weak).view.mapValues(_ -- weak).toMap
          .filter(_._2.nonEmpty)
      }
      val expected = adj.view.mapValues(_.size.toLong).toMap
      val got = graft.ops.Graph.kCoreParts(
          rows.toDF("l_orderkey", "l_partkey"))
        .as[(Long, Long)].collect().toMap
      assert(got === expected, s"seed $seed")
    }
  }

  test("distributed LPA equals the in-memory synchronous reference on random graphs") {
    for (seed <- Seq(5L, 23L, 77L)) {
      val rnd = new scala.util.Random(seed)
      val n = 30
      val edges = (0 until 60).map { _ =>
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct
      // in-memory synchronous neighbor-majority, tie -> min label
      val sym = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      val adj = sym.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      var lbl = adj.keys.map(u => u -> u).toMap
      for (_ <- 1 to graft.ops.Graph.LpaRounds) {
        lbl = adj.map { case (u, nbrs) =>
          val counts = nbrs.groupBy(lbl).view.mapValues(_.size).toMap
          val best = counts.toSeq.map { case (l, c) => (-c, l) }.min._2
          u -> best
        }
      }
      val got = graft.ops.Graph.lpaLabels(edges.toDF("vec_a", "vec_b"))
        .as[(Long, Long)].collect().toMap
      assert(got === lbl, s"seed $seed")
    }
  }

  test("distributed BPE encode equals the in-memory greedy reference on random corpora") {
    for (seed <- Seq(13L, 57L)) {
      val docs = corpus(seed, 25)
        .map { case (id, t, l) => (id, t, l, "s", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      val merges = graft.ops.TextAnalysis.bpeMergesList(docs, iters = 5)
        .map(m => (m._2, m._3))
      // in-memory greedy left-to-right merge application per token
      def applyMerge(syms: List[String], l: String, r: String): List[String] =
        syms match {
          case a :: b :: rest if a == l && b == r => (l + r) :: applyMerge(rest, l, r)
          case a :: rest => a :: applyMerge(rest, l, r)
          case Nil => Nil
        }
      def encodeTok(tok: String): List[String] =
        merges.foldLeft(tok.split("").toList) { case (s, (l, r)) => applyMerge(s, l, r) }
      val texts = corpus(seed, 25).map { case (id, t, _) => id -> t }.toMap
      val allSubs = texts.values.flatMap(_.split("\\s+").filter(_.nonEmpty))
        .toSet[String].flatMap(encodeTok)
      val ids = allSubs.toSeq.sorted.zipWithIndex.toMap
      val expected = texts.map { case (id, t) =>
        val subs = t.split("\\s+").filter(_.nonEmpty).toList.flatMap(encodeTok)
        (id, subs.length.toLong, subs.map(ids).mkString(","))
      }.toSet
      val got = graft.ops.TextAnalysis.bpeEncode(docs, merges)
        .as[(Long, Long, String)].collect().toSet
      assert(got === expected, s"seed $seed")
    }
  }

  test("exactSubstrSpans equals an in-memory suffix-array + LCP reference") {
    // Literal suffix-array derivation of the Lee et al. duplicated
    // regions: concatenate the corpus with unique separator tokens,
    // sort all suffixes, compute adjacent LCPs; a position starts a
    // duplicated >=L substring iff its SA-adjacent LCP (either side)
    // is >= L; consecutive duplicated starts merge per doc. The
    // operator derives the same set via equal-first-L-token hash
    // classes — this property pins the equivalence the scaladoc
    // claims.
    val L = 4
    for (seed <- Seq(13L, 211L)) {
      val base = corpus(seed, 40)
      // plant long shared passages: cross-doc copies of slices and a
      // within-doc repetition, so maximal spans exceed L and overlap
      val toks = base.map { case (id, t, _) => id -> t.split("\\s+").filter(_.nonEmpty).toSeq }.toMap
      val donors = base.filter(_._2.split("\\s+").length >= 8).take(4)
      val planted = donors.zipWithIndex.map { case ((id, _, _), i) =>
        val src = toks(id)
        val slice = src.slice(1, 1 + math.min(6, src.length - 1))
        val body = (slice ++ Seq(s"mid$i") ++ slice).mkString(" ") // within-doc repeat
        (1000L + i, body, "en")
      }
      val rows = base ++ planted
      val docToks = rows.map { case (id, t, _) =>
        id -> t.split("\\s+").filter(_.nonEmpty).toVector }
      // ---- in-memory suffix array over the separated concatenation
      val seqB = Vector.newBuilder[String]
      val ownB = Vector.newBuilder[(Long, Int)]
      docToks.foreach { case (id, ts) =>
        ts.zipWithIndex.foreach { case (t, i) => seqB += t; ownB += ((id, i)) }
        seqB += s"@sep$id@"; ownB += ((-1L, -1))
      }
      val s = seqB.result(); val own = ownB.result(); val n = s.length
      implicit val sfxOrd: Ordering[Vector[String]] =
        Ordering.Implicits.seqOrdering[Vector, String]
      val sa = (0 until n).sortBy(i => s.drop(i))
      def lcp(a: Int, b: Int): Int = {
        var k = 0
        while (a + k < n && b + k < n && s(a + k) == s(b + k)) k += 1
        k
      }
      val adj = (1 until n).map(r => lcp(sa(r - 1), sa(r)))
      val dupStarts = (0 until n).filter { r =>
        (r > 0 && adj(r - 1) >= L) || (r < n - 1 && adj(r) >= L)
      }.map(sa).map(own).filter(_._1 >= 0)
      val expected = dupStarts.groupBy(_._1).flatMap { case (id, ps) =>
        val sorted = ps.map(_._2).sorted
        // coverage-union merge: start p joins the island iff its
        // window overlaps/touches the previous start's (gap <= L)
        val islands = sorted.foldLeft(List.empty[List[Int]]) {
          case (h :: t, p) if p <= h.head + L => (p :: h) :: t
          case (acc, p) => List(p) :: acc
        }.map(_.reverse)
        islands.map { isl =>
          (id, isl.head.toLong, (isl.last + L - 1).toLong,
            (isl.last - isl.head + L).toLong, isl.size.toLong)
        }
      }.toSet
      val got = Dedup.exactSubstrSpans(
        rows.toDF("doc_id", "text", "lang"), minTokens = L)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(got === expected, s"seed $seed")
    }
  }

  test("MaxScore pruning is lossless on random workload-vocabulary corpora") {
    // the x226 algebra (boot θ ≤ true k-th score; Σ non-essential ub
    // < θ) must force pruned-top-k ≡ exact-top-k on ANY corpus; random
    // tf/dl profiles over the workload vocabulary probe boundary cases
    // the fixture can't (near-tie totals, single-doc terms, θ absent)
    val vocab = graft.ops.Search.Queries.flatMap(_._2).distinct.toVector ++
      Vector("pad1", "pad2", "pad3", "pad4")
    val params = Gen.Parameters.default
    for (seed <- Seq(7L, 21L, 77L)) {
      val gen = for {
        n <- Gen.choose(2, 18)
        toks <- Gen.listOfN(n, Gen.oneOf(vocab))
      } yield toks.mkString(" ")
      val rows = (0 until 60).map { i =>
        val text = gen.pureApply(params, rng.Seed(seed + i), 100)
        (i.toLong, text, "en", "s", text.length.toLong)
      }
      val got = graft.ops.Search.maxScoreAudit(
        rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
        .select(col("n_exact"), col("hits"), col("n_matching"),
          col("n_candidates"))
        .as[(Long, Long, Long, Long)].collect()
      assert(got.nonEmpty, s"seed $seed")
      got.foreach { case (ne, h, nm, nc) =>
        assert(h === ne, s"seed $seed: pruning lost a top-k doc")
        assert(nc <= nm, s"seed $seed")
      }
    }
  }

  test("as-of tolerance join equals an in-memory reference on random events") {
    val params = Gen.Parameters.default
    for (seed <- Seq(5L, 55L)) {
      val gen = for {
        user <- Gen.choose(1L, 8L)
        tpe <- Gen.oneOf("purchase", "signup", "click")
        // day-scale gaps so the 7-day tolerance actually splits cases
        ms <- Gen.choose(0L, 30L * 24 * 3600 * 1000)
      } yield (user, tpe, ms)
      val evs = (0 until 120).map { i =>
        val (u, t, ms) = gen.pureApply(params, rng.Seed(seed + i), 100)
        (i.toLong, t, u, new java.sql.Timestamp(ms))
      }
      val df = evs.toDF("event_id", "event_type", "user_id", "ts")
      val got = graft.ops.Temporal.purchaseAsofTolerance(df)
        .select(col("buy_id"), col("signup_id"), col("lag_ms"), col("matched"))
        .as[(Long, Option[Long], Option[Long], Boolean)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
      val signups = evs.filter(_._2 == "signup")
      val expected = evs.filter(_._2 == "purchase").map { case (id, _, u, ts) =>
        val buyMs = ts.getTime
        val prior = signups.filter(s => s._3 == u && s._4.getTime <= buyMs)
        // engine tie-break: latest ms wins; at equal ms the max id
        val best = prior.sortBy(s => (s._4.getTime, s._1)).lastOption
        val fresh = best.filter(s =>
          buyMs - s._4.getTime <= graft.ops.Temporal.AsofTolMs)
        id -> ((fresh.map(_._1), fresh.map(s => buyMs - s._4.getTime),
          fresh.nonEmpty))
      }.toMap
      assert(got === expected, s"seed $seed")
    }
  }
}
