package graft

import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis

/** Pins x60-x62: dictionary encoding, packed offsets, domain capping. */
class TokenizeSpec extends SparkSpec {
  import spark.implicits._

  test("x117 BPE training reproduces the classic merge trajectory by hand") {
    // Sennrich-style corpus: low×3 lower×2 newest×4 widest×1.
    // Hand-derived with (count DESC, l, r) tie-breaks:
    //  1 (w,e,6)  2 (l,o,5)  3 (s,t,5)  4 (e,we,4)
    //  5 (ewe,st,4)  6 (n,ewest,4)  7 (lo,w,3)  8 (lo,we,2)
    val docs = Seq(
      (1L, "low low low lower lower newest newest", "en"),
      (2L, "newest newest widest", "en")
    ).toDF("doc_id", "text", "lang")
    val merges = TextAnalysis.bpeTrain(docs).collect()
      .map(r => (r.getAs[Long]("merge_rank"), r.getAs[String]("lsym"),
        r.getAs[String]("rsym"), r.getAs[Long]("pair_count"))).sortBy(_._1)
    assert(merges === Array(
      (1L, "w", "e", 6L), (2L, "l", "o", 5L), (3L, "s", "t", 5L),
      (4L, "e", "we", 4L), (5L, "ewe", "st", 4L), (6L, "n", "ewest", 4L),
      (7L, "lo", "w", 3L), (8L, "lo", "we", 2L)))
  }

  test("x117 greedy apply: back-to-back and overlapping occurrences behave like BPE") {
    // 'ababab' must merge every (a,b) pair — the shared-delimiter
    // replace has to catch back-to-back occurrences; 'aaa' must merge
    // greedily left-to-right to [aa, a], not [a, aa]
    val docs = Seq((1L, "ababab aaa", "en")).toDF("doc_id", "text", "lang")
    val m = TextAnalysis.bpeTrain(docs, iters = 2).collect()
      .map(r => (r.getAs[Long]("merge_rank"), r.getAs[String]("lsym"),
        r.getAs[String]("rsym"), r.getAs[Long]("pair_count"))).sortBy(_._1)
    // iter1 pairs: (a,b)=3, (b,a)=2, (a,a)=2 → merge (a,b) 3
    // after: ababab=[ab,ab,ab], aaa untouched
    // iter2 pairs: (ab,ab)=2, (a,a)=2 → tie, 'a' < 'ab' → (a,a) 2
    assert(m === Array((1L, "a", "b", 3L), (2L, "a", "a", 2L)))
  }

  test("x223 Viterbi fold equals brute-force min-cost enumeration with the boundary tie-break") {
    // The DP==enumeration equivalence the DuckDB oracle leans on:
    // enumerate every segmentation of random words over a random
    // piece-cost table (single chars always present), select min by
    // (total cost, reversed boundary list), and require the
    // uniViterbiPieces trajectory to agree exactly — costs are drawn
    // from a tiny set so ties are COMMON, which is the point.
    val rnd = new scala.util.Random(42)
    val alphabet = "abc"
    val words = (1 to 40).map(_ =>
      (1 to (1 + rnd.nextInt(9))).map(_ => alphabet(rnd.nextInt(3))).mkString)
      .distinct
    val pieces = scala.collection.mutable.Map[String, Long]()
    for (c <- alphabet) pieces(c.toString) = 1L + rnd.nextInt(3)
    for (w <- words; i <- 0 until w.length;
         l <- 2 to math.min(TextAnalysis.UniMaxPiece, w.length - i))
      if (rnd.nextBoolean())
        pieces(w.substring(i, i + l)) = 1L + rnd.nextInt(3)
    def enumerate(w: String): Seq[(Long, List[Int], List[String])] = {
      def go(pos: Int): Seq[(Long, List[Int], List[String])] =
        if (pos == 0) Seq((0L, List(0), Nil))
        else for {
          j <- (math.max(0, pos - TextAnalysis.UniMaxPiece) until pos).toSeq
          piece = w.substring(j, pos)
          if pieces.contains(piece)
          (c, revb, ps) <- go(j)
        } yield (c + pieces(piece), pos :: revb, ps :+ piece)
      // revb built naturally descending — [n, j_k, ..., 0], exactly
      // the list the oracle's ORDER BY compares
      go(w.length)
    }
    def lexLess(a: List[Int], b: List[Int]): Boolean = (a, b) match {
      case (x :: xs, y :: ys) => if (x != y) x < y else lexLess(xs, ys)
      case (Nil, _ :: _) => true
      case _ => false
    }
    val expected = words.map { w =>
      w -> enumerate(w).minBy(identity)(Ordering.fromLessThan[(Long, List[Int], List[String])] {
        case ((c1, b1, _), (c2, b2, _)) => c1 < c2 || (c1 == c2 && lexLess(b1, b2))
      })._3
    }.toMap
    val sorted = pieces.toSeq.sortBy(_._1)
    val costCol = map_from_arrays(typedlit(sorted.map(_._1)), typedlit(sorted.map(_._2)))
    val got = words.toDF("w")
      .withColumn("dp", TextAnalysis.uniViterbiDp(col("w"), costCol))
      .select(col("w"), TextAnalysis.uniViterbiPieces(col("w"), col("dp")).as("ps"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    for (w <- words)
      assert(got(w) === expected(w), s"word $w: dp ${got(w)} vs enum ${expected(w)}")
    // and every selection concatenates back to its word
    for (w <- words) assert(got(w).mkString === w)
  }

  test("x223 unigram training: totality, char floor and prune bound") {
    val docs = Seq(
      (1L, "low low lower newest newest widest wide", "en"),
      (2L, "newest low wide widest lower", "en")
    ).toDF("doc_id", "text", "lang")
    val ps = TextAnalysis.unigramPiecesList(docs)
    val byPiece = ps.map(p => p._1 -> p).toMap
    // every single character of the vocabulary survives every prune
    val chars = "lowernstid wide".replace(" ", "").toSet
    for (c <- chars) assert(byPiece.contains(c.toString), s"char $c pruned")
    // the kept set is bounded by target + alphabet
    assert(ps.size <= TextAnalysis.UniTargetVocab + chars.size)
    // n_uses is a real usage count: total piece uses cover every word
    // occurrence (7 + 5 words, each ≥ 1 piece)
    assert(ps.map(_._2).sum >= 12L)
    // costs are positive (−ln p of a proper distribution) and finite
    assert(ps.forall(p => p._3 > 0 && p._3 < TextAnalysis.UniInfCost))
  }

  test("x223 seed candidates are limit-bounded ENGINE-SIDE before collect") {
    val docs = Seq(
      (1L, "low low lower newest newest widest wide", "en"),
      (2L, "newest low wide widest lower", "en")
    ).toDF("doc_id", "text", "lang")
    val wc = TextAnalysis.withTokens(docs)
      .select(explode(col("toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
    val seed = TextAnalysis.uniSeedCandidates(wc)
    // the prune runs in the engine: the plan carries a Limit node, so
    // the driver-side collect only ever holds a model-sized frame
    val plan = seed.queryExecution.optimizedPlan.toString
    assert(plan.contains("Limit") || plan.contains("TakeOrdered"),
      s"no engine-side limit in seed plan:\n$plan")
    val chars = "lowernstid wide".replace(" ", "").toSet
    assert(seed.count() <= TextAnalysis.UniSeedCap + chars.size)
    // single-character floor survives the prune with real counts
    val rows = seed.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (c <- chars) assert(rows.contains(c.toString), s"char $c missing")
    assert(rows.keySet.count(_.length > 1) <= TextAnalysis.UniSeedCap)
  }

  test("tokenIds: dense sorted vocab ids, per-doc order preserved") {
    val docs = Seq(
      (1L, "b a c a", "en"),
      (2L, "c b", "en")
    ).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.tokenIds(docs)
      .select("doc_id", "n_tokens", "ids_csv")
      .as[(Long, Long, String)].collect().map(r => r._1 -> r).toMap
    // vocab sorted: a=0, b=1, c=2
    assert(out(1L) === ((1L, 4L, "1,0,2,0")))
    assert(out(2L) === ((2L, 2L, "2,1")))
  }

  test("tokenIds: two-phase ids equal the single-sort dense rank on a wide vocab") {
    // 4k distinct tokens spread over every range partition — pins that
    // the per-range local ranks + cumulative offsets reproduce the
    // global dense rank exactly (the scale-safe replacement for a
    // single-partition vocabulary sort)
    val docs = (0 until 200).map { d =>
      val toks = (0 until 20).map(i => f"t${(d * 37 + i * 101) % 4096}%05d")
      (d.toLong, toks.mkString(" "), "en")
    }.toDF("doc_id", "text", "lang")
    val vocabSorted = (0 until 200).flatMap(d =>
      (0 until 20).map(i => f"t${(d * 37 + i * 101) % 4096}%05d"))
      .distinct.sorted.zipWithIndex.toMap
    val expect = (0 until 200).map { d =>
      d.toLong -> (0 until 20)
        .map(i => vocabSorted(f"t${(d * 37 + i * 101) % 4096}%05d")).mkString(",")
    }.toMap
    val got = TextAnalysis.tokenIds(docs).select("doc_id", "ids_csv")
      .as[(Long, String)].collect().toMap
    assert(got === expect)
  }

  test("packOffsets: offsets restart per bin and sum consistently with packBins") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val off = TextAnalysis.packOffsets(docs)
    // a doc's START always lies inside the budget (bins may overflow
    // past it — docs are never split, same as x36)
    assert(off.filter(col("offset") < 0 || col("offset") >= TextAnalysis.PackBudget)
      .count() === 0L)
    // contiguity: within (lang, bin) in doc order, each doc starts
    // where the previous ended relative to the bin base
    val rows = off.select("lang", "bin", "doc_id", "n_tokens", "offset")
      .as[(String, Long, Long, Long, Long)].collect()
      .groupBy(r => (r._1, r._2)).values
    rows.foreach { group =>
      group.sortBy(_._3).sliding(2).foreach {
        case Array((_, b1, _, n1, o1), (_, b2, _, _, o2)) if b1 == b2 =>
          assert(o2 === o1 + n1)
        case _ => ()
      }
    }
    // doc counts per bin agree with the x36 summary
    val fromOff = off.groupBy(col("lang"), col("bin")).count()
    val fromBins = TextAnalysis.packBins(docs).select(col("lang"), col("bin"), col("n_docs"))
    assert(fromOff.join(fromBins, Seq("lang", "bin"))
      .filter(col("count") =!= col("n_docs")).count() === 0L)
  }

  test("domainCap keeps exactly k per source and plans a WindowGroupLimit") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = TextAnalysis.domainCap(docs)
    out.collect()
    val perSource = out.groupBy(col("source")).count().select("count")
      .as[Long].collect().toSet
    assert(perSource === Set(TextAnalysis.DomainCapK.toLong),
      "every fixture source holds ≥ k docs, so each is capped exactly")
    // the rank<=k filter must push into the sort as a group limit —
    // this is what keeps a hot domain from being fully sorted at scale
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), s"expected WindowGroupLimit in:\n$p")
  }
}
