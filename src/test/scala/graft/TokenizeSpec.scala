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
