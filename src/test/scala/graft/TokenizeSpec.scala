package graft

import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis

/** Pins x60-x62: dictionary encoding, packed offsets, domain capping. */
class TokenizeSpec extends SparkSpec {
  import spark.implicits._

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
