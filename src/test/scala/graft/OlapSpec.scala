package graft

import java.sql.Timestamp

import graft.ops.{DataProfile, Olap, TextAnalysis}

/** Pins x70-x73: melt fixed-point stats, expectation rule counting,
  * CUBE grouping-set semantics, BPE pair-merge counts. */
class OlapSpec extends SparkSpec {
  import spark.implicits._

  private def ts(ms: Long) = new Timestamp(ms)

  test("meltStats: one row per measure, exact fixed-point sums") {
    val li = Seq(
      (1.0, 10.0, 0.05, 0.02),
      (2.0, 20.5, 0.0, 0.08)
    ).toDF("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val out = Olap.meltStats(li)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out("l_quantity") === ((2L, 300L, 100L, 200L)))
    assert(out("l_extendedprice") === ((2L, 3050L, 1000L, 2050L)))
    assert(out("l_discount") === ((2L, 500L, 0L, 500L)))
    assert(out("l_tax") === ((2L, 1000L, 200L, 800L)))
  }

  test("cubeSales: four grouping sets, margins consistent with detail") {
    val ords = Seq(
      (1L, "1-URGENT", 10.0, ts(0L)),
      (2L, "1-URGENT", 20.0, ts(366L * 86400000L)), // next year
      (3L, "2-HIGH", 40.0, ts(0L))
    ).toDF("o_orderkey", "o_orderpriority", "o_totalprice", "o_orderdate")
    val rows = Olap.cubeSales(ords)
      .as[(Option[String], Option[Long], Long, Long, Long)].collect()
    val byGid = rows.groupBy(_._3)
    assert(byGid.keySet === Set(0L, 1L, 2L, 3L))
    val grand = byGid(3L).head
    assert((grand._4, grand._5) === ((3L, 7000L)))
    assert(byGid(0L).map(_._5).sum === 7000L, "detail cells sum to the grand total")
    assert(byGid(1L).map(r => r._1.get -> r._5).toMap ===
      Map("1-URGENT" -> 3000L, "2-HIGH" -> 4000L), "per-priority margin")
    assert(byGid(2L).map(_._4).sum === 3L, "per-year margin covers all rows")
  }

  test("expectations: scalar rules and the referential rule count violations") {
    val li = Seq(
      (1L, 99.0, 10.0, 0.05, Some(ts(1000L))),   // quantity out of range
      (1L, 2.0, -5.0, 0.5, Some(ts(1000L))),     // price + discount violations
      (7L, 3.0, 10.0, 0.0, None),                // null shipdate, orphan orderkey
      (2L, 4.0, 10.0, 0.1, Some(ts(1000L)))      // clean
    ).toDF("l_orderkey", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate")
    val ords = Seq((1L, "O", 10.0), (2L, "X", -1.0))
      .toDF("o_orderkey", "o_orderstatus", "o_totalprice")
    val out = DataProfile.expectations(li, ords)
      .as[(String, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("li_quantity_range") === (("lineitem", 4L, 1L)))
    assert(out("li_discount_range") === (("lineitem", 4L, 1L)))
    assert(out("li_price_positive") === (("lineitem", 4L, 1L)))
    assert(out("li_shipdate_nonnull") === (("lineitem", 4L, 1L)))
    assert(out("li_orderkey_ref") === (("lineitem", 4L, 1L)))
    assert(out("ord_status_domain") === (("orders", 2L, 1L)))
    assert(out("ord_price_positive") === (("orders", 2L, 1L)))
    assert(out.size === 7)
  }

  test("bpePairs: pair counts weighted by token frequency") {
    val docs = Seq((1L, "ab ab abc", "en", "s", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.bpePairs(docs).as[(String, Long)].collect().toMap
    // vocab: ab(freq 2) -> pair "ab"x2; abc(freq 1) -> pairs "ab","bc"
    assert(out === Map("ab" -> 3L, "bc" -> 1L))
  }

  test("bpePairs: single-char tokens contribute nothing; top-k ordering is (count desc, pair)") {
    val docs = Seq((1L, "a a a xy xy yz", "en", "s", 14L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.bpePairs(docs).as[(String, Long)].collect()
    assert(out.toSeq === Seq("xy" -> 2L, "yz" -> 1L))
  }

  test("weightedSample: picks ∝ weight, total picks = tot div step, heavy doc multi-picked") {
    val docs = (1L to 4L).map(i => (i, "t", "en", "s", 10L)) :+ ((5L, "t", "en", "s", 960L))
    val out = TextAnalysis.weightedSample(
        docs.toDF("doc_id", "text", "lang", "source", "n_chars"))
      .as[(Long, String, Long, Long)].collect()
    // tot=1000, k=20 -> step=50; the spanning construction hands out
    // exactly tot div step picks regardless of the hash order
    assert(out.map(_._4).sum === 20L)
    val heavy = out.find(_._1 == 5L).get
    assert(heavy._4 >= 19L, s"960/50 spans at least 19 step marks: $heavy")
    out.filter(_._1 != 5L).foreach(r => assert(r._4 === 1L, s"light doc over-picked: $r"))
  }

  test("medianFilter: lower median per language, ties to the concrete ranked row") {
    val docs = ((1L to 5L).map(i => (i, "t", "aa", "s", i)) ++
      (11L to 14L).map(i => (i, "t", "bb", "s", i - 10L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.medianFilter(docs)
      .as[(Long, String, Long, Long)].collect().toSet
    // aa: n=5 -> median = 3rd of (1..5) = 3; bb: n=4 -> lower median = 2nd = 2
    assert(out === Set((3L, "aa", 3L, 3L), (4L, "aa", 4L, 3L), (5L, "aa", 5L, 3L),
      (12L, "bb", 2L, 2L), (13L, "bb", 3L, 2L), (14L, "bb", 4L, 2L)))
  }

  test("tfidfCosinePairs: identical docs score 1.0, disjoint docs never pair") {
    val t1 = "alpha beta gamma delta"
    val docs = Seq((1L, t1, "en", "s", 22L), (2L, t1, "en", "s", 22L),
      (3L, "zig zag zoom zip epsilon", "en", "s", 24L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = graft.ops.Dedup.tfidfCosinePairs(docs)
      .as[(Long, Long, Double)].collect().toSeq
    assert(out === Seq((1L, 2L, 1.0)))
  }
}
