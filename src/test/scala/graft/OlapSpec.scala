package graft

import java.sql.Timestamp

import graft.ops.{DataProfile, Events, Multimodal, Olap, TextAnalysis}

/** Pins the round-3 batch x70-x80: melt fixed-point stats, expectation
  * rule counting, CUBE grouping-set semantics, BPE pair-merge counts,
  * weighted sampling, median gate, sparse cosine, PCM frame energy,
  * split JSD, session transitions, equi-depth histograms. */
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

  test("frameEnergy: signed LE16 words, exact squares, frame split at FrameLen") {
    // "AB" -> bytes 65,66 -> word 65 + 66*256 = 16961; one frame
    val docs = Seq((1L, "AB", "en", "s", 2L), (2L, "ABC", "en", "s", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Multimodal.frameEnergy(spark, docs)
      .collect().map(f => f.doc_id -> ((f.frame_idx, f.n_words, f.energy))).toMap
    assert(out(1L) === ((0L, 1L, 16961L * 16961L)))
    assert(out(2L) === ((0L, 1L, 16961L * 16961L)), "odd trailing byte ignored")
    // 70 chars -> 35 words -> frames of 32 + 3
    val long = Seq((3L, "A" * 70, "en", "s", 70L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val frames = Multimodal.frameEnergy(spark, long)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(f => (f.frame_idx, f.n_words)).toSeq === Seq((0L, 32L), (1L, 3L)))
    val w = 65L + 65L * 256L
    assert(frames.head.energy === 32L * w * w)
  }

  test("splitDivergence matches a hand-computed JSD over the real split counts") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val counts = TextAnalysis.splitAssign(docs)
      .groupBy("lang", "split").count()
      .as[(String, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    val langs = counts.keys.toSeq.sorted
    def n(l: String, s: String) = counts(l).getOrElse(s, 0L)
    def tot(s: String) = langs.map(n(_, s)).sum.toDouble
    def jsd(a: String, b: String): Double = {
      def h(p: Double) = if (p > 0) -p * math.log(p) else 0.0
      val acc = langs.foldLeft(0.0) { (acc, l) =>
        val pa = n(l, a) / tot(a); val pb = n(l, b) / tot(b)
        acc + (h((pa + pb) / 2.0) - (h(pa) + h(pb)) / 2.0)
      }
      math.floor(acc * 10000 + 0.5) / 10000
    }
    val out = TextAnalysis.splitDivergence(docs).as[(String, Double)].collect().toMap
    assert(out.keySet === Set("train_val", "train_test", "val_test"))
    assert(out("train_val") === jsd("train", "val"))
    assert(out("train_test") === jsd("train", "test"))
    assert(out("val_test") === jsd("val", "test"))
  }

  test("sessionTransitions: pairs never cross the session gap") {
    val gap = Events.SessionGapMs
    val evs = Seq(
      (1L, ts(0L), 7L, "view", 0.0, "{}"),
      (2L, ts(1000L), 7L, "click", 0.0, "{}"),
      (3L, ts(1000L + gap + 1000L), 7L, "view", 0.0, "{}"),
      (4L, ts(1000L + gap + 2000L), 7L, "purchase", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Events.sessionTransitions(evs)
      .as[(String, String, Long)].collect().toSet
    assert(out === Set(("view", "click", 1L), ("view", "purchase", 1L)))
  }

  test("equiDepthHist: ntile quartiles with deterministic tie-break") {
    val evs = (1L to 8L).map(i => (i, ts(i * 1000L), 7L, "view", i.toDouble, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Events.equiDepthHist(evs)
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._2)
    assert(out.map(r => (r._2, r._3, r._4, r._5)).toSeq === Seq(
      (1L, 2L, 100L, 200L), (2L, 2L, 300L, 400L),
      (3L, 2L, 500L, 600L), (4L, 2L, 700L, 800L)))
  }

  test("x119 compaction: sequential size-ordered packing respects bin geometry") {
    val li = graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val out = graft.ops.Olap.compactionPlan(li).collect()
      .map(r => ((r.getAs[String]("l_returnflag"), r.getAs[String]("l_linestatus")),
        (r.getAs[Long]("file_id"), r.getAs[Long]("size_bytes"), r.getAs[Long]("bin"))))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(out.nonEmpty)
    val target = graft.ops.Olap.CompactTargetBytes
    for ((_, files) <- out) {
      // re-derive the bin from the size-ordered cumulative offset
      val ordered = files.sortBy(f => (f._2, f._1))
      var cum = 0L
      for ((_, size, bin) <- ordered) {
        assert(bin === cum / target, s"bin mismatch at cum=$cum size=$size")
        cum += size
      }
      // bins start at 0 and are contiguous
      val bins = ordered.map(_._3)
      assert(bins.head === 0L && bins.distinct === bins.distinct.sorted)
    }
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
