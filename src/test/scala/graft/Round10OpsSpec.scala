package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions.when

import graft.ops.{Events, Graph, Olap, QualityFilters}

/** Pins the x175–x179 batch: item-neighbor cosine ranking, linear
  * attribution credit, quantile-normalization position mapping,
  * Adamic–Adar scoring, and the HHI closed form. */
class Round10OpsSpec extends SparkSpec {
  import spark.implicits._

  test("itemNeighbors: cosine ranks neighbors per item with name tiebreak") {
    val part = Seq((1L, "B1"), (2L, "B2"), (3L, "B3"))
      .toDF("p_partkey", "p_brand")
    // baskets: {B1,B2} ×2, {B1,B3} ×1, {B1} ×1 → n: B1=4, B2=2, B3=1
    val li = Seq(
      (10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L),
      (12L, 1L), (12L, 3L), (13L, 1L)
    ).toDF("l_orderkey", "l_partkey")
    val got = Olap.itemNeighbors(li, part)
      .as[(String, String, Long, Double, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    // B1: B2 cos 2/sqrt(8)=0.7071 rank1; B3 cos 1/sqrt(4)=0.5 rank2
    assert(got(("B1", "B2")) === ((2L, 0.7071, 1L)))
    assert(got(("B1", "B3")) === ((1L, 0.5, 2L)))
    assert(got(("B2", "B1")) === ((2L, 0.7071, 1L)))
    assert(got(("B3", "B1")) === ((1L, 0.5, 1L)))
    assert(got.size === 4)
  }

  private def ev(id: Long, user: Long, typ: String, ms: Long) =
    (id, new Timestamp(ms), user, typ, 1.0, "{}")

  test("linearAttribution splits credit over strictly-preceding views in session") {
    val rows = Seq(
      ev(1, 1, "view", 1000), ev(2, 1, "view", 2000),
      ev(3, 1, "purchase", 3000),
      ev(4, 1, "view", 4000), // after the purchase — no credit
      // second user: purchase with no preceding view → no rows
      ev(5, 2, "purchase", 1000), ev(6, 2, "view", 2000))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Events.linearAttribution(rows)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got === Set((3L, 1L, 2L, 0.5), (3L, 2L, 2L, 0.5)))
  }

  test("quantileNormalize maps each source rank to the global midpoint score") {
    // two sources with disjoint score ranges (per-doc text drives the
    // x107 score; use n_chars-independent fixed texts so scores order
    // by construction is stable) — here we only assert STRUCTURE:
    // every doc keeps its source, norm_score comes from the global
    // score multiset, and within a source norm_score is monotone in
    // clf_score
    val docs = (1 to 20).map { i =>
      val src = if (i <= 10) "a" else "b"
      val words = (1 to (i % 7) + 2).map(j => s"w$j w$i").mkString(" ")
      (i.toLong, s"$words text", "en", src, 100L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = QualityFilters.quantileNormalize(docs)
      .as[(Long, String, Double, Double)].collect()
    assert(out.length === 20)
    val globalScores = out.map(_._3).sorted.toSeq
    assert(out.forall(r => globalScores.contains(r._4)))
    for (src <- Seq("a", "b")) {
      val s = out.filter(_._2 == src).sortBy(r => (r._3, r._1)).map(_._4)
      assert(s.sorted.toSeq === s.toSeq, s"monotone in $src")
    }
  }

  test("adamicAdar scores open wedges only, exact integer contributions") {
    // path graph 1-2-3 plus hub 2-4: wedges at 2: (1,3),(1,4),(3,4)
    // deg(2)=3 → c = floor(1e6/ln 3 + .5) = 910239
    val edges = Seq((1L, 2L), (2L, 3L), (2L, 4L)).toDF("doc_a", "doc_b")
    val got = Graph.adamicAdarFrom(edges)
      .as[(Long, Long, Long, Double)].collect().toSet
    val c = math.floor(1e6 / math.log(3.0) + 0.5) / 1e6
    val want = math.floor(c * 10000 + 0.5) / 10000
    assert(got === Set((1L, 3L, 1L, want), (1L, 4L, 1L, want), (3L, 4L, 1L, want)))
  }

  test("kmSurvival: censoring leaves the risk set without failing") {
    val day = 86400000L
    val rows = Seq(
      // user 1: view day0, purchase day1 → event at t=1
      ev(1, 1, "view", 0), ev(2, 1, "purchase", day),
      // user 2: view day0, never purchases → censored at horizon t=2
      ev(3, 2, "view", 0),
      // user 3: purchase BEFORE the first view → censored (no valid event)
      ev(4, 3, "purchase", 0), ev(5, 3, "view", day),
      // horizon marker: last event at day2
      ev(6, 2, "error", 2 * day))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Events.kmSurvival(rows).orderBy("t_day")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    // t=1: user1 event, user3 censored (horizon day2 − view day1 = 1):
    //   n=3, d=1, c=1 → S = 1 − 1/3 = 0.6667
    // t=2: user2 censored: n=1, d=0, c=1 → S unchanged
    assert(got === Seq(
      (1L, 3L, 1L, 1L, 0.6667),
      (2L, 1L, 0L, 1L, 0.6667)))
  }

  test("kmSurvival: exhausting the risk set pins survival to exact 0") {
    val day = 86400000L
    val rows = Seq(
      ev(1, 1, "view", 0), ev(2, 1, "purchase", day),
      ev(3, 2, "view", 0), ev(4, 2, "purchase", day))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Events.kmSurvival(rows)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq((1L, 2L, 2L, 0L, 0.0)))
  }

  test("sqErrorAudit: in-range vectors round-trip within the int8 grid") {
    def vec(xs: Double*) = xs.map(_.toFloat).toArray
    // dim0 range [0,1], dim1 constant, dims 2-3 zero
    val rows = Seq(
      (1L, vec(0.0, 5.0, 0, 0), 0),
      (2L, vec(1.0, 5.0, 0, 0), 0),
      (3L, vec(0.5, 5.0, 0, 0), 1))
    val got = graft.ops.Similarity.sqErrorAudit(
      rows.toDF("vec_id", "embedding", "label"))
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // endpoints and constant dims reconstruct exactly
    assert(got(0L) === ((0L, 2L, 0.0, 0.0)))
    // 0.5 → q=round(127.5)=128 → xr=128/255 → err=(0.5−128/255)²≈3.84e−6
    val err = math.pow(0.5 - 128.0 / 255.0, 2)
    val e12 = math.floor(err * 1e12 + 0.5)
    val want = math.floor(e12 / 1e8 * 10000 + 0.5) / 10000
    assert(got(1L)._3 === want && got(1L)._4 === want)
  }

  test("eventuallyFollows: any-distance precedence plus the recurrence diagonal") {
    val rows = Seq(
      // session 1 (user 1): view, cart, view, purchase
      ev(1, 1, "view", 1000), ev(2, 1, "cart", 2000),
      ev(3, 1, "view", 3000), ev(4, 1, "purchase", 4000),
      // session 2 (user 2): purchase only
      ev(5, 2, "purchase", 1000))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Events.eventuallyFollows(rows)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // view→purchase, view→cart (pos1 < cart), cart→view (cart < view@3),
    // cart→purchase, view→view (recurs); NOT purchase→anything
    assert(got(("view", "purchase")) === ((1L, 0.5)))
    assert(got(("view", "cart")) === ((1L, 0.5)))
    assert(got(("cart", "view")) === ((1L, 0.5)))
    assert(got(("cart", "purchase")) === ((1L, 0.5)))
    assert(got(("view", "view")) === ((1L, 0.5)))
    assert(!got.contains(("purchase", "view")))
    assert(got.size === 5)
  }

  test("vocabCoverage: power-of-two buckets accumulate the exact token mass") {
    // token frequencies: a×8, b×4, c×2, d×1, e×1 → total 16
    val docs = Seq(
      (1L, "a a a a a a a a b b b b", "en", "s", 10L),
      (2L, "c c d e", "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = graft.ops.TextAnalysis.vocabCoverage(docs)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    // rank1=a(8) → k1; rank2=b(4) → k2; ranks 3,4=c,d → k4; rank5=e → k8
    assert(got(1L) === ((1L, 8L, 8L, 0.5)))
    assert(got(2L) === ((2L, 4L, 12L, 0.75)))
    assert(got(4L) === ((4L, 3L, 15L, 0.9375)))
    assert(got(8L) === ((8L, 1L, 16L, 1.0)))
    assert(got.size === 4)
  }

  test("dedupReport: histogram, shares and removable counts are exact") {
    val clusters = Seq(
      (1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L), // one 3-cluster
      (4L, 4L, 2L), (5L, 4L, 2L),               // one 2-cluster
      (6L, 6L, 2L), (7L, 6L, 2L)                // another 2-cluster
    ).toDF("doc_id", "cluster_id", "n_members")
    val got = graft.ops.Dedup.dedupReport(clusters)
      .as[(Long, Long, Long, Double, Long)].collect().toSet
    assert(got === Set(
      (3L, 1L, 3L, math.floor(3.0 / 7 * 10000 + 0.5) / 10000, 2L),
      (2L, 2L, 4L, math.floor(4.0 / 7 * 10000 + 0.5) / 10000, 2L)))
  }

  test("dqChecks flags exactly the injected violations") {
    val customer = Seq((1L, "a")).toDF("c_custkey", "c_name")
    val part = Seq((1L, "p"), (1L, "p2"), (2L, "q"))
      .toDF("p_partkey", "p_name") // duplicate partkey 1
    val orders = Seq(
      (10L, 1L, Timestamp.valueOf("1995-06-01 00:00:00")),
      (11L, 9L, Timestamp.valueOf("1995-06-01 00:00:00")), // orphan custkey
      (12L, 1L, Timestamp.valueOf("1990-01-01 00:00:00"))  // out of range
    ).toDF("o_orderkey", "o_custkey", "o_orderdate")
    val li = Seq(
      (10L, 1L, 5.0, 100.0, 0.1, 0.02),
      (99L, 1L, 1.0, 100.0, 0.1, 0.02),  // orphan orderkey
      (10L, 7L, 1.0, 100.0, 0.1, 0.02),  // orphan partkey
      (10L, 2L, 0.0, 100.0, 0.1, 0.02),  // qty not positive
      (10L, 2L, 1.0, -5.0, 0.9, 0.02)    // negative price + discount range
    ).toDF("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice",
      "l_discount", "l_tax")
    val got = graft.ops.DataProfile.dqChecks(orders, li, customer, part)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got("fk_orders_custkey") === ((1L, 0L)))
    assert(got("fk_lineitem_orderkey") === ((1L, 0L)))
    assert(got("fk_lineitem_partkey") === ((1L, 0L)))
    assert(got("unique_part_partkey") === ((1L, 0L)))
    assert(got("range_l_quantity_positive") === ((1L, 0L)))
    assert(got("range_l_extendedprice_nonneg") === ((1L, 0L)))
    assert(got("range_l_discount_0_05") === ((1L, 0L)))
    assert(got("range_o_orderdate_1992_1998") === ((1L, 0L)))
  }

  test("measureCorrelation: perfectly coupled measures score ±1") {
    // price = 100·qty (r=+1); discount = 0.5 − 0.01·qty (r=−1); tax constant
    val li = (1 to 20).map { i =>
      (i.toLong, 1L, i.toDouble, i * 100.0, 0.5 - i * 0.01, 0.05)
    }.toDF("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice",
      "l_discount", "l_tax")
    val got = graft.ops.DataProfile.measureCorrelation(li)
      .as[(String, String, Option[Double])].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got(("quantity", "price_c")) === Some(1.0))
    assert(got(("quantity", "discount_bp")) === Some(-1.0))
    // the constant tax leg has zero variance → NULL guard
    assert(got(("quantity", "tax_bp")) === None)
    assert(got(("price_c", "discount_bp")) === Some(-1.0))
    assert(got.size === 6)
  }

  test("diffInDiff nets the common trend out of the treated delta") {
    val day = 86400000L
    // corpus spans [0, 4d] → mid = 2d; variant = user parity
    // A (even users): pre 0/1 converts, post 1/1 → delta_a = +1
    // B (odd users): pre 0/1, post 1/1 → did = 0
    val rows = Seq(
      ev(1, 2, "view", 0), ev(2, 2, "purchase", 3 * day),
      ev(3, 3, "view", 0), ev(4, 3, "purchase", 3 * day),
      ev(5, 2, "error", 4 * day))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      // value 1.0 → 100 cents < AbConvCents: raise purchases to qualify
      .withColumn("value",
        when($"event_type" === "purchase", 200.0).otherwise($"value"))
    val got = Events.diffInDiff(rows)
      .as[(Double, Double, Double, Double, Double, Double, Double)]
      .collect().head
    assert(got === ((0.0, 1.0, 0.0, 1.0, 1.0, 1.0, 0.0)))
  }

  test("bootstrapCi: CI brackets the mean and collapses for constant data") {
    val docs = (
      (1 to 200).map(i => (i.toLong, "t", "en", "varied", (i * 7 % 100 + 50).toLong)) ++
      (201 to 400).map(i => (i.toLong, "t", "en", "flat", 100L))
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = graft.ops.DataProfile.bootstrapCi(docs)
      .as[(String, Long, Double, Option[Double], Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    val (_, nV, mV, loV, hiV) = got("varied")
    assert(nV === 200L)
    assert(loV.get <= mV && mV <= hiV.get)
    assert(hiV.get > loV.get) // real dispersion → nonzero width
    val (_, _, mF, loF, hiF) = got("flat")
    // constant outcome: every replicate mean is exactly 100
    assert(mF === 100.0 && loF === Some(100.0) && hiF === Some(100.0))
  }

  test("sessionRegularity: exact gap variance, regular flag on tight spreads") {
    val rows = Seq(
      // user 1: gaps exactly 1000, 1000 → var 0, regular
      ev(1, 1, "view", 0), ev(2, 1, "view", 1000), ev(3, 1, "view", 2000),
      // user 2: gaps 1000, 5000 → spread 4000 → not regular
      ev(4, 2, "view", 0), ev(5, 2, "view", 1000), ev(6, 2, "view", 6000),
      // user 3: only 2 events → below the min, excluded
      ev(7, 3, "view", 0), ev(8, 3, "view", 1000))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Events.sessionRegularity(rows)
      .as[(Long, Long, Long, Long, Long, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, 1L, 3L, 1000L, 1000L, 0.0, 1L)))
    // var = (2·(1e6+25e6) − 36e6)/4 = 4e6
    assert(got(2L) === ((2L, 1L, 3L, 1000L, 5000L, 4000000.0, 0L)))
    assert(!got.contains(3L))
  }

  test("ivfRecall: identical indexes score 1.0; the IVF never beats brute") {
    val emb = (0 until 300).map { i =>
      val v = Array.tabulate(64)(d => (math.sin(i * 37 + d) / 2).toFloat)
      (i.toLong, v, i % 5)
    }.toDF("vec_id", "embedding", "label")
    val vs = graft.ops.Similarity.vectors(emb)
    val cents = graft.ops.Similarity.kmeansCentroids(vs)
    val got = graft.ops.Similarity.ivfRecall(vs, cents)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (q, nb, nc, r) =>
      assert(nb === 10L, s"query $q")
      assert(nc <= nb && r <= 1.0 && r >= 0.0, s"query $q")
      assert(r === nc / 10.0, s"query $q")
    }
  }

  test("topTriples: i<j<k basket fan-out counts distinct-order support") {
    val part = Seq((1L, "B1"), (2L, "B2"), (3L, "B3"), (4L, "B4"))
      .toDF("p_partkey", "p_brand")
    val li = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L), (10L, 4L), // {B1..B4}: 4 triples
      (11L, 1L), (11L, 2L), (11L, 3L),            // {B1,B2,B3}
      (12L, 1L), (12L, 1L), (12L, 2L)             // pair only — no triple
    ).toDF("l_orderkey", "l_partkey")
    val got = graft.ops.Olap.topTriples(li, part)
      .as[(String, String, String, Long)].collect().toSeq
    assert(got.head === (("B1", "B2", "B3", 2L)))
    assert(got.toSet === Set(
      ("B1", "B2", "B3", 2L), ("B1", "B2", "B4", 1L),
      ("B1", "B3", "B4", 1L), ("B2", "B3", "B4", 1L)))
  }

  test("seasonalAnomaly flags days leaving the weekday band") {
    val day = 86400000L
    // two Thursdays (epoch day 0 is a Thursday: dow 4): volumes 10, 30
    // → mean 20 → ratios 0.5 and 1.5, both flagged; one Friday alone →
    // ratio 1.0, never flagged
    val rows =
      (1 to 10).map(i => ev(i.toLong, 1, "view", 0 * day + i)) ++
      (11 to 40).map(i => ev(i.toLong, 1, "view", 7 * day + i)) ++
      (41 to 45).map(i => ev(i.toLong, 1, "view", 1 * day + i))
    val got = Events.seasonalAnomaly(rows.toDF(
      "event_id", "ts", "user_id", "event_type", "value", "props"))
      .as[(Long, Long, Long, Double, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(0L) === ((0L, 4L, 10L, 20.0, 0.5, 1L)))
    assert(got(7L) === ((7L, 4L, 30L, 20.0, 1.5, 1L)))
    assert(got(1L) === ((1L, 5L, 5L, 5.0, 1.0, 0L)))
  }

  test("weeklyValuePsi: the reference week scores 0, a shifted week doesn't") {
    val wk = 7 * 86400000L
    def pv(id: Long, ms: Long, v: Double) =
      (id, new Timestamp(ms), 1L, "view", v, "{}")
    // week 0: all values in bin 0; week 1: all in the top bin
    val rows = (1 to 20).map(i => pv(i.toLong, i.toLong, 10.0)) ++
      (21 to 40).map(i => pv(i.toLong, wk + i, 500.0))
    val got = Events.weeklyValuePsi(rows.toDF(
      "event_id", "ts", "user_id", "event_type", "value", "props"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(0L) === ((0L, 20L, 0.0)))
    assert(got(1L)._2 === 20L)
    assert(got(1L)._3 > 5.0) // full mass swap → large PSI
  }

  test("revenueBridge: components reconstruct the exact revenue delta") {
    val part = Seq((1L, "B1")).toDF("p_partkey", "p_brand")
    def li(yr: String, q: Long, price: Double) =
      (1L, 1L, q.toDouble, price, 0.0, java.sql.Date.valueOf(s"$yr-06-01"))
    // 1994: q=10 @ 5.00 → r0=5000c; 1996: q=20 @ 6.00 → r1=12000c
    val rows = Seq(li("1994", 10, 50.0), li("1996", 20, 120.0))
      .toDF("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice",
        "l_discount", "l_shipdate")
    val got = graft.ops.Olap.revenueBridge(rows, part)
      .as[(String, Long, Long, Long, Double, Double, Double)].collect().head
    val (_, r0, r1, d, vol, pr, joint) = got
    assert((r0, r1, d) === ((5000L, 12000L, 7000L)))
    // p0=500 c/u, p1=600: vol=10·500=5000, price=100·10=1000, joint=100·10=1000
    assert((vol, pr, joint) === ((5000.0, 1000.0, 1000.0)))
    assert(vol + pr + joint === d.toDouble)
  }

  test("returnRank: the small perfect-return brand ranks below the big steady one") {
    val part = Seq((1L, "SMALL"), (2L, "BIG")).toDF("p_partkey", "p_brand")
    val rows = (
      // SMALL: 2/2 returns (Wilson lo ≈ 0.342); BIG: 400/1000 (lo ≈ 0.370)
      Seq.fill(2)((1L, "R")) ++
      Seq.fill(400)((2L, "R")) ++ Seq.fill(600)((2L, "N"))
    ).map { case (p, f) => (p, f) }.toDF("l_partkey", "l_returnflag")
    val got = graft.ops.Olap.returnRank(rows, part)
      .as[(String, Long, Long, Double, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    // rate(SMALL)=1.0 > rate(BIG)=0.4, but the Wilson lower bound
    // flips the order — the entire point of the ranking
    assert(got("SMALL")._4 === 1.0 && got("BIG")._4 === 0.4)
    assert(got("BIG")._5 > got("SMALL")._5)
    assert(got("BIG")._6 === 1L && got("SMALL")._6 === 2L)
  }

  test("supplierHhi: monopoly scores 10000, equal split scores 10000/n") {
    val supplier = Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L))
      .toDF("s_suppkey", "s_nationkey")
    val nation = Seq((0L, "MONO"), (1L, "DUO"))
      .toDF("n_nationkey", "n_name")
    val li = Seq(
      // nation 0: all revenue at supplier 1 → HHI 10000
      (1L, 100.0, 0.0), (1L, 50.0, 0.0),
      // nation 1: suppliers 3 and 4 split evenly → HHI 5000
      (3L, 80.0, 0.0), (4L, 80.0, 0.0)
    ).toDF("l_suppkey", "l_extendedprice", "l_discount")
    val got = Olap.supplierHhi(li, supplier, nation)
      .as[(String, Long, Long, Double)].collect().toSet
    assert(got === Set(
      ("MONO", 1L, 15000L, 10000.0),
      ("DUO", 2L, 16000L, 5000.0)))
  }
}
