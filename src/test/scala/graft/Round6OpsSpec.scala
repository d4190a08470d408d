package graft

import java.sql.Timestamp

import graft.ops.{DataProfile, Dedup, Events, TextAnalysis}

/** Pins the round-6 operators: session concurrency (x121), k-anonymity
  * (x122), quality percentiles (x123), Tukey value bands (x124), gap
  * fill (x125), grouping-sets marginals (x126), dataset cards (x127),
  * and MinHash estimator calibration (x128). */
class Round6OpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(min * 60000L)

  test("x121 sessionConcurrency: a session spanning two hours counts in both") {
    // user 10: events at 0 and 70 min — 70-min span but the 30-min gap
    // splits them into two sessions (hour 0 and hour 1); user 20: one
    // 25-min-gap session from min 50 to min 75 spanning hours 0 and 1
    val events = Seq(
      (1L, ts(0), 10L, "click", 0.0, "{}"),
      (2L, ts(70), 10L, "click", 0.0, "{}"),
      (3L, ts(50), 20L, "view", 0.0, "{}"),
      (4L, ts(75), 20L, "view", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Events.sessionConcurrency(events)
      .select("hour_ms", "n_sessions", "n_users")
      .as[(Long, Long, Long)].collect()
      .map { case (h, a, b) => h -> ((a, b)) }.toMap
    assert(out === Map(0L -> ((2L, 2L)), 3600000L -> ((2L, 2L))))
  }

  test("x122 kAnonymity: $1000 bands (negative-safe) and the k flag") {
    val cust = Seq(
      (1L, "a", 1, 500.0, "AUTO"), (2L, "b", 1, 999.99, "AUTO"),
      (3L, "c", 1, 400.0, "AUTO"), (4L, "d", 1, 0.0, "AUTO"),
      (5L, "e", 1, 999.0, "AUTO"),                       // 5 in band 0 → k-anon
      (6L, "f", 1, 1000.0, "AUTO"),                      // band 1, alone
      (7L, "g", 1, -500.0, "AUTO")                       // band -1, alone
    ).toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val out = DataProfile.kAnonymity(cust)
      .select("bal_band", "n_rows", "k_anonymous")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(out === Set((0L, 5L, true), (1L, 1L, false), (-1L, 1L, false)))
  }

  test("x123 qualityPercentile: percent_rank over the total order, decile clamped") {
    val docs = Seq(
      (1L, "aaa bbb", "en", "s", 7L),
      (2L, "the and is of to in aaa bbb ccc ddd", "en", "s", 10L),
      (3L, "x", "en", "s", 1L),
      (4L, "solo", "fr", "s", 4L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.qualityPercentile(docs)
      .select("doc_id", "pctl", "decile").as[(Long, Double, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // en ranks: 3 docs → pctl 0, 0.5, 1; fr singleton → pctl 0
    assert(out(4L) === ((0.0, 0L)))
    assert(out.values.map(_._1).toSet.subsetOf(Set(0.0, 0.5, 1.0)))
    assert(out.count { case (_, (p, _)) => p == 1.0 } == 1)
    // decile of pctl 1.0 clamps to 9, of 0.5 is 5
    val byPctl = out.values.toMap
    assert(byPctl(1.0) === 9L)
    assert(byPctl(0.5) === 5L)
  }

  test("x124 valueBands: exact quartile fences and the outlier count") {
    // one type, cents 100..400 plus a 10000 spike: q1=200, q3=400 →
    // lo=-100, hi=700 → exactly one outlier
    val events = Seq(1.0, 2.0, 3.0, 4.0, 100.0).zipWithIndex.map {
      case (v, i) => (i.toLong, ts(i.toLong), 1L, "click", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Events.valueBands(events)
      .select("lo", "hi", "n_events", "n_outliers")
      .as[(Double, Double, Long, Long)].head()
    assert(out === ((-100.0, 700.0, 5L, 1L)))
  }

  test("x125 gapFill: absent hours materialize as zero rows, per type") {
    val events = Seq(
      (1L, ts(0), 1L, "click", 0.0, "{}"),
      (2L, ts(10), 1L, "click", 0.0, "{}"),
      (3L, ts(130), 1L, "click", 0.0, "{}"),   // hour 2 — hour 1 is a gap
      (4L, ts(30), 1L, "view", 0.0, "{}")      // view: single hour, no gaps
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Events.gapFill(events)
      .select("event_type", "hour_ms", "n_events")
      .as[(String, Long, Long)].collect().toSet
    assert(out === Set(
      ("click", 0L, 2L), ("click", 3600000L, 0L), ("click", 7200000L, 1L),
      ("view", 0L, 1L)))
  }

  test("x126 groupingSetsMarginals: both marginals, tagged by grouping_id") {
    val events = Seq(
      (1L, ts(0), 1L, "click", 1.0, "{}"),
      (2L, ts(10), 1L, "view", 2.0, "{}"),
      (3L, ts(70), 1L, "click", 3.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Events.groupingSetsMarginals(events)
      .select("event_type", "hour", "gid", "n_events")
      .as[(Option[String], Option[String], Long, Long)].collect().toSet
    // gid 1 = hour missing (by-type marginal), gid 2 = type missing
    assert(out === Set(
      (Some("click"), None, 1L, 2L), (Some("view"), None, 1L, 1L),
      (None, Some("1970-01-01 00:00:00"), 2L, 2L),
      (None, Some("1970-01-01 01:00:00"), 2L, 1L)))
  }

  test("x127 datasetCard: corpus-wide duplicate rate lands on the right source") {
    val docs = Seq(
      (1L, "same text here", "en", "crawlA", 14L),
      (2L, "same  TEXT here", "fr", "crawlB", 15L),   // dup of 1 after canon
      (3L, "unique body", "en", "crawlB", 11L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.datasetCard(docs)
      .select("source", "n_docs", "n_langs", "n_dup_docs", "dup_rate")
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // BOTH copies of a duplicated fingerprint count as dup docs, each
    // against its own source
    assert(out("crawlA") === ((1L, 1L, 1L, 1.0)))
    assert(out("crawlB") === ((2L, 2L, 1L, 0.5)))
  }

  test("x129 chi2Assoc: independence arithmetic on a hand 2x2 table") {
    // counts: (en,a)=3 (en,b)=1 (fr,a)=1 (fr,b)=3; N=8
    val docs = (Seq.fill(3)(("en", "a")) ++ Seq(("en", "b"), ("fr", "a")) ++
      Seq.fill(3)(("fr", "b"))).zipWithIndex
      .map { case ((l, s), i) => (i.toLong, s"t$i", l, s, 2L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = graft.ops.DataProfile.chi2Assoc(docs)
      .select("lang", "source", "n", "expected", "contrib")
      .as[(String, String, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    // e(en,a) = 4*4/8 = 2; contrib = (3-2)^2/2 = 0.5 — all four cells
    assert(out(("en", "a")) === ((3L, 2.0, 0.5)))
    assert(out(("en", "b")) === ((1L, 2.0, 0.5)))
    assert(out(("fr", "b")) === ((3L, 2.0, 0.5)))
  }

  test("x130 normalizeUrl: tracking params out, case folded, real params kept") {
    val out = Seq("https://EX.com/A/B?utm_x=1&keep=2&ref=3#sec",
        "http://h.org/p?ref=only", "https://plain.net/x")
      .toDF("u").select(graft.ops.Web.normalizeUrl($"u").as("n"))
      .as[String].collect().toSeq
    assert(out === Seq("https://ex.com/A/B?keep=2", "http://h.org/p",
      "https://plain.net/x"))
  }

  test("x131 snapshotDiff: generation rules land on the four classes") {
    val out = SparkEntry.queries("x131_snapshot_diff")(spark, "/root/testdata/sf0.001")
      .as[(String, Long)].collect().toMap
    // 500 docs, doc_id 0..499: %5==4 added, %5==0 removed, %5==2 changed
    assert(out === Map("added" -> 100L, "removed" -> 100L,
      "changed" -> 100L, "unchanged" -> 200L))
  }

  test("x132 heldoutLmScore: seen and unseen bigrams under add-one backoff") {
    def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    def grid(x: Double) = math.floor(x * 1e7) / 1e7
    val docs = Seq(
      (0L, "a b", "en", "s", 3L),     // train: c12(a,b)=1, c1(a)=1, V={a,b}
      (1L, "a b", "en", "s", 3L),     // test, seen bigram: ln(2/3)
      (3L, "x y", "en", "s", 3L)      // test, unseen: ln(1/(0+2))
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.heldoutLmScore(docs)
      .select("doc_id", "n_bigrams", "nll")
      .as[(Long, Long, Double)].collect()
      .map { case (d, n, v) => d -> ((n, v)) }.toMap
    assert(out(1L) === ((1L, r4(-grid(math.log(2.0 / 3.0))))))
    assert(out(3L) === ((1L, r4(-grid(math.log(0.5))))))
  }

  test("x133 reservoirSample: exactly min(k, stratum) rows, ranks contiguous") {
    val docs = (0 until 25).map(i => (i.toLong, s"t$i", "en", "s", 2L))
      .++(Seq((100L, "u", "fr", "s", 1L), (101L, "v", "fr", "s", 1L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.reservoirSample(docs)
      .select("lang", "rnk").as[(String, Long)].collect()
    assert(out.count(_._1 == "en") === 10)
    assert(out.filter(_._1 == "fr").map(_._2).sorted.toSeq === Seq(1L, 2L))
    assert(out.filter(_._1 == "en").map(_._2).sorted.toSeq === (1L to 10L))
  }

  test("x134 bloomPrunedJoin: result is EXACTLY the plain join aggregate") {
    val dir = "/root/testdata/sf0.001"
    val orders = graft.sources.Tables.orders(spark, dir)
    val cust = graft.sources.Tables.customer(spark, dir)
    val out = graft.ops.Olap.bloomPrunedJoin(orders, cust)
      .select("o_orderpriority", "n_orders", "total_cents")
      .as[(String, Long, Long)].collect().toSet
    val plain = orders.join(cust, $"o_custkey" === $"c_custkey")
      .filter($"c_mktsegment" === graft.ops.Olap.BloomJoinSegment)
      .groupBy($"o_orderpriority")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_orders"),
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.floor($"o_totalprice" * 100 + 0.5)
            .cast("long")).as("total_cents"))
      .as[(String, Long, Long)].collect().toSet
    assert(out === plain)
    assert(out.nonEmpty)
  }

  test("x135 dpCounts: the seeded Laplace draw matches the closed form") {
    def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    val docs = Seq((1L, "a", "en", "s", 1L), (2L, "b", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val (n, noise, noisy) = graft.ops.DataProfile.dpCounts(docs)
      .select("n", "noise", "noisy").as[(Long, Double, Double)].head()
    // recompute the draw outside Spark: u from the first 13 md5 hex
    // digits of "dp:en", then the inverse-CDF Laplace transform
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest("dp:en".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(13)
    val u = (java.lang.Long.parseLong(hex, 16) + 0.5) / 4503599627370496.0
    val expect = -1.0 * math.signum(u - 0.5) * math.log(1.0 - 2.0 * math.abs(u - 0.5))
    assert(n === 2L)
    assert(noise === r4(expect))
    assert(noisy === r4(2.0 + expect))
  }

  test("x136 sourceOverlap: shared-span counts per source pair, canon order") {
    // docs share the 8-token passage "w1..w8"; trailing tokens differ,
    // so ONLY that one window is common to a and b; c is disjoint
    val base = (1 to 8).map("w" + _).mkString(" ")
    val docs = Seq(
      (1L, s"$base ua", "en", "a", 1L),
      (2L, s"$base ub", "en", "b", 1L),
      (3L, s"$base uc again ub", "en", "b", 1L),     // same span, same source
      (4L, (11 to 19).map("c" + _).mkString(" "), "en", "c", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = graft.ops.Dedup.sourceOverlap(docs)
      .select("source_a", "source_b", "n_shared")
      .as[(String, String, Long)].collect().toSet
    assert(out === Set(("a", "b", 1L)))
  }

  test("x137 qualityCi: Wilson interval matches the closed form") {
    def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    // the pass/fail verdict itself is x1-pinned (quality score); this
    // test pins the INTERVAL arithmetic against the closed form on
    // whatever (k, n) the fixture docs produce
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter($"lang" === "en")
    val row = TextAnalysis.qualityCi(docs)
      .select("n", "k", "rate", "lo", "hi").as[(Long, Long, Double, Double, Double)]
      .head()
    val (n, k) = (row._1.toDouble, row._2.toDouble)
    assert(row._1 > 0 && row._2 > 0 && row._2 < row._1,
      s"fixture should produce a non-degenerate rate, got $row")
    val z = TextAnalysis.WilsonZ
    val z2 = z * z
    val p = k / n
    val half = z * math.sqrt(p * (1 - p) / n + z2 / (n * n * 4))
    val center = p + z2 / (n * 2)
    val denom = 1.0 + z2 / n
    assert(row._3 === r4(p))
    assert(row._4 === r4((center - half) / denom))
    assert(row._5 === r4((center + half) / denom))
    assert(row._4 < row._3 && row._3 < row._5)
  }

  test("x138 psiDrift: dense 10-bin grid, finite terms, split totals add up") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = TextAnalysis.psiDrift(docs)
      .select("bin", "n_train", "n_test", "psi_term")
      .as[(Long, Long, Long, Double)].collect()
    assert(out.map(_._1).sorted.toSeq === (0L to 9L))
    assert(out.forall(r => !r._4.isNaN && !r._4.isInfinite),
      "smoothing must keep every PSI term finite, empty bins included")
    val splits = TextAnalysis.splitAssign(docs).groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(out.map(_._2).sum === splits("train"))
    assert(out.map(_._3).sum === splits("test"))
    // the content-addressed split should NOT drift against itself; at
    // sf0.001 the test split holds only ~44 docs, so smoothing noise
    // (6 empty bins × 0.019) dominates — the bound is the "no real
    // drift" band for that sample size, not zero
    assert(out.map(_._4).sum < 0.5, s"unexpected drift: ${out.mkString(", ")}")
  }

  test("x128 minhashCalibration: identical docs agree on all components with J=1") {
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, base, "en", "s", 1L),
      (2L, base, "en", "s", 1L),               // exact dup of 1
      (3L, "totally different words entirely here now", "en", "s", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Dedup.minhashCalibration(docs)
      .select("n_match", "est_jaccard", "n_pairs", "mean_jaccard", "mae")
      .as[(Long, Double, Long, Double, Double)].collect()
    // the only LSH candidate pair is the identical one: every band
    // collides, all 12 components match, true J = 1, error = 0
    assert(out.toSeq === Seq((Dedup.NumHashes.toLong, 1.0, 1L, 1.0, 0.0)))
  }
}
