package graft

import java.sql.Timestamp

import graft.ops.{DataProfile, Dedup, Events, Olap, TextAnalysis, Web}

/** Pins the round-7 operators: EWMA daily volume (x139), Zipf slope
  * (x140), median/MAD outliers (x141), Flesch readability (x142),
  * Lorenz deciles (x143), rolling 7-day distinct users (x144),
  * cross-split URL leakage (x145), normalized-exact dedup (x146),
  * week-over-week user overlap (x147), Benford audit (x148). */
class Round7OpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(min * 60000L)
  private def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000

  test("x139 ewmaDaily: closed-form EWMA with real-day-gap decay") {
    val events = Seq(
      (1L, ts(0), 1L, "click", 0.0, "{}"),
      (2L, ts(1), 2L, "click", 0.0, "{}"),
      (3L, ts(2 * 1440), 1L, "click", 0.0, "{}")   // day 2 — day 1 empty
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Events.ewmaDaily(events)
      .select("day", "n_events", "ewma", "ratio")
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out.keySet === Set(0L, 2L), "only observed days appear")
    assert(out(0L) === ((2L, 2.0, 1.0)))
    // day 2: w^-0 and w^-2 terms — the skipped day still decays
    val w = Events.EwmaDecay
    val ew = (2.0 + math.pow(w, -2.0)) / (1.0 + math.pow(w, -2.0))
    assert(out(2L) === ((1L, r4(ew), r4(1.0 / ew))))
  }

  test("x139 ewmaDaily: the exponent rebases on EACH type's first day") {
    // type B starts 8,000 days after A — on the corpus-global index
    // pow(w, -8000) would overflow to Inf and NaN the whole B series
    val events = Seq(
      (1L, ts(0), 1L, "A", 0.0, "{}"),
      (2L, ts(8000L * 1440), 1L, "B", 0.0, "{}"),
      (3L, ts(8001L * 1440), 1L, "B", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Events.ewmaDaily(events)
      .select("event_type", "day", "ewma", "ratio")
      .as[(String, Long, Double, Double)].collect()
    assert(out.forall(r => !r._3.isNaN && !r._4.isNaN), s"NaN in ${out.toSeq}")
    assert(out.filter(_._1 == "B").map(_._3).toSet === Set(1.0))
  }

  test("x140 zipfSlope: matches the fixed-point regression closed form") {
    // one language, frequencies 4/2/1 → ranks 1/2/3
    val docs = Seq((1L, "a a b", "en", "s", 5L), (2L, "a a b c", "en", "s", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.zipfSlope(docs)
      .select("lang", "n", "slope", "ln_f1")
      .as[(String, Long, Double, Double)].head()
    def lnFix(x: Double) = math.floor(math.log(x) * 1e6 + 0.5)
    val pts = Seq((1L, 4L), (2L, 2L), (3L, 1L))
      .map { case (r, f) => (lnFix(r.toDouble), lnFix(f.toDouble)) }
    val n = pts.size.toDouble
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val (sxx, sxy) = (pts.map(p => p._1 * p._1).sum, pts.map(p => p._1 * p._2).sum)
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(out._1 === "en" && out._2 === 3L)
    assert(out._3 === r4(slope))
    assert(out._4 === r4((sy - slope * sx) / n / 1e6))
    // freq ≈ 4/r^1.26: the head is steeper than Zipf's -1 here
    assert(out._3 < -1.0 && out._3 > -1.5)
  }

  test("x141 madOutliers: zero-MAD fence and interpolated medians") {
    val docs =
      (Seq.fill(4)(10L) :+ 100L).zipWithIndex.map { case (c, i) =>
        (i.toLong, "t", "en", "s", c)
      } ++ Seq((10L, "t", "fr", "s", 1L), (11L, "t", "fr", "s", 2L))
    val out = docs.toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = DataProfile.madOutliers(out)
      .select("lang", "med", "mad", "fence", "n", "n_outliers")
      .as[(String, Double, Double, Double, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    // en: med 10, MAD 0 → fence 0 → the spike is the only |dev| > 0
    assert(got("en") === ((10.0, 0.0, 0.0, 5L, 1L)))
    // fr: med 1.5 (interpolated), adev 0.5/0.5 → MAD 0.5
    val fence = r4(DataProfile.MadK * DataProfile.MadConsistency * 0.5)
    assert(got("fr") === ((1.5, 0.5, fence, 2L, 0L)))
  }

  test("x142 readability: Flesch arithmetic, banding, and the empty guard") {
    val docs = Seq(
      (1L, "Hello world.", "en", "s", 12L),
      (2L, "", "en", "s", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.readability(docs)
      .select("doc_id", "n_words", "n_sentences", "n_syllables", "flesch", "band")
      .as[(Long, Long, Long, Long, Option[Double], String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    // hello(e,o) world(o) → 3 vowel groups; 2 words, 1 sentence
    val f = r4(206.835 - 1.015 * (2.0 / 1.0) - 84.6 * (3.0 / 2.0))
    assert(out(1L) === ((2L, 1L, 3L, Some(f), "easy")))
    assert(out(2L) === ((0L, 1L, 0L, None, "(empty)")))
  }

  test("x143 lorenzDeciles: exact decile cuts and cumulative shares") {
    val docs = (1 to 10).map { i =>
      (i.toLong, (1 to i).map(j => s"w$j").mkString(" "), "en", "s", 1L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.lorenzDeciles(docs)
      .select("decile", "n_docs", "toks", "cum_share")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq === (1L to 10L))
    assert(out.forall(_._2 == 1L))
    assert(out.map(_._3).toSeq === (1L to 10L).reverse.toSeq)
    assert(out.head._4 === r4(10.0 / 55))
    assert(out.last._4 === 1.0)
  }

  test("x144 rollingDistinctUsers: 7-day visibility, clipped at the data edge") {
    val events = Seq(
      (1L, ts(0), 1L, "click", 0.0, "{}"),
      (2L, ts(3 * 1440), 2L, "click", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Events.rollingDistinctUsers(events)
      .select("obs_day", "n_users_7d").as[(Long, Long)].collect().toMap
    assert(out === Map(0L -> 1L, 1L -> 1L, 2L -> 1L, 3L -> 2L))
  }

  test("x145 urlSplitLeakage: flags only canonical URLs straddling splits") {
    val out = Web.urlSplitLeakage(
        graft.sources.Tables.documents(spark, "/root/testdata/sf0.001"))
      .select("url_norm", "n_train", "n_val", "n_test")
      .as[(String, Long, Long, Long)].collect()
    assert(out.nonEmpty, "the shared spam-mirror URL must straddle splits")
    out.foreach { case (u, tr, va, te) =>
      assert(Seq(tr, va, te).count(_ > 0) >= 2, s"$u is not a leak")
      assert(!u.contains("ref=") && !u.contains("utm_"), "must be canonical")
    }
    // splitOf must agree with the x29 frame it shortcuts
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val viaCol = docs.select($"doc_id", TextAnalysis.splitOf($"doc_id").as("s"))
    val viaFrame = TextAnalysis.splitAssign(docs).select($"doc_id", $"split".as("f"))
    assert(viaCol.join(viaFrame, "doc_id").filter($"s" =!= $"f").count() === 0L)
  }

  test("x146 normalizedDedup: punctuation/case variants collapse, raw variants counted") {
    val docs = Seq(
      (1L, "Hello, World!", "en", "s", 13L),
      (2L, "hello world", "en", "s", 11L),
      (3L, "something else", "en", "s", 14L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Dedup.normalizedDedup(docs)
      .select("keep_doc_id", "n_copies", "n_raw_variants")
      .as[(Long, Long, Long)].collect().toSet
    assert(out === Set((1L, 2L, 2L), (3L, 1L, 1L)))
  }

  test("x147 wowUserOverlap: adjacent-week Jaccard and churn decomposition") {
    val wk = 10080L // minutes per week
    val events = Seq(
      (1L, ts(0), 1L, "click", 0.0, "{}"),
      (2L, ts(1), 2L, "click", 0.0, "{}"),
      (3L, ts(wk), 2L, "view", 0.0, "{}"),
      (4L, ts(wk + 1), 3L, "view", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Events.wowUserOverlap(events)
      .select("week", "n_prev", "n_curr", "n_both", "jaccard", "n_churned", "n_new")
      .as[(Long, Long, Long, Long, Double, Long, Long)].collect()
    assert(out.toSeq === Seq((1L, 2L, 2L, 1L, r4(1.0 / 3), 1L, 1L)))
  }

  test("x149 oovRate: misses against the top-K head, empty docs stay null") {
    // 600 distinct padded tokens; t0001..t0100 appear twice → the
    // K=500 vocab is them + the 400 lexicographically-first singles
    // (t0101..t0500); t0501..t0600 are OOV
    val all = (1 to 600).map(i => f"t$i%04d")
    val docs = Seq(
      (1L, all.mkString(" "), "en", "s", 1L),
      (2L, all.take(100).mkString(" "), "en", "s", 1L),
      (3L, "", "en", "s", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = graft.ops.TextAnalysis.oovRate(docs)
      .select("doc_id", "n_tokens", "n_oov", "oov_rate")
      .as[(Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) === ((600L, 100L, Some(r4(100.0 / 600)))))
    assert(out(2L) === ((100L, 0L, Some(0.0))))
    assert(out(3L) === ((0L, 0L, None)))
  }

  test("x150 heapsFit: fixed-point regression on per-doc (N, V) points") {
    val docs = Seq(
      (1L, "a b a b", "en", "s", 7L),                 // N=4, V=2
      (2L, "a b c d e f g h", "en", "s", 15L)         // N=8, V=8
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = graft.ops.TextAnalysis.heapsFit(docs)
      .select("lang", "n", "beta", "ln_k")
      .as[(String, Long, Double, Double)].head()
    def lnFix(x: Double) = math.floor(math.log(x) * 1e6 + 0.5)
    val pts = Seq((4.0, 2.0), (8.0, 8.0)).map { case (a, b) => (lnFix(a), lnFix(b)) }
    val n = pts.size.toDouble
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val (sxx, sxy) = (pts.map(p => p._1 * p._1).sum, pts.map(p => p._1 * p._2).sum)
    val beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(out === (("en", 2L, r4(beta), r4((sy - beta * sx) / n / 1e6))))
    // doubling N quadrupled V here → β = 2 on this 2-point toy
    assert(out._3 === 2.0)
  }

  test("x151 typeLift: exact integer lift over distinct users") {
    val events = Seq(
      (1L, ts(0), 1L, "A", 0.0, "{}"), (2L, ts(1), 1L, "B", 0.0, "{}"),
      (3L, ts(2), 2L, "A", 0.0, "{}"), (4L, ts(3), 2L, "B", 0.0, "{}"),
      (5L, ts(4), 2L, "B", 0.0, "{}"),   // duplicate activity — distinct'd
      (6L, ts(5), 3L, "A", 0.0, "{}"), (7L, ts(6), 4L, "C", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Events.typeLift(events)
      .select("type_a", "type_b", "n_a", "n_b", "n_ab", "lift")
      .as[(String, String, Long, Long, Long, Double)].collect()
    // only (A,B) co-occurs: 2 of 4 users; lift = (2·4)/(3·2)
    assert(out.toSeq === Seq(("A", "B", 3L, 2L, 2L, r4(8.0 / 6.0))))
  }

  test("x152 cusumChangepoint: exact scaled sums, first-max change day") {
    val events = (Seq.fill(1)(0L) ++ Seq.fill(1)(1L) ++ Seq.fill(4)(2L))
      .zipWithIndex.map { case (day, i) =>
        (i.toLong, ts(day * 1440), 1L, "click", 0.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Events.cusumChangepoint(events)
      .select("day", "n", "cusum", "is_cp")
      .as[(Long, Long, Double, Long)].collect().sortBy(_._1)
    // D=3, T=6; terms n·D−T = −3,−3,+6 → S = −3,−6,0 → cusum −1,−2,0
    assert(out.toSeq === Seq((0L, 1L, -1.0, 0L), (1L, 1L, -2.0, 1L),
      (2L, 4L, 0.0, 0L)))
  }

  test("x153 ksSourceDrift: D on a hand CDF pair, exact integer argmax") {
    val docs = Seq(
      (1L, "t", "en", "a", 1L), (2L, "t", "en", "a", 2L),
      (3L, "t", "en", "b", 2L), (4L, "t", "en", "b", 3L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = graft.ops.DataProfile.ksSourceDrift(docs)
      .select("source_a", "source_b", "tot_a", "tot_b", "ks")
      .as[(String, String, Long, Long, Double)].collect()
    // F_a = .5,1,1 and F_b = 0,.5,1 over x=1,2,3 → D = 0.5
    assert(out.toSeq === Seq(("a", "b", 2L, 2L, 0.5)))
  }

  test("x155 abTest: A/A split arithmetic and the degenerate-pool NULL guard") {
    // u2,u4 → variant 0; u1,u3 → variant 1; conversions (purchase
    // ≥ 150): u4 and u1 → both arms 1/2 → z = 0
    val events = Seq(
      (1L, ts(0), 1L, "purchase", 200.0, "{}"),
      (2L, ts(1), 2L, "purchase", 100.0, "{}"),
      (3L, ts(2), 3L, "click", 0.0, "{}"),
      (4L, ts(3), 4L, "purchase", 160.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Events.abTest(events)
      .select("n_a", "k_a", "n_b", "k_b", "rate_a", "rate_b", "z")
      .as[(Long, Long, Long, Long, Double, Double, Option[Double])].head()
    assert(out === ((2L, 1L, 2L, 1L, 0.5, 0.5, Some(0.0))))
    // every user converts → pooled variance 0 → NULL z, not an
    // ANSI-mode 0/0 runtime error
    val all = Seq(
      (1L, ts(0), 1L, "purchase", 200.0, "{}"),
      (2L, ts(1), 2L, "purchase", 300.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val deg = Events.abTest(all).select("rate_a", "rate_b", "z")
      .as[(Double, Double, Option[Double])].head()
    assert(deg === ((1.0, 1.0, None)))
  }

  test("x156 seasonality: epoch-arithmetic day-of-week, 1970-01-01 is Thursday") {
    val events = Seq(
      (1L, ts(0), 1L, "click", 0.0, "{}"),            // Thu (dow 4), hour 0
      (2L, ts(25 * 60), 1L, "click", 0.0, "{}"),      // Fri (dow 5), hour 1
      (3L, ts(25 * 60), 2L, "view", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Events.seasonality(events)
      .select("dow", "hour", "n_events", "share")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(out === Set((4L, 0L, 1L, r4(1.0 / 3)), (5L, 1L, 2L, r4(2.0 / 3))))
  }

  test("x157 conversionLatency: strictly-preceding views, interpolated tails") {
    val events = Seq(
      (1L, ts(0), 1L, "view", 0.0, "{}"),
      (2L, new Timestamp(1000L), 1L, "purchase", 0.0, "{}"),
      (3L, new Timestamp(5000L), 1L, "purchase", 0.0, "{}"),
      (4L, ts(9), 2L, "purchase", 0.0, "{}")          // no prior view → out
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Events.conversionLatency(events)
      .select("n", "p50", "p90", "p99")
      .as[(Long, Double, Double, Double)].head()
    // deltas {1000, 5000}: p50 = 3000, p90 = 1000+0.9·4000, p99 = 4960
    assert(out === ((2L, 3000.0, 4600.0, 4960.0)))
  }

  test("x159 variantShred: typed paths, array index, absent key stays null") {
    val events = Seq(
      (4L, ts(0), 1L, "click", 2.5, "{\"k\": 7}"),    // %4==0 → no price
      (5L, ts(1), 1L, "click", 3.0, "{\"k\": 9}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Events.variantShred(events)
      .select("event_id", "k", "ua", "tag1", "price")
      .as[(Long, Long, String, String, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out(4L) === ((7L, "ua1", "t4", None)))
    assert(out(5L) === ((9L, "ua2", "t5", Some(300L))))
  }

  test("x160 bandedRangeJoin: inclusive lo, exclusive hi, overflow on -1") {
    val events = Seq(2.99, 3.00, 9.99, 10.00, 500.0).zipWithIndex.map {
      case (v, i) => (i.toLong, ts(i.toLong), 1L, "click", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = graft.ops.Olap.bandedRangeJoin(events)
      .select("band", "n_events", "value_cents")
      .as[(Long, Long, Long)].collect().toSet
    // cents 299/300/999/1000/50000 → bands 0,1,1,2,-1
    assert(out === Set((0L, 1L, 299L), (1L, 2L, 1299L), (2L, 1L, 1000L),
      (-1L, 1L, 50000L)))
  }

  test("x161 topSessionPaths: (ms, id)-ordered paths, count-then-path ranking") {
    val events = Seq(
      (1L, ts(0), 1L, "view", 0.0, "{}"),
      (2L, ts(1), 1L, "click", 0.0, "{}"),
      (3L, ts(2), 1L, "purchase", 0.0, "{}"),
      (4L, ts(0), 2L, "view", 0.0, "{}"),
      (5L, ts(100), 2L, "click", 0.0, "{}")   // > 30-min gap → own session
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Events.topSessionPaths(events)
      .select("path", "n_sessions", "rnk")
      .as[(String, Long, Long)].collect().sortBy(_._3)
    assert(out.toSeq === Seq(("click", 1L, 1L), ("view", 1L, 2L),
      ("view>click>purchase", 1L, 3L)))
  }

  test("x162 pmiCollocations: log-space PMI, support floor, tie order") {
    // (a,b) appears 5x as whole docs; (c,d) 5x and (d,c) 4x inside one
    // alternating doc — (d,c) dies on the support floor
    val docs = ((1 to 5).map(i => (i.toLong, "a b", "en", "s", 3L)) :+
      (9L, "c d c d c d c d c d", "en", "s", 19L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = graft.ops.TextAnalysis.pmiCollocations(docs)
      .select("w1", "w2", "c_ab", "pmi")
      .as[(String, String, Long, Double)].collect()
    // T=20 tokens, B=14 bigrams, all counts 5: identical PMI, (a,b) first
    val pmi = r4(math.log(5.0) + 2.0 * math.log(20.0) - math.log(14.0)
      - math.log(5.0) - math.log(5.0))
    assert(out.toSeq === Seq(("a", "b", 5L, pmi), ("c", "d", 5L, pmi)))
  }

  test("x163 calibrationCurve: bins partition the corpus, rates recompute") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = graft.ops.QualityFilters.calibrationCurve(docs)
      .select("bin", "n", "k", "mean_pred", "act_rate")
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(out.map(_._2).sum === docs.count())
    out.foreach { case (bin, n, k, mp, ar) =>
      assert(bin >= 0 && bin <= 9 && k >= 0 && k <= n)
      assert(mp >= 0.0 && mp <= 1.0)
      assert(ar === r4(k.toDouble / n))
    }
  }

  test("x164 essPerSource: identical docs carry equal weights, ESS = n") {
    val docs = (1 to 4).map(i => (i.toLong, "alpha beta gamma", "en", "s", 16L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = graft.ops.QualityFilters.essPerSource(docs)
      .select("source", "n", "ess", "ess_frac")
      .as[(String, Long, Double, Double)].head()
    assert(out === (("s", 4L, 4.0, 1.0)))
  }

  test("x164 essPerSource: an all-zero-weight source reports NULL, not NaN") {
    // the off-target doc's DSIR log-weight is a SUM of per-token log
    // ratios — 40 off-target tokens push it far below ln(0.0005), so
    // every weight quantizes to 0 and the 0/0 must surface as NULL
    val off = Seq.fill(40)("zzz").mkString(" ")
    val docs = Seq(
      (1L, "a b c d e f g h", "en", "good", 15L),
      (2L, off, "fr", "bad", off.length.toLong)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = graft.ops.QualityFilters.essPerSource(docs)
      .select("source", "ess", "ess_frac")
      .as[(String, Option[Double], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("bad") === ((None, None)))
    assert(out("good")._1.isDefined && out("good")._2.isDefined)
  }

  test("x148 benfordAudit: string-derived digits and the log10 expectation") {
    val orders = Seq(1.00, 2.50, 19.99, 0.05).toDF("o_totalprice")
    val out = Olap.benfordAudit(orders)
      .select("digit", "n", "share", "expected", "abs_dev")
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val e1 = math.log10(2.0)
    assert(out(1L) === ((2L, 0.5, r4(e1), r4(math.abs(0.5 - e1)))))
    assert(out(2L)._1 === 1L && out(5L)._1 === 1L)
    assert(out(2L)._2 === 0.25 && out(5L)._2 === 0.25)
  }
}
