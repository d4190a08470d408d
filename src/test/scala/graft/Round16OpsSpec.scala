package graft

import org.apache.spark.sql.functions._

import graft.functions.MisraGries
import graft.sources.TxnLog

/** Pins the round-10 second-wave additions that aren't
  * oracle-expressible: the Misra–Gries guarantee under adversarial
  * splits/merges (x254), the metadata-only aggregate's refusal paths
  * (x249), and the Bloom sidecar's pruning algebra (x250). */
class Round16OpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- x254 Misra–Gries ------------------------------------------------

  test("x254 MG: small vocabularies are counted exactly") {
    val stream = Seq.fill(40)("a") ++ Seq.fill(7)("b") ++ Seq("c")
    val got = MisraGries.foldTokens(Map.empty, stream.iterator)
    assert(got === Map("a" -> 40L, "b" -> 7L, "c" -> 1L))
  }

  test("x254 MG: every true heavy hitter survives any split and merge order") {
    // 4 heavy tokens + a noise tail far wider than Capacity, split into
    // chunks in three different ways and merged in different trees —
    // the N/m guarantee must hold for each
    val heavy = (0 until 4).flatMap(i => Seq.fill(4000)(s"H$i"))
    val noise = (0 until 3000).flatMap(i => Seq.fill(3)(s"n$i"))
    val n = heavy.size + noise.size
    val hhBar = n.toLong / MisraGries.Capacity
    assert(4000L > hhBar, "fixture: H* must be true heavy hitters")
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new scala.util.Random(seed)
      val stream = rnd.shuffle(heavy ++ noise)
      val chunks = stream.grouped(997).toSeq
      val partials = chunks.map(c => MisraGries.foldTokens(Map.empty, c.iterator))
      val leftFold = partials.reduceLeft(MisraGries.mergeMaps)
      val rightFold = partials.reduceRight(MisraGries.mergeMaps)
      for (m <- Seq(leftFold, rightFold)) {
        assert(m.size <= MisraGries.Capacity)
        (0 until 4).foreach(i => assert(m.contains(s"H$i"),
          s"seed $seed: true heavy hitter H$i evicted — guarantee broken"))
        // MG residuals never overcount
        (0 until 4).foreach(i => assert(m(s"H$i") <= 4000L))
      }
    }
  }

  test("x254 audit: every flagged row is in_sketch=true on the fixture") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val rows = graft.ops.TextAnalysis.heavyHittersAudit(docs)
      .select("tok", "cnt", "in_sketch").as[(String, Long, Boolean)].collect()
    assert(rows.nonEmpty, "the fixture corpus must have heavy hitters")
    assert(rows.forall(_._3), s"evicted heavy hitters: ${rows.filterNot(_._3).mkString(",")}")
  }

  // ---- x251/x252 video frame fingerprints --------------------------------

  test("x251 frame grid: count, ranges and sub-grid drops follow the walk") {
    // 130 chars → tlen=130, nf = 1 + 130%7 = 5, frame len = 26 < 64:
    // every frame sub-grid → dropped; 640 chars → nf = 1 + 640%7 = 4,
    // frames of 160 B → 4 rows
    val docs = Seq(1L -> ("a" * 130), 2L -> ("ab" * 320)).toDF("doc_id", "text")
    val rows = graft.ops.Multimodal.videoFrameSignatures(spark, docs)
      .select("doc_id", "frame_idx", "n_bytes")
      .as[(Long, Long, Long)].collect().sorted
    assert(rows.toSeq === Seq((2L, 0L, 160L), (2L, 1L, 160L),
      (2L, 2L, 160L), (2L, 3L, 160L)))
  }

  test("x252 identical videos pair frame-by-frame at Hamming 0") {
    val payload = "The quick brown fox jumps over the lazy dog. " * 8 // 360 B
    val docs = Seq(1L -> payload, 2L -> payload,
      3L -> ("zzzzzzzzaaaaaaaa" * 40)).toDF("doc_id", "text")
    val sigs = graft.ops.Multimodal.videoFrameHashes(spark, docs)
    val pairs = graft.ops.Multimodal.videoFrameNearDupPairs(sigs)
      .select("doc_a", "frame_a", "doc_b", "frame_b", "hamming")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // 360 % 7 = 3 → 4 frames of 90 B each; doc 1/2 aligned frames at 0
    val aligned = pairs.filter(p => p._1 == 1L && p._3 == 2L && p._2 == p._4)
    assert(aligned.size === 4 && aligned.forall(_._5 == 0L))
    // within-video frames never pair
    assert(pairs.forall(p => p._1 < p._3))
  }

  // ---- x253 TextRank ------------------------------------------------------

  test("x253 TextRank ranks the co-occurrence hub above the tail") {
    // "hub" co-occurs with every spoke; spokes only see the hub — the
    // hub must take rank 1 ahead of any spoke
    val docs = (0 until 6).map(i => (i.toLong, s"hub s$i hub s$i hub"))
      .toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.textRank(docs)
      .select("tok", "rank").as[(String, Long)].collect()
    assert(got.head._1 === "hub")
    assert(got.head._2 > got.tail.head._2)
    // ranks are descending with the token tiebreak
    assert(got.map(_._2).toSeq === got.map(_._2).sortBy(-_).toSeq)
  }

  // ---- x255 split-conformal prediction sets --------------------------------

  test("x255 conformal: set algebra is sound and coverage is near the target") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val rows = graft.ops.QualityFilters.conformalSets(docs)
      .select("doc_id", "set_size", "covered")
      .as[(Long, Long, Boolean)].collect()
    val testSplit = docs.filter(col("doc_id") % 3 === 2).count()
    assert(rows.length.toLong === testSplit, "one row per test doc")
    assert(rows.forall(r => r._2 >= 0 && r._2 <= 2), "sets are over {0,1}")
    // covered ⇒ the true class is in the set ⇒ set_size ≥ 1
    assert(rows.filter(_._3).forall(_._2 >= 1))
    // the 90% marginal guarantee holds in expectation over calibration
    // draws; on this fixed fixture the measured rate must sit near it
    val cov = rows.count(_._3).toDouble / rows.length
    assert(cov >= 0.85, s"measured coverage $cov collapsed below the target band")
  }

  // ---- x257 Mann–Kendall -----------------------------------------------

  test("x257 MK: monotone series trends, constant series reports z = 0") {
    def ev(tp: String, day: Long, k: Int) = (0 until k).map(i =>
      (tp + day + "_" + i, 1L, tp,
        new java.sql.Timestamp(day * 86400000L + i), 1.0, "{}"))
    // "up": 1,2,…,12 events/day over 12 days; "flat": 5/day over 12
    val rows = (1L to 12L).flatMap(d => ev("up", d, d.toInt)) ++
      (1L to 12L).flatMap(d => ev("flat", d, 5))
    val events = rows.toDF("event_id", "user_id", "event_type", "ts", "value", "props")
    val got = graft.ops.Events.mannKendallDaily(events)
      .select("event_type", "s_stat", "var18", "z", "sen_slope", "trend")
      .as[(String, Long, Long, Double, Double, String)].collect()
      .map(r => r._1 -> r).toMap
    val up = got("up")
    assert(up._2 === 66L, "all 66 pairs concordant") // C(12,2)
    assert(up._6 === "increasing" && up._5 === 1.0)
    val flat = got("flat")
    assert(flat._2 === 0L && flat._3 === 0L, "ties kill S and the variance")
    assert(flat._4 === 0.0 && flat._6 === "none")
  }

  // ---- x263/x264 OPTIMIZE + column mapping ---------------------------------

  test("x264 rename algebra: chained renames update one entry, rename-back drops it") {
    val t = freshTable("ren_chain")
    val d0 = tinyDocs
    val v1 = TxnLog.commit(t, 0L, (0 until TxnLog.NumBuckets).map(b =>
      b -> d0.filter(col("doc_id") % TxnLog.NumBuckets === b)).toMap)
    val v2 = TxnLog.commitRename(spark, t, v1, "n_chars", "char_count")
    assert(TxnLog.snapshot(spark, t, v2).columns.toSeq ===
      Seq("doc_id", "lang", "char_count"))
    // renaming the LOGICAL name again must update the same physical entry
    val v3 = TxnLog.commitRename(spark, t, v2, "char_count", "len_chars")
    assert(TxnLog.snapshot(spark, t, v3).columns.toSeq ===
      Seq("doc_id", "lang", "len_chars"))
    // renaming back to the physical name drops the mapping entirely
    val v4 = TxnLog.commitRename(spark, t, v3, "len_chars", "n_chars")
    assert(TxnLog.snapshot(spark, t, v4).columns.toSeq ===
      Seq("doc_id", "lang", "n_chars"))
    // earlier versions keep THEIR mapping (time travel sees old names)
    assert(TxnLog.snapshot(spark, t, v2).columns.contains("char_count"))
  }

  test("x263 optimize folds every tombstoned bucket and refuses a clean table") {
    val t = freshTable("opt_unit")
    val d0 = tinyDocs
    val v1 = TxnLog.commit(t, 0L, (0 until TxnLog.NumBuckets).map(b =>
      b -> d0.filter(col("doc_id") % TxnLog.NumBuckets === b)).toMap)
    val v2 = TxnLog.commitDeletes(t,
      d0.filter(col("doc_id") % 2 === 0).select("doc_id"), "doc_id", v1)
    val v3 = TxnLog.optimize(spark, t, v2)
    val got = TxnLog.snapshot(spark, t, v3)
      .select("doc_id").as[Long].collect().toSet
    assert(got === Set(1L, 3L, 5L, 7L))
    // tombstone-free again: the metadata plane accepts it
    assert(TxnLog.metaAggregate(spark, t, v3)
      .filter(col("col_name") === "doc_id").head.getLong(1) === 4L)
    // nothing left to optimize — fail loud, not a silent empty commit
    assert(intercept[IllegalArgumentException](
      TxnLog.optimize(spark, t, v3)).getMessage.contains("nothing to optimize"))
  }

  // ---- x260 Mondrian conformal / x261 l-diversity -------------------------

  test("x260 Mondrian: per-group thresholds, sound sets, near-target coverage") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val rows = graft.ops.QualityFilters.mondrianConformalSets(docs)
      .select("lang", "set_size", "covered", "qhat")
      .as[(String, Long, Boolean, Long)].collect()
    assert(rows.nonEmpty && rows.forall(r => r._2 >= 0 && r._2 <= 2))
    // group-conditional: every language must hold its own coverage band
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val cov = rs.count(_._3).toDouble / rs.length
      assert(cov >= 0.8, s"$lang group coverage $cov collapsed")
      assert(rs.map(_._4).distinct.length === 1,
        s"$lang must carry ONE group threshold")
    }
  }

  test("x261 l-diversity flags the homogeneous group k-anonymity passes") {
    // group (1, 0): 5 rows (k-anonymous at k=5) but ONE segment —
    // homogeneous; group (2, 0): 3 rows, 3 segments — diverse
    val c = (Seq.fill(5)((1L, "BUILDING", 100.0)) ++
      Seq((2L, "AUTOMOBILE", 100.0), (2L, "MACHINERY", 100.0),
        (2L, "HOUSEHOLD", 100.0)))
      .toDF("c_nationkey", "c_mktsegment", "c_acctbal")
    val got = graft.ops.DataProfile.lDiversity(c)
      .select("nationkey", "n_rows", "n_sensitive", "l_diverse")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(got.toSeq === Seq((1L, 5L, 1L, false), (2L, 3L, 3L, true)))
  }

  test("x257 Sen slope: an even pair count averages BOTH middle slopes") {
    // 4 days, volumes 1/2/4/8 → 6 pairwise slopes sorted
    // 1, 1.5, 2, 7/3, 3, 4 — median = (2 + 7/3)/2 = 2.1667; selecting
    // only the upper middle (the double-division regression) would
    // read 2.3333
    def ev(day: Long, k: Int) = (0 until k).map(i =>
      (s"e$day-$i", 1L, "t", new java.sql.Timestamp(day * 86400000L + i),
        1.0, "{}"))
    val events = (Seq(1L -> 1, 2L -> 2, 3L -> 4, 4L -> 8)
      .flatMap { case (d, k) => ev(d, k) })
      .toDF("event_id", "user_id", "event_type", "ts", "value", "props")
    val sen = graft.ops.Events.mannKendallDaily(events)
      .select("sen_slope").as[Double].head()
    assert(sen === 2.1667)
  }

  // ---- x249 metadata-only aggregates ------------------------------------

  private def freshTable(name: String): String = {
    val t = graft.sources.Bucketing.buildPath(s"graft-txn-spec/$name")
    TxnLog.reset(t)
    t
  }

  private def tinyDocs = Seq(
    (0L, "en", 10L), (1L, "de", 20L), (2L, "en", 30L), (3L, "fr", 40L),
    (4L, "en", 50L), (5L, "de", 60L), (6L, "en", 70L), (7L, "fr", 80L))
    .toDF("doc_id", "lang", "n_chars")

  test("x249 metaAggregate matches the scan and launches no scan") {
    val t = freshTable("meta")
    val d0 = tinyDocs
    TxnLog.commit(t, 0L, (0 until TxnLog.NumBuckets).map(b =>
      b -> d0.filter(col("doc_id") % TxnLog.NumBuckets === b)).toMap)
    val got = TxnLog.metaAggregate(spark, t)
    assert(got.inputFiles.isEmpty, "metadata-only: no file may back the result")
    val rows = got.as[(String, Long, String, String)].collect().sortBy(_._1)
    assert(rows === Array(
      ("doc_id", 8L, "0", "7"),
      ("lang", 8L, "de", "fr"),
      ("n_chars", 8L, "10", "80")))
  }

  test("x249 metaAggregate refuses a snapshot with live deletion vectors") {
    val t = freshTable("meta_dv")
    val d0 = tinyDocs
    val v1 = TxnLog.commit(t, 0L, (0 until TxnLog.NumBuckets).map(b =>
      b -> d0.filter(col("doc_id") % TxnLog.NumBuckets === b)).toMap)
    TxnLog.commitDeletes(t, d0.filter(col("doc_id") === 2).select("doc_id"),
      "doc_id", v1)
    val e = intercept[IllegalArgumentException](TxnLog.metaAggregate(spark, t))
    assert(e.getMessage.contains("deletion vectors"))
  }

  // ---- x250 Bloom point-lookup skipping ----------------------------------

  test("x250 bloom sidecars prove absent keys absent; lookups match the scan") {
    val t = freshTable("bloom")
    val d0 = tinyDocs
    TxnLog.commit(t, 0L, (0 until TxnLog.NumBuckets).map(b =>
      b -> d0.filter(col("doc_id") % TxnLog.NumBuckets === b)).toMap,
      bloomCol = Some("doc_id"))
    // key 5 lives in bucket 1 only; the other three buckets' filters
    // must prove it absent (fpp is deterministic on this fixture)
    val (kept, pruned) = TxnLog.bloomCandidates(spark, t, "doc_id", Seq("5"))
    assert(kept.contains(1), s"home bucket must be kept: $kept")
    assert(pruned.nonEmpty, "some foreign bucket must be pruned")
    val got = TxnLog.snapshotPoints(spark, t, "doc_id", Seq("5", "999"))
      .select("doc_id", "lang", "n_chars").as[(Long, String, Long)].collect()
    assert(got.toSet === Set((5L, "de", 60L)))
    // an entirely absent probe set may prune everything — and still
    // answers (an empty frame), never errors
    val none = TxnLog.snapshotPoints(spark, t, "doc_id", Seq("998", "999"))
    assert(none.count() === 0L)
  }

  test("x250 a rewrite rebuilds its bucket's sidecar (no stale carry)") {
    val t = freshTable("bloom_rw")
    val d0 = tinyDocs
    val v1 = TxnLog.commit(t, 0L, (0 until TxnLog.NumBuckets).map(b =>
      b -> d0.filter(col("doc_id") % TxnLog.NumBuckets === b)).toMap,
      bloomCol = Some("doc_id"))
    // rewrite bucket 0 REPLACING doc 0/4 with 100/104 — the stale v1
    // sidecar would claim 4 present and 104 absent
    TxnLog.commit(t, v1, Map(0 ->
      Seq((100L, "en", 11L), (104L, "en", 51L)).toDF("doc_id", "lang", "n_chars")),
      bloomCol = Some("doc_id"))
    val got = TxnLog.snapshotPoints(spark, t, "doc_id", Seq("4", "104"))
      .select("doc_id").as[Long].collect().toSet
    assert(got === Set(104L))
    // vacuum reclaims the dead v1 bucket-0 generation AND its sidecar
    val reclaimed = TxnLog.vacuum(t, retainLast = 1)
    assert(reclaimed.exists(r => r.contains("bkt=0") && !r.contains("-blm")),
      s"dead data generation must be reclaimed: $reclaimed")
    assert(reclaimed.exists(_.contains("-blm")),
      s"dead bloom sidecar must be reclaimed with it: $reclaimed")
  }
}
