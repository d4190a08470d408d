package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.sources.TxnLog

/** Pins the round-13 concurrency/contract work that isn't
  * oracle-expressible: commitUpsert's key-unique batch guard and
  * read-dependent append conflicts (ADVICE r12), the maintenance
  * rebase over intervening blind appends (VERDICT r12 task 5), the
  * one-job commit write path's job counts (task 2), and the 64-bucket
  * behaviors the NumBuckets=4 fixtures cannot expose (task 4). */
class Round19OpsSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(name: String): String = {
    val t = graft.sources.Bucketing.buildPath(s"graft-txn-spec/$name")
    TxnLog.reset(t)
    t
  }
  private def tinyDocs = Seq(
    (0L, "en", 10L), (1L, "de", 20L), (2L, "en", 30L), (3L, "fr", 40L),
    (4L, "en", 50L), (5L, "de", 60L), (6L, "en", 70L), (7L, "fr", 80L))
    .toDF("doc_id", "lang", "n_chars")
  private def loadAll(t: String, bloomCol: Option[String] = None) =
    TxnLog.commit(t, 0L,
      (0 until TxnLog.NumBuckets).map(b =>
        b -> tinyDocs.filter(col("doc_id") % TxnLog.NumBuckets === b)).toMap,
      bloomCol = bloomCol)

  // ---- one-job commit writes (VERDICT r12, task 2) ------------------------

  /** Spark jobs launched while `body` runs (listener-bus flushed on
    * both sides so stray events never cross the measurement). */
  private def jobsDuring(body: => Unit): Int = {
    val n = new java.util.concurrent.atomic.AtomicInteger
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        n.incrementAndGet(): Unit
      }
    }
    org.apache.spark.graftbench.ListenerDrain.drain(spark.sparkContext)
    spark.sparkContext.addSparkListener(l)
    try { body; org.apache.spark.graftbench.ListenerDrain.drain(spark.sparkContext) }
    finally spark.sparkContext.removeSparkListener(l)
    n.get
  }

  test("a routed multi-bucket commit with sidecars launches O(1) jobs") {
    val t = freshTable("onejob")
    val writes = (0 until TxnLog.NumBuckets).map(b =>
      b -> tinyDocs.filter(col("doc_id") % TxnLog.NumBuckets === b)).toMap
    val jobs = jobsDuring {
      TxnLog.commit(t, 0L, writes, bloomCols = Seq("doc_id", "lang")): Unit
    }
    // one partitioned write (stats ride its Observation) + one grouped
    // sidecar build; AQE materializes the sidecar query's broadcast and
    // shuffle stages as sub-jobs of that ONE query, so the raw job
    // count is 4 — constant in the bucket count, where the legacy loop
    // launched B writes + B×C sidecar jobs (12 here, 192 at 64 buckets)
    assert(jobs <= 5, s"a routed commit must stay O(1) jobs, launched $jobs")
    // and the results are the legacy ones: stats, counts, probes
    assert(TxnLog.snapshot(spark, t).count() === 8L)
    assert((0 until TxnLog.NumBuckets).forall(b =>
      TxnLog.bloomStats(t)(b).map(_.col).toSet === Set("doc_id", "lang")))
    assert(TxnLog.bloomCandidates(spark, t, "doc_id", Seq("5"))._1 === Seq(1))
    assert(TxnLog.prunedBuckets(t, "n_chars", Some("75"), None)._1 === Seq(3))
  }

  test("the over-cap stats path (grouped read-back) stays O(1) jobs, same stats") {
    val t = freshTable("onejob_cap")
    val cap = TxnLog.ObserveAggCap
    try {
      TxnLog.ObserveAggCap = 0 // force the read-back path
      val writes = (0 until TxnLog.NumBuckets).map(b =>
        b -> tinyDocs.filter(col("doc_id") % TxnLog.NumBuckets === b)).toMap
      val jobs = jobsDuring {
        TxnLog.commit(t, 0L, writes, bloomCols = Seq("doc_id")): Unit
      }
      assert(jobs <= 6, s"read-back stats path must stay O(1) jobs, got $jobs")
    } finally TxnLog.ObserveAggCap = cap
    val ref = freshTable("onejob_cap_ref")
    TxnLog.commit(ref, 0L, (0 until TxnLog.NumBuckets).map(b =>
      b -> tinyDocs.filter(col("doc_id") % TxnLog.NumBuckets === b)).toMap,
      bloomCols = Seq("doc_id"))
    assert(TxnLog.zoneStats(t) === TxnLog.zoneStats(ref),
      "observe-path and read-back-path stats must be identical")
  }

  // ---- the lakehouse at a non-toy bucket count (VERDICT r12, task 4) ------

  test("64-bucket table: manifest size, conflicts, upserts and feeds hold") {
    TxnLog.numBucketsOverride = Some(64)
    try {
      val nb = TxnLog.NumBuckets
      assert(nb === 64)
      val t = freshTable("wide64")
      val docs64 = spark.range(0, 512).select(
        col("id").as("doc_id"),
        concat(lit("l"), (col("id") % 5).cast("string")).as("lang"),
        (col("id") * 7 % 1000).as("n_chars"))
      val writes = (0 until nb).map(b =>
        b -> docs64.filter(col("doc_id") % nb === b)).toMap
      val jobs = jobsDuring {
        TxnLog.commit(t, 0L, writes, bloomCols = Seq("doc_id")): Unit
      }
      assert(jobs <= 5,
        s"64-bucket commit must launch the same O(1) jobs as 4 buckets " +
          s"(legacy: 64 writes + 64 sidecar jobs), launched $jobs")
      // manifest carries full state for all 64 buckets: bucket + rows +
      // zmap×3 + bloom lines, bounded text
      val m = java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get(s"$t/_log/v000001.txt"))
      assert(m.asScala.count(_.startsWith("bucket ")) === 64)
      assert(m.asScala.count(_.startsWith("bloom ")) === 64)
      assert(TxnLog.snapshot(spark, t).count() === 512L)
      // a keyed upsert routes and Bloom-decides across 64 buckets in
      // one commit: key 70 exists (bucket 6) → rewrite; key 10000+6
      // is fresh on bucket 40... use nb-aligned fresh keys
      val batch = Seq((70L, "lx", 1L), (64L * 200 + 6L, "ly", 2L))
        .toDF("doc_id", "lang", "n_chars")
      val v2 = TxnLog.commitUpsert(spark, t, batch, "doc_id", "w64", 1L)
      val f2 = TxnLog.bucketFiles(t, v2) // key 70 routes to bucket 6
      assert(f2(6).size === 1, "matched bucket rewrites")
      val got = TxnLog.snapshot(spark, t, v2)
      assert(got.count() === 513L)
      assert(got.filter(col("doc_id") === 70L)
        .select("n_chars").as[Long].head() === 1L)
      // conflict algebra at 64: a stale rewrite of a touched bucket dies
      intercept[TxnLog.ConflictException](
        TxnLog.commit(t, 1L, Map(6 -> docs64.filter(col("doc_id") % nb === 6))))
      // the change feed reads only the changed buckets
      val feed = TxnLog.changeFeed(spark, t, 1L, v2, "doc_id")
      assert(feed.count() >= 3L) // pre+post for key 70, insert for the fresh key
      val touchedBuckets = feed.select((col("doc_id") % nb).cast("int"))
        .distinct().as[Int].collect().toSet
      assert(touchedBuckets.subsetOf(Set(6, (64 * 200 + 6) % 64)))
    } finally TxnLog.numBucketsOverride = None
  }

  // ---- OPTIMIZE/compaction rebases over blind appends (task 5) -----------

  test("an append lands during compaction; both commit; snapshot == serial order") {
    val t = freshTable("rebase_appends")
    val v1 = loadAll(t, bloomCol = Some("doc_id"))
    // bucket 0 accumulates an append file, so compaction has work
    TxnLog.commitAppend(spark, t,
      Seq((8L, "en", 90L)).toDF("doc_id", "lang", "n_chars"),
      "doc_id", "app", 1L)
    val v2 = TxnLog.latestVersion(t)
    // the compaction writer derives its fold AT v2...
    val fold = (0 until TxnLog.NumBuckets)
      .filter(b => TxnLog.bucketFiles(t, v2)(b).size > 1)
    assert(fold === Seq(0))
    // ...and while it runs, a BLIND append to bucket 0 lands first
    val v3 = TxnLog.commitAppend(spark, t,
      Seq((12L, "fr", 130L)).toDF("doc_id", "lang", "n_chars"),
      "doc_id", "app", 2L)
    assert(v3 === 3L)
    // the compaction commit (base v2) REBASES instead of conflicting:
    // its new generation replaces the files it read; the racing
    // append's file survives as the bucket's extra
    val v4 = TxnLog.compactFiles(spark, t, v2)
    assert(v4 === 4L)
    val files4 = TxnLog.bucketFiles(t, v4)
    assert(files4(0).size === 2,
      s"the racing append's file must survive the rebase, got ${files4(0)}")
    assert(files4(0).exists(_.contains("/a3-")),
      s"the survivor must be v3's appended file, got ${files4(0)}")
    // snapshot ≡ serial order: all original rows + both appended rows
    val got = TxnLog.snapshot(spark, t, v4)
      .select("doc_id", "n_chars").as[(Long, Long)].collect().toMap
    assert(got.keySet === (0L to 8L).toSet + 12L)
    assert(got(8L) === 90L && got(12L) === 130L)
    // stats stayed sound: row counts add up, zone maps cover the range,
    // and the survivor's sidecar still answers point probes
    assert(TxnLog.snapshot(spark, t, v4).count() === 10L)
    val (k12, _) = TxnLog.bloomCandidates(spark, t, "doc_id", Seq("12"), v4)
    assert(k12 === Seq(0), s"the carried append's sidecar must probe, got $k12")
    val (kRange, _) = TxnLog.prunedBuckets(t, "doc_id", Some("12"), None, v4)
    assert(kRange.contains(0), "widened zone maps must cover the carried file")
    // a SEMANTIC rewrite in the same race still conflicts (strict path)
    TxnLog.commitAppend(spark, t,
      Seq((16L, "de", 160L)).toDF("doc_id", "lang", "n_chars"),
      "doc_id", "app", 3L)
    intercept[TxnLog.ConflictException](
      TxnLog.commit(t, v4, Map(0 ->
        Seq((0L, "en", 10L)).toDF("doc_id", "lang", "n_chars"))))
  }

  // ---- shallow clone (x279) ----------------------------------------------

  test("shallow clone: zero-copy, divergent both ways, vacuum-safe") {
    val src = freshTable("clone_src")
    val tgt = freshTable("clone_tgt")
    val v1 = loadAll(src, bloomCol = Some("doc_id"))
    TxnLog.clone(src, tgt)
    // zero copy: the clone reads EXACTLY the source's files
    assert(TxnLog.snapshot(spark, tgt).inputFiles.toSet ===
      TxnLog.snapshot(spark, src, v1).inputFiles.toSet)
    // cloned stats/sidecars answer without any local data
    assert(TxnLog.bloomCandidates(spark, tgt, "doc_id", Seq("5"))._1 === Seq(1))
    // divergence: source writes after the clone point are invisible...
    TxnLog.commit(src, v1, Map(1 ->
      Seq((5L, "de", 999L)).toDF("doc_id", "lang", "n_chars")))
    assert(TxnLog.snapshot(spark, tgt)
      .filter(col("doc_id") === 5L).select("n_chars").as[Long].head() === 60L)
    // ...and the clone's own writes land locally, invisible to source
    TxnLog.commit(tgt, 1L, Map(2 ->
      Seq((6L, "en", 777L)).toDF("doc_id", "lang", "n_chars")))
    assert(TxnLog.snapshot(spark, src)
      .filter(col("doc_id") === 6L).select("n_chars").as[Long].head() === 70L)
    assert(TxnLog.bucketFiles(tgt)(2).forall(r => !r.startsWith("/")))
    // vacuum on the clone reclaims only CLONE-owned dirs — the
    // replaced bucket-2 ref was a source-owned absolute rel
    val reclaimed = TxnLog.vacuum(tgt, retainLast = 1)
    assert(reclaimed.forall(r => !r.startsWith("/")),
      s"vacuum on a clone must never touch source files, got $reclaimed")
    assert(TxnLog.snapshot(spark, src, v1).count() === 8L,
      "the source (incl. its v1 snapshot) survives the clone's vacuum")
    // a clone onto an existing log refuses
    intercept[IllegalArgumentException](TxnLog.clone(src, tgt))
  }

  // ---- metadata-only type widening (x280) ---------------------------------

  test("type widening: metadata-only, mixed-width scan, guarded edges") {
    val t = freshTable("widen")
    val narrow = tinyDocs.select(col("doc_id"), col("lang"),
      col("n_chars").cast("int").as("n_chars"))
    val v1 = TxnLog.commit(t, 0L,
      (0 until TxnLog.NumBuckets).map(b =>
        b -> narrow.filter(col("doc_id") % TxnLog.NumBuckets === b)).toMap)
    val v2 = TxnLog.commitWiden(spark, t, v1, "n_chars", "bigint")
    assert(TxnLog.snapshot(spark, t).schema("n_chars")
      .dataType.catalogString === "bigint")
    // wide write next to narrow generations; one scan serves both
    TxnLog.commit(t, v2, Map(1 ->
      Seq((1L, "de", 5000000020L), (5L, "de", 5000000060L))
        .toDF("doc_id", "lang", "n_chars")))
    val got = TxnLog.snapshot(spark, t)
      .select("doc_id", "n_chars").as[(Long, Long)].collect().toMap
    assert(got(1L) === 5000000020L && got(0L) === 10L && got.size === 8)
    // pruned reads speak the wide type too and stay sound across the
    // mixed dtypes (zone maps compare numerically)
    val wide = TxnLog.snapshotRange(spark, t, "n_chars",
      Some("5000000000"), None).select("doc_id").as[Long].collect().toSet
    assert(wide === Set(1L, 5L))
    // unsupported widenings and the widen/drop interplay fail loud
    intercept[IllegalArgumentException](
      TxnLog.commitWiden(spark, t, TxnLog.latestVersion(t), "lang", "bigint"))
    intercept[IllegalArgumentException](
      TxnLog.commitDrop(spark, t, TxnLog.latestVersion(t), "n_chars"))
  }

  // ---- quantizer-drift audit (x281) ----------------------------------------

  test("x281 drift audit flags the deliberately-drifted epochs only") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.pipelines.Extensions
      .queries("x281_ivf_drift")(spark, dir)
      .select("epoch", "moved_frac", "mean_cos", "drift_flag")
      .as[(Long, Double, Double, Int)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(1L, 2L, 3L))
    val (e1, e2, e3) = (rows(0), rows(1), rows(2))
    assert(e1._2 === 0.0 && e1._4 === 0,
      "the training epoch must not flag (nothing moved)")
    assert(e2._4 === 1 && e3._4 === 1,
      s"the negated epochs must flag, got $e2 / $e3")
    assert(e2._3 <= e1._3,
      "mean member-to-centroid cosine must not improve under drift")
  }

  // ---- CHECK constraints (x282) -------------------------------------------

  test("CHECK constraints: add-time scan, write enforcement, metadata conflict") {
    val t = freshTable("constraints")
    val v1 = loadAll(t, bloomCol = Some("doc_id"))
    // adding a constraint the existing data violates refuses
    intercept[IllegalArgumentException](
      TxnLog.commitConstraint(spark, t, v1, "too_strict", "n_chars > 50"))
    val v2 = TxnLog.commitConstraint(spark, t, v1, "chars_pos", "n_chars > 0")
    assert(TxnLog.constraints(t) === Map("chars_pos" -> "n_chars > 0"))
    // a violating routed write aborts with nothing committed
    val bad = Seq((8L, "en", 0L)).toDF("doc_id", "lang", "n_chars")
    val e = intercept[IllegalArgumentException](
      TxnLog.commitMerged(spark, t, bad, "doc_id", "w", 1L))
    assert(e.getMessage.contains("chars_pos"))
    assert(TxnLog.latestVersion(t) === v2)
    // a violating APPEND aborts too (both write paths enforce)
    intercept[IllegalArgumentException](
      TxnLog.commitAppend(spark, t, bad, "doc_id", "w", 2L))
    // NULL satisfies (SQL semantics); a clean write commits
    val ok = Seq((8L, "en", Some(90L)), (12L, "de", None))
      .toDF("doc_id", "lang", "n_chars")
    val v3 = TxnLog.commitMerged(spark, t, ok, "doc_id", "w", 3L)
    assert(TxnLog.snapshot(spark, t, v3).count() === 10L)
    // a writer whose base predates a constraint change conflicts
    val v4 = TxnLog.commitDropConstraint(t, v3, "chars_pos")
    intercept[TxnLog.ConflictException](
      TxnLog.commit(t, v3, Map(0 ->
        Seq((0L, "en", 10L)).toDF("doc_id", "lang", "n_chars"))))
    // rename/drop of a referenced column refuse while it stands
    val v5 = TxnLog.commitConstraint(spark, t, v4, "lang_set", "lang IS NOT NULL")
    intercept[IllegalArgumentException](
      TxnLog.commitRename(spark, t, v5, "lang", "language"))
    intercept[IllegalArgumentException](
      TxnLog.commitDrop(spark, t, v5, "lang"))
  }

  // ---- REPLACE WHERE (x283) ------------------------------------------------

  test("replaceWhere: stat-planned swap, untouched pruned buckets, guards") {
    val t = freshTable("replacewhere")
    val v1 = loadAll(t, bloomCol = Some("doc_id"))
    val files1 = TxnLog.bucketFiles(t, v1)
    // FP-verified on this table: doc_id 5 keeps ONLY bucket 1
    assert(TxnLog.bloomCandidates(spark, t, "doc_id", Seq("5"))._1 === Seq(1))
    val preds = Seq(TxnLog.PointsPred("doc_id", Seq("5")))
    // a batch outside the predicate refuses (the Delta contract)
    intercept[IllegalArgumentException](
      TxnLog.commitReplaceWhere(spark, t, preds,
        Seq((6L, "en", 1L)).toDF("doc_id", "lang", "n_chars"),
        "doc_id", "rw", 1L))
    val v2 = TxnLog.commitReplaceWhere(spark, t, preds,
      Seq((5L, "de", 999L)).toDF("doc_id", "lang", "n_chars"),
      "doc_id", "rw", 2L)
    val files2 = TxnLog.bucketFiles(t, v2)
    Seq(0, 2, 3).foreach(b => assert(files2(b) === files1(b),
      s"pruned bucket $b must be untouched"))
    assert(files2(1) !== files1(1))
    val got = TxnLog.snapshot(spark, t, v2)
      .select("doc_id", "n_chars").as[(Long, Long)].collect().toMap
    assert(got(5L) === 999L && got.size === 8)
    // replay is a no-op
    assert(TxnLog.commitReplaceWhere(spark, t, preds,
      Seq((5L, "de", 999L)).toDF("doc_id", "lang", "n_chars"),
      "doc_id", "rw", 2L) === v2)
    // a range swap that deletes without replacing in some kept bucket:
    // n_chars in [60, 80] hits buckets 1 (5->999 gone? no - 999 out of
    // range), 2 (6: 70), 3 (7: 80) — replacement only re-adds key 6
    val rpreds = Seq(TxnLog.RangePred("n_chars", Some("60"), Some("80")))
    val v3 = TxnLog.commitReplaceWhere(spark, t, rpreds,
      Seq((6L, "en", 75L)).toDF("doc_id", "lang", "n_chars"),
      "doc_id", "rw", 3L)
    val after = TxnLog.snapshot(spark, t, v3)
      .select("doc_id", "n_chars").as[(Long, Long)].collect().toMap
    assert(!after.contains(7L), "an in-range row with no replacement dies")
    assert(after(6L) === 75L)
    assert(after(5L) === 999L, "out-of-range rows survive")
  }

  // ---- commitUpsert contracts (ADVICE r12) -------------------------------

  test("commitUpsert refuses a batch whose rows share a key") {
    val t = freshTable("ups_dupkey")
    loadAll(t, bloomCol = Some("doc_id"))
    val dup = Seq((8L, "en", 90L), (8L, "de", 91L))
      .toDF("doc_id", "lang", "n_chars")
    val e = intercept[IllegalArgumentException](
      TxnLog.commitUpsert(spark, t, dup, "doc_id", "ups", 1L))
    assert(e.getMessage.contains("key-unique"))
    // nothing committed — the guard fires before any write
    assert(TxnLog.latestVersion(t) === 1L)
    assert(TxnLog.snapshot(spark, t).count() === 8L)
  }

  test("an upsert's Bloom-proven append conflicts with an intervening append") {
    val t = freshTable("ups_readdep")
    val v1 = loadAll(t, bloomCol = Some("doc_id"))
    // two writers race to insert the same fresh key 8 (bucket 0), both
    // reading base v1. Writer A lands first as a blind commitAppend;
    // writer B's upsert proved key 8 absent AT v1 — its no-match
    // append is read-dependent and must NOT coexist with A's insert
    // (both landing would duplicate the key the MERGE contract
    // guarantees unique).
    val fresh = Seq((8L, "en", 90L)).toDF("doc_id", "lang", "n_chars")
    TxnLog.commitAppend(spark, t, fresh, "doc_id", "writerA", 1L)
    intercept[TxnLog.ConflictException](
      TxnLog.commit(t, v1, Map.empty,
        appends = Map(0 -> fresh), readDependentAppends = true))
    // the same race under the TRULY blind contract still coexists
    // (commitAppend-vs-commitAppend: no read dependency on either side)
    val v3 = TxnLog.commit(t, v1, Map.empty, appends = Map(0 -> fresh))
    assert(v3 === 3L)
    // a re-derived upsert at the current base then updates in place
    val v4 = TxnLog.commitUpsert(spark, t,
      Seq((8L, "en", 95L)).toDF("doc_id", "lang", "n_chars"),
      "doc_id", "writerB", 2L)
    val got = TxnLog.snapshot(spark, t, v4)
      .filter(col("doc_id") === 8L)
      .select("n_chars").as[Long].collect().toSeq
    assert(got === Seq(95L),
      "the rebased upsert must fold both race losers to one row")
  }
}
