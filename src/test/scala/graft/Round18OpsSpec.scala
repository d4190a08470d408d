package graft

import org.apache.spark.sql.functions._

import graft.sources.TxnLog

/** Pins the round-12 ADVICE fixes that aren't oracle-expressible:
  * per-column intersection of repeated Bloom probes under conjunction
  * (ADVICE r11 low), the null-filled read of a re-added column whose
  * generations were all pruned away (ADVICE r11 medium), and RESTORE's
  * no-op short-circuit (ADVICE r11 low). */
class Round18OpsSpec extends SparkSpec {
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

  // ---- repeated same-column Bloom probes intersect (ADVICE r11) --------

  test("two PointsPreds on one column intersect their probe sets") {
    val t = freshTable("bloom_intersect")
    loadAll(t, bloomCol = Some("doc_id"))
    // doc_id IN (1,5) AND doc_id IN (5): the effective probe is {5} —
    // only bucket 1 (5 % 4) may match, and the row survives the residual
    val both = Seq(
      TxnLog.PointsPred("doc_id", Seq("1", "5")),
      TxnLog.PointsPred("doc_id", Seq("5")))
    val (kept, _) = TxnLog.prunedBucketsWhere(spark, t, both)
    assert(kept === Seq(1))
    assert(TxnLog.snapshotWhere(spark, t, both)
      .select("doc_id").as[Long].collect().toSeq === Seq(5L))
    // an EMPTY intersection (doc_id IN (0) AND doc_id IN (1)) proves
    // every sidecar'd bucket empty — pre-fix, the first conjunct's
    // probe was silently discarded and bucket 1 survived
    val disjoint = Seq(
      TxnLog.PointsPred("doc_id", Seq("0")),
      TxnLog.PointsPred("doc_id", Seq("1")))
    val (kept2, pruned2) = TxnLog.prunedBucketsWhere(spark, t, disjoint)
    assert(kept2.isEmpty && pruned2.size === TxnLog.NumBuckets)
    assert(TxnLog.snapshotWhere(spark, t, disjoint).count() === 0L)
  }

  // ---- pruned read of a re-added column (ADVICE r11) --------------------

  test("snapshotWhere null-fills a re-added column pruned from every kept bucket") {
    val t = freshTable("readd_pruned")
    val v1 = loadAll(t)
    val v2 = TxnLog.commitDrop(spark, t, v1, "n_chars")
    // re-add n_chars via a bucket-1 rewrite only — the fresh physical
    // column exists in NO other generation
    TxnLog.commit(t, v2, Map(1 ->
      tinyDocs.filter(col("doc_id") % TxnLog.NumBuckets === 1)
        .withColumn("n_chars", col("n_chars") * 10)))
    // doc_id ∈ [6,7] prunes buckets 0 and 1 by zone maps (their maxes
    // are 4 and 5) — every kept bucket lacks the re-added physical
    // column; pre-fix this crashed in residual resolution
    val preds = Seq(
      TxnLog.RangePred("doc_id", Some("6"), Some("7")),
      TxnLog.RangePred("n_chars", Some("0"), None))
    val (kept, _) = TxnLog.prunedBucketsWhere(spark, t, preds)
    assert(!kept.contains(1), "the rewritten bucket must be pruned away")
    val got = TxnLog.snapshotWhere(spark, t, preds)
    assert(got.columns.contains("n_chars"),
      "the logical schema keeps the re-added column")
    assert(got.count() === 0L,
      "kept buckets read the re-added column as NULL — excluded by the residual")
    // the same conjunction over a range that keeps bucket 1 still serves
    // its rows (the filled column only affects buckets lacking it)
    val served = TxnLog.snapshotWhere(spark, t, Seq(
      TxnLog.RangePred("doc_id", Some("0"), Some("5")),
      TxnLog.RangePred("n_chars", Some("0"), None)))
      .select("doc_id", "n_chars").as[(Long, Long)].collect().toMap
    assert(served === Map(1L -> 200L, 5L -> 600L))
  }

  // ---- multi-file generations + compaction (x274) -------------------------

  test("x274 commitAppend writes O(batch) files; compactFiles folds them") {
    val t = freshTable("appendfiles")
    val v1 = loadAll(t, bloomCol = Some("doc_id"))
    val files1 = TxnLog.bucketFiles(t, v1)
    // one append batch of 4 fresh keys, one per bucket
    val batchA = Seq((8L, "en", 90L), (9L, "de", 100L),
      (10L, "fr", 110L), (11L, "es", 120L)).toDF("doc_id", "lang", "n_chars")
    val v2 = TxnLog.commitAppend(spark, t, batchA, "doc_id", "app", 1L)
    val files2 = TxnLog.bucketFiles(t, v2)
    (0 until TxnLog.NumBuckets).foreach { b =>
      assert(files2(b).head === files1(b).head,
        "an append must never rewrite the primary generation")
      assert(files2(b).size === 2, "each bucket gains exactly one file")
    }
    assert(TxnLog.snapshot(spark, t, v2).count() === 12L)
    // per-file sidecars: an APPENDED key keeps its bucket, garbage prunes all
    val (kNew, _) = TxnLog.bloomCandidates(spark, t, "doc_id", Seq("9"), v2)
    assert(kNew === Seq(1), s"the appended file's sidecar must answer, got $kNew")
    val (kNone, _) =
      TxnLog.bloomCandidates(spark, t, "doc_id", Seq("777777"), v2)
    assert(kNone.isEmpty)
    // zone maps widened: a range probe over appended keys keeps buckets
    val (kRange, _) = TxnLog.prunedBuckets(t, "doc_id", Some("8"), None, v2)
    assert(kRange.size === TxnLog.NumBuckets,
      "widened zone maps must cover the appended keys")
    // replayed micro-batch is a no-op
    assert(TxnLog.commitAppend(spark, t, batchA, "doc_id", "app", 1L) === v2)
    // second append, then compaction folds everything per bucket
    val batchB = Seq((12L, "zh", 130L), (13L, "en", 140L))
      .toDF("doc_id", "lang", "n_chars")
    val v3 = TxnLog.commitAppend(spark, t, batchB, "doc_id", "app", 2L)
    assert(TxnLog.bucketFiles(t, v3)(0).size === 3)
    val before = TxnLog.snapshot(spark, t, v3)
      .select("doc_id", "n_chars").as[(Long, Long)].collect().toMap
    val v4 = TxnLog.compactFiles(spark, t, v3)
    val files4 = TxnLog.bucketFiles(t, v4)
    assert(files4.values.forall(_.size === 1),
      "compaction folds every bucket back to one generation")
    val after = TxnLog.snapshot(spark, t, v4)
      .select("doc_id", "n_chars").as[(Long, Long)].collect().toMap
    assert(after === before, "compaction must not change snapshot content")
    // sidecars refreshed to one per bucket and still answering
    assert(TxnLog.bloomStats(t, v4).values.forall(_.size === 1))
    assert(TxnLog.bloomCandidates(spark, t, "doc_id", Seq("13"), v4)
      ._1 === Seq(1))
    // the change feed sees the appended rows as inserts, and its plan
    // reads ONLY the appended files — never the unchanged primaries
    // (the append-only fast path: O(new files), not O(bucket))
    val feed = TxnLog.changeFeed(spark, t, v1, v2, "doc_id")
    assert(feed.filter(col("change_type") === "insert").count() === 4L)
    assert(feed.filter(col("change_type") =!= "insert").count() === 0L)
    val appendRels = (0 until TxnLog.NumBuckets)
      .flatMap(b => TxnLog.bucketFiles(t, v2)(b).drop(1)).toSet
    assert(feed.inputFiles.nonEmpty &&
      feed.inputFiles.forall(f => appendRels.exists(r => f.contains(r))),
      s"append-only feed must read only the new files: " +
        s"${feed.inputFiles.mkString(",")}")
  }

  test("x274 restore re-references multi-file states; vacuum reclaims compacted files") {
    val t = freshTable("append_retention")
    val v1 = loadAll(t, bloomCol = Some("doc_id"))
    val batch = Seq((8L, "en", 90L), (9L, "de", 100L))
      .toDF("doc_id", "lang", "n_chars")
    val v2 = TxnLog.commitAppend(spark, t, batch, "doc_id", "ar", 1L)
    val v3 = TxnLog.compactFiles(spark, t, v2)
    // restore to the multi-file version carries its bfile list verbatim
    val v4 = TxnLog.restore(t, v2)
    assert(TxnLog.bucketFiles(t, v4) === TxnLog.bucketFiles(t, v2))
    assert(TxnLog.snapshot(spark, t, v4).count() === 10L)
    // back to the compacted state, then retention: the append files
    // (referenced only by expired manifests now) are reclaimed with
    // their sidecars; the live snapshot is untouched
    val v5 = TxnLog.restore(t, v3)
    assert(TxnLog.bucketFiles(t, v5).values.forall(_.size === 1))
    val reclaimed = TxnLog.vacuum(t, retainLast = 1)
    assert(reclaimed.exists(_.contains("data/a")),
      s"dead append files must be reclaimed: $reclaimed")
    assert(TxnLog.snapshot(spark, t).count() === 10L)
  }

  test("x274 an append with a divergent schema fails loud") {
    val t = freshTable("append_schema")
    loadAll(t)
    val bad = Seq((8L, "en")).toDF("doc_id", "lang") // n_chars missing
    assert(intercept[IllegalArgumentException](
      TxnLog.commitAppend(spark, t, bad, "doc_id", "as", 1L))
      .getMessage.contains("schema mismatch"))
  }

  test("x274 blind appends to the same bucket coexist; rewrites still conflict") {
    val t = freshTable("append_race")
    val v1 = loadAll(t, bloomCol = Some("doc_id"))
    val bA = Seq((8L, "en", 90L)).toDF("doc_id", "lang", "n_chars")
    val bB = Seq((12L, "de", 91L)).toDF("doc_id", "lang", "n_chars")
    // writer A appends to bucket 0 and commits v2; writer B — STILL
    // BASED AT v1 — appends to the same bucket: a blind append has no
    // read dependency on the bucket, so B REBASES and commits v3 with
    // BOTH files (the Delta blind-append contract)
    val v2 = TxnLog.commit(t, v1, Map.empty, appends = Map(0 -> bA))
    val v3 = TxnLog.commit(t, v1, Map.empty, appends = Map(0 -> bB))
    assert(v3 === v2 + 1)
    assert(TxnLog.bucketFiles(t, v3)(0).size === 3)
    val ids = TxnLog.snapshot(spark, t, v3)
      .select("doc_id").as[Long].collect().toSet
    assert(ids.contains(8L) && ids.contains(12L) && ids.size === 10)
    // and the merged stats answer for BOTH writers' keys
    assert(TxnLog.bloomCandidates(spark, t, "doc_id", Seq("8"), v3)._1
      === Seq(0))
    assert(TxnLog.bloomCandidates(spark, t, "doc_id", Seq("12"), v3)._1
      === Seq(0))
    // a REWRITE still based at v1 races BOTH appends — hard conflict
    assert(intercept[TxnLog.ConflictException](
      TxnLog.commit(t, v1, Map(0 ->
        tinyDocs.filter(col("doc_id") % TxnLog.NumBuckets === 0))))
      .getMessage.contains("touched buckets 0"))
    // and an append racing a REWRITE conflicts the other way round
    val v4 = TxnLog.commit(t, v3, Map(0 ->
      TxnLog.snapshot(spark, t, v3)
        .filter(col("doc_id") % TxnLog.NumBuckets === 0)))
    assert(intercept[TxnLog.ConflictException](
      TxnLog.commit(t, v3, Map.empty, appends = Map(0 -> bA)))
      .getMessage.contains("touched buckets 0"))
    assert(TxnLog.latestVersion(t) === v4)
  }

  test("x274 appends to tombstoned or absent buckets are refused") {
    val t = freshTable("append_refuse")
    val v1 = loadAll(t)
    val v2 = TxnLog.commitDeletes(t,
      tinyDocs.filter(col("doc_id") === 0L).select("doc_id"), "doc_id", v1)
    val fresh = Seq((8L, "en", 90L)).toDF("doc_id", "lang", "n_chars")
    assert(intercept[IllegalArgumentException](
      TxnLog.commitAppend(spark, t, fresh, "doc_id", "a", 1L))
      .getMessage.contains("live deletion vectors"))
    assert(TxnLog.latestVersion(t) === v2)
  }

  // ---- keyed MERGE INTO (x273) --------------------------------------------

  test("x273 commitUpsert: matched buckets rewrite, no-match buckets append") {
    val t = freshTable("upsert")
    val v1 = loadAll(t, bloomCol = Some("doc_id"))
    val files1 = TxnLog.bucketFiles(t, v1)
    // key 5 exists (bucket 1) → update; key 8 is fresh (bucket 0) → insert
    val batch = Seq((5L, "de", 999L), (8L, "en", 90L))
      .toDF("doc_id", "lang", "n_chars")
    val v2 = TxnLog.commitUpsert(spark, t, batch, "doc_id", "ups", 1L)
    val files2 = TxnLog.bucketFiles(t, v2)
    assert(files2(1).size === 1 && files2(1).head != files1(1).head,
      "the matched bucket must be rewritten (merge path)")
    assert(files2(0).head === files1(0).head && files2(0).size === 2,
      "the no-match bucket must take an O(batch) append, not a rewrite")
    assert(files2(2) === files1(2) && files2(3) === files1(3),
      "unrouted buckets are untouched")
    val got = TxnLog.snapshot(spark, t, v2)
      .select("doc_id", "n_chars").as[(Long, Long)].collect()
    assert(got.count(_._1 == 5L) === 1, "an upsert never duplicates a key")
    assert(got.toMap.apply(5L) === 999L && got.toMap.apply(8L) === 90L)
    assert(got.length === 9)
    // replay is a no-op
    assert(TxnLog.commitUpsert(spark, t, batch, "doc_id", "ups", 1L) === v2)
  }

  test("x273 upsert into a tombstoned bucket merges and keeps deletes deleted") {
    val t = freshTable("upsert_tombed")
    val v1 = loadAll(t, bloomCol = Some("doc_id"))
    val v2 = TxnLog.commitDeletes(t,
      tinyDocs.filter(col("doc_id") === 0L).select("doc_id"), "doc_id", v1)
    // key 8 routes to bucket 0 (tombstoned) and matches nothing — the
    // Bloom shortcut must NOT apply; the merge path folds the tombstone
    val v3 = TxnLog.commitUpsert(spark, t,
      Seq((8L, "en", 90L)).toDF("doc_id", "lang", "n_chars"),
      "doc_id", "ups", 2L)
    val ids = TxnLog.snapshot(spark, t, v3)
      .select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(0L), "the tombstoned key stays deleted")
    assert(ids.contains(8L))
    assert(TxnLog.bucketFiles(t, v3)(0).size === 1,
      "a tombstoned bucket takes the rewrite path")
  }

  // ---- multi-column Bloom sidecars (x276) ---------------------------------

  test("x276 a commit builds one sidecar per indexed column; both probe") {
    val t = freshTable("multibloom")
    TxnLog.commit(t, 0L,
      (0 until TxnLog.NumBuckets).map(b =>
        b -> tinyDocs.filter(col("doc_id") % TxnLog.NumBuckets === b)).toMap,
      bloomCols = Seq("doc_id", "lang"))
    val refs = TxnLog.bloomStats(t)
    assert((0 until TxnLog.NumBuckets).forall(b =>
      refs(b).map(_.col).toSet === Set("doc_id", "lang")))
    // each column's sidecars prune independently
    val (kd, _) = TxnLog.bloomCandidates(spark, t, "doc_id", Seq("5"))
    assert(kd === Seq(1))
    val (kl, _) = TxnLog.bloomCandidates(spark, t, "lang", Seq("zz"))
    assert(kl.isEmpty)
    // and a cross-column conjunction probes both in one pass: doc_id 5
    // lives in bucket 1 and is 'de' — probing lang 'fr' kills it
    val (kc, _) = TxnLog.prunedBucketsWhere(spark, t, Seq(
      TxnLog.PointsPred("doc_id", Seq("5")),
      TxnLog.PointsPred("lang", Seq("fr"))))
    assert(!kc.contains(1) || TxnLog.snapshotWhere(spark, t, Seq(
      TxnLog.PointsPred("doc_id", Seq("5")),
      TxnLog.PointsPred("lang", Seq("fr")))).count() === 0L)
    val served = TxnLog.snapshotWhere(spark, t, Seq(
      TxnLog.PointsPred("doc_id", Seq("5")),
      TxnLog.PointsPred("lang", Seq("de"))))
      .select("doc_id").as[Long].collect().toSeq
    assert(served === Seq(5L))
  }

  test("x276 optimize auto-refreshes buckets indexed on DIFFERENT columns") {
    val t = freshTable("multibloom_opt")
    // bucket 0 indexed on doc_id, bucket 1 on lang — the r11 requires
    // refused to OPTIMIZE this shape in one commit
    val v1 = TxnLog.commit(t, 0L, Map(
      0 -> tinyDocs.filter(col("doc_id") % TxnLog.NumBuckets === 0),
      2 -> tinyDocs.filter(col("doc_id") % TxnLog.NumBuckets === 2),
      3 -> tinyDocs.filter(col("doc_id") % TxnLog.NumBuckets === 3)),
      bloomCol = Some("doc_id"))
    val v2 = TxnLog.commit(t, v1, Map(
      1 -> tinyDocs.filter(col("doc_id") % TxnLog.NumBuckets === 1)),
      bloomCol = Some("lang"))
    val v3 = TxnLog.commitDeletes(t,
      tinyDocs.filter(col("doc_id") <= 1).select("doc_id"), "doc_id", v2)
    val v4 = TxnLog.optimize(spark, t, v3)
    val refs = TxnLog.bloomStats(t, v4)
    assert(refs(0).map(_.col) === Seq("doc_id") &&
      refs(1).map(_.col) === Seq("lang"),
      "each rewritten bucket refreshes ITS OWN sidecar columns")
    val pre = TxnLog.bloomStats(t, v3)
    assert(refs(0).head.rel != pre(0).head.rel &&
      refs(1).head.rel != pre(1).head.rel,
      "the rewrite must produce fresh sidecars, never carry stale ones")
    assert(TxnLog.snapshot(spark, t, v4).count() === 6L)
  }

  // ---- ZOrderN (x277) -----------------------------------------------------

  test("ZOrderN matches the reference bit loop and ZOrder2 at n=2") {
    import graft.functions.{ZOrder2, ZOrderN}
    def slowN(vs: Seq[Long]): Long = {
      val n = vs.length; val bits = 64 / n
      (0 until n).map { i =>
        (0 until bits).map(j => ((vs(i) >>> j) & 1L) << (j * n + i))
          .foldLeft(0L)(_ | _)
      }.foldLeft(0L)(_ | _)
    }
    val samples = Seq(0L, 1L, 2L, 7L, 255L, 1023L, 0xffffffffL, 123456789L)
    for (a <- samples; b <- samples) {
      assert(ZOrderN.interleaveN(Array(a, b)) === ZOrder2.interleave(a, b),
        s"n=2 must be bit-identical to ZOrder2: a=$a b=$b")
    }
    for (a <- samples; b <- samples.take(4); c <- samples.take(4))
      assert(ZOrderN.interleaveN(Array(a, b, c)) === slowN(Seq(a, b, c)))
    // the codegen path agrees with the interpreter and is null-safe
    graft.functions.ZOrderN.register(spark)
    val out = Seq((5L, Some(9L), 3L), (1023L, None, 0L))
      .toDF("a", "b", "c")
      .selectExpr("graft_zordern(a, b, c)").as[Option[Long]].collect().toSeq
    assert(out === Seq(Some(ZOrderN.interleaveN(Array(5L, 9L, 3L))), None))
  }

  // ---- one-pass null-routing OPTIMIZE ZORDER (ADVICE r11 high) ----------

  test("optimizeZorder preserves rows with null z-values (routed to bucket 0)") {
    val t = freshTable("zorder_nulls")
    // n_chars is null on 3 of 8 rows — the old rewrite silently dropped
    // them (all four range filters evaluate to null)
    val d0 = Seq(
      (0L, Some(10L)), (1L, None), (2L, Some(30L)), (3L, None),
      (4L, Some(50L)), (5L, Some(60L)), (6L, None), (7L, Some(80L)))
      .toDF("doc_id", "n_chars")
    val v1 = TxnLog.commit(t, 0L, (0 until TxnLog.NumBuckets).map(b =>
      b -> d0.filter(col("doc_id") % TxnLog.NumBuckets === b)).toMap)
    val v2 = TxnLog.optimizeZorder(spark, t, "n_chars", "doc_id", v1)
    val got = TxnLog.snapshot(spark, t, v2)
      .select("doc_id", "n_chars").as[(Long, Option[Long])].collect().toMap
    assert(got.size === 8, "a row-preserving rewrite must keep every row")
    assert(got(1L).isEmpty && got(3L).isEmpty && got(6L).isEmpty)
    assert(got(7L) === Some(80L))
  }

  test("zorderWrites reads the base data once (no bucket write re-scans parquet)") {
    val t = freshTable("zorder_onepass")
    val v1 = loadAll(t)
    val (writes, ck) = TxnLog.zorderWrites(spark, t, Seq("n_chars", "doc_id"), v1)
    try {
      assert(writes.size === TxnLog.NumBuckets)
      // every rewrite frame descends from the checkpointed leaf — zero
      // parquet inputs means the base generations are read exactly once
      // (the checkpoint materialization), not once per output bucket
      assert(writes.values.forall(_.inputFiles.isEmpty),
        "bucket writes must read the checkpoint blocks, not base parquet")
      // and the frames partition the visible rows exactly
      val total = writes.values.map(_.count()).sum
      assert(total === 8L)
    } finally org.apache.spark.sql.graftbench.CheckpointId.of(ck).foreach(id =>
      spark.sparkContext.getPersistentRDDs.get(id)
        .foreach(_.unpersist(blocking = false)))
  }

  test("3-column optimizeZorder re-clusters and keeps every row") {
    val t = freshTable("zorder_3col")
    val d0 = (0L until 64L).map(i => (i, i % 8, (i * 37) % 16))
      .toDF("a", "b", "c")
    val v1 = TxnLog.commit(t, 0L, (0 until TxnLog.NumBuckets).map(k =>
      k -> d0.filter(pmod(xxhash64(col("a")), lit(4)) === k)).toMap)
    val (_, before) = TxnLog.prunedBuckets(t, "a", None, Some("15"), v1)
    val v2 = TxnLog.optimizeZorder(spark, t, Seq("a", "b", "c"), v1)
    val (_, after) = TxnLog.prunedBuckets(t, "a", None, Some("15"), v2)
    assert(after.size > before.size,
      s"3-col ZORDER must sharpen range pruning: before=$before after=$after")
    assert(TxnLog.snapshot(spark, t, v2).select("a").as[Long]
      .collect().toSet === (0L until 64L).toSet)
  }

  // ---- restore no-op short-circuit (ADVICE r11) --------------------------

  test("restore short-circuits when the state already equals the target") {
    val t = freshTable("restore_noop")
    val v1 = loadAll(t)
    val v2 = TxnLog.commit(t, v1, Map(1 ->
      tinyDocs.filter(col("doc_id") % TxnLog.NumBuckets === 1)
        .withColumn("n_chars", col("n_chars") + 1000)))
    val v3 = TxnLog.restore(t, v1)
    assert(v3 === v2 + 1, "the first restore commits a new version")
    // a repeated restore of the same target finds the state equal and
    // commits NOTHING — the log stops growing across retries/passes
    assert(TxnLog.restore(t, v1) === v3)
    assert(TxnLog.latestVersion(t) === v3)
    // restoring to the current latest is equally a no-op
    assert(TxnLog.restore(t, v3) === v3)
    assert(TxnLog.latestVersion(t) === v3)
  }
}
