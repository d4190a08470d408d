package graft

import org.apache.spark.sql.functions._

import graft.functions.MisraGries
import graft.sources.TxnLog

/** Pins the round-11 additions that aren't oracle-expressible: the
  * column-mapping validation and DROP/re-add algebra (x268 + ADVICE
  * r10), conjunctive pruning algebra (x265), OPTIMIZE's sidecar
  * refresh, ZORDER's layout receipt (x266), the manifest-stats
  * broadcast bound (x269), and the mutable Misra–Gries buffer's
  * offset algebra. */
class Round17OpsSpec extends SparkSpec {
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
  private def loadAll(t: String) = TxnLog.commit(t, 0L,
    (0 until TxnLog.NumBuckets).map(b =>
      b -> tinyDocs.filter(col("doc_id") % TxnLog.NumBuckets === b)).toMap)

  // ---- column-mapping validation (ADVICE r10) ---------------------------

  test("rename of a missing column / onto a live name fails loud") {
    val t = freshTable("ren_valid")
    val v1 = loadAll(t)
    assert(intercept[IllegalArgumentException](
      TxnLog.commitRename(spark, t, v1, "no_such", "x"))
      .getMessage.contains("no column no_such"))
    assert(intercept[IllegalArgumentException](
      TxnLog.commitRename(spark, t, v1, "n_chars", "lang"))
      .getMessage.contains("already exists"))
    // the failed attempts committed nothing
    assert(TxnLog.latestVersion(t) === v1)
  }

  // ---- x268 drop / re-add / time travel ---------------------------------

  test("x268 drop masks the column; re-add reads null for old generations") {
    val t = freshTable("drop_readd")
    val v1 = loadAll(t)
    val v2 = TxnLog.commitDrop(spark, t, v1, "n_chars")
    assert(TxnLog.snapshot(spark, t, v2).columns.toSeq ===
      Seq("doc_id", "lang"))
    // time travel to the pre-drop version keeps ITS schema and values
    val old = TxnLog.snapshot(spark, t, v1)
      .select("doc_id", "n_chars").as[(Long, Long)].collect().toMap
    assert(old(3L) === 40L && old.size === 8)
    // dropping a dropped column fails loud
    assert(intercept[IllegalArgumentException](
      TxnLog.commitDrop(spark, t, v2, "n_chars"))
      .getMessage.contains("no column n_chars"))
    // re-add via a bucket rewrite: fresh physical name, null elsewhere
    val v4 = TxnLog.commit(t, v2, Map(1 ->
      tinyDocs.filter(col("doc_id") % TxnLog.NumBuckets === 1)
        .withColumn("n_chars", col("n_chars") * 10)))
    val got = TxnLog.snapshot(spark, t, v4)
      .select("doc_id", "n_chars").as[(Long, Option[Long])].collect().toMap
    assert(got(1L) === Some(200L) && got(5L) === Some(600L),
      "the rewritten bucket serves the re-added values")
    assert(Seq(0L, 2L, 3L, 4L, 6L, 7L).forall(got(_).isEmpty),
      "old generations read NULL — the dropped data never leaks back")
    // and the re-added logical column renames like any other
    val v5 = TxnLog.commitRename(spark, t, v4, "n_chars", "chars2")
    assert(TxnLog.snapshot(spark, t, v5).columns.contains("chars2"))
  }

  test("x268 a rewrite of visible rows never resurrects a dropped column") {
    val t = freshTable("drop_compact")
    val v1 = loadAll(t)
    val v2 = TxnLog.commitDeletes(t,
      tinyDocs.filter(col("doc_id") % 2 === 0).select("doc_id"), "doc_id", v1)
    val v3 = TxnLog.commitDrop(spark, t, v2, "n_chars")
    // OPTIMIZE rewrites tombstoned buckets from visible rows — the
    // dropped physical column must be stripped, not re-added
    val v4 = TxnLog.optimize(spark, t, v3)
    val snap = TxnLog.snapshot(spark, t, v4)
    assert(snap.columns.toSeq === Seq("doc_id", "lang"))
    assert(snap.select("doc_id").as[Long].collect().toSet ===
      Set(1L, 3L, 5L, 7L))
  }

  test("drop of the live tombstone key column is refused") {
    val t = freshTable("drop_key")
    val v1 = loadAll(t)
    val v2 = TxnLog.commitDeletes(t,
      tinyDocs.filter(col("doc_id") === 0).select("doc_id"), "doc_id", v1)
    assert(intercept[IllegalArgumentException](
      TxnLog.commitDrop(spark, t, v2, "doc_id"))
      .getMessage.contains("deletion vectors"))
  }

  // ---- x265 conjunctive pruning algebra ----------------------------------

  test("x265 conjunction prunes by EITHER stat; no-stat columns never prune") {
    val t = freshTable("conj_unit")
    // range-cluster pairs of ids per bucket: zone maps are sharp on
    // doc_id; no Bloom sidecar exists at all
    TxnLog.commit(t, 0L, (0 until TxnLog.NumBuckets).map(b =>
      b -> tinyDocs.filter(col("doc_id") >= 2 * b &&
        col("doc_id") <= 2 * b + 1)).toMap)
    // range alone keeps buckets 0-1; the point conjunct on doc_id=1
    // narrows to bucket 0 via the ZONE map (no sidecar needed)
    val (k1, p1) = TxnLog.prunedBucketsWhere(spark, t, Seq(
      TxnLog.RangePred("doc_id", None, Some("3")),
      TxnLog.PointsPred("doc_id", Seq("1"))))
    assert(k1 === Seq(0) && p1 === Seq(1, 2, 3))
    // a conjunct satisfiable in every bucket's zone (every bucket has
    // an 'en' in its lang [min,max]) and with no sidecar keeps
    // everything the other conjuncts keep (skipping is never a filter)
    val (k2, _) = TxnLog.prunedBucketsWhere(spark, t, Seq(
      TxnLog.PointsPred("lang", Seq("en")),
      TxnLog.RangePred("doc_id", Some("4"), None)))
    assert(k2 === Seq(2, 3))
    // an impossible conjunction prunes every bucket and still reads —
    // the empty frame keeps the PHYSICAL schema (ADVICE r10)
    val df = TxnLog.snapshotWhere(spark, t, Seq(
      TxnLog.RangePred("doc_id", None, Some("1")),
      TxnLog.RangePred("doc_id", Some("6"), None)))
    assert(df.columns.toSeq === Seq("doc_id", "lang", "n_chars"))
    assert(df.count() === 0L)
  }

  // ---- x270 mapping-aware predicate resolution ----------------------------

  test("x270 predicates resolve logical names; stale physical names fail loud") {
    val t = freshTable("mapped_unit")
    val v1 = loadAll(t)
    TxnLog.commitRename(spark, t, v1, "n_chars", "char_count")
    // the LOGICAL name prunes via the physical zone maps and returns
    // the logical schema
    val df = TxnLog.snapshotWhere(spark, t, Seq(
      TxnLog.RangePred("char_count", Some("50"), None)))
    assert(df.columns.toSeq === Seq("doc_id", "lang", "char_count"))
    assert(df.select("doc_id").as[Long].collect().toSet ===
      Set(4L, 5L, 6L, 7L))
    // the renamed-away PHYSICAL name is not silently served
    assert(intercept[IllegalArgumentException](
      TxnLog.snapshotWhere(spark, t, Seq(
        TxnLog.RangePred("n_chars", Some("50"), None))))
      .getMessage.contains("renamed"))
    // a dropped column's physical data is not silently served either:
    // drop char_count (physical n_chars), then predicate the physical
    // name — the lingering files must never answer
    TxnLog.commitDrop(spark, t, TxnLog.latestVersion(t), "char_count")
    assert(intercept[IllegalArgumentException](
      TxnLog.snapshotWhere(spark, t, Seq(
        TxnLog.RangePred("n_chars", Some("50"), None))))
      .getMessage.contains("dropped"))
  }

  // ---- x263 OPTIMIZE refreshes Bloom sidecars (ADVICE r10) ---------------

  test("optimize rebuilds the rewritten buckets' Bloom sidecars") {
    val t = freshTable("opt_bloom")
    val d0 = tinyDocs
    val v1 = TxnLog.commit(t, 0L, (0 until TxnLog.NumBuckets).map(b =>
      b -> d0.filter(col("doc_id") % TxnLog.NumBuckets === b)).toMap,
      bloomCol = Some("doc_id"))
    val v2 = TxnLog.commitDeletes(t,
      d0.filter(col("doc_id") < 2).select("doc_id"), "doc_id", v1)
    val v3 = TxnLog.optimize(spark, t, v2)
    // post-OPTIMIZE the sidecars still prune point lookups: doc_id=0
    // and 1 are deleted, but their OLD buckets' rebuilt filters no
    // longer contain them only if rebuilt — a carried stale sidecar
    // would still claim membership. Probe an absent-high key instead:
    // every bucket's filter must prove it absent (pruned = all 4).
    val (kept, pruned) = TxnLog.bloomCandidates(spark, t, "doc_id",
      Seq("987654321"), v3)
    assert(kept.isEmpty && pruned.size === TxnLog.NumBuckets,
      s"sidecars must survive OPTIMIZE and keep pruning: kept=$kept")
    // and present keys still resolve
    val got = TxnLog.snapshotPoints(spark, t, "doc_id", Seq("5"), v3)
      .select("doc_id").as[Long].collect()
    assert(got.toSeq === Seq(5L))
  }

  // ---- one-job Bloom probe across MIXED geometries -------------------------

  test("bloom probe handles buckets with different filter geometries") {
    val t = freshTable("geom_mix")
    // bucket 0: 40 keys (1024-bit filter); bucket 1: 200 keys (4096-bit
    // filter) — one probe pass must consult both geometries correctly
    val a = (0L until 40L).map(i => i * 4).toDF("doc_id")
    val b = (0L until 200L).map(i => i * 4 + 1).toDF("doc_id")
    TxnLog.commit(t, 0L, Map(0 -> a, 1 -> b), bloomCol = Some("doc_id"))
    // 0 lives in bucket 0 only; 401 in bucket 1 only; 999999 nowhere
    val (k1, _) = TxnLog.bloomCandidates(spark, t, "doc_id", Seq("0"))
    assert(k1 === Seq(0))
    val (k2, _) = TxnLog.bloomCandidates(spark, t, "doc_id", Seq("401"))
    assert(k2 === Seq(1))
    val (k3, p3) = TxnLog.bloomCandidates(spark, t, "doc_id", Seq("999999"))
    assert(k3.isEmpty && p3 === Seq(0, 1))
    // and a mixed present/absent probe set keeps both homes
    val (k4, _) = TxnLog.bloomCandidates(spark, t, "doc_id",
      Seq("0", "401", "999999"))
    assert(k4 === Seq(0, 1))
  }

  // ---- x266 ZORDER layout receipt ----------------------------------------

  test("x266 optimizeZorder re-clusters ranges and folds tombstones") {
    val t = freshTable("zorder_unit")
    val d0 = (0L until 64L).map(i => (i, i % 8)).toDF("a", "b")
    val v1 = TxnLog.commit(t, 0L, (0 until TxnLog.NumBuckets).map(k =>
      k -> d0.filter(pmod(xxhash64(col("a")), lit(4)) === k)).toMap)
    val (_, before) = TxnLog.prunedBuckets(t, "a", None, Some("15"), v1)
    val v2 = TxnLog.optimizeZorder(spark, t, "a", "b", v1)
    val (_, after) = TxnLog.prunedBuckets(t, "a", None, Some("15"), v2)
    assert(after.size > before.size,
      s"ZORDER must sharpen range pruning: before=$before after=$after")
    // same rows, re-laid out
    assert(TxnLog.snapshot(spark, t, v2).count() === 64L)
    assert(TxnLog.snapshotRange(spark, t, "a", None, Some("15"), v2)
      .select("a").as[Long].collect().toSet === (0L until 16L).toSet)
  }

  // ---- x272 RESTORE ---------------------------------------------------------

  test("x272 restore re-references old generations and survives vacuum") {
    val t = freshTable("restore_unit")
    val v1 = loadAll(t)
    val v2 = TxnLog.commit(t, v1, Map(1 ->
      tinyDocs.filter(col("doc_id") % TxnLog.NumBuckets === 1)
        .withColumn("n_chars", col("n_chars") + 100)))
    val v3 = TxnLog.restore(t, v1)
    assert(v3 === v2 + 1)
    // the restored snapshot IS v1, file-identical
    assert(TxnLog.snapshot(spark, t, v3).inputFiles.toSet ===
      TxnLog.snapshot(spark, t, v1).inputFiles.toSet)
    assert(TxnLog.snapshot(spark, t).select("doc_id", "n_chars")
      .as[(Long, Long)].collect().toMap.apply(1L) === 20L)
    // the restored-over version stays time-travelable
    assert(TxnLog.snapshot(spark, t, v2).select("doc_id", "n_chars")
      .as[(Long, Long)].collect().toMap.apply(1L) === 120L)
    // vacuum keeps the restored generations alive: they're referenced
    // by the (retained) latest even though they were born in v1
    TxnLog.vacuum(t, retainLast = 2)
    assert(TxnLog.snapshot(spark, t).select("doc_id", "n_chars")
      .as[(Long, Long)].collect().toMap.apply(1L) === 20L)
    // restoring tombstones restores them exactly
    val v4p = TxnLog.commitDeletes(t,
      tinyDocs.filter(col("doc_id") === 2).select("doc_id"), "doc_id",
      TxnLog.latestVersion(t))
    val v5 = TxnLog.commit(t, v4p, Map(2 ->
      tinyDocs.filter(col("doc_id") % TxnLog.NumBuckets === 2)))
    val v6 = TxnLog.restore(t, v4p)
    assert(v6 > v5)
    assert(TxnLog.snapshot(spark, t).select("doc_id")
      .as[Long].collect().toSet === Set(0L, 1L, 3L, 4L, 5L, 6L, 7L))
  }

  test("x249 metaAggregate speaks the logical schema after rename/drop") {
    val t = freshTable("meta_mapped")
    val v1 = loadAll(t)
    val v2 = TxnLog.commitRename(spark, t, v1, "n_chars", "char_count")
    val cols2 = TxnLog.metaAggregate(spark, t, v2)
      .select("col_name").as[String].collect().toSet
    assert(cols2 === Set("doc_id", "lang", "char_count"),
      s"renamed stats must surface under the logical name: $cols2")
    val v3 = TxnLog.commitDrop(spark, t, v2, "char_count")
    val cols3 = TxnLog.metaAggregate(spark, t, v3)
      .select("col_name").as[String].collect().toSet
    assert(cols3 === Set("doc_id", "lang"),
      s"dropped stats must never surface: $cols3")
  }

  // ---- x269 manifest-stats bound ------------------------------------------

  test("x269 statsSizeBound is an upper bound and gates the broadcast hint") {
    val t = freshTable("stats_unit")
    val v1 = loadAll(t)
    val bound = TxnLog.statsSizeBound(spark, t, v1)
    assert(bound.isDefined && bound.get > 0L)
    // tombstones only shrink the snapshot — the bound stays safe
    val v2 = TxnLog.commitDeletes(t,
      tinyDocs.filter(col("doc_id") % 2 === 0).select("doc_id"), "doc_id", v1)
    assert(TxnLog.statsSizeBound(spark, t, v2) === bound)
    assert(TxnLog.snapshot(spark, t, v2).count() === 4L)
  }

  // ---- Misra–Gries offset buffer ------------------------------------------

  test("MG offset buffer: eviction keeps the classic decrement semantics") {
    // Capacity distinct fillers, then one more token: the classic step
    // decrements everyone by one and does NOT insert the newcomer
    val fill = (0 until MisraGries.Capacity).map(i => s"t$i")
    val got = MisraGries.foldTokens(Map.empty,
      (fill ++ fill ++ Seq("late")).iterator)
    assert(got.size === MisraGries.Capacity)
    assert(!got.contains("late"))
    assert(got.values.forall(_ === 1L), "2 - 1 decrement applied lazily")
    // a second pass of the newcomer after slots opened re-admits it
    val got2 = MisraGries.foldTokens(got,
      (Seq.fill(3)("late") ++ fill.take(2)).iterator)
    assert(got2("late") >= 1L)
  }
}
