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
