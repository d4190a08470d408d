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
