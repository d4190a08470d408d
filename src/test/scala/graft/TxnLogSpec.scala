package graft

import graft.sources.TxnLog

/** Pins the x216 lakehouse commit protocol's non-oracle-expressible
  * invariants: the optimistic-concurrency REBASE and CONFLICT paths
  * and snapshot ISOLATION (the oracle row only checks the final
  * snapshot's contents). */
class TxnLogSpec extends SparkSpec {
  import spark.implicits._

  private def table(name: String): String =
    graft.sources.Bucketing.buildPath(s"graft-txn-spec/$name")

  private def rows(ids: Long*) = ids.map(i => (i, s"t$i")).toDF("doc_id", "text")

  test("base load commits as v1 and snapshot reads it back") {
    val t = table("base"); TxnLog.reset(t)
    val v = TxnLog.commit(t, 0L, Map(0 -> rows(0, 4), 1 -> rows(1)))
    assert(v === 1L)
    assert(TxnLog.latestVersion(t) === 1L)
    assert(TxnLog.snapshot(spark, t).as[(Long, String)].collect().toSet ===
      Set((0L, "t0"), (4L, "t4"), (1L, "t1")))
  }

  test("a disjoint writer based at an older version rebases and commits") {
    val t = table("rebase"); TxnLog.reset(t)
    val v1 = TxnLog.commit(t, 0L, Map(0 -> rows(0), 1 -> rows(1), 2 -> rows(2)))
    val v2 = TxnLog.commit(t, v1, Map(1 -> rows(101)))
    // still based at v1; bucket 2 is disjoint from v2's bucket 1, so
    // validation passes and the bucket map rebases onto v2's
    val v3 = TxnLog.commit(t, v1, Map(2 -> rows(202)))
    assert((v1, v2, v3) === ((1L, 2L, 3L)))
    assert(TxnLog.snapshot(spark, t).as[(Long, String)].collect().toSet ===
      Set((0L, "t0"), (101L, "t101"), (202L, "t202")))
  }

  test("an overlapping writer based at an older version is rejected") {
    val t = table("conflict"); TxnLog.reset(t)
    val v1 = TxnLog.commit(t, 0L, Map(0 -> rows(0), 1 -> rows(1)))
    TxnLog.commit(t, v1, Map(1 -> rows(101)))
    val e = intercept[TxnLog.ConflictException] {
      TxnLog.commit(t, v1, Map(1 -> rows(111)))
    }
    assert(e.getMessage.contains("buckets 1"))
    // the loser's data dirs stay invisible: the snapshot is v2's
    assert(TxnLog.snapshot(spark, t).as[(Long, String)].collect().toSet ===
      Set((0L, "t0"), (101L, "t101")))
  }

  test("a replayed (app, txnVersion) commit is a no-op returning the original version") {
    val t = table("idem"); TxnLog.reset(t)
    val v1 = TxnLog.commitMerged(spark, t, rows(0, 1, 2, 3), "doc_id", "app", 7L)
    val again = TxnLog.commitMerged(spark, t, rows(0, 1, 2, 3), "doc_id", "app", 7L)
    assert((v1, again) === ((1L, 1L)))
    assert(TxnLog.latestVersion(t) === 1L)
    // a DIFFERENT txnVersion from the same app merge-commits normally
    val v2 = TxnLog.commitMerged(spark, t, rows(4), "doc_id", "app", 8L)
    assert(v2 === 2L)
    assert(TxnLog.snapshot(spark, t).as[(Long, String)].collect().toSet ===
      Set((0L, "t0"), (1L, "t1"), (2L, "t2"), (3L, "t3"), (4L, "t4")))
    // the replayed version is discoverable for exactly-once audits
    assert(TxnLog.txnCommitted(t, "app", 7L) === Some(1L))
    assert(TxnLog.txnCommitted(t, "app", 9L) === None)
  }

  test("commitMerged rewrites only the touched buckets (copy-on-write)") {
    val t = table("cow"); TxnLog.reset(t)
    TxnLog.commitMerged(spark, t, rows(0, 1, 2, 3), "doc_id", "app", 1L)
    // bucket 1 only (doc_id 5 % 4 = 1): buckets 0/2/3 carry over by
    // manifest reference; bucket 1 is existing ∪ fresh
    TxnLog.commitMerged(spark, t, rows(5), "doc_id", "app", 2L)
    assert(TxnLog.snapshot(spark, t).as[(Long, String)].collect().toSet ===
      Set((0L, "t0"), (1L, "t1"), (2L, "t2"), (3L, "t3"), (5L, "t5")))
    // old snapshot untouched by the merge
    assert(TxnLog.snapshot(spark, t, 1L).as[(Long, String)]
      .collect().toSet === Set((0L, "t0"), (1L, "t1"), (2L, "t2"), (3L, "t3")))
  }

  test("merge-on-read delete tombstones without rewriting data, compaction folds them") {
    val t = table("mor"); TxnLog.reset(t)
    val v1 = TxnLog.commit(t, 0L,
      (0 until TxnLog.NumBuckets).map(b => b -> rows(b.toLong, b + 4L)).toMap)
    def dataDirs(): Set[String] =
      Option(new java.io.File(s"$t/data").listFiles()).get
        .map(_.getName).filter(_.startsWith("g")).toSet
    val before = dataDirs()
    val v2 = TxnLog.commitDeletes(t, Seq(0L, 5L).toDF("doc_id"), "doc_id", v1)
    // the delete wrote NO data generation — tombstones only
    assert(dataDirs() === before, "delete must not rewrite data files")
    assert(TxnLog.snapshot(spark, t).as[(Long, String)].collect().toSet ===
      Set((1L, "t1"), (2L, "t2"), (3L, "t3"), (4L, "t4"), (6L, "t6"), (7L, "t7")))
    // v1 still sees the deleted rows (snapshot isolation over tombstones)
    assert(TxnLog.snapshot(spark, t, v1).as[(Long, String)]
      .collect().map(_._1).toSet === (0L to 7L).toSet)
    // compaction of bucket 1 (5 % 4 = 1) rewrites it minus tombstones
    // and preserves the visible set exactly
    val v3 = TxnLog.compactBucket(spark, t, 1, v2)
    assert(v3 === 3L)
    assert(TxnLog.snapshot(spark, t).as[(Long, String)].collect().toSet ===
      Set((1L, "t1"), (2L, "t2"), (3L, "t3"), (4L, "t4"), (6L, "t6"), (7L, "t7")))
    // a merged append into a tombstoned bucket folds the tombstones in
    // rather than resurrecting deleted rows (bucket 0: doc 0 deleted)
    TxnLog.commitMerged(spark, t, rows(8), "doc_id", "app", 1L)
    assert(TxnLog.snapshot(spark, t).as[(Long, String)].collect().toSet ===
      Set((1L, "t1"), (2L, "t2"), (3L, "t3"), (4L, "t4"), (6L, "t6"),
        (7L, "t7"), (8L, "t8")))
  }

  test("a delete set too large to broadcast falls back to a shuffled anti join") {
    // VERDICT r8: snapshot() must not FORCE a broadcast of the
    // tombstone union — the delete set is unbounded in principle.
    // Simulate "too large" by disabling auto-broadcast in a child
    // session: the initial plan must pick a non-broadcast anti join,
    // which is only possible when no hint wraps the tombstone side.
    val t = table("bigdelete"); TxnLog.reset(t)
    val v1 = TxnLog.commit(t, 0L,
      (0 until TxnLog.NumBuckets).map(b => b -> rows(b.toLong, b + 4L)).toMap)
    TxnLog.commitDeletes(t, Seq(0L, 5L).toDF("doc_id"), "doc_id", v1)
    val sub = spark.newSession()
    sub.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val df = TxnLog.snapshot(sub, t)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("LeftAnti"), s"expected tombstone anti join in:\n$p")
    assert(!p.contains("BroadcastHashJoin"),
      s"with auto-broadcast off the anti join must not broadcast " +
        s"(a forced hint would override the threshold):\n$p")
    // and the rows are still exactly the visible set
    assert(df.as[(Long, String)].collect().toSet ===
      Set((1L, "t1"), (2L, "t2"), (3L, "t3"), (4L, "t4"), (6L, "t6"), (7L, "t7")))
  }

  test("tombstones subtract per bucket: a key duplicated across buckets only dies in its own") {
    // ADVICE r8: commit() accepts arbitrary bucket→DataFrame maps and
    // never validates key routing, so the same key CAN legitimately
    // exist in two buckets (a mis-routed writer). A delete routes its
    // tombstone to key % NumBuckets; per-bucket subtraction must kill
    // only that bucket's copy — a global tombstone union would
    // silently delete the other bucket's rows too.
    val t = table("perbucket"); TxnLog.reset(t)
    val misrouted = Seq((1L, "misrouted")).toDF("doc_id", "text")
    val routed = Seq((1L, "routed")).toDF("doc_id", "text")
    val v1 = TxnLog.commit(t, 0L, Map(0 -> misrouted, 1 -> routed))
    TxnLog.commitDeletes(t, Seq(1L).toDF("doc_id"), "doc_id", v1)
    assert(TxnLog.snapshot(spark, t).as[(Long, String)].collect().toSet ===
      Set((1L, "misrouted")),
      "the tombstone for key 1 (bucket 1) must not reach bucket 0's copy")
  }

  test("vacuum keeps every retained version readable for a racing reader and expires the rest") {
    val t = table("vacuum"); TxnLog.reset(t)
    val v1 = TxnLog.commit(t, 0L, Map(0 -> rows(0), 1 -> rows(1)))
    val v2 = TxnLog.commit(t, v1, Map(1 -> rows(101)))
    val v3 = TxnLog.commit(t, v2, Map(0 -> rows(100)))
    // the racing reader resolves a RETAINED old version BEFORE vacuum
    val racer = TxnLog.snapshot(spark, t, v2)
    val reclaimed = TxnLog.vacuum(t, retainLast = 2)
    // v1's bucket-1 generation was replaced in v2 and is dead; v1's
    // bucket-0 generation is still referenced by v2 (carried) — only
    // the dead dir may go
    assert(reclaimed.size === 1 && reclaimed.head.contains("bkt=1") &&
      reclaimed.head.contains("/g1-"),
      s"expected exactly v1's replaced bucket-1 generation, got $reclaimed")
    // the retained reader still collects the right rows AFTER vacuum
    assert(racer.as[(Long, String)].collect().toSet ===
      Set((0L, "t0"), (101L, "t101")))
    assert(TxnLog.snapshot(spark, t, v3).as[(Long, String)].collect().toSet ===
      Set((100L, "t100"), (101L, "t101")))
    // the expired version throws the retention error, not a raw IO one
    val e = intercept[IllegalArgumentException] {
      TxnLog.snapshot(spark, t, v1)
    }
    assert(e.getMessage.contains("expired"))
    // a writer whose validation range crosses an expired manifest is
    // told to re-read (conservative: the expired commit's touched set
    // is unknowable) — a base INSIDE the window still validates
    val c = intercept[TxnLog.ConflictException] {
      TxnLog.commit(t, 0L, Map(3 -> rows(3)))
    }
    assert(c.getMessage.contains("retention"))
    val v4 = TxnLog.commit(t, v2, Map(3 -> rows(3))) // in-window base
    assert(v4 === 4L)
  }

  test("vacuum never touches an in-flight writer's uncommitted data dirs") {
    val t = table("inflight"); TxnLog.reset(t)
    val v1 = TxnLog.commit(t, 0L, Map(0 -> rows(0)))
    TxnLog.commit(t, v1, Map(0 -> rows(100)))
    // simulate write-then-commit in flight: data written, no manifest
    val inflight = new java.io.File(s"$t/data/g9-b0-ffff")
    assert(inflight.mkdirs())
    TxnLog.vacuum(t, retainLast = 1)
    assert(inflight.isDirectory,
      "a dir referenced by NO manifest must survive vacuum (it may be " +
        "an uncommitted writer's write-then-commit window)")
  }

  test("txnCommitted resolves markers from the checkpoint after their manifests expire") {
    val t = table("ckpt"); TxnLog.reset(t)
    TxnLog.commitMerged(spark, t, rows(0), "doc_id", "app", 1L)
    TxnLog.commitMerged(spark, t, rows(1), "doc_id", "app", 2L)
    TxnLog.commitMerged(spark, t, rows(2), "doc_id", "app", 3L)
    TxnLog.vacuum(t, retainLast = 1) // expires v1/v2 manifests
    assert(TxnLog.latestCheckpoint(t) === Some(3L))
    // markers from the EXPIRED manifests still resolve (via ckpt)...
    assert(TxnLog.txnCommitted(t, "app", 1L) === Some(1L))
    assert(TxnLog.txnCommitted(t, "app", 2L) === Some(2L))
    assert(TxnLog.txnCommitted(t, "app", 3L) === Some(3L))
    assert(TxnLog.txnCommitted(t, "app", 9L) === None)
    // ...so an exactly-once producer replaying an old batch is still a
    // no-op, and a NEW batch still commits
    assert(TxnLog.commitMerged(spark, t, rows(0), "doc_id", "app", 1L) === 1L)
    val v4 = TxnLog.commitMerged(spark, t, rows(3), "doc_id", "app", 4L)
    assert(v4 === 4L)
    assert(TxnLog.snapshot(spark, t).as[(Long, String)].collect().toSet ===
      Set((0L, "t0"), (1L, "t1"), (2L, "t2"), (3L, "t3")))
  }

  test("snapshot isolation: an old version stays readable after later commits") {
    val t = table("isolation"); TxnLog.reset(t)
    val v1 = TxnLog.commit(t, 0L, Map(0 -> rows(0)))
    TxnLog.commit(t, v1, Map(0 -> rows(100)))
    assert(TxnLog.snapshot(spark, t, v1).as[(Long, String)].collect().toSet ===
      Set((0L, "t0")))
    assert(TxnLog.snapshot(spark, t).as[(Long, String)].collect().toSet ===
      Set((100L, "t100")))
  }

  // ---- zone maps (x241 — the non-oracle-expressible halves) ----------

  test("zone maps: commits record per-bucket min/max, rewrites refresh them") {
    val t = table("zmap"); TxnLog.reset(t)
    val v1 = TxnLog.commit(t, 0L, Map(0 -> rows(0, 4), 1 -> rows(10, 19)))
    val z1 = TxnLog.zoneStats(t, v1)
    def stat(v: Map[Int, Seq[TxnLog.ZoneStat]], b: Int, c: String) =
      v(b).find(_.col == c).get
    assert(stat(z1, 0, "doc_id") ===
      TxnLog.ZoneStat("doc_id", "bigint", Some("0"), Some("4")))
    assert(stat(z1, 1, "doc_id").min === Some("10"))
    assert(stat(z1, 1, "text") ===
      TxnLog.ZoneStat("text", "string", Some("t10"), Some("t19")))
    // rewrite bucket 1: its stats refresh, bucket 0's carry verbatim
    val v2 = TxnLog.commit(t, v1, Map(1 -> rows(11)))
    val z2 = TxnLog.zoneStats(t, v2)
    assert(stat(z2, 1, "doc_id") ===
      TxnLog.ZoneStat("doc_id", "bigint", Some("11"), Some("11")))
    assert(stat(z2, 0, "doc_id") === stat(z1, 0, "doc_id"))
  }

  test("zone maps survive tombstone commits as valid loose bounds") {
    val t = table("zmap-mor"); TxnLog.reset(t)
    val v1 = TxnLog.commit(t, 0L, Map(0 -> rows(0, 4, 8), 1 -> rows(1, 5)))
    val v2 = TxnLog.commitDeletes(t, Seq(8L).toDF("doc_id"), "doc_id", v1)
    // the delete rewrote nothing, so stats carry (8 is a loose max now)
    assert(TxnLog.zoneStats(t, v2)(0).find(_.col == "doc_id").get.max ===
      Some("8"))
    // pruning through tombstones still reads the surviving rows only
    val got = TxnLog.snapshotRange(spark, t, "doc_id", Some("4"), Some("9"))
      .as[(Long, String)].collect().toSet
    assert(got === Set((4L, "t4"), (5L, "t5")))
  }

  test("snapshotRange prunes exactly the provably-dead buckets") {
    val t = table("zmap-prune"); TxnLog.reset(t)
    TxnLog.commit(t, 0L,
      Map(0 -> rows(0, 9), 1 -> rows(10, 19), 2 -> rows(20, 29)))
    val (kept, pruned) =
      TxnLog.prunedBuckets(t, "doc_id", Some("12"), Some("15"))
    assert(kept === Seq(1) && pruned === Seq(0, 2))
    val df = TxnLog.snapshotRange(spark, t, "doc_id", Some("12"), Some("15"))
    assert(df.inputFiles.forall(_.contains("bkt=1")),
      s"only bucket 1 may reach the scan: ${df.inputFiles.mkString(",")}")
    assert(df.count() === 0L) // 12..15 matches no committed row — but
    // only bucket 1 was read to prove it
    val all = TxnLog.snapshotRange(spark, t, "doc_id", Some("9"), Some("10"))
      .as[(Long, String)].collect().toSet
    assert(all === Set((9L, "t9"), (10L, "t10")))
  }

  test("zone maps: an all-null or absent-stats column never over-prunes") {
    val t = table("zmap-null"); TxnLog.reset(t)
    import org.apache.spark.sql.functions.{col, lit}
    val withNull = rows(0, 4).withColumn("score",
      lit(null).cast("bigint"))
    val scored = rows(10).withColumn("score", lit(7L))
    TxnLog.commit(t, 0L, Map(0 -> withNull, 1 -> scored))
    // bucket 0 has NO non-null score: provably dead for any range;
    // bucket 1 matches
    val (kept, pruned) = TxnLog.prunedBuckets(t, "score", Some("1"), None)
    assert(kept === Seq(1) && pruned === Seq(0))
    val got = TxnLog.snapshotRange(spark, t, "score", Some("1"), None)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(got === Set(10L))
    // a column with no recorded stats anywhere keeps every bucket
    val (k2, p2) = TxnLog.prunedBuckets(t, "no_such_col", Some("1"), None)
    assert(p2.isEmpty && k2 === Seq(0, 1))
  }
}
