package graft

import org.apache.spark.sql.functions._

import graft.sources.TxnLog

/** Round-13 (optimization round) receipts: the stream-maintained IVF's
  * strict per-epoch audit mode (the bench body now audits on the final
  * drained epoch — the scaladoc's scheduled production posture — so the
  * per-epoch contract is pinned HERE), and the change feed's delete-only
  * fast path (new tombstone files behind an unchanged file set must
  * emit exactly the newly-dead visible rows as `delete`, nothing else). */
class Round20OpsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  /** A private vec-CDC fixture mirroring the x275 protocol: v1 full
    * load, v2 bucket-1 negation + offset inserts, v3 mod-7 deletes. */
  private def buildVecCdc(tag: String): (String, Long) = {
    val table = graft.sources.Bucketing.buildPath(s"graft-txn/r20_$tag")
    TxnLog.reset(table)
    val e0 = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    def slice(b: Int) = e0.filter(col("vec_id") % TxnLog.NumBuckets === b)
    val v1 = TxnLog.commit(table, 0L,
      (0 until TxnLog.NumBuckets).map(b => b -> slice(b)).toMap)
    val neg = slice(1).withColumn("embedding",
      transform(col("embedding"), x => -x))
    val off = 10000000L
    val v2 = TxnLog.commit(table, v1, Map(1 ->
      neg.unionByName(neg.select((col("vec_id") + off).as("vec_id"),
        col("embedding")))))
    val v3 = TxnLog.commitDeletes(table,
      e0.filter(col("vec_id") % 7 === 0).select(col("vec_id")), "vec_id", v2)
    (table, v3)
  }

  test("x275 strict mode: per-epoch rebuild audit passes and the final " +
    "maintained view equals the from-scratch v3 assignment") {
    val (table, v3) = buildVecCdc("sivf_strict")
    val vs = graft.ops.Similarity.vectors(
      graft.sources.Tables.embeddings(spark, dir))
    val cents = graft.ops.Similarity.kmeansCentroids(vs)
    // auditPerEpoch = true runs the signed-count multiset compare on
    // EVERY epoch (including the batch-0 materialization) — a drift at
    // any intermediate epoch throws inside the maintainer
    val maintained = graft.streaming.EventStream.streamMaintainedIvf(
      spark, dir, cents, table, auditPerEpoch = true)
    val rebuilt = graft.ops.Similarity.assignCells(
      graft.ops.Similarity.vectors(TxnLog.snapshot(spark, table, v3)), cents)
    val mism = maintained
      .select(col("vec_id"), col("cell"), lit(1L).as("s"))
      .unionByName(rebuilt.select(col("vec_id"), col("cell"),
        lit(-1L).as("s")))
      .groupBy("vec_id", "cell").agg(sum("s").as("d"))
      .filter(col("d") =!= 0L).count()
    assert(mism === 0L)
  }

  test("changeFeed delete-only fast path: v2->v3 emits exactly the " +
    "newly-dead visible rows as delete") {
    val (table, v3) = buildVecCdc("feed_del")
    val feed = TxnLog.changeFeed(spark, table, v3 - 1, v3, "vec_id")
    // nothing but deletes in a tombstone-only epoch
    assert(feed.filter(col("change_type") =!= "delete").count() === 0L)
    // the deleted set is exactly the v2-visible rows whose key the v3
    // tombstones NAME (mod-7 ORIGINAL ids — an offset insert whose id
    // happens to be ≡0 mod 7 was never tombstoned and must NOT appear)
    val tombNamed = graft.sources.Tables.embeddings(spark, dir)
      .filter(col("vec_id") % 7 === 0).select(col("vec_id"))
    val v2dead = TxnLog.snapshot(spark, table, v3 - 1).select(col("vec_id"))
      .join(tombNamed, Seq("vec_id"), "left_semi")
    val got = feed.select(col("vec_id"))
    assert(got.exceptAll(v2dead).count() === 0L)
    assert(v2dead.exceptAll(got).count() === 0L)
    // and the v3 snapshot no longer contains any tombstone-named key
    assert(TxnLog.snapshot(spark, table, v3).select(col("vec_id"))
      .join(tombNamed, Seq("vec_id"), "left_semi").count() === 0L)
  }
}
