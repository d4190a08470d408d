package graft

import org.apache.spark.sql.functions._

import graft.functions.ZOrder2
import graft.ops.{Dedup, Olap}

/** Pins the Z-order clustering key (bit-exact interleave + codegen
  * reachability) and the cluster-representative selection. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Reference interleave: the obvious bit loop. */
  private def slowInterleave(a: Long, b: Long): Long = {
    var z = 0L
    for (i <- 0 until 32) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("ZOrder2.interleave matches the reference bit loop incl. edges") {
    val vals = Seq(0L, 1L, 2L, 3L, 1023L, 0x55555555L, 0xaaaaaaaaL,
      0xffffffffL, 12345678L, (1L << 31) - 1)
    for (a <- vals; b <- vals)
      assert(ZOrder2.interleave(a, b) === slowInterleave(a, b), s"a=$a b=$b")
    // locality sanity: adjacent cells differ in low bits only
    assert(ZOrder2.interleave(2L, 3L) === (ZOrder2.interleave(0L, 0L) | 0xeL))
  }

  test("graft_zorder evaluates through SQL and matches the JVM impl") {
    ZOrder2.register(spark)
    val out = Seq((5L, 9L), (1023L, 0L), (0L, 1023L))
      .toDF("a", "b")
      .selectExpr("graft_zorder(a, b) AS z")
      .as[Long].collect().toSeq
    assert(out === Seq(ZOrder2.interleave(5L, 9L),
      ZOrder2.interleave(1023L, 0L), ZOrder2.interleave(0L, 1023L)))
  }

  test("zorderLayout buckets by the Z prefix (JVM cross-check)") {
    val li = (0L until 200L).map(i => (i % 37, i % 11)).toDF("l_partkey", "l_suppkey")
    val rows = Olap.zorderLayout(li).select("zbucket", "n_items")
      .as[(Long, Long)].collect()
    assert(rows.map(_._2).sum === 200L, "every row lands in exactly one bucket")
    // buckets must agree with the JVM-side computation
    val expect = (0L until 200L)
      .map(i => ZOrder2.interleave(i % 37, i % 11) >> Olap.ZBucketShift)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(rows.map(r => r._1 -> r._2).toMap === expect)
  }

  test("x85 runs graft_zorder inside a codegen stage over the parquet scan") {
    // a local Seq input constant-folds into a LocalTableScan, so the
    // plan assertion must run against a real file scan
    val df = Olap.zorderLayout(
      graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.001"))
    df.collect() // finalize THIS QueryExecution's adaptive plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("graft_zorder"), s"expected graft_zorder in:\n$p")
    assert(p.linesIterator.exists(l => l.contains("*(") && l.contains("graft_zorder")),
      s"expected graft_zorder inside a codegen stage in:\n$p")
  }

  test("clusterReps keeps the longest doc per cluster, doc_id tie-break") {
    // 1≡2≡3 near-identical texts with distinct lengths; 4 unpaired
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, base, "en", 10L),
      (2L, base, "en", 99L),
      (3L, base, "en", 99L),
      (4L, "completely different words entirely unrelated content here now", "en", 50L)
    ).toDF("doc_id", "text", "lang", "n_chars")
    val out = Dedup.clusterReps(docs)
      .select("cluster_id", "rep_doc", "rep_chars", "n_members")
      .as[(Long, Long, Long, Long)].collect().toSet
    // component {1,2,3}: longest are 2 and 3 (99), tie → doc 2
    assert(out === Set((1L, 2L, 99L, 3L)))
  }
}
