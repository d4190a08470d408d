package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.{DataProfile, Events, Graph}

/** Pins x56-x59: stream-static enrichment equivalence, window-suite
  * semantics, profiling exactness, PageRank integer arithmetic. */
class GraphProfileSpec extends SparkSpec {
  import spark.implicits._

  test("stream-static enrich equals the batch join (AvailableNow)") {
    val d = "/root/testdata/sf0.001"
    val out = graft.streaming.EventStream.enrichedPurchasesAvailableNow(spark, d)
      .as[(Long, Long, Long, Long, String)].collect().toSet
    val batch = graft.streaming.EventStream.enrichedPurchases(
        graft.sources.Tables.events(spark, d),
        graft.sources.Tables.customer(spark, d))
      .as[(Long, Long, Long, Long, String)].collect().toSet
    assert(out === batch)
    assert(out.nonEmpty)
  }

  test("windowSuite: neighbors, quartiles and fractions follow the (ms, id) order") {
    def ts(ms: Long) = new Timestamp(ms)
    val evs = (1L to 8L).map(i => (i, ts(i * 1000L), 7L, s"t$i", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = Events.windowSuite(evs)
      .select("event_id", "prev_type", "next_type", "seq", "quartile", "pct_rank", "cume")
      .as[(Long, Option[String], Option[String], Long, Long, Double, Double)]
      .collect().sortBy(_._1)
    assert(rows.head._2 === None)
    assert(rows.head._3 === Some("t2"))
    assert(rows.last._2 === Some("t7"))
    assert(rows.last._3 === None)
    assert(rows.map(_._4).toSeq === (1L to 8L))
    assert(rows.map(_._5).toSeq === Seq(1L, 1L, 2L, 2L, 3L, 3L, 4L, 4L), "ntile(4) over 8 rows")
    assert(rows.head._6 === 0.0)
    assert(rows.last._6 === 1.0, "percent_rank = (rank-1)/(n-1)")
    assert(rows.head._7 === 0.125, "cume_dist = rank/n")
  }

  test("profileNumeric: exact counts and ranges, one row per column") {
    val df = Seq(
      (1L, Some(2.0)), (2L, Some(4.0)), (2L, None)
    ).toDF("k", "x")
    val out = DataProfile.profileNumeric(df, Seq("k", "x"))
      .as[(String, Long, Long, Long, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(out("k") === (("k", 3L, 0L, 2L, Some(1.0), Some(2.0))))
    assert(out("x") === (("x", 3L, 1L, 2L, Some(2.0), Some(4.0))))
  }

  test("correlations: perfect linear features report ±1; independent near 0") {
    val rows = (1 to 200).map { i =>
      // price = 3·quantity (corr +1); discount alternates independently
      (i.toLong, i.toDouble % 37, (i.toDouble % 37) * 3, (i % 2) * 0.01)
    }.toDF("l_orderkey", "l_quantity", "l_extendedprice", "l_discount")
    val out = DataProfile.correlations(rows)
      .select("col_a", "col_b", "corr").as[(String, String, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(out(("l_quantity", "l_extendedprice")) === 1.0)
    assert(math.abs(out(("l_quantity", "l_discount"))) < 0.2)
    assert(math.abs(out(("l_extendedprice", "l_discount"))) < 0.2)
  }

  test("pagerank: symmetric pair gets equal ranks; hub outranks leaves; mass bounded") {
    // star graph: doc 1 near-dups 2, 3, 4 (identical texts); 8 & 9 pair
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "en"),
      (2L, "alpha beta gamma delta epsilon zeta", "en"),
      (3L, "alpha beta gamma delta epsilon zeta", "en"),
      (4L, "alpha beta gamma delta epsilon zeta", "en"),
      (8L, "totally different content for the pair", "en"),
      (9L, "totally different content for the pair", "en")
    ).toDF("doc_id", "text", "lang")
    val r = Graph.dupGraphPagerank(docs).as[(Long, Long)].collect().toMap
    assert(r(8L) === r(9L), "symmetric pair: identical integer ranks")
    // the 4-clique is symmetric too — all members equal
    assert(Set(1L, 2L, 3L, 4L).map(r).size === 1)
    // every rank ≥ teleport floor and the total mass stays ≈ N·scale
    assert(r.values.forall(_ >= Graph.Teleport))
    assert(r.values.sum <= r.size * Graph.RankScale)
  }

  test("triangleCounts: K3 gives 1 each, K4 gives C(3,2)=3 each, chains give none") {
    // 3 identical docs → K3; 4 identical docs (different text) → K4;
    // 2 identical docs → a lone edge, no triangle
    val mk = (base: String, ids: Seq[Long]) => ids.map(i => (i, base, "en"))
    val docs = (mk("alpha beta gamma delta epsilon zeta eta theta", Seq(1L, 2L, 3L)) ++
      mk("one two three four five six seven eight nine ten", Seq(10L, 11L, 12L, 13L)) ++
      mk("lonely pair of duplicated documents right here now", Seq(20L, 21L)))
      .toDF("doc_id", "text", "lang")
    val out = graft.ops.Graph.triangleCounts(docs)
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L).forall(out(_) === 1L), s"K3 corners: $out")
    assert(Seq(10L, 11L, 12L, 13L).forall(out(_) === 3L), s"K4 corners: $out")
    assert(!out.contains(20L) && !out.contains(21L), "edges alone are no triangle")
  }
}
