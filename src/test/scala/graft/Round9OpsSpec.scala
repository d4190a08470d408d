package graft

import java.sql.Timestamp

import graft.ops.{Events, Graph, QualityFilters, Similarity}

/** Pins the x170–x174 batch: ACF arithmetic, session transition
  * probabilities, k-core peeling, Neyman allocation, and the
  * label-centroid confusion screen. */
class Round9OpsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, user: Long, typ: String, ms: Long) =
    (id, new Timestamp(ms), user, typ, 1.0, "{}")

  private def toEvents(rows: Seq[(Long, Timestamp, Long, String, Double, String)]) =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("acfDailyVolume: linear daily ramp has ACF 1 at every lag") {
    val day = 86400000L
    // one event on day 0, two on day 1, three on day 2, four on day 3
    val rows = for {
      d <- 0 to 3
      i <- 0 to d
    } yield ev(d * 10L + i, 1L, "view", d * day + i)
    val got = Events.acfDailyVolume(toEvents(rows))
      .as[(Long, Long, Option[Double])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // lags 1..3 have >=2 pairs of a perfectly linear series -> r = 1.0
    assert(got(1L) === ((3L, Some(1.0))))
    assert(got(2L) === ((2L, Some(1.0))))
    // lag 3: single pair -> zero variance on both legs -> NULL guard
    assert(got(3L) === ((1L, None)))
    assert(!got.contains(8L))
  }

  test("acfDailyVolume: constant series yields the NULL guard, not NaN") {
    val day = 86400000L
    val rows = (0 to 4).map(d => ev(d.toLong, 1L, "view", d * day))
    val got = Events.acfDailyVolume(toEvents(rows))
      .as[(Long, Long, Option[Double])].collect()
    assert(got.nonEmpty && got.forall(_._3.isEmpty))
  }

  test("typeTransitions: counts follow the (ms, event_id) session order") {
    val rows = Seq(
      ev(1, 1, "view", 1000), ev(2, 1, "cart", 2000), ev(3, 1, "view", 3000),
      // same user, new session (gap > 30 min) — no cross-session edge
      ev(4, 1, "purchase", 3000 + Events.SessionGapMs + 3600000),
      ev(5, 1, "view", 3000 + Events.SessionGapMs + 3600001))
    val got = Events.typeTransitions(toEvents(rows))
      .as[(String, String, Long, Long, Double)].collect().toSet
    // session 1: view>cart>view (the closing view has no successor);
    // session 2: purchase>view — so every cur_type fans out once
    assert(got === Set(
      ("view", "cart", 1L, 1L, 1.0),
      ("cart", "view", 1L, 1L, 1.0),
      ("purchase", "view", 1L, 1L, 1.0)))
  }

  test("kCoreParts: triangle survives the 2-core, chain peels away") {
    // each co-purchase pair needs >= 2 supporting orders
    def basket(o: Long, parts: Long*): Seq[(Long, Long)] = parts.map(p => (o, p))
    val li = (
      // triangle 1-2-3, every edge twice
      basket(1, 1, 2) ++ basket(2, 1, 2) ++ basket(3, 2, 3) ++ basket(4, 2, 3) ++
      basket(5, 1, 3) ++ basket(6, 1, 3) ++
      // chain 10-11-12 (edges 10-11, 11-12 twice each): endpoints have
      // degree 1 -> peel; then 11 alone -> peels too
      basket(7, 10, 11) ++ basket(8, 10, 11) ++ basket(9, 11, 12) ++ basket(10, 11, 12)
    ).toDF("l_orderkey", "l_partkey")
    val got = Graph.kCoreParts(li).as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L), (2L, 2L), (3L, 2L)))
  }

  test("neymanSample: zero-variance stratum earns nothing; the rest capped at stratum size") {
    val docs = (
      (1 to 10).map(i => (i.toLong, s"t$i", "en", "flat", 100L)) ++   // sigma = 0
      (11 to 20).map(i => (i.toLong, s"t$i", "en", "spread", i * 50L)) // sigma > 0
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = QualityFilters.neymanSample(docs)
      .as[(Long, String, Long, Long)].collect()
    assert(got.forall(_._2 == "spread"))
    // allocation 100 capped at the 10 docs the stratum has
    assert(got.map(_._1).toSet === (11L to 20L).toSet)
    assert(got.forall(_._4 == 10L))
    assert(got.map(_._3).sorted.toSeq === (1L to 10L))
  }

  test("labelConfusion: identical members cohere at 1.0 and point at the other label") {
    def vec(xs: Double*) = xs.map(_.toFloat).toArray
    val rows = Seq(
      (1L, vec(1, 0, 0, 0), 0),
      (2L, vec(1, 0, 0, 0), 0),
      (3L, vec(0, 1, 0, 0), 1),
      (4L, vec(0, 1, 0, 0), 1),
      (5L, vec(1, 1, 0, 0), 2))
    val df = rows.toDF("vec_id", "embedding", "label")
    val got = Similarity.labelConfusion(df)
      .as[(Long, Long, Double, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(0L) === ((0L, 2L, 1.0, 2L, 0.7071)))
    assert(got(1L) === ((1L, 2L, 1.0, 2L, 0.7071)))
    // label 2 sits equally close to 0 and 1 -> label-asc tiebreak
    assert(got(2L)._4 === 0L)
    assert(got(2L)._5 === 0.7071)
  }
}
