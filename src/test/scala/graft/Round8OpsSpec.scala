package graft

import java.sql.Timestamp

import org.apache.spark.unsafe.types.UTF8String

import graft.functions.JaroWinkler
import graft.ops.{Fuzzy, Olap, Ranking}

/** Pins the x165–x169 batch: sorted-neighborhood blocking, the
  * Jaro–Winkler expression (against DuckDB-probed values), RFM
  * tiling, basket lift arithmetic, and skyline semantics. */
class Round8OpsSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinkler.similarity(UTF8String.fromString(a), UTF8String.fromString(b))

  test("jaroWinkler matches DuckDB jaro_winkler_similarity on probed pairs") {
    // expected values produced by `SELECT jaro_winkler_similarity(a,b)`
    // in DuckDB (the oracle engine) — byte-for-byte pins
    val cases = Seq(
      ("martha", "marhta", 0.9611111111111111),
      ("dixon", "dicksonx", 0.8133333333333332),
      ("jellyfish", "smellyfish", 0.8962962962962964),
      ("abc", "abc", 1.0),
      ("", "abc", 0.0),
      ("", "", 0.0),
      ("a", "b", 0.0),
      ("small ring", "small gizmo", 0.8804545454545455),
      ("red widget", "blue bolt", 0.5444444444444444),
      ("crane", "acre", 0.7833333333333333),
      ("dwayne", "duane", 0.8400000000000001),
      ("aaa", "aaaa", 0.9416666666666667),
      ("ab", "ba", 0.0),
      ("abcdef", "badcfe", 0.8333333333333334),
      // boost threshold: jaro 0.5556 ≤ 0.7 → no prefix bonus
      ("abqqqq", "abzzzz", 0.5555555555555555),
      ("ab", "abcdefgh", 0.8),
      ("aaaaaaaaaaaaaaaaaaaa", "a", 0.6833333333333332),
      // prefix bonus capped at 4
      ("prefix", "prefixxxxxxxxxxxxxxx", 0.86),
      // odd mismatch count → transpositions use INTEGER division
      ("abcxxxxxx", "cabxxxxxx", 0.9629629629629629)
    )
    cases.foreach { case (a, b, want) =>
      assert(math.abs(jw(a, b) - want) < 1e-12, s"jw($a, $b)")
    }
  }

  test("jaroWinkler expression evaluates inside a DataFrame (codegen path)") {
    graft.functions.StringSimilarityFunctions.register(spark)
    val out = Seq(("martha", "marhta")).toDF("a", "b")
      .selectExpr("graft_jaro_winkler(a, b) AS s",
        "graft_jaro_winkler(CAST(NULL AS STRING), b) AS n")
      .collect().head
    assert(math.abs(out.getDouble(0) - 0.9611111111111111) < 1e-12)
    assert(out.isNullAt(1), "null input → null")
  }

  test("globalRowNumber assigns the sorted position with a total tiebreak") {
    val df = Seq(("b", 2L), ("a", 1L), ("c", 3L), ("a", 0L))
      .toDF("k", "id")
    val got = Ranking.globalRowNumber(df, Seq($"k", $"id"), "rnk")
      .orderBy("rnk").as[(String, Long, Long)].collect().toSeq
    assert(got === Seq(("a", 0L, 1L), ("a", 1L, 2L), ("b", 2L, 3L), ("c", 3L, 4L)))
  }

  test("sortedNeighborPairs finds adjacent near-names, windowed and ordered") {
    // sorted: [cold ring, gold ring, golden ring, zz totally different]
    val part = Seq("cold ring", "gold ring", "golden ring", "zz totally different")
      .toDF("p_name")
    val got = Fuzzy.sortedNeighborPairs(part)
      .as[(String, String, Long, Long)].collect().toSet
    // cold↔gold dist 1 gap 1; gold↔golden dist 2 gap 1; cold↔golden dist 3 (out)
    assert(got === Set(
      ("cold ring", "gold ring", 1L, 1L),
      ("gold ring", "golden ring", 1L, 2L)))
  }

  test("jwNameMatch blocks on the noun and thresholds the rounded score") {
    val part = Seq("small ring", "smell ring", "red bolt").toDF("p_name")
    val got = Fuzzy.jwNameMatch(part)
      .as[(String, String, Double)].collect().toSet
    val expected = {
      val s = jw("small ring", "smell ring")
      math.floor(s * 10000 + 0.5) / 10000
    }
    assert(got === Set(("small ring", "smell ring", expected)))
    assert(expected >= Fuzzy.JwThreshold)
  }

  test("rfm tiles by the closed-form quartile formula") {
    val d0 = Timestamp.valueOf("2024-01-01 00:00:00")
    def day(n: Int) = Timestamp.valueOf(f"2024-01-${1 + n}%02d 00:00:00")
    // 4 customers; max order date = day(9)
    val orders = Seq(
      // custkey 1: recent, frequent, big spender
      (1L, 1L, "O", 100.0, day(9), "1-URGENT"),
      (2L, 1L, "O", 100.0, day(8), "1-URGENT"),
      (3L, 1L, "O", 100.0, day(7), "1-URGENT"),
      // custkey 2: mid
      (4L, 2L, "O", 50.0, day(5), "1-URGENT"),
      (5L, 2L, "O", 50.0, day(4), "1-URGENT"),
      // custkey 3: older, one order
      (6L, 3L, "O", 20.0, day(2), "1-URGENT"),
      // custkey 4: oldest, one order, cheapest
      (7L, 4L, "O", 10.0, day(0), "1-URGENT")
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
    val got = Olap.rfm(orders).orderBy("custkey")
      .select("custkey", "rec_days", "freq", "mon_cents", "segment")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    // n=4 → each rank its own quartile: tile = rank
    assert(got === Seq(
      (1L, 0L, 3L, 30000L, "111"),
      (2L, 4L, 2L, 10000L, "222"),
      (3L, 7L, 1L, 2000L, "333"),
      (4L, 9L, 1L, 1000L, "444")))
    val _ = d0 // anchor unused helper value
  }

  test("basketLift counts distinct brand baskets and exact lift") {
    val part = Seq((1L, "B1"), (2L, "B2"), (3L, "B3"))
      .toDF("p_partkey", "p_brand")
    // orders: o1 {B1,B2}, o2 {B1,B2}, o3 {B1}, o4 {B3} — B1B2 in 2/4
    val li = Seq(
      (10L, 1L), (10L, 2L), (10L, 2L), // duplicate brand line collapses
      (11L, 1L), (11L, 2L),
      (12L, 1L),
      (13L, 3L)
    ).toDF("l_orderkey", "l_partkey")
    val got = Olap.basketLift(li, part)
      .as[(String, String, Long, Double, Double)].collect().toSet
    // support = 2/4 = .5; lift = 2*4/(3*2) = 1.3333
    assert(got === Set(("B1", "B2", 2L, 0.5, 1.3333)))
  }

  test("paretoFront keeps exactly the non-dominated parts, ties survive") {
    val part = Seq(
      (1L, 10.0, 5),  // frontier: cheapest
      (2L, 10.0, 5),  // identical twin — neither dominates → survives
      (3L, 10.0, 4),  // dominated by 1 (same price, smaller)
      (4L, 11.0, 5),  // dominated by 1 (same size, pricier)
      (5L, 11.0, 7),  // frontier: pricier but bigger
      (6L, 12.0, 7),  // dominated by 5
      (7L, 12.0, 9)   // frontier
    ).map { case (k, p, s) => (k, s"part$k", "B", "T", s, p) }
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
    val got = Olap.paretoFront(part).select("p_partkey")
      .as[Long].collect().toSet
    assert(got === Set(1L, 2L, 5L, 7L))
  }
}
