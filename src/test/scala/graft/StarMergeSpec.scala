package graft

import org.apache.spark.sql.functions._

import graft.ops.{Olap, Skew, Temporal, TextAnalysis}

/** Pins the round-3 batch-A operators: star-schema revenue math,
  * unigram entropy, MERGE/upsert op classification, and the two-phase
  * salted aggregation's exact-equivalence contract. */
class StarMergeSpec extends SparkSpec {
  import spark.implicits._

  test("starRevenue joins the full star and sums exact cents per (region, nation)") {
    val lineitem = Seq(
      (1L, 100.0, 0.10), // 90.00 → 9000 cents
      (1L, 50.0, 0.00),  // 5000 cents
      (2L, 10.0, 0.50)   // 500 cents
    ).toDF("l_orderkey", "l_extendedprice", "l_discount")
    val orders = Seq((1L, 7L), (2L, 8L)).toDF("o_orderkey", "o_custkey")
    val customer = Seq((7L, 1), (8L, 2)).toDF("c_custkey", "c_nationkey")
    val nation = Seq((1, "DE", 10), (2, "JP", 20)).toDF("n_nationkey", "n_name", "n_regionkey")
    val region = Seq((10, "EUROPE"), (20, "ASIA")).toDF("r_regionkey", "r_name")
    val out = Olap.starRevenue(lineitem, orders, customer, nation, region)
      .select("r_name", "n_name", "n_items", "n_orders", "revenue_cents")
      .as[(String, String, Long, Long, Long)].collect().toSet
    assert(out === Set(
      ("EUROPE", "DE", 2L, 1L, 14000L),
      ("ASIA", "JP", 1L, 1L, 500L)))
  }

  test("tokenEntropy: counts, TTR and the sorted-fold entropy at 4dp") {
    val docs = Seq((1L, "a a b"), (2L, "x x x x")).toDF("doc_id", "text")
    val out = TextAnalysis.tokenEntropy(docs)
      .select("doc_id", "n_tokens", "n_types", "ttr", "entropy")
      .as[(Long, Long, Long, Double, Double)].collect()
      .map { case (id, a, b, c, d) => id -> ((a, b, c, d)) }.toMap
    // H(1) = ln 3 − (2·ln 2 + 1·ln 1)/3 = 0.6365 at 4dp; TTR = 2/3
    assert(out(1L) === ((3L, 2L, 0.6667, 0.6365)))
    // single repeated type: zero entropy, TTR = 1/4
    assert(out(2L) === ((4L, 1L, 0.25, 0.0)))
  }

  test("mergeUpsert classifies insert/update/keep and the delta wins updates") {
    // users: 1 → base only (keep), 2 → both (update, delta value wins),
    // 3 → delta only (insert). event_id % 5 == 0 routes to the delta.
    val ev = Seq(
      (1L, 1L, "view", 100L, 10.0),
      (2L, 2L, "view", 100L, 20.0),   // base state for user 2
      (6L, 2L, "click", 200L, 21.0),  // later base event — current base state
      (10L, 2L, "purchase", 300L, 25.0), // delta state for user 2
      (15L, 3L, "signup", 400L, 30.0)    // delta-only user
    ).toDF("event_id", "user_id", "event_type", "ms_raw", "value")
      .withColumn("ts", timestamp_millis(col("ms_raw")))
    val out = Temporal.mergeUpsert(ev)
      .select("user_id", "op", "event_type", "value_cents")
      .as[(Long, String, String, Long)].collect().toSet
    assert(out === Set(
      (1L, "keep", "view", 1000L),
      (2L, "update", "purchase", 2500L),
      (3L, "insert", "signup", 3000L)))
  }

  test("normalized: post-normalization dup classes count docs the raw fp misses") {
    val docs = Seq(
      (1L, "Hello, World!"),
      (2L, "hello world"),
      (3L, "HELLO   world"),
      (4L, "something else")
    ).toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.normalized(docs)
      .select("doc_id", "n_raw", "n_norm", "n_same")
      .as[(Long, Long, Long, Long)].collect()
      .map { case (id, a, b, c) => id -> ((a, b, c)) }.toMap
    // "Hello, World!" → "hello world" (13 raw chars → 11 normalized)
    assert(out(1L) === ((13L, 11L, 3L)))
    assert(out(2L) === ((11L, 11L, 3L)))
    assert(out(3L) === ((13L, 11L, 3L)))
    assert(out(4L) === ((14L, 14L, 1L)))
  }

  test("zoneMapAudit prunes date-clustered files, not orderkey probes") {
    import graft.ops.DataProfile
    val day = 86400000L
    val li = Seq(
      // file 0: all before the cutoff → prunable for the ship predicate
      (1L, DataProfile.ShipCutoffMs - 100 * day),
      (2L, DataProfile.ShipCutoffMs - 95 * day),
      // later file: spans the cutoff → not prunable
      (3L, DataProfile.ShipCutoffMs + 10 * day)
    ).toDF("l_orderkey", "ms").select(col("l_orderkey"),
      timestamp_millis(col("ms")).as("l_shipdate"))
    val out = DataProfile.zoneMapAudit(li)
      .select("file_id", "n_rows", "prune_ship", "prune_ok")
      .as[(Long, Long, Long, Long)].collect().toSet
    val frows = out.toSeq.sortBy(_._1)
    assert(frows.map(_._2).sum === 3L)
    assert(frows.head._3 === 1L, "pre-cutoff file must be prunable on ship date")
    assert(frows.last._3 === 0L, "post-cutoff file must not be prunable")
    // l_orderkey 1..3 ≥ min across files but max < 100 → the orderkey
    // probe CAN prune here; flip one key high to show the negative
    val li2 = li.withColumn("l_orderkey", col("l_orderkey") + 1000L)
    val out2 = DataProfile.zoneMapAudit(li2).select("prune_ok").as[Long].collect()
    assert(out2.forall(_ === 0L))
  }

  test("mvRefresh: base+delta merge equals the full recompute, touched marks delta groups") {
    val ev = (0L until 200L).map { i =>
      (i, i % 9, if (i % 2 == 0) "a" else "b", i * 0.11, """{"k": 1}""")
    }.toDF("event_id", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_millis(lit(1700000000000L) + col("event_id") * 600000L))
    val out = graft.ops.Events.mvRefresh(ev)
      .select("event_type", "hour", "n_events", "value_cents", "touched")
      .as[(String, String, Long, Long, Long)].collect().toSet
    val full = graft.ops.Events.parsedEvents(ev)
      .groupBy($"event_type", $"hour")
      .agg(count(lit(1)).as("n"), sum($"value_cents").as("c"),
        max(when(pmod($"event_id", lit(5L)) === 0, 1L).otherwise(0L)).as("t"))
      .as[(String, String, Long, Long, Long)].collect().toSet
    assert(out === full)
    assert(out.exists(_._5 === 1L) && out.nonEmpty)
  }

  test("joinCardEst: containment formula next to the actual join count") {
    val li = Seq(1L, 1L, 2L, 3L).toDF("l_orderkey")
    val ord = Seq(1L, 2L, 4L).toDF("o_orderkey")
    val out = graft.ops.DataProfile.joinCardEst(li, ord)
      .select("n_left", "d_left", "n_right", "d_right", "est_rows", "actual_rows")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq((4L, 3L, 3L, 3L, 4L, 3L)))
  }

  test("twoPhaseAgg equals the direct aggregation exactly") {
    val ev = (0L until 500L).map { i =>
      (i, i % 7, s"t${i % 3}", i * 0.37)
    }.toDF("event_id", "user_id", "event_type", "value")
    val direct = ev
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(floor($"value" * 100 + 0.5).cast("long")).as("sum_cents"),
        countDistinct($"user_id").as("n_users"))
      .as[(String, Long, Long, Long)].collect().toSet
    val salted = Skew.twoPhaseAgg(ev)
      .select("event_type", "n_events", "sum_cents", "n_users")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(salted === direct)
  }
}
