package graft

import org.apache.spark.sql.functions._

import graft.ops.Skew

/** Pins the two explicit-layout scale techniques the engine offers
  * beyond AQE's runtime fixes: deterministic salting for skewed joins
  * and bucketed tables for shuffle-free co-located joins. */
class ScaleTechniquesSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals the plain join and spreads the hot key") {
    // 90% of fact rows share one hot key
    val facts = (1L to 1000L).map(i => (if (i <= 900) "hot" else s"k$i", i))
      .toDF("k", "row_id")
    val dim = Seq(("hot", "H"), ("k901", "A"), ("k999", "B")).toDF("k", "attr")
    val plain = facts.join(dim, Seq("k")).select("k", "row_id", "attr")
      .as[(String, Long, String)].collect().toSet
    val salted = Skew.saltedJoin(facts, dim, Seq("k"), col("row_id"))
      .select("k", "row_id", "attr").as[(String, Long, String)].collect().toSet
    assert(salted === plain)
    assert(plain.count(_._1 == "hot") === 900)
    // the hot key's rows really occupy multiple salt partitions
    val saltSpread = facts.filter($"k" === "hot")
      .select(pmod(xxhash64($"row_id"), lit(Skew.Salts)).as("s"))
      .distinct().count()
    assert(saltSpread > 1)
  }

  test("x116 HRW reshard: movers all land on the new node, minimal movement") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Skew.reshardAudit(docs).collect()
    val n = out.length.toDouble
    // the HRW invariant growing N→N+1: a key moves IFF the new node's
    // hash wins, so every mover's destination is the new node
    val movers = out.filter(_.getAs[Long]("hrw_moved") == 1L)
    assert(movers.nonEmpty && movers.forall(_.getAs[String]("hrw_new") == s"n${Skew.ShardsNew - 1}"))
    // and nobody else changed owner
    assert(out.filter(_.getAs[Long]("hrw_moved") == 0L)
      .forall(r => r.getAs[String]("hrw_old") == r.getAs[String]("hrw_new")))
    // movement rates: HRW ≈ 1/9 of keys; hash-mod ≈ 8/9
    val hrwRate = movers.length / n
    val modRate = out.count(_.getAs[Long]("mod_moved") == 1L) / n
    assert(hrwRate > 0.04 && hrwRate < 0.20, s"HRW movement was $hrwRate")
    assert(modRate > 0.75, s"mod movement was $modRate")
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      val n = 16
      (1L to 1000L).map(i => (i % 50, s"o$i")).toDF("cust", "order_attr")
        .write.mode("overwrite").bucketBy(n, "cust").sortBy("cust")
        .saveAsTable("orders_bucketed")
      (0L until 50L).map(i => (i, s"c$i")).toDF("cust", "cust_attr")
        .write.mode("overwrite").bucketBy(n, "cust").sortBy("cust")
        .saveAsTable("cust_bucketed")
      val joined = spark.table("orders_bucketed")
        .join(spark.table("cust_bucketed"), Seq("cust"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      // both sides pre-partitioned on the join key: no shuffle exchange
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() === 1000L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_bucketed")
      spark.sql("DROP TABLE IF EXISTS cust_bucketed")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
