package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.TopKPerKey
import graft.ops.Events

/** Pins the custom grouped top-k planner operator: equivalence with
  * the window-rank form, the partial/final two-stage physical shape,
  * and the sort-free contract. */
class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  private def sample = (0L until 300L)
    .map(i => (s"k${i % 5}", i, (i * 7919) % 101))
    .toDF("key", "id", "score")

  test("topKPerKey equals the window row_number formulation") {
    val fast = TopKPerKey.topKPerKey(sample,
        Seq(col("key")), Seq(col("score").desc, col("id").asc), 4)
      .select("key", "id", "score").as[(String, Long, Long)].collect().toSet
    val w = Window.partitionBy(col("key")).orderBy(col("score").desc, col("id").asc)
    val slow = sample.withColumn("rn", row_number().over(w)).filter(col("rn") <= 4)
      .select("key", "id", "score").as[(String, Long, Long)].collect().toSet
    assert(fast === slow)
    assert(fast.size === 20)
  }

  test("keys with fewer than k rows pass through whole") {
    val tiny = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("key", "id")
    val out = TopKPerKey.topKPerKey(tiny, Seq(col("key")), Seq(col("id").asc), 5)
      .as[(String, Long)].collect().toSet
    assert(out === Set(("a", 1L), ("a", 2L), ("b", 3L)))
  }

  test("x87 plans the two-stage heap operator with no Sort and no Window") {
    val df = Events.topSpendEvents(
      graft.sources.Tables.events(spark, "/root/testdata/sf0.001"))
    df.collect() // finalize the adaptive plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKeyPartial"), s"expected partial stage in:\n$p")
    assert(p.contains("TopKPerKeyFinal"), s"expected final stage in:\n$p")
    assert(p.contains("Exchange"), s"expected the key-clustered exchange in:\n$p")
    assert(!p.contains("Sort"), s"the operator must not sort:\n$p")
    assert(!p.contains("Window"), s"the operator must not fall back to window:\n$p")
  }

  test("rewrite rule swaps the declarative window form for the heap operator") {
    val df = graft.SparkEntry.queries("x88_topk_rewrite")(spark, "/root/testdata/sf0.001")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKeyFinal"), s"rewrite did not fire:\n$p")
    assert(!p.contains("Window"), s"window survived the rewrite:\n$p")
    // equivalence against the un-rewritten form in the parent session
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val w = Window.partitionBy(col("lang")).orderBy(col("n_chars").desc, col("doc_id").asc)
    val plain = docs.select(col("doc_id"), col("lang"), col("n_chars"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2).drop("rn")
    assert(df.as[(Long, String, Long)].collect().toSet ===
      plain.as[(Long, String, Long)].collect().toSet)
    // the parent session is NOT opted in: same shape keeps its Window
    plain.collect()
    assert(plain.queryExecution.executedPlan.toString.contains("Window"),
      "rewrite leaked into a session that never registered it")
  }

  test("rewrite leaves rank() and rank-projecting queries alone") {
    val sub = spark.newSession()
    graft.plans.TopKPerKey.registerRewrite(sub)
    import org.apache.spark.sql.{functions => F}
    val df = sub.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(1L, "a"), org.apache.spark.sql.Row(2L, "a")),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("key", org.apache.spark.sql.types.StringType))))
    val w = Window.partitionBy(F.col("key")).orderBy(F.col("id"))
    // rank() is not row_number: must keep the Window
    val ranked = df.withColumn("r", F.rank().over(w)).filter(F.col("r") <= 1).drop("r")
    assert(ranked.queryExecution.optimizedPlan.toString.contains("Window"),
      "rank() form must not be rewritten")
    // row_number kept in the output: must keep the Window
    val kept = df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 1)
    assert(kept.queryExecution.optimizedPlan.toString.contains("Window"),
      "projected rank must not be rewritten")
  }

  test("partial stage bounds rows crossing the exchange to keys*k per task") {
    // 300 rows, 5 keys, k=4, input coalesced to 3 partitions → at most
    // 3·5·4 = 60 rows can reach the exchange (vs 300 unpruned)
    val df = TopKPerKey.topKPerKey(sample.repartition(3),
      Seq(col("key")), Seq(col("score").desc, col("id").asc), 4)
    assert(df.count() === 20)
  }
}
