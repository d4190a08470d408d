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

  test("partial stage bounds rows crossing the exchange to keys*k per task") {
    // 300 rows, 5 keys, k=4, input coalesced to 3 partitions → at most
    // 3·5·4 = 60 rows can reach the exchange (vs 300 unpruned)
    val df = TopKPerKey.topKPerKey(sample.repartition(3),
      Seq(col("key")), Seq(col("score").desc, col("id").asc), 4)
    assert(df.count() === 20)
  }
}
