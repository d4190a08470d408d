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

  test("orc round-trip preserves types; filters push down and columns prune") {
    val out = s"$tmp/docs_orc"
    val src = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    src.write.mode("overwrite").orc(out)
    val back = spark.read.orc(out)
    assert(back.schema === src.schema) // ORC is self-describing, no casts
    assert(back.count() === src.count())
    // the same scan contract the parquet gates pin: predicate reaches
    // the ORC reader, projection prunes the read schema
    val q = back.filter(col("lang") === "en").select(col("doc_id"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]"),
      s"expected lang pushdown in:\n$plan")
    assert(!plan.contains("n_chars"), s"n_chars must be pruned from the scan:\n$plan")
    assert(q.count() > 0)
  }

  test("json-lines round-trip with declared schema; corrupt lines surface, not vanish") {
    import org.apache.spark.sql.types._
    val out = s"$tmp/events_jsonl"
    val src = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("user_id"), col("event_type"), col("props"))
    src.write.mode("overwrite").json(out)
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("props", StringType)))
    // declared schema, no inference pass (two scans of 100 TB otherwise)
    val back = spark.read.schema(schema).json(out)
    assert(back.schema === schema)
    assert(back.count() === src.count())
    assert(back.agg(sum(col("event_id"))).head.getLong(0) ===
      src.agg(sum(col("event_id"))).head.getLong(0))
    // FAILFAST surfaces malformed rows instead of silently nulling them
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "badjson")
    java.nio.file.Files.writeString(dir.resolve("part-0.json"),
      """{"event_id": 1, "user_id": 2, "event_type": "view", "props": "{}"}
        |this is not json
        |""".stripMargin)
    intercept[org.apache.spark.SparkException] {
      spark.read.schema(schema).option("mode", "FAILFAST")
        .json(dir.toString).collect()
    }
  }

  test("x120 schema evolution: merged schema, null backfill, discovered partition") {
    val out = SparkEntry.queries("x120_schema_evol")(spark, "/root/testdata/sf0.001")
    val schema = out.schema
    assert(schema.fieldNames.toSeq === Seq("doc_id", "lang", "n_chars", "gen"))
    val rows = out.collect()
    assert(rows.length === 500)
    // gen-1 rows (even ids) predate the n_chars column: null backfill
    assert(rows.filter(_.getAs[Long]("gen") == 1L).forall(_.isNullAt(2)))
    // gen-2 rows carry real values; the gen column came from partition
    // DISCOVERY (gen=<n> dirs), not from any data file
    assert(rows.filter(_.getAs[Long]("gen") == 2L).forall(r => !r.isNullAt(2)))
    assert(rows.forall(r => (r.getAs[Long]("doc_id") % 2 == 0) == (r.getAs[Long]("gen") == 1L)))
  }
}
