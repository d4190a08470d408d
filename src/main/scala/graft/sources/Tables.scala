package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table scans over the driver's parquet fixtures (TESTDATA.md).
  *
  * Re-expresses the reference's S1 "scan a headered table" capability
  * (`SL_SPK_Cleansing.py:40-55` reads Excel workbooks with inferred
  * headers, then blanket-casts columns). Here the schema is carried by
  * parquet itself — declared at write time by the fixture generator —
  * so the blanket string-coercion pass (P1/P2,
  * `SL_SPK_Cleansing.py:63-70`) collapses into explicit typed scans.
  * Filters/projections on these scans are pushed into the parquet
  * reader by Catalyst (visible as PushedFilters/ReadSchema in
  * `.explain("formatted")`), which is the 100 TB-scale win: a scan
  * only reads the row groups and columns a query touches.
  */
object Tables {
  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Scan + guarantee at least the session's default parallelism in
    * input partitions. The driver fixtures are single-row-group
    * parquet files, which arrive as ONE split regardless of
    * `maxPartitionBytes` — every map-side derivation downstream would
    * run on one core. A real multi-terabyte table arrives pre-split
    * and takes the no-shuffle branch, so this adapter costs nothing
    * at scale. */
  def readParallel(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = read(spark, dir, name)
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  def region(s: SparkSession, d: String): DataFrame    = read(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = read(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = read(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = read(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = readParallel(s, d, "lineitem")
  /** `events.ts` has shipped in TWO fixture generations: parquet
    * TIMESTAMP(NANOS) (which Spark 4 rejects outright — read as long
    * nanos via the legacy conf and rebuild a µs timestamp; floor
    * matches DuckDB's ns→µs truncation) and, in later driver drops,
    * plain TIMESTAMP(MICROS) without UTC adjustment (arrives as
    * TIMESTAMP_NTZ — cast to the session-TZ timestamp; every graft
    * session pins UTC, so the wall-clock instant is unchanged). The
    * branch is decided by the file footer's own type, so either
    * fixture generation reads correctly.
    * NB the nanosAsLong conf is SESSION-WIDE: it also changes how any
    * other TIMESTAMP(NANOS) parquet column in this session reads (none
    * of the fixtures have one besides events). It is set here so the
    * accessor works in a foreign session (e.g. the driver's own), and
    * redundantly in every graft session builder. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = read(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")
}
