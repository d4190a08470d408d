package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-level data profiling — beyond-reference track: the "describe
  * my table" pass every ingestion pipeline runs before trusting a new
  * dataset (row/null/distinct counts, numeric ranges).
  *
  * Scale design: ONE aggregation pass PER COLUMN, unioned — not one
  * wide aggregate with K `count(distinct …)`s, which Catalyst plans as
  * an Expand (K× the input rows through the shuffle: the classic
  * multi-distinct blowup). Per-column passes each prune the parquet
  * scan to a single column (columnar locality), distinct counts stay
  * exact, and the K scans parallelize trivially. For approximate
  * profiling at extreme scale swap `countDistinct` for
  * `approx_count_distinct` (HLL) — kept exact here for the oracle.
  */
object DataProfile {

  /** The numeric lineitem columns profiled by x58. */
  val NumericCols: Seq[String] = Seq(
    "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
    "l_extendedprice", "l_discount")

  /** x58: one row per profiled column: row count, null count, exact
    * distinct count, min/max as DOUBLE (exact for the fixture's
    * integer-valued and double columns). */
  def profileNumeric(df: DataFrame, cols: Seq[String] = NumericCols): DataFrame =
    cols.map { c =>
      df.select(
        lit(c).as("column"),
        count(lit(1)).as("n_rows"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).cast("double").as("min_v"),
        max(col(c)).cast("double").as("max_v"))
    }.reduce(_ unionByName _)
}
