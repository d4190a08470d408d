package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global row numbering without a global sort — the two-phase
  * range-partitioned rank from the x60 tokenizer (TextAnalysis
  * .tokenIds), factored out so every consumer of "give each row its
  * position in sorted order" (sorted-neighborhood blocking, RFM
  * tiling) shares the scale-safe shape instead of re-growing an
  * unpartitioned `row_number()` window:
  *
  *  1. range-partition the rows by the sort key and rank WITHIN each
  *     partition in parallel;
  *  2. add the cumulative row count of all earlier ranges — a P-row
  *     (P = partition count) aggregate broadcast back.
  *
  * The only unpartitioned window runs over P rows, never the data.
  * Callers MUST pass a total order (include a unique tiebreaker
  * column): range partitioning may split equal keys across partition
  * boundaries, so ties would otherwise rank non-deterministically.
  */
object Ranking {

  /** Appends `out` = 1-based global row number of each row under
    * `sort` (ascending, as given — wrap columns with `.desc` upstream
    * by negating/inverting values instead; range partitioning only
    * orders by the column values themselves).
    *
    * Phase 1 is a map-side decode of `monotonically_increasing_id()`
    * over the range-partitioned, partition-sorted rows — the id is
    * partitionId·2³³ + row-offset-in-partition-order, so (pid, local
    * rank) fall out with NO window and NO second shuffle (the r5
    * shape ran a `Window.partitionBy(pid)` here, which re-shuffled
    * the full frame on pid; with a total sort order the id decode is
    * deterministic and stage-count-bound queries like x167 paid ~2
    * extra stages per rank pass for nothing). The 2³³ row-offset
    * capacity bounds a single range partition at 8.5B rows — orders
    * of magnitude above any sane partition size. */
  def globalRowNumber(df: DataFrame, sort: Seq[Column], out: String): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    // one materialization feeds both the offsets aggregate and the
    // final join — Caching.temp pins identical partition bounds
    val ranged = Caching.temp(
      df.repartitionByRange(p, sort: _*)
        .sortWithinPartitions(sort: _*)
        .withColumn("__mid", monotonically_increasing_id())
        .withColumn("__pid", shiftright(col("__mid"), 33).cast("int"))
        .withColumn("__lrnk", (col("__mid") % (1L << 33)) + 1)
        .drop("__mid"))
    val offsets = ranged.groupBy(col("__pid")).agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(
        sum(col("__cnt")).over(Window.orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__off"))
    ranged.join(broadcast(offsets), Seq("__pid"))
      .withColumn(out, col("__off") + col("__lrnk"))
      .drop("__pid", "__lrnk", "__off")
  }
}
