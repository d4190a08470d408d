package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable log-histogram quantile sketch — the SCALE path for
  * percentiles, complementing the exact sort-based `percentile` used
  * by x28 (exact quantiles need the group's values materialized;
  * a histogram is a fixed-width mergeable state whatever the
  * cardinality — the same role t-digest/KLL play, in a deterministic,
  * cross-engine-portable form).
  *
  * Bins are log-spaced with 4 sub-bins per octave (≤ ~12.5% relative
  * width, halved by in-bin interpolation): working on v = value+1,
  * bin boundaries are 1, 2, 3, then (4+sub)·2^(o−2) for octave o ≥ 2.
  * Bin assignment is a GENERATED chain of integer comparisons — no
  * log2()/pow() whose last-ulp behavior could differ between engines
  * (same policy as [[HyperLogLog]]'s rank). The only doubles are the
  * final interpolation, rounded 4dp.
  *
  * Scale: one hash aggregate keyed on (group, bin) with map-side
  * partial counts, then per-group work on ≤ [[Boundaries.length]]
  * rows. Histograms merge by adding counts — streaming/shard-parallel
  * friendly.
  */
object QuantileSketch {

  /** Ascending lower bounds of each bin in the v = value+1 domain,
    * covering v up to 2^40 (cents ≈ 10^12). */
  val Boundaries: Vector[Long] = {
    val b = Vector.newBuilder[Long]
    b += 1L; b += 2L; b += 3L
    for (o <- 2 to 40; sub <- 0 to 3) b += (4L + sub) << (o - 2)
    b.result()
  }

  /** Exclusive upper bound of bin i. */
  def upper(i: Int): Long =
    if (i + 1 < Boundaries.length) Boundaries(i + 1) else Boundaries.last * 2

  /** Bin index of v (≥ 1) — ARITHMETIC, not a comparison chain: the
    * octave o = floor(log2 v) is computed exactly as
    * length(bin(v)) − 1 (minimal binary-digit strings are identical
    * in Spark and DuckDB; no float log2), then with k = o − 2 the
    * index is k·4 + (v >> k) − 1; values < 4 are their own point
    * bins. A 168-branch generated CASE benchmarked ~4 s at sf0.1 —
    * this form is a handful of codegen'd integer ops. */
  def binOf(v: Column): Column = {
    val k = (length(bin(v)) - 3).cast("long")
    when(v < 4, (v - 1).cast("long"))
      .otherwise(k * 4 + call_function("shiftright", v, k) - 1)
  }

  /** Lower bound / width of a bin id (inverse of [[binOf]]): for
    * bin ≥ 3, k = (bin−3) div 4, sub = (bin−3) mod 4,
    * lo = (4+sub) << k, width = 1 << k; point bins below. */
  def loOf(bin: Column): Column = {
    val k = floor((bin - 3) / 4).cast("long")
    when(bin < 3, bin + 1)
      .otherwise(call_function("shiftleft", lit(4L) + pmod(bin - 3, lit(4L)), k))
  }
  def widthOf(bin: Column): Column =
    when(bin < 3, lit(1L))
      .otherwise(call_function("shiftleft", lit(1L), floor((bin - 3) / 4).cast("long")))

  /** Quantiles estimated per group: for each q, the first bin whose
    * cumulative count reaches rank = ceil(q·n), linearly interpolated
    * inside the bin; output pivoted to one row per group. */
  def groupQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                     qs: Seq[(Double, String)] = Seq(0.5 -> "p50", 0.9 -> "p90", 0.99 -> "p99"))
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = df
      .select(col(groupCol), binOf(col(valueCol) + 1).as("bin"))
      .groupBy(col(groupCol), col("bin"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col(groupCol))))
    val session = df.sparkSession
    import session.implicits._
    val picked = cum
      .crossJoin(broadcast(qs.toDF("q", "qname")))
      .withColumn("rank", ceil(col("q") * col("n")).cast("long"))
      .filter(col("cum") >= col("rank"))
      .groupBy(col(groupCol), col("qname"))
      .agg(min(struct(col("bin"), col("cum"), col("cnt"), col("rank"), col("n"))).as("m"))
      .select(col(groupCol), col("qname"), col("m.n").as("n"),
        graft.ops.Portable.round4(
          loOf(col("m.bin")).cast("double") +
            widthOf(col("m.bin")).cast("double") *
              (col("m.rank") - (col("m.cum") - col("m.cnt"))).cast("double") / col("m.cnt") -
            lit(1.0)).as("est"))
    val aggCols = max(col("n")).as("n") +:
      qs.map { case (_, nm) =>
        max(when(col("qname") === nm, col("est"))).as(s"${nm}_est")
      }
    picked.groupBy(col(groupCol)).agg(aggCols.head, aggCols.tail: _*)
  }
}
