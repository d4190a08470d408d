package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** The x69 feature columns with their fixed-point scales, chosen so
    * every Σx² stays far below 2⁶³ at bench scale (quantity in
    * hundredths ≤ 5e3, price in whole dollars ≤ 1e5, discount in
    * 1e-4 units ≤ 1e3): the moment sums are EXACT BIGINTs that
    * commute across partitions; floats enter only in the final 1-row
    * correlation formula, evaluated in one fixed order. */
  val CorrFeatures: Seq[(String, Long)] = Seq(
    ("l_quantity", 100L), ("l_extendedprice", 1L), ("l_discount", 10000L))

  /** x69: pairwise Pearson CORRELATION matrix over the fixed-point
    * features — the feature-selection pass of a training pipeline.
    * ONE aggregation pass accumulates all Σx, Σx², Σxy moments
    * (map-side combine; shuffle width = the constant number of
    * moments), then the 1-row result expands to one row per pair.
    * corr = (n·Σxy − Σx·Σy) / (√(n·Σx² − Σx²) · √(n·Σy² − Σy²)),
    * every term cast to DOUBLE before arithmetic, rounded 4dp. */
  def correlations(df: DataFrame): DataFrame = {
    val f = CorrFeatures.map { case (c, s) =>
      c -> floor(col(c) * s + 0.5).cast("long")
    }
    val moments = scala.collection.mutable.LinkedHashMap[String, Column]()
    f.foreach { case (c, e) => moments(s"s_$c") = sum(e) }
    f.combinations(2).foreach { case Seq((ca, ea), (cb, eb)) =>
      moments.getOrElseUpdate(s"ss_$ca$ca", sum(ea * ea))
      moments.getOrElseUpdate(s"ss_$cb$cb", sum(eb * eb))
      moments(s"ss_$ca$cb") = sum(ea * eb)
    }
    val agg = df.agg(count(lit(1)).as("n"),
      moments.map { case (nm, c) => c.as(nm) }.toSeq: _*)
    def corr(a: String, b: String) = {
      val n = col("n").cast("double")
      val num = n * col(s"ss_$a$b").cast("double") -
        col(s"s_$a").cast("double") * col(s"s_$b").cast("double")
      val dx = n * col(s"ss_$a$a").cast("double") -
        col(s"s_$a").cast("double") * col(s"s_$a").cast("double")
      val dy = n * col(s"ss_$b$b").cast("double") -
        col(s"s_$b").cast("double") * col(s"s_$b").cast("double")
      Portable.round4(num / (sqrt(dx) * sqrt(dy)))
    }
    agg.select(col("n"), explode(array(
      CorrFeatures.map(_._1).combinations(2).toSeq.map { case Seq(a, b) =>
        struct(lit(a).as("col_a"), lit(b).as("col_b"), corr(a, b).as("corr"))
      }: _*)).as("p"))
      .select(col("p.col_a").as("col_a"), col("p.col_b").as("col_b"),
        col("n"), col("p.corr").as("corr"))
  }
}
