package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic HyperLogLog (Flajolet '07) over md5 hashes — the
  * second sketch family next to [[CountMinSketch]] (counts vs distinct
  * counts). At 100 TB "how many distinct tokens / urls / users" is a
  * sketch question: the exact answer shuffles every distinct value,
  * the HLL answer shuffles [[M]] registers.
  *
  * Portability (the point, as with every operator here): the hash is
  * md5 — register = first 2 hex digits (8 bits), rank input = next 13
  * hex digits (52 bits) — and the leading-zero rank is a GENERATED
  * 52-branch integer CASE, identical in Spark and the DuckDB oracle
  * (no engine-specific log2/clz whose float edge cases could differ).
  * The register table is exact and hash-checkable; only [[estimate]]
  * involves floats, and it runs driver-side on 256 rows.
  *
  * Scale: register extraction is map-only; the sketch is a
  * 256-group hash aggregate with partial (map-side) max — constant
  * shuffle width regardless of input cardinality.
  */
object HyperLogLog {

  /** Register-index bits (m = 2^P registers). */
  val P = 8
  val M: Int = 1 << P
  /** Rank bits taken from the hash after the register index. */
  val RankBits = 52

  /** Register index from a 32-hex-digit hash: first 2 digits. */
  def registerOf(h: Column): Column =
    conv(substring(h, 1, 2), 16, 10).cast("long")

  /** 52-bit rank input from a hash: hex digits 3-15. */
  def restOf(h: Column): Column =
    conv(substring(h, 3, 13), 16, 10).cast("long")

  /** Rank ρ = position of the highest set bit from the top of the
    * 52-bit tail (1-based; all-zeros → 53): a fold of integer
    * comparisons against descending powers of two over a MATERIALIZED
    * long column (pass a real column, not an expression tree — each
    * branch embeds its argument). */
  def rankOfRest(rest: Column): Column =
    (1 to RankBits).foldRight(lit((RankBits + 1).toLong): Column) { (r, acc) =>
      when(rest >= lit(1L << (RankBits - r)), lit(r.toLong)).otherwise(acc)
    }

  /** Single-expression convenience (tests). */
  def register(c: Column): Column = registerOf(md5(c))
  def rank(c: Column): Column = rankOfRest(restOf(md5(c)))

  /** x31: the HLL register table of a string column: one row per
    * occupied register with its max rank (md5 computed once per row;
    * reg/rest materialized before the comparison fold). Unobserved
    * registers default to rank 0 inside [[estimate]] — the table
    * itself stays sparse and exact. */
  def registerTable(values: DataFrame, colName: String): DataFrame =
    values
      .select(md5(col(colName)).as("h"))
      .select(registerOf(col("h")).as("reg"), restOf(col("h")).as("rest"))
      .select(col("reg"), rankOfRest(col("rest")).as("rho"))
      .groupBy(col("reg"))
      .agg(max(col("rho")).as("max_rho"))

  /** x65: GROUPED register tables — one [[M]]-register sketch per
    * group (the per-shard/per-language cardinality pattern: "distinct
    * tokens per lang" over 100 TB shuffles groups×[[M]] register rows,
    * never the distinct values themselves). Sketches for different
    * groups merge by max(rho) per register — the aggregate IS the
    * merge, so re-grouping (lang → corpus) is another max, not a
    * recount. */
  def groupedRegisterTable(values: DataFrame, groupCol: String,
                           colName: String): DataFrame =
    values
      .select(col(groupCol), md5(col(colName)).as("h"))
      .select(col(groupCol), registerOf(col("h")).as("reg"), restOf(col("h")).as("rest"))
      .select(col(groupCol), col("reg"), rankOfRest(col("rest")).as("rho"))
      .groupBy(col(groupCol), col("reg"))
      .agg(max(col("rho")).as("max_rho"))

  /** Standard HLL estimate with linear-counting small-range correction
    * (driver-side, 256 registers). */
  def estimate(regs: Seq[(Long, Long)]): Double = {
    val byReg = regs.toMap
    val alpha = 0.7213 / (1 + 1.079 / M) // m >= 128
    val sum = (0 until M).map(r => math.pow(2.0, -byReg.getOrElse(r.toLong, 0L).toDouble)).sum
    val raw = alpha * M * M / sum
    val zeros = M - byReg.size
    if (raw <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros) else raw
  }
}
