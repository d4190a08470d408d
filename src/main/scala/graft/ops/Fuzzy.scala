package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy string matching / entity resolution — beyond-reference track.
  * The classic record-linkage shape: an edit-distance join made
  * tractable by BLOCKING — candidates must agree on a cheap blocking
  * key, so the quadratic comparison runs only within blocks, plus a
  * length pre-filter (|len(a) − len(b)| > d implies edit distance > d,
  * so the expensive Levenshtein never runs on hopeless pairs).
  *
  * Scale: the blocking key turns the all-pairs comparison into a hash
  * self-join; block sizes are bounded by the entity vocabulary (here:
  * part-name nouns), never by the table size — dictionary-scale
  * blocks, AQE skew-split for hot blocks. Levenshtein is built-in and
  * codegen'd in Spark and identical to DuckDB's `levenshtein` (plain
  * edit distance), so the oracle reproduces every distance exactly.
  */
object Fuzzy {

  /** Pairs at most this many edits apart are a match. */
  val MaxEditDist = 2

  /** x50: near-identical part names — distinct names blocked on their
    * last token (the noun: "cold ring" vs "old ring" block together),
    * length-filtered, then exact Levenshtein ≤ [[MaxEditDist]].
    * Output: (name_a, name_b, dist), name_a < name_b. */
  def fuzzyNameMatch(part: DataFrame): DataFrame = {
    val names = part.select(col("p_name")).distinct()
      .withColumn("block", element_at(split(col("p_name"), " "), -1))
    names.alias("a").join(names.alias("b"),
        col("a.block") === col("b.block") &&
        col("a.p_name") < col("b.p_name") &&
        abs(length(col("a.p_name")) - length(col("b.p_name"))) <= MaxEditDist)
      .select(col("a.p_name").as("name_a"), col("b.p_name").as("name_b"),
        levenshtein(col("a.p_name"), col("b.p_name")).cast("long").as("dist"))
      .filter(col("dist") <= MaxEditDist)
  }

  /** Sorted-neighborhood window width: each record is compared with
    * the next [[SnWindow]] records in sorted key order. */
  val SnWindow = 3

  /** x165: SORTED-NEIGHBORHOOD blocking (Hernández & Stolfo '95) —
    * the third record-linkage blocking family next to x50's key
    * blocking and the LSH bucketing: sort the distinct names by a
    * DOMAIN SORT KEY (here the reversed string, so the
    * discriminating last token — the noun — sorts first and
    * 'cold ring'/'gold ring' become neighbors), compare each with
    * only its next [[SnWindow]] neighbors. Catches pairs a key block
    * misses, cost is strictly linear: W·|names| candidate pairs,
    * never all-pairs.
    *
    * Scale: the global sort position comes from
    * [[Ranking.globalRowNumber]] (two-phase range-partitioned rank —
    * no unpartitioned window over the name vocabulary), and the
    * neighbor pairing is an EQUI-join on rank (the probe side
    * explodes gap ∈ 1..W), not a range join. Output: (name_a, name_b,
    * gap, dist) with name_a < name_b lexicographically (the gap is
    * the rank distance in sort-key order). */
  def sortedNeighborPairs(part: DataFrame): DataFrame = {
    val names = part.select(col("p_name")).distinct()
      .withColumn("skey", reverse(col("p_name")))
    val ranked = Caching.temp(
      Ranking.globalRowNumber(names, Seq(col("skey")), "rnk"))
    val probes = ranked
      .select(col("p_name").as("nb"), col("rnk"),
        explode(sequence(lit(1), lit(SnWindow))).as("gap"))
      .select(col("nb"), col("gap").cast("long").as("gap"),
        (col("rnk") - col("gap")).as("anchor"))
    ranked.join(probes, col("rnk") === col("anchor"))
      .filter(abs(length(col("p_name")) - length(col("nb"))) <= MaxEditDist)
      .select(least(col("p_name"), col("nb")).as("name_a"),
        greatest(col("p_name"), col("nb")).as("name_b"), col("gap"),
        levenshtein(col("p_name"), col("nb")).cast("long").as("dist"))
      .filter(col("dist") <= MaxEditDist)
  }

  /** Pairs scoring at least this (after 4dp rounding) are a match. */
  val JwThreshold = 0.8

  /** x166: JARO–WINKLER scored name match over the x50 blocking — the
    * prefix-weighted similarity the record-linkage literature uses
    * where edit distance is too coarse (it rewards shared prefixes
    * and normalizes by length, so 'small ring'/'small gizmo' score
    * high while staying 5 edits apart). Spark has no built-in;
    * [[graft.functions.JaroWinklerSimilarity]] is a custom codegen
    * Expression pinned byte-for-byte to DuckDB's
    * `jaro_winkler_similarity` (the oracle). The similarity is
    * rounded to 4dp with the shared floor formula BEFORE thresholding
    * so both engines make the identical keep decision. */
  def jwNameMatch(part: DataFrame): DataFrame = {
    graft.functions.StringSimilarityFunctions.register(part.sparkSession)
    val names = part.select(col("p_name")).distinct()
      .withColumn("block", element_at(split(col("p_name"), " "), -1))
    names.alias("a").join(names.alias("b"),
        col("a.block") === col("b.block") && col("a.p_name") < col("b.p_name"))
      .select(col("a.p_name").as("name_a"), col("b.p_name").as("name_b"),
        (floor(call_function(graft.functions.StringSimilarityFunctions.JwName,
          col("a.p_name"), col("b.p_name")) * 10000 + 0.5) / 10000).as("sim"))
      .filter(col("sim") >= JwThreshold)
  }
}
