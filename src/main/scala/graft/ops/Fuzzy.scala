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
}
