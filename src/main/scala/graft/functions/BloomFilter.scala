package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Bloom filter — approximate set membership, the third
  * sketch family next to [[CountMinSketch]] (counts) and
  * [[HyperLogLog]] (distinct counts). The 100 TB use is the cheap
  * pre-filter in front of any anti-join against a huge key set
  * (seen-fingerprints, decontamination, URL blocklists): the filter is
  * a fixed [[Bits]]-bit array that broadcasts anywhere, probes are
  * map-side, and only bloom-positive rows pay the exact join.
  *
  * Portability: the k probe positions are md5-derived
  * (`conv(hex,16,10)` ≡ `('0x'||hex)::BIGINT`, same as every other
  * operator), so the DuckDB oracle reproduces both the packed words
  * and every probe verdict exactly — false positives included (they
  * are a deterministic function of the key set, not randomness).
  */
object BloomFilter {

  /** Filter size in bits, packed into 32-bit words (a 1<<63 shift
    * overflows DuckDB's signed BIGINT; 32-bit words keep every packed
    * value positive in both engines). */
  val Bits = 4096
  val WordBits = 32
  /** Probe positions per key. */
  val Hashes = 3

  /** The k bit positions of a key: md5("i:key") mod [[Bits]]. */
  def positions(key: Column): Column =
    array((0 until Hashes).map { i =>
      pmod(conv(substring(md5(concat(lit(s"$i:"), key)), 1, 8), 16, 10)
        .cast("long"), lit(Bits.toLong))
    }: _*)

  /** x42: the PACKED filter: one row per occupied [[WordBits]]-bit
    * (32-bit) word, bits = OR of 1<<(pos mod [[WordBits]]) — 32-bit
    * words deliberately, see the class doc (a 1<<63 shift overflows
    * DuckDB's signed BIGINT). Built with one explode + two hash
    * aggregates; merging two filters is bit_or on word_idx. */
  def build(keys: DataFrame, keyCol: String): DataFrame =
    keys
      .select(explode(positions(col(keyCol))).as("pos"))
      .distinct()
      .select((col("pos") / WordBits).cast("long").as("word_idx"),
        pmod(col("pos"), lit(WordBits.toLong)).as("bit"))
      .groupBy(col("word_idx"))
      .agg(bit_or(call_function("shiftleft", lit(1L), col("bit"))).as("bits"))

  /** x43: probe every 'test'-split fingerprint against a filter built
    * from the 'train'-split fingerprints, next to the exact ground
    * truth — bloom_hit ⊇ in_train by construction, and the (few)
    * bloom-positive/not-in-train rows are the documented false
    * positives an exact post-join would clear. */
  def probeSplitFingerprints(documents: DataFrame): DataFrame = {
    val fps = graft.ops.TextAnalysis.splitAssign(documents)
      .select(col("doc_id"), col("split"))
      .join(documents.select(col("doc_id"),
        graft.ops.TextAnalysis.fingerprint(col("text")).as("fp")), Seq("doc_id"))
    val train = fps.filter(col("split") === "train").select(col("fp")).distinct()
    val filterPos = train
      .select(explode(positions(col("fp"))).as("pos")).distinct()
      .withColumn("present", lit(1))
    val probes = fps.filter(col("split") === "test")
      .select(col("doc_id"), col("fp"), explode(positions(col("fp"))).as("pos"))
    probes
      .join(broadcast(filterPos), Seq("pos"), "left")
      .groupBy(col("doc_id"), col("fp"))
      .agg((count(col("present")) === Hashes).as("bloom_hit"))
      .join(train.withColumn("in_train", lit(true)), Seq("fp"), "left")
      .select(col("doc_id"), col("bloom_hit"),
        coalesce(col("in_train"), lit(false)).as("in_train"))
  }
}
