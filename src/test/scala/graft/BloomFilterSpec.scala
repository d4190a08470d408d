package graft

import org.apache.spark.sql.functions._

import graft.functions.BloomFilter

/** Pins the Bloom filter's defining properties: zero false negatives,
  * deterministic verdicts, and exact bit packing. */
class BloomFilterSpec extends SparkSpec {
  import spark.implicits._

  test("packed words contain exactly the md5-derived positions of the keys") {
    val keys = Seq("alpha", "beta", "gamma").toDF("k")
    val words = BloomFilter.build(keys, "k")
      .as[(Long, Long)].collect().toMap
    // recompute positions on the JVM side
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String) = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = (for {
      k <- Seq("alpha", "beta", "gamma"); i <- 0 until BloomFilter.Hashes
    } yield java.lang.Long.parseLong(hex(s"$i:$k").substring(0, 8), 16) % BloomFilter.Bits).toSet
    val unpacked = (for {
      (w, bits) <- words.toSeq; b <- 0 until BloomFilter.WordBits
      if ((bits >> b) & 1L) == 1L
    } yield w * BloomFilter.WordBits + b).toSet
    assert(unpacked === expected)
  }

  test("probe has NO false negatives on the real fixture and is deterministic") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = BloomFilter.probeSplitFingerprints(docs)
      .select("doc_id", "bloom_hit", "in_train")
      .as[(Long, Boolean, Boolean)].collect()
    assert(out.nonEmpty)
    // the Bloom contract: membership implies a hit, always
    out.foreach { case (id, hit, in) => if (in) assert(hit, s"false negative on $id") }
    val again = BloomFilter.probeSplitFingerprints(docs)
      .select("doc_id", "bloom_hit", "in_train")
      .as[(Long, Boolean, Boolean)].collect()
    assert(out.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
  }
}
