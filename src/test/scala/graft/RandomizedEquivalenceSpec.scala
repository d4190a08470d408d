package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

import graft.ops.{Dedup, Skew}

/** Randomized cross-implementation equivalence: properties that must
  * hold on ANY corpus, checked on generated ones (fixed seeds — each
  * sample costs Spark jobs, so a few diverse corpora beat hundreds of
  * tiny ones):
  *
  *  - prefix+length-filtered exact similarity join ≡ brute-force
  *    all-pairs (the PPJoin losslessness theorem, as implemented);
  *  - candidates-only LSH ≡ carry-the-sets LSH;
  *  - salted join ≡ plain join under key skew.
  */
class RandomizedEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic corpus: docs drawn from a small vocab so overlaps
    * and near-dups actually occur; sizes vary to exercise the length
    * filter. */
  private def corpus(seed: Long, nDocs: Int): Seq[(Long, String, String)] = {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val gen = for {
      n <- Gen.choose(3, 14)
      toks <- Gen.listOfN(n, Gen.oneOf(vocab))
    } yield toks.mkString(" ")
    val params = Gen.Parameters.default
    (0 until nDocs).map { i =>
      val text = gen.pureApply(params, rng.Seed(seed + i), 100)
      (i.toLong, text, "en")
    }
  }

  test("exact similarity join equals brute force on random corpora") {
    for (seed <- Seq(11L, 42L, 99L)) {
      val docs = corpus(seed, 40).toDF("doc_id", "text", "lang")
      val brute = Dedup.jaccardPairsBrute(docs, 0.4)
        .as[(Long, Long, Double)].collect().toSet
      val exact = Dedup.jaccardPairsExact(docs, 0.4)
        .as[(Long, Long, Double)].collect().toSet
      assert(exact === brute, s"seed $seed")
    }
  }

  test("candidates-only LSH equals carry-the-sets LSH on random corpora") {
    for (seed <- Seq(7L, 123L)) {
      val docs = corpus(seed, 40).toDF("doc_id", "text", "lang")
      val full = Dedup.minhashNearDupPairs(docs, 0.3)
        .as[(Long, Long, Double)].collect().toSet
      val slim = Dedup.minhashNearDupPairsSlim(docs, 0.3)
        .as[(Long, Long, Double)].collect().toSet
      assert(slim === full, s"seed $seed")
    }
  }

  test("salted join equals plain join under heavy key skew") {
    // 90% of facts hit one hot key — the scenario salting exists for
    val facts = (1 to 500).map { i =>
      (i.toLong, if (i % 10 == 0) i.toLong % 7 else 1L)
    }.toDF("row_id", "k")
    val dim = (0L to 6L).map(k => (k, s"dim_$k")).toDF("k", "attr")
    val plain = facts.join(dim, Seq("k")).select("row_id", "k", "attr")
      .as[(Long, Long, String)].collect().toSet
    val salted = Skew.saltedJoin(facts, dim, Seq("k"), col("row_id"))
      .select("row_id", "k", "attr")
      .as[(Long, Long, String)].collect().toSet
    assert(salted === plain)
  }
}
