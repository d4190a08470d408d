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

  test("custom heap top-k equals the window form on random keyed data") {
    import org.apache.spark.sql.expressions.Window
    for (seed <- Seq(7L, 23L)) {
      // keys of wildly different sizes incl. below-k groups; scores
      // collide frequently so the id tiebreak matters
      val rows = (0 until 400).map { i =>
        val h = rng.Seed(seed + i).long._1
        (s"k${math.floorMod(h, 11)}", i.toLong, math.floorMod(h >> 8, 13))
      }
      val df = rows.toDF("key", "id", "score").repartition(5)
      for (k <- Seq(1, 3, 7)) {
        val fast = graft.plans.TopKPerKey.topKPerKey(df,
            Seq(col("key")), Seq(col("score").desc, col("id").asc), k)
          .as[(String, Long, Long)].collect().toSet
        val w = Window.partitionBy(col("key")).orderBy(col("score").desc, col("id").asc)
        val slow = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
          .drop("rn").as[(String, Long, Long)].collect().toSet
        assert(fast === slow, s"seed $seed k=$k")
      }
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
