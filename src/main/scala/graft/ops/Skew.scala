package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (builder brief: "salting for skew").
  *
  * AQE's skew-join split handles moderate skew at runtime; salting is
  * the explicit-plan alternative when one join key dominates (the
  * classic 100 TB failure mode: one hot key pins a single task). The
  * fact side spreads each key over [[Salts]] sub-keys via a
  * DETERMINISTIC salt (hash of a per-row discriminator column — not
  * `rand()`, which would break retries/replays); the dimension side
  * replicates each row once per salt. Results are identical to the
  * unsalted join; the shuffle fans the hot key across `Salts` tasks.
  */
object Skew {

  val Salts = 8

  /** Equi-join `facts ⋈ dim` on `keys`, salted: `discriminator` is any
    * per-row fact column (ideally near-unique) used to derive the
    * deterministic salt. */
  def saltedJoin(facts: DataFrame, dim: DataFrame, keys: Seq[String],
                 discriminator: Column, joinType: String = "inner",
                 salts: Int = Salts): DataFrame = {
    val salted = facts.withColumn("__salt", pmod(xxhash64(discriminator), lit(salts)))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }
}
