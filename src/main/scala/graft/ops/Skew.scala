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

  /** x35: salted fact⋈dim enrichment on the oracle gate — lineitem
    * salted-joined to supplier on the (skewable) supplier key, rolled
    * up per supplier nation. The salt never reaches the result — the
    * oracle is the PLAIN join — which is the salting contract: same
    * answer, hot keys fanned over [[Salts]] tasks. The join must stay
    * shuffled (hints suppressed) or the salt would be pointless. */
  def saltedEnrich(lineitem: DataFrame, supplier: DataFrame): DataFrame = {
    val facts = lineitem.select(col("l_suppkey"), col("l_orderkey"),
      col("l_linenumber"), floor(col("l_quantity")).cast("long").as("qty"))
    val dim = supplier.select(col("s_suppkey").as("l_suppkey"),
      col("s_nationkey").cast("long").as("s_nationkey"))
    saltedJoin(facts, dim, Seq("l_suppkey"),
        discriminator = concat_ws(":", col("l_orderkey"), col("l_linenumber")))
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_items"), sum(col("qty")).as("sum_qty"))
  }
}
