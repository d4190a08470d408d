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

  /** x84: two-phase salted aggregation — the skew-safe form of
    * `groupBy(hot_key).agg(...)` when ONE key holds a huge share of
    * the rows (the 100 TB "one reducer runs for hours" failure).
    * Phase 1 groups on (key, salt) so each hot key spreads over
    * [[Salts]] reducers and emits ≤ Salts partial rows per key;
    * phase 2 folds the partials on the bare key — a shuffle of
    * |keys|·Salts rows, not |rows|.
    *
    * The distinct-count leg shows the same trick for COUNT(DISTINCT):
    * phase 1 is the dedup on (key, user) — naturally spread because
    * the composite key is high-cardinality — phase 2 counts the
    * deduped rows per key. Results are identical to the direct
    * aggregation (the oracle IS the direct form); only the shuffle
    * geometry changes. Sums are exact BIGINT cents. */
  def twoPhaseAgg(events: DataFrame, salts: Int = Salts): DataFrame = {
    val cents = Events.valueCents(col("value")).as("cents")
    val partial = events
      .select(col("event_type"), cents,
        pmod(xxhash64(col("event_id")), lit(salts.toLong)).as("__salt"))
      .groupBy(col("event_type"), col("__salt"))
      .agg(count(lit(1)).as("pn"), sum(col("cents")).as("pc"))
      .groupBy(col("event_type"))
      .agg(sum(col("pn")).as("n_events"), sum(col("pc")).as("sum_cents"))
    val distinctUsers = events
      .select(col("event_type"), col("user_id")).distinct()
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"))
    partial.join(distinctUsers, Seq("event_type"))
  }
}
