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
  // ---- x116 consistent-hash resharding -----------------------------

  /** Node counts for [[reshardAudit]]: the before/after topologies. */
  val ShardsOld = 8
  val ShardsNew = 9

  /** Highest-random-weight owner of `key` among nodes n0..n{n-1}:
    * argmax over md5("n<i>:" + key) — hex strings compare identically
    * in every engine, and md5 ties are unobservable. The max hash is
    * `greatest(...)` over the n per-node hashes, the owner a when-
    * chain back from it: pure codegen'd projection, no explode. */
  private def hrwOwner(key: Column, n: Int): Column = {
    def h(i: Int): Column = md5(concat(lit(s"n$i:"), key))
    val top = greatest((0 until n).map(h): _*)
    (1 until n).foldLeft(when(h(0) === top, lit("n0"))) { (acc, i) =>
      acc.when(h(i) === top, lit(s"n$i"))
    }
  }

  /** x116: rendezvous-hash resharding audit (Thaler & Ravishankar
    * '98 HRW — the consistent-hashing family behind every sharded
    * store). Growing a hash-mod cluster from N to N+1 remaps ~N/(N+1)
    * of all keys (everything reshuffles); HRW remaps exactly the keys
    * whose new node's hash wins — 1/(N+1) in expectation. At 100 TB
    * that is the difference between rewriting the whole corpus and
    * moving one node's share. The audit emits both assignments per
    * document plus the two movement flags; the aggregate movement
    * rates come out of the oracle-checked rows themselves. Map-only:
    * one projection, no shuffle, no UDF (PlanSpec-gated). */
  def reshardAudit(documents: DataFrame): DataFrame = {
    val key = col("doc_id").cast("string")
    documents.select(
      col("doc_id"),
      hrwOwner(key, ShardsOld).as("hrw_old"),
      hrwOwner(key, ShardsNew).as("hrw_new"),
      pmod(col("doc_id"), lit(ShardsOld.toLong)).as("mod_old"),
      pmod(col("doc_id"), lit(ShardsNew.toLong)).as("mod_new"))
      .withColumn("hrw_moved", (col("hrw_old") =!= col("hrw_new")).cast("long"))
      .withColumn("mod_moved", (col("mod_old") =!= col("mod_new")).cast("long"))
  }

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
