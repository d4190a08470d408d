package graft.ops

import org.apache.spark.sql.DataFrame

/** Registry for OPERATOR-LOCAL caches (ADVICE r2: per-query persists
  * accumulated for the JVM lifetime across the 57-query bench; the
  * 28 g heap papered over it).
  *
  * Two cache classes exist in this engine:
  *  - pipeline-level shared caches ([[graft.pipelines.SlValidation]]'s
  *    enrichment chain, [[graft.pipelines.SapAnalog]]'s table
  *    generators) — deliberately session-lifetime, reused across many
  *    queries, registered with plain `.persist()`;
  *  - operator-local caches (an LSH band frame, an inverted index, a
  *    k-means vector frame) — needed only until THAT operator's result
  *    is materialized. These register here via [[temp]], and the
  *    harness ([[graft.Bench]]/[[graft.Verify]]) calls [[reapTemps]]
  *    after each query's sink completes.
  *
  * Unpersisting is never a correctness concern (eviction only
  * recomputes); the point is bounding storage-memory growth so a long
  * suite never enters the eviction-recompute regime.
  */
object Caching {
  private val temps = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
  private val tempCkpts =
    new java.util.concurrent.ConcurrentLinkedQueue[(org.apache.spark.SparkContext, Int)]()

  /** Persist `df` and register it for the next [[reapTemps]]. */
  def temp(df: DataFrame): DataFrame = {
    val c = df.persist()
    temps.add(c)
    c
  }

  /** Eagerly localCheckpoint `df` and register the checkpoint RDD for
    * the next [[reapTemps]] — the operator-local analogue of [[temp]]
    * for frames that need LINEAGE TRUNCATION, not just caching (e.g.
    * x207's candidate pool, referenced 3^rounds times by the greedy
    * plan). Dataset.unpersist cannot free checkpoint blocks, so the
    * reap goes through the RDD id ([[org.apache.spark.sql.graftbench
    * .CheckpointId]] — the precise leaf id, never a registry diff).
    * Same contract as [[temp]]: the returned frame is valid until the
    * consuming query's sink completes. */
  def tempCheckpoint(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint()
    org.apache.spark.sql.graftbench.CheckpointId.of(ck)
      .foreach(id => tempCkpts.add((df.sparkSession.sparkContext, id)))
    ck
  }

  /** Unpersist (non-blocking) every registered temp cache and free
    * every registered temp checkpoint's blocks. Call only after the
    * consuming query's result is fully materialized. */
  def reapTemps(): Unit = {
    var d = temps.poll()
    while (d != null) { d.unpersist(blocking = false); d = temps.poll() }
    var c = tempCkpts.poll()
    while (c != null) {
      c._1.getPersistentRDDs.get(c._2).foreach(_.unpersist(blocking = false))
      c = tempCkpts.poll()
    }
  }
}
