package org.apache.spark.sql.graftbench

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Precise handle on the RDD backing an eager `localCheckpoint()`.
  *
  * The engine's iterative loops must free SUPERSEDED checkpoint
  * generations (Dataset.unpersist cannot — it only removes
  * CacheManager entries). The first-generation protocol diffed
  * `sc.getPersistentRDDs` around the checkpoint call, but that set
  * difference sweeps in ANY cache whose buffer RDD happens to
  * materialize-and-register during the same execution — e.g. the
  * loop's own shared edge cache, or an upstream session memo being
  * materialized for the first time — and unpersisting those poisons
  * them for the rest of the session (storage level reset to NONE,
  * never re-cached; the round-7 review finding). A checkpointed
  * Dataset is a [[LogicalRDD]] leaf, so the exact block-owning RDD id
  * is readable directly; `LogicalRDD` is `private[sql]`-constructed,
  * hence this one-line shim in the `org.apache.spark.sql` namespace
  * (same convention as `org.apache.spark.graftbench.ListenerDrain`).
  */
object CheckpointId {
  /** The id of the checkpoint-backing RDD, if `df` is a checkpointed
    * leaf (None for anything else — callers treat that as "nothing to
    * free", never an error). */
  def of(df: DataFrame): Option[Int] = df.queryExecution.logical match {
    case lr: LogicalRDD => Some(lr.rdd.id)
    case _ => None
  }
}
