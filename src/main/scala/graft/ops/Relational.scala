package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Named relational combinators for the reference's most common idioms.
  *
  * Each wrapper exists because the pandas original has subtle semantics
  * worth pinning in one place (SURVEY.md §2.3-2.6):
  *
  *  - `deriveKey`: the reference's composite string keys
  *    (`Material + "/" + Plant`, `SL_SPK_Cleansing.py:73-77`). Kept as a
  *    real output column so results match the oracle column-for-column;
  *    joins still happen on the single derived key exactly like the
  *    pandas single-key `merge`.
  *  - `semiJoin` / `antiJoin`: `df[df.k.isin(other.k)]` /
  *    `df[~df.k.isin(other.k)]` (`SL_SPK_Cleansing.py:96-110` and 10+
  *    other sites). Expressed as LEFT SEMI / LEFT ANTI joins so Spark
  *    plans a broadcast/hash semi-join instead of collecting the key set
  *    to the driver — the distributed-scale version of `isin`.
  *  - `markDupGroups`: `.duplicated(keys, keep=False)`
  *    (`SL_SPK_Cleansing.py:128`) — flags EVERY member of a >1 group.
  *    One shuffle on the group key via a window count; at 100 TB this is
  *    a single hash-partition pass, no driver materialization.
  */
object Relational {

  /** Composite string key: concat_ws("/", cols…) — E1 in SURVEY.md §2.3. */
  def deriveKey(name: String, cols: Column*): Column =
    concat_ws("/", cols: _*).as(name)

  def withKey(df: DataFrame, name: String, cols: Column*): DataFrame =
    df.withColumn(name, concat_ws("/", cols: _*))

  /** F2: keep rows of `df` whose `keys` appear in `other` (dedup-free,
    * null-safe-false like pandas isin). */
  def semiJoin(df: DataFrame, other: DataFrame, keys: Seq[String]): DataFrame =
    df.join(other.select(keys.map(col): _*), keys, "left_semi")

  /** F3: keep rows of `df` whose `keys` do NOT appear in `other`. */
  def antiJoin(df: DataFrame, other: DataFrame, keys: Seq[String]): DataFrame =
    df.join(other.select(keys.map(col): _*), keys, "left_anti")

  /** U3: boolean column marking every row whose key group has >1 row. */
  def dupGroupFlag(keys: Seq[String]): Column = {
    val w = Window.partitionBy(keys.map(col): _*)
    count(lit(1)).over(w) > 1
  }

  def markDupGroups(df: DataFrame, keys: Seq[String], flag: String = "is_dup"): DataFrame =
    df.withColumn(flag, dupGroupFlag(keys))
}
