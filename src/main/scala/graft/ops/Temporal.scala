package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join/window operators — beyond-reference track (builder
  * brief; SURVEY.md §2.10 lists non-equi/range/as-of joins as absent
  * from the reference). Four shapes every large-scale event pipeline
  * needs, each expressed so Catalyst never falls back to a
  * nested-loop/cartesian plan:
  *
  *  - [[asofJoin]]: generic two-table as-of join (most recent right
  *    row at-or-before each left row per key) via the union-tag +
  *    window carry-forward trick — ONE shuffle on the key, never a
  *    range-join explosion. The x19 carry-forward is the one-table
  *    special case; this is the real two-relation operator (DuckDB
  *    oracles it with its native ASOF LEFT JOIN — an independent
  *    implementation, which makes the cross-check meaningful).
  *  - [[intervalJoin]]: point-in-interval join via TIME-BUCKET
  *    equi-join: intervals replicate to the fixed-width buckets they
  *    overlap, points hash to exactly one bucket, the exact range
  *    predicate filters after the equi-join. A plain `t BETWEEN ws
  *    AND we` join is a BroadcastNestedLoopJoin at scale; the bucket
  *    key makes it a hash join whose fan-out is bounded by
  *    interval_width/bucket + 1.
  *  - [[scd2]]: slowly-changing-dimension (type 2) build from an
  *    event stream: change-point compression (lag) then interval
  *    close (lead) — the standard CDC→dimension pattern.
  *  - [[rollingValue]]: trailing time-RANGE window aggregates (sum /
  *    count over the last hour BY EVENT TIME, not row count) — RANGE
  *    frames are peer-inclusive in both engines per the SQL standard.
  *
  * Scale: every operator here is one hash shuffle on its natural key
  * (user_id / bucket) + per-partition window passes; per-user
  * partitions are bounded by construction. No operator sorts
  * globally, broadcasts an SF-scaling side, or cross-joins.
  */
object Temporal {

  /** Time-bucket width for [[intervalJoin]] (1 hour in ms). */
  val BucketMs: Long = 3600000L
  /** Busy-window geometry for x46: a busy hour h spawns the window
    * [h − 30 min, h + 90 min). */
  val WindowPreMs: Long = 1800000L
  val WindowPostMs: Long = 5400000L
  /** Trailing range-frame width for [[rollingValue]] (1 hour). */
  val RollingRangeMs: Long = 3600000L

  /** Generic as-of join: for each left row, attach the most recent
    * right row with the same `key` and right.`ts` ≤ left.`ts`
    * (epoch-ms LONG columns). Right payload columns come back
    * null-filled when no right row precedes the left row.
    *
    * Right rows are first reduced to one per (key, ts) — the max
    * payload struct — so ties are deterministic in both engines.
    * Plan: union the tagged sides, ONE shuffle on `key`, one
    * ascending window pass carrying the latest right struct forward
    * (right sorts before left at equal ts ⇒ inclusive as-of), then
    * keep left rows. O(|L|+|R|) rows through the shuffle; both sides
    * stream — nothing is broadcast or replicated. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               payload: Seq[String]): DataFrame = {
    val rightOne = right
      .groupBy(col(key), col(ts))
      .agg(max(struct(payload.map(col): _*)).as("__r"))
    val lCols = left.columns
    val tagged = left
      .withColumn("__side", lit(1)).withColumn("__r",
        lit(null).cast(rightOne.schema("__r").dataType))
      .select(col(key) +: col(ts) +: col("__side") +: col("__r") +:
        lCols.filterNot(c => c == key || c == ts).map(col): _*)
      .unionByName(
        rightOne.withColumn("__side", lit(0)), allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("__last", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(lCols.map(col) ++ payload.map(p => col(s"__last.$p").as(p)): _*)
  }

  /** x45: attribute each purchase to the same user's most recent
    * signup at-or-before it — [[asofJoin]] on the events fixture.
    * (The inner-join interval variant is x34's stream-stream join;
    * this is the left-outer as-of everyone actually runs in batch.) */
  def purchaseAsofSignup(events: DataFrame): DataFrame = {
    val buys = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("buy_id"), col("user_id"),
        unix_millis(col("ts")).as("ms"),
        Events.valueCents(col("value")).as("value_cents"))
    val signups = events.filter(col("event_type") === "signup")
      .select(col("user_id"), unix_millis(col("ts")).as("ms"),
        col("event_id").as("signup_id"))
    asofJoin(buys, signups, "user_id", "ms", Seq("signup_id"))
      .select(col("buy_id"), col("user_id"), col("ms").as("buy_ms"),
        col("value_cents"), col("signup_id"))
  }

  /** x240 match-staleness bound: 7 days in ms. */
  val AsofTolMs: Long = 7L * 24 * 3600 * 1000

  /** x240: AS-OF JOIN WITH TOLERANCE (pandas `merge_asof(tolerance=)`
    * / kdb `wj` semantics): the x45 attribution, but a most-recent
    * signup OLDER than [[AsofTolMs]] is rejected — in feature
    * engineering a stale context row is worse than none, and the
    * tolerance is what turns "most recent ever" into "most recent
    * that still describes the user". Same [[asofJoin]] engine (the
    * union-sort-carry pass), the bound applied as one projection on
    * the carried partner timestamp; `matched` rides in the hash so
    * the oracle pins accept AND reject paths. */
  def purchaseAsofTolerance(events: DataFrame): DataFrame = {
    val buys = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("buy_id"), col("user_id"),
        unix_millis(col("ts")).as("ms"))
    val signups = events.filter(col("event_type") === "signup")
      .select(col("user_id"), unix_millis(col("ts")).as("ms"),
        col("event_id").as("signup_id"))
      .withColumn("signup_ms", col("ms"))
    val fresh = col("ms") - col("signup_ms") <= AsofTolMs
    asofJoin(buys, signups, "user_id", "ms", Seq("signup_id", "signup_ms"))
      .select(col("buy_id"), col("user_id"), col("ms").as("buy_ms"),
        when(fresh, col("signup_id")).as("signup_id"),
        when(fresh, col("ms") - col("signup_ms")).as("lag_ms"),
        coalesce(fresh, lit(false)).as("matched"))
  }

  /** Point-in-interval join: `points` (one epoch-ms column `ptMs`) ×
    * `intervals` (`wsCol` inclusive, `weCol` exclusive) via the
    * [[BucketMs]] equi-join described in the class doc. Caller
    * guarantees interval width ≤ a few buckets (here: 2 h windows,
    * 1 h buckets ⇒ ≤ 3 replicas per interval). */
  def intervalJoin(points: DataFrame, intervals: DataFrame,
                   ptMs: String, wsCol: String, weCol: String,
                   bucketMs: Long = BucketMs): DataFrame = {
    val ivB = intervals.withColumn("__bucket",
      explode(sequence(floor(col(wsCol) / bucketMs).cast("long"),
        floor((col(weCol) - 1) / bucketMs).cast("long"))))
    points.withColumn("__bucket", floor(col(ptMs) / bucketMs).cast("long"))
      .join(ivB, "__bucket")
      .filter(col(ptMs) >= col(wsCol) && col(ptMs) < col(weCol))
      .drop("__bucket")
  }

  /** x46: error events inside "busy windows" — a 2-hour window
    * [h−30 min, h+90 min) around every hour whose event count is at
    * least the per-hour mean (integer cross-multiplication, exact in
    * both engines). Windows OVERLAP, so this is a genuine
    * interval join, not an equi-join on the hour. */
  def errorsInBusyWindows(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("c"))
    val tot = hourly.agg(count(lit(1)).as("n_hours"), sum(col("c")).as("total"))
    val busy = hourly.crossJoin(broadcast(tot)) // 2-column 1-row frame
      .filter(col("c") * col("n_hours") >= col("total"))
      .select(col("h").cast("string").as("window_hour"),
        (unix_millis(col("h")) - WindowPreMs).as("ws"),
        (unix_millis(col("h")) + WindowPostMs).as("we"))
    val errs = events.filter(col("event_type") === "error")
      .select(col("event_id"), unix_millis(col("ts")).as("ms"))
    intervalJoin(errs, busy, "ms", "ws", "we")
      .select(col("event_id"), col("window_hour"), col("ms"))
  }

  /** x47: SCD-2 dimension build — per user, the history of their
    * event_type "state" as [valid_from, valid_to) versions:
    * change-point rows (state ≠ previous state) become versions whose
    * validity closes at the next change (null = current). One shuffle
    * on user_id, two window passes; consecutive duplicate states are
    * compressed away exactly as a CDC merge would. */
  def scd2(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ms"), col("event_id"))
    val chg = events
      .select(col("user_id"), col("event_type").as("state"),
        unix_millis(col("ts")).as("ms"), col("event_id"))
      .withColumn("prev", lag(col("state"), 1).over(byUser))
      .filter(col("prev").isNull || col("state") =!= col("prev"))
    val byVersion = Window.partitionBy(col("user_id"))
      .orderBy(col("ms"), col("event_id"))
    chg.select(col("user_id"), col("state"), col("ms").as("valid_from_ms"),
        lead(col("ms"), 1).over(byVersion).as("valid_to_ms"),
        row_number().over(byVersion).cast("long").as("version"))
  }

  /** x48: trailing time-RANGE aggregates — for every event, the
    * user's event count and exact cent sum over the PRECEDING HOUR of
    * event time (range frame, peer-inclusive at equal ms in both
    * engines). The canonical "rolling spend" feature; a ROWS frame
    * (x44) counts rows, this one measures time. */
  def rollingValue(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ms"))
      .rangeBetween(-RollingRangeMs, 0)
    events
      .select(col("event_id"), col("user_id"),
        unix_millis(col("ts")).as("ms"),
        Events.valueCents(col("value")).as("value_cents"))
      .withColumn("n_1h", count(lit(1)).over(w))
      .withColumn("cents_1h", sum(col("value_cents")).over(w))
  }

  /** Deterministic base/delta partition for [[mergeUpsert]]: 4 of
    * every 5 events (by event-id residue — SF-independent) form the
    * base snapshot, the rest arrive as the change batch. */
  val MergeSplitMod = 5L

  /** x83: MERGE/upsert — apply a change batch onto a keyed snapshot
    * (the lakehouse `MERGE INTO ... WHEN MATCHED UPDATE / WHEN NOT
    * MATCHED INSERT` shape, expressed engine-side). Both sides reduce
    * to one current row per user (last state by event time, event-id
    * tie-break), then a single FULL OUTER join on the key merges
    * them: delta wins where both exist (`update`), delta-only rows
    * `insert`, base-only rows `keep`.
    *
    * Scale: per-side reduction is a window rank (one shuffle each on
    * user_id); the merge is ONE full-outer hash join on the same key
    * — Catalyst reuses the clustering, nothing is broadcast (both
    * sides scale with SF). No `.collect()`, no driver loop: the
    * change batch can be another 100 TB table. */
  def mergeUpsert(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ms").desc, col("event_id").desc)
    def currentState(df: DataFrame): DataFrame = df
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_millis(col("ts")).as("ms"),
        Events.valueCents(col("value")).as("value_cents"))
      .withColumn("rn", row_number().over(byUser))
      .filter(col("rn") === 1).drop("rn")
    val base  = currentState(events.filter(pmod(col("event_id"), lit(MergeSplitMod)) =!= 0))
    val delta = currentState(events.filter(pmod(col("event_id"), lit(MergeSplitMod)) === 0))
      .select(col("user_id").as("d_user_id"), col("event_id").as("d_event_id"),
        col("event_type").as("d_event_type"), col("ms").as("d_ms"),
        col("value_cents").as("d_value_cents"))
    base.join(delta, col("user_id") === col("d_user_id"), "full_outer")
      .select(
        coalesce(col("user_id"), col("d_user_id")).as("user_id"),
        when(col("user_id").isNull, "insert")
          .when(col("d_user_id").isNull, "keep")
          .otherwise("update").as("op"),
        coalesce(col("d_event_id"), col("event_id")).as("event_id"),
        coalesce(col("d_event_type"), col("event_type")).as("event_type"),
        coalesce(col("d_ms"), col("ms")).as("ms"),
        coalesce(col("d_value_cents"), col("value_cents")).as("value_cents"))
  }
}
