package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-log operators over the `events` fixture (event_id, ts,
  * user_id, event_type, value, props JSON) — beyond-reference track:
  * JSON extraction, time-bucketed aggregation, and gap-based
  * sessionization. [[graft.streaming.EventStream]] carries the
  * Structured Streaming twins of these.
  *
  * Determinism/portability notes:
  *  - money stays integral: cents = floor(value·100 + 0.5) as BIGINT,
  *    so sums are exact in any aggregation order (double sums are
  *    order-dependent; integer sums are not);
  *  - timestamps compare as unix_millis (Spark) ≡ epoch_ms (DuckDB) —
  *    both truncate sub-ms identically — and are output as BIGINT ms,
  *    never as formatted timestamps;
  *  - window order ties break on event_id.
  *
  * Scale: hourly agg is one partial/final hash aggregate; sessions are
  * one shuffle on user_id then two window passes over each user's
  * slice — the canonical distributed sessionization plan.
  */
object Events {

  /** Session gap: a pause > 30 min starts a new session. */
  val SessionGapMs: Long = 30 * 60 * 1000L

  def valueCents(value: Column): Column =
    floor(value * 100 + 0.5).cast("long")

  /** x14: parse + project: JSON prop `k`, cents, hour bucket. */
  def parsedEvents(events: DataFrame): DataFrame =
    events.select(
      col("event_id"), col("user_id"), col("event_type"),
      get_json_object(col("props"), "$.k").cast("long").as("k"),
      valueCents(col("value")).as("value_cents"),
      date_trunc("hour", col("ts")).cast("string").as("hour"))

  /** x15: per (hour, event_type) counts, exact cent sums, distinct
    * users. */
  def hourlyAgg(events: DataFrame): DataFrame =
    parsedEvents(events)
      .groupBy(col("hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value_cents")).as("value_cents"),
        countDistinct(col("user_id")).as("n_users"))

  /** x18: ROLLUP over (event_type, hour) — grouping-sets demonstration
    * (absent from the reference, SURVEY.md §2.10). Subtotal rows carry
    * NULL group keys; data keys are never null so the levels are
    * unambiguous. One shuffle; partial aggregation applies per level. */
  def rollupAgg(events: DataFrame): DataFrame =
    parsedEvents(events)
      .rollup(col("event_type"), col("hour"))
      .agg(count(lit(1)).as("n_events"), sum(col("value_cents")).as("value_cents"))

  /** x19: as-of carry-forward — each event is attributed to the
    * user's most recent `signup` event at-or-before it (the as-of-join
    * shape expressed as a window carry-forward: `last(…, ignoreNulls)`
    * over an unbounded-preceding frame). The general two-table as-of
    * join is the same plan: union the tables tagged, sort within the
    * key partition, carry the right side forward. One shuffle on the
    * key, no range-join explosion. */
  def asofCarry(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ms"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_millis(col("ts")).as("ms"))
      .withColumn("last_signup_ms",
        last(when(col("event_type") === "signup", col("ms")), ignoreNulls = true).over(w))
  }

  /** x28: exact interpolated percentiles of the cent value per event
    * type — Spark's `percentile` (rank = p·(n−1), linear interpolation)
    * ≡ DuckDB `quantile_cont`, exact on integral cents, rounded 4dp.
    * Scale: percentile is an exact sort-based aggregate — fine per
    * bounded group (event types are an enum); unbounded-cardinality
    * inputs would use approx_percentile (t-digest) instead. */
  def valueQuantiles(events: DataFrame): DataFrame =
    events
      .select(col("event_type"), valueCents(col("value")).as("cents"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        graft.ops.Portable.round4(percentile(col("cents"), lit(0.5))).as("p50"),
        graft.ops.Portable.round4(percentile(col("cents"), lit(0.9))).as("p90"),
        graft.ops.Portable.round4(percentile(col("cents"), lit(0.99))).as("p99"))

  /** Trailing window (rows) for the anomaly baseline. */
  val AnomalyWindow = 24

  /** x44: event-rate ANOMALY detection — per (event_type, hour), the
    * z-score of the hourly event count against the trailing
    * [[AnomalyWindow]]-hour baseline (the standard ops alarm: "is this
    * hour's traffic off-distribution for this stream?").
    *
    * Portability: counts are integers, so the trailing Σc and Σc² are
    * exact in both engines; mean and σ are derived once per row from
    * those two integer sums in a fixed expression order and rounded
    * 4dp. Rows with fewer than 2 baseline hours or σ = 0 report null.
    * Scale: one hash aggregate (hourly counts) + one bounded ROWS
    * window per event_type shard — the same plan shape as x36. */
  def rateAnomaly(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour"))
      .rowsBetween(-AnomalyWindow, -1)
    val hourly = parsedEvents(events)
      .groupBy(col("event_type"), col("hour"))
      .agg(count(lit(1)).as("c"))
    val stats = hourly
      .withColumn("n_base", count(col("c")).over(w))
      .withColumn("s1", sum(col("c")).over(w))
      .withColumn("s2", sum(col("c") * col("c")).over(w))
    val mean = col("s1").cast("double") / col("n_base")
    val variance = col("s2").cast("double") / col("n_base") - mean * mean
    stats.select(col("event_type"), col("hour"), col("c"),
      when(col("n_base") >= 2 && variance > 0,
        graft.ops.Portable.round4((col("c") - mean) / sqrt(variance)))
        .as("z"))
  }

  /** Events tagged with their gap-session sequence number — the shared
    * sessionization pass behind x16 and the x54 funnel: one shuffle on
    * user_id, lag to find gap starts, running sum to number sessions. */
  def sessionized(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ms"), col("event_id"))
    events
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_millis(col("ts")).as("ms"),
        valueCents(col("value")).as("value_cents"))
      .withColumn("prev_ms", lag(col("ms"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_ms").isNull || col("ms") - col("prev_ms") > SessionGapMs, 1)
          .otherwise(0))
      .withColumn("session_seq",
        sum(col("is_new")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** x16: gap-based sessionization: per user, order by (ts, event_id);
    * gap > [[SessionGapMs]] opens a new session; emit one row per
    * session with bounds and totals. */
  def sessions(events: DataFrame): DataFrame =
    sessionized(events).groupBy(col("user_id"), col("session_seq"))
      .agg(
        min(col("ms")).as("start_ms"),
        max(col("ms")).as("end_ms"),
        count(lit(1)).as("n_events"),
        sum(col("value_cents")).as("value_cents"))

  /** The event-type enum, pinned so the x53 pivot never needs a
    * driver-side distinct pass over the data (the scale rule for
    * pivot: always pass the value list explicitly). */
  val EventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  /** x53: hour × event-type PIVOT (crosstab) — one count column per
    * [[EventTypes]] value, absent combinations as 0. Spark's `pivot`
    * with an explicit value list compiles to ONE hash aggregate with
    * conditional counts (same plan as the hand-written CASE WHEN form
    * the oracle uses) — no extra shuffle, no second pass to discover
    * the columns. */
  def hourlyPivot(events: DataFrame): DataFrame =
    parsedEvents(events)
      .groupBy(col("hour"))
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
      .na.fill(0L, EventTypes)

  /** x54: MIN-TIME FUNNEL over gap sessions (the canonical product-
    * analytics query): a session reaches stage "view" if it contains a
    * view; "view>click" if additionally its earliest click is strictly
    * after its earliest view; "view>click>purchase" if additionally
    * its earliest purchase is strictly after that click. Output: one
    * row per stage with the converting-session count.
    * Scale: rides the x16 sessionization shuffle, one hash aggregate
    * per session, one 1-row aggregate, a 4-row unpivot — nothing
    * global beyond the final counts. */
  /** x79: session TRANSITION MATRIX — the first-order Markov counts of
    * "what do users do next" inside a session (clickstream analysis /
    * next-event modeling features). Transitions never cross a session
    * boundary: the lead() pair must share the gap-derived session_seq
    * of [[sessionized]].
    *
    * Scale: the same single user-keyed shuffle as x16 feeds both the
    * session window and the lead() pass (one sort, two frames), then a
    * hash aggregate down to the |types|² matrix — shuffle output is
    * bounded by the type-enum square, not the event count. */
  def sessionTransitions(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ms"), col("event_id"))
    sessionized(events)
      .withColumn("next_type", lead(col("event_type"), 1).over(byUser))
      .withColumn("next_seq", lead(col("session_seq"), 1).over(byUser))
      .filter(col("next_type").isNotNull && col("next_seq") === col("session_seq"))
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
  }

  /** x80 bucket count. */
  val HistBuckets = 4

  /** x80: per-type EQUI-DEPTH histogram — ntile buckets over the exact
    * cents order (ties broken by event_id, so both engines pick the
    * same concrete boundaries; no interpolation, no floats). The
    * exact complement to x40's mergeable sketch: run this where exact
    * quartile boundaries are worth one sort, the sketch where a single
    * pass must suffice.
    *
    * Scale: one shuffle on event_type + one in-partition sort feeds
    * ntile; the aggregate reduces to |types|·B rows. Skew note: a
    * single giant type serializes into one task — at extreme scale
    * switch to the x40 sketch or pre-split with a salt. */
  def equiDepthHist(events: DataFrame): DataFrame =
    events
      .select(col("event_type"), col("event_id"), valueCents(col("value")).as("cents"))
      .withColumn("bucket", ntile(HistBuckets).over(
        Window.partitionBy(col("event_type"))
          .orderBy(col("cents"), col("event_id"))).cast("long"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("cents")).as("lo_cents"), max(col("cents")).as("hi_cents"))

  def sessionFunnel(events: DataFrame): DataFrame = {
    val perSession = sessionized(events)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        min(when(col("event_type") === "view", col("ms"))).as("t_view"),
        min(when(col("event_type") === "click", col("ms"))).as("t_click"),
        min(when(col("event_type") === "purchase", col("ms"))).as("t_purchase"))
    val s2 = col("t_view").isNotNull && col("t_click") > col("t_view")
    val s3 = s2 && col("t_purchase") > col("t_click")
    perSession
      .agg(
        count(lit(1)).as("n_sessions"),
        sum(when(col("t_view").isNotNull, 1L).otherwise(0L)).as("n_view"),
        sum(when(s2, 1L).otherwise(0L)).as("n_view_click"),
        sum(when(s3, 1L).otherwise(0L)).as("n_view_click_purchase"))
      .select(explode(array(
        struct(lit("1_sessions").as("stage"), col("n_sessions").as("n")),
        struct(lit("2_view").as("stage"), col("n_view").as("n")),
        struct(lit("3_view_click").as("stage"), col("n_view_click").as("n")),
        struct(lit("4_view_click_purchase").as("stage"),
          col("n_view_click_purchase").as("n")))).as("s"))
      .select(col("s.stage").as("stage"), col("s.n").as("n"))
  }

  /** x57: the WINDOW-FUNCTION SUITE the reference never uses
    * (SURVEY.md §2.10): per user ordered by (ms, event_id) —
    * lag/lead neighbors, row_number, ntile quartile, percent_rank and
    * cume_dist (deterministic: the order key is unique per user, so
    * rank ties cannot differ between engines; fractions rounded 4dp).
    * One shuffle on user_id, one sort per partition, every function
    * evaluated in the same window pass. */
  def windowSuite(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ms"), col("event_id"))
    events
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_millis(col("ts")).as("ms"),
        valueCents(col("value")).as("value_cents"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .withColumn("seq", row_number().over(w).cast("long"))
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .withColumn("pct_rank", graft.ops.Portable.round4(percent_rank().over(w)))
      .withColumn("cume", graft.ops.Portable.round4(cume_dist().over(w)))
  }

  /** Hop and width of the x67 sliding windows (15 min hop, 1 h width:
    * every event lands in 4 overlapping windows). */
  val HopMs: Long = 15 * 60 * 1000L
  val SlideWindowMs: Long = 3600000L

  /** x67: HOPPING-WINDOW aggregation (the batch form of streaming
    * `window(ts, '1 hour', '15 minutes')`): each event replicates into
    * width/hop = 4 overlapping windows, then one hash aggregate per
    * (window_start, event_type). Scale: the explode multiplies rows by
    * a CONSTANT 4 — map-side — and partial aggregation collapses them
    * before the shuffle; no range join, no self-join. */
  def hourlySliding(events: DataFrame): DataFrame = {
    val ms = unix_millis(col("ts"))
    val lastStart = floor(ms / HopMs).cast("long") * HopMs
    events
      .select(col("event_type"), Events.valueCents(col("value")).as("cents"),
        explode(sequence(lit(0L), lit(SlideWindowMs / HopMs - 1)))
          .as("i"), lastStart.as("last_start"))
      .select(col("event_type"), col("cents"),
        (col("last_start") - col("i") * HopMs).as("window_start"))
      .groupBy(col("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("value_cents"))
  }

  /** x68: GROUP-WISE NORMALIZATION (feature scaling before training):
    * per event_type, the z-score of each event's cent value computed
    * from EXACT integer sums (Σc, Σc², n commute across partitions;
    * the floats enter only in the final per-row expression, evaluated
    * in one fixed order and rounded 4dp). Events in a type with zero
    * variance report null. Scale: one hash aggregate over the enum-
    * sized groups, broadcast back, map-only normalization pass. */
  def normalizedValues(events: DataFrame): DataFrame = {
    val base = events.select(col("event_id"), col("event_type"),
      valueCents(col("value")).as("cents"))
    val stats = broadcast(base.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("s1"),
        sum(col("cents") * col("cents")).as("s2")))
    val mean = col("s1").cast("double") / col("n")
    val variance = col("s2").cast("double") / col("n") - mean * mean
    base.join(stats, Seq("event_type"))
      .select(col("event_id"), col("event_type"), col("cents"),
        when(col("n") >= 2 && variance > 0,
          graft.ops.Portable.round4((col("cents") - mean) / sqrt(variance)))
          .as("z"))
  }

  /** x66: SET-OPERATION surface (INTERSECT / EXCEPT — absent from the
    * reference, SURVEY.md §2.6): per event-type user sets combined
    * relationally — buyers who also signed up (INTERSECT), buyers who
    * never erred (EXCEPT), flagged and unioned. Both compile to hash
    * aggregates + joins (EXCEPT = left-anti, INTERSECT = left-semi on
    * distinct sets): one shuffle each on user_id, no sort. */
  def userSetOps(events: DataFrame): DataFrame = {
    def users(t: String) =
      events.filter(col("event_type") === t).select(col("user_id")).distinct()
    val buyers = users("purchase")
    users("signup").intersect(buyers)
      .withColumn("cohort", lit("signup_and_buy"))
      .unionByName(
        buyers.except(users("error")).withColumn("cohort", lit("buy_no_error")))
      .select(col("cohort"), col("user_id"))
  }

  /** x55: COHORT RETENTION — users grouped by their first-activity day
    * (the cohort), counted on each later day they return: one row per
    * (cohort_day, day_offset) with the distinct returning users. The
    * standard growth-analytics triangle. Scale: first-day pass is one
    * hash aggregate on user_id; the join back is user_id-keyed; the
    * final count-distinct shuffles (cohort, offset, user) — all keys,
    * no payloads. */
  def cohortRetention(events: DataFrame): DataFrame = {
    val days = events.select(col("user_id"),
      (floor(unix_millis(col("ts")) / 86400000L)).cast("long").as("day")).distinct()
    val firstDay = days.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    days.join(firstDay, Seq("user_id"))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** x92: incremental materialized-view maintenance — the hourly MV
    * (event_type × hour → count, cent sum) is maintained from a base
    * aggregate plus a DELTA batch (1-in-5 events by id residue,
    * shared with [[Temporal.MergeSplitMod]]) instead of recomputed:
    * aggregate the delta alone, then merge into the base with one
    * full-outer join on the group key, summing the ADDITIVE measures
    * (count/sum maintain incrementally; distinct-count deliberately
    * excluded — it needs a sketch, see x31/x65). `touched` marks
    * groups the delta actually changed.
    *
    * The refresh contract: merge(agg(base), agg(delta)) ≡ agg(all) —
    * the oracle IS the full recompute (with `touched` recovered as a
    * per-group max over the delta marker). At 100 TB the delta path
    * aggregates only the new partition and shuffles |changed groups|
    * rows, vs a full re-scan of the fact table. */
  def mvRefresh(events: DataFrame): DataFrame = {
    def hourly(df: DataFrame) = parsedEvents(df)
      .groupBy(col("event_type"), col("hour"))
      .agg(count(lit(1)).as("n_events"), sum(col("value_cents")).as("value_cents"))
    val isDelta = pmod(col("event_id"), lit(Temporal.MergeSplitMod)) === 0
    val base = hourly(events.filter(!isDelta))
    val delta = hourly(events.filter(isDelta))
      .select(col("event_type").as("d_type"), col("hour").as("d_hour"),
        col("n_events").as("d_n"), col("value_cents").as("d_cents"))
    base.join(delta,
        col("event_type") === col("d_type") && col("hour") === col("d_hour"),
        "full_outer")
      .select(
        coalesce(col("event_type"), col("d_type")).as("event_type"),
        coalesce(col("hour"), col("d_hour")).as("hour"),
        (coalesce(col("n_events"), lit(0L)) + coalesce(col("d_n"), lit(0L)))
          .as("n_events"),
        (coalesce(col("value_cents"), lit(0L)) + coalesce(col("d_cents"), lit(0L)))
          .as("value_cents"),
        when(col("d_type").isNotNull, 1L).otherwise(0L).as("touched"))
  }

  /** x87 top-k depth. */
  val TopSpendK = 3

  /** x87: highest-value events per type through the CUSTOM grouped
    * top-k planner operator ([[graft.plans.TopKPerKey]] — logical
    * node + strategy + heap-based physical exec, no sort anywhere).
    * The (cents DESC, event_id ASC) order is total, so the result set
    * is deterministic and the DuckDB window-rank oracle agrees. */
  def topSpendEvents(events: DataFrame, k: Int = TopSpendK): DataFrame =
    graft.plans.TopKPerKey.topKPerKey(
      events.select(col("event_type"), col("event_id"),
        valueCents(col("value")).as("cents")),
      Seq(col("event_type")),
      Seq(col("cents").desc, col("event_id").asc), k)

  private val HourMs = 3600000L

  /** x121: hourly session CONCURRENCY — for each hour, how many gap
    * sessions (x16) were active (overlapped the hour) and how many
    * distinct users had one. This is interval-overlap ("range join")
    * semantics, expressed WITHOUT any non-equi join: each session
    * interval explodes into the hours it covers and the count is a
    * plain hash aggregate. A sequence-explode beats a range join here
    * because one side (the hour grid) is derivable from the interval
    * itself — no calendar table, no O(sessions × hours) nested loop.
    *
    * Scale: the explode factor is bounded by session DURATION (a gap
    * session only spans hours it has events in, within 30-min gaps),
    * so output rows ≈ sessions × avg-span — linear, map-side, on top
    * of the one x16 sessionization shuffle; then one hash aggregate
    * keyed by hour. No join at any size. */
  def sessionConcurrency(events: DataFrame): DataFrame =
    sessions(events)
      .select(col("user_id"),
        explode(sequence(
          col("start_ms") - pmod(col("start_ms"), lit(HourMs)),
          col("end_ms") - pmod(col("end_ms"), lit(HourMs)),
          lit(HourMs))).as("hour_ms"))
      .groupBy(col("hour_ms"))
      .agg(count(lit(1)).as("n_sessions"),
        countDistinct(col("user_id")).as("n_users"))

  /** x124: per-type Tukey VALUE BANDS — exact quartiles of the cent
    * values per event type, IQR fences at 1.5×, and the outlier count
    * outside them (the standard anomaly band for metric streams).
    * Fences are snapped to the 1e-4 grid BEFORE the comparison so the
    * flag is identical in both engines.
    *
    * Scale: `percentile` (exact, interpolating) aggregates a per-group
    * counts-map whose size is the number of DISTINCT cent values —
    * bounded by the fixed-point value domain, not the row count, so
    * the map stays small at any SF (for unbounded domains the swap-in
    * is the mergeable rank sketch of x40). The fence frame is one row
    * per type; joining it back is a broadcast hash join by
    * construction, and the outlier pass is the same single scan
    * re-aggregated — two scans, two tiny shuffles, no sort. */
  def valueBands(events: DataFrame): DataFrame = {
    val cents = events.select(col("event_type"),
      valueCents(col("value")).as("cents"))
    val fences = cents.groupBy(col("event_type"))
      .agg(percentile(col("cents"), lit(0.25)).as("q1"),
        percentile(col("cents"), lit(0.75)).as("q3"))
      .select(col("event_type"),
        Portable.round4(col("q1") - (col("q3") - col("q1")) * 1.5).as("lo"),
        Portable.round4(col("q3") + (col("q3") - col("q1")) * 1.5).as("hi"))
    cents.join(broadcast(fences), Seq("event_type"))
      .groupBy(col("event_type"), col("lo"), col("hi"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("cents") < col("lo") || col("cents") > col("hi"), 1L)
          .otherwise(0L)).as("n_outliers"))
  }

  /** x125: time-series GAP FILL — the per-type hourly count series
    * densified to every hour between that type's first and last event,
    * absent hours as explicit zeros (what a monitoring/forecasting
    * consumer needs; a groupBy alone silently skips empty hours).
    *
    * Scale: ONE hash aggregate over the events does all the heavy
    * lifting; the dense hour grid is derived from the per-type
    * [min,max] of that aggregate's OUTPUT (|types| rows) by a
    * sequence-explode, so the left join is between two frames both
    * bounded by |types| × |hours| — the observed side is broadcast.
    * Nothing about this plan changes when the event count scales
    * 100×; only the first aggregate's input does. */
  def gapFill(events: DataFrame): DataFrame = {
    val counts = Caching.temp(events
      .select(col("event_type"),
        unix_millis(date_trunc("hour", col("ts"))).as("hour_ms"))
      .groupBy(col("event_type"), col("hour_ms"))
      .agg(count(lit(1)).as("n")))
    val grid = counts.groupBy(col("event_type"))
      .agg(min(col("hour_ms")).as("lo"), max(col("hour_ms")).as("hi"))
      .select(col("event_type"),
        explode(sequence(col("lo"), col("hi"), lit(HourMs))).as("hour_ms"))
    grid.join(broadcast(counts), Seq("event_type", "hour_ms"), "left")
      .select(col("event_type"), col("hour_ms"),
        coalesce(col("n"), lit(0L)).as("n_events"))
  }

  /** x126: GROUPING SETS marginals — the by-type and by-hour marginal
    * aggregates in ONE pass (`groupingSets`, the generalization that
    * x18's ROLLUP and x72's CUBE are shorthands for), tagged with
    * `grouping_id` so a consumer can split the levels. One query
    * replaces two scans + a union of two aggregates.
    *
    * Scale: Expand duplicates each input row once per set (2× here)
    * BEFORE the partial aggregate, so the shuffle carries only the
    * two marginals' groups — strictly cheaper than running the two
    * aggregations as separate jobs over the raw table. */
  def groupingSetsMarginals(events: DataFrame): DataFrame =
    parsedEvents(events)
      .groupingSets(
        Seq(Seq(col("event_type")), Seq(col("hour"))),
        col("event_type"), col("hour"))
      // grouping_id() must be an AGGREGATE expression — the analyzer
      // only resolves it inside the grouping-sets Aggregate itself
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n_events"), sum(col("value_cents")).as("value_cents"))
      .select(col("event_type"), col("hour"), col("gid"),
        col("n_events"), col("value_cents"))

  private[graft] val DayMs = 86400000L
  private val WeekMs = 7 * DayMs

  /** The exact (event_type × day) daily-count grid — the shared input
    * of x139's EWMA and x152's CUSUM (ONE definition so a future
    * day-boundary fix cannot drift between them; the ExtSql `daily`
    * CTE mirrors this single form). */
  private[ops] def dailyCounts(events: DataFrame): DataFrame =
    Caching.temp(events
      .select(col("event_type"),
        floor(unix_millis(col("ts")) / DayMs).cast("long").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n")))

  /** x257 two-sided normal critical value at α = 0.05. */
  val MkZCrit = 1.96

  /** x257: MANN–KENDALL TREND TEST + SEN'S SLOPE per event type over
    * the daily-volume series — the standard NONPARAMETRIC trend pair
    * (Mann '45 / Kendall '75; Sen '68): S = Σ_{i<j} sign(n_j − n_i)
    * on day-ordered pairs (exact BIGINT), the ties-corrected variance
    * kept as its exact integer numerator var18 = n(n−1)(2n+5) −
    * Σ_t t(t−1)(2t+5) (the /18 folds into the z denominator), the
    * continuity-corrected z = (S ∓ 1)/√(var18/18), and Sen's slope =
    * the MEDIAN of the pairwise slopes (n_j − n_i)/(day_j − day_i) —
    * robust where x139's EWMA and x156's OLS seasonality are
    * outlier-sensitive. A constant series (var18 = 0) reports z = 0,
    * not NaN (the x238 degenerate-input lesson).
    *
    * Scale: the corpus-sized work is the ONE hash aggregate to the
    * (type × day) grid (shared [[dailyCounts]]); the pair join is
    * day-grid² WITHIN each type — series-length-bounded, independent
    * of event count (a year is ~66k pairs per type); the median is a
    * per-type window over those bounded pairs. */
  def mannKendallDaily(events: DataFrame): DataFrame = {
    val daily = dailyCounts(events)
    val l = daily.select(col("event_type"), col("day").as("di"), col("n").as("ni"))
    val r = daily.select(col("event_type"), col("day").as("dj"), col("n").as("nj"))
    val pairs = Caching.temp(
      l.join(r, Seq("event_type")).filter(col("di") < col("dj")))
    val sAgg = pairs.groupBy(col("event_type"))
      .agg(sum(signum(col("nj") - col("ni")).cast("long")).as("s_stat"))
    val wOrd = Window.partitionBy(col("event_type"))
      .orderBy(col("slope"), col("di"), col("dj"))
    val wAll = Window.partitionBy(col("event_type"))
    val med = pairs
      .select(col("event_type"), col("di"), col("dj"),
        ((col("nj") - col("ni")).cast("double") /
          (col("dj") - col("di")).cast("double")).as("slope"))
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("m", count(lit(1)).over(wAll))
      // integral `div`, NOT `/` (always a DOUBLE divide): an even m
      // must select BOTH middle ranks — (m+1)/2 as a double is x.5 and
      // would silently match only the upper one, diverging from the
      // oracle's interpolated median wherever the two middles differ
      .filter(col("rn") === expr("(m + 1) div 2") ||
        col("rn") === expr("m div 2 + 1"))
      .groupBy(col("event_type"))
      .agg(avg(col("slope")).as("sen_raw"))
    val ties = daily.groupBy(col("event_type"), col("n"))
      .agg(count(lit(1)).as("t"))
      .groupBy(col("event_type"))
      .agg(sum(expr("t * (t - 1) * (2 * t + 5)")).as("tie18"))
    val nDays = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"))
    val var18 = expr("n_days * (n_days - 1) * (2 * n_days + 5)") - col("tie18")
    val z = when(var18 === 0, lit(0.0))
      .when(col("s_stat") > 0,
        (col("s_stat") - 1).cast("double") / sqrt(var18.cast("double") / 18.0))
      .when(col("s_stat") < 0,
        (col("s_stat") + 1).cast("double") / sqrt(var18.cast("double") / 18.0))
      .otherwise(lit(0.0))
    nDays.join(sAgg, Seq("event_type")).join(ties, Seq("event_type"))
      .join(med, Seq("event_type"))
      .select(col("event_type"), col("n_days"), col("s_stat"),
        var18.as("var18"),
        Portable.round4(z).as("z"),
        Portable.round4(col("sen_raw")).as("sen_slope"),
        when(Portable.round4(z) > MkZCrit, "increasing")
          .when(Portable.round4(z) < -MkZCrit, "decreasing")
          .otherwise("none").as("trend"))
  }

  /** x139 decay per elapsed DAY (missing days decay too — the index is
    * the real day offset, not the observed-row ordinal). */
  val EwmaDecay = 0.9

  /** x139: EWMA-smoothed daily event volume per type, plus the
    * actual/smoothed ratio (the classic volume-drift alarm; x44's
    * z-score twin with exponential rather than boxcar memory). The
    * recursive EWMA is evaluated in closed form so one window pass
    * computes it: with i = day − day₀,
    * ewma_t = Σ_{i≤t} w^{t−i}·n_i / Σ_{i≤t} w^{t−i}
    *        = Σ n_i·w^{−i} / Σ w^{−i}  (the w^t deflation cancels in
    * the ratio).
    *
    * The exponent rebases on EACH TYPE's own first day (a window min,
    * same pass) — w^−i must stay finite in a double, and a type whose
    * data starts late in a long-lived corpus would otherwise inherit
    * the corpus-global offset (w^−i overflows past i ≈ 6,700 days).
    * One 18+-year CONTIGUOUS single-type series is still the honest
    * horizon of this closed form; past that the swap-in is the
    * trailing-H-day frame (w^H < 1 ulp long before: w^400 ≈ 5e−19),
    * whose dropped tail is numerically unobservable.
    *
    * Scale: the corpus-sized work is ONE hash aggregate to the
    * (type × day) grid; the window runs over that tiny grid — series
    * length per type, not event count. Cross-engine: the running sums
    * add in the same ascending-day order in both engines and the only
    * libm calls are pow(w, −i) on small integer exponents; results
    * leave through the 1e-4 grid. */
  def ewmaDaily(events: DataFrame): DataFrame = {
    val daily = dailyCounts(events)
    val wType = Window.partitionBy(col("event_type"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("i"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wi = pow(lit(EwmaDecay), -col("i").cast("double"))
    daily
      .select(col("event_type"), col("day"), col("n"),
        (col("day") - min(col("day")).over(wType)).as("i"))
      .withColumn("num", sum(col("n") * wi).over(w))
      .withColumn("den", sum(wi).over(w))
      .select(col("event_type"), col("day"), col("n").as("n_events"),
        Portable.round4(col("num") / col("den")).as("ewma"),
        Portable.round4(col("n") / (col("num") / col("den"))).as("ratio"))
  }

  /** x144 trailing-window width in days. */
  val RollingDays = 7

  /** x144: rolling 7-day DISTINCT active users per event type — the
    * weekly-active-users series. Windowed COUNT(DISTINCT) doesn't
    * exist in either engine, and a per-day set union doesn't
    * distribute; the scalable formulation is contribution-explode:
    * each distinct (type, user, day) activity contributes to the 7
    * observation days it is visible from, then one hash aggregate
    * counts distinct users per (type, obs_day). Days past the data's
    * end are clipped so every emitted day has full semantics.
    *
    * Scale: the distinct pass collapses raw events to activity keys
    * FIRST (the explode factor applies to distinct activity, not raw
    * volume), the explode is a fixed 7×, and both aggregates shuffle
    * only keys. The exact-distinct final agg is the contract here;
    * the sketch trade (x65's grouped HLL) applies when approximate
    * is acceptable. */
  def rollingDistinctUsers(events: DataFrame): DataFrame = {
    val act = Caching.temp(events
      .select(col("event_type"), col("user_id"),
        floor(unix_millis(col("ts")) / DayMs).cast("long").as("day"))
      .distinct())
    val mx = act.agg(max(col("day")).as("max_day"))
    act
      .select(col("event_type"), col("user_id"),
        explode(sequence(col("day"), col("day") + (RollingDays - 1))).as("obs_day"))
      .crossJoin(broadcast(mx))
      .filter(col("obs_day") <= col("max_day"))
      .groupBy(col("event_type"), col("obs_day"))
      .agg(countDistinct(col("user_id")).as("n_users_7d"))
  }

  /** x161 result depth. */
  val PathTopK = 10

  /** x161: TOP SESSION PATHS — each gap session's ordered event-type
    * sequence collapsed to a `a>b>c` path string, ranked by frequency
    * (the "how do users actually move" read behind funnel design;
    * x54 asserts one fixed funnel, this DISCOVERS the paths).
    *
    * Determinism: the per-session event order is the total
    * (ms, event_id) order — the collected structs sort on exactly
    * that prefix before the types are joined, so the path string is
    * partition-order-independent; the top-k cutoff orders by
    * (count desc, path asc).
    *
    * Scale: rides the x16 sessionization shuffle; the per-session
    * collect is bounded by session LENGTH (the 30-min gap bounds it
    * for humans; a bot session would need the slice-cap swap-in
    * before the sort); path aggregation shuffles path strings, and
    * the global top-k is the heap TakeOrderedAndProject, never a full
    * sort. */
  def topSessionPaths(events: DataFrame): DataFrame = {
    val paths = sessionized(events)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(concat_ws(">",
        transform(
          array_sort(collect_list(struct(col("ms"), col("event_id"), col("event_type")))),
          x => x.getField("event_type"))).as("path"))
    val top = paths.groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path").asc)
      .limit(PathTopK)
    top.withColumn("rnk", row_number().over(
      Window.orderBy(col("n_sessions").desc, col("path").asc)).cast("long"))
  }

  /** x159: VARIANT JSON SHREDDING — semi-structured event payloads
    * parsed ONCE into Spark 4's binary VariantType and shredded by
    * typed path extraction (`parse_json` → `variant_get`), the
    * engine-native replacement for per-path `get_json_object` re-parses
    * (x14) and for UDF JSON handling. The fixture props are flat, so
    * the op deterministically AUGMENTS them into nested objects +
    * arrays + an optionally-absent key (the x99/x108/x109 injection
    * convention, mirrored codepoint-for-codepoint in the oracle) —
    * the regex-free path/array/missing-key semantics are what's under
    * test.
    *
    * Scale: map-only — one parse + four typed extractions in a single
    * codegen projection, no shuffle, no UDF; the variant binary never
    * leaves the row. */
  def variantShred(events: DataFrame): DataFrame = {
    val e3 = pmod(col("event_id"), lit(3))
    val e5 = pmod(col("event_id"), lit(5))
    val aug = concat(
      lit("{\"k\": "), get_json_object(col("props"), "$.k"),
      lit(", \"meta\": {\"ua\": \"ua"), e3,
      lit("\", \"tags\": [\"t"), e5, lit("\", \"t"), pmod(col("event_id"), lit(7)),
      lit("\"]}"),
      when(pmod(col("event_id"), lit(4)) =!= 0,
        concat(lit(", \"price\": "), valueCents(col("value")).cast("string")))
        .otherwise(lit("")),
      lit("}"))
    val v = parse_json(aug)
    events.select(col("event_id"), v.as("v"))
      .select(col("event_id"),
        try_variant_get(col("v"), "$.k", "long").as("k"),
        try_variant_get(col("v"), "$.meta.ua", "string").as("ua"),
        try_variant_get(col("v"), "$.meta.tags[1]", "string").as("tag1"),
        try_variant_get(col("v"), "$.price", "long").as("price"))
  }

  /** x155 conversion: a purchase of at least this many cents. */
  val AbConvType = "purchase"
  val AbConvCents = 15000L

  /** x155: A/B TWO-PROPORTION z-TEST — users split into variants by
    * id parity (the deterministic stand-in for an assignment column —
    * an A/A split, so |z| < 1.96 is the expected healthy read),
    * conversion = made a purchase of ≥ [[AbConvCents]]; one row with
    * both arms' n/k, the rates, and the pooled-variance z statistic.
    * The experiment readout every product-analytics engine ships.
    * A degenerate pool (conversion 0% or 100%) has no variance: z is
    * NULL, never 0/0 (which ANSI mode turns into a runtime error).
    *
    * Scale: two distinct passes collapse the corpus to user keys; the
    * converter flag attaches via a user-keyed co-partitioned left
    * join; then a 2-row aggregate, with the z arithmetic on one
    * broadcast row per arm. Doubles appear only in the final formula
    * (division/sqrt are IEEE-identical in both engines), snapped to
    * 1e-4. */
  def abTest(events: DataFrame): DataFrame = {
    val users = events.select(col("user_id")).distinct()
    val conv = events
      .filter(col("event_type") === AbConvType &&
        valueCents(col("value")) >= AbConvCents)
      .select(col("user_id")).distinct().withColumn("conv", lit(1L))
    val arms = users
      .withColumn("variant", pmod(col("user_id"), lit(2)).cast("long"))
      .join(conv, Seq("user_id"), "left")
      .groupBy(col("variant"))
      .agg(count(lit(1)).as("n"), sum(coalesce(col("conv"), lit(0L))).as("k"))
    val a = arms.filter(col("variant") === 0)
      .select(col("n").as("n_a"), col("k").as("k_a"))
    val b = arms.filter(col("variant") === 1)
      .select(col("n").as("n_b"), col("k").as("k_b"))
    val pa = col("k_a").cast("double") / col("n_a").cast("double")
    val pb = col("k_b").cast("double") / col("n_b").cast("double")
    val pp = (col("k_a") + col("k_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    val z = (pa - pb) / sqrt(pp * (lit(1.0) - pp) *
      (lit(1.0) / col("n_a").cast("double") + lit(1.0) / col("n_b").cast("double")))
    a.crossJoin(broadcast(b))
      .select(col("n_a"), col("k_a"), col("n_b"), col("k_b"),
        Portable.round4(pa).as("rate_a"),
        Portable.round4(pb).as("rate_b"),
        when(pp <= 0.0 || pp >= 1.0, lit(null).cast("double"))
          .otherwise(Portable.round4(z)).as("z"))
  }

  /** x156: SEASONALITY PROFILE — the (day-of-week × hour-of-day) event
    * grid with each cell's share of total traffic; the fingerprint
    * capacity planning and anomaly baselining read first. Day-of-week
    * comes from pure epoch arithmetic ((epoch_day + 4) mod 7, 0 =
    * Sunday) — never from calendar functions, whose week conventions
    * differ across engines.
    *
    * Scale: map-only projection into a ≤168-cell hash aggregate
    * (map-side partials collapse each split to the grid), total
    * broadcast back. */
  def seasonality(events: DataFrame): DataFrame = {
    val ms = unix_millis(col("ts"))
    val grid = events.select(
        pmod(floor(ms / DayMs) + 4, lit(7)).cast("long").as("dow"),
        floor(pmod(ms, lit(DayMs)) / HourMs).cast("long").as("hour"))
      .groupBy(col("dow"), col("hour"))
      .agg(count(lit(1)).as("n_events"))
    val tot = grid.agg(sum(col("n_events")).as("tot"))
    grid.crossJoin(broadcast(tot))
      .select(col("dow"), col("hour"), col("n_events"),
        Portable.round4(col("n_events").cast("double") / col("tot").cast("double"))
          .as("share"))
  }

  /** x157: CONVERSION LATENCY — for every purchase with a prior view
    * by the same user, the view→purchase delay; output is one row of
    * exact interpolated percentiles over the integral ms deltas. The
    * funnel-speed complement to x54's stage counts.
    *
    * Scale: the as-of lookup is x19's carry-forward window (one
    * shuffle on user_id, strictly-preceding frame — no range join);
    * the percentile aggregate is exact over a counts-map bounded by
    * the distinct-delay domain (x28's note; unbounded domains swap in
    * the x40 sketch). */
  def conversionLatency(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ms"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_millis(col("ts")).as("ms"))
      .withColumn("last_view_ms",
        last(when(col("event_type") === "view", col("ms")), ignoreNulls = true)
          .over(w))
      .filter(col("event_type") === AbConvType && col("last_view_ms").isNotNull)
      .select((col("ms") - col("last_view_ms")).as("delta"))
      .agg(count(lit(1)).as("n"),
        Portable.round4(percentile(col("delta"), lit(0.5))).as("p50"),
        Portable.round4(percentile(col("delta"), lit(0.9))).as("p90"),
        Portable.round4(percentile(col("delta"), lit(0.99))).as("p99"))
  }

  /** x151: event-type CO-OCCURRENCE LIFT — for each unordered type
    * pair, how much more (or less) often users do both than
    * independence predicts: lift = P(a∧b) / (P(a)·P(b)) with
    * probabilities over distinct users. The market-basket association
    * screen; lift ≫ 1 marks coupled behaviors, ≪ 1 substitutes.
    *
    * Scale: one distinct pass to (user, type) keys; the pair fan-out
    * is a self-join co-partitioned on user_id whose per-user width is
    * bounded by the TYPE ENUM (≤ |types|² pairs per user, not corpus-
    * driven); type totals and the user total broadcast back. The
    * lift arithmetic is exact until one final double: lift =
    * (n_ab·n_users) / (n_a·n_b), each factor an exact BIGINT. */
  def typeLift(events: DataFrame): DataFrame = {
    val ut = Caching.temp(events
      .select(col("user_id"), col("event_type")).distinct())
    val totals = ut.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val nUsers = ut.select(col("user_id")).distinct()
      .agg(count(lit(1)).as("n_users"))
    val pairs = ut.select(col("user_id"), col("event_type").as("type_a"))
      .join(ut.select(col("user_id"), col("event_type").as("type_b")),
        Seq("user_id"))
      .filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(broadcast(totals.select(col("event_type").as("type_a"), col("n").as("n_a"))),
        Seq("type_a"))
      .join(broadcast(totals.select(col("event_type").as("type_b"), col("n").as("n_b"))),
        Seq("type_b"))
      .crossJoin(broadcast(nUsers))
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"), col("n_ab"),
        Portable.round4((col("n_ab") * col("n_users")).cast("double") /
          (col("n_a") * col("n_b")).cast("double")).as("lift"))
  }

  /** x152: CUSUM CHANGE-POINT detection on the daily volume series per
    * event type — the classic "when did the level shift" probe
    * (Page '54), complementing x44's boxcar z-score and x139's EWMA
    * ratio: CUSUM accumulates small sustained drifts that neither
    * alarm sees, and its |max| marks the most likely change day.
    *
    * Determinism: the running sum is kept EXACT by scaling — with D
    * observed days and T total events for a type,
    * S_t = Σ_{i≤t} (n_i·D − T) is an exact BIGINT (cusum = S_t/D only
    * at the output edge), and the change-point is the exact-integer
    * argmax of |S_t| (ties: first day), so both engines agree
    * bit-for-bit with no floating accumulation anywhere.
    *
    * Scale: the corpus collapses in ONE hash aggregate to the
    * (type × day) grid; windows run per type over that tiny series
    * (x139's shape). n_i·D − T stays far inside 2⁶³ for any real
    * series (n·D ≤ total·days). */
  def cusumChangepoint(events: DataFrame): DataFrame = {
    val daily = dailyCounts(events)
    val stats = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("d"), sum(col("n")).as("t"))
    val wCum = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wType = Window.partitionBy(col("event_type"))
    daily.join(broadcast(stats), Seq("event_type"))
      .withColumn("s", sum(col("n") * col("d") - col("t")).over(wCum))
      .withColumn("smax", max(abs(col("s"))).over(wType))
      .withColumn("is_cp",
        (abs(col("s")) === col("smax")) &&
          (min(when(abs(col("s")) === col("smax"), col("day"))).over(wType)
            === col("day")))
      .select(col("event_type"), col("day"), col("n"),
        Portable.round4(col("s").cast("double") / col("d").cast("double"))
          .as("cusum"),
        col("is_cp").cast("long").as("is_cp"))
  }

  /** x147: week-over-week active-user overlap — per week (having a
    * predecessor): last week's actives, this week's, the overlap, the
    * Jaccard, and the churned/new decomposition. The standing growth
    * KPI; set semantics like x66 but BETWEEN adjacent periods.
    *
    * Scale: one distinct pass to (user, week) keys; the adjacency
    * "intersection" is a self-join co-partitioned on (user_id, week)
    * — shifting one side by +1 week turns interval adjacency into an
    * equi-join, so no range join and no per-week set materialization;
    * week-level frames after aggregation are |weeks|-sized. */
  def wowUserOverlap(events: DataFrame): DataFrame = {
    val wk = Caching.temp(events
      .select(col("user_id"),
        floor(unix_millis(col("ts")) / WeekMs).cast("long").as("week"))
      .distinct())
    val tot = wk.groupBy(col("week")).agg(count(lit(1)).as("n"))
    val both = wk.select(col("user_id"), (col("week") + 1).as("week"))
      .join(wk, Seq("user_id", "week"))
      .groupBy(col("week")).agg(count(lit(1)).as("n_both"))
    val nb = coalesce(col("n_both"), lit(0L))
    tot.select(col("week"), col("n").as("n_curr"))
      .join(broadcast(tot.select((col("week") + 1).as("week"), col("n").as("n_prev"))),
        Seq("week"))
      .join(broadcast(both), Seq("week"), "left")
      .select(col("week"), col("n_prev"), col("n_curr"), nb.as("n_both"),
        Portable.round4(nb.cast("double") /
          (col("n_prev") + col("n_curr") - nb).cast("double")).as("jaccard"),
        (col("n_prev") - nb).as("n_churned"),
        (col("n_curr") - nb).as("n_new"))
  }

  /** ACF lags computed (1..MaxAcfLag days). */
  val MaxAcfLag = 7

  /** x170: AUTOCORRELATION FUNCTION of total daily event volume at
    * lags 1..[[MaxAcfLag]] — the time-series diagnostic that
    * QUANTIFIES the weekly cycle x156's seasonality grid displays
    * (lag-7 spike = weekly rhythm; lag-1 ≈ 1 = smooth drift; all
    * lags ≈ 0 = white noise). Pearson correlation of (volume_d,
    * volume_{d+L}) over the overlapping day pairs per lag.
    *
    * Determinism: daily counts are exact integers, so every moment —
    * n·Σxy − Σx·Σy and the two variance legs — is computed in
    * DECIMAL(38,0) (matching the oracle's HUGEINT promotion of
    * sum(BIGINT); LongType would wrap on the n_day² terms at volume)
    * and only the final ratio is a double (rounded 4dp), identical in
    * both engines regardless of aggregation order. Zero-variance legs
    * (constant series) yield NULL via a guard, not NaN.
    *
    * Scale: the corpus collapses to the day-domain grid in one hash
    * aggregate; the lag pairing is an EQUI self-join on day+L over
    * that |days|-row grid (missing days simply contribute no pair —
    * the gap-skipping ACF), and the per-lag moments are a ≤MaxAcfLag-
    * row aggregate. Nothing downstream of the first aggregate touches
    * corpus-sized data. */
  def acfDailyVolume(events: DataFrame): DataFrame = {
    val daily = Caching.temp(dailyCounts(events)
      .groupBy(col("day")).agg(sum(col("n")).as("n")))
    val lagged = daily.select(col("day"), col("n").as("x"),
        explode(sequence(lit(1), lit(MaxAcfLag))).as("lag"))
      .select((col("day") + col("lag")).as("day"), col("lag").cast("long").as("lag"), col("x"))
    // Moments in DECIMAL(38,0), not LongType: the oracle's sum(BIGINT)
    // promotes to HUGEINT, and the n_day² terms pass 2⁶³ at large daily
    // volumes — same overflow class x186/x179/x173 already handle.
    val dec = "decimal(38,0)"
    val m = lagged.join(daily.select(col("day"), col("n").as("y")), Seq("day"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
        sum(col("x").cast(dec) * col("y").cast(dec)).as("sxy"),
        sum(col("x").cast(dec) * col("x").cast(dec)).as("sxx"),
        sum(col("y").cast(dec) * col("y").cast(dec)).as("syy"))
    val cov  = col("n_pairs") * col("sxy") - col("sx") * col("sy")
    val varx = col("n_pairs") * col("sxx") - col("sx") * col("sx")
    val vary = col("n_pairs") * col("syy") - col("sy") * col("sy")
    m.select(col("lag"), col("n_pairs"),
      when(varx > 0 && vary > 0,
        Portable.round4(cov.cast("double") /
          (sqrt(varx.cast("double")) * sqrt(vary.cast("double")))))
        .as("acf"))
  }

  /** x171: MARKOV TRANSITION MATRIX between consecutive event types
    * within a gap session — P(next = b | current = a) plus the row
    * marginals, the one-step model behind x161's verbatim path mining
    * (paths SHOW the top sequences; this gives every pairwise
    * continuation probability, the "what usually happens after a
    * view" table).
    *
    * Determinism: consecutive means adjacent under the total
    * (ms, event_id) session order — the same `lead` order every
    * engine agrees on; probabilities are exact-integer counts until
    * one final 4dp-rounded division.
    *
    * Scale: rides the x16 sessionization shuffle (one window pass per
    * user partition); the transition aggregate shuffles ≤|type|²
    * distinct keys with map-side combine, and the output is bounded
    * by the type-domain square, never the event count. */
  def typeTransitions(events: DataFrame): DataFrame = {
    val byUserSession = Window.partitionBy(col("user_id"), col("session_seq"))
      .orderBy(col("ms"), col("event_id"))
    val steps = sessionized(events)
      .withColumn("next_type", lead(col("event_type"), 1).over(byUserSession))
      .filter(col("next_type").isNotNull)
    val pairs = steps.groupBy(col("event_type").as("cur_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
    val outTot = pairs.groupBy(col("cur_type")).agg(sum(col("n")).as("n_out"))
    pairs.join(broadcast(outTot), Seq("cur_type"))
      .select(col("cur_type"), col("next_type"), col("n"), col("n_out"),
        Portable.round4(col("n").cast("double") / col("n_out").cast("double"))
          .as("p_next"))
  }

  /** x176: MULTI-TOUCH LINEAR ATTRIBUTION — every purchase splits its
    * credit EQUALLY across the view events that strictly precede it
    * in the same gap session (the standard linear model between
    * last-touch and first-touch; x157 measures the latency of one
    * view→purchase hop, this assigns fractional credit across all of
    * them). One row per (purchase, credited view).
    *
    * Determinism: "strictly preceding" is the total (ms, event_id)
    * session order — exact in both engines; credit = 1/n_touch is a
    * 4dp-rounded single division per row.
    *
    * Scale: the views⋈purchases join is an EQUI join co-keyed on
    * (user_id, session_seq) riding the x16 sessionization shuffle;
    * per-purchase fan-out is bounded by session LENGTH (the 30-min
    * human gap bounds it — same bot-session caveat as x161). A
    * purchase with no preceding view earns no row (nothing to
    * credit), mirrored by the oracle's inner join. */
  def linearAttribution(events: DataFrame): DataFrame = {
    val s = Caching.temp(sessionized(events)
      .select(col("user_id"), col("session_seq"), col("event_type"),
        col("event_id"), col("ms")))
    val purchases = s.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("session_seq"),
        col("event_id").as("purchase_id"), col("ms").as("pms"))
    val views = s.filter(col("event_type") === "view")
      .select(col("user_id"), col("session_seq"),
        col("event_id").as("view_id"), col("ms").as("vms"))
    val touched = purchases.join(views, Seq("user_id", "session_seq"))
      .filter(col("vms") < col("pms") ||
        (col("vms") === col("pms") && col("view_id") < col("purchase_id")))
    val counts = touched.groupBy(col("purchase_id"))
      .agg(count(lit(1)).as("n_touch"))
    touched.join(counts, Seq("purchase_id"))
      .select(col("purchase_id"), col("view_id"), col("n_touch"),
        Portable.round4(lit(1.0) / col("n_touch").cast("double")).as("credit"))
  }

  /** x192 anomaly band: a day flags when its volume leaves
    * [1/AnomalyRatio, AnomalyRatio] × its weekday's mean. */
  val AnomalyRatio = 1.5

  /** x192: SEASONALLY-ADJUSTED VOLUME ANOMALIES — each day's total
    * volume against the mean of ITS OWN WEEKDAY (the x156 dow
    * convention, (epoch_day+4) mod 7): a quiet Sunday is normal, a
    * Sunday-sized Tuesday is not. The dow-conditioned screen that
    * catches what raw-volume alarms (x44/x139/x152) conflate with the
    * weekly cycle.
    *
    * Determinism: expected = Σ_dow n / days_dow and the ratio
    * n·days/Σ are one 4dp double each from exact integers; the flag
    * compares the ROUNDED ratio against the band so both engines
    * decide identically.
    *
    * Scale: everything after the x139 daily grid aggregate lives on
    * the day domain; the 7-row dow means broadcast back. */
  def seasonalAnomaly(events: DataFrame): DataFrame = {
    val daily = Caching.temp(dailyCounts(events)
      .groupBy(col("day")).agg(sum(col("n")).as("n")))
      .withColumn("dow", pmod(col("day") + 4, lit(7)).cast("long"))
    val dowMeans = daily.groupBy(col("dow"))
      .agg(sum(col("n")).as("sn"), count(lit(1)).as("days"))
    val ratio = Portable.round4(
      (col("n") * col("days")).cast("double") / col("sn").cast("double"))
    daily.join(broadcast(dowMeans), Seq("dow"))
      .select(col("day"), col("dow"), col("n"),
        Portable.round4(col("sn").cast("double") / col("days").cast("double"))
          .as("expected"),
        ratio.as("ratio"),
        (ratio >= AnomalyRatio || ratio <= Portable.round4(lit(1.0 / AnomalyRatio)))
          .cast("long").as("is_anomaly"))
  }

  /** x193 value-band thresholds (cents) — 5 fixed bins. */
  val PsiValueCuts: Seq[Long] = Seq(2500L, 5000L, 10000L, 20000L)

  /** x193: WEEKLY PSI DRIFT TRAJECTORY — the population-stability
    * index of the event-value distribution for EVERY week against the
    * corpus's first week (x138 compares two static cohorts; this is
    * the monitoring time series that says WHEN the distribution
    * walked). Laplace-0.5 smoothing per x138's convention; one row
    * per week with its event count and PSI.
    *
    * Determinism: the 5-bin PSI sum folds the per-bin terms in BIN
    * ORDER (sorted-array fold — the §8.3 convention), each term one
    * double from exact smoothed counts.
    *
    * Scale: one corpus aggregate to (week × 5 bins); everything after
    * is week-domain-sized with the reference row broadcast. */
  def weeklyValuePsi(events: DataFrame): DataFrame = {
    val bin = PsiValueCuts.zipWithIndex.foldRight(lit(PsiValueCuts.size.toLong)) {
      case ((cut, i), rest) => when(valueCents(col("value")) < cut, lit(i.toLong)).otherwise(rest)
    }
    val nBins = PsiValueCuts.size + 1
    val cells = Caching.temp(events
      .select(floor(unix_millis(col("ts")) / WeekMs).cast("long").as("week"),
        bin.as("bin"))
      .groupBy(col("week"), col("bin")).agg(count(lit(1)).as("c")))
    val grid = cells.select(col("week")).distinct()
      .crossJoin(events.sparkSession.range(nBins).toDF("bin"))
    // `full` feeds three legs (tots, the reference week, the PSI
    // terms) — temp-cache the (weeks × bins)-bounded frame so the
    // grid join executes once per query, not once per leg (round 13)
    val full = graft.ops.Caching.temp(
      grid.join(cells, Seq("week", "bin"), "left")
        .select(col("week"), col("bin"), coalesce(col("c"), lit(0L)).as("c")))
    val tots = full.groupBy(col("week")).agg(sum(col("c")).as("tot"))
    val refWeek = full.agg(min(col("week")).as("rw"))
    val ref = full.crossJoin(broadcast(refWeek)).filter(col("week") === col("rw"))
      .select(col("bin"), col("c").as("rc"))
    val refTot = ref.agg(sum(col("rc")).as("rtot"))
    val p = (col("c") + 0.5) / (col("tot") + nBins * 0.5)
    val q = (col("rc") + 0.5) / (col("rtot") + nBins * 0.5)
    val terms = full
      .join(broadcast(tots), Seq("week"))
      .join(broadcast(ref), Seq("bin"))
      .crossJoin(broadcast(refTot))
      .select(col("week"), col("tot"), col("bin"),
        ((p - q) * log(p / q)).as("term"))
    terms.groupBy(col("week"))
      .agg(max(col("tot")).as("n_events"),
        Portable.round4(aggregate(
          transform(array_sort(collect_list(struct(col("bin"), col("term")))),
            s => s.getField("term")),
          lit(0.0), (acc, x) => acc + x)).as("psi"))
  }

  /** Minimum events for the x189 regularity screen (2+ gaps — enough
    * for a spread; the fixture's human-gap sessions top out at 4). */
  val BotMinEvents = 3
  /** Gap spread (ms) at or under which a session reads as machine-regular. */
  val BotJitterMs = 1000L

  /** x189: SESSION REGULARITY / BOT SCREEN — per session (≥
    * [[BotMinEvents]] events): inter-event gap min/max/variance and
    * the machine-regularity flag (gap spread ≤ [[BotJitterMs]] — a
    * human's gaps jitter by seconds, a poller's by milliseconds).
    * The standard abuse/quality filter run before any behavioral
    * metric; x16 summarizes sessions, this scores their RHYTHM.
    *
    * Determinism: gaps are exact integer ms under the (ms, event_id)
    * session order; the variance moment n·Σg²−(Σg)² is exact BIGINT
    * with one final 4dp double.
    *
    * Scale: one lag window riding the x16 sessionization shuffle, one
    * session-keyed aggregate — output is session-bounded. */
  def sessionRegularity(events: DataFrame): DataFrame = {
    val byS = Window.partitionBy(col("user_id"), col("session_seq"))
      .orderBy(col("ms"), col("event_id"))
    val gaps = sessionized(events)
      .withColumn("gap", col("ms") - lag(col("ms"), 1).over(byS))
      .filter(col("gap").isNotNull)
    gaps.groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_gaps"),
        min(col("gap")).as("gap_min"), max(col("gap")).as("gap_max"),
        sum(col("gap")).as("sg"), sum(col("gap") * col("gap")).as("sgg"))
      .filter(col("n_gaps") >= BotMinEvents - 1)
      .select(col("user_id"), col("session_seq"),
        (col("n_gaps") + 1).as("n_events"), col("gap_min"), col("gap_max"),
        Portable.round4((col("n_gaps") * col("sgg") - col("sg") * col("sg"))
          .cast("double") /
          (col("n_gaps") * col("n_gaps")).cast("double")).as("gap_var"),
        (col("gap_max") - col("gap_min") <= BotJitterMs).cast("long")
          .as("is_regular"))
  }

  /** x187: DIFFERENCE-IN-DIFFERENCES estimator — the quasi-
    * experimental companion to x155's A/B z-test: conversion rates
    * per (variant × pre/post) cell, the per-variant deltas, and the
    * DiD = ΔB − ΔA that nets out the common time trend (Card &
    * Krueger '94 shape). Periods split at the exact integer midpoint
    * of the corpus [min, max] ms; variants are x155's user-id parity;
    * conversion is x155's predicate (purchase ≥ its cents floor), all
    * per (user, period).
    *
    * Determinism: cells are exact distinct-user counts; each rate is
    * 4dp-rounded and the deltas/DiD are differences OF the rounded
    * rates — exact 1e-4-grid arithmetic in both engines.
    *
    * Scale: two distinct passes to (user, period) keys, a 4-cell
    * aggregate, the rest on broadcast scalars. */
  def diffInDiff(events: DataFrame): DataFrame = {
    val base = events.select(col("user_id"), col("event_type"),
      valueCents(col("value")).as("vc"), unix_millis(col("ts")).as("ms"))
    val span = base.agg(min(col("ms")).as("lo"), max(col("ms")).as("hi"))
      .select(expr("(lo + hi) div 2").as("mid"))
    val tagged = Caching.temp(base.crossJoin(broadcast(span))
      .withColumn("period", (col("ms") >= col("mid")).cast("long"))
      .withColumn("variant", pmod(col("user_id"), lit(2)).cast("long")))
    val users = tagged.select(col("variant"), col("period"), col("user_id"))
      .distinct()
      .groupBy(col("variant"), col("period")).agg(count(lit(1)).as("n"))
    val conv = tagged
      .filter(col("event_type") === AbConvType && col("vc") >= AbConvCents)
      .select(col("variant"), col("period"), col("user_id")).distinct()
      .groupBy(col("variant"), col("period")).agg(count(lit(1)).as("k"))
    val cells = users.join(conv, Seq("variant", "period"), "left")
      .select(col("variant"), col("period"), col("n"),
        coalesce(col("k"), lit(0L)).as("k"))
    def rate(v: Int, p: Int) = cells
      .filter(col("variant") === v && col("period") === p)
      .select(Portable.round4(col("k").cast("double") / col("n").cast("double"))
        .as(s"r_${if (v == 0) "a" else "b"}_${if (p == 0) "pre" else "post"}"))
    rate(0, 0).crossJoin(broadcast(rate(0, 1)))
      .crossJoin(broadcast(rate(1, 0))).crossJoin(broadcast(rate(1, 1)))
      .select(col("r_a_pre"), col("r_a_post"), col("r_b_pre"), col("r_b_post"),
        Portable.round4(col("r_a_post") - col("r_a_pre")).as("delta_a"),
        Portable.round4(col("r_b_post") - col("r_b_pre")).as("delta_b"),
        Portable.round4((col("r_b_post") - col("r_b_pre")) -
          (col("r_a_post") - col("r_a_pre"))).as("did"))
  }

  /** x182: EVENTUALLY-FOLLOWS relation — for every ordered type pair
    * (a, b): in how many sessions does SOME a-event precede SOME
    * b-event (van der Aalst's process-mining footprint matrix, the
    * any-distance complement of x171's adjacent-only transitions).
    * The diagonal a=b counts sessions where a RECURS (first(a) <
    * last(a) ⟺ ≥2 occurrences) — the rework signal.
    *
    * Determinism: precedence is first-position(a) < last-position(b)
    * under the per-session (ms, event_id) row_number — exact integers.
    *
    * Scale: positions ride the x16 sessionization shuffle; the span
    * table holds ≤\|type domain\| rows per session, so the per-session
    * span self-join fans out ≤\|types\|² per session — linear in
    * sessions; the final aggregate is the \|types\|² footprint. */
  def eventuallyFollows(events: DataFrame): DataFrame = {
    val bySession = Window.partitionBy(col("user_id"), col("session_seq"))
      .orderBy(col("ms"), col("event_id"))
    val pos = sessionized(events)
      .withColumn("pos", row_number().over(bySession).cast("long"))
    val spans = Caching.temp(pos
      .groupBy(col("user_id"), col("session_seq"), col("event_type"))
      .agg(min(col("pos")).as("first_pos"), max(col("pos")).as("last_pos")))
    val nSess = spans.select(col("user_id"), col("session_seq")).distinct()
      .agg(count(lit(1)).as("n_total"))
    spans.alias("a").join(spans.alias("b"),
        col("a.user_id") === col("b.user_id") &&
        col("a.session_seq") === col("b.session_seq") &&
        col("a.first_pos") < col("b.last_pos"))
      .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_sessions"))
      .crossJoin(broadcast(nSess))
      .select(col("type_a"), col("type_b"), col("n_sessions"),
        Portable.round4(col("n_sessions").cast("double") /
          col("n_total").cast("double")).as("support"))
  }

  /** x180: KAPLAN–MEIER SURVIVAL curve of days from first view to
    * first purchase — the survival-analysis estimator (Kaplan & Meier
    * '58) that handles CENSORING correctly where a naive conversion
    * rate can't: users who haven't purchased YET (still alive at the
    * corpus end) leave the risk set without counting as failures.
    * Cohort = users with ≥1 view; event = first purchase at-or-after
    * the first view; censor time = corpus end. One row per event/
    * censor day: risk set, events, censored, S(t).
    *
    * Determinism: S(t) = Π(1 − d/n) is evaluated as exp of the
    * RUNNING ln-sum over ascending day order — an ordered windowed
    * fold is the same left-to-right double sequence in both engines
    * (the §8.3 convention), and each ln argument is the same exact
    * rational-valued double. A day that exhausts its risk set drives
    * the ln-sum to −∞ and S to an exact 0.
    *
    * Scale: two corpus aggregates (per-user firsts → per-day counts);
    * everything after lives on the day-domain grid, and the running
    * window runs over that grid, not the corpus. */
  def kmSurvival(events: DataFrame): DataFrame = {
    val base = events.select(col("user_id"), col("event_type"),
      unix_millis(col("ts")).as("ms"))
    val horizon = base.agg(max(col("ms")).as("hms"))
    val perUser = base
      .groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "view", col("ms"))).as("vms"),
        min(when(col("event_type") === "purchase", col("ms"))).as("pms0"))
      .filter(col("vms").isNotNull)
      .crossJoin(broadcast(horizon))
      .select(col("user_id"), col("vms"),
        when(col("pms0") >= col("vms"), col("pms0")).as("pms"), col("hms"))
    val durations = perUser.select(
      when(col("pms").isNotNull,
        floor((col("pms") - col("vms")) / lit(DayMs)).cast("long"))
        .otherwise(floor((col("hms") - col("vms")) / lit(DayMs)).cast("long"))
        .as("t_day"),
      col("pms").isNotNull.cast("long").as("is_event"))
    val daily = durations.groupBy(col("t_day"))
      .agg(sum(col("is_event")).as("d_events"),
        (count(lit(1)) - sum(col("is_event"))).as("c_censored"))
    val nTot = daily.agg(sum(col("d_events") + col("c_censored")).as("n_all"))
    val wAsc = Window.orderBy(col("t_day"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.orderBy(col("t_day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // d = n_risk (the risk set exhausts) can only happen on the LAST
    // row — Σ(d+c) = n_all leaves nobody afterwards — and there
    // 1−d/n = 0: Spark's log(0) is NULL while DuckDB's errors, so that
    // row is guarded to an exact 0 and its ln term stays NULL (both
    // engines' window sum skips NULLs identically)
    val term = lit(1.0) - col("d_events").cast("double") / col("n_risk").cast("double")
    daily.crossJoin(broadcast(nTot))
      .withColumn("n_risk",
        col("n_all") - coalesce(sum(col("d_events") + col("c_censored")).over(wAsc), lit(0L)))
      .withColumn("lnS",
        sum(when(col("d_events") < col("n_risk"), log(term))).over(wRun))
      .select(col("t_day"), col("n_risk"), col("d_events"), col("c_censored"),
        when(col("d_events") === col("n_risk"), lit(0.0))
          .otherwise(Portable.round4(exp(coalesce(col("lnS"), lit(0.0)))))
          .as("survival"))
  }

  /** x232: BITMAP-INDEX DAU RETENTION — per day, the active-user set
    * packed into 64-bit WORDS (word w = users 64w..64w+63, one
    * `bit_or` aggregate), then next-day retention computed ENTIRELY in
    * word algebra: |A ∩ B| = Σ_w bit_count(word_A & word_B). This is
    * the roaring/bitmap-index technique every OLAP engine ships for
    * set rollups: at 100 TB the per-day set is |users|/64 words
    * instead of |users| rows, the day-pair join is keyed on the word
    * index (co-partitioned, no row-level shuffle of users), and
    * arbitrary set expressions (AND/OR/ANDNOT across day ranges)
    * stay one popcount away — where the row formulation re-shuffles
    * the full membership per pair. The DuckDB oracle deliberately
    * computes the SAME numbers from the naive row self-join: two
    * genuinely different algorithms meeting on exact integers. */
  def bitmapRetention(events: DataFrame): DataFrame = {
    // user_id ≥ 0 is a hard precondition of the word/bit packing
    // (arithmetic shiftright keeps the sign, so a negative id would
    // silently corrupt its word index); enforce it in the scan filter
    // — the oracle carries the same predicate (ADVICE r9)
    val active = Caching.temp(events
      .filter(col("user_id").isNotNull && col("user_id") >= 0)
      .select(to_date(col("ts")).as("day"),
        shiftright(col("user_id"), 6).as("w"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(user_id, 64) AS INT))")
          .as("bit"))
      .groupBy(col("day"), col("w"))
      .agg(expr("bit_or(bit)").as("word")))
    val dau = active.groupBy(col("day"))
      .agg(sum(bit_count(col("word")).cast("long")).as("dau"))
    val nxt = active.select(date_sub(col("day"), 1).as("day"),
      col("w"), col("word").as("word_next"))
    val retained = active.join(nxt, Seq("day", "w"))
      .groupBy(col("day"))
      .agg(sum(bit_count(col("word").bitwiseAND(col("word_next")))
        .cast("long")).as("retained"))
    dau.join(retained, Seq("day"), "left")
      .select(col("day").cast("string").as("day"), col("dau"),
        coalesce(col("retained"), lit(0L)).as("retained"),
        Portable.round4(coalesce(col("retained"), lit(0L)).cast("double") /
          col("dau").cast("double")).as("retention"))
  }
}
