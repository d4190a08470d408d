package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-level data profiling — beyond-reference track: the "describe
  * my table" pass every ingestion pipeline runs before trusting a new
  * dataset (row/null/distinct counts, numeric ranges).
  *
  * Scale design: ONE aggregation pass PER COLUMN, unioned — not one
  * wide aggregate with K `count(distinct …)`s, which Catalyst plans as
  * an Expand (K× the input rows through the shuffle: the classic
  * multi-distinct blowup). Per-column passes each prune the parquet
  * scan to a single column (columnar locality), distinct counts stay
  * exact, and the K scans parallelize trivially. For approximate
  * profiling at extreme scale swap `countDistinct` for
  * `approx_count_distinct` (HLL) — kept exact here for the oracle.
  */
object DataProfile {

  /** The numeric lineitem columns profiled by x58. */
  val NumericCols: Seq[String] = Seq(
    "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
    "l_extendedprice", "l_discount")

  /** x58: one row per profiled column: row count, null count, exact
    * distinct count, min/max as DOUBLE (exact for the fixture's
    * integer-valued and double columns). */
  def profileNumeric(df: DataFrame, cols: Seq[String] = NumericCols): DataFrame =
    cols.map { c =>
      df.select(
        lit(c).as("column"),
        count(lit(1)).as("n_rows"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).cast("double").as("min_v"),
        max(col(c)).cast("double").as("max_v"))
    }.reduce(_ unionByName _)

  /** x71 data-quality rules: (rule id, VIOLATION predicate). The
    * predicate is ANSI SQL text parsed by BOTH engines — Spark via
    * `expr(...)`, DuckDB verbatim in the oracle — one definition, zero
    * drift. A row where the predicate is NULL (null operand) counts as
    * clean in both engines (Spark `sum` skips NULL ≡ DuckDB
    * `CASE WHEN NULL → ELSE 0`). */
  val LineitemRules: Seq[(String, String)] = Seq(
    "li_quantity_range"   -> "NOT (l_quantity >= 1 AND l_quantity <= 50)",
    "li_discount_range"   -> "NOT (l_discount >= 0 AND l_discount <= 0.1)",
    "li_price_positive"   -> "NOT (l_extendedprice > 0)",
    "li_shipdate_nonnull" -> "l_shipdate IS NULL")

  val OrdersRules: Seq[(String, String)] = Seq(
    "ord_status_domain"  -> "o_orderstatus NOT IN ('O', 'F', 'P')",
    "ord_price_positive" -> "NOT (o_totalprice > 0)")

  /** x71: data-quality EXPECTATIONS report — the "assert before you
    * train on it" gate of an ingestion pipeline. One row per rule:
    * (rule_id, tbl, n_rows, n_violations). Scalar rules run as ONE
    * constant-width aggregate pass per table (every rule is a
    * `sum(CASE)` in the same agg — no per-rule scans); the referential
    * rule (every l_orderkey resolves in orders) is a key-projected
    * anti join — AQE broadcasts the key side when it fits, shuffled
    * otherwise, never a driver-side collect. */
  def expectations(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    def report(tbl: String, df: DataFrame, rules: Seq[(String, String)]): DataFrame =
      df.agg(count(lit(1)).as("n_rows"),
          rules.map { case (id, bad) =>
            sum(expr(bad).cast("long")).as(id)
          }: _*)
        .select(col("n_rows"), explode(array(rules.map { case (id, _) =>
          struct(lit(id).as("rule_id"), lit(tbl).as("tbl"),
            coalesce(col(id), lit(0L)).as("n_violations"))
        }: _*)).as("r"))
        .select(col("r.rule_id").as("rule_id"), col("r.tbl").as("tbl"),
          col("n_rows"), col("r.n_violations").as("n_violations"))
    val orphans = lineitem.select(col("l_orderkey"))
      .join(orders.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
    val refRule = lineitem.agg(count(lit(1)).as("n_rows"))
      .crossJoin(orphans.agg(count(lit(1)).as("n_violations")))
      .select(lit("li_orderkey_ref").as("rule_id"), lit("lineitem").as("tbl"),
        col("n_rows"), col("n_violations"))
    report("lineitem", lineitem, LineitemRules)
      .unionByName(report("orders", orders, OrdersRules))
      .unionByName(refRule)
  }

  /** The x69 feature columns with their fixed-point scales, chosen so
    * every Σx² stays far below 2⁶³ at bench scale (quantity in
    * hundredths ≤ 5e3, price in whole dollars ≤ 1e5, discount in
    * 1e-4 units ≤ 1e3): the moment sums are EXACT BIGINTs that
    * commute across partitions; floats enter only in the final 1-row
    * correlation formula, evaluated in one fixed order. */
  val CorrFeatures: Seq[(String, Long)] = Seq(
    ("l_quantity", 100L), ("l_extendedprice", 1L), ("l_discount", 10000L))

  /** x69: pairwise Pearson CORRELATION matrix over the fixed-point
    * features — the feature-selection pass of a training pipeline.
    * ONE aggregation pass accumulates all Σx, Σx², Σxy moments
    * (map-side combine; shuffle width = the constant number of
    * moments), then the 1-row result expands to one row per pair.
    * corr = (n·Σxy − Σx·Σy) / (√(n·Σx² − Σx²) · √(n·Σy² − Σy²)),
    * every term cast to DOUBLE before arithmetic, rounded 4dp. */
  def correlations(df: DataFrame): DataFrame = {
    val f = CorrFeatures.map { case (c, s) =>
      c -> floor(col(c) * s + 0.5).cast("long")
    }
    val moments = scala.collection.mutable.LinkedHashMap[String, Column]()
    f.foreach { case (c, e) => moments(s"s_$c") = sum(e) }
    f.combinations(2).foreach { case Seq((ca, ea), (cb, eb)) =>
      moments.getOrElseUpdate(s"ss_$ca$ca", sum(ea * ea))
      moments.getOrElseUpdate(s"ss_$cb$cb", sum(eb * eb))
      moments(s"ss_$ca$cb") = sum(ea * eb)
    }
    val agg = df.agg(count(lit(1)).as("n"),
      moments.map { case (nm, c) => c.as(nm) }.toSeq: _*)
    def corr(a: String, b: String) = {
      val n = col("n").cast("double")
      val num = n * col(s"ss_$a$b").cast("double") -
        col(s"s_$a").cast("double") * col(s"s_$b").cast("double")
      val dx = n * col(s"ss_$a$a").cast("double") -
        col(s"s_$a").cast("double") * col(s"s_$a").cast("double")
      val dy = n * col(s"ss_$b$b").cast("double") -
        col(s"s_$b").cast("double") * col(s"s_$b").cast("double")
      Portable.round4(num / (sqrt(dx) * sqrt(dy)))
    }
    agg.select(col("n"), explode(array(
      CorrFeatures.map(_._1).combinations(2).toSeq.map { case Seq(a, b) =>
        struct(lit(a).as("col_a"), lit(b).as("col_b"), corr(a, b).as("corr"))
      }: _*)).as("p"))
      .select(col("p.col_a").as("col_a"), col("p.col_b").as("col_b"),
        col("n"), col("p.corr").as("corr"))
  }

  /** Zone-map geometry for [[zoneMapAudit]]: one simulated file per
    * 90 days of ship date; the probe predicates are fixed, SF-free. */
  val ZoneFileMs: Long = 90L * 86400000L
  /** `l_shipdate >= 2000-01-01` — aligned with the clustering column. */
  val ShipCutoffMs: Long = 946684800000L
  /** `l_orderkey < 100` — NOT aligned with the clustering column. */
  val OkCutoff: Long = 100L

  /** x91: zone-map (min/max file statistics) audit — the data-skipping
    * primitive behind parquet row-group stats / Iceberg & Delta file
    * pruning. Files are simulated as 90-day ship-date ranges (a
    * date-clustered layout); per file the audit computes the zone map
    * over ship date AND order key, then evaluates two probe
    * predicates against the map:
    *  - `prune_ship`: the date predicate prunes cleanly BECAUSE the
    *    layout clusters on date (max_ship < cutoff ⇒ skip the file);
    *  - `prune_ok`: the same test on the UNclustered order key prunes
    *    ~nothing — min/max spans of a random column cover everything.
    * The contrast is the audit's point: skipping comes from layout,
    * not from collecting stats. At 100 TB this one-pass map is the
    * difference between touching 4 files and touching 4000.
    *
    * Scale: one hash aggregate keyed on |files| (~dozens); booleans
    * emitted as 0/1 BIGINT for cross-engine hashing. */
  def zoneMapAudit(lineitem: DataFrame): DataFrame =
    lineitem
      // parquet reads the date as TIMESTAMP_NTZ; the UTC session makes
      // the cast an identity on the instant (matches DuckDB epoch_ms)
      .select(unix_millis(col("l_shipdate").cast("timestamp")).as("ship_ms"),
        col("l_orderkey"))
      .groupBy(floor(col("ship_ms") / ZoneFileMs).cast("long").as("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("ship_ms")).as("min_ship_ms"), max(col("ship_ms")).as("max_ship_ms"),
        min(col("l_orderkey")).as("min_ok"), max(col("l_orderkey")).as("max_ok"))
      .select(col("file_id"), col("n_rows"),
        col("min_ship_ms"), col("max_ship_ms"), col("min_ok"), col("max_ok"),
        when(col("max_ship_ms") < ShipCutoffMs, 1L).otherwise(0L).as("prune_ship"),
        when(col("max_ok") < OkCutoff, 1L).otherwise(0L).as("prune_ok"))

  /** x93: join-cardinality estimation — the CBO statistic every
    * cost-based join reorder runs on: |L ⋈ R| ≈ |L|·|R| /
    * max(d(L.k), d(R.k)) (the standard uniform-containment formula),
    * emitted next to the ACTUAL join count so the estimate's error is
    * part of the result. Three 1-row aggregates cross-joined
    * (broadcast, no data shuffle beyond the stats passes themselves).
    * Distinct counts are exact here for the oracle; at 100 TB the
    * same statistic comes from the HLL register tables (x31/x65) —
    * the formula is sketch-agnostic. */
  def joinCardEst(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    val l = lineitem.agg(count(lit(1)).as("n_left"),
      countDistinct(col("l_orderkey")).as("d_left"))
    val r = orders.agg(count(lit(1)).as("n_right"),
      countDistinct(col("o_orderkey")).as("d_right"))
    val a = lineitem.select(col("l_orderkey"))
      .join(orders.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"))
      .agg(count(lit(1)).as("actual_rows"))
    l.crossJoin(r).crossJoin(a)
      .select(col("n_left"), col("d_left"), col("n_right"), col("d_right"),
        floor(col("n_left") * col("n_right") /
          greatest(col("d_left"), col("d_right"))).cast("long").as("est_rows"),
        col("actual_rows"))
  }

  /** x122 anonymity threshold: a quasi-identifier group under K rows
    * is re-identifiable. */
  val KAnonThreshold = 5

  /** x122: K-ANONYMITY audit over the customer quasi-identifiers
    * (nation, market segment, account balance rounded to a $1000
    * band) — the release-gate check a privacy review runs before a
    * table leaves the pipeline: every QI combination with its row
    * count and whether it clears k ≥ [[KAnonThreshold]]. The balance
    * goes through the integral-cents convention first, then floor
    * division, so the band edge is bit-identical in both engines.
    *
    * Scale: one hash aggregate keyed by the QI tuple; output is
    * bounded by the QI domain (|nations|×|segments|×|bands|), not the
    * row count. The k-flag is a projection on the aggregate. */
  def kAnonymity(customer: DataFrame, k: Int = KAnonThreshold): DataFrame =
    customer
      .select(col("c_nationkey").cast("long").as("nationkey"),
        col("c_mktsegment").as("mktsegment"),
        floor(floor(col("c_acctbal") * 100 + 0.5) / 100000.0)
          .cast("long").as("bal_band"))
      .groupBy(col("nationkey"), col("mktsegment"), col("bal_band"))
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("k_anonymous", col("n_rows") >= k)

  /** x261 diversity bar: a quasi-identifier group needs ≥ this many
    * distinct sensitive values. */
  val LDiversityL = 3

  /** x261: l-DIVERSITY AUDIT (Machanavajjhala et al. '07) — the check
    * k-anonymity (x122) famously misses: a group can be k-anonymous
    * yet expose its members because every row shares the SAME
    * sensitive value (the homogeneity attack). Quasi-identifiers are
    * x122's (nationkey, balance band) with mktsegment as the sensitive
    * attribute; each group reports its size, its distinct-sensitive
    * count and the ≥ [[LDiversityL]] verdict — release gating reads
    * BOTH audits.
    *
    * Scale: one hash aggregate to the QI grid (count + count distinct
    * — the distinct resolves map-side per group since mktsegment is
    * low-cardinality); grid-sized output. */
  def lDiversity(customer: DataFrame, l: Int = LDiversityL): DataFrame =
    customer
      .select(col("c_nationkey").cast("long").as("nationkey"),
        col("c_mktsegment").as("mktsegment"),
        floor(floor(col("c_acctbal") * 100 + 0.5) / 100000.0)
          .cast("long").as("bal_band"))
      .groupBy(col("nationkey"), col("bal_band"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("mktsegment")).as("n_sensitive"))
      .withColumn("l_diverse", col("n_sensitive") >= l)

  /** x135 privacy budget. */
  val DpEpsilon = 1.0

  /** x135: ε-DIFFERENTIALLY-PRIVATE COUNTS (Laplace mechanism,
    * sensitivity 1) over per-language doc counts — the other half of
    * the privacy surface next to the x122 k-anonymity audit: what a
    * pipeline RELEASES when exact counts would leak. The Laplace draw
    * is the textbook inverse-CDF transform noise = −(1/ε)·sign(u−½)·
    * ln(1−2|u−½|), with u a SEEDED uniform derived from md5 of the
    * group key — a fixed-seed PRNG, so both engines reproduce the
    * identical draw and the oracle can verify the mechanism's
    * arithmetic end-to-end. A production release would use a secret
    * seed and emit ONLY `noisy`; `n` and `noise` are kept here
    * because verifiability is this harness's contract.
    *
    * Scale: one hash aggregate; the noise is a projection on its
    * |languages|-row output. */
  def dpCounts(documents: DataFrame, epsilon: Double = DpEpsilon): DataFrame = {
    // 52-bit uniform in (0,1): (v+0.5)/2^52 with v the first 13 md5
    // hex digits — strictly inside the interval, so ln(1−2|u−½|) is
    // finite for every group
    val u = (conv(substring(md5(concat(lit("dp:"), col("lang"))), 1, 13), 16, 10)
      .cast("double") + 0.5) / lit(4503599627370496.0)
    val noise = -(lit(1.0) / epsilon) * signum(u - 0.5) *
      log(lit(1.0) - lit(2.0) * abs(u - 0.5))
    documents
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"))
      .select(col("lang"), col("n"),
        Portable.round4(noise).as("noise"),
        Portable.round4(col("n") + noise).as("noisy"))
  }

  /** x129: CHI-SQUARE ASSOCIATION between two categorical columns
    * (lang × source) — the independence check a dataset audit runs to
    * catch collection bias ("is language independent of crawl
    * source?"). One row per observed cell: the observed count, the
    * expected count under independence (row·col/N), and the cell's
    * χ² contribution (o−e)²/e. The statistic is the sum of the
    * contribs; emitting cells keeps the result deterministic (each
    * contrib is a single double expression over exact integers — no
    * order-dependent double summation) and shows WHERE the
    * association lives.
    *
    * Scale: ONE Expand pass ([[graft.ops.Events.groupingSetsMarginals]]
    * pattern) computes cells + both marginals + the total in a single
    * scan/shuffle; the three marginal frames are bounded by the
    * category domains and broadcast back onto the cells. */
  def chi2Assoc(documents: DataFrame): DataFrame = {
    val g = Caching.temp(documents
      .groupingSets(
        Seq(Seq(col("lang"), col("source")), Seq(col("lang")),
          Seq(col("source")), Seq()),
        col("lang"), col("source"))
      .agg(grouping_id().cast("long").as("gid"), count(lit(1)).as("n")))
    val cells = g.filter(col("gid") === 0).select(col("lang"), col("source"), col("n"))
    val rows  = g.filter(col("gid") === 1).select(col("lang"), col("n").as("row_n"))
    val cols  = g.filter(col("gid") === 2).select(col("source"), col("n").as("col_n"))
    val tot   = g.filter(col("gid") === 3).select(col("n").as("total"))
    val e = (col("row_n") * col("col_n")).cast("double") / col("total")
    cells.join(broadcast(rows), Seq("lang"))
      .join(broadcast(cols), Seq("source"))
      .crossJoin(broadcast(tot))
      .select(col("lang"), col("source"), col("n"),
        Portable.round4(e).as("expected"),
        Portable.round4((col("n") - e) * (col("n") - e) / e).as("contrib"))
  }

  // ---- x153 Kolmogorov–Smirnov drift between sources ---------------

  /** x153: two-sample KS STATISTIC between every source pair on the
    * document-length distribution — D = max_x |F_a(x) − F_b(x)|, the
    * distribution-free "did these two crawls draw from the same
    * population" screen (sharper than x138's binned PSI when the
    * interesting difference is a shift, not a reshape).
    *
    * Determinism: the sup runs over EXACT integers — F_a − F_b at x
    * is (cum_a·tot_b − cum_b·tot_a)/(tot_a·tot_b), and the shared
    * denominator makes the numerator an exact BIGINT argmax; the one
    * double is the final D, snapped to 1e-4. (cum·tot needs
    * tot_a·tot_b < 2⁶³ — fine until ~3·10⁹ docs per source; past
    * that the swap-in is pre-bucketed CDFs, which bounds the grid
    * too.)
    *
    * Scale: the corpus collapses in ONE hash aggregate to
    * (source × length) counts — bounded by the LENGTH DOMAIN, not the
    * row count; the dense (length × source) CDF grid crosses the
    * value spine with the BROADCAST source enum, attaches counts by a
    * keyed join (the counts frame is domain-sized — never broadcast),
    * then one per-source window; the
    * pair fan-out joins grid rows on the length key with the
    * |sources|-bounded per-key width. */
  def ksSourceDrift(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = Caching.temp(documents
      .groupBy(col("source"), col("n_chars").cast("long").as("x"))
      .agg(count(lit(1)).as("cnt")))
    val xs = c.select(col("x")).distinct()
    val srcs = c.select(col("source")).distinct()
    val wCum = Window.partitionBy(col("source")).orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the SOURCE spine broadcasts (an enum); the counts frame does NOT
    // — it scales with the length domain, so it joins the grid as a
    // plain keyed join on (source, x)
    // the cumulative grid feeds BOTH pairwise sides (a and b below) —
    // temp-cache it so the crossJoin+window subtree executes once per
    // query, not once per side (round 13; the window itself is the
    // expensive leg)
    val grid = Caching.temp(xs.crossJoin(broadcast(srcs))
      .join(c, Seq("source", "x"), "left")
      .select(col("source"), col("x"), coalesce(col("cnt"), lit(0L)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(wCum)))
    val tots = c.groupBy(col("source")).agg(sum(col("cnt")).as("tot"))
    val a = grid.join(broadcast(tots), Seq("source"))
      .select(col("source").as("source_a"), col("x"),
        col("cum").as("cum_a"), col("tot").as("tot_a"))
    val b = grid.join(broadcast(tots), Seq("source"))
      .select(col("source").as("source_b"), col("x"),
        col("cum").as("cum_b"), col("tot").as("tot_b"))
    a.join(b, Seq("x"))
      .filter(col("source_a") < col("source_b"))
      .select(col("source_a"), col("source_b"), col("tot_a"), col("tot_b"),
        abs(col("cum_a") * col("tot_b") - col("cum_b") * col("tot_a")).as("num"))
      .groupBy(col("source_a"), col("source_b"), col("tot_a"), col("tot_b"))
      .agg(max(col("num")).as("max_num"))
      .select(col("source_a"), col("source_b"), col("tot_a"), col("tot_b"),
        Portable.round4(col("max_num").cast("double") /
          (col("tot_a") * col("tot_b")).cast("double")).as("ks"))
  }

  // ---- x141 robust (median/MAD) outliers ---------------------------

  /** x141 fence: |x − median| > [[MadK]] · 1.4826 · MAD (the normal-
    * consistency constant, Hampel's rule of thumb). */
  val MadK = 3.0
  val MadConsistency = 1.4826

  /** x141: robust per-language length outliers — median and MAD of
    * `n_chars`, the Hampel fence, and how many docs fall outside it.
    * The mean/σ z-score (x44's shape) is itself dragged by the tail it
    * is hunting; median/MAD is the standard robust replacement for
    * long-tailed document lengths.
    *
    * Determinism: medians come from the exact interpolating
    * `percentile` (≡ DuckDB `quantile_cont`, the x28 precedent) —
    * over an integral column the result is integral or exactly .5, so
    * |x − med| is exact; the fence is snapped to the 1e-4 grid BEFORE
    * comparison (x124's convention), making the flag identical in
    * both engines.
    *
    * Scale: two exact-percentile aggregates keyed by lang (counts-map
    * size bounded by the distinct-length domain, not row count — the
    * x124 note; unbounded domains swap in the x40 rank sketch) with
    * the per-language stats broadcast back — three scans, no sort. */
  def madOutliers(documents: DataFrame): DataFrame = {
    val x = documents.select(col("lang"), col("n_chars").cast("long").as("x"))
    val med = x.groupBy(col("lang"))
      .agg(percentile(col("x"), lit(0.5)).as("med"))
    val dev = x.join(broadcast(med), Seq("lang"))
      .select(col("lang"), abs(col("x") - col("med")).as("adev"))
    val mad = dev.groupBy(col("lang"))
      .agg(percentile(col("adev"), lit(0.5)).as("mad"))
    val fence = Portable.round4(lit(MadK * MadConsistency) * col("mad"))
    dev.join(broadcast(med.join(mad, Seq("lang"))), Seq("lang"))
      .select(col("lang"), Portable.round4(col("med")).as("med"),
        Portable.round4(col("mad")).as("mad"), fence.as("fence"),
        when(col("adev") > fence, 1L).otherwise(0L).as("out"))
      .groupBy(col("lang"), col("med"), col("mad"), col("fence"))
      .agg(count(lit(1)).as("n"), sum(col("out")).as("n_outliers"))
  }

  /** x185: DATA-QUALITY CONTRACT SUITE — a Great-Expectations-style
    * assertion battery over the warehouse tables, emitted as one row
    * per check (name, violations, passed): referential integrity on
    * the three hot FK edges, key uniqueness, domain-range and
    * non-negativity checks. The standing CI gate every pipeline runs
    * before publishing a snapshot; x131's snapshot diff tells you
    * WHAT changed, this tells you whether the result still honors
    * the contract.
    *
    * Scale: each FK check is a LEFT ANTI join keyed on the FK (child
    * shuffles once, parent side broadcast/keyed as AQE sizes it);
    * uniqueness is a keyed aggregate; range checks are map-side
    * filters into 1-row counts. Each check prunes its scan to the
    * checked columns; the union is |checks|-sized. */
  def dqChecks(orders: DataFrame, lineitem: DataFrame, customer: DataFrame,
               part: DataFrame): DataFrame = {
    // NULL child keys are exempt from the FK checks on BOTH engines:
    // the oracle's `NOT IN` yields NULL (row not counted) on a NULL
    // FK, so the anti-join side filters them out explicitly — without
    // this the engines disagree on any dataset with NULL keys.
    val fkOrdersCust = orders.select(col("o_custkey"))
      .filter(col("o_custkey").isNotNull)
      .join(customer.select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("n"))
    val fkLineOrders = lineitem.select(col("l_orderkey"))
      .filter(col("l_orderkey").isNotNull)
      .join(orders.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n"))
    val fkLinePart = lineitem.select(col("l_partkey"))
      .filter(col("l_partkey").isNotNull)
      .join(part.select(col("p_partkey")),
        col("l_partkey") === col("p_partkey"), "left_anti")
      .agg(count(lit(1)).as("n"))
    val uniqPart = part.groupBy(col("p_partkey"))
      .agg(count(lit(1)).as("c")).filter(col("c") > 1)
      .agg(count(lit(1)).as("n"))
    val qtyPos = lineitem.filter(col("l_quantity") <= 0)
      .agg(count(lit(1)).as("n"))
    val priceNonneg = lineitem.filter(col("l_extendedprice") < 0)
      .agg(count(lit(1)).as("n"))
    val discRange = lineitem
      .filter(col("l_discount") < 0 || col("l_discount") > 0.5)
      .agg(count(lit(1)).as("n"))
    // compare as DATES on both sides — a timestamp-vs-date compare
    // would count 1998-12-31 23:00 as a violation here but not in the
    // oracle's CAST(… AS DATE) view
    val dateRange = orders
      .filter(to_date(col("o_orderdate")) < to_date(lit("1992-01-01")) ||
        to_date(col("o_orderdate")) > to_date(lit("1998-12-31")))
      .agg(count(lit(1)).as("n"))
    val checks = Seq(
      "fk_orders_custkey"   -> fkOrdersCust,
      "fk_lineitem_orderkey" -> fkLineOrders,
      "fk_lineitem_partkey" -> fkLinePart,
      "unique_part_partkey" -> uniqPart,
      "range_l_quantity_positive" -> qtyPos,
      "range_l_extendedprice_nonneg" -> priceNonneg,
      "range_l_discount_0_05" -> discRange,
      "range_o_orderdate_1992_1998" -> dateRange)
    checks.map { case (name, agg) =>
      agg.select(lit(name).as("check_name"), col("n").as("n_violations"),
        (col("n") === 0).cast("long").as("passed"))
    }.reduce(_.union(_))
  }

  /** The x186 measure set: exact integer views of the lineitem
    * numeric columns (cents / basis points). */
  private val CorrMeasures: Seq[(String, Column)] = Seq(
    "quantity"  -> col("l_quantity").cast("long"),
    "price_c"   -> floor(col("l_extendedprice") * 100 + 0.5).cast("long"),
    "discount_bp" -> floor(col("l_discount") * 10000 + 0.5).cast("long"),
    "tax_bp"    -> floor(col("l_tax") * 10000 + 0.5).cast("long"))

  /** x186: MEASURE CORRELATION MATRIX — pairwise Pearson between the
    * lineitem numeric measures in ONE corpus pass (all 14 moments in
    * a single map-side-combined aggregate; no per-pair rescans, no
    * Expand). The standard feature-profiling screen before modeling.
    *
    * Determinism: every measure is an exact integer (cents / basis
    * points), all moments accumulate in DECIMAL(38,0) (Σ price_c²
    * alone passes 2⁶³ near ~10⁸ rows), and each correlation is one
    * double expression over exact numbers, 4dp-rounded. */
  def measureCorrelation(lineitem: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    val ms = CorrMeasures
    val aggs =
      ms.map { case (n, c) => sum(c.cast(dec)).as(s"s_$n") } ++
      ms.map { case (n, c) => sum((c * c).cast(dec)).as(s"ss_$n") } ++
      ms.combinations(2).map { case Seq((na, ca), (nb, cb)) =>
        sum((ca * cb).cast(dec)).as(s"sp_${na}_$nb")
      }.toSeq
    // ONE corpus pass: the 1-row moment table is cached, the six pair
    // projections read it, not lineitem
    val m = Caching.temp(
      lineitem.agg(count(lit(1)).cast(dec).as("n"), aggs: _*))
    val pairs = ms.combinations(2).map { case Seq((na, _), (nb, _)) =>
      val cov  = col("n") * col(s"sp_${na}_$nb") - col(s"s_$na") * col(s"s_$nb")
      val va   = col("n") * col(s"ss_$na") - col(s"s_$na") * col(s"s_$na")
      val vb   = col("n") * col(s"ss_$nb") - col(s"s_$nb") * col(s"s_$nb")
      m.select(lit(na).as("var_a"), lit(nb).as("var_b"),
        when(va > 0 && vb > 0,
          Portable.round4(cov.cast("double") /
            (sqrt(va.cast("double")) * sqrt(vb.cast("double")))))
          .as("corr"))
    }.toSeq
    pairs.reduce(_.union(_))
  }

  /** Bootstrap replicates (B); CI bounds at 1-based sorted positions
    * [[BootLoIdx]]/[[BootHiIdx]] ≈ the 2.5/97.5 percentiles. */
  val BootReplicates = 40
  val BootLoIdx = 1
  val BootHiIdx = 40 - 1
  /** Poisson(1) CDF thresholds for the inverse-CDF draw (k = 0..8;
    * shared literals — BOTH engines compare against these exact
    * doubles, so every draw is identical). */
  val PoissonCdf: Seq[Double] = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
    0.999916758850712, 0.9999897508033253, 0.9999988694148251)

  /** x188: POISSON BOOTSTRAP confidence interval for the mean doc
    * length per source — the one-pass bootstrap that works at any
    * scale (Chamandy et al., Google '12): instead of B resamples of
    * the corpus, every row draws B independent Poisson(1) weights
    * (multinomial → Poisson approximation), so the whole procedure is
    * ONE map-side explode + one aggregate; no per-replicate shuffles,
    * no RNG state. CI = the 2.5/97.5-position replicate means.
    *
    * Determinism: the uniform behind each draw is the content-
    * addressed md5 of (doc_id, replicate) — the engine-independent
    * coin every sampler here flips — inverted through the SHARED
    * [[PoissonCdf]] literals; replicate means are exact-integer
    * Σw·x / Σw with one double each; the CI picks SORTED POSITIONS
    * (not interpolated percentiles, whose conventions differ across
    * engines).
    *
    * Scale: the explode is a B× map-side fan-out into a
    * (source × B)-key aggregate with map-side combine — the corpus
    * shuffles B·|sources| partial rows per task, not B corpora; the
    * per-source sort of B means is a 40-element array. */
  def bootstrapCi(documents: DataFrame): DataFrame = {
    val u = conv(substring(md5(concat(col("doc_id").cast("string"),
      lit(":"), col("b").cast("string"))), 1, 15), 16, 10)
      .cast("double") / lit(math.pow(2.0, 60))
    val w = PoissonCdf.zipWithIndex.foldRight(lit(PoissonCdf.size.toLong)) {
      case ((p, k), rest) => when(u < p, lit(k.toLong)).otherwise(rest)
    }
    val reps = documents.select(col("doc_id"), col("source"), col("n_chars"),
        explode(sequence(lit(0), lit(BootReplicates - 1))).as("b"))
      .select(col("source"), col("b"), w.as("w"), col("n_chars"))
      .groupBy(col("source"), col("b"))
      .agg(sum(col("w")).as("sw"), sum(col("w") * col("n_chars")).as("swx"))
      .filter(col("sw") > 0)
      .select(col("source"),
        (col("swx").cast("double") / col("sw").cast("double")).as("m"))
    // a tiny source can LOSE replicates (all-zero Poisson weights →
    // sw = 0 filtered): guard the position lookup, else ANSI
    // element_at throws past the array end
    val ci = reps.groupBy(col("source"))
      .agg(array_sort(collect_list(col("m"))).as("ms"))
      .select(col("source"),
        when(size(col("ms")) >= BootHiIdx,
          Portable.round4(element_at(col("ms"), BootLoIdx))).as("ci_lo"),
        when(size(col("ms")) >= BootHiIdx,
          Portable.round4(element_at(col("ms"), BootHiIdx))).as("ci_hi"))
    documents.groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        Portable.round4(sum(col("n_chars")).cast("double") /
          count(lit(1)).cast("double")).as("mean_chars"))
      .join(broadcast(ci), Seq("source"))
  }

  // ---- HyperLogLog distinct sketch (x230/x231) -----------------------

  /** HLL register count m = 2^8 — the 8 low hash bits pick the
    * register, the remaining 52 feed the rank. */
  val HllRegisters = 256
  /** 2^53 — the rank-sum fixed-point unit: Σ 2^(−M_j) is computed as
    * the exact BIGINT Σ 2^(53−M_j) (a float sum of 256 powers of two
    * spans > 53 bits and would round ORDER-DEPENDENTLY; the integer
    * sum commutes — the x51 grid convention applied to a sketch). */
  val HllUnit = 9007199254740992L
  /** Linear-counting switchover: 2.5 · m (Flajolet et al. '07). */
  val HllLinearCut = 640.0

  /** 60-bit md5 hash of the key's string form (the Dedup shingle
    * convention: `conv(hex,16,10)` ≡ `('0x'||hex)::BIGINT`). */
  private def hll60(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")

  /** Register index: the 8 low bits. */
  def hllReg(key: Column): Column = pmod(hll60(key), lit(HllRegisters.toLong))

  /** Rank ρ = leading zeros of the remaining 52-bit window + 1,
    * computed INTEGER-ONLY as 53 − bitlen(w) via `length(bin(w))`
    * (floor(log2) on doubles flips at powers of two). */
  def hllRank(key: Column): Column = {
    val w = shiftright(hll60(key), 8)
    when(w === 0, lit(53)).otherwise(lit(53) - length(bin(w)))
  }

  /** Finalize per-`keys` register rows (j, m) into the HLL estimate:
    * raw = α·m² / Σ 2^(−M_j) over ALL m registers (absent ⇒ M = 0),
    * linear counting below [[HllLinearCut]] when zero registers
    * remain. Every float is a single fixed expression over exact
    * integers — identical in both engines. */
  def hllFinalize(regs: DataFrame, keys: Seq[String]): DataFrame = {
    // every constant below derives from HllRegisters/HllUnit so the
    // register count has a single source of truth (ADVICE r9): the
    // doubles are bit-identical to the former literals (256² = 65536,
    // 2^53 exact in double), so estimates and hashes are unchanged
    val m = lit(HllRegisters.toDouble)
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / m)
    regs.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_present"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(53 - m AS INT))"))
          .as("s_present"))
      .withColumn("v_zero", lit(HllRegisters.toLong) - col("n_present"))
      .withColumn("stot", col("s_present") + col("v_zero") * lit(HllUnit))
      .withColumn("raw",
        alpha * lit(HllRegisters.toDouble * HllRegisters.toDouble) *
          lit(HllUnit.toDouble) / col("stot").cast("double"))
      .withColumn("hll_est", Portable.round4(
        when(col("raw") <= HllLinearCut && col("v_zero") > 0,
          m * log(m / col("v_zero").cast("double")))
          .otherwise(col("raw"))))
      .select((keys.map(col) :+ col("v_zero") :+ col("hll_est")): _*)
  }

  /** KMV sketch size (k minimum hash values kept per set). */
  val KmvK = 64
  /** The hash-space size as a double: 16^15 (the 60-bit md5 view). */
  val KmvSpace = 1152921504606846976.0

  /** x234: KMV (K-MINIMUM-VALUES) SET-OPERATION SKETCH — the sketch
    * family HLL (x230) cannot provide: per event-type PAIR, estimated
    * union size from the k-th smallest hash of the merged sketch
    * ((k−1)·|space|/h₍k₎, Bar-Yossef et al. '02), Jaccard from the
    * merged sketch's member overlap, and the intersection estimate
    * jaccard·union — each beside its exact audit value (the x8/x10
    * brute-baseline convention). Distinct-set algebra on sketches is
    * what powers audience-overlap / segment-intersection queries at
    * 100 TB: each set collapses to k BIGINTs (mergeable by min-k
    * union), the pair join is |pairs|·k rows — the exact legs here
    * are the audit, not the production path.
    *
    * Determinism: hashes are the 60-bit md5 view (exact BIGINT); the
    * k-th smallest and member overlaps are total-order selections;
    * the only floats are the two fixed-form estimates, 4dp-rounded. */
  def kmvSetOps(events: DataFrame): DataFrame = {
    val perType = Caching.temp(events.filter(col("user_id").isNotNull)
      .select(col("event_type"), col("user_id")).distinct()
      .select(col("event_type"), hll60(col("user_id")).as("h")))
    val wk = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("h").asc)
    val sk = Caching.temp(perType
      .withColumn("rn", row_number().over(wk))
      .filter(col("rn") <= KmvK)
      .select(col("event_type"), col("h")))
    val types = sk.select(col("event_type")).distinct()
    val tpairs = types.select(col("event_type").as("type_a"))
      .join(types.select(col("event_type").as("type_b")),
        col("type_a") < col("type_b"))
    // merged min-k sketch per pair: union of the two k-sets, keep the
    // k smallest DISTINCT hashes; overlap = merged members in both
    val merged = tpairs
      .join(sk.select(col("event_type").as("type_a"), col("h")), Seq("type_a"))
      .unionByName(tpairs
        .join(sk.select(col("event_type").as("type_b"), col("h")), Seq("type_b"))
        .select(col("type_a"), col("type_b"), col("h")))
      .select(col("type_a"), col("type_b"), col("h")).distinct()
    val wp = org.apache.spark.sql.expressions.Window
      .partitionBy(col("type_a"), col("type_b")).orderBy(col("h").asc)
    val mk = Caching.temp(merged
      .withColumn("rn", row_number().over(wp))
      .filter(col("rn") <= KmvK))
    val kth = mk.groupBy(col("type_a"), col("type_b"))
      .agg(max(col("h")).as("hk"), count(lit(1)).as("nk"))
    val inA = sk.select(col("event_type").as("type_a"), col("h"),
      lit(1L).as("in_a"))
    val inB = sk.select(col("event_type").as("type_b"), col("h"),
      lit(1L).as("in_b"))
    val overlap = mk
      .join(inA, Seq("type_a", "h"), "left")
      .join(inB, Seq("type_b", "h"), "left")
      .groupBy(col("type_a"), col("type_b"))
      .agg(sum(when(col("in_a") === 1 && col("in_b") === 1, 1L).otherwise(0L))
        .as("n_both"))
    // exact audit legs (distinct user sets, row formulation)
    val du = Caching.temp(events.filter(col("user_id").isNotNull)
      .select(col("event_type"), col("user_id")).distinct())
    val sizes = du.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val exInter = du.select(col("event_type").as("type_a"), col("user_id"))
      .join(du.select(col("event_type").as("type_b"), col("user_id")),
        Seq("user_id"))
      .filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("exact_inter"))
    // a sketch smaller than k (tiny set) is EXACT: hk is then the
    // largest member, and the estimator would bias — use nk itself
    val estU = when(col("nk") < KmvK, col("nk").cast("double"))
      .otherwise(lit((KmvK - 1).toDouble) * KmvSpace /
        col("hk").cast("double"))
    tpairs
      .join(sizes.select(col("event_type").as("type_a"), col("n").as("n_a")),
        Seq("type_a"))
      .join(sizes.select(col("event_type").as("type_b"), col("n").as("n_b")),
        Seq("type_b"))
      .join(kth, Seq("type_a", "type_b"))
      .join(overlap, Seq("type_a", "type_b"))
      .join(exInter, Seq("type_a", "type_b"), "left")
      .withColumn("kmv_union", Portable.round4(estU))
      .withColumn("jaccard_est", Portable.round4(
        col("n_both").cast("double") / col("nk").cast("double")))
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        (col("n_a") + col("n_b") -
          coalesce(col("exact_inter"), lit(0L))).as("exact_union"),
        coalesce(col("exact_inter"), lit(0L)).as("exact_inter"),
        col("kmv_union"), col("jaccard_est"),
        Portable.round4(col("jaccard_est") * col("kmv_union"))
          .as("kmv_inter"))
  }

  /** x239: SKETCH ROLLUP — the HLL register frame computed ONCE per
    * day and MERGED upward to the grand total by a register-max
    * aggregate, with exact audit legs at both levels. This is the
    * property that justifies sketches operationally: the total-level
    * distinct count comes from |days|·m tiny rows, NOT a rescan of
    * the raw data — at 100 TB that is the difference between a
    * metadata query and a full shuffle (and the same merge serves
    * cube/grouping-set rollups and cross-cluster unions). max is
    * associative/commutative, so the merged registers are exactly the
    * registers a direct global pass would build — the estimate is
    * identical by construction, and the oracle proves it by deriving
    * the total from ITS day registers too. */
  def hllRollup(events: DataFrame): DataFrame = {
    val ev = Caching.temp(events.filter(col("user_id").isNotNull)
      .select(to_date(col("ts")).cast("string").as("day"), col("user_id")))
    val regs = Caching.temp(ev
      .select(col("day"), hllReg(col("user_id")).as("j"),
        hllRank(col("user_id")).as("rho"))
      .groupBy(col("day"), col("j")).agg(max(col("rho")).as("m")))
    val dayEst = hllFinalize(regs, Seq("day"))
      .select(lit("day").as("level"), col("day").as("key"),
        col("v_zero"), col("hll_est"))
    val totEst = hllFinalize(
      regs.groupBy(col("j")).agg(max(col("m")).as("m"))
        .withColumn("lvl", lit("total")),
      Seq("lvl"))
      .select(lit("total").as("level"), lit("").as("key"),
        col("v_zero"), col("hll_est"))
    val dayExact = ev.groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("n_exact"))
      .select(lit("day").as("level"), col("day").as("key"), col("n_exact"))
    val totExact = ev.agg(countDistinct(col("user_id")).as("n_exact"))
      .select(lit("total").as("level"), lit("").as("key"), col("n_exact"))
    dayExact.unionByName(totExact)
      .join(dayEst.unionByName(totEst), Seq("level", "key"))
      .select(col("level"), col("key"), col("n_exact"), col("v_zero"),
        col("hll_est"),
        Portable.round4((col("hll_est") - col("n_exact").cast("double")) /
          col("n_exact").cast("double")).as("rel_err"))
  }

  /** x238 histogram bins; the audited percentiles are 50/90/99. */
  val HistBins = 128

  /** x238: MERGEABLE HISTOGRAM QUANTILE SKETCH with an exactness
    * audit — the fourth sketch family (counts → CMS x20, distinct →
    * HLL x230, set ops → KMV x234, ranks → this): per event type,
    * values binned into [[HistBins]] fixed global-range buckets (one
    * hash aggregate — the sketch merges across partitions/days by
    * bin-sum, which is why engines ship t-digest/KLL instead of exact
    * percentile at scale), percentile estimated as the right edge of
    * the first bin whose cumulative count reaches ⌈p·n⌉, beside the
    * EXACT rank-selected value. The audit row is the bin-resolution
    * error made visible — the x190 convention for every approximate
    * structure in this repo.
    *
    * Determinism: global min/max are exact column extrema; the bin
    * index, cumulative ranks and selections are integer; estimates
    * are one fixed float expression, 4dp-rounded. */
  def histQuantiles(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vals = Caching.temp(events
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("value").cast("double").as("v")))
    val ext = broadcast(vals.agg(min(col("v")).as("lo"), max(col("v")).as("hi")))
    val binned = vals.crossJoin(ext)
      .select(col("event_type"),
        // hi = lo guard (ADVICE r9): on a constant-valued column the
        // bin expression is 0/0 (NaN), and Spark's NaN→int cast (0)
        // would diverge from DuckDB's NULL-propagating least(); pin
        // both engines to bin 0 explicitly (the oracle carries the
        // same CASE)
        when(col("hi") === col("lo"), lit(0)).otherwise(
          least(lit(HistBins - 1), floor((col("v") - col("lo")) /
            (col("hi") - col("lo")) * HistBins).cast("int"))).as("bin"))
      .groupBy(col("event_type"), col("bin")).agg(count(lit(1)).as("c"))
    val wb = Window.partitionBy(col("event_type")).orderBy(col("bin").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wn = Window.partitionBy(col("event_type"))
    val cum = binned
      .withColumn("cum", sum(col("c")).over(wb))
      .withColumn("n", sum(col("c")).over(wn))
    def rank(p: Double): Column =
      greatest(lit(1L), ceil(lit(p) * col("n")).cast("long"))
    val estBins = cum.groupBy(col("event_type"))
      .agg(max(col("n")).as("n"),
        min(when(col("cum") >= rank(0.5), col("bin"))).as("b50"),
        min(when(col("cum") >= rank(0.9), col("bin"))).as("b90"),
        min(when(col("cum") >= rank(0.99), col("bin"))).as("b99"))
    val wr = Window.partitionBy(col("event_type")).orderBy(col("v").asc)
    val exact = vals
      .withColumn("rn", row_number().over(wr))
      .withColumn("n", count(lit(1)).over(wn))
      .groupBy(col("event_type"))
      .agg(
        max(when(col("rn") === rank(0.5), col("v"))).as("p50_exact"),
        max(when(col("rn") === rank(0.9), col("v"))).as("p90_exact"),
        max(when(col("rn") === rank(0.99), col("v"))).as("p99_exact"))
    def edge(bin: Column): Column = Portable.round4(
      col("lo") + (bin + 1).cast("double") * (col("hi") - col("lo")) / HistBins)
    exact.join(estBins, Seq("event_type")).crossJoin(ext)
      .select(col("event_type"), col("n"),
        Portable.round4(col("p50_exact")).as("p50_exact"),
        edge(col("b50")).as("p50_est"),
        Portable.round4(col("p90_exact")).as("p90_exact"),
        edge(col("b90")).as("p90_est"),
        Portable.round4(col("p99_exact")).as("p99_exact"),
        edge(col("b99")).as("p99_est"))
  }

  /** x230: HYPERLOGLOG DISTINCT-USER SKETCH with an exactness audit —
    * per event type, the m = [[HllRegisters]] register sketch beside
    * the exact distinct count and the relative error. The register
    * aggregate is the whole distributed story: at 100 TB a distinct
    * count is a full shuffle of every key, while the sketch is a
    * 256-row MERGEABLE max-aggregate (map-side combine collapses each
    * partition to ≤ m rows; unions/windows/streams merge by register
    * max — see x231 for the streaming face). Exact leg kept for the
    * audit, the x8/x10 brute-baseline convention.
    *
    * Determinism: md5-derived registers, integer ranks, the fixed-
    * point rank sum ([[HllUnit]]), and 4dp-rounded estimates — both
    * engines land on the same grid point, so even the ESTIMATE is
    * hash-checkable, not just bounded. */
  def hllDistinctUsers(events: DataFrame): DataFrame = {
    val ev = Caching.temp(events.filter(col("user_id").isNotNull)
      .select(col("event_type"), col("user_id")))
    val regs = ev
      .select(col("event_type"), hllReg(col("user_id")).as("j"),
        hllRank(col("user_id")).as("rho"))
      .groupBy(col("event_type"), col("j")).agg(max(col("rho")).as("m"))
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_exact"))
    exact.join(hllFinalize(regs, Seq("event_type")), Seq("event_type"))
      .select(col("event_type"), col("n_exact"), col("v_zero"), col("hll_est"),
        Portable.round4((col("hll_est") - col("n_exact").cast("double")) /
          col("n_exact").cast("double")).as("rel_err"))
  }
}
