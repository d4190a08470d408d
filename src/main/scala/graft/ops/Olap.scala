package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** OLAP reshaping surface over the relational tables — UNPIVOT (melt)
  * and CUBE grouping sets. Beyond-reference track: the wide→long
  * reshape and the all-margins aggregate every BI/feature-audit layer
  * runs; the reference's pandas analog is `DataFrame.melt` /
  * `pivot_table(margins=True)`.
  *
  * All measures go through fixed-point scaling (cents / basis points)
  * so every sum is an exact BIGINT in both engines — the shared
  * [[MeltCols]] constants feed the Spark plan AND the DuckDB oracle
  * ([[graft.pipelines.ExtSql]]) so they cannot drift.
  */
object Olap {

  /** x70 measure columns with fixed-point scales (quantity/price in
    * hundredths, rates in basis points — Σ stays ≪ 2⁶³ at any SF). */
  val MeltCols: Seq[(String, Long)] = Seq(
    ("l_quantity", 100L), ("l_extendedprice", 100L),
    ("l_discount", 10000L), ("l_tax", 10000L))

  /** x70: melt the lineitem measure columns to long format
    * (metric, v) and profile each measure in one grouped pass.
    *
    * Scale: `unpivot` is a map-side Expand — K output rows per input
    * row, NO shuffle of the wide table; the aggregate partials reduce
    * to K=4 groups per task before the (4-row) shuffle. The scan
    * prunes to exactly the 4 measure columns. This is the cheap
    * direction of reshape — contrast the pivot in
    * [[Events.hourlyPivot]] which documents the grouped wide-out path.
    */
  def meltStats(lineitem: DataFrame): DataFrame = {
    val fixed = lineitem.select(MeltCols.map { case (c, s) =>
      floor(col(c) * s + 0.5).cast("long").as(c)
    }: _*)
    fixed
      .unpivot(Array.empty[Column], MeltCols.map(c => col(c._1)).toArray, "metric", "v")
      .groupBy(col("metric"))
      .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_v"),
        min(col("v")).as("min_v"), max(col("v")).as("max_v"))
  }

  /** x72: CUBE over (order priority × order year) — all four grouping
    * sets (detail, by-priority, by-year, grand total) in ONE pass.
    * `gid` is the standard grouping id (bit per column, first column
    * is the high bit — identical convention in Spark `grouping_id()`
    * and DuckDB `GROUPING(pri, yr)`), so consumers can split margins
    * from detail rows without null-sentinel ambiguity.
    *
    * Scale: CUBE plans as Expand(×4) feeding one hash aggregate with
    * map-side partials — the shuffle carries |priorities|·|years|-ish
    * groups, not 4× the fact rows. At 100 TB this beats four separate
    * aggregation passes 4:1 on scan cost. */
  def cubeSales(orders: DataFrame): DataFrame =
    orders
      .select(col("o_orderpriority").as("pri"),
        year(col("o_orderdate")).cast("long").as("yr"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
      .cube(col("pri"), col("yr"))
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n_orders"), sum(col("cents")).as("total_cents"))

  /** x81: star-schema revenue rollup (TPC-H Q5 shape) — lineitem ⋈
    * orders ⋈ customer ⋈ nation ⋈ region, revenue per (region,
    * nation). Revenue is fixed-point cents of
    * `extendedprice·(1−discount)` so the Σ is an exact BIGINT.
    *
    * Scale: the two SF-scaling joins (lineitem⋈orders on the order
    * key, ⋈customer on the customer key) carry NO hints — AQE
    * broadcasts them at small SF and shuffles them at large SF (the
    * r1-verdict lesson: a hinted broadcast of a scaling side is a
    * hard 8 GB failure, not a slowdown). nation/region are genuinely
    * bounded dims (≤ dozens of rows at ANY SF) and are the only
    * hinted sides. Aggregation is partial → final on a
    * |nation|-sized key space, so the final shuffle is tiny. */
  def starRevenue(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
                  nation: DataFrame, region: DataFrame): DataFrame = {
    val cents = floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100 + 0.5)
      .cast("long").as("cents")
    lineitem.select(col("l_orderkey"), cents)
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"), col("n_regionkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region.select(col("r_regionkey"), col("r_name"))),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_items"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        sum(col("cents")).as("revenue_cents"))
  }

  /** Morton key space for [[zorderLayout]]: both dims folded mod 2¹⁰,
    * buckets are the top 8 bits of the 20-bit Z value. */
  val ZDimBits = 10
  val ZBucketShift = 12

  /** x85: Z-order clustering-key layout audit — Morton-interleave the
    * (part, supplier) keys ([[graft.functions.ZOrder2]], native
    * codegen) and profile each Z-range bucket: row count, Z extent,
    * and per-dimension key spread. This is the layout primitive
    * behind `OPTIMIZE ZORDER BY`: writing files by `zbucket` gives a
    * 100 TB table whose 2-D predicate scans (part range × supplier
    * range) touch O(√files) instead of all of them; the spread
    * columns are exactly the locality evidence a layout job reports.
    *
    * Scale: one map-side projection (branch-free bit math inside
    * whole-stage codegen) + one hash aggregate on 256 buckets. */
  // ---- x119 small-file compaction plan -----------------------------

  /** Bin capacity for [[compactionPlan]], in proxy bytes. */
  val CompactTargetBytes = 65536L
  /** Synthetic file count per (returnflag, linestatus) partition. */
  val CompactFilesPerPart = 40L

  /** x119: the small-files compaction planner (the OPTIMIZE /
    * bin-packing step every lakehouse runs; at 100 TB the "millions of
    * tiny files" problem is a metadata-and-open-cost killer, and the
    * fix is exactly this plan executed as one rewrite job). The file
    * inventory is synthesized deterministically from lineitem — files
    * keyed by (l_returnflag, l_linestatus, l_orderkey mod 40) with a
    * skewed integer size proxy — then each partition's files are
    * packed size-ordered into [[CompactTargetBytes]] bins by
    * cumulative offset: bin = floor(bytes-before / target). Files
    * larger than the target land alone in their own bin (compaction
    * no-op), exactly like the real planner. One hash aggregate to the
    * inventory + per-partition windows — the plan frame is
    * |partitions|·40 rows regardless of corpus size. All integer
    * arithmetic. */
  def compactionPlan(lineitem: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val inv = lineitem
      .select(col("l_returnflag"), col("l_linestatus"),
        pmod(col("l_orderkey"), lit(CompactFilesPerPart)).as("file_id"),
        ((pmod(col("l_orderkey"), lit(97L)) + 16L) * 8L).as("row_bytes"))
      .groupBy(col("l_returnflag"), col("l_linestatus"), col("file_id"))
      .agg(count(lit(1)).as("n_rows"), sum(col("row_bytes")).as("size_bytes"))
    val w = Window.partitionBy(col("l_returnflag"), col("l_linestatus"))
      .orderBy(col("size_bytes").asc, col("file_id").asc)
    inv
      .withColumn("cum_before",
        coalesce(sum(col("size_bytes")).over(w) - col("size_bytes"), lit(0L)))
      .withColumn("bin", expr(s"cum_before div $CompactTargetBytes"))
      .select(col("l_returnflag"), col("l_linestatus"), col("file_id"),
        col("n_rows"), col("size_bytes"), col("bin"))
  }

  def zorderLayout(lineitem: DataFrame): DataFrame = {
    val spark = lineitem.sparkSession
    graft.functions.ZOrder2.register(spark)
    val dim = lit(1L << ZDimBits)
    val z = graft.functions.ZOrder2.zorder(
      pmod(col("l_partkey"), dim), pmod(col("l_suppkey"), dim))
    lineitem
      .select(col("l_partkey"), z.as("z"))
      .groupBy(shiftright(col("z"), ZBucketShift).as("zbucket"))
      .agg(count(lit(1)).as("n_items"),
        min(col("z")).as("min_z"), max(col("z")).as("max_z"),
        // ONE distinct column: a second would Expand the pre-shuffle
        // rows 3x (grouping-sets rewrite) for marginal audit value
        countDistinct(col("l_partkey")).as("n_parts"))
  }

  /** x134 probe segment. */
  val BloomJoinSegment = "BUILDING"

  /** x134: BLOOM-PRUNED JOIN — the runtime-filter pattern made
    * explicit: the dimension subset's join keys build a bounded
    * [[graft.functions.BloomFilter]] (4096 bits, ~128 packed words),
    * the filter rides to every fact row as ONE broadcast map row (the
    * broadcast-scalar pattern — never a driver collect), and a
    * map-side membership predicate drops bloom-negative fact rows
    * BEFORE the exact join. The exact join then clears the (few,
    * deterministic) false positives, so the RESULT equals the plain
    * join — what changes is how many fact rows pay the shuffle/build.
    * This is what Spark's own `spark.sql.optimizer.runtimeFilter.
    * bloomFilter` does inside AQE; spelled out as an operator it works
    * on any engine version and any predicate the planner can't see.
    *
    * Scale: the filter is O(1) — size is [[graft.functions.
    * BloomFilter.Bits]], independent of dimension cardinality; the
    * probe is 3 md5s per fact row, map-side, codegen'd; at ~1/|segments|
    * dim selectivity the pruned fact side shrinks the exact join's
    * input by the same factor. */
  def bloomPrunedJoin(orders: DataFrame, customer: DataFrame): DataFrame = {
    import graft.functions.BloomFilter
    val dims = customer.filter(col("c_mktsegment") === BloomJoinSegment)
      .select(col("c_custkey"))
    val packed = BloomFilter.build(dims.select(col("c_custkey").cast("string").as("k")), "k")
      .agg(map_from_entries(collect_list(struct(col("word_idx"), col("bits"))))
        .as("wmap"))
    val hit = forall(
      BloomFilter.positions(col("o_custkey").cast("string")),
      p => coalesce(element_at(col("wmap"), (p / BloomFilter.WordBits).cast("long")),
          lit(0L))
        .bitwiseAND(call_function("shiftleft", lit(1L),
          pmod(p, lit(BloomFilter.WordBits.toLong)))) =!= 0)
    orders
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
      .crossJoin(broadcast(packed))
      .filter(hit)
      // dims scales with SF — no broadcast hint (the r1 lesson); AQE
      // picks broadcast at small SF, shuffle join at large, and either
      // way the bloom has already shrunk the fact side
      .join(dims, col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("total_cents"))
  }

  // ---- x160 banded range join --------------------------------------

  /** x160 irregular band edges (cents, half-open [lo, hi)) and the
    * fixed bucket width the intervals shred into. */
  val RangeBreaks: Seq[Long] = Seq(0L, 300L, 1000L, 3100L, 10000L, 20000L, 40000L)
  val RangeBucketW = 2000L

  /** x160: BANDED RANGE JOIN — point-in-interval lookup of each
    * event's cent value against an IRREGULAR band dimension, executed
    * as an equi-join: every interval is shredded into the fixed-width
    * buckets it overlaps, the fact side computes its bucket with one
    * division, and the residual lo ≤ v < hi predicate filters the
    * ≤ 2-candidate fan-out. This is THE standard distributed answer
    * to range joins (Spark would otherwise plan a broadcast
    * nested-loop): shuffle stays keyed, work is linear, and the
    * explode factor is interval-width/bucket-width, bounded by the
    * dimension's construction. Unmatched points land on band −1
    * (left join), so the aggregate is total.
    *
    * x124/x80 bucket by QUANTILES of the data; this op's contract is
    * an EXTERNAL interval table (rate cards, SLA tiers, IP ranges) —
    * the case where the join, not the histogram, is the problem. */
  def bandedRangeJoin(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val dim = RangeBreaks.init.zip(RangeBreaks.tail).zipWithIndex
      .map { case ((lo, hi), b) => (lo, hi, b.toLong) }
      .toDF("lo", "hi", "band")
      .select(col("lo"), col("hi"), col("band"),
        explode(sequence(floor(col("lo") / RangeBucketW).cast("long"),
          floor((col("hi") - 1) / RangeBucketW).cast("long"))).as("bucket"))
    val ev = events
      .select(graft.ops.Events.valueCents(col("value")).as("cents"))
      .withColumn("bucket", floor(col("cents") / RangeBucketW).cast("long"))
    ev.join(broadcast(dim),
        ev("bucket") === dim("bucket") &&
          ev("cents") >= dim("lo") && ev("cents") < dim("hi"),
        "left")
      .groupBy(coalesce(col("band"), lit(-1L)).as("band"))
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("value_cents"))
  }

  // ---- x148 Benford first-digit audit ------------------------------

  /** x148: BENFORD'S-LAW audit of order totals — the distribution of
    * first significant digits of `o_totalprice` (in integral cents)
    * against the log₁₀(1 + 1/d) expectation. The standard forensic
    * screen for fabricated or truncated monetary data; a synthetic
    * uniform generator fails it loudly, which is itself the read.
    *
    * Determinism: the digit comes from the CENTS STRING (first char of
    * the BIGINT's decimal form) — pure integer/string ops, no
    * log-of-double digit extraction to disagree at a boundary; doubles
    * appear only in the 9-row share/expectation arithmetic, snapped to
    * 1e-4.
    *
    * Scale: one map-only projection + a 9-group hash aggregate
    * (partial aggregation collapses each split to ≤9 rows before the
    * shuffle); the total joins back by broadcast. */
  def benfordAudit(orders: DataFrame): DataFrame = {
    val cents = floor(col("o_totalprice") * 100 + 0.5).cast("long")
    val g = orders
      .select(substring(cents.cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val tot = g.agg(sum(col("n")).as("tot"))
    val share = col("n").cast("double") / col("tot").cast("double")
    val expected = log10(lit(1.0) + lit(1.0) / col("digit").cast("double"))
    g.crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        Portable.round4(share).as("share"),
        Portable.round4(expected).as("expected"),
        Portable.round4(abs(share - expected)).as("abs_dev"))
  }

  /** RFM tile count (quartiles). */
  val RfmTiles = 4

  /** x167: RFM SEGMENTATION — the classic customer-value banding
    * (recency / frequency / monetary, each cut into quartiles) every
    * marketing warehouse derives from the order log. Metrics per
    * customer: days since their last order (relative to the corpus
    * max order date), order count, lifetime spend in exact cents.
    *
    * Scale: one hash aggregate over orders (shuffles keys+3 partials,
    * map-side combined), then ONE two-phase range-partitioned rank
    * ([[Ranking.globalRowNumber]]) over the MELTED (customer, metric)
    * frame — NTILE over an unpartitioned window would sort every
    * customer through one partition; three separate rank passes (the
    * r5 shape) were scale-SAFE but stage-scheduling-bound (~15 stages
    * for 3×|customers| rows). The melt concatenates the three metric
    * orders into one total order (metric_idx, sort_val, custkey);
    * because each metric block holds EXACTLY n rows, the per-metric
    * rank is global_rank − metric_idx·n — one range shuffle instead
    * of three, then one custkey-keyed pivot aggregate that lands on
    * the same hash partitioning the base aggregate already produced.
    * tile = floor((rank−1)·T / n) + 1, the identical closed form in
    * the oracle (NTILE itself is avoided in BOTH engines: its
    * uneven-remainder group sizing differs from the closed form, so
    * the formula is the cross-engine contract). Rank order carries
    * (metric_idx, value, custkey) so ties are total and identical to
    * the per-metric (value, custkey) order. The customer count n is a
    * 1-row aggregate broadcast via crossJoin. */
  def rfm(orders: DataFrame): DataFrame = {
    // ONE orders scan: recency derives from the per-customer max date
    // and the GLOBAL max is a tiny aggregate over the customer frame
    // (max of per-customer maxes), not a second pass over orders
    val base = Caching.temp(orders
      .groupBy(col("o_custkey").as("custkey"))
      .agg(
        max(col("o_orderdate")).as("last_d"),
        count(lit(1)).as("freq"),
        sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("mon_cents")))
    val stats = base.agg(max(col("last_d")).as("max_d"), count(lit(1)).as("n"))
    // melt: metric 0 = recency (asc), 1 = frequency, 2 = monetary —
    // descending metrics sort by the negated value (range partitioning
    // orders by the column values themselves); n rides along so the
    // tile projection needs no second broadcast
    val melted = base.crossJoin(broadcast(stats))
      .select(col("custkey"), col("n"), explode(array(
        struct(lit(0L).as("mi"),
          datediff(col("max_d"), col("last_d")).cast("long").as("sv")),
        struct(lit(1L).as("mi"), (-col("freq")).as("sv")),
        struct(lit(2L).as("mi"), (-col("mon_cents")).as("sv")))).as("e"))
      .select(col("custkey"), col("n"), col("e.mi").as("mi"), col("e.sv").as("sv"))
    val ranked = Ranking.globalRowNumber(
      melted, Seq(col("mi"), col("sv"), col("custkey")), "gr")
    def tile(rank: Column): Column =
      (floor((rank - 1) * RfmTiles / col("n")) + 1).cast("long")
    // the pivot reconstructs the metric VALUES from the melted rows
    // (sv is the metric, negated where descending), so no join back to
    // base is needed — the rank pass + one pivot aggregate IS the query
    ranked
      .select(col("custkey"), col("mi"), col("sv"),
        tile(col("gr") - col("mi") * col("n")).as("t"))
      .groupBy(col("custkey"))
      .agg(max(when(col("mi") === 0, col("sv"))).as("rec_days"),
        max(when(col("mi") === 1, -col("sv"))).as("freq"),
        max(when(col("mi") === 2, -col("sv"))).as("mon_cents"),
        max(when(col("mi") === 0, col("t"))).as("r_tile"),
        max(when(col("mi") === 1, col("t"))).as("f_tile"),
        max(when(col("mi") === 2, col("t"))).as("m_tile"))
      .select(col("custkey"), col("rec_days"), col("freq"), col("mon_cents"),
        col("r_tile"), col("f_tile"), col("m_tile"),
        concat(col("r_tile").cast("string"), col("f_tile").cast("string"),
          col("m_tile").cast("string")).as("segment"))
  }

  /** x168: MARKET-BASKET brand affinity — support / confidence / lift
    * for every brand pair that co-occurs in an order (the association
    * screen behind "frequently bought together"). Counts are over
    * DISTINCT (order, brand): an order with three lines of Brand#3
    * contributes one basket membership.
    *
    * Scale: lineitem⋈part is a keyed shuffle join (part scales with
    * SF — deliberately unhinted; AQE may still broadcast at small
    * SF), then the pair generation is a self-join on l_orderkey whose
    * per-order fan-out is bounded by the order's line count (≤ B·(B−1)/2
    * with B ≤ the brand domain, 25) — linear in orders, never
    * all-pairs across orders. The singles table is brand-domain-sized
    * and broadcast onto both legs of each pair. */
  /** Per-order sorted distinct brand sets — the shared one-shuffle
    * input of x168 and x175 (collect_set dedups duplicate brand
    * lines; the array is bounded by the 25-brand domain). Public so
    * the frame can be built once per (session, dir) and fed to both
    * consumers via the `From` variants (VERDICT r9 mid-tail ask). */
  def brandBaskets(lineitem: DataFrame, part: DataFrame): DataFrame =
    lineitem.select(col("l_orderkey"), col("l_partkey"))
      .join(part.select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("p_brand"))).as("bs"))

  /** The i<j pair fan-out of a basket frame — map-side explode, one
    * row per unordered pair with a < b in array (= lexical) order. */
  private def basketPairs(baskets: DataFrame): DataFrame = baskets
    .select(explode(flatten(transform(col("bs"), (x, i) =>
      transform(slice(col("bs"), i + 2, size(col("bs"))),
        y => struct(x.as("a"), y.as("b")))))).as("p"))

  def basketLift(lineitem: DataFrame, part: DataFrame): DataFrame =
    basketLiftFrom(Caching.temp(brandBaskets(lineitem, part)))

  /** [[basketLift]] over a pre-built (and ideally memo-shared with
    * x175) basket frame. */
  def basketLiftFrom(baskets: DataFrame): DataFrame = {
    // ONE wide shuffle: straight to per-order sorted brand SETS, then
    // singles and the i<j pair fan-out are map-side explodes of the
    // ≤25-element array — the r5 rewrite replacing a distinct +
    // self-join + pair-aggregate chain (three corpus shuffles)
    val nOrders = baskets.agg(count(lit(1)).as("n_orders"))
    val singles = baskets.select(explode(col("bs")).as("p_brand"))
      .groupBy(col("p_brand")).agg(count(lit(1)).as("n_single"))
    val pairs = basketPairs(baskets)
      .groupBy(col("p.a").as("brand_a"), col("p.b").as("brand_b"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(broadcast(singles.select(col("p_brand").as("brand_a"), col("n_single").as("n_a"))), Seq("brand_a"))
      .join(broadcast(singles.select(col("p_brand").as("brand_b"), col("n_single").as("n_b"))), Seq("brand_b"))
      .crossJoin(broadcast(nOrders))
      .select(col("brand_a"), col("brand_b"), col("n_ab"),
        Portable.round4(col("n_ab").cast("double") / col("n_orders").cast("double")).as("support"),
        Portable.round4(col("n_ab").cast("double") * col("n_orders").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double"))).as("lift"))
  }

  /** x169: PARETO FRONTIER (2-D skyline) of parts — cheapest price
    * for the size you need: a part survives iff no other part is at
    * most as expensive AND at least as large with one strict
    * inequality (Börzsönyi '01 skyline semantics; ties — identical
    * (price, size) — all survive, neither dominates).
    *
    * Scale: the naive NOT-EXISTS is an all-pairs quadratic. The 2-D
    * structure collapses it to sort + prefix-max: group to the best
    * size per price (hash agg; the distinct-price table is bounded by
    * the PRICE DOMAIN, not the part count), then an EXCLUSIVE prefix
    * max over price order computed in two phases (per-range running
    * max + a P-row broadcast of earlier-range maxima) — no
    * unpartitioned window over the price domain. A price's best size
    * is on the frontier iff it strictly exceeds every cheaper price's
    * best; the frontier (≤ |size domain| rows) broadcasts back onto
    * the part table to recover every surviving part. */
  def paretoFront(part: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pp = part.select(col("p_partkey"),
      floor(col("p_retailprice") * 100 + 0.5).cast("long").as("price_c"),
      col("p_size").cast("long").as("size"))
    val best = pp.groupBy(col("price_c")).agg(max(col("size")).as("best_sz"))
    val p = part.sparkSession.sparkContext.defaultParallelism
    val ranged = Caching.temp(best.repartitionByRange(p, col("price_c"))
      .withColumn("pid", spark_partition_id()))
    val local = ranged.withColumn("run_before",
      max(col("best_sz")).over(Window.partitionBy(col("pid"))
        .orderBy(col("price_c")).rowsBetween(Window.unboundedPreceding, -1)))
    val pidPrev = ranged.groupBy(col("pid")).agg(max(col("best_sz")).as("pmax"))
      .withColumn("prev_max",
        max(col("pmax")).over(Window.orderBy(col("pid"))
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("pid"), col("prev_max"))
    val frontier = local.join(broadcast(pidPrev), Seq("pid"))
      .filter(col("best_sz") > greatest(
        coalesce(col("run_before"), lit(Long.MinValue)),
        coalesce(col("prev_max"), lit(Long.MinValue))))
      // fresh aliases — frontier descends from pp, so keeping the
      // original attribute ids would make the join self-ambiguous
      .select(col("price_c").as("f_price"), col("best_sz").as("f_size"))
    pp.join(broadcast(frontier),
        col("price_c") === col("f_price") && col("size") === col("f_size"))
      .select(col("p_partkey"), col("price_c"), col("size"))
  }

  /** Neighbors kept per item in x175. */
  val ItemTopK = 3

  /** x175: ITEM-ITEM NEIGHBOR LISTS — per brand, its [[ItemTopK]]
    * most-similar brands by co-occurrence COSINE n_ab/√(n_a·n_b)
    * (Sarwar '01 item-based CF, the "customers also bought" building
    * block; x168's lift ranks PAIRS globally, this ranks NEIGHBORS
    * per item — the recommendation read).
    *
    * Determinism: the cosine is 4dp-snapped BEFORE ranking and ties
    * break on the neighbor name; √ of an exact BIGINT product is the
    * same nearest-double in both engines.
    *
    * Scale: rides the x168 one-shuffle basket shape; the symmetrized
    * pair table is ≤\|brand domain\|² rows, the per-item window ranks
    * ≤\|domain\| neighbors per key. With parts as items the pair
    * table grows to the co-occurrence support — still keyed windows,
    * never all-pairs across orders. */
  def itemNeighbors(lineitem: DataFrame, part: DataFrame): DataFrame =
    itemNeighborsFrom(Caching.temp(brandBaskets(lineitem, part)))

  /** [[itemNeighbors]] over a pre-built (and ideally memo-shared with
    * x168) basket frame. */
  def itemNeighborsFrom(baskets: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val singles = baskets.select(explode(col("bs")).as("p_brand"))
      .groupBy(col("p_brand")).agg(count(lit(1)).as("n_single"))
    val pairs = basketPairs(baskets)
      .groupBy(col("p.a").as("ba"), col("p.b").as("bb"))
      .agg(count(lit(1)).as("n_ab"))
    val sym = pairs.select(col("ba").as("brand"), col("bb").as("neighbor"), col("n_ab"))
      .union(pairs.select(col("bb"), col("ba"), col("n_ab")))
    val scored = sym
      .join(broadcast(singles.select(col("p_brand").as("brand"), col("n_single").as("n_s"))), Seq("brand"))
      .join(broadcast(singles.select(col("p_brand").as("neighbor"), col("n_single").as("n_n"))), Seq("neighbor"))
      .select(col("brand"), col("neighbor"), col("n_ab"),
        Portable.round4(col("n_ab").cast("double") /
          sqrt((col("n_s") * col("n_n")).cast("double"))).as("cos_sim"))
    scored.withColumn("rnk", row_number().over(
        Window.partitionBy(col("brand"))
          .orderBy(col("cos_sim").desc, col("neighbor").asc)).cast("long"))
      .filter(col("rnk") <= ItemTopK)
  }

  /** x194: REVENUE BRIDGE (price–volume–mix decomposition) — per
    * brand, the revenue change between the corpus's FIRST and LAST
    * ship year split into the FP&A bridge components: volume effect
    * Δq·p₀, price effect Δp·q₀, and the joint term Δp·Δq (their sum
    * reconstructs ΔR exactly in the reals). The standard "why did
    * revenue move" waterfall.
    *
    * Determinism: quantities and revenue cents are exact BIGINTs; the
    * unit prices p = r/q are one double division each and every
    * component is a single 4dp-rounded expression; ΔR itself is
    * reported as the exact integer difference.
    *
    * Scale: one keyed join (lineitem⋈part), one hash aggregate to
    * (brand × 2 years), a self-merge of the |brand|-row slices. */
  def revenueBridge(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val cents = floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100 + 0.5)
      .cast("long")
    val base = Caching.temp(
      lineitem.select(col("l_partkey"), col("l_quantity").cast("long").as("q"),
          cents.as("r"), year(col("l_shipdate")).cast("long").as("yr"))
        .join(part.select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("yr"))
        .agg(sum(col("q")).as("qt"), sum(col("r")).as("rv")))
    val span = base.agg(min(col("yr")).as("y0"), max(col("yr")).as("y1"))
    val tagged = base.crossJoin(broadcast(span))
    val s0 = tagged.filter(col("yr") === col("y0"))
      .select(col("p_brand"), col("qt").as("q0"), col("rv").as("r0"))
    val s1 = tagged.filter(col("yr") === col("y1"))
      .select(col("p_brand"), col("qt").as("q1"), col("rv").as("r1"))
    val p0 = col("r0").cast("double") / col("q0").cast("double")
    val p1 = col("r1").cast("double") / col("q1").cast("double")
    s0.join(s1, Seq("p_brand"))
      .select(col("p_brand"), col("r0"), col("r1"),
        (col("r1") - col("r0")).as("delta_cents"),
        Portable.round4((col("q1") - col("q0")).cast("double") * p0).as("volume_effect"),
        Portable.round4((p1 - p0) * col("q0").cast("double")).as("price_effect"),
        Portable.round4((p1 - p0) * (col("q1") - col("q0")).cast("double")).as("joint_effect"))
  }

  /** x195: SHIP-DELAY PERCENTILES per order priority — days from
    * order to line ship date, the operational SLA read (does URGENT
    * actually ship faster?). Exact interpolating percentiles over
    * integral day counts, the x157 convention.
    *
    * Scale: one keyed shuffle join (lineitem⋈orders — both scale,
    * deliberately unhinted), one |priorities|-row percentile
    * aggregate. */
  def shipDelay(lineitem: DataFrame, orders: DataFrame): DataFrame =
    lineitem.select(col("l_orderkey"), col("l_shipdate"))
      .join(orders.select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        datediff(col("l_shipdate"), col("o_orderdate")).cast("long").as("d"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        Portable.round4(percentile(col("d"), lit(0.5))).as("p50"),
        Portable.round4(percentile(col("d"), lit(0.9))).as("p90"),
        Portable.round4(percentile(col("d"), lit(0.99))).as("p99"))

  /** x196: RETURN-RATE RANKING by Wilson lower bound — brands ranked
    * by the 95% LOWER confidence bound of their return share
    * (l_returnflag = 'R'), the "how not to sort by average" fix: a
    * 50%-return brand seen 4 times must not outrank a 30% brand seen
    * 40,000 times. Reuses x137's exact Wilson expression order.
    *
    * Scale: one hash aggregate to the brand domain; the rank window
    * runs over that bounded domain. */
  def returnRank(lineitem: DataFrame, part: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val z = graft.ops.TextAnalysis.WilsonZ
    val z2 = z * z
    val n = col("n").cast("double")
    val p = col("k") / n
    val denom = lit(1.0) + lit(z2) / n
    val center = p + lit(z2) / (n * 2)
    val half = lit(z) * sqrt(p * (lit(1.0) - p) / n + lit(z2) / (n * n * 4))
    lineitem.select(col("l_partkey"),
        (col("l_returnflag") === "R").as("ret"))
      .join(part.select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"), sum(when(col("ret"), 1L).otherwise(0L)).as("k"))
      .select(col("p_brand"), col("n"), col("k"),
        Portable.round4(p).as("rate"),
        Portable.round4((center - half) / denom).as("lo"))
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("lo").desc, col("p_brand").asc)).cast("long"))
  }

  /** Bundles kept by x191. */
  val TripleTopK = 20

  /** x191: TOP BRAND TRIPLES — the 3-itemset step of Apriori-style
    * basket mining (x168 ranks pairs, this surfaces the strongest
    * 3-way bundles by distinct-order support). Top-[[TripleTopK]] by
    * (support desc, lexical triple).
    *
    * Scale: rides the one-shuffle basket shape; the i<j<k fan-out is
    * a map-side triple-nested array comprehension bounded by
    * C(\|brand domain\|,3) = 2,300 keys total — the aggregate and the
    * heap top-k never see corpus-sized data. With parts as items the
    * same shape applies with per-basket C(B,3) fan-out. */
  def topTriples(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val baskets = brandBaskets(lineitem, part)
    val triples = baskets.select(explode(flatten(transform(col("bs"), (x, i) =>
      flatten(transform(slice(col("bs"), i + 2, size(col("bs"))), (y, j) =>
        transform(slice(col("bs"), i + j + lit(3), size(col("bs"))),
          z => struct(x.as("a"), y.as("b"), z.as("c")))))))).as("t"))
    triples.groupBy(col("t.a").as("brand_a"), col("t.b").as("brand_b"),
        col("t.c").as("brand_c"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_orders").desc, col("brand_a").asc,
        col("brand_b").asc, col("brand_c").asc)
      .limit(TripleTopK)
  }

  /** x179: HERFINDAHL–HIRSCHMAN concentration of supplier revenue
    * within each nation — the antitrust-style concentration index
    * (Σ share², in the conventional 0–10000 points) next to x143's
    * Lorenz CURVE: one number per market, comparable across nations.
    *
    * Determinism: HHI = Σ(c_s/C)² = (Σc_s²)/C² — the numerator is an
    * EXACT DECIMAL(38,0) sum of squared supplier cents (BIGINT would
    * overflow at ~3×10⁹ cents per supplier), so the whole index is
    * ONE double division per nation, no order-dependent double sum.
    *
    * Scale: lineitem⋈supplier is a keyed shuffle join (supplier
    * scales with SF — unhinted); two stacked hash aggregates
    * (supplier cents → nation moments), output \|nations\|-sized. */
  def supplierHhi(lineitem: DataFrame, supplier: DataFrame,
                  nation: DataFrame): DataFrame = {
    val cents = floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100 + 0.5)
      .cast("long")
    val bySupp = lineitem.select(col("l_suppkey"), cents.as("c"))
      .join(supplier.select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey"), col("s_suppkey"))
      .agg(sum(col("c")).as("sc"))
    bySupp
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_suppliers"),
        sum(col("sc").cast("decimal(38,0)")).as("tot"),
        sum((col("sc").cast("decimal(38,0)")) * col("sc").cast("decimal(38,0)")).as("sq"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("n_suppliers"),
        col("tot").cast("long").as("rev_cents"),
        Portable.round4(col("sq").cast("double") * 10000.0 /
          (col("tot").cast("double") * col("tot").cast("double"))).as("hhi"))
  }
}
