package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over the near-duplicate pair graph —
  * beyond-reference track. [[Dedup.dupClusters]] is the connectivity
  * pass; this adds PAGERANK (fixed-iteration, damping 17/20) as the
  * canonical "propagate-and-aggregate until done" workload.
  *
  * Determinism: ranks are INTEGER throughout — rank₀ = 10⁹ per node;
  * each step is rank' = 150 000 000 + floor(17·Σ floor(rank_u/deg_u) / 20)
  * (damping 0.85 written as the exact rational 17/20, all BIGINT
  * division) — so the result is independent of aggregation order and
  * identical in both engines with zero float drift.
  *
  * Scale: each iteration is one join (edges × ranks, shuffled on the
  * node id) + one hash aggregate — the standard distributed PageRank
  * plan; a fixed iteration count keeps the oracle expressible as
  * unrolled CTEs (same pattern as the x11 k-means oracle).
  */
object Graph {

  /** Fixed PageRank iterations (both engines run exactly this many). */
  val PrIters = 5
  /** rank₀ and the per-step teleport term: 10⁹ and 0.15·10⁹. */
  val RankScale = 1000000000L
  val Teleport: Long = RankScale * 15 / 100

  /** x59: PageRank over the x5 near-dup pair graph (symmetrized).
    * Output: (doc_id, rank) after [[PrIters]] steps — docs central to
    * large duplicate clusters rank highest, singleton-pair docs sit
    * near the teleport floor. */
  def dupGraphPagerank(documents: DataFrame): DataFrame =
    pagerankFrom(Dedup.minhashNearDupPairs(documents))

  /** [[dupGraphPagerank]] over a PRE-MINED pair frame (shared fan-out
    * cache across the x30/x59/x94 graph consumers). */
  def pagerankFrom(minedPairs: DataFrame): DataFrame = {
    val pairs = minedPairs.select(col("doc_a"), col("doc_b"))
    val edges = Caching.temp(
      pairs.union(pairs.select(col("doc_b"), col("doc_a"))).toDF("u", "v"))
    val deg = edges.groupBy(col("u")).agg(count(lit(1)).as("deg"))
    val withDeg = Caching.temp(edges.join(deg, Seq("u")))
    val r0 = deg.select(col("u").as("doc_id"), lit(RankScale).as("rank"))
    // `div` (integral division), NOT `/`: Spark's `/` is always a
    // DOUBLE divide, which stays exact only below 2^53 — `div` keeps
    // the arithmetic in BIGINT end to end like the DuckDB `//`
    (1 to PrIters).foldLeft(r0) { (r, _) =>
      withDeg.join(r, withDeg("u") === r("doc_id"))
        .select(col("v"), expr("rank div deg").as("contrib"))
        .groupBy(col("v")).agg(sum(col("contrib")).as("s"))
        .select(col("v").as("doc_id"),
          (lit(Teleport) + expr("(s * 17) div 20")).as("rank"))
    }
  }

  /** Seed-set rule for [[personalizedPagerankFrom]]: doc_id ≡ 0
    * (mod this) — a deterministic stand-in for "the documents an
    * auditor marked interesting". */
  val PprSeedMod = 10

  /** x233: PERSONALIZED PAGERANK over the near-dup pair graph —
    * the x59 power iteration with the teleport mass restricted to a
    * SEED SET (Jeh & Widom '03): rank flows out from the seeds through
    * duplicate-cluster edges, so high-ranked non-seeds are "documents
    * entangled with the flagged set" — the standard graph-proximity
    * read for contamination/provenance triage, where global PageRank
    * only measures centrality. rank₀ = [[RankScale]] on seeds / 0
    * elsewhere; step: rank(v) = seed(v)·[[Teleport]] +
    * 0.85·Σ_{u→v} rank(u) div deg(u) — the whole trajectory on exact
    * BIGINTs ([[pagerankFrom]]'s integral-division convention), fixed
    * [[PrIters]] steps, so both engines agree bit-for-bit.
    *
    * Scale: identical shape to x59 — per-step one keyed join + one
    * aggregate; the seed restriction adds a map-side CASE, nothing
    * else. Zero-rank nodes stay as rows (they cost one BIGINT each and
    * keep the join uniform). */
  def personalizedPagerankFrom(minedPairs: DataFrame): DataFrame = {
    val pairs = minedPairs.select(col("doc_a"), col("doc_b"))
    val edges = Caching.temp(
      pairs.union(pairs.select(col("doc_b"), col("doc_a"))).toDF("u", "v"))
    val deg = edges.groupBy(col("u")).agg(count(lit(1)).as("deg"))
    val withDeg = Caching.temp(edges.join(deg, Seq("u")))
    def seedMass(node: Column, mass: Long): Column =
      when(pmod(node, lit(PprSeedMod.toLong)) === 0, lit(mass)).otherwise(lit(0L))
    val r0 = deg.select(col("u").as("doc_id"),
      seedMass(col("u"), RankScale).as("rank"))
    (1 to PrIters).foldLeft(r0) { (r, _) =>
      withDeg.join(r, withDeg("u") === r("doc_id"))
        .select(col("v"), expr("rank div deg").as("contrib"))
        .groupBy(col("v")).agg(sum(col("contrib")).as("s"))
        .select(col("v").as("doc_id"),
          (seedMass(col("v"), Teleport) + expr("(s * 17) div 20")).as("rank"))
    }
  }

  /** x94: per-node triangle counts over the near-dup pair graph — the
    * clustering-coefficient numerator, and the standard "is this
    * dense-duplication or chains?" diagnostic on a dedup graph
    * (triangle-rich components are boilerplate families; triangle-free
    * chains are drift).
    *
    * Pairs arrive canonically ordered (doc_a < doc_b), so each
    * triangle a<b<c is found EXACTLY ONCE by the two-hop join
    * e(a,b)⋈e(b,c) closed by e(a,c) — the classic distributed
    * triangle enumeration (node-iterator++ with ordered edges; the
    * ordering IS the degeneracy trick that keeps the join volume
    * Σ deg(u)·deg(v) over ordered edges instead of 3× overcounting).
    * Two shuffle joins on node keys, never a cartesian; the corner
    * explode is 3 rows per triangle. */
  def triangleCounts(documents: DataFrame): DataFrame =
    triangleCountsFrom(Dedup.minhashNearDupPairs(documents))

  /** [[triangleCounts]] over a PRE-MINED pair frame. */
  def triangleCountsFrom(minedPairs: DataFrame): DataFrame = {
    val e = Caching.temp(minedPairs
      .select(col("doc_a").as("u"), col("doc_b").as("v")))
    val tri = e.alias("e1")
      .join(e.alias("e2"), col("e1.v") === col("e2.u"))
      .join(e.alias("e3"),
        col("e3.u") === col("e1.u") && col("e3.v") === col("e2.v"))
      .select(col("e1.u").as("a"), col("e1.v").as("b"), col("e2.v").as("c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("doc_id"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tri"))
  }

  /** k of the x172 core; 2 = "parts with at least two STRONG
    * co-purchase partners that themselves stay in the core". */
  val KCoreK = 2
  /** Minimum co-purchase support for a graph edge (pairs seen in ≥2
    * distinct orders — one shared basket is noise). */
  val KCoreMinSupport = 2
  /** Fixed peel rounds BOTH engines run (the x117/x59 unrolled-oracle
    * convention); the builder-side fixpoint probe needed ≤5 at sf0.1. */
  val KCoreRounds = 8
  /** Alive-set size under which the peel semi-joins broadcast the
    * alive frame (~32 MB of longs at the bound) — above it the
    * shuffle join is the scale-correct shape. */
  val KCoreBroadcastMax = 4000000L

  /** x172: K-CORE DECOMPOSITION (k = [[KCoreK]]) of the part
    * co-purchase graph — the maximal subgraph where every part keeps
    * ≥ k co-purchase partners AFTER its weak neighbors are discarded
    * too (Seidman '83). The fourth graph-analytics family next to
    * connectivity (x30/x97), centrality (x59) and local density
    * (x94): cores expose the stable cross-sell backbone that raw
    * degree inflates with one-off baskets.
    *
    * The oracle unrolls EXACTLY [[KCoreRounds]] synchronous peels
    * (remove nodes with alive-degree < k, recompute) as MATERIALIZED
    * CTEs; the Spark side peels to the SAME fixpoint but stops as
    * soon as a round removes nothing (the alive set only shrinks, so
    * an unchanged count is the fixpoint and a_r = a_8), and fails
    * loud if [[KCoreRounds]] rounds weren't enough — silent
    * non-convergence would ship a supergraph of the core.
    *
    * Scale: edge building rides the x168 basket shape (per-order pair
    * fan-out bounded by basket size, support filter keyed on the pair
    * — never all-pairs across orders). Each peel is one hash
    * aggregate + one semi-join, both keyed on the node id; the alive
    * set only shrinks; per-round eager `localCheckpoint` truncates
    * the loop lineage (the x86/x97 lesson — driver re-analysis cost
    * grows superlinearly otherwise). Output: surviving parts with
    * their within-core degree. */
  def kCoreParts(lineitem: DataFrame): DataFrame = {
    // one wide shuffle to per-order sorted part baskets (bounded by
    // basket size), then the i<j pair fan-out is a map-side explode —
    // same one-shuffle shape as Olap.basketLift
    val pairs = lineitem.select(col("l_orderkey"), col("l_partkey"))
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .select(explode(flatten(transform(col("ps"), (x, i) =>
        transform(slice(col("ps"), i + 2, size(col("ps"))),
          y => struct(x.as("a"), y.as("b")))))).as("p"))
      .groupBy(col("p.a").as("pa"), col("p.b").as("pb"))
      .agg(count(lit(1)).as("sup"))
      .filter(col("sup") >= KCoreMinSupport)
    val edges = Caching.temp(
      pairs.select(col("pa").as("u"), col("pb").as("v"))
        .union(pairs.select(col("pb"), col("pa"))))
    var alive = edges.select(col("u")).distinct().localCheckpoint()
    var prevN = alive.count()
    // The alive set only SHRINKS, and a checkpointed leaf carries no
    // stats AQE could use — so while it fits the broadcast bound, hint
    // it explicitly: both semi-joins become map-side and each peel
    // round costs ONE tiny shuffle (the degree aggregate) instead of
    // three. Above the bound (a billion-node graph early in the peel)
    // the shuffle join is the scale-correct shape and the hint is
    // withheld; the exact alive count is already on hand per round.
    def gate(a: DataFrame, n: Long): DataFrame =
      if (n <= KCoreBroadcastMax) broadcast(a) else a
    def peel(a: DataFrame, n: Long): DataFrame = edges
      .join(gate(a.select(col("u")), n), Seq("u"))
      .join(gate(a.select(col("u").as("v")), n), Seq("v"))
      .groupBy(col("u")).agg(count(lit(1)).as("d"))
      .filter(col("d") >= KCoreK)
      .select(col("u"))
    // alive only ever SHRINKS, so an unchanged count IS the fixpoint —
    // converging early is result-identical to the oracle's full 8
    // rounds (a_r = a_8) and skips the dead iterations' actions
    var converged = false
    var r = 0
    while (r < KCoreRounds && !converged) {
      val next = peel(alive, prevN).localCheckpoint()
      val n = next.count()
      converged = n == prevN
      alive = next; prevN = n; r += 1
    }
    if (!converged && peel(alive, prevN).count() != prevN)
      throw new IllegalStateException(
        s"kCoreParts: peel not at fixpoint after $KCoreRounds rounds — raise KCoreRounds")
    edges.join(gate(alive, prevN), Seq("u"))
      .join(gate(alive.select(col("u").as("v")), prevN), Seq("v"))
      .groupBy(col("u")).agg(count(lit(1)).as("core_deg"))
      .filter(col("core_deg") >= KCoreK)
      .select(col("u").as("p_partkey"), col("core_deg"))
  }

  /** Predicted links kept in x178. */
  val AaTopK = 20
  /** Fixed-point scale for the per-wedge 1/ln(deg) contribution. */
  val AaScale = 1000000L

  /** x178: ADAMIC–ADAR LINK PREDICTION over the x114 mutual-kNN
    * graph — score every NON-edge two-hop pair by Σ_w 1/ln(deg(w))
    * over common neighbors w (Adamic & Adar '03): rare shared
    * neighbors certify near-missed semantic pairs the per-cell kNN
    * blocking didn't surface; the top predictions are the "re-mine
    * these with a finer pass" worklist. (The x5 LSH dup graph is the
    * WRONG input here — propagation makes its components cliques, so
    * it has zero open wedges at every SF; the kNN graph is sparse by
    * construction, ~8k open wedges at sf0.001.) Completes the graph
    * family: connectivity (x30/x97), centrality (x59), density
    * (x94), cores (x172), now prediction.
    *
    * Determinism: each wedge contributes ⌊AaScale/ln(deg_w) + 0.5⌋ —
    * an exact BIGINT — so the score sum commutes (double sums don't);
    * a middle node needs deg ≥ 2 to form a wedge, so ln is never 0.
    * Top-k orders by (exact score desc, doc_a, doc_b).
    *
    * Scale: wedge volume is Σ_w deg(w)² — the x94 triangle-join
    * exposure; on a dedup graph degrees are cluster-bounded, and a
    * production run caps hub degrees first (the x25 df-cap pattern).
    * Existing edges drop via a LEFT ANTI join on the canonical pair;
    * the global top-k is the heap TakeOrderedAndProject, not a full
    * sort. */
  def adamicAdarFrom(edges0: DataFrame): DataFrame = {
    // first two columns = the canonically-ordered (a < b) edge list
    val Array(ca, cb) = edges0.columns.take(2)
    val e = Caching.temp(edges0.select(col(ca).as("u"), col(cb).as("v")))
    val sym = e.union(e.select(col("v"), col("u")))
    val deg = sym.groupBy(col("u")).agg(count(lit(1)).as("deg"))
    // deg-1 middle nodes can't form a wedge — drop them BEFORE the
    // contribution (ln(1) = 0 would also make the ANSI cast throw)
    val nb = sym.select(col("u").as("w"), col("v").as("n"))
      .join(deg.filter(col("deg") >= 2).select(col("u").as("w"),
        floor(lit(AaScale).cast("double") / log(col("deg").cast("double")) + 0.5)
          .cast("long").as("c")), Seq("w"))
    val wedges = nb.alias("l").join(nb.alias("r"),
        col("l.w") === col("r.w") && col("l.n") < col("r.n"))
      .select(col("l.n").as("node_a"), col("r.n").as("node_b"), col("l.c").as("c"))
    val scores = wedges.groupBy(col("node_a"), col("node_b"))
      .agg(sum(col("c")).as("s6"), count(lit(1)).as("n_common"))
    scores.join(e, col("node_a") === col("u") && col("node_b") === col("v"), "left_anti")
      .orderBy(col("s6").desc, col("node_a").asc, col("node_b").asc)
      .limit(AaTopK)
      .select(col("node_a"), col("node_b"), col("n_common"),
        Portable.round4(col("s6").cast("double") / lit(AaScale).cast("double"))
          .as("aa_score"))
  }

  /** Fixed synchronous label-propagation rounds (both engines run
    * exactly this many — the KmeansIters convention, NOT a fixpoint:
    * synchronous LPA can 2-cycle on bipartite structures, so a
    * convergence gate would be ill-posed; fixed-round labels are the
    * deterministic cross-engine contract). */
  val LpaRounds = 4

  /** x201: COMMUNITY DETECTION by synchronous label propagation
    * (Raghavan et al. '07) over the x114 mutual-kNN graph — the
    * community layer on top of the existing graph battery (x30/x97
    * find CONNECTED components; this finds densely-linked groups
    * inside them, the semantic clusters a curriculum/mixture designer
    * samples from). Every node starts as its own label; each round
    * every node adopts the most frequent label among its NEIGHBORS
    * (ties → smallest label). Output: (vec_id, community, community
    * size) after [[LpaRounds]] rounds.
    *
    * Determinism: the per-node update is an exact-integer argmax
    * (count desc, label asc) — a total order, identical in both
    * engines; rounds are fixed, so the whole trajectory must agree
    * (the x117 property).
    *
    * Scale: each round is ONE keyed join (edges ⋈ labels on the
    * neighbor endpoint) + two hash aggregates — degree-bounded, no
    * windows over unbounded partitions (the per-node argmax is a
    * struct-min, map-side combinable). Each generation is an EAGER
    * localCheckpoint, not a persist ([[graft.ops.Dedup
    * .dupClustersFrom]]'s lineage-truncation discipline: with plain
    * persist the logical plan grows one join per round and DRIVER-SIDE
    * re-analysis dominates — measured 53 s → 8 s at sf0.1 for the
    * identical four rounds); at 100 TB the same loop runs with the
    * edge list bucketed on u so the per-round join is shuffle-free. */
  /** The [[lpaCommunitiesFrom]] loop itself, returning the final
    * (u, lbl) generation — a CHECKPOINTED leaf, so callers (x201's
    * size join, x202's modularity audit, the Extensions memo) compose
    * on a stable frame without re-running the rounds. */
  def lpaLabels(edges0: DataFrame, rounds: Int = LpaRounds): DataFrame = {
    val Array(ca, cb) = edges0.columns.take(2)
    val sc = edges0.sparkSession.sparkContext
    val e = Caching.temp(edges0.select(col(ca).as("u"), col(cb).as("v"))
      .union(edges0.select(col(cb).as("u"), col(ca).as("v"))))
    // Superseded-generation reaping (ADVICE r6): each eager
    // localCheckpoint is backed by persisted RDD blocks that
    // Dataset.unpersist can NOT release, so the previous generation's
    // blocks are freed by id once the next generation has materialized
    // (the [[pqCodebooks]] persist-chain protocol, at the RDD level).
    // The id comes from the checkpointed leaf ITSELF
    // ([[org.apache.spark.sql.graftbench.CheckpointId]]) — a registry
    // set-difference here would sweep in the shared edge cache (and
    // any first-materialized upstream memo) and poison it for the
    // session (round-7 review finding). Only the FINAL generation's
    // blocks survive the call — intermediates are never referenced
    // again.
    var prevId: Option[Int] = None
    def ckpt(df: DataFrame): DataFrame = {
      val out = df.localCheckpoint() // eager: materializes + truncates lineage
      prevId.foreach(id => sc.getPersistentRDDs.get(id)
        .foreach(_.unpersist(blocking = false)))
      prevId = org.apache.spark.sql.graftbench.CheckpointId.of(out)
      out
    }
    var labels = ckpt(e.select(col("u")).distinct()
      .select(col("u"), col("u").as("lbl")))
    for (_ <- 1 to rounds) {
      labels = ckpt(e.join(labels.select(col("u").as("v"), col("lbl")), Seq("v"))
        .groupBy(col("u"), col("lbl")).agg(count(lit(1)).as("cnt"))
        .select(col("u"), struct((-col("cnt")).as("nc"), col("lbl")).as("sc"))
        .groupBy(col("u")).agg(min(col("sc")).as("m"))
        .select(col("u"), col("m.lbl").as("lbl")))
    }
    labels
  }

  def lpaCommunitiesFrom(edges0: DataFrame, rounds: Int = LpaRounds): DataFrame =
    lpaCommunitiesFromLabels(lpaLabels(edges0, rounds))

  /** x201's output shape over pre-computed labels. */
  def lpaCommunitiesFromLabels(labels: DataFrame): DataFrame = {
    val sizes = labels.groupBy(col("lbl")).agg(count(lit(1)).as("community_size"))
    labels.join(sizes, Seq("lbl"))
      .select(col("u").as("vec_id"), col("lbl").as("community"),
        col("community_size"))
  }

  /** x202: MODULARITY AUDIT of a community assignment (Newman '06) —
    * the quality number for x201's partition: per community c,
    * contribution Q_c = e_c/m − (d_c/2m)², where e_c = intra-community
    * undirected edges, d_c = degree sum, m = total edges; Σ Q_c is the
    * partition's modularity (dense-inside/sparse-between partitions
    * score high, a random cut scores ≈ 0). The go/no-go read before
    * communities feed a sampler or curriculum.
    *
    * Determinism: every count is an exact integer; the contribution is
    * computed as the exact integer 4m·e_c − d_c² over the exact
    * denominator 4m², divided once and 4dp-rounded (identical
    * expression order in both engines). The integer legs stay inside
    * BIGINT up to m ≈ 2³⁰ edges (4m·e_c < 2⁶³); past that, swap both
    * engines to DECIMAL(38,0)/HUGEINT operands — the x177 convention.
    *
    * Scale: one keyed join of the (a < b) edge list against the label
    * table per endpoint (labels broadcast when community-count-sized;
    * here keyed — edges shuffle once per side), then community-keyed
    * aggregates. Nothing beyond the edge list is ever materialized. */
  def modularityFrom(edges0: DataFrame, labels: DataFrame): DataFrame = {
    val Array(ca, cb) = edges0.columns.take(2)
    val e = Caching.temp(edges0.select(col(ca).as("a"), col(cb).as("b")))
    val la = labels.select(col("u").as("a"), col("lbl").as("la"))
    val lb = labels.select(col("u").as("b"), col("lbl").as("lb"))
    val tagged = Caching.temp(e.join(la, Seq("a")).join(lb, Seq("b")))
    val m = tagged.agg(count(lit(1)).as("m"))
    val intra = tagged.filter(col("la") === col("lb"))
      .groupBy(col("la").as("lbl")).agg(count(lit(1)).as("internal_edges"))
    val degs = tagged.select(col("la").as("lbl"))
      .union(tagged.select(col("lb")))
      .groupBy(col("lbl")).agg(count(lit(1)).as("degree_sum"))
    val members = labels.groupBy(col("lbl")).agg(count(lit(1)).as("n_members"))
    members
      .join(degs, Seq("lbl"), "left")
      .join(intra, Seq("lbl"), "left")
      .crossJoin(broadcast(m))
      .select(col("lbl").as("community"), col("n_members"),
        coalesce(col("internal_edges"), lit(0L)).as("internal_edges"),
        coalesce(col("degree_sum"), lit(0L)).as("degree_sum"),
        Portable.round4(
          (lit(4L) * col("m") * coalesce(col("internal_edges"), lit(0L)) -
            coalesce(col("degree_sum"), lit(0L)) * coalesce(col("degree_sum"), lit(0L)))
            .cast("double") / (lit(4L) * col("m") * col("m")).cast("double"))
          .as("q_contrib"))
  }
}
