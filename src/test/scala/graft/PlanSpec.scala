package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-plan quality gates: the properties that make these plans
  * survive a 100 TB scale-up. Asserted on the real sf0.001 fixtures so
  * a regression (a lost pushdown, a surprise cartesian, a broadcast
  * that became a sort-merge of the fact table) fails the suite, not
  * the cluster. */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("mb52 slice filter is pushed into the parquet scan") {
    val p = plan("e5_mb52_valid")
    assert(p.contains("PushedFilters: [IsNotNull(l_linestatus), EqualTo(l_linestatus,F)]"),
      s"expected l_linestatus pushdown in:\n$p")
  }

  test("eord scan prunes unread lineitem columns") {
    val p = plan("s1_eord_scan")
    // the projection needs 6 of 11 lineitem columns; tax/discount/price
    // must not reach the scan
    assert(p.contains("ReadSchema"))
    assert(!p.contains("l_tax"), "l_tax should be pruned from the scan")
    assert(!p.contains("l_discount"), "l_discount should be pruned from the scan")
  }

  test("dimension enrichment joins broadcast at small SF (AQE-final plan)") {
    // the marc join carries NO hint (it scales with |part|); at test SF
    // AQE must still pick a broadcast join from observed sizes — this
    // pins the "same plan at small SF, survivable at large SF" contract
    val df = SparkEntry.queries("j1_enriched_sl")(spark, dir)
    df.collect() // finalize THIS QueryExecution's adaptive plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast joins in:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"no dimension join should shuffle-sort the fact side at this SF:\n$p")
  }

  test("no broadcast hint wraps an SF-scaling relation") {
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    // columns only carried by relations that grow with scale factor:
    // marc (|part|x25), mara (|part|), eord/checked fact slices.
    // A broadcast HINT on any of these is a hard failure at large SF
    // (8 GB broadcast limit) — hints may only mark bounded dims.
    val scalingCols = Set("plant_status", "plant_spk", "hub_status", "hub_spk",
      "interco_status", "interco_spk", "xplant_status", "material_type",
      "vendor_in_hub", "mpn", "number", "valid_to", "blocked")
    Seq("j1_enriched_sl", "u3_main_checked", "j2_apex_checked",
        "j4_intraco_checked", "j7_main_final", "f3_missing_sl",
        "r10_status_marc").foreach { q =>
      SparkEntry.queries(q)(spark, dir).queryExecution.analyzed.foreach {
        case h: ResolvedHint =>
          val bad = h.child.output.map(_.name).toSet.intersect(scalingCols)
          assert(bad.isEmpty,
            s"$q broadcast-hints a relation carrying SF-scaling columns $bad")
        case _ => ()
      }
    }
  }

  test("LSH pair mining never plans a cartesian product") {
    Seq("x5_minhash_lsh_dup", "x7_simhash_pairs", "x9_embed_dup_lsh").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q plans a nested loop:\n$p")
    }
  }

  test("exact similarity join: no cartesian, prefix filter present") {
    val p = plan("x25_jaccard_exact")
    assert(!p.contains("CartesianProduct"), s"x25 plans a cartesian:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"x25 plans a nested loop:\n$p")
    // the per-doc prefix rank must survive optimization (losing it
    // silently reverts to the unfiltered quadratic candidate join)
    val opt = SparkEntry.queries("x25_jaccard_exact")(spark, dir)
      .queryExecution.optimizedPlan.toString
    assert(opt.contains("row_number"), s"prefix-filter rank missing from:\n$opt")
  }

  test("learned IVF: corpus side joins the broadcast probe set, never shuffles on 8 cell keys") {
    // the candidates⋈probes join key has only KmeansK distinct values —
    // a shuffled join would funnel the corpus into K partitions; the
    // probe batch must be the broadcast side
    val df = SparkEntry.queries("x11_ann_ivf")(spark, dir)
    df.collect()
    // AQE plan strings append the pre-adaptive "Initial Plan" — only
    // the final section is what actually ran
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(p.contains("BroadcastHashJoin [cell"),
      s"expected broadcast probe join on cell in:\n$p")
    assert(!p.contains("SortMergeJoin [cell"),
      s"cell-keyed join must not sort-merge (8 distinct keys):\n$p")
  }

  test("x30/x97 component queries join on doc ids, never a cross join") {
    Seq("x30_dup_clusters", "x97_dup_clusters_star").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q plans a nested loop:\n$p")
    }
  }

  test("x26/x27 TF-IDF: one explode, hash aggregates, no window over the whole corpus") {
    val p = plan("x26_vocab_idf")
    assert(p.contains("HashAggregate"), s"expected hash agg in:\n$p")
    assert(!p.contains("Window"), s"x26 needs no window:\n$p")
    val p27 = plan("x27_tfidf_terms")
    // the per-doc rank must be a PARTITIONED window (an unpartitioned
    // windowspec would funnel the corpus into one task)
    assert(p27.contains("windowspecdefinition(doc_id"),
      s"x27 rank must partition on doc_id:\n$p27")
  }

  test("x90 span dedup: stacked hash aggregates, no count-distinct Expand") {
    // the doc-count comes from a second stacked aggregate, not
    // countDistinct — an Expand would triple the exploded span volume
    val p = plan("x90_span_dedup")
    assert(p.contains("HashAggregate"), s"expected hash aggregates in:\n$p")
    assert(!p.contains("Expand"), s"x90 must not plan an Expand:\n$p")
    assert(!p.contains("CartesianProduct"), s"x90 plans a cartesian:\n$p")
  }

  test("x60 vocab ids: no vocabulary-wide unpartitioned window") {
    // the dense-id assignment must never sort the full distinct-token
    // vocabulary through one partition: the local rank windows on the
    // range-partition id, and the only unpartitioned window left runs
    // over the P-row offsets table (ordered by pid, not tok)
    val p = plan("x60_token_ids")
    assert(!p.contains("windowspecdefinition(tok"),
      s"x60 sorts the whole vocabulary in one window partition:\n$p")
    assert(p.contains("windowspecdefinition(pid"),
      s"x60 should rank within range partitions (pid):\n$p")
  }

  test("x36 packing window is per-shard, x37 never cartesian, x39 window-free") {
    val p36 = SparkEntry.queries("x36_pack_bins")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p36.contains("windowspecdefinition(lang"),
      s"packing running-sum must partition on the shard key:\n$p36")
    val p37 = plan("x37_contamination")
    assert(!p37.contains("CartesianProduct") && !p37.contains("BroadcastNestedLoopJoin"),
      s"contamination join must stay on the shingle key:\n$p37")
    val p39 = plan("x39_repetition")
    assert(!p39.contains("Window"), s"repetition stats need no window:\n$p39")
  }

  test("x99 PII scrub is map-only: one projection, no exchange, no UDF") {
    val p = plan("x99_pii_scrub")
    assert(!p.contains("Exchange"), s"PII scrub must not shuffle:\n$p")
    assert(!p.contains("BatchEvalPython") && !p.contains("Invoke"),
      s"PII scrub must stay on codegen'd regexp expressions:\n$p")
    // "*(n)" marks a whole-stage-codegen stage in the plan tree
    assert(p.contains("*(1) Project"), s"expected the projection in codegen stage 1:\n$p")
  }

  test("x101/x102 quality filters are map-only: no exchange, no UDF") {
    for (q <- Seq("x101_gopher_rules", "x102_c4_lines")) {
      val p = plan(q)
      assert(!p.contains("Exchange"), s"$q must not shuffle:\n$p")
      assert(!p.contains("BatchEvalPython"), s"$q must not plan a Python UDF:\n$p")
    }
  }

  test("x103 mixture weights: one corpus scan, window only over the grouped rows") {
    val p = plan("x103_mix_weights")
    // the normalizer must come from the already-aggregated frame, not
    // a second corpus aggregation — exactly one parquet scan
    assert("FileScan parquet".r.findAllIn(p).length === 1,
      s"mixture weights must scan the corpus once:\n$p")
    assert(p.contains("Window"), s"expected the bounded normalizer window:\n$p")
  }

  test("x100 span reconstruction: keyed joins only, no cartesian, no Expand") {
    val p = plan("x100_span_clean")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"x100 plans an unkeyed join:\n$p")
    assert(!p.contains("Expand"), s"x100 must not plan an Expand:\n$p")
    // the dup-span side is the filtered x90 output — bounded, so the
    // per-token left join may broadcast it; the token side must never
    // be on the build side of anything (it is corpus-sized)
  }

  test("x105 NFC scrub is map-only: no exchange, native expression, no UDF") {
    val p = plan("x105_unicode_nfc")
    assert(!p.contains("Exchange"), s"NFC scrub must not shuffle:\n$p")
    assert(!p.contains("BatchEvalPython") && !p.contains("Invoke"),
      s"NFC must run as the native codegen expression, not a UDF:\n$p")
    assert(p.contains("graft_nfc"), s"expected the native graft_nfc call in:\n$p")
    assert(p.contains("*(1) Project"), s"expected the projection in codegen stage 1:\n$p")
  }

  test("x106 sampler: weights broadcast, corpus shuffles once on source") {
    val df = SparkEntry.queries("x106_mix_sample")(spark, dir)
    df.collect() // finalize the adaptive plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"the source-cardinality weights frame must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"the corpus must never sort-merge against the weights:\n$p")
    // exactly two source-keyed exchanges: the per-source rank window
    // (the ONE corpus-row shuffle) and the weights-side token-count
    // aggregate, whose exchange carries only per-source partial sums
    // (|sources| rows per mapper) thanks to map-side combine. Count
    // the FINAL adaptive plan only — the executed-plan dump repeats
    // every node under "== Initial Plan ==".
    val pf = p.split("== Initial Plan ==").head
    assert("hashpartitioning\\(source".r.findAllIn(pf).length === 2,
      s"expected the rank-window corpus shuffle + the partial-agg weight shuffle:\n$p")
  }

  test("x107 classifier score is map-only on top of the x101 plan") {
    val p = plan("x107_clf_score")
    assert(!p.contains("Exchange"), s"classifier scoring must not shuffle:\n$p")
    assert(!p.contains("BatchEvalPython"), s"classifier must not plan a UDF:\n$p")
  }

  test("x108 HTML extraction is map-only: one projection, no shuffle, no UDF") {
    val p = plan("x108_html_extract")
    assert(!p.contains("Exchange"), s"tag stripping must not shuffle:\n$p")
    assert(!p.contains("BatchEvalPython"), s"extraction must not plan a UDF:\n$p")
  }

  test("x109 URL stats: map-only parse into one domain-keyed aggregate") {
    val p = plan("x109_url_stats")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"no joins belong in the URL-stats plan:\n$p")
    // one shuffle for the domain agg + one for the distinct-host
    // rewrite (two-phase countDistinct) — nothing else
    assert("Exchange hashpartitioning".r.findAllIn(p).length <= 2,
      s"expected at most the agg + distinct-host exchanges:\n$p")
  }

  test("x110 script profile is map-only: no shuffle, no UDF") {
    val p = plan("x110_script_profile")
    assert(!p.contains("Exchange"), s"script profiling must not shuffle:\n$p")
    assert(!p.contains("BatchEvalPython"), s"script profiling must not plan a UDF:\n$p")
  }

  test("x111 containment join: no cartesian, source-side prefix rank survives") {
    val p = plan("x111_containment")
    assert(!p.contains("CartesianProduct"), s"x111 plans a cartesian:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"x111 plans a nested loop:\n$p")
    // losing the prefix rank silently reverts to the full postings
    // self-join (x25's contract, one-sided here)
    val opt = SparkEntry.queries("x111_containment")(spark, dir)
      .queryExecution.optimizedPlan.toString
    assert(opt.contains("row_number"), s"prefix-filter rank missing from:\n$opt")
  }

  test("x112 chunking is map-only: generate + projections, no shuffle") {
    val p = plan("x112_chunks")
    assert(!p.contains("Exchange"), s"chunking must not shuffle:\n$p")
    assert(p.contains("Generate explode"), s"expected a streaming explode in:\n$p")
  }

  test("x29 split assignment is map-only: no exchange at all") {
    val p = plan("x29_split_assign")
    assert(!p.contains("Exchange"), s"split assignment must not shuffle:\n$p")
  }

  test("x21 global top-k is TakeOrderedAndProject, not a full-data window") {
    val p = plan("x21_top_tokens")
    assert(p.contains("TakeOrderedAndProject"),
      s"expected per-partition heap top-k in:\n$p")
  }

  test("x1 computes each text-stat regex/array scan exactly once") {
    val opt = SparkEntry.queries("x1_text_stats")(spark, dir)
      .queryExecution.optimizedPlan.toString
    // the punct regex appears once for the n_punct output; a collapsed
    // plan would inline a second copy inside quality_score
    val occurrences = "regexp_extract_all".r.findAllIn(opt).length
    assert(occurrences <= 2, // one for n_bpe_tokens, one for n_punct
      s"expected <=2 regexp_extract_all in optimized x1 plan, got $occurrences:\n$opt")
  }

  test("a 10-rule cascade collapses to ONE optimized projection") {
    import graft.rules.RuleCascade
    import graft.rules.RuleCascade.Rule
    import spark.implicits._
    val df = Seq(1, 2, 3).toDF("v")
    val cascaded = RuleCascade(df, "c",
      (1 to 10).map(i => Rule(col("v") === i && col("c").isNull, s"r$i")))
    val optimized = cascaded.queryExecution.optimizedPlan
    val projects = optimized.collect {
      case p: org.apache.spark.sql.catalyst.plans.logical.Project => p
    }
    // ≤1: constant folding may collapse the literal input entirely
    assert(projects.length <= 1,
      s"CollapseProject should fold 10 stacked withColumns into one:\n$optimized")
  }

  test("round-3 joins: segment/BM25/semantic/pagerank stay on hash keys") {
    // x49: segment-frequency merge-back is a key join, never cartesian
    val p49 = plan("x49_segment_dedup")
    assert(!p49.contains("CartesianProduct") && !p49.contains("BroadcastNestedLoopJoin"),
      s"x49 must join on segment text:\n$p49")
    // x51: the bounded query batch must be the broadcast side
    val df51 = SparkEntry.queries("x51_bm25_search")(spark, dir)
    df51.collect()
    val p51 = df51.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(p51.contains("BroadcastHashJoin"), s"x51 query terms should broadcast:\n$p51")
    assert(!p51.contains("CartesianProduct"), s"x51 plans a cartesian:\n$p51")
    // x52: the within-cell pair join is an equi join; the only nested
    // loops are the K-row centroid broadcasts inside assignCells
    val p52 = plan("x52_semantic_dup")
    assert(!p52.contains("CartesianProduct"), s"x52 plans a cartesian:\n$p52")
    // x59: rank propagation joins edges×ranks on the node id
    val p59 = plan("x59_pagerank")
    assert(!p59.contains("CartesianProduct") && !p59.contains("BroadcastNestedLoopJoin"),
      s"x59 must join on node ids:\n$p59")
  }

  test("x53 pivot compiles to hash aggregates, x57 windows partition by user") {
    val p53 = plan("x53_hourly_pivot")
    assert(p53.contains("HashAggregate"), s"pivot should hash-aggregate:\n$p53")
    assert(!p53.contains("Expand"), s"pinned-value pivot needs no Expand:\n$p53")
    val p57 = plan("x57_window_suite")
    assert(p57.contains("windowspecdefinition(user_id"),
      s"x57 windows must partition on user_id:\n$p57")
  }

  test("x58 profiling prunes each scan to its one column") {
    val p = plan("x58_profile")
    // every unioned branch reads exactly one lineitem column — a scan
    // fetching unrelated columns would defeat the per-column design
    val reads = "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(p).map(_.group(1)).toSeq
    assert(reads.nonEmpty)
    reads.foreach(r => assert(!r.contains(","), s"profile scan reads >1 column: $r"))
  }

  test("x70 melt prunes the scan to the 4 measures; x72 cube is ONE pass; x71 is constant-width") {
    val p70 = plan("x70_melt_stats")
    val reads = "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(p70).map(_.group(1)).toSeq
    assert(reads.nonEmpty)
    reads.foreach { r =>
      assert(r.split(",").length === graft.ops.Olap.MeltCols.length,
        s"melt scan should read exactly the ${graft.ops.Olap.MeltCols.length} measures: $r")
    }
    val p72 = plan("x72_cube_sales")
    // all four grouping sets from a single Expand + hash aggregate,
    // not four scans
    assert("Expand".r.findAllMatchIn(p72).length === 1, s"cube should Expand once:\n$p72")
    assert("Scan parquet".r.findAllMatchIn(p72).length === 1,
      s"cube should scan orders once:\n$p72")
    val p71 = plan("x71_expectations")
    // scalar rules fold into per-table aggregates: no Expand (the
    // multi-distinct blowup shape) anywhere
    assert(!p71.contains("Expand"), s"expectations must not Expand:\n$p71")
  }

  test("x81 star: bounded dims broadcast, scaling joins unhinted, scan pruned") {
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    val df = SparkEntry.queries("x81_star_revenue")(spark, dir)
    // hints only on nation/region (bounded at every SF)
    df.queryExecution.analyzed.foreach {
      case h: ResolvedHint =>
        val cols = h.child.output.map(_.name).toSet
        assert(cols.subsetOf(Set("n_nationkey", "n_name", "n_regionkey",
          "r_regionkey", "r_name")),
          s"broadcast hint wraps a scaling relation: $cols")
      case _ => ()
    }
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"star join must stay keyed:\n$p")
    // lineitem scan must read exactly the 3 needed columns
    assert(!p.contains("l_quantity"), s"l_quantity must be pruned:\n$p")
    assert(!p.contains("l_tax"), s"l_tax must be pruned:\n$p")
  }

  test("x84/x91: single-pass aggregates, no Expand, pruned scans") {
    val p84 = plan("x84_salted_agg")
    assert(!p84.contains("Expand"),
      s"two-phase distinct must not grouping-sets-Expand:\n$p84")
    val p91 = plan("x91_zone_map")
    assert(!p91.contains("Expand"), s"zone map is one grouped pass:\n$p91")
    assert(!p91.contains("l_quantity") && !p91.contains("l_partkey"),
      s"zone-map scan must read only shipdate+orderkey:\n$p91")
  }

  test("x113 bucketed join: co-located SMJ with no Exchange below the join") {
    val df = SparkEntry.queries("x113_bucketed_join")(spark, dir)
    df.collect() // finalize the adaptive plan (and write the tables)
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(p.contains("SortMergeJoin"),
      s"the merge hint must hold — a broadcast would dodge the bucketed layout:\n$p")
    // the ONLY exchange is the final 5-group rollup; the join itself
    // reads bucket i ⋈ bucket i straight off the scans
    assert("Exchange hashpartitioning".r.findAllIn(p).length === 1,
      s"expected exactly the final-aggregate exchange:\n$p")
    assert(p.contains("SelectedBucketsCount"),
      s"both scans must report the bucketed layout:\n$p")
  }

  test("x114 kNN graph: cell-blocked pairs, per-node windows, no cartesian") {
    val df = SparkEntry.queries("x114_knn_graph")(spark, dir)
    df.collect() // finalize the adaptive plan
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!p.contains("CartesianProduct"),
      s"pairing must stay on the (cell, sub) block keys:\n$p")
    // the only BNLJ allowed is the broadcast K-row centroid assignment
    assert(!p.contains("Window [") || !p.contains("Window [row_number() windowspecdefinition()"),
      "windows must be partitioned")
    assert(p.contains("hashpartitioning(src"),
      s"the top-k window must partition by src, never run global:\n$p")
  }

  test("x115 DSIR: broadcast λ table, keyed aggregates, no cartesian pairing") {
    val df = SparkEntry.queries("x115_dsir_weights")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!p.contains("CartesianProduct"), s"no cartesian belongs here:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the 64-row λ table must broadcast to the doc-feature counts:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"expected the broadcast λ join:\n$p")
  }

  test("x116 reshard audit is map-only: one projection, no shuffle, no UDF") {
    val p = plan("x116_reshard")
    assert(!p.contains("Exchange"), s"reshard audit must not shuffle:\n$p")
    assert(!p.contains("BatchEvalPython"), s"reshard audit must not plan a UDF:\n$p")
  }

  test("x118/x119: corpus collapses before the bounded planning windows") {
    // x118: the only join is the broadcast scalar budget; the windows
    // run over the |sources|-row grouped frame, never the corpus
    val p118 = plan("x118_unimax")
    assert(!p118.contains("SortMergeJoin") && !p118.contains("CartesianProduct"),
      s"budget must broadcast to the grouped frame:\n$p118")
    // x119: packing windows are keyed by the table partition
    val p119 = plan("x119_compaction")
    assert(p119.contains("hashpartitioning(l_returnflag"),
      s"packing window must partition by (returnflag, linestatus):\n$p119")
    assert(!p119.contains("SinglePartition") || !p119.contains("Window"),
      s"no global window belongs in the packing plan:\n$p119")
  }

  test("x121 concurrency: interval overlap plans as explode+agg, never a join") {
    val p = plan("x121_concurrency")
    assert(!p.contains("Join") && !p.contains("CartesianProduct"),
      s"the hour grid derives from the interval itself — no join belongs here:\n$p")
    assert(p.contains("Generate explode"), s"expected the hour explode in:\n$p")
  }

  test("x142 readability is map-only: no exchange, no UDF") {
    val p = plan("x142_readability")
    assert(!p.contains("Exchange"), s"readability must not shuffle:\n$p")
    assert(!p.contains("BatchEvalPython"), s"no Python UDF belongs here:\n$p")
  }

  test("x140 Zipf head comes from the heap operator, not a vocab-wide window") {
    val p = plan("x140_zipf_slope")
    assert(p.contains("TopKPerKeyFinal"),
      s"the top-100 head must come from the heap top-k:\n$p")
    // the only Window re-ranks the <=100-per-lang survivors; it must
    // sit ABOVE the heap operator, never on the full vocabulary
    val win = p.indexOf("Window")
    val heap = p.indexOf("TopKPerKeyFinal")
    assert(win >= 0 && win < heap,
      s"the re-rank window must consume the heap output (plan lists parents first):\n$p")
    assert(!p.contains("SinglePartition"),
      s"nothing here may collapse to one partition:\n$p")
  }

  test("x144 rolling distinct users: explode + aggregates, data-edge clip broadcast") {
    val p = plan("x144_rolling_users")
    assert(p.contains("Generate explode"), s"expected the 7-day explode in:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"only the broadcast max-day scalar may join:\n$p")
  }

  test("x149 OOV: heap top-k vocabulary, broadcast to the token stream") {
    val p = plan("x149_oov_rate")
    assert(p.contains("TakeOrderedAndProject"),
      s"the K-row vocabulary must come from the global heap top-k:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the vocabulary must broadcast to the exploded tokens:\n$p")
    assert(!p.contains("CartesianProduct"), s"nothing here may go all-pairs:\n$p")
  }

  test("x150/x152/x153: corpus collapses before the bounded-grid math") {
    val p150 = plan("x150_heaps_fit")
    assert(!p150.contains("Join"), s"x150 is a projection + one aggregate:\n$p150")
    assert(!p150.contains("Generate"),
      s"x150 needs no explode — distinct counts are array ops per row:\n$p150")
    val p152 = plan("x152_cusum")
    assert(!p152.contains("SortMergeJoin") && !p152.contains("CartesianProduct"),
      s"x152: per-type stats broadcast back to the day grid:\n$p152")
    val p153 = plan("x153_ks_drift")
    assert(!p153.contains("CartesianProduct"),
      s"x153: the only cross is the broadcast source spine:\n$p153")
  }

  test("x158 pruned read: directory-level partition filter AND row-group pushdown") {
    val df = SparkEntry.queries("x158_partition_prune")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [") && p.contains("lang"),
      s"the lang predicate must prune directories, not rows:\n$p")
    assert(p.contains("PushedFilters: [") && p.contains("GreaterThan(n_chars"),
      s"the data predicate must reach the parquet row groups:\n$p")
  }

  test("x241 zone-map skip: pruned buckets never reach the scan") {
    val df = SparkEntry.queries("x241_zonemap_skip")(spark, dir)
    // file-level receipt: the scan's input set contains the kept
    // quartiles' generations (b0, the rewritten b1) and NOT ONE file
    // from the pruned quartiles (b2, b3) — metadata pruning, not a
    // row filter
    val files = df.inputFiles
    assert(files.exists(_.contains("bkt=0")) && files.exists(_.contains("bkt=1")),
      s"kept buckets 0/1 must be scanned:\n${files.mkString("\n")}")
    assert(!files.exists(f => f.contains("bkt=2") || f.contains("bkt=3")),
      s"pruned buckets 2/3 must never reach the scan:\n${files.mkString("\n")}")
    // and bucket 1's zone map came from the REWRITE's own write job
    // (g2 generation), not a stale carry of v1's
    assert(files.filter(_.contains("bkt=1")).forall(_.contains("/g2-")),
      s"bucket 1 must be served by its v2 generation:\n${files.mkString("\n")}")
    // the residual predicate still reaches parquet for row-group
    // skipping WITHIN kept buckets
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [") && p.contains("LessThanOrEqual(doc_id"),
      s"the residual range must push to the parquet reader:\n$p")
  }

  test("x249 metadata-only aggregate: no scan task, no input file") {
    val df = SparkEntry.queries("x249_meta_agg")(spark, dir)
    // the FIXTURE build scans (commits write parquet); the ANSWER must
    // not — a LocalRelation of manifest-derived rows, zero files
    assert(df.inputFiles.isEmpty,
      s"metadata-only answer must read no file:\n${df.inputFiles.mkString("\n")}")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("FileScan"),
      s"metadata-only answer must plan no scan:\n$p")
  }

  test("x250 bloom skip: pruned buckets never reach the scan") {
    val df = SparkEntry.queries("x250_bloom_skip")(spark, dir)
    val table = graft.sources.Bucketing.buildPath(
      s"graft-txn/bloom_${Integer.toHexString(dir.hashCode)}")
    val (kept, pruned) = graft.sources.TxnLog.bloomCandidates(
      spark, table, "doc_id",
      graft.pipelines.Extensions.BloomProbes.map(_.toString))
    assert(pruned.nonEmpty, "fixture must actually skip a bucket")
    val files = df.inputFiles
    pruned.foreach(b => assert(!files.exists(_.contains(s"bkt=$b")),
      s"pruned bucket $b must never reach the scan:\n${files.mkString("\n")}"))
    kept.foreach(b => assert(files.exists(_.contains(s"bkt=$b")),
      s"kept bucket $b must be scanned:\n${files.mkString("\n")}"))
    // the residual IN still pushes into the kept parquet scans
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [") && p.contains("In(doc_id"),
      s"the residual IN must push to the parquet reader:\n$p")
  }

  test("x253 TextRank: heap top-k over keyed iteration joins, no cartesian") {
    val p = plan("x253_textrank")
    assert(p.contains("TakeOrderedAndProject"),
      s"the keyword cut must be the heap operator, never a vocab sort:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"every rank step is a keyed join:\n$p")
  }

  test("x265 conjunctive skip: buckets pruned by EITHER stat never reach the scan") {
    val df = SparkEntry.queries("x265_conj_skip")(spark, dir)
    val table = graft.sources.Bucketing.buildPath(
      s"graft-txn/conj_${Integer.toHexString(dir.hashCode)}")
    import graft.sources.TxnLog
    val d0 = graft.sources.Tables.documents(spark, dir)
    val span = d0.agg(org.apache.spark.sql.functions.max(
      org.apache.spark.sql.functions.col("doc_id"))).head.getLong(0) + 1L
    val hi = (span / 2 - 1).toString
    val preds = Seq(TxnLog.RangePred("doc_id", None, Some(hi)),
      TxnLog.PointsPred("lang", Seq("en")))
    val (kept, pruned) = TxnLog.prunedBucketsWhere(spark, table, preds)
    assert(kept.size == 1 && pruned.size == 3, s"kept=$kept pruned=$pruned")
    // the zone maps prune the high half; the Bloom sidecar prunes the
    // wrong-parity low bucket — BOTH stat kinds contribute
    val (zKept, zPruned) = TxnLog.prunedBuckets(table, "doc_id", None, Some(hi))
    assert(zPruned.size == 2 && zKept.size == 2,
      s"zone maps alone prune only the high half: $zPruned")
    val bloomPruned = pruned.diff(zPruned)
    assert(bloomPruned.size == 1,
      s"the Bloom sidecar must prune the remaining bucket: $bloomPruned")
    val files = df.inputFiles
    pruned.foreach(b => assert(!files.exists(_.contains(s"bkt=$b")),
      s"pruned bucket $b must never reach the scan:\n${files.mkString("\n")}"))
    kept.foreach(b => assert(files.exists(_.contains(s"bkt=$b")),
      s"kept bucket $b must be scanned:\n${files.mkString("\n")}"))
    // the FULL residual conjunction still pushes into the kept scans
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("LessThanOrEqual(doc_id") && p.contains("EqualTo(lang"),
      s"both conjuncts must reach the parquet reader:\n$p")
  }

  test("bloom probes plan ONE sidecar job regardless of bucket count") {
    import graft.sources.TxnLog
    val t = graft.sources.Bucketing.buildPath("graft-txn-spec/onejob")
    TxnLog.reset(t)
    import spark.implicits._
    val d0 = (0L until 64L).map(i => (i, i * 3)).toDF("doc_id", "v")
    TxnLog.commit(t, 0L, (0 until TxnLog.NumBuckets).map(b =>
      b -> d0.filter(org.apache.spark.sql.functions.col("doc_id")
        % TxnLog.NumBuckets === b)).toMap, bloomCol = Some("doc_id"))
    val sc = spark.sparkContext
    sc.setJobGroup("graft-bloom-probe", "x250 probe job count", false)
    val (kept, _) = try TxnLog.bloomCandidates(spark, t, "doc_id",
      Seq("1", "2", "987654321"))
    finally sc.clearJobGroup()
    assert(kept.nonEmpty)
    // one probe-position job per distinct geometry (equal-sized
    // fixture buckets share one) + ONE multi-path sidecar read; a
    // small slack for parquet footer inference — but never one job
    // per bucket (the r10 finding: O(buckets) serial job launches)
    val jobs = sc.statusTracker.getJobIdsForGroup("graft-bloom-probe")
    assert(jobs.length <= 3 && jobs.length < TxnLog.NumBuckets,
      s"sidecar probing must not scale jobs with buckets: ${jobs.length}")
  }

  test("x269 manifest stats pick the broadcast side AT PLAN TIME") {
    import graft.sources.TxnLog
    import org.apache.spark.sql.functions.col
    // a child session with Spark's own size-based broadcasting OFF:
    // any plan-time broadcast can only come from the manifest stats
    val sub = spark.newSession()
    sub.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val t = graft.sources.Bucketing.buildPath("graft-txn-spec/statsbhj")
    TxnLog.reset(t)
    import sub.implicits._
    val d0 = (0L until 32L).map(i => (i, i * 7)).toDF("doc_id", "v")
    TxnLog.commit(t, 0L, (0 until TxnLog.NumBuckets).map(b =>
      b -> d0.filter(col("doc_id") % TxnLog.NumBuckets === b)).toMap)
    def right = TxnLog.snapshot(sub, t).select(col("doc_id"),
      col("v").as("v2"))
    val plain = TxnLog.snapshot(sub, t).join(right, Seq("doc_id"))
    assert(!plain.queryExecution.sparkPlan.toString
      .contains("BroadcastHashJoin"),
      "with size-based broadcasting off, the plain join must not broadcast")
    val stats = TxnLog.snapshotWithStats(sub, t).join(right, Seq("doc_id"))
    assert(stats.queryExecution.sparkPlan.toString
      .contains("BroadcastHashJoin"),
      s"the manifest-stats read must broadcast at plan time:\n" +
        s"${stats.queryExecution.sparkPlan}")
    // a hint never changes rows
    assert(stats.count() === plain.count())
  }

  test("pruned-read manifest stats pick the broadcast side AT PLAN TIME") {
    import graft.sources.TxnLog
    import org.apache.spark.sql.functions.col
    // Spark's own size-based broadcasting OFF: a plan-time broadcast
    // can only come from the kept-bucket manifest stats (VERDICT r11,
    // task 5 — the pruned-read analogue of the x269 gate)
    val sub = spark.newSession()
    sub.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val t = graft.sources.Bucketing.buildPath("graft-txn-spec/prunedbhj")
    TxnLog.reset(t)
    import sub.implicits._
    val d0 = (0L until 32L).map(i => (i, i * 7)).toDF("doc_id", "v")
    // range-clustered so the zone maps actually prune
    TxnLog.commit(t, 0L, (0 until TxnLog.NumBuckets).map(b =>
      b -> d0.filter(col("doc_id") >= b * 8 && col("doc_id") < (b + 1) * 8))
      .toMap)
    val preds = Seq(TxnLog.RangePred("doc_id", None, Some("7")))
    val (kept, pruned) = TxnLog.prunedBucketsWhere(sub, t, preds)
    assert(kept === Seq(0) && pruned.size === 3)
    def right = TxnLog.snapshot(sub, t).select(col("doc_id"),
      col("v").as("v2"))
    val plain = TxnLog.snapshotWhere(sub, t, preds).join(right, Seq("doc_id"))
    assert(!plain.queryExecution.sparkPlan.toString
      .contains("BroadcastHashJoin"),
      "with size-based broadcasting off, the plain pruned join must not broadcast")
    val stats = TxnLog.snapshotWhereWithStats(sub, t, preds)
      .join(right, Seq("doc_id"))
    assert(stats.queryExecution.sparkPlan.toString
      .contains("BroadcastHashJoin"),
      s"kept-bucket stats must broadcast at plan time:\n" +
        s"${stats.queryExecution.sparkPlan}")
    assert(stats.count() === plain.count())
    // the bound is the KEPT buckets only — far under the whole table's
    val whole = TxnLog.statsSizeBound(sub, t).get
    val prunedB = TxnLog.prunedSizeBound(sub, t, preds).get
    assert(prunedB * 3 <= whole,
      s"pruned bound $prunedB must reflect kept buckets, whole $whole")
  }

  test("x263 post-OPTIMIZE snapshot plans a bare scan — no anti join survives") {
    val df = SparkEntry.queries("x263_optimize")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("LeftAnti"),
      s"OPTIMIZE must settle the deletion-vector read debt:\n$p")
  }

  test("x159 variant shredding is map-only: one parse, no shuffle, no UDF") {
    val p = plan("x159_variant_shred")
    assert(!p.contains("Exchange"), s"shredding must not shuffle:\n$p")
    assert(!p.contains("BatchEvalPython"), s"no UDF belongs here:\n$p")
  }

  test("x160 range join: banded equi-join, never a nested loop") {
    val p = plan("x160_range_join")
    assert(p.contains("BroadcastHashJoin"),
      s"the shredded dim must broadcast as an EQUI join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"the whole point is avoiding the nested-loop range join:\n$p")
  }

  test("x161/x162: global top-k via the heap, never a full sort") {
    val p161 = plan("x161_session_paths")
    assert(p161.contains("TakeOrderedAndProject"),
      s"x161: path top-k must be the heap operator:\n$p161")
    assert(!p161.contains("CartesianProduct"), s"x161:\n$p161")
    val p162 = plan("x162_pmi_colloc")
    assert(p162.contains("TakeOrderedAndProject"),
      s"x162: PMI top-k must be the heap operator:\n$p162")
    assert(!p162.contains("CartesianProduct"),
      s"x162: unigram attaches are keyed joins:\n$p162")
  }

  test("x163/x164: doc-keyed joins only, bounded output aggregates") {
    Seq("x163_calibration", "x164_ess").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
    }
  }

  test("x155/x156/x157: user-keyed collapses, grid-sized broadcasts") {
    val p155 = plan("x155_ab_test")
    assert(!p155.contains("CartesianProduct"),
      s"x155: the only cross is the broadcast 1-row arm:\n$p155")
    val p156 = plan("x156_seasonality")
    assert(!p156.contains("SortMergeJoin") && !p156.contains("CartesianProduct"),
      s"x156: the total joins back by broadcast:\n$p156")
    val p157 = plan("x157_conv_latency")
    assert(!p157.contains("CartesianProduct") && !p157.contains("Join"),
      s"x157: the as-of lookup is a window carry, never a join:\n$p157")
  }

  test("x139/x141/x147: per-key windows and broadcast stat joins only") {
    val p139 = plan("x139_ewma_daily")
    assert(!p139.contains("SortMergeJoin"),
      s"x139: the day0 scalar joins by broadcast:\n$p139")
    // the EWMA window partitions by event_type (never SinglePartition
    // with an ORDER — the grid is |types|x|days|, each type its own slice)
    assert(p139.contains("Window"), s"x139 needs its running window:\n$p139")
    val p141 = plan("x141_mad_outliers")
    assert(!p141.contains("SortMergeJoin") && !p141.contains("CartesianProduct"),
      s"x141: per-language stats must broadcast back:\n$p141")
    val p147 = plan("x147_wow_users")
    assert(!p147.contains("CartesianProduct"),
      s"x147: adjacency is an equi-join after the +1 shift:\n$p147")
  }

  test("x122 k-anonymity: one aggregation, one exchange, map-side partials") {
    val p = plan("x122_k_anonymity")
    assert(!p.contains("Join"), s"the QI audit is a pure aggregate:\n$p")
    assert(p.sliding("Exchange".length).count(_ == "Exchange") <= 2,
      s"one hash-agg exchange (plus AQE reads) at most:\n$p")
  }

  test("x124/x125: derived small sides broadcast back; no sort-merge of events") {
    Seq("x124_value_bands", "x125_gap_fill").foreach { q =>
      val df = SparkEntry.queries(q)(spark, dir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
      assert(p.contains("BroadcastHashJoin"),
        s"$q: the |types|-bounded frame must broadcast:\n$p")
      assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
        s"$q: nothing here may shuffle-sort or go quadratic:\n$p")
    }
  }

  test("x126 grouping sets: ONE aggregate pass via Expand, not a union of scans") {
    val p = plan("x126_grouping_sets")
    assert(p.contains("Expand"), s"grouping sets should plan an Expand:\n$p")
    assert(!p.contains("Union"), s"marginals must not plan as unioned scans:\n$p")
    assert(p.sliding("FileScan".length).count(_ == "FileScan") == 1,
      s"one events scan feeds both marginals:\n$p")
  }

  test("x128 calibration: candidates-only band join, sets re-joined by doc_id") {
    val df = SparkEntry.queries("x128_minhash_calib")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"calibration must stay blocked (banded), never all-pairs:\n$p")
  }

  test("x129 chi2: one Expand pass feeds cells and all marginals") {
    val df = SparkEntry.queries("x129_chi2_assoc")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(p.contains("Expand"), s"marginals should come from one grouping-sets pass:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"bounded marginal frames must broadcast onto the cells:\n$p")
  }

  test("x130 url normalization: map-only regexp chain into one aggregate, no UDF") {
    val p = plan("x130_url_norm")
    assert(!p.contains("Join"), s"canonicalization needs no join:\n$p")
    assert(!p.contains("BatchEvalPython"), s"no UDF belongs here:\n$p")
  }

  test("x132 held-out LM: model joins stay keyed, no cartesian pairing") {
    val p = plan("x132_heldout_lm")
    assert(!p.contains("CartesianProduct"),
      s"only the broadcast 1-row vocab may cross:\n$p")
  }

  test("x133 reservoir: per-stratum rank limit pushes below the sort") {
    val p = plan("x133_reservoir")
    assert(p.contains("WindowGroupLimit"),
      s"rnk<=k must become a per-partition heap (WindowGroupLimit):\n$p")
    assert(!p.contains("SinglePartition"),
      s"the reservoir window must partition by lang, never run global:\n$p")
  }

  test("x134 bloom join: map-side membership filter prunes BELOW the exact join") {
    val df = SparkEntry.queries("x134_bloom_join")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(p.contains("forall"),
      s"the bloom membership predicate must reach the physical plan:\n$p")
    // the probe must be a broadcast of the ONE packed-filter row (the
    // broadcast-scalar pattern), never a shuffle of the fact table to
    // meet the filter
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"packed filter must broadcast to the fact rows:\n$p")
    assert(!p.contains("CartesianProduct"), s"no unbroadcast cross join:\n$p")
    // the filter sits below the custkey equi-join: the Filter node
    // containing the probe must appear AFTER (deeper than) the join line
    val lines = p.linesIterator.toVector
    val joinLn = lines.indexWhere(l => l.contains("Join") && l.contains("c_custkey"))
    val probeLn = lines.indexWhere(_.contains("forall"))
    assert(joinLn >= 0 && probeLn > joinLn,
      s"bloom probe must prune before the exact join consumes the rows:\n$p")
  }

  test("x135 dp counts: one aggregate, noise is a projection on |langs| rows") {
    val p = plan("x135_dp_counts")
    assert(!p.contains("Join"), s"the mechanism needs no join:\n$p")
    assert(p.sliding("HashAggregate".length).count(_ == "HashAggregate") <= 2,
      s"one partial+final aggregate pair at most:\n$p")
  }

  test("x136-x138 governance ops: keyed joins and broadcasts only") {
    // x136: the fp self-join fans out by the source DOMAIN per key
    val p136 = plan("x136_src_overlap")
    assert(!p136.contains("CartesianProduct") && !p136.contains("BroadcastNestedLoop"),
      s"overlap matrix must join on fp, never all-pairs:\n$p136")
    // x137: a pure aggregate + projection
    val p137 = plan("x137_quality_ci")
    assert(!p137.contains("Join"), s"Wilson interval needs no join:\n$p137")
    // x138: the 10-row grid and the scalar totals broadcast
    val p138 = plan("x138_psi_drift")
    assert(!p138.contains("SortMergeJoin") && !p138.contains("CartesianProduct"),
      s"PSI joins are bounded-side broadcasts:\n$p138")
  }

  test("x165-x169 record-linkage/olap batch: keyed joins, no all-pairs") {
    // x165: neighbor pairing is an EQUI join on the global rank
    val p165 = plan("x165_sorted_neighbor")
    assert(!p165.contains("CartesianProduct"),
      s"sorted-neighborhood must pair by rank equi-join:\n$p165")
    // x166: the JW scorer joins inside the last-token block
    val df166 = SparkEntry.queries("x166_jw_match")(spark, dir)
    df166.collect() // finalize the adaptive plan so codegen stages print
    val p166 = df166.queryExecution.executedPlan.toString
    assert(!p166.contains("CartesianProduct"),
      s"JW match must join on the block key:\n$p166")
    assert(p166.linesIterator.exists(l => l.contains("*(") && l.contains("graft_jaro_winkler")),
      s"expected graft_jaro_winkler inside a codegen stage in:\n$p166")
    // x167/x168/x169: only broadcast scalars may cross
    for (q <- Seq("x167_rfm", "x168_basket_lift", "x169_pareto_front")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q must not cartesian:\n$p")
    }
    // x169: the frontier re-join onto the part table is a broadcast
    assert(plan("x169_pareto_front").contains("BroadcastHashJoin"),
      "pareto frontier must broadcast back onto parts")
  }

  test("x170-x174 batch: corpus shuffles once, small sides broadcast") {
    // x170: the lag self-join runs on the |days|-row grid, keyed
    val p170 = plan("x170_acf")
    assert(!p170.contains("CartesianProduct"), s"ACF pairs by day equi-join:\n$p170")
    // x171: both windows partition by user/session — never global
    val p171 = plan("x171_transitions")
    assert(!p171.contains("SinglePartition"),
      s"transition windows must stay user-partitioned:\n$p171")
    assert(!p171.contains("CartesianProduct"), s"no all-pairs in transitions:\n$p171")
    // x173: the per-stratum rank partitions by source (the only
    // SinglePartition exchange is the 1-row Σ-moment aggregate);
    // alloc broadcasts
    val p173 = plan("x173_neyman")
    assert(p173.contains("windowspecdefinition(source"),
      s"Neyman rank must partition by source:\n$p173")
    assert(!p173.contains("CartesianProduct"), s"alloc must broadcast:\n$p173")
    // x174: the member-cosine join must broadcast the |labels|-row
    // centroid table — the corpus never shuffles on label
    val p174 = plan("x174_label_confusion")
    assert(p174.contains("BroadcastHashJoin"),
      s"centroids must broadcast onto members:\n$p174")
    assert(!p174.contains("SortMergeJoin"),
      s"the corpus must not shuffle to meet centroids:\n$p174")
  }

  test("x172 k-core: support-filtered keyed joins only, no all-pairs") {
    val p = plan("x172_kcore")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"k-core peels must join on node/pair keys:\n$p")
  }

  test("x175-x179 batch: bounded fan-outs, keyed joins, heap top-k") {
    // x175: basket explode + broadcast singles — no all-pairs
    val p175 = plan("x175_item_neighbors")
    assert(!p175.contains("CartesianProduct"), s"item pairs from baskets:\n$p175")
    // x176: the views⋈purchases join is co-keyed on (user, session)
    val p176 = plan("x176_attribution")
    assert(!p176.contains("CartesianProduct") && !p176.contains("BroadcastNestedLoop"),
      s"attribution joins on (user_id, session_seq):\n$p176")
    // x177: per-source window partitioned; global rank two-phase; the
    // position lookup is an equi join on the rank
    val p177 = plan("x177_quantile_norm")
    assert(p177.contains("windowspecdefinition(source"),
      s"within-source rank must partition by source:\n$p177")
    assert(!p177.contains("CartesianProduct"), s"rank lookup is keyed:\n$p177")
    // x178: wedge join keyed on the middle node; top-k is the heap
    val p178 = plan("x178_link_pred")
    assert(!p178.contains("CartesianProduct"), s"wedges join on w:\n$p178")
    assert(p178.contains("TakeOrderedAndProject"),
      s"global top-k must be the heap, not a full sort:\n$p178")
    // x179: two stacked aggregates; nation broadcast
    val p179 = plan("x179_supplier_hhi")
    assert(!p179.contains("CartesianProduct"), s"HHI joins stay keyed:\n$p179")
    assert(p179.contains("BroadcastHashJoin"),
      s"the nation dim must broadcast:\n$p179")
    // x180: the corpus collapses in per-user + per-day aggregates;
    // the running windows live on the day-domain grid (their
    // SinglePartition is grid-sized by construction)
    val p180 = plan("x180_km_survival")
    assert(!p180.contains("CartesianProduct"),
      s"KM scalars must broadcast (BNLJ), never CartesianProduct:\n$p180")
    assert(p180.sliding("HashAggregate".length).count(_ == "HashAggregate") >= 2,
      s"per-user then per-day aggregates expected:\n$p180")
    // x181: the 1-row range table broadcasts; the corpus shuffles once
    val p181 = plan("x181_sq_audit")
    assert(!p181.contains("CartesianProduct"),
      s"range table must broadcast to the corpus:\n$p181")
    assert(!p181.contains("SortMergeJoin"),
      s"no corpus-vs-corpus join in the audit:\n$p181")
    // x188: the replicate fan-out is a map-side explode into ONE
    // (source × B)-keyed aggregate — no per-replicate shuffles
    val p188 = plan("x188_bootstrap_ci")
    assert(!p188.contains("CartesianProduct"),
      s"bootstrap replicates explode map-side:\n$p188")
    assert(p188.contains("Generate explode"),
      s"expected the Poisson replicate explode:\n$p188")
    // x189: the gap window rides the user partition, never global
    val p189 = plan("x189_bot_sessions")
    assert(!p189.contains("SinglePartition"),
      s"regularity windows must stay user-partitioned:\n$p189")
    // x185: FK checks are LEFT ANTI joins, never NOT-IN nested loops
    val p185 = plan("x185_dq_checks")
    assert(!p185.contains("CartesianProduct") && !p185.contains("BroadcastNestedLoop"),
      s"FK audits must anti-join on the key:\n$p185")
    // x186: one wide aggregate pass — no Expand, no per-pair rescans
    // (the pair projections read the cached 1-row moment table)
    val p186 = plan("x186_measure_corr")
    assert(!p186.contains("Expand"),
      s"moments must come from plain aggregates, not Expand:\n$p186")
    // the InMemoryRelation's child prints once per Union branch, but
    // all six pair projections read the cached 1-row moment table
    assert(p186.contains("InMemoryTableScan"),
      s"one cached moment table feeds all six correlations:\n$p186")
    // x182: the span self-join is co-keyed on (user, session)
    val p182 = plan("x182_ev_follows")
    assert(!p182.contains("CartesianProduct"),
      s"footprint joins per session, never across:\n$p182")
    // x183: rank is the two-phase shape (its spark_partition_id sits
    // under the Caching.temp InMemoryTableScan, so probe the logical
    // plan); the only SinglePartition windows are the P-row offsets
    // and the ≤14-row grid cumsum
    val p183 = plan("x183_vocab_coverage")
    assert(!p183.contains("CartesianProduct"), s"coverage joins stay keyed:\n$p183")
    // the per-range rank windows live under the Caching.temp cache
    // boundary; the visible two-phase marker is the P-row offsets
    // window ordered by the range-partition id
    assert(p183.contains("windowspecdefinition(__pid"),
      s"the vocab rank must be the two-phase range-partitioned shape:\n$p183")
    assert(!p183.contains("windowspecdefinition(tok"),
      s"never a vocabulary-wide window:\n$p183")
  }

  test("x197-x201 round-6 batch: keyed joins, no all-pairs, bounded fan-outs") {
    // x197: both corpus-scale joins (postings on tok, syms at vocab
    // scale) are keyed; the 8 merges are nested replaces in the plan,
    // never a join against a merge table
    val p197 = plan("x197_bpe_encode")
    assert(!p197.contains("CartesianProduct"), s"encode joins stay keyed:\n$p197")
    assert(!p197.contains("windowspecdefinition(tok"),
      s"never a vocabulary-wide window:\n$p197")
    // x198: the only nested-loop is the ANN leg's broadcast centroid
    // cross (K rows); the fusion is a keyed full-outer join
    val p198 = plan("x198_hybrid_rrf")
    assert(!p198.contains("CartesianProduct"),
      s"fusion legs stay keyed (broadcast NLJ on K centroids only):\n$p198")
    assert(p198.contains("FullOuter"), s"RRF fuses via full outer join:\n$p198")
    // champion-list truncation (r7): the per-term top-C must plan as
    // a WindowGroupLimit (per-partition heaps before the shuffle) —
    // losing it silently reverts to sorting saturated posting lists
    assert(p198.contains("WindowGroupLimit"),
      s"champion top-C must be WindowGroupLimit-pruned:\n$p198")
    // x200: codebooks/LUT are broadcast; candidate ADC joins are keyed
    val p200 = plan("x200_ivfpq_recall")
    assert(!p200.contains("CartesianProduct"),
      s"PQ training/ADC must broadcast the codebook, never cartesian:\n$p200")
    // x201: each LPA round is a keyed edge⋈label join (the loop runs
    // at construction; the final plan is the size join over the last
    // generation's CHECKPOINTED labels — lineage truncated per round,
    // so the visible plan is shallow: a leaf RDD scan, never the
    // unrolled 4-round join tree)
    val p201 = plan("x201_lpa_communities")
    assert(!p201.contains("CartesianProduct"), s"LPA joins stay keyed:\n$p201")
    assert(p201.contains("Scan ExistingRDD"),
      s"the final labels generation must be a checkpointed leaf:\n$p201")
    assert(!p201.contains("windowspecdefinition"),
      s"the per-node argmax is a struct-min aggregate, not a window:\n$p201")
    // x202: keyed label joins over the checkpointed generation
    val p202 = plan("x202_modularity")
    assert(!p202.contains("CartesianProduct"),
      s"modularity joins stay keyed:\n$p202")
    assert(p202.contains("Scan ExistingRDD"),
      s"labels must come from the checkpointed LPA leaf:\n$p202")
    // x203: vocab-keyed postings join, no sequence assembly
    val p203 = plan("x203_bpe_compression")
    assert(!p203.contains("CartesianProduct"),
      s"compression stats join on the token key:\n$p203")
    assert(!p203.contains("collect_list"),
      s"stats must skip the x197 id-assembly stage:\n$p203")
    // x204: three top-k frames fused by keyed joins (the only NLJ is
    // the legs' broadcast centroid cross)
    val p204 = plan("x204_fusion_eval")
    assert(!p204.contains("CartesianProduct"),
      s"fusion eval overlaps are keyed equi joins:\n$p204")
    // x205: band-keyed candidate join, never all-pairs
    val p205 = plan("x205_ingest_confirm")
    assert(!p205.contains("CartesianProduct"),
      s"confirmation pairs join on the band key:\n$p205")
  }

  test("round-7 ops: keyed joins only, bounded windows, no cartesians") {
    // x206: fp-keyed semi-join + per-DOC islands window (never an
    // unpartitioned corpus-wide window), no count-distinct Expand
    val p206 = plan("x206_exact_substr")
    assert(!p206.contains("CartesianProduct"),
      s"x206 must join on the window fp:\n$p206")
    assert(p206.contains("windowspecdefinition(doc_id"),
      s"x206 islands window must partition on doc_id:\n$p206")
    assert(!p206.contains("Expand"), s"x206 must not plan an Expand:\n$p206")
    // x207: every greedy round is a (q_id[, vec_id])-keyed join over
    // the checkpointed pool — the only NLJ allowed is the IVF leg's
    // broadcast centroid cross, which the checkpoint truncates away
    val p207 = plan("x207_mmr_select")
    assert(!p207.contains("CartesianProduct"),
      s"x207 rounds must stay keyed:\n$p207")
    assert(!p207.contains("BroadcastNestedLoopJoin"),
      s"x207 rounds must stay keyed:\n$p207")
    // x208: postings-keyed join + <=|languages| hash aggregate — no
    // window, no id-assembly collect_list
    val p208 = plan("x208_fertility")
    assert(!p208.contains("CartesianProduct"), s"x208 keyed joins only:\n$p208")
    assert(!p208.contains("collect_list"),
      s"x208 must skip the x197 id-assembly stage:\n$p208")
    // x209: the span pass + doc-keyed aggregates — keyed joins only
    val p209 = plan("x209_dup_rate")
    assert(!p209.contains("CartesianProduct"), s"x209 keyed joins only:\n$p209")
    // x210: the only nested-loop is the broadcast 1-row normalizer
    // cross (the x103/x118 shape); no CartesianProduct ever
    val p210 = plan("x210_curriculum_mix")
    assert(!p210.contains("CartesianProduct"), s"x210 keyed joins only:\n$p210")
    // x211: label-keyed broadcast joins, stacked hash aggregates
    val p211 = plan("x211_embed_outliers")
    assert(!p211.contains("CartesianProduct"), s"x211 keyed joins only:\n$p211")
    assert(!p211.contains("SortMergeJoin"),
      s"x211 label joins must broadcast (|labels| rows):\n$p211")
    // x212: five doc_id-keyed joins over pre-mined frames
    val p212 = plan("x212_corpus_manifest")
    assert(!p212.contains("CartesianProduct"), s"x212 keyed joins only:\n$p212")
  }

  test("round-8 ops: keyed joins only, bounded windows, no cartesians") {
    // x214: seeds/adjacency/rescore are all (q_id/vec_id/src)-keyed
    // equi joins; beam cuts are per-probe windows (q_id-partitioned)
    // pruned to per-partition heaps
    val p214 = plan("x214_graph_ann")
    assert(!p214.contains("CartesianProduct"),
      s"x214 beam rounds must stay keyed:\n$p214")
    assert(p214.contains("windowspecdefinition(q_id"),
      s"x214 beam windows must partition on q_id:\n$p214")
    assert(p214.contains("WindowGroupLimit"),
      s"x214 beam cut must become a per-partition heap:\n$p214")
    // x216: a snapshot read is a PLAIN multi-path parquet scan — the
    // transaction log must add zero plan nodes beyond the scan
    val p216 = plan("x216_txn_snapshot")
    assert(!p216.contains("Join"),
      s"x216 snapshot read must be a bare scan:\n$p216")
    assert(p216.contains("Scan parquet"),
      s"x216 snapshot read must scan the committed parquet:\n$p216")
    // x217: champion-capped chunk postings join on the term; the
    // champion and top-k windows are partitioned and heap-pruned
    val p217 = plan("x217_chunk_retrieval")
    assert(!p217.contains("CartesianProduct"),
      s"x217 postings joins must stay keyed:\n$p217")
    assert(p217.contains("windowspecdefinition(tok"),
      s"x217 champion window must partition on the term:\n$p217")
    assert(p217.contains("WindowGroupLimit"),
      s"x217 windows must become per-partition heaps:\n$p217")
    // x218: the ADC stage and the re-rank short-list fetch are
    // (q_id/vec_id/code)-keyed equi joins; the codebook/LUT sides
    // broadcast (M·Ksub and |probes|·M·Ksub rows)
    val p218 = plan("x218_pq_rerank")
    assert(!p218.contains("CartesianProduct"),
      s"x218 refine must stay keyed:\n$p218")
    assert(p218.contains("WindowGroupLimit"),
      s"x218 short-list/top-k cuts must be per-partition heaps:\n$p218")
    // x220: the x51 shape with field structure — workload batch
    // broadcast, postings join keyed on the term
    val p220 = plan("x220_bm25f")
    assert(!p220.contains("CartesianProduct"),
      s"x220 postings join must stay keyed:\n$p220")
    assert(p220.contains("windowspecdefinition(query"),
      s"x220 top-k must partition on the query:\n$p220")
    // x221: a merge-on-read snapshot is the bare scan plus per-bucket
    // tombstone anti joins — UNHINTED (VERDICT r8: a forced broadcast
    // on the in-principle-unbounded delete set was the one
    // scale-killer-shaped line; AQE still broadcasts the tiny fixture
    // tombstones from observed sizes, which this pins), and no
    // broadcast HINT anywhere in the snapshot plan (TxnLogSpec pins
    // the large-delete-set fallback to a non-broadcast join)
    val df221 = SparkEntry.queries("x221_delete_vectors")(spark, dir)
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    df221.queryExecution.analyzed.foreach {
      case _: ResolvedHint =>
        fail("x221 snapshot must not carry a broadcast hint (VERDICT r8)")
      case _ => ()
    }
    val p221 = df221.queryExecution.executedPlan.toString
    assert(p221.contains("LeftAnti"),
      s"x221 must subtract tombstones with an anti join:\n$p221")
    assert(p221.contains("BroadcastHashJoin"),
      s"x221 tiny tombstone sides should still broadcast via AQE/stats:\n$p221")
    assert(!p221.contains("CartesianProduct"), s"x221 keyed only:\n$p221")
  }

  test("round-9 ops: keyed joins only, heap-pruned windows, no cartesians") {
    // x226: one postings scan with champion rank attached; every
    // top-k/essential window partitions (query- or tok-keyed); the
    // candidate restriction is a semi join on (query, doc_id)
    val p226 = plan("x226_maxscore_audit")
    assert(!p226.contains("CartesianProduct"),
      s"x226 must stay keyed:\n$p226")
    assert(p226.contains("windowspecdefinition(query"),
      s"x226 per-query windows must partition on the query:\n$p226")
    assert(p226.contains("WindowGroupLimit"),
      s"x226 top-k cuts must be per-partition heaps:\n$p226")
    assert(p226.contains("LeftSemi"),
      s"x226 candidate cut must be a semi join:\n$p226")
    // x227: two x51-shaped passes; the relevance model reads ONLY the
    // R set's postings through a doc_id-keyed join
    val p227 = plan("x227_rm3_expand")
    assert(!p227.contains("CartesianProduct"),
      s"x227 must stay keyed:\n$p227")
    assert(p227.contains("windowspecdefinition(query"),
      s"x227 top-k must partition on the query:\n$p227")
    // x228: the feed is per-bucket full-outer joins on the key —
    // never a cartesian, and sortedness comes from the join, not a
    // global window
    val p228 = plan("x228_change_feed")
    assert(!p228.contains("CartesianProduct"),
      s"x228 diff must join on the key:\n$p228")
    assert(p228.contains("FullOuter"),
      s"x228 diff must be a full-outer key join:\n$p228")
    // x230: the sketch is two hash aggregates (register max, then the
    // per-type fold) — map-side partial aggregation must survive
    val p230 = plan("x230_hll_distinct")
    assert(!p230.contains("CartesianProduct"), s"x230 keyed only:\n$p230")
    assert(p230.contains("partial_max") || p230.contains("partial_"),
      s"x230 register max must combine map-side:\n$p230")
    // x232: word packing is one aggregate; the day-pair join is keyed
    // on (day, word index) — no row-level user shuffle
    val p232 = plan("x232_bitmap_retention")
    assert(!p232.contains("CartesianProduct"), s"x232 keyed only:\n$p232")
    assert(p232.contains("bit_or") || p232.contains("bitor"),
      s"x232 must pack via a bit_or aggregate:\n$p232")
    // x234: sketches are k-bounded (WindowGroupLimit heaps); the pair
    // expansion joins on the type key
    val p234 = plan("x234_kmv_setops")
    assert(!p234.contains("CartesianProduct"), s"x234 keyed only:\n$p234")
    assert(p234.contains("WindowGroupLimit"),
      s"x234 min-k cuts must be per-partition heaps:\n$p234")
    // x235: both production legs are cell-keyed joins with heap-pruned
    // per-probe windows; labels attach by vec_id-keyed joins (the
    // brute leg is the labeled audit instrument)
    val p235 = plan("x235_filtered_ann")
    assert(!p235.contains("CartesianProduct"),
      s"x235 production legs must stay cell-keyed:\n$p235")
    assert(p235.contains("WindowGroupLimit"),
      s"x235 top-k cuts must be per-partition heaps:\n$p235")
    // x236: two x51-shaped postings joins (term and bigram keys), one
    // per-query top-k heap
    val p236 = plan("x236_proximity_bm25")
    assert(!p236.contains("CartesianProduct"),
      s"x236 postings joins must stay keyed:\n$p236")
    assert(p236.contains("windowspecdefinition(query"),
      s"x236 top-k must partition on the query:\n$p236")
    // x237: the refresh is lang-keyed hash aggregates + one full-outer
    // merge — O(feed), no base-table rescan shape (no second
    // corpus-side join beyond the snapshot aggregate)
    val p237 = plan("x237_incremental_mv")
    assert(!p237.contains("CartesianProduct"), s"x237 keyed only:\n$p237")
    assert(p237.contains("FullOuter"),
      s"x237 must merge base and deltas by a full-outer key join:\n$p237")
    // x238: the sketch is one binned hash aggregate (map-side partial
    // must survive); percentile windows run over ≤ bins rows per type
    val p238 = plan("x238_hist_quantiles")
    assert(!p238.contains("CartesianProduct") ||
      p238.contains("BroadcastNestedLoopJoin"),
      s"x238: only the 1-row extrema frame may cross:\n$p238")
    assert(p238.contains("partial_"),
      s"x238 bin counts must combine map-side:\n$p238")
    // x239: the total level derives from the day registers by one
    // more max aggregate — no second raw scan shape appears beyond
    // the shared register build (both levels keyed, no cartesian)
    val p239 = plan("x239_hll_rollup")
    assert(!p239.contains("CartesianProduct"), s"x239 keyed only:\n$p239")
    assert(p239.contains("partial_max"),
      s"x239 register maxes must combine map-side:\n$p239")
    // x240: the as-of pass is ONE key shuffle + one ascending window
    // (the union-sort-carry plan), never a range or cross join
    val p240 = plan("x240_asof_tolerance")
    assert(!p240.contains("CartesianProduct"), s"x240 keyed only:\n$p240")
    assert(p240.contains("windowspecdefinition(user_id"),
      s"x240 carry window must partition on the key:\n$p240")
  }

  test("native graft_dot reaches the executed plan inside a codegen stage") {
    val df = SparkEntry.queries("x8_embed_dup_brute")(spark, dir)
    df.collect() // finalize THIS QueryExecution's adaptive plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("graft_dot"), s"expected graft_dot in:\n$p")
    assert(!p.contains("zip_with"), "HOF formulation should be gone")
    // `*(n)` prefixes mark whole-stage-codegen regions in this format;
    // the pair projection computing graft_dot must sit inside one
    assert(p.linesIterator.exists(l => l.contains("*(") && l.contains("graft_dot")),
      s"expected graft_dot inside a codegen stage in:\n$p")
  }
}
