package graft

import org.apache.spark.sql.functions._

import graft.ops.{Search, TextAnalysis}
import graft.sources.TxnLog

/** Pins the round-9 additions: MaxScore dynamic pruning (x226 —
  * losslessness AND activity), RM3 query expansion (x227 — an
  * expansion-only doc must enter round 2), the txn-log CDC change
  * feed (x228 — all three change kinds on a hand-built log), and the
  * unigram-LM perplexity filter (x229 — gibberish scores above
  * in-distribution text). */
class Round14OpsSpec extends SparkSpec {
  import spark.implicits._

  private def docsOf(rows: (Long, String)*) =
    rows.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  // ---- x226 MaxScore pruning ----------------------------------------

  /** Corpus shaped so q_hash_merge's two terms split: "hash" docs carry
    * tf 5 in short docs (high contribution), "merge" appears once in
    * long filler docs (low ub) — with 15 of each, θ comes from the
    * hash docs and the merge-only docs must be prunable. */
  private lazy val splitCorpus = docsOf(
    ((1L to 15L).map(i => i ->
      "hash hash hash hash hash") ++
      (21L to 35L).map(i => i ->
        ("merge " + Seq.fill(40)(s"filler${i}w").mkString(" ")))): _*)

  test("maxScoreAudit is lossless on every query (hits == n_exact)") {
    val rows = Search.maxScoreAudit(splitCorpus)
      .select(col("n_exact"), col("hits")).as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (ne, h) => assert(h === ne) }
  }

  test("maxScoreAudit actually prunes the weak-term-only postings") {
    val r = Search.maxScoreAudit(splitCorpus)
      .filter(col("query") === "q_hash_merge")
      .select(col("n_terms"), col("n_essential"), col("n_matching"),
        col("n_candidates"))
      .as[(Long, Long, Long, Long)].collect().head
    val (nt, ness, nm, nc) = r
    assert(nt === 2L)
    assert(ness === 1L, "the low-ub term must be non-essential")
    assert(nm === 30L)
    assert(nc === 15L, "merge-only docs must be pruned from scoring")
  }

  test("maxScoreAudit scores candidates over ALL terms, not just essential") {
    // a doc with BOTH terms must keep its merge contribution: it ranks
    // strictly above a hash-only doc of the same shape
    val corpus = docsOf(
      ((1L to 12L).map(i => i -> "hash hash hash") ++
        Seq(13L -> "hash hash hash merge") ++
        (21L to 32L).map(i => i ->
          ("merge " + Seq.fill(40)(s"f${i}w").mkString(" ")))): _*)
    val audit = Search.maxScoreAudit(corpus)
      .filter(col("query") === "q_hash_merge")
      .select(col("n_exact"), col("hits")).as[(Long, Long)].collect().head
    assert(audit._1 === audit._2)
  }

  // ---- x227 RM3 expansion -------------------------------------------

  test("rm3Expand retrieves an expansion-only doc round 1 missed") {
    // "spark"-matching docs all carry "alphaterm"; doc 99 has
    // alphaterm but NO round-1 term → reachable only through the
    // relevance model's expansion (8 originals < k=10, so the
    // expansion doc has a seat to win rather than displace)
    val corpus = docsOf(
      ((1L to 8L).map(i => i ->
        "spark join fast alphaterm alphaterm alphaterm") ++
        Seq(99L -> "alphaterm alphaterm alphaterm alphaterm") ++
        (50L to 60L).map(i => i ->
          Seq.fill(20)(s"noise${i}w").mkString(" "))): _*)
    val got = Search.rm3Expand(corpus)
      .filter(col("query") === "q_spark_join" && col("doc_id") === 99L)
      .select(col("in_r1")).as[Boolean].collect()
    assert(got.toSeq === Seq(false),
      "doc 99 must enter the top-k via expansion, flagged in_r1=false")
  }

  test("rm3Expand keeps original-term docs ranked (round 1 survivors)") {
    val corpus = docsOf(
      ((1L to 12L).map(i => i ->
        "spark join fast alphaterm alphaterm alphaterm") ++
        (50L to 60L).map(i => i ->
          Seq.fill(20)(s"noise${i}w").mkString(" "))): _*)
    val rows = Search.rm3Expand(corpus)
      .filter(col("query") === "q_spark_join")
      .select(col("doc_id"), col("in_r1")).as[(Long, Boolean)].collect()
    assert(rows.length === 10)
    assert(rows.filter(_._2).map(_._1).toSet.subsetOf((1L to 12L).toSet))
  }

  // ---- x228 change feed ----------------------------------------------

  private def tmpTable(tag: String): String = {
    val dir = java.nio.file.Files
      .createTempDirectory(s"graft-cdc-$tag").toString
    s"$dir/t"
  }

  test("changeFeed emits insert, delete and update pairs between versions") {
    val table = tmpTable("kinds")
    def route(df: org.apache.spark.sql.DataFrame) =
      (0 until TxnLog.NumBuckets).map(b => b ->
        df.filter(col("k") % TxnLog.NumBuckets === b)).toMap
    val v1 = TxnLog.commit(table, 0L,
      route(Seq((1L, 10L), (2L, 20L), (3L, 30L), (5L, 50L)).toDF("k", "v")))
    // v2: bucket 1 rewritten — k=1 updated, k=5 (≡1 mod 4) dropped
    // from the generation (an upsert-delete), k=9 inserted
    val v2 = TxnLog.commit(table, v1, Map(1 ->
      Seq((1L, 11L), (9L, 90L)).toDF("k", "v")))
    // v3: tombstone-delete k=2 (bucket 2)
    val v3 = TxnLog.commitDeletes(table, Seq(2L).toDF("k"), "k", v2)
    val got = TxnLog.changeFeed(spark, table, v1, v3, "k")
      .as[(Long, Long, String)].collect().toSet
    assert(got === Set(
      (9L, 90L, "insert"),
      (5L, 50L, "delete"),
      (2L, 20L, "delete"),
      (1L, 10L, "update_preimage"),
      (1L, 11L, "update_postimage")))
    TxnLog.reset(table)
  }

  test("changeFeed of identical versions is empty") {
    val table = tmpTable("same")
    val v1 = TxnLog.commit(table, 0L, Map(0 -> Seq((4L, 40L)).toDF("k", "v")))
    assert(TxnLog.changeFeed(spark, table, v1, v1, "k").count() === 0L)
    TxnLog.reset(table)
  }

  test("changeFeed skips unchanged buckets (no rows from untouched keys)") {
    val table = tmpTable("prune")
    val v1 = TxnLog.commit(table, 0L, Map(
      0 -> Seq((4L, 40L), (8L, 80L)).toDF("k", "v"),
      1 -> Seq((1L, 10L)).toDF("k", "v")))
    val v2 = TxnLog.commit(table, v1, Map(1 -> Seq((1L, 11L)).toDF("k", "v")))
    val got = TxnLog.changeFeed(spark, table, v1, v2, "k")
      .as[(Long, Long, String)].collect().toSet
    assert(got === Set((1L, 10L, "update_preimage"), (1L, 11L, "update_postimage")))
    TxnLog.reset(table)
  }

  // ---- x230/x231 HyperLogLog ------------------------------------------

  test("hllDistinctUsers estimates within 15% on 2k distinct users") {
    val ev = (1L to 2000L).map(u => (u, "buy")).toDF("user_id", "event_type")
    val r = graft.ops.DataProfile.hllDistinctUsers(ev)
      .select(col("n_exact"), col("hll_est")).as[(Long, Double)]
      .collect().head
    assert(r._1 === 2000L)
    assert(math.abs(r._2 - 2000.0) / 2000.0 < 0.15, s"est ${r._2}")
  }

  test("HLL registers merge by max: sketch(A union B) == max-merge of sketches") {
    import graft.ops.DataProfile
    def regs(df: org.apache.spark.sql.DataFrame) = df
      .select(col("event_type"), DataProfile.hllReg(col("user_id")).as("j"),
        DataProfile.hllRank(col("user_id")).as("rho"))
      .groupBy(col("event_type"), col("j")).agg(max(col("rho")).as("m"))
    val a = (1L to 700L).map(u => (u, "t")).toDF("user_id", "event_type")
    val b = (400L to 1200L).map(u => (u, "t")).toDF("user_id", "event_type")
    val merged = DataProfile.hllFinalize(
      regs(a).unionByName(regs(b))
        .groupBy(col("event_type"), col("j")).agg(max(col("m")).as("m")),
      Seq("event_type")).select(col("hll_est")).as[Double].collect().head
    val direct = DataProfile.hllFinalize(regs(a.unionByName(b)),
      Seq("event_type")).select(col("hll_est")).as[Double].collect().head
    assert(merged === direct)
  }

  test("hllFinalize switches to linear counting in the small range") {
    val regs = Seq(("t", 0L, 1)).toDF("event_type", "j", "m")
    val est = graft.ops.DataProfile.hllFinalize(regs, Seq("event_type"))
      .select(col("hll_est")).as[Double].collect().head
    val want = math.floor(256.0 * math.log(256.0 / 255.0) * 10000 + 0.5) / 10000
    assert(est === want)
  }

  // ---- x232 bitmap retention ------------------------------------------

  test("bitmapRetention counts next-day survivors across word boundaries") {
    // users 63/64 straddle a 64-bit word boundary; day1 {1,63,64,200},
    // day2 {63,64,300} → retained(day1) = 2
    val ts1 = "2024-01-01 10:00:00"
    val ts2 = "2024-01-02 10:00:00"
    val ev = Seq(
      (1L, ts1), (63L, ts1), (64L, ts1), (200L, ts1),
      (63L, ts2), (64L, ts2), (300L, ts2))
      .toDF("user_id", "s").select(col("user_id"),
        col("s").cast("timestamp").as("ts"))
    val got = graft.ops.Events.bitmapRetention(ev)
      .as[(String, Long, Long, Double)].collect().toSet
    assert(got === Set(
      ("2024-01-01", 4L, 2L, 0.5),
      ("2024-01-02", 3L, 0L, 0.0)))
  }

  // ---- x233 personalized PageRank --------------------------------------

  test("personalizedPagerank confines rank to components reachable from seeds") {
    // component {10, 11} holds seed 10 (10 % 10 == 0); component
    // {3, 7} holds none → its nodes must sit at exactly 0
    val pairs = Seq((10L, 11L), (3L, 7L)).toDF("doc_a", "doc_b")
    val got = graft.ops.Graph.personalizedPagerankFrom(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got(3L) === 0L && got(7L) === 0L)
    // the 2-cycle's exact 5-step integer trajectory (hand-traced:
    // mass oscillates across the cycle, teleport re-arms the seed)
    assert(got(10L) === 336675937L)
    assert(got(11L) === 663324062L)
  }

  // ---- x234 KMV set operations -----------------------------------------

  test("kmvSetOps is exact below the sketch size k") {
    val ev = ((1L to 10L).map(u => (u, "a")) ++ (6L to 15L).map(u => (u, "b")))
      .toDF("user_id", "event_type")
    val r = graft.ops.DataProfile.kmvSetOps(ev)
      .select(col("exact_union"), col("exact_inter"), col("kmv_union"),
        col("jaccard_est"), col("kmv_inter"))
      .as[(Long, Long, Double, Double, Double)].collect().head
    assert(r._1 === 15L && r._2 === 5L)
    assert(r._3 === 15.0, "merged sketch below k is the exact union")
    assert(r._4 === 0.3333 && r._5 === 4.9995)
  }

  test("kmvSetOps estimates a 150-union / 50-inter pair within sketch error") {
    val ev = ((1L to 100L).map(u => (u, "a")) ++
      (51L to 150L).map(u => (u, "b"))).toDF("user_id", "event_type")
    val r = graft.ops.DataProfile.kmvSetOps(ev)
      .select(col("exact_union"), col("exact_inter"), col("kmv_union"),
        col("kmv_inter")).as[(Long, Long, Double, Double)].collect().head
    assert(r._1 === 150L && r._2 === 50L)
    assert(math.abs(r._3 - 150.0) / 150.0 < 0.35, s"union est ${r._3}")
    assert(math.abs(r._4 - 50.0) / 50.0 < 0.5, s"inter est ${r._4}")
  }

  // ---- x235 filtered ANN ------------------------------------------------

  private def embOf(rows: (Long, Long, Array[Float])*) =
    rows.toSeq.toDF("vec_id", "label", "embedding")

  test("filtered ANN: pre-filter dominates post-filter per probe") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val rows = graft.ops.Similarity.filteredAnnRecall(embs)
      .select(col("recall_pre"), col("recall_post"))
      .as[(Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (pre, post) =>
      assert(pre >= post,
        s"post-filter is a restriction of the pre-filter list: $pre vs $post")
    }
  }

  test("filtered ANN: post-filter starves when the near field is disallowed") {
    // probe 0 (label 0); 50 near-identical DISALLOWED vectors crowd the
    // unfiltered top-40, so the post-filter leg retains nothing while
    // the pre-filter leg recovers the 12 farther allowed vectors
    val near = (1L to 50L).map(i =>
      (i, 1L, Array(1.0f, 0.001f * i)))
    val far = (51L to 62L).map(i =>
      (i, 2L, Array(0.3f, 1.0f + 0.001f * i)))
    val embs = embOf(((0L, 0L, Array(1.0f, 0.0f)) +: (near ++ far)): _*)
    val r = graft.ops.Similarity.filteredAnnRecall(embs)
      .select(col("q_id"), col("n_exact"), col("pre_hits"), col("post_hits"))
      .as[(Long, Long, Long, Long)].collect()
    assert(r.length === 1 && r.head._1 === 0L)
    assert(r.head._2 === 10L)
    assert(r.head._3 === 10L, "pre-filter must recover the allowed field")
    assert(r.head._4 === 0L, "post-filter must starve at 4x oversampling")
  }

  // ---- x236 proximity BM25 ----------------------------------------------

  test("proximityBm25 ranks the phrase match above the scattered match") {
    // same unigram profile (tf 1 each, dl 5) — only adjacency differs
    val docs = docsOf(
      1L -> "spark join fast pad1 pad2",
      2L -> "spark pad3 join pad4 fast")
    val got = graft.ops.Search.proximityBm25(docs)
      .filter(col("query") === "q_spark_join")
      .select(col("doc_id"), col("rnk")).as[(Long, Long)].collect().toMap
    assert(got(1L) < got(2L),
      s"adjacent-phrase doc must outrank the scattered doc: $got")
  }

  // ---- x237 incremental view maintenance --------------------------------

  test("change-feed deltas advance a v1 aggregate exactly to the v3 state") {
    val table = tmpTable("ivm")
    def route(df: org.apache.spark.sql.DataFrame) =
      (0 until TxnLog.NumBuckets).map(b => b ->
        df.filter(col("k") % TxnLog.NumBuckets === b)).toMap
    val v1 = TxnLog.commit(table, 0L,
      route(Seq((1L, 10L), (2L, 20L), (3L, 30L), (5L, 50L)).toDF("k", "v")))
    val v2 = TxnLog.commit(table, v1, Map(1 ->
      Seq((1L, 11L), (9L, 90L)).toDF("k", "v")))
    val v3 = TxnLog.commitDeletes(table, Seq(2L).toDF("k"), "k", v2)
    val base = TxnLog.snapshot(spark, table, v1)
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      .as[(Long, Long)].collect().head
    val sign = when(col("change_type") === "insert", 1L)
      .when(col("change_type") === "update_postimage", 1L).otherwise(-1L)
    val d = TxnLog.changeFeed(spark, table, v1, v3, "k")
      .agg(sum(sign).as("dn"), sum(sign * col("v")).as("ds"))
      .as[(Long, Long)].collect().head
    val want = TxnLog.snapshot(spark, table, v3)
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      .as[(Long, Long)].collect().head
    assert((base._1 + d._1, base._2 + d._2) === want)
    TxnLog.reset(table)
  }

  // ---- x238 histogram quantiles ------------------------------------------

  test("histQuantiles: estimates land within one bin of the exact values") {
    val ev = (1L to 100L).map(i => ("t", i.toDouble))
      .toDF("event_type", "value")
    val r = graft.ops.DataProfile.histQuantiles(ev)
      .select(col("n"), col("p50_exact"), col("p50_est"),
        col("p90_exact"), col("p90_est"), col("p99_exact"), col("p99_est"))
      .as[(Long, Double, Double, Double, Double, Double, Double)]
      .collect().head
    assert(r._1 === 100L)
    assert(r._2 === 50.0 && r._4 === 90.0 && r._6 === 99.0)
    val binW = 99.0 / graft.ops.DataProfile.HistBins
    Seq((r._2, r._3), (r._4, r._5), (r._6, r._7)).foreach { case (ex, est) =>
      assert(est >= ex - 1e-9 && est <= ex + binW + 1e-9,
        s"estimate $est must sit within one right-edge bin of $ex")
    }
  }

  // ---- x239 HLL rollup ----------------------------------------------------

  test("hllRollup: the merged total equals the direct single-pass sketch") {
    import graft.ops.DataProfile
    val ev = ((1L to 400L).map(u => (u, "2024-01-01 10:00:00")) ++
      (201L to 600L).map(u => (u, "2024-01-02 10:00:00")))
      .toDF("user_id", "s")
      .select(col("user_id"), col("s").cast("timestamp").as("ts"))
    val rolled = DataProfile.hllRollup(ev)
      .filter(col("level") === "total")
      .select(col("n_exact"), col("hll_est")).as[(Long, Double)]
      .collect().head
    assert(rolled._1 === 600L)
    val direct = DataProfile.hllFinalize(
      ev.select(lit("all").as("g"), DataProfile.hllReg(col("user_id")).as("j"),
        DataProfile.hllRank(col("user_id")).as("rho"))
        .groupBy(col("g"), col("j")).agg(max(col("rho")).as("m")),
      Seq("g")).select(col("hll_est")).as[Double].collect().head
    assert(rolled._2 === direct,
      "register merge must reproduce the single-pass registers exactly")
  }

  // ---- x240 as-of tolerance -------------------------------------------------

  test("asof tolerance: fresh match carries, stale and absent reject") {
    val rows = Seq(
      (1L, "signup", 7L, "2024-01-01 00:00:00"),
      (2L, "purchase", 7L, "2024-01-02 00:00:00"),  // 1 day  -> fresh
      (3L, "purchase", 7L, "2024-01-11 00:00:00"),  // 10 days -> stale
      (4L, "purchase", 8L, "2024-01-02 00:00:00"))  // no signup
      .toDF("event_id", "event_type", "user_id", "s")
      .select(col("event_id"), col("event_type"), col("user_id"),
        col("s").cast("timestamp").as("ts"))
    val got = graft.ops.Temporal.purchaseAsofTolerance(rows)
      .select(col("buy_id"), col("signup_id"), col("lag_ms"), col("matched"))
      .as[(Long, Option[Long], Option[Long], Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(2L) === ((2L, Some(1L), Some(86400000L), true)))
    assert(got(3L) === ((3L, None, None, false)))
    assert(got(4L) === ((4L, None, None, false)))
  }

  // ---- x229 unigram perplexity filter --------------------------------

  test("unigramPplFilter scores gibberish above in-distribution text") {
    val corpus = docsOf(
      ((1L to 20L).map(i => i ->
        Seq.fill(10)("the cat sat on the mat").mkString(" ")) ++
        Seq(99L -> "zq xv qj vx zx qq jzq vqz xqj zzv")): _*)
    val pieces = TextAnalysis.unigramPiecesList(corpus)
    val got = TextAnalysis.unigramPplFilter(corpus, pieces)
      .select(col("doc_id"), col("nll")).as[(Long, Double)].collect()
      .toMap
    assert(got(99L) > got(1L),
      s"gibberish nll ${got(99L)} must exceed common-text nll ${got(1L)}")
    got.values.foreach(nll => assert(nll > 0.0))
  }

  test("unigramPplFilter's kept flag matches the 4dp threshold") {
    val corpus = docsOf(
      ((1L to 8L).map(i => i -> "aa bb aa bb aa bb")): _*)
    val pieces = TextAnalysis.unigramPiecesList(corpus)
    val rows = TextAnalysis.unigramPplFilter(corpus, pieces)
      .select(col("nll"), col("kept")).as[(Double, Boolean)].collect()
    rows.foreach { case (nll, kept) =>
      assert(kept === (nll <= TextAnalysis.UniPplCut))
    }
  }
}
