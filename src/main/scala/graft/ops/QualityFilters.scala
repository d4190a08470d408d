package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis._
import graft.ops.Portable.round4

/** Corpus-quality filter stages from the public LLM-data pipelines:
  * Gopher's document-level rule battery (Rae et al. '21,
  * arXiv:2112.11446 Table A1), C4's line-level filters (Raffel et
  * al. '20, arXiv:1910.10683 §2.2) and source mixture reweighting
  * (the Pile / DoReMi-style static mixture, arXiv:2101.00027 /
  * arXiv:2305.10429). The reference engine has none of these — they
  * are the beyond-reference curation track (SURVEY.md §8.2), with
  * thresholds adapted to the synthetic fixture corpus's scale so each
  * rule actually splits it (Gopher's 50..100k word bounds would pass
  * every 10-100-word fixture doc).
  *
  * Scale design: x101/x102 are map-only projections over the document
  * scan — no shuffle, no UDFs; the per-line/per-bigram work runs in
  * higher-order array expressions whose cost is bounded by the
  * document length, embarrassingly parallel at 100 TB. x103 is one
  * low-cardinality hash aggregate (map-side combined) plus a
  * broadcast-scalar normalizer join — the grouped side never
  * re-shuffles.
  */
object QualityFilters {

  // ---- x101 Gopher rule battery ------------------------------------

  /** Word-count bounds (Gopher: [50, 100k], scaled to the fixture). */
  val MinWords = 30
  val MaxWords = 90
  /** Mean-word-length bounds (Gopher's own [3, 10]). */
  val MinMeanLen = 3.0
  val MaxMeanLen = 10.0
  /** Minimum stopword hits (Gopher requires ≥ 2 of its list). */
  val MinStopHits = 2
  /** Max fraction of bigrams taken by the most frequent bigram
    * (Gopher bounds the top-2-gram character share at 0.20). */
  val MaxTopBigramFrac = 0.1
  /** Min distinct-word ratio (Gopher's duplicate-content family). */
  val MinDistinctRatio = 0.3

  /** Most-frequent-element share of `arr` (0.0 when empty). Computed
    * as the longest equal-run in the SORTED array via one aggregate
    * fold — O(d log d) per row. The obvious distinct×count form
    * (transform over array_distinct, filter per member) is O(d²) in
    * interpreted higher-order lambdas and measured 15 s for the whole
    * corpus at sf0.1 vs sub-second for this fold. */
  private def topShare(arr: Column): Column = {
    val folded = aggregate(array_sort(arr),
      struct(lit(null).cast("string").as("prev"),
             lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
               greatest(acc.getField("best"), run).as("best"))
      })
    when(size(arr) > 0,
      round4(folded.getField("best").cast("double") / size(arr)))
      .otherwise(lit(0.0))
  }

  /** One row per document: the Gopher rule metrics, one 0/1 flag per
    * rule, and the conjunction `keep`. Everything derives from one
    * token-array expression — a single codegen'd projection. */
  def gopherRules(documents: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val base = documents.select(
      col("doc_id"),
      toks.as("toks"),
      size(toks).cast("long").as("n_words"),
      stopwordCount(toks).cast("long").as("stop_hits"))
    val withM = base.select(
      col("doc_id"), col("n_words"), col("stop_hits"),
      when(col("n_words") > 0, round4(
        aggregate(transform(col("toks"), t => length(t)), lit(0L), _ + _)
          .cast("double") / col("n_words"))).otherwise(lit(0.0)).as("mean_word_len"),
      when(col("n_words") > 0, round4(
        size(array_distinct(col("toks"))).cast("double") / col("n_words")))
        .otherwise(lit(0.0)).as("distinct_ratio"),
      topShare(when(size(col("toks")) >= 2,
        transform(sequence(lit(0), size(col("toks")) - 2),
          i => concat_ws(" ", slice(col("toks"), i + 1, lit(2)))))
        .otherwise(array().cast("array<string>"))).as("top_bigram_frac"))
    val okWords = col("n_words").between(MinWords, MaxWords)
    val okMwl   = col("mean_word_len").between(MinMeanLen, MaxMeanLen)
    val okStop  = col("stop_hits") >= MinStopHits
    val okRep   = col("top_bigram_frac") <= MaxTopBigramFrac &&
                  col("distinct_ratio") >= MinDistinctRatio
    withM.select(
      col("doc_id"), col("n_words"), col("mean_word_len"),
      col("stop_hits"), col("distinct_ratio"), col("top_bigram_frac"),
      okWords.cast("long").as("ok_words"),
      okMwl.cast("long").as("ok_mean_len"),
      okStop.cast("long").as("ok_stop"),
      okRep.cast("long").as("ok_repetition"),
      (okWords && okMwl && okStop && okRep).cast("long").as("keep"))
  }

  // ---- x102 C4 line filters ----------------------------------------

  /** Minimum words per kept line (C4 drops lines under 5 words). */
  val MinLineWords = 5
  /** Stand-in for C4's badword blocklist — the fixture vocabulary has
    * no organic blocklist hits, so one of its own common words plays
    * the part (same simulation convention as x99's injected PII). */
  val BlockToken = "slow"

  /** C4's filters are LINE-level, but the fixture text is a single
    * unpunctuated line — so lines are synthesized deterministically:
    * fixed-width runs of `8 + doc_id % 5` tokens, where line `i` of
    * doc `d` carries terminal punctuation iff `(d + i) % 4 != 0`.
    * Both engines run the identical synthesis (mirrored in
    * [[graft.pipelines.ExtSql]]), so the oracle exercises real
    * mixed-verdict line filtering. A line is kept iff it has ≥
    * [[MinLineWords]] words AND ends terminally AND lacks
    * [[BlockToken]]; the output carries the md5 of the surviving
    * lines re-joined with newlines (C4's cleaned document). */
  def c4LineFilters(documents: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val w = (lit(8) + pmod(col("doc_id"), lit(5))).cast("int")
    val base = documents.select(col("doc_id"), toks.as("toks"), w.as("w"))
    val nLines = floor((size(col("toks")) + col("w") - 1) / col("w")).cast("int")
    val lines = when(size(col("toks")) > 0,
      transform(sequence(lit(0), nLines - 1), i => {
        val lt       = slice(col("toks"), i * col("w") + 1, col("w"))
        val terminal = pmod(col("doc_id") + i, lit(4)) =!= 0
        val out      = concat(concat_ws(" ", lt), when(terminal, lit(".")).otherwise(lit("")))
        val keep     = size(lt) >= MinLineWords && terminal && !array_contains(lt, BlockToken)
        struct(out.as("out"), size(lt).cast("long").as("nw"), keep.as("keep"))
      })).otherwise(array().cast("array<struct<out:string,nw:bigint,keep:boolean>>"))
    base.select(col("doc_id"), lines.as("lines"))
      .select(
        col("doc_id"),
        size(col("lines")).cast("long").as("n_lines"),
        size(filter(col("lines"), l => l.getField("keep"))).cast("long").as("n_kept"),
        aggregate(filter(col("lines"), l => l.getField("keep")),
          lit(0L), (a, l) => a + l.getField("nw")).as("n_kept_words"),
        md5(concat_ws("\n",
          transform(filter(col("lines"), l => l.getField("keep")),
            l => l.getField("out")))).as("clean_fp"))
  }

  // ---- x103 source mixture weights ---------------------------------

  /** Mixture temperature: weight ∝ tokens^Alpha (α < 1 upweights
    * small sources, the standard static-mixture shape). */
  val MixtureAlpha = 0.3

  /** Per-source token counts and normalized sampling weights. The
    * aggregate is map-side combined onto ~|sources| rows; the
    * normalizer is an unpartitioned window over that ALREADY-GROUPED
    * frame — bounded by the source cardinality (tens, never corpus-
    * scale; same bounded-window pattern as x60's P-row offsets table,
    * PlanSpec-gated), which costs one ~20-row exchange instead of a
    * second full corpus scan+aggregate. */
  def mixtureWeights(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perSource = documents
      .select(col("source"), tokenCount(col("text")).cast("long").as("nt"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
    val w = pow(col("n_tokens").cast("double"), MixtureAlpha)
    perSource.select(col("source"), col("n_docs"), col("n_tokens"),
      round4(w / sum(w).over(Window.partitionBy())).as("weight"))
  }

  // ---- x106 temperature-scaled mixture sampling --------------------

  /** Total sample budget the x103 weights are spent against. */
  val SampleTarget = 200

  /** x106: draw the x103 mixture — each source contributes
    * `max(1, round(weight · SampleTarget))` documents, chosen as the
    * first `n_take` in the source's deterministic content-addressed
    * order (`md5(doc_id)`, the same driverless coin every sampler in
    * this engine flips — x29/x33/x74). Output is the drawn docs with
    * their in-source rank and the weight that bought them.
    *
    * Scale: the weights frame is source-cardinality (tens of rows) →
    * broadcast; the corpus shuffles ONCE on `source` for the per-group
    * rank. The grouped window is the standard per-source sort shape;
    * when only small constant k per source is wanted, the x87 heap
    * top-k planner op is the no-sort fast path — here k varies per
    * source, so the sort-based window is the right general form. */
  def mixtureSample(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val weights = mixtureWeights(documents).select(col("source"), col("weight"))
    val nTake = greatest(lit(1L),
      floor(col("weight") * SampleTarget + 0.5).cast("long"))
    documents.select(col("doc_id"), col("source"))
      .join(broadcast(weights), Seq("source"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))))
      .filter(col("rnk") <= nTake)
      .select(col("doc_id"), col("source"),
        col("rnk").cast("long").as("rnk"), col("weight"))
  }

  // ---- x107 linear quality-classifier score ------------------------

  /** Fixed public weights of the logistic quality classifier over the
    * x101 Gopher metrics — the fastText-style "quality classifier"
    * stage of the LLaMA/CCNet pipelines (arXiv:2302.13971 §2,
    * arXiv:1911.00359), reduced to its linear scoring shape with
    * hand-set coefficients (no training data exists in-fixture; what
    * matters is the feature plumbing and the cross-engine math). */
  val ClfBias       = -1.7
  val ClfWordsW     = 0.02
  val ClfStopW      = 0.05
  val ClfDistinctW  = 0.8
  val ClfMeanLenW   = -0.1
  val ClfBigramW    = -4.0

  /** x107: per-doc logit + sigmoid score + the ≥0.5 keep label, all
    * derived from [[gopherRules]]'s (already 4dp-rounded) metrics so
    * both engines score identical inputs. One extra projection on top
    * of the x101 map-only plan — still zero shuffles.
    *
    * Determinism: because every input is 4dp-rounded and every
    * coefficient is a short decimal, the exact logit is always a
    * multiple of 1e-5 — `round4(z)` would sit ON the half-boundary
    * for ~10 % of docs and the two engines' fp representation error
    * would tie-break differently (observed: 10/500 one-ulp logit
    * flips at sf0.001). So the logit is assembled in EXACT integer
    * micro-units (1e-5) and divided once: both engines produce the
    * bit-identical double, no rounding step at all. The sigmoid keeps
    * the 4dp round — `exp` of a transcendental never lands on a
    * boundary (same argument as x103's `pow`). */
  def classifierScore(documents: DataFrame): DataFrame = {
    // exact integer micro-coefficients derived from the Clf* values:
    // counts carry 1e-5-unit weights; the 4dp ratio metrics are first
    // re-scaled to exact integers (×1e4) so their weights carry ×10
    val rDist = round(col("distinct_ratio") * 10000).cast("long")
    val rMean = round(col("mean_word_len") * 10000).cast("long")
    val rBig  = round(col("top_bigram_frac") * 10000).cast("long")
    val zE5 = lit(math.round(ClfBias * 100000)) +
      col("n_words")   * lit(math.round(ClfWordsW * 100000)) +
      col("stop_hits") * lit(math.round(ClfStopW * 100000)) +
      rDist * lit(math.round(ClfDistinctW * 10)) +
      rMean * lit(math.round(ClfMeanLenW * 10)) +
      rBig  * lit(math.round(ClfBigramW * 10))
    val z = zE5.cast("double") / 100000.0
    val score = round4(lit(1.0) / (lit(1.0) + exp(-z)))
    gopherRules(documents).select(
      col("doc_id"),
      z.as("logit"),
      score.as("clf_score"),
      (score >= 0.5).cast("long").as("clf_keep"))
  }

  // ---- x118 UniMax budget allocation -------------------------------

  /** Per-source epoch cap for [[unimaxAlloc]], in tenths (11 = 1.1
    * epochs) so the cap is exact integer arithmetic. */
  val UnimaxCapTenths = 11L

  /** x118: UniMax sampling allocation (Chung et al. '23,
    * arXiv:2304.09151) — distribute a total token budget over sources
    * so no source repeats more than C epochs: walk sources SMALLEST
    * first; a source takes min(its C-epoch cap, an equal share of the
    * remaining budget). Small sources cap out; the freed budget
    * spreads evenly over the larger ones. The greedy walk has a
    * closed form over the size-sorted prefix — source i is capped iff
    * every j ≤ i satisfies cap_j·(m−j+1) + Σ_{l<j} cap_l ≤ B — so the
    * whole allocation is two windows over the |sources|-row grouped
    * frame (the x103 bounded-window pattern; the corpus itself
    * collapses in one aggregate and never re-shuffles). Budget B =
    * total corpus tokens (one average epoch); all arithmetic is exact
    * integer (caps in tenths, floor-div fair share), so both engines
    * agree bit-for-bit; only the final epochs ratio rounds 4dp. */
  def unimaxAlloc(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val src = withTokens(documents)
      .select(col("source"), size(col("toks")).cast("long").as("n"))
      .groupBy(col("source")).agg(sum(col("n")).as("n_tokens"))
      .withColumn("cap_tokens", expr(s"n_tokens * $UnimaxCapTenths div 10"))
    val tot = src.agg(sum(col("n_tokens")).as("budget"))
    val wOrd = Window.orderBy(col("cap_tokens").asc, col("source").asc)
    val wAll = Window.partitionBy()
    val ranked = src.crossJoin(broadcast(tot))
      .withColumn("idx", row_number().over(wOrd).cast("long"))
      .withColumn("m", count(lit(1)).over(wAll))
      .withColumn("cum_before",
        coalesce(sum(col("cap_tokens")).over(wOrd) - col("cap_tokens"), lit(0L)))
      .withColumn("cond",
        (col("cap_tokens") * (col("m") - col("idx") + 1) + col("cum_before") <=
          col("budget")).cast("int"))
      .withColumn("capped", (min(col("cond")).over(wOrd) === 1).cast("long"))
    ranked
      .withColumn("k", sum(col("capped")).over(wAll))
      .withColumn("capped_sum",
        coalesce(sum(when(col("capped") === 1, col("cap_tokens"))).over(wAll), lit(0L)))
      .withColumn("alloc_tokens",
        when(col("capped") === 1, col("cap_tokens"))
          .otherwise(expr("(budget - capped_sum) div (m - k)")))
      .select(col("source"), col("n_tokens"), col("cap_tokens"), col("capped"),
        col("alloc_tokens"),
        round4(col("alloc_tokens").cast("double") / col("n_tokens")).as("epochs"))
  }

  // ---- x210 curriculum mix table -----------------------------------

  /** x210: CURRICULUM MIX TABLE — the sampler input that fuses the
    * engine's three corpus-organization axes: semantic community
    * (the x201 LPA labels over the mutual-kNN graph — the fixture's
    * doc_id ≡ vec_id), predicted language (x2) and quality (the x17
    * score). Per (community, pred_lang): doc count, 4dp mean quality,
    * and a sqrt-allocation sampling weight (sqrt dampens head
    * communities the way x118's cap dampens epochs — the standard
    * multilingual-sampling temperature of 0.5, applied to
    * communities). Docs OUTSIDE the kNN graph land in community −1:
    * the unclustered pool a curriculum must still budget for.
    *
    * Determinism: quality snaps to the 1e-4 grid per doc BEFORE the
    * mean (integer sums commute — the x174 cohesion convention);
    * sqrt(n) snaps to the same grid before the exact-integer
    * normalizer sum; two final 4dp divisions.
    *
    * Scale: one map-only projection of the document scan (langid +
    * quality), one left join against the node-sized label frame, one
    * low-cardinality hash aggregate, one broadcast-scalar normalizer
    * — the x103 shape with the community axis joined in. */
  def curriculumMix(labels: DataFrame, documents: DataFrame): DataFrame = {
    val lab = labels.select(col("u").as("doc_id"), col("lbl").as("community"))
    val perDoc = withTokens(documents)
      .select(col("doc_id"),
        TextAnalysis.langId(col("toks")).as("pred_lang"),
        floor(qualityScore(col("text"), col("toks")) * 10000 + lit(0.5))
          .cast("long").as("q4"))
      .join(lab, Seq("doc_id"), "left")
      .select(coalesce(col("community"), lit(-1L)).as("community"),
        col("pred_lang"), col("q4"))
    val grouped = perDoc.groupBy(col("community"), col("pred_lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("q4")).as("sq4"))
      .withColumn("s4",
        floor(sqrt(col("n_docs").cast("double")) * 10000 + lit(0.5)).cast("long"))
    val tot = grouped.agg(sum(col("s4")).as("w_total"))
    grouped.crossJoin(broadcast(tot))
      .select(col("community"), col("pred_lang"), col("n_docs"),
        round4(col("sq4").cast("double") /
          (col("n_docs") * 10000L).cast("double")).as("mean_quality"),
        round4(col("s4").cast("double") / col("w_total").cast("double"))
          .as("mix_weight"))
  }

  // ---- x212 corpus curation manifest -------------------------------

  /** x212: CORPUS CURATION MANIFEST — the end-to-end decision table a
    * production pipeline materializes: one row per document with the
    * final keep/drop verdict and the FIRST failing stage as the
    * reason, fusing the curation battery in application order:
    *  1. `heldout`      — val/test split member (x29): not training
    *     data at all;
    *  2. `exact_dup`    — not its fingerprint group's keeper (x4);
    *  3. `near_dup`     — in an LSH cluster (x30) and not the x86
    *     representative (longest text, doc_id tie-break);
    *  4. `low_quality`  — fails the Gopher battery (x101);
    *  5. `contaminated` — train doc sharing ≥3 capped shingles with a
    *     test-split doc (the x37 train side);
    *  6. `keep`.
    * The cascade order matters and is part of the contract: a
    * near-dup loser that is ALSO low quality reports `near_dup` (the
    * cheaper stage to attribute), mirroring how the reference's rule
    * cascades report the first matching verdict (SURVEY.md §2.8).
    *
    * Scale: every stage is an existing audited shape — map-only
    * fingerprints/split/quality, the cluster frame and contamination
    * pairs arrive PRE-MINED (callers pass the shared memos), and the
    * fusion itself is five doc_id-keyed joins of doc-or-smaller-sized
    * frames. Nothing here adds a shuffle beyond the stages already
    * measured. */
  def corpusManifest(documents: DataFrame, clusters: DataFrame,
                     contam: DataFrame): DataFrame = {
    val split = TextAnalysis.splitAssign(documents)
      .select(col("doc_id"), col("split"))
    val exact = documents
      .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .join(Dedup.exactDedup(documents).select(col("fp"), col("keep_doc_id")),
        Seq("fp"))
      .select(col("doc_id"),
        (col("doc_id") =!= col("keep_doc_id")).cast("long").as("exact_loser"))
    val cl = clusters.select(col("doc_id"), col("cluster_id"))
      .join(documents.select(col("doc_id"), col("n_chars")), Seq("doc_id"))
    val reps = cl.groupBy(col("cluster_id"))
      .agg(min(struct((-col("n_chars")).as("nc"), col("doc_id"))).as("m"))
      .select(col("cluster_id"), col("m.doc_id").as("rep_doc"))
    val nearLoser = cl.join(reps, Seq("cluster_id"))
      .select(col("doc_id"),
        (col("doc_id") =!= col("rep_doc")).cast("long").as("near_loser"))
    val quality = gopherRules(documents).select(col("doc_id"), col("keep"))
    val contamFlag = contam.select(col("train_doc").as("doc_id")).distinct()
      .withColumn("contam", lit(1L))
    documents.select(col("doc_id"), col("source"))
      .join(split, Seq("doc_id"))
      .join(exact, Seq("doc_id"))
      .join(nearLoser, Seq("doc_id"), "left")
      .join(quality, Seq("doc_id"))
      .join(contamFlag, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"), col("split"),
        when(col("split") =!= "train", "heldout")
          .when(col("exact_loser") === 1, "exact_dup")
          .when(coalesce(col("near_loser"), lit(0L)) === 1, "near_dup")
          .when(col("keep") === 0, "low_quality")
          .when(coalesce(col("contam"), lit(0L)) === 1, "contaminated")
          .otherwise("keep").as("verdict"))
  }

  // ---- x115 DSIR importance weights --------------------------------

  /** Hashed-feature space size for [[dsirWeights]] (the paper uses 10k
    * buckets on web scale; 64 keeps every bucket populated on the
    * fixture corpus so the smoothing term isn't the whole signal). */
  val DsirBuckets = 64
  /** The "target distribution" slice: English docs stand in for the
    * paper's high-quality target corpus (the fixture's only
    * quality-correlated partition that is text-derived). */
  val DsirTargetLang = "en"

  /** x115: Data Selection via Importance Resampling (Xie et al. '23,
    * arXiv:2302.03169) — per-document log importance weight
    * log p_target(doc) − log p_raw(doc) under bag-of-hashed-unigram
    * models of a target slice vs the whole corpus. Docs whose feature
    * profile looks like the target get positive weights; sampling
    * ∝ exp(weight) then reshapes the corpus toward the target
    * distribution (the principled form of the x106 mixture sampler).
    *
    * Portability: both models are exact integer counts; each hashed
    * feature's Laplace-smoothed log-ratio is computed ONCE (B=64-row
    * table, identical double argument in both engines), scaled to the
    * 1e-7 grid as BIGINT, and the per-doc weight is an exact integer
    * dot product count·λ — order-independent, so partial-aggregation
    * order can't move the 4dp result (the x38 trick).
    *
    * Scale: two hash aggregates over the token stream (feature counts
    * for target + raw come off ONE scan), a B-row λ table broadcast to
    * the per-doc feature counts, one per-doc aggregate. The corpus
    * shuffles once, on (doc_id, f) — no windows, no collect. */
  def dsirWeights(documents: DataFrame, buckets: Int = DsirBuckets): DataFrame = {
    val scale = lit(Similarity.CentroidScale)
    val tf = Caching.temp(withTokens(TextAnalysis.spread(documents))
      .select(col("doc_id"), col("lang"), explode(col("toks")).as("tok"))
      .select(col("doc_id"), col("lang"),
        pmod(conv(substring(md5(col("tok")), 1, 4), 16, 10).cast("long"),
          lit(buckets.toLong)).as("f")))
    val raw = tf.groupBy(col("f")).agg(count(lit(1)).as("cr"))
    val tgt = tf.filter(col("lang") === DsirTargetLang)
      .groupBy(col("f")).agg(count(lit(1)).as("ct"))
    val totR = raw.agg(sum(col("cr")).as("tr"))
    val totT = tgt.agg(sum(col("ct")).as("tt"))
    val lam = raw.join(tgt, Seq("f"), "left")
      .crossJoin(broadcast(totR)).crossJoin(broadcast(totT))
      .select(col("f"),
        floor((log((coalesce(col("ct"), lit(0L)) + 1).cast("double") /
                   (col("tt") + buckets).cast("double")) -
               log((col("cr") + 1).cast("double") /
                   (col("tr") + buckets).cast("double"))) *
          scale.cast("double")).cast("long").as("lp"))
    tf.groupBy(col("doc_id"), col("f")).agg(count(lit(1)).as("n"))
      .join(broadcast(lam), Seq("f"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).as("n_tokens"), sum(col("n") * col("lp")).as("s"))
      .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
        round4(col("s").cast("double") / scale.cast("double")).as("log_weight"))
  }

  // ---- x163 classifier calibration curve ---------------------------

  /** x163: RELIABILITY DIAGRAM for the x107 classifier — predicted-
    * probability deciles vs the observed x137 quality-pass rate per
    * bin. The MLOps read behind every "should I trust this filter's
    * 0.8": a calibrated classifier's mean prediction tracks its
    * actual rate; the bin deltas here are the miscalibration.
    *
    * Determinism: the 4dp score re-enters exact integer space
    * (s4 = score·10⁴) so bin means are exact integer sums; the decile
    * bin floor(score·10) is computed on the SAME double grid value in
    * both engines — bit-identical even where the grid point is not an
    * exact binary decimal. One corpus pass per side, join on doc_id,
    * ≤10-row aggregate. */
  def calibrationCurve(documents: DataFrame): DataFrame = {
    val s = classifierScore(documents).select(col("doc_id"), col("clf_score"))
    val q = withTokens(documents).select(col("doc_id"),
      (qualityScore(col("text"), col("toks")) >= TextAnalysis.QualityPassBar)
        .cast("long").as("pass"))
    s.join(q, Seq("doc_id"))
      .select(
        least(lit(9L), floor(col("clf_score") * 10).cast("long")).as("bin"),
        floor(col("clf_score") * 10000 + 0.5).cast("long").as("s4"),
        col("pass"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("pass")).as("k"), sum(col("s4")).as("ss"))
      .select(col("bin"), col("n"), col("k"),
        round4(col("ss").cast("double") / (col("n") * 10000L).cast("double"))
          .as("mean_pred"),
        round4(col("k").cast("double") / col("n").cast("double")).as("act_rate"))
  }

  // ---- x164 effective sample size of the DSIR weights --------------

  /** x164 weight quantum (1e-3): keeps Σw² inside BIGINT to ~10⁸ docs
    * per source at typical weight scales; beyond that the swap-in is
    * per-partition double partials (ESS is a diagnostic, not a
    * contract). */
  val EssScale = 1000.0

  /** x164: EFFECTIVE SAMPLE SIZE of the x115 importance weights per
    * source — ESS = (Σw)²/Σw², the standard importance-sampling
    * degeneracy check: ess_frac near 1 means reweighting is cheap,
    * near 0 means a few documents dominate the resampled corpus and
    * the weights are doing violence. Weights are exp(log_weight)
    * quantized to [[EssScale]] so both sums are exact integers; the
    * final ratio is one double per source. A source whose weights ALL
    * quantize to zero (log_weight < ln(0.5/EssScale) ≈ −7.6 — the
    * maximally off-target case ESS exists to flag) reports NULL, not
    * the 0/0 NaN (x155's degenerate-pool convention). */
  def essPerSource(documents: DataFrame): DataFrame = {
    val w = dsirWeights(documents).select(col("doc_id"),
      floor(exp(col("log_weight")) * EssScale + 0.5).cast("long").as("wq"))
    val ess = col("sw").cast("double") * col("sw").cast("double") /
      col("sww").cast("double")
    documents.select(col("doc_id"), col("source"))
      .join(w, Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("wq")).as("sw"),
        sum(col("wq") * col("wq")).as("sww"))
      .select(col("source"), col("n"),
        when(col("sww") === 0, lit(null).cast("double"))
          .otherwise(round4(ess)).as("ess"),
        when(col("sww") === 0, lit(null).cast("double"))
          .otherwise(round4(ess / col("n").cast("double"))).as("ess_frac"))
  }

  // ---- x173 Neyman-allocation stratified sampling ------------------

  /** Total Neyman sample budget. */
  val NeymanTarget = 100

  /** x173: NEYMAN-ALLOCATION stratified sample — the optimal
    * fixed-budget allocation n_h ∝ N_h·σ_h (Neyman '34): variable
    * strata (by doc-length spread, here per source) earn more of the
    * budget than uniform strata of the same size. The survey-design
    * counterpart to x106's preference-weighted mixture: allocation is
    * DERIVED from the data's dispersion, not chosen.
    *
    * Determinism: N_h·σ_h = sqrt(N_h·Σy² − (Σy)²) — the radicand is
    * assembled EXACTLY in DECIMAL(38,0) (BIGINT would overflow at
    * ~10¹² docs × (5k chars)²; DuckDB's HUGEINT mirrors it), and only
    * then crosses to double for the sqrt/ratio — identical nearest-
    * double in both engines. Draw order inside a stratum is the
    * engine-independent content-addressed coin (md5(doc_id), doc_id)
    * every sampler here flips (x29/x33/x106). A zero-variance stratum
    * earns 0 — that IS Neyman semantics (one doc would already
    * estimate it exactly).
    *
    * Scale: one hash aggregate to the |sources|-row moment table
    * (map-side combined), allocation arithmetic on that tiny frame
    * broadcast back, one corpus shuffle on `source` for the per-
    * stratum rank — x106's exact plan shape. */
  def neymanSample(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val mom = documents
      .select(col("source"), col("n_chars"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_h"),
        sum(col("n_chars").cast(dec)).as("sy"),
        sum((col("n_chars") * col("n_chars")).cast(dec)).as("syy"))
      .select(col("source"), col("n_h"),
        sqrt((col("n_h").cast(dec) * col("syy") - col("sy") * col("sy"))
          .cast("double")).as("nsig"))
    // Σ N_h·σ_h folds doubles left-to-right in SOURCE order (the §8.3
    // sequential-fold convention) — a bare sum() would be partial-
    // aggregation-order-dependent and could flip a floor boundary
    val tot = mom.agg(aggregate(
      transform(array_sort(collect_list(struct(col("source"), col("nsig")))),
        s => s.getField("nsig")),
      lit(0.0), (acc, x) => acc + x).as("tot_nsig"))
    val alloc = mom.crossJoin(broadcast(tot))
      .select(col("source"), col("n_h"),
        least(col("n_h"),
          floor(lit(NeymanTarget) * col("nsig") / col("tot_nsig") + 0.5)
            .cast("long")).as("n_alloc"))
    documents.select(col("doc_id"), col("source"))
      .join(broadcast(alloc), Seq("source"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))).cast("long"))
      .filter(col("rnk") <= col("n_alloc"))
      .select(col("doc_id"), col("source"), col("rnk"), col("n_alloc"))
  }

  // ---- x177 cross-source quantile normalization --------------------

  /** x177: QUANTILE NORMALIZATION of the x107 classifier score across
    * sources — each doc's score is replaced by the GLOBAL score at
    * the same within-source quantile (the batch-effect correction
    * genomics calls quantile normalization and ranking systems call
    * score calibration across segments: a "0.9 in a lenient source"
    * and a "0.9 in a strict source" stop meaning different things).
    *
    * Determinism: both ranks are total orders on (score, doc_id);
    * the midpoint position map pos = ⌊(2r−1)·N / (2·n_src)⌋ + 1 is
    * pure BIGINT floor-division (Spark `div` ≡ DuckDB `//`), so the
    * correspondence is exact — no interpolated doubles cross engines.
    *
    * Scale: the within-source rank is a source-partitioned window;
    * the global rank is [[graft.ops.Ranking.globalRowNumber]]'s
    * two-phase shape (no corpus-wide single-partition sort); the
    * final lookup is an EQUI join on the rank key. */
  def quantileNormalize(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sc = Caching.temp(classifierScore(documents)
      .select(col("doc_id"), col("clf_score"))
      .join(documents.select(col("doc_id"), col("source")), Seq("doc_id")))
    val bySrc = Window.partitionBy(col("source"))
      .orderBy(col("clf_score"), col("doc_id"))
    val ranked = sc
      .withColumn("r", row_number().over(bySrc).cast("long"))
      .withColumn("n_src", count(lit(1)).over(Window.partitionBy(col("source"))))
    val global = graft.ops.Ranking.globalRowNumber(
      sc.select(col("clf_score").as("gs"), col("doc_id").as("gid")),
      Seq(col("gs"), col("gid")), "grnk")
    val nTot = sc.agg(count(lit(1)).as("n_tot"))
    // (2r−1)·N stays inside BIGINT up to N ≈ 3×10⁹ docs (N² < 2⁶³);
    // past that, swap both engines to DECIMAL(38,0)/HUGEINT operands —
    // the formula itself is scale-free
    ranked.crossJoin(broadcast(nTot))
      .withColumn("pos", expr("((2 * r - 1) * n_tot) div (2 * n_src) + 1"))
      .join(global.select(col("grnk"), col("gs")), col("pos") === col("grnk"))
      .select(col("doc_id"), col("source"), col("clf_score"),
        col("gs").as("norm_score"))
  }

  // ---- x255 split-conformal prediction sets --------------------------

  /** x255: SPLIT-CONFORMAL PREDICTION SETS over the x107 classifier
    * (Vovk's inductive conformal / Angelopoulos & Bates '21 tutorial
    * recipe, at α = 0.1): the calibration split (doc_id ≡ 1 mod 3)
    * supplies nonconformity scores 1 − p(true class); the threshold
    * q̂ is the ⌈0.9(n+1)⌉-th smallest of them; each test doc
    * (doc_id ≡ 2 mod 3) gets the prediction SET {c : 1 − p(c) ≤ q̂} —
    * the finite-sample ≥ 90% marginal coverage guarantee, turned into
    * per-doc rows (set size + whether the true class is covered) that
    * both engines derive from exact 1e-4-unit integers (the x163
    * fixed-point convention; the quantile is an order statistic on
    * integers, so no percentile-interpolation drift).
    *
    * Scale: scores are the map-only classifier battery; the order
    * statistic uses the two-phase global row number (never a
    * single-partition sort); q̂ is a 1-row broadcast onto the test
    * split. The conformal guarantee itself is distribution-free —
    * exactly why it survives any corpus. */
  /** The shared conformal score frame: (doc_id, lang, s4, pass, n4). */
  private def conformalBase(documents: DataFrame): DataFrame = {
    val s = classifierScore(documents).select(col("doc_id"),
      floor(col("clf_score") * 10000 + 0.5).cast("long").as("s4"))
    val q = withTokens(documents).select(col("doc_id"), col("lang"),
      (qualityScore(col("text"), col("toks")) >= TextAnalysis.QualityPassBar)
        .cast("long").as("pass"))
    Caching.temp(s.join(q, Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("s4"), col("pass"),
        when(col("pass") === 1, lit(10000L) - col("s4"))
          .otherwise(col("s4")).as("n4")))
  }

  def conformalSets(documents: DataFrame): DataFrame = {
    val j = conformalBase(documents)
    val cal = j.filter(pmod(col("doc_id"), lit(3)) === 1)
    val ranked = Ranking.globalRowNumber(
      cal.select(col("n4"), col("doc_id")),
      Seq(col("n4"), col("doc_id")), "rn")
    // k = ⌈0.9·(n+1)⌉ in exact integers; the fixture splits keep
    // k ≤ n (tiny calibration sets would need the q̂ = ∞ convention)
    val kF = cal.agg(
      expr("((count(1) + 1) * 9 + 9) div 10").cast("long").as("k"),
      count(lit(1)).as("n_cal"))
    val qhat = ranked.crossJoin(broadcast(kF))
      .filter(col("rn") === col("k"))
      .select(col("n4").as("qhat"))
    j.filter(pmod(col("doc_id"), lit(3)) === 2)
      .crossJoin(broadcast(qhat))
      .select(col("doc_id"), col("s4"), col("qhat"),
        ((lit(10000L) - col("s4") <= col("qhat")).cast("long") +
          (col("s4") <= col("qhat")).cast("long")).as("set_size"),
        when(col("pass") === 1, lit(10000L) - col("s4") <= col("qhat"))
          .otherwise(col("s4") <= col("qhat")).as("covered"))
  }

  /** x260: MONDRIAN (GROUP-CONDITIONAL) CONFORMAL PREDICTION — the
    * x255 recipe with one threshold PER LANGUAGE (Vovk's Mondrian
    * taxonomy; Angelopoulos & Bates §4.6 "group-balanced conformal"):
    * marginal coverage can hide a badly-covered minority group, so
    * each lang's calibration split supplies its own
    * ⌈0.9(n_g+1)⌉-th-smallest q̂_g and the guarantee holds PER GROUP.
    * Output adds lang and the group threshold beside the x255 row
    * shape — reading both keys side by side prices what
    * group-conditioning costs in set size.
    *
    * Scale: the per-group order statistic is a lang-partitioned
    * window (the x62/x106 per-group-rank precedent — a group's
    * calibration SPLIT, a 1/3 sample, is the windowed unit, and the
    * group count is the parallelism); thresholds are a groups-sized
    * broadcast joined back by lang. */
  def mondrianConformalSets(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val j = conformalBase(documents)
    val cal = j.filter(pmod(col("doc_id"), lit(3)) === 1)
    val wOrd = Window.partitionBy(col("lang"))
      .orderBy(col("n4"), col("doc_id"))
    val wAll = Window.partitionBy(col("lang"))
    val qhats = cal
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("k",
        expr("(((count(1) OVER (PARTITION BY lang)) + 1) * 9 + 9) div 10"))
      .filter(col("rn") === col("k"))
      .select(col("lang"), col("n4").as("qhat"))
    j.filter(pmod(col("doc_id"), lit(3)) === 2)
      .join(broadcast(qhats), Seq("lang"))
      .select(col("doc_id"), col("lang"), col("s4"), col("qhat"),
        ((lit(10000L) - col("s4") <= col("qhat")).cast("long") +
          (col("s4") <= col("qhat")).cast("long")).as("set_size"),
        when(col("pass") === 1, lit(10000L) - col("s4") <= col("qhat"))
          .otherwise(col("s4") <= col("qhat")).as("covered"))
  }
}
