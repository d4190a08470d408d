package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-engine-stable 4dp rounding: `floor(x·10⁴ + 0.5) / 10⁴` is pure
  * double arithmetic, bit-identical in Spark and DuckDB. Spark's
  * `round()` is NOT portable: it detours through Java's decimal string
  * (`BigDecimal.valueOf`) and disagrees with DuckDB's binary rounding
  * on exact .xxxx5 decimal ties (12/5000 quality scores at sf0.1). */
object Portable {
  def round4(c: Column): Column = floor(c * 10000 + 0.5) / 10000
}

/** Text-analysis operators for LLM training-data pipelines over the
  * `documents` fixture table (TESTDATA.md): tokenization, token
  * counting (whitespace + BPE-ish regex), language-ID (marker-token
  * heuristic), quality scoring (length/punctuation/stopword ratios),
  * and document fingerprinting (md5 full-text + min-shingle).
  *
  * Beyond-reference track (SURVEY.md §7 step 7) — the reference itself
  * has no text ops; these are the standard corpus-curation primitives
  * (C4/Gopher-style quality heuristics, shingle fingerprints a la
  * Broder '97) re-expressed as pure Catalyst columns.
  *
  * Scale design: every operator here is a map-only projection over the
  * document scan — no shuffle, no UDFs, all whole-stage-codegen'd
  * built-ins (split / higher-order array functions / md5 / regexp).
  * At 100 TB this runs at scan speed; the only costs are the regexes,
  * which are per-row and embarrassingly parallel.
  *
  * Every constant lives here and is referenced by the DuckDB oracle
  * generator ([[graft.pipelines.ExtSql]]) so the two engines cannot
  * drift.
  */
object TextAnalysis {

  /** Marker-token lists for the language-ID heuristic, in priority
    * order (earlier wins ties). Deliberately tiny — the heuristic's
    * point is the *shape* (score-per-language argmax over token
    * membership), not linguistic accuracy. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "data"),
    "es" -> Seq("key", "value", "row", "column"),
    "de" -> Seq("window", "batch", "stream", "group"),
    "fr" -> Seq("merge", "join", "sort", "filter"),
    "zh" -> Seq("spark", "hash", "scan", "vector"))

  /** Stopword list for the quality score's stopword ratio. */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  /** BPE-ish token pattern: letter runs, digit runs, single symbols. */
  val BpePattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
  /** Punctuation / symbol pattern for the quality score. */
  val PunctPattern = "[^a-zA-Z0-9\\s]"

  /** Shingle width for fingerprints / MinHash (word n-grams). */
  val ShingleN = 3

  /** Whitespace tokens of `text`, empties dropped (both engines keep
    * empty strings around leading/trailing separators — filter them). */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: regexp matches over the lowercased text. */
  def bpeCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(BpePattern), lit(0)))

  /** Distinct word `n`-shingles joined with single spaces. */
  def shingles(toks: Column, n: Int = ShingleN): Column =
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>")))

  /** Count of `toks` members that appear in `words`. */
  def markerHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  /** Predicted language: argmax of marker hits, ties to the earlier
    * entry in [[LangMarkers]]. */
  def langId(toks: Column): Column = {
    val scores = LangMarkers.map { case (lang, words) => lang -> markerHits(toks, words) }
    scores.zipWithIndex.foldRight(lit(scores.last._1)) {
      case (((lang, s), i), rest) =>
        val laterScores = scores.drop(i + 1).map(_._2)
        if (laterScores.isEmpty) rest
        else when(laterScores.map(s >= _).reduce(_ && _), lit(lang)).otherwise(rest)
    }
  }

  def punctCount(text: Column): Column =
    size(regexp_extract_all(text, lit(PunctPattern), lit(0)))

  def stopwordCount(toks: Column): Column = markerHits(toks, Stopwords)

  /** Gopher-ish composite quality score in [0,1] from PRE-COMPUTED
    * counts: 0.4·min(1, tokens/100) + 0.3·stopword_ratio +
    * 0.3·(1 − punct_ratio). All-double arithmetic in a fixed
    * evaluation order, rounded to 4 decimals, so Spark and DuckDB
    * agree bit-for-bit. Taking counts (not text/toks) lets callers
    * that also OUTPUT the counts compute each regex/array scan once —
    * see [[textStats]]. */
  def qualityFromCounts(nToks: Column, nStop: Column, nPunct: Column,
                        textLen: Column): Column = {
    val lenTerm   = least(lit(1.0), nToks / lit(100.0)) * lit(0.4)
    val stopTerm  = when(nToks > 0, nStop / nToks.cast("double")).otherwise(lit(0.0)) * lit(0.3)
    val punctTerm = (lit(1.0) - when(textLen > 0,
      nPunct / textLen.cast("double")).otherwise(lit(0.0))) * lit(0.3)
    Portable.round4(lenTerm + stopTerm + punctTerm)
  }

  /** Single-expression form (x17 and tests). */
  def qualityScore(text: Column, toks: Column): Column =
    qualityFromCounts(size(toks), stopwordCount(toks), punctCount(text),
      length(text))

  /** Canonical full-text fingerprint: md5 of lowercased,
    * whitespace-collapsed, trimmed text. */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** Min-shingle fingerprint (1-perm MinHash): lexicographic min of the
    * shingle md5s — stable under reordering-free edits, null when the
    * doc has < [[ShingleN]] tokens. */
  def minShingleFingerprint(toks: Column): Column =
    array_min(transform(shingles(toks), s => md5(s)))

  /** Rolling polynomial fingerprint over the token-hash sequence:
    * fold of (acc·31 + h16(token)) mod (2³¹−1) — ORDER-sensitive,
    * unlike the set-based fingerprints (a reordering edit changes it).
    * Portable: DuckDB computes the same fold via
    * `list_reduce(list_prepend(0, …))`. */
  def rollingFingerprint(tokVals: Column): Column =
    aggregate(tokVals, lit(0L), (acc, v) => pmod(acc * 31 + v, lit(2147483647L)))

  // ---- per-document stats frames -----------------------------------

  /** documents + a materialized `toks` column (see [[Dedup.docShingles]]
    * on why token arrays must be real columns, not inlined trees). */
  def withTokens(documents: DataFrame): DataFrame =
    documents.withColumn("toks", tokens(col("text")))

  /** Spread an under-split documents scan across the cluster before
    * heavy per-row token work (the [[graft.ops.Dedup.docShingles]]
    * rationale, round 13): the fixture corpus is one small parquet
    * file with one row group → one input split, which serializes the
    * tokenize/explode map stage onto a single core. At real scale the
    * scan arrives pre-split and the keyed repartition instead spreads
    * a skewed trickle. Used by the explode-based term pipelines whose
    * follow-up is shuffle-bound anyway (docTermFreq, docBigrams, the
    * DSIR feature pass) — NOT by the map-only quality filters, whose
    * zero-shuffle plan is their 100 TB posture (PlanSpec-gated). */
  def spread(documents: DataFrame): DataFrame =
    documents.repartition(
      documents.sparkSession.sparkContext.defaultParallelism, col("doc_id"))

  /** x1: one row per document with all scalar text stats.
    *
    * Two stacked projections, NOT one: the count columns feed both the
    * output and [[qualityFromCounts]]. In a single select each
    * regex/array scan would appear twice in the expression tree (the
    * HOF paths are interpreted, so whole-stage-codegen subexpression
    * elimination never merges them); as separate stages CollapseProject
    * declines to inline the non-cheap multi-referenced exprs, so every
    * regexp/filter runs exactly once per row. */
  def textStats(documents: DataFrame): DataFrame = {
    val toks = col("toks")
    withTokens(documents)
      .select(
        col("doc_id"),
        col("lang"),
        size(toks).cast("long").as("n_tokens"),
        bpeCount(col("text")).cast("long").as("n_bpe_tokens"),
        punctCount(col("text")).cast("long").as("n_punct"),
        stopwordCount(toks).cast("long").as("n_stopwords"),
        length(col("text")).as("text_len"))
      .select(
        col("doc_id"), col("lang"), col("n_tokens"), col("n_bpe_tokens"),
        col("n_punct"), col("n_stopwords"),
        qualityFromCounts(col("n_tokens"), col("n_stopwords"),
          col("n_punct"), col("text_len")).as("quality_score"))
  }

  /** x2: language-ID prediction next to the labeled lang. */
  def langIdQ(documents: DataFrame): DataFrame = {
    val toks = col("toks")
    val hits = LangMarkers.map { case (l, ws) => markerHits(toks, ws).cast("long").as(s"hits_$l") }
    withTokens(documents).select(
      Seq(col("doc_id"), col("lang"), langId(toks).as("pred_lang")) ++ hits: _*)
  }

  /** x17: top-k docs per language by quality score — the explicit
    * sort/limit/top-k demonstration (absent from the reference,
    * SURVEY.md §2.10): a per-group window rank, ties on doc_id. At
    * scale this is one shuffle on the group key and a per-partition
    * top-k heap (WindowGroupLimit pushes rnk<=k below the sort). */
  def topQualityDocs(documents: DataFrame, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("quality_score").desc, col("doc_id").asc)
    textStats(documents)
      .select(col("doc_id"), col("lang"), col("quality_score"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** x21: exact corpus heavy hitters — the canonical distributed word
    * count: explode tokens → hash aggregate → global top-k by
    * (count desc, token asc). Partial aggregation shrinks the shuffle
    * to one row per distinct token per partition; the final top-k is
    * `orderBy(...).limit(k)`, which Spark plans as
    * TakeOrderedAndProject — a per-partition k-heap plus a k-row merge,
    * GUARANTEED never to funnel the full distinct-token set into one
    * partition (a global row_number window only avoids that if the
    * WindowGroupLimit rewrite fires). The rank column is re-derived by
    * a window over the k surviving rows — a single k-row partition. */
  def topTokens(documents: DataFrame, k: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("cnt").desc, col("tok").asc)
    withTokens(documents)
      .select(explode(col("toks")).as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok").asc)
      .limit(k)
      .withColumn("rnk", row_number().over(w).cast("long"))
  }

  /** (doc_id, tok, tf): per-document term frequencies — one explode +
    * hash aggregate; the base frame for vocabulary and TF-IDF. */
  def docTermFreq(documents: DataFrame): DataFrame =
    withTokens(spread(documents))
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))

  /** x26: corpus vocabulary with IDF: token → document frequency,
    * collection frequency, idf = ln((N+1)/(df+1)) rounded 4dp.
    * Built from [[docTermFreq]] (df = rows per token, cf = Σtf — no
    * second explode); the doc count N is a 1-row aggregate broadcast
    * into the projection. Scale: two hash aggregates, shuffle keyed on
    * the token. */
  def vocabIdf(documents: DataFrame): DataFrame =
    vocabIdfFromTf(docTermFreq(documents), documents.select(count(lit(1)).as("n_docs")))

  /** Vocabulary/IDF from a PRE-COMPUTED term-frequency frame — shared
    * by x26 and x27 so the tokenize+explode+aggregate pass runs once. */
  def vocabIdfFromTf(tf: DataFrame, nDocs: DataFrame): DataFrame =
    tf.groupBy(col("tok"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"))
      .crossJoin(broadcast(nDocs))
      .select(col("tok"), col("df"), col("cf"),
        Portable.round4(
          log((col("n_docs") + 1).cast("double") / (col("df") + 1))).as("idf"))

  /** x27: top TF-IDF terms per document (k per doc, score desc, tie on
    * token): tf × idf with both factors exactly as x26 computes them.
    * Scale: the tf→idf attach is a shuffle join on the token; the
    * per-doc top-k is a window rank partitioned by doc_id
    * (WindowGroupLimit caps per-partition input at k). */
  def tfidfTopTerms(documents: DataFrame, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("tok").asc)
    val tf = Caching.temp(docTermFreq(documents)) // feeds both idf and the join
    tf.join(
        vocabIdfFromTf(tf, documents.select(count(lit(1)).as("n_docs")))
          .select(col("tok"), col("idf")), Seq("tok"))
      .select(col("doc_id"), col("tok"),
        Portable.round4(col("tf") * col("idf")).as("score"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** Train/val/test shares (cumulative percent bounds). */
  val TrainPct = 80
  val ValPct   = 90

  /** x29: deterministic content-addressed train/val/test split —
    * 80/10/10 by md5 of the namespaced doc id. Stable across runs,
    * partitionings, and engines (no rand()); a new doc's assignment
    * never disturbs existing ones — the property that keeps eval sets
    * uncontaminated as a 100 TB corpus grows. Map-only. */
  def splitAssign(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), col("lang"), splitBucket(col("doc_id")).as("bucket"))
      .withColumn("split",
        when(col("bucket") < TrainPct, "train")
          .when(col("bucket") < ValPct, "val")
          .otherwise("test"))

  /** The x29 hash bucket / split label as doc-local COLUMNS, for ops
    * that tag splits inline without a join (x145). */
  def splitBucket(docId: Column): Column =
    pmod(conv(substring(md5(concat(lit("split:"), docId.cast("string"))), 1, 4), 16, 10)
      .cast("long"), lit(100))
  def splitOf(docId: Column): Column = {
    val b = splitBucket(docId)
    when(b < TrainPct, "train").when(b < ValPct, "val").otherwise("test")
  }

  /** Per-stratum sample size for [[stratifiedSample]]. */
  val SamplePerStratum = 20

  /** x33: deterministic stratified sample — the k hash-smallest docs
    * per language (eval-subset selection without rand(): the same
    * corpus always yields the same sample, and a doc's inclusion
    * depends only on its id and its stratum's other members). Scale:
    * one shuffle on the stratum key + per-partition top-k heap
    * (WindowGroupLimit), never a global sort. */
  def stratifiedSample(documents: DataFrame, k: Int = SamplePerStratum): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("skey").asc, col("doc_id").asc)
    documents
      .select(col("doc_id"), col("lang"),
        md5(concat(lit("sample:"), col("doc_id").cast("string"))).as("skey"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("lang"), col("rnk"))
  }

  /** The x78 split pairs compared. */
  val SplitPairs: Seq[(String, String)] =
    Seq(("train", "val"), ("train", "test"), ("val", "test"))

  /** The x78 per-language JSD fold term for split pair (a,b), as ONE
    * shared SQL text — Spark evaluates it inside an `aggregate` HOF,
    * DuckDB inside a `list_sum` comprehension (both sequential
    * left-to-right over the lang-sorted list, per the ExtSql float
    * conventions), so the operation sequence cannot drift. Uses the
    * identity JSD = H(M) − (H(P)+H(Q))/2 with M = (P+Q)/2; a language
    * absent from a split contributes its one-sided entropy terms only
    * (0·ln0 ≡ 0). */
  def jsdTermSql(a: String, b: String): String = {
    def p(s: String) = s"(x.n_$s / CAST(t_$s AS DOUBLE))"
    val pa = p(a); val pb = p(b)
    val m = s"(($pa + $pb) / 2.0)"
    def h(px: String) = s"(CASE WHEN $px > 0 THEN -($px) * ln($px) ELSE 0.0 END)"
    s"${h(m)} - (${h(pa)} + ${h(pb)}) / 2.0"
  }

  /** x78: train/val/test DISTRIBUTION-DRIFT guard — Jensen-Shannon
    * divergence between the language distributions of each split pair
    * (the "did my deterministic split skew a stratum" check run before
    * training; JSD = 0 means identical mixes, ln 2 is the max).
    *
    * Scale: one hash aggregate to per-lang split counts (|langs|
    * rows), one 1-row pack (sorted struct array + totals — bounded by
    * the lang cardinality, NOT the corpus), then the 3 pair scores
    * expand from that single row. The corpus is touched once. */
  def splitDivergence(documents: DataFrame): DataFrame = {
    val counts = splitAssign(documents)
      .groupBy(col("lang"))
      .agg(
        sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
        sum(when(col("split") === "val", 1L).otherwise(0L)).as("n_val"),
        sum(when(col("split") === "test", 1L).otherwise(0L)).as("n_test"))
    counts
      .agg(
        array_sort(collect_list(struct(col("lang"),
          col("n_train"), col("n_val"), col("n_test")))).as("ls"),
        sum(col("n_train")).as("t_train"), sum(col("n_val")).as("t_val"),
        sum(col("n_test")).as("t_test"))
      .select(explode(array(SplitPairs.map { case (a, b) =>
        struct(lit(s"${a}_$b").as("pair"),
          Portable.round4(expr(
            s"aggregate(ls, CAST(0.0 AS DOUBLE), (acc, x) -> acc + (${jsdTermSql(a, b)}))"))
            .as("jsd"))
      }: _*)).as("r"))
      .select(col("r.pair").as("pair"), col("r.jsd").as("jsd"))
  }

  /** x74 picks per language shard. */
  val WeightedSampleK = 20

  /** x74: deterministic WEIGHTED (systematic/PPS) sampling — pick
    * ~[[WeightedSampleK]] docs per language with probability
    * proportional to size (n_chars): arrange docs on a line in
    * content-addressed hash order, each spanning its weight; select
    * every doc whose span contains a multiple of tot/k. Long docs can
    * be picked more than once (`n_picks` — the standard PPS
    * multiplicity). Integer-exact end to end: no rand(), identical
    * re-run/engine results, and a stable step means adding docs only
    * perturbs picks after the insertion point.
    *
    * Scale: like [[packBins]], the prefix sum is inherently sequential
    * IN ORDER, so it is scoped per shard (lang) — one shuffle + two
    * window passes per shard, never a global single-task window. */
  def weightedSample(documents: DataFrame, k: Int = WeightedSampleK): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byLang = Window.partitionBy(col("lang"))
    documents
      .select(col("doc_id"), col("lang"), col("n_chars").as("w"),
        md5(concat(lit("wsample:"), col("doc_id").cast("string"))).as("skey"))
      .withColumn("cum", sum(col("w")).over(
        byLang.orderBy(col("skey").asc, col("doc_id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tot", sum(col("w")).over(byLang))
      .withColumn("step", greatest(expr(s"tot div $k"), lit(1L)))
      .withColumn("n_picks", expr("cum div step - (cum - w) div step"))
      .filter(col("n_picks") > 0)
      .select(col("doc_id"), col("lang"), col("w"), col("n_picks"))
  }

  /** x75: per-group exact-median quality gate — keep each language's
    * longer half: docs with n_chars ≥ the language's LOWER MEDIAN
    * (the ceil(n/2)-th value in (n_chars, doc_id) order — a concrete
    * row, so both engines agree exactly; no interpolation). The "drop
    * the bottom half per language" filter of a curation pipeline.
    *
    * Scale: one shuffle on lang feeds both window passes; the median
    * table is |langs| rows — a genuinely bounded dim, so the hinted
    * broadcast join back is safe at any SF. */
  def medianFilter(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byLang = Window.partitionBy(col("lang"))
    val ranked = Caching.temp(documents
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .withColumn("rn", row_number().over(
        byLang.orderBy(col("n_chars").asc, col("doc_id").asc)))
      .withColumn("n_in_lang", count(lit(1)).over(byLang)))
    val medians = ranked
      .filter(col("rn") === expr("(n_in_lang + 1) div 2"))
      .select(col("lang"), col("n_chars").as("med_chars"))
    ranked.join(broadcast(medians), Seq("lang"))
      .filter(col("n_chars") >= col("med_chars"))
      .select(col("doc_id"), col("lang"), col("n_chars"), col("med_chars"))
  }

  /** Token budget per packed training bin. */
  val PackBudget = 2048

  /** x36: SEQUENCE PACKING — assign documents to contiguous
    * token-budget bins (the batch-construction step of LLM training:
    * concatenate docs until ~budget tokens, start the next bin).
    * Deterministic greedy packing in doc_id order within each lang
    * shard: bin = floor(tokens-before-this-doc / budget). Output is
    * per-bin stats (doc count, token sum, id range).
    *
    * Scale: packing is inherently sequential IN ORDER — the global
    * form would funnel everything into one task, so the order is
    * scoped per shard (lang here; date/shard-hash in production):
    * one shuffle on the shard key, a running-sum window per shard,
    * then a hash aggregate. */
  def packBins(documents: DataFrame, budget: Int = PackBudget): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withTokens(documents)
      .select(col("doc_id"), col("lang"), size(col("toks")).cast("long").as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("bin", floor((col("cum") - col("n_tokens")) / budget))
      .groupBy(col("lang"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("bin_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
  }

  /** x61: PLACEMENT inside the x36 packed bins — per document: its
    * bin and the token offset where it starts (the offsets/attention-
    * boundary table a packed-sequence trainer needs next to the bin
    * summary). Same windowed running sum as [[packBins]], minus the
    * final aggregate: offset = tokens before this doc in its bin. */
  def packOffsets(documents: DataFrame, budget: Int = PackBudget): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withTokens(documents)
      .select(col("doc_id"), col("lang"), size(col("toks")).cast("long").as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("bin", floor((col("cum") - col("n_tokens")) / budget))
      .select(col("doc_id"), col("lang"), col("bin"), col("n_tokens"),
        (col("cum") - col("n_tokens") - col("bin") * budget).as("offset"))
  }

  /** x62: per-domain cap (C4/RefinedWeb-style): keep at most `k` docs
    * per `source`, chosen by a deterministic content-independent hash
    * order (md5 of the doc id — "random" but reproducible), so no
    * domain dominates the training mix. Scale: one shuffle on source +
    * per-partition sort that WindowGroupLimit prunes to the top-k per
    * partition before the shuffle — the plan never materializes a full
    * sort of a hot domain. */
  def domainCap(documents: DataFrame, k: Int = DomainCapK): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source"))
      .orderBy(col("ckey").asc, col("doc_id").asc)
    documents
      .select(col("doc_id"), col("source"),
        md5(concat(lit("cap:"), col("doc_id").cast("string"))).as("ckey"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("source"), col("rnk"))
  }

  /** Per-source keep budget for [[domainCap]]. */
  val DomainCapK = 15

  /** x60: DICTIONARY-ENCODE documents to token-id sequences (the
    * tokenize-to-ids step before training): vocabulary ids are dense
    * ranks in sorted token order; each document becomes its ordered
    * id sequence, emitted as a comma-joined string (`ids_csv`) — a
    * flat sortable column both engines and any downstream comparator
    * can order and hash (an array column is not totally ordered in
    * every consumer).
    *
    * The dense ids are assigned in TWO PHASES so no stage ever sorts
    * the vocabulary through a single partition (raw whitespace tokens
    * on a web corpus are billions of distinct strings, not a 100k
    * tokenizer vocab): (1) range-partition the distinct tokens by
    * token and rank WITHIN each partition in parallel; (2) add the
    * cumulative row count of all earlier ranges — a P-row (P =
    * partition count) aggregate that is broadcast back. The encode
    * join then shuffles postings on the token and re-assembles per doc
    * with one hash aggregate. */
  def tokenIds(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val posts = withTokens(documents)
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("p", "tok")))
    val p = documents.sparkSession.sparkContext.defaultParallelism
    // phase 1: per-range local dense ranks. The range exchange feeds two
    // consumers (the offsets aggregate and the final join) — persisting
    // pins ONE materialization so both see identical partition bounds.
    val local = Caching.temp(posts.select(col("tok")).distinct()
      .repartitionByRange(p, col("tok"))
      .withColumn("pid", spark_partition_id())
      .withColumn("lrnk",
        row_number().over(Window.partitionBy(col("pid")).orderBy(col("tok"))).cast("long")))
    // phase 2: cumulative offsets over the P-row partition-count table —
    // the ONLY unpartitioned window in the plan runs over P rows, not
    // the vocabulary
    val offsets = local.groupBy(col("pid")).agg(count(lit(1)).as("cnt"))
      .withColumn("off", coalesce(
        sum(col("cnt")).over(Window.orderBy(col("pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("pid"), col("off"))
    val vocab = local.join(broadcast(offsets), Seq("pid"))
      .select(col("tok"), (col("off") + col("lrnk") - 1).as("id"))
    posts.join(vocab, Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        concat_ws(",", transform(
          array_sort(collect_list(struct(col("p"), col("id")))),
          s => s.getField("id").cast("string"))).as("ids_csv"))
  }

  /** (doc_id, w1, w2): consecutive token pairs of each document. */
  def docBigrams(documents: DataFrame): DataFrame =
    withTokens(spread(documents))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"),
        explode(expr(
          "transform(sequence(0, size(toks)-2), i -> struct(toks[i] AS w1, toks[i+1] AS w2))"))
          .as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))

  /** x73 result size. */
  val BpeTopK = 50

  /** x73: the COUNT step of one BPE merge iteration (the
    * tokenizer-training primitive): over the corpus vocabulary
    * weighted by token frequency, count every adjacent character
    * pair and keep the top [[BpeTopK]] — the highest-count pair is
    * the symbol BPE would merge next.
    *
    * Scale: pair counting runs over the DISTINCT vocabulary (≪ corpus
    * — the token-frequency aggregate collapses the token stream
    * first, so a 100 TB corpus contributes |vocab| rows to the
    * pair-explode stage, not |tokens|). Two hash aggregates + one
    * global top-k via orderBy+limit (partial TakeOrdered per
    * partition, k rows to the driver stage — never a single-partition
    * window). Pairs come from `substring(tok, i, 2)` so the oracle's
    * 1-indexed DuckDB comprehension computes the identical list. */
  def bpePairs(documents: DataFrame): DataFrame = {
    val tokCounts = withTokens(documents)
      .select(explode(col("toks")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    tokCounts
      .filter(length(col("tok")) >= 2)
      .select(col("cnt"), explode(
        expr("transform(sequence(1, length(tok)-1), i -> substring(tok, i, 2))")).as("pair"))
      .groupBy(col("pair")).agg(sum(col("cnt")).as("pair_count"))
      .orderBy(col("pair_count").desc, col("pair"))
      .limit(BpeTopK)
  }

  /** x117 merge count: small enough that the DuckDB oracle's unrolled
    * CTE chain stays reviewable, large enough that later merges build
    * on earlier ones (multi-char symbols demonstrably form). */
  val BpeMerges = 8

  /** x117: the full iterative BPE TRAINING loop (Sennrich et al. '16,
    * arXiv:1508.07909) — x73 is one COUNT step; this runs
    * [[BpeMerges]] complete merge iterations: count all adjacent
    * symbol pairs over the frequency-weighted vocabulary, adopt the
    * argmax pair as a new symbol, re-segment, repeat. Returns the
    * learned merge table (rank, pair, count) — the tokenizer model
    * itself, whose whole trajectory the oracle re-derives
    * independently (any drift in any iteration changes every later
    * merge).
    *
    * Portability: a word's segmentation is ONE delimited string —
    * "\nsym\n\nsym\n" (tokens never contain whitespace, so "\n" is
    * collision-free) — and a merge is ONE literal `replace` of
    * "\nl\n\nr\n" with "\nlr\n". Both engines' replace scans
    * left-to-right non-overlapping, which IS greedy BPE application
    * ("aaa" + (a,a) → [aa, a]), and consuming the shared middle
    * delimiter makes back-to-back occurrences merge exactly like the
    * array walk would. No per-engine fold/loop semantics to align.
    *
    * Scale: like [[bpePairs]], everything runs over the DISTINCT
    * vocabulary (|vocab| ≪ corpus; a 100 TB corpus collapses to its
    * vocabulary in the first aggregate). Each iteration is one
    * pair-explode + hash aggregate + global top-1 (TakeOrdered, 1 row
    * to the driver — the [[graft.ops.Dedup]] loops' convergence-probe
    * pattern) + one map-only re-segmentation; the working set is
    * persisted per generation and the superseded one dropped. */
  def bpeTrain(documents: DataFrame, iters: Int = BpeMerges): DataFrame =
    mergesToDF(documents.sparkSession, bpeMergesList(documents, iters))

  /** The x117 merge table as a local frame (driver-side list → DF);
    * split out so the x197 encoder can reuse ONE training run via the
    * Extensions memo instead of re-running the loop. */
  def mergesToDF(s: SparkSession,
                 merges: Seq[(Long, String, String, Long)]): DataFrame = {
    import s.implicits._
    merges.toDF("merge_rank", "lsym", "rsym", "pair_count")
  }

  /** The [[bpeTrain]] loop itself, returning the learned merges as a
    * driver-side list (8 rows — the convergence-probe collect each
    * iteration is the loop's 1-row argmax, see the x117 scaladoc). */
  def bpeMergesList(documents: DataFrame,
                    iters: Int = BpeMerges): Seq[(Long, String, String, Long)] = {
    val nl = "\n"
    var state = Caching.temp(withTokens(documents)
      .select(explode(col("toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
      .select(concat(lit(nl), array_join(split(col("w"), ""), nl + nl), lit(nl))
        .as("state"), col("wc")))
    // generation g stays cached until generation g+1 has materialized
    // THROUGH it (the argmax collect below) — a deferred unpersist, so
    // no extra eager count() job per iteration
    var prev: DataFrame = null
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    for (it <- 1 to iters) {
      val best = state
        .select(col("wc"), split(btrim(col("state"), lit(nl)), nl + nl).as("ss"))
        .filter(size(col("ss")) >= 2)
        .select(col("wc"), col("ss"),
          explode(sequence(lit(1), size(col("ss")) - 1)).as("i"))
        .select(element_at(col("ss"), col("i")).as("lsym"),
          element_at(col("ss"), col("i") + 1).as("rsym"), col("wc"))
        .groupBy(col("lsym"), col("rsym")).agg(sum(col("wc")).as("pair_count"))
        .orderBy(col("pair_count").desc, col("lsym"), col("rsym"))
        .limit(1).collect()
      if (prev != null) prev.unpersist(blocking = false)
      val (l, r, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
      merges += ((it.toLong, l, r, c))
      val next = Caching.temp(state.select(
        replace(col("state"), lit(nl + l + nl + nl + r + nl), lit(nl + l + r + nl))
          .as("state"), col("wc")))
      prev = state
      state = next
    }
    if (prev != null) prev.unpersist(blocking = false)
    state.unpersist(blocking = false)
    merges.result()
  }

  /** x197: BPE ENCODE — apply a LEARNED merge table ([[bpeTrain]]'s
    * output, in rank order) to re-tokenize the corpus into subword
    * ids: the step between tokenizer training (x117) and sequence
    * packing (x36/x61), completing the tokenizer loop. Output one row
    * per document: dense subword-id sequence (`ids_csv`, the x60 flat
    * sortable convention) and its length.
    *
    * Greedy application IS the x117 replace trick: a token's
    * character segmentation is one "\nsym\n\nsym\n" string and the 8
    * merges are 8 NESTED literal `replace`s in ONE map-only
    * projection — both engines' replace scans left-to-right
    * non-overlapping, exactly BPE's greedy merge order, and nesting
    * applies merge i+1 to merge i's output just like the training
    * loop did. Subword ids are the dense lexicographic rank of the
    * subword symbols (the x60 id convention, via the two-phase
    * [[Ranking.globalRowNumber]]).
    *
    * Scale: everything except the final assembly runs over the
    * DISTINCT vocabulary — encode once per distinct token (map-only
    * 8-deep replace), assign ids on the subword vocabulary (≤ vocab +
    * merge count symbols), re-attach ids per token at VOCAB scale.
    * The corpus-scale work is one postings shuffle on the token and
    * one per-doc hash aggregate — the same two-shuffle shape as x60,
    * regardless of merge count. The merge table itself is a driver
    * list folded into the expression tree (≪ kB — the "broadcast" is
    * the plan), never a join. */
  /** The DISTINCT vocabulary encoded by a merge table: (tok, subs) —
    * the shared first stage of [[bpeEncode]] (x197) and
    * [[bpeCompressionStats]] (x203). Map-only: the merges nest as
    * literal replaces in one projection. */
  def encodedVocab(documents: DataFrame,
                   merges: Seq[(String, String)]): DataFrame = {
    val nl = "\n"
    val stateInit = concat(lit(nl), array_join(split(col("tok"), ""), nl + nl), lit(nl))
    val encState = merges.foldLeft(stateInit) { case (c, (l, r)) =>
      replace(c, lit(nl + l + nl + nl + r + nl), lit(nl + l + r + nl)) }
    withTokens(documents)
      .select(explode(col("toks")).as("tok")).distinct()
      .select(col("tok"), split(btrim(encState, lit(nl)), nl + nl).as("subs"))
  }

  def bpeEncode(documents: DataFrame,
                merges: Seq[(String, String)]): DataFrame = {
    val vocabEnc = Caching.temp(encodedVocab(documents, merges))
    val subIds = Ranking.globalRowNumber(
      vocabEnc.select(explode(col("subs")).as("sym")).distinct(),
      Seq(col("sym")), "r")
      .select(col("sym"), (col("r") - 1).as("id"))
    val tokIds = vocabEnc
      .select(col("tok"), posexplode(col("subs")).as(Seq("q", "sym")))
      .join(subIds, Seq("sym"))
      .groupBy(col("tok"))
      .agg(transform(array_sort(collect_list(struct(col("q"), col("id")))),
        e => e.getField("id")).as("ids"))
    withTokens(documents)
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("p", "tok")))
      .join(tokIds, Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(sum(size(col("ids"))).as("n_subwords"),
        concat_ws(",", transform(
          flatten(transform(array_sort(collect_list(struct(col("p"), col("ids")))),
            e => e.getField("ids"))),
          id => id.cast("string"))).as("ids_csv"))
  }

  /** x203: TOKENIZER COMPRESSION REPORT — per source: characters,
    * whitespace tokens, subwords after applying the x117 merges, and
    * the two ratios a tokenizer ships or dies by (chars/subword = the
    * fertility-inverse that sets context-window economics;
    * subwords/token = how much the merges actually compressed the
    * whitespace baseline). The per-SOURCE grain is the point: a
    * tokenizer trained on the mixture can compress one source well
    * and fragment another, and this is the table that shows it.
    *
    * Determinism: all counts exact integers; two final 4dp divisions.
    * Scale: subword counts come from the DISTINCT vocabulary
    * ([[encodedVocab]], map-only) joined to the token postings — one
    * postings shuffle + two hash aggregates; the id-assembly stage of
    * x197 is skipped entirely (stats need counts, not sequences). */
  def bpeCompressionStats(documents: DataFrame,
                          merges: Seq[(String, String)]): DataFrame = {
    val vocabEnc = encodedVocab(documents, merges)
      .select(col("tok"), size(col("subs")).cast("long").as("ns"))
    val perDoc = withTokens(documents)
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .join(vocabEnc, Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"), sum(col("ns")).as("n_subs"))
    documents
      .select(col("doc_id"), col("source"), length(col("text")).cast("long").as("nc"))
      .join(perDoc, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nc")).as("n_chars"),
        coalesce(sum(col("n_toks")), lit(0L)).as("n_tokens"),
        coalesce(sum(col("n_subs")), lit(0L)).as("n_subwords"))
      .select(col("source"), col("n_docs"), col("n_chars"),
        col("n_tokens"), col("n_subwords"),
        when(col("n_subwords") > 0, Portable.round4(
          col("n_chars").cast("double") / col("n_subwords").cast("double")))
          .as("chars_per_subword"),
        when(col("n_tokens") > 0, Portable.round4(
          col("n_subwords").cast("double") / col("n_tokens").cast("double")))
          .as("subwords_per_token"))
  }

  /** x208: TOKENIZER FERTILITY PER LANGUAGE — the multilingual audit
    * x203 started, now on the axis that decides mixture weights: per
    * PREDICTED language (the x2 langid, so the report needs no labels),
    * subwords/word (fertility — how much the x117 merges fragment that
    * language) and chars/subword (context-window economics per
    * language). A tokenizer trained on the mixture can compress one
    * language and shatter another; UniMax-style samplers (x118)
    * re-weight on exactly this table.
    *
    * Determinism: langid is the exact marker-hit argmax (x2), counts
    * are exact integers, two final 4dp divisions — the x203
    * convention, regrouped.
    *
    * Scale: subword counts come from the DISTINCT vocabulary
    * ([[encodedVocab]], map-only over |vocab|) joined to the token
    * postings (one shuffle); langid is a map-only projection of the
    * document scan; the final aggregate groups on ≤ |languages| keys
    * with map-side combine. Nothing beyond the postings ever
    * shuffles. */
  def tokenizerFertility(documents: DataFrame,
                         merges: Seq[(String, String)]): DataFrame = {
    val vocabEnc = encodedVocab(documents, merges)
      .select(col("tok"), size(col("subs")).cast("long").as("ns"))
    val perDoc = withTokens(documents)
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .join(vocabEnc, Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"), sum(col("ns")).as("n_subs"))
    withTokens(documents)
      .select(col("doc_id"), langId(col("toks")).as("pred_lang"),
        length(col("text")).cast("long").as("nc"))
      .join(perDoc, Seq("doc_id"), "left")
      .groupBy(col("pred_lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nc")).as("n_chars"),
        coalesce(sum(col("n_toks")), lit(0L)).as("n_tokens"),
        coalesce(sum(col("n_subs")), lit(0L)).as("n_subwords"))
      .select(col("pred_lang"), col("n_docs"), col("n_chars"),
        col("n_tokens"), col("n_subwords"),
        when(col("n_tokens") > 0, Portable.round4(
          col("n_subwords").cast("double") / col("n_tokens").cast("double")))
          .as("subwords_per_token"),
        when(col("n_subwords") > 0, Portable.round4(
          col("n_chars").cast("double") / col("n_subwords").cast("double")))
          .as("chars_per_subword"))
  }

  // ---- unigram-LM tokenizer (SentencePiece-style, Kudo '18) --------

  /** Longest candidate piece (chars) for the x223 unigram trainer. */
  val UniMaxPiece = 4
  /** Fixed EM(prune) iterations — the x117 fixed-trajectory
    * convention: both engines run exactly this many, so the whole
    * trajectory (not just the final table) must agree. */
  val UniIters = 2
  /** Seed candidates kept (top by weighted substring count) beside
    * the always-kept single characters. */
  val UniSeedCap = 256
  /** Pieces kept per prune beside the single characters. */
  val UniTargetVocab = 40
  /** Integer grid for piece costs (−ln p scaled). */
  val UniCostScale = 1000000L
  /** Cost of a pruned piece: any path through one is dominated by the
    * all-kept-pieces path (max finite path cost ≪ this). */
  val UniInfCost = 1000000000000000L

  /** Viterbi forward pass: best-segmentation DP table for word `w`
    * under piece-cost map `costs` — `dp[i] = (cost, j)` = cheapest
    * cost of segmenting the first `i` chars and the start of the last
    * piece, ties broken toward the smallest `j` (longest last piece).
    * One `aggregate` fold over the positions — linear in word length,
    * pure Column land (the x117 no-UDF discipline applied to dynamic
    * programming: the fold IS the DP). */
  def uniViterbiDp(w: Column, costs: Column,
                   maxPiece: Int = UniMaxPiece): Column =
    aggregate(
      sequence(lit(1), length(w)),
      array(struct(lit(0L).as("c"), lit(-1).as("j"))),
      (acc, i) => concat(acc, array(array_min(
        transform(sequence(greatest(i - maxPiece, lit(0)), i - 1),
          j => struct(
            (element_at(acc, j + 1).getField("c") +
              coalesce(element_at(costs, w.substr(j + 1, i - j)),
                lit(UniInfCost))).as("c"),
            j.as("j")))))))

  /** Backtrace of [[uniViterbiDp]]: the selected piece list, in word
    * order. The induced tie-break — lexicographically smallest
    * (last-piece start, second-to-last, …) among min-cost paths — is
    * what the DuckDB oracle reproduces by enumerating segmentations
    * and ordering on (cost, reversed boundary list): subpath
    * optimality makes the two selections provably identical. */
  def uniViterbiPieces(w: Column, dp: Column): Column =
    aggregate(
      sequence(lit(1), length(w)),
      struct(length(w).as("i"),
        array().cast("array<string>").as("ps")),
      (st, _) => {
        val i = st.getField("i")
        val j = element_at(dp, i + 1).getField("j")
        when(i > 0,
          struct(j.as("i"),
            concat(array(w.substr(j + 1, i - j)), st.getField("ps")).as("ps")))
          .otherwise(st)
      },
      st => st.getField("ps"))

  private def uniCostMap(costs: Seq[(String, Long)]): Column =
    map_from_arrays(typedlit(costs.map(_._1)), typedlit(costs.map(_._2)))

  /** Smoothed piece costs on the [[UniCostScale]] grid:
    * `⌊−S·ln((cnt+1)/(tot+|P|)) + 0.5⌋` — add-one smoothing keeps the
    * never-used single characters finite; exact-integer arguments make
    * the double identical in both engines (the x51 idf convention). */
  private def uniCosts(kept: Seq[(String, Long)]): Seq[(String, Long)] = {
    val tot = kept.map(_._2).sum
    val p = kept.size
    kept.map { case (piece, cnt) =>
      piece -> math.floor(-UniCostScale *
        math.log((cnt + 1).toDouble / (tot + p)) + 0.5).toLong
    }
  }

  /** The distinct word vocabulary with corpus frequencies — the
    * trainer's working set (|vocab| ≪ corpus: a 100 TB corpus
    * collapses to its vocabulary in this first aggregate, the x117
    * scale argument verbatim). */
  private def uniWordCounts(documents: DataFrame): DataFrame =
    withTokens(documents)
      .select(explode(col("toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))

  /** x223: UNIGRAM-LM TOKENIZER TRAINING (Kudo '18,
    * arXiv:1804.10959 — the SentencePiece unigram model), the second
    * tokenizer family beside BPE (x117): seed a candidate vocabulary
    * from weighted substring counts (top [[UniSeedCap]] + every
    * single character), then run [[UniIters]] hard-EM iterations —
    * E-step: Viterbi-segment every vocabulary word under the current
    * smoothed piece costs ([[uniViterbiDp]]); prune to the top
    * [[UniTargetVocab]] pieces by expected count (single characters
    * are never pruned — the model must stay total); M-step:
    * re-estimate costs from the usage counts. Returns the final piece
    * table (piece, n_uses, nll).
    *
    * Determinism: counts are exact integers, costs live on the
    * [[UniCostScale]] grid, the E-step's argmin is the
    * [[uniViterbiPieces]] total order, and prune/argmax orders are
    * (cnt desc, piece asc) — the whole trajectory agrees across
    * engines (the x117 property; the oracle re-derives every
    * iteration with enumerated segmentations, a genuinely different
    * algorithm meeting the same fixed points).
    *
    * Scale: everything runs over the DISTINCT vocabulary; the only
    * driver-side state is the piece table itself (bounded by
    * [[UniSeedCap]]/[[UniTargetVocab]] + |alphabet| — model-sized,
    * like every shipped tokenizer), collected once per iteration
    * exactly as a SentencePiece trainer holds its vocab in memory.
    * Each E-step is one map-only projection (the DP fold) + one hash
    * aggregate. */
  /** x223's seed candidate frame, LIMIT-BOUNDED BEFORE ANY COLLECT
    * (round-10 fix of the r9 verdict's driver-scale hazard): the
    * weighted ≤[[UniMaxPiece]]-gram substring counts over the distinct
    * vocabulary, pruned ENGINE-SIDE to the top [[UniSeedCap]] by
    * (cnt desc, piece asc) — the same total order the old driver-side
    * sort used, so the kept set and every downstream hash are
    * unchanged — then unioned with every single-character row (the
    * char floor; totality requires the full alphabet). The distinct
    * ≤4-gram space of a multilingual 100 TB corpus is tens of millions
    * of rows; after this prune the driver only ever holds a
    * model-sized list (≤ [[UniSeedCap]] + |alphabet| rows). */
  def uniSeedCandidates(wc: DataFrame): DataFrame = {
    val seedAll = Caching.temp(wc
      .select(col("wc"), explode(expr(
        s"flatten(transform(sequence(1, length(w)), i -> " +
          s"transform(sequence(1, least($UniMaxPiece, length(w)-i+1)), " +
          s"l -> substring(w, i, l))))")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("wc")).as("cnt")))
    val top = seedAll.orderBy(col("cnt").desc, col("piece")).limit(UniSeedCap)
    val singles = seedAll.where(length(col("piece")) === 1)
    // a piece in both legs carries the same aggregate count — dedup is
    // value-identical whichever row survives
    top.unionByName(singles).dropDuplicates("piece")
  }

  def unigramPiecesList(documents: DataFrame): Seq[(String, Long, Long)] = {
    val wc = Caching.temp(uniWordCounts(documents))
    val seed = uniSeedCandidates(wc)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      .sortBy(_._1)
    val chars = seed.filter(_._1.length == 1).map(_._1).toSet
    def prune(counts: Seq[(String, Long)], cap: Int): Seq[(String, Long)] = {
      val byCount = counts.sortBy { case (p, c) => (-c, p) }.take(cap)
      val cntOf = counts.toMap
      (byCount.map(_._1).toSet ++ chars).toSeq.sorted
        .map(p => p -> cntOf.getOrElse(p, 0L))
    }
    var kept = seed
    for (_ <- 1 to UniIters) {
      val costs = uniCostMap(uniCosts(kept))
      val segCounts = wc
        .withColumn("dp", uniViterbiDp(col("w"), costs))
        .select(col("wc"),
          explode(uniViterbiPieces(col("w"), col("dp"))).as("piece"))
        .groupBy(col("piece")).agg(sum(col("wc")).as("cnt"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      kept = prune(segCounts, UniTargetVocab)
    }
    val finalCosts = uniCosts(kept).toMap
    kept.map { case (p, c) => (p, c, finalCosts(p)) }
  }

  /** The x223 piece table as a frame: (piece, n_uses, nll) with nll =
    * cost/[[UniCostScale]] on the 4dp grid. */
  def unigramToDF(s: SparkSession,
                  pieces: Seq[(String, Long, Long)]): DataFrame = {
    import s.implicits._
    pieces.toDF("piece", "n_uses", "cost")
      .select(col("piece"), col("n_uses"),
        Portable.round4(col("cost").cast("double") / UniCostScale).as("nll"))
  }

  /** Per-piece NLL keep threshold for [[unigramPplFilter]] — on the
    * model's natural scale (−ln p per emitted piece; e^3.5 ≈ a
    * 33-way-uniform surprise per piece). */
  val UniPplCut = 3.5

  /** x229: UNIGRAM-LM PERPLEXITY QUALITY FILTER — every document
    * scored by its average per-piece negative log-likelihood under
    * the x223-trained unigram tokenizer, the model-based quality
    * filter of the CCNet/Gopher recipe but with the IN-REPO trained
    * model rather than an external one (composes x223's training with
    * the x38/x132 filter read): a doc whose text segments into
    * low-probability pieces (rare character runs, gibberish) scores
    * high and is flagged `kept = false` at [[UniPplCut]].
    *
    * Determinism: a word's total cost is the Viterbi DP's own exact
    * BIGINT on the [[UniCostScale]] grid (min over paths — no float
    * summation anywhere); per-doc sums are integer sums; the flag
    * compares the 4dp-rounded value, so both engines decide from the
    * same grid point.
    *
    * Scale: the encoder runs once over the DISTINCT vocabulary
    * (map-only DP fold); docs attach by one tok-keyed postings join +
    * hash aggregate — the x224 shape, nothing new scales with the
    * corpus. */
  def unigramPplFilter(documents: DataFrame,
                       pieces: Seq[(String, Long, Long)]): DataFrame = {
    val costs = uniCostMap(pieces.map(p => (p._1, p._3)))
    val enc = withTokens(documents)
      .select(explode(col("toks")).as("tok")).distinct()
      .withColumn("dp", uniViterbiDp(col("tok"), costs))
      .select(col("tok"),
        element_at(col("dp"), length(col("tok")) + 1).getField("c").as("wcost"),
        size(uniViterbiPieces(col("tok"), col("dp"))).cast("long").as("np"))
    withTokens(documents)
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .join(enc, Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(sum(col("wcost")).as("scost"), sum(col("np")).as("n_pieces"))
      .select(col("doc_id"), col("n_pieces"),
        Portable.round4(col("scost").cast("double") /
          (col("n_pieces").cast("double") * UniCostScale)).as("nll"))
      .withColumn("kept", col("nll") <= UniPplCut)
  }

  /** x224: TOKENIZER COMPARISON — BPE (x117's merges) vs unigram-LM
    * (x223's pieces) on the same corpus, per source: the x203
    * compression read run for both families side by side, which is
    * the table a tokenizer bake-off actually decides on
    * (chars/subword = context-window economics; the family with the
    * higher value packs more text per token budget).
    *
    * Scale: both encoders run over the DISTINCT vocabulary (BPE as
    * nested literal replaces, unigram as the Viterbi fold — map-only
    * either way); one postings shuffle attaches the per-token subword
    * counts, one ≤|sources|-key aggregate finishes. */
  def unigramCompareStats(documents: DataFrame,
                          merges: Seq[(String, String)],
                          pieces: Seq[(String, Long, Long)]): DataFrame = {
    val bpeEnc = encodedVocab(documents, merges)
      .select(col("tok"), size(col("subs")).cast("long").as("ns_bpe"))
    val costs = uniCostMap(pieces.map(p => (p._1, p._3)))
    val uniEnc = withTokens(documents)
      .select(explode(col("toks")).as("tok")).distinct()
      .withColumn("dp", uniViterbiDp(col("tok"), costs))
      .select(col("tok"),
        size(uniViterbiPieces(col("tok"), col("dp"))).cast("long").as("ns_uni"))
    val perDoc = withTokens(documents)
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .join(bpeEnc, Seq("tok"))
      .join(uniEnc, Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"),
        sum(col("ns_bpe")).as("n_bpe"), sum(col("ns_uni")).as("n_uni"))
    documents
      .select(col("doc_id"), col("source"),
        length(col("text")).cast("long").as("nc"))
      .join(perDoc, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nc")).as("n_chars"),
        coalesce(sum(col("n_toks")), lit(0L)).as("n_tokens"),
        coalesce(sum(col("n_bpe")), lit(0L)).as("n_bpe_subwords"),
        coalesce(sum(col("n_uni")), lit(0L)).as("n_uni_subwords"))
      .select(col("source"), col("n_docs"), col("n_chars"), col("n_tokens"),
        col("n_bpe_subwords"), col("n_uni_subwords"),
        when(col("n_bpe_subwords") > 0, Portable.round4(
          col("n_chars").cast("double") / col("n_bpe_subwords").cast("double")))
          .as("bpe_chars_per_subword"),
        when(col("n_uni_subwords") > 0, Portable.round4(
          col("n_chars").cast("double") / col("n_uni_subwords").cast("double")))
          .as("uni_chars_per_subword"))
  }

  /** x38: statistical LM quality score (CCNet-style filter): train an
    * add-one-smoothed BIGRAM language model on the corpus itself, then
    * score every document by its average negative log-likelihood
    * under that model — low NLL ≈ fluent/common phrasing, high NLL ≈
    * gibberish or off-distribution text. logp(w2|w1) =
    * ln((c(w1,w2)+1) / (c(w1·)+V)) with V = corpus vocabulary size.
    *
    * Portability: counts are exact integers; the only floats are the
    * per-bigram ln (identical argument in both engines) and the final
    * mean, rounded 4dp. Scale: two hash aggregates over the bigram
    * stream + one shuffle join of doc-bigrams against the model keyed
    * on (w1,w2) — the model is itself a distributed table, never
    * collected (a 100 TB corpus has billions of bigrams). */
  def lmScore(documents: DataFrame): DataFrame = {
    val bi = Caching.temp(docBigrams(documents))
    val c12 = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val c1 = bi.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val vocab = withTokens(documents)
      .select(explode(col("toks")).as("tok"))
      .agg(countDistinct(col("tok")).as("v"))
    // per-bigram logp is scaled to a 1e-7-grid BIGINT before summing:
    // double addition is order-dependent, integer sums are not, so the
    // per-doc mean is independent of partial-aggregation order in both
    // engines (same trick as the centroid sums)
    bi.join(c12, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        floor(log((col("c12") + 1).cast("double") / (col("c1") + col("v")).cast("double"))
          * Similarity.CentroidScale).cast("long").as("lp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp")).as("slp"))
      .select(col("doc_id"), col("n_bigrams"),
        Portable.round4(-(col("slp").cast("double") /
          (col("n_bigrams") * lit(Similarity.CentroidScale)).cast("double"))).as("nll"))
  }

  /** x39: REPETITION filters (Gopher-style): within-document
    * repetition ratios that catch degenerate/templated text —
    * distinct-token fraction, the most-frequent token's share, and the
    * most-frequent bigram's share. All ratios 4dp-rounded; ties in
    * "most frequent" need no break because only the COUNT is used.
    * Scale: one explode + hash aggregate keyed on (doc, gram) + a
    * per-doc max — no windows, no joins back to the text. */
  def repetitionStats(documents: DataFrame): DataFrame = {
    val tokTop = docTermFreq(documents)
      .groupBy(col("doc_id"))
      .agg(max(col("tf")).as("top_tf"), sum(col("tf")).as("n_toks"),
        count(lit(1)).as("n_distinct"))
    val biTop = docBigrams(documents)
      .groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("bc"))
      .groupBy(col("doc_id"))
      .agg(max(col("bc")).as("top_bc"), sum(col("bc")).as("n_bi"))
    tokTop.join(biTop, Seq("doc_id"), "left")
      .select(col("doc_id"),
        Portable.round4(col("n_distinct").cast("double") / col("n_toks")).as("distinct_frac"),
        Portable.round4(col("top_tf").cast("double") / col("n_toks")).as("top_tok_frac"),
        coalesce(Portable.round4(col("top_bc").cast("double") / col("n_bi")), lit(0.0))
          .as("top_bigram_frac"))
  }

  /** x82: per-document unigram entropy + type/token ratio — the
    * standard "compressibility" quality signals (low-entropy word
    * salad and boilerplate score near 0; diverse prose scores high).
    *
    * H = ln(N) − (Σ c·ln c)/N over the per-doc term counts c (all
    * integers), so the only float work is the final fold. The Σ folds
    * a SORTED count list left-to-right (`sort_array` + `aggregate`),
    * matching the DuckDB oracle's `list_sum` over the same sorted
    * comprehension — an unordered float sum would round differently
    * per partitioning and break the 4dp hash (ExtSql conventions).
    *
    * Scale: explode → two hash aggregates keyed on (doc_id, tok) then
    * doc_id; count lists are vocabulary-per-doc sized (bounded by doc
    * length), never corpus-sized. */
  def tokenEntropy(documents: DataFrame): DataFrame =
    docTermFreq(documents)
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sort_array(collect_list(col("tf"))).as("cs"))
      .select(col("doc_id"), col("n_tokens"), col("n_types"),
        Portable.round4(col("n_types").cast("double") / col("n_tokens")).as("ttr"),
        Portable.round4(
          log(col("n_tokens").cast("double")) -
            aggregate(col("cs"), lit(0.0),
              (acc, c) => acc + c.cast("double") * log(c.cast("double"))) /
              col("n_tokens")).as("entropy"))

  /** Normalization alphabet for [[normalized]]: anything outside it
    * becomes a space before whitespace-collapse. */
  val NormStripPattern = "[^a-z0-9\\s]"

  /** x89: canonical text normalization + post-normalization dedup
    * classes — the cleanup most corpora run BEFORE near-dup mining
    * (lowercase → strip non-alphanumerics → collapse whitespace).
    * Emits per doc the normalized length, the normalized fingerprint,
    * and how many docs share it (`n_same` > 1 ⇒ the doc only
    * deduplicates AFTER normalization — exactly the rows raw exact
    * dedup misses). Map-only projection + one count window keyed on
    * the 32-char fingerprint: shuffles hashes, never bodies. */
  def normalized(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    documents
      .select(col("doc_id"), length(col("text")).cast("long").as("n_raw"),
        trim(regexp_replace(
          regexp_replace(lower(col("text")), NormStripPattern, " "),
          "\\s+", " ")).as("norm"))
      .select(col("doc_id"), col("n_raw"),
        length(col("norm")).cast("long").as("n_norm"), md5(col("norm")).as("norm_fp"))
      .withColumn("n_same", count(lit(1)).over(Window.partitionBy(col("norm_fp"))))
  }

  /** The doc_id-derived Unicode injection for [[unicodeNfc]], appended
    * to `text`. The fixture corpus is pure ASCII, so (same simulation
    * convention as x99's injected PII) the operator deterministically
    * plants the cases NFC exists for — mirrored literally in
    * [[graft.pipelines.ExtSql]] via `chr()` codepoints:
    *  - doc_id % 5 == 0 → one decomposed pair (`e` + U+0301 → é);
    *  - doc_id % 5 == 1 → two decomposed umlauts (`u` + U+0308 ×2);
    *  - doc_id % 5 == 2 → a PRECOMPOSED é (non-ASCII but already NFC
    *    — the must-not-change cohort);
    *  - doc_id % 5 == 3 → ring + diaeresis pairs (A+U+030A, o+U+0308);
    *  - doc_id % 5 == 4 → nothing (the pure-ASCII fast path). */
  def injectDecomposed(text: Column, docId: Column): Column = {
    val d5 = pmod(docId, lit(5))
    concat(text,
      // explicit \uXXXX escapes: a raw "é" in source would be
      // whatever form the editor composed -- exactly the ambiguity
      // NFC exists to resolve
      when(d5 === 0, lit(" cafe\u0301 menu"))
        .when(d5 === 1, lit(" u\u0308ber zu\u0308rich"))
        .when(d5 === 2, lit(" caf\u00E9 fjord"))
        .when(d5 === 3, lit(" A\u030Angstro\u0308m"))
        .otherwise(lit("")))
  }

  /** x105: Unicode NFC canonicalization via the native
    * [[graft.functions.NfcNormalize]] expression — per doc the
    * codepoint length before/after, how many combining pairs composed,
    * whether the text changed at all, and the post-NFC fingerprint
    * (the hash raw exact-dedup should have used). Map-only single
    * codegen'd projection, no shuffle, no UDF (PlanSpec-gated); the
    * already-normalized fast path returns the input object unchanged. */
  def unicodeNfc(documents: DataFrame): DataFrame = {
    graft.functions.NfcNormalize.register(documents.sparkSession)
    val aug = injectDecomposed(col("text"), col("doc_id"))
    documents
      .select(col("doc_id"), aug.as("raw"),
        graft.functions.NfcNormalize.nfcCol(aug).as("nfc"))
      .select(col("doc_id"),
        length(col("raw")).cast("long").as("n_raw"),
        length(col("nfc")).cast("long").as("n_nfc"),
        (length(col("raw")) - length(col("nfc"))).cast("long").as("n_composed"),
        (col("raw") =!= col("nfc")).cast("long").as("changed"),
        md5(col("nfc")).as("nfc_fp"))
  }

  /** Unicode scripts x110 classifies — the order IS the dominance
    * tie-break (earlier wins). Java regex spells a script class
    * `\p{IsLatin}` where RE2/DuckDB spells it `\p{Latin}`, so the
    * NAMES are the shared constant and each side derives its own
    * class syntax (the one sanctioned exception to the pattern-∩
    * rule — the semantics, UAX #24 script assignment, are identical). */
  val ScriptNames: Seq[String] = Seq("Latin", "Cyrillic", "Han")
  /** Java-regex char class for one script (Spark side). */
  def javaScriptClass(name: String): String = s"[\\p{Is$name}]"
  /** RE2 char class for one script (DuckDB oracle side). */
  def re2ScriptClass(name: String): String = s"[\\p{$name}]"
  /** Non-script classes, valid verbatim in BOTH engines. */
  val DigitClass = "[0-9]"
  val SpaceClass = "\\s"
  val AsciiClass = "[\\x00-\\x7F]"

  /** The doc_id-derived multilingual injection for [[scriptProfile]],
    * appended to `text`. The fixture corpus is pure ASCII (same
    * simulation convention as x99/x105/x108), so the operator plants
    * the scripts it exists to detect — mirrored codepoint-for-
    * codepoint in [[graft.pipelines.ExtSql]] via `chr()`:
    *  - doc_id % 4 == 0 → a Cyrillic phrase ("привет мир");
    *  - doc_id % 4 == 1 → a Han phrase ("机器学习 数据");
    *  - doc_id % 4 == 2 → precomposed accented Latin + digits
    *    (U+00E9/U+00FC — non-ASCII but still Latin script; combining
    *    marks are deliberately NOT used here: U+0301 is script
    *    Inherited, whose classification is x105's NFC problem);
    *  - doc_id % 4 == 3 → nothing (the pure-ASCII cohort). */
  // explicit \uXXXX escapes (same rationale as injectDecomposed): the
  // ExtSql mirror regenerates these via chr(codePoint), so the source
  // form must be the exact codepoint sequence, not editor-composed
  val CyrillicInject  = " \u043f\u0440\u0438\u0432\u0435\u0442 \u043c\u0438\u0440"
  val HanInject       = " \u673a\u5668\u5b66\u4e60 \u6570\u636e"
  val AccentInject    = " caf\u00e9 z\u00fcrich 2024"

  def injectScripts(text: Column, docId: Column): Column = {
    val d4 = pmod(docId, lit(4))
    concat(text,
      when(d4 === 0, lit(CyrillicInject))
        .when(d4 === 1, lit(HanInject))
        .when(d4 === 2, lit(AccentInject))
        .otherwise(lit("")))
  }

  /** x110: per-document Unicode script / character-class profile — the
    * charset-detection stage every multilingual corpus pipeline runs
    * before language ID (CCNet buckets by fastText lang+script;
    * Dolma's per-language pools are script-gated). Per doc: codepoint
    * counts for each [[ScriptNames]] script, digits, whitespace,
    * ASCII, the arithmetic remainder (punctuation/symbols/other
    * scripts), and the dominant script under the [[ScriptNames]]
    * tie-break order.
    *
    * Scale: map-only — all counts are `regexp_count` passes fused into
    * ONE whole-stage-codegen projection, no shuffle, no UDF
    * (PlanSpec-gated); like x108 this is pure per-split CPU at 100 TB. */
  def scriptProfile(documents: DataFrame): DataFrame = {
    val aug = injectScripts(col("text"), col("doc_id"))
    def cnt(pat: String) = regexp_count(col("raw"), lit(pat)).cast("long")
    val counted = documents
      .select(col("doc_id"), aug.as("raw"))
      .select(col("doc_id"),
        length(col("raw")).cast("long").as("n_chars"),
        cnt(javaScriptClass("Latin")).as("n_latin"),
        cnt(javaScriptClass("Cyrillic")).as("n_cyrillic"),
        cnt(javaScriptClass("Han")).as("n_han"),
        cnt(DigitClass).as("n_digit"),
        cnt(SpaceClass).as("n_space"),
        cnt(AsciiClass).as("n_ascii"))
    counted.select(col("doc_id"), col("n_chars"), col("n_latin"),
      col("n_cyrillic"), col("n_han"), col("n_digit"), col("n_space"),
      col("n_ascii"),
      (col("n_chars") - col("n_latin") - col("n_cyrillic") - col("n_han")
        - col("n_digit") - col("n_space")).as("n_other"),
      when(col("n_latin") >= col("n_cyrillic") && col("n_latin") >= col("n_han"), lit("Latin"))
        .when(col("n_cyrillic") >= col("n_han"), lit("Cyrillic"))
        .otherwise(lit("Han")).as("main_script"))
  }

  /** x112 chunk geometry: window width and stride in tokens (overlap =
    * width − stride). The classic RAG / long-context-pretraining
    * chunker shape (e.g. LangChain/LlamaIndex defaults are
    * width ≫ overlap sliding windows; Lewis et al. '20 RAG chunks
    * passages at fixed token width). */
  val ChunkTokens = 64
  val ChunkStride = 48

  /** x112: sliding-window document chunking — one row per (doc,
    * chunk): chunk index, token start offset, token count, the chunk
    * text and its md5 (the id a downstream retrieval index or packing
    * stage would key on). Chunk starts are 0, S, 2S, … while < n, so
    * every token lands in ≥1 chunk and consecutive chunks overlap by
    * width − stride tokens; docs tokenize-empty are dropped (and the
    * n ≥ 1 guard keeps the start-count expression in the
    * truncation-vs-floor-agnostic domain — see ExtSql mirror note).
    *
    * Scale: map-only — tokenize, one `transform` over the start
    * sequence, one explode; no shuffle, no UDF (PlanSpec-gated). Chunk
    * rows are ~n/S per doc, emitted streaming from the generate — at
    * 100 TB this is scan-speed row expansion, exactly how a cluster
    * chunker should behave. */
  /** The slice stage [[chunkDocs]] and the x217 chunk-retrieval eval
    * share: (doc_id, chunk_idx, tok_start, ctoks) — one row per
    * chunk, token array intact (x112 re-serializes it; x217 builds
    * the chunk inverted index from it). */
  def chunkSlices(documents: DataFrame,
                  width: Int = ChunkTokens, stride: Int = ChunkStride): DataFrame = {
    val n = size(col("toks"))
    withTokens(documents)
      .filter(n >= 1)
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0),
          floor((n - 1).cast("double") / stride).cast("int"))).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        (col("chunk_idx") * stride).cast("long").as("tok_start"),
        slice(col("toks"), col("chunk_idx") * stride + 1, lit(width)).as("ctoks"))
  }

  def chunkDocs(documents: DataFrame,
                width: Int = ChunkTokens, stride: Int = ChunkStride): DataFrame =
    chunkDocsFrom(chunkSlices(documents, width, stride))

  /** [[chunkDocs]] over a pre-built slice frame — so x112 and the x217
    * retrieval eval share ONE tokenize+posexplode+slice corpus scan
    * (the memo lives in graft.pipelines.Extensions). */
  def chunkDocsFrom(slices: DataFrame): DataFrame =
    slices
      .select(col("doc_id"), col("chunk_idx"), col("tok_start"),
        size(col("ctoks")).cast("long").as("n_chunk_tokens"),
        concat_ws(" ", col("ctoks")).as("chunk_text"))
      .withColumn("chunk_fp", md5(col("chunk_text")))

  /** x3: document fingerprints (canonical md5, min-shingle, rolling). */
  def fingerprints(documents: DataFrame): DataFrame =
    withTokens(documents)
      .select(col("doc_id"), col("text"), shingles(col("toks")).as("sh"),
        transform(col("toks"), Dedup.tokenHash16 _).as("tv"))
      .select(
        col("doc_id"),
        fingerprint(col("text")).as("fp_full"),
        array_min(transform(col("sh"), s => md5(s))).as("fp_min_shingle"),
        rollingFingerprint(col("tv")).as("fp_rolling"))

  /** x132: HELD-OUT bigram LM scoring — x38's add-one model, but with
    * train/test discipline: the model (bigram counts, unigram counts,
    * vocabulary) is built ONLY from even doc_ids and scores ONLY odd
    * doc_ids, via LEFT joins with zero-backoff for unseen events
    * ((0+1)/(0+V) for a novel bigram under a novel history). This is
    * the honest perplexity a quality-filter threshold should be tuned
    * on — in-corpus scoring (x38) rewards memorization, and the gap
    * between the two is itself a leakage signal.
    *
    * Scale: identical plan shape to x38 (the model is a distributed
    * table, never collected; test bigrams shuffle-join it on (w1,w2)),
    * plus nothing — the split predicates are map-side filters. The
    * per-bigram logp goes through the 1e-7-grid BIGINT sum so the
    * per-doc mean is aggregation-order-independent. */
  def heldoutLmScore(documents: DataFrame): DataFrame = {
    val train = documents.filter(col("doc_id") % 2 === 0)
    val biTrain = Caching.temp(docBigrams(train))
    val c12 = biTrain.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val c1 = biTrain.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val vocab = withTokens(train)
      .select(explode(col("toks")).as("tok"))
      .agg(countDistinct(col("tok")).as("v"))
    docBigrams(documents.filter(col("doc_id") % 2 === 1))
      .join(c12, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        floor(log((coalesce(col("c12"), lit(0L)) + 1).cast("double") /
            (coalesce(col("c1"), lit(0L)) + col("v")).cast("double"))
          * Similarity.CentroidScale).cast("long").as("lp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp")).as("slp"))
      .select(col("doc_id"), col("n_bigrams"),
        Portable.round4(-(col("slp").cast("double") /
          (col("n_bigrams") * lit(Similarity.CentroidScale)).cast("double"))).as("nll"))
  }

  /** x162 support floor / result depth. */
  val PmiMinCount = 5
  val PmiTopK = 20

  /** x162: PMI COLLOCATIONS — the top word bigrams by pointwise mutual
    * information, ln(p(ab)/(p(a)p(b))), with a support floor (the
    * classic collocation extractor; high-PMI pairs are the multiword
    * units a tokenizer/vocab designer wants to know about, and a
    * boilerplate-heavy corpus announces itself with absurd ones).
    *
    * Determinism & scale: counts are exact integer aggregates; PMI is
    * computed in LOG SPACE — ln c_ab + 2·ln T − ln B − ln c_a − ln c_b
    * — so no product ever overflows at any corpus size (c_ab·T² would
    * pass 2⁶³ long before 100 TB); identical IEEE op order in both
    * engines, snapped to 1e-4 BEFORE ranking with (w1, w2) ties. The
    * unigram attach is a keyed join on the word (vocab-sized, not
    * broadcastable by contract); the top-k is the global heap. */
  def pmiCollocations(documents: DataFrame): DataFrame = {
    val bi = Caching.temp(docBigrams(documents))
    val cAb = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_ab"))
    val uni = Caching.temp(withTokens(documents)
      .select(explode(col("toks")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c")))
    val tTot = uni.agg(sum(col("c")).as("t"))
    val bTot = bi.agg(count(lit(1)).as("b"))
    val pmi = log(col("c_ab").cast("double")) +
      lit(2.0) * log(col("t").cast("double")) -
      log(col("b").cast("double")) -
      log(col("c_a").cast("double")) - log(col("c_b").cast("double"))
    cAb.filter(col("c_ab") >= PmiMinCount)
      .join(uni.select(col("tok").as("w1"), col("c").as("c_a")), Seq("w1"))
      .join(uni.select(col("tok").as("w2"), col("c").as("c_b")), Seq("w2"))
      .crossJoin(broadcast(tTot)).crossJoin(broadcast(bTot))
      .select(col("w1"), col("w2"), col("c_ab"), Portable.round4(pmi).as("pmi"))
      .orderBy(col("pmi").desc, col("w1").asc, col("w2").asc)
      .limit(PmiTopK)
  }

  /** x133 per-stratum reservoir depth. */
  val ReservoirK = 10

  /** x133: per-language DETERMINISTIC RESERVOIR — exactly
    * min(k, |stratum|) docs per language, drawn uniformly-at-"random"
    * by ranking on a salted content-independent hash of the doc id
    * (md5, so re-runs and both engines agree; a true Random would
    * make the result unverifiable). Complements x33 (fixed FRACTION
    * per stratum) and x74 (weighted): fixed COUNT per stratum is the
    * contract eval-set construction needs.
    *
    * Scale: one shuffle on lang + per-partition top-k heaps —
    * WindowGroupLimit pushes rnk ≤ k below the sort exactly as in
    * x17, so no partition ever fully sorts. */
  def reservoirSample(documents: DataFrame, k: Int = ReservoirK): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang")).orderBy(col("hkey"), col("doc_id"))
    documents
      .select(col("doc_id"), col("lang"),
        md5(concat(lit("res:"), col("doc_id").cast("string"))).as("hkey"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("lang"), col("rnk"))
  }

  /** x137 pass threshold and z for the 95% interval. */
  val QualityPassBar = 0.5
  val WilsonZ = 1.96

  /** x137: per-language quality PASS RATE with a WILSON 95% interval —
    * point estimates without uncertainty are how small-language
    * filtering decisions go wrong (a 0.8 pass rate over 40 docs and
    * over 40,000 are different facts). Wilson rather than normal
    * approximation because small strata are exactly the case that
    * matters: the interval stays inside [0,1] and behaves at k=0/k=n.
    * All doubles flow through one fixed expression order and round to
    * the 1e-4 grid, so both engines agree bit-for-bit.
    *
    * Scale: one hash aggregate to |languages| rows; the interval is a
    * projection on the aggregate output. */
  def qualityCi(documents: DataFrame): DataFrame = {
    val z2 = WilsonZ * WilsonZ
    val n = col("n").cast("double")
    val p = col("k") / n
    val denom = lit(1.0) + lit(z2) / n
    val center = p + lit(z2) / (n * 2)
    val half = lit(WilsonZ) * sqrt(p * (lit(1.0) - p) / n + lit(z2) / (n * n * 4))
    withTokens(documents)
      .select(col("lang"),
        (qualityScore(col("text"), col("toks")) >= QualityPassBar).as("pass"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("pass"), 1L).otherwise(0L)).as("k"))
      .select(col("lang"), col("n"), col("k"),
        Portable.round4(p).as("rate"),
        Portable.round4((center - half) / denom).as("lo"),
        Portable.round4((center + half) / denom).as("hi"))
  }

  /** x138 smoothing: +0.5 per bin (10 bins → +5 per split total). */
  val PsiBins = 10

  /** x138: POPULATION STABILITY INDEX between the train and test
    * splits' quality-score distributions — the drift monitor every
    * production scorer runs (PSI > 0.2 = investigate): the x29
    * content-addressed split SHOULD make the two distributions
    * identical up to sampling noise, so this is also a standing check
    * that the split hash is not correlated with content. Per decile
    * bin: counts, smoothed shares (+0.5/bin — keeps ln finite on
    * empty bins, mirrored exactly), and the bin's PSI term
    * (p−q)·ln(p/q); the statistic is the sum of the 10 terms.
    *
    * Scale: one aggregate over the corpus to (split × bin ≤ 30)
    * rows; the dense bin grid is a 10-row sequence-explode joined by
    * broadcast. */
  def psiDrift(documents: DataFrame): DataFrame = {
    val q = withTokens(documents)
      .select(col("doc_id"),
        least(lit(PsiBins - 1L),
          floor(qualityScore(col("text"), col("toks")) * PsiBins).cast("long"))
          .as("bin"))
    val counts = Caching.temp(splitAssign(documents)
      .select(col("doc_id"), col("split"))
      .join(q, Seq("doc_id"))
      .filter(col("split") =!= "val")
      .groupBy(col("split"), col("bin"))
      .agg(count(lit(1)).as("c")))
    val tots = counts.groupBy(col("split")).agg(sum(col("c")).as("tot"))
    val grid = documents.sparkSession.range(PsiBins).toDF("bin")
    def share(split: String, as: String, totAs: String) = grid
      .join(broadcast(counts.filter(col("split") === split).select(col("bin"), col("c"))),
        Seq("bin"), "left")
      .crossJoin(broadcast(tots.filter(col("split") === split).select(col("tot"))))
      .select(col("bin"), coalesce(col("c"), lit(0L)).as(as), col("tot").as(totAs))
    val p = (col("n_train") + 0.5) / (col("tot_train") + PsiBins * 0.5)
    val qq = (col("n_test") + 0.5) / (col("tot_test") + PsiBins * 0.5)
    // both sides are PsiBins rows by construction — hint it, or the
    // un-materialized cache's inflated estimate plans a sort-merge
    share("train", "n_train", "tot_train")
      .join(broadcast(share("test", "n_test", "tot_test")), Seq("bin"))
      .select(col("bin"), col("n_train"), col("n_test"),
        Portable.round4(p).as("p_train"),
        Portable.round4(qq).as("p_test"),
        Portable.round4((p - qq) * log(p / qq)).as("psi_term"))
  }

  /** x123: per-language QUALITY PERCENTILE — each doc's percent_rank
    * of its quality score within its language, plus the decile it
    * lands in. This is the feature-normalization step curriculum /
    * mixture samplers want: "top 10% English" means something, raw
    * scores across languages don't. The rank order (quality, doc_id)
    * is TOTAL, so percent_rank is deterministic and the DuckDB window
    * agrees bit-for-bit; the percentile is snapped to the 1e-4 grid.
    *
    * Scale: one shuffle on lang + a per-language sort. A language
    * partition is the whole corpus slice — when a single language
    * dominates (English at web scale), this window is the textbook
    * skewed-window case; the swap-in is the x60 two-phase
    * range-partitioned rank (per-range local ranks + broadcast
    * offsets), which this op's contract allows because the rank order
    * is total. Kept as the single-window form here where it's the
    * right plan for bounded groups. */
  def qualityPercentile(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("quality_score").asc, col("doc_id").asc)
    textStats(documents)
      .select(col("doc_id"), col("lang"), col("quality_score"),
        Portable.round4(percent_rank().over(w)).as("pctl"))
      .withColumn("decile", least(lit(9L), floor(col("pctl") * 10).cast("long")))
  }

  /** x127: per-source DATASET CARD — the one-row-per-source summary a
    * data release ships (datasheet/data-card practice): volume, token
    * mass, language spread, mean quality, and the exact-duplicate
    * rate against the WHOLE corpus (a source whose docs mostly exist
    * elsewhere is a re-crawl, not new data). Means are computed on
    * integral grids (token counts; quality·10⁴) so they are
    * aggregation-order-independent in both engines.
    *
    * Scale: two hash aggregates — one on the canonical fingerprint
    * (corpus-wide copy counts), one on source — plus a fingerprint-
    * keyed join of the doc frame against the fp counts; all three key
    * on high-cardinality columns that partition evenly. |output| =
    * |sources|. */
  def datasetCard(documents: DataFrame): DataFrame = {
    val stats = withTokens(documents)
      .select(col("doc_id"), col("source"), col("lang"),
        fingerprint(col("text")).as("fp"),
        size(col("toks")).cast("long").as("n_toks"),
        length(col("text")).cast("long").as("n_chars"),
        // floor(+0.5), NOT a bare cast: Spark casts double→long by
        // truncation, DuckDB by rounding — the explicit round is the
        // only form both engines agree on
        floor(qualityScore(col("text"), col("toks")) * 10000 + 0.5)
          .cast("long").as("q4"))
    val fpCounts = stats.groupBy(col("fp")).agg(count(lit(1)).as("n_copies"))
    stats.join(fpCounts, Seq("fp"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("q4")).as("sum_q4"),
        sum(col("n_chars")).as("n_chars"),
        sum(when(col("n_copies") > 1, 1L).otherwise(0L)).as("n_dup_docs"))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("n_langs"),
        Portable.round4(col("sum_q4") / col("n_docs") / lit(10000.0))
          .as("mean_quality"),
        col("n_chars"), col("n_dup_docs"),
        Portable.round4(col("n_dup_docs").cast("double") / col("n_docs"))
          .as("dup_rate"))
  }

  // ---- x142 readability --------------------------------------------

  /** Sentence boundary runs / syllable nuclei (vowel groups) for the
    * x142 readability score — the classic regex approximations (a
    * vowel-group count is the standard cheap syllable estimator). */
  val SentencePattern = "[.!?]+"
  val SyllablePattern = "[aeiouy]+"

  /** x142 band cuts, applied to the 1e-4-snapped score. */
  val FleschEasyBar  = 60.0
  val FleschMediumBar = 30.0

  /** x142: Flesch reading-ease per document — words/sentence and
    * syllables/word over regex counts, banded easy/medium/hard (a
    * standard curriculum/quality signal next to x1's ratios and
    * x101's Gopher battery). Zero-token docs band as `(empty)` with a
    * NULL score rather than dividing by zero.
    *
    * Scale: map-only — three regex counts and arithmetic in one
    * codegen projection, no shuffle, no UDF; runs at scan speed like
    * x1. The band compares the ALREADY-snapped score against literal
    * cuts, so both engines band identically. */
  def readability(documents: DataFrame): DataFrame = {
    val nw = size(tokens(col("text"))).cast("long")
    val ns = greatest(lit(1L),
      size(regexp_extract_all(col("text"), lit(SentencePattern), lit(0))).cast("long"))
    val sy = size(regexp_extract_all(lower(col("text")), lit(SyllablePattern), lit(0)))
      .cast("long")
    val score = Portable.round4(
      lit(206.835) - lit(1.015) * (col("n_words").cast("double") / col("n_sentences"))
        - lit(84.6) * (col("n_syllables").cast("double") / col("n_words")))
    documents
      .select(col("doc_id"), col("lang"), nw.as("n_words"), ns.as("n_sentences"),
        sy.as("n_syllables"))
      .select(col("doc_id"), col("lang"), col("n_words"), col("n_sentences"),
        col("n_syllables"),
        when(col("n_words") === 0, lit(null).cast("double"))
          .otherwise(score).as("flesch"))
      .withColumn("band",
        when(col("n_words") === 0, "(empty)")
          .when(col("flesch") >= FleschEasyBar, "easy")
          .when(col("flesch") >= FleschMediumBar, "medium")
          .otherwise("hard"))
  }

  // ---- x140 Zipf slope ---------------------------------------------

  /** x140: ranks entering the log-log regression (the Zipf head). */
  val ZipfTopR = 100

  /** x140: Zipf's-law fit per language — the least-squares slope (and
    * rank-1 intercept) of ln(freq) against ln(rank) over the top-100
    * token frequencies. Natural corpora sit near slope −1; a synthetic
    * or template-heavy source shows up as a flat or cliffed head, so
    * this is a standing corpus-health probe next to x26's IDF and
    * x138's PSI.
    *
    * Determinism (x69 pattern): ln values enter as 1e-6 fixed-point
    * BIGINTs, so all regression moments are EXACT integer sums that
    * commute across partitions; floats appear only in the final
    * per-language slope formula (identical IEEE op sequence in both
    * engines), snapped to 1e-4.
    *
    * Scale: token counting is one hash aggregate; the top-100 head is
    * taken by the HEAP operator ([[graft.plans.TopKPerKey]]) — no
    * vocabulary-wide sort or window anywhere (the x60 lesson); the
    * rank itself is then a window over ≤ 100·|langs| surviving rows. */
  def zipfSlope(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val freqs = withTokens(documents)
      .select(col("lang"), explode(col("toks")).as("tok"))
      .groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("f"))
    val top = graft.plans.TopKPerKey.topKPerKey(freqs,
      Seq(col("lang")), Seq(col("f").desc, col("tok").asc), ZipfTopR)
    val r = row_number().over(
      Window.partitionBy(col("lang")).orderBy(col("f").desc, col("tok").asc))
    def lnFix(c: Column): Column =
      floor(log(c.cast("double")) * 1e6 + 0.5).cast("long")
    val moments = top.withColumn("r", r)
      .select(col("lang"), lnFix(col("r")).as("lx"), lnFix(col("f")).as("ly"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("lx")).as("sx"), sum(col("ly")).as("sy"),
        sum(col("lx") * col("lx")).as("sxx"), sum(col("lx") * col("ly")).as("sxy"))
    val n = col("n").cast("double")
    val slope = (n * col("sxy").cast("double") -
        col("sx").cast("double") * col("sy").cast("double")) /
      (n * col("sxx").cast("double") -
        col("sx").cast("double") * col("sx").cast("double"))
    moments.select(col("lang"), col("n"),
      Portable.round4(slope).as("slope"),
      Portable.round4((col("sy").cast("double") - slope * col("sx").cast("double"))
        / n / 1e6).as("ln_f1"))
  }

  // ---- x149 OOV rate against the frequency vocabulary --------------

  /** x149 vocabulary size (top tokens by global frequency). */
  val OovVocabK = 500

  /** x149: per-document OUT-OF-VOCABULARY rate against the top-
    * [[OovVocabK]] frequency vocabulary — the tokenizer-coverage
    * metric that decides whether a frequency-truncated vocab (x60's
    * id table, x117's merges) is big enough: a doc with a high OOV
    * rate will shatter into bytes/UNKs at training time. Docs with
    * zero tokens emit a NULL rate (no coverage claim to make).
    *
    * Scale: vocabulary selection is the heap-based global top-k
    * (TakeOrderedAndProject over the token aggregate — the x21 shape,
    * never a full vocab sort-shuffle); the K-row vocab BROADCASTS to
    * the exploded token stream (flag = left-join miss), then one
    * doc_id-keyed aggregate; empty docs re-enter by a left join from
    * the corpus spine. */
  def oovRate(documents: DataFrame): DataFrame = {
    val vocab = withTokens(documents)
      .select(explode(col("toks")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok").asc)
      .limit(OovVocabK)
      .select(col("tok"), lit(1L).as("in_vocab"))
    val perDoc = withTokens(documents)
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
    documents.select(col("doc_id"), col("lang"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"))
      .withColumn("oov_rate",
        when(col("n_tokens") === 0, lit(null).cast("double"))
          .otherwise(Portable.round4(
            col("n_oov").cast("double") / col("n_tokens").cast("double"))))
  }

  // ---- x150 Heaps'-law fit -----------------------------------------

  /** x150: HEAPS'-LAW fit per language — the least-squares slope β and
    * intercept of ln(distinct tokens) against ln(total tokens) over
    * per-document points (V ≈ K·Nᵝ, natural text β ≈ 0.4–0.6). The
    * companion corpus-health probe to x140's Zipf head: template or
    * repetitive sources show β near 0 (vocabulary stops growing),
    * concatenated-random junk shows β near 1.
    *
    * Same determinism pattern as x140/x69: ln's enter as 1e-6
    * fixed-point BIGINTs, regression moments are exact integer sums,
    * floats only in the final per-language formula. Scale: map-only
    * per-doc counts (no shuffle until the |langs|-row aggregate). */
  def heapsFit(documents: DataFrame): DataFrame = {
    def lnFix(c: Column): Column =
      floor(log(c.cast("double")) * 1e6 + 0.5).cast("long")
    val pts = withTokens(documents)
      .select(col("lang"), size(col("toks")).cast("long").as("nt"),
        size(array_distinct(col("toks"))).cast("long").as("nd"))
      .filter(col("nt") > 0)
      .select(col("lang"), lnFix(col("nt")).as("lx"), lnFix(col("nd")).as("ly"))
    val moments = pts.groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("lx")).as("sx"), sum(col("ly")).as("sy"),
        sum(col("lx") * col("lx")).as("sxx"), sum(col("lx") * col("ly")).as("sxy"))
    val n = col("n").cast("double")
    val beta = (n * col("sxy").cast("double") -
        col("sx").cast("double") * col("sy").cast("double")) /
      (n * col("sxx").cast("double") -
        col("sx").cast("double") * col("sx").cast("double"))
    moments.select(col("lang"), col("n"),
      Portable.round4(beta).as("beta"),
      Portable.round4((col("sy").cast("double") - beta * col("sx").cast("double"))
        / n / 1e6).as("ln_k"))
  }

  // ---- x143 Lorenz concentration -----------------------------------

  /** x143: token-mass LORENZ CURVE per language — docs ranked by token
    * count (desc), bucketed into rank deciles, with each decile's doc
    * count, token mass and the cumulative share of the language's
    * tokens. "The top 10% of documents hold 38% of the tokens" is the
    * concentration read a mixture designer (x103/x118) starts from.
    *
    * Determinism: decile = ceil(10·rn/cnt) in EXACT integer arithmetic
    * ((10·rn + cnt − 1) div cnt); token sums are integral; the only
    * double is the final cumulative share, snapped to 1e-4.
    *
    * Scale: one shuffle on lang + a per-language sort for the ranking
    * window (same bounded-group caveat and two-phase swap-in as x123);
    * everything after runs on the 10-row-per-language decile frame. */
  def lorenzDeciles(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wRank = Window.partitionBy(col("lang"))
      .orderBy(col("n_toks").desc, col("doc_id").asc)
    val wLang = Window.partitionBy(col("lang"))
    val wCum = Window.partitionBy(col("lang")).orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withTokens(documents)
      .select(col("lang"), col("doc_id"), size(col("toks")).cast("long").as("n_toks"))
      .select(col("lang"), col("n_toks"),
        row_number().over(wRank).cast("long").as("rn"),
        count(lit(1)).over(wLang).as("cnt"))
      .select(col("lang"), col("n_toks"),
        floor((col("rn") * 10 + col("cnt") - 1) / col("cnt")).cast("long").as("decile"))
      .groupBy(col("lang"), col("decile"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("toks"))
      .select(col("lang"), col("decile"), col("n_docs"), col("toks"),
        Portable.round4(sum(col("toks")).over(wCum).cast("double") /
          sum(col("toks")).over(wLang).cast("double")).as("cum_share"))
  }

  /** Largest coverage grid point: 2^13 = 8192 vocab entries. */
  val CoverageMaxLog2 = 13

  /** x183: VOCAB COVERAGE CURVE — what share of the corpus token MASS
    * the top-K frequency vocabulary covers, at K = 1, 2, 4, …, 8192
    * (the tokenizer-economics curve behind vocab sizing: x149 scores
    * docs against ONE fixed vocab, this sweeps the size axis; read
    * with x140's Zipf slope, which predicts its shape).
    *
    * Determinism: the frequency rank is the total (count desc, token)
    * order; each token's grid bucket (smallest 2^i ≥ rank) is an
    * exact-integer WHEN/CASE chain — ceil(log2(rank)) in doubles
    * would misbucket exact powers of two on a one-ulp error.
    *
    * Scale: one corpus aggregate to the vocabulary; the rank is the
    * two-phase [[Ranking.globalRowNumber]] (never a vocabulary-wide
    * single-partition sort — the x60 lesson); the running coverage
    * sum lives on the ≤14-row grid. */
  def vocabCoverage(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val freqs = Caching.temp(withTokens(documents)
      .select(explode(col("toks")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt")))
    val total = freqs.agg(sum(col("cnt")).as("t"))
    val ranked = Ranking.globalRowNumber(freqs,
      Seq((-col("cnt")).as("nc"), col("tok")), "rnk")
    val gridK = (0 to CoverageMaxLog2).map(1L << _)
    // smallest K tested first: when(rnk<=1, 1).otherwise(when(rnk<=2, 2)…)
    val bucket = gridK.foldRight(lit(null).cast("long")) { (k, rest) =>
      when(col("rnk") <= k, lit(k)).otherwise(rest)
    }
    val wRun = Window.orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked.select(col("cnt"), bucket.as("k"))
      .filter(col("k").isNotNull)
      .groupBy(col("k")).agg(sum(col("cnt")).as("bucket_mass"))
      .crossJoin(broadcast(total))
      .select(col("k"), col("bucket_mass"),
        sum(col("bucket_mass")).over(wRun).as("covered"),
        Portable.round4(sum(col("bucket_mass")).over(wRun).cast("double") /
          col("t").cast("double")).as("share"))
  }

  /** Keyphrases kept by [[textRank]]. */
  val TextRankK = 25

  /** x253: TEXTRANK KEYWORDS (Mihalcea & Tarau '04) — PageRank over
    * the word CO-OCCURRENCE graph: nodes are corpus tokens, an edge
    * joins each adjacent token pair within a document (window 2,
    * self-pairs dropped), weight = co-occurrence count in either
    * order. The rank iteration is the x59 integer grid verbatim
    * (rank₀ = [[Graph.RankScale]], step = Teleport + 0.85·Σ — BIGINT
    * `div` end to end) with the WEIGHTED contribution
    * `(rank div wdeg) · w`; output is the top-[[TextRankK]] tokens by
    * (rank desc, token) — the corpus keyword list.
    *
    * Scale: adjacency extraction is one map-only HOF pass (no
    * posexplode self-join); the edge list aggregates to distinct
    * vocabulary pairs (bounded by corpus tokens, far below vocab²);
    * each of the fixed [[Graph.PrIters]] steps is one keyed join +
    * one aggregate on the vocab-pair frame; the final top-k is the
    * heap operator, never a vocabulary-wide sort. */
  def textRank(documents: DataFrame): DataFrame = {
    import graft.ops.Graph.{PrIters, RankScale, Teleport}
    val adj = withTokens(documents)
      .filter(size(col("toks")) >= 2)
      .select(explode(expr(
        """filter(transform(sequence(0, size(toks) - 2),
          |  i -> struct(toks[i] AS u, toks[i + 1] AS v)),
          |  p -> p.u <> p.v)""".stripMargin)).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
    val edges = Caching.temp(adj.union(adj.select(col("v"), col("u")))
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("w")))
    val wdeg = edges.groupBy(col("u")).agg(sum(col("w")).as("wdeg"))
    val withDeg = Caching.temp(edges.join(wdeg, Seq("u")))
    val r0 = wdeg.select(col("u").as("tok"), lit(RankScale).as("rank"))
    val rN = (1 to PrIters).foldLeft(r0) { (r, _) =>
      withDeg.join(r, withDeg("u") === r("tok"))
        .select(col("v"), (expr("rank div wdeg") * col("w")).as("contrib"))
        .groupBy(col("v")).agg(sum(col("contrib")).as("s"))
        .select(col("v").as("tok"),
          (lit(Teleport) + expr("(s * 17) div 20")).as("rank"))
    }
    rN.orderBy(col("rank").desc, col("tok")).limit(TextRankK)
  }

  /** x254: MISRA–GRIES HEAVY-HITTERS AUDIT — run the mergeable
    * [[graft.functions.MisraGries]] summary over the corpus token
    * stream and FORCE its recall guarantee against the exact answer:
    * the output is every TRUE heavy hitter (freq·Capacity > N, an
    * ordinary exact groupBy) flagged with sketch membership, and the
    * oracle emits literal TRUE for that flag — the sketch never runs
    * in DuckDB, its guarantee is what's on trial (the x226 MaxScore
    * audit convention applied to a sketch). The surviving counter set
    * itself is partition-order-dependent and deliberately NOT output;
    * membership of true heavy hitters is order-independent by the MG
    * bound under any merge tree.
    *
    * Scale: the summary shuffles ≤ Capacity counters per partition and
    * collects one model-sized map (the BPE-merge-list collect class);
    * the exact leg is the same token aggregate every lexical query
    * shares. At 100 TB the sketch pass is the cheap screen; the exact
    * leg here is the audit ground truth, bounded to the heavy-hitter
    * set after its one aggregate. */
  def heavyHittersAudit(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val toks = withTokens(documents).select(explode(col("toks")).as("tok"))
    val summary: Map[String, Long] = toks.as[String]
      .select(graft.functions.MisraGries.toColumn).head()
    val candidates = summary.keySet.toSeq.sorted
    val total = toks.agg(count(lit(1)).as("n_total"))
    toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * graft.functions.MisraGries.Capacity > col("n_total"))
      .select(col("tok"), col("cnt"),
        col("tok").isInCollection(candidates).as("in_sketch"))
  }
}
