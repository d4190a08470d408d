package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis._

/** Deduplication operators for corpus curation — the beyond-reference
  * track's core (builder brief; SURVEY.md §7 step 7).
  *
  *  - exact dedup: hash-groupBy on the canonical fingerprint;
  *  - MinHash + LSH banding (Broder '97 / MMDS ch.3): shingles →
  *    k md5-minhashes → b bands → band-bucket self-join → exact
  *    Jaccard verify;
  *  - SimHash (Charikar '02) with pigeonhole block join for
  *    Hamming-distance candidate pairs;
  *  - brute n-gram Jaccard as the exact verifier / small-data path.
  *
  * Portability: all "hashing" is md5 (identical lowercase hex in Spark
  * and DuckDB); a MinHash is the lexicographic MIN over hex strings and
  * a SimHash token value is the first 16 bits of the token md5 parsed
  * as an integer (`conv(…,16,10)` / `('0x'||…)::BIGINT`) — no
  * engine-specific hash functions, so the DuckDB oracle
  * ([[graft.pipelines.ExtSql]]) reproduces every signature exactly.
  *
  * Scale design (the point of LSH): candidate generation is
  * explode(bands) → shuffle on the 32-char band hash → within-bucket
  * pairs. At 100 TB the cost is O(docs·bands) shuffle rows, never an
  * O(n²) cross join; degenerate buckets (boilerplate shared by millions
  * of docs) are the known hot spot — AQE skew-split handles moderate
  * skew, and real deployments drop buckets above a size cap. The
  * Jaccard verify carries shingle sets through the band join rather
  * than re-joining by doc_id: one shuffle total.
  */
object Dedup {

  /** MinHash permutations (k) and LSH banding (b bands × r rows = k). */
  val NumHashes = 12
  val Bands     = 4
  val RowsPerBand: Int = NumHashes / Bands
  /** Near-dup acceptance threshold on shingle Jaccard. */
  val JaccardThreshold = 0.5
  /** Degenerate-LSH-bucket cap: a band bucket with m members yields
    * m²/2 candidate pairs, so one boilerplate hash shared by millions
    * of docs goes quadratic. Buckets over this size are dropped — their
    * members are boilerplate, not near-duplicates (exact dedup catches
    * the identical ones). ON BY DEFAULT; the DuckDB oracle applies the
    * same constant. */
  val MaxBucket = 64
  /** SimHash width in bits and max Hamming distance for near-dups. */
  val SimHashBits = 16
  val HammingMax  = 2
  /** Pigeonhole blocks: ≤ HammingMax differing bits ⇒ ≥1 equal block. */
  val SimHashBlocks: Int = HammingMax + 1

  // ---- exact dedup -------------------------------------------------

  /** x4: one row per distinct canonical text: fingerprint, keeper
    * (min doc_id), group size. Hash aggregate on the 32-char md5 —
    * at scale this shuffles fixed-width keys, not document bodies. */
  def exactDedup(documents: DataFrame): DataFrame =
    documents
      .select(fingerprint(col("text")).as("fp"), col("doc_id"))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))

  /** x146 normalization: lowercase, punctuation/digits → space,
    * whitespace collapsed — the aggressive canonical key public
    * pipelines layer ABOVE raw-exact dedup (Dolma's "exact" and
    * Lee et al. §3.1 both normalize before hashing). */
  def normalizedFingerprint(text: Column): Column =
    md5(trim(regexp_replace(regexp_replace(lower(text), "[^a-z\\s]", " "), "\\s+", " ")))

  /** x146: NORMALIZED-exact dedup — x4 re-keyed on
    * [[normalizedFingerprint]], with `n_raw_variants` counting how many
    * distinct RAW fingerprints each normalized group collapses (the
    * measurable gain of normalizing: groups with n_raw_variants > 1
    * are dups that raw-exact dedup missed). Same scale shape as x4 —
    * hash aggregate on 32-char keys, bodies never shuffle; the
    * distinct-count is per-group over two fixed-width hashes. */
  def normalizedDedup(documents: DataFrame): DataFrame =
    documents
      .select(normalizedFingerprint(col("text")).as("nfp"),
        fingerprint(col("text")).as("fp"), col("doc_id"))
      .groupBy(col("nfp"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"),
        countDistinct(col("fp")).as("n_raw_variants"))

  // ---- MinHash + LSH -----------------------------------------------

  /** Mersenne prime modulus for the universal-hash MinHash family. */
  val HashPrime: Long = 2147483647L

  /** Per-permutation (multiplier, offset) pairs, md5-derived in Scala
    * and inlined as literals into BOTH engines (like
    * [[Similarity.planeWeights]]). Multipliers are odd 28-bit ints, so
    * base·A + B < 2^59 — no 64-bit overflow in either engine. */
  lazy val permConstants: Seq[(Long, Long)] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def bits28(s: String): Long = {
      val h = md.digest(s.getBytes("UTF-8"))
      ((h(0) & 0xffL) << 20) | ((h(1) & 0xffL) << 12) |
        ((h(2) & 0xffL) << 4) | ((h(3) & 0xffL) >> 4)
    }
    (0 until NumHashes).map(i => (bits28(s"a:$i") | 1L, bits28(s"b:$i")))
  }

  /** 60-bit integer view of a shingle: first 15 md5 hex digits.
    * Spark `conv(…,16,10)` ≡ DuckDB `('0x'||…)::BIGINT`. */
  def shingleBase(s: Column): Column =
    pmod(conv(substring(md5(s), 1, 15), 16, 10).cast("long"), lit(HashPrime))

  /** k MinHashes from a pre-materialized shingle-base array via
    * k universal-hash mixes (aᵢ·h + bᵢ mod p) — ONE md5 per shingle,
    * 12× fewer digest/string allocations than hashing (i, shingle)
    * pairs, same LSH guarantees (Broder '97 with a universal family).
    * `bases` MUST be a real column: each mix term embeds the argument
    * tree, so an inlined md5-transform would be recomputed k times. */
  def minhashFromBases(bases: Column, k: Int = NumHashes): Column =
    array(permConstants.take(k).map { case (a, b) =>
      array_min(transform(bases, h => pmod(h * a + b, lit(HashPrime))))
    }: _*)

  /** Convenience single-expression form (tests / ad-hoc use). */
  def minhashSignature(sh: Column, k: Int = NumHashes): Column =
    minhashFromBases(transform(sh, shingleBase _), k)

  /** Band hashes: md5 of the comma-joined r minhashes of each band. */
  def bandHashes(sig: Column, bands: Int = Bands, r: Int = RowsPerBand): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => md5(concat_ws(",", transform(slice(sig, b * lit(r) + 1, lit(r)),
        v => v.cast("string")))))

  /** doc_id + distinct shingle set, docs with ≥1 shingle only.
    * Repartitioned by doc_id first: the fixture is one small parquet
    * file → one input split, which would serialize the md5-heavy
    * signature computation onto a single core (at real scale the scan
    * arrives pre-split). The partition count is pinned explicitly — AQE
    * would otherwise coalesce the few-MB shuffle back to one partition
    * and serialize the compute again. */
  def docShingles(documents: DataFrame): DataFrame =
    documents
      .repartition(documents.sparkSession.sparkContext.defaultParallelism, col("doc_id"))
      // tokens materialize as a column BEFORE the shingle transform: a
      // lambda body captures its argument expression tree, so inlining
      // tokens() here would re-run split+filter once per shingle (2×
      // measured cost at sf0.1)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), shingles(col("toks")).as("sh"))
      .filter(size(col("sh")) > 0)

  /** Exact Jaccard between two distinct-element arrays, rounded.
    * |A∪B| is computed arithmetically (|A|+|B|−|A∩B|) — same integer
    * as materializing the union array, half the array work. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    Portable.round4(inter.cast("double") / (size(a) + size(b) - inter))
  }

  /** x5: MinHash/LSH near-duplicate pairs: candidates share ≥1 LSH
    * band, verified at Jaccard ≥ [[JaccardThreshold]]. Returns
    * distinct (doc_a, doc_b, jaccard) with doc_a < doc_b.
    *
    * The banded-signature frame is persisted before the self-join —
    * otherwise Spark computes the k·|shingles| md5s once per join
    * side (measured 28s → ~8s at sf0.1). Shingle sets ride through
    * the one band shuffle so the verify step needs no second join;
    * at extreme scale (sets too wide for the shuffle) the standard
    * alternative is candidates-only + re-join sets by doc_id. */
  def minhashNearDupPairs(documents: DataFrame,
                          threshold: Double = JaccardThreshold,
                          maxBucket: Int = MaxBucket): DataFrame =
    minhashNearDupPairsFrom(docShingles(documents), threshold, maxBucket)

  /** [[minhashNearDupPairs]] over a pre-materialized shingle frame. */
  def minhashNearDupPairsFrom(sh: DataFrame,
                              threshold: Double = JaccardThreshold,
                              maxBucket: Int = MaxBucket): DataFrame = {
    val banded = Caching.temp(sh
      .select(col("doc_id"), col("sh"), transform(col("sh"), shingleBase _).as("hb"))
      .select(col("doc_id"), col("sh"),
        posexplode(bandHashes(minhashFromBases(col("hb")))).as(Seq("band_idx", "band_hash"))))
    // degenerate-bucket guard: a band hash shared by m docs yields
    // m²/2 candidate pairs — at corpus scale a boilerplate bucket goes
    // quadratic. Buckets over `maxBucket` are dropped outright (their
    // members are boilerplate, not near-dups). Pass Int.MaxValue for
    // exact (uncapped) LSH.
    val bands =
      if (maxBucket == Int.MaxValue) banded
      else banded.withColumn("bucket_n",
          count(lit(1)).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("band_idx"), col("band_hash"))))
        .filter(col("bucket_n") <= maxBucket).drop("bucket_n")
    bands.alias("l").join(bands.alias("r"),
        col("l.band_idx") === col("r.band_idx") &&
        col("l.band_hash") === col("r.band_hash") &&
        col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"),
        jaccard(col("l.sh"), col("r.sh")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .distinct()
  }

  /** x205: CROSS-SPLIT near-dup CONFIRMATION — the batch verifier
    * behind the x199 streaming suspect log: every (arriving,
    * historical) pair sharing an LSH band (same split convention —
    * arriving = doc_id % 3 == 0) is exact-Jaccard-verified at the x5
    * threshold. x199 flags suspects in-stream with band evidence
    * only; this is the periodic batch pass that turns the suspect
    * queue into confirmed (doc_new, doc_hist, jaccard) dedup actions.
    *
    * Scale: identical blocking economics to x5 (the MaxBucket cap
    * applies — this IS pair mining, unlike x199's linear membership
    * probe; oversize boilerplate buckets drop as there), except the
    * join is arriving×historical instead of the full self-join, so
    * candidate volume is bounded by the slice product per bucket. */
  def ingestConfirmFrom(sh: DataFrame,
                        threshold: Double = JaccardThreshold,
                        maxBucket: Int = MaxBucket): DataFrame = {
    val banded = Caching.temp(sh
      .select(col("doc_id"), col("sh"), transform(col("sh"), shingleBase _).as("hb"))
      .select(col("doc_id"), col("sh"),
        posexplode(bandHashes(minhashFromBases(col("hb")))).as(Seq("band_idx", "band_hash"))))
    // the cap counts the WHOLE bucket (both splits), mirroring x5 —
    // the oracle's bands CTE is shared verbatim
    val bands = banded.withColumn("bucket_n",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("band_idx"), col("band_hash"))))
      .filter(col("bucket_n") <= maxBucket).drop("bucket_n")
    bands.alias("l").join(bands.alias("r"),
        col("l.band_idx") === col("r.band_idx") &&
        col("l.band_hash") === col("r.band_hash") &&
        col("l.doc_id") % 3 === 0 && col("r.doc_id") % 3 =!= 0)
      .select(col("l.doc_id").as("doc_new"), col("r.doc_id").as("doc_hist"),
        jaccard(col("l.sh"), col("r.sh")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .distinct()
  }

  /** x128: MinHash ESTIMATOR CALIBRATION — for every LSH candidate
    * pair (same banding as x5, but NOT threshold-filtered: calibration
    * needs the misses too), the number of agreeing signature
    * components next to the TRUE Jaccard, aggregated per agreement
    * count: pair volume, the estimator's value m/k, the mean true
    * Jaccard, and the mean absolute error. This is the measurement
    * that justifies (or indicts) the k=[[NumHashes]]/b=[[Bands]]
    * parameter choice — E[m/k] = J (Broder '97), and the per-bucket
    * MAE shows how wide the k=12 estimator really is.
    *
    * Scale: unlike x5 (shingle sets ride the band shuffle), this is
    * the CANDIDATES-ONLY form x5's scaladoc names as the extreme-scale
    * alternative: the band join carries doc_ids alone, and sets +
    * signatures are re-joined by doc_id afterwards — the band shuffle
    * stays narrow no matter how wide the documents are, at the cost
    * of two extra hash joins against the signature frame. Mean/MAE
    * are integral-grid sums (1e-4), aggregation-order-independent. */
  def minhashCalibration(documents: DataFrame): DataFrame =
    minhashCalibrationFrom(docShingles(documents))

  /** [[minhashCalibration]] over a pre-materialized shingle frame. */
  def minhashCalibrationFrom(sh: DataFrame,
                             maxBucket: Int = MaxBucket): DataFrame = {
    val sig = Caching.temp(sh
      .select(col("doc_id"), col("sh"), transform(col("sh"), shingleBase _).as("hb"))
      .select(col("doc_id"), col("sh"), minhashFromBases(col("hb")).as("sig")))
    val banded = sig.select(col("doc_id"),
      posexplode(bandHashes(col("sig"))).as(Seq("band_idx", "band_hash")))
    val bands = banded.withColumn("bucket_n",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("band_idx"), col("band_hash"))))
      .filter(col("bucket_n") <= maxBucket).drop("bucket_n")
    val cand = bands.alias("l").join(bands.alias("r"),
        col("l.band_idx") === col("r.band_idx") &&
        col("l.band_hash") === col("r.band_hash") &&
        col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()
    val a = sig.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"),
      col("sig").as("sig_a"))
    val b = sig.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"),
      col("sig").as("sig_b"))
    val matches = size(filter(zip_with(col("sig_a"), col("sig_b"),
      (x, y) => when(x === y, 1).otherwise(0)), v => v === 1))
    cand.join(a, Seq("doc_a")).join(b, Seq("doc_b"))
      .select(matches.cast("long").as("n_match"),
        floor(jaccard(col("sh_a"), col("sh_b")) * 10000 + 0.5)
          .cast("long").as("j4"))
      .withColumn("e4",
        floor(col("n_match") * 10000.0 / NumHashes + 0.5).cast("long"))
      .groupBy(col("n_match"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("j4")).as("sum_j4"),
        sum(abs(col("e4") - col("j4"))).as("sum_err"))
      .select(col("n_match"),
        Portable.round4(col("n_match") / lit(NumHashes.toDouble))
          .as("est_jaccard"),
        col("n_pairs"),
        Portable.round4(col("sum_j4").cast("double") / col("n_pairs") / 10000.0)
          .as("mean_jaccard"),
        Portable.round4(col("sum_err").cast("double") / col("n_pairs") / 10000.0)
          .as("mae"))
  }

  /** x136: cross-source CONTAMINATION MATRIX — for every source pair,
    * how many distinct k-token SPAN fingerprints (the x90 window
    * unit) they share: the dataset-governance question behind x37's
    * benchmark check, asked of the corpus against ITSELF. Span-level
    * rather than whole-doc fingerprints deliberately — re-crawls and
    * mirrors rarely share byte-identical documents (different
    * boilerplate, different truncation) but share their passages, and
    * a pair sharing most of its spans is one distribution that
    * mixture weights are silently double-counting.
    *
    * Scale: the window explode is x90's linear scan; (source, fp)
    * pairs dedup in one hash aggregate; the fp self-join fans out at
    * most |sources| rows per span — bounded by the source DOMAIN,
    * not the corpus — and the output is ≤ |sources|² rows. The same
    * shape as the LSH band join, with the domain bound in place of
    * the bucket cap. */
  def sourceOverlap(documents: DataFrame, k: Int = SpanTokens): DataFrame =
    sourceOverlapFrom(spanWindows(documents, k), documents)

  /** [[sourceOverlap]] over a pre-built (and ideally memo-shared with
    * x90/x100) [[spanWindows]] frame: the window explode was the
    * query's only corpus-sized scan, so sharing it leaves one doc_id-
    * keyed source attach + the domain-bounded fp self-join. */
  def sourceOverlapFrom(spans: DataFrame, documents: DataFrame): DataFrame = {
    val fps = spans
      .join(documents.select(col("doc_id"), col("source")), Seq("doc_id"))
      .select(col("source"), col("fp"))
      .distinct()
    fps.alias("a").join(fps.alias("b"),
        col("a.fp") === col("b.fp") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
  }

  // ---- SimHash -----------------------------------------------------

  /** Per-token 16-bit hash: first 4 hex nibbles of md5 as an integer.
    * Spark `conv(hex,16,10)` ≡ DuckDB `('0x'||hex)::BIGINT`. */
  def tokenHash16(tok: Column): Column =
    conv(substring(md5(tok), 1, 4), 16, 10).cast("long")

  /** [[SimHashBits]]-bit SimHash over pre-hashed token values: bit j is
    * set when strictly more than half the tokens have bit j set. */
  def simhashFromVals(vals: Column, bits: Int = SimHashBits): Column =
    (0 until bits).map { j =>
      when(size(filter(vals, v => shiftrightunsigned(v, j) % 2 === 1)) * 2 > size(vals),
        lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** x6: doc_id → simhash value (+ token count for context). The
    * token-hash array is materialized in its own projection so the md5
    * per token is computed once, not once per bit. */
  def simhashSignatures(documents: DataFrame): DataFrame =
    documents
      .repartition(documents.sparkSession.sparkContext.defaultParallelism, col("doc_id")) // single-file fixture → spread the hash work
      .select(col("doc_id"),
        transform(tokens(col("text")), tokenHash16 _).as("tok_vals"))
      .filter(size(col("tok_vals")) > 0)
      .select(col("doc_id"),
        simhashFromVals(col("tok_vals")).as("simhash"),
        size(col("tok_vals")).cast("long").as("n_tokens"))

  /** x7: near-dup pairs at Hamming ≤ [[HammingMax]] via the pigeonhole
    * block join: each doc emits one row per bit-block; pairs agreeing
    * on any block meet in the shuffle, the exact popcount check
    * filters. Never O(n²). */
  def simhashNearDupPairs(documents: DataFrame): DataFrame = {
    val blockBits = SimHashBits / SimHashBlocks // 5,5,6 for 16/3
    val sigs = simhashSignatures(documents).select(col("doc_id"), col("simhash"))
    val blockVals = (0 until SimHashBlocks).map { b =>
      val lo = b * blockBits
      val width = if (b == SimHashBlocks - 1) SimHashBits - lo else blockBits
      (shiftrightunsigned(col("simhash"), lo) % (1L << width)).as(s"blk$b")
    }
    val blocks = Caching.temp(sigs
      .select(col("doc_id") +: col("simhash") +: blockVals: _*)
      .select(col("doc_id"), col("simhash"),
        posexplode(array((0 until SimHashBlocks).map(b => col(s"blk$b")): _*))
          .as(Seq("block_idx", "block_val"))))
    blocks.alias("l").join(blocks.alias("r"),
        col("l.block_idx") === col("r.block_idx") &&
        col("l.block_val") === col("r.block_val") &&
        col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"),
        bit_count(col("l.simhash").bitwiseXOR(col("r.simhash"))).cast("long").as("hamming"))
      .filter(col("hamming") <= HammingMax)
      .distinct()
  }

  /** Candidates-only LSH variant of [[minhashNearDupPairs]] for extreme
    * scale: the band shuffle carries (band_idx, band_hash, doc_id) ONLY
    * — fixed ~40 B/row instead of the full shingle set — and the
    * verify step re-joins shingle sets by doc_id. Identical output
    * (DedupSpec pins it); one extra shuffle (the doc_id join) buys an
    * O(docs·bands)·constant-width candidate shuffle, the right trade
    * once average shingle sets outweigh two hash joins. */
  def minhashNearDupPairsSlim(documents: DataFrame,
                              threshold: Double = JaccardThreshold,
                              maxBucket: Int = MaxBucket): DataFrame = {
    val sh = Caching.temp(docShingles(documents))
    val banded = sh
      .select(col("doc_id"),
        transform(col("sh"), shingleBase _).as("hb"))
      .select(col("doc_id"),
        posexplode(bandHashes(minhashFromBases(col("hb")))).as(Seq("band_idx", "band_hash")))
    val bands =
      Caching.temp(if (maxBucket == Int.MaxValue) banded
       else banded.withColumn("bucket_n",
          count(lit(1)).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("band_idx"), col("band_hash"))))
        .filter(col("bucket_n") <= maxBucket).drop("bucket_n")) // both self-join sides — same trap the sibling documents
    val cands = bands.alias("l").join(bands.alias("r"),
        col("l.band_idx") === col("r.band_idx") &&
        col("l.band_hash") === col("r.band_hash") &&
        col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()
    cands
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Max document frequency for a shingle to participate in the exact
    * similarity join's inverted index — boilerplate pruning, same role
    * as [[MaxBucket]] for LSH (a shingle shared by the whole corpus
    * carries no near-dup signal and would go quadratic). */
  val MaxShingleDf = 128

  /** x25: all-pairs shingle Jaccard ≥ τ via a PREFIX-FILTERED
    * inverted-index self-join (PPJoin-lite, Chaudhuri '06 / Xiao '08;
    * the exact-verify counterpart to the approximate x5 LSH path,
    * never a cross join).
    *
    * EXACTNESS CONTRACT: the prefix filter itself is lossless (step 3
    * below), but the df cap in step 2 is NOT — it is the same
    * deliberate boilerplate-drop as [[MaxBucket]]: a pair whose entire
    * overlap lives in shingles with df > [[MaxShingleDf]] loses its
    * postings and is never emitted (DedupSpec pins this drop on a
    * corpus where the cap fires; it never fires on the fixtures, where
    * max df is 25). Pass `maxDf = Int.MaxValue` for truly exact
    * all-pairs. Reported Jaccard values are always exact — the verify
    * step uses full uncapped shingle sets.
    *
    *  1. explode shingles to postings, global df per shingle;
    *  2. drop shingles with df > [[MaxShingleDf]] (boilerplate guard,
    *     lossy BY DESIGN for boilerplate-only overlap — see above);
    *  3. PREFIX FILTER: order each doc's shingles by global rarity
    *     (df asc, shingle asc) and index only the first
    *     n − ⌈τ·n⌉ + 1. Jaccard ≥ τ implies |A∩B| ≥ τ·max(|A|,|B|),
    *     so two qualifying sets MUST share a prefix shingle under any
    *     global order — no true pair is lost, while candidates shrink
    *     to pairs sharing a RARE shingle;
    *  4. candidates = prefix-postings self-join on the shingle;
    *  5. verify with the TRUE full shingle sets re-joined by doc_id —
    *     reported Jaccard is exact, never prefix- or df-capped.
    *
    * Scale: pair volume drops from O(Σ_s df(s)²) to the same sum over
    * prefix postings only (rarity-first ordering concentrates the
    * prefix on low-df shingles; 8.9 s → ~2 s at sf0.1). One shuffle
    * keyed on the shingle for df + self-join, one on doc_id for the
    * per-doc rank. */
  def jaccardPairsExact(documents: DataFrame,
                        threshold: Double = JaccardThreshold,
                        maxDf: Int = MaxShingleDf): DataFrame =
    jaccardPairsExactFrom(Caching.temp(docShingles(documents)), threshold, maxDf)

  /** [[jaccardPairsExact]] over a PRE-MATERIALIZED (persisted)
    * [[docShingles]] frame — the tokenize+shingle+md5 scan-side pass
    * is shared across every shingle consumer by the caller. */
  def jaccardPairsExactFrom(sh: DataFrame,
                            threshold: Double = JaccardThreshold,
                            maxDf: Int = MaxShingleDf): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDoc = Window.partitionBy(col("doc_id"))
    // df via count().over(partition by s): ONE shuffle+sort of the
    // postings. (Measured alternative — groupBy(s).count + equi-join —
    // is strictly worse unless the df table broadcasts: same postings
    // shuffle plus a second sort and a second explode pass; and a
    // broadcast hint on a vocabulary-scaling table is the r1
    // scale-killer pattern.)
    // postings carry a 60-bit md5 hash of the shingle, NOT the ~40-char
    // string: the candidate self-join below is the query's dominant
    // shuffle (116M rows at sf1) and 8-byte long keys cut its bytes
    // ~4x and its sort-merge comparisons to integer compares (sf1:
    // 225 s + 94.6 GB spill -> in-band, spill 0). Collisions (2^-60)
    // only ADD candidates, which the exact verify removes; both
    // engines hash identically (md5-prefix conv, the x5 convention),
    // so df counts and prefixes stay bit-identical cross-engine.
    val prefix = Caching.temp(sh
      .select(col("doc_id"), size(col("sh")).as("n"), explode(col("sh")).as("s"))
      .select(col("doc_id"), col("n"),
        conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("h"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("h"))))
      .filter(col("df") <= maxDf)
      .withColumn("rk", row_number().over(byDoc.orderBy(col("df").asc, col("h").asc)))
      .withColumn("n_idx", count(lit(1)).over(byDoc))
      .filter(col("rk") <= col("n_idx") - ceil(lit(threshold) * col("n_idx")) + 1)
      .select(col("doc_id"), col("n"), col("h")))
    // length filter (PPJoin): J ≥ τ forces τ·|A| ≤ |B| and τ·|B| ≤ |A|.
    // shuffle_hash, not sort-merge: the join INPUT is small (capped
    // postings) but its OUTPUT is the Σdf² candidate stream — SMJ
    // buffers same-key row groups while streaming that output and the
    // sort machinery spills under the saturated-corpus worst case;
    // a per-partition hash map over the postings never sorts.
    val cands = prefix.alias("l").hint("shuffle_hash")
      .join(prefix.alias("r"),
        col("l.h") === col("r.h") && col("l.doc_id") < col("r.doc_id") &&
        lit(threshold) * col("l.n") <= col("r.n") &&
        lit(threshold) * col("r.n") <= col("l.n"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()
    cands
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** x111 containment cut-off. */
  val ContainmentThreshold = 0.8

  /** x111: asymmetric shingle CONTAINMENT pairs — Broder '97's second
    * resemblance measure, C(A→B) = |S(A)∩S(B)| / |S(A)|. Symmetric
    * Jaccard (x25) misses subsumption: a short doc quoted whole inside
    * a much longer one has J ≈ |A|/|B| ≈ 0 but C(A→B) ≈ 1 — exactly
    * the quote/excerpt/expanded-revision duplicates a training-corpus
    * pipeline wants flagged (the "containment" case Broder built
    * fingerprinting for in the first place).
    *
    * Emits one row PER DIRECTION (doc_src, doc_dst, containment ≥ τ,
    * src ≠ dst): exact duplicates yield both directions, a strict
    * subset yields only src → superset.
    *
    * Candidate generation is the x25 machinery reshaped for asymmetry:
    * the PREFIX FILTER applies to the SOURCE side only (C(A→B) ≥ τ
    * forces |A∩B| ≥ ⌈τ·n_A⌉, so A must share one of its first
    * n_A − ⌈τ·n_A⌉ + 1 rarity-ordered shingles with B's FULL capped
    * posting set — B's prefix proves nothing about containment OF A),
    * and the PPJoin length filter keeps only its one-sided form
    * τ·n_src ≤ n_dst (|A∩B| ≤ min(n_A,n_B); no upper bound on the
    * dest — that asymmetry is the point). Same [[MaxShingleDf]] df cap
    * with the same lossy-boilerplate caveat as x25; verification
    * re-joins the TRUE full shingle sets, so reported containment is
    * exact and the cap/prefix only ever drop candidates, never distort
    * values.
    *
    * Scale: candidate volume is Σ_s df_prefix(s)·df(s) with df capped
    * — the one-sided join is postings-bounded like x25, never
    * all-pairs; shuffles are the same two (shingle-keyed df + join,
    * doc-keyed rank). */
  def containmentPairs(documents: DataFrame,
                       threshold: Double = ContainmentThreshold,
                       maxDf: Int = MaxShingleDf): DataFrame =
    containmentPairsFrom(Caching.temp(docShingles(documents)), threshold, maxDf)

  /** [[containmentPairs]] over a pre-materialized [[docShingles]]. */
  def containmentPairsFrom(sh: DataFrame,
                           threshold: Double = ContainmentThreshold,
                           maxDf: Int = MaxShingleDf): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDoc = Window.partitionBy(col("doc_id"))
    // capped postings (df via the same single postings window as x25,
    // on the same 60-bit shingle hash — see jaccardPairsExactFrom on
    // why the join key is a long, not the shingle string)
    val capped = Caching.temp(sh
      .select(col("doc_id"), size(col("sh")).as("n"), explode(col("sh")).as("s"))
      .select(col("doc_id"), col("n"),
        conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("h"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("h"))))
      .filter(col("df") <= maxDf))
    // source-side prefix over the doc's CAPPED postings, rarity-first
    val prefix = capped
      .withColumn("rk", row_number().over(byDoc.orderBy(col("df").asc, col("h").asc)))
      .withColumn("n_idx", count(lit(1)).over(byDoc))
      .filter(col("rk") <= col("n_idx") - ceil(lit(threshold) * col("n_idx")) + 1)
      .select(col("doc_id"), col("n"), col("h"))
    val cands = prefix.alias("l").hint("shuffle_hash")
      .join(capped.alias("r"),
        col("l.h") === col("r.h") && col("l.doc_id") =!= col("r.doc_id") &&
        lit(threshold) * col("l.n") <= col("r.n"))
      .select(col("l.doc_id").as("doc_src"), col("r.doc_id").as("doc_dst"))
      .distinct()
    cands
      .join(sh.select(col("doc_id").as("doc_src"), col("sh").as("sh_src")), Seq("doc_src"))
      .join(sh.select(col("doc_id").as("doc_dst"), col("sh").as("sh_dst")), Seq("doc_dst"))
      .select(col("doc_src"), col("doc_dst"),
        Portable.round4(size(array_intersect(col("sh_src"), col("sh_dst")))
          .cast("double") / size(col("sh_src"))).as("containment"))
      .filter(col("containment") >= threshold)
  }

  /** Brute-force containment baseline (tests/RandomizedEquivalence
    * only — the labeled all-pairs cross join, never a query path). */
  def containmentPairsBrute(documents: DataFrame,
                            threshold: Double = ContainmentThreshold): DataFrame = {
    val d = docShingles(documents)
    val l = d.select(col("doc_id").as("doc_src"), col("sh").as("sh_src"))
    val r = d.select(col("doc_id").as("doc_dst"), col("sh").as("sh_dst"))
    l.crossJoin(r)
      .filter(col("doc_src") =!= col("doc_dst"))
      .select(col("doc_src"), col("doc_dst"),
        Portable.round4(size(array_intersect(col("sh_src"), col("sh_dst")))
          .cast("double") / size(col("sh_src"))).as("containment"))
      .filter(col("containment") >= threshold)
  }

  /** Fixed-point scale for x76's integer tf-idf weights. */
  val IdfScale = 10000L

  /** x76 cosine cut-off. */
  val CosineThreshold = 0.5

  /** x76: sparse TF-IDF COSINE similarity pairs via an inverted-index
    * join — the classic embedding-free document-similarity scale path
    * (pair the docs through shared dimensions, never all-pairs).
    *
    * The sparse dimensions are the word n-SHINGLES (binary tf — the
    * same [[docShingles]] sets x5/x25 mine), NOT raw tokens: the
    * fixture corpus draws from a ~31-word pool, so every token's df
    * scales with N and token-level idf is degenerate; shingles stay
    * discriminative at every SF (and in any real corpus n-gram
    * dimensions are what sparse similarity joins use — SpotSigs et
    * al.). Weights are INTEGER fixed-point: w = round(idf·[[IdfScale]])
    * with idf = ln((N+1)/(df+1)) exactly as x26 computes it — so the
    * partial-product sums (dot, ‖·‖²) are exact BIGINTs that commute
    * across partitions; floats enter only in the final one-shot
    * cosine, rounded 4dp. Shingles with df > maxDf are dropped BEFORE
    * the join (same cap and caveat as [[jaccardPairsExact]]: lossy for
    * pairs whose entire overlap is boilerplate — which idf weighs to
    * ~0 anyway; the cap is what bounds the Σdf² join volume at corpus
    * scale).
    *
    * Scale: df via one postings window (see [[jaccardPairsExact]] on
    * why not groupBy+join), shingle-keyed shuffle join for partial
    * products, hash-agg to pair dots, two bounded-key joins to attach
    * norms. No cartesian, no driver-side state. */
  def tfidfCosinePairs(documents: DataFrame,
                       threshold: Double = CosineThreshold,
                       maxDf: Int = MaxShingleDf): DataFrame =
    tfidfCosinePairsFrom(Caching.temp(docShingles(documents)),
      documents.select(count(lit(1)).as("n_docs")), threshold, maxDf)

  /** [[tfidfCosinePairs]] over a pre-materialized shingle frame.
    * `nDocs` stays the FULL document count (sh drops shingle-less
    * docs) so the idf matches the oracle. */
  def tfidfCosinePairsFrom(sh: DataFrame, nDocs: DataFrame,
                           threshold: Double = CosineThreshold,
                           maxDf: Int = MaxShingleDf): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = nDocs
    val posts = Caching.temp(sh
      .select(col("doc_id"), explode(col("sh")).as("s"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("s"))))
      .filter(col("df") <= maxDf)
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("s"),
        floor(log((col("n_docs") + 1).cast("double") / (col("df") + 1))
          * IdfScale + 0.5).cast("long").as("w")))
    val norms = posts.groupBy(col("doc_id")).agg(sum(col("w") * col("w")).as("nrm2"))
    posts.alias("a").join(posts.alias("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(sum(col("a.w") * col("b.w")).as("dot"))
      .join(norms.select(col("doc_id").as("doc_a"), col("nrm2").as("na")), Seq("doc_a"))
      .join(norms.select(col("doc_id").as("doc_b"), col("nrm2").as("nb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        Portable.round4(col("dot").cast("double") /
          (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double")))).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** x30: near-duplicate CLUSTERS — connected components over the x5
    * pair graph via iterative min-label propagation: every doc in a
    * pair starts as its own label; each round takes the min of its own
    * and its neighbors' labels; at fixpoint every component carries its
    * min doc_id as cluster_id. The driver loop with an aggregate
    * convergence probe is the canonical distributed iterative pattern
    * (GraphX/MLlib do the same); rounds ≤ graph diameter, and near-dup
    * components are shallow by construction. At extreme scale the
    * shuffle-optimal variant is alternating large-star/small-star
    * (Kiveris et al. '14) — implemented as [[dupClustersStarFrom]]
    * (x97), which converges in O(log²) rounds independent of
    * diameter. */
  def dupClusters(documents: DataFrame, maxIters: Int = 20): DataFrame =
    dupClustersFrom(minhashNearDupPairs(documents), maxIters)

  /** [[dupClusters]] over a PRE-MINED pair frame — callers that run
    * several graph consumers (x30/x59/x94) mine the LSH pairs once
    * and fan out (same cache discipline as SlValidation's enrichment
    * chain). */
  def dupClustersFrom(minedPairs: DataFrame, maxIters: Int = 20): DataFrame = {
    val pairs = Caching.temp(minedPairs.select(col("doc_a"), col("doc_b")))
    val edges = Caching.temp(pairs.union(pairs.select(col("doc_b"), col("doc_a")))
      .toDF("u", "v"))
    // localCheckpoint, not persist, for the per-round generations:
    // an eager local checkpoint materializes the frame AND TRUNCATES
    // ITS LINEAGE, so round N's plan is one join over a leaf — with
    // plain persist the logical plan grows by one join per round and
    // re-analysis cost (eventually the analyzer stack itself) blows up
    // past ~40 rounds. Same discipline as GraphX's periodic
    // checkpointer; superseded generations are freed by the context
    // cleaner once unreferenced. (Executor loss invalidates a LOCAL
    // checkpoint — a driver-side convergence loop restarts anyway.)
    var labels = edges.select(col("u").as("doc_id")).distinct()
      .withColumn("lbl", col("doc_id")).localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val nbrMin = edges.join(labels, edges("v") === labels("doc_id"))
        .groupBy(col("u")).agg(min(col("lbl")).as("nbr_lbl"))
      // carry the previous label through the propagation step so the
      // convergence probe is a filter on the materialized frame, not a
      // second join back to the old generation (one job per round, not
      // two — the probe dominated the loop at fixture scale)
      val next = labels.join(nbrMin, labels("doc_id") === nbrMin("u"), "left")
        .select(col("doc_id"), col("lbl").as("old_lbl"),
          least(col("lbl"), coalesce(col("nbr_lbl"), col("lbl"))).as("lbl"))
        .localCheckpoint() // eager: materializes every partition
      converged = next.filter(col("lbl") =!= col("old_lbl")).count() == 0L
      // the checkpointed frame is the next generation (the stray
      // old_lbl column is projected away by every consumer)
      labels = next
      i += 1
    }
    // wrong-but-plausible labels are worse than failing loud: a
    // component with diameter > maxIters would report split clusters
    // (and diverge from the oracle's true transitive closure)
    if (!converged)
      throw new IllegalStateException(
        s"dupClusters did not converge after $maxIters rounds — raise maxIters")
    val sizes = labels.groupBy(col("lbl")).agg(count(lit(1)).as("n_members"))
    labels.join(sizes, Seq("lbl"))
      .select(col("doc_id"), col("lbl").as("cluster_id"), col("n_members"))
  }

  /** x97: [[dupClustersFrom]] via ALTERNATING LARGE-STAR / SMALL-STAR
    * edge contraction (Kiveris et al. '14, "Connected Components in
    * MapReduce and Beyond") — the extreme-scale variant the
    * propagation loop's docstring promises: label propagation walks
    * one hop per round (rounds ≈ component diameter), while each star
    * round REWIRES the edge set itself — large-star hangs every
    * node's larger neighbors onto its neighborhood minimum,
    * small-star re-hangs the smaller neighbors — so components
    * contract to stars around their minimum node in O(log²) rounds
    * regardless of diameter (a 1M-hop chain converges in ~20 rounds,
    * not 1M). Output contract identical to [[dupClustersFrom]]
    * (pinned by a randomized-equivalence spec and the shared x30
    * oracle).
    *
    * Scale: every step is a join/aggregate on node keys — no windows,
    * no cartesians; each edge generation is an eager localCheckpoint
    * (lineage truncation — see dupClustersFrom). The convergence
    * probe compares successive canonical edge sets (both distinct:
    * equal counts + empty except ⇒ equal). */
  def dupClustersStarFrom(minedPairs: DataFrame, maxIters: Int = 20): DataFrame = {
    val nodes = Caching.temp(minedPairs.select(col("doc_a").as("doc_id"))
      .union(minedPairs.select(col("doc_b"))).distinct())
    // eager localCheckpoint per generation — see dupClustersFrom: the
    // edge set is rewritten every round, and lineage must not grow
    var edges = minedPairs
      .select(greatest(col("doc_a"), col("doc_b")).as("hi"),
        least(col("doc_a"), col("doc_b")).as("lo"))
      .filter(col("hi") =!= col("lo")).distinct().localCheckpoint()
    var prevN = edges.count()
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      // large-star: for each node u (symmetric neighbor view), hang
      // every LARGER neighbor on m = min(N(u) ∪ {u})
      val sym = edges.select(col("hi").as("u"), col("lo").as("v"))
        .union(edges.select(col("lo").as("u"), col("hi").as("v")))
      val mins = sym.groupBy(col("u")).agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val ls = sym.join(mins, Seq("u"))
        .filter(col("v") > col("u"))
        .select(col("v").as("hi"), col("m").as("lo"))
        .filter(col("hi") =!= col("lo"))
        .distinct()
      // small-star: per node (canonical hi side), re-hang its smaller
      // neighbors AND itself on their minimum
      val sMins = ls.groupBy(col("hi")).agg(min(col("lo")).as("m"))
      val next = ls.join(sMins, Seq("hi"))
        .filter(col("lo") =!= col("m"))
        .select(col("lo").as("hi"), col("m").as("lo"))
        .union(sMins.select(col("hi"), col("m").as("lo")))
        .distinct().localCheckpoint()
      val n = next.count()
      converged = n == prevN && next.except(edges).count() == 0L
      edges = next
      prevN = n
      i += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"dupClustersStar did not converge after $maxIters rounds — raise maxIters")
    // at the star fixpoint every non-root points straight at its
    // component minimum; roots have no outgoing (hi-side) edge
    val roots = edges.groupBy(col("hi")).agg(min(col("lo")).as("cluster_id"))
      .withColumnRenamed("hi", "doc_id")
    val labels = nodes.join(roots, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
    val sizes = labels.groupBy(col("cluster_id")).agg(count(lit(1)).as("n_members"))
    labels.join(sizes, Seq("cluster_id"))
      .select(col("doc_id"), col("cluster_id"), col("n_members"))
  }

  /** x86: near-dup cluster representative selection — the terminal
    * step of every dedup pipeline: per connected component keep ONE
    * document (longest `n_chars`, doc_id tie-break) and drop the
    * rest. Composes [[dupClusters]] with a per-cluster window rank;
    * clusters are near-dup components (shallow, small), so the rank's
    * per-key input is bounded and WindowGroupLimit caps it at 1 row
    * per partition stream. */
  def clusterReps(documents: DataFrame): DataFrame =
    clusterRepsFrom(dupClusters(documents), documents)

  /** [[clusterReps]] over a PRE-COMPUTED cluster frame — lets callers
    * that also expose the clusters themselves (x30) share one run of
    * the propagation loop instead of re-iterating it per query. */
  def clusterRepsFrom(clusters: DataFrame, documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    clusters
      .join(documents.select(col("doc_id"), col("n_chars")), Seq("doc_id"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("cluster_id"), col("doc_id").as("rep_doc"),
        col("n_chars").as("rep_chars"), col("n_members"))
  }

  /** Repeated-span window width (tokens) for [[spanDedup]] —
    * fixture-scaled to 8; production pipelines use ~50 (Lee et al.
    * '22). One constant, both engines. */
  val SpanTokens = 8

  /** x90: EXACT-SUBSTRING duplication detection — the "find repeated
    * 50-token spans across the corpus" step of training-data dedup
    * (Lee et al. '22, "Deduplicating Training Data Makes Language
    * Models Better", arXiv:2107.06499), the span-granular complement
    * of whole-document exact dedup (x4): boilerplate headers, license
    * blocks and templated passages repeat across otherwise-distinct
    * documents. Every [[SpanTokens]]-token window of every document is
    * md5-fingerprinted; spans whose text occurs more than once come
    * back as one row per fingerprint with occurrence/document counts
    * and the canonical keeper (lexicographic min (doc_id, pos)).
    *
    * Scale: |tokens| window rows per document (a linear explode — the
    * window fingerprints shuffle as fixed-width md5 keys, never text),
    * then two stacked hash aggregates — (fp, doc) before fp — so
    * map-side combine applies and there is no count-distinct Expand.
    * A boilerplate span shared by millions of documents is ONE group
    * row: aggregates never go quadratic, so unlike the pair-mining
    * operators this needs no df cap. */
  def spanDedup(documents: DataFrame, k: Int = SpanTokens): DataFrame =
    spanDedupFrom(spanWindows(documents, k))

  /** (doc_id, pos, fp): every k-token window's md5, pos = 0-based
    * start token. The linear-explode scan shared by x90 and the x100
    * reconstruction. */
  def spanWindows(documents: DataFrame, k: Int = SpanTokens): DataFrame =
    TextAnalysis.withTokens(documents)
      .filter(size(col("toks")) >= k)
      .select(col("doc_id"),
        posexplode(expr(
          s"transform(sequence(1, size(toks)-$k+1), i -> md5(concat_ws(' ', slice(toks, i, $k))))"))
          .as(Seq("pos", "fp")))

  /** [[spanDedup]] over a pre-built [[spanWindows]] frame. */
  def spanDedupFrom(spans: DataFrame): DataFrame = {
    val occ = spans.groupBy(col("fp"), col("doc_id"))
      .agg(count(lit(1)).as("c"), min(col("pos")).as("mp"))
    occ.groupBy(col("fp"))
      .agg(sum(col("c")).as("n_occurrences"), count(lit(1)).as("n_docs"),
        min(struct(col("doc_id"), col("mp"))).as("keep"))
      .filter(col("n_occurrences") > 1)
      .select(col("fp"), col("n_occurrences"), col("n_docs"),
        col("keep.doc_id").as("keep_doc_id"),
        col("keep.mp").cast("long").as("keep_pos"))
  }

  /** x100: the REMOVAL step that completes the Lee et al. '22
    * exact-substring pipeline (arXiv:2107.06499 §4.1 — their tool cuts
    * every duplicated span occurrence except one): x90 reports the
    * repeated spans; this emits the deduplicated corpus text. A token
    * is cut when some repeated-span occurrence covers it, UNLESS that
    * occurrence is the span's canonical keeper (x90's lexicographic
    * min (doc_id, first-pos)) — so exactly one copy of each repeated
    * passage survives, the way [[segmentDedup]] reconstructs for
    * whole segments (x49). Output per doc: token counts, removed
    * count, md5 of the kept tokens in original order.
    *
    * Scale: the windows explode is linear; the dup join is keyed on
    * the 32-char fp (repeated fps only — the filtered x90 output,
    * orders of magnitude smaller than the corpus); coverage explodes
    * ≤ k rows per CUT occurrence, then distinct + one left join both
    * shuffle on (doc_id, pos) — fixed-width keys, never text. The
    * reconstruction is one hash aggregate per doc_id. Nothing is
    * quadratic in documents or occurrences. */
  def spanCleanText(documents: DataFrame, k: Int = SpanTokens): DataFrame =
    spanCleanTextFrom(Caching.temp(spanWindows(documents, k)), documents, k)

  /** [[spanCleanText]] over a pre-built (and ideally memo-shared with
    * x90/x136) [[spanWindows]] frame. */
  def spanCleanTextFrom(spans: DataFrame, documents: DataFrame,
                        k: Int = SpanTokens): DataFrame = {
    val dups = spanDedupFrom(spans)
      .select(col("fp"), col("keep_doc_id"), col("keep_pos"))
    // non-keeper occurrences of repeated spans → covered token ranges
    val covered = spans.join(dups, Seq("fp"))
      .filter(!(col("doc_id") === col("keep_doc_id") && col("pos") === col("keep_pos")))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + k - 1)).as("p"))
      .distinct()
      .withColumn("cut", lit(1L))
    TextAnalysis.withTokens(documents)
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("p", "tok")))
      .join(covered, Seq("doc_id", "p"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_toks"),
        coalesce(sum(col("cut")), lit(0L)).as("n_removed"),
        md5(array_join(
          transform(
            array_sort(collect_list(when(col("cut").isNull,
              struct(col("p"), col("tok"))))),
            s => s.getField("tok")), " ")).as("clean_fp"))
  }

  /** x206: minimum repeat length (tokens) for [[exactSubstrSpans]] —
    * the Lee et al. '22 ExactSubstr threshold (arXiv:2107.06499 §4.1:
    * 50 tokens). The operator's ONLY parameter: unlike x90's fixed
    * k-window report, nothing else tunes what gets found. */
  val ExactSubstrTokens = 50

  /** x206: EXACT SUBSTRING DEDUP REGIONS — the full Lee et al. rule:
    * every MAXIMAL token range in which each position is covered by
    * some duplicated substring of ≥ [[ExactSubstrTokens]] tokens, with
    * its exact extent (one row per (doc, maximal span)). This is the
    * suffix-array result: in a suffix array over the concatenated
    * corpus, a position starts a duplicated ≥L-substring iff its
    * SA-adjacent neighbor shares an LCP ≥ L — and "LCP ≥ L with some
    * other suffix" partitions suffixes into EQUAL-FIRST-L-TOKEN
    * classes. The SA's total order is unnecessary work for that
    * predicate, so this pass replaces the range-partitioned global
    * suffix sort with a hash aggregation on the md5 of each suffix's
    * first L tokens ([[spanWindows]] — linear explode, fixed-width
    * keys): a class with ≥ 2 members is exactly an SA run with
    * internal LCPs ≥ L. Duplicated suffix starts then merge into
    * maximal COVERED ranges: start q joins the running span iff its
    * window [q, q+L−1] overlaps or touches it — i.e. the gap to the
    * previous duplicated start is ≤ L (NOT only gap = 1: two distinct
    * repeated passages can overlap mid-document, and consecutive-only
    * merging would emit overlapping "maximal" rows and double-count
    * coverage). Every L-window inside a repeated M-token passage
    * (M ≥ L) is itself repeated, so maximal repeats surface with
    * their full extent, no window-size parameter to tune; the output
    * spans are DISJOINT per document by construction. The equivalence
    * to a literal suffix-array + LCP reference is pinned by a
    * randomized property ([[graft.RandomizedEquivalenceSpec]]).
    *
    * Scale: one linear window explode (md5 keys, never text), one
    * map-side-combinable fp aggregate, one fp semi-join back, and a
    * per-DOCUMENT islands window (partitions bounded by document
    * length, never corpus-wide) — each stage linear in corpus tokens;
    * a global suffix sort would shuffle the same rows through a range
    * partitioner for strictly more work. */
  def exactSubstrSpans(documents: DataFrame,
                       minTokens: Int = ExactSubstrTokens): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wins = Caching.temp(spanWindows(documents, minTokens))
    val dupFps = wins.groupBy(col("fp")).agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ") > 1).select(col("fp"))
    val starts = wins.join(dupFps, Seq("fp"), "left_semi")
      .select(col("doc_id"), col("pos"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    starts
      // coverage-union islands: a start opens a NEW span only when its
      // window no longer overlaps/touches the previous start's window
      // (gap > minTokens); running sum of the flags is the island id
      .withColumn("newisl",
        when(col("pos") - lag(col("pos"), 1).over(w) <= minTokens, lit(0L))
          .otherwise(lit(1L)))
      .withColumn("grp", sum(col("newisl")).over(w))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).cast("long").as("span_start"),
        (max(col("pos")) + minTokens - 1).cast("long").as("span_end"),
        count(lit(1)).as("n_windows"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1L).as("span_len"),
        col("n_windows"))
  }

  /** x209: DUPLICATED-TOKEN RATE per source — the corpus-level
    * go/no-go number the Lee et al. pipeline reports before/after
    * dedup: the fraction of each source's tokens covered by some
    * duplicated ≥[[ExactSubstrTokens]]-token substring. The x206
    * maximal spans are DISJOINT per document by construction (islands
    * of consecutive duplicated starts), so coverage is an exact sum
    * of span lengths — no per-token explode, no distinct.
    *
    * Scale: the x206 pass plus one doc-keyed aggregate, one left join
    * back to the document scan, and a ≤|sources|-key hash aggregate —
    * everything after the span pass is linear and map-side
    * combinable. */
  def dupRateBySource(documents: DataFrame,
                      minTokens: Int = ExactSubstrTokens): DataFrame =
    dupRateBySourceFrom(exactSubstrSpans(documents, minTokens), documents)

  /** [[dupRateBySource]] over a pre-built (and ideally memo-shared
    * with x206) maximal-span frame — the x206 pass is the whole cost;
    * everything here is linear aggregates over its disjoint spans. */
  def dupRateBySourceFrom(substrSpans: DataFrame,
                          documents: DataFrame): DataFrame = {
    val perDoc = substrSpans
      .groupBy(col("doc_id"))
      .agg(sum(col("span_len")).as("dup_toks"), count(lit(1)).as("n_spans"))
    TextAnalysis.withTokens(documents)
      .select(col("doc_id"), col("source"),
        size(col("toks")).cast("long").as("n_toks"))
      .join(perDoc, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        coalesce(sum(col("dup_toks")), lit(0L)).as("n_dup_tokens"),
        coalesce(sum(col("n_spans")), lit(0L)).as("n_spans"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("n_dup_tokens"), col("n_spans"),
        when(col("n_tokens") > 0, Portable.round4(
          col("n_dup_tokens").cast("double") / col("n_tokens").cast("double")))
          .as("dup_rate"))
  }

  /** x32: INCREMENTAL exact dedup — the pattern a growing corpus runs
    * daily: a new batch is admitted only where its canonical
    * fingerprint is unseen in the accumulated state table, and
    * batch-internal copies collapse to the min doc_id. Simulated here
    * by splitting the fixture deterministically (doc_id % 3 == 0 is
    * "today's batch", the rest is "state"); in production the state
    * side is the fingerprint table the pipeline appends to each run.
    * Scale: one anti-join shuffled on the 32-char fp — both sides
    * fixed-width keys, never document bodies; with the state table
    * bucketed by fp the join is co-located and shuffle-free. */
  def incrementalNew(documents: DataFrame): DataFrame = {
    val fp = documents.select(col("doc_id"), fingerprint(col("text")).as("fp"))
    val state = fp.filter(col("doc_id") % 3 =!= 0).select(col("fp")).distinct()
    fp.filter(col("doc_id") % 3 === 0)
      .join(state, Seq("fp"), "left_anti")
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_batch_copies"))
  }

  /** x37: CONTAMINATION detection — eval docs whose n-grams leak into
    * the training split (the benchmark-decontamination step every LLM
    * data pipeline runs): shingles of the 'test' split are joined
    * against the 'train' split's inverted index; pairs sharing ≥
    * `minShared` distinct shingles are flagged with the shared count.
    * Train-side postings are df-capped ([[MaxShingleDf]]) — corpus
    * boilerplate is not contamination evidence and would go quadratic.
    * Scale: same inverted-index layout as [[jaccardPairsExact]]; the
    * test split is 10% of the corpus and only its postings replicate. */
  def contamination(documents: DataFrame, minShared: Int = 3,
                    maxDf: Int = MaxShingleDf): DataFrame =
    contaminationFrom(Caching.temp(docShingles(documents)), documents, minShared, maxDf)

  /** [[contamination]] over a pre-materialized shingle frame. */
  def contaminationFrom(sh: DataFrame, documents: DataFrame, minShared: Int = 3,
                        maxDf: Int = MaxShingleDf): DataFrame = {
    val split = TextAnalysis.splitAssign(documents).select(col("doc_id"), col("split"))
    // 60-bit hashed shingle keys, like jaccardPairsExactFrom: the
    // test×train posting join is the dominant shuffle and long keys
    // beat ~40-char strings; both engines hash identically
    val post = Caching.temp(sh.join(split, Seq("doc_id"))
      .select(col("doc_id"), col("split"), explode(col("sh")).as("s"))
      .select(col("doc_id"), col("split"),
        conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("h"))
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("h"))))
      .filter(col("df") <= maxDf))
    post.filter(col("split") === "test")
      .select(col("doc_id").as("test_doc"), col("h"))
      .join(post.filter(col("split") === "train")
        .select(col("doc_id").as("train_doc"), col("h")), Seq("h"))
      .groupBy(col("test_doc"), col("train_doc"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Content-defined segmentation: anchor tokens (16-bit token hash ≡
    * 0 mod [[AnchorMod]]) open a new segment, so segment boundaries
    * are SHIFT-INVARIANT — an insertion upstream of a shared text run
    * does not re-align every downstream chunk the way fixed-width
    * windows would (the rsync/CDC chunking idea applied to tokens;
    * CCNet-style pipelines use newlines, which the single-line
    * fixture docs lack). */
  val AnchorMod = 8
  /** Segments shorter than this never count as duplication evidence —
    * a single common word is not boilerplate (CCNet likewise skips
    * short lines). Short segments are always kept in the clean text. */
  val MinSegTokens = 3

  /** One row per (doc, segment): start offset, token count, text.
    * One shuffle on doc_id + one window pass (running anchor count),
    * then a hash aggregate — the segment id is a prefix sum, the
    * reconstruction key is the segment's start offset. */
  def cdcSegments(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    documents
      .repartition(documents.sparkSession.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("p", "tok")))
      .withColumn("seg",
        sum(when(pmod(tokenHash16(col("tok")), lit(AnchorMod.toLong)) === 0, 1)
          .otherwise(0)).over(w))
      .groupBy(col("doc_id"), col("seg"))
      .agg(
        min(col("p")).as("seg_start"),
        count(lit(1)).as("n_toks"),
        array_join(transform(array_sort(collect_list(struct(col("p"), col("tok")))),
          s => s.getField("tok")), " ").as("seg_text"))
  }

  /** x49: SEGMENT-LEVEL dedup (the paragraph/line dedup of a corpus
    * pipeline, on CDC segments because the fixture docs are
    * single-line): a segment of ≥ [[MinSegTokens]] tokens appearing
    * verbatim in more than one document is boilerplate and is removed
    * from EVERY document (CCNet removes all copies). Output per doc:
    * segment counts and the md5 of the text reconstructed from the
    * kept segments in original order.
    *
    * Scale: the frequency pass shuffles (segment_text → count) —
    * fixed-width md5 keys would shrink that further; the merge-back is
    * a hash join on segment text; reconstruction is the same doc_id
    * hash aggregate that built the segments. Nothing is quadratic in
    * docs or segments. */
  def segmentDedup(documents: DataFrame): DataFrame = {
    val segs = Caching.temp(cdcSegments(documents))
    val freq = segs.filter(col("n_toks") >= MinSegTokens)
      .groupBy(col("seg_text"))
      .agg(countDistinct(col("doc_id")).as("nd"))
    segs.join(freq, Seq("seg_text"), "left")
      .withColumn("is_dup", coalesce(col("nd"), lit(1L)) > 1)
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_segs"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dup_segs"),
        coalesce(sum(when(!col("is_dup"), col("n_toks"))), lit(0L)).as("n_clean_toks"),
        md5(array_join(
          transform(
            array_sort(collect_list(when(!col("is_dup"),
              struct(col("seg_start"), col("seg_text"))))),
            s => s.getField("seg_text")), " ")).as("clean_fp"))
  }

  /** Brute-force n-gram Jaccard pairs — the exact verifier / small-N
    * path; the LSH path above is the 100 TB path. */
  def jaccardPairsBrute(documents: DataFrame,
                        threshold: Double = JaccardThreshold): DataFrame = {
    val d = docShingles(documents)
    val l = d.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val r = d.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    l.crossJoin(r)
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** x184: DEDUP REPORT CARD — the cluster-size histogram of the x30
    * component labeling: per size, how many clusters and what share
    * of the graph's documents they hold. The one-page summary every
    * dedup run ships (is duplication a long tail of pairs or a few
    * boilerplate families?), and the direct input to "how many docs
    * does keep-one-per-cluster delete" (= Σ (size−1)·n_clusters).
    * Sizes cover only docs IN the pair graph — singletons never enter
    * x30's labeling (by design; the corpus minus the graph is the
    * implicit size-1 bucket).
    *
    * Scale: two aggregates over the cluster-label frame (itself
    * near-dup-pair-bounded, far smaller than the corpus); the
    * histogram is \|size domain\|-sized, totals broadcast back. */
  def dedupReport(clusters: DataFrame): DataFrame = {
    val tot = clusters.agg(count(lit(1)).as("n_docs_graph"))
    clusters.groupBy(col("n_members"))
      .agg(countDistinct(col("cluster_id")).as("n_clusters"))
      .crossJoin(broadcast(tot))
      .select(col("n_members"), col("n_clusters"),
        (col("n_members") * col("n_clusters")).as("n_docs"),
        Portable.round4((col("n_members") * col("n_clusters")).cast("double") /
          col("n_docs_graph").cast("double")).as("doc_share"),
        ((col("n_members") - 1) * col("n_clusters")).as("n_removable"))
  }
}
