package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Full-text retrieval over the corpus — beyond-reference track: BM25
  * ranking (Robertson/Spärck Jones; the Lucene-variant idf) through an
  * inverted-index join, the query-side dual of the similarity-join
  * operators in [[Dedup]].
  *
  * Determinism/portability: every per-term contribution is computed in
  * ONE fixed expression order and snapped to a 1e-7 grid BIGINT before
  * the per-(query, doc) sum — integer sums commute, so the score is
  * independent of aggregation order in both engines (same trick as
  * [[Similarity.CentroidScale]]); ranking compares the integer totals,
  * ties break on doc_id.
  *
  * Scale: queries are a workload input (bounded batch) and broadcast;
  * only postings matching a query term leave the scan, so the join
  * volume is Σ_term df(term), never the corpus. Document length and
  * corpus stats are one extra aggregate each.
  */
object Search {

  /** BM25 constants (standard defaults). */
  val K1 = 1.2
  val B = 0.75
  /** Results returned per query. */
  val TopK = 10
  /** Fixed-point grid for per-term score contributions. */
  val ScoreScale = 10000000L

  /** The demo query batch (terms from the fixture vocabulary; a term
    * absent from the corpus simply contributes no postings). */
  val Queries: Seq[(String, Seq[String])] = Seq(
    "q_spark_join"   -> Seq("spark", "join", "fast"),
    "q_hash_merge"   -> Seq("hash", "merge"),
    "q_stream_state" -> Seq("stream", "window", "state"),
    "q_sort_order"   -> Seq("sort", "key", "order"),
    "q_vector_data"  -> Seq("vector", "data"))

  /** x51: BM25 top-[[TopK]] documents per query.
    * idf = ln(1 + (N − df + 0.5)/(df + 0.5));
    * tf-norm = tf·(k1+1) / (tf + k1·(1 − b + b·dl·N/Σdl));
    * score = Σ_terms round_1e-7(idf · tf-norm). */
  def bm25Search(documents: DataFrame, k: Int = TopK): DataFrame = {
    val s = documents.sparkSession
    import s.implicits._
    val qterms = broadcast(
      Queries.flatMap { case (q, ts) => ts.map(q -> _) }.toDF("query", "term"))
    val tf = Caching.temp(TextAnalysis.docTermFreq(documents))
    val dl = TextAnalysis.withTokens(documents)
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"))
    val stats = broadcast(dl.agg(
      count(lit(1)).as("n_docs"), sum(col("dl")).as("total_toks")))
    val dfq = tf.join(qterms.select(col("term").as("tok")).distinct(), Seq("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    // association order matches the x51 oracle EXACTLY:
    // ((idf * (tf*(k1+1))) / den) * scale, left to right — a*(b/c) vs
    // (a*b)/c differ in the last ulp, which is enough to flip a
    // floor(x+0.5) grid cell on a boundary value
    val den = col("tf") + lit(K1) * (lit(1.0 - B) +
      lit(B) * (col("dl").cast("double") * col("n_docs") / col("total_toks")))
    val contrib = qterms.join(tf, col("term") === col("tok"))
      .join(dfq, Seq("tok"))
      .join(dl, Seq("doc_id"))
      .crossJoin(stats)
      .select(col("query"), col("doc_id"),
        floor(idf * (col("tf") * lit(K1 + 1)) / den * ScoreScale + 0.5)
          .cast("long").as("fp"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query")).orderBy(col("total").desc, col("doc_id").asc)
    contrib.groupBy(col("query"), col("doc_id"))
      .agg(sum(col("fp")).as("total"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query"), col("doc_id"),
        Portable.round4(col("total").cast("double") / ScoreScale).as("score"),
        col("rnk"))
  }

  /** Per-probe query-term budget for [[docProbeBm25]]: each probe doc
    * queries with its top-[[QTermCap]] terms by (tf desc, term asc) —
    * the x25 df-cap philosophy applied to the query side. Uncapped,
    * the saturated-vocab worst case (every term matching ~1/|vocab|
    * of all postings) makes the contrib join Θ(|probes|·|terms|·
    * postings-per-term) — measured ~750 M rows at sf1 on the ~31-word
    * fixture. The cap bounds it at |probes|·QTermCap·df and keeps the
    * high-tf terms that dominate the BM25 totals anyway. */
  val QTermCap = 16

  /** CHAMPION-LIST posting bound for [[docProbeBm25]] (Manning et al.,
    * IIR §7.1.3 "champion lists"): each term's postings are truncated
    * to its top-[[ChampionCap]] documents by (tf desc, doc_id asc)
    * BEFORE the probe join, so the contrib join is
    * Θ(|probes|·QTermCap·min(df, C)) — independent of how saturated a
    * term's posting list is. The r7 sf1 measurement that forced this:
    * with the term cap alone, every one of the ~31 fixture terms
    * still matched ~87% of 50k documents, the contrib join expanded
    * to ~350 M rows and x198 cost ~475 s both passes (the sf0.1 cost
    * ×100 — BOTH sides of the join scale with the corpus). Champion
    * truncation is the standard exact-on-Zipf approximation: a term
    * with df ≤ C is untouched (every test SF below sf0.1), and a
    * saturated term keeps the tf-dominant postings that decide the
    * top-k anyway. idf still uses the TRUE df. The per-term top-C is
    * a WindowGroupLimit-pruned window — per-partition heaps before
    * the shuffle, the scalable two-phase top-k. */
  val ChampionCap = 2048

  /** RRF rank constant (Cormack et al. '09 default). */
  val RrfK = 60
  /** Fixed-point grid for RRF contributions (integer division — the
    * sum of ≤2 exact integers is aggregation-order-free). */
  val RrfScale = 10000000L

  /** Document-as-query BM25 leg for [[hybridRrf]]: each probe doc
    * (the x11 stride — ids ≡ 0 mod [[Similarity.QueryStride]]) queries
    * the corpus with its top-[[QTermCap]] terms (tf desc, term asc —
    * see the cap's scaladoc for the worst-case bound it buys);
    * scoring is [[bm25Search]] verbatim (same constants, same fixed
    * association order, same 1e-7-grid integer contributions),
    * self-matches excluded to mirror the ANN leg.
    *
    * Scale: unlike x51's workload-bounded query batch, the probe-term
    * frame scales with corpus/stride — so it joins the postings KEYED
    * on the term (no broadcast), and the per-query top-k is a
    * WindowGroupLimit-pruned partitioned window. */
  def docProbeBm25(documents: DataFrame, k: Int = TopK,
                   termCap: Int = QTermCap,
                   championCap: Int = ChampionCap): DataFrame = {
    val tf = Caching.temp(TextAnalysis.docTermFreq(documents))
    val dl = Caching.temp(TextAnalysis.withTokens(documents)
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl")))
    val stats = broadcast(dl.agg(
      count(lit(1)).as("n_docs"), sum(col("dl")).as("total_toks")))
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("tf").desc, col("tok").asc)
    val qterms = tf.filter(col("doc_id") % Similarity.QueryStride === 0)
      .withColumn("trn", row_number().over(wq))
      .filter(col("trn") <= termCap)
      .select(col("doc_id").as("q_id"), col("tok").as("term"))
    val dfq = tf.join(qterms.select(col("term").as("tok")).distinct(), Seq("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
    // champion lists: the probe join reads only each term's top-C
    // postings ([[ChampionCap]]); df above stays the TRUE df
    val wc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("tok")).orderBy(col("tf").desc, col("doc_id").asc)
    val champ = tf
      .withColumn("crn", row_number().over(wc))
      .filter(col("crn") <= championCap)
      .drop("crn")
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    val den = col("tf") + lit(K1) * (lit(1.0 - B) +
      lit(B) * (col("dl").cast("double") * col("n_docs") / col("total_toks")))
    val contrib = qterms.join(champ, col("term") === col("tok"))
      .filter(col("q_id") =!= col("doc_id"))
      .join(dfq, Seq("tok"))
      .join(dl, Seq("doc_id"))
      .crossJoin(stats)
      .select(col("q_id"), col("doc_id"),
        floor(idf * (col("tf") * lit(K1 + 1)) / den * ScoreScale + 0.5)
          .cast("long").as("fp"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("total").desc, col("doc_id").asc)
    contrib.groupBy(col("q_id"), col("doc_id"))
      .agg(sum(col("fp")).as("total"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("doc_id"), col("rnk"))
  }

  /** x213: CHAMPION-LIST RECALL AUDIT — overlap@k of the champion-
    * truncated lexical leg ([[docProbeBm25]] as shipped) against the
    * exact untruncated leg, per probe: the measured price of the
    * [[ChampionCap]] bound, exactly how x190/x200 price the ANN
    * index's approximations. recall = 1.0 wherever every queried
    * term's df ≤ C (all fixture SFs below sf0.1 — the audit proves
    * the bound inactive there); where truncation bites, the number
    * says how often a top-k doc lived outside some term's champion
    * list.
    *
    * Scale: the EXACT leg is the deliberately-unbounded reference —
    * this audit is a small-SF instrument (the x8/x10 brute-baseline
    * convention), not a production path; the champion leg and the
    * overlap join are top-k-bounded. */
  def championRecall(documents: DataFrame, k: Int = TopK,
                     championCap: Int = ChampionCap): DataFrame =
    championRecallFrom(Caching.temp(championContrib(documents)),
      k, championCap)

  /** The ONE postings scan both x213 legs cut from (VERDICT r7): the
    * champion leg is by construction a row-SUBSET of the exact leg's
    * contrib frame (the same (q_id, doc_id, fp) rows, restricted to
    * champion-rank crn <= C before aggregation), so the UNCAPPED
    * contrib is built once with crn attached and cut twice — the heavy
    * qterms⋈postings join runs once instead of twice, and each leg's
    * totals are exactly what its own docProbeBm25 run would aggregate.
    * Exposed so the audit's only corpus-heavy frame can be memoized
    * per (session, dir) the way tfMemo shares the tokenize
    * (VERDICT r8); rows are bounded by |probes|·QTermCap·df. */
  def championContrib(documents: DataFrame): DataFrame = {
    val tf = Caching.temp(TextAnalysis.docTermFreq(documents))
    val dl = Caching.temp(TextAnalysis.withTokens(documents)
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl")))
    val stats = broadcast(dl.agg(
      count(lit(1)).as("n_docs"), sum(col("dl")).as("total_toks")))
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("tf").desc, col("tok").asc)
    val qterms = tf.filter(col("doc_id") % Similarity.QueryStride === 0)
      .withColumn("trn", row_number().over(wq))
      .filter(col("trn") <= QTermCap)
      .select(col("doc_id").as("q_id"), col("tok").as("term"))
    val dfq = tf.join(qterms.select(col("term").as("tok")).distinct(), Seq("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val wc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("tok")).orderBy(col("tf").desc, col("doc_id").asc)
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    val den = col("tf") + lit(K1) * (lit(1.0 - B) +
      lit(B) * (col("dl").cast("double") * col("n_docs") / col("total_toks")))
    qterms
      .join(tf.withColumn("crn", row_number().over(wc)), col("term") === col("tok"))
      .filter(col("q_id") =!= col("doc_id"))
      .join(dfq, Seq("tok"))
      .join(dl, Seq("doc_id"))
      .crossJoin(stats)
      .select(col("q_id"), col("doc_id"), col("crn"),
        floor(idf * (col("tf") * lit(K1 + 1)) / den * ScoreScale + 0.5)
          .cast("long").as("fp"))
  }

  /** The x213 recall computation over a pre-built (and ideally
    * memoized) [[championContrib]] frame — two top-k cuts plus
    * top-k-bounded overlap joins, nothing corpus-sized. */
  def championRecallFrom(contrib: DataFrame, k: Int = TopK,
                         championCap: Int = ChampionCap): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("total").desc, col("doc_id").asc)
    def topk(rows: DataFrame): DataFrame = rows
      .groupBy(col("q_id"), col("doc_id"))
      .agg(sum(col("fp")).as("total"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("doc_id"))
    val exact = topk(contrib)
    val champ = topk(contrib.filter(col("crn") <= championCap))
    val hits = exact.join(champ, Seq("q_id", "doc_id"))
      .groupBy(col("q_id")).agg(count(lit(1)).as("hits"))
    exact.groupBy(col("q_id")).agg(count(lit(1)).as("n_exact"))
      .join(hits, Seq("q_id"), "left")
      .select(col("q_id"), col("n_exact"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        Portable.round4(coalesce(col("hits"), lit(0L)).cast("double") /
          col("n_exact").cast("double")).as("recall"))
  }

  /** x198: HYBRID RETRIEVAL with RECIPROCAL-RANK FUSION — the
    * canonical RAG retrieval read: for each probe document, fuse its
    * lexical BM25 top-k ([[docProbeBm25]], the x51 machinery) with its
    * dense ANN top-k ([[Similarity.annIvfFrom]], the x11 index) by
    * RRF: score = Σ_legs 1/(RrfK + rank), candidates present in both
    * legs rise above single-leg hits.
    *
    * Determinism: each leg's contribution is the exact integer
    * RrfScale div (RrfK + rank) — integer division agrees across
    * engines and the ≤2-term sum has no float order sensitivity; the
    * displayed score is one final 4dp division. Final ranking by
    * (rrf desc, doc_id) is total.
    *
    * Scale: the legs are the AUDITED x51/x11 shapes (inverted-index
    * postings join; IVF probe of nprobe cells — never brute-force);
    * the fusion itself is a (q_id, doc_id)-keyed FULL OUTER join of
    * two k·|probes|-row frames plus one partitioned top-k window —
    * everything downstream of the legs is top-k-bounded, never
    * corpus-sized. Callers pass the SHARED vector projection and
    * trained quantizer (the x8–x11/x52 memos) so the corpus is
    * neither rescanned nor re-trained for the dense leg. */
  def hybridRrf(documents: DataFrame, vs: DataFrame, cents: DataFrame,
                k: Int = TopK): DataFrame = {
    val ann = Similarity.annIvfFrom(vs, cents, k) // k forwarded (ADVICE r6)
      .select(col("q_id"), col("vec_id").as("doc_id"), col("rnk").as("ann_rnk"))
    val lex = docProbeBm25(documents, k)
      .select(col("q_id"), col("doc_id"), col("rnk").as("lex_rnk"))
    val fused = lex.join(ann, Seq("q_id", "doc_id"), "full_outer")
      .select(col("q_id"), col("doc_id"), col("lex_rnk"), col("ann_rnk"),
        (coalesce(expr(s"$RrfScale div ($RrfK + lex_rnk)"), lit(0L)) +
          coalesce(expr(s"$RrfScale div ($RrfK + ann_rnk)"), lit(0L))).as("rrf_i"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("rrf_i").desc, col("doc_id").asc)
    fused.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("doc_id"), col("lex_rnk"), col("ann_rnk"),
        Portable.round4(col("rrf_i").cast("double") / RrfScale).as("rrf"),
        col("rnk"))
  }

  /** x204: FUSION EVALUATION — recall@k of the ANN-only leg (x11) and
    * the fused hybrid list (x198) against the exact cosine ground
    * truth (x10), per probe. fused_recall − ann_recall is the
    * measured effect of the fusion (the x190 evaluation, applied to
    * the retrieval stack's top layer instead of the index).
    *
    * READ THE SIGN CAREFULLY: against a COSINE ground truth this
    * difference is negative by construction whenever the lexical leg
    * carries signal the dense metric doesn't — RRF interleaves ~k/2
    * candidates from each leg, so agreement with the dense-only
    * oracle drops toward 0.5 exactly when fusion is doing its job
    * (measured: ann 0.75 avg vs fused 0.50 flat at sf0.1). The
    * operator's value is making that trade VISIBLE: against a human
    * relevance ground truth the sign flips — this harness slot is
    * where such labels plug in, with the cosine truth as the
    * always-available default.
    *
    * Scale: all three inputs are existing top-k outputs (k rows per
    * probe); the overlaps are (q_id, id)-keyed equi joins and
    * probe-keyed aggregates — nothing corpus-sized happens here
    * beyond the three retrieval runs themselves, which reuse the
    * shared projection/quantizer memos. */
  def fusionEval(documents: DataFrame, vs: DataFrame, cents: DataFrame,
                 k: Int = TopK): DataFrame = {
    val brute = Caching.temp(Similarity.annBruteFrom(vs, k)
      .select(col("q_id"), col("vec_id")))
    val ann = Similarity.annIvfFrom(vs, cents, k)
      .select(col("q_id"), col("vec_id"))
    val fused = hybridRrf(documents, vs, cents, k)
      .select(col("q_id"), col("doc_id").as("vec_id"))
    val nb = brute.groupBy(col("q_id")).agg(count(lit(1)).as("n_brute"))
    val ah = brute.join(ann, Seq("q_id", "vec_id"))
      .groupBy(col("q_id")).agg(count(lit(1)).as("ann_hits"))
    val fh = brute.join(fused, Seq("q_id", "vec_id"))
      .groupBy(col("q_id")).agg(count(lit(1)).as("fused_hits"))
    nb.join(ah, Seq("q_id"), "left").join(fh, Seq("q_id"), "left")
      .select(col("q_id"), col("n_brute"),
        coalesce(col("ann_hits"), lit(0L)).as("ann_hits"),
        coalesce(col("fused_hits"), lit(0L)).as("fused_hits"),
        Portable.round4(coalesce(col("ann_hits"), lit(0L)).cast("double") /
          lit(k).cast("double")).as("ann_recall"),
        Portable.round4(coalesce(col("fused_hits"), lit(0L)).cast("double") /
          lit(k).cast("double")).as("fused_recall"))
  }

  /** x217: CHUNK-LEVEL RETRIEVAL EVAL — the RAG read that decides
    * chunk width/stride: retrieve with the x112 chunks as the BM25
    * unit and score, per probe, whether the top-k CHUNKS recover
    * their source DOCUMENT — the standard needle test (the probe's
    * query is its own top-[[QTermCap]] doc terms, so the source doc's
    * chunks are the ground truth; self-matches are deliberately NOT
    * excluded, unlike [[docProbeBm25]]). Reported per probe:
    * `n_hits` = source chunks in the top-k, `first_rank` = rank of
    * the first (NULL when none), `mrr` = 1/first_rank (0.0 when
    * none) — aggregate MRR@k / recall@k over probes is one mean away.
    * A chunk grid too narrow for its stride dilutes each chunk's term
    * mass and this number drops; that measurement is the operator.
    *
    * Scoring is [[bm25Search]] verbatim over the CHUNK index: chunk
    * length as dl, chunk count as N, chunk-level df, the same fixed
    * association order and 1e-7-grid integer contributions; chunk
    * ranking ties break (total desc, src_doc asc, chunk_idx asc).
    *
    * Scale: the probe-term frame scales with corpus/stride, so it
    * joins the chunk postings KEYED on the term with the x198
    * champion-list bound ([[ChampionCap]] top chunks per term, true
    * df kept) — the saturated-vocab quadratic died there, and the
    * chunk index only multiplies posting rows, so the bound matters
    * MORE here; the per-probe top-k is a WindowGroupLimit-pruned
    * window and everything after it is top-k-bounded. */
  def chunkRetrievalEval(documents: DataFrame, k: Int = TopK,
                         termCap: Int = QTermCap,
                         championCap: Int = ChampionCap): DataFrame =
    chunkRetrievalEvalFrom(TextAnalysis.chunkSlices(documents), documents,
      k, termCap, championCap)

  /** [[chunkRetrievalEval]] over a pre-built (and ideally memo-shared
    * with x112) chunk-slice frame — the tokenize+posexplode+slice
    * corpus scan is the eval's single corpus-sized input, so sharing
    * it is the ivfMemo rationale applied to the chunk grid. */
  def chunkRetrievalEvalFrom(chunkSlices: DataFrame, documents: DataFrame,
                             k: Int = TopK, termCap: Int = QTermCap,
                             championCap: Int = ChampionCap): DataFrame =
    chunkRetrievalEvalFromContrib(
      Caching.temp(chunkContrib(chunkSlices, documents, termCap, championCap)),
      documents, k, termCap)

  /** The x217 per-(probe, chunk) scored contrib frame — the chunk
    * inverted index built, champion-capped and joined to the probe
    * terms in one pass. This is the eval's only chunk-grid-sized
    * work, exposed so it can be memoized per (session, dir)
    * (VERDICT r8); rows are bounded by |probes|·termCap·C. */
  def chunkContrib(chunkSlices: DataFrame, documents: DataFrame,
                   termCap: Int = QTermCap,
                   championCap: Int = ChampionCap): DataFrame = {
    val slices = Caching.temp(chunkSlices
      .select(col("doc_id").as("src_doc"), col("chunk_idx"), col("ctoks")))
    val cdl = Caching.temp(slices
      .select(col("src_doc"), col("chunk_idx"),
        size(col("ctoks")).cast("long").as("cdl")))
    val stats = broadcast(cdl.agg(
      count(lit(1)).as("n_chunks"), sum(col("cdl")).as("total_ctoks")))
    val ctf = Caching.temp(slices
      .select(col("src_doc"), col("chunk_idx"), explode(col("ctoks")).as("tok"))
      .groupBy(col("src_doc"), col("chunk_idx"), col("tok"))
      .agg(count(lit(1)).as("tf")))
    val tf = TextAnalysis.docTermFreq(documents)
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("tf").desc, col("tok").asc)
    val qterms = Caching.temp(tf.filter(col("doc_id") % Similarity.QueryStride === 0)
      .withColumn("trn", row_number().over(wq))
      .filter(col("trn") <= termCap)
      .select(col("doc_id").as("q_id"), col("tok").as("term")))
    val dfc = ctf.join(qterms.select(col("term").as("tok")).distinct(), Seq("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val wc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("tok"))
      .orderBy(col("tf").desc, col("src_doc").asc, col("chunk_idx").asc)
    val champ = ctf
      .withColumn("crn", row_number().over(wc))
      .filter(col("crn") <= championCap)
      .drop("crn")
    val idf = log(lit(1.0) +
      (col("n_chunks") - col("df") + 0.5) / (col("df") + 0.5))
    val den = col("tf") + lit(K1) * (lit(1.0 - B) +
      lit(B) * (col("cdl").cast("double") * col("n_chunks") / col("total_ctoks")))
    qterms.join(champ, col("term") === col("tok"))
      .join(dfc, Seq("tok"))
      .join(cdl, Seq("src_doc", "chunk_idx"))
      .crossJoin(stats)
      // the matched term rides along for the x225 graded-relevance
      // read (count of distinct matched query terms per chunk); the
      // x217 aggregation ignores it
      .select(col("q_id"), col("src_doc"), col("chunk_idx"), col("tok"),
        floor(idf * (col("tf") * lit(K1 + 1)) / den * ScoreScale + 0.5)
          .cast("long").as("fp"))
  }

  /** The x217 scoring over a pre-built (and ideally memoized)
    * [[chunkContrib]] frame: per-probe top-k cut + needle stats. The
    * probe universe is re-derived from the (memo-shared) doc term
    * frequencies, NOT from the contrib rows — a probe whose every
    * term got champion-truncated away must still report n_hits = 0. */
  def chunkRetrievalEvalFromContrib(contrib: DataFrame, documents: DataFrame,
                                    k: Int = TopK,
                                    termCap: Int = QTermCap): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id"))
      .orderBy(col("total").desc, col("src_doc").asc, col("chunk_idx").asc)
    val top = contrib.groupBy(col("q_id"), col("src_doc"), col("chunk_idx"))
      .agg(sum(col("fp")).as("total"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
    val hits = top.filter(col("src_doc") === col("q_id"))
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("n_hits"), min(col("rnk")).as("first_rank"))
    val probes = TextAnalysis.docTermFreq(documents)
      .filter(col("doc_id") % Similarity.QueryStride === 0)
      .select(col("doc_id").as("q_id")).distinct()
    probes
      .join(hits, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        col("first_rank"),
        Portable.round4(coalesce(lit(1.0) / col("first_rank"), lit(0.0)))
          .as("mrr"))
  }

  /** Fixed-point grid for per-position nDCG gain terms (x225). */
  val NdcgScale = 10000000L

  /** x225: nDCG@k GRADED-RELEVANCE EVAL on the x217 chunk grid — the
    * IR-eval read binary hit/MRR (x217) can't give: chunk relevance
    * is GRADED as the number of the probe's query terms the chunk
    * matched (an exact integer on the champion-capped postings
    * universe — the same universe the ranking scored, so grade and
    * rank are audited against the same index), and the report is the
    * standard DCG@k with the log2 discount (Järvelin & Kekäläinen
    * '02): gain(r) = (2^rel − 1)/log2(r+1), normalized by the ideal
    * ordering (rel desc) of the SAME candidate set. A ranking that
    * puts high-grade chunks late shows ndcg < 1 even when recall@k is
    * perfect — the measurement MRR's first-hit collapse hides.
    *
    * Determinism: rel and rank are exact integers; each position's
    * gain snaps to the [[NdcgScale]] grid BEFORE the per-probe sum
    * (the x51 integer-sum convention — 2^rel − 1 is integer-exact in
    * a double for rel ≤ QTermCap), ideal ties break (rel desc,
    * src_doc, chunk_idx); ndcg is one final 4dp division of the two
    * integer sums.
    *
    * Scale: consumes the memoized x217 contrib frame — everything
    * here is per-(probe, candidate) aggregates and two
    * WindowGroupLimit-prunable per-probe top-k windows; nothing
    * corpus-sized. */
  def chunkNdcgFromContrib(contrib: DataFrame, documents: DataFrame,
                           k: Int = TopK): DataFrame = {
    val rel = contrib
      .groupBy(col("q_id"), col("src_doc"), col("chunk_idx"))
      .agg(countDistinct(col("tok")).as("rel"), sum(col("fp")).as("total"))
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id"))
      .orderBy(col("total").desc, col("src_doc").asc, col("chunk_idx").asc)
    val wi = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id"))
      .orderBy(col("rel").desc, col("src_doc").asc, col("chunk_idx").asc)
    val ranked = rel
      .withColumn("rnk", row_number().over(wr).cast("long"))
      .withColumn("irn", row_number().over(wi).cast("long"))
    def gain(rank: Column): Column =
      floor((pow(lit(2.0), col("rel")) - 1) / log2(rank + 1)
        * NdcgScale + 0.5).cast("long")
    val dcg = ranked.filter(col("rnk") <= k)
      .groupBy(col("q_id")).agg(sum(gain(col("rnk"))).as("dcg_i"))
    val idcg = ranked.filter(col("irn") <= k)
      .groupBy(col("q_id")).agg(sum(gain(col("irn"))).as("idcg_i"))
    val probes = TextAnalysis.docTermFreq(documents)
      .filter(col("doc_id") % Similarity.QueryStride === 0)
      .select(col("doc_id").as("q_id")).distinct()
    probes
      .join(dcg, Seq("q_id"), "left")
      .join(idcg, Seq("q_id"), "left")
      .select(col("q_id"),
        Portable.round4(coalesce(col("dcg_i"), lit(0L)).cast("double") /
          NdcgScale).as("dcg"),
        Portable.round4(coalesce(col("idcg_i"), lit(0L)).cast("double") /
          NdcgScale).as("idcg"),
        when(coalesce(col("idcg_i"), lit(0L)) > 0,
          Portable.round4(col("dcg_i").cast("double") / col("idcg_i")))
          .otherwise(lit(0.0)).as("ndcg"))
  }

  /** Threshold-bootstrap posting prefix for [[maxScoreAudit]]: pass 1
    * scores only each term's top-this-many postings (by tf desc,
    * doc_id asc — the champion order) to obtain a cheap, provably
    * achievable lower bound θ on the final k-th score. Deliberately
    * far below [[ChampionCap]]: the boot pass must stay index-stat
    * cheap for the split to pay off. */
  val MaxScoreBootCap = 64

  /** x226: MAXSCORE DYNAMIC PRUNING with a losslessness audit (Turtle
    * & Flood '95; the essential/non-essential list split every
    * DAAT engine ships). Batch formulation over the x51 workload:
    *
    *  1. bootstrap θ = the k-th best score over each query term's
    *     top-[[MaxScoreBootCap]] postings only — every boot total is a
    *     sum of REAL contributions of a posting subset, so
    *     θ ≤ true k-th score;
    *  2. per-(query, term) upper bound ub = max posting contribution
    *     (the score ceiling a real index stores per posting list);
    *  3. sort terms by ub ascending; the maximal prefix whose
    *     cumulative Σub < θ is NON-ESSENTIAL: a document matching only
    *     those terms scores ≤ Σub < θ ≤ true k-th total, so it cannot
    *     enter the top-k under any (total desc, doc_id) tiebreak —
    *     the pruning is EXACT, not approximate;
    *  4. candidates = documents with ≥1 essential-term posting; the
    *     full scoring join runs on candidates only.
    *
    * The audit output reports, per query, the matched-doc count, the
    * candidate count after the split, the pruned fraction, and the
    * top-k overlap of the pruned leg against the unpruned leg — which
    * the algebra above forces to n_exact, so the row is a
    * machine-checked losslessness proof at every SF (the x213/x215
    * audit convention).
    *
    * Determinism: ub/θ/cum are exact BIGINTs on the [[ScoreScale]]
    * grid; the term order (ub asc, term asc) and both top-k orders
    * (total desc, doc_id asc) are total.
    *
    * Scale: this is the operator that makes workload-serving reads
    * SUBLINEAR in matched postings — at 100 TB the boot pass reads
    * O(terms·C) index rows, and the full join is cut to the candidate
    * set (here measured by pruned_frac); the ub/θ frames are
    * per-query-term tiny and broadcast. */
  def maxScoreAudit(documents: DataFrame, k: Int = TopK,
                    bootCap: Int = MaxScoreBootCap): DataFrame = {
    val s = documents.sparkSession
    import s.implicits._
    val qterms = broadcast(
      Queries.flatMap { case (q, ts) => ts.map(q -> _) }.toDF("query", "term"))
    val tf = Caching.temp(TextAnalysis.docTermFreq(documents))
    val dl = TextAnalysis.withTokens(documents)
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"))
    val stats = broadcast(dl.agg(
      count(lit(1)).as("n_docs"), sum(col("dl")).as("total_toks")))
    val dfq = tf.join(qterms.select(col("term").as("tok")).distinct(), Seq("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    val den = col("tf") + lit(K1) * (lit(1.0 - B) +
      lit(B) * (col("dl").cast("double") * col("n_docs") / col("total_toks")))
    val wc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("tok")).orderBy(col("tf").desc, col("doc_id").asc)
    // one postings scan with the champion rank attached (the x213
    // shared-contrib pattern): the boot leg is the crn ≤ bootCap cut
    val contrib = Caching.temp(qterms
      .join(tf.withColumn("crn", row_number().over(wc)), col("term") === col("tok"))
      .join(dfq, Seq("tok"))
      .join(dl, Seq("doc_id"))
      .crossJoin(stats)
      .select(col("query"), col("term"), col("doc_id"), col("crn"),
        floor(idf * (col("tf") * lit(K1 + 1)) / den * ScoreScale + 0.5)
          .cast("long").as("fp")))
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query")).orderBy(col("total").desc, col("doc_id").asc)
    val theta = contrib.filter(col("crn") <= bootCap)
      .groupBy(col("query"), col("doc_id")).agg(sum(col("fp")).as("total"))
      .withColumn("rnk", row_number().over(wq))
      .filter(col("rnk") === k)
      .select(col("query"), col("total").as("theta"))
    // ub-ascending cumulative sums decide the essential split; a
    // query with < k boot docs gets θ = 0 → everything essential
    val wcum = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query")).orderBy(col("ub").asc, col("term").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val terms = contrib.groupBy(col("query"), col("term"))
      .agg(max(col("fp")).as("ub"))
      .withColumn("cum", sum(col("ub")).over(wcum))
      .join(broadcast(theta), Seq("query"), "left")
      .withColumn("essential",
        col("cum") >= coalesce(col("theta"), lit(0L)))
    val ess = Caching.temp(terms)
    val cand = Caching.temp(contrib.join(
        ess.filter(col("essential")).select(col("query"), col("term")),
        Seq("query", "term"), "left_semi")
      .select(col("query"), col("doc_id")).distinct())
    def topk(rows: DataFrame): DataFrame = rows
      .groupBy(col("query"), col("doc_id")).agg(sum(col("fp")).as("total"))
      .withColumn("rnk", row_number().over(wq))
      .filter(col("rnk") <= k)
      .select(col("query"), col("doc_id"))
    val exact = Caching.temp(topk(contrib))
    val pruned = topk(contrib.join(cand, Seq("query", "doc_id"), "left_semi"))
    val hits = exact.join(pruned, Seq("query", "doc_id"))
      .groupBy(col("query")).agg(count(lit(1)).as("hits"))
    val nTerms = ess.groupBy(col("query")).agg(
      count(lit(1)).as("n_terms"),
      sum(when(col("essential"), 1L).otherwise(0L)).as("n_essential"))
    val nMatch = contrib.select(col("query"), col("doc_id")).distinct()
      .groupBy(col("query")).agg(count(lit(1)).as("n_matching"))
    val nCand = cand.groupBy(col("query")).agg(count(lit(1)).as("n_candidates"))
    val nExact = exact.groupBy(col("query")).agg(count(lit(1)).as("n_exact"))
    nTerms.join(nMatch, Seq("query")).join(nCand, Seq("query"))
      .join(nExact, Seq("query")).join(hits, Seq("query"), "left")
      .select(col("query"), col("n_terms"), col("n_essential"),
        col("n_matching"), col("n_candidates"),
        Portable.round4(lit(1.0) - col("n_candidates").cast("double") /
          col("n_matching").cast("double")).as("pruned_frac"),
        col("n_exact"), coalesce(col("hits"), lit(0L)).as("hits"))
  }

  /** Postings block length for block-max upper bounds (x244): real
    * indexes store a per-block maximum every 64–128 docs; 64 keeps
    * multiple blocks per list even at the small fixture SFs. */
  val BlockMaxLen = 64

  /** x244: BLOCK-MAX MAXSCORE (the per-block refinement of x226 —
    * Ding & Suel '11 brought block-local maxima to WAND; the same
    * bound tightens MaxScore's): x226 prices every term by ONE global
    * ceiling, so a single hot posting inflates the bound of every
    * other block in its list. Here each term's postings list is cut
    * into [[BlockMaxLen]]-doc blocks on the champion-rank grid and a
    * per-(query, term, block) maximum `bub` is stored — the
    * block-max table a real index serializes next to its skip
    * pointers. On top of x226's essential-split candidates, each
    * candidate is bounded by Σ over ITS postings of the block's bub
    * (total ≤ bound by construction); a candidate with bound < θ ≤
    * true k-th score cannot enter the top-k under the (total desc,
    * doc_id) tiebreak, so dropping it is EXACT — the audit row forces
    * pruned ≡ exact the same way x226 does, and reports the
    * block-level candidate cut beside the global one
    * (`pruned_frac_bm ≥ pruned_frac` by construction: the block pass
    * only removes candidates).
    *
    * Determinism: bub/bound/θ are exact BIGINTs on the
    * [[ScoreScale]] grid; block ids are integer grid cuts of the
    * (tf desc, doc_id asc) champion order.
    *
    * Scale: the block-max table is O(postings / blockLen) rows,
    * keyed and broadcast-joinable per query; the bound pass touches
    * candidates' postings only (already cut by the essential split),
    * and the full scoring join runs on the block-surviving set — at
    * serving scale this is the difference between decoding a block
    * and skipping it, priced here as n_candidates_bm. */
  def blockMaxAudit(documents: DataFrame, k: Int = TopK,
                    bootCap: Int = MaxScoreBootCap,
                    blockLen: Int = BlockMaxLen): DataFrame = {
    val s = documents.sparkSession
    import s.implicits._
    val qterms = broadcast(
      Queries.flatMap { case (q, ts) => ts.map(q -> _) }.toDF("query", "term"))
    val tf = Caching.temp(TextAnalysis.docTermFreq(documents))
    val dl = TextAnalysis.withTokens(documents)
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"))
    val stats = broadcast(dl.agg(
      count(lit(1)).as("n_docs"), sum(col("dl")).as("total_toks")))
    val dfq = tf.join(qterms.select(col("term").as("tok")).distinct(), Seq("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    val den = col("tf") + lit(K1) * (lit(1.0 - B) +
      lit(B) * (col("dl").cast("double") * col("n_docs") / col("total_toks")))
    val wc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("tok")).orderBy(col("tf").desc, col("doc_id").asc)
    val contrib = Caching.temp(qterms
      .join(tf.withColumn("crn", row_number().over(wc)), col("term") === col("tok"))
      .join(dfq, Seq("tok"))
      .join(dl, Seq("doc_id"))
      .crossJoin(stats)
      .select(col("query"), col("term"), col("doc_id"), col("crn"),
        expr(s"CAST((crn - 1) DIV $blockLen AS BIGINT)").as("blk"),
        floor(idf * (col("tf") * lit(K1 + 1)) / den * ScoreScale + 0.5)
          .cast("long").as("fp")))
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query")).orderBy(col("total").desc, col("doc_id").asc)
    val theta = Caching.temp(contrib.filter(col("crn") <= bootCap)
      .groupBy(col("query"), col("doc_id")).agg(sum(col("fp")).as("total"))
      .withColumn("rnk", row_number().over(wq))
      .filter(col("rnk") === k)
      .select(col("query"), col("total").as("theta")))
    val wcum = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query")).orderBy(col("ub").asc, col("term").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val terms = contrib.groupBy(col("query"), col("term"))
      .agg(max(col("fp")).as("ub"))
      .withColumn("cum", sum(col("ub")).over(wcum))
      .join(broadcast(theta), Seq("query"), "left")
      .withColumn("essential", col("cum") >= coalesce(col("theta"), lit(0L)))
    val cand = Caching.temp(contrib.join(
        terms.filter(col("essential")).select(col("query"), col("term")),
        Seq("query", "term"), "left_semi")
      .select(col("query"), col("doc_id")).distinct())
    // the block-max table + per-candidate bound: Σ over the doc's
    // postings of their block's maximum — total ≤ bound, so
    // bound < θ is an exact skip
    val bub = contrib.groupBy(col("query"), col("term"), col("blk"))
      .agg(max(col("fp")).as("bub"))
    val bound = contrib.join(cand, Seq("query", "doc_id"), "left_semi")
      .join(bub, Seq("query", "term", "blk"))
      .groupBy(col("query"), col("doc_id")).agg(sum(col("bub")).as("bound"))
    val candBm = Caching.temp(bound
      .join(broadcast(theta), Seq("query"), "left")
      .filter(col("bound") >= coalesce(col("theta"), lit(0L)))
      .select(col("query"), col("doc_id")))
    def topk(rows: DataFrame): DataFrame = rows
      .groupBy(col("query"), col("doc_id")).agg(sum(col("fp")).as("total"))
      .withColumn("rnk", row_number().over(wq))
      .filter(col("rnk") <= k)
      .select(col("query"), col("doc_id"))
    val exact = Caching.temp(topk(contrib))
    val pruned = topk(contrib.join(candBm, Seq("query", "doc_id"), "left_semi"))
    val hits = exact.join(pruned, Seq("query", "doc_id"))
      .groupBy(col("query")).agg(count(lit(1)).as("hits"))
    val nMatch = contrib.select(col("query"), col("doc_id")).distinct()
      .groupBy(col("query")).agg(count(lit(1)).as("n_matching"))
    val nCand = cand.groupBy(col("query")).agg(count(lit(1)).as("n_candidates"))
    val nCandBm = candBm.groupBy(col("query"))
      .agg(count(lit(1)).as("n_candidates_bm"))
    val nExact = exact.groupBy(col("query")).agg(count(lit(1)).as("n_exact"))
    nMatch.join(nCand, Seq("query")).join(nCandBm, Seq("query"), "left")
      .join(nExact, Seq("query")).join(hits, Seq("query"), "left")
      .select(col("query"), col("n_matching"), col("n_candidates"),
        coalesce(col("n_candidates_bm"), lit(0L)).as("n_candidates_bm"),
        Portable.round4(lit(1.0) - col("n_candidates").cast("double") /
          col("n_matching").cast("double")).as("pruned_frac"),
        Portable.round4(lit(1.0) -
          coalesce(col("n_candidates_bm"), lit(0L)).cast("double") /
          col("n_matching").cast("double")).as("pruned_frac_bm"),
        col("n_exact"), coalesce(col("hits"), lit(0L)).as("hits"))
  }

  /** RM3 feedback set size: round-1 top-k docs feed the relevance
    * model. */
  val Rm3FbDocs = 10
  /** RM3 expansion vocabulary: top-this-many feedback terms. */
  val Rm3FbTerms = 8
  /** Fixed-point grid for the relevance model and query weights. */
  val Rm3Scale = 10000L

  /** x227: RM3 PSEUDO-RELEVANCE-FEEDBACK QUERY EXPANSION (Lavrenko &
    * Croft '01 relevance models; the RM3 interpolation of Abdul-Jaleel
    * et al. '04 — the standard recall-boosting second pass every
    * research IR stack ships):
    *
    *  1. round 1 — plain x51 BM25, keep the top-[[Rm3FbDocs]] docs per
    *     query as the pseudo-relevant set R;
    *  2. relevance model — P(t|R) ∝ Σ_{d∈R} tf(t,d)/dl(d), each
    *     per-doc MLE snapped to the [[Rm3Scale]] grid BEFORE the
    *     integer sum (aggregation-order-free); keep the
    *     top-[[Rm3FbTerms]] terms by (mass desc, term asc) and
    *     normalize over exactly that set;
    *  3. RM3 interpolation at λ = 1/2 — w(t) = (worig(t) + pfb(t))/2
    *     on the grid, worig = uniform 1/|q| over the ORIGINAL terms,
    *     via a full outer join of the two term sets (original terms
    *     keep half their weight even when absent from the model;
    *     expansion terms enter at half their model mass);
    *  4. round 2 — BM25 postings re-scored with per-term weights:
    *     total = Σ w4(t) · fp(t,d) (BIGINT × BIGINT), top-k by
    *     (total desc, doc_id asc).
    *
    * The output carries `in_r1` (was the doc already in round 1's
    * top-k) so one hash pins both rounds AND the expansion's churn.
    *
    * Scale: R is |queries|·k rows (broadcast); the relevance model
    * reads only R's postings (doc_id-keyed join); round 2 is the x51
    * join shape with the expanded (still ≤ |q|+m per query, broadcast)
    * term batch — nothing new scales with the corpus. */
  def rm3Expand(documents: DataFrame, k: Int = TopK): DataFrame = {
    val s = documents.sparkSession
    import s.implicits._
    val qterms = broadcast(
      Queries.flatMap { case (q, ts) => ts.map(q -> _) }.toDF("query", "term"))
    val qlen = broadcast(
      Queries.map { case (q, ts) => (q, ts.size.toLong) }.toDF("query", "nq"))
    val tf = Caching.temp(TextAnalysis.docTermFreq(documents))
    val dl = Caching.temp(TextAnalysis.withTokens(documents)
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl")))
    val stats = broadcast(dl.agg(
      count(lit(1)).as("n_docs"), sum(col("dl")).as("total_toks")))
    val den = col("tf") + lit(K1) * (lit(1.0 - B) +
      lit(B) * (col("dl").cast("double") * col("n_docs") / col("total_toks")))
    def idfOf(dfc: Column) = log(lit(1.0) +
      (col("n_docs") - dfc + 0.5) / (dfc + 0.5))
    // round 1: the x51 scoring verbatim
    val dfq1 = tf.join(qterms.select(col("term").as("tok")).distinct(), Seq("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query")).orderBy(col("total").desc, col("doc_id").asc)
    val r1 = Caching.temp(qterms.join(tf, col("term") === col("tok"))
      .join(dfq1, Seq("tok"))
      .join(dl, Seq("doc_id"))
      .crossJoin(stats)
      .select(col("query"), col("doc_id"),
        floor(idfOf(col("df")) * (col("tf") * lit(K1 + 1)) / den * ScoreScale + 0.5)
          .cast("long").as("fp"))
      .groupBy(col("query"), col("doc_id"))
      .agg(sum(col("fp")).as("total"))
      .withColumn("rnk", row_number().over(wq))
      .filter(col("rnk") <= Rm3FbDocs)
      .select(col("query"), col("doc_id")))
    // relevance model over R's postings: per-doc grid MLE, integer sum
    val wm = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query")).orderBy(col("mass").desc, col("term").asc)
    val fbRaw = broadcast(r1).join(tf, Seq("doc_id"))
      .join(dl, Seq("doc_id"))
      .select(col("query"), col("tok").as("term"),
        floor(col("tf").cast("double") * Rm3Scale /
          col("dl").cast("double") + 0.5).cast("long").as("mle4"))
      .groupBy(col("query"), col("term"))
      .agg(sum(col("mle4")).as("mass"))
      .withColumn("mrn", row_number().over(wm))
      .filter(col("mrn") <= Rm3FbTerms)
    val fb = fbRaw
      .withColumn("tot", sum(col("mass")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query"))))
      .select(col("query"), col("term"),
        floor(col("mass").cast("double") * Rm3Scale /
          col("tot").cast("double") + 0.5).cast("long").as("pfb4"))
    // RM3 interpolation on the grid: full outer of original + feedback
    val orig = qterms.join(qlen, Seq("query"))
      .select(col("query"), col("term"),
        floor(lit(Rm3Scale).cast("double") / col("nq").cast("double") + 0.5)
          .cast("long").as("worig4"))
    val weights = broadcast(orig.join(fb, Seq("query", "term"), "full_outer")
      .select(col("query"), col("term"),
        floor((coalesce(col("worig4"), lit(0L)) +
          coalesce(col("pfb4"), lit(0L))).cast("double") / 2.0 + 0.5)
          .cast("long").as("w4")))
    // round 2: weighted BM25 over the expanded batch
    val dfq2 = tf.join(weights.select(col("term").as("tok")).distinct(), Seq("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
    weights.join(tf, col("term") === col("tok"))
      .join(dfq2, Seq("tok"))
      .join(dl, Seq("doc_id"))
      .crossJoin(stats)
      .select(col("query"), col("doc_id"),
        (col("w4") *
          floor(idfOf(col("df")) * (col("tf") * lit(K1 + 1)) / den * ScoreScale + 0.5)
            .cast("long")).as("wfp"))
      .groupBy(col("query"), col("doc_id"))
      .agg(sum(col("wfp")).as("total"))
      .withColumn("rnk", row_number().over(wq).cast("long"))
      .filter(col("rnk") <= k)
      .join(r1.withColumn("in_r1", lit(true)), Seq("query", "doc_id"), "left")
      .select(col("query"), col("doc_id"), col("rnk"),
        Portable.round4(col("total").cast("double") / (ScoreScale * Rm3Scale))
          .as("score"),
        coalesce(col("in_r1"), lit(false)).as("in_r1"))
  }

  /** x236: PROXIMITY-AUGMENTED BM25 — the x51 unigram ranking plus a
    * half-weight BM25 leg over the query's ADJACENT TERM PAIRS matched
    * against the document bigram stream (Metzler & Croft's sequential-
    * dependence reading, reduced to the ordered-window-1 feature): a
    * document where "spark join" appears as a phrase outranks one
    * where the words are scattered, which bag-of-words x51 cannot see.
    * combined = 2·Σ fp_uni + Σ fp_bi on the [[ScoreScale]] grid —
    * integer algebra for λ = ½ without leaving BIGINTs; bigram idf/tf
    * use the same formulas with the bigram df and the same dl
    * normalization.
    *
    * Scale: the bigram postings are one more explode + hash aggregate
    * over the same tokenize (the x38 bigram stream); the query-pair
    * batch broadcasts like the term batch; everything else is the x51
    * shape twice. */
  def proximityBm25(documents: DataFrame, k: Int = TopK): DataFrame = {
    val s = documents.sparkSession
    import s.implicits._
    val qterms = broadcast(
      Queries.flatMap { case (q, ts) => ts.map(q -> _) }.toDF("query", "term"))
    val qpairs = broadcast(
      Queries.flatMap { case (q, ts) =>
        ts.zip(ts.drop(1)).map { case (a, b) => (q, a, b) }
      }.toDF("query", "qw1", "qw2"))
    val tf = Caching.temp(TextAnalysis.docTermFreq(documents))
    val dl = Caching.temp(TextAnalysis.withTokens(documents)
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl")))
    val stats = broadcast(dl.agg(
      count(lit(1)).as("n_docs"), sum(col("dl")).as("total_toks")))
    def idfOf(dfc: Column) = log(lit(1.0) +
      (col("n_docs") - dfc + 0.5) / (dfc + 0.5))
    val den = col("tf") + lit(K1) * (lit(1.0 - B) +
      lit(B) * (col("dl").cast("double") * col("n_docs") / col("total_toks")))
    val dfq = tf.join(qterms.select(col("term").as("tok")).distinct(), Seq("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val uni = qterms.join(tf, col("term") === col("tok"))
      .join(dfq, Seq("tok"))
      .join(dl, Seq("doc_id"))
      .crossJoin(stats)
      .select(col("query"), col("doc_id"),
        (floor(idfOf(col("df")) * (col("tf") * lit(K1 + 1)) / den * ScoreScale
          + 0.5).cast("long") * 2L).as("wfp"))
    val btf = Caching.temp(TextAnalysis.docBigrams(documents)
      .join(qpairs.select(col("qw1").as("w1"), col("qw2").as("w2")).distinct(),
        Seq("w1", "w2"))
      .groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("tf")))
    val dfb = btf.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("df"))
    val bi = qpairs
      .join(btf, col("qw1") === col("w1") && col("qw2") === col("w2"))
      .join(dfb, Seq("w1", "w2"))
      .join(dl, Seq("doc_id"))
      .crossJoin(stats)
      .select(col("query"), col("doc_id"),
        floor(idfOf(col("df")) * (col("tf") * lit(K1 + 1)) / den * ScoreScale
          + 0.5).cast("long").as("wfp"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query")).orderBy(col("total").desc, col("doc_id").asc)
    uni.unionByName(bi)
      .groupBy(col("query"), col("doc_id"))
      .agg(sum(col("wfp")).as("total"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query"), col("doc_id"), col("rnk"),
        Portable.round4(col("total").cast("double") / (2L * ScoreScale))
          .as("score"))
  }

  /** x220 field split: the first this-many tokens are the TITLE
    * pseudo-field, the rest the BODY (a deterministic split standing
    * in for real document structure — web/docs corpora carry
    * title/anchor/body fields and the fixture does not). */
  val TitleTokens = 8
  /** BM25F field weights: a title hit counts double (Robertson &
    * Zaragoza '09 §6.2 — weighted field frequency, the standard
    * "structure beats bag-of-words" ranking upgrade). */
  val WTitle = 2.0
  val WBody = 1.0

  /** x220: BM25F FIELDED RETRIEVAL — the x51 workload ranked with
    * field structure: per-term WEIGHTED FIELD FREQUENCY
    * tf̃ = Σ_f w_f · tf_f / (1 − b + b · dl_f·N/Σdl_f) (each field
    * length-normalized against ITS OWN average length, then weighted
    * — the BM25F core), scored as idf · tf̃(k1+1)/(k1 + tf̃) with the
    * x51 idf on document-level df. A title hit outranks the same hit
    * buried in a long body, which is the whole point of fielded
    * ranking; read against x51 the rank deltas are exactly the docs
    * whose query terms sit in the first [[TitleTokens]] tokens.
    *
    * Determinism: tf̃ is ONE fixed expression (title leg + body leg,
    * integer tf/dl inputs, left-to-right) and the per-term
    * contribution snaps to the [[ScoreScale]] integer grid before the
    * per-(query, doc) sum — the x51 convention; ranking
    * (total desc, doc_id asc) is total.
    *
    * Scale: identical shape to x51 — the workload batch broadcasts,
    * only postings matching a query term leave the scan (field tfs
    * ride the same (doc, term) aggregate with two conditional sums),
    * one per-query top-k window. */
  def bm25fSearch(documents: DataFrame, k: Int = TopK): DataFrame = {
    val s = documents.sparkSession
    import s.implicits._
    val qterms = broadcast(
      Queries.flatMap { case (q, ts) => ts.map(q -> _) }.toDF("query", "term"))
    val toks = Caching.temp(TextAnalysis.withTokens(documents)
      .select(col("doc_id"), col("toks")))
    val tff = Caching.temp(toks
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "tok")))
      .groupBy(col("doc_id"), col("tok"))
      .agg(sum(when(col("pos") < TitleTokens, 1L).otherwise(0L)).as("tft"),
        sum(when(col("pos") >= TitleTokens, 1L).otherwise(0L)).as("tfb")))
    val dlf = toks.select(col("doc_id"),
      least(size(col("toks")), lit(TitleTokens)).cast("long").as("dlt"),
      greatest(size(col("toks")) - TitleTokens, lit(0)).cast("long").as("dlb"))
    val stats = broadcast(dlf.agg(count(lit(1)).as("n_docs"),
      sum(col("dlt")).as("tot_t"), sum(col("dlb")).as("tot_b")))
    val dfq = tff.join(qterms.select(col("term").as("tok")).distinct(), Seq("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    // an EMPTY field corpus-wide (tot_f = 0) contributes zero, not
    // 0/0 = NaN poisoning every score (ADVICE r8); with any tokens in
    // the field the guard is inert, so fixture hashes are unchanged
    val tfw = when(col("tot_t") > 0,
        col("tft").cast("double") * lit(WTitle) /
          (lit(1.0 - B) + lit(B) *
            (col("dlt").cast("double") * col("n_docs") / col("tot_t"))))
        .otherwise(lit(0.0)) +
      when(col("tot_b") > 0,
        col("tfb").cast("double") * lit(WBody) /
          (lit(1.0 - B) + lit(B) *
            (col("dlb").cast("double") * col("n_docs") / col("tot_b"))))
        .otherwise(lit(0.0))
    val contrib = qterms.join(tff, col("term") === col("tok"))
      .join(dfq, Seq("tok"))
      .join(dlf, Seq("doc_id"))
      .crossJoin(stats)
      .withColumn("tfw", tfw)
      .select(col("query"), col("doc_id"),
        floor(idf * (col("tfw") * lit(K1 + 1)) / (lit(K1) + col("tfw")) *
          ScoreScale + 0.5).cast("long").as("fp"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query")).orderBy(col("total").desc, col("doc_id").asc)
    contrib.groupBy(col("query"), col("doc_id"))
      .agg(sum(col("fp")).as("total"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query"), col("doc_id"),
        Portable.round4(col("total").cast("double") / ScoreScale).as("score"),
        col("rnk"))
  }
}
