package graft.pipelines

import graft.ops.{Dedup, Events, Multimodal, QualityFilters, Similarity, TextAnalysis}

/** DuckDB oracle SQL for the beyond-reference extension queries
  * (keys x1–x112), generated from the SAME Scala constants
  * the Spark
  * operators use ([[TextAnalysis.LangMarkers]], [[Dedup.NumHashes]],
  * [[Similarity.planeWeights]], …) so the two engines cannot drift.
  *
  * Cross-engine conventions (same as [[AnalogSql]], plus):
  *  - all hashing is md5 hex (identical in both engines); integer
  *    views of hashes go through Spark `conv(hex,16,10)` ≡ DuckDB
  *    `('0x'||hex)::BIGINT`;
  *  - doubles are sequential left-to-right folds rounded to 4dp
  *    before any comparison/ranking (Spark `aggregate` ≡ DuckDB
  *    `list_sum` over a comprehension);
  *  - money is integral cents; sums are CAST to BIGINT (DuckDB
  *    SUM(BIGINT) is HUGEINT);
  *  - DuckDB `regexp_replace` needs the 'g' flag to match Spark's
  *    replace-all semantics;
  *  - timestamps leave queries as epoch_ms BIGINT or hour-truncated
  *    VARCHAR, never raw timestamps.
  */
object ExtSql {

  private def strList(ws: Seq[String]): String =
    ws.map(w => s"'$w'").mkString("[", ", ", "]")

  // ---- shared text CTEs --------------------------------------------

  private val n = TextAnalysis.ShingleN

  /** doc_id, lang, text, toks (whitespace tokens, empties dropped). */
  private val toksCte =
    raw"""tok AS (
         |  SELECT doc_id, lang, text,
         |         list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS toks
         |  FROM documents)""".stripMargin

  /** + sh: distinct word n-shingles (empty when < n tokens). */
  private val shCte =
    raw"""shs AS (
         |  SELECT doc_id, toks,
         |         CASE WHEN len(toks) >= $n
         |              THEN list_distinct([array_to_string(toks[i+1:i+$n], ' ')
         |                                  for i in range(0, len(toks) - ${n - 1})])
         |              ELSE [] END AS sh
         |  FROM tok)""".stripMargin

  private val fpFull =
    raw"md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))"

  /** The x1/x17-shared quality-score SQL (must mirror
    * [[TextAnalysis.qualityScore]] bit-for-bit — single definition so
    * the two oracles cannot drift). */
  private val qualityScoreSql: String =
    """floor((least(1.0, n_tokens/100.0) * 0.4
      |             + (CASE WHEN n_tokens > 0
      |                     THEN n_stopwords / CAST(n_tokens AS DOUBLE) ELSE 0.0 END) * 0.3
      |             + (1.0 - CASE WHEN length(text) > 0
      |                     THEN n_punct / CAST(length(text) AS DOUBLE) ELSE 0.0 END) * 0.3)
      |             * 10000 + 0.5) / 10000 AS quality_score""".stripMargin

  /** [[qualityScoreSql]] as a bare expression (x210 re-snaps it to the
    * 1e-4 integer grid before aggregation). */
  private val qualityScoreSqlNoAlias: String =
    qualityScoreSql.stripSuffix(" AS quality_score")

  // ---- x1 text stats -----------------------------------------------

  private val x1 = {
    val stop = strList(TextAnalysis.Stopwords)
    raw"""WITH $toksCte
         |SELECT doc_id, lang, n_tokens, n_bpe_tokens, n_punct, n_stopwords,
         |       $qualityScoreSql
         |FROM (
         |  SELECT doc_id, lang, text,
         |         len(toks) AS n_tokens,
         |         len(regexp_extract_all(lower(text), '${TextAnalysis.BpePattern}')) AS n_bpe_tokens,
         |         len(regexp_extract_all(text, '${TextAnalysis.PunctPattern}')) AS n_punct,
         |         len(list_filter(toks, t -> list_contains($stop, t))) AS n_stopwords
         |  FROM tok)""".stripMargin
  }

  // ---- x2 language ID ----------------------------------------------

  private val x2 = {
    val langs = TextAnalysis.LangMarkers
    val hitCols = langs.map { case (l, ws) =>
      s"len(list_filter(toks, t -> list_contains(${strList(ws)}, t))) AS hits_$l"
    }.mkString(",\n         ")
    // same argmax-with-earlier-tie-break as TextAnalysis.langId
    val cases = langs.zipWithIndex.init.map { case ((l, _), i) =>
      val later = langs.drop(i + 1).map { case (l2, _) => s"hits_$l >= hits_$l2" }
      s"WHEN ${later.mkString(" AND ")} THEN '$l'"
    }.mkString("\n              ")
    raw"""WITH $toksCte
         |SELECT doc_id, lang,
         |       CASE $cases
         |            ELSE '${langs.last._1}' END AS pred_lang,
         |       ${langs.map { case (l, _) => s"hits_$l" }.mkString(", ")}
         |FROM (
         |  SELECT doc_id, lang,
         |         $hitCols
         |  FROM tok)""".stripMargin
  }

  // ---- x3 fingerprints ---------------------------------------------

  private val x3 =
    raw"""WITH $toksCte, $shCte
         |SELECT t.doc_id, $fpFull AS fp_full,
         |       list_aggregate([md5(s) for s in sh], 'min') AS fp_min_shingle,
         |       list_reduce(
         |         list_prepend(0::BIGINT,
         |           [('0x' || substr(md5(tk), 1, 4))::BIGINT for tk in t.toks]),
         |         (acc, x) -> (acc * 31 + x) % 2147483647) AS fp_rolling
         |FROM tok t JOIN shs USING (doc_id)""".stripMargin

  // ---- x4 exact dedup ----------------------------------------------

  private val x4 =
    raw"""SELECT $fpFull AS fp, min(doc_id) AS keep_doc_id,
         |       CAST(count(*) AS BIGINT) AS n_copies
         |FROM documents GROUP BY 1""".stripMargin

  // ---- x5 MinHash/LSH near-dup pairs -------------------------------

  private val jaccardExpr =
    "floor((len(list_intersect(l.sh, r.sh))::DOUBLE / len(list_distinct(l.sh || r.sh))) * 10000 + 0.5) / 10000"

  /** The x5 CTE chain (shared verbatim with the x30 cluster oracle). */
  private val x5Ctes = {
    val b = Dedup.Bands; val r = Dedup.RowsPerBand; val p = Dedup.HashPrime
    val mixes = Dedup.permConstants.map { case (a, off) =>
      s"list_aggregate([(h * $a + $off) % $p for h in hb], 'min')"
    }.mkString("[", ",\n         |          ", "]")
    raw"""$toksCte, $shCte,
         |dsh AS (SELECT doc_id, sh FROM shs WHERE len(sh) > 0),
         |hbt AS (
         |  SELECT doc_id, sh,
         |         [('0x' || substr(md5(s), 1, 15))::BIGINT % $p for s in sh] AS hb
         |  FROM dsh),
         |sig AS (
         |  SELECT doc_id, sh,
         |         $mixes AS sig
         |  FROM hbt),
         |bands0 AS (
         |  SELECT doc_id, sh, bi.b AS band_idx,
         |         md5(array_to_string(sig[bi.b*$r+1:bi.b*$r+$r], ',')) AS band_hash
         |  FROM sig, (SELECT unnest(range(0, $b)) AS b) bi),
         |bands AS (
         |  SELECT doc_id, sh, band_idx, band_hash FROM (
         |    SELECT *, count(*) OVER (PARTITION BY band_idx, band_hash) AS bucket_n
         |    FROM bands0)
         |  WHERE bucket_n <= ${Dedup.MaxBucket})""".stripMargin
  }

  private val x5Select =
    raw"""SELECT DISTINCT doc_a, doc_b, jaccard FROM (
         |  SELECT l.doc_id AS doc_a, r.doc_id AS doc_b, $jaccardExpr AS jaccard
         |  FROM bands l JOIN bands r
         |    ON l.band_idx = r.band_idx AND l.band_hash = r.band_hash
         |   AND l.doc_id < r.doc_id)
         |WHERE jaccard >= ${Dedup.JaccardThreshold}""".stripMargin

  private val x5 = s"WITH $x5Ctes\n$x5Select"

  // ---- x199 streaming near-dup ingest ------------------------------
  // Batch-equivalence oracle for the AvailableNow run: the arriving
  // slice's UNCAPPED bands (bands0 — membership probing is linear, the
  // MaxBucket cap only guards pair-mining self-joins) inner-joined
  // against the DISTINCT historical band store. The engine's streaming
  // query is stateless/row-wise, so the batch derivation is exact.

  private val x199 =
    raw"""WITH $x5Ctes,
         |hist AS (
         |  SELECT DISTINCT band_idx, band_hash FROM bands0
         |  WHERE doc_id % 3 <> 0)
         |SELECT a.doc_id, a.band_idx, a.band_hash
         |FROM (SELECT doc_id, band_idx, band_hash FROM bands0
         |      WHERE doc_id % 3 = 0) a
         |JOIN hist USING (band_idx, band_hash)""".stripMargin

  // ---- x6/x7 SimHash -----------------------------------------------

  private def simhashExpr(vals: String): String =
    (0 until Dedup.SimHashBits).map { j =>
      s"CASE WHEN len(list_filter($vals, v -> (v >> $j) % 2 = 1)) * 2 > len($vals) THEN ${1L << j} ELSE 0 END"
    }.mkString("(", "\n           + ", ")")

  private val simhashSigCte =
    raw"""tv AS (
         |  SELECT doc_id, [('0x' || substr(md5(t), 1, 4))::BIGINT for t in toks] AS vals
         |  FROM tok WHERE len(toks) > 0),
         |ssig AS (
         |  SELECT doc_id, ${simhashExpr("vals")} AS simhash, len(vals) AS n_tokens
         |  FROM tv)""".stripMargin

  private val x6 =
    raw"""WITH $toksCte, $simhashSigCte
         |SELECT doc_id, CAST(simhash AS BIGINT) AS simhash, n_tokens FROM ssig""".stripMargin

  private val x7 = {
    val blockBits = Dedup.SimHashBits / Dedup.SimHashBlocks
    val widths = (0 until Dedup.SimHashBlocks).map { b =>
      if (b == Dedup.SimHashBlocks - 1) Dedup.SimHashBits - b * blockBits else blockBits
    }
    val widthCase = widths.zipWithIndex
      .map { case (w, b) => s"WHEN $b THEN ${1L << w}" }.mkString(" ")
    raw"""WITH $toksCte, $simhashSigCte,
         |blocks AS (
         |  SELECT doc_id, simhash, bi.b AS block_idx,
         |         (simhash >> (bi.b * $blockBits)) % (CASE bi.b $widthCase END) AS block_val
         |  FROM ssig, (SELECT unnest(range(0, ${Dedup.SimHashBlocks})) AS b) bi)
         |SELECT DISTINCT doc_a, doc_b, hamming FROM (
         |  SELECT l.doc_id AS doc_a, r.doc_id AS doc_b,
         |         CAST(bit_count(xor(l.simhash, r.simhash)) AS BIGINT) AS hamming
         |  FROM blocks l JOIN blocks r
         |    ON l.block_idx = r.block_idx AND l.block_val = r.block_val
         |   AND l.doc_id < r.doc_id)
         |WHERE hamming <= ${Dedup.HammingMax}""".stripMargin
  }

  // ---- shared vector CTEs ------------------------------------------

  private val dim = Similarity.Dim

  private val vecCte =
    raw"""vn AS (
         |  SELECT vec_id, v, sqrt(list_sum([x*x for x in v])) AS nrm
         |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings))""".stripMargin

  private def dotExpr(a: String, b: String): String =
    s"list_sum([$a[i] * $b[i] for i in range(1, ${dim + 1})])"

  private def cosExpr(a: String, an: String, b: String, bn: String): String =
    s"floor((${dotExpr(a, b)} / ($an * $bn)) * 10000 + 0.5) / 10000"

  // ---- x8 brute embedding near-dup (sampled: vec_id % 2 = 0) -------

  private val x8 =
    raw"""WITH $vecCte,
         |s AS (SELECT * FROM vn WHERE vec_id % 2 = 0)
         |SELECT * FROM (
         |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |         ${cosExpr("a.v", "a.nrm", "b.v", "b.nrm")} AS cos_sim
         |  FROM s a JOIN s b ON a.vec_id < b.vec_id)
         |WHERE cos_sim >= ${Similarity.CosineThreshold}""".stripMargin

  // ---- x9 hyperplane-LSH embedding near-dup ------------------------

  private val x9 = {
    def wLit(p: Int): String =
      Similarity.planeWeights(p).map(w => if (w > 0) "1.0" else "-1.0")
        .mkString("([", ",", "]::DOUBLE[])")
    val bucketExprs = (0 until Similarity.LshTables).map { t =>
      (0 until Similarity.LshBitsPerTable).map { i =>
        val w = wLit(t * Similarity.LshBitsPerTable + i)
        s"CASE WHEN ${dotExpr(w, "v")} > 0 THEN ${1 << i} ELSE 0 END"
      }.mkString("(", " + ", s") AS b$t")
    }.mkString(",\n         ")
    val unions = (0 until Similarity.LshTables).map { t =>
      s"SELECT vec_id, v, nrm, $t AS tbl, b$t AS bucket FROM vb"
    }.mkString("\n  UNION ALL ")
    raw"""WITH $vecCte,
         |vb AS (
         |  SELECT vec_id, v, nrm,
         |         $bucketExprs
         |  FROM vn),
         |tagged AS (
         |  $unions)
         |SELECT DISTINCT vec_a, vec_b, cos_sim FROM (
         |  SELECT l.vec_id AS vec_a, r.vec_id AS vec_b,
         |         ${cosExpr("l.v", "l.nrm", "r.v", "r.nrm")} AS cos_sim
         |  FROM tagged l JOIN tagged r
         |    ON l.tbl = r.tbl AND l.bucket = r.bucket AND l.vec_id < r.vec_id)
         |WHERE cos_sim >= ${Similarity.CosineThreshold}""".stripMargin
  }

  // ---- x10 brute ANN top-k -----------------------------------------

  private val x10 =
    raw"""WITH $vecCte,
         |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM vn
         |      WHERE vec_id % ${Similarity.QueryStride} = 0)
         |SELECT q_id, vec_id, cos_sim, rnk FROM (
         |  SELECT q_id, vec_id, cos_sim,
         |         row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) AS rnk
         |  FROM (
         |    SELECT q_id, vec_id, ${cosExpr("qv", "qn", "v", "nrm")} AS cos_sim
         |    FROM q CROSS JOIN vn WHERE q_id <> vec_id))
         |WHERE rnk <= ${Similarity.TopK}""".stripMargin

  // ---- x11 IVF top-k with a learned (k-means) quantizer ------------

  // nearest-centroid assignment from centroid table `c` (cid, cv)
  private def assignCte(cents: String, out: String): String =
    raw"""$out AS (
         |  SELECT vec_id, cid AS cell FROM (
         |    SELECT vn.vec_id, c.cid,
         |           row_number() OVER (PARTITION BY vn.vec_id
         |             ORDER BY ${cosExpr("vn.v", "vn.nrm", "c.cv", "c.cn")} DESC, c.cid) AS rn
         |    FROM vn CROSS JOIN
         |      (SELECT cid, cv, sqrt(list_sum([x*x for x in cv])) AS cn FROM $cents) c)
         |  WHERE rn = 1)""".stripMargin

  /** Shared k-means CTE chain (x11 IVF + x52 semantic dedup): vn →
    * deterministic seeds → [[Similarity.KmeansIters]] Lloyd steps →
    * final assignment → `cand(vec_id, v, nrm, cell)`. Mirrors
    * [[Similarity.kmeansCentroids]]/`assignCells` exactly; the final
    * centroid table is `cent<iters>`. */
  private val kmeansCandCtes: String = {
    val K = Similarity.KmeansK; val stride = Similarity.SeedStride
    val iters = Similarity.KmeansIters
    val scale = Similarity.CentroidScale
    // one Lloyd step: fixed-point per-(cell, dim) means; empty cells
    // keep their previous centroid (same semantics as Similarity.lloydStep)
    def stepCtes(i: Int): String =
      raw"""${assignCte(s"cent$i", s"assign$i")},
           |sums$i AS (
           |  SELECT a.cell, u.d AS dim,
           |         CAST(sum(CAST(floor(u.x * $scale) AS BIGINT)) AS BIGINT) AS cs,
           |         count(*) AS n
           |  FROM assign$i a JOIN vn USING (vec_id),
           |       unnest([{'d': i-1, 'x': v[i]} for i in range(1, len(v)+1)]) AS t(u)
           |  GROUP BY 1, 2),
           |newc$i AS (
           |  SELECT cell AS cid, list(cs::DOUBLE / (n * $scale)::DOUBLE ORDER BY dim) AS cv
           |  FROM sums$i GROUP BY 1),
           |cent${i + 1} AS (
           |  SELECT o.cid, coalesce(nu.cv, o.cv) AS cv
           |  FROM cent$i o LEFT JOIN newc$i nu USING (cid))""".stripMargin
    raw"""$vecCte,
         |cent0 AS (
         |  SELECT vec_id // $stride AS cid, v AS cv FROM vn
         |  WHERE vec_id % $stride = 0 AND vec_id < ${stride.toLong * K}),
         |${(0 until iters).map(stepCtes).mkString(",\n")},
         |${assignCte(s"cent$iters", "assignf")},
         |cand AS (
         |  SELECT vn.vec_id, vn.v, vn.nrm, a.cell
         |  FROM vn JOIN assignf a USING (vec_id))""".stripMargin
  }

  private val x11 = {
    val iters = Similarity.KmeansIters; val np = Similarity.NProbe
    raw"""WITH $kmeansCandCtes,
         |probes AS (
         |  SELECT q_id, qv, qn, cell FROM (
         |    SELECT vn.vec_id AS q_id, vn.v AS qv, vn.nrm AS qn, c.cid AS cell,
         |           row_number() OVER (PARTITION BY vn.vec_id
         |             ORDER BY ${cosExpr("vn.v", "vn.nrm", "c.cv", "c.cn")} DESC, c.cid) AS crnk
         |    FROM vn CROSS JOIN
         |      (SELECT cid, cv, sqrt(list_sum([x*x for x in cv])) AS cn FROM cent$iters) c
         |    WHERE vn.vec_id % ${Similarity.QueryStride} = 0)
         |  WHERE crnk <= $np)
         |SELECT q_id, vec_id, cos_sim, rnk FROM (
         |  SELECT q_id, vec_id, cos_sim,
         |         row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) AS rnk
         |  FROM (
         |    SELECT p.q_id, cand.vec_id, ${cosExpr("p.qv", "p.qn", "cand.v", "cand.nrm")} AS cos_sim
         |    FROM probes p JOIN cand USING (cell) WHERE p.q_id <> cand.vec_id))
         |WHERE rnk <= ${Similarity.TopK}""".stripMargin
  }

  // ---- x235 filtered ANN (pre- vs post-filter recall audit) --------
  // Mirrors Similarity.filteredAnnRecallFrom exactly: the x11 chain
  // with a label-parity predicate applied inside the candidate scan
  // (pre), after an oversampled unfiltered cut (post), and on the
  // exact brute baseline; overlap@k per probe for both legs.

  private lazy val x235 = {
    import graft.ops.Similarity.{KmeansIters, NProbe, QueryStride, TopK,
      FilterOversample}
    raw"""WITH $kmeansCandCtes,
         |lb AS (SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings),
         |probes AS MATERIALIZED (
         |  SELECT q_id, qv, qn, plab, cell FROM (
         |    SELECT vn.vec_id AS q_id, vn.v AS qv, vn.nrm AS qn,
         |           l.label AS plab, c.cid AS cell,
         |           row_number() OVER (PARTITION BY vn.vec_id
         |             ORDER BY ${cosExpr("vn.v", "vn.nrm", "c.cv", "c.cn")}
         |               DESC, c.cid) AS crnk
         |    FROM vn JOIN lb l USING (vec_id) CROSS JOIN
         |      (SELECT cid, cv, sqrt(list_sum([x*x for x in cv])) AS cn
         |       FROM cent$KmeansIters) c
         |    WHERE vn.vec_id % $QueryStride = 0)
         |  WHERE crnk <= $NProbe),
         |scored AS MATERIALIZED (
         |  SELECT p.q_id, p.plab, cand.vec_id, l.label,
         |         ${cosExpr("p.qv", "p.qn", "cand.v", "cand.nrm")} AS cos_sim
         |  FROM probes p JOIN cand USING (cell)
         |       JOIN lb l ON l.vec_id = cand.vec_id
         |  WHERE p.q_id <> cand.vec_id),
         |pre AS (
         |  SELECT q_id, vec_id FROM (
         |    SELECT q_id, vec_id,
         |           row_number() OVER (PARTITION BY q_id
         |             ORDER BY cos_sim DESC, vec_id) AS rnk
         |    FROM scored WHERE label % 2 = plab % 2)
         |  WHERE rnk <= $TopK),
         |post AS (
         |  SELECT q_id, vec_id FROM (
         |    SELECT q_id, vec_id,
         |           row_number() OVER (PARTITION BY q_id ORDER BY rnk) AS rr
         |    FROM (SELECT q_id, vec_id, label, plab,
         |                 row_number() OVER (PARTITION BY q_id
         |                   ORDER BY cos_sim DESC, vec_id) AS rnk
         |          FROM scored)
         |    WHERE rnk <= ${TopK * FilterOversample} AND label % 2 = plab % 2)
         |  WHERE rr <= $TopK),
         |pq AS (
         |  SELECT vn.vec_id AS q_id, vn.v AS qv, vn.nrm AS qn, l.label AS plab
         |  FROM vn JOIN lb l USING (vec_id) WHERE vn.vec_id % $QueryStride = 0),
         |ex AS MATERIALIZED (
         |  SELECT q_id, vec_id FROM (
         |    SELECT p.q_id, c.vec_id,
         |           row_number() OVER (PARTITION BY p.q_id
         |             ORDER BY ${cosExpr("p.qv", "p.qn", "c.v", "c.nrm")}
         |               DESC, c.vec_id) AS rnk
         |    FROM pq p, (SELECT vn.vec_id, vn.v, vn.nrm, l.label
         |                FROM vn JOIN lb l USING (vec_id)) c
         |    WHERE p.q_id <> c.vec_id AND c.label % 2 = p.plab % 2)
         |  WHERE rnk <= $TopK),
         |nx AS (SELECT q_id, CAST(count(*) AS BIGINT) AS n_exact
         |       FROM ex GROUP BY 1),
         |ph AS (SELECT e.q_id, CAST(count(*) AS BIGINT) AS pre_hits
         |       FROM ex e JOIN pre p ON p.q_id = e.q_id AND p.vec_id = e.vec_id
         |       GROUP BY 1),
         |oh AS (SELECT e.q_id, CAST(count(*) AS BIGINT) AS post_hits
         |       FROM ex e JOIN post p ON p.q_id = e.q_id AND p.vec_id = e.vec_id
         |       GROUP BY 1)
         |SELECT n.q_id, n.n_exact,
         |       CAST(coalesce(ph.pre_hits, 0) AS BIGINT) AS pre_hits,
         |       CAST(coalesce(oh.post_hits, 0) AS BIGINT) AS post_hits,
         |       ${round4("coalesce(ph.pre_hits, 0)::DOUBLE / n.n_exact::DOUBLE")}
         |         AS recall_pre,
         |       ${round4("coalesce(oh.post_hits, 0)::DOUBLE / n.n_exact::DOUBLE")}
         |         AS recall_post
         |FROM nx n LEFT JOIN ph USING (q_id) LEFT JOIN oh USING (q_id)""".stripMargin
  }

  // ---- x200 IVF-PQ recall / x218 re-rank chain ---------------------
  // Mirrors Similarity.ivfPqRecall exactly: unit vectors → per-subspace
  // deterministic-seed Lloyd codebooks (fixed-point means — the x11
  // convention, with the subspace id as an extra grouping key) → PQ
  // codes → IVF-probed ADC ranking on 1e-12-grid integer LUT entries →
  // recall@k against the x10 brute baseline.

  private def pqChain(shortK: Int): String = {
    val M = Similarity.PqM; val sub = Similarity.PqSubDim
    val ksub = Similarity.PqKsub; val iters = Similarity.PqIters
    val stride = Similarity.SeedStride; val scale = Similarity.CentroidScale
    val np = Similarity.NProbe
    val qs = Similarity.QueryStride; val ki = Similarity.KmeansIters
    def d2(a: String, b: String): String =
      s"list_sum([($a[i] - $b[i]) * ($a[i] - $b[i]) for i in range(1, $sub + 1)])"
    // one PQ Lloyd step: assignment by (L2 asc, cid asc), then
    // per-(m, code, dim) fixed-point means; empty codewords keep old
    def pqAssignCte(books: String, out: String): String =
      raw"""$out AS MATERIALIZED (
           |  SELECT vec_id, m, cid AS code FROM (
           |    SELECT vh.vec_id, b.m, b.cid,
           |           row_number() OVER (PARTITION BY vh.vec_id, b.m
           |             ORDER BY ${d2(s"vh.w[b.m*$sub+1 : b.m*$sub+$sub]", "b.cv")}, b.cid) AS rn
           |    FROM vh CROSS JOIN $books b)
           |  WHERE rn = 1)""".stripMargin
    def stepCtes(i: Int): String =
      raw"""${pqAssignCte(s"pb$i", s"pqa$i")},
           |pqs$i AS (
           |  SELECT m, code, u.d AS dim,
           |         CAST(sum(CAST(floor(u.x * $scale) AS BIGINT)) AS BIGINT) AS cs,
           |         count(*) AS n
           |  FROM (SELECT a.m, a.code, vh.w[a.m*$sub+1 : a.m*$sub+$sub] AS swv
           |        FROM pqa$i a JOIN vh USING (vec_id)),
           |       unnest([{'d': i-1, 'x': swv[i]} for i in range(1, len(swv) + 1)]) AS t(u)
           |  GROUP BY 1, 2, 3),
           |pqn$i AS (
           |  SELECT m, code AS cid,
           |         list(cs::DOUBLE / (n * $scale)::DOUBLE ORDER BY dim) AS cv
           |  FROM pqs$i GROUP BY 1, 2),
           |pb${i + 1} AS MATERIALIZED (
           |  SELECT o.m, o.cid, coalesce(nu.cv, o.cv) AS cv
           |  FROM pb$i o LEFT JOIN pqn$i nu USING (m, cid))""".stripMargin
    raw"""WITH $kmeansCandCtes,
         |vh AS MATERIALIZED (
         |  SELECT vec_id, [v[i] / nrm for i in range(1, ${dim + 1})] AS w FROM vn),
         |pb0 AS MATERIALIZED (
         |  SELECT mm.m, vec_id // $stride AS cid,
         |         w[mm.m*$sub+1 : mm.m*$sub+$sub] AS cv
         |  FROM vh, (SELECT unnest(range(0, $M)) AS m) mm
         |  WHERE vec_id % $stride = 0 AND vec_id < ${stride.toLong * ksub}),
         |${(0 until iters).map(stepCtes).mkString(",\n")},
         |${pqAssignCte(s"pb$iters", "codes")},
         |pqprobes AS MATERIALIZED (
         |  SELECT q_id, cell FROM (
         |    SELECT vn.vec_id AS q_id, c.cid AS cell,
         |           row_number() OVER (PARTITION BY vn.vec_id
         |             ORDER BY ${cosExpr("vn.v", "vn.nrm", "c.cv", "c.cn")} DESC, c.cid) AS crnk
         |    FROM vn CROSS JOIN
         |      (SELECT cid, cv, sqrt(list_sum([x*x for x in cv])) AS cn FROM cent$ki) c
         |    WHERE vn.vec_id % $qs = 0)
         |  WHERE crnk <= $np),
         |lut AS MATERIALIZED (
         |  SELECT q.vec_id AS q_id, b.m, b.cid AS code,
         |         CAST(floor(${d2(s"q.w[b.m*$sub+1 : b.m*$sub+$sub]", "b.cv")}
         |                    * 1e12 + 0.5) AS BIGINT) AS pd12
         |  FROM (SELECT vec_id, w FROM vh WHERE vec_id % $qs = 0) q
         |       CROSS JOIN pb$iters b),
         |adc AS MATERIALIZED (
         |  SELECT p.q_id, c.vec_id, CAST(sum(l.pd12) AS BIGINT) AS ad
         |  FROM pqprobes p JOIN cand c ON p.cell = c.cell AND p.q_id <> c.vec_id
         |       JOIN codes USING (vec_id)
         |       JOIN lut l ON l.q_id = p.q_id AND l.m = codes.m AND l.code = codes.code
         |  GROUP BY 1, 2),
         |pqtop AS MATERIALIZED (
         |  SELECT q_id, vec_id FROM (
         |    SELECT q_id, vec_id,
         |           row_number() OVER (PARTITION BY q_id ORDER BY ad, vec_id) AS rnk
         |    FROM adc)
         |  WHERE rnk <= $shortK)""".stripMargin
  }

  /** Shared recall tail: overlap of `leg` against the exact brute
    * baseline (the x190 shape — every index audit ends here). */
  private def bruteRecallTail(leg: String): String = {
    val k = Similarity.TopK; val qs = Similarity.QueryStride
    raw"""brute AS MATERIALIZED (
         |  SELECT q_id, vec_id FROM (
         |    SELECT q_id, vec_id,
         |           row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) AS rnk
         |    FROM (
         |      SELECT q.vec_id AS q_id, vn.vec_id,
         |             ${cosExpr("q.v", "q.nrm", "vn.v", "vn.nrm")} AS cos_sim
         |      FROM (SELECT * FROM vn WHERE vec_id % $qs = 0) q CROSS JOIN vn
         |      WHERE q.vec_id <> vn.vec_id))
         |  WHERE rnk <= $k),
         |common AS (
         |  SELECT b.q_id, count(*) AS n_common
         |  FROM brute b JOIN $leg USING (q_id, vec_id) GROUP BY 1)
         |SELECT b.q_id, CAST(count(*) AS BIGINT) AS n_brute,
         |       CAST(coalesce(any_value(c.n_common), 0) AS BIGINT) AS n_common,
         |       ${round4(s"coalesce(any_value(c.n_common), 0)::DOUBLE / $k")} AS recall
         |FROM brute b LEFT JOIN common c USING (q_id)
         |GROUP BY 1""".stripMargin
  }

  private lazy val x200 =
    raw"""${pqChain(Similarity.TopK)},
         |${bruteRecallTail("pqtop")}""".stripMargin

  // ---- x218 PQ re-rank refinement ----------------------------------
  // Mirrors Similarity.pqRerankRecall: the x200 chain with the ADC cut
  // widened to k*RerankFactor, then the short-list re-ranked by exact
  // cosine (cos desc, vec_id) and cut to k before the recall tail.

  private lazy val x218 = {
    val k = Similarity.TopK
    raw"""${pqChain(k * Similarity.RerankFactor)},
         |rer AS MATERIALIZED (
         |  SELECT q_id, vec_id FROM (
         |    SELECT t.q_id, t.vec_id,
         |           row_number() OVER (PARTITION BY t.q_id
         |             ORDER BY ${cosExpr("q.v", "q.nrm", "v2.v", "v2.nrm")} DESC,
         |                      t.vec_id) AS rnk
         |    FROM pqtop t JOIN vn v2 ON v2.vec_id = t.vec_id
         |         JOIN vn q ON q.vec_id = t.q_id)
         |  WHERE rnk <= $k),
         |${bruteRecallTail("rer")}""".stripMargin
  }

  // ---- x259 binary-quantization re-rank recall ------------------------
  // Mirrors Similarity.bqRerankRecall: 64-bit sign words, Hamming
  // stage 1 cut at k*RerankFactor, exact-cosine re-rank to k, the
  // x218 recall tail.

  private lazy val x259 = {
    val k = Similarity.TopK
    val f = Similarity.RerankFactor
    val qs = Similarity.QueryStride
    raw"""WITH $vecCte,
         |bw AS (
         |  -- DuckDB's << checks overflow, so bit 63 (the sign bit the
         |  -- engine reaches by two's-complement shiftleft) is spelled
         |  -- as the BIGINT minimum literal
         |  SELECT vec_id,
         |         CAST(list_sum([CASE WHEN v[d+1] <= 0.0 THEN 0::BIGINT
         |                             WHEN d = 63
         |                               THEN -9223372036854775807 - 1
         |                             ELSE (1::BIGINT << d) END
         |                        for d in range(0, $dim)]) AS BIGINT) AS w64
         |  FROM vn),
         |sl AS (
         |  SELECT q_id, vec_id FROM (
         |    SELECT q.vec_id AS q_id, c.vec_id,
         |           row_number() OVER (PARTITION BY q.vec_id
         |             ORDER BY bit_count(xor(q.w64, c.w64)) ASC,
         |                      c.vec_id ASC) AS rnk
         |    FROM (SELECT * FROM bw WHERE vec_id % $qs = 0) q
         |    CROSS JOIN bw c
         |    WHERE q.vec_id <> c.vec_id)
         |  WHERE rnk <= ${k * f}),
         |rer AS MATERIALIZED (
         |  SELECT q_id, vec_id FROM (
         |    SELECT t.q_id, t.vec_id,
         |           row_number() OVER (PARTITION BY t.q_id
         |             ORDER BY ${cosExpr("q.v", "q.nrm", "v2.v", "v2.nrm")} DESC,
         |                      t.vec_id) AS rnk
         |    FROM sl t JOIN vn v2 ON v2.vec_id = t.vec_id
         |         JOIN vn q ON q.vec_id = t.q_id)
         |  WHERE rnk <= $k),
         |${bruteRecallTail("rer")}""".stripMargin
  }

  // ---- x12/x13 multimodal ------------------------------------------

  /** png-class docs (md5 nibble % 3 = 1) are wrapped as real PNG files
    * and webp-class docs (nibble % 3 = 2) as real RIFF/VP8L files by
    * [[Multimodal.mediaTable]] — the headers add
    * [[Multimodal.PngHeaderLen]] / [[Multimodal.WebpHeaderLen]] bytes
    * and the decoder byte-parses the embedded dims; the jpeg class
    * carries the raw payload and hits the declared stub. Dimensions
    * derive from the PAYLOAD length in all paths (the real-header ones
    * because mediaTable embeds exactly these values, which the decoder
    * then reads back). */
  private val mediaCte = {
    val hdr = Multimodal.PngHeaderLen
    val whdr = Multimodal.WebpHeaderLen
    val jhdr = Multimodal.JpegHeaderLen
    raw"""media AS (
         |  SELECT doc_id,
         |         CASE WHEN fclass = 1 THEN CAST(tlen + $hdr AS BIGINT)
         |              WHEN fclass = 2 THEN CAST(tlen + $whdr AS BIGINT)
         |              ELSE CAST(tlen + $jhdr AS BIGINT) END AS n_bytes,
         |         CASE fclass WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png'
         |              ELSE 'webp' END AS fmt,
         |         CAST(16 + tlen % 640 AS BIGINT) AS width,
         |         CAST(16 + (tlen * 7) % 480 AS BIGINT) AS height
         |  FROM (SELECT doc_id, octet_length(encode(text)) AS tlen,
         |               (('0x' || substr(md5(text), 1, 1))::INT % 3) AS fclass
         |        FROM documents))""".stripMargin
  }

  private val x12 =
    raw"""WITH $mediaCte
         |SELECT doc_id, n_bytes, fmt, width, height,
         |       1 + n_bytes // 256 AS n_frames,
         |       width // 2 AS thumb_w,
         |       height // 2 AS thumb_h
         |FROM media""".stripMargin

  private val x13 =
    raw"""WITH $mediaCte
         |SELECT doc_id, fmt, frame_idx,
         |       md5(doc_id::VARCHAR || ':' || frame_idx::VARCHAR) AS frame_fp
         |FROM (
         |  SELECT doc_id, fmt,
         |         unnest(range(0, 1 + n_bytes // 256, ${Multimodal.SampleEvery})) AS frame_idx
         |  FROM media)""".stripMargin

  // ---- x242/x243 perceptual image hash + near-dup pairs -------------
  // Mirrors Multimodal.ahashFrames/ahashNearDupPairs from the raw
  // table: the engine detects the container format from MAGIC BYTES
  // and strips its header off the binary column; the oracle exploits
  // the fixture identity payload = utf8(text) and re-derives the same
  // 64-cell mean-threshold signature, 16-bit banding, XOR popcounts
  // and threshold — integer cross-multiplied bits, so both engines
  // decide every bit from the same exact integers.

  private val ahashCte = {
    val bits = Multimodal.AHashBits
    raw"""sig AS (
         |  SELECT doc_id,
         |         CASE fclass WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png'
         |              ELSE 'webp' END AS fmt,
         |         CAST(n AS BIGINT) AS n_bytes,
         |         [CAST(list_sum([CASE WHEN cells[k*16 + r + 1].s * n
         |                                   > total * cells[k*16 + r + 1].cnt
         |                              THEN (1::BIGINT << r) ELSE 0::BIGINT END
         |                         for r in range(0, 16)]) AS BIGINT)
         |          for k in range(0, ${Multimodal.AHashBands})] AS words
         |  FROM (
         |    SELECT doc_id, fclass, n, cells,
         |           list_sum([x.s for x in cells]) AS total
         |    FROM (
         |      SELECT doc_id, fclass, n,
         |             [{'cnt': ((i+1)*n)//$bits - (i*n)//$bits,
         |               's': coalesce(list_sum([ord(substr(text, j+1, 1))
         |                     for j in range((i*n)//$bits, ((i+1)*n)//$bits)]), 0)}
         |              for i in range(0, $bits)] AS cells
         |      FROM (SELECT doc_id, text, octet_length(encode(text)) AS n,
         |                   (('0x' || substr(md5(text), 1, 1))::INT % 3) AS fclass
         |            FROM documents)
         |      WHERE n >= $bits)))""".stripMargin
  }

  private val x242 =
    raw"""WITH $ahashCte
         |SELECT doc_id, fmt, n_bytes,
         |       printf('%04x%04x%04x%04x',
         |              words[4], words[3], words[2], words[1]) AS ahash
         |FROM sig""".stripMargin

  private val x243 =
    raw"""WITH $ahashCte,
         |b AS (SELECT doc_id, words, k AS band_idx, words[k+1] AS band_val
         |      FROM sig, range(0, ${Multimodal.AHashBands}) t(k))
         |SELECT doc_a, doc_b, hamming FROM (
         |  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b,
         |         CAST(list_sum([bit_count(xor(l.words[k+1], r.words[k+1]))
         |                        for k in range(0, ${Multimodal.AHashBands})])
         |              AS BIGINT) AS hamming
         |  FROM b l JOIN b r ON l.band_idx = r.band_idx
         |                   AND l.band_val = r.band_val
         |                   AND l.doc_id < r.doc_id)
         |WHERE hamming <= ${Multimodal.AHashHammingMax}""".stripMargin

  // ---- x247/x248 audio energy fingerprint + near-dup pairs ----------
  // Mirrors Multimodal.audioFingerprints/audioNearDupPairs: the engine
  // parses the WAV container off the binary column and decodes signed
  // LE16 PCM; the oracle exploits payload = utf8(text) and re-derives
  // the same signed samples (the x77 byte convention), 64-cell energy
  // grid, banding, popcounts and threshold.

  private val audioFpCte = {
    val bits = Multimodal.AHashBits
    val v = "CASE WHEN ord(substr(text, 2*j + 2, 1)) >= 128 " +
      "THEN ord(substr(text, 2*j + 1, 1)) + 256*ord(substr(text, 2*j + 2, 1)) - 65536 " +
      "ELSE ord(substr(text, 2*j + 1, 1)) + 256*ord(substr(text, 2*j + 2, 1)) END"
    raw"""sig AS (
         |  SELECT doc_id, CAST(n AS BIGINT) AS n_samples,
         |         [CAST(list_sum([CASE WHEN cells[k*16 + r + 1].s * n
         |                                   > total * cells[k*16 + r + 1].cnt
         |                              THEN (1::BIGINT << r) ELSE 0::BIGINT END
         |                         for r in range(0, 16)]) AS BIGINT)
         |          for k in range(0, ${Multimodal.AHashBands})] AS words
         |  FROM (
         |    SELECT doc_id, n, cells,
         |           list_sum([x.s for x in cells]) AS total
         |    FROM (
         |      SELECT doc_id, n,
         |             [{'cnt': ((i+1)*n)//$bits - (i*n)//$bits,
         |               's': coalesce(list_sum([samples[j+1]*samples[j+1]
         |                     for j in range((i*n)//$bits, ((i+1)*n)//$bits)]), 0)}
         |              for i in range(0, $bits)] AS cells
         |      FROM (
         |        SELECT doc_id, n,
         |               [$v for j in range(0, CAST(n AS INT))] AS samples
         |        FROM (SELECT doc_id, text,
         |                     octet_length(encode(text)) // 2 AS n
         |              FROM documents)
         |        WHERE n >= $bits))))""".stripMargin
  }

  private val x247 =
    raw"""WITH $audioFpCte
         |SELECT doc_id, n_samples,
         |       printf('%04x%04x%04x%04x',
         |              words[4], words[3], words[2], words[1]) AS fp
         |FROM sig""".stripMargin

  private val x248 =
    raw"""WITH $audioFpCte,
         |b AS (SELECT doc_id, words, k AS band_idx, words[k+1] AS band_val
         |      FROM sig, range(0, ${Multimodal.AHashBands}) t(k))
         |SELECT doc_a, doc_b, hamming FROM (
         |  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b,
         |         CAST(list_sum([bit_count(xor(l.words[k+1], r.words[k+1]))
         |                        for k in range(0, ${Multimodal.AHashBands})])
         |              AS BIGINT) AS hamming
         |  FROM b l JOIN b r ON l.band_idx = r.band_idx
         |                   AND l.band_val = r.band_val
         |                   AND l.doc_id < r.doc_id)
         |WHERE hamming <= ${Multimodal.AHashHammingMax}""".stripMargin

  // ---- x14-x16 events ----------------------------------------------

  private val centsExpr = "CAST(floor(value * 100 + 0.5) AS BIGINT)"

  private val x14 =
    raw"""SELECT event_id, user_id, event_type,
         |       json_extract_string(props, '$$.k')::BIGINT AS k,
         |       $centsExpr AS value_cents,
         |       CAST(date_trunc('hour', ts) AS VARCHAR) AS hour
         |FROM events""".stripMargin

  private val x15 =
    raw"""SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour, event_type,
         |       CAST(count(*) AS BIGINT) AS n_events,
         |       CAST(sum($centsExpr) AS BIGINT) AS value_cents,
         |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
         |FROM events GROUP BY 1, 2""".stripMargin

  /** The x16 sessionization CTE chain + per-session aggregate (shared
    * with the x24 streaming-equivalence oracle). */
  private val sessionCtes =
    raw"""t AS (
         |  SELECT event_id, user_id, event_type, epoch_ms(ts) AS ms,
         |         $centsExpr AS value_cents
         |  FROM events),
         |tagged AS (
         |  SELECT *, CASE WHEN prev_ms IS NULL OR ms - prev_ms > ${Events.SessionGapMs}
         |                 THEN 1 ELSE 0 END AS is_new
         |  FROM (SELECT *, lag(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS prev_ms
         |        FROM t)),
         |sessions AS (
         |  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ms, event_id
         |                              ROWS UNBOUNDED PRECEDING) AS session_seq
         |  FROM tagged),
         |sagg AS (
         |  SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
         |         min(ms) AS start_ms, max(ms) AS end_ms,
         |         CAST(count(*) AS BIGINT) AS n_events,
         |         CAST(sum(value_cents) AS BIGINT) AS value_cents
         |  FROM sessions GROUP BY 1, 2)""".stripMargin

  private val x16 =
    raw"""WITH $sessionCtes
         |SELECT user_id, session_seq, start_ms, end_ms, n_events, value_cents
         |FROM sagg""".stripMargin

  // ---- x23/x24 streaming batch-equivalence (AvailableNow) ----------

  /** Final event-time watermark of an AvailableNow run: max event time
    * minus the 1 h delay. Windows/sessions not sealed by it stay in
    * state — the oracle applies the same cut to the batch answer. */
  private val wmCte = "wm AS (SELECT max(epoch_ms(ts)) - 3600000 AS wm FROM events)"

  private val x23 =
    raw"""WITH $wmCte
         |SELECT hour, event_type, n_events, value_cents FROM (
         |  SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour,
         |         epoch_ms(date_trunc('hour', ts)) + 3600000 AS end_ms,
         |         event_type,
         |         CAST(count(*) AS BIGINT) AS n_events,
         |         CAST(sum($centsExpr) AS BIGINT) AS value_cents
         |  FROM events GROUP BY 1, 2, 3), wm
         |WHERE end_ms <= wm""".stripMargin

  private val x24 =
    raw"""WITH $sessionCtes, $wmCte
         |SELECT user_id, start_ms, end_ms, n_events, value_cents
         |FROM (SELECT *, max(session_seq) OVER (PARTITION BY user_id) AS max_seq
         |      FROM sagg), wm
         |WHERE session_seq < max_seq OR end_ms + ${Events.SessionGapMs} < wm""".stripMargin

  // ---- x17 top-k docs per language ---------------------------------

  private val x17 = {
    val stop = strList(TextAnalysis.Stopwords)
    raw"""WITH $toksCte,
         |q AS (
         |  SELECT doc_id, lang,
         |         $qualityScoreSql
         |  FROM (
         |    SELECT doc_id, lang, text,
         |           len(toks) AS n_tokens,
         |           len(regexp_extract_all(text, '${TextAnalysis.PunctPattern}')) AS n_punct,
         |           len(list_filter(toks, t -> list_contains($stop, t))) AS n_stopwords
         |    FROM tok))
         |SELECT doc_id, lang, quality_score, rnk FROM (
         |  SELECT *, row_number() OVER (PARTITION BY lang
         |              ORDER BY quality_score DESC, doc_id) AS rnk
         |  FROM q)
         |WHERE rnk <= 5""".stripMargin
  }

  // ---- x18 events rollup -------------------------------------------

  private val x18 =
    raw"""SELECT event_type, hour,
         |       CAST(count(*) AS BIGINT) AS n_events,
         |       CAST(sum(value_cents) AS BIGINT) AS value_cents
         |FROM (
         |  SELECT event_type,
         |         CAST(date_trunc('hour', ts) AS VARCHAR) AS hour,
         |         $centsExpr AS value_cents
         |  FROM events)
         |GROUP BY ROLLUP (event_type, hour)""".stripMargin

  // ---- x19 as-of carry-forward -------------------------------------

  private val x19 =
    raw"""SELECT event_id, user_id, event_type, ms,
         |       last_value(CASE WHEN event_type = 'signup' THEN ms END IGNORE NULLS)
         |         OVER (PARTITION BY user_id ORDER BY ms, event_id
         |               ROWS UNBOUNDED PRECEDING) AS last_signup_ms
         |FROM (SELECT event_id, user_id, event_type, epoch_ms(ts) AS ms FROM events)""".stripMargin

  // ---- x20 count-min sketch ----------------------------------------

  private val x20 = {
    val cms = graft.functions.CountMinSketch
    raw"""WITH $toksCte,
         |toka AS (SELECT unnest(toks) AS t FROM tok)
         |SELECT CAST(r.i AS BIGINT) AS row_idx,
         |       ('0x' || substr(md5(r.i::VARCHAR || ':' || t), 1, 4))::BIGINT % ${cms.Width} AS bucket,
         |       CAST(count(*) AS BIGINT) AS cnt
         |FROM toka, (SELECT unnest(range(0, ${cms.Depth})) AS i) r
         |GROUP BY 1, 2""".stripMargin
  }

  // ---- x21 exact heavy hitters -------------------------------------

  private val x21 =
    raw"""WITH $toksCte,
         |counts AS (
         |  SELECT t AS tok, CAST(count(*) AS BIGINT) AS cnt
         |  FROM (SELECT unnest(toks) AS t FROM tok) GROUP BY 1)
         |SELECT tok, cnt, rnk FROM (
         |  SELECT *, row_number() OVER (ORDER BY cnt DESC, tok) AS rnk FROM counts)
         |WHERE rnk <= 20""".stripMargin

  // ---- x22 label centroids (exact fixed-point sums) ----------------

  private val x22 =
    raw"""SELECT label, CAST(u.d AS BIGINT) AS dim,
         |       CAST(sum(CAST(floor(u.x * ${Similarity.CentroidScale}) AS BIGINT)) AS BIGINT) AS component_sum,
         |       CAST(count(*) AS BIGINT) AS n
         |FROM (SELECT label, embedding::DOUBLE[] AS e FROM embeddings) v,
         |     unnest([{'d': i-1, 'x': e[i]} for i in range(1, len(e)+1)]) AS t(u)
         |GROUP BY 1, 2""".stripMargin

  private def round4(e: String): String = s"floor(($e) * 10000 + 0.5) / 10000"

  // ---- x25 exact inverted-index Jaccard pairs ----------------------

  private val x25 =
    raw"""WITH $toksCte, $shCte,
         |dsh AS (SELECT doc_id, sh FROM shs WHERE len(sh) > 0),
         |post AS (
         |  SELECT doc_id, h, count(*) OVER (PARTITION BY h) AS df
         |  FROM (SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT AS h
         |        FROM (SELECT doc_id, unnest(sh) AS s FROM dsh))),
         |capped AS (SELECT doc_id, n, h, df FROM (
         |  SELECT doc_id, len(sh) AS n, h, df FROM post JOIN dsh USING (doc_id))
         |  WHERE df <= ${Dedup.MaxShingleDf}),
         |pre AS (
         |  SELECT doc_id, n, h FROM (
         |    SELECT doc_id, n, h,
         |           row_number() OVER (PARTITION BY doc_id ORDER BY df, h) AS rk,
         |           count(*) OVER (PARTITION BY doc_id) AS n_idx
         |    FROM capped)
         |  WHERE rk <= n_idx - ceil(${Dedup.JaccardThreshold} * n_idx) + 1),
         |cand AS (
         |  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
         |  FROM pre l JOIN pre r ON l.h = r.h AND l.doc_id < r.doc_id
         |   AND ${Dedup.JaccardThreshold} * l.n <= r.n
         |   AND ${Dedup.JaccardThreshold} * r.n <= l.n)
         |SELECT doc_a, doc_b, jaccard FROM (
         |  SELECT c.doc_a, c.doc_b, $jaccardExpr AS jaccard
         |  FROM cand c JOIN dsh l ON l.doc_id = c.doc_a
         |              JOIN dsh r ON r.doc_id = c.doc_b)
         |WHERE jaccard >= ${Dedup.JaccardThreshold}""".stripMargin

  // ---- x26/x27 vocabulary, IDF, TF-IDF -----------------------------

  /** Shared term-frequency + doc-count CTEs. */
  private val tfCtes =
    raw"""tf AS (
         |  SELECT doc_id, t AS tok, CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, unnest(toks) AS t FROM tok) GROUP BY 1, 2),
         |nd AS (SELECT count(*) AS n_docs FROM documents)""".stripMargin

  private val idfExpr = round4("ln((n_docs + 1)::DOUBLE / (count(*) + 1))")

  private val x26 =
    raw"""WITH $toksCte, $tfCtes
         |SELECT tok, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS cf,
         |       $idfExpr AS idf
         |FROM tf, nd GROUP BY tok, n_docs""".stripMargin

  private val x27 =
    raw"""WITH $toksCte, $tfCtes,
         |vocab AS (
         |  SELECT tok, $idfExpr AS idf
         |  FROM tf, nd GROUP BY tok, n_docs),
         |scored AS (
         |  SELECT f.doc_id, f.tok, ${round4("f.tf * v.idf")} AS score
         |  FROM tf f JOIN vocab v USING (tok))
         |SELECT doc_id, tok, score, rnk FROM (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
         |              ORDER BY score DESC, tok) AS BIGINT) AS rnk
         |  FROM scored)
         |WHERE rnk <= 3""".stripMargin

  // ---- x28 exact interpolated quantiles ----------------------------

  private val x28 =
    raw"""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |       ${round4("quantile_cont(cents, 0.5)")} AS p50,
         |       ${round4("quantile_cont(cents, 0.9)")} AS p90,
         |       ${round4("quantile_cont(cents, 0.99)")} AS p99
         |FROM (SELECT event_type, $centsExpr AS cents FROM events)
         |GROUP BY 1""".stripMargin

  // ---- x29 deterministic train/val/test split ----------------------

  private val x29 =
    raw"""SELECT doc_id, lang, bucket,
         |       CASE WHEN bucket < ${TextAnalysis.TrainPct} THEN 'train'
         |            WHEN bucket < ${TextAnalysis.ValPct} THEN 'val'
         |            ELSE 'test' END AS split
         |FROM (SELECT doc_id, lang,
         |             ('0x' || substr(md5('split:' || doc_id::VARCHAR), 1, 4))::BIGINT % 100 AS bucket
         |      FROM documents)""".stripMargin

  // ---- x30 near-dup clusters (connected components) ----------------

  /** Shared CTE chain for x30/x86: LSH pairs → edges → transitive
    * closure → min-label components with sizes. */
  private val x30Ctes =
    raw"""WITH RECURSIVE $x5Ctes,
         |pairs AS (
         |$x5Select),
         |edges AS (
         |  SELECT doc_a AS u, doc_b AS v FROM pairs
         |  UNION SELECT doc_b, doc_a FROM pairs),
         |reach(u, v) AS (
         |  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
         |  UNION
         |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
         |labels AS (SELECT u AS doc_id, min(v) AS cluster_id FROM reach GROUP BY 1),
         |sizes AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members
         |          FROM labels GROUP BY 1)""".stripMargin

  private val x30 =
    raw"""$x30Ctes
         |SELECT l.doc_id, l.cluster_id, s.n_members
         |FROM labels l JOIN sizes s USING (cluster_id)""".stripMargin

  // ---- x86 cluster representative selection ------------------------
  // The "keep one per near-dup cluster" step every dedup pipeline ends
  // with: best doc (longest, doc_id tie-break) survives per component.

  private val x86 =
    raw"""$x30Ctes
         |SELECT cluster_id, doc_id AS rep_doc,
         |       CAST(n_chars AS BIGINT) AS rep_chars, n_members
         |FROM (SELECT l.cluster_id, l.doc_id, d.n_chars, s.n_members
         |      FROM labels l JOIN documents d USING (doc_id)
         |                    JOIN sizes s USING (cluster_id))
         |QUALIFY row_number() OVER (PARTITION BY cluster_id
         |                           ORDER BY n_chars DESC, doc_id) = 1""".stripMargin

  // ---- x31 HyperLogLog register table ------------------------------

  private val x31 = {
    val hll = graft.functions.HyperLogLog
    val cases = (1 to hll.RankBits)
      .map(r => s"WHEN rest >= ${1L << (hll.RankBits - r)} THEN $r")
      .mkString("CASE ", " ", s" ELSE ${hll.RankBits + 1} END")
    raw"""WITH $toksCte,
         |h AS (SELECT md5(t) AS h FROM (SELECT unnest(toks) AS t FROM tok)),
         |rr AS (
         |  SELECT ('0x' || substr(h, 1, 2))::BIGINT AS reg,
         |         ('0x' || substr(h, 3, 13))::BIGINT AS rest
         |  FROM h)
         |SELECT reg, CAST(max($cases) AS BIGINT) AS max_rho
         |FROM rr GROUP BY 1""".stripMargin
  }

  // ---- x65 grouped HLL register tables -----------------------------

  private val x65 = {
    val hll = graft.functions.HyperLogLog
    val cases = (1 to hll.RankBits)
      .map(r => s"WHEN rest >= ${1L << (hll.RankBits - r)} THEN $r")
      .mkString("CASE ", " ", s" ELSE ${hll.RankBits + 1} END")
    raw"""WITH $toksCte,
         |h AS (SELECT lang, md5(t) AS h
         |      FROM (SELECT lang, unnest(toks) AS t FROM tok)),
         |rr AS (
         |  SELECT lang, ('0x' || substr(h, 1, 2))::BIGINT AS reg,
         |         ('0x' || substr(h, 3, 13))::BIGINT AS rest
         |  FROM h)
         |SELECT lang, reg, CAST(max($cases) AS BIGINT) AS max_rho
         |FROM rr GROUP BY 1, 2""".stripMargin
  }

  // ---- x66 set operations ------------------------------------------

  private val x66 =
    raw"""WITH u AS (SELECT DISTINCT event_type, user_id FROM events)
         |SELECT 'signup_and_buy' AS cohort, user_id FROM (
         |  SELECT user_id FROM u WHERE event_type = 'signup'
         |  INTERSECT
         |  SELECT user_id FROM u WHERE event_type = 'purchase')
         |UNION ALL
         |SELECT 'buy_no_error', user_id FROM (
         |  SELECT user_id FROM u WHERE event_type = 'purchase'
         |  EXCEPT
         |  SELECT user_id FROM u WHERE event_type = 'error')""".stripMargin

  // ---- x67 hopping-window aggregation ------------------------------

  private val x67 = {
    val hop = Events.HopMs; val nHops = Events.SlideWindowMs / Events.HopMs
    raw"""WITH e AS (
         |  SELECT event_type, epoch_ms(ts) AS ms, $centsExpr AS cents
         |  FROM events)
         |SELECT (ms // $hop) * $hop - i * $hop AS window_start, event_type,
         |       CAST(count(*) AS BIGINT) AS n_events,
         |       CAST(sum(cents) AS BIGINT) AS value_cents
         |FROM e, (SELECT unnest(range(0, $nHops)) AS i) t
         |GROUP BY 1, 2""".stripMargin
  }

  // ---- x68 group-wise z-score normalization ------------------------

  private val x68 =
    raw"""WITH base AS (
         |  SELECT event_id, event_type, $centsExpr AS cents FROM events),
         |st AS (
         |  SELECT event_type, count(*) AS n,
         |         CAST(sum(cents) AS BIGINT) AS s1,
         |         CAST(sum(cents * cents) AS BIGINT) AS s2
         |  FROM base GROUP BY 1)
         |SELECT event_id, event_type, cents,
         |       CASE WHEN n >= 2
         |                 AND s2::DOUBLE / n - (s1::DOUBLE / n) * (s1::DOUBLE / n) > 0
         |            THEN ${round4("(cents - s1::DOUBLE / n) / sqrt(s2::DOUBLE / n - (s1::DOUBLE / n) * (s1::DOUBLE / n))")}
         |            END AS z
         |FROM base JOIN st USING (event_type)""".stripMargin

  // ---- x69 correlation matrix --------------------------------------

  private val x69 = {
    val feats = graft.ops.DataProfile.CorrFeatures
    val proj = feats.map { case (c, s) =>
      s"CAST(floor($c * $s + 0.5) AS BIGINT) AS $c"
    }.mkString(", ")
    val moments = feats.map { case (c, _) => s"CAST(sum($c) AS BIGINT) AS s_$c" } ++
      feats.combinations(2).toSeq.flatMap { case Seq((a, _), (b, _)) =>
        Seq(s"CAST(sum($a * $a) AS BIGINT) AS ss_$a$a",
          s"CAST(sum($b * $b) AS BIGINT) AS ss_$b$b",
          s"CAST(sum($a * $b) AS BIGINT) AS ss_$a$b")
      }
    val pairs = feats.map(_._1).combinations(2).toSeq.map { case Seq(a, b) =>
      val num = s"n::DOUBLE * ss_$a$b::DOUBLE - s_$a::DOUBLE * s_$b::DOUBLE"
      val dx = s"n::DOUBLE * ss_$a$a::DOUBLE - s_$a::DOUBLE * s_$a::DOUBLE"
      val dy = s"n::DOUBLE * ss_$b$b::DOUBLE - s_$b::DOUBLE * s_$b::DOUBLE"
      raw"""SELECT '$a' AS col_a, '$b' AS col_b, CAST(n AS BIGINT) AS n,
           |       ${round4(s"($num) / (sqrt($dx) * sqrt($dy))")} AS corr
           |FROM m""".stripMargin
    }
    raw"""WITH m AS (
         |  SELECT count(*) AS n, ${moments.distinct.mkString(",\n         ")}
         |  FROM (SELECT $proj FROM lineitem))
         |${pairs.mkString("\nUNION ALL\n")}""".stripMargin
  }

  // ---- x70 unpivot (melt) measure profile --------------------------

  private val x70 = {
    val arms = graft.ops.Olap.MeltCols.map { case (c, s) =>
      s"SELECT '$c' AS metric, CAST(floor($c * $s + 0.5) AS BIGINT) AS v FROM lineitem"
    }.mkString("\n  UNION ALL\n  ")
    raw"""SELECT metric, CAST(count(*) AS BIGINT) AS n_rows,
         |       CAST(sum(v) AS BIGINT) AS sum_v, min(v) AS min_v, max(v) AS max_v
         |FROM (
         |  $arms)
         |GROUP BY metric""".stripMargin
  }

  // ---- x71 data-quality expectations -------------------------------

  private val x71 = {
    val dp = graft.ops.DataProfile
    def arm(tbl: String, rules: Seq[(String, String)]) = rules.map { case (id, bad) =>
      raw"""SELECT '$id' AS rule_id, '$tbl' AS tbl,
           |       CAST(count(*) AS BIGINT) AS n_rows,
           |       CAST(sum(CASE WHEN $bad THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
           |FROM $tbl""".stripMargin
    }
    val ref =
      raw"""SELECT 'li_orderkey_ref' AS rule_id, 'lineitem' AS tbl,
           |       (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_rows,
           |       (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
           |        WHERE NOT EXISTS (SELECT 1 FROM orders o
           |                          WHERE o.o_orderkey = l.l_orderkey)) AS n_violations""".stripMargin
    (arm("lineitem", dp.LineitemRules) ++ arm("orders", dp.OrdersRules) :+ ref)
      .mkString("\nUNION ALL\n")
  }

  // ---- x72 CUBE grouping sets --------------------------------------

  private val x72 =
    raw"""SELECT pri, yr, CAST(GROUPING(pri, yr) AS BIGINT) AS gid,
         |       CAST(count(*) AS BIGINT) AS n_orders,
         |       CAST(sum(cents) AS BIGINT) AS total_cents
         |FROM (
         |  SELECT o_orderpriority AS pri,
         |         CAST(year(o_orderdate) AS BIGINT) AS yr,
         |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
         |  FROM orders)
         |GROUP BY CUBE (pri, yr)""".stripMargin

  // ---- x73 BPE pair-merge counts -----------------------------------

  private val x73 =
    raw"""WITH $toksCte,
         |tc AS (
         |  SELECT t AS tok, count(*) AS cnt
         |  FROM (SELECT unnest(toks) AS t FROM tok)
         |  GROUP BY 1),
         |pr AS (
         |  SELECT unnest([substring(tok, i, 2) for i in range(1, length(tok))]) AS pair, cnt
         |  FROM tc WHERE length(tok) >= 2)
         |SELECT pair, CAST(sum(cnt) AS BIGINT) AS pair_count
         |FROM pr
         |GROUP BY pair
         |ORDER BY pair_count DESC, pair
         |LIMIT ${TextAnalysis.BpeTopK}""".stripMargin

  // ---- x74 deterministic weighted (PPS) sampling -------------------

  private val x74 = {
    val k = TextAnalysis.WeightedSampleK
    raw"""WITH b AS (
         |  SELECT doc_id, lang, n_chars AS w,
         |         md5('wsample:' || doc_id::VARCHAR) AS skey
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, lang, w,
         |         sum(w) OVER (PARTITION BY lang ORDER BY skey, doc_id
         |                      ROWS UNBOUNDED PRECEDING) AS cum,
         |         sum(w) OVER (PARTITION BY lang) AS tot
         |  FROM b),
         |s AS (SELECT *, greatest(tot // $k, 1) AS step FROM c)
         |SELECT doc_id, lang, w,
         |       CAST(cum // step - (cum - w) // step AS BIGINT) AS n_picks
         |FROM s
         |WHERE cum // step - (cum - w) // step > 0""".stripMargin
  }

  // ---- x75 per-language exact-median length gate -------------------

  private val x75 =
    raw"""WITH r AS (
         |  SELECT doc_id, lang, n_chars,
         |         row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
         |         count(*) OVER (PARTITION BY lang) AS n_in_lang
         |  FROM documents),
         |m AS (SELECT lang, n_chars AS med_chars FROM r WHERE rn = (n_in_lang + 1) // 2)
         |SELECT r.doc_id, r.lang, r.n_chars, m.med_chars
         |FROM r JOIN m ON r.lang = m.lang
         |WHERE r.n_chars >= m.med_chars""".stripMargin

  // ---- x76 sparse tf-idf cosine pairs ------------------------------

  private val x76 = {
    val scale = Dedup.IdfScale; val maxDf = Dedup.MaxShingleDf
    val thr = Dedup.CosineThreshold
    raw"""WITH $toksCte,
         |$shCte,
         |ps AS (SELECT doc_id, unnest(sh) AS s FROM shs),
         |p AS (
         |  SELECT doc_id, s,
         |         CAST(floor(ln(((SELECT count(*) + 1 FROM documents))::DOUBLE
         |                        / (df + 1)) * $scale + 0.5) AS BIGINT) AS w
         |  FROM (SELECT *, count(*) OVER (PARTITION BY s) AS df FROM ps)
         |  WHERE df <= $maxDf),
         |nr AS (SELECT doc_id, CAST(sum(w * w) AS BIGINT) AS nrm2 FROM p GROUP BY 1),
         |d AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |         CAST(sum(a.w * b.w) AS BIGINT) AS dot
         |  FROM p a JOIN p b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b, cos FROM (
         |  SELECT doc_a, doc_b,
         |         ${round4("dot::DOUBLE / (sqrt(na.nrm2::DOUBLE) * sqrt(nb.nrm2::DOUBLE))")} AS cos
         |  FROM d
         |  JOIN nr na ON na.doc_id = d.doc_a
         |  JOIN nr nb ON nb.doc_id = d.doc_b)
         |WHERE cos >= $thr""".stripMargin
  }

  // ---- x77 PCM frame energy ----------------------------------------
  // Arithmetic oracle, same contract as x63/x64: the engine must
  // really byte-parse the RIFF stream; the oracle reconstructs each
  // signed LE16 word from the ASCII payload (1 char = 1 byte).

  private val x77 = {
    val fl = Multimodal.FrameLen
    val v = "ord(substr(text, 2*j + 1, 1)) + 256 * ord(substr(text, 2*j + 2, 1))"
    raw"""WITH w AS (
         |  SELECT doc_id,
         |         unnest([{'f': j // $fl,
         |                  'v': CASE WHEN ord(substr(text, 2*j + 2, 1)) >= 128
         |                            THEN $v - 65536 ELSE $v END}
         |                 for j in range(0, strlen(text) // 2)]) AS s
         |  FROM documents)
         |SELECT doc_id, CAST(s.f AS BIGINT) AS frame_idx,
         |       CAST(count(*) AS BIGINT) AS n_words,
         |       CAST(sum(s.v * s.v) AS BIGINT) AS energy
         |FROM w GROUP BY 1, 2""".stripMargin
  }

  // ---- x78 split-distribution JSD drift guard ----------------------

  private val x78 = {
    val pairs = TextAnalysis.SplitPairs.map { case (a, b) =>
      raw"""SELECT '${a}_$b' AS pair,
           |       ${round4(s"list_sum([(${TextAnalysis.jsdTermSql(a, b)})::DOUBLE for x in ls])")} AS jsd
           |FROM pk""".stripMargin
    }
    raw"""WITH sp AS (
         |$x29),
         |c AS (
         |  SELECT lang,
         |         CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
         |         CAST(sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS n_val,
         |         CAST(sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS n_test
         |  FROM sp GROUP BY 1),
         |pk AS (
         |  SELECT list({'lang': lang, 'n_train': n_train,
         |               'n_val': n_val, 'n_test': n_test} ORDER BY lang) AS ls,
         |         CAST(sum(n_train) AS BIGINT) AS t_train,
         |         CAST(sum(n_val) AS BIGINT) AS t_val,
         |         CAST(sum(n_test) AS BIGINT) AS t_test
         |  FROM c)
         |${pairs.mkString("\nUNION ALL\n")}""".stripMargin
  }

  // ---- x79 session transition matrix -------------------------------

  private val x79 =
    raw"""WITH $sessionCtes
         |SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n_transitions
         |FROM (
         |  SELECT event_type AS from_type, session_seq,
         |         lead(event_type) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS to_type,
         |         lead(session_seq) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS next_seq
         |  FROM sessions)
         |WHERE to_type IS NOT NULL AND next_seq = session_seq
         |GROUP BY 1, 2""".stripMargin

  // ---- x80 per-type equi-depth histogram ---------------------------

  private val x80 =
    raw"""SELECT event_type, CAST(bucket AS BIGINT) AS bucket,
         |       CAST(count(*) AS BIGINT) AS n,
         |       min(cents) AS lo_cents, max(cents) AS hi_cents
         |FROM (
         |  SELECT event_type, $centsExpr AS cents, event_id,
         |         ntile(${Events.HistBuckets})
         |           OVER (PARTITION BY event_type ORDER BY $centsExpr, event_id) AS bucket
         |  FROM events)
         |GROUP BY 1, 2""".stripMargin

  // ---- x32 incremental exact dedup ---------------------------------

  private val x32 =
    raw"""WITH fp AS (SELECT doc_id, $fpFull AS fp FROM documents),
         |state AS (SELECT DISTINCT fp FROM fp WHERE doc_id % 3 <> 0),
         |batch AS (SELECT * FROM fp WHERE doc_id % 3 = 0)
         |SELECT fp, min(doc_id) AS doc_id, CAST(count(*) AS BIGINT) AS n_batch_copies
         |FROM batch WHERE fp NOT IN (SELECT fp FROM state)
         |GROUP BY 1""".stripMargin

  // ---- x33 deterministic stratified sample -------------------------

  private val x33 =
    raw"""SELECT doc_id, lang, rnk FROM (
         |  SELECT doc_id, lang,
         |         CAST(row_number() OVER (PARTITION BY lang
         |           ORDER BY md5('sample:' || doc_id::VARCHAR), doc_id) AS BIGINT) AS rnk
         |  FROM documents)
         |WHERE rnk <= ${TextAnalysis.SamplePerStratum}""".stripMargin

  // ---- x34 stream-stream interval join (attribution) ---------------

  /** Inner stream-stream joins emit matches in-batch, so the oracle is
    * the plain interval join. The time comparison runs in MICROSECONDS
    * (`epoch_ns(ts)//1000`) because Spark's event-time is the fixture's
    * ns timestamp floored to µs — DuckDB comparing raw ns could flip
    * pairs sitting exactly on the 1 h boundary. */
  private val x34 =
    raw"""WITH b AS (
         |  SELECT event_id AS buy_id, user_id,
         |         epoch_ns(ts) // 1000 AS buy_us, epoch_ms(ts) AS buy_ms,
         |         $centsExpr AS value_cents
         |  FROM events WHERE event_type = 'purchase'),
         |s AS (
         |  SELECT event_id AS signup_id, user_id,
         |         epoch_ns(ts) // 1000 AS signup_us, epoch_ms(ts) AS signup_ms
         |  FROM events WHERE event_type = 'signup')
         |SELECT buy_id, signup_id, user_id, buy_ms, signup_ms, value_cents
         |FROM b JOIN s USING (user_id)
         |WHERE signup_us <= buy_us AND signup_us >= buy_us - 3600000000""".stripMargin

  // ---- x35 salted join ≡ plain join --------------------------------

  /** The salting contract IS the oracle: the salted Spark plan must
    * produce exactly the plain join's answer. */
  private val x35 =
    raw"""SELECT s.s_nationkey::BIGINT AS s_nationkey,
         |       CAST(count(*) AS BIGINT) AS n_items,
         |       CAST(sum(CAST(floor(l.l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
         |FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |GROUP BY 1""".stripMargin

  // ---- x36 sequence-packing bins -----------------------------------

  private val x36 =
    raw"""WITH $toksCte,
         |t AS (SELECT doc_id, lang, CAST(len(toks) AS BIGINT) AS n_tokens FROM tok),
         |c AS (
         |  SELECT doc_id, lang, n_tokens,
         |         sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
         |                             ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM t)
         |SELECT lang, CAST(floor((cum - n_tokens) / ${TextAnalysis.PackBudget}) AS BIGINT) AS bin,
         |       CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
         |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM c GROUP BY 1, 2""".stripMargin

  // ---- x37 train/test contamination --------------------------------

  /** doc_id → split (shared by x37 and the x43 bloom probe). */
  private val splitCte =
    raw"""sp AS (
         |  SELECT doc_id,
         |         CASE WHEN bucket < ${TextAnalysis.TrainPct} THEN 'train'
         |              WHEN bucket < ${TextAnalysis.ValPct} THEN 'val'
         |              ELSE 'test' END AS split
         |  FROM (SELECT doc_id,
         |               ('0x' || substr(md5('split:' || doc_id::VARCHAR), 1, 4))::BIGINT % 100 AS bucket
         |        FROM documents))""".stripMargin

  private val x37 =
    raw"""WITH $toksCte, $shCte,
         |dsh AS (SELECT doc_id, sh FROM shs WHERE len(sh) > 0),
         |$splitCte,
         |post AS (
         |  SELECT doc_id, split, h, count(*) OVER (PARTITION BY h) AS df
         |  FROM (SELECT doc_id, split,
         |               ('0x' || substr(md5(s), 1, 15))::BIGINT AS h
         |        FROM (SELECT d.doc_id, sp.split, unnest(d.sh) AS s
         |              FROM dsh d JOIN sp USING (doc_id)))),
         |capped AS (SELECT doc_id, split, h FROM post WHERE df <= ${Dedup.MaxShingleDf})
         |SELECT t.doc_id AS test_doc, tr.doc_id AS train_doc,
         |       CAST(count(*) AS BIGINT) AS n_shared
         |FROM capped t JOIN capped tr ON t.h = tr.h
         |WHERE t.split = 'test' AND tr.split = 'train'
         |GROUP BY 1, 2 HAVING count(*) >= 3""".stripMargin

  // ---- x38 corpus-trained bigram LM score --------------------------

  private val x38 = {
    val scale = Similarity.CentroidScale
    raw"""WITH $toksCte,
         |bi AS (
         |  SELECT doc_id, u.w1, u.w2 FROM (
         |    SELECT doc_id,
         |           [{'w1': toks[i+1], 'w2': toks[i+2]} for i in range(0, len(toks) - 1)] AS bs
         |    FROM tok WHERE len(toks) >= 2),
         |  unnest(bs) AS t(u)),
         |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY 1, 2),
         |c1 AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY 1),
         |voc AS (SELECT count(DISTINCT t) AS v FROM (SELECT unnest(toks) AS t FROM tok)),
         |lp AS (
         |  SELECT bi.doc_id,
         |         CAST(floor(ln((c12.c12 + 1)::DOUBLE / (c1.c1 + voc.v)::DOUBLE) * $scale) AS BIGINT) AS lp
         |  FROM bi JOIN c12 USING (w1, w2) JOIN c1 USING (w1), voc)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |       ${round4(s"-(sum(lp)::DOUBLE / (count(*) * $scale)::DOUBLE)")} AS nll
         |FROM lp GROUP BY 1""".stripMargin
  }

  // ---- x39 repetition filters --------------------------------------

  private val x39 =
    raw"""WITH $toksCte,
         |tf AS (
         |  SELECT doc_id, t AS tok, count(*) AS tf
         |  FROM (SELECT doc_id, unnest(toks) AS t FROM tok) GROUP BY 1, 2),
         |tok_top AS (
         |  SELECT doc_id, max(tf) AS top_tf, sum(tf) AS n_toks, count(*) AS n_distinct
         |  FROM tf GROUP BY 1),
         |bi AS (
         |  SELECT doc_id, u.w1, u.w2 FROM (
         |    SELECT doc_id,
         |           [{'w1': toks[i+1], 'w2': toks[i+2]} for i in range(0, len(toks) - 1)] AS bs
         |    FROM tok WHERE len(toks) >= 2),
         |  unnest(bs) AS t(u)),
         |bc AS (SELECT doc_id, w1, w2, count(*) AS bc FROM bi GROUP BY 1, 2, 3),
         |bi_top AS (SELECT doc_id, max(bc) AS top_bc, sum(bc) AS n_bi FROM bc GROUP BY 1)
         |SELECT t.doc_id,
         |       ${round4("t.n_distinct::DOUBLE / t.n_toks")} AS distinct_frac,
         |       ${round4("t.top_tf::DOUBLE / t.n_toks")} AS top_tok_frac,
         |       coalesce(${round4("b.top_bc::DOUBLE / b.n_bi")}, 0.0) AS top_bigram_frac
         |FROM tok_top t LEFT JOIN bi_top b USING (doc_id)""".stripMargin

  // ---- x40 log-histogram quantile sketch ---------------------------

  private val x40 = {
    // same arithmetic bin math as QuantileSketch.binOf/loOf/widthOf:
    // octave via length(bin(v)) (minimal binary digits, both engines),
    // then pure integer shifts
    val binCase =
      "CASE WHEN v < 4 THEN v - 1 ELSE (length(bin(v)) - 3) * 4 + (v >> (length(bin(v)) - 3)) - 1 END"
    val loCase =
      "CASE WHEN bin < 3 THEN bin + 1 ELSE (4 + (bin - 3) % 4) << ((bin - 3) // 4) END"
    val wCase =
      "CASE WHEN bin < 3 THEN 1 ELSE 1 << ((bin - 3) // 4) END"
    raw"""WITH c AS (SELECT event_type, $centsExpr + 1 AS v FROM events),
         |h AS (
         |  SELECT event_type, CAST($binCase AS BIGINT) AS bin, count(*) AS cnt
         |  FROM c GROUP BY 1, 2),
         |cm AS (
         |  SELECT *,
         |         sum(cnt) OVER (PARTITION BY event_type ORDER BY bin
         |                        ROWS UNBOUNDED PRECEDING) AS cum,
         |         sum(cnt) OVER (PARTITION BY event_type) AS n
         |  FROM h),
         |px AS (
         |  SELECT event_type, q.qname, n, bin, cum, cnt,
         |         CAST(ceil(q.q * n) AS BIGINT) AS rank,
         |         row_number() OVER (PARTITION BY event_type, q.qname ORDER BY bin) AS rn
         |  FROM cm, (VALUES (0.5, 'p50'), (0.9, 'p90'), (0.99, 'p99')) q(q, qname)
         |  WHERE cum >= CAST(ceil(q.q * n) AS BIGINT)),
         |est AS (
         |  SELECT event_type, qname, n,
         |         ${round4(s"($loCase)::DOUBLE + ($wCase)::DOUBLE * (rank - (cum - cnt))::DOUBLE / cnt - 1.0")} AS est
         |  FROM px WHERE rn = 1)
         |SELECT event_type, CAST(max(n) AS BIGINT) AS n,
         |       max(CASE WHEN qname = 'p50' THEN est END) AS p50_est,
         |       max(CASE WHEN qname = 'p90' THEN est END) AS p90_est,
         |       max(CASE WHEN qname = 'p99' THEN est END) AS p99_est
         |FROM est GROUP BY 1""".stripMargin
  }

  // ---- x41 SQL-surface query ---------------------------------------

  /** Dialect-neutral SQL shared verbatim with the Spark side. */
  private val x41 = graft.sources.Catalog.TopSupplierSql

  // ---- x42/x43 Bloom filter build + probe --------------------------

  private val bloomPosExpr = {
    val bf = graft.functions.BloomFilter
    (col: String) => s"('0x' || substr(md5(i.i::VARCHAR || ':' || $col), 1, 8))::BIGINT % ${bf.Bits}"
  }

  private val x42 = {
    val bf = graft.functions.BloomFilter
    raw"""WITH fpd AS (SELECT $fpFull AS fp FROM documents),
         |pos AS (
         |  SELECT DISTINCT ${bloomPosExpr("fp")} AS pos
         |  FROM fpd, (SELECT unnest(range(0, ${bf.Hashes})) AS i) i)
         |SELECT pos // ${bf.WordBits} AS word_idx,
         |       CAST(bit_or(1::BIGINT << (pos % ${bf.WordBits})) AS BIGINT) AS bits
         |FROM pos GROUP BY 1""".stripMargin
  }

  private val x43 = {
    val bf = graft.functions.BloomFilter
    raw"""WITH fpd AS (SELECT doc_id, $fpFull AS fp FROM documents),
         |$splitCte,
         |tagged AS (SELECT f.doc_id, f.fp, sp.split FROM fpd f JOIN sp USING (doc_id)),
         |train AS (SELECT DISTINCT fp FROM tagged WHERE split = 'train'),
         |fpos AS (
         |  SELECT DISTINCT ${bloomPosExpr("fp")} AS pos
         |  FROM train, (SELECT unnest(range(0, ${bf.Hashes})) AS i) i),
         |probes AS (
         |  SELECT t.doc_id, t.fp, ${bloomPosExpr("t.fp")} AS pos
         |  FROM tagged t, (SELECT unnest(range(0, ${bf.Hashes})) AS i) i
         |  WHERE t.split = 'test'),
         |hits AS (
         |  SELECT p.doc_id, p.fp, count(f.pos) = ${bf.Hashes} AS bloom_hit
         |  FROM probes p LEFT JOIN fpos f USING (pos)
         |  GROUP BY 1, 2)
         |SELECT h.doc_id, h.bloom_hit, (tr.fp IS NOT NULL) AS in_train
         |FROM hits h LEFT JOIN train tr USING (fp)""".stripMargin
  }

  // ---- x44 event-rate anomaly (trailing z-score) -------------------

  private val x44 = {
    val win = Events.AnomalyWindow
    raw"""WITH hourly AS (
         |  SELECT event_type, CAST(date_trunc('hour', ts) AS VARCHAR) AS hour,
         |         CAST(count(*) AS BIGINT) AS c
         |  FROM events GROUP BY 1, 2),
         |stats AS (
         |  SELECT *,
         |         count(c) OVER tw AS n_base,
         |         sum(c) OVER tw AS s1,
         |         sum(c * c) OVER tw AS s2
         |  FROM hourly
         |  WINDOW tw AS (PARTITION BY event_type ORDER BY hour
         |                ROWS BETWEEN $win PRECEDING AND 1 PRECEDING))
         |SELECT event_type, hour, c,
         |       CASE WHEN n_base >= 2
         |                 AND s2::DOUBLE / n_base - (s1::DOUBLE / n_base) * (s1::DOUBLE / n_base) > 0
         |            THEN ${round4("(c - s1::DOUBLE / n_base) / sqrt(s2::DOUBLE / n_base - (s1::DOUBLE / n_base) * (s1::DOUBLE / n_base))")}
         |            END AS z
         |FROM stats""".stripMargin
  }

  // ---- x45 as-of join (DuckDB-native ASOF LEFT JOIN) ---------------
  // Independent implementation on the oracle side: DuckDB's built-in
  // ASOF JOIN vs the engine's union-tag + window carry — agreement is
  // evidence the carry trick implements the real operator. Right side
  // reduced to one row per (user_id, ms) in BOTH engines (max
  // signup_id) so ties cannot differ.
  private val x45 =
    raw"""WITH buys AS (
         |  SELECT event_id AS buy_id, user_id, epoch_ms(ts) AS buy_ms,
         |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_cents
         |  FROM events WHERE event_type = 'purchase'),
         |signups AS (
         |  SELECT user_id, epoch_ms(ts) AS ms, max(event_id) AS signup_id
         |  FROM events WHERE event_type = 'signup' GROUP BY 1, 2)
         |SELECT b.buy_id, b.user_id, b.buy_ms, b.value_cents, s.signup_id
         |FROM buys b ASOF LEFT JOIN signups s
         |  ON b.user_id = s.user_id AND b.buy_ms >= s.ms""".stripMargin

  // ---- x46 interval join (busy windows) ----------------------------
  // The oracle uses the naive inequality join — correct at oracle
  // scale; the engine's bucket equi-join must produce the same pairs.
  private val x46 = {
    import graft.ops.Temporal._
    raw"""WITH hourly AS (
         |  SELECT date_trunc('hour', ts) AS h, count(*) AS c
         |  FROM events GROUP BY 1),
         |busy AS (
         |  SELECT CAST(h AS VARCHAR) AS window_hour,
         |         epoch_ms(h) - $WindowPreMs AS ws,
         |         epoch_ms(h) + $WindowPostMs AS we
         |  FROM hourly
         |  WHERE c * (SELECT count(*) FROM hourly) >= (SELECT sum(c) FROM hourly)),
         |errs AS (
         |  SELECT event_id, epoch_ms(ts) AS ms
         |  FROM events WHERE event_type = 'error')
         |SELECT e.event_id, b.window_hour, e.ms
         |FROM errs e JOIN busy b ON e.ms >= b.ws AND e.ms < b.we""".stripMargin
  }

  // ---- x47 SCD-2 build ---------------------------------------------
  private val x47 =
    raw"""WITH ev AS (
         |  SELECT user_id, event_type AS state, epoch_ms(ts) AS ms, event_id
         |  FROM events),
         |chg AS (
         |  SELECT *, lag(state) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS prev
         |  FROM ev)
         |SELECT user_id, state, ms AS valid_from_ms,
         |       lead(ms) OVER w AS valid_to_ms,
         |       CAST(row_number() OVER w AS BIGINT) AS version
         |FROM chg WHERE prev IS NULL OR state <> prev
         |WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)""".stripMargin

  // ---- x48 trailing time-range aggregates --------------------------
  private val x48 = {
    val r = graft.ops.Temporal.RollingRangeMs
    raw"""SELECT event_id, user_id, ms, value_cents,
         |       CAST(count(*) OVER tw AS BIGINT) AS n_1h,
         |       CAST(sum(value_cents) OVER tw AS BIGINT) AS cents_1h
         |FROM (
         |  SELECT event_id, user_id, epoch_ms(ts) AS ms,
         |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_cents
         |  FROM events)
         |WINDOW tw AS (PARTITION BY user_id ORDER BY ms
         |              RANGE BETWEEN $r PRECEDING AND CURRENT ROW)""".stripMargin
  }

  // ---- x49 CDC segment dedup ---------------------------------------
  private val x49 = {
    val mod = Dedup.AnchorMod; val minT = Dedup.MinSegTokens
    raw"""WITH $toksCte,
         |pos AS (
         |  SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS p
         |  FROM tok),
         |segd AS (
         |  SELECT doc_id, tok, p,
         |         sum(CASE WHEN ('0x' || substr(md5(tok), 1, 4))::BIGINT % $mod = 0
         |                  THEN 1 ELSE 0 END)
         |           OVER (PARTITION BY doc_id ORDER BY p) AS seg
         |  FROM pos),
         |segs AS (
         |  SELECT doc_id, seg, min(p) AS seg_start,
         |         CAST(count(*) AS BIGINT) AS n_toks,
         |         string_agg(tok, ' ' ORDER BY p) AS seg_text
         |  FROM segd GROUP BY 1, 2),
         |freq AS (
         |  SELECT seg_text, count(DISTINCT doc_id) AS nd
         |  FROM segs WHERE n_toks >= $minT GROUP BY 1),
         |mk AS (
         |  SELECT s.*, coalesce(f.nd, 1) > 1 AS is_dup
         |  FROM segs s LEFT JOIN freq f USING (seg_text))
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segs,
         |       CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_segs,
         |       CAST(coalesce(sum(CASE WHEN NOT is_dup THEN n_toks END), 0) AS BIGINT) AS n_clean_toks,
         |       md5(coalesce(string_agg(CASE WHEN NOT is_dup THEN seg_text END,
         |                               ' ' ORDER BY seg_start), '')) AS clean_fp
         |FROM mk GROUP BY 1""".stripMargin
  }

  // ---- x50 fuzzy name match (blocked Levenshtein join) -------------
  private val x50 = {
    val d = graft.ops.Fuzzy.MaxEditDist
    raw"""WITH names AS (
         |  SELECT DISTINCT p_name, string_split(p_name, ' ')[-1] AS block
         |  FROM part)
         |SELECT a.p_name AS name_a, b.p_name AS name_b,
         |       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
         |FROM names a JOIN names b
         |  ON a.block = b.block AND a.p_name < b.p_name
         |     AND abs(length(a.p_name) - length(b.p_name)) <= $d
         |WHERE levenshtein(a.p_name, b.p_name) <= $d""".stripMargin
  }

  // ---- x51 BM25 search ---------------------------------------------
  private val x51 = {
    import graft.ops.Search._
    val qvals = Queries.flatMap { case (q, ts) => ts.map(t => s"('$q', '$t')") }
      .mkString(", ")
    raw"""WITH $toksCte,
         |qt(query, term) AS (VALUES $qvals),
         |dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM tok),
         |n AS (SELECT count(*) AS n_docs, sum(dl) AS total_toks FROM dl),
         |tfg AS (
         |  SELECT doc_id, tok2 AS tok, CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, unnest(toks) AS tok2 FROM tok) GROUP BY 1, 2),
         |dfq AS (
         |  SELECT tok, count(*) AS df FROM tfg
         |  WHERE tok IN (SELECT DISTINCT term FROM qt) GROUP BY 1),
         |contrib AS (
         |  SELECT q.query, t.doc_id,
         |         CAST(floor(ln(1.0 + (n.n_docs - f.df + 0.5) / (f.df + 0.5))
         |                    * (t.tf * ${K1 + 1}) / (t.tf + $K1 * ((1.0 - $B)
         |                       + $B * (dl.dl::DOUBLE * n.n_docs / n.total_toks)))
         |                    * $ScoreScale + 0.5) AS BIGINT) AS fp
         |  FROM qt q JOIN tfg t ON t.tok = q.term
         |       JOIN dfq f ON f.tok = t.tok
         |       JOIN dl ON dl.doc_id = t.doc_id
         |       CROSS JOIN n),
         |scored AS (
         |  SELECT query, doc_id, CAST(sum(fp) AS BIGINT) AS total
         |  FROM contrib GROUP BY 1, 2)
         |SELECT query, doc_id, ${round4(s"total::DOUBLE / $ScoreScale")} AS score,
         |       CAST(rnk AS BIGINT) AS rnk
         |FROM (SELECT *, row_number() OVER (PARTITION BY query
         |        ORDER BY total DESC, doc_id) AS rnk FROM scored)
         |WHERE rnk <= $TopK""".stripMargin
  }

  // ---- x226 MaxScore dynamic pruning + losslessness audit ----------
  // Mirrors Search.maxScoreAudit exactly: boot θ from each term's
  // top-MaxScoreBootCap postings, per-term ub = max contribution,
  // ub-ascending cumulative split (cum >= θ ⇒ essential), candidates
  // from essential postings, pruned-vs-exact top-k overlap.

  private val x226 = {
    import graft.ops.Search._
    val qvals = Queries.flatMap { case (q, ts) => ts.map(t => s"('$q', '$t')") }
      .mkString(", ")
    raw"""WITH $toksCte,
         |qt(query, term) AS (VALUES $qvals),
         |dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM tok),
         |n AS (SELECT count(*) AS n_docs, sum(dl) AS total_toks FROM dl),
         |tfg AS (
         |  SELECT doc_id, tok2 AS tok, CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, unnest(toks) AS tok2 FROM tok) GROUP BY 1, 2),
         |tfc AS (
         |  SELECT doc_id, tok, tf,
         |         row_number() OVER (PARTITION BY tok
         |           ORDER BY tf DESC, doc_id) AS crn
         |  FROM tfg),
         |dfq AS (
         |  SELECT tok, count(*) AS df FROM tfg
         |  WHERE tok IN (SELECT DISTINCT term FROM qt) GROUP BY 1),
         |contrib AS MATERIALIZED (
         |  SELECT q.query, q.term, t.doc_id, t.crn,
         |         CAST(floor(ln(1.0 + (n.n_docs - f.df + 0.5) / (f.df + 0.5))
         |                    * (t.tf * ${K1 + 1}) / (t.tf + $K1 * ((1.0 - $B)
         |                       + $B * (dl.dl::DOUBLE * n.n_docs / n.total_toks)))
         |                    * $ScoreScale + 0.5) AS BIGINT) AS fp
         |  FROM qt q JOIN tfc t ON t.tok = q.term
         |       JOIN dfq f ON f.tok = t.tok
         |       JOIN dl ON dl.doc_id = t.doc_id
         |       CROSS JOIN n),
         |theta AS (
         |  SELECT query, total AS theta FROM (
         |    SELECT query, doc_id, total,
         |           row_number() OVER (PARTITION BY query
         |             ORDER BY total DESC, doc_id) AS rnk
         |    FROM (SELECT query, doc_id, CAST(sum(fp) AS BIGINT) AS total
         |          FROM contrib WHERE crn <= $MaxScoreBootCap GROUP BY 1, 2))
         |  WHERE rnk = $TopK),
         |terms AS MATERIALIZED (
         |  SELECT u.query, u.term, u.ub, u.cum,
         |         u.cum >= coalesce(th.theta, 0) AS essential
         |  FROM (SELECT query, term, max(fp) AS ub,
         |               sum(max(fp)) OVER (PARTITION BY query
         |                 ORDER BY max(fp) ASC, term ASC
         |                 ROWS UNBOUNDED PRECEDING) AS cum
         |        FROM contrib GROUP BY 1, 2) u
         |  LEFT JOIN theta th USING (query)),
         |cand AS MATERIALIZED (
         |  SELECT DISTINCT c.query, c.doc_id
         |  FROM contrib c JOIN terms t ON t.query = c.query AND t.term = c.term
         |  WHERE t.essential),
         |etop AS MATERIALIZED (
         |  SELECT query, doc_id FROM (
         |    SELECT query, doc_id,
         |           row_number() OVER (PARTITION BY query
         |             ORDER BY total DESC, doc_id) AS rnk
         |    FROM (SELECT query, doc_id, CAST(sum(fp) AS BIGINT) AS total
         |          FROM contrib GROUP BY 1, 2))
         |  WHERE rnk <= $TopK),
         |ptop AS (
         |  SELECT query, doc_id FROM (
         |    SELECT query, doc_id,
         |           row_number() OVER (PARTITION BY query
         |             ORDER BY total DESC, doc_id) AS rnk
         |    FROM (SELECT c.query, c.doc_id, CAST(sum(fp) AS BIGINT) AS total
         |          FROM contrib c
         |          JOIN cand d ON d.query = c.query AND d.doc_id = c.doc_id
         |          GROUP BY 1, 2))
         |  WHERE rnk <= $TopK),
         |hits AS (
         |  SELECT e.query, count(*) AS hits
         |  FROM etop e JOIN ptop p ON p.query = e.query AND p.doc_id = e.doc_id
         |  GROUP BY 1),
         |tstat AS (
         |  SELECT query, CAST(count(*) AS BIGINT) AS n_terms,
         |         CAST(sum(CASE WHEN essential THEN 1 ELSE 0 END) AS BIGINT)
         |           AS n_essential
         |  FROM terms GROUP BY 1),
         |mstat AS (
         |  SELECT query, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_matching
         |  FROM contrib GROUP BY 1),
         |cstat AS (
         |  SELECT query, CAST(count(*) AS BIGINT) AS n_candidates
         |  FROM cand GROUP BY 1),
         |estat AS (
         |  SELECT query, CAST(count(*) AS BIGINT) AS n_exact FROM etop GROUP BY 1)
         |SELECT t.query, t.n_terms, t.n_essential, m.n_matching, c.n_candidates,
         |       ${round4("1.0 - c.n_candidates::DOUBLE / m.n_matching::DOUBLE")}
         |         AS pruned_frac,
         |       e.n_exact, CAST(coalesce(h.hits, 0) AS BIGINT) AS hits
         |FROM tstat t JOIN mstat m USING (query) JOIN cstat c USING (query)
         |     JOIN estat e USING (query) LEFT JOIN hits h USING (query)""".stripMargin
  }

  // ---- x244 block-max MaxScore --------------------------------------
  // Mirrors Search.blockMaxAudit exactly: x226's boot θ / ub split /
  // essential candidates, then the per-(query, term, block) maxima on
  // the BlockMaxLen champion-rank grid bound each candidate
  // (Σ bub over its postings); bound < θ is an exact skip, and the
  // pruned-vs-exact overlap is forced to n_exact like x226.

  private val x244 = {
    import graft.ops.Search._
    val qvals = Queries.flatMap { case (q, ts) => ts.map(t => s"('$q', '$t')") }
      .mkString(", ")
    raw"""WITH $toksCte,
         |qt(query, term) AS (VALUES $qvals),
         |dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM tok),
         |n AS (SELECT count(*) AS n_docs, sum(dl) AS total_toks FROM dl),
         |tfg AS (
         |  SELECT doc_id, tok2 AS tok, CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, unnest(toks) AS tok2 FROM tok) GROUP BY 1, 2),
         |tfc AS (
         |  SELECT doc_id, tok, tf,
         |         row_number() OVER (PARTITION BY tok
         |           ORDER BY tf DESC, doc_id) AS crn
         |  FROM tfg),
         |dfq AS (
         |  SELECT tok, count(*) AS df FROM tfg
         |  WHERE tok IN (SELECT DISTINCT term FROM qt) GROUP BY 1),
         |contrib AS MATERIALIZED (
         |  SELECT q.query, q.term, t.doc_id, t.crn,
         |         CAST((t.crn - 1) // $BlockMaxLen AS BIGINT) AS blk,
         |         CAST(floor(ln(1.0 + (n.n_docs - f.df + 0.5) / (f.df + 0.5))
         |                    * (t.tf * ${K1 + 1}) / (t.tf + $K1 * ((1.0 - $B)
         |                       + $B * (dl.dl::DOUBLE * n.n_docs / n.total_toks)))
         |                    * $ScoreScale + 0.5) AS BIGINT) AS fp
         |  FROM qt q JOIN tfc t ON t.tok = q.term
         |       JOIN dfq f ON f.tok = t.tok
         |       JOIN dl ON dl.doc_id = t.doc_id
         |       CROSS JOIN n),
         |theta AS (
         |  SELECT query, total AS theta FROM (
         |    SELECT query, doc_id, total,
         |           row_number() OVER (PARTITION BY query
         |             ORDER BY total DESC, doc_id) AS rnk
         |    FROM (SELECT query, doc_id, CAST(sum(fp) AS BIGINT) AS total
         |          FROM contrib WHERE crn <= $MaxScoreBootCap GROUP BY 1, 2))
         |  WHERE rnk = $TopK),
         |terms AS (
         |  SELECT u.query, u.term,
         |         u.cum >= coalesce(th.theta, 0) AS essential
         |  FROM (SELECT query, term, max(fp) AS ub,
         |               sum(max(fp)) OVER (PARTITION BY query
         |                 ORDER BY max(fp) ASC, term ASC
         |                 ROWS UNBOUNDED PRECEDING) AS cum
         |        FROM contrib GROUP BY 1, 2) u
         |  LEFT JOIN theta th USING (query)),
         |cand AS MATERIALIZED (
         |  SELECT DISTINCT c.query, c.doc_id
         |  FROM contrib c JOIN terms t ON t.query = c.query AND t.term = c.term
         |  WHERE t.essential),
         |bub AS (
         |  SELECT query, term, blk, max(fp) AS bub
         |  FROM contrib GROUP BY 1, 2, 3),
         |candbm AS MATERIALIZED (
         |  SELECT query, doc_id FROM (
         |    SELECT c.query, c.doc_id, CAST(sum(b.bub) AS BIGINT) AS bound,
         |           any_value(th.theta) AS theta
         |    FROM contrib c
         |    JOIN cand d ON d.query = c.query AND d.doc_id = c.doc_id
         |    JOIN bub b ON b.query = c.query AND b.term = c.term
         |              AND b.blk = c.blk
         |    LEFT JOIN theta th ON th.query = c.query
         |    GROUP BY 1, 2)
         |  WHERE bound >= coalesce(theta, 0)),
         |etop AS MATERIALIZED (
         |  SELECT query, doc_id FROM (
         |    SELECT query, doc_id,
         |           row_number() OVER (PARTITION BY query
         |             ORDER BY total DESC, doc_id) AS rnk
         |    FROM (SELECT query, doc_id, CAST(sum(fp) AS BIGINT) AS total
         |          FROM contrib GROUP BY 1, 2))
         |  WHERE rnk <= $TopK),
         |ptop AS (
         |  SELECT query, doc_id FROM (
         |    SELECT query, doc_id,
         |           row_number() OVER (PARTITION BY query
         |             ORDER BY total DESC, doc_id) AS rnk
         |    FROM (SELECT c.query, c.doc_id, CAST(sum(fp) AS BIGINT) AS total
         |          FROM contrib c
         |          JOIN candbm d ON d.query = c.query AND d.doc_id = c.doc_id
         |          GROUP BY 1, 2))
         |  WHERE rnk <= $TopK),
         |hits AS (
         |  SELECT e.query, count(*) AS hits
         |  FROM etop e JOIN ptop p ON p.query = e.query AND p.doc_id = e.doc_id
         |  GROUP BY 1),
         |mstat AS (
         |  SELECT query, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_matching
         |  FROM contrib GROUP BY 1),
         |cstat AS (
         |  SELECT query, CAST(count(*) AS BIGINT) AS n_candidates
         |  FROM cand GROUP BY 1),
         |bstat AS (
         |  SELECT query, CAST(count(*) AS BIGINT) AS n_candidates_bm
         |  FROM candbm GROUP BY 1),
         |estat AS (
         |  SELECT query, CAST(count(*) AS BIGINT) AS n_exact FROM etop GROUP BY 1)
         |SELECT m.query, m.n_matching, c.n_candidates,
         |       CAST(coalesce(b.n_candidates_bm, 0) AS BIGINT)
         |         AS n_candidates_bm,
         |       ${round4("1.0 - c.n_candidates::DOUBLE / m.n_matching::DOUBLE")}
         |         AS pruned_frac,
         |       ${round4("1.0 - coalesce(b.n_candidates_bm, 0)::DOUBLE / m.n_matching::DOUBLE")}
         |         AS pruned_frac_bm,
         |       e.n_exact, CAST(coalesce(h.hits, 0) AS BIGINT) AS hits
         |FROM mstat m JOIN cstat c USING (query)
         |     LEFT JOIN bstat b USING (query)
         |     JOIN estat e USING (query) LEFT JOIN hits h USING (query)""".stripMargin
  }

  // ---- x227 RM3 pseudo-relevance-feedback expansion ----------------
  // Mirrors Search.rm3Expand exactly: x51 round 1, top-Rm3FbDocs R
  // set, grid MLE relevance model (top-Rm3FbTerms, normalized over
  // that set), λ=1/2 midpoint interpolation via full outer join,
  // weighted round-2 rescoring with in_r1 membership.

  private val x227 = {
    import graft.ops.Search._
    val qvals = Queries.flatMap { case (q, ts) => ts.map(t => s"('$q', '$t')") }
      .mkString(", ")
    val qlens = Queries.map { case (q, ts) => s"('$q', ${ts.size})" }
      .mkString(", ")
    raw"""WITH $toksCte,
         |qt(query, term) AS (VALUES $qvals),
         |ql(query, nq) AS (VALUES $qlens),
         |dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM tok),
         |n AS (SELECT count(*) AS n_docs, sum(dl) AS total_toks FROM dl),
         |tfg AS MATERIALIZED (
         |  SELECT doc_id, tok2 AS tok, CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, unnest(toks) AS tok2 FROM tok) GROUP BY 1, 2),
         |dfq1 AS (
         |  SELECT tok, count(*) AS df FROM tfg
         |  WHERE tok IN (SELECT DISTINCT term FROM qt) GROUP BY 1),
         |r1 AS MATERIALIZED (
         |  SELECT query, doc_id FROM (
         |    SELECT query, doc_id,
         |           row_number() OVER (PARTITION BY query
         |             ORDER BY total DESC, doc_id) AS rnk
         |    FROM (SELECT q.query, t.doc_id,
         |                 CAST(sum(CAST(floor(
         |                   ln(1.0 + (n.n_docs - f.df + 0.5) / (f.df + 0.5))
         |                   * (t.tf * ${K1 + 1}) / (t.tf + $K1 * ((1.0 - $B)
         |                      + $B * (dl.dl::DOUBLE * n.n_docs / n.total_toks)))
         |                   * $ScoreScale + 0.5) AS BIGINT)) AS BIGINT) AS total
         |          FROM qt q JOIN tfg t ON t.tok = q.term
         |               JOIN dfq1 f ON f.tok = t.tok
         |               JOIN dl ON dl.doc_id = t.doc_id
         |               CROSS JOIN n
         |          GROUP BY 1, 2))
         |  WHERE rnk <= $Rm3FbDocs),
         |fbraw AS (
         |  SELECT query, term, mass,
         |         row_number() OVER (PARTITION BY query
         |           ORDER BY mass DESC, term) AS mrn
         |  FROM (SELECT r.query, t.tok AS term,
         |               CAST(sum(CAST(floor(t.tf * ${Rm3Scale}.0 / d.dl + 0.5)
         |                 AS BIGINT)) AS BIGINT) AS mass
         |        FROM r1 r JOIN tfg t ON t.doc_id = r.doc_id
         |             JOIN dl d ON d.doc_id = r.doc_id
         |        GROUP BY 1, 2)),
         |fb AS (
         |  SELECT query, term,
         |         CAST(floor(mass * ${Rm3Scale}.0 /
         |           sum(mass) OVER (PARTITION BY query) + 0.5) AS BIGINT) AS pfb4
         |  FROM fbraw WHERE mrn <= $Rm3FbTerms),
         |orig AS (
         |  SELECT q.query, q.term,
         |         CAST(floor(${Rm3Scale}.0 / l.nq + 0.5) AS BIGINT) AS worig4
         |  FROM qt q JOIN ql l ON l.query = q.query),
         |wts AS MATERIALIZED (
         |  SELECT coalesce(o.query, f.query) AS query,
         |         coalesce(o.term, f.term) AS term,
         |         CAST(floor((coalesce(o.worig4, 0) + coalesce(f.pfb4, 0)) / 2.0
         |           + 0.5) AS BIGINT) AS w4
         |  FROM orig o FULL OUTER JOIN fb f
         |    ON f.query = o.query AND f.term = o.term),
         |dfq2 AS (
         |  SELECT tok, count(*) AS df FROM tfg
         |  WHERE tok IN (SELECT DISTINCT term FROM wts) GROUP BY 1),
         |r2 AS (
         |  SELECT query, doc_id, total,
         |         row_number() OVER (PARTITION BY query
         |           ORDER BY total DESC, doc_id) AS rnk
         |  FROM (SELECT w.query, t.doc_id,
         |               CAST(sum(w.w4 * CAST(floor(
         |                 ln(1.0 + (n.n_docs - f.df + 0.5) / (f.df + 0.5))
         |                 * (t.tf * ${K1 + 1}) / (t.tf + $K1 * ((1.0 - $B)
         |                    + $B * (dl.dl::DOUBLE * n.n_docs / n.total_toks)))
         |                 * $ScoreScale + 0.5) AS BIGINT)) AS BIGINT) AS total
         |        FROM wts w JOIN tfg t ON t.tok = w.term
         |             JOIN dfq2 f ON f.tok = t.tok
         |             JOIN dl ON dl.doc_id = t.doc_id
         |             CROSS JOIN n
         |        GROUP BY 1, 2))
         |SELECT r.query, r.doc_id, CAST(r.rnk AS BIGINT) AS rnk,
         |       ${round4(s"r.total::DOUBLE / ${ScoreScale * Rm3Scale}")} AS score,
         |       (o.doc_id IS NOT NULL) AS in_r1
         |FROM r2 r LEFT JOIN r1 o ON o.query = r.query AND o.doc_id = r.doc_id
         |WHERE r.rnk <= $TopK""".stripMargin
  }

  // ---- x228 CDC change feed -----------------------------------------
  // The engine replays load -> bucket-1 rewrite (+1000 chars, plus one
  // offset-keyed insert per seed) -> mod-7 tombstone delete and diffs
  // v1 -> v3; the oracle derives the same feed from the original table.

  private val x228 = {
    val off = 10000000L
    val nb = graft.sources.TxnLog.NumBuckets
    raw"""SELECT doc_id + $off AS doc_id, lang, n_chars + 1000 AS n_chars,
         |       'insert' AS change_type
         |FROM documents WHERE doc_id % $nb = 1
         |UNION ALL
         |SELECT doc_id, lang, n_chars, 'delete' AS change_type
         |FROM documents WHERE doc_id % 7 = 0
         |UNION ALL
         |SELECT doc_id, lang, n_chars, 'update_preimage' AS change_type
         |FROM documents WHERE doc_id % $nb = 1 AND doc_id % 7 <> 0
         |UNION ALL
         |SELECT doc_id, lang, n_chars + 1000 AS n_chars,
         |       'update_postimage' AS change_type
         |FROM documents WHERE doc_id % $nb = 1 AND doc_id % 7 <> 0""".stripMargin
  }

  // ---- x230/x231 HyperLogLog distinct sketch ------------------------
  // Mirrors DataProfile.hllReg/hllRank/hllFinalize exactly: 60-bit md5
  // hash, 8-bit register, integer rank 53 - bitlen(h >> 8), exact
  // BIGINT rank sum on the 2^53 grid, alpha*m^2 estimate with the
  // 2.5m linear-counting switchover — then 4dp rounding, so the
  // ESTIMATE itself hash-checks.

  /** Shared estimate finalizer: input CTE must expose
    * (`keyList` cols, n_present BIGINT, s_present BIGINT). */
  private def hllSelect(src: String, keyList: String): String =
    raw"""SELECT $keyList, v_zero,
         |       ${round4("CASE WHEN raw <= 640.0 AND v_zero > 0 " +
            "THEN 256.0 * ln(256.0 / v_zero::DOUBLE) ELSE raw END")} AS hll_est
         |FROM (
         |  SELECT $keyList, CAST(256 - n_present AS BIGINT) AS v_zero,
         |         0.7213 / (1.0 + 1.079 / 256.0) * 65536.0
         |           * 9007199254740992.0
         |           / ((s_present + (256 - n_present) * 9007199254740992)::DOUBLE)
         |           AS raw
         |  FROM $src)""".stripMargin

  private val hllRankSql =
    "CASE WHEN (h >> 8) = 0 THEN 53 ELSE 53 - length(bin(h >> 8)) END"

  private val x230 =
    raw"""WITH h AS (
         |  SELECT event_type,
         |         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
         |           AS h,
         |         user_id
         |  FROM events WHERE user_id IS NOT NULL),
         |r AS (
         |  SELECT event_type, h % 256 AS j, max($hllRankSql) AS m
         |  FROM h GROUP BY 1, 2),
         |s AS (
         |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_present,
         |         CAST(sum(1::BIGINT << CAST(53 - m AS INT)) AS BIGINT)
         |           AS s_present
         |  FROM r GROUP BY 1),
         |x AS (
         |  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
         |  FROM h GROUP BY 1),
         |est AS (${hllSelect("s", "event_type")})
         |SELECT x.event_type, x.n_exact, e.v_zero, e.hll_est,
         |       ${round4("(e.hll_est - x.n_exact::DOUBLE) / x.n_exact::DOUBLE")}
         |         AS rel_err
         |FROM x JOIN est e USING (event_type)""".stripMargin

  private val x231 =
    raw"""WITH $wmCte,
         |h AS (
         |  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d, event_type,
         |         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
         |           AS h
         |  FROM events WHERE user_id IS NOT NULL),
         |sealed AS (
         |  -- TIMESTAMP cast so the day string matches Spark's
         |  -- window.start ('yyyy-MM-dd HH:mm:ss', not a bare DATE)
         |  SELECT CAST(d AS VARCHAR) AS day, event_type, h
         |  FROM h, wm WHERE epoch_ms(d) + 86400000 <= wm),
         |r AS (
         |  SELECT day, event_type, h % 256 AS j, max($hllRankSql) AS m
         |  FROM sealed GROUP BY 1, 2, 3),
         |s AS (
         |  SELECT day, event_type, CAST(count(*) AS BIGINT) AS n_present,
         |         CAST(sum(1::BIGINT << CAST(53 - m AS INT)) AS BIGINT)
         |           AS s_present
         |  FROM r GROUP BY 1, 2)
         |${hllSelect("s", "day, event_type")}""".stripMargin

  // ---- x233 personalized PageRank ------------------------------------
  // The x59 unrolled integer power iteration with teleport mass
  // restricted to the doc_id % PprSeedMod = 0 seed set.

  private val x233 = {
    import graft.ops.Graph._
    def seed(node: String, mass: Long): String =
      s"CASE WHEN $node % $PprSeedMod = 0 THEN $mass ELSE 0 END"
    def step(i: Int): String =
      raw"""p$i AS (
           |  SELECT wd.v AS doc_id,
           |         CAST(${seed("wd.v", Teleport)}
           |              + ((sum(p${i - 1}.rank // wd.deg) * 17) // 20)
           |              AS BIGINT) AS rank
           |  FROM wd JOIN p${i - 1} ON wd.u = p${i - 1}.doc_id
           |  GROUP BY wd.v)""".stripMargin
    raw"""WITH $x5Ctes,
         |prpairs AS (
         |$x5Select),
         |edges AS (
         |  SELECT doc_a AS u, doc_b AS v FROM prpairs
         |  UNION ALL SELECT doc_b, doc_a FROM prpairs),
         |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY 1),
         |wd AS (SELECT e.u, e.v, d.deg FROM edges e JOIN deg d USING (u)),
         |p0 AS (SELECT u AS doc_id,
         |              CAST(${seed("u", RankScale)} AS BIGINT) AS rank FROM deg),
         |${(1 to PrIters).map(step).mkString(",\n")}
         |SELECT doc_id, rank FROM p$PrIters""".stripMargin
  }

  // ---- x234 KMV set-operation sketch ---------------------------------
  // Mirrors DataProfile.kmvSetOps exactly: per-type k=64 min-hash
  // sketches, merged min-k per pair, (k-1)*space/h_k union estimate
  // (exact nk below k), member-overlap Jaccard, intersection =
  // jaccard * union on the rounded grid; exact audit legs row-joined.

  private val x234 = {
    import graft.ops.DataProfile.{KmvK, KmvSpace}
    raw"""WITH du AS (
         |  SELECT DISTINCT event_type, user_id FROM events
         |  WHERE user_id IS NOT NULL),
         |ph AS (
         |  SELECT event_type,
         |         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
         |           AS h
         |  FROM du),
         |sk AS MATERIALIZED (
         |  SELECT event_type, h FROM (
         |    SELECT event_type, h,
         |           row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
         |    FROM ph) WHERE rn <= $KmvK),
         |ty AS (SELECT DISTINCT event_type FROM sk),
         |tp AS (SELECT a.event_type AS type_a, b.event_type AS type_b
         |       FROM ty a JOIN ty b ON a.event_type < b.event_type),
         |mg AS (
         |  SELECT DISTINCT type_a, type_b, h FROM (
         |    SELECT t.type_a, t.type_b, s.h
         |    FROM tp t JOIN sk s ON s.event_type = t.type_a
         |    UNION ALL
         |    SELECT t.type_a, t.type_b, s.h
         |    FROM tp t JOIN sk s ON s.event_type = t.type_b)),
         |mk AS MATERIALIZED (
         |  SELECT type_a, type_b, h FROM (
         |    SELECT type_a, type_b, h,
         |           row_number() OVER (PARTITION BY type_a, type_b
         |             ORDER BY h) AS rn
         |    FROM mg) WHERE rn <= $KmvK),
         |kth AS (
         |  SELECT type_a, type_b, CAST(max(h) AS BIGINT) AS hk,
         |         CAST(count(*) AS BIGINT) AS nk
         |  FROM mk GROUP BY 1, 2),
         |ovl AS (
         |  SELECT m.type_a, m.type_b,
         |         CAST(sum(CASE WHEN a.h IS NOT NULL AND b.h IS NOT NULL
         |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_both
         |  FROM mk m
         |  LEFT JOIN sk a ON a.event_type = m.type_a AND a.h = m.h
         |  LEFT JOIN sk b ON b.event_type = m.type_b AND b.h = m.h
         |  GROUP BY 1, 2),
         |sz AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
         |       FROM du GROUP BY 1),
         |xi AS (
         |  SELECT a.event_type AS type_a, b.event_type AS type_b,
         |         CAST(count(*) AS BIGINT) AS exact_inter
         |  FROM du a JOIN du b
         |    ON b.user_id = a.user_id AND a.event_type < b.event_type
         |  GROUP BY 1, 2)
         |SELECT type_a, type_b, n_a, n_b, exact_union, exact_inter,
         |       kmv_union, jaccard_est,
         |       ${round4("jaccard_est * kmv_union")} AS kmv_inter
         |FROM (
         |  SELECT t.type_a, t.type_b, sa.n AS n_a, sb.n AS n_b,
         |         CAST(sa.n + sb.n - coalesce(x.exact_inter, 0) AS BIGINT)
         |           AS exact_union,
         |         CAST(coalesce(x.exact_inter, 0) AS BIGINT) AS exact_inter,
         |         ${round4(s"CASE WHEN k.nk < $KmvK THEN k.nk::DOUBLE " +
            s"ELSE ${(KmvK - 1).toDouble} * $KmvSpace / k.hk::DOUBLE END")}
         |           AS kmv_union,
         |         ${round4("o.n_both::DOUBLE / k.nk::DOUBLE")} AS jaccard_est
         |  FROM tp t
         |  JOIN sz sa ON sa.event_type = t.type_a
         |  JOIN sz sb ON sb.event_type = t.type_b
         |  JOIN kth k USING (type_a, type_b)
         |  JOIN ovl o USING (type_a, type_b)
         |  LEFT JOIN xi x USING (type_a, type_b))""".stripMargin
  }

  // ---- x237 incremental view maintenance from the change feed --------
  // The engine advances the v1 aggregate by the x228 feed's deltas
  // only; the oracle recomputes the v3 per-lang aggregate from scratch
  // on the original table (v3 = survivors with bucket-1 +1000, plus
  // the offset-keyed inserts).

  private val x237 = {
    val nb = graft.sources.TxnLog.NumBuckets
    raw"""WITH v3 AS (
         |  SELECT lang,
         |         n_chars + CASE WHEN doc_id % $nb = 1 THEN 1000 ELSE 0 END AS nc
         |  FROM documents WHERE doc_id % 7 <> 0
         |  UNION ALL
         |  SELECT lang, n_chars + 1000 AS nc
         |  FROM documents WHERE doc_id % $nb = 1)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(nc) AS BIGINT) AS sum_chars
         |FROM v3 GROUP BY 1""".stripMargin
  }

  // ---- x238 histogram quantile sketch ---------------------------------
  // Mirrors DataProfile.histQuantiles exactly: global-extrema 128-bin
  // histogram, percentile = right edge of the first bin whose
  // cumulative count reaches ceil(p*n), beside the exact rank-selected
  // value.

  private val x238 = {
    val bins = graft.ops.DataProfile.HistBins
    def rk(p: String): String = s"greatest(1, CAST(ceil($p * n) AS BIGINT))"
    def edge(b: String): String =
      round4(s"lo + ($b + 1)::DOUBLE * (hi - lo) / $bins")
    raw"""WITH vals AS (
         |  SELECT event_type, value::DOUBLE AS v FROM events
         |  WHERE value IS NOT NULL),
         |ext AS (SELECT min(v) AS lo, max(v) AS hi FROM vals),
         |binned AS (
         |  SELECT event_type,
         |         CASE WHEN hi = lo THEN 0 ELSE
         |           least(${bins - 1},
         |                 CAST(floor((v - lo) / (hi - lo) * $bins) AS INT))
         |         END AS bin,
         |         count(*) AS c
         |  FROM vals CROSS JOIN ext GROUP BY 1, 2),
         |cum AS (
         |  SELECT event_type, bin, c,
         |         sum(c) OVER (PARTITION BY event_type ORDER BY bin
         |                      ROWS UNBOUNDED PRECEDING) AS cum,
         |         sum(c) OVER (PARTITION BY event_type) AS n
         |  FROM binned),
         |eb AS (
         |  SELECT event_type, CAST(max(n) AS BIGINT) AS n,
         |         min(CASE WHEN cum >= ${rk("0.5")} THEN bin END) AS b50,
         |         min(CASE WHEN cum >= ${rk("0.9")} THEN bin END) AS b90,
         |         min(CASE WHEN cum >= ${rk("0.99")} THEN bin END) AS b99
         |  FROM cum GROUP BY 1),
         |rks AS (
         |  SELECT event_type, v,
         |         row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn,
         |         count(*) OVER (PARTITION BY event_type) AS n
         |  FROM vals),
         |ex AS (
         |  SELECT event_type,
         |         max(CASE WHEN rn = ${rk("0.5")} THEN v END) AS p50_exact,
         |         max(CASE WHEN rn = ${rk("0.9")} THEN v END) AS p90_exact,
         |         max(CASE WHEN rn = ${rk("0.99")} THEN v END) AS p99_exact
         |  FROM rks GROUP BY 1)
         |SELECT e.event_type, b.n,
         |       ${round4("e.p50_exact")} AS p50_exact, ${edge("b.b50")} AS p50_est,
         |       ${round4("e.p90_exact")} AS p90_exact, ${edge("b.b90")} AS p90_est,
         |       ${round4("e.p99_exact")} AS p99_exact, ${edge("b.b99")} AS p99_est
         |FROM ex e JOIN eb b USING (event_type) CROSS JOIN ext""".stripMargin
  }

  // ---- x232 bitmap-index DAU retention -------------------------------
  // The engine packs per-day user sets into 64-bit words and computes
  // retention by word-AND popcounts; the oracle is the NAIVE row
  // self-join — different algorithms, same exact integers.

  private val x232 =
    raw"""WITH a AS (
         |  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
         |  FROM events WHERE user_id IS NOT NULL AND user_id >= 0),
         |d AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM a GROUP BY 1),
         |r AS (
         |  SELECT x.day, CAST(count(*) AS BIGINT) AS retained
         |  FROM a x JOIN a b ON b.user_id = x.user_id AND b.day = x.day + 1
         |  GROUP BY 1)
         |SELECT CAST(d.day AS VARCHAR) AS day, d.dau,
         |       CAST(coalesce(r.retained, 0) AS BIGINT) AS retained,
         |       ${round4("coalesce(r.retained, 0)::DOUBLE / d.dau::DOUBLE")}
         |         AS retention
         |FROM d LEFT JOIN r USING (day)""".stripMargin

  // ---- x236 proximity-augmented BM25 ---------------------------------
  // Mirrors Search.proximityBm25 exactly: the x51 unigram leg doubled,
  // plus a bigram leg over the query's adjacent term pairs (bigram df,
  // same dl normalization), summed on the ScoreScale grid.

  private val x236 = {
    import graft.ops.Search._
    val qvals = Queries.flatMap { case (q, ts) => ts.map(t => s"('$q', '$t')") }
      .mkString(", ")
    val pvals = Queries.flatMap { case (q, ts) =>
      ts.zip(ts.drop(1)).map { case (a, b) => s"('$q', '$a', '$b')" }
    }.mkString(", ")
    def fpExpr(tfc: String, dfc: String): String =
      raw"""CAST(floor(ln(1.0 + (n.n_docs - $dfc + 0.5) / ($dfc + 0.5))
           |           * ($tfc * ${K1 + 1}) / ($tfc + $K1 * ((1.0 - $B)
           |              + $B * (dl.dl::DOUBLE * n.n_docs / n.total_toks)))
           |           * $ScoreScale + 0.5) AS BIGINT)""".stripMargin
    raw"""WITH $toksCte,
         |qt(query, term) AS (VALUES $qvals),
         |qp(query, qw1, qw2) AS (VALUES $pvals),
         |dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM tok),
         |n AS (SELECT count(*) AS n_docs, sum(dl) AS total_toks FROM dl),
         |tfg AS (
         |  SELECT doc_id, tok2 AS tok, CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, unnest(toks) AS tok2 FROM tok) GROUP BY 1, 2),
         |dfq AS (
         |  SELECT tok, count(*) AS df FROM tfg
         |  WHERE tok IN (SELECT DISTINCT term FROM qt) GROUP BY 1),
         |uni AS (
         |  SELECT q.query, t.doc_id, ${fpExpr("t.tf", "f.df")} * 2 AS wfp
         |  FROM qt q JOIN tfg t ON t.tok = q.term
         |       JOIN dfq f ON f.tok = t.tok
         |       JOIN dl ON dl.doc_id = t.doc_id
         |       CROSS JOIN n),
         |btf AS (
         |  SELECT b.doc_id, b.w1, b.w2, CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
         |        FROM tok, unnest(range(1, len(toks))) AS ti(i)
         |        WHERE len(toks) >= 2) b
         |  JOIN (SELECT DISTINCT qw1, qw2 FROM qp) z
         |    ON z.qw1 = b.w1 AND z.qw2 = b.w2
         |  GROUP BY 1, 2, 3),
         |dfb AS (SELECT w1, w2, count(*) AS df FROM btf GROUP BY 1, 2),
         |bi AS (
         |  SELECT p.query, t.doc_id, ${fpExpr("t.tf", "f.df")} AS wfp
         |  FROM qp p JOIN btf t ON t.w1 = p.qw1 AND t.w2 = p.qw2
         |       JOIN dfb f ON f.w1 = t.w1 AND f.w2 = t.w2
         |       JOIN dl ON dl.doc_id = t.doc_id
         |       CROSS JOIN n)
         |SELECT query, doc_id, CAST(rnk AS BIGINT) AS rnk,
         |       ${round4(s"total::DOUBLE / ${2L * ScoreScale}")} AS score
         |FROM (
         |  SELECT query, doc_id, total,
         |         row_number() OVER (PARTITION BY query
         |           ORDER BY total DESC, doc_id) AS rnk
         |  FROM (SELECT query, doc_id, CAST(sum(wfp) AS BIGINT) AS total
         |        FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)
         |        GROUP BY 1, 2))
         |WHERE rnk <= $TopK""".stripMargin
  }

  // ---- x239 HLL sketch rollup ----------------------------------------
  // Mirrors DataProfile.hllRollup exactly: day-level registers, then
  // the TOTAL derived by merging the day registers (max per j) — the
  // mergeability contract — with exact audits at both levels.

  private val x239 =
    raw"""WITH ev AS (
         |  SELECT CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR) AS day,
         |         user_id,
         |         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
         |           AS h
         |  FROM events WHERE user_id IS NOT NULL),
         |r AS (
         |  SELECT day, h % 256 AS j, max($hllRankSql) AS m
         |  FROM ev GROUP BY 1, 2),
         |rt AS (SELECT j, max(m) AS m FROM r GROUP BY 1),
         |sd AS (
         |  SELECT day AS key, CAST(count(*) AS BIGINT) AS n_present,
         |         CAST(sum(1::BIGINT << CAST(53 - m AS INT)) AS BIGINT)
         |           AS s_present
         |  FROM r GROUP BY 1),
         |st AS (
         |  SELECT '' AS key, CAST(count(*) AS BIGINT) AS n_present,
         |         CAST(sum(1::BIGINT << CAST(53 - m AS INT)) AS BIGINT)
         |           AS s_present
         |  FROM rt),
         |fin AS (
         |  SELECT 'day' AS level, key, v_zero, hll_est
         |  FROM (${hllSelect("sd", "key")})
         |  UNION ALL
         |  SELECT 'total' AS level, key, v_zero, hll_est
         |  FROM (${hllSelect("st", "key")})),
         |xd AS (
         |  SELECT 'day' AS level, day AS key,
         |         CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
         |  FROM ev GROUP BY 2
         |  UNION ALL
         |  SELECT 'total' AS level, '' AS key,
         |         CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
         |  FROM ev)
         |SELECT x.level, x.key, x.n_exact, f.v_zero, f.hll_est,
         |       ${round4("(f.hll_est - x.n_exact::DOUBLE) / x.n_exact::DOUBLE")}
         |         AS rel_err
         |FROM xd x JOIN fin f ON f.level = x.level AND f.key = x.key""".stripMargin

  // ---- x240 as-of join with tolerance ---------------------------------
  // Mirrors Temporal.purchaseAsofTolerance: the x45 ASOF attribution
  // with matches older than AsofTolMs rejected (null id/lag, matched
  // false) — accept and reject paths in one hash.

  private val x240 = {
    val tol = graft.ops.Temporal.AsofTolMs
    raw"""WITH buys AS (
         |  SELECT event_id AS buy_id, user_id, epoch_ms(ts) AS buy_ms
         |  FROM events WHERE event_type = 'purchase'),
         |signups AS (
         |  SELECT user_id, epoch_ms(ts) AS ms, max(event_id) AS signup_id
         |  FROM events WHERE event_type = 'signup' GROUP BY 1, 2)
         |SELECT b.buy_id, b.user_id, b.buy_ms,
         |       CASE WHEN b.buy_ms - s.ms <= $tol THEN s.signup_id END
         |         AS signup_id,
         |       CASE WHEN b.buy_ms - s.ms <= $tol THEN b.buy_ms - s.ms END
         |         AS lag_ms,
         |       coalesce(b.buy_ms - s.ms <= $tol, FALSE) AS matched
         |FROM buys b ASOF LEFT JOIN signups s
         |  ON b.user_id = s.user_id AND b.buy_ms >= s.ms""".stripMargin
  }

  // ---- x220 BM25F fielded retrieval --------------------------------
  // Mirrors Search.bm25fSearch exactly: title = first TitleTokens
  // tokens / body = rest, per-field tf via positional conditional
  // sums, weighted field frequency normalized per field against its
  // own average length, x51 idf on document df, contributions on the
  // ScoreScale integer grid.

  private val x220 = {
    import graft.ops.Search._
    val qvals = Queries.flatMap { case (q, ts) => ts.map(t => s"('$q', '$t')") }
      .mkString(", ")
    val tt = TitleTokens
    raw"""WITH $toksCte,
         |qt(query, term) AS (VALUES $qvals),
         |posed AS (
         |  SELECT doc_id, u.p AS pos, u.tk AS tok
         |  FROM tok, unnest([{'p': i - 1, 'tk': toks[i]}
         |                    for i in range(1, len(toks) + 1)]) AS t(u)),
         |tff AS (
         |  SELECT doc_id, tok,
         |         CAST(sum(CASE WHEN pos < $tt THEN 1 ELSE 0 END) AS BIGINT) AS tft,
         |         CAST(sum(CASE WHEN pos >= $tt THEN 1 ELSE 0 END) AS BIGINT) AS tfb
         |  FROM posed GROUP BY 1, 2),
         |dlf AS (
         |  SELECT doc_id, CAST(least(len(toks), $tt) AS BIGINT) AS dlt,
         |         CAST(greatest(len(toks) - $tt, 0) AS BIGINT) AS dlb
         |  FROM tok),
         |n AS (SELECT count(*) AS n_docs, sum(dlt) AS tot_t, sum(dlb) AS tot_b
         |      FROM dlf),
         |dfq AS (
         |  SELECT tok, count(*) AS df FROM tff
         |  WHERE tok IN (SELECT DISTINCT term FROM qt) GROUP BY 1),
         |wtf AS (
         |  SELECT q.query, t.doc_id, f.df, n.n_docs,
         |         (CASE WHEN n.tot_t > 0 THEN
         |            t.tft::DOUBLE * $WTitle / (${1.0 - B} + $B
         |              * (d.dlt::DOUBLE * n.n_docs / n.tot_t))
         |          ELSE 0.0 END
         |        + CASE WHEN n.tot_b > 0 THEN
         |            t.tfb::DOUBLE * $WBody / (${1.0 - B} + $B
         |              * (d.dlb::DOUBLE * n.n_docs / n.tot_b))
         |          ELSE 0.0 END) AS tfw
         |  FROM qt q JOIN tff t ON t.tok = q.term
         |       JOIN dfq f ON f.tok = t.tok
         |       JOIN dlf d ON d.doc_id = t.doc_id
         |       CROSS JOIN n),
         |contrib AS (
         |  SELECT query, doc_id,
         |         CAST(floor(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
         |                    * (tfw * ${K1 + 1}) / ($K1 + tfw)
         |                    * $ScoreScale + 0.5) AS BIGINT) AS fp
         |  FROM wtf),
         |scored AS (
         |  SELECT query, doc_id, CAST(sum(fp) AS BIGINT) AS total
         |  FROM contrib GROUP BY 1, 2)
         |SELECT query, doc_id, ${round4(s"total::DOUBLE / $ScoreScale")} AS score,
         |       CAST(rnk AS BIGINT) AS rnk
         |FROM (SELECT *, row_number() OVER (PARTITION BY query
         |        ORDER BY total DESC, doc_id) AS rnk FROM scored)
         |WHERE rnk <= $TopK""".stripMargin
  }

  // ---- x52 semantic dedup (k-means centroid blocking) --------------
  private val x52 = {
    // table-0 hyperplane sub-bucket — the refinement for cells above
    // Similarity.MaxCell; identical plane literals to the Spark side
    def wLit(p: Int): String =
      Similarity.planeWeights(p).map(w => if (w > 0) "1.0" else "-1.0")
        .mkString("([", ",", "]::DOUBLE[])")
    val sub0 = (0 until Similarity.LshBitsPerTable).map { i =>
      s"CASE WHEN ${dotExpr(wLit(i), "cand.v")} > 0 THEN ${1 << i} ELSE 0 END"
    }.mkString("(", " + ", ")")
    raw"""WITH $kmeansCandCtes,
         |celln AS (SELECT cell, count(*) AS cell_n FROM cand GROUP BY 1),
         |cs AS (
         |  SELECT cand.vec_id, cand.v, cand.nrm, cand.cell,
         |         CASE WHEN celln.cell_n > ${Similarity.MaxCell}
         |              THEN $sub0 ELSE 0 END AS sub
         |  FROM cand JOIN celln USING (cell))
         |SELECT vec_a, vec_b, cos_sim FROM (
         |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |         ${cosExpr("a.v", "a.nrm", "b.v", "b.nrm")} AS cos_sim
         |  FROM cs a JOIN cs b
         |    ON a.cell = b.cell AND a.sub = b.sub AND a.vec_id < b.vec_id)
         |WHERE cos_sim >= ${Similarity.CosineThreshold}""".stripMargin
  }

  // ---- x53 hourly pivot (crosstab) ---------------------------------
  private val x53 = {
    val cols = Events.EventTypes.map(t =>
      s"CAST(sum(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS \"$t\"")
      .mkString(",\n       ")
    raw"""SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour,
         |       $cols
         |FROM events GROUP BY 1""".stripMargin
  }

  // ---- x54 session funnel ------------------------------------------
  private val x54 =
    raw"""WITH $sessionCtes,
         |ps AS (
         |  SELECT user_id, session_seq,
         |         min(CASE WHEN event_type = 'view' THEN ms END) AS t_view,
         |         min(CASE WHEN event_type = 'click' THEN ms END) AS t_click,
         |         min(CASE WHEN event_type = 'purchase' THEN ms END) AS t_purchase
         |  FROM sessions GROUP BY 1, 2),
         |f AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_sessions,
         |         CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
         |         CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view
         |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_vc,
         |         CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view
         |                        AND t_purchase > t_click
         |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_vcp
         |  FROM ps)
         |SELECT '1_sessions' AS stage, n_sessions AS n FROM f
         |UNION ALL SELECT '2_view', n_view FROM f
         |UNION ALL SELECT '3_view_click', n_vc FROM f
         |UNION ALL SELECT '4_view_click_purchase', n_vcp FROM f""".stripMargin

  // ---- x55 cohort retention ----------------------------------------
  private val x55 =
    raw"""WITH days AS (
         |  SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day FROM events),
         |fd AS (SELECT user_id, min(day) AS cohort_day FROM days GROUP BY 1)
         |SELECT f.cohort_day, d.day - f.cohort_day AS day_offset,
         |       CAST(count(DISTINCT d.user_id) AS BIGINT) AS n_users
         |FROM days d JOIN fd f USING (user_id)
         |GROUP BY 1, 2""".stripMargin

  // ---- x56 stream-static join (batch-equivalence) ------------------
  // A stream-static inner join emits exactly the batch join: the
  // static side is fully visible to every micro-batch, no state cut.
  private val x56 =
    raw"""SELECT e.event_id, e.user_id, epoch_ms(e.ts) AS ms,
         |       $centsExpr AS value_cents, c.c_mktsegment
         |FROM events e JOIN customer c ON e.user_id = c.c_custkey
         |WHERE e.event_type = 'purchase'""".stripMargin

  // ---- x57 window-function suite -----------------------------------
  private val x57 =
    raw"""SELECT event_id, user_id, event_type, ms, value_cents,
         |       lag(event_type) OVER w AS prev_type,
         |       lead(event_type) OVER w AS next_type,
         |       CAST(row_number() OVER w AS BIGINT) AS seq,
         |       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
         |       ${round4("percent_rank() OVER w")} AS pct_rank,
         |       ${round4("cume_dist() OVER w")} AS cume
         |FROM (SELECT event_id, user_id, event_type, epoch_ms(ts) AS ms,
         |             $centsExpr AS value_cents
         |      FROM events)
         |WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)""".stripMargin

  // ---- x58 per-column profile --------------------------------------
  private val x58 =
    graft.ops.DataProfile.NumericCols.map { c =>
      raw"""SELECT '$c' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
           |       CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           |       CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           |       min($c)::DOUBLE AS min_v, max($c)::DOUBLE AS max_v
           |FROM lineitem""".stripMargin
    }.mkString("\nUNION ALL\n")

  // ---- x59 PageRank on the near-dup pair graph ---------------------
  private val x59 = {
    import graft.ops.Graph._
    def step(i: Int): String =
      raw"""r$i AS (
           |  SELECT wd.v AS doc_id,
           |         CAST($Teleport + ((sum(r${i - 1}.rank // wd.deg) * 17) // 20)
           |              AS BIGINT) AS rank
           |  FROM wd JOIN r${i - 1} ON wd.u = r${i - 1}.doc_id
           |  GROUP BY wd.v)""".stripMargin
    raw"""WITH $x5Ctes,
         |prpairs AS (
         |$x5Select),
         |edges AS (
         |  SELECT doc_a AS u, doc_b AS v FROM prpairs
         |  UNION ALL SELECT doc_b, doc_a FROM prpairs),
         |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY 1),
         |wd AS (SELECT e.u, e.v, d.deg FROM edges e JOIN deg d USING (u)),
         |r0 AS (SELECT u AS doc_id, CAST($RankScale AS BIGINT) AS rank FROM deg),
         |${(1 to PrIters).map(step).mkString(",\n")}
         |SELECT doc_id, rank FROM r$PrIters""".stripMargin
  }

  // ---- x60 token-id dictionary encode ------------------------------
  private val x60 =
    raw"""WITH $toksCte,
         |posts AS (
         |  SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS p
         |  FROM tok),
         |vocab AS (
         |  SELECT tok, CAST(row_number() OVER (ORDER BY tok) AS BIGINT) - 1 AS id
         |  FROM (SELECT DISTINCT tok FROM posts))
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |       string_agg(CAST(id AS VARCHAR), ',' ORDER BY p) AS ids_csv
         |FROM posts JOIN vocab USING (tok)
         |GROUP BY doc_id""".stripMargin

  // ---- x61 packed-bin offsets --------------------------------------
  private val x61 =
    raw"""WITH $toksCte,
         |t AS (SELECT doc_id, lang, CAST(len(toks) AS BIGINT) AS n_tokens FROM tok),
         |c AS (
         |  SELECT doc_id, lang, n_tokens,
         |         sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
         |                             ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM t)
         |SELECT doc_id, lang,
         |       CAST(floor((cum - n_tokens) / ${TextAnalysis.PackBudget}) AS BIGINT) AS bin,
         |       n_tokens,
         |       CAST(cum - n_tokens
         |            - CAST(floor((cum - n_tokens) / ${TextAnalysis.PackBudget}) AS BIGINT)
         |              * ${TextAnalysis.PackBudget} AS BIGINT) AS offset
         |FROM c""".stripMargin

  // ---- x62 per-domain cap ------------------------------------------
  private val x62 =
    raw"""SELECT doc_id, source, rnk FROM (
         |  SELECT doc_id, source,
         |         CAST(row_number() OVER (PARTITION BY source
         |           ORDER BY md5('cap:' || CAST(doc_id AS VARCHAR)) ASC, doc_id ASC)
         |           AS BIGINT) AS rnk
         |  FROM documents)
         |WHERE rnk <= ${TextAnalysis.DomainCapK}""".stripMargin

  // ---- x63 audio metadata ------------------------------------------
  // The oracle recomputes the WAV header fields ARITHMETICALLY from
  // the payload length (they are injected deterministically by
  // Multimodal.audioTable); the engine must byte-parse the real
  // RIFF/WAVE stream to produce the same numbers.
  private val x63 = {
    val len = "strlen(text)" // DuckDB byte length (≡ Spark octet_length)
    val ch = s"(1 + $len % 2)"
    val rate = s"(8000 + ($len % 8) * 1000)"
    val nsamp = s"($len // ($ch * 2))"
    raw"""SELECT doc_id,
         |       CAST($len + 44 AS BIGINT) AS n_bytes,
         |       CAST($rate AS BIGINT) AS sample_rate,
         |       CAST($ch AS BIGINT) AS channels,
         |       CAST(16 AS BIGINT) AS bits,
         |       CAST($nsamp AS BIGINT) AS n_samples,
         |       CAST($nsamp * 1000 // $rate AS BIGINT) AS duration_ms
         |FROM documents""".stripMargin
  }

  // ---- x64 video (GIF) metadata ------------------------------------
  // Arithmetic oracle, same contract as x63: the header fields are
  // injected from the payload length; the engine must block-walk the
  // real GIF stream to recover them. n_bytes = 6 header + 7 screen
  // descriptor + 12 per frame + 1 trailer + payload.
  private val x64 = {
    val len = "strlen(text)"
    val nf = s"(1 + $len % 7)"
    raw"""SELECT doc_id,
         |       CAST(13 + 12 * $nf + 1 + $len AS BIGINT) AS n_bytes,
         |       CAST(16 + $len % 320 AS BIGINT) AS width,
         |       CAST(16 + ($len * 3) % 240 AS BIGINT) AS height,
         |       CAST($nf AS BIGINT) AS n_frames
         |FROM documents""".stripMargin
  }

  // ---- x81 star-schema revenue rollup ------------------------------

  private val x81 =
    raw"""SELECT r_name, n_name,
         |       CAST(count(*) AS BIGINT) AS n_items,
         |       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
         |       CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
         |FROM lineitem
         |JOIN orders   ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation   ON c_nationkey = n_nationkey
         |JOIN region   ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name""".stripMargin

  // ---- x82 unigram entropy / type-token ratio ----------------------
  // Σ c·ln c folds the SORTED count list (list comprehension over
  // list_sort ≡ Spark aggregate over sort_array) — same sequential
  // IEEE path, so the 4dp round is stable across engines.

  private val x82 =
    raw"""WITH $toksCte,
         |tf AS (
         |  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, unnest(toks) AS tok FROM tok)
         |  GROUP BY doc_id, tok),
         |agg AS (
         |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
         |         CAST(count(*) AS BIGINT) AS n_types,
         |         list_sort(list(tf)) AS cs
         |  FROM tf GROUP BY doc_id)
         |SELECT doc_id, n_tokens, n_types,
         |       floor(n_types / CAST(n_tokens AS DOUBLE) * 10000 + 0.5) / 10000 AS ttr,
         |       floor((ln(CAST(n_tokens AS DOUBLE))
         |              - list_sum([CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)) for c in cs])
         |                / n_tokens) * 10000 + 0.5) / 10000 AS entropy
         |FROM agg""".stripMargin

  // ---- x83 MERGE/upsert --------------------------------------------

  private val x83 = {
    val m = graft.ops.Temporal.MergeSplitMod
    raw"""WITH t AS (
         |  SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms,
         |         $centsExpr AS value_cents
         |  FROM events),
         |base AS (
         |  SELECT * FROM (
         |    SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ms DESC, event_id DESC) AS rn
         |    FROM t WHERE event_id % $m <> 0)
         |  WHERE rn = 1),
         |delta AS (
         |  SELECT * FROM (
         |    SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ms DESC, event_id DESC) AS rn
         |    FROM t WHERE event_id % $m = 0)
         |  WHERE rn = 1)
         |SELECT coalesce(b.user_id, d.user_id) AS user_id,
         |       CASE WHEN b.user_id IS NULL THEN 'insert'
         |            WHEN d.user_id IS NULL THEN 'keep'
         |            ELSE 'update' END AS op,
         |       coalesce(d.event_id, b.event_id) AS event_id,
         |       coalesce(d.event_type, b.event_type) AS event_type,
         |       coalesce(d.ms, b.ms) AS ms,
         |       coalesce(d.value_cents, b.value_cents) AS value_cents
         |FROM base b FULL OUTER JOIN delta d ON b.user_id = d.user_id""".stripMargin
  }

  // ---- x84 two-phase salted aggregation ----------------------------
  // The oracle is deliberately the DIRECT aggregation: salting is a
  // shuffle-geometry rewrite whose contract is bit-identical results.

  private val x84 =
    raw"""SELECT event_type,
         |       CAST(count(*) AS BIGINT) AS n_events,
         |       CAST(sum($centsExpr) AS BIGINT) AS sum_cents,
         |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
         |FROM events GROUP BY event_type""".stripMargin

  // ---- x85 Z-order layout audit ------------------------------------
  // The Morton interleave as a Σ of shifted bit tests — one term per
  // (dimension, bit); disjoint bit positions make + ≡ OR. Generated
  // from the same ZDimBits constant the Spark expression uses.

  private val x85 = {
    val bits = graft.ops.Olap.ZDimBits
    val dim = 1L << bits
    def spread(v: String, off: Int) =
      (0 until bits).map(i => s"((($v >> $i) & 1) << ${2 * i + off})").mkString(" + ")
    raw"""WITH k AS (
         |  SELECT l_partkey, l_suppkey,
         |         l_partkey % $dim AS a, l_suppkey % $dim AS b
         |  FROM lineitem),
         |z AS (
         |  SELECT l_partkey, l_suppkey,
         |         ${spread("a", 0)} + ${spread("b", 1)} AS z
         |  FROM k)
         |SELECT z >> ${graft.ops.Olap.ZBucketShift} AS zbucket,
         |       CAST(count(*) AS BIGINT) AS n_items,
         |       CAST(min(z) AS BIGINT) AS min_z,
         |       CAST(max(z) AS BIGINT) AS max_z,
         |       CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts
         |FROM z GROUP BY 1""".stripMargin
  }

  // ---- x87 grouped top-k (custom planner operator) -----------------
  // The oracle is the declarative window-rank form the custom heap
  // operator replaces — same rows, different physical geometry.

  private val x87 =
    raw"""SELECT event_type, event_id, cents
         |FROM (SELECT event_type, event_id, $centsExpr AS cents FROM events)
         |QUALIFY row_number() OVER (PARTITION BY event_type
         |                           ORDER BY cents DESC, event_id) <= ${Events.TopSpendK}""".stripMargin

  // ---- x88 declarative top-k via the optimizer rewrite -------------

  private val x88 =
    raw"""SELECT doc_id, lang, n_chars FROM documents
         |QUALIFY row_number() OVER (PARTITION BY lang
         |                           ORDER BY n_chars DESC, doc_id) <= 2""".stripMargin

  // ---- x89 canonical normalization + post-norm dedup classes -------

  private val x89 =
    raw"""WITH n AS (
         |  SELECT doc_id, CAST(length(text) AS BIGINT) AS n_raw,
         |         trim(regexp_replace(regexp_replace(lower(text),
         |              '${TextAnalysis.NormStripPattern}', ' ', 'g'),
         |              '\s+', ' ', 'g')) AS norm
         |  FROM documents)
         |SELECT doc_id, n_raw, CAST(length(norm) AS BIGINT) AS n_norm,
         |       md5(norm) AS norm_fp,
         |       CAST(count(*) OVER (PARTITION BY md5(norm)) AS BIGINT) AS n_same
         |FROM n""".stripMargin

  // ---- x90/x100 exact-substring (repeated token-span) dedup --------

  /** Shared span CTEs: every k-token window md5 (spans), per-doc
    * occurrence rollup (occ), per-fp totals + keeper doc (spanagg). */
  private val spanCtes = {
    val k = Dedup.SpanTokens
    raw"""$toksCte,
         |spans AS (
         |  SELECT doc_id, t.i - 1 AS pos,
         |         md5(array_to_string(toks[t.i : t.i + $k - 1], ' ')) AS fp
         |  FROM tok, unnest(range(1, len(toks) - $k + 2)) AS t(i)),
         |occ AS (
         |  SELECT fp, doc_id, count(*) AS c, min(pos) AS mp
         |  FROM spans GROUP BY 1, 2),
         |spanagg AS (
         |  SELECT fp, CAST(sum(c) AS BIGINT) AS n_occurrences,
         |         CAST(count(*) AS BIGINT) AS n_docs,
         |         min(doc_id) AS keep_doc_id
         |  FROM occ GROUP BY 1)""".stripMargin
  }

  private val x90 =
    raw"""WITH $spanCtes
         |SELECT a.fp, a.n_occurrences, a.n_docs, a.keep_doc_id,
         |       CAST(o.mp AS BIGINT) AS keep_pos
         |FROM spanagg a JOIN occ o ON a.fp = o.fp AND a.keep_doc_id = o.doc_id
         |WHERE a.n_occurrences > 1""".stripMargin

  // ---- x100 span-dedup clean-text reconstruction -------------------
  // The Lee et al. removal step: cut every token covered by a
  // non-keeper occurrence of a repeated span, rebuild the survivors
  // in original order, fingerprint.

  private val x100 = {
    val k = Dedup.SpanTokens
    raw"""WITH $spanCtes,
         |dup AS (
         |  SELECT a.fp, a.keep_doc_id, o.mp AS keep_pos
         |  FROM spanagg a JOIN occ o ON a.fp = o.fp AND a.keep_doc_id = o.doc_id
         |  WHERE a.n_occurrences > 1),
         |cov AS (
         |  SELECT DISTINCT s.doc_id, s.pos + u.j AS p
         |  FROM spans s JOIN dup d ON s.fp = d.fp
         |  CROSS JOIN unnest(range(0, $k)) AS u(j)
         |  WHERE NOT (s.doc_id = d.keep_doc_id AND s.pos = d.keep_pos)),
         |tks AS (
         |  SELECT doc_id, t.i - 1 AS p, toks[t.i] AS tok
         |  FROM tok, unnest(range(1, len(toks) + 1)) AS t(i))
         |SELECT t.doc_id,
         |       CAST(count(*) AS BIGINT) AS n_toks,
         |       CAST(sum(CASE WHEN c.p IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
         |       md5(coalesce(string_agg(CASE WHEN c.p IS NULL THEN t.tok END,
         |                               ' ' ORDER BY t.p), '')) AS clean_fp
         |FROM tks t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.p = c.p
         |GROUP BY 1""".stripMargin
  }

  // ---- x99 PII detection / redaction --------------------------------
  // Injection expression mirrored from graft.ops.Pii.injectPii (the
  // fixture corpus has no organic PII); patterns/tokens are the SAME
  // Scala constants, so the two engines cannot drift.

  private val x99 = {
    import graft.ops.Pii._
    raw"""WITH aug AS (
         |  SELECT doc_id, text ||
         |    CASE doc_id % 4
         |      WHEN 0 THEN ' contact u' || doc_id || '@example.com or admin'
         |                  || doc_id || '@mail.example.org now'
         |      WHEN 1 THEN ' call 555-' || lpad((doc_id % 1000)::VARCHAR, 3, '0')
         |                  || '-' || lpad((doc_id * 7 % 10000)::VARCHAR, 4, '0') || ' today'
         |      WHEN 2 THEN ' host 10.' || (doc_id % 256) || '.' || (doc_id * 3 % 256)
         |                  || '.' || (doc_id * 7 % 256)
         |                  || ' rang 555-' || lpad((doc_id % 1000)::VARCHAR, 3, '0') || '-0000'
         |      ELSE '' END AS a
         |  FROM documents),
         |s AS (
         |  SELECT doc_id, a,
         |         regexp_replace(regexp_replace(regexp_replace(a,
         |           '$EmailPattern', '$EmailToken', 'g'),
         |           '$Ipv4Pattern', '$IpToken', 'g'),
         |           '$PhonePattern', '$PhoneToken', 'g') AS sc
         |  FROM aug)
         |SELECT doc_id,
         |       CAST(len(regexp_extract_all(a, '$EmailPattern')) AS BIGINT) AS n_emails,
         |       CAST(len(regexp_extract_all(a, '$PhonePattern')) AS BIGINT) AS n_phones,
         |       CAST(len(regexp_extract_all(a, '$Ipv4Pattern')) AS BIGINT) AS n_ips,
         |       md5(sc) AS scrub_fp,
         |       CAST(length(sc) AS BIGINT) AS n_scrub_chars
         |FROM s""".stripMargin
  }

  // ---- x91 zone-map audit ------------------------------------------

  private val x91 = {
    val p = graft.ops.DataProfile
    raw"""SELECT CAST(floor(ship_ms / ${p.ZoneFileMs}) AS BIGINT) AS file_id,
         |       CAST(count(*) AS BIGINT) AS n_rows,
         |       CAST(min(ship_ms) AS BIGINT) AS min_ship_ms,
         |       CAST(max(ship_ms) AS BIGINT) AS max_ship_ms,
         |       CAST(min(l_orderkey) AS BIGINT) AS min_ok,
         |       CAST(max(l_orderkey) AS BIGINT) AS max_ok,
         |       CAST(CASE WHEN max(ship_ms) < ${p.ShipCutoffMs} THEN 1 ELSE 0 END AS BIGINT) AS prune_ship,
         |       CAST(CASE WHEN max(l_orderkey) < ${p.OkCutoff} THEN 1 ELSE 0 END AS BIGINT) AS prune_ok
         |FROM (SELECT epoch_ms(l_shipdate) AS ship_ms, l_orderkey FROM lineitem)
         |GROUP BY 1""".stripMargin
  }

  // ---- x92 incremental MV refresh (oracle = full recompute) --------

  private val x92 = {
    val m = graft.ops.Temporal.MergeSplitMod
    raw"""SELECT event_type,
         |       CAST(date_trunc('hour', ts) AS VARCHAR) AS hour,
         |       CAST(count(*) AS BIGINT) AS n_events,
         |       CAST(sum($centsExpr) AS BIGINT) AS value_cents,
         |       CAST(max(CASE WHEN event_id % $m = 0 THEN 1 ELSE 0 END) AS BIGINT) AS touched
         |FROM events GROUP BY 1, 2""".stripMargin
  }

  // ---- x93 join-cardinality estimation -----------------------------

  private val x93 =
    raw"""WITH l AS (SELECT CAST(count(*) AS BIGINT) AS n_left,
         |                  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS d_left
         |           FROM lineitem),
         |r AS (SELECT CAST(count(*) AS BIGINT) AS n_right,
         |             CAST(count(DISTINCT o_orderkey) AS BIGINT) AS d_right
         |      FROM orders),
         |a AS (SELECT CAST(count(*) AS BIGINT) AS actual_rows
         |      FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
         |SELECT n_left, d_left, n_right, d_right,
         |       CAST(floor(n_left * n_right / greatest(d_left, d_right)) AS BIGINT) AS est_rows,
         |       actual_rows
         |FROM l, r, a""".stripMargin

  // ---- x94 triangle counts on the near-dup graph -------------------
  // Ordered edges (doc_a < doc_b) find each triangle exactly once via
  // the two-hop join closed by the third edge.

  private val x94 =
    raw"""WITH $x5Ctes,
         |pairs AS (
         |$x5Select),
         |e AS (SELECT doc_a AS u, doc_b AS v FROM pairs),
         |tri AS (
         |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
         |  FROM e e1 JOIN e e2 ON e1.v = e2.u
         |            JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tri
         |FROM (SELECT a AS doc_id FROM tri
         |      UNION ALL SELECT b FROM tri
         |      UNION ALL SELECT c FROM tri)
         |GROUP BY 1""".stripMargin

  // ---- x95 transformWithState running totals -----------------------
  // Oracle = event-time prefix sums: the batch window the streaming
  // fold reproduces under the in-handler (ms, event_id) sort.

  private val x95 =
    raw"""SELECT user_id, event_id, epoch_ms(ts) AS ms,
         |       CAST(row_number() OVER w AS BIGINT) AS running_n,
         |       CAST(sum($centsExpr) OVER w AS BIGINT) AS running_cents
         |FROM events
         |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
         |             ROWS UNBOUNDED PRECEDING)""".stripMargin

  // ---- x96 xlsx round trip through the V2 connector ----------------

  private val x96 = "SELECT doc_id, lang, n_chars FROM documents"

  // ---- x98 ORC round trip (oracle = the original table) ------------
  private val x98 = "SELECT doc_id, lang, n_chars FROM documents"

  // ---- x101 Gopher document-quality rule battery -------------------
  // Thresholds interpolated from graft.ops.QualityFilters so the two
  // engines cannot drift; same tok CTE as every text oracle.

  private val x101 = {
    val q = graft.ops.QualityFilters
    val stop = strList(TextAnalysis.Stopwords)
    raw"""WITH $toksCte,
         |m AS (
         |  SELECT doc_id,
         |         len(toks) AS n_words,
         |         len(list_filter(toks, t -> list_contains($stop, t))) AS stop_hits,
         |         CASE WHEN len(toks) > 0
         |              THEN ${round4("list_sum([len(t) for t in toks]) / CAST(len(toks) AS DOUBLE)")}
         |              ELSE 0.0 END AS mean_word_len,
         |         CASE WHEN len(toks) > 0
         |              THEN ${round4("len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE)")}
         |              ELSE 0.0 END AS distinct_ratio,
         |         CASE WHEN len(toks) >= 2
         |              THEN [array_to_string(toks[i+1:i+2], ' ')
         |                    for i in range(0, len(toks) - 1)]
         |              ELSE [] END AS bg
         |  FROM tok),
         |m2 AS (
         |  SELECT *,
         |         CASE WHEN len(bg) > 0
         |              THEN ${round4("list_max([len(list_filter(bg, x -> x = b)) for b in list_distinct(bg)]) / CAST(len(bg) AS DOUBLE)")}
         |              ELSE 0.0 END AS top_bigram_frac
         |  FROM m)
         |SELECT doc_id,
         |       CAST(n_words AS BIGINT) AS n_words, mean_word_len,
         |       CAST(stop_hits AS BIGINT) AS stop_hits,
         |       distinct_ratio, top_bigram_frac,
         |       CAST(CASE WHEN n_words BETWEEN ${q.MinWords} AND ${q.MaxWords}
         |            THEN 1 ELSE 0 END AS BIGINT) AS ok_words,
         |       CAST(CASE WHEN mean_word_len BETWEEN ${q.MinMeanLen} AND ${q.MaxMeanLen}
         |            THEN 1 ELSE 0 END AS BIGINT) AS ok_mean_len,
         |       CAST(CASE WHEN stop_hits >= ${q.MinStopHits}
         |            THEN 1 ELSE 0 END AS BIGINT) AS ok_stop,
         |       CAST(CASE WHEN top_bigram_frac <= ${q.MaxTopBigramFrac}
         |                  AND distinct_ratio >= ${q.MinDistinctRatio}
         |            THEN 1 ELSE 0 END AS BIGINT) AS ok_repetition,
         |       CAST(CASE WHEN n_words BETWEEN ${q.MinWords} AND ${q.MaxWords}
         |                  AND mean_word_len BETWEEN ${q.MinMeanLen} AND ${q.MaxMeanLen}
         |                  AND stop_hits >= ${q.MinStopHits}
         |                  AND top_bigram_frac <= ${q.MaxTopBigramFrac}
         |                  AND distinct_ratio >= ${q.MinDistinctRatio}
         |            THEN 1 ELSE 0 END AS BIGINT) AS keep
         |FROM m2""".stripMargin
  }

  // ---- x102 C4 line filters ----------------------------------------
  // Same deterministic line synthesis as QualityFilters.c4LineFilters:
  // width 8 + doc_id % 5, terminal iff (doc_id + i) % 4 != 0. LEFT
  // JOIN back to tok so a zero-line doc would still emit its row.

  private val x102 = {
    val q = graft.ops.QualityFilters
    raw"""WITH $toksCte,
         |p AS (SELECT doc_id, toks, 8 + doc_id % 5 AS w, len(toks) AS n FROM tok),
         |l AS (
         |  SELECT doc_id, u.i AS i,
         |         toks[u.i * w + 1 : u.i * w + w] AS lt,
         |         (doc_id + u.i) % 4 <> 0 AS terminal
         |  FROM p, unnest(range(0, CAST(ceil(n / CAST(w AS DOUBLE)) AS BIGINT))) AS u(i)),
         |k AS (
         |  SELECT doc_id, i,
         |         array_to_string(lt, ' ')
         |           || CASE WHEN terminal THEN '.' ELSE '' END AS line_out,
         |         len(lt) AS nw,
         |         (len(lt) >= ${q.MinLineWords} AND terminal
         |          AND NOT list_contains(lt, '${q.BlockToken}')) AS keep
         |  FROM l),
         |g AS (
         |  SELECT doc_id,
         |         count(*) AS n_lines,
         |         sum(CASE WHEN keep THEN 1 ELSE 0 END) AS n_kept,
         |         coalesce(sum(CASE WHEN keep THEN nw END), 0) AS n_kept_words,
         |         string_agg(CASE WHEN keep THEN line_out END, chr(10) ORDER BY i) AS agg_str
         |  FROM k GROUP BY 1)
         |SELECT t.doc_id,
         |       CAST(coalesce(g.n_lines, 0) AS BIGINT) AS n_lines,
         |       CAST(coalesce(g.n_kept, 0) AS BIGINT) AS n_kept,
         |       CAST(coalesce(g.n_kept_words, 0) AS BIGINT) AS n_kept_words,
         |       md5(coalesce(g.agg_str, '')) AS clean_fp
         |FROM tok t LEFT JOIN g ON t.doc_id = g.doc_id""".stripMargin
  }

  // ---- x103 source mixture weights ---------------------------------

  /** The per-source token-count + temperature-weight CTEs, shared by
    * x103 and the x106 sampler so the weight math cannot drift. */
  private val mixCtes = {
    val a = graft.ops.QualityFilters.MixtureAlpha
    raw"""s AS (
         |  SELECT source,
         |         CAST(count(*) AS BIGINT) AS n_docs,
         |         CAST(sum(len(list_filter(regexp_split_to_array(text, '\s+'),
         |                                  t -> t <> ''))) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY 1),
         |z AS (SELECT sum(pow(CAST(n_tokens AS DOUBLE), $a)) AS z FROM s),
         |wt AS (
         |  SELECT source, n_docs, n_tokens,
         |         ${round4(s"pow(CAST(n_tokens AS DOUBLE), $a) / z")} AS weight
         |  FROM s, z)""".stripMargin
  }

  private val x103 =
    raw"""WITH $mixCtes
         |SELECT source, n_docs, n_tokens, weight FROM wt""".stripMargin

  // ---- x105 Unicode NFC canonicalization ---------------------------
  // Injection mirrors TextAnalysis.injectDecomposed codepoint-for-
  // codepoint via chr(): 769 = U+0301 combining acute, 776 = U+0308
  // combining diaeresis, 778 = U+030A combining ring, 233 = the
  // PRECOMPOSED U+00E9 (the already-NFC cohort). DuckDB's built-in
  // nfc_normalize is the independent second implementation of UAX #15.

  private val x105 =
    raw"""WITH aug AS (
         |  SELECT doc_id,
         |         text || CASE doc_id % 5
         |                 WHEN 0 THEN ' cafe' || chr(769) || ' menu'
         |                 WHEN 1 THEN ' u' || chr(776) || 'ber zu' || chr(776) || 'rich'
         |                 WHEN 2 THEN ' caf' || chr(233) || ' fjord'
         |                 WHEN 3 THEN ' A' || chr(778) || 'ngstro' || chr(776) || 'm'
         |                 ELSE '' END AS raw
         |  FROM documents),
         |n AS (SELECT doc_id, raw, nfc_normalize(raw) AS nfc FROM aug)
         |SELECT doc_id,
         |       CAST(length(raw) AS BIGINT) AS n_raw,
         |       CAST(length(nfc) AS BIGINT) AS n_nfc,
         |       CAST(length(raw) - length(nfc) AS BIGINT) AS n_composed,
         |       CAST(CASE WHEN raw <> nfc THEN 1 ELSE 0 END AS BIGINT) AS changed,
         |       md5(nfc) AS nfc_fp
         |FROM n""".stripMargin

  // ---- x106 temperature-scaled mixture sampling --------------------
  // Same deterministic md5(doc_id) order as every sampler oracle
  // (x29/x33/x74); n_take = max(1, round(weight * SampleTarget)).

  private val x106 = {
    val q = graft.ops.QualityFilters
    raw"""WITH $mixCtes,
         |r AS (
         |  SELECT d.doc_id, d.source, wt.weight,
         |         row_number() OVER (
         |           PARTITION BY d.source
         |           ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id) AS rnk
         |  FROM documents d JOIN wt USING (source))
         |SELECT doc_id, source, CAST(rnk AS BIGINT) AS rnk, weight
         |FROM r
         |WHERE rnk <= greatest(1, CAST(floor(weight * ${q.SampleTarget} + 0.5) AS BIGINT))""".stripMargin
  }

  // ---- x107 linear quality-classifier score ------------------------
  // Mirrors QualityFilters.classifierScore's fixed-point assembly: the
  // logit is an EXACT integer in 1e-5 units (inputs are 4dp-rounded,
  // coefficients are short decimals), divided once — bit-identical
  // doubles on both engines with NO round4 half-boundary to tie-break.
  // Only the sigmoid keeps the 4dp round (exp of a transcendental
  // never lands on a boundary; same argument as x103's pow).

  /** The x107 exact-integer logit fragment (over the x101 feature
    * columns), shared by x107 and the x163 calibration curve. */
  private val clfZE5: String = {
    val q = graft.ops.QualityFilters
    def e5(w: Double) = math.round(w * 100000)
    def e1(w: Double) = math.round(w * 10)
    s"(CAST(${e5(q.ClfBias)} AS BIGINT)" +
      s" + n_words * ${e5(q.ClfWordsW)} + stop_hits * ${e5(q.ClfStopW)}" +
      s" + CAST(round(distinct_ratio * 10000) AS BIGINT) * (${e1(q.ClfDistinctW)})" +
      s" + CAST(round(mean_word_len * 10000) AS BIGINT) * (${e1(q.ClfMeanLenW)})" +
      s" + CAST(round(top_bigram_frac * 10000) AS BIGINT) * (${e1(q.ClfBigramW)}))"
  }

  private val x107 = {
    val zE5 = clfZE5
    raw"""WITH g AS (
         |$x101
         |),
         |f AS (SELECT doc_id, $zE5 / 100000.0 AS logit FROM g)
         |SELECT doc_id, logit,
         |       ${round4("1.0 / (1.0 + exp(-logit))")} AS clf_score,
         |       CAST(CASE WHEN ${round4("1.0 / (1.0 + exp(-logit))")} >= 0.5
         |            THEN 1 ELSE 0 END AS BIGINT) AS clf_keep
         |FROM f""".stripMargin
  }

  // ---- x108 HTML boilerplate extraction ----------------------------
  // Injection mirrors Web.injectHtml literally (chr(10) = the \n the
  // Scala literal embeds); patterns are the SAME Web.* constants.
  // RE2 needs the 'g' flag where Java's replaceAll is implicit-global.

  private val x108 = {
    val w = graft.ops.Web
    raw"""WITH aug AS (
         |  SELECT doc_id,
         |    CASE doc_id % 3
         |    WHEN 0 THEN '<html><head><title>Doc ' || doc_id
         |      || '</title><script type="text/javascript">var x=' || doc_id
         |      || ';' || chr(10) || 'if(x>1){x=0;}</script><style>p {color: red}</style></head><body><p>'
         |      || text || '</p><div id="nav"><a href="/home">home</a> <a href="/p'
         |      || doc_id || '">more</a></div></body></html>'
         |    WHEN 1 THEN '<body><h1>Doc ' || doc_id || '</h1>' || chr(10) || '<p>'
         |      || text || '</p>' || chr(10) || '<!-- footer ' || doc_id || ' --></body>'
         |    ELSE text END AS raw
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, raw,
         |    trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(raw,
         |      '${w.ScriptPattern}', '', 'g'),
         |      '${w.StylePattern}', '', 'g'),
         |      '${w.CommentPattern}', '', 'g'),
         |      '${w.TagPattern}', ' ', 'g'),
         |      '${w.WsPattern}', ' ', 'g')) AS clean
         |  FROM aug)
         |SELECT doc_id,
         |       regexp_extract(raw, '${w.TitlePattern}', 1) AS title,
         |       CAST(len(regexp_extract_all(raw, '${w.TagPattern}')) AS BIGINT) AS n_tags,
         |       CAST(len(regexp_extract_all(raw, '${w.LinkPattern}')) AS BIGINT) AS n_links,
         |       CAST(length(raw) AS BIGINT) AS n_raw,
         |       CAST(length(clean) AS BIGINT) AS n_clean,
         |       md5(clean) AS clean_fp
         |FROM c""".stripMargin
  }

  // ---- x109 URL parse + per-domain stats ---------------------------
  // Injection mirrors Web.injectUrl; extraction patterns are the SAME
  // Web.* constants; blocklist generated from Web.BlockedDomains.

  private val x109 = {
    val w = graft.ops.Web
    val blocked = w.BlockedDomains.map(d => s"'$d'").mkString(", ")
    raw"""WITH aug AS (
         |  SELECT doc_id, text ||
         |    CASE doc_id % 4
         |    WHEN 0 THEN ' see https://www' || (doc_id % 5)
         |                || '.corpus-hub.com/archive/d' || doc_id || '?ref=idx'
         |    WHEN 1 THEN ' img http://cdn' || (doc_id % 3)
         |                || '.static-assets.org/f' || doc_id || '.png'
         |    WHEN 2 THEN ' via https://m' || (doc_id % 2) || '.spam-mirror.net/x'
         |    ELSE '' END AS a
         |  FROM documents),
         |u AS (SELECT doc_id, regexp_extract(a, '${w.UrlPattern}', 0) AS url FROM aug),
         |q AS (
         |  SELECT doc_id,
         |         regexp_extract(url, '${w.HostPattern}', 1) AS host,
         |         regexp_extract(url, '${w.SchemePattern}', 1) AS scheme,
         |         regexp_extract(url, '${w.PathPattern}', 1) AS path
         |  FROM u),
         |r AS (
         |  SELECT doc_id, host, scheme,
         |         CASE WHEN host = '' THEN '(none)'
         |              ELSE regexp_extract(host, '${w.DomainPattern}', 1) END AS domain,
         |         length(path) - length(replace(path, '/', '')) AS depth
         |  FROM q)
         |SELECT domain,
         |       CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
         |       CAST(sum(depth) AS BIGINT) AS sum_depth,
         |       CAST(sum(CASE WHEN scheme = 'https' THEN 1 ELSE 0 END) AS BIGINT) AS n_https,
         |       CAST(CASE WHEN domain IN ($blocked) THEN 1 ELSE 0 END AS BIGINT) AS blocked
         |FROM r
         |GROUP BY domain""".stripMargin
  }

  // ---- x110 Unicode script / char-class profile --------------------
  // Injection mirrors TextAnalysis.injectScripts codepoint-for-
  // codepoint via chr() (the chrLit generator walks the SAME Scala
  // string constants); script classes derive from the same
  // ScriptNames — Java spells a script \p{IsLatin} where RE2 spells
  // it \p{Latin}, the one sanctioned pattern divergence (documented
  // at TextAnalysis.ScriptNames; the UAX #24 semantics are identical).

  /** A DuckDB string expression reproducing `s` codepoint-for-
    * codepoint: ASCII runs as quoted literals, everything else via
    * chr() — so non-ASCII constants can't be corrupted by any
    * encoding layer between Scala source and the oracle. */
  private def chrLit(s: String): String = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val run = new StringBuilder
    def flush(): Unit =
      if (run.nonEmpty) { parts += s"'${run.toString.replace("'", "''")}'"; run.clear() }
    s.foreach { c =>
      if (c < 128) run += c else { flush(); parts += s"chr(${c.toInt})" }
    }
    flush()
    if (parts.isEmpty) "''" else parts.mkString(" || ")
  }

  private val x110 = {
    val t = TextAnalysis
    def cls(name: String) =
      s"CAST(len(regexp_extract_all(raw, '${t.re2ScriptClass(name)}')) AS BIGINT)"
    raw"""WITH aug AS (
         |  SELECT doc_id,
         |         text || CASE doc_id % 4
         |                 WHEN 0 THEN ${chrLit(t.CyrillicInject)}
         |                 WHEN 1 THEN ${chrLit(t.HanInject)}
         |                 WHEN 2 THEN ${chrLit(t.AccentInject)}
         |                 ELSE '' END AS raw
         |  FROM documents),
         |c AS (
         |  SELECT doc_id,
         |         CAST(length(raw) AS BIGINT) AS n_chars,
         |         ${cls("Latin")} AS n_latin,
         |         ${cls("Cyrillic")} AS n_cyrillic,
         |         ${cls("Han")} AS n_han,
         |         CAST(len(regexp_extract_all(raw, '${t.DigitClass}')) AS BIGINT) AS n_digit,
         |         CAST(len(regexp_extract_all(raw, '${t.SpaceClass}')) AS BIGINT) AS n_space,
         |         CAST(len(regexp_extract_all(raw, '${t.AsciiClass}')) AS BIGINT) AS n_ascii
         |  FROM aug)
         |SELECT doc_id, n_chars, n_latin, n_cyrillic, n_han, n_digit,
         |       n_space, n_ascii,
         |       n_chars - n_latin - n_cyrillic - n_han - n_digit - n_space AS n_other,
         |       CASE WHEN n_latin >= n_cyrillic AND n_latin >= n_han THEN 'Latin'
         |            WHEN n_cyrillic >= n_han THEN 'Cyrillic'
         |            ELSE 'Han' END AS main_script
         |FROM c""".stripMargin
  }

  // ---- x111 asymmetric shingle containment pairs -------------------
  // The x25 CTE chain reshaped for asymmetry: prefix filter on the
  // SOURCE side only, one-sided length filter, candidates join the
  // source prefix against FULL capped postings, verify against the
  // true uncapped shingle sets (values exact, cap only drops).

  private val x111 = {
    val tau = Dedup.ContainmentThreshold
    raw"""WITH $toksCte, $shCte,
         |dsh AS (SELECT doc_id, sh FROM shs WHERE len(sh) > 0),
         |post AS (
         |  SELECT doc_id, h, count(*) OVER (PARTITION BY h) AS df
         |  FROM (SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT AS h
         |        FROM (SELECT doc_id, unnest(sh) AS s FROM dsh))),
         |capped AS (SELECT doc_id, n, h, df FROM (
         |  SELECT doc_id, len(sh) AS n, h, df FROM post JOIN dsh USING (doc_id))
         |  WHERE df <= ${Dedup.MaxShingleDf}),
         |pre AS (
         |  SELECT doc_id, n, h FROM (
         |    SELECT doc_id, n, h,
         |           row_number() OVER (PARTITION BY doc_id ORDER BY df, h) AS rk,
         |           count(*) OVER (PARTITION BY doc_id) AS n_idx
         |    FROM capped)
         |  WHERE rk <= n_idx - ceil($tau * n_idx) + 1),
         |cand AS (
         |  SELECT DISTINCT l.doc_id AS doc_src, r.doc_id AS doc_dst
         |  FROM pre l JOIN capped r ON l.h = r.h AND l.doc_id <> r.doc_id
         |   AND $tau * l.n <= r.n)
         |SELECT doc_src, doc_dst, containment FROM (
         |  SELECT c.doc_src, c.doc_dst,
         |         floor((len(list_intersect(l.sh, r.sh))::DOUBLE / len(l.sh)) * 10000 + 0.5) / 10000 AS containment
         |  FROM cand c JOIN dsh l ON l.doc_id = c.doc_src
         |              JOIN dsh r ON r.doc_id = c.doc_dst)
         |WHERE containment >= $tau""".stripMargin
  }

  // ---- x112 sliding-window document chunking -----------------------
  // Geometry constants shared with TextAnalysis; slicing is the shCte
  // convention (1-based inclusive ≡ Spark slice(pos, len), both
  // truncate at list end). The n >= 1 guard keeps (n-1)//S in the
  // domain where DuckDB's floor division equals Spark's int truncation.

  private val x112 = {
    val w = TextAnalysis.ChunkTokens; val s = TextAnalysis.ChunkStride
    raw"""WITH $toksCte,
         |t AS (SELECT doc_id, toks, len(toks) AS n FROM tok WHERE len(toks) >= 1),
         |c AS (
         |  SELECT doc_id, unnest(range(0, ((n - 1) // $s) + 1)) AS chunk_idx, toks
         |  FROM t),
         |sl AS (
         |  SELECT doc_id, chunk_idx, chunk_idx * $s AS tok_start,
         |         toks[chunk_idx * $s + 1 : chunk_idx * $s + $w] AS ctoks
         |  FROM c)
         |SELECT doc_id,
         |       CAST(chunk_idx AS BIGINT) AS chunk_idx,
         |       CAST(tok_start AS BIGINT) AS tok_start,
         |       CAST(len(ctoks) AS BIGINT) AS n_chunk_tokens,
         |       array_to_string(ctoks, ' ') AS chunk_text,
         |       md5(array_to_string(ctoks, ' ')) AS chunk_fp
         |FROM sl""".stripMargin
  }

  // ---- x113 bucketed co-located join -------------------------------
  // The oracle is the PLAIN join over the raw parquet — bucketing is
  // pure storage layout, so the answer must be bit-identical. Revenue
  // is exact fixed-point: cents × (100 - whole discount pct), BIGINT
  // in both engines (no float product crosses an engine boundary).

  private val x113 =
    raw"""SELECT o_orderpriority,
         |       CAST(count(*) AS BIGINT) AS n_items,
         |       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) *
         |                (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
         |            AS BIGINT) AS revenue_e4
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY 1""".stripMargin

  // ---- x114 mutual kNN graph ---------------------------------------
  // Same cell blocking as x52 (kmeans cells + hyperplane sub-refine
  // above MaxCell), then per-node top-k windows over within-cell
  // candidates and a reciprocal join: edge iff each end ranks the
  // other in its top-k. Ties on the 4dp cosine break by dst id in
  // both engines.

  private val x114 = {
    def wLit(p: Int): String =
      Similarity.planeWeights(p).map(w => if (w > 0) "1.0" else "-1.0")
        .mkString("([", ",", "]::DOUBLE[])")
    val sub0 = (0 until Similarity.LshBitsPerTable).map { i =>
      s"CASE WHEN ${dotExpr(wLit(i), "cand.v")} > 0 THEN ${1 << i} ELSE 0 END"
    }.mkString("(", " + ", ")")
    raw"""WITH $kmeansCandCtes,
         |celln AS (SELECT cell, count(*) AS cell_n FROM cand GROUP BY 1),
         |cs AS (
         |  SELECT cand.vec_id, cand.v, cand.nrm, cand.cell,
         |         CASE WHEN celln.cell_n > ${Similarity.MaxCell}
         |              THEN $sub0 ELSE 0 END AS sub
         |  FROM cand JOIN celln USING (cell)),
         |nbrs AS (
         |  SELECT src, dst, cos_sim FROM (
         |    SELECT src, dst, cos_sim,
         |           row_number() OVER (PARTITION BY src
         |             ORDER BY cos_sim DESC, dst) AS rnk
         |    FROM (
         |      SELECT a.vec_id AS src, b.vec_id AS dst,
         |             ${cosExpr("a.v", "a.nrm", "b.v", "b.nrm")} AS cos_sim
         |      FROM cs a JOIN cs b
         |        ON a.cell = b.cell AND a.sub = b.sub AND a.vec_id <> b.vec_id))
         |  WHERE rnk <= ${Similarity.TopK})
         |SELECT f.src AS vec_a, f.dst AS vec_b, f.cos_sim
         |FROM nbrs f JOIN nbrs b ON f.src = b.dst AND f.dst = b.src
         |WHERE f.src < f.dst""".stripMargin
  }

  // ---- x115 DSIR importance weights --------------------------------
  // Both unigram models are exact counts off one token stream; each
  // hashed feature's Laplace-smoothed log-ratio is computed once
  // (identical double argument in both engines), scaled to the 1e-7
  // grid as BIGINT, and the per-doc weight is an exact integer dot
  // product — the x38 portability trick.

  /** The x115 DSIR CTE chain (through `df`/`lam`), shared with the
    * x164 effective-sample-size oracle. */
  private lazy val dsirCtes: String = {
    val b = QualityFilters.DsirBuckets; val tl = QualityFilters.DsirTargetLang
    val scale = Similarity.CentroidScale
    raw"""$toksCte,
         |tf AS (
         |  SELECT doc_id, lang, ('0x' || substr(md5(t), 1, 4))::BIGINT % $b AS f
         |  FROM (SELECT doc_id, lang, unnest(toks) AS t FROM tok)),
         |rawc AS (SELECT f, count(*) AS cr FROM tf GROUP BY 1),
         |tgtc AS (SELECT f, count(*) AS ct FROM tf WHERE lang = '$tl' GROUP BY 1),
         |trc AS (SELECT sum(cr) AS tr FROM rawc),
         |ttc AS (SELECT sum(ct) AS tt FROM tgtc),
         |lam AS (
         |  SELECT f,
         |         CAST(floor((ln((coalesce(ct, 0) + 1)::DOUBLE / (tt + $b)::DOUBLE) -
         |                     ln((cr + 1)::DOUBLE / (tr + $b)::DOUBLE)) *
         |                    $scale::DOUBLE) AS BIGINT) AS lp
         |  FROM rawc LEFT JOIN tgtc USING (f) CROSS JOIN trc CROSS JOIN ttc),
         |df AS (SELECT doc_id, f, count(*) AS n FROM tf GROUP BY 1, 2)""".stripMargin
  }

  private val x115 = {
    val scale = Similarity.CentroidScale
    raw"""WITH $dsirCtes
         |SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_tokens,
         |       floor(CAST(sum(n * lp) AS DOUBLE) / $scale::DOUBLE * 10000 + 0.5) / 10000
         |         AS log_weight
         |FROM df JOIN lam USING (f) GROUP BY 1""".stripMargin
  }

  // ---- x116 consistent-hash resharding audit -----------------------
  // HRW owner = argmax over md5("n<i>:" || key); hex strings compare
  // identically in both engines. The when-chain mirrors Skew.hrwOwner.

  private val x116 = {
    import graft.ops.Skew
    def hs(n: Int): String =
      (0 until n).map(i => s"md5('n$i:' || k)").mkString("greatest(", ", ", ")")
    def owner(n: Int): String =
      (0 until n).map(i =>
        s"WHEN md5('n$i:' || k) = top$n THEN 'n$i'").mkString("CASE ", " ", " END")
    raw"""WITH k AS (
         |  SELECT doc_id, doc_id::VARCHAR AS k FROM documents),
         |t AS (
         |  SELECT doc_id, k, ${hs(Skew.ShardsOld)} AS top${Skew.ShardsOld},
         |         ${hs(Skew.ShardsNew)} AS top${Skew.ShardsNew}
         |  FROM k),
         |o AS (
         |  SELECT doc_id,
         |         ${owner(Skew.ShardsOld)} AS hrw_old,
         |         ${owner(Skew.ShardsNew)} AS hrw_new,
         |         doc_id % ${Skew.ShardsOld} AS mod_old,
         |         doc_id % ${Skew.ShardsNew} AS mod_new
         |  FROM t)
         |SELECT doc_id, hrw_old, hrw_new,
         |       CAST(mod_old AS BIGINT) AS mod_old,
         |       CAST(mod_new AS BIGINT) AS mod_new,
         |       CAST(CASE WHEN hrw_old <> hrw_new THEN 1 ELSE 0 END AS BIGINT) AS hrw_moved,
         |       CAST(CASE WHEN mod_old <> mod_new THEN 1 ELSE 0 END AS BIGINT) AS mod_moved
         |FROM o""".stripMargin
  }

  // ---- x117 BPE merge training -------------------------------------
  // Unrolled CTE chain (the kmeans-oracle pattern): each iteration
  // re-derives pair counts from the previous generation's delimited
  // states, takes the same (count DESC, l, r) argmax, and applies the
  // same literal replace — so the whole training trajectory must
  // agree, not just the final table.

  /** The x117 training-chain CTE text (wcnt word counts, w0..wN
    * delimited states, m1..mN argmax merges), shared by the trainer
    * oracle (x117) and the encoder oracle (x197). `mat` adds
    * AS MATERIALIZED (the x172 lesson): x197 references every m_i a
    * second time from its encode chain, and DuckDB's per-reference
    * CTE inlining would otherwise re-derive the training prefix for
    * each one. */
  private def bpeChainCtes(mat: Boolean): String = {
    val iters = TextAnalysis.BpeMerges
    val nl = "chr(10)"
    val M = if (mat) " MATERIALIZED" else ""
    def stepCtes(i: Int): String =
      raw"""p$i AS$M (
           |  SELECT ss[j] AS l, ss[j + 1] AS r, sum(wc) AS cnt
           |  FROM (SELECT string_split(trim(state, $nl), $nl || $nl) AS ss, wc
           |        FROM w${i - 1}),
           |       unnest(range(1, len(ss))) AS t(j)
           |  GROUP BY 1, 2),
           |m$i AS$M (SELECT l, r, cnt FROM p$i ORDER BY cnt DESC, l, r LIMIT 1),
           |w$i AS$M (
           |  SELECT replace(state, $nl || l || $nl || $nl || r || $nl,
           |                 $nl || l || r || $nl) AS state, wc
           |  FROM w${i - 1} CROSS JOIN m$i)""".stripMargin
    raw"""wcnt AS$M (
         |  SELECT t AS w, count(*) AS wc
         |  FROM (SELECT unnest(toks) AS t FROM tok) GROUP BY 1),
         |w0 AS$M (
         |  SELECT $nl || array_to_string([w[i] for i in range(1, len(w) + 1)],
         |                                $nl || $nl) || $nl AS state, wc
         |  FROM wcnt),
         |${(1 to iters).map(stepCtes).mkString(",\n")}""".stripMargin
  }

  private val x117 = {
    val iters = TextAnalysis.BpeMerges
    val finalSel = (1 to iters).map(i =>
      s"SELECT CAST($i AS BIGINT) AS merge_rank, l AS lsym, r AS rsym, " +
        s"CAST(cnt AS BIGINT) AS pair_count FROM m$i")
      .mkString("\n|UNION ALL ".stripMargin)
    raw"""WITH $toksCte,
         |${bpeChainCtes(mat = false)}
         |$finalSel""".stripMargin
  }

  // ---- x223 unigram-LM tokenizer training --------------------------
  // Mirrors TextAnalysis.unigramPiecesList iteration for iteration:
  // seed substring counts (top UniSeedCap + every single char), then
  // UniIters hard-EM rounds of segment → count → prune → re-cost.
  // The ENGINE segments each word by a linear Viterbi fold; the
  // oracle ENUMERATES every segmentation over the kept pieces (the
  // saturated fixture vocabulary keeps that tiny) and picks, per
  // word, the min by (total cost, reversed boundary list) — which is
  // provably the Viterbi (cost, smallest-last-start) tie-break by
  // subpath optimality. Genuinely different algorithms meeting the
  // same fixed points, each EM round a fresh recursive CTE.

  /** Unigram chain ending at `ucost<UniIters>` (+ `useg/ucnt/ukept`
    * per round). Callers must be under WITH RECURSIVE and provide
    * `tok`; `defineWcnt=false` when the BPE chain (which also builds
    * `wcnt`) is already present (x224). */
  private def uniChainCtes(defineWcnt: Boolean): String = {
    import graft.ops.TextAnalysis.{UniMaxPiece, UniSeedCap, UniTargetVocab,
      UniCostScale, UniIters}
    val (mp, sS) = (UniMaxPiece, UniCostScale)
    def costCte(name: String, src: String) =
      raw"""$name AS MATERIALIZED (
           |  SELECT piece,
           |         CAST(floor(-$sS * ln((cnt + 1)::DOUBLE / (tot + p)) + 0.5)
           |              AS BIGINT) AS cost
           |  FROM $src CROSS JOIN
           |       (SELECT sum(cnt) AS tot, count(*) AS p FROM $src) n)""".stripMargin
    def segCte(k: Int, cost: String) =
      raw"""upaths$k(w, pos, c, revb, ps) AS (
           |  SELECT w, len(w), CAST(0 AS BIGINT), [len(w)], []::VARCHAR[]
           |  FROM wcnt
           |  UNION ALL
           |  SELECT p.w, j, p.c + k.cost, list_append(p.revb, j),
           |         list_prepend(substr(p.w, j + 1, p.pos - j), p.ps)
           |  FROM upaths$k p,
           |       unnest(range(greatest(p.pos - $mp, 0), p.pos)) AS tj(j),
           |       $cost k
           |  WHERE p.pos > 0 AND k.piece = substr(p.w, j + 1, p.pos - j)),
           |useg$k AS MATERIALIZED (
           |  SELECT w, ps FROM (
           |    SELECT w, ps,
           |           row_number() OVER (PARTITION BY w ORDER BY c, revb) AS rn
           |    FROM upaths$k WHERE pos = 0) WHERE rn = 1)""".stripMargin
    // no top-level UNION in any CTE: under WITH RECURSIVE DuckDB
    // gives a non-self-referencing `a UNION b` recursive-union
    // semantics and keeps duplicate rows — the kept set is a FULL
    // OUTER of (top-cap, always-kept chars) instead
    def cntKeptCtes(k: Int) =
      raw"""ucnt$k AS (
           |  SELECT piece, sum(wc) AS cnt
           |  FROM (SELECT w, unnest(ps) AS piece FROM useg$k) JOIN wcnt USING (w)
           |  GROUP BY 1),
           |ukept$k AS MATERIALIZED (
           |  SELECT coalesce(t.piece, cc.piece) AS piece,
           |         coalesce(t.cnt, cc.cnt, 0) AS cnt
           |  FROM (SELECT piece, cnt FROM (
           |          SELECT piece, cnt,
           |                 row_number() OVER (ORDER BY cnt DESC, piece) AS rn
           |          FROM ucnt$k) WHERE rn <= $UniTargetVocab) t
           |  FULL OUTER JOIN (SELECT c.piece, n.cnt
           |                   FROM uchars c LEFT JOIN ucnt$k n USING (piece)) cc
           |    ON cc.piece = t.piece)""".stripMargin
    val wcntCte =
      raw"""wcnt AS MATERIALIZED (
           |  SELECT t AS w, count(*) AS wc
           |  FROM (SELECT unnest(toks) AS t FROM tok) GROUP BY 1),""".stripMargin
    val rounds = (1 to UniIters).map { k =>
      Seq(segCte(k, s"ucost${k - 1}"), cntKeptCtes(k),
        costCte(s"ucost$k", s"ukept$k")).mkString(",\n")
    }.mkString(",\n")
    raw"""${if (defineWcnt) wcntCte else ""}
         |useedall AS (
         |  SELECT substr(w, i, l) AS piece, sum(wc) AS cnt
         |  FROM wcnt,
         |       unnest(range(1, len(w) + 1)) AS ti(i),
         |       unnest(range(1, least($mp, len(w) - i + 1) + 1)) AS tl(l)
         |  GROUP BY 1),
         |uchars AS MATERIALIZED (
         |  SELECT DISTINCT piece FROM useedall WHERE len(piece) = 1),
         |useed AS (
         |  SELECT coalesce(t.piece, cc.piece) AS piece,
         |         coalesce(t.cnt, cc.cnt, 0) AS cnt
         |  FROM (SELECT piece, cnt FROM (
         |          SELECT piece, cnt,
         |                 row_number() OVER (ORDER BY cnt DESC, piece) AS rn
         |          FROM useedall) WHERE rn <= $UniSeedCap) t
         |  FULL OUTER JOIN (SELECT c.piece, s.cnt
         |                   FROM uchars c LEFT JOIN useedall s USING (piece)) cc
         |    ON cc.piece = t.piece),
         |${costCte("ucost0", "useed")},
         |$rounds""".stripMargin
  }

  private lazy val x223 = {
    import graft.ops.TextAnalysis.{UniCostScale, UniIters}
    raw"""WITH RECURSIVE $toksCte,
         |${uniChainCtes(defineWcnt = true)}
         |SELECT k.piece, CAST(k.cnt AS BIGINT) AS n_uses,
         |       ${round4(s"c.cost::DOUBLE / $UniCostScale")} AS nll
         |FROM ukept$UniIters k JOIN ucost$UniIters c USING (piece)""".stripMargin
  }

  // ---- x224 BPE vs unigram comparison ------------------------------
  // Both tokenizer families re-derived in full (the x117 8-merge
  // chain + the x223 2-round EM chain), the corpus segmented under
  // each final model, one per-source compression table.

  private lazy val x224 = {
    import graft.ops.TextAnalysis.{UniMaxPiece, UniIters}
    val mp = UniMaxPiece
    // one more enumeration pass under the FINAL piece costs — the
    // corpus-encode the comparison scores
    val fin = UniIters + 1
    raw"""WITH RECURSIVE $toksCte,
         |$bpeEncCtes,
         |${uniChainCtes(defineWcnt = false)},
         |upaths$fin(w, pos, c, revb, ps) AS (
         |  SELECT w, len(w), CAST(0 AS BIGINT), [len(w)], []::VARCHAR[]
         |  FROM wcnt
         |  UNION ALL
         |  SELECT p.w, j, p.c + k.cost, list_append(p.revb, j),
         |         list_prepend(substr(p.w, j + 1, p.pos - j), p.ps)
         |  FROM upaths$fin p,
         |       unnest(range(greatest(p.pos - $mp, 0), p.pos)) AS tj(j),
         |       ucost$UniIters k
         |  WHERE p.pos > 0 AND k.piece = substr(p.w, j + 1, p.pos - j)),
         |useg$fin AS MATERIALIZED (
         |  SELECT w, ps FROM (
         |    SELECT w, ps,
         |           row_number() OVER (PARTITION BY w ORDER BY c, revb) AS rn
         |    FROM upaths$fin WHERE pos = 0) WHERE rn = 1),
         |bsub AS (SELECT w, len(subs) AS ns_bpe FROM enc),
         |usub AS (SELECT w, len(ps) AS ns_uni FROM useg$fin),
         |posts AS (SELECT doc_id, unnest(toks) AS w FROM tok),
         |perdoc AS (
         |  SELECT doc_id, count(*) AS n_toks,
         |         sum(ns_bpe) AS n_bpe, sum(ns_uni) AS n_uni
         |  FROM posts JOIN bsub USING (w) JOIN usub USING (w)
         |  GROUP BY 1)
         |SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(length(d.text)) AS BIGINT) AS n_chars,
         |       CAST(coalesce(sum(p.n_toks), 0) AS BIGINT) AS n_tokens,
         |       CAST(coalesce(sum(p.n_bpe), 0) AS BIGINT) AS n_bpe_subwords,
         |       CAST(coalesce(sum(p.n_uni), 0) AS BIGINT) AS n_uni_subwords,
         |       CASE WHEN coalesce(sum(p.n_bpe), 0) > 0 THEN
         |         ${round4("sum(length(d.text))::DOUBLE / sum(p.n_bpe)")}
         |       END AS bpe_chars_per_subword,
         |       CASE WHEN coalesce(sum(p.n_uni), 0) > 0 THEN
         |         ${round4("sum(length(d.text))::DOUBLE / sum(p.n_uni)")}
         |       END AS uni_chars_per_subword
         |FROM documents d LEFT JOIN perdoc p USING (doc_id)
         |GROUP BY 1""".stripMargin
  }

  // ---- x229 unigram-LM perplexity quality filter --------------------
  // The x223 training chain, a final enumerated-segmentation pass
  // under the final costs carrying the per-word min TOTAL cost, then
  // the per-doc postings aggregate and the 4dp-grid keep flag.

  private lazy val x229 = {
    import graft.ops.TextAnalysis.{UniMaxPiece, UniIters, UniCostScale,
      UniPplCut}
    val mp = UniMaxPiece
    val fin = UniIters + 1
    raw"""WITH RECURSIVE $toksCte,
         |${uniChainCtes(defineWcnt = true)},
         |upaths$fin(w, pos, c, revb, ps) AS (
         |  SELECT w, len(w), CAST(0 AS BIGINT), [len(w)], []::VARCHAR[]
         |  FROM wcnt
         |  UNION ALL
         |  SELECT p.w, j, p.c + k.cost, list_append(p.revb, j),
         |         list_prepend(substr(p.w, j + 1, p.pos - j), p.ps)
         |  FROM upaths$fin p,
         |       unnest(range(greatest(p.pos - $mp, 0), p.pos)) AS tj(j),
         |       ucost$UniIters k
         |  WHERE p.pos > 0 AND k.piece = substr(p.w, j + 1, p.pos - j)),
         |wenc AS MATERIALIZED (
         |  SELECT w, c AS wcost, len(ps) AS np FROM (
         |    SELECT w, c, ps,
         |           row_number() OVER (PARTITION BY w ORDER BY c, revb) AS rn
         |    FROM upaths$fin WHERE pos = 0) WHERE rn = 1),
         |posts AS (SELECT doc_id, unnest(toks) AS w FROM tok),
         |perdoc AS (
         |  SELECT doc_id, CAST(sum(wcost) AS BIGINT) AS scost,
         |         CAST(sum(np) AS BIGINT) AS n_pieces
         |  FROM posts JOIN wenc USING (w) GROUP BY 1)
         |SELECT doc_id, n_pieces, nll, nll <= $UniPplCut AS kept FROM (
         |  SELECT doc_id, n_pieces,
         |         ${round4(s"scost::DOUBLE / (n_pieces::DOUBLE * $UniCostScale)")}
         |           AS nll
         |  FROM perdoc)""".stripMargin
  }

  // ---- x197 BPE corpus encode --------------------------------------
  // Re-derives the full training chain (shared text with x117, with
  // MATERIALIZED m/w CTEs), then encodes the DISTINCT vocabulary with
  // the same nested-replace trick, assigns dense lexicographic subword
  // ids (the x60 convention) and assembles per-doc id sequences.

  /** Training chain + vocabulary-encode chain ending at
    * `enc(w, subs)` — shared by the id-sequence oracle (x197) and
    * the compression report (x203). */
  private lazy val bpeEncCtes: String = {
    val iters = TextAnalysis.BpeMerges
    val nl = "chr(10)"
    def encCtes(i: Int): String =
      raw"""e$i AS MATERIALIZED (
           |  SELECT w, replace(state, $nl || l || $nl || $nl || r || $nl,
           |                 $nl || l || r || $nl) AS state
           |  FROM e${i - 1} CROSS JOIN m$i)""".stripMargin
    raw"""${bpeChainCtes(mat = true)},
         |e0 AS MATERIALIZED (
         |  SELECT w, $nl || array_to_string([w[i] for i in range(1, len(w) + 1)],
         |                                   $nl || $nl) || $nl AS state
         |  FROM wcnt),
         |${(1 to iters).map(encCtes).mkString(",\n")},
         |enc AS MATERIALIZED (
         |  SELECT w, string_split(trim(state, $nl), $nl || $nl) AS subs
         |  FROM e$iters)""".stripMargin
  }

  private lazy val x197 = {
    raw"""WITH $toksCte,
         |$bpeEncCtes,
         |sid AS MATERIALIZED (
         |  SELECT sym, row_number() OVER (ORDER BY sym) - 1 AS id
         |  FROM (SELECT DISTINCT unnest(subs) AS sym FROM enc)),
         |posts AS (
         |  SELECT doc_id, j AS p, toks[j] AS w
         |  FROM tok, unnest(range(1, len(toks) + 1)) AS t(j)),
         |ps AS (
         |  SELECT doc_id, p, q, subs[q] AS sym
         |  FROM (SELECT doc_id, p, subs FROM posts JOIN enc USING (w)),
         |       unnest(range(1, len(subs) + 1)) AS t(q))
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_subwords,
         |       array_to_string(list(id ORDER BY p, q), ',') AS ids_csv
         |FROM ps JOIN sid USING (sym)
         |GROUP BY 1""".stripMargin
  }

  // ---- x198 hybrid BM25+ANN retrieval with RRF fusion --------------
  // Both legs re-derive their audited oracles (the x11 text embeds as
  // a MATERIALIZED CTE — the x190 pattern; the lexical leg is the x51
  // formula with the probe docs' own distinct terms as the query
  // batch, self-matches excluded). Fusion = FULL OUTER on (q_id, doc)
  // with exact-integer RRF contributions (RrfScale // (K + rank)).

  private val x198 = {
    import graft.ops.Search.{RrfK, RrfScale, ScoreScale, TopK, K1, B, QTermCap,
      ChampionCap}
    val stride = Similarity.QueryStride
    raw"""WITH $toksCte,
         |ann AS MATERIALIZED ($x11),
         |dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM tok),
         |n AS (SELECT count(*) AS n_docs, sum(dl) AS total_toks FROM dl),
         |tfg AS MATERIALIZED (
         |  SELECT doc_id, tok2 AS tok, CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, unnest(toks) AS tok2 FROM tok) GROUP BY 1, 2),
         |qt AS (
         |  SELECT q_id, term FROM (
         |    SELECT doc_id AS q_id, tok AS term,
         |           row_number() OVER (PARTITION BY doc_id
         |             ORDER BY tf DESC, tok) AS trn
         |    FROM tfg WHERE doc_id % $stride = 0)
         |  WHERE trn <= $QTermCap),
         |dfq AS (
         |  SELECT tok, count(*) AS df FROM tfg
         |  WHERE tok IN (SELECT DISTINCT term FROM qt) GROUP BY 1),
         |champ AS MATERIALIZED (
         |  SELECT doc_id, tok, tf FROM (
         |    SELECT doc_id, tok, tf,
         |           row_number() OVER (PARTITION BY tok
         |             ORDER BY tf DESC, doc_id) AS crn
         |    FROM tfg)
         |  WHERE crn <= $ChampionCap),
         |contrib AS (
         |  SELECT q.q_id, t.doc_id,
         |         CAST(floor(ln(1.0 + (n.n_docs - f.df + 0.5) / (f.df + 0.5))
         |                    * (t.tf * ${K1 + 1}) / (t.tf + $K1 * ((1.0 - $B)
         |                       + $B * (dl.dl::DOUBLE * n.n_docs / n.total_toks)))
         |                    * $ScoreScale + 0.5) AS BIGINT) AS fp
         |  FROM qt q JOIN champ t ON t.tok = q.term
         |       JOIN dfq f ON f.tok = t.tok
         |       JOIN dl ON dl.doc_id = t.doc_id
         |       CROSS JOIN n
         |  WHERE q.q_id <> t.doc_id),
         |lex AS MATERIALIZED (
         |  SELECT q_id, doc_id, rnk FROM (
         |    SELECT q_id, doc_id,
         |           row_number() OVER (PARTITION BY q_id
         |             ORDER BY total DESC, doc_id) AS rnk
         |    FROM (SELECT q_id, doc_id, CAST(sum(fp) AS BIGINT) AS total
         |          FROM contrib GROUP BY 1, 2))
         |  WHERE rnk <= $TopK),
         |fused AS (
         |  SELECT coalesce(l.q_id, a.q_id) AS q_id,
         |         coalesce(l.doc_id, a.vec_id) AS doc_id,
         |         l.rnk AS lex_rnk, a.rnk AS ann_rnk,
         |         coalesce($RrfScale // ($RrfK + l.rnk), 0)
         |           + coalesce($RrfScale // ($RrfK + a.rnk), 0) AS rrf_i
         |  FROM lex l FULL OUTER JOIN ann a
         |    ON l.q_id = a.q_id AND l.doc_id = a.vec_id)
         |SELECT q_id, doc_id, lex_rnk, ann_rnk,
         |       ${round4(s"rrf_i::DOUBLE / $RrfScale")} AS rrf,
         |       CAST(rnk AS BIGINT) AS rnk
         |FROM (SELECT *, row_number() OVER (PARTITION BY q_id
         |        ORDER BY rrf_i DESC, doc_id) AS rnk FROM fused)
         |WHERE rnk <= $TopK""".stripMargin
  }

  // ---- x203 tokenizer compression report ---------------------------
  // Same training+encode chain as x197; the aggregate skips the
  // id-assembly stage (stats need counts, not sequences).

  private lazy val x203 =
    raw"""WITH $toksCte,
         |$bpeEncCtes,
         |ns AS (SELECT w, len(subs) AS ns FROM enc),
         |perdoc AS MATERIALIZED (
         |  SELECT doc_id, count(*) AS n_toks, CAST(sum(ns.ns) AS BIGINT) AS n_subs
         |  FROM (SELECT doc_id, unnest(toks) AS w FROM tok) p
         |       JOIN ns USING (w)
         |  GROUP BY 1)
         |SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(length(d.text)) AS BIGINT) AS n_chars,
         |       CAST(coalesce(sum(p.n_toks), 0) AS BIGINT) AS n_tokens,
         |       CAST(coalesce(sum(p.n_subs), 0) AS BIGINT) AS n_subwords,
         |       CASE WHEN coalesce(sum(p.n_subs), 0) > 0
         |            THEN ${round4("sum(length(d.text))::DOUBLE / sum(p.n_subs)::DOUBLE")}
         |            END AS chars_per_subword,
         |       CASE WHEN coalesce(sum(p.n_toks), 0) > 0
         |            THEN ${round4("sum(p.n_subs)::DOUBLE / sum(p.n_toks)::DOUBLE")}
         |            END AS subwords_per_token
         |FROM documents d LEFT JOIN perdoc p USING (doc_id)
         |GROUP BY 1""".stripMargin

  // ---- x204 retrieval-fusion evaluation ----------------------------
  // recall@k of the ANN leg and the fused list against the exact
  // cosine ground truth — the three retrieval oracles embed verbatim.

  private lazy val x204 = {
    val k = graft.ops.Search.TopK
    raw"""WITH gt AS MATERIALIZED ($x10),
         |ivftop AS MATERIALIZED ($x11),
         |fusedtop AS MATERIALIZED ($x198),
         |nb AS (SELECT q_id, count(*) AS n_brute FROM gt GROUP BY 1),
         |ah AS (
         |  SELECT b.q_id, count(*) AS ann_hits
         |  FROM gt b JOIN ivftop a ON b.q_id = a.q_id AND b.vec_id = a.vec_id
         |  GROUP BY 1),
         |fh AS (
         |  SELECT b.q_id, count(*) AS fused_hits
         |  FROM gt b JOIN fusedtop f ON b.q_id = f.q_id AND b.vec_id = f.doc_id
         |  GROUP BY 1)
         |SELECT nb.q_id, CAST(nb.n_brute AS BIGINT) AS n_brute,
         |       CAST(coalesce(ah.ann_hits, 0) AS BIGINT) AS ann_hits,
         |       CAST(coalesce(fh.fused_hits, 0) AS BIGINT) AS fused_hits,
         |       ${round4(s"coalesce(ah.ann_hits, 0)::DOUBLE / $k")} AS ann_recall,
         |       ${round4(s"coalesce(fh.fused_hits, 0)::DOUBLE / $k")} AS fused_recall
         |FROM nb LEFT JOIN ah USING (q_id) LEFT JOIN fh USING (q_id)""".stripMargin
  }

  // ---- x205 cross-split near-dup confirmation ----------------------
  // The x5 capped band chain verbatim; the join is arriving(%3==0) ×
  // historical instead of the full self-join.

  private lazy val x205 =
    raw"""WITH $x5Ctes
         |SELECT DISTINCT doc_new, doc_hist, jaccard FROM (
         |  SELECT l.doc_id AS doc_new, r.doc_id AS doc_hist, $jaccardExpr AS jaccard
         |  FROM bands l JOIN bands r
         |    ON l.band_idx = r.band_idx AND l.band_hash = r.band_hash
         |   AND l.doc_id % 3 = 0 AND r.doc_id % 3 <> 0)
         |WHERE jaccard >= ${Dedup.JaccardThreshold}""".stripMargin

  // ---- x206 exact-substring dedup regions --------------------------
  // Suffix-array semantics via equal-first-L-token classes (see the
  // Dedup.exactSubstrSpans scaladoc): duplicated L-window starts
  // merged into maximal spans by gaps-and-islands over pos.

  private lazy val x206 = {
    val L = Dedup.ExactSubstrTokens
    raw"""WITH $toksCte,
         |w AS MATERIALIZED (
         |  SELECT doc_id, t.i - 1 AS pos,
         |         md5(array_to_string(toks[t.i : t.i + $L - 1], ' ')) AS fp
         |  FROM tok, unnest(range(1, len(toks) - $L + 2)) AS t(i)),
         |dupfp AS (SELECT fp FROM w GROUP BY fp HAVING count(*) > 1),
         |starts AS (
         |  SELECT doc_id, pos FROM w WHERE fp IN (SELECT fp FROM dupfp)),
         |flags AS (
         |  SELECT doc_id, pos,
         |         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
         |                   <= $L THEN 0 ELSE 1 END AS newisl
         |  FROM starts),
         |isl AS (
         |  SELECT doc_id, pos,
         |         sum(newisl) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
         |  FROM flags)
         |SELECT doc_id,
         |       CAST(min(pos) AS BIGINT) AS span_start,
         |       CAST(max(pos) + $L - 1 AS BIGINT) AS span_end,
         |       CAST(max(pos) - min(pos) + $L AS BIGINT) AS span_len,
         |       CAST(count(*) AS BIGINT) AS n_windows
         |FROM isl GROUP BY doc_id, grp""".stripMargin
  }

  // ---- x207 MMR diversity-aware top-k selection --------------------
  // Unrolled fixed-round greedy chain (the kmeans/BPE convention) on
  // top of the x11 IVF candidates: integer-grid relevance/pairwise
  // cosines, per-round argmax (mmr DESC, vec_id ASC), cumulative
  // selected set per round.

  private lazy val x207 = {
    val k = Similarity.MmrK
    val sc = Similarity.MmrScale
    def pickSql(scored: String, round: Int): String =
      raw"""SELECT q_id, vec_id, CAST($round AS BIGINT) AS pick_round,
           |       rel_i, pen_i, mmr_i
           |FROM (SELECT q_id, vec_id, rel_i, pen_i, mmr_i,
           |             row_number() OVER (PARTITION BY q_id
           |               ORDER BY mmr_i DESC, vec_id) AS rn FROM $scored)
           |WHERE rn = 1""".stripMargin
    def stepCtes(t: Int): String =
      raw"""pen$t AS (
           |  SELECT s.q_id, s.cand AS vec_id, max(s.sim_i) AS pen_i
           |  FROM sims s JOIN sel${t - 1} e ON s.q_id = e.q_id AND s.other = e.vec_id
           |  GROUP BY 1, 2),
           |sc$t AS (
           |  SELECT c.q_id, c.vec_id, c.rel_i, p.pen_i,
           |         c.rel_i - p.pen_i AS mmr_i
           |  FROM cands c JOIN pen$t p USING (q_id, vec_id)
           |  WHERE NOT EXISTS (SELECT 1 FROM sel${t - 1} e
           |                    WHERE e.q_id = c.q_id AND e.vec_id = c.vec_id)),
           |sel$t AS MATERIALIZED (
           |  SELECT * FROM sel${t - 1}
           |  UNION ALL ${pickSql(s"sc$t", t)})""".stripMargin
    raw"""WITH $vecCte,
         |ivf AS MATERIALIZED ($x11),
         |pool AS MATERIALIZED (
         |  SELECT i.q_id, i.vec_id,
         |         CAST(floor(i.cos_sim * $sc + 0.5) AS BIGINT) AS rel_i,
         |         e.v, e.nrm
         |  FROM ivf i JOIN vn e USING (vec_id)),
         |cands AS MATERIALIZED (SELECT q_id, vec_id, rel_i FROM pool),
         |sims AS MATERIALIZED (
         |  SELECT a.q_id, a.vec_id AS cand, b.vec_id AS other,
         |         CAST(floor(${cosExpr("a.v", "a.nrm", "b.v", "b.nrm")} * $sc + 0.5)
         |              AS BIGINT) AS sim_i
         |  FROM pool a JOIN pool b ON a.q_id = b.q_id AND a.vec_id <> b.vec_id),
         |sel1 AS MATERIALIZED (
         |  ${pickSql(
              "(SELECT q_id, vec_id, rel_i, CAST(NULL AS BIGINT) AS pen_i, " +
                "rel_i AS mmr_i FROM cands)", 1)}),
         |${(2 to k).map(stepCtes).mkString(",\n")}
         |SELECT q_id, vec_id, pick_round,
         |       ${round4(s"rel_i::DOUBLE / $sc")} AS rel,
         |       ${round4(s"pen_i::DOUBLE / $sc")} AS max_sim_selected,
         |       ${round4(s"mmr_i::DOUBLE / $sc")} AS mmr
         |FROM sel$k""".stripMargin
  }

  // ---- x208 tokenizer fertility per language -----------------------
  // The x203 compression report regrouped on the x2 langid prediction;
  // pred_lang CASE generated from the same LangMarkers constants.

  /** Per-doc predicted language CTE (`lng(doc_id, pred_lang)`) — the
    * x2 argmax, regenerated from the shared constants for x208. */
  private lazy val langCte: String = {
    val langs = TextAnalysis.LangMarkers
    val hitCols = langs.map { case (l, ws) =>
      s"len(list_filter(toks, t -> list_contains(${strList(ws)}, t))) AS hits_$l"
    }.mkString(",\n           ")
    val cases = langs.zipWithIndex.init.map { case ((l, _), i) =>
      val later = langs.drop(i + 1).map { case (l2, _) => s"hits_$l >= hits_$l2" }
      s"WHEN ${later.mkString(" AND ")} THEN '$l'"
    }.mkString("\n              ")
    raw"""lng AS (
         |  SELECT doc_id,
         |         CASE $cases
         |              ELSE '${langs.last._1}' END AS pred_lang
         |  FROM (SELECT doc_id, $hitCols FROM tok))""".stripMargin
  }

  private lazy val x208 =
    raw"""WITH $toksCte,
         |$bpeEncCtes,
         |$langCte,
         |ns AS (SELECT w, len(subs) AS ns FROM enc),
         |perdoc AS MATERIALIZED (
         |  SELECT doc_id, count(*) AS n_toks, CAST(sum(ns.ns) AS BIGINT) AS n_subs
         |  FROM (SELECT doc_id, unnest(toks) AS w FROM tok) p
         |       JOIN ns USING (w)
         |  GROUP BY 1)
         |SELECT g.pred_lang, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(length(d.text)) AS BIGINT) AS n_chars,
         |       CAST(coalesce(sum(p.n_toks), 0) AS BIGINT) AS n_tokens,
         |       CAST(coalesce(sum(p.n_subs), 0) AS BIGINT) AS n_subwords,
         |       CASE WHEN coalesce(sum(p.n_toks), 0) > 0
         |            THEN ${round4("sum(p.n_subs)::DOUBLE / sum(p.n_toks)::DOUBLE")}
         |            END AS subwords_per_token,
         |       CASE WHEN coalesce(sum(p.n_subs), 0) > 0
         |            THEN ${round4("sum(length(d.text))::DOUBLE / sum(p.n_subs)::DOUBLE")}
         |            END AS chars_per_subword
         |FROM documents d JOIN lng g USING (doc_id)
         |     LEFT JOIN perdoc p USING (doc_id)
         |GROUP BY 1""".stripMargin

  // ---- x201 label-propagation communities --------------------------
  // Unrolled fixed-round chain over the x114 mutual-kNN edges; every
  // CTE MATERIALIZED (the x172 lesson — inlining re-derives the knn
  // mining per reference). Per-round argmax = (count DESC, label ASC),
  // the engine's struct-min order.

  /** The x201 fixed-round LPA chain (knn edges → symmetrized e →
    * l0..lN label generations), shared by the community listing
    * (x201) and the modularity audit (x202). */
  private lazy val lpaChainCtes: String = {
    val rounds = graft.ops.Graph.LpaRounds
    def stepCtes(r: Int): String =
      raw"""cnt$r AS MATERIALIZED (
           |  SELECT e.u, l.lbl, count(*) AS cnt
           |  FROM e JOIN l${r - 1} l ON e.v = l.u
           |  GROUP BY 1, 2),
           |l$r AS MATERIALIZED (
           |  SELECT u, lbl FROM (
           |    SELECT u, lbl,
           |           row_number() OVER (PARTITION BY u ORDER BY cnt DESC, lbl) AS rn
           |    FROM cnt$r)
           |  WHERE rn = 1)""".stripMargin
    raw"""knn AS MATERIALIZED ($x114),
         |e AS MATERIALIZED (
         |  SELECT vec_a AS u, vec_b AS v FROM knn
         |  UNION ALL SELECT vec_b, vec_a FROM knn),
         |l0 AS MATERIALIZED (SELECT DISTINCT u, u AS lbl FROM e),
         |${(1 to rounds).map(stepCtes).mkString(",\n")}""".stripMargin
  }

  private lazy val lpaFinal = s"l${graft.ops.Graph.LpaRounds}"

  private lazy val x201 =
    raw"""WITH $lpaChainCtes,
         |sizes AS (
         |  SELECT lbl, CAST(count(*) AS BIGINT) AS community_size
         |  FROM $lpaFinal GROUP BY 1)
         |SELECT l.u AS vec_id, l.lbl AS community, s.community_size
         |FROM $lpaFinal l JOIN sizes s USING (lbl)""".stripMargin

  // ---- x202 modularity audit of the x201 partition -----------------
  // Q_c computed as the exact integer (4m·e_c − d_c²) over 4m² —
  // identical expression order to Graph.modularityFrom.

  private lazy val x202 =
    raw"""WITH $lpaChainCtes,
         |tagged AS MATERIALIZED (
         |  SELECT la.lbl AS la, lb.lbl AS lb
         |  FROM knn k JOIN $lpaFinal la ON k.vec_a = la.u
         |             JOIN $lpaFinal lb ON k.vec_b = lb.u),
         |m AS (SELECT count(*) AS m FROM tagged),
         |intra AS (
         |  SELECT la AS lbl, count(*) AS internal_edges
         |  FROM tagged WHERE la = lb GROUP BY 1),
         |degs AS (
         |  SELECT lbl, count(*) AS degree_sum FROM (
         |    SELECT la AS lbl FROM tagged UNION ALL SELECT lb FROM tagged)
         |  GROUP BY 1),
         |members AS (
         |  SELECT lbl, CAST(count(*) AS BIGINT) AS n_members
         |  FROM $lpaFinal GROUP BY 1)
         |SELECT mb.lbl AS community, mb.n_members,
         |       CAST(coalesce(i.internal_edges, 0) AS BIGINT) AS internal_edges,
         |       CAST(coalesce(dg.degree_sum, 0) AS BIGINT) AS degree_sum,
         |       ${round4("(4 * m.m * coalesce(i.internal_edges, 0) - " +
               "coalesce(dg.degree_sum, 0) * coalesce(dg.degree_sum, 0))::DOUBLE " +
               "/ (4 * m.m * m.m)::DOUBLE")} AS q_contrib
         |FROM members mb
         |LEFT JOIN degs dg USING (lbl)
         |LEFT JOIN intra i USING (lbl)
         |CROSS JOIN m""".stripMargin

  // ---- x209 duplicated-token rate per source -----------------------
  // The x206 maximal spans are disjoint per doc, so coverage is an
  // exact sum of span lengths.

  private lazy val x209 =
    raw"""WITH $toksCte,
         |sp AS MATERIALIZED ($x206),
         |pd AS (
         |  SELECT doc_id, CAST(sum(span_len) AS BIGINT) AS dup_toks,
         |         CAST(count(*) AS BIGINT) AS n_spans
         |  FROM sp GROUP BY 1)
         |SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(len(t.toks)) AS BIGINT) AS n_tokens,
         |       CAST(coalesce(sum(pd.dup_toks), 0) AS BIGINT) AS n_dup_tokens,
         |       CAST(coalesce(sum(pd.n_spans), 0) AS BIGINT) AS n_spans,
         |       CASE WHEN sum(len(t.toks)) > 0
         |            THEN ${round4(
                "coalesce(sum(pd.dup_toks), 0)::DOUBLE / sum(len(t.toks))::DOUBLE")}
         |            END AS dup_rate
         |FROM documents d JOIN tok t USING (doc_id) LEFT JOIN pd USING (doc_id)
         |GROUP BY 1""".stripMargin

  // ---- x210 curriculum mix table -----------------------------------
  // LPA community (x201 chain) x predicted language (x2 CASE) x 1e-4
  // grid quality; sqrt-allocation weight over the exact-integer
  // normalizer.

  private lazy val x210 = {
    val stop = strList(TextAnalysis.Stopwords)
    raw"""WITH $toksCte,
         |$lpaChainCtes,
         |$langCte,
         |qd AS (
         |  SELECT doc_id,
         |         CAST(floor(($qualityScoreSqlNoAlias) * 10000 + 0.5) AS BIGINT) AS q4
         |  FROM (
         |    SELECT doc_id, text,
         |           len(toks) AS n_tokens,
         |           len(regexp_extract_all(text, '${TextAnalysis.PunctPattern}')) AS n_punct,
         |           len(list_filter(toks, t -> list_contains($stop, t))) AS n_stopwords
         |    FROM tok)),
         |perdoc AS (
         |  SELECT CAST(coalesce(l.lbl, -1) AS BIGINT) AS community,
         |         g.pred_lang, q.q4
         |  FROM documents d JOIN lng g USING (doc_id) JOIN qd q USING (doc_id)
         |       LEFT JOIN $lpaFinal l ON l.u = d.doc_id),
         |grp AS (
         |  SELECT community, pred_lang, CAST(count(*) AS BIGINT) AS n_docs,
         |         CAST(sum(q4) AS BIGINT) AS sq4,
         |         CAST(floor(sqrt(count(*)::DOUBLE) * 10000 + 0.5) AS BIGINT) AS s4
         |  FROM perdoc GROUP BY 1, 2),
         |tot AS (SELECT CAST(sum(s4) AS BIGINT) AS w_total FROM grp)
         |SELECT community, pred_lang, n_docs,
         |       ${round4("sq4::DOUBLE / (n_docs * 10000)::DOUBLE")} AS mean_quality,
         |       ${round4("s4::DOUBLE / w_total::DOUBLE")} AS mix_weight
         |FROM grp CROSS JOIN tot""".stripMargin
  }

  // ---- x211 embedding outlier screen -------------------------------
  // Per-member centroid cosine on the 1e-4 grid; label moments from
  // exact integer sums; z = (n·x − Σx)/sqrt(n·Σx² − (Σx)²).

  private lazy val x211 = {
    val scale = Similarity.CentroidScale
    val zCut = Similarity.OutlierZ
    raw"""WITH comp AS (
         |  SELECT label, u.d AS dim,
         |         sum(CAST(floor(u.x * $scale) AS BIGINT)) AS component_sum,
         |         CAST(count(*) AS BIGINT) AS n
         |  FROM (SELECT label, embedding::DOUBLE[] AS e FROM embeddings) v,
         |       unnest([{'d': i-1, 'x': e[i]} for i in range(1, len(e)+1)]) AS t(u)
         |  GROUP BY 1, 2),
         |cents AS (
         |  SELECT CAST(label AS BIGINT) AS label, max(n) AS n,
         |         list(component_sum::DOUBLE / ((n * $scale)::DOUBLE) ORDER BY dim) AS cv
         |  FROM comp GROUP BY 1),
         |cn AS (SELECT label, cv,
         |              sqrt(list_sum([x * x for x in cv])) AS cnrm FROM cents),
         |mem AS (
         |  SELECT CAST(label AS BIGINT) AS label, vec_id, v,
         |         sqrt(list_sum([x * x for x in v])) AS nrm
         |  FROM (SELECT label, vec_id, embedding::DOUBLE[] AS v FROM embeddings)),
         |c4 AS MATERIALIZED (
         |  SELECT m.label, m.vec_id,
         |         CAST(floor(${dotExpr("m.v", "c.cv")} / (m.nrm * c.cnrm)
         |                    * 10000 + 0.5) AS BIGINT) AS cos4
         |  FROM mem m JOIN cn c USING (label)),
         |st AS (
         |  SELECT label, CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(cos4) AS BIGINT) AS s1,
         |         CAST(sum(cos4 * cos4) AS BIGINT) AS s2
         |  FROM c4 GROUP BY 1
         |  HAVING CAST(count(*) AS BIGINT) * CAST(sum(cos4 * cos4) AS BIGINT)
         |         - CAST(sum(cos4) AS BIGINT) * CAST(sum(cos4) AS BIGINT) > 0)
         |SELECT vec_id, label, cos_centroid, z FROM (
         |  SELECT c.vec_id, c.label,
         |         ${round4("cos4::DOUBLE / 10000")} AS cos_centroid,
         |         ${round4(
                "(cos4 * n - s1)::DOUBLE / sqrt((n * s2 - s1 * s1)::DOUBLE)")} AS z
         |  FROM c4 c JOIN st USING (label))
         |WHERE z <= -$zCut""".stripMargin
  }

  // ---- x213 champion-list recall audit -----------------------------
  // The x198 lexical leg twice — exact vs champion-truncated — from
  // one shared tfg/qt/dfq prefix; overlap@k per probe.

  private lazy val x213 = {
    import graft.ops.Search.{ScoreScale, TopK, K1, B, QTermCap, ChampionCap}
    val stride = Similarity.QueryStride
    def leg(p: String, champ: Boolean): String = {
      val postings = if (champ) s"${p}cp" else "tfg"
      val champCte = if (champ)
        raw"""${p}cp AS MATERIALIZED (
             |  SELECT doc_id, tok, tf FROM (
             |    SELECT doc_id, tok, tf,
             |           row_number() OVER (PARTITION BY tok
             |             ORDER BY tf DESC, doc_id) AS crn
             |    FROM tfg)
             |  WHERE crn <= $ChampionCap),
             |""".stripMargin
      else ""
      raw"""$champCte${p}contrib AS (
           |  SELECT q.q_id, t.doc_id,
           |         CAST(floor(ln(1.0 + (n.n_docs - f.df + 0.5) / (f.df + 0.5))
           |                    * (t.tf * ${K1 + 1}) / (t.tf + $K1 * ((1.0 - $B)
           |                       + $B * (dl.dl::DOUBLE * n.n_docs / n.total_toks)))
           |                    * $ScoreScale + 0.5) AS BIGINT) AS fp
           |  FROM qt q JOIN $postings t ON t.tok = q.term
           |       JOIN dfq f ON f.tok = t.tok
           |       JOIN dl ON dl.doc_id = t.doc_id
           |       CROSS JOIN n
           |  WHERE q.q_id <> t.doc_id),
           |${p}top AS MATERIALIZED (
           |  SELECT q_id, doc_id FROM (
           |    SELECT q_id, doc_id,
           |           row_number() OVER (PARTITION BY q_id
           |             ORDER BY total DESC, doc_id) AS rnk
           |    FROM (SELECT q_id, doc_id, CAST(sum(fp) AS BIGINT) AS total
           |          FROM ${p}contrib GROUP BY 1, 2))
           |  WHERE rnk <= $TopK)""".stripMargin
    }
    raw"""WITH $toksCte,
         |dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM tok),
         |n AS (SELECT count(*) AS n_docs, sum(dl) AS total_toks FROM dl),
         |tfg AS MATERIALIZED (
         |  SELECT doc_id, tok2 AS tok, CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, unnest(toks) AS tok2 FROM tok) GROUP BY 1, 2),
         |qt AS (
         |  SELECT q_id, term FROM (
         |    SELECT doc_id AS q_id, tok AS term,
         |           row_number() OVER (PARTITION BY doc_id
         |             ORDER BY tf DESC, tok) AS trn
         |    FROM tfg WHERE doc_id % $stride = 0)
         |  WHERE trn <= $QTermCap),
         |dfq AS (
         |  SELECT tok, count(*) AS df FROM tfg
         |  WHERE tok IN (SELECT DISTINCT term FROM qt) GROUP BY 1),
         |${leg("e", champ = false)},
         |${leg("c", champ = true)},
         |hits AS (
         |  SELECT e.q_id, count(*) AS hits
         |  FROM etop e JOIN ctop c ON e.q_id = c.q_id AND e.doc_id = c.doc_id
         |  GROUP BY 1)
         |SELECT ne.q_id, ne.n_exact,
         |       CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
         |       ${round4("coalesce(h.hits, 0)::DOUBLE / ne.n_exact::DOUBLE")} AS recall
         |FROM (SELECT q_id, CAST(count(*) AS BIGINT) AS n_exact
         |      FROM etop GROUP BY 1) ne
         |LEFT JOIN hits h USING (q_id)""".stripMargin
  }

  // ---- x214 graph-based ANN (beam search over the mutual-kNN graph)
  // Mirrors Similarity.graphAnnFrom exactly: x11 IVF seeds, then
  // GraphAnnRounds unrolled beam rounds — expand one hop over the
  // x114 edge list (both directions), rescore the deduped pool on the
  // shared 4dp cosine grid, keep the top-GraphAnnBeam by (cos desc,
  // vec_id) — then the final top-k cut. The embedded x11/x114 CTEs
  // re-derive the quantizer and graph; their inner `vn` shadows the
  // outer one (the x190 composition pattern).

  private lazy val x214 = {
    val k = Similarity.TopK; val beam = Similarity.GraphAnnBeam
    val qs = Similarity.QueryStride; val rounds = Similarity.GraphAnnRounds
    def scoreCte(src: String, out: String): String =
      raw"""$out AS (
           |  SELECT pl.q_id, v2.vec_id,
           |         ${cosExpr("p.qv", "p.qn", "v2.v", "v2.nrm")} AS cos_sim
           |  FROM $src pl JOIN vn v2 ON v2.vec_id = pl.vec_id
           |       JOIN probes p ON p.q_id = pl.q_id)""".stripMargin
    def roundCtes(r: Int): String =
      raw"""pool$r AS (
           |  SELECT DISTINCT q_id, vec_id FROM (
           |    SELECT q_id, vec_id FROM cand${r - 1}
           |    UNION ALL
           |    SELECT c.q_id, a.dst AS vec_id
           |    FROM cand${r - 1} c JOIN adj a ON c.vec_id = a.src)
           |  WHERE q_id <> vec_id),
           |${scoreCte(s"pool$r", s"sc$r")},
           |cand$r AS MATERIALIZED (
           |  SELECT q_id, vec_id FROM (
           |    SELECT q_id, vec_id,
           |           row_number() OVER (PARTITION BY q_id
           |             ORDER BY cos_sim DESC, vec_id) AS brnk
           |    FROM sc$r)
           |  WHERE brnk <= $beam)""".stripMargin
    raw"""WITH $vecCte,
         |probes AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM vn
         |           WHERE vec_id % $qs = 0),
         |knng AS MATERIALIZED ($x114),
         |adj AS (SELECT vec_a AS src, vec_b AS dst FROM knng
         |        UNION ALL SELECT vec_b AS src, vec_a AS dst FROM knng),
         |cand0 AS MATERIALIZED (SELECT q_id, vec_id FROM ($x11)),
         |${(1 to rounds).map(roundCtes).mkString(",\n")},
         |${scoreCte(s"cand$rounds", "scf")}
         |SELECT q_id, vec_id, cos_sim, CAST(rnk AS BIGINT) AS rnk FROM (
         |  SELECT q_id, vec_id, cos_sim,
         |         row_number() OVER (PARTITION BY q_id
         |           ORDER BY cos_sim DESC, vec_id) AS rnk
         |  FROM scf)
         |WHERE rnk <= $k""".stripMargin
  }

  // ---- x215 graph-ANN recall audit ---------------------------------
  // The x190 overlap shape with the x214 index as the audited leg.

  private lazy val x215 = {
    val k = Similarity.TopK
    raw"""WITH brute AS MATERIALIZED ($x10),
         |g AS MATERIALIZED ($x214),
         |common AS (
         |  SELECT b.q_id, CAST(count(*) AS BIGINT) AS n_common
         |  FROM brute b JOIN g ON b.q_id = g.q_id AND b.vec_id = g.vec_id
         |  GROUP BY 1)
         |SELECT b.q_id, CAST(count(*) AS BIGINT) AS n_brute,
         |       coalesce(any_value(common.n_common), 0) AS n_common,
         |       ${round4(s"coalesce(any_value(common.n_common), 0)::DOUBLE / $k")} AS recall
         |FROM brute b LEFT JOIN common ON b.q_id = common.q_id
         |GROUP BY b.q_id""".stripMargin
  }

  // ---- x246 graph-ANN beam-width / recall frontier -------------------
  // Mirrors Similarity.graphAnnBeamFrontier: the x214 unrolled beam
  // search re-run per GraphAnnBeamSweep width (suffixed CTE chains off
  // ONE shared quantizer/graph/seed set), each audited against the
  // x10 exact leg and collapsed to a per-width frontier row of exact
  // integer sums + one fixed division.

  private lazy val x246 = {
    val k = Similarity.TopK; val qs = Similarity.QueryStride
    val rounds = Similarity.GraphAnnRounds
    def scoreCte(src: String, out: String): String =
      raw"""$out AS (
           |  SELECT pl.q_id, v2.vec_id,
           |         ${cosExpr("p.qv", "p.qn", "v2.v", "v2.nrm")} AS cos_sim
           |  FROM $src pl JOIN vn v2 ON v2.vec_id = pl.vec_id
           |       JOIN probes p ON p.q_id = pl.q_id)""".stripMargin
    def roundCtes(r: Int, beam: Int): String = {
      val prev = if (r == 1) "cand0" else s"cand${r - 1}_$beam"
      raw"""pool${r}_$beam AS (
           |  SELECT DISTINCT q_id, vec_id FROM (
           |    SELECT q_id, vec_id FROM $prev
           |    UNION ALL
           |    SELECT c.q_id, a.dst AS vec_id
           |    FROM $prev c JOIN adj a ON c.vec_id = a.src)
           |  WHERE q_id <> vec_id),
           |${scoreCte(s"pool${r}_$beam", s"sc${r}_$beam")},
           |cand${r}_$beam AS MATERIALIZED (
           |  SELECT q_id, vec_id FROM (
           |    SELECT q_id, vec_id,
           |           row_number() OVER (PARTITION BY q_id
           |             ORDER BY cos_sim DESC, vec_id) AS brnk
           |    FROM sc${r}_$beam)
           |  WHERE brnk <= $beam)""".stripMargin
    }
    def beamChain(beam: Int): String =
      raw"""${(1 to rounds).map(r => roundCtes(r, beam)).mkString(",\n")},
           |${scoreCte(s"cand${rounds}_$beam", s"scf_$beam")},
           |top_$beam AS (
           |  SELECT q_id, vec_id FROM (
           |    SELECT q_id, vec_id,
           |           row_number() OVER (PARTITION BY q_id
           |             ORDER BY cos_sim DESC, vec_id) AS rnk
           |    FROM scf_$beam)
           |  WHERE rnk <= $k),
           |rec_$beam AS (
           |  SELECT CAST($beam AS BIGINT) AS beam,
           |         CAST(count(*) AS BIGINT) AS n_probes,
           |         CAST(sum(n_common) AS BIGINT) AS sum_common,
           |         min(${round4(s"n_common::DOUBLE / $k")}) AS min_recall
           |  FROM (
           |    SELECT b.q_id, coalesce(c.n_common, 0) AS n_common
           |    FROM (SELECT DISTINCT q_id FROM brute) b
           |    LEFT JOIN (
           |      SELECT br.q_id, CAST(count(*) AS BIGINT) AS n_common
           |      FROM brute br JOIN top_$beam t
           |        ON t.q_id = br.q_id AND t.vec_id = br.vec_id
           |      GROUP BY 1) c ON c.q_id = b.q_id))""".stripMargin
    val sweep = Similarity.GraphAnnBeamSweep
    raw"""WITH $vecCte,
         |probes AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM vn
         |           WHERE vec_id % $qs = 0),
         |knng AS MATERIALIZED ($x114),
         |adj AS MATERIALIZED (SELECT vec_a AS src, vec_b AS dst FROM knng
         |        UNION ALL SELECT vec_b AS src, vec_a AS dst FROM knng),
         |cand0 AS MATERIALIZED (SELECT q_id, vec_id FROM ($x11)),
         |brute AS MATERIALIZED ($x10),
         |${sweep.map(beamChain).mkString(",\n")}
         |SELECT beam, n_probes, sum_common,
         |       ${round4("sum_common::DOUBLE / (n_probes * " + k + ")::DOUBLE")}
         |         AS mean_recall,
         |       min_recall
         |FROM (${sweep.map(b => s"SELECT * FROM rec_$b").mkString(" UNION ALL ")})""".stripMargin
  }

  // ---- x216 lakehouse snapshot read --------------------------------
  // The engine REALLY runs the three-commit protocol (base load,
  // bucket-1 upsert, a v1-based writer rebasing onto v2) and reads
  // the v3 snapshot; the oracle derives the same final state
  // arithmetically from the commit rules (the x131 convention). Any
  // drift in bucket routing, rebase merging, or snapshot resolution
  // breaks the hash.

  private val x216 = {
    val nb = graft.sources.TxnLog.NumBuckets
    raw"""SELECT doc_id, lang,
         |       CAST(CASE doc_id % $nb WHEN 1 THEN n_chars + 1000
         |                              WHEN 2 THEN n_chars + 2000
         |                              ELSE n_chars END AS BIGINT) AS n_chars,
         |       CAST(CASE doc_id % $nb WHEN 1 THEN 2 WHEN 2 THEN 3
         |                              ELSE 1 END AS BIGINT) AS commit_version
         |FROM documents""".stripMargin
  }

  // ---- x241 zone-map data skipping ----------------------------------
  // The engine range-clusters the table into quartile buckets, rewrites
  // bucket 1 (+1000 chars), then reads doc_id <= span/2 - 1 through
  // snapshotRange — buckets 2/3 are PRUNED by their committed min/max
  // and never reach the scan (require + PlanSpec pin the receipt). The
  // oracle recomputes the same range + rewrite CASE from the original
  // table: a pruning bug that loses rows, or a stale zone map on the
  // rewritten bucket, breaks the hash.

  private val x241 = {
    val nb = graft.sources.TxnLog.NumBuckets
    raw"""WITH mx AS (
         |  SELECT CAST(max(doc_id) + 1 AS DOUBLE) AS span,
         |         CAST(max(doc_id) + 1 AS BIGINT) AS ispan
         |  FROM documents)
         |SELECT doc_id, lang,
         |       CAST(CASE WHEN floor(doc_id * $nb / span) = 1
         |                 THEN n_chars + 1000 ELSE n_chars
         |            END AS BIGINT) AS n_chars
         |FROM documents CROSS JOIN mx
         |WHERE doc_id <= ispan // 2 - 1""".stripMargin
  }

  // ---- x251/x252 video frame fingerprints + cross-video near-dup -----
  // The engine walks the REAL GIF block stream (variable-length prefix
  // of 1 + tlen%7 image descriptors) to find the frame-buffer payload,
  // splits it into one equal byte range per frame, and hashes each
  // frame with the x242 64-cell mean-threshold grid; the oracle
  // exploits payload = utf8(text) and frame count = 1 + tlen%7 from
  // the videoTable construction and re-derives every bit. Sub-grid
  // frames (< 64 B) are dropped in both engines.

  private val vsigCte = {
    val bits = Multimodal.AHashBits
    raw"""vsig AS (
         |  SELECT doc_id, frame_idx, CAST(fl AS BIGINT) AS n_bytes,
         |         [CAST(list_sum([CASE WHEN cells[k*16 + r + 1].s * fl
         |                                   > total * cells[k*16 + r + 1].cnt
         |                              THEN (1::BIGINT << r) ELSE 0::BIGINT END
         |                         for r in range(0, 16)]) AS BIGINT)
         |          for k in range(0, ${Multimodal.AHashBands})] AS words
         |  FROM (
         |    SELECT doc_id, frame_idx, fl, cells,
         |           list_sum([x.s for x in cells]) AS total
         |    FROM (
         |      SELECT doc_id, frame_idx, fl,
         |             [{'cnt': ((i+1)*fl)//$bits - (i*fl)//$bits,
         |               's': coalesce(list_sum([ord(substr(text, flo + j + 1, 1))
         |                     for j in range((i*fl)//$bits, ((i+1)*fl)//$bits)]), 0)}
         |              for i in range(0, $bits)] AS cells
         |      FROM (
         |        SELECT doc_id, text, f AS frame_idx,
         |               (f*tlen)//nf AS flo,
         |               ((f+1)*tlen)//nf - (f*tlen)//nf AS fl
         |        FROM (SELECT doc_id, text,
         |                     octet_length(encode(text)) AS tlen,
         |                     1 + octet_length(encode(text)) % 7 AS nf
         |              FROM documents),
         |             range(0, 7) t(f)
         |        WHERE f < nf
         |          AND ((f+1)*tlen)//nf - (f*tlen)//nf >= $bits))))""".stripMargin
  }

  private val x251 =
    raw"""WITH $vsigCte
         |SELECT doc_id, frame_idx, n_bytes,
         |       printf('%04x%04x%04x%04x',
         |              words[4], words[3], words[2], words[1]) AS vhash
         |FROM vsig""".stripMargin

  private val x252 =
    raw"""WITH $vsigCte,
         |b AS (SELECT doc_id, frame_idx, words, k AS band_idx,
         |             words[k+1] AS band_val
         |      FROM vsig, range(0, ${Multimodal.AHashBands}) t(k))
         |SELECT doc_a, frame_a, doc_b, frame_b, hamming FROM (
         |  SELECT DISTINCT l.doc_id AS doc_a, l.frame_idx AS frame_a,
         |         r.doc_id AS doc_b, r.frame_idx AS frame_b,
         |         CAST(list_sum([bit_count(xor(l.words[k+1], r.words[k+1]))
         |                        for k in range(0, ${Multimodal.AHashBands})])
         |              AS BIGINT) AS hamming
         |  FROM b l JOIN b r ON l.band_idx = r.band_idx
         |                   AND l.band_val = r.band_val
         |                   AND l.doc_id < r.doc_id)
         |WHERE hamming <= ${Multimodal.AHashHammingMax}""".stripMargin

  // ---- x256 incremental inverted-index maintenance --------------------
  // The engine advances the v1 per-token index stats to v3 by
  // tokenizing ONLY the change feed's rows (signed postings deltas);
  // the oracle re-derives the v3 corpus from the fixture rules —
  // bucket-1 texts get ' reindexed' appended, offset-key copies are
  // inserted, mod-7 originals are deleted — and rebuilds the index
  // from scratch.

  private val x256 = {
    val nb = graft.sources.TxnLog.NumBuckets
    val off = graft.pipelines.Extensions.CdcInsertOffset
    raw"""WITH v3 AS (
         |  SELECT doc_id,
         |         CASE WHEN doc_id % $nb = 1 THEN text || ' reindexed'
         |              ELSE text END AS text
         |  FROM documents WHERE doc_id % 7 <> 0
         |  UNION ALL
         |  SELECT doc_id + $off, text || ' reindexed'
         |  FROM documents WHERE doc_id % $nb = 1),
         |tf AS (
         |  SELECT doc_id, unnest(
         |           list_filter(regexp_split_to_array(text, '\s+'),
         |                       t -> t <> '')) AS tok
         |  FROM v3),
         |p AS (SELECT doc_id, tok, count(*) AS tf FROM tf GROUP BY 1, 2)
         |SELECT tok, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(tf) AS BIGINT) AS sum_tf
         |FROM p GROUP BY tok""".stripMargin
  }

  // ---- x262 time travel -----------------------------------------------
  // A `VERSION AS OF v1` read after the v2 rewrite/inserts and the v3
  // tombstone delete: the original full load, untouched.

  private val x262 =
    raw"""SELECT doc_id, lang, n_chars FROM documents""".stripMargin

  // ---- x263 OPTIMIZE (fold all deletion vectors) ----------------------
  // The post-OPTIMIZE snapshot: the surviving set, now served without
  // anti joins (the requires + PlanSpec pin the manifest receipt).

  private val x263 =
    raw"""SELECT doc_id, lang, n_chars FROM documents
         |WHERE doc_id % 7 <> 0""".stripMargin

  // ---- x264 metadata-only column rename --------------------------------
  // Rename n_chars -> char_count without touching data, then a
  // physical-schema rewrite of bucket 1 on top: the logical projection
  // must carry every physical value through.

  private val x264 = {
    val nb = graft.sources.TxnLog.NumBuckets
    raw"""SELECT doc_id, lang,
         |       CAST(CASE WHEN doc_id % $nb = 1 THEN n_chars + 1000
         |                 ELSE n_chars END AS BIGINT) AS char_count
         |FROM documents""".stripMargin
  }

  // ---- x249 metadata-only aggregates ---------------------------------
  // The engine answers count(*)/min/max per column FROM THE MANIFEST
  // (row counts + zone maps observed in the commits' write jobs — no
  // scan task launched; PlanSpec pins the LocalRelation); the oracle
  // recomputes the same aggregates from the original table with the
  // bucket-1 rewrite CASE. Min/max travel in the manifest's string
  // rendering, hence the VARCHAR casts.

  private val x249 = {
    val nb = graft.sources.TxnLog.NumBuckets
    raw"""WITH mx AS (
         |  SELECT CAST(max(doc_id) + 1 AS DOUBLE) AS span FROM documents),
         |t AS (
         |  SELECT doc_id, lang,
         |         CAST(CASE WHEN floor(doc_id * $nb / span) = 1
         |                   THEN n_chars + 1000 ELSE n_chars
         |              END AS BIGINT) AS n_chars
         |  FROM documents CROSS JOIN mx)
         |SELECT 'doc_id' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
         |       CAST(min(doc_id) AS VARCHAR) AS min_v,
         |       CAST(max(doc_id) AS VARCHAR) AS max_v
         |FROM t
         |UNION ALL
         |SELECT 'lang', CAST(count(*) AS BIGINT), min(lang), max(lang) FROM t
         |UNION ALL
         |SELECT 'n_chars', CAST(count(*) AS BIGINT),
         |       CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
         |FROM t""".stripMargin
  }

  // ---- x250 Bloom point-lookup data skipping --------------------------
  // The engine hash-clusters the table (zone maps useless), builds
  // per-bucket Bloom sidecars at commit, and serves the point lookup
  // through bloom-pruned buckets (the require pins that some bucket
  // was skipped); the oracle is the plain IN filter — skipping must
  // lose no row, and a false positive costs a scan, never a wrong row.

  private val x250 = {
    val in = graft.pipelines.Extensions.BloomProbes.mkString(", ")
    raw"""SELECT doc_id, lang, n_chars FROM documents
         |WHERE doc_id IN ($in)""".stripMargin
  }

  // ---- x265 conjunctive multi-column data skipping ---------------------
  // The engine's layout splits by doc_id half AND lang hash parity,
  // commits lang Bloom sidecars, and serves the two-term conjunction
  // through buckets pruned by EITHER stat kind (zone maps for the
  // range, Bloom + zone for the point set) — the requires pin the
  // pruning receipt; the oracle is the plain two-term WHERE.

  private val x265 =
    raw"""WITH mx AS (
         |  SELECT CAST(max(doc_id) + 1 AS BIGINT) AS ispan FROM documents)
         |SELECT doc_id, lang, n_chars FROM documents CROSS JOIN mx
         |WHERE doc_id <= ispan // 2 - 1 AND lang = 'en'""".stripMargin

  // ---- x266 OPTIMIZE ZORDER ---------------------------------------------
  // The engine hash-clusters v1 (zone maps prune nothing — pinned),
  // rewrites once via optimizeZorder(n_chars, doc_id), and re-serves
  // the range probe through strictly more pruned buckets; the oracle
  // is the plain range predicate — the re-layout must move no row.

  private val x266 =
    raw"""WITH mx AS (
         |  SELECT CAST(max(doc_id) + 1 AS BIGINT) AS ispan FROM documents)
         |SELECT doc_id, lang, n_chars FROM documents CROSS JOIN mx
         |WHERE doc_id <= ispan // 4 - 1""".stripMargin

  // ---- x267 incremental IVF maintenance from the change feed ------------
  // The engine advances the v1 cell assignments to v3 by assigning
  // ONLY the feed's changed vectors against the FIXED quantizer (and
  // requires the result assignment-identical to a from-scratch
  // rebuild); the oracle re-derives the v3 corpus from the fixture
  // rules — bucket-1 vectors negated, offset-key copies inserted,
  // mod-7 originals deleted — and assigns it against the same mirrored
  // Lloyd chain trained on the ORIGINAL corpus.

  /** The x267/x271 v3 corpus CTE: the embedding CDC fixture's rules —
    * bucket-1 vectors negated, offset-key copies inserted, mod-7
    * originals deleted — re-normalized like `vn`. */
  private lazy val vn3Cte = {
    val nb = graft.sources.TxnLog.NumBuckets
    val off = graft.pipelines.Extensions.CdcInsertOffset
    raw"""vn3 AS (
         |  SELECT vec_id, v, sqrt(list_sum([x*x for x in v])) AS nrm FROM (
         |    SELECT vec_id,
         |           CASE WHEN vec_id % $nb = 1
         |                THEN [-x for x in v] ELSE v END AS v
         |    FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
         |    WHERE vec_id % 7 <> 0
         |    UNION ALL
         |    SELECT vec_id + $off, [-x for x in v]
         |    FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
         |    WHERE vec_id % $nb = 1))""".stripMargin
  }

  private lazy val x267 = {
    val iters = Similarity.KmeansIters
    raw"""WITH $kmeansCandCtes,
         |$vn3Cte
         |SELECT vec_id, cell FROM (
         |  SELECT vn3.vec_id, c.cid AS cell,
         |         row_number() OVER (PARTITION BY vn3.vec_id
         |           ORDER BY ${cosExpr("vn3.v", "vn3.nrm", "c.cv", "c.cn")}
         |             DESC, c.cid) AS rn
         |  FROM vn3 CROSS JOIN
         |    (SELECT cid, cv, sqrt(list_sum([x*x for x in cv])) AS cn
         |     FROM cent$iters) c)
         |WHERE rn = 1""".stripMargin
  }

  // ---- x271 recall audit of the maintained index ---------------------------
  // x267 pins the maintained index assignment-identical to the rebuild,
  // so pricing the rebuilt index IS pricing the maintained one: IVF
  // top-k over the v3 corpus (fixed quantizer) against the exact brute
  // top-k over the same corpus — the x190 recall row, post-advance.

  private lazy val x271 = {
    val iters = Similarity.KmeansIters
    val k = Similarity.TopK; val np = Similarity.NProbe
    val stride = Similarity.QueryStride
    raw"""WITH $kmeansCandCtes,
         |$vn3Cte,
         |cn3 AS (SELECT cid, cv, sqrt(list_sum([x*x for x in cv])) AS cn
         |        FROM cent$iters),
         |q3 AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM vn3
         |       WHERE vec_id % $stride = 0),
         |brute AS MATERIALIZED (
         |  SELECT q_id, vec_id FROM (
         |    SELECT q_id, vec_id,
         |           row_number() OVER (PARTITION BY q_id
         |             ORDER BY cos_sim DESC, vec_id) AS rnk
         |    FROM (
         |      SELECT q_id, vec_id,
         |             ${cosExpr("qv", "qn", "v", "nrm")} AS cos_sim
         |      FROM q3 CROSS JOIN vn3 WHERE q_id <> vec_id))
         |  WHERE rnk <= $k),
         |assign3 AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT vn3.vec_id, c.cid AS cell,
         |           row_number() OVER (PARTITION BY vn3.vec_id
         |             ORDER BY ${cosExpr("vn3.v", "vn3.nrm", "c.cv", "c.cn")}
         |               DESC, c.cid) AS rn
         |    FROM vn3 CROSS JOIN cn3 c)
         |  WHERE rn = 1),
         |cand3 AS (
         |  SELECT vn3.vec_id, vn3.v, vn3.nrm, a.cell
         |  FROM vn3 JOIN assign3 a USING (vec_id)),
         |probes AS (
         |  SELECT q_id, qv, qn, cell FROM (
         |    SELECT q3.q_id, q3.qv, q3.qn, c.cid AS cell,
         |           row_number() OVER (PARTITION BY q3.q_id
         |             ORDER BY ${cosExpr("q3.qv", "q3.qn", "c.cv", "c.cn")}
         |               DESC, c.cid) AS crnk
         |    FROM q3 CROSS JOIN cn3 c)
         |  WHERE crnk <= $np),
         |ivf AS MATERIALIZED (
         |  SELECT q_id, vec_id FROM (
         |    SELECT q_id, vec_id,
         |           row_number() OVER (PARTITION BY q_id
         |             ORDER BY cos_sim DESC, vec_id) AS rnk
         |    FROM (
         |      SELECT p.q_id, cand3.vec_id,
         |             ${cosExpr("p.qv", "p.qn", "cand3.v", "cand3.nrm")} AS cos_sim
         |      FROM probes p JOIN cand3 USING (cell)
         |      WHERE p.q_id <> cand3.vec_id))
         |  WHERE rnk <= $k),
         |common AS (
         |  SELECT b.q_id, CAST(count(*) AS BIGINT) AS n_common
         |  FROM brute b JOIN ivf i ON b.q_id = i.q_id AND b.vec_id = i.vec_id
         |  GROUP BY 1)
         |SELECT b.q_id, CAST(count(*) AS BIGINT) AS n_brute,
         |       coalesce(any_value(common.n_common), 0) AS n_common,
         |       ${round4(s"coalesce(any_value(common.n_common), 0)::DOUBLE / $k")} AS recall
         |FROM brute b LEFT JOIN common ON b.q_id = common.q_id
         |GROUP BY b.q_id""".stripMargin
  }

  // ---- x272 RESTORE TO VERSION --------------------------------------------
  // The engine restores the CDC fixture to v1 (a metadata-only commit
  // re-referencing v1's generations; requires pin zero files touched
  // and that the restored-over versions stay time-travelable) and
  // reads the NEW latest: the original table, exactly — x262 proved
  // the versioned read, this proves the versioned write-back.

  private val x272 =
    raw"""SELECT doc_id, lang, n_chars FROM documents""".stripMargin

  // ---- x273 keyed MERGE INTO ----------------------------------------------
  // The engine upserts one atomic batch through the txn log: matched
  // keys (1, 11) rewrite their buckets with updated chars, fresh keys
  // (offset copies of 2, 12) append as O(batch) files to buckets the
  // Bloom sidecars proved key-free (fixture receipts pin both write
  // modes). The oracle is the UPDATE CASE over the original table plus
  // the inserted copies.

  private val x273 = {
    val off = graft.pipelines.Extensions.UpsertInsertOffset
    raw"""SELECT doc_id, lang,
         |       CAST(CASE WHEN doc_id IN (1, 11) THEN n_chars + 5000
         |                 ELSE n_chars END AS BIGINT) AS n_chars
         |FROM documents
         |UNION ALL
         |SELECT doc_id + $off, lang, n_chars FROM documents
         |WHERE doc_id IN (2, 12)""".stripMargin
  }

  // ---- x274 multi-file generations + compaction ---------------------------
  // Two micro-batch appends land as one file per routed bucket with
  // every primary generation untouched (fixture receipt), then
  // compactFiles folds each bucket back to one generation with the
  // row count unchanged; the oracle (original ∪ both batches) checks
  // routing, multi-file snapshot resolution and compaction in one hash.

  private val x274 = {
    val offA = graft.pipelines.Extensions.AppendOffsetA
    val offB = graft.pipelines.Extensions.AppendOffsetB
    raw"""SELECT doc_id, lang, n_chars FROM documents
         |UNION ALL
         |SELECT doc_id + $offA, lang, CAST(n_chars + 7 AS BIGINT)
         |FROM documents WHERE doc_id % 5 = 0
         |UNION ALL
         |SELECT doc_id + $offB, lang, CAST(n_chars + 9 AS BIGINT)
         |FROM documents WHERE doc_id % 5 = 3""".stripMargin
  }

  // ---- x276 multi-column Bloom sidecars -----------------------------------
  // The engine commits one sidecar per indexed column (doc_id AND
  // lang), tombstone-deletes mod-7, OPTIMIZEs (the rewrite
  // auto-refreshes both sidecars — fixture receipt), and serves the
  // two-term IN conjunction through buckets pruned by the doc_id
  // sidecars (the query receipt also pins that the lang sidecars
  // prove a garbage lang absent on their own); the oracle is the
  // plain conjunction over the surviving rows.

  private val x276 = {
    val ids = graft.pipelines.Extensions.BloomProbes.mkString(", ")
    val langs = graft.pipelines.Extensions.Bloom2Langs
      .map(l => s"'$l'").mkString(", ")
    raw"""SELECT doc_id, lang, n_chars FROM documents
         |WHERE doc_id IN ($ids) AND lang IN ($langs)
         |  AND doc_id % 7 <> 0""".stripMargin
  }

  // ---- x278 streaming upsert sink -------------------------------------------
  // Three AvailableNow runs MERGE-UPSERT micro-batches through the
  // txn log: run 0 updates existing keys (+111), run 1 inserts offset
  // copies (append path), run 2 updates those inserted keys (+333,
  // merge over multi-file buckets); the oracle is the final state.

  private val x278 = {
    val off = graft.pipelines.Extensions.UpsertStreamOffset
    raw"""SELECT doc_id, lang,
         |       CAST(CASE WHEN doc_id % 9 = 4 THEN n_chars + 111
         |                 ELSE n_chars END AS BIGINT) AS n_chars
         |FROM documents
         |UNION ALL
         |SELECT doc_id + $off, lang, CAST(n_chars + 333 AS BIGINT)
         |FROM documents WHERE doc_id % 9 = 5""".stripMargin
  }

  // ---- x282 CHECK constraints -----------------------------------------------
  // The engine adds a CHECK constraint, refuses a violating upsert
  // with nothing committed, then commits a clean upsert under
  // enforcement. The oracle is the table with only the clean upsert.

  private val x282 =
    raw"""SELECT doc_id, lang,
         |       CAST(CASE WHEN doc_id IN (1, 2) THEN n_chars + 4242
         |                 ELSE n_chars END AS BIGINT) AS n_chars
         |FROM documents""".stripMargin

  // ---- x283 REPLACE WHERE ---------------------------------------------------
  // One atomic commit swaps every doc_id IN (3, 6) row for the
  // replacement batch; Bloom-pruned buckets are untouched (receipt).

  private val x283 =
    raw"""SELECT doc_id, lang,
         |       CAST(CASE WHEN doc_id = 3 THEN 111
         |                 WHEN doc_id = 6 THEN 222
         |                 ELSE n_chars END AS BIGINT) AS n_chars
         |FROM documents""".stripMargin

  // ---- x279 shallow clone + divergence --------------------------------------
  // The engine clones the v1 source table zero-copy, then the SOURCE
  // rewrites bucket 1 (+7777, which the clone must NOT see) and the
  // CLONE rewrites bucket 2 (+5, which the source must not see). The
  // oracle is the original table with only the clone's own edit.

  private val x279 = {
    val nb = graft.sources.TxnLog.NumBuckets
    raw"""SELECT doc_id, lang,
         |       CAST(n_chars + CASE WHEN doc_id % $nb = 2 THEN 5
         |                           ELSE 0 END AS BIGINT) AS n_chars
         |FROM documents""".stripMargin
  }

  // ---- x280 metadata-only type widening --------------------------------------
  // n_chars loads as INT, widens to BIGINT without touching a file,
  // then bucket 1 rewrites with values past Int.MaxValue — the
  // snapshot upcasts the narrow generations in one scan. The oracle
  // casts from the original table.

  private val x280 = {
    val nb = graft.sources.TxnLog.NumBuckets
    raw"""SELECT doc_id, lang,
         |       CAST(n_chars + CASE WHEN doc_id % $nb = 1 THEN 3000000000
         |                           ELSE 0 END AS BIGINT) AS n_chars
         |FROM documents""".stripMargin
  }

  // ---- x281 quantizer-drift audit -------------------------------------------
  // Per CDC epoch of the embedding fixture: cell-occupancy skew, the
  // fraction of surviving vectors whose nearest centroid changed vs
  // the training snapshot (assignf — the mirrored Lloyd chain's
  // original-corpus assignment), the mean member→assigned-centroid
  // cosine, and the drift flag. Epoch 1 is the training corpus itself
  // (moved_frac 0, no flag); epochs 2/3 negate bucket-1 vectors — the
  // deliberate drift the audit must flag.

  private lazy val x281 = {
    val iters = Similarity.KmeansIters
    val k = Similarity.KmeansK
    val nb = graft.sources.TxnLog.NumBuckets
    val off = graft.pipelines.Extensions.CdcInsertOffset
    val thr = graft.pipelines.Extensions.DriftMovedFrac
    def r4(e: String) = s"floor(($e) * 10000 + 0.5) / 10000"
    val vn2Cte =
      raw"""vn2 AS (
           |  SELECT vec_id, v, sqrt(list_sum([x*x for x in v])) AS nrm FROM (
           |    SELECT vec_id,
           |           CASE WHEN vec_id % $nb = 1
           |                THEN [-x for x in v] ELSE v END AS v
           |    FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
           |    UNION ALL
           |    SELECT vec_id + $off, [-x for x in v]
           |    FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
           |    WHERE vec_id % $nb = 1))""".stripMargin
    def asgCte(corpus: String, out: String) =
      raw"""$out AS (
           |  SELECT vec_id, cell, cs FROM (
           |    SELECT $corpus.vec_id, c.cid AS cell,
           |           ${cosExpr(s"$corpus.v", s"$corpus.nrm", "c.cv", "c.cn")} AS cs,
           |           row_number() OVER (PARTITION BY $corpus.vec_id
           |             ORDER BY ${cosExpr(s"$corpus.v", s"$corpus.nrm", "c.cv", "c.cn")}
           |               DESC, c.cid) AS rn
           |    FROM $corpus CROSS JOIN cn281 c)
           |  WHERE rn = 1)""".stripMargin
    def epochRow(epoch: Int, asg: String) =
      raw"""SELECT CAST($epoch AS BIGINT) AS epoch,
           |       (SELECT count(*) FROM $asg) AS n_vecs,
           |       ${r4(s"(SELECT max(cnt) FROM (SELECT cell, count(*) AS cnt " +
                s"FROM $asg GROUP BY 1)) * $k::DOUBLE / " +
                s"(SELECT count(*) FROM $asg)")} AS occ_skew,
           |       ${r4(s"(SELECT sum(CASE WHEN a.cell <> b.cell THEN 1 ELSE 0 " +
                s"END)::DOUBLE / count(*) FROM $asg a JOIN assignf b " +
                s"USING (vec_id))")} AS moved_frac,
           |       ${r4(s"(SELECT avg(cs) FROM $asg)")} AS mean_cos""".stripMargin
    raw"""WITH $kmeansCandCtes,
         |cn281 AS (SELECT cid, cv, sqrt(list_sum([x*x for x in cv])) AS cn
         |          FROM cent$iters),
         |$vn2Cte,
         |$vn3Cte,
         |${asgCte("vn", "asg1")},
         |${asgCte("vn2", "asg2")},
         |${asgCte("vn3", "asg3")}
         |SELECT epoch, n_vecs, occ_skew, moved_frac, mean_cos,
         |       CASE WHEN moved_frac > $thr THEN 1 ELSE 0 END AS drift_flag
         |FROM (
         |  ${epochRow(1, "asg1")}
         |  UNION ALL
         |  ${epochRow(2, "asg2")}
         |  UNION ALL
         |  ${epochRow(3, "asg3")})""".stripMargin
  }

  // ---- x277 n-column ZORDER layout audit -----------------------------------
  // The engine lays the corpus out twice (ZORDER over 2 and over 3
  // comparable-width dimensions) and pins that the probe on the third
  // dimension prunes nothing on the 2-col layout and strictly more on
  // the 3-col one; the oracle is the plain derived-column predicate —
  // neither re-layout may move a row.

  private val x277 =
    raw"""SELECT doc_id, lang, n_chars,
         |       CAST((doc_id * 2654435761) % 256 AS BIGINT) AS zc
         |FROM documents
         |WHERE (doc_id * 2654435761) % 256 <= 63""".stripMargin

  // ---- x268 metadata-only column drop + re-add ---------------------------
  // Drop n_chars without touching data, then re-add it via a bucket-1
  // rewrite: the re-added column has a fresh physical name, so the
  // dropped data in untouched buckets reads NULL while bucket 1 serves
  // the new values — the oracle's CASE is exactly that mask.

  private val x268 = {
    val nb = graft.sources.TxnLog.NumBuckets
    raw"""SELECT doc_id, lang,
         |       CAST(CASE WHEN doc_id % $nb = 1 THEN n_chars + 1000
         |                 ELSE NULL END AS BIGINT) AS n_chars
         |FROM documents""".stripMargin
  }

  // ---- x269 stats-driven snapshot join ------------------------------------
  // The engine joins the v3 CDC snapshot to the v1 snapshot whose read
  // carries the manifest-stats broadcast decision (plan shape pinned in
  // PlanSpec); the oracle derives both versions from the fixture rules.

  private val x269 = {
    val nb = graft.sources.TxnLog.NumBuckets
    raw"""SELECT doc_id, lang,
         |       CAST(CASE WHEN doc_id % $nb = 1 THEN n_chars + 1000
         |                 ELSE n_chars END AS BIGINT) AS chars_v3,
         |       n_chars AS chars_v1
         |FROM documents WHERE doc_id % 7 <> 0""".stripMargin
  }

  // ---- x270 mapping-aware predicate skipping ------------------------------
  // The engine renames n_chars -> char_count (metadata-only) and reads
  // under a conjunction addressing the LOGICAL names: the resolver
  // translates them to the physical zone maps, the quartile pruning
  // receipt is pinned by a require, and the result carries the logical
  // schema — the oracle expresses the rename as an alias.

  private val x270 =
    raw"""WITH mx AS (
         |  SELECT CAST(max(doc_id) + 1 AS BIGINT) AS ispan FROM documents)
         |SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS char_count
         |FROM documents CROSS JOIN mx
         |WHERE doc_id <= ispan // 2 - 1 AND n_chars >= 200""".stripMargin

  // ---- x253 TextRank keywords -----------------------------------------
  // The x59 unrolled integer power iteration on the word CO-OCCURRENCE
  // graph (adjacent-token pairs, symmetrized, weighted), weighted
  // contribution (rank // wdeg) * w, top-K by (rank desc, token).

  private val x253 = {
    import graft.ops.Graph.{PrIters, RankScale, Teleport}
    def step(i: Int): String =
      raw"""r$i AS (
           |  SELECT we.v AS tok,
           |         CAST($Teleport +
           |              ((sum((r${i - 1}.rank // we.wdeg) * we.w) * 17) // 20)
           |              AS BIGINT) AS rank
           |  FROM we JOIN r${i - 1} ON we.u = r${i - 1}.tok
           |  GROUP BY we.v)""".stripMargin
    raw"""WITH $toksCte,
         |adj AS (
         |  SELECT unnest([{'u': toks[i+1], 'v': toks[i+2]}
         |                 for i in range(0, len(toks) - 1)
         |                 if toks[i+1] <> toks[i+2]],
         |                recursive := true)
         |  FROM tok WHERE len(toks) >= 2),
         |edges AS (
         |  SELECT u, v, CAST(count(*) AS BIGINT) AS w
         |  FROM (SELECT u, v FROM adj UNION ALL SELECT v, u FROM adj)
         |  GROUP BY u, v),
         |wd AS (SELECT u, CAST(sum(w) AS BIGINT) AS wdeg FROM edges GROUP BY u),
         |we AS (SELECT e.u, e.v, e.w, d.wdeg FROM edges e JOIN wd d USING (u)),
         |r0 AS (SELECT u AS tok, CAST($RankScale AS BIGINT) AS rank FROM wd),
         |${(1 to PrIters).map(step).mkString(",\n")}
         |SELECT tok, rank FROM (
         |  SELECT tok, rank,
         |         row_number() OVER (ORDER BY rank DESC, tok) AS rn
         |  FROM r$PrIters)
         |WHERE rn <= ${graft.ops.TextAnalysis.TextRankK}""".stripMargin
  }

  // ---- x254 Misra–Gries heavy-hitters audit ---------------------------
  // The sketch never runs in SQL — its GUARANTEE is on trial: the
  // engine flags every exact heavy hitter (freq·Capacity > N) with
  // sketch membership, and the oracle emits literal TRUE for the flag;
  // any summary bug that evicts a true heavy hitter breaks the hash.

  private val x254 = {
    val m = graft.functions.MisraGries.Capacity
    raw"""WITH $toksCte,
         |t AS (SELECT unnest(toks) AS tok FROM tok),
         |c AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM t GROUP BY tok),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM t)
         |SELECT tok, cnt, TRUE AS in_sketch
         |FROM c CROSS JOIN n
         |WHERE cnt * $m > n_total""".stripMargin
  }

  // ---- x219 streaming commits into the transaction log -------------
  // The engine REALLY runs three AvailableNow micro-batch ingests whose
  // foreachBatch sink merge-commits into the TxnLog table with
  // idempotence markers; the oracle derives the final snapshot
  // arithmetically (every doc exactly once, slice = doc_id % 3) — any
  // lost batch, double-applied replay, routing or merge drift breaks
  // the row count or the hash.

  private val x219 =
    raw"""SELECT doc_id, lang, n_chars,
         |       CAST(doc_id % 3 AS BIGINT) AS ingest_slice
         |FROM documents""".stripMargin

  // ---- x221 merge-on-read deletion vectors -------------------------
  // The engine runs load -> tombstone delete -> bucket-0 compaction
  // and reads the v3 snapshot; the oracle is the surviving set.

  private val x221 =
    raw"""SELECT doc_id, lang, n_chars
         |FROM documents WHERE doc_id % 7 <> 0""".stripMargin

  // ---- x222 checkpoint + vacuum ------------------------------------
  // Post-vacuum latest snapshot: v2's bucket-1 rewrite (+1000 chars)
  // over v1's base, minus v3's % 5 deletion vectors; vacuum must not
  // have touched anything this snapshot references.

  private val x222 =
    raw"""SELECT doc_id, lang,
         |       CAST(n_chars + CASE WHEN doc_id % 4 = 1 THEN 1000 ELSE 0 END
         |            AS BIGINT) AS n_chars
         |FROM documents WHERE doc_id % 5 <> 0""".stripMargin

  // ---- x217 chunk-level retrieval eval -----------------------------
  // The x112 chunk grid as the BM25 unit (x198's scoring chain with
  // chunk length/count/df), probes querying with their top doc terms;
  // per probe: source-doc chunks in the top-k and the first rank.

  /** The x217 chain from the chunk grid through the champion-capped
    * per-(probe, chunk, term) contrib — shared with the x225 nDCG
    * eval, which grades on the same capped universe. */
  private lazy val chunkContribCtes: String = {
    import graft.ops.Search.{ScoreScale, K1, B, QTermCap, ChampionCap}
    val w = TextAnalysis.ChunkTokens; val st = TextAnalysis.ChunkStride
    val stride = Similarity.QueryStride
    raw"""t AS (SELECT doc_id, toks, len(toks) AS n FROM tok WHERE len(toks) >= 1),
         |c AS (SELECT doc_id, unnest(range(0, ((n - 1) // $st) + 1)) AS chunk_idx,
         |             toks
         |      FROM t),
         |sl AS (SELECT doc_id AS src_doc, chunk_idx,
         |              toks[chunk_idx * $st + 1 : chunk_idx * $st + $w] AS ctoks
         |       FROM c),
         |cdl AS (SELECT src_doc, chunk_idx, CAST(len(ctoks) AS BIGINT) AS cdl FROM sl),
         |nst AS (SELECT count(*) AS n_chunks, sum(cdl) AS total_ctoks FROM cdl),
         |ctf AS MATERIALIZED (
         |  SELECT src_doc, chunk_idx, tok2 AS tok, CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT src_doc, chunk_idx, unnest(ctoks) AS tok2 FROM sl)
         |  GROUP BY 1, 2, 3),
         |tfg AS (
         |  SELECT doc_id, tok2 AS tok, CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, unnest(toks) AS tok2 FROM tok) GROUP BY 1, 2),
         |qt AS (
         |  SELECT q_id, term FROM (
         |    SELECT doc_id AS q_id, tok AS term,
         |           row_number() OVER (PARTITION BY doc_id
         |             ORDER BY tf DESC, tok) AS trn
         |    FROM tfg WHERE doc_id % $stride = 0)
         |  WHERE trn <= $QTermCap),
         |dfc AS (
         |  SELECT tok, count(*) AS df FROM ctf
         |  WHERE tok IN (SELECT DISTINCT term FROM qt) GROUP BY 1),
         |champ AS MATERIALIZED (
         |  SELECT src_doc, chunk_idx, tok, tf FROM (
         |    SELECT src_doc, chunk_idx, tok, tf,
         |           row_number() OVER (PARTITION BY tok
         |             ORDER BY tf DESC, src_doc, chunk_idx) AS crn
         |    FROM ctf)
         |  WHERE crn <= $ChampionCap),
         |contrib AS (
         |  SELECT q.q_id, t2.src_doc, t2.chunk_idx, t2.tok,
         |         CAST(floor(ln(1.0 + (n.n_chunks - f.df + 0.5) / (f.df + 0.5))
         |                    * (t2.tf * ${K1 + 1}) / (t2.tf + $K1 * ((1.0 - $B)
         |                       + $B * (cdl.cdl::DOUBLE * n.n_chunks / n.total_ctoks)))
         |                    * $ScoreScale + 0.5) AS BIGINT) AS fp
         |  FROM qt q JOIN champ t2 ON t2.tok = q.term
         |       JOIN dfc f ON f.tok = t2.tok
         |       JOIN cdl ON cdl.src_doc = t2.src_doc AND cdl.chunk_idx = t2.chunk_idx
         |       CROSS JOIN nst n)""".stripMargin
  }

  private lazy val x217 = {
    import graft.ops.Search.TopK
    raw"""WITH $toksCte,
         |$chunkContribCtes,
         |chtop AS MATERIALIZED (
         |  SELECT q_id, src_doc, chunk_idx, rnk FROM (
         |    SELECT q_id, src_doc, chunk_idx,
         |           row_number() OVER (PARTITION BY q_id
         |             ORDER BY total DESC, src_doc, chunk_idx) AS rnk
         |    FROM (SELECT q_id, src_doc, chunk_idx, CAST(sum(fp) AS BIGINT) AS total
         |          FROM contrib GROUP BY 1, 2, 3))
         |  WHERE rnk <= $TopK),
         |hits AS (
         |  SELECT q_id, CAST(count(*) AS BIGINT) AS n_hits,
         |         CAST(min(rnk) AS BIGINT) AS first_rank
         |  FROM chtop WHERE src_doc = q_id GROUP BY 1)
         |SELECT p.q_id, CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
         |       h.first_rank,
         |       ${round4("coalesce(1.0 / h.first_rank, 0.0)")} AS mrr
         |FROM (SELECT DISTINCT q_id FROM qt) p
         |LEFT JOIN hits h USING (q_id)""".stripMargin
  }

  // ---- x225 nDCG@k graded-relevance eval on the chunk grid ---------
  // Shares the x217 contrib chain; rel = distinct matched query terms
  // per chunk, gain = (2^rel - 1)/log2(rank+1) on the NdcgScale grid,
  // normalized by the ideal (rel desc) ordering of the same set.

  private lazy val x225 = {
    import graft.ops.Search.{TopK, NdcgScale}
    raw"""WITH $toksCte,
         |$chunkContribCtes,
         |rel AS MATERIALIZED (
         |  SELECT q_id, src_doc, chunk_idx,
         |         CAST(count(DISTINCT tok) AS BIGINT) AS rel,
         |         CAST(sum(fp) AS BIGINT) AS total
         |  FROM contrib GROUP BY 1, 2, 3),
         |ranked AS (
         |  SELECT q_id, rel,
         |         row_number() OVER (PARTITION BY q_id
         |           ORDER BY total DESC, src_doc, chunk_idx) AS rnk,
         |         row_number() OVER (PARTITION BY q_id
         |           ORDER BY rel DESC, src_doc, chunk_idx) AS irn
         |  FROM rel),
         |dcg AS (
         |  SELECT q_id,
         |         CAST(sum(CAST(floor((pow(2, rel) - 1) / log2(rnk + 1)
         |                             * $NdcgScale + 0.5) AS BIGINT)) AS BIGINT)
         |           AS dcg_i
         |  FROM ranked WHERE rnk <= $TopK GROUP BY 1),
         |idcg AS (
         |  SELECT q_id,
         |         CAST(sum(CAST(floor((pow(2, rel) - 1) / log2(irn + 1)
         |                             * $NdcgScale + 0.5) AS BIGINT)) AS BIGINT)
         |           AS idcg_i
         |  FROM ranked WHERE irn <= $TopK GROUP BY 1)
         |SELECT p.q_id,
         |       ${round4(s"coalesce(d.dcg_i, 0)::DOUBLE / $NdcgScale")} AS dcg,
         |       ${round4(s"coalesce(i.idcg_i, 0)::DOUBLE / $NdcgScale")} AS idcg,
         |       CASE WHEN coalesce(i.idcg_i, 0) > 0
         |            THEN ${round4("d.dcg_i::DOUBLE / i.idcg_i")}
         |            ELSE 0.0 END AS ndcg
         |FROM (SELECT DISTINCT q_id FROM qt) p
         |LEFT JOIN dcg d USING (q_id)
         |LEFT JOIN idcg i USING (q_id)""".stripMargin
  }

  // ---- x212 corpus curation manifest -------------------------------
  // First-failing-stage cascade over the embedded x29/x4/x30+x86/
  // x101/x37 oracles — the composition IS the contract, so every
  // stage re-derives from its audited oracle text.

  private lazy val x212 =
    raw"""WITH sp AS (
         |  SELECT doc_id,
         |         CASE WHEN b < ${TextAnalysis.TrainPct} THEN 'train'
         |              WHEN b < ${TextAnalysis.ValPct} THEN 'val'
         |              ELSE 'test' END AS split
         |  FROM (SELECT doc_id,
         |               ('0x' || substr(md5('split:' || doc_id::VARCHAR), 1, 4))::BIGINT % 100 AS b
         |        FROM documents)),
         |fps AS (
         |  SELECT doc_id, $fpFull AS fp FROM documents),
         |ex AS (
         |  SELECT doc_id,
         |         CASE WHEN doc_id <> min(doc_id) OVER (PARTITION BY fp)
         |              THEN 1 ELSE 0 END AS exact_loser
         |  FROM fps),
         |cl AS MATERIALIZED ($x30),
         |clc AS (
         |  SELECT c.doc_id, c.cluster_id, d.n_chars
         |  FROM cl c JOIN documents d USING (doc_id)),
         |reps AS (
         |  SELECT cluster_id, doc_id AS rep_doc FROM (
         |    SELECT cluster_id, doc_id,
         |           row_number() OVER (PARTITION BY cluster_id
         |             ORDER BY n_chars DESC, doc_id) AS rn
         |    FROM clc)
         |  WHERE rn = 1),
         |nl AS (
         |  SELECT c.doc_id,
         |         CASE WHEN c.doc_id <> r.rep_doc THEN 1 ELSE 0 END AS near_loser
         |  FROM clc c JOIN reps r USING (cluster_id)),
         |gq AS MATERIALIZED ($x101),
         |cm AS MATERIALIZED ($x37),
         |cf AS (SELECT DISTINCT train_doc AS doc_id, 1 AS contam FROM cm)
         |SELECT d.doc_id, d.source, sp.split,
         |       CASE WHEN sp.split <> 'train' THEN 'heldout'
         |            WHEN ex.exact_loser = 1 THEN 'exact_dup'
         |            WHEN coalesce(nl.near_loser, 0) = 1 THEN 'near_dup'
         |            WHEN gq.keep = 0 THEN 'low_quality'
         |            WHEN coalesce(cf.contam, 0) = 1 THEN 'contaminated'
         |            ELSE 'keep' END AS verdict
         |FROM documents d
         |JOIN sp USING (doc_id)
         |JOIN ex USING (doc_id)
         |LEFT JOIN nl USING (doc_id)
         |JOIN gq USING (doc_id)
         |LEFT JOIN cf USING (doc_id)""".stripMargin

  // ---- x118 UniMax budget allocation -------------------------------
  // Same two-window closed form over the size-sorted source frame;
  // all integer arithmetic (caps in tenths, floor-div fair share).

  private val x118 = {
    val capT = QualityFilters.UnimaxCapTenths
    raw"""WITH $toksCte,
         |src AS (
         |  SELECT d.source, CAST(sum(len(t.toks)) AS BIGINT) AS n_tokens
         |  FROM tok t JOIN documents d USING (doc_id)
         |  GROUP BY 1),
         |capd AS (
         |  SELECT source, n_tokens, n_tokens * $capT // 10 AS cap_tokens,
         |         (SELECT sum(n_tokens) FROM src) AS budget
         |  FROM src),
         |ranked AS (
         |  SELECT *,
         |         row_number() OVER ord AS idx,
         |         count(*) OVER () AS m,
         |         coalesce(sum(cap_tokens) OVER ord - cap_tokens, 0) AS cum_before
         |  FROM capd
         |  WINDOW ord AS (ORDER BY cap_tokens, source
         |                 ROWS UNBOUNDED PRECEDING)),
         |conds AS (
         |  SELECT *,
         |         CASE WHEN cap_tokens * (m - idx + 1) + cum_before <= budget
         |              THEN 1 ELSE 0 END AS cond
         |  FROM ranked),
         |flags AS (
         |  SELECT *,
         |         CASE WHEN min(cond) OVER (ORDER BY cap_tokens, source
         |                                   ROWS UNBOUNDED PRECEDING) = 1
         |              THEN 1 ELSE 0 END AS capped
         |  FROM conds),
         |agg AS (
         |  SELECT *,
         |         sum(capped) OVER () AS k,
         |         coalesce(sum(CASE WHEN capped = 1 THEN cap_tokens END)
         |                    OVER (), 0) AS capped_sum
         |  FROM flags)
         |SELECT source, n_tokens, CAST(cap_tokens AS BIGINT) AS cap_tokens,
         |       CAST(capped AS BIGINT) AS capped,
         |       CAST(CASE WHEN capped = 1 THEN cap_tokens
         |                 ELSE (budget - capped_sum) // (m - k) END AS BIGINT)
         |         AS alloc_tokens,
         |       floor(CAST(CASE WHEN capped = 1 THEN cap_tokens
         |                       ELSE (budget - capped_sum) // (m - k) END AS DOUBLE)
         |             / n_tokens * 10000 + 0.5) / 10000 AS epochs
         |FROM agg""".stripMargin
  }

  // ---- x119 small-file compaction plan -----------------------------

  private val x119 = {
    import graft.ops.Olap
    raw"""WITH inv AS (
         |  SELECT l_returnflag, l_linestatus,
         |         l_orderkey % ${Olap.CompactFilesPerPart} AS file_id,
         |         CAST(count(*) AS BIGINT) AS n_rows,
         |         CAST(sum((l_orderkey % 97 + 16) * 8) AS BIGINT) AS size_bytes
         |  FROM lineitem
         |  GROUP BY 1, 2, 3)
         |SELECT l_returnflag, l_linestatus, CAST(file_id AS BIGINT) AS file_id,
         |       n_rows, size_bytes,
         |       CAST(coalesce(sum(size_bytes) OVER w - size_bytes, 0)
         |            // ${Olap.CompactTargetBytes} AS BIGINT) AS bin
         |FROM inv
         |WINDOW w AS (PARTITION BY l_returnflag, l_linestatus
         |             ORDER BY size_bytes, file_id
         |             ROWS UNBOUNDED PRECEDING)""".stripMargin
  }

  // ---- x120 schema-evolution read ----------------------------------
  // The oracle reconstructs the merged view from the single source
  // table: gen-1 rows (even doc_id) lack n_chars (null), gen-2 rows
  // carry it — what mergeSchema + partition discovery must produce.

  private val x120 =
    raw"""SELECT doc_id, lang, CAST(NULL AS BIGINT) AS n_chars,
         |       CAST(1 AS BIGINT) AS gen
         |FROM documents WHERE doc_id % 2 = 0
         |UNION ALL
         |SELECT doc_id, lang, n_chars, CAST(2 AS BIGINT) AS gen
         |FROM documents WHERE doc_id % 2 = 1""".stripMargin

  // ---- x104 streaming dedup-on-ingest ------------------------------
  // Oracle = the batch form of the stream-static anti join (x32's
  // subtraction without the within-batch grouping — the streaming
  // query is row-wise, so its AvailableNow output IS the batch set).

  private val x104 =
    raw"""WITH fp AS (SELECT doc_id, $fpFull AS fp FROM documents)
         |SELECT doc_id, fp FROM fp
         |WHERE doc_id % 3 = 0
         |  AND fp NOT IN (SELECT fp FROM fp WHERE doc_id % 3 <> 0)""".stripMargin

  // ---- x121 session concurrency ------------------------------------

  private val x121 =
    raw"""WITH $sessionCtes,
         |hrs AS (
         |  SELECT user_id,
         |         unnest(generate_series(start_ms - start_ms % 3600000,
         |                                end_ms - end_ms % 3600000,
         |                                3600000)) AS hour_ms
         |  FROM sagg)
         |SELECT hour_ms, CAST(count(*) AS BIGINT) AS n_sessions,
         |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
         |FROM hrs GROUP BY 1""".stripMargin

  // ---- x122 k-anonymity audit --------------------------------------

  private val x122 =
    raw"""SELECT nationkey, mktsegment, bal_band,
         |       CAST(count(*) AS BIGINT) AS n_rows,
         |       count(*) >= ${graft.ops.DataProfile.KAnonThreshold} AS k_anonymous
         |FROM (
         |  SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
         |         c_mktsegment AS mktsegment,
         |         CAST(floor(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
         |                    / 100000.0) AS BIGINT) AS bal_band
         |  FROM customer)
         |GROUP BY 1, 2, 3""".stripMargin

  // ---- x123 per-language quality percentile ------------------------

  private val x123 = {
    val stop = strList(TextAnalysis.Stopwords)
    raw"""WITH $toksCte,
         |q AS (
         |  SELECT doc_id, lang,
         |         $qualityScoreSql
         |  FROM (
         |    SELECT doc_id, lang, text,
         |           len(toks) AS n_tokens,
         |           len(regexp_extract_all(text, '${TextAnalysis.PunctPattern}')) AS n_punct,
         |           len(list_filter(toks, t -> list_contains($stop, t))) AS n_stopwords
         |    FROM tok)),
         |p AS (
         |  SELECT doc_id, lang, quality_score,
         |         floor(percent_rank() OVER (PARTITION BY lang
         |                 ORDER BY quality_score, doc_id) * 10000 + 0.5) / 10000 AS pctl
         |  FROM q)
         |SELECT doc_id, lang, quality_score, pctl,
         |       least(9, CAST(floor(pctl * 10) AS BIGINT)) AS decile
         |FROM p""".stripMargin
  }

  // ---- x124 per-type Tukey value bands -----------------------------

  private val x124 =
    raw"""WITH c AS (SELECT event_type, $centsExpr AS cents FROM events),
         |f AS (
         |  SELECT event_type,
         |         floor((q1 - (q3 - q1) * 1.5) * 10000 + 0.5) / 10000 AS lo,
         |         floor((q3 + (q3 - q1) * 1.5) * 10000 + 0.5) / 10000 AS hi
         |  FROM (SELECT event_type,
         |               quantile_cont(cents, 0.25) AS q1,
         |               quantile_cont(cents, 0.75) AS q3
         |        FROM c GROUP BY 1))
         |SELECT event_type, lo, hi,
         |       CAST(count(*) AS BIGINT) AS n_events,
         |       CAST(sum(CASE WHEN cents < lo OR cents > hi THEN 1 ELSE 0 END)
         |            AS BIGINT) AS n_outliers
         |FROM c JOIN f USING (event_type)
         |GROUP BY 1, 2, 3""".stripMargin

  // ---- x125 hourly gap fill ----------------------------------------

  private val x125 =
    raw"""WITH counts AS (
         |  SELECT event_type, epoch_ms(date_trunc('hour', ts)) AS hour_ms,
         |         CAST(count(*) AS BIGINT) AS n
         |  FROM events GROUP BY 1, 2),
         |grid AS (
         |  SELECT event_type,
         |         unnest(generate_series(lo, hi, 3600000)) AS hour_ms
         |  FROM (SELECT event_type, min(hour_ms) AS lo, max(hour_ms) AS hi
         |        FROM counts GROUP BY 1))
         |SELECT g.event_type, g.hour_ms,
         |       CAST(coalesce(c.n, 0) AS BIGINT) AS n_events
         |FROM grid g LEFT JOIN counts c
         |  ON g.event_type = c.event_type AND g.hour_ms = c.hour_ms""".stripMargin

  // ---- x126 grouping-sets marginals --------------------------------

  private val x126 =
    raw"""SELECT event_type, hour,
         |       CAST(GROUPING(event_type, hour) AS BIGINT) AS gid,
         |       CAST(count(*) AS BIGINT) AS n_events,
         |       CAST(sum(value_cents) AS BIGINT) AS value_cents
         |FROM (
         |  SELECT event_type,
         |         CAST(date_trunc('hour', ts) AS VARCHAR) AS hour,
         |         $centsExpr AS value_cents
         |  FROM events)
         |GROUP BY GROUPING SETS ((event_type), (hour))""".stripMargin

  // ---- x127 per-source dataset card --------------------------------

  private val x127 = {
    val stop = strList(TextAnalysis.Stopwords)
    // local tok CTE: the shared one drops `source`, the card's key
    raw"""WITH tok AS (
         |  SELECT doc_id, source, lang, text,
         |         list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS toks
         |  FROM documents),
         |stats AS (
         |  SELECT doc_id, source, lang, $fpFull AS fp,
         |         CAST(len(toks) AS BIGINT) AS n_toks,
         |         CAST(length(text) AS BIGINT) AS n_chars,
         |         CAST(floor(quality_score * 10000 + 0.5) AS BIGINT) AS q4
         |  FROM (
         |    SELECT doc_id, source, lang, text, toks,
         |           $qualityScoreSql
         |    FROM (
         |      SELECT doc_id, source, lang, text, toks,
         |             len(toks) AS n_tokens,
         |             len(regexp_extract_all(text, '${TextAnalysis.PunctPattern}')) AS n_punct,
         |             len(list_filter(toks, t -> list_contains($stop, t))) AS n_stopwords
         |      FROM tok))),
         |fpc AS (SELECT fp, count(*) AS n_copies FROM stats GROUP BY 1)
         |SELECT source,
         |       CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(n_toks) AS BIGINT) AS n_tokens,
         |       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         |       floor(sum(q4) / CAST(count(*) AS DOUBLE) / 10000.0 * 10000 + 0.5)
         |         / 10000 AS mean_quality,
         |       CAST(sum(n_chars) AS BIGINT) AS n_chars,
         |       CAST(sum(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_dup_docs,
         |       floor(sum(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END)
         |             / CAST(count(*) AS DOUBLE) * 10000 + 0.5) / 10000 AS dup_rate
         |FROM stats JOIN fpc USING (fp)
         |GROUP BY 1""".stripMargin
  }

  // ---- x128 minhash estimator calibration --------------------------

  private val x128 = {
    val k = Dedup.NumHashes
    raw"""WITH $x5Ctes,
         |cand AS (
         |  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
         |  FROM bands l JOIN bands r
         |    ON l.band_idx = r.band_idx AND l.band_hash = r.band_hash
         |   AND l.doc_id < r.doc_id),
         |pr AS (
         |  SELECT CAST(len(list_filter(range(1, ${k + 1}),
         |                              i -> l.sig[i] = r.sig[i])) AS BIGINT) AS n_match,
         |         CAST(floor(($jaccardExpr) * 10000 + 0.5) AS BIGINT) AS j4
         |  FROM cand c
         |  JOIN sig l ON c.doc_a = l.doc_id
         |  JOIN sig r ON c.doc_b = r.doc_id)
         |SELECT n_match,
         |       floor(n_match / $k.0 * 10000 + 0.5) / 10000 AS est_jaccard,
         |       CAST(count(*) AS BIGINT) AS n_pairs,
         |       floor(sum(j4) / CAST(count(*) AS DOUBLE) / 10000.0 * 10000 + 0.5)
         |         / 10000 AS mean_jaccard,
         |       floor(sum(abs(e4 - j4)) / CAST(count(*) AS DOUBLE) / 10000.0 * 10000
         |             + 0.5) / 10000 AS mae
         |FROM (SELECT *, CAST(floor(n_match * 10000.0 / $k + 0.5) AS BIGINT) AS e4
         |      FROM pr)
         |GROUP BY 1""".stripMargin
  }

  // ---- x129 chi-square association (lang × source) -----------------

  private val x129 =
    raw"""WITH cells AS (
         |  SELECT lang, source, CAST(count(*) AS BIGINT) AS n
         |  FROM documents GROUP BY 1, 2),
         |r AS (SELECT lang, CAST(count(*) AS BIGINT) AS row_n FROM documents GROUP BY 1),
         |c AS (SELECT source, CAST(count(*) AS BIGINT) AS col_n FROM documents GROUP BY 1),
         |t AS (SELECT CAST(count(*) AS BIGINT) AS total FROM documents)
         |SELECT lang, source, n,
         |       ${round4("e")} AS expected,
         |       ${round4("(n - e) * (n - e) / e")} AS contrib
         |FROM (
         |  SELECT cells.lang, cells.source, cells.n,
         |         (row_n * col_n)::DOUBLE / total AS e
         |  FROM cells JOIN r USING (lang) JOIN c USING (source), t)""".stripMargin

  // ---- x130 URL canonicalization + collapse ------------------------

  private val x130 = {
    val w = graft.ops.Web
    raw"""WITH aug AS (
         |  SELECT doc_id, text ||
         |    CASE doc_id % 4
         |    WHEN 0 THEN ' see https://www' || (doc_id % 5)
         |                || '.corpus-hub.com/archive/d' || doc_id || '?ref=idx'
         |    WHEN 1 THEN ' img http://cdn' || (doc_id % 3)
         |                || '.static-assets.org/f' || doc_id || '.png'
         |    WHEN 2 THEN ' via https://m' || (doc_id % 2) || '.spam-mirror.net/x'
         |    ELSE '' END AS a
         |  FROM documents),
         |u AS (SELECT regexp_extract(a, '${w.UrlPattern}', 0) AS url FROM aug),
         |cl AS (
         |  SELECT url,
         |         regexp_replace(
         |           regexp_replace(
         |             regexp_replace(url, '#.*$$', ''),
         |             '${w.TrackingParamPattern}', '', 'g'),
         |           '[?&]+$$', '') AS clean
         |  FROM u),
         |nm AS (
         |  SELECT CASE WHEN url = '' THEN '(none)' ELSE
         |    lower(regexp_extract(clean, '${w.SchemePattern}', 1)) || '://' ||
         |    lower(regexp_extract(clean, '${w.HostPattern}', 1)) ||
         |    regexp_replace(clean, '^https?://[^/\s?#]+', '')
         |  END AS url_norm FROM cl)
         |SELECT url_norm, CAST(count(*) AS BIGINT) AS n_docs
         |FROM nm GROUP BY 1""".stripMargin
  }

  // ---- x131 snapshot diff ------------------------------------------

  private val x131 =
    raw"""SELECT status, CAST(count(*) AS BIGINT) AS n_docs FROM (
         |  SELECT CASE WHEN doc_id % 5 = 4 THEN 'added'
         |              WHEN doc_id % 5 = 0 THEN 'removed'
         |              WHEN doc_id % 5 = 2 THEN 'changed'
         |              ELSE 'unchanged' END AS status
         |  FROM documents)
         |GROUP BY 1""".stripMargin

  // ---- x132 held-out bigram LM score -------------------------------

  private val x132 = {
    val scale = Similarity.CentroidScale
    raw"""WITH $toksCte,
         |bitr AS (
         |  SELECT doc_id, u.w1, u.w2 FROM (
         |    SELECT doc_id,
         |           [{'w1': toks[i+1], 'w2': toks[i+2]} for i in range(0, len(toks) - 1)] AS bs
         |    FROM tok WHERE doc_id % 2 = 0 AND len(toks) >= 2),
         |  unnest(bs) AS t(u)),
         |bite AS (
         |  SELECT doc_id, u.w1, u.w2 FROM (
         |    SELECT doc_id,
         |           [{'w1': toks[i+1], 'w2': toks[i+2]} for i in range(0, len(toks) - 1)] AS bs
         |    FROM tok WHERE doc_id % 2 = 1 AND len(toks) >= 2),
         |  unnest(bs) AS t(u)),
         |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bitr GROUP BY 1, 2),
         |c1 AS (SELECT w1, count(*) AS c1 FROM bitr GROUP BY 1),
         |voc AS (SELECT count(DISTINCT t) AS v
         |        FROM (SELECT unnest(toks) AS t FROM tok WHERE doc_id % 2 = 0)),
         |lp AS (
         |  SELECT bite.doc_id,
         |         CAST(floor(ln((coalesce(c12.c12, 0) + 1)::DOUBLE
         |                       / (coalesce(c1.c1, 0) + voc.v)::DOUBLE) * $scale)
         |              AS BIGINT) AS lp
         |  FROM bite LEFT JOIN c12 USING (w1, w2) LEFT JOIN c1 USING (w1), voc)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |       ${round4(s"-(sum(lp)::DOUBLE / (count(*) * $scale)::DOUBLE)")} AS nll
         |FROM lp GROUP BY 1""".stripMargin
  }

  // ---- x133 per-language deterministic reservoir -------------------

  private val x133 =
    raw"""SELECT doc_id, lang, rnk FROM (
         |  SELECT doc_id, lang,
         |         CAST(row_number() OVER (PARTITION BY lang
         |                ORDER BY md5('res:' || CAST(doc_id AS VARCHAR)), doc_id)
         |              AS BIGINT) AS rnk
         |  FROM documents)
         |WHERE rnk <= ${TextAnalysis.ReservoirK}""".stripMargin

  // ---- x134 bloom-pruned join (result ≡ the plain join) ------------

  private val x134 =
    raw"""SELECT o_orderpriority,
         |       CAST(count(*) AS BIGINT) AS n_orders,
         |       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         |         AS total_cents
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = '${graft.ops.Olap.BloomJoinSegment}'
         |GROUP BY 1""".stripMargin

  // ---- x135 ε-DP Laplace counts ------------------------------------

  private val x135 = {
    val eps = graft.ops.DataProfile.DpEpsilon
    raw"""SELECT lang, n, ${round4("noise")} AS noise, ${round4("n + noise")} AS noisy
         |FROM (
         |  SELECT lang, n,
         |         -(1.0 / $eps) * sign(u - 0.5) * ln(1.0 - 2.0 * abs(u - 0.5)) AS noise
         |  FROM (
         |    SELECT lang, CAST(count(*) AS BIGINT) AS n,
         |           (('0x' || substr(md5('dp:' || lang), 1, 13))::BIGINT + 0.5)
         |             / 4503599627370496.0 AS u
         |    FROM documents GROUP BY 1))""".stripMargin
  }

  // ---- x136 cross-source overlap matrix ----------------------------

  private val x136 = {
    val k = Dedup.SpanTokens
    raw"""WITH tok AS (
         |  SELECT source,
         |         list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS toks
         |  FROM documents),
         |fps AS (
         |  SELECT DISTINCT source,
         |         md5(array_to_string(toks[t.i : t.i + $k - 1], ' ')) AS fp
         |  FROM tok, unnest(range(1, len(toks) - $k + 2)) AS t(i))
         |SELECT a.source AS source_a, b.source AS source_b,
         |       CAST(count(*) AS BIGINT) AS n_shared
         |FROM fps a JOIN fps b ON a.fp = b.fp AND a.source < b.source
         |GROUP BY 1, 2""".stripMargin
  }

  // ---- x137 quality pass rate with Wilson interval -----------------

  private val x137 = {
    val stop = strList(TextAnalysis.Stopwords)
    val z = TextAnalysis.WilsonZ
    val z2 = TextAnalysis.WilsonZ * TextAnalysis.WilsonZ
    raw"""WITH $toksCte,
         |q AS (
         |  SELECT lang,
         |         CASE WHEN quality_score >= ${TextAnalysis.QualityPassBar}
         |              THEN 1 ELSE 0 END AS pass
         |  FROM (
         |    SELECT lang, $qualityScoreSql
         |    FROM (
         |      SELECT lang, text,
         |             len(toks) AS n_tokens,
         |             len(regexp_extract_all(text, '${TextAnalysis.PunctPattern}')) AS n_punct,
         |             len(list_filter(toks, t -> list_contains($stop, t))) AS n_stopwords
         |      FROM tok))),
         |a AS (
         |  SELECT lang, CAST(count(*) AS BIGINT) AS n, CAST(sum(pass) AS BIGINT) AS k
         |  FROM q GROUP BY 1)
         |SELECT lang, n, k,
         |       ${round4("p")} AS rate,
         |       ${round4(s"(p + $z2 / (nd * 2) - $z * sqrt(p * (1.0 - p) / nd + $z2 / (nd * nd * 4))) / (1.0 + $z2 / nd)")} AS lo,
         |       ${round4(s"(p + $z2 / (nd * 2) + $z * sqrt(p * (1.0 - p) / nd + $z2 / (nd * nd * 4))) / (1.0 + $z2 / nd)")} AS hi
         |FROM (SELECT lang, n, k,
         |             k / CAST(n AS DOUBLE) AS p, CAST(n AS DOUBLE) AS nd
         |      FROM a)""".stripMargin
  }

  // ---- x138 PSI drift between the train/test splits ----------------

  private val x138 = {
    val stop = strList(TextAnalysis.Stopwords)
    val b = TextAnalysis.PsiBins
    raw"""WITH $toksCte,
         |qd AS (
         |  SELECT doc_id,
         |         least(${b - 1}, CAST(floor(quality_score * $b) AS BIGINT)) AS bin
         |  FROM (
         |    SELECT doc_id, $qualityScoreSql
         |    FROM (
         |      SELECT doc_id, text,
         |             len(toks) AS n_tokens,
         |             len(regexp_extract_all(text, '${TextAnalysis.PunctPattern}')) AS n_punct,
         |             len(list_filter(toks, t -> list_contains($stop, t))) AS n_stopwords
         |      FROM tok))),
         |sp AS (
         |  SELECT doc_id,
         |         CASE WHEN bucket < ${TextAnalysis.TrainPct} THEN 'train'
         |              WHEN bucket < ${TextAnalysis.ValPct} THEN 'val'
         |              ELSE 'test' END AS split
         |  FROM (SELECT doc_id,
         |               ('0x' || substr(md5('split:' || doc_id::VARCHAR), 1, 4))::BIGINT
         |                 % 100 AS bucket
         |        FROM documents)),
         |cnt AS (
         |  SELECT split, bin, CAST(count(*) AS BIGINT) AS c
         |  FROM sp JOIN qd USING (doc_id) WHERE split <> 'val' GROUP BY 1, 2),
         |tot AS (SELECT split, CAST(sum(c) AS BIGINT) AS tot FROM cnt GROUP BY 1),
         |grid AS (SELECT unnest(range(0, $b)) AS bin),
         |tr AS (
         |  SELECT g.bin, coalesce(c.c, 0) AS n_train, t.tot AS tot_train
         |  FROM grid g
         |  LEFT JOIN (SELECT bin, c FROM cnt WHERE split = 'train') c USING (bin),
         |       (SELECT tot FROM tot WHERE split = 'train') t),
         |te AS (
         |  SELECT g.bin, coalesce(c.c, 0) AS n_test, t.tot AS tot_test
         |  FROM grid g
         |  LEFT JOIN (SELECT bin, c FROM cnt WHERE split = 'test') c USING (bin),
         |       (SELECT tot FROM tot WHERE split = 'test') t)
         |SELECT bin, n_train, n_test,
         |       ${round4("p")} AS p_train,
         |       ${round4("q")} AS p_test,
         |       ${round4("(p - q) * ln(p / q)")} AS psi_term
         |FROM (SELECT tr.bin, n_train, n_test,
         |             (n_train + 0.5) / (tot_train + ${b * 0.5}) AS p,
         |             (n_test + 0.5) / (tot_test + ${b * 0.5}) AS q
         |      FROM tr JOIN te USING (bin))""".stripMargin
  }

  // ---- x139 EWMA-smoothed daily event volume -----------------------

  /** The (event_type × day) daily-count CTE shared by x139 and x152
    * (one definition, mirroring [[Events.dailyCounts]]). */
  private val dailyCte =
    raw"""daily AS (
         |  SELECT event_type, epoch_ms(ts) // 86400000 AS day,
         |         CAST(count(*) AS BIGINT) AS n
         |  FROM events GROUP BY 1, 2)""".stripMargin

  private val x139 = {
    val w = Events.EwmaDecay
    raw"""WITH $dailyCte,
         |idx AS (SELECT event_type, day, n,
         |               day - min(day) OVER (PARTITION BY event_type) AS i
         |        FROM daily),
         |c AS (
         |  SELECT event_type, day, n,
         |         sum(n * pow($w, -i)) OVER win AS num,
         |         sum(pow($w, -i)) OVER win AS den
         |  FROM idx
         |  WINDOW win AS (PARTITION BY event_type ORDER BY i
         |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         |SELECT event_type, day, n AS n_events,
         |       ${round4("num / den")} AS ewma,
         |       ${round4("n / (num / den)")} AS ratio
         |FROM c""".stripMargin
  }

  // ---- x257 Mann–Kendall trend + Sen's slope ------------------------
  // Exact-integer S and ties-corrected variance numerator (the /18
  // folds into the z denominator); Sen's slope is the interpolated
  // median of the day-pair slopes. Constant series report z = 0.

  private val x257 =
    raw"""WITH $dailyCte,
         |p AS (
         |  SELECT l.event_type, l.day AS di, r.day AS dj, l.n AS ni, r.n AS nj
         |  FROM daily l JOIN daily r
         |    ON l.event_type = r.event_type AND l.day < r.day),
         |s AS (SELECT event_type, CAST(sum(sign(nj - ni)) AS BIGINT) AS s_stat
         |      FROM p GROUP BY 1),
         |med AS (SELECT event_type,
         |               median((nj - ni) / CAST(dj - di AS DOUBLE)) AS sen_raw
         |        FROM p GROUP BY 1),
         |tie AS (SELECT event_type,
         |               CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie18
         |        FROM (SELECT event_type, n, count(*) AS t
         |              FROM daily GROUP BY 1, 2)
         |        GROUP BY 1),
         |nd AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
         |       FROM daily GROUP BY 1),
         |zc AS (
         |  SELECT nd.event_type, n_days, s_stat,
         |         n_days * (n_days - 1) * (2 * n_days + 5) - tie18 AS var18,
         |         sen_raw
         |  FROM nd JOIN s USING (event_type) JOIN tie USING (event_type)
         |       JOIN med USING (event_type)),
         |z AS (
         |  SELECT event_type, n_days, s_stat, var18, sen_raw,
         |         CASE WHEN var18 = 0 THEN 0.0
         |              WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(var18 / 18.0)
         |              WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(var18 / 18.0)
         |              ELSE 0.0 END AS zraw
         |  FROM zc)
         |SELECT event_type, n_days, s_stat, var18,
         |       ${round4("zraw")} AS z,
         |       ${round4("sen_raw")} AS sen_slope,
         |       CASE WHEN ${round4("zraw")} > ${Events.MkZCrit} THEN 'increasing'
         |            WHEN ${round4("zraw")} < -${Events.MkZCrit} THEN 'decreasing'
         |            ELSE 'none' END AS trend
         |FROM z""".stripMargin

  // ---- x258 streaming heavy hitters (top talkers) --------------------
  // The MG sketch folds in the STREAM; the oracle emits the exact
  // per-day heavy hitters with literal TRUE membership (x254's audit
  // convention on the streaming face).

  private val x258 = {
    val m = graft.functions.MisraGries.Capacity
    raw"""WITH $toksCte,
         |t AS (SELECT lang, unnest(toks) AS tok FROM tok),
         |e AS (SELECT lang, tok, CAST(count(*) AS BIGINT) AS cnt
         |      FROM t GROUP BY 1, 2),
         |n AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_lang
         |      FROM t GROUP BY 1)
         |SELECT e.lang, e.tok, cnt, TRUE AS in_sketch
         |FROM e JOIN n USING (lang)
         |WHERE cnt * $m > n_lang""".stripMargin
  }

  // ---- x140 Zipf slope per language --------------------------------

  private val x140 = {
    val r = TextAnalysis.ZipfTopR
    raw"""WITH $toksCte,
         |tf AS (
         |  SELECT lang, tok, CAST(count(*) AS BIGINT) AS f
         |  FROM (SELECT lang, unnest(toks) AS tok FROM tok) GROUP BY 1, 2),
         |rk AS (
         |  SELECT lang, f,
         |         row_number() OVER (PARTITION BY lang ORDER BY f DESC, tok ASC) AS r
         |  FROM tf),
         |fx AS (
         |  SELECT lang,
         |         CAST(floor(ln(CAST(r AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS lx,
         |         CAST(floor(ln(CAST(f AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS ly
         |  FROM rk WHERE r <= $r),
         |m AS (
         |  SELECT lang, CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(lx) AS BIGINT) AS sx, CAST(sum(ly) AS BIGINT) AS sy,
         |         CAST(sum(lx * lx) AS BIGINT) AS sxx,
         |         CAST(sum(lx * ly) AS BIGINT) AS sxy
         |  FROM fx GROUP BY 1)
         |SELECT lang, n, ${round4("slope")} AS slope,
         |       ${round4("(CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) / 1000000.0")} AS ln_f1
         |FROM (
         |  SELECT lang, n, sx, sy,
         |         (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
         |            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         |         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
         |            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope
         |  FROM m)""".stripMargin
  }

  // ---- x141 median/MAD robust length outliers ----------------------

  private val x141 = {
    val k = graft.ops.DataProfile.MadK * graft.ops.DataProfile.MadConsistency
    raw"""WITH med AS (
         |  SELECT lang, quantile_cont(n_chars, 0.5) AS med
         |  FROM documents GROUP BY 1),
         |dev AS (
         |  SELECT d.lang, abs(d.n_chars - m.med) AS adev
         |  FROM documents d JOIN med m USING (lang)),
         |mad AS (SELECT lang, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY 1),
         |st AS (SELECT m.lang, m.med, a.mad FROM med m JOIN mad a USING (lang))
         |SELECT dev.lang, ${round4("st.med")} AS med, ${round4("st.mad")} AS mad,
         |       ${round4(s"$k * st.mad")} AS fence,
         |       CAST(count(*) AS BIGINT) AS n,
         |       CAST(sum(CASE WHEN dev.adev > ${round4(s"$k * st.mad")}
         |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
         |FROM dev JOIN st USING (lang)
         |GROUP BY 1, 2, 3, 4""".stripMargin
  }

  // ---- x142 Flesch readability -------------------------------------

  private val x142 = {
    val t = TextAnalysis
    raw"""SELECT doc_id, lang, n_words, n_sentences, n_syllables, flesch,
         |       CASE WHEN n_words = 0 THEN '(empty)'
         |            WHEN flesch >= ${t.FleschEasyBar} THEN 'easy'
         |            WHEN flesch >= ${t.FleschMediumBar} THEN 'medium'
         |            ELSE 'hard' END AS band
         |FROM (
         |  SELECT doc_id, lang, n_words, n_sentences, n_syllables,
         |         CASE WHEN n_words = 0 THEN NULL
         |              ELSE ${round4("206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences) - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words)")}
         |         END AS flesch
         |  FROM (
         |    SELECT doc_id, lang,
         |           CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
         |                                t -> t <> '')) AS BIGINT) AS n_words,
         |           greatest(1, CAST(len(regexp_extract_all(text, '${t.SentencePattern}')) AS BIGINT)) AS n_sentences,
         |           CAST(len(regexp_extract_all(lower(text), '${t.SyllablePattern}')) AS BIGINT) AS n_syllables
         |    FROM documents))""".stripMargin
  }

  // ---- x143 token-mass Lorenz deciles ------------------------------

  private val x143 =
    raw"""WITH $toksCte,
         |t AS (SELECT lang, doc_id, CAST(len(toks) AS BIGINT) AS n_toks FROM tok),
         |r AS (
         |  SELECT lang, n_toks,
         |         row_number() OVER (PARTITION BY lang
         |                            ORDER BY n_toks DESC, doc_id ASC) AS rn,
         |         count(*) OVER (PARTITION BY lang) AS cnt
         |  FROM t),
         |g AS (
         |  SELECT lang, CAST((10 * rn + cnt - 1) // cnt AS BIGINT) AS decile,
         |         CAST(count(*) AS BIGINT) AS n_docs,
         |         CAST(sum(n_toks) AS BIGINT) AS toks
         |  FROM r GROUP BY 1, 2)
         |SELECT lang, decile, n_docs, toks,
         |       ${round4("CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE)")} AS cum_share
         |FROM (
         |  SELECT lang, decile, n_docs, toks,
         |         sum(toks) OVER (PARTITION BY lang ORDER BY decile
         |                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |         sum(toks) OVER (PARTITION BY lang) AS tot
         |  FROM g)""".stripMargin

  // ---- x144 rolling 7-day distinct users ---------------------------

  private val x144 = {
    val w = Events.RollingDays
    raw"""WITH act AS (
         |  SELECT DISTINCT event_type, user_id, epoch_ms(ts) // 86400000 AS day
         |  FROM events),
         |mx AS (SELECT max(day) AS max_day FROM act),
         |e AS (
         |  SELECT event_type, user_id, day + g.i AS obs_day
         |  FROM act, unnest(range(0, $w)) AS g(i))
         |SELECT event_type, obs_day,
         |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_7d
         |FROM e, mx WHERE obs_day <= max_day
         |GROUP BY 1, 2""".stripMargin
  }

  // ---- x145 cross-split URL leakage --------------------------------

  private val x145 = {
    val w = graft.ops.Web
    val t = TextAnalysis
    raw"""WITH aug AS (
         |  SELECT doc_id, text ||
         |    CASE doc_id % 4
         |    WHEN 0 THEN ' see https://www' || (doc_id % 5)
         |                || '.corpus-hub.com/archive/d' || doc_id || '?ref=idx'
         |    WHEN 1 THEN ' img http://cdn' || (doc_id % 3)
         |                || '.static-assets.org/f' || doc_id || '.png'
         |    WHEN 2 THEN ' via https://m' || (doc_id % 2) || '.spam-mirror.net/x'
         |    ELSE '' END AS a
         |  FROM documents),
         |u AS (SELECT doc_id, regexp_extract(a, '${w.UrlPattern}', 0) AS url
         |      FROM aug),
         |cl AS (
         |  SELECT doc_id,
         |         regexp_replace(
         |           regexp_replace(
         |             regexp_replace(url, '#.*$$', ''),
         |             '${w.TrackingParamPattern}', '', 'g'),
         |           '[?&]+$$', '') AS clean
         |  FROM u WHERE url <> ''),
         |nm AS (
         |  SELECT doc_id,
         |         lower(regexp_extract(clean, '${w.SchemePattern}', 1)) || '://' ||
         |         lower(regexp_extract(clean, '${w.HostPattern}', 1)) ||
         |         regexp_replace(clean, '^https?://[^/\s?#]+', '') AS url_norm
         |  FROM cl),
         |sp AS (
         |  SELECT doc_id,
         |         CASE WHEN b < ${t.TrainPct} THEN 'train'
         |              WHEN b < ${t.ValPct} THEN 'val'
         |              ELSE 'test' END AS split
         |  FROM (SELECT doc_id,
         |               ('0x' || substr(md5('split:' || doc_id::VARCHAR), 1, 4))::BIGINT
         |                 % 100 AS b
         |        FROM documents))
         |SELECT url_norm,
         |       CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
         |       CAST(sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS n_val,
         |       CAST(sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS n_test
         |FROM nm JOIN sp USING (doc_id)
         |GROUP BY 1
         |HAVING (CASE WHEN n_train > 0 THEN 1 ELSE 0 END
         |        + CASE WHEN n_val > 0 THEN 1 ELSE 0 END
         |        + CASE WHEN n_test > 0 THEN 1 ELSE 0 END) >= 2""".stripMargin
  }

  // ---- x146 normalized-exact dedup ---------------------------------

  private val x146 =
    raw"""SELECT md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z\s]', ' ', 'g'),
         |                               '\s+', ' ', 'g'))) AS nfp,
         |       CAST(min(doc_id) AS BIGINT) AS keep_doc_id,
         |       CAST(count(*) AS BIGINT) AS n_copies,
         |       CAST(count(DISTINCT $fpFull) AS BIGINT) AS n_raw_variants
         |FROM documents GROUP BY 1""".stripMargin

  // ---- x147 week-over-week active-user overlap ---------------------

  private val x147 =
    raw"""WITH wk AS (
         |  SELECT DISTINCT user_id, epoch_ms(ts) // 604800000 AS week FROM events),
         |tot AS (SELECT week, CAST(count(*) AS BIGINT) AS n FROM wk GROUP BY 1),
         |bth AS (
         |  SELECT a.week + 1 AS week, CAST(count(*) AS BIGINT) AS n_both
         |  FROM wk a JOIN wk b ON b.user_id = a.user_id AND b.week = a.week + 1
         |  GROUP BY 1)
         |SELECT c.week, p.n AS n_prev, c.n AS n_curr,
         |       coalesce(b.n_both, 0) AS n_both,
         |       ${round4("CAST(coalesce(b.n_both, 0) AS DOUBLE) / CAST(p.n + c.n - coalesce(b.n_both, 0) AS DOUBLE)")} AS jaccard,
         |       p.n - coalesce(b.n_both, 0) AS n_churned,
         |       c.n - coalesce(b.n_both, 0) AS n_new
         |FROM tot c JOIN tot p ON p.week = c.week - 1
         |LEFT JOIN bth b ON b.week = c.week""".stripMargin

  // ---- x148 Benford first-digit audit ------------------------------

  private val x148 =
    raw"""WITH g AS (
         |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
         |                          AS VARCHAR), 1, 1) AS BIGINT) AS digit,
         |         CAST(count(*) AS BIGINT) AS n
         |  FROM orders GROUP BY 1),
         |t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM g)
         |SELECT digit, n,
         |       ${round4("CAST(n AS DOUBLE) / CAST(tot AS DOUBLE)")} AS share,
         |       ${round4("log10(1.0 + 1.0 / CAST(digit AS DOUBLE))")} AS expected,
         |       ${round4("abs(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE) - log10(1.0 + 1.0 / CAST(digit AS DOUBLE)))")} AS abs_dev
         |FROM g, t""".stripMargin

  // ---- x149 OOV rate against the top-K vocabulary ------------------

  private val x149 = {
    val k = TextAnalysis.OovVocabK
    raw"""WITH $toksCte,
         |vf AS (
         |  SELECT tok, CAST(count(*) AS BIGINT) AS cnt
         |  FROM (SELECT unnest(toks) AS tok FROM tok) GROUP BY 1),
         |voc AS (SELECT tok FROM vf ORDER BY cnt DESC, tok ASC LIMIT $k),
         |ex AS (SELECT doc_id, unnest(toks) AS tok FROM tok),
         |pd AS (
         |  SELECT e.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |         CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |           AS n_oov
         |  FROM ex e LEFT JOIN voc v ON v.tok = e.tok GROUP BY 1)
         |SELECT d.doc_id, d.lang,
         |       coalesce(pd.n_tokens, 0) AS n_tokens,
         |       coalesce(pd.n_oov, 0) AS n_oov,
         |       CASE WHEN coalesce(pd.n_tokens, 0) = 0 THEN NULL
         |            ELSE ${round4("coalesce(pd.n_oov, 0) / CAST(coalesce(pd.n_tokens, 0) AS DOUBLE)")}
         |       END AS oov_rate
         |FROM documents d LEFT JOIN pd USING (doc_id)""".stripMargin
  }

  // ---- x150 Heaps'-law fit per language ----------------------------

  private val x150 =
    raw"""WITH $toksCte,
         |pts AS (
         |  SELECT lang,
         |         CAST(floor(ln(CAST(len(toks) AS DOUBLE)) * 1000000 + 0.5)
         |              AS BIGINT) AS lx,
         |         CAST(floor(ln(CAST(len(list_distinct(toks)) AS DOUBLE)) * 1000000 + 0.5)
         |              AS BIGINT) AS ly
         |  FROM tok WHERE len(toks) > 0),
         |m AS (
         |  SELECT lang, CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(lx) AS BIGINT) AS sx, CAST(sum(ly) AS BIGINT) AS sy,
         |         CAST(sum(lx * lx) AS BIGINT) AS sxx,
         |         CAST(sum(lx * ly) AS BIGINT) AS sxy
         |  FROM pts GROUP BY 1)
         |SELECT lang, n, ${round4("beta")} AS beta,
         |       ${round4("(CAST(sy AS DOUBLE) - beta * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) / 1000000.0")} AS ln_k
         |FROM (
         |  SELECT lang, n, sx, sy,
         |         (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
         |            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         |         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
         |            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS beta
         |  FROM m)""".stripMargin

  // ---- x151 event-type co-occurrence lift --------------------------

  private val x151 =
    raw"""WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
         |tt AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM ut GROUP BY 1),
         |nu AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM ut),
         |pr AS (
         |  SELECT a.event_type AS type_a, b.event_type AS type_b,
         |         CAST(count(*) AS BIGINT) AS n_ab
         |  FROM ut a JOIN ut b
         |    ON a.user_id = b.user_id AND a.event_type < b.event_type
         |  GROUP BY 1, 2)
         |SELECT type_a, type_b, ta.n AS n_a, tb.n AS n_b, n_ab,
         |       ${round4("CAST(n_ab * n_users AS DOUBLE) / CAST(ta.n * tb.n AS DOUBLE)")} AS lift
         |FROM pr
         |JOIN tt ta ON ta.event_type = type_a
         |JOIN tt tb ON tb.event_type = type_b, nu""".stripMargin

  // ---- x152 CUSUM change-point -------------------------------------

  private val x152 =
    raw"""WITH $dailyCte,
         |st AS (
         |  SELECT event_type, CAST(count(*) AS BIGINT) AS d,
         |         CAST(sum(n) AS BIGINT) AS t
         |  FROM daily GROUP BY 1),
         |cs AS (
         |  SELECT event_type, day, n, d,
         |         sum(n * d - t) OVER (PARTITION BY event_type ORDER BY day
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
         |  FROM daily JOIN st USING (event_type)),
         |m1 AS (SELECT *, max(abs(s)) OVER (PARTITION BY event_type) AS smax FROM cs),
         |m2 AS (
         |  SELECT *, min(CASE WHEN abs(s) = smax THEN day END)
         |              OVER (PARTITION BY event_type) AS cpday
         |  FROM m1)
         |SELECT event_type, day, n,
         |       ${round4("CAST(s AS DOUBLE) / CAST(d AS DOUBLE)")} AS cusum,
         |       CAST(CASE WHEN abs(s) = smax AND day = cpday THEN 1 ELSE 0 END
         |            AS BIGINT) AS is_cp
         |FROM m2""".stripMargin

  // ---- x153 two-sample KS between sources --------------------------

  private val x153 =
    raw"""WITH c AS (
         |  SELECT source, n_chars AS x, CAST(count(*) AS BIGINT) AS cnt
         |  FROM documents GROUP BY 1, 2),
         |xs AS (SELECT DISTINCT x FROM c),
         |ss AS (SELECT DISTINCT source FROM c),
         |grid AS (
         |  SELECT s.source, xs.x, coalesce(c.cnt, 0) AS cnt
         |  FROM xs CROSS JOIN ss s
         |  LEFT JOIN c ON c.source = s.source AND c.x = xs.x),
         |g2 AS (
         |  SELECT source, x,
         |         sum(cnt) OVER (PARTITION BY source ORDER BY x
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM grid),
         |tt AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS tot FROM c GROUP BY 1),
         |p AS (
         |  SELECT a.source AS source_a, b.source AS source_b,
         |         ta.tot AS tot_a, tb.tot AS tot_b,
         |         abs(a.cum * tb.tot - b.cum * ta.tot) AS num
         |  FROM g2 a JOIN g2 b ON a.x = b.x AND a.source < b.source
         |  JOIN tt ta ON ta.source = a.source
         |  JOIN tt tb ON tb.source = b.source)
         |SELECT source_a, source_b, tot_a, tot_b,
         |       ${round4("CAST(max(num) AS DOUBLE) / CAST(tot_a * tot_b AS DOUBLE)")} AS ks
         |FROM p GROUP BY 1, 2, 3, 4""".stripMargin

  // ---- x154 native session windows ---------------------------------

  /** Same gap sessions as x16/x24 (exactly-gap merges — pinned by
    * NativeSessionSpec); end = last event + gap (the window's
    * exclusive edge), emitted only once the final watermark passes it. */
  private val x154 =
    raw"""WITH $sessionCtes, $wmCte
         |SELECT user_id, start_ms, end_ms + ${Events.SessionGapMs} AS end_ms,
         |       n_events, value_cents
         |FROM sagg, wm
         |WHERE end_ms + ${Events.SessionGapMs} <= wm""".stripMargin

  // ---- x155 A/B two-proportion z-test ------------------------------

  private val x155 =
    raw"""WITH u AS (SELECT DISTINCT user_id FROM events),
         |cv AS (SELECT DISTINCT user_id FROM events
         |       WHERE event_type = '${Events.AbConvType}'
         |         AND $centsExpr >= ${Events.AbConvCents}),
         |arms AS (
         |  SELECT u.user_id % 2 AS variant,
         |         CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(CASE WHEN cv.user_id IS NULL THEN 0 ELSE 1 END)
         |              AS BIGINT) AS k
         |  FROM u LEFT JOIN cv USING (user_id) GROUP BY 1),
         |w AS (
         |  SELECT a.n AS n_a, a.k AS k_a, b.n AS n_b, b.k AS k_b
         |  FROM (SELECT n, k FROM arms WHERE variant = 0) a,
         |       (SELECT n, k FROM arms WHERE variant = 1) b)
         |SELECT n_a, k_a, n_b, k_b,
         |       ${round4("pa")} AS rate_a, ${round4("pb")} AS rate_b,
         |       CASE WHEN pp <= 0.0 OR pp >= 1.0 THEN NULL
         |            ELSE ${round4("(pa - pb) / sqrt(pp * (1.0 - pp) * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))")}
         |       END AS z
         |FROM (
         |  SELECT n_a, k_a, n_b, k_b,
         |         CAST(k_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS pa,
         |         CAST(k_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS pb,
         |         CAST(k_a + k_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE) AS pp
         |  FROM w)""".stripMargin

  // ---- x156 day-of-week × hour seasonality -------------------------

  private val x156 =
    raw"""WITH g AS (
         |  SELECT (epoch_ms(ts) // 86400000 + 4) % 7 AS dow,
         |         (epoch_ms(ts) % 86400000) // 3600000 AS hour,
         |         CAST(count(*) AS BIGINT) AS n_events
         |  FROM events GROUP BY 1, 2),
         |t AS (SELECT CAST(sum(n_events) AS BIGINT) AS tot FROM g)
         |SELECT dow, hour, n_events,
         |       ${round4("CAST(n_events AS DOUBLE) / CAST(tot AS DOUBLE)")} AS share
         |FROM g, t""".stripMargin

  // ---- x157 view→purchase conversion latency -----------------------

  private val x157 =
    raw"""WITH c AS (
         |  SELECT event_type, ms,
         |         last_value(CASE WHEN event_type = 'view' THEN ms END IGNORE NULLS)
         |           OVER (PARTITION BY user_id ORDER BY ms, event_id
         |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |           AS last_view_ms
         |  FROM (SELECT event_id, user_id, event_type, epoch_ms(ts) AS ms
         |        FROM events)),
         |d AS (
         |  SELECT ms - last_view_ms AS delta FROM c
         |  WHERE event_type = '${Events.AbConvType}' AND last_view_ms IS NOT NULL)
         |SELECT CAST(count(*) AS BIGINT) AS n,
         |       ${round4("quantile_cont(delta, 0.5)")} AS p50,
         |       ${round4("quantile_cont(delta, 0.9)")} AS p90,
         |       ${round4("quantile_cont(delta, 0.99)")} AS p99
         |FROM d""".stripMargin

  // ---- x158 partitioned write + pruned read ------------------------

  /** The oracle is the original table under the same predicate — the
    * engine result only matches if the partitioned write AND the
    * pruned read both round-trip faithfully. */
  private val x158 =
    raw"""SELECT doc_id, lang, n_chars FROM documents
         |WHERE lang = 'en' AND n_chars > 100""".stripMargin

  // ---- x159 variant JSON shredding ---------------------------------

  private val x159 =
    raw"""WITH a AS (
         |  SELECT event_id,
         |    '{"k": ' || json_extract_string(props, '$$.k')
         |    || ', "meta": {"ua": "ua' || (event_id % 3)
         |    || '", "tags": ["t' || (event_id % 5) || '", "t' || (event_id % 7)
         |    || '"]}'
         |    || CASE WHEN event_id % 4 <> 0
         |            THEN ', "price": ' || CAST($centsExpr AS VARCHAR)
         |            ELSE '' END
         |    || '}' AS j
         |  FROM events)
         |SELECT event_id,
         |       CAST(json_extract_string(j, '$$.k') AS BIGINT) AS k,
         |       json_extract_string(j, '$$.meta.ua') AS ua,
         |       json_extract_string(j, '$$.meta.tags[1]') AS tag1,
         |       CAST(json_extract_string(j, '$$.price') AS BIGINT) AS price
         |FROM a""".stripMargin

  // ---- x160 banded range join --------------------------------------

  private val x160 = {
    val o = graft.ops.Olap
    val vals = o.RangeBreaks.init.zip(o.RangeBreaks.tail).zipWithIndex
      .map { case ((lo, hi), b) => s"($lo, $hi, $b)" }.mkString(", ")
    raw"""WITH dim(lo, hi, band) AS (VALUES $vals),
         |e AS (SELECT $centsExpr AS cents FROM events)
         |SELECT CAST(coalesce(band, -1) AS BIGINT) AS band,
         |       CAST(count(*) AS BIGINT) AS n_events,
         |       CAST(sum(cents) AS BIGINT) AS value_cents
         |FROM e LEFT JOIN dim ON cents >= lo AND cents < hi
         |GROUP BY 1""".stripMargin
  }

  // ---- x161 top session paths --------------------------------------

  private val x161 = {
    val k = Events.PathTopK
    raw"""WITH $sessionCtes,
         |p AS (
         |  SELECT user_id, session_seq,
         |         array_to_string(list(event_type ORDER BY ms, event_id), '>')
         |           AS path
         |  FROM sessions GROUP BY 1, 2),
         |g AS (SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
         |      FROM p GROUP BY 1)
         |SELECT path, n_sessions,
         |       CAST(row_number() OVER (ORDER BY n_sessions DESC, path)
         |            AS BIGINT) AS rnk
         |FROM g ORDER BY n_sessions DESC, path LIMIT $k""".stripMargin
  }

  // ---- x162 PMI collocations ---------------------------------------

  private val x162 = {
    val (mc, k) = (TextAnalysis.PmiMinCount, TextAnalysis.PmiTopK)
    raw"""WITH $toksCte,
         |bi AS (
         |  SELECT u.w1, u.w2 FROM (
         |    SELECT [{'w1': toks[i+1], 'w2': toks[i+2]}
         |            for i in range(0, len(toks) - 1)] AS bs
         |    FROM tok WHERE len(toks) >= 2),
         |  unnest(bs) AS t(u)),
         |cab AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_ab
         |        FROM bi GROUP BY 1, 2),
         |uni AS (SELECT tok, CAST(count(*) AS BIGINT) AS c
         |        FROM (SELECT unnest(toks) AS tok FROM tok) GROUP BY 1),
         |tt AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM uni),
         |bt AS (SELECT CAST(count(*) AS BIGINT) AS b FROM bi)
         |SELECT w1, w2, c_ab,
         |       ${round4("ln(CAST(c_ab AS DOUBLE)) + 2.0 * ln(CAST(t AS DOUBLE)) - ln(CAST(b AS DOUBLE)) - ln(CAST(ua.c AS DOUBLE)) - ln(CAST(ub.c AS DOUBLE))")} AS pmi
         |FROM cab
         |JOIN uni ua ON ua.tok = w1
         |JOIN uni ub ON ub.tok = w2, tt, bt
         |WHERE c_ab >= $mc
         |ORDER BY pmi DESC, w1, w2 LIMIT $k""".stripMargin
  }

  // ---- x163 classifier calibration curve ---------------------------

  private val x163 = {
    val stop = strList(TextAnalysis.Stopwords)
    raw"""WITH g AS (
         |$x101
         |),
         |f AS (SELECT doc_id, $clfZE5 / 100000.0 AS logit FROM g),
         |s AS (SELECT doc_id, ${round4("1.0 / (1.0 + exp(-logit))")} AS cs FROM f),
         |q AS (
         |  WITH $toksCte
         |  SELECT doc_id,
         |         CASE WHEN quality_score >= ${TextAnalysis.QualityPassBar}
         |              THEN 1 ELSE 0 END AS pass
         |  FROM (
         |    SELECT doc_id, $qualityScoreSql
         |    FROM (
         |      SELECT doc_id, text,
         |             len(toks) AS n_tokens,
         |             len(regexp_extract_all(text, '${TextAnalysis.PunctPattern}')) AS n_punct,
         |             len(list_filter(toks, t -> list_contains($stop, t))) AS n_stopwords
         |      FROM tok))),
         |j AS (
         |  SELECT least(9, CAST(floor(cs * 10) AS BIGINT)) AS bin,
         |         CAST(floor(cs * 10000 + 0.5) AS BIGINT) AS s4, pass
         |  FROM s JOIN q USING (doc_id)),
         |a AS (
         |  SELECT bin, CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(pass) AS BIGINT) AS k,
         |         CAST(sum(s4) AS BIGINT) AS ss
         |  FROM j GROUP BY 1)
         |SELECT bin, n, k,
         |       ${round4("CAST(ss AS DOUBLE) / CAST(n * 10000 AS DOUBLE)")} AS mean_pred,
         |       ${round4("CAST(k AS DOUBLE) / CAST(n AS DOUBLE)")} AS act_rate
         |FROM a""".stripMargin
  }

  // ---- x255 split-conformal prediction sets --------------------------
  // The x163 score/pass frames feed a calibration-split order
  // statistic (exact 1e-4 integers — k-th smallest nonconformity, no
  // percentile interpolation) and the per-test-doc prediction sets.

  private val x255 = {
    val stop = strList(TextAnalysis.Stopwords)
    raw"""WITH g AS (
         |$x101
         |),
         |f AS (SELECT doc_id, $clfZE5 / 100000.0 AS logit FROM g),
         |s AS (SELECT doc_id, ${round4("1.0 / (1.0 + exp(-logit))")} AS cs FROM f),
         |q AS (
         |  WITH $toksCte
         |  SELECT doc_id,
         |         CASE WHEN quality_score >= ${TextAnalysis.QualityPassBar}
         |              THEN 1 ELSE 0 END AS pass
         |  FROM (
         |    SELECT doc_id, $qualityScoreSql
         |    FROM (
         |      SELECT doc_id, text,
         |             len(toks) AS n_tokens,
         |             len(regexp_extract_all(text, '${TextAnalysis.PunctPattern}')) AS n_punct,
         |             len(list_filter(toks, t -> list_contains($stop, t))) AS n_stopwords
         |      FROM tok))),
         |j AS (
         |  SELECT doc_id, CAST(floor(cs * 10000 + 0.5) AS BIGINT) AS s4, pass,
         |         CAST(CASE WHEN pass = 1
         |                   THEN 10000 - floor(cs * 10000 + 0.5)
         |                   ELSE floor(cs * 10000 + 0.5) END AS BIGINT) AS n4
         |  FROM s JOIN q USING (doc_id)),
         |cal AS (SELECT n4, doc_id FROM j WHERE doc_id % 3 = 1),
         |kq AS (SELECT ((count(*) + 1) * 9 + 9) // 10 AS k FROM cal),
         |qh AS (
         |  SELECT n4 AS qhat FROM (
         |    SELECT n4, row_number() OVER (ORDER BY n4, doc_id) AS rn
         |    FROM cal) r, kq
         |  WHERE r.rn = kq.k)
         |SELECT doc_id, s4, qhat,
         |       CAST((CASE WHEN 10000 - s4 <= qhat THEN 1 ELSE 0 END)
         |          + (CASE WHEN s4 <= qhat THEN 1 ELSE 0 END) AS BIGINT)
         |         AS set_size,
         |       CASE WHEN pass = 1 THEN 10000 - s4 <= qhat
         |            ELSE s4 <= qhat END AS covered
         |FROM j CROSS JOIN qh
         |WHERE doc_id % 3 = 2""".stripMargin
  }

  // ---- x260 Mondrian (per-language) conformal -------------------------
  // The x255 chain with one per-lang order-statistic threshold.

  private val x260 = {
    val stop = strList(TextAnalysis.Stopwords)
    raw"""WITH g AS (
         |$x101
         |),
         |f AS (SELECT doc_id, $clfZE5 / 100000.0 AS logit FROM g),
         |s AS (SELECT doc_id, ${round4("1.0 / (1.0 + exp(-logit))")} AS cs FROM f),
         |q AS (
         |  WITH $toksCte
         |  SELECT doc_id, lang,
         |         CASE WHEN quality_score >= ${TextAnalysis.QualityPassBar}
         |              THEN 1 ELSE 0 END AS pass
         |  FROM (
         |    SELECT doc_id, lang, $qualityScoreSql
         |    FROM (
         |      SELECT doc_id, lang, text,
         |             len(toks) AS n_tokens,
         |             len(regexp_extract_all(text, '${TextAnalysis.PunctPattern}')) AS n_punct,
         |             len(list_filter(toks, t -> list_contains($stop, t))) AS n_stopwords
         |      FROM tok))),
         |j AS (
         |  SELECT doc_id, lang, CAST(floor(cs * 10000 + 0.5) AS BIGINT) AS s4, pass,
         |         CAST(CASE WHEN pass = 1
         |                   THEN 10000 - floor(cs * 10000 + 0.5)
         |                   ELSE floor(cs * 10000 + 0.5) END AS BIGINT) AS n4
         |  FROM s JOIN q USING (doc_id)),
         |cal AS (
         |  SELECT lang, n4,
         |         row_number() OVER (PARTITION BY lang ORDER BY n4, doc_id) AS rn,
         |         (((count(*) OVER (PARTITION BY lang)) + 1) * 9 + 9) // 10 AS k
         |  FROM j WHERE doc_id % 3 = 1),
         |qh AS (SELECT lang, n4 AS qhat FROM cal WHERE rn = k)
         |SELECT doc_id, j.lang, s4, qhat,
         |       CAST((CASE WHEN 10000 - s4 <= qhat THEN 1 ELSE 0 END)
         |          + (CASE WHEN s4 <= qhat THEN 1 ELSE 0 END) AS BIGINT)
         |         AS set_size,
         |       CASE WHEN pass = 1 THEN 10000 - s4 <= qhat
         |            ELSE s4 <= qhat END AS covered
         |FROM j JOIN qh ON j.lang = qh.lang
         |WHERE doc_id % 3 = 2""".stripMargin
  }

  // ---- x261 l-diversity audit -----------------------------------------

  private val x261 = {
    val l = graft.ops.DataProfile.LDiversityL
    raw"""SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
         |       CAST(floor(floor(c_acctbal * 100 + 0.5) / 100000.0) AS BIGINT)
         |         AS bal_band,
         |       CAST(count(*) AS BIGINT) AS n_rows,
         |       CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS n_sensitive,
         |       count(DISTINCT c_mktsegment) >= $l AS l_diverse
         |FROM customer
         |GROUP BY 1, 2""".stripMargin
  }

  // ---- x164 effective sample size per source -----------------------

  private val x164 = {
    val scale = Similarity.CentroidScale
    val es = graft.ops.QualityFilters.EssScale
    raw"""WITH $dsirCtes,
         |w AS (
         |  SELECT doc_id,
         |         floor(CAST(sum(n * lp) AS DOUBLE) / $scale::DOUBLE * 10000 + 0.5) / 10000
         |           AS log_weight
         |  FROM df JOIN lam USING (f) GROUP BY 1),
         |wq AS (
         |  SELECT doc_id, CAST(floor(exp(log_weight) * $es + 0.5) AS BIGINT) AS wq
         |  FROM w),
         |a AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(wq) AS BIGINT) AS sw,
         |         CAST(sum(wq * wq) AS BIGINT) AS sww
         |  FROM documents JOIN wq USING (doc_id) GROUP BY 1)
         |SELECT source, n,
         |       CASE WHEN sww = 0 THEN NULL
         |            ELSE ${round4("CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE) / CAST(sww AS DOUBLE)")}
         |       END AS ess,
         |       CASE WHEN sww = 0 THEN NULL
         |            ELSE ${round4("CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE) / CAST(sww AS DOUBLE) / CAST(n AS DOUBLE)")}
         |       END AS ess_frac
         |FROM a""".stripMargin
  }

  // ---- x165 sorted-neighborhood blocking pairs ---------------------
  private val x165 = {
    val w = graft.ops.Fuzzy.SnWindow
    val d = graft.ops.Fuzzy.MaxEditDist
    raw"""WITH names AS (SELECT DISTINCT p_name, reverse(p_name) AS skey FROM part),
         |r AS (SELECT p_name, row_number() OVER (ORDER BY skey) AS rnk FROM names)
         |SELECT least(a.p_name, b.p_name) AS name_a,
         |       greatest(a.p_name, b.p_name) AS name_b,
         |       CAST(b.rnk - a.rnk AS BIGINT) AS gap,
         |       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
         |FROM r a JOIN r b ON b.rnk - a.rnk BETWEEN 1 AND $w
         |WHERE abs(length(a.p_name) - length(b.p_name)) <= $d
         |  AND levenshtein(a.p_name, b.p_name) <= $d""".stripMargin
  }

  // ---- x166 Jaro-Winkler scored name match -------------------------
  private val x166 = {
    val t = graft.ops.Fuzzy.JwThreshold
    raw"""WITH names AS (
         |  SELECT DISTINCT p_name, string_split(p_name, ' ')[-1] AS block
         |  FROM part)
         |SELECT a.p_name AS name_a, b.p_name AS name_b,
         |       ${round4("jaro_winkler_similarity(a.p_name, b.p_name)")} AS sim
         |FROM names a JOIN names b
         |  ON a.block = b.block AND a.p_name < b.p_name
         |WHERE ${round4("jaro_winkler_similarity(a.p_name, b.p_name)")} >= $t""".stripMargin
  }

  // ---- x167 RFM quartile segmentation ------------------------------
  private val x167 = {
    val tiles = graft.ops.Olap.RfmTiles
    raw"""WITH base AS (
         |  SELECT o_custkey AS custkey,
         |         CAST(date_diff('day',
         |           CAST(max(o_orderdate) AS DATE),
         |           (SELECT CAST(max(o_orderdate) AS DATE) FROM orders)) AS BIGINT)
         |           AS rec_days,
         |         CAST(count(*) AS BIGINT) AS freq,
         |         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         |           AS mon_cents
         |  FROM orders GROUP BY 1),
         |n AS (SELECT count(*) AS n FROM base),
         |rk AS (
         |  SELECT custkey,
         |         row_number() OVER (ORDER BY rec_days, custkey) AS rr,
         |         row_number() OVER (ORDER BY freq DESC, custkey) AS fr,
         |         row_number() OVER (ORDER BY mon_cents DESC, custkey) AS mr
         |  FROM base),
         |t AS (
         |  SELECT custkey,
         |         CAST(floor((rr - 1) * $tiles / n.n) + 1 AS BIGINT) AS r_tile,
         |         CAST(floor((fr - 1) * $tiles / n.n) + 1 AS BIGINT) AS f_tile,
         |         CAST(floor((mr - 1) * $tiles / n.n) + 1 AS BIGINT) AS m_tile
         |  FROM rk CROSS JOIN n)
         |SELECT base.custkey, rec_days, freq, mon_cents, r_tile, f_tile, m_tile,
         |       r_tile::VARCHAR || f_tile::VARCHAR || m_tile::VARCHAR AS segment
         |FROM base JOIN t ON base.custkey = t.custkey""".stripMargin
  }

  // ---- x168 market-basket brand lift -------------------------------
  private val x168 =
    raw"""WITH ob AS (
         |  SELECT DISTINCT l_orderkey, p_brand
         |  FROM lineitem JOIN part ON l_partkey = p_partkey),
         |n AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM ob),
         |singles AS (
         |  SELECT p_brand, CAST(count(*) AS BIGINT) AS n_single FROM ob GROUP BY 1),
         |pairs AS (
         |  SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
         |         CAST(count(*) AS BIGINT) AS n_ab
         |  FROM ob a JOIN ob b
         |    ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
         |  GROUP BY 1, 2)
         |SELECT brand_a, brand_b, n_ab,
         |       ${round4("n_ab::DOUBLE / n.n_orders::DOUBLE")} AS support,
         |       ${round4("n_ab::DOUBLE * n.n_orders::DOUBLE / (sa.n_single::DOUBLE * sb.n_single::DOUBLE)")} AS lift
         |FROM pairs
         |     JOIN singles sa ON sa.p_brand = pairs.brand_a
         |     JOIN singles sb ON sb.p_brand = pairs.brand_b
         |     CROSS JOIN n""".stripMargin

  // ---- x169 Pareto frontier (2-D skyline) --------------------------
  private val x169 =
    raw"""WITH pp AS (
         |  SELECT p_partkey,
         |         CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS price_c,
         |         CAST(p_size AS BIGINT) AS size
         |  FROM part),
         |best AS (SELECT price_c, max(size) AS best_sz FROM pp GROUP BY 1),
         |pref AS (
         |  SELECT price_c, best_sz,
         |         max(best_sz) OVER (ORDER BY price_c
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS before_max
         |  FROM best),
         |front AS (
         |  SELECT price_c, best_sz FROM pref
         |  WHERE before_max IS NULL OR best_sz > before_max)
         |SELECT p_partkey, pp.price_c, pp.size
         |FROM pp JOIN front
         |  ON pp.price_c = front.price_c AND pp.size = front.best_sz""".stripMargin

  // ---- x170 autocorrelation of daily volume ------------------------
  private val x170 = {
    val maxLag = Events.MaxAcfLag
    raw"""WITH $dailyCte,
         |d AS (SELECT day, CAST(sum(n) AS BIGINT) AS n FROM daily GROUP BY 1),
         |m AS (
         |  SELECT r.range AS lag, CAST(count(*) AS BIGINT) AS n_pairs,
         |         sum(a.n) AS sx, sum(b.n) AS sy, sum(a.n * b.n) AS sxy,
         |         sum(a.n * a.n) AS sxx, sum(b.n * b.n) AS syy
         |  FROM d a CROSS JOIN range(1, ${maxLag + 1}) r
         |       JOIN d b ON b.day = a.day + r.range
         |  GROUP BY 1)
         |SELECT CAST(lag AS BIGINT) AS lag, n_pairs,
         |       CASE WHEN n_pairs * sxx - sx * sx > 0 AND n_pairs * syy - sy * sy > 0
         |            THEN ${round4("((n_pairs * sxy - sx * sy)::DOUBLE) / (sqrt((n_pairs * sxx - sx * sx)::DOUBLE) * sqrt((n_pairs * syy - sy * sy)::DOUBLE))")}
         |       END AS acf
         |FROM m""".stripMargin
  }

  // ---- x171 session Markov transition matrix -----------------------
  private val x171 =
    raw"""WITH $sessionCtes,
         |steps AS (
         |  SELECT event_type AS cur_type,
         |         lead(event_type) OVER (PARTITION BY user_id, session_seq
         |                                ORDER BY ms, event_id) AS next_type
         |  FROM sessions),
         |p AS (SELECT cur_type, next_type, CAST(count(*) AS BIGINT) AS n
         |      FROM steps WHERE next_type IS NOT NULL GROUP BY 1, 2),
         |o AS (SELECT cur_type, CAST(sum(n) AS BIGINT) AS n_out FROM p GROUP BY 1)
         |SELECT cur_type, next_type, n, n_out,
         |       ${round4("n::DOUBLE / n_out::DOUBLE")} AS p_next
         |FROM p JOIN o USING (cur_type)""".stripMargin

  // ---- x172 k-core of the part co-purchase graph -------------------
  private val x172 = {
    val k = graft.ops.Graph.KCoreK
    val sup = graft.ops.Graph.KCoreMinSupport
    // every peel references its predecessor TWICE (both edge ends) —
    // MATERIALIZED, or DuckDB inlines the CTE tree into 2^rounds
    // copies of the base pair join (observed: 90+ CPU-minutes at sf0.1)
    val peels = (1 to graft.ops.Graph.KCoreRounds).map { i =>
      s"""a$i AS MATERIALIZED (
         |  SELECT e.u FROM e JOIN a${i - 1} x ON e.u = x.u JOIN a${i - 1} y ON e.v = y.u
         |  GROUP BY e.u HAVING count(*) >= $k)""".stripMargin
    }.mkString(",\n")
    val last = s"a${graft.ops.Graph.KCoreRounds}"
    raw"""WITH ob AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |pr AS (
         |  SELECT a.l_partkey AS pa, b.l_partkey AS pb
         |  FROM ob a JOIN ob b
         |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         |  GROUP BY 1, 2 HAVING count(*) >= $sup),
         |e AS MATERIALIZED (SELECT pa AS u, pb AS v FROM pr UNION ALL SELECT pb, pa FROM pr),
         |a0 AS MATERIALIZED (SELECT DISTINCT u FROM e),
         |$peels
         |SELECT e.u AS p_partkey, CAST(count(*) AS BIGINT) AS core_deg
         |FROM e JOIN $last x ON e.u = x.u JOIN $last y ON e.v = y.u
         |GROUP BY 1 HAVING count(*) >= $k""".stripMargin
  }

  // ---- x173 Neyman-allocation stratified sample --------------------
  private val x173 = {
    val t = graft.ops.QualityFilters.NeymanTarget
    raw"""WITH mom AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_h,
         |         sum(n_chars::DECIMAL(38,0)) AS sy,
         |         sum((n_chars * n_chars)::DECIMAL(38,0)) AS syy
         |  FROM documents GROUP BY 1),
         |m2 AS (SELECT source, n_h,
         |              sqrt(((n_h::DECIMAL(38,0)) * syy - sy * sy)::DOUBLE) AS nsig
         |       FROM mom),
         |tot AS (SELECT list_sum(list(nsig ORDER BY source)) AS tot_nsig FROM m2),
         |alloc AS (
         |  SELECT source, n_h,
         |         least(n_h, CAST(floor($t * nsig / tot_nsig + 0.5) AS BIGINT)) AS n_alloc
         |  FROM m2 CROSS JOIN tot),
         |r AS (
         |  SELECT doc_id, source,
         |         CAST(row_number() OVER (PARTITION BY source
         |           ORDER BY md5(doc_id::VARCHAR), doc_id) AS BIGINT) AS rnk
         |  FROM documents)
         |SELECT doc_id, r.source, rnk, n_alloc
         |FROM r JOIN alloc USING (source) WHERE rnk <= n_alloc""".stripMargin
  }

  // ---- x174 label-centroid confusion screen ------------------------
  private val x174 = {
    val scale = Similarity.CentroidScale
    raw"""WITH comp AS (
         |  SELECT label, u.d AS dim,
         |         sum(CAST(floor(u.x * $scale) AS BIGINT)) AS component_sum,
         |         CAST(count(*) AS BIGINT) AS n
         |  FROM (SELECT label, embedding::DOUBLE[] AS e FROM embeddings) v,
         |       unnest([{'d': i-1, 'x': e[i]} for i in range(1, len(e)+1)]) AS t(u)
         |  GROUP BY 1, 2),
         |cents AS (
         |  SELECT CAST(label AS BIGINT) AS label, max(n) AS n,
         |         list(component_sum::DOUBLE / ((n * $scale)::DOUBLE) ORDER BY dim) AS cv
         |  FROM comp GROUP BY 1),
         |cn AS (SELECT label, n, cv,
         |              sqrt(list_sum([x * x for x in cv])) AS cnrm FROM cents),
         |mem AS (
         |  SELECT CAST(label AS BIGINT) AS label, v,
         |         sqrt(list_sum([x * x for x in v])) AS nrm
         |  FROM (SELECT label, embedding::DOUBLE[] AS v FROM embeddings)),
         |coh AS (
         |  SELECT m.label, CAST(count(*) AS BIGINT) AS n_members,
         |         CAST(sum(CAST(floor(${dotExpr("m.v", "c.cv")} / (m.nrm * c.cnrm) * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS s4
         |  FROM mem m JOIN cn c ON m.label = c.label GROUP BY 1),
         |pairs AS (
         |  SELECT a.label AS la, b.label AS lb,
         |         ${cosExpr("a.cv", "a.cnrm", "b.cv", "b.cnrm")} AS cos_c
         |  FROM cn a JOIN cn b ON a.label <> b.label),
         |near AS (
         |  SELECT la, lb, cos_c,
         |         row_number() OVER (PARTITION BY la ORDER BY cos_c DESC, lb) AS nr
         |  FROM pairs)
         |SELECT coh.label, n_members,
         |       ${round4("s4::DOUBLE / ((n_members * 10000)::DOUBLE)")} AS cohesion,
         |       near.lb AS nearest_label, near.cos_c AS nearest_cos
         |FROM coh JOIN near ON coh.label = near.la AND near.nr = 1""".stripMargin
  }

  /** Shared x168/x175 per-order brand-basket pair counts. */
  private val basketCtes =
    raw"""ob AS (
         |  SELECT DISTINCT l_orderkey, p_brand
         |  FROM lineitem JOIN part ON l_partkey = p_partkey),
         |singles AS (
         |  SELECT p_brand, CAST(count(*) AS BIGINT) AS n_single FROM ob GROUP BY 1),
         |bpairs AS (
         |  SELECT a.p_brand AS ba, b.p_brand AS bb,
         |         CAST(count(*) AS BIGINT) AS n_ab
         |  FROM ob a JOIN ob b
         |    ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
         |  GROUP BY 1, 2)""".stripMargin

  // ---- x175 item-item neighbor lists -------------------------------
  private val x175 = {
    val k = graft.ops.Olap.ItemTopK
    raw"""WITH $basketCtes,
         |sym AS (
         |  SELECT ba AS brand, bb AS neighbor, n_ab FROM bpairs
         |  UNION ALL SELECT bb, ba, n_ab FROM bpairs),
         |scored AS (
         |  SELECT brand, neighbor, n_ab,
         |         ${round4("n_ab::DOUBLE / sqrt((sa.n_single * sb.n_single)::DOUBLE)")} AS cos_sim
         |  FROM sym
         |       JOIN singles sa ON sa.p_brand = sym.brand
         |       JOIN singles sb ON sb.p_brand = sym.neighbor)
         |SELECT brand, neighbor, n_ab, cos_sim, rnk FROM (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY brand
         |    ORDER BY cos_sim DESC, neighbor) AS BIGINT) AS rnk
         |  FROM scored)
         |WHERE rnk <= $k""".stripMargin
  }

  // ---- x176 multi-touch linear attribution -------------------------
  private val x176 =
    raw"""WITH $sessionCtes,
         |p AS (SELECT user_id, session_seq, event_id AS purchase_id, ms AS pms
         |      FROM sessions WHERE event_type = 'purchase'),
         |v AS (SELECT user_id, session_seq, event_id AS view_id, ms AS vms
         |      FROM sessions WHERE event_type = 'view'),
         |touched AS (
         |  SELECT purchase_id, view_id
         |  FROM p JOIN v USING (user_id, session_seq)
         |  WHERE vms < pms OR (vms = pms AND view_id < purchase_id)),
         |c AS (SELECT purchase_id, CAST(count(*) AS BIGINT) AS n_touch
         |      FROM touched GROUP BY 1)
         |SELECT purchase_id, view_id, n_touch,
         |       ${round4("1.0 / n_touch::DOUBLE")} AS credit
         |FROM touched JOIN c USING (purchase_id)""".stripMargin

  // ---- x177 cross-source quantile normalization --------------------
  private val x177 =
    raw"""WITH sc AS (
         |  SELECT s.doc_id, s.clf_score, d.source
         |  FROM ($x107) s JOIN documents d ON s.doc_id = d.doc_id),
         |ranked AS (
         |  SELECT doc_id, source, clf_score,
         |         CAST(row_number() OVER (PARTITION BY source
         |           ORDER BY clf_score, doc_id) AS BIGINT) AS r,
         |         CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_src
         |  FROM sc),
         |gq AS (
         |  SELECT clf_score AS gs,
         |         CAST(row_number() OVER (ORDER BY clf_score, doc_id) AS BIGINT) AS grnk
         |  FROM sc),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n_tot FROM sc)
         |SELECT doc_id, source, clf_score, gs AS norm_score
         |FROM ranked CROSS JOIN n
         |     JOIN gq ON ((2 * r - 1) * n_tot) // (2 * n_src) + 1 = grnk""".stripMargin

  // ---- x178 Adamic-Adar link prediction over the x114 kNN graph ----
  private val x178 = {
    import graft.ops.Graph.{AaScale, AaTopK}
    raw"""WITH knn AS MATERIALIZED ($x114),
         |edges AS (
         |  SELECT vec_a AS u, vec_b AS v FROM knn
         |  UNION ALL SELECT vec_b, vec_a FROM knn),
         |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY 1),
         |nb AS (
         |  SELECT e.u AS w, e.v AS n,
         |         CAST(floor($AaScale::DOUBLE / ln(d.deg::DOUBLE) + 0.5) AS BIGINT) AS c
         |  FROM edges e JOIN deg d USING (u) WHERE d.deg >= 2),
         |wedges AS (
         |  SELECT l.n AS node_a, r.n AS node_b, l.c
         |  FROM nb l JOIN nb r ON l.w = r.w AND l.n < r.n),
         |scores AS (
         |  SELECT node_a, node_b, CAST(sum(c) AS BIGINT) AS s6,
         |         CAST(count(*) AS BIGINT) AS n_common
         |  FROM wedges GROUP BY 1, 2),
         |pred AS (
         |  SELECT s.* FROM scores s
         |  WHERE NOT EXISTS (SELECT 1 FROM knn e
         |                    WHERE e.vec_a = s.node_a AND e.vec_b = s.node_b))
         |SELECT node_a, node_b, n_common,
         |       ${round4(s"s6::DOUBLE / $AaScale::DOUBLE")} AS aa_score
         |FROM pred ORDER BY s6 DESC, node_a, node_b LIMIT $AaTopK""".stripMargin
  }

  // ---- x179 supplier revenue HHI per nation ------------------------
  private val x179 =
    raw"""WITH bysupp AS (
         |  SELECT s_nationkey, s_suppkey,
         |         sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5)
         |             AS BIGINT)) AS sc
         |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         |  GROUP BY 1, 2),
         |m AS (
         |  SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n_suppliers,
         |         sum(sc::DECIMAL(38,0)) AS tot,
         |         sum(sc::DECIMAL(38,0) * sc::DECIMAL(38,0)) AS sq
         |  FROM bysupp GROUP BY 1)
         |SELECT n_name, n_suppliers, CAST(tot AS BIGINT) AS rev_cents,
         |       ${round4("sq::DOUBLE * 10000.0 / (tot::DOUBLE * tot::DOUBLE)")} AS hhi
         |FROM m JOIN nation ON s_nationkey = n_nationkey""".stripMargin

  // ---- x180 Kaplan-Meier view→purchase survival --------------------
  private val x180 =
    raw"""WITH base AS (
         |  SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events),
         |h AS (SELECT max(ms) AS hms FROM base),
         |pu AS (
         |  SELECT user_id,
         |         min(CASE WHEN event_type = 'view' THEN ms END) AS vms,
         |         min(CASE WHEN event_type = 'purchase' THEN ms END) AS pms0
         |  FROM base GROUP BY 1),
         |du AS (
         |  SELECT CASE WHEN pms0 >= vms THEN (pms0 - vms) // 86400000
         |              ELSE (hms - vms) // 86400000 END AS t_day,
         |         CASE WHEN pms0 >= vms THEN 1 ELSE 0 END AS is_event
         |  FROM pu CROSS JOIN h WHERE vms IS NOT NULL),
         |daily AS (
         |  SELECT t_day, CAST(sum(is_event) AS BIGINT) AS d_events,
         |         CAST(count(*) - sum(is_event) AS BIGINT) AS c_censored
         |  FROM du GROUP BY 1),
         |n AS (SELECT CAST(sum(d_events + c_censored) AS BIGINT) AS n_all FROM daily),
         |r AS (
         |  SELECT t_day, d_events, c_censored,
         |         n_all - CAST(coalesce(sum(d_events + c_censored) OVER (ORDER BY t_day
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |           AS n_risk
         |  FROM daily CROSS JOIN n),
         |s AS (
         |  SELECT *, sum(CASE WHEN d_events < n_risk
         |                THEN ln(1.0 - d_events::DOUBLE / n_risk::DOUBLE) END)
         |            OVER (ORDER BY t_day
         |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lns
         |  FROM r)
         |SELECT t_day, n_risk, d_events, c_censored,
         |       CASE WHEN d_events = n_risk THEN 0.0
         |            ELSE ${round4("exp(coalesce(lns, 0.0))")} END AS survival
         |FROM s""".stripMargin

  // ---- x181 scalar-quantization error audit ------------------------
  private val x181 = {
    val lv = Similarity.SqLevels
    raw"""WITH vs AS (
         |  SELECT CAST(label AS BIGINT) AS label, embedding::DOUBLE[] AS v
         |  FROM embeddings),
         |rg AS (
         |  SELECT u.d AS dim, min(u.x) AS mn, max(u.x) AS mx
         |  FROM vs, unnest([{'d': i-1, 'x': v[i]} for i in range(1, len(v)+1)]) AS t(u)
         |  GROUP BY 1),
         |ra AS (SELECT list({'mn': mn, 'mx': mx} ORDER BY dim) AS rl FROM rg),
         |errs AS (
         |  SELECT label,
         |         CAST(floor(list_sum([
         |           CASE WHEN rl[i].mx - rl[i].mn > 0 THEN
         |             (v[i] - (rl[i].mn + floor((v[i] - rl[i].mn) * $lv /
         |                (rl[i].mx - rl[i].mn) + 0.5) * (rl[i].mx - rl[i].mn) / $lv))
         |             * (v[i] - (rl[i].mn + floor((v[i] - rl[i].mn) * $lv /
         |                (rl[i].mx - rl[i].mn) + 0.5) * (rl[i].mx - rl[i].mn) / $lv))
         |           ELSE 0.0 END
         |           for i in range(1, ${Similarity.Dim + 1})]) * 1e12 + 0.5) AS BIGINT)
         |           AS err12
         |  FROM vs CROSS JOIN ra)
         |SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
         |       ${round4("sum(err12)::DOUBLE / (count(*)::DOUBLE * 1e8)")} AS mse_e4,
         |       ${round4("max(err12)::DOUBLE / 1e8")} AS max_err_e4
         |FROM errs GROUP BY 1""".stripMargin
  }

  // ---- x182 eventually-follows footprint ---------------------------
  private val x182 =
    raw"""WITH $sessionCtes,
         |pos AS (
         |  SELECT user_id, session_seq, event_type,
         |         CAST(row_number() OVER (PARTITION BY user_id, session_seq
         |           ORDER BY ms, event_id) AS BIGINT) AS pos
         |  FROM sessions),
         |spans AS (
         |  SELECT user_id, session_seq, event_type,
         |         min(pos) AS first_pos, max(pos) AS last_pos
         |  FROM pos GROUP BY 1, 2, 3),
         |n AS (SELECT CAST(count(DISTINCT (user_id, session_seq)) AS BIGINT)
         |        AS n_total FROM spans)
         |SELECT a.event_type AS type_a, b.event_type AS type_b,
         |       CAST(count(*) AS BIGINT) AS n_sessions,
         |       ${round4("count(*)::DOUBLE / max(n.n_total)::DOUBLE")} AS support
         |FROM spans a
         |     JOIN spans b ON a.user_id = b.user_id
         |                 AND a.session_seq = b.session_seq
         |                 AND a.first_pos < b.last_pos
         |     CROSS JOIN n
         |GROUP BY 1, 2""".stripMargin

  // ---- x183 vocab coverage curve -----------------------------------
  private val x183 = {
    val gridK = (0 to TextAnalysis.CoverageMaxLog2).map(1L << _)
    val caseChain = gridK.map(k => s"WHEN rnk <= $k THEN $k").mkString(" ")
    raw"""WITH $toksCte,
         |freqs AS (
         |  SELECT t AS tok, CAST(count(*) AS BIGINT) AS cnt
         |  FROM (SELECT unnest(toks) AS t FROM tok) GROUP BY 1),
         |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM freqs),
         |ranked AS (
         |  SELECT cnt, CAST(row_number() OVER (ORDER BY cnt DESC, tok)
         |    AS BIGINT) AS rnk
         |  FROM freqs),
         |g AS (
         |  SELECT CAST(CASE $caseChain END AS BIGINT) AS k,
         |         CAST(sum(cnt) AS BIGINT) AS bucket_mass
         |  FROM ranked WHERE CASE $caseChain END IS NOT NULL GROUP BY 1)
         |SELECT k, bucket_mass,
         |       CAST(sum(bucket_mass) OVER (ORDER BY k
         |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |         AS covered,
         |       ${round4("(sum(bucket_mass) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::DOUBLE / tot.t::DOUBLE")}
         |         AS share
         |FROM g CROSS JOIN tot""".stripMargin
  }

  // ---- x184 dedup report card --------------------------------------
  private val x184 =
    raw"""$x30Ctes,
         |lbl AS (
         |  SELECT l.doc_id, l.cluster_id, s.n_members
         |  FROM labels l JOIN sizes s USING (cluster_id)),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs_graph FROM lbl)
         |SELECT n_members, CAST(count(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
         |       CAST(n_members * count(DISTINCT cluster_id) AS BIGINT) AS n_docs,
         |       ${round4("(n_members * count(DISTINCT cluster_id))::DOUBLE / max(tot.n_docs_graph)::DOUBLE")} AS doc_share,
         |       CAST((n_members - 1) * count(DISTINCT cluster_id) AS BIGINT) AS n_removable
         |FROM lbl CROSS JOIN tot
         |GROUP BY n_members""".stripMargin

  // ---- x185 data-quality contract suite ----------------------------
  private val x185 = {
    def check(name: String, countSql: String): String =
      s"""SELECT '$name' AS check_name, CAST(($countSql) AS BIGINT) AS n_violations,
         |       CAST(($countSql) = 0 AS BIGINT) AS passed""".stripMargin
    Seq(
      check("fk_orders_custkey",
        "SELECT count(*) FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)"),
      check("fk_lineitem_orderkey",
        "SELECT count(*) FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)"),
      check("fk_lineitem_partkey",
        "SELECT count(*) FROM lineitem WHERE l_partkey NOT IN (SELECT p_partkey FROM part)"),
      check("unique_part_partkey",
        "SELECT count(*) FROM (SELECT p_partkey FROM part GROUP BY 1 HAVING count(*) > 1)"),
      check("range_l_quantity_positive",
        "SELECT count(*) FROM lineitem WHERE l_quantity <= 0"),
      check("range_l_extendedprice_nonneg",
        "SELECT count(*) FROM lineitem WHERE l_extendedprice < 0"),
      check("range_l_discount_0_05",
        "SELECT count(*) FROM lineitem WHERE l_discount < 0 OR l_discount > 0.5"),
      check("range_o_orderdate_1992_1998",
        "SELECT count(*) FROM orders WHERE CAST(o_orderdate AS DATE) < DATE '1992-01-01' OR CAST(o_orderdate AS DATE) > DATE '1998-12-31'")
    ).mkString("\nUNION ALL\n")
  }

  // ---- x186 measure correlation matrix -----------------------------
  private val x186 = {
    val ms = Seq(
      "quantity"    -> "CAST(l_quantity AS BIGINT)",
      "price_c"     -> "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)",
      "discount_bp" -> "CAST(floor(l_discount * 10000 + 0.5) AS BIGINT)",
      "tax_bp"      -> "CAST(floor(l_tax * 10000 + 0.5) AS BIGINT)")
    val aggs =
      ms.map { case (n, e) => s"sum(($e)::DECIMAL(38,0)) AS s_$n" } ++
      ms.map { case (n, e) => s"sum((($e) * ($e))::DECIMAL(38,0)) AS ss_$n" } ++
      ms.combinations(2).map { case Seq((na, ea), (nb, eb)) =>
        s"sum((($ea) * ($eb))::DECIMAL(38,0)) AS sp_${na}_$nb"
      }
    val pairs = ms.combinations(2).map { case Seq((na, _), (nb, _)) =>
      val cov = s"(m.n * m.sp_${na}_$nb - m.s_$na * m.s_$nb)"
      val va  = s"(m.n * m.ss_$na - m.s_$na * m.s_$na)"
      val vb  = s"(m.n * m.ss_$nb - m.s_$nb * m.s_$nb)"
      s"""SELECT '$na' AS var_a, '$nb' AS var_b,
         |  CASE WHEN $va > 0 AND $vb > 0
         |       THEN ${round4(s"$cov::DOUBLE / (sqrt($va::DOUBLE) * sqrt($vb::DOUBLE))")}
         |  END AS corr
         |FROM m""".stripMargin
    }.mkString("\nUNION ALL\n")
    raw"""WITH m AS (
         |  SELECT count(*)::DECIMAL(38,0) AS n, ${aggs.mkString(", ")}
         |  FROM lineitem)
         |$pairs""".stripMargin
  }

  // ---- x187 difference-in-differences ------------------------------
  private val x187 = {
    val (ct, cc) = (Events.AbConvType, Events.AbConvCents)
    raw"""WITH base AS (
         |  SELECT user_id, event_type,
         |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc,
         |         epoch_ms(ts) AS ms
         |  FROM events),
         |span AS (SELECT (min(ms) + max(ms)) // 2 AS mid FROM base),
         |tagged AS (
         |  SELECT user_id, event_type, vc,
         |         CAST(ms >= span.mid AS BIGINT) AS period,
         |         CAST(user_id % 2 AS BIGINT) AS variant
         |  FROM base CROSS JOIN span),
         |u AS (
         |  SELECT variant, period, CAST(count(DISTINCT user_id) AS BIGINT) AS n
         |  FROM tagged GROUP BY 1, 2),
         |c AS (
         |  SELECT variant, period, CAST(count(DISTINCT user_id) AS BIGINT) AS k
         |  FROM tagged WHERE event_type = '$ct' AND vc >= $cc GROUP BY 1, 2),
         |cells AS (
         |  SELECT u.variant, u.period,
         |         ${round4("coalesce(c.k, 0)::DOUBLE / u.n::DOUBLE")} AS r
         |  FROM u LEFT JOIN c USING (variant, period)),
         |w AS (
         |  SELECT
         |    max(CASE WHEN variant = 0 AND period = 0 THEN r END) AS r_a_pre,
         |    max(CASE WHEN variant = 0 AND period = 1 THEN r END) AS r_a_post,
         |    max(CASE WHEN variant = 1 AND period = 0 THEN r END) AS r_b_pre,
         |    max(CASE WHEN variant = 1 AND period = 1 THEN r END) AS r_b_post
         |  FROM cells)
         |SELECT r_a_pre, r_a_post, r_b_pre, r_b_post,
         |       ${round4("r_a_post - r_a_pre")} AS delta_a,
         |       ${round4("r_b_post - r_b_pre")} AS delta_b,
         |       ${round4("(r_b_post - r_b_pre) - (r_a_post - r_a_pre)")} AS did
         |FROM w""".stripMargin
  }

  // ---- x188 Poisson bootstrap CI -----------------------------------
  private val x188 = {
    import graft.ops.DataProfile.{BootHiIdx, BootLoIdx, BootReplicates, PoissonCdf}
    val wCase = PoissonCdf.zipWithIndex
      .map { case (p, k) => s"WHEN u < $p THEN $k" }
      .mkString("CASE ", " ", s" ELSE ${PoissonCdf.size} END")
    raw"""WITH reps AS (
         |  SELECT source, b,
         |         CAST($wCase AS BIGINT) AS w, n_chars
         |  FROM (
         |    SELECT source, n_chars, r.range AS b,
         |           ('0x' || substr(md5(doc_id::VARCHAR || ':' || r.range::VARCHAR), 1, 15))::BIGINT::DOUBLE
         |             / ${math.pow(2.0, 60)} AS u
         |    FROM documents CROSS JOIN range(0, $BootReplicates) r)),
         |means AS (
         |  SELECT source,
         |         sum(w * n_chars)::DOUBLE / sum(w)::DOUBLE AS m
         |  FROM reps GROUP BY source, b HAVING sum(w) > 0),
         |ci AS (
         |  SELECT source, list(m ORDER BY m) AS ms FROM means GROUP BY 1)
         |SELECT d.source, CAST(count(*) AS BIGINT) AS n,
         |       ${round4("sum(d.n_chars)::DOUBLE / count(*)::DOUBLE")} AS mean_chars,
         |       CASE WHEN len(any_value(ci.ms)) >= $BootHiIdx
         |            THEN ${round4(s"any_value(ci.ms)[$BootLoIdx]")} END AS ci_lo,
         |       CASE WHEN len(any_value(ci.ms)) >= $BootHiIdx
         |            THEN ${round4(s"any_value(ci.ms)[$BootHiIdx]")} END AS ci_hi
         |FROM documents d JOIN ci ON d.source = ci.source
         |GROUP BY d.source""".stripMargin
  }

  // ---- x189 session regularity / bot screen ------------------------
  private val x189 = {
    import graft.ops.Events.{BotJitterMs, BotMinEvents}
    raw"""WITH $sessionCtes,
         |g AS (
         |  SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
         |         ms - lag(ms) OVER (PARTITION BY user_id, session_seq
         |                            ORDER BY ms, event_id) AS gap
         |  FROM sessions),
         |a AS (
         |  SELECT user_id, session_seq, CAST(count(*) AS BIGINT) AS n_gaps,
         |         min(gap) AS gap_min, max(gap) AS gap_max,
         |         CAST(sum(gap) AS BIGINT) AS sg,
         |         CAST(sum(gap * gap) AS BIGINT) AS sgg
         |  FROM g WHERE gap IS NOT NULL GROUP BY 1, 2)
         |SELECT user_id, session_seq, n_gaps + 1 AS n_events, gap_min, gap_max,
         |       ${round4("(n_gaps * sgg - sg * sg)::DOUBLE / (n_gaps * n_gaps)::DOUBLE")} AS gap_var,
         |       CAST(gap_max - gap_min <= $BotJitterMs AS BIGINT) AS is_regular
         |FROM a WHERE n_gaps >= ${BotMinEvents - 1}""".stripMargin
  }

  // ---- x190 IVF recall against brute force -------------------------
  private val x190 = {
    val k = Similarity.TopK
    raw"""WITH brute AS MATERIALIZED ($x10),
         |ivf AS MATERIALIZED (
         |  SELECT * FROM ($x11) WHERE q_id % ${Similarity.QueryStride} = 0),
         |common AS (
         |  SELECT b.q_id, CAST(count(*) AS BIGINT) AS n_common
         |  FROM brute b JOIN ivf i ON b.q_id = i.q_id AND b.vec_id = i.vec_id
         |  GROUP BY 1)
         |SELECT b.q_id, CAST(count(*) AS BIGINT) AS n_brute,
         |       coalesce(any_value(common.n_common), 0) AS n_common,
         |       ${round4(s"coalesce(any_value(common.n_common), 0)::DOUBLE / $k")} AS recall
         |FROM brute b LEFT JOIN common ON b.q_id = common.q_id
         |GROUP BY b.q_id""".stripMargin
  }

  // ---- x191 top brand triples --------------------------------------
  private val x191 = {
    val k = graft.ops.Olap.TripleTopK
    raw"""WITH ob AS (
         |  SELECT DISTINCT l_orderkey, p_brand
         |  FROM lineitem JOIN part ON l_partkey = p_partkey)
         |SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, c.p_brand AS brand_c,
         |       CAST(count(*) AS BIGINT) AS n_orders
         |FROM ob a JOIN ob b ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
         |          JOIN ob c ON a.l_orderkey = c.l_orderkey AND b.p_brand < c.p_brand
         |GROUP BY 1, 2, 3
         |ORDER BY n_orders DESC, brand_a, brand_b, brand_c
         |LIMIT $k""".stripMargin
  }

  // ---- x192 seasonally-adjusted volume anomalies -------------------
  private val x192 = {
    val r = Events.AnomalyRatio
    val lo = s"floor((1.0 / $r) * 10000 + 0.5) / 10000"
    raw"""WITH $dailyCte,
         |d AS (SELECT day, CAST(sum(n) AS BIGINT) AS n,
         |             CAST((day + 4) % 7 AS BIGINT) AS dow
         |      FROM daily GROUP BY 1),
         |m AS (SELECT dow, CAST(sum(n) AS BIGINT) AS sn,
         |             CAST(count(*) AS BIGINT) AS days
         |      FROM d GROUP BY 1)
         |SELECT day, d.dow, n,
         |       ${round4("sn::DOUBLE / days::DOUBLE")} AS expected,
         |       ${round4("(n * days)::DOUBLE / sn::DOUBLE")} AS ratio,
         |       CAST(${round4("(n * days)::DOUBLE / sn::DOUBLE")} >= $r
         |            OR ${round4("(n * days)::DOUBLE / sn::DOUBLE")} <= $lo
         |            AS BIGINT) AS is_anomaly
         |FROM d JOIN m ON d.dow = m.dow""".stripMargin
  }

  // ---- x193 weekly PSI drift trajectory ----------------------------
  private val x193 = {
    val cuts = Events.PsiValueCuts
    val nBins = cuts.size + 1
    val binCase = cuts.zipWithIndex
      .map { case (c, i) => s"WHEN CAST(floor(value * 100 + 0.5) AS BIGINT) < $c THEN $i" }
      .mkString("CASE ", " ", s" ELSE ${cuts.size} END")
    raw"""WITH cells AS (
         |  SELECT CAST(epoch_ms(ts) // ${7 * 86400000L} AS BIGINT) AS week,
         |         CAST($binCase AS BIGINT) AS bin,
         |         CAST(count(*) AS BIGINT) AS c
         |  FROM events GROUP BY 1, 2),
         |grid AS (
         |  SELECT w.week, b.range AS bin
         |  FROM (SELECT DISTINCT week FROM cells) w
         |       CROSS JOIN range(0, $nBins) b),
         |full_g AS (
         |  SELECT grid.week, grid.bin, coalesce(cells.c, 0) AS c
         |  FROM grid LEFT JOIN cells USING (week, bin)),
         |tots AS (SELECT week, CAST(sum(c) AS BIGINT) AS tot FROM full_g GROUP BY 1),
         |rw AS (SELECT min(week) AS w0 FROM full_g),
         |ref AS (SELECT bin, c AS rc FROM full_g CROSS JOIN rw WHERE week = rw.w0),
         |rt AS (SELECT CAST(sum(rc) AS BIGINT) AS rtot FROM ref),
         |terms AS (
         |  SELECT f.week, tots.tot, f.bin,
         |         ((f.c + 0.5) / (tots.tot + $nBins * 0.5)
         |          - (ref.rc + 0.5) / (rt.rtot + $nBins * 0.5))
         |         * ln(((f.c + 0.5) / (tots.tot + $nBins * 0.5))
         |              / ((ref.rc + 0.5) / (rt.rtot + $nBins * 0.5))) AS term
         |  FROM full_g f JOIN tots USING (week) JOIN ref USING (bin) CROSS JOIN rt)
         |SELECT week, max(tot) AS n_events,
         |       ${round4("list_sum(list(term ORDER BY bin))")} AS psi
         |FROM terms GROUP BY 1""".stripMargin
  }

  // ---- x194 revenue bridge (price-volume-mix) ----------------------
  private val x194 =
    raw"""WITH base AS (
         |  SELECT p_brand,
         |         CAST(year(CAST(l_shipdate AS DATE)) AS BIGINT) AS yr,
         |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qt,
         |         CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5)
         |             AS BIGINT)) AS BIGINT) AS rv
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  GROUP BY 1, 2),
         |span AS (SELECT min(yr) AS y0, max(yr) AS y1 FROM base),
         |s0 AS (SELECT p_brand, qt AS q0, rv AS r0 FROM base CROSS JOIN span
         |       WHERE yr = span.y0),
         |s1 AS (SELECT p_brand, qt AS q1, rv AS r1 FROM base CROSS JOIN span
         |       WHERE yr = span.y1)
         |SELECT p_brand, r0, r1, r1 - r0 AS delta_cents,
         |       ${round4("(q1 - q0)::DOUBLE * (r0::DOUBLE / q0::DOUBLE)")} AS volume_effect,
         |       ${round4("(r1::DOUBLE / q1::DOUBLE - r0::DOUBLE / q0::DOUBLE) * q0::DOUBLE")} AS price_effect,
         |       ${round4("(r1::DOUBLE / q1::DOUBLE - r0::DOUBLE / q0::DOUBLE) * (q1 - q0)::DOUBLE")} AS joint_effect
         |FROM s0 JOIN s1 USING (p_brand)""".stripMargin

  // ---- x195 ship-delay percentiles per priority --------------------
  private val x195 =
    raw"""WITH d AS (
         |  SELECT o_orderpriority,
         |         CAST(date_diff('day', CAST(o_orderdate AS DATE),
         |           CAST(l_shipdate AS DATE)) AS BIGINT) AS d
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
         |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
         |       ${round4("quantile_cont(d, 0.5)")} AS p50,
         |       ${round4("quantile_cont(d, 0.9)")} AS p90,
         |       ${round4("quantile_cont(d, 0.99)")} AS p99
         |FROM d GROUP BY 1""".stripMargin

  // ---- x196 return-rate ranking by Wilson lower bound --------------
  private val x196 = {
    val z = TextAnalysis.WilsonZ
    val z2 = z * z
    val p = "(k::DOUBLE / n::DOUBLE)"
    val denom = s"(1.0 + $z2 / n::DOUBLE)"
    val center = s"($p + $z2 / (n::DOUBLE * 2))"
    val half = s"($z * sqrt($p * (1.0 - $p) / n::DOUBLE + $z2 / (n::DOUBLE * n::DOUBLE * 4)))"
    raw"""WITH a AS (
         |  SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS k
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  GROUP BY 1),
         |s AS (
         |  SELECT p_brand, n, k,
         |         ${round4(p)} AS rate,
         |         ${round4(s"($center - $half) / $denom")} AS lo
         |  FROM a)
         |SELECT p_brand, n, k, rate, lo,
         |       CAST(row_number() OVER (ORDER BY lo DESC, p_brand) AS BIGINT) AS rnk
         |FROM s""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "x194_revenue_bridge" -> x194,
    "x195_ship_delay"     -> x195,
    "x196_return_rank"    -> x196,
    "x197_bpe_encode"     -> x197,
    "x198_hybrid_rrf"     -> x198,
    "x199_neardup_ingest" -> x199,
    "x200_ivfpq_recall"   -> x200,
    "x218_pq_rerank"      -> x218,
    "x219_stream_commit"  -> x219,
    "x220_bm25f"          -> x220,
    "x221_delete_vectors" -> x221,
    "x222_post_vacuum"    -> x222,
    "x223_unigram_train"  -> x223,
    "x224_unigram_compare" -> x224,
    "x225_chunk_ndcg"     -> x225,
    "x226_maxscore_audit" -> x226,
    "x227_rm3_expand"     -> x227,
    "x228_change_feed"    -> x228,
    "x229_unigram_ppl"    -> x229,
    "x230_hll_distinct"   -> x230,
    "x231_stream_hll"     -> x231,
    "x232_bitmap_retention" -> x232,
    "x233_ppr"            -> x233,
    "x234_kmv_setops"     -> x234,
    "x235_filtered_ann"   -> x235,
    "x236_proximity_bm25" -> x236,
    "x237_incremental_mv" -> x237,
    "x238_hist_quantiles" -> x238,
    "x239_hll_rollup"     -> x239,
    "x240_asof_tolerance" -> x240,
    "x241_zonemap_skip"   -> x241,
    "x242_image_ahash"    -> x242,
    "x243_image_neardup"  -> x243,
    "x244_blockmax_audit" -> x244,
    // the streamed view must equal the SAME from-scratch v3 aggregate
    // the batch IVM (x237) is audited against — identical oracle
    "x245_stream_mv"      -> x237,
    "x246_beam_frontier"  -> x246,
    "x247_audio_fp"       -> x247,
    "x248_audio_neardup"  -> x248,
    "x249_meta_agg"       -> x249,
    "x250_bloom_skip"     -> x250,
    "x251_video_phash"    -> x251,
    "x252_video_neardup"  -> x252,
    "x253_textrank"       -> x253,
    "x254_heavy_hitters"  -> x254,
    "x255_conformal"      -> x255,
    "x256_incr_index"     -> x256,
    "x257_mann_kendall"   -> x257,
    "x258_stream_heavy"   -> x258,
    "x259_bq_rerank"      -> x259,
    "x260_mondrian"       -> x260,
    "x261_l_diversity"    -> x261,
    "x262_time_travel"    -> x262,
    "x263_optimize"       -> x263,
    "x264_col_rename"     -> x264,
    "x265_conj_skip"      -> x265,
    "x266_opt_zorder"     -> x266,
    "x267_incr_ivf"       -> x267,
    "x268_col_drop"       -> x268,
    "x269_stats_join"     -> x269,
    "x270_mapped_skip"    -> x270,
    "x271_incr_ivf_recall" -> x271,
    "x272_restore"        -> x272,
    "x273_merge_upsert"   -> x273,
    // the stream-maintained index must equal the from-scratch
    // assignment over the v3 corpus — exactly the x267 oracle
    "x275_stream_ivf"     -> x267,
    "x274_append_compact" -> x274,
    "x276_multi_bloom"    -> x276,
    "x277_zorder_ncol"    -> x277,
    "x278_stream_upsert"  -> x278,
    "x279_shallow_clone"  -> x279,
    "x280_type_widen"     -> x280,
    "x281_ivf_drift"      -> x281,
    "x282_check_constraint" -> x282,
    "x283_replace_where"  -> x283,
    "x201_lpa_communities" -> x201,
    "x202_modularity"     -> x202,
    "x203_bpe_compression" -> x203,
    "x204_fusion_eval"    -> x204,
    "x205_ingest_confirm" -> x205,
    "x206_exact_substr"   -> x206,
    "x207_mmr_select"     -> x207,
    "x208_fertility"      -> x208,
    "x209_dup_rate"       -> x209,
    "x210_curriculum_mix" -> x210,
    "x211_embed_outliers" -> x211,
    "x212_corpus_manifest" -> x212,
    "x213_champion_recall" -> x213,
    "x214_graph_ann"      -> x214,
    "x215_graph_ann_recall" -> x215,
    "x216_txn_snapshot"   -> x216,
    "x217_chunk_retrieval" -> x217,
    "x191_top_triples"    -> x191,
    "x192_seasonal_anom"  -> x192,
    "x193_weekly_psi"     -> x193,
    "x188_bootstrap_ci"   -> x188,
    "x189_bot_sessions"   -> x189,
    "x190_ivf_recall"     -> x190,
    "x185_dq_checks"      -> x185,
    "x186_measure_corr"   -> x186,
    "x187_did"            -> x187,
    "x182_ev_follows"     -> x182,
    "x183_vocab_coverage" -> x183,
    "x184_dedup_report"   -> x184,
    "x180_km_survival"    -> x180,
    "x181_sq_audit"       -> x181,
    "x175_item_neighbors" -> x175,
    "x176_attribution"    -> x176,
    "x177_quantile_norm"  -> x177,
    "x178_link_pred"      -> x178,
    "x179_supplier_hhi"   -> x179,
    "x170_acf"            -> x170,
    "x171_transitions"    -> x171,
    "x172_kcore"          -> x172,
    "x173_neyman"         -> x173,
    "x174_label_confusion" -> x174,
    "x165_sorted_neighbor" -> x165,
    "x166_jw_match"       -> x166,
    "x167_rfm"            -> x167,
    "x168_basket_lift"    -> x168,
    "x169_pareto_front"   -> x169,
    "x163_calibration"    -> x163,
    "x164_ess"            -> x164,
    "x161_session_paths"  -> x161,
    "x162_pmi_colloc"     -> x162,
    "x158_partition_prune" -> x158,
    "x159_variant_shred"  -> x159,
    "x160_range_join"     -> x160,
    "x154_native_sessions" -> x154,
    "x155_ab_test"        -> x155,
    "x156_seasonality"    -> x156,
    "x157_conv_latency"   -> x157,
    "x149_oov_rate"       -> x149,
    "x150_heaps_fit"      -> x150,
    "x151_type_lift"      -> x151,
    "x152_cusum"          -> x152,
    "x153_ks_drift"       -> x153,
    "x139_ewma_daily"     -> x139,
    "x140_zipf_slope"     -> x140,
    "x141_mad_outliers"   -> x141,
    "x142_readability"    -> x142,
    "x143_lorenz"         -> x143,
    "x144_rolling_users"  -> x144,
    "x145_url_leakage"    -> x145,
    "x146_norm_dedup"     -> x146,
    "x147_wow_users"      -> x147,
    "x148_benford"        -> x148,
    "x136_src_overlap"    -> x136,
    "x137_quality_ci"     -> x137,
    "x138_psi_drift"      -> x138,
    "x134_bloom_join"     -> x134,
    "x135_dp_counts"      -> x135,
    "x129_chi2_assoc"     -> x129,
    "x130_url_norm"       -> x130,
    "x131_snapshot_diff"  -> x131,
    "x132_heldout_lm"     -> x132,
    "x133_reservoir"      -> x133,
    "x121_concurrency"    -> x121,
    "x122_k_anonymity"    -> x122,
    "x123_quality_pctl"   -> x123,
    "x124_value_bands"    -> x124,
    "x125_gap_fill"       -> x125,
    "x126_grouping_sets"  -> x126,
    "x127_dataset_card"   -> x127,
    "x128_minhash_calib"  -> x128,
    "x99_pii_scrub"       -> x99,
    "x100_span_clean"     -> x100,
    "x101_gopher_rules"   -> x101,
    "x102_c4_lines"       -> x102,
    "x103_mix_weights"    -> x103,
    "x104_stream_ingest"  -> x104,
    "x105_unicode_nfc"    -> x105,
    "x106_mix_sample"     -> x106,
    "x107_clf_score"      -> x107,
    "x108_html_extract"   -> x108,
    "x109_url_stats"      -> x109,
    "x110_script_profile" -> x110,
    "x111_containment"    -> x111,
    "x112_chunks"         -> x112,
    "x113_bucketed_join"  -> x113,
    "x114_knn_graph"      -> x114,
    "x115_dsir_weights"   -> x115,
    "x116_reshard"        -> x116,
    "x117_bpe_train"      -> x117,
    "x118_unimax"         -> x118,
    "x119_compaction"     -> x119,
    "x120_schema_evol"    -> x120,
    "x96_xlsx_source"     -> x96,
    "x98_orc_source"      -> x98,
    "x95_running_totals"  -> x95,
    "x94_triangles"       -> x94,
    "x92_mv_refresh"      -> x92,
    "x93_join_card"       -> x93,
    "x89_normalized"      -> x89,
    "x90_span_dedup"      -> x90,
    "x91_zone_map"        -> x91,
    "x85_zorder_layout"   -> x85,
    "x86_cluster_reps"    -> x86,
    "x87_top_spend"       -> x87,
    "x88_topk_rewrite"    -> x88,
    "x81_star_revenue"    -> x81,
    "x82_token_entropy"   -> x82,
    "x83_merge_upsert"    -> x83,
    "x84_salted_agg"      -> x84,
    "x64_video_meta"      -> x64,
    "x65_hll_by_lang"     -> x65,
    "x66_user_set_ops"    -> x66,
    "x67_hourly_sliding"  -> x67,
    "x68_normalized"      -> x68,
    "x69_correlations"    -> x69,
    "x70_melt_stats"      -> x70,
    "x71_expectations"    -> x71,
    "x72_cube_sales"      -> x72,
    "x73_bpe_pairs"       -> x73,
    "x74_weighted_sample" -> x74,
    "x75_median_filter"   -> x75,
    "x76_tfidf_cosine"    -> x76,
    "x77_frame_energy"    -> x77,
    "x78_split_jsd"       -> x78,
    "x79_transitions"     -> x79,
    "x80_equidepth_hist"  -> x80,
    "x63_audio_meta"      -> x63,
    "x60_token_ids"       -> x60,
    "x61_pack_offsets"    -> x61,
    "x62_domain_cap"      -> x62,
    "x56_stream_enrich"   -> x56,
    "x57_window_suite"    -> x57,
    "x58_profile"         -> x58,
    "x59_pagerank"        -> x59,
    "x53_hourly_pivot"    -> x53,
    "x54_session_funnel"  -> x54,
    "x55_cohort_retention" -> x55,
    "x49_segment_dedup"   -> x49,
    "x50_fuzzy_parts"     -> x50,
    "x51_bm25_search"     -> x51,
    "x52_semantic_dup"    -> x52,
    "x45_asof_join"       -> x45,
    "x46_busy_windows"    -> x46,
    "x47_scd2"            -> x47,
    "x48_rolling_value"   -> x48,
    "x44_rate_anomaly"    -> x44,
    "x42_bloom_filter"    -> x42,
    "x43_bloom_probe"     -> x43,
    "x41_sql_topsupp"     -> x41,
    "x40_quantile_sketch" -> x40,
    "x39_repetition"      -> x39,
    "x37_contamination"   -> x37,
    "x38_lm_score"        -> x38,
    "x36_pack_bins"       -> x36,
    "x35_salted_enrich"   -> x35,
    "x34_stream_attrib"   -> x34,
    "x31_hll_tokens"      -> x31,
    "x32_incremental_new" -> x32,
    "x33_strat_sample"    -> x33,
    "x23_stream_hourly"   -> x23,
    "x24_stream_sessions" -> x24,
    "x25_jaccard_exact"   -> x25,
    "x26_vocab_idf"       -> x26,
    "x27_tfidf_terms"     -> x27,
    "x28_value_quantiles" -> x28,
    "x29_split_assign"    -> x29,
    "x30_dup_clusters"    -> x30,
    // x97 computes the same components as x30 by a different algorithm
    // (star contraction) — the oracle is deliberately the SAME SQL:
    // agreement of both engines AND both algorithms on one answer
    "x97_dup_clusters_star" -> x30,
    "x1_text_stats"      -> x1,
    "x2_lang_id"         -> x2,
    "x3_fingerprints"    -> x3,
    "x4_exact_dedup"     -> x4,
    "x5_minhash_lsh_dup" -> x5,
    "x6_simhash_sig"     -> x6,
    "x7_simhash_pairs"   -> x7,
    "x8_embed_dup_brute" -> x8,
    "x9_embed_dup_lsh"   -> x9,
    "x10_ann_brute"      -> x10,
    "x11_ann_ivf"        -> x11,
    "x12_media_meta"     -> x12,
    "x13_frame_sample"   -> x13,
    "x14_events_parsed"  -> x14,
    "x15_events_hourly"  -> x15,
    "x16_sessions"       -> x16,
    "x17_topk_docs"      -> x17,
    "x18_events_rollup"  -> x18,
    "x19_asof_carry"     -> x19,
    "x20_cms_tokens"     -> x20,
    "x21_top_tokens"     -> x21,
    "x22_label_centroids" -> x22)
}
