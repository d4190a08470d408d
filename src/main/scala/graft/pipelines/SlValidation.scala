package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Relational._
import graft.rules.RuleCascade
import graft.rules.RuleCascade.Rule
import graft.pipelines.SapAnalog._

/** The reference's authoritative SL↔SPK audit (`SL_SPK_Cleansing.py`,
  * SURVEY.md §3 entry point 1), re-expressed as a lazy DataFrame DAG
  * over the SAP analogues in [[SapAnalog]]. Stage numbers refer to the
  * SURVEY.md §3 stage table; verdict strings are the reference's own.
  *
  * Scale design (what survives a 1000-executor / 100 TB run):
  *  - the fact side (eord) is a map-only projection of the lineitem
  *    scan; invalid/OOS filtering composes into scan predicates or
  *    broadcast semi-joins — the big side never shuffles for them;
  *  - `broadcast()` hints mark ONLY the genuinely bounded dims
  *    (garPlants ≈ |nation| rows, mg5Xref = 3 rows, spkXref ≈ a few
  *    distinct vendor ids per 25-plant block). Relations that GROW
  *    with scale factor — marc (|part|×25), mara (|part|), mvke
  *    (|part|), and any slice of the checked fact table — carry NO
  *    hint: AQE broadcasts them while they fit under the threshold
  *    (every test SF here) and falls back to shuffled joins at the
  *    SFs where a forced broadcast would blow the 8 GB limit and
  *    kill the job. PlanSpec pins this invariant;
  *  - the two shuffles in the whole pipeline are (1) the dual-source
  *    window partition on Material/Plant and (2) the merge-back joins
  *    keyed on the unique MPN key, both unavoidable semantically;
  *  - the classification cascades are pure `when`-folds → single
  *    whole-stage-codegen'd projection, zero extra passes.
  */
object SlValidation {

  val ApexSentinel =
    "Cty Buy via Apex, check sheet 'SKU via Apex SPK' for more details"
  val IntraSentinel =
    "CN,JP Intra-company SL, check sheet 'CN_JP_Intra' for more details"
  val SwisscoComment =
    "Ok,buy from 9000341 (Swissco),FIN review in Year end"

  // ---- stage 4: invalid SL (F1 filters, U1 union, U2 dedup) --------
  /** `get_invalid_SL` (`SL_SPK_Cleansing.py:84-91`): expired ∪ blocked,
    * dedup by the unique MPN key. MPN is unique per EORD row (the
    * reference's Material/Plant/Number key identifies one source-list
    * row; the analog generator disambiguates by suppkey,
    * `SapAnalog.scala:54-57`), so concat-then-drop_duplicates is
    * EXACTLY a disjunctive filter: the only cross-branch duplicates
    * are rows satisfying both predicates. Expressed that way it is
    * map-only — the r4 ledger showed the union+dedup shuffling 33 MB /
    * 824k full-width rows for zero semantic effect. */
  def invalidSl(eord: DataFrame, runDate: String = RunDate): DataFrame =
    eord.filter(col("valid_to") < lit(runDate).cast("timestamp") ||
      col("blocked") === "X")

  // ---- stage 5: out-of-scope plants (F2 semi-join) -----------------
  /** `get_plants_OOS` (`SL_SPK_Cleansing.py:94-98`): fact rows whose
    * plant is flagged out of scope in GAR_Plants. */
  def plantsOos(eord: DataFrame, gar: DataFrame): DataFrame =
    semiJoin(eord, broadcast(gar.filter(col("spk_sl_project") === "No")), Seq("plant"))

  // ---- stage 6: valid SL (F3 anti-join) ----------------------------
  /** `get_valid_SL` (`SL_SPK_Cleansing.py:105-109`). The reference
    * dedups the removal list before subtracting; a left-anti join is
    * insensitive to right-side duplicates, so the dedup shuffle is
    * dropped and the right side pruned to the bare join key — a
    * single-column fraction of the fact table that AQE broadcasts at
    * any SF where it fits (no hint: it scales with the fact). */
  def validSl(eord: DataFrame, invalid: DataFrame, oos: DataFrame): DataFrame =
    antiJoin(eord,
      invalid.select(col("mpn")).unionByName(oos.select(col("mpn"))), Seq("mpn"))

  // ---- stage 7: enrichment (J1 broadcast joins + overrides) --------
  /** `map_valid_SL_SPK_Xref` (`SL_SPK_Cleansing.py:111-123`): pull
    * plant status/SPK from MARC, vendor→SPK from the xref, country
    * from GAR; then the external-vendor ('1…' → '20') and Swissco
    * overrides — Swissco also presets the Comment. */
  def enrich(valid: DataFrame, marc: DataFrame, xref: DataFrame,
             gar: DataFrame): DataFrame =
    valid
      // no hint: marc is |part|×25 — AQE picks broadcast vs shuffle by size
      .join(marc.select(col("mp"), col("plant_status"), col("plant_spk")),
            Seq("mp"), "left")
      .join(broadcast(xref), Seq("vendor"), "left")
      .join(broadcast(gar.select(col("plant"), col("country"))), Seq("plant"), "left")
      .withColumn("vendor_to_spk",
        when(col("vendor").startsWith("1"), lit("20"))
          .when(col("vendor") === "9000341", lit(SwisscoComment))
          .otherwise(col("vendor_to_spk")))
      .withColumn("comment",
        when(col("vendor") === "9000341", lit(SwisscoComment))
          .otherwise(lit(null).cast("string")))

  // ---- stage 8: main rules I (U3 window + cascade) -----------------
  /** `check_valid_SL_SPK_Xref` (`SL_SPK_Cleansing.py:125-136`):
    * dual-source marking (unguarded overwrite), cancelled SKU
    * (unguarded), Apex sentinel (guarded). */
  def mainRulesI(enriched: DataFrame): DataFrame =
    RuleCascade(markDupGroups(enriched, Seq("mp"), "is_dual"), "comment", Seq(
      Rule(col("is_dual"), "MDO action, check dual sources"),
      Rule(col("plant_status") === "70" || col("plant_status") === "80",
           "MDO action,SKU cancelled in Plant,why SL still exist?"),
      Rule(col("vendor") === "9000340" && col("comment").isNull, ApexSentinel)
    )).drop("is_dual")

  // ---- stages 9-10: Apex sub-pipeline (J2/J3 + 8-rule cascade) -----
  /** `get_buy_via_Apex` (`SL_SPK_Cleansing.py:139-160`): sentinel rows
    * joined back to the hub-plant slices of MARC and of the checked
    * sheet itself (self-join — aliased projections keep lineage
    * unambiguous), then MVKE⋈MG5. */
  def buyViaApex(checked: DataFrame, marc: DataFrame, mvke: DataFrame,
                 mg5: DataFrame): DataFrame = {
    val ctyViaApex = checked.filter(col("comment") === ApexSentinel)
      .withColumn("material_hub", concat(col("material"), lit(s"/$HubPlant")))
    val marcHub = marc.filter(col("plant") === HubPlant)
      .select(col("mp").as("material_hub"),
              col("plant_status").as("hub_status"),
              col("plant_spk").as("hub_spk"))
    val eordHub = checked.filter(col("plant") === HubPlant)
      .select(col("mp").as("material_hub"), col("vendor").as("vendor_in_hub"))
    val mvkeMg5 = mvke.join(broadcast(mg5), Seq("default_plant"), "left")
      .select(col("material"), col("default_plant"), col("apex_mg5_spk"))
    // no hints: marcHub/mvkeMg5 scale with |part| and eordHub is a
    // slice of the checked FACT table — forcing any of them broadcast
    // would fail outright at large SF (8 GB broadcast limit)
    ctyViaApex
      .join(marcHub, Seq("material_hub"), "left")
      .join(eordHub, Seq("material_hub"), "left")
      .join(mvkeMg5, Seq("material"), "left")
      .drop("material_hub")
  }

  /** `check_buy_via_Apex` (`SL_SPK_Cleansing.py:163-204`): the 7-rule
    * Apex scenario cascade + catch-all, all keyed on the sentinel
    * (if/elif encoded through the sentinel comment value). */
  def apexRules(apex: DataFrame): DataFrame = {
    val sentinel = col("comment") === ApexSentinel
    val hubNonEcc = col("vendor_in_hub").startsWith("1") ||
                    col("vendor_in_hub") === "9000033"
    RuleCascade(apex, "comment", Seq(
      Rule(hubNonEcc && col("plant_spk") === "5S" && sentinel,
           "Ok, Buy via Apex via Temse or 3rd party"),
      Rule(hubNonEcc && !(col("plant_spk") === "5S") && sentinel,
           "MDO action, Apex buy from Non-ECC vendor but country SPK is not 5S"),
      Rule(sentinel && col("vendor_in_hub").isNull &&
             (col("hub_status") === "80" || col("hub_status") === "70") &&
             col("default_plant") === "300",
           "MDO action,check with planner if still required to buy via Apex as Apex already cancelled this SKU"),
      Rule(sentinel && col("vendor_in_hub").isNull && col("default_plant") === "300",
           "MDO action,check with Apex MDO Apex SL missing but MG5=300"),
      Rule(col("plant_spk") === col("apex_mg5_spk") && sentinel,
           "Ok, Cty SPK match with Apex MG5"),
      Rule(sentinel && col("default_plant").isNull,
           "MDO action,check with Apex MDO as SKU not extended under 3000/20"),
      Rule(sentinel && col("apex_mg5_spk").isNull,
           "MDO action,check with Apex MDO as 3000/20 MG5 not in scope"),
      Rule(sentinel,
           "MDO action,Cty SPK mistmatch with Apex MG5, pls check with Apex MDO on what is the actual source or if it exists in exceptional table")
    ))
  }

  // ---- stages 12-14: IntraCo CN/JP (F2 ×2, E3 substring key, J4) ---
  /** `get_Intraco_CN_JP` (`SL_SPK_Cleansing.py:207-231`): in-scope
    * CN/JP plants buying from CN/JP intra-company vendors, main-plant
    * status looked up via the plant id embedded in the vendor id
    * (`Vendor[3:]`). */
  def intraCnJp(checked: DataFrame, gar: DataFrame, marc: DataFrame): DataFrame = {
    def slice(salesOrg: String): DataFrame =
      gar.filter(col("spk_sl_project") === "Yes" && col("sales_org") === salesOrg)
    def pick(so: String): DataFrame = {
      val plants = broadcast(slice(so))
      semiJoin(
        semiJoin(checked.filter(col("comment").isNull), plants, Seq("plant")),
        plants.select(col("vendor")), Seq("vendor"))
    }
    val intra = pick("3405").unionByName(pick("3900"))
      .withColumn("mp_main",
        concat_ws("/", col("material"),
                  substring(col("vendor"), 4, 10).cast("long")))
    intra.join(
      marc.select(col("mp").as("mp_main"), // no hint: |part|×25-scaling
                  col("plant_status").as("interco_status"),
                  col("plant_spk").as("interco_spk")),
      Seq("mp_main"), "left").drop("mp_main")
  }

  /** `check_Intraco_CN_JP` (`SL_SPK_Cleansing.py:233-247`): 3-rule
    * cascade (match / main-plant-obsolete / mismatch). */
  def intraRules(intra: DataFrame): DataFrame =
    RuleCascade(intra, "comment", Seq(
      Rule(col("plant_spk") === col("interco_spk"),
           "Ok, InterCo Sub Plant SPK match Main Plant SPK"),
      Rule(col("comment").isNull && col("interco_status").isNull,
           "MDO action, InterCo Main Plant obsolete,but Sub plant still active,can discon in Sub Plant?"),
      Rule(col("comment").isNull,
           "MDO action, InterCo Sub plant and Main plant SPK mismatch")
    ))

  // ---- stage 11: active SKU missing SL (F2, F4, F3) ----------------
  /** `get_plants_IS` + MARA type filter + `get_active_SKU_no_SL`
    * (`SL_SPK_Cleansing.py:100-104,249-253,278-282`). */
  def missingSl(marc: DataFrame, gar: DataFrame, mara: DataFrame,
                valid: DataFrame): DataFrame = {
    val inScope = semiJoin(marc,
      broadcast(gar.filter(col("spk_sl_project") === "Yes")), Seq("plant"))
      .join(mara.select(col("material"), col("material_type")), // |part|-scaling
            Seq("material"), "left")
      .filter(col("material_type").isin("FERT", "HAWA", "ZICP"))
    antiJoin(inScope.filter(col("plant_status") === "50"), valid, Seq("mp"))
  }

  // ---- stages 13, 15, 16: flag + main rules II + merge-back --------
  /** Stage 13 (`SL_SPK_Cleansing.py:286`): mark the main-sheet rows
    * that went to the IntraCo sheet (membership by MPN — semi-join
    * shaped, expressed as a broadcast left join marker so the flag can
    * sit inside the cascade), then main rules II
    * (`SL_SPK_Cleansing.py:291-303`) and the Comment merge-back +
    * Analysis coalesce (`SL_SPK_Cleansing.py:305-319`, J7 + L1). */
  def mainFinal(checked: DataFrame, intraChecked: DataFrame,
                apexChecked: DataFrame): DataFrame = {
    // intraKeys is a fact-table slice — no broadcast hint (AQE decides)
    val intraKeys = intraChecked.select(col("mpn")).distinct()
      .withColumn("is_intra", lit(1))
    val flagged = RuleCascade(
      checked.join(intraKeys, Seq("mpn"), "left"), "comment", Seq(
        Rule(col("is_intra") === 1, IntraSentinel),
        Rule(col("plant_spk") === col("vendor_to_spk") && col("comment").isNull,
             "Ok, SPK match SL"),
        Rule(col("plant_spk") === "TW" && col("comment").isNull,
             "Ok, FIN will conduct yearly check for TW"),
        Rule(col("comment").isNull, "MDO action, SPK mismatch SL")
      )).drop("is_intra")
    val apexC  = apexChecked.select(col("mpn"), col("comment").as("comment_apex"))
    val intraC = intraChecked.select(col("mpn"), col("comment").as("comment_intra"))
    flagged
      .join(apexC, Seq("mpn"), "left")
      .join(intraC, Seq("mpn"), "left")
      .withColumn("analysis",
        when(col("comment") === ApexSentinel, col("comment_apex"))
          .when(col("comment") === IntraSentinel, col("comment_intra"))
          .otherwise(col("comment")))
      .drop("comment_apex", "comment_intra")
  }

  // ---- composed endpoints (what SparkEntry exposes) ----------------
  //
  // Fan-out caching (SURVEY.md §4.2): the enriched+checked main sheet
  // feeds Apex (J2), IntraCo (J4), missing-SL and the merge-back (J7)
  // — without persist Spark recomputes the 3-join enrichment once per
  // branch (measured 4× cost at sf0.1). `persist()` registers the
  // canonical plan with the CacheManager, so every query that builds
  // the same subplan — within one DAG or across Verify's separate
  // actions — reuses the one materialization. Storage is
  // MEMORY_AND_DISK and dimension-sized; eviction is LRU.
  //
  // CONSTRUCTION memoization (round 7): the composed frames are also
  // memoized per (session, dir). Without this, every invocation of a
  // parity query REBUILDS the full composed tree and re-calls
  // persist() on each already-cached stage — and each such call
  // re-canonicalizes a ~40-operator plan against every CacheManager
  // entry. The r7 ledger put j7's warm wall at 3.4 s with only 1.25 s
  // of tracked action time and 44 ms of tracked Catalyst phases: the
  // missing ~2 s was exactly this repeated construction. Memoized,
  // later calls return the SAME DataFrame object — no re-analysis, no
  // cache-lookup walk. [[clearMemos]] drops the entries so the
  // bounded-residency eviction protocol (Bench/QTime pass boundaries)
  // can rebuild-and-re-persist cleanly.

  private val qMemo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, String), DataFrame]
  private def memoized(key: String, spark: SparkSession, dir: String)
                      (build: => DataFrame): DataFrame =
    qMemo.getOrElseUpdate((spark, dir, key), build)

  /** Drop this session's memoized composed frames AND unpersist them
    * — the memo holds the only handle to the persisted stages, so
    * removal without unpersist would leak the cached parity frames
    * for the session's lifetime (round-7 review finding; harness
    * callers also clearCache(), but the clearMemos contract must
    * stand alone for embedders). Every memoized frame is persisted
    * as of round 8 (finals included), so each unpersist is live. */
  def clearMemos(session: SparkSession): Unit =
    qMemo.keys.filter(_._1 eq session).foreach { k =>
      qMemo.remove(k).foreach(_.unpersist(blocking = false))
    }

  // Round 8: the FINAL frames (and the leaf transforms below) are
  // persisted too — they were the only parity stages left recomputing
  // per repeated action (j7 1.3 s / r10 2.0 s / a1 1.3 s warm in the
  // r8 ledger while every persisted stage replayed in ~0.1 s); all
  // are sheet-sized (tens of k rows), so the residency cost is noise.
  // eordT's persisted scan also serves validSl/invalidSl/plantsOos
  // via CacheManager plan-matching (they build the identical eord
  // subplan).

  def eordT(spark: SparkSession, dir: String): DataFrame =
    memoized("eordT", spark, dir) { eord(spark, dir).persist() }

  def invalidSlQ(spark: SparkSession, dir: String): DataFrame =
    memoized("invalidSl", spark, dir) {
      invalidSl(eordT(spark, dir)).persist()
    }

  def plantsOosQ(spark: SparkSession, dir: String): DataFrame =
    memoized("plantsOos", spark, dir) {
      plantsOos(eordT(spark, dir), garPlants(spark, dir)).persist()
    }

  def validSlQ(spark: SparkSession, dir: String): DataFrame =
    memoized("validSl", spark, dir) {
      val e = eordT(spark, dir)
      validSl(e, invalidSl(e), plantsOos(e, garPlants(spark, dir))).persist()
    }

  def enrichedQ(spark: SparkSession, dir: String): DataFrame =
    memoized("enriched", spark, dir) {
      enrich(validSlQ(spark, dir), marc(spark, dir), spkXref(spark, dir),
             garPlants(spark, dir)).persist()
    }

  def mainCheckedQ(spark: SparkSession, dir: String): DataFrame =
    memoized("mainChecked", spark, dir) {
      mainRulesI(enrichedQ(spark, dir)).persist()
    }

  def apexCheckedQ(spark: SparkSession, dir: String): DataFrame =
    memoized("apexChecked", spark, dir) {
      apexRules(buyViaApex(mainCheckedQ(spark, dir), marc(spark, dir),
                           mvke(spark, dir), mg5Xref(spark, dir))).persist()
    }

  def intraCheckedQ(spark: SparkSession, dir: String): DataFrame =
    memoized("intraChecked", spark, dir) {
      intraRules(intraCnJp(mainCheckedQ(spark, dir), garPlants(spark, dir),
                           marc(spark, dir))).persist()
    }

  def missingSlQ(spark: SparkSession, dir: String): DataFrame =
    memoized("missingSl", spark, dir) {
      missingSl(marc(spark, dir), garPlants(spark, dir), mara(spark, dir),
                validSlQ(spark, dir)).persist()
    }

  def mainFinalQ(spark: SparkSession, dir: String): DataFrame =
    memoized("mainFinal", spark, dir) {
      mainFinal(mainCheckedQ(spark, dir), intraCheckedQ(spark, dir),
                apexCheckedQ(spark, dir)).persist()
    }
}
