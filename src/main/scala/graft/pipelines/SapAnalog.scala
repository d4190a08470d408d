package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Deterministic SAP-table analogues over the driver's TPC-H fixtures.
  *
  * The reference pipelines (`SL_SPK_Cleansing.py`, `Status_Cleansing.py`)
  * run on eight SAP extracts (EORD/MARC/MARA/MVKE/MB52/GAR_Plants/
  * SPK_Xref/MG5_Xref — schemas in FIXTURES.md §A). The driver fixtures
  * are TPC-H-ish, so each SAP table is *derived* here from the fixture
  * tables with pure deterministic expressions (FIXTURES.md §C mapping).
  * Every derivation is also expressible in ANSI SQL — `AnalogSql`
  * carries the matching DuckDB CTE for the oracle — so the whole parity
  * surface stays hash-checkable end to end.
  *
  * Identifier scheme (all modular in the scaling keys, so the same
  * logic works at every scale factor):
  *  - Material ↔ l_partkey; Plant ↔ l_orderkey % 25 (matches
  *    n_nationkey); Number ↔ "orderkey-linenumber" (unique).
  *  - Vendor ↔ derived from l_suppkey % 10: class 1 → external vendor
  *    "1…" (ref: vendors starting with '1', `SL_SPK_Cleansing.py:119`),
  *    6 → Apex '9000340' (:134), 9 → Swissco '9000341' (:120),
  *    3 → Temse '9000033' (:166), rest → intra-company vendor
  *    '900'+plant, embedding its main plant like the reference's
  *    `Vendor[3:]` (:226).
  *  - Hub plant 3090 ↔ plant 4.
  *  - Sales orgs: region 2 → '3405' (China), region 3 → '3900'
  *    (Japan) (`SL_SPK_Cleansing.py:209,212`).
  *  - scope flags: `SPK SL Project` = 'No' for region-0 plants;
  *    `Status Cleansing Project` = 'No' for region-4 plants.
  *
  * Scale: eord/mb52 are map-only projections of the 100 TB fact scan
  * (no join, no shuffle); marc is part × 25 nations (a generated
  * dimension, still dimension-sized); the rest are genuine small dims.
  */
object SapAnalog {

  /** Analogue of the Apex hub plant '3090'. */
  val HubPlant = 4
  /** Injected run date (ref: `datetime.now()`, `SL_SPK_Cleansing.py:8`). */
  val RunDate = "1997-06-01"

  private def mpCol(material: Column, plant: Column): Column =
    concat_ws("/", material, plant)

  /** EORD — source list fact. Map-only over lineitem. */
  def eord(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val material = col("l_partkey")
    val plant    = col("l_orderkey") % 25
    // suppkey disambiguates synthetic (orderkey, linenumber) collisions so
    // the MPN row key is unique (mirrors the reference, where the
    // Material/Plant/Number key identifies one EORD row).
    val number   = concat_ws("-", col("l_orderkey"), col("l_linenumber"), col("l_suppkey"))
    val vendor   = (col("l_suppkey") % 10) match { case vclass =>
      when(vclass === 1, concat(lit("1"), lpad(col("l_suppkey").cast("string"), 6, "0")))
        .when(vclass === 6, lit("9000340"))
        .when(vclass === 9, lit("9000341"))
        .when(vclass === 3, lit("9000033"))
        .otherwise(concat(lit("900"), lpad((col("l_suppkey") % 25).cast("string"), 2, "0")))
    }
    li.select(
      material.as("material"),
      plant.as("plant"),
      number.as("number"),
      vendor.as("vendor"),
      col("l_shipdate").as("valid_to"),
      when(col("l_returnflag") === "R", lit("X")).as("blocked"),
      mpCol(material, plant).as("mp"),
      concat_ws("/", material, plant, number).as("mpn"))
  }

  /** GAR_Plants — plant dimension with sales org, country, intra-co
    * vendor id, and the two project scope flags. From nation ⋈ region. */
  def garPlants(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    n.join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select(
        col("n_nationkey").cast("long").as("plant"),
        when(col("n_regionkey") === 2, lit("3405"))
          .when(col("n_regionkey") === 3, lit("3900"))
          .otherwise(concat(lit("3"), col("n_regionkey").cast("string"), lit("00")))
          .as("sales_org"),
        col("n_name").as("country"),
        concat(lit("900"), lpad(col("n_nationkey").cast("string"), 2, "0")).as("vendor"),
        when(col("n_regionkey") === 0, lit("No")).otherwise(lit("Yes")).as("spk_sl_project"),
        when(col("n_regionkey") === 4, lit("No")).otherwise(lit("Yes")).as("status_cleansing_project"))
  }

  /** MARC — plant-level material master: part × nation with derived
    * status/SPK. Rows with null status are dropped, mirroring the
    * reference's notna() row-drop (`SL_SPK_Cleansing.py:64`); the
    * float→int→string status normalization (P2) is kept literally. */
  def marc(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir).select(col("p_partkey"))
    val n = Tables.nation(spark, dir).select(col("n_nationkey"))
    val statMod = (col("p_partkey") * 7 + col("n_nationkey") * 13) % 12
    val statF = when(statMod === 0, lit(70.0)).when(statMod === 1, lit(80.0))
      .when(statMod === 2, lit(41.0)).when(statMod === 11, lit(null).cast("double"))
      .otherwise(lit(50.0))
    val spkMod = (col("p_partkey") * 3 + col("n_nationkey")) % 10
    val spk = when(spkMod === 0, lit("5S")).when(spkMod === 1, lit("TW"))
      .otherwise(concat(spkMod.cast("string"), lit("0")))
    p.crossJoin(broadcast(n))
      .select(
        col("p_partkey").as("material"),
        col("n_nationkey").cast("long").as("plant"),
        mpCol(col("p_partkey"), col("n_nationkey")).as("mp"),
        statF.cast("long").cast("string").as("plant_status"),
        spk.as("plant_spk"))
      .filter(col("plant_status").isNotNull)
      // the largest derived dimension (|part|·|nation| rows), consumed
      // by six queries — persist so the generator runs once per session
      .persist()
  }

  /** MARA — cross-plant material master. Materials with
    * p_partkey % 7 == 6 have no MARA row (drives the raw-material
    * out-of-scope rule, `Status_Cleansing.py:112`). */
  def mara(spark: SparkSession, dir: String): DataFrame = {
    val tMod = col("p_partkey") % 5
    val xMod = (col("p_partkey") * 11 + 3) % 12
    val xStat = when(xMod === 0, lit(70.0)).when(xMod === 1, lit(80.0))
      .when(xMod === 2, lit(41.0)).otherwise(lit(50.0))
    Tables.part(spark, dir)
      .filter(col("p_partkey") % 7 =!= 6)
      .select(
        col("p_partkey").as("material"),
        when(tMod === 0, lit("FERT")).when(tMod === 1, lit("HAWA"))
          .when(tMod === 2, lit("ZICP")).when(tMod === 3, lit("ROH"))
          .otherwise(lit("VERP")).as("material_type"),
        xStat.cast("long").cast("string").as("xplant_status"))
  }

  /** SPK_Xref — vendor → SPK mapping; a pure function of the vendor id
    * string so the dedup to one row per vendor is deterministic. */
  def spkXref(spark: SparkSession, dir: String): DataFrame = {
    val vclass = col("s_suppkey") % 10
    val vendor = when(vclass === 1, concat(lit("1"), lpad(col("s_suppkey").cast("string"), 6, "0")))
      .when(vclass === 6, lit("9000340"))
      .when(vclass === 9, lit("9000341"))
      .when(vclass === 3, lit("9000033"))
      .otherwise(concat(lit("900"), lpad((col("s_suppkey") % 25).cast("string"), 2, "0")))
    Tables.supplier(spark, dir)
      .select(vendor.as("vendor")).distinct()
      .withColumn("vendor_to_spk",
        concat((substring(col("vendor"), 2, 10).cast("long") % 8 + 2).cast("string"), lit("0")))
  }

  /** MVKE (hub sales-org data): material → Default Plant. Materials
    * with p_partkey % 3 == 2 are not extended at the hub (null join →
    * Apex rule 6). */
  def mvke(spark: SparkSession, dir: String): DataFrame = {
    val dMod = col("p_partkey") % 4
    Tables.part(spark, dir)
      .filter(col("p_partkey") % 3 =!= 2)
      .select(
        col("p_partkey").as("material"),
        when(dMod === 0, lit("300")).when(dMod === 1, lit("310"))
          .when(dMod === 2, lit("320")).otherwise(lit("330")).as("default_plant"))
  }

  /** MG5_Xref — Default Plant → Apex MG5 SPK; '330' deliberately
    * missing (drives Apex rule 7, `SL_SPK_Cleansing.py:196-198`). */
  def mg5Xref(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Seq(("300", "50"), ("310", "5S"), ("320", "20"))
      .toDF("default_plant", "apex_mg5_spk")
  }

  /** MB52 — warehouse stock: map-only over lineitem ('F' slice).
    * floor() before the long cast because Spark truncates double→long
    * while DuckDB rounds — floor makes both exact. */
  def mb52(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).filter(col("l_linestatus") === "F")
    val material = col("l_partkey")
    val plant    = col("l_orderkey") % 25
    li.select(
      material.as("material"),
      plant.as("plant"),
      mpCol(material, plant).as("mp"),
      floor(col("l_quantity")).cast("long").as("unrestricted"),
      floor(col("l_extendedprice") / 100).cast("long").as("in_quality_insp"),
      col("l_linenumber").cast("long").as("blocked_qty"))
  }
}
