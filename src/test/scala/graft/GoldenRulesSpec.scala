package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipelines.{SlValidation, StatusCleansing}
import graft.pipelines.SlValidation._

/** Golden micro-fixtures (SURVEY.md §5.4): literal rows exercising
  * every branch of the three rule cascades, asserting the exact
  * reference verdict per row (verdict strings from
  * `SL_SPK_Cleansing.py:163-303`, `Status_Cleansing.py:112-161`).
  * The hub plant is [[graft.pipelines.SapAnalog.HubPlant]] (= 4). */
class GoldenRulesSpec extends SparkSpec {
  import spark.implicits._

  // ---- Apex cascade: all 8 branches --------------------------------

  test("apex cascade: each of the 7 rules + catch-all fires on its scenario") {
    // one material per scenario; hub rows (plant=4) provide vendor_in_hub
    def checkedRow(mat: Long, plant: Long, vendor: String, comment: Option[String],
                   plantSpk: String) =
      (mat, plant, vendor, comment, plantSpk, s"$mat/$plant")
    val checked = Seq(
      // r1: hub vendor non-ECC ('1…') + cty spk 5S
      checkedRow(1, 10, "9000340", Some(ApexSentinel), "5S"),
      checkedRow(1, 4, "1000077", None, "40"), // hub row → vendor_in_hub
      // r2: hub vendor Temse (9000033) + cty spk NOT 5S
      checkedRow(2, 10, "9000340", Some(ApexSentinel), "40"),
      checkedRow(2, 4, "9000033", None, "40"),
      // r3: no hub SL + hub cancelled (70) + MG5 default plant 300
      checkedRow(3, 10, "9000340", Some(ApexSentinel), "40"),
      // r4: no hub SL + hub active + MG5 300
      checkedRow(4, 10, "9000340", Some(ApexSentinel), "40"),
      // r5: cty spk == apex MG5 spk (hub SL exists with ECC vendor so
      // rules 1-4 skip: r1/r2 need a non-ECC hub vendor, r3/r4 need a
      // missing hub SL)
      checkedRow(5, 10, "9000340", Some(ApexSentinel), "50"),
      checkedRow(5, 4, "9000340", None, "40"),
      // r6: not extended at hub (no MVKE row → default_plant null)
      checkedRow(6, 10, "9000340", Some(ApexSentinel), "40"),
      // r7: MVKE row but its default plant missing from MG5 xref
      checkedRow(7, 10, "9000340", Some(ApexSentinel), "40"),
      // r8: everything resolves but spk mismatches MG5 → catch-all
      checkedRow(8, 10, "9000340", Some(ApexSentinel), "99"),
      checkedRow(8, 4, "9000340", None, "40")
    ).toDF("material", "plant", "vendor", "comment", "plant_spk", "mp")
    val marc = Seq(
      (3L, 4L, "3/4", "70", "40"), // hub cancelled for r3
      (4L, 4L, "4/4", "50", "40"), // hub active for r4
      (5L, 4L, "5/4", "50", "40"),
      (8L, 4L, "8/4", "50", "40")
    ).toDF("material", "plant", "mp", "plant_status", "plant_spk")
    val mvke = Seq(
      (1L, "300"), (2L, "300"), (3L, "300"), (4L, "300"),
      (5L, "300"), (7L, "330"), (8L, "300") // 6 absent; 7 → unmapped plant
    ).toDF("material", "default_plant")
    val mg5 = Seq(("300", "50")).toDF("default_plant", "apex_mg5_spk")

    val out = apexRules(buyViaApex(checked, marc, mvke, mg5))
      .select("material", "comment").as[(Long, String)].collect().toMap
    assert(out(1L) === "Ok, Buy via Apex via Temse or 3rd party")
    assert(out(2L) === "MDO action, Apex buy from Non-ECC vendor but country SPK is not 5S")
    assert(out(3L) === "MDO action,check with planner if still required to buy via Apex as Apex already cancelled this SKU")
    assert(out(4L) === "MDO action,check with Apex MDO Apex SL missing but MG5=300")
    assert(out(5L) === "Ok, Cty SPK match with Apex MG5")
    assert(out(6L) === "MDO action,check with Apex MDO as SKU not extended under 3000/20")
    assert(out(7L) === "MDO action,check with Apex MDO as 3000/20 MG5 not in scope")
    assert(out(8L) === "MDO action,Cty SPK mistmatch with Apex MG5, pls check with Apex MDO on what is the actual source or if it exists in exceptional table")
  }

  // ---- IntraCo cascade: 3 branches ---------------------------------

  test("intraco cascade: match / main-plant-obsolete / mismatch") {
    // CN scope: plants 11,12,13 with intra-co vendors 90011/90012/90013
    val gar = Seq(
      (11L, "3405", "90011", "Yes"), (12L, "3405", "90012", "Yes"),
      (13L, "3405", "90013", "Yes"))
      .toDF("plant", "sales_org", "vendor", "spk_sl_project")
    val checked = Seq(
      // buys from main plant 11 (vendor 90011 → substr(4) = "11")
      (1L, 12L, "90011", None: Option[String], "40", "1/12", "1/12/a"),
      // main plant has no MARC row → obsolete
      (2L, 12L, "90013", None: Option[String], "40", "2/12", "2/12/b"),
      // spk mismatch vs main plant
      (3L, 12L, "90011", None: Option[String], "77", "3/12", "3/12/c")
    ).toDF("material", "plant", "vendor", "comment", "plant_spk", "mp", "mpn")
    val marc = Seq(
      (1L, 11L, "1/11", "50", "40"),
      (3L, 11L, "3/11", "50", "40"))
      .toDF("material", "plant", "mp", "plant_status", "plant_spk")

    val out = intraRules(intraCnJp(checked, gar, marc))
      .select("material", "comment").as[(Long, String)].collect().toMap
    assert(out(1L) === "Ok, InterCo Sub Plant SPK match Main Plant SPK")
    assert(out(2L) === "MDO action, InterCo Main Plant obsolete,but Sub plant still active,can discon in Sub Plant?")
    assert(out(3L) === "MDO action, InterCo Sub plant and Main plant SPK mismatch")
  }

  // ---- Status cascade: all 10 branches -----------------------------

  test("status cascade: each of the 10 rules fires on its scenario") {
    val gar = Seq((20L, "Yes")).toDF("plant", "status_cleansing_project")
    // (material, plant_status) per scenario; xplant via mara; inventory via mb52
    val marc = Seq(
      (1L, "50"),  // r1: no MARA row → raw material OOS
      (2L, "50"),  // r2: local == x-plant (50/50)
      (3L, "50"),  // r3: x-plant 80 + inventory
      (4L, "80"),  // r4: local 80 + inventory (x-plant 50)
      (5L, "80"),  // r5: local 80, no inventory (x-plant 50)
      (6L, "70"),  // r6: x-plant 80, local not 80 (no inventory)
      (7L, "70"),  // r7: local 70, no inventory
      (8L, "70"),  // r8: local 70 + inventory
      (9L, "41"),  // r9: clinical trial
      (10L, "60")  // r10: catch-all misalignment
    ).map { case (m, st) => (m, 20L, s"$m/20", st, "40") }
      .toDF("material", "plant", "mp", "plant_status", "plant_spk")
    val mara = Seq(
      (2L, "FERT", "50"), (3L, "FERT", "80"), (4L, "FERT", "50"),
      (5L, "FERT", "50"), (6L, "FERT", "80"), (7L, "FERT", "50"),
      (8L, "FERT", "50"), (9L, "FERT", "50"), (10L, "FERT", "50"))
      .toDF("material", "material_type", "xplant_status")
    val mb52 = Seq((3L, 20L), (4L, 20L), (8L, 20L))
      .map { case (m, p) => (m, p, s"$m/$p", 5L, 1L, 0L) }
      .toDF("material", "plant", "mp", "unrestricted", "in_quality_insp", "blocked_qty")
    val mb52g = StatusCleansing.mb52Groupby(StatusCleansing.mb52Valid(mb52, gar))

    val out = StatusCleansing.marcChecked(marc, mara, mb52g, gar)
      .select("material", "comment").as[(Long, String)].collect().toMap
    assert(out(1L) === "Ok,raw materials out of scope")
    assert(out(2L) === "Ok,local plant status match with X-plant status")
    assert(out(3L) === "MDO action, check with planner why X-plant 80 but have inventory")
    assert(out(4L) === "MDO action, check with planner why local plant 80 but have inventory")
    assert(out(5L) === "Ok, SKU cancelled locally and no inventory")
    assert(out(6L) === "MDO action, check with planner why Enterprise inactive but local still active")
    assert(out(7L) === "MDO action, check with planner if could cancel the SKU in plant as no existing inventory")
    assert(out(8L) === "Ok, Status 70 awaiting existing inventory clearance")
    assert(out(9L) === "Ok, Clinical trial")
    assert(out(10L) === "MDO action, check with planner as misalignment in X-plant and local plant status")
  }

  // ---- Main-sheet rules I + II and merge-back ----------------------

  test("main rules: dual-source, cancelled SKU, swissco, TW, match, mismatch, analysis coalesce") {
    val enriched = Seq(
      // dual source pair on mp 1/10
      (1L, 10L, "100001", "1/10", "1/10/a", "50", "40", "20", None: Option[String]),
      (1L, 10L, "100002", "1/10", "1/10/b", "50", "40", "20", None: Option[String]),
      // cancelled in plant (70) — overwrites nothing here but fires rule 2
      (2L, 10L, "100001", "2/10", "2/10/a", "70", "40", "20", None: Option[String]),
      // apex sentinel (vendor 9000340, no prior comment)
      (3L, 10L, "9000340", "3/10", "3/10/a", "50", "40", "20", None: Option[String]),
      // swissco preset comment survives (guarded rules skip it)
      (4L, 10L, "9000341", "4/10", "4/10/a", "50", "40", SwisscoComment, Some(SwisscoComment)),
      // spk == vendor spk → Ok
      (5L, 10L, "100001", "5/10", "5/10/a", "50", "20", "20", None: Option[String]),
      // TW spk → FIN yearly check
      (6L, 10L, "100001", "6/10", "6/10/a", "50", "TW", "20", None: Option[String]),
      // plain mismatch → catch-all
      (7L, 10L, "100001", "7/10", "7/10/a", "50", "40", "20", None: Option[String])
    ).toDF("material", "plant", "vendor", "mp", "mpn", "plant_status",
      "plant_spk", "vendor_to_spk", "comment")

    val checked = mainRulesI(enriched)
    val byMat = checked.select("material", "mpn", "comment")
      .as[(Long, String, Option[String])].collect()
    assert(byMat.filter(_._1 == 1L).forall(_._3.contains("MDO action, check dual sources")))
    assert(byMat.find(_._1 == 2L).get._3.contains("MDO action,SKU cancelled in Plant,why SL still exist?"))
    assert(byMat.find(_._1 == 3L).get._3.contains(ApexSentinel))
    assert(byMat.find(_._1 == 4L).get._3.contains(SwisscoComment))
    assert(byMat.find(_._1 == 5L).get._3.isEmpty) // resolved by rules II

    // merge-back: apex verdict lands in analysis; intra flag + verdict too
    val apexChecked = Seq(("3/10/a", "Ok, Cty SPK match with Apex MG5"))
      .toDF("mpn", "comment")
    val intraChecked = Seq(("7/10/a", "Ok, InterCo Sub Plant SPK match Main Plant SPK"))
      .toDF("mpn", "comment")
    val fin = mainFinal(checked, intraChecked, apexChecked)
      .select("material", "comment", "analysis").as[(Long, String, String)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(fin(5L) === (("Ok, SPK match SL", "Ok, SPK match SL")))
    assert(fin(6L) === (("Ok, FIN will conduct yearly check for TW",
      "Ok, FIN will conduct yearly check for TW")))
    assert(fin(3L) === ((ApexSentinel, "Ok, Cty SPK match with Apex MG5")))
    assert(fin(7L) === ((IntraSentinel, "Ok, InterCo Sub Plant SPK match Main Plant SPK")))
  }

  // ---- valid-SL slice (stages 4-6) ---------------------------------

  test("invalid/oos/valid SL partition the fact rows") {
    val eord = Seq(
      (1L, 10L, "a", "100001", "1997-01-01", None: Option[String]), // expired
      (2L, 10L, "b", "100001", "1999-01-01", Some("X")),            // blocked
      (3L, 30L, "c", "100001", "1999-01-01", None: Option[String]), // oos plant
      (4L, 10L, "d", "100001", "1999-01-01", None: Option[String])  // valid
    ).map { case (m, p, n, v, d, b) => (m, p, n, v, java.sql.Timestamp.valueOf(s"$d 00:00:00"), b, s"$m/$p", s"$m/$p/$n") }
      .toDF("material", "plant", "number", "vendor", "valid_to", "blocked", "mp", "mpn")
    val gar = Seq((10L, "Yes"), (30L, "No")).toDF("plant", "spk_sl_project")
    val invalid = invalidSl(eord, "1997-06-01")
    val oos = plantsOos(eord, gar)
    val valid = validSl(eord, invalid, oos)
    assert(invalid.select("material").as[Long].collect().toSet === Set(1L, 2L))
    assert(oos.select("material").as[Long].collect().toSet === Set(3L))
    assert(valid.select("material").as[Long].collect().toSet === Set(4L))
  }
}
