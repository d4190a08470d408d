package graft

import org.apache.spark.sql.SparkSession

import graft.pipelines.{SlValidation, StatusCleansing}

/** The reference's end-user entry points as one runnable report job —
  * what `SL_SPK_Cleansing.py` + `Status_Cleansing.py` produce, as
  * parquet "sheets" (S2 in SURVEY.md §2.1: the reference writes one
  * multi-sheet Excel workbook per audit; here each sheet is a parquet
  * directory under the output root).
  *
  * Usage: runMain graft.Report <sfDir> <outDir>
  *
  * Sheets (names from the reference's writer calls,
  * `SL_SPK_Cleansing.py:328-338`, `Status_Cleansing.py:169-175`):
  *   sl_spk/valid_sl_with_spk   — classified main sheet (+ Analysis)
  *   sl_spk/cn_jp_intra         — IntraCo sub-audit
  *   sl_spk/sku_via_apex_spk    — Apex sub-audit
  *   sl_spk/sku_missing_sl      — active SKUs without a source list
  *   status/marc                — status-checked MARC
  *   status/mb52                — in-scope stock rows (+ row sums)
  *   status/mb52_groupby        — per-key inventory aggregate
  */
object Report {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true") // events ts (ns)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sheets = Map(
      "sl_spk/valid_sl_with_spk" -> SlValidation.mainFinalQ(spark, sfDir),
      "sl_spk/cn_jp_intra"       -> SlValidation.intraCheckedQ(spark, sfDir),
      "sl_spk/sku_via_apex_spk"  -> SlValidation.apexCheckedQ(spark, sfDir),
      "sl_spk/sku_missing_sl"    -> SlValidation.missingSlQ(spark, sfDir),
      "status/marc"              -> StatusCleansing.marcCheckedQ(spark, sfDir),
      "status/mb52"              -> StatusCleansing.mb52ValidQ(spark, sfDir),
      "status/mb52_groupby"      -> StatusCleansing.mb52GroupbyQ(spark, sfDir))
    sheets.foreach { case (sheet, df) =>
      val t0 = System.nanoTime()
      df.write.mode("overwrite").parquet(s"$outDir/$sheet")
      println(f"[report] $sheet%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    // the reference's ACTUAL end-user artifacts: one multi-sheet Excel
    // workbook per audit (SL_SPK_Cleansing.py:328-338 ExcelWriter,
    // Status_Cleansing.py:169-175) — same sheets as the parquet dirs
    for ((wb, names) <- Seq(
        "sl_spk" -> Seq("valid_sl_with_spk", "cn_jp_intra",
          "sku_via_apex_spk", "sku_missing_sl"),
        "status" -> Seq("marc", "mb52", "mb52_groupby"))) {
      val t0 = System.nanoTime()
      // read back the parquet just written rather than re-running the
      // pipelines a second time for the workbook pass
      graft.sources.Xlsx.write(
        names.map(n => n -> spark.read.parquet(s"$outDir/$wb/$n")), s"$outDir/$wb.xlsx")
      println(f"[report] ${wb + ".xlsx"}%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}
