package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.pipelines.{AnalogSql, Extensions, ExtSql, SlValidation, StatusCleansing}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The full authoritative pipeline (stages 4-16 of SURVEY.md
    * §3 EP1): validate → enrich → classify → sub-audits → merge-back. */
  def entry(spark: SparkSession): DataFrame =
    SlValidation.mainFinalQ(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (parity) and
    * the beyond-reference extension track — the authoritative count is
    * `queries.size` (13 parity + everything [[Extensions.queries]]
    * carries); every key is oracle-checked via [[oracleSql]]. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = parity ++ Extensions.queries

  private def parity: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s1_eord_scan"       -> ((s, d) => SlValidation.eordT(s, d).drop("valid_to")),
    "f1_invalid_sl"      -> ((s, d) => SlValidation.invalidSlQ(s, d).drop("valid_to")),
    "f2_plants_oos"      -> ((s, d) => SlValidation.plantsOosQ(s, d).drop("valid_to")),
    "f3_valid_sl"        -> ((s, d) => SlValidation.validSlQ(s, d).drop("valid_to")),
    "j1_enriched_sl"     -> ((s, d) => SlValidation.enrichedQ(s, d).drop("valid_to")),
    "u3_main_checked"    -> ((s, d) => SlValidation.mainCheckedQ(s, d).drop("valid_to")),
    "j2_apex_checked"    -> ((s, d) => SlValidation.apexCheckedQ(s, d).drop("valid_to")),
    "j4_intraco_checked" -> ((s, d) => SlValidation.intraCheckedQ(s, d).drop("valid_to")),
    "f3_missing_sl"      -> ((s, d) => SlValidation.missingSlQ(s, d)),
    "j7_main_final"      -> ((s, d) => SlValidation.mainFinalQ(s, d).drop("valid_to")),
    "e5_mb52_valid"      -> ((s, d) => StatusCleansing.mb52ValidQ(s, d)),
    "a1_mb52_groupby"    -> ((s, d) => StatusCleansing.mb52GroupbyQ(s, d)),
    "r10_status_marc"    -> ((s, d) => StatusCleansing.marcCheckedQ(s, d)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = AnalogSql.oracle ++ ExtSql.oracle
}
