package graft.rules

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's core "operator": an ordered, prioritized conditional
  * classification — ~45 `df.loc[mask, 'Comment'] = verdict` sites
  * (`SL_SPK_Cleansing.py:119-303`, `Status_Cleansing.py:112-161`;
  * SURVEY.md §2.8).
  *
  * Semantics preserved exactly:
  *  - rules apply IN ORDER; a later rule sees the verdict column as
  *    left by earlier rules (so guarded rules can test
  *    `col("Comment").isNull` for first-match-wins, and unguarded rules
  *    deliberately overwrite — both idioms appear in the reference).
  *  - a rule whose condition evaluates to NULL does not fire (pandas
  *    NaN-in-mask behavior == Spark `when` null behavior, SURVEY.md §1).
  *
  * Implementation: pure built-in `when/otherwise` folded left — no
  * UDFs, fully whole-stage-codegen'd. Catalyst's CollapseProject merges
  * the stacked withColumns into ONE projection, so a 10-rule cascade is
  * a single codegen'd CASE chain per row: at 100 TB this is a
  * map-only pass with zero shuffle and zero extra materialization.
  */
object RuleCascade {

  /** One rule: when `cond` (may reference the verdict column itself),
    * set the verdict column to `verdict`. */
  final case class Rule(cond: Column, verdict: Column)

  object Rule {
    def apply(cond: Column, verdict: String): Rule = Rule(cond, lit(verdict))
  }

  /** Apply rules in order to `df`, writing into `verdictCol` (created
    * as NULL string if absent). */
  def apply(df: DataFrame, verdictCol: String, rules: Seq[Rule]): DataFrame = {
    val withVerdict =
      if (df.columns.contains(verdictCol)) df
      else df.withColumn(verdictCol, lit(null).cast("string"))
    rules.foldLeft(withVerdict) { case (d, Rule(cond, v)) =>
      d.withColumn(verdictCol, when(cond, v).otherwise(col(verdictCol)))
    }
  }

  /** Pure-Column form: build the equivalent single CASE expression for
    * embedding a cascade inside a select (same fold, no DataFrame). */
  def asColumn(init: Column, rules: Seq[Rule]): Column =
    rules.foldLeft(init) { case (acc, Rule(cond, v)) =>
      when(cond, v).otherwise(acc)
    }
}
