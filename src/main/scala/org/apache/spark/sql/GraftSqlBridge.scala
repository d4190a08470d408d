package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Narrow bridge into two `private[sql]` seams the public API does not
  * re-export (the standard technique for Spark-native libraries that
  * add planner nodes — the package placement grants access, nothing
  * is reflectively unlocked):
  *
  *  - wrapping a custom [[LogicalPlan]] into a user-facing
  *    [[DataFrame]] (`classic.Dataset.ofRows`);
  *  - recovering the Catalyst [[Expression]] behind a [[Column]]
  *    (`classic.ExpressionUtils.expression` — Spark 4 Columns carry
  *    ColumnNodes, not Expressions, so `.expr` no longer exists).
  *
  * Only [[graft.plans]] consumes this object.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def expression(c: Column): Expression =
    // eager conversion: ExpressionUtils.expression wraps the node in a
    // LAZY ColumnNodeExpression placeholder, which is not serializable
    // and never unwraps inside a custom plan — convert for real
    classic.ColumnNodeToExpressionConverter(c.node)
}
