package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the sql package so graft's native Catalyst expressions can
  * be exposed as Columns: `ExpressionUtils.column`/`expression` are
  * `private[sql]` in Spark 4's classic API. This is the conventional
  * extension seam (expressions themselves live in graft.functions). */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap an (already-analyzed) logical subtree as a DataFrame —
    * `classic.Dataset.ofRows` is `private[sql]`. Used by
    * graft.plans.PlanAudit's data-driven window-cardinality audit to
    * execute a Window node's INPUT subplan on fixture data. */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : Dataset[Row] =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
