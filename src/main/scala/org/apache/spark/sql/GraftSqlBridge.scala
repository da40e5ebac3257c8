package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to two `private[sql]` seams every Spark extension that
  * introduces a custom logical operator needs (the standard pattern
  * for out-of-tree plan extensions — same technique Delta and
  * Iceberg use): build a DataFrame from a custom [[LogicalPlan]],
  * and recover the Catalyst [[Expression]] behind a public
  * [[Column]] (Spark 4's Column wraps a connect-compatible
  * ColumnNode, so `.expr` is no longer public API).
  *
  * Kept to exactly these two forwarders — no behavior, no state.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
