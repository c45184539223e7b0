package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge. Spark 4 made `ExpressionUtils`
  * private[sql], so extension libraries host this two-liner in an
  * `org.apache.spark.sql` subpackage — the same technique used by public
  * Spark extension projects to expose custom Catalyst expressions as
  * Columns. */
object CatalystBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** LogicalPlan -> DataFrame (`Dataset.ofRows` went private[sql] the
    * same way) — lets a parser-injected command turn its parsed source
    * plan back into the DataFrame the lake engines take. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
