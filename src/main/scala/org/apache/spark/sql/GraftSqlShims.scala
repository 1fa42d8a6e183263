package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the one `private[sql]` construction path a library
  * shipping a custom logical operator needs: turning a hand-built
  * `LogicalPlan` into a `DataFrame`. The standard pattern for Spark
  * extension libraries (Delta, Sedona, GraphFrames all ship the same
  * shim) — everything else graft registers goes through the public
  * `SparkSessionExtensions` API; only plan construction has no public
  * equivalent.
  */
object GraftSqlShims {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Wrap a hand-built Catalyst expression as a user-facing Column. */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  /** The Catalyst expression behind a Column. */
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
