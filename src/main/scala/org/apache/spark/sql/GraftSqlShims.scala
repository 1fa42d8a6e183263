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
}
