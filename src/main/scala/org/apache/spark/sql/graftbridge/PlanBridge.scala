package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** LogicalPlan → DataFrame bridge (the plan-level sibling of
  * [[ColumnBridge]]): Spark 4 gates `Dataset.ofRows` as `private[sql]`,
  * and a package-local shim is the supported way for an extension library
  * to lift a custom logical operator into the public Dataset API. */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
