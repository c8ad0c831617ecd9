package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal package bridge: `Dataset.ofRows` is `private[sql]`, and turning
  * a custom LogicalPlan (graft.plans.AsOfJoinPlan) into a DataFrame needs
  * it. Extensions that add whole logical operators conventionally expose
  * exactly this one hop from inside the org.apache.spark.sql package tree
  * (the SparkSessionExtensions API covers rules/strategies/functions but
  * offers no public plan→DataFrame constructor). Nothing else from the
  * private surface is touched.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
