package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Package-placed bridge to the sql-private Dataset factory — the standard
  * way for a Spark library to materialize a DataFrame from a custom
  * LogicalPlan (the public API has no entry point for third-party plans;
  * cf. the same pattern in public Spark extension libraries).
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
