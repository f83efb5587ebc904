package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** COMPATIBILITY SHIM — the repo's single private-namespace bridge.
  *
  * Package-placed access to the sql-private Dataset factory: the standard
  * way for a Spark library to materialize a DataFrame from a custom
  * LogicalPlan (the public API has no entry point for third-party plans;
  * cf. the same pattern in public Spark extension libraries).
  *
  * This pattern is brittle across Spark versions (the `classic` split is
  * Spark 4.x; 3.x exposed `Dataset.ofRows` directly) and across shading /
  * relocation setups, so it is deliberately ISOLATED here: no other file
  * may declare itself into `org.apache.spark.*`. When a Spark upgrade
  * breaks plan construction, this is the one file to fix.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
