package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** The one `private[sql]` doorway this library uses: turning a custom
  * [[LogicalPlan]] node into a user-facing [[DataFrame]]. Spark has no
  * public constructor for this — every extension library that ships its
  * own logical operator (the documented `SparkSessionExtensions` +
  * `SparkStrategy` path) bridges through `Dataset.ofRows` from a class
  * placed inside the `org.apache.spark.sql` package tree, which is what
  * this object is. Nothing else in the codebase touches non-public API.
  */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
