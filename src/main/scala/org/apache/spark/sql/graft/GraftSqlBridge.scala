package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** The one `private[sql]` doorway graft needs: constructing a DataFrame
  * over a CUSTOM logical plan (graft.plans.AsOfJoinNode). Spark scopes
  * `Dataset.ofRows` to its own package because arbitrary logical plans
  * can break Dataset invariants; graft builds its nodes exclusively from
  * already-analyzed child plans and resolved attributes, which is the
  * same contract Spark's own operators rely on. Kept to a single method
  * so the package-intrusion surface stays auditable. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
