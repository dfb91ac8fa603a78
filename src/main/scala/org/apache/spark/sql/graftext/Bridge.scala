package org.apache.spark.sql.graftext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Minimal bridge into Spark's `private[sql]` surface: wrapping a custom
  * LogicalPlan (graft.plans.AsOfJoinNode) in a Dataset requires
  * `Dataset.ofRows`, which Spark scopes to its own package — the same
  * technique Spark-native table formats and connectors use for their
  * custom operators. Nothing else from the internal API is touched, and
  * this object contains no logic of its own.
  */
object Bridge {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
