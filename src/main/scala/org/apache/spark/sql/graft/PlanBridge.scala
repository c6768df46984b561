package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The one `private[sql]` door graft needs: turning a hand-built
  * [[LogicalPlan]] (e.g. `graft.plans.AsofJoinPlan`) back into a public
  * `DataFrame`. `classic.Dataset.ofRows` is package-private to
  * `org.apache.spark.sql`, so this shim lives in a subpackage — the
  * standard extension-library idiom for planting custom operators
  * (every Spark-native storage/engine layer ships one). Everything else
  * in graft goes through the public API; keep it that way.
  */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
