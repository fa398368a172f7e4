package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Bridge from a raw Catalyst [[LogicalPlan]] to a [[DataFrame]].
  * Spark 4 keeps `Dataset.ofRows` `private[sql]` on the classic
  * backend; this shim lives inside the `org.apache.spark.sql` package
  * solely to re-export that one conversion for graft's custom logical
  * plans (the [[graft.plans.AsOfJoinPlan]] family). */
object PlanShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
