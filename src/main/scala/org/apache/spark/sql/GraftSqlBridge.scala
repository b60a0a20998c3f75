package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => CDataset, SparkSession => CSparkSession}

/** `Dataset.ofRows` is private[sql]; graft's custom logical plans
  * ([[graft.plans.AsofJoinPlan]]) need a DataFrame wrapper around a plan
  * they construct. This bridge lives in the org.apache.spark.sql package
  * for that one accessor — the standard technique for libraries that add
  * operators (no Spark internals are modified or copied).
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    CDataset.ofRows(spark.asInstanceOf[CSparkSession], plan)
}
