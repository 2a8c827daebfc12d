package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Minimal bridge into the `org.apache.spark.sql` package-private API:
  * wraps a custom [[LogicalPlan]] into a DataFrame so library operators
  * (graft.plans.AsOfJoinPlan) can enter the session's analyzer /
  * optimizer / planner like any built-in node. This factory-in-subpackage
  * shape is the standard pattern public Spark extensions use to build
  * Datasets from custom plans; it is the ONLY place the library steps
  * inside Spark's package namespace.
  */
object GraftSqlBridge {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** True when the session's shared CacheManager holds no cached
    * plans. Operators must not leak cache entries (VERDICT r4: the
    * pre-r6 minhash pipeline left one per call); CacheHygieneSpec
    * pins that through this probe — the manager is package-private,
    * hence the bridge.
    */
  def cacheManagerIsEmpty(spark: SparkSession): Boolean =
    spark.asInstanceOf[classic.SparkSession].sharedState.cacheManager.isEmpty
}
