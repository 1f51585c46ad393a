package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * The one `private[sql]` doorway this library uses: wrapping a custom
 * [[LogicalPlan]] node back into a user-facing DataFrame. Spark exposes
 * every other extension point publicly (strategies via
 * `spark.experimental.extraStrategies` / `SparkSessionExtensions`), but
 * plan construction is `Dataset.ofRows`, which is `private[sql]` — hence
 * this package-located shim, the standard pattern for Spark-native
 * libraries that add physical operators.
 */
object GraftSqlBridge {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Append a planner strategy to the session exactly once (idempotent,
    * additive — never replaces or removes anything the user installed). */
  def ensureStrategy(
      spark: SparkSession,
      strategy: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    exp.synchronized {
      if (!exp.extraStrategies.contains(strategy))
        exp.extraStrategies = exp.extraStrategies :+ strategy
    }
  }

  /** Append an optimizer rule to the session exactly once (idempotent,
    * additive — same contract as [[ensureStrategy]]). The rule runs in
    * the optimizer's user-provided batch, which is FIXED-POINT: rules
    * registered here must be idempotent. */
  def ensureOptimizerRule(
      spark: SparkSession,
      rule: org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    exp.synchronized {
      if (!exp.extraOptimizations.contains(rule))
        exp.extraOptimizations = exp.extraOptimizations :+ rule
    }
  }
}
