package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.SparkStrategy

/** The two `private[sql]` touch points a third-party physical operator
  * needs, isolated in one tiny shim (the standard extension-library
  * pattern): turning a hand-built [[LogicalPlan]] into a DataFrame, and
  * appending a planner strategy to a live session. Everything else in
  * graft.plans uses only public/`@DeveloperApi` Catalyst surfaces.
  */
object GraftSqlShim {

  /** `Dataset.ofRows` for a custom logical plan. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Idempotently appends `strategy` to the session's extra planner
    * strategies (the per-session twin of
    * `SparkSessionExtensions.injectPlannerStrategy`). */
  def ensureStrategy(spark: SparkSession, strategy: SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(strategy))
      exp.extraStrategies = exp.extraStrategies :+ strategy
  }
}
