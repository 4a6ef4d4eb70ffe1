package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.SparkStrategy

/** Narrow bridge into `private[sql]` classic internals, so graft can build
  * DataFrames from its own logical plan nodes (the supported pattern for
  * libraries shipping custom operators — same mechanism Spark uses for every
  * built-in `Dataset` verb). Kept deliberately tiny: everything else in graft
  * goes through the public DataFrame/Dataset API.
  */
object GraftBridge {

  def classicSession(spark: org.apache.spark.sql.SparkSession): SparkSession =
    spark.asInstanceOf[SparkSession]

  /** Wrap a (resolved) logical plan as a DataFrame. */
  def ofRows(spark: org.apache.spark.sql.SparkSession, plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    Dataset.ofRows(classicSession(spark), plan)

  /** The analyzed logical plan of a DataFrame (attributes carry exprIds). */
  def analyzed(df: org.apache.spark.sql.Dataset[_]): LogicalPlan =
    df.asInstanceOf[Dataset[_]].queryExecution.analyzed

  def queryExecution(df: org.apache.spark.sql.Dataset[_]): org.apache.spark.sql.execution.QueryExecution =
    df.asInstanceOf[Dataset[_]].queryExecution

  /** Idempotently add a planner strategy + optimizer rules to a session. */
  def install(
      spark: org.apache.spark.sql.SparkSession,
      strategy: SparkStrategy,
      rules: Seq[Rule[LogicalPlan]]): Unit = {
    val em = classicSession(spark).experimental
    em.synchronized {
      if (!em.extraStrategies.contains(strategy))
        em.extraStrategies = em.extraStrategies :+ strategy
      val missing = rules.filterNot(em.extraOptimizations.contains)
      if (missing.nonEmpty)
        em.extraOptimizations = em.extraOptimizations ++ missing
    }
  }
}
