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

  /** Filesystem location of a catalog table — for maintenance rewrites
    * that must re-read a bucketed table's files as a PLAIN parquet scan
    * (a scan whose partitioning is unknown, so an explicit repartition
    * before a bucketed rewrite survives planning; reading via the table
    * name lets the planner substitute the write's own conf-sized,
    * AQE-coalescible shuffle and the one-file-per-bucket layout is lost).
    */
  def tableLocation(spark: org.apache.spark.sql.SparkSession, db: String,
      table: String): String =
    classicSession(spark).sessionState.catalog
      .getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table, Some(db)))
      .location.toString

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
