package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Narrow bridge to `private[sql]` constructors the DML command rewrites
  * need (the same package-placement device Delta/Iceberg use): turning an
  * already-analyzed [[LogicalPlan]] — e.g. a MERGE statement's source —
  * back into a [[DataFrame]] has no public API. Nothing else from the
  * private surface is used; keep it that way. */
object GraftSqlShims {
  def dataFrame(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Catalyst predicate → v1 source [[Filter]], None when untranslatable. */
  def translateFilter(predicate: org.apache.spark.sql.catalyst.expressions.Expression)
      : Option[org.apache.spark.sql.sources.Filter] =
    org.apache.spark.sql.execution.datasources.DataSourceStrategy
      .translateFilter(predicate, supportNestedPredicatePushdown = true)
}
