package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => CDataset, ExpressionUtils, SparkSession => CSparkSession}

/** Bridge to `private[sql]` classic-engine internals that a custom-plan API
  * necessarily touches (the standard extension-library technique): Column →
  * Expression conversion, analyzed-plan extraction, and `Dataset.ofRows` to
  * wrap a hand-constructed LogicalPlan back into a DataFrame. Spark 4 split
  * `org.apache.spark.sql` into an abstract API and the `classic` execution
  * implementation; these three hooks are the whole surface graft needs. */
object GraftShims {

  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[CDataset[_]].queryExecution.analyzed

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    CDataset.ofRows(spark.asInstanceOf[CSparkSession], plan)
}
