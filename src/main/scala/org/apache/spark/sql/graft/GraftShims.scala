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

  /** Free the block-store storage behind a `localCheckpoint()`'d frame.
    *
    * `Dataset.unpersist()` is a no-op for checkpointed frames — the
    * checkpoint RDD is persisted directly on the RDD, not registered in the
    * CacheManager — so without this, every checkpoint lives for the session.
    * The checkpointed RDD sits inside the frame's `LogicalRDD` leaf; this
    * unpersists it (non-blocking).
    *
    * DANGER: a localCheckpoint'd RDD's lineage was TRUNCATED at first
    * materialization — after freeing, the frame (and anything lazily built
    * on it) is unrecoverable, not merely slow. Only call on frames proven
    * dead (e.g. the intermediate rounds of an iterative loop after the
    * final result was re-checkpointed). */
  def freeCheckpoint(df: DataFrame): Unit =
    analyzed(df).foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
