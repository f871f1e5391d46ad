package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Shared executed-plan inspection for specs that pin physical shapes and
  * for the release tools that audit executed plans at scale
  * ([[graft.tools.PipelineScaleStress]]) — main-scope so both can use the
  * ONE unwrapping definition.
  *
  * `queryExecution.executedPlan.toString` on an UN-executed frame prints
  * AQE's initial plan — a broadcast/exchange pin made there can silently
  * diverge from what actually ran (AQE re-plans at stage boundaries). These
  * helpers execute the frame FIRST, then render the adaptive-final plan by
  * unwrapping [[AdaptiveSparkPlanExec]]/[[QueryStageExec]] recursively, so
  * assertions hold against the plan that really executed.
  */
object PlanCheck {

  /** Render the post-AQE final plan of `df`, executing it if needed.
    * Returns (rows, final plan string) so callers can assert on both. */
  def executedFinalPlan(df: DataFrame): (Array[org.apache.spark.sql.Row], String) = {
    val rows = df.collect()
    (rows, render(df.queryExecution.executedPlan))
  }

  /** Flatten the AQE wrappers of an already-executed plan into one string
    * containing every physical node that actually ran. */
  def render(p: SparkPlan): String = {
    val sb = new StringBuilder
    def walk(n: SparkPlan): Unit = n match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case other =>
        sb.append(other.simpleString(500)).append('\n')
        other.children.foreach(walk)
        other.subqueries.foreach(walk)
    }
    walk(p)
    sb.toString
  }
}
