package graft

import scala.util.DynamicVariable

import org.apache.spark.sql.DataFrame

/** Plan-inspection mode for the queries that are EAGER at construction time.
  *
  * Two operator families execute work the moment their DataFrame is built:
  * the sketch pipelines truncate lineage with `localCheckpoint` (an eager
  * materialization), and the connected-components loop runs its iterative
  * rounds to convergence. That is correct for execution, but it means a plan
  * sweep (PlanGuardSpec walking every registered query's `queryExecution`)
  * pays the full iterative job per query, and — worse for guard COVERAGE —
  * every operator upstream of a checkpoint is invisible to the sweep, because
  * the checkpointed frame's plan is an opaque RDD scan.
  *
  * With [[planOnly]] set, [[cut]] becomes the identity (no checkpoint, full
  * logical plan preserved) and the CC loop builds a fixed number of
  * STRUCTURAL rounds with no actions (see `CorpusOps.connectedComponents`),
  * so building a query costs nothing and the guard sees the ENTIRE pipeline,
  * including everything a checkpoint would have hidden.
  *
  * RESULTS ARE NOT VALID in plan-only mode — the structural CC rounds are
  * not iterated to convergence. This switch exists for plan inspection ONLY
  * (PlanGuardSpec); Verify/Bench/production paths never set it. Scoped as a
  * DynamicVariable so a sweep thread cannot leak the mode into concurrently
  * running suites.
  */
object PlanProbe {

  val planOnly: DynamicVariable[Boolean] = new DynamicVariable(false)

  /** `df.localCheckpoint()` in execution mode; identity in plan-only mode. */
  def cut(df: DataFrame): DataFrame =
    if (planOnly.value) df else df.localCheckpoint()
}
