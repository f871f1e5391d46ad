package graft

import scala.util.DynamicVariable

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Plan-inspection mode + lineage-cut policy for the queries that are EAGER
  * at construction time.
  *
  * Two operator families execute work the moment their DataFrame is built:
  * the sketch pipelines truncate lineage with an eager materialization, and
  * the connected-components loop runs its iterative rounds to convergence.
  * That is correct for execution, but it means a plan sweep (PlanGuardSpec
  * walking every registered query's `queryExecution`) pays the full
  * iterative job per query, and — worse for guard COVERAGE — every operator
  * upstream of a checkpoint is invisible to the sweep, because the
  * checkpointed frame's plan is an opaque RDD scan.
  *
  * With [[planOnly]] set, [[cut]] becomes the identity (no materialization,
  * full logical plan preserved) and the CC loop builds a fixed number of
  * STRUCTURAL rounds with no actions (see `CorpusOps.connectedComponents`),
  * so building a query costs nothing and the guard sees the ENTIRE pipeline,
  * including everything a checkpoint would have hidden.
  *
  * RESULTS ARE NOT VALID in plan-only mode — the structural CC rounds are
  * not iterated to convergence. This switch exists for plan inspection ONLY
  * (PlanGuardSpec); Verify/Bench/production paths never set it. Scoped as a
  * DynamicVariable so a sweep thread cannot leak the mode into concurrently
  * running suites.
  *
  * ==Cut policy==
  *
  * In execution mode, HOW a cut materializes is a deployment decision, not
  * an algorithmic one — the downstream results are bit-identical under
  * every policy (CutPolicySpec pins this on the full 8-table IVF pair
  * sweep). Selected per session via `spark.graft.cutPolicy`:
  *
  *  - `local` (default) — `localCheckpoint()`: truncates lineage into
  *    blocks on EXECUTOR-LOCAL storage. Fastest, and right for local[N]
  *    where "executor loss" means the whole JVM is gone anyway. On a real
  *    cluster a lost executor makes its blocks unrecoverable (they are not
  *    recomputable after lineage truncation) and fails the job mid-query.
  *  - `reliable` — `checkpoint()`: materializes into the SparkContext
  *    checkpoint directory (HDFS/object store on a cluster), which survives
  *    executor loss; a recovered task re-reads the checkpoint files. The
  *    cluster profile for long-running index builds. Requires
  *    `SparkContext.setCheckpointDir` (we fail fast with instructions).
  *  - `disk` — `persist(DISK_ONLY)` + an eager materializing pass: blocks
  *    are still executor-local, but lineage is PRESERVED, so a lost
  *    executor's partitions recompute from source instead of failing the
  *    job — recomputation-on-failure rather than checkpoint I/O per cut.
  *    Cached entries hold a CacheManager reference until released: call
  *    [[releaseCuts]] at a unit-of-work boundary (Bench does, per query)
  *    or the entries outlive the frames that made them.
  */
object PlanProbe {

  val planOnly: DynamicVariable[Boolean] = new DynamicVariable(false)

  /** Session conf key selecting the [[cut]] materialization strategy. */
  val PolicyKey = "spark.graft.cutPolicy"

  private val ValidPolicies = Set("local", "reliable", "disk")

  /** Frames persisted under the `disk` policy, awaiting [[releaseCuts]].
    * (The `local`/`reliable` policies need no registry: localCheckpoint
    * blocks are GC-registered with the ContextCleaner, and reliable
    * checkpoint files live in the user-owned checkpoint dir.) */
  private val diskCuts = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]

  /** The session's validated policy (fail-fast on an unknown value). */
  private def policyOf(df: DataFrame): String =
    df.sparkSession.conf.get(PolicyKey, "local") match {
      case p if ValidPolicies(p) => p
      case other => throw new IllegalArgumentException(
        s"$PolicyKey=$other — expected one of ${ValidPolicies.mkString("/")}")
    }

  /** Durable `checkpoint()` with an instructive fail-fast when the
    * checkpoint dir is missing. */
  private def reliableCheckpoint(df: DataFrame): DataFrame = {
    require(df.sparkSession.sparkContext.getCheckpointDir.isDefined,
      s"$PolicyKey=reliable requires SparkContext.setCheckpointDir " +
        "(point it at cluster-durable storage, e.g. an HDFS path)")
    df.checkpoint()
  }

  /** Materialize `df` per the session's cut policy; identity in plan-only
    * mode. A cut frame is REUSED by its pipeline several times — the whole
    * point is paying its upstream once — so every policy materializes
    * eagerly here rather than on first downstream action. */
  def cut(df: DataFrame): DataFrame =
    if (planOnly.value) df
    else policyOf(df) match {
      case "local" => df.localCheckpoint()
      case "reliable" => reliableCheckpoint(df)
      case "disk" =>
        val p = df.persist(StorageLevel.DISK_ONLY)
        diskCuts.add(p)
        p.count() // eager: populate the cache in ONE pass before any reuse
        p
    }

  /** Iterative-loop cut (the CC loop's per-round truncation): lineage
    * truncation is MANDATORY here — per-round plans grow 4^r leaf
    * references without it — so the `disk` policy (which preserves
    * lineage) does not apply and maps to `local`. Under `reliable` the
    * rounds checkpoint into the durable dir, so a lost executor mid-loop
    * re-reads round state from storage instead of failing the job; the
    * loop's retirement discipline (`GraftShims.freeCheckpoint`) deletes a
    * retired round's checkpoint files, keeping the same two-generation
    * plateau the local policy proves. */
  def cutIter(df: DataFrame): DataFrame =
    if (planOnly.value) df
    else policyOf(df) match {
      case "reliable" => reliableCheckpoint(df)
      case _ => df.localCheckpoint() // local; disk maps here too
    }

  /** Release every frame the `disk` policy persisted since the last call.
    * No-op under the other policies. Safe at any unit-of-work boundary:
    * by then the cut frames' consumers have executed, and a late straggler
    * would merely recompute through the preserved lineage. */
  def releaseCuts(): Unit = {
    var f = diskCuts.poll()
    while (f != null) { f.unpersist(blocking = false); f = diskCuts.poll() }
  }
}
