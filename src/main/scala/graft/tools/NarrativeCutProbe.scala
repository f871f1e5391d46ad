package graft.tools

import org.apache.spark.sql.SparkSession

/** Interleaved A/B of the NarrativePipeline pivot-cut knob
  * ([[graft.analytics.NarrativePipeline.pipelineFrame]] `cut`) at one SF —
  * the measurement harness behind the round-17 decision to lineage-cut the
  * (source, week, label) pivot. The executed-plan evidence: without the
  * cut, the pivot's SEVEN downstream consumers each re-execute the
  * lineitem⋈orders fact join (ReusedExchange dedups only the scan-side
  * exchanges; the seven SortMergeJoins carry distinct exprIds), so the
  * corpus is joined 7× per action. The cut materializes a
  * dimension-bounded frame (≤ |sources|·|weeks|·|labels| rows at ANY
  * corpus size) — the opposite risk profile of election's rejected
  * corpus-fraction cut. Interleaves the two shapes (A B A B …) so a
  * contention drift hits both arms equally, and pins their row equality
  * while at it.
  *
  * {{{
  * spark-submit --master 'local[32]' --driver-memory 16g \
  *   --class graft.tools.NarrativeCutProbe <jar> [sfDir] [rounds]
  * }}}
  * Point sfDir at a `PipelineScaleStress` blowup directory to measure a
  * high-factor operating point.
  */
object NarrativeCutProbe {

  def main(args: Array[String]): Unit = {
    val d = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(cut: Boolean) = {
      val t0 = System.nanoTime()
      val rows = graft.analytics.NarrativePipeline
        .pipelineFrame(spark, d, cut).collect()
      graft.PlanProbe.releaseCuts()
      ((System.nanoTime() - t0) / 1e9, rows)
    }
    run(cut = false) // warm-up, discarded
    val (uncut, cut) = (1 to rounds).map { _ =>
      (run(cut = false), run(cut = true))
    }.unzip
    val eq = uncut.head._2.map(_.toString).sorted
      .sameElements(cut.head._2.map(_.toString).sorted)
    def fmt(ts: Seq[(Double, Array[org.apache.spark.sql.Row])]) =
      ts.map(t => f"${t._1}%.3f").mkString(",")
    println(s"[narrativecut] $d rounds=$rounds values_equal=$eq " +
      f"uncut=[${fmt(uncut)}] best=${uncut.map(_._1).min}%.3f " +
      f"cut=[${fmt(cut)}] best=${cut.map(_._1).min}%.3f")
    spark.stop()
    if (!eq) sys.exit(1)
  }
}
