package graft.tools

import org.apache.spark.sql.SparkSession

/** Interleaved A/B of the ElectionPipeline S8 knob
  * ([[graft.analytics.ElectionPipeline.pipelineFrame]] `oneScan`) at one SF
  * — the measurement harness behind the two-pass-vs-one-scan decision
  * recorded at the decision site and in BASELINE.md. Interleaves the two
  * shapes (A B A B A B) so a contention drift hits both arms equally, and
  * pins their row equality while at it.
  *
  * {{{
  * spark-submit --master 'local[32]' --driver-memory 16g \
  *   --class graft.tools.ElectionCutProbe <jar> [sfDir] [rounds]
  * }}}
  */
object ElectionCutProbe {

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
    def run(oneScan: Boolean) = {
      val t0 = System.nanoTime()
      val rows = graft.analytics.ElectionPipeline
        .pipelineFrame(spark, d, oneScan).collect()
      graft.PlanProbe.releaseCuts()
      ((System.nanoTime() - t0) / 1e9, rows)
    }
    run(oneScan = false) // warm-up, discarded
    val (two, one) = (1 to rounds).map { _ =>
      (run(oneScan = false), run(oneScan = true))
    }.unzip
    val eq = two.head._2.map(_.toString).sorted
      .sameElements(one.head._2.map(_.toString).sorted)
    def fmt(ts: Seq[(Double, Array[org.apache.spark.sql.Row])]) =
      ts.map(t => f"${t._1}%.3f").mkString(",")
    println(s"[electioncut] $d rounds=$rounds values_equal=$eq " +
      f"two_pass=[${fmt(two)}] best=${two.map(_._1).min}%.3f " +
      f"one_scan=[${fmt(one)}] best=${one.map(_._1).min}%.3f")
    spark.stop()
    if (!eq) sys.exit(1)
  }
}
