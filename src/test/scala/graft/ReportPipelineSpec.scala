package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Composition invariants of the §3.3 end-to-end report pipeline
  * (`q_report_pipeline`) that the row-hash gate can't state row-locally:
  * group-key uniqueness across the stage joins, liveness of the coalesce
  * branches, the per-theme normalization identity, and the broadcast shape
  * of the response merges. */
class ReportPipelineSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def pipeline = Registry.all.find(_.name == "q_report_pipeline").get

  private lazy val rows = pipeline.run(spark, dir).collect()

  test("result is non-empty and unique on the reference's merge key") {
    assert(rows.nonEmpty)
    val keys = rows.map(r => (r.getAs[String]("entity_id"),
      r.getAs[String]("theme"), r.getAs[String]("label")))
    assert(keys.distinct.length === rows.length,
      "the two left merges must not fan out the by-company frame")
  }

  test("response coalesce branches are live and row-consistent") {
    val prefixes = Seq("negative: ", "positive: ", "adopter: ")
    var ftHits = 0; var fallbacks = 0
    rows.foreach { r =>
      val ftN = r.getAs[Long]("filings_n_docs")
      val nwN = r.getAs[Long]("news_n_docs")
      val resp = r.getAs[String]("response")
      if (ftN == 0 && nwN == 0) assert(resp === "no response")
      else {
        // label != 'U' upstream, so every motivation carries a real prefix
        assert(prefixes.exists(resp.startsWith),
          s"response '$resp' is not a stub motivation")
        if (ftN > 0) ftHits += 1 else fallbacks += 1
      }
    }
    assert(ftHits > 0, "no group took the filings-response branch")
    assert(fallbacks > 0, "no group exercised the news-fallback coalesce " +
      "(the branch report_generator.py:454-469 exists for)")
  }

  test("attention_score is mean-normalized per theme (mean = 1)") {
    rows.groupBy(_.getAs[String]("theme")).foreach { case (_, themeRows) =>
      val mean = themeRows.map(_.getAs[Double]("attention_score")).sum /
        themeRows.length
      assert(math.abs(mean - 1.0) < 1e-4,
        s"per-theme mean of n_docs/mean(n_docs) must be 1, got $mean")
    }
  }

  test("magnitude is a pure function of n_docs") {
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      val expected = if (n >= 100) "High" else if (n >= 30) "Medium" else "Low"
      assert(r.getAs[String]("magnitude") === expected)
    }
  }

  test("response merges stay broadcast (dimension-bounded right sides)") {
    // pin the ADAPTIVE-final plan: execute the frame, then walk
    // AdaptiveSparkPlanExec.executedPlan — the compile-time plan alone can
    // silently diverge from what AQE actually ran (this automates the
    // manual sf0.1 audit recorded in BASELINE.md, round 13)
    val (rows, plan) = PlanCheck.executedFinalPlan(pipeline.run(spark, dir))
    assert(rows.nonEmpty)
    val bhjOuter = plan.split("\n")
      .count(l => l.contains("BroadcastHashJoin") && l.contains("LeftOuter"))
    assert(bhjOuter >= 2,
      s"both response merges must be broadcast left joins, plan had " +
        s"$bhjOuter:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"a response merge fell back to a shuffle join:\n$plan")
  }
}
