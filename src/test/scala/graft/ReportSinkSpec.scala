package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.report.ReportSink

class ReportSinkSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("renders an escaped, bounded HTML table") {
    import spark.implicits._
    val df = Seq(("<b>acme</b>", 3L), ("safe & sound", 1L))
      .toDF("company", "hits")
    val html = ReportSink.render(df, "Exposure <Report>")
    assert(html.contains("&lt;b&gt;acme&lt;/b&gt;"))
    assert(html.contains("safe &amp; sound"))
    assert(html.contains("<title>Exposure &lt;Report&gt;</title>"))
    assert(html.contains("<th>company</th><th>hits</th>"))
    assert(html.contains("2 rows"))
  }

  test("maxRows bounds the render") {
    import spark.implicits._
    val df = (1 to 50).map(i => (i, s"row$i")).toDF("i", "v")
    val html = ReportSink.render(df.orderBy($"i"), "t", maxRows = 5)
    assert(html.contains("5 rows") && !html.contains("row6"))
  }
}
