package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.SourceOps

class SourceOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("csv sheet sink/source round-trips a result table") {
    val tmp = java.nio.file.Files.createTempDirectory("sheets").toString
    val basket = SparkEntry.queries("q_basket")(spark, dir)
    SourceOps.writeSheet(basket, tmp, "basket")
    val back = SourceOps.readSheet(spark, tmp, "basket")
    assert(back.count() == basket.count())
    assert(back.columns.sorted.sameElements(basket.columns.sorted))
    val a = basket.select(col("entity_name"), col("total_exposure"))
    val b = back.select(col("entity_name"), col("total_exposure").cast("long"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("workbook sheet reader applies header=1 + Unnamed-drop quirks") {
    // layout a real result sheet arrives in (tool.py:10-26): banner line,
    // header with a spreadsheet index column, then data
    val tmp = java.nio.file.Files.createTempDirectory("wb")
    val f = tmp.resolve("results.csv")
    java.nio.file.Files.writeString(f,
      """Narrative Mining Results - Q3,,,,
        |Unnamed: 0,Company,Date,Score,
        |0,Acme,2024-01-05,3,
        |1,Globex,2024-02-10,7,
        |""".stripMargin)
    val df = SourceOps.readWorkbookSheet(spark, f.toString, "News")
    assert(df.columns.toSeq == Seq("Company", "Date", "Score", "Source_Type"))
    assert(df.count() == 2)
    assert(df.schema("Date").dataType.typeName == "date")
    assert(df.filter(col("Source_Type") =!= "News").isEmpty)
    assert(df.filter(col("Company") === "Acme" && col("Score") === 3).count() == 1)
  }

  test("stage checkpoint builds once, then reads back") {
    val tmp = java.nio.file.Files.createTempDirectory("ckpt").toString
    var builds = 0
    def build = {
      builds += 1
      SparkEntry.queries("q_label_distribution")(spark, dir)
    }
    val first = SourceOps.cached(spark, tmp, "labels")(build)
    val second = SourceOps.cached(spark, tmp, "labels")(build)
    assert(builds == 1)
    assert(first.exceptAll(second).isEmpty && second.exceptAll(first).isEmpty)
  }
}
