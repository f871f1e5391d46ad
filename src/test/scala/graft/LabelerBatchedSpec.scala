package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.label.Labeler
import graft.model.Tables

/** Batched-prompt classifier contract (`labeling.py:141-224`): chunk_size
  * rows per external call, id-keyed JSON parse, malformed-batch fallback. */
class LabelerBatchedSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("call count is ceil(unique / chunk_size) on a single partition") {
    // exact call-count arithmetic needs a known partition layout: the dedup
    // inside labelBatchedPrompt shuffles, so pin shuffle partitions to 1 for
    // the duration of this test
    val uniqueRows = Tables.chunkRows(spark, dir)
      .select(col("entity_id"), col("text"))
      .dropDuplicates("entity_id", "text").collect()
    import spark.implicits._
    val onePart = spark.sparkContext
      .parallelize(uniqueRows.toSeq.map(r => (r.getString(0), r.getString(1))), 1)
      .toDF("entity_id", "text")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    val calls = spark.sparkContext.longAccumulator("clf_calls")
    try Labeler.labelBatchedPrompt(onePart, Labeler.StubBatchedClassifier,
      Some(calls)).count()
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    val expected = math.ceil(uniqueRows.length.toDouble /
      Labeler.StubBatchedClassifier.chunkSize).toLong
    assert(calls.value == expected, s"calls=${calls.value} expected=$expected")
  }

  test("batched path equals the column-expression stub on every row") {
    val base = Tables.chunkRows(spark, dir)
    val viaBatch = Labeler.labelBatchedPrompt(base, Labeler.StubBatchedClassifier)
      .select(col("sentence_id"), col("entity_id"), col("part_entity_id"),
        col("label"), col("motivation"))
    val viaExpr = Labeler.withStubLabels(base)
      .select(col("sentence_id"), col("entity_id"), col("part_entity_id"),
        col("label"), col("motivation"))
    assert(viaBatch.exceptAll(viaExpr).isEmpty &&
      viaExpr.exceptAll(viaBatch).isEmpty)
  }

  test("malformed batch response falls back to U/unclear for the whole batch") {
    object Garbage extends Labeler.BatchedClassifier {
      val chunkSize = 10
      def classifyBatch(rows: Seq[(String, String)]): String =
        "I'm sorry, I can't help with that."
    }
    val out = Labeler.labelBatchedPrompt(Tables.chunkRows(spark, dir), Garbage)
    assert(out.filter(col("label") =!= "U" || col("motivation") =!= "unclear")
      .isEmpty)
    assert(out.count() == Tables.chunkRows(spark, dir).count())
  }

  test("parseBatchResponse handles fences, ids, and partial bodies") {
    val ok = Labeler.parseBatchResponse(
      """```json
        |{"a": {"label": "P", "motivation": "m1"},
        | "b": {"label": "N"}}
        |```""".stripMargin)
    assert(ok.contains(Map("a" -> ("P", "m1"), "b" -> ("N", "unclear"))))
    assert(Labeler.parseBatchResponse("[1,2,3]").isEmpty)
    assert(Labeler.parseBatchResponse("nope").isEmpty)
  }
}
