package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.CorpusStream

/** Stream ≡ batch for the stateless corpus ingestion gate: every document
  * must leave the stream scrubbed, flagged, and split-routed exactly as the
  * batch projection computes it. */
class StreamingCorpusSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("streaming corpus gate equals the batch projection once drained") {
    val staged = java.nio.file.Files.createTempDirectory("docs_stream")
    java.nio.file.Files.createSymbolicLink(
      staged.resolve("documents.parquet"),
      java.nio.file.Paths.get(s"$dir/documents.parquet"))
    val gated = CorpusStream.gatedDocuments(
      CorpusStream.readStream(spark, staged.toString))
    // a pure projection must add no stateful operators to the stream plan
    val query = gated.writeStream
      .format("memory")
      .queryName("gated_docs")
      .outputMode("append")
      .start()
    try {
      query.processAllAvailable()
      val streamed = spark.table("gated_docs")
      val batch = CorpusStream.gatedBatch(spark, dir)
      assert(streamed.count() > 0)
      assert(streamed.exceptAll(batch).isEmpty &&
        batch.exceptAll(streamed).isEmpty,
        "stream and batch gate outputs must be identical")
    } finally query.stop()
  }
}
