package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

import graft.text.CorpusOps

/** Streaming ingestion gate for a document corpus: the stateless corpus-prep
  * stages ([[CorpusOps.statelessGate]] — PII scrub, duplicate-word fraction,
  * deterministic hash split) applied to a file-source document stream. In
  * production this is the landing-directory pattern: the crawler appends
  * parquet files, each becomes a micro-batch, and every document leaves the
  * gate scrubbed, quality-flagged, and routed to its train/val/test split
  * before it ever lands in the corpus store — no batch backfill needed.
  *
  * Because the gate is a pure projection there is no streaming state at all:
  * the micro-batch plan is the SAME codegen'd map-only pass the batch query
  * runs, which is what makes this safe at any ingest rate. */
object CorpusStream {

  /** documents schema as stored (see TESTDATA.md). */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** File-source stream over a directory of document parquet files. */
  def readStream(spark: SparkSession, docsDir: String): DataFrame =
    spark.readStream.schema(docSchema).parquet(docsDir)

  /** The streaming gate: identical projection to the batch twin. */
  def gatedDocuments(stream: DataFrame): DataFrame =
    CorpusOps.statelessGate(stream)

  /** Batch twin over the same directory, for stream ≡ batch assertions. */
  def gatedBatch(spark: SparkSession, d: String): DataFrame =
    CorpusOps.statelessGate(graft.model.Tables.documents(spark, d))
}
