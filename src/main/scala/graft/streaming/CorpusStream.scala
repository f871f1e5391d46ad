package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.text.{CorpusOps, TextOps}

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

  /** Batch twin for stream ≡ batch assertions. Directory conventions
    * differ by twin on purpose — mixing them is the standing misuse trap:
    * `d` here (and in [[corpusStatsBatch]]) is the dataset ROOT
    * (`Tables.documents` reads `$d/documents.parquet`), while
    * [[readStream]] and [[dedupedBatch]] take the staged documents
    * directory ITSELF (`docsDir` — the dir the stream watches, whose
    * files ARE the table). Passing the stream's `docsDir` here fails
    * with PATH_NOT_FOUND on `$docsDir/documents.parquet`; passing the
    * root to [[dedupedBatch]] reads nothing. */
  def gatedBatch(spark: SparkSession, d: String): DataFrame =
    CorpusOps.statelessGate(graft.model.Tables.documents(spark, d))

  /** Deterministic ingest-time fixture: the documents table carries no
    * event time, so the streaming twin derives one from doc_id (one doc per
    * second from a fixed epoch). In production this is the ingestion
    * layer's arrival timestamp; the watermark/eviction semantics under test
    * are identical either way. */
  private def ingestTs: Column =
    timestamp_seconds(lit(1704067200L) + col("doc_id"))

  /** Streaming per-source corpus health panel — the in-flight twin of the
    * batch `q_corpus_stats` monitoring aggregate: hourly tumbling windows
    * per source with volume, mean length, language share, and the
    * duplicate-word gate pass rate, so corpus health is visible DURING an
    * ingest wave instead of after the batch backfill. Watermarked windowed
    * aggregation (the [[EventStream.weeklyCounts]] pattern): state is one
    * row per (window, source) and windows older than the watermark finalize
    * and evict — bounded by the ingest horizon, never the stream history.
    * All aggregates are algebraic, so each micro-batch contributes
    * map-side partials exactly like the batch plan. */
  def corpusStatsStream(stream: DataFrame): DataFrame =
    corpusStatsShape(stream.withColumn("ingest_ts", ingestTs)
      .withWatermark("ingest_ts", "1 hour"))

  /** Batch twin over the same window expression, for stream ≡ batch. */
  def corpusStatsBatch(spark: SparkSession, d: String): DataFrame =
    corpusStatsShape(graft.model.Tables.documents(spark, d)
      .withColumn("ingest_ts", ingestTs))

  /** The shared windowed-aggregation shape (expects `ingest_ts` present;
    * the stream side adds its watermark before entering). Derivation and
    * aggregate columns come from [[CorpusOps.healthDerived]]/
    * [[CorpusOps.healthAggs]] — the SAME definitions the batch
    * `q_corpus_stats` gate aggregates, so the in-flight panel cannot drift
    * from the oracled batch panel; only the grouping (hourly window ×
    * source vs source) differs. */
  private def corpusStatsShape(docs: DataFrame): DataFrame = {
    val aggs = CorpusOps.healthAggs
    CorpusOps.healthDerived(docs)
      .groupBy(window(col("ingest_ts"), "1 hour"), col("source"))
      .agg(aggs.head, aggs.tail: _*)
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm")
        .as("window_start"), col("source"), col("n_docs"),
        col("total_chars"), col("avg_words"), col("pct_en"), col("keep_rate"))
  }

  /** Stateful rung of the streaming ingest story (the stateless gate above
    * is the stateless rung): watermarked EXACT-DEDUP at the stream
    * boundary, keyed on the normalized-content digest
    * ([[TextOps.fingerprintMd5]] — the same key the batch dedup family
    * aggregates on), so re-delivered or re-crawled documents are dropped
    * before they land in the corpus store.
    *
    * `dropDuplicatesWithinWatermark` keeps state ONLY for fingerprints
    * newer than the watermark horizon (1 hour here) and evicts the rest —
    * the bounded-state property that lets this run indefinitely (the same
    * pattern as [[EventStream.dedupedEvents]]); a plain stream
    * `dropDuplicates` would accumulate every digest ever seen. The digest
    * is 32 bytes/doc, so state volume is digest-count-bounded, never
    * text-volume-bounded.
    *
    * SEMANTICS, not a bug: bounded state means bounded guarantees — a
    * duplicate arriving AFTER its original's fingerprint was evicted (past
    * the horizon) is kept, where [[dedupedBatch]] (global dedup) would drop
    * it. The horizon covers the redelivery/at-least-once failure mode this
    * gate exists for; corpus-history dedup across horizons is the batch
    * family's job (q_dedup_exact / q_text_fingerprint) downstream. The
    * stream ≡ batch spec stages duplicates with IDENTICAL ingest
    * timestamps, i.e. entirely inside one horizon, where the two agree
    * exactly. */
  def dedupedDocuments(stream: DataFrame): DataFrame =
    stream
      .withColumn("fp", TextOps.fingerprintMd5)
      .withColumn("ingest_ts", ingestTs)
      .withWatermark("ingest_ts", "1 hour")
      .dropDuplicatesWithinWatermark("fp")

  /** Batch twin: same digest, one survivor per fingerprint over whatever
    * landed in `docsDir` (which may contain re-delivered duplicates). */
  def dedupedBatch(spark: SparkSession, docsDir: String): DataFrame =
    spark.read.schema(docSchema).parquet(docsDir)
      .withColumn("fp", TextOps.fingerprintMd5)
      .dropDuplicates("fp")

  /** Load the eval-set 13-gram vocabulary for the streaming contamination
    * gate. Driver-side collect is BY DESIGN: eval suites are tiny next to a
    * corpus (this is the same boundedness argument as q_decontaminate's
    * broadcast), and a collected literal array is the only fully STATELESS
    * way to flag contamination on a stream — no explode, no join, no
    * aggregation state. */
  def benchGrams(spark: SparkSession,
      evalPath: String = CorpusOps.EvalSetPath): Array[String] =
    // CorpusOps.evalGrams IS the batch gate's reference-set derivation —
    // one definition, so this rung and q_decontaminate_ext cannot drift
    CorpusOps.evalGrams(spark, evalPath)
      .collect().map(_.getString(0)).sorted

  /** Streaming contamination gate — the third rung of the ingest story
    * (stateless gate → watermarked dedup → this): every arriving document
    * is flagged with its production-width n-gram overlap against the eval
    * set BEFORE landing in the corpus store, so benchmark text never enters
    * training data even transiently. Pure map-only projection
    * (`array_intersect` against the in-plan gram vocabulary): zero
    * streaming state, identical codegen plan per micro-batch — the same
    * property that makes the stateless gate safe at any ingest rate. */
  def contaminationGate(docs: DataFrame, grams: Array[String]): DataFrame = {
    val n = CorpusOps.DecontamGramExt
    // project the word array ONCE before the gram lambda (a lambda over the
    // raw split expression re-splits per element — the O(words²) trap)
    docs.select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(
        col("doc_id"),
        when(size(col("w")) >= n,
          size(array_intersect(CorpusOps.gramCol(col("w"), n),
            lit(grams))).cast("long"))
          .otherwise(lit(0L)).as("n_hits"))
      .withColumn("contaminated", col("n_hits") > 0)
  }

  /** Streaming near-dup ingest gate — the fourth rung of the ingest story
    * (stateless gate → watermarked dedup → contamination gate → this):
    * every arriving document's MinHash band keys, computed IN-ROW
    * ([[TextOps.inRowBands]] — no explode/groupBy, so the stream stays
    * stateless), are stream-static equi-joined against the standing corpus
    * band table ([[TextOps.bandTable]]). A shared (band, key) bucket means
    * the new document is a candidate near-duplicate of an existing corpus
    * document — the at-ingest form of `q_minhash_lsh`'s within-corpus
    * self-join, catching "this crawl re-fetched a page we already hold"
    * before the document lands.
    *
    * Emits one row per MATCHING BAND (new_doc_id, corpus_doc_id): band
    * multiplicity is deliberate — deduplicating pairs inside the stream
    * would need stateful aggregation; read-side `distinct()` (or the
    * downstream CC resolution) collapses it, and the spec compares DISTINCT
    * pair sets. Exact verification (true Jaccard over the candidate) is the
    * batch family's job, same as the batch LSH path.
    *
    * Scale: the static side is re-planned per micro-batch (standard
    * stream-static join), and the band table grows with the corpus (4
    * rows/doc) — it is NOT broadcastable. At corpus scale, land it once via
    * [[graft.text.TextOps.landBandTable]] (bucketed on `key`): the standing
    * side then joins with NO exchange per micro-batch — only the tiny
    * arriving batch shuffles to match the buckets. That plan shape is
    * asserted on the EXECUTED micro-batch plan in StreamingCorpusSpec, not
    * promised in prose. Snapshot the recent-corpus slice instead if the
    * dedup horizon is bounded. */
  def nearDupCandidates(docs: DataFrame, corpusBands: DataFrame): DataFrame =
    docs
      .select(col("doc_id").as("new_doc_id"),
        explode(TextOps.inRowBands(col("text"))).as("bk"))
      .select(col("new_doc_id"), col("bk.band").as("band"),
        col("bk.key").as("key"))
      .join(corpusBands.select(col("doc_id").as("corpus_doc_id"),
        col("band"), col("key")), Seq("band", "key"))
      .filter(col("new_doc_id") =!= col("corpus_doc_id"))
      .select(col("new_doc_id"), col("corpus_doc_id"))
}
