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

  test("watermarked streaming exact-dedup equals batch dedup, bounded state") {
    // stage the SAME corpus file twice — the redelivered-ingest scenario the
    // dedup exists for: every document arrives (at least) twice and exactly
    // one copy per content fingerprint may survive. Redelivered copies carry
    // the same doc_id-derived ingest_ts, so all duplicates land INSIDE one
    // watermark horizon — the regime where stream ≡ batch holds exactly
    // (past-horizon duplicates are deliberately kept by the stream gate;
    // see dedupedDocuments' scaladoc)
    val staged = java.nio.file.Files.createTempDirectory("docs_dedup_stream")
    for (name <- Seq("delivery_a.parquet", "delivery_b.parquet"))
      java.nio.file.Files.createSymbolicLink(
        staged.resolve(name),
        java.nio.file.Paths.get(s"$dir/documents.parquet"))
    val deduped = CorpusStream.dedupedDocuments(
      CorpusStream.readStream(spark, staged.toString))
    val query = deduped.writeStream
      .format("memory")
      .queryName("deduped_docs")
      .outputMode("append")
      .start()
    try {
      query.processAllAvailable()
      val streamed = spark.table("deduped_docs")
      val batch = CorpusStream.dedupedBatch(spark, staged.toString)
      val nBatch = batch.count()
      assert(nBatch > 0)
      assert(streamed.count() == nBatch,
        "stream dedup must keep exactly one row per fingerprint, like batch")
      assert(streamed.select("fp").exceptAll(batch.select("fp")).isEmpty &&
        batch.select("fp").exceptAll(streamed.select("fp")).isEmpty,
        "stream and batch must keep the same fingerprint set")
      // bounded state: one dedup state operator, whose row count can never
      // exceed the distinct-fingerprint count (eviction keys it on the
      // watermark horizon, not the stream history)
      val stateOps = query.recentProgress.flatMap(_.stateOperators)
      assert(stateOps.nonEmpty, "expected a streaming dedup state operator")
      assert(stateOps.map(_.numRowsTotal).max <= nBatch,
        "dedup state must be bounded by the distinct-fingerprint count")
    } finally query.stop()
  }

  test("streaming corpus health panel equals the batch windowed aggregate") {
    val staged = java.nio.file.Files.createTempDirectory("docs_stats_stream")
    java.nio.file.Files.createSymbolicLink(
      staged.resolve("documents.parquet"),
      java.nio.file.Paths.get(s"$dir/documents.parquet"))
    val stats = CorpusStream.corpusStatsStream(
      CorpusStream.readStream(spark, staged.toString))
    val query = stats.writeStream
      .format("memory")
      .queryName("corpus_stats_stream")
      .outputMode("complete")
      .start()
    try {
      query.processAllAvailable()
      val streamed = spark.table("corpus_stats_stream")
      val batch = CorpusStream.corpusStatsBatch(spark, dir)
      assert(streamed.count() > 0)
      assert(streamed.exceptAll(batch).isEmpty &&
        batch.exceptAll(streamed).isEmpty,
        "drained stream health panel must equal the batch windowed aggregate")
    } finally query.stop()
  }

  test("per-row bigram gate equals the batch explode+aggregate verdicts") {
    // the stateless gate computes top_bigram_frac INSIDE the row (array
    // lambdas, zero state) while the batch path explodes and aggregates —
    // the two mechanisms must reach identical fractions and verdicts on
    // every document, or stream and batch curation would diverge
    import org.apache.spark.sql.functions.col
    val cols = Seq("doc_id", "dup_word_frac", "top_bigram_frac", "keep")
    val gate = graft.text.CorpusOps
      .statelessGate(graft.model.Tables.documents(spark, dir))
      .select(cols.map(col): _*)
    val agg = SparkEntry.queries("q_repetition_filter")(spark, dir)
      .select(cols.map(col): _*)
    assert(gate.count() > 0)
    assert(gate.exceptAll(agg).isEmpty && agg.exceptAll(gate).isEmpty,
      "per-row and explode+aggregate bigram stats must be identical")
  }

  test("streaming contamination gate equals the batch decontamination join") {
    val grams = CorpusStream.benchGrams(spark)
    assert(grams.nonEmpty, "eval-set fixture must yield 13-grams")
    val staged = java.nio.file.Files.createTempDirectory("docs_decon_stream")
    java.nio.file.Files.createSymbolicLink(
      staged.resolve("documents.parquet"),
      java.nio.file.Paths.get(s"$dir/documents.parquet"))
    val gated = CorpusStream.contaminationGate(
      CorpusStream.readStream(spark, staged.toString), grams)
    val query = gated.writeStream
      .format("memory")
      .queryName("decon_docs")
      .outputMode("append")
      .start()
    try {
      query.processAllAvailable()
      val streamed = spark.table("decon_docs")
      // batch twin #1: the same projection over the batch table
      val batch = CorpusStream.contaminationGate(
        graft.model.Tables.documents(spark, dir), grams)
      assert(streamed.count() > 0)
      assert(streamed.exceptAll(batch).isEmpty &&
        batch.exceptAll(streamed).isEmpty,
        "stream and batch contamination flags must be identical")
      // batch twin #2: the stream gate's hit counts must agree with the
      // broadcast-join decontamination query on every flagged doc
      // (same n-gram width, same eval set, different mechanism)
      val joinCounts = SparkEntry.queries("q_decontaminate_ext")(spark, dir)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val gateCounts = streamed.filter(org.apache.spark.sql.functions.col("n_hits") > 0)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gateCounts == joinCounts,
        "stream gate hit counts must match the broadcast-join operator")
      // pure projection ⇒ no state operators at all
      assert(query.recentProgress.flatMap(_.stateOperators).forall(_.numRowsTotal == 0),
        "contamination gate must be stateless")
    } finally query.stop()
  }
}
