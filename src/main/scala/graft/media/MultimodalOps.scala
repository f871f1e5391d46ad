package graft.media

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q
import graft.model.Tables

/** Multimodal columns: media payloads as opaque `binary` columns with typed
  * metadata, decode/feature-extract as partition-wise batch functions.
  *
  * The container has no image/audio codecs, so the decode step is a
  * DETERMINISTIC FAKE (clearly marked below); everything around it — the
  * binary column, the typed metadata schema, the Dataset[T] encoder, the
  * mapPartitions batch shape (one decoder init per partition, streamed rows)
  * — is the real plumbing a codec would drop into.
  *
  * Scale notes: payload bytes travel inside the row (no driver collect);
  * decode parallelism = partition count; metadata-only queries never touch
  * the payload column thanks to Parquet column pruning.
  */
object MultimodalOps {

  /** Typed row for the decode stage. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte])

  /** Typed decode output (what a real image decoder would emit). */
  final case class MediaFeatures(doc_id: Long, n_bytes: Int, width: Int,
      height: Int, mean_byte: Double, feature: Array[Float])

  /** The media table: documents' text re-encoded as an opaque binary payload
    * (stand-in for image/audio bytes) + metadata columns. */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      to_binary(col("text"), lit("utf-8")).as("payload"),
      col("n_chars"), col("source"))

  /** The stub codec's deterministic fake-dimension contract, single-sourced
    * in Column form and plain-Int form (the typed decoder): width/height
    * derive from a size measure, frames from doc_id. The metadata/resize
    * queries feed `n_chars` while the decoder uses the payload BYTE count —
    * equal on the ASCII corpus, and the features gate pins the byte-derived
    * form against the decoder on every row. The DuckDB oracles repeat the
    * arithmetic textually, but any drift there fails the hash gate. */
  private def fakeWidth(n: Column): Column = (lit(64) + n % 640).cast("int")
  private def fakeHeight(n: Column): Column =
    (lit(64) + (n * 7) % 480).cast("int")
  private def fakeFrames(docId: Column): Column =
    (lit(1) + docId % 16).cast("int")
  private[media] def fakeWidthInt(n: Int): Int = 64 + n % 640
  private[media] def fakeHeightInt(n: Int): Int = 64 + (n * 7) % 480

  /** Metadata extraction — pure column arithmetic over byte size and the
    * deterministic fake dimensions (in a real pipeline: parsed headers). */
  private val qMediaMetadata = Q(
    "q_media_metadata",
    (s, d) => mediaTable(s, d)
      .select(
        col("doc_id"),
        octet_length(col("payload")).cast("long").as("size_bytes"),
        fakeWidth(col("n_chars")).as("width"),
        fakeHeight(col("n_chars")).as("height"),
        fakeFrames(col("doc_id")).as("frames"))
      .orderBy(col("doc_id")),
    Some(
      """SELECT doc_id,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS size_bytes,
        |       CAST(64 + n_chars % 640 AS INT) AS width,
        |       CAST(64 + (n_chars * 7) % 480 AS INT) AS height,
        |       CAST(1 + doc_id % 16 AS INT) AS frames
        |FROM documents ORDER BY doc_id""".stripMargin))

  /** Partition-wise batch "decode" + feature extraction through the typed
    * Dataset API. STUB DECODE: a real implementation replaces `fakeDecode`
    * with a codec call; the partition iterator shape (init once, stream rows)
    * and the output schema stay identical.
    *
    * SELF-VERIFYING gate: every field the decoder emits (byte count, fake
    * dimensions, mean byte, 8-dim feature vector) is recomputed independently
    * as pure column arithmetic over the text the payload encodes (the corpus
    * is ASCII, so `ascii(char)` = payload byte), and the query emits the
    * mismatch count; the oracle pins n_rows to the corpus size and
    * n_mismatch to 0. */
  private val qMediaFeatures = Q(
    "q_media_features",
    (s, d) => {
      val spark = s
      import spark.implicits._
      val ds = mediaTable(s, d).select(col("doc_id"), col("payload"))
        .as[MediaRow]
      val features = ds.mapPartitions { rows =>
        // one "decoder" per partition (where codec init/native buffers live)
        rows.map { r =>
          val b = r.payload
          fakeDecode(r.doc_id, b)
        }
      }.toDF()
      // Independent twin: column arithmetic over the source text, entirely
      // inside whole-stage codegen. The byte sum is the custom ByteSum
      // expression (a tight Java loop — the earlier `aggregate(split(...))`
      // HOF was interpreted and O(n²) on long documents); the 8-dim feature
      // twin is one codegen'd ascii(substring(...)) per position, explicitly
      // zero-padded so texts shorter than 8 chars match the decoder's
      // fixed-width contract instead of producing a spurious length mismatch.
      graft.functions.VectorExprs.register(s)
      val byteSum = graft.functions.VectorExprs.byteSum(
        to_binary(col("text"), lit("utf-8")))
      val featTwin = array((1 to 8).map { i =>
        when(length(col("text")) >= i,
          (ascii(substring(col("text"), i, 1)).cast("double") / lit(255.0))
            .cast("float"))
          .otherwise(lit(0.0f))
      }: _*)
      val twin = Tables.documents(s, d).select(
        col("doc_id"),
        octet_length(to_binary(col("text"), lit("utf-8"))).as("t_bytes"),
        byteSum.as("t_sum"),
        featTwin.as("t_feat"))
        .withColumn("t_width", fakeWidth(col("t_bytes")))
        .withColumn("t_height", fakeHeight(col("t_bytes")))
        .withColumn("t_mean",
          when(col("t_bytes") === 0, lit(0.0))
            .otherwise(col("t_sum").cast("double") / col("t_bytes")))
      features.join(twin, Seq("doc_id"))
        .agg(count(lit(1)).as("n_rows"),
          sum(when(
            col("n_bytes") =!= col("t_bytes") ||
              col("width") =!= col("t_width") ||
              col("height") =!= col("t_height") ||
              col("mean_byte") =!= col("t_mean") ||
              col("feature") =!= col("t_feat"), 1L).otherwise(0L))
            .as("n_mismatch"))
    },
    Some(
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(0 AS BIGINT) AS n_mismatch
        |FROM documents""".stripMargin))

  /** Resize planning — the metadata half of an image-resize stage: fit the
    * fake dimensions into a 224×224 target preserving aspect ratio, all in
    * INTEGER arithmetic (`(short_side * 224) div long_side`) so the result
    * is engine-exact with no float rounding to disagree about. The pixel
    * half of a real resize lives behind the same partition-wise decode
    * barrier as [[qMediaFeatures]]; the planning math here is what the
    * pipeline schedules and audits on. */
  private val qMediaResize = Q(
    "q_media_resize",
    (s, d) => mediaTable(s, d)
      .select(col("doc_id"),
        fakeWidth(col("n_chars")).cast("long").as("w"),
        fakeHeight(col("n_chars")).cast("long").as("h"))
      .select(
        col("doc_id"),
        col("w").cast("int").as("width"),
        col("h").cast("int").as("height"),
        // `div` = exact integral division (codegen'd IntegralDivide)
        when(col("w") >= col("h"), lit(224))
          .otherwise(expr("(w * 224) div h")).cast("int").as("out_w"),
        when(col("w") >= col("h"), expr("(h * 224) div w"))
          .otherwise(lit(224)).cast("int").as("out_h"))
      .orderBy(col("doc_id")),
    Some(
      """SELECT doc_id,
        |       CAST(64 + n_chars % 640 AS INT) AS width,
        |       CAST(64 + (n_chars * 7) % 480 AS INT) AS height,
        |       CAST(CASE WHEN (64 + n_chars % 640) >= (64 + (n_chars * 7) % 480)
        |            THEN 224
        |            ELSE ((64 + n_chars % 640) * 224) // (64 + (n_chars * 7) % 480)
        |            END AS INT) AS out_w,
        |       CAST(CASE WHEN (64 + n_chars % 640) >= (64 + (n_chars * 7) % 480)
        |            THEN ((64 + (n_chars * 7) % 480) * 224) // (64 + n_chars % 640)
        |            ELSE 224 END AS INT) AS out_h
        |FROM documents ORDER BY doc_id""".stripMargin))

  /** Frame sampling — every 4th frame of each "video" payload exploded to a
    * row with a deterministic per-frame feature (a real pipeline decodes the
    * sampled frames only; the row explosion, stride arithmetic, and schema
    * are that pipeline's exact shape). Generates rows from metadata, so the
    * payload column is pruned from the scan entirely. */
  private val qMediaFrameSample = Q(
    "q_media_framesample",
    (s, d) => mediaTable(s, d)
      .select(col("doc_id"),
        fakeFrames(col("doc_id")).as("frames"))
      .select(col("doc_id"), col("frames"),
        explode(sequence(lit(0), col("frames") - 1, lit(4))).as("frame_idx"))
      .select(col("doc_id"), col("frames"), col("frame_idx").cast("int").as("frame_idx"),
        ((col("doc_id") * 31 + col("frame_idx")) % 255).cast("long").as("frame_sig"))
      .orderBy(col("doc_id"), col("frame_idx")),
    Some(
      """SELECT doc_id, CAST(1 + doc_id % 16 AS INT) AS frames,
        |       CAST(f AS INT) AS frame_idx,
        |       CAST((doc_id * 31 + f) % 255 AS BIGINT) AS frame_sig
        |FROM documents,
        |     unnest(generate_series(0, CAST(doc_id % 16 AS BIGINT), 4)) AS t(f)
        |ORDER BY doc_id, frame_idx""".stripMargin))

  /** DETERMINISTIC FAKE of the codec: derives "dimensions" and a feature
    * vector purely from the bytes. Replace with e.g. a JNI image decoder. */
  private def fakeDecode(docId: Long, b: Array[Byte]): MediaFeatures = {
    val n = b.length
    // Long accumulator — an Int sum overflows past ~21 MB of payload, which
    // would false-fail the gate against the Long-summing ByteSum twin
    val mean =
      if (n == 0) 0.0
      else b.foldLeft(0L)((s, x) => s + (x & 0xff)).toDouble / n
    // double-divide then narrow: Spark's `/` on numeric columns is always a
    // double division, so the column-arithmetic twin in qMediaFeatures can
    // only reproduce float values produced the same way
    val feat = Array.tabulate(8)(i =>
      if (i < n) ((b(i) & 0xff) / 255.0).toFloat else 0.0f)
    MediaFeatures(docId, n, fakeWidthInt(n), fakeHeightInt(n), mean, feat)
  }

  def queries: Seq[Q] = Seq(qMediaMetadata, qMediaFeatures, qMediaResize,
    qMediaFrameSample)
}
