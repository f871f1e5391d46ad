package graft.label

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The LLM-classification surface of the reference
  * (`AI_Cost_Cutting_Market_Analysis/src/labeling.py:141-324`), re-expressed as
  * a pluggable classifier interface plus the deterministic rule-based stub used
  * offline.
  *
  * The reference's cost-driven design rules are preserved structurally:
  *  - dedup before the expensive call (`labeling.py:263-264`) →
  *    [[labelDeduped]] dedups on (entity_id, text), classifies only unique
  *    pairs, then joins labels back to all rows;
  *  - batch-in/batch-out contract (`chunk_size` rows per prompt) → the
  *    [[ExternalClassifier]] trait takes an iterator of rows per partition, so
  *    a real HTTP client with batching/semaphore/retry drops in without
  *    touching the plan;
  *  - post-hoc consistency guard (`labeling.py:379`) → [[guarded]].
  */
object Labeler {

  /** Batch classifier contract: one call per partition, rows in/rows out.
    * Implementations MUST be deterministic pure functions of the input for the
    * correctness gate to hold (SURVEY.md §7.4 item 7).
    */
  trait ExternalClassifier extends Serializable {
    def classify(rows: Iterator[(String, String)]): Iterator[(String, String, String, String)]
  }

  /** Deterministic rule stub standing in for the LLM labeler. Rules are
    * SQL-expressible (see [[graft.Oracle.labelCase]]) so DuckDB can replicate
    * them. P/A/N/U mirror the reference's provider/adopter/negative/unclear
    * label alphabet.
    */
  val labelCol: Column =
    when(col("text").contains("slow") && col("text").contains("merge"), lit("N"))
      .when(col("text").contains("fast"), lit("P"))
      .when(col("text").contains("stream"), lit("A"))
      .otherwise(lit("U"))

  val motivationCol: Column =
    when(col("text").contains("slow") && col("text").contains("merge"),
      concat(lit("negative: "), substring(col("text"), 1, 40)))
      .when(col("text").contains("fast"),
        concat(lit("positive: "), substring(col("text"), 1, 40)))
      .when(col("text").contains("stream"),
        concat(lit("adopter: "), substring(col("text"), 1, 40)))
      .otherwise(lit("unclear"))

  /** Column-expression fast path: label + motivation inline (whole-stage
    * codegen; no shuffle, no barrier). Used when the classifier is the stub. */
  def withStubLabels(df: DataFrame): DataFrame =
    df.withColumn("label", labelCol).withColumn("motivation", motivationCol)

  /** Full external-classifier path: dedup (entity_id, text) → classify unique
    * pairs via mapPartitions barrier → broadcast-join labels back (D6 in
    * SURVEY.md §2.4). At scale the unique side is orders of magnitude smaller
    * than the chunk table — exactly why the reference dedups before calling.
    */
  def labelDeduped(df: DataFrame, clf: ExternalClassifier): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val unique = df.select(col("entity_id"), col("text"))
      .dropDuplicates("entity_id", "text")
      .as[(String, String)]
    val labeled = unique
      .mapPartitions(rows => clf.classify(rows))
      .toDF("entity_id", "text", "label", "motivation")
    df.join(labeled, Seq("entity_id", "text"), "left")
  }

  /** The stub as an [[ExternalClassifier]] — used to exercise the
    * mapPartitions path with results identical to [[withStubLabels]]. */
  object StubClassifier extends ExternalClassifier {
    def classify(rows: Iterator[(String, String)]): Iterator[(String, String, String, String)] =
      rows.map { case (entityId, text) =>
        val (label, motivation) =
          if (text.contains("slow") && text.contains("merge"))
            ("N", "negative: " + text.take(40))
          else if (text.contains("fast")) ("P", "positive: " + text.take(40))
          else if (text.contains("stream")) ("A", "adopter: " + text.take(40))
          else ("U", "unclear")
        (entityId, text, label, motivation)
      }
  }

  /** S10: cache-aside labeling (`labeling.py:78-104` — md5-keyed result
    * cache checked before every API call). The cache is a persisted parquet
    * map table keyed by (entity_id, text); only cache MISSES reach the
    * classifier, new results are appended, and all rows get their labels via
    * a join. At 100 TB the cache join is a plain equi-join the optimizer
    * places; the expensive external stage sees only the novel pairs. */
  def labelWithCache(df: DataFrame, clf: ExternalClassifier,
      cachePath: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val unique = df.select(col("entity_id"), col("text"))
      .dropDuplicates("entity_id", "text")
    val cached: DataFrame =
      if (new java.io.File(cachePath).exists()) spark.read.parquet(cachePath)
      else Seq.empty[(String, String, String, String)]
        .toDF("entity_id", "text", "label", "motivation")
    val misses = unique.join(cached.select(col("entity_id"), col("text")),
      Seq("entity_id", "text"), "left_anti")
    val fresh = misses.as[(String, String)]
      .mapPartitions(rows => clf.classify(rows))
      .toDF("entity_id", "text", "label", "motivation")
    if (!fresh.isEmpty) fresh.write.mode("append").parquet(cachePath)
    val lookup = spark.read.parquet(cachePath)
    df.join(lookup, Seq("entity_id", "text"), "left")
  }

  /** Post-hoc consistency guard (L2): a non-U label must be backed by a
    * motivation that is not "unclear", else forced to 'U'. */
  def guarded(df: DataFrame): DataFrame =
    df.withColumn("label",
      when(col("motivation") === "unclear", lit("U")).otherwise(col("label")))
}
