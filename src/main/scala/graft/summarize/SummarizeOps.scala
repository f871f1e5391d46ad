package graft.summarize

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Oracle, Q}
import graft.label.Labeler
import graft.model.Tables

/** Hierarchical summarization skeleton (SURVEY.md §2.6 A13/A14, §2.11 L4-L6).
  *
  * The reference formats group rows, chunks them under a token budget
  * (100k tokens — `token_manager.py:58-94`), LLM-summarizes each chunk, then
  * LLM-summarizes the concatenation (`summarize.py:62-126`). The engine keeps
  * the same partial→final aggregate SHAPE with a deterministic summarizer
  * stub: ordered concatenation truncated at a character budget. A real LLM
  * client replaces [[Summarizer.stub]]; the plan (group → ordered agg →
  * budget cut → final cut) is unchanged, and the stub is SQL-expressible so
  * the whole shape sits under the oracle gate.
  */
object SummarizeOps {

  /** Token budget in characters (reference: tokens ≈ chars/4, budget 100k
    * tokens — scaled down for the fixture corpus). */
  val PartialBudget = 400
  val FinalBudget = 600

  object Summarizer {
    /** CODE-POINT lexicographic ordering — the order Spark's `array_sort`
      * (binary UTF-8, which preserves code-point order) and DuckDB's
      * `ORDER BY` use. The JVM default String ordering compares UTF-16
      * code units, which ranks supplementary-plane characters (surrogate
      * 0xD800-0xDFFF) BELOW U+E000..U+FFFF — a divergence the ASCII
      * fixtures would never show. */
    private[summarize] val codePointOrdering: Ordering[String] =
      (a: String, b: String) => {
        val ai = a.codePoints().iterator()
        val bi = b.codePoints().iterator()
        var r = 0
        while (r == 0 && ai.hasNext && bi.hasNext)
          r = Integer.compare(ai.nextInt(), bi.nextInt())
        if (r != 0) r
        else Boolean.box(ai.hasNext).compareTo(bi.hasNext)
      }

    /** First `n` CODE POINTS of `s` — the unit Spark's `substring` and
      * DuckDB's `substr` count; `String.take` would count UTF-16 units and
      * split a surrogate pair at the boundary. */
    private def takeCodePoints(s: String, n: Int): String =
      if (s.codePointCount(0, s.length) <= n) s
      else s.substring(0, s.offsetByCodePoints(0, n))

    /** Deterministic stand-in for the per-chunk LLM summary: ordered join,
      * hard truncation at the budget — code-point order and code-point
      * budget, so it is bit-equal to the column-expression twin
      * (`array_sort` + `substring`) on ANY text, not just BMP. */
    def stub(parts: Seq[String], budget: Int): String =
      takeCodePoints(parts.sorted(codePointOrdering).mkString(" | "), budget)
  }

  /** The summarizer as a typed [[org.apache.spark.sql.expressions.Aggregator]]
    * — the custom-aggregate path for using it inside `agg()` /
    * `KeyValueGroupedDataset`. Semantics identical to the column-expression
    * form in [[qHierarchicalSummary]]'s partial level (sorted, ' | '-joined,
    * budget-truncated over distinct inputs); equivalence is asserted in
    * SummarizeSpec. A real LLM summarizer swaps [[Summarizer.stub]] in
    * `finish` — buffer/merge (the distributed part) are unchanged. */
  final class BudgetSummarize[I](budget: Int, value: I => String)
      extends org.apache.spark.sql.expressions.Aggregator[I, Set[String], String] {
    override def zero: Set[String] = Set.empty
    override def reduce(b: Set[String], a: I): Set[String] = {
      val v = value(a)
      if (v == null) b else b + v
    }
    override def merge(a: Set[String], b: Set[String]): Set[String] = a ++ b
    override def finish(r: Set[String]): String =
      Summarizer.stub(r.toSeq, budget)
    override def bufferEncoder: org.apache.spark.sql.Encoder[Set[String]] =
      org.apache.spark.sql.Encoders.kryo[Set[String]]
    override def outputEncoder: org.apache.spark.sql.Encoder[String] =
      org.apache.spark.sql.Encoders.STRING
  }

  /** A13: two-level summarize — per (sector, document_type) partial summaries
    * under the partial budget, re-aggregated per sector under the final
    * budget. Both levels are ordered-set aggregates: map-side combine does
    * the heavy lifting, the final concat sees only pre-truncated partials. */
  private val qHierarchicalSummary = Q(
    "q_hierarchical_summary",
    (s, d) => {
      // customer dim eliminated by RI (Tables.chunkRowsPruned)
      val lc = Labeler.withStubLabels(graft.model.Tables.chunkRowsPruned(
        s, d, withOrders = true, withSupplier = true, withText = true))
      val partials = lc.filter(col("label") =!= "U")
        .groupBy(col("entity_sector"), col("document_type"))
        .agg(
          substring(concat_ws(" | ", array_sort(collect_set(col("motivation")))),
            1, PartialBudget).as("partial_summary"),
          count(lit(1)).as("n_rows"))
      partials
        .groupBy(col("entity_sector"))
        .agg(
          substring(
            concat_ws(" || ", transform(
              array_sort(collect_list(struct(col("document_type"),
                col("partial_summary")))),
              e => e.getField("partial_summary"))),
            1, FinalBudget).as("final_summary"),
          sum(col("n_rows")).as("n_rows"))
        .orderBy(col("entity_sector"))
    },
    Some(
      s"""${Oracle.labeledCte},
         |partials AS (
         |  SELECT entity_sector, document_type,
         |         substr(string_agg(DISTINCT motivation, ' | ' ORDER BY motivation),
         |                1, $PartialBudget) AS partial_summary,
         |         count(*) AS n_rows
         |  FROM labeled WHERE label <> 'U'
         |  GROUP BY entity_sector, document_type
         |)
         |SELECT entity_sector,
         |       substr(string_agg(partial_summary, ' || ' ORDER BY document_type),
         |              1, $FinalBudget) AS final_summary,
         |       CAST(sum(n_rows) AS BIGINT) AS n_rows
         |FROM partials
         |GROUP BY entity_sector
         |ORDER BY entity_sector""".stripMargin))

  /** A14/L5: condense + magnitude scoring — per (entity, label≠U): a
    * condensed "search sentence" (bounded ordered concat) and a
    * High/Medium/Low score from the hit count (the reference's LLM scoring
    * collapsed to its deterministic contract). */
  private val qCondenseScore = Q(
    "q_condense_score",
    (s, d) => {
      // customer dim eliminated by RI (Tables.chunkRowsPruned)
      val lc = Labeler.withStubLabels(graft.model.Tables.chunkRowsPruned(
        s, d, withOrders = true, withSupplier = true, withText = true))
      lc.filter(col("label") =!= "U")
        .groupBy(col("entity_name"), col("label"))
        .agg(
          substring(concat_ws("; ", slice(
            array_sort(collect_set(col("headline"))), 1, 3)), 1, 200)
            .as("condensed"),
          count(lit(1)).as("hits"))
        .withColumn("magnitude",
          when(col("hits") >= 100, lit("High"))
            .when(col("hits") >= 20, lit("Medium"))
            .otherwise(lit("Low")))
        .orderBy(col("entity_name"), col("label"))
    },
    Some(
      s"""${Oracle.labeledCte},
         |g AS (
         |  SELECT entity_name, label,
         |         substr(array_to_string(list_sort(list(DISTINCT headline))[1:3], '; '),
         |                1, 200) AS condensed,
         |         count(*) AS hits
         |  FROM labeled WHERE label <> 'U'
         |  GROUP BY entity_name, label
         |)
         |SELECT entity_name, label, condensed, hits,
         |       CASE WHEN hits >= 100 THEN 'High'
         |            WHEN hits >= 20 THEN 'Medium'
         |            ELSE 'Low' END AS magnitude
         |FROM g ORDER BY entity_name, label""".stripMargin))

  /** L8: cost estimation for an external-classifier pass over the deduped
    * prompt set (tokens ≈ chars/4; per-1k pricing from the reference's cost
    * model `labeling.py:411-432`). */
  private val qCostEstimate = Q(
    "q_cost_estimate",
    (s, d) => {
      // reads (entity_id, text) only — relation is lineitem⋈documents
      // (all header/name dims eliminated by RI, Tables.chunkRowsPruned)
      val lc = Tables.chunkRowsPruned(s, d, withText = true)
      lc.select(col("entity_id"), col("text")).distinct()
        .select(ceil(length(col("text")) / 4.0).cast("long").as("tokens"))
        .agg(
          count(lit(1)).as("n_prompts"),
          sum(col("tokens")).as("input_tokens"),
          round(sum(col("tokens")) * 0.15 / 1000.0, 6).as("input_cost_usd"))
    },
    Some(
      s"""WITH ${Oracle.chunkCte},
         |uniq AS (SELECT DISTINCT entity_id, text FROM chunk),
         |tok AS (SELECT CAST(ceil(length(text) / 4.0) AS BIGINT) AS tokens FROM uniq)
         |SELECT count(*) AS n_prompts,
         |       CAST(sum(tokens) AS BIGINT) AS input_tokens,
         |       round(CAST(sum(tokens) AS DOUBLE) * 0.15 / 1000.0, 6) AS input_cost_usd
         |FROM tok""".stripMargin))

  def queries: Seq[Q] = Seq(qHierarchicalSummary, qCondenseScore, qCostEstimate)
}
