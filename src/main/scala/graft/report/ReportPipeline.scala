package graft.report

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Oracle, Q}
import graft.label.Labeler
import graft.model.Tables

/** §3.3 end-to-end report pipeline — the reference's deepest lifecycle
  * (`Report_Generator_Regulatory_Issues_in_Tech/src/report_generator.py:143-469`
  * `generate_report`) composed as ONE gated DataFrame pipeline, the way
  * [[graft.text.CorpusOps]]' `q_corpus_pipeline` composes the corpus side.
  * Every stage below is individually hash-gated by its own query; this query
  * gates the COMPOSITION — stage boundaries, join keys, the doc-type slicing
  * contract, and the fallback coalesce — so cross-stage schema/contract drift
  * surfaces as a red CORRECTNESS row instead of only in the flagship smoke.
  *
  * Stage map (reference line → gated building block → here):
  *  1. multi-focus themed searches over three doc-type scopes, theme-tagged
  *     and concatenated (`report_generator.py:196-283`; `q_union_dedup` /
  *     `q_query_algebra` shapes) → one-scan theme fan-out: an exploded
  *     filtered theme array replays the reference's per-focus search loop
  *     in a single pass over the chunk table (same multiset as the UNION
  *     ALL of per-theme filters the oracle spells out);
  *  2. per-theme labeling of every search frame
  *     (`report_generator.py:285-358`; `q_label_batched`'s stub twin) →
  *     [[Labeler.withStubLabels]], then the reference's kept-label filter
  *     `~label.isin(['', 'unassigned', 'unclear'])`
  *     (`report_generator.py:429`) → `label <> 'U'`;
  *  3. company-level topic summarize + magnitude score over NEWS
  *     (`report_generator.py:404-417` `process_topic_by_company`;
  *     `q_condense_score` shape) → bounded ordered condense of distinct
  *     headlines + distinct-doc media attention per
  *     (entity, theme, label);
  *  4. mitigation-response extraction from FILINGS+TRANSCRIPTS
  *     (`report_generator.py:423-452`), where the LLM finds a response in
  *     only SOME documents — modeled by the deterministic response-bearing
  *     marker [[ResponseMarker]] (sparse in the corpus by construction), so
  *     the response frame is genuinely sparser than the label frame;
  *  5. news-fallback coalesce (`report_generator.py:454-469`:
  *     `merge(..., how='left')` then `fillna(news_response_summary)`;
  *     `q_response_coalesce` shape) → two left joins on the reference's
  *     merge key (entity_id, entity_name, topic) + `coalesce`, with all
  *     three branches (filings hit / news fallback / no response) live at
  *     sf0.01 (480/15/5 groups);
  *  6. mean-normalized attention score
  *     (`Report_Generator_AI_Threats/src/report_generator.py:346-348`:
  *     `n_documents / n_documents.mean()`; `q_mean_normalized` shape) —
  *     normalized per theme (the reference normalizes within one report's
  *     frame; partitioning the window by theme keeps the average's scope
  *     one theme tree AND keeps the window shuffle keyed instead of
  *     single-partition at scale).
  *
  * Scale shape: stage 1-2 are one codegen'd scan + explode (fan-out factor
  * = matching themes per chunk, ≤ |themes|); stages 3-4 are three hash
  * aggregations keyed by (entity, theme, label) over filtered slices of the
  * fanned frame — partial aggregation does the heavy lifting and the
  * aggregated frames are |entities|×|themes|×|labels| tiny, so the two left
  * joins and the per-theme window in stages 5-6 run on frames that broadcast
  * at any corpus size. Nothing in the chain is wider than the chunk table
  * and every join/window is keyed.
  */
object ReportPipeline {

  /** The reference's `list_specific_focus` loop stand-in: (search term,
    * theme tag). Terms are chosen so the themed searches overlap (a chunk
    * can carry both themes — the reference's concat keeps one row per
    * (chunk, focus), and so does the fan-out). */
  private val Themes: Seq[(String, String)] =
    Seq("fast" -> "regtech in compute", "stream" -> "regtech in streaming")

  /** Deterministic stand-in for "the LLM found a mitigation response in
    * this chunk" — `'dup'` is sparse in the synthetic corpus (26/500 docs
    * at sf0.01), so response coverage is genuinely partial and the
    * news-fallback coalesce has all three branches live. */
  private val ResponseMarker = "dup"

  /** Stages 1+2: one-scan theme fan-out + stub labels + kept-label filter. */
  private def searchedLabeled(s: SparkSession, d: String): DataFrame = {
    val themeArr = array(Themes.map { case (term, tag) =>
      struct(lit(term).as("term"), lit(tag).as("theme")) }: _*)
    // redundant with the explode below (a row fans out to ≥1 theme iff it
    // contains ≥1 term) but SARGABLE: the disjunction references only the
    // documents text column, so the optimizer sinks it to that scan and
    // the whole star join sees only theme-matching chunks — the explode's
    // empty-array row drop could only ever run after the joins
    val anyTheme = Themes.map { case (term, _) =>
      col("text").contains(term) }.reduce(_ || _)
    // reads headline/document_type (orders), entity_name (supplier) and the
    // text — the customer dim is eliminated by RI (Tables.chunkRowsPruned)
    val fanned = Tables.chunkRowsPruned(s, d, withOrders = true,
      withSupplier = true, withText = true)
      .filter(anyTheme)
      .select(col("document_id"), col("headline"), col("entity_id"),
        col("entity_name"), col("document_type"), col("text"),
        explode(filter(themeArr, t => col("text").contains(t.getField("term"))))
          .as("__t"))
      .withColumn("theme", col("__t").getField("theme"))
      .drop("__t")
    Labeler.withStubLabels(fanned).filter(col("label") =!= "U")
  }

  private val GroupKey = Seq("entity_id", "entity_name", "theme", "label")

  private val qReportPipeline = Q(
    "q_report_pipeline",
    (s, d) => {
      // NO lineage cut on the fanned frame, deliberately: the three
      // downstream aggregates do re-read it, but it is a LARGE slice of
      // the corpus (every theme-matching chunk × fan-out, text columns
      // included) — measured at sf0.1, checkpointing it costs 4.0 s vs
      // 1.7 s for the triple codegen'd scan (MarketPipeline's cut is the
      // opposite call: its frame is a tiny watchlist × date-range slice)
      val kept = searchedLabeled(s, d)
      // stage 3: company-level topic summaries + magnitude over NEWS
      val byCompany = kept.filter(col("document_type") === "news")
        .groupBy(GroupKey.map(col): _*)
        .agg(
          substring(concat_ws("; ",
            slice(array_sort(collect_set(col("headline"))), 1, 3)), 1, 200)
            .as("topic_summary"),
          countDistinct(col("document_id")).as("n_docs"))
        .withColumn("magnitude",
          when(col("n_docs") >= 100, lit("High"))
            .when(col("n_docs") >= 30, lit("Medium"))
            .otherwise(lit("Low")))
      // stage 4: sparse response extraction (filings+transcripts, then news)
      def responses(src: DataFrame, respCol: String, nCol: String): DataFrame =
        src.filter(col("text").contains(ResponseMarker))
          .groupBy(GroupKey.map(col): _*)
          .agg(max(col("motivation")).as(respCol),
            countDistinct(col("document_id")).as(nCol))
      val ft = responses(
        kept.filter(col("document_type").isin("filings", "transcripts")),
        "filings_response", "filings_n_docs")
      val nw = responses(kept.filter(col("document_type") === "news"),
        "news_response", "news_n_docs")
      // stages 5+6: left-merge on the reference's key, fallback coalesce,
      // per-theme mean-normalized attention score. The response frames are
      // dimension-bounded (≤ |entities|×|themes|×|labels| rows no matter the
      // corpus size), so broadcast them explicitly — post-aggregation stats
      // are opaque to the planner at compile time and the fact side should
      // never shuffle for these merges
      byCompany
        .join(broadcast(ft), GroupKey, "left")
        .join(broadcast(nw), GroupKey, "left")
        .withColumn("response",
          coalesce(col("filings_response"), col("news_response"),
            lit("no response")))
        .withColumn("attention_score",
          round(col("n_docs") /
            avg(col("n_docs")).over(Window.partitionBy(col("theme"))), 6))
        .na.fill(0, Seq("filings_n_docs", "news_n_docs"))
        .select(col("entity_id"), col("entity_name"), col("theme"),
          col("label"), col("topic_summary"), col("n_docs"), col("magnitude"),
          col("filings_n_docs"), col("news_n_docs"), col("response"),
          col("attention_score"))
        .orderBy(col("entity_name"), col("theme"), col("label"))
    },
    Some {
      val searchedSelects = Themes.map { case (term, tag) =>
        s"""  SELECT document_id, headline, entity_id, entity_name,
           |         document_type, text, '$tag' AS theme
           |  FROM chunk WHERE contains(text, '$term')""".stripMargin
      }.mkString("\n  UNION ALL\n")
      s"""WITH ${Oracle.chunkCte},
         |searched AS (
         |$searchedSelects
         |),
         |kept AS (
         |  SELECT *, ${Oracle.motivationCase} AS motivation
         |  FROM (SELECT *, ${Oracle.labelCase} AS label FROM searched)
         |  WHERE label <> 'U'
         |),
         |by_company AS (
         |  SELECT entity_id, entity_name, theme, label,
         |         substr(array_to_string(
         |           list_sort(list(DISTINCT headline))[1:3], '; '), 1, 200)
         |           AS topic_summary,
         |         count(DISTINCT document_id) AS n_docs
         |  FROM kept WHERE document_type = 'news'
         |  GROUP BY 1, 2, 3, 4
         |),
         |ft AS (
         |  SELECT entity_id, entity_name, theme, label,
         |         max(motivation) AS filings_response,
         |         count(DISTINCT document_id) AS filings_n_docs
         |  FROM kept
         |  WHERE document_type IN ('filings', 'transcripts')
         |    AND contains(text, '$ResponseMarker')
         |  GROUP BY 1, 2, 3, 4
         |),
         |nw AS (
         |  SELECT entity_id, entity_name, theme, label,
         |         max(motivation) AS news_response,
         |         count(DISTINCT document_id) AS news_n_docs
         |  FROM kept
         |  WHERE document_type = 'news' AND contains(text, '$ResponseMarker')
         |  GROUP BY 1, 2, 3, 4
         |)
         |SELECT b.entity_id, b.entity_name, b.theme, b.label,
         |       b.topic_summary, b.n_docs,
         |       CASE WHEN b.n_docs >= 100 THEN 'High'
         |            WHEN b.n_docs >= 30 THEN 'Medium'
         |            ELSE 'Low' END AS magnitude,
         |       COALESCE(f.filings_n_docs, 0) AS filings_n_docs,
         |       COALESCE(n.news_n_docs, 0) AS news_n_docs,
         |       COALESCE(f.filings_response, n.news_response, 'no response')
         |         AS response,
         |       round(b.n_docs / avg(b.n_docs) OVER (PARTITION BY b.theme), 6)
         |         AS attention_score
         |FROM by_company b
         |LEFT JOIN ft f USING (entity_id, entity_name, theme, label)
         |LEFT JOIN nw n USING (entity_id, entity_name, theme, label)
         |ORDER BY b.entity_name, b.theme, b.label""".stripMargin
    })

  def queries: Seq[Q] = Seq(qReportPipeline)
}
