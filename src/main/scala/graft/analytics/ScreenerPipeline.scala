package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Oracle, Q}
import graft.label.Labeler
import graft.model.{Tables, ThemeNode, ThemeTree}
import graft.query.QueryAlgebra._

/** §3.2 end-to-end thematic-screener pipeline (`ThematicScreener.ipynb`
  * cells 20-30 / `Risk_Analyzer.ipynb` cells 22-40, traced in SURVEY.md
  * §3.2) composed as ONE gated DataFrame pipeline — the screener sibling of
  * [[MarketPipeline]] (§3.1) and [[graft.report.ReportPipeline]] (§3.3).
  *
  * Stage map (reference line → gated building block → here):
  *  1. LLM theme tree (`generate_theme_tree`, `mind_map_tools.py:184-296`;
  *     `q_theme_tree`'s parse gate) → the fixture tree rendered to the
  *     reference's fenced-JSON response shape and re-parsed through the
  *     scrub+parse path; the PARSED tree drives every downstream stage
  *     (leaf alphabet, label→parent rollup), and a parse failure fails the
  *     query loudly instead of falling back — the tree is load-bearing;
  *  2. themed company search (`search_by_companies(companies, scope=
  *     TRANSCRIPTS, fiscal_year, ...)`, ipynb cell 24) → the algebra's
  *     transcripts-scope form: Any(ReportingEntity(watchlist)) ∧
  *     Source(transcripts) ∧ FiscalYear (`query_builder.py:292-298`
  *     substitutes ReportingEntity for Entity in that scope) — one scan,
  *     every conjunct pushable;
  *  3. label + terminal-labels join (`ScreenerLabeler.get_labels(labels=
  *     theme_tree.get_terminal_labels())`, cell 27) → stub labels, then an
  *     inner broadcast join against the parsed tree's (leaf label → parent
  *     theme) dimension — rows labeled outside the tree's alphabet drop,
  *     and each kept row carries its parent theme (`labels.py:448-472`);
  *  4. score matrix + Composite Score (`get_scored_df`,
  *     `mind_map_tools.py:559-578`, cell 30; `q_pivot_scores`' A3 shape) →
  *     one conditional-aggregation pass whose per-leaf count columns and
  *     per-parent rollup columns are GENERATED from the parsed tree
  *     (the static-alphabet `pivot` render is gated separately by
  *     `q_pivot_scores`; generating the columns from the tree is what makes
  *     the tree→matrix chain visible to the hash).
  *
  * Scale shape: one filtered scan (entity/scope/year conjuncts reach the
  * Parquet reader) → one broadcast dim join (|leaves| rows) → one hash
  * aggregate keyed by company (partial aggregation map-side) → top ordering
  * on the |companies|-bounded result. Nothing shuffles but the one groupBy.
  */
object ScreenerPipeline {

  private val Watchlist: Seq[String] = (1 to 8).map(i => s"s$i")
  private val FiscalYear = 1995
  private val Keywords = Seq("efficiency", "cost")

  /** Stage 1: the taxonomy round-trips through the reference's LLM-response
    * shape (fenced JSON → scrub → parse). Parse failure must fail the
    * pipeline, not silently reuse the fixture. */
  private def parsedTree: ThemeNode = {
    val fenced =
      "```json\n" + ThemeTree.toJson(ThemeTree.fixture, Keywords) + "\n```"
    ThemeTree.parseThemeTree(fenced).fold(
      err => throw new IllegalStateException(
        s"theme tree parse failed: $err"),
      _._1)
  }

  private val qScreenerPipeline = Q(
    "q_screener_pipeline",
    (s, d) => {
      val tree = parsedTree
      val parentOf = ThemeTree.labelToParent(tree)
      val leafThemes: Seq[(String, String)] =
        ThemeTree.leaves(tree).map(n => n.label -> parentOf(n.label))
      val themes = leafThemes.map(_._2).distinct
      import s.implicits._
      val leafDim = leafThemes.toDF("label", "theme")
      // stage 2: themed transcripts search over the company watchlist
      val q = AllQ(
        AnyQ(Watchlist.map(ReportingEntityQ(_)): _*),
        SourceQ("transcripts"),
        FiscalYearQ(FiscalYear))
      // reads orders scope columns, supplier names and the text — the
      // customer dim is eliminated by RI (Tables.chunkRowsPruned)
      val searched = Tables.chunkRowsPruned(s, d, withOrders = true,
        withSupplier = true, withText = true).filter(q.toColumn)
      // stage 3: label, keep the tree's terminal alphabet, attach parents
      val labeled = Labeler.withStubLabels(searched)
        .join(broadcast(leafDim), Seq("label"))
      // stage 4: score matrix — leaf counts + parent rollups + composite,
      // columns generated from the parsed tree
      val scoreCols =
        leafThemes.map { case (l, _) =>
          Labeler.countOf(col("label"), l).as(l) } ++
          themes.map(t =>
            Labeler.countOf(col("theme"), t).as(s"${t}_score")) :+
          count(lit(1)).as("composite_score")
      labeled
        .groupBy(col("entity_name"), col("entity_ticker"),
          col("entity_industry"))
        .agg(scoreCols.head, scoreCols.tail: _*)
        .orderBy(col("composite_score").desc, col("entity_name"))
    },
    Some {
      val tree = parsedTree
      val parentOf = ThemeTree.labelToParent(tree)
      val leafThemes = ThemeTree.leaves(tree).map(n => n.label -> parentOf(n.label))
      val themes = leafThemes.map(_._2).distinct
      // tree labels/themes reach the SQL as escaped literals and QUOTED
      // identifiers (Oracle.sqlLit/sqlIdent): the parse path is
      // load-bearing and the tree swappable, so a leaf label carrying a
      // quote, space, or reserved word must not produce invalid — or
      // silently wrong — oracle SQL far from the tree definition
      val leafValues = leafThemes
        .map { case (l, t) => s"(${Oracle.sqlLit(l)}, ${Oracle.sqlLit(t)})" }
        .mkString(", ")
      val reporting = Watchlist
        .map(id => s"(entity_id = ${Oracle.sqlLit(id)} AND is_reporting_entity)")
        .mkString("(", "\n      OR ", ")")
      val leafCols = leafThemes.map { case (l, _) =>
        s"CAST(sum(CASE WHEN label = ${Oracle.sqlLit(l)} THEN 1 ELSE 0 END) " +
          s"AS BIGINT) AS ${Oracle.sqlIdent(l)}"
      }
      val themeCols = themes.map(t =>
        s"CAST(sum(CASE WHEN theme = ${Oracle.sqlLit(t)} THEN 1 ELSE 0 END) " +
          s"AS BIGINT) AS ${Oracle.sqlIdent(s"${t}_score")}")
      s"""WITH ${Oracle.chunkCte},
         |searched AS (
         |  SELECT * FROM chunk
         |  WHERE document_type = 'transcripts'
         |    AND year(timestamp_utc) = $FiscalYear
         |    AND $reporting
         |),
         |labeled AS (
         |  SELECT s.*, leaf.theme
         |  FROM (SELECT *, ${Oracle.labelCase} AS label FROM searched) s
         |  JOIN (VALUES $leafValues) AS leaf(label, theme)
         |    ON s.label = leaf.label
         |)
         |SELECT entity_name, entity_ticker, entity_industry,
         |       ${(leafCols ++ themeCols).mkString(",\n       ")},
         |       count(*) AS composite_score
         |FROM labeled
         |GROUP BY 1, 2, 3
         |ORDER BY composite_score DESC, entity_name""".stripMargin
    })

  def queries: Seq[Q] = Seq(qScreenerPipeline)
}
