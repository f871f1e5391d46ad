package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark builder plus (when SQL-expressible) its
  * DuckDB oracle. Both sides MUST produce identical column names and a total
  * deterministic row order (the correctness gate hash-compares values).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Registry {
  def all: Seq[Q] =
    graft.sources.SourceOps.queries ++
      graft.analytics.Relational.queries ++
      graft.analytics.TimeSeriesOps.queries ++
      graft.analytics.Baskets.queries ++
      graft.analytics.MarketPipeline.queries ++
      graft.analytics.ScreenerPipeline.queries ++
      graft.analytics.NarrativePipeline.queries ++
      graft.analytics.ElectionPipeline.queries ++
      graft.analytics.BoardPipeline.queries ++
      graft.analytics.Sessions.queries ++
      graft.analytics.AsOf.queries ++
      graft.ingest.ChunkOps.queries ++
      graft.graph.GraphOps.queries ++
      graft.graph.NetworkPipeline.queries ++
      graft.text.TextOps.queries ++
      graft.text.CorpusOps.queries ++
      graft.sim.SimilarityOps.queries ++
      graft.media.MultimodalOps.queries ++
      graft.summarize.SummarizeOps.queries ++
      graft.ml.MlOps.queries ++
      graft.report.Presentation.queries ++
      graft.report.ReportPipeline.queries ++
      graft.label.Labeler.queries
}
