package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Oracle, Q}
import graft.label.Labeler
import graft.model.Tables

/** Graph operators (SURVEY.md §2.12, G1-G5) as plain edge DataFrames —
  * the reference materializes NetworkX graphs
  * (`network_analysis.py:129-196`, `visualization_tools.py:608-695`); the
  * relational core is a self-join + grouped aggregation, which scales where a
  * driver-side graph object cannot.
  *
  * Skew note: the co-mention self-join keys on document_id; a viral document
  * with k provider rows × m user rows emits k·m pairs. AQE skew-join splits
  * such partitions at runtime; for known-hot keys, salting the join key is the
  * static alternative.
  */
object GraphOps {

  private def labeled(s: SparkSession, d: String): DataFrame =
    Labeler.withStubLabels(Tables.chunkRows(s, d))

  /** G1+G2+J8+G3: role tagging (label P = provider, A = user/adopter),
    * co-mention pairing within a document, edge weight = pair count, payload
    * exemplar, minimum-occurrence filter (weight ≥ 2). */
  private val qComentionEdges = Q(
    "q_comention_edges",
    (s, d) => {
      val lc = labeled(s, d)
      val prov = lc.filter(col("label") === "P")
        .select(col("document_id"), col("entity_name").as("src"), col("headline"))
      val user = lc.filter(col("label") === "A")
        .select(col("document_id"), col("entity_name").as("dst"))
      prov.join(user, Seq("document_id"))
        .filter(col("src") =!= col("dst"))
        .groupBy(col("src"), col("dst"))
        .agg(count(lit(1)).as("weight"),
          max(col("headline")).as("example_headline"))
        .filter(col("weight") >= 2)
        .orderBy(col("src"), col("dst"))
    },
    Some(
      s"""${Oracle.labeledCte}
         |SELECT p.entity_name AS src, u.entity_name AS dst,
         |       count(*) AS weight, max(p.headline) AS example_headline
         |FROM labeled p
         |JOIN labeled u ON p.document_id = u.document_id
         |WHERE p.label = 'P' AND u.label = 'A'
         |  AND p.entity_name <> u.entity_name
         |GROUP BY 1, 2
         |HAVING count(*) >= 2
         |ORDER BY src, dst""".stripMargin))

  /** G4+G5: bipartite supplier–customer edges (distinct-sentence weight +
    * majority label per edge) with a degree filter: keep customers connected
    * to more than 2 suppliers (`visualization_tools.py:608-651, 675`). */
  private val qBipartiteDegree = Q(
    "q_bipartite_degree",
    (s, d) => {
      val lc = labeled(s, d)
      val w = lc.groupBy(col("entity_name").as("src"),
        col("other_entity_name").as("dst"))
        .agg(countDistinct(col("sentence_id")).as("weight"))
      val maj = lc.groupBy(col("entity_name").as("src"),
        col("other_entity_name").as("dst"), col("label"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("src"), col("dst"))
        .agg(max_by(col("label"), struct(col("cnt"), col("label")))
          .as("major_label"))
      val edges = w.join(maj, Seq("src", "dst"))
      val hubs = edges.groupBy(col("dst"))
        .agg(countDistinct(col("src")).as("deg"))
        .filter(col("deg") > 2)
        .select(col("dst"))
      edges.join(hubs, Seq("dst"), "left_semi")
        .select(col("src"), col("dst"), col("weight"), col("major_label"))
        .orderBy(col("src"), col("dst"))
    },
    Some(
      s"""${Oracle.labeledCte},
         |w AS (
         |  SELECT entity_name AS src, other_entity_name AS dst,
         |         count(DISTINCT sentence_id) AS weight
         |  FROM labeled GROUP BY 1, 2
         |),
         |maj AS (
         |  SELECT src, dst, label AS major_label FROM (
         |    SELECT entity_name AS src, other_entity_name AS dst, label,
         |           count(*) AS cnt
         |    FROM labeled GROUP BY 1, 2, 3
         |  )
         |  QUALIFY row_number() OVER (PARTITION BY src, dst
         |                             ORDER BY cnt DESC, label DESC) = 1
         |),
         |edges AS (
         |  SELECT w.src, w.dst, w.weight, maj.major_label
         |  FROM w JOIN maj ON w.src = maj.src AND w.dst = maj.dst
         |)
         |SELECT src, dst, weight, major_label FROM edges
         |WHERE dst IN (
         |  SELECT dst FROM edges GROUP BY dst HAVING count(DISTINCT src) > 2)
         |ORDER BY src, dst""".stripMargin))

  def queries: Seq[Q] = Seq(qComentionEdges, qBipartiteDegree)
}
