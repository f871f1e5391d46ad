package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Taxonomy trees (SURVEY.md §1.3): recursive
  * `{Node, Label, Summary, Children}` structures the reference generates with
  * an LLM (`Tracking_Inflation_Drivers/src/mind_map_tools.py:184-296`) and
  * then consumes relationally (leaf lists, label→parent maps —
  * `labels.py:448-472`).
  *
  * The engine's representation is the case-class tree for construction plus a
  * FLATTENED DataFrame (nodeId, parentId, label, summary, isLeaf, depth) for
  * execution — tree joins become broadcast equi-joins.
  */
final case class ThemeNode(node: Int, label: String, summary: String,
    children: Seq[ThemeNode] = Seq.empty)

object ThemeTree {

  /** Static fixture tree (deterministic stand-in for the LLM generator L3;
    * leaf labels deliberately match the stub classifier's P/A/N alphabet so
    * labeled rows roll up through it). */
  val fixture: ThemeNode = ThemeNode(1, "root", "engine efficiency themes", Seq(
    ThemeNode(2, "adoption", "who adopts the technology", Seq(
      ThemeNode(4, "P", "providers of the technology"),
      ThemeNode(5, "A", "adopters of the technology"))),
    ThemeNode(3, "risk", "costs and risks", Seq(
      ThemeNode(6, "N", "negative exposure"),
      ThemeNode(7, "U", "unclear or unassigned")))))

  final case class FlatNode(node_id: Int, parent_id: Int, label: String,
      summary: String, is_leaf: Boolean, depth: Int)

  def flatten(root: ThemeNode): Seq[FlatNode] = {
    def walk(n: ThemeNode, parent: Int, depth: Int): Seq[FlatNode] =
      FlatNode(n.node, parent, n.label, n.summary, n.children.isEmpty, depth) +:
        n.children.flatMap(walk(_, n.node, depth + 1))
    walk(root, -1, 0)
  }

  /** Leaf extraction (`mind_map_tools.py:103-130`). */
  def leaves(root: ThemeNode): Seq[ThemeNode] =
    if (root.children.isEmpty) Seq(root)
    else root.children.flatMap(leaves)

  /** label → parent-label map (`labels.py:448-472`). */
  def labelToParent(root: ThemeNode): Map[String, String] = {
    def walk(n: ThemeNode): Seq[(String, String)] =
      n.children.map(c => c.label -> n.label) ++ n.children.flatMap(walk)
    walk(root).toMap
  }

  /** The flattened tree as a (tiny, broadcastable) DataFrame. */
  def flatDf(spark: SparkSession, root: ThemeNode = fixture): DataFrame = {
    import spark.implicits._
    flatten(root).toDF()
  }

  /** "label:summary" stringification (`labels.py:296-298`). */
  def labelSummaries(root: ThemeNode): Seq[String] =
    leaves(root).map(n => s"${n.label}: ${n.summary}")
}
