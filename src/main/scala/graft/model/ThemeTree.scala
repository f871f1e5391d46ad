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

  // ---- LLM-response JSON parse path (`mind_map_tools.py:289-296`) ----

  /** Scrub an LLM tree response the way the reference does: strip markdown
    * code fences and a leading `json` language tag, drop stray `⟩`
    * characters, trim. (The reference's blanket `re.sub('json', '', r)` would
    * also mangle CONTENT containing the substring "json"; scrubbing only the
    * leading language tag is behavior-identical on well-formed responses
    * without that corruption.) */
  def scrubResponse(raw: String): String =
    // strip only the WRAPPING fences (anchored), not every ``` in the
    // text: a Summary value legitimately containing a backtick run must
    // survive — the same rule (and reason) as Labeler.parseBatchResponse
    raw.trim
      .replaceAll("(?s)^```\\s*(?i:json)?\\s*", "")
      .replaceAll("(?s)\\s*```$", "")
      .replace("⟩", "")
      .replaceAll("^\\s*(?i:json)", "").trim

  /** Parse a `{Node, Label, Summary, Children[, Keywords]}` tree from a raw
    * LLM response. Two-stage fallback mirroring the reference's retry
    * behavior: (1) parse the scrubbed text; (2) if that fails, re-parse the
    * substring between the first '{' and last '}' (tolerates prose around
    * the JSON). Returns the tree + root Keywords, or an error message. */
  def parseThemeTree(raw: String): Either[String, (ThemeNode, Seq[String])] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods

    def intOf(v: JValue): Option[Int] = v match {
      // range-checked: an out-of-Int-range id (2^32+2) must FAIL the
      // parse like a fractional one, not wrap to a colliding small id
      case JInt(x) if x.isValidInt => Some(x.toInt)
      case JLong(x) if x >= Int.MinValue && x <= Int.MaxValue => Some(x.toInt)
      // LLMs routinely emit integral doubles ("Node": 2.0) — accept them;
      // a genuinely fractional Node id still fails the parse
      case JDouble(x) if x.isWhole && x >= Int.MinValue && x <= Int.MaxValue =>
        Some(x.toInt)
      case JDecimal(x) if x.isWhole && x.isValidInt => Some(x.toInt)
      case _ => None
    }
    def toNode(v: JValue): Either[String, ThemeNode] = v match {
      case JObject(fields) =>
        val m = fields.toMap
        val node = m.get("Node").flatMap(intOf)
        val label = m.get("Label").collect { case JString(x) => x }
        val summary = m.get("Summary").collect { case JString(x) => x }
          .getOrElse("")
        val kids: Either[String, Seq[ThemeNode]] = m.get("Children") match {
          case Some(JArray(xs)) =>
            xs.foldLeft(Right(Seq.empty): Either[String, Seq[ThemeNode]]) {
              case (Right(acc), x) => toNode(x).map(acc :+ _)
              case (l, _) => l
            }
          case None | Some(JNothing) | Some(JNull) => Right(Seq.empty)
          case Some(other) => Left(s"Children is not an array: $other")
        }
        (node, label) match {
          case (Some(n), Some(l)) => kids.map(ThemeNode(n, l, summary, _))
          case _ => Left(s"node missing Node/Label: ${m.keySet}")
        }
      case other => Left(s"not a JSON object: $other")
    }
    def attempt(s: String): Either[String, (ThemeNode, Seq[String])] =
      scala.util.Try(JsonMethods.parse(s)).toEither
        .left.map(e => s"parse error: ${e.getMessage}")
        .flatMap { jv =>
          toNode(jv).map { root =>
            val keywords = jv \ "Keywords" match {
              case JArray(xs) => xs.collect { case JString(x) => x }
              case _ => Seq.empty
            }
            (root, keywords)
          }
        }

    val scrubbed = scrubResponse(raw)
    attempt(scrubbed).left.flatMap { firstErr =>
      val i = scrubbed.indexOf('{')
      val j = scrubbed.lastIndexOf('}')
      if (i >= 0 && j > i) attempt(scrubbed.substring(i, j + 1))
        .left.map(e => s"$firstErr; fallback: $e")
      else Left(firstErr)
    }
  }

  /** Render a tree back to the reference's JSON shape (inverse of
    * [[parseThemeTree]]; used for round-trip property tests and as the
    * serialization a downstream prompt would embed). */
  def toJson(root: ThemeNode, keywords: Seq[String] = Seq.empty): String = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    def jNode(n: ThemeNode, withKeywords: Boolean): JObject = {
      val base = List(
        "Node" -> (JInt(n.node): JValue),
        "Label" -> (JString(n.label): JValue),
        "Summary" -> (JString(n.summary): JValue))
      val kw = if (withKeywords && keywords.nonEmpty)
        List("Keywords" -> (JArray(keywords.map(JString(_)).toList): JValue))
      else Nil
      val kids = List("Children" ->
        (JArray(n.children.map(jNode(_, withKeywords = false)).toList): JValue))
      JObject(base ++ kw ++ kids)
    }
    JsonMethods.compact(JsonMethods.render(jNode(root, withKeywords = true)))
  }
}
