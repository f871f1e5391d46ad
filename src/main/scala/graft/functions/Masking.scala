package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Entity masking / unmasking (SURVEY.md §2.3 P3/P5; reference algorithm at
  * `AI_Cost_Cutting_Market_Analysis/src/search.py:611-677` and
  * `labeling.py:23-44`).
  *
  * Pure string algorithm, ported semantically (not textually):
  *  - spans of the target entity → `"Target Company"`;
  *  - spans of other entities → `"Other Company_i"` with STABLE numbering: i
  *    is assigned per distinct entity key in order of first span appearance;
  *  - non-target spans overlapping a target span are skipped
  *    (`search.py:654`);
  *  - replacements applied right-to-left so earlier offsets stay valid;
  *  - emits the placeholder map (i → entity name) for unmasking.
  *
  * Registered as plain Scala UDFs: the inputs are an array-of-struct column
  * and two strings; the function is a per-row pure computation with no state,
  * so a codegen Expression would buy little — the surrounding plan stays in
  * whole-stage codegen and only this projection boxes.
  */
object Masking {

  final case class Span(key: String, name: String, start: Int, end: Int)

  final val TargetPlaceholder = "Target Company"
  final val OtherPrefix = "Other Company_"

  /** Keep-first overlap resolution: spans are scanned in (start, end) order
    * and one overlapping an already-kept span is DROPPED — the right-to-left
    * splice below is only offset-safe over disjoint spans (a nested/
    * overlapping NER mention would otherwise be spliced through the middle
    * of a just-inserted placeholder, garbling the text; the reference has
    * the same latent hazard, which its corpus never exercises). */
  private def disjointKeepFirst(spans: Seq[Span]): Seq[Span] = {
    val kept = scala.collection.mutable.ArrayBuffer.empty[Span]
    spans.foreach { sp =>
      if (!kept.exists(k => sp.start < k.end && k.start < sp.end)) kept += sp
    }
    kept.toSeq
  }

  /** @return (maskedText, placeholderMap as (idx, name) pairs) */
  def mask(text: String, spans: Seq[Span], targetKey: String): (String, Seq[(Int, String)]) = {
    val valid = spans
      .filter(sp => sp.start >= 0 && sp.end > sp.start && sp.end <= text.length)
      .sortBy(sp => (sp.start, sp.end))
    val targetSpans = disjointKeepFirst(valid.filter(_.key == targetKey))
    def overlapsTarget(sp: Span): Boolean =
      targetSpans.exists(t => sp.start < t.end && t.start < sp.end)
    val others = disjointKeepFirst(
      valid.filter(sp => sp.key != targetKey && !overlapsTarget(sp)))

    // stable numbering by first appearance of each distinct key
    val numbering = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    others.foreach(sp =>
      if (!numbering.contains(sp.key)) numbering(sp.key) = numbering.size + 1)

    val replacements =
      targetSpans.map(sp => (sp, TargetPlaceholder)) ++
        others.map(sp => (sp, OtherPrefix + numbering(sp.key)))
    val masked = replacements.sortBy(-_._1.start).foldLeft(text) {
      case (acc, (sp, ph)) =>
        acc.substring(0, sp.start) + ph + acc.substring(sp.end)
    }
    val phMap = others.groupBy(_.key).toSeq
      .map { case (k, sps) => (numbering(k), sps.head.name) }
      .sortBy(_._1)
    (masked, phMap)
  }

  /** P5: regex-replace placeholders back to names
    * (`labeling.py:23-44`): `Target Company(_\d{1,2})?` → target name
    * FIRST, then `Other Company_k` → mapped name — the reference's order
    * (`re.sub` at labeling.py:30 precedes the loop at :35). The order is
    * load-bearing, not style: a restored OTHER name containing the literal
    * "Target Company" (e.g. "Target Company Holdings") must survive, and
    * an others-first fold would hand it to the target regex to corrupt.
    * The `{1,2}` suffix bound also mirrors the reference verbatim. */
  def unmask(masked: String, targetName: String, phMap: Seq[(Int, String)]): String = {
    val withTarget = masked.replaceAll("Target Company(_\\d{1,2})?",
      java.util.regex.Matcher.quoteReplacement(targetName))
    phMap.sortBy(-_._1).foldLeft(withTarget) {
      case (acc, (idx, name)) => acc.replace(OtherPrefix + idx, name)
    }
  }

  /** UDF over (text, entities array<struct<key,name,start,end>>, target_key)
    * → struct<masked_text, ph_map array<struct<idx,name>>>.
    *
    * OFFSET CONTRACT: span offsets are Unicode CODE POINTS — the unit every
    * producer in this engine emits (`Tables.tokenStarts`, Spark
    * `length`/`instr`/`substring`, DuckDB `strpos`/`substr` all count code
    * points). [[mask]] itself splices a Java String (UTF-16 code units), so
    * the UDF converts each span before splicing; on BMP-only text the two
    * units coincide and the conversion is the identity. Spans whose bounds
    * fall outside the text's code-point count are dropped, same as [[mask]]
    * drops out-of-bounds code-unit spans. */
  val maskUdf: UserDefinedFunction =
    udf((text: String, entities: Seq[Row], targetKey: String) => {
      val t = Option(text).getOrElse("")
      val cpCount = t.codePointCount(0, t.length)
      val raw = Option(entities).getOrElse(Seq.empty).map { r =>
        (r.getString(0), r.getString(1), r.getInt(2), r.getInt(3))
      }
      // convert all distinct in-bounds code-point offsets in ONE forward
      // pass (offsetByCodePoints from the previous offset, not from 0) —
      // a per-span conversion from index 0 would rescan the string per
      // bound, O(spans · |text|) on the many-span production shape
      val cuOf = {
        val offsets = raw.iterator
          .flatMap { case (_, _, s, e) => Iterator(s, e) }
          .filter(o => o >= 0 && o <= cpCount).toSeq.distinct.sorted
        var cp = 0
        var cu = 0
        offsets.map { o =>
          cu = t.offsetByCodePoints(cu, o - cp); cp = o; o -> cu
        }.toMap
      }
      val spans = raw.flatMap { case (key, name, s, e) =>
        if (s >= 0 && e >= s && e <= cpCount)
          Some(Span(key, name, cuOf(s), cuOf(e)))
        else None
      }
      mask(t, spans, targetKey)
    })

  val unmaskUdf: UserDefinedFunction =
    udf((masked: String, targetName: String, phMap: Seq[Row]) => {
      val m = Option(phMap).getOrElse(Seq.empty)
        .map(r => (r.getInt(0), r.getString(1)))
      unmask(Option(masked).getOrElse(""), targetName, m)
    })
}
