package graft.report

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.{col, lit, nanvl}

/** HTML report sink (SURVEY.md §2.1 S9): the reference renders per-entity
  * HTML reports driver-side from collected rows
  * (`Report_Generator_AI_Threats/src/tool.py:131-351`,
  * `src/html_report.py`). The engine keeps the same contract: rendering
  * happens AFTER aggregation, on a result that is small by construction
  * (the collect here is the presentation boundary, not a distributed
  * operator — callers pass a bounded, already-aggregated DataFrame).
  *
  * Two renders: [[render]] is the generic escaped table; [[entityReport]]
  * reproduces the reference's per-entity report template — definitions
  * box, one bordered block per entity with a score box (rows of
  * `label: value` pairs, floats "%.2f", nulls "N/A") and side-by-side
  * summary boxes (nulls fall back to the reference's "No relevant content
  * was retrieved."), under the same CSS class vocabulary
  * (`report-container/-entity/-score-box/-criterion-box/…`). One
  * deliberate deviation: all interpolated values are HTML-escaped (the
  * reference f-strings them raw).
  */
object ReportSink {

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Deterministic HTML table render of a (bounded) result. */
  def render(df: DataFrame, title: String, maxRows: Int = 1000): String = {
    val cols = df.columns.toSeq
    val rows = df.limit(maxRows).collect()
    val header = cols.map(c => s"<th>${esc(c)}</th>").mkString
    val body = rows.map { r =>
      cols.indices.map { i =>
        val v = if (r.isNullAt(i)) "" else r.get(i).toString
        s"<td>${esc(v)}</td>"
      }.mkString("<tr>", "", "</tr>")
    }.mkString("\n")
    s"""<!DOCTYPE html>
       |<html><head><meta charset="utf-8"><title>${esc(title)}</title></head>
       |<body><h1>${esc(title)}</h1>
       |<table border="1"><thead><tr>$header</tr></thead>
       |<tbody>
       |$body
       |</tbody></table>
       |<p>${rows.length} rows</p>
       |</body></html>""".stripMargin
  }

  def write(df: DataFrame, title: String, path: String, maxRows: Int = 1000): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      render(df, title, maxRows))

  /** One `label: value` cell of the entity score box. Numeric rendering is
    * the reference's (`html_report.py:32-37`): fractional types "%.2f",
    * integral types verbatim, null "N/A". */
  final case class ScoreSpec(column: String, label: String)

  /** One summary criterion box (`html_report.py:64-76`): `boxTitle` is the
    * h4, the column's text the body, null → the reference's fallback. */
  final case class SummarySpec(column: String, boxTitle: String)

  private val NoContent = "No relevant content was retrieved."

  private def fmtValue(r: Row, i: Int): String =
    if (r.isNullAt(i)) "N/A"
    else r.get(i) match {
      // NaN renders "N/A" like NULL: pandas pd.notnull(NaN) is False, so
      // the reference prints N/A for both missing shapes
      case d: Double if d.isNaN => "N/A"
      case f: Float if f.isNaN => "N/A"
      case d: Double => String.format(java.util.Locale.ROOT, "%.2f", Double.box(d))
      case f: Float => String.format(java.util.Locale.ROOT, "%.2f", Double.box(f.toDouble))
      case d: java.math.BigDecimal =>
        String.format(java.util.Locale.ROOT, "%.2f", Double.box(d.doubleValue()))
      case other => other.toString
    }

  /** The reference's report CSS, class-for-class
    * (`html_report.py:106-192`), minified: the structural vocabulary the
    * template (and ReportSinkSpec) keys on. */
  private val reportCss: String = Seq(
    ".report-container{font-family:Arial,sans-serif;padding:30px;background-color:#ffffff;color:#333}",
    ".report-container h1{color:#003A70;font-size:24px;margin-bottom:5px;font-weight:700;text-align:center}",
    ".report-date{font-size:16px;color:#555;margin-bottom:20px;text-align:center}",
    ".report-section-box{border:1px solid #003A70;padding:15px;margin:25px 0;border-radius:8px;background:#FAFBFC}",
    ".report-section-title{font-size:22px;color:#003A70;margin:0 0 15px 0;text-align:left}",
    ".report-entity{border:2px solid #003A70;margin:15px 0;padding:20px;border-radius:8px;background:#F7F9FC}",
    ".report-score-box{border:1px solid #B0B0B0;padding:10px;margin:10px 0;background:#FFFFFF;border-radius:5px}",
    ".score-row{display:flex;gap:10px;flex-wrap:wrap}",
    ".score-row p{margin:5px 0;font-size:14px;color:#333}",
    ".report-flex-container{display:flex;flex-wrap:wrap;gap:15px;justify-content:space-between}",
    ".report-criterion-box{flex:1;min-width:200px;padding:15px;border:1px solid #B0B0B0;border-radius:5px;background:#FFFFFF}",
    ".report-criterion-box h4{margin-top:0;color:#003A70}",
    "h3{margin-bottom:5px;font-size:20px;color:#003A70}").mkString("\n")

  /** Per-entity HTML report, structurally faithful to the reference
    * template (`tool.py:131-351` / `html_report.py:8-211`): `<h1>` title +
    * dated header, a "Score Definitions" section box, then the main section
    * box with one `report-entity` block per input row — `<h3>` entity
    * header, a `report-score-box` with one `score-row` per entry of
    * `scoreRows` (multiple specs in a row joined " / ", the reference's
    * score/doc-count pairing), and a `report-flex-container` of
    * `report-criterion-box` summaries.
    *
    * Bounded-driver-render discipline (same as the xlsx sink and the
    * spring layout): a report wider than `maxEntities` THROWS rather than
    * silently truncates — reports are human artifacts; an unreadable one is
    * a spec error upstream, not a scale path. `reportDate` is injectable
    * (the reference stamps `datetime.now`); defaults to today in the
    * reference's "%B %d, %Y" rendering. */
  def entityReport(df: DataFrame, title: String,
      definitions: Seq[(String, String)], sectionTitle: String,
      scoreRows: Seq[Seq[ScoreSpec]], summaries: Seq[SummarySpec],
      entityCol: String = "entity_name",
      reportDate: String = java.time.LocalDate.now.format(
        java.time.format.DateTimeFormatter.ofPattern("MMMM dd, yyyy",
          java.util.Locale.ROOT)),
      maxEntities: Int = 1000): String = {
    val cols = entityCol +: (scoreRows.flatten.map(_.column) ++
      summaries.map(_.column))
    val rows = df.select(cols.map(col): _*).limit(maxEntities + 1).collect()
    require(rows.length <= maxEntities,
      s"report has > $maxEntities entities — aggregate or filter upstream " +
        "(a report this wide is unreadable; this sink never truncates silently)")
    val colIdx = cols.zipWithIndex.toMap

    val entitySections = rows.map { r =>
      val scoreBox = scoreRows.map { row =>
        // the reference joins a row's label:value strings with " / "
        // INSIDE one <p> (tool.py:186-200) — not as separate paragraphs
        val cells = row.map(sp =>
          s"<strong>${esc(sp.label)}:</strong> ${esc(fmtValue(r, colIdx(sp.column)))}")
        s"""<div class="score-row"><p>${cells.mkString(" / ")}</p></div>"""
      }.mkString("\n")
      val summaryBoxes = summaries.map { sm =>
        val i = colIdx(sm.column)
        val body = if (r.isNullAt(i)) NoContent else r.get(i).toString
        s"""<div class="report-criterion-box"><h4>${esc(sm.boxTitle)}</h4><p>${esc(body)}</p></div>"""
      }.mkString("\n")
      s"""<div class='report-entity'>
         |<h3>${esc(if (r.isNullAt(0)) "N/A" else r.get(0).toString)}</h3>
         |<div class="report-score-box">
         |$scoreBox
         |</div>
         |<div class="report-flex-container">
         |$summaryBoxes
         |</div>
         |</div>""".stripMargin
    }.mkString("\n")

    val definitionsHtml = definitions.map { case (score, defn) =>
      s"<p><strong>${esc(score)}</strong>: ${esc(defn)}</p>"
    }.mkString("\n")

    s"""<!DOCTYPE html>
       |<html lang="en">
       |<head>
       |<meta charset="UTF-8">
       |<meta name="viewport" content="width=device-width, initial-scale=1.0">
       |<title>${esc(title)}</title>
       |<style>
       |$reportCss
       |</style>
       |</head>
       |<body>
       |<div class="report-container">
       |<h1>${esc(title)}</h1>
       |<div class="report-date">${esc(reportDate)}</div>
       |<div class="report-section-box">
       |<p class="report-section-title">Score Definitions</p>
       |$definitionsHtml
       |</div>
       |<div class="report-section-box">
       |<p class="report-section-title">${esc(sectionTitle)}</p>
       |$entitySections
       |</div>
       |</div>
       |</body>
       |</html>""".stripMargin
  }

  /** The reference's top/bottom/all section selection
    * (`html_report.py:214-244` `display_report`): "top" sorts `score`
    * descending, "bottom" ascending — both take `nbEntities` and title the
    * section "Top/Bottom N Companies for {display name}" — "all" sorts by
    * entity name with an empty section title. NULL AND NaN scores sort LAST
    * in both directions (pandas puts NaN last regardless of `ascending`;
    * Spark's default asc puts NULL first and its desc puts NaN first, so
    * NaN is folded into NULL for ordering). Ties broken by entity name so
    * the report is deterministic (the reference inherits pandas sort
    * stability instead). Returns (section DataFrame, section title). */
  def sectionFor(df: DataFrame, score: String, scoreName: String,
      top: String, nbEntities: Int,
      entityCol: String = "entity_name"): (DataFrame, String) = {
    // nanvl is only defined on float/double; other numeric types carry no
    // NaN, so they order on the raw column
    val key = df.schema(score).dataType match {
      case org.apache.spark.sql.types.DoubleType |
           org.apache.spark.sql.types.FloatType =>
        nanvl(col(score), lit(null).cast("double"))
      case _ => col(score)
    }
    top match {
    case "top" =>
      (df.orderBy(key.desc_nulls_last, col(entityCol))
        .limit(nbEntities),
        s"Top $nbEntities Companies for $scoreName")
    case "bottom" =>
      (df.orderBy(key.asc_nulls_last, col(entityCol))
        .limit(nbEntities),
        s"Bottom $nbEntities Companies for $scoreName")
    case "all" => (df.orderBy(col(entityCol)), "")
    case other => throw new IllegalArgumentException(
      s"top must be 'top', 'bottom', or 'all', got '$other'")
    }
  }

  def writeEntityReport(df: DataFrame, title: String,
      definitions: Seq[(String, String)], sectionTitle: String,
      scoreRows: Seq[Seq[ScoreSpec]], summaries: Seq[SummarySpec],
      path: String, entityCol: String = "entity_name"): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      entityReport(df, title, definitions, sectionTitle, scoreRows,
        summaries, entityCol))

  /** Python `str.title()` for the theme-report group header: a CASED
    * letter following an uncased character is titlecased, one following a
    * cased character is lowered; uncased characters (digits, hyphens, but
    * also uncased LETTERS — CJK, most modifier letters) pass through and
    * break "words". Word state tracks CASED-ness, not letter-ness, to
    * match CPython: `"中a".title()` is `"中A"` (中 is an uncased letter, so
    * `a` starts a new word). "cost-push" → "Cost-Push".
    *
    * Iterates CODE POINTS, not UTF-16 units (CPython strings are code
    * points): a supplementary-plane cased letter — Deseret `𐐀`,
    * mathematical `𝕒` — is one cased character there, and a unit-wise walk
    * would see two uncased surrogates, break the word, and titlecase the
    * next letter. Case maps are the FULL (possibly multi-char) mappings
    * CPython applies: lowering via `String.toLowerCase(ROOT)` (`İ` → `i̇`),
    * titlecasing via `Character.toTitleCase` when a simple mapping exists
    * (`ǆ` → `ǅ`) and otherwise via the full-uppercase expansion with every
    * cased character after the first re-lowered — `ß` → `SS` → `Ss`,
    * `ﬁ` → `FI` → `Fi`, `ŉ` → `ʼN` (the leading modifier is uncased, so
    * `N` is the kept-upper "first"), matching CPython's SpecialCasing
    * titlecase table without hardcoding it. */
  private[graft] def pyTitle(s: String): String = {
    def isCased(cp: Int) =
      Character.isUpperCase(cp) || Character.isLowerCase(cp) ||
        Character.getType(cp) == Character.TITLECASE_LETTER
    def one(cp: Int) = new String(Character.toChars(cp))
    def fullLower(cp: Int) = one(cp).toLowerCase(java.util.Locale.ROOT)
    def fullTitle(cp: Int): String = {
      val t = Character.toTitleCase(cp)
      if (t != cp) one(t)
      // a char that IS its own titlecase form — upper (İ), titlecase (ǅ) —
      // stays itself; only a LOWERCASE char with no simple mapping falls
      // through to the full-uppercase expansion ('ǅa'.title() is 'ǅa',
      // not 'Ǆa')
      else if (Character.isUpperCase(cp) ||
        Character.getType(cp) == Character.TITLECASE_LETTER) one(cp)
      else {
        val up = one(cp).toUpperCase(java.util.Locale.ROOT)
        if (up == one(cp)) up // no case mapping at all (𝕒)
        else { // multi-char expansion: keep the first CASED unit upper
          val sb = new java.lang.StringBuilder(up.length)
          var seenCased = false
          var j = 0
          while (j < up.length) {
            val ucp = up.codePointAt(j)
            if (isCased(ucp) && seenCased) sb.append(fullLower(ucp))
            else { sb.appendCodePoint(ucp); if (isCased(ucp)) seenCased = true }
            j += Character.charCount(ucp)
          }
          sb.toString
        }
      }
    }
    val sb = new java.lang.StringBuilder(s.length)
    var prevCased = false
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (isCased(cp)) {
        sb.append(if (prevCased) fullLower(cp) else fullTitle(cp))
        prevCased = true
      } else { sb.appendCodePoint(cp); prevCased = false }
      i += Character.charCount(cp)
    }
    sb.toString
  }

  /** The reference's theme-report CSS
    * (`Tracking_Inflation_Drivers/src/summarize.py:235-266`), minified. */
  private val themeCss: String = Seq(
    "body{font-family:Arial,sans-serif;margin:20px;line-height:1.6;background-color:white;color:#333}",
    "h1{color:#333}",
    "h2{color:#555}",
    "p{margin:10px 0}",
    ".label{font-weight:bold;color:white;background-color:blue;padding:5px;border-radius:3px;display:inline-block}",
    ".theme{margin-top:30px;border-top:2px solid #ccc;padding-top:20px;padding-bottom:20px}").mkString("\n")

  /** Macro theme report — the reference's SECOND report template
    * (`Tracking_Inflation_Drivers/src/summarize.py:222-285`
    * `create_html_report`): `<h1>{theme} Report</h1>`, a
    * `Report from {start} to {end}` line, the LLM intro paragraph, then
    * one `<h2>{Label} Factors</h2>` group per label (groups in label
    * order — the reference's pandas `groupby` sorts keys; rows keep their
    * input order within a group) of
    * `<p class="topic-summary"><strong>{theme}: {topic}.</strong>
    * {summary} </p>` paragraphs. The label header reproduces the
    * template's `label.replace("factors", "").title()` quirk via
    * [[pyTitle]]. An empty input returns the reference's literal
    * no-data paragraph. Same deliberate deviation as [[entityReport]]:
    * interpolated values are HTML-escaped (the reference f-strings them
    * raw); same bounded-driver-render discipline: wider than `maxTopics`
    * THROWS instead of truncating. */
  def themeReport(df: DataFrame, mainTheme: String, startDate: String,
      endDate: String, introSection: String,
      maxTopics: Int = 1000): String = {
    val all = df.select(col("label"), col("theme"), col("topic"),
      col("topic_summary")).limit(maxTopics + 1).collect()
    require(all.length <= maxTopics,
      s"report has > $maxTopics topics — aggregate or filter upstream " +
        "(this sink never truncates silently)")
    if (all.isEmpty) return "<p>No data available to display.</p>"
    // null-label rows are DROPPED (after the emptiness check, matching the
    // reference's order of operations): pandas `df.groupby('label')`
    // silently omits NaN-keyed groups, so a failed labeling stage's topics
    // disappear from the reference report too — while a non-empty all-null
    // frame still renders the header-and-intro shell there, not the
    // no-data paragraph
    val rows = all.filter(!_.isNullAt(0))
    val groups = rows.toSeq.groupBy(_.getString(0)).toSeq.sortBy(_._1)
    val sections = groups.map { case (label, rs) =>
      val header =
        s"<h2>${esc(pyTitle(label.replace("factors", "")))} Factors</h2>"
      val ps = rs.map { r =>
        def v(i: Int) = if (r.isNullAt(i)) "" else r.get(i).toString
        s"""<p class="topic-summary"><strong>${esc(v(1))}: ${esc(v(2))}.</strong> ${esc(v(3))} </p>"""
      }.mkString("\n")
      header + "\n" + ps
    }.mkString("\n")
    s"""<!DOCTYPE html>
       |<html lang="en">
       |<head>
       |<meta charset="UTF-8">
       |<meta name="viewport" content="width=device-width, initial-scale=1.0">
       |<title>${esc(mainTheme)}</title>
       |<style>
       |$themeCss
       |</style>
       |</head>
       |<body>
       |<h1>${esc(mainTheme)} Report</h1>
       |<p>Report from ${esc(startDate)} to ${esc(endDate)}</p>
       |<p>${esc(introSection)}</p>
       |$sections
       |</body>
       |</html>""".stripMargin
  }

  def writeThemeReport(df: DataFrame, mainTheme: String, startDate: String,
      endDate: String, introSection: String, path: String): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      themeReport(df, mainTheme, startDate, endDate, introSection))
}
