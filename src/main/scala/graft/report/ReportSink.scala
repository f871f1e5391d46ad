package graft.report

import org.apache.spark.sql.DataFrame

/** HTML report sink (SURVEY.md §2.1 S9): the reference renders per-entity
  * HTML reports driver-side from collected rows
  * (`Report_Generator_AI_Threats/src/tool.py:131-351`). The engine keeps the
  * same contract: rendering happens AFTER aggregation, on a result that is
  * small by construction (the collect here is the presentation boundary, not
  * a distributed operator — callers pass a bounded, already-aggregated
  * DataFrame).
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
}
