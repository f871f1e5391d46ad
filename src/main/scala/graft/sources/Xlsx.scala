package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S6/S7 in BINARY form: a real multi-sheet `.xlsx` workbook sink and source
  * (SURVEY.md §2.1) built on nothing but the JDK — an xlsx file is a zip of
  * OOXML parts, so `java.util.zip` + `javax.xml.parsers` cover both
  * directions without any spreadsheet library.
  *
  * Reference contract being reproduced:
  *  - sink: `ExcelManager.save_workbook(df_args, path)` with
  *    `df_args = [(df, sheet_name, (start_row, start_col)), ...]`
  *    (`AI_Cost_Cutting_Market_Analysis.ipynb` cell 41) — multiple result
  *    tables into one workbook, each at a cell offset;
  *  - source: `pd.read_excel(file_path, header=1)` then drop `Unnamed:`
  *    columns, parse `Date`, stamp `Source_Type`
  *    (`Narrative_Miners/src/tool.py:10-26` `load_results`).
  *
  * Spark-first scoping, same decision as [[graft.report.ReportSink]] (S9):
  * workbooks are a PRESENTATION boundary. The sink collects only bounded,
  * already-aggregated results (guarded by `maxRows` — it throws rather than
  * silently truncate), and the source materializes a bounded grid on the
  * driver before handing Spark a typed DataFrame. Neither is a 100 TB path;
  * the 100 TB paths write parquet ([[SourceOps.cached]],
  * [[SourceOps.writeBucketed]]).
  *
  * Writer layout (mirrors what `load_results` expects to find): at the sheet
  * offset a one-cell BANNER row (the sheet title), then the header row —
  * with a blank first cell over the written row-index column (pandas renders
  * a blank header as `Unnamed: 0`) — then data rows. Reading back with
  * `header = 1` therefore skips the banner, takes the real header, and the
  * quirk rule drops the index column: a faithful round-trip of the
  * reference's own workbook shape.
  *
  * Cell typing: strings are written as inline strings (`t="inlineStr"` — no
  * sharedStrings indirection needed on write), numbers as numeric cells,
  * booleans as `t="b"`, dates/timestamps as ISO strings (type-stable
  * round-trip, same decision as [[SourceOps.writeSheet]]), null as an
  * omitted cell. The READER additionally understands `t="s"` sharedStrings
  * and `t="str"` formula-cache cells, so workbooks produced by openpyxl/
  * pandas (which always use sharedStrings) load too — that is what makes
  * this a source for foreign files, not just an echo of our own sink.
  */
object Xlsx {

  // ---------------------------------------------------------------- shared

  /** 0-based column index → A1-style letters (0→A, 25→Z, 26→AA). */
  private[graft] def colLetters(c: Int): String = {
    val sb = new StringBuilder
    var n = c
    while (n >= 0) {
      sb.insert(0, ('A' + n % 26).toChar)
      n = n / 26 - 1
    }
    sb.toString
  }

  /** A1-style reference → (row0, col0). Letters are case-normalized: a
    * lowercase ref (`a1` — spec-nonconforming but emitted by some writers)
    * must map to column A, not silently land 32 columns away via the
    * un-normalized arithmetic. */
  private[graft] def parseRef(ref: String): (Int, Int) = {
    val letters = ref.takeWhile(_.isLetter).toUpperCase(java.util.Locale.ROOT)
    val digits = ref.drop(letters.length)
    val col = letters.foldLeft(0)((a, ch) => a * 26 + (ch - 'A' + 1)) - 1
    (digits.toInt - 1, col)
  }

  private def escXml(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  /** OOXML `_xHHHH_` escaping for characters ILLEGAL in XML 1.0: C0
    * controls other than tab/newline/CR, the non-characters U+FFFE/U+FFFF,
    * and UNPAIRED surrogate code units (scraped text carries all three; a
    * verbatim write would produce a workbook that throws a
    * SAXParseException at read time — far from the producing query).
    * Properly PAIRED surrogates encode legal supplementary-plane
    * characters and pass through untouched. A literal substring that LOOKS
    * like an escape is itself escaped (`_x` → `_x005F_x`, the spec's
    * convention) so the round-trip is unambiguous. */
  private val EscapeLikeRe = "_x([0-9A-Fa-f]{4})_".r
  private def isHexDigit(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'A' && c <= 'F') || (c >= 'a' && c <= 'f')
  /** Guard literal substrings that could be MISTAKEN for escapes at read
    * time: `_x` + 4 hex is rewritten `_x005F_x` (the spec's convention)
    * when followed by `_` (the classic look-alike), by a character the
    * illegal-char pass is ABOUT to replace (escaping that follower emits
    * `_xHHHH_`, whose leading underscore would complete the unguarded
    * literal into a decodable escape — "_x0041"+U+0001 must not become
    * `_x0041_x0001_`, which unescapes to "Ax0001_"), or by end-of-string
    * (harmless today, but guarding it keeps the invariant local: no
    * unguarded `_x`+hex4 ever reaches the escaper's output where a later
    * writer change could complete it). Only the two chars `_x` are
    * consumed per guard — adjacent look-alikes share their boundary
    * underscore (`_x0041_x0042_`), and consuming it would leave the
    * second run unguarded. */
  private def guardEscapeLiterals(s: String): String = {
    if (!s.contains("_x")) return s
    val sb = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '_' && i + 5 < s.length && s.charAt(i + 1) == 'x' &&
          isHexDigit(s.charAt(i + 2)) && isHexDigit(s.charAt(i + 3)) &&
          isHexDigit(s.charAt(i + 4)) && isHexDigit(s.charAt(i + 5)) &&
          (i + 6 == s.length || s.charAt(i + 6) == '_' ||
            !xmlLegalAt(s, i + 6))) {
        sb.append("_x005F_x")
        i += 2
      } else { sb.append(s.charAt(i)); i += 1 }
    }
    sb.toString
  }
  /** Is the UTF-16 code unit at `i` legal in XML 1.0 in its context?
    * (Char 9 | A | D | [0x20-0xD7FF] | [0xE000-0xFFFD]; a surrogate is
    * legal only as half of a proper high+low pair.) */
  private def xmlLegalAt(s: String, i: Int): Boolean = {
    val ch = s.charAt(i)
    if (ch >= 0x20 && ch < 0xD800) true
    else if (ch == '\t' || ch == '\n' || ch == '\r') true
    else if (ch >= 0xE000 && ch <= 0xFFFD) true
    else if (Character.isHighSurrogate(ch))
      i + 1 < s.length && Character.isLowSurrogate(s.charAt(i + 1))
    else if (Character.isLowSurrogate(ch))
      i > 0 && Character.isHighSurrogate(s.charAt(i - 1))
    else false // C0 controls (non-tab/nl/cr), U+FFFE, U+FFFF
  }
  private[graft] def ooxmlEscape(s: String): String = {
    val guarded = guardEscapeLiterals(s)
    if ((0 until guarded.length).forall(xmlLegalAt(guarded, _))) guarded
    else {
      val sb = new java.lang.StringBuilder(guarded.length + 8)
      var i = 0
      while (i < guarded.length) {
        if (xmlLegalAt(guarded, i)) sb.append(guarded.charAt(i))
        else sb.append(f"_x${guarded.charAt(i).toInt}%04X_")
        i += 1
      }
      sb.toString
    }
  }

  private[graft] def ooxmlUnescape(s: String): String =
    if (!s.contains("_x")) s
    else EscapeLikeRe.replaceAllIn(s, m =>
      java.util.regex.Matcher.quoteReplacement(
        Integer.parseInt(m.group(1), 16).toChar.toString))

  // ---------------------------------------------------------------- writer

  private val SsMain = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
  private val RelNs =
    "http://schemas.openxmlformats.org/officeDocument/2006/relationships"

  private def cellXml(r: Int, c: Int, v: Any): Option[String] = {
    val ref = s"${colLetters(c)}${r + 1}"
    v match {
      case null => None
      case b: Boolean =>
        Some(s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>""")
      case n @ (_: Int | _: Long | _: Short | _: Byte) =>
        Some(s"""<c r="$ref"><v>$n</v></c>""")
      case d: Double =>
        if (d.isNaN || d.isInfinite)
          Some(s"""<c r="$ref" t="inlineStr"><is><t>$d</t></is></c>""")
        else Some(s"""<c r="$ref"><v>$d</v></c>""")
      case f: Float => cellXml(r, c, f.toDouble)
      case d: java.math.BigDecimal => Some(s"""<c r="$ref"><v>$d</v></c>""")
      case d: java.sql.Date =>
        Some(s"""<c r="$ref" t="inlineStr"><is><t>$d</t></is></c>""")
      case t: java.sql.Timestamp =>
        val iso = t.toInstant.toString
        Some(s"""<c r="$ref" t="inlineStr"><is><t>${escXml(iso)}</t></is></c>""")
      case s =>
        Some(s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${escXml(ooxmlEscape(s.toString))}</t></is></c>""")
    }
  }

  /** One sheet's XML: banner at the offset, header (blank cell over the
    * index column), then data rows. */
  private def sheetXml(name: String, cols: Seq[String], rows: Seq[Row],
      startRow: Int, startCol: Int, banner: Boolean, index: Boolean)
      : String = {
    val out = new StringBuilder
    out ++= s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>"""
    out ++= s"""<worksheet xmlns="$SsMain"><sheetData>"""
    var r = startRow
    def rowXml(cells: Seq[Option[String]]): Unit = {
      val present = cells.flatten
      if (present.nonEmpty)
        out ++= s"""<row r="${r + 1}">${present.mkString}</row>"""
      r += 1
    }
    if (banner) rowXml(Seq(cellXml(r, startCol, name)))
    val headerVals: Seq[Any] =
      (if (index) Seq(null) else Nil) ++ cols
    rowXml(headerVals.zipWithIndex.map { case (v, i) =>
      cellXml(r, startCol + i, v) })
    rows.zipWithIndex.foreach { case (row, ri) =>
      val vals: Seq[Any] =
        (if (index) Seq(ri: Any) else Nil) ++
          cols.indices.map(i => if (row.isNullAt(i)) null else row.get(i))
      rowXml(vals.zipWithIndex.map { case (v, i) =>
        cellXml(r, startCol + i, v) })
    }
    out ++= "</sheetData></worksheet>"
    out.toString
  }

  /** Write a multi-sheet workbook — the `save_workbook` analogue. Each entry
    * is `(result, sheetName, (startRow, startCol))`. Bounded by contract:
    * throws if any sheet exceeds `maxRows` (a presentation sink must not
    * silently truncate a result, and an unbounded collect must not hide
    * behind one). */
  def saveWorkbook(sheets: Seq[(DataFrame, String, (Int, Int))], path: String,
      maxRows: Int = 10000): Unit = {
    require(sheets.nonEmpty, "workbook needs at least one sheet")
    val collected = sheets.map { case (df, name, (r0, c0)) =>
      val rows = df.limit(maxRows + 1).collect()
      require(rows.length <= maxRows,
        s"sheet '$name' exceeds maxRows=$maxRows — aggregate further or " +
          "raise the bound explicitly; this sink is a presentation boundary")
      (df.columns.toSeq, rows.toSeq, name, r0, c0)
    }
    val bos = new ByteArrayOutputStream()
    val zip = new ZipOutputStream(bos, java.nio.charset.StandardCharsets.UTF_8)
    def part(entry: String, content: String): Unit = {
      zip.putNextEntry(new ZipEntry(entry))
      zip.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      zip.closeEntry()
    }
    val n = collected.size
    part("[Content_Types].xml",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
        """<Default Extension="xml" ContentType="application/xml"/>""" +
        """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
        (1 to n).map(i =>
          s"""<Override PartName="/xl/worksheets/sheet$i.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""")
          .mkString +
        "</Types>")
    part("_rels/.rels",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        s"""<Relationship Id="rId1" Type="$RelNs/officeDocument" Target="xl/workbook.xml"/>""" +
        "</Relationships>")
    part("xl/workbook.xml",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        s"""<workbook xmlns="$SsMain" xmlns:r="$RelNs"><sheets>""" +
        collected.zipWithIndex.map { case ((_, _, name, _, _), i) =>
          s"""<sheet name="${escXml(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
        }.mkString +
        "</sheets></workbook>")
    part("xl/_rels/workbook.xml.rels",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        (1 to n).map(i =>
          s"""<Relationship Id="rId$i" Type="$RelNs/worksheet" Target="worksheets/sheet$i.xml"/>""")
          .mkString +
        "</Relationships>")
    collected.zipWithIndex.foreach { case ((cols, rows, name, r0, c0), i) =>
      part(s"xl/worksheets/sheet${i + 1}.xml",
        sheetXml(name, cols, rows, r0, c0, banner = true, index = true))
    }
    zip.close()
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(
      org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)
    val out = fs.create(hPath, true)
    try out.write(bos.toByteArray) finally out.close()
  }

  // ---------------------------------------------------------------- reader

  private def parseXml(bytes: Array[Byte]): org.w3c.dom.Document = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    // untrusted spreadsheet input: no DTDs, no external entities
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setXIncludeAware(false)
    f.setExpandEntityReferences(false)
    // namespace-aware so elems() can match by LOCAL name: some writers emit
    // prefixed OOXML (<x:sheet .../>), which a literal-tag lookup would
    // reject as "no sheets in workbook" despite being a valid workbook
    f.setNamespaceAware(true)
    f.newDocumentBuilder().parse(new ByteArrayInputStream(bytes))
  }

  private def elems(parent: org.w3c.dom.Element, tag: String)
      : Seq[org.w3c.dom.Element] = {
    val nl = parent.getElementsByTagNameNS("*", tag)
    (0 until nl.getLength).map(nl.item(_).asInstanceOf[org.w3c.dom.Element])
  }

  /** Attribute lookup tolerant of the relationship-id prefix convention:
    * `r:id` as written by this sink and most writers, or any prefix bound
    * to the relationships namespace. */
  private def ridOf(e: org.w3c.dom.Element): String = {
    val ns = e.getAttributeNS(RelNs, "id")
    if (ns.nonEmpty) ns else e.getAttribute("r:id")
  }

  /** All zip entries of the workbook at `path`, read through the Hadoop
    * FileSystem API (local/HDFS/S3A alike). Workbooks are bounded
    * presentation artifacts, so one in-memory pass is the right shape. */
  private def entriesOf(spark: SparkSession, path: String)
      : Map[String, Array[Byte]] = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(hPath)
    val bytes =
      try org.apache.commons.io.IOUtils.toByteArray(in) finally in.close()
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes),
      java.nio.charset.StandardCharsets.UTF_8)
    val out = mutable.LinkedHashMap.empty[String, Array[Byte]]
    var e = zin.getNextEntry
    while (e != null) {
      if (!e.isDirectory)
        out(e.getName) = org.apache.commons.io.IOUtils.toByteArray(zin)
      e = zin.getNextEntry
    }
    zin.close()
    out.toMap
  }

  /** Sheet names in workbook order. */
  def sheetNames(spark: SparkSession, path: String): Seq[String] = {
    val parts = entriesOf(spark, path)
    val wb = parseXml(parts("xl/workbook.xml"))
    elems(wb.getDocumentElement, "sheet").map(_.getAttribute("name"))
  }

  /** The raw cell grid of one sheet: dense Vector of rows of
    * Option[(value, stringTyped)] canonical values (booleans as
    * "true"/"false", sharedStrings resolved; stringTyped records whether
    * the cell was authored as a string — inlineStr / shared / formula
    * string cache). Exposed for tests; [[readWorkbook]] is the typed
    * contract. */
  private[graft] def sheetGrid(spark: SparkSession, path: String,
      sheet: Option[String]): Vector[Vector[Option[(String, Boolean)]]] = {
    val parts = entriesOf(spark, path)
    val wb = parseXml(parts("xl/workbook.xml"))
    val sheetsMeta = elems(wb.getDocumentElement, "sheet")
      .map(e => (e.getAttribute("name"), ridOf(e)))
    require(sheetsMeta.nonEmpty, s"no sheets in workbook $path")
    val (name, rId) = sheet match {
      case Some(s) => sheetsMeta.find(_._1 == s).getOrElse(
        throw new IllegalArgumentException(
          s"sheet '$s' not in workbook (has: ${sheetsMeta.map(_._1).mkString(", ")})"))
      case None => sheetsMeta.head
    }
    val rels = parseXml(parts("xl/_rels/workbook.xml.rels"))
    val target = elems(rels.getDocumentElement, "Relationship")
      .find(_.getAttribute("Id") == rId)
      .map(_.getAttribute("Target"))
      .getOrElse(throw new IllegalArgumentException(
        s"sheet '$name' has no relationship target"))
    val sheetPath =
      if (target.startsWith("/")) target.drop(1) else s"xl/$target"
    val shared: IndexedSeq[String] = parts.get("xl/sharedStrings.xml") match {
      case Some(b) =>
        // an <si> is either a plain <t> or rich runs <r><t>…; concatenating
        // every descendant <t> covers both
        elems(parseXml(b).getDocumentElement, "si")
          .map(si => elems(si, "t").map(_.getTextContent).mkString)
          .toIndexedSeq
      case None => IndexedSeq.empty
    }
    val doc = parseXml(parts(sheetPath))
    // cell value + whether the CELL ITSELF was string-typed (inlineStr,
    // shared string, or a string formula cache): the type tag survives to
    // inference so a string column of numeric-looking codes ("007") can't
    // be coerced to numbers on read — pandas, the mirrored contract,
    // respects cell types the same way
    val cells = mutable.HashMap.empty[(Int, Int), (String, Boolean)]
    var maxR = -1
    var maxC = -1
    elems(doc.getDocumentElement, "row").foreach { rowEl =>
      elems(rowEl, "c").foreach { c =>
        val ref = c.getAttribute("r")
        if (ref.nonEmpty) {
          val (r, cc) = parseRef(ref)
          val t = c.getAttribute("t")
          // string-typed cells keep EMPTY values ("" is data, not absence —
          // dropping it would null it out and could erase the whole row);
          // escapes decode on read, the inverse of the writer's ooxmlEscape
          val value: Option[(String, Boolean)] = t match {
            case "inlineStr" =>
              Some((ooxmlUnescape(
                elems(c, "t").map(_.getTextContent).mkString), true))
            case "s" =>
              elems(c, "v").headOption.map(v =>
                (ooxmlUnescape(shared(v.getTextContent.trim.toInt)), true))
            case "str" => // formula string cache: a STRING result — decode
              // escapes and keep empties, same as the other string forms
              Some((ooxmlUnescape(
                elems(c, "v").map(_.getTextContent).mkString), true))
            case "b" =>
              elems(c, "v").headOption.map(v =>
                (if (v.getTextContent.trim == "1") "true" else "false",
                  false))
            case _ => // numeric or untyped: an empty <v> carries nothing
              elems(c, "v").headOption.map(_.getTextContent)
                .filter(_.nonEmpty).map((_, false))
          }
          value.foreach { v =>
            cells((r, cc)) = v
            if (r > maxR) maxR = r
            if (cc > maxC) maxC = cc
          }
        }
      }
    }
    // dense-grid guard: ONE far-offset cell in a foreign workbook (legal
    // refs reach XFD1048576) would otherwise tabulate ~1.7e10 slots and
    // kill the driver — the reader is documented as accepting untrusted
    // foreign files, so the blow-up must be a loud bounded error
    require((maxR + 1).toLong * (maxC + 1).toLong <= 50000000L,
      s"sheet grid ${maxR + 1} x ${maxC + 1} exceeds the 50M-cell bound — " +
        "a far-offset cell in a foreign workbook?")
    Vector.tabulate(maxR + 1)(r => Vector.tabulate(maxC + 1)(c =>
      cells.get((r, c))))
  }

  private val IntLikeRe = "[+-]?\\d{1,19}".r
  private val DoubleRe =
    "[+-]?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?".r
  private val DateRe = "\\d{4}-\\d{2}-\\d{2}".r

  // a value is Long iff it actually PARSES as one (the shape regex alone
  // would either cap at 18 digits — silently demoting full-range 19-digit
  // Longs to lossy Doubles — or overflow on out-of-range 19-digit strings)
  private def isLong(v: String): Boolean =
    IntLikeRe.pattern.matcher(v).matches() &&
      scala.util.Try(java.lang.Long.parseLong(v)).isSuccess

  // the writer renders non-finite doubles as inline strings; they must
  // still infer as Double or one NaN degrades the whole column to String
  private def isDouble(v: String): Boolean =
    DoubleRe.pattern.matcher(v).matches() ||
      v == "NaN" || v == "Infinity" || v == "-Infinity"

  /** Column type from (value, stringTyped) cells. A column with ANY
    * string-typed cell is string-AUTHORED: it may still infer DateType
    * (this sink writes dates as ISO inline strings — the load_results
    * shape rule), but never numeric/boolean — "007" must come back "007",
    * not 7L, exactly as pandas respects the cell type (pinned corruption
    * class: SourceOpsSpec's "00123" identity). Numeric/boolean inference
    * applies only to columns of untyped-numeric and `t="b"` cells. */
  private val NonFinite = Set("NaN", "Infinity", "-Infinity")

  private def inferType(vals: Seq[(String, Boolean)]): DataType = {
    val vs = vals.map(_._1)
    if (vals.isEmpty) StringType
    else if (vals.exists(_._2)) {
      // exception: THIS sink writes non-finite doubles as inline strings
      // (xlsx has no numeric NaN), so string-typed cells that are all
      // non-finite markers in an otherwise-double column stay DoubleType —
      // the format makes a NaN double and the literal string "NaN"
      // indistinguishable, and the double reading preserves the writer's
      // own round trip
      if (vals.filter(_._2).map(_._1).forall(NonFinite) &&
          vs.forall(isDouble)) DoubleType
      else if (vs.forall(v => DateRe.pattern.matcher(v).matches())) DateType
      else StringType
    }
    else if (vs.forall(isLong)) LongType
    else if (vs.forall(isDouble)) DoubleType
    else if (vs.forall(v => v == "true" || v == "false")) BooleanType
    else StringType
  }

  /** A `Date` cell is either an ISO string (this sink's own output) or an
    * Excel NUMERIC DAY SERIAL (openpyxl/pandas write datetimes as serials
    * unless a string format is forced): days since 1899-12-30 — the offset
    * that bakes in Excel's historical leap-year-1900 quirk. Accept both;
    * a fractional serial's time-of-day part is dropped. */
  private def parseDateCell(v: String): java.sql.Date =
    if (DateRe.pattern.matcher(v.take(10)).matches())
      java.sql.Date.valueOf(v.take(10))
    else java.sql.Date.valueOf(
      java.time.LocalDate.of(1899, 12, 30).plusDays(v.toDouble.toLong))

  /** Read one sheet with the reference's `load_results` contract
    * (`tool.py:10-26`): row `header` is the header (default 1 — one banner
    * row above it), columns with blank or `Unnamed`-prefixed headers are
    * dropped (that rule also swallows the written row-index column and any
    * start_col padding), per-column types are inferred (long / double /
    * boolean / ISO date / string), a `Date` column is parsed to DateType,
    * and `Source_Type` is stamped when given. */
  def readWorkbook(spark: SparkSession, path: String,
      sheet: Option[String] = None, sourceType: Option[String] = None,
      header: Int = 1): DataFrame = {
    val grid = sheetGrid(spark, path, sheet)
    require(grid.length > header, s"workbook sheet has no header row $header")
    val headerRow = grid(header)
    // "Unnamed:" is a PREFIX rule (pandas names blank headers `Unnamed: N`)
    // — contains() would silently drop a real column named e.g.
    // "Top Unnamed Entities"
    val kept = headerRow.zipWithIndex.collect {
      case (Some((h, _)), i)
          if h.trim.nonEmpty && !h.trim.startsWith("Unnamed:") =>
        (h.trim, i)
    }
    require(kept.nonEmpty, "no named columns in the header row")
    // keep a row if ANY cell is present (kept or not): a data row whose
    // kept columns are all null still exists (its index cell is written),
    // and dropping it would change round-trip row counts; fully empty grid
    // rows (blank separators in foreign files) still fall away
    val body = grid.drop(header + 1).filter(_.exists(_.isDefined))
    val types = kept.map { case (name, i) =>
      val vals = body.flatMap(_.lift(i).flatten)
      name -> (if (name == "Date") DateType else inferType(vals))
    }
    val schema = StructType(types.map { case (n, t) => StructField(n, t) })
    val rows: Seq[Row] = body.map { row =>
      Row.fromSeq(kept.zip(types).map { case ((_, i), (_, t)) =>
        row.lift(i).flatten.map { case (v, _) =>
          t match {
            case LongType => v.toLong
            case DoubleType => v.toDouble
            case BooleanType => v.toBoolean
            case DateType => parseDateCell(v)
            case _ => v
          }
        }.orNull
      })
    }
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), schema)
    sourceType.fold(df)(st => df.withColumn("Source_Type", lit(st)))
  }
}
