package graft.report

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.{Oracle, Q}
import graft.model.Tables

/** P8: presentation-layer text shaping (SURVEY.md §2.3) — greedy word-wrap
  * for hover labels (`AI_Cost_Cutting_Market_Analysis/src/tool.py:11-46`) and
  * window truncation around a co-mention pair
  * (`network_analysis.py:141-151`).
  *
  * Both are per-row map-only projections: no shuffle, no state — at 100 TB
  * they ride whatever scan already feeds the report/sink stage. The wrap is a
  * plain Scala UDF (the SURVEY §7.3 sanctioned case — a sequential
  * fold over words that built-ins can't express without an interpreted HOF of
  * the same cost); the truncation is pure built-ins and stays inside
  * whole-stage codegen.
  */
object Presentation {

  /** Greedy 80-char word-wrap, reference-faithful including its quirks:
    * words = whitespace runs split with empties dropped (`str.split()`);
    * line-length accounting adds `len(word) + 1` for EVERY appended word
    * (the trailing space is counted, so a line holds at most `maxLength - 1`
    * visible chars); a word that cannot open a line within budget flushes
    * the current line first — which for the very first word emits an empty
    * leading line (`lines.append(' '.join([]))`); null/empty pass through.
    *
    * KNOWN DEVIATION (deliberate): Java's `\s` is ASCII whitespace while
    * Python's `str.split()` splits on all Unicode whitespace, so NBSP /
    * ideographic spaces stay inside a "word" here but would separate words
    * in the reference. The DuckDB oracle's RE2 `\s` is ASCII too, so both
    * gate sides agree; switching to `(?U)\s+` would desync the oracle for
    * no gain on the ASCII corpus contract. */
  private[graft] def wrap(text: String, maxLength: Int): String = {
    if (text == null || text.isEmpty) text
    else {
      val words = text.split("\\s+").filter(_.nonEmpty)
      val lines = scala.collection.mutable.ArrayBuffer.empty[String]
      val cur = scala.collection.mutable.ArrayBuffer.empty[String]
      var curLen = 0
      for (w <- words) {
        if (curLen + w.length + 1 <= maxLength) {
          cur += w
          curLen += w.length + 1
        } else {
          lines += cur.mkString(" ")
          cur.clear()
          cur += w
          curLen = w.length
        }
      }
      if (cur.nonEmpty) lines += cur.mkString(" ")
      lines.mkString("<br>")
    }
  }

  /** Column form of [[wrap]]. */
  def addLineBreaks(text: Column, maxLength: Int = 80): Column = {
    val u = udf((t: String) => wrap(t, maxLength))
    u(text)
  }

  /** Window truncation around the first occurrences of two co-mentioned
    * entities (`network_analysis.py:146-151`), bug-for-bug: case-insensitive
    * `find` of each entity; if either is absent, plain head-truncate to
    * `window` chars with an ellipsis; otherwise cut
    * `[min(i1,i2) - window/2, max(i1,i2) + len(e2) + window/2)` clamped to
    * the text — `len(e2)` even when entity 1 is the later match (the
    * reference's asymmetry, preserved). Offsets are 0-based half-open,
    * realized with 1-based `substr`. Pure built-ins — codegen-friendly. */
  def truncateAround(text: Column, entity1: Column, entity2: Column,
      window: Int): Column = {
    val tl = lower(text)
    val i1 = call_function("instr", tl, lower(entity1)) - 1
    val i2 = call_function("instr", tl, lower(entity2)) - 1
    val n = length(text)
    val plain = when(n > window,
      concat(text.substr(lit(1), lit(window)), lit("..."))).otherwise(text)
    val start = greatest(lit(0), least(i1, i2) - lit(window / 2))
    val end = least(n, greatest(i1, i2) + length(entity2) + lit(window / 2))
    val cut = concat(text.substr(start + 1, end - start),
      when(end < n, lit("...")).otherwise(lit("")))
    when(i1 === -1 || i2 === -1, plain).otherwise(cut)
  }

  /** P8 gate: both shapes over the documents corpus — `wrapped` is the
    * 80-char hover wrap, `snippet` the 120-char window around the planted
    * co-mention pair (customer, part). The oracle mirrors the wrap's
    * sequential fold as a recursive CTE over the word sequence and the
    * truncation arithmetic verbatim. */
  private val qWrapTruncate = Q(
    "q_wrap_truncate",
    (s, d) => Tables.documents(s, d)
      .select(col("doc_id"),
        addLineBreaks(col("text"), 80).as("wrapped"),
        truncateAround(col("text"), lit("customer"), lit("part"), 120)
          .as("snippet"))
      .orderBy(col("doc_id")),
    Some(
      """WITH RECURSIVE words AS (
        |  SELECT doc_id, unnest(ws) AS w, unnest(range(1, len(ws) + 1)) AS i,
        |         len(ws) AS n
        |  FROM (SELECT doc_id,
        |          list_filter(regexp_split_to_array(text, '\s+'),
        |                      x -> x <> '') AS ws
        |        FROM documents)
        |),
        |wrap AS (
        |  SELECT doc_id, i, n,
        |    CASE WHEN len(w) + 1 <= 80 THEN w ELSE '<br>' || w END AS acc,
        |    CAST(CASE WHEN len(w) + 1 <= 80 THEN len(w) + 1
        |              ELSE len(w) END AS INT) AS cur_len
        |  FROM words WHERE i = 1
        |  UNION ALL
        |  SELECT w.doc_id, w.i, w.n,
        |    CASE WHEN p.cur_len + len(w.w) + 1 <= 80
        |         THEN p.acc || ' ' || w.w
        |         ELSE p.acc || '<br>' || w.w END,
        |    CAST(CASE WHEN p.cur_len + len(w.w) + 1 <= 80
        |         THEN p.cur_len + len(w.w) + 1
        |         ELSE len(w.w) END AS INT)
        |  FROM wrap p JOIN words w ON w.doc_id = p.doc_id AND w.i = p.i + 1
        |),
        |wrapped AS (SELECT doc_id, acc AS wrapped FROM wrap WHERE i = n),
        |snip AS (
        |  SELECT doc_id,
        |    CASE WHEN i1 = -1 OR i2 = -1 THEN
        |      CASE WHEN tl > 120 THEN substr(text, 1, 120) || '...'
        |           ELSE text END
        |    ELSE
        |      substr(text, greatest(0, least(i1, i2) - 60) + 1,
        |             least(tl, greatest(i1, i2) + 4 + 60)
        |               - greatest(0, least(i1, i2) - 60))
        |      || CASE WHEN least(tl, greatest(i1, i2) + 4 + 60) < tl
        |              THEN '...' ELSE '' END
        |    END AS snippet
        |  FROM (
        |    SELECT doc_id, text,
        |           strpos(lower(text), 'customer') - 1 AS i1,
        |           strpos(lower(text), 'part') - 1 AS i2,
        |           len(text) AS tl
        |    FROM documents)
        |)
        |SELECT d.doc_id,
        |  CASE WHEN d.text IS NULL OR d.text = '' THEN d.text
        |       ELSE coalesce(w.wrapped, '') END AS wrapped,
        |  s.snippet
        |FROM documents d
        |LEFT JOIN wrapped w USING (doc_id)
        |JOIN snip s USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin))

  def queries: Seq[Q] = Seq(qWrapTruncate)
}
