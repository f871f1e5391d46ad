package graft

/** Shared DuckDB SQL fragments for `SparkEntry.oracleSql`.
  *
  * Each fragment is the exact SQL rendering of a Scala builder in
  * [[graft.model.Tables]] / [[graft.label.Labeler]]; keeping them side by side
  * is what makes the driver's hash-compare (Spark result vs DuckDB result on
  * the same parquet) reproducible. Any change to a builder must change the
  * fragment in the same commit.
  */
object Oracle {

  /** Render `s` as a SQL single-quoted string literal (doubling embedded
    * quotes). Every composed-pipeline oracle that interpolates a
    * Scala-side value (similarity tokens, watchlist ids, tree labels) must
    * route through this — today's fixture vocabulary happens to be
    * quote-free, but a future fixture token containing `'` would otherwise
    * produce invalid (or worse, silently wrong) oracle SQL far from the
    * value's definition site. */
  def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  /** Render `s` as a SQL double-quoted identifier (doubling embedded
    * quotes). Used where a Scala-side value becomes a COLUMN NAME in the
    * oracle (`AS $label`): DuckDB's quoted identifier preserves the exact
    * string, which is also what Spark's `.as(label)` names the column —
    * so the driver's sorted-by-name compare keeps matching for any label
    * the tree parser admits, not just identifier-shaped ones. */
  def sqlIdent(s: String): String = "\"" + s.replace("\"", "\"\"") + "\""

  /** SQL twin of [[graft.model.Tables.chunkRows]]. */
  val chunkCte: String =
    """chunk AS (
      |  SELECT
      |    o.o_orderdate AS timestamp_utc,
      |    CAST(o.o_orderkey AS VARCHAR) AS document_id,
      |    CAST(o.o_orderkey AS VARCHAR) || '-' || CAST(l.l_linenumber AS VARCHAR) AS sentence_id,
      |    o.o_orderpriority || ' order ' || CAST(o.o_orderkey AS VARCHAR) AS headline,
      |    's' || CAST(l.l_suppkey AS VARCHAR) AS entity_id,
      |    CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'news'
      |         WHEN o.o_orderpriority = '3-MEDIUM' THEN 'transcripts'
      |         ELSE 'filings' END AS document_type,
      |    NOT (o.o_orderpriority IN ('1-URGENT','2-HIGH')) AS is_reporting_entity,
      |    s.s_name AS entity_name,
      |    n.n_name AS entity_sector,
      |    r.r_name AS entity_industry,
      |    n.n_name AS entity_country,
      |    'S' || CAST(l.l_suppkey AS VARCHAR) AS entity_ticker,
      |    d.text AS text,
      |    d.lang AS lang,
      |    'c' || CAST(o.o_custkey AS VARCHAR) AS other_entity_id,
      |    c.c_name AS other_entity_name,
      |    'p' || CAST(l.l_partkey AS VARCHAR) AS part_entity_id,
      |    l.l_quantity, l.l_extendedprice, l.l_discount, l.l_returnflag,
      |    l.l_shipdate
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  JOIN nation n ON s.s_nationkey = n.n_nationkey
      |  JOIN region r ON n.n_regionkey = r.r_regionkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN documents d
      |    ON d.doc_id = (l.l_orderkey * 7 + l.l_linenumber)
      |                  % (SELECT max(doc_id) + 1 FROM documents)
      |)""".stripMargin

  /** SQL twin of [[graft.model.Tables.chunkRowsFull]] — layers the entity
    * span array, the P2 other_entities projection, and the parallel topics
    * arrays over [[chunkCte]]. Use as `WITH $chunkCte, $chunkFullCte`. */
  val chunkFullCte: String =
    """chunk_full AS (
      |  SELECT *,
      |    -- coalesce: DuckDB's array_to_string is NULL on an empty list,
      |    -- Spark's array_join is '' — align on ''.
      |    -- one entry per distinct non-target KEY (first occurrence), however
      |    -- many spans the entities array carries
      |    coalesce(array_to_string(list_transform(
      |      list_filter([
      |        struct_pack(key := other_entity_id, name := other_entity_name,
      |          "start" := strpos(text, 'customer') - 1),
      |        struct_pack(key := part_entity_id, name := part_entity_id,
      |          "start" := strpos(text, 'part') - 1),
      |        struct_pack(key := 'o' || document_id, name := 'o' || document_id,
      |          "start" := strpos(text, 'order') - 1)
      |      ], e -> e."start" >= 0 AND e.key <> other_entity_id),
      |      e -> e.name), ', '), '') AS other_entities
      |  FROM (
      |    SELECT *,
      |      -- EVERY occurrence of each planted token, 0-based offsets,
      |      -- ascending within token — mirrors Tables.chunkRowsFull
      |      list_concat(list_concat(
      |        list_transform(
      |          list_filter(generate_series(1, greatest(len(text) - 7, 0)),
      |            i -> substr(text, i, 8) = 'customer'),
      |          i -> struct_pack(key := other_entity_id,
      |            name := other_entity_name,
      |            "start" := CAST(i - 1 AS INT), "end" := CAST(i + 7 AS INT))),
      |        list_transform(
      |          list_filter(generate_series(1, greatest(len(text) - 3, 0)),
      |            i -> substr(text, i, 4) = 'part'),
      |          i -> struct_pack(key := part_entity_id, name := part_entity_id,
      |            "start" := CAST(i - 1 AS INT), "end" := CAST(i + 3 AS INT)))),
      |        list_transform(
      |          list_filter(generate_series(1, greatest(len(text) - 4, 0)),
      |            i -> substr(text, i, 5) = 'order'),
      |          i -> struct_pack(key := 'o' || document_id,
      |            name := 'o' || document_id,
      |            "start" := CAST(i - 1 AS INT), "end" := CAST(i + 4 AS INT))))
      |      AS entities,
      |      [entity_sector, entity_industry, other_entity_name] AS topics,
      |      ['SECT', 'REGI', 'COMP'] AS topics_type
      |    FROM chunk
      |  )
      |)""".stripMargin

  /** DuckDB twin of [[graft.ingest.ChunkOps.multiSpanMaskCol]] — the FULL
    * multi-span P3 mask as a CTE over `src`: enumerate every occurrence of
    * the three planted tokens (1-based here, matching substr), number the
    * non-target keys by first appearance, sort, and splice left-to-right by
    * segment concatenation (equivalent to the engine's right-to-left fold:
    * the spans are disjoint, so masked = Σ gap_i + placeholder_i + tail).
    * Emits `SELECT * EXCLUDE (sp), ... AS masked_text`. */
  def maskedCteSql(src: String, cteName: String = "masked"): String = {
    val target = sqlLit(graft.functions.Masking.TargetPlaceholder)
    val other = sqlLit(graft.functions.Masking.OtherPrefix)
    def occ(token: String, ph: String): String = {
      val tl = token.length
      s"""list_transform(
         |      list_filter(generate_series(1, greatest(len(text) - ${tl - 1}, 0)),
         |        i -> substr(text, i, $tl) = ${sqlLit(token)}),
         |      i -> struct_pack(s := i, e := i + $tl, ph := $ph))""".stripMargin
    }
    val partNum =
      "CASE WHEN strpos(text, 'order') > 0 AND strpos(text, 'order') < " +
        "strpos(text, 'part') THEN 2 ELSE 1 END"
    val orderNum =
      "CASE WHEN strpos(text, 'part') > 0 AND strpos(text, 'part') < " +
        "strpos(text, 'order') THEN 2 ELSE 1 END"
    // NOTE: no generated line may BEGIN with '||' — the outer query's
    // stripMargin would eat the first pipe as a margin marker
    s"""$cteName AS (
       |  SELECT * EXCLUDE (sp),
       |    CASE WHEN len(sp) = 0 THEN text ELSE
       |      list_aggregate(list_transform(sp, (x, i) ->
       |        substr(text, CASE WHEN i = 1 THEN 1 ELSE sp[i - 1].e END,
       |               x.s - CASE WHEN i = 1 THEN 1 ELSE sp[i - 1].e END) ||
       |        x.ph),
       |        'string_agg', '') ||
       |      substr(text, sp[len(sp)].e)
       |    END AS masked_text
       |  FROM (
       |    SELECT *, list_sort(list_concat(list_concat(
       |      ${occ("customer", target)},
       |      ${occ("part", s"$other || ($partNum)")}),
       |      ${occ("order", s"$other || ($orderNum)")})) AS sp
       |    FROM $src
       |  )
       |)""".stripMargin
  }

  /** SQL twins of [[graft.label.Labeler.labelColOn]] / `motivationColOn`,
    * parameterized by the text column exactly like the Column side — the
    * reference labels MASKED text, so composed-pipeline oracles render the
    * same rules over their mask stage's output column (a blind
    * `replace("text", ...)` over the rendered SQL would also rewrite any
    * future rule token or identifier containing that substring). */
  def labelCaseOn(c: String): String =
    s"""CASE WHEN contains($c, 'slow') AND contains($c, 'merge') THEN 'N'
       |     WHEN contains($c, 'fast') THEN 'P'
       |     WHEN contains($c, 'stream') THEN 'A'
       |     ELSE 'U' END""".stripMargin

  def motivationCaseOn(c: String): String =
    s"""CASE WHEN contains($c, 'slow') AND contains($c, 'merge') THEN 'negative: ' || substr($c, 1, 40)
       |     WHEN contains($c, 'fast') THEN 'positive: ' || substr($c, 1, 40)
       |     WHEN contains($c, 'stream') THEN 'adopter: ' || substr($c, 1, 40)
       |     ELSE 'unclear' END""".stripMargin

  val labelCase: String = labelCaseOn("text")

  val motivationCase: String = motivationCaseOn("text")

  /** `WITH chunk AS (...), labeled AS (chunk + label, motivation)` prefix. */
  val labeledCte: String =
    s"""WITH $chunkCte,
       |labeled AS (
       |  SELECT *, $labelCase AS label, $motivationCase AS motivation
       |  FROM chunk
       |)""".stripMargin

  /** SQL twin of [[graft.model.Tables.entityDim]]. */
  val entityDimCte: String =
    """entity_dim AS (
      |  SELECT 's' || CAST(s_suppkey AS VARCHAR) AS entity_id, s_name AS name,
      |         'COMP' AS entity_type, n_name AS sector, r_name AS industry_group,
      |         n_name AS country, 'S' || CAST(s_suppkey AS VARCHAR) AS ticker
      |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |                JOIN region ON n_regionkey = r_regionkey
      |  UNION ALL
      |  SELECT 'c' || CAST(c_custkey AS VARCHAR), c_name, 'COMP', n_name, r_name,
      |         n_name, 'C' || CAST(c_custkey AS VARCHAR)
      |  FROM customer JOIN nation ON c_nationkey = n_nationkey
      |                JOIN region ON n_regionkey = r_regionkey
      |  UNION ALL
      |  SELECT 'p' || CAST(p_partkey AS VARCHAR), p_name, 'PROD', p_brand, p_type,
      |         'NONE', 'P' || CAST(p_partkey AS VARCHAR)
      |  FROM part
      |)""".stripMargin
}
