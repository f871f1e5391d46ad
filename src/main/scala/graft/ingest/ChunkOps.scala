package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Oracle, Q}
import graft.functions.Masking
import graft.model.Tables
import graft.query.QueryAlgebra._

/** Ingest-side operators: projection/reshaping/row generation (SURVEY.md
  * §2.3 P1-P9), the masking pipeline (P3/P5), and the compiled query algebra
  * (§2.2) driven end-to-end.
  */
object ChunkOps {

  /** Chunk rows + synthesized entity spans (EVERY occurrence per token,
    * 0-based offsets — the reference's char-span contract
    * `search.py:430-448`). The span array is first-class on
    * [[Tables.chunkRowsFull]]; this alias remains for the masking pipeline's
    * call sites. */
  def withSpans(s: SparkSession, d: String): DataFrame =
    Tables.chunkRowsFull(s, d)

  /** P1: doc→chunk→entity explode — one row per (chunk, entity-in-any-role),
    * aggregated per role. */
  private val qExplodeRoles = Q(
    "q_explode_roles",
    (s, d) => Tables.chunkRowsPruned(s, d, withOrders = true)
      .select(col("sentence_id"), explode(array(
        struct(col("entity_id").as("ent"), lit("supplier").as("role")),
        struct(col("other_entity_id").as("ent"), lit("customer").as("role")),
        struct(col("part_entity_id").as("ent"), lit("part").as("role"))))
        .as("e"))
      .select(col("e.ent").as("ent"), col("e.role").as("role"))
      .groupBy(col("role"))
      .agg(count(lit(1)).as("n_rows"), countDistinct(col("ent")).as("n_entities"))
      .orderBy(col("role")),
    Some(
      s"""WITH ${Oracle.chunkCte},
         |exploded AS (
         |  SELECT entity_id AS ent, 'supplier' AS role FROM chunk
         |  UNION ALL SELECT other_entity_id, 'customer' FROM chunk
         |  UNION ALL SELECT part_entity_id, 'part' FROM chunk
         |)
         |SELECT role, count(*) AS n_rows, count(DISTINCT ent) AS n_entities
         |FROM exploded GROUP BY role ORDER BY role""".stripMargin))

  /** P7: topics explode over the REAL parallel (topics, topics_type) arrays
    * of the full chunk relation — zip, drop COMP entries, explode, count
    * (`visualization_tools.py:573-606`;
    * `Tracking_Inflation_Drivers/src/search.py:263-264`). */
  private val qTopicsExplode = Q(
    "q_topics_explode",
    (s, d) => Tables.chunkRowsFull(s, d)
      .select(explode(filter(
        zip_with(col("topics_type"), col("topics"),
          (tt, t) => struct(tt.as("topic_type"), t.as("topic"))),
        x => x.getField("topic_type") =!= "COMP")).as("t"))
      .select(col("t.topic_type").as("topic_type"), col("t.topic").as("topic"))
      .groupBy(col("topic_type"), col("topic"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("topic_type"), col("topic")),
    Some(
      s"""WITH ${Oracle.chunkCte},
         |${Oracle.chunkFullCte},
         |zipped AS (
         |  SELECT topics_type[i] AS topic_type, topics[i] AS topic
         |  FROM chunk_full, unnest(generate_series(1, len(topics))) AS t(i)
         |  WHERE topics_type[i] <> 'COMP'
         |)
         |SELECT topic_type, topic, count(*) AS cnt
         |FROM zipped GROUP BY 1, 2 ORDER BY topic_type, topic""".stripMargin))

  /** P2 gate: the `other_entities` comma-join projection
    * (`search.py:462-465`) compared value-for-value on every chunk row. */
  private val qOtherEntities = Q(
    "q_other_entities",
    (s, d) => Tables.chunkRowsFull(s, d)
      .select(col("sentence_id"), col("entity_id"), col("part_entity_id"),
        col("other_entities"))
      .orderBy(col("sentence_id"), col("entity_id"), col("part_entity_id")),
    Some(
      s"""WITH ${Oracle.chunkCte},
         |${Oracle.chunkFullCte}
         |SELECT sentence_id, entity_id, part_entity_id, other_entities
         |FROM chunk_full
         |ORDER BY sentence_id, entity_id, part_entity_id""".stripMargin))

  /** Full-schema gate for the entities span array: explode and aggregate
    * per key prefix (c=customer, p=part, o=order) — counts, offset sums and
    * distinct names pin both span construction and offsets. */
  private val qEntitiesArray = Q(
    "q_entities_array",
    (s, d) => Tables.chunkRowsFull(s, d)
      .select(explode(col("entities")).as("e"))
      .select(substring(col("e.key"), 1, 1).as("role_key"),
        col("e.key").as("key"), col("e.name").as("name"),
        col("e.start").as("start"), col("e.end").as("end"))
      .groupBy(col("role_key"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("start")).as("sum_start"),
        sum(col("end")).as("sum_end"),
        countDistinct(col("key")).as("n_keys"),
        countDistinct(col("name")).as("n_names"))
      .orderBy(col("role_key")),
    Some(
      s"""WITH ${Oracle.chunkCte},
         |${Oracle.chunkFullCte},
         |exploded AS (
         |  SELECT substr(e.key, 1, 1) AS role_key, e.key AS key,
         |         e.name AS name, e."start" AS start, e."end" AS "end"
         |  FROM chunk_full, unnest(entities) AS u(e)
         |)
         |SELECT role_key, count(*) AS n_spans,
         |       CAST(sum(start) AS BIGINT) AS sum_start,
         |       CAST(sum("end") AS BIGINT) AS sum_end,
         |       count(DISTINCT key) AS n_keys,
         |       count(DISTINCT name) AS n_names
         |FROM exploded GROUP BY role_key ORDER BY role_key""".stripMargin))

  /** P4: brace-scrub / tombstone filter analogue (`search.py:580-608`):
    * regex-scrub a token, drop tombstoned rows, account for what survived. */
  private val qScrub = Q(
    "q_scrub_tombstone",
    (s, d) => Tables.chunkRowsPruned(s, d, withOrders = true, withText = true)
      .withColumn("clean", regexp_replace(col("text"), "vector", ""))
      .filter(!col("text").contains("dup"))
      .groupBy(col("document_type"))
      .agg(count(lit(1)).as("n_kept"),
        sum(length(col("clean"))).as("total_len"))
      .orderBy(col("document_type")),
    Some(
      s"""WITH ${Oracle.chunkCte}
         |SELECT document_type, count(*) AS n_kept,
         |       CAST(sum(length(regexp_replace(text, 'vector', '', 'g'))) AS BIGINT) AS total_len
         |FROM chunk
         |WHERE NOT contains(text, 'dup')
         |GROUP BY document_type ORDER BY document_type""".stripMargin))

  /** P6: rename-to-presentation format (`tool.py:1096-1135`) — reference
    * column names incl. the `'%b %Y'` Time Period. */
  private val qPresentation = Q(
    "q_presentation",
    (s, d) => Tables.chunkRowsPruned(s, d, withOrders = true,
      withSupplier = true, withText = true)
      .select(
        col("entity_sector").as("Sector"),
        col("entity_industry").as("Industry"),
        col("entity_name").as("Company"),
        date_format(col("timestamp_utc"), "yyyy-MM-dd").as("Date"),
        col("headline").as("Headline"),
        col("text").as("Quote"),
        col("entity_ticker").as("Ticker"),
        col("document_id").as("Document ID"),
        date_format(col("timestamp_utc"), "MMM yyyy").as("Time Period"))
      .orderBy(col("Company"), col("Date"), col("Document ID"), col("Quote")),
    Some(
      s"""WITH ${Oracle.chunkCte}
         |SELECT entity_sector AS "Sector", entity_industry AS "Industry",
         |       entity_name AS "Company",
         |       strftime(timestamp_utc, '%Y-%m-%d') AS "Date",
         |       headline AS "Headline", text AS "Quote",
         |       entity_ticker AS "Ticker", document_id AS "Document ID",
         |       strftime(timestamp_utc, '%b %Y') AS "Time Period"
         |FROM chunk
         |ORDER BY "Company", "Date", "Document ID", "Quote"""".stripMargin))

  /** The single-span ('customer' first occurrence → other-entity key)
    * entities array shared by both single-span mask gates — ONE definition
    * of the span contract (0-based code-point offsets, half-open end) so a
    * change to it cannot reach one gate and miss the other. Returns
    * (1-based instr position, entities array). */
  private def customerSpan: (Column, Column) = {
    val p = instr(col("text"), "customer")
    val ents = filter(
      array(struct(col("other_entity_id").as("key"),
        col("other_entity_name").as("name"),
        (p - 1).cast("int").as("start"), (p + 7).cast("int").as("end"))),
      e => e.getField("start") >= 0)
    (p, ents)
  }

  /** P3 (oracle-gated core): mask the target entity's span via the real
    * masking UDF; the oracle reproduces the single-span splice in SQL. */
  private val qMaskTarget = Q(
    "q_mask_target",
    (s, d) => {
      val c = Tables.chunkRowsPruned(s, d, withOrders = true,
        withCustomer = true, withText = true)
      val (_, ents) = customerSpan
      c.withColumn("m",
        Masking.maskUdf(col("text"), ents, col("other_entity_id")))
        .select(col("sentence_id"), col("entity_id"), col("part_entity_id"),
          col("m._1").as("masked_text"))
        .orderBy(col("sentence_id"), col("entity_id"), col("part_entity_id"))
    },
    Some(
      s"""WITH ${Oracle.chunkCte}
         |SELECT sentence_id, entity_id, part_entity_id,
         |       CASE WHEN strpos(text, 'customer') > 0
         |            THEN substr(text, 1, strpos(text, 'customer') - 1)
         |                 || 'Target Company'
         |                 || substr(text, strpos(text, 'customer') + 8)
         |            ELSE text END AS masked_text
         |FROM chunk
         |ORDER BY sentence_id, entity_id, part_entity_id""".stripMargin))

  /** Stable per-key numbering of the two non-target span keys ('part' /
    * 'order') in order of FIRST span appearance — every span of a key
    * shares its number, however many occurrences it has. Returns
    * (partNum, orderNum) as 1/2 int columns. ONE definition shared by the
    * q_mask_multi verification twin and the market pipeline's production
    * mask stage. */
  private[graft] def otherSpanNums(text: Column): (Column, Column) = {
    val pP = instr(text, "part")
    val pO = instr(text, "order")
    (when(pO > 0 && pO < pP, lit(2)).otherwise(lit(1)),
      when(pP > 0 && pP < pO, lit(2)).otherwise(lit(1)))
  }

  /** P3's full multi-span mask as a pure Column expression over the
    * synthetic three-token span model (every 'customer' occurrence →
    * `Target Company`, every 'part'/'order' occurrence → `Other Company_i`
    * with [[otherSpanNums]]'s first-appearance numbering, spliced
    * right-to-left so earlier offsets stay valid — the reference algorithm
    * of `search.py:611-677`). Proven ≡ [[Masking.maskUdf]] over the real
    * span arrays ROW-BY-ROW by `q_mask_multi`'s zero-mismatch gate, which
    * is what licenses composed pipelines to run THIS codegen-friendly form
    * in their hot path instead of the boxing UDF. DuckDB twin:
    * [[graft.Oracle.maskedCteSql]]. */
  private[graft] def multiSpanMaskCol(text: Column): Column = {
    val (partNum, orderNum) = otherSpanNums(text)
    def occ(token: String, ph: Column): Column =
      transform(Tables.tokenStarts(text, token), p =>
        struct(p.as("start"), (p + token.length).cast("int").as("end"),
          ph.as("ph")))
    val spansArr = concat(
      occ("customer", lit(Masking.TargetPlaceholder)),
      occ("part", concat(lit(Masking.OtherPrefix), partNum)),
      occ("order", concat(lit(Masking.OtherPrefix), orderNum)))
    aggregate(reverse(array_sort(spansArr)), text,
      (acc, sp) => concat(
        substring(acc, lit(1), sp.getField("start")),
        sp.getField("ph"),
        substring(acc, sp.getField("end") + 1, length(acc))))
  }

  /** P3 (full multi-span path): target + stable-numbered other entities +
    * placeholder map, SELF-VERIFYING. The UDF's output is compared against an
    * independent Column-expression twin ([[multiSpanMaskCol]]: span numbering
    * by start order via when-trees, right-to-left splice via a fold over the
    * desc-sorted span array — all codegen-free HOFs on the verification
    * side only). The oracle pins n_rows to the chunk count and n_mismatch
    * to 0. The span array carries EVERY occurrence of every token, so
    * repeated-span right-to-left masking with stable per-key numbering is
    * exercised on every corpus row (`search.py:430-448, 634-677`), not just
    * at property-test scale. (Overlap skipping remains property-tested in
    * MaskingSpec — the planted tokens cannot overlap each other in text.) */
  private val qMaskMulti = Q(
    "q_mask_multi",
    (s, d) => {
      val pP = instr(col("text"), "part")
      val pO = instr(col("text"), "order")
      val (partNum, orderNum) = otherSpanNums(col("text"))
      // the expression twin under test: every token occurrence, stable
      // numbering, right-to-left splice (same order the UDF applies
      // replacements) — the shared production builder
      val expectedMasked = multiSpanMaskCol(col("text"))
      val phArr = array_sort(filter(
        array(
          struct(partNum.cast("int").as("idx"), col("part_entity_id").as("name"),
            (pP - 1).cast("int").as("start")),
          struct(orderNum.cast("int").as("idx"),
            concat(lit("o"), col("document_id")).as("name"),
            (pO - 1).cast("int").as("start"))),
        e => e.getField("start") >= 0))
      val expectedPh = concat_ws(",",
        transform(phArr, e => concat(e.getField("idx"), lit(":"), e.getField("name"))))
      withSpans(s, d)
        .withColumn("m",
          Masking.maskUdf(col("text"), col("entities"), col("other_entity_id")))
        .withColumn("ph_map",
          concat_ws(",",
            transform(col("m._2"),
              e => concat(e.getField("_1"), lit(":"), e.getField("_2")))))
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("m._1") =!= expectedMasked
            || col("ph_map") =!= expectedPh, 1L).otherwise(0L))
            .as("n_mismatch"))
    },
    Some(
      """SELECT (SELECT count(*) FROM lineitem) AS n_rows,
        |       CAST(0 AS BIGINT) AS n_mismatch""".stripMargin))

  /** P3+P5 gate: mask→unmask round-trip must equal the independently
    * Column-computed splice (UDF path vs codegen-expression path); the oracle
    * asserts zero mismatches. */
  private val qMaskRoundtrip = Q(
    "q_mask_roundtrip",
    (s, d) => {
      val c = Tables.chunkRowsPruned(s, d, withOrders = true,
        withCustomer = true, withText = true)
      val (p, ents) = customerSpan
      val expected = when(p > 0,
        concat(substring(col("text"), lit(1), p - 1),
          col("other_entity_name"),
          substring(col("text"), p + 8, length(col("text")))))
        .otherwise(col("text"))
      c.withColumn("m",
        Masking.maskUdf(col("text"), ents, col("other_entity_id")))
        .withColumn("roundtrip",
          Masking.unmaskUdf(col("m._1"), col("other_entity_name"), col("m._2")))
        .agg(sum(when(col("roundtrip") =!= expected, 1L).otherwise(0L))
          .as("n_mismatch"))
    },
    Some("SELECT CAST(0 AS BIGINT) AS n_mismatch"))

  /** Q3 gate: entity-membership predicates — `EntityQ` (any role) and
    * `ReportingEntityQ` (reporting scope, `query_builder.py:292-298`) driven
    * over the full chunk relation, with located-span membership via
    * `exists(entities, ...)` so the gate also pins the span array's keys. */
  private val qEntityMembership = Q(
    "q_entity_membership",
    (s, d) => Tables.chunkRowsFull(s, d)
      .filter(EntityQ("c1").toColumn || ReportingEntityQ("s1").toColumn)
      .groupBy(col("document_type"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(exists(col("entities"), e => e.getField("key") === "c1"), 1L)
          .otherwise(0L)).as("n_located"),
        sum(when(ReportingEntityQ("s1").toColumn, 1L).otherwise(0L))
          .as("n_reporting"))
      .orderBy(col("document_type")),
    Some(
      s"""WITH ${Oracle.chunkCte},
         |${Oracle.chunkFullCte}
         |SELECT document_type, count(*) AS n_chunks,
         |       CAST(sum(CASE WHEN len(list_filter(entities, e -> e.key = 'c1')) > 0
         |                THEN 1 ELSE 0 END) AS BIGINT) AS n_located,
         |       CAST(sum(CASE WHEN entity_id = 's1' AND is_reporting_entity
         |                THEN 1 ELSE 0 END) AS BIGINT) AS n_reporting
         |FROM chunk_full
         |WHERE (entity_id = 'c1' OR other_entity_id = 'c1' OR part_entity_id = 'c1')
         |   OR (entity_id = 's1' AND is_reporting_entity)
         |GROUP BY document_type ORDER BY document_type""".stripMargin))

  /** Q5 gate: typed-entity predicates — one predicate per type routed to its
    * denormalized column (`query_builder.py:226-271`), each counted on the
    * same scan via conditional aggregation. */
  private val qTypedEntity = Q(
    "q_typed_entity",
    (s, d) => {
      val sect = TypedEntityQ("SECT", "NATION_3").toColumn
      val regi = TypedEntityQ("REGI", "EUROPE").toColumn
      val comp = TypedEntityQ("COMP", "Supplier#000000001").toColumn
      val prod = TypedEntityQ("PROD", "p1").toColumn
      Tables.chunkRowsPruned(s, d, withOrders = true, withSupplier = true,
        withCustomer = true)
        .agg(sum(when(sect, 1L).otherwise(0L)).as("n_sect"),
          sum(when(regi, 1L).otherwise(0L)).as("n_regi"),
          sum(when(comp, 1L).otherwise(0L)).as("n_comp"),
          sum(when(prod, 1L).otherwise(0L)).as("n_prod"),
          sum(when(sect && regi, 1L).otherwise(0L)).as("n_sect_and_regi"))
    },
    Some(
      s"""WITH ${Oracle.chunkCte}
         |SELECT
         |  CAST(sum(CASE WHEN entity_sector = 'NATION_3' THEN 1 ELSE 0 END) AS BIGINT) AS n_sect,
         |  CAST(sum(CASE WHEN entity_industry = 'EUROPE' THEN 1 ELSE 0 END) AS BIGINT) AS n_regi,
         |  CAST(sum(CASE WHEN entity_name = 'Supplier#000000001'
         |           OR other_entity_name = 'Supplier#000000001' THEN 1 ELSE 0 END) AS BIGINT) AS n_comp,
         |  CAST(sum(CASE WHEN part_entity_id = 'p1' THEN 1 ELSE 0 END) AS BIGINT) AS n_prod,
         |  CAST(sum(CASE WHEN entity_sector = 'NATION_3' AND entity_industry = 'EUROPE'
         |           THEN 1 ELSE 0 END) AS BIGINT) AS n_sect_and_regi
         |FROM chunk""".stripMargin))

  /** Q6 gate: fiscal-year constraint composed with a source scope — monthly
    * chunk counts inside FY1996, news+filings only. */
  private val qFiscalYear = Q(
    "q_fiscal_year",
    (s, d) => Tables.chunkRowsPruned(s, d, withOrders = true)
      .filter(AllQ(FiscalYearQ(1996), SourceQ("news", "filings")).toColumn)
      .groupBy(date_format(col("timestamp_utc"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n_chunks"),
        countDistinct(col("entity_id")).as("n_entities"))
      .orderBy(col("month")),
    Some(
      s"""WITH ${Oracle.chunkCte}
         |SELECT strftime(timestamp_utc, '%Y-%m') AS month,
         |       count(*) AS n_chunks,
         |       count(DISTINCT entity_id) AS n_entities
         |FROM chunk
         |WHERE year(timestamp_utc) = 1996
         |  AND document_type IN ('news', 'filings')
         |GROUP BY 1 ORDER BY month""".stripMargin))

  /** Q1-Q10 driven end-to-end: one composed predicate tree on one scan —
    * similarity ∧ Any(keywords) ∧ source scope ∧ inclusive date range —
    * monthly hit counts + mean similarity. */
  private val qQueryAlgebra = Q(
    "q_query_algebra",
    (s, d) => {
      val sim = Similarity("fast spark merge query", 0.5)
      val qry = AllQ(sim, AnyQ(Keyword("join"), Keyword("window")),
        SourceQ("news", "filings"), DateRange("1995-01-01", "1999-12-31"))
      // reads text, document_type and timestamp only — the supplier and
      // customer dims are eliminated by RI (Tables.chunkRowsPruned)
      Tables.chunkRowsPruned(s, d, withOrders = true, withText = true)
        .filter(qry.toColumn)
        .groupBy(date_format(col("timestamp_utc"), "yyyy-MM").as("month"))
        .agg(count(lit(1)).as("n_hits"), round(avg(sim.score), 6).as("avg_score"))
        .orderBy(col("month"))
    },
    Some(
      s"""WITH ${Oracle.chunkCte},
         |scored AS (
         |  SELECT *,
         |    (CASE WHEN contains(lower(text), 'fast') THEN 1.0 ELSE 0.0 END
         |     + CASE WHEN contains(lower(text), 'spark') THEN 1.0 ELSE 0.0 END
         |     + CASE WHEN contains(lower(text), 'merge') THEN 1.0 ELSE 0.0 END
         |     + CASE WHEN contains(lower(text), 'query') THEN 1.0 ELSE 0.0 END) / 4.0 AS score
         |  FROM chunk
         |)
         |SELECT strftime(timestamp_utc, '%Y-%m') AS month, count(*) AS n_hits,
         |       round(avg(score), 6) AS avg_score
         |FROM scored
         |WHERE score >= 0.5
         |  AND (contains(text, 'join') OR contains(text, 'window'))
         |  AND document_type IN ('news', 'filings')
         |  AND timestamp_utc BETWEEN TIMESTAMP '1995-01-01 00:00:00'
         |                        AND TIMESTAMP '1999-12-31 23:59:59'
         |GROUP BY 1 ORDER BY month""".stripMargin))

  /** Q1+Q11+Q12+T3: similarity scoring with rerank threshold, relevance sort,
    * global top-k (deterministic tiebreak on the full unique key). */
  private val qSimilarityTopk = Q(
    "q_similarity_topk",
    (s, d) => {
      val sim = Similarity("fast spark merge query", 0.75)
      // reads text + lineitem-derived keys only (RI join elimination)
      Tables.chunkRowsPruned(s, d, withText = true)
        .withColumn("score", sim.score)
        .filter(col("score") >= 0.75)
        .select(col("sentence_id"), col("entity_id"), col("part_entity_id"),
          col("score"))
        .orderBy(col("score").desc, col("sentence_id"), col("entity_id"),
          col("part_entity_id"))
        .limit(50)
    },
    Some(
      s"""WITH ${Oracle.chunkCte},
         |scored AS (
         |  SELECT sentence_id, entity_id, part_entity_id,
         |    (CASE WHEN contains(lower(text), 'fast') THEN 1.0 ELSE 0.0 END
         |     + CASE WHEN contains(lower(text), 'spark') THEN 1.0 ELSE 0.0 END
         |     + CASE WHEN contains(lower(text), 'merge') THEN 1.0 ELSE 0.0 END
         |     + CASE WHEN contains(lower(text), 'query') THEN 1.0 ELSE 0.0 END) / 4.0 AS score
         |  FROM chunk
         |)
         |SELECT * FROM scored WHERE score >= 0.75
         |ORDER BY score DESC, sentence_id, entity_id, part_entity_id
         |LIMIT 50""".stripMargin))

  /** Q8 gate: entity auto-batching (`query_builder.py:329-361`) rendered
    * Spark-first. [[QueryAlgebra.autoBatchEntities]] computes the batch
    * groups (per-type batches of 10, zip_longest across types); instead of
    * one scan per batch group (the reference's API fan-out), the
    * entity→batch assignment becomes a tiny broadcast dimension joined to
    * the chunk scan ONCE — the three entity-role columns explode to an
    * `eid` key so the OR-match (`EntityQ` semantics) stays an equi-join
    * (an OR join condition would degrade to a nested-loop join). Per-batch
    * hit counts come out of the single shuffle. Entities: suppliers s1–s17
    * and customers c1–c8, batch size 10 → group 0 = s1..s10 ∪ c1..c8 (18),
    * group 1 = s11..s17 (7). */
  private val qEntityBatching = Q(
    "q_entity_batching",
    (s, d) => {
      import s.implicits._
      val batches = autoBatchEntities(Seq(
        "companies" -> (1 to 17).map("s" + _),
        "customers" -> (1 to 8).map("c" + _)), batchSize = 10)
      val ents = batches.zipWithIndex.flatMap { case (b, i) =>
        b.qs.collect { case EntityQ(id) => (id, i, b.qs.size.toLong) }
      }.toDF("eid", "batch_idx", "n_entities")
      // every role key is lineitem/orders-derived — supplier, customer and
      // documents joins eliminated by RI (Tables.chunkRowsPruned)
      Tables.chunkRowsPruned(s, d, withOrders = true)
        .select(col("sentence_id"), col("document_id"),
          explode(array(col("entity_id"), col("other_entity_id"),
            col("part_entity_id"))).as("eid"))
        .join(broadcast(ents), Seq("eid"))
        .groupBy(col("batch_idx"), col("n_entities"))
        .agg(countDistinct(col("sentence_id")).as("n_chunks"),
          countDistinct(col("document_id")).as("n_docs"))
        .orderBy(col("batch_idx"))
    },
    Some(
      s"""WITH ${Oracle.chunkCte},
         |ents AS (
         |  SELECT 's' || i AS eid, CAST((i - 1) // 10 AS INT) AS batch_idx
         |  FROM range(1, 18) t(i)
         |  UNION ALL
         |  SELECT 'c' || i, CAST((i - 1) // 10 AS INT)
         |  FROM range(1, 9) t(i)
         |),
         |sized AS (
         |  SELECT eid, batch_idx,
         |         count(*) OVER (PARTITION BY batch_idx) AS n_entities
         |  FROM ents
         |)
         |SELECT e.batch_idx, e.n_entities,
         |       count(DISTINCT c.sentence_id) AS n_chunks,
         |       count(DISTINCT c.document_id) AS n_docs
         |FROM chunk c
         |JOIN sized e
         |  ON e.eid IN (c.entity_id, c.other_entity_id, c.part_entity_id)
         |GROUP BY 1, 2
         |ORDER BY batch_idx""".stripMargin))

  /** Q13: the three search modes (`Board_Management_Monitoring/src/
    * tool.py:121-157, 267-288`): strict = both predicates at chunk level;
    * relaxed = primary only; relaxed_post = primary at chunk level + secondary
    * anywhere in the document (doc-level post-filter via semi-join). */
  private val qSearchModes = Q(
    "q_search_modes",
    (s, d) => {
      // r17: ONE corpus pass instead of four (strict, relaxed, the
      // docs-with-part distinct, and the semi-joined relaxed_post each
      // re-ran the scan). All three modes are functions of three doc-grain
      // conditional aggregates — per document: #customer∧part rows,
      // #customer rows, and the has-part flag — and every countDistinct
      // (document_id) becomes a doc-grain count. The relation is
      // lineitem⋈documents only: the modes read text and document_id, so
      // the orders/supplier/customer dims are eliminated by RI
      // (Tables.chunkRowsPruned rationale). Values pinned unchanged by the
      // same oracle.
      val isCust = col("text").contains("customer")
      val isPart = col("text").contains("part")
      val g = Tables.lineitem(s, d)
        .join(Tables.documents(s, d).select(col("doc_id"), col("text")),
          Tables.docJoinCond(s, d))
        .groupBy(col("l_orderkey"))
        .agg(
          sum(when(isCust && isPart, 1L).otherwise(0L)).as("n_cp"),
          sum(when(isCust, 1L).otherwise(0L)).as("n_cu"),
          max(isPart).as("has_part"))
      val tot = g.agg(
        coalesce(sum(col("n_cp")), lit(0L)).as("strict_chunks"),
        coalesce(sum(when(col("n_cp") > 0, 1L).otherwise(0L)), lit(0L))
          .as("strict_docs"),
        coalesce(sum(col("n_cu")), lit(0L)).as("relaxed_chunks"),
        coalesce(sum(when(col("n_cu") > 0, 1L).otherwise(0L)), lit(0L))
          .as("relaxed_docs"),
        coalesce(sum(when(col("has_part"), col("n_cu")).otherwise(0L)),
          lit(0L)).as("rp_chunks"),
        coalesce(sum(when(col("has_part") && col("n_cu") > 0, 1L)
          .otherwise(0L)), lit(0L)).as("rp_docs"))
      tot.select(explode(array(
          struct(lit("relaxed").as("mode"),
            col("relaxed_chunks").as("n_chunks"),
            col("relaxed_docs").as("n_docs")),
          struct(lit("relaxed_post").as("mode"),
            col("rp_chunks").as("n_chunks"), col("rp_docs").as("n_docs")),
          struct(lit("strict").as("mode"),
            col("strict_chunks").as("n_chunks"),
            col("strict_docs").as("n_docs")))).as("m"))
        .select(col("m.mode").as("mode"), col("m.n_chunks").as("n_chunks"),
          col("m.n_docs").as("n_docs"))
        .orderBy(col("mode"))
    },
    Some(
      s"""WITH ${Oracle.chunkCte},
         |modes AS (
         |  SELECT 'strict' AS mode, count(*) AS n_chunks,
         |         count(DISTINCT document_id) AS n_docs
         |  FROM chunk
         |  WHERE contains(text, 'customer') AND contains(text, 'part')
         |  UNION ALL
         |  SELECT 'relaxed', count(*), count(DISTINCT document_id)
         |  FROM chunk WHERE contains(text, 'customer')
         |  UNION ALL
         |  SELECT 'relaxed_post', count(*), count(DISTINCT document_id)
         |  FROM chunk
         |  WHERE contains(text, 'customer') AND document_id IN (
         |    SELECT DISTINCT document_id FROM chunk WHERE contains(text, 'part'))
         |)
         |SELECT * FROM modes ORDER BY mode""".stripMargin))

  def queries: Seq[Q] = Seq(qExplodeRoles, qTopicsExplode, qOtherEntities,
    qEntitiesArray, qScrub, qPresentation, qMaskTarget, qMaskMulti,
    qMaskRoundtrip, qEntityMembership, qTypedEntity, qFiscalYear,
    qQueryAlgebra, qSimilarityTopk, qSearchModes, qEntityBatching)
}
