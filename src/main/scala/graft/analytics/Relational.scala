package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Oracle, Q}
import graft.label.Labeler
import graft.model.Tables

/** Core relational operators of the reference's analytics layer
  * (SURVEY.md §2.6 aggregations, §2.8 top-k, §2.4 dedup).
  *
  * Scale notes: every query here is a single shuffle (the groupBy/window key);
  * dimension sides are broadcast inside [[Tables.chunkRows]]. Aggregates are
  * all algebraic (sum/count/min/max) so map-side partial aggregation applies;
  * no collect() anywhere. Output ordering is a total deterministic order —
  * required by the hash-compare gate, and cheap relative to the aggregate.
  */
object Relational {

  /** A1-family baseline: TPC-H Q1-shaped grouped aggregate on the fact table.
    * Revenue is pre-quantized (per-row floor(x*1e6), exact integer sum,
    * divided back out) — a raw double sum is shuffle-order-dependent and a
    * round() on top of it can flip at .005 boundaries between engines; the
    * quantized sum is bit-identical under any shuffle schedule. The oracle
    * casts PER ROW (DuckDB's floor returns DOUBLE; summing doubles and
    * casting after would lose exactness past 2⁵³ — per-group sums are
    * already ~5e15 at sf0.1, so the after-the-sum cast had maybe one order
    * of magnitude of headroom). */
  private val q1Agg = Q(
    "q1_agg",
    (s, d) => Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        (sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * 1e6)).cast("long") / 1e6).as("revenue"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"), col("l_linestatus")),
    Some(
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
        |       sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 1e6) AS BIGINT)) / 1e6 AS revenue,
        |       count(*) AS n_rows
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin))

  /** A1: occurrence counts per (sector, company) over the chunk table.
    * Reads only supplier-derived columns, so the pruned relation skips the
    * lineitem⋈orders fact join and the customer/documents sides entirely
    * (r17: join elimination by RI, see [[Tables.chunkRowsPruned]]) —
    * map-only up to the one groupBy exchange at any scale. */
  private val qCounts = Q(
    "q_counts_sector_company",
    (s, d) => Tables.chunkRowsPruned(s, d, withSupplier = true)
      .groupBy(col("entity_sector"), col("entity_name"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("entity_sector"), col("entity_name")),
    Some(
      s"""WITH ${Oracle.chunkCte}
         |SELECT entity_sector, entity_name, count(*) AS cnt
         |FROM chunk
         |GROUP BY entity_sector, entity_name
         |ORDER BY entity_sector, entity_name""".stripMargin))

  /** A2: distinct counts (documents, entities) per sector. At 100 TB the
    * exact countDistinct shuffles twice; swap to approx_count_distinct when
    * an estimate suffices. */
  private val qDistinct = Q(
    "q_distinct_counts",
    (s, d) => Tables.chunkRowsPruned(s, d, withSupplier = true)
      .groupBy(col("entity_sector"))
      .agg(
        countDistinct(col("document_id")).as("n_docs"),
        countDistinct(col("entity_id")).as("n_entities"),
        count(lit(1)).as("n_chunks"))
      .orderBy(col("entity_sector")),
    Some(
      s"""WITH ${Oracle.chunkCte}
         |SELECT entity_sector,
         |       count(DISTINCT document_id) AS n_docs,
         |       count(DISTINCT entity_id) AS n_entities,
         |       count(*) AS n_chunks
         |FROM chunk
         |GROUP BY entity_sector
         |ORDER BY entity_sector""".stripMargin))

  /** A3: pivot count matrix entity × label + Composite Score
    * (`mind_map_tools.py:559-578`, ThematicScreener cell 30). Fixed label
    * alphabet keeps the pivot schema static (no extra pass to discover
    * columns, stable at any SF). */
  private val qPivot = Q(
    "q_pivot_scores",
    (s, d) => Labeler.withStubLabels(
      Tables.chunkRowsPruned(s, d, withSupplier = true, withText = true))
      .groupBy(col("entity_name"))
      .pivot("label", Seq("P", "A", "N", "U"))
      .agg(count(lit(1)))
      .na.fill(0, Seq("P", "A", "N", "U"))
      .withColumn("composite_score",
        col("P") + col("A") + col("N") + col("U"))
      .orderBy(col("composite_score").desc, col("entity_name")),
    Some(
      s"""${Oracle.labeledCte}
         |SELECT entity_name,
         |       count(*) FILTER (label = 'P') AS P,
         |       count(*) FILTER (label = 'A') AS A,
         |       count(*) FILTER (label = 'N') AS N,
         |       count(*) FILTER (label = 'U') AS U,
         |       count(*) AS composite_score
         |FROM labeled
         |GROUP BY entity_name
         |ORDER BY composite_score DESC, entity_name""".stripMargin))

  /** T2: top-3 companies per sector by chunk count (window row_number —
    * single shuffle on sector, no driver-side loop unlike the reference's
    * per-sector nlargest loop at `tool.py:121-128`). */
  private val qTopkPerGroup = Q(
    "q_topk_per_group",
    (s, d) => {
      val counts = Tables.chunkRowsPruned(s, d, withSupplier = true)
        .groupBy(col("entity_sector"), col("entity_name"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("entity_sector"))
        .orderBy(col("cnt").desc, col("entity_name"))
      counts.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .orderBy(col("entity_sector"), col("rk"))
    },
    Some(
      s"""WITH ${Oracle.chunkCte},
         |counts AS (
         |  SELECT entity_sector, entity_name, count(*) AS cnt
         |  FROM chunk GROUP BY entity_sector, entity_name
         |)
         |SELECT * FROM (
         |  SELECT entity_sector, entity_name, cnt,
         |         CAST(row_number() OVER (PARTITION BY entity_sector
         |                                 ORDER BY cnt DESC, entity_name) AS INT) AS rk
         |  FROM counts
         |) WHERE rk <= 3
         |ORDER BY entity_sector, rk""".stripMargin))

  /** A9: exemplar (argmax) extraction — per entity, the day with the highest
    * chunk count, deterministic tiebreak (count desc, day desc) mirroring the
    * reference's idxmax-then-last-row at `tool.py:80-91`. */
  private val qExemplar = Q(
    "q_exemplar_argmax",
    (s, d) => {
      val daily = Tables.chunkRowsPruned(s, d, withOrders = true)
        .groupBy(col("entity_id"),
          date_format(col("timestamp_utc"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("cnt"))
      // (cnt, day) is unique within an entity, so max_by on the struct is the
      // deterministic argmax — one aggregate, no window sort.
      daily.groupBy(col("entity_id"))
        .agg(max_by(struct(col("cnt"), col("day")),
          struct(col("cnt"), col("day"))).as("m"))
        .select(col("entity_id"), col("m.day").as("day"), col("m.cnt").as("cnt"))
        .orderBy(col("entity_id"))
    },
    Some(
      s"""WITH ${Oracle.chunkCte},
         |daily AS (
         |  SELECT entity_id, strftime(timestamp_utc, '%Y-%m-%d') AS day,
         |         count(*) AS cnt
         |  FROM chunk GROUP BY 1, 2
         |)
         |SELECT entity_id, day, cnt FROM daily
         |QUALIFY row_number() OVER (PARTITION BY entity_id
         |                           ORDER BY cnt DESC, day DESC) = 1
         |ORDER BY entity_id""".stripMargin))

  /** A11: label distribution, absolute + normalized share. */
  private val qLabelDist = Q(
    "q_label_distribution",
    (s, d) => {
      val counts = Labeler.withStubLabels(
        Tables.chunkRowsPruned(s, d, withText = true))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("cnt"))
      counts
        .withColumn("share",
          round(col("cnt") / sum(col("cnt")).over(Window.partitionBy()), 6))
        .orderBy(col("label"))
    },
    Some(
      s"""${Oracle.labeledCte}
         |SELECT label, count(*) AS cnt,
         |       round(count(*) / CAST(sum(count(*)) OVER () AS DOUBLE), 6) AS share
         |FROM labeled
         |GROUP BY label
         |ORDER BY label""".stripMargin))

  /** A12: summary-stats table per document_type (min/max date, counts). */
  private val qSummaryStats = Q(
    "q_summary_stats",
    (s, d) => Tables.chunkRowsPruned(s, d, withOrders = true)
      .groupBy(col("document_type"))
      .agg(
        date_format(min(col("timestamp_utc")), "yyyy-MM-dd").as("min_date"),
        date_format(max(col("timestamp_utc")), "yyyy-MM-dd").as("max_date"),
        count(lit(1)).as("n_chunks"),
        countDistinct(col("document_id")).as("n_docs"))
      .orderBy(col("document_type")),
    Some(
      s"""WITH ${Oracle.chunkCte}
         |SELECT document_type,
         |       strftime(min(timestamp_utc), '%Y-%m-%d') AS min_date,
         |       strftime(max(timestamp_utc), '%Y-%m-%d') AS max_date,
         |       count(*) AS n_chunks,
         |       count(DISTINCT document_id) AS n_docs
         |FROM chunk
         |GROUP BY document_type
         |ORDER BY document_type""".stripMargin))

  /** D1: exact chunk-row dedup on the reference's key
    * (timestamp, document, text, entity), deterministic keeper = min
    * sentence_id. Implemented as a hash aggregate (map-side combine) rather
    * than a row_number window: no sort, and the shuffle key carries md5(text)
    * (32 bytes) instead of the full chunk text — at 100 TB that is the
    * difference between shuffling the corpus and shuffling its digest. */
  private val qDedupExact = Q(
    "q_dedup_exact",
    (s, d) => {
      // r17 shape (values pinned unchanged by the same oracle):
      //  - the only dimension read is the chunk text, so the relation is
      //    lineitem ⋈ documents — the lineitem⋈orders fact join and the
      //    supplier/customer sides are eliminated by RI
      //    ([[Tables.chunkRowsPruned]] rationale; keys built from lineitem);
      //  - timestamp_utc leaves the group key: o_orderdate is single-valued
      //    per o_orderkey (orders PK — pinned in TableContractSpec), and
      //    document_id is already in the key, so the extra key cannot split
      //    any group;
      //  - min(sentence_id) becomes min(l_linenumber): within a group the
      //    orderkey prefix is constant and l_linenumber is single-digit
      //    (1..7, pinned in TableContractSpec), so the lexicographic string
      //    min equals the numeric min. The payoff is the aggregate buffer
      //    turning fixed-width: a STRING min buffer demotes the aggregate
      //    to Sort+SortAggregate (twice, around the exchange), while the
      //    int buffer keeps whole-stage-codegen'd HashAggregate with
      //    map-side partials — and the shuffle carries (long, 32-char md5,
      //    long, int) instead of four strings.
      // md5 is computed ONCE PER DOCUMENT on the dimension side (|docs|
      // hashes instead of |chunks|), and the join attaches the 32-char
      // digest instead of the text payload — the same value reaches the
      // group key (md5 of the same text), with |text|-sized bytes never
      // leaving the documents scan (guide §2.3: move digests, not
      // payloads).
      val l = Tables.lineitem(s, d)
      val doc = Tables.documents(s, d)
      l.join(doc.select(col("doc_id"), md5(col("text")).as("text_md5")),
          Tables.docJoinCond(s, d))
        .groupBy(col("l_orderkey"), col("text_md5"), col("l_suppkey"))
        .agg(min(col("l_linenumber")).as("min_ln"))
        .select(
          col("l_orderkey").cast("string").as("document_id"),
          concat(col("l_orderkey").cast("string"), lit("-"),
            col("min_ln").cast("string")).as("sentence_id"),
          concat(lit("s"), col("l_suppkey")).as("entity_id"))
        .orderBy(col("document_id"), col("sentence_id"), col("entity_id"))
    },
    Some(
      s"""WITH ${Oracle.chunkCte}
         |SELECT document_id, min(sentence_id) AS sentence_id, entity_id
         |FROM chunk
         |GROUP BY timestamp_utc, document_id, md5(text), entity_id
         |ORDER BY document_id, sentence_id, entity_id""".stripMargin))

  /** Rollup / grouping sets (noted free in SURVEY.md §2.6): sector ×
    * doctype counts with subtotal and grand-total rows. */
  private val qRollup = Q(
    "q_rollup_counts",
    (s, d) => Tables.chunkRowsPruned(s, d, withOrders = true,
      withSupplier = true)
      .rollup(col("entity_sector"), col("document_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(coalesce(col("entity_sector"), lit("ALL")).as("sector"),
        coalesce(col("document_type"), lit("ALL")).as("doctype"),
        col("cnt"))
      .orderBy(col("sector"), col("doctype")),
    Some(
      s"""WITH ${Oracle.chunkCte}
         |SELECT COALESCE(entity_sector, 'ALL') AS sector,
         |       COALESCE(document_type, 'ALL') AS doctype,
         |       count(*) AS cnt
         |FROM chunk
         |GROUP BY ROLLUP(entity_sector, document_type)
         |ORDER BY sector, doctype""".stripMargin))

  /** Set algebra (SURVEY.md §2.9 note): entities present in news AND filings
    * but NOT transcripts — intersect/except with set (distinct) semantics.
    * Restricted to a single month: over the full history every entity appears
    * in every document type, which made the gate vacuous (0 rows on both
    * sides proves nothing); the month slice yields a non-empty result at
    * sf0.01 (verified: 24 rows), so INTERSECT/EXCEPT semantics are actually
    * exercised. */
  private val qSetOps = Q(
    "q_intersect_except",
    (s, d) => {
      // half-open range, not date_format(ts) === '1998-07': the format
      // wrap defeats parquet min/max pruning on the orders scan; the
      // equivalent range is sargable (same rationale as FiscalYearQ)
      val c = Tables.chunkRowsPruned(s, d, withOrders = true)
        .filter(col("timestamp_utc") >= to_timestamp(lit("1998-07-01")) &&
          col("timestamp_utc") < to_timestamp(lit("1998-08-01")))
      def ents(t: String) = c.filter(col("document_type") === t)
        .select(col("entity_id")).distinct()
      ents("news").intersect(ents("filings"))
        .except(ents("transcripts"))
        .orderBy(col("entity_id"))
    },
    Some(
      s"""WITH ${Oracle.chunkCte},
         |m AS (SELECT * FROM chunk WHERE strftime(timestamp_utc, '%Y-%m') = '1998-07')
         |SELECT entity_id FROM m WHERE document_type = 'news'
         |INTERSECT
         |SELECT entity_id FROM m WHERE document_type = 'filings'
         |EXCEPT
         |SELECT entity_id FROM m WHERE document_type = 'transcripts'
         |ORDER BY entity_id""".stripMargin))

  def queries: Seq[Q] = Seq(q1Agg, qCounts, qDistinct, qPivot, qTopkPerGroup,
    qExemplar, qLabelDist, qSummaryStats, qDedupExact, qRollup, qSetOps)
}
