package graft.query

import java.sql.Timestamp

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's query algebra (SURVEY.md §2.2, Q1-Q12) re-expressed as
  * predicate combinators that compile to Catalyst [[Column]]s over the
  * chunk-row relation.
  *
  * The reference composes `Similarity & Any(Entity...) & Keyword & Source &
  * FiscalYear` trees and fans them out to a search API
  * (`Tracking_Inflation_Drivers/src/query_builder.py:363-408`). Here the whole
  * tree becomes ONE `Column` predicate on ONE scan: Catalyst pushes the
  * sargable parts into the Parquet reader (date/source/entity filters) and
  * whole-stage-codegens the text predicates, so the reference's hand-built
  * fan-out (Q8/Q10 batching × date ranges) collapses into partition pruning +
  * task parallelism.
  */
object QueryAlgebra {

  sealed trait Qry {
    def toColumn: Column
    def &&(other: Qry): Qry = AllQ(this, other)
    def ||(other: Qry): Qry = AnyQ(this, other)
  }

  /** Q2: exact keyword hit in the chunk text. */
  final case class Keyword(word: String) extends Qry {
    def toColumn: Column = col("text").contains(word)
  }

  /** Q3: document mentions the entity (any role). */
  final case class EntityQ(id: String) extends Qry {
    def toColumn: Column =
      col("entity_id") === id || col("other_entity_id") === id ||
        col("part_entity_id") === id
  }

  /** Q3 variant: entity is the reporting entity (filings/transcripts scope,
    * `query_builder.py:292-298`). */
  final case class ReportingEntityQ(id: String) extends Qry {
    def toColumn: Column = col("entity_id") === id && col("is_reporting_entity")
  }

  /** Q3 at watchlist width: ANY of `ids` mentioned in any role. Boolean-
    * equivalent to `AnyQ(ids.map(EntityQ(_)): _*)` (OR commutes over ids
    * and roles) but rendered as THREE set-membership predicates instead of
    * a 3·|ids|-node Or-tree: at width > 10 Catalyst compiles `isin` to an
    * O(1)-per-row InSet hash probe, while the Or-tree form costs the
    * optimizer (constraint propagation over large disjunctions) and the
    * evaluator per term — measured 7.7-8.3 s vs 1.0-1.3 s for an
    * 80-company watchlist over the sf0.1 scan. Use this for the sargable
    * watchlist conjunct; the per-batch 3-entity disjunctions stay as
    * small Or-trees. */
  final case class EntityAnyQ(ids: Seq[String]) extends Qry {
    def toColumn: Column =
      col("entity_id").isin(ids: _*) ||
        col("other_entity_id").isin(ids: _*) ||
        col("part_entity_id").isin(ids: _*)
  }

  /** Q5: typed-entity control predicates (Topic/Place/Organization/... —
    * `query_builder.py:226-271`). The chunk relation denormalizes typed
    * entities into columns; the type map routes each predicate to its
    * column, mirroring the reference's per-type dispatch. */
  final case class TypedEntityQ(entityType: String, value: String) extends Qry {
    def toColumn: Column = entityType match {
      case "SECT" => col("entity_sector") === value
      case "REGI" => col("entity_industry") === value
      case "COMP" => col("entity_name") === value ||
        col("other_entity_name") === value
      case "PROD" => col("part_entity_id") === value
      case other =>
        throw new IllegalArgumentException(s"unknown entity type $other")
    }
  }

  /** Q4/S2: source scope filter (document types). */
  final case class SourceQ(types: String*) extends Qry {
    def toColumn: Column = col("document_type").isin(types: _*)
  }

  /** Q6: fiscal-year constraint. Rendered as the equivalent half-open
    * timestamp range, NOT `year(ts) === y`: wrapping the column in year()
    * defeats parquet min/max row-group pruning and partition pruning on a
    * date-partitioned table, while the range form is sargable — at 100 TB
    * that is the difference between scanning one year and scanning all of
    * them. */
  final case class FiscalYearQ(y: Int) extends Qry {
    def toColumn: Column =
      col("timestamp_utc") >= to_timestamp(lit(s"$y-01-01 00:00:00")) &&
        col("timestamp_utc") < to_timestamp(lit(s"${y + 1}-01-01 00:00:00"))
  }

  /** Q9: inclusive date-range constraint (reference ranges end 23:59:59,
    * `query_builder.py:410-517`). On a date-partitioned table this is the
    * predicate partition pruning keys off. */
  final case class DateRange(startInclusive: String, endInclusive: String) extends Qry {
    def toColumn: Column =
      col("timestamp_utc") >= to_timestamp(lit(s"$startInclusive 00:00:00")) &&
        col("timestamp_utc") <= to_timestamp(lit(s"$endInclusive 23:59:59"))
  }

  /** Q7: conjunction. Empty = `true` (the identity of ∧) — dynamically
    * built trees legitimately produce zero conjuncts, and an opaque
    * empty-reduce crash far from the construction site helps nobody. */
  final case class AllQ(qs: Qry*) extends Qry {
    def toColumn: Column =
      qs.map(_.toColumn).reduceOption(_ && _).getOrElse(lit(true))
  }

  /** Q2/Q7: batched disjunction (`Any([...])`). Empty = `false` (the
    * identity of ∨): a disjunction over zero alternatives matches nothing. */
  final case class AnyQ(qs: Qry*) extends Qry {
    def toColumn: Column =
      qs.map(_.toColumn).reduceOption(_ || _).getOrElse(lit(false))
  }

  /** Q1: deterministic stand-in for embedding similarity — the fraction of the
    * query sentence's distinct tokens present in the chunk text. Scores are
    * k/n with small n, hence exactly representable doubles: aggregates over
    * them are bit-reproducible in any engine. A real embedding-cosine scorer
    * is the `graft.sim` module; this one keeps the query algebra hermetic. */
  final case class Similarity(sentence: String, minScore: Double) extends Qry {
    val tokens: Seq[String] =
      sentence.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct.toSeq
    require(tokens.nonEmpty,
      s"Similarity needs at least one token, got '$sentence'")
    // match on lower(text): the tokens are lowercased above, so a
    // case-sensitive contains would silently never match capitalized text
    def score: Column =
      tokens.map(t => when(lower(col("text")).contains(t), 1.0).otherwise(0.0))
        .reduce(_ + _) / lit(tokens.size.toDouble)
    def toColumn: Column = score >= minScore
  }

  /** Q8: entity auto-batching (`query_builder.py:329-361`) — split each
    * type's entity list into batches of `batchSize` (order-preserving), then
    * combine batches ACROSS types positionally (the reference's
    * `zip_longest(*all_entity_batches, fillvalue=[])`): batch group i holds
    * type A's i-th batch ∪ type B's i-th batch ∪ …, flattened into one
    * `Any(...)` disjunction; empty groups are skipped. The reference needs
    * this to bound per-API-call cost; here each group compiles to one
    * `Column` predicate, and the union of all groups over one scan is
    * semantically ⊇-equivalent to `Any(all entities)` (a row can match
    * several groups — exactly the reference's overlapping per-batch searches,
    * which is why D2 cross-search dedup exists downstream). At scale the
    * groups should share a single scan (Q10's one-scan fan-out) rather than
    * re-scan per batch — `q_entity_batching` renders it that way: the
    * entity→batch assignment becomes a broadcast dimension equi-join. */
  def autoBatchEntities(entitiesByType: Seq[(String, Seq[String])],
      batchSize: Int): Seq[AnyQ] = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    val perType: Seq[Seq[Seq[String]]] = entitiesByType.map(_._2)
      .filter(_.nonEmpty).map(_.grouped(batchSize).toSeq)
    if (perType.isEmpty) Seq.empty
    else (0 until perType.map(_.size).max).map { i =>
      // never empty for i < max: perType keeps only non-empty lists and
      // grouped(n) never yields an empty batch, so the type(s) realizing
      // the max contribute at every i
      val group = perType.flatMap(batches =>
        if (i < batches.size) batches(i) else Seq.empty)
      AnyQ(group.map(EntityQ(_)): _*)
    }
  }

  /** Q9: date-range partitioner — split [start, end] into calendar intervals
    * with inclusive ends, mirroring `create_date_ranges`
    * (`query_builder.py:488-517`). Used for planning/tests; at execution time
    * the single-scan predicate above subsumes it. */
  def dateRanges(start: String, end: String, freq: String): Seq[(Timestamp, Timestamp)] = {
    import java.time.LocalDate
    val s = LocalDate.parse(start)
    val e = LocalDate.parse(end)
    val step: LocalDate => LocalDate = freq match {
      case "D" => _.plusDays(1)
      case "W" => _.plusWeeks(1)
      case "M" => _.plusMonths(1)
      case "3M" => _.plusMonths(3)
      case "Y" => _.plusYears(1)
      case other => throw new IllegalArgumentException(s"freq $other")
    }
    Iterator.iterate(s)(step).takeWhile(!_.isAfter(e)).map { lo =>
      val hiExclusive = step(lo)
      val hi = if (hiExclusive.isAfter(e)) e else hiExclusive.minusDays(1)
      (Timestamp.valueOf(lo.atStartOfDay()),
        Timestamp.valueOf(hi.atTime(23, 59, 59)))
    }.toSeq
  }
}
