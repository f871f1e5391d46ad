package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.query.QueryAlgebra._

/** Date-range partitioner semantics (Q9): inclusive ends at 23:59:59,
  * contiguous non-overlapping coverage — `query_builder.py:410-517`. */
class QueryAlgebraSpec extends AnyFunSuite {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("monthly ranges cover the interval with inclusive 23:59:59 ends") {
    val r = dateRanges("2023-01-15", "2023-03-20", "M")
    assert(r.size == 3)
    assert(r.head == (ts("2023-01-15 00:00:00"), ts("2023-02-14 23:59:59")))
    assert(r.last._2 == ts("2023-03-20 23:59:59"))
  }

  test("daily ranges: one per day, start==end date") {
    val r = dateRanges("2023-01-01", "2023-01-03", "D")
    assert(r.size == 3)
    assert(r(1) == (ts("2023-01-02 00:00:00"), ts("2023-01-02 23:59:59")))
  }

  // Q8 auto-batching (`query_builder.py:329-361`): per-type batches of
  // batch_size, combined across types positionally (zip_longest, empty fill),
  // each group one Any(...) disjunction, empty groups skipped.
  private def ids(q: AnyQ): Seq[String] =
    q.qs.collect { case EntityQ(id) => id }

  test("auto-batching splits each type into ordered batches of batchSize") {
    val b = autoBatchEntities(Seq("comp" -> (1 to 17).map("s" + _)), 10)
    assert(b.map(ids(_).size) == Seq(10, 7))
    assert(ids(b.head) == (1 to 10).map("s" + _))
    assert(ids(b(1)) == (11 to 17).map("s" + _))
  }

  test("auto-batching zips batches across types positionally") {
    val b = autoBatchEntities(Seq(
      "comp" -> (1 to 17).map("s" + _),
      "cust" -> (1 to 8).map("c" + _)), 10)
    assert(b.size == 2)
    assert(ids(b.head) == (1 to 10).map("s" + _) ++ (1 to 8).map("c" + _))
    assert(ids(b(1)) == (11 to 17).map("s" + _))
  }

  test("auto-batching zip_longest: short types drop out of later groups") {
    val b = autoBatchEntities(Seq(
      "a" -> (1 to 5).map("a" + _),
      "b" -> Seq("b1"),
      "c" -> Seq.empty), 2)
    assert(b.size == 3)
    assert(ids(b.head) == Seq("a1", "a2", "b1"))
    assert(ids(b(1)) == Seq("a3", "a4"))
    assert(ids(b(2)) == Seq("a5"))
  }

  test("auto-batching: no entities -> no batches; bad batchSize throws") {
    assert(autoBatchEntities(Seq("a" -> Seq.empty), 10).isEmpty)
    assert(autoBatchEntities(Seq.empty, 10).isEmpty)
    intercept[IllegalArgumentException](autoBatchEntities(Seq.empty, 0))
  }

  test("union of batch predicates covers exactly Any(all entities)") {
    val all = (1 to 17).map("s" + _) ++ (1 to 8).map("c" + _)
    val b = autoBatchEntities(Seq(
      "comp" -> (1 to 17).map("s" + _),
      "cust" -> (1 to 8).map("c" + _)), 10)
    assert(b.flatMap(ids).sorted == all.sorted)
    assert(b.flatMap(ids).distinct.size == all.size, "no entity in two groups")
  }

  test("ranges are contiguous and non-overlapping") {
    for (freq <- Seq("D", "W", "M", "3M", "Y")) {
      val r = dateRanges("2022-03-07", "2024-11-23", freq)
      r.sliding(2).foreach {
        case Seq((_, hi), (lo2, _)) =>
          assert(lo2.getTime - hi.getTime == 1000L,
            s"freq=$freq gap between $hi and $lo2")
        case _ =>
      }
      assert(r.head._1 == ts("2022-03-07 00:00:00"))
      assert(r.last._2 == ts("2024-11-23 23:59:59"))
    }
  }

  test("similarity tokenization dedups and lowercases") {
    val s = Similarity("Fast fast MERGE", 0.5)
    assert(s.tokens == Seq("fast", "merge"))
  }

  test("similarity rejects an empty sentence at construction") {
    assertThrows[IllegalArgumentException](Similarity("", 0.5))
    assertThrows[IllegalArgumentException](Similarity("   ", 0.5))
  }

  test("empty combinators use boolean identities, not empty-reduce crashes") {
    // AllQ() = true (identity of AND), AnyQ() = false (identity of OR) —
    // dynamically built trees legitimately produce zero children
    assert(AllQ().toColumn.toString == "true")
    assert(AnyQ().toColumn.toString == "false")
  }

  test("combinators compose without a session") {
    val q = (Keyword("a") && SourceQ("news")) || FiscalYearQ(1995)
    assert(q.toColumn != null)
  }

  test("typed entity predicates dispatch by type; unknown types are rejected") {
    assert(TypedEntityQ("SECT", "NATION_3").toColumn != null)
    assert(TypedEntityQ("COMP", "Supplier#1").toColumn != null)
    assertThrows[IllegalArgumentException](
      TypedEntityQ("NOPE", "x").toColumn)
  }
}
