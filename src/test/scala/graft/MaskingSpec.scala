package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.Masking
import graft.functions.Masking.Span

/** Invariants of the masking algorithm (SURVEY.md §7.4 item 1; reference
  * semantics `search.py:611-677`). */
class MaskingSpec extends AnyFunSuite {

  test("single target span is replaced with Target Company") {
    val text = "alpha customer beta"
    val (masked, phMap) =
      Masking.mask(text, Seq(Span("c1", "Cust One", 6, 14)), "c1")
    assert(masked == "alpha Target Company beta")
    assert(phMap.isEmpty)
  }

  test("non-target entities get stable numbering by first appearance") {
    val text = "aa bb cc aa"
    // spans: aa@0, bb@3, cc@6, aa@9 — aa must keep number 1 at both spans
    val spans = Seq(
      Span("e_aa", "AA Corp", 0, 2), Span("e_bb", "BB Inc", 3, 5),
      Span("e_cc", "CC Ltd", 6, 8), Span("e_aa", "AA Corp", 9, 11))
    val (masked, phMap) = Masking.mask(text, spans, "none")
    assert(masked == "Other Company_1 Other Company_2 Other Company_3 Other Company_1")
    assert(phMap == Seq((1, "AA Corp"), (2, "BB Inc"), (3, "CC Ltd")))
  }

  test("spans overlapping a target span are skipped") {
    val text = "megacorp industries"
    val spans = Seq(
      Span("t", "Mega", 0, 8),        // target
      Span("o", "Corp", 4, 12))       // overlaps target → skipped
    val (masked, phMap) = Masking.mask(text, spans, "t")
    assert(masked == "Target Company industries")
    assert(phMap.isEmpty)
  }

  test("replacements apply right-to-left (offsets stay valid)") {
    val text = "x customer y part z"
    val spans = Seq(Span("c", "Cust", 2, 10), Span("p", "Part", 13, 17))
    val (masked, _) = Masking.mask(text, spans, "c")
    assert(masked == "x Target Company y Other Company_1 z")
  }

  test("unmask inverts mask when names are placeholder-free") {
    val text = "aa sells to bb and cc"
    val spans = Seq(
      Span("a", "Acme", 0, 2), Span("b", "Bolt", 12, 14),
      Span("c", "Core", 19, 21))
    val (masked, phMap) = Masking.mask(text, spans, "a")
    val um = Masking.unmask(masked, "Acme", phMap)
    assert(um == "Acme sells to Bolt and Core")
  }

  test("unmask restores a name containing the literal 'Target Company'") {
    // reference order (labeling.py:30 before :35): the target regex runs
    // FIRST, so an other-entity name like "Target Company Holdings"
    // restored afterwards is never handed to the target regex to corrupt
    // ("Acme Holdings"). Also pins the reference's _\d{1,2} suffix bound.
    val um = Masking.unmask("Other Company_1 cut costs", "Acme",
      Seq((1, "Target Company Holdings")))
    assert(um == "Target Company Holdings cut costs")
    assert(Masking.unmask("Target Company_2 rose", "Acme", Nil)
      == "Acme rose")
    // 3-digit suffix: the greedy {1,2} consumes two digits and leaves the
    // third — CPython-verified reference behavior, quirk and all
    assert(Masking.unmask("Target Company_123 rose", "Acme", Nil)
      == "Acme3 rose")
  }

  test("overlapping non-target spans resolve keep-first, never garble") {
    // nested/overlapping NER mentions: e2 overlaps e1 — the right-to-left
    // splice is only offset-safe over disjoint spans, so e2 must be DROPPED
    // (keep-first in start order), not spliced through e1's placeholder
    val text = "megacorp industries report"
    val spans = Seq(
      Span("e1", "Mega", 0, 8),    // "megacorp" — kept
      Span("e2", "Corp", 4, 13),   // overlaps e1 → dropped
      Span("e3", "Indy", 9, 19))   // "industries" — disjoint, numbered 2
    val (masked, phMap) = Masking.mask(text, spans, "none")
    assert(masked == "Other Company_1 Other Company_2 report",
      s"got '$masked'")
    assert(phMap == Seq((1, "Mega"), (2, "Indy")))
  }

  test("out-of-bounds and empty spans are ignored") {
    val text = "short"
    val spans = Seq(Span("a", "A", -1, 3), Span("b", "B", 2, 99),
      Span("c", "C", 3, 3))
    val (masked, phMap) = Masking.mask(text, spans, "a")
    assert(masked == text && phMap.isEmpty)
  }

  // Property: for disjoint word-aligned spans with distinct names,
  // mask→unmask replaces each span's word by its entity name.
  test("property: mask→unmask equals direct name substitution on disjoint spans") {
    val wordGen = Gen.listOfN(8, Gen.oneOf("tok", "mid", "end", "joins"))
    val prop = Prop.forAll(wordGen, Gen.chooseNum(0, 7), Gen.chooseNum(0, 7)) {
      (words: List[String], i: Int, j: Int) =>
        i == j || {
          val text = words.mkString(" ")
          def spanOf(k: Int): Span = {
            val start = words.take(k).map(_.length + 1).sum
            Span(s"e$k", s"Name$k", start, start + words(k).length)
          }
          val spans = Seq(spanOf(i), spanOf(j))
          val (masked, phMap) = Masking.mask(text, spans, s"e$i")
          val um = Masking.unmask(masked, s"Name$i", phMap)
          val expected = words.zipWithIndex.map {
            case (_, k) if k == i => s"Name$i"
            case (_, k) if k == j => s"Name$j"
            case (w, _) => w
          }.mkString(" ")
          um == expected
        }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }
}
