package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.report.Presentation

/** Property laws for the P8 greedy wrap (`tool.py:11-46` semantics):
  * content preservation, line-budget discipline, and idempotence-adjacent
  * invariants over arbitrary word sequences. */
object PresentationLaws extends Properties("PresentationWrap") {

  private val wordGen: Gen[String] =
    Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, Gen.alphaChar))
      .map(_.mkString)
  private val textGen: Gen[String] =
    Gen.chooseNum(0, 60).flatMap(n => Gen.listOfN(n, wordGen))
      .map(_.mkString(" "))

  property("wrap preserves the word sequence") = Prop.forAll(textGen) { t =>
    val words = t.split("\\s+").filter(_.nonEmpty).toSeq
    Presentation.wrap(t, 80).replace("<br>", " ")
      .split("\\s+").filter(_.nonEmpty).toSeq == words
  }

  property("every line fits the budget when no word exceeds it") =
    Prop.forAll(textGen) { t =>
      // words are <= 12 chars here, far under the 20-char budget
      Presentation.wrap(t, 20).split("<br>", -1).forall(_.length <= 20)
    }

  property("a line never ends with room for the next word") =
    Prop.forAll(textGen) { t =>
      // greedy: if line L is followed by word w, then |L| + |w| + 2 > budget
      // (the +2 is the reference's trailing-space accounting: the line
      // carries |L|+1 internally, appending w needs |w|+1 more)
      val lines = Presentation.wrap(t, 20).split("<br>", -1)
      lines.zip(lines.drop(1)).forall { case (line, next) =>
        val firstNext = next.split(" ", 2).head
        line.isEmpty || firstNext.isEmpty ||
          line.length + 1 + firstNext.length + 1 > 20
      }
    }

  property("single short word is returned unchanged") =
    Prop.forAll(wordGen) { w => Presentation.wrap(w, 80) == w }
}
