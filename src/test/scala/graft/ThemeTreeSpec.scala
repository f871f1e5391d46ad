package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{ThemeNode, ThemeTree}

class ThemeTreeSpec extends AnyFunSuite {

  test("flatten emits every node once with correct parents and depth") {
    val flat = ThemeTree.flatten(ThemeTree.fixture)
    assert(flat.map(_.node_id).sorted == Seq(1, 2, 3, 4, 5, 6, 7))
    assert(flat.find(_.node_id == 1).get.parent_id == -1)
    assert(flat.find(_.node_id == 4).get.parent_id == 2)
    assert(flat.find(_.node_id == 4).get.depth == 2)
    assert(flat.count(_.is_leaf) == 4)
  }

  test("leaves and label→parent map match the reference semantics") {
    assert(ThemeTree.leaves(ThemeTree.fixture).map(_.label).sorted ==
      Seq("A", "N", "P", "U"))
    val l2p = ThemeTree.labelToParent(ThemeTree.fixture)
    assert(l2p("P") == "adoption" && l2p("N") == "risk")
    assert(l2p("adoption") == "root")
  }

  test("labelSummaries stringifies leaf label: summary") {
    val ls = ThemeTree.labelSummaries(ThemeTree.fixture)
    assert(ls.contains("P: providers of the technology"))
    assert(ls.size == 4)
  }

  test("single-node tree flattens to itself as leaf") {
    val one = ThemeNode(9, "only", "just one")
    val flat = ThemeTree.flatten(one)
    assert(flat == Seq(ThemeTree.FlatNode(9, -1, "only", "just one", true, 0)))
    assert(ThemeTree.leaves(one).map(_.node) == Seq(9))
  }

  test("JSON round-trip: toJson → parseThemeTree is the identity") {
    val kws = Seq("efficiency", "spark")
    val json = ThemeTree.toJson(ThemeTree.fixture, kws)
    val Right((tree, keywords)) = ThemeTree.parseThemeTree(json)
    assert(tree == ThemeTree.fixture)
    assert(keywords == kws)
    // flatten/leaves survive the round-trip identically
    assert(ThemeTree.flatten(tree) == ThemeTree.flatten(ThemeTree.fixture))
    assert(ThemeTree.leaves(tree).map(_.label) ==
      ThemeTree.leaves(ThemeTree.fixture).map(_.label))
  }

  test("parse scrubs markdown fences and language tag like the reference") {
    val fenced = "```json\n" + ThemeTree.toJson(ThemeTree.fixture) + "\n```"
    val Right((tree, _)) = ThemeTree.parseThemeTree(fenced)
    assert(tree == ThemeTree.fixture)
    // stray ⟩ characters are dropped too (labels.py:144)
    val noisy = "```json\n" + ThemeTree.toJson(ThemeTree.fixture) + "⟩\n```"
    assert(ThemeTree.parseThemeTree(noisy).map(_._1) == Right(ThemeTree.fixture))
  }

  test("interior backtick runs in a Summary survive the fence scrub") {
    // only WRAPPING fences are stripped — a global replace("```", "")
    // would silently corrupt this Summary's content
    val tricky =
      """```json
        |{"Node": 1, "Label": "root", "Summary": "wrap code in ``` fences",
        | "Children": []}
        |```""".stripMargin
    val Right((tree, _)) = ThemeTree.parseThemeTree(tricky)
    assert(tree.summary == "wrap code in ``` fences")
  }

  test("integral JSON doubles are accepted as node ids; fractional rejected") {
    assert(ThemeTree.parseThemeTree(
      """{"Node": 1.0, "Label": "root", "Children": []}""")
      .map(_._1.node) == Right(1))
    assert(ThemeTree.parseThemeTree(
      """{"Node": 1.5, "Label": "root", "Children": []}""").isLeft)
  }

  test("parse falls back to the braces substring when prose surrounds the JSON") {
    val wrapped = "Here is the taxonomy you asked for:\n" +
      ThemeTree.toJson(ThemeTree.fixture) + "\nLet me know if you need more."
    val Right((tree, _)) = ThemeTree.parseThemeTree(wrapped)
    assert(tree == ThemeTree.fixture)
  }

  test("parse tolerates missing Children (leaf) and rejects malformed input") {
    val leafOnly = """{"Node": 3, "Label": "solo", "Summary": "s"}"""
    assert(ThemeTree.parseThemeTree(leafOnly) ==
      Right((ThemeNode(3, "solo", "s"), Seq.empty)))
    assert(ThemeTree.parseThemeTree("not json at all").isLeft)
    assert(ThemeTree.parseThemeTree("""{"Label": "no node id"}""").isLeft)
    assert(ThemeTree.parseThemeTree("""{"Node": 1, "Label": "x",
      "Children": "oops"}""").isLeft)
  }
}
