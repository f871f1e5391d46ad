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
}
