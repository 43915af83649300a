package graft.sql

import org.scalatest.funsuite.AnyFunSuite

import JoinOrder.{Edge, Leaf, Node, leafOrder, plan}

/** Unit tests for the DP join-order enumeration (DPccp parity with the
  * reference's optimizer, reference optimizer/optimizer.rs:60-104).
  */
class JoinOrderSpec extends AnyFunSuite {

  test("two tables join directly") {
    val t = plan(2, Seq(100.0, 10.0), Seq(Edge(0, 1, 0.01))).get
    assert(leafOrder(t).toSet == Set(0, 1))
  }

  test("chain graph: the cheap end joins first") {
    // 0 —(sel .001)— 1 —(sel .001)— 2 ; table 1 is huge, 0 and 2 small.
    // Best plan must NOT start with the huge middle joined to nothing:
    // (0⋈1) then ⋈2 or (1⋈2) then ⋈0 — both touch 1 once; a cross of
    // 0×2 first would be punished by connectivity preference anyway.
    val t = plan(3, Seq(100.0, 1000000.0, 50.0),
      Seq(Edge(0, 1, 0.001), Edge(1, 2, 0.001))).get
    // every internal node must have a join edge across it (no {0}×{2} cross)
    def connectedSplits(x: JoinOrder.Tree): Boolean = x match {
      case Leaf(_) => true
      case Node(l, r, _) =>
        val (lm, rm) = (leafOrder(l).toSet, leafOrder(r).toSet)
        val edgeAcross =
          (lm.contains(1) && (rm.contains(0) || rm.contains(2))) ||
            (rm.contains(1) && (lm.contains(0) || lm.contains(2)))
        edgeAcross && connectedSplits(l) && connectedSplits(r)
    }
    assert(connectedSplits(t), t)
  }

  test("flipping base cardinalities flips the join order") {
    // star: 0 joined to 1 and to 2; equal selectivities, so the cheaper
    // first join is with the SMALLER dimension
    val edges = Seq(Edge(0, 1, 0.001), Edge(0, 2, 0.001))
    val small1 = plan(3, Seq(10000.0, 10.0, 5000.0), edges).get
    val small2 = plan(3, Seq(10000.0, 5000.0, 10.0), edges).get
    def firstPartner(t: JoinOrder.Tree): Set[Int] = t match {
      case Node(l, r, _) =>
        // the innermost join containing table 0
        def contains0(x: JoinOrder.Tree) = leafOrder(x).contains(0)
        (l, r) match {
          case (n: Node, _) if contains0(n) => firstPartner(n)
          case (_, n: Node) if contains0(n) => firstPartner(n)
          case _ => leafOrder(t).toSet - 0
        }
      case Leaf(_) => Set.empty
    }
    assert(firstPartner(small1) == Set(1), s"expected 0⋈1 first: $small1")
    assert(firstPartner(small2) == Set(2), s"expected 0⋈2 first: $small2")
  }

  test("disconnected graph still plans (cross join allowed)") {
    val t = plan(3, Seq(10.0, 20.0, 30.0), Seq(Edge(0, 1, 0.1))).get
    assert(leafOrder(t).toSet == Set(0, 1, 2))
  }

  test("degenerate and oversized inputs fall back") {
    assert(plan(1, Seq(10.0), Nil).isEmpty)
    assert(plan(JoinOrder.MaxDpTables + 1,
      Seq.fill(JoinOrder.MaxDpTables + 1)(10.0), Nil).isEmpty)
  }

  test("deterministic: same inputs, same tree") {
    val edges = Seq(Edge(0, 1, 0.01), Edge(1, 2, 0.005), Edge(2, 3, 0.02))
    val cards = Seq(1000.0, 200.0, 30000.0, 50.0)
    assert(plan(4, cards, edges) == plan(4, cards, edges))
  }
}
