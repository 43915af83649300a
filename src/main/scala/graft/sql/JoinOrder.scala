package graft.sql

/** Cost-based join-order enumeration — the Spark-side mirror of the
  * reference's DPccp optimizer (reference optimizer/optimizer.rs:60-104
  * enumerates csg/cmp pairs over the join graph; planner/bottomup.rs:111-168
  * feeds it sample-based cardinalities).
  *
  * Catalyst, when handed an explicit join tree and no CBO statistics, keeps
  * the order it is given — so graft enumerates the order itself from its own
  * statistics (sample-estimated selection cardinalities + HLL/sample NDVs,
  * StatsManager) and emits the chosen tree; Catalyst still owns predicate
  * pushdown, column pruning and physical operator selection.
  *
  * Algorithm: exact dynamic programming over CONNECTED subsets of the join
  * graph — the same search space DPccp covers (csg/cmp pairs), enumerated
  * by subset rather than by pair: identical optimum, simpler bookkeeping,
  * fine for the ≤ MaxDpTables FROM-lists a SQL front-end sees. Like DPccp,
  * cross joins are never enumerated inside a connected component;
  * disconnected components are planned independently and cross-joined
  * smallest-first at the end. Cost = Σ intermediate result cardinalities
  * (C_out), the reference's cost function.
  */
object JoinOrder {

  /** Equi-join edge between table indices `a` and `b` with selectivity
    * `sel` (1 / max NDV of the two join columns).
    */
  final case class Edge(a: Int, b: Int, sel: Double)

  sealed trait Tree { def mask: Long }
  final case class Leaf(idx: Int) extends Tree { def mask: Long = 1L << idx }
  final case class Node(l: Tree, r: Tree, mask: Long) extends Tree

  /** FROM-lists beyond this fall back to textual order (2^n DP table). */
  val MaxDpTables = 12

  /** Choose a join tree for `n` tables. `baseCard(i)` is the estimated
    * post-selection cardinality of table i. Returns None when n < 2 or
    * n > MaxDpTables (caller keeps the textual order).
    */
  def plan(n: Int, baseCard: Int => Double, edges: Seq[Edge]): Option[Tree] = {
    if (n < 2 || n > MaxDpTables) return None
    val full = (1L << n) - 1

    // adjacency bitmask per table
    val adj = new Array[Long](n)
    edges.foreach { e =>
      if (e.a != e.b) { adj(e.a) |= 1L << e.b; adj(e.b) |= 1L << e.a }
    }

    def connected(mask: Long): Boolean = {
      if (mask == 0) return false
      val start = java.lang.Long.numberOfTrailingZeros(mask)
      var reach = 1L << start
      var grew = true
      while (grew) {
        grew = false
        var i = 0
        while (i < n) {
          if ((reach & (1L << i)) != 0) {
            val add = adj(i) & mask & ~reach
            if (add != 0) { reach |= add; grew = true }
          }
          i += 1
        }
      }
      reach == mask
    }

    // subset cardinality: Π base × Π sel over internal edges —
    // order-independent, computed once per subset
    val card = new Array[Double]((1 << n))
    var m = 1L
    while (m <= full) {
      var c = 1.0
      var i = 0
      while (i < n) { if ((m & (1L << i)) != 0) c *= math.max(baseCard(i), 1.0); i += 1 }
      edges.foreach { e =>
        if ((m & (1L << e.a)) != 0 && (m & (1L << e.b)) != 0) c *= e.sel
      }
      card(m.toInt) = math.max(c, 1.0)
      m += 1
    }

    val cost = new Array[Double]((1 << n))
    val best = new Array[Tree](1 << n)
    java.util.Arrays.fill(cost, Double.PositiveInfinity)
    var i = 0
    while (i < n) { cost(1 << i) = 0.0; best(1 << i) = Leaf(i); i += 1 }

    // connected subsets in increasing popcount; only connected×connected
    // splits are enumerated (DPccp's csg/cmp condition)
    val byCount = (1L to full).filter(connected).sortBy(java.lang.Long.bitCount)
    byCount.foreach { s =>
      if (java.lang.Long.bitCount(s) >= 2) {
        val si = s.toInt
        var s1 = (s - 1) & s
        while (s1 > 0) {
          val s2 = s & ~s1
          if (s2 != 0 && best(s1.toInt) != null && best(s2.toInt) != null) {
            val c = cost(s1.toInt) + cost(s2.toInt) + card(si)
            if (c < cost(si)) {
              cost(si) = c
              // larger side left: nudges the shuffle-join build side small
              val (l, r) =
                if (card(s1.toInt) >= card(s2.toInt)) (best(s1.toInt), best(s2.toInt))
                else (best(s2.toInt), best(s1.toInt))
              best(si) = Node(l, r, s)
            }
          }
          s1 = (s1 - 1) & s
        }
      }
    }

    if (best(full.toInt) != null) return Option(best(full.toInt))

    // disconnected join graph: plan each connected component, then
    // cross-join the component plans smallest-cardinality-first (keeps
    // intermediates minimal; the same fallback the reference needs for
    // predicate-less comma lists)
    var remaining = full
    val comps = scala.collection.mutable.ArrayBuffer.empty[Long]
    while (remaining != 0) {
      val seed = java.lang.Long.numberOfTrailingZeros(remaining)
      var compMask = 1L << seed
      var grew = true
      while (grew) {
        grew = false
        var j = 0
        while (j < n) {
          if ((compMask & (1L << j)) != 0) {
            val add = adj(j) & remaining & ~compMask
            if (add != 0) { compMask |= add; grew = true }
          }
          j += 1
        }
      }
      comps += compMask
      remaining &= ~compMask
    }
    val planned = comps.map(cm => best(cm.toInt)).toSeq
    if (planned.exists(_ == null)) return None
    val ordered = planned.sortBy(t => card(t.mask.toInt))
    Some(ordered.reduceLeft((a, b) => Node(a, b, a.mask | b.mask)))
  }

  /** Flatten a tree to the left-to-right leaf order (for tests/logging). */
  def leafOrder(t: Tree): Seq[Int] = t match {
    case Leaf(i)       => Seq(i)
    case Node(l, r, _) => leafOrder(l) ++ leafOrder(r)
  }
}
