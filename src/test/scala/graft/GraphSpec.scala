package graft

import graft.operators.Graph

/** Closed-form PageRank checks: hand-computable graphs pin the dangling
  * redistribution, the weighted split, and the Σr = 1 stochastic
  * invariant the operator's Scaladoc promises.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(String, String, Double)], iters: Int): Map[String, Double] =
    Graph
      .pageRank(edges.toDF("src", "dst", "w"), "src", "dst", "w", iters)
      .collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .toMap

  test("two-node chain with a dangling sink: hand-computed first iteration") {
    // A→B, B dangling. r0 = (.5, .5); dang = .5
    // r1(A) = .15/2 + .85·(0  + .5/2) = 0.2875
    // r1(B) = .15/2 + .85·(.5 + .5/2) = 0.7125
    val r = ranks(Seq(("A", "B", 1.0)), iters = 1)
    assert(math.abs(r("A") - 0.2875) < 1e-12)
    assert(math.abs(r("B") - 0.7125) < 1e-12)
  }

  test("weighted out-edges split rank proportionally to weight") {
    // A→B w=3, A→C w=1; B and C dangling; N=3, dang0 = 2/3
    // r1(B) = .05 + .85·(1/3·3/4 + (2/3)/3) = 0.4513888…
    // r1(C) = .05 + .85·(1/3·1/4 + (2/3)/3) = 0.3097222…
    val r = ranks(Seq(("A", "B", 3.0), ("A", "C", 1.0)), iters = 1)
    assert(math.abs(r("B") - (0.05 + 0.85 * (0.25 + 2.0 / 9))) < 1e-12)
    assert(math.abs(r("C") - (0.05 + 0.85 * (1.0 / 12 + 2.0 / 9))) < 1e-12)
    assert(r("B") > r("C"))
  }

  test("symmetric cycle stays uniform and total mass stays 1 across iterations") {
    val r = ranks(Seq(("A", "B", 1.0), ("B", "C", 1.0), ("C", "A", 1.0)), iters = 5)
    r.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-12))
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
  }

  test("parallel edges sum into one weighted edge (A→B twice == w=2 once)") {
    val dup  = ranks(Seq(("A", "B", 1.0), ("A", "B", 1.0), ("A", "C", 2.0)), iters = 2)
    val once = ranks(Seq(("A", "B", 2.0), ("A", "C", 2.0)), iters = 2)
    assert(dup == once)
  }

  test("zero/negative/null-weight edges are not edges: A loses its out-edge, stays reachable") {
    // A→B w=0 and A→C w=-1 vanish; D→A keeps A in the graph as a DANGLING
    // node — identical to the graph that never had A's out-edges
    val degenerate = Seq(("A", "B", 0.0), ("A", "C", -1.0), ("D", "A", 1.0))
    val clean      = Seq(("D", "A", 1.0))
    val d = ranks(degenerate, iters = 2)
    val c = ranks(clean, iters = 2)
    assert(d.keySet == Set("A", "D"), "zero-weight targets B and C must leave the graph")
    assert(d == c)
    assert(math.abs(d.values.sum - 1.0) < 1e-9)
  }

  test("rank mass sums to 1 on an asymmetric graph with dangling nodes") {
    val r = ranks(
      Seq(("A", "B", 1.0), ("A", "C", 2.0), ("B", "C", 1.0), ("D", "A", 1.0)),
      iters = 4)
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
    assert(r.keySet == Set("A", "B", "C", "D"))
  }

  private def propagate(
      edges: Seq[(String, String, Double)],
      seeds: Seq[(String, String)],
      iters: Int): Map[String, String] =
    Graph
      .labelPropagate(edges.toDF("src", "dst", "w"), "src", "dst", "w",
        seeds.toDF("node", "lbl"), "node", "lbl", iters)
      .collect()
      .map(r => r.getString(0) -> r.getString(1))
      .toMap

  test("labelPropagate: chain reaches one hop per iteration") {
    val chain = Seq(("A", "B", 1.0), ("B", "C", 1.0), ("C", "D", 1.0))
    assert(propagate(chain, Seq("A" -> "x"), 1) == Map("A" -> "x", "B" -> "x"))
    assert(propagate(chain, Seq("A" -> "x"), 2) ==
      Map("A" -> "x", "B" -> "x", "C" -> "x"))
  }

  test("labelPropagate: weight majority wins, exact ties go to the smallest label") {
    // N hears x with weight 1 and y with weight 2 -> y
    val g = Seq(("X", "N", 1.0), ("Y", "N", 2.0))
    assert(propagate(g, Seq("X" -> "x", "Y" -> "y"), 1)("N") == "y")
    // equal weights -> min label
    val tie = Seq(("X", "N", 1.0), ("Y", "N", 1.0))
    assert(propagate(tie, Seq("X" -> "x", "Y" -> "y"), 1)("N") == "x")
  }

  test("labelPropagate: seeds are clamped and self-loops don't vote") {
    // B is seeded y; its neighborhood overwhelmingly says x; B stays y.
    // B's self-loop (weight 100) must not reinforce y onto B's neighbors
    // beyond the normal edge, nor x onto itself.
    val g = Seq(("A", "B", 10.0), ("B", "B", 100.0), ("B", "C", 1.0))
    val r = propagate(g, Seq("A" -> "x", "B" -> "y"), 2)
    assert(r("B") == "y", "seed must stay clamped")
    assert(r("A") == "x" && r("C") == "y")
  }

  test("labelPropagate: labels persist across rounds; no node is ever un-labeled") {
    // round 1: E takes z from D (D hears nothing back — E is unlabeled
    // when the round starts). Round 2 changes nothing; nobody loses a
    // label, and a disconnected never-reached node (F-G island with no
    // seed) stays absent rather than appearing null-labeled.
    val g = Seq(("D", "E", 1.0), ("F", "G", 1.0))
    val r = propagate(g, Seq("D" -> "z"), 2)
    assert(r == Map("D" -> "z", "E" -> "z"))
  }

  test("sppmi: closed-form PMI, negative-PMI pairs drop, shift subtracts ln k") {
    // D = 12, every node's incidence mass = 6: pmi(A,B) = pmi(C,D) =
    // ln(5·12/36) = ln(5/3) > 0; pmi(A,C) = pmi(B,D) = ln(1/3) < 0.
    // The zero-weight row must not perturb the masses.
    val edges = Seq(
      ("A", "B", 5.0), ("A", "C", 1.0), ("B", "D", 1.0), ("C", "D", 5.0),
      ("A", "D", 0.0)
    ).toDF("a", "b", "w")
    val out = Graph.sppmi(edges, "a", "b", "w")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(out.keySet == Set(("A", "B"), ("C", "D")))
    out.values.foreach(v => assert(math.abs(v - math.log(5.0 / 3.0)) < 1e-12))
    // shift = 2 subtracts ln 2 > ln(5/3): everything drops
    assert(Graph.sppmi(edges, "a", "b", "w", shift = 2.0).isEmpty)
  }

  test("hopsFrom: min distance over multiple seeds, frontier bound, direction-blind") {
    // path A-B-C-D-E with seeds {A, E}: distances collapse from both ends;
    // maxHops=1 keeps only rings 0 and 1. Edges written in mixed directions.
    val edges = Seq(("A", "B"), ("C", "B"), ("C", "D"), ("E", "D"))
      .toDF("src", "dst")
    def hops(seeds: Seq[String], k: Int): Map[String, Long] =
      Graph.hopsFrom(edges, "src", "dst", seeds.toDF("node"), "node", k)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hops(Seq("A", "E"), 2) ==
      Map("A" -> 0L, "E" -> 0L, "B" -> 1L, "D" -> 1L, "C" -> 2L))
    assert(hops(Seq("A", "E"), 1) ==
      Map("A" -> 0L, "E" -> 0L, "B" -> 1L, "D" -> 1L))
    // a seed adjacent to another seed stays at 0, not 1
    assert(hops(Seq("A", "B"), 1)("B") == 0L)
    // disconnected node never appears
    assert(!hops(Seq("A"), 2).contains("E"))
  }

  test("bipartiteProject: co-occurrence counts, dup memberships, minSupport, basket cap") {
    // baskets: k1 {A,B,C}, k2 {A,B}, k3 {A,B} (with a duplicate row), k4 {Z}
    val m = Seq(
      ("k1", "A"), ("k1", "B"), ("k1", "C"),
      ("k2", "A"), ("k2", "B"),
      ("k3", "A"), ("k3", "B"), ("k3", "B"), // dup membership counts once
      ("k4", "Z")                            // singleton basket: no pairs
    ).toDF("k", "i")
    val all = Graph.bipartiteProject(m, "k", "i")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(all == Map(("A", "B") -> 3.0, ("A", "C") -> 1.0, ("B", "C") -> 1.0))
    val sup2 = Graph.bipartiteProject(m, "k", "i", minSupport = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(sup2 == Set(("A", "B")))
    // cap 2 drops the 3-item basket k1 entirely
    val capped = Graph.bipartiteProject(m, "k", "i", maxBasketSize = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(capped == Map(("A", "B") -> 2.0))
  }

  private def triangles(edges: Seq[(String, String)]): Map[String, Long] =
    Graph
      .triangleCounts(edges.toDF("src", "dst"), "src", "dst")
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap

  test("triangleCounts: K4 has 4 triangles, every node in 3; a path has none") {
    val k4 = for {
      a <- Seq("A", "B", "C", "D"); b <- Seq("A", "B", "C", "D") if a < b
    } yield (a, b)
    val t = triangles(k4)
    assert(t == Map("A" -> 3L, "B" -> 3L, "C" -> 3L, "D" -> 3L))
    assert(t.values.sum == 12L) // 3 corners x 4 triangles
    assert(triangles(Seq(("A", "B"), ("B", "C"), ("C", "D"))).isEmpty)
  }

  test("triangleCounts normalizes direction, multiplicity, and self-loops") {
    // same triangle written with reversed edges, a duplicate, and a loop
    val t = triangles(Seq(
      ("A", "B"), ("B", "A"), ("C", "B"), ("A", "C"), ("A", "C"), ("A", "A")))
    assert(t == Map("A" -> 1L, "B" -> 1L, "C" -> 1L))
  }

  test("triangleCounts: hub-and-spoke plus one rim edge yields exactly that triangle") {
    // hub H connects to 5 spokes; only rim edge S1-S2 closes a triangle —
    // degree orientation must count it once despite H's skewed degree
    val spokes = (1 to 5).map(i => ("H", s"S$i"))
    val t = triangles(spokes :+ ("S1", "S2"))
    assert(t == Map("H" -> 1L, "S1" -> 1L, "S2" -> 1L))
  }
}
