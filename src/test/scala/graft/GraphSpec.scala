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

  test("rank mass sums to 1 on an asymmetric graph with dangling nodes") {
    val r = ranks(
      Seq(("A", "B", 1.0), ("A", "C", 2.0), ("B", "C", 1.0), ("D", "A", 1.0)),
      iters = 4)
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
    assert(r.keySet == Set("A", "B", "C", "D"))
  }
}
