package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.Graph

/** Differential checks of the whole graph family against plain-Scala
  * reference implementations on random graphs — hand-computed cases
  * (GraphSpec) pin the documented semantics; these sample the input
  * space for formulation bugs the fixtures never contain (degree ties,
  * parallel+reversed edges, self-loops, multi-component graphs,
  * seed-dense and seed-free regions).
  */
class GraphPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g(Gen.Parameters.default, Seed(seed)).get

  private val nodeGen: Gen[String] = Gen.choose(0, 11).map(i => s"n$i")
  private val edgesGen: Gen[List[(String, String, Double)]] = for {
    m <- Gen.choose(0, 40)
    es <- Gen.listOfN(m, for {
      a <- nodeGen; b <- nodeGen
      w <- Gen.oneOf(1.0, 2.0, 3.0, 0.0, -1.0) // includes non-edges
    } yield (a, b, w))
  } yield es

  // ---- reference implementations (driver-side, straight from the docs) --

  private def refPageRank(
      edges: Seq[(String, String, Double)], iters: Int, d: Double = 0.85): Map[String, Double] = {
    val agg = edges
      .filter { case (a, b, w) => w != 0 } // mirror the sum-then->0 filter below
      .groupBy(e => (e._1, e._2)).view.mapValues(_.map(_._3).sum)
      .filter(_._2 > 0.0).toMap
    val nodes = agg.keys.flatMap(k => Seq(k._1, k._2)).toSet
    if (nodes.isEmpty) return Map.empty
    val n = nodes.size.toDouble
    val outW = agg.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      // toSeq first: mapping a Set collapses EQUAL ranks (two dangling
      // nodes at 1/N summed as one) — the bug this spec's first run had
      val dang = nodes.toSeq.filterNot(outW.contains).map(r).sum
      val contrib = agg.toSeq
        .map { case ((u, v), w) => v -> (r(u) * w / outW(u)) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      r = nodes.map(v =>
        v -> ((1 - d) / n + d * (contrib.getOrElse(v, 0.0) + dang / n))).toMap
    }
    r
  }

  private def refTriangles(edges: Seq[(String, String)]): Map[String, Int] = {
    val und = edges.collect { case (a, b) if a != b =>
      (Seq(a, b).min, Seq(a, b).max)
    }.toSet
    val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val tris = for {
      (a, i) <- nodes.zipWithIndex
      (b, j) <- nodes.zipWithIndex.drop(i + 1) if und((a, b))
      c <- nodes.drop(j + 1) if und((b, c)) && und((a, c))
    } yield Seq(a, b, c)
    tris.flatten.groupBy(identity).view.mapValues(_.size).toMap
  }

  private def refLabelProp(
      edges: Seq[(String, String, Double)],
      seeds: Map[String, String], iters: Int): Map[String, String] = {
    val canon = edges
      .filter { case (a, b, _) => a != b }
      .groupBy(e => (Seq(e._1, e._2).min, Seq(e._1, e._2).max))
      .view.mapValues(_.map(_._3).sum).filter(_._2 > 0.0).toMap
    val undirected = canon.toSeq.flatMap { case ((a, b), w) => Seq((a, b, w), (b, a, w)) }
    var labels = seeds
    for (_ <- 1 to iters) {
      val mass = undirected
        .flatMap { case (u, v, w) => labels.get(u).map(l => (v, l) -> w) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val cand = mass.toSeq
        .groupBy(_._1._1)
        .view.mapValues(_.map { case ((_, l), m) => (-m, l) }.min._2).toMap
      val nodes = labels.keySet ++ cand.keySet
      labels = nodes.map(v =>
        v -> seeds.getOrElse(v, cand.getOrElse(v, labels(v)))).toMap
    }
    labels
  }

  private def refHops(
      edges: Seq[(String, String)], seeds: Set[String], maxHops: Int): Map[String, Long] = {
    val adj = edges.collect { case (a, b) if a != b => Seq((a, b), (b, a)) }
      .flatten.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    var dist = seeds.map(_ -> 0L).toMap
    var frontier = seeds
    for (k <- 1 to maxHops) {
      val next = frontier.flatMap(n => adj.getOrElse(n, Set.empty)) -- dist.keySet
      dist ++= next.map(_ -> k.toLong)
      frontier = next
    }
    dist
  }

  test("pageRank matches the reference recurrence on random graphs") {
    for (seed <- 1L to 8L) {
      val es = sample(edgesGen, seed)
      val got = Graph
        .pageRank(es.toDF("src", "dst", "w"), "src", "dst", "w", iterations = 3)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val want = refPageRank(es, iters = 3)
      assert(got.keySet == want.keySet, s"seed=$seed node sets differ")
      got.foreach { case (n, v) =>
        assert(math.abs(v - want(n)) < 1e-9, s"seed=$seed node=$n got=$v want=${want(n)}")
      }
    }
  }

  test("triangleCounts matches brute-force enumeration on random graphs") {
    for (seed <- 1L to 8L) {
      val es = sample(edgesGen, seed).map(e => (e._1, e._2))
      val got = Graph
        .triangleCounts(es.toDF("src", "dst"), "src", "dst")
        .collect().map(r => r.getString(0) -> r.getLong(1).toInt).toMap
      assert(got == refTriangles(es), s"seed=$seed")
    }
  }

  test("labelPropagate matches the reference rounds on random graphs") {
    for (seed <- 1L to 8L) {
      val es = sample(edgesGen, seed)
      // seed every third node that appears, alternating two labels
      val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val seeds = nodes.zipWithIndex.collect {
        case (n, i) if i % 3 == 0 => n -> (if (i % 2 == 0) "x" else "y")
      }.toMap
      if (seeds.nonEmpty) {
        val got = Graph
          .labelPropagate(es.toDF("src", "dst", "w"), "src", "dst", "w",
            seeds.toSeq.toDF("node", "lbl"), "node", "lbl", iterations = 2)
          .collect().map(r => r.getString(0) -> r.getString(1)).toMap
        assert(got == refLabelProp(es, seeds, 2), s"seed=$seed seeds=$seeds")
      }
    }
  }

  private def refPpr(
      edges: Seq[(String, String, Double)], seeds: Set[String],
      iters: Int, d: Double = 0.85): Map[String, Double] = {
    val agg = edges
      .filter { case (_, _, w) => w != 0 }
      .groupBy(e => (e._1, e._2)).view.mapValues(_.map(_._3).sum)
      .filter(_._2 > 0.0).toMap
    val nodes = agg.keys.flatMap(k => Seq(k._1, k._2)).toSet
    val s = seeds.intersect(nodes)
    if (nodes.isEmpty || s.isEmpty) return Map.empty
    val p = nodes.map(v => v -> (if (s(v)) 1.0 / s.size else 0.0)).toMap
    val outW = agg.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    var r = p
    for (_ <- 1 to iters) {
      val dang = nodes.toSeq.filterNot(outW.contains).map(r).sum
      val contrib = agg.toSeq
        .map { case ((u, v), w) => v -> (r(u) * w / outW(u)) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      r = nodes.map(v =>
        v -> ((1 - d) * p(v) + d * (contrib.getOrElse(v, 0.0) + dang * p(v)))).toMap
    }
    r
  }

  test("labelPropagateFrontier is bit-identical to the synchronous reference on random graphs") {
    // the delta-propagation form must return EXACTLY the synchronous
    // result at every iteration depth — including depths past convergence
    // (where its early exit engages)
    for (seed <- 1L to 8L; iters <- Seq(1, 2, 5)) {
      val es = sample(edgesGen, seed)
      val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val seeds = nodes.zipWithIndex.collect {
        case (n, i) if i % 3 == 0 => n -> (if (i % 2 == 0) "x" else "y")
      }.toMap
      if (seeds.nonEmpty) {
        val sync = Graph
          .labelPropagate(es.toDF("src", "dst", "w"), "src", "dst", "w",
            seeds.toSeq.toDF("node", "lbl"), "node", "lbl", iterations = iters)
          .collect().map(r => r.getString(0) -> r.getString(1)).toMap
        val frontier = Graph
          .labelPropagateFrontier(es.toDF("src", "dst", "w"), "src", "dst", "w",
            seeds.toSeq.toDF("node", "lbl"), "node", "lbl", iterations = iters)
          .collect().map(r => r.getString(0) -> r.getString(1)).toMap
        assert(frontier == sync, s"seed=$seed iters=$iters")
        // the hybrid dispatch cannot change results in ANY regime: pin the
        // forced-dense (denseFraction 0 → every round synchronous) and
        // forced-sparse (2.0 → every round delta) extremes too; the default
        // 0.1 above crosses the boundary mid-run at iters=5 (seeds are a
        // third of the nodes, the frontier decays below 10% as labels settle)
        for (df <- Seq(0.0, 2.0)) {
          val forced = Graph
            .labelPropagateFrontier(es.toDF("src", "dst", "w"), "src", "dst", "w",
              seeds.toSeq.toDF("node", "lbl"), "node", "lbl", iterations = iters,
              denseFraction = df)
            .collect().map(r => r.getString(0) -> r.getString(1)).toMap
          assert(forced == sync, s"seed=$seed iters=$iters denseFraction=$df")
        }
      }
    }
  }

  test("pageRankConverged: early stop equals the fixed-iteration form; deltas shrink to tol") {
    for (seed <- 1L to 4L) {
      val es = sample(edgesGen, seed)
      if (es.exists(_._3 > 0)) {
        val (converged, deltas) = Graph.pageRankConverged(
          es.toDF("src", "dst", "w"), "src", "dst", "w",
          maxIterations = 50, tol = 1e-12)
        // the run stopped exactly when the delta crossed tol: every prior
        // delta is above it, the last at-or-below (or maxIterations hit)
        assert(deltas.nonEmpty)
        assert(deltas.init.forall(_ > 1e-12), s"seed=$seed deltas=$deltas")
        if (deltas.size < 50) assert(deltas.last <= 1e-12)
        // equality with the fixed form at the SAME number of rounds — the
        // shared prStep makes this bit-exact, not approximate
        val fixed = Graph
          .pageRank(es.toDF("src", "dst", "w"), "src", "dst", "w",
            iterations = deltas.size)
          .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
        val got = converged.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
        assert(got == fixed, s"seed=$seed rounds=${deltas.size}")
        // rank mass stays a distribution at the stopping point
        assert(math.abs(got.values.sum - 1.0) < 1e-9)
      }
    }
  }

  test("pageRankPersonalized matches the seed-teleport recurrence on random graphs") {
    for (seed <- 1L to 8L) {
      val es = sample(edgesGen, seed)
      val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val seedSet = nodes.take(3).toSet
      val want = refPpr(es, seedSet, iters = 3)
      if (want.nonEmpty) {
        val got = Graph
          .pageRankPersonalized(es.toDF("src", "dst", "w"), "src", "dst", "w",
            seedSet.toSeq.toDF("node"), "node", iterations = 3)
          .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
        assert(got.keySet == want.keySet, s"seed=$seed")
        got.foreach { case (n, v) =>
          assert(math.abs(v - want(n)) < 1e-9, s"seed=$seed node=$n got=$v want=${want(n)}")
        }
        // teleport-restricted mass is still a distribution
        assert(math.abs(got.values.sum - 1.0) < 1e-9, s"seed=$seed sum=${got.values.sum}")
      }
    }
  }

  test("pageRankPersonalized: seeds absent from the graph fail loudly, not silently zero") {
    val es = Seq(("a", "b", 1.0), ("b", "a", 1.0)).toDF("src", "dst", "w")
    val e = intercept[IllegalArgumentException](
      Graph.pageRankPersonalized(es, "src", "dst", "w",
        Seq("ghost1", "ghost2").toDF("node"), "node", iterations = 2).collect())
    assert(e.getMessage.contains("no seed node"), e.getMessage)
  }

  test("hopsFrom matches reference BFS on random graphs") {
    for (seed <- 1L to 8L) {
      val es = sample(edgesGen, seed).map(e => (e._1, e._2))
      val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val seeds = nodes.take(2).toSet
      if (seeds.nonEmpty) {
        val got = Graph
          .hopsFrom(es.toDF("src", "dst"), "src", "dst",
            seeds.toSeq.toDF("node"), "node", maxHops = 3)
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(got == refHops(es, seeds, 3), s"seed=$seed seeds=$seeds")
      }
    }
  }
}
