package graft

import graft.operators.Drift

/** Pins the drift-statistic semantics: identical windows → PSI ≈ 0 and
  * KS ≈ 0; a shifted window scores strictly higher; smoothing keeps empty
  * bins finite; shares are a valid distribution per group.
  */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  // reference: 1..100 in two groups; "same" repeats it, "shift" moves mass up
  private def frame(vs: Seq[Double], g: String) = vs.map((g, _)).toDF("g", "v")
  private val base = (1 to 100).map(_.toDouble)

  test("psi: identical distribution scores ~0; a location shift scores higher") {
    val ref = frame(base, "a")
    val same = frame(base, "a")
    val shifted = frame(base.map(_ + 60.0), "a")
    val psiSame = Drift.psi(ref, same, "v", Seq("g"), nBins = 10)
      .collect().head.getDouble(1)
    val psiShift = Drift.psi(ref, shifted, "v", Seq("g"), nBins = 10)
      .collect().head.getDouble(1)
    // identical windows differ only by smoothing noise (counts equal → p == q exactly)
    assert(math.abs(psiSame) < 1e-12, s"psi(same) = $psiSame")
    assert(psiShift > 0.5, s"psi(shifted) = $psiShift should signal drift")
  }

  test("ks: 0 for identical windows, large for disjoint windows, in [0,1]") {
    val ref = frame(base, "a")
    val ksSame = Drift.ksStat(ref, frame(base, "a"), "v", Seq("g"), 10)
      .collect().head.getDouble(1)
    val ksDisjoint = Drift.ksStat(ref, frame(base.map(_ + 1000.0), "a"), "v", Seq("g"), 10)
      .collect().head.getDouble(1)
    assert(math.abs(ksSame) < 1e-12)
    // disjoint mass all lands in the top bin: CDF gap near 1 (minus smoothing)
    assert(ksDisjoint > 0.85 && ksDisjoint <= 1.0, s"ks(disjoint) = $ksDisjoint")
  }

  test("binnedShares: dense grid, shares sum to 1 per side, empty bins stay finite") {
    val ref = frame(base, "a").union(frame(base.map(_ * 2), "b"))
    // current window only ever hits the bottom of the range → most bins empty
    val cur = frame(Seq(1.0, 1.0, 2.0), "a").union(frame(Seq(2.0), "b"))
    val shares = Drift.binnedShares(ref, cur, "v", Seq("g"), nBins = 5).collect()
    assert(shares.length == 10, "2 groups x 5 bins, dense")
    val byGroup = shares.groupBy(_.getString(0))
    for ((g, rows) <- byGroup) {
      val pSum = rows.map(_.getAs[Double]("p")).sum
      val qSum = rows.map(_.getAs[Double]("q")).sum
      assert(math.abs(pSum - 1.0) < 1e-9, s"group $g p sums to $pSum")
      assert(math.abs(qSum - 1.0) < 1e-9, s"group $g q sums to $qSum")
      assert(rows.forall(r => r.getAs[Double]("q") > 0.0), "smoothing keeps empty bins > 0")
    }
  }

  test("tiny value domains keep exact edges: sub-1e-5 span still signals drift") {
    // all values < 1e-5 apart: the 6-dp rounding grid would collapse every
    // edge to the same point (one degenerate bin, PSI ~ 0 forever); the
    // magnitude guard keeps exact interpolated edges for such groups
    val tinyRef = frame((1 to 100).map(_ * 1e-7), "a")
    val tinyShift = frame((1 to 100).map(i => (i + 60) * 1e-7), "a")
    val psiSame = Drift.psi(tinyRef, frame((1 to 100).map(_ * 1e-7), "a"), "v", Seq("g"), 10)
      .collect().head.getDouble(1)
    val psiShift = Drift.psi(tinyRef, tinyShift, "v", Seq("g"), 10)
      .collect().head.getDouble(1)
    assert(math.abs(psiSame) < 1e-12, s"psi(same tiny) = $psiSame")
    assert(psiShift > 0.5, s"psi(shifted tiny) = $psiShift must not silently read ~0")
    // and the shares remain a non-degenerate partition (every bin populated
    // for the uniform reference, not all mass in one bin)
    val shares = Drift.binnedShares(tinyRef, tinyShift, "v", Seq("g"), 10).collect()
    val maxP = shares.map(_.getAs[Double]("p")).max
    assert(maxP < 0.2, s"max ref share $maxP — edges must not collapse to one bin")
  }

  test("psi is per-group: only the drifted group signals") {
    val ref = frame(base, "a").union(frame(base, "b"))
    val cur = frame(base, "a").union(frame(base.map(_ + 60.0), "b"))
    val psi = Drift.psi(ref, cur, "v", Seq("g"), 10)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(psi("a")) < 1e-12)
    assert(psi("b") > 0.5)
  }
}
