package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.QuantileSketch

/** The mergeable GK quantile sketch (e16_quantile_sketch). The contract a
  * persisted sketch table rests on: a query at quantile q returns a value
  * whose TRUE rank is within relativeError·n of q·n, and merging per-group
  * sketches preserves that bound (mergeable summaries) — estimates may move
  * inside the bound across merge structures, never outside it.
  */
class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  private val n = 100000L
  private val eps = 0.01

  // deterministic skewed values: hash-scattered, squared to stretch the tail
  private def values = spark.range(n).select(
    (col("id") % 37).as("grp"),
    pow(pmod(xxhash64(col("id")), lit(10000L)).cast("double") / 100.0, 2.0).as("v"))

  private def rankOf(v: Double): Long =
    values.where(col("v") <= v).count()

  test("query rank error is within the declared bound") {
    val sk = values.agg(QuantileSketch.sketchAgg(col("v"), eps).as("sk"))
    for (q <- Seq(0.1, 0.5, 0.9, 0.99)) {
      val est = sk.select(QuantileSketch.query(col("sk"), q)).as[Double].head()
      val rank = rankOf(est)
      assert(math.abs(rank - q * n) <= 2 * eps * n + 1,
        s"q=$q estimate $est has rank $rank, target ${q * n} (n=$n, eps=$eps)")
    }
  }

  test("merging per-group sketches preserves the rank bound") {
    val daily = values.groupBy("grp").agg(QuantileSketch.sketchAgg(col("v"), eps).as("sk"))
    val merged = daily.agg(QuantileSketch.mergeAgg(col("sk")).as("sk"))
    for (q <- Seq(0.5, 0.99)) {
      val est = merged.select(QuantileSketch.query(col("sk"), q)).as[Double].head()
      val rank = rankOf(est)
      // merge adds operand errors conservatively: allow 2x the single-sketch slack
      assert(math.abs(rank - q * n) <= 4 * eps * n + 1,
        s"merged q=$q estimate $est has rank $rank, target ${q * n}")
    }
  }

  test("merge fan-in budgets epsilon: D-way merges need ~D× finer per-partition sketches") {
    // 40 small partitions, tail quantile: per-partition ε budgeted for the
    // fan-in must keep the post-merge p99 inside the TARGET bound of 0.01·n
    // (the e16 sketch-table rule; an unbudgeted coarse ε measurably blows
    // the tail — p99 snapped to the max in the sf0.01 fixture)
    val parts = values.groupBy((col("grp") % 40).as("part"))
      .agg(QuantileSketch.sketchAgg(col("v"), 0.0005).as("sk"))
    val est = parts.agg(QuantileSketch.mergeAgg(col("sk")).as("sk"))
      .select(QuantileSketch.query(col("sk"), 0.99)).as[Double].head()
    val rank = rankOf(est)
    assert(math.abs(rank - 0.99 * n) <= 0.01 * n + 1,
      s"budgeted 40-way merge p99 estimate $est has rank $rank, target ${0.99 * n}")
  }

  test("budgetFor derives the per-partition epsilon from the merge fan-in") {
    assert(QuantileSketch.budgetFor(targetError = 0.03, fanIn = 30) === 0.001)
    assert(QuantileSketch.budgetFor(targetError = 0.01, fanIn = 1) === 0.01)
    intercept[IllegalArgumentException](QuantileSketch.budgetFor(0.0, 30))
    intercept[IllegalArgumentException](QuantileSketch.budgetFor(0.01, 0))
  }

  test("unbudgeted merge degenerates p99 to the max; budgetFor-derived epsilon holds the bound") {
    // the e16 trap made concrete: a 30-day sketch table read as one 30-way
    // merge. Writing each day at the READ-TIME target ε (unbudgeted) lets
    // the merged tail estimate drift outside the target bound; writing at
    // budgetFor(target, fanIn) holds it. Same data, same query — only the
    // write-time ε differs.
    // The trap's concrete failure mode (measured, both on IID and on
    // disjoint per-day value ranges): writing each day's sketch at the
    // READ-TIME target ε leaves the merged summary too coarse at the tail,
    // and the p99 query DEGENERATES TO THE LITERAL MAXIMUM — a useless
    // answer whose rank error (ε·n) just grazes the bound. Budgeting the
    // write ε for the fan-in returns a real interior tail value within the
    // target bound. (Empirically Spark's GK merge holds ~ε·n error — far
    // better than the additive worst case — so budgetFor's D× rule buys
    // honest headroom, demonstrated here at its observable break point.)
    val target = 0.01
    val fanIn = 30
    val exactMax = values.agg(max(col("v"))).as[Double].head()
    val byDay = values.groupBy((col("grp") % fanIn).as("day"))
    def mergedP99(writeEps: Double): Double =
      byDay.agg(QuantileSketch.sketchAgg(col("v"), writeEps).as("sk"))
        .agg(QuantileSketch.mergeAgg(col("sk")).as("sk"))
        .select(QuantileSketch.query(col("sk"), 0.99)).as[Double].head()
    val unbudgeted = mergedP99(target)
    val budgeted = mergedP99(QuantileSketch.budgetFor(target, fanIn))
    assert(unbudgeted == exactMax,
      s"unbudgeted merge p99 ($unbudgeted) no longer degenerates to the max " +
        s"($exactMax) — if GK merge got tighter, budgetFor may be over-conservative")
    assert(budgeted < exactMax, "budgeted merge p99 must be an interior value, not the max")
    val rank = rankOf(budgeted)
    assert(math.abs(rank - 0.99 * n) <= target * n + 1,
      s"budgeted merge p99 rank $rank must sit within ${target * n} of ${0.99 * n}")
  }

  test("decimal input aggregates without a runtime MatchError") {
    val est = values.select(col("v").cast("decimal(12,4)").as("v"))
      .agg(QuantileSketch.sketchAgg(col("v"), eps).as("sk"))
      .select(QuantileSketch.query(col("sk"), 0.5)).as[Double].head()
    val rank = rankOf(est)
    assert(math.abs(rank - 0.5 * n) <= 2 * eps * n + 1,
      s"decimal-fed sketch p50 estimate $est has rank $rank")
  }

  test("sketch round-trips through its binary form (persistable column)") {
    val skBytes = values.limit(1000)
      .agg(QuantileSketch.sketchAgg(col("v"), eps).as("sk"))
      .select("sk").as[Array[Byte]].head()
    // re-aggregate the serialized sketch through the merge path and query it
    val est = Seq(skBytes).toDF("sk")
      .agg(QuantileSketch.mergeAgg(col("sk")).as("m"))
      .select(QuantileSketch.query(col("m"), 0.5)).as[Double].head()
    assert(est > 0.0, "round-tripped sketch must answer queries")
  }

  test("empty input yields a null query answer, not a crash") {
    val out = values.where(lit(false))
      .agg(QuantileSketch.sketchAgg(col("v"), eps).as("sk"))
      .select(QuantileSketch.query(col("sk"), 0.5)).as[Option[Double]].head()
    assert(out.isEmpty)
  }
}
