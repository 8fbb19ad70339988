package graft

import org.apache.spark.sql.functions._

/** The mergeable distinct-count sketch table (e15_hll_union): DataSketches
  * HLL via Spark's built-in hll_sketch_agg / hll_union_agg. What makes a
  * sketch TABLE legal to persist and query incrementally is the merge rule:
  * a union of per-partition sketches estimates the same population as one
  * whole-range sketch. NOTE the honest contract: DataSketches HLL unions go
  * through an HLL_8 gadget and sparse→dense promotion depends on insertion
  * split, so estimates across DIFFERENT merge structures agree only within
  * the sketch's error bounds, not bit-for-bit — asserting equality would be
  * asserting something HLL does not promise (and empirically does not hold).
  */
class HllSketchSpec extends SparkSpec {
  import spark.implicits._

  private def users = spark.range(0L, 5000L)
    .select(
      (col("id") % 365).cast("int").as("day"),
      // ~1200 distinct users, skewed across days
      (col("id") * 2654435761L % 1201L).as("user_id"))

  private def relDiff(a: Long, b: Long): Double =
    math.abs(a - b).toDouble / math.max(a, b)

  test("union of daily sketches estimates the whole-range population (within error bounds)") {
    val d = users.cache()
    try {
      val merged = d.groupBy("day").agg(hll_sketch_agg(col("user_id")).as("sk"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
        .as[Long].head()
      val whole = d.agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
        .as[Long].head()
      assert(relDiff(merged, whole) < 0.02,
        s"daily-union estimate $merged too far from whole-range estimate $whole")
    } finally { d.unpersist(); () }
  }

  test("estimate within 5% of exact distinct") {
    val est = users.agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))))
      .as[Long].head()
    val exact = users.select("user_id").distinct().count()
    assert(math.abs(est - exact).toDouble / exact < 0.05,
      s"HLL estimate $est vs exact $exact")
  }

  test("estimates across partitionings agree within error bounds") {
    val a = users.repartition(2).agg(hll_sketch_estimate(hll_sketch_agg(col("user_id")))).as[Long].head()
    val b = users.repartition(13).agg(hll_sketch_estimate(hll_sketch_agg(col("user_id")))).as[Long].head()
    assert(relDiff(a, b) < 0.02, s"estimates too far apart across partitionings: $a vs $b")
  }
}
