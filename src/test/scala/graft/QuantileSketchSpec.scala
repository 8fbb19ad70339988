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
