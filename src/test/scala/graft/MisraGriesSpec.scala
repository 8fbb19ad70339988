package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.MisraGries

/** Pins the Misra-Gries sketch contract under REAL eviction (vocabulary far
  * larger than the counter budget, skewed frequencies — the regime the
  * fixture corpus can't produce): membership guarantee, lower-bound
  * property, bounded undercount, and stability of all three under Spark's
  * partial/final aggregation across different partitionings.
  */
class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  // skewed stream: item_i has frequency ~ N/(i+1) (Zipf-ish head), plus a
  // long uniform tail — vocab ≈ 1000 over a k=16 sketch
  private def skewed = {
    val head = (0 until 20).flatMap(i => Seq.fill(2000 / (i + 1))(s"hot_$i"))
    val tail = (0 until 980).flatMap(i => Seq.fill(3)(s"cold_$i"))
    (head ++ tail).zipWithIndex
      // deterministic interleave so heavy items are spread through the
      // stream, not clustered (the adversarial case for eviction)
      .sortBy { case (_, idx) => (idx * 2654435761L) % 104729 }
      .map(_._1)
  }

  private def sketch(parts: Int, k: Int): Map[String, Long] =
    skewed.toDF("item").repartition(parts)
      .agg(MisraGries.heavyHitters(col("item"), k).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.item"), col("h.count"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("membership, lower-bound, and bounded-undercount guarantees hold") {
    val data = skewed
    val n = data.size.toLong
    val truth = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val k = 16
    val bound = n / (k + 1)

    for (parts <- Seq(1, 7)) {
      val est = sketch(parts, k)
      assert(est.size <= k, s"sketch exceeded $k counters at parts=$parts")
      // every guaranteed-heavy item is present
      truth.filter(_._2 > bound).keys.foreach { item =>
        assert(est.contains(item), s"heavy item $item missing at parts=$parts")
      }
      // counts are lower bounds, short by at most n/(k+1)
      est.foreach { case (item, c) =>
        val t = truth(item)
        assert(c <= t, s"$item overcounted: est=$c true=$t at parts=$parts")
        assert(t - c <= bound, s"$item undercount ${t - c} > $bound at parts=$parts")
      }
    }
  }

  test("counter budget >= vocabulary makes the sketch exact") {
    val truth = skewed.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val est = sketch(5, 2000) // 2000 counters > ~1000 vocab: no evictions
    assert(est == truth)
  }
}
