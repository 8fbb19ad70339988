package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

/** Pins the bucketized range join: result equals the naive non-equi join at
  * several bucket widths (including widths smaller and larger than every
  * range), each qualifying pair surfaces exactly once, boundaries are
  * inclusive, and negative coordinates bucket correctly.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("equals the naive join at any bucket width; pairs exactly once") {
    val points = Seq(-5.0, 0.0, 0.5, 1.0, 2.5, 7.0, 10.0, 10.0001).toDF("p")
    val ranges = Seq(
      (1L, 0.0, 1.0),    // inclusive both ends
      (2L, 0.5, 2.5),    // overlaps range 1
      (3L, -10.0, -1.0), // negative span
      (4L, 9.0, 10.0),   // 10.0001 just outside
      (5L, 0.0, 0.0)     // degenerate single-point range
    ).toDF("rid", "lo", "hi")
    val want = points.crossJoin(ranges).where($"p" >= $"lo" && $"p" <= $"hi")
      .select("p", "rid").collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq.sorted
    for (w <- Seq(0.3, 1.0, 7.5)) {
      val got = RangeJoin.pointInRange(points, "p", ranges, "lo", "hi", w)
        .select("p", "rid").collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
      assert(got.size == got.distinct.size, s"duplicate pairs at w=$w")
      assert(got.sorted == want, s"mismatch at w=$w")
    }
  }
}
