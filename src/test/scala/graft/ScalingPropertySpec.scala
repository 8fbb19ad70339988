package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.Scaling

/** Differential checks of [[Scaling.targetEncode]] and [[Scaling.ewma]]
  * against plain-Scala references on random inputs — null targets, null
  * categories, singleton groups, null values, and ties all occur with
  * high probability at these sizes.
  */
class ScalingPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g(Gen.Parameters.default, Seed(seed)).get

  private val rowsGen: Gen[List[(Long, Option[String], Option[Double])]] = for {
    n <- Gen.choose(1, 40)
    rows <- Gen.listOfN(n, for {
      cat <- Gen.option(Gen.oneOf("a", "b", "c"))
      t <- Gen.option(Gen.oneOf(0.0, 1.5, -2.0, 10.0, 10.0))
    } yield (cat, t))
  } yield rows.zipWithIndex.map { case ((c, t), i) => (i.toLong, c, t) }

  private def refEncode(
      rows: Seq[(Long, Option[String], Option[Double])], m: Double): Map[Long, Option[Double]] = {
    val withT = rows.filter(_._3.isDefined)
    if (withT.isEmpty) return rows.map(r => r._1 -> None).toMap
    val prior = withT.map(_._3.get).sum / withT.size
    val stats = withT.groupBy(_._2).map { case (c, rs) =>
      c -> (rs.map(_._3.get).sum, rs.size)
    }
    rows.map { case (id, c, t) =>
      val (ts, tn) = stats.getOrElse(c, (0.0, 0))
      id -> Some(t match {
        case Some(v) => (ts - v + m * prior) / (tn - 1 + m)
        case None    => (ts + m * prior) / (tn + m)
      })
    }.toMap
  }

  test("targetEncode matches the reference on random rows") {
    for (seed <- 1L to 6L) {
      val rows = sample(rowsGen, seed)
      val got = Scaling
        .targetEncode(rows.toDF("id", "cat", "t"), Seq("cat"), "t", "te", 10.0)
        .collect()
        .map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Double]))
        .toMap
      val want = refEncode(rows, 10.0)
      assert(got.keySet == want.keySet, s"seed=$seed")
      got.foreach { case (id, v) =>
        (v, want(id)) match {
          case (Some(a), Some(b)) =>
            assert(math.abs(a - b) < 1e-9, s"seed=$seed id=$id got=$a want=$b")
          case (a, b) => assert(a == b, s"seed=$seed id=$id got=$a want=$b")
        }
      }
    }
  }

  private val seriesGen: Gen[List[(Long, String, Option[Double])]] = for {
    n <- Gen.choose(1, 30)
    rows <- Gen.listOfN(n, for {
      u <- Gen.oneOf("u", "v")
      x <- Gen.option(Gen.oneOf(1.0, 2.0, 5.0, -3.0))
    } yield (u, x))
  } yield rows.zipWithIndex.map { case ((u, x), i) => (i.toLong, u, x) }

  private def refEwma(
      rows: Seq[(Long, String, Option[Double])],
      alpha: Double, window: Int): Map[Long, Option[Double]] =
    rows.groupBy(_._2).values.flatMap { part =>
      val sorted = part.sortBy(_._1)
      sorted.zipWithIndex.map { case ((id, _, _), i) =>
        val frame = sorted.slice(math.max(0, i - window + 1), i + 1)
        val vals = frame.flatMap(_._3)
        id -> vals.reduceOption((acc, x) => alpha * x + (1 - alpha) * acc)
      }
    }.toMap

  test("ewma matches the reference fold on random series") {
    for (seed <- 1L to 6L) {
      val rows = sample(seriesGen, seed)
      val got = Scaling
        .ewma(rows.toDF("id", "u", "v"), "v", Seq("u"), Seq("id"),
          alpha = 0.25, window = 4)
        .collect()
        .map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Double]))
        .toMap
      val want = refEwma(rows, 0.25, 4)
      assert(got.keySet == want.keySet, s"seed=$seed")
      got.foreach { case (id, v) =>
        (v, want(id)) match {
          case (Some(a), Some(b)) =>
            assert(math.abs(a - b) < 1e-12, s"seed=$seed id=$id got=$a want=$b")
          case (a, b) => assert(a == b, s"seed=$seed id=$id got=$a want=$b")
        }
      }
    }
  }
}
