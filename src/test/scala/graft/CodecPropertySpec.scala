package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.{Bpe, BpeExpressions, VectorCodec}

/** ScalaCheck-generated properties for the round-7 codec surfaces: the
  * vector wire codec and the native BPE expressions must hold their
  * contracts for ANY input, not just the corpus fixture — random float
  * vectors (including specials) round-trip bit-exactly, and random texts
  * over random trained vocabularies encode losslessly to a fixpoint.
  */
class CodecPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g(Gen.Parameters.default, Seed(seed)).get

  private val floatGen: Gen[Float] = Gen.frequency(
    (8, Gen.choose(-1e6f, 1e6f)),
    (1, Gen.oneOf(Float.NaN, Float.PositiveInfinity, Float.NegativeInfinity,
      -0.0f, 0.0f, Float.MinPositiveValue, Float.MaxValue)))

  private val vecGen: Gen[List[(Long, Array[Float])]] =
    Gen.listOfN(30, for {
      id <- Gen.choose(0L, 1000000L)
      n <- Gen.choose(0, 64)
      xs <- Gen.listOfN(n, floatGen)
    } yield (id, xs.toArray))

  test("VectorCodec: pack∘unpack is the identity on raw bits for any vector") {
    for (seed <- 1L to 5L) {
      val rows = sample(vecGen, seed).zipWithIndex
        .map { case ((_, v), i) => (i.toLong, v) }
      val got = rows.toDF("i", "vec")
        .select(col("i"), col("vec"),
          VectorCodec.unpack(VectorCodec.pack(col("vec"))).as("rt"))
        .orderBy("i").collect()
      got.foreach { r =>
        val a = r.getSeq[Float](1); val b = r.getSeq[Float](2)
        assert(a.length == b.length, s"seed $seed length drift")
        a.zip(b).foreach { case (x, y) =>
          assert(java.lang.Float.floatToRawIntBits(x) ==
            java.lang.Float.floatToRawIntBits(y), s"seed $seed bit drift $x vs $y")
        }
      }
    }
  }

  private val wordGen: Gen[String] = for {
    n <- Gen.choose(1, 10)
    cs <- Gen.listOfN(n, Gen.frequency(
      (10, Gen.alphaLowerChar),
      (2, Gen.oneOf('é', 'ß', 'λ', '中')),
      (1, Gen.const('\uD83D')))) // paired below into a surrogate pair
  } yield cs.mkString.replace("\uD83D", "😀")

  private val docGen: Gen[String] = for {
    n <- Gen.choose(0, 12)
    ws <- Gen.listOfN(n, wordGen)
  } yield ws.mkString(" ")

  test("BPE expressions: lossless + fixpoint for any corpus-trained vocabulary and any text") {
    for (seed <- 1L to 5L) {
      val docs = sample(Gen.listOfN(25, docGen), seed).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }
      // train on the generated corpus itself (any vocabulary shape)
      val freqs = docs.flatMap(_._2.split("\\s+")).filter(_.nonEmpty)
        .groupBy(identity).map { case (w, g) => (w, g.size.toLong) }.toSeq
      val merges = Bpe.train(freqs, numMerges = 50)
      val ranks = Bpe.ranksOf(merges)
      val got = docs.toDF("id", "text")
        .select(col("id"), col("text"),
          BpeExpressions.encode(merges)(col("text")).as("toks"),
          BpeExpressions.count(merges)(col("text")).as("n"))
        .orderBy("id").collect()
      got.foreach { r =>
        val words = r.getString(1).trim.split("\\s+").toSeq.filter(_.nonEmpty)
        val toks = r.getSeq[scala.collection.Seq[String]](2).map(_.toSeq)
        // lossless: concatenation reconstructs every word
        assert(toks.map(_.mkString("")) == words, s"seed $seed not lossless")
        // fixpoint: no adjacent pair is still a known merge
        toks.foreach(ts => ts.zip(ts.drop(1)).foreach(p =>
          assert(!ranks.contains(p), s"seed $seed unapplied merge $p")))
        // count column agrees with the encode column
        assert(r.getLong(3) == toks.map(_.size.toLong).sum, s"seed $seed count drift")
      }
    }
  }
}
