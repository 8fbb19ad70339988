package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis}

/** Differential specs for the round-14 native n-gram kernels: the fused
  * [[graft.functions.WordShingles]] / [[graft.functions.WinnowSelect]]
  * expressions must be bit-identical (values AND schema, including
  * nullability where the declared outputs carry it) to the lambda trees
  * they replaced — the DuckDB oracle replays the lambda-form SQL, so any
  * divergence here is an oracle failure waiting to happen.
  */
class ShingleExpressionsSpec extends SparkSpec {
  import spark.implicits._

  // adversarial token shapes: ties, repeats, empties, unicode, shorter
  // arrays than the shingle width, single-token docs
  private val texts = Seq(
    1L -> "the quick brown fox jumps over the lazy dog near the river bank",
    2L -> "a a a a a a a a",                       // all-equal grams: tie rule everywhere
    3L -> "b a b a b a b a b",                     // alternating: rightmost-min ties
    4L -> "one two",                               // shorter than k+w-1
    5L -> "solo",                                  // single token
    6L -> "x",                                     // shorter than k
    7L -> "zz yy xx ww vv uu tt ss rr qq pp oo",   // strictly decreasing
    8L -> "aa ab aa ab aa ab aa",                  // period-2 repeats: dedup across windows
    9L -> "émile zola über café naïve jalapeño résumé piñata",  // non-ascii byte order
    10L -> "  padded   with   runs\tof\nwhitespace tokens here now ok fine yes "
  )
  private val docs = texts.toDF("doc_id", "text")

  // the lambda tree wordShinglesFromWords replaced (kept verbatim here as
  // the differential oracle)
  private def shinglesHof(words: org.apache.spark.sql.Column, n: Int) =
    array_distinct(
      transform(
        sequence(lit(0), greatest(size(words) - n, lit(0))),
        i => concat_ws(" ", slice(words, i + 1, lit(n)))
      )
    )

  test("WordShingles ≡ lambda tree on adversarial token shapes (n = 1, 2, 3, 5)") {
    for (n <- Seq(1, 2, 3, 5)) {
      val base = docs.select(col("doc_id"), split(trim(col("text")), "\\s+").as("__w"))
      val native = base.select(col("doc_id"),
        Dedup.wordShinglesFromWords(col("__w"), n).as("s"))
      val hof = base.select(col("doc_id"), shinglesHof(col("__w"), n).as("s"))
      val nRows = native.orderBy("doc_id").collect()
      val hRows = hof.orderBy("doc_id").collect()
      assert(nRows.length == hRows.length)
      nRows.zip(hRows).foreach { case (a, b) =>
        assert(a.getLong(0) == b.getLong(0))
        assert(a.getSeq[String](1) == b.getSeq[String](1),
          s"n=$n doc=${a.getLong(0)}: native ${a.getSeq[String](1)} vs lambda ${b.getSeq[String](1)}")
      }
    }
  }

  test("WordShingles: null words array degenerates like the lambda form ([\"\"], not null)") {
    val withNull = Seq((1L, Some("a b c")), (2L, None)).toDF("doc_id", "text")
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("__w"))
    val native = withNull.select(col("doc_id"),
      Dedup.wordShinglesFromWords(col("__w"), 2).as("s")).orderBy("doc_id").collect()
    val hof = withNull.select(col("doc_id"),
      shinglesHof(col("__w"), 2).as("s")).orderBy("doc_id").collect()
    native.zip(hof).foreach { case (a, b) =>
      assert(a.getSeq[String](1) == b.getSeq[String](1))
    }
    assert(native(1).getSeq[String](1) == Seq(""))
  }

  test("winnow ≡ winnowHof row-for-row on adversarial shapes (k,w grids)") {
    for ((k, w) <- Seq((3, 4), (1, 1), (2, 3), (1, 4), (3, 1))) {
      val native = TextAnalysis.winnow(docs, "doc_id", "text", k, w)
        .orderBy("doc_id", "pos", "gram").collect().toSeq
      val hof = TextAnalysis.winnowHof(docs, "doc_id", "text", k, w)
        .orderBy("doc_id", "pos", "gram").collect().toSeq
      assert(native == hof, s"(k=$k, w=$w): native and lambda winnow diverge")
    }
  }

  test("winnow native keeps the lambda form's output schema") {
    val native = TextAnalysis.winnow(docs, "doc_id", "text", 3, 4)
    val hof = TextAnalysis.winnowHof(docs, "doc_id", "text", 3, 4)
    assert(native.schema == hof.schema,
      s"schema drift: ${native.schema.treeString} vs ${hof.schema.treeString}")
  }

  test("winnow guarantee survives the native swap: shared ≥ k+w-1 window shares a fingerprint") {
    val pair = Seq(
      100L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      200L -> "prefix words then alpha beta gamma delta epsilon zeta end"
    ).toDF("doc_id", "text")
    val fp = TextAnalysis.winnow(pair, "doc_id", "text", k = 3, w = 4)
    val shared = fp.where(col("doc_id") === 100L).select("gram")
      .intersect(fp.where(col("doc_id") === 200L).select("gram"))
    assert(shared.count() >= 1)
  }
}
