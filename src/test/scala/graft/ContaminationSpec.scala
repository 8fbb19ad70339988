package graft

import org.apache.spark.sql.functions._
import graft.operators.Contamination

class ContaminationSpec extends SparkSpec {
  import spark.implicits._

  // benchmark doc 100's opening 8 tokens appear verbatim inside corpus doc 1
  private val bench = Seq(
    (100L, "alpha beta gamma delta epsilon zeta eta theta"),
    (101L, "one two three four five six seven eight nine ten")
  ).toDF("doc_id", "text")

  private val corpus = Seq(
    (1L, "prefix words then alpha beta gamma delta epsilon zeta eta theta and a tail"),
    (2L, "entirely clean document with no benchmark overlap at all in any window"),
    (3L, "short doc") // fewer than 8 tokens: produces no grams, never flagged
  ).toDF("doc_id", "text")

  test("ngrams emits size-n windows in order, none below n tokens") {
    val g = Contamination.ngrams(Seq((1L, "a b c d")).toDF("doc_id", "text"), "doc_id", "text", 3)
      .select("gram").as[String].collect()
    assert(g.toSeq == Seq("a b c", "b c d"))
    assert(Contamination.ngrams(Seq((1L, "a b")).toDF("doc_id", "text"), "doc_id", "text", 3).isEmpty)
  }

  test("contaminationReport flags exactly the doc containing a verbatim benchmark 8-gram") {
    val r = Contamination.contaminationReport(corpus, bench, "doc_id", "text", n = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r.keySet == Set(1L)) // doc 1 contaminated; 2 clean, 3 too short
    assert(r(1L) == 1L) // exactly one distinct shared 8-gram
  }

  test("decontaminate drops flagged docs and keeps the rest intact") {
    val kept = Contamination.decontaminate(corpus, bench, "doc_id", "text", n = 8)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L))
  }

  test("contamination matching is case-insensitive; benchmark leakage cannot hide behind case") {
    val shouting = Seq(
      (1L, "prefix words then ALPHA Beta GAMMA delta Epsilon ZETA eta Theta and a tail"),
      (2L, "entirely clean document with no benchmark overlap at all in any window")
    ).toDF("doc_id", "text")
    val r = Contamination.contaminationReport(shouting, bench, "doc_id", "text", n = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r == Map(1L -> 1L), "case-variant benchmark text is still leakage")
    val kept = Contamination.decontaminate(shouting, bench, "doc_id", "text", n = 8)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L))
  }

  test("decontaminate kills a contaminated row even when its id is NULL") {
    val withNull = Seq(
      (Option.empty[Long], "prefix words then alpha beta gamma delta epsilon zeta eta theta and a tail"),
      (Option(2L), "entirely clean document with no benchmark overlap at all in any window")
    ).toDF("doc_id", "text")
    val kept = Contamination.decontaminate(withNull, bench, "doc_id", "text", n = 8)
      .select("doc_id").collect().map(r => Option(r.get(0)))
    // plain equality would let the null-id contaminated row survive the
    // anti-join and ship benchmark text into training data
    assert(kept.toSeq == Seq(Some(2L)))
  }

  test("boilerplate votes once per DISTINCT doc id under duplicate-row delivery") {
    val redelivered = Seq(
      (1L, "shared header line here plus unique body one"),
      (1L, "shared header line here plus unique body one"), // at-least-once duplicate
      (2L, "shared header line here plus unique body two")
    ).toDF("doc_id", "text")
    val grams = Contamination.boilerplate(redelivered, "doc_id", "text", n = 4, minDocs = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // "shared header line here" appears in docs 1 and 2 -> n_docs = 2, not 3;
    // doc 1's unique body must NOT cross minDocs via its duplicate row
    assert(grams.get("shared header line here").contains(2L))
    assert(!grams.keys.exists(_.contains("unique body one")),
      "a redelivered doc must not turn its own text into boilerplate")
  }

  test("boilerplate finds grams shared across docs, one vote per doc, below-threshold excluded") {
    val docs = Seq(
      (1L, "copyright two thousand inc all rights reserved body one"),
      (2L, "copyright two thousand inc all rights reserved body two"),
      (3L, "copyright two thousand inc all rights reserved body three"),
      (4L, "copyright two thousand inc all rights reserved copyright two thousand inc all rights reserved"), // repeats within doc: still ONE vote
      (5L, "unique words only in this document nothing shared here")
    ).toDF("doc_id", "text")
    val r = Contamination.boilerplate(docs, "doc_id", "text", n = 7, minDocs = 4L)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r("copyright two thousand inc all rights reserved") == 4L)
    assert(r.values.forall(_ >= 4L)) // nothing below the threshold leaks through
  }

  test("repetitionReport: distinct-gram doc scores 0, repeated text scores high") {
    val docs = Seq(
      (1L, "a b c d e f"),                   // all 3-grams distinct -> 0.0
      (2L, "x y z x y z x y z x y z")        // heavy repetition
    ).toDF("doc_id", "text")
    val r = Contamination.repetitionReport(docs, "doc_id", "text", n = 3)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    assert(r(1L)._3 == 0.0)
    val (n2, d2, ratio2) = r(2L)
    assert(n2 == 10 && d2 == 3) // 12 tokens -> 10 positions, 3 distinct grams
    assert(ratio2 == 0.7)
  }

  test("winnow: closed forms on sorted and constant docs, window coverage, partition-stable") {
    import graft.operators.TextAnalysis
    // strictly increasing tokens: every window's min is its FIRST gram, so
    // selections are positions 1..m-w+1 with the gram at that position
    val inc = Seq((1L, "a b c d e f g h i j")).toDF("doc_id", "text") // 10 toks, m=8 grams
    val gotInc = TextAnalysis.winnow(inc, "doc_id", "text")
      .collect().map(r => (r.getLong(1), r.getString(2))).toSet
    assert(gotInc == Set(1L -> "a b c", 2L -> "b c d", 3L -> "c d e", 4L -> "d e f", 5L -> "e f g"))
    // constant tokens: all grams tie, rightmost-min rule selects each
    // window's LAST position -> positions w..m
    val const = Seq((2L, "z z z z z z z z z z")).toDF("doc_id", "text")
    val gotConst = TextAnalysis.winnow(const, "doc_id", "text")
      .collect().map(r => (r.getLong(1), r.getString(2))).toSet
    assert(gotConst == (4L to 8L).map(_ -> "z z z").toSet)
    // guarantee: every window of 4 consecutive gram positions contains a
    // selected position (the winnowing coverage property), any input
    val doc = Seq((3L, (1 to 40).map(i => s"w${(i * 7919) % 13}").mkString(" "))).toDF("doc_id", "text")
    val sel = TextAnalysis.winnow(doc, "doc_id", "text").collect().map(_.getLong(1)).toSet
    val m = 40 - 2
    (0 to m - 4).foreach { s =>
      assert((1 to 4).exists(j => sel.contains(s + j.toLong)), s"window at $s has no fingerprint")
    }
    // short docs (< k+w-1 tokens) carry no full window and are dropped
    assert(TextAnalysis.winnow(Seq((4L, "a b c d e")).toDF("doc_id", "text"), "doc_id", "text").isEmpty)
    // deterministic under repartitioning
    val again = TextAnalysis.winnow(doc.repartition(5), "doc_id", "text")
      .collect().map(_.getLong(1)).toSet
    assert(again == sel)
  }

  test("chunkWindows: stride windows, ragged tail kept, short doc = one window, map-only plan") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, (1 to 9).map(i => s"t$i").mkString(" ")), // 9 tokens
      (2L, "a b c")                                  // shorter than size
    ).toDF("doc_id", "text")
    val r = TextAnalysis.chunkWindows(docs, "doc_id", "text", size = 4, stride = 3)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> (x.getLong(2), x.getString(3))).toMap
    // doc 1: ceil((9-4)/3)=2 -> starts 1,4,7; the last window is ragged (3)
    assert(r((1L, 0L)) == (4L, "t1 t2 t3 t4"))
    assert(r((1L, 1L)) == (4L, "t4 t5 t6 t7"))
    assert(r((1L, 2L)) == (3L, "t7 t8 t9"))
    assert(!r.contains((1L, 3L)))
    assert(r((2L, 0L)) == (3L, "a b c") && !r.contains((2L, 1L)))
    val plan = TextAnalysis.chunkWindows(docs, "doc_id", "text", 4, 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }

  test("contaminationFlags: keeps clean and short docs at 0, matches report counts, streams") {
    val batch = Contamination.contaminationFlags(corpus, bench, "doc_id", "text", n = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(batch(1L) == (1L, 1)) // same count as contaminationReport
    assert(batch(2L) == (0L, 0)) // clean doc KEPT (report drops it)
    assert(batch(3L) == (0L, 0)) // short doc KEPT with zero grams
    // the same operator applied to a stream produces the same rows
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val q = Contamination
      .contaminationFlags(ms.toDF().toDF("doc_id", "text"), bench, "doc_id", "text", n = 8)
      .writeStream.format("memory").queryName("flags_stream_spec")
      .outputMode("update").start()
    ms.addData(1L -> "prefix words then alpha beta gamma delta epsilon zeta eta theta and a tail")
    ms.addData(3L -> "short doc")
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("flags_stream_spec")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(streamed == Map(1L -> (1L, 1), 3L -> (0L, 0)))
  }

  test("packSequences: boundary-splitting pack, exact spans, invariant under partitioning") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "a b c"),              // 3 tokens -> stream [0,3)
      (2L, "d e f g"),            // 4 -> [3,7)
      (3L, "h i j k l m n"),      // 7 -> [7,14)
      (4L, "o")                   // 1 -> [14,15)
    ).toDF("doc_id", "text")
    val expected = Set(
      (0L, 1L, 0L, 3L), (0L, 2L, 0L, 2L),   // chunk 0 = [0,5)
      (1L, 2L, 2L, 4L), (1L, 3L, 0L, 3L),   // chunk 1 = [5,10)
      (2L, 3L, 3L, 7L), (2L, 4L, 0L, 1L))   // chunk 2 = [10,15)
    for (parts <- Seq(1, 3)) { // the distributed prefix sum must not depend on partition count
      val r = TextAnalysis.packSequences(docs, "doc_id", "text", capacity = 5,
        numPartitions = parts)
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3))).toSet
      assert(r == expected, s"parts=$parts")
    }
    // invariants at fixture scale: per-doc spans reassemble the doc; every
    // chunk except the global tail is exactly `capacity` tokens
    val corpus = (1L to 40L).map(i => (i, (1L to i).map(j => s"w$j").mkString(" ")))
      .toDF("doc_id", "text")
    val packed = TextAnalysis.packSequences(corpus, "doc_id", "text", capacity = 64,
      numPartitions = 4).cache()
    val perDoc = packed.groupBy("doc_id").agg(sum("n_tokens").as("tot"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 40L).forall(i => perDoc(i) == i))
    val perChunk = packed.groupBy("chunk_id").agg(sum("n_tokens").as("tot"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val last = perChunk.keys.max
    assert(perChunk.filterNot(_._1 == last).values.forall(_ == 64L))
    assert(perChunk(last) <= 64L)
    packed.unpersist()
  }

  test("contamination check never shuffles the corpus grams: bench side broadcasts") {
    val plan = Contamination.contaminationReport(corpus, bench, "doc_id", "text", 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected a broadcast containment join:\n$plan")
  }
}
