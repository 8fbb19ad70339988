package graft

import org.apache.spark.sql.functions._
import graft.operators.FuzzyJoin

/** Pins the blocked edit-distance join: exactness of emitted pairs, the
  * length-bucket probe, and measured recall of blocking vs the brute-force
  * all-pairs ground truth (blocking trades bounded recall for a ~linear
  * candidate set — the trade must be measured, not assumed).
  */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  test("selfPairs: shared-token pairs within maxDist, no false positives") {
    val names = Seq(
      (1L, "red widget"), (2L, "red gadget"),   // widget->gadget = 2 subs: in at 2
      (3L, "red widget"),                        // exact dup of 1 -> dist 0
      (4L, "red widgets"),                       // dist 1 from 1/3; dist 3 from 2: out
      (5L, "blue bolt"), (6L, "blue belt"),      // dist 1, share "blue"
      (7L, "green anvil")                        // no partner
    ).toDF("id", "name")
    val got = FuzzyJoin.selfPairs(names, "id", "name", maxDist = 2)
      .select("id_a", "id_b", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set(
      (1L, 2L, 2), (1L, 3L, 0), (1L, 4L, 1), (2L, 3L, 2), (3L, 4L, 1), (5L, 6L, 1)))
  }

  test("maxBlockDf: hot tokens stop blocking; rare shared tokens still match") {
    // 30 names all share the hot token "item"; two pairs also share a rare
    // distinctive token. With the cap below 30, only the rare-token pairs
    // can block — the hot-token-only pairs are the documented recall trade.
    val names = ((1L to 30L).map(i => (i, s"item variant$i")) ++ Seq(
      (31L, "item zebra"), (32L, "item zebrb"),   // dist 1, but their ONLY shared token is the hot "item"
      (33L, "quokka item"), (34L, "quokka itex")  // dist 1, share the rare "quokka"
    )).toDF("id", "name")
    val capped = FuzzyJoin.selfPairs(names, "id", "name", maxDist = 2, maxBlockDf = 10)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // (33, 34) blocks on "quokka" (df 2) and is within dist 2
    assert(capped.contains((33L, 34L)))
    // (31, 32) share ONLY tokens "item" (hot, df 34 > 10) and differing
    // zebra/zebrb tokens — no common block survives the cap: missed
    assert(!capped.contains((31L, 32L)))
    // without the cap, both pairs match
    val uncapped = FuzzyJoin.selfPairs(names, "id", "name", maxDist = 2)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.contains((31L, 32L)) && uncapped.contains((33L, 34L)))
  }

  test("every emitted pair is truly within maxDist (precision is exact)") {
    val names = graft.sources.Tables.part(spark, "/root/testdata/sf0.001")
      .groupBy(col("p_name").as("name")).agg(min("p_partkey").as("id"))
    val pairs = FuzzyJoin.selfPairs(names, "id", "name", maxDist = 2)
    assert(pairs.where(levenshtein(col("name_a"), col("name_b")) > 2).isEmpty)
  }

  test("blocking recall vs brute force on the part-name vocabulary") {
    val names = graft.sources.Tables.part(spark, "/root/testdata/sf0.001")
      .groupBy(col("p_name").as("name")).agg(min("p_partkey").as("id"))
      .cache()
    val blocked = FuzzyJoin.selfPairs(names, "id", "name", maxDist = 2)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // ground truth: full quadratic self-join (test-only — the operator
    // exists precisely so production never runs this shape)
    val a = names.select(col("id").as("ia"), col("name").as("na"))
    val b = names.select(col("id").as("ib"), col("name").as("nb"))
    val brute = a.crossJoin(b)
      .where(col("ia") < col("ib") && levenshtein(col("na"), col("nb")) <= 2)
      .select("ia", "ib")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    names.unpersist()
    assert(blocked.subsetOf(brute), "blocked join emitted a pair brute force rejects")
    assert(brute.nonEmpty, "fixture produced no ground-truth pairs — recall check is vacuous")
    val recall = blocked.size.toDouble / brute.size
    // token blocking misses pairs whose every token changed; on 2-token
    // names that requires one edit in EACH token — rare at dist<=2
    assert(recall >= 0.85, s"recall $recall (${blocked.size}/${brute.size})")
  }
}
