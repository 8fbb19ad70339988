package graft

import graft.operators.Privacy

/** Pins the re-identification-audit semantics: class sizes and flags,
  * null quasi values as their own class, and the homogeneity case where
  * k-anonymity holds but l-diversity fails.
  */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    // (zip, age_band, diagnosis)
    ("02138", "30-40", "flu"),
    ("02138", "30-40", "flu"),
    ("02138", "30-40", "flu"),      // k=3 class, but ZERO diversity
    ("02139", "30-40", "flu"),
    ("02139", "30-40", "covid"),
    ("02139", "30-40", "asthma"),   // k=3 class, 3-diverse
    ("02140", "50-60", "cancer"),   // singleton: the re-identifiable row
    (null: String, "50-60", "flu"),
    (null: String, "50-60", "covid")) // null zip is still a linkable class
    .toDF("zip", "age_band", "diagnosis")

  test("kAnonymity: class sizes, at_risk under k, null quasi is a class") {
    val out = Privacy.kAnonymity(rows, Seq("zip", "age_band"), k = 3L)
      .collect()
      .map(r => (Option(r.getString(0)).getOrElse("NULL"), r.getLong(2), r.getBoolean(3)))
      .toSet
    assert(out == Set(
      ("02138", 3L, false),
      ("02139", 3L, false),
      ("02140", 1L, true),
      ("NULL", 2L, true)))
  }

  test("lDiversity: a k-anonymous but homogeneous class fails diversity") {
    val out = Privacy.lDiversity(rows, Seq("zip", "age_band"), "diagnosis", l = 2L)
      .collect()
      .map(r => (Option(r.getString(0)).getOrElse("NULL"), r.getLong(3), r.getBoolean(4)))
      .toSet
    assert(out == Set(
      ("02138", 1L, false), // 3-anonymous yet leaks the diagnosis
      ("02139", 3L, true),
      ("02140", 1L, false),
      ("NULL", 2L, true)))
  }

  test("lDiversity: null sensitive values are not a distinct value") {
    val df = Seq(("z", "a", "flu"), ("z", "a", null: String), ("z", "a", null: String))
      .toDF("zip", "age_band", "diagnosis")
    val r = Privacy.lDiversity(df, Seq("zip", "age_band"), "diagnosis", l = 2L).collect().head
    assert(r.getLong(2) == 3L && r.getLong(3) == 1L && !r.getBoolean(4))
  }

  test("tCloseness: hand-computed ordered EMD; global-matching class scores 0") {
    // domain over bands {1, 2, 3}: global counts (2, 1, 1) -> Q = (.5, .25, .25)
    val df = Seq(
      ("A", 1L), ("A", 1L),            // P_A = (1, 0, 0)
      ("B", 2L), ("B", 3L))            // P_B = (0, .5, .5)
      .toDF("cls", "band")
    val out = Privacy.tCloseness(df, Seq("cls"), "band", t = 0.4)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .toMap
    // A: diffs (.5, -.25, -.25), cums (.5, .25, 0) -> sum|cum| = .75, /2 = .375
    assert(out("A")._1 == 2L && math.abs(out("A")._2 - 0.375) < 1e-12 && out("A")._3)
    // B: diffs (-.5, .25, .25), cums (-.5, -.25, 0) -> .375 as well (symmetry)
    assert(math.abs(out("B")._2 - 0.375) < 1e-12)

    // a class whose distribution EQUALS the global scores exactly 0
    val uniform = Seq(("A", 1L), ("A", 2L), ("B", 1L), ("B", 2L)).toDF("cls", "band")
    Privacy.tCloseness(uniform, Seq("cls"), "band", t = 0.0)
      .collect().foreach { r =>
        assert(r.getDouble(2) == 0.0 && r.getBoolean(3), r.toString)
      }
  }

  test("tCloseness: single-value domain scores 0; null sensitive values are excluded") {
    val single = Seq(("A", 5L), ("B", 5L)).toDF("cls", "band")
    Privacy.tCloseness(single, Seq("cls"), "band", t = 0.0)
      .collect().foreach(r => assert(r.getDouble(2) == 0.0))
    // nulls drop from BOTH distributions: with them gone the two classes
    // match the global exactly
    val withNulls = Seq(
      ("A", java.lang.Long.valueOf(1L)), ("A", null.asInstanceOf[java.lang.Long]),
      ("B", java.lang.Long.valueOf(1L)))
      .toDF("cls", "band")
    val out = Privacy.tCloseness(withNulls, Seq("cls"), "band", t = 0.0)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out("A") == (1L, 0.0), s"null must not count toward the class size/distribution: $out")
    assert(out("B") == (1L, 0.0))
  }
}
