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
}
