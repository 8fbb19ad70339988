package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.PhiMaskingRule

class PhiMaskingRuleSpec extends SparkSpec {
  import spark.implicits._

  private def withRule[T](rule: PhiMaskingRule)(body: => T): T = {
    spark.experimental.extraOptimizations = spark.experimental.extraOptimizations :+ rule
    try body
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == rule)
  }

  private def patients = Seq(
    ("p1", 72.0, "AB+"), ("p2", 88.0, "O-")
  ).toDF("patient_id", "heart_rate", "blood_type")

  test("denied user: protected column nulled across arbitrary queries") {
    val rule = PhiMaskingRule(Map("blood_type" -> Seq("doctor")), userRoles = Seq("analyst"))
    withRule(rule) {
      val out = patients.select($"patient_id", $"blood_type", $"heart_rate" * 2)
      val rows = out.orderBy("patient_id").collect()
      assert(rows.forall(_.isNullAt(1)))            // masked
      assert(rows.map(_.getDouble(2)).toSeq == Seq(144.0, 176.0)) // untouched col fine
      // masking also applies under aggregation, not just projection
      val agg = patients.groupBy($"blood_type").count().collect()
      assert(agg.length == 1 && agg.head.isNullAt(0))
    }
  }

  test("authorized user: plan untouched") {
    val rule = PhiMaskingRule(Map("blood_type" -> Seq("doctor")), userRoles = Seq("doctor"))
    withRule(rule) {
      val rows = patients.select($"blood_type").orderBy("blood_type").as[String].collect()
      assert(rows.toSeq == Seq("AB+", "O-"))
    }
  }

  test("rule is idempotent (no nested rewrites on repeated application)") {
    val rule = PhiMaskingRule(Map("blood_type" -> Seq("doctor")), userRoles = Seq.empty)
    val plan0 = patients.queryExecution.analyzed
    val once = rule(plan0)
    val twice = rule(once)
    assert(once == twice)
  }

  test("column matching is case-insensitive, like Spark resolution (PHI leak otherwise)") {
    // conf says BLOOD_TYPE, physical schema says blood_type: an exact
    // string compare would silently disable masking
    val rule = PhiMaskingRule(Map("BLOOD_TYPE" -> Seq("doctor")), userRoles = Seq("analyst"))
    withRule(rule) {
      val rows = patients.select($"blood_type").collect()
      assert(rows.forall(_.isNullAt(0)), "case-variant protected name must still mask")
    }
  }

  test("unconsumed denied column: rule does not wrap (no fixed-point oscillation)") {
    // query never reads blood_type: ColumnPruning in the same batch would
    // strip the masking alias and a consumption-blind rule would re-wrap
    // every iteration until the batch's iteration cap
    val rule = PhiMaskingRule(Map("blood_type" -> Seq("doctor")), userRoles = Seq.empty)
    val plan0 = patients.select($"patient_id").queryExecution.analyzed
    assert(rule(plan0) == plan0, "nothing reads the denied column; nothing to mask")
    // and the query still runs correctly end-to-end
    withRule(rule) {
      assert(patients.select($"patient_id").count() == 2L)
    }
  }


  test("union of bare relations: EVERY child masked, not just the first") {
    // Union.output carries only the first child's exprIds; a bare-relation
    // second child has no upstream expression referencing it, so a purely
    // reference-based consumption gate never wraps its leaf and
    // `TABLE a UNION ALL TABLE b` returns b's raw PHI (round-6 advice, high)
    val rule = PhiMaskingRule(Map("blood_type" -> Seq("doctor")), userRoles = Seq("analyst"))
    withRule(rule) {
      val more = Seq(("p3", 61.0, "B+"), ("p4", 59.0, "A-"))
        .toDF("patient_id", "heart_rate", "blood_type")
      patients.createOrReplaceTempView("mt1")
      more.createOrReplaceTempView("mt2")
      try {
        val rows = spark.sql("TABLE mt1 UNION ALL TABLE mt2").collect()
        assert(rows.length == 4)
        val bt = rows.head.fieldIndex("blood_type")
        assert(rows.forall(_.isNullAt(bt)), "non-first union child leaked raw PHI")
        // EXCEPT/INTERSECT expose the same positional surface: the right
        // child must also see masked values, or membership tests against
        // raw PHI leak through the set operation
        val ex = spark.sql("SELECT blood_type FROM mt1 EXCEPT SELECT blood_type FROM mt2").collect()
        assert(ex.forall(_.isNullAt(0)), "EXCEPT child leaked raw PHI")
        // DataFrame-API union (no SQL text) takes the same plan shape
        val apiRows = patients.union(more).select($"blood_type").collect()
        assert(apiRows.forall(_.isNullAt(0)), "DataFrame union child leaked raw PHI")
        // and three-way nesting converges to all children masked
        val tri = spark.sql("TABLE mt1 UNION ALL TABLE mt2 UNION ALL TABLE mt1").collect()
        assert(tri.length == 6 && tri.forall(_.isNullAt(bt)))
      } finally {
        spark.catalog.dropTempView("mt1"); spark.catalog.dropTempView("mt2")
      }
    }
    // authorized role still reads every child through
    withRule(PhiMaskingRule(Map("blood_type" -> Seq("doctor")), userRoles = Seq("doctor"))) {
      val vals = patients.union(patients).select($"blood_type").as[String].collect()
      assert(vals.sorted.toSeq == Seq("AB+", "AB+", "O-", "O-"))
    }
  }

  test("GraftExtensions injects masking BEFORE scan pushdown; predicates on denied columns leak nothing") {
    import org.apache.spark.sql.SparkSession
    import org.apache.spark.sql.graft.{ConfPhiMaskingRule, GraftExtensions}
    // second session on the same SparkContext, built WITH extensions (the
    // shared spec session has none); restore the shared one afterwards
    val dir = java.nio.file.Files.createTempDirectory("graft_phi").toString
    patients.write.mode("overwrite").parquet(dir)
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
    try {
      assert(s2 ne spark)
      s2.conf.set("spark.graft.phi.protected", "blood_type:doctor")
      s2.conf.set("spark.graft.phi.userRoles", "analyst")
      // ordering proof, direct: the mask is present in the ANALYZED plan —
      // i.e. applied before EVERY optimizer batch, including pushdown
      // (round-1's experimental wiring ran after pushdown) and
      // NullPropagation (an optimizer-batch mask could be pre-empted by
      // the IS NOT NULL fold — see the nullability asserts below)
      val analyzed = s2.read.parquet(dir).select("blood_type").queryExecution.analyzed
      val maskedInAnalysis = analyzed.collect {
        case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
          p.projectList.exists(_.metadata.contains("graft.phi.masked"))
      }.exists(identity)
      assert(maskedInAnalysis, "mask must be applied at analysis time")

      // a predicate on the denied column sees the masked null, so row
      // membership reveals nothing about the protected values
      assert(s2.read.parquet(dir).where(col("blood_type") === "AB+").count() == 0)
      assert(s2.read.parquet(dir).select("blood_type").collect().forall(_.isNullAt(0)))
      // nullability agrees with the projected nulls: IS NOT NULL must not
      // constant-fold to true off the scan's non-masked nullability
      assert(s2.read.parquet(dir).where(col("blood_type").isNotNull).count() == 0,
        "IS NOT NULL must see the masked nulls")
      assert(s2.read.parquet(dir).where(col("blood_type").isNull).count() == 2,
        "IS NULL must match every masked row")
      // authorized role reads through
      s2.conf.set("spark.graft.phi.userRoles", "doctor")
      assert(s2.read.parquet(dir).where(col("blood_type") === "AB+").count() == 1)
      // unset -> no masking at all
      s2.conf.set("spark.graft.phi.protected", "")
      s2.conf.set("spark.graft.phi.userRoles", "")
      assert(s2.read.parquet(dir).where(col("blood_type") === "O-").count() == 1)
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("denied column stays masked through TxTable.readWhere's stats-pruned scan path") {
    // round-4 verdict #7: the optimizer rule was only spec'd on plain
    // frames; a lakehouse read goes scan -> file pruning -> masked project,
    // and the masking must survive that path WITHOUT disabling the pruning
    import graft.sources.TxTable
    val rule = PhiMaskingRule(Map("blood_type" -> Seq("doctor")), userRoles = Seq("analyst"))
    val t = TxTable(spark, java.nio.file.Files.createTempDirectory("graft_tx_phi").toString)
    def batch(rows: (String, Double, String)*) =
      rows.toDF("patient_id", "heart_rate", "blood_type").coalesce(1)
    // two commits with disjoint heart_rate ranges -> min/max stats prune
    t.append(batch(("p1", 60.0, "AB+"), ("p2", 70.0, "O-")),
      tsMillis = 100L, statsCols = Seq("heart_rate"))
    t.append(batch(("p3", 160.0, "B+"), ("p4", 170.0, "A-")),
      tsMillis = 200L, statsCols = Seq("heart_rate"))
    withRule(rule) {
      val pruned = t.readWhere("heart_rate", 150.0, 200.0)
      assert(pruned.inputFiles.length < t.read().inputFiles.length,
        "stats pruning must still engage under masking")
      val rows = pruned.where(col("heart_rate").between(150.0, 200.0))
        .orderBy("patient_id").collect()
      assert(rows.map(_.getString(0)).toSeq == Seq("p3", "p4"))
      val btIdx = rows.head.fieldIndex("blood_type")
      assert(rows.forall(_.isNullAt(btIdx)), "denied column leaked through readWhere")
      // a predicate ON the denied column sees only the masked null — row
      // membership reveals nothing about protected values on this path
      assert(t.readWhere("heart_rate", 0.0, 500.0)
        .where(col("blood_type") === "B+").count() == 0L)
      // the bloom-pruned point-lookup path masks identically
      assert(t.readWhereIn("patient_id", Seq("p3"))
        .select("blood_type").collect().forall(_.isNullAt(0)))
    }
    // authorized role reads the same pruned path unmasked
    withRule(PhiMaskingRule(Map("blood_type" -> Seq("doctor")), userRoles = Seq("doctor"))) {
      assert(t.readWhere("heart_rate", 150.0, 200.0)
        .where(col("blood_type") === "B+").count() == 1L)
    }
  }
}
