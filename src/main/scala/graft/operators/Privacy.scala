package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Re-identification-risk audits over governed tables — the release-time
  * counterpart of the reference's PHI access control (its `phi_fields` /
  * masking registry, feature_registry.py:86-101): masking hides a column,
  * but a quasi-identifier COMBINATION can still single a patient out. These
  * audits quantify that risk before a dataset leaves the platform.
  *
  * Scale shape: both audits are one hash-aggregate shuffle on the
  * quasi-identifier key (rows ∝ equivalence classes, not data); the
  * summary variants fold the class frame into one row. No windows, no
  * joins, no driver round-trips — a 100 TB table audits in one pass.
  */
object Privacy {

  /** k-anonymity audit: one row per quasi-identifier equivalence class
    * with its size and an `at_risk` flag (class smaller than k — an
    * attacker knowing the quasi-identifiers pins the subject to fewer than
    * k candidate rows). Null quasi values form their own class (groupBy
    * semantics), matching the conservative reading that "unknown" is still
    * a linkable value.
    */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "k-anonymity needs at least one quasi-identifier column")
    // a non-positive k marks EVERY class safe — a release gate that always
    // passes is a config bug, not an audit
    require(k >= 1, s"k must be >= 1, got $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .withColumn("at_risk", col("class_size") < k)
  }

  /** l-diversity audit: per equivalence class, the number of DISTINCT
    * sensitive values (a k-anonymous class whose sensitive attribute is
    * constant still leaks it — homogeneity attack). `diverse` = at least
    * l distinct sensitive values observed. Null sensitive values are not
    * counted as a distinct value (countDistinct semantics): a null reveals
    * nothing to link.
    */
  def lDiversity(df: DataFrame, quasiCols: Seq[String], sensitiveCol: String,
      l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "l-diversity needs at least one quasi-identifier column")
    require(l >= 1, s"l must be >= 1, got $l") // l=0 marks every class diverse
    df.groupBy(quasiCols.map(col): _*)
      .agg(
        count(lit(1)).as("class_size"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("diverse", col("n_sensitive") >= l)
  }

  /** t-closeness audit (Li, Li & Venkatasubramanian 2007 — the third rung
    * of the k-anonymity / l-diversity / t-closeness ladder): a diverse
    * class can still leak when its sensitive DISTRIBUTION skews far from
    * the table's (skewness attack: 99% "positive" in one class is a
    * disclosure even with 2 distinct values). Per equivalence class, the
    * Earth Mover's Distance between the class's sensitive-value
    * distribution P and the global distribution Q, for an ORDERED
    * sensitive attribute with equal-step ground distance — the paper's
    * closed form over the m ordered values:
    *
    * {{{ D[P, Q] = (1 / (m − 1)) · Σ_{i=1}^{m} | Σ_{j≤i} (p_j − q_j) | }}}
    *
    * (the i = m term is identically 0, so including it changes nothing).
    * Null sensitive values are excluded from both distributions (a null
    * reveals nothing to link — the l-diversity stance).
    *
    * Scale shape: one global (value) agg collected into ONE ordered
    * domain row (m values — the sensitive attribute's cardinality is
    * dimension-scale by definition of "attribute"), one (class, value)
    * partial agg, the domain broadcast-joined back, and the cumulative
    * fold runs as a map-only lambda over each class's m-length array —
    * no window at all, rows ∝ classes after the aggs. A 100 TB table
    * audits in two hash aggregations.
    *
    * @return one row per class: quasiCols + class_size + t_dist + close
    *   (t_dist <= t). A single-value domain (m = 1) has distance 0.
    */
  def tCloseness(df: DataFrame, quasiCols: Seq[String], sensitiveCol: String,
      t: Double): DataFrame = {
    require(quasiCols.nonEmpty, "t-closeness needs at least one quasi-identifier column")
    require(t >= 0.0 && t <= 1.0, s"t must be in [0, 1], got $t")
    val d = df.where(col(sensitiveCol).isNotNull)
    // ordered global domain as ONE row: (value, q) pairs sorted by value —
    // sort_array over the collected struct, no unpartitioned window
    val domain = d.groupBy(col(sensitiveCol).as("__v"))
      .agg(count(lit(1)).cast("double").as("__qc"))
      .agg(sort_array(collect_list(struct(col("__v"), col("__qc")))).as("__dom"),
        sum("__qc").as("__total"))
      .select(expr("transform(__dom, s -> struct(s.__v as v, s.__qc / __total as q))")
        .as("__dom"))
    val classCnt = d.groupBy((quasiCols.map(col) :+ col(sensitiveCol).as("__v")): _*)
      .agg(count(lit(1)).cast("double").as("__cc"))
      .groupBy(quasiCols.map(col): _*)
      .agg(sum("__cc").as("class_size"),
        map_from_entries(collect_list(struct(col("__v"), col("__cc")))).as("__pm"))
    // per class: p_i from the count map (0 where absent), diff = p − q in
    // DOMAIN order, then one fold accumulating Σ|cumsum| — the EMD
    classCnt
      .crossJoin(broadcast(domain))
      .withColumn("__diffs", expr(
        """transform(__dom, s ->
          |  coalesce(element_at(__pm, s.v), 0.0D) / class_size - s.q)""".stripMargin))
      .withColumn("t_dist",
        when(size(col("__dom")) <= 1, lit(0.0)).otherwise(expr(
          """aggregate(__diffs, struct(0.0D as cum, 0.0D as acc),
            |  (s, x) -> struct(s.cum + x, s.acc + abs(s.cum + x)),
            |  s -> s.acc)""".stripMargin) / (size(col("__dom")) - 1)))
      .select((quasiCols.map(col) :+ col("class_size").cast("long").as("class_size") :+
        col("t_dist") :+ (col("t_dist") <= t).as("close")): _*)
  }
}
