package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-level data profiling — the pre-ingest audit a pipeline runs
  * before trusting a new table (null rates, cardinalities): the engine-side
  * generalization of the reference's per-value validation
  * (feature_registry.py:558-577), which only ever sees one value at a time.
  *
  * One pass, one shuffle: every per-column aggregate (row count, null
  * count, distinct count) computes in a single `agg` — Catalyst expands
  * multi-distinct aggregates into one grouping-sets pass rather than one
  * scan per column — and the per-column rows are unstacked from the single
  * result row with an explode over a literal struct array (map-only).
  */
object Profiling {

  /** One row per profiled column: (column, n_rows, n_nulls, n_distinct).
    * n_distinct is exact and excludes nulls (SQL COUNT DISTINCT rule). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = count(lit(1)).as("__rows") +: cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        countDistinct(col(c)).as(s"__nd_$c"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map { c =>
        struct(
          lit(c).as("column"),
          col("__rows").as("n_rows"),
          col(s"__nulls_$c").as("n_nulls"),
          col(s"__nd_$c").as("n_distinct"))
      }: _*)).as("r"))
      .select("r.*")
  }

  /** Higher-moment column profile per group: mean, sample stddev, skewness
    * and EXCESS kurtosis computed from explicit power sums
    * (Σx, Σx², Σx³, Σx⁴) — the formula is spelled out rather than
    * delegated to an engine built-in so any SQL engine replays it
    * bit-comparably (built-in skewness/kurtosis differ between engines on
    * bias correction). Population moments: m_k = Σ(x−μ)^k / n expanded to
    * power-sum form. One map-side-combined aggregate pass; four extra
    * doubles per group over a plain avg.
    *
    * Numeric note: power-sum expansion cancels catastrophically when
    * |μ| ≫ σ — fine for bounded feature values (the profiling target),
    * not for raw epoch timestamps; shift those first.
    */
  def moments(df: DataFrame, valueCol: String, groupCols: Seq[String]): DataFrame = {
    val x = col(valueCol).cast("double")
    df.where(x.isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).cast("double").as("__n"),
        sum(x).as("__s1"), sum(x * x).as("__s2"),
        sum(x * x * x).as("__s3"), sum(x * x * x * x).as("__s4"))
      .withColumn("mean", col("__s1") / col("__n"))
      .withColumn("__m2",
        col("__s2") / col("__n") - col("mean") * col("mean"))
      .withColumn("__m3",
        col("__s3") / col("__n") - lit(3.0) * col("mean") * col("__s2") / col("__n")
          + lit(2.0) * col("mean") * col("mean") * col("mean"))
      .withColumn("__m4",
        col("__s4") / col("__n") - lit(4.0) * col("mean") * col("__s3") / col("__n")
          + lit(6.0) * col("mean") * col("mean") * col("__s2") / col("__n")
          - lit(3.0) * col("mean") * col("mean") * col("mean") * col("mean"))
      .withColumn("n", col("__n").cast("long"))
      // greatest(…, 0): power-sum cancellation can land __m2 a hair below
      // zero for a (near-)constant column, and sqrt(negative) = NaN where
      // the repo convention (and the skew/kurtosis guards here) pin
      // degenerate spread to a well-defined value
      .withColumn("sd",
        when(col("__n") > 1,
          sqrt(greatest(col("__m2"), lit(0.0)) * col("__n") / (col("__n") - 1))))
      .withColumn("skewness",
        when(col("__m2") > 0, col("__m3") / pow(col("__m2"), 1.5)))
      .withColumn("kurtosis",
        when(col("__m2") > 0, col("__m4") / (col("__m2") * col("__m2")) - lit(3.0)))
      .select((groupCols.map(col) ++ Seq(col("n"), col("mean"), col("sd"),
        col("skewness"), col("kurtosis"))): _*)
  }

  /** Categorical-distribution concentration per group: Shannon entropy
    * (nats) and the Herfindahl concentration index (Σp²) of a category
    * column's share distribution — the label-balance / class-collapse
    * check before a training cut. Two aggregates on group-grain frames
    * (category counts, then the per-group fold); the share normalizer is
    * a groups-sized broadcast join, never a window over data.
    */
  def entropy(df: DataFrame, catCol: String, groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "entropy needs at least one group column")
    val counts = df.groupBy((groupCols.map(col) :+ col(catCol)): _*)
      .agg(count(lit(1)).as("__c"))
    val totals = counts.groupBy(groupCols.map(col): _*).agg(sum("__c").as("__t"))
    val cond = groupCols.map(c => counts(c) <=> totals(c)).reduce(_ && _)
    groupCols.foldLeft(counts.join(broadcast(totals), cond))((acc, c) => acc.drop(totals(c)))
      .withColumn("__p", col("__c").cast("double") / col("__t"))
      .groupBy(groupCols.map(col): _*)
      .agg(
        sum(negate(col("__p") * log(col("__p")))).as("entropy"),
        sum(col("__p") * col("__p")).as("herfindahl"),
        count(lit(1)).as("n_categories"))
  }

  /** Key-skew audit: the distribution of per-key row counts for a proposed
    * shuffle/partition key — the number a platform team reads BEFORE
    * keying a 100 TB join ("is user_id safe to shuffle on, or does one
    * whale key own 30% of the table?"). Returns ONE row:
    * `(n_rows, n_keys, max_n, avg_n, p50_n, p99_n, skew_ratio, top_share)`
    * where `skew_ratio = max_n / avg_n` (1.0 = perfectly uniform) and
    * `top_share` = the heaviest key's fraction of all rows — the straggler
    * predictor: a task holding that key does `skew_ratio ×` the average
    * task's work.
    *
    * Two aggregations, both safe at scale: per-key counts (rows ∝ keys,
    * map-side combined), then a global fold of that key frame. The exact
    * percentiles run over per-key COUNTS, never over the raw table. Null
    * keys count as a key — they hash to one partition too.
    */
  def skewAudit(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "skewAudit needs at least one key column")
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .agg(
        sum("__n").as("n_rows"),
        count(lit(1)).as("n_keys"),
        max("__n").as("max_n"),
        avg("__n").as("avg_n"),
        // exact percentile is safe here: its buffer holds (value, weight)
        // pairs over DISTINCT per-key counts — bounded by the count RANGE
        // (Zipfian: thousands), not the key count, so billions of keys
        // still aggregate in one small reducer
        expr("percentile(__n, 0.5D)").as("p50_n"),
        expr("percentile(__n, 0.99D)").as("p99_n"))
      .withColumn("skew_ratio", col("max_n") / col("avg_n"))
      .withColumn("top_share", col("max_n") / col("n_rows"))
  }
}
