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
        expr("percentile(__n, 0.5D)").as("p50_n"),
        expr("percentile(__n, 0.99D)").as("p99_n"))
      .withColumn("skew_ratio", col("max_n") / col("avg_n"))
      .withColumn("top_share", col("max_n") / col("n_rows"))
  }
}
