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
}
