package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Fns

/** Feature scaling for training pipelines: per-group z-score
  * standardization and min-max normalization — the last transform before
  * features feed a model. Scale shape: the stats frame is ONE partial-agg
  * shuffle over the group keys (rows ∝ groups, not data), broadcast back,
  * and the transform itself is map-only — 100 TB standardizes in a single
  * pass.
  */
object Scaling {

  // stats join on NULL-SAFE equality: a null group key is a real group
  // (groupBy emits its stats row), and a plain equi-join would silently
  // DROP every row of it — data loss, not just a null score
  private def joinStats(df: DataFrame, stats: DataFrame, groupCols: Seq[String]): DataFrame = {
    val cond = groupCols.map(c => df(c) <=> stats(c)).reduce(_ && _)
    groupCols.foldLeft(df.join(broadcast(stats), cond))((acc, c) => acc.drop(stats(c)))
  }

  /** Append `{outCol}` = (value − μ_group) / σ_group (sample stddev).
    * A constant group (σ = 0) scales to 0, not NaN; null values stay null;
    * null group keys form their own group (never dropped).
    */
  def standardize(df: DataFrame, valueCol: String, groupCols: Seq[String],
      outCol: String = "z"): DataFrame = {
    val stats = df.groupBy(groupCols.map(col): _*)
      .agg(avg(col(valueCol)).as("__mu"), stddev_samp(col(valueCol)).as("__sd"))
    joinStats(df, stats, groupCols)
      .withColumn(outCol,
        when(col("__sd") > 0, (col(valueCol) - col("__mu")) / col("__sd"))
          .otherwise(when(col(valueCol).isNotNull, lit(0.0))))
      .drop("__mu", "__sd")
  }

  /** Append `{outCol}` = (value − min_group) / (max_group − min_group) in
    * [0, 1]; a constant group maps to 0, nulls stay null, null group keys
    * form their own group.
    */
  def minMax(df: DataFrame, valueCol: String, groupCols: Seq[String],
      outCol: String = "mm"): DataFrame = {
    val stats = df.groupBy(groupCols.map(col): _*)
      .agg(min(col(valueCol)).as("__mn"), max(col(valueCol)).as("__mx"))
    joinStats(df, stats, groupCols)
      .withColumn(outCol,
        when(col("__mx") > col("__mn"), (col(valueCol) - col("__mn")) / (col("__mx") - col("__mn")))
          .otherwise(when(col(valueCol).isNotNull, lit(0.0))))
      .drop("__mn", "__mx")
  }

  /** Equi-depth (quantile) binning: append `{outCol}` = which of the
    * `probs.size + 1` per-group quantile buckets the value falls in
    * (1-based; bin b means `q_{b-1} < value ≤ q_b` with exact
    * interpolated boundaries, the discretization step feeding
    * embedding/bucketized features). Same scale shape as [[standardize]]:
    * one partial-agg shuffle for the boundary frame, broadcast back,
    * map-only assignment. The bin is computed by COUNTING boundaries at
    * or above the value — identical comparison semantics replay in SQL,
    * and a boundary that differs in its last ulp between engines cannot
    * flip any row's bin because interpolated boundaries never separate
    * two equal data values. Null values get a null bin; null group keys
    * form their own group.
    */
  def quantileBins(df: DataFrame, valueCol: String, groupCols: Seq[String],
      probs: Seq[Double], outCol: String = "bin"): DataFrame = {
    require(probs.nonEmpty && probs == probs.sorted && probs.forall(p => p > 0 && p < 1),
      s"probs must be sorted interior probabilities, got $probs")
    // edges on a fixed 6-dp grid: engines associate quantile interpolation
    // differently and a last-ulp edge difference can flip a row that sits
    // exactly on the interpolated value (see Drift.binnedShares — observed
    // there at sf0.1); the rounded edge is bit-identical across engines.
    // Tiny-domain guard (same as Drift.binnedShares): groups whose edges
    // all sit below 1e-4 in magnitude keep exact edges — the 6-dp grid
    // would otherwise collapse them into a single degenerate bin.
    val stats = df.groupBy(groupCols.map(col): _*)
      .agg(expr(s"percentile($valueCol, array(${probs.mkString("D,")}D))").as("__raw"))
      .withColumn("__qs", expr(
        "CASE WHEN round(aggregate(__raw, 0D, (a, x) -> greatest(a, abs(x))) + 1e-9, 6) < 1e-4 " +
          "THEN __raw ELSE transform(__raw, e -> round(e + 1e-9, 6)) END"))
      .drop("__raw")
    joinStats(df, stats, groupCols)
      .withColumn(outCol,
        when(col(valueCol).isNotNull,
          (lit(probs.size + 1) - expr(s"size(filter(__qs, q -> $valueCol <= q))")).cast("int")))
      .drop("__qs")
  }

  /** Oracle-friendly rounded projection helper. */
  def rounded(c: String, scale: Int = 4) = Fns.epsRound(col(c), scale).as(c)
}
