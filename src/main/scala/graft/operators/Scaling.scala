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
    // backquote the interpolated identifier (the sq8Encode rule): this
    // method splices the column name into TWO SQL fragments, and a name
    // needing quoting must not silently parse as something else
    val vq = "`" + valueCol.replace("`", "``") + "`"
    // edges on a fixed 6-dp grid: engines associate quantile interpolation
    // differently and a last-ulp edge difference can flip a row that sits
    // exactly on the interpolated value (see Drift.binnedShares — observed
    // there at sf0.1); the rounded edge is bit-identical across engines.
    // Tiny-domain guard (same as Drift.binnedShares): groups whose edges
    // all sit below 1e-4 in magnitude keep exact edges — the 6-dp grid
    // would otherwise collapse them into a single degenerate bin.
    val stats = df.groupBy(groupCols.map(col): _*)
      .agg(expr(s"percentile($vq, array(${probs.mkString("D,")}D))").as("__raw"))
      .withColumn("__qs", expr(
        "CASE WHEN round(aggregate(__raw, 0D, (a, x) -> greatest(a, abs(x))) + 1e-9, 6) < 1e-4 " +
          "THEN __raw ELSE transform(__raw, e -> round(e + 1e-9, 6)) END"))
      .drop("__raw")
    joinStats(df, stats, groupCols)
      .withColumn(outCol,
        when(col(valueCol).isNotNull,
          (lit(probs.size + 1) - expr(s"size(filter(__qs, q -> $vq <= q))")).cast("int")))
      .drop("__qs")
  }

  /** Oracle-friendly rounded projection helper. */
  def rounded(c: String, scale: Int = 4) = Fns.epsRound(col(c), scale).as(c)

  /** Leave-one-out target encoding with additive smoothing — the
    * standard leakage-safe categorical→numeric encoder (Micci-Barreca
    * 2001): for a row with target t in a category holding (n, Σt),
    *
    * {{{ enc = (Σt − t + m·prior) / (n − 1 + m) }}}
    *
    * where prior is the GLOBAL target mean and m the smoothing
    * pseudo-count. Subtracting the row's own target keeps its label out
    * of its own feature (the leakage every naive mean-encoder ships);
    * smoothing pulls rare categories toward the prior and keeps
    * singleton categories total (n−1+m > 0 because m > 0 is required).
    * A row with a NULL target can leak nothing — it gets the full-group
    * posterior (Σt + m·prior)/(n + m). Null category keys form their own
    * group (never dropped), matching [[standardize]].
    *
    * Scale shape: one partial-agg shuffle over the category keys (rows ∝
    * categories) + a 1-row global aggregate, both broadcast back; the
    * encoding itself is map-only arithmetic — one pass at 100 TB.
    */
  def targetEncode(df: DataFrame, catCols: Seq[String], targetCol: String,
      outCol: String = "te", smoothing: Double = 10.0): DataFrame = {
    require(smoothing > 0, s"smoothing must be positive, got $smoothing")
    val t = col(targetCol).cast("double")
    val stats = df.groupBy(catCols.map(col): _*)
      .agg(sum(t).as("__ts"), count(t).as("__tn"))
    val prior = df.agg(avg(t).as("__prior"))
    val m = lit(smoothing)
    joinStats(df, stats, catCols)
      .crossJoin(broadcast(prior))
      .withColumn(outCol,
        when(t.isNotNull,
          (col("__ts") - t + m * col("__prior")) / (col("__tn") - 1 + m))
          .otherwise(
            (coalesce(col("__ts"), lit(0.0)) + m * col("__prior")) /
              (col("__tn") + m)))
      .drop("__ts", "__tn", "__prior")
  }

  /** Truncated exponentially-weighted moving average per partition:
    * the EWMA recurrence `e_i = α·x_i + (1−α)·e_{i−1}` restarted
    * `window − 1` rows back — i.e. a left fold over the trailing
    * `window`-row frame seeded with its oldest value. Truncation is what
    * makes the recurrence distributable (the exact EWMA is a full-prefix
    * scan); the error of dropping history beyond the frame is bounded by
    * (1−α)^(window−1), so pick `window` for the ε you need (α = 0.2,
    * window = 20 → ≤ 0.014 of the seed's weight). NULL values never
    * contribute; a row whose own value is null gets the EWMA of what the
    * frame does hold (null on an all-null frame).
    *
    * Scale shape: ONE partitioned bounded window (collect over the
    * trailing frame) + a map-only fold lambda — partitions are entity
    * keys, so parallelism is the entity count and no partition is
    * corpus-sized. No UDF, no driver state.
    */
  def ewma(df: DataFrame, valueCol: String, partitionCols: Seq[String],
      orderCols: Seq[String], alpha: Double, window: Int,
      outCol: String = "ewma"): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1], got $alpha")
    require(window >= 1, s"window must be >= 1, got $window")
    require(partitionCols.nonEmpty,
      "ewma needs partition columns — an unpartitioned window is a one-task global sort")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(partitionCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(-(window - 1), 0)
    df.withColumn("__l", collect_list(col(valueCol).cast("double")).over(w))
      .withColumn(outCol, expr(
        s"""CASE WHEN size(__l) > 0 THEN
           |  aggregate(slice(__l, 2, greatest(size(__l) - 1, 0)),
           |            element_at(__l, 1),
           |            (acc, x) -> $alpha * x + ${1.0 - alpha} * acc)
           |END""".stripMargin))
      .drop("__l")
  }
}
