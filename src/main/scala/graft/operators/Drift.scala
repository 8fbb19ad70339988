package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Fns

/** Distribution-drift monitoring between a reference window and a current
  * window of the same feature — the check a feature platform runs before
  * every training set is cut and on every serving day (the reference keeps
  * per-feature freshness; drift is the value-level counterpart over its
  * event-shaped fact rows, feature_registry.py:181-198).
  *
  * Both statistics share one binning pass: the REFERENCE window's exact
  * per-group quantiles define `nBins` equi-depth bin edges, both windows
  * are counted into those bins, and counts are Laplace-smoothed
  * (`(n_b + 0.5) / (N + 0.5·B)`) so an empty bin never produces a
  * log-of-zero. PSI is the symmetric KL-style sum
  * `Σ (p_b − q_b)·ln(p_b/q_b)`; the binned KS statistic is
  * `max_b |CDF_ref(b) − CDF_cur(b)|` over the same bins.
  *
  * Scale shape: the edge frame is one partial-agg shuffle whose rows grow
  * with GROUPS (not data) and broadcasts back; bin assignment is map-only;
  * the count frame is `groups × nBins` rows. The only window function runs
  * over those `nBins` rows per group — never over the raw data. 100 TB of
  * events drifts-checks in two scans and two tiny shuffles.
  */
object Drift {

  /** Per (group, bin) smoothed shares of the reference (`p`) and current
    * (`q`) windows, on a DENSE bin grid (absent bins count 0, so the
    * smoothing sees every bin). Bin edges are the reference's exact
    * interpolated `(1..nBins-1)/nBins` quantiles; bin `b` means
    * `q_{b-1} < value ≤ q_b` (counting comparisons, same convention as
    * [[Scaling.quantileBins]] — an edge differing in its last ulp between
    * engines cannot flip a row's bin because interpolated edges never
    * separate equal data values).
    */
  def binnedShares(ref: DataFrame, cur: DataFrame, valueCol: String,
      groupCols: Seq[String], nBins: Int): DataFrame = {
    require(nBins >= 2, s"need at least 2 bins, got $nBins")
    val probs = (1 until nBins).map(i => i.toDouble / nBins)
    // edges rounded to a fixed 6-dp grid (with the repo's standard +1e-9
    // nudge): engines associate the interpolation arithmetic differently
    // (a + f·(b−a) vs a·(1−f) + f·b), and a last-ulp edge difference CAN
    // flip a row whose value the interpolation lands exactly on — observed
    // at sf0.1, one flipped row moved PSI by 1e-4. On the decimal grid the
    // edge is bit-identical across engines unless the unrounded values
    // straddle a rounding boundary within ~1e-13 (vanishing, vs certain
    // over enough data for the raw-ulp case). GUARD: when every edge sits
    // below 1e-4 in magnitude (normalized rates, tiny ratios) the 6-dp grid
    // would collapse all edges to one point and PSI would silently report
    // ~0 drift — those groups keep their exact interpolated edges instead
    // (per-group decision, so an oracle replays it deterministically; the
    // guard value is itself snapped to the 6-dp grid before comparing, so
    // the BRANCH CHOICE cannot straddle a cross-engine ulp either — same
    // vanishing-probability class as the edge rounding above).
    // backquote the interpolated identifier (the sq8Encode rule)
    val vq = "`" + valueCol.replace("`", "``") + "`"
    val edges = ref.groupBy(groupCols.map(col): _*)
      .agg(expr(s"percentile($vq, array(${probs.mkString("D,")}D))").as("__raw"))
      .withColumn("__qs", expr(
        "CASE WHEN round(aggregate(__raw, 0D, (a, x) -> greatest(a, abs(x))) + 1e-9, 6) < 1e-4 " +
          "THEN __raw ELSE transform(__raw, e -> round(e + 1e-9, 6)) END"))
      .drop("__raw")

    def binned(df: DataFrame): DataFrame = {
      val cond = groupCols.map(c => df(c) <=> edges(c)).reduce(_ && _)
      groupCols.foldLeft(df.join(broadcast(edges), cond))((acc, c) => acc.drop(edges(c)))
        .withColumn("bin",
          (lit(nBins) - expr(s"size(filter(__qs, q -> $vq <= q))")).cast("int"))
        .groupBy((groupCols.map(col) :+ col("bin")): _*)
        .agg(count(lit(1)).as("__n"))
    }
    val refCounts = binned(ref)
    val curCounts = binned(cur)

    // dense grid: every (group, bin) cell exists even when neither window
    // landed a row in it — smoothing must see all B bins or the shares
    // stop summing to 1
    val grid = edges.select(groupCols.map(col) :+
      explode(sequence(lit(1), lit(nBins))).as("bin"): _*)
    def gridJoin(g: DataFrame, c: DataFrame, as: String): DataFrame = {
      val cond = (groupCols.map(cc => g(cc) <=> c(cc)) :+ (g("bin") === c("bin"))).reduce(_ && _)
      (groupCols :+ "bin").foldLeft(g.join(c, cond, "left"))((acc, cc) => acc.drop(c(cc)))
        .withColumn(as, coalesce(col("__n"), lit(0L))).drop("__n")
    }
    val cells = gridJoin(gridJoin(grid, refCounts, "n_ref"), curCounts, "n_cur")

    val w = Window.partitionBy(groupCols.map(col): _*)
    cells
      .withColumn("p", (col("n_ref") + lit(0.5)) / (sum("n_ref").over(w) + lit(0.5 * nBins)))
      .withColumn("q", (col("n_cur") + lit(0.5)) / (sum("n_cur").over(w) + lit(0.5 * nBins)))
  }

  /** Population stability index per group: `Σ_b (p_b − q_b)·ln(p_b/q_b)`.
    * Conventional reading: <0.1 stable, 0.1–0.25 moderate, >0.25 drifted.
    */
  def psi(ref: DataFrame, cur: DataFrame, valueCol: String,
      groupCols: Seq[String], nBins: Int = 10): DataFrame =
    binnedShares(ref, cur, valueCol, groupCols, nBins)
      .groupBy(groupCols.map(col): _*)
      .agg(sum((col("p") - col("q")) * log(col("p") / col("q"))).as("psi"))

  /** Binned two-sample Kolmogorov–Smirnov statistic per group:
    * `max_b |Σ_{i≤b} p_i − Σ_{i≤b} q_i|`. The cumulative runs over the
    * B-row bin frame (window partitioned by group, ordered by bin), never
    * over raw data.
    */
  def ksStat(ref: DataFrame, cur: DataFrame, valueCol: String,
      groupCols: Seq[String], nBins: Int = 10): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    binnedShares(ref, cur, valueCol, groupCols, nBins)
      .withColumn("__d", abs(sum("p").over(w) - sum("q").over(w)))
      .groupBy(groupCols.map(col): _*)
      .agg(max(col("__d")).as("ks"))
  }
}
