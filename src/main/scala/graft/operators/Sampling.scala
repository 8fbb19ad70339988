package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-assembly sampling for training pipelines (SURVEY.md §2 H gap —
  * the reference has no sampling surface at all; these are the two shapes a
  * corpus build actually needs).
  *
  * Both are deterministic pure arithmetic — reproducible across runs,
  * engines, and partitionings (no rand()), and replayable by the SQL
  * oracle. Both are map-only or one-window: no operation here shuffles more
  * than once, so they hold at any corpus size.
  */
object Sampling {

  /** Deterministic train/val/test assignment via multiplicative hashing of
    * a numeric id (Knuth's 2654435761 multiplier). Map-only: each row's
    * split is a pure function of its id, so the assignment is stable under
    * re-partitioning, incremental appends, and engine changes — the
    * property that makes the split safe to recompute instead of
    * materialize.
    *
    * The bucket is the HIGH bits of (id * K) mod 2^31, not the product
    * mod 100: without an intermediate power-of-two wrap, (id*K) mod 100
    * collapses to a function of id % 100 (any id stride of 100 lands every
    * row in one split), and low LCG bits are weak anyway. The id is
    * reduced mod 2^31 first so the product stays below 2^63 — no ANSI-mode
    * ARITHMETIC_OVERFLOW for 64-bit snowflake-style ids.
    */
  // backquote interpolated identifiers (the sq8Encode rule): every SQL
  // fragment below splices a caller-supplied column name
  private def bq(c: String): String = "`" + c.replace("`", "``") + "`"

  /** The shared 0..99 bucket both [[withSplit]] and [[domainMix]] key on —
    * one definition makes their documented consistency structural. */
  private def hashBucket(idCol: String) = expr(
    s"pmod(pmod(cast(${bq(idCol)} as bigint), 2147483648) * 2654435761, 2147483648) div 21474837")

  def withSplit(df: DataFrame, idCol: String, trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    // null ids hash to NULL, which matches NEITHER when() branch and would
    // fall through to 'test' — silently concentrating every malformed row
    // in exactly the split used for evaluation. Route them to 'train'
    // instead (the split that tolerates noise best), deterministically.
    val bucket = coalesce(hashBucket(idCol), lit(0))
    df.withColumn("split",
      when(bucket < trainPct, lit("train"))
        .when(bucket < trainPct + valPct, lit("val"))
        .otherwise(lit("test")))
  }

  /** Domain-mixture sampling: assemble a training mix by keeping a target
    * PERCENTAGE of each domain/source ("60% web, 30% code, 10% books"),
    * decided per row by the same multiplicative id hash as [[withSplit]] —
    * deterministic, partition-stable, replayable by the SQL oracle, and
    * composable with it (the split hash uses the identical bucket, so a
    * row's split assignment survives the mixture pass; use a different
    * hash seed column if independence matters).
    *
    * Map-only at any scale: the weights broadcast as a literal CASE (a
    * mixture spec is a handful of domains, never data-sized), each row is
    * kept or dropped where it lives, and no shuffle occurs. Sources absent
    * from `pctBySource` are dropped — the mixture is the explicit contract
    * of what the corpus contains.
    */
  def domainMix(df: DataFrame, sourceCol: String, idCol: String,
      pctBySource: Map[String, Int]): DataFrame = {
    require(pctBySource.values.forall(p => p >= 0 && p <= 100),
      s"per-source percentages must be 0..100: $pctBySource")
    val pct = pctBySource.foldLeft(lit(-1)) { case (acc, (src, p)) =>
      when(col(sourceCol) === src, lit(p)).otherwise(acc)
    }
    df.where(hashBucket(idCol) < pct)
  }

  /** Temperature-scaled group rebalancing (the multilingual-corpus mixing
    * rule of mBERT/XLM-R: sample languages ∝ p^(1/T)): downsample each
    * group so the kept distribution approaches p^(1/T) renormalized, with
    * the SMALLEST group kept at 100% (pure downsampling, no duplication).
    * keep(g) = (n_g / n_min)^(1/T − 1) — T=1 keeps everything (natural
    * proportions need no rebalancing), larger T flattens toward uniform.
    *
    * Group counts are one tiny agg (rows ∝ groups) collected to the driver
    * and folded into [[domainMix]]'s literal-CASE integer percents (floor
    * x+0.5 with an epsilon, so the SQL oracle reproduces the thresholds
    * digit-for-digit); the row filter is the same map-only deterministic
    * id hash. Two passes over the data, zero shuffles of it.
    */
  def temperatureMix(df: DataFrame, groupCol: String, idCol: String,
      temperature: Double): DataFrame = {
    require(temperature >= 1.0, s"temperature must be >= 1 (downsampling-only), got $temperature")
    require(df.schema(groupCol).dataType == org.apache.spark.sql.types.StringType,
      s"groupCol '$groupCol' must be a string column (the literal-CASE match is string-typed)")
    // null group keys are DROPPED, same contract as domainMix's unlisted
    // sources — the mixture spec enumerates what the corpus contains
    val counts = df.groupBy(groupCol).count().collect()
      .filterNot(_.isNullAt(0))
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    require(counts.nonEmpty, "temperatureMix on an empty frame")
    val nMin = counts.values.min.toDouble
    // floor at 1%: a keep fraction under 0.5% would round to pct = 0 and
    // ELIMINATE the group entirely (at T=2 any group >~40000x the smallest
    // hits this) — temperature mixing downsamples, it never deletes a
    // group from the corpus
    val pctByGroup = counts.map { case (g, n) =>
      g -> math.max(1,
        math.floor(100.0 * math.pow(n / nMin, 1.0 / temperature - 1.0) + 0.5 + 1e-9).toInt)
    }
    domainMix(df, groupCol, idCol, pctByGroup)
  }

  /** Token-budget corpus selection: keep documents, in deterministic hash
    * order, until each source's cumulative token count reaches the budget —
    * the "sample ~N tokens per domain" step that turns a mixture SPEC
    * (fractions from [[domainMix]]/[[temperatureMix]]) into a token-count
    * CONTRACT, which is what a training run actually consumes.
    *
    * Order within a source is the shared multiplicative id hash (bucket,
    * then id) — a deterministic pre-shuffle, so the selection is
    * reproducible across runs/engines/partitionings and biased by nothing
    * (hash order is independent of document length or position). A doc is
    * kept iff the cumulative tokens of docs BEFORE it (hash order) are
    * < budget: "take until you have enough" — the doc that crosses the
    * line is kept, overshoot is at most one document.
    *
    * One window per source, PARTITIONED on the source key (never a global
    * sort): each source's running sum sorts only its own rows, so the
    * operator holds when sources are numerous and individually bounded.
    * Output adds `cum_tokens` (including the current doc) — the audit
    * column a corpus manifest records.
    */
  def tokenBudget(df: DataFrame, sourceCol: String, idCol: String,
      nTokensCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    // order by the FULL 31-bit hash (uniformSample's key), not the coarse
    // 0..99 bucket: with the bucket, the boundary bucket is cut in raw-id
    // order, and for monotone ids that means "the oldest documents" — a
    // temporal bias this operator's contract explicitly forbids
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(expr(
        s"pmod(pmod(cast(${bq(idCol)} as bigint), 2147483648) * 2654435761, 2147483648)").asc,
        col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__before", coalesce(sum(col(nTokensCol)).over(w), lit(0L)))
      .where(col("__before") < budget)
      .withColumn("cum_tokens", col("__before") + col(nTokensCol))
      .drop("__before")
  }

  /** Uniform k-per-group sample WITHOUT replacement: the k members with
    * the smallest multiplicative id hash (full 31-bit value — not the
    * coarse 0..99 bucket — with id tie-break). The bottom-k-by-hash
    * sketch (the KMV idea applied to sampling): deterministic and
    * partition-stable like everything in this object, and
    * append-monotone — a new row displaces at most the largest-hash
    * survivor of its group, never reshuffles the rest, so periodic
    * re-runs over a growing corpus produce stable samples. One
    * group-keyed window; at 100 TB this is [[stratifiedTopK]]'s shape
    * with the hash as the score.
    */
  def uniformSample(df: DataFrame, groupCol: String, idCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val h = expr(
      s"pmod(pmod(cast(${bq(idCol)} as bigint), 2147483648) * 2654435761, 2147483648)")
    val w = Window.partitionBy(col(groupCol)).orderBy(h.asc, col(idCol).asc)
    df.withColumn("sample_rank", row_number().over(w).cast("long"))
      .where(col("sample_rank") <= k)
  }

  /** Weight-proportional k-per-group sample without replacement: priority
    * sampling (Duffield, Lund & Thorup, JACM 2007) with the deterministic
    * id hash standing in for the uniform draw. Each row gets priority
    * `w · 2³¹ div (h + 1)` where `h` is the 31-bit multiplicative id hash
    * — the integer-arithmetic form of `w / u`, `u ∈ (0, 1]` — and the k
    * LARGEST priorities per group win (heavier rows need a smaller hash to
    * lose, so inclusion probability grows with weight). All arithmetic is
    * exact bigint — no float `pow`/`log` whose last-ulp behavior could
    * differ across engines — so an oracle replays the selection
    * digit-for-digit. Same one-window shape as [[uniformSample]]; weights
    * must be positive integers.
    */
  def prioritySample(df: DataFrame, groupCol: String, idCol: String,
      weightCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    // the priority product weight * 2^31 overflows bigint at weight >= 2^32
    // (ANSI crash, or silently INVERTED ranking without ANSI), and zero/
    // negative weights make the "highest priority" contract meaningless —
    // enforce the documented positive bounded-integer domain up front
    val wc = df.schema(weightCol).dataType
    require(Seq(org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType).contains(wc),
      s"weightCol '$weightCol' must be an integral column, got ${wc.simpleString}")
    val badW = df.where(col(weightCol) <= 0 || col(weightCol) >= lit(4294967296L)).limit(1).count()
    require(badW == 0L,
      s"prioritySample weights must be in [1, 2^32): found out-of-range values in '$weightCol'")
    val pr = expr(
      s"""cast(${bq(weightCol)} as bigint) * 2147483648L div
         |  (pmod(pmod(cast(${bq(idCol)} as bigint), 2147483648) * 2654435761, 2147483648) + 1L)"""
        .stripMargin)
    val w = Window.partitionBy(col(groupCol)).orderBy(pr.desc, col(idCol).asc)
    df.withColumn("priority", pr)
      .withColumn("sample_rank", row_number().over(w).cast("long"))
      .where(col("sample_rank") <= k)
  }

  /** Epoch/repetition plan for a token budget (the data-constrained
    * scaling step after the mixture: Muennighoff et al. 2023 established
    * that ~4 epochs of repetition cost little, beyond that returns decay
    * fast): given per-document token counts, allocate a total training
    * budget across sources by temperature-scaled availability
    * (w_i ∝ n_i^(1/T), the mBERT/XLM-R sampling rule — T=1 is natural
    * proportions, larger T flattens toward uniform) and report, per
    * source, the tokens available, the budget share, and the EPOCHS the
    * share implies (target/available — >1 means repetition), flagging
    * sources past `maxHealthyEpochs`.
    *
    * Scale shape: one partial-agg shuffle over the source key (rows ∝
    * sources), a 1-row normalizer broadcast back, map-only arithmetic —
    * the whole plan is a sources-sized report off one corpus scan.
    */
  def epochPlan(df: DataFrame, sourceCol: String, nTokensCol: String,
      budget: Long, temperature: Double = 1.0,
      maxHealthyEpochs: Double = 4.0): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(temperature >= 1.0, s"temperature must be >= 1, got $temperature")
    val counts = df
      .where(col(sourceCol).isNotNull) // the plan enumerates known sources
      .groupBy(col(sourceCol))
      .agg(sum(col(nTokensCol).cast("double")).as("n_tokens"))
      .where(col("n_tokens") > 0)
    val norm = counts.agg(
      sum(pow(col("n_tokens"), lit(1.0 / temperature))).as("__z"))
    counts.crossJoin(broadcast(norm))
      .withColumn("weight",
        graft.functions.Fns.epsRound(
          pow(col("n_tokens"), lit(1.0 / temperature)) / col("__z"), 6))
      .withColumn("target_tokens",
        floor(lit(budget.toDouble) *
          pow(col("n_tokens"), lit(1.0 / temperature)) / col("__z") + 0.5 + 1e-9)
          .cast("long"))
      .withColumn("epochs",
        graft.functions.Fns.epsRound(
          col("target_tokens").cast("double") / col("n_tokens"), 6))
      .withColumn("over_repeated", col("epochs") > maxHealthyEpochs)
      .select(col(sourceCol), col("n_tokens").cast("long").as("n_tokens"),
        col("weight"), col("target_tokens"), col("epochs"), col("over_repeated"))
  }

  /** Stratified top-k: the k best rows per stratum by a score column
    * (quality-filtered corpus assembly: "keep the best N documents per
    * language"). One shuffle on the stratum key; the window's rank is
    * computed within each partition after a single sort.
    */
  def stratifiedTopK(
      df: DataFrame,
      stratumCol: String,
      scoreCol: String,
      tieCol: String,
      k: Int): DataFrame = {
    val w = Window.partitionBy(col(stratumCol)).orderBy(col(scoreCol).desc, col(tieCol).asc)
    df.withColumn("rank", row_number().over(w).cast("long")).where(col("rank") <= k)
  }
}
