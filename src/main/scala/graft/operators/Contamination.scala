package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora (SURVEY.md §2 G1/G3
  * family): flag or drop corpus documents sharing a word n-gram
  * (case-insensitively — matching normalizes to lowercase, as the
  * published decontamination recipes do) with an evaluation/benchmark
  * set — the standard leakage guard an LLM data pipeline runs before
  * training (GPT-3 used 13-grams, PaLM 8-grams; the mechanism is
  * identical, only `n` differs).
  *
  * 100 TB shape: the corpus side is map-only n-gram generation fused into
  * the scan (split → transform/slice, all codegen'd builtins, no UDF); the
  * benchmark side is tiny by nature (eval sets are thousands of docs, not
  * billions), so its distinct gram set BROADCASTS and the containment
  * check is a broadcast hash join — the corpus never shuffles to discover
  * contamination. The only corpus-keyed shuffle is the final per-doc
  * aggregate over MATCHED rows (post-filter, usually a vanishing fraction
  * of the corpus). Flagging 100 TB costs one scan.
  */
object Contamination {

  /** The per-row gram array over the projected token column `__t` (one
    * gram per position, in order). */
  private def gramArray(n: Int) = expr(
    s"transform(sequence(1, size(__t) - ${n - 1}), i -> array_join(slice(__t, i, $n), ' '))")

  private def tokenized(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    require(n >= 1, s"n-gram size must be positive, got $n")
    // tokens() is empty-safe (no phantom "" tokens), so a blank or
    // whitespace-only doc yields 0 tokens and dies on size >= n; the trim
    // test is just a cheap prefilter
    df.where(length(trim(col(textCol))) > 0)
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__t"))
      .where(size(col("__t")) >= n)
  }

  // contamination MATCHING is case-insensitive (GPT-3/PaLM-style
  // decontamination normalizes before gram comparison): benchmark text
  // differing from a corpus doc only in case is still leakage. Applied at
  // the matching boundary only — boilerplate/repetition keep exact-text
  // gram semantics (they measure the corpus, not cross-set identity).
  private def caseFolded(df: DataFrame, textCol: String): DataFrame =
    df.withColumn(textCol, lower(col(textCol)))

  /** Word n-grams per row: one (id, gram) row per position. Tokenization
    * is the engine-wide whitespace convention (TextAnalysis.tokens); the
    * token array is hoisted into a projected column BEFORE the lambda so
    * Catalyst doesn't re-split per position (no cross-lambda CSE).
    * Rows with fewer than `n` tokens produce no grams (and `sequence` is
    * never called with a descending range, which would silently generate
    * backwards).
    */
  def ngrams(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    tokenized(df, idCol, textCol, n)
      .select(col(idCol), explode(gramArray(n)).as("gram"))

  /** Contaminated corpus docs with their overlap strength: (idCol,
    * n_shared) where n_shared counts DISTINCT benchmark n-grams the doc
    * contains. Join-then-distinct: the broadcast join filters to matched
    * grams BEFORE the per-doc aggregate, so the shuffle only ever carries
    * contaminated rows.
    */
  def contaminationReport(corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    // the bench side only contributes its GRAM SET — don't force it to
    // carry the corpus's id column (an eval set with a differently-named
    // id would otherwise fail analysis on a column nothing uses)
    val benchGrams = ngrams(caseFolded(bench.select(col(textCol)), textCol)
        .withColumn("__bid", lit(0L)),
      "__bid", textCol, n).select(col("gram")).distinct()
    // per-doc distinct MAP-SIDE (array_distinct before the explode, the
    // same device as contaminationFlags/boilerplate): a doc repeating one
    // benchmark gram 1,000 times — looping generations — would otherwise
    // ship 1,000 identical post-join rows through the per-doc shuffle just
    // for countDistinct to discard them; with unique-per-doc grams a plain
    // count gives the identical n_shared
    tokenized(caseFolded(corpus, textCol), idCol, textCol, n)
      .select(col(idCol), explode(array_distinct(gramArray(n))).as("gram"))
      .join(broadcast(benchGrams), Seq("gram"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Contamination flags for EVERY corpus doc — the STREAMING-SAFE shape
    * of [[contaminationReport]]: distinct grams per doc map-side
    * (`array_distinct` before the explode, so rows already count distinct
    * grams), a sentinel `explode_outer` row so docs shorter than `n`
    * tokens — or with zero benchmark overlap — are KEPT with n_shared=0
    * (a filter must pass clean docs through, not drop them), then a
    * broadcast LEFT hash join against the benchmark gram set (the hash
    * table builds ONCE per executor, each gram probes O(1) — never an
    * array scan per row) and one count per doc. Applied to a `readStream`
    * corpus this is a supported stream-static left join + update-mode
    * aggregate — BUT the un-watermarked groupBy(id) retains one state row
    * per document id FOREVER (documents are atomic rows, yet Spark cannot
    * know an id will never recur), so the direct streaming form is for
    * bounded-id feeds and harness oracles only. The production on-ingest
    * shape is `foreachBatch` applying this as a BATCH per micro-batch
    * (what [[CorpusPrep.prepareCorpusSink]] does) — zero standing state.
    * Output: (idCol, n_shared, contaminated). A doc's rows must arrive
    * within one micro-batch (documents are atomic rows upstream, so they
    * do).
    */
  def contaminationFlags(corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    require(n >= 1, s"n-gram size must be positive, got $n")
    // gram-set only — no id coupling (same as contaminationReport), and
    // case-folded on both sides (matching is case-insensitive)
    val benchGrams = ngrams(caseFolded(bench.select(col(textCol)), textCol)
        .withColumn("__bid", lit(0L)),
      "__bid", textCol, n)
      .select(col("gram")).distinct().withColumn("__hit", lit(1))
    corpus
      .select(col(idCol), TextAnalysis.tokens(lower(col(textCol))).as("__t"))
      .select(col(idCol), explode_outer(
        when(size(col("__t")) >= n, array_distinct(gramArray(n)))
          .otherwise(expr("cast(array() as array<string>)"))).as("gram"))
      .join(broadcast(benchGrams), Seq("gram"), "left")
      .groupBy(col(idCol))
      .agg(count(col("__hit")).as("n_shared"))
      .select(col(idCol), col("n_shared"),
        (col("n_shared") > 0).cast("int").as("contaminated"))
  }

  /** The decontaminated corpus: input rows minus any doc sharing at least
    * one n-gram with the benchmark (anti-join on the flagged id set).
    * The anti-join is null-SAFE: a contaminated row with a NULL id must
    * die too — under plain equality NULL never matches NULL, so the row
    * would survive decontamination and ship benchmark leakage into
    * training data. */
  def decontaminate(corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame =
    corpus.join(
      contaminationReport(corpus, bench, idCol, textCol, n)
        .select(col(idCol).as("__contaminated_id")),
      col(idCol) <=> col("__contaminated_id"), "left_anti")

  /** Cross-corpus boilerplate (the C4-style rule): word n-grams occurring
    * in at least `minDocs` DISTINCT documents — headers, footers, license
    * blocks, navigation chrome. One shuffle on the gram key (the same
    * inverted-index shape as near-dup blocking, with map-side partial
    * aggregation); the caller typically anti-joins the result against the
    * corpus grams to scrub, or feeds it to the stop-shingle cap.
    */
  def boilerplate(docs: DataFrame, idCol: String, textCol: String,
      n: Int, minDocs: Long): DataFrame =
    tokenized(docs, idCol, textCol, n)
      // one vote per doc: array_distinct map-side kills within-doc repeats
      // before the explode, and the aggregate counts DISTINCT ids — not
      // rows — so a doc delivered twice (at-least-once sources) still
      // votes once, as the "minDocs DISTINCT documents" contract promises.
      // countDistinct costs a second exchange ((gram,id) partial-distinct,
      // then gram); the honest price of distinct-doc votes under
      // duplicate-row inputs
      .select(col(idCol), explode(array_distinct(gramArray(n))).as("gram"))
      .groupBy(col("gram"))
      .agg(countDistinct(col(idCol)).as("n_docs"))
      .where(col("n_docs") >= minDocs)

  /** Within-doc repetition (the Gopher-style quality rule): per doc, the
    * fraction of word n-gram POSITIONS whose gram already occurred in the
    * same doc — boilerplate and looping generations score high. Map-only
    * gram generation + one groupBy(doc) shuffle; rep_ratio rounds at 6 dp
    * (+1e-9 for cross-engine tie stability, the repo-wide convention).
    * Docs with fewer than `n` tokens emit no row (no grams to measure).
    */
  def repetitionReport(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    ngrams(docs, idCol, textCol, n)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"), countDistinct(col("gram")).as("n_distinct"))
      .withColumn("rep_ratio",
        graft.functions.Fns.epsRound(
          lit(1.0) - col("n_distinct").cast("double") / col("n_grams"), 6))
}
