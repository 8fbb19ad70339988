package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Fns

/** Text analysis for training-data pipelines (SURVEY.md §2 G3): per-doc
  * stats, quality scoring, language-ID heuristic, fingerprinting. All
  * built-in codegen'd expressions — no UDFs — so the whole stage fuses into
  * the scan.
  */
object TextAnalysis {

  private val StopwordsEn =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that", "for", "on", "with", "as")

  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Per-doc descriptive stats. */
  def withStats(docs: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    docs
      .withColumn("n_chars_calc", length(t))
      .withColumn("n_tokens", Fns.tokenCount(t))
      .withColumn("n_stopwords",
        size(filter(toks, w => array_contains(array(StopwordsEn.map(lit): _*), w))))
      .withColumn("avg_token_len",
        when(col("n_tokens") > 0, length(t).cast("double") / col("n_tokens")).otherwise(lit(0.0)))
  }

  /** Quality score in [0,1]: rewards reasonable length, a healthy stopword
    * rate, and moderate token length. Pure arithmetic over the stats so the
    * same formula is expressible in ANSI SQL for the oracle.
    */
  def qualityScore(nTokens: Column, nStopwords: Column, avgTokenLen: Column): Column = {
    val lengthScore = least(lit(1.0), nTokens.cast("double") / lit(50.0))
    val stopRatio   = when(nTokens > 0, nStopwords.cast("double") / nTokens).otherwise(lit(0.0))
    val stopScore   = least(lit(1.0), stopRatio * lit(5.0))
    val lenScore    = least(lit(1.0), avgTokenLen / lit(8.0))
    // +1e-9 before rounding: the weighted sum can land exactly on a .00005
    // boundary, where Spark (BigDecimal-exact HALF_UP) and DuckDB
    // (std::round of the scaled double) disagree; the epsilon pushes both
    // engines to the same side (oracle SQL applies the same epsilon)
    round(lengthScore * lit(0.4) + stopScore * lit(0.3) + lenScore * lit(0.3) + lit(1e-9), 4)
  }

  /** n-gram/stopword language-ID heuristic: score each language's stopword
    * dictionary by hit count over the tokens; argmax wins, 'und' when no
    * dictionary hits. (Rows-only check — dictionaries are engine-internal.)
    */
  def langId(text: Column): Column = {
    val dicts: Seq[(String, Seq[String])] = Seq(
      "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "with", "for"),
      "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
      "fr" -> Seq("le", "la", "les", "et", "est", "dans", "pour", "que", "une", "des"),
      "es" -> Seq("el", "la", "los", "y", "es", "en", "que", "por", "una", "con")
    )
    val toks = tokens(lower(text))
    val scored = dicts.map { case (lang, words) =>
      struct(size(filter(toks, w => array_contains(array(words.map(lit): _*), w))).as("score"), lit(lang).as("lang"))
    }
    val best = greatest(scored: _*)
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Rolling document fingerprint over normalized tokens:
    * fp = fold(tokens, h -> xxhash64(h, token)) — order-sensitive (unlike a
    * bag hash), one pass, and overflow-free under ANSI mode (a polynomial
    * h*31+x fold would throw ARITHMETIC_OVERFLOW on Spark 4 defaults).
    */
  def rollingFingerprint(text: Column): Column =
    aggregate(
      tokens(lower(trim(text))),
      lit(0L),
      (acc, t) => xxhash64(acc, t)
    )

  // ---- PHI/PII scrubbing (D2 taken to the text level: the reference masks
  // whole columns by phi_level, feature_registry.py:139; free-text features
  // need in-band redaction before they can feed a training corpus) ---------

  /** Structured-identifier patterns, most-specific first (SSN before the
    * generic phone shape so 123-45-6789 isn't half-eaten by the phone rule).
    * Kept to syntax shared by Java regex and RE2 (\b, \d, alternation) so
    * the DuckDB oracle replays them verbatim.
    */
  val PhiPatterns: Seq[String] = Seq(
    "\\b\\d{3}-\\d{2}-\\d{4}\\b",                         // SSN
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",    // email
    "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b",                   // US phone
    "\\bMRN[-: ]?\\d{6,10}\\b"                            // medical record number
  )

  /** Redact structured identifiers and denylisted terms from a text column.
    * A chain of regexp_replace stays inside whole-stage codegen (each link
    * is a compiled-once Java Pattern per task) and scales per-row with no
    * shuffle — scrubbing 100 TB is a map-only pass.
    *
    * @param denylist terms redacted on word boundaries (dictionary
    *   redaction: facility names, project codenames, known identifiers).
    *   Terms must be plain words — they're spliced into an alternation, NOT
    *   regex-escaped (Pattern.quote's \Q..\E would break the RE2 oracle).
    */
  def scrub(
      text: Column,
      replacement: String = "[REDACTED]",
      patterns: Seq[String] = PhiPatterns,
      denylist: Seq[String] = Seq.empty): Column = {
    val withDeny =
      if (denylist.isEmpty) patterns
      else patterns :+ denylist.mkString("\\b(", "|", ")\\b")
    withDeny.foldLeft(text)((c, p) => regexp_replace(c, p, replacement))
  }

  /** Context-window chunking (sequence packing): split each document into
    * `size`-token windows starting every `stride` tokens — the step that
    * turns a cleaned corpus into training examples. Map-only (pure per-row
    * arithmetic + posexplode, no shuffle, no UDF), deterministic, and the
    * ragged tail window is KEPT with its true `n_tokens` so the caller
    * chooses pad-vs-drop. `stride < size` gives overlapping windows;
    * `stride == size` packs disjointly. Windows per doc =
    * `1 + ceil(max(len - size, 0) / stride)` — a doc shorter than `size`
    * yields exactly its one (short) window.
    */
  def chunkWindows(docs: DataFrame, idCol: String, textCol: String,
      size: Int, stride: Int): DataFrame = {
    require(size >= 1 && stride >= 1, s"size/stride must be positive: $size/$stride")
    docs.select(col(idCol), tokens(col(textCol)).as("__t"))
      .where(org.apache.spark.sql.functions.size(col("__t")) >= 1)
      .select(col(idCol), posexplode(expr(
        // sequence stop = ceil(max(len-size,0)/stride) via (x+stride-1) div stride;
        // always >= 0, so the sequence is never descending
        s"""transform(
           |  sequence(0, (greatest(size(__t) - $size, 0) + ${stride - 1}) div $stride),
           |  i -> slice(__t, 1 + i * $stride, $size))""".stripMargin)))
      .select(col(idCol),
        col("pos").cast("long").as("chunk_idx"),
        org.apache.spark.sql.functions.size(col("col")).cast("long").as("n_tokens"),
        array_join(col("col"), " ").as("chunk"))
  }

  /** Concatenate-and-pack: the pretraining step that turns a deduped corpus
    * into fixed-`capacity` training sequences. Documents are laid end-to-end
    * in `idCol` order into one global token stream, which is cut into
    * consecutive windows of `capacity` tokens; a document belongs to every
    * window its tokens fall into (documents crossing a boundary are split,
    * GPT-style — contrast [[chunkWindows]], which windows each doc
    * independently and leaves ragged tails). Output: one row per
    * (window, doc) overlap — `(chunk_id, doc_id, begin_tok, end_tok,
    * n_tokens)`, begin/end doc-relative (`[begin_tok, end_tok)` within the
    * doc's own tokens), so `sum(n_tokens)` grouped by doc returns each
    * doc's full length and every chunk except the global tail holds exactly
    * `capacity` tokens.
    *
    * Scale shape — a DISTRIBUTED PREFIX SUM, not a one-partition window:
    * one range shuffle puts docs in id order; per-partition token subtotals
    * (one row per partition) come to the driver and return as a broadcast
    * literal map of partition offsets; each doc's global start is its
    * partition offset plus an intra-partition running sum (window keyed by
    * the partition id, so every partition scans independently). No global
    * single-task sort, no data rows on the driver — the two-pass scan a
    * 1000-executor cumsum uses. The chunk fan-out after that is map-only
    * arithmetic (`sequence` + `explode`).
    */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
      capacity: Int, numPartitions: Int = 0): DataFrame = {
    require(capacity >= 1, s"capacity must be positive, got $capacity")
    val spark = docs.sparkSession
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val cap = lit(capacity.toLong)

    // (id, token count) only — the packing never shuffles or pins the text
    val counted = docs
      .select(col(idCol), org.apache.spark.sql.functions.size(tokens(col(textCol)))
        .cast("long").as("__n"))
      .where(col("__n") >= 1)
      .repartitionByRange(parts, col(idCol))
      .sortWithinPartitions(idCol)
      .withColumn("__pid", spark_partition_id())
      // pin the partition assignment: the subtotal pass below and the
      // window pass must see the SAME __pid per row (range partitioning
      // samples bounds, so a recompute is not guaranteed identical)
      .localCheckpoint()

    // pass 1: per-partition subtotals -> exclusive offsets (driver holds
    // `parts` longs, never data rows)
    val subtotals = counted.groupBy("__pid").agg(sum("__n").as("__s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets: Map[Int, Long] = {
      var acc = 0L
      subtotals.keys.toSeq.sorted.map { pid =>
        val off = acc; acc += subtotals(pid); pid -> off
      }.toMap
    }

    // pass 2: global start = partition offset + intra-partition running sum
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__pid").orderBy(idCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val withStart = counted.withColumn("__start",
      coalesce(sum(col("__n")).over(w), lit(0L)) +
        element_at(typedlit(offsets), col("__pid")))

    // map-only fan-out: every chunk index this doc's token span touches
    withStart
      .select(col(idCol), col("__n"), col("__start"),
        // integer `div`, not floor(a/b): double division would round above
        // 2^53 tokens, and the token stream is exactly where that matters
        explode(sequence(
          expr(s"__start div ${capacity}L"),
          expr(s"(__start + __n - 1) div ${capacity}L"))).as("chunk_id"))
      .select(
        col("chunk_id"),
        col(idCol),
        greatest(col("chunk_id") * cap - col("__start"), lit(0L)).as("begin_tok"),
        least((col("chunk_id") + lit(1L)) * cap - col("__start"), col("__n")).as("end_tok"))
      .withColumn("n_tokens", col("end_tok") - col("begin_tok"))
  }
}
