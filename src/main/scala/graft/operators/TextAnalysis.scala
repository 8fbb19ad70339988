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
}
