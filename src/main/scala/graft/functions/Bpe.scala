package graft.functions

import org.apache.spark.sql.Column

/** Deterministic byte-pair encoding (Sennrich et al., ACL 2016 — the
  * subword scheme every production tokenizer descends from): greedy
  * highest-count pair merging at train time, ranked-merge application at
  * encode time. Replaces the `Fns.roughBpeCount` chars/4-style heuristic
  * with real subword counts — corpus budgets are denominated in tokenizer
  * tokens, not word counts.
  *
  * Design choices, pinned:
  *  - words are whitespace-pretokenized; merges NEVER cross a word
  *    boundary (no end-of-word marker — a word's last symbol merges like
  *    any other, which keeps decode = plain concatenation);
  *  - training ties break deterministically: highest pair count first,
  *    then lexicographic (a, b) — same corpus, same merges, any engine;
  *  - merges serialize in the public `merges.txt` line format ("a b" per
  *    line, rank = line order), so a table trained elsewhere drops in.
  *
  * Scale shape: the word-frequency table is computed DISTRIBUTED (one
  * groupBy over the corpus); training runs driver-side over that
  * dimension-scale table (same argument as k-means centroids — the
  * vocabulary is data-derived metadata, not data). Encoding is a native
  * codegen'd Catalyst expression ([[BpeEncodeWords]]/[[BpeTokenCount]]):
  * per-row work inside whole-stage codegen, no shuffle, no UDF boxing.
  */
object Bpe {

  /** Greedy BPE merges from a (word, frequency) table. Each iteration
    * merges the pair with the highest weighted count across all words
    * (ties: lexicographic smallest pair); stops early when no pair occurs
    * twice. O(numMerges × total symbols) — the affected-word index keeps
    * re-counting to words that actually contain the merged pair. */
  /** Initial symbols = Unicode CODE POINTS, not UTF-16 chars: splitting
    * chars would cut a non-BMP character (emoji, rare CJK) into two lone
    * surrogates, and a learned merge containing a lone surrogate does not
    * survive UTF-8 serialization (each becomes U+FFFD in merges.txt), so
    * the round-tripped table would silently encode differently. */
  private def symbolsOf(word: String): Array[String] =
    word.codePoints().toArray.map(cp => new String(Character.toChars(cp)))

  def train(wordFreqs: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    // symbol sequences, deterministic order (training must not depend on
    // the collect order of a distributed groupBy)
    var words: Array[(Array[String], Long)] = wordFreqs.toArray
      .sortBy(_._1)
      .map { case (w, f) => (symbolsOf(w), f) }
      .filter(_._1.length >= 2)

    val merges = Seq.newBuilder[(String, String)]
    var produced = 0
    while (produced < numMerges && words.nonEmpty) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) return merges.result()
      val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
      if (best._2 < 2) return merges.result() // nothing worth merging
      val (a, b) = best._1
      merges += ((a, b))
      produced += 1
      val joined = a + b
      words = words.map { case (syms, f) =>
        if (!syms.iterator.zip(syms.iterator.drop(1)).exists(p => p._1 == a && p._2 == b))
          (syms, f)
        else {
          val out = Array.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
              out += joined; i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.result(), f)
        }
      }.filter(_._1.length >= 2)
    }
    merges.result()
  }

  /** rank lookup for [[encodeWord]]. */
  def ranksOf(merges: Seq[(String, String)]): Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  /** Encode one whitespace-free word: repeatedly apply the LOWEST-ranked
    * merge present (all its occurrences, left to right) until no adjacent
    * pair is a known merge — the standard ranked-merge fixpoint. Decode is
    * concatenation (lossless by construction). */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): Seq[String] = {
    if (word.isEmpty) return Seq.empty
    var syms: Array[String] = symbolsOf(word)
    var done = false
    while (!done && syms.length >= 2) {
      var bestRank = Int.MaxValue
      var bestA: String = null
      var bestB: String = null
      var i = 0
      while (i < syms.length - 1) {
        ranks.get((syms(i), syms(i + 1))) match {
          case Some(r) if r < bestRank =>
            bestRank = r; bestA = syms(i); bestB = syms(i + 1)
          case _ => ()
        }
        i += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        val out = Array.newBuilder[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == bestA && syms(j + 1) == bestB) {
            out += (bestA + bestB); j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.result()
      }
    }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(syms)
  }

  /** Encode a document straight to Catalyst [[GenericArrayData]] (one
    * token array per whitespace word) — the eval/codegen core of
    * [[BpeEncodeWords]]. Public because whole-stage-generated Java calls
    * it through the static forwarder. */
  def encodeDocData(text: String, ranks: Map[(String, String), Int])
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    if (text == null) return new GenericArrayData(Array.empty[Any])
    val words = text.trim.split("\\s+").iterator.filter(_.nonEmpty)
    val out = words.map { w =>
      new GenericArrayData(
        encodeWord(w, ranks).iterator.map(s => UTF8String.fromString(s): Any).toArray)
    }.map(a => a: Any).toArray
    new GenericArrayData(out)
  }

  /** Total subword count of a document — the eval/codegen core of
    * [[BpeTokenCount]]. */
  def countTokens(text: String, ranks: Map[(String, String), Int]): Long = {
    if (text == null) return 0L
    text.trim.split("\\s+").iterator.filter(_.nonEmpty)
      .map(encodeWord(_, ranks).size.toLong).sum
  }

  /** The public `merges.txt` wire format: one "a b" line per merge, rank =
    * line order (the format GPT-2-lineage vocabularies publish). */
  def formatMerges(merges: Seq[(String, String)]): String =
    merges.map { case (a, b) => s"$a $b" }.mkString("\n")

  def parseMerges(text: String): Seq[(String, String)] =
    text.linesIterator.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val i = l.indexOf(' ')
        require(i > 0 && i < l.length - 1, s"malformed merges line: '$l'")
        (l.substring(0, i), l.substring(i + 1))
      }.toSeq

  /** Convenience for SQL use — routed through the native codegen'd
    * expression ([[BpeTokenCount]]), not a UDF. */
  def bpeCount(merges: Seq[(String, String)])(text: Column): Column =
    BpeExpressions.count(merges)(text)
}
