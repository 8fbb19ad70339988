package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Bpe

/** Pins the byte-pair encoder: deterministic training on the classic
  * word-frequency example, ranked-merge encoding semantics (lowest rank
  * first, fixpoint), losslessness, the merges.txt wire format, and the
  * no-merge degenerate cases.
  */
class BpeSpec extends AnyFunSuite {

  // Sennrich et al.'s running example vocabulary
  private val vocab = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  test("training is deterministic and greedy-by-count with lexicographic ties") {
    val merges = Bpe.train(vocab, numMerges = 4)
    // highest pair count first: (e,s) occurs 6+3=9 times; then (es,t) 9;
    // then the 7s: (l,o) 7 vs (o,w) 7 tie -> lexicographic (l,o) first
    assert(merges.take(4) == Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
    assert(Bpe.train(vocab, 4) == merges, "same input, same merges")
  }

  test("encoding applies merges by rank to a fixpoint; decode = concatenation") {
    val merges = Bpe.train(vocab, numMerges = 8)
    val ranks = Bpe.ranksOf(merges)
    for (w <- Seq("low", "lower", "newest", "widest", "lowest", "news", "w")) {
      val toks = Bpe.encodeWord(w, ranks)
      assert(toks.mkString("") == w, s"lossless for '$w': $toks")
      // fixpoint: no adjacent pair is still a known merge
      val unapplied = toks.zip(toks.drop(1)).filter(ranks.contains)
      assert(unapplied.isEmpty, s"'$w' left merges unapplied: $unapplied")
    }
    // a trained word encodes to few tokens; an unseen-alphabet word stays chars
    assert(Bpe.encodeWord("newest", ranks).size <= 2)
    assert(Bpe.encodeWord("xyz", ranks) == Seq("x", "y", "z"))
  }

  test("rank order matters: the LOWEST-ranked applicable merge wins first") {
    // merges: (a,b) rank 0, (b,c) rank 1 — on "abc" the rank-0 merge
    // consumes b, so (b,c) can never apply: [ab, c], not [a, bc]
    val ranks = Bpe.ranksOf(Seq(("a", "b"), ("b", "c")))
    assert(Bpe.encodeWord("abc", ranks) == Seq("ab", "c"))
    // reversed ranks flip the outcome
    val ranks2 = Bpe.ranksOf(Seq(("b", "c"), ("a", "b")))
    assert(Bpe.encodeWord("abc", ranks2) == Seq("a", "bc"))
  }

  test("repeated-symbol merges apply left to right without overlap") {
    val ranks = Bpe.ranksOf(Seq(("a", "a")))
    assert(Bpe.encodeWord("aaaa", ranks) == Seq("aa", "aa"))
    assert(Bpe.encodeWord("aaa", ranks) == Seq("aa", "a"))
  }

  test("merges.txt wire format round-trips; comments and blanks are skipped") {
    val merges = Bpe.train(vocab, 6)
    assert(Bpe.parseMerges(Bpe.formatMerges(merges)) == merges)
    assert(Bpe.parseMerges("# version: test\n\ne s\nes t") == Seq(("e", "s"), ("es", "t")))
  }

  test("non-BMP characters stay whole code points (no lone surrogates in merges)") {
    // an emoji is one symbol, not two UTF-16 surrogates: a merge holding a
    // lone surrogate would not survive UTF-8 merges.txt serialization
    val merges = Bpe.train(Seq("😀x" -> 5L, "😀y" -> 5L), 4)
    assert(merges.forall { case (a, b) =>
      !a.exists(Character.isSurrogate(_) && a.length == 1) &&
        Seq(a, b).forall(t => !(t.length == 1 && Character.isSurrogate(t.charAt(0))))
    }, s"lone surrogate in merges: $merges")
    val ranks = Bpe.ranksOf(merges)
    val toks = Bpe.encodeWord("😀x", ranks)
    assert(toks.mkString("") == "😀x")
    // round-trip through the wire format preserves the merge behavior
    val replayed = Bpe.ranksOf(Bpe.parseMerges(Bpe.formatMerges(merges)))
    assert(Bpe.encodeWord("😀x", replayed) == toks)
  }

  test("degenerate inputs: empty vocab, singleton chars, count-1 pairs stop training") {
    assert(Bpe.train(Seq.empty, 10).isEmpty)
    assert(Bpe.train(Seq("a" -> 100L), 10).isEmpty, "1-char words carry no pairs")
    // every pair unique (count 1): nothing worth merging, training stops
    assert(Bpe.train(Seq("abc" -> 1L, "def" -> 1L), 10).isEmpty)
    assert(Bpe.encodeWord("", Bpe.ranksOf(Seq(("a", "b")))).isEmpty)
  }
}
