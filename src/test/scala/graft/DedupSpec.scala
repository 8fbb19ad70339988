package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Pq, Similarity, TextAnalysis}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near dup of 1
    (4L, "completely different words about spark engines and columnar execution plans here"),
    (5L, "another unrelated document mentioning databases queries optimizers and storage formats")
  ).toDF("doc_id", "text")

  test("exactStats counts duplicate groups") {
    val r = Dedup.exactStats(docs, "text").collect().head
    assert(r.getLong(0) == 5) // n_docs
    assert(r.getLong(1) == 4) // n_distinct_texts
    assert(r.getLong(2) == 1) // n_dup_groups
    assert(r.getLong(3) == 2) // n_dup_docs
  }

  test("jaccardPairs finds exact and near dups, not unrelated docs") {
    val pairs = Dedup
      .jaccardPairs(docs.withColumn("blk", lit(1)), "doc_id", "text", Seq("blk"), 3, 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) > 0.5)
    assert(!pairs.keys.exists { case (a, b) => Set(a, b).contains(4L) || Set(a, b).contains(5L) })
  }

  test("containmentPairs scores an embedded doc 1.0 where jaccard misses it") {
    // A's 3 bigram shingles all occur inside B (8 distinct shingles):
    // containment = 3/min(3,8) = 1.0, jaccard = 3/(3+8-3) = 0.375
    val d = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "intro words alpha beta gamma delta closing words here"),
      (3L, "totally disjoint tokens nothing shared anywhere")
    ).toDF("doc_id", "text").withColumn("blk", lit(1))
    val c = Dedup.containmentPairs(d, "doc_id", "text", Seq("blk"), 2, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4)))
    assert(c.toSeq == Seq((1L, 2L, 1.0, 3L, 8L)))
    val j = Dedup.jaccardPairs(d, "doc_id", "text", Seq("blk"), 2, 0.5).collect()
    assert(j.isEmpty, "jaccard at 0.5 should miss the embedded doc containment catches")
  }

  test("rrfFuse: hand-computed fusion, per-list ranks carried, misses are null") {
    val lex = Seq(("q0", 10L, 1L), ("q0", 20L, 2L), ("q0", 30L, 3L))
      .toDF("query_id", "doc_id", "rank")
    val sem = Seq(("q0", 20L, 1L), ("q0", 40L, 2L))
      .toDF("query_id", "doc_id", "rank")
    val out = Similarity
      .rrfFuse(Seq("lex" -> lex, "sem" -> sem), "query_id", "doc_id", "rank", topK = 10)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3),
        Option(r.get(4)).map(_.asInstanceOf[Long]), Option(r.get(5)).map(_.asInstanceOf[Long])))
    // d20 hits both lists: 1/61 + 1/62; singles follow by their one term
    val expected = Seq(
      (1L, 20L, BigDecimal(1.0 / 62 + 1.0 / 61 + 1e-9).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, Some(2L), Some(1L)),
      (2L, 10L, BigDecimal(1.0 / 61 + 1e-9).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, Some(1L), None),
      (3L, 40L, BigDecimal(1.0 / 62 + 1e-9).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, None, Some(2L)),
      (4L, 30L, BigDecimal(1.0 / 63 + 1e-9).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, Some(3L), None))
    assert(out.toSeq == expected)
  }

  test("rrfFuse: a doc repeated inside one list contributes its best rank once; null ranks drop") {
    val lex = Seq(("q0", 10L, 2L), ("q0", 10L, 5L))
      .toDF("query_id", "doc_id", "rank")
      .union(Seq(("q0", 20L)).toDF("query_id", "doc_id")
        .selectExpr("query_id", "doc_id", "cast(null as bigint) as rank"))
    val out = Similarity
      .rrfFuse(Seq("lex" -> lex), "query_id", "doc_id", "rank", topK = 10)
      .collect()
      .map(r => (r.getLong(2), r.getDouble(3), r.getLong(4)))
    // only d10 survives (null-rank d20 drops), scored 1/62 once, lex_rank=2
    val want = BigDecimal(1.0 / 62 + 1e-9).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.toSeq == Seq((10L, want, 2L)))
  }

  test("jlProject: closed-form signs, linearity, and identical-vector invariance") {
    // dim=1, outDim=1: sign(0,0) = +1 (0 % 1000003 % 2 == 0), so
    // out = [v0 / sqrt(1)] exactly
    val one = Seq((1L, Seq(3.5f))).toDF("id", "v")
    val p1 = Similarity.jlProject(one, "v", "p", 1)
      .select($"p").as[Seq[Double]].head()
    assert(p1 == Seq(3.5))
    // linearity: P(2v) == 2 P(v); identical inputs project identically
    val v = Seq(0.5f, -1.25f, 2.0f, 0.125f)
    val df = Seq((1L, v), (2L, v.map(_ * 2)), (3L, v)).toDF("id", "v")
    val m = Similarity.jlProject(df, "v", "p", 8)
      .select($"id", $"p").as[(Long, Seq[Double])].collect().toMap
    assert(m(1L) == m(3L))
    assert(m(2L) == m(1L).map(_ * 2))
    assert(m(1L).size == 8)
    // empty vector projects to the zero vector (sum over nothing), not an
    // ANSI index error; null vector stays null
    val edge = Seq((1L, Some(Seq.empty[Float])), (2L, None)).toDF("id", "v")
    val e2 = Similarity.jlProject(edge, "v", "p", 4)
      .collect().map(r => r.getLong(0) -> Option(r.get(2))).toMap
    assert(e2(1L) == Some(Seq(0.0, 0.0, 0.0, 0.0)))
    assert(e2(2L).isEmpty)
  }

  test("minhashPairs recovers the same dup clusters (exact-verified)") {
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text", shingleN = 3, bands = 16, rowsPerBand = 3, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)))
    assert(!pairs.exists { case (a, b) => Set(a, b).contains(4L) })
  }

  test("incremental dedup: batch vs persisted index matches the exact bipartite anchor") {
    val corpus = docs.where(col("doc_id") =!= 2L && col("doc_id") =!= 3L) // 1, 4, 5 ingested
    val batch  = docs.where(col("doc_id") === 2L || col("doc_id") === 3L) // 2, 3 arrive
    // exact bipartite anchor: 2 exact-dups 1, 3 near-dups 1; nothing hits 4/5
    val exact = Dedup.incrementalJaccardPairs(batch, corpus, "doc_id", "text",
      shingleN = 3, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(exact((2L, 1L)) == 1.0)
    assert(exact.contains((3L, 1L)) && exact((3L, 1L)) > 0.5)
    assert(exact.keySet.map(_._2) == Set(1L))

    val dir = java.nio.file.Files.createTempDirectory("graft-dedup-idx").toString
    Dedup.saveDedupIndex(corpus, "doc_id", "text", dir)
    assert(Dedup.dedupIndexExists(dir))

    // exact-dup probe: only the verbatim copy, pointing at the canonical id
    val ex = Dedup.incrementalExactDups(batch, "doc_id", "text", dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ex == Set((2L, 1L)))

    // index-probing minhash path: precision 1 vs the anchor (subset with
    // identical jaccard), and here the banding catches both true pairs
    val mh = Dedup.incrementalMinhashPairs(batch, corpus, dir, "doc_id", "text",
      shingleN = 3, bands = 16, rowsPerBand = 3, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(mh.keySet.subsetOf(exact.keySet))
    mh.foreach { case (k, j) => assert(j == exact(k)) }
    assert(mh.contains((2L, 1L)) && mh.contains((3L, 1L)))

    // indexed exact-jaccard path: BIT-IDENTICAL to the anchor (recall 1, not
    // just precision 1 — it is the same math served from shingles/ + doc_n/)
    val idx = Dedup.incrementalJaccardPairsIndexed(batch, dir, "doc_id", "text",
      shingleN = 3, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(idx == exact, s"indexed=$idx anchor=$exact")

    // backfill-scale dispatch (round-9 verdict #6): a batch whose distinct
    // shingle count exceeds maxBroadcastShingles takes the shuffle-join
    // path instead of the broadcast — results BIT-IDENTICAL
    val shuffled = Dedup.incrementalJaccardPairsIndexed(batch, dir, "doc_id", "text",
      shingleN = 3, threshold = 0.3, maxBroadcastShingles = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(shuffled == idx, s"shuffle-dispatch diverged: $shuffled vs $idx")
  }

  test("indexed incremental jaccard ≡ unindexed under an ACTIVE df cap (correction-term path)") {
    // boiler docs: every doc carries the stop-phrase "the same boiler text
    // here" whose shingles' combined df crosses the cap only when the batch
    // arrives — exercising doc_n/'s batch-dependent correction term
    val boiler = "the same boiler text here"
    val corpus = Seq(
      (10L, s"alpha beta gamma delta $boiler"),
      (11L, s"alpha beta gamma epsilon $boiler"),
      (12L, s"zeta eta theta iota $boiler kappa end marker")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (20L, s"alpha beta gamma delta $boiler"),   // near/exact dup of 10
      (21L, s"totally unrelated content $boiler") // shares only boiler
    ).toDF("doc_id", "text")
    for (cap <- Seq(3, 4, 100)) {
      val anchor = Dedup.incrementalJaccardPairs(batch, corpus, "doc_id", "text",
        shingleN = 3, threshold = 0.1, maxShingleDf = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val dir = java.nio.file.Files.createTempDirectory(s"graft-dedup-cap$cap").toString
      Dedup.saveDedupIndex(corpus, "doc_id", "text", dir, jaccardDfCap = cap)
      val idx = Dedup.incrementalJaccardPairsIndexed(batch, dir, "doc_id", "text",
        shingleN = 3, threshold = 0.1, maxShingleDf = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(idx == anchor, s"cap=$cap indexed=$idx anchor=$anchor")
    }
    // probing with a cap the index wasn't built with is a wrong-results bug
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup-drift").toString
    Dedup.saveDedupIndex(corpus, "doc_id", "text", dir, jaccardDfCap = 4)
    val e = intercept[IllegalArgumentException](
      Dedup.incrementalJaccardPairsIndexed(batch, dir, "doc_id", "text",
        shingleN = 3, threshold = 0.1, maxShingleDf = 50))
    assert(e.getMessage.contains("jaccardDfCap"), e.getMessage)
    // a legacy index (marker without jaccardDfCap) is refused, not half-probed
    // (drop the Hadoop CRC sidecar — the local fs would reject the raw rewrite)
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(dir, "._SUCCESS.crc"))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "_SUCCESS"),
      "shingleN=3,bands=16,rowsPerBand=3".getBytes("UTF-8"))
    val e2 = intercept[IllegalArgumentException](
      Dedup.incrementalJaccardPairsIndexed(batch, dir, "doc_id", "text",
        shingleN = 3, threshold = 0.1, maxShingleDf = 4))
    assert(e2.getMessage.contains("predates"), e2.getMessage)
  }

  test("property: indexed incremental jaccard ≡ unindexed on random corpora and caps") {
    // randomized differential over the WHOLE parameter surface the fixture
    // tests can't sweep: random word docs (overlapping vocab so shingles
    // collide), random corpus/batch splits, random df caps — the indexed
    // form must be bit-identical everywhere, including caps that never
    // engage and caps that kill most shingles
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val vocab = (0 until 12).map(i => s"w$i")
      val docs = (0L until 30L).map { id =>
        val words = Seq.fill(6 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size)))
        (id, words.mkString(" "))
      }.toDF("doc_id", "text")
      val batch  = docs.where(col("doc_id") % 4 === 0)
      val corpus = docs.where(col("doc_id") % 4 =!= 0)
      val cap = 1 + rnd.nextInt(12)
      val anchor = Dedup.incrementalJaccardPairs(batch, corpus, "doc_id", "text",
        shingleN = 2, threshold = 0.05, maxShingleDf = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val dir = java.nio.file.Files.createTempDirectory(s"graft-dedup-prop$seed").toString
      Dedup.saveDedupIndex(corpus, "doc_id", "text", dir,
        shingleN = 2, jaccardDfCap = cap)
      val idx = Dedup.incrementalJaccardPairsIndexed(batch, dir, "doc_id", "text",
        shingleN = 2, threshold = 0.05, maxShingleDf = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(idx == anchor, s"seed=$seed cap=$cap indexed=$idx anchor=$anchor")
    }
  }

  test("connectedComponents resolves chains and keeps min canonical") {
    // components: {1,2,3,9} via chain 1-2, 2-3, 3-9; {5,6}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 9L), (5L, 6L)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("connectedComponents: union-find fast path ≡ distributed propagation (differential)") {
    // the two code paths share no logic beyond the contract — random edge
    // sets must resolve identically through both (this is also the only
    // executable check on the hand-rolled LongLongMap's hashing)
    val rnd = new scala.util.Random(7)
    for (round <- 1 to 4) {
      val nNodes = 20 + round * 15
      val edges = Seq.fill(40 + round * 20)(
        (rnd.nextInt(nNodes).toLong, rnd.nextInt(nNodes).toLong))
        .filter { case (a, b) => a != b }
      val pairs = edges.toDF("id_a", "id_b")
      val fast = Dedup.connectedComponents(pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val dist = Dedup.connectedComponents(pairs, smallGraphEdges = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fast == dist, s"paths disagree on round $round")
    }
  }

  test("connectedComponents fast path survives LongLongMap growth (70k-node chain)") {
    // the union-find parent table starts at 2^16 slots and grows at 0.5
    // load — a 70k-node chain forces at least one rehash mid-build; every
    // node must still resolve to the chain's minimum
    val chain = spark.range(0, 70000)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    val cc = Dedup.connectedComponents(chain)
    assert(cc.where(col("canonical_id") =!= 0L).isEmpty, "all nodes resolve to 0")
    assert(cc.count() == 70001L)
  }

  test("simhash: exact dups identical, near dups close, unrelated far") {
    val m = Dedup.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(m(1L) == m(2L))
    assert(hamming(m(1L), m(3L)) < hamming(m(1L), m(4L)))
  }

  test("simhashPairs buckets catch the dup cluster") {
    val sims = Dedup.simhash(docs, "doc_id", "text")
    val pairs = Dedup.simhashPairs(sims, "doc_id", maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("rollingFingerprint is order-sensitive; tokenCount handles blanks") {
    val df = Seq(("a b c"), ("c b a"), ("a b c")).toDF("text")
      .select(TextAnalysis.rollingFingerprint($"text").as("fp")).as[Long].collect()
    assert(df(0) == df(2) && df(0) != df(1))
    val tc = Seq(("  "), ("a b"), ("")).toDF("t")
      .select(graft.functions.Fns.tokenCount($"t")).as[Int].collect().toSeq
    assert(tc == Seq(0, 2, 0))
  }

  test("ivfTopK finds the planted neighbor when probing enough cells") {
    val emb = (0 until 40).map { i =>
      (i.toLong, Seq.tabulate(8)(d => (math.sin(i * 31 + d) * 0.1).toFloat))
    }.toDF("vec_id", "embedding")
    // plant a near-identical pair
    val planted = Seq((100L, Seq.tabulate(8)(d => (math.sin(7 * 31 + d) * 0.1001).toFloat)))
      .toDF("vec_id", "embedding")
    val all = emb.union(planted)
    val qs = all.where($"vec_id" === 100L)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val top = Similarity.ivfTopK(all, qs, "vec_id", "embedding", "query_id", "qvec",
      k = 1, nCentroids = 4, nProbe = 4) // probe all cells -> exact
    assert(top.collect().head.getLong(2) == 7L)
  }

  test("kmeansCentroids converges to the planted cluster directions") {
    // 3 well-separated direction clusters of 10 vectors each (orthogonal
    // axes + small deterministic jitter on the other components)
    val vecs = (0 until 30).map { i =>
      val axis = i % 3
      val v = Array.tabulate(6)(d =>
        if (d == axis) 1.0f else (math.sin(i * 13 + d) * 0.05).toFloat)
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
    val cents = Similarity.kmeansCentroids(vecs, "vec_id", "embedding", nCentroids = 3, iters = 4)
    // every refined centroid must point dominantly along exactly one axis,
    // and all three axes must be covered (clusters separated, none merged)
    val dominantAxes = cents.map { c =>
      val maxIdx = c.indices.maxBy(i => math.abs(c(i)))
      assert(math.abs(c(maxIdx)) > 5 * c.indices.filter(_ != maxIdx).map(i => math.abs(c(i))).max)
      maxIdx
    }
    assert(dominantAxes.toSet == Set(0, 1, 2))
    // refined index at nProbe=1 achieves exact recall on this clustered set:
    // each query's true neighbors share its cell
    val qs = vecs.where($"vec_id" < 3).select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val top = Similarity.ivfTopK(vecs, qs, "vec_id", "embedding", "query_id", "qvec",
      k = 9, nCentroids = 3, nProbe = 1, refineIters = 4)
    val byQuery = top.collect().groupBy(_.getLong(0))
    (0L until 3L).foreach { q =>
      val ids = byQuery(q).map(_.getLong(2)).toSet
      assert(ids == (0L until 30L).filter(i => i % 3 == q && i != q).toSet)
    }
  }

  test("PQ: 8-byte codes + ADC recover cluster neighbors exactly on separated clusters") {
    val vecs = (0 until 30).map { i =>
      val axis = i % 3
      val v = Array.tabulate(6)(d =>
        if (d == axis) 1.0f else (math.sin(i * 13 + d) * 0.05).toFloat)
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
    val cb = Pq.train(vecs, "vec_id", "embedding", m = 3, k = 4, iters = 4, maxSample = 30)
    assert(cb.dsub == 2 && cb.cents.length == 3 * 4 * 2)
    val enc = Pq.encode(vecs, "vec_id", "embedding", cb)
    assert(enc.select(size($"codes")).distinct().as[Int].collect().toSeq == Seq(3)) // m codes/vector
    val qs = vecs.where($"vec_id" < 3).select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val top = Pq.topK(enc, qs, "vec_id", "query_id", "qvec", k = 9, cb)
    val byQuery = top.collect().groupBy(_.getLong(0))
    (0L until 3L).foreach { q =>
      val ids = byQuery(q).map(_.getLong(2)).toSet
      assert(ids == (0L until 30L).filter(i => i % 3 == q && i != q).toSet,
        s"query $q got $ids")
    }
  }

  test("IVF+PQ composition recovers cluster neighbors with nProbe=1") {
    val vecs = (0 until 30).map { i =>
      val axis = i % 3
      val v = Array.tabulate(6)(d =>
        if (d == axis) 1.0f else (math.sin(i * 13 + d) * 0.05).toFloat)
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
    val cb = Pq.train(vecs, "vec_id", "embedding", m = 3, k = 4, iters = 4, maxSample = 30)
    val qs = vecs.where($"vec_id" < 3).select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val top = Similarity.ivfPqTopK(vecs, qs, "vec_id", "embedding", "query_id", "qvec",
      k = 9, cb, nCentroids = 3, nProbe = 1, refineIters = 4)
    val byQuery = top.collect().groupBy(_.getLong(0))
    (0L until 3L).foreach { q =>
      val ids = byQuery(q).map(_.getLong(2)).toSet
      assert(ids == (0L until 30L).filter(i => i % 3 == q && i != q).toSet, s"query $q got $ids")
    }
  }

  test("centroidDistances: zero for a degenerate cluster, flags the planted outlier") {
    val vecs = Seq(
      (1L, Seq(0f, 1f), 1),   // label 1: two identical members -> dist 0
      (2L, Seq(0f, 1f), 1),
      (3L, Seq(1f, 0f), 0),   // label 0: tight pair + one far outlier
      (4L, Seq(0.9f, 0f), 0),
      (5L, Seq(-1f, 0f), 0)
    ).toDF("vec_id", "embedding", "label")
    val d = Similarity.centroidDistances(vecs, "vec_id", "embedding", "label")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(d(1L) == 0.0 && d(2L) == 0.0)
    // label-0 centroid = (0.3, 0): outlier 5 is farthest, 3 and 4 close
    assert(d(5L) > d(3L) && d(5L) > d(4L))
    assert(math.abs(d(3L) - 0.7) < 1e-6 && math.abs(d(5L) - 1.3) < 1e-6)
  }

  test("cosineDupPairs finds only above-threshold pairs") {
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.99f, 0.1f)), (3L, Seq(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val pairs = Similarity.cosineDupPairs(emb, "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("semanticDedupPairs: within-cell pairs are exact (precision 1), cross-cell pairs are the only misses") {
    // two tight clusters + one orphan; cells assign cluster A to cell 0,
    // cluster B to cell 1 — except member 22, mis-assigned to cell 0 to
    // model quantizer error (its pair with 21 becomes a cross-cell miss)
    val emb = Seq(
      (11L, Seq(1.0f, 0.0f)), (12L, Seq(0.99f, 0.05f)),
      (21L, Seq(0.0f, 1.0f)), (22L, Seq(0.05f, 0.99f)),
      (99L, Seq(0.7f, 0.7f))
    ).toDF("vec_id", "embedding")
    val cells = Seq((11L, 0), (12L, 0), (21L, 1), (22L, 0), (99L, 2))
      .toDF("vec_id", "__cell")
    val got = Similarity.semanticDedupPairs(emb, "vec_id", "embedding", cells, "__cell", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.cosineDupPairs(emb, "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(exact), "every emitted pair must be exact-verified (precision 1)")
    assert(got == Set((11L, 12L)), "within-cell pair found")
    assert((exact -- got) == Set((21L, 22L)), "only the mis-binned cross-cell pair is missed")
  }

  test("knnJoin: planted nearest neighbors at rank 1, chunk grid does not change the answer") {
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (2L, Seq(0.9f, 0.1f, 0.0f)),
      (3L, Seq(0.0f, 1.0f, 0.0f)),
      (4L, Seq(0.1f, 0.9f, 0.0f)),
      (5L, Seq(0.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val multi = Similarity.knnJoin(emb, "vec_id", "embedding", k = 2, chunkRows = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val single = Similarity.knnJoin(emb, "vec_id", "embedding", k = 2, chunkRows = 1024)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(multi == single, "chunk grid must not change the answer")
    val rank1 = single.filter(_._2 == 1L).map(t => (t._1, t._3)).toMap
    // 1<->2 and 3<->4 are planted mutual nearest; 5 is orthogonal to all
    // (cosine 0 everywhere) so its rank-1 tie-breaks to the lowest id
    assert(rank1 == Map(1L -> 2L, 2L -> 1L, 3L -> 4L, 4L -> 3L, 5L -> 1L))
    assert(single.groupBy(_._1).forall(_._2.size == 2), "k rows per vector")
  }

  test("knnJoinCells: neighbors restricted to the cell, scores exact on emitted rows") {
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (2L, Seq(0.9f, 0.1f, 0.0f)),
      (3L, Seq(0.0f, 1.0f, 0.0f)),
      (4L, Seq(0.1f, 0.9f, 0.0f)),
      (5L, Seq(0.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val cells = Seq((1L, 0), (2L, 0), (3L, 1), (4L, 1), (5L, 0)).toDF("vec_id", "__cell")
    val got = Similarity.knnJoinCells(emb, "vec_id", "embedding", cells, "__cell", k = 1)
      .collect().map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3))).toMap
    // rank-1 within each cell: 1->2, 2->1, 3->4, 4->3, 5->1 (cosine-0 tie)
    assert(got.keySet == Set((1L, 2L), (2L, 1L), (3L, 4L), (4L, 3L), (5L, 1L)))
    val exact = Similarity.knnJoin(emb, "vec_id", "embedding", k = 4)
      .collect().map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3))).toMap
    got.foreach { case (pair, sim) =>
      assert(exact(pair) == sim, s"cell-bounded score for $pair must equal the exact score")
    }
  }

  test("keepBest keeps the highest-scoring member per cluster, ties to the lowest id") {
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (8L, 7L))
      .toDF("doc_id", "canonical_id")
    val docs = Seq((1L, 10L), (2L, 99L), (3L, 40L), (7L, 5L), (8L, 5L), (9L, 1000L))
      .toDF("doc_id", "n_chars") // doc 9 is unclustered: must not appear
    val got = Dedup.keepBest(clusters, docs, "doc_id", "n_chars")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(
      1L -> (2L, 3L, 99L),  // best score wins
      7L -> (7L, 2L, 5L)))  // score tie -> lowest id
  }

  test("keepBest still names a keep_id when every member score is NULL or missing") {
    val clusters = Seq((1L, 1L), (2L, 1L), (7L, 7L), (8L, 7L)).toDF("doc_id", "canonical_id")
    val members = Seq((1L, Option.empty[Long]), (2L, Option.empty[Long]), (7L, Option(5L)))
      .toDF("doc_id", "n_chars") // doc 8 absent from members entirely
    val got = Dedup.keepBest(clusters, members, "doc_id", "n_chars")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), Option(r.get(3)))).toMap
    // all-null cluster: min-id fallback with best_score reported null — the
    // cluster must not vanish from a retention decision
    assert(got(1L) == ((1L, 2L, None)))
    // a null/absent member loses to any scored member
    assert(got(7L) == ((7L, 2L, Some(5L))))
  }

  test("incremental probes refuse an index directory without its _SUCCESS marker") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup-noidx").toString
    val batch = docs.where(col("doc_id") === 2L)
    val e = intercept[IllegalArgumentException] {
      Dedup.incrementalExactDups(batch, "doc_id", "text", dir)
    }
    assert(e.getMessage.contains("_SUCCESS"))
    val e2 = intercept[IllegalArgumentException] {
      Dedup.incrementalMinhashPairs(batch, docs, dir, "doc_id", "text")
    }
    assert(e2.getMessage.contains("_SUCCESS"))
  }

  test("filteredTopK treats a NULL filter value as a bucket of its own") {
    val cand = Seq(
      (1L, Seq(1.0f, 0.0f), Option("en")),
      (2L, Seq(0.9f, 0.1f), Option.empty[String]),
      (3L, Seq(0.8f, 0.2f), Option.empty[String])
    ).toDF("vec_id", "embedding", "lang")
    val qs = Seq((10L, Seq(1.0f, 0.0f), Option.empty[String])).toDF("query_id", "qvec", "lang")
    val got = Similarity
      .filteredTopK(cand, qs, "vec_id", "embedding", "query_id", "qvec", Seq("lang"), k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // the NULL-lang query scores exactly the NULL-lang candidates (it used
    // to vanish from the output entirely under the plain equi-join)
    assert(got == Set((10L, 1L, 2L), (10L, 2L, 3L)))
  }

  test("centroidDistances keeps NULL-group rows in the audit") {
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f), Option("a")),
      (2L, Seq(0.0f, 1.0f), Option.empty[String]),
      (3L, Seq(0.0f, 0.0f), Option.empty[String])
    ).toDF("vec_id", "embedding", "label")
    val d = Similarity.centroidDistances(vecs, "vec_id", "embedding", "label")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(d.size == 3, "null-label docs must appear in the outlier audit")
    // null-group centroid = (0, 0.5): both members sit 0.5 away
    assert(math.abs(d(2L) - 0.5) < 1e-6 && math.abs(d(3L) - 0.5) < 1e-6)
  }

  test("lshTopK: excludeSelf is a parameter (id coincidence must not drop a foreign candidate)") {
    val cand = Seq((42L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val qs   = Seq((42L, Seq(1.0f, 0.0f))).toDF("query_id", "qvec")
    // identical vectors share every table's bucket, so the collision is certain
    val kept = Similarity.lshTopK(cand, qs, "vec_id", "embedding", "query_id", "qvec",
      k = 1, excludeSelf = false)
    assert(kept.count() == 1)
    val dropped = Similarity.lshTopK(cand, qs, "vec_id", "embedding", "query_id", "qvec", k = 1)
    assert(dropped.count() == 0)
  }

  test("lshTopK rejects QUERY vectors wider than dim (silent truncation guard, both sides)") {
    val cand = Seq((1L, Seq.fill(4)(1.0f))).toDF("vec_id", "embedding")
    val qs   = Seq((9L, Seq.fill(8)(1.0f))).toDF("query_id", "qvec")
    val e = intercept[IllegalArgumentException] {
      Similarity.lshTopK(cand, qs, "vec_id", "embedding", "query_id", "qvec", k = 1, dim = 4)
    }
    assert(e.getMessage.contains("truncates"))
  }

  test("heap top-k paths refuse fractional ids and survive extreme integral ids") {
    val frac = Seq((2.3, Seq(1.0f)), (2.7, Seq(1.0f))).toDF("vec_id", "embedding")
    val fq = frac.select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    // a double id would truncate in the tie-break and order OPPOSITE to the
    // window form — must fail loudly at plan time
    intercept[IllegalArgumentException] {
      Similarity.cosineTopKAgg(frac, fq, "vec_id", "embedding", "query_id", "qvec", 1)
    }
    // ~id (bitwise complement) is total on longs: Long.MinValue survives
    // where the old -id negation would ANSI-overflow; equal sims still
    // tie-break id ascending
    val ext = Seq(
      (Long.MinValue, Seq(1.0f, 0.0f)), (Long.MaxValue, Seq(1.0f, 0.0f)), (0L, Seq(1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val q2 = Seq((1L, Seq(1.0f, 0.0f))).toDF("query_id", "qvec")
    val top = Similarity.cosineTopKAgg(ext, q2, "vec_id", "embedding", "query_id", "qvec", 3)
      .orderBy("rank").collect().map(_.getLong(2)).toSeq
    assert(top == Seq(Long.MinValue, 0L, Long.MaxValue))
  }

  test("sq8: codes bounded 0..255, round-trip error within the grid bound, degenerate dim exact") {
    val emb = Seq(
      (1L, Seq(0.0f, -1.0f, 7.0f)),
      (2L, Seq(10.0f, 1.0f, 7.0f)),
      (3L, Seq(3.7f, 0.2f, 7.0f)) // dim 3 is constant: max == min
    ).toDF("vec_id", "embedding")
    val ranges = Similarity.sq8Train(emb, "embedding")
    val enc = Similarity.sq8Encode(emb, "vec_id", "embedding", ranges)
    val codes = enc.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes.values.forall(_.forall(c => c >= 0 && c <= 255)))
    assert(codes(1L) == Seq(0, 0, 0), "corpus minima encode 0; degenerate dim encodes 0")
    assert(codes(2L).take(2) == Seq(255, 255), "corpus maxima encode 255")
    val dec = Similarity.sq8Decode(enc, "vec_id", ranges)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val orig = emb.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val spans = Seq(10.0, 2.0, 0.0) // per-dim max - min
    orig.foreach { case (id, xs) =>
      xs.zip(dec(id)).zip(spans).foreach { case ((x, xh), span) =>
        assert(math.abs(x - xh) <= span / 510.0 + 1e-6,
          s"vec $id: |$x - $xh| exceeds the half-step bound for span $span")
      }
    }
    assert(dec(3L)(2) == 7.0f, "degenerate dim reconstructs exactly")
  }

  test("sq8Encode clamps out-of-training-range components (incremental encode)") {
    // encode against PREVIOUSLY-trained ranges — the production shape; an
    // unclamped code (-128, 280) would decode OUTSIDE the training box
    val train = Seq((1L, Seq(0.0f, 0.0f)), (2L, Seq(10.0f, 1.0f))).toDF("vec_id", "embedding")
    val ranges = Similarity.sq8Train(train, "embedding")
    val fresh = Seq((3L, Seq(-5.0f, 2.0f))).toDF("vec_id", "embedding")
    val codes = Similarity.sq8Encode(fresh, "vec_id", "embedding", ranges)
      .collect()(0).getSeq[Int](1)
    assert(codes == Seq(0, 255), s"below-min -> 0, above-max -> 255; got $codes")
    // in-range components are untouched by the clamp (oracle parity)
    val inRange = Similarity.sq8Encode(train, "vec_id", "embedding", ranges)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(inRange(1L) == Seq(0, 0) && inRange(2L) == Seq(255, 255))
  }

  test("kmeansCentroids ignores null vectors in seed and refine (the Pq.train guard)") {
    // pre-fix: a null vector in the refine sample assigned a null cell and
    // NPE'd the driver-side getInt; one in the hash-ordered seed NPE'd the
    // collect. Both paths now filter nulls, like Pq.train.
    val vecs = ((0 until 12).map { i =>
      val axis = i % 3
      (i.toLong, Option(Seq.tabulate(6)(d =>
        if (d == axis) 1.0f else (math.sin(i * 13 + d) * 0.05).toFloat)))
    } :+ ((99L, Option.empty[Seq[Float]]))).toDF("vec_id", "embedding")
    val cents = Similarity.kmeansCentroids(vecs, "vec_id", "embedding", nCentroids = 3, iters = 2)
    assert(cents.length == 3 && cents.forall(_.length == 6))
    // ragged seed dims fail loudly: the flattened centroid literal would
    // silently misalign every score otherwise
    val ragged = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(1.0f, 2.0f, 3.0f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.kmeansCentroids(ragged, "vec_id", "embedding", nCentroids = 2, iters = 0)
    }
    assert(e.getMessage.contains("mixed vector dimensions"))
  }

  test("Pq.topK drops zero-norm (null-sim) candidates instead of padding the top-k") {
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)), (3L, Seq(0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val cb = Pq.train(vecs, "vec_id", "embedding", m = 2, k = 2, iters = 2, maxSample = 10)
    val enc = Pq.encode(vecs, "vec_id", "embedding", cb)
    val qs = vecs.where($"vec_id" === 1L)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    // k exceeds the real candidate count, so pre-fix the zero-norm row
    // padded the result with a null cosine_approx — a row no exact path emits
    val rows = Pq.topK(enc, qs, "vec_id", "query_id", "qvec", k = 5, cb).collect()
    assert(rows.forall(!_.isNullAt(3)), "no null-scored rows in the top-k")
    assert(!rows.map(_.getLong(2)).contains(3L), "zero-norm candidate never ranks")
  }

  test("cosineTopK ranks the planted nearest neighbor first") {
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (2L, Seq(0.9f, 0.1f, 0.0f)),
      (3L, Seq(0.0f, 1.0f, 0.0f)),
      (4L, Seq(0.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val qs = emb.where($"vec_id" === 1L)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val top = Similarity.cosineTopK(emb, qs, "vec_id", "embedding", "query_id", "qvec", 2)
      .orderBy("rank").collect()
    assert(top(0).getLong(2) == 2L) // nearest
    assert(top.length == 2)
  }

  test("cosineTopK window form and cosineTopKAgg heap form are row-identical (differential)") {
    // the DECLARED g2_cosine_topk path is the bounded-heap aggregate (only
    // k rows per query-partition cross the shuffle); the window form is the
    // readable reference implementation. This differential is what lets the
    // agg form carry the oracle alone — same rows, same ranks, same rounded
    // scores, including tie-break (sim desc, id asc), on real testdata.
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val qs = emb.where($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    // no cast patch: the window form's rank is long by contract (rankTopK),
    // so the two formulations are drop-in swaps at the schema level too
    val win = Similarity.cosineTopK(emb, qs, "vec_id", "embedding", "query_id", "qvec", 3)
      .select("query_id", "rank", "vec_id", "cosine")
    val agg = Similarity.cosineTopKAgg(emb, qs, "vec_id", "embedding", "query_id", "qvec", 3)
      .select("query_id", "rank", "vec_id", "cosine")
    assert(win.exceptAll(agg).isEmpty && agg.exceptAll(win).isEmpty,
      "window and heap top-k forms must return identical multisets")
  }
}
