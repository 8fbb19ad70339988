package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Fns, VectorExpressions}
import graft.functions.Fns.epsRound

/** Embedding similarity search (SURVEY.md §2 G2; reference EMBEDDING type,
  * /root/reference/src/registry/feature_registry.py:42).
  *
  * Brute-force is the correctness baseline: broadcast the (small) query set
  * against the candidate corpus — the corpus is never shuffled, each
  * partition computes its local sims, and only |Q| x k rows cross the wire
  * for the final per-query top-k. The scale path is [[lshTopK]]: random
  * hyperplane signatures bucket candidates so each query only scores its
  * bucket (approximate; recall grows with numTables).
  *
  * All dot products fold left-to-right in double precision (Fns.dot), so
  * scores are bit-stable across partitionings.
  */
object Similarity {

  // sqrt(vec_dot(a,a)) — the native single-pass expression; same
  // accumulation order as the HOF fold, so scores stay bit-identical
  private def withNorm(df: DataFrame, vecCol: String, out: String): DataFrame =
    df.withColumn(out, sqrt(VectorExpressions.vecDot(col(vecCol), col(vecCol))))

  // cosine with a zero-norm guard: under Spark 4's default ANSI mode a
  // plain division throws DIVIDE_BY_ZERO on the first all-zeros vector
  // (padding / missing-embedding rows are routine at corpus scale). A
  // zero-norm vector has no direction, so its pairs score null and are
  // dropped by every threshold / ranking consumer below.
  private def cosScore(dot: Column, na: Column, nb: Column): Column =
    dot / nullif(na * nb, lit(0.0))

  // the shared per-query rank-and-take: row_number over (sim desc, id asc)
  // with null sims (zero-norm pairs) dropped before ranking — one
  // definition for every exact/IVF/LSH top-k path so the semantics can't
  // drift between them. Rank is LONG, matching the bounded-heap aggregate
  // paths, so the window and heap formulations are drop-in swaps (same
  // schema, not just the same rows).
  // preFiltered: the caller already dropped every null-__sim row via a
  // CHEAP predicate (norm product ≠ 0). The isNotNull(__sim) filter here is
  // NOT free when __sim derives from a join-side dot product: the optimizer
  // pushes it into the join condition, where it re-evaluates the O(dim)
  // vec_dot per pair — every scoring path paid the dot twice (measured in
  // the executed plans). Callers that can prove no-nulls upstream opt out.
  private def rankTopK(scored: DataFrame, qidCol: String, idCol: String, k: Int,
      preFiltered: Boolean = false): DataFrame = {
    val w = Window.partitionBy(col(qidCol)).orderBy(col("__sim").desc, col(idCol).asc)
    (if (preFiltered) scored else scored.where(col("__sim").isNotNull))
      .withColumn("__rank", row_number().over(w).cast("long"))
      .where(col("__rank") <= k)
  }

  // the bounded-heap aggregate paths tie-break via bitwise id complement in
  // the struct prefix, which requires a LOSSLESS cast to long: a fractional
  // id would truncate (2.3 and 2.7 collide on the tie-break and the heap
  // orders them OPPOSITE to the window form) — fail loudly at plan time
  private def requireIntegralId(df: DataFrame, idCol: String, method: String): Unit = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val dt = df.schema(idCol).dataType
    val integral = dt == ByteType || dt == ShortType || dt == IntegerType || dt == LongType
    require(integral,
      s"$method tie-breaks via bitwise complement of the id cast to long; '$idCol' is " +
        s"${dt.simpleString} — use the window formulation for non-integral ids")
  }

  // order-reversing id transform for the heap paths' (sim desc, id asc)
  // struct ordering: ~id, NOT -id — bitwise complement is total on longs
  // (negation ANSI-overflows on Long.MinValue / pre-cast Int.MinValue) and
  // strictly decreasing, so greatest-first heaps yield lowest-id-first ties
  private def idComplement(id: Column): Column = bitwise_not(id.cast("long"))

  // one-row probe: hyperplane hashing silently truncates to `dim`
  // components, which collapses recall with no error — catch the config
  // mistake where the data is wider than the declared dim (uniform-dim
  // corpora, so a single row decides)
  private def requireDimCovers(vectors: DataFrame, vecCol: String, dim: Int): Unit =
    vectors.where(col(vecCol).isNotNull)
      .select(size(col(vecCol)).as("d")).limit(1).collect().headOption.foreach { r =>
        require(r.getInt(0) <= dim,
          s"LSH dim=$dim truncates ${r.getInt(0)}-component vectors in '$vecCol' — " +
            "bucket signatures would silently ignore the tail; pass dim >= vector " +
            "length (probe assumes a uniform-dim corpus: one non-null row decides)")
      }

  /** Exact top-k neighbors per query by cosine (desc), id asc tie-break.
    * Queries must be small enough to broadcast (the usual serving shape).
    */
  def cosineTopK(
      candidates: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      qidCol: String,
      qvecCol: String,
      k: Int,
      excludeSelf: Boolean = true
  ): DataFrame = {
    val cand = withNorm(candidates.select(col(idCol), col(vecCol)), vecCol, "__cn")
    val qs   = withNorm(queries.select(col(qidCol), col(qvecCol)), qvecCol, "__qn")
    val joined = cand
      .crossJoin(broadcast(qs))
      .where(if (excludeSelf) col(idCol) =!= col(qidCol) else lit(true))
      .where(coalesce(col("__cn") * col("__qn"), lit(0.0)) =!= 0.0) // = isNotNull(__sim), O(1)/pair
      .withColumn("__sim",
        cosScore(VectorExpressions.vecDot(col(vecCol), col(qvecCol)), col("__cn"), col("__qn")))
    rankTopK(joined, qidCol, idCol, k, preFiltered = true)
      .select(col(qidCol), col("__rank").as("rank"), col(idCol), epsRound(col("__sim"), 4).as("cosine"))
  }

  /** Metadata-FILTERED exact top-k: each query only scores candidates that
    * match it on `filterCols` (the filtered vector search every serving
    * store ships — "nearest neighbors in the same category/tenant/lang").
    * The filter is an EQUI-join, not a post-filtered cross join, so the
    * pair count is Σ_bucket |candidates∩bucket|·|queries∩bucket| and the
    * plan is a broadcast hash join on the filter key — at 100 TB the
    * filter makes brute-force CHEAPER, not just more relevant, and a
    * selective key needs no index at all.
    */
  def filteredTopK(
      candidates: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      qidCol: String,
      qvecCol: String,
      filterCols: Seq[String],
      k: Int,
      excludeSelf: Boolean = true
  ): DataFrame = {
    val cand = withNorm(
      candidates.select((Seq(idCol, vecCol) ++ filterCols).map(col): _*), vecCol, "__cn")
    val qs = withNorm(
      queries.select((Seq(qidCol, qvecCol) ++ filterCols).map(col): _*), qvecCol, "__qn")
    // NULL-SAFE equi-join on the filter key (<=>, still a hash join): a
    // NULL filter value is a bucket like any other — the plain `=` form
    // silently drops every NULL-keyed query AND candidate, the same trap
    // Dedup.jaccardPairs documents for its block columns
    val qsRenamed = filterCols.foldLeft(qs)((d, c) => d.withColumnRenamed(c, s"__q_$c"))
    val joined = cand
      .join(broadcast(qsRenamed),
        filterCols.map(c => col(c) <=> col(s"__q_$c")).reduce(_ && _))
      .drop(filterCols.map(c => s"__q_$c"): _*)
      .where(if (excludeSelf) col(idCol) =!= col(qidCol) else lit(true))
      .where(coalesce(col("__cn") * col("__qn"), lit(0.0)) =!= 0.0) // = isNotNull(__sim), O(1)/pair
      .withColumn("__sim",
        cosScore(VectorExpressions.vecDot(col(vecCol), col(qvecCol)), col("__cn"), col("__qn")))
    rankTopK(joined, qidCol, idCol, k, preFiltered = true)
      .select((Seq(col(qidCol), col("__rank").as("rank"), col(idCol)) ++
        filterCols.map(col) :+ epsRound(col("__sim"), 4).as("cosine")): _*)
  }

  /** Exact top-k via the custom bounded-heap aggregate
    * (org.apache.spark.sql.graft.TopKStructs): identical results to
    * [[cosineTopK]], but only k rows per (query, map-partition) cross the
    * shuffle instead of the full candidate set — the formulation that holds
    * when the corpus side is the scale axis. Ordering encoded in the struct
    * prefix (sim, ~id) = (sim desc, id asc) after reversal.
    */
  def cosineTopKAgg(
      candidates: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      qidCol: String,
      qvecCol: String,
      k: Int,
      excludeSelf: Boolean = true
  ): DataFrame = {
    import org.apache.spark.sql.graft.TopKStructs
    requireIntegralId(candidates, idCol, "cosineTopKAgg")
    val cand = withNorm(candidates.select(col(idCol), col(vecCol)), vecCol, "__cn")
    val qs   = withNorm(queries.select(col(qidCol), col(qvecCol)), qvecCol, "__qn")
    cand
      .crossJoin(broadcast(qs))
      .where(if (excludeSelf) col(idCol) =!= col(qidCol) else lit(true))
      // null-sim rows (zero/null norms) are dropped via the NORM product,
      // not isNotNull(__sim): the optimizer pushes a filter on __sim into
      // the join condition, where evaluating it re-runs the O(dim) dot —
      // every pair paid vec_dot TWICE (measured in the executed plan: the
      // join condition carried its own vec_dot). The norm predicate drops
      // exactly the same rows (sim is null iff the norm product is null or
      // zero; vec_dot is null only when a vector is, and then so is its
      // norm) at O(1) per pair.
      .where(coalesce(col("__cn") * col("__qn"), lit(0.0)) =!= 0.0)
      .withColumn("__sim",
        cosScore(VectorExpressions.vecDot(col(vecCol), col(qvecCol)), col("__cn"), col("__qn")))
      .select(col(qidCol),
        struct(col("__sim").as("sim"), idComplement(col(idCol)).as("negid"), col(idCol).as("id")).as("__s"))
      .groupBy(col(qidCol))
      .agg(TopKStructs.topK(col("__s"), k).as("__top"))
      .select(col(qidCol), posexplode(col("__top")).as(Seq("__r", "__t")))
      .select(
        col(qidCol),
        (col("__r") + 1).cast("long").as("rank"),
        col("__t").getField("id").as(idCol),
        epsRound(col("__t").getField("sim"), 4).as("cosine"))
  }

  /** Rank an already-scored per-query candidate list 1..k by
    * (score desc, id asc) via the bounded-heap aggregate — the
    * WINDOW-FREE rank derivation. A window partitioned by a literal
    * query id gets its partition key constant-folded away and plans as
    * an unpartitioned (one-task) window — exactly what PlanAuditSpec
    * bans; the heap formulation shuffles only k rows per (query,
    * map-partition) and has no such failure mode. Null scores drop
    * (consistent with [[rankTopK]]).
    */
  def rankByScore(
      scored: DataFrame,
      qidCol: String,
      idCol: String,
      scoreCol: String,
      k: Int
  ): DataFrame = {
    import org.apache.spark.sql.graft.TopKStructs
    requireIntegralId(scored, idCol, "rankByScore")
    scored
      .where(col(scoreCol).isNotNull)
      .select(col(qidCol),
        struct(col(scoreCol).cast("double").as("sim"),
          idComplement(col(idCol)).as("negid"), col(idCol).as("id")).as("__s"))
      .groupBy(col(qidCol))
      .agg(TopKStructs.topK(col("__s"), k).as("__top"))
      .select(col(qidCol), posexplode(col("__top")).as(Seq("__r", "__t")))
      .select(col(qidCol), (col("__r") + 1).cast("long").as("rank"),
        col("__t").getField("id").as(idCol),
        col("__t").getField("sim").as(scoreCol))
  }

  /** Reciprocal-rank fusion of N per-query rank lists (Cormack &
    * Clarke 2009): `rrf(d) = Σ_lists 1/(k0 + rank_list(d))`, with a list
    * that did not retrieve `d` contributing 0 — the standard hybrid-search
    * combiner for lexical (BM25) + semantic (cosine) retrieval, score-scale
    * free by construction, which is exactly why it beats score
    * interpolation across heterogeneous rankers.
    *
    * Input frames carry (`qidCol`, `idCol`, `rankCol`) with rank 1-based
    * within each query. Output: (`qidCol`, fused `rank`, `idCol`, `rrf`,
    * one `<tag>_rank` column per input list — null where that list missed
    * the doc).
    *
    * Scale shape: tag + unionByName + two partial-agg shuffles (per-tag
    * best-rank dedup, then the fusion sum) on already-top-k-bounded rows;
    * the fused top-k is the shared per-query bounded window
    * ([[rankTopK]]) — every per-query candidate list is already ≤ its
    * ranker's k, so no partition exceeds Σ k_i rows per query and nothing
    * is corpus-sized past the rankers themselves.
    */
  def rrfFuse(
      rankings: Seq[(String, DataFrame)],
      qidCol: String,
      idCol: String,
      rankCol: String,
      topK: Int,
      k0: Int = 60
  ): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(rankings.map(_._1).distinct.size == rankings.size,
      s"ranking tags must be unique, got ${rankings.map(_._1)}")
    require(k0 > 0, s"k0 must be positive, got $k0")
    // defensive per-tag dedup: a malformed list carrying the same doc
    // twice must contribute its BEST rank once, not sum both occurrences
    // into an inflated rrf score; null ranks are malformed rows and drop.
    // The extra partial-agg shuffle is over already-top-k-bounded rows.
    val tagged = rankings
      .map { case (tag, df) =>
        df.select(col(qidCol), col(idCol),
          col(rankCol).cast("long").as("__rk"), lit(tag).as("__tag"))
      }
      .reduce(_ unionByName _)
      .where(col("__rk").isNotNull && col("__rk") >= 1)
      .groupBy(col(qidCol), col(idCol), col("__tag"))
      .agg(min("__rk").as("__rk"))
    val perTag = rankings.map { case (tag, _) =>
      min(when(col("__tag") === tag, col("__rk"))).as(s"${tag}_rank")
    }
    val fused = tagged
      .groupBy(col(qidCol), col(idCol))
      .agg(sum(lit(1.0) / (lit(k0.toDouble) + col("__rk"))).as("__sim"),
        perTag: _*)
    rankTopK(fused, qidCol, idCol, topK)
      .select((Seq(col(qidCol), col("__rank").as("rank"), col(idCol),
        epsRound(col("__sim"), 6).as("rrf")) ++
        rankings.map { case (tag, _) => col(s"${tag}_rank") }): _*)
  }

  /** Johnson–Lindenstrauss random projection with a Rademacher (±1)
    * matrix (Achlioptas 2003, "Database-friendly random projections"):
    * out[j] = Σ_i v[i]·s(i,j) / √outDim, where the sign matrix s is not
    * stored anywhere — each entry derives arithmetically from its
    * coordinates ((i·2654435761 + j·40503) mod 1000003 mod 2), the same
    * engine-portable-determinism stance as
    * [[TextAnalysis.hashedNgramScore]]'s weights: any engine (and the
    * DuckDB oracle) regenerates the identical matrix from the formula, so
    * projections are reproducible across train/serve with zero state to
    * ship. The training-data use is cheap dimensionality reduction ahead
    * of clustering / dedup / ANN when the full embedding width is
    * overkill for the distance structure.
    *
    * Scale shape: MAP-ONLY — one nested lambda expression per row, no
    * shuffle, no UDF, no broadcast (the matrix is arithmetic); cost
    * O(dim · outDim) per row, fused into the scan.
    */
  def jlProject(
      df: DataFrame,
      vecCol: String,
      outCol: String,
      outDim: Int
  ): DataFrame = {
    require(outDim > 0, s"outDim must be positive, got $outDim")
    val proj = expr(
      s"""transform(sequence(0, ${outDim - 1}), j ->
         |  aggregate(sequence(0, size($vecCol) - 1), cast(0.0 as double),
         |    (acc, i) -> acc + cast(element_at($vecCol, i + 1) as double) *
         |      (case when (i * 2654435761 + j * 40503) % 1000003 % 2 = 0
         |            then 1.0 else -1.0 end))
         |  / sqrt(cast($outDim as double)))""".stripMargin)
    // empty vector → zero vector (Σ over nothing), guarded explicitly:
    // sequence(0, -1) descends to [0, -1] and element_at(v, 1) on an empty
    // array is an ANSI runtime error, not a null. Null vector stays null.
    df.withColumn(outCol,
      when(col(vecCol).isNull, lit(null))
        .when(size(col(vecCol)) > 0, proj)
        .otherwise(array_repeat(lit(0.0), outDim)))
  }

  /** Count of candidates above a cosine threshold, per query. */
  def thresholdCount(
      candidates: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      qidCol: String,
      qvecCol: String,
      threshold: Double,
      excludeSelf: Boolean = true
  ): DataFrame = {
    val cand = withNorm(candidates.select(col(idCol), col(vecCol)), vecCol, "__cn")
    val qs   = withNorm(queries.select(col(qidCol), col(qvecCol)), qvecCol, "__qn")
    cand
      .crossJoin(broadcast(qs))
      .where(if (excludeSelf) col(idCol) =!= col(qidCol) else lit(true))
      .withColumn("__sim",
        cosScore(VectorExpressions.vecDot(col(vecCol), col(qvecCol)), col("__cn"), col("__qn")))
      .groupBy(col(qidCol))
      .agg(count_if(col("__sim") >= threshold).as("n_matches"))
  }

  /** Embedding-cosine near-duplicate pairs (G1's embedding variant): ALL
    * pairs with cosine >= threshold, EXACT.
    *
    * An exact threshold join is inherently Θ(n²) dot products on
    * unstructured data — what an engine controls is the join SHAPE. The
    * round-1 formulation was a non-equi self-join (`id_a < id_b`), which
    * Spark plans as a BroadcastNestedLoopJoin: one side fully broadcast,
    * dead at corpus scale. This one is the block-matrix shape: hash each
    * vector into one of ~n/chunkRows chunks, replicate the left side to
    * every chunk pair (ca <= cb) via an `explode(sequence(...))` — an
    * EQUI-join on the chunk id, so each task scores one bounded
    * chunk-pair block and nothing is ever broadcast or nested-looped.
    * Every unordered pair is scored exactly once: cross-chunk pairs when
    * the left row's chunk <= the right row's chunk (ids emitted
    * least/greatest), same-chunk pairs gated by id order.
    *
    * The sublinear *approximate* path is [[cosineDupPairsLsh]]; at 100 TB
    * run that (or dedup at a higher threshold on IVF cells) — exact
    * τ=0.3 over random vectors is a correctness anchor, not a scale claim.
    */
  def cosineDupPairs(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      chunkRows: Int = 1024
  ): DataFrame = {
    // size the chunk grid from the RAW id column (no norm work in the count
    // job), and materialize the normed+chunked frame once — it feeds BOTH
    // join sides, so left lazy the scan + norm would run twice more
    val n = vectors.select(col(idCol)).count()
    val nChunks = math.max(1L, (n + chunkRows - 1) / chunkRows).toInt
    val chunked = withNorm(vectors.select(col(idCol), col(vecCol)), vecCol, "__n")
      .withColumn("__chunk", pmod(xxhash64(col(idCol)), lit(nChunks)).cast("int"))
      .localCheckpoint()
    val a = chunked
      .select(col(idCol).as("__ida"), col(vecCol).as("__va"), col("__n").as("__na"),
        col("__chunk").as("__ca"),
        explode(sequence(col("__chunk"), lit(nChunks - 1))).as("__cb"))
    val b = chunked
      .select(col(idCol).as("__idb"), col(vecCol).as("__vb"), col("__n").as("__nb"),
        col("__chunk").as("__cb"))
    a.join(b, Seq("__cb"))
      .where(col("__ca") < col("__cb") || col("__ida") < col("__idb"))
      .withColumn("__sim",
        cosScore(VectorExpressions.vecDot(col("__va"), col("__vb")), col("__na"), col("__nb")))
      .where(col("__sim") >= threshold)
      .select(
        least(col("__ida"), col("__idb")).as("id_a"),
        greatest(col("__ida"), col("__idb")).as("id_b"),
        epsRound(col("__sim"), 4).as("cosine"))
  }

  /** SemDeDup-style cluster-bounded near-dup pairs: candidates are pairs
    * sharing an IVF coarse cell (from the persisted index's encoded table),
    * each verified with the exact cosine — the published SemDeDup recipe
    * (k-means cluster the embeddings, then dedup WITHIN clusters). The
    * within-cell self-join is an equi-join on the cell id, so the cost is
    * Σ|cell|² ≈ n²/nCells dot products in bounded per-cell blocks, not the
    * corpus-wide Θ(n²) of [[cosineDupPairs]] — at 100 TB, nCells scales
    * with the corpus and this stays tractable. Precision 1.0 (every
    * emitted pair is exact-verified); recall misses only cross-cell pairs,
    * pinned by the spec against the exact anchor.
    *
    * @param cells `(id, cell)` assignment, e.g.
    *   `AnnIndex.loadEncoded(...).select(idCol, "__cell")` — reusing the
    *   quantizer the ANN queries already persist. Vectors whose id is
    *   ABSENT from `cells` are silently excluded (inner join) — rebuild or
    *   incrementally extend the index before deduping a grown corpus, or
    *   the new docs dedup against nothing.
    */
  def semanticDedupPairs(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      cells: DataFrame,
      cellCol: String,
      threshold: Double
  ): DataFrame = {
    val v = withNorm(vectors.select(col(idCol), col(vecCol)), vecCol, "__n")
      .join(cells.select(col(idCol), col(cellCol).as("__cell")), Seq(idCol))
    val a = v.select(col("__cell"), col(idCol).as("id_a"),
      col(vecCol).as("__va"), col("__n").as("__na"))
    val b = v.select(col("__cell"), col(idCol).as("id_b"),
      col(vecCol).as("__vb"), col("__n").as("__nb"))
    a.join(b, Seq("__cell"))
      .where(col("id_a") < col("id_b"))
      .withColumn("__sim",
        cosScore(VectorExpressions.vecDot(col("__va"), col("__vb")), col("__na"), col("__nb")))
      .where(col("__sim") >= threshold)
      .select(col("id_a"), col("id_b"), epsRound(col("__sim"), 4).as("cosine"))
  }

  /** Approximate near-dup pairs via hyperplane-LSH candidate generation +
    * exact cosine verification: candidates = pairs sharing a bucket in any
    * table (equi-join), each verified with the true dot product, so
    * precision is 1.0 and cost is linear-ish in corpus size. Recall at a
    * LOW threshold is the honest caveat: P(bucket collision) for a pair at
    * cosine 0.3 with 12 planes is ~0.2%/table — hyperplane LSH separates
    * well only near cosine 1, so use this for true near-dup thresholds
    * (>= ~0.8) or crank numTables. This is the 100 TB path;
    * [[cosineDupPairs]] is the exact anchor.
    */
  /** @param maxBucketWidth frequency cap per (table, bucket): a degenerate
    *   hot bucket — and a mass-duplicate corpus, this operator's very
    *   input, produces exactly that — would otherwise self-join
    *   quadratically. Capped buckets drop out of candidate generation;
    *   pairs inside them usually still meet in a less-crowded table (the
    *   same documented approximation as [[lshTopK]] and SimHash). */
  def cosineDupPairsLsh(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      numTables: Int = 8,
      planes: Int = 12,
      dim: Int = 64,
      maxBucketWidth: Int = 100000
  ): DataFrame = {
    requireDimCovers(vectors, vecCol, dim)
    // NARROW bucket membership (id only): the numTables-way explosion and
    // the pair-dedup shuffle never carry a 64-float payload — vectors join
    // back only after the pair set is deduplicated (the same shape lshTopK
    // uses; carrying both vectors through the bucket self-join was ~2×dim
    // floats per candidate row of pure shuffle waste)
    val buckets = vectors
      .select(col(idCol),
        posexplode(lshBuckets(col(vecCol), numTables, planes, dim)).as(Seq("__t", "__b")))
    val narrow =
      if (maxBucketWidth == Int.MaxValue) buckets
      else {
        val keep = buckets.groupBy(col("__t"), col("__b"))
          .agg(count(lit(1)).as("__w")).where(col("__w") <= maxBucketWidth).drop("__w")
        buckets.join(keep, Seq("__t", "__b"), "left_semi")
      }
    val pairs = narrow.select(col("__t"), col("__b"), col(idCol).as("id_a"))
      .join(narrow.select(col("__t"), col("__b"), col(idCol).as("id_b")), Seq("__t", "__b"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
    val v = withNorm(vectors.select(col(idCol), col(vecCol)), vecCol, "__n")
    pairs
      .join(v.select(col(idCol).as("id_a"), col(vecCol).as("__va"), col("__n").as("__na")), Seq("id_a"))
      .join(v.select(col(idCol).as("id_b"), col(vecCol).as("__vb"), col("__n").as("__nb")), Seq("id_b"))
      .withColumn("__sim",
        cosScore(VectorExpressions.vecDot(col("__va"), col("__vb")), col("__na"), col("__nb")))
      .where(col("__sim") >= threshold)
      .select(col("id_a"), col("id_b"), epsRound(col("__sim"), 4).as("cosine"))
  }

  /** L2-normalized copies of the centroids (zero vectors left as-is).
    * Cell ranking by cosine(vec, c) equals ranking by dot(vec, c/|c|):
    * |vec| is constant across the argmax — so scoring needs ONE dot per
    * centroid, no norms at all (~3x fewer flops per row). */
  private[operators] def normalized(cents: Array[Array[Float]]): Array[Array[Float]] =
    cents.map { c =>
      val n = math.sqrt(c.foldLeft(0.0)((a, x) => a + x.toDouble * x)).toFloat
      if (n == 0f) c else c.map(_ / n)
    }

  /** Per-centroid dot scores as ONE transform over a single literal matrix
    * (rides the serialized plan to every executor, no shuffle). One small
    * expression instead of nCentroids parallel vecDot trees — the wide
    * `greatest(struct(...))` formulation measured seconds of codegen per
    * plan at 16×64 literals. */
  private def cellScores(normCents: Array[Array[Float]])(vec: Column): Column =
    VectorExpressions.centroidScores(vec, normCents)

  /** Nearest-centroid cell id (first cell wins score ties — deterministic).
    * Expects pre-[[normalized]] centroids. */
  private[operators] def nearestCell(normCents: Array[Array[Float]])(vec: Column): Column = {
    val scores = cellScores(normCents)(vec)
    (array_position(scores, array_max(scores)) - 1).cast("int")
  }

  /** The query's nProbe nearest cells, best first. Sorted by (-score, cell)
    * ascending: descending score with the LOWEST cell id first on ties —
    * the same tie rule as [[nearestCell]]'s array_position (first max), so
    * a tied candidate's assigned cell is always among the probed ones.
    * Expects pre-[[normalized]] centroids. */
  private def probeCells(normCents: Array[Array[Float]], nProbe: Int)(vec: Column): Column = {
    val scored = zip_with(
      cellScores(normCents)(vec),
      sequence(lit(0), lit(normCents.length - 1)),
      (s, i) => struct((-s).as("ns"), i.as("c")))
    transform(slice(array_sort(scored), 1, nProbe), s => s.getField("c"))
  }

  /** Spherical k-means (Lloyd) refinement of IVF centroids. Each iteration
    * is ONE distributed job: assign every vector to its nearest centroid
    * (plan-inlined literals, no shuffle), then the per-cell elementwise mean
    * via posexplode + groupBy(cell, component) — partial-aggregated
    * map-side, so the shuffle carries at most nCentroids × dim rows per
    * partition regardless of corpus size. Only the nCentroids × dim means
    * are collected to the driver. Empty cells keep their previous centroid.
    * Deterministic end-to-end (hash-ordered seeding, no RNG).
    */
  /** @param sampleMod refine on a deterministic ~1/sampleMod hash-sample of
    *   the corpus (1 = use everything). Lloyd on a representative sample is
    *   the scale path: centroid quality needs thousands of points per cell,
    *   not the full 100 TB corpus, and the sample is cached across
    *   iterations so each round re-reads nothing.
    */
  def kmeansCentroids(
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      nCentroids: Int,
      iters: Int,
      sampleMod: Int = 1
  ): Array[Array[Float]] = {
    // null vectors never train (same guard as Pq.train — a null in the
    // hash-ordered seed NPEs the collect, and a null in the refine sample
    // assigns a null cell that NPEs the driver's getInt); seed dimensions
    // must be uniform — the centroid matrix is flattened into one literal
    // (centroidScores), where a ragged seed silently misaligns every score
    var cents: Array[Array[Float]] = candidates
      .select(col(idCol), col(vecCol))
      .where(col(vecCol).isNotNull)
      .orderBy(xxhash64(col(idCol)))
      .limit(nCentroids)
      .collect()
      .map(r => r.getSeq[Float](1).toArray)
    require(cents.nonEmpty, "empty centroid seed (no non-null vectors)")
    require(cents.forall(_.length == cents.head.length),
      s"mixed vector dimensions in the centroid seed (expected uniform ${cents.head.length})")
    if (iters == 0) return cents
    val sample = candidates.select(col(idCol).as("__sid"), col(vecCol).as("__sv"))
      .where(col("__sv").isNotNull &&
        (if (sampleMod > 1) pmod(xxhash64(col("__sid")), lit(sampleMod)) === 0 else lit(true)))
      .cache()
    for (_ <- 0 until iters) {
      val byComponent = sample
        .select(nearestCell(normalized(cents))(col("__sv")).as("__cell"),
          posexplode(col("__sv")).as(Seq("__i", "__x")))
        .groupBy("__cell", "__i")
        .agg(sum(col("__x").cast("double")).as("__s"), count(lit(1)).as("__n"))
        .collect()
      val next = cents.map(_.clone())
      byComponent.foreach { r =>
        val cell = r.getInt(0); val i = r.getInt(1)
        next(cell)(i) = (r.getDouble(2) / r.getLong(3)).toFloat
      }
      cents = next
    }
    sample.unpersist()
    cents
  }

  /** IVF (inverted-file) approximate top-k: a deterministic coarse
    * quantizer (nCentroids vectors picked by id-hash order, optionally
    * Lloyd-refined) partitions the corpus into cells; each query scores
    * only the nProbe nearest cells. Cost per query drops from |corpus| to
    * ~ nProbe/nCentroids of it; recall depends on nProbe. Centroids are
    * collected to the driver (tiny) and baked into the plan as literals —
    * no shuffle to assign.
    */
  def ivfTopK(
      candidates: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      qidCol: String,
      qvecCol: String,
      k: Int,
      nCentroids: Int = 16,
      nProbe: Int = 4,
      refineIters: Int = 0,
      sampleMod: Int = 1
  ): DataFrame =
    ivfTopKWith(candidates, queries, idCol, vecCol, qidCol, qvecCol, k,
      kmeansCentroids(candidates, idCol, vecCol, nCentroids, refineIters, sampleMod), nProbe)

  /** [[ivfTopK]] against a PREBUILT coarse quantizer (AnnIndex.loadCentroids)
    * — the production read path: no training job, the tiny centroid matrix
    * rides the plan as literals and the corpus is scanned map-only. */
  def ivfTopKWith(
      candidates: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      qidCol: String,
      qvecCol: String,
      k: Int,
      rawCents: Array[Array[Float]],
      nProbe: Int = 4,
      excludeSelf: Boolean = true
  ): DataFrame = {
    val cents = normalized(rawCents)
    // coalesce(…, -1) makes the join key provably non-nullable: without it,
    // Catalyst infers IsNotNull(__cell) from the equi-join and pushes a
    // filter below the projection that RE-EVALUATES the full nCentroids×dim
    // cell scoring per corpus row (visible in the executed plan as a second
    // centroid_scores under the scan). A null vector scored null before and
    // matched nothing; as cell -1 it still matches nothing (probeCells
    // yields real cell ids only) — same rows, one scoring pass.
    val cand = withNorm(candidates.select(col(idCol), col(vecCol)), vecCol, "__cn")
      .withColumn("__cell", coalesce(nearestCell(cents)(col(vecCol)), lit(-1)))
    val qs = withNorm(queries.select(col(qidCol), col(qvecCol)), qvecCol, "__qn")
      .withColumn("__cell", explode(probeCells(cents, nProbe)(col(qvecCol))))

    // excludeSelf is a PARAMETER (like the exact paths): when queries are
    // NOT drawn from the corpus, an id coincidence would otherwise silently
    // drop a legitimate — possibly the nearest — neighbor
    val matched = cand
      .join(broadcast(qs), Seq("__cell"))
      .where(if (excludeSelf) col(idCol) =!= col(qidCol) else lit(true))
      .where(coalesce(col("__cn") * col("__qn"), lit(0.0)) =!= 0.0) // = isNotNull(__sim), O(1)/pair
      .withColumn("__sim",
        cosScore(VectorExpressions.vecDot(col(vecCol), col(qvecCol)), col("__cn"), col("__qn")))
    rankTopK(matched, qidCol, idCol, k, preFiltered = true)
      .select(col(qidCol), col("__rank").as("rank"), col(idCol), epsRound(col("__sim"), 4).as("cosine"))
  }

  /** IVF + PQ (the standard large-scale ANN composition): the coarse
    * quantizer restricts each query to `nProbe` cells' candidates, and PQ
    * ADC scores those without reading the original vectors — per candidate
    * the scan touches m ints instead of dim floats. At 100 TB the encoded
    * index is ~1/32 the corpus and the per-query work is
    * |probed cells| × m lookups.
    */
  def ivfPqTopK(
      candidates: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      qidCol: String,
      qvecCol: String,
      k: Int,
      cb: Pq.Codebooks,
      nCentroids: Int = 16,
      nProbe: Int = 4,
      refineIters: Int = 2
  ): DataFrame = {
    val rawCents = kmeansCentroids(candidates, idCol, vecCol, nCentroids, refineIters)
    // ONE map-only select computes codes, norm, and cell together — no
    // self-join, no shuffle on the corpus
    ivfPqTopKWith(
      Pq.encodeWithCell(candidates, idCol, vecCol, cb, rawCents),
      queries, idCol, qidCol, qvecCol, k, cb, rawCents, nProbe)
  }

  /** IVFADC against a PREBUILT index (AnnIndex): `enc` is the persisted
    * encoded corpus (id, codes, norm, __cell) and `rawCents` the persisted
    * coarse centroids — the query never touches the original embeddings at
    * all, which is the entire 100 TB point. */
  def ivfPqTopKWith(
      enc: DataFrame,
      queries: DataFrame,
      idCol: String,
      qidCol: String,
      qvecCol: String,
      k: Int,
      cb: Pq.Codebooks,
      rawCents: Array[Array[Float]],
      nProbe: Int = 4,
      excludeSelf: Boolean = true
  ): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    import graft.functions.{PqAdc, PqLut}
    val cents = normalized(rawCents)

    val qs = queries.select(
      col(qidCol),
      Bridge.column(PqLut(Bridge.expression(col(qvecCol)), cb.cents, cb.m, cb.k)).as("__lut"),
      Fns.l2Norm(col(qvecCol)).as("__qn"),
      explode(probeCells(cents, nProbe)(col(qvecCol))).as("__cell"))

    val scored = enc
      .join(broadcast(qs), Seq("__cell"))
      .where(if (excludeSelf) col(idCol) =!= col(qidCol) else lit(true))
      // = isNotNull(__sim) at O(1)/pair: null __lut implies a null qvec,
      // whose norm __qn is null too — the norm product catches it without
      // re-running the ADC in the join condition. codes is guarded
      // EXPLICITLY (r13 ADVICE): on a corrupt index a null-codes row could
      // carry a non-null norm, and it must drop here, not enter the top-k
      // window as a null-scored candidate. An IsNotNull on a stored column
      // is O(1)/row and pushes to the scan as a plain PushedFilter.
      .where(col("codes").isNotNull &&
        coalesce(col("norm") * col("__qn"), lit(0.0)) =!= 0.0)
      .withColumn("__sim",
        Bridge.column(PqAdc(
          Bridge.expression(col("codes")), Bridge.expression(col("__lut")), cb.k)) /
          nullif(col("norm") * col("__qn"), lit(0.0)))
    rankTopK(scored, qidCol, idCol, k, preFiltered = true)
      .select(col(qidCol), col("__rank").as("rank"), col(idCol),
        epsRound(col("__sim"), 4).as("cosine_approx"))
  }

  /** Deterministic pseudo-random hyperplanes: component (t, p, i) derived
    * from a splitmix64-style mix of the indices — no RNG state, fully
    * reproducible (same plan on every executor).
    */
  private def hyperplane(table: Int, plane: Int, dim: Int): Array[Double] = {
    def mix(z0: Long): Double = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      // map to (-1, 1)
      (z.toDouble / Long.MaxValue.toDouble)
    }
    // disjoint bit fields, NOT small multiplicative strides: with strides
    // (1000003, 10007) component (t, p+1, i) = (t, p, i+10007) for every
    // dim > 10007 — consecutive planes share shifted components at real
    // embedding widths (12288), silently breaking plane independence and
    // the 1-(1-s^r)^b recall model. Packing (table<<44 | plane<<32 | i)
    // is collision-free for dim < 2^32, planes < 2^12, tables < 2^20.
    require(plane < (1 << 12) && table < (1 << 20),
      s"hyperplane seed packing supports planes < 4096, tables < 1048576; got ($table, $plane)")
    Array.tabulate(dim)(i =>
      mix((table.toLong << 44) | (plane.toLong << 32) | i.toLong))
  }

  /** All tables' random-hyperplane signatures fused into one native
    * expression evaluation (array indexed by table). Each of the
    * numTables*planes plane arrays is generated ONCE and copied into the
    * flat literal — the obvious per-component `hyperplane(...)(i)` form
    * regenerates a full dim-length array per element, O(tables*planes*dim²)
    * driver work at plan build (seconds of pure waste at dim=4096). */
  private def lshBuckets(vec: Column, numTables: Int, planes: Int, dim: Int): Column = {
    val flat = new Array[Float](numTables * planes * dim)
    var j = 0
    for (t <- 0 until numTables; p <- 0 until planes) {
      val pl = hyperplane(t, p, dim)
      var i = 0
      while (i < dim) { flat(j) = pl(i).toFloat; j += 1; i += 1 }
    }
    org.apache.spark.sql.graft.Bridge.column(
      graft.functions.HyperplaneBuckets(
        org.apache.spark.sql.graft.Bridge.expression(vec), flat, numTables, planes))
  }

  /** Approximate top-k: candidates and queries are bucketed by numTables
    * hyperplane signatures; a candidate is scored only if it shares a
    * bucket with the query in some table. Recall rises with numTables;
    * cost per query drops from |corpus| to the matched buckets' size.
    *
    * Shape (the round-2 regression was here): candidate generation runs on
    * NARROW (table, bucket, id) rows — vectors join in only after the
    * (id, query) pair set is deduplicated, so the numTables-way explosion
    * and its dedup shuffle never carry a 64-float payload, and the corpus
    * itself never shuffles (pairs and queries broadcast back against it).
    * Scoring uses the fused native dot (same bit-stable fold as the exact
    * paths), not a HOF lambda.
    *
    * @param maxBucketWidth corpus-side frequency cap per (table, bucket):
    *   a degenerate hot bucket (mass-duplicate corpus) would explode
    *   candidates quadratically; buckets wider than this are dropped from
    *   candidate generation — pairs inside them usually still meet in a
    *   less-crowded table (documented approximation, as in SimHash).
    */
  def lshTopK(
      candidates: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      qidCol: String,
      qvecCol: String,
      k: Int,
      numTables: Int = 8,
      planes: Int = 12,
      dim: Int = 64,
      maxBucketWidth: Int = 100000,
      excludeSelf: Boolean = true
  ): DataFrame = {
    requireDimCovers(candidates, vecCol, dim)
    // the query side truncates in bucketing exactly like the corpus side —
    // a 128-dim query against dim=64 hashes only its first half and recall
    // quietly degrades, the config mistake this probe exists to catch
    requireDimCovers(queries, qvecCol, dim)
    // narrow bucket membership: (table, bucket, id) — no vectors, no norms
    val candBuckets = candidates
      .select(col(idCol), posexplode(lshBuckets(col(vecCol), numTables, planes, dim)).as(Seq("__t", "__b")))
    val qsBuckets = queries
      .select(col(qidCol), posexplode(lshBuckets(col(qvecCol), numTables, planes, dim)).as(Seq("__t", "__b")))
    val narrow =
      if (maxBucketWidth == Int.MaxValue) candBuckets
      else {
        val keep = candBuckets.groupBy(col("__t"), col("__b"))
          .agg(count(lit(1)).as("__w")).where(col("__w") <= maxBucketWidth).drop("__w")
        candBuckets.join(keep, Seq("__t", "__b"), "left_semi")
      }
    // candidate (id, query) pairs, deduplicated while still narrow.
    // excludeSelf is a PARAMETER like every other top-k path (exact, IVF,
    // IVFPQ): when queries are NOT drawn from the corpus, an id
    // coincidence would otherwise silently drop a legitimate — possibly
    // the nearest — neighbor
    val pairs = narrow
      .join(broadcast(qsBuckets), Seq("__t", "__b"))
      .where(if (excludeSelf) col(idCol) =!= col(qidCol) else lit(true))
      .select(col(idCol), col(qidCol))
      .dropDuplicates(idCol, qidCol)

    // score: corpus scan + joins back. Queries broadcast (small by
    // assumption); the PAIR set gets NO broadcast hint — its bound is
    // |Q| × maxBucketWidth × numTables, which the default cap allows past
    // any broadcast limit, so let AQE pick broadcast only when it measures
    // small (a forced broadcast here OOMs the driver on skewed corpora)
    val qs = withNorm(queries.select(col(qidCol), col(qvecCol)), qvecCol, "__qn")
    val matched = withNorm(candidates.select(col(idCol), col(vecCol)), vecCol, "__cn")
      .join(pairs, Seq(idCol))
      .join(broadcast(qs), Seq(qidCol))
      .where(coalesce(col("__cn") * col("__qn"), lit(0.0)) =!= 0.0) // = isNotNull(__sim), O(1)/pair
      .withColumn("__sim",
        cosScore(VectorExpressions.vecDot(col(vecCol), col(qvecCol)), col("__cn"), col("__qn")))
    rankTopK(matched, qidCol, idCol, k, preFiltered = true)
      .select(col(qidCol), col("__rank").as("rank"), col(idCol), epsRound(col("__sim"), 4).as("cosine"))
  }

  /** Exact k-nearest-neighbor SELF-join: every vector in the corpus gets
    * its k nearest neighbors by cosine (desc, neighbor id asc tie-break) —
    * the kNN-graph construction primitive behind semantic clustering,
    * diversity sampling, and graph-based dedup audits. Unlike
    * [[cosineTopK]] (small broadcast query set), BOTH sides are the
    * corpus, so the join uses the [[cosineDupPairs]] block-matrix shape:
    * vectors hash into ~n/chunkRows chunks, the query side replicates to
    * every chunk via `explode(sequence(...))`, and the join is an
    * EQUI-join on the chunk id — bounded per-task blocks, nothing
    * broadcast or nested-looped. Candidates then reduce through the
    * bounded-heap TopKStructs aggregate, so only k rows per (vector,
    * map partition) cross the shuffle, never the n_per_chunk candidates.
    *
    * Exact kNN-join is Θ(n²) dot products by definition — this is the
    * correctness anchor. The scale path is [[knnJoinCells]]: restrict
    * candidates to the persisted quantizer's coarse cells.
    */
  def knnJoin(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      chunkRows: Int = 1024
  ): DataFrame = {
    import org.apache.spark.sql.graft.TopKStructs
    requireIntegralId(vectors, idCol, "knnJoin")
    val n = vectors.select(col(idCol)).count()
    // Scale-adaptive chunk count: ceil(n / chunkRows) bounds per-task block
    // size, but must never leave cores idle — at small n it used to produce
    // 2 chunks, i.e. a 2-key equi-join that parked 30 of 32 cores for the
    // whole n² stage (the skew shape of guide §2.5). Floor the chunk count
    // at 4x the scheduler's parallelism (capped by n) so the join keys
    // always outnumber partitions and hash-spread evenly.
    val par = vectors.sparkSession.sparkContext.defaultParallelism.toLong
    val nChunks = math.max(1L,
      math.max((n + chunkRows - 1) / chunkRows, math.min(par * 4, n))).toInt
    val chunked = withNorm(vectors.select(col(idCol), col(vecCol)), vecCol, "__n")
      .withColumn("__chunk", pmod(xxhash64(col(idCol)), lit(nChunks)).cast("int"))
      .localCheckpoint()
    // Symmetric halving: cosine is operand-order-invariant (the dot's
    // per-dim products and the norm product are commutative, so the double
    // is BITWISE identical either way) — compute each unordered pair once
    // and emit it in both orientations. The a-side replicates each row only
    // to chunks >= its own; same-chunk pairs keep id_a < id_b. Every
    // unordered pair is produced exactly once: cross-chunk at
    // cb = chunk(b) > chunk(a), same-chunk under the id filter. Halves the
    // join rows and dot products of the O(n²) stage; the top-k aggregate
    // sees the same multiset of (key, candidate) rows as before.
    val a = chunked
      .select(col(idCol).as("__ida"), col(vecCol).as("__va"), col("__n").as("__na"),
        col("__chunk").as("__ca"),
        explode(sequence(col("__chunk"), lit(nChunks - 1))).as("__cb"))
    val b = chunked
      .select(col(idCol).as("__idb"), col(vecCol).as("__vb"), col("__n").as("__nb"),
        col("__chunk").as("__cb"))
    a.join(b, Seq("__cb"))
      .where(col("__ca") =!= col("__cb") || col("__ida") < col("__idb"))
      // same rows as isNotNull(__sim) at O(1)/pair — see cosineTopKAgg
      .where(coalesce(col("__na") * col("__nb"), lit(0.0)) =!= 0.0)
      .withColumn("__sim",
        cosScore(VectorExpressions.vecDot(col("__va"), col("__vb")), col("__na"), col("__nb")))
      .select(explode(array(
        struct(col("__ida").as("key"),
          struct(col("__sim").as("sim"), idComplement(col("__idb")).as("negid"),
            col("__idb").as("id")).as("s")),
        struct(col("__idb").as("key"),
          struct(col("__sim").as("sim"), idComplement(col("__ida")).as("negid"),
            col("__ida").as("id")).as("s")))).as("__e"))
      .select(col("__e.key").as("__ida"), col("__e.s").as("__s"))
      .groupBy(col("__ida"))
      .agg(TopKStructs.topK(col("__s"), k).as("__top"))
      .select(col("__ida").as(idCol), posexplode(col("__top")).as(Seq("__r", "__t")))
      .select(col(idCol), (col("__r") + 1).cast("long").as("rank"),
        col("__t").getField("id").as("neighbor_id"),
        epsRound(col("__t").getField("sim"), 4).as("cosine"))
  }

  /** Approximate kNN self-join bounded by the persisted coarse quantizer's
    * cells (same candidate source as [[semanticDedupPairs]]): neighbors are
    * searched only within each vector's cell, an equi-join on the cell id —
    * Σ|cell|² ≈ n²/nCells dot products, the shape that stays tractable when
    * nCells scales with the corpus. Results are exact-scored (precision 1
    * on the emitted neighbors); recall misses only cross-cell neighbors,
    * pinned by the spec against [[knnJoin]].
    *
    * @param cells `(id, cell)` from `AnnIndex.loadEncoded(...)`. As in
    *   [[semanticDedupPairs]], ids absent from `cells` are silently
    *   excluded by the inner join — keep the index in step with the corpus.
    */
  def knnJoinCells(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      cells: DataFrame,
      cellCol: String,
      k: Int
  ): DataFrame = {
    import org.apache.spark.sql.graft.TopKStructs
    requireIntegralId(vectors, idCol, "knnJoinCells")
    val v = withNorm(vectors.select(col(idCol), col(vecCol)), vecCol, "__n")
      .join(cells.select(col(idCol), col(cellCol).as("__cell")), Seq(idCol))
    val a = v.select(col("__cell"), col(idCol).as("__ida"),
      col(vecCol).as("__va"), col("__n").as("__na"))
    val b = v.select(col("__cell"), col(idCol).as("__idb"),
      col(vecCol).as("__vb"), col("__n").as("__nb"))
    a.join(b, Seq("__cell"))
      .where(col("__ida") =!= col("__idb"))
      // same rows as isNotNull(__sim) at O(1)/pair — see cosineTopKAgg
      .where(coalesce(col("__na") * col("__nb"), lit(0.0)) =!= 0.0)
      .withColumn("__sim",
        cosScore(VectorExpressions.vecDot(col("__va"), col("__vb")), col("__na"), col("__nb")))
      .select(col("__ida"),
        struct(col("__sim").as("sim"), idComplement(col("__idb")).as("negid"),
          col("__idb").as("id")).as("__s"))
      .groupBy(col("__ida"))
      .agg(TopKStructs.topK(col("__s"), k).as("__top"))
      .select(col("__ida").as(idCol), posexplode(col("__top")).as(Seq("__r", "__t")))
      .select(col(idCol), (col("__r") + 1).cast("long").as("rank"),
        col("__t").getField("id").as("neighbor_id"),
        epsRound(col("__t").getField("sim"), 4).as("cosine"))
  }

  /** SQ8 scalar quantization, train step: per-dimension [min, max] over
    * the corpus — one posexplode aggregation (map-side partial, dims ×
    * tasks rows cross the shuffle, never the corpus), assembled into a
    * single broadcastable row of (mins, maxs) arrays. The faiss
    * `ScalarQuantizer(QT_8bit)` recipe: 4× smaller vectors (8 bits/dim)
    * with a per-dim uniform grid, the storage tier below PQ's 64×.
    */
  def sq8Train(vectors: DataFrame, vecCol: String): DataFrame =
    vectors.select(posexplode(col(vecCol)).as(Seq("dim", "__x")))
      .groupBy(col("dim"))
      .agg(min(col("__x").cast("double")).as("__mn"), max(col("__x").cast("double")).as("__mx"))
      .groupBy()
      .agg(
        transform(array_sort(collect_list(struct(col("dim"), col("__mn")))),
          s => s.getField("__mn")).as("__mins"),
        transform(array_sort(collect_list(struct(col("dim"), col("__mx")))),
          s => s.getField("__mx")).as("__maxs"))

  /** SQ8 encode: code[d] = floor((x[d]−min[d]) / (max[d]−min[d]) · 255 +
    * 0.5 + 1e-9), CLAMPED to 0..255 (the epsilon pins floor away from
    * half-way boundaries so the SQL oracle replays the codes
    * digit-for-digit). When train saw the full corpus the clamp is a
    * no-op, but encode against PREVIOUSLY-trained ranges — incremental
    * ingest, the production shape — routinely sees out-of-range
    * components, and an unclamped code (-3, 261) silently decodes to a
    * point OUTSIDE the training box (faiss clamps for the same reason).
    * Degenerate dims (max = min) encode 0. Map-only after the one-row
    * broadcast join.
    */
  def sq8Encode(vectors: DataFrame, idCol: String, vecCol: String,
      ranges: DataFrame): DataFrame = {
    // backquote the interpolated identifier: every other method takes the
    // column through col(), so names needing quoting (spaces, dots) must
    // not silently parse as something else inside this one SQL fragment
    val v = "`" + vecCol.replace("`", "``") + "`"
    vectors.crossJoin(broadcast(ranges))
      .select(col(idCol), expr(
        s"""transform(sequence(1, size($v), 1), d -> cast(
           |  least(255.0D, greatest(0.0D, floor(
           |  CASE WHEN element_at(__maxs, d) = element_at(__mins, d) THEN 0.0D
           |       ELSE (cast(element_at($v, d) as double) - element_at(__mins, d))
           |            / (element_at(__maxs, d) - element_at(__mins, d)) * 255.0D
           |  END + 0.5D + 1e-9D))) as int))""".stripMargin).as("codes"))
  }

  /** SQ8 decode: x̂[d] = min[d] + code[d]/255 · (max[d]−min[d]) — each
    * reconstruction is within (max−min)/510 of the original by
    * construction (the spec pins the bound). */
  def sq8Decode(encoded: DataFrame, idCol: String, ranges: DataFrame): DataFrame =
    encoded.crossJoin(broadcast(ranges))
      .select(col(idCol), expr(
        """transform(sequence(1, size(codes), 1), d ->
          |  cast(element_at(__mins, d) + cast(element_at(codes, d) as double) / 255.0D
          |       * (element_at(__maxs, d) - element_at(__mins, d)) as float))""".stripMargin)
        .as("decoded"))

  /** Per-group embedding centroids (elementwise mean), long format:
    * (groupCol, dim, centroid). The shuffle carries at most
    * n_groups x dim rows per map task (posexplode with map-side partial
    * aggregation), never the corpus — the same scan shape Lloyd uses.
    */
  def groupCentroids(df: DataFrame, vecCol: String, groupCol: String): DataFrame =
    df.select(col(groupCol), posexplode(col(vecCol)).as(Seq("dim", "__x")))
      .groupBy(col(groupCol), col("dim"))
      .agg(avg(col("__x").cast("double")).as("centroid"))

  /** Per-vector L2 distance to its OWN group centroid — embedding-space
    * outlier scoring / cluster-quality audit (a training pipeline runs
    * this to find mislabeled or off-distribution items per source).
    * Centroids aggregate distributed (see [[groupCentroids]]), re-assemble
    * to arrays (n_groups rows), broadcast-join back, and the distance is a
    * map-only fold over the corpus scan. Output: (idCol, groupCol, dist).
    */
  def centroidDistances(df: DataFrame, idCol: String, vecCol: String,
      groupCol: String): DataFrame = {
    // NULL-SAFE join back (<=>): groupCentroids keeps groupCol=NULL as a
    // real group, and the null-label docs are the likeliest mislabeled
    // ones — a plain equi-join would compute their centroid and then
    // silently drop every one of them from the audit output
    val cents = groupCentroids(df, vecCol, groupCol)
      .groupBy(col(groupCol))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("centroid")))),
        s => s.getField("centroid")).as("__cent"))
      .withColumnRenamed(groupCol, "__g")
    df.select(col(idCol), col(groupCol), col(vecCol))
      .join(broadcast(cents), col(groupCol) <=> col("__g"))
      .drop("__g")
      .select(col(idCol), col(groupCol),
        epsRound(sqrt(aggregate(
          zip_with(col(vecCol), col("__cent"), (x, c) => {
            val d = x.cast("double") - c; d * d
          }),
          lit(0.0), (acc, v) => acc + v)), 4).as("dist"))
  }
}
