package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication operators (SURVEY.md §2 G1 — capability-mandated
  * extension; the reference's EMBEDDING value type at
  * /root/reference/src/registry/feature_registry.py:42 is its only hook).
  *
  * Three tiers, by scale:
  *  - [[exactStats]] / [[exactGroups]]: content-hash groupBy — one shuffle,
  *    works at any scale.
  *  - [[jaccardPairs]]: exact n-gram Jaccard within small blocking groups —
  *    O(block²); correctness anchor and oracle-checkable.
  *  - [[minhashPairs]]: MinHash + LSH banding — the 100 TB path. Signature
  *    computation is embarrassingly parallel; candidate generation is an
  *    equi-join on (band, bucket) (never a cross join); only candidates pay
  *    the exact-verification cost. Recall at threshold s is
  *    1-(1-s^r)^b (r rows/band, b bands) — tune per corpus.
  *  - [[simhash]] + [[simhashPairs]]: 64-bit SimHash with pigeonhole chunk
  *    bucketing for hamming-distance candidates.
  *
  * All hashing uses Spark's deterministic xxhash64 (fixed seed) — results
  * are reproducible across runs and partitionings.
  */
object Dedup {

  /** Distinct word n-gram shingles of a text column. */
  def wordShingles(text: Column, n: Int): Column = {
    val words = split(trim(text), "\\s+")
    array_distinct(
      transform(
        sequence(lit(0), greatest(size(words) - n, lit(0))),
        i => concat_ws(" ", slice(words, i + 1, lit(n)))
      )
    )
  }

  /** Exact-duplicate summary over a content hash (single row). */
  def exactStats(docs: DataFrame, textCol: String): DataFrame = {
    val groups = docs
      .groupBy(sha2(col(textCol), 256).as("text_hash"))
      .agg(count(lit(1)).as("n"))
    groups.agg(
      sum("n").cast("long").as("n_docs"),
      count(lit(1)).as("n_distinct_texts"),
      count_if(col("n") > 1).as("n_dup_groups"),
      sum(when(col("n") > 1, col("n")).otherwise(0)).cast("long").as("n_dup_docs")
    )
  }

  /** Exact-duplicate groups: canonical (min) id per content hash. */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .groupBy(sha2(col(textCol), 256).as("text_hash"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_docs"))

  /** Exact n-gram Jaccard near-dup pairs within blocking groups.
    * O(block²) — use only when blocks are small; [[minhashPairs]] otherwise.
    * Jaccard = |A ∩ B| / |A ∪ B| over distinct shingles (integer counts, so
    * the double division is bit-identical across engines).
    */
  def jaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      blockCols: Seq[String],
      shingleN: Int,
      threshold: Double
  ): DataFrame = {
    val sh = docs.select(
      (col(idCol) +: blockCols.map(col)) :+ wordShingles(col(textCol), shingleN).as("__sh"): _*
    )
    val a = sh.select((sh.columns.map(c => col(c).as(s"a_$c"))).toSeq: _*)
    val b = sh.select((sh.columns.map(c => col(c).as(s"b_$c"))).toSeq: _*)
    val cond = blockCols.map(c => col(s"a_$c") === col(s"b_$c")).foldLeft(col(s"a_$idCol") < col(s"b_$idCol"))(_ && _)
    a.join(b, cond)
      .withColumn(
        "jaccard",
        size(array_intersect(col("a___sh"), col("b___sh"))).cast("double") /
          size(array_union(col("a___sh"), col("b___sh"))).cast("double")
      )
      .where(col("jaccard") >= threshold)
      .select(col(s"a_$idCol").as("id_a"), col(s"b_$idCol").as("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** MinHash signature: for hash i, min over shingles of xxhash64(shingle, i). */
  private def minhashSig(shingles: Column, numHashes: Int): Column =
    array((0 until numHashes).map { i =>
      array_min(transform(shingles, s => xxhash64(s, lit(i))))
    }: _*)

  /** MinHash-LSH near-dup pairs, exact-verified.
    *
    * numHashes = bands * rowsPerBand. Candidates = pairs agreeing on all
    * rows of at least one band; each candidate is then verified with the
    * exact shingle Jaccard, so precision is 1.0 and only recall depends on
    * the banding.
    */
  def minhashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      bands: Int = 24,
      rowsPerBand: Int = 2,
      threshold: Double = 0.3
  ): DataFrame = {
    val numHashes = bands * rowsPerBand
    val sh = docs
      .select(col(idCol).as("__id"), wordShingles(col(textCol), shingleN).as("__sh"))
      .withColumn("__sig", minhashSig(col("__sh"), numHashes))

    // band buckets: hash of the band's signature slice (+ band index)
    val buckets = array((0 until bands).map { bIdx =>
      xxhash64(lit(bIdx), slice(col("__sig"), bIdx * rowsPerBand + 1, rowsPerBand))
    }: _*)
    val exploded = sh
      .select(col("__id"), col("__sh"), posexplode(buckets).as(Seq("__band", "__bucket")))

    val l = exploded.select(col("__band"), col("__bucket"), col("__id").as("id_a"), col("__sh").as("sh_a"))
    val r = exploded.select(col("__band"), col("__bucket"), col("__id").as("id_b"), col("__sh").as("sh_b"))
    val candidates = l
      .join(r, Seq("__band", "__bucket"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b")
      .dropDuplicates("id_a", "id_b")

    candidates
      .withColumn(
        "jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double")
      )
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** 64-bit SimHash per document: bit j of the hash is the sign of the sum
    * over tokens of ±1 according to bit j of xxhash64(token). Computed as a
    * single groupBy with 64 partial-aggregable sums (one pass, map-side
    * combine — scales linearly).
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol), explode(split(trim(col(textCol)), "\\s+")).as("__t"))
      .withColumn("__h", xxhash64(col("__t")))
    val sums = (0 until 64).map { j =>
      sum(when(shiftright(col("__h"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"__s$j")
    }
    val withSums = tok.groupBy(col(idCol)).agg(sums.head, sums.tail: _*)
    val bitsExpr = (0 until 64)
      .map(j => when(col(s"__s$j") > 0, shiftleft(lit(1L), j)).otherwise(lit(0L)))
      .reduce((x, y) => x.bitwiseOR(y))
    withSums.select(col(idCol), bitsExpr.as("simhash"))
  }

  /** SimHash near-dup pairs with hamming distance <= maxHamming, using
    * 4x16-bit chunk pigeonhole bucketing (any pair within hamming 3 shares
    * at least one exact chunk; larger maxHamming trades recall).
    */
  def simhashPairs(sims: DataFrame, idCol: String, maxHamming: Int): DataFrame = {
    val chunks = array((0 until 4).map { c =>
      struct(lit(c).as("chunk"), shiftright(col("simhash"), c * 16).bitwiseAND(0xFFFFL).as("v"))
    }: _*)
    val ex = sims.select(col(idCol).as("__id"), col("simhash"), explode(chunks).as("__c"))
    val l = ex.select(col("__c"), col("__id").as("id_a"), col("simhash").as("sh_a"))
    val r = ex.select(col("__c"), col("__id").as("id_b"), col("simhash").as("sh_b"))
    l.join(r, Seq("__c"))
      .where(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .where(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}
