package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Fns, PqAdc, PqEncode, PqLut}
import org.apache.spark.sql.graft.Bridge

/** Product quantization (G2 scale path beyond IVF): compress each
  * d-dim float vector to `m` small integer codes (one per d/m-dim
  * subspace, each quantized against its own k-codeword codebook), then
  * score candidates against a query WITHOUT touching the original
  * vectors — asymmetric distance computation (ADC): per query build the
  * m×k table of subspace dot products once, and each candidate's
  * approximate dot is m table lookups. 64-dim float vectors at m=8,k=16
  * shrink 256 bytes -> 8 codes; the 100 TB corpus scan becomes a scan of
  * the code table.
  *
  * Spark-shaped: codebooks are trained on a driver-side hash-sample
  * (standard practice — codebook quality needs thousands of points, not
  * the corpus; faiss trains exactly this way), ride into the plan as
  * literal arrays inside three fused native expressions
  * ([[graft.functions.PqEncode]] / [[PqLut]] / [[PqAdc]]), and encode /
  * score are map-only — no shuffle anywhere except the final top-k
  * window.
  */
object Pq {

  /** Flat row-major codebooks: cents(((s * k) + c) * dsub + i). */
  case class Codebooks(m: Int, k: Int, dsub: Int, cents: Array[Float])

  /** Train per-subspace codebooks with Lloyd iterations on a
    * deterministic hash-sample collected to the driver (≤ maxSample
    * vectors — k*m centroids of dsub floats need thousands of points, so
    * the sample, not the corpus, is the right training set at any scale).
    */
  def train(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int = 8,
      k: Int = 16,
      iters: Int = 5,
      maxSample: Int = 10000): Codebooks = {
    // null vectors never train (a single null in the hash-ordered sample
    // NPE'd the whole build); dimension uniformity is asserted below —
    // a short vector among the sample would otherwise misindex in Lloyd
    val sample: Array[Array[Float]] = df
      .select(col(idCol), col(vecCol))
      .where(col(vecCol).isNotNull)
      .orderBy(xxhash64(col(idCol)))
      .limit(maxSample)
      .collect()
      .map(_.getSeq[Float](1).toArray)
    require(sample.nonEmpty, "empty training sample")
    val dim = sample.head.length
    require(sample.forall(_.length == dim),
      s"mixed vector dimensions in the training sample (expected uniform $dim)")
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m

    val cents = new Array[Float](m * k * dsub)
    for (s <- 0 until m) {
      // init: first k sampled subvectors (hash order = deterministic shuffle)
      for (c <- 0 until k; i <- 0 until dsub)
        cents((s * k + c) * dsub + i) = sample(c % sample.length)(s * dsub + i)
      for (_ <- 0 until iters) {
        val sums = Array.ofDim[Double](k, dsub)
        val counts = new Array[Long](k)
        sample.foreach { v =>
          var best = 0; var bestD = Double.MaxValue
          for (c <- 0 until k) {
            var d = 0.0
            var i = 0
            while (i < dsub) {
              val diff = v(s * dsub + i) - cents((s * k + c) * dsub + i)
              d += diff * diff; i += 1
            }
            if (d < bestD) { bestD = d; best = c }
          }
          counts(best) += 1
          var i = 0
          while (i < dsub) { sums(best)(i) += v(s * dsub + i); i += 1 }
        }
        for (c <- 0 until k if counts(c) > 0; i <- 0 until dsub)
          cents((s * k + c) * dsub + i) = (sums(c)(i) / counts(c)).toFloat
      }
    }
    Codebooks(m, k, dsub, cents)
  }

  /** Map-only encode: (id, codes array<int>, norm). The norm is kept so
    * ADC dot products can be turned into cosine scores later. */
  def encode(df: DataFrame, idCol: String, vecCol: String, cb: Codebooks): DataFrame =
    df.select(
      col(idCol),
      Bridge.column(PqEncode(Bridge.expression(col(vecCol)), cb.cents, cb.m, cb.k)).as("codes"),
      Fns.l2Norm(col(vecCol)).as("norm"))

  /** [[encode]] plus the IVF coarse-cell assignment, still ONE map-only
    * pass — the index-build scan (AnnIndex persists its output). `rawCents`
    * are un-normalized coarse centroids in cell order. */
  def encodeWithCell(
      df: DataFrame, idCol: String, vecCol: String,
      cb: Codebooks, rawCents: Array[Array[Float]]): DataFrame =
    df.select(
      col(idCol),
      Bridge.column(PqEncode(Bridge.expression(col(vecCol)), cb.cents, cb.m, cb.k)).as("codes"),
      Fns.l2Norm(col(vecCol)).as("norm"),
      Similarity.nearestCell(Similarity.normalized(rawCents))(col(vecCol)).as("__cell"))

  /** Approximate cosine top-k over PQ codes: queries broadcast against the
    * code table; each candidate costs m table lookups. Output shape is
    * (qidCol, rank, idCol, cosine_approx) — same structure as the exact
    * cosineTopK but the score column is named `cosine_approx` to mark the
    * PQ approximation. ([[Similarity.ivfPqTopKWith]] is this scoring plus
    * a coarse-cell probe join; the two share the LUT/ADC expressions.)
    */
  def topK(
      encoded: DataFrame,
      queries: DataFrame,
      idCol: String,
      qidCol: String,
      qvecCol: String,
      k: Int,
      cb: Codebooks,
      excludeSelf: Boolean = true): DataFrame = {
    val qs = queries.select(
      col(qidCol),
      Bridge.column(PqLut(Bridge.expression(col(qvecCol)), cb.cents, cb.m, cb.k)).as("__lut"),
      Fns.l2Norm(col(qvecCol)).as("__qn"))
    val scored = encoded
      .join(broadcast(qs),
        if (excludeSelf) col(idCol) =!= col(qidCol) else lit(true))
      .withColumn("__sim",
        Bridge.column(PqAdc(
          Bridge.expression(col("codes")), Bridge.expression(col("__lut")), cb.k)) /
          nullif(col("norm") * col("__qn"), lit(0.0)))
    val w = Window.partitionBy(col(qidCol)).orderBy(col("__sim").desc, col(idCol).asc)
    // null sims (zero-norm pairs) are DROPPED before ranking — the same
    // rule as every Similarity top-k path; desc ordering puts nulls LAST,
    // so without the filter a short candidate list would pad the top-k
    // with null-scored rows the exact paths never emit
    scored
      .where(col("__sim").isNotNull)
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col(qidCol), col("rank"), col(idCol), round(col("__sim"), 4).as("cosine_approx"))
  }
}
