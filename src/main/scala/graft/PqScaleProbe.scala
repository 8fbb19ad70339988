package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Pq, Similarity}

/** Dev harness: product quantization at synthetic scale. Generates nVecs
  * 64-dim vectors in `nClusters` direction clusters (deterministic hash
  * jitter), trains codebooks on the standard driver sample, encodes the
  * corpus (256 bytes -> 8 codes/vector), runs ADC top-10 for nQueries
  * queries, and reports recall@10 against the exact brute-force ranking.
  * Usage: runMain graft.PqScaleProbe [nVecs] [nQueries]
  */
object PqScaleProbe {
  def main(args: Array[String]): Unit = {
    val nVecs = args.headOption.map(_.toLong).getOrElse(100000L)
    val nQueries = args.lift(1).map(_.toInt).getOrElse(50)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dim = 64
    // clusters of ~11 vectors: each query's true top-10 IS its cluster, so
    // recall measures whether ADC separates clusters (the task PQ is for),
    // not whether it resolves sub-quantization jitter inside one
    val nClusters = math.max(1L, nVecs / 11L)
    // vector = cluster direction (unit-ish hash noise) + small per-vector jitter
    val comps = transform(sequence(lit(0), lit(dim - 1)), j =>
      (pmod(xxhash64(pmod(col("id"), lit(nClusters.toLong)), j), lit(1000L)).cast("double") / 500.0 - 1.0) +
        (pmod(xxhash64(col("id"), j, lit(7)), lit(1000L)).cast("double") / 5000.0 - 0.1))
    val vecs = spark.range(nVecs)
      .select(col("id").as("vec_id"),
        transform(comps, x => x.cast("float")).as("embedding"))
      .cache()
    vecs.count()

    val t0 = System.nanoTime()
    val cb = Pq.train(vecs, "vec_id", "embedding", m = 8, k = 16, iters = 4)
    val enc = Pq.encode(vecs, "vec_id", "embedding", cb).cache()
    enc.count()
    val tEnc = (System.nanoTime() - t0) / 1e9

    val qs = vecs.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val k = 10
    val t1 = System.nanoTime()
    val approx = Pq.topK(enc, qs, "vec_id", "query_id", "qvec", k, cb)
      .select(col("query_id"), col("vec_id")).collect()
    val tAdc = (System.nanoTime() - t1) / 1e9
    val t2 = System.nanoTime()
    val exact = Similarity.cosineTopK(vecs, qs, "vec_id", "embedding", "query_id", "qvec", k)
      .select(col("query_id"), col("vec_id")).collect()
    val tExact = (System.nanoTime() - t2) / 1e9

    val approxSets = approx.groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val exactSets = exact.groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val recall = exactSets.map { case (q, ex) =>
      approxSets.getOrElse(q, Set.empty[Long]).intersect(ex).size.toDouble / ex.size
    }.sum / exactSets.size

    println(f"[pq-scale] vecs=$nVecs queries=$nQueries recall@$k=$recall%.3f " +
      f"train+encode=$tEnc%.1fs adc=$tAdc%.1fs exact=$tExact%.1fs")

    // ---- incremental-append leg (round-8: AnnIndex.appendToIndex) ------
    // Build the persisted index on 3/4 of the corpus, append the last
    // quarter with the FROZEN quantizer, and verify (a) the append costs
    // time ∝ batch (not corpus — compare to the full build), and (b)
    // recall@10 over the appended index matches the full-build index
    // within noise: the frozen quantizer represents the in-distribution
    // batch, so appending must not silently dent recall.
    import graft.operators.AnnIndex
    val tmpBase = java.nio.file.Files.createTempDirectory("graft_pq_probe")
    val fullIdx = tmpBase.resolve("full").toString
    val baseIdx = tmpBase.resolve("base").toString
    val t3 = System.nanoTime()
    AnnIndex.build(vecs, "vec_id", "embedding", fullIdx, nCentroids = 64)
    val tFull = (System.nanoTime() - t3) / 1e9
    AnnIndex.build(vecs.where(col("vec_id") % 4 =!= 3), "vec_id", "embedding",
      baseIdx, nCentroids = 64)
    val t4 = System.nanoTime()
    AnnIndex.appendToIndex(vecs.where(col("vec_id") % 4 === 3),
      "vec_id", "embedding", baseIdx)
    val tAppend = (System.nanoTime() - t4) / 1e9
    def recallOf(idx: String): Double = {
      val got = Similarity.ivfPqTopKWith(AnnIndex.loadEncoded(spark, idx), qs,
          "vec_id", "query_id", "qvec", k,
          AnnIndex.loadCodebooks(spark, idx), AnnIndex.loadCentroids(spark, idx))
        .select(col("query_id"), col("vec_id")).collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      exactSets.map { case (q, ex) =>
        got.getOrElse(q, Set.empty[Long]).intersect(ex).size.toDouble / ex.size
      }.sum / exactSets.size
    }
    val (rFull, rAppended) = (recallOf(fullIdx), recallOf(baseIdx))
    println(f"[pq-scale] append leg: full-build=$tFull%.1fs append(1/4)=$tAppend%.1fs " +
      f"recall@$k full=$rFull%.3f appended=$rAppended%.3f")
    graft.sources.DeltaInterop.deleteRecursively(tmpBase)
    spark.stop()
  }
}
