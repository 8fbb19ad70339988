package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.CorpusPrep

/** Dev harness: the corpus-preparation pipeline (CorpusPrep.prepareBatch,
  * the shared p1/p3 core) at synthetic scale, run BOTH as one batch and as
  * four id-ordered micro-batches folding through the tombstoned-hash
  * contract — asserting the two agree row-for-row. This is the p1≡p3
  * equivalence claim at 20-50× the shipped fixture, where a composition
  * bug that testdata happens not to exercise (hash-claim races, tombstone
  * gaps) would surface.
  *
  * Planted structure: duplicate pairs (ids 5k,5k+1 share a text),
  * contaminated docs (id % 97 == 0 carry a bench 8-gram), everything else
  * distinct and clean.
  * Usage: runMain graft.PipelineScaleProbe [nDocs]
  *
  * Measured (10M docs / ~400 corpus-shape, local[32], 8g driver, shared
  * host): batch 302 s (~33k docs/s), 4-batch incremental fold 417 s,
  * parquet-persisted stage boundaries (CorpusPrep.parquetStages) 261 s —
  * the DURABLE formulation was the fastest of the three, so cluster-grade
  * fault tolerance costs nothing here; all three outputs row-identical
  * (kept=7,938,144 of 10M: 1,958,763 dups + 103,093 contaminated
  * tombstoned). No driver-side or memory cliff one order above the
  * round-5 1M probe.
  */
object PipelineScaleProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val vocab = (0 until 512).map(i => s"w$i")
    val vocabCol = typedLit(vocab)
    val benchGram = "the alpha beta of gamma delta to epsilon"
    // duplicate pairs: ids 5k and 5k+1 share a text base; others unique
    val base = when(pmod(col("id"), lit(5)) === 1, col("id") - 1).otherwise(col("id"))
    val words = transform(
      sequence(lit(0), lit(39)),
      j => when(pmod(j, lit(4)) === 0, lit("the")) // stopwords for the gate
        .otherwise(element_at(vocabCol, (pmod(xxhash64(base, j), lit(512)) + 1).cast("int"))))
    val docs = spark.range(nDocs).select(
      col("id").as("doc_id"),
      when(pmod(col("id"), lit(97)) === 0,
        concat_ws(" ", concat_ws(" ", words), lit(benchGram)))
        .otherwise(concat_ws(" ", words)).as("text"))
    val bench = spark.range(1).select(lit(0L).as("doc_id"), lit(benchGram).as("text"))

    def run(batches: Seq[DataFrame],
        persist: CorpusPrep.StagePersist = CorpusPrep.localCheckpoint): (DataFrame, Double) = {
      val t0 = System.nanoTime()
      var seen: Option[DataFrame] = None
      var acc: Option[DataFrame] = None
      batches.foreach { b =>
        val m = persist(CorpusPrep.prepareBatch(b, bench, idCol = "doc_id",
          textCol = "text", carryCols = Seq.empty, processedHashes = seen,
          persist = persist))
        acc = Some(acc.map(_.unionByName(m)).getOrElse(m))
        seen = Some(acc.get.select("text_hash"))
      }
      val out = acc.get.where(col("kept")).select("doc_id", "n_tokens", "quality")
      (persist(out), (System.nanoTime() - t0) / 1e9)
    }

    val (whole, wallWhole) = run(Seq(docs))
    val quarters = (0 until 4).map(q =>
      docs.where(col("doc_id") >= lit(q * nDocs / 4) && col("doc_id") < lit((q + 1) * nDocs / 4)))
    val (folded, wallFolded) = run(quarters)

    val nWhole = whole.count()
    val diff = whole.exceptAll(folded).count() + folded.exceptAll(whole).count()
    require(diff == 0, s"batch vs micro-batch fold disagree on $diff rows")

    // DURABLE stage boundaries (CorpusPrep.parquetStages): same pipeline,
    // every boundary persisted to storage instead of executor-local blocks
    // — the cluster-scale shape that survives executor loss. Must be
    // row-for-row identical to the localCheckpoint run.
    val stageDir = java.nio.file.Files.createTempDirectory("graft_pipeline_stages").toString
    val (durable, wallDurable) = run(Seq(docs), CorpusPrep.parquetStages(spark, stageDir))
    val diffDurable = whole.exceptAll(durable).count() + durable.exceptAll(whole).count()
    require(diffDurable == 0,
      s"localCheckpoint vs parquet-persisted boundaries disagree on $diffDurable rows")
    // planted analytics. The gram append makes a contaminated doc's text
    // UNIQUE (it no longer equals its pair partner's), so: every id%97==0
    // doc is tombstoned as contaminated (no two contaminated docs share a
    // text — partners are consecutive ids, never both %97==0); a pair
    // second (id%5==1) dup-drops only when NEITHER side is contaminated.
    val ids = spark.range(nDocs)
    val nContam = ids.where(pmod(col("id"), lit(97)) === 0).count()
    val nDup = ids.where(pmod(col("id"), lit(5)) === 1)
      .where(pmod(col("id"), lit(97)) =!= 0)
      .where(pmod(col("id") - 1, lit(97)) =!= 0).count()
    val expected = nDocs - nContam - nDup
    require(nWhole == expected, s"kept=$nWhole expected=$expected")
    println(f"[pipeline-scale] docs=$nDocs kept=$nWhole (dups=$nDup contam=$nContam) " +
      f"wall_batch=$wallWhole%.1fs wall_4xfold=$wallFolded%.1fs " +
      f"wall_durable=$wallDurable%.1fs fold==batch==durable: OK")
    spark.stop()
  }
}
