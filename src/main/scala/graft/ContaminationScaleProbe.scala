package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Contamination

/** Dev harness: benchmark decontamination at synthetic scale. Generates a
  * `nCorpus`-doc corpus of deterministic pseudo-text (48 tokens from a
  * 5,000-word vocabulary via hash arithmetic — pure column expressions, no
  * driver-side text) plus a 1,000-doc "benchmark", plants the benchmark's
  * text verbatim inside every ~1009th corpus doc, and measures the
  * broadcast 8-gram containment flag pass. Asserts exactly the planted
  * docs are flagged (a cross-doc 8-gram collision in a 5k vocabulary is
  * ~5000^-8 per window — never observed), then measures the within-doc
  * repetition scorer over the same corpus.
  * Usage: runMain graft.ContaminationScaleProbe [nCorpus]
  */
object ContaminationScaleProbe {
  def main(args: Array[String]): Unit = {
    val nCorpus = args.headOption.map(_.toLong).getOrElse(1000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // deterministic pseudo-text: token t_i of doc d = "w<hash(d,i) mod 5000>"
    def text(id: Column): Column = array_join(
      transform(sequence(lit(1), lit(48)),
        i => concat(lit("w"), pmod(xxhash64(id * 131 + i), lit(5000)))), " ")

    val bench = spark.range(0L, 1000L).select(col("id").as("doc_id"), text(col("id")).as("text"))
    val corpus = spark.range(1000L, 1000L + nCorpus)
      .select(col("id").as("doc_id"),
        when(col("id") % 1009 === 0,
          concat(text(col("id") % 1000), lit(" "), text(col("id"))))
          .otherwise(text(col("id"))).as("text"))
    val planted = (1000L + nCorpus - 1L) / 1009L - (999L / 1009L) // multiples of 1009 in [1000, 1000+n)

    var t0 = System.nanoTime()
    val flagged = Contamination.contaminationReport(corpus, bench, "doc_id", "text", n = 8)
      .cache()
    val nFlagged = flagged.count()
    val flagSec = (System.nanoTime() - t0) / 1e9
    // every planted doc contains bench-doc grams across the 97-token concat;
    // at least the 41 windows fully inside the planted 48-token prefix match
    val minShared = flagged.agg(min(col("n_shared"))).collect().head.getLong(0)

    t0 = System.nanoTime()
    val nRep = Contamination.repetitionReport(corpus, "doc_id", "text", n = 3).count()
    val repSec = (System.nanoTime() - t0) / 1e9

    println(f"[contam-probe] corpus=$nCorpus%d planted=$planted%d flagged=$nFlagged%d " +
      f"minShared=$minShared%d flag=$flagSec%.1fs (${nCorpus / flagSec}%.0f docs/s) " +
      f"repetition=$repSec%.1fs (${nCorpus / repSec}%.0f docs/s)")
    assert(nFlagged == planted, s"expected exactly the $planted planted docs, got $nFlagged")
    assert(minShared >= 41L, s"planted docs must share the full prefix window set, min=$minShared")
    spark.stop()
  }
}
