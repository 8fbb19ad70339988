package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Dev harness: connected-components at synthetic scale. Generates
  * `nComponents` disjoint `chainLen`-node path graphs — the worst case for
  * plain min-label propagation (it needs chainLen-1 rounds; the adaptive
  * pointer-jumping in Dedup.connectedComponents cuts that to
  * ~O(log chainLen) after the plain warm-up) — then resolves canonical ids
  * and checks every node landed on its component's minimum.
  * Usage: runMain graft.CcScaleProbe [nComponents] [chainLen]
  */
object CcScaleProbe {
  def main(args: Array[String]): Unit = {
    val nComponents = args.headOption.map(_.toLong).getOrElse(200000L)
    val chainLen = args.lift(1).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // component c owns ids [c*chainLen, (c+1)*chainLen); edges chain them
    val edges = spark.range(nComponents * (chainLen - 1)).select(
      (col("id") / (chainLen - 1)).cast("long").as("c"),
      pmod(col("id"), lit(chainLen - 1)).as("i"))
      .select(
        (col("c") * chainLen + col("i")).as("id_a"),
        (col("c") * chainLen + col("i") + 1).as("id_b"))

    val t0 = System.nanoTime()
    val resolved = Dedup.connectedComponents(edges, maxIter = 64)
    // every node's canonical id must be its component's min (= c * chainLen)
    val wrong = resolved
      .where(col("canonical_id") =!= (col("doc_id") / chainLen).cast("long") * chainLen)
      .count()
    val nodes = resolved.count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[cc-scale] components=$nComponents chainLen=$chainLen nodes=$nodes wrong=$wrong wall=$secs%.1fs")
    spark.stop()
  }
}
