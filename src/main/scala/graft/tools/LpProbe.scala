package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Graph
import graft.sources.Tables

/** Throwaway dev probe: sync vs hybrid label propagation on the
  * g7_label_prop fixture shape. */
object LpProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String)(f: => Long): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime(); val n = f
        println(f"[lpprobe] $tag%-24s rep$i ${(System.nanoTime() - t0) / 1e9}%6.2fs rows=$n")
      }
    }
    val edges = graft.SparkEntry.coPurchaseEdgesForTest(spark, dir, minSupport = 1)
    val seeds = Tables.part(spark, dir)
      .where(col("p_partkey") % 5 === 0)
      .select(col("p_partkey"), col("p_brand"))
    println(s"[lpprobe] edges=${edges.count()} seeds=${seeds.count()}")
    time("edges read only") { edges.count() }
    time("sync") {
      Graph.labelPropagate(edges, "a", "b", "w", seeds, "p_partkey", "p_brand", 2).count()
    }
    time("hybrid canonical it=1") {
      Graph.labelPropagateFrontier(edges, "a", "b", "w", seeds, "p_partkey", "p_brand", 1, edgesCanonical = true).count()
    }
    time("hybrid canonical it=2") {
      Graph.labelPropagateFrontier(edges, "a", "b", "w", seeds, "p_partkey", "p_brand", 2, edgesCanonical = true).count()
    }
    time("hybrid forced-sparse (0)") {
      Graph.labelPropagateFrontier(edges, "a", "b", "w", seeds, "p_partkey", "p_brand", 2,
        denseFraction = 2.0).count()
    }
    spark.stop()
  }
}
