package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Graph
import graft.sources.Tables

/** Dev harness: isolates where the g7 graph queries spend their time —
  * the bipartite edge build (collect_set + map-side pair expansion vs
  * the naive membership self-join) versus the iteration loops that
  * consume the edges. Run:
  *
  * {{{ SPARK_GRAFT_CPUS=32 sbt "runMain graft.GraphScaleProbe /root/testdata/sf0.1" }}}
  */
object GraphScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(label: String)(f: => Long): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = f
        println(f"[graph-probe] $label%-28s rep$i ${(System.nanoTime() - t0) / 1e9}%6.2fs rows=$n")
      }
    }

    val m = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_partkey")

    def selfJoinEdges(): DataFrame = {
      val d = m.select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      d.as("x")
        .join(d.as("y"), col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .groupBy(col("x.p").as("a"), col("y.p").as("b"))
        .agg(count(lit(1)).cast("double").as("w"))
    }

    time("edges: self-join")(selfJoinEdges().count())
    time("edges: bipartiteProject")(
      Graph.bipartiteProject(m, "l_orderkey", "l_partkey").count())

    val seeds = Tables.part(spark, sfDir)
      .where(col("p_partkey") % 5 === 0)
      .select(col("p_partkey"), col("p_brand"))
    time("labelProp on self-join")(
      Graph.labelPropagate(selfJoinEdges(), "a", "b", "w",
        seeds, "p_partkey", "p_brand", iterations = 2).count())
    time("labelProp on bipartite")(
      Graph.labelPropagate(
        Graph.bipartiteProject(m, "l_orderkey", "l_partkey"), "a", "b", "w",
        seeds, "p_partkey", "p_brand", iterations = 2).count())

    // ---- synthetic scale leg: 5M directed edges over 500k nodes --------
    // Deterministic pseudo-random endpoints from a multiplicative hash of
    // the edge index (no Random — reproducible across runs/engines). Shape
    // mirrors a power-law-ish co-occurrence graph via modulo banding.
    val nNodes = 500000L
    val nEdges = 5000000L
    val syn = spark.range(nEdges).select(
      pmod(col("id") * 2654435761L, lit(nNodes)).as("src"),
      pmod((col("id") + 7919L) * 40503L, lit(nNodes)).as("dst"),
      (pmod(col("id"), lit(5L)) + 1L).cast("double").as("w"))
      .localCheckpoint()
    time(s"pageRank 3 iters ${nEdges / 1000000}M edges")(
      Graph.pageRank(syn, "src", "dst", "w", iterations = 3).count())
    val synSeeds = spark.range(0, nNodes, 10)
      .select(col("id").as("node"), pmod(col("id"), lit(25L)).as("lbl"))
    time(s"labelProp 2 iters ${nEdges / 1000000}M edges")(
      Graph.labelPropagate(syn, "src", "dst", "w",
        synSeeds, "node", "lbl", iterations = 2).count())
    // ---- A/B: synchronous vs delta-propagation at MANY rounds ----------
    // (round-7 verdict #3). Two regimes, measured separately:
    //  - CHURNING graph (the hash-random leg above): competing labels keep
    //    flipping, the frontier never decays, and delta propagation can
    //    only match sync within noise — there is nothing to skip.
    //  - CONVERGING graph (clustered leg below: 10k dense 50-node
    //    components, one seed each): labels settle in ~2 rounds, the
    //    frontier empties, and the frontier form EXITS while sync grinds
    //    the remaining rounds over all 5M edges. This is the real shape of
    //    affinity graphs (near-dup clusters, co-purchase communities).
    time(s"labelProp sync     8 iters ${nEdges / 1000000}M edges churn")(
      Graph.labelPropagate(syn, "src", "dst", "w",
        synSeeds, "node", "lbl", iterations = 8).count())
    time(s"labelProp frontier 8 iters ${nEdges / 1000000}M edges churn")(
      Graph.labelPropagateFrontier(syn, "src", "dst", "w",
        synSeeds, "node", "lbl", iterations = 8).count())
    val nComp = 10000L
    val compSize = 50L
    // endpoint offsets from xxhash64 (a multiplicative hash of id is
    // CONSTANT mod compSize within a component when nEdges step ≡ 0 mod
    // compSize — the first cut of this leg silently degenerated to one
    // edge per component)
    val syn2 = spark.range(nEdges).select(
      (pmod(col("id"), lit(nComp)) * compSize +
        pmod(xxhash64(col("id")), lit(compSize))).as("src"),
      (pmod(col("id"), lit(nComp)) * compSize +
        pmod(xxhash64(col("id"), lit(1L)), lit(compSize))).as("dst"),
      lit(1.0).as("w"))
      .localCheckpoint()
    val syn2Seeds = spark.range(0, nComp)
      .select((col("id") * compSize).as("node"), pmod(col("id"), lit(25L)).as("lbl"))
    time(s"labelProp sync     8 iters ${nEdges / 1000000}M edges converging")(
      Graph.labelPropagate(syn2, "src", "dst", "w",
        syn2Seeds, "node", "lbl", iterations = 8).count())
    time(s"labelProp frontier 8 iters ${nEdges / 1000000}M edges converging")(
      Graph.labelPropagateFrontier(syn2, "src", "dst", "w",
        syn2Seeds, "node", "lbl", iterations = 8).count())
    // plant a K100 clique (4950 edges, C(100,3) = 161700 triangles) so the
    // triangle leg verifies output at scale, not just wall-clock: the
    // multiplicative-hash graph itself is essentially triangle-free
    val clique = spark.range(100).select(col("id").as("a"))
      .join(spark.range(100).select(col("id").as("b")), col("a") < col("b"))
      .select((col("a") + nNodes).as("src"), (col("b") + nNodes).as("dst"),
        lit(1.0).as("w"))
    time(s"triangles ${nEdges / 1000000}M edges + K100")(
      Graph.triangleCounts(syn.unionByName(clique), "src", "dst").count())

    spark.stop()
  }
}
