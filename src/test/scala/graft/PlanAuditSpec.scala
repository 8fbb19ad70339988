package graft

/** Guard rail: no declared query may plan a non-broadcast cartesian product
  * (the silent scale-killer). Broadcast nested-loop joins against the tiny
  * query/dim side are fine — those are deliberate.
  */
class PlanAuditSpec extends SparkSpec {

  test("no declared query plans a CartesianProduct") {
    val dir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.flatMap { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian products in: ${offenders.mkString(", ")}")
  }

  test("g1_embedding_dups plans no BroadcastNestedLoopJoin (all-pairs ban)") {
    // the exact dup-pair join must be the chunked equi-join shape — a BNLJ
    // here means the non-equi self-join regressed (round-1 scale-killer)
    val plan = SparkEntry.queries("g1_embedding_dups")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNLJ in g1_embedding_dups:\n$plan")
  }

  test("g1_jaccard_pairs joins shingles as equi-join keys (no block cross product)") {
    // the round-1 trivially-true '__s == __s' bug planned the inverted-index
    // join with only the block columns as keys; assert the shingle column is
    // part of the join keys by checking no build side explodes block-wide
    val df = SparkEntry.queries("g1_jaccard_pairs")(spark, "/root/testdata/sf0.001")
    val exec = df.queryExecution.executedPlan
    val planStr = exec.toString
    assert(!planStr.contains("BroadcastNestedLoopJoin") && !planStr.contains("CartesianProduct"),
      s"non-equi join in g1_jaccard_pairs:\n$planStr")
    // the shingle equality must survive as an equi-join KEY on some hash/
    // sort-merge join (not a post-join filter over a block cross product).
    // String-matched on the key list because TreeNode.collect does not
    // descend into AdaptiveSparkPlanExec's captured input plan.
    val keyedOnShingle =
      """(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \[[^\]]*__s#[^\]]*\]""".r
        .findFirstIn(planStr).isDefined
    assert(keyedOnShingle, s"__s not an equi-join key in any join:\n$planStr")
  }

  test("b5_iceberg_eq_delete: both delete masks stay hash ANTI-joins") {
    // the equality-delete condition mixes null-safe key equality with a
    // strictly-newer-sequence comparison — EqualNullSafe must survive as
    // the hash key (the seq comparison riding as the join's extra
    // condition); a BNLJ here means the mask degenerated into an
    // all-pairs pass over the corpus per delete row
    val plan = SparkEntry.queries("b5_iceberg_eq_delete")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"non-equi delete mask:\n$plan")
    assert(plan.contains("LeftAnti"), s"no anti-join in the masked plan:\n$plan")
  }

  test("p1_prepare_corpus: pipeline composition keeps every join hash-keyed") {
    // four stages compose here; the scale contract is two corpus shuffles
    // (content-hash agg + the contamination id-agg) and zero non-equi
    // joins — a BNLJ/cartesian anywhere means a stage boundary regressed
    val plan = SparkEntry.queries("p1_prepare_corpus")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"non-equi join in p1_prepare_corpus:\n$plan")
  }

  test("p2_prepare_incremental: index probes and anti-joins stay hash-keyed") {
    // the daily-batch pipeline must reach the corpus ONLY through equi-joins
    // (persisted hash index + inverted shingle index); any BNLJ/cartesian
    // means a rejected-id anti-join degenerated into an all-pairs pass
    val plan = SparkEntry.queries("p2_prepare_incremental")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"non-equi join in p2_prepare_incremental:\n$plan")
  }

  test("g2_filtered_topk joins on the metadata filter as an equi-key (no cross join)") {
    // the point of filtered search is that the filter SHRINKS the pair set:
    // label must be a hash-join key, not a filter applied after a cross join
    val planStr = SparkEntry.queries("g2_filtered_topk")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!planStr.contains("CartesianProduct") && !planStr.contains("BroadcastNestedLoopJoin"),
      s"filtered top-k fell back to an all-pairs join:\n$planStr")
    val keyedOnLabel =
      """(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \[[^\]]*label#[^\]]*\]""".r
        .findFirstIn(planStr).isDefined
    assert(keyedOnLabel, s"label not an equi-join key in any join:\n$planStr")
  }

  test("ep3_feature_vector is collect-free: entity spine anchors via join, not IN-list") {
    // the flagship read (EP3) must not collect entity ids to the driver:
    // no IN-list over entity ids in any filter, and the spine must come
    // from a real scan (a LocalTableScan/LocalRelation of entity ids would
    // mean a collect happened upstream)
    val df = SparkEntry.queries("ep3_feature_vector")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.optimizedPlan
    val optimized = plan.toString
    // attributes render with expression ids ("entity_id#12 IN ..."), so a
    // plain substring can never match — walk the tree for In/InSet over an
    // entity_id attribute instead (feature_id IN-lists are fine: bounded
    // by the registry, not by the data)
    import org.apache.spark.sql.catalyst.expressions.{Attribute, In, InSet}
    def onEntity(e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean =
      e.references.exists(_.name == "entity_id")
    val inLists = plan.flatMap(_.expressions.flatMap(_.collect {
      case i: In if onEntity(i.value) => i
      case i: InSet if onEntity(i.child) => i
    }))
    assert(inLists.isEmpty,
      s"IN-list over entities in ep3 plan: ${inLists.mkString("; ")}\n$optimized")
    assert(!optimized.contains("LocalRelation [entity_id"),
      s"collected entity spine (LocalRelation) in ep3 plan:\n$optimized")
  }

  test("domainMix is map-only: no Exchange anywhere in the physical plan") {
    // the mixture decision is a pure per-row hash against a literal CASE —
    // any Exchange here means the weights stopped broadcasting as literals
    val plan = graft.operators.Sampling.domainMix(
      graft.sources.Tables.documents(spark, "/root/testdata/sf0.001"),
      "source", "doc_id", Map("src0" -> 50, "src1" -> 25))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"shuffle in domainMix:\n$plan")
  }

  test("no declared query plans an UNPARTITIONED window (one-task global sort)") {
    // ntile/rank over Window.orderBy with no partitionBy collapses the
    // whole table into one task — h7_ntile exists to do this right
    // (prefix-sum global rank); this guard keeps every query honest
    val dir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.flatMap { case (name, fn) =>
      val bad = fn(spark, dir).queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
      }
      if (bad.nonEmpty) Some(name) else None
    }
    assert(offenders.isEmpty, s"unpartitioned windows in: ${offenders.mkString(", ")}")
  }

  test("g3_bm25 top-k is a TakeOrdered, not a global sort; df/stats join by broadcast") {
    val plan = SparkEntry.queries("g3_bm25")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"limit+orderBy not TakeOrdered:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"tiny df/stats frames must broadcast:\n$plan")
  }

  test("no declared query windows the FULL corpus keyed by query id") {
    // the round-4 scale ceiling: row_number() OVER (PARTITION BY query_id)
    // above an unbounded corpus×queries join shuffles every scored row into
    // |Q| reducer partitions — at 100× corpus each partition holds the whole
    // corpus. The declared brute-force path (g2_cosine_topk) must use the
    // bounded-heap aggregate instead. Windows keyed by query id are only
    // legal when the scored pair set is BOUNDED by an equi-join key first
    // (label bucket / LSH bucket / IVF cell / PQ cell) — those queries are
    // the explicit allowlist, each with its bounding key named.
    val boundedByEquiKey = Map(
      "g2_filtered_topk" -> "label",    // per-label buckets
      "g2_lsh_topk"      -> "bucket",   // hyperplane buckets
      "g2_ivf_topk"      -> "cell",     // coarse IVF cells
      "g2_pq_topk"       -> "cell",
      "g2_ivfpq_topk"    -> "cell",
      "g2_ann_append"    -> "cell",   // the same IVFPQ probe over the
                                      // incrementally-appended index
      "g4_ann_stream"    -> "cell",   // IVFPQ probe over the stream-
                                      // maintained index clone
      // fusion input = the rankers' OWN top-k lists (lex ≤50 via the
      // bounded-heap rankByScore, sem ≤50 via cosineTopKAgg), so the
      // per-query window partition holds ≤ Σ k_i rows by construction —
      // never corpus-sized; the corpus-sized work happened inside the
      // heap-ranked rankers
      "g2_hybrid_rrf"    -> "per-ranker top-k lists")
    val dir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.flatMap { case (name, fn) =>
      val qidWindows = fn(spark, dir).queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.exists(_.references.exists(a =>
            a.name == "query_id" || a.name == "qid")) => w
      }
      if (qidWindows.nonEmpty && !boundedByEquiKey.contains(name)) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"query-id-keyed window over an unbounded pair set in: ${offenders.mkString(", ")}")
  }

  test("every query with an oracle is actually declared (and vice versa)") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle without query: ${(o -- q).mkString(", ")}")
  }

  test("filters and projections reach the parquet scan (pushdown + pruning)") {
    val dir = "/root/testdata/sf0.001"
    // c1: equality + range filters must appear as PushedFilters on the
    // customer scan, and the scan must NOT read every customer column
    val df = SparkEntry.queries("c1_filter_project")(spark, dir)
    df.collect()
    val leaves = df.queryExecution.executedPlan.collectLeaves()
    val custScan = leaves.find(_.toString.contains("customer"))
      .getOrElse(fail(s"no customer scan:\n${leaves.map(_.toString)}"))
    // the predicate must be INSIDE the PushedFilters bracket — a bare
    // substring check passes vacuously on "PushedFilters: []"
    val pushed = "PushedFilters: \\[([^\\]]*)\\]".r
      .findFirstMatchIn(custScan.toString).map(_.group(1)).getOrElse("")
    assert(pushed.contains("c_mktsegment"), s"filter not pushed; PushedFilters=[$pushed]")
    // pruning: check the scan's actual output attributes, not the plan
    // string (toString truncates ReadSchema at maxMetadataStringLength)
    val outCols = custScan.output.map(_.name).toSet
    assert(!outCols.contains("c_comment") && outCols.contains("c_custkey"),
      s"column pruning lost — scan outputs $outCols")
  }
}
