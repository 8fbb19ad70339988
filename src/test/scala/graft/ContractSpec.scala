package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract hygiene: the correctness gate is only as strong as the
  * oracle coverage, so pin it. An oracle key without a query is driver
  * breakage; a query silently losing its oracle would downgrade to the
  * weaker rows-only check without anyone noticing.
  */
class ContractSpec extends AnyFunSuite {

  test("every oracle key is a declared query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL for undeclared queries: $orphans")
  }

  test("the rows-only set (queries without an oracle) is exactly the intended one") {
    // every key here is approximate or Spark-hash-specific BY DESIGN and
    // carries a behavior/recall ScalaTest spec instead of a DuckDB oracle;
    // adding a query without an oracle (or dropping an oracle) must be a
    // conscious edit to this list
    val intendedRowsOnly = Set(
      "e3_quantiles_approx", "e15_hll_union", "e16_quantile_sketch",
      "g1_minhash_pairs", "g1_simhash", "g1_semdedup", "g1_incr_minhash",
      "g1_embedding_dups_lsh",
      "g2_lsh_topk", "g2_ivf_topk", "g2_pq_topk", "g2_ivfpq_topk",
      "g2_ann_append", // incremental index append: doubly-approximate IVFPQ
                       // results; certified in-query at the full-rebuild
                       // score-ratio floor + coverage/duplicate guards
      "g4_ann_stream", // streaming index maintenance; certified in-query
                       // EXACTLY equal to the batch-appended index
      "g2_ann_delete", // tombstone delete + per-cell compaction; certified
                       // in-query: no deleted id returned, compaction ≡
                       // mask, physical reclaim, live score-ratio floor
      "g3_langid", "g3_fingerprint", "g3_vocab_approx",
      "g3_bpe_tokens") // ranked-merge BPE is not oracle-SQL-expressible;
                       // certified in-query (lossless + fixpoint) + BpeSpec
    val actual = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(actual == intendedRowsOnly,
      s"rows-only drift — unexpected: ${actual -- intendedRowsOnly}; " +
        s"missing: ${intendedRowsOnly -- actual}")
  }

  test("query count matches the documented surface") {
    // 168 = round-6's 163 plus the round-7 additions: b5_delta_export_incr
    // (incremental Delta mirroring + checkpoint cadence),
    // b5_iceberg_export + b5_iceberg_export_incr (Iceberg v1 export/read
    // + snapshot-append mirroring, second cross-engine oracle format),
    // h12_token_budget_bpe (corpus budget in real BPE tokens, oracle
    // replays the arithmetic from published counts), g3_bigram_lm
    // (interpolated bigram-LM perplexity filter, full oracle), g3_zipf
    // (Zipf rank-frequency slope per source — templated-text audit, full
    // oracle), g3_gopher (the published Gopher Table-A1 quality-rule
    // battery, one map-only scan, full oracle), g3_c4 (the published
    // C4 line-level cleaning battery, same shape), and g1_span_dedup
    // (C4's three-sentence-span dedup — substring-level exact dedup,
    // hash-only shuffle, full oracle). 175 adds the late-round-7 trio:
    // g1_containment (asymmetric |A∩B|/min containment screen over the
    // shared blocked inverted index — the quote-expansion dup Jaccard
    // misses), g2_hybrid_rrf (BM25 + cosine reciprocal-rank fusion,
    // composed from the two oracle-anchored rankers), and g7_pagerank
    // (weighted PageRank, 3 fixed power iterations over the bigram
    // word-transition graph; oracle unrolls the iterations in SQL).
    // 177 adds g7_triangles (degree-ordered triangle counting over the
    // co-purchase graph — each triangle enumerated once from its
    // lowest-rank corner) and g3_classifier_score (fastText-shape
    // hashed-bigram linear classifier inference, map-only, with an
    // engine-portable char-fold hash the oracle replays bit-for-bit).
    // 178 adds g7_label_prop (semi-supervised label propagation: clamped
    // seeds, weight-majority argmax, min-label ties, fixed synchronous
    // rounds; oracle unrolls both iterations). 179 adds g2_jl_distortion
    // (Johnson–Lindenstrauss Rademacher projection 64→16 with an
    // arithmetic, engine-regenerable sign matrix; original vs projected
    // cosine on every exact near-dup pair). 181 adds e17_ewma (truncated
    // per-entity EWMA: bounded partitioned window + map-only fold,
    // truncation error ≤ (1−α)^(window−1)) and e18_target_encode
    // (leave-one-out smoothed target encoding — the leakage-safe
    // categorical encoder; two broadcast aggregates + map-only math).
    // 182 adds g7_bfs_hops (multi-source BFS hop distance from trusted
    // seeds — frontier-only expansion per round; oracle unrolls 2 hops).
    // 184 adds g7_sppmi (positive PMI reweighting of the co-purchase
    // graph — the matrix SGNS/item2vec implicitly factorizes; one
    // incidence-mass agg + map-only log arithmetic) and h19_last_events
    // (trailing last-3-actions context feature per user — one bounded
    // per-entity window, oldest first, current event excluded).
    // 185 adds g3_reliability (calibration audit: equal-width decile bins
    // of the classifier score vs the Gopher pass rate per bin).
    // 186 adds b5_iceberg_export_part (the date-partitioned fact table
    // exported to Iceberg: identity partition spec + manifest partition
    // tuples; reader reconstructs the column via one broadcast file→tuple
    // join; DuckDB hive_partitioning is the cross-engine oracle).
    // 187 adds g2_ann_append (incremental ANN index maintenance: the last
    // corpus quarter appended with frozen codebooks/centroids, one
    // marker-flip commit; rows-only with full-coverage, duplicate-refusal,
    // and full-rebuild-floor score-ratio certificates in-query).
    // 188 adds g7_ppr (personalized PageRank: seed-restricted teleport
    // over the mirrored co-purchase graph, 3 iterations unrolled by the
    // oracle with the identical FP constants).
    // 189 adds g4_ann_stream (streaming ANN index maintenance:
    // foreachBatch appends onto a hard-link clone of the frozen base;
    // certified exactly equal to the batch-appended index).
    // 190 adds b5_delta_read_incr (incremental Delta CONSUMPTION: replay
    // only the (v0, v1] JSON commits, refuse remove actions, oracle
    // replays the appended batch's predicate over the source table).
    // 191 adds b5_iceberg_read_incr (the second format's twin: snapshot
    // parent-chain walk + manifest live-set diffs, removals refused).
    // 192 adds d6_t_closeness (the privacy ladder's third rung: per-class
    // ordered-EMD distance of the sensitive distribution vs the global —
    // the skewness-attack audit; oracle replays the cumulative fold).
    // 193 adds h20_epoch_plan (data-constrained scaling: temperature-
    // weighted budget allocation per source with implied epochs and the
    // >4-epoch over-repetition flag; pow/floor/round oracle)
    // 194 adds b5_iceberg_export_days (day(ts)-transform Iceberg export:
    // per-file day tuples as pruning metadata, ts stays physical, DuckDB
    // oracle over the same bytes; multi-day/null-ts files refused)
    // 195 adds g2_ann_delete (ANN tombstone delete + per-cell compaction:
    // deleted ids never returned, repeated/unknown deletes refused,
    // compaction ≡ mask, rows physically reclaimed, live score-ratio floor)
    // 196 adds g4_file_stream (the windowed aggregate attached to Spark's
    // FILE stream source — staged parquet files, maxFilesPerTrigger
    // micro-batches, oldest-first discovery; same oracle as the
    // MemoryStream form, proving the non-test attachment end to end)
    // 197-198 add b5_iceberg_export_bucket / b5_iceberg_export_trunc
    // (the rest of the idiomatic Iceberg layout trio: spec-vector-pinned
    // murmur3 bucket[8] and string-prefix truncate[2], both rewrite-based
    // with in-query purity certificates and DuckDB oracles)
    // 199 adds b5_iceberg_days_incr (the production daily export: the
    // incremental mirror onto the day(ts) spec — only new files linked
    // and scanned, carried tuples ride the prior manifest, v2 + parent
    // snapshot certified, DuckDB oracle)
    // 200 adds b5_iceberg_pruned_read (manifest-tuple file pruning — the
    // planning path: prune-to-superset certified against full-read +
    // row-filter, strictly fewer files listed, DuckDB recomputes the cut)
    // 201 adds b5_delta_pruned_read (the first format's twin: add-file
    // pruning by the log's partitionValues, same certificates, DuckDB
    // hive_partitioning oracle)
    // 202 adds b5_iceberg_read_deletes (v2 ROW-LEVEL DELETES, both
    // directions: deleteFromIceberg commits a position-delete snapshot —
    // v1 upgrades to format-version 2, no data rewrite — and readIceberg
    // anti-joins the positions out on _metadata.row_index; count/survivor/
    // time-travel/idempotence certificates, DuckDB survivor oracle)
    // 203 adds b5_delta_read_dv (the first format's row-level-delete
    // half: deleteFromDelta commits a deletion-vector snapshot —
    // RoaringBitmapArray blobs, Base85 UUID file, protocol raised to
    // readerVersion 3 — and readDelta anti-joins the decoded positions
    // out; stacked-delete UNION semantics certified alongside the
    // count/survivor/time-travel/idempotence set, DuckDB survivor oracle)
    // 204 adds b5_iceberg_bucket_str (bucket[8] over a STRING key via the
    // dedicated reference-murmur3 expression — the reference's entity_id
    // shape; purity certified per row through the registered SQL
    // iceberg_bucket function, DuckDB oracle)
    // 205 adds b5_tx_cluster_days (TxTable.clusterBy: the in-engine
    // rewrite from multi-day files to the single-day layout — refusal
    // certified before, content-preservation certified after, then the
    // previously-refused day(ts) export succeeds; DuckDB oracle)
    // 206 adds b5_iceberg_composite (the COMPOSITE day(ts)+identity spec
    // — the multi-tenant layout: files pure in both dims, ts physical,
    // event_type Column-Projected from tuples; two-dimensional manifest
    // pruning certified against full-read + row-filter, DuckDB two-level
    // hive_partitioning oracle)
    // 207 adds b5_iceberg_eq_delete (the spec's EQUALITY deletes — the
    // declarative delete-by-key a CDC/GDPR writer emits, content=2 with
    // equality_ids: deleteFromIcebergByKey commits O(keys) with no table
    // scan, the reader chains a null-safe hash anti-join with the
    // strictly-newer-sequence rule after the position mask; composed with
    // a position delete on one table, DuckDB survivor oracle)
    // 208 adds b5_delta_rename (Delta COLUMN MAPPING both directions:
    // renameDeltaColumn commits metadata-only renames — upgrade assigns
    // field ids + physical names, (3,7) tables gain the feature in both
    // sets — and readDelta resolves logical names through the mapping
    // over untouched bytes; DV + checkpoint composition certified,
    // DuckDB oracle aliases the physical column)
    // 209-210 add b5_iceberg_expire + b5_delta_vacuum (the RETENTION half
    // of both delete lifecycles: expireIcebergSnapshots / vacuumDelta +
    // writeDeltaCheckpoint + cleanDeltaLog physically reclaim everything
    // only expired history references — both oracles scan the remaining
    // bytes with NO row filter: disk ≡ live is the certificate)
    // 211 adds b5_iceberg_rename (the Iceberg twin of b5_delta_rename:
    // renameIcebergColumn commits a new schema version with every
    // field-id unchanged + the spec's name-mapping property; the reader
    // resolves old files' physical names by field-id semantics —
    // aliased scan + coalesce, one scan, no per-file dispatch)
    // 212 adds b5_delta_cdf (CHANGE DATA FEED both directions: the
    // property commit via setDeltaTableProperty, cdc emission in
    // deleteFromDelta — _change_data parquets with _change_type + the
    // writer-only feature — and readDeltaCdf serving cdc verbatim /
    // whole-file synthesis / dataChange=false skips; purge invariance
    // certified in-query, vacuum survival spec-pinned; DuckDB oracle
    // recomputes both change kinds)
    // 213 adds b5_iceberg_changelog (the CDF twin: readIcebergChangelog
    // classifies consumed snapshots by summary.operation + manifest diff
    // — append edges emit inserts, delete edges resolve position-delete
    // files back to rows over the touched files only, replace edges
    // (rewriteIcebergData) stay silent; eq-deletes/mixed shapes refuse;
    // DuckDB oracle recomputes both change kinds)
    // 215 adds the partitioned row-level deletes (round-11 verdict #1):
    // b5_iceberg_part_delete (pruner-scoped + identity-predicate position
    // deletes with per-partition spec-shaped delete files, global
    // unpartitioned-spec equality delete, tuple-pruned reads composing
    // with both kinds) and b5_delta_part_delete (DV delete over log-only
    // partition columns, partitionValues-restating re-adds, per-partition
    // cdc emission + purge; CDF partition fill)
    // 216 adds b5_bounds_skipping (round-11 verdict #2: TxTable's
    // per-file min/max carried into Iceberg lower/upper_bounds and Delta
    // add.stats; readIcebergRange/readDeltaRange skip files by value
    // range — certified 1-of-4 files scanned, results bit-equal across
    // formats and vs the full scan)
    // 218 adds the CDC upserts (round-11 verdict #3): b5_iceberg_upsert
    // (ONE commit pairing a global equality delete with the appended
    // rows — same-sequence survival, strictly-newer replacement) and
    // b5_delta_merge (DV'd pre-images + fresh adds + the protocol's full
    // update_preimage/update_postimage/insert CDF classification); both
    // oracles replay MERGE from the bytes alone
    // 219 adds g4_delta_tail (round-11 verdict #7: the open-format batch
    // pull wired as a foreachBatch-driven continuous tail — poll
    // watermark → readDeltaChanges → txn-marked TxTable append, replayed
    // triggers no-op; certified stream ≡ batch ≡ full read)
    // 220 adds g4_iceberg_tail (the Iceberg twin of g4_delta_tail:
    // tailIcebergInto polls readIcebergChanges per trigger, txn-marked
    // with the metadata version — the format's monotonic clock — and a
    // stale watermark clamps through the sink's recorded version)
    // 222 adds the PARTITIONED CDC upserts (round-12 verdict #2):
    // b5_iceberg_upsert_days (upsertIceberg onto the day(ts) spec — the
    // engine's flagship layout; derived day tuples, ts physical, inserts
    // land in brand-new day partitions) and b5_delta_merge_part
    // (mergeDelta on the date-partitioned export — DVs inside their
    // partitions, merge files in possibly-new day dirs); both oracles
    // replay MERGE from the bytes alone
    // 223 adds b5_iceberg_evolve (round-12 verdict #3: PARTITION SPEC
    // EVOLUTION — evolveIcebergSpecDay makes day(ts) the default spec as
    // a metadata-only commit, appendIceberg lands new rows under the new
    // spec, and reads resolve each manifest's spec-id: day-era files
    // prune from tuples, old-era files keep conservatively)
    // 224 adds b5_iceberg_bucket_incr (round-12 verdict #5: the bucket[8]
    // export gains incremental maintenance — new batches rewrite grouped
    // by the spec hash, one appended snapshot, purity recomputed per row
    // across both snapshots; the mirror tracks the source file set in a
    // metadata sidecar because rewritten files are not the source's)
    // 225 adds b5_iceberg_eq_scoped (round-12: PARTITION-SCOPED equality
    // deletes — the foreign CDC shape previously refused at read; the
    // reader resolves each delete manifest's partition tuple into a
    // (delete file -> data file) scope, and deleteFromIcebergByKeyScoped
    // writes the same shape)
    // 226 adds b5_iceberg_compact_days (round-13 verdict #1: the day(ts)
    // MERGE table's maintenance lifecycle — compaction folds the
    // equality deletes by the strictly-newer-sequence rule, restages
    // survivors under the transform spec, expiry reclaims the superseded
    // bytes; disk ≡ live with no row filter)
    // 227-228 add g4_delta_cdc_tail / g4_iceberg_cdc_tail (round-13
    // verdict #2: continuous CDC tails — the delete+insert feeds wired
    // into a MERGE-applying TxTable sink via CdcFeed.net netting +
    // applyCdc's one-commit delete-or-replace, txn-marked exactly-once)
    // 229 adds b5_delta_cdf_renamed (round-13 verdict #3: CDF on
    // column-mapped tables — change files written AND read under the
    // physical layout, the feed restores logical renamed names)
    // 230 adds b5_delta_idmode_write (round-13 verdict #5: id-mapped
    // tables take DV deletes and MERGEs — provenance resolves by parquet
    // field id, staged files render physical names + re-stamped ids)
    // 231 adds b5_iceberg_refs (round-13 verdict #6: snapshot refs —
    // branches/tags parse, resolve for snapshotAsOf, survive engine
    // commits, and anchor expiry as retention roots)
    assert(SparkEntry.queries.size == 231,
      s"declared query count ${SparkEntry.queries.size} != documented 231 — " +
        "update SURVEY.md §2 G-index and README when adding queries")
  }
}
