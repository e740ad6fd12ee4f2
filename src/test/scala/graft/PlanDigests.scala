package graft

/** Checked-in operator-multiset digests (graft.Explain.operatorDigest)
  * of the FINAL adaptive physical plans for the most expensive bench
  * queries, at the test fixture scale (sf0.001, local[4], 4 shuffle
  * partitions — the SparkSpec session; note the naive q12 form pins its
  * declared BNLJ demo shape here because the RangeJoinRule rewrite only
  * installs under GraftSession).
  *
  * PlanAuditSpec fails when a digest drifts: a silent plan regression
  * (an extra scan, a lost exchange reuse, a join strategy flip — the
  * round-7 q73 class) then surfaces at build time instead of in the
  * driver bench. If a change is INTENTIONAL: regenerate the entry
  * (`runMain graft.Explain <query> -digest` prints the row, or copy the
  * actual from the test failure) AND record what changed and why in
  * IMPLEMENTATION.md — the digest is a tripwire, not a lock.
  *
  * Queries whose expensive work hides behind a checkpoint barrier
  * (q67/q102: the CC loop; parts of q103/q104) pin only the visible
  * tail; their interior is covered by the CC round-count and bench pins
  * instead.
  */
object PlanDigests {
  val pinned: Map[String, String] = Map(
    // r9: pinned after the driver-bench drift investigation (VERDICT r8
    // item 1) — the decorrelated scalar-subquery plan, so any optimizer
    // or registration change that alters its shape surfaces here.
    // r10: TWO decorrelated aggregates (sum + count) instead of one
    // avg — the exact-decimal threshold rewrite (price·count > sum;
    // a double avg's last bits were partial-merge-order dependent).
    // Catalyst does not merge correlated scalar subqueries, so the
    // subquery side aggregates twice (HashAggregate x4, Scan x4, with
    // ReusedExchange x2 recovering part); measured 0.96 s isolated at
    // sf0.1 — determinism bought for ~0.4 s on a sub-second query.
    "q22_subquery" ->
      "AQEShuffleRead x4 | BroadcastExchange x3 | BroadcastHashJoin x5 | ColumnarToRow x4 | Exchange x4 | Filter x5 | HashAggregate x4 | Project x5 | ReusedExchange x2 | Scan parquet x4 | Sort x1",
    // r9: one Window operator = one shuffle for all three interval
    // RANGE frames (they share a window ordering)
    "q136_range_frames" ->
      "AQEShuffleRead x2 | ColumnarToRow x1 | Exchange x2 | Filter x1 | Project x3 | Scan parquet x1 | Sort x2 | Window x1",
    // r9: digest-only full outer join + one body equi-join
    "q137_merge_apply" ->
      "AQEShuffleRead x3 | BroadcastExchange x1 | BroadcastHashJoin x1 | ColumnarToRow x3 | Exchange x3 | Filter x4 | Project x5 | Scan parquet x3 | Sort x3 | SortMergeJoin x1",
    // r9: 3 Lloyd rounds with PER-ROUND centroid materialization (the
    // k·dims-row table has two consumers per round; as a lazy lineage
    // the prior rounds duplicated under each and the bench doubled per
    // round — 4.5 s lazy vs 2.9 s truncated at sf0.1), AND the final
    // assignment itself truncated (it too has two consumers — the
    // probe's cluster pick and the inverted-list join — so the whole
    // last assign round used to compute twice; Scan ExistingRDD x4 +
    // Exchange x6 in the pre-fix digest). What remains visible is just
    // the probe-side read path: the materialized assignment scanned for
    // both consumers, all joins broadcast, no shuffle at all — any
    // Exchange or aggregate reappearing here means assign work leaked
    // back out of the checkpoints
    "q50_ivf_kmeans" ->
      "BroadcastExchange x3 | BroadcastHashJoin x2 | BroadcastNestedLoopJoin x1 | ColumnarToRow x2 | Filter x4 | Project x5 | Scan ExistingRDD x2 | Scan parquet x2 | TakeOrderedAndProject x1",
    // r10: sampled-training IVF — training is behind the Materialize
    // checkpoints (Scan ExistingRDD), so the visible plan is the
    // probe/audit read path: broadcast joins only, 3 shuffles (the
    // brute arm's TakeOrdered ranking + summary sides), both
    // TakeOrdereds, and the corpus parquet scans for the exact arms.
    // An Exchange or aggregate reappearing beyond this means training
    // work leaked out of the checkpoints (the q50 class of drift).
    "q139_ivf_sampled" ->
      "AQEShuffleRead x1 | BroadcastExchange x7 | BroadcastHashJoin x5 | BroadcastNestedLoopJoin x4 | ColumnarToRow x4 | Exchange x3 | Filter x7 | HashAggregate x8 | Project x11 | ReusedExchange x2 | Scan ExistingRDD x4 | Scan parquet x4 | TakeOrderedAndProject x2",
    // r10: multi-probe over the learned codebook — same checkpointed
    // training, plus the probe's 16-row centroid ranking (one extra
    // TakeOrdered) and the 2-list candidate join.
    // r16: the probe ranking runs the fused dot128 pass like the
    // assignment rewrite (OPTIMIZATION_r16.md): the k·dims pos-join +
    // decimal-sum HashAggregate became a 16-row codebook BNLJ cross
    // (+1 BNLJ, -1 BroadcastHashJoin, -2 HashAggregate) over the
    // collect_list codebook arrays (+2 ObjectHashAggregate — the
    // partial/final pair of centArrOf, k-bounded rows)
    "q140_multiprobe_learned" ->
      "AQEShuffleRead x2 | BroadcastExchange x8 | BroadcastHashJoin x6 | BroadcastNestedLoopJoin x4 | ColumnarToRow x4 | Exchange x3 | Filter x10 | HashAggregate x6 | ObjectHashAggregate x2 | Project x13 | ReusedExchange x2 | Scan ExistingRDD x5 | Scan parquet x4 | TakeOrderedAndProject x3",
    // r11: BPE merge training — the 3 merge rounds hide behind the
    // per-round Materialize checkpoints (q50 pattern); the visible
    // tail is the 3-row merge report: each round's 1-row best-pair
    // and 1-row symbol-total tables cross-joined and unioned
    "q141_bpe_merges" ->
      "AQEShuffleRead x1 | BroadcastExchange x3 | BroadcastNestedLoopJoin x3 | Exchange x4 | HashAggregate x6 | Project x6 | Scan ExistingRDD x6 | Sort x1 | Union x1",
    // r11: encode = training behind the same checkpoints + ONE
    // broadcast left join of the corpus token stream against the
    // per-word symbol counts; the merge-report side of bpeTrain is
    // discarded unevaluated, so no BNLJ summary crosses appear here.
    // r12: the vocab join dropped its forced broadcast() hint (the
    // table is Heaps-law corpus-derived — VERDICT r11 task 1), so the
    // per-word-count aggregate now plans shuffle-then-broadcast and
    // AQE converts the join at runtime: +1 Exchange/AQEShuffleRead vs
    // the hinted shape, BroadcastHashJoin x1 UNCHANGED — the same
    // trade q45 made in r9 (the digest proves AQE still broadcasts at
    // fixture scale; at 100 TB the same plan degrades to a shuffle
    // join instead of a driver OOM)
    "q142_bpe_encode" ->
      "AQEShuffleRead x4 | BroadcastExchange x1 | BroadcastHashJoin x1 | ColumnarToRow x1 | Exchange x4 | Generate x1 | HashAggregate x4 | Project x2 | Scan ExistingRDD x1 | Scan parquet x1 | Sort x1",
    // r12: packing composition — train+encode hide behind the totals
    // checkpoint (Scan ExistingRDD x2 = PrefixAgg's two consumers of
    // the materialized per-doc table; a parquet scan reappearing here
    // means the encode pipeline leaked back out and runs twice); the
    // BroadcastHashJoin is the block-offset join-back, the two Windows
    // are the block carry-in + block-local running sums
    "q143_bpe_packing" ->
      "AQEShuffleRead x4 | BroadcastExchange x1 | BroadcastHashJoin x1 | Exchange x5 | Filter x2 | HashAggregate x4 | Project x5 | Scan ExistingRDD x2 | Sort x3 | Window x2",
    "q102_cluster_canon" ->
      "AQEShuffleRead x4 | BroadcastExchange x1 | BroadcastHashJoin x1 | ColumnarToRow x1 | Exchange x4 | Project x3 | Scan ExistingRDD x1 | Scan parquet x1 | Sort x3 | SortAggregate x2",
    "q103_prefix_jaccard" ->
      "AQEShuffleRead x2 | BroadcastExchange x2 | BroadcastHashJoin x3 | Exchange x2 | Filter x3 | Generate x2 | HashAggregate x2 | Project x9 | ReusedExchange x1 | Scan ExistingRDD x3 | Sort x1",
    // same multiset as q103 by construction (prefix x full instead of
    // prefix x prefix, pair-dedup HashAggregate instead of the final
    // distinct) — a drift here means the candidate dedup or the shared
    // docsets checkpoint shape regressed
    "q124_containment" ->
      "AQEShuffleRead x2 | BroadcastExchange x2 | BroadcastHashJoin x3 | Exchange x2 | Filter x3 | Generate x2 | HashAggregate x2 | Project x9 | ReusedExchange x1 | Scan ExistingRDD x3 | Sort x1",
    "q104_triangles" ->
      "AQEShuffleRead x6 | BroadcastExchange x4 | BroadcastHashJoin x4 | Exchange x5 | HashAggregate x5 | Project x7 | ReusedExchange x2 | Scan ExistingRDD x4 | Union x1",
    // r15: +1 Exchange on both q12 twins — the conditional
    // Parallelism.widen spread of the month-slice probe side (the
    // heavy join+expand work ran on the single-row-group scan's one
    // task; at scale widen no-ops and the r14 shape returns)
    "q12_range_join" ->
      "AQEShuffleRead x3 | BroadcastExchange x1 | BroadcastNestedLoopJoin x1 | ColumnarToRow x2 | Exchange x4 | Filter x2 | HashAggregate x4 | Project x2 | Scan parquet x2 | Sort x1",
    "q12_range_join_bucketed" ->
      "AQEShuffleRead x3 | BroadcastExchange x1 | BroadcastHashJoin x1 | ColumnarToRow x2 | Exchange x4 | Filter x3 | Generate x1 | HashAggregate x4 | Project x3 | Scan parquet x2 | Sort x1",
    "q37_ngram_jaccard" ->
      "AQEShuffleRead x5 | BroadcastExchange x1 | BroadcastHashJoin x2 | ColumnarToRow x1 | Exchange x5 | Filter x3 | Generate x3 | HashAggregate x4 | ObjectHashAggregate x3 | Project x7 | ReusedExchange x2 | Scan parquet x1 | Sort x1",
    // r9: jaccardPairsOf no longer force-broadcasts the per-doc counts
    // (corpus cardinality — would exceed the broadcast limit at scale);
    // AQE still broadcasts it here at runtime (BroadcastHashJoin x3
    // unchanged) but plans the agg as shuffle-then-broadcast (+1
    // BroadcastExchange/HashAggregate/AQEShuffleRead vs the forced hint)
    "q45_curation" ->
      "AQEShuffleRead x9 | BroadcastExchange x3 | BroadcastHashJoin x3 | ColumnarToRow x2 | Exchange x8 | Filter x7 | Generate x3 | HashAggregate x7 | ObjectHashAggregate x3 | Project x11 | ReusedExchange x2 | Scan parquet x2 | Sort x5 | Window x2 | WindowGroupLimit x4",
    "q67_dedup_clusters" ->
      "AQEShuffleRead x1 | Exchange x1 | Project x1 | Scan ExistingRDD x1 | Sort x1",
    "q73_incremental_dedup" ->
      "AQEShuffleRead x3 | BroadcastExchange x3 | BroadcastHashJoin x3 | ColumnarToRow x3 | Exchange x4 | Filter x5 | Generate x2 | HashAggregate x3 | Project x9 | ReusedExchange x1 | Scan parquet x3 | Sort x1",
    // r10: + Filter x2 — the null-domain pin on both the cume table
    // and the binned scan (NULL prices would inflate Spark's running
    // count but not the oracle's cume_dist)
    "q88_equidepth_hist" ->
      "AQEShuffleRead x3 | BroadcastExchange x1 | BroadcastNestedLoopJoin x1 | ColumnarToRow x2 | Exchange x4 | Filter x2 | HashAggregate x6 | Project x2 | Scan parquet x2 | Sort x2 | Window x2",
    // r8: the pair pipelines hide behind Materialize; the visible
    // tail is the count/semi-join summary. r11: +1 materialized arm
    // (the stratum exact recompute — VERDICT r10 task 4), so two more
    // ExistingRDD scans (exS feeds its count + the hitS semi-join),
    // two more aggregates and two more summary crosses; the LSH table
    // now has two semi-join consumers and AQE broadcast-reuses it
    // (ReusedExchange x1)
    "q115_dedup_recall" ->
      "AQEShuffleRead x4 | BroadcastExchange x6 | BroadcastHashJoin x2 | BroadcastNestedLoopJoin x4 | Exchange x8 | HashAggregate x10 | Project x6 | ReusedExchange x1 | Scan ExistingRDD x6",
    // r8: CC interior is behind checkpoints (q67 pattern); tail only
    "q117_semantic_dedup" ->
      "AQEShuffleRead x1 | Exchange x1 | Filter x1 | Project x1 | Scan ExistingRDD x1 | Sort x1",
    // r8: the whole fixed 5-round recurrence is ONE lazy lineage —
    // 10 broadcast joins (5 sym + 5 deg probes), 7 reused exchanges;
    // a digest drift here means the loop fell back to per-round
    // materialization or lost exchange reuse
    "q119_pagerank" ->
      "AQEShuffleRead x8 | BroadcastExchange x4 | BroadcastHashJoin x10 | BroadcastNestedLoopJoin x1 | Exchange x9 | HashAggregate x12 | Project x13 | ReusedExchange x7 | Scan ExistingRDD x5 | TakeOrderedAndProject x1",
    // r8: term broadcast prunes the token stream BEFORE the per-doc
    // aggregate; the 1-row stats ride the BNLJ
    "q118_bm25_rank" ->
      "AQEShuffleRead x2 | BroadcastExchange x2 | BroadcastHashJoin x1 | BroadcastNestedLoopJoin x1 | ColumnarToRow x1 | Exchange x3 | HashAggregate x6 | Project x3 | Scan ExistingRDD x2 | Scan parquet x1 | TakeOrderedAndProject x1",
    // r9: the remaining >=1 s bench-tail queries, pinned so tail drift
    // is attributable to plan changes vs harness noise at a glance.
    // q127: both corpora explode once each (Generate x7 includes the
    // per-family shingle hoists), all scalars are 1-row broadcasts
    "q127_dsir_weights" ->
      "AQEShuffleRead x7 | BroadcastExchange x6 | BroadcastHashJoin x4 | BroadcastNestedLoopJoin x2 | ColumnarToRow x7 | Exchange x9 | Filter x10 | Generate x7 | HashAggregate x18 | Project x15 | Scan parquet x7 | TakeOrderedAndProject x1",
    // q126: the tertile cutpoints ride ONE checkpointed score table
    // (Scan ExistingRDD x2) — a third scan means the share broke
    "q126_perplexity_buckets" ->
      "AQEShuffleRead x3 | BroadcastExchange x1 | BroadcastNestedLoopJoin x1 | Exchange x4 | HashAggregate x6 | Project x4 | Scan ExistingRDD x2 | Sort x2 | Window x2",
    // q122: both arms cut to 20 by TakeOrderedAndProject BEFORE any
    // Window (the two Window ops rank 20-row inputs); the BM25 tf table
    // is the shared checkpoint (Scan ExistingRDD x2)
    "q122_rrf_fusion" ->
      "AQEShuffleRead x1 | BroadcastExchange x3 | BroadcastHashJoin x1 | BroadcastNestedLoopJoin x2 | ColumnarToRow x3 | Exchange x3 | Filter x2 | HashAggregate x6 | Project x9 | Scan ExistingRDD x2 | Scan parquet x3 | Sort x2 | SortMergeJoin x1 | TakeOrderedAndProject x3 | Window x2")
    // q145 (sub-second) is deliberately NOT digest-pinned: its final
    // tiny orderBy's Exchange+AQEShuffleRead pair comes and goes with
    // AQE runtime stats (observed x3 vs x4 on back-to-back identical
    // runs), so any pin would flake. Its load-bearing plan facts are
    // asserted semantically instead: TextSimilaritySpec pins the
    // jl_project candidate stage, PlanAuditSpec's cartesian sweep
    // covers it like every other query.
}
