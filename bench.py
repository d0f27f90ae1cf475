#!/usr/bin/env python
"""Benchmark harness — the driver's per-round performance probe.

Runs the headline queries from the registry at ``$SPARK_GRAFT_SF_DIR``
(default ``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints
exactly ONE JSON line on stdout:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Protocol parity with the reference (BASELINE.md §A): wall-clock seconds per
whole query (schedule → barrier, ``main.cc:321-329``), measured around a full
materialization. We force execution with the ``noop`` sink — every row is
produced and discarded executor-side, so the timing covers scan + compute +
shuffle but not driver-side collect serialization (the reference's stdout
sink analogue is the `sink_parquet` entry, timed like any other query).
"""

from __future__ import annotations

import json
import os
import sys
import time

# Headline set: one representative per operator family, weighted toward the
# shapes that dominate at 100 TB (scans with pushdown, shuffle joins and
# aggs, windows, top-k) plus the LLM-pipeline north-star ops.
HEADLINE = [
    "scan_filter_count",        # the reference's own workload
    "project_columns",          # pruned scan
    "filter_compound",          # pushdown of conjunctive predicates
    "join_inner_hash",          # big-big shuffle join
    "join_broadcast",           # dim broadcast join
    "join_asof",                # custom as-of composition
    "agg_groupby_hash",         # partial+final hash agg
    "agg_approx_distinct",      # HLL sketch
    "window_running_sum",       # window frame over shuffle
    "topk_per_group",           # rank + filter
    "sort_orderby_multi",       # global sort
    "set_union_distinct",       # union + dedup shuffle
    "fn_string",                # codegen'd scalar expressions
    "fn_json",                  # JSON path extraction over events.props
    "agg_percentiles",          # exact ordered statistics
    "agg_time_rollup",          # multi-grain GROUPING SETS pass
    "join_range_banded",        # range predicate as banded equi-join
    "window_range_interval",    # time-RANGE window frame
    "join_bucketed_colocated",  # zero-exchange co-located join
    "join_salted_skew",         # skew-safe salted join
    "udf_pandas_scalar",        # Arrow-vectorized Python boundary
    "dedup_exact",              # LLM-pipeline: exact dedup
    "dedup_minhash_lsh",        # LLM-pipeline: near-dup via MinHash LSH
    "simsearch_topk_bruteforce",  # LLM-pipeline: cosine top-k
    "text_quality_score",       # LLM-pipeline: quality heuristics
    "text_tfidf_topterms",      # LLM-pipeline: TF-IDF corpus pass
    "mm_decode_image_stub",     # LLM-pipeline: multimodal decode plumbing
    "stream_tumbling",          # Structured Streaming windowed agg
    "composite_local_supplier_volume",  # 6-table TPC-H Q5-shaped join tree
    "sessionize_batch",         # gap sessionization (window + agg, 1 shuffle)
    "dedup_cluster_cc",         # near-dup clusters: iterative label propagation
    "simsearch_kmeans_assign",  # Lloyd assignment step (broadcast centroids)
    "dedup_paragraph_chunks",   # LLM-pipeline: C4-style chunk-level dedup
    "text_pii_redact",          # LLM-pipeline: map-only regex redaction
    "funnel_view_click_purchase",  # one-shuffle ordered funnel
    "cdc_scd2_merge",           # change feed -> versioned dim, 1 shuffle
    "graph_pagerank_iterations",   # iterative integer PageRank (3 rounds)
    "layout_zorder_cluster",    # Morton clustering + range-partitioned write
    "agg_filter_clause",        # N conditioned metrics in one grouped pass
    "join_lateral_topk",        # LATERAL top-k via WindowGroupLimit
    "sample_weighted_mixture",  # domain-weighted md5 mixture sampling
    "doc_chunk_overlap",        # map-only overlapping chunk generation
    "simsearch_pq_assign",      # product-quantization code assignment
    "ts_ohlc_bars",             # OHLC downsample, min/max-of-struct agg
    "udf_cogrouped_pandas",     # cogrouped-map pandas (two-sided Arrow)
    "audit_fk_orphans",         # FK integrity audit, broadcast anti-joins
    "agg_bitmap_distinct",      # exact distinct via bitmap partial aggs
    "join_dynamic_partition_pruning",  # runtime directory pruning (layout write + DPP probe)
    "source_python_datasource",  # Python DataSource: Arrow-batch source path
    "agg_countmin_freq",        # mergeable Count-Min frequency sketches
    "dedup_duplicate_spans",    # substring-level dedup (rolling window hashes)
    "dedup_semantic_keep",      # SemDeDup keep/drop decision (cell-blocked)
    "embed_pca_power_iter",     # distributed PCA: Gram reduce + matvec rounds
    "agg_theta_set_ops",        # theta-sketch audience set algebra
    "simsearch_matryoshka_twostage",  # truncated-dim recall + exact rerank
    "join_interval_overlap_banded",   # interval-overlap as banded equi-join
    "quality_classifier_linear",      # model-based filter, integer-exact logit
    "graph_bfs_multisource",    # BFS levels: per-round relax + min-fold
    "window_session_builtin",   # built-in session windows in batch
    "dedup_url_canonical",      # URL canonicalization dedup (codegen regex)
    "text_repetition_ratio",    # Gopher repetition filters, two n-gram passes
    "text_ngram_novelty",       # corpus-first-seen trigram share
    "sample_coreset_kcenter",   # farthest-first coreset (broadcast rounds)
    "simsearch_rerank_mmr",     # diversified rerank over bounded pool
    "ts_changepoint_cusum",     # scaled-integer CUSUM window pass
    "join_spatial_grid_neighbors",  # grid-bucketed spatial neighbor join
    "graph_jaccard_neighbor_sim",   # wedge-join neighborhood similarity
    "search_bm25_topk",         # BM25 lexical retrieval (inverted-index shape)
    "dedup_incremental_batch",  # batch-vs-corpus ingest screens
    "mm_image_phash_dedup_stub",  # perceptual-hash media dedup (Arrow stage)
    "stats_ks_drift_test",      # exact two-sample KS drift statistic
    "stream_chained_window_agg",  # chained stateful streaming aggregation
    "er_fellegi_sunter",        # blocked probabilistic record linkage
    "search_phrase_positional",  # positional inverted-index phrase join
    "sample_domain_cap",        # salted two-stage per-domain top-K
    "graph_kcore_peel",         # iterative degeneracy peel (4 rounds)
    "sketch_bloom_membership",  # bit-OR bloom build + broadcast probe
    "stats_chi2_drift",         # exact-integer chi-square homogeneity
    "tokenizer_bpe_train_rounds",  # data-driven BPE merge training
    "join_bloom_pruned_shuffle",  # bloom-pruned fact shuffle join
    "stats_bootstrap_mean_ci",  # 16-resample bootstrap in one scan
    "semantic_filter_cascade_stub",  # proxy screen -> iterator-UDF scorer
    "text_sentiment_lexicon",   # broadcast-lexicon valence scoring
    "join_string_prefix_filter",  # q-gram prefix-filter similarity join
    "stats_permutation_test",   # 16 relabelings in one scan
    "ts_mann_kendall_trend",    # trend test on per-key daily rollups
    "stats_quantile_normalize",  # histogram-reconstructed quantile mapping
    "attribution_multitouch_ushape",  # one-user-shuffle position attribution
    "search_rrf_fusion",        # hybrid-rank fusion over TakeOrdered lists
    "graph_node2vec_biased_walk",  # second-order walk, keyed hop joins
    "dedup_cdc_chunking",       # content-defined chunk dedup (linear explode)
    "ts_holt_linear_forecast",  # per-key double-smoothing fold
    "interval_union_duration",  # cummax interval-union sweep
    "agg_markov_stationary_power",  # 8 broadcast power iterations
    "sample_dsir_hashed_importance",  # broadcast importance-model scoring
    "eval_decile_lift_table",   # histogram-cut gains/lift report
    "ab_cuped_adjustment",      # CUPED sufficient-stat adjustment
    "graph_label_propagation_sync",  # 3 synchronous LPA rounds
    "er_blocking_quality_report",  # LSH blocking completeness/reduction audit
    "attribution_markov_removal",  # 5-run removal-effect power iteration
    "query_skyline_pareto",     # distributive two-stage Pareto skyline
    "agg_basket_affinity_lift",  # order-keyed market-basket lift
    "alloc_fifo_waterfall",     # prefix-sum FIFO payment application
    "join_bitemporal_asof_aswas",  # two-timeline as-was/as-is windows
    "corpus_dataset_card",      # one-row corpus summary (3 reduced scans)
    "agg_rolling_wau_delta",    # delta-encoded trailing-7d actives
    "er_golden_record_survivorship",  # blocked-match survivorship rules
    "join_set_similarity_prefix",  # exact prefix-filtered Jaccard join
    "graph_wl_refinement",      # 2 WL color-refinement rounds (keyed joins)
    "eval_auc_rank",            # exact AUC over the score histogram
    "privacy_t_closeness",      # EMD audit over QI-group band grids
    "agg_lorenz_deciles",       # broadcast-cut Lorenz curve
    "window_ntile_histogram",   # NTILE via histogram cut, no global sort
    "search_fusion_borda",      # positional fusion over pre-cut top-k lists
    "sketch_count_min_estimate",  # constant-size CMS build + probe
    "pipeline_pack_sequences",  # concat-and-chunk packing audit
    "eval_bradley_terry_rounds",  # arena-ranking MM fixed-point rounds
    "graph_hits_rounds",        # bipartite hub/authority power rounds
    "graph_ppr_seed_teleport",  # seed-teleport personalized PageRank
    "stats_conditional_entropy",  # H(next|cur) ordered ln fold
    "pipeline_moe_balance_round",  # MoE load audit + aux-free bias step
    "dedup_minhash_oph",        # one-permutation minhash + densification
    "stats_kruskal_wallis",     # rank-based k-sample test, histogram ranks
    "eval_average_precision",   # MAP per-query term, salted two-stage top-k
    "simsearch_pq_adc",         # PQ asymmetric-distance LUT scoring
    "text_type_token_ratio",    # TTR + hapax fraction per shard
    "eval_recall_at_k",         # recall axis of the retrieval ladder
    "sketch_ams_f2_moment",     # one-pass F2 tug-of-war sketch
    "text_heaps_law",           # first-seen vocabulary growth audit
    "eval_rank_biased_precision",  # geometric-weight retrieval metric
    "corpus_source_vocab_overlap",  # pairwise source-vocabulary Jaccard
    "pipeline_length_bucket_batching",  # padding-waste batching report
    "mlsplit_kfold_stratified",  # md5 k-fold + stratum balance audit
    "stats_mad_robust_z",       # exact distributed median/MAD outliers
    "ts_page_hinkley",          # sequential drift detector, daily series
    "text_boilerplate_ngrams",  # cross-doc 5-gram boilerplate report
    "stats_trimmed_mean",       # histogram-rank decile-trimmed mean
    "stats_hodges_lehmann",     # Walsh-pair pseudo-median in domain space
    "stats_wilcoxon_signed_rank",  # paired rank test, 2R mid-ranks
    "eval_krippendorff_alpha",  # variable-rater agreement, LCM-exact Do
    "sample_temperature_mixture",  # tau=0.5 mixture largest-remainder
    "stats_iqr_fences",         # Tukey boxplot fences, histogram ranks
    "eval_auprc_threshold_sweep",  # exact PR-AUC from the score histogram
    "graph_avg_neighbor_degree",   # knn(k) degree-correlation curve
    "stats_poisson_dispersion",    # daily-count variance-to-mean ratio
    "pipeline_tokenizer_compression_rate",  # chars/token quality proxy
    "stats_mood_median_test",   # pooled-median 2xk chi-square, 128-bit
    "eval_matthews_corrcoef",   # MCC + Youden + balanced accuracy
    "stats_cliffs_delta",       # ordinal effect size, histogram pairs
    "stats_kendall_w",          # k-rater concordance, doubled mid-ranks
    "stats_capture_recapture",  # Lincoln-Petersen dedup sizing audit
    "text_simpson_diversity",   # collision-probability token diversity
    "stats_theil_between_nations",  # decomposable inequality index
    "alloc_dhondt_divisor",     # divisor-method apportionment
    "ts_hampel_filter",         # rolling median/MAD outlier screen
    "ts_bollinger_breakout",    # trailing mean+-2sigma, integer-exact
    "ts_hurst_rescaled_range",  # R/S long-memory diagnostic
    "pipeline_rendezvous_sharding",  # HRW shard assignment + balance
    "corpus_jsd_trigram_drift",  # bucketed JSD drift per source
    "simsearch_radius_count",   # range query + cell-pruned recall
    "embed_kmeans_update_round",  # Lloyd step, exact micro centroids
    "dedup_lsh_scurve_audit",   # banding collision curve vs analytic
    "alloc_sainte_lague",       # odd-divisor apportionment twin
    "text_readability_fk",      # Flesch reading ease, exact milli
    "pipeline_token_budget_allocation",  # Hamilton token budget split
    "eval_fleiss_kappa",        # fixed-m multi-rater agreement
    "ts_variance_ratio_test",   # Lo-MacKinlay VR(2) random-walk test
    "corpus_ngram_coverage_curve",  # top-k trigram mass coverage
    # round-8 additions
    "graph_local_clustering_topk",  # per-node triangle density
    "alloc_water_filling",      # max-min fair progressive filling
    "window_rolling_ols_slope",  # windowed exact-rational OLS trend
    "sample_systematic_cumweight",  # PPS systematic, 2-phase prefix sum
    "ts_ar1_phi_ppm",           # lag-1 autoregression per series
    "eval_psi_population_stability",  # scorecard drift index
    "stream_topk_per_window",   # windowed leaderboard (stream + rank)
    "text_char_bigram_entropy",  # per-doc gibberish/boilerplate screen
    "stats_cvm_two_sample",     # integral-statistic drift twin of KS
    "privacy_dp_sensitivity_audit",  # Linf/L0/L1 contribution bounds
    "corpus_growth_dedup_curve",  # acquisition marginal-novelty curve
    "embed_pq_codebook_update",  # per-subspace PQ Lloyd round
]

# Frozen cross-round comparison core (round-6, per round-5 verdict item 2):
# the 50 keys visible in BOTH the r4 and r5 driver-captured compact lines.
# The headline set grows every round, which makes the TOTAL incomparable
# across rounds; `core_total` over this frozen set is the stable series
# (r4: 90.0 s, r5: 80.5 s on this host at sf0.1). Never add to or remove
# from this list — new operators join HEADLINE only.
CORE = frozenset(
    [
        "agg_approx_distinct", "agg_basket_affinity_lift",
        "agg_filter_clause", "agg_groupby_hash", "agg_lorenz_deciles",
        "agg_markov_stationary_power", "agg_percentiles",
        "attribution_markov_removal", "audit_fk_orphans",
        "composite_local_supplier_volume", "dedup_cdc_chunking",
        "dedup_cluster_cc", "dedup_duplicate_spans",
        "dedup_incremental_batch", "dedup_minhash_lsh",
        "dedup_paragraph_chunks", "dedup_semantic_keep",
        "embed_pca_power_iter", "er_blocking_quality_report", "fn_json",
        "graph_bfs_multisource", "graph_jaccard_neighbor_sim",
        "graph_kcore_peel", "graph_label_propagation_sync",
        "graph_node2vec_biased_walk", "graph_pagerank_iterations",
        "graph_wl_refinement", "join_bitemporal_asof_aswas",
        "join_bloom_pruned_shuffle", "join_inner_hash",
        "join_set_similarity_prefix", "join_spatial_grid_neighbors",
        "layout_zorder_cluster", "mm_image_phash_dedup_stub",
        "sample_coreset_kcenter", "sample_domain_cap",
        "sample_dsir_hashed_importance", "simsearch_pq_assign",
        "simsearch_rerank_mmr", "sketch_bloom_membership",
        "stats_bootstrap_mean_ci", "stats_permutation_test",
        "stream_chained_window_agg", "stream_tumbling",
        "text_ngram_novelty", "text_pii_redact", "text_tfidf_topterms",
        "tokenizer_bpe_train_rounds", "topk_per_group",
        "udf_cogrouped_pandas",
    ]
)


def _sf_from_dir(sf_dir: str) -> float:
    tail = os.path.basename(os.path.normpath(sf_dir))
    if tail.startswith("sf"):
        try:
            return float(tail[2:])
        except ValueError:
            pass
    return -1.0


# ---------------------------------------------------------------------------
# A/A drift control (VERDICT r10 ask #5). Two rounds were partly burned on
# phantom "regressions" that a bisect later proved to be ENVIRONMENT drift
# (the identical r8 bits ran 1.1-1.36x their own recorded times on today's
# box). These three sentinels are FROZEN — raw spark.sql over the raw
# parquet, never routed through the registry or tables.py, never to be
# edited — so their wall-clock can only move when the environment moves.
# drift_factor = geometric mean of (today's sentinel median / its recorded
# quiet-box baseline); the artifact reports both raw and drift-normalized
# core totals so round-over-round comparisons stop needing manual bisects.
# ---------------------------------------------------------------------------
_SENTINELS = {
    # CPU + scan bound: TPC-H Q1 shape (pushdown filter, decimal aggs)
    "aa_scan_agg": (
        "SELECT l_returnflag, l_linestatus, COUNT(*) AS n, "
        "SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq, "
        "SUM(l_extendedprice * (1 - l_discount)) AS rev "
        "FROM aa_li WHERE l_shipdate <= TIMESTAMP '1998-09-02' "
        "GROUP BY l_returnflag, l_linestatus"
    ),
    # shuffle bound: high-cardinality group key, two-phase hash agg
    "aa_shuffle_group": (
        "SELECT COUNT(*) AS n FROM (SELECT l_orderkey, l_partkey, "
        "COUNT(*) AS c, SUM(l_quantity) AS s FROM aa_li "
        "GROUP BY l_orderkey, l_partkey)"
    ),
    # sort bound: global range-partitioned sort, fully materialized
    "aa_global_sort": (
        "SELECT l_orderkey, l_linenumber, l_extendedprice FROM aa_li "
        "ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber"
    ),
}

# Quiet-box medians recorded on the round-11 uncontended run (sf key ->
# {sentinel: sec}); drift_factor is emitted only when the run's sf has a
# recorded baseline. These values are measurement constants — update them
# only from a deliberately quiet A/A run, never from a driver run.
# Recorded 2026-08-17 (r11 optimization round) in the QUIETEST window the
# box showed all day, local[32]. The same day's round-start run measured
# 1.132/1.282/1.755 — the box drifts >2x within hours, which is the whole
# reason these sentinels exist; a drift_factor near 2 means "the r11
# round-start conditions", near 1 means "quiet box".
_SENTINEL_BASELINE: dict[float, dict[str, float]] = {
    0.1: {
        "aa_scan_agg": 0.509,
        "aa_shuffle_group": 0.627,
        "aa_global_sort": 0.799,
    },
    # Recorded 2026-08-18 (r12 optimization round) from the first full
    # sf1-replica bench (BENCH_sf1_r12.json), box near its quiet state
    # (same-session sf0.1 drift_factor 0.813 measured an hour earlier).
    1.0: {
        "aa_scan_agg": 0.946,
        "aa_shuffle_group": 1.078,
        "aa_global_sort": 1.464,
    },
}


def _run_sentinels(spark, sf_dir: str, repeats: int = 3) -> dict[str, float]:
    """Median wall-clock per frozen sentinel (one untimed warm-up each)."""
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")) \
        .createOrReplaceTempView("aa_li")
    times: dict[str, float] = {}
    for name, sql in _SENTINELS.items():
        _materialize(spark.sql(sql))
        runs = []
        for _ in range(repeats):
            t0 = time.monotonic()
            _materialize(spark.sql(sql))
            runs.append(time.monotonic() - t0)
        times[name] = round(sorted(runs)[len(runs) // 2], 3)
    return times


def _drift_factor(sentinels: dict[str, float], sf: float) -> float | None:
    base = _SENTINEL_BASELINE.get(sf)
    if not base:
        return None
    ratios = [sentinels[k] / base[k] for k in base if k in sentinels]
    if not ratios:
        return None
    prod = 1.0
    for r in ratios:
        prod *= r
    return round(prod ** (1.0 / len(ratios)), 3)


def _materialize(df) -> None:
    """Force full execution executor-side; rows are produced then dropped."""
    df.write.format("noop").mode("overwrite").save()


_EVENTLOG_DIR = "/tmp/c2spark_bench_eventlog"


def _stage_metrics_by_group(eventlog_dir: str) -> dict[str, dict[str, int]]:
    """Attribute per-stage executor metrics to job groups from the event log.

    The Spark event log is the stable public surface for stage-level
    metrics (the AppStatusStore's py4j signature churns across versions).
    JobStart events carry the ``spark.jobGroup.id`` property and the job's
    stage ids; StageCompleted events carry the stage's aggregated internal
    accumulators (shuffle bytes written / read, executor run time). Each
    timed repeat runs under its own job group, so the reported metrics are
    exactly the chosen repeat's — host CPU-steal moves wall-clock, but
    shuffle BYTES are plan-determined, which is what makes a plan
    regression separable from a noisy host."""
    import glob

    stage_group: dict[int, str] = {}
    metrics: dict[str, dict[str, int]] = {}
    # Compact keys keep the one-line JSON inside the driver's stdout-tail
    # capture window (BENCH_r01 was lost to an oversized line):
    # sw=shuffle bytes written, sr=shuffle bytes read, tt=executor task
    # time ms, in=input bytes read.
    # ph=peak JVM heap bytes, pe=peak on-heap execution memory bytes —
    # MAX over the group's stages/executors (SparkListenerStageExecutorMetrics
    # events, emitted when spark.eventLog.logStageExecutorMetrics=true).
    # Shuffle linearity was proven by the 10x artifact; memory cliffs are
    # the remaining scale unknown (round-5 verdict item 6), and a peak that
    # grows super-linearly at 10x flags a query that will OOM at 100 TB.
    wanted = {
        "internal.metrics.shuffle.write.bytesWritten": "sw",
        "internal.metrics.shuffle.read.localBytesRead": "sr",
        "internal.metrics.shuffle.read.remoteBytesRead": "sr",
        "internal.metrics.executorRunTime": "tt",
        "internal.metrics.input.bytesRead": "in",
        # spill evidence (round-7 verdict ask #2): a query whose heap peak
        # sits on the JVM ceiling is benign iff ds/ms stay ~0
        "internal.metrics.memoryBytesSpilled": "ms",
        "internal.metrics.diskBytesSpilled": "ds",
    }
    peak_keys = {"JVMHeapMemory": "ph", "OnHeapExecutionMemory": "pe"}
    # Single-file logs sit flat in the dir; the v2 rolling format nests
    # events_* files under an eventlog_v2_<appid>/ subdirectory (next to a
    # binary appstatus_* snapshot, which the JSON-decode guard skips).
    paths = [
        p
        for p in glob.glob(os.path.join(eventlog_dir, "**", "*"), recursive=True)
        if not os.path.isdir(p)
    ]
    for path in sorted(paths):
        with open(path, errors="replace") as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                kind = ev.get("Event")
                if kind == "SparkListenerJobStart":
                    group = (ev.get("Properties") or {}).get("spark.jobGroup.id")
                    if group:
                        for sid in ev.get("Stage IDs", []):
                            stage_group[sid] = group
                elif kind == "SparkListenerStageCompleted":
                    info = ev.get("Stage Info", {})
                    group = stage_group.get(info.get("Stage ID"))
                    if group is None:
                        continue
                    acc = metrics.setdefault(group, {})
                    for a in info.get("Accumulables", []):
                        name = wanted.get(a.get("Name", ""))
                        if name is not None and isinstance(a.get("Value"), int):
                            acc[name] = acc.get(name, 0) + a["Value"]
                elif kind == "SparkListenerStageExecutorMetrics":
                    group = stage_group.get(ev.get("Stage ID"))
                    if group is None:
                        continue
                    acc = metrics.setdefault(group, {})
                    em = ev.get("Executor Metrics", {})
                    for mk, short in peak_keys.items():
                        v = em.get(mk)
                        if isinstance(v, int):
                            acc[short] = max(acc.get(short, 0), v)
    return metrics


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entrymod
    from c2_duckdb_runner_spark import session as session_mod

    # Build through the package factory so the timed path runs with the SAME
    # session-creation-time confs the tests and driver verify against
    # (maxPartitionBytes, shuffle width, AQE, UTC timezone). NO event
    # logging here: serializing per-task events costs sub-second queries up
    # to 5x wall-clock (measured: agg_time_rollup 0.7s -> 4s), so metrics
    # collection runs as a SEPARATE untimed pass after the timings.
    spark = session_mod.get_spark(app_name="c2-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    # Optional subset override (csv) — used by the scale-validation run
    # (BENCH_sf1) to time just the most expensive queries at a larger SF.
    chosen = os.environ.get("SPARK_GRAFT_BENCH_KEYS")
    headline = chosen.split(",") if chosen else HEADLINE
    keys = [k for k in headline if k in qs]
    missing = [k for k in headline if k not in qs]
    if missing:
        print(f"bench: skipping unregistered keys: {missing}", file=sys.stderr)

    # Warm-up (not counted): JVM/codegen/parquet-footer caches, plus the
    # Python worker pool — the first pandas-UDF stage otherwise pays ~32
    # one-time pandas imports and that fixed cost would land on whichever
    # UDF query happens to run first.
    _materialize(qs["scan_filter_count"](spark, sf_dir))
    spark.range(1000).repartition(int(cpus)).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    # Median-of-3 over steady state: this host shows heavy external
    # CPU-steal spikes (identical queries vary >10x minutes apart — see
    # PERFORMANCE.md), and the first execution of a query additionally pays
    # one-time plan compilation + codegen. A dedicated UNTIMED warm-up run
    # per query removes that cold-start from the sample entirely (round-3
    # medians were warm-up-polluted: dedup_minhash_lsh raw [4.60, 1.38,
    # 0.86] median-reported 1.38s for a 0.86s steady-state query); the
    # median over the remaining repeats then damps both a one-off stall AND
    # a suspiciously-fast fluke. Per-repeat raw times are kept in the
    # durable copy so the spread itself is auditable.
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))

    # A/A drift control first (frozen sentinels; see _SENTINELS above)
    sentinels = _run_sentinels(spark, sf_dir, repeats)
    drift = _drift_factor(sentinels, _sf_from_dir(sf_dir))
    print(f"bench: sentinels {sentinels} drift_factor={drift}",
          file=sys.stderr)

    timings: dict[str, float] = {}
    raw_times: dict[str, list[float]] = {}
    errors: dict[str, str] = {}
    for key in keys:
        runs: list[float] = []
        try:
            _materialize(qs[key](spark, sf_dir))  # untimed per-query warm-up
            for _ in range(repeats):
                t0 = time.monotonic()
                _materialize(qs[key](spark, sf_dir))
                runs.append(time.monotonic() - t0)
        except Exception as exc:  # one broken query must not sink the run
            # Keep error strings SHORT (80 chars): the driver captures only a
            # stdout tail, and long errors previously pushed the JSON line
            # past the capture window (BENCH_r01 "parsed": null).
            errors[key] = str(exc).split("\n", 1)[0][:80]
            print(f"bench: {key} ERROR {errors[key]}", file=sys.stderr)
            continue
        timings[key] = round(sorted(runs)[len(runs) // 2], 3)
        raw_times[key] = [round(t, 3) for t in runs]
        print(f"bench: {key} {timings[key]:.3f}s {raw_times[key]}", file=sys.stderr)
        # drop operator-internal caches (e.g. LSH signature tables) so later
        # queries aren't taxed by earlier queries' resident memory
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    # cross-round-comparable total over the frozen CORE set (the full
    # total drifts upward as new operators join HEADLINE every round)
    core_total = round(sum(v for k, v in timings.items() if k in CORE), 3)
    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "core_total": core_total,
        "core_n": sum(1 for k in timings if k in CORE),
        "queries": timings,
        "sf": _sf_from_dir(sf_dir),
        "cpus": int(cpus),
        "repeats": repeats,
        "warmup": 1,  # one untimed per-query run, see comment above
        "stat": "median",
        "sentinels": sentinels,
        "drift_factor": drift,
        "core_total_drift_norm": (
            round(core_total / drift, 3) if drift else None
        ),
    }
    if errors:
        out["errors"] = errors
    spark.stop()

    # --- compact driver-facing headline line ---------------------------
    # The driver keeps only the LAST ~2000 chars of stdout and parses the
    # final JSON line out of that tail (measured: BENCH_r01..r03 all store
    # a tail of exactly 2000 chars; r03's 11 KB line straddled the window
    # and recorded "parsed": null). So the stdout line is a BUDGETED view:
    # metric/value/unit/queries/sf/cpus only, 2-decimal seconds, compact
    # separators — and if the full query dict still exceeds the budget, the
    # CHEAPEST queries are dropped from the stdout dict (never from
    # BENCH_local.json, which always carries every query + raw repeats +
    # stage metrics) with an "omitted" count + their summed seconds, so the
    # headline total remains the sum over ALL queries and the line is
    # guaranteed parseable no matter how the headline set grows.
    _BUDGET = 1950  # chars; driver tail is 2000, leave newline + drift room

    def _compact_line(
        qdict: dict[str, float],
        omitted: int,
        omitted_sec: float,
        omitted_max: float,
    ) -> str:
        obj = {
            "metric": "headline_queries_total_wall",
            "value": total,
            "unit": "sec",
            "core_total": core_total,
            "core_n": out["core_n"],
            "drift_factor": drift,
            "queries": {k: round(v, 2) for k, v in qdict.items()},
            "sf": _sf_from_dir(sf_dir),
            "cpus": int(cpus),
        }
        if omitted:
            obj["omitted"] = omitted
            obj["omitted_sec"] = round(omitted_sec, 2)
            # per-query bound: the artifact itself proves no expensive
            # query hides in the omitted tail (round-4 verdict ask)
            obj["omitted_max"] = round(omitted_max, 2)
        if errors:
            obj["errors"] = len(errors)
        return json.dumps(obj, separators=(",", ":"))

    shown = dict(timings)
    omitted_sec = 0.0
    omitted_max = 0.0
    # drop cheapest-first so the expensive (plan-interesting) queries stay
    drop_order = sorted(timings, key=lambda k: (timings[k], k))
    line = _compact_line(shown, 0, 0.0, 0.0)
    for victim in drop_order:
        if len(line) <= _BUDGET:
            break
        dropped = shown.pop(victim)
        omitted_sec += dropped
        omitted_max = max(omitted_max, dropped)
        line = _compact_line(
            shown, len(timings) - len(shown), omitted_sec, omitted_max
        )

    # --- untimed stage-metrics pass ------------------------------------
    # Fresh session WITH event logging, one run per query under its own job
    # group. Shuffle/input BYTES are plan-determined — identical whether
    # the run is timed or not — so this pass pays the event-log tax where
    # wall-clock doesn't matter, and the timings above stay clean. The
    # metrics let a reader separate host CPU-steal (bytes steady, seconds
    # spike) from a plan regression (bytes move).
    full_metrics: dict[str, dict[str, int]] = {}
    try:
        import shutil

        shutil.rmtree(_EVENTLOG_DIR, ignore_errors=True)
        os.makedirs(_EVENTLOG_DIR, exist_ok=True)
        mspark = session_mod.get_spark(
            app_name="c2-spark-bench-metrics",
            extra_confs={
                "spark.eventLog.enabled": "true",
                "spark.eventLog.dir": f"file://{_EVENTLOG_DIR}",
                "spark.eventLog.compress": "false",
                # per-stage executor-memory peaks (ph/pe in stage_metrics);
                # default polling is heartbeat-only (10 s), which records 0
                # for every sub-10 s stage — poll every 100 ms instead
                # (untimed pass, so the polling tax is free)
                "spark.eventLog.logStageExecutorMetrics": "true",
                "spark.executor.metrics.pollingInterval": "100ms",
            },
        )
        mspark.sparkContext.setLogLevel("ERROR")
        for key in keys:
            if key in errors:
                continue
            try:
                mspark.sparkContext.setJobGroup(key, key)
                _materialize(qs[key](mspark, sf_dir))
            except Exception:
                continue
            finally:
                mspark.sparkContext.setJobGroup("", "")
            mspark.catalog.clearCache()
        mspark.stop()  # flushes + finalizes the event log
        full_metrics = _stage_metrics_by_group(_EVENTLOG_DIR)
    except Exception as exc:  # metrics are additive evidence, never fatal
        print(f"bench: stage metrics unavailable: {exc}", file=sys.stderr)
    # Durable copy on disk (the driver's stdout capture is tail-limited);
    # carries EVERY query's median, the per-repeat raw wall-clocks, full
    # error strings, and the stage metrics (sw=shuffle bytes written,
    # sr=shuffle bytes read, tt=executor task ms, in=input bytes read) that
    # the budgeted one-line stdout JSON omits.
    try:
        with open(
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                # Default mirror is gitignored so automated (often
                # contended) driver runs never clobber the curated
                # uncontended BENCH_local.json; refresh that one
                # explicitly with SPARK_GRAFT_BENCH_OUT=BENCH_local.json.
                os.environ.get("SPARK_GRAFT_BENCH_OUT", "BENCH_mirror.json"),
            ),
            "w",
        ) as fh:
            json.dump(
                {**out, "raw_times": raw_times, "stage_metrics": full_metrics},
                fh,
                indent=1,
            )
    except OSError:
        pass
    print(line, flush=True)


if __name__ == "__main__":
    main()
