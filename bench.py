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
]


def _sf_from_dir(sf_dir: str) -> float:
    tail = os.path.basename(os.path.normpath(sf_dir))
    if tail.startswith("sf"):
        try:
            return float(tail[2:])
        except ValueError:
            pass
    return -1.0


def _materialize(df) -> None:
    """Force full execution executor-side; rows are produced then dropped."""
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entrymod
    from c2_duckdb_runner_spark import session as session_mod

    # Build through the package factory so the timed path runs with the SAME
    # session-creation-time confs the tests and driver verify against
    # (maxPartitionBytes, shuffle width, AQE, UTC timezone).
    spark = session_mod.get_spark(app_name="c2-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    keys = [k for k in HEADLINE if k in qs]
    missing = [k for k in HEADLINE if k not in qs]
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

    # Best-of-2: this host shows heavy external CPU-steal spikes (identical
    # queries vary >10x minutes apart — see PERFORMANCE.md), and the first
    # run also pays one-time plan compilation. min(2 runs) reports
    # steady-state throughput, which is the quantity comparable to the
    # reference's protocol.
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for key in keys:
        best = float("inf")
        try:
            for _ in range(repeats):
                t0 = time.monotonic()
                _materialize(qs[key](spark, sf_dir))
                best = min(best, time.monotonic() - t0)
        except Exception as exc:  # one broken query must not sink the run
            # Keep error strings SHORT (80 chars): the driver captures only a
            # stdout tail, and long errors previously pushed the JSON line
            # past the capture window (BENCH_r01 "parsed": null).
            errors[key] = str(exc).split("\n", 1)[0][:80]
            print(f"bench: {key} ERROR {errors[key]}", file=sys.stderr)
            continue
        timings[key] = round(best, 3)
        print(f"bench: {key} {timings[key]:.3f}s", file=sys.stderr)
        # drop operator-internal caches (e.g. LSH signature tables) so later
        # queries aren't taxed by earlier queries' resident memory
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_from_dir(sf_dir),
        "cpus": int(cpus),
    }
    if errors:
        out["errors"] = errors
    # Durable copy on disk (the driver's stdout capture is tail-limited).
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_local.json"),
            "w",
        ) as fh:
            json.dump(out, fh)
    except OSError:
        pass
    # Stop Spark BEFORE printing so no shutdown logging can land after the
    # JSON line — it must be the very last stdout line.
    spark.stop()
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
