#!/usr/bin/env python
"""Regenerate the auto-maintained blocks of COVERAGE.md from the registry.

History: verdict r06 item 4 flagged hand-typed COUNTS ("453 queries" against
a 472-key registry); verdict r07 item 7 flagged the hand-maintained per-row
KEY LISTS in the Tier-B table as the same drift class. Both are generated
now. Three marker-delimited blocks are rewritten in place; everything else
in COVERAGE.md (Tier-A prose, the scale-pattern commentary) stays
hand-written:

- AUTO-COUNTS: the header sentence with len(queries()) and the oracle count.
- AUTO-TIERB:  the §2 Tier-B mapping table. Each row is declared below as
  (label, exact keys and/or claim regex, note); key lists render from the
  LIVE registry. Ordered first-match-wins claiming, and the generator FAILS
  if any registry key is unclaimed — so a new operator cannot land without
  being assigned to a §2 row or family, and a renamed key breaks --check
  instead of leaving a stale list behind.
- AUTO-KEYS: the full sorted key inventory, one fenced block, with a
  rows-only marker for the (currently zero) keys lacking an oracle.

tests/test_properties.py pins that the committed file matches what this
script would write, so any registry growth without a regen fails CI.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BEGIN_COUNTS = "<!-- BEGIN AUTO-COUNTS (tools/gen_coverage.py) -->"
END_COUNTS = "<!-- END AUTO-COUNTS -->"
BEGIN_KEYS = "<!-- BEGIN AUTO-KEYS (tools/gen_coverage.py) -->"
END_KEYS = "<!-- END AUTO-KEYS -->"
BEGIN_TIERB = "<!-- BEGIN AUTO-TIERB (tools/gen_coverage.py) -->"
END_TIERB = "<!-- END AUTO-TIERB -->"

# --------------------------------------------------------------------------
# §2 Tier-B rows + north-star families. Ordered; each registry key is
# claimed by the FIRST row whose exact list or regex matches it. Every key
# must be claimed (asserted below).
# --------------------------------------------------------------------------
TIER_B = [
    # --- §2 rows (the reference's delegated SQL surface) -----------------
    ("`scan_parquet_dir` (§2)",
     ["scan_dir_enumerate", "scan_filter_count"], None, ""),
    ("`scan_csv`, `scan_json`, `scan_orc` (§2)",
     ["scan_csv_roundtrip", "scan_json_roundtrip", "scan_orc_roundtrip",
      "scan_binary_files", "sink_parquet_zstd", "scan_text_roundtrip",
      "scan_xml_roundtrip", "scan_csv_quarantine", "scan_json_multiline"],
     None,
     "write+read differentials; binaryFile byte-exact parity; explicit "
     "zstd codec round-trip; malformed-row quarantine"),
    ("`sink_parquet` (§2)",
     ["sink_parquet", "scan_partitioned_parquet"], None,
     "hive-partitioned write + partition pruning"),
    ("`project_columns`, `project_exprs` (§2)",
     ["project_columns", "project_exprs", "project_star"], None, ""),
    ("`sql_recursive_cte` (§2)",
     ["sql_recursive_cte"], None,
     "recursive CTE (Spark 4): ancestor-chain walk"),
    ("`filter_compound` + predicate surface (§2)",
     None, r"^filter_", "includes the Tier-A gt-threshold / arbitrary-"
     "predicate rows' registry twins"),
    ("`join_inner_hash` (§2)", ["join_inner_hash"], None, ""),
    ("`join_broadcast` (§2)", ["join_broadcast"], None, ""),
    ("`join_left/right/full_outer` (§2)",
     ["join_left_outer", "join_right_outer", "join_full_outer",
      "join_cross"], None, ""),
    ("`join_semi`, `join_anti` (§2)", ["join_semi", "join_anti"], None, ""),
    ("`join_theta_range` (§2)",
     ["join_theta_range", "join_range_banded"], None,
     "BNLJ baseline (cost documented) + banded equi-join scale path"),
    ("`join_asof` (§2)",
     ["join_asof", "join_asof_forward", "join_asof_nearest",
      "join_asof_tolerance"], None,
     "union + window carry-forward; DuckDB ASOF JOIN oracles"),
    ("`agg_groupby_hash` (§2)",
     ["agg_groupby_hash", "agg_groupby_multikey", "agg_min_max",
      "agg_having", "agg_conditional", "agg_variance_manual",
      "agg_percentiles", "agg_rowcount"], None, ""),
    ("`agg_distinct` (§2)", ["agg_distinct"], None, ""),
    ("`agg_approx_distinct` (§2)", ["agg_approx_distinct"], None,
     "accuracy-pinned oracle: exact count hash-matched + within-5×rsd "
     "verdict bit"),
    ("`agg_grouping_sets/cube/rollup` (§2)",
     ["agg_grouping_sets", "agg_cube", "agg_rollup", "agg_grouping_id",
      "fn_unpivot_melt"], None, "UNPIVOT wide→long included"),
    ("`window_rank/row_number/dense_rank` (§2)",
     ["window_rank_dense", "window_row_number", "window_ntile_percent"],
     None, ""),
    ("`window_lag_lead` (§2)",
     ["window_lag_lead", "window_first_last"], None, ""),
    ("`window_frame_agg` (§2)",
     ["window_running_sum", "window_moving_frame"], None, ""),
    ("`sort_orderby` (§2)",
     ["sort_orderby_multi", "sort_nulls_explicit"], None,
     "NULL order pinned"),
    ("`limit`, `topk` (§2)",
     ["limit_offset", "limit_topk", "topk_per_group"], None, ""),
    ("`set_union_all/union/intersect/except` (§2)", None, r"^set_", ""),
    ("`fn_string` (§2)",
     ["fn_string", "fn_string_split", "fn_regex"], None, ""),
    ("`fn_date` (§2)",
     ["fn_date", "fn_add_months_calendar", "fn_timezone_convert",
      "fn_interval_arith"], None, ""),
    ("`fn_math` (§2)",
     ["fn_math", "fn_hash", "fn_trig", "fn_bit_ops"], None, ""),
    ("`fn_conditional` (§2)", ["fn_conditional"], None, ""),
    ("`fn_cast` (§2)", ["fn_cast", "fn_try_arith"], None,
     "ANSI pinned session-wide; try_ variants NULL-on-error"),
    ("`fn_array` (§2)", None, r"^fn_array_", "incl. HOFs and set ops"),
    ("`fn_map_struct` (§2)",
     ["fn_map", "fn_map_higher_order", "fn_struct", "fn_str_to_map"],
     None, ""),
    ("`fn_json` (§2)",
     ["fn_json", "fn_from_json", "fn_to_json", "fn_variant",
      "fn_xml_parse", "fn_from_csv"], None,
     "Spark 4 VARIANT; XML + CSV parsers"),
    ("`udf_python` (§2)",
     ["udf_pandas_scalar", "udf_pandas_iterator_model"], None,
     "pandas scalar; Iterator model-load pattern (per-worker init "
     "amortized over Arrow batches)"),
    ("`udaf` (§2)",
     ["udaf_grouped_pandas", "udf_grouped_arrow", "udf_cogrouped_pandas"],
     None, "applyInPandas / Spark 4 applyInArrow / cogrouped"),
    ("`udtf` (§2)", None, r"^udtf_",
     "Spark 4 Python UDTFs, polymorphic + LATERAL"),
    ("`stream_tumbling/sliding` (§2)",
     ["stream_tumbling", "stream_sliding", "stream_tumbling_approx_users"],
     None, "every stream_* key reads the events file-stream source "
     "(§2 stream_read_events)"),
    ("`stream_session_window` (§2)", ["stream_session_window"], None, ""),
    ("`stream_watermark_late` (§2)", ["stream_watermark_late"], None,
     "append-mode watermark cutoff, oracle-replayed"),
    ("`stream_dedup`, `stream_stateful` (§2)",
     ["stream_dedup", "stream_stateful_counts",
      "stream_transform_with_state"], None,
     "dropDuplicatesWithinWatermark; applyInPandasWithState; Spark 4 "
     "transformWithStateInPandas (RocksDB)"),
    ("`stream_static_join`, `stream_stream_join` (§2)",
     ["stream_static_join", "stream_stream_interval_join"], None,
     "watermarked interval join, event-time-bounded state"),
    ("`llm_dedup_exact` (§2)",
     ["dedup_exact", "dedup_latest_by_key", "dedup_normalized_text",
      "dedup_url_canonical"], None, "hash-groupBy, no window sort"),
    ("`llm_dedup_near` (§2)",
     ["dedup_near_ngram_jaccard", "dedup_minhash_lsh", "dedup_minhash_oph",
      "dedup_simhash", "dedup_embedding_cosine", "dedup_semantic_keep",
      "dedup_lsh_scurve_audit"], None,
     "LSH band-bucketed; SimHash pigeonhole; OPH; SemDeDup; expected-vs-"
     "measured S-curve audit"),
    ("`llm_simsearch` (§2)",
     ["simsearch_topk_bruteforce", "simsearch_ivf_label",
      "simsearch_lsh_hyperplane", "simsearch_batch_knn"], None,
     "brute-force exact baseline + IVF / LSH scale paths"),
    ("`llm_text_analysis` (§2)",
     ["text_token_count", "text_langid_ngram", "text_quality_score",
      "text_fingerprint", "text_tfidf_topterms"], None, ""),
    ("`llm_multimodal_col` (§2)", None, r"^(mm_|semantic_filter_)",
     "honest byte-level stubs (no codec libs in sandbox); Arrow plumbing "
     "real and tested"),
    # --- north-star families (everything beyond the §2 rows) -------------
    ("scan/source extensions", None, r"^(scan_|source_)",
     "metadata cols, stats/bloom pruning, schema evolution, globbing, "
     "python datasource"),
    ("sink/layout extensions", None, r"^(sink_|layout_)",
     "arrow columnar sink, small-file compaction, z-order layout"),
    ("join extensions", None, r"^join_",
     "bucketed-colocated, salted-skew, bloom-pruned, DPP, interval/spatial/"
     "set-similarity/doc-span, point-in-time + bitemporal"),
    ("aggregate extensions", None, r"^agg_",
     "sketches, ordered stats, pivots, time rollups, concentration/"
     "distribution measures"),
    ("window extensions", None, r"^window_",
     "gaps-islands, sessions, peaks, streaks, running distinct"),
    ("fn extensions", None, r"^fn_",
     "AES/codec round-trips, collation, explode_outer, IPv4/URL parse, "
     "printf, content UUIDs"),
    ("streaming sink/source extensions", None, r"^stream_",
     "chained stateful aggs, DLQ split, foreachBatch, transactional "
     "parquet sink, python streaming source"),
    ("modern SQL surface", None, r"^(sql_|values_|gen_series_)",
     "pipe syntax, EXECUTE IMMEDIATE, scripting variables, GROUP BY ALL, "
     "named windows, VALUES, sequence spines"),
    ("TPC-H-shaped composites", None, r"^composite_",
     "the 21 multi-operator join-tree / subquery-decorrelation pipelines"),
    ("graph analytics", None, r"^graph_",
     "PageRank/PPR/HITS/BFS, components, assortativity, k-core, LPA, "
     "modularity, walks"),
    ("statistics & hypothesis tests", None, r"^stats_",
     "drift, ranks, robust location/scale, agreement, association"),
    ("time series", None, r"^ts_",
     "decompose, anomaly, control charts, forecast, memory/trend tests"),
    ("retrieval eval & rank fusion", None, r"^(eval_|search_|rank_)",
     "BM25, NDCG/MRR/ERR/RBP/AP, fusion (RRF/Borda/Condorcet), "
     "classifier metrics, agreement"),
    ("sampling / mixtures / splits", None,
     r"^(sample_|mixture_|mlsplit_|split_)",
     "stratified/weighted/coreset/DSIR, temperature mixtures, k-fold"),
    ("pipeline & curation", None,
     r"^(pipeline_|profile_|audit_|query_|corpus_)",
     "packing, batching, sharding, token budgets, gates, health reports, "
     "skyline"),
    ("text extensions", None,
     r"^(text_|tokenizer_|bpe_|doc_|quality_)",
     "quality/readability/diversity scores, PII, keywords, BPE, chunking, "
     "contamination"),
    ("dedup extensions", None, r"^dedup_",
     "CDC chunking, clustering, incremental, sorted-neighborhood, spans, "
     "containment, edit-distance"),
    ("simsearch/embedding extensions", None, r"^(simsearch_|embed_)",
     "PQ/ADC, multiprobe, matryoshka, MMR, radius; PCA/JL/whiten/quantize/"
     "RVQ/k-means"),
    ("product analytics", None,
     r"^(funnel_|retention_|sessionize_|sessions_|attribution_|ab_|"
     r"causal_|rollup_|interval_)",
     "funnels, cohorts, sessionization, attribution, A/B & causal"),
    ("ER / CDC / lakehouse / IVM", None,
     r"^(er_|upsert_|cdc_|incremental_|lakehouse_)",
     "Fellegi-Sunter, survivorship, SCD2, MERGE, time travel, incremental "
     "view maintenance"),
    ("privacy", None, r"^privacy_",
     "k-anonymity, l-diversity, t-closeness, generalization"),
    ("sketches", None, r"^sketch_", "Bloom, Count-Min, AMS F2"),
    ("allocation methods", None, r"^alloc_",
     "largest-remainder, divisor methods, FIFO waterfall"),
    ("python boundary extras", None, r"^pandas_",
     "pandas-on-Spark API parity"),
]


def _claim(keys: list[str]):
    """Assign every registry key to the first matching TIER_B row."""
    remaining = dict.fromkeys(keys)
    rows = []
    for label, exact, pattern, note in TIER_B:
        claimed = []
        if exact:
            for k in exact:
                if k not in remaining:
                    raise SystemExit(
                        f"gen_coverage: row {label!r} lists key {k!r} which "
                        "is not in the registry (or already claimed)"
                    )
                claimed.append(k)
                del remaining[k]
        if pattern:
            rx = re.compile(pattern)
            for k in list(remaining):
                if rx.search(k):
                    claimed.append(k)
                    del remaining[k]
        rows.append((label, sorted(claimed), note))
    if remaining:
        raise SystemExit(
            "gen_coverage: unclaimed registry keys (assign them to a §2 row "
            f"or family in TIER_B): {sorted(remaining)}"
        )
    return rows


def render_counts() -> str:
    from c2_duckdb_runner_spark import registry

    qs = registry.queries()
    oracles = registry.oracle_sql()
    n, n_o = len(qs), len(oracles)
    return (
        f"{BEGIN_COUNTS}\n"
        f"**{n} registered queries, {n_o} with DuckDB oracles"
        f"{'' if n == n_o else f' ({n - n_o} rows-only)'}** — counts and the\n"
        f"inventory below are generated from `registry.queries()` by\n"
        f"`tools/gen_coverage.py`; `tests/test_properties.py` pins them.\n"
        f"{END_COUNTS}"
    )


def render_tierb() -> str:
    from c2_duckdb_runner_spark import registry

    rows = _claim(sorted(registry.queries()))
    lines = [
        BEGIN_TIERB,
        "Generated from the live registry by `tools/gen_coverage.py`:",
        "each key is claimed by the FIRST matching row, every key must be",
        "claimed (the generator fails otherwise), and",
        "`tests/test_properties.py` pins the committed table. §2 rows come",
        "first; north-star families claim the surface beyond the",
        "reference's own.",
        "",
        "| §2 row / family | n | registry keys | note |",
        "|---|---|---|---|",
    ]
    for label, keys, note in rows:
        key_cell = " ".join(f"`{k}`" for k in keys)
        lines.append(f"| {label} | {len(keys)} | {key_cell} | {note or ''} |")
    total = sum(len(k) for _, k, _ in rows)
    lines += ["", f"Total claimed: **{total}** keys.", END_TIERB]
    return "\n".join(lines)


def render_keys() -> str:
    from c2_duckdb_runner_spark import registry

    qs = registry.queries()
    oracles = registry.oracle_sql()
    lines = [
        k if k in oracles else f"{k}  [rows-only]" for k in sorted(qs)
    ]
    body = "\n".join(lines)
    return (
        f"{BEGIN_KEYS}\n"
        f"## Registry inventory ({len(qs)} keys, generated)\n\n"
        f"```\n{body}\n```\n"
        f"{END_KEYS}"
    )


def rewrite(text: str) -> str:
    for begin, end, block in (
        (BEGIN_COUNTS, END_COUNTS, render_counts()),
        (BEGIN_TIERB, END_TIERB, render_tierb()),
        (BEGIN_KEYS, END_KEYS, render_keys()),
    ):
        pat = re.compile(re.escape(begin) + r".*?" + re.escape(end), re.S)
        if pat.search(text):
            text = pat.sub(lambda _m: block, text)
        else:
            text = text.rstrip("\n") + "\n\n" + block + "\n"
    return text


def main() -> None:
    path = os.path.join(REPO, "COVERAGE.md")
    with open(path) as fh:
        text = fh.read()
    new = rewrite(text)
    if "--check" in sys.argv:
        if new != text:
            sys.exit("COVERAGE.md is stale — run tools/gen_coverage.py")
        print("COVERAGE.md is current")
        return
    with open(path, "w") as fh:
        fh.write(new)
    print(f"rewrote {path}")


if __name__ == "__main__":
    main()
