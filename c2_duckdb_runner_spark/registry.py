"""Query registry — the single source of truth behind the driver contract.

Every operator from SURVEY.md §2 is registered here exactly once, with:
- a Spark callable ``(spark, sf_dir) -> DataFrame``
- the equivalent ANSI SQL for the DuckDB oracle (or None for ops SQL can't
  express — streaming, iterative — which the driver checks rows-only).

``__spark_entry__.py`` re-exports ``queries()`` / ``oracle_sql()`` from here.

Oracle-parity discipline (SURVEY.md §7 "what's hard" #1):
- alias every computed column identically on both sides;
- never SUM/AVG raw doubles (partial-aggregation order is nondeterministic):
  route through DECIMAL(18,2) and cast the final result to DOUBLE;
- pin timestamps to epoch millis (``unix_millis`` / ``epoch_ms``) when the
  source precision differs (events.ts is ns; Spark truncates to µs);
- no ORDER BY needed for the hash (order-insensitive) except under LIMIT,
  where the sort must be total (tie-broken) to be deterministic.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from c2_duckdb_runner_spark.session import apply_runtime_confs, release_scratch

QueryFn = Callable[[SparkSession, str], DataFrame]

# Reentrancy depth: composite queries call other REGISTERED queries while
# building their plan (the decorator rebinds the module-level name to the
# wrapper), and those inner entries must not release the outer query's
# scratch-persisted tables mid-build. Only a depth-0 entry — a new
# top-level query — releases the previous query's scratch.
_ENTRY_DEPTH = 0


@dataclass
class Query:
    key: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    # the undecorated function, kept so provenance tooling can hash the
    # operator's actual source (inspect.getsource of the wrapper would
    # hash the registry closure below instead)
    src_fn: QueryFn | None = None


REGISTRY: dict[str, Query] = {}


def fdoc(text: str):
    """Attach an import-time-formatted docstring.

    An f-string literal in function-body position is NOT a docstring (the
    interpreter evaluates and discards it on every call, leaving ``__doc__``
    None). Operators whose documentation interpolates module constants
    (fence sizes, window widths) pass the f-string here instead; it is
    evaluated exactly once at import and becomes the real ``__doc__`` that
    ``register`` records. Apply BELOW ``@register`` so it runs first.
    """

    def deco(fn):
        fn.__doc__ = text
        return fn

    return deco


def register(key: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: add one queries()/oracle_sql() pair to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if key in REGISTRY:
            raise ValueError(f"duplicate query key: {key}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            global _ENTRY_DEPTH
            apply_runtime_confs(spark)
            if _ENTRY_DEPTH == 0:
                release_scratch()  # previous query's persisted scratch
            _ENTRY_DEPTH += 1
            try:
                return fn(spark, sf_dir)
            finally:
                _ENTRY_DEPTH -= 1

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        REGISTRY[key] = Query(
            key=key, fn=wrapped, oracle=oracle, doc=fn.__doc__ or "",
            src_fn=fn,
        )
        return wrapped

    return deco


def _load_all_modules() -> None:
    """Import every module that registers queries (idempotent)."""
    import c2_duckdb_runner_spark.operators.tier_a  # noqa: F401
    import c2_duckdb_runner_spark.operators.filters  # noqa: F401
    import c2_duckdb_runner_spark.operators.joins  # noqa: F401
    import c2_duckdb_runner_spark.operators.aggregates  # noqa: F401
    import c2_duckdb_runner_spark.operators.windows  # noqa: F401
    import c2_duckdb_runner_spark.operators.sorts_limits  # noqa: F401
    import c2_duckdb_runner_spark.operators.setops  # noqa: F401
    import c2_duckdb_runner_spark.functions.scalar  # noqa: F401
    import c2_duckdb_runner_spark.functions.complex  # noqa: F401
    import c2_duckdb_runner_spark.functions.udfs  # noqa: F401
    import c2_duckdb_runner_spark.operators.dedup  # noqa: F401
    import c2_duckdb_runner_spark.operators.simsearch  # noqa: F401
    import c2_duckdb_runner_spark.operators.textanalysis  # noqa: F401
    import c2_duckdb_runner_spark.operators.multimodal  # noqa: F401
    import c2_duckdb_runner_spark.operators.scale_patterns  # noqa: F401
    import c2_duckdb_runner_spark.operators.analytics_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.composite  # noqa: F401
    import c2_duckdb_runner_spark.operators.composite_subqueries  # noqa: F401
    import c2_duckdb_runner_spark.operators.pipeline_patterns  # noqa: F401
    import c2_duckdb_runner_spark.operators.training_pipeline  # noqa: F401
    import c2_duckdb_runner_spark.operators.modern_sql  # noqa: F401
    import c2_duckdb_runner_spark.operators.corpus_curation  # noqa: F401
    import c2_duckdb_runner_spark.operators.cdc_timeseries  # noqa: F401
    import c2_duckdb_runner_spark.operators.graph  # noqa: F401
    import c2_duckdb_runner_spark.operators.similarity_layout  # noqa: F401
    import c2_duckdb_runner_spark.operators.product_analytics  # noqa: F401
    import c2_duckdb_runner_spark.operators.sql_surface_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.data_mixture  # noqa: F401
    import c2_duckdb_runner_spark.operators.sketches_timeseries  # noqa: F401
    import c2_duckdb_runner_spark.operators.pandas_api  # noqa: F401
    import c2_duckdb_runner_spark.sources.formats  # noqa: F401
    import c2_duckdb_runner_spark.sources.python_datasource  # noqa: F401
    import c2_duckdb_runner_spark.streaming.queries  # noqa: F401
    import c2_duckdb_runner_spark.operators.curation_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.retrieval_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.coreset_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.spatial_signal_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.incremental_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.keywords_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.sql_surface_ext2  # noqa: F401
    import c2_duckdb_runner_spark.operators.warehouse_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.stats_retrieval_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.temporal_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.pipeline_gate_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.signal_ext2  # noqa: F401
    import c2_duckdb_runner_spark.operators.entity_vq_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.lakehouse_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.allocation_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.behavior_ext  # noqa: F401
    # round-4 additions — imported LAST to keep the driver-sampled first-50
    # registration prefix stable (pinned in tests/test_properties.py)
    import c2_duckdb_runner_spark.operators.matching_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.structure_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.pipeline_r4_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.paper_patterns_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.stats_tests_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.inference_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.attribution_retrieval_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.walks_mixture_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.decompose_eval_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.forecast_eval_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.chunking_health_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.mlsplit_spectral_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.randomness_decay_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.abtest_growth_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.blocking_eval_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.summary_power_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.skyline_linkage_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.waterfall_bitemporal_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.markov_attribution_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.wau_contamination_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.control_calibration_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.streaks_backlog_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.drift_eval_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.simjoin_symbolic_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.agreement_privacy_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.paired_metrics_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.allocation_fusion_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.concentration_votes_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.ranked_tests_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.sequential_robust_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.pretrain_objectives_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.rates_portmanteau_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.scale_rank_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.round5_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.round5b_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.round5c_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.round5d_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.round5e_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.round6_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.round6b_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.round6c_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.round6d_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.round7_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.round7b_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.round7c_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.round7d_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.round8_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.round8b_ext  # noqa: F401
    import c2_duckdb_runner_spark.operators.round8c_ext  # noqa: F401


def queries() -> dict[str, QueryFn]:
    _load_all_modules()
    return {k: q.fn for k, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load_all_modules()
    return {k: q.oracle for k, q in REGISTRY.items() if q.oracle is not None}


def src_hashes() -> dict[str, dict[str, str]]:
    """Per-key source provenance hashes for scale-sweep artifacts.

    ``src_hash`` covers the operator's own function body plus its oracle
    SQL; ``mod_hash`` covers the whole defining module file, catching
    changes to same-module helpers the function calls. Sweep assembly
    (tools/assemble_sweep.py) refuses to carry a prior round's 100x proof
    for a key unless BOTH hashes are unchanged — the mechanical version
    of the hand-asserted "code unchanged" provenance the r10 artifact
    carried (VERDICT r10 ask #4).
    """
    import hashlib
    import inspect

    _load_all_modules()
    out: dict[str, dict[str, str]] = {}
    mod_cache: dict[str, str] = {}
    for k, q in REGISTRY.items():
        fn = q.src_fn or q.fn
        src = inspect.getsource(fn)
        path = inspect.getsourcefile(fn) or ""
        if path not in mod_cache:
            with open(path, "rb") as fh:
                mod_cache[path] = hashlib.sha256(fh.read()).hexdigest()[:16]
        h = hashlib.sha256()
        h.update(src.encode())
        h.update(b"\x00")
        h.update((q.oracle or "").encode())
        out[k] = {
            "src_hash": h.hexdigest()[:16],
            "mod_hash": mod_cache[path],
            "module": os.path.relpath(path, os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
        }
    return out
