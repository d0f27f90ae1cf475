"""Property-style checks (SURVEY.md §5.3) — the reference's own invariant
(rows passing `ke > τ` shrink as τ grows) plus algebraic invariants of the
engine surface. hypothesis drives the thresholds; Spark jobs are kept small
by testing at sf0.001."""

from __future__ import annotations

import io

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from c2_duckdb_runner_spark import runner
from c2_duckdb_runner_spark.tables import load

SF = "/root/testdata/sf0.001"


def _count_above(spark, thr: float) -> int:
    return (
        load(spark, SF, "events").filter(F.col("value") > F.lit(thr)).count()
    )


@settings(max_examples=6, deadline=None)
@given(
    st.tuples(
        st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
        st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
    )
)
def test_filter_count_monotonic_in_threshold(spark, thresholds):
    """The reference's experiment invariant: τ1 <= τ2 => count(τ1) >= count(τ2)
    (main.cc:330 totals for increasing Env_ke)."""
    lo, hi = sorted(thresholds)
    assert _count_above(spark, lo) >= _count_above(spark, hi)


def test_dedup_exact_idempotent(spark):
    """Deduplicating an already-deduplicated corpus is the identity."""
    d = load(spark, SF, "documents").select("doc_id", "text")
    once = d.groupBy(F.sha2("text", 256).alias("h")).agg(
        F.min("doc_id").alias("keeper")
    )
    again = once.groupBy("h").agg(F.min("keeper").alias("keeper"))
    assert once.count() == again.count()


def test_union_all_counts_add(spark):
    c = load(spark, SF, "customer")
    assert c.unionByName(c).count() == 2 * c.count()


def test_limit_is_prefix_of_sort(spark):
    o = load(spark, SF, "orders")
    full = [
        r["o_orderkey"]
        for r in o.orderBy(
            F.col("o_totalprice").desc(), F.col("o_orderkey")
        ).limit(20).collect()
    ]
    top5 = [
        r["o_orderkey"]
        for r in o.orderBy(
            F.col("o_totalprice").desc(), F.col("o_orderkey")
        ).limit(5).collect()
    ]
    assert full[:5] == top5


def test_stream_rows_pull_loop(spark):
    """exec_vectorized_pull parity: chunked pull drains exactly the result,
    in batches no larger than the hint (main.cc:183-199 shape)."""
    df = load(spark, SF, "lineitem").select("l_orderkey").limit(5000)
    total = 0
    for batch in runner.stream_rows(df, batch_hint=512):
        assert 0 < len(batch) <= 512
        total += len(batch)
    assert total == 5000


def test_approx_distinct_within_rsd(spark):
    """agg_approx_distinct is rows-only for the oracle (HLL internals are
    engine-specific); pin its accuracy against the exact count instead.
    Default rsd is 5%; allow 3 sigma."""
    ev = load(spark, SF, "events")
    exact = ev.select("user_id").distinct().count()
    approx = ev.agg(
        F.approx_count_distinct("user_id").alias("a")
    ).collect()[0]["a"]
    assert abs(approx - exact) <= max(3, 0.15 * exact), (approx, exact)


def test_print_sample_sink(spark):
    """sink_print parity (main.cc:193-195): textual output, no exceptions."""
    buf = io.StringIO()
    runner.print_sample(load(spark, SF, "region"), n=5, out=buf)
    text = buf.getvalue()
    assert "r_name" in text and len(text.splitlines()) >= 5
