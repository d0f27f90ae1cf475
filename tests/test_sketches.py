"""Accuracy pins for the sketch queries: the registered forms carry
verdict oracles (exact twins hash-matched cross-engine); these tests pin
the tighter published error bounds against exact twins in-session.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()


def test_hll_sketch_union_within_error(spark, sf_dir):
    """Per-type and merged HLL estimates must sit within the sketch's
    published error envelope (lgK=12 → ~1.6% rsd; allow 5% + slack for
    small counts), and the merged row must cover the union exactly once."""
    from c2_duckdb_runner_spark.operators.sketches_timeseries import (
        _hll_sketch_union_estimates,
    )
    from c2_duckdb_runner_spark.tables import load

    verdict = QUERIES["agg_hll_sketch_union"](spark, sf_dir).collect()
    assert all(r["within_rsd"] == 1 for r in verdict)
    res = {
        r["event_type"]: r["approx_users"]
        for r in _hll_sketch_union_estimates(spark, sf_dir).collect()
    }
    ev = load(spark, sf_dir, "events")
    exact_all = ev.select("user_id").distinct().count()
    exact_per = {
        r["event_type"]: r["x"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("x"))
        .collect()
    }
    for t, exact in exact_per.items():
        assert abs(res[t] - exact) <= max(3, 0.05 * exact), (t, res[t], exact)
    assert abs(res["__all__"] - exact_all) <= max(3, 0.05 * exact_all)


def test_countmin_freq_within_eps(spark, sf_dir):
    """CMS guarantee: true ≤ est ≤ true + eps·N (prob ≥ confidence; seed is
    pinned so the check is deterministic). The registered query now carries
    the verdict in-band: every probe-grid row must report within_eps = 1
    and an exact_count matching a directly-computed twin."""
    from c2_duckdb_runner_spark.operators.sketches_timeseries import (
        _CMS_PROBE_USERS,
    )
    from c2_duckdb_runner_spark.tables import load

    rows = QUERIES["agg_countmin_freq"](spark, sf_dir).collect()
    ev = load(spark, sf_dir, "events")
    types = {r["event_type"] for r in ev.select("event_type").distinct().collect()}
    # full probe grid present: every (type + __all__) x probe user
    assert len(rows) == (len(types) + 1) * len(_CMS_PROBE_USERS)
    assert all(r["within_eps"] == 1 for r in rows)
    exact = {
        (r["event_type"], r["user_id"]): r["c"]
        for r in ev.filter(F.col("user_id").isin(_CMS_PROBE_USERS))
        .groupBy("event_type", "user_id")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    for r in rows:
        etype, uid = r["event_type"], r["user_id"]
        true = (
            sum(v for (t, u), v in exact.items() if u == uid)
            if etype == "__all__"
            else exact.get((etype, uid), 0)
        )
        assert r["exact_count"] == true, (etype, uid, r["exact_count"], true)


def test_approx_percentile_within_rank_error(spark, sf_dir):
    """GK rank error is n/accuracy; with accuracy=10000 the estimated
    quantile's true rank must be within n/10000 (+1 slack) of the target
    rank, checked per group for p50/p95/p99."""
    from c2_duckdb_runner_spark.tables import load

    li = load(spark, sf_dir, "lineitem")
    # the registered query emits a verdict row; the tight GK bound is pinned
    # here against the raw estimates
    verdict = QUERIES["agg_approx_percentile"](spark, sf_dir).collect()
    assert all(r["within_rank_err"] == 1 for r in verdict)
    rows = (
        li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.expr(
                "approx_percentile(l_extendedprice, "
                "array(0.5, 0.95, 0.99), 10000)"
            ).alias("pcts"),
        )
        .collect()
    )
    for r in rows:
        flag, n, pcts = r["l_returnflag"], r["n"], r["pcts"]
        vals = [
            x["l_extendedprice"]
            for x in li.filter(F.col("l_returnflag") == flag)
            .select("l_extendedprice")
            .collect()
        ]
        vals.sort()
        for p, est in zip((0.5, 0.95, 0.99), pcts):
            # true rank of the estimate must be near the target rank
            import bisect

            lo = bisect.bisect_left(vals, est)
            hi = bisect.bisect_right(vals, est)
            target = p * n
            tol = n / 10000 + 1
            assert lo - tol <= target <= hi + tol, (flag, p, est, lo, hi, target)


def test_theta_set_ops_verdict(spark, sf_dir):
    rows = QUERIES["agg_theta_set_ops"](spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["within_rse"] == 1
    # set-algebra invariants on the exact twins
    assert r["n_both"] <= min(r["n_click"], r["n_purchase"])
    assert r["n_either"] == r["n_click"] + r["n_purchase"] - r["n_both"]


def test_kll_quantile_merge_verdict(spark, sf_dir):
    rows = QUERIES["agg_kll_quantile_merge"](spark, sf_dir).collect()
    flags = {r["l_returnflag"] for r in rows}
    assert "__all__" in flags and len(flags) >= 3
    assert all(r["within_rank_err"] == 1 for r in rows)
    n_all = next(r["n"] for r in rows if r["l_returnflag"] == "__all__")
    assert n_all == sum(r["n"] for r in rows if r["l_returnflag"] != "__all__")
