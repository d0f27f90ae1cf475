"""Accuracy pin for the streaming sketch window: the registered query is
verdict-shaped (exact twin + within_rsd bit, hash-matched cross-engine);
this pins the tighter 5% envelope on the raw streamed estimates."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()


def test_stream_tumbling_approx_users_within_rsd(spark, sf_dir):
    """Every streamed window's HLL estimate must sit inside the 2% rsd
    envelope (5% + small-count slack here) of the batch-exact per-window
    distinct count, and the window set must match exactly."""
    from c2_duckdb_runner_spark.streaming.queries import (
        _stream_tumbling_approx_estimates,
    )
    from c2_duckdb_runner_spark.tables import load

    verdict = QUERIES["stream_tumbling_approx_users"](spark, sf_dir).collect()
    assert verdict and all(r["within_rsd"] == 1 for r in verdict)
    streamed = {
        r["win_start_ms"]: (r["n"], r["approx_users"])
        for r in _stream_tumbling_approx_estimates(spark, sf_dir).collect()
    }
    exact = {
        r["win_start_ms"]: (r["n"], r["xd"])
        for r in load(spark, sf_dir, "events")
        .groupBy(
            F.unix_millis(F.window("ts", "1 hour").start).alias("win_start_ms")
        )
        .agg(F.count("*").alias("n"), F.countDistinct("user_id").alias("xd"))
        .collect()
    }
    assert set(streamed) == set(exact)
    for win, (n, est) in streamed.items():
        n_exact, xd = exact[win]
        assert n == n_exact, (win, n, n_exact)
        assert abs(est - xd) <= max(3, 0.05 * xd), (win, est, xd)
