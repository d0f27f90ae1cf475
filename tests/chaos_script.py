"""Chaos harness: task-retry correctness under injected first-attempt
failures (run in a SUBPROCESS — it needs a `local[N, maxFailures]` master,
which the shared test session does not have).

The reference isolates per-FILE errors (``main.cc:267-271``); the
cluster-scale analogue is a TASK failing mid-computation and being retried
by the scheduler. The invariant under test: a retried task must not
double-count into aggregates or persisted frames — the injected run's
result must hash-equal the clean run's.

Injection: every ``tables.load`` frame gets a pass-through ``mapInPandas``
stage whose partition 0 raises on ``TaskContext.attemptNumber() == 0``.
The retry then recomputes the scan + injection stage (attempt 1 passes),
and every downstream consumer — shuffle-heavy hash aggregation
(dedup_exact) and the iterative persisted-edge loop
(graph_pagerank_iterations) — must absorb the recomputation exactly once.

Exit 0 iff: both keys' injected results equal their clean results AND the
injection demonstrably fired (attempt-0 failures observed via accumulator).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from c2_duckdb_runner_spark import tables  # noqa: E402
from c2_duckdb_runner_spark.session import get_spark  # noqa: E402
from tests.compare import canon_frame  # noqa: E402

KEYS = ["dedup_exact", "graph_pagerank_iterations"]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    # local[8, 4]: 8 cores, up to 4 attempts per task — the retry path the
    # default local[N] (maxFailures=1) can never exercise
    spark = get_spark("c2-spark-chaos", master="local[8, 4]")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    qs = e.queries()

    injected_fires = spark.sparkContext.accumulator(0)
    orig_load = tables.load

    def flaky_load(spark_, sf_dir_, name):
        df = orig_load(spark_, sf_dir_, name)

        def fail_first_attempt(it):
            from pyspark import TaskContext

            ctx = TaskContext.get()
            if ctx is not None and ctx.partitionId() == 0:
                if ctx.attemptNumber() == 0:
                    raise RuntimeError("chaos: injected first-attempt failure")
                # count on the SUCCESSFUL retry attempt: Spark discards
                # accumulator updates from failed tasks (itself the
                # no-double-count contract), so counting on attempt 0
                # would always read zero
                injected_fires.add(1)
            yield from it

        return df.mapInPandas(fail_first_attempt, schema=df.schema)

    def set_load(fn):
        # operator modules bind `load` by name at import (`from ..tables
        # import load`); rebind it everywhere, not just on tables
        tables.load = fn
        for mod in list(sys.modules.values()):
            if (
                mod is not None
                and getattr(mod, "__name__", "").startswith("c2_duckdb_runner_spark")
                and getattr(mod, "load", None) in (orig_load, flaky_load)
            ):
                mod.load = fn

    failures = 0
    for key in KEYS:
        set_load(flaky_load)
        before = injected_fires.value
        injected = canon_frame(qs[key](spark, sf_dir).toPandas())
        fired = injected_fires.value - before

        set_load(orig_load)
        clean = canon_frame(qs[key](spark, sf_dir).toPandas())

        ok_rows = [repr(r) for r in injected] == [repr(r) for r in clean]
        ok_fired = fired >= 1
        print(
            f"{key}: injected_fires={fired} rows={len(injected)} "
            f"hash_equal={ok_rows}",
            flush=True,
        )
        if not (ok_rows and ok_fired):
            failures += 1
            if not ok_fired:
                print(f"  FAIL: injection never fired for {key}")
            if not ok_rows:
                print(f"  FAIL: retried run diverged for {key}")

    print(f"chaos: {len(KEYS) - failures}/{len(KEYS)} keys retry-correct")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
