#!/usr/bin/env python
"""DuckDB differential at the 10x replica for the integer-micro-arithmetic
families (round-5 verdict item 3).

The two real round-5 scale bugs (the lorenz int64 overflow, the datasource
single-file assumption) were caught by the BENCH artifact, not by
CORRECTNESS — the oracle sweeps stop at sf0.1. Overflow is a CORRECTNESS
failure mode that only appears past a data size, so this sweep re-runs the
Spark-vs-DuckDB differential on /tmp/scale/sf1 (tools/gen_scale.py, 10x
sf0.1) for every registered query whose oracle does fixed-point integer
arithmetic (micro/ppm/milli/cents scaling) — the family where a sum can
silently wrap int64.

Usage: python tools/sweep_sf1.py OUT.json [sf_dir] [keys...]
Defaults: sf_dir=/tmp/scale/sf1; keys auto-selected by oracle pattern.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

from tests.compare import canon_frame  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# fixed-point integer arithmetic markers in the oracle SQL — the overflow-
# prone family (micro-units, ppm, milli, cents, and bare 1e6 scalers)
_MICRO_PAT = re.compile(r"1000000|_micro|_ppm|_milli|_cents|100000000")


def pick_keys(oracles: dict[str, str]) -> list[str]:
    return [k for k, sql in oracles.items() if _MICRO_PAT.search(sql)]


def main() -> None:
    # --rows-only: compare COUNT(*) of the full query on both engines
    # instead of collecting frames — the 100x gate for row-proportional
    # keys (SCALE_CLASSES.md), whose results are too large to collect but
    # whose row COUNT still distinguishes filter/join semantics at scale.
    rows_only = "--rows-only" in sys.argv or bool(
        os.environ.get("SPARK_GRAFT_ROWS_ONLY")
    )
    argv = [a for a in sys.argv if a != "--rows-only"]
    out_path = argv[1] if len(argv) > 1 else "CORRECTNESS_sf1_r06.json"
    sf_dir = argv[2] if len(argv) > 2 else "/tmp/scale/sf1"
    sys.argv = argv

    from c2_duckdb_runner_spark import session as session_mod
    import __spark_entry__ as e

    spark = session_mod.get_spark(app_name="c2-spark-sweep-sf1")
    spark.sparkContext.setLogLevel("ERROR")

    qs, oracles = e.queries(), e.oracle_sql()
    keys = sys.argv[3:] or sorted(pick_keys(oracles))

    # SPARK_GRAFT_STAGED=1 routes keys with a disk-bounded staged oracle
    # (tools/oracle_staged.py — the 4 iterative-graph keys whose monolithic
    # unrolled-CTE oracle spills past free disk at 100x) through the staged
    # form; --check proves staged == monolithic at small SF, so the
    # differential stays exact.
    staged: dict = {}
    if os.environ.get("SPARK_GRAFT_STAGED"):
        from tools.oracle_staged import STAGED_ORACLES, run_staged

        staged = dict(STAGED_ORACLES)

    con = duckdb.connect()
    # share the host with a 32 GiB Spark JVM: cap DuckDB's memory and give
    # it a spill directory, or big-window oracles (e.g. RAKE's per-run
    # list() over 6e8 tokens) die with "Failed to allocate block" instead
    # of going out-of-core
    # PER-PROCESS spill dir: concurrent sweep lanes sharing one
    # temp_directory collide on duckdb_temp_storage-N.tmp names and
    # corrupt each other's spill (caught in the r9 parallel sweep)
    spill = f"/tmp/duck_spill/{os.getpid()}"
    os.makedirs(spill, exist_ok=True)
    con.execute(
        f"SET memory_limit='{os.environ.get('SPARK_GRAFT_DUCK_MEM', '40GB')}'"
    )
    con.execute(f"SET temp_directory='{spill}'")
    con.execute("SET threads=16")  # don't stack 32 duck threads on the JVM's
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):  # Spark-written dataset directory
            files = sorted(glob.glob(os.path.join(p, "*.parquet")))
            if files:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet("
                    f"{files!r})"
                )
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    results: dict[str, dict] = {}
    n_pass = n_fail = 0
    t0 = time.time()
    # Long single-session sweeps at big scale factors accumulate dead
    # localCheckpoint RDD blocks (ContextCleaner reclaims them only after
    # the Python refs are GC'd, asynchronously) until the fixed heap is
    # sick and UNRELATED keys start erroring — the round-7 sf10 run saw a
    # correlated 4-key failure cluster right after a heavy key, all four
    # green in a fresh session. Two mitigations: nudge both collectors
    # every key, and recycle the session every N keys.
    recycle = int(os.environ.get("SPARK_GRAFT_SWEEP_RECYCLE", "30"))
    for i, k in enumerate(keys):
        if i and recycle and i % recycle == 0:
            spark.stop()
            spark = session_mod.get_spark(app_name="c2-spark-sweep-sf1")
            spark.sparkContext.setLogLevel("ERROR")
        t1 = time.time()
        # 'started' marker BEFORE running the key: if this process dies
        # mid-key, the harvester can distinguish the crash-causing key
        # (checkpointed as started, no result) from never-run keys.
        with open(os.path.join(REPO, out_path) + ".partial", "w") as fh:
            json.dump({**results, k: {"started": True}}, fh, indent=1)
        ent: dict = {}
        try:
            if rows_only:
                n_spark = qs[k](spark, sf_dir).count()
                n_duck = int(con.execute(
                    f"SELECT COUNT(*) FROM ({oracles[k]})"
                ).fetchone()[0])
                ent = {
                    "mode": "rows-only",
                    "spark_rows": n_spark,
                    "oracle_rows": n_duck,
                    "rows_match": n_spark == n_duck,
                    # rows-only keys have no feasible 100x frame compare;
                    # record the weaker gate honestly: hash_match=None
                    # (NO value comparison ran), so a rows-only part can
                    # never be mistaken for hash coverage by a merge
                    "schema_match": None,
                    "hash_match": None,
                    "err": None,
                }
            else:
                spdf = qs[k](spark, sf_dir).toPandas()
                if k in staged:
                    opdf = run_staged(k, sf_dir)
                    ent["oracle"] = "staged (tools/oracle_staged.py)"
                else:
                    opdf = con.execute(oracles[k]).fetchdf()
                ent["spark_rows"] = len(spdf)
                ent["oracle_rows"] = len(opdf)
                ent["rows_match"] = len(spdf) == len(opdf)
                ent["schema_match"] = sorted(
                    c.lower() for c in spdf.columns
                ) == sorted(c.lower() for c in opdf.columns)
                a, b = canon_frame(spdf), canon_frame(opdf)
                ent["hash_match"] = [repr(r) for r in a] == [repr(r) for r in b]
                ent["err"] = None
                if not ent["hash_match"]:
                    bs = {repr(r) for r in b}
                    ent["spark_only"] = [
                        repr(r) for r in a if repr(r) not in bs
                    ][:2]
                    as_ = {repr(r) for r in a}
                    ent["oracle_only"] = [
                        repr(r) for r in b if repr(r) not in as_
                    ][:2]
        except Exception as ex:  # noqa: BLE001
            ent = {
                "rows_match": False,
                "schema_match": False,
                "hash_match": False,
                "err": str(ex)[:300],
            }
        ent["sec"] = round(time.time() - t1, 1)
        ok = ent.get("hash_match") and ent.get("rows_match")
        n_pass += bool(ok)
        n_fail += not ok
        results[k] = ent
        print(f"{'PASS' if ok else 'FAIL'} {k} ({ent['sec']}s)", flush=True)
        # incremental checkpoint: a crash (the r08 sweep lost 117 keys to
        # a thread-exhaustion abort) must never lose completed results
        with open(os.path.join(REPO, out_path) + ".partial", "w") as fh:
            json.dump(results, fh, indent=1)
        spark.catalog.clearCache()
        import gc

        gc.collect()  # release py refs so ContextCleaner can reclaim
        try:
            spark._jvm.System.gc()
        except Exception:  # noqa: BLE001 — best-effort heap hygiene
            pass

    summary = {
        "what": (
            f"Scaled-replica correctness sweep: DuckDB differential on "
            f"{sf_dir} for queries whose oracle does fixed-point integer "
            "arithmetic — the int64-overflow failure family the sf0.1 "
            "sweeps cannot see."
        ),
        "sf_dir": sf_dir,
        "n_keys": len(keys),
        "n_pass": n_pass,
        "n_fail": n_fail,
        "total_sec": round(time.time() - t0, 1),
        "results": results,
    }
    with open(os.path.join(REPO, out_path), "w") as fh:
        json.dump(summary, fh, indent=1)
    partial = os.path.join(REPO, out_path) + ".partial"
    if os.path.exists(partial):
        os.remove(partial)
    print(
        f"wrote {out_path}: {n_pass} pass / {n_fail} fail of {len(keys)}",
        flush=True,
    )
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
