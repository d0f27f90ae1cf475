#!/usr/bin/env python
"""Crash-isolated chunked driver for the scaled-replica DuckDB sweeps.

The round-8 156-key sweep at the 100x replica aborted at key ~117 with a
thread-exhaustion `std::system_error` (a long single process accumulates
JVM + DuckDB + Arrow threads across session recycles) and, because the
artifact was written only at the end, lost every completed result. This
driver fixes both failure modes structurally:

- keys run in CHUNKS, each chunk in a FRESH subprocess invocation of
  tools/sweep_sf1.py (fresh JVM, fresh DuckDB — thread budget bounded by
  the chunk, never the sweep);
- sweep_sf1.py checkpoints per key to OUT.partial, so even a chunk crash
  preserves its completed keys; the driver harvests partials;
- keys listed in SOLO_KEYS run one-per-process with a larger DuckDB
  memory budget (the text_rake_keywords two-process pattern from the
  round-7 sweep, now first-class).

Usage: python tools/sweep_chunked.py OUT.json sf_dir key [key...]
Env: SPARK_GRAFT_CHUNK (default 25), SPARK_GRAFT_SOLO_MEM (default 80GB).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# oracles known to need most of the box to themselves at 100x
SOLO_KEYS = {"text_rake_keywords"}


def run_chunk(
    out: str, sf_dir: str, keys: list[str], duck_mem: str | None = None
) -> dict:
    env = dict(os.environ)
    if duck_mem:
        env["SPARK_GRAFT_DUCK_MEM"] = duck_mem
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
    env.setdefault("SPARK_GRAFT_STAGED", "1")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/sweep_sf1.py"), out, sf_dir]
        + keys,
        cwd=REPO,
        env=env,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    full = os.path.join(REPO, out)
    if os.path.exists(full):
        res = json.load(open(full))["results"]
        os.remove(full)
        return res
    if os.path.exists(full + ".partial"):  # chunk crashed mid-way
        res = json.load(open(full + ".partial"))
        os.remove(full + ".partial")
        for k in keys:
            if res.get(k, {}).get("started") and "hash_match" not in res[k]:
                # the key checkpointed 'started' but never a result: this
                # is the key that was RUNNING when the process died — the
                # actual crash suspect, not merely a victim of ordering
                res[k] = {
                    "rows_match": False,
                    "schema_match": False,
                    "hash_match": False,
                    "err": f"chunk process died (exit {proc.returncode}) "
                    "WHILE running this key (crash suspect)",
                }
            elif k not in res:
                res[k] = {
                    "rows_match": False,
                    "schema_match": False,
                    "hash_match": False,
                    "err": f"chunk process died (exit {proc.returncode}) "
                    "before this key ran",
                }
        return res
    return {
        k: {
            "rows_match": False,
            "schema_match": False,
            "hash_match": False,
            "err": f"chunk process died (exit {proc.returncode})",
        }
        for k in keys
    }


def main() -> None:
    if len(sys.argv) < 4:
        sys.exit("usage: sweep_chunked.py OUT.json sf_dir key [key...]")
    target, sf_dir, keys = sys.argv[1], sys.argv[2], sys.argv[3:]
    chunk = int(os.environ.get("SPARK_GRAFT_CHUNK", "25"))
    solo_mem = os.environ.get("SPARK_GRAFT_SOLO_MEM", "80GB")

    normal = [k for k in keys if k not in SOLO_KEYS]
    solo = [k for k in keys if k in SOLO_KEYS]
    results: dict[str, dict] = {}
    t0 = time.time()
    for i in range(0, len(normal), chunk):
        part = normal[i : i + chunk]
        res = run_chunk(f"{target}.chunk{i}.json", sf_dir, part)
        results.update(res)
        done = sum(
            1 for v in results.values() if v.get("hash_match") and v.get("rows_match")
        )
        # driver-level checkpoint: a multi-hour sweep killed mid-run must
        # keep every completed chunk (the chunk files are deleted after
        # harvest, so this is the only durable copy)
        with open(os.path.join(REPO, target) + ".running", "w") as fh:
            json.dump(results, fh, indent=1)
        print(
            f"chunk {i // chunk + 1}: {len(results)}/{len(keys)} keys,"
            f" {done} pass",
            flush=True,
        )
    for k in solo:
        results.update(
            run_chunk(f"{target}.solo.json", sf_dir, [k], duck_mem=solo_mem)
        )
        results[k]["note"] = (
            f"solo two-process run, DuckDB memory {solo_mem} "
            "(oracle working set exceeds the shared-sweep budget)"
        )
        print(f"solo {k}: "
              f"{'PASS' if results[k].get('hash_match') else 'FAIL'}",
              flush=True)

    n_pass = sum(
        1 for v in results.values() if v.get("hash_match") and v.get("rows_match")
    )
    n_fail = len(results) - n_pass
    summary = {
        "what": (
            f"Scaled-replica correctness sweep (chunked, crash-isolated): "
            f"DuckDB differential on {sf_dir}; keys run in fresh "
            f"subprocesses of <= {chunk} keys (tools/sweep_chunked.py), "
            "staged disk-bounded oracles (tools/oracle_staged.py) for the "
            "iterative-graph keys, solo large-memory processes for "
            f"{sorted(SOLO_KEYS)}."
        ),
        "sf_dir": sf_dir,
        "n_keys": len(results),
        "n_pass": n_pass,
        "n_fail": n_fail,
        "total_sec": round(time.time() - t0, 1),
        "results": results,
    }
    with open(os.path.join(REPO, target), "w") as fh:
        json.dump(summary, fh, indent=1)
    running = os.path.join(REPO, target) + ".running"
    if os.path.exists(running):
        os.remove(running)
    print(
        f"wrote {target}: {n_pass} pass / {n_fail} fail of {len(results)}",
        flush=True,
    )
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
