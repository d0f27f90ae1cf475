#!/usr/bin/env python
"""100x spot-check (round-5 verdict item 4): time the steepest wall_x
growers from BENCH_sf1 at a 100x key-shifted replica and confirm no
super-linear knee past 10x.

Method: build /tmp/scale/sf10 with tools/gen_scale.py (factor 100 of
sf0.1 ≈ 60 M lineitem rows), then run bench.py — same warm-up + median-
of-3 protocol — on the chosen keys at BOTH /tmp/scale/sf1 (10x) and
/tmp/scale/sf10 (100x), and report per-key wall_x10 = t(100x)/t(10x);
linear scaling on fixed cores predicts wall_x10 <= ~10.

Usage: python tools/bench_sf100x.py OUT.json [key,key,...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# top-8 wall_x keys from BENCH_sf1_r05.json worst_wall_x
DEFAULT_KEYS = [
    "join_spatial_grid_neighbors",
    "text_quality_score",
    "layout_zorder_cluster",
    "graph_jaccard_neighbor_sim",
    "udf_cogrouped_pandas",
    "dedup_incremental_batch",
    "dedup_duplicate_spans",
    "window_ntile_histogram",
]

SF1 = "/tmp/scale/sf1"
SF10 = "/tmp/scale/sf10"


def run_pass(sf_dir: str, out: str, keys: list[str]) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env["SPARK_GRAFT_BENCH_OUT"] = out
    env["SPARK_GRAFT_BENCH_KEYS"] = ",".join(keys)
    # 60 M-row inputs: the default 8g driver JVM dies in the heaviest
    # wedge-join stage (a real cluster sizes executors to the data; the
    # single-JVM local harness must too). Both passes use the same heap
    # so the wall ratio stays apples-to-apples.
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        cwd=REPO,
        env=env,
        check=True,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    return json.load(open(out))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if not args:
        sys.exit("usage: bench_sf100x.py OUT.json [key,key,...]")
    target = args[0]
    keys = args[1].split(",") if len(args) > 1 else DEFAULT_KEYS
    if not os.path.isdir(SF10):
        print(f"{SF10} missing — run tools/gen_scale.py 100 first")
        sys.exit(1)
    small = run_pass(SF1, "/tmp/verify/sf100x_small.json", keys)
    big = run_pass(SF10, "/tmp/verify/sf100x_big.json", keys)
    queries = {}
    for k in keys:
        t1, t10 = small["queries"].get(k), big["queries"].get(k)
        if t1 is None or t10 is None:
            queries[k] = {"error": "missing timing"}
            continue
        m1 = small.get("stage_metrics", {}).get(k, {})
        m10 = big.get("stage_metrics", {}).get(k, {})
        ent = {
            "sec_sf1": round(t1, 3),
            "sec_sf10": round(t10, 3),
            "wall_x10": round(t10 / t1, 2) if t1 else None,
        }
        for f, name in (
            ("sw", "shuffle_write"),
            ("in", "input"),
            ("ph", "peak_heap"),
            # spill evidence (verdict r07 ask #2): a peak heap sitting on
            # the JVM ceiling is benign iff these stay ~0
            ("ms", "mem_spill"),
            ("ds", "disk_spill"),
        ):
            a, b = m1.get(f, 0), m10.get(f, 0)
            ent[f"{name}_sf1"] = a
            ent[f"{name}_sf10"] = b
            ent[f"{name}_x10"] = round(b / a, 2) if a else None
        queries[k] = ent
    out = {
        "what": (
            "100x spot-check (verdict r05 item 4): the steepest "
            "wall_x keys from the BENCH_sf1 artifact timed at the 10x and 100x "
            "key-shifted replicas (tools/gen_scale.py). wall_x10 ~= 10 "
            "on a 10x step = linear; a knee (wall_x10 >> 10) marks a "
            "super-linear operator the 10x artifact could not see."
        ),
        "method": {
            # propagated from the bench output, not hard-coded, so a
            # cpus/warmup change in bench.py flows through (ADVICE r06)
            "cpus": small.get("cpus"),
            "repeats": small.get("repeats"),
            "stat": "median",
            "warmup": small.get("warmup"),
            "step": "sf1 (10x of sf0.1) -> sf10 (100x of sf0.1)",
        },
        # sum over ONLY the selected spot-check keys — not comparable to
        # bench.py's all-headline total (ADVICE r06 naming)
        "selected_keys_total_sec": {
            "sec_sf1": round(sum(small["queries"].values()), 1),
            "sec_sf10": round(sum(big["queries"].values()), 1),
            "n_keys": len(queries),
        },
        "queries": queries,
    }
    errs = {**small.get("errors", {}), **big.get("errors", {})}
    if errs:
        out["errors"] = errs
    with open(os.path.join(REPO, target), "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {target}: {len(queries)} keys")


if __name__ == "__main__":
    main()
