#!/usr/bin/env python
"""Build the round-N scale-validation artifact (VERDICT r04 item 3): EVERY
headline key timed + stage-metered at sf0.1 and at the 10x key-shifted
replica (tools/gen_scale.py), combined into per-key wall_x / shuffle_x /
input_x ratios.

Usage: python tools/scale_artifact.py BENCH_sf1_r05.json
Expects two bench.py output files produced beforehand (the runner below
invokes bench.py twice itself when given --run).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SMALL = "/tmp/verify/scale_small.json"
BIG = "/tmp/verify/scale_big.json"


def run_pass(sf_dir: str, out: str) -> None:
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env["SPARK_GRAFT_BENCH_OUT"] = out
    subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        cwd=REPO,
        env=env,
        check=True,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )


def main() -> None:
    # flags are not artifact names: `scale_artifact.py --run` must not
    # write a file literally called "--run"
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if not args:
        # an explicit target is required: a default would silently
        # overwrite a frozen prior-round artifact (ADVICE r06)
        sys.exit("usage: scale_artifact.py BENCH_sf1_rNN.json [--run]")
    target = args[0]
    if "--run" in sys.argv:
        run_pass("/root/testdata/sf0.1", SMALL)
        run_pass("/tmp/scale/sf1", BIG)
    small = json.load(open(SMALL))
    big = json.load(open(BIG))
    queries = {}
    worst = []
    for k, t0 in small["queries"].items():
        t1 = big["queries"].get(k)
        if t1 is None:
            continue
        m0 = small.get("stage_metrics", {}).get(k, {})
        m1 = big.get("stage_metrics", {}).get(k, {})
        ent = {
            "sec_sf01": round(t0, 3),
            "sec_sf1": round(t1, 3),
            "wall_x": round(t1 / t0, 2) if t0 else None,
        }
        for field, name in (("sw", "shuffle"), ("in", "input")):
            a, b = m0.get(field, 0), m1.get(field, 0)
            ent[f"{name}_write_sf01" if field == "sw" else f"{name}_sf01"] = a
            ent[f"{name}_write_sf1" if field == "sw" else f"{name}_sf1"] = b
            ent[f"{name}_x"] = round(b / a, 2) if a else None
        queries[k] = ent
        if ent["wall_x"]:
            worst.append((ent["wall_x"], k))
    worst.sort(reverse=True)
    out = {
        "what": (
            "Scale validation: EVERY headline "
            "query timed at sf0.1 (driver fixtures) and at the 10x "
            "key-shifted replica (tools/gen_scale.py), identical "
            "methodology (untimed per-query warm-up + median of 3, "
            "separate untimed stage-metrics pass). shuffle_x ~= 10 on a "
            "10x dataset = linear shuffle growth; wall_x < 10 = the 32 "
            "cores were underutilized at sf0.1 and absorb the extra rows. "
            "Bounded-domain queries (daily series, nation frames, "
            "dimension scans) legitimately hold ~1x everywhere."
        ),
        "method": {
            "cpus": 32,
            "repeats": small.get("repeats", 3),
            "stat": "median",
            "warmup": 1,
            "generator": "tools/gen_scale.py (disjoint key-shifted replicas)",
        },
        "totals": {
            "sec_sf01": round(sum(small["queries"][k] for k in queries), 1),
            "sec_sf1": round(sum(big["queries"][k] for k in queries), 1),
            "n_queries": len(queries),
        },
        "worst_wall_x": [
            {"key": k, "wall_x": w} for w, k in worst[:8]
        ],
        "queries": queries,
    }
    with open(os.path.join(REPO, target), "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {target}: {len(queries)} keys")
    errs = {**small.get("errors", {}), **big.get("errors", {})}
    if errs:
        print("ERRORS:", json.dumps(errs)[:500])


if __name__ == "__main__":
    main()
