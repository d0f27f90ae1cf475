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

# Every shuffle_x above this carries an adjudication note in the artifact
# (verdict r8 ask #6: un-annotated outliers get re-triaged every round).
SHUFFLE_X_NOTE_BAR = 20

# One-line adjudications for the known shuffle_x outliers. Two recurring
# mechanisms, both CORRECT at scale:
# (a) broadcast cliff: a join side outgrows the broadcast threshold at 10x
#     and the plan correctly flips to a shuffled join — the sf0.1 number
#     was the near-zero broadcast exchange, so the ratio explodes while
#     the 10x absolute is the honest linear cost;
# (b) combine-floor exit: a hash aggregate whose key domain is small
#     per-partition at sf0.1 (map-side combine collapses almost
#     everything, KB-scale exchange) but grows 10x with the replica key
#     shift — per-partition dedup stops helping and the exchange enters
#     its linear-in-keys regime; ratios in the 20-80x band on KB->MB
#     absolutes, linear from here on.
ADJUDICATIONS = {
    "join_inner_hash": (
        "broadcast cliff: 511 B broadcast exchange at sf0.1 flips to the "
        "correct shuffled hash/SMJ plan once both sides outgrow the "
        "threshold at 10x; 89 MB absolute is linear in the join inputs "
        "(mechanism (a); adjudicated r8 verdict, pinned here)"
    ),
    "agg_approx_distinct": (
        "combine-floor exit (b): per-partition HLL partials grow with the "
        "10x-shifted distinct-key domain; ~4 MB absolute, linear beyond"
    ),
    "topk_per_group": (
        "combine-floor exit (b): per-group top-k partials track the 10x "
        "group domain; ~3 MB absolute"
    ),
    "text_type_token_ratio": (
        "combine-floor exit (b): per-doc token stats, 10x doc domain; "
        "~1 MB absolute"
    ),
    "text_simpson_diversity": (
        "combine-floor exit (b): per-doc token histogram partials, 10x "
        "doc domain; ~1 MB absolute"
    ),
    "sketch_ams_f2_moment": (
        "combine-floor exit (b): AMS sketch partials per partition x the "
        "10x key domain; ~12 MB absolute"
    ),
    "ab_cuped_adjustment": (
        "combine-floor exit (b): per-user covariate partials, 10x user "
        "domain; ~2.4 MB absolute"
    ),
    "agg_filter_clause": (
        "combine-floor exit (b): filtered-agg partials over the 10x "
        "group domain; ~3 MB absolute"
    ),
    "agg_theta_set_ops": (
        "combine-floor exit (b): theta-sketch partials, 10x key domain; "
        "~4.5 MB absolute"
    ),
    "eval_fleiss_kappa": (
        "combine-floor exit (b) at order granularity: the hash agg is "
        "keyed by o_orderkey, whose 10x-shifted domain outgrows "
        "per-partition dedup — the exchange enters its linear-in-orders "
        "regime (~111 MB absolute, ~linear from here)"
    ),
    "agg_bitmap_distinct": (
        "combine-floor exit (b) on sub-KB absolutes (767 B -> 23 KB) — "
        "the ratio is numerically meaningless at this size"
    ),
    "graph_local_clustering_topk": (
        "the one input-sized stage is the backbone SUPPORT aggregate "
        "(declared semantics, SCALE_CLASSES/VERDICT r8): shuffle is "
        "linear in co-order pairs (~167 MB absolute at 10x); the "
        "triangle stage above it is fence-bounded by the 5000-edge "
        "backbone at any scale"
    ),
    "funnel_view_click_purchase": (
        "combine-floor exit (b): per-user funnel partials, 10x user "
        "domain; ~6.5 MB absolute"
    ),
    "eval_psi_population_stability": (
        "re-measured r8 after fixing the grid-join plan flip (the "
        "original plan shuffled the input onto 10 bucket keys); now "
        "aggregate-first + broadcast grid, shuffle linear in the "
        "bounded bucket cells"
    ),
}


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
    unadjudicated = []
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
        if k in ADJUDICATIONS:
            ent["note"] = ADJUDICATIONS[k]
        elif (ent.get("shuffle_x") or 0) > SHUFFLE_X_NOTE_BAR:
            # never ship a silent outlier: an unknown key above the bar is
            # flagged loudly so THIS round triages it, not a future one
            ent["note"] = (
                f"UNADJUDICATED shuffle_x {ent['shuffle_x']} — triage and "
                "add to tools/scale_artifact.py ADJUDICATIONS"
            )
            unadjudicated.append(k)
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
    if unadjudicated:
        print(f"WARNING: {len(unadjudicated)} shuffle_x outliers lack an "
              f"adjudication: {unadjudicated}")
    errs = {**small.get("errors", {}), **big.get("errors", {})}
    if errs:
        print("ERRORS:", json.dumps(errs)[:500])


if __name__ == "__main__":
    main()
